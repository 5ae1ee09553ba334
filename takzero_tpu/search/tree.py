"""SoA array-of-trees storage for batched MCTS.

Replaces the reference's pointer tree (takzero/src/search/node/mod.rs:14-23)
with fixed-shape arrays so the whole search lives on device:

* an *expanded-node pool* ``[B, M]`` holding, per node, its environment
  state, parent pointer and parent child-slot — only nodes that have been
  evaluated and expanded occupy a pool slot (node 0 is always the root);
* per-node *child slots* ``[B, M, C]`` holding edge statistics for up to C
  children (action id, logit, prior, visit count, eval triple, std-dev,
  child node index).  A node's own statistics live in its parent's child
  slot; root statistics are separate ``[B]`` arrays.

If a position has more than C legal moves, the top C by prior logit are
kept and the node is marked *incomplete*: the exact solver may still prove
wins through it (one losing child suffices) but never losses/draws (which
would require exhaustiveness).  C >= max branching gives exact reference
semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..tak.engine import TakEngine
from ..tak.state import TakState


class Tree(NamedTuple):
    # Expanded-node pool [B, M]
    node_parent: jnp.ndarray
    node_slot: jnp.ndarray
    node_incomplete: jnp.ndarray  # bool: children truncated to C
    node_env: TakState  # leaves have leading [B, M]
    node_count: jnp.ndarray  # [B]
    # Child slots [B, M, C]
    child_action: jnp.ndarray  # -1 = unused slot
    child_logit: jnp.ndarray
    child_prob: jnp.ndarray
    child_visit: jnp.ndarray
    child_flag: jnp.ndarray  # eval triple of the child node (child's POV)
    child_ply: jnp.ndarray
    child_value: jnp.ndarray
    child_std: jnp.ndarray
    child_node: jnp.ndarray  # expanded-node index, -1 = unexpanded
    # Root statistics [B]
    root_visit: jnp.ndarray
    root_flag: jnp.ndarray
    root_ply: jnp.ndarray
    root_value: jnp.ndarray
    root_std: jnp.ndarray
    # Diagnostics [B]
    overflow: jnp.ndarray  # pool-full or depth-clip events

    @property
    def batch_size(self) -> int:
        return self.child_visit.shape[0]

    @property
    def max_nodes(self) -> int:
        # The last pool row is a write-sink scratch node: expansion writes
        # are unconditional (no old-value gather / copy-on-write in the hot
        # path) and land there when a lane has nothing to expand.
        return self.child_visit.shape[1] - 1

    @property
    def scratch_node(self) -> int:
        return self.child_visit.shape[1] - 1

    @property
    def max_children(self) -> int:
        return self.child_visit.shape[2]

    def root_expanded(self) -> jnp.ndarray:
        # Slot-permutation-invariant: the unsorted exact top-k impls
        # (ops/topk.py) emit selected entries in ascending action order, so
        # when action 0 is illegal and there are fewer legal moves than
        # max_children, slot 0 holds a -1 filler even though the root IS
        # expanded.  Any valid slot marks expansion (a fresh init_tree pool
        # is all -1; expansion always writes >= 1 legal child).
        return jnp.max(self.child_action[:, 0, :], axis=1) >= 0


def init_tree(
    eng: TakEngine, root_envs: TakState, max_nodes: int, max_children: int
) -> Tree:
    """Fresh trees for a batch of root environments ([B]-leading pytree)."""
    del eng
    b = root_envs.ply.shape[0]
    m, c = max_nodes + 1, max_children  # +1: write-sink scratch row

    def tile_env(x):
        return jnp.broadcast_to(x[:, None], (b, m) + x.shape[1:])

    zf = lambda *s: jnp.zeros(s, jnp.float32)  # noqa: E731
    zi = lambda *s: jnp.zeros(s, jnp.int32)  # noqa: E731
    return Tree(
        node_parent=jnp.full((b, m), -1, jnp.int32),
        node_slot=jnp.full((b, m), -1, jnp.int32),
        node_incomplete=jnp.zeros((b, m), bool),
        node_env=jax.tree.map(tile_env, root_envs),
        node_count=jnp.ones((b,), jnp.int32),  # node 0 reserved for the root
        child_action=jnp.full((b, m, c), -1, jnp.int32),
        child_logit=zf(b, m, c),
        child_prob=zf(b, m, c),
        child_visit=zi(b, m, c),
        child_flag=zi(b, m, c),
        child_ply=zi(b, m, c),
        child_value=zf(b, m, c),
        child_std=zf(b, m, c),
        child_node=jnp.full((b, m, c), -1, jnp.int32),
        root_visit=zi(b),
        root_flag=zi(b),
        root_ply=zi(b),
        root_value=zf(b),
        root_std=zf(b),
        overflow=zi(b),
    )


def truncation_stats(tree: Tree) -> jnp.ndarray:
    """[B, 2] int32: (expanded nodes, incomplete nodes) per lane.

    `node_incomplete` is set at expansion when a position has more legal
    moves than the tree's C child slots (see the module docstring) — the
    solver then never proves losses/draws through that node, which is
    exactly where the reference (which stores ALL children,
    node/mod.rs:14-23) is stronger.  This reads only allocated pool rows
    (the write-sink scratch row carries garbage flags by design).
    """
    b, m = tree.node_parent.shape
    alloc = jnp.arange(m)[None, :] < tree.node_count[:, None]
    expanded = jnp.sum(alloc, axis=1, dtype=jnp.int32)
    incomplete = jnp.sum(alloc & tree.node_incomplete, axis=1, dtype=jnp.int32)
    return jnp.stack([expanded, incomplete], axis=1)


def reset_lanes(tree: Tree, mask: jnp.ndarray, new_envs: TakState) -> Tree:
    """Reset trees where `mask` is set, installing `new_envs` as roots."""
    fresh = init_tree(None, new_envs, tree.max_nodes, tree.max_children)

    def pick(new, old):
        m = mask.reshape((-1,) + (1,) * (old.ndim - 1))
        return jnp.where(m, new, old)

    return jax.tree.map(pick, fresh, tree)


def descend_host(tree: Tree, action: int):
    """Re-root a single tree (B=1) at the root child playing `action`.

    Host-side numpy re-rooting — the serve path's tree reuse across
    ``position`` commands (reference Node::descend, node/mod.rs:95-102;
    tei/src/main.rs:174-201).  Returns a new Tree whose node 0 is the
    chosen child's subtree, or None when that child was never expanded
    (caller rebuilds from the stepped environment).
    """
    import numpy as np

    assert tree.batch_size == 1, "descend_host reuses single-game trees"
    ca = np.asarray(tree.child_action[0])
    cn = np.asarray(tree.child_node[0])
    slots = np.nonzero(ca[0] == action)[0]
    if len(slots) == 0:
        return None
    slot = int(slots[0])
    r = int(cn[0, slot])
    if r < 0:
        return None

    # BFS over child links from the new root.
    order = [r]
    seen = {r}
    for node in order:
        for child in cn[node]:
            c = int(child)
            if c >= 0 and c not in seen:
                seen.add(c)
                order.append(c)
    remap = np.full(cn.shape[0], -1, np.int64)
    for new, old in enumerate(order):
        remap[old] = new
    k = len(order)
    take = np.asarray(order)

    def copy_pool(arr, fill):
        a = np.asarray(arr[0])
        out = np.full_like(a, fill)
        out[:k] = a[take]
        return jnp.asarray(out[None])

    def copy_env(x):
        a = np.asarray(x[0])
        out = a.copy()
        out[:k] = a[take]
        return jnp.asarray(out[None])

    child_node = np.asarray(tree.child_node[0])
    new_child_node = np.full_like(child_node, -1)
    mapped = child_node[take]
    new_child_node[:k] = np.where(mapped >= 0, remap[mapped.clip(0)], -1)

    # Parent pointers remap into the new numbering; the new root has none.
    old_parent = np.asarray(tree.node_parent[0])
    new_parent = np.full_like(old_parent, -1)
    taken_parents = old_parent[take]
    new_parent[:k] = np.where(taken_parents >= 0, remap[taken_parents.clip(0)], -1)
    new_parent[0] = -1

    return Tree(
        node_parent=jnp.asarray(new_parent[None]),
        node_slot=copy_pool(tree.node_slot, -1).at[0, 0].set(-1),
        node_incomplete=copy_pool(tree.node_incomplete, False),
        node_env=jax.tree.map(copy_env, tree.node_env),
        node_count=jnp.asarray([k], jnp.int32),
        child_action=copy_pool(tree.child_action, -1),
        child_logit=copy_pool(tree.child_logit, 0.0),
        child_prob=copy_pool(tree.child_prob, 0.0),
        child_visit=copy_pool(tree.child_visit, 0),
        child_flag=copy_pool(tree.child_flag, 0),
        child_ply=copy_pool(tree.child_ply, 0),
        child_value=copy_pool(tree.child_value, 0.0),
        child_std=copy_pool(tree.child_std, 0.0),
        child_node=jnp.asarray(new_child_node[None]),
        root_visit=tree.child_visit[:, 0, slot],
        root_flag=tree.child_flag[:, 0, slot],
        root_ply=tree.child_ply[:, 0, slot],
        root_value=tree.child_value[:, 0, slot],
        root_std=tree.child_std[:, 0, slot],
        overflow=jnp.zeros((1,), jnp.int32),
    )


def descend_batch(tree: Tree, slot, min_headroom: int = 0):
    """Jitted batched re-root: every lane descends to its root child `slot`.

    Device-side tree reuse across moves for selfplay and evaluation
    (reference ``BatchedMCTS::step`` → ``node.descend(action)``,
    node/batched.rs:131-144, node/mod.rs:95-102): prior visits and solver
    proofs seed the next move's search.

    Reachability runs via parent-pointer doubling — parents are always
    allocated before children, so chains strictly decrease and
    ``ceil(log2(M))`` rounds of [B,M] gathers converge — far cheaper than
    a child-link scatter fixpoint over the [B,M,C] slot arrays.  Then one
    gather-based compaction renumbers the kept subtree with the new root
    at row 0.  Interior numbering is search-irrelevant (kernels depend
    only on links, row 0, and the scratch row).

    Returns ``(tree2, ok[B])``.  Lanes where ``ok`` is False (the chosen
    child was never expanded, or the carried subtree would leave less
    than ``min_headroom`` free pool rows) contain empty trees and must be
    reset by the caller (``reset_lanes``) with the stepped environment.

    ``min_headroom`` keeps reuse sound with a fixed pool: carried
    subtrees otherwise accumulate across moves (the reference
    heap-allocates, node/mod.rs:95-102) until expansion hits the
    pool-full guard mid-search and quality silently degrades.  A
    Gumbel-SH move runs ``budget + 1`` simulations (the root-init
    simulate plus the scheduled budget, gumbel.py:83+125), each
    allocating at most one node, so a lane that descends with
    ``k + budget + 1 <= max_nodes`` can never saturate during the next
    search; callers pass ``min_headroom=search_budget + 1``.
    """
    b, m, c = tree.child_action.shape
    bar = jnp.arange(b)
    slot = jnp.asarray(slot, jnp.int32).clip(0, c - 1)
    r = tree.child_node[bar, 0, slot]  # [B] new-root pool row
    ok = r >= 0

    idx = jnp.arange(m, dtype=jnp.int32)
    reach = idx[None, :] == r[:, None]
    # -1 chains (roots / unexpanded rows) park on the scratch row, which is
    # never a real parent and never equals r.
    anc = jnp.where(tree.node_parent >= 0, tree.node_parent, m - 1)
    for _ in range(max(1, (m - 1).bit_length())):
        reach = reach | jnp.take_along_axis(reach, anc, axis=1)
        anc = jnp.take_along_axis(anc, anc, axis=1)

    k = jnp.sum(reach, axis=1).astype(jnp.int32)  # [B]
    ok = ok & (k + min_headroom <= m - 1)
    # New numbering: r first, remaining kept nodes in old-index order.
    sort_key = jnp.where(
        reach, jnp.where(idx[None, :] == r[:, None], -1, idx[None, :]), m + 1
    )
    perm = jnp.argsort(sort_key, axis=1).astype(jnp.int32)  # perm[new] = old
    remap = (
        jnp.zeros((b, m), jnp.int32)
        .at[bar[:, None], perm]
        .set(jnp.broadcast_to(idx[None, :], (b, m)))
    )
    live = idx[None, :] < k[:, None]

    def pool(arr, fill):
        p = perm.reshape((b, m) + (1,) * (arr.ndim - 2))
        g = jnp.take_along_axis(
            arr, jnp.broadcast_to(p, (b, m) + arr.shape[2:]), axis=1
        )
        mask = live.reshape((b, m) + (1,) * (arr.ndim - 2))
        return jnp.where(mask, g, jnp.asarray(fill, arr.dtype))

    g_cn = pool(tree.child_node, -1)
    new_cn = jnp.where(
        g_cn >= 0,
        jnp.take_along_axis(remap, g_cn.clip(0).reshape(b, -1), axis=1).reshape(
            b, m, c
        ),
        -1,
    )
    g_par = pool(tree.node_parent, -1)
    new_par = jnp.where(
        g_par >= 0, jnp.take_along_axis(remap, g_par.clip(0), axis=1), -1
    )
    new_par = new_par.at[:, 0].set(-1)

    return Tree(
        node_parent=new_par,
        node_slot=pool(tree.node_slot, -1).at[:, 0].set(-1),
        node_incomplete=pool(tree.node_incomplete, False),
        node_env=jax.tree.map(lambda x: pool(x, 0), tree.node_env),
        node_count=jnp.maximum(k, 1),
        child_action=pool(tree.child_action, -1),
        child_logit=pool(tree.child_logit, 0.0),
        child_prob=pool(tree.child_prob, 0.0),
        child_visit=pool(tree.child_visit, 0),
        child_flag=pool(tree.child_flag, 0),
        child_ply=pool(tree.child_ply, 0),
        child_value=pool(tree.child_value, 0.0),
        child_std=pool(tree.child_std, 0.0),
        child_node=new_cn,
        root_visit=tree.child_visit[bar, 0, slot],
        root_flag=tree.child_flag[bar, 0, slot],
        root_ply=tree.child_ply[bar, 0, slot],
        root_value=tree.child_value[bar, 0, slot],
        root_std=tree.child_std[bar, 0, slot],
        overflow=jnp.zeros((b,), jnp.int32),
    ), ok


def descend_device(tree: Tree, action):
    """Jitted single-tree re-root at the root child playing `action`.

    The serve path's tree reuse across TEI ``position`` commands
    (tei/src/main.rs:174-201) — an action-keyed wrapper over
    ``descend_batch`` at B=1.  Returns ``(tree2, ok)``; when ``ok`` is
    False the child was never expanded (or the action is not a root
    child) and ``tree2`` must be discarded — the caller rebuilds from the
    stepped environment, as with ``descend_host``'s ``None``.  Avoids the
    ~100 MB device->host->device round trip per ``position`` command.
    """
    assert tree.batch_size == 1, "descend_device reuses single-game trees"
    action = jnp.asarray(action, jnp.int32)
    hit = tree.child_action[0, 0] == action
    slot = jnp.argmax(hit).astype(jnp.int32)
    tree2, ok = descend_batch(tree, slot[None])
    return tree2, ok[0] & jnp.any(hit)
