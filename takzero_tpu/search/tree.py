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
    # Allocation state [B] / [B, M].  Rows are recycled through a
    # free-list so tree reuse (descend_batch) never moves the pool:
    # `free_rows[b, alloc_ptr[b]]` is the next row expansion will use,
    # `free_count` how many entries are usable, `node_live` which rows
    # currently belong to the tree (row 0 = root; scratch is never live).
    node_live: jnp.ndarray  # [B, M] bool
    free_rows: jnp.ndarray  # [B, M] int32
    alloc_ptr: jnp.ndarray  # [B] int32
    free_count: jnp.ndarray  # [B] int32
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
        node_live=jnp.broadcast_to(jnp.arange(m)[None, :] == 0, (b, m)),
        free_rows=jnp.broadcast_to(
            (jnp.arange(m, dtype=jnp.int32) + 1).clip(max=m - 1)[None, :],
            (b, m),
        ),
        alloc_ptr=zi(b),
        free_count=jnp.full((b,), m - 2, jnp.int32),
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
    node/mod.rs:14-23) is stronger.  This reads only live pool rows
    (the write-sink scratch row carries garbage flags by design; live
    rows are not an index prefix once descend_batch has recycled rows).
    """
    live = tree.node_live
    expanded = jnp.sum(live, axis=1, dtype=jnp.int32)
    incomplete = jnp.sum(live & tree.node_incomplete, axis=1, dtype=jnp.int32)
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
        node_live=jnp.arange(cn.shape[0])[None, :] < k,
        free_rows=(jnp.arange(cn.shape[0], dtype=jnp.int32) + k).clip(
            max=cn.shape[0] - 1
        )[None, :],
        alloc_ptr=jnp.zeros((1,), jnp.int32),
        free_count=jnp.asarray([cn.shape[0] - 1 - k], jnp.int32),
        root_visit=tree.child_visit[:, 0, slot],
        root_flag=tree.child_flag[:, 0, slot],
        root_ply=tree.child_ply[:, 0, slot],
        root_value=tree.child_value[:, 0, slot],
        root_std=tree.child_std[:, 0, slot],
        overflow=jnp.zeros((1,), jnp.int32),
    )


def descend_batch(
    tree: Tree, slot, min_headroom: int = 0, max_chain: int | None = None
):
    """Jitted batched re-root: every lane descends to its root child `slot`.

    Device-side tree reuse across moves for selfplay and evaluation
    (reference ``BatchedMCTS::step`` → ``node.descend(action)``,
    node/batched.rs:131-144, node/mod.rs:95-102): prior visits and solver
    proofs seed the next move's search.

    TPU design: the carried subtree is **never moved**.  A bulk
    compaction gather over the [B,M,C] pool arrays costs ~1us per
    gathered row on the scalar core (~200k rows here — measured 6.7 s
    per move at the flagship config, slower than the whole 768-sim
    search).  Instead:

    1. reachability-from-``r`` via parent-pointer doubling
       (``ceil(log2(max_chain))`` rounds of [B,M] gathers; chains are
       bounded by the search's ``max_depth``, so callers pass it as
       ``max_chain`` to shrink the unroll);
    2. the new root's single row is swapped into row 0 (row 0 is the
       root everywhere; one [B]-row gather+store per array) and its
       children re-parented to 0;
    3. freed rows are parked (parent −1) and enumerated into a
       ``free_rows`` list that expansion consumes
       (``free_rows[alloc_ptr]``) — interior rows keep their indices,
       so no data moves.  Interior numbering is search-irrelevant
       (kernels depend only on links, row 0, and the scratch row).

    Returns ``(tree2, ok[B])``.  Lanes where ``ok`` is False (the chosen
    child was never expanded, or the carried subtree would leave less
    than ``min_headroom`` free pool rows) contain garbage and must be
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
    scratch = m - 1
    bar = jnp.arange(b)
    idx = jnp.arange(m, dtype=jnp.int32)
    slot = jnp.asarray(slot, jnp.int32).clip(0, c - 1)
    r = tree.child_node[bar, 0, slot]  # [B] new-root pool row
    ok = r >= 0
    rc = r.clip(0)

    # Reachability: reach[x] iff r is x or an ancestor of x.  Parent
    # chains have length <= the search max_depth (expansion only happens
    # at depth < max_depth), so `max_chain` rounds of doubling converge;
    # -1 chains park on the scratch row, whose own parent is kept at -1
    # below and which is never a real parent, so parked chains can never
    # pass through r.
    reach = idx[None, :] == rc[:, None]
    anc = jnp.where(tree.node_parent >= 0, tree.node_parent, scratch)
    chain = m - 1 if max_chain is None else min(max_chain + 1, m - 1)
    for _ in range(max(1, chain.bit_length())):
        reach = reach | jnp.take_along_axis(reach, anc, axis=1)
        anc = jnp.take_along_axis(anc, anc, axis=1)

    k = jnp.sum(reach, axis=1).astype(jnp.int32)  # [B] subtree size
    ok = ok & (k + min_headroom <= m - 1)

    # Root stats = the chosen edge's stats (reads precede all writes).
    root_visit = tree.child_visit[bar, 0, slot]
    root_flag = tree.child_flag[bar, 0, slot]
    root_ply = tree.child_ply[bar, 0, slot]
    root_value = tree.child_value[bar, 0, slot]
    root_std = tree.child_std[bar, 0, slot]

    # Swap r's node data into row 0 (the root row everywhere).
    def swap0(arr):
        return arr.at[:, 0].set(arr[bar, rc])

    # r's children re-parent from r to row 0 (their slots are unchanged:
    # row 0's child row *is* r's child row after the swap).  Unexpanded
    # slots sink on the scratch row.
    cn_r = tree.child_node[bar, rc]  # [B, C]
    tgt = jnp.where(cn_r >= 0, cn_r, scratch)
    node_parent = tree.node_parent.at[bar[:, None], tgt].set(0)
    node_parent = node_parent.at[:, 0].set(-1)

    # Live rows: r's proper descendants (which stay put) plus row 0 (now
    # holding r).  Everything else — including r's vacated row — is dead:
    # park its parent so a later reachability pass cannot resurrect it
    # through a recycled ancestor, and enumerate the dead rows (ascending)
    # into the free list.
    live = (reach & (idx[None, :] != rc[:, None])) | (idx[None, :] == 0)
    node_parent = jnp.where(live, node_parent, -1)
    # Make the cross-module invariant EXPLICIT rather than inductive:
    # node_parent[:, scratch] == -1.  The reachability pass above relies
    # on parked (-1) chains self-terminating at scratch, and the
    # expansion write sites (core.py apply_eval, serve.py) happen to sink
    # -1 into scratch — but a future writer sinking a real parent there
    # would silently resurrect parked rows on the next descend.  One
    # unconditional store closes the loop (tests/test_descend_invariants).
    node_parent = node_parent.at[:, scratch].set(-1)
    dead = ~live & (idx[None, :] != scratch)
    free_count = jnp.sum(dead, axis=1).astype(jnp.int32)
    free_rows = jnp.argsort(
        jnp.where(dead, idx[None, :], m + idx[None, :]), axis=1
    ).astype(jnp.int32)

    return Tree(
        node_parent=node_parent,
        node_slot=swap0(tree.node_slot).at[:, 0].set(-1),
        node_incomplete=swap0(tree.node_incomplete),
        node_env=jax.tree.map(swap0, tree.node_env),
        node_count=jnp.maximum(k, 1),
        child_action=swap0(tree.child_action),
        child_logit=swap0(tree.child_logit),
        child_prob=swap0(tree.child_prob),
        child_visit=swap0(tree.child_visit),
        child_flag=swap0(tree.child_flag),
        child_ply=swap0(tree.child_ply),
        child_value=swap0(tree.child_value),
        child_std=swap0(tree.child_std),
        child_node=swap0(tree.child_node),
        node_live=live,
        free_rows=free_rows,
        alloc_ptr=jnp.zeros((b,), jnp.int32),
        free_count=free_count,
        root_visit=root_visit,
        root_flag=root_flag,
        root_ply=root_ply,
        root_value=root_value,
        root_std=root_std,
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
