"""Structural invariants of in-place tree reuse over MANY moves.

descend_batch recycles freed pool rows instead of compacting
(search/tree.py); corruption from a bad free list (a live row handed to
expansion, a stale row resurrected by reachability) would only surface
after several descend->search->descend cycles.  This drives a batch of
games for 24 moves with a small pool and, after every move, checks the
tree against a host BFS over child links:

* live set == BFS-reachable set from row 0; node_count == its size;
* every live non-root row's parent is live and the parent's child slot
  points back at it;
* the unconsumed free segment is disjoint from the live set and the
  scratch row;
* expansion never hands out a live row (implied by the two above).
"""

import jax
import jax.numpy as jnp
import numpy as np

from takzero_tpu.search.agents import simple_evaluator
from takzero_tpu.search.core import make_kernels
from takzero_tpu.search.policy import slot_action
from takzero_tpu.search.tree import descend_batch, init_tree, reset_lanes
from takzero_tpu.search.openings import make_new_opening
from takzero_tpu.tak import engine


def bfs_live(cn, m):
    seen = {0}
    stack = [0]
    while stack:
        node = stack.pop()
        for child in cn[node]:
            c = int(child)
            if c >= 0 and c not in seen:
                seen.add(c)
                stack.append(c)
    return seen


def check_invariants(tree, lane):
    m = tree.node_parent.shape[1]
    cn = np.asarray(tree.child_node[lane])
    par = np.asarray(tree.node_parent[lane])
    slot = np.asarray(tree.node_slot[lane])
    live = np.asarray(tree.node_live[lane])
    free_rows = np.asarray(tree.free_rows[lane])
    a0 = int(tree.alloc_ptr[lane])
    fc = int(tree.free_count[lane])

    reach = bfs_live(cn, m)
    live_set = set(np.nonzero(live)[0].tolist())
    assert live_set == reach, (sorted(live_set - reach), sorted(reach - live_set))
    assert int(tree.node_count[lane]) == len(reach)
    assert m - 1 not in reach  # scratch is never linked

    for s in reach - {0}:
        p = int(par[s])
        assert p in reach, (s, p)
        assert int(cn[p, int(slot[s])]) == s, (s, p, int(slot[s]))
    assert int(par[0]) == -1

    free_seg = set(free_rows[a0:fc].tolist())
    assert not (free_seg & reach), sorted(free_seg & reach)
    assert m - 1 not in free_seg


def test_many_move_reuse_invariants():
    eng = engine(3)
    simulate, simulate_batch = make_kernels(
        eng, simple_evaluator(eng), max_depth=12
    )
    budget = 24

    @jax.jit
    def search(tree):
        tree = simulate(tree, jnp.zeros(tree.batch_size))
        return simulate_batch(tree, jnp.zeros(tree.batch_size), budget - 1)

    opening = make_new_opening(eng, random_steps=1)
    envs = opening(jax.random.PRNGKey(0), 3)
    # Tight pool: budget + small carry headroom, forcing frequent
    # free-list recycling AND min_headroom resets.
    tree = init_tree(eng, envs, budget + 12, 48)
    step_b = jax.jit(jax.vmap(eng.step))
    term_b = jax.jit(jax.vmap(eng.terminal_kind))

    desc = jax.jit(
        lambda t, s: descend_batch(t, s, min_headroom=budget, max_chain=12)
    )
    key = jax.random.PRNGKey(1)
    resets = 0
    for move in range(24):
        tree = search(tree)
        for lane in range(3):
            check_invariants(tree, lane)
        # Most-visited expanded root child per lane (host pick is fine).
        cv = np.asarray(tree.child_visit[:, 0, :])
        cn0 = np.asarray(tree.child_node[:, 0, :])
        ca = np.asarray(tree.child_action[:, 0, :])
        score = np.where((cn0 >= 0) & (ca >= 0), cv, -1)
        slots = np.argmax(score, axis=1).astype(np.int32)
        action = np.asarray(slot_action(tree, jnp.asarray(slots))).clip(0)
        stepped = step_b(envs, jnp.asarray(action))
        done = np.asarray(term_b(stepped)) != 0
        key, k = jax.random.split(key)
        fresh = opening(k, 3)
        nxt = jax.tree.map(
            lambda f, s: jnp.where(
                jnp.asarray(done).reshape((-1,) + (1,) * (s.ndim - 1)), f, s
            ),
            fresh,
            stepped,
        )
        tree, ok = desc(tree, jnp.asarray(slots))
        ok = np.asarray(ok)
        resets += int((~ok | done).sum())
        tree = reset_lanes(tree, jnp.asarray(done) | ~jnp.asarray(ok), nxt)
        envs = nxt
        for lane in range(3):
            check_invariants(tree, lane)
    # The premise: recycling actually happened (some carries AND some
    # resets over 24 moves x 3 lanes).
    assert 0 < resets < 24 * 3
