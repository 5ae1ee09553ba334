"""Gumbel sequential halving at the root, as one fused jitted program.

Mirrors the reference's `gumbel_sequential_halving`
(takzero/src/search/node/batched.rs:207-409):

* one plain simulation first so all roots are initialized (PUCT uses the
  caller's betas there);
* sample the top `sampled_actions` root children by logit + Gumbel(0,1);
* log2(k) phases; each phase gives every surviving action
  budget/log2(k)/remaining forced-root simulations (in-tree beta = 0, root
  statistics untouched);
* halve by logit + gumbel + sigma_select(q, sigma, beta, cumulative
  visits), sigma_select = (q + beta*sigma) * (50 + visits);
* finally recompute root statistics: visit = sum(children)+1, solver
  re-check, value = sum(p*q)/sum(p) over visited children
  (batched.rs:372-406).

The whole search compiles to a single XLA program: the per-simulation
schedule (which action rank, when to halve, cumulative visits) is static,
so the `budget` simulations run inside one `lax.fori_loop`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..tak.engine import TakEngine
from . import eval as ev
from .core import make_simulate
from .tree import Tree


def sh_schedule(sampled_actions: int, budget: int):
    """Static per-simulation schedule: (rank, alive, halve, cum_visits)."""
    k = sampled_actions
    steps = k.bit_length() - 1
    assert k >= 2 and (k & (k - 1)) == 0, (
        "sampled_actions must be a power of 2, at least 2"
    )
    assert budget > 0, "budget must be positive"
    assert budget % (steps * k) == 0, "budget must divide k*log2(k) evenly"
    vps = budget // steps
    ranks, alive, halve, cums = [], [], [], []
    m, cum = k, 0
    for _ in range(steps):
        vpa = vps // m
        for i in range(m):
            for _ in range(vpa):
                ranks.append(i)
                alive.append(m)
                halve.append(False)
                cums.append(0)
        cum += vpa
        halve[-1] = True
        cums[-1] = cum
        m //= 2
    return (
        np.array(ranks, np.int32),
        np.array(alive, np.int32),
        np.array(halve),
        np.array(cums, np.int32),
    )


def make_gumbel_search(
    eng: TakEngine,
    evaluator,
    sampled_actions: int = 64,
    budget: int = 768,
    max_depth: int = 48,
):
    simulate = make_simulate(eng, evaluator, max_depth=max_depth)
    ranks, alive, halve, cums = sh_schedule(sampled_actions, budget)
    k = sampled_actions

    def search(tree: Tree, key, betas):
        """Returns (tree, chosen_slot [B]). jit-able; one compile per config."""
        b, _, c = tree.child_visit.shape
        bar = jnp.arange(b)
        betas = jnp.broadcast_to(jnp.asarray(betas, jnp.float32), (b,))

        # Root initialization (uses betas for in-tree PUCT).
        tree = simulate(tree, betas)

        g = jax.random.gumbel(key, (b, c))
        valid = tree.child_action[:, 0, :] >= 0
        noisy = jnp.where(valid, tree.child_logit[:, 0, :] + g, -jnp.inf)
        sel_score, sel_idx = jax.lax.top_k(noisy, k)  # logit+gumbel kept per slot
        sel_valid = sel_score > -jnp.inf
        sel_count = jnp.sum(sel_valid, axis=-1).astype(jnp.int32)

        ranks_c = jnp.asarray(ranks)
        alive_c = jnp.asarray(alive)
        halve_c = jnp.asarray(halve)
        cums_c = jnp.asarray(cums)

        def halve_fn(args, t):
            tree, sel_idx, sel_score, sel_valid, m_next = args
            # Re-rank the currently alive entries by logit+gumbel+sigma_select.
            flag = tree.child_flag[bar[:, None], 0, sel_idx]
            ply = tree.child_ply[bar[:, None], 0, sel_idx]
            val = tree.child_value[bar[:, None], 0, sel_idx]
            std = tree.child_std[bar[:, None], 0, sel_idx]
            q = ev.negated_float(flag, ply, val)
            cum = cums_c[t].astype(jnp.float32)
            sigma = (q + betas[:, None] * std) * (50.0 + cum)
            total = jnp.where(sel_valid, sel_score + sigma, -jnp.inf)
            # Only the first `alive` entries are live; rest already -inf via
            # sel_valid maintenance below.
            _, order = jax.lax.top_k(total, k)
            sel_idx2 = jnp.take_along_axis(sel_idx, order, axis=-1)
            sel_score2 = jnp.take_along_axis(sel_score, order, axis=-1)
            sel_valid2 = jnp.take_along_axis(sel_valid, order, axis=-1)
            keep = jnp.arange(k)[None, :] < m_next
            sel_valid2 = sel_valid2 & keep
            return tree, sel_idx2, sel_score2, sel_valid2

        def body(t, carry):
            tree, sel_idx, sel_score, sel_valid = carry
            i = ranks_c[t]
            cnt = jnp.maximum(jnp.minimum(alive_c[t], sel_count), 1)
            ii = (i % cnt).astype(jnp.int32)
            slot = jnp.take_along_axis(sel_idx, ii[:, None], axis=-1)[:, 0]
            slot = slot.clip(0)
            tree = simulate(tree, 0.0, forced_slot=slot, skip_root=True)
            tree, sel_idx, sel_score, sel_valid = jax.lax.cond(
                halve_c[t],
                lambda a: halve_fn(a[:4] + (alive_c[t] // 2,), t),
                lambda a: a[:4],
                (tree, sel_idx, sel_score, sel_valid),
            )
            return tree, sel_idx, sel_score, sel_valid

        tree, sel_idx, _, _ = jax.lax.fori_loop(
            0, len(ranks), body, (tree, sel_idx, sel_score, sel_valid)
        )
        chosen_slot = sel_idx[:, 0]

        # Recompute root statistics (batched.rs:372-406).
        ch_visit = tree.child_visit[:, 0, :]
        ch_flag = tree.child_flag[:, 0, :]
        ch_ply = tree.child_ply[:, 0, :]
        ch_val = tree.child_value[:, 0, :]
        ch_prob = tree.child_prob[:, 0, :]
        root_visit = jnp.sum(jnp.where(valid, ch_visit, 0), axis=-1) + 1

        any_loss = jnp.any(valid & (ch_flag == ev.LOSS), axis=-1)
        all_known = jnp.all(~valid | (ch_flag != ev.VALUE), axis=-1) & jnp.any(
            valid, axis=-1
        )
        complete = ~tree.node_incomplete[:, 0]
        solved = any_loss | (all_known & complete)
        mi = ev.argmin_eval(ch_flag, ch_ply, ch_val, valid)
        mf, mp, mv = ev.take_eval(ch_flag, ch_ply, ch_val, mi)
        sf, sp, sv = ev.negate(mf, mp, mv)

        visited = valid & (ch_visit > 0)
        q = ev.negated_float(ch_flag, ch_ply, ch_val)
        sum_p = jnp.sum(jnp.where(visited, ch_prob, 0.0), axis=-1)
        wq = jnp.sum(jnp.where(visited, ch_prob * q, 0.0), axis=-1)
        weighted = wq / jnp.maximum(sum_p, 1e-30)

        # Keep a previously known root's eval if the recheck is weaker.
        was_known = tree.root_flag != ev.VALUE
        tree = tree._replace(
            root_visit=root_visit,
            root_flag=jnp.where(solved, sf, jnp.where(was_known, tree.root_flag, 0)),
            root_ply=jnp.where(solved, sp, jnp.where(was_known, tree.root_ply, 0)),
            root_value=jnp.where(
                solved, sv, jnp.where(was_known, tree.root_value, weighted)
            ),
            root_std=jnp.where(solved, 0.0, tree.root_std),
        )
        return tree, chosen_slot

    return search
