"""Fused batched MCTS simulation kernels.

One `simulate` call = one simulation on every tree in the batch, entirely
on device: vectorized PUCT descent (masked while_loop), one batched
network evaluation, expansion, and backward propagation with the exact
win/loss/draw solver.  Mirrors the reference's forward/backward split
(takzero/src/search/node/mcts.rs:104-225) and selection formulas
(policy.rs:78-95,140-156):

* PUCT: q + c(N)*P*sqrt(N)/(1+n) + beta*sigma, c(N)=ln((1+N+500)/500)+4,
  win-children pruned unless the node is a proven loss;
* visit counts incremented along the path during the forward pass
  (including the stopping node);
* leaf: mean/std updated with the *raw* network value (no negation),
  children initialized to Value(-leaf_eval) with the leaf's std;
* ancestors: solver first (a losing child proves a win; all-known proves
  via negate(min child)), else incremental mean with the negated,
  per-edge-discounted propagated value (gamma=0.997);
* `forced_slot`/`skip_root` implement Gumbel sequential-halving subtree
  searches that leave root statistics untouched (batched.rs:251-356).

`make_simulate_batch` is the reference's `virtual`-feature serve-path
kernel (mcts.rs:268-328): K forward descents on the *same* trees (the
in-forward visit increments decorrelate them), known stops backed up
immediately, then ONE network call on all K*B collected leaves, then K
guarded expansion+backward passes.  This is what keeps the single-game
serve path (TEI/analysis) on the MXU at full batch width.

The evaluator is a closure ``envs -> (policy_logits [B,A], value [B],
variance [B])`` so network agents, Dummy and Simple plug in uniformly.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp

from ..tak.engine import TakEngine
from . import eval as ev
from .tree import Tree

NEG = jnp.float32(-3.0e38)


def make_topk(impl: str = "auto") -> Callable:
    """Expansion top-k selector: ``(masked_logits [B,A], k) -> (vals, idx)``.

    The search kernels are child-slot-permutation-invariant, so any exact
    k-largest selection works (see ops/topk.py).  ``auto`` honors the
    ``TAKZERO_TOPK`` env var (``lax`` | ``pallas`` | ``grouped``),
    defaulting on TPU to the Pallas radix-select — measured in-loop on
    v5e (bench.py, 2026-08-19): 32.5k vs 31.0k sims/s at C=128 fresh
    trees and 16.6k vs 15.8k at the flagship C=256+reuse config (~+5%
    over ``lax.top_k``; ``grouped`` loses ~4% at both) — and elsewhere
    to ``lax.top_k`` (the Pallas kernel only interprets off-TPU).
    """
    if impl == "auto":
        impl = os.environ.get("TAKZERO_TOPK", "")
        if not impl:
            impl = "pallas" if jax.default_backend() == "tpu" else "lax"
    if impl == "pallas":
        from ..ops.topk import exact_top_k_unsorted

        interpret = jax.default_backend() != "tpu"
        return lambda x, k: exact_top_k_unsorted(x, k, interpret=interpret)
    if impl == "grouped":
        from ..ops.topk import exact_top_k_unsorted_grouped

        return exact_top_k_unsorted_grouped
    if impl == "exact_ref":
        from ..ops.topk import exact_top_k_unsorted_reference

        return exact_top_k_unsorted_reference
    assert impl == "lax", impl
    return jax.lax.top_k


def _rows(arr, bar, cur):
    return arr[bar, cur]


def make_kernels(
    eng: TakEngine,
    evaluator: Callable,
    max_depth: int = 48,
    topk: str = "auto",
):
    """Build the phase kernels; returns (simulate, simulate_batch)."""

    step_batch = jax.vmap(eng.step)
    terminal_batch = jax.vmap(eng.terminal_kind)
    legal_batch = jax.vmap(eng.legal_mask)
    topk_fn = make_topk(topk)

    # ------------------------------------------------------------------
    # Forward phase: descent, visit increments, terminal discovery.
    # ------------------------------------------------------------------
    def forward(tree: Tree, beta, forced_slot, skip_root: bool):
        b, m, c = tree.child_visit.shape
        bar = jnp.arange(b)

        if not skip_root:
            tree = tree._replace(root_visit=tree.root_visit + 1)

        root_unexp = ~tree.root_expanded()
        root_known = tree.root_flag != 0
        lane_root_expand = root_unexp & ~root_known
        # Terminal/solved unexpanded root: nothing to do (lane inactive).

        zi = jnp.zeros((b,), jnp.int32)
        zb = jnp.zeros((b,), bool)
        init = dict(
            depth=jnp.int32(0),
            cur=zi,
            cur_flag=tree.root_flag,
            cur_visit=tree.root_visit,
            active=~root_unexp,
            path_node=jnp.full((b, max_depth), -1, jnp.int32),
            path_slot=jnp.full((b, max_depth), -1, jnp.int32),
            length=zi,
            stop_known=zb,
            known_f=zi,
            known_p=zi,
            known_v=jnp.zeros((b,), jnp.float32),
            stop_leaf=zb,
            leaf_parent=zi,
            leaf_slot=zi,
        )

        def cond(st):
            return (st["depth"] < max_depth) & jnp.any(st["active"])

        slot_iota = jnp.arange(tree.child_visit.shape[2], dtype=jnp.int32)

        def body(st):
            cur, active = st["cur"], st["active"]
            # One fused gather group per level: all 8 row stats share `cur`.
            row_action = _rows(tree.child_action, bar, cur)
            row_flag = _rows(tree.child_flag, bar, cur)
            row_ply = _rows(tree.child_ply, bar, cur)
            row_value = _rows(tree.child_value, bar, cur)
            row_prob = _rows(tree.child_prob, bar, cur)
            row_std = _rows(tree.child_std, bar, cur)
            row_visit = _rows(tree.child_visit, bar, cur)
            row_node = _rows(tree.child_node, bar, cur)

            valid = row_action >= 0
            q = ev.negated_float(row_flag, row_ply, row_value)
            pv = st["cur_visit"].astype(jnp.float32)[:, None]
            c_rate = jnp.log((1.0 + pv + 500.0) / 500.0) + 4.0
            u = c_rate * row_prob * jnp.sqrt(pv) / (1.0 + row_visit)
            score = q + u + beta[:, None] * row_std
            pruned = (row_flag == ev.WIN) & (st["cur_flag"] != ev.LOSS)[:, None]
            unpruned = valid & ~pruned
            # Fallback: an incomplete node may have only proven-win children
            # stored; select among them rather than an invalid slot.
            score = jnp.where(
                jnp.where(
                    jnp.any(unpruned, axis=-1, keepdims=True), unpruned, valid
                ),
                score,
                NEG,
            )
            slot = jnp.argmax(score, axis=-1).astype(jnp.int32)
            if forced_slot is not None:
                slot = jnp.where(st["depth"] == 0, forced_slot, slot)

            d = st["depth"]
            path_node = st["path_node"].at[:, d].set(jnp.where(active, cur, -1))
            path_slot = st["path_slot"].at[:, d].set(jnp.where(active, slot, -1))

            # Child-at-slot stats from the rows already in registers (one-hot
            # select on the VPU) — TPU dynamic gathers cost ~1us/row on the
            # scalar core, so a second dependent gather group here would
            # double the per-level latency.
            oh = slot[:, None] == slot_iota[None, :]

            def at_slot(row):
                return jnp.sum(jnp.where(oh, row, jnp.zeros_like(row)), axis=-1)

            cn = at_slot(row_node)
            cf = at_slot(row_flag)
            cp = at_slot(row_ply)
            cv = at_slot(row_value)
            cvisit = at_slot(row_visit) + 1  # this sim's visit

            unexp = cn < 0
            new_known = active & unexp & (cf != ev.VALUE)
            new_leaf = active & unexp & (cf == ev.VALUE)
            cont = active & ~unexp

            return dict(
                depth=d + 1,
                cur=jnp.where(cont, cn, cur),
                cur_flag=jnp.where(cont, cf, st["cur_flag"]),
                cur_visit=jnp.where(cont, cvisit, st["cur_visit"]),
                active=cont,
                path_node=path_node,
                path_slot=path_slot,
                length=jnp.where(new_known | new_leaf, d + 1, st["length"]),
                stop_known=st["stop_known"] | new_known,
                known_f=jnp.where(new_known, cf, st["known_f"]),
                known_p=jnp.where(new_known, cp, st["known_p"]),
                known_v=jnp.where(new_known, cv, st["known_v"]),
                stop_leaf=st["stop_leaf"] | new_leaf,
                leaf_parent=jnp.where(new_leaf, cur, st["leaf_parent"]),
                leaf_slot=jnp.where(new_leaf, slot, st["leaf_slot"]),
            )

        st = jax.lax.while_loop(cond, body, init)

        # Depth-clipped lanes: back up the current node's own eval — flag,
        # value AND ply from its parent edge (a clipped node can be solved,
        # e.g. descent continues through solved-expanded nodes; zeroing the
        # ply would drop the gamma^ply discount the reference applies to
        # proven results, eval.rs:95-105).
        clipped = st["active"]
        stop_known = st["stop_known"] | clipped
        known_f = jnp.where(clipped, st["cur_flag"], st["known_f"])
        clip_parent = tree.node_parent[bar, st["cur"]].clip(0)
        clip_slot = tree.node_slot[bar, st["cur"]].clip(0)
        clip_ply = tree.child_ply[bar, clip_parent, clip_slot]
        known_p = jnp.where(clipped, clip_ply, st["known_p"])
        # For an unsolved clipped node, back up its mean value.
        clip_val = tree.child_value[bar, clip_parent, clip_slot]
        known_v = jnp.where(clipped, clip_val, st["known_v"])
        length = jnp.where(clipped, max_depth, st["length"])
        stop_leaf = st["stop_leaf"]
        leaf_parent, leaf_slot = st["leaf_parent"], st["leaf_slot"]
        path_node, path_slot = st["path_node"], st["path_slot"]
        overflow = tree.overflow + clipped.astype(jnp.int32)

        # Deferred visit increments along the path — ROW-level one-hot
        # adds.  The elementwise [B,D]-indexed scatter-add lowering scales
        # linearly with pool size M (~+1ms per pool doubling at D=48 on
        # v5e — THE round-3 "pool-size cost cliff", tools/op_cliff.py /
        # tools/scatter_variants.py), while row-indexed scatters are
        # M-flat (1.10ms @ M=776 -> 1.37ms @ M=3104 vs 1.50 -> 3.90).
        # Padded path entries route to the scratch row with a zero row.
        live_path = path_node >= 0
        upd_rows = (
            live_path[:, :, None]
            & (path_slot[:, :, None] == slot_iota[None, None, :])
        ).astype(jnp.int32)
        path_rows = jnp.where(live_path, path_node, tree.child_visit.shape[1] - 1)
        child_visit = tree.child_visit.at[bar[:, None], path_rows].add(upd_rows)
        tree = tree._replace(child_visit=child_visit, overflow=overflow)

        # Leaf environment + terminal discovery.
        parent_env = jax.tree.map(lambda a: a[bar, leaf_parent], tree.node_env)
        leaf_action = tree.child_action[bar, leaf_parent, leaf_slot].clip(0)
        stepped = step_batch(parent_env, leaf_action)
        root_env = jax.tree.map(lambda a: a[bar, 0], tree.node_env)

        def lane_pick(s, r):
            mask = lane_root_expand.reshape((-1,) + (1,) * (s.ndim - 1))
            return jnp.where(mask, r, s)

        env_eval = jax.tree.map(lane_pick, stepped, root_env)
        tk = terminal_batch(env_eval)  # 0 ongoing / 1 win / 2 loss / 3 draw

        leaf_term = stop_leaf & (tk != 0)
        root_term = lane_root_expand & (tk != 0)
        # Terminal leaves become known with eval (tk, ply=0); std zeroed.
        # Non-terminal lanes redirect to the scratch row so the stores are
        # unconditional (no old-value gather / copy-on-write).
        scratch = tree.child_visit.shape[1] - 1
        t_node = jnp.where(leaf_term, leaf_parent, scratch)
        tree = tree._replace(
            child_flag=tree.child_flag.at[bar, t_node, leaf_slot].set(tk),
            child_ply=tree.child_ply.at[bar, t_node, leaf_slot].set(0),
            child_std=tree.child_std.at[bar, t_node, leaf_slot].set(0.0),
            root_flag=jnp.where(root_term, tk, tree.root_flag),
            root_ply=jnp.where(root_term, 0, tree.root_ply),
            root_std=jnp.where(root_term, 0.0, tree.root_std),
        )
        stop_known = stop_known | leaf_term
        known_f = jnp.where(leaf_term, tk, known_f)
        known_p = jnp.where(leaf_term, 0, known_p)
        known_v = jnp.where(leaf_term, 0.0, known_v)

        rec = dict(
            path_node=path_node,
            path_slot=path_slot,
            length=length,
            stop_known=stop_known,
            known_f=known_f,
            known_p=known_p,
            known_v=known_v,
            lane_eval_leaf=stop_leaf & ~leaf_term,
            lane_eval_root=lane_root_expand & ~root_term,
            lane_root_expand=lane_root_expand,
            leaf_parent=leaf_parent,
            leaf_slot=leaf_slot,
            env_eval=env_eval,
        )
        return tree, rec

    # ------------------------------------------------------------------
    # Apply network evaluation: leaf/root statistics + guarded expansion.
    # ------------------------------------------------------------------
    def apply_eval(tree: Tree, rec, logits, v_net, var_net):
        b, m, c = tree.child_visit.shape
        bar = jnp.arange(b)
        leaf_parent, leaf_slot = rec["leaf_parent"], rec["leaf_slot"]
        lane_eval_leaf = rec["lane_eval_leaf"]
        lane_eval_root = rec["lane_eval_root"]
        lane_root_expand = rec["lane_root_expand"]
        env_eval = rec["env_eval"]
        v_net = v_net.astype(jnp.float32)
        var_net = var_net.astype(jnp.float32)

        n_leaf = tree.child_visit[bar, leaf_parent, leaf_slot].astype(jnp.float32)
        old_v = tree.child_value[bar, leaf_parent, leaf_slot]
        old_s = tree.child_std[bar, leaf_parent, leaf_slot]
        leaf_v_after = old_v + (v_net - old_v) / jnp.maximum(n_leaf, 1.0)
        leaf_s_after = old_s + (jnp.sqrt(var_net) - old_s) / jnp.maximum(n_leaf, 1.0)
        # Scratch-redirected unconditional stores (see expansion below).
        ls_node = jnp.where(lane_eval_leaf, leaf_parent, m - 1)
        tree = tree._replace(
            child_value=tree.child_value.at[bar, ls_node, leaf_slot].set(
                leaf_v_after
            ),
            child_std=tree.child_std.at[bar, ls_node, leaf_slot].set(
                leaf_s_after
            ),
        )
        rn = tree.root_visit.astype(jnp.float32)
        root_v_after = tree.root_value + (v_net - tree.root_value) / jnp.maximum(
            rn, 1.0
        )
        root_s_after = tree.root_std + (
            jnp.sqrt(var_net) - tree.root_std
        ) / jnp.maximum(rn, 1.0)
        tree = tree._replace(
            root_value=jnp.where(lane_eval_root, root_v_after, tree.root_value),
            root_std=jnp.where(lane_eval_root, root_s_after, tree.root_std),
        )
        v_after = jnp.where(lane_eval_root, root_v_after, leaf_v_after)
        s_after = jnp.where(lane_eval_root, root_s_after, leaf_s_after)

        legal = legal_batch(env_eval)  # [B, A]
        masked_logits = jnp.where(legal, logits, NEG)
        top_vals, top_idx = topk_fn(masked_logits, c)
        valid_child = top_vals > NEG / 2
        mx = jnp.max(
            jnp.where(valid_child, top_vals, -jnp.inf), axis=-1, keepdims=True
        )
        ex = jnp.where(valid_child, jnp.exp(top_vals - mx), 0.0)
        probs = ex / jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-30)

        # Guarded expansion: in batched-eval mode two slots may reach the
        # same unexpanded leaf — only the first allocates a node.
        capacity = m - 1  # last pool row is the write-sink scratch node
        already = (
            tree.child_node[bar, leaf_parent, leaf_slot] >= 0
        ) & ~lane_root_expand
        # Rows come from the free list (descend_batch recycles freed rows
        # in place instead of compacting the pool).
        alloc_row = tree.free_rows[bar, tree.alloc_ptr.clip(0, m - 1)]
        can_expand = lane_root_expand | (tree.alloc_ptr < tree.free_count)
        expanding = (
            (lane_eval_leaf | lane_eval_root) & can_expand & ~already
        )
        # Non-expanding lanes write to the scratch row, making every store
        # below unconditional — a masked where(new, old) store costs an
        # extra old-row gather and a copy-on-write per array per sim.
        new_node = jnp.where(
            expanding, jnp.where(lane_root_expand, 0, alloc_row), capacity
        )

        def put_row(arr, row):
            return arr.at[bar, new_node].set(row.astype(arr.dtype))

        tree = tree._replace(
            child_action=put_row(
                tree.child_action, jnp.where(valid_child, top_idx, -1)
            ),
            child_logit=put_row(
                tree.child_logit, jnp.where(valid_child, top_vals, 0.0)
            ),
            child_prob=put_row(tree.child_prob, probs),
            child_visit=put_row(tree.child_visit, jnp.zeros((b, c), jnp.int32)),
            child_flag=put_row(tree.child_flag, jnp.zeros((b, c), jnp.int32)),
            child_ply=put_row(tree.child_ply, jnp.zeros((b, c), jnp.int32)),
            child_value=put_row(
                tree.child_value, jnp.broadcast_to(-v_after[:, None], (b, c))
            ),
            child_std=put_row(
                tree.child_std, jnp.broadcast_to(s_after[:, None], (b, c))
            ),
            child_node=put_row(tree.child_node, jnp.full((b, c), -1, jnp.int32)),
        )
        legal_count = jnp.sum(legal, axis=-1)
        leaf_expand = expanding & lane_eval_leaf
        tree = tree._replace(
            node_parent=tree.node_parent.at[bar, new_node].set(
                jnp.where(leaf_expand, leaf_parent, -1)
            ),
            node_slot=tree.node_slot.at[bar, new_node].set(
                jnp.where(leaf_expand, leaf_slot, -1)
            ),
            node_incomplete=tree.node_incomplete.at[bar, new_node].set(
                legal_count > c
            ),
            node_env=jax.tree.map(
                lambda pool, val: pool.at[bar, new_node].set(
                    val.astype(pool.dtype)
                ),
                tree.node_env,
                env_eval,
            ),
            child_node=tree.child_node.at[
                bar, jnp.where(leaf_expand, leaf_parent, capacity), leaf_slot
            ].set(new_node),
            node_count=tree.node_count + leaf_expand.astype(jnp.int32),
            alloc_ptr=tree.alloc_ptr + leaf_expand.astype(jnp.int32),
            node_live=tree.node_live.at[bar, new_node].set(expanding),
            overflow=tree.overflow
            + ((lane_eval_leaf | lane_eval_root) & ~can_expand).astype(jnp.int32),
        )
        return tree

    # ------------------------------------------------------------------
    # Backward propagation.
    # ------------------------------------------------------------------
    def backward(tree: Tree, rec, v_net, var_net, skip_root: bool, mode: str):
        """mode: 'all' (known + leaf), 'known', or 'leaf'."""
        b, m, c = tree.child_visit.shape
        bar = jnp.arange(b)
        path_node, path_slot = rec["path_node"], rec["path_slot"]
        length = rec["length"]
        stop_known = rec["stop_known"]
        lane_eval_leaf = rec["lane_eval_leaf"]

        if mode == "known":
            active_bwd = stop_known
        elif mode == "leaf":
            active_bwd = lane_eval_leaf
        else:
            active_bwd = stop_known | lane_eval_leaf
        v_net = v_net.astype(jnp.float32)
        var_net = var_net.astype(jnp.float32)

        prop_f = jnp.where(stop_known, rec["known_f"], ev.VALUE)
        prop_p = jnp.where(stop_known, rec["known_p"], 0)
        prop_v = jnp.where(stop_known, rec["known_v"], ev.DISCOUNT * v_net)
        prop_var = jnp.where(stop_known, 0.0, ev.DISCOUNT**2 * var_net)

        min_j = 1 if skip_root else 0
        jmax = jnp.max(jnp.where(active_bwd, length, 0))

        def bcond(carry):
            return carry["j"] >= min_j

        slot_iota = jnp.arange(c, dtype=jnp.int32)

        def bbody(carry):
            j = carry["j"]
            tr: Tree = carry["tree"]
            part = active_bwd & (j < length)
            node_j = path_node[bar, j.clip(0)].clip(0)
            is_root = j == 0

            pn = jnp.where(is_root, 0, path_node[bar, (j - 1).clip(0)]).clip(0)
            ps = jnp.where(is_root, 0, path_slot[bar, (j - 1).clip(0)]).clip(0)

            # ONE stacked gather group fetches both rows this level needs:
            # the children of node_j (solver inputs) and the parent row pn
            # (stats of the slot being updated) — dynamic row access is
            # scalar-core latency-bound, so group count dominates cost.
            both = jnp.stack([node_j, pn], axis=1)  # [B, 2]
            bar2 = bar[:, None]
            g_action = tr.child_action[bar2, both]  # [B, 2, C]
            g_flag = tr.child_flag[bar2, both]
            g_ply = tr.child_ply[bar2, both]
            g_value = tr.child_value[bar2, both]
            g_std = tr.child_std[bar2, both]
            g_visit = tr.child_visit[bar2, both]

            oh = ps[:, None] == slot_iota[None, :]  # [B, C] parent-slot mask

            def at_ps(row):
                return jnp.sum(jnp.where(oh, row, jnp.zeros_like(row)), axis=-1)

            # Node stats (from parent slot, or root arrays).
            sf = jnp.where(is_root, tr.root_flag, at_ps(g_flag[:, 1]))
            sp = jnp.where(is_root, tr.root_ply, at_ps(g_ply[:, 1]))
            sv = jnp.where(is_root, tr.root_value, at_ps(g_value[:, 1]))
            ss = jnp.where(is_root, tr.root_std, at_ps(g_std[:, 1]))
            svisit = jnp.where(is_root, tr.root_visit, at_ps(g_visit[:, 1]))

            # Children of this node.
            ca, cfl, cpl, cva = (
                g_action[:, 0],
                g_flag[:, 0],
                g_ply[:, 0],
                g_value[:, 0],
            )
            validc_ = ca >= 0
            all_known = jnp.all(~validc_ | (cfl != ev.VALUE), axis=-1) & jnp.any(
                validc_, axis=-1
            )
            incomplete = tr.node_incomplete[bar2, both][:, 0]  # same index group
            pf, pp, pv_ = carry["pf"], carry["pp"], carry["pv"]
            trigger = (pf == ev.LOSS) | (all_known & ~incomplete)
            mi = ev.argmin_eval(cfl, cpl, cva, validc_)
            mf, mp, mv = ev.take_eval(cfl, cpl, cva, mi)
            solved_f, solved_p, solved_v = ev.negate(mf, mp, mv)

            new_f = jnp.where(trigger, solved_f, sf)
            new_p = jnp.where(trigger, solved_p, sp)
            known_now = new_f != ev.VALUE

            negated = ev.negated_float(pf, pp, pv_)
            visf = jnp.maximum(svisit.astype(jnp.float32), 1.0)
            val_upd = sv + (negated - sv) / visf
            std_upd = ss + (jnp.sqrt(carry["pvar"]) - ss) / visf
            new_v = jnp.where(trigger, solved_v, jnp.where(known_now, sv, val_upd))
            new_s = jnp.where(trigger, 0.0, jnp.where(known_now, ss, std_upd))

            # Write back (only participating lanes).
            def w(old, new):
                return jnp.where(part, new, old)

            upd_root = part & is_root
            upd_slot = part & ~is_root

            # Blend the updated slot into the (already gathered) parent row
            # and write the whole row back: one fused scatter group.
            sel = upd_slot[:, None] & oh

            def blend(row, new):
                return jnp.where(sel, new[:, None].astype(row.dtype), row)

            tr = tr._replace(
                root_flag=jnp.where(upd_root, new_f, tr.root_flag),
                root_ply=jnp.where(upd_root, new_p, tr.root_ply),
                root_value=jnp.where(upd_root, new_v, tr.root_value),
                root_std=jnp.where(upd_root, new_s, tr.root_std),
                child_flag=tr.child_flag.at[bar, pn].set(
                    blend(g_flag[:, 1], new_f)
                ),
                child_ply=tr.child_ply.at[bar, pn].set(blend(g_ply[:, 1], new_p)),
                child_value=tr.child_value.at[bar, pn].set(
                    blend(g_value[:, 1], new_v)
                ),
                child_std=tr.child_std.at[bar, pn].set(blend(g_std[:, 1], new_s)),
            )

            # Outgoing propagated value.
            out_f = jnp.where(known_now, new_f, ev.VALUE)
            out_p = jnp.where(known_now, new_p, 0)
            out_v = jnp.where(known_now, new_v, negated * ev.DISCOUNT)
            out_var = jnp.where(
                known_now, new_s * new_s, carry["pvar"] * ev.DISCOUNT**2
            )

            return dict(
                j=j - 1,
                tree=tr,
                pf=w(pf, out_f),
                pp=w(pp, out_p),
                pv=w(pv_, out_v),
                pvar=w(carry["pvar"], out_var),
            )

        carry = jax.lax.while_loop(
            bcond,
            bbody,
            dict(
                j=jmax - 1,
                tree=tree,
                pf=prop_f,
                pp=prop_p,
                pv=prop_v,
                pvar=prop_var,
            ),
        )
        return carry["tree"]

    # ------------------------------------------------------------------
    # Public kernels.
    # ------------------------------------------------------------------
    def simulate(tree: Tree, beta, forced_slot=None, *, skip_root: bool = False):
        b = tree.batch_size
        beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (b,))
        tree, rec = forward(tree, beta, forced_slot, skip_root)
        logits, v_net, var_net = evaluator(rec["env_eval"])
        tree = apply_eval(tree, rec, logits, v_net, var_net)
        return backward(tree, rec, v_net, var_net, skip_root, mode="all")

    def simulate_batch(tree: Tree, beta, k: int):
        """K simulations per tree with ONE network call (mcts.rs:268-328).

        Precondition: all roots expanded and unsolved-or-solved (run one
        plain `simulate` first on a fresh tree).  Root statistics update
        normally (no skip_root).
        """
        b = tree.batch_size
        beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (b,))

        def fwd_body(tree, _):
            tree, rec = forward(tree, beta, None, False)
            zero = jnp.zeros((b,), jnp.float32)
            # Known stops (terminals, solved subtrees, depth clips) are
            # backed up immediately, as the reference does.
            tree = backward(tree, rec, zero, zero, False, mode="known")
            return tree, rec

        tree, recs = jax.lax.scan(fwd_body, tree, None, length=k)

        # One network call over all K*B collected leaves.
        flat_envs = jax.tree.map(
            lambda x: x.reshape((k * b,) + x.shape[2:]), recs["env_eval"]
        )
        logits, v_net, var_net = evaluator(flat_envs)
        logits = logits.reshape((k, b, -1))
        v_net = v_net.reshape((k, b)).astype(jnp.float32)
        var_net = var_net.reshape((k, b)).astype(jnp.float32)

        def bwd_body(tree, inp):
            rec, lg, vn, vr = inp
            tree = apply_eval(tree, rec, lg, vn, vr)
            tree = backward(tree, rec, vn, vr, False, mode="leaf")
            return tree, None

        tree, _ = jax.lax.scan(bwd_body, tree, (recs, logits, v_net, var_net))
        return tree

    simulate.phases = dict(forward=forward, apply_eval=apply_eval, backward=backward)
    return simulate, simulate_batch


def make_simulate(
    eng: TakEngine,
    evaluator: Callable,
    max_depth: int = 48,
):
    """Build `simulate(tree, beta, forced_slot, skip_root) -> Tree`."""
    simulate, _ = make_kernels(eng, evaluator, max_depth)
    return simulate


def make_simulate_batch(
    eng: TakEngine,
    evaluator: Callable,
    max_depth: int = 48,
):
    """Build `simulate_batch(tree, beta, k) -> Tree` (serve-path kernel)."""
    _, simulate_batch = make_kernels(eng, evaluator, max_depth)
    return simulate_batch
