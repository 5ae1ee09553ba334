"""Wavefront serve-path kernel: K simulations per NN call, pipelined.

The reference's serve path (`virtual` feature, mcts.rs:268-328; used by
TEI, tei/src/main.rs:251-296) collects K leaves with K *sequential*
descents of the same tree, decorrelated by virtual visit counts.  The
round-1 port (`core.make_simulate_batch`) kept that shape — a
`lax.scan` of K full descents — which is latency-bound at B=1: ~1000
dependent gather groups per 128-simulation chunk (~533 nps on chip).

This kernel pipelines the K descents as a *wavefront*: path k starts at
iteration k, every active path advances ONE level per iteration, and
visit increments commit level-by-level via scatter-add.  The stagger
makes the schedule *exactly* sequential-equivalent for visit accounting:
a path choosing at depth d needs only the visit counts of depth-d edges,
and every earlier path's depth-d commit happened at a strictly earlier
iteration.  Two paths can never occupy the same node in the same
iteration (equal node ⇒ equal depth ⇒ equal path id), so the per-level
scatters are conflict-free.  Total sequential rounds drop from
O(K·depth) to O(K + depth).

After the single batched NN call, expansion dedups paths that stopped at
the same (parent, slot) (the sequential `already` guard) with a [K,K]
group-combine, and the backward pass is level-synchronized from the
deepest stop upward — writes at level d never touch state read at
levels < d, so it is ordering-equivalent to the sequential backward.

Documented deviations from `simulate_batch` (both value-only; visit
counts, expansion sets, and solver proofs are unaffected):
* known-stop backups happen at chunk end instead of interleaved between
  descents (in-chunk proofs don't redirect later descents of the SAME
  chunk);
* duplicate contributions to one edge combine as
  ``v += (Σaᵢ - m·v)/n`` instead of m sequential ``v += (aᵢ - v)/n``
  folds (first-order identical; both approximate the running mean).

Layout: every per-path quantity is [B, K]; the tree stays the standard
SoA pool.  B=1 for TEI, but the kernel is batch-generic.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..tak.engine import TakEngine
from . import eval as ev
from .tree import Tree

NEG = jnp.float32(-3.0e38)


def make_serve_chunk(
    eng: TakEngine,
    evaluator: Callable,
    k: int,
    max_depth: int = 64,
    topk: str = "auto",
):
    """Build `serve_chunk(tree, beta) -> Tree` running k simulations.

    Lanes whose root is expanded run k simulations each (run one plain
    `simulate` on a fresh tree first, as the TEI driver does); lanes
    with an unexpanded root (e.g. a terminal position) are no-ops.
    """
    from .core import make_topk

    step_batch = jax.vmap(eng.step)
    terminal_batch = jax.vmap(eng.terminal_kind)
    legal_batch = jax.vmap(eng.legal_mask)
    topk_fn = make_topk(topk)
    K = k

    def serve_chunk(tree: Tree, beta):
        b, m, c = tree.child_visit.shape
        bar = jnp.arange(b)[:, None]  # [B,1]
        kio = jnp.arange(K, dtype=jnp.int32)[None, :]  # [1,K]
        slot_iota = jnp.arange(c, dtype=jnp.int32)
        dio = jnp.arange(max_depth, dtype=jnp.int32)
        scratch = m - 1
        beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (b,))

        zk_i = jnp.zeros((b, K), jnp.int32)
        zk_f = jnp.zeros((b, K), jnp.float32)
        zk_b = jnp.zeros((b, K), bool)

        # A lane whose root was never expanded (terminal position, or a
        # `go` before any plain simulate) has no edges to descend: an
        # all-(-1) child row would make every path fabricate a leaf at
        # (node 0, slot 0), step the terminal env with action 0, and
        # expand a node from the garbage state.  Gate such lanes off
        # entirely (core.py's kernels gate the same way via root_unexp).
        root_ok = jnp.any(tree.child_action[:, 0, :] >= 0, axis=-1)  # [B]

        # ------------------------------------------------------------------
        # Phase A: pipelined forward descent.
        # ------------------------------------------------------------------
        init = dict(
            child_visit=tree.child_visit,
            alive=jnp.broadcast_to(root_ok[:, None], (b, K)),
            cur=zk_i,
            cur_flag=jnp.broadcast_to(tree.root_flag[:, None], (b, K)),
            # Path k's root-level parent count: initial visits + the k+1
            # activation increments visible to it (its own included).
            cur_visit=tree.root_visit[:, None] + kio + 1,
            path_node=jnp.full((b, K, max_depth), -1, jnp.int32),
            path_slot=jnp.full((b, K, max_depth), -1, jnp.int32),
            length=zk_i,
            stop_known=zk_b,
            known_f=zk_i,
            known_p=zk_i,
            known_v=zk_f,
            stop_leaf=zk_b,
            leaf_parent=zk_i,
            leaf_slot=zk_i,
            clip_count=jnp.zeros((b,), jnp.int32),
        )

        def fwd_body(i, st):
            d = i - kio  # [1,K] depth of each path this iteration
            active = st["alive"] & (d >= 0)
            curc = jnp.where(active, st["cur"], scratch)

            row_action = tree.child_action[bar, curc]  # [B,K,C]
            row_flag = tree.child_flag[bar, curc]
            row_ply = tree.child_ply[bar, curc]
            row_value = tree.child_value[bar, curc]
            row_prob = tree.child_prob[bar, curc]
            row_std = tree.child_std[bar, curc]
            row_visit = st["child_visit"][bar, curc]
            row_node = tree.child_node[bar, curc]

            valid = row_action >= 0
            q = ev.negated_float(row_flag, row_ply, row_value)
            pv = st["cur_visit"].astype(jnp.float32)[:, :, None]
            c_rate = jnp.log((1.0 + pv + 500.0) / 500.0) + 4.0
            u = c_rate * row_prob * jnp.sqrt(pv) / (1.0 + row_visit)
            score = q + u + beta[:, None, None] * row_std
            pruned = (row_flag == ev.WIN) & (st["cur_flag"] != ev.LOSS)[
                :, :, None
            ]
            unpruned = valid & ~pruned
            score = jnp.where(
                jnp.where(
                    jnp.any(unpruned, axis=-1, keepdims=True), unpruned, valid
                ),
                score,
                NEG,
            )
            slot = jnp.argmax(score, axis=-1).astype(jnp.int32)

            rec = active[:, :, None] & (
                dio[None, None, :] == d[:, :, None]
            )  # [B,K,D]
            path_node = jnp.where(rec, st["cur"][:, :, None], st["path_node"])
            path_slot = jnp.where(rec, slot[:, :, None], st["path_slot"])

            oh = slot[:, :, None] == slot_iota[None, None, :]

            def at_slot(row):
                return jnp.sum(
                    jnp.where(oh, row, jnp.zeros_like(row)), axis=-1
                )

            cn = at_slot(row_node)
            cf = at_slot(row_flag)
            cp = at_slot(row_ply)
            cv = at_slot(row_value)
            cvisit = at_slot(row_visit) + 1

            unexp = cn < 0
            new_known = active & unexp & (cf != ev.VALUE)
            new_leaf = active & unexp & (cf == ev.VALUE)
            clip_now = active & ~unexp & (d + 1 >= max_depth)
            cont = active & ~unexp & ~clip_now
            stopped = new_known | new_leaf | clip_now

            # Row-level one-hot add: the elementwise [B,K]-indexed
            # scatter-add lowering scales linearly with pool size M
            # (the pool-size cost cliff — see core.py forward, tools/
            # scatter_variants.py); row-indexed scatters are M-flat.
            # Inactive lanes already route to the scratch row (zero add).
            child_visit = st["child_visit"].at[bar, curc].add(
                (active[:, :, None] & oh).astype(jnp.int32)
            )

            return dict(
                child_visit=child_visit,
                alive=st["alive"] & ~stopped,
                cur=jnp.where(cont, cn, st["cur"]),
                cur_flag=jnp.where(cont, cf, st["cur_flag"]),
                cur_visit=jnp.where(cont, cvisit, st["cur_visit"]),
                path_node=path_node,
                path_slot=path_slot,
                length=jnp.where(stopped, d + 1, st["length"]),
                stop_known=st["stop_known"] | new_known | clip_now,
                # Depth-clipped paths back up the reached node's own eval
                # (forward()'s clip handling): flag, value AND ply from its
                # edge — a clipped node can be solved, and its gamma^ply
                # discount must survive (eval.rs:95-105).
                known_f=jnp.where(
                    new_known | clip_now, cf, st["known_f"]
                ),
                known_p=jnp.where(new_known | clip_now, cp, st["known_p"]),
                known_v=jnp.where(
                    new_known | clip_now, cv, st["known_v"]
                ),
                stop_leaf=st["stop_leaf"] | new_leaf,
                leaf_parent=jnp.where(new_leaf, st["cur"], st["leaf_parent"]),
                leaf_slot=jnp.where(new_leaf, slot, st["leaf_slot"]),
                clip_count=st["clip_count"]
                + jnp.sum(clip_now, axis=1).astype(jnp.int32),
            )

        st = jax.lax.fori_loop(0, K + max_depth, fwd_body, init)
        tree = tree._replace(
            child_visit=st["child_visit"],
            root_visit=tree.root_visit + K * root_ok.astype(jnp.int32),
            overflow=tree.overflow + st["clip_count"],
        )

        stop_leaf = st["stop_leaf"]
        leaf_parent, leaf_slot = st["leaf_parent"], st["leaf_slot"]
        length = st["length"]
        path_node, path_slot = st["path_node"], st["path_slot"]

        # Leaf environments + terminal discovery (one vectorized step).
        lpc = jnp.where(stop_leaf, leaf_parent, 0)
        penv = jax.tree.map(lambda a: a[bar, lpc], tree.node_env)
        la = tree.child_action[bar, lpc, leaf_slot].clip(0)
        flat = lambda x: x.reshape((b * K,) + x.shape[2:])  # noqa: E731
        stepped = step_batch(jax.tree.map(flat, penv), flat(la))
        tk = terminal_batch(stepped).reshape(b, K)
        env_eval = stepped  # [B*K] flattened

        leaf_term = stop_leaf & (tk != 0)
        t_node = jnp.where(leaf_term, leaf_parent, scratch)
        tree = tree._replace(
            child_flag=tree.child_flag.at[bar, t_node, leaf_slot].set(tk),
            child_ply=tree.child_ply.at[bar, t_node, leaf_slot].set(0),
            child_std=tree.child_std.at[bar, t_node, leaf_slot].set(0.0),
        )
        stop_known = st["stop_known"] | leaf_term
        known_f = jnp.where(leaf_term, tk, st["known_f"])
        known_p = jnp.where(leaf_term, 0, st["known_p"])
        known_v = jnp.where(leaf_term, 0.0, st["known_v"])
        lane_eval = stop_leaf & ~leaf_term

        # ------------------------------------------------------------------
        # Phase B: ONE network call over all K*B leaves.
        # ------------------------------------------------------------------
        logits, v_net, var_net = evaluator(env_eval)
        v_net = v_net.reshape(b, K).astype(jnp.float32)
        var_net = var_net.reshape(b, K).astype(jnp.float32)

        # ------------------------------------------------------------------
        # Phase C: leaf stat updates + deduped expansion.
        # ------------------------------------------------------------------
        # Group paths that stopped at the same (parent, slot): the [K,K]
        # membership matrix is tiny (K<=256).
        gkey = jnp.where(
            lane_eval, leaf_parent * c + leaf_slot, -1 - kio
        )  # [B,K]; unique dummy keys keep non-eval paths ungrouped
        same = gkey[:, :, None] == gkey[:, None, :]  # [B,K,K]
        is_first = jnp.argmax(same, axis=2).astype(jnp.int32) == kio
        evalm = lane_eval[:, None, :]
        m_cnt = jnp.sum(same & evalm, axis=2).astype(jnp.float32)
        sum_v = jnp.sum(
            jnp.where(same & evalm, v_net[:, None, :], 0.0), axis=2
        )
        sum_s = jnp.sum(
            jnp.where(same & evalm, jnp.sqrt(var_net)[:, None, :], 0.0),
            axis=2,
        )

        n_leaf = tree.child_visit[bar, lpc, leaf_slot].astype(jnp.float32)
        old_v = tree.child_value[bar, lpc, leaf_slot]
        old_s = tree.child_std[bar, lpc, leaf_slot]
        denom = jnp.maximum(n_leaf, 1.0)
        new_leaf_v = old_v + (sum_v - m_cnt * old_v) / denom
        new_leaf_s = old_s + (sum_s - m_cnt * old_s) / denom
        wfirst = is_first & lane_eval
        w_node = jnp.where(wfirst, leaf_parent, scratch)
        tree = tree._replace(
            child_value=tree.child_value.at[bar, w_node, leaf_slot].set(
                new_leaf_v
            ),
            child_std=tree.child_std.at[bar, w_node, leaf_slot].set(
                new_leaf_s
            ),
        )

        # Expansion (one batched top-k over all leaves).
        legal = legal_batch(env_eval)  # [B*K, A]
        masked_logits = jnp.where(legal, logits, NEG)
        top_vals, top_idx = topk_fn(masked_logits, c)
        top_vals = top_vals.reshape(b, K, c)
        top_idx = top_idx.reshape(b, K, c)
        valid_child = top_vals > NEG / 2
        mx = jnp.max(
            jnp.where(valid_child, top_vals, -jnp.inf), axis=-1, keepdims=True
        )
        ex = jnp.where(valid_child, jnp.exp(top_vals - mx), 0.0)
        probs = ex / jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-30)
        legal_count = jnp.sum(legal, axis=-1).reshape(b, K)

        want = wfirst
        pos = jnp.cumsum(want.astype(jnp.int32), axis=1) - want
        # Rows come from the free list (descend recycles rows in place).
        idxp = tree.alloc_ptr[:, None] + pos
        can = idxp < tree.free_count[:, None]
        new_node = tree.free_rows[bar, idxp.clip(0, m - 1)]
        expanding = want & can
        nn_ = jnp.where(expanding, new_node, scratch)

        v_init = jnp.broadcast_to(-new_leaf_v[:, :, None], (b, K, c))
        s_init = jnp.broadcast_to(new_leaf_s[:, :, None], (b, K, c))

        def put_rows(arr, rows):
            return arr.at[bar, nn_].set(rows.astype(arr.dtype))

        # New-node child rows, then the parent edge pointers (disjoint rows:
        # nn_ are fresh rows, leaf_parent rows already exist).
        child_node_new = put_rows(
            tree.child_node, jnp.full((b, K, c), -1, jnp.int32)
        )
        child_node_new = child_node_new.at[
            bar, jnp.where(expanding, leaf_parent, scratch), leaf_slot
        ].set(jnp.where(expanding, new_node, -1))

        tree = tree._replace(
            child_action=put_rows(
                tree.child_action, jnp.where(valid_child, top_idx, -1)
            ),
            child_logit=put_rows(
                tree.child_logit, jnp.where(valid_child, top_vals, 0.0)
            ),
            child_prob=put_rows(tree.child_prob, probs),
            child_visit=put_rows(tree.child_visit, jnp.zeros((b, K, c), jnp.int32)),
            child_flag=put_rows(tree.child_flag, jnp.zeros((b, K, c), jnp.int32)),
            child_ply=put_rows(tree.child_ply, jnp.zeros((b, K, c), jnp.int32)),
            child_value=put_rows(tree.child_value, v_init),
            child_std=put_rows(tree.child_std, s_init),
            child_node=child_node_new,
            node_parent=tree.node_parent.at[bar, nn_].set(
                jnp.where(expanding, leaf_parent, -1)
            ),
            node_slot=tree.node_slot.at[bar, nn_].set(
                jnp.where(expanding, leaf_slot, -1)
            ),
            node_incomplete=tree.node_incomplete.at[bar, nn_].set(
                legal_count > c
            ),
            node_env=jax.tree.map(
                lambda pool, val: pool.at[bar, nn_].set(
                    val.reshape((b, K) + val.shape[1:]).astype(pool.dtype)
                ),
                tree.node_env,
                env_eval,
            ),
            node_count=tree.node_count
            + jnp.sum(expanding, axis=1).astype(jnp.int32),
            alloc_ptr=tree.alloc_ptr
            + jnp.sum(expanding, axis=1).astype(jnp.int32),
            node_live=tree.node_live.at[bar, nn_].set(expanding),
            overflow=tree.overflow
            + jnp.sum(want & ~can, axis=1).astype(jnp.int32),
        )

        # ------------------------------------------------------------------
        # Phase D: level-synchronized backward.
        # ------------------------------------------------------------------
        active_bwd = stop_known | lane_eval
        pf = jnp.where(stop_known, known_f, ev.VALUE)
        pp = jnp.where(stop_known, known_p, 0)
        pv_ = jnp.where(stop_known, known_v, ev.DISCOUNT * v_net)
        pvar = jnp.where(stop_known, 0.0, ev.DISCOUNT**2 * var_net)

        jmax = jnp.max(jnp.where(active_bwd, length, 0))

        def bcond(carry):
            return carry["j"] >= 0

        def bbody(carry):
            j = carry["j"]
            tr: Tree = carry["tree"]
            part = active_bwd & (j < length)
            node_j = jnp.where(
                part, path_node[bar, kio, j.clip(0)], scratch
            ).clip(0)
            is_root = j == 0
            pn = jnp.where(
                is_root, 0, path_node[bar, kio, (j - 1).clip(0)]
            ).clip(0)
            ps = jnp.where(
                is_root, 0, path_slot[bar, kio, (j - 1).clip(0)]
            ).clip(0)

            both = jnp.concatenate([node_j, pn], axis=1)  # [B, 2K]
            g_action = tr.child_action[bar, both]
            g_flag = tr.child_flag[bar, both]
            g_ply = tr.child_ply[bar, both]
            g_value = tr.child_value[bar, both]
            g_std = tr.child_std[bar, both]
            g_visit = tr.child_visit[bar, both]

            ohp = ps[:, :, None] == slot_iota[None, None, :]

            def at_ps(row):
                return jnp.sum(jnp.where(ohp, row, jnp.zeros_like(row)), axis=-1)

            pr = slice(K, 2 * K)
            sf = jnp.where(is_root, tr.root_flag[:, None], at_ps(g_flag[:, pr]))
            sp = jnp.where(is_root, tr.root_ply[:, None], at_ps(g_ply[:, pr]))
            sv = jnp.where(is_root, tr.root_value[:, None], at_ps(g_value[:, pr]))
            ss = jnp.where(is_root, tr.root_std[:, None], at_ps(g_std[:, pr]))
            svisit = jnp.where(
                is_root, tr.root_visit[:, None], at_ps(g_visit[:, pr])
            )

            ca = g_action[:, :K]
            cfl = g_flag[:, :K]
            cpl = g_ply[:, :K]
            cva = g_value[:, :K]
            validc_ = ca >= 0
            all_known = jnp.all(~validc_ | (cfl != ev.VALUE), axis=-1) & jnp.any(
                validc_, axis=-1
            )
            incomplete = tr.node_incomplete[bar, node_j]
            trigger = (carry["pf"] == ev.LOSS) | (all_known & ~incomplete)

            # Group paths updating the same edge this level (same node_j).
            gkey2 = jnp.where(part, node_j, -1 - kio)
            same2 = gkey2[:, :, None] == gkey2[:, None, :]
            partm = part[:, None, :]
            grp_trigger = jnp.any(same2 & partm & trigger[:, None, :], axis=2)

            mi = ev.argmin_eval(cfl, cpl, cva, validc_)
            mf, mp, mv = ev.take_eval(cfl, cpl, cva, mi)
            solved_f, solved_p, solved_v = ev.negate(mf, mp, mv)

            new_f = jnp.where(grp_trigger, solved_f, sf)
            new_p = jnp.where(grp_trigger, solved_p, sp)
            known_now = new_f != ev.VALUE

            negated = ev.negated_float(carry["pf"], carry["pp"], carry["pv"])
            m_cnt2 = jnp.sum(same2 & partm, axis=2).astype(jnp.float32)
            sum_neg = jnp.sum(
                jnp.where(same2 & partm, negated[:, None, :], 0.0), axis=2
            )
            sum_sq = jnp.sum(
                jnp.where(
                    same2 & partm, jnp.sqrt(carry["pvar"])[:, None, :], 0.0
                ),
                axis=2,
            )
            visf = jnp.maximum(svisit.astype(jnp.float32), 1.0)
            val_upd = sv + (sum_neg - m_cnt2 * sv) / visf
            std_upd = ss + (sum_sq - m_cnt2 * ss) / visf
            new_v = jnp.where(
                grp_trigger, solved_v, jnp.where(known_now, sv, val_upd)
            )
            new_s = jnp.where(
                grp_trigger, 0.0, jnp.where(known_now, ss, std_upd)
            )

            first2 = jnp.argmax(same2, axis=2).astype(jnp.int32) == kio
            upd_root = part & is_root & first2
            upd_slot = part & ~is_root & first2

            rooted = jnp.any(upd_root, axis=1)
            pick_root = lambda x, old: jnp.where(  # noqa: E731
                rooted,
                jnp.sum(jnp.where(upd_root, x, jnp.zeros_like(x)), axis=1),
                old,
            )
            wn = jnp.where(upd_slot, pn, scratch)
            tr = tr._replace(
                root_flag=pick_root(new_f, tr.root_flag),
                root_ply=pick_root(new_p, tr.root_ply),
                root_value=pick_root(new_v, tr.root_value),
                root_std=pick_root(new_s, tr.root_std),
                child_flag=tr.child_flag.at[bar, wn, ps].set(new_f),
                child_ply=tr.child_ply.at[bar, wn, ps].set(new_p),
                child_value=tr.child_value.at[bar, wn, ps].set(new_v),
                child_std=tr.child_std.at[bar, wn, ps].set(new_s),
            )

            out_f = jnp.where(known_now, new_f, ev.VALUE)
            out_p = jnp.where(known_now, new_p, 0)
            out_v = jnp.where(known_now, new_v, negated * ev.DISCOUNT)
            out_var = jnp.where(
                known_now, new_s * new_s, carry["pvar"] * ev.DISCOUNT**2
            )

            def w(old, new):
                return jnp.where(part, new, old)

            return dict(
                j=j - 1,
                tree=tr,
                pf=w(carry["pf"], out_f),
                pp=w(carry["pp"], out_p),
                pv=w(carry["pv"], out_v),
                pvar=w(carry["pvar"], out_var),
            )

        carry = jax.lax.while_loop(
            bcond,
            bbody,
            dict(j=jmax - 1, tree=tree, pf=pf, pp=pp, pv=pv_, pvar=pvar),
        )
        return carry["tree"]

    return serve_chunk
