"""Fused batched MCTS simulation step.

One call = one simulation on every tree in the batch, entirely on device:
vectorized PUCT descent (masked while_loop), one batched network
evaluation, expansion, and backward propagation with the exact
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

The evaluator is a closure ``envs -> (policy_logits [B,A], value [B],
variance [B])`` so network agents, Dummy and Simple plug in uniformly.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..tak.engine import TakEngine
from . import eval as ev
from .tree import Tree

NEG = jnp.float32(-3.0e38)


def _rows(arr, bar, cur):
    return arr[bar, cur]


def make_simulate(
    eng: TakEngine,
    evaluator: Callable,
    max_depth: int = 48,
):
    """Build `simulate(tree, beta, forced_slot, skip_root) -> Tree`."""

    step_batch = jax.vmap(eng.step)
    terminal_batch = jax.vmap(eng.terminal_kind)
    legal_batch = jax.vmap(eng.legal_mask)

    def simulate(tree: Tree, beta, forced_slot=None, *, skip_root: bool = False):
        b, m, c = tree.child_visit.shape
        bar = jnp.arange(b)
        beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (b,))

        if not skip_root:
            tree = tree._replace(root_visit=tree.root_visit + 1)

        root_unexp = ~tree.root_expanded()
        root_known = tree.root_flag != 0
        lane_root_expand = root_unexp & ~root_known
        # Terminal/solved unexpanded root: nothing to do (lane inactive).

        # ------------------------------------------------------------------
        # Forward: masked lock-step descent.
        # ------------------------------------------------------------------
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

        def body(st):
            cur, active = st["cur"], st["active"]
            row_action = _rows(tree.child_action, bar, cur)
            row_flag = _rows(tree.child_flag, bar, cur)
            row_ply = _rows(tree.child_ply, bar, cur)
            row_value = _rows(tree.child_value, bar, cur)
            row_prob = _rows(tree.child_prob, bar, cur)
            row_std = _rows(tree.child_std, bar, cur)
            row_visit = _rows(tree.child_visit, bar, cur)

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

            cn = tree.child_node[bar, cur, slot]
            cf = tree.child_flag[bar, cur, slot]
            cp = tree.child_ply[bar, cur, slot]
            cv = tree.child_value[bar, cur, slot]
            cvisit = tree.child_visit[bar, cur, slot] + 1  # this sim's visit

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

        # Depth-clipped lanes: back up the current node's own eval.
        clipped = st["active"]
        stop_known = st["stop_known"] | clipped
        known_f = jnp.where(clipped, st["cur_flag"], st["known_f"])
        known_p = jnp.where(clipped, jnp.int32(0), st["known_p"])
        # For an unsolved clipped node, back up its mean value.
        clip_val = tree.child_value[
            bar,
            tree.node_parent[bar, st["cur"]].clip(0),
            tree.node_slot[bar, st["cur"]].clip(0),
        ]
        known_v = jnp.where(clipped, clip_val, st["known_v"])
        length = jnp.where(clipped, max_depth, st["length"])
        stop_leaf = st["stop_leaf"]
        leaf_parent, leaf_slot = st["leaf_parent"], st["leaf_slot"]
        path_node, path_slot = st["path_node"], st["path_slot"]
        overflow = tree.overflow + clipped.astype(jnp.int32)

        # Deferred visit increments along the path (one scatter-add).
        upd = (path_node >= 0).astype(jnp.int32)
        child_visit = tree.child_visit.at[
            bar[:, None], path_node.clip(0), path_slot.clip(0)
        ].add(upd)
        tree = tree._replace(child_visit=child_visit, overflow=overflow)

        # ------------------------------------------------------------------
        # Leaf environment, terminal discovery, network evaluation.
        # ------------------------------------------------------------------
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
        tree = tree._replace(
            child_flag=tree.child_flag.at[bar, leaf_parent, leaf_slot].set(
                jnp.where(leaf_term, tk, tree.child_flag[bar, leaf_parent, leaf_slot])
            ),
            child_ply=tree.child_ply.at[bar, leaf_parent, leaf_slot].set(
                jnp.where(leaf_term, 0, tree.child_ply[bar, leaf_parent, leaf_slot])
            ),
            child_std=tree.child_std.at[bar, leaf_parent, leaf_slot].set(
                jnp.where(leaf_term, 0.0, tree.child_std[bar, leaf_parent, leaf_slot])
            ),
            root_flag=jnp.where(root_term, tk, tree.root_flag),
            root_ply=jnp.where(root_term, 0, tree.root_ply),
            root_std=jnp.where(root_term, 0.0, tree.root_std),
        )
        stop_known = stop_known | leaf_term
        known_f = jnp.where(leaf_term, tk, known_f)
        known_p = jnp.where(leaf_term, 0, known_p)
        known_v = jnp.where(leaf_term, 0.0, known_v)

        lane_eval_leaf = stop_leaf & ~leaf_term
        lane_eval_root = lane_root_expand & ~root_term

        logits, v_net, var_net = evaluator(env_eval)
        v_net = v_net.astype(jnp.float32)
        var_net = var_net.astype(jnp.float32)

        # ------------------------------------------------------------------
        # Leaf statistics update (raw value, no negation) + expansion.
        # ------------------------------------------------------------------
        n_leaf = tree.child_visit[bar, leaf_parent, leaf_slot].astype(jnp.float32)
        old_v = tree.child_value[bar, leaf_parent, leaf_slot]
        old_s = tree.child_std[bar, leaf_parent, leaf_slot]
        leaf_v_after = old_v + (v_net - old_v) / jnp.maximum(n_leaf, 1.0)
        leaf_s_after = old_s + (jnp.sqrt(var_net) - old_s) / jnp.maximum(n_leaf, 1.0)
        tree = tree._replace(
            child_value=tree.child_value.at[bar, leaf_parent, leaf_slot].set(
                jnp.where(lane_eval_leaf, leaf_v_after, old_v)
            ),
            child_std=tree.child_std.at[bar, leaf_parent, leaf_slot].set(
                jnp.where(lane_eval_leaf, leaf_s_after, old_s)
            ),
        )
        rn = tree.root_visit.astype(jnp.float32)
        root_v_after = tree.root_value + (v_net - tree.root_value) / jnp.maximum(rn, 1.0)
        root_s_after = tree.root_std + (jnp.sqrt(var_net) - tree.root_std) / jnp.maximum(
            rn, 1.0
        )
        tree = tree._replace(
            root_value=jnp.where(lane_eval_root, root_v_after, tree.root_value),
            root_std=jnp.where(lane_eval_root, root_s_after, tree.root_std),
        )
        v_after = jnp.where(lane_eval_root, root_v_after, leaf_v_after)
        s_after = jnp.where(lane_eval_root, root_s_after, leaf_s_after)

        legal = legal_batch(env_eval)  # [B, A]
        masked_logits = jnp.where(legal, logits, NEG)
        top_vals, top_idx = jax.lax.top_k(masked_logits, c)
        valid_child = top_vals > NEG / 2
        mx = jnp.max(jnp.where(valid_child, top_vals, -jnp.inf), axis=-1, keepdims=True)
        ex = jnp.where(valid_child, jnp.exp(top_vals - mx), 0.0)
        probs = ex / jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-30)

        new_node = jnp.where(lane_root_expand, 0, tree.node_count)
        can_expand = lane_root_expand | (tree.node_count < m)
        expanding = (lane_eval_leaf | lane_eval_root) & can_expand
        exp2 = expanding[:, None]

        def put_row(arr, row, fill=None):
            old = arr[bar, new_node]
            return arr.at[bar, new_node].set(jnp.where(exp2, row, old))

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
        tree = tree._replace(
            node_parent=tree.node_parent.at[bar, new_node].set(
                jnp.where(expanding & stop_leaf, leaf_parent, tree.node_parent[bar, new_node])
            ),
            node_slot=tree.node_slot.at[bar, new_node].set(
                jnp.where(expanding & stop_leaf, leaf_slot, tree.node_slot[bar, new_node])
            ),
            node_incomplete=tree.node_incomplete.at[bar, new_node].set(
                jnp.where(expanding, legal_count > c, tree.node_incomplete[bar, new_node])
            ),
            node_env=jax.tree.map(
                lambda pool, val: pool.at[bar, new_node].set(
                    jnp.where(
                        expanding.reshape((-1,) + (1,) * (val.ndim - 1)),
                        val,
                        pool[bar, new_node],
                    )
                ),
                tree.node_env,
                env_eval,
            ),
            child_node=tree.child_node.at[bar, leaf_parent, leaf_slot].set(
                jnp.where(
                    expanding & stop_leaf,
                    new_node,
                    tree.child_node[bar, leaf_parent, leaf_slot],
                )
            ),
            node_count=tree.node_count + (expanding & stop_leaf).astype(jnp.int32),
            overflow=tree.overflow
            + ((lane_eval_leaf | lane_eval_root) & ~can_expand).astype(jnp.int32),
        )

        # ------------------------------------------------------------------
        # Backward propagation.
        # ------------------------------------------------------------------
        active_bwd = stop_known | lane_eval_leaf
        prop_f = jnp.where(stop_known, known_f, ev.VALUE)
        prop_p = jnp.where(stop_known, known_p, 0)
        prop_v = jnp.where(stop_known, known_v, ev.DISCOUNT * v_net)
        prop_var = jnp.where(stop_known, 0.0, ev.DISCOUNT**2 * var_net)

        min_j = 1 if skip_root else 0
        jmax = jnp.max(jnp.where(active_bwd, length, 0))

        def bcond(carry):
            return carry["j"] >= min_j

        def bbody(carry):
            j = carry["j"]
            tr: Tree = carry["tree"]
            part = active_bwd & (j < length)
            node_j = path_node[bar, j.clip(0)].clip(0)
            is_root = j == 0

            # Node stats (from parent slot, or root arrays).
            pn = jnp.where(is_root, 0, path_node[bar, (j - 1).clip(0)]).clip(0)
            ps = jnp.where(is_root, 0, path_slot[bar, (j - 1).clip(0)]).clip(0)
            sf = jnp.where(is_root, tr.root_flag, tr.child_flag[bar, pn, ps])
            sp = jnp.where(is_root, tr.root_ply, tr.child_ply[bar, pn, ps])
            sv = jnp.where(is_root, tr.root_value, tr.child_value[bar, pn, ps])
            ss = jnp.where(is_root, tr.root_std, tr.child_std[bar, pn, ps])
            svisit = jnp.where(is_root, tr.root_visit, tr.child_visit[bar, pn, ps])

            # Children of this node.
            ca = _rows(tr.child_action, bar, node_j)
            cfl = _rows(tr.child_flag, bar, node_j)
            cpl = _rows(tr.child_ply, bar, node_j)
            cva = _rows(tr.child_value, bar, node_j)
            validc_ = ca >= 0
            all_known = jnp.all(~validc_ | (cfl != ev.VALUE), axis=-1) & jnp.any(
                validc_, axis=-1
            )
            incomplete = tr.node_incomplete[bar, node_j]
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
            tr = tr._replace(
                root_flag=jnp.where(upd_root, new_f, tr.root_flag),
                root_ply=jnp.where(upd_root, new_p, tr.root_ply),
                root_value=jnp.where(upd_root, new_v, tr.root_value),
                root_std=jnp.where(upd_root, new_s, tr.root_std),
                child_flag=tr.child_flag.at[bar, pn, ps].set(
                    jnp.where(upd_slot, new_f, tr.child_flag[bar, pn, ps])
                ),
                child_ply=tr.child_ply.at[bar, pn, ps].set(
                    jnp.where(upd_slot, new_p, tr.child_ply[bar, pn, ps])
                ),
                child_value=tr.child_value.at[bar, pn, ps].set(
                    jnp.where(upd_slot, new_v, tr.child_value[bar, pn, ps])
                ),
                child_std=tr.child_std.at[bar, pn, ps].set(
                    jnp.where(upd_slot, new_s, tr.child_std[bar, pn, ps])
                ),
            )

            # Outgoing propagated value.
            out_f = jnp.where(known_now, new_f, ev.VALUE)
            out_p = jnp.where(known_now, new_p, 0)
            out_v = jnp.where(known_now, new_v, negated * ev.DISCOUNT)
            out_var = jnp.where(known_now, new_s * new_s, carry["pvar"] * ev.DISCOUNT**2)

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

    return simulate
