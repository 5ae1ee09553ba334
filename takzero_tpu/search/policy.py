"""Root-level policy utilities for the batched trees.

Implements the reference's root statistics (takzero/src/search/node/
{mod.rs,policy.rs}) on the [B, C] root child-slot arrays:

* improved policy: softmax(logit + completed_q * sqrt(visitations)) where
  completed_q falls back to the root's own eval for never-visited children
  (policy.rs:36-48);
* best / selfplay action selection (mod.rs:132-207);
* UBE target: the std^2 of the child maximizing q + beta*std, 0 when the
  root is solved (mod.rs:215-230).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import eval as ev
from .tree import Tree


def root_children(tree: Tree):
    return dict(
        action=tree.child_action[:, 0, :],
        logit=tree.child_logit[:, 0, :],
        prob=tree.child_prob[:, 0, :],
        visit=tree.child_visit[:, 0, :],
        flag=tree.child_flag[:, 0, :],
        ply=tree.child_ply[:, 0, :],
        value=tree.child_value[:, 0, :],
        std=tree.child_std[:, 0, :],
        node=tree.child_node[:, 0, :],
    )


def improved_policy(tree: Tree, visitations) -> jnp.ndarray:
    """[B, C] improved policy over root child slots (softmax over valid)."""
    ch = root_children(tree)
    valid = ch["action"] >= 0
    needs_init = (ch["node"] < 0) & (ch["flag"] == ev.VALUE) & (ch["visit"] == 0)
    root_f = ev.eval_to_float(tree.root_flag, tree.root_ply, tree.root_value)
    completed = jnp.where(
        needs_init,
        root_f[:, None],
        ev.negated_float(ch["flag"], ch["ply"], ch["value"]),
    )
    visitations = jnp.asarray(visitations, jnp.float32)
    if visitations.ndim == 1:  # per-batch visitation counts
        visitations = visitations[:, None]
    score = ch["logit"] + completed * jnp.sqrt(visitations)
    score = jnp.where(valid, score, -jnp.inf)
    score = score - jnp.max(score, axis=-1, keepdims=True)
    e = jnp.where(valid, jnp.exp(score), 0.0)
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)


def most_visited_count(tree: Tree) -> jnp.ndarray:
    return jnp.max(tree.child_visit[:, 0, :], axis=-1)


def ube_target(tree: Tree, beta) -> jnp.ndarray:
    """[B] UBE target = sigma^2 of argmax_child(q + beta*sigma); 0 if solved."""
    ch = root_children(tree)
    valid = ch["action"] >= 0
    q = ev.negated_float(ch["flag"], ch["ply"], ch["value"])
    beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (q.shape[0],))
    score = jnp.where(valid, q + beta[:, None] * ch["std"], -jnp.inf)
    best = jnp.argmax(score, axis=-1)
    std = jnp.take_along_axis(ch["std"], best[:, None], axis=-1)[:, 0]
    solved = (tree.root_flag != ev.VALUE) | ~tree.root_expanded()
    return jnp.where(solved, 0.0, std * std)


def uct_scores(tree: Tree, node_visit, beta) -> jnp.ndarray:
    """Classic UCT scores over root child slots, mirroring the
    reference's declared-but-unused `select_with_uct` (policy.rs:104-117):
    ``q + C*sqrt(ln(N)/n) + beta*std`` with ``EXPLORATION_COEFFICIENT=1``
    (policy.rs:158-164) and win-children pruned unless the node is a
    proven loss (policy.rs:109)."""
    ch = root_children(tree)
    valid = ch["action"] >= 0
    q = ev.negated_float(ch["flag"], ch["ply"], ch["value"])
    nv = jnp.maximum(jnp.asarray(node_visit, jnp.float32), 1.0)
    if nv.ndim == 1:
        nv = nv[:, None]
    u = jnp.sqrt(
        jnp.log(nv) / jnp.maximum(ch["visit"].astype(jnp.float32), 1e-9)
    )
    beta = jnp.broadcast_to(jnp.asarray(beta, jnp.float32), (q.shape[0],))
    pruned = (ch["flag"] == ev.WIN) & (tree.root_flag != ev.LOSS)[:, None]
    return jnp.where(
        valid & ~pruned, q + u + beta[:, None] * ch["std"], -jnp.inf
    )


def select_best_slot(tree: Tree) -> jnp.ndarray:
    """[B] child slot per node/mod.rs:132-163."""
    ch = root_children(tree)
    valid = ch["action"] >= 0
    # Solved root: the child with minimal (worst-for-opponent) eval.
    solved_slot = ev.argmin_eval(ch["flag"], ch["ply"], ch["value"], valid)
    visits = jnp.where(valid, ch["visit"], -1)
    most_visited = jnp.argmax(visits, axis=-1)
    no_visits = jnp.max(visits, axis=-1) <= 0
    by_prob = jnp.argmax(jnp.where(valid, ch["prob"], -1.0), axis=-1)
    unsolved_slot = jnp.where(no_visits, by_prob, most_visited)
    return jnp.where(tree.root_flag != ev.VALUE, solved_slot, unsolved_slot).astype(
        jnp.int32
    )


def select_selfplay_slot(
    tree: Tree, key, threshold: int = 32, allowed_eval_drop: float = 0.5
) -> jnp.ndarray:
    """[B] proportional-to-visits sampling with filters (mod.rs:170-207).

    Filters out children with fewer than `threshold` visits, proven wins,
    and children whose eval exceeds best_eval + allowed_eval_drop (in the
    Eval total order).  Falls back to select_best_slot when nothing passes.
    """
    ch = root_children(tree)
    valid = ch["action"] >= 0
    best = ev.argmin_eval(ch["flag"], ch["ply"], ch["value"], valid)
    bf, bp, bv = ev.take_eval(ch["flag"], ch["ply"], ch["value"], best)
    # best_eval.map(|x| x + drop): only Value evals shift.
    bv = bv + jnp.where(bf == ev.VALUE, allowed_eval_drop, 0.0)
    bprim, bsec = ev.order_keys(bf, bp, bv)
    cprim, csec = ev.order_keys(ch["flag"], ch["ply"], ch["value"])
    exceeds = (cprim > bprim[:, None]) | (
        (cprim == bprim[:, None]) & (csec > bsec[:, None])
    )
    ok = (
        valid
        & (ch["visit"] >= threshold)
        & (ch["flag"] != ev.WIN)
        & ~exceeds
    )
    weights = jnp.where(ok, ch["visit"].astype(jnp.float32), 0.0)
    any_ok = jnp.sum(weights, axis=-1) > 0
    logw = jnp.log(jnp.maximum(weights, 1e-30))
    sampled = jax.random.categorical(key, logw, axis=-1).astype(jnp.int32)
    best_slot = select_best_slot(tree)
    solved = tree.root_flag != ev.VALUE
    return jnp.where(solved | ~any_ok, best_slot, sampled)


def slot_action(tree: Tree, slot) -> jnp.ndarray:
    b = tree.batch_size
    return tree.child_action[jnp.arange(b), 0, slot]
