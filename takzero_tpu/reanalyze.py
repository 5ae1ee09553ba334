"""Reanalyze core: fresh targets from old replay positions.

Mirrors reanalyze/src/main.rs:146-228: sample stored positions, reset
trees, Gumbel-SH with beta=0, then targets with
* value = the chosen child's negated Q (or the solved root eval),
* policy = improved policy with visitations = most-visited count,
* ube = ube_target(0.25).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .data.target import Target
from .search import eval as ev
from .search.gumbel import make_gumbel_search
from .search.policy import improved_policy, most_visited_count, slot_action, ube_target
from .search.tree import init_tree
from .tak.engine import TakEngine


def make_reanalyze_step(
    eng: TakEngine,
    evaluator_factory,
    sampled_actions: int = 64,
    search_budget: int = 768,
    max_children: int = 128,
    max_depth: int = 48,
    ube_target_beta: float = 0.25,
):
    max_nodes = search_budget + 8

    def step(envs, bundle, key):
        evaluator = lambda e: evaluator_factory(bundle, e)  # noqa: E731
        search = make_gumbel_search(
            eng, evaluator, sampled_actions, search_budget, max_depth
        )
        b = envs.ply.shape[0]
        tree = init_tree(eng, envs, max_nodes, max_children)
        tree, slot = search(tree, key, jnp.zeros(b))

        bar = jnp.arange(b)
        cf = tree.child_flag[bar, 0, slot]
        cp = tree.child_ply[bar, 0, slot]
        cv = tree.child_value[bar, 0, slot]
        child_q = ev.negated_float(cf, cp, cv)
        root_f = ev.eval_to_float(tree.root_flag, tree.root_ply, tree.root_value)
        value = jnp.where(tree.root_flag != ev.VALUE, root_f, child_q)

        pol = improved_policy(tree, most_visited_count(tree).astype(jnp.float32))
        ube = ube_target(tree, ube_target_beta)
        return (
            slot_action(tree, slot),
            pol,
            tree.child_action[:, 0, :],
            ube,
            value,
            tree.node_incomplete[:, 0],
        )

    return step


def build_targets(
    n, tps_batch, pol, child_actions, ube, value, incomplete=None, oracle=None
) -> list[Target]:
    """Target rows from one reanalyze step.  With ``incomplete``/``oracle``,
    child-truncated roots pad the missing legal actions at p=0 so the line
    lists exactly every legal action (reference wire contract,
    target.rs:123-134)."""
    from .data.target import pad_policy_with_legal
    from .tak import tps_to_state

    pol = np.asarray(pol)
    child_actions = np.asarray(child_actions)
    ube = np.asarray(ube)
    value = np.asarray(value)
    incomplete = (
        np.zeros(len(tps_batch), bool) if incomplete is None
        else np.asarray(incomplete).astype(bool)
    )
    out = []
    for i, tps in enumerate(tps_batch):
        policy = [
            (int(a), float(p))
            for a, p in zip(child_actions[i], pol[i])
            if a >= 0
        ]
        if incomplete[i] and oracle is not None:
            policy = pad_policy_with_legal(
                policy, oracle.legal_mask(tps_to_state(n, tps))
            )
        out.append(
            Target(tps=tps, value=float(value[i]), ube=float(ube[i]),
                   policy=policy, n=n)
        )
    return out
