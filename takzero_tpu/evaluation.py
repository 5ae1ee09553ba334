"""Model-vs-model pit fighting.

Mirrors evaluation/src/main.rs:221-319 (`compete`): two agents alternate
half-moves across a batch of opening positions; the agent given first is
"white" (it makes the first move from each opening).  Terminals are
attributed to the player who just moved; finished games are frozen.
Results are W/L/D from white's perspective.

Both agents keep their own search tree for the whole game and descend by
every move played — the mover's and the opponent's alike — so prior
visits and solver proofs carry across moves (the reference steps both
`BatchedMCTS` instances with the mover's actions, main.rs:236-299).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .search.gumbel import make_gumbel_search
from .search.policy import slot_action
from .search.tree import descend_batch, init_tree, reset_lanes
from .tak.engine import TakEngine


@dataclass
class Evaluation:
    wins: int = 0
    losses: int = 0
    draws: int = 0

    def win_rate(self) -> float:
        total = self.wins + self.losses + self.draws
        return self.wins / total if total else 0.0

    def __str__(self) -> str:
        return (
            f"Evaluation {{ wins: {self.wins}, losses: {self.losses},"
            f" draws: {self.draws} }}"
        )


def make_compete(
    eng: TakEngine,
    evaluator_factory,
    sampled_actions: int = 64,
    search_budget: int = 768,
    max_children: int = 128,
    max_depth: int = 48,
    tree_reuse: bool | tuple[bool, bool] = True,
    reuse_carry_cap: int = 384,
):
    """Build `compete(bundle_white, bundle_black, envs, key) -> Evaluation`.

    ``tree_reuse`` may be a single bool (both agents) or a
    ``(white, black)`` pair — the asymmetric form pits carried-subtree
    search against fresh-tree search at equal budget, measuring what
    reuse is worth (reference keeps subtrees in both selfplay and the
    pit fighter, node/batched.rs:139, evaluation/src/main.rs:236-299).
    ``reuse_carry_cap`` bounds the carried-subtree pool reservation (see
    SelfplayConfig.reuse_carry_cap — search cost grows with pool size).
    """
    reuse_w, reuse_b = (
        tree_reuse if isinstance(tree_reuse, tuple) else (tree_reuse, tree_reuse)
    )
    any_reuse = reuse_w or reuse_b
    cap = min(reuse_carry_cap, search_budget)
    max_nodes = search_budget + 8 + (cap if any_reuse else 0)
    step_b = jax.vmap(eng.step)
    terminal_b = jax.vmap(eng.terminal_kind)

    def half_move(envs, bundle, key, frozen, my_tree, opp_tree,
                  my_reuse, opp_reuse):
        evaluator = lambda e: evaluator_factory(bundle, e)  # noqa: E731
        search = make_gumbel_search(
            eng, evaluator, sampled_actions, search_budget, max_depth
        )
        b = envs.ply.shape[0]
        if not my_reuse:
            my_tree = init_tree(eng, envs, max_nodes, max_children)
        tree, slot = search(my_tree, key, jnp.zeros(b))
        action = slot_action(tree, slot).clip(0)
        stepped = step_b(envs, action)
        # Finished games keep their final envs (no restart) — fused here
        # instead of eagerly dispatched per array on the host.
        nxt = jax.tree.map(
            lambda old, new: jnp.where(
                frozen.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
            ),
            envs,
            stepped,
        )
        tk = jnp.where(frozen, 0, terminal_b(nxt))
        if my_reuse:
            my2, ok_m = descend_batch(
                tree, slot, min_headroom=search_budget + 1,
                max_chain=max_depth,
            )
            my_out = reset_lanes(my2, frozen | ~ok_m, nxt)
        else:
            my_out = tree
        if opp_reuse:
            # The opponent's tree indexes children by its own slot layout:
            # locate the played action there before descending.
            hit = opp_tree.child_action[:, 0, :] == action[:, None]
            opp_slot = jnp.argmax(hit, axis=1).astype(jnp.int32)
            opp2, ok_o = descend_batch(
                opp_tree, opp_slot, min_headroom=search_budget + 1,
                max_chain=max_depth,
            )
            ok_o = ok_o & jnp.any(hit, axis=1)
            opp_out = reset_lanes(opp2, frozen | ~ok_o, nxt)
        else:
            opp_out = opp_tree
        return nxt, tk, my_out, opp_out

    half_move_jit = jax.jit(half_move, static_argnames=("my_reuse", "opp_reuse"))

    def compete(bundle_white, bundle_black, envs, key, max_moves: int = 200):
        b = int(envs.ply.shape[0])
        done = np.zeros(b, bool)
        ev = Evaluation()
        cur = envs
        tree_w = init_tree(eng, envs, max_nodes, max_children)
        tree_b = init_tree(eng, envs, max_nodes, max_children)
        for move in range(2 * max_moves):
            if done.all():
                break
            is_white = move % 2 == 0
            bundle = bundle_white if is_white else bundle_black
            my, opp = (tree_w, tree_b) if is_white else (tree_b, tree_w)
            my_reuse, opp_reuse = (
                (reuse_w, reuse_b) if is_white else (reuse_b, reuse_w)
            )
            key, k = jax.random.split(key)
            cur, tk, my, opp = half_move_jit(
                cur, bundle, k, jnp.asarray(done), my, opp,
                my_reuse=my_reuse, opp_reuse=opp_reuse,
            )
            tree_w, tree_b = (my, opp) if is_white else (opp, my)
            tk = np.asarray(tk)
            for g in range(b):
                if done[g] or tk[g] == 0:
                    continue
                done[g] = True
                # Terminal is from the post-move mover's opponent's POV:
                # Loss for the side to move == win for the agent that moved.
                mover_won = tk[g] == 2
                mover_lost = tk[g] == 1
                if tk[g] == 3:
                    ev.draws += 1
                elif (mover_won and is_white) or (mover_lost and not is_white):
                    ev.wins += 1
                else:
                    ev.losses += 1
        return ev

    return compete
