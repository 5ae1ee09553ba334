"""Selfplay engine: device-side move generation + host-side target assembly.

Replaces the reference's selfplay actor core (selfplay/src/main.rs) with a
single jitted per-move program over the whole game batch:

* Gumbel sequential halving (k sampled actions, fixed budget);
* weighted-random selection for the first `weighted_random_plies` plies
  (proportional to visits, threshold 32, eval-drop 0.5; main.rs:145-153);
* improved-policy extraction with the reference's closed-form visitation
  count (main.rs:47-52), UBE target, chosen action;
* stepping + terminal detection + fresh random openings for finished games.

The host keeps only per-game pending-target lists and replays, and
back-fills discounted terminal values when a game ends (main.rs:263-329).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .data.target import Replay, Target, pad_policy_with_legal, result_str_from
from .search import eval as ev
from .search.gumbel import make_gumbel_search, sh_schedule
from .search.openings import make_new_opening
from .search.policy import (
    improved_policy,
    select_selfplay_slot,
    slot_action,
    ube_target,
)
from .search.tree import (
    descend_batch,
    init_tree,
    reset_lanes,
    truncation_stats,
)
from .tak import state_to_tps
from .tak.engine import TakEngine


@dataclass(frozen=True)
class SelfplayConfig:
    batch: int = 128
    beta: float = 0.25
    exploration: bool = False  # beta on the first half of the batch
    weighted_random_plies: int = 10
    sampled_actions: int = 64
    search_budget: int = 768
    max_children: int = 128
    max_depth: int = 48
    discount: float = ev.DISCOUNT
    # Carry the chosen child's subtree across moves (reference
    # BatchedMCTS::step → Node::descend, batched.rs:131-144).
    tree_reuse: bool = True
    # Pool rows reserved for the carried subtree.  Search cost grows with
    # pool size (~24% per doubling at C=256 on v5e — TPU gather/scatter
    # lowering, measured 2026-08-19), so the pool is sized for the
    # carried subtrees actually seen (mean ~215 rows at the flagship
    # config) rather than a worst-case full budget; larger subtrees
    # reset fresh via descend_batch's min_headroom guard.
    reuse_carry_cap: int = 384

    @property
    def max_nodes(self) -> int:
        # With tree reuse the pool must hold the carried subtree plus a
        # full budget of fresh expansions (the reference heap-allocates).
        cap = min(self.reuse_carry_cap, self.search_budget)
        return self.search_budget + 8 + (cap if self.tree_reuse else 0)

    @property
    def improved_policy_visitations(self) -> float:
        # budget/log2(k)/k * (2^log2(k) - 1)  (selfplay/src/main.rs:47-52)
        _, _, _, cums = sh_schedule(self.sampled_actions, self.search_budget)
        return float(cums[-1])

    def betas(self) -> np.ndarray:
        out = np.zeros(self.batch, np.float32)
        if self.exploration:
            out[: self.batch // 2] = self.beta
        return out


@dataclass
class PendingTarget:
    tps: str
    policy: list  # [(action, prob)]
    ube: float
    ply: int


@dataclass
class GameLog:
    start_tps: str
    actions: list = field(default_factory=list)
    pending: list = field(default_factory=list)


class SelfplayEngine:
    """Drives `batch` concurrent games; emits finished Targets/Replays.

    ``replicate_fetch`` (a replicated NamedSharding over the global mesh)
    makes the per-move packed host buffer and the root-statistics export
    fully addressable on every process when the game batch is sharded
    across a multi-process mesh — the in-graph reshard is an ICI
    all-gather of a few KiB, so every process can run the identical host
    bookkeeping (only the coordinator writes files, drivers/selfplay.py).
    """

    def __init__(self, eng: TakEngine, cfg: SelfplayConfig, evaluator_factory,
                 replicate_fetch=None):
        self.eng = eng
        self.cfg = cfg
        self._opening = make_new_opening(eng)
        self._betas = jnp.asarray(cfg.betas())
        self._rep = replicate_fetch

        def move_fn(envs, tree, bundle, key):
            evaluator = lambda e: evaluator_factory(bundle, e)  # noqa: E731
            srch = make_gumbel_search(
                eng, evaluator, cfg.sampled_actions, cfg.search_budget, cfg.max_depth
            )
            k_search, k_sample, k_open = jax.random.split(key, 3)
            if not cfg.tree_reuse:
                tree = init_tree(eng, envs, cfg.max_nodes, cfg.max_children)
            tree, slot = srch(tree, k_search, self._betas)
            weighted = envs.ply < cfg.weighted_random_plies
            sp_slot = select_selfplay_slot(tree, k_sample)
            slot = jnp.where(weighted, sp_slot, slot)
            action = slot_action(tree, slot)

            pol = improved_policy(tree, cfg.improved_policy_visitations)
            child_actions = tree.child_action[:, 0, :]
            ube = ube_target(tree, cfg.beta)

            stepped = jax.vmap(eng.step)(envs, action.clip(0))
            tk = jax.vmap(eng.terminal_kind)(stepped)  # from stepped POV
            res = jax.vmap(eng.game_result)(stepped)  # winner color / draw
            roads = jax.vmap(eng._roads)(stepped)  # [B, 2]
            winner_road = jnp.take_along_axis(
                roads, res.clip(0, 1)[:, None], axis=-1
            )[:, 0]
            fresh = self._opening(k_open, cfg.batch)
            done = tk != 0
            nxt = jax.tree.map(
                lambda f, s: jnp.where(
                    done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s
                ),
                fresh,
                stepped,
            )
            if cfg.tree_reuse:
                # Carry the chosen subtree; finished games, unexpanded
                # choices, and subtrees too large to leave a full budget
                # of expansion headroom restart from fresh/stepped roots.
                tree2, ok = descend_batch(
                    tree, slot, min_headroom=cfg.search_budget + 1,
                    max_chain=cfg.max_depth,
                )
                tree_out = reset_lanes(tree2, done | ~ok, nxt)
            else:
                tree_out = tree  # unused next move (fresh init above)
            # Root statistics exported for offline search analysis
            # (tools/analyze_search.py; reference runs/*.txt dumps).
            root = dict(
                action=child_actions,
                visit=tree.child_visit[:, 0, :],
                flag=tree.child_flag[:, 0, :],
                ply=tree.child_ply[:, 0, :],
                value=tree.child_value[:, 0, :],
                std=tree.child_std[:, 0, :],
                logit=tree.child_logit[:, 0, :],
            )
            # Everything the host needs each move, packed into ONE int32
            # buffer (all TakState fields are 32-bit; floats bitcast) so
            # the driver pays a single blocking device->host round trip
            # per move instead of ~14.
            b = action.shape[0]

            def as_i32(x):
                x = x.reshape(b, -1)
                if x.dtype == jnp.float32:
                    return jax.lax.bitcast_convert_type(x, jnp.int32)
                if x.dtype == jnp.uint32:
                    return jax.lax.bitcast_convert_type(x, jnp.int32)
                return x.astype(jnp.int32)

            packed = jnp.concatenate(
                [
                    as_i32(action), as_i32(tk), as_i32(res),
                    as_i32(winner_road), as_i32(ube),
                    as_i32(pol), as_i32(child_actions),
                    as_i32(nxt.height), as_i32(nxt.owner_lo),
                    as_i32(nxt.owner_hi), as_i32(nxt.tops),
                    as_i32(nxt.reserves), as_i32(nxt.to_move),
                    as_i32(nxt.ply), as_i32(nxt.reversible),
                    # Child-truncation diagnostics on the post-search tree
                    # (VERDICT: the solver loses loss/draw exactness at
                    # incomplete nodes; measure how often C actually binds).
                    as_i32(truncation_stats(tree)),
                    # Per-lane root truncation bit: such roots' policy
                    # targets must be padded with the missing legal
                    # actions to keep the reference wire contract.
                    as_i32(tree.node_incomplete[:, 0]),
                ],
                axis=1,
            )
            if self._rep is not None:
                packed = jax.lax.with_sharding_constraint(packed, self._rep)
                root = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, self._rep),
                    root,
                )
            return nxt, tree_out, packed, root

        self._move = jax.jit(move_fn)
        self.envs = None
        self.tree = None
        self.logs: list[GameLog] = []
        self.last_root = None
        self._envs_host = None
        # [expanded nodes, incomplete (child-truncated) nodes] accumulated
        # over every post-search tree this engine has produced.
        self.truncation_totals = [0, 0]
        self._orc = None

    def _oracle(self):
        """Lazy host oracle for the rare truncated-root policy padding."""
        if self._orc is None:
            from .tak.oracle import Oracle

            self._orc = Oracle(
                self.eng.n, self.eng.half_komi, self.eng.reversible_limit
            )
        return self._orc

    def reset(self, key):
        self.envs = self._opening(key, self.cfg.batch)
        self.tree = init_tree(
            self.eng, self.envs, self.cfg.max_nodes, self.cfg.max_children
        )
        host = jax.tree.map(np.asarray, self.envs)
        self._envs_host = host
        self.logs = [
            GameLog(start_tps=state_to_tps(self.eng.n, _lane(host, i)))
            for i in range(self.cfg.batch)
        ]

    def play_move(self, bundle, key):
        """One move in every game.

        Returns ``(targets, replays, exploration_replays)`` completed by
        this move (exploration replays only when the lane's beta > 0)."""
        cfg = self.cfg
        # The pre-move host state is last move's fetched post-move state —
        # refetching it costs one blocking round trip per array on a
        # remote accelerator.
        envs_before = self._envs_host
        if envs_before is None:
            envs_before = jax.tree.map(np.asarray, self.envs)
        nxt, tree_out, packed, root = self._move(self.envs, self.tree, bundle, key)
        self.envs = nxt
        self.tree = tree_out
        # Device-side; fetched lazily by the --dump-search path only.
        self.last_root = root

        # ONE blocking fetch per move; unpack by column (see move_fn).
        pk = np.asarray(packed)
        s = self.eng.n * self.eng.n
        c = self.cfg.max_children
        cuts = np.cumsum([1, 1, 1, 1, 1, c, c, s, s, s, s, 4, 1, 1, 1, 2])
        assert pk.shape[1] == cuts[-1] + 1, (pk.shape, cuts[-1] + 1)
        (
            action, tk, res, road, ube_b, pol_b, child_actions,
            height, owner_lo, owner_hi, tops, reserves, to_move, ply,
            reversible, trunc, root_inc,
        ) = np.split(pk, cuts, axis=1)
        root_inc = root_inc[:, 0].astype(bool)
        self.truncation_totals[0] += int(trunc[:, 0].sum())  # expanded nodes
        self.truncation_totals[1] += int(trunc[:, 1].sum())  # incomplete
        action = action[:, 0]
        tk = tk[:, 0]
        res = res[:, 0]
        road = road[:, 0].astype(bool)
        ube = np.ascontiguousarray(ube_b).view(np.float32)[:, 0]
        pol = np.ascontiguousarray(pol_b).view(np.float32)
        from .tak.state import TakState

        nxt_host = TakState(
            height=np.ascontiguousarray(height),
            owner_lo=np.ascontiguousarray(owner_lo).view(np.uint32),
            owner_hi=np.ascontiguousarray(owner_hi).view(np.uint32),
            tops=np.ascontiguousarray(tops),
            reserves=np.ascontiguousarray(reserves).reshape(-1, 2, 2),
            to_move=to_move[:, 0],
            ply=ply[:, 0],
            reversible=reversible[:, 0],
        )
        self._envs_host = nxt_host
        betas = cfg.betas()

        targets: list[Target] = []
        replays: list[Replay] = []
        exploration_replays: list[Replay] = []
        for i in range(cfg.batch):
            log = self.logs[i]
            state_i = _lane(envs_before, i)
            policy_i = [
                (int(a), float(p))
                for a, p in zip(child_actions[i], pol[i])
                if a >= 0
            ]
            if root_inc[i]:
                # Truncated root: pad the missing legal actions at p=0 so
                # the target line lists exactly every legal action
                # (reference Target::from_str contract, target.rs:123-134).
                policy_i = pad_policy_with_legal(
                    policy_i, self._oracle().legal_mask(state_i)
                )
            log.pending.append(
                PendingTarget(
                    tps=state_to_tps(self.eng.n, state_i),
                    policy=policy_i,
                    ube=float(ube[i]),
                    ply=int(state_i.ply),
                )
            )
            log.actions.append(int(action[i]))
            if tk[i] != 0:
                t, r, er = self._complete_game(
                    log, int(tk[i]), betas[i], int(res[i]), bool(road[i])
                )
                targets.extend(t)
                replays.append(r)
                if er is not None:
                    exploration_replays.append(er)
                self.logs[i] = GameLog(
                    start_tps=state_to_tps(self.eng.n, _lane(nxt_host, i))
                )
        return targets, replays, exploration_replays

    def _complete_game(
        self, log: GameLog, terminal_kind: int, beta: float, res: int, road: bool
    ):
        """Back-fill discounted values (selfplay/src/main.rs:263-329)."""
        cfg = self.cfg
        n = self.eng.n
        # Eval::from(terminal) at the final position, negated per ply back.
        flag, ply = terminal_kind, 0
        targets = []
        for pend in reversed(log.pending):
            flag, ply, _ = ev_negate_host(flag, ply)
            value = ev_float_host(flag, ply, cfg.discount)
            if beta == 0.0 or pend.ply > cfg.weighted_random_plies:
                targets.append(
                    Target(
                        tps=pend.tps,
                        value=value,
                        ube=pend.ube,
                        policy=pend.policy,
                        n=n,
                    )
                )
        result = _result_str(res, road)
        replay = Replay(
            tps=log.start_tps, actions=list(log.actions), result=result, n=n
        )
        exploration = None
        if beta > 0.0:
            exploration = Replay(
                tps=log.start_tps,
                actions=log.actions[: cfg.weighted_random_plies],
                result="",
                n=n,
            )
        return targets, replay, exploration


def ev_negate_host(flag: int, ply: int):
    if flag == ev.WIN:
        return ev.LOSS, ply + 1, 0.0
    if flag == ev.LOSS:
        return ev.WIN, ply + 1, 0.0
    return flag, ply + 1, 0.0


def ev_float_host(flag: int, ply: int, discount: float) -> float:
    sign = {ev.WIN: 1.0, ev.LOSS: -1.0, ev.DRAW: 0.0}[flag]
    return sign * discount**ply


_result_str = result_str_from  # single source of truth: data/target.py


def _lane(host_state, i: int):
    return jax.tree.map(lambda x: x[i], host_state)


def dump_root_line(n: int, root, lane: int = 0) -> str:
    """One search-dump line: ``move:visits:eval:std:logit,...`` over valid
    root children — the format tools/analyze_search.py consumes (mirrors
    the reference's runs/*.txt per-move action dumps)."""
    from .tak import action_to_ptn

    def eval_str(flag, ply, value):
        if flag == ev.WIN:
            return f"Win({ply})"
        if flag == ev.LOSS:
            return f"Loss({ply})"
        if flag == ev.DRAW:
            return f"Draw({ply})"
        return f"{value:.6f}"

    items = []
    for j in range(root["action"].shape[1]):
        a = int(root["action"][lane, j])
        if a < 0:
            continue
        items.append(
            f"{action_to_ptn(n, a)}:{int(root['visit'][lane, j])}:"
            f"{eval_str(int(root['flag'][lane, j]), int(root['ply'][lane, j]), float(root['value'][lane, j]))}:"
            f"{float(root['std'][lane, j]):.6f}:{float(root['logit'][lane, j]):.6f}"
        )
    return ",".join(items) + ","
