"""Wire formats for targets and replays — byte-compatible with the
reference's shared text files (takzero/src/target.rs:56-73, 215-232):

* target line:  ``{tps};{value};{ube};{move}:{p},{move}:{p},...``
* replay line:  ``[TPS "{tps}"] {move} {move} ... {result}``

These are the contracts of the whole distributed system (learner tails
them, reanalyze re-expands them), and keeping them means the reference's
offline tooling keeps working.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..tak import action_to_ptn, ptn_to_action, tps_to_state
from ..tak.engine import TakEngine


@dataclass
class Target:
    tps: str
    value: float
    ube: float
    policy: list  # [(action_index, probability)]
    n: int

    def to_line(self) -> str:
        pol = ",".join(
            f"{action_to_ptn(self.n, a)}:{_fmt(p)}" for a, p in self.policy
        )
        return f"{self.tps};{_fmt(self.value)};{_fmt(self.ube)};{pol}"

    @classmethod
    def from_line(cls, n: int, line: str) -> "Target":
        tps, value, ube, pol = line.strip().split(";")
        policy = []
        for item in pol.split(","):
            mv, p = item.rsplit(":", 1)
            policy.append((ptn_to_action(n, mv), float(p)))
        return cls(tps=tps, value=float(value), ube=float(ube), policy=policy, n=n)

    def state(self):
        return tps_to_state(self.n, self.tps)


@dataclass
class Replay:
    tps: str  # starting position
    actions: list = field(default_factory=list)  # action indices
    result: str = ""  # PTN result string, may be empty
    n: int = 6

    def to_line(self) -> str:
        moves = " ".join(action_to_ptn(self.n, a) for a in self.actions)
        parts = [f'[TPS "{self.tps}"]']
        if moves:
            parts.append(moves)
        if self.result:
            parts.append(self.result)
        return " ".join(parts)

    @classmethod
    def from_line(cls, n: int, line: str) -> "Replay":
        line = line.strip()
        assert line.startswith('[TPS "'), line
        end = line.index('"]')
        tps = line[len('[TPS "') : end]
        rest = line[end + 2 :].split()
        result = ""
        if rest and (rest[-1] in ("R-0", "0-R", "F-0", "0-F", "1/2-1/2", "1-0", "0-1")):
            result = rest[-1]
            rest = rest[:-1]
        actions = [ptn_to_action(n, mv) for mv in rest]
        return cls(tps=tps, actions=actions, result=result, n=n)

    def states(self, eng: TakEngine):
        """Every position before each action (reference target.rs:205-212)."""
        import jax

        state = tps_to_state(self.n, self.tps)
        out = []
        for a in self.actions:
            out.append(state)
            state = jax.tree.map(np.asarray, eng.step_jit(state, a))
        return out


def _fmt(x: float) -> str:
    """Shortest f32 decimal (Rust Display-like: 4 -> "4", 0.997 -> "0.997").

    Values are float32 on the wire both ways, so the shortest string that
    round-trips FLOAT32 is emitted (widening to f64 first would print
    0.997 as "0.996999979019165" — 17 digits of noise per field).
    NaN/inf serialize as text (like Rust's Display) instead of raising —
    a diverged network must not kill an actor mid-write and lose the
    whole batch of finished games."""
    f = np.float32(x)
    if np.isfinite(f) and f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return np.format_float_positional(f, unique=True, trim="0")


def pad_policy_with_legal(policy: list, legal_mask) -> list:
    """Append zero-probability entries for legal actions missing from
    `policy`.  The reference stores ALL children, so its target lines
    list exactly every legal action and `Target::from_str` validates
    that (target.rs:123-134); a child-truncated root here stores only
    the top-C children — pad the rest so the wire contract (and the
    learner's legality mask, built from the policy entries) stays exact."""
    have = {a for a, _ in policy}
    pad = [
        (int(a), 0.0)
        for a in np.flatnonzero(np.asarray(legal_mask))
        if int(a) not in have
    ]
    return policy + pad


def result_str_from(res: int, road: bool) -> str:
    """PTN result from (winner color, won-by-road): R-0/0-R roads,
    F-0/0-F flats, 1/2-1/2 draws."""
    if res == 2:
        return "1/2-1/2"
    if res == 0:
        return "R-0" if road else "F-0"
    return "0-R" if road else "0-F"


def result_string(eng: TakEngine, state) -> str:
    """PTN result for a terminal state ("R-0", "0-F", "1/2-1/2", ...)."""
    res = int(np.asarray(eng.game_result_jit(state)))
    if res == -1:
        return ""
    roads = np.asarray(eng._roads(state))
    return result_str_from(res, bool(roads[res]) if res in (0, 1) else False)
