"""TEI engine server (UCI-like protocol for Tak).

Replaces tei/src/{main.rs,protocol.rs}: a stdin/stdout loop speaking TEI —
handshake (``tei`` -> id/option/teiok), ``setoption``, ``isready``,
``teinewgame``, ``position [startpos|tps ...] [moves ...]``, ``go`` with
wtime/btime/winc/binc/movetime/nodes/infinite, ``stop``, ``quit``.

Search runs in chunks of simulations on a single root (PUCT with the
exact solver, beta=0), printing ``info`` lines (time, nodes, nps, score
cp / mate, pv) between chunks; time budget = remaining/10 + 3*increment/4
(tei/src/main.rs:241-243).  A stdin-reader thread feeds a command queue
so ``stop``/``isready`` reach an in-flight search between chunks (the
reference's stdin thread + AtomicBool, tei/src/main.rs:113-134); other
commands arriving mid-search are deferred in order.

Usage:  python -m takzero_tpu.drivers.tei [--net net6_simhash] [--model CKPT]
"""

from __future__ import annotations

import argparse
import math
import queue
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NET_PRESETS
from ..models.agent import make_net_evaluate, new_agent
from ..search import eval as ev
from ..search.core import make_kernels
from ..search.policy import select_best_slot, slot_action
from ..search.serve import make_serve_chunk
from ..search.tree import descend_device, init_tree
from ..tak import action_to_ptn, engine, ptn_to_action, tps_to_state
from ..utils import ckpt

SIM_CHUNK = 128
PV_LEN = 12


class TeiEngine:
    def __init__(
        self, net: str, model_path: str | None, out=sys.stdout, commands=None
    ):
        self.net_name = net
        self.model_path = model_path
        self.out = out
        self.commands = commands  # queue.Queue fed by the stdin thread
        self.pending: list[str] = []  # commands deferred during a search
        self.cfg = NET_PRESETS[net]
        self.eng = engine(self.cfg.n, half_komi=self.cfg.half_komi)
        self.bundle = None
        self.position = None
        self._run = None
        self.tree = None  # reused search tree (descend across positions)
        self._descend = None
        self.tree_history = None

    def send(self, line: str) -> None:
        print(line, file=self.out, flush=True)

    # ------------------------------------------------------------------
    def ensure_ready(self):
        if self.bundle is not None:
            return
        self.bundle = new_agent(self.cfg, seed=0)
        if self.model_path:
            self.bundle = ckpt.load_checkpoint_partial(self.model_path, self.bundle)
        evaluator = make_net_evaluate(self.cfg, self.eng)

        def run_chunk(tree, bundle):
            # One plain simulation expands the root, then the wavefront
            # serve kernel collects SIM_CHUNK-1 leaves per network call
            # (the reference tei's `virtual` feature, mcts.rs:268-328) with
            # O(K + depth) sequential rounds instead of O(K*depth) — the
            # single-game serve path stays on the MXU at full batch width
            # without being latency-bound on B=1 descents (search/serve.py).
            simulate, _ = make_kernels(
                self.eng, lambda e: evaluator(bundle, e), max_depth=64
            )
            serve = make_serve_chunk(
                self.eng, lambda e: evaluator(bundle, e), SIM_CHUNK - 1,
                max_depth=64,
            )
            tree = simulate(tree, jnp.zeros(1))
            return serve(tree, jnp.zeros(1))

        self._run = jax.jit(run_chunk)

        def info_pack(tree):
            """[flag, ply, value_bits, pv_actions...] in ONE device array.

            The PV walk runs on device — fetching the full child_action/
            node/visit pools (tens of MB at TEI tree sizes) per info line
            dwarfed the search itself over a remote link.  Each PV step
            mirrors the reference's `select_best_action` per node
            (node/mod.rs:132-163, used by its PV iterator mod.rs:40-62):
            eval-minimal child on solved nodes, else most-visited, else
            max-probability — so the PV's first move always matches the
            bestmove select_best_slot plays.
            """
            ca = tree.child_action[0]
            cn = tree.child_node[0]
            cv = tree.child_visit[0]
            cf = tree.child_flag[0]
            cp = tree.child_ply[0]
            cval = tree.child_value[0]
            cpr = tree.child_prob[0]

            def body(carry, _):
                node, alive, known = carry
                valid = ca[node] >= 0
                any_valid = jnp.any(valid)
                solved_slot = ev.argmin_eval(
                    cf[node][None], cp[node][None], cval[node][None],
                    valid[None],
                )[0]
                visits = jnp.where(valid, cv[node], -1)
                most_visited = jnp.argmax(visits)
                by_prob = jnp.argmax(jnp.where(valid, cpr[node], -1.0))
                unsolved = jnp.where(
                    jnp.max(visits) <= 0, by_prob, most_visited
                )
                slot = jnp.where(known, solved_slot, unsolved).astype(jnp.int32)
                act = jnp.where(alive & any_valid, ca[node, slot], -1)
                nxt = cn[node, slot]
                alive = alive & any_valid & (nxt >= 0)
                known_next = cf[node, slot] != ev.VALUE
                return (
                    jnp.where(alive, nxt, node), alive, known_next
                ), act

            (_, _, _), acts = jax.lax.scan(
                body,
                (jnp.int32(0), jnp.bool_(True), tree.root_flag[0] != ev.VALUE),
                None,
                length=PV_LEN,
            )
            return jnp.concatenate(
                [
                    tree.root_flag[:1],
                    tree.root_ply[:1],
                    jax.lax.bitcast_convert_type(tree.root_value, jnp.int32)[:1],
                    acts,
                ]
            )

        self._info_pack = jax.jit(info_pack)
        self._terminal = jax.jit(self.eng.terminal_kind)
        if self.position is None:
            self.position = self.eng.initial()

    # ------------------------------------------------------------------
    def cmd_position(self, parts: list[str]):
        self.ensure_ready()
        i = 0
        if parts[i] == "startpos":
            state = self.eng.initial()
            key = ("startpos",)
            i += 1
        elif parts[i] == "tps":
            # TPS is three whitespace-separated fields.
            tps = " ".join(parts[i + 1 : i + 4])
            state = tps_to_state(self.cfg.n, tps)
            key = ("tps", tps)
            i += 4
        else:
            raise ValueError(f"bad position: {parts}")
        moves: list[str] = []
        if i < len(parts) and parts[i] == "moves":
            moves = parts[i + 1 :]
            for mv in moves:
                state = self.eng.step_jit(state, ptn_to_action(self.cfg.n, mv))
        self.position = state

        # Tree reuse: if the new position extends the searched one, descend
        # through the extra moves (tei/src/main.rs:174-201) — on device
        # (descend_device); only the 1-byte ok flag crosses the link.
        new_hist = key + tuple(moves)
        tree = self.tree
        if tree is not None and self.tree_history is not None:
            old = self.tree_history
            if new_hist[: len(old)] == old and len(new_hist) > len(old):
                if self._descend is None:
                    self._descend = jax.jit(descend_device)
                for mv in new_hist[len(old) :]:
                    tree, ok = self._descend(
                        tree, jnp.int32(ptn_to_action(self.cfg.n, mv))
                    )
                    if not bool(ok):
                        tree = None
                        break
            elif new_hist != old:
                tree = None
        else:
            tree = None
        self.tree = tree
        self.tree_history = new_hist

    def cmd_go(self, parts: list[str]):
        self.ensure_ready()
        if int(np.asarray(self._terminal(self.position))) != 0:
            # No legal moves exist; searching would be meaningless and any
            # move string would be illegal. "0000" is the null-move token.
            self.send("info string position is terminal")
            self.send("bestmove 0000")
            return
        opts = {}
        it = iter(parts)
        for tok in it:
            if tok in ("wtime", "btime", "winc", "binc", "movetime", "nodes"):
                opts[tok] = int(next(it))
            elif tok == "infinite":
                opts["infinite"] = True

        to_move = int(self.position.to_move)
        if "movetime" in opts:
            budget_s = opts["movetime"] / 1000.0
        elif "wtime" in opts or "btime" in opts:
            t = opts.get("wtime" if to_move == 0 else "btime", 10_000)
            inc = opts.get("winc" if to_move == 0 else "binc", 0)
            budget_s = (t / 10.0 + 3.0 * inc / 4.0) / 1000.0
        else:
            budget_s = 5.0
        max_nodes = opts.get("nodes", 10**9)

        envs = jax.tree.map(lambda x: jnp.asarray(x)[None], self.position)
        tree = self.tree
        if tree is None or tree.max_nodes != (1 << 14):
            tree = init_tree(
                self.eng, envs, max_nodes=1 << 14,
                max_children=256 if self.cfg.n >= 6 else 128,
            )
        start = time.time()
        nodes = 0
        solved = False
        infinite = bool(opts.get("infinite"))
        while True:
            if solved and infinite:
                # Root proven: under `infinite`, bestmove may only follow
                # `stop` — idle-poll instead of burning simulations.
                time.sleep(0.05)
            else:
                tree = self._run(tree, self.bundle)
                # ONE host transfer per chunk carries the solve state, root
                # eval, and the device-computed PV (and, being a transfer
                # rather than block_until_ready, awaits remote backends so
                # the reported nps stays honest).
                pk = np.asarray(self._info_pack(tree))
                nodes += SIM_CHUNK
                self._info(pk, nodes, time.time() - start)
                solved = int(pk[0]) != ev.VALUE
            if self._poll_commands(infinite=infinite) is not None:
                break  # stop (quit re-queued for the main loop)
            if infinite:
                continue
            if time.time() - start >= budget_s or nodes >= max_nodes or solved:
                break
        slot = select_best_slot(tree)
        action = int(np.asarray(slot_action(tree, slot))[0])
        self.tree = tree  # keep for descend on the next position command
        if action < 0:  # unexpanded root (defensive; terminal gated above)
            self.send("bestmove 0000")
            return
        self.send(f"bestmove {action_to_ptn(self.cfg.n, action)}")

    def _poll_commands(self, infinite: bool = False) -> str | None:
        """Drain stdin lines that arrived mid-search (the reference's
        stdin-reader thread + AtomicBool, tei/src/main.rs:113-134).

        ``isready`` is answered immediately.  ``stop`` ALWAYS interrupts
        the current search (that is what stop means, whenever it
        arrives); deferred commands still run afterwards.  ``quit``
        interrupts when nothing is deferred ahead of it OR the search is
        ``infinite`` (which only stop/quit can end — deferring quit
        behind another command would livelock); an interrupting quit is
        re-queued so the main loop exits after bestmove.  Other piped
        sequences (``go ... go ... quit``) still run every search to its
        budget because their quit is deferred in arrival order.
        """
        if self.commands is None:
            return None
        while True:
            try:
                line = self.commands.get_nowait()
            except queue.Empty:
                return None
            line = "quit" if line is None else line.strip()  # None = EOF
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "isready":
                self.send("readyok")
            elif parts[0] == "stop":
                return "stop"
            elif parts[0] == "quit" and (infinite or not self.pending):
                self.pending.append("quit")
                return "quit"
            else:
                self.pending.append(line)

    def _info(self, pk: np.ndarray, nodes, elapsed):
        flag = int(pk[0])
        ply = int(pk[1])
        value = float(pk[2:3].view(np.float32)[0])
        if flag == ev.WIN:
            score = f"mate {math.ceil(ply / 2)}"
        elif flag == ev.LOSS:
            score = f"mate -{math.ceil(ply / 2)}"
        else:
            # Probability-space value -> centipawn-ish scale.
            score = f"cp {int(600 * value)}"
        pv = [
            action_to_ptn(self.cfg.n, int(a)) for a in pk[3:] if int(a) >= 0
        ]
        nps = int(nodes / max(elapsed, 1e-6))
        self.send(
            f"info time {int(elapsed * 1000)} nodes {nodes} nps {nps}"
            f" score {score} pv {' '.join(pv)}"
        )

    def handle(self, line: str) -> bool:
        """Process one command; returns False on quit."""
        parts = line.strip().split()
        if not parts:
            return True
        cmd, rest = parts[0], parts[1:]
        if cmd == "tei":
            self.send("id name takzero-tpu")
            self.send("id author takzero-tpu contributors")
            self.send("option name Model type string")
            self.send(f"option name HalfKomi type spin default {self.cfg.half_komi}")
            self.send("teiok")
        elif cmd == "setoption":
            # setoption name X value Y
            try:
                name = rest[rest.index("name") + 1]
                value = rest[rest.index("value") + 1]
            except (ValueError, IndexError):
                return True
            if name.lower() == "model":
                self.model_path = value
                self.bundle = None
                # Stats searched under the old weights must not seed the
                # new model's searches; position is kept (ensure_ready no
                # longer clobbers it).
                self.tree = None
                self.tree_history = None
            elif name.lower() == "halfkomi":
                import dataclasses

                self.cfg = dataclasses.replace(
                    self.cfg, half_komi=int(value)
                )
                self.eng = engine(self.cfg.n, half_komi=self.cfg.half_komi)
                self.bundle = None  # jitted kernels close over the engine
                self.position = None
                self.tree = None
                self.tree_history = None
        elif cmd == "isready":
            self.ensure_ready()
            self.send("readyok")
        elif cmd == "teinewgame":
            self.ensure_ready()
            self.position = self.eng.initial()
            self.tree = None
            self.tree_history = None
        elif cmd == "position":
            try:
                self.cmd_position(rest)
            except Exception as e:  # a garbled GUI line must not kill us
                self.send(f"info string error: bad position command ({e})")
        elif cmd == "go":
            try:
                self.cmd_go(rest)
            except Exception as e:
                self.send(f"info string error: bad go command ({e})")
                self.send("bestmove 0000")
        elif cmd == "stop":
            pass  # no search in flight: nothing to stop
        elif cmd == "quit":
            return False
        return True


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--net", default="net6_simhash", choices=NET_PRESETS)
    parser.add_argument("--model", default=None)
    args = parser.parse_args(argv)

    # stdin-reader thread feeding a queue, so `stop`/`isready` reach an
    # in-flight search (reference tei/src/main.rs:113-134).
    q: queue.Queue = queue.Queue()

    def reader():
        for line in sys.stdin:
            q.put(line)
        q.put(None)  # EOF

    threading.Thread(target=reader, daemon=True).start()
    eng = TeiEngine(args.net, args.model, commands=q)
    while True:
        line = eng.pending.pop(0) if eng.pending else q.get()
        if line is None or not eng.handle(line):
            break


if __name__ == "__main__":
    main()
