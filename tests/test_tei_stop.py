"""TEI mid-search command handling: the stdin-queue protocol
(reference tei/src/main.rs:113-134 stdin thread + AtomicBool)."""

import io
import queue

from takzero_tpu.drivers.tei import TeiEngine


def _engine():
    q = queue.Queue()
    out = io.StringIO()
    e = TeiEngine("tiny3", None, out=out, commands=q)
    e.handle("tei")
    e.handle("isready")
    e.handle("position startpos moves a3 c1")
    return e, q, out


def test_stop_interrupts_go_infinite():
    e, q, out = _engine()
    q.put("stop\n")
    e.handle("go infinite")  # would never return without the stop
    lines = out.getvalue().splitlines()
    assert lines[-1].startswith("bestmove ")
    assert any(x.startswith("info ") for x in lines)
    assert not e.pending


def test_quit_interrupts_search_and_requeues():
    e, q, out = _engine()
    q.put(None)  # EOF while searching = quit
    e.handle("go infinite")
    assert out.getvalue().splitlines()[-1].startswith("bestmove ")
    assert e.pending == ["quit"]  # main loop exits after bestmove


def test_isready_answered_mid_search_and_commands_deferred():
    e, q, out = _engine()
    q.put("isready\n")
    q.put("position startpos moves a3 c1 b2\n")
    q.put("quit\n")  # behind a deferred command: must NOT abort this search
    e.handle("go nodes 128 movetime 60000")
    txt = out.getvalue().splitlines()
    assert "readyok" in txt
    assert txt[-1].startswith("bestmove ")
    # nodes budget (one chunk), not the quit, ended the search.
    assert int(e.tree.root_visit[0]) >= 128
    assert e.pending == ["position startpos moves a3 c1 b2", "quit"]


def test_setoption_halfkomi_rebuilds_engine():
    e, q, out = _engine()
    e.handle("setoption name HalfKomi value 4")
    assert e.eng.half_komi == 4
    e.handle("isready")
    e.handle("position startpos moves a3 c1")
    e.handle("go nodes 128 movetime 60000")
    assert out.getvalue().splitlines()[-1].startswith("bestmove ")
