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


def test_stop_interrupts_even_behind_deferred_commands():
    """stop ALWAYS interrupts the current search — a deferred command
    ahead of it must not turn `go infinite` into a livelock."""
    e, q, out = _engine()
    q.put("position startpos moves a3 c1 b2\n")  # deferred
    q.put("stop\n")
    e.handle("go infinite")  # would never return if stop were deferred
    txt = out.getvalue().splitlines()
    assert txt[-1].startswith("bestmove ")
    assert e.pending == ["position startpos moves a3 c1 b2"]


def test_quit_interrupts_infinite_behind_deferred_commands():
    e, q, out = _engine()
    q.put("isready\n")
    q.put("position startpos\n")  # deferred
    q.put(None)  # EOF = quit; only stop/quit can end `infinite`
    e.handle("go infinite")
    assert out.getvalue().splitlines()[-1].startswith("bestmove ")
    assert e.pending[-1] == "quit"


def test_setoption_model_keeps_position():
    """setoption name Model mid-game must not clobber the position (and
    must drop the old model's tree)."""
    e, q, out = _engine()
    e.handle("go nodes 128 movetime 60000")
    before = int(e.position.ply)
    e.handle("setoption name Model value /nonexistent-is-fine-unset")
    assert e.tree is None
    e.model_path = None  # don't actually try to load the fake path
    e.handle("go nodes 128 movetime 60000")
    assert int(e.position.ply) == before  # still the mid-game position
    assert out.getvalue().splitlines()[-1].startswith("bestmove ")


def test_go_on_terminal_position_is_nullmove():
    e, q, out = _engine()
    e.handle("position startpos moves c3 a1 b1 b3 c1")  # white road a1-b1-c1
    e.handle("go movetime 1000")
    txt = out.getvalue().splitlines()
    assert txt[-1] == "bestmove 0000"


def test_malformed_commands_do_not_kill_engine():
    e, q, out = _engine()
    assert e.handle("position") is True
    assert e.handle("position foo") is True
    assert e.handle("go movetime abc") is True
    txt = out.getvalue()
    assert "info string error" in txt
    e.handle("position startpos moves a3 c1")
    e.handle("go nodes 128 movetime 60000")
    assert out.getvalue().splitlines()[-1].startswith("bestmove ")
