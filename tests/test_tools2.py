"""Offline-tooling tests: elo fit, match scraping, logs, openings,
action space, analyze_search, graph/visualize drivers."""

import numpy as np
import pytest


def test_elo_fit_orders_players():
    from takzero_tpu.tools.elo import MatchResult, elo_curves, fit_elo

    # strong beats mid beats weak; strong beats weak harder.
    matches = [
        MatchResult("run", 200, "run", 100, 40, 15, 9),
        MatchResult("run", 100, "run", 0, 40, 15, 9),
        MatchResult("run", 200, "run", 0, 55, 5, 4),
    ]
    ratings = fit_elo(matches)
    elo = {k: v[0] for k, v in ratings.items()}
    assert elo["run_200"] > elo["run_100"] > elo["run_0"]
    # Relative scale: mean ~ 0; errors positive.
    assert abs(sum(elo.values())) < 1.0
    assert all(err > 0 for _, err in ratings.values())
    # ~70% score -> ~147 elo gap; loose sanity window.
    gap = elo["run_200"] - elo["run_100"]
    assert 60 < gap < 260

    curves = elo_curves(matches)
    assert [s for s, *_ in curves["run"]] == [0, 100, 200]


def test_elo_fit_handles_perfect_score():
    from takzero_tpu.tools.elo import MatchResult, fit_elo

    ratings = fit_elo([MatchResult("m", 1, "m", 0, 10, 0, 0)])
    assert np.isfinite(ratings["m_1"][0]) and ratings["m_1"][0] > 0


def test_match_results_scrape(tmp_path):
    from takzero_tpu.tools.match_results import scrape

    text = (
        "model_0000100.ckpt vs. model_0000200.ckpt: "
        "Evaluation { wins: 40, losses: 20, draws: 4 }\n"
        "foo_01-0300000.ot vs. bar_02-0000000.ot: "
        "Evaluation { wins: 64, losses: 0, draws: 0 }\n"
    )
    lines = scrape(text)
    assert lines[0] == "model, 100, model, 200, 40, 20, 4\n"
    assert lines[1] == "foo_01, 300000, bar_02, 0, 64, 0, 0\n"
    renamed = scrape(text, model_rename="runA")
    assert renamed[0].startswith("runA, 100, runA, 200")


def test_logs_scrape_and_jsonl(tmp_path):
    from takzero_tpu.tools.logs import load_metrics, moving_average

    logtext = (
        "INFO:learn:step 5: loss=1.2345 policy=1.0000 value=0.2000 ube=0.0345\n"
        "INFO:learn:step 6: loss=1.1000 policy=0.9000 value=0.1800 ube=0.0200\n"
    )
    p = tmp_path / "learn.log"
    p.write_text(logtext)
    ms = load_metrics(p)
    assert [m["step"] for m in ms] == [5, 6]
    assert ms[0]["loss"] == pytest.approx(1.2345)

    import json

    j = tmp_path / "metrics.jsonl"
    j.write_text(json.dumps({"step": 1, "loss": 0.5}) + "\n")
    assert load_metrics(j) == [{"step": 1, "loss": 0.5}]

    ma = moving_average([1, 2, 3, 4], 2)
    np.testing.assert_allclose(ma, [1.5, 2.5, 3.5])


def test_action_space_closed_form():
    from takzero_tpu.tools.action_space import placements, spreads, total

    # repr.rs:16-34 exact move counts.
    assert (placements(4), total(4)) == (32, 480)
    assert total(5) == 1575
    assert total(6) == 4572


def test_generate_openings():
    from takzero_tpu.tools.openings import generate_openings

    books = generate_openings(3, 0, 2)
    # 2-ply flat openings on 3x3 up to symmetry: unordered square pairs
    # modulo the 8 symmetries = 12 canonical positions.
    assert len(books) == 12
    assert all(b.count("/") == 2 for b in books)


def test_analyze_search_roundtrip(tmp_path):
    from takzero_tpu.tools.analyze_search import analyze, load

    p = tmp_path / "dump.txt"
    p.write_text(
        "a1:10:-0.5:0.1:1.0,b2:30:0.2:0.3:0.5,c3:0:0.0:0.0:-1.0,\n"
        "a1:5:Win(2):0.0:0.3,b2:2:Loss(3):0.0:0.2,\n"
    )
    roots = load(p)
    assert len(roots) == 2 and len(roots[0]) == 3
    stats = analyze(roots, beta=0.5)
    assert stats["roots"] == 2
    assert 0.0 <= stats["picked_is_best_rate"] <= 1.0


def test_concat_out(tmp_path):
    from takzero_tpu.tools.concat_out import concat_dirs

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    (tmp_path / "a" / "x.log").write_text("early\n")
    (tmp_path / "b" / "x.log").write_text("later\n")
    (tmp_path / "b" / "y.log").write_text("only\n")
    names = concat_dirs(tmp_path / "a", tmp_path / "b", tmp_path / "out")
    assert names == ["x.log", "y.log"]
    assert (tmp_path / "out" / "x.log").read_text() == "early\nlater\n"
    assert (tmp_path / "out" / "y.log").read_text() == "only\n"


@pytest.mark.slow
def test_graph_and_visualize_replay_buffer(tmp_path, monkeypatch):
    import takzero_tpu.drivers.graph as graph_driver
    import takzero_tpu.drivers.visualize_replay_buffer as vrb
    from takzero_tpu.data.target import Replay
    from takzero_tpu.tak import engine, state_to_tps
    from takzero_tpu.tak.oracle import Oracle
    from takzero_tpu.train.data import _host_opening

    eng = engine(3, half_komi=0)
    orc = Oracle(3, 0, eng.reversible_limit)
    rng = np.random.default_rng(0)

    def write_replays(path, seed):
        rng2 = np.random.default_rng(seed)
        lines = []
        for _ in range(4):
            start = _host_opening(eng, orc, rng2)
            _, actions, res = orc.random_playout(
                start, seed=int(rng2.integers(1, 2**31)), max_plies=40
            )
            if res < 0:
                continue
            lines.append(
                Replay(
                    tps=state_to_tps(3, start),
                    actions=[int(a) for a in actions],
                    n=3,
                ).to_line()
            )
        path.write_text("\n".join(lines) + "\n")

    write_replays(tmp_path / "a_replays.txt", 1)
    write_replays(tmp_path / "b_replays.txt", 2)

    pts = graph_driver.unique_position_curve(
        3, tmp_path / "a_replays.txt", positions_cap=100, point_rate=10
    )
    assert pts[0] == (0.0, 1.0)
    assert len(pts) > 1
    assert all(0.0 <= y <= 1.0 for _, y in pts)
    graph_driver.render_html({"a": pts}, tmp_path / "graph.html")
    html = (tmp_path / "graph.html").read_text()
    assert "<svg" in html and "polyline" in html

    monkeypatch.chdir(tmp_path)
    vrb.main(
        [
            str(tmp_path / "a_replays.txt"),
            str(tmp_path / "b_replays.txt"),
            "--n", "3",
            "--initial", "100",
            "--sample", "10",
        ]
    )
    assert (tmp_path / "positions_only_a.opening_book").exists()
    assert (tmp_path / "positions_both.opening_book").exists()


@pytest.mark.slow
def test_visualize_search(tmp_path):
    import takzero_tpu.drivers.visualize_search as vs

    vs.main(
        [
            "--net", "tiny3",
            "--visits", "12",
            "--betas", "0,1",
            "--out-dir", str(tmp_path),
            "--max-children", "32",
        ]
    )
    svg = (tmp_path / "tree_with_beta=0.0.svg").read_text()
    assert "<circle" in svg and 'tps="' in svg
    assert (tmp_path / "tree_with_beta=1.0.svg").exists()


def test_reuse_ab_tool(tmp_path, capsys):
    """The carried-vs-fresh A/B CLI plays both directions and reports a
    score for the reusing side (tools/reuse_ab.py)."""
    import json

    from takzero_tpu.config import NET_PRESETS
    from takzero_tpu.models.agent import new_agent
    from takzero_tpu.tools import reuse_ab
    from takzero_tpu.utils import ckpt

    bundle = new_agent(NET_PRESETS["tiny3"], seed=0)
    path = ckpt.save_checkpoint(str(tmp_path), "model_final.ckpt", bundle)
    out = tmp_path / "ab.json"
    reuse_ab.main(
        [
            "--ckpt", str(path), "--net", "tiny3",
            "--games", "2", "--budget", "16", "--sampled", "4",
            "--max-moves", "20", "--out", str(out),
        ]
    )
    got = json.loads(out.read_text())
    assert got["games"] == 4
    assert got["reuse_wins"] + got["reuse_losses"] + got["draws"] == 4
    assert 0.0 <= got["reuse_score"] <= 1.0
