"""Elo-vs-steps curve for one training run, end to end.

The reference's learning-curve pipeline is three manual stages: the
evaluation binary logs ``a vs. b: Evaluation { .. }`` lines to job files,
``python/get_match_results.py`` scrapes them into 7-column CSVs, and
``python/elo.py`` pipes those through bayeselo and plots
(match_results/*/*.csv, figures/elo.png).  This tool drives the same
pipeline over a run directory of numbered checkpoints:

1. run the round-robin pit fighter (drivers/evaluation.py) for N rounds,
   teeing its log into ``<dir>/eval_curve.log``;
2. scrape matches into ``<dir>/match_results.csv`` (tools/match_results);
3. fit relative Bayes-Elo (tools/elo.py) and write
   ``<dir>/elo_curve.json`` — ``[{steps, elo, stderr}, ...]`` — plus an
   optional ``elo_curve.png`` (tools/plots.py).

Usage:
    python -m takzero_tpu.tools.elo_curve --directory RUN --net NET
        [--rounds 40] [--step 1] [--games 64] [--budget 768] [--sampled 64]
        [--skip-matches] [--plot]
"""

from __future__ import annotations

import argparse
import json
import logging
import pathlib
import subprocess
import sys
import time

log = logging.getLogger("elo_curve")


def run_matches(args) -> pathlib.Path:
    log_path = pathlib.Path(args.directory) / "eval_curve.log"
    cmd = [
        sys.executable, "-m", "takzero_tpu.drivers.evaluation",
        "--model-path", args.directory, "--net", args.net,
        "--rounds", str(args.rounds), "--step", str(args.step),
        "--games", str(args.games), "--budget", str(args.budget),
        "--sampled", str(args.sampled), "--seed", str(args.seed),
    ]
    if args.opening_book:
        cmd += ["--opening-book", args.opening_book]
    log.info("running %d evaluation rounds -> %s", args.rounds, log_path)
    if log_path.exists():
        # Never rescrape a previous invocation's matches on top of a
        # replay of the same seeded games — duplicated rows would shrink
        # the Bayes-Elo stderr without adding information.  Keep the old
        # log around for inspection, out of the eval*.log scrape glob.
        bak = log_path.with_suffix(f".log.prev{int(time.time())}")
        log_path.rename(bak)
        log.info("moved previous %s -> %s", log_path.name, bak.name)
    with open(log_path, "a", encoding="utf-8") as f:
        # The driver logs matches on stderr; tee so progress stays visible.
        proc = subprocess.Popen(cmd, stderr=subprocess.PIPE, text=True)
        for line in proc.stderr:
            sys.stderr.write(line)
            f.write(line)
        proc.wait()
        if proc.returncode:
            raise RuntimeError(f"evaluation driver failed: {proc.returncode}")
    return log_path


def fit_and_write(args) -> list[dict]:
    from .elo import elo_curves, read_results
    from .match_results import scrape

    d = pathlib.Path(args.directory)
    text = "".join(
        p.read_text(encoding="utf-8") for p in sorted(d.glob("eval*.log"))
    )
    csv_lines = scrape(text)
    if not csv_lines:
        raise SystemExit(f"no match lines found in {d}/eval*.log")
    csv_path = d / "match_results.csv"
    csv_path.write_text("".join(csv_lines), encoding="utf-8")
    curves = elo_curves(read_results(csv_path))
    # One run directory = one model family ("model_<steps>.ckpt").
    (model, points), = curves.items()
    rows = [
        {"steps": s, "elo": round(e, 1), "stderr": round(se, 1)}
        for s, e, se in points
    ]
    out = d / "elo_curve.json"
    out.write_text(
        json.dumps(
            {"model": model, "matches": len(csv_lines), "curve": rows},
            indent=2,
        ) + "\n",
        encoding="utf-8",
    )
    for r in rows:
        log.info("steps %8d: elo %+7.1f +- %.1f", r["steps"], r["elo"], r["stderr"])
    log.info("wrote %s (%d matches)", out, len(csv_lines))
    if args.plot:
        from .plots import plot_elo

        plot_elo(curves, d / "elo_curve.png")
        log.info("wrote %s", d / "elo_curve.png")
    return rows


def main(argv=None) -> list[dict]:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--directory", required=True)
    parser.add_argument("--net", default="net6_simhash")
    parser.add_argument("--rounds", type=int, default=40)
    parser.add_argument("--step", type=int, default=1)
    parser.add_argument("--games", type=int, default=64)
    parser.add_argument("--budget", type=int, default=768)
    parser.add_argument("--sampled", type=int, default=64)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--opening-book", default=None)
    parser.add_argument("--skip-matches", action="store_true",
                        help="only scrape + fit existing eval*.log files")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if not args.skip_matches:
        run_matches(args)
    return fit_and_write(args)


if __name__ == "__main__":
    main()
