"""Offline analysis tools (reference python/ directory, SURVEY.md §2.3).

Mapping to the reference scripts:

* elo.py                      -> tools/elo.py (native Bradley-Terry fit,
                                 no bayeselo.exe subprocess)
* get_match_results.py        -> tools/match_results.py
* extract_from_logs.py        -> tools/logs.py (+ metrics.jsonl support)
* plot_elo_data.py, plot_eee.py, novelty_per_depth.py -> tools/plots.py
* analyze_search.py + improved_policy.py -> tools/analyze_search.py
  (root-dump metrics incl. the sigma-variant comparison)
* action_space.py             -> tools/action_space.py
* generate_openings.py        -> tools/openings.py
* concat_out.py               -> tools/concat_out.py
* replay_buffer_uniqueness.py -> drivers/graph.py (uniqueness curves)

Beyond the reference's scripts: elo_curve.py (checkpoint-dir Elo
pipeline), make_puzzles.py / mine_avoidance.py / merge_puzzles.py /
audit_avoidance.py (puzzle-DB generation the reference keeps off-repo),
anchor.py, reuse_ab.py, multihost_scaling.py, serve_bench.py and the
op-level microbenches ({op,phase,pool}_cliff.py, scatter_variants.py).

Plotting is gated on matplotlib availability so data paths run headless.

Like the driver CLIs (drivers/__init__.py), tools honor an explicit
``JAX_PLATFORMS`` env var even when the axon sitecustomize has already
forced the remote-TPU platform list: device-using tools (make_puzzles'
batched prover, serve_bench, reuse_ab) can then be pinned to the host CPU
while a training run owns the chip.
"""

import os as _os

_requested = _os.environ.get("JAX_PLATFORMS", "").strip().lower()
if _requested:
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _requested)
    except Exception:  # backends already live: leave them be
        pass
