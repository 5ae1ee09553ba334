"""Step-windowed profiler tracing (SURVEY.md §5.1 TPU equivalent)."""

import logging

import jax
import jax.numpy as jnp

from takzero_tpu.utils.profile import StepTrace

log = logging.getLogger("test_profile")


def test_step_trace_writes_xplane(tmp_path):
    trace = StepTrace(tmp_path, log, skip=1, steps=2)
    f = jax.jit(lambda x: x * 2.0)
    for _ in range(5):
        trace.step()
        f(jnp.ones(8)).block_until_ready()
    trace.stop()
    assert not trace.active
    # jax writes plugins/profile/<ts>/<host>.xplane.pb under the dir.
    assert list(tmp_path.rglob("*.xplane.pb"))


def test_step_trace_noop_without_dir():
    trace = StepTrace(None, log)
    for _ in range(3):
        trace.step()
    trace.stop()
    assert not trace.active


def test_step_trace_stop_mid_window(tmp_path):
    trace = StepTrace(tmp_path, log, skip=0, steps=10)
    trace.step()
    assert trace.active
    trace.stop()  # early exit path (learn's no-wait return)
    assert not trace.active
    assert list(tmp_path.rglob("*.xplane.pb"))
