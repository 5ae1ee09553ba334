"""Step-windowed JAX profiler tracing.

SURVEY.md §5.1: the reference's only tracing is `std::time::Instant`
wall-clock logging (selfplay/src/main.rs:90-125, learn/src/main.rs:542-566);
the TPU-native equivalent is an xplane/perfetto trace.  `StepTrace` wraps a
driver's steady-state loop: it skips the first iteration(s) so compilation
does not dominate the trace, records a fixed window, and writes a trace
directory viewable in XProf / TensorBoard's profile plugin.
"""

import jax


class StepTrace:
    """Trace loop iterations [skip, skip+steps); no-op when dir is None.

    Call `step()` at the top of every loop iteration and `stop()` after
    the loop (also safe mid-loop on early exits).
    """

    def __init__(self, directory, log, skip: int = 1, steps: int = 3):
        self.dir = directory
        self.log = log
        self.skip = skip
        self.steps = steps
        self.n = 0
        self.active = False

    def step(self) -> None:
        if self.dir is None:
            return
        if self.n == self.skip and not self.active:
            jax.profiler.start_trace(str(self.dir))
            self.active = True
            self.log.info(
                "profiler: tracing %d steps to %s", self.steps, self.dir
            )
        elif self.active and self.n >= self.skip + self.steps:
            self.stop()
        self.n += 1

    def stop(self) -> None:
        if self.active:
            jax.profiler.stop_trace()
            self.active = False
            self.log.info("profiler: trace written to %s", self.dir)
