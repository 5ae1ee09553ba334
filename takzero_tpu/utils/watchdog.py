"""Host-RSS watchdog for long-lived driver processes.

Round-4 postmortem: five ``tools/elo_curve`` attempts died with rc -9.
``dmesg`` shows the kernel oom-killer taking the evaluation subprocess at
**130.6 GB anon RSS** on a 128 GB host — and the final kill lands in the
same minute the TPU tunnel goes dead (runs/tunnel_probe.log), while the
identical driver completes fine on CPU (runs/eval_cpu).  The growth is in
the remote-backend client during tunnel stalls, not in our arrays; it can
reach ~500 MB/s, so by the time the kernel reacts the whole host is gone
and every sibling process is at risk.

This watchdog converts that failure mode into a *clean, attributable*
exit: a daemon thread polls ``/proc/self/status`` VmRSS and calls
``os._exit(exit_code)`` past the limit (``os._exit`` because a stalled
remote backend can hang normal interpreter teardown forever).  Supervisors
(tools/elo_curve.py) treat the distinctive exit code as "leak tripped —
probe the tunnel, then relaunch", keeping per-subprocess blast radius
bounded.  The reference has no analog (its binaries are single-host Rust
with no remote device link to leak).
"""

from __future__ import annotations

import logging
import os
import threading
import time

log = logging.getLogger("watchdog")

RSS_EXIT_CODE = 42


def read_rss_gb(pid: int | None = None) -> float:
    """Current resident set size in GiB (0.0 if unreadable)."""
    path = f"/proc/{pid or 'self'}/status"
    try:
        with open(path, encoding="ascii") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / (1024 * 1024)
    except OSError:
        pass
    return 0.0


def start_rss_watchdog(
    limit_gb: float,
    interval_s: float = 5.0,
    exit_code: int = RSS_EXIT_CODE,
) -> threading.Thread | None:
    """Start a daemon thread that hard-exits once RSS exceeds ``limit_gb``.

    Returns the thread, or None when ``limit_gb`` is falsy (disabled).
    """
    if not limit_gb:
        return None

    def _watch() -> None:
        peak = 0.0
        while True:
            rss = read_rss_gb()
            peak = max(peak, rss)
            if rss > limit_gb:
                log.error(
                    "RSS %.1f GiB exceeds limit %.1f GiB — exiting %d "
                    "(leak guard; see utils/watchdog.py)",
                    rss, limit_gb, exit_code,
                )
                # Flush what we can; teardown may hang on a dead tunnel.
                for h in logging.getLogger().handlers:
                    try:
                        h.flush()
                    except Exception:
                        pass
                os._exit(exit_code)
            time.sleep(interval_s)

    t = threading.Thread(target=_watch, name="rss-watchdog", daemon=True)
    t.start()
    log.info("RSS watchdog armed at %.1f GiB", limit_gb)
    return t
