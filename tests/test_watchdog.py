"""utils/watchdog.py — the RSS leak guard (round-5 oom postmortem)."""

import subprocess
import sys

from takzero_tpu.utils.watchdog import RSS_EXIT_CODE, read_rss_gb


def test_read_rss_positive():
    rss = read_rss_gb()
    assert 0.001 < rss < 200  # this process certainly holds a few MB


def test_watchdog_trips_with_distinct_exit_code():
    # A subprocess that allocates ~300 MB must exceed a 0.1 GiB limit and
    # exit with the supervisor-visible code, not the oom-killer's -9.
    src = (
        "from takzero_tpu.utils.watchdog import start_rss_watchdog\n"
        "import time\n"
        "start_rss_watchdog(0.1, interval_s=0.05)\n"
        "blob = bytearray(300 * 1024 * 1024)\n"
        "time.sleep(30)\n"
    )
    proc = subprocess.run([sys.executable, "-c", src], timeout=60)
    assert proc.returncode == RSS_EXIT_CODE


def test_watchdog_disabled_returns_none():
    from takzero_tpu.utils.watchdog import start_rss_watchdog

    assert start_rss_watchdog(0) is None
