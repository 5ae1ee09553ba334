"""Search-dump line format (selfplay --dump-search ->
tools/analyze_search.py roundtrip)."""

import numpy as np

from takzero_tpu.search import eval as ev
from takzero_tpu.selfplay import dump_root_line
from takzero_tpu.tak import action_to_ptn
from takzero_tpu.tools.analyze_search import parse_line


def test_dump_roundtrips_through_analyzer():
    root = dict(
        action=np.array([[0, 5, -1, 9]]),
        visit=np.array([[12, 3, 0, 0]]),
        flag=np.array([[ev.VALUE, ev.WIN, 0, ev.LOSS]]),
        ply=np.array([[0, 2, 0, 3]]),
        value=np.array([[0.25, 0.0, 0.0, 0.0]], np.float32),
        std=np.array([[0.5, 0.0, 0.0, 0.1]], np.float32),
        logit=np.array([[1.5, -0.25, 0.0, 0.125]], np.float32),
    )
    line = dump_root_line(3, root)
    items = parse_line(line)
    assert len(items) == 3  # invalid slot skipped
    moves = [m for m, *_ in items]
    assert moves == [action_to_ptn(3, 0), action_to_ptn(3, 5), action_to_ptn(3, 9)]
    # q is negated to the parent's view: Value(0.25) -> -0.25, Win -> -1.
    assert abs(items[0][2] + 0.25) < 1e-6
    assert items[1][2] == -1.0  # child Win(2) is bad for the parent
    assert items[2][2] == 1.0  # child Loss(3) is good for the parent
    assert items[0][1] == 12
    assert abs(items[0][4] - 1.5) < 1e-6
