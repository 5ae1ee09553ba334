"""Eval total-order test (port of reference eval.rs:169-194 eval_order)."""

import jax.numpy as jnp
import numpy as np

from takzero_tpu.search import eval as ev


def _keys(items):
    flag = jnp.asarray([f for f, _, _ in items], jnp.int32)
    ply = jnp.asarray([p for _, p, _ in items], jnp.int32)
    val = jnp.asarray([v for _, _, v in items], jnp.float32)
    prim, sec = ev.order_keys(flag, ply, val)
    return list(zip(np.asarray(prim).tolist(), np.asarray(sec).tolist()))


def test_eval_order_matches_reference():
    V, W, L, D = ev.VALUE, ev.WIN, ev.LOSS, ev.DRAW
    evals = [
        (V, 0, 1.0),
        (V, 0, ev.CONTEMPT + 0.1),
        (V, 0, -1.0),
        (W, 5, 0.0),
        (W, 10, 0.0),
        (D, 5, 0.0),
        (D, 10, 0.0),
        (L, 5, 0.0),
        (L, 10, 0.0),
    ]
    expected_sorted = [
        (L, 5, 0.0),
        (L, 10, 0.0),
        (V, 0, -1.0),
        (D, 10, 0.0),
        (D, 5, 0.0),
        (V, 0, ev.CONTEMPT + 0.1),
        (V, 0, 1.0),
        (W, 10, 0.0),
        (W, 5, 0.0),
    ]
    ordered = sorted(evals, key=lambda e: _keys([e])[0])
    assert ordered == expected_sorted


def test_argmin_argmax_respect_order():
    V, W, L, D = ev.VALUE, ev.WIN, ev.LOSS, ev.DRAW
    flag = jnp.asarray([[W, L, V, D, L]], jnp.int32)
    ply = jnp.asarray([[3, 7, 0, 2, 2]], jnp.int32)
    val = jnp.asarray([[0.0, 0.0, 0.3, 0.0, 0.0]], jnp.float32)
    valid = jnp.ones((1, 5), bool)
    # Worst = earliest loss (ply 2, index 4); best = the win.
    assert int(ev.argmin_eval(flag, ply, val, valid)[0]) == 4
    assert int(ev.argmax_eval(flag, ply, val, valid)[0]) == 0


def test_negate_and_float():
    # Win(0).negate() = Loss(1); f32 = -gamma.
    f, p, v = ev.negate(jnp.int32(ev.WIN), jnp.int32(0), jnp.float32(0))
    assert int(f) == ev.LOSS and int(p) == 1
    x = float(ev.eval_to_float(f, p, v))
    assert abs(x + ev.DISCOUNT) < 1e-6
    assert abs(ev.SERIES_DISCOUNT - 1.0 / (1.0 - 0.997**2)) < 1e-9
