"""Array-encoded game-theoretic evaluations.

The reference's `Eval` enum (takzero/src/search/eval.rs) — Value(f32) |
Win(ply) | Loss(ply) | Draw(ply) — becomes three parallel arrays:

* ``flag``: int32, 0=Value, 1=Win, 2=Loss, 3=Draw (matches the engine's
  ``terminal_kind`` codes);
* ``ply``: int32, distance to the proven result (0 for terminal nodes);
* ``value``: float32, the running mean value (meaningful when flag==0).

Semantics verified against eval.rs:
* negate: Win(p) <-> Loss(p+1), Draw(p) -> Draw(p+1), Value(v) -> -v;
* float conversion: gamma^ply * (+1 | -1 | 0 | v), gamma = 0.997;
* total order (eval.rs:138-163): losses (earlier = worse) < values < wins
  (later = worse); draws order as the contempt value -0.05, later draws
  smaller.  Implemented as a lexicographic (primary, secondary) key so
  value-vs-ply precision can never interact.
"""

from __future__ import annotations

import jax.numpy as jnp

DISCOUNT = 0.997
# Geometric-series sum of squared discounts (reference search/mod.rs:8;
# declared for UBE-style horizon math, unused by the training loop).
SERIES_DISCOUNT = 1.0 / (1.0 - DISCOUNT * DISCOUNT)
CONTEMPT = -0.05

VALUE, WIN, LOSS, DRAW = 0, 1, 2, 3


def eval_to_float(flag, ply, value):
    """f32(eval) — gamma^ply discounted (eval.rs:95-105)."""
    sign = jnp.where(flag == WIN, 1.0, jnp.where(flag == LOSS, -1.0, 0.0))
    base = jnp.where(flag == VALUE, value, sign)
    disc = jnp.where(flag == VALUE, 1.0, DISCOUNT ** ply.astype(jnp.float32))
    return base * disc


def negate(flag, ply, value):
    nf = jnp.where(flag == WIN, LOSS, jnp.where(flag == LOSS, WIN, flag))
    np_ = jnp.where(flag == VALUE, ply, ply + 1)
    return nf, np_, -value


def negated_float(flag, ply, value):
    """f32(eval.negate()) — the q-value of a child (node/mod.rs:114-124)."""
    f, p, v = negate(flag, ply, value)
    return eval_to_float(f, p, v)


def is_known(flag):
    return flag != VALUE


def order_keys(flag, ply, value):
    """Lexicographic (primary, secondary) sort keys; smaller = worse."""
    plyf = ply.astype(jnp.float32)
    primary = jnp.where(
        flag == LOSS,
        -2.0,
        jnp.where(
            flag == WIN,
            2.0,
            jnp.where(flag == DRAW, CONTEMPT, value),
        ),
    )
    secondary = jnp.where(
        flag == LOSS,
        plyf,  # earlier losses are worse
        jnp.where((flag == WIN) | (flag == DRAW), -plyf, 0.0),
    )
    return primary, secondary


def argmin_eval(flag, ply, value, valid, axis=-1):
    """Index of the minimum (worst) eval along `axis` among `valid` entries."""
    primary, secondary = order_keys(flag, ply, value)
    big = jnp.float32(3.4e38)
    primary = jnp.where(valid, primary, big)
    pmin = jnp.min(primary, axis=axis, keepdims=True)
    tie = primary == pmin
    secondary = jnp.where(tie, jnp.where(valid, secondary, big), big)
    return jnp.argmin(secondary, axis=axis)


def argmax_eval(flag, ply, value, valid, axis=-1):
    primary, secondary = order_keys(flag, ply, value)
    small = jnp.float32(-3.4e38)
    primary = jnp.where(valid, primary, small)
    pmax = jnp.max(primary, axis=axis, keepdims=True)
    tie = primary == pmax
    secondary = jnp.where(tie, jnp.where(valid, secondary, small), small)
    return jnp.argmax(secondary, axis=axis)


def take_eval(flag, ply, value, idx, axis=-1):
    """Gather one eval triple at `idx` along `axis`."""
    idxe = jnp.expand_dims(idx, axis)
    f = jnp.take_along_axis(flag, idxe, axis=axis).squeeze(axis)
    p = jnp.take_along_axis(ply, idxe, axis=axis).squeeze(axis)
    v = jnp.take_along_axis(value, idxe, axis=axis).squeeze(axis)
    return f, p, v
