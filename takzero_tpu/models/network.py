"""Flax network family for Tak.

TPU-first re-design of the reference's LibTorch nets
(takzero/src/network/{net4_rnd,net5,net4_simhash,net6_simhash,net4_lcghash,
net4_ensemble}.rs):

* shared ResNet core: conv3x3 (no bias) + BN + relu, `blocks` residual
  blocks of `filters` channels (net4*/net6*: 16x256, net5: 20x256);
* policy head: conv3x3 -> output_channels, flattened channel-major to match
  the action-index layout;
* value head: conv1x1 -> relu -> flatten -> dense(1) -> tanh;
* UBE head: same as value without tanh, fed a *detached* core, predicting
  log-variance (net6_simhash.rs:194-201);
* optional RND predictor/target towers (net4_rnd.rs:126-166) or MLP RND
  (net5.rs:122-148) with persisted min/max normalization;
* optional ensemble value heads over the detached core (net4_ensemble.rs).

Compute is NHWC/bfloat16-friendly: inputs arrive channel-major [B, C, N, N]
(the golden-test layout) and are transposed once at the top.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.repr import input_channels, input_size
from ..tak.moves import action_space

MAXIMUM_VARIANCE = 4.0  # value span is [-1, 1] -> variance <= 2^2


@dataclasses.dataclass(frozen=True)
class NetConfig:
    n: int = 6
    half_komi: int = 4
    filters: int = 256
    blocks: int = 16
    novelty: str = "simhash"  # simhash | lcghash | rnd | ensemble | none
    hash_bits: int = 32
    rnd_filters: int = 32
    rnd_blocks: int = 4
    rnd_mlp: bool = False  # net5-style MLP RND instead of conv tower
    ensemble_size: int = 16
    compute_dtype: Any = jnp.bfloat16

    @property
    def num_actions(self) -> int:
        return action_space(self.n).num_actions

    @property
    def output_channels(self) -> int:
        return action_space(self.n).num_channels


def _conv(filters: int, kernel: int, use_bias: bool, dtype):
    return nn.Conv(
        filters,
        (kernel, kernel),
        padding="SAME",
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=nn.initializers.he_normal(),
    )


class ConvBN(nn.Module):
    filters: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        x = _conv(self.filters, 3, False, self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
        )(x)
        return x


class ResBlock(nn.Module):
    filters: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        y = ConvBN(self.filters, self.dtype)(x, train)
        y = nn.relu(y)
        y = ConvBN(self.filters, self.dtype)(y, train)
        return nn.relu(x + y)


class Core(nn.Module):
    cfg: NetConfig

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.cfg
        x = ConvBN(c.filters, c.compute_dtype)(x, train)
        x = nn.relu(x)
        for _ in range(c.blocks):
            x = ResBlock(c.filters, c.compute_dtype)(x, train)
        return x


class ScalarHead(nn.Module):
    """conv1x1 -> relu -> flatten -> dense(1); optional tanh."""

    tanh: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = _conv(1, 1, True, self.dtype)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.Dense(1)(x)[:, 0]
        return jnp.tanh(x) if self.tanh else x


class RndTower(nn.Module):
    """RND conv tower (net4_rnd.rs:126-166): LN -> conv/BN/relu -> blocks."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.cfg
        x = nn.LayerNorm(reduction_axes=(1, 2, 3))(x)
        x = x.astype(c.compute_dtype)
        x = ConvBN(c.rnd_filters, c.compute_dtype)(x, train)
        x = nn.relu(x)
        for _ in range(c.rnd_blocks):
            x = ResBlock(c.rnd_filters, c.compute_dtype)(x, train)
        x = ConvBN(32, c.compute_dtype)(x, train)
        return x.reshape(x.shape[0], -1).astype(jnp.float32)


class RndMlp(nn.Module):
    """net5-style MLP RND (net5.rs:122-148): L2-normalized input -> MLP."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, x, train: bool):
        del train
        x = x.reshape(x.shape[0], -1)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
        x = x.astype(self.cfg.compute_dtype)
        for width in (1024, 1024, 512):
            x = nn.relu(nn.Dense(width, dtype=self.cfg.compute_dtype)(x))
        return x.astype(jnp.float32)


class TakNet(nn.Module):
    cfg: NetConfig

    @nn.compact
    def __call__(self, planes, train: bool = False, with_core: bool = False):
        """planes: [B, C, N, N] float32 -> (policy [B,A], value [B], ube [B]).

        `ube` is log-variance on a stop-gradient core (the reference's
        detached UBE head).  ``with_core`` appends the tower output
        [B,N,N,F] so extra heads (ensemble) reuse the same forward — the
        reference's forward_t hands its ensemble the SAME core, detached
        (net4_ensemble.rs:149-154).
        """
        c = self.cfg
        x = jnp.transpose(planes, (0, 2, 3, 1)).astype(c.compute_dtype)  # NHWC
        core = Core(c, name="core")(x, train)

        pol = _conv(c.output_channels, 3, True, c.compute_dtype)(core)
        # Back to channel-major so the flat index equals the action index.
        policy = jnp.transpose(pol, (0, 3, 1, 2)).reshape(
            pol.shape[0], -1
        ).astype(jnp.float32)

        value = ScalarHead(tanh=True, dtype=c.compute_dtype, name="value")(core)
        ube = ScalarHead(tanh=False, dtype=c.compute_dtype, name="ube")(
            jax.lax.stop_gradient(core)
        )
        out = (policy, value, ube)
        return out + (core,) if with_core else out


class RndPair(nn.Module):
    """Predictor + frozen target; forward returns per-example squared error."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, planes, train: bool = False):
        c = self.cfg
        tower = RndMlp if c.rnd_mlp else RndTower
        x = jnp.transpose(planes, (0, 2, 3, 1)) if not c.rnd_mlp else planes
        pred = tower(c, name="predictor")(x, train)
        tgt = jax.lax.stop_gradient(tower(c, name="target")(x, False))
        return jnp.sum((pred - tgt) ** 2, axis=-1)


class EnsembleHeads(nn.Module):
    """Extra value heads over the detached core (net4_ensemble.rs:130-171)."""

    cfg: NetConfig

    @nn.compact
    def __call__(self, core):
        core = jax.lax.stop_gradient(core)
        outs = [
            ScalarHead(tanh=True, dtype=self.cfg.compute_dtype, name=f"head_{i}")(core)
            for i in range(self.cfg.ensemble_size)
        ]
        return jnp.stack(outs, axis=-1)  # [B, E]


# ---------------------------------------------------------------------------
# BN-folded inference path
# ---------------------------------------------------------------------------
#
# At inference, conv+BatchNorm folds exactly into conv+bias:
#   BN(conv(x, W)) = conv(x, W * g/sqrt(v+eps)) + (b - m*g/sqrt(v+eps))
# which lets XLA fuse the whole residual tower into back-to-back MXU
# matmuls with bias/relu epilogues — the unfused eval path spends ~40% of
# its time moving f32 BN activations through HBM.  The fold is a pure
# function of (params, batch_stats), loop-invariant in any search scan.

_BN_EPS = 1e-5


def _fold_conv_bn(conv, bn_params, bn_stats, dtype):
    k = conv["kernel"]
    g, b = bn_params["scale"], bn_params["bias"]
    m, v = bn_stats["mean"], bn_stats["var"]
    s = g / jnp.sqrt(v + _BN_EPS)
    # Kernels stored in the compute dtype: no per-call f32->bf16 cast and
    # half the weight traffic per evaluation.
    return (k * s[None, None, None, :]).astype(dtype), b - m * s


def fold_inference_params(cfg: NetConfig, params, batch_stats):
    """Fold the core's ConvBN pairs; heads are copied (they have bias)."""
    dt = cfg.compute_dtype
    core_p, core_s = params["core"], batch_stats["core"]
    out = {"stem": _fold_conv_bn(
        core_p["ConvBN_0"]["Conv_0"],
        core_p["ConvBN_0"]["BatchNorm_0"],
        core_s["ConvBN_0"]["BatchNorm_0"],
        dt,
    )}
    blocks = []
    for i in range(cfg.blocks):
        bp, bs = core_p[f"ResBlock_{i}"], core_s[f"ResBlock_{i}"]
        blocks.append(
            tuple(
                _fold_conv_bn(
                    bp[f"ConvBN_{j}"]["Conv_0"],
                    bp[f"ConvBN_{j}"]["BatchNorm_0"],
                    bs[f"ConvBN_{j}"]["BatchNorm_0"],
                    dt,
                )
                for j in (0, 1)
            )
        )
    out["blocks"] = blocks
    out["policy"] = (params["Conv_0"]["kernel"], params["Conv_0"]["bias"])
    for head in ("value", "ube"):
        h = params[head]
        out[head] = (
            h["Conv_0"]["kernel"],
            h["Conv_0"]["bias"],
            h["Dense_0"]["kernel"],
            h["Dense_0"]["bias"],
        )
    return out


def _conv2d(x, kernel, bias, dtype):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + bias[None, None, None, :]


def apply_folded(cfg: NetConfig, fw, planes, with_core: bool = False):
    """Inference forward on folded weights: (policy [B,A], value, ube).

    ``with_core`` appends the residual-tower output [B,N,N,F] (for extra
    heads, e.g. the ensemble) so callers never pay a second full tower."""
    dt = cfg.compute_dtype
    x = jnp.transpose(planes, (0, 2, 3, 1))  # NHWC
    x = jax.nn.relu(_conv2d(x, *fw["stem"], dt)).astype(dt)
    for (k1, b1), (k2, b2) in fw["blocks"]:
        y = jax.nn.relu(_conv2d(x, k1, b1, dt)).astype(dt)
        y = _conv2d(y, k2, b2, dt)
        x = jax.nn.relu(x.astype(jnp.float32) + y).astype(dt)
    core = x

    pol = _conv2d(core, *fw["policy"], dt)
    policy = jnp.transpose(pol, (0, 3, 1, 2)).reshape(pol.shape[0], -1)

    def scalar_head(w, tanh):
        ck, cb, dk, db = w
        h = jax.nn.relu(_conv2d(core, ck, cb, dt))
        h = h.reshape(h.shape[0], -1)
        out = h @ dk + db
        out = out[:, 0]
        return jnp.tanh(out) if tanh else out

    value = scalar_head(fw["value"], True)
    ube = scalar_head(fw["ube"], False)
    out = (policy.astype(jnp.float32), value, ube)
    return out + (core,) if with_core else out


def init_network(cfg: NetConfig, seed: int = 0):
    """Initialize TakNet variables: returns (model, variables)."""
    model = TakNet(cfg)
    dummy = jnp.zeros((1, input_channels(cfg.n), cfg.n, cfg.n), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    return model, variables


def init_rnd(cfg: NetConfig, seed: int = 0):
    model = RndPair(cfg)
    dummy = jnp.zeros((1, input_channels(cfg.n), cfg.n, cfg.n), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), dummy, train=False)
    return model, variables


def simhash_matrix(cfg: NetConfig, seed: int = 0) -> jnp.ndarray:
    """Fixed Gaussian projection [input_size, hash_bits] (net6_simhash.rs:134)."""
    return jax.random.normal(
        jax.random.PRNGKey(seed ^ 0x51A5), (input_size(cfg.n), cfg.hash_bits)
    )
