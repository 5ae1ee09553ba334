"""Loaded bundles must be device-resident (round-5 leak regression guard).

utils/ckpt.py load paths jax.device_put the restored pytree exactly once.
Before that fix, flax restored HOST numpy leaves and every jitted call
re-uploaded ~80 MB of weights over the remote-TPU link — and tunnel
stalls buffered those uploads until the kernel oom-killer fired (the
round-4 elo_curve rc -9 postmortem, utils/watchdog.py).  A host-numpy
regression here is invisible on CPU runs (transfers are free), so pin it
structurally: every leaf of a loaded bundle must be a jax.Array.
"""

import jax
import numpy as np

from takzero_tpu.config import NET_PRESETS
from takzero_tpu.models.agent import new_agent
from takzero_tpu.utils import ckpt


def _assert_device_resident(bundle):
    leaves = jax.tree.leaves(bundle)
    assert leaves
    for leaf in leaves:
        assert isinstance(leaf, jax.Array), type(leaf)


def test_load_checkpoint_returns_device_arrays(tmp_path):
    cfg = NET_PRESETS["tiny3"]
    bundle = new_agent(cfg, seed=0)
    ckpt.save_checkpoint(tmp_path, "model_t.ckpt", bundle)
    loaded = ckpt.load_checkpoint(tmp_path / "model_t.ckpt", new_agent(cfg, seed=1))
    _assert_device_resident(loaded)
    # and the weights actually round-tripped
    a = jax.tree.leaves(bundle)[0]
    b = jax.tree.leaves(loaded)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_checkpoint_partial_returns_device_arrays(tmp_path):
    cfg = NET_PRESETS["tiny3"]
    bundle = new_agent(cfg, seed=0)
    ckpt.save_checkpoint(tmp_path, "model_t.ckpt", bundle)
    loaded = ckpt.load_checkpoint_partial(
        tmp_path / "model_t.ckpt", new_agent(cfg, seed=1)
    )
    _assert_device_resident(loaded)
