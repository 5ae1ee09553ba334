"""7x7/8x8 end-to-end smoke: NN + Gumbel search above the fuzzed engine.

The reference is size-generic through its const-generic env
(fast-tak `Game<N, HALF_KOMI>`); its shipped network variants stop at
6x6 but nothing above the env is size-specific.  Mirror that here: the
engine is fuzzed bit-exact at 7/8 (tests/test_oracle_fuzz.py), and this
test pins that the layers above — repr channels, policy-head action
space, tree search — generalize too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from takzero_tpu.models.agent import make_net_evaluate, new_agent
from takzero_tpu.models.network import NetConfig
from takzero_tpu.search.gumbel import make_gumbel_search
from takzero_tpu.search.openings import make_new_opening
from takzero_tpu.search.policy import slot_action
from takzero_tpu.search.tree import init_tree
from takzero_tpu.tak.engine import TakEngine


@pytest.mark.parametrize("n", [7, 8])
def test_nn_gumbel_search_big_boards(n):
    cfg = NetConfig(n=n, half_komi=4, filters=8, blocks=1, novelty="none")
    eng = TakEngine(n=n, half_komi=4)
    agent = new_agent(cfg, 0)
    evaluate = make_net_evaluate(cfg, eng)

    envs = make_new_opening(eng)(jax.random.PRNGKey(0), 2)
    policy, value, ube = evaluate(agent, envs)
    assert policy.shape == (2, eng.num_actions)
    assert np.isfinite(np.asarray(value)).all()
    assert np.isfinite(np.asarray(ube)).all()

    search = jax.jit(
        make_gumbel_search(eng, lambda e: evaluate(agent, e), 4, 16, max_depth=16)
    )
    tree = init_tree(eng, envs, max_nodes=24, max_children=64)
    tree, slot = search(tree, jax.random.PRNGKey(1), jnp.zeros(2))
    acts = np.asarray(slot_action(tree, slot))
    assert (acts >= 0).all()
    # Root visit = sum of child visits + 1 (same invariant as 3x3-6x6).
    rv = np.asarray(tree.root_visit)
    cv = np.asarray(
        jnp.sum(
            jnp.where(tree.child_action[:, 0, :] >= 0, tree.child_visit[:, 0, :], 0),
            axis=-1,
        )
    )
    np.testing.assert_array_equal(rv, cv + 1)
