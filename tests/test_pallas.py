"""Pallas kernel equality tests (interpreter mode on CPU) and the LCG
closed-form identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_simhash_pack_matches_reference_interpret():
    from takzero_tpu.ops.pallas_kernels import simhash_pack, simhash_pack_reference

    key = jax.random.PRNGKey(0)
    for b, inp, bits in [(8, 96, 32), (128, 1296, 26), (64, 243, 12)]:
        kx, km, key = jax.random.split(key, 3)
        x = jax.random.normal(kx, (b, inp))
        m = jax.random.normal(km, (inp, bits))
        ref = np.asarray(simhash_pack_reference(x, m))
        out = np.asarray(simhash_pack(x, m, interpret=True))
        np.testing.assert_array_equal(out, ref)
        assert out.dtype == np.uint32


def test_lcg_closed_form_equals_serial_fold():
    from takzero_tpu.models.agent import _LCG_A, _LCG_C, _lcg_closed_form

    rng = np.random.default_rng(3)
    for k in (1, 5, 333):
        xs = rng.integers(0, 2**32, size=(4, k), dtype=np.uint32)
        # Serial reference fold.
        acc = np.zeros(4, np.uint32)
        a, c = np.uint32(_LCG_A), np.uint32(_LCG_C)
        for i in range(k):
            acc = acc * a + c + xs[:, i]
        weights, const = _lcg_closed_form(k)
        closed = (
            np.sum(
                xs.astype(np.uint64) * np.asarray(weights, np.uint64)[None, :],
                axis=-1,
            )
            + np.uint64(const)
        ).astype(np.uint32)
        np.testing.assert_array_equal(closed, acc)


def test_lcghash_indices_still_deterministic():
    """Same planes -> same bucket; different planes -> (almost surely)
    different buckets; matches across calls (hash persistence contract)."""
    from takzero_tpu.models.agent import lcghash_indices, new_agent
    from takzero_tpu.models.network import NetConfig
    from takzero_tpu.ops.repr import input_channels

    cfg = NetConfig(n=3, half_komi=0, novelty="lcghash", hash_bits=20)
    bundle = new_agent(cfg, seed=0)
    c = input_channels(3)
    key = jax.random.PRNGKey(1)
    planes = jax.random.normal(key, (6, c, 3, 3))
    i1 = np.asarray(lcghash_indices(cfg, bundle["hash_scale"], planes))
    i2 = np.asarray(lcghash_indices(cfg, bundle["hash_scale"], planes))
    np.testing.assert_array_equal(i1, i2)
    assert (i1 < (1 << 20)).all()
    assert len(set(i1.tolist())) > 1


def test_exact_topk_kernel_interpret():
    """Radix-select top-k (experiment): exact vs the selection rule."""
    import numpy as np

    import jax.numpy as jnp

    from takzero_tpu.ops.topk import (
        exact_top_k_unsorted,
        exact_top_k_unsorted_reference,
    )

    rng = np.random.default_rng(3)

    def rule(x, k):
        order = np.lexsort((np.arange(x.shape[-1]), -x.astype(np.float64)))[:k]
        return np.sort(order)

    for mode in ("normal", "ties", "masked"):
        if mode == "normal":
            x = rng.standard_normal((3, 1030)).astype(np.float32)
        elif mode == "ties":
            x = rng.integers(0, 4, (3, 1030)).astype(np.float32)
        else:
            x = np.full((3, 1030), -3.0e38, np.float32)
            for i in range(3):
                j = rng.choice(1030, 20, replace=False)
                x[i, j] = rng.standard_normal(20).astype(np.float32)
        v, i = exact_top_k_unsorted(jnp.asarray(x), 16, interpret=True)
        vr, ir = exact_top_k_unsorted_reference(jnp.asarray(x), 16)
        for b in range(3):
            want = rule(x[b], 16)
            np.testing.assert_array_equal(np.asarray(i)[b], want, err_msg=mode)
            np.testing.assert_allclose(np.asarray(v)[b], x[b][want])
            np.testing.assert_array_equal(np.asarray(ir)[b], want)
            np.testing.assert_allclose(np.asarray(vr)[b], x[b][want])


def test_search_with_pallas_topk_matches_exact_reference():
    """A full search step with the Pallas radix-select expansion top-k is
    bit-identical to one using the pure-JAX exact selection (identical
    tie-break semantics), validating the in-search wiring end to end."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from takzero_tpu.search.agents import dummy_evaluator
    from takzero_tpu.search.core import make_kernels
    from takzero_tpu.search.tree import init_tree
    from takzero_tpu.tak import engine, ptn_to_action

    eng = engine(3)

    def run(topk):
        simulate, simulate_batch = make_kernels(
            eng, dummy_evaluator(eng), max_depth=16, topk=topk
        )

        @jax.jit
        def go(tree):
            tree = simulate(tree, jnp.zeros(2))
            return simulate_batch(tree, jnp.zeros(2), 7)

        s = eng.initial()
        s = eng.step_jit(s, ptn_to_action(3, "a3"))
        s = eng.step_jit(s, ptn_to_action(3, "c1"))
        envs = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), s)
        return go(init_tree(eng, envs, max_nodes=16, max_children=32))

    got = run("pallas")  # interpret mode on CPU
    ref = run("exact_ref")
    np.testing.assert_array_equal(
        np.asarray(got.child_action), np.asarray(ref.child_action)
    )
    np.testing.assert_array_equal(
        np.asarray(got.child_visit), np.asarray(ref.child_visit)
    )
    np.testing.assert_array_equal(
        np.asarray(got.node_count), np.asarray(ref.node_count)
    )
    np.testing.assert_allclose(
        np.asarray(got.child_value), np.asarray(ref.child_value), atol=1e-6
    )


@pytest.mark.parametrize("impl", ["exact_ref", "grouped"])
def test_search_with_unsorted_topk_matches_lax_semantics(impl):
    """Search outcome (per-ACTION root visit/value stats) is identical
    whether expansion uses sorted lax.top_k or an unsorted exact
    selection — from a position where action 0 is ILLEGAL and there are
    fewer legal moves than max_children, so the unsorted impls place a -1
    filler in slot 0 (regression: Tree.root_expanded must not key on
    slot 0, else the root is wiped and re-expanded every simulation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from takzero_tpu.search.agents import dummy_evaluator
    from takzero_tpu.search.core import make_kernels
    from takzero_tpu.search.tree import init_tree
    from takzero_tpu.tak import engine, ptn_to_action

    eng = engine(3)
    s = eng.initial()
    # Occupy a1: the lowest-indexed placement becomes illegal.
    s = eng.step_jit(s, ptn_to_action(3, "a1"))
    s = eng.step_jit(s, ptn_to_action(3, "c3"))
    legal = np.asarray(eng.legal_mask(s))
    assert not legal[0] and legal.sum() < 64  # the premise of the test
    envs = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), s)

    def per_action(tree):
        # Scatter root child stats to dense action-indexed arrays, the
        # slot-permutation-invariant view of the search result.
        act = np.asarray(tree.child_action[:, 0, :])
        vis = np.asarray(tree.child_visit[:, 0, :])
        val = np.asarray(tree.child_value[:, 0, :])
        b, a = act.shape[0], int(np.asarray(eng.legal_mask(s)).shape[0])
        dv = np.zeros((b, a), vis.dtype)
        dq = np.zeros((b, a), val.dtype)
        for i in range(b):
            m = act[i] >= 0
            dv[i, act[i, m]] = vis[i, m]
            dq[i, act[i, m]] = val[i, m]
        return dv, dq

    def run(topk):
        simulate, simulate_batch = make_kernels(
            eng, dummy_evaluator(eng), max_depth=16, topk=topk
        )

        @jax.jit
        def go(tree):
            tree = simulate(tree, jnp.zeros(2))
            return simulate_batch(tree, jnp.zeros(2), 7)

        return go(init_tree(eng, envs, max_nodes=16, max_children=64))

    got = run(impl)
    ref = run("lax")
    assert np.asarray(got.root_expanded()).all()
    np.testing.assert_array_equal(
        np.asarray(got.node_count), np.asarray(ref.node_count)
    )
    np.testing.assert_array_equal(
        np.asarray(got.root_visit), np.asarray(ref.root_visit)
    )
    gv, gq = per_action(got)
    rv, rq = per_action(ref)
    np.testing.assert_array_equal(gv, rv)
    np.testing.assert_allclose(gq, rq, atol=1e-6)


def test_exact_topk_grouped():
    """Grouped two-stage lax.top_k: exact selection (values multiset always;
    index set whenever no boundary ties)."""
    import numpy as np

    import jax.numpy as jnp

    from takzero_tpu.ops.topk import (
        exact_top_k_unsorted_grouped,
        exact_top_k_unsorted_reference,
    )

    rng = np.random.default_rng(5)
    for mode in ("normal", "ties", "masked", "uneven"):
        a = 1030 if mode != "uneven" else 9036
        if mode == "ties":
            x = rng.integers(0, 4, (3, a)).astype(np.float32)
        elif mode == "masked":
            x = np.full((3, a), -3.0e38, np.float32)
            for i in range(3):
                j = rng.choice(a, 20, replace=False)
                x[i, j] = rng.standard_normal(20).astype(np.float32)
        else:
            x = rng.standard_normal((3, a)).astype(np.float32)
        v, i = exact_top_k_unsorted_grouped(jnp.asarray(x), 16)
        vr, ir = exact_top_k_unsorted_reference(jnp.asarray(x), 16)
        v, i, vr, ir = map(np.asarray, (v, i, vr, ir))
        for b in range(3):
            # Selected values match the exact top-k multiset.
            np.testing.assert_allclose(np.sort(v[b]), np.sort(vr[b]), err_msg=mode)
            # Indices are in-bounds, unique, and point at their values.
            assert len(set(i[b].tolist())) == 16
            assert (i[b] >= 0).all() and (i[b] < a).all()
            np.testing.assert_allclose(x[b][i[b]], v[b], err_msg=mode)
            if mode != "ties":
                np.testing.assert_array_equal(np.sort(i[b]), ir[b], err_msg=mode)


def test_exact_topk_neginf_rows_no_nan():
    """Rows with fewer than k finite entries (-inf masking, the lax.top_k
    convention) must return -inf for the missing slots — a selected -inf
    used to poison the whole emit matmul with 0*inf=NaN."""
    import numpy as np

    import jax.numpy as jnp

    from takzero_tpu.ops.topk import (
        exact_top_k_unsorted,
        exact_top_k_unsorted_grouped,
        exact_top_k_unsorted_reference,
    )

    rng = np.random.default_rng(7)
    x = np.full((4, 513), -np.inf, np.float32)
    for i in range(4):
        j = rng.choice(513, 10, replace=False)
        x[i, j] = rng.standard_normal(10).astype(np.float32)
    k = 64
    v, idx = exact_top_k_unsorted(jnp.asarray(x), k, interpret=True)
    v, idx = np.asarray(v), np.asarray(idx)
    assert not np.isnan(v).any()
    assert (idx >= 0).all() and (idx < 513).all()
    vl, _ = jax.lax.top_k(jnp.asarray(x), k)
    for b in range(4):
        # Same multiset of values as lax.top_k: 10 finite + 54 -inf.
        np.testing.assert_array_equal(
            np.sort(v[b]), np.sort(np.asarray(vl)[b])
        )
        # Each slot's value is the input at its reported index.
        np.testing.assert_array_equal(v[b], x[b][idx[b]])
    vg, ig = exact_top_k_unsorted_grouped(jnp.asarray(x), k)
    assert not np.isnan(np.asarray(vg)).any()
    vr, ir = exact_top_k_unsorted_reference(jnp.asarray(x), k)
    assert not np.isnan(np.asarray(vr)).any()
    np.testing.assert_array_equal(np.asarray(vr), v)
    np.testing.assert_array_equal(np.asarray(ir), idx)
