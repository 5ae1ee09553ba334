"""Worker for the real 2-process jax.distributed test (test_multihost).

Each process contributes 4 virtual CPU devices to an 8-device global dp
mesh, feeds its half of the batch via make_array_from_process_local_data,
and runs one sharded train step; the parent asserts both report the same
finite loss (GSPMD all-reduce makes the result process-independent).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid = sys.argv[1], int(sys.argv[2])

    # distributed.initialize must run before ANY backend-touching work,
    # including takzero imports that build device constant tables.
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from takzero_tpu.models.agent import new_agent
    from takzero_tpu.models.network import NetConfig
    from takzero_tpu.parallel import multihost
    from takzero_tpu.tak import engine
    from takzero_tpu.train.data import make_batch, random_pretraining_targets
    from takzero_tpu.train.learner import (
        init_opt,
        make_optimizer,
        make_train_step,
    )
    assert jax.process_count() == 2
    mesh = multihost.global_mesh()
    assert mesh.devices.size == 8, mesh

    cfg = NetConfig(
        n=3, half_komi=0, filters=8, blocks=1, novelty="simhash", hash_bits=10
    )
    eng = engine(3, half_komi=0)

    # Identical seeds on both processes -> identical global batch/params.
    rng = np.random.default_rng(0)
    targets = random_pretraining_targets(eng, 16, rng)
    batch_full = jax.tree.map(
        np.asarray, make_batch(eng, targets, np.random.default_rng(1))
    )
    per, off = multihost.process_batch_slice(16)

    def to_global(host_arr):
        sh = NamedSharding(mesh, P("dp", *([None] * (host_arr.ndim - 1))))
        return jax.make_array_from_process_local_data(
            sh, host_arr[off : off + per], host_arr.shape
        )

    batch = jax.tree.map(to_global, batch_full)

    rep = NamedSharding(mesh, P())

    def replicate(host_arr):
        host_arr = np.asarray(host_arr)
        return jax.make_array_from_callback(
            host_arr.shape, rep, lambda idx: host_arr[idx]
        )

    bundle = jax.tree.map(replicate, jax.tree.map(np.asarray, new_agent(cfg, seed=0)))
    tx = make_optimizer()
    opt_state = jax.tree.map(replicate, jax.tree.map(np.asarray, init_opt(cfg, tx, bundle)))

    step = jax.jit(make_train_step(cfg, tx), static_argnames=("train_ube",))
    bundle, opt_state, metrics = step(bundle, opt_state, batch, train_ube=True)
    print(f"LOSS {float(metrics['loss']):.8f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
