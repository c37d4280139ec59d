"""Subprocess driver for the multi-process jax.distributed test.

Run as: python distributed_driver.py <mode> <port> <process_id> <out.npy>

mode "dist": one of 2 cooperating processes (2 CPU devices each ->
4-device global mesh) driving the full multi-host scaffolding
(SURVEY §5 distributed-backend mandate): initialize_distributed ->
make_global_mesh -> host_local_rows -> shard_host_local -> one
sgd_epoch_blocked_sharded step -> process_allgather -> out.npy.

mode "single": the single-process 4-device reference on the same data;
the pytest parent asserts equality (tests/test_partitioning.py).
"""

import os
import sys


def build_data():
    import numpy as np
    rng = np.random.default_rng(0)
    G = 8
    U = G * 4                    # one user group per global device
    I = 48
    n = 256
    users = rng.integers(0, U, n).astype(np.int32)
    items = rng.integers(0, I, n).astype(np.int32)
    values = rng.uniform(1, 5, n).astype(np.float32)
    return G, U, I, users, items, values


def main():
    mode, port, pid, out_path = sys.argv[1:5]
    n_local = 2 if mode == "dist" else 4
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if mode == "dist":
        os.environ["JAX_COORDINATOR"] = f"localhost:{port}"
        os.environ["JAX_NUM_PROCESSES"] = "2"
        os.environ["JAX_PROCESS_ID"] = pid

    import jax.numpy as jnp
    import numpy as np

    from mymedialite_tpu.ops import sgd
    from mymedialite_tpu.parallel.mesh import (
        host_local_rows, initialize_distributed, make_global_mesh,
        shard_host_local,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    inited = initialize_distributed()
    assert inited is (mode == "dist"), (inited, mode)
    if mode == "dist":
        assert jax.process_count() == 2
        assert len(jax.devices()) == 4

    mesh = make_global_mesh()
    assert mesh.devices.size == 4

    G, U, I, users, items, values = build_data()
    data, meta = sgd.prepare_blocked_data(users, items, values, U,
                                          batch_size=32, group_users=G,
                                          shuffle_seed=0)
    rng = np.random.default_rng(1)
    W, H = sgd.extend_tables(
        0.1 * rng.standard_normal((U, 6)).astype(np.float32),
        0.1 * rng.standard_normal((I, 6)).astype(np.float32),
        group_users=G)
    W = np.asarray(W)
    H = np.asarray(H)

    # every host loads only ITS row slice; shard_host_local assembles
    # the global row-sharded arrays (single-process: the whole range)
    lo, hi = host_local_rows(data["gu"].shape[0])
    data_sh = {k: shard_host_local(mesh, np.asarray(v)[lo:hi])
               for k, v in data.items()}
    wlo, whi = host_local_rows(W.shape[0])
    W_sh = shard_host_local(mesh, W[wlo:whi])
    # replicated operand: full array from every process
    repl = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        H_sh = jax.device_put(H, repl)
    else:
        H_sh = jax.make_array_from_process_local_data(repl, H, H.shape)

    hp = dict(global_bias=jnp.float32(0.0), min_rating=jnp.float32(1.0),
              rating_range=jnp.float32(4.0))
    rates = sgd.column_rates(6, 0.01, 0.015, 0.015, 1.0, 0.01,
                             True, True, True)
    freq = (jnp.zeros(0), jnp.zeros(0))
    W2, H2 = sgd.sgd_epoch_blocked_sharded(
        mesh, W_sh, H_sh, data_sh, jax.random.PRNGKey(0), hp, rates,
        freq, meta=tuple(sorted(meta.items())), loss=sgd.LOSS_RMSE,
        biased=True, frequency_regularization=False)

    from jax.experimental import multihost_utils
    W_full = np.asarray(multihost_utils.process_allgather(W2, tiled=True)) \
        if jax.process_count() > 1 else np.asarray(W2)
    H_full = np.asarray(multihost_utils.process_allgather(H2, tiled=True)) \
        if jax.process_count() > 1 else np.asarray(H2)
    np.save(out_path, np.concatenate([W_full.ravel(), H_full.ravel()]))
    print("driver-ok", mode, pid, flush=True)


if __name__ == "__main__":
    main()
