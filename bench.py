"""Benchmark: BiasedMF SGD rating-update throughput on one TPU chip.

Headline metric matching BASELINE.md: the reference's BiasedMF on
Netflix k=40 runs ~242 s/iteration over ~100.5M ratings ~= 0.42M
sequential SGD rating-updates/s on CPU (reference doc/Performance:1-3).
Here: the production blocked epoch (ops/sgd.py sgd_epoch_blocked —
VMEM-slab user table, fused bias columns) on a Netflix-shaped synthetic
dataset; value = rating updates applied per second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# Netflix-prize-shaped problem, scaled to keep bench wall-clock modest
NUM_USERS = int(os.environ.get("BENCH_USERS", 480_000))
NUM_ITEMS = int(os.environ.get("BENCH_ITEMS", 17_770))
NUM_RATINGS = int(os.environ.get("BENCH_RATINGS", 20_000_000))
NUM_FACTORS = int(os.environ.get("BENCH_FACTORS", 40))
BATCH = int(os.environ.get("BENCH_BATCH", 131_072))
GROUP = int(os.environ.get("BENCH_GROUP", 16_384))
EPOCHS = int(os.environ.get("BENCH_EPOCHS", 3))

BASELINE_UPDATES_PER_S = 0.42e6  # reference CPU, doc/Performance:1-3


def main():
    import jax
    import jax.numpy as jnp

    from mymedialite_tpu.ops import sgd

    rng = np.random.default_rng(0)
    users = rng.integers(0, NUM_USERS, NUM_RATINGS).astype(np.int32)
    items = rng.integers(0, NUM_ITEMS, NUM_RATINGS).astype(np.int32)
    values = rng.uniform(1.0, 5.0, NUM_RATINGS).astype(np.float32)

    data, meta = sgd.prepare_blocked_data(
        users, items, values, NUM_USERS, BATCH, GROUP, shuffle_seed=0)
    n_effective = meta["ngroups"] * meta["l_pad"]

    wu = 0.1 * rng.standard_normal((NUM_USERS, NUM_FACTORS)).astype(np.float32)
    hi = 0.1 * rng.standard_normal((NUM_ITEMS, NUM_FACTORS)).astype(np.float32)
    W_ext, H_ext = sgd.extend_tables(wu, hi, group_users=GROUP)

    hp = dict(global_bias=jnp.float32(0.0), min_rating=jnp.float32(1.0),
              rating_range=jnp.float32(4.0))
    rates = sgd.column_rates(NUM_FACTORS, 0.005, 0.015, 0.015, 1.0, 0.01,
                             True, True, True)
    freq = (jnp.zeros(0), jnp.zeros(0))
    key = jax.random.PRNGKey(0)

    def epoch(W, H, sub):
        return sgd.sgd_epoch_blocked(
            W, H, data, sub, hp, rates, freq,
            meta=tuple(sorted(meta.items())), loss=sgd.LOSS_RMSE,
            biased=True, frequency_regularization=False)

    def sync(W):
        # device->host fetch that depends on the whole epoch:
        # block_until_ready is not reliable over the axon tunnel
        return float(jnp.sum(W[:8]))

    key, sub = jax.random.split(key)
    t0 = time.time()
    W_ext, H_ext = epoch(W_ext, H_ext, sub)
    sync(W_ext)
    print(f"warmup+compile: {time.time() - t0:.1f}s  "
          f"({meta['ngroups']} groups x {meta['l_pad']} ratings, "
          f"batch {meta['batch']})", file=sys.stderr)

    t0 = time.time()
    for _ in range(EPOCHS):
        key, sub = jax.random.split(key)
        W_ext, H_ext = epoch(W_ext, H_ext, sub)
    checksum = sync(W_ext)
    elapsed = time.time() - t0
    print(f"checksum {checksum:.6f}", file=sys.stderr)

    updates_per_s = EPOCHS * n_effective / elapsed
    print(f"{EPOCHS} epochs in {elapsed:.2f}s -> "
          f"{updates_per_s/1e6:.2f}M updates/s", file=sys.stderr)
    print(json.dumps({
        "metric": "biasedmf_sgd_rating_updates_per_s",
        "value": round(updates_per_s, 1),
        "unit": "updates/s",
        "vs_baseline": round(updates_per_s / BASELINE_UPDATES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
