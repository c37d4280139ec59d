"""Benchmark: BiasedMF SGD rating-update throughput on one TPU chip.

Headline metric matching BASELINE.md: the reference's BiasedMF on
Netflix k=40 runs ~242 s/iteration over ~100.5M ratings ~= 0.42M
sequential SGD rating-updates/s on CPU (reference doc/Performance:1-3).
Here: jitted minibatch-SGD epochs (ops/sgd.py) on a Netflix-shaped
synthetic dataset; value = rating updates applied per second.

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

    data = sgd.prepare_epoch_data(users, items, values, BATCH)
    n_pad = int(data["users"].shape[0])

    key = jax.random.PRNGKey(0)
    k1, k2, key = jax.random.split(key, 3)
    params = dict(
        global_bias=jnp.float32(0.0),
        user_factors=0.1 * jax.random.normal(
            k1, (NUM_USERS, NUM_FACTORS), dtype=jnp.float32),
        item_factors=0.1 * jax.random.normal(
            k2, (NUM_ITEMS, NUM_FACTORS), dtype=jnp.float32),
        user_bias=jnp.zeros(NUM_USERS, dtype=jnp.float32),
        item_bias=jnp.zeros(NUM_ITEMS, dtype=jnp.float32),
    )
    hp = dict(learn_rate=jnp.float32(0.005), reg_u=jnp.float32(0.015),
              reg_i=jnp.float32(0.015), bias_reg=jnp.float32(0.01),
              bias_learn_rate=jnp.float32(1.0), min_rating=jnp.float32(1.0),
              rating_range=jnp.float32(4.0))

    def epoch(params, sub):
        return sgd.sgd_epoch(
            params, data, sub, hp, batch_size=BATCH, loss=sgd.LOSS_RMSE,
            biased=True, update_user=True, update_item=True,
            frequency_regularization=False)

    def sync(p):
        # device->host fetch of a value that depends on the whole epoch:
        # block_until_ready is not reliable over the axon tunnel
        return float(jnp.sum(p["user_factors"][:8]))

    # warmup/compile
    key, sub = jax.random.split(key)
    t0 = time.time()
    params = epoch(params, sub)
    sync(params)
    compile_s = time.time() - t0
    print(f"warmup+compile: {compile_s:.1f}s  (pad {n_pad} ratings, "
          f"{n_pad // BATCH} batches/epoch)", file=sys.stderr)

    t0 = time.time()
    for _ in range(EPOCHS):
        key, sub = jax.random.split(key)
        params = epoch(params, sub)
    checksum = sync(params)
    elapsed = time.time() - t0
    print(f"checksum {checksum:.6f}", file=sys.stderr)

    updates_per_s = EPOCHS * n_pad / elapsed
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
