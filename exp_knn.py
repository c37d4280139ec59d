"""KNN-at-scale experiment: train user-user KNN at Netflix shape
(480k users x 17.7k items, 20M events) on one chip via the streaming
top-k correlation path (ops/correlation.py) — the shape where a dense
[N, N] correlation (920 GB) is impossible.

Run on the real TPU:  python exp_knn.py
Results recorded in BASELINE.md.
"""

import time

import numpy as np

USERS, ITEMS, EVENTS = 480_000, 17_700, 20_000_000


def fetch(x):
    # device->host fetch; block_until_ready doesn't sync over the tunnel
    return np.asarray(x)


def main():
    import jax
    print("devices:", jax.devices())
    from mymedialite_tpu.data.synthetic import synthetic_posonly, \
        synthetic_ratings
    from mymedialite_tpu.ops import correlation as corr_ops

    # timing-only measurement: sample events directly (the full
    # synthetic_posonly generator draws a Gumbel per (event, item) pair
    # — ~700G variates at this shape)
    t0 = time.time()
    rng = np.random.default_rng(5)
    pop = rng.zipf(1.3, size=ITEMS).astype(np.float64)
    pop /= pop.sum()
    from mymedialite_tpu.data.arrays import PosOnlyData
    fb = PosOnlyData(rng.integers(0, USERS, EVENTS).astype(np.int32),
                     rng.choice(ITEMS, EVENTS, p=pop).astype(np.int32),
                     num_users=USERS, num_items=ITEMS)
    print(f"posonly data: {len(fb.users)} events "
          f"({time.time() - t0:.1f}s to generate)")

    # --- binary cosine user-user top-k (UserKNN implicit train) ---
    t0 = time.time()
    ids, vals = corr_ops.binary_correlation_topk(
        fb, USERS, ITEMS, k=80, kind="cosine", chunk=4096)
    dt = time.time() - t0
    print(f"binary cosine topk [480k x 480k -> 80]: {dt:.1f}s "
          f"({USERS * USERS / dt / 1e9:.1f} G pairs/s)")
    assert ids.shape == (USERS, 80) and np.isfinite(vals[:, 0]).all()

    # --- Pearson user-user top-k (UserKNN rating train) ---
    t0 = time.time()
    rd = synthetic_ratings(num_users=USERS, num_items=ITEMS,
                           num_ratings=EVENTS, seed=6)
    print(f"rating data: {len(rd.users)} ratings "
          f"({time.time() - t0:.1f}s to generate)")
    lev = corr_ops._quantize_levels(np.asarray(rd.values, np.float64), True)
    print("int8 level path:", lev is not None)
    t0 = time.time()
    ids, vals = corr_ops.rating_correlation_topk(
        rd, k=80, entity="user", kind="pearson", chunk=4096)
    dt = time.time() - t0
    print(f"pearson topk [480k x 480k -> 80]: {dt:.1f}s "
          f"({USERS * USERS / dt / 1e9:.1f} G pairs/s)")
    assert ids.shape == (USERS, 80) and np.isfinite(vals[:, 0]).all()


if __name__ == "__main__":
    main()
