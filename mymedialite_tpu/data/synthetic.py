"""Synthetic dataset generators for tests and benchmarks.

The environment has no network egress, so MovieLens/Netflix can't be
downloaded; these generators produce datasets with MovieLens-like
statistics (power-law item popularity, per-user activity spread, a
low-rank latent structure in the ratings) so that quality numbers are
meaningful: a factor model should beat the global-average baseline by a
clear margin on held-out data iff it actually learns.
"""

from __future__ import annotations

import numpy as np

from mymedialite_tpu.data.arrays import PosOnlyData, RatingData


def synthetic_ratings(num_users: int = 943, num_items: int = 1682,
                      num_ratings: int = 100_000, rank: int = 8,
                      noise: float = 0.6, seed: int = 42,
                      with_times: bool = False,
                      time_drift: float = 0.0,
                      return_factors: bool = False):
    """Low-rank-plus-biases rating generator on a 1..5 scale.

    ``time_drift`` > 0 (with ``with_times``) adds a per-item linear
    temporal drift of that magnitude to the true score — gives the
    time-aware baselines (Koren 2009 temporal dynamics) real signal to
    model. ``return_factors`` additionally returns the planted
    (P, Q, b_u, b_i) — used e.g. to derive a factor-consistent social
    trust graph for SocialMF quality rows."""
    rng = np.random.default_rng(seed)
    # popularity: Zipf-ish item distribution, log-normal user activity
    item_p = 1.0 / np.arange(1, num_items + 1) ** 0.8
    item_p /= item_p.sum()
    user_p = rng.lognormal(0.0, 1.0, num_users)
    user_p /= user_p.sum()
    users = rng.choice(num_users, size=num_ratings, p=user_p).astype(np.int32)
    items = rng.choice(num_items, size=num_ratings, p=item_p).astype(np.int32)
    # dedup (u,i) pairs, keep first occurrence
    _, first = np.unique(users.astype(np.int64) * num_items + items,
                         return_index=True)
    first = np.sort(first)
    users, items = users[first], items[first]
    n = users.size

    P = rng.normal(0, 1.0 / np.sqrt(rank), (num_users, rank))
    Q = rng.normal(0, 1.0 / np.sqrt(rank), (num_items, rank))
    bu = rng.normal(0, 0.35, num_users)
    bi = rng.normal(0, 0.35, num_items)
    raw = 3.6 + bu[users] + bi[items] + np.einsum(
        "nf,nf->n", P[users], Q[items]) * 1.2 + rng.normal(0, noise, n)
    times = None
    if with_times:
        times = rng.integers(880_000_000, 893_000_000, n)
        if time_drift:
            d_i = rng.normal(0, 1.0, num_items)
            t_norm = (times - 880_000_000) / 13_000_000.0
            raw = raw + time_drift * (t_norm - 0.5) * d_i[items]
    values = np.clip(np.round(raw * 2) / 2, 1.0, 5.0)  # half-star scale
    data = RatingData(users, items, values, num_users=num_users,
                      num_items=num_items, times=times)
    if return_factors:
        return data, (P, Q, bu, bi)
    return data


def synthetic_posonly(num_users: int = 943, num_items: int = 1682,
                      num_events: int = 50_000, rank: int = 8,
                      seed: int = 7) -> PosOnlyData:
    """Implicit feedback where 'likes' follow a latent low-rank preference,
    so ranking models can achieve AUC well above 0.5."""
    rng = np.random.default_rng(seed)
    P = rng.normal(0, 1, (num_users, rank)).astype(np.float32)
    Q = rng.normal(0, 1, (num_items, rank)).astype(np.float32)
    pop = rng.normal(0, 1, num_items).astype(np.float32)
    user_p = rng.lognormal(0.0, 1.0, num_users)
    user_p /= user_p.sum()
    users = rng.choice(num_users, size=num_events * 2, p=user_p).astype(np.int32)
    # sample items per event from softmax(popularity + affinity) via the
    # Gumbel trick, chunked to bound the [chunk, num_items] temporary
    items = np.empty(users.size, dtype=np.int32)
    # affinity dominates popularity so factor models beat raw popularity
    scale = np.float32(2.0 / np.sqrt(rank))
    for s in range(0, users.size, 4096):
        chunk = users[s:s + 4096]
        logits = P[chunk] @ Q.T * scale + 0.5 * pop[None, :]
        g = rng.gumbel(size=logits.shape).astype(np.float32)
        items[s:s + 4096] = np.argmax(logits + g, axis=1)
    _, first = np.unique(users.astype(np.int64) * num_items + items,
                         return_index=True)
    first = np.sort(first)[:num_events]
    return PosOnlyData(users[first], items[first], num_users=num_users,
                       num_items=num_items)


def split_ratings(data: RatingData, test_fraction: float = 0.2, seed: int = 1):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(data))
    n_test = int(len(data) * test_fraction)
    return (data.select(np.sort(perm[n_test:])),
            data.select(np.sort(perm[:n_test])))


def split_posonly(data: PosOnlyData, test_fraction: float = 0.2, seed: int = 1):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(data))
    n_test = int(len(data) * test_fraction)
    return (data.select(np.sort(perm[n_test:])),
            data.select(np.sort(perm[:n_test])))
