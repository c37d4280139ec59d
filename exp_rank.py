"""Experiment: ranking-eval throughput breakdown (eval/ranking.py).

The hot-path suite measured 1265 users/s at the bench shape. The device
work per batch is one fused score+rank kernel over [B, 17770] — tiny;
suspicion: the per-user host prep (items_by_user + np.unique per user)
and per-user phase-2 metric math dominate. cProfile the full eval.

Usage: python exp_rank.py   (TPU; ~1 min)
"""

import cProfile
import pstats
import time

import numpy as np


def main():
    import jax.numpy as jnp

    U, I, n, f = 480_000, 17_770, 20_000_000, 40
    NU_TEST = 20_000
    rng = np.random.default_rng(0)
    users = rng.integers(0, U, n).astype(np.int32)
    items = (np.minimum(rng.zipf(1.3, n), I) - 1).astype(np.int32)
    # unique pairs only: train/test overlap is rejected by full-list
    # evaluation (reference AUC.cs:64)
    keys = np.unique(users.astype(np.int64) * I + items)
    rng.shuffle(keys)
    users = (keys // I).astype(np.int32)
    items = (keys % I).astype(np.int32)
    n = users.size

    from mymedialite_tpu.data.arrays import PosOnlyData
    split = int(n * 0.95)
    training = PosOnlyData(users[:split], items[:split],
                           num_users=U, num_items=I)
    test_all = PosOnlyData(users[split:], items[split:],
                           num_users=U, num_items=I)

    from mymedialite_tpu.models.bpr import BPRMF
    m = BPRMF()
    m.num_factors = f
    m.feedback = training
    m.init_model()
    m.num_users_trained = U
    m.num_items_trained = I

    from mymedialite_tpu.eval.ranking import evaluate_items
    test_users = np.unique(test_all.users)[:NU_TEST]

    r = evaluate_items(m, test_all, training, test_users=test_users[:512])
    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    r = evaluate_items(m, test_all, training, test_users=test_users)
    prof.disable()
    dt = time.time() - t0
    print(f"eval {r['num_users']} users in {dt:.2f}s -> "
          f"{r['num_users']/dt:.0f} users/s  AUC={r['AUC']:.4f}",
          flush=True)
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
