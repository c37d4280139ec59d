"""Round-5 anchor measurements (VERDICT r4 #6).

(a) ItemKNN correlation build at the 17,770-item Netflix shape — a
    shape the reference CAN run, with an explicit cost model of its
    build loop (Overlap.ComputeUInt, Overlap.cs:63-84: for every user,
    |I_u|(|I_u|-1)/2 increments of a SymmetricSparseMatrix<uint> —
    managed dictionary ops) so the margin is anchored, like the WRMF
    anchor (BASELINE.md).
(b) Online (prequential) eval throughput: evaluate_ratings_online
    (reference RatingsOnline.cs:35-80 per-event predict-then-retrain)
    and evaluate_items_online (ItemsOnline.cs:43-105).

Run on the real TPU: python exp_anchor.py
Results recorded in BASELINE.md.
"""

import time

import numpy as np

USERS, ITEMS, EVENTS = 480_000, 17_770, 20_000_000


def main():
    import jax
    print("devices:", jax.devices())
    from mymedialite_tpu.data.synthetic import (
        split_posonly, split_ratings, synthetic_posonly, synthetic_ratings,
    )
    from mymedialite_tpu.ops import correlation as corr_ops

    # ---------------- (a) ItemKNN build, 17,770 items ----------------
    # build-TIME measurement only: the correlation build cost depends on
    # the (users, items, count distribution) shape, not on planted
    # preference structure, so sample events directly (the full
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
          f"({time.time() - t0:.1f}s to generate)", flush=True)

    # reference cost model at THIS dataset: sum_u |I_u|(|I_u|-1)/2
    # sparse-dict increments + 17,770^2/2 cosine finalize ops
    cnt = np.bincount(np.asarray(fb.users), minlength=USERS).astype(
        np.float64)
    pair_incr = float((cnt * (cnt - 1)).sum() / 2)
    finalize = ITEMS * ITEMS / 2
    # generous managed-dictionary rate 20M ops/s (its measured SGD loop
    # sustains ~0.07 GFLOP/s-effective); realistic 5M/s
    ref_generous = pair_incr / 20e6 + finalize / 100e6
    ref_realistic = pair_incr / 5e6 + finalize / 50e6
    print(f"reference cost model: {pair_incr/1e6:.0f}M pair increments "
          f"+ {finalize/1e6:.0f}M finalize -> >= {ref_generous:.0f}s "
          f"generous / ~{ref_realistic:.0f}s realistic", flush=True)

    # ours: item-item binary cosine top-k (ItemKNN implicit train path,
    # models/knn.py) — items as entities, users as features
    view = type("V", (), dict(users=np.asarray(fb.items),
                              items=np.asarray(fb.users)))
    t0 = time.time()
    ids, vals = corr_ops.binary_correlation_topk(
        view, ITEMS, USERS, k=80, kind="cosine", chunk=4096)
    ids = np.asarray(ids)
    dt = time.time() - t0
    print(f"OURS binary cosine item-item topk [17,770 x 17,770 -> 80]: "
          f"{dt:.1f}s cold -> vs reference {ref_generous/dt:.1f}x generous "
          f"/ {ref_realistic/dt:.1f}x realistic", flush=True)
    t0 = time.time()
    ids_w, _ = corr_ops.binary_correlation_topk(
        view, ITEMS, USERS, k=80, kind="cosine", chunk=4096)
    np.asarray(ids_w)
    dt = time.time() - t0
    print(f"  warm (jits cached): {dt:.1f}s -> {ref_generous/dt:.1f}x "
          f"generous / {ref_realistic/dt:.1f}x realistic", flush=True)
    assert ids.shape == (ITEMS, 80)

    # ---------------- (b) online/prequential eval --------------------
    from mymedialite_tpu.eval.online import (
        evaluate_items_online, evaluate_ratings_online,
    )
    from mymedialite_tpu.models.registry import (
        create_item_recommender, create_rating_predictor,
    )

    rd = synthetic_ratings(num_users=6040, num_items=3706,
                           num_ratings=1_000_000, seed=100)
    tr, te = split_ratings(rd, 0.02, seed=7)
    n_ev = min(len(te), 10_000)
    te = type(te)(te.users[:n_ev], te.items[:n_ev], te.values[:n_ev],
                  num_users=te.num_users, num_items=te.num_items,
                  scale=te.scale)
    for name in ("UserItemBaseline", "BiasedMatrixFactorization"):
        m = create_rating_predictor(name)
        if name == "BiasedMatrixFactorization":
            m.num_factors = 16
            m.num_iter = 5
        m.ratings = tr
        m.train()
        t0 = time.time()
        res = evaluate_ratings_online(m, te)
        dt = time.time() - t0
        print(f"OURS online rating eval [{name}]: {n_ev} events in "
              f"{dt:.1f}s -> {n_ev/dt:.0f} events/s (RMSE "
              f"{res['RMSE']:.4f})", flush=True)

    pos = synthetic_posonly(num_users=6040, num_items=3706,
                            num_events=500_000, seed=102)
    ptr, pte = split_posonly(pos, 0.02, seed=9)
    m = create_item_recommender("BPRMF")
    m.num_factors = 16
    m.num_iter = 5
    m.feedback = ptr
    m.train()
    users = np.unique(np.asarray(pte.users))[:500]
    t0 = time.time()
    res = evaluate_items_online(m, pte, ptr, test_users=users)
    dt = time.time() - t0
    print(f"OURS online item eval [BPRMF]: {len(users)} users in "
          f"{dt:.1f}s -> {len(users)/dt:.1f} users/s (AUC "
          f"{res['AUC']:.4f})", flush=True)


if __name__ == "__main__":
    main()
