"""Experiment: MXU one-hot-matmul SGD epoch (ops/pallas_sgd.py) vs the
XLA blocked epoch (ops/sgd.py, 42.6M upd/s at the bench shape).

Usage:
  python exp_mxu.py --check      # CPU interpret-mode correctness vs numpy
  python exp_mxu.py              # TPU perf at the bench shape
"""

import sys
import time

import numpy as np


def oracle_epoch(W, H, plan, order, hp, rates, loss, biased):
    """Chunk-sequential minibatch SGD in numpy (f32, exact)."""
    from mymedialite_tpu.ops import sgd
    W = W.copy()
    H = H.copy()
    ub, ib, row = [np.asarray(x) for x in order]
    packed = np.asarray(plan.packed)
    u_loc = packed[:, 0]
    i_loc = packed[:, 1]
    v_all = packed[:, 2].view(np.float32)
    w_all = packed[:, 3].view(np.float32)
    w_lr, w_reg, h_lr, h_reg = np.asarray(rates).T
    gb, minr, rrange = hp[0], hp[1], hp[2]
    for c in range(plan.num_chunks):
        r = row[c]
        ug = ub[c] * plan.user_block + u_loc[r]
        ig = ib[c] * plan.item_block + i_loc[r]
        v, wt = v_all[r], w_all[r]
        wu, hi = W[ug], H[ig]
        score = np.sum(wu * hi, axis=1)
        if biased:
            sig = 1.0 / (1.0 + np.exp(-(score + gb)))
            pred = minr + sig * rrange
            err = v - pred
            if loss == sgd.LOSS_RMSE:
                g = err * sig * (1 - sig) * rrange
            elif loss == sgd.LOSS_MAE:
                g = np.sign(err) * sig * (1 - sig) * rrange
            else:
                g = err
            g = g * wt
        else:
            g = (v - (score + gb)) * wt
        dw = w_lr * (g[:, None] * hi - wt[:, None] * w_reg * wu)
        dh = h_lr * (g[:, None] * wu - wt[:, None] * h_reg * hi)
        np.add.at(W, ug, dw)
        np.add.at(H, ig, dh)
    return W, H


def check():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mymedialite_tpu.ops import pallas_sgd as ps
    from mymedialite_tpu.ops import sgd

    rng = np.random.default_rng(0)
    U, I, n, f = 50, 30, 500, 6
    users = rng.integers(0, U, n).astype(np.int32)
    items = rng.integers(0, I, n).astype(np.int32)
    values = rng.uniform(1, 5, n).astype(np.float32)
    plan = ps.prepare_mxu_data(users, items, values, U, I,
                               user_block=16, item_block=16, chunk=8,
                               shuffle_seed=1)
    W0 = 0.1 * rng.standard_normal((U, f)).astype(np.float32)
    H0 = 0.1 * rng.standard_normal((I, f)).astype(np.float32)
    bu = 0.01 * rng.standard_normal(U).astype(np.float32)
    bi = 0.01 * rng.standard_normal(I).astype(np.float32)
    for biased, loss in [(True, sgd.LOSS_RMSE), (True, sgd.LOSS_MAE),
                         (True, sgd.LOSS_LOGISTIC), (False, sgd.LOSS_RMSE)]:
        We, He = ps.extend_tables_mxu(plan, W0, H0, bu, bi, fe_pad=8)
        fe = We.shape[1]
        rates = ps.mxu_column_rates(f, fe, 0.01, 0.1, 0.08, 0.7, 0.33,
                                    biased, True, True)
        hp = np.zeros((1, 8), np.float32)
        hp[0, :3] = [3.0, 1.0, 4.0]
        order = plan.epoch_order(7)
        Wref, Href = oracle_epoch(np.asarray(We), np.asarray(He), plan,
                                  order, hp[0], rates, loss, biased)
        Wk, Hk = ps.sgd_epoch_mxu(
            We, He, plan.packed, order,
            jax.numpy.asarray(hp), rates, meta=plan.meta(fe), loss=loss,
            biased=biased, mxu_dtype="f32", interpret=True)
        ew = np.abs(np.asarray(Wk) - Wref).max()
        eh = np.abs(np.asarray(Hk) - Href).max()
        print(f"biased={biased} loss={loss}: maxerr W {ew:.2e} H {eh:.2e}")
        assert ew < 1e-5 and eh < 1e-5, "MISMATCH"
    # round-trip of the table packing
    We, He = ps.extend_tables_mxu(plan, W0, H0, bu, bi, fe_pad=8)
    W1, H1, bu1, bi1 = ps.split_tables_mxu(plan, We, He, f)
    assert np.allclose(W1, W0) and np.allclose(H1, H0)
    assert np.allclose(bu1, bu) and np.allclose(bi1, bi)
    print("check OK")


def perf():
    import jax
    import jax.numpy as jnp
    from mymedialite_tpu.ops import pallas_sgd as ps
    from mymedialite_tpu.ops import sgd

    U, I, n, f = 480_000, 17_770, 20_000_000, 40
    rng = np.random.default_rng(0)
    users = rng.integers(0, U, n).astype(np.int32)
    items = rng.integers(0, I, n).astype(np.int32)
    values = rng.uniform(1.0, 5.0, n).astype(np.float32)
    W0 = 0.1 * rng.standard_normal((U, f)).astype(np.float32)
    H0 = 0.1 * rng.standard_normal((I, f)).astype(np.float32)

    hp = np.zeros((1, 8), np.float32)
    hp[0, :3] = [3.0, 1.0, 4.0]
    REPS = 3

    import os
    UBv = int(os.environ.get("UBV", 512))
    IBv = int(os.environ.get("IBV", 1024))
    for C, IB, dt in [(384, IBv, "bf16"), (512, IBv, "bf16"),
                      (640, IBv, "bf16")]:
        t0 = time.time()
        plan = ps.prepare_mxu_data(users, items, values, U, I,
                                   user_block=UBv, item_block=IB, chunk=C,
                                   shuffle_seed=0)
        prep_s = time.time() - t0
        pad = plan.num_chunks * plan.chunk / max(plan.n_ratings, 1) - 1
        We, He = ps.extend_tables_mxu(plan, W0, H0, fe_pad=64)
        fe = We.shape[1]
        rates = ps.mxu_column_rates(f, fe, 0.005, 0.015, 0.015, 1.0, 1.0,
                                    True, True, True)
        data = plan.packed
        order = plan.epoch_order(1)
        try:
            We, He = ps.sgd_epoch_mxu(We, He, data, order, jnp.asarray(hp),
                                      rates, meta=plan.meta(fe),
                                      loss=sgd.LOSS_RMSE, biased=True,
                                      mxu_dtype=dt)
            _ = float(jnp.sum(He[0]))  # sync
            t0 = time.time()
            for r in range(REPS):
                We, He = ps.sgd_epoch_mxu(We, He, data, order,
                                          jnp.asarray(hp), rates,
                                          meta=plan.meta(fe),
                                          loss=sgd.LOSS_RMSE, biased=True,
                                          mxu_dtype=dt)
            _ = float(jnp.sum(He[0]))
            dt_s = (time.time() - t0) / REPS
            print(f"UB={UBv} C={C} IB={IB} {dt}: {n/dt_s/1e6:8.1f} M upd/s "
                  f"({dt_s*1000:.0f} ms/epoch, chunks={plan.num_chunks}, "
                  f"pad={pad*100:.1f}%, prep={prep_s:.1f}s)", flush=True)
        except Exception as e:
            print(f"C={C} IB={IB} {dt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def perf_tiled():
    """Big-catalog (KDD-Cup-scale) shapes: the slab-tiled MXU epoch vs
    the XLA blocked fallback. Catalog = the full KDD-Cup Track-1 item
    space (624,961 items, /root/reference/src/MyMediaLite/IO/KDDCup2011),
    users/ratings scaled by SCALE (default 1/8 of Track 1's ~1M users /
    ~253M ratings) so bucket occupancy matches the real dataset."""
    import os

    import jax
    import jax.numpy as jnp
    from mymedialite_tpu.ops import pallas_sgd as ps
    from mymedialite_tpu.ops import sgd

    scale = int(os.environ.get("SCALE", 8))
    U, I, n, f = 1_000_990 // scale, 624_961, 252_800_275 // scale, 40
    rng = np.random.default_rng(0)
    users = rng.integers(0, U, n).astype(np.int32)
    # zipf-flavored item popularity like the real catalog
    items = (np.minimum(rng.zipf(1.2, n), I) - 1).astype(np.int32)
    values = rng.uniform(0.0, 100.0, n).astype(np.float32)
    W0 = 0.1 * rng.standard_normal((U, f)).astype(np.float32)
    H0 = 0.1 * rng.standard_normal((I, f)).astype(np.float32)
    print(f"shape: {U} users x {I} items x {n} ratings (SCALE=1/{scale})",
          flush=True)

    assert not ps.mxu_supported(I, f) and ps.mxu_tiled_supported(I, f)
    t0 = time.time()
    # chunk=None -> histogram-optimal (the production selection)
    plan = ps.prepare_mxu_tiled(users, items, values, U, I,
                                user_block=512, item_block=1024,
                                chunk=None, shuffle_seed=0,
                                slab_blocks=ps.default_slab_blocks(f))
    prep_s = time.time() - t0
    pad = plan.packed.shape[0] * plan.chunk / n - 1
    print(f"tiled plan: chunk={plan.chunk} slabs={plan.num_slabs} "
          f"passes={plan.num_passes}x{plan.pass_len} "
          f"pad={pad*100:.1f}% prep={prep_s:.1f}s "
          f"packed={plan.packed.nbytes/1e9:.2f}GB", flush=True)

    We, He = ps.extend_tables_mxu(plan, W0, H0, fe_pad=64)
    fe = We.shape[1]
    rates = ps.mxu_column_rates(f, fe, 0.005, 0.015, 0.015, 1.0, 1.0,
                                True, True, True)
    hp = np.zeros((1, 8), np.float32)
    hp[0, :3] = [50.0, 0.0, 100.0]
    data = plan.packed

    REPS = int(os.environ.get("REPS", 3))
    order = plan.epoch_order(1)
    t0 = time.time()
    We, He = ps.sgd_epoch_mxu_tiled(We, He, data, order, jnp.asarray(hp),
                                    rates, meta=plan.meta(fe),
                                    num_slabs=plan.num_slabs,
                                    loss=sgd.LOSS_RMSE, biased=True)
    _ = float(jnp.sum(He[0]))  # sync (tunnel-safe)
    print(f"warmup+compile+transfer: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for r in range(REPS):
        We, He = ps.sgd_epoch_mxu_tiled(We, He, data, order, jnp.asarray(hp),
                                        rates, meta=plan.meta(fe),
                                        num_slabs=plan.num_slabs,
                                        loss=sgd.LOSS_RMSE, biased=True)
    _ = float(jnp.sum(He[0]))
    dt_s = (time.time() - t0) / REPS
    print(f"tiled MXU epoch: {n/dt_s/1e6:8.1f} M upd/s "
          f"({dt_s*1000:.0f} ms/epoch)", flush=True)
    del We, He, data, plan

    if os.environ.get("SKIP_XLA"):
        return
    # the XLA blocked fallback at the same shape
    t0 = time.time()
    blocked, meta = sgd.prepare_blocked_data(users, items, values, U,
                                             131_072, 512, shuffle_seed=0)
    print(f"blocked prep: {time.time() - t0:.1f}s", flush=True)
    W_ext, H_ext = sgd.extend_tables(W0, H0, group_users=512)
    hp2 = dict(global_bias=jnp.float32(50.0), min_rating=jnp.float32(0.0),
               rating_range=jnp.float32(100.0))
    rates2 = sgd.column_rates(f, 0.005, 0.015, 0.015, 1.0, 1.0,
                              True, True, True)
    freq = (jnp.zeros(0), jnp.zeros(0))
    key = jax.random.PRNGKey(0)

    def epoch(W, H, sub):
        return sgd.sgd_epoch_blocked(
            W, H, blocked, sub, hp2, rates2, freq,
            meta=tuple(sorted(meta.items())), loss=sgd.LOSS_RMSE,
            biased=True, frequency_regularization=False)

    key, sub = jax.random.split(key)
    t0 = time.time()
    W_ext, H_ext = epoch(W_ext, H_ext, sub)
    _ = float(jnp.sum(W_ext[:8]))
    print(f"blocked warmup+compile: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(REPS):
        key, sub = jax.random.split(key)
        W_ext, H_ext = epoch(W_ext, H_ext, sub)
    _ = float(jnp.sum(W_ext[:8]))
    dt_s = (time.time() - t0) / REPS
    print(f"XLA blocked epoch: {n/dt_s/1e6:8.1f} M upd/s "
          f"({dt_s*1000:.0f} ms/epoch)", flush=True)


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    elif "--tiled" in sys.argv:
        perf_tiled()
    else:
        perf()
