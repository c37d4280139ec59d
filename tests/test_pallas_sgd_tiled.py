"""Validation of the slab-tiled MXU SGD epoch (ops/pallas_sgd.py
sgd_epoch_mxu_tiled) — the production path for catalogs beyond the
VMEM budget (KDD-Cup-scale; reference IO/KDDCup2011/* implies 624k-item
catalogs, doc/Performance the throughput bar).

- single-slab tiling must reproduce the resident kernel exactly;
- multi-slab tiling must match a chunk-sequential numpy oracle;
- the MF family must auto-select the tiled plan past the VMEM budget
  and still learn.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mymedialite_tpu.ops import pallas_sgd as ps
from mymedialite_tpu.ops import sgd


def _toy(seed=0, U=50, I=60, n=700):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, U, n).astype(np.int32)
    items = rng.integers(0, I, n).astype(np.int32)
    values = rng.uniform(1, 5, n).astype(np.float32)
    W0 = 0.1 * rng.standard_normal((U, 6)).astype(np.float32)
    H0 = 0.1 * rng.standard_normal((I, 6)).astype(np.float32)
    bu = 0.01 * rng.standard_normal(U).astype(np.float32)
    bi = 0.01 * rng.standard_normal(I).astype(np.float32)
    return users, items, values, W0, H0, bu, bi


def _hp():
    hp = np.zeros((1, 8), np.float32)
    hp[0, :3] = [3.0, 1.0, 4.0]
    return jnp.asarray(hp)


def oracle_tiled(We, He, plan, order, rates):
    """Flat slab-major chunk-sequential minibatch SGD in numpy (f32,
    exact) — biased RMSE case (mirrors exp_mxu.py's oracle, over the
    tiled visit order)."""
    We = np.asarray(We).copy()
    He = np.asarray(He).copy()
    ub, ibr, sl, row, _src = [np.asarray(x).reshape(-1)
                              for x in order]
    packed = np.asarray(plan.packed)
    UB, IB = plan.user_block, plan.item_block
    w_lr, w_reg, h_lr, h_reg = np.asarray(rates).T
    gb, minr, rrange = 3.0, 1.0, 4.0
    for c in range(row.size):
        d = packed[row[c]]
        u = d[0]
        i = d[1]
        v = d[2].view(np.float32)
        wt = d[3].view(np.float32)
        ug = ub[c] * UB + u
        ig = sl[c] * plan.slab_rows + ibr[c] * IB + i
        wu, hi = We[ug], He[ig]
        score = np.sum(wu * hi, axis=1)
        sig = 1.0 / (1.0 + np.exp(-(score + gb)))
        pred = minr + sig * rrange
        g = (v - pred) * sig * (1 - sig) * rrange * wt
        dw = w_lr * (g[:, None] * hi - wt[:, None] * w_reg * wu)
        dh = h_lr * (g[:, None] * wu - wt[:, None] * h_reg * hi)
        np.add.at(We, ug, dw)
        np.add.at(He, ig, dh)
    return We, He


class TestTiledKernel:
    def test_single_slab_equals_resident_kernel(self):
        """slab_blocks >= n_iblocks (S=1): the tiled epoch must reproduce
        the validated resident kernel (same plan geometry, same seed =>
        identical visit order)."""
        users, items, values, W0, H0, bu, bi = _toy()
        kw = dict(user_block=16, item_block=16, chunk=8, shuffle_seed=1)
        plan = ps.prepare_mxu_data(users, items, values, 50, 60, **kw)
        tplan = ps.prepare_mxu_tiled(users, items, values, 50, 60,
                                     slab_blocks=plan.n_iblocks, **kw)
        assert tplan.num_slabs == 1
        We, He = ps.extend_tables_mxu(plan, W0, H0, bu, bi, fe_pad=8)
        fe = We.shape[1]
        rates = ps.mxu_column_rates(6, fe, 0.01, 0.1, 0.08, 0.7, 0.33,
                                    True, True, True)
        Wr, Hr = ps.sgd_epoch_mxu(
            We, He, plan.packed, plan.epoch_order(7), _hp(), rates,
            meta=plan.meta(fe), loss=sgd.LOSS_RMSE, biased=True,
            mxu_dtype="f32", interpret=True)
        We2, He2 = ps.extend_tables_mxu(plan, W0, H0, bu, bi, fe_pad=8)
        Wt, Ht = ps.sgd_epoch_mxu_tiled(
            We2, He2, tplan.packed, tplan.epoch_order(7), _hp(), rates,
            meta=tplan.meta(fe), num_slabs=1, loss=sgd.LOSS_RMSE,
            biased=True, mxu_dtype="f32", interpret=True)
        np.testing.assert_allclose(np.asarray(Wt), np.asarray(Wr),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Ht)[:He2.shape[0]],
                                   np.asarray(Hr), rtol=0, atol=1e-6)

    @pytest.mark.parametrize("pass_len", [16, 4096])
    def test_multi_slab_matches_numpy_oracle(self, pass_len):
        """pass_len=16: pass-boundary writeback/refetch (XLA-carried);
        pass_len=4096 (single pass): WITHIN-pass refetch of W blocks
        written back earlier — exercises the refetch-source flags."""
        users, items, values, W0, H0, bu, bi = _toy(seed=3)
        tplan = ps.prepare_mxu_tiled(
            users, items, values, 50, 60, user_block=16, item_block=16,
            chunk=8, slab_blocks=1, shuffle_seed=2, pass_len=pass_len)
        assert tplan.num_slabs == tplan.n_iblocks > 1
        if pass_len == 16:
            assert tplan.num_passes > 2
        else:
            assert tplan.num_passes == 1
            src = np.asarray(tplan.epoch_order(9)[4])
            assert (src != 0).any(), "no within-pass refetch exercised"
        base = ps.prepare_mxu_data(users, items, values, 50, 60,
                                   user_block=16, item_block=16, chunk=8,
                                   shuffle_seed=2)
        We, He = ps.extend_tables_mxu(base, W0, H0, bu, bi, fe_pad=8)
        # pad the item table to whole slabs
        He = jnp.concatenate([He, jnp.zeros(
            (tplan.i_pad - He.shape[0], He.shape[1]), jnp.float32)]) \
            if tplan.i_pad > He.shape[0] else He
        fe = We.shape[1]
        rates = ps.mxu_column_rates(6, fe, 0.01, 0.1, 0.08, 0.7, 0.33,
                                    True, True, True)
        order = tplan.epoch_order(9)
        Wref, Href = oracle_tiled(We, He, tplan, order, rates)
        Wt, Ht = ps.sgd_epoch_mxu_tiled(
            We, He, tplan.packed, order, _hp(), rates,
            meta=tplan.meta(fe), num_slabs=tplan.num_slabs,
            loss=sgd.LOSS_RMSE, biased=True, mxu_dtype="f32",
            interpret=True)
        assert np.abs(np.asarray(Wt) - Wref).max() < 1e-5
        assert np.abs(np.asarray(Ht) - Href).max() < 1e-5

    def test_every_event_visited_once(self):
        """The tiled regrouping must cover every chunk exactly once."""
        users, items, values, *_ = _toy(seed=4)
        tplan = ps.prepare_mxu_tiled(
            users, items, values, 50, 60, user_block=16, item_block=16,
            chunk=8, slab_blocks=2, shuffle_seed=0)
        _, _, _, row, _ = tplan.epoch_order(5)
        row = np.asarray(row).reshape(-1)
        real = row[row < tplan.packed.shape[0] - 1]
        nc = tplan.packed.shape[0] - 1
        assert sorted(real.tolist()) == list(range(nc))
        # total real events preserved
        w = np.asarray(tplan.packed)[:, 3].view(np.float32)
        assert int(w.sum()) == len(users)


class TestTiledModelPath:
    def test_model_selects_tiled_past_vmem_budget(self, monkeypatch):
        from mymedialite_tpu.data.synthetic import (
            split_ratings, synthetic_ratings,
        )
        from mymedialite_tpu.eval.rating import evaluate_ratings
        from mymedialite_tpu.models.registry import create_rating_predictor
        monkeypatch.setenv("MML_MXU", "interpret")
        # shrink the VMEM budgets so a 3000-item catalog is "too big" for
        # the resident kernel but single-block slabs fit
        monkeypatch.setattr(ps, "VMEM_ITEM_TABLE_BYTES", 512 * 1024)
        monkeypatch.setattr(ps, "TILED_SLAB_BYTES", 256 * 1024)
        data = synthetic_ratings(num_ratings=4000, num_users=80,
                                 num_items=3000, seed=33)
        train, test = split_ratings(data, seed=34)
        m = create_rating_predictor("BiasedMatrixFactorization")
        m.num_factors = 4
        m.num_iter = 3
        m.random_seed = 6
        m.ratings = train
        m.train()
        assert isinstance(m._mxu_plan, ps.MxuTiledPlan)
        assert m._mxu_plan.num_slabs >= 2
        res = evaluate_ratings(m, test)
        ga = create_rating_predictor("GlobalAverage")
        ga.ratings = train
        ga.train()
        assert res["RMSE"] < evaluate_ratings(ga, test)["RMSE"] + 0.05


class TestShardedMXUEpoch:
    """DSGD over the mesh with the per-shard MXU kernel
    (sgd_epoch_mxu_sharded): within a sub-epoch every device touches
    disjoint W rows and a disjoint H partition (the Gemulla diagonal
    schedule, MultiCore.cs:43-73), so the parallel epoch must be
    BIT-equal (f32) to processing the diagonal cells sequentially."""

    def test_sharded_matches_sequential_oracle(self):
        from mymedialite_tpu.parallel.mesh import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        D = 4
        mesh = make_mesh(D)
        U, I, n, f = 64, 44, 600, 6
        rng = np.random.default_rng(8)
        users = rng.integers(0, U, n).astype(np.int32)
        items = rng.integers(0, I, n).astype(np.int32)
        values = rng.uniform(1, 5, n).astype(np.float32)
        plan = ps.prepare_mxu_sharded(users, items, values, U, I, D,
                                      user_block=8, item_block=8, chunk=8,
                                      shuffle_seed=4)
        fe = 8
        We = np.zeros((plan.u_pad, fe), np.float32)
        He = np.zeros((plan.i_pad, fe), np.float32)
        We[:U, :f] = 0.1 * rng.standard_normal((U, f))
        We[:U, f] = 0.01 * rng.standard_normal(U)
        We[:U, f + 1] = 1.0
        He[plan.new_of_old, :f] = 0.1 * rng.standard_normal((I, f))
        He[plan.new_of_old, f] = 1.0
        He[plan.new_of_old, f + 1] = 0.01 * rng.standard_normal(I)
        rates = ps.mxu_column_rates(f, fe, 0.01, 0.1, 0.08, 0.7, 0.33,
                                    True, True, True)
        order = plan.epoch_order(9)

        # sequential oracle over the diagonal cells, sub-epoch-major
        # (cells within a sub-epoch are row-disjoint, so any device
        # order gives the same f32 result)
        Wref, Href = We.copy(), He.copy()
        ub_a, ib_a, row_a = [np.asarray(x) for x in order]
        packed = np.asarray(plan.packed)
        UB, IB = plan.user_block, plan.item_block
        w_lr, w_reg, h_lr, h_reg = np.asarray(rates).T
        gb, minr, rrange = 3.0, 1.0, 4.0
        for k in range(D):
            for d in range(D):
                p = (d + k) % D
                for c in range(plan.nc_pad):
                    dd = packed[row_a[d, k, c]]
                    u, i = dd[0], dd[1]
                    v = dd[2].view(np.float32)
                    wt = dd[3].view(np.float32)
                    ug = d * plan.u_pad_dev + ub_a[d, k, c] * UB + u
                    ig = p * plan.part_rows + ib_a[d, k, c] * IB + i
                    wu, hi = Wref[ug], Href[ig]
                    score = np.sum(wu * hi, axis=1)
                    sig = 1.0 / (1.0 + np.exp(-(score + gb)))
                    pred = minr + sig * rrange
                    g = (v - pred) * sig * (1 - sig) * rrange * wt
                    dw = w_lr * (g[:, None] * hi
                                 - wt[:, None] * w_reg * wu)
                    dh = h_lr * (g[:, None] * wu
                                 - wt[:, None] * h_reg * hi)
                    np.add.at(Wref, ug, dw)
                    np.add.at(Href, ig, dh)

        hp = np.zeros((1, 8), np.float32)
        hp[0, :3] = [gb, minr, rrange]
        Wd = jax.device_put(We, NamedSharding(mesh, P("data", None)))
        Hd = jax.device_put(He, NamedSharding(mesh, P("data", None)))
        Wk, Hk = ps.sgd_epoch_mxu_sharded(
            mesh, Wd, Hd, plan.packed, order, jnp.asarray(hp), rates,
            meta=plan.meta(fe), loss=sgd.LOSS_RMSE, biased=True,
            mxu_dtype="f32", interpret=True)
        np.testing.assert_allclose(np.asarray(Wk), Wref, rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(Hk), Href, rtol=0, atol=1e-6)

    def test_every_event_covered_once(self):
        U, I, n = 64, 44, 600
        rng = np.random.default_rng(3)
        plan = ps.prepare_mxu_sharded(
            rng.integers(0, U, n).astype(np.int32),
            rng.integers(0, I, n).astype(np.int32),
            rng.uniform(1, 5, n).astype(np.float32), U, I, 4,
            user_block=8, item_block=8, chunk=8, shuffle_seed=1)
        all_rows = np.concatenate([r for per_k in plan.cells
                                   for r in per_k])
        nc = plan.packed.shape[0] - 1
        assert sorted(all_rows.tolist()) == list(range(nc))
        w = np.asarray(plan.packed)[:, 3].view(np.float32)
        assert int(w.sum()) == n
