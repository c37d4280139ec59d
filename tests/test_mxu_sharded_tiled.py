"""Mesh-sharded + slab-tiled MXU epochs (VERDICT r4 missing #1).

The r4 cliff: on any mesh, catalogs whose per-device item partition
exceeded the VMEM budget fell back to the XLA epoch — adding chips made
big-catalog training ~25x slower. The sharded+tiled epochs compose the
DSGD diagonal schedule (user blocks partition over devices, item
partitions rotate via ppermute — reference ``MultiCore.cs:43-73``) with
the flat slab-tiled kernels (partition in device HBM, slab + user block
streamed through VMEM by in-kernel blocking DMA).

- TestShardedTiledSgdOracle: the mesh epoch is BIT-IDENTICAL to
  processing its (device x sub-epoch) cells sequentially through the
  same per-cell tiled pallas call (conflict-free diagonal schedule).
- TestShardedTiledSelection: ``select_mxu_mode`` degrades
  mesh -> sharded-tiled (not -> "") past the resident partition bound,
  with a loud warning only when nothing applies.
- TestShardedTiledModelLayer: MML_MXU=sharded-tiled-interpret engages
  the path through train() on the 8-device CPU mesh with quality
  parity vs the single-device path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mymedialite_tpu.data.arrays import RatingData
from mymedialite_tpu.ops import pallas_sgd as ps
from mymedialite_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh")


def _events(U=100, I=90, n=1800, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, U, n).astype(np.int32),
            rng.integers(0, I, n).astype(np.int32),
            rng.uniform(1, 5, n).astype(np.float32))


class TestShardedTiledSgdOracle:
    def test_bit_identical_to_sequential_cells(self):
        U, I, f, fe = 100, 90, 6, 16
        users, items, values = _events(U, I)
        D = len(jax.devices())
        plan = ps.prepare_mxu_sharded_tiled(
            users, items, values, U, I, D, user_block=8, item_block=8,
            chunk=8, slab_blocks=2, shuffle_seed=0)
        assert plan.slabs_per_part >= 1
        rng = np.random.default_rng(1)
        W0 = np.zeros((plan.u_pad, fe), np.float32)
        W0[:U, :f] = 0.1 * rng.standard_normal((U, f))
        W0[:U, f + 1] = 1.0
        H0 = np.zeros((plan.i_pad, fe), np.float32)
        H0[plan.new_of_old, :f] = 0.1 * rng.standard_normal((I, f))
        H0[plan.new_of_old, f] = 1.0
        rates = ps.mxu_column_rates(f, fe, 0.01, 0.015, 0.015, 1.0,
                                    0.01, True, True, True)
        hp = np.zeros((1, 8), np.float32)
        hp[0, :3] = [3.0, 1.0, 4.0]
        hp = jnp.asarray(hp)
        order = plan.epoch_order(seed=3)
        meta = plan.meta(fe)

        mesh = make_mesh()
        sh2 = NamedSharding(mesh, P("data", None))
        W1, H1 = ps.sgd_epoch_mxu_sharded_tiled(
            mesh, jax.device_put(jnp.asarray(W0), sh2),
            jax.device_put(jnp.asarray(H0), sh2),
            plan.packed, order, hp, rates, meta=meta,
            slabs_per_part=plan.slabs_per_part, loss=0, biased=True,
            mxu_dtype="f32", interpret=True)
        W1, H1 = np.asarray(W1), np.asarray(H1)

        # sequential oracle: same per-cell tiled call, cells in (k, d)
        # order, on transposed shard views
        call = ps._sgd_tiled_pallas_call(
            meta=meta, num_slabs=plan.slabs_per_part, loss=0,
            biased=True, dt=jnp.float32, interpret=True)
        Wf = W0.copy()
        Hf = H0.copy()
        upd, pr = plan.u_pad_dev, plan.part_rows
        ub_a, ibr_a, isl_a, row_a, src_a = (np.asarray(a) for a in order)
        for k in range(D):
            for d in range(D):
                p = (d + k) % D
                Wt, Ht = call(
                    jnp.asarray(ub_a[d, k]), jnp.asarray(ibr_a[d, k]),
                    jnp.asarray(isl_a[d, k]), jnp.asarray(row_a[d, k]),
                    jnp.asarray(src_a[d, k]),
                    jnp.asarray(Wf[d * upd:(d + 1) * upd].T.copy()),
                    jnp.asarray(Hf[p * pr:(p + 1) * pr].T.copy()),
                    plan.packed, rates, hp)
                Wf[d * upd:(d + 1) * upd] = np.asarray(Wt).T
                Hf[p * pr:(p + 1) * pr] = np.asarray(Ht).T
        assert np.array_equal(W1, Wf), "W diverges from sequential cells"
        assert np.array_equal(H1, Hf), "H diverges from sequential cells"
        assert np.abs(W1 - W0).sum() > 0, "epoch was a no-op"

    def test_every_event_covered_once(self):
        U, I = 60, 70
        users, items, values = _events(U, I, n=900, seed=5)
        D = len(jax.devices())
        plan = ps.prepare_mxu_sharded_tiled(
            users, items, values, U, I, D, user_block=8, item_block=8,
            chunk=8, slab_blocks=2, shuffle_seed=1)
        order = plan.epoch_order(seed=9)
        row = np.asarray(order[3])
        zero_row = plan.packed.shape[0] - 1
        real = row[row != zero_row]
        assert sorted(real.tolist()) == list(range(zero_row)), \
            "each chunk must be visited exactly once across all cells"


class TestShardedTiledBprOracle:
    def test_bit_identical_to_sequential_cells(self):
        from mymedialite_tpu.data.arrays import PosOnlyData
        from mymedialite_tpu.ops import pallas_bpr as pb

        U, I, f, fe = 100, 90, 6, 16
        rng = np.random.default_rng(2)
        fb = PosOnlyData(rng.integers(0, U, 1500).astype(np.int32),
                         rng.integers(0, I, 1500).astype(np.int32),
                         num_users=U, num_items=I)
        D = len(jax.devices())
        plan, neg_state, neg_meta = pb.prepare_bpr_mxu_sharded_tiled(
            fb, D, uniform_user=True, user_block=8, item_block=8,
            chunk=8, slab_blocks=2, shuffle_seed=0, chunk_overhead=0)
        n_ib, Kcap, trials, num_items, IB = neg_meta
        Ksub = neg_state["ksub"]
        rng2 = np.random.default_rng(3)
        We, He = pb.bpr_tables_to_mxu(
            jnp.asarray(0.1 * rng2.standard_normal((U, f)), jnp.float32),
            jnp.asarray(0.1 * rng2.standard_normal((I, f)), jnp.float32),
            jnp.zeros(I), jnp.asarray(plan.new_of_old),
            u_pad=plan.u_pad, i_pad=plan.i_pad, fe=fe)
        rates = pb.bpr_mxu_column_rates(f, fe, 0.05, 0.0025, 0.0025,
                                        0.00025, 0.0, True)
        order = plan.epoch_order(neg_state["nvalid"], seed=5)
        bits = pb.epoch_random_bits(
            jax.random.PRNGKey(7), nc=D * D * plan.nc_pad,
            trials=trials, C=plan.chunk).reshape(
            D, D, plan.nc_pad, trials, plan.chunk)
        meta = plan.meta(fe) + (Ksub, trials)

        mesh = make_mesh()
        sh2 = NamedSharding(mesh, P("data", None))
        W1, H1, negs = pb.bpr_epoch_mxu_sharded_tiled(
            mesh, jax.device_put(We, sh2), jax.device_put(He, sh2),
            plan.packed, neg_state["subkeys_tbl"], neg_state["cdf_tbl"],
            bits, order, rates, meta=meta,
            slabs_per_part=plan.slabs_per_part, mxu_dtype="f32",
            interpret=True)
        W1, H1, negs = np.asarray(W1), np.asarray(H1), np.asarray(negs)

        call = pb._bpr_tiled_pallas_call(
            meta=meta, num_slabs=plan.slabs_per_part, soft_margin=False,
            wbpr=False, subkeys=True, dt=jnp.float32, interpret=True)
        Wf = np.asarray(We).copy()
        Hf = np.asarray(He).copy()
        upd, pr = plan.u_pad_dev, plan.part_rows
        oa = [np.asarray(a) for a in order]
        for k in range(D):
            for d in range(D):
                p = (d + k) % D
                args = [jnp.asarray(a[d, k]) for a in oa]
                Wt, Ht, neg = call(
                    *args,
                    jnp.asarray(Wf[d * upd:(d + 1) * upd].T.copy()),
                    jnp.asarray(Hf[p * pr:(p + 1) * pr].T.copy()),
                    plan.packed, neg_state["subkeys_tbl"],
                    neg_state["cdf_tbl"], jnp.asarray(bits[d, k]),
                    rates)
                Wf[d * upd:(d + 1) * upd] = np.asarray(Wt).T
                Hf[p * pr:(p + 1) * pr] = np.asarray(Ht).T
                assert np.array_equal(negs[d, k], np.asarray(neg)), \
                    f"negatives diverge at cell d={d} k={k}"
        assert np.array_equal(W1, Wf), "W diverges from sequential cells"
        assert np.array_equal(H1, Hf), "H diverges from sequential cells"
        assert np.abs(W1 - np.asarray(We)).sum() > 0

    def test_partition_negative_marginal(self):
        """P(negative block | partition) = nvalid_b / items_p through
        the slab-then-block draw (prefix alignment within partition AND
        within slab)."""
        from mymedialite_tpu.data.arrays import PosOnlyData
        from mymedialite_tpu.ops import pallas_bpr as pb

        U, I = 64, 100
        rng = np.random.default_rng(4)
        fb = PosOnlyData(rng.integers(0, U, 4000).astype(np.int32),
                         rng.integers(0, I, 4000).astype(np.int32),
                         num_users=U, num_items=I)
        D = len(jax.devices())
        plan, neg_state, _ = pb.prepare_bpr_mxu_sharded_tiled(
            fb, D, uniform_user=False, user_block=8, item_block=8,
            chunk=8, slab_blocks=2, shuffle_seed=0, chunk_overhead=0)
        nvalid = neg_state["nvalid"]
        PB, n_ib = plan.part_blocks, plan.n_iblocks
        zero_row = plan.packed.shape[0] - 1
        counts = {}
        for s in range(300):
            order = plan.epoch_order(nvalid, seed=s)
            jb = np.asarray(order[3])
            row = np.asarray(order[8])
            for g in jb[row < zero_row]:
                counts[int(g)] = counts.get(int(g), 0) + 1
        for p in range(D):
            lo, hi = p * PB, min((p + 1) * PB, n_ib)
            if hi <= lo:
                continue
            tot = sum(counts.get(b, 0) for b in range(lo, hi))
            if tot < 500:
                continue
            exp = nvalid[lo:hi] / max(nvalid[lo:hi].sum(), 1)
            got = np.array([counts.get(b, 0) for b in range(lo, hi)],
                           np.float64) / tot
            assert np.abs(got - exp).max() < 0.1, \
                f"partition {p}: {got} vs {exp}"


class TestShardedTiledSelection:
    def test_mesh_big_catalog_selects_sharded_tiled(self, monkeypatch):
        """The exact r4 cliff shape: KDD catalog (624,961 items, k=40)
        on an 8-device mesh — 19.25MB/device resident partition fails
        the VMEM bound, but the slab-tiled partition streams fine."""
        from mymedialite_tpu.ops.kernel_select import select_mxu_mode

        D = len(jax.devices())
        assert not ps.mxu_sharded_supported(624_961, 40, D)
        assert ps.mxu_sharded_tiled_supported(624_961, 40, D)
        monkeypatch.setenv("MML_MXU", "sharded-interpret")
        assert select_mxu_mode(624_961, 40) == "sharded-tiled-interpret"

    def test_unsupported_mesh_shape_warns(self, monkeypatch, caplog):
        """When nothing applies on a mesh, the XLA fallback is LOUD
        (VERDICT r4 weak #2/#8)."""
        import logging

        from mymedialite_tpu.ops.kernel_select import select_mxu_mode

        monkeypatch.setenv("MML_MXU", "auto")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        # absurd factor count: fe so large one slab exceeds VMEM
        with caplog.at_level(logging.WARNING, logger="mymedialite_tpu"):
            mode = select_mxu_mode(700_000, 40_000)
        assert mode == ""
        assert any("falling back to the XLA epoch" in r.message
                   for r in caplog.records)


class TestShardedTiledModelLayer:
    def test_biasedmf_sharded_tiled_engages_and_matches(self, monkeypatch):
        """train() with MML_MXU=sharded-tiled-interpret engages the
        sharded+tiled plan and reaches the single-device MXU path's
        RMSE within noise."""
        from mymedialite_tpu.eval.rating import evaluate_ratings
        from mymedialite_tpu.models.mf import BiasedMatrixFactorization

        rng = np.random.default_rng(7)
        U, I, n = 200, 120, 4000
        users = rng.integers(0, U, n).astype(np.int32)
        items = rng.integers(0, I, n).astype(np.int32)
        wu = rng.standard_normal((U, 4))
        hi = rng.standard_normal((I, 4))
        vals = np.clip(3 + (wu[users] * hi[items]).sum(1) * 0.5
                       + 0.3 * rng.standard_normal(n), 1, 5).astype(
            np.float32)
        tr = RatingData(users[:3200], items[:3200], vals[:3200],
                        num_users=U, num_items=I)
        te = RatingData(users[3200:], items[3200:], vals[3200:],
                        num_users=U, num_items=I)

        def run(mode):
            monkeypatch.setenv("MML_MXU", mode)
            m = BiasedMatrixFactorization()
            m.num_factors = 8
            m.num_iter = 8
            m.ratings = tr
            m.train()
            return m, evaluate_ratings(m, te)["RMSE"]

        m_st, rmse_st = run("sharded-tiled-interpret")
        assert isinstance(m_st._mxu_plan, ps.MxuShardedTiledPlan), \
            "sharded-tiled plan not engaged through train()"
        m_one, rmse_one = run("interpret")
        assert not isinstance(m_one._mxu_plan, ps.MxuShardedTiledPlan)
        assert np.isfinite(rmse_st)
        assert abs(rmse_st - rmse_one) < 0.06, (rmse_st, rmse_one)

    def test_bprmf_sharded_tiled_engages_and_ranks(self, monkeypatch):
        """train() with MML_MXU=sharded-tiled-interpret engages the
        sharded+tiled BPR plan; AUC on held-out events matches the
        single-device MXU path within noise despite partition-local,
        slab-grouped negatives."""
        from mymedialite_tpu.data.arrays import PosOnlyData
        from mymedialite_tpu.eval.ranking import evaluate_items
        from mymedialite_tpu.models.bpr import BPRMF
        from mymedialite_tpu.ops import pallas_bpr as pb

        rng = np.random.default_rng(11)
        U, I = 160, 96
        tr_u, tr_i, te_u, te_i = [], [], [], []
        for u in range(U):
            base = (u * 7) % I
            liked = (base + np.unique(rng.integers(0, 20, 24))) % I
            liked = np.unique(liked)
            rng.shuffle(liked)
            cut = max(int(liked.size * 0.8), 1)
            tr_u.extend([u] * cut)
            tr_i.extend(liked[:cut])
            te_u.extend([u] * (liked.size - cut))
            te_i.extend(liked[cut:])
        tr = PosOnlyData(np.asarray(tr_u, np.int32),
                         np.asarray(tr_i, np.int32),
                         num_users=U, num_items=I)
        te = PosOnlyData(np.asarray(te_u, np.int32),
                         np.asarray(te_i, np.int32),
                         num_users=U, num_items=I)

        def run(mode):
            monkeypatch.setenv("MML_MXU", mode)
            m = BPRMF()
            m.num_factors = 8
            m.num_iter = 15
            m.feedback = tr
            m.train()
            return m, evaluate_items(m, te, tr)["AUC"]

        m_st, auc_st = run("sharded-tiled-interpret")
        assert isinstance(m_st._bpr_plan, pb.BprShardedTiledPlan), \
            "sharded-tiled BPR plan not engaged through train()"
        m_one, auc_one = run("interpret")
        assert not isinstance(m_one._bpr_plan, pb.BprShardedTiledPlan)
        assert auc_st > 0.6, f"sharded-tiled BPR did not learn ({auc_st})"
        assert abs(auc_st - auc_one) < 0.05, (auc_st, auc_one)

    def test_wbpr_sharded_tiled_runs(self, monkeypatch):
        """WBPR rides the sharded+tiled kernel (popularity negatives by
        mass within the resident partition's slabs)."""
        from mymedialite_tpu.data.arrays import PosOnlyData
        from mymedialite_tpu.models.bpr import WeightedBPRMF
        from mymedialite_tpu.ops import pallas_bpr as pb

        rng = np.random.default_rng(13)
        monkeypatch.setenv("MML_MXU", "sharded-tiled-interpret")
        m = WeightedBPRMF()
        m.num_factors = 6
        m.num_iter = 2
        m.feedback = PosOnlyData(
            rng.integers(0, 80, 1200).astype(np.int32),
            rng.integers(0, 60, 1200).astype(np.int32),
            num_users=80, num_items=60)
        m.train()
        assert isinstance(m._bpr_plan, pb.BprShardedTiledPlan)
        s = m.predict_batch(np.arange(8, dtype=np.int32),
                            np.arange(8, dtype=np.int32))
        assert np.isfinite(s).all()
