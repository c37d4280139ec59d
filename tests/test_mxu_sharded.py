"""Mesh-sharded MXU epochs: ops-level oracle + model-layer engagement.

VERDICT r3 #1: the sharded Pallas MXU epochs must be the PRODUCTION
path on a mesh, selected by the model layer through ``train()`` (the
reference engages its multicore DSGD by default,
``BiasedMatrixFactorization.cs:206-215``, ``MultiCoreBPRMF.cs:30``),
with quality equivalence vs the single-device path.

- TestShardedBprOracle: the sharded BPR epoch is BIT-IDENTICAL to
  processing its (device x sub-epoch) diagonal cells sequentially
  through the same per-cell kernel call (the conflict-free DSGD
  schedule claim, mirroring the sharded-SGD oracle in
  tests/test_pallas_sgd_tiled.py).
- TestShardedModelLayer: MML_MXU=sharded-interpret engages the sharded
  plans through BiasedMF.train() / BPRMF.train() on the 8-device CPU
  mesh, and the resulting quality matches the single-device MXU path
  within run-to-run noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mymedialite_tpu.data.arrays import PosOnlyData, RatingData
from mymedialite_tpu.ops import pallas_bpr as pb
from mymedialite_tpu.ops import pallas_sgd as ps
from mymedialite_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh")


def _feedback(U=100, I=80, n=1500, seed=0):
    rng = np.random.default_rng(seed)
    return PosOnlyData(rng.integers(0, U, n).astype(np.int32),
                       rng.integers(0, I, n).astype(np.int32),
                       num_users=U, num_items=I)


class TestShardedBprOracle:
    def test_bit_identical_to_sequential_cells(self):
        """Sub-epoch k touches disjoint (W rows, H partitions) per
        device, so the parallel epoch equals sequential cell order
        (k asc, d asc) bit-for-bit — same kernel, same bits."""
        U, I = 100, 80
        fb = _feedback(U, I)
        D = len(jax.devices())
        plan, neg_state, neg_meta = pb.prepare_bpr_mxu_sharded(
            fb, D, uniform_user=True, user_block=8, item_block=8,
            chunk=8, shuffle_seed=0)
        n_ib, Kcap, trials, num_items, IB = neg_meta
        f, fe = 6, 16
        rng = np.random.default_rng(1)
        We, He = pb.bpr_tables_to_mxu(
            jnp.asarray(0.1 * rng.standard_normal((U, f)), jnp.float32),
            jnp.asarray(0.1 * rng.standard_normal((I, f)), jnp.float32),
            jnp.zeros(I), jnp.asarray(plan.new_of_old),
            u_pad=plan.u_pad, i_pad=plan.i_pad, fe=fe)
        rates = pb.bpr_mxu_column_rates(f, fe, 0.05, 0.0025, 0.0025,
                                        0.00025, 0.0, True)
        order = plan.epoch_order(neg_state["nvalid"], seed=3)
        bits = pb.epoch_random_bits(
            jax.random.PRNGKey(5), nc=D * D * plan.nc_pad,
            trials=trials, C=plan.chunk).reshape(
            D, D, plan.nc_pad, trials, plan.chunk)
        meta = plan.meta(fe) + (Kcap, trials)

        mesh = make_mesh()
        sh2 = NamedSharding(mesh, P("data", None))
        W1, H1, negs = pb.bpr_epoch_mxu_sharded(
            mesh, jax.device_put(We, sh2), jax.device_put(He, sh2),
            plan.packed, neg_state["keys_tbl"], neg_state["cdf_tbl"],
            bits, order, rates, meta=meta, mxu_dtype="f32",
            interpret=True)
        W1, H1, negs = (np.asarray(W1), np.asarray(H1), np.asarray(negs))

        # sequential oracle: same per-cell kernel call on the shard
        # views, cells in (k, d) order
        Wf = np.asarray(We).copy()
        Hf = np.asarray(He).copy()
        upd = plan.u_pad_dev
        pr = plan.part_rows
        ub_a, ib_a, jb_a, jbg_a, nval_a, bkt_a, row_a = \
            (np.asarray(a) for a in order)
        bm = jnp.zeros((1, plan.user_block, plan.item_block // 8),
                       jnp.int8)
        for k in range(D):
            for d in range(D):
                p = (d + k) % D
                Wd, Hp, neg = pb._bpr_epoch_call(
                    jnp.asarray(Wf[d * upd:(d + 1) * upd]),
                    jnp.asarray(Hf[p * pr:(p + 1) * pr]),
                    plan.packed, neg_state["keys_tbl"], bm,
                    neg_state["cdf_tbl"], jnp.asarray(bits[d, k]),
                    jnp.asarray(ub_a[d, k]), jnp.asarray(ib_a[d, k]),
                    jnp.asarray(jb_a[d, k]), jnp.asarray(jbg_a[d, k]),
                    jnp.asarray(nval_a[d, k]), jnp.asarray(bkt_a[d, k]),
                    jnp.asarray(row_a[d, k]), rates, meta=meta,
                    soft_margin=False, wbpr=False, use_bitmask=False,
                    dt=jnp.float32, interpret=True)
                Wf[d * upd:(d + 1) * upd] = np.asarray(Wd)
                Hf[p * pr:(p + 1) * pr] = np.asarray(Hp)
                assert np.array_equal(negs[d, k], np.asarray(neg)), \
                    f"negatives diverge at cell d={d} k={k}"
        assert np.array_equal(W1, Wf), "W diverges from sequential cells"
        assert np.array_equal(H1, Hf), "H diverges from sequential cells"

    def test_partition_negative_marginal(self):
        """The within-partition draw keeps P(block | partition) =
        nvalid_b / items_p (the mod-alignment argument holds per
        partition: +1-item blocks are a global prefix, hence a prefix
        of each contiguous partition)."""
        U, I = 64, 100
        fb = _feedback(U, I, n=4000, seed=2)
        D = len(jax.devices())
        plan, neg_state, _ = pb.prepare_bpr_mxu_sharded(
            fb, D, uniform_user=False, user_block=8, item_block=8,
            chunk=8, shuffle_seed=0)
        nvalid = neg_state["nvalid"]
        PB, n_ib = plan.part_blocks, plan.n_iblocks
        counts = {}
        trials = 400
        for s in range(trials):
            order = plan.epoch_order(nvalid, seed=s)
            jbg = np.asarray(order[3])
            row = np.asarray(order[6])
            real = row < plan.packed.shape[0] - 1
            for g in jbg[real]:
                counts[int(g)] = counts.get(int(g), 0) + 1
        # per partition, the block draw frequencies track nvalid
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


class TestShardedModelLayer:
    def test_biasedmf_sharded_engages_and_matches(self, monkeypatch):
        """train() on the mesh selects the sharded DSGD MXU epoch and
        reaches the single-device MXU epoch's RMSE within noise."""
        from mymedialite_tpu.eval.rating import evaluate_ratings
        from mymedialite_tpu.models.mf import BiasedMatrixFactorization

        rng = np.random.default_rng(7)
        U, I, n = 200, 120, 4000
        users = rng.integers(0, U, n).astype(np.int32)
        items = rng.integers(0, I, n).astype(np.int32)
        # planted structure so training moves RMSE measurably
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

        m_sh, rmse_sh = run("sharded-interpret")
        assert isinstance(m_sh._mxu_plan, ps.MxuShardedPlan), \
            "sharded plan not engaged through train()"
        m_one, rmse_one = run("interpret")
        assert not isinstance(m_one._mxu_plan, ps.MxuShardedPlan)
        assert np.isfinite(rmse_sh)
        # different schedules -> different trajectories; quality parity
        assert abs(rmse_sh - rmse_one) < 0.06, (rmse_sh, rmse_one)

    def test_bprmf_sharded_engages_and_ranks(self, monkeypatch):
        """train() on the mesh selects the sharded BPR epoch; ranking
        quality (AUC on held-out events) matches the single-device MXU
        epoch within noise despite partition-local negatives."""
        from mymedialite_tpu.eval.ranking import evaluate_items
        from mymedialite_tpu.models.bpr import BPRMF

        rng = np.random.default_rng(11)
        U, I = 160, 96
        # planted preference: user u likes items near (u mod I);
        # per-user unique items, disjoint train/test split
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

        m_sh, auc_sh = run("sharded-interpret")
        assert isinstance(m_sh._bpr_plan, pb.BprShardedPlan), \
            "sharded BPR plan not engaged through train()"
        m_one, auc_one = run("interpret")
        assert not isinstance(m_one._bpr_plan, pb.BprShardedPlan)
        assert auc_sh > 0.6, f"sharded BPR did not learn (AUC {auc_sh})"
        assert abs(auc_sh - auc_one) < 0.05, (auc_sh, auc_one)

    def test_wbpr_sharded_runs(self, monkeypatch):
        """WBPR rides the sharded kernel (popularity negatives drawn by
        mass within the resident partition)."""
        from mymedialite_tpu.models.bpr import WeightedBPRMF

        monkeypatch.setenv("MML_MXU", "sharded-interpret")
        m = WeightedBPRMF()
        m.num_factors = 6
        m.num_iter = 2
        m.feedback = _feedback(80, 60, 1200, seed=3)
        m.train()
        assert isinstance(m._bpr_plan, pb.BprShardedPlan)
        s = m.predict_batch(np.arange(8, dtype=np.int32),
                            np.arange(8, dtype=np.int32))
        assert np.isfinite(s).all()

    def test_multicore_bprmf_prefers_sharded_mxu(self, monkeypatch):
        """MultiCoreBPRMF (the reference's parallel BPR) rides the
        sharded MXU epoch when supported, not the XLA psum epoch."""
        from mymedialite_tpu.models.bpr import MultiCoreBPRMF

        monkeypatch.setenv("MML_MXU", "sharded-interpret")
        m = MultiCoreBPRMF()
        m.num_factors = 6
        m.num_iter = 2
        m.feedback = _feedback(80, 60, 1200, seed=5)
        m.train()
        assert isinstance(m._bpr_plan, pb.BprShardedPlan)
        s = m.predict_batch(np.arange(8, dtype=np.int32),
                            np.arange(8, dtype=np.int32))
        assert np.isfinite(s).all()
