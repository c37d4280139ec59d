"""On-real-TPU kernel smoke tier (VERDICT r3 weak #5).

Interpret mode is KNOWN to diverge from real TPU in one class of bugs:
it does not simulate ``input_output_aliases``, which is exactly what
the tiled kernels' refetch-source flags patch (CLAUDE.md round-3
learnings). This tier runs the four production Pallas kernels on the
real chip on a few hundred events and asserts against the
interpret-mode result (gathers are exact one-hot matmuls; scatter
accumulation order may differ -> tight allclose; sampled negatives are
integers -> bit-exact), so interpret-vs-TPU divergences get caught by
a command instead of by luck:

    MML_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -v

Skipped entirely unless MML_TPU_SMOKE=1 AND the TPU backend is live
(tests/conftest.py skips the CPU forcing under the flag).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("MML_TPU_SMOKE") != "1"
    or jax.default_backend() != "tpu",
    reason="on-TPU smoke tier: needs MML_TPU_SMOKE=1 and a live TPU")


def _events(U=60, I=50, n=400, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, U, n).astype(np.int32),
            rng.integers(0, I, n).astype(np.int32),
            rng.uniform(1, 5, n).astype(np.float32))


class TestTpuSmokeSgd:
    def test_resident_epoch_matches_interpret(self):
        from mymedialite_tpu.ops import pallas_sgd as ps

        U, I, f, fe = 60, 50, 6, 64
        users, items, values = _events(U, I)
        plan = ps.prepare_mxu_data(users, items, values, U, I,
                                   user_block=8, item_block=128,
                                   chunk=128, shuffle_seed=0)
        rng = np.random.default_rng(1)
        We, He = ps.extend_tables_mxu(
            plan, 0.1 * rng.standard_normal((U, f)).astype(np.float32),
            0.1 * rng.standard_normal((I, f)).astype(np.float32),
            fe_pad=fe)
        rates = ps.mxu_column_rates(f, fe, 0.01, 0.015, 0.015, 1.0,
                                    0.01, True, True, True)
        hp = np.zeros((1, 8), np.float32)
        hp[0, :3] = [3.0, 1.0, 4.0]
        order = plan.epoch_order(7)
        args = (plan.packed, order, jnp.asarray(hp), rates)
        kw = dict(meta=plan.meta(fe), loss=0, biased=True,
                  mxu_dtype="f32")
        Wt, Ht = ps.sgd_epoch_mxu(jnp.asarray(We).copy(),
                                  jnp.asarray(He).copy(), *args, **kw)
        Wi, Hi = ps.sgd_epoch_mxu(jnp.asarray(We).copy(),
                                  jnp.asarray(He).copy(), *args,
                                  interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(Wt), np.asarray(Wi),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Ht), np.asarray(Hi),
                                   atol=1e-5)
        assert np.abs(np.asarray(Wt) - np.asarray(We)).sum() > 0

    def test_tiled_epoch_matches_interpret(self):
        """Exercises the manual slab DMA + refetch-source flags — the
        exact aliasing class where interpret mode diverges."""
        from mymedialite_tpu.ops import pallas_sgd as ps

        # tiled kernels store tables TRANSPOSED: user_block/item_block
        # must be lane-tile (128) aligned (production: 512/1024)
        U, I, f, fe = 200, 512, 6, 64
        users, items, values = _events(U, I, n=600, seed=2)
        plan = ps.prepare_mxu_tiled(users, items, values, U, I,
                                    user_block=128, item_block=128,
                                    chunk=128, slab_blocks=1,
                                    shuffle_seed=0, pass_len=4096)
        assert plan.num_slabs > 1
        rng = np.random.default_rng(3)
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
        order = plan.epoch_order(9)
        kw = dict(meta=plan.meta(fe), num_slabs=plan.num_slabs,
                  loss=0, biased=True, mxu_dtype="f32")
        Wt, Ht = ps.sgd_epoch_mxu_tiled(
            jnp.asarray(W0).copy(), jnp.asarray(H0).copy(), plan.packed,
            order, jnp.asarray(hp), rates, **kw)
        Wi, Hi = ps.sgd_epoch_mxu_tiled(
            jnp.asarray(W0).copy(), jnp.asarray(H0).copy(), plan.packed,
            order, jnp.asarray(hp), rates, interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(Wt), np.asarray(Wi),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Ht), np.asarray(Hi),
                                   atol=1e-5)


class TestTpuSmokeDeviceOrder:
    """The round-5 device-built tiled schedules ship ZERO refetch-source
    flags, on the claim that input_output_aliases make the fetch-source
    selection a no-op on real TPU. These tests prove that claim on the
    actual chip: run the tiled kernels on a device-generated schedule
    twice — once with the zero flags as generated, once with the host
    refetch flags recomputed for that same schedule — and assert
    BIT-IDENTICAL tables."""

    def test_sgd_tiled_zero_flags_bitexact(self):
        from mymedialite_tpu.ops import pallas_sgd as ps

        U, I, f, fe = 200, 512, 6, 64
        users, items, values = _events(U, I, n=600, seed=2)
        plan = ps.prepare_mxu_tiled(users, items, values, U, I,
                                    user_block=128, item_block=128,
                                    chunk=128, slab_blocks=1,
                                    shuffle_seed=0, pass_len=4096)
        assert plan.num_slabs > 1
        order = ps.device_tiled_epoch_order(plan, 31)
        ub2, ibr2, isl2, row2, src0 = order
        assert int(jnp.sum(jnp.abs(src0))) == 0
        src_host = (ps.refetch_flags(np.asarray(ub2), 1)
                    | ps.refetch_flags(np.asarray(isl2), 2))
        assert src_host.sum() > 0, "schedule has no refetches to test"
        rng = np.random.default_rng(3)
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
        kw = dict(meta=plan.meta(fe), num_slabs=plan.num_slabs,
                  loss=0, biased=True, mxu_dtype="f32")
        W_z, H_z = ps.sgd_epoch_mxu_tiled(
            jnp.asarray(W0).copy(), jnp.asarray(H0).copy(), plan.packed,
            order, jnp.asarray(hp), rates, **kw)
        order_h = order[:4] + (jnp.asarray(src_host.astype(np.int32)),)
        W_h, H_h = ps.sgd_epoch_mxu_tiled(
            jnp.asarray(W0).copy(), jnp.asarray(H0).copy(), plan.packed,
            order_h, jnp.asarray(hp), rates, **kw)
        np.testing.assert_array_equal(np.asarray(W_z), np.asarray(W_h))
        np.testing.assert_array_equal(np.asarray(H_z), np.asarray(H_h))
        assert np.abs(np.asarray(W_z) - W0).sum() > 0

    def test_bpr_tiled_zero_flags_bitexact(self):
        from mymedialite_tpu.data.arrays import PosOnlyData
        from mymedialite_tpu.ops import pallas_bpr as pb
        from mymedialite_tpu.ops import pallas_sgd as ps

        U, I, f, fe = 200, 512, 6, 64
        rng = np.random.default_rng(6)
        fb = PosOnlyData(rng.integers(0, U, 600).astype(np.int32),
                         rng.integers(0, I, 600).astype(np.int32),
                         num_users=U, num_items=I)
        plan, neg_state, neg_meta = pb.prepare_bpr_mxu(
            fb, uniform_user=True, user_block=128, item_block=128,
            chunk=128, shuffle_seed=0, bitmask=False, subkeys=True)
        n_ib, Kcap, trials, _, IB = neg_meta
        Ksub = neg_state["ksub"]
        packed_ext, S, n_pass, P, slab_items = pb.bpr_tiled_plan(
            plan, neg_state["nvalid"], slab_blocks=1, pass_len=4096)
        assert S > 1
        tl = dict(packed=packed_ext, num_slabs=S, num_passes=n_pass,
                  pass_len=P, slab_items=slab_items, slab_blocks=1)
        order = pb.device_bpr_tiled_epoch_order(
            plan, tl, neg_state["nvalid"], num_items=I, seed=37)
        assert int(jnp.sum(jnp.abs(order[9]))) == 0
        src_host = (ps.refetch_flags(np.asarray(order[0]), 1)
                    | pb._slab_refetch_flags(np.asarray(order[2]),
                                             np.asarray(order[5])))
        slab_rows = 1 * plan.item_block
        rng2 = np.random.default_rng(7)
        We, He = pb.bpr_tables_to_mxu(
            jnp.asarray(0.1 * rng2.standard_normal((U, f)), jnp.float32),
            jnp.asarray(0.1 * rng2.standard_normal((I, f)), jnp.float32),
            jnp.zeros(I), jnp.asarray(plan.new_of_old),
            u_pad=plan.u_pad, i_pad=S * slab_rows, fe=fe)
        rates = pb.bpr_mxu_column_rates(f, fe, 0.05, 0.0025, 0.0025,
                                        0.00025, 0.01, True)
        bits = pb.epoch_random_bits(
            jax.random.PRNGKey(41), nc=n_pass * P, trials=trials,
            C=plan.chunk).reshape(n_pass, P, trials, plan.chunk)
        kw = dict(meta=(P, plan.chunk, plan.user_block, plan.item_block,
                        plan.n_ublocks, slab_rows, fe, Ksub, trials),
                  num_slabs=S, subkeys=True, mxu_dtype="f32")
        W_z, H_z, n_z = pb.bpr_epoch_mxu_tiled(
            jnp.asarray(We).copy(), jnp.asarray(He).copy(), packed_ext,
            neg_state["subkeys_tbl"], neg_state["cdf_tbl"], bits, order,
            rates, **kw)
        order_h = order[:9] + (jnp.asarray(src_host.astype(np.int32)),)
        W_h, H_h, n_h = pb.bpr_epoch_mxu_tiled(
            jnp.asarray(We).copy(), jnp.asarray(He).copy(), packed_ext,
            neg_state["subkeys_tbl"], neg_state["cdf_tbl"], bits,
            order_h, rates, **kw)
        np.testing.assert_array_equal(np.asarray(n_z), np.asarray(n_h))
        np.testing.assert_array_equal(np.asarray(W_z), np.asarray(W_h))
        np.testing.assert_array_equal(np.asarray(H_z), np.asarray(H_h))


class TestTpuSmokeBpr:
    def _fb(self, U=60, I=50, n=400, seed=4):
        from mymedialite_tpu.data.arrays import PosOnlyData
        rng = np.random.default_rng(seed)
        return PosOnlyData(rng.integers(0, U, n).astype(np.int32),
                           rng.integers(0, I, n).astype(np.int32),
                           num_users=U, num_items=I)

    def test_resident_epoch_matches_interpret(self):
        from mymedialite_tpu.ops import pallas_bpr as pb

        U, I, f, fe = 60, 50, 6, 64
        fb = self._fb(U, I)
        plan, neg_state, neg_meta = pb.prepare_bpr_mxu(
            fb, uniform_user=True, user_block=8, item_block=128,
            chunk=128, shuffle_seed=0, bitmask=True)
        n_ib, Kcap, trials, _, IB = neg_meta
        rng = np.random.default_rng(5)
        We, He = pb.bpr_tables_to_mxu(
            jnp.asarray(0.1 * rng.standard_normal((U, f)), jnp.float32),
            jnp.asarray(0.1 * rng.standard_normal((I, f)), jnp.float32),
            jnp.zeros(I), jnp.asarray(plan.new_of_old),
            u_pad=plan.u_pad, i_pad=plan.i_pad, fe=fe)
        rates = pb.bpr_mxu_column_rates(f, fe, 0.05, 0.0025, 0.0025,
                                        0.00025, 0.01, True)
        order = plan.epoch_order(11)
        ub_visit = plan.ub_c[np.asarray(order[2])]
        jb, nval, bkt = pb.epoch_negative_plan(
            plan, neg_state["nvalid"], ub_visit, I, 13)
        bits = pb.epoch_random_bits(jax.random.PRNGKey(17),
                                    nc=plan.num_chunks, trials=trials,
                                    C=plan.chunk)
        for bm in (None, neg_state["bitmask_tbl"]):
            kw = dict(meta=plan.meta(fe) + (Kcap, trials),
                      mxu_dtype="f32", bm_tbl=bm)
            Wt, Ht, nt = pb.bpr_epoch_mxu(
                jnp.asarray(We).copy(), jnp.asarray(He).copy(),
                plan.packed, neg_state["keys_tbl"],
                neg_state["cdf_tbl"], bits, order, jb, nval, bkt,
                rates, **kw)
            Wi, Hi, ni = pb.bpr_epoch_mxu(
                jnp.asarray(We).copy(), jnp.asarray(He).copy(),
                plan.packed, neg_state["keys_tbl"],
                neg_state["cdf_tbl"], bits, order, jb, nval, bkt,
                rates, interpret=True, **kw)
            np.testing.assert_array_equal(np.asarray(nt), np.asarray(ni))
            np.testing.assert_allclose(np.asarray(Wt), np.asarray(Wi),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(Ht), np.asarray(Hi),
                                       atol=1e-5)

    def test_tiled_epoch_matches_interpret(self):
        """Tiled BPR with sub-bucketed membership keys + two slab slots
        + refetch flags on the real chip."""
        from mymedialite_tpu.ops import pallas_bpr as pb

        # tiled kernels store tables TRANSPOSED: user_block/item_block
        # must be lane-tile (128) aligned (production: 512/1024)
        U, I, f, fe = 200, 512, 6, 64
        fb = self._fb(U, I, n=600, seed=6)
        plan, neg_state, neg_meta = pb.prepare_bpr_mxu(
            fb, uniform_user=True, user_block=128, item_block=128,
            chunk=128, shuffle_seed=0, bitmask=False, subkeys=True)
        n_ib, Kcap, trials, _, IB = neg_meta
        Ksub = neg_state["ksub"]
        packed_ext, S, n_pass, P, slab_items = pb.bpr_tiled_plan(
            plan, neg_state["nvalid"], slab_blocks=1, pass_len=4096)
        assert S > 1
        order = pb.bpr_tiled_epoch_order(
            plan, neg_state["nvalid"], slab_items, slab_blocks=1,
            num_slabs=S, num_passes=n_pass, pass_len=P, num_items=I,
            seed=19)
        rng = np.random.default_rng(7)
        slab_rows = 1 * plan.item_block
        We, He = pb.bpr_tables_to_mxu(
            jnp.asarray(0.1 * rng.standard_normal((U, f)), jnp.float32),
            jnp.asarray(0.1 * rng.standard_normal((I, f)), jnp.float32),
            jnp.zeros(I), jnp.asarray(plan.new_of_old),
            u_pad=plan.u_pad, i_pad=S * slab_rows, fe=fe)
        rates = pb.bpr_mxu_column_rates(f, fe, 0.05, 0.0025, 0.0025,
                                        0.00025, 0.01, True)
        bits = pb.epoch_random_bits(
            jax.random.PRNGKey(23), nc=n_pass * P, trials=trials,
            C=plan.chunk).reshape(n_pass, P, trials, plan.chunk)
        kw = dict(meta=(P, plan.chunk, plan.user_block, plan.item_block,
                        plan.n_ublocks, slab_rows, fe, Ksub, trials),
                  num_slabs=S, subkeys=True, mxu_dtype="f32")
        Wt, Ht, nt = pb.bpr_epoch_mxu_tiled(
            jnp.asarray(We).copy(), jnp.asarray(He).copy(), packed_ext,
            neg_state["subkeys_tbl"], neg_state["cdf_tbl"], bits, order,
            rates, **kw)
        Wi, Hi, ni = pb.bpr_epoch_mxu_tiled(
            jnp.asarray(We).copy(), jnp.asarray(He).copy(), packed_ext,
            neg_state["subkeys_tbl"], neg_state["cdf_tbl"], bits, order,
            rates, interpret=True, **kw)
        np.testing.assert_array_equal(np.asarray(nt), np.asarray(ni))
        np.testing.assert_allclose(np.asarray(Wt), np.asarray(Wi),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Ht), np.asarray(Hi),
                                   atol=1e-5)
