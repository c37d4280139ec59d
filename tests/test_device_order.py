"""Device-built tiled epoch schedules (VERDICT r4 #2).

The big-catalog model path was glue-bound: per epoch, the host rebuilt
the tiled schedule with numpy argsort/choice loops (~0.2 s at 33k+
chunks) and shipped eight arrays over the tunnel. The device-order
functions (`pallas_sgd.device_tiled_epoch_order`,
`pallas_bpr.device_bpr_tiled_epoch_order`) build the whole schedule in
one fused dispatch. These tests pin their SEMANTICS on CPU:

- every real chunk appears exactly once; pads point at the zero chunk
  and repeat the last real residency ids (no spurious DMA);
- schedule columns are consistent with the plan layout (ub/ibr/isl
  derived from the same chunk metadata);
- chunks are grouped by (slab, [neg-slab,] ublock) cells within each
  pass (the kernels' residency contract);
- negative draws live in-range and the slab marginal tracks
  P(slab) = slab_items / catalog (the tiled sampler's exactness
  argument, ops/pallas_bpr.py module comment);
- the refetch-source flags are zero (real-TPU aliasing no-op — proven
  bit-exactly on hardware by tests/test_tpu_smoke.py
  TestTpuSmokeDeviceOrder).

Kernel numerics on these schedules are covered by the on-TPU smoke
tier; interpret-mode runs keep the host path (which carries the flags
interpret needs).
"""

import numpy as np
import pytest

from mymedialite_tpu.data.arrays import PosOnlyData
from mymedialite_tpu.ops import pallas_bpr as pb
from mymedialite_tpu.ops import pallas_sgd as ps


@pytest.fixture(scope="module")
def bpr_setup():
    rng = np.random.default_rng(0)
    U, I, n = 200, 300, 5000
    fb = PosOnlyData(rng.integers(0, U, n).astype(np.int32),
                     rng.integers(0, I, n).astype(np.int32),
                     num_users=U, num_items=I)
    plan, neg_state, neg_meta = pb.prepare_bpr_mxu(
        fb, uniform_user=True, user_block=16, item_block=16, chunk=None,
        subkeys=True, kcap=128, ksub_cap=256, bitmask=False,
        chunk_overhead=16)
    packed_ext, S, n_pass, P, slab_items = pb.bpr_tiled_plan(
        plan, neg_state["nvalid"], slab_blocks=4, pass_len=64)
    tl = dict(packed=packed_ext, num_slabs=S, num_passes=n_pass,
              pass_len=P, slab_items=slab_items, slab_blocks=4)
    return fb, plan, neg_state, neg_meta, tl


class TestDeviceBprTiledOrder:
    def test_schedule_valid(self, bpr_setup):
        fb, plan, neg_state, neg_meta, tl = bpr_setup
        n_ib, Kcap, trials, num_items, IB = neg_meta
        S, B = tl["num_slabs"], min(tl["slab_blocks"], plan.n_iblocks)
        order = pb.device_bpr_tiled_epoch_order(
            plan, tl, neg_state["nvalid"], num_items=num_items, seed=7)
        (ub, ibr, isl, jb, jbr, jsl, nval, bkt, row, src) = (
            np.asarray(a) for a in order)
        nc = plan.num_chunks
        flat = row.reshape(-1)
        real = flat < nc
        assert sorted(flat[real]) == list(range(nc))
        assert (flat[~real] == nc).all()          # zero pad chunk
        perm = flat[real]
        assert (ub.reshape(-1)[real] == plan.ub_c[perm]).all()
        isl_exp = plan.ib_c[perm] // B
        assert (isl.reshape(-1)[real] == isl_exp).all()
        assert (ibr.reshape(-1)[real]
                == plan.ib_c[perm] - isl_exp * B).all()
        # grouped by (isl, jsl, ub) cells within each pass
        for p in range(tl["num_passes"]):
            cell = ((isl[p].astype(np.int64) * S + jsl[p])
                    * plan.n_ublocks + ub[p])
            cr = cell[row[p] < nc]
            assert (np.diff(cr) >= 0).all()
        # negatives in-range + consistent
        jb_f = jb.reshape(-1)[real]
        jsl_f = jsl.reshape(-1)[real]
        jbr_f = jbr.reshape(-1)[real]
        assert (jb_f == jsl_f * B + jbr_f).all()
        nbo = np.minimum((jsl_f + 1) * B, plan.n_iblocks) - jsl_f * B
        assert (jbr_f >= 0).all() and (jbr_f < nbo).all()
        assert (nval.reshape(-1)[real]
                == np.maximum(neg_state["nvalid"][jb_f], 1)).all()
        assert (bkt.reshape(-1)[real]
                == plan.ub_c[perm] * plan.n_iblocks + jb_f).all()
        assert (src == 0).all()
        # pads repeat last real residency ids (no pad-driven DMA swap)
        if (~real).any():
            last = np.nonzero(real)[0].max()
            for a in (ub, isl, jsl):
                fa = a.reshape(-1)
                assert (fa[last:] == fa[last]).all()

    def test_neg_slab_marginal(self, bpr_setup):
        fb, plan, neg_state, neg_meta, tl = bpr_setup
        n_ib, Kcap, trials, num_items, IB = neg_meta
        S = tl["num_slabs"]
        nc = plan.num_chunks
        cnt = np.zeros(S)
        for s in range(200):
            o = pb.device_bpr_tiled_epoch_order(
                plan, tl, neg_state["nvalid"], num_items=num_items,
                seed=1000 + s)
            real = np.asarray(o[8]).reshape(-1) < nc
            cnt += np.bincount(np.asarray(o[5]).reshape(-1)[real],
                               minlength=S)
        got = cnt / cnt.sum()
        exp = tl["slab_items"] / tl["slab_items"].sum()
        assert np.abs(got - exp).max() < 0.03, (got, exp)

    def test_wbpr_neg_slab_marginal_by_mass(self, bpr_setup):
        fb, plan, neg_state, neg_meta, tl = bpr_setup
        n_ib, Kcap, trials, num_items, IB = neg_meta
        S, B = tl["num_slabs"], min(tl["slab_blocks"], plan.n_iblocks)
        tl2 = dict(tl)                      # fresh device-state cache
        tl2.pop("_dev_order_state", None)
        bm = np.asarray(neg_state["block_mass"], np.float64)
        nc = plan.num_chunks
        cnt = np.zeros(S)
        for s in range(200):
            o = pb.device_bpr_tiled_epoch_order(
                plan, tl2, neg_state["nvalid"], num_items=num_items,
                seed=2000 + s, block_mass=bm)
            real = np.asarray(o[8]).reshape(-1) < nc
            cnt += np.bincount(np.asarray(o[5]).reshape(-1)[real],
                               minlength=S)
        got = cnt / cnt.sum()
        pm = np.concatenate([bm, np.zeros(S * B - plan.n_iblocks)])
        sm = pm.reshape(S, B).sum(axis=1)
        exp = sm / sm.sum()
        assert np.abs(got - exp).max() < 0.03, (got, exp)

    def test_in_cell_shuffle_varies_by_seed(self, bpr_setup):
        fb, plan, neg_state, neg_meta, tl = bpr_setup
        o1 = pb.device_bpr_tiled_epoch_order(
            plan, tl, neg_state["nvalid"], num_items=neg_meta[3], seed=1)
        o2 = pb.device_bpr_tiled_epoch_order(
            plan, tl, neg_state["nvalid"], num_items=neg_meta[3], seed=2)
        o1b = pb.device_bpr_tiled_epoch_order(
            plan, tl, neg_state["nvalid"], num_items=neg_meta[3], seed=1)
        assert not np.array_equal(np.asarray(o1[8]), np.asarray(o2[8]))
        assert np.array_equal(np.asarray(o1[8]), np.asarray(o1b[8]))


class TestDeviceSgdTiledOrder:
    def test_schedule_valid(self):
        rng = np.random.default_rng(1)
        U, I, n = 200, 300, 5000
        plan = ps.prepare_mxu_tiled(
            rng.integers(0, U, n).astype(np.int32),
            rng.integers(0, I, n).astype(np.int32),
            rng.uniform(1, 5, n).astype(np.float32), U, I,
            user_block=16, item_block=16, chunk=32, slab_blocks=4,
            pass_len=64)
        B = min(plan.slab_blocks, plan.n_iblocks)
        order = ps.device_tiled_epoch_order(plan, 11)
        ub, ibr, isl, row, src = (np.asarray(a) for a in order)
        nc = plan.ub_c.size
        flat = row.reshape(-1)
        real = flat < nc
        assert sorted(flat[real]) == list(range(nc))
        assert (flat[~real] == nc).all()
        perm = flat[real]
        assert (ub.reshape(-1)[real] == plan.ub_c[perm]).all()
        isl_exp = plan.ib_c[perm] // B
        assert (isl.reshape(-1)[real] == isl_exp).all()
        assert (ibr.reshape(-1)[real]
                == plan.ib_c[perm] - isl_exp * B).all()
        for p in range(plan.num_passes):
            cell = (isl[p].astype(np.int64) * plan.n_ublocks + ub[p])
            cr = cell[row[p] < nc]
            assert (np.diff(cr) >= 0).all()
        assert (src == 0).all()
