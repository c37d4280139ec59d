"""Fused Pallas top-K vs the XLA oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mymedialite_tpu.ops import pallas_topk as pt


def _run(B, N, f, k, mask_frac=None, seed=0, **kw):
    rng = np.random.default_rng(seed)
    W = jnp.asarray(rng.normal(size=(B, f)).astype(np.float32))
    H = jnp.asarray(rng.normal(size=(N, f)).astype(np.float32))
    mask = None
    if mask_frac is not None:
        mask = jnp.asarray(
            (rng.random((B, N)) > mask_frac).astype(np.int8))
    got_ids, got_vals = pt.catalog_topk(W, H, mask, k=k, interpret=True,
                                        **kw)
    exp_ids, exp_vals = pt.topk_reference(W, H, mask, k=k)
    return (np.asarray(got_ids), np.asarray(got_vals),
            np.asarray(exp_ids), np.asarray(exp_vals))


class TestPallasTopK:
    def test_basic(self):
        gi, gv, ei, ev = _run(B=16, N=1000, f=24, k=10)
        np.testing.assert_array_equal(gi, ei)
        np.testing.assert_allclose(gv, ev, rtol=1e-4, atol=1e-6)

    def test_multi_user_blocks_and_tiles(self):
        gi, gv, ei, ev = _run(B=300, N=1537, f=17, k=7,
                              block_users=128, tile_items=512)
        np.testing.assert_array_equal(gi, ei)
        np.testing.assert_allclose(gv, ev, rtol=1e-4, atol=1e-6)

    def test_mask(self):
        gi, gv, ei, ev = _run(B=32, N=700, f=8, k=5, mask_frac=0.5)
        np.testing.assert_array_equal(gi, ei)
        np.testing.assert_allclose(gv, ev, rtol=1e-4, atol=1e-6)

    def test_nearly_all_masked(self):
        # fewer unmasked items than k for some users -> NEG_INF tail
        rng = np.random.default_rng(3)
        W = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
        H = jnp.asarray(rng.normal(size=(50, 6)).astype(np.float32))
        mask = np.zeros((4, 50), np.int8)
        mask[0, [3, 10]] = 1          # 2 candidates < k=4
        mask[1, :] = 1
        gi, gv = pt.catalog_topk(W, H, jnp.asarray(mask), k=4,
                                 interpret=True)
        ei, ev = pt.topk_reference(W, H, jnp.asarray(mask), k=4)
        gv, ev = np.asarray(gv), np.asarray(ev)
        gi, ei = np.asarray(gi), np.asarray(ei)
        real = ev > float(pt.NEG_INF) / 2
        np.testing.assert_array_equal(gi[real], ei[real])
        np.testing.assert_allclose(gv, ev, rtol=1e-4, atol=1e-6)
        assert (gv[0, 2:] <= float(pt.NEG_INF) / 2).all()

    def test_k_larger_than_catalog(self):
        gi, gv, ei, ev = _run(B=8, N=6, f=4, k=10)
        real = ev > float(pt.NEG_INF) / 2
        np.testing.assert_array_equal(gi[real], ei[real])
        np.testing.assert_allclose(gv, ev, rtol=1e-4, atol=1e-6)

    def test_duplicate_scores_tie_order(self):
        # identical item rows -> equal scores; smaller id must win,
        # matching lax.top_k
        W = jnp.ones((3, 4), jnp.float32)
        H = jnp.ones((600, 4), jnp.float32)
        gi, gv = pt.catalog_topk(W, H, k=5, interpret=True,
                                 tile_items=128)
        ei, ev = pt.topk_reference(W, H, k=5)
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(ei))

    def test_k_guard(self):
        with pytest.raises(ValueError):
            _run(B=4, N=100, f=4, k=100)
