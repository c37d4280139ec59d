"""Native MXU-plan bucketizer (native/fast_parser.cpp; VERDICT r4 #4).

The C++ two-pass counting sort must produce BIT-IDENTICAL plans to the
numpy path it replaces (same shuffle order applied during the passes,
same within-bucket event order as the stable argsort), across chunk
selection modes and with/without shuffling. Skips cleanly when no
compiler is available (the numpy path remains the fallback).
"""

import numpy as np
import pytest

from mymedialite_tpu import native
from mymedialite_tpu.ops import pallas_sgd as ps


@pytest.fixture(scope="module")
def lib_available():
    if native.get_lib() is None or \
            not hasattr(native.get_lib(), "mml_bucket_count"):
        pytest.skip("native bucketizer unavailable")


def _events(U=3000, I=2000, n=120_000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, U, n).astype(np.int32),
            (np.minimum(rng.zipf(1.3, n), I) - 1).astype(np.int32),
            rng.uniform(1, 5, n).astype(np.float32))


@pytest.mark.parametrize("chunk,seed", [(None, 3), (128, 3), (None, None)])
def test_bit_identical_to_numpy_path(lib_available, monkeypatch,
                                     chunk, seed):
    U, I = 3000, 2000
    users, items, values = _events(U, I)
    p_nat = ps.prepare_mxu_data(users, items, values, U, I,
                                user_block=64, item_block=128,
                                chunk=chunk, shuffle_seed=seed)
    monkeypatch.setattr(native, "mxu_bucketize", lambda *a, **k: None)
    p_np = ps.prepare_mxu_data(users, items, values, U, I,
                               user_block=64, item_block=128,
                               chunk=chunk, shuffle_seed=seed)
    assert p_nat.chunk == p_np.chunk
    assert p_nat.num_chunks == p_np.num_chunks
    assert np.array_equal(np.asarray(p_nat.packed),
                          np.asarray(p_np.packed))
    assert np.array_equal(p_nat.ub_c, p_np.ub_c)
    assert np.array_equal(p_nat.ib_c, p_np.ib_c)
    assert np.array_equal(p_nat.new_of_old, p_np.new_of_old)


def test_count_items_matches_bincount(lib_available):
    _, items, _ = _events()
    got = native.count_items(items, 2000)
    assert np.array_equal(got, np.bincount(items, minlength=2000))


def test_shared_item_perm(lib_available):
    """The SVD++ prep path: a second stream bucketed under a forced
    item permutation gets the same layout fields either way."""
    U, I = 500, 400
    u1, i1, v1 = _events(U, I, n=20_000, seed=1)
    u2, i2, v2 = _events(U, I, n=15_000, seed=2)
    p1 = ps.prepare_mxu_data(u1, i1, v1, U, I, user_block=32,
                             item_block=64, chunk=64, shuffle_seed=0)
    p2 = ps.prepare_mxu_data(u2, i2, v2, U, I, user_block=32,
                             item_block=64, chunk=64, shuffle_seed=0,
                             item_perm=p1.new_of_old)
    assert np.array_equal(p1.new_of_old, p2.new_of_old)
    # every event lands in the bucket its (user, permuted item) implies
    packed = np.asarray(p2.packed)
    w = packed[:, 3].view(np.float32)
    total = int((w > 0).sum())
    assert total == len(u2)
