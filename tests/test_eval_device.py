"""Device-resident rating evaluation (eval/rating.py fast path).

The fused pair_scorer metric path must agree with the host predict_batch
path bit-for-bit in semantics (same masks, same CBD formula,
Eval/Ratings.cs:73-162) within float32-reduction tolerance.
"""

import numpy as np
import pytest

from mymedialite_tpu.data.arrays import RatingData
from mymedialite_tpu.data.synthetic import split_ratings, synthetic_ratings
from mymedialite_tpu.eval import rating as R
from mymedialite_tpu.models.baselines import UserItemBaseline
from mymedialite_tpu.models.mf import (
    BiasedMatrixFactorization, MatrixFactorization,
)

KEYS = ("RMSE", "MAE", "NMAE", "CBD")


@pytest.fixture(scope="module")
def data():
    pos = synthetic_ratings(num_users=300, num_items=200, num_ratings=8000,
                            seed=5)
    return split_ratings(pos, 0.2, seed=7)


def _numpy_path(model, test, train):
    get = model.pair_scorer
    model.pair_scorer = lambda: None
    try:
        return R.evaluate_ratings(model, test, train)
    finally:
        model.pair_scorer = get


@pytest.mark.parametrize("cls", [MatrixFactorization,
                                 BiasedMatrixFactorization])
def test_matches_numpy_path(cls, data):
    train, test = data
    m = cls()
    m.num_iter = 3
    m.ratings = train
    m.train()
    assert m.pair_scorer() is not None
    dev = R.evaluate_ratings(m, test, train)
    ref = _numpy_path(m, test, train)
    for k in KEYS:
        assert dev[k] == pytest.approx(ref[k], abs=2e-5)
    for a, b in ((dev.new_user_results, ref.new_user_results),
                 (dev.new_item_results, ref.new_item_results),
                 (dev.new_user_new_item_results,
                  ref.new_user_new_item_results)):
        assert (a is None) == (b is None)
        if a is not None:
            for k in KEYS:
                assert a[k] == pytest.approx(b[k], abs=2e-4)


def test_no_breakdown_and_cache(data):
    train, test = data
    m = BiasedMatrixFactorization()
    m.num_iter = 2
    m.ratings = train
    m.train()
    dev = R.evaluate_ratings(m, test)
    ref = _numpy_path(m, test, None)
    for k in KEYS:
        assert dev[k] == pytest.approx(ref[k], abs=2e-5)
    assert dev.new_user_results is None
    # second call reuses the cached device arrays (same objects)
    cached = test.__dict__["_dev_eval"]
    R.evaluate_ratings(m, test)
    assert test.__dict__["_dev_eval"] is cached
    # mutating ops return NEW data objects -> no stale cache possible
    test2 = test.add(np.array([1], np.int32), np.array([2], np.int32),
                     np.array([3.0], np.float32))
    assert "_dev_eval" not in test2.__dict__


def test_fallback_models_unaffected(data):
    train, test = data
    m = UserItemBaseline()
    m.ratings = train
    m.train()
    res = R.evaluate_ratings(m, test, train)
    assert 0.0 < res["RMSE"] < 2.0


def test_cold_start_subsets_match_reference_masks(data):
    """Users/items absent from training land in the new_* subsets
    (Eval/Ratings.cs:82-92) on the device path too."""
    train, _ = data
    m = BiasedMatrixFactorization()
    m.num_iter = 2
    m.ratings = train
    m.train()
    # craft a test set with guaranteed new users and new items
    test = RatingData(
        np.array([0, 1, train.num_users + 3, train.num_users + 4],
                 np.int32),
        np.array([0, train.num_items + 7, 1, train.num_items + 8],
                 np.int32),
        np.array([3.0, 4.0, 2.0, 5.0], np.float32),
        num_users=train.num_users + 5, num_items=train.num_items + 9)
    dev = R.evaluate_ratings(m, test, train)
    ref = _numpy_path(m, test, train)
    for a, b in ((dev.new_user_results, ref.new_user_results),
                 (dev.new_item_results, ref.new_item_results),
                 (dev.new_user_new_item_results,
                  ref.new_user_new_item_results)):
        assert (a is None) == (b is None)
        if a is not None:
            for k in KEYS:
                assert a[k] == pytest.approx(b[k], abs=2e-4)


def test_banked_gather_path_matches(data, monkeypatch):
    """The banked (windowed) user gather (ops/gather.py) must produce
    the same metrics as the plain path — forced on at toy scale by
    shrinking the window/threshold constants."""
    from mymedialite_tpu.ops import gather as bg
    train, test = data
    m = BiasedMatrixFactorization()
    m.num_iter = 3
    m.ratings = train
    m.train()
    ref = R.evaluate_ratings(m, test, train)

    monkeypatch.setattr(bg, "MIN_ROWS", 0)
    monkeypatch.setattr(bg, "WINDOW", 64)
    monkeypatch.setattr(bg, "SEG_C", 1024)
    fn, params = m.pair_scorer()
    assert getattr(fn, "WANTS_UGATHER", False)
    test.__dict__.pop("_dev_eval_banked", None)
    dev = R.evaluate_ratings(m, test, train)
    for k in KEYS:
        assert dev[k] == pytest.approx(ref[k], abs=2e-5)
    for a, b in ((dev.new_user_results, ref.new_user_results),
                 (dev.new_item_results, ref.new_item_results),
                 (dev.new_user_new_item_results,
                  ref.new_user_new_item_results)):
        assert (a is None) == (b is None)
        if a is not None:
            for k in KEYS:
                assert a[k] == pytest.approx(b[k], abs=2e-4)
    test.__dict__.pop("_dev_eval_banked", None)


def test_banked_gather_cold_start(monkeypatch):
    """Out-of-table (new) users must still be masked correctly through
    the windowed gather's clipping."""
    from mymedialite_tpu.ops import gather as bg
    pos = synthetic_ratings(num_users=200, num_items=150, num_ratings=5000,
                            seed=11)
    train, _ = split_ratings(pos, 0.2, seed=3)
    m = BiasedMatrixFactorization()
    m.num_iter = 2
    m.ratings = train
    m.train()
    test = RatingData(
        np.array([0, 5, train.num_users + 3, train.num_users + 40],
                 np.int32),
        np.array([0, train.num_items + 7, 1, 2], np.int32),
        np.array([3.0, 4.0, 2.0, 5.0], np.float32),
        num_users=train.num_users + 41, num_items=train.num_items + 9)
    ref = R.evaluate_ratings(m, test, train)
    monkeypatch.setattr(bg, "MIN_ROWS", 0)
    monkeypatch.setattr(bg, "WINDOW", 32)
    monkeypatch.setattr(bg, "SEG_C", 1024)
    test.__dict__.pop("_dev_eval_banked", None)
    dev = R.evaluate_ratings(m, test, train)
    for k in KEYS:
        assert dev[k] == pytest.approx(ref[k], abs=2e-5)
