"""Rating-prediction evaluation (RMSE/MAE/NMAE/CBD + cold-start breakdown).

Counterpart of reference ``Eval/Ratings.cs:73-139``. The reference's
per-rating ``Predict`` loop becomes one vectorized ``predict_batch``
call over the whole test set (the TPU path: a gather + fused arithmetic
under jit inside the model).
"""

from __future__ import annotations

import numpy as np

from mymedialite_tpu.eval.results import RatingPredictionResults


def _evaluate_indices(recommender, test, idx) -> dict:
    if idx.size == 0:
        return None
    users, items, actual = test.users[idx], test.items[idx], test.values[idx]
    if getattr(recommender, "time_aware", False) and test.times is not None:
        pred = np.asarray(recommender.predict_batch_time(
            users, items, test.times[idx]), dtype=np.float64)
    else:
        pred = np.asarray(recommender.predict_batch(users, items), dtype=np.float64)
    err = pred - actual
    from mymedialite_tpu.eval.measures import compute_cbd
    lo = recommender.min_rating
    hi = recommender.max_rating
    return {
        "RMSE": float(np.sqrt(np.mean(err ** 2))),
        "MAE": float(np.mean(np.abs(err))),
        "NMAE": float(np.mean(np.abs(err)) / (hi - lo)),
        "CBD": float(np.mean(compute_cbd(actual, pred, lo, hi))),
    }


def evaluate_ratings(recommender, test, training=None) -> RatingPredictionResults:
    """Full protocol, incl. cold-start breakdown when ``training`` is given
    (reference Eval/Ratings.cs:82-92: new-user / new-item / new-user-new-item
    subsets by zero training count or out-of-range id)."""
    all_idx = np.arange(len(test))
    results = RatingPredictionResults(_evaluate_indices(recommender, test, all_idx) or {})
    if training is not None:
        tu, ti = test.users, test.items
        cu = training.count_by_user
        ci = training.count_by_item
        new_user = (tu >= training.num_users) | \
            (np.where(tu < training.num_users, cu[np.minimum(tu, training.num_users - 1)], 0) == 0)
        new_item = (ti >= training.num_items) | \
            (np.where(ti < training.num_items, ci[np.minimum(ti, training.num_items - 1)], 0) == 0)
        results.new_user_results = _evaluate_indices(
            recommender, test, all_idx[new_user])
        results.new_item_results = _evaluate_indices(
            recommender, test, all_idx[new_item])
        results.new_user_new_item_results = _evaluate_indices(
            recommender, test, all_idx[new_user & new_item])
    return results


def compute_fit(recommender) -> float:
    """RMSE of the recommender on its own training data
    (reference Eval/Ratings.cs ComputeFit)."""
    return _evaluate_indices(
        recommender, recommender.ratings, np.arange(len(recommender.ratings))
    )["RMSE"]
