"""Online ("prequential") evaluation: predict, then train on what was
just predicted.

Counterparts of reference ``Eval/RatingsOnline.cs:35-80`` (per-rating,
random order) and ``Eval/ItemsOnline.cs:43-105`` (per-user). This is
the streaming-serving protocol: the incremental-update path
(AddRatings/AddFeedback -> in-place row refresh on device) is exercised
one event at a time.
"""

from __future__ import annotations

import numpy as np

from mymedialite_tpu.eval.measures import compute_cbd
from mymedialite_tpu.eval.ranking import candidates_for_mode, evaluate_items
from mymedialite_tpu.eval.results import (
    ItemRecommendationResults, RatingPredictionResults,
)


def evaluate_ratings_online(recommender, test, rng=None
                            ) -> RatingPredictionResults:
    """Reference RatingsOnline.EvaluateOnline: iterate test ratings in
    random order; predict, accumulate RMSE/MAE/CBD, then AddRatings."""
    if not hasattr(recommender, "add_ratings"):
        raise TypeError("recommender must support incremental updates")
    rng = rng or np.random.default_rng(getattr(recommender, "random_seed", 42))
    order = rng.permutation(len(test))
    se = ae = cbd = 0.0
    lo, hi = recommender.min_rating, recommender.max_rating
    for index in order:
        u = int(test.users[index])
        i = int(test.items[index])
        actual = float(test.values[index])
        pred = recommender.predict(u, i)
        err = pred - actual
        se += err * err
        ae += abs(err)
        cbd += float(compute_cbd(actual, pred, lo, hi))
        recommender.add_ratings([u], [i], [actual])
    n = len(test)
    result = RatingPredictionResults()
    result["RMSE"] = np.sqrt(se / n)
    result["MAE"] = ae / n
    result["NMAE"] = (ae / n) / (hi - lo)
    result["CBD"] = cbd / n
    return result


def evaluate_items_online(recommender, test, training, test_users=None,
                          candidate_items=None, candidate_item_mode="OVERLAP",
                          rng=None) -> ItemRecommendationResults:
    """Reference ItemsOnline.EvaluateOnline: per test user (random order),
    evaluate that user's test items, then AddFeedback them."""
    if not hasattr(recommender, "add_feedback"):
        raise TypeError("recommender must support incremental updates")
    rng = rng or np.random.default_rng(getattr(recommender, "random_seed", 42))
    if test_users is None:
        test_users = test.all_users
    test_users = np.asarray(test_users)
    test_users = test_users[rng.permutation(test_users.size)]
    cand = candidates_for_mode(candidate_item_mode, test, training,
                               candidate_items)
    cand_set = set(int(c) for c in cand)

    per_user = []
    for u in test_users:
        u = int(u)
        items_u = test.items_by_user(u) if u < test.num_users else \
            np.array([], dtype=np.int32)
        if not any(int(i) in cand_set for i in items_u):
            continue
        from mymedialite_tpu.data.arrays import PosOnlyData
        current = PosOnlyData(np.full(items_u.size, u, dtype=np.int32),
                              items_u, num_users=max(u + 1, test.num_users),
                              num_items=test.num_items)
        res = evaluate_items(recommender, current, training,
                             test_users=[u], candidate_items=cand,
                             candidate_item_mode="EXPLICIT")
        per_user.append(res)
        recommender.add_feedback(np.full(items_u.size, u, dtype=np.int32),
                                 items_u)

    result = ItemRecommendationResults()
    for m in ItemRecommendationResults.ALL_MEASURES:
        result[m] = (sum(r[m] for r in per_user) / len(per_user)
                     if per_user else 0.0)
    result["num_users"] = len(per_user)
    result["num_lists"] = len(per_user)
    result["num_items"] = len(cand_set)
    return result
