"""Cross-validation evaluation.

Counterparts of reference ``Eval/RatingsCrossValidation.cs:36-148`` and
``Eval/ItemsCrossValidation.cs:39-127``: k-fold split, per-fold
clone+train+evaluate, fold-averaged results. The reference parallelizes
folds with Parallel.For; here folds run sequentially (each fold's
training already saturates the chip).
"""

from __future__ import annotations

import numpy as np

from mymedialite_tpu.data.splits import crossvalidation_split
from mymedialite_tpu.eval.ranking import evaluate_items
from mymedialite_tpu.eval.rating import evaluate_ratings
from mymedialite_tpu.eval.results import (
    ItemRecommendationResults, RatingPredictionResults,
)


def clone_recommender(recommender):
    """Fresh instance with the same hyperparameters (reference Clone()
    usage in RatingsCrossValidation.cs:41-68)."""
    fresh = type(recommender)()
    names = list(getattr(recommender, "HYPERPARAMS", {}))
    names += list(getattr(recommender, "EXTRA_PARAMS", {}))
    names += ["random_seed"]
    for name in names:
        if hasattr(recommender, name):
            setattr(fresh, name, getattr(recommender, name))
    return fresh


def set_additional_feedback(model, test):
    """Transductive predictors (SVD++ family) receive the test users'
    rated items as implicit feedback (reference ITransductiveRatingPredictor
    wiring, RatingsCrossValidation.cs:66-67, RatingPrediction.cs:424-425)."""
    if hasattr(model, "additional_feedback"):
        model.additional_feedback = (test.users, test.items)


def crossvalidate_ratings(recommender, ratings, num_folds: int = 5,
                          compute_fit: bool = False, shuffle: bool = False,
                          rng=None, show_results: bool = False):
    folds = crossvalidation_split(ratings, num_folds, shuffle, rng)
    fold_results = []
    for f, (train, test) in enumerate(folds):
        model = clone_recommender(recommender)
        model.ratings = train
        set_additional_feedback(model, test)
        model.train()
        res = evaluate_ratings(model, test)
        if compute_fit:
            from mymedialite_tpu.eval.rating import compute_fit as _fit
            res["fit"] = _fit(model)
        if show_results:
            print(f"fold {f} {res}")
        fold_results.append(res)
    return RatingPredictionResults.average(fold_results)


def crossvalidate_items(recommender, feedback, num_folds: int = 5,
                        test_users=None, candidate_items=None,
                        candidate_item_mode: str = "OVERLAP",
                        shuffle: bool = False, rng=None,
                        show_results: bool = False):
    folds = crossvalidation_split(feedback, num_folds, shuffle, rng)
    fold_results = []
    for f, (train, test) in enumerate(folds):
        model = clone_recommender(recommender)
        model.feedback = train
        model.train()
        res = evaluate_items(model, test, train, test_users=test_users,
                             candidate_items=candidate_items,
                             candidate_item_mode=candidate_item_mode)
        if show_results:
            print(f"fold {f} {res}")
        fold_results.append(res)
    return ItemRecommendationResults.average(fold_results)


def crossvalidate_rating_based_ranking(recommender, ratings,
                                       num_folds: int = 5,
                                       candidate_items=None,
                                       candidate_item_mode: str = "UNION",
                                       shuffle: bool = False, rng=None,
                                       show_results: bool = False):
    """Reference Eval/RatingBasedRankingCrossValidation.cs: k-fold over the
    rating data, each fold trains the rating predictor and evaluates it
    with the item-recommendation protocol."""
    from mymedialite_tpu.data.arrays import PosOnlyData

    def posonly(data):
        return PosOnlyData(data.users, data.items, num_users=data.num_users,
                           num_items=data.num_items)

    folds = crossvalidation_split(ratings, num_folds, shuffle, rng)
    fold_results = []
    for f, (train, test) in enumerate(folds):
        model = clone_recommender(recommender)
        model.ratings = train
        model.train()
        res = evaluate_items(model, posonly(test), posonly(train),
                             candidate_items=candidate_items,
                             candidate_item_mode=candidate_item_mode)
        if show_results:
            print(f"fold {f} {res}")
        fold_results.append(res)
    return ItemRecommendationResults.average(fold_results)


def iterative_crossvalidate_ratings(recommender, ratings, num_folds: int,
                                    max_iter: int, find_iter: int = 1,
                                    shuffle: bool = False, rng=None,
                                    show_fold_results: bool = False):
    """Iterative CV with a shared iteration counter across folds
    (reference Eval/RatingsCrossValidation.cs:92-171): train each fold to
    the configured num_iter, then iterate all folds in lockstep, printing
    the fold-averaged results line every iteration."""
    import sys

    folds = crossvalidation_split(ratings, num_folds, shuffle, rng)
    models, tests, fold_results = [], [], []
    for f, (train, test) in enumerate(folds):
        model = clone_recommender(recommender)
        model.ratings = train
        set_additional_feedback(model, test)
        model.train()
        res = evaluate_ratings(model, test)
        if show_fold_results:
            print(f"fold {f} {res} iteration {model.num_iter}",
                  file=sys.stderr)
        models.append(model)
        tests.append(test)
        fold_results.append(res)
    print(f"{RatingPredictionResults.average(fold_results)} "
          f"iteration {models[0].num_iter}")

    for it in range(models[0].num_iter + 1, max_iter + 1):
        for f, model in enumerate(models):
            model.iterate()
            if it % find_iter == 0:
                fold_results[f] = evaluate_ratings(model, tests[f])
                if show_fold_results:
                    print(f"fold {f} {fold_results[f]} iteration {it}",
                          file=sys.stderr)
        print(f"{RatingPredictionResults.average(fold_results)} "
              f"iteration {it}")
    return RatingPredictionResults.average(fold_results)


def iterative_crossvalidate_items(recommender, feedback, num_folds: int,
                                  max_iter: int, find_iter: int = 1,
                                  test_users=None, candidate_items=None,
                                  candidate_item_mode: str = "OVERLAP",
                                  shuffle: bool = False, rng=None,
                                  show_fold_results: bool = False):
    """Item-recommendation mirror (reference Eval/ItemsCrossValidation.cs
    DoIterativeCrossValidation :127+)."""
    import sys

    folds = crossvalidation_split(feedback, num_folds, shuffle, rng)
    models, tests, trains, fold_results = [], [], [], []
    for f, (train, test) in enumerate(folds):
        model = clone_recommender(recommender)
        model.feedback = train
        model.train()
        res = evaluate_items(model, test, train, test_users=test_users,
                             candidate_items=candidate_items,
                             candidate_item_mode=candidate_item_mode)
        if show_fold_results:
            print(f"fold {f} {res} iteration {model.num_iter}",
                  file=sys.stderr)
        models.append(model)
        tests.append(test)
        trains.append(train)
        fold_results.append(res)
    print(f"{ItemRecommendationResults.average(fold_results)} "
          f"iteration {models[0].num_iter}")

    for it in range(models[0].num_iter + 1, max_iter + 1):
        for f, model in enumerate(models):
            model.iterate()
            if it % find_iter == 0:
                fold_results[f] = evaluate_items(
                    model, tests[f], trains[f], test_users=test_users,
                    candidate_items=candidate_items,
                    candidate_item_mode=candidate_item_mode)
                if show_fold_results:
                    print(f"fold {f} {fold_results[f]} iteration {it}",
                          file=sys.stderr)
        print(f"{ItemRecommendationResults.average(fold_results)} "
              f"iteration {it}")
    return ItemRecommendationResults.average(fold_results)
