"""Cross-validation evaluation.

Counterparts of reference ``Eval/RatingsCrossValidation.cs:36-148`` and
``Eval/ItemsCrossValidation.cs:39-127``: k-fold split, per-fold
clone+train+evaluate, fold-averaged results. Folds run concurrently on
host threads (the reference's ``Parallel.ForEach`` over folds,
``RatingsCrossValidation.cs:41``): each fold owns an independent model,
so one fold's host-side prep overlaps the other folds' device work;
fold results print in fold order after completion.
"""

from __future__ import annotations

import os

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


def run_folds(jobs, parallel: bool = True):
    """Run per-fold closures concurrently (reference ``Parallel.ForEach``
    over CV folds, RatingsCrossValidation.cs:41-68); results in fold
    order. Set parallel=False (or MML_SEQUENTIAL_CV=1) for sequential."""
    if os.environ.get("MML_SEQUENTIAL_CV"):
        parallel = False
    if not parallel or len(jobs) <= 1:
        return [job() for job in jobs]
    from concurrent.futures import ThreadPoolExecutor
    workers = min(len(jobs), os.cpu_count() or 4)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return [f.result() for f in [ex.submit(job) for job in jobs]]


def crossvalidate_ratings(recommender, ratings, num_folds: int = 5,
                          compute_fit: bool = False, shuffle: bool = False,
                          rng=None, show_results: bool = False,
                          parallel: bool = True):
    folds = crossvalidation_split(ratings, num_folds, shuffle, rng)

    def fold_job(train, test):
        def job():
            model = clone_recommender(recommender)
            model.ratings = train
            set_additional_feedback(model, test)
            model.train()
            res = evaluate_ratings(model, test)
            if compute_fit:
                from mymedialite_tpu.eval.rating import compute_fit as _fit
                res["fit"] = _fit(model)
            return res
        return job

    fold_results = run_folds([fold_job(train, test)
                              for train, test in folds], parallel)
    if show_results:
        for f, res in enumerate(fold_results):
            print(f"fold {f} {res}")
    return RatingPredictionResults.average(fold_results)


def crossvalidate_items(recommender, feedback, num_folds: int = 5,
                        test_users=None, candidate_items=None,
                        candidate_item_mode: str = "OVERLAP",
                        shuffle: bool = False, rng=None,
                        show_results: bool = False, parallel: bool = True):
    folds = crossvalidation_split(feedback, num_folds, shuffle, rng)

    def fold_job(train, test):
        def job():
            model = clone_recommender(recommender)
            model.feedback = train
            model.train()
            return evaluate_items(model, test, train, test_users=test_users,
                                  candidate_items=candidate_items,
                                  candidate_item_mode=candidate_item_mode)
        return job

    fold_results = run_folds([fold_job(train, test)
                              for train, test in folds], parallel)
    if show_results:
        for f, res in enumerate(fold_results):
            print(f"fold {f} {res}")
    return ItemRecommendationResults.average(fold_results)


def crossvalidate_rating_based_ranking(recommender, ratings,
                                       num_folds: int = 5,
                                       candidate_items=None,
                                       candidate_item_mode: str = "UNION",
                                       shuffle: bool = False, rng=None,
                                       show_results: bool = False,
                                       parallel: bool = True):
    """Reference Eval/RatingBasedRankingCrossValidation.cs: k-fold over the
    rating data, each fold trains the rating predictor and evaluates it
    with the item-recommendation protocol."""
    from mymedialite_tpu.data.arrays import PosOnlyData

    def posonly(data):
        return PosOnlyData(data.users, data.items, num_users=data.num_users,
                           num_items=data.num_items)

    folds = crossvalidation_split(ratings, num_folds, shuffle, rng)

    def fold_job(train, test):
        def job():
            model = clone_recommender(recommender)
            model.ratings = train
            model.train()
            return evaluate_items(model, posonly(test), posonly(train),
                                  candidate_items=candidate_items,
                                  candidate_item_mode=candidate_item_mode)
        return job

    fold_results = run_folds([fold_job(train, test)
                              for train, test in folds], parallel)
    if show_results:
        for f, res in enumerate(fold_results):
            print(f"fold {f} {res}")
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
    tests = [test for _, test in folds]

    def setup_job(train, test):
        def job():
            model = clone_recommender(recommender)
            model.ratings = train
            set_additional_feedback(model, test)
            model.train()
            return model, evaluate_ratings(model, test)
        return job

    outs = run_folds([setup_job(train, test) for train, test in folds])
    models = [m for m, _ in outs]
    fold_results = [r for _, r in outs]
    if show_fold_results:
        for f, res in enumerate(fold_results):
            print(f"fold {f} {res} iteration {models[0].num_iter}",
                  file=sys.stderr)
    print(f"{RatingPredictionResults.average(fold_results)} "
          f"iteration {models[0].num_iter}")

    def iter_job(model, test, evaluate):
        def job():
            model.iterate()
            return evaluate_ratings(model, test) if evaluate else None
        return job

    for it in range(models[0].num_iter + 1, max_iter + 1):
        ev = it % find_iter == 0
        outs = run_folds([iter_job(m, t, ev)
                          for m, t in zip(models, tests)])
        for f, res in enumerate(outs):
            if res is not None:
                fold_results[f] = res
                if show_fold_results:
                    print(f"fold {f} {res} iteration {it}", file=sys.stderr)
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
    trains = [train for train, _ in folds]
    tests = [test for _, test in folds]

    def eval_fold(model, test, train):
        return evaluate_items(model, test, train, test_users=test_users,
                              candidate_items=candidate_items,
                              candidate_item_mode=candidate_item_mode)

    def setup_job(train, test):
        def job():
            model = clone_recommender(recommender)
            model.feedback = train
            model.train()
            return model, eval_fold(model, test, train)
        return job

    outs = run_folds([setup_job(train, test) for train, test in folds])
    models = [m for m, _ in outs]
    fold_results = [r for _, r in outs]
    if show_fold_results:
        for f, res in enumerate(fold_results):
            print(f"fold {f} {res} iteration {models[0].num_iter}",
                  file=sys.stderr)
    print(f"{ItemRecommendationResults.average(fold_results)} "
          f"iteration {models[0].num_iter}")

    def iter_job(model, test, train, evaluate):
        def job():
            model.iterate()
            return eval_fold(model, test, train) if evaluate else None
        return job

    for it in range(models[0].num_iter + 1, max_iter + 1):
        ev = it % find_iter == 0
        outs = run_folds([iter_job(m, te, tr, ev)
                          for m, te, tr in zip(models, tests, trains)])
        for f, res in enumerate(outs):
            if res is not None:
                fold_results[f] = res
                if show_fold_results:
                    print(f"fold {f} {res} iteration {it}", file=sys.stderr)
        print(f"{ItemRecommendationResults.average(fold_results)} "
              f"iteration {it}")
    return ItemRecommendationResults.average(fold_results)
