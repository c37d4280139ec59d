"""rating_prediction — train/evaluate rating predictors from the shell.

Counterpart of reference ``src/Programs/RatingPrediction/
RatingPrediction.cs:34-442``; same flag names and output-line format
("RMSE 0.9… MAE 0.7… … iteration N"), so the reference's golden-diff
test style (tests/test_rating_prediction.sh) carries over.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from mymedialite_tpu.cli import common
from mymedialite_tpu.data.io import (
    read_movielens_1m_rating_data, read_rating_data, read_timed_rating_data,
)
from mymedialite_tpu.data.splits import (
    chronological_split_ratio, chronological_split_time, simple_split,
)
from mymedialite_tpu.eval.crossval import crossvalidate_ratings
from mymedialite_tpu.eval.online import evaluate_ratings_online
from mymedialite_tpu.eval.rating import compute_fit, evaluate_ratings
from mymedialite_tpu.models.base import IterativeModel
from mymedialite_tpu.models.registry import (
    create_rating_predictor, list_rating_predictors,
)
from mymedialite_tpu.utils.params import configure


def build_parser():
    p = argparse.ArgumentParser(
        prog="rating_prediction",
        description="MyMediaLite-TPU rating prediction")
    common.add_common_options(p)
    p.add_argument("--rating-type", choices=["float", "byte"], default="float")
    p.add_argument("--file-format",
                   choices=["default", "ignore_first_line", "movielens_1m",
                            "kddcup_2011"],
                   default="default")
    p.add_argument("--chronological-split", default=None)
    p.add_argument("--search-hp", action="store_true")
    p.add_argument("--prediction-line", default="{0}\t{1}\t{2}",
                   help="format of the prediction line; {0}, {1}, {2} "
                        "refer to user ID, item ID, and predicted rating")
    p.add_argument("--prediction-header", default=None)
    p.add_argument("--test-no-ratings", action="store_true",
                   help="test file contains no rating column; requires "
                        "--prediction-file")
    return p


def load_ratings(args, path, user_mapping, item_mapping, timed=False):
    if args.file_format == "movielens_1m":
        return read_movielens_1m_rating_data(path, user_mapping, item_mapping)
    ignore_first = args.file_format == "ignore_first_line"
    if timed or args.chronological_split is not None:
        return read_timed_rating_data(path, user_mapping, item_mapping,
                                      ignore_first_line=ignore_first)
    return read_rating_data(path, user_mapping, item_mapping,
                            ignore_first_line=ignore_first)


def write_predictions(recommender, test, path, user_mapping, item_mapping,
                      line_format="{0}\t{1}\t{2}", header=None):
    """Reference RatingPrediction/Extensions.WritePredictions: one
    'user<TAB>item<TAB>prediction' line per test rating; the line layout
    is a composite format string ({0}=user, {1}=item, {2}=prediction)."""
    preds = recommender.predict_batch(test.users, test.items)
    with open(path, "w") as f:
        if header is not None:
            f.write(header + "\n")
        for u, i, p in zip(test.users, test.items, preds):
            f.write(line_format.format(user_mapping.to_original(int(u)),
                                       item_mapping.to_original(int(i)),
                                       f"{p:.6g}") + "\n")


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.handle_info_flags(args, "rating_prediction",
                             ("RMSE", "MAE", "NMAE", "CBD"))
    common.enable_compile_cache()
    common.maybe_start_profile(args)
    timer = common.PhaseTimer()

    name = args.recommender or "BiasedMatrixFactorization"
    try:
        recommender = create_rating_predictor(name)
    except KeyError:
        common.abort(f"Unknown recommender {name!r}. Choose from:\n  " +
                     "\n  ".join(list_rating_predictors()))
    common.seed_everything(args, recommender)
    for opts in (args.recommender_options or []):
        configure(recommender, opts)
    if args.num_iter is not None and hasattr(recommender, "num_iter"):
        recommender.num_iter = args.num_iter

    def show(results):
        # --measures selects which measures ToString displays
        # (reference EvaluationResults.MeasuresToShow)
        if args.measures:
            results.measures_to_show = tuple(
                m.strip() for m in args.measures.split(",") if m.strip())
        return results

    if not args.training_file and not args.load_model:
        common.abort("Please provide either --training-file=FILE or "
                     "--load-model=FILE.")
    if (args.test_file is None and args.test_ratio == 0
            and args.cross_validation == 0
            and args.chronological_split is None
            and args.save_model is None and not args.compute_fit):
        common.abort("Please provide either --test-file=FILE, "
                     "--test-ratio=NUM, --cross-validation=K, "
                     "--chronological-split=NUM|DATETIME, or "
                     "--save-model=FILE.")

    user_mapping, item_mapping = common.make_mappings(args)
    # INeedsMappings (reference ExternalRatingPredictor/ExternalItemRecommender)
    if hasattr(recommender, "user_mapping"):
        recommender.user_mapping = user_mapping
        recommender.item_mapping = item_mapping
    common.wire_side_information(args, recommender, user_mapping, item_mapping)

    # time-aware recommenders need the timestamp column
    # (reference RatingPrediction.LoadData dispatches on
    # ITimeAwareRatingPredictor)
    timed = getattr(recommender, "time_aware", False)

    training_data = None
    test_data = None
    if args.training_file:
        training_data, loading_time = timer.measure("loading", lambda: load_ratings(
            args, common.data_path(args, args.training_file),
            user_mapping, item_mapping, timed=timed))
        print(f"loading_time {loading_time:.2f}", file=sys.stderr)

    if args.test_file:
        if args.test_no_ratings:
            if not args.prediction_file:
                common.abort("--test-no-ratings requires "
                             "--prediction-file=FILE.")
            from mymedialite_tpu.data.io import read_rating_data_no_ratings
            test_data = read_rating_data_no_ratings(
                common.data_path(args, args.test_file),
                user_mapping, item_mapping,
                ignore_first_line=args.file_format == "ignore_first_line")
        else:
            test_data = load_ratings(
                args, common.data_path(args, args.test_file),
                user_mapping, item_mapping, timed=timed)
        # test may reference entities unseen in training
        if training_data is not None:
            n_users = max(training_data.num_users, test_data.num_users)
            n_items = max(training_data.num_items, test_data.num_items)
            training_data = training_data.select(
                np.arange(len(training_data)), n_users, n_items)
        # transductive predictors (SVD++ family) see the test users'
        # rated items as implicit feedback (reference
        # RatingPrediction.cs:424-425)
        if hasattr(recommender, "additional_feedback") and \
                not args.test_no_ratings:
            recommender.additional_feedback = (test_data.users,
                                               test_data.items)
    elif args.test_ratio > 0:
        rng = np.random.default_rng(args.random_seed or 0)
        print(f"test ratio {args.test_ratio}", file=sys.stderr)
        training_data, test_data = simple_split(training_data,
                                                args.test_ratio, rng)
    elif args.chronological_split is not None:
        try:
            ratio = float(args.chronological_split)
            training_data, test_data = chronological_split_ratio(
                training_data, ratio)
        except ValueError:
            from mymedialite_tpu.data.io import _parse_time
            training_data, test_data = chronological_split_time(
                training_data, _parse_time(args.chronological_split))

    if training_data is not None:
        # reference RatingPrediction.cs:200 — dataset statistics go to
        # stdout after splitting, before any training output
        from mymedialite_tpu.data.statistics import ratings_statistics
        print(ratings_statistics(
            training_data, test_data,
            getattr(recommender, "user_attributes", None),
            getattr(recommender, "item_attributes", None)), end="")

    if args.cross_validation > 1:
        print(str(recommender))
        if args.find_iter > 0:
            # iterative CV: shared iteration counter across folds
            # (reference RatingPrediction.cs:211-214,
            # RatingsCrossValidation.cs:92-171)
            from mymedialite_tpu.eval.crossval import (
                iterative_crossvalidate_ratings,
            )
            if not isinstance(recommender, IterativeModel):
                common.abort("Only iterative recommenders support "
                             "--find-iter=N.")
            iterative_crossvalidate_ratings(
                recommender, training_data, args.cross_validation,
                args.max_iter, args.find_iter,
                rng=np.random.default_rng(args.random_seed or 0),
                show_fold_results=args.show_fold_results)
        else:
            results = crossvalidate_ratings(
                recommender, training_data, args.cross_validation,
                compute_fit=args.compute_fit,
                rng=np.random.default_rng(args.random_seed or 0),
                show_results=args.show_fold_results)
            print(str(results))
        timer.report()
        return 0

    if training_data is not None:
        recommender.ratings = training_data
        print("ratings range: "
              f"[{recommender.min_rating}, {recommender.max_rating}]",
              file=sys.stderr)

    if args.load_model:
        recommender.load_model(args.load_model)
        if training_data is not None:
            recommender.ratings = training_data

    # --find-iter convergence-tracking loop (reference
    # RatingPrediction.cs:202-270)
    if args.find_iter > 0:
        if not isinstance(recommender, IterativeModel):
            common.abort("Only iterative recommenders support --find-iter=N.")
        print(str(recommender))
        if args.load_model is None:
            _, t = timer.measure("training", recommender.train)
        results = evaluate_ratings(recommender, test_data)
        print(f"{show(results)} iteration {recommender.num_iter}")
        eval_history = [results["RMSE"]]
        for it in range(recommender.num_iter + 1, args.max_iter + 1):
            _, t = timer.measure("iteration", recommender.iterate)
            if it % args.find_iter == 0:
                if args.compute_fit:
                    print(f"fit {compute_fit(recommender):.5f} iteration {it}")
                results, _ = timer.measure(
                    "evaluation", lambda: evaluate_ratings(recommender, test_data))
                print(f"{show(results)} iteration {it}")
                if args.save_model:
                    recommender.save_model(f"{args.save_model}-it-{it}")
                if args.prediction_file:
                    write_predictions(recommender, test_data,
                                      f"{args.prediction_file}-it-{it}",
                                      user_mapping, item_mapping,
                                      args.prediction_line,
                                      args.prediction_header)
                if args.epsilon > 0 and \
                        results["RMSE"] - min(eval_history) > args.epsilon:
                    print(f"{results['RMSE']} >> {min(eval_history)}",
                          file=sys.stderr)
                    print(f"Reached convergence on training/validation data "
                          f"after {it} iterations.", file=sys.stderr)
                    break
                if args.cutoff is not None and results["RMSE"] > args.cutoff:
                    print(f"Reached cutoff after {it} iterations.",
                          file=sys.stderr)
                    break
                eval_history.append(results["RMSE"])
        timer.report()
        common.save_mappings(args, user_mapping, item_mapping)
        return 0

    # hyperparameter search (reference RatingPrediction.cs:288-292)
    if args.search_hp:
        from mymedialite_tpu.hyperopt import NelderMead
        result = NelderMead("RMSE", recommender,
                            rng=np.random.default_rng(
                                args.random_seed or 42)).find_minimum()
        print(f"estimated quality (on split) {result}", file=sys.stderr)

    # standard single train/eval path (reference RatingPrediction.cs:272-330)
    print(str(recommender), end=" ")
    if args.load_model is None and training_data is not None:
        _, train_seconds = timer.measure("training", recommender.train)
        print(f"training_time {common.fmt_seconds(train_seconds)} ", end="")
    if test_data is not None and not args.test_no_ratings:
        if args.online_evaluation:
            results, eval_seconds = timer.measure(
                "evaluation",
                lambda: evaluate_ratings_online(recommender, test_data))
        else:
            results, eval_seconds = timer.measure(
                "evaluation",
                lambda: evaluate_ratings(recommender, test_data, training_data))
        print(f"{show(results)} testing_time {common.fmt_seconds(eval_seconds)}",
              end="")
    if args.compute_fit:
        print(f"\nfit {compute_fit(recommender):.5f}", end="")
    print()
    if args.prediction_file and test_data is not None:
        write_predictions(recommender, test_data, args.prediction_file,
                          user_mapping, item_mapping,
                          args.prediction_line, args.prediction_header)
    if args.save_model:
        recommender.save_model(args.save_model)
    common.save_mappings(args, user_mapping, item_mapping)
    timer.report()
    return 0


if __name__ == "__main__":
    common.run_program(main)
