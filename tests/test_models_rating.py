"""Rating-predictor model tests (counterpart of reference
Tests/RatingPrediction/*: MatrixFactorizationTest learn-rate decay,
save->load->identical-predictions sweep, baselines)."""

import numpy as np
import pytest

from mymedialite_tpu.data import RatingData
from mymedialite_tpu.data.synthetic import split_ratings, synthetic_ratings
from mymedialite_tpu.eval.rating import evaluate_ratings
from mymedialite_tpu.models.registry import (
    create_rating_predictor, list_rating_predictors,
)
from mymedialite_tpu.utils.params import configure


def small_ratings():
    users = [0, 0, 0, 1, 1, 1, 2, 3, 4]
    items = [0, 1, 2, 0, 1, 3, 0, 0, 1]
    values = [1.0, 1.5, 3.0, 5.0, 3.5, 1.0, 4.0, 2.0, 4.5]
    return RatingData(users, items, values)


@pytest.fixture(scope="module")
def ml_like():
    data = synthetic_ratings(num_ratings=30000, seed=3)
    return split_ratings(data, seed=4)


class TestBaselines:
    @pytest.mark.parametrize("name", ["GlobalAverage", "UserAverage",
                                      "ItemAverage", "UserItemBaseline",
                                      "Constant", "Random"])
    def test_train_predict(self, name):
        m = create_rating_predictor(name)
        m.ratings = small_ratings()
        m.train()
        p = m.predict(0, 0)
        assert np.isfinite(p)
        batch = m.predict_batch(np.array([0, 1, 2]), np.array([0, 1, 0]))
        assert batch.shape == (3,)

    def test_global_average_value(self):
        m = create_rating_predictor("GlobalAverage")
        m.ratings = small_ratings()
        m.train()
        assert m.predict(0, 0) == pytest.approx(small_ratings().average, abs=1e-6)

    def test_user_average(self):
        m = create_rating_predictor("UserAverage")
        m.ratings = small_ratings()
        m.train()
        assert m.predict(0, 99) == pytest.approx((1.0 + 1.5 + 3.0) / 3, abs=1e-6)
        # unseen user -> global average
        assert m.predict(99, 0) == pytest.approx(small_ratings().average, abs=1e-6)

    def test_user_item_baseline_beats_global(self, ml_like):
        train, test = ml_like
        uib = create_rating_predictor("UserItemBaseline")
        uib.ratings = train
        uib.train()
        ga = create_rating_predictor("GlobalAverage")
        ga.ratings = train
        ga.train()
        rmse_uib = evaluate_ratings(uib, test)["RMSE"]
        rmse_ga = evaluate_ratings(ga, test)["RMSE"]
        assert rmse_uib < rmse_ga - 0.02


class TestMatrixFactorization:
    def test_learn_rate_decay(self):
        # reference Tests/RatingPrediction/MatrixFactorizationTest.cs:
        # current_learnrate multiplies by decay each iterate
        m = create_rating_predictor("MatrixFactorization")
        m.ratings = small_ratings()
        m.learn_rate = 0.1
        m.learn_rate_decay = 0.5
        m.num_iter = 1
        m.batch_size = 16
        m.train()
        assert m.current_learnrate == pytest.approx(0.05)
        m.iterate()
        assert m.current_learnrate == pytest.approx(0.025)

    def test_default_echo(self):
        m = create_rating_predictor("BiasedMatrixFactorization")
        s = str(m)
        assert s.startswith("BiasedMatrixFactorization ")
        assert "num_factors=10" in s
        assert "loss=RMSE" in s
        assert "learn_rate_decay=1" in s

    def test_configure(self):
        m = create_rating_predictor("BiasedMatrixFactorization")
        configure(m, "num_factors=20 reg_u=0.1 loss=LogisticLoss bold_driver=true")
        assert m.num_factors == 20
        assert m.reg_u == pytest.approx(0.1)
        assert m.loss.value == "LogisticLoss"
        assert m.bold_driver is True
        # 'regularization' fans out to both
        configure(m, "regularization=0.05")
        assert m.reg_u == pytest.approx(0.05)
        assert m.reg_i == pytest.approx(0.05)

    def test_learns(self, ml_like):
        train, test = ml_like
        m = create_rating_predictor("BiasedMatrixFactorization")
        m.ratings = train
        m.num_factors = 8
        m.num_iter = 15
        m.batch_size = 4096
        m.train()
        ga = create_rating_predictor("GlobalAverage")
        ga.ratings = train
        ga.train()
        rmse = evaluate_ratings(m, test)["RMSE"]
        rmse_ga = evaluate_ratings(ga, test)["RMSE"]
        assert rmse < rmse_ga - 0.05
        # predictions stay in scale bounds
        p = m.predict_batch(test.users, test.items)
        assert (p >= train.scale.min).all() and (p <= train.scale.max).all()

    def test_bold_driver_runs(self):
        m = create_rating_predictor("BiasedMatrixFactorization")
        m.ratings = small_ratings()
        m.bold_driver = True
        m.num_iter = 3
        m.batch_size = 16
        m.train()
        assert np.isfinite(m.compute_objective())

    def test_incremental_add_user(self, ml_like):
        train, _ = ml_like
        m = create_rating_predictor("BiasedMatrixFactorization")
        m.ratings = train
        m.num_iter = 2
        m.batch_size = 4096
        m.train()
        new_u = train.num_users  # brand-new user
        m.add_ratings([new_u, new_u], [0, 1], [5.0, 4.0])
        p = m.predict(new_u, 0)
        assert np.isfinite(p)
        assert m.ratings.try_get(new_u, 0) == 5.0

    def test_fold_in(self, ml_like):
        train, _ = ml_like
        m = create_rating_predictor("BiasedMatrixFactorization")
        m.ratings = train
        m.num_iter = 3
        m.batch_size = 4096
        m.train()
        scored = m.score_items_foldin([(0, 5.0), (1, 4.0)], [2, 3, 4])
        assert len(scored) == 3
        assert all(np.isfinite(s) for _, s in scored)


# Random has no deterministic predictions; time-aware models need timed
# data (tested in test_time_aware.py); External* serve from files
_ROUNDTRIP_SKIP = ("Random", "TimeAwareBaseline",
                   "TimeAwareBaselineWithFrequencies",
                   "ExternalRatingPredictor")


class TestSaveLoadRoundTrip:
    """The determinism oracle (reference tests/test_load_save.sh and
    ItemRecommendersTest.cs:62+): save -> load -> identical predictions."""

    @staticmethod
    def _give_attributes(m):
        from mymedialite_tpu.data import InteractionData
        if hasattr(m, "user_attributes"):
            m.user_attributes = InteractionData([0, 1, 2, 3, 4],
                                                [0, 1, 0, 1, 0])
        if hasattr(m, "item_attributes"):
            m.item_attributes = InteractionData([0, 1, 2, 3], [0, 0, 1, 1])

    @pytest.mark.parametrize("name", [n for n in list_rating_predictors()
                                      if n not in _ROUNDTRIP_SKIP])
    def test_roundtrip(self, name, tmp_path):
        train = small_ratings()
        m = create_rating_predictor(name)
        m.ratings = train
        self._give_attributes(m)
        if hasattr(m, "num_iter"):
            m.num_iter = 2
        if hasattr(m, "batch_size"):
            m.batch_size = 16
        m.train()
        users = np.array([0, 1, 2, 3, 4], dtype=np.int32)
        items = np.array([0, 1, 2, 3, 0], dtype=np.int32)
        before = m.predict_batch(users, items)

        path = str(tmp_path / f"{name}.model")
        m.save_model(path)

        m2 = create_rating_predictor(name)
        m2.ratings = train
        self._give_attributes(m2)
        m2.load_model(path)
        after = m2.predict_batch(users, items)
        np.testing.assert_allclose(before, after, rtol=0, atol=1e-6)


class TestLoadThenIterate:
    """LoadModel then Iterate keeps training without a fresh train()
    (reference MatrixFactorization.cs Train/Iterate split: the CLI's
    --load-model + --find-iter flow)."""

    @pytest.mark.parametrize("name", [n for n in list_rating_predictors()
                                      if n not in _ROUNDTRIP_SKIP])
    def test_iterate_after_load(self, name, tmp_path):
        train = small_ratings()
        m = create_rating_predictor(name)
        if not hasattr(m, "iterate"):
            pytest.skip("not an iterative model")
        m.ratings = train
        TestSaveLoadRoundTrip._give_attributes(m)
        if hasattr(m, "num_iter"):
            m.num_iter = 2
        if hasattr(m, "batch_size"):
            m.batch_size = 16
        m.train()
        obj_trained = m.compute_objective() if hasattr(
            m, "compute_objective") else float("nan")
        path = str(tmp_path / f"{name}.model")
        m.save_model(path)

        m2 = create_rating_predictor(name)
        m2.ratings = train
        TestSaveLoadRoundTrip._give_attributes(m2)
        if hasattr(m2, "batch_size"):
            m2.batch_size = 16
        m2.load_model(path)
        m2.iterate()                      # must not crash
        users = np.array([0, 1, 2, 3, 4], dtype=np.int32)
        items = np.array([0, 1, 2, 3, 0], dtype=np.int32)
        assert np.all(np.isfinite(m2.predict_batch(users, items)))
        if np.isfinite(obj_trained):
            # models with a real objective must keep providing it
            assert np.isfinite(m2.compute_objective())


class TestOnlineEvalFastPath:
    """The buffered + chunked-predict prequential path (eval/online.py,
    reference RatingsOnline.cs:35-80) must produce the same results as
    the per-event path, and fold the events into the dataset at the end."""

    def _data(self):
        from mymedialite_tpu.data.synthetic import (
            split_ratings, synthetic_ratings,
        )
        data = synthetic_ratings(num_ratings=6000, seed=15)
        return split_ratings(data, seed=16)

    def _model(self, train, name="BiasedMatrixFactorization"):
        m = create_rating_predictor(name)
        m.num_iter = 3
        m.num_factors = 4
        m.random_seed = 9
        m.ratings = train
        m.train()
        return m

    @pytest.mark.parametrize("name", ["MatrixFactorization",
                                      "BiasedMatrixFactorization",
                                      "UserItemBaseline"])
    def test_fast_matches_per_event_path(self, name):
        from mymedialite_tpu.eval.online import evaluate_ratings_online
        train, test = self._data()
        fast = self._model(train, name)
        assert fast.SUPPORTS_ONLINE_BUFFER and fast.ONLINE_PREDICT_ROW_LOCAL
        r_fast = evaluate_ratings_online(fast, test)
        slow = self._model(train, name)
        slow.SUPPORTS_ONLINE_BUFFER = False
        slow.ONLINE_PREDICT_ROW_LOCAL = False
        r_slow = evaluate_ratings_online(slow, test)
        for k in ("RMSE", "MAE", "NMAE", "CBD"):
            assert abs(r_fast[k] - r_slow[k]) < 1e-5, (k, r_fast, r_slow)

    def test_events_fold_into_dataset(self):
        from mymedialite_tpu.eval.online import evaluate_ratings_online
        train, test = self._data()
        m = self._model(train)
        evaluate_ratings_online(m, test)
        assert len(m.ratings) == len(train) + len(test)
        assert not m._online_active
        # iterate() after online eval must see the folded-in data
        m.iterate()
        assert np.isfinite(m.predict(0, 0))


class TestMXUEpochPath:
    """The Pallas MXU one-hot-matmul epoch (ops/pallas_sgd.py), forced
    into interpret mode on CPU: the model auto-selects it on TPU
    (models/mf.py _mxu_mode); kernel numerics vs numpy are covered by
    exp_mxu.py --check."""

    def test_model_trains_through_mxu_path(self, monkeypatch):
        from mymedialite_tpu.data.synthetic import (
            split_ratings, synthetic_ratings,
        )
        from mymedialite_tpu.eval.rating import evaluate_ratings
        monkeypatch.setenv("MML_MXU", "interpret")
        data = synthetic_ratings(num_ratings=2000, num_users=60,
                                 num_items=40, seed=21)
        train, test = split_ratings(data, seed=22)
        m = create_rating_predictor("BiasedMatrixFactorization")
        m.num_factors = 4
        m.num_iter = 3
        m.random_seed = 5
        m.ratings = train
        m.train()
        assert m._mxu_plan is not None  # the MXU path actually engaged
        res = evaluate_ratings(m, test)
        ga = create_rating_predictor("GlobalAverage")
        ga.ratings = train
        ga.train()
        assert res["RMSE"] < evaluate_ratings(ga, test)["RMSE"] + 0.02
        # save/load stays bit-identical through the layout conversions
        pred = m.predict_batch(np.arange(10), np.arange(10))
        assert np.isfinite(pred).all()
