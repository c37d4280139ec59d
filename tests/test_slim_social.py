"""SLIM + SocialMF tests."""

import numpy as np
import pytest

from mymedialite_tpu.data import InteractionData, PosOnlyData
from mymedialite_tpu.data.synthetic import (
    split_posonly, split_ratings, synthetic_posonly, synthetic_ratings,
)
from mymedialite_tpu.eval import evaluate_items
from mymedialite_tpu.eval.rating import evaluate_ratings
from mymedialite_tpu.models.registry import (
    create_item_recommender, create_rating_predictor,
)


@pytest.fixture(scope="module")
def implicit_ml_like():
    data = synthetic_posonly(num_events=15000, num_users=400, num_items=600,
                             seed=11)
    return split_posonly(data, seed=12)


class TestLeastSquareSLIM:
    def test_learns(self, implicit_ml_like):
        train, test = implicit_ml_like
        m = create_item_recommender("LeastSquareSLIM")
        m.feedback = train
        m.num_iter = 10
        m.train()
        res = evaluate_items(m, test, train)
        rnd = create_item_recommender("Random")
        rnd.feedback = train
        rnd.train()
        res_rnd = evaluate_items(rnd, test, train)
        assert res["AUC"] > res_rnd["AUC"] + 0.1

    def test_diag_zero_and_sparse(self, implicit_ml_like):
        train, _ = implicit_ml_like
        m = create_item_recommender("LeastSquareSLIM")
        m.feedback = train
        m.num_iter = 3
        m.k = 10
        m.train()
        W = np.asarray(m.W)
        assert np.allclose(np.diag(W), 0.0)
        # feature selection: at most k nonzeros per row
        assert (np.count_nonzero(W, axis=1) <= 10).all()

    def test_save_load(self, implicit_ml_like, tmp_path):
        train, _ = implicit_ml_like
        m = create_item_recommender("LeastSquareSLIM")
        m.feedback = train
        m.num_iter = 2
        m.train()
        users = np.array([0, 1, 2])
        items = np.array([0, 1, 2])
        before = m.predict_batch(users, items)
        p = str(tmp_path / "slim.model")
        m.save_model(p)
        m2 = create_item_recommender("LeastSquareSLIM")
        m2.feedback = train
        m2.load_model(p)
        np.testing.assert_allclose(before, m2.predict_batch(users, items),
                                   atol=1e-5)


class TestBPRSLIM:
    def test_smoke_and_learns(self, implicit_ml_like):
        train, test = implicit_ml_like
        m = create_item_recommender("BPRSLIM")
        m.feedback = train
        m.num_iter = 10
        m.batch_size = 512
        m.train()
        res = evaluate_items(m, test, train)
        rnd = create_item_recommender("Random")
        rnd.feedback = train
        rnd.train()
        res_rnd = evaluate_items(rnd, test, train)
        assert res["AUC"] > res_rnd["AUC"] + 0.05


class TestSocialMF:
    def test_smoke_without_relation(self):
        data = synthetic_ratings(num_ratings=3000, num_users=100,
                                 num_items=120, seed=9)
        train, test = split_ratings(data)
        m = create_rating_predictor("SocialMF")
        m.ratings = train
        m.num_iter = 5
        m.learn_rate = 0.01
        m.train()
        assert np.isfinite(m.predict(0, 0))

    def test_social_pull(self):
        # two users, one rates nothing; trust edge pulls factors together
        data = synthetic_ratings(num_ratings=3000, num_users=100,
                                 num_items=120, seed=10)
        train, test = split_ratings(data)
        m = create_rating_predictor("SocialMF")
        m.ratings = train
        m.num_iter = 100
        m.learn_rate = 0.01  # full-batch GD: small steps, many iterations
        m.social_regularization = 1.0
        # ring of trust relations
        users = np.arange(100)
        m.user_relation = InteractionData(users, (users + 1) % 100)
        m.train()
        res = evaluate_ratings(m, test)
        ga = create_rating_predictor("GlobalAverage")
        ga.ratings = train
        ga.train()
        assert res["RMSE"] < evaluate_ratings(ga, test)["RMSE"]
