"""SVD++ family tests (counterpart of reference Tests/RatingPrediction/
SVDPlusPlusTest.cs and Sigmoid*Test.cs smoke tests + quality sanity)."""

import numpy as np
import pytest

from mymedialite_tpu.data import RatingData
from mymedialite_tpu.data.synthetic import split_ratings, synthetic_ratings
from mymedialite_tpu.eval.rating import evaluate_ratings
from mymedialite_tpu.models.registry import create_rating_predictor

SVDPP_NAMES = [
    "SVDPlusPlus", "SigmoidSVDPlusPlus", "SigmoidItemAsymmetricFactorModel",
    "SigmoidUserAsymmetricFactorModel",
    "SigmoidCombinedAsymmetricFactorModel",
]


def small_ratings():
    users = [0, 0, 0, 1, 1, 1, 2, 3, 4]
    items = [0, 1, 2, 0, 1, 3, 0, 0, 1]
    values = [1.0, 1.5, 3.0, 5.0, 3.5, 1.0, 4.0, 2.0, 4.5]
    return RatingData(users, items, values)


@pytest.fixture(scope="module")
def ml_like():
    data = synthetic_ratings(num_ratings=30000, seed=3)
    return split_ratings(data, seed=4)


class TestSVDPlusPlus:
    @pytest.mark.parametrize("name", SVDPP_NAMES)
    def test_smoke(self, name):
        m = create_rating_predictor(name)
        m.ratings = small_ratings()
        m.num_iter = 2
        m.group_users = 4
        m.train()
        p = m.predict(0, 0)
        assert np.isfinite(p)
        assert m.min_rating <= p <= m.max_rating

    def test_learns(self, ml_like):
        train, test = ml_like
        m = create_rating_predictor("SVDPlusPlus")
        m.ratings = train
        m.num_factors = 8
        m.num_iter = 20
        m.learn_rate = 0.005
        m.train()
        ga = create_rating_predictor("GlobalAverage")
        ga.ratings = train
        ga.train()
        rmse = evaluate_ratings(m, test)["RMSE"]
        rmse_ga = evaluate_ratings(ga, test)["RMSE"]
        assert rmse < rmse_ga - 0.03

    def test_transductive_additional_feedback(self, ml_like):
        train, test = ml_like
        m = create_rating_predictor("SVDPlusPlus")
        m.ratings = train
        m.num_iter = 3
        m.additional_feedback = (test.users, test.items)
        m.train()
        assert np.isfinite(m.predict(int(test.users[0]), int(test.items[0])))

    @pytest.mark.parametrize("name", ["SVDPlusPlus", "SigmoidSVDPlusPlus"])
    def test_save_load(self, name, tmp_path):
        m = create_rating_predictor(name)
        m.ratings = small_ratings()
        m.num_iter = 2
        m.group_users = 4
        m.train()
        users = np.array([0, 1, 2, 3])
        items = np.array([0, 1, 2, 3])
        before = m.predict_batch(users, items)
        path = str(tmp_path / "svdpp.model")
        m.save_model(path)
        m2 = create_rating_predictor(name)
        m2.ratings = small_ratings()
        m2.group_users = 4
        m2.load_model(path)
        np.testing.assert_allclose(before, m2.predict_batch(users, items),
                                   atol=1e-5)

    def test_incremental(self, ml_like):
        train, _ = ml_like
        m = create_rating_predictor("SVDPlusPlus")
        m.ratings = train
        m.num_iter = 2
        m.train()
        new_u = train.num_users
        m.add_ratings([new_u], [0], [4.0])
        assert np.isfinite(m.predict(new_u, 1))
