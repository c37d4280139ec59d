"""Time-aware baseline tests (reference test_rating_prediction_time.sh
coverage, on synthetic timed data)."""

import numpy as np
import pytest

from mymedialite_tpu.data.synthetic import synthetic_ratings
from mymedialite_tpu.eval.rating import evaluate_ratings
from mymedialite_tpu.models.registry import create_rating_predictor


@pytest.fixture(scope="module")
def timed_data():
    data = synthetic_ratings(num_ratings=20000, num_users=300, num_items=400,
                             seed=21, with_times=True)
    from mymedialite_tpu.data.splits import chronological_split_ratio
    return chronological_split_ratio(data, 0.2)


@pytest.mark.parametrize("name", ["TimeAwareBaseline",
                                  "TimeAwareBaselineWithFrequencies"])
class TestTimeAware:
    def test_trains_and_predicts(self, name, timed_data):
        train, test = timed_data
        m = create_rating_predictor(name)
        m.ratings = train
        m.num_iter = 5
        m.batch_size = 4096
        m.train()
        # time-aware dispatch in the eval (reference Eval/Ratings.cs:105-118)
        res = evaluate_ratings(m, test)
        assert np.isfinite(res["RMSE"])
        ga = create_rating_predictor("GlobalAverage")
        ga.ratings = train
        ga.train()
        # the baseline with biases should not be worse than global average
        assert res["RMSE"] < evaluate_ratings(ga, test)["RMSE"] + 0.05

    def test_plain_predict(self, name, timed_data):
        train, _ = timed_data
        m = create_rating_predictor(name)
        m.ratings = train
        m.num_iter = 2
        m.batch_size = 4096
        m.train()
        assert np.isfinite(m.predict(0, 0))

    def test_save_load(self, name, timed_data, tmp_path):
        """Bit-identical predictions after save -> load, including the
        frequency tables (reference TimeAwareBaselineWithFrequencies.cs:42
        SaveModel)."""
        train, test = timed_data
        m = create_rating_predictor(name)
        m.ratings = train
        m.num_iter = 2
        m.batch_size = 4096
        m.train()
        before = m.predict_batch_time(test.users[:20], test.items[:20],
                                      test.times[:20])
        p = str(tmp_path / "ta.model")
        m.save_model(p)
        m2 = create_rating_predictor(name)
        m2.ratings = train
        m2.load_model(p)
        after = m2.predict_batch_time(test.users[:20], test.items[:20],
                                      test.times[:20])
        np.testing.assert_allclose(before, after, atol=1e-5)

    def test_load_then_iterate(self, name, timed_data, tmp_path):
        """LoadModel then Iterate keeps training without a fresh train()
        (reference Train/Iterate split)."""
        train, test = timed_data
        m = create_rating_predictor(name)
        m.ratings = train
        m.num_iter = 2
        m.batch_size = 4096
        m.train()
        p = str(tmp_path / "ta.model")
        m.save_model(p)
        m2 = create_rating_predictor(name)
        m2.ratings = train
        m2.batch_size = 4096
        m2.load_model(p)
        m2.iterate()
        res = evaluate_ratings(m2, test)
        assert np.isfinite(res["RMSE"])
