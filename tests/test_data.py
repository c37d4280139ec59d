"""Data-layer tests (counterpart of reference Tests/Data + Tests/DataType)."""

import numpy as np
import pytest

from mymedialite_tpu.data import (
    IdentityMapping, Mapping, PosOnlyData, RatingData, RatingScale,
    padded_history,
)
from mymedialite_tpu.data.splits import (
    chronological_split_ratio, chronological_split_time,
    crossvalidation_split, per_user_chronological_split, simple_split,
)


def small_ratings():
    # the reference TestUtils.CreateRatings-style fixture
    users = [0, 0, 0, 1, 1, 1, 2, 3, 4]
    items = [0, 1, 2, 0, 1, 3, 0, 0, 1]
    values = [1.0, 1.5, 3.0, 5.0, 3.5, 1.0, 4.0, 2.0, 4.5]
    return RatingData(users, items, values)


class TestRatingData:
    def test_basic(self):
        d = small_ratings()
        assert len(d) == 9
        assert d.num_users == 5
        assert d.num_items == 4
        assert d.average == pytest.approx(np.mean([1, 1.5, 3, 5, 3.5, 1, 4, 2, 4.5]))
        assert d.scale.min == 1.0 and d.scale.max == 5.0

    def test_csr(self):
        d = small_ratings()
        assert list(d.items_by_user(0)) == [0, 1, 2]
        assert list(d.items_by_user(1)) == [0, 1, 3]
        assert list(d.users_by_item(0)) == [0, 1, 2, 3]
        assert list(d.count_by_user) == [3, 3, 1, 1, 1]
        assert list(d.count_by_item) == [4, 3, 1, 1]
        assert d.by_user.contains(0, 2)
        assert not d.by_user.contains(0, 3)

    def test_try_get(self):
        d = small_ratings()
        assert d.try_get(1, 3) == 1.0
        assert d.try_get(2, 3) is None

    def test_add_remove(self):
        d = small_ratings()
        d2 = d.add([2], [3], [2.5])
        assert len(d2) == 10
        assert d2.try_get(2, 3) == 2.5
        d3 = d2.remove_user(0)
        assert len(d3) == 7
        assert d3.try_get(0, 0) is None
        d4 = d2.update([1], [0], [4.0])
        assert d4.try_get(1, 0) == 4.0

    def test_padded_history(self):
        d = small_ratings()
        hist, lens = padded_history(d.by_user)
        assert hist.shape == (5, 3)
        assert list(lens) == [3, 3, 1, 1, 1]
        assert list(hist[0]) == [0, 1, 2]
        assert list(hist[2]) == [0, -1, -1]


class TestPosOnly:
    def test_basic(self):
        f = PosOnlyData([0, 0, 1, 1, 1], [0, 2, 1, 2, 3])
        assert f.contains(0, 2)
        assert not f.contains(0, 1)
        t = f.transpose()
        assert t.num_users == 4 and t.num_items == 2
        assert t.contains(2, 0) and t.contains(2, 1)

    def test_add_remove(self):
        f = PosOnlyData([0, 1], [0, 1])
        f2 = f.add([0], [1])
        assert f2.contains(0, 1)
        f3 = f2.remove([0], [0])
        assert not f3.contains(0, 0)
        assert f3.contains(0, 1)

    def test_dedup_counts(self):
        f = PosOnlyData([0, 0, 1], [0, 0, 0])
        assert list(f.dedup_count_by_item) == [2]


class TestMapping:
    def test_mapping(self):
        m = Mapping()
        assert m.to_internal("a") == 0
        assert m.to_internal("b") == 1
        assert m.to_internal("a") == 0
        assert m.to_original(1) == "b"
        assert m.contains("a") and not m.contains("c")

    def test_save_load(self, tmp_path):
        m = Mapping()
        for x in ["x", "y", "z"]:
            m.to_internal(x)
        p = str(tmp_path / "map.txt")
        m.save(p)
        m2 = Mapping.load(p)
        assert m2.to_internal("y") == 1
        assert len(m2) == 3

    def test_identity(self):
        m = IdentityMapping()
        assert m.to_internal("7") == 7
        assert len(m) == 8
        assert m.to_original(3) == "3"


class TestScale:
    def test_from_values(self):
        s = RatingScale.from_values([3, 1, 5, 3])
        assert s.levels == (1.0, 3.0, 5.0)
        assert s.min == 1 and s.max == 5 and s.range == 4
        assert s.level_id(3.0) == 1


class TestSplits:
    def test_simple_split(self):
        d = small_ratings()
        train, test = simple_split(d, 0.33, np.random.default_rng(1))
        assert len(train) + len(test) == len(d)
        assert len(test) == 3
        # scale is inherited
        assert train.scale == d.scale

    def test_crossvalidation(self):
        d = small_ratings()
        folds = crossvalidation_split(d, 3)
        assert len(folds) == 3
        sizes = [len(t) for _, t in folds]
        assert sum(sizes) == len(d)
        # reference rule: element i in fold i % k
        assert sizes == [3, 3, 3]
        for train, test in folds:
            assert len(train) + len(test) == len(d)

    def test_chronological(self):
        users = [0, 0, 1, 1]
        items = [0, 1, 0, 1]
        values = [1.0, 2.0, 3.0, 4.0]
        times = [100, 50, 200, 150]
        d = RatingData(users, items, values, times=times)
        train, test = chronological_split_ratio(d, 0.5)
        assert len(train) == 2 and len(test) == 2
        assert train.times.max() <= test.times.min()
        train2, test2 = chronological_split_time(d, 150)
        assert len(test2) == 2
        assert (test2.times >= 150).all()

    def test_per_user_chronological(self):
        users = [0, 0, 0, 1, 1]
        items = [0, 1, 2, 0, 1]
        values = [1.0, 2.0, 3.0, 4.0, 5.0]
        times = [3, 1, 2, 10, 5]
        d = RatingData(users, items, values, times=times)
        train, test = per_user_chronological_split(d, num_test_per_user=1)
        assert len(test) == 2
        # latest rating of each user is in test
        assert test.try_get(0, 0) == 1.0  # t=3 is user 0's latest
        assert test.try_get(1, 0) == 4.0  # t=10 is user 1's latest
