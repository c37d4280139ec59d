"""Golden tests for the dataset-statistics block
(reference Data/Extensions.cs:34-133 format)."""

import numpy as np

from mymedialite_tpu.data.arrays import InteractionData, PosOnlyData, RatingData
from mymedialite_tpu.data.statistics import (
    attribute_statistics, posonly_statistics, ratings_statistics,
)


def test_ratings_statistics_format():
    train = RatingData([0, 0, 1, 2], [0, 1, 1, 2], [5.0, 3.0, 4.0, 1.0])
    # 3 distinct users x 3 distinct items, 4 ratings:
    # sparsity = 100 * (9-4)/9 = 55.55556
    s = ratings_statistics(train)
    assert s == "training data: 3 users, 3 items, 4 ratings, sparsity 55.55556\n"


def test_sparsity_trailing_zero_trim():
    # C# {0,0:0.#####} trims trailing zeros: 4 users x 5 items, 10 ratings
    # -> sparsity 50 (not "50.00000")
    train = RatingData(np.repeat(np.arange(4), [3, 3, 2, 2]),
                       [0, 1, 2, 1, 3, 4, 0, 2, 3, 4],
                       np.ones(10))
    s = ratings_statistics(train)
    assert "sparsity 50\n" in s


def test_test_block_and_overlap():
    train = RatingData([0, 1], [0, 1], [1.0, 2.0])
    test = RatingData([1, 2], [1, 3], [3.0, 4.0])
    s = ratings_statistics(train, test, display_overlap=True)
    lines = s.splitlines()
    assert lines[0].startswith("training data: 2 users, 2 items, 2 ratings")
    # five-space alignment after "test data:" (Extensions.cs:61)
    assert lines[1].startswith("test data:     2 users, 2 items, 2 ratings")
    assert lines[2].startswith("1 new users, 1 new items (")
    assert lines[2].endswith("seconds)")


def test_rating_period_for_timed_data():
    train = RatingData([0, 1], [0, 1], [1.0, 2.0],
                       times=[978300760, 1046454590])
    s = ratings_statistics(train)
    assert ("rating period: 12/31/2000 22:12:40 to 02/28/2003 17:49:50"
            in s)


def test_posonly_uses_events_noun():
    train = PosOnlyData([0, 0, 1], [0, 1, 2])
    s = posonly_statistics(train)
    assert "3 events," in s and "ratings" not in s


def test_attribute_lines():
    # 2 entities, attribute ids {0, 2}: NumberOfColumns = 3 (max id + 1)
    # for the user line, distinct count = 2 for the item line
    # (Extensions.cs:117-133 quirk)
    attrs = InteractionData([0, 0, 1], [0, 2, 2])
    s = attribute_statistics(user_attributes=attrs)
    assert s == ("3 user attributes for 2 users, 3 assignments, "
                 "2 users with attribute assignments\n")
    s = attribute_statistics(item_attributes=attrs)
    assert s == ("2 item attributes for 2 items, 3 assignments, "
                 "2 items with attribute assignments\n")
