"""Correlation kernel + KNN model tests (counterpart of reference
Tests/Correlation/* with hand-computed fixtures)."""

import numpy as np
import pytest

from mymedialite_tpu.data import InteractionData, PosOnlyData, RatingData
from mymedialite_tpu.ops import correlation as corr_ops


class View:
    def __init__(self, users, items):
        self.users = np.asarray(users, dtype=np.int32)
        self.items = np.asarray(items, dtype=np.int32)


class TestBinaryCorrelations:
    # entity 0 has features {0,1,2}; entity 1 has {1,2,3}; overlap = 2
    def data(self):
        return View([0, 0, 0, 1, 1, 1], [0, 1, 2, 1, 2, 3])

    def test_cosine(self):
        c = corr_ops.binary_correlation(self.data(), 2, 4, kind="cosine")
        assert c[0, 0] == 1.0
        assert c[0, 1] == pytest.approx(2 / np.sqrt(9), abs=1e-6)
        assert c[0, 1] == c[1, 0]

    def test_jaccard(self):
        c = corr_ops.binary_correlation(self.data(), 2, 4, kind="jaccard")
        assert c[0, 1] == pytest.approx(2 / (3 + 3 - 2), abs=1e-6)

    def test_conditional_probability(self):
        c = corr_ops.binary_correlation(self.data(), 2, 4,
                                        kind="conditional_probability")
        assert c[0, 1] == pytest.approx(2 / 3, abs=1e-6)

    def test_cooccurrence(self):
        c = corr_ops.binary_correlation(self.data(), 2, 4,
                                        kind="cooccurrence")
        assert c[0, 1] == pytest.approx(2.0, abs=1e-6)
        assert c[0, 0] == 1.0  # driver forces diagonal to 1

    def test_bidirectional(self):
        d = View([0, 0, 1], [0, 1, 0])  # |x|=2, |y|=1, overlap=1
        c = corr_ops.binary_correlation(
            d, 2, 2, kind="bidirectional_conditional_probability", alpha=0.5)
        assert c[0, 1] == pytest.approx((1 / 2) ** 0.5 * (1 / 1) ** 0.5,
                                        abs=1e-6)

    def test_weighted_cosine(self):
        # feature weights w = 1/log2(3+freq); reference Overlap.ComputeWeighted
        # accumulates w^2 into the overlap but w into the entity weights
        # (Overlap.cs:26-56), so identical feature sets give
        # sum(w^2)/sqrt(sum(w)*sum(w)) = w, not 1.
        d = View([0, 0, 1, 1], [0, 1, 0, 1])
        c = corr_ops.binary_correlation(d, 2, 2, kind="cosine", weighted=True)
        w = 1.0 / np.log2(3 + 2)
        assert c[0, 1] == pytest.approx(w, abs=1e-5)


class TestPearson:
    def test_perfect_positive(self):
        # two users rate 3 common items identically (plus noise-free shift)
        d = RatingData([0, 0, 0, 1, 1, 1], [0, 1, 2, 0, 1, 2],
                       [1.0, 2.0, 3.0, 2.0, 3.0, 4.0])
        c = corr_ops.rating_correlation(d, entity="user", kind="pearson")
        assert c[0, 1] == pytest.approx(1.0, abs=1e-5)

    def test_oracle_small(self):
        rng = np.random.default_rng(0)
        users = np.repeat(np.arange(4), 5)
        items = np.tile(np.arange(5), 4)
        vals = rng.integers(1, 6, 20).astype(float)
        d = RatingData(users, items, vals)
        c = corr_ops.rating_correlation(d, entity="user", kind="pearson")
        # oracle: literal single-pass formula (Pearson.cs:91-140)
        for i in range(4):
            for j in range(4):
                if i == j:
                    continue
                ri = {int(it): v for it, v in
                      zip(items[users == i], vals[users == i])}
                rj = {int(it): v for it, v in
                      zip(items[users == j], vals[users == j])}
                common = sorted(set(ri) & set(rj))
                n = len(common)
                x = np.array([ri[k] for k in common])
                y = np.array([rj[k] for k in common])
                num = n * np.sum(x * y) - x.sum() * y.sum()
                den = np.sqrt((n * np.sum(x * x) - x.sum() ** 2) *
                              (n * np.sum(y * y) - y.sum() ** 2))
                expect = 0.0 if den == 0 or n < 2 else num / den
                assert c[i, j] == pytest.approx(expect, abs=1e-4)

    def test_shrinkage(self):
        d = RatingData([0, 0, 1, 1], [0, 1, 0, 1], [1.0, 2.0, 1.0, 2.0])
        c0 = corr_ops.rating_correlation(d, "user", "pearson", shrinkage=0.0)
        c1 = corr_ops.rating_correlation(d, "user", "pearson", shrinkage=1.0)
        # n=2: shrink factor (n-1)/(n-1+1) = 0.5
        assert c1[0, 1] == pytest.approx(c0[0, 1] * 0.5, abs=1e-5)


class TestNearestNeighbors:
    def test_basic(self):
        corr = np.array([[1.0, 0.9, 0.1],
                         [0.9, 1.0, 0.5],
                         [0.1, 0.5, 1.0]], dtype=np.float32)
        nn = corr_ops.nearest_neighbors(corr, 2)
        assert list(nn[0]) == [1, 2]
        assert list(nn[1]) == [0, 2]
        assert list(nn[2]) == [1, 0]
        nn1 = corr_ops.nearest_neighbors(corr, 1)
        assert list(nn1[2]) == [1]


class TestImplicitKNNModels:
    def feedback(self):
        return PosOnlyData([0, 0, 1, 1, 2, 2, 3], [0, 1, 0, 1, 2, 3, 3],
                           num_users=4, num_items=4)

    @pytest.mark.parametrize("name", ["UserKNN", "ItemKNN"])
    def test_smoke_and_sanity(self, name):
        from mymedialite_tpu.models.registry import create_item_recommender
        m = create_item_recommender(name)
        m.feedback = self.feedback()
        m.train()
        # users 0,1 identical -> user 0 should score item 1 high,
        # items 0,1 co-occur -> same from the item side
        assert m.predict(0, 1) >= m.predict(0, 3)
        recs = m.recommend(0, n=2)
        assert len(recs) == 2

    def test_k_inf(self):
        from mymedialite_tpu.models.knn import INF_K, UserKNN
        m = UserKNN()
        m.k = INF_K
        m.feedback = self.feedback()
        m.train()
        assert np.isfinite(m.predict(0, 1))

    def test_attribute_knn(self):
        from mymedialite_tpu.models.knn import ItemAttributeKNN
        m = ItemAttributeKNN()
        m.feedback = self.feedback()
        # items 0,1 share attribute 0; items 2,3 share attribute 1
        m.item_attributes = InteractionData([0, 1, 2, 3], [0, 0, 1, 1])
        m.train()
        assert m.corr[0, 1] == pytest.approx(1.0)
        assert m.corr[0, 2] == pytest.approx(0.0)


class TestRatingKNNModels:
    def ratings(self):
        users = [0, 0, 0, 1, 1, 1, 2, 2, 2]
        items = [0, 1, 2, 0, 1, 2, 0, 1, 2]
        vals = [5.0, 4.0, 1.0, 5.0, 4.0, 1.0, 1.0, 2.0, 5.0]
        return RatingData(users, items, vals)

    @pytest.mark.parametrize("name", ["UserKNN", "ItemKNN"])
    def test_smoke(self, name):
        from mymedialite_tpu.models.registry import create_rating_predictor
        m = create_rating_predictor(name)
        m.ratings = self.ratings()
        m.train()
        p = m.predict(0, 0)
        assert m.min_rating <= p <= m.max_rating

    def test_user_knn_uses_neighbors(self):
        # users 0 and 1 agree perfectly; user 2 disagrees.
        # prediction for user 0 should be pulled toward user 1's ratings.
        from mymedialite_tpu.models.registry import create_rating_predictor
        data = RatingData([0, 0, 1, 1, 1, 2, 2, 2],
                          [0, 1, 0, 1, 2, 0, 1, 2],
                          [5.0, 4.0, 5.0, 4.0, 5.0, 1.0, 2.0, 1.0])
        m = create_rating_predictor("UserKNN")
        m.ratings = data
        m.train()
        # user 0 hasn't rated item 2; neighbor user 1 rated it 5
        assert m.predict(0, 2) > m.predict(2, 2)

    def test_save_load(self, tmp_path):
        from mymedialite_tpu.models.registry import create_rating_predictor
        m = create_rating_predictor("ItemKNN")
        m.ratings = self.ratings()
        m.train()
        users = np.array([0, 1, 2])
        items = np.array([2, 0, 1])
        before = m.predict_batch(users, items)
        path = str(tmp_path / "knn.model")
        m.save_model(path)
        m2 = create_rating_predictor("ItemKNN")
        m2.ratings = self.ratings()
        m2.load_model(path)
        np.testing.assert_allclose(before, m2.predict_batch(users, items),
                                   atol=1e-5)


class TestSimilarityProviders:
    """Reference IUserSimilarityProvider.cs / IItemSimilarityProvider.cs:
    KNN models expose pairwise similarity + most-similar-entity lists."""

    def test_implicit_user_knn(self):
        from mymedialite_tpu.models.registry import create_item_recommender
        m = create_item_recommender("UserKNN")
        # users 0,1 share items {0,1}; user 2 shares only item 0 with them
        m.feedback = PosOnlyData([0, 0, 1, 1, 2], [0, 1, 0, 1, 0])
        m.train()
        s01 = m.get_user_similarity(0, 1)
        s02 = m.get_user_similarity(0, 2)
        assert s01 > s02 > 0
        assert list(m.get_most_similar_users(0, 2)) == [1, 2]

    def test_implicit_item_knn(self):
        from mymedialite_tpu.models.registry import create_item_recommender
        m = create_item_recommender("ItemKNN")
        m.feedback = PosOnlyData([0, 0, 1, 1, 2], [0, 1, 0, 1, 2])
        m.train()
        assert m.get_item_similarity(0, 1) > m.get_item_similarity(0, 2)
        assert m.get_most_similar_items(0, 1)[0] == 1

    def test_rating_user_knn(self):
        from mymedialite_tpu.models.registry import create_rating_predictor
        m = create_rating_predictor("UserKNN")
        m.ratings = RatingData([0, 0, 1, 1, 1, 2, 2, 2],
                               [0, 1, 0, 1, 2, 0, 1, 2],
                               [5.0, 4.0, 5.0, 4.0, 5.0, 1.0, 2.0, 1.0])
        m.train()
        # users 0 and 1 agree perfectly -> most similar
        assert m.get_user_similarity(0, 1) > m.get_user_similarity(0, 2)
        assert m.get_most_similar_users(0, 1)[0] == 1


class TestStreamingTopK:
    """The scale path (binary_correlation_topk / rating_correlation_topk):
    tiled device computation with running per-row top-k must reproduce
    the dense path's neighbor values and (up to ties) ids, for every
    measure and chunk size (reference Overlap.cs:26-80 semantics at
    shapes where [N, N] is impossible)."""

    @staticmethod
    def _dense_topk(corr, k):
        ids = corr_ops.nearest_neighbors(corr, k)
        return ids, corr[np.arange(corr.shape[0])[:, None], ids]

    @staticmethod
    def _check(ids_t, vals_t, ids_d, vals_d, atol):
        np.testing.assert_allclose(vals_t, vals_d, atol=atol)
        diff = ids_t != ids_d
        if diff.any():  # ids may differ only where the values tie
            assert np.allclose(vals_t[diff], vals_d[diff], atol=atol)

    @pytest.fixture(scope="class")
    def coo(self):
        rng = np.random.default_rng(7)
        n, m, nnz = 157, 83, 2500
        return View(rng.integers(0, n, nnz), rng.integers(0, m, nnz)), n, m

    @pytest.mark.parametrize("kind", ["cosine", "jaccard",
                                      "conditional_probability",
                                      "bidirectional_conditional_probability",
                                      "cooccurrence"])
    @pytest.mark.parametrize("weighted", [False, True])
    def test_binary_matches_dense(self, coo, kind, weighted):
        d, n, m = coo
        dense = corr_ops.binary_correlation(d, n, m, kind=kind, alpha=0.3,
                                            weighted=weighted)
        for k in (5, 40):
            ids_d, vals_d = self._dense_topk(dense, k)
            for chunk in (32, 157):
                ids_t, vals_t = corr_ops.binary_correlation_topk(
                    d, n, m, k, kind=kind, alpha=0.3, weighted=weighted,
                    chunk=chunk)
                self._check(ids_t, vals_t, ids_d, vals_d, 2e-5)

    @pytest.mark.parametrize("kind", ["pearson", "cosine"])
    @pytest.mark.parametrize("entity", ["user", "item"])
    def test_rating_matches_dense(self, coo, kind, entity):
        d, n, m = coo
        rng = np.random.default_rng(8)
        vals = rng.choice([1.0, 1.5, 2, 2.5, 3, 3.5, 4, 4.5, 5],
                          d.users.size)
        r = RatingData(d.users, d.items, vals)
        # scale is equally spaced -> exact int8 level path
        assert corr_ops._quantize_levels(vals, kind == "pearson") is not None
        dense = corr_ops.rating_correlation(r, entity=entity, kind=kind,
                                            shrinkage=5.0)
        ids_d, vals_d = self._dense_topk(dense, 10)
        for chunk in (48, dense.shape[0]):
            ids_t, vals_t = corr_ops.rating_correlation_topk(
                r, 10, entity=entity, kind=kind, shrinkage=5.0, chunk=chunk)
            self._check(ids_t, vals_t, ids_d, vals_d, 3e-5)

    def test_rating_f32_fallback(self, coo):
        """Continuous values can't be level-encoded -> float32 tiles
        (approximate to fp-summation-order)."""
        d, n, m = coo
        rng = np.random.default_rng(9)
        vals = rng.normal(3.0, 1.0, d.users.size)
        r = RatingData(d.users, d.items, vals)
        assert corr_ops._quantize_levels(vals, True) is None
        dense = corr_ops.rating_correlation(r, entity="user", kind="pearson")
        ids_d, vals_d = self._dense_topk(dense, 10)
        ids_t, vals_t = corr_ops.rating_correlation_topk(
            r, 10, entity="user", kind="pearson", chunk=64)
        self._check(ids_t, vals_t, ids_d, vals_d, 1e-3)


class TestTopKModelMode:
    """KNN models above DENSE_NMAX entities: top-k storage, sparse
    scoring, save/load. Forced here by shrinking the threshold."""

    @pytest.fixture()
    def small_limit(self, monkeypatch):
        monkeypatch.setattr(corr_ops, "DENSE_NMAX", 8)

    @staticmethod
    def _implicit_data():
        rng = np.random.default_rng(11)
        return PosOnlyData(rng.integers(0, 60, 700), rng.integers(0, 45, 700))

    @staticmethod
    def _rating_data():
        rng = np.random.default_rng(12)
        return RatingData(rng.integers(0, 60, 900), rng.integers(0, 45, 900),
                          rng.choice([1.0, 2, 3, 4, 5], 900))

    @pytest.mark.parametrize("name", ["UserKNN", "ItemKNN"])
    def test_implicit_scores_match_dense(self, name, small_limit):
        from mymedialite_tpu.models.registry import create_item_recommender
        fb = self._implicit_data()
        m_sparse = create_item_recommender(name)
        m_sparse.feedback = fb
        m_sparse.k = 12
        m_sparse.train()
        assert m_sparse.is_topk
        corr_ops.DENSE_NMAX = 16_384
        m_dense = create_item_recommender(name)
        m_dense.feedback = fb
        m_dense.k = 12
        m_dense.train()
        assert not m_dense.is_topk
        users = np.arange(20)
        np.testing.assert_allclose(m_sparse.score_catalog(users),
                                   m_dense.score_catalog(users), atol=2e-5)

    @pytest.mark.parametrize("name", ["UserKNN", "ItemKNN"])
    def test_rating_predictions_match_dense(self, name, small_limit):
        from mymedialite_tpu.models.registry import create_rating_predictor
        data = self._rating_data()
        m_sparse = create_rating_predictor(name)
        m_sparse.ratings = data
        m_sparse.k = 20       # k_store = 60 >= N-1: truncation-free
        m_sparse.train()
        assert m_sparse.is_topk
        corr_ops.DENSE_NMAX = 16_384
        m_dense = create_rating_predictor(name)
        m_dense.ratings = data
        m_dense.k = 20
        m_dense.train()
        users = np.arange(30) % 60
        items = (np.arange(30) * 7) % 45
        np.testing.assert_allclose(m_sparse.predict_batch(users, items),
                                   m_dense.predict_batch(users, items),
                                   atol=2e-5)

    def test_topk_save_load_roundtrip(self, small_limit, tmp_path):
        from mymedialite_tpu.models.registry import create_item_recommender
        m = create_item_recommender("ItemKNN")
        m.feedback = self._implicit_data()
        m.k = 10
        m.train()
        assert m.is_topk
        users = np.arange(15)
        before = m.score_catalog(users)
        path = str(tmp_path / "knn-topk.model")
        m.save_model(path)
        m2 = create_item_recommender("ItemKNN")
        m2.feedback = self._implicit_data()
        m2.k = 10
        m2.load_model(path)
        assert m2.is_topk
        np.testing.assert_allclose(before, m2.score_catalog(users), atol=0)

    def test_similarity_providers_topk(self, monkeypatch):
        from mymedialite_tpu.models.registry import create_item_recommender
        monkeypatch.setattr(corr_ops, "DENSE_NMAX", 2)
        m = create_item_recommender("UserKNN")
        m.feedback = PosOnlyData([0, 0, 1, 1, 2] * 4,
                                 [0, 1, 0, 1, 0] * 4)
        m.train()
        assert m.is_topk
        assert m.get_user_similarity(0, 1) > m.get_user_similarity(0, 2) > 0
        assert list(m.get_most_similar_users(0, 2)) == [1, 2]

    def test_sumup_rejected_at_scale(self, small_limit):
        from mymedialite_tpu.models.knn import INF_K
        from mymedialite_tpu.models.registry import create_item_recommender
        m = create_item_recommender("UserKNN")
        m.feedback = self._implicit_data()
        m.k = INF_K
        with pytest.raises(ValueError, match="SumUp"):
            m.train()
