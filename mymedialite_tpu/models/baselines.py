"""Trivial / baseline rating predictors.

TPU-native counterparts of reference ``RatingPrediction/{GlobalAverage,
UserAverage, ItemAverage, EntityAverage, Constant, Random,
UserItemBaseline}.cs``. All support incremental updates.
"""

from __future__ import annotations

import numpy as np

from mymedialite_tpu.io.model_io import ModelReader, ModelWriter
from mymedialite_tpu.models.base import IncrementalRatingPredictor, IterativeModel


class GlobalAverage(IncrementalRatingPredictor):
    """Predicts the global rating average (reference GlobalAverage.cs)."""

    def __init__(self):
        super().__init__()
        self.global_average = 0.0

    def train(self):
        self.global_average = self.ratings.average

    def can_predict(self, user_id, item_id):
        return True

    def predict_batch(self, users, items):
        return np.full(np.asarray(users).shape, self.global_average,
                       dtype=np.float32)

    def _retrain(self, users, items):
        self.global_average = self.ratings.average

    def save_model(self, path):
        with ModelWriter(path, type(self).__name__, "2.99") as w:
            w.scalar(self.global_average)

    def load_model(self, path):
        with ModelReader(path, type(self).__name__) as r:
            self.global_average = r.scalar()


class _EntityAverage(IncrementalRatingPredictor):
    """Per-entity average with global-average fallback
    (reference EntityAverage.cs:25-80)."""

    ENTITY = "user"  # or "item"

    def __init__(self):
        super().__init__()
        self.entity_averages = np.zeros(0, dtype=np.float32)
        self.global_average = 0.0

    def _entity_ids(self):
        return self.ratings.users if self.ENTITY == "user" else self.ratings.items

    def _num_entities(self):
        return self.ratings.num_users if self.ENTITY == "user" \
            else self.ratings.num_items

    def train(self):
        n = self._num_entities()
        ids = self._entity_ids()
        sums = np.zeros(n, dtype=np.float64)
        counts = np.zeros(n, dtype=np.int64)
        np.add.at(sums, ids, self.ratings.values)
        np.add.at(counts, ids, 1)
        self.global_average = self.ratings.average
        self.entity_averages = np.where(
            counts > 0, sums / np.maximum(counts, 1), self.global_average
        ).astype(np.float32)

    def can_predict(self, user_id, item_id):
        return True

    def predict_batch(self, users, items):
        ids = np.asarray(users if self.ENTITY == "user" else items,
                         dtype=np.int64)
        n = self.entity_averages.shape[0]
        out = np.full(ids.shape, self.global_average, dtype=np.float32)
        ok = (ids >= 0) & (ids < n)
        out[ok] = self.entity_averages[ids[ok]]
        return out

    def _retrain(self, users, items):
        self.train()

    def save_model(self, path):
        with ModelWriter(path, type(self).__name__, "2.99") as w:
            w.scalar(self.global_average)
            w.vector(self.entity_averages)

    def load_model(self, path):
        with ModelReader(path, type(self).__name__) as r:
            self.global_average = r.scalar()
            self.entity_averages = r.vector()


class UserAverage(_EntityAverage):
    """Reference UserAverage.cs."""
    ENTITY = "user"


class ItemAverage(_EntityAverage):
    """Reference ItemAverage.cs."""
    ENTITY = "item"


class Constant(IncrementalRatingPredictor):
    """Always predicts a constant (reference Constant.cs; default 1.0)."""

    HYPERPARAMS = {"constant_rating": float}

    def __init__(self):
        super().__init__()
        self.constant_rating = 1.0

    def train(self):
        pass

    def can_predict(self, user_id, item_id):
        return True

    def predict_batch(self, users, items):
        return np.full(np.asarray(users).shape, self.constant_rating,
                       dtype=np.float32)

    def save_model(self, path):
        pass

    def load_model(self, path):
        pass


class RandomRating(IncrementalRatingPredictor):
    """Uniform random predictions on the rating scale
    (reference RatingPrediction/Random.cs)."""

    def __init__(self):
        super().__init__()
        self.random_seed = 42
        self._rng = np.random.default_rng(42)

    def train(self):
        self._rng = np.random.default_rng(self.random_seed)

    def can_predict(self, user_id, item_id):
        return True

    def predict_batch(self, users, items):
        n = np.asarray(users).shape
        return (self.min_rating + self._rng.random(n) *
                (self.max_rating - self.min_rating)).astype(np.float32)

    def save_model(self, path):
        pass

    def load_model(self, path):
        pass


class UserItemBaseline(IncrementalRatingPredictor, IterativeModel):
    """Koren's mu + b_u + b_i baseline, alternating closed-form updates with
    regularization (reference UserItemBaseline.cs:28-140; RegU=15, RegI=10,
    NumIter=10). Vectorized: each half-step is one bincount-style reduction."""

    HYPERPARAMS = {"reg_u": float, "reg_i": float, "num_iter": int}

    def __init__(self):
        super().__init__()
        self.reg_u = 15.0
        self.reg_i = 10.0
        self.num_iter = 10
        self.global_average = 0.0
        self.user_biases = np.zeros(0, dtype=np.float32)
        self.item_biases = np.zeros(0, dtype=np.float32)

    def train(self):
        self.global_average = self.ratings.average
        self.user_biases = np.zeros(self.ratings.num_users, dtype=np.float32)
        self.item_biases = np.zeros(self.ratings.num_items, dtype=np.float32)
        for _ in range(self.num_iter):
            self.iterate()

    def iterate(self):
        # order matters: items first, then users (reference Iterate :98-102)
        self._optimize(self.item_biases, self.ratings.items, self.ratings.users,
                       self.user_biases, self.reg_i)
        self._optimize(self.user_biases, self.ratings.users, self.ratings.items,
                       self.item_biases, self.reg_u)

    def _optimize(self, biases, ids, other_ids, other_biases, reg):
        n = biases.shape[0]
        resid = self.ratings.values - self.global_average - other_biases[other_ids]
        sums = np.zeros(n, dtype=np.float64)
        counts = np.zeros(n, dtype=np.int64)
        np.add.at(sums, ids, resid)
        np.add.at(counts, ids, 1)
        biases[:] = np.where(counts > 0, sums / (reg + counts), 0.0)

    def can_predict(self, user_id, item_id):
        return True

    def predict_batch(self, users, items):
        users = np.asarray(users, dtype=np.int64)
        items = np.asarray(items, dtype=np.int64)
        bu = np.zeros(users.shape, dtype=np.float32)
        bi = np.zeros(items.shape, dtype=np.float32)
        ok_u = (users >= 0) & (users < self.user_biases.shape[0])
        ok_i = (items >= 0) & (items < self.item_biases.shape[0])
        bu[ok_u] = self.user_biases[users[ok_u]]
        bi[ok_i] = self.item_biases[items[ok_i]]
        return np.clip(self.global_average + bu + bi,
                       self.min_rating, self.max_rating).astype(np.float32)

    def score_catalog(self, users):
        users = np.clip(np.asarray(users, dtype=np.int64), 0,
                        max(self.user_biases.shape[0] - 1, 0))
        raw = (self.global_average + self.user_biases[users][:, None]
               + self.item_biases[None, :])
        return np.clip(raw, self.min_rating, self.max_rating).astype(np.float32)

    def _retrain(self, users, items):
        if self.user_biases.size == 0:
            return
        if self.ratings.num_users > self.user_biases.shape[0]:
            self.user_biases = np.resize(self.user_biases, self.ratings.num_users)
        if self.ratings.num_items > self.item_biases.shape[0]:
            self.item_biases = np.resize(self.item_biases, self.ratings.num_items)
        # one alternating refresh (reference RetrainUser/RetrainItem)
        self.iterate()

    def save_model(self, path):
        with ModelWriter(path, type(self).__name__, "2.99") as w:
            w.scalar(self.global_average)
            w.vector(self.user_biases)
            w.vector(self.item_biases)

    def load_model(self, path):
        with ModelReader(path, type(self).__name__) as r:
            self.global_average = r.scalar()
            self.user_biases = r.vector()
            self.item_biases = r.vector()
        self.num_users_trained = self.user_biases.shape[0]
        self.num_items_trained = self.item_biases.shape[0]
