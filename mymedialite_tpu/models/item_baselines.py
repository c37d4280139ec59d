"""Trivial / popularity item recommenders.

TPU-native counterparts of reference ``ItemRecommendation/{MostPopular,
MostPopularByAttributes, Zero, Random, BigramRules}.cs``.
"""

from __future__ import annotations

import numpy as np

from mymedialite_tpu.io.model_io import ModelReader, ModelWriter
from mymedialite_tpu.models.base import (
    IncrementalItemRecommender, ItemRecommender,
)


class MostPopular(IncrementalItemRecommender):
    """Popularity count, optionally per-user-deduplicated
    (reference MostPopular.cs:38-120)."""

    HYPERPARAMS = {"by_user": bool}

    def __init__(self):
        super().__init__()
        self.by_user = False
        self.view_count = np.zeros(0, dtype=np.int64)

    def train(self):
        f = self.feedback
        if self.by_user:
            self.view_count = f.dedup_count_by_item.copy()
        else:
            counts = np.zeros(f.num_items, dtype=np.int64)
            np.add.at(counts, f.items, 1)
            self.view_count = counts

    def _norm(self):
        # reference Predict: normalize by num users (by_user) or event count
        return (self.feedback.num_users if self.by_user
                else max(len(self.feedback), 1))

    def predict_batch(self, users, items):
        items = np.asarray(items, dtype=np.int64)
        out = np.full(items.shape, -np.float32(3.4e38), dtype=np.float32)
        ok = (items >= 0) & (items < self.view_count.shape[0])
        out[ok] = self.view_count[items[ok]] / self._norm()
        return out

    def score_catalog(self, users):
        row = (self.view_count / self._norm()).astype(np.float32)
        return np.tile(row, (np.asarray(users).size, 1))

    def _retrain(self, users, items):
        self.train()

    def save_model(self, path):
        with ModelWriter(path, type(self).__name__, "2.99") as w:
            w.int_vector(self.view_count)

    def load_model(self, path):
        with ModelReader(path, type(self).__name__) as r:
            self.view_count = r.int_vector().astype(np.int64)
        self.num_items_trained = self.view_count.shape[0]


class Zero(ItemRecommender):
    """Always scores 0 (reference Zero.cs:24)."""

    def train(self):
        pass

    def predict_batch(self, users, items):
        return np.zeros(np.asarray(users).shape, dtype=np.float32)

    def save_model(self, path):
        pass

    def load_model(self, path):
        pass


class RandomItem(ItemRecommender):
    """Uniform random scores (reference ItemRecommendation/Random.cs:24)."""

    def __init__(self):
        super().__init__()
        self.random_seed = 42
        self._rng = np.random.default_rng(42)

    def train(self):
        self._rng = np.random.default_rng(self.random_seed)

    def predict_batch(self, users, items):
        return self._rng.random(np.asarray(users).shape).astype(np.float32)

    def save_model(self, path):
        pass

    def load_model(self, path):
        pass
