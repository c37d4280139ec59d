"""Interaction datasets as packed arrays.

TPU-native counterpart of the reference's object-based data layer
(``Data/DataSet.cs:32-285``, ``Data/Ratings.cs:32-337``,
``Data/PosOnlyFeedback.cs:32-207``, ``Data/TimedRatings.cs``).

Design: everything is a flat numpy COO array (int32 user ids, int32 item
ids, float32 values) plus *lazily built, cached* CSR views sorted by
(user, item) and (item, user) — the array analog of the reference's lazy
``ByUser``/``ByItem`` index lists (``DataSet.cs:48-97``). The CSR segments
are sorted by the secondary key so membership tests are binary searches
(used by on-device BPR negative sampling).

Datasets are immutable; incremental updates (the reference's
``Ratings.Add``/``RemoveUser`` etc.) return new datasets sharing no
mutable state, which keeps them safe to capture in jitted closures.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional

import numpy as np

from mymedialite_tpu.data.scale import RatingScale


def _as_i32(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.int32))


def _as_f32(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


@dataclasses.dataclass(frozen=True)
class Csr:
    """A grouping of interaction indices: ``order[indptr[k]:indptr[k+1]]``
    are the COO indices whose primary key equals k, sorted by secondary key."""

    indptr: np.ndarray  # int64 [num_keys + 1]
    order: np.ndarray   # int32 [nnz] — permutation into the COO arrays
    keys: np.ndarray    # int32 [nnz] — secondary key, already permuted & sorted per segment

    def segment(self, k: int) -> np.ndarray:
        """COO indices for primary key k."""
        return self.order[self.indptr[k]:self.indptr[k + 1]]

    def secondary(self, k: int) -> np.ndarray:
        """Sorted secondary keys for primary key k (e.g. items rated by user k)."""
        return self.keys[self.indptr[k]:self.indptr[k + 1]]

    def counts(self) -> np.ndarray:
        return np.diff(self.indptr).astype(np.int32)

    def contains(self, k: int, secondary_key: int) -> bool:
        seg = self.secondary(k)
        j = np.searchsorted(seg, secondary_key)
        return j < seg.size and seg[j] == secondary_key


def build_csr(primary: np.ndarray, secondary: np.ndarray, num_keys: int) -> Csr:
    order = np.lexsort((secondary, primary)).astype(np.int32)
    indptr = np.zeros(num_keys + 1, dtype=np.int64)
    indptr[1:] = np.bincount(primary, minlength=num_keys)
    np.cumsum(indptr, out=indptr)
    return Csr(indptr=indptr, order=order, keys=secondary[order])


class InteractionData:
    """Base COO container; subclassed by RatingData / PosOnlyData."""

    def __init__(self, users, items, num_users: Optional[int] = None,
                 num_items: Optional[int] = None):
        self.users = _as_i32(users)
        self.items = _as_i32(items)
        if self.users.shape != self.items.shape or self.users.ndim != 1:
            raise ValueError("users/items must be equal-length 1-D arrays")
        n_u = int(self.users.max()) + 1 if self.users.size else 0
        n_i = int(self.items.max()) + 1 if self.items.size else 0
        self.num_users = max(num_users or 0, n_u)
        self.num_items = max(num_items or 0, n_i)

    def __len__(self):
        return int(self.users.size)

    @property
    def count(self):
        return len(self)

    # reference DataSet.MaxUserID/MaxItemID
    @property
    def max_user_id(self):
        return self.num_users - 1

    @property
    def max_item_id(self):
        return self.num_items - 1

    @cached_property
    def by_user(self) -> Csr:
        """Per-user CSR over interaction indices (reference DataSet.ByUser)."""
        return build_csr(self.users, self.items, self.num_users)

    @cached_property
    def by_item(self) -> Csr:
        """Per-item CSR (reference DataSet.ByItem)."""
        return build_csr(self.items, self.users, self.num_items)

    @cached_property
    def all_users(self) -> np.ndarray:
        return np.unique(self.users)

    @cached_property
    def all_items(self) -> np.ndarray:
        return np.unique(self.items)

    @cached_property
    def count_by_user(self) -> np.ndarray:
        # plain bincount: building the full by_user CSR just for counts
        # was 2 x (20M lexsort + add.at) ~= 21 s at the Netflix shape
        return np.bincount(self.users, minlength=self.num_users).astype(
            np.int32)

    @cached_property
    def count_by_item(self) -> np.ndarray:
        return np.bincount(self.items, minlength=self.num_items).astype(
            np.int32)

    def items_by_user(self, u: int) -> np.ndarray:
        """Sorted item ids interacted with by user u."""
        return self.by_user.secondary(u)

    def users_by_item(self, i: int) -> np.ndarray:
        return self.by_item.secondary(i)


class RatingData(InteractionData):
    """Explicit-feedback ratings (reference Data/Ratings.cs).

    ``values`` is float32; ``times`` (optional) is int64 unix seconds —
    the reference's TimedRatings (``Data/TimedRatings.cs``).
    """

    def __init__(self, users, items, values, num_users=None, num_items=None,
                 scale: Optional[RatingScale] = None, times=None):
        super().__init__(users, items, num_users, num_items)
        self.values = _as_f32(values)
        if self.values.shape != self.users.shape:
            raise ValueError("values must match users/items length")
        self.scale = scale or RatingScale.from_values(self.values)
        self.times = None if times is None else np.asarray(times, dtype=np.int64)
        if self.times is not None and self.times.shape != self.users.shape:
            raise ValueError("times must match users/items length")

    # --- reference Ratings.Average (Ratings.cs:76-84) ---
    @cached_property
    def average(self) -> float:
        return float(self.values.mean()) if len(self) else 0.0

    @property
    def min_rating(self):
        return self.scale.min

    @property
    def max_rating(self):
        return self.scale.max

    def select(self, idx: np.ndarray, num_users=None, num_items=None) -> "RatingData":
        """Index-view split (reference RatingsProxy.cs) — materialized as arrays."""
        return RatingData(
            self.users[idx], self.items[idx], self.values[idx],
            num_users=num_users if num_users is not None else self.num_users,
            num_items=num_items if num_items is not None else self.num_items,
            scale=self.scale,
            times=None if self.times is None else self.times[idx],
        )

    def concat(self, other: "RatingData") -> "RatingData":
        """Reference CombinedRatings.cs."""
        times = None
        if self.times is not None and other.times is not None:
            times = np.concatenate([self.times, other.times])
        return RatingData(
            np.concatenate([self.users, other.users]),
            np.concatenate([self.items, other.items]),
            np.concatenate([self.values, other.values]),
            num_users=max(self.num_users, other.num_users),
            num_items=max(self.num_items, other.num_items),
            scale=RatingScale.from_values(
                np.concatenate([np.asarray(self.scale.levels),
                                np.asarray(other.scale.levels)])),
            times=times,
        )

    # --- incremental updates (reference Ratings.cs:150-190, 255-298) ---

    def add(self, users, items, values, times=None) -> "RatingData":
        new_times = None
        if self.times is not None:
            add_t = (np.zeros(len(_as_i32(users)), dtype=np.int64)
                     if times is None else np.asarray(times, dtype=np.int64))
            new_times = np.concatenate([self.times, add_t])
        return RatingData(
            np.concatenate([self.users, _as_i32(users)]),
            np.concatenate([self.items, _as_i32(items)]),
            np.concatenate([self.values, _as_f32(values)]),
            num_users=self.num_users, num_items=self.num_items,
            scale=self.scale, times=new_times)

    def remove_indices(self, idx) -> "RatingData":
        mask = np.ones(len(self), dtype=bool)
        mask[np.asarray(idx, dtype=np.int64)] = False
        return self.select(np.nonzero(mask)[0])

    def remove_user(self, u: int) -> "RatingData":
        return self.select(np.nonzero(self.users != u)[0])

    def remove_item(self, i: int) -> "RatingData":
        return self.select(np.nonzero(self.items != i)[0])

    def update(self, users, items, values) -> "RatingData":
        """Overwrite the value of existing (u,i) pairs (reference UpdateRatings)."""
        new_values = self.values.copy()
        for u, i, v in zip(_as_i32(users), _as_i32(items), _as_f32(values)):
            seg = self.by_user.segment(u)
            hit = seg[self.items[seg] == i]
            if hit.size == 0:
                raise KeyError(f"no rating for user {u}, item {i}")
            new_values[hit] = v
        return RatingData(self.users, self.items, new_values,
                          num_users=self.num_users, num_items=self.num_items,
                          scale=self.scale, times=self.times)

    def try_get(self, u: int, i: int):
        """Reference DataSet.TryGetIndex — but O(log) via CSR."""
        if u < 0 or u >= self.num_users:
            return None
        seg = self.by_user.segment(u)
        hit = seg[self.items[seg] == i]
        return float(self.values[hit[0]]) if hit.size else None


class PosOnlyData(InteractionData):
    """Positive-only implicit feedback (reference Data/PosOnlyFeedback.cs)."""

    def select(self, idx: np.ndarray, num_users=None, num_items=None) -> "PosOnlyData":
        return PosOnlyData(
            self.users[idx], self.items[idx],
            num_users=num_users if num_users is not None else self.num_users,
            num_items=num_items if num_items is not None else self.num_items)

    def add(self, users, items) -> "PosOnlyData":
        return PosOnlyData(
            np.concatenate([self.users, _as_i32(users)]),
            np.concatenate([self.items, _as_i32(items)]),
            num_users=self.num_users, num_items=self.num_items)

    def remove(self, users, items) -> "PosOnlyData":
        users, items = _as_i32(users), _as_i32(items)
        mask = np.ones(len(self), dtype=bool)
        for u, i in zip(users, items):
            mask &= ~((self.users == u) & (self.items == i))
        return self.select(np.nonzero(mask)[0])

    def remove_user(self, u: int) -> "PosOnlyData":
        return self.select(np.nonzero(self.users != u)[0])

    def remove_item(self, i: int) -> "PosOnlyData":
        return self.select(np.nonzero(self.items != i)[0])

    def transpose(self) -> "PosOnlyData":
        """Reference PosOnlyFeedback.Transpose (:198-205)."""
        return PosOnlyData(self.items, self.users,
                           num_users=self.num_items, num_items=self.num_users)

    def contains(self, u: int, i: int) -> bool:
        return 0 <= u < self.num_users and self.by_user.contains(u, i)

    @cached_property
    def dedup_count_by_item(self) -> np.ndarray:
        """Per-item count of *distinct* users (MostPopular's ByUser mode)."""
        pairs = np.unique(np.stack([self.users, self.items], axis=1), axis=0)
        counts = np.zeros(self.num_items, dtype=np.int64)
        np.add.at(counts, pairs[:, 1], 1)
        return counts


def padded_history(csr: Csr, max_len: Optional[int] = None, pad: int = -1):
    """Densify ragged per-key histories into a padded [num_keys, L] int32 matrix
    plus a length vector. The TPU-friendly form of the reference's per-user
    item lists (used by SVD++-family segment sums and BPR sampling)."""
    counts = csr.counts()
    L = int(max_len if max_len is not None else (counts.max() if counts.size else 0))
    L = max(L, 1)
    num_keys = csr.indptr.size - 1
    out = np.full((num_keys, L), pad, dtype=np.int32)
    for k in range(num_keys):
        seg = csr.secondary(k)[:L]
        out[k, :seg.size] = seg
    return out, np.minimum(counts, L).astype(np.int32)
