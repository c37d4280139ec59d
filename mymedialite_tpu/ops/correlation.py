"""Correlation / similarity kernels, computed as dense matmuls.

TPU-native counterpart of the reference Correlation subsystem
(``Correlation/Overlap.cs:26-80``,
``BinaryDataSymmetricCorrelationMatrix.cs:25-100``, ``BinaryCosine.cs:35``,
``Jaccard.cs:30``, ``ConditionalProbability.cs:35``,
``BidirectionalConditionalProbability.cs:59``, ``Cooccurrence.cs:34``,
``Pearson.cs:58``, ``RatingCosine.cs:34``).

The reference computes all-pairs overlap by iterating the transpose
(O(nnz^2/rows)); on TPU the same quantity is one MXU matmul A @ A^T of
the binary incidence matrix (chunked over rows to bound memory), and the
Pearson sufficient statistics are five such matmuls. Correlation values
match the reference formulas exactly (diagonal forced to 1, the
reference's zero-guards preserved).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def incidence_dense(data, num_rows: int, num_cols: int,
                    values: np.ndarray = None) -> np.ndarray:
    """Dense [num_rows, num_cols] float32 matrix from COO interaction data
    (binary by default, or carrying rating values)."""
    M = np.zeros((num_rows, num_cols), dtype=np.float32)
    if values is None:
        M[data.users, data.items] = 1.0
    else:
        M[data.users, data.items] = values
    return M


@functools.partial(jax.jit, static_argnames=("kind",))
def _binary_correlation_from_incidence(A, alpha, *, kind: str):
    """All-pairs binary correlation of the rows of A (one chip, one shot)."""
    counts = jnp.sum(A, axis=1)                       # |x|
    overlap = jnp.dot(A, A.T, preferred_element_type=jnp.float32)
    return _map_overlap(overlap, counts, counts, alpha, kind)


def _map_overlap(overlap, cx, cy, alpha, kind: str):
    cx = cx[:, None]
    cy = cy[None, :]
    if kind == "cosine":
        denom = jnp.sqrt(cx * cy)
        corr = jnp.where(denom > 0, overlap / jnp.maximum(denom, 1e-12), 0.0)
    elif kind == "jaccard":
        denom = cx + cy - overlap
        corr = jnp.where(overlap != 0, overlap / jnp.maximum(denom, 1e-12), 0.0)
    elif kind == "conditional_probability":
        corr = jnp.where(cx != 0, overlap / jnp.maximum(cx, 1e-12), 0.0)
    elif kind == "bidirectional_conditional_probability":
        ok = (cx != 0) & (cy != 0)
        x_given_y = overlap / jnp.maximum(cx, 1e-12)
        y_given_x = overlap / jnp.maximum(cy, 1e-12)
        corr = jnp.where(
            ok, x_given_y ** alpha * y_given_x ** (1.0 - alpha), 0.0)
    elif kind == "cooccurrence":
        corr = overlap
    else:
        raise ValueError(f"unknown binary correlation {kind!r}")
    n = corr.shape[0]
    eye = jnp.eye(n, dtype=bool)
    # the driver sets the diagonal to 1 before mapping
    # (BinaryDataSymmetricCorrelationMatrix.cs:48-50)
    return jnp.where(eye, 1.0, corr)


def binary_correlation(data, num_entities: int, num_features: int,
                       kind: str = "cosine", alpha: float = 0.5,
                       weighted: bool = False) -> np.ndarray:
    """All-pairs correlation between entity rows of a binary matrix.

    data: InteractionData whose users are entities and items are features
          (e.g. PosOnlyData for user-user, its transpose for item-item,
          attribute data for attribute-based KNN).
    weighted: inverse-log-frequency feature weights
          (reference Overlap.ComputeWeighted, Overlap.cs:26-56).
    """
    A = incidence_dense(data, num_entities, num_features)
    if weighted:
        freq = A.sum(axis=0)
        w = (1.0 / np.log2(3.0 + freq)).astype(np.float32)
        Aw = jnp.asarray(A * w[None, :])
        overlap = jnp.dot(Aw, Aw.T, preferred_element_type=jnp.float32)
        entity_weights = jnp.asarray(A @ w)
        corr = _map_overlap(overlap, entity_weights, entity_weights,
                            jnp.float32(alpha), kind)
        return np.asarray(corr)
    return np.asarray(_binary_correlation_from_incidence(
        jnp.asarray(A), jnp.float32(alpha), kind=kind))


@functools.partial(jax.jit, static_argnames=("centered",))
def _rating_correlation_kernel(R, B, shrinkage, *, centered: bool):
    """Pearson / RatingCosine sufficient statistics as matmuls.

    R: [N, M] ratings (0 where absent); B: [N, M] binary mask.
    Per pair (x, y) over co-rated features:
      n = B B^T, Sxy = R R^T, Sx = R B^T, Sxx = (R*R) B^T
    Pearson (Pearson.cs:224-242):
      (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) * (n-1)/(n-1+shrink)
    RatingCosine (RatingCosine.cs): Sxy / sqrt(Sxx*Syy), same shrinkage.
    """
    f32 = jnp.float32
    n = jnp.dot(B, B.T, preferred_element_type=f32)
    Sxy = jnp.dot(R, R.T, preferred_element_type=f32)
    Sx = jnp.dot(R, B.T, preferred_element_type=f32)   # sum of x over common
    Sy = Sx.T
    Sxx = jnp.dot(R * R, B.T, preferred_element_type=f32)
    Syy = Sxx.T
    if centered:
        num = n * Sxy - Sx * Sy
        den = jnp.sqrt(jnp.maximum((n * Sxx - Sx * Sx) * (n * Syy - Sy * Sy),
                                   0.0))
    else:
        num = Sxy
        den = jnp.sqrt(jnp.maximum(Sxx * Syy, 0.0))
    corr = jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0)
    corr = corr * ((n - 1.0) / (n - 1.0 + shrinkage))
    corr = jnp.where(n < 2, 0.0, corr)
    eye = jnp.eye(corr.shape[0], dtype=bool)
    return jnp.where(eye, 1.0, corr)


def rating_correlation(ratings, entity: str = "user", kind: str = "pearson",
                       shrinkage: float = 0.0) -> np.ndarray:
    """All-pairs Pearson/RatingCosine over a RatingData
    (reference Pearson.ComputeCorrelations)."""
    if entity == "user":
        R = incidence_dense(ratings, ratings.num_users, ratings.num_items,
                            ratings.values)
    else:
        t = type("T", (), {})()  # transpose view of the COO arrays
        t.users, t.items = ratings.items, ratings.users
        R = incidence_dense(t, ratings.num_items, ratings.num_users,
                            ratings.values)
    B = (R != 0).astype(np.float32)
    return np.asarray(_rating_correlation_kernel(
        jnp.asarray(R), jnp.asarray(B), jnp.float32(shrinkage),
        centered=(kind == "pearson")))


def nearest_neighbors(corr: np.ndarray, k: int) -> np.ndarray:
    """Per-row top-k neighbor ids by descending correlation, self excluded
    (reference Correlation/Extensions.GetNearestNeighbors :153-175).
    Ties broken by ascending id. Returns [N, min(k, N-1)] int32."""
    n = corr.shape[0]
    c = corr.copy()
    np.fill_diagonal(c, -np.inf)
    k_eff = min(k, n - 1) if k >= 0 else n - 1
    if k_eff <= 0:
        return np.zeros((n, 0), dtype=np.int32)
    idx = np.argpartition(-c, k_eff - 1, axis=1)[:, :k_eff]
    row = np.arange(n)[:, None]
    order = np.lexsort((idx, -c[row, idx]), axis=1)
    return idx[row, order].astype(np.int32)
