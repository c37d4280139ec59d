"""Fused catalog-scoring + top-K Pallas kernel (TPU serving path).

TPU-native replacement for the reference's per-candidate Predict loop +
C5 IntervalHeap (``Recommender.cs:52-103``). The XLA path in
``ops/topk.py`` materializes the full [B, num_items] score matrix in HBM
(write + read ~ 8 bytes/score) before ``lax.top_k``; for factor models
the matmul itself is tiny (2f flops/score), so that path is HBM-bound.
This kernel streams item tiles through VMEM and maintains a running
per-user top-K in VMEM scratch, so the score matrix never touches HBM:
HBM traffic drops from O(B*N) to O((B + N) * f).

Selection uses K rounds of (max, first-argmax, mask) over the
[block_users, K + tile_items] merge buffer. Tie order matches
``jax.lax.top_k`` (smaller item id wins): the running top-K (earlier
tiles = smaller ids) is placed before the tile scores and argmax takes
the first occurrence.

Measured (v5e-1, B=4096 users, N=100k items, f=40, k=10): this kernel
10.2 G scores/s vs 20.7 G scores/s for the XLA matmul + ``lax.top_k``
path — XLA's TPU top-k is NOT HBM-bound at these shapes and its
specialized selection beats this kernel's K-pass VPU loop (~6 VPU
passes over every score per extracted element). The production serving
path (``ops/topk.py``) therefore stays on XLA; this kernel is kept as
the exact-parity Pallas alternative (bit-identical ids, tested in
interpret mode) and as the base for shapes where fusion wins (very
large k*B with small catalogs that fit VMEM).

Masking: an optional per-user byte mask (1 = candidate, 0 = excluded)
covers the reference's per-user train-item exclusion and candidate-set
modes (``Eval/Items.cs:138-167``); catalog padding rows are masked
in-kernel by item id.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # python float: pallas kernels must not close over tracers

# Above ~64 the VPU selection loop starts to rival the MXU matmul; the
# XLA lax.top_k path is the right tool there.
MAX_PALLAS_K = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _topk_kernel(w_ref, h_ref, mask_ref, ids_out, vals_out, rvals, ridx, *,
                 k: int, num_items: int, tile_items: int, has_mask: bool):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        rvals[:] = jnp.full_like(rvals, NEG_INF)
        ridx[:] = jnp.zeros_like(ridx)

    # [BU, T] tile of scores on the MXU, contracting the factor dim
    scores = jax.lax.dot_general(
        w_ref[:], h_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    bu = scores.shape[0]
    ids = j * tile_items + jax.lax.broadcasted_iota(
        jnp.int32, (bu, tile_items), 1)
    scores = jnp.where(ids < num_items, scores, NEG_INF)
    if has_mask:
        scores = jnp.where(mask_ref[:] != 0, scores, NEG_INF)

    # merge running top-K with this tile; running entries first so that
    # ties resolve to the smallest item id, like lax.top_k
    mvals = jnp.concatenate([rvals[:], scores], axis=1)   # [BU, K+T]
    mids = jnp.concatenate([ridx[:], ids], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, mvals.shape, 1)
    klane = jax.lax.broadcasted_iota(jnp.int32, (bu, k), 1)
    big = jnp.int32(2**30)

    new_vals = rvals[:]
    new_ids = ridx[:]
    for kk in range(k):
        m = jnp.max(mvals, axis=1, keepdims=True)                 # [BU, 1]
        am = jnp.min(jnp.where(mvals == m, lane, big), axis=1,
                     keepdims=True)                               # first hit
        picked = jnp.sum(jnp.where(lane == am, mids, 0), axis=1,
                         keepdims=True)                           # [BU, 1]
        new_vals = jnp.where(klane == kk, m, new_vals)
        new_ids = jnp.where(klane == kk, picked, new_ids)
        mvals = jnp.where(lane == am, NEG_INF, mvals)
    rvals[:] = new_vals
    ridx[:] = new_ids

    @pl.when(j == nj - 1)
    def _():
        vals_out[:] = rvals[:]
        ids_out[:] = ridx[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_items", "block_users", "interpret"))
def catalog_topk(user_rows, item_table, mask8=None, *, k: int,
                 tile_items: int = 512, block_users: int = 256,
                 interpret: bool = False):
    """Fused top-k over ``user_rows @ item_table.T``.

    user_rows:  [B, f] float32 (fused factor/bias rows work unchanged).
    item_table: [N, f] float32.
    mask8:      optional [B, N] int8/bool, nonzero = item is a candidate.
    Returns (ids [B, k] int32, vals [B, k] float32); if k > N the trailing
    slots hold NEG_INF scores (caller maps those to id -1).
    """
    B, f = user_rows.shape
    N = item_table.shape[0]
    if k > MAX_PALLAS_K:
        raise ValueError(f"k={k} > {MAX_PALLAS_K}; use the XLA path")
    k_run = min(k, N)

    BU = min(block_users, _round_up(B, 8))
    T = tile_items
    B_pad = _round_up(B, BU)
    N_pad = _round_up(N, T)
    w = jnp.pad(user_rows.astype(jnp.float32), ((0, B_pad - B), (0, 0)))
    h = jnp.pad(item_table.astype(jnp.float32), ((0, N_pad - N), (0, 0)))
    has_mask = mask8 is not None
    if has_mask:
        mask = jnp.pad(mask8.astype(jnp.int8),
                       ((0, B_pad - B), (0, N_pad - N)))
    grid = (B_pad // BU, N_pad // T)

    in_specs = [
        pl.BlockSpec((BU, f), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, f), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    args = [w, h]
    if has_mask:
        in_specs.append(pl.BlockSpec((BU, T), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    else:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1, 1), jnp.int8))

    kernel = functools.partial(
        _topk_kernel, k=k_run, num_items=N, tile_items=T, has_mask=has_mask)
    ids, vals = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((BU, k_run), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BU, k_run), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, k_run), jnp.int32),
            jax.ShapeDtypeStruct((B_pad, k_run), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((BU, k_run), jnp.float32),
            pltpu.VMEM((BU, k_run), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    ids, vals = ids[:B], vals[:B]
    if k_run < k:  # catalog smaller than k: pad like the XLA path
        ids = jnp.pad(ids, ((0, 0), (0, k - k_run)), constant_values=0)
        vals = jnp.pad(vals, ((0, 0), (0, k - k_run)),
                       constant_values=NEG_INF)
    return ids, vals


def topk_reference(user_rows, item_table, mask8=None, *, k: int):
    """XLA oracle with identical semantics (tests + non-TPU fallback)."""
    scores = jnp.dot(user_rows, item_table.T,
                     preferred_element_type=jnp.float32)
    if mask8 is not None:
        scores = jnp.where(mask8 != 0, scores, NEG_INF)
    k_run = min(k, item_table.shape[0])
    vals, ids = jax.lax.top_k(scores, k_run)
    if k_run < k:
        ids = jnp.pad(ids, ((0, 0), (0, k - k_run)), constant_values=0)
        vals = jnp.pad(vals, ((0, 0), (0, k - k_run)),
                       constant_values=NEG_INF)
    return ids, vals
