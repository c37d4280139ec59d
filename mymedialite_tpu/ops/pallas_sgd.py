"""MXU-blocked SGD epoch: scatter/gather as one-hot systolic matmuls.

TPU-native replacement for the same reference inner loop as
``ops/sgd.py`` (``BiasedMatrixFactorization.cs:264-309``,
``MatrixFactorization.cs:166-196``, DSGD blocks ``MultiCore.cs:43-73``),
attacking the measured bottleneck of the XLA path: the duplicate
scatter-add read-modify-write (42.6M updates/s; gather+math bound 140M —
see ops/sgd.py perf notes).

Idea: double-block the rating stream Gemulla-style into
(user-block x item-block) buckets, pad each bucket to fixed-size chunks,
and process one chunk per grid step inside a single Pallas kernel where

- the item table lives wholly in VMEM for the epoch (manual DMA in/out),
- the current user block streams through VMEM via a BlockSpec whose
  index map reads a scalar-prefetched per-chunk ublock id,
- gathers become ``one_hot @ table_block`` and scatter-adds become
  ``one_hot.T @ delta`` — MXU matmuls over on-the-fly iota==id one-hots,
  so the read-modify-write serialization disappears entirely.

Semantics: each chunk is one minibatch SGD step (duplicates within a
chunk sum, like the XLA path's batches — but chunks are ~512 ratings,
far finer-grained than the 131k XLA batches, so trajectories are closer
to the reference's sequential SGD, not further). Item ids are internally
permuted popularity-round-robin so every item block carries similar
rating mass (balanced bucket padding); the permutation is undone when
extracting the tables.

Precision: tables are f32; one-hot operands are exact in bf16; with
``mxu_dtype='bf16'`` the gathered factor rows and the scattered deltas
round through bf16 (MXU-native rate), with f32 accumulation. SGD is
noise-tolerant; quality is validated against the f32 path and the XLA
path in tests/quality runs. ``mxu_dtype='f32'`` keeps full precision at
lower MXU rate.

Capacity: needs the (padded) item table in VMEM: I_pad * fe * 4 bytes
<= ~10MB (e.g. 40k items at fe=64). Larger catalogs use ops/sgd.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mymedialite_tpu.ops.sgd import _gradient_common

VMEM_ITEM_TABLE_BYTES = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------

@dataclass
class MxuPlan:
    """Host-side layout of one training set for the MXU epoch kernel."""
    # static geometry (meta tuple for jit)
    num_chunks: int
    chunk: int
    user_block: int
    item_block: int
    n_ublocks: int
    n_iblocks: int
    num_users: int
    num_items: int
    n_ratings: int
    # device data: [nc, 4, C] int32 — rows (u_loc, i_loc, v_bits, w_bits)
    packed: jnp.ndarray = field(repr=False)
    # base chunk metas, layout order (host)
    ub_c: np.ndarray = field(repr=False)
    ib_c: np.ndarray = field(repr=False)
    # item id permutation (host): new_of_old [num_items], old_of_new [I_pad]
    new_of_old: np.ndarray = field(repr=False)
    old_of_new: np.ndarray = field(repr=False)

    @property
    def u_pad(self) -> int:
        return self.n_ublocks * self.user_block

    @property
    def i_pad(self) -> int:
        return self.n_iblocks * self.item_block

    def meta(self, fe: int) -> tuple:
        return (self.num_chunks, self.chunk, self.user_block,
                self.item_block, self.n_ublocks, self.i_pad, fe)

    def epoch_order(self, seed) -> tuple:
        """Per-epoch chunk visit order: chunks stay grouped by ublock
        (contiguous user-block residency), randomized within each group.
        Returns (ub, ib, row) device int32 arrays of length num_chunks."""
        nc = self.num_chunks
        if seed is None:
            perm = np.arange(nc)
        else:
            rng = np.random.default_rng(seed)
            # random key per chunk, stably grouped by ublock
            perm = np.argsort(self.ub_c.astype(np.float64) * 2.0
                              + rng.random(nc), kind="stable")
        return (jnp.asarray(self.ub_c[perm]), jnp.asarray(self.ib_c[perm]),
                jnp.asarray(perm.astype(np.int32)))


@jax.jit
def _device_epoch_order(ub_c, ib_c, key):
    """Device-side epoch_order for the resident plan: chunks grouped by
    ublock (keys separated by 2.0 > any uniform tie-break), shuffled
    within groups — same semantics as MxuPlan.epoch_order, but ONE
    fused dispatch instead of a host argsort + three host->device
    transfers per epoch (each a ~35 ms round trip over the axon
    tunnel; the whole epoch is ~95 ms at the bench shape)."""
    r = jax.random.uniform(key, ub_c.shape, dtype=jnp.float32)
    perm = jnp.argsort(ub_c.astype(jnp.float32) * 2.0 + r)
    return ub_c[perm], ib_c[perm], perm.astype(jnp.int32)


def device_epoch_order(plan: "MxuPlan", seed: int):
    """epoch_order computed on device (resident plan only)."""
    dev = plan.__dict__.get("_dev_cols")
    if dev is None:
        dev = (jnp.asarray(plan.ub_c), jnp.asarray(plan.ib_c))
        plan.__dict__["_dev_cols"] = dev
    key = jax.random.key(int(seed) & 0x7FFFFFFF, impl="unsafe_rbg")
    return _device_epoch_order(dev[0], dev[1], key)


def prepare_mxu_data(users, items, values, num_users: int, num_items: int, *,
                     user_block: int = 512, item_block: int = 1024,
                     chunk=256, shuffle_seed=0,
                     chunk_overhead: int = 0,
                     item_perm=None, block_align: int = 8) -> MxuPlan:
    """Bucket the rating stream by (user_block x item_block) blocks with
    popularity-balanced item blocks; pad each bucket to chunk multiples.
    ``item_perm`` (a new_of_old array from a previous plan with the same
    num_items/item_block) forces a SHARED item permutation — used when
    two event streams (e.g. SVD++ ratings + history edges) must address
    the same permuted item table."""
    from mymedialite_tpu import native

    n = len(users)
    users = np.asarray(users, dtype=np.int32)
    items = np.asarray(items, dtype=np.int32)
    values = np.asarray(values, dtype=np.float32)
    perm = (np.random.default_rng(shuffle_seed).permutation(n)
            if shuffle_seed is not None and n > 1 else None)

    # block_align=128 for kernels whose tables are TRANSPOSED
    # ([fe, rows]): Mosaic requires lane-dim slices to be 128-aligned,
    # so small catalogs must round their blocks up to the lane tile
    UB = min(user_block, _round_up(max(num_users, 1), block_align))
    IB = min(item_block, _round_up(max(num_items, 1), block_align))
    n_ub = max((num_users + UB - 1) // UB, 1)
    n_ib = max((num_items + IB - 1) // IB, 1)

    if item_perm is not None:
        new_of_old = np.asarray(item_perm, dtype=np.int32)
        assert new_of_old.shape[0] == num_items
    else:
        # popularity round-robin item permutation: j-th most rated item
        # goes to block j % n_ib -> every block gets ~equal rating mass
        # (counts are shuffle-invariant: computed on the raw stream)
        counts = native.count_items(items, num_items) if n else None
        if counts is None:
            counts = np.bincount(items, minlength=num_items) if n else \
                np.zeros(num_items, np.int64)
        rank = np.argsort(-counts, kind="stable")
        j = np.arange(num_items)
        new_of_old = np.empty(num_items, np.int32)
        new_of_old[rank] = ((j % n_ib) * IB + j // n_ib).astype(np.int32)
    old_of_new = np.full(n_ib * IB, -1, np.int32)
    old_of_new[new_of_old] = np.arange(num_items, dtype=np.int32)

    nbkt = n_ub * n_ib

    def pick_chunk(bcount):
        if chunk is not None:
            return chunk
        # histogram-optimal chunk: per-bucket padding depends on the
        # actual (often skewed) bucket-size distribution, not its mean —
        # pick the candidate minimizing total padded slots, preferring
        # larger chunks on near-ties (fewer, fatter MXU dispatches)
        # chunk_overhead: the kernel's FIXED per-chunk cost in
        # slot-equivalents (grid step + DMA conditions + fused sampling
        # for the BPR kernel) — bigger chunks amortize it at the price
        # of more per-bucket padding
        cands = (128, 256, 384, 512, 640)
        tots = [int((((bcount + c - 1) // c) * c).sum())
                + int((((bcount + c - 1) // c)).sum()) * chunk_overhead
                for c in cands]
        lo = min(tots)
        return max(c for c, t in zip(cands, tots) if t <= 1.03 * lo)

    nat = native.mxu_bucketize(users, items, values, perm, new_of_old,
                               UB, IB, n_ib, nbkt,
                               pick_chunk) if n else None
    if nat is not None:
        # native two-pass counting sort: ~10-30x the numpy path at
        # Netflix scale (VERDICT r4 #4 — "mxu prep" was 35 s of host
        # argsort/gather work for 20M events)
        packed_np, bcount, pcount, chunk = nat
        nc = packed_np.shape[0]
    else:
        if perm is not None:
            users, items, values = users[perm], items[perm], values[perm]
        i_new = new_of_old[items]
        bucket = (users // UB).astype(np.int64) * n_ib + i_new // IB
        order = np.argsort(bucket, kind="stable")
        users, i_new, values = users[order], i_new[order], values[order]
        bucket = bucket[order]

        bcount = np.bincount(bucket, minlength=nbkt) if n else \
            np.zeros(nbkt, np.int64)
        chunk = pick_chunk(bcount)
        pcount = ((bcount + chunk - 1) // chunk) * chunk  # 0 stays 0
        poff = np.concatenate([[0], np.cumsum(pcount)])
        total = int(poff[-1])
        nc = max(total // chunk, 1)
        total = nc * chunk

        u_loc = np.zeros(total, np.int32)
        i_loc = np.zeros(total, np.int32)
        v = np.zeros(total, np.float32)
        w = np.zeros(total, np.float32)
        if n:
            boff = np.concatenate([[0], np.cumsum(bcount)])
            within = np.arange(n) - boff[bucket]
            out_idx = poff[bucket] + within
            u_loc[out_idx] = users % UB
            i_loc[out_idx] = i_new % IB
            v[out_idx] = values
            w[out_idx] = 1.0
        packed_np = np.stack([
            u_loc.reshape(nc, chunk), i_loc.reshape(nc, chunk),
            v.reshape(nc, chunk).view(np.int32),
            w.reshape(nc, chunk).view(np.int32)], axis=1)

    # per-chunk (ublock, iblock) metas in layout order
    chunks_per_bucket = (pcount // chunk).astype(np.int64)
    bkt_of_chunk = np.repeat(np.arange(nbkt), chunks_per_bucket)
    if bkt_of_chunk.size == 0:
        bkt_of_chunk = np.zeros(1, np.int64)
    ub_c = (bkt_of_chunk // n_ib).astype(np.int32)
    ib_c = (bkt_of_chunk % n_ib).astype(np.int32)

    return MxuPlan(
        num_chunks=nc, chunk=chunk, user_block=UB, item_block=IB,
        n_ublocks=n_ub, n_iblocks=n_ib, num_users=num_users,
        num_items=num_items, n_ratings=n,
        packed=jnp.asarray(packed_np),
        ub_c=ub_c, ib_c=ib_c,
        new_of_old=new_of_old, old_of_new=old_of_new)


def extend_tables_mxu(plan: MxuPlan, user_factors, item_factors,
                      user_bias=None, item_bias=None, fe_pad: int = 64):
    """Fused [factors | bias | one] tables in the kernel's layout:
    users padded to n_ublocks*UB rows; items permuted (popularity
    round-robin) and padded to n_iblocks*IB rows; columns padded to
    ``fe_pad`` (zero columns with zero learn rate stay zero)."""
    W = np.asarray(user_factors, dtype=np.float32)
    H = np.asarray(item_factors, dtype=np.float32)
    U, f = W.shape
    fe = max(fe_pad, _round_up(f + 2, 8))
    bu = np.zeros(U, np.float32) if user_bias is None else \
        np.asarray(user_bias, np.float32)
    bi = np.zeros(H.shape[0], np.float32) if item_bias is None else \
        np.asarray(item_bias, np.float32)
    We = np.zeros((plan.u_pad, fe), np.float32)
    We[:U, :f] = W
    We[:U, f] = bu
    We[:U, f + 1] = 1.0
    He = np.zeros((plan.i_pad, fe), np.float32)
    He[plan.new_of_old, :f] = H
    He[plan.new_of_old, f] = 1.0
    He[plan.new_of_old, f + 1] = bi
    return jnp.asarray(We), jnp.asarray(He)


def split_tables_mxu(plan: MxuPlan, W_ext, H_ext, num_factors: int):
    """Inverse of extend_tables_mxu (unpermutes the item rows)."""
    We = np.asarray(W_ext)[:plan.num_users]
    He = np.asarray(H_ext)[plan.new_of_old]
    f = num_factors
    return We[:, :f], He[:, :f], We[:, f], He[:, f + 1]


def mxu_column_rates(num_factors: int, fe: int, learn_rate, reg_u, reg_i,
                     bias_learn_rate, bias_reg, biased: bool,
                     update_user: bool, update_item: bool):
    """[fe, 4] column-stacked (w_lr, w_reg, h_lr, h_reg) vectors,
    scaled by the current learn rate (see ops/sgd.py column_rates)."""
    f = num_factors
    lr, blr = float(learn_rate), float(bias_learn_rate)
    out = np.zeros((fe, 4), np.float32)
    out[:f, 0] = lr
    out[f, 0] = blr * lr if biased else 0.0
    out[:f, 1] = float(reg_u)
    out[f, 1] = float(bias_reg) * float(reg_u) if biased else 0.0
    out[:f, 2] = lr
    out[f + 1, 2] = blr * lr if biased else 0.0
    out[:f, 3] = float(reg_i)
    out[f + 1, 3] = float(bias_reg) * float(reg_i) if biased else 0.0
    if not update_user:
        out[:, 0] = 0.0
    if not update_item:
        out[:, 2] = 0.0
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _mxu_sgd_kernel(ub_ref, ib_ref, row_ref,      # scalar prefetch (SMEM)
                    w_in_ref, h_in_ref, data_ref,
                    rates_ref, hp_ref,
                    w_out_ref, h_out_ref,
                    h_vmem, sem_in, sem_out, *,
                    loss: int, biased: bool, C: int, UB: int, IB: int,
                    mxu_dtype):
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        cp = pltpu.make_async_copy(h_in_ref, h_vmem, sem_in)
        cp.start()
        cp.wait()

    # first visit of this user block (blocks are contiguous in chunk
    # order and never revisited): seed the output buffer
    cur = ub_ref[c]
    prev = ub_ref[jnp.maximum(c - 1, 0)]

    @pl.when((c == 0) | (cur != prev))
    def _():
        w_out_ref[:] = w_in_ref[:]

    ib = ib_ref[c]
    d = data_ref[0]                      # [4, C] int32 (one DMA per chunk)
    u = d[0:1]                           # [1, C] int32, local in user block
    i = d[1:2]                           # [1, C] int32, local in item block
    v = pltpu.bitcast(d[2:3], jnp.float32)
    wt = pltpu.bitcast(d[3:4], jnp.float32)

    Wb = w_out_ref[:]                    # [UB, fe] f32
    Hb = h_vmem[pl.ds(ib * IB, IB), :]   # [IB, fe] f32

    # everything runs in "transposed" [.., C] orientation so the
    # per-example vectors stay in their natural [1, C] lane layout —
    # no lane<->sublane relayouts anywhere in the chunk
    put = (jax.lax.broadcasted_iota(jnp.int32, (UB, C), 0)
           == u).astype(mxu_dtype)       # [UB, C] one-hot
    pit = (jax.lax.broadcasted_iota(jnp.int32, (IB, C), 0)
           == i).astype(mxu_dtype)       # [IB, C]

    # gathers on the MXU: block.T-contraction one_hot -> [fe, C]
    wu = jax.lax.dot_general(
        Wb.astype(mxu_dtype), put, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [fe, C]
    hi = jax.lax.dot_general(
        Hb.astype(mxu_dtype), pit, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [fe, C]

    score = jnp.sum(wu * hi, axis=0, keepdims=True)    # [1, C], has b_u+b_i
    gb = hp_ref[0, 0]
    if biased:
        sig = jax.nn.sigmoid(score + gb)
        pred = hp_ref[0, 1] + sig * hp_ref[0, 2]
        g_com = _gradient_common(loss, v - pred, sig, hp_ref[0, 2]) * wt
    else:
        g_com = (v - (score + gb)) * wt

    w_lr = rates_ref[:, 0:1]                           # [fe, 1] columns
    w_reg = rates_ref[:, 1:2]
    h_lr = rates_ref[:, 2:3]
    h_reg = rates_ref[:, 3:4]
    delta_w = w_lr * (g_com * hi - wt * w_reg * wu)    # [fe, C]
    delta_h = h_lr * (g_com * wu - wt * h_reg * hi)

    # scatter-adds on the MXU: one_hot contracted over C -> [K, fe]
    w_out_ref[:] = Wb + jax.lax.dot_general(
        put, delta_w.astype(mxu_dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    h_vmem[pl.ds(ib * IB, IB), :] = Hb + jax.lax.dot_general(
        pit, delta_h.astype(mxu_dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(c == nc - 1)
    def _():
        cp = pltpu.make_async_copy(h_vmem, h_out_ref, sem_out)
        cp.start()
        cp.wait()


def _mxu_epoch_call(W_ext, H_ext, data, ub, ib, row, hp_vec, rates, *,
                    meta, loss: int, biased: bool, dt,
                    interpret: bool):
    """The pallas_call for one epoch pass (shared by the VMEM-resident
    epoch and each pass of the slab-tiled epoch)."""
    nc, C, UB, IB, n_ub, i_pad, fe = meta

    kernel = functools.partial(
        _mxu_sgd_kernel, loss=loss, biased=biased, C=C, UB=UB, IB=IB,
        mxu_dtype=dt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((UB, fe), lambda c, ub, ib, row: (ub[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 4, C), lambda c, ub, ib, row: (row[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fe, 4), lambda c, ub, ib, row: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda c, ub, ib, row: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((UB, fe), lambda c, ub, ib, row: (ub[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((i_pad, fe), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    W_out, H_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_ub * UB, fe), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, fe), jnp.float32),
        ],
        # inputs: 0..2 scalar prefetch, 3 = W, 4 = H
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(ub, ib, row, W_ext, H_ext, data, rates, hp_vec)
    return W_out, H_out


@functools.partial(
    jax.jit,
    static_argnames=("meta", "loss", "biased", "mxu_dtype", "interpret"),
    donate_argnames=("W_ext", "H_ext"))
def sgd_epoch_mxu(W_ext, H_ext, data, order, hp_vec, rates, *,
                  meta, loss: int, biased: bool, mxu_dtype: str = "bf16",
                  interpret: bool = False):
    """One epoch. meta = plan.meta(fe); data = plan.packed; order =
    plan.epoch_order(seed); hp_vec = [1, 8] f32 (global_bias,
    min_rating, rating_range, ...); rates = [fe, 4] from
    mxu_column_rates (already scaled by the current learn rate)."""
    ub, ib, row = order
    dt = jnp.bfloat16 if mxu_dtype == "bf16" else jnp.float32
    return _mxu_epoch_call(W_ext, H_ext, data, ub, ib, row, hp_vec, rates,
                           meta=meta, loss=loss, biased=biased, dt=dt,
                           interpret=interpret)


@functools.partial(jax.jit, static_argnames=("u_pad", "i_pad", "fe_mxu"))
def tables_std_to_mxu(W_std, H_std, new_of_old, *, u_pad: int, i_pad: int,
                      fe_mxu: int):
    """Convert ops/sgd.py fused tables ([factors|b_u|1] / [factors|1|b_i],
    identical column layout) into the kernel layout: user rows padded to
    the ublock grid, item rows popularity-permuted and padded to the
    iblock grid, columns zero-padded to fe_mxu. Pure device ops — no
    host round trip between epochs."""
    fe = W_std.shape[1]
    W = jnp.zeros((u_pad, fe_mxu), jnp.float32)
    # the std layout pads users to group_users multiples (16384), the
    # kernel to user_block multiples (512): whichever is smaller, the
    # rows past min() are padding in both layouts (real users < both)
    rows = min(W_std.shape[0], u_pad)
    W = W.at[:rows, :fe].set(W_std[:rows])
    H = jnp.zeros((i_pad, fe_mxu), jnp.float32)
    H = H.at[new_of_old, :fe].set(H_std)
    return W, H


@functools.partial(jax.jit, static_argnames=("num_users_pad", "fe_std"))
def tables_mxu_to_std(W_mxu, H_mxu, new_of_old, *, num_users_pad: int,
                      fe_std: int):
    """Inverse of tables_std_to_mxu, on device."""
    W = W_mxu[:num_users_pad, :fe_std]
    if num_users_pad > W_mxu.shape[0]:
        W = jnp.concatenate([
            W, jnp.zeros((num_users_pad - W_mxu.shape[0], fe_std),
                         jnp.float32)
            .at[:, fe_std - 1].set(1.0)])
    return W, H_mxu[new_of_old, :fe_std]


def mxu_supported(num_items: int, num_factors: int,
                  item_block: int = 1024) -> bool:
    """Whether the item table fits the kernel's VMEM budget."""
    fe = max(64, _round_up(num_factors + 2, 8))
    n_ib = max((num_items + item_block - 1) // item_block, 1)
    return n_ib * item_block * fe * 4 <= VMEM_ITEM_TABLE_BYTES


# ---------------------------------------------------------------------------
# HBM-tiled variant: catalogs beyond the VMEM budget (KDD-Cup 624k items)
# ---------------------------------------------------------------------------
#
# The epoch becomes S slab passes: the item table is partitioned into S
# contiguous slabs of `slab_blocks` item blocks; pass s runs the SAME
# kernel over the chunks whose item block lives in slab s, with only that
# slab resident in VMEM (manual DMA in/out, slab base row scalar-
# prefetched so Mosaic compiles the kernel once for all passes). Each
# pass is its own pallas_call, so XLA's dataflow — not DMA-queue luck —
# orders every slab writeback before the next pass reads the table, and
# user blocks are still visited contiguously within each pass (no
# revisit hazard on the aliased W output either). Per-epoch overhead vs
# the resident kernel: the user table streams S times (~123MB x S at the
# Netflix shape, a few ms at HBM bandwidth) and the chunk grid pads to
# the largest slab's chunk count.


@dataclass
class MxuTiledPlan:
    """Host-side layout for the tiled MXU epoch (flat slab-major grid).

    The epoch is a single flat chunk schedule sorted (slab, ublock):
    the kernel keeps ONE item-table slab and ONE user block in VMEM
    scratch and swaps them by explicit blocking DMA exactly when the
    prefetched slab/ublock id changes. Unlike a scan-over-slabs design,
    there is no per-slab grid padding — skewed catalogs (one slab
    holding most of the rating mass, e.g. a popularity head item) cost
    nothing extra. The schedule is split into fixed-size passes
    (``pass_len``) only to bound the scalar-prefetch (SMEM) footprint;
    a lax.scan threads W/H between passes."""
    num_slabs: int
    num_passes: int
    pass_len: int            # grid size per pallas pass
    chunk: int
    user_block: int
    item_block: int
    slab_blocks: int         # item blocks per slab
    n_ublocks: int
    n_iblocks: int
    num_users: int
    num_items: int
    n_ratings: int
    # [nc + 1, 4, C]: all real chunks + one all-zero pad chunk (index nc)
    packed: jnp.ndarray = field(repr=False)
    ub_c: np.ndarray = field(repr=False)      # [nc] layout order
    ib_c: np.ndarray = field(repr=False)
    new_of_old: np.ndarray = field(repr=False)
    old_of_new: np.ndarray = field(repr=False)

    @property
    def u_pad(self) -> int:
        return self.n_ublocks * self.user_block

    @property
    def slab_rows(self) -> int:
        return self.slab_blocks * self.item_block

    @property
    def i_pad(self) -> int:
        # table padded to whole slabs
        return self.num_slabs * self.slab_rows

    def meta(self, fe: int) -> tuple:
        return (self.pass_len, self.chunk, self.user_block,
                self.item_block, self.n_ublocks, self.slab_rows, fe)

    def epoch_order(self, seed) -> tuple:
        """Per-epoch visit order, [num_passes, pass_len] each of
        (ub, ib_rel, slab, row): chunks sorted by slab, grouped by
        ublock within the slab (contiguous slab + user-block residency),
        randomized within each (slab, ublock) cell. Tail pad entries
        repeat the last real ublock/slab (no extra DMA) and point at the
        all-zero pad chunk. With one slab the keys reduce to the
        resident kernel's (ub*2 + rand) — identical visit order."""
        nc = self.ub_c.size
        sl_c = (self.ib_c // self.slab_blocks).astype(np.int32)
        if seed is None:
            perm = np.argsort(
                sl_c.astype(np.float64) * (2.0 * self.n_ublocks)
                + self.ub_c * 2.0, kind="stable")
        else:
            rng = np.random.default_rng(seed)
            perm = np.argsort(
                sl_c.astype(np.float64) * (2.0 * self.n_ublocks)
                + self.ub_c * 2.0 + rng.random(nc), kind="stable")
        tot = self.num_passes * self.pass_len
        zero_row = self.packed.shape[0] - 1
        ub = np.zeros(tot, np.int32)
        ibr = np.zeros(tot, np.int32)
        sl = np.zeros(tot, np.int32)
        row = np.full(tot, zero_row, np.int32)
        ub[:nc] = self.ub_c[perm]
        sl[:nc] = sl_c[perm]
        ibr[:nc] = self.ib_c[perm] - sl[:nc] * self.slab_blocks
        row[:nc] = perm
        if nc and tot > nc:
            ub[nc:] = ub[nc - 1]
            sl[nc:] = sl[nc - 1]
            ibr[nc:] = ibr[nc - 1]
        shape = (self.num_passes, self.pass_len)
        ub2, sl2 = ub.reshape(shape), sl.reshape(shape)
        src = (refetch_flags(ub2, 1)
               | refetch_flags(sl2, 2)).astype(np.int32)
        return (jnp.asarray(ub2),
                jnp.asarray(ibr.reshape(shape)),
                jnp.asarray(sl2),
                jnp.asarray(row.reshape(shape)),
                jnp.asarray(src))


def refetch_flags(keys2d: np.ndarray, bit: int) -> np.ndarray:
    """Per-chunk fetch-source bitmask for a manually-DMA'd resident.

    ``bit`` is set at a run start whose region was already WRITTEN BACK
    earlier in the same pass: the kernel must re-fetch it from the
    (input-output aliased) OUTPUT buffer. On real TPU in/out are the
    same HBM buffer and the flag changes nothing; in interpret mode
    (tests) aliasing is NOT simulated, so reading the input ref after a
    writeback returns stale data — the flag restores exact semantics.
    keys2d: [num_passes, pass_len] region ids (runs = residency)."""
    flags = np.zeros(keys2d.shape, np.int32)
    for p in range(keys2d.shape[0]):
        kp = keys2d[p]
        starts = np.concatenate(
            [[0], np.nonzero(np.diff(kp))[0] + 1])
        seen = set()
        prev = None
        for s in starts:
            v = int(kp[s])
            if prev is not None:
                seen.add(prev)     # writeback of the departing region
            if v in seen:
                flags[p, s] |= bit
            prev = v
    return flags


# the tiled epoch's slab budget: smaller than the resident kernel's item
# table budget — Mosaic's scoped-VMEM accounting charges roughly 2x the
# slab (scratch + ANY-space staging), and the scoped limit is 16MB
TILED_SLAB_BYTES = 4 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=("n_ub", "B", "npass", "P"))
def _device_tiled_order(ub_c, ib_c, key, *, n_ub: int, B: int,
                        npass: int, P: int):
    """Device-side epoch_order for the tiled plan: chunks sorted
    (slab, ublock) with uniform in-cell shuffle — same semantics as
    MxuTiledPlan.epoch_order, but fused dispatches instead of a host
    argsort + five host->device transfers per epoch (~0.2 s/epoch of
    host glue at 33k+ chunks, the measured gap between the 41.4M raw
    tiled-BPR kernel and the 23.5M model path; VERDICT r4 #2).

    The in-cell shuffle is exact-uniform via a two-stage sort: argsort
    random keys first, then a STABLE argsort of the integer cell ids —
    full f32 randomness within cells, no precision coupling between
    cell id magnitude and tie-break bits.

    Refetch-source flags are ZERO here: on real TPU the kernels'
    in/out table refs alias the same HBM buffer, so the fetch-source
    selection is a no-op (the flags exist only because interpret mode
    does not simulate input_output_aliases — interpret runs keep the
    host path)."""
    nc = ub_c.shape[0]
    isl_c = ib_c // B
    ibr_c = ib_c - isl_c * B
    r = jax.random.uniform(key, (nc,), dtype=jnp.float32)
    p1 = jnp.argsort(r)
    cell = isl_c * n_ub + ub_c
    p2 = jnp.argsort(cell[p1], stable=True)
    perm = p1[p2].astype(jnp.int32)
    tot = npass * P
    idx = jnp.minimum(jnp.arange(tot), nc - 1)

    def pad(a):
        return a[perm][idx].reshape(npass, P)

    row = jnp.where(jnp.arange(tot) < nc, perm[idx],
                    nc).astype(jnp.int32).reshape(npass, P)
    src = jnp.zeros((npass, P), jnp.int32)
    return pad(ub_c), pad(ibr_c), pad(isl_c), row, src


def device_tiled_epoch_order(plan: "MxuTiledPlan", seed: int):
    """epoch_order computed on device (REAL-TPU tiled path only — the
    zero refetch flags are wrong under interpret mode, see
    _device_tiled_order)."""
    dev = plan.__dict__.get("_dev_cols")
    if dev is None:
        dev = (jnp.asarray(plan.ub_c), jnp.asarray(plan.ib_c))
        plan.__dict__["_dev_cols"] = dev
    key = jax.random.key(int(seed) & 0x7FFFFFFF, impl="unsafe_rbg")
    return _device_tiled_order(
        dev[0], dev[1], key, n_ub=plan.n_ublocks,
        B=min(plan.slab_blocks, plan.n_iblocks),
        npass=plan.num_passes, P=plan.pass_len)


def default_slab_blocks(num_factors: int, item_block: int = 1024) -> int:
    """Largest slab (in item blocks) fitting the tiled VMEM budget."""
    fe = max(64, _round_up(num_factors + 2, 8))
    return max(TILED_SLAB_BYTES // (item_block * fe * 4), 1)


def prepare_mxu_tiled(users, items, values, num_users: int, num_items: int,
                      *, user_block: int = 512, item_block: int = 1024,
                      chunk=None, slab_blocks: int = 8,
                      shuffle_seed=0, pass_len: int = 8192) -> MxuTiledPlan:
    """prepare_mxu_data + regroup the chunks into item-table slabs."""
    plan = prepare_mxu_data(users, items, values, num_users, num_items,
                            user_block=user_block, item_block=item_block,
                            chunk=chunk, shuffle_seed=shuffle_seed)
    B0 = min(slab_blocks, plan.n_iblocks)
    S = (plan.n_iblocks + B0 - 1) // B0
    P = min(pass_len, max(plan.num_chunks, 1))
    n_pass = max((plan.num_chunks + P - 1) // P, 1)
    zero = jnp.zeros((1,) + tuple(plan.packed.shape[1:]), jnp.int32)
    return MxuTiledPlan(
        num_slabs=S, num_passes=n_pass, pass_len=P, chunk=plan.chunk,
        user_block=plan.user_block, item_block=plan.item_block,
        slab_blocks=B0, n_ublocks=plan.n_ublocks, n_iblocks=plan.n_iblocks,
        num_users=num_users, num_items=num_items, n_ratings=plan.n_ratings,
        packed=jnp.concatenate([plan.packed, zero]),
        ub_c=plan.ub_c, ib_c=plan.ib_c,
        new_of_old=plan.new_of_old, old_of_new=plan.old_of_new)


def _mxu_sgd_tiled_kernel(ub_ref, ib_ref, sl_ref, row_ref, src_ref,
                          w_hbm, h_hbm, data_ref, rates_ref, hp_ref,
                          w_out, h_out,
                          w_vmem, h_vmem, sem_w, sem_h, *,
                          loss: int, biased: bool, C: int, UB: int,
                          IB: int, SLAB: int, mxu_dtype):
    """Flat-grid tiled SGD step: same math as _mxu_sgd_kernel, but BOTH
    the user block and the item-table slab live in VMEM scratch and are
    swapped by explicit blocking DMA when the prefetched ublock/slab id
    changes. Blocking (start+wait in program order) makes revisits safe:
    a block's writeback always completes before any refetch of the same
    HBM region — the ordering a BlockSpec-pipelined operand cannot
    guarantee once blocks are revisited across slabs.

    Tables are TRANSPOSED here ([fe, rows], unlike the resident
    kernel): Mosaic requires HBM slices to be lane-tile (128) aligned
    in the minor dim, which fe=64 can never satisfy — with rows minor,
    every slice offset/extent is a multiple of UB/IB/SLAB >= 128. The
    compute already runs in [fe, C] orientation, so only the
    gather/scatter contraction dims change."""
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    first = c == 0
    cur_ub = ub_ref[c]
    prev_ub = ub_ref[jnp.maximum(c - 1, 0)]
    cur_sl = sl_ref[c]
    prev_sl = sl_ref[jnp.maximum(c - 1, 0)]

    # src_ref: refetch-source bitmask (see refetch_flags) — regions
    # already written back this pass re-fetch from the aliased OUTPUT
    # ref (no-op on real TPU; exact under interpret, which does not
    # simulate input_output_aliases)
    src = src_ref[c]
    from_out_h = (src & 2) != 0
    from_out_w = (src & 1) != 0

    @pl.when(first | (cur_sl != prev_sl))
    def _():
        @pl.when(jnp.logical_not(first))
        def _():
            cp = pltpu.make_async_copy(
                h_vmem, h_out.at[:, pl.ds(prev_sl * SLAB, SLAB)], sem_h)
            cp.start()
            cp.wait()

        @pl.when(jnp.logical_not(from_out_h))
        def _():
            cp = pltpu.make_async_copy(
                h_hbm.at[:, pl.ds(cur_sl * SLAB, SLAB)], h_vmem, sem_h)
            cp.start()
            cp.wait()

        @pl.when(from_out_h)
        def _():
            cp = pltpu.make_async_copy(
                h_out.at[:, pl.ds(cur_sl * SLAB, SLAB)], h_vmem, sem_h)
            cp.start()
            cp.wait()

    @pl.when(first | (cur_ub != prev_ub))
    def _():
        @pl.when(jnp.logical_not(first))
        def _():
            cp = pltpu.make_async_copy(
                w_vmem, w_out.at[:, pl.ds(prev_ub * UB, UB)], sem_w)
            cp.start()
            cp.wait()

        @pl.when(jnp.logical_not(from_out_w))
        def _():
            cp = pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(cur_ub * UB, UB)], w_vmem, sem_w)
            cp.start()
            cp.wait()

        @pl.when(from_out_w)
        def _():
            cp = pltpu.make_async_copy(
                w_out.at[:, pl.ds(cur_ub * UB, UB)], w_vmem, sem_w)
            cp.start()
            cp.wait()

    ib = ib_ref[c]
    d = data_ref[0]                      # [4, C] int32 (one DMA per chunk)
    u = d[0:1]                           # [1, C] int32, local in user block
    i = d[1:2]                           # [1, C] int32, local in item block
    v = pltpu.bitcast(d[2:3], jnp.float32)
    wt = pltpu.bitcast(d[3:4], jnp.float32)

    Wb = w_vmem[:]                       # [fe, UB] f32
    Hb = h_vmem[:, pl.ds(ib * IB, IB)]   # [fe, IB] f32

    put = (jax.lax.broadcasted_iota(jnp.int32, (UB, C), 0)
           == u).astype(mxu_dtype)       # [UB, C] one-hot
    pit = (jax.lax.broadcasted_iota(jnp.int32, (IB, C), 0)
           == i).astype(mxu_dtype)       # [IB, C]

    wu = jax.lax.dot_general(
        Wb.astype(mxu_dtype), put, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [fe, C]
    hi = jax.lax.dot_general(
        Hb.astype(mxu_dtype), pit, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [fe, C]

    score = jnp.sum(wu * hi, axis=0, keepdims=True)    # [1, C]
    gb = hp_ref[0, 0]
    if biased:
        sig = jax.nn.sigmoid(score + gb)
        pred = hp_ref[0, 1] + sig * hp_ref[0, 2]
        g_com = _gradient_common(loss, v - pred, sig, hp_ref[0, 2]) * wt
    else:
        g_com = (v - (score + gb)) * wt

    w_lr = rates_ref[:, 0:1]
    w_reg = rates_ref[:, 1:2]
    h_lr = rates_ref[:, 2:3]
    h_reg = rates_ref[:, 3:4]
    delta_w = w_lr * (g_com * hi - wt * w_reg * wu)    # [fe, C]
    delta_h = h_lr * (g_com * wu - wt * h_reg * hi)

    w_vmem[:] = Wb + jax.lax.dot_general(
        delta_w.astype(mxu_dtype), put, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [fe, UB]
    h_vmem[:, pl.ds(ib * IB, IB)] = Hb + jax.lax.dot_general(
        delta_h.astype(mxu_dtype), pit, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [fe, IB]

    @pl.when(c == nc - 1)
    def _():
        cp = pltpu.make_async_copy(
            w_vmem, w_out.at[:, pl.ds(cur_ub * UB, UB)], sem_w)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(
            h_vmem, h_out.at[:, pl.ds(cur_sl * SLAB, SLAB)], sem_h)
        cp.start()
        cp.wait()


def _sgd_tiled_pallas_call(*, meta, num_slabs: int, loss: int,
                           biased: bool, dt, interpret: bool):
    """The tiled-SGD pallas_call (one pass over a flat slab-major
    schedule) — shared by the single-device scan-over-passes epoch and
    the per-(device, sub-epoch) calls of the sharded+tiled epoch."""
    P, C, UB, IB, n_ub, slab_rows, fe = meta

    kernel = functools.partial(
        _mxu_sgd_tiled_kernel, loss=loss, biased=biased, C=C, UB=UB,
        IB=IB, SLAB=slab_rows, mxu_dtype=dt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # W (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # H (HBM)
            pl.BlockSpec((1, 4, C),
                         lambda c, ub, ib, sl, row, sr: (row[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fe, 4), lambda c, ub, ib, sl, row, sr: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda c, ub, ib, sl, row, sr: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((fe, UB), jnp.float32),
            pltpu.VMEM((fe, slab_rows), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((fe, n_ub * UB), jnp.float32),
            jax.ShapeDtypeStruct((fe, num_slabs * slab_rows), jnp.float32),
        ],
        # inputs: 0..4 scalar prefetch, 5 = W, 6 = H
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("meta", "num_slabs", "loss", "biased", "mxu_dtype",
                     "interpret"),
    donate_argnames=("W_ext", "H_ext"))
def sgd_epoch_mxu_tiled(W_ext, H_ext, data, order, hp_vec, rates, *,
                        meta, num_slabs: int, loss: int, biased: bool,
                        mxu_dtype: str = "bf16", interpret: bool = False):
    """One epoch over the flat slab-major schedule: a single kernel
    instance (one Mosaic compile) scanned over fixed-size passes; the
    item slab + user block swap by in-kernel blocking DMA only when the
    prefetched ids change, so schedule length — and epoch cost — scales
    with the REAL chunk count, independent of per-slab skew. meta =
    plan.meta(fe); data = plan.packed; order = plan.epoch_order(seed)
    ([num_passes, pass_len] arrays)."""
    ub, ibr, sl, row, src = order
    dt = jnp.bfloat16 if mxu_dtype == "bf16" else jnp.float32

    call = _sgd_tiled_pallas_call(meta=meta, num_slabs=num_slabs,
                                  loss=loss, biased=biased, dt=dt,
                                  interpret=interpret)

    def body(carry, xs):
        W, H = carry
        ub_s, ib_s, sl_s, row_s, src_s = xs
        W, H = call(ub_s, ib_s, sl_s, row_s, src_s, W, H, data, rates,
                    hp_vec)
        return (W, H), None

    # transposed table views (see kernel docstring); the transposes are
    # two fused relayout passes at HBM bandwidth, amortized per epoch
    Wt = W_ext.T
    Ht = H_ext.T
    (Wt, Ht), _ = jax.lax.scan(body, (Wt, Ht), (ub, ibr, sl, row, src))
    return Wt.T, Ht.T


def mxu_sharded_supported(num_items: int, num_factors: int,
                          num_devices: int,
                          item_block: int = 1024) -> bool:
    """Whether the mesh-sharded DSGD MXU epoch applies: each device
    holds one of ``num_devices`` item-table partitions in VMEM, so the
    per-device budget is the resident kernel's divided across the mesh
    (catalogs up to ~num_devices x the single-chip VMEM bound)."""
    if num_devices < 2:
        return False
    fe = max(64, _round_up(num_factors + 2, 8))
    n_ib = max((num_items + item_block - 1) // item_block, 1)
    part_blocks = max((n_ib + num_devices - 1) // num_devices, 1)
    return part_blocks * item_block * fe * 4 <= VMEM_ITEM_TABLE_BYTES


def mxu_tiled_supported(num_items: int, num_factors: int,
                        item_block: int = 1024, slab_blocks: int = None,
                        max_slabs: int = 128) -> bool:
    """Whether the slab-tiled epoch applies: one slab in VMEM, catalog
    within max_slabs slabs (bounds the padded item-table footprint; the
    flat schedule's cost is slab-count independent)."""
    if slab_blocks is None:
        slab_blocks = default_slab_blocks(num_factors, item_block)
    fe = max(64, _round_up(num_factors + 2, 8))
    if slab_blocks * item_block * fe * 4 > VMEM_ITEM_TABLE_BYTES:
        return False
    n_ib = max((num_items + item_block - 1) // item_block, 1)
    return (n_ib + slab_blocks - 1) // slab_blocks <= max_slabs


# ---------------------------------------------------------------------------
# mesh-sharded variant: DSGD over devices, per-shard MXU kernel
# ---------------------------------------------------------------------------
#
# The multi-chip mapping of the reference's Gemulla DSGD schedule
# (MultiCore.cs:43-73, BiasedMatrixFactorization.cs:206-215) for the MXU
# kernel: user blocks partition over the mesh (each device owns a
# contiguous ublock range = its W shard), the item table partitions into
# D slabs that ROTATE around the ring via ppermute — at sub-epoch k,
# device d processes the chunks of (its users) x (partition (d+k) % D)
# with that partition resident in VMEM. Within a sub-epoch all devices
# touch disjoint W rows and disjoint H partitions (the diagonal
# schedule), so the parallel result is BIT-IDENTICAL to processing the
# cells sequentially — tested against the numpy oracle.


@dataclass
class MxuShardedPlan:
    """Host-side layout for the mesh-sharded DSGD MXU epoch."""
    num_devices: int
    nc_pad: int              # per-(device, sub-epoch) grid size
    chunk: int
    user_block: int
    item_block: int
    ub_per_dev: int          # ublocks per device
    part_blocks: int         # item blocks per partition
    num_users: int
    num_items: int
    n_ratings: int
    # [nc + 1, 4, C]: all real chunks + one all-zero pad chunk (index nc)
    packed: jnp.ndarray = field(repr=False)
    ub_c: np.ndarray = field(repr=False)
    ib_c: np.ndarray = field(repr=False)
    cells: list = field(repr=False)           # [d][k] -> chunk rows
    new_of_old: np.ndarray = field(repr=False)
    old_of_new: np.ndarray = field(repr=False)

    @property
    def u_pad_dev(self) -> int:
        return self.ub_per_dev * self.user_block

    @property
    def u_pad(self) -> int:
        return self.num_devices * self.u_pad_dev

    @property
    def part_rows(self) -> int:
        return self.part_blocks * self.item_block

    @property
    def i_pad(self) -> int:
        return self.num_devices * self.part_rows

    def meta(self, fe: int) -> tuple:
        # the per-device, per-sub-epoch call geometry (_mxu_epoch_call)
        return (self.nc_pad, self.chunk, self.user_block, self.item_block,
                self.ub_per_dev, self.part_rows, fe)

    def epoch_order(self, seed) -> tuple:
        """[D, D, nc_pad] arrays (ub_rel, ib_rel, row): axis 0 = device,
        axis 1 = sub-epoch. ub_rel is device-relative, ib_rel
        partition-relative; chunks stay grouped by ublock within a cell,
        shuffled within groups; pads repeat the last real ublock and
        point at the all-zero pad chunk."""
        D, nc_pad = self.num_devices, self.nc_pad
        zero_row = self.packed.shape[0] - 1
        rng = None if seed is None else np.random.default_rng(seed)
        ub = np.zeros((D, D, nc_pad), np.int32)
        ib = np.zeros((D, D, nc_pad), np.int32)
        row = np.full((D, D, nc_pad), zero_row, np.int32)
        for d in range(D):
            for k in range(D):
                rows = self.cells[d][k]
                if rows.size == 0:
                    continue
                if rng is None:
                    perm = np.arange(rows.size)
                else:
                    perm = np.argsort(
                        self.ub_c[rows].astype(np.float64) * 2.0
                        + rng.random(rows.size), kind="stable")
                r = rows[perm]
                p = (d + k) % D
                ub[d, k, :r.size] = self.ub_c[r] - d * self.ub_per_dev
                ib[d, k, :r.size] = self.ib_c[r] - p * self.part_blocks
                row[d, k, :r.size] = r
                ub[d, k, r.size:] = ub[d, k, r.size - 1]
        return jnp.asarray(ub), jnp.asarray(ib), jnp.asarray(row)


def prepare_mxu_sharded(users, items, values, num_users: int,
                        num_items: int, num_devices: int, *,
                        user_block: int = 512, item_block: int = 1024,
                        chunk: int = 640, shuffle_seed=0) -> MxuShardedPlan:
    """prepare_mxu_data + regroup chunks into the DSGD (device x
    sub-epoch) diagonal cells."""
    D = num_devices
    plan = prepare_mxu_data(users, items, values, num_users, num_items,
                            user_block=user_block, item_block=item_block,
                            chunk=chunk, shuffle_seed=shuffle_seed)
    ub_per_dev = max((plan.n_ublocks + D - 1) // D, 1)
    part_blocks = max((plan.n_iblocks + D - 1) // D, 1)
    dev_of = plan.ub_c // ub_per_dev
    part_of = plan.ib_c // part_blocks
    cells = []
    nc_pad = 1
    for d in range(D):
        per_k = []
        for k in range(D):
            p = (d + k) % D
            rows = np.nonzero((dev_of == d) & (part_of == p))[0]
            nc_pad = max(nc_pad, rows.size)
            per_k.append(rows)
        cells.append(per_k)
    zero = jnp.zeros((1,) + tuple(plan.packed.shape[1:]), jnp.int32)
    return MxuShardedPlan(
        num_devices=D, nc_pad=nc_pad, chunk=plan.chunk,
        user_block=plan.user_block, item_block=plan.item_block,
        ub_per_dev=ub_per_dev, part_blocks=part_blocks,
        num_users=num_users, num_items=num_items, n_ratings=plan.n_ratings,
        packed=jnp.concatenate([plan.packed, zero]),
        ub_c=plan.ub_c, ib_c=plan.ib_c, cells=cells,
        new_of_old=plan.new_of_old, old_of_new=plan.old_of_new)


def sgd_epoch_mxu_sharded(mesh, W_ext, H_ext, data, order, hp_vec, rates,
                          *, meta, loss: int, biased: bool,
                          mxu_dtype: str = "bf16",
                          interpret: bool = False):
    """One DSGD epoch over the mesh: D sub-epochs, each a per-device MXU
    kernel pass over (device users) x (rotating item partition), with
    the partition ring-shifted via ppermute between sub-epochs.

    W_ext [plan.u_pad, fe] row-sharded over the mesh axis; H_ext
    [plan.i_pad, fe] row-sharded (device d starts holding partition d;
    the rotation returns every partition home after D sub-epochs);
    data = plan.packed replicated; order = plan.epoch_order(seed)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    nc, C, UB, IB, ub_per_dev, part_rows, fe = meta
    D = mesh.devices.size
    axis = mesh.axis_names[0]
    dt = jnp.bfloat16 if mxu_dtype == "bf16" else jnp.float32
    ring = [((i + 1) % D, i) for i in range(D)]

    def device_fn(W_loc, H_part, data_full, ub_d, ib_d, row_d, hp, rt):
        def sub(carry, xs):
            W_loc, H_part = carry
            ub_k, ib_k, row_k = xs
            W_loc, H_part = _mxu_epoch_call(
                W_loc, H_part, data_full, ub_k, ib_k, row_k, hp, rt,
                meta=meta, loss=loss, biased=biased, dt=dt,
                interpret=interpret)
            H_part = jax.lax.ppermute(H_part, axis, ring)
            return (W_loc, H_part), None

        (W_loc, H_part), _ = jax.lax.scan(
            sub, (W_loc, H_part), (ub_d[0], ib_d[0], row_d[0]))
        return W_loc, H_part

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None), P(), P()),
        out_specs=(P(axis, None), P(axis, None)),
        # pallas out_shapes carry no vma annotations; correctness is by
        # construction (disjoint diagonal cells) and tested bit-exactly
        check_vma=False)
    ub, ib, row = order
    return fn(W_ext, H_ext, data, ub, ib, row, hp_vec, rates)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "meta", "loss", "biased", "mxu_dtype",
                     "interpret"),
    donate_argnames=("W_ext", "H_ext"))
def sgd_epoch_mxu_sharded_jit(mesh, W_ext, H_ext, data, ub, ib, row,
                              hp_vec, rates, *, meta, loss: int,
                              biased: bool, mxu_dtype: str = "bf16",
                              interpret: bool = False):
    """Cached-jit entry for the model layer: one compile per (mesh,
    meta, loss, biased) — per-epoch calls re-dispatch the executable
    instead of re-tracing the shard_map closure."""
    return sgd_epoch_mxu_sharded(
        mesh, W_ext, H_ext, data, (ub, ib, row), hp_vec, rates,
        meta=meta, loss=loss, biased=biased, mxu_dtype=mxu_dtype,
        interpret=interpret)


# ---------------------------------------------------------------------------
# mesh-sharded + slab-tiled variant: big catalogs on a mesh
# ---------------------------------------------------------------------------
#
# The missing quadrant (VERDICT r4 missing #1): the resident sharded
# epoch needs each device's 1/D item-table PARTITION in VMEM, so at
# KDD-Cup scale (624,961 items, fe=64 -> 19.25MB/device on 8 devices)
# any mesh fell back to the XLA epoch — adding chips made training
# ~25x slower at exactly the scale chips are for. Here the two designs
# compose: the DSGD diagonal schedule over the mesh (user blocks
# partition, item partitions rotate via ppermute — MultiCore.cs:43-73)
# with the flat slab-tiled kernel per device (the partition lives in
# device HBM; one slab + one user block stream through VMEM by
# in-kernel blocking DMA). Each (device, sub-epoch) cell is one
# pallas pass over that cell's chunks sorted (slab, ublock); the cells
# are conflict-free by construction (disjoint W rows, disjoint H
# partitions), so the epoch is bit-identical to processing the cells
# sequentially — tested in tests/test_mxu_sharded_tiled.py.


@dataclass
class MxuShardedTiledPlan:
    """Host-side layout for the mesh-sharded slab-tiled MXU epoch."""
    num_devices: int
    nc_pad: int              # per-(device, sub-epoch) grid size
    chunk: int
    user_block: int
    item_block: int
    ub_per_dev: int          # ublocks per device
    part_blocks: int         # item blocks per partition (multiple of
    slab_blocks: int         # slab_blocks, so partitions tile evenly)
    n_ublocks: int
    n_iblocks: int
    num_users: int
    num_items: int
    n_ratings: int
    # [nc + 1, 4, C]: all real chunks + one all-zero pad chunk
    packed: jnp.ndarray = field(repr=False)
    ub_c: np.ndarray = field(repr=False)
    ib_c: np.ndarray = field(repr=False)
    cells: list = field(repr=False)           # [d][k] -> chunk rows
    new_of_old: np.ndarray = field(repr=False)
    old_of_new: np.ndarray = field(repr=False)

    @property
    def u_pad_dev(self) -> int:
        return self.ub_per_dev * self.user_block

    @property
    def u_pad(self) -> int:
        return self.num_devices * self.u_pad_dev

    @property
    def part_rows(self) -> int:
        return self.part_blocks * self.item_block

    @property
    def i_pad(self) -> int:
        return self.num_devices * self.part_rows

    @property
    def slab_rows(self) -> int:
        return self.slab_blocks * self.item_block

    @property
    def slabs_per_part(self) -> int:
        return self.part_blocks // self.slab_blocks

    def meta(self, fe: int) -> tuple:
        # per-(device, sub-epoch) tiled-call geometry
        # (_sgd_tiled_pallas_call's meta contract)
        return (self.nc_pad, self.chunk, self.user_block,
                self.item_block, self.ub_per_dev, self.slab_rows, fe)

    def epoch_order(self, seed) -> tuple:
        """[D, D, nc_pad] arrays (ub_rel, ibr, isl_rel, row, src):
        axis 0 = device, axis 1 = sub-epoch. ub_rel device-relative,
        isl_rel partition-relative slab, ibr slab-relative block.
        Chunks sorted (slab, ublock) within a cell with in-cell
        shuffle; pads repeat the last real residency ids and point at
        the all-zero pad chunk. src = refetch-source flags per cell
        (each cell is its own pallas pass)."""
        D, nc_pad = self.num_devices, self.nc_pad
        B = self.slab_blocks
        zero_row = self.packed.shape[0] - 1
        rng = None if seed is None else np.random.default_rng(seed)
        ub = np.zeros((D, D, nc_pad), np.int32)
        ibr = np.zeros((D, D, nc_pad), np.int32)
        isl = np.zeros((D, D, nc_pad), np.int32)
        row = np.full((D, D, nc_pad), zero_row, np.int32)
        for d in range(D):
            for k in range(D):
                rows = self.cells[d][k]
                if rows.size == 0:
                    continue
                p = (d + k) % D
                ib_rel = self.ib_c[rows] - p * self.part_blocks
                sl = ib_rel // B
                key = (sl.astype(np.float64) * (2.0 * self.n_ublocks)
                       + self.ub_c[rows] * 2.0)
                if rng is not None:
                    key = key + rng.random(rows.size)
                perm = np.argsort(key, kind="stable")
                r = rows[perm]
                n = r.size
                ub[d, k, :n] = self.ub_c[r] - d * self.ub_per_dev
                isl[d, k, :n] = sl[perm]
                ibr[d, k, :n] = ib_rel[perm] - sl[perm] * B
                row[d, k, :n] = r
                ub[d, k, n:] = ub[d, k, n - 1]
                isl[d, k, n:] = isl[d, k, n - 1]
                ibr[d, k, n:] = ibr[d, k, n - 1]
        flat = (D * D, nc_pad)
        src = (refetch_flags(ub.reshape(flat), 1)
               | refetch_flags(isl.reshape(flat), 2)).reshape(ub.shape)
        return (jnp.asarray(ub), jnp.asarray(ibr), jnp.asarray(isl),
                jnp.asarray(row), jnp.asarray(src.astype(np.int32)))


def prepare_mxu_sharded_tiled(users, items, values, num_users: int,
                              num_items: int, num_devices: int, *,
                              user_block: int = 512,
                              item_block: int = 1024, chunk=None,
                              slab_blocks: int = 8,
                              shuffle_seed=0) -> MxuShardedTiledPlan:
    """prepare_mxu_data + regroup chunks into DSGD (device x sub-epoch)
    diagonal cells whose item partitions tile into VMEM-size slabs.
    ``slab_blocks`` should come from ``default_slab_blocks(f)`` (the
    caller knows the factor count)."""
    D = num_devices
    plan = prepare_mxu_data(users, items, values, num_users, num_items,
                            user_block=user_block, item_block=item_block,
                            chunk=chunk, shuffle_seed=shuffle_seed)
    ub_per_dev = max((plan.n_ublocks + D - 1) // D, 1)
    raw_pb = max((plan.n_iblocks + D - 1) // D, 1)
    B = max(min(slab_blocks, raw_pb), 1)
    part_blocks = _round_up(raw_pb, B)        # whole slabs per partition
    dev_of = plan.ub_c // ub_per_dev
    part_of = plan.ib_c // part_blocks
    cells = []
    nc_pad = 1
    for d in range(D):
        per_k = []
        for k in range(D):
            p = (d + k) % D
            rows = np.nonzero((dev_of == d) & (part_of == p))[0]
            nc_pad = max(nc_pad, rows.size)
            per_k.append(rows)
        cells.append(per_k)
    zero = jnp.zeros((1,) + tuple(plan.packed.shape[1:]), jnp.int32)
    return MxuShardedTiledPlan(
        num_devices=D, nc_pad=nc_pad, chunk=plan.chunk,
        user_block=plan.user_block, item_block=plan.item_block,
        ub_per_dev=ub_per_dev, part_blocks=part_blocks, slab_blocks=B,
        n_ublocks=plan.n_ublocks, n_iblocks=plan.n_iblocks,
        num_users=num_users, num_items=num_items,
        n_ratings=plan.n_ratings,
        packed=jnp.concatenate([plan.packed, zero]),
        ub_c=plan.ub_c, ib_c=plan.ib_c, cells=cells,
        new_of_old=plan.new_of_old, old_of_new=plan.old_of_new)


def sgd_epoch_mxu_sharded_tiled(mesh, W_ext, H_ext, data, order, hp_vec,
                                rates, *, meta, slabs_per_part: int,
                                loss: int, biased: bool,
                                mxu_dtype: str = "bf16",
                                interpret: bool = False):
    """One DSGD epoch over the mesh with slab-tiled partitions: D
    sub-epochs, each a per-device TILED kernel pass over (device
    users) x (rotating item partition), the partition resident in
    device HBM and streamed through VMEM slab by slab; partitions
    ring-shift via ppermute between sub-epochs.

    W_ext [plan.u_pad, fe] row-sharded; H_ext [plan.i_pad, fe]
    row-sharded (device d starts holding partition d); data =
    plan.packed replicated; order = plan.epoch_order(seed)
    ([D, D, nc_pad] arrays, sharded on axis 0)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    D = mesh.devices.size
    axis = mesh.axis_names[0]
    dt = jnp.bfloat16 if mxu_dtype == "bf16" else jnp.float32
    ring = [((i + 1) % D, i) for i in range(D)]

    call = _sgd_tiled_pallas_call(meta=meta, num_slabs=slabs_per_part,
                                  loss=loss, biased=biased, dt=dt,
                                  interpret=interpret)

    def device_fn(W_loc, H_part, data_full, ub_d, ib_d, sl_d, row_d,
                  src_d, hp, rt):
        def sub(carry, xs):
            Wt, Ht = carry
            ub_k, ib_k, sl_k, row_k, src_k = xs
            Wt, Ht = call(ub_k, ib_k, sl_k, row_k, src_k, Wt, Ht,
                          data_full, rt, hp)
            Ht = jax.lax.ppermute(Ht, axis, ring)
            return (Wt, Ht), None

        (Wt, Ht), _ = jax.lax.scan(
            sub, (W_loc.T, H_part.T),
            (ub_d[0], ib_d[0], sl_d[0], row_d[0], src_d[0]))
        return Wt.T, Ht.T

    fn = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(),
                  P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(), P()),
        out_specs=(P(axis, None), P(axis, None)),
        # pallas out_shapes carry no vma annotations; correctness is by
        # construction (disjoint diagonal cells) and tested bit-exactly
        check_vma=False)
    ub, ibr, sl, row, src = order
    return fn(W_ext, H_ext, data, ub, ibr, sl, row, src, hp_vec, rates)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "meta", "slabs_per_part", "loss", "biased",
                     "mxu_dtype", "interpret"),
    donate_argnames=("W_ext", "H_ext"))
def sgd_epoch_mxu_sharded_tiled_jit(mesh, W_ext, H_ext, data, ub, ibr,
                                    sl, row, src, hp_vec, rates, *, meta,
                                    slabs_per_part: int, loss: int,
                                    biased: bool, mxu_dtype: str = "bf16",
                                    interpret: bool = False):
    """Cached-jit entry for the model layer (one compile per mesh+meta;
    per-epoch calls re-dispatch)."""
    return sgd_epoch_mxu_sharded_tiled(
        mesh, W_ext, H_ext, data, (ub, ibr, sl, row, src), hp_vec,
        rates, meta=meta, slabs_per_part=slabs_per_part, loss=loss,
        biased=biased, mxu_dtype=mxu_dtype, interpret=interpret)


def mxu_sharded_tiled_supported(num_items: int, num_factors: int,
                                num_devices: int, item_block: int = 1024,
                                slab_blocks: int = None,
                                max_slabs_per_part: int = 128) -> bool:
    """Whether the mesh-sharded slab-tiled epoch applies: one slab in
    VMEM per device, each device's partition within max_slabs_per_part
    slabs. Covers catalogs up to ~num_devices x the single-chip TILED
    bound — effectively any realistic catalog on any mesh."""
    if num_devices < 2:
        return False
    if slab_blocks is None:
        slab_blocks = default_slab_blocks(num_factors, item_block)
    fe = max(64, _round_up(num_factors + 2, 8))
    if slab_blocks * item_block * fe * 4 > VMEM_ITEM_TABLE_BYTES:
        return False
    n_ib = max((num_items + item_block - 1) // item_block, 1)
    part_blocks = _round_up(max((n_ib + num_devices - 1) // num_devices,
                                1), slab_blocks)
    return part_blocks // slab_blocks <= max_slabs_per_part
