"""MXU-blocked SVD++ epoch: the grouped segment-sum epoch as one-hot
systolic matmuls.

TPU-native fast path for the reference's heaviest rating-side loop
(``SVDPlusPlus.cs:157-213``: per rating, scan the user's WHOLE history
to form the implicit vector, then update q/biases and every y_j in the
history). The XLA grouped epoch (``ops/svdpp.py``) batches that per
user group but is scatter-bound on the y/q table updates (7.71M
updates/s at the Netflix shape — BASELINE r4); here every gather
becomes ``table @ one_hot`` and every scatter-add ``delta @ one_hot.T``
— MXU matmuls — on the machinery of ``ops/pallas_sgd.py``.

The epoch is a flat schedule of fixed-size chunks over THREE phases,
contiguous per user block:

- **S** (history edges): the per-user implicit sums
  ``s_u = sum_{j in I_u} y_j`` accumulate into a VMEM scratch
  ``s [fe, UB]`` via ``(Y_block-gather * w) @ put.T``.
- **R** (ratings): prediction + updates. The user row comes from the
  streamed W block ([p | b_u | 1 | inv_sqrt]); the effective user
  vector is ``p + s_u * |I_u|^{-1/2}``; q/bias rows update through the
  VMEM-resident Q table, and the y-update coefficients
  ``c_u = sum err * q_i * |I_u|^{-1/2}`` (+ the rating count ``n_u`` in
  row f) accumulate into a second scratch ``c [fe, UB]``.
- **Y** (history edges again): ``y_j += lr * (c_u - n_u * reg * y_j)``
  through the same edges — gathers from ``c``, scatter-adds into the
  VMEM-resident Y table.

Semantics vs the reference: s is held fixed per 512-user block (the
XLA epoch holds it per 16,384-user group; the reference recomputes per
rating), q/bias updates are minibatched per ~512-rating chunk (XLA:
4,096), and y updates apply once per user block (XLA: per group) — a
strictly FINER-grained schedule than the validated XLA epoch, so
trajectories sit between it and the reference's sequential SGD.
Validated against a numpy oracle of the phase semantics
(tests/test_pallas_svdpp.py) and by held-out RMSE at the ML-1M shape
(quality.py).

Both item-side tables (Q and Y) are VMEM-resident for the whole epoch
(manual DMA, transposed [fe, rows] layout — HBM slices must be
lane-tile aligned in the rows dim); catalogs beyond the budget
(``svdpp_mxu_supported``) fall back to the XLA grouped epoch. The
schedule is STATIC (the reference iterates ratings in index order,
SVDPlusPlus.cs:157; no per-epoch shuffle), so per-epoch host work is
zero: one dispatch re-runs the compiled scan. Passes split at user-
block boundaries only (bounds the SMEM scalar-prefetch footprint
without any interpret-vs-TPU aliasing hazard on the streamed W block);
the Q/Y tables re-fetch from the aliased OUTPUT ref on passes > 0
(per-pass flag — real-TPU no-op, exact under interpret).

Uniform (non-frequency) regularization only — the rates are per-column
constants, matching the reference defaults; frequency_regularization
keeps the XLA epoch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mymedialite_tpu.ops.pallas_sgd import _round_up, prepare_mxu_data
from mymedialite_tpu.ops.sgd import _gradient_common

# both tables resident: Q + Y, transposed [fe, i_pad] f32
SVDPP_VMEM_TABLE_BYTES = 8 * 1024 * 1024


def svdpp_fe(num_factors: int) -> int:
    """Extended column count: [factors | f: b_u / 1 | f+1: 1 / b_i |
    f+2: inv_sqrt / 0], rounded to a sublane multiple."""
    return max(32, _round_up(num_factors + 3, 8))


def svdpp_mxu_supported(num_items: int, num_factors: int,
                        item_block: int = 1024) -> bool:
    fe = svdpp_fe(num_factors)
    n_ib = max((num_items + item_block - 1) // item_block, 1)
    return 2 * n_ib * item_block * fe * 4 <= SVDPP_VMEM_TABLE_BYTES


@dataclass
class SvdppMxuPlan:
    """Host-side layout: ratings AND history edges double-blocked by
    (user_block x item_block) with one shared popularity-round-robin
    item permutation; a static 3-phase schedule (S/R/Y per user block)
    split into user-block-aligned passes."""
    num_passes: int
    pass_len: int
    chunk: int
    user_block: int
    item_block: int
    n_ublocks: int
    n_iblocks: int
    num_users: int
    num_items: int
    n_ratings: int
    n_edges: int
    # [nc_e + nc_r + 1, 4, C]: edge chunks, rating chunks, zero pad
    packed: jnp.ndarray = field(repr=False)
    # static schedule, [num_passes, pass_len] device int32
    ph: jnp.ndarray = field(repr=False)
    ub: jnp.ndarray = field(repr=False)
    ib: jnp.ndarray = field(repr=False)
    row: jnp.ndarray = field(repr=False)
    # [num_passes] int32: 0 = fetch Q/Y from input, 1 = from output
    first_flag: jnp.ndarray = field(repr=False)
    inv_sqrt: np.ndarray = field(repr=False)       # [u_pad] host f32
    new_of_old: np.ndarray = field(repr=False)
    old_of_new: np.ndarray = field(repr=False)

    @property
    def u_pad(self) -> int:
        return self.n_ublocks * self.user_block

    @property
    def i_pad(self) -> int:
        return self.n_iblocks * self.item_block

    def meta(self, fe: int) -> tuple:
        return (self.pass_len, self.chunk, self.user_block,
                self.item_block, self.n_ublocks, self.i_pad, fe)


def prepare_svdpp_mxu(r_users, r_items, r_values, h_users, h_items,
                      num_users: int, num_items: int, *,
                      user_block: int = 512, item_block: int = 1024,
                      chunk: int = 512, pass_len: int = 16384,
                      shuffle_seed=0,
                      block_align: int = 8) -> SvdppMxuPlan:
    """Bucket edges + ratings (shared item permutation), build the
    static S/R/Y schedule. Raises ValueError if any single user block's
    chunk count exceeds pass_len (callers fall back to the XLA epoch)."""
    h_users = np.asarray(h_users, dtype=np.int32)
    h_items = np.asarray(h_items, dtype=np.int32)
    plan_e = prepare_mxu_data(h_users, h_items,
                              np.zeros(len(h_users), np.float32),
                              num_users, num_items,
                              user_block=user_block,
                              item_block=item_block, chunk=chunk,
                              shuffle_seed=shuffle_seed,
                              block_align=block_align)
    plan_r = prepare_mxu_data(r_users, r_items, r_values, num_users,
                              num_items, user_block=user_block,
                              item_block=item_block, chunk=chunk,
                              shuffle_seed=shuffle_seed,
                              item_perm=plan_e.new_of_old,
                              block_align=block_align)
    assert plan_e.n_ublocks == plan_r.n_ublocks
    assert plan_e.chunk == plan_r.chunk
    nc_e, nc_r = plan_e.num_chunks, plan_r.num_chunks
    n_ub = plan_e.n_ublocks

    # per-ublock S/R/Y blocks (layout order is bucket-major, so ub_c is
    # non-decreasing: O(1) range lookup per ublock instead of nonzero
    # scans over the whole chunk list)
    def _offsets(ub_c):
        cnt = np.bincount(ub_c, minlength=n_ub)
        return np.concatenate([[0], np.cumsum(cnt)])

    e_off = _offsets(plan_e.ub_c)
    r_off = _offsets(plan_r.ub_c)
    blocks = []          # list of (ph, ub, ib, row) np arrays per ublock
    max_blk = 0
    for u in range(n_ub):
        e_idx = np.arange(e_off[u], e_off[u + 1])
        r_idx = np.arange(r_off[u], r_off[u + 1])
        n = 2 * e_idx.size + r_idx.size
        if n == 0:
            continue
        max_blk = max(max_blk, n)
        ph = np.concatenate([np.zeros(e_idx.size, np.int32),
                             np.ones(r_idx.size, np.int32),
                             np.full(e_idx.size, 2, np.int32)])
        ub = np.full(n, u, np.int32)
        ib = np.concatenate([plan_e.ib_c[e_idx], plan_r.ib_c[r_idx],
                             plan_e.ib_c[e_idx]]).astype(np.int32)
        row = np.concatenate([e_idx, nc_e + r_idx, e_idx]).astype(
            np.int32)
        blocks.append((ph, ub, ib, row))
    if max_blk > pass_len:
        raise ValueError(
            f"prepare_svdpp_mxu: a user block needs {max_blk} chunks "
            f"> pass_len {pass_len}; use the XLA epoch")

    # greedy user-block-aligned pass packing
    passes = []
    cur = []
    cur_n = 0
    for blk in blocks:
        n = blk[0].size
        if cur_n + n > pass_len and cur_n > 0:
            passes.append(cur)
            cur, cur_n = [], 0
        cur.append(blk)
        cur_n += n
    if cur:
        passes.append(cur)
    if not passes:
        passes = [[(np.zeros(1, np.int32), np.zeros(1, np.int32),
                    np.zeros(1, np.int32),
                    np.full(1, nc_e + nc_r, np.int32))]]
    npass = len(passes)
    zero_row = nc_e + nc_r
    ph = np.zeros((npass, pass_len), np.int32)
    ub = np.zeros((npass, pass_len), np.int32)
    ib = np.zeros((npass, pass_len), np.int32)
    row = np.full((npass, pass_len), zero_row, np.int32)
    for p, blks in enumerate(passes):
        pos = 0
        for (bp, bu, bb, br) in blks:
            n = bp.size
            ph[p, pos:pos + n] = bp
            ub[p, pos:pos + n] = bu
            ib[p, pos:pos + n] = bb
            row[p, pos:pos + n] = br
            pos += n
        if pos:
            # pad: phase S, zero-weight pad chunk, last ublock (no
            # spurious W-block swap), ib 0
            ub[p, pos:] = ub[p, pos - 1]

    # per-user 1/sqrt(|I_u|) on the kernel's padded user grid
    hist_count = np.bincount(h_users, minlength=plan_e.u_pad)
    inv_sqrt = np.where(hist_count > 0,
                        1.0 / np.sqrt(np.maximum(hist_count, 1.0)),
                        0.0).astype(np.float32)

    zero = jnp.zeros((1,) + tuple(plan_e.packed.shape[1:]), jnp.int32)
    return SvdppMxuPlan(
        num_passes=npass, pass_len=pass_len, chunk=plan_e.chunk,
        user_block=plan_e.user_block, item_block=plan_e.item_block,
        n_ublocks=n_ub, n_iblocks=plan_e.n_iblocks,
        num_users=num_users, num_items=num_items,
        n_ratings=len(np.asarray(r_users)), n_edges=len(h_users),
        packed=jnp.concatenate([plan_e.packed, plan_r.packed, zero]),
        ph=jnp.asarray(ph), ub=jnp.asarray(ub), ib=jnp.asarray(ib),
        row=jnp.asarray(row),
        first_flag=jnp.asarray(
            (np.arange(npass) > 0).astype(np.int32)),
        inv_sqrt=inv_sqrt,
        new_of_old=plan_e.new_of_old, old_of_new=plan_e.old_of_new)


@functools.partial(jax.jit, static_argnames=("u_pad", "i_pad", "fe"))
def svdpp_tables_to_mxu(p_mat, user_bias, inv_sqrt, q, item_bias, y,
                        new_of_old, *, u_pad: int, i_pad: int, fe: int):
    """params -> kernel layout. W [u_pad, fe] = [p | b_u | 1 |
    inv_sqrt]; Q [i_pad, fe] = [q | 1 | b_i] (items permuted); Y
    [i_pad, fe] = [y | 0...]."""
    U, f = p_mat.shape
    W = jnp.zeros((u_pad, fe), jnp.float32)
    rows = min(U, u_pad)
    W = W.at[:rows, :f].set(p_mat[:rows])
    W = W.at[:rows, f].set(user_bias[:rows])
    W = W.at[:rows, f + 1].set(1.0)
    W = W.at[:, f + 2].set(inv_sqrt[:u_pad])
    Q = jnp.zeros((i_pad, fe), jnp.float32)
    Q = Q.at[new_of_old, :f].set(q)
    Q = Q.at[new_of_old, f].set(1.0)
    Q = Q.at[new_of_old, f + 1].set(item_bias)
    Y = jnp.zeros((i_pad, fe), jnp.float32)
    Y = Y.at[new_of_old, :f].set(y)
    return W, Q, Y


@functools.partial(jax.jit, static_argnames=("num_users", "num_factors"))
def svdpp_tables_from_mxu(W, Q, Y, new_of_old, *, num_users: int,
                          num_factors: int):
    f = num_factors
    Qr = Q[new_of_old]
    return (W[:num_users, :f], W[:num_users, f], Qr[:, :f], Qr[:, f + 1],
            Y[new_of_old, :f])


def svdpp_mxu_rates(num_factors: int, fe: int, learn_rate, bias_learn_rate,
                    reg, bias_reg, y_reg, *, use_p: bool,
                    update_user: bool, update_item: bool):
    """[fe, 8] column-stacked rate/selector vectors:
    0 w_lr, 1 w_reg, 2 q_lr, 3 q_reg, 4 mf (factor-row mask),
    5 unused, 6 y_lr, 7 y_reg."""
    f = num_factors
    lr, blr = float(learn_rate), float(bias_learn_rate)
    out = np.zeros((fe, 8), np.float32)
    if use_p and update_user:
        out[:f, 0] = lr
    if update_user:
        out[f, 0] = blr * lr
    out[:f, 1] = float(reg)
    out[f, 1] = float(bias_reg) * float(reg)
    if update_item:
        out[:f, 2] = lr
        out[f + 1, 2] = blr * lr
    out[:f, 3] = float(reg)
    out[f + 1, 3] = float(bias_reg) * float(reg)
    out[:f, 4] = 1.0
    if update_item:
        out[:f, 6] = lr
    out[:f, 7] = float(y_reg)
    return jnp.asarray(out)


def _svdpp_kernel(ph_ref, ub_ref, ib_ref, row_ref, ff_ref,
                  w_in, q_hbm, y_hbm, data_ref, rates_ref, hp_ref,
                  w_out, q_out, y_out,
                  q_vmem, y_vmem, s_vmem, c_vmem, sem_q, sem_y, *,
                  loss: int, sigmoid: bool, C: int, UB: int, IB: int,
                  F: int, mxu_dtype):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    first = c == 0

    @pl.when(first & (ff_ref[0] == 0))
    def _():
        cp = pltpu.make_async_copy(q_hbm, q_vmem, sem_q)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(y_hbm, y_vmem, sem_y)
        cp.start()
        cp.wait()

    @pl.when(first & (ff_ref[0] != 0))
    def _():
        # pass > 0: the aliased OUTPUT holds the current tables (no-op
        # distinction on real TPU; exact under interpret, which does
        # not simulate input_output_aliases)
        cp = pltpu.make_async_copy(q_out, q_vmem, sem_q)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(y_out, y_vmem, sem_y)
        cp.start()
        cp.wait()

    cur = ub_ref[c]
    prev = ub_ref[jnp.maximum(c - 1, 0)]

    @pl.when(first | (cur != prev))
    def _():
        # new user block (passes split at block boundaries, blocks are
        # never revisited): seed the streamed W block, reset scratch
        w_out[:] = w_in[:]
        s_vmem[:] = jnp.zeros_like(s_vmem)
        c_vmem[:] = jnp.zeros_like(c_vmem)

    ph = ph_ref[c]
    ib = ib_ref[c]
    d = data_ref[0]                        # [4, C] int32
    u = d[0:1]                             # [1, C] local user index
    i = d[1:2]                             # [1, C] local item index
    v = pltpu.bitcast(d[2:3], jnp.float32)
    wt = pltpu.bitcast(d[3:4], jnp.float32)

    put = (jax.lax.broadcasted_iota(jnp.int32, (UB, C), 0)
           == u).astype(mxu_dtype)
    pit = (jax.lax.broadcasted_iota(jnp.int32, (IB, C), 0)
           == i).astype(mxu_dtype)

    Yb = y_vmem[:, pl.ds(ib * IB, IB)]     # [fe, IB]

    @pl.when(ph == 0)
    def _():
        # S: s_u += sum y_j over this chunk's edges
        yj = jax.lax.dot_general(
            Yb.astype(mxu_dtype), pit, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [fe, C]
        s_vmem[:] = s_vmem[:] + jax.lax.dot_general(
            (yj * wt).astype(mxu_dtype), put, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [fe, UB]

    @pl.when(ph == 1)
    def _():
        # R: prediction + W/Q/bias updates + c/n accumulation
        Qb = q_vmem[:, pl.ds(ib * IB, IB)]
        Wb = w_out[:]                                  # [fe, UB]
        wu = jax.lax.dot_general(
            Wb.astype(mxu_dtype), put, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [fe, C]
        qi = jax.lax.dot_general(
            Qb.astype(mxu_dtype), pit, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s_g = jax.lax.dot_general(
            s_vmem[:].astype(mxu_dtype), put, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        inv = wu[F + 2:F + 3, :]                       # [1, C]
        mf = rates_ref[:, 4:5]                         # [fe, 1]
        # su rows: 0..f-1 = p + s*inv; f = b_u; f+1 = 1; f+2 = inv
        # (inv row never contributes: Q row f+2 is zero)
        su = wu + mf * (s_g * inv)
        score = jnp.sum(su * qi, axis=0, keepdims=True)
        gb = hp_ref[0, 0]
        if sigmoid:
            sig = jax.nn.sigmoid(score + gb)
            pred = hp_ref[0, 1] + sig * hp_ref[0, 2]
            g_com = _gradient_common(loss, v - pred, sig,
                                     hp_ref[0, 2]) * wt
        else:
            g_com = (v - (score + gb)) * wt
        w_lr = rates_ref[:, 0:1]
        w_reg = rates_ref[:, 1:2]
        q_lr = rates_ref[:, 2:3]
        q_reg = rates_ref[:, 3:4]
        # user side (p rows + b_u at row f, qi row f = 1)
        delta_w = w_lr * (g_com * qi - wt * w_reg * wu)
        w_out[:] = Wb + jax.lax.dot_general(
            delta_w.astype(mxu_dtype), put, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # item side (q rows + b_i at row f+1, su row f+1 = 1)
        delta_q = q_lr * (g_com * su - wt * q_reg * qi)
        q_vmem[:, pl.ds(ib * IB, IB)] = Qb + jax.lax.dot_general(
            delta_q.astype(mxu_dtype), pit, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # y-update coefficients: rows 0..f-1 = err * q * inv; row F =
        # rating count
        n_sel = (jax.lax.broadcasted_iota(jnp.int32, (rates_ref.shape[0],
                                                      C), 0)
                 == F).astype(jnp.float32)
        c_del = mf * (g_com * inv) * qi + n_sel * wt
        c_vmem[:] = c_vmem[:] + jax.lax.dot_general(
            c_del.astype(mxu_dtype), put, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ph == 2)
    def _():
        # Y: y_j += lr * (c_u - n_u * reg * y_j) through the edges
        c_g = jax.lax.dot_general(
            c_vmem[:].astype(mxu_dtype), put, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [fe, C]
        n = c_g[F:F + 1, :]                            # [1, C]
        yj = jax.lax.dot_general(
            Yb.astype(mxu_dtype), pit, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mf = rates_ref[:, 4:5]
        y_lr = rates_ref[:, 6:7]
        y_rg = rates_ref[:, 7:8]
        d_y = y_lr * wt * (mf * c_g - n * y_rg * yj)
        y_vmem[:, pl.ds(ib * IB, IB)] = Yb + jax.lax.dot_general(
            d_y.astype(mxu_dtype), pit, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(c == nc - 1)
    def _():
        cp = pltpu.make_async_copy(q_vmem, q_out, sem_q)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(y_vmem, y_out, sem_y)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("meta", "num_factors", "loss", "sigmoid",
                     "mxu_dtype", "interpret"),
    donate_argnames=("W_ext", "Q_ext", "Y_ext"))
def svdpp_epoch_mxu(W_ext, Q_ext, Y_ext, data, ph, ub, ib, row,
                    first_flag, rates, hp_vec, *, meta,
                    num_factors: int, loss: int, sigmoid: bool,
                    mxu_dtype: str = "bf16", interpret: bool = False):
    """One SVD++ epoch: n_ratings rating updates + 2 passes over the
    history edges, in C-sized chunks on the plan's STATIC schedule
    (one dispatch per epoch, zero per-epoch host work). meta =
    plan.meta(fe); data = plan.packed; ph/ub/ib/row/first_flag = the
    plan's schedule arrays; tables in svdpp_tables_to_mxu layout."""
    P, C, UB, IB, n_ub, i_pad, fe = meta
    dt = jnp.bfloat16 if mxu_dtype == "bf16" else jnp.float32

    kernel = functools.partial(
        _svdpp_kernel, loss=loss, sigmoid=sigmoid, C=C, UB=UB, IB=IB,
        F=num_factors, mxu_dtype=dt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((fe, UB),
                         lambda c, *pref: (0, pref[1][c]),
                         memory_space=pltpu.VMEM),     # W block
            pl.BlockSpec(memory_space=pl.ANY),         # Q [fe, i_pad]
            pl.BlockSpec(memory_space=pl.ANY),         # Y [fe, i_pad]
            pl.BlockSpec((1, 4, C),
                         lambda c, *pref: (pref[3][c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fe, 8), lambda c, *pref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda c, *pref: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((fe, UB),
                         lambda c, *pref: (0, pref[1][c]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((fe, i_pad), jnp.float32),
            pltpu.VMEM((fe, i_pad), jnp.float32),
            pltpu.VMEM((fe, UB), jnp.float32),
            pltpu.VMEM((fe, UB), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((fe, n_ub * UB), jnp.float32),
            jax.ShapeDtypeStruct((fe, i_pad), jnp.float32),
            jax.ShapeDtypeStruct((fe, i_pad), jnp.float32),
        ],
        # inputs: 0..4 scalar prefetch, 5 = W, 6 = Q, 7 = Y
        input_output_aliases={5: 0, 6: 1, 7: 2},
        interpret=interpret,
    )

    def body(carry, xs):
        W, Q, Y = carry
        ph_s, ub_s, ib_s, row_s, ff_s = xs
        W, Q, Y = call(ph_s, ub_s, ib_s, row_s, ff_s, W, Q, Y, data,
                       rates, hp_vec)
        return (W, Q, Y), None

    Wt, Qt, Yt = W_ext.T, Q_ext.T, Y_ext.T
    (Wt, Qt, Yt), _ = jax.lax.scan(
        body, (Wt, Qt, Yt),
        (ph, ub, ib, row, first_flag.reshape(-1, 1)))
    return Wt.T, Qt.T, Yt.T
