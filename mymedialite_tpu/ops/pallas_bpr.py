"""MXU-blocked BPR epoch: triple updates as one-hot systolic matmuls.

TPU-native fast path for the reference's BPR inner loop
(``BPRMF.cs:152-374``: per-triple SampleTriple + UpdateFactors), built on
the same machinery as ``ops/pallas_sgd.py`` (which took the rating-SGD
epoch from 46M to ~210M updates/s at the Netflix bench shape). The XLA
minibatch epoch (``ops/bpr.py``) is scatter-bound: TPU scatter-add
read-modify-writes measure 5-10M rows/s, capping BPR at ~1.3M
triples/s. Here gathers become ``one_hot @ block`` and scatter-adds
``one_hot.T @ delta`` — MXU matmuls — so the serialization disappears.

Layout (reuses pallas_sgd.MxuPlan): positive events (u, i) are bucketed
once by (user_block x item_block) with popularity-round-robin item
blocks; each chunk of C events shares one user block and one positive
item block. Negatives are resampled EVERY epoch on device
(:func:`sample_negatives_mxu`): each chunk draws one negative item block
(block probability proportional to its real-item count, so the marginal
over items is exactly uniform), then per-slot fixed-trial rejection
sampling against the user's history within that block. The whole item
table lives in VMEM for the epoch; i- and j-blocks are dynamic slices
of it.

Sampling semantics vs the reference's regimes (BPRMF.cs:183-321):

- uniform-pair without replacement: EXACT — one pass over all events
  (chunk visit order shuffled per epoch), fresh negatives per epoch.
- uniform-pair with replacement: approximated by the same
  one-pass-per-epoch (iid draws replaced by a permutation; same
  marginals).
- uniform-user (the default): one pass over all events with per-event
  importance weight ``num_events / (n_valid_users * |I_u|)`` — the
  expected per-epoch gradient equals uniform-user sampling's (each
  event's expected visit count under the reference regime is exactly
  that weight); variance is lower (stratified). Weights are folded into
  the update weight, scaling both gradient and regularization like a
  w-weighted XLA-path triple.
- WBPR popularity-sampled negatives: not supported here (the XLA epoch
  handles it); a per-chunk negative block can't reproduce the global
  popularity CDF cheaply.

Within-chunk negatives share one item block (correlated draws); each
slot's marginal stays uniform over the catalog, and rejection within the
block matches uniform-over-(block minus history). Bias: for users whose
history is dense in some block the conditional negative distribution
shifts by O(|I_u|/I) — negligible at real densities. Validation lives in
tests/test_pallas_bpr.py: interpret-mode epoch vs a numpy oracle of the
reference update rule (incl. the bias column and the hinge variant),
structural proof of the block-marginal uniformity claim, chi-square of
the per-user negative marginal against the exact rejection formula, and
the uniform-user importance weights against the reference's expected
per-event visit counts; model-level coverage (plan engages, ranking
learned, plan invalidation on AddFeedback) in tests/test_models_item.py
TestMXUBPREpoch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mymedialite_tpu.ops.bpr import _segment_contains
from mymedialite_tpu.ops.pallas_sgd import (
    MxuPlan, _round_up, mxu_supported, prepare_mxu_data,
)

__all__ = [
    "prepare_bpr_mxu", "sample_negatives_mxu", "bpr_mxu_column_rates",
    "bpr_epoch_mxu", "bpr_tables_to_mxu", "bpr_tables_from_mxu",
    "mxu_supported",
]


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------

def prepare_bpr_mxu(feedback, *, uniform_user: bool, user_block: int = 512,
                    item_block: int = 1024, chunk: int = 640,
                    shuffle_seed=0, num_neg_trials: int = 8):
    """Bucket the positive-event stream (like prepare_mxu_data for
    ratings) and build the device-side negative-sampling state.

    Returns (plan, neg_state, neg_meta):
      plan: pallas_sgd.MxuPlan whose value slot carries the per-event
        base weight (1 for uniform-pair, the uniform-user importance
        weight otherwise);
      neg_state: device arrays for sample_negatives_mxu;
      neg_meta: hashable static tuple for sample_negatives_mxu.
    """
    users = np.asarray(feedback.users, dtype=np.int32)
    items = np.asarray(feedback.items, dtype=np.int32)
    U, I = feedback.num_users, feedback.num_items
    csr = feedback.by_user
    counts = csr.counts()

    if uniform_user:
        # importance weight: expected visit count of event (u, i) per
        # reference uniform-user epoch of |events| draws
        # (BPRMF.cs:183-226) = |events| / (n_valid * |I_u|)
        valid = (counts > 0) & (counts < I)
        n_valid = max(int(valid.sum()), 1)
        w_user = np.where(valid, len(users) / (n_valid *
                                               np.maximum(counts, 1.0)), 0.0)
        weights = w_user[users].astype(np.float32)
    else:
        weights = np.ones(len(users), np.float32)

    plan = prepare_mxu_data(users, items, weights, U, I,
                            user_block=user_block, item_block=item_block,
                            chunk=chunk, shuffle_seed=shuffle_seed)

    # real-item count per (popularity-round-robin) item block: block b
    # holds items with new_id in [b*IB, b*IB + nvalid_b), contiguous by
    # construction (pallas_sgd.prepare_mxu_data:134-141)
    n_ib, IB = plan.n_iblocks, plan.item_block
    nvalid = np.zeros(n_ib, np.int32)
    b_of_new = np.arange(plan.i_pad) // IB
    nvalid_all = np.bincount(b_of_new, weights=(plan.old_of_new >= 0),
                             minlength=n_ib).astype(np.int32)
    nvalid[:] = nvalid_all

    max_count = int(counts.max()) if counts.size else 1
    depth = max(int(np.ceil(np.log2(max(max_count, 1) + 1))) + 1, 1)
    neg_state = dict(
        ub_c=jnp.asarray(plan.ub_c),
        hist_items=jnp.asarray(csr.keys.astype(np.int32)),
        indptr=jnp.asarray(csr.indptr.astype(np.int32)),
        old_of_new=jnp.asarray(np.maximum(plan.old_of_new, 0)),
        nvalid=jnp.asarray(nvalid),
        u_loc=plan.packed[:, 0, :],
    )
    neg_meta = (plan.num_chunks, plan.chunk, plan.user_block, IB, n_ib,
                I, U, num_neg_trials, depth)
    return plan, neg_state, neg_meta


# ---------------------------------------------------------------------------
# per-epoch on-device negative sampling
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("meta",))
def sample_negatives_mxu(neg_state, key, *, meta):
    """Fresh negatives for every chunk slot, on device.

    Per chunk: one negative item block jb (P(b) = nvalid_b / num_items,
    exactly uniform marginal over real items), then per slot fixed-trial
    rejection sampling of a local index within that block against the
    slot's user history (reference rejection loop BPRMF.cs:279-284;
    failed slots get weight 0, probability ~density^T).

    Returns (jb [nc] int32, neg [nc, 2, C] int32) where neg rows are
    (j_loc, weight_bits).
    """
    nc, C, UB, IB, n_ib, num_items, num_users, trials, depth = meta
    u_glob = jnp.minimum(
        neg_state["ub_c"][:, None] * UB + neg_state["u_loc"],
        max(num_users - 1, 0))                                # [nc, C]
    kb, kt = jax.random.split(key)
    r = jax.random.randint(kb, (nc,), 0, max(num_items, 1), dtype=jnp.int32)
    jb = r % n_ib                                             # [nc]
    nval_b = jnp.maximum(neg_state["nvalid"][jb], 1)          # [nc]
    hist, indptr = neg_state["hist_items"], neg_state["indptr"]
    old_of_new = neg_state["old_of_new"]
    uf = u_glob.reshape(-1)

    def trial(t, state):
        j_loc, ok = state
        ktr = jax.random.fold_in(kt, t)
        cand = (jax.random.randint(ktr, (nc, C), 0, 1 << 30,
                                   dtype=jnp.int32)
                % nval_b[:, None])                            # [nc, C]
        j_old = old_of_new[jb[:, None] * IB + cand]
        is_pos = _segment_contains(hist, indptr, uf, j_old.reshape(-1),
                                   depth).reshape(nc, C)
        take = jnp.logical_and(~ok, ~is_pos)
        j_loc = jnp.where(take, cand, j_loc)
        return j_loc, ok | ~is_pos

    j_loc, ok = jax.lax.fori_loop(
        0, trials, trial,
        (jnp.zeros((nc, C), jnp.int32), jnp.zeros((nc, C), bool)))
    w_bits = jax.lax.bitcast_convert_type(ok.astype(jnp.float32), jnp.int32)
    return jb, jnp.stack([j_loc, w_bits], axis=1)


# ---------------------------------------------------------------------------
# rates / table layout
# ---------------------------------------------------------------------------

def bpr_mxu_column_rates(num_factors: int, fe: int, learn_rate, reg_u,
                         reg_i, reg_j, bias_reg, update_j: bool):
    """[fe, 6] column-stacked (w_lr, w_reg, i_lr, i_reg, j_lr, j_reg).

    Extended-table column layout: users [factors | 1 | 0...], items
    [factors | item_bias | 1 | 0...] — so sum(wu_ext * hi_ext) =
    <w,h> + b_i, and the bias column's update row reproduces the
    reference bias rule (BPRMF.cs:355-373) with i_lr[f] = lr,
    i_reg[f] = bias_reg."""
    f = num_factors
    lr = float(learn_rate)
    out = np.zeros((fe, 6), np.float32)
    out[:f, 0] = lr                 # user factors
    out[:f, 1] = float(reg_u)
    out[:f, 2] = lr                 # positive item factors
    out[f, 2] = lr                  # item bias column
    out[:f, 3] = float(reg_i)
    out[f, 3] = float(bias_reg)
    if update_j:
        out[:f, 4] = lr             # negative item factors
        out[f, 4] = lr
        out[:f, 5] = float(reg_j)
        out[f, 5] = float(bias_reg)
    return jnp.asarray(out)


@functools.partial(jax.jit, static_argnames=("u_pad", "i_pad", "fe"))
def bpr_tables_to_mxu(user_factors, item_factors, item_bias, new_of_old, *,
                      u_pad: int, i_pad: int, fe: int):
    """params -> kernel layout, on device (see bpr_mxu_column_rates)."""
    U, f = user_factors.shape
    We = jnp.zeros((u_pad, fe), jnp.float32)
    We = We.at[:U, :f].set(user_factors)
    We = We.at[:U, f].set(1.0)
    He = jnp.zeros((i_pad, fe), jnp.float32)
    He = He.at[new_of_old, :f].set(item_factors)
    He = He.at[new_of_old, f].set(item_bias)
    He = He.at[new_of_old, f + 1].set(1.0)
    return We, He


@functools.partial(jax.jit, static_argnames=("num_users", "num_factors"))
def bpr_tables_from_mxu(W_mxu, H_mxu, new_of_old, *, num_users: int,
                        num_factors: int):
    f = num_factors
    Hr = H_mxu[new_of_old]
    return W_mxu[:num_users, :f], Hr[:, :f], Hr[:, f]


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _mxu_bpr_kernel(ub_ref, ib_ref, jb_ref, row_ref,   # scalar prefetch
                    w_in_ref, h_in_ref, data_ref, neg_ref, rates_ref,
                    w_out_ref, h_out_ref,
                    h_vmem, sem_in, sem_out, *,
                    soft_margin: bool, C: int, UB: int, IB: int, mxu_dtype):
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        cp = pltpu.make_async_copy(h_in_ref, h_vmem, sem_in)
        cp.start()
        cp.wait()

    cur = ub_ref[c]
    prev = ub_ref[jnp.maximum(c - 1, 0)]

    @pl.when((c == 0) | (cur != prev))
    def _():
        w_out_ref[:] = w_in_ref[:]

    ib = ib_ref[c]
    jb = jb_ref[c]
    d = data_ref[0]                        # [4, C] int32
    u = d[0:1]                             # [1, C] local user index
    i = d[1:2]                             # [1, C] local positive index
    base_w = pltpu.bitcast(d[2:3], jnp.float32)   # per-event weight
    pad_w = pltpu.bitcast(d[3:4], jnp.float32)    # 0 on padding slots
    nd = neg_ref[0]                        # [2, C] int32
    j = nd[0:1]                            # [1, C] local negative index
    neg_w = pltpu.bitcast(nd[1:2], jnp.float32)   # 0 if rejection failed
    wgt = base_w * pad_w * neg_w           # [1, C]

    Wb = w_out_ref[:]                      # [UB, fe] f32
    Hi = h_vmem[pl.ds(ib * IB, IB), :]     # [IB, fe]
    Hj = h_vmem[pl.ds(jb * IB, IB), :]

    # [.., C] orientation throughout: no lane<->sublane relayouts
    put = (jax.lax.broadcasted_iota(jnp.int32, (UB, C), 0)
           == u).astype(mxu_dtype)
    pit = (jax.lax.broadcasted_iota(jnp.int32, (IB, C), 0)
           == i).astype(mxu_dtype)
    pjt = (jax.lax.broadcasted_iota(jnp.int32, (IB, C), 0)
           == j).astype(mxu_dtype)

    wu = jax.lax.dot_general(
        Wb.astype(mxu_dtype), put, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [fe, C]
    hi = jax.lax.dot_general(
        Hi.astype(mxu_dtype), pit, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    hj = jax.lax.dot_general(
        Hj.astype(mxu_dtype), pjt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # x_uij = <w,hi-hj> + b_i - b_j: the bias rides in column f of the
    # item table against the constant-1 column f of the user table
    x = jnp.sum(wu * (hi - hj), axis=0, keepdims=True)  # [1, C]
    if soft_margin:
        # hinge (SoftMarginRankingMF.cs:60+): gradient 1 inside margin
        g = jnp.where(x < 1.0, 1.0, 0.0) * wgt
    else:
        g = jax.nn.sigmoid(-x) * wgt                    # BPRMF.cs:339

    w_lr = rates_ref[:, 0:1]
    w_reg = rates_ref[:, 1:2]
    i_lr = rates_ref[:, 2:3]
    i_reg = rates_ref[:, 3:4]
    j_lr = rates_ref[:, 4:5]
    j_reg = rates_ref[:, 5:6]
    delta_w = w_lr * (g * (hi - hj) - wgt * w_reg * wu)   # [fe, C]
    delta_i = i_lr * (g * wu - wgt * i_reg * hi)
    delta_j = j_lr * (-g * wu - wgt * j_reg * hj)

    w_out_ref[:] = Wb + jax.lax.dot_general(
        put, delta_w.astype(mxu_dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # sequential read-modify-writes: when ib == jb the second read sees
    # the first write, so the deltas still sum (minibatch semantics)
    h_vmem[pl.ds(ib * IB, IB), :] = Hi + jax.lax.dot_general(
        pit, delta_i.astype(mxu_dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    Hj2 = h_vmem[pl.ds(jb * IB, IB), :]
    h_vmem[pl.ds(jb * IB, IB), :] = Hj2 + jax.lax.dot_general(
        pjt, delta_j.astype(mxu_dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(c == nc - 1)
    def _():
        cp = pltpu.make_async_copy(h_vmem, h_out_ref, sem_out)
        cp.start()
        cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("meta", "soft_margin", "mxu_dtype", "interpret"),
    donate_argnames=("W_ext", "H_ext"))
def bpr_epoch_mxu(W_ext, H_ext, data, neg, order, jb_layout, rates, *,
                  meta, soft_margin: bool = False, mxu_dtype: str = "bf16",
                  interpret: bool = False):
    """One BPR epoch: |events| triple updates in chunks of C.

    meta = plan.meta(fe); data = plan.packed [nc, 4, C]; neg/jb_layout
    from sample_negatives_mxu (layout order); order = plan.epoch_order
    (seed); rates = [fe, 6] from bpr_mxu_column_rates.
    """
    nc, C, UB, IB, n_ub, i_pad, fe = meta
    ub, ib, row = order
    jb_visit = jb_layout[row]           # negative block per VISITED chunk
    dt = jnp.bfloat16 if mxu_dtype == "bf16" else jnp.float32

    kernel = functools.partial(
        _mxu_bpr_kernel, soft_margin=soft_margin, C=C, UB=UB, IB=IB,
        mxu_dtype=dt)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((UB, fe), lambda c, ub, ib, jb, row: (ub[c], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 4, C), lambda c, ub, ib, jb, row: (row[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda c, ub, ib, jb, row: (row[c], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fe, 6), lambda c, ub, ib, jb, row: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((UB, fe), lambda c, ub, ib, jb, row: (ub[c], 0),
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
        # inputs: 0..3 scalar prefetch, 4 = W, 5 = H
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(ub, ib, jb_visit, row, W_ext, H_ext, data, neg, rates)
    return W_out, H_out
