"""Jitted BPR (Bayesian Personalized Ranking) training epochs with
on-device triple sampling.

TPU-native replacement for the reference's per-triple loop
(``BPRMF.cs:152-374``): the CPU code rejection-samples negatives against
a per-user HashSet with unbounded retries (``BPRMF.cs:279-284``) — not
expressible in XLA. Here:

- user histories live in a device-resident CSR (flat sorted item array +
  row pointers), membership tests are fixed-depth vectorized binary
  searches within a user's segment;
- negative sampling draws a fixed number of uniform trials per triple
  and takes the first non-positive (failure probability density^T,
  ~1e-10 at T=8 on MovieLens-like densities; failed triples get update
  weight 0);
- an epoch is a lax.scan over minibatches of triples; updates are
  scatter-adds (duplicate ids within a batch sum, i.e. minibatch SGD).

Sampling regimes (reference BPRMF.cs:183-321):
- uniform-user (default): user ~ Uniform(users with 0 < |I_u| < I),
  positive ~ Uniform(I_u), negative ~ Uniform(I \\ I_u)
- uniform-pair: (u, i) ~ Uniform(feedback events) — with replacement
  (iid) or without (a per-epoch permutation of events)
- WBPR (WeightedBPRMF.cs:55-66): (u,i) ~ Uniform(events) (users by
  activity), negative ~ popularity, rejected against I_u
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

UNIFORM_USER = 0
UNIFORM_PAIR = 1
UNIFORM_PAIR_WOR = 2   # without replacement: permutation of events
WBPR = 3


def make_sampler_data(feedback, num_neg_trials: int = 8):
    """Device-resident sampling state built from a PosOnlyData."""
    csr = feedback.by_user
    counts = csr.counts()
    num_items = feedback.num_items
    valid = np.nonzero((counts > 0) & (counts < num_items))[0].astype(np.int32)
    if valid.size == 0:
        valid = np.zeros(1, dtype=np.int32)
    max_count = int(counts.max()) if counts.size else 1
    search_depth = max(int(np.ceil(np.log2(max(max_count, 1) + 1))) + 1, 1)
    return dict(
        hist_items=jnp.asarray(csr.keys),            # [nnz] sorted per segment
        indptr=jnp.asarray(csr.indptr.astype(np.int32)),  # [U+1]
        counts=jnp.asarray(counts.astype(np.int32)),
        valid_users=jnp.asarray(valid),
        users=jnp.asarray(feedback.users),           # COO (for pair sampling)
        items=jnp.asarray(feedback.items),
    ), dict(num_items=num_items, num_users=feedback.num_users,
            num_events=len(feedback), num_neg_trials=num_neg_trials,
            search_depth=search_depth)


def _segment_contains(hist_items, indptr, users, keys, depth: int):
    """Vectorized membership test: is keys[k] in the sorted history segment
    of users[k]? Fixed-depth binary search (XLA-friendly)."""
    lo = indptr[users]
    hi = indptr[users + 1]

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        # clamp so the gather is always in range, even when lo == hi
        v = hist_items[jnp.minimum(mid, hist_items.shape[0] - 1)]
        go_right = (v < keys) & (lo < hi)
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right | (lo >= hi), hi, mid)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, depth, body, (lo, hi))
    at = jnp.minimum(lo, hist_items.shape[0] - 1)
    return (lo < indptr[users + 1]) & (hist_items[at] == keys)


def _sample_negatives(key, sampler, users, num_items, trials: int, depth: int,
                      pop_cdf=None):
    """Fixed-trial rejection sampling of negatives for a batch of users.
    Returns (neg_items, ok_mask)."""
    B = users.shape[0]
    if pop_cdf is None:
        cand = jax.random.randint(key, (trials, B), 0, num_items, dtype=jnp.int32)
    else:
        u01 = jax.random.uniform(key, (trials, B))
        cand = jnp.searchsorted(pop_cdf, u01).astype(jnp.int32)
        cand = jnp.minimum(cand, num_items - 1)
    is_pos = jax.vmap(
        lambda c: _segment_contains(sampler["hist_items"], sampler["indptr"],
                                    users, c, depth))(cand)  # [T, B]
    good = ~is_pos
    first = jnp.argmax(good, axis=0)                     # [B]
    ok = jnp.any(good, axis=0)
    neg = cand[first, jnp.arange(B)]
    return neg, ok


def _sample_triples(key, sampler, meta, batch_size: int, regime: int,
                    perm=None, batch_index=None, pop_cdf=None):
    """Sample a batch of (u, i, j, weight) BPR triples on device."""
    k_u, k_i, k_j = jax.random.split(key, 3)
    num_items = meta["num_items"]
    if regime == UNIFORM_USER:
        uidx = jax.random.randint(k_u, (batch_size,), 0,
                                  sampler["valid_users"].shape[0],
                                  dtype=jnp.int32)
        u = sampler["valid_users"][uidx]
        r = jax.random.randint(k_i, (batch_size,), 0, jnp.iinfo(jnp.int32).max,
                               dtype=jnp.int32)
        pos_off = r % jnp.maximum(sampler["counts"][u], 1)
        i = sampler["hist_items"][sampler["indptr"][u] + pos_off]
    elif regime in (UNIFORM_PAIR, WBPR):
        eidx = jax.random.randint(k_u, (batch_size,), 0, meta["num_events"],
                                  dtype=jnp.int32)
        u = sampler["users"][eidx]
        i = sampler["items"][eidx]
    else:  # UNIFORM_PAIR_WOR: slice of a per-epoch permutation
        eidx = jax.lax.dynamic_slice(perm, (batch_index * batch_size,),
                                     (batch_size,))
        u = sampler["users"][eidx]
        i = sampler["items"][eidx]
    j, ok = _sample_negatives(
        k_j, sampler, u, num_items, meta["num_neg_trials"],
        meta["search_depth"], pop_cdf=pop_cdf if regime == WBPR else None)
    w = ok.astype(jnp.float32)
    if regime == UNIFORM_PAIR_WOR:
        # padding beyond the true event count gets weight 0
        w = w * (jax.lax.dynamic_slice(perm, (batch_index * batch_size,),
                                       (batch_size,)) < meta["num_events"]
                 ).astype(jnp.float32)
    return u, i, j, w


@functools.partial(
    jax.jit,
    static_argnames=("batch_size", "num_batches", "regime", "meta_static",
                     "update_j", "soft_margin"),
    donate_argnames=("params",))
def bpr_epoch(params, sampler, key, hp, pop_cdf, *, batch_size: int,
              num_batches: int, regime: int, meta_static, update_j: bool,
              soft_margin: bool = False):
    """One epoch = num_batches minibatches of sampled triples.

    params: user_factors [U,f], item_factors [I,f], item_bias [I].
    hp: f32 scalars learn_rate, reg_u, reg_i, reg_j, bias_reg.
    meta_static: hashable tuple from make_sampler_data's meta dict.
    soft_margin: hinge gradient (SoftMarginRankingMF.cs:52-110) instead
    of the BPR sigmoid.
    """
    meta = dict(meta_static)
    lr = hp["learn_rate"]

    n_pad = num_batches * batch_size
    if regime == UNIFORM_PAIR_WOR:
        # permutation over padded event indices; pad entries masked later
        perm = jax.random.permutation(
            jax.random.fold_in(key, 0x5eed),
            jnp.arange(n_pad, dtype=jnp.int32))
    else:
        perm = None

    def batch_step(p, b):
        bkey = jax.random.fold_in(key, b)
        u, i, j, w = _sample_triples(bkey, sampler, meta, batch_size, regime,
                                     perm=perm, batch_index=b, pop_cdf=pop_cdf)
        wu = p["user_factors"][u]
        hi = p["item_factors"][i]
        hj = p["item_factors"][j]
        x_uij = p["item_bias"][i] - p["item_bias"][j] + \
            jnp.sum(wu * (hi - hj), axis=-1)
        if soft_margin:
            # hinge: gradient 1 on margin violation (x_uij < 1), else 0
            g = jnp.where(x_uij < 1.0, 1.0, 0.0) * w
        else:
            g = jax.nn.sigmoid(-x_uij) * w  # = 1/(1+e^x)
        # factor updates (reference UpdateFactors, BPRMF.cs:330-374)
        p["user_factors"] = p["user_factors"].at[u].add(
            lr * (g[:, None] * (hi - hj) - (w * hp["reg_u"])[:, None] * wu))
        p["item_factors"] = p["item_factors"].at[i].add(
            lr * (g[:, None] * wu - (w * hp["reg_i"])[:, None] * hi))
        p["item_bias"] = p["item_bias"].at[i].add(
            lr * (g - hp["bias_reg"] * w * p["item_bias"][i]))
        if update_j:
            p["item_factors"] = p["item_factors"].at[j].add(
                lr * (-g[:, None] * wu - (w * hp["reg_j"])[:, None] * hj))
            p["item_bias"] = p["item_bias"].at[j].add(
                lr * (-g - hp["bias_reg"] * w * p["item_bias"][j]))
        return p, None

    params, _ = jax.lax.scan(batch_step, params,
                             jnp.arange(num_batches, dtype=jnp.int32))
    return params


@jax.jit
def bpr_objective(params, hp, loss_u, loss_i, loss_j):
    """Approximate BPR-Opt objective on a fixed triple sample (reference
    convergence tracking, BPRMF.cs:135-150): ranking loss ln(1+e^{-x})
    plus L2 complexity of the touched rows."""
    wu = params["user_factors"][loss_u]
    hi = params["item_factors"][loss_i]
    hj = params["item_factors"][loss_j]
    x = params["item_bias"][loss_i] - params["item_bias"][loss_j] + \
        jnp.sum(wu * (hi - hj), axis=-1)
    ranking_loss = jnp.sum(jnp.log1p(jnp.exp(-x)))
    complexity = (hp["reg_u"] * jnp.sum(wu ** 2)
                  + hp["reg_i"] * jnp.sum(hi ** 2)
                  + hp["reg_j"] * jnp.sum(hj ** 2)
                  + hp["bias_reg"] * jnp.sum(params["item_bias"][loss_i] ** 2)
                  + hp["bias_reg"] * jnp.sum(params["item_bias"][loss_j] ** 2))
    return ranking_loss + complexity


def popularity_cdf(feedback) -> jnp.ndarray:
    """Cumulative item-popularity distribution for WBPR negative sampling
    (reference WeightedBPRMF.cs: negatives proportional to popularity)."""
    counts = feedback.count_by_item.astype(np.float64)
    total = counts.sum()
    if total == 0:
        counts = np.ones_like(counts)
        total = counts.sum()
    return jnp.asarray(np.cumsum(counts / total), dtype=jnp.float32)
