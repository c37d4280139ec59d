"""Validation of the Pallas MXU BPR epoch (ops/pallas_bpr.py) — the
production single-chip TPU path for BPRMF/SoftMarginRankingMF
(models/bpr.py _mxu_mode).

Three layers (VERDICT r2 #1):
- kernel numerics: interpret-mode f32 epoch vs a chunk-sequential numpy
  oracle of the reference update rule (BPRMF.cs:330-374 incl. the item
  bias, SoftMarginRankingMF.cs:60+ hinge) on the extended-table layout;
- negative-sampler distributions (sample_negatives_mxu): the
  block-marginal "exactly uniform" claim (jb = r % n_ib aligned with the
  popularity-round-robin packing's remainder blocks), the exact per-user
  negative marginal incl. fixed-trial rejection, and the
  never-hits-a-positive invariant;
- uniform-user importance weights (prepare_bpr_mxu): per-event weight
  |events| / (n_valid * |I_u|), the expected visit count of that event
  under one reference uniform-user epoch (BPRMF.cs:183-226).
"""

import numpy as np
import pytest
from scipy import stats

import jax
import jax.numpy as jnp

from mymedialite_tpu.data import PosOnlyData
from mymedialite_tpu.ops import pallas_bpr as pb


@pytest.fixture(scope="module")
def feedback():
    """30 users x 24 items, ~200 events, varied history sizes."""
    rng = np.random.default_rng(13)
    users, items = [], []
    for u in range(30):
        sz = int(rng.integers(2, 12))
        for i in rng.choice(24, size=sz, replace=False):
            users.append(u)
            items.append(int(i))
    return PosOnlyData(users, items, num_users=30, num_items=24)


def _prepared(feedback, uniform_user=True):
    return pb.prepare_bpr_mxu(
        feedback, uniform_user=uniform_user, user_block=8, item_block=8,
        chunk=8, shuffle_seed=3, num_neg_trials=8)


def oracle_epoch(We, He, plan, order, jb_layout, neg, rates,
                 soft_margin=False):
    """Chunk-sequential minibatch BPR in numpy (f32, exact): replicates
    the kernel's schedule — per chunk, all gathers read start-of-chunk
    tables, deltas accumulate via add.at, the i-block writes before the
    j-block read-modify-write."""
    We = np.asarray(We).copy()
    He = np.asarray(He).copy()
    ub, ib, row = [np.asarray(x) for x in order]
    jb_l = np.asarray(jb_layout)
    packed = np.asarray(plan.packed)
    neg = np.asarray(neg)
    UB, IB = plan.user_block, plan.item_block
    w_lr, w_reg, i_lr, i_reg, j_lr, j_reg = np.asarray(rates).T
    for c in range(plan.num_chunks):
        r = row[c]
        d = packed[r]
        u = d[0]
        i = d[1]
        base_w = d[2].view(np.float32)
        pad_w = d[3].view(np.float32)
        j = neg[r, 0]
        neg_w = neg[r, 1].view(np.float32)
        wgt = base_w * pad_w * neg_w
        ug = ub[c] * UB + u
        igl = ib[c] * IB + i
        jgl = jb_l[r] * IB + j
        wu, hi, hj = We[ug], He[igl], He[jgl]
        x = np.sum(wu * (hi - hj), axis=1)
        if soft_margin:
            g = np.where(x < 1.0, 1.0, 0.0) * wgt
        else:
            g = wgt / (1.0 + np.exp(x))
        wgt_c = wgt[:, None]
        dw = w_lr[None, :] * (g[:, None] * (hi - hj)
                              - wgt_c * w_reg[None, :] * wu)
        di = i_lr[None, :] * (g[:, None] * wu - wgt_c * i_reg[None, :] * hi)
        dj = j_lr[None, :] * (-g[:, None] * wu - wgt_c * j_reg[None, :] * hj)
        np.add.at(We, ug, dw)
        np.add.at(He, igl, di)
        np.add.at(He, jgl, dj)
    return We, He


class TestEpochNumerics:
    @pytest.mark.parametrize("soft_margin", [False, True])
    def test_kernel_matches_numpy_oracle(self, feedback, soft_margin):
        plan, neg_state, neg_meta = _prepared(feedback)
        f = 6
        fe = 8
        rng = np.random.default_rng(0)
        W = 0.1 * rng.standard_normal((feedback.num_users, f)) \
            .astype(np.float32)
        H = 0.1 * rng.standard_normal((feedback.num_items, f)) \
            .astype(np.float32)
        bias = 0.01 * rng.standard_normal(feedback.num_items) \
            .astype(np.float32)
        new_of_old = jnp.asarray(plan.new_of_old)
        We, He = pb.bpr_tables_to_mxu(
            jnp.asarray(W), jnp.asarray(H), jnp.asarray(bias), new_of_old,
            u_pad=plan.u_pad, i_pad=plan.i_pad, fe=fe)
        rates = pb.bpr_mxu_column_rates(
            f, fe, 0.05, 0.0025, 0.0025, 0.00025, 0.01, True)
        jb, neg = pb.sample_negatives_mxu(
            neg_state, jax.random.PRNGKey(5), meta=neg_meta)
        order = plan.epoch_order(11)
        He0 = np.asarray(He).copy()   # He/We are donated to the kernel
        Wref, Href = oracle_epoch(We, He, plan, order, jb, neg, rates,
                                  soft_margin=soft_margin)
        Wk, Hk = pb.bpr_epoch_mxu(
            We, He, plan.packed, neg, order, jb, rates, meta=plan.meta(fe),
            soft_margin=soft_margin, mxu_dtype="f32", interpret=True)
        assert np.abs(np.asarray(Wk) - Wref).max() < 1e-5
        assert np.abs(np.asarray(Hk) - Href).max() < 1e-5
        # the item-bias column (col f) must move: a nonzero-bias update
        # per the reference bias rule (BPRMF.cs:355-373)
        moved = np.abs(np.asarray(Hk)[:, f] - He0[:, f]).max()
        assert moved > 0

    def test_table_roundtrip(self, feedback):
        plan, _, _ = _prepared(feedback)
        f = 6
        rng = np.random.default_rng(1)
        W = rng.standard_normal((feedback.num_users, f)).astype(np.float32)
        H = rng.standard_normal((feedback.num_items, f)).astype(np.float32)
        bias = rng.standard_normal(feedback.num_items).astype(np.float32)
        new_of_old = jnp.asarray(plan.new_of_old)
        We, He = pb.bpr_tables_to_mxu(
            jnp.asarray(W), jnp.asarray(H), jnp.asarray(bias), new_of_old,
            u_pad=plan.u_pad, i_pad=plan.i_pad, fe=8)
        W1, H1, b1 = pb.bpr_tables_from_mxu(
            We, He, new_of_old, num_users=feedback.num_users, num_factors=f)
        np.testing.assert_array_equal(np.asarray(W1), W)
        np.testing.assert_array_equal(np.asarray(H1), H)
        np.testing.assert_array_equal(np.asarray(b1), bias)


def _draw_negatives(neg_state, neg_meta, n_keys=1500, seed=0):
    """[n_keys] vmapped sampler draws: jb [K, nc], neg [K, nc, 2, C]."""
    keys = jax.random.split(jax.random.PRNGKey(seed), n_keys)
    fn = jax.jit(jax.vmap(
        lambda k: pb.sample_negatives_mxu(neg_state, k, meta=neg_meta)))
    jb, neg = fn(keys)
    return np.asarray(jb), np.asarray(neg)


class TestNegativeSampler:
    def test_block_modulo_alignment(self, feedback):
        """The 'exactly uniform' marginal claim (docstring): jb = r % n_ib
        with r ~ U[0, I) gives P(b) = ceil((I - b)/n_ib)/I; the
        popularity-round-robin packing deals items to blocks 0,1,...,
        so block b holds exactly ceil((I - b)/n_ib) real items. The two
        must align structurally, or P(block) != nvalid_b/I."""
        plan, neg_state, neg_meta = _prepared(feedback)
        n_ib = plan.n_iblocks
        I = feedback.num_items
        m_b = np.bincount(np.arange(I) % n_ib, minlength=n_ib)
        np.testing.assert_array_equal(m_b, np.asarray(neg_state["nvalid"]))

    def test_block_marginal_uniform_over_items(self, feedback):
        plan, neg_state, neg_meta = _prepared(feedback)
        jb, _ = _draw_negatives(neg_state, neg_meta, n_keys=4000)
        n_ib = plan.n_iblocks
        obs = np.bincount(jb.reshape(-1), minlength=n_ib).astype(np.float64)
        nvalid = np.asarray(neg_state["nvalid"], dtype=np.float64)
        expected = nvalid / nvalid.sum() * obs.sum()
        p = stats.chisquare(obs, expected).pvalue
        assert p > 1e-4, (obs, expected, p)

    def test_negative_never_hits_positive(self, feedback):
        plan, neg_state, neg_meta = _prepared(feedback)
        jb, neg = _draw_negatives(neg_state, neg_meta, n_keys=200)
        nc, C, UB, IB = neg_meta[0], neg_meta[1], neg_meta[2], neg_meta[3]
        packed = np.asarray(plan.packed)
        old_of_new = np.asarray(neg_state["old_of_new"])
        ub_c = np.asarray(neg_state["ub_c"])
        u_glob = ub_c[:, None] * UB + packed[:, 0]            # [nc, C]
        pad_w = packed[:, 3].view(np.float32)                 # [nc, C]
        pos = {u: set(int(x) for x in feedback.items_by_user(u))
               for u in range(feedback.num_users)}
        for k in range(jb.shape[0]):
            ok = neg[k, :, 1].view(np.float32) > 0
            real = (pad_w > 0) & ok
            j_old = old_of_new[jb[k][:, None] * IB + neg[k, :, 0]]
            for c, s in zip(*np.nonzero(real)):
                assert int(j_old[c, s]) not in pos[int(u_glob[c, s])]

    def test_per_user_negative_marginal_exact(self, feedback):
        """Exact conditional: P(j) for non-history j in block b =
        (nvalid_b / I) * (1 - (h_ub/nvalid_b)^T) / (nvalid_b - h_ub),
        where h_ub = |I_u intersect block b| (the chunk draws one block,
        then fixed-trial rejection within it)."""
        plan, neg_state, neg_meta = _prepared(feedback)
        nc, C, UB, IB, n_ib, I, U, trials, _ = neg_meta
        jb, neg = _draw_negatives(neg_state, neg_meta, n_keys=4000, seed=2)
        packed = np.asarray(plan.packed)
        old_of_new = np.asarray(neg_state["old_of_new"])
        new_of_old = np.asarray(plan.new_of_old)
        nvalid = np.asarray(neg_state["nvalid"], dtype=np.float64)
        ub_c = np.asarray(neg_state["ub_c"])
        u_glob = ub_c[:, None] * UB + packed[:, 0]
        pad_w = packed[:, 3].view(np.float32)
        # pick the 3 users with the most real slots for power
        slots_of = {}
        for c, s in zip(*np.nonzero(pad_w > 0)):
            slots_of.setdefault(int(u_glob[c, s]), []).append((c, s))
        users = sorted(slots_of, key=lambda u: -len(slots_of[u]))[:3]
        for uid in users:
            hist = set(int(x) for x in feedback.items_by_user(uid))
            h_b = np.zeros(n_ib)
            for it in hist:
                h_b[new_of_old[it] // IB] += 1
            # expected per-item probability (by block)
            p_item = np.zeros(I)
            for b in range(n_ib):
                avail = nvalid[b] - h_b[b]
                if avail <= 0:
                    continue
                p_ok = 1.0 - (h_b[b] / nvalid[b]) ** trials
                locs = np.arange(b * IB, b * IB + int(nvalid[b]))
                for it in old_of_new[locs]:
                    if int(it) not in hist:
                        p_item[it] = (nvalid[b] / I) * p_ok / avail
            cs = np.array([c for c, _ in slots_of[uid]])
            ss = np.array([s for _, s in slots_of[uid]])
            j_loc = neg[:, cs, 0, ss]                        # [K, S]
            okw = neg[:, cs, 1, ss].view(np.float32) > 0     # [K, S]
            j_old = old_of_new[jb[:, cs] * IB + j_loc]       # [K, S]
            vals = j_old[okw]
            obs = np.bincount(vals, minlength=I).astype(np.float64)
            keep = p_item > 0
            assert obs[~keep].sum() == 0
            n_draws = jb.shape[0] * len(cs)
            expected = p_item[keep] * n_draws
            # condition both on success (chi-square over observed mass)
            expected = expected / expected.sum() * obs[keep].sum()
            p = stats.chisquare(obs[keep], expected).pvalue
            assert p > 1e-4, (uid, obs[keep], expected, p)
            # and the success rate itself matches 1 - failure prob
            p_succ = p_item.sum()
            rate = obs.sum() / n_draws
            assert abs(rate - p_succ) < 4 * np.sqrt(
                p_succ * (1 - p_succ) / n_draws) + 1e-9, (rate, p_succ)


class TestUniformUserWeights:
    def test_importance_weights_match_reference_visit_counts(self, feedback):
        """Per-event weight = |events| / (n_valid * |I_u|): the expected
        number of times the reference uniform-user regime (BPRMF.cs:
        183-226) visits event (u, i) in one epoch of |events| draws."""
        plan, _, _ = _prepared(feedback, uniform_user=True)
        packed = np.asarray(plan.packed)
        base_w = packed[:, 2].view(np.float32)
        pad_w = packed[:, 3].view(np.float32)
        ub_c = np.asarray(plan.ub_c)
        u_glob = ub_c[:, None] * plan.user_block + packed[:, 0]
        counts = np.asarray(feedback.count_by_user, dtype=np.float64)
        n_events = len(feedback)
        valid = (counts > 0) & (counts < feedback.num_items)
        n_valid = valid.sum()
        real = pad_w > 0
        got = base_w[real]
        want = n_events / (n_valid * counts[u_glob[real]])
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # expected visits over the epoch sum to |events|
        np.testing.assert_allclose(got.sum(), n_events, rtol=1e-5)

    def test_uniform_pair_weights_are_one(self, feedback):
        plan, _, _ = _prepared(feedback, uniform_user=False)
        packed = np.asarray(plan.packed)
        base_w = packed[:, 2].view(np.float32)
        pad_w = packed[:, 3].view(np.float32)
        np.testing.assert_array_equal(base_w[pad_w > 0], 1.0)
