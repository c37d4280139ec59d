"""Validation of the Pallas MXU BPR epoch (ops/pallas_bpr.py) — the
production single-chip TPU path for BPRMF/SoftMarginRankingMF
(models/bpr.py _mxu_mode).

Layers (VERDICT r2 #1):
- kernel numerics: interpret-mode f32 epoch vs a chunk-sequential numpy
  oracle of the reference update rule (BPRMF.cs:330-374 incl. the item
  bias, SoftMarginRankingMF.cs:60+ hinge) on the extended-table layout;
- the kernel's FUSED negative sampler (debug output) is bit-exact equal
  to the pure-XLA mirror sample_negatives_from_bits on the same bits;
- sampler distributions: the block-marginal "exactly uniform" claim
  (jb = r % n_ib aligned with the popularity-round-robin packing's
  remainder blocks), the exact per-user negative marginal incl.
  fixed-trial rejection, and the never-hits-a-positive invariant;
- uniform-user importance weights (prepare_bpr_mxu): per-event weight
  |events| / (n_valid * |I_u|), the expected visit count of that event
  under one reference uniform-user epoch (BPRMF.cs:183-226).
"""

import functools

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


def _prepared(feedback, uniform_user=True, subkeys=False):
    return pb.prepare_bpr_mxu(
        feedback, uniform_user=uniform_user, user_block=8, item_block=8,
        chunk=8, shuffle_seed=3, num_neg_trials=8, bitmask=True,
        subkeys=subkeys)


def _epoch_negatives(plan, neg_state, neg_meta, order, bits_key, jb_seed,
                     wbpr=False):
    """Everything the epoch consumes, plus the mirror's sampled
    negatives (all in visit order)."""
    n_ib, Kcap, trials, I, IB = neg_meta
    row = np.asarray(order[2])
    ub_visit = plan.ub_c[row]
    jb, nval, bkt = pb.epoch_negative_plan(
        plan, neg_state["nvalid"], ub_visit, I, jb_seed,
        block_mass=neg_state["block_mass"] if wbpr else None)
    bits = pb.epoch_random_bits(bits_key, nc=plan.num_chunks,
                                trials=trials, C=plan.chunk)
    u_loc = jnp.asarray(np.asarray(plan.packed)[row][:, 0, :])
    j_loc, ok = pb.sample_negatives_from_bits(
        neg_state["keys_tbl"], bits, jb, nval, bkt, u_loc, meta=neg_meta,
        wbpr=wbpr, cdf_tbl=neg_state["cdf_tbl"])
    return jb, nval, bkt, bits, np.asarray(j_loc), np.asarray(ok)


def oracle_epoch(We, He, plan, order, jb, j_loc, ok_neg, rates,
                 soft_margin=False):
    """Chunk-sequential minibatch BPR in numpy (f32, exact): replicates
    the kernel's schedule — per chunk, all gathers read start-of-chunk
    tables, deltas accumulate via add.at, the i-block writes before the
    j-block read-modify-write."""
    We = np.asarray(We).copy()
    He = np.asarray(He).copy()
    ub, ib, row = [np.asarray(x) for x in order]
    jb = np.asarray(jb)
    packed = np.asarray(plan.packed)
    UB, IB = plan.user_block, plan.item_block
    w_lr, w_reg, i_lr, i_reg, j_lr, j_reg = np.asarray(rates).T
    for c in range(plan.num_chunks):
        d = packed[row[c]]
        u = d[0]
        i = d[1]
        base_w = d[2].view(np.float32)
        pad_w = d[3].view(np.float32)
        j = j_loc[c]
        wgt = base_w * pad_w * ok_neg[c].astype(np.float32)
        ug = ub[c] * UB + u
        igl = ib[c] * IB + i
        jgl = jb[c] * IB + j
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
    @pytest.mark.parametrize(
        "soft_margin,wbpr,bitmask",
        [(False, False, False), (True, False, False), (False, True, False),
         (False, False, True), (False, True, True)])
    def test_kernel_matches_numpy_oracle(self, feedback, soft_margin,
                                         wbpr, bitmask):
        plan, neg_state, neg_meta = _prepared(feedback)
        n_ib, Kcap, trials, I, IB = neg_meta
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
        order = plan.epoch_order(11)
        jb, nval, bkt, bits, j_loc, ok = _epoch_negatives(
            plan, neg_state, neg_meta, order, jax.random.PRNGKey(5), 17,
            wbpr=wbpr)
        He0 = np.asarray(He).copy()   # He/We are donated to the kernel
        Wref, Href = oracle_epoch(We, He, plan, order, jb, j_loc, ok,
                                  rates, soft_margin=soft_margin)
        Wk, Hk, neg_dbg = pb.bpr_epoch_mxu(
            We, He, plan.packed, neg_state["keys_tbl"],
            neg_state["cdf_tbl"], bits, order, jb,
            nval, bkt, rates, meta=plan.meta(fe) + (Kcap, trials),
            soft_margin=soft_margin, wbpr=wbpr, mxu_dtype="f32",
            interpret=True,
            # packed-bitmask membership is the SAME predicate as the
            # (uncapped) keys test -> identical negatives, identical epoch
            bm_tbl=neg_state["bitmask_tbl"] if bitmask else None)
        # the kernel's fused sampler is bit-exact vs the XLA mirror
        neg_dbg = np.asarray(neg_dbg)
        np.testing.assert_array_equal(neg_dbg[:, 0], j_loc)
        np.testing.assert_array_equal(
            neg_dbg[:, 1].view(np.float32), ok.astype(np.float32))
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


def _draw_negatives(plan, neg_state, neg_meta, n_keys=1500, seed=0,
                    wbpr=False):
    """n_keys independent epoch draws of the production sampler (the
    XLA mirror of the kernel logic), identity visit order.
    Returns (jb [K, nc], j_loc [K, nc, C], ok [K, nc, C])."""
    n_ib, Kcap, trials, I, IB = neg_meta
    nc, C = plan.num_chunks, plan.chunk
    ub_visit = plan.ub_c
    u_loc = jnp.asarray(np.asarray(plan.packed)[:, 0, :])
    jbs, nvals, bkts = [], [], []
    for k in range(n_keys):
        jb, nval, bkt = pb.epoch_negative_plan(
            plan, neg_state["nvalid"], ub_visit, I, seed * 1_000_003 + k,
            block_mass=neg_state["block_mass"] if wbpr else None)
        jbs.append(jb)
        nvals.append(nval)
        bkts.append(bkt)
    jb = jnp.stack(jbs)
    nval = jnp.stack(nvals)
    bkt = jnp.stack(bkts)
    bits = jax.lax.bitcast_convert_type(
        jax.random.bits(jax.random.PRNGKey(seed),
                        (n_keys, nc, trials, C), jnp.uint32), jnp.int32)
    fn = jax.jit(jax.vmap(functools.partial(
        pb.sample_negatives_from_bits, neg_state["keys_tbl"],
        meta=neg_meta, wbpr=wbpr, cdf_tbl=neg_state["cdf_tbl"]),
        in_axes=(0, 0, 0, 0, None)))
    j_loc, ok = fn(bits, jb, nval, bkt, u_loc)
    return np.asarray(jb), np.asarray(j_loc), np.asarray(ok)


class TestNegativeSampler:
    def test_block_modulo_alignment(self, feedback):
        """The 'exactly uniform' marginal claim (docstring): jb = r % n_ib
        with r ~ U[0, I) gives P(b) = ceil((I - b)/n_ib)/I; the
        popularity-round-robin packing deals items to blocks 0,1,...,
        so block b holds exactly ceil((I - b)/n_ib) real items. The two
        must align structurally, or P(block) != nvalid_b/I."""
        plan, neg_state, _ = _prepared(feedback)
        n_ib = plan.n_iblocks
        I = feedback.num_items
        m_b = np.bincount(np.arange(I) % n_ib, minlength=n_ib)
        np.testing.assert_array_equal(m_b, neg_state["nvalid"])

    def test_block_marginal_uniform_over_items(self, feedback):
        plan, neg_state, neg_meta = _prepared(feedback)
        jb, _, _ = _draw_negatives(plan, neg_state, neg_meta, n_keys=4000)
        n_ib = plan.n_iblocks
        obs = np.bincount(jb.reshape(-1), minlength=n_ib).astype(np.float64)
        nvalid = neg_state["nvalid"].astype(np.float64)
        expected = nvalid / nvalid.sum() * obs.sum()
        p = stats.chisquare(obs, expected).pvalue
        assert p > 1e-4, (obs, expected, p)

    def test_negative_never_hits_positive(self, feedback):
        plan, neg_state, neg_meta = _prepared(feedback)
        n_ib, Kcap, trials, I, IB = neg_meta
        jb, j_loc, ok = _draw_negatives(plan, neg_state, neg_meta,
                                        n_keys=200)
        packed = np.asarray(plan.packed)
        old_of_new = np.maximum(plan.old_of_new, 0)
        u_glob = plan.ub_c[:, None] * plan.user_block + packed[:, 0]
        pad_w = packed[:, 3].view(np.float32)
        pos = {u: set(int(x) for x in feedback.items_by_user(u))
               for u in range(feedback.num_users)}
        for k in range(jb.shape[0]):
            real = (pad_w > 0) & ok[k]
            j_old = old_of_new[jb[k][:, None] * IB + j_loc[k]]
            for c, s in zip(*np.nonzero(real)):
                assert int(j_old[c, s]) not in pos[int(u_glob[c, s])]

    def test_per_user_negative_marginal_exact(self, feedback):
        """Exact conditional: P(j) for non-history j in block b =
        (nvalid_b / I) * (1 - (h_ub/nvalid_b)^T) / (nvalid_b - h_ub),
        where h_ub = |I_u intersect block b| (the chunk draws one block,
        then fixed-trial rejection within it)."""
        plan, neg_state, neg_meta = _prepared(feedback)
        n_ib, Kcap, trials, I, IB = neg_meta
        jb, j_loc, okw = _draw_negatives(plan, neg_state, neg_meta,
                                         n_keys=4000, seed=2)
        packed = np.asarray(plan.packed)
        old_of_new = np.maximum(plan.old_of_new, 0)
        new_of_old = plan.new_of_old
        nvalid = neg_state["nvalid"].astype(np.float64)
        u_glob = plan.ub_c[:, None] * plan.user_block + packed[:, 0]
        pad_w = packed[:, 3].view(np.float32)
        slots_of = {}
        for c, s in zip(*np.nonzero(pad_w > 0)):
            slots_of.setdefault(int(u_glob[c, s]), []).append((c, s))
        users = sorted(slots_of, key=lambda u: -len(slots_of[u]))[:3]
        for uid in users:
            hist = set(int(x) for x in feedback.items_by_user(uid))
            h_b = np.zeros(n_ib)
            for it in hist:
                h_b[new_of_old[it] // IB] += 1
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
            jl = j_loc[:, cs, ss]                            # [K, S]
            okm = okw[:, cs, ss]                             # [K, S]
            j_old = old_of_new[jb[:, cs] * IB + jl]          # [K, S]
            vals = j_old[okm]
            obs = np.bincount(vals, minlength=I).astype(np.float64)
            keep = p_item > 0
            assert obs[~keep].sum() == 0
            n_draws = jb.shape[0] * len(cs)
            expected = p_item[keep] * n_draws
            expected = expected / expected.sum() * obs[keep].sum()
            p = stats.chisquare(obs[keep], expected).pvalue
            assert p > 1e-4, (uid, obs[keep], expected, p)
            p_succ = p_item.sum()
            rate = obs.sum() / n_draws
            assert abs(rate - p_succ) < 4 * np.sqrt(
                p_succ * (1 - p_succ) / n_draws) + 1e-9, (rate, p_succ)


class TestWBPRSampler:
    """WBPR popularity negatives (reference WeightedBPRMF.cs:55-66):
    block by popularity mass, local slot by inverse-CDF, rejection
    against history — exact per-item marginal
    p(j) = (mass_b/M)(1 - (hmass_b/mass_b)^T) count_j/(mass_b-hmass_b)
    for non-history j in block b."""

    def test_block_marginal_by_mass(self, feedback):
        plan, neg_state, neg_meta = _prepared(feedback)
        jb, _, _ = _draw_negatives(plan, neg_state, neg_meta,
                                   n_keys=4000, wbpr=True)
        n_ib = plan.n_iblocks
        obs = np.bincount(jb.reshape(-1), minlength=n_ib).astype(np.float64)
        mass = np.asarray(neg_state["block_mass"], dtype=np.float64)
        expected = mass / mass.sum() * obs.sum()
        p = stats.chisquare(obs, expected).pvalue
        assert p > 1e-4, (obs, expected, p)

    def test_per_user_popularity_marginal_exact(self, feedback):
        plan, neg_state, neg_meta = _prepared(feedback)
        n_ib, Kcap, trials, I, IB = neg_meta
        jb, j_loc, okw = _draw_negatives(plan, neg_state, neg_meta,
                                         n_keys=4000, seed=5, wbpr=True)
        packed = np.asarray(plan.packed)
        old_of_new = np.maximum(plan.old_of_new, 0)
        new_of_old = plan.new_of_old
        counts = np.asarray(feedback.count_by_item, dtype=np.float64)
        mass = np.asarray(neg_state["block_mass"], dtype=np.float64)
        M = mass.sum()
        u_glob = plan.ub_c[:, None] * plan.user_block + packed[:, 0]
        pad_w = packed[:, 3].view(np.float32)
        slots_of = {}
        for c, s in zip(*np.nonzero(pad_w > 0)):
            slots_of.setdefault(int(u_glob[c, s]), []).append((c, s))
        users = sorted(slots_of, key=lambda u: -len(slots_of[u]))[:3]
        for uid in users:
            hist = set(int(x) for x in feedback.items_by_user(uid))
            hmass = np.zeros(n_ib)
            for it in hist:
                hmass[new_of_old[it] // IB] += counts[it]
            p_item = np.zeros(I)
            for b in range(n_ib):
                avail = mass[b] - hmass[b]
                if avail <= 0 or mass[b] <= 0:
                    continue
                p_ok = 1.0 - (hmass[b] / mass[b]) ** trials
                locs = np.arange(b * IB, (b + 1) * IB)
                for sl in locs:
                    it = old_of_new[sl] if plan.old_of_new[sl] >= 0 else -1
                    if it >= 0 and int(it) not in hist:
                        p_item[it] = (mass[b] / M) * p_ok \
                            * counts[it] / avail
            cs = np.array([c for c, _ in slots_of[uid]])
            ss = np.array([s for _, s in slots_of[uid]])
            jl = j_loc[:, cs, ss]
            okm = okw[:, cs, ss]
            j_old = old_of_new[jb[:, cs] * IB + jl]
            vals = j_old[okm]
            obs = np.bincount(vals, minlength=I).astype(np.float64)
            keep = p_item > 0
            assert obs[~keep].sum() == 0
            expected = p_item[keep]
            expected = expected / expected.sum() * obs[keep].sum()
            p = stats.chisquare(obs[keep], expected).pvalue
            assert p > 1e-4, (uid, obs[keep], expected, p)


class TestUniformUserWeights:
    def test_importance_weights_match_reference_visit_counts(self, feedback):
        """Per-event weight = |events| / (n_valid * |I_u|): the expected
        number of times the reference uniform-user regime (BPRMF.cs:
        183-226) visits event (u, i) in one epoch of |events| draws."""
        plan, _, _ = _prepared(feedback, uniform_user=True)
        packed = np.asarray(plan.packed)
        base_w = packed[:, 2].view(np.float32)
        pad_w = packed[:, 3].view(np.float32)
        u_glob = plan.ub_c[:, None] * plan.user_block + packed[:, 0]
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


class TestTiledBPREpoch:
    """Flat slab-tiled BPR epoch (bpr_epoch_mxu_tiled) — the big-catalog
    production path. Multi-slab interpret-mode epoch must match the
    chunk-sequential numpy oracle on the tiled visit order, with the
    fused sampler bit-exact vs the XLA mirror."""

    @pytest.mark.parametrize(
        "soft_margin,wbpr,pass_len,subkeys",
        [(False, False, 16, False), (True, False, 16, False),
         (False, True, 16, False), (False, False, 4096, False),
         # sub-bucketed membership keys (the production tiled sampler):
         # same oracle, keys gathered per-slot by u_loc & 7
         (False, False, 16, True), (True, False, 16, True),
         (False, True, 16, True), (False, False, 4096, True)])
    def test_tiled_matches_numpy_oracle(self, feedback, soft_margin, wbpr,
                                        pass_len, subkeys):
        plan, neg_state, neg_meta = _prepared(feedback, subkeys=subkeys)
        n_ib, Kcap, trials, I, IB = neg_meta
        if subkeys:
            keys_arg = neg_state["subkeys_tbl"]
            Kcap = neg_state["ksub"]
        else:
            keys_arg = neg_state["keys_tbl"]
        f, fe = 6, 8
        slab_blocks = 1
        packed_ext, S, n_pass, P, slab_items = pb.bpr_tiled_plan(
            plan, neg_state["nvalid"], slab_blocks=slab_blocks,
            pass_len=pass_len)
        assert S == plan.n_iblocks > 1
        if pass_len == 16:
            assert n_pass > 1
        else:
            # single pass: within-pass refetch via the source flags
            assert n_pass == 1
        order = pb.bpr_tiled_epoch_order(
            plan, neg_state["nvalid"], slab_items,
            slab_blocks=slab_blocks, num_slabs=S, num_passes=n_pass,
            pass_len=P, num_items=I, seed=21,
            block_mass=neg_state["block_mass"] if wbpr else None)
        (ub, ibr, isl, jb, jbr, jsl, nval, bkt, row,
         _src) = [np.asarray(a).reshape(-1) for a in order]
        if pass_len != 16:
            assert (_src != 0).any(), "no within-pass refetch exercised"
        nc_tot = ub.size
        slab_rows = slab_blocks * IB

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
            u_pad=plan.u_pad, i_pad=S * slab_rows, fe=fe)
        rates = pb.bpr_mxu_column_rates(
            f, fe, 0.05, 0.0025, 0.0025, 0.00025, 0.01, True)

        bits = pb.epoch_random_bits(jax.random.PRNGKey(9), nc=nc_tot,
                                    trials=trials, C=plan.chunk)
        packed_np = np.asarray(packed_ext)
        u_loc = jnp.asarray(packed_np[row][:, 0, :])
        j_loc, ok = pb.sample_negatives_from_bits(
            keys_arg, bits, jnp.asarray(jb),
            jnp.asarray(nval), jnp.asarray(bkt), u_loc, meta=neg_meta,
            wbpr=wbpr, cdf_tbl=neg_state["cdf_tbl"], subkeys=subkeys)
        j_loc, ok = np.asarray(j_loc), np.asarray(ok)

        # numpy oracle over the flat tiled visit order
        Wref = np.asarray(We).copy()
        Href = np.asarray(He).copy()
        w_lr, w_reg, i_lr, i_reg, j_lr, j_reg = np.asarray(rates).T
        for c in range(nc_tot):
            d = packed_np[row[c]]
            u = d[0]
            i = d[1]
            wgt = d[2].view(np.float32) * d[3].view(np.float32) \
                * ok[c].astype(np.float32)
            ug = ub[c] * plan.user_block + u
            igl = (isl[c] * slab_blocks + ibr[c]) * IB + i
            jgl = jb[c] * IB + j_loc[c]
            wu, hi, hj = Wref[ug], Href[igl], Href[jgl]
            x = np.sum(wu * (hi - hj), axis=1)
            if soft_margin:
                g = np.where(x < 1.0, 1.0, 0.0) * wgt
            else:
                g = wgt / (1.0 + np.exp(x))
            wc = wgt[:, None]
            np.add.at(Wref, ug, w_lr[None] * (g[:, None] * (hi - hj)
                                              - wc * w_reg[None] * wu))
            np.add.at(Href, igl, i_lr[None] * (g[:, None] * wu
                                               - wc * i_reg[None] * hi))
            np.add.at(Href, jgl, j_lr[None] * (-g[:, None] * wu
                                               - wc * j_reg[None] * hj))

        bits_p = bits.reshape(n_pass, P, trials, plan.chunk)
        Wk, Hk, neg_dbg = pb.bpr_epoch_mxu_tiled(
            We, He, packed_ext, keys_arg,
            neg_state["cdf_tbl"], bits_p, order, rates,
            meta=(P, plan.chunk, plan.user_block, IB, plan.n_ublocks,
                  slab_rows, fe, Kcap, trials),
            num_slabs=S, soft_margin=soft_margin, wbpr=wbpr,
            subkeys=subkeys, mxu_dtype="f32", interpret=True)
        neg_dbg = np.asarray(neg_dbg)
        np.testing.assert_array_equal(neg_dbg[:, 0], j_loc)
        np.testing.assert_array_equal(
            neg_dbg[:, 1].view(np.float32), ok.astype(np.float32))
        assert np.abs(np.asarray(Wk) - Wref).max() < 1e-5
        assert np.abs(np.asarray(Hk) - Href).max() < 1e-5

    def test_group_slab_draw_marginal_exact(self, feedback):
        """P(negative block) must equal nvalid_b / num_items under the
        two-stage (slab-per-group, block-within-slab) draw."""
        plan, neg_state, neg_meta = _prepared(feedback)
        n_ib, Kcap, trials, I, IB = neg_meta
        packed_ext, S, n_pass, P, slab_items = pb.bpr_tiled_plan(
            plan, neg_state["nvalid"], slab_blocks=1, pass_len=64)
        counts = np.zeros(n_ib, np.int64)
        n_draws = 400
        for seed in range(n_draws):
            order = pb.bpr_tiled_epoch_order(
                plan, neg_state["nvalid"], slab_items, slab_blocks=1,
                num_slabs=S, num_passes=n_pass, pass_len=P,
                num_items=I, seed=seed)
            row = np.asarray(order[8]).reshape(-1)
            jb = np.asarray(order[3]).reshape(-1)[row < plan.num_chunks]
            counts += np.bincount(jb, minlength=n_ib)
        expect = (neg_state["nvalid"] / I) * counts.sum()
        chi2 = float(((counts - expect) ** 2 / np.maximum(expect, 1))
                     .sum())
        # dof = n_ib - 1; generous bound (chi2 p>0.001)
        assert chi2 < stats.chi2.ppf(0.999, n_ib - 1), (counts, expect)

    def test_kcap_truncation(self, feedback):
        plan, neg_state, neg_meta = pb.prepare_bpr_mxu(
            feedback, uniform_user=False, user_block=8, item_block=8,
            chunk=8, shuffle_seed=3, num_neg_trials=8, kcap=128)
        assert neg_meta[1] == 128
        assert neg_state["keys_tbl"].shape[1] == 128
