"""Pallas MXU SVD++ epoch (ops/pallas_svdpp.py; VERDICT r4 #3).

- TestSvdppSchedule: the static 3-phase schedule is well-formed (every
  edge chunk appears in S and Y, every rating chunk in R, phases
  ordered S->R->Y per user block, passes split at block boundaries).
- TestSvdppKernelOracle: the interpret-mode epoch matches a numpy
  oracle of the declared phase semantics (s fixed per user block,
  chunk-minibatched q/bias updates, y applied per block) to float
  tolerance — incl. the sigmoid path and multi-pass schedules.
- TestSvdppModelLayer: MML_MXU=interpret engages the plan through
  SVDPlusPlus.train(); held-out RMSE matches the XLA grouped epoch
  within noise; save/load-style params materialization round-trips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mymedialite_tpu.data.arrays import RatingData
from mymedialite_tpu.ops import pallas_svdpp as psv


def _events(U=60, I=50, n=800, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, U, n).astype(np.int32)
    i = rng.integers(0, I, n).astype(np.int32)
    v = rng.uniform(1, 5, n).astype(np.float32)
    # history = dedup'd (u, i) of the ratings (the transductive default)
    key = u.astype(np.int64) * I + i
    _, first = np.unique(key, return_index=True)
    return u, i, v, u[first], i[first]


def _numpy_oracle(plan, W0, Q0, Y0, rates, gb, min_r, rng_r, *, f,
                  loss=0, sigmoid=False):
    """Replay the schedule with numpy, following the kernel's declared
    semantics exactly (gather-then-scatter minibatch per chunk)."""
    W = W0.copy()
    Q = Q0.copy()
    Y = Y0.copy()
    UB, IB = plan.user_block, plan.item_block
    fe = W.shape[1]
    packed = np.asarray(plan.packed)
    ph = np.asarray(plan.ph).reshape(-1)
    ub = np.asarray(plan.ub).reshape(-1)
    ib = np.asarray(plan.ib).reshape(-1)
    row = np.asarray(plan.row).reshape(-1)
    r = np.asarray(rates)
    w_lr, w_reg = r[:, 0], r[:, 1]
    q_lr, q_reg = r[:, 2], r[:, 3]
    mf = r[:, 4]
    y_lr, y_rg = r[:, 6], r[:, 7]
    s = np.zeros((UB, fe), np.float32)
    c = np.zeros((UB, fe), np.float32)
    prev_ub = -1
    for k in range(ph.size):
        if ub[k] != prev_ub:
            s[:] = 0.0
            c[:] = 0.0
            prev_ub = ub[k]
        d = packed[row[k]]
        u = d[0]
        i = d[1]
        v = d[2].view(np.float32)
        wt = d[3].view(np.float32)
        gi = ib[k] * IB + i            # rows in the full item tables
        gu = ub[k] * UB + u
        if ph[k] == 0:
            yj = Y[gi] * wt[:, None]
            np.add.at(s, u, yj)
        elif ph[k] == 1:
            wu = W[gu]
            qi = Q[gi]
            inv = wu[:, f + 2]
            su = wu + mf[None, :] * (s[u] * inv[:, None])
            score = np.sum(su * qi, axis=1)
            if sigmoid:
                sig = 1.0 / (1.0 + np.exp(-(score + gb)))
                pred = min_r + sig * rng_r
                err = v - pred
                if loss == 0:
                    gcom = err * sig * (1 - sig) * rng_r
                elif loss == 1:
                    gcom = np.sign(err) * sig * (1 - sig) * rng_r
                else:
                    gcom = err
                gcom = gcom * wt
            else:
                gcom = (v - (score + gb)) * wt
            d_w = w_lr[None, :] * (gcom[:, None] * qi
                                   - (wt * 1.0)[:, None]
                                   * w_reg[None, :] * wu)
            np.add.at(W, gu, d_w)
            d_q = q_lr[None, :] * (gcom[:, None] * su
                                   - wt[:, None] * q_reg[None, :] * qi)
            np.add.at(Q, gi, d_q)
            c_del = mf[None, :] * (gcom * inv)[:, None] * qi
            c_del[:, f] += wt
            np.add.at(c, u, c_del)
        else:
            c_g = c[u]
            n = c_g[:, f]
            yj = Y[gi]
            d_y = y_lr[None, :] * wt[:, None] * (
                mf[None, :] * c_g - n[:, None] * y_rg[None, :] * yj)
            np.add.at(Y, gi, d_y)
    return W, Q, Y


class TestSvdppSchedule:
    def test_schedule_well_formed(self):
        ru, ri, rv, hu, hi = _events()
        plan = psv.prepare_svdpp_mxu(ru, ri, rv, hu, hi, 60, 50,
                                     user_block=8, item_block=8,
                                     chunk=8, pass_len=64)
        ph = np.asarray(plan.ph).reshape(-1)
        ub = np.asarray(plan.ub).reshape(-1)
        row = np.asarray(plan.row).reshape(-1)
        packed = np.asarray(plan.packed)
        zero_row = packed.shape[0] - 1
        real = row != zero_row
        # every edge chunk exactly once in S and once in Y; every
        # rating chunk once in R
        s_rows = sorted(row[real & (ph == 0)])
        y_rows = sorted(row[real & (ph == 2)])
        r_rows = sorted(row[real & (ph == 1)])
        assert s_rows == y_rows
        assert len(set(s_rows)) == len(s_rows)
        assert len(set(r_rows)) == len(r_rows)
        # S -> R -> Y ordering per user block, blocks contiguous
        seen_ub = []
        for p in range(plan.num_passes):
            ph_p = np.asarray(plan.ph)[p]
            ub_p = np.asarray(plan.ub)[p]
            row_p = np.asarray(plan.row)[p]
            rl = row_p != zero_row
            for u in np.unique(ub_p[rl]):
                sel = rl & (ub_p == u)
                phases = ph_p[sel]
                assert (np.diff(phases) >= 0).all(), \
                    f"phase order broken in ublock {u}"
                seen_ub.append(int(u))
        # a user block never spans two passes
        assert len(seen_ub) == len(set(seen_ub))

    def test_too_heavy_block_raises(self):
        rng = np.random.default_rng(1)
        u = np.zeros(2000, np.int32)       # all events on one user
        i = rng.integers(0, 50, 2000).astype(np.int32)
        v = np.ones(2000, np.float32)
        with pytest.raises(ValueError):
            psv.prepare_svdpp_mxu(u, i, v, u, i, 8, 50, user_block=8,
                                  item_block=8, chunk=8, pass_len=64)


class TestSvdppKernelOracle:
    @pytest.mark.parametrize("sigmoid,loss", [(False, 0), (True, 0),
                                              (True, 1)])
    def test_epoch_matches_numpy_oracle(self, sigmoid, loss):
        U, I, f = 60, 50, 6
        fe = psv.svdpp_fe(f)
        ru, ri, rv, hu, hi = _events(U, I)
        plan = psv.prepare_svdpp_mxu(ru, ri, rv, hu, hi, U, I,
                                     user_block=8, item_block=8,
                                     chunk=8, pass_len=64)
        assert plan.num_passes > 1, "want a multi-pass schedule"
        rng = np.random.default_rng(2)
        p_mat = 0.1 * rng.standard_normal((U, f)).astype(np.float32)
        bu = 0.1 * rng.standard_normal(U).astype(np.float32)
        q = 0.1 * rng.standard_normal((I, f)).astype(np.float32)
        bi = 0.1 * rng.standard_normal(I).astype(np.float32)
        y = 0.1 * rng.standard_normal((I, f)).astype(np.float32)
        W0, Q0, Y0 = psv.svdpp_tables_to_mxu(
            jnp.asarray(p_mat), jnp.asarray(bu),
            jnp.asarray(plan.inv_sqrt), jnp.asarray(q),
            jnp.asarray(bi), jnp.asarray(y),
            jnp.asarray(plan.new_of_old), u_pad=plan.u_pad,
            i_pad=plan.i_pad, fe=fe)
        rates = psv.svdpp_mxu_rates(f, fe, 0.01, 0.7, 0.015, 0.33,
                                    0.015, use_p=True, update_user=True,
                                    update_item=True)
        gb, min_r, rng_r = 3.0, 1.0, 4.0
        hp = np.zeros((1, 8), np.float32)
        hp[0, :3] = [gb, min_r, rng_r]
        Wk, Qk, Yk = psv.svdpp_epoch_mxu(
            jnp.asarray(W0).copy(), jnp.asarray(Q0).copy(),
            jnp.asarray(Y0).copy(), plan.packed, plan.ph, plan.ub,
            plan.ib, plan.row, plan.first_flag, rates,
            jnp.asarray(hp), meta=plan.meta(fe), num_factors=f,
            loss=loss, sigmoid=sigmoid, mxu_dtype="f32",
            interpret=True)
        Wo, Qo, Yo = _numpy_oracle(
            plan, np.asarray(W0), np.asarray(Q0), np.asarray(Y0),
            rates, gb, min_r, rng_r, f=f, loss=loss, sigmoid=sigmoid)
        np.testing.assert_allclose(np.asarray(Wk), Wo, atol=2e-5)
        np.testing.assert_allclose(np.asarray(Qk), Qo, atol=2e-5)
        np.testing.assert_allclose(np.asarray(Yk), Yo, atol=2e-5)
        assert np.abs(np.asarray(Wk) - np.asarray(W0)).sum() > 0

    def test_no_p_afm_variant(self):
        """use_p=False (the AFM models): p rows stay exactly zero and
        the user vector is purely the implicit sum."""
        U, I, f = 40, 30, 4
        fe = psv.svdpp_fe(f)
        ru, ri, rv, hu, hi = _events(U, I, n=400, seed=3)
        plan = psv.prepare_svdpp_mxu(ru, ri, rv, hu, hi, U, I,
                                     user_block=8, item_block=8,
                                     chunk=8, pass_len=128)
        rng = np.random.default_rng(4)
        q = 0.1 * rng.standard_normal((I, f)).astype(np.float32)
        y = 0.1 * rng.standard_normal((I, f)).astype(np.float32)
        W0, Q0, Y0 = psv.svdpp_tables_to_mxu(
            jnp.zeros((U, f)), jnp.zeros(U),
            jnp.asarray(plan.inv_sqrt), jnp.asarray(q),
            jnp.zeros(I), jnp.asarray(y),
            jnp.asarray(plan.new_of_old), u_pad=plan.u_pad,
            i_pad=plan.i_pad, fe=fe)
        rates = psv.svdpp_mxu_rates(f, fe, 0.01, 0.7, 0.015, 0.33,
                                    0.015, use_p=False,
                                    update_user=True, update_item=True)
        hp = np.zeros((1, 8), np.float32)
        hp[0, :3] = [3.0, 1.0, 4.0]
        Wk, Qk, Yk = psv.svdpp_epoch_mxu(
            jnp.asarray(W0).copy(), jnp.asarray(Q0).copy(),
            jnp.asarray(Y0).copy(), plan.packed, plan.ph, plan.ub,
            plan.ib, plan.row, plan.first_flag, rates,
            jnp.asarray(hp), meta=plan.meta(fe), num_factors=f,
            loss=0, sigmoid=True, mxu_dtype="f32", interpret=True)
        Wo, Qo, Yo = _numpy_oracle(
            plan, np.asarray(W0), np.asarray(Q0), np.asarray(Y0),
            rates, 3.0, 1.0, 4.0, f=f, loss=0, sigmoid=True)
        np.testing.assert_allclose(np.asarray(Wk), Wo, atol=2e-5)
        np.testing.assert_allclose(np.asarray(Yk), Yo, atol=2e-5)
        assert np.abs(np.asarray(Wk)[:, :f]).max() == 0.0
        # bias column did move
        assert np.abs(np.asarray(Wk)[:U, f]).sum() > 0


class TestSvdppModelLayer:
    def _planted(self, seed=7):
        rng = np.random.default_rng(seed)
        U, I, n = 150, 100, 6000
        users = rng.integers(0, U, n).astype(np.int32)
        items = rng.integers(0, I, n).astype(np.int32)
        wu = rng.standard_normal((U, 4))
        hi = rng.standard_normal((I, 4))
        vals = np.clip(3 + (wu[users] * hi[items]).sum(1) * 0.5
                       + 0.3 * rng.standard_normal(n), 1, 5).astype(
            np.float32)
        cut = int(n * 0.85)
        tr = RatingData(users[:cut], items[:cut], vals[:cut],
                        num_users=U, num_items=I)
        te = RatingData(users[cut:], items[cut:], vals[cut:],
                        num_users=U, num_items=I)
        return tr, te

    def test_matches_sequential_reference_one_epoch(self, monkeypatch):
        """The MXU epoch's parameter movement after one epoch tracks a
        per-rating SEQUENTIAL numpy implementation of the reference
        update rule (SVDPlusPlus.cs:157-213) to within minibatch noise
        — measured ~2% on delta norms, vs ~2x bias overshoot for the
        XLA grouped epoch's 4096-rating chunks (the MXU schedule's
        512-rating chunks re-damp biases nearly per rating)."""
        from mymedialite_tpu.models.svdpp import SVDPlusPlus

        tr, te = self._planted()
        monkeypatch.setenv("MML_MXU", "interpret")
        m = SVDPlusPlus()
        m.num_factors = 8
        m.num_iter = 0
        m.learn_rate = 0.01
        m.ratings = tr
        m.init_model()
        assert m._svdpp_plan is not None, \
            "MXU SVD++ plan not engaged"
        p0 = {k: np.asarray(v) for k, v in m.params.items()}
        m.iterate()
        got = {k: np.asarray(v) for k, v in m.params.items()}

        # sequential reference
        f, lr, blr = 8, 0.01, m.bias_learn_rate
        reg, breg = m.regularization, m.bias_reg
        gb = float(p0["global_bias"])
        bu = p0["user_bias"].copy()
        bi = p0["item_bias"].copy()
        q = p0["item_factors"].copy()
        y = p0["y"].copy()
        p = p0["p"].copy()
        hist = {}
        for u_, i_ in zip(tr.users, tr.items):
            hist.setdefault(int(u_), set()).add(int(i_))
        hist = {u_: np.array(sorted(s)) for u_, s in hist.items()}
        for u_, i_, v_ in zip(tr.users, tr.items, tr.values):
            u_, i_ = int(u_), int(i_)
            Iu = hist[u_]
            inv = 1.0 / np.sqrt(len(Iu))
            su = p[u_] + inv * y[Iu].sum(0)
            err = v_ - (gb + bu[u_] + bi[i_] + su @ q[i_])
            bu[u_] += blr * lr * (err - breg * reg * bu[u_])
            bi[i_] += blr * lr * (err - breg * reg * bi[i_])
            p_new = p[u_] + lr * (err * q[i_] - reg * p[u_])
            q_new = q[i_] + lr * (err * su - reg * q[i_])
            y[Iu] += lr * (err * inv * q[i_] - reg * y[Iu])
            p[u_] = p_new
            q[i_] = q_new
        ref = dict(user_bias=bu, item_bias=bi, item_factors=q, y=y, p=p)
        for k, r in ref.items():
            g, r0 = got[k], p0[k]
            dg = np.abs(g - r0).sum()
            dr = np.abs(r - r0).sum()
            assert dg > 0, f"{k}: no movement"
            assert abs(dg - dr) / max(dr, 1e-9) < 0.1, \
                f"{k}: MXU delta {dg} vs sequential {dr}"
            assert np.abs(g - r).max() < 0.05, \
                f"{k}: max elementwise gap {np.abs(g - r).max()}"

    def test_quality_parity_with_xla_epoch(self, monkeypatch):
        """At a stable learn rate both epochs converge to the same
        held-out RMSE within noise (at aggressive rates the XLA grouped
        epoch's coarse bias minibatches diverge FIRST — the MXU path is
        the more faithful one, see the sequential-reference test)."""
        from mymedialite_tpu.eval.rating import evaluate_ratings
        from mymedialite_tpu.models.svdpp import SVDPlusPlus

        tr, te = self._planted()

        def run(mode):
            monkeypatch.setenv("MML_MXU", mode)
            m = SVDPlusPlus()
            m.num_factors = 8
            m.num_iter = 25
            m.learn_rate = 0.002
            m.ratings = tr
            m.train()
            return m, evaluate_ratings(m, te)["RMSE"]

        m_mxu, rmse_mxu = run("interpret")
        assert m_mxu._svdpp_plan is not None
        m_xla, rmse_xla = run("0")
        assert m_xla._svdpp_plan is None
        assert np.isfinite(rmse_mxu)
        assert abs(rmse_mxu - rmse_xla) < 0.05, (rmse_mxu, rmse_xla)

    def test_sigmoid_variant_and_params_roundtrip(self, monkeypatch):
        from mymedialite_tpu.models.svdpp import SigmoidSVDPlusPlus

        tr, te = self._planted(seed=9)
        monkeypatch.setenv("MML_MXU", "interpret")
        m = SigmoidSVDPlusPlus()
        m.num_factors = 6
        m.num_iter = 3
        m.ratings = tr
        m.train()
        assert m._svdpp_plan is not None
        # params materialize from resident tables; predictions finite
        pred = m.predict_batch(np.arange(8, dtype=np.int32),
                               np.arange(8, dtype=np.int32))
        assert np.isfinite(pred).all()
        # iterate again after a params read (tables re-enter residency)
        m.iterate()
        pred2 = m.predict_batch(np.arange(8, dtype=np.int32),
                                np.arange(8, dtype=np.int32))
        assert np.isfinite(pred2).all()
