"""Measure tests with known answers (counterpart of reference
Tests/Eval/Measures/*: AUCTest, PrecisionAndRecallTest, NDCG, MRR)."""

import numpy as np
import pytest

from mymedialite_tpu.eval.measures import (
    auc_list, average_precision_list, compute_cbd, hits_at_list, idcg,
    ndcg_list, precision_at_list, recall_at_list, reciprocal_rank_list,
)
from mymedialite_tpu.eval.ranking import _user_measures


class TestListMeasures:
    def test_auc_perfect(self):
        assert auc_list([1, 2, 3, 4], [1, 2]) == 1.0

    def test_auc_worst(self):
        assert auc_list([1, 2, 3, 4], [3, 4]) == 0.0

    def test_auc_middle(self):
        # correct at positions 0 and 2: pairs = 2*2=4; correct pairs:
        # item 2 (incorrect) preceded by 1 hit; item 4 preceded by 2 hits -> 3
        assert auc_list([1, 2, 3, 4], [1, 3]) == pytest.approx(3 / 4)

    def test_auc_dropped(self):
        # 2 ranked, 2 dropped, 1 relevant in list at pos 0
        # eval_items=4, pairs=3*1=3; in-list: item B preceded by 1 hit = 1;
        # dropped correction: 1 * (2 - 0) = 2 -> 3/3 = 1
        assert auc_list(["A", "B"], ["A"], num_dropped_items=2) == 1.0

    def test_auc_empty(self):
        assert auc_list([1, 2], []) == 0.5

    def test_ap(self):
        # hits at ranks 1 and 3 (1-based): (1/1 + 2/3)/2
        assert average_precision_list([5, 6, 7], [5, 7]) == \
            pytest.approx((1 + 2 / 3) / 2)
        # denominator counts correct items missing from the list
        assert average_precision_list([5, 6, 7], [5, 7, 99]) == \
            pytest.approx((1 + 2 / 3) / 3)

    def test_prec_recall(self):
        ranked = [1, 2, 3, 4, 5]
        correct = [2, 5, 9]
        assert hits_at_list(ranked, correct, 3) == 1
        assert precision_at_list(ranked, correct, 5) == pytest.approx(2 / 5)
        assert recall_at_list(ranked, correct, 5) == pytest.approx(2 / 3)

    def test_ndcg(self):
        # perfect ranking -> 1.0
        assert ndcg_list([1, 2], [1, 2]) == pytest.approx(1.0)
        got = ndcg_list([3, 1, 2], [1, 2])
        expected = (1 / np.log2(3) + 1 / np.log2(4)) / idcg(2)
        assert got == pytest.approx(expected)

    def test_mrr(self):
        assert reciprocal_rank_list([4, 2, 1], [1]) == pytest.approx(1 / 3)
        assert reciprocal_rank_list([4, 2, 1], [9]) == 0.0

    def test_cbd(self):
        # prediction == actual at scale ends is capped
        v = compute_cbd(1.0, 1.0, 1.0, 5.0)
        assert v == pytest.approx(-np.log10(0.99))
        mid = compute_cbd(3.0, 3.0, 1.0, 5.0)
        assert mid == pytest.approx(-(0.5 * np.log10(0.5) + 0.5 * np.log10(0.5)))


class TestRankMeasuresAgainstListOracle:
    """The vectorized rank-based measures must agree with the literal
    reference formulas on random data."""

    @pytest.mark.parametrize("seed", range(5))
    @pytest.mark.parametrize("cutoff_mode", ["full", "topn"])
    def test_agreement(self, seed, cutoff_mode):
        rng = np.random.default_rng(seed)
        n_cand = 30
        ranked = list(rng.permutation(n_cand))
        m_total = int(rng.integers(1, 8))
        correct = list(rng.choice(n_cand, size=m_total, replace=False))
        if cutoff_mode == "full":
            cutoff = n_cand
        else:
            cutoff = 10
        shown = ranked[:cutoff]
        dropped = n_cand - len(shown)

        ranks = np.sort([ranked.index(c) for c in correct])
        got = _user_measures(ranks, m_total, n_cand, cutoff)

        assert got["AUC"] == pytest.approx(
            auc_list(shown, correct, dropped))
        assert got["MAP"] == pytest.approx(
            average_precision_list(shown, correct))
        assert got["NDCG"] == pytest.approx(ndcg_list(shown, correct))
        assert got["MRR"] == pytest.approx(
            reciprocal_rank_list(shown, correct))
        for N in (5, 10):
            assert got[f"prec@{N}"] == pytest.approx(
                precision_at_list(shown, correct, N))
            assert got[f"recall@{N}"] == pytest.approx(
                recall_at_list(shown, correct, N))


class TestRankKernelOracle:
    """The comparison-counting rank kernel must reproduce a stable
    descending argsort's ranks exactly, ties included."""

    def test_random_with_ties(self):
        import jax.numpy as jnp
        from mymedialite_tpu.eval.ranking import _rank_kernel

        rng = np.random.default_rng(7)
        B, N, P, P2 = 9, 57, 4, 6
        # quantized scores force plenty of ties
        scores = rng.integers(0, 9, size=(B, N)).astype(np.float32)
        cand_mask = rng.random(N) > 0.2
        ignore = rng.integers(0, N + 3, size=(B, P)).astype(np.int32)
        correct = np.full((B, P2), N, dtype=np.int32)
        for b in range(B):
            cands = np.flatnonzero(cand_mask)
            pick = rng.choice(cands, size=min(P2 - 1, cands.size),
                              replace=False)
            correct[b, :pick.size] = np.sort(pick)

        kern = _rank_kernel(None, N)
        got = np.asarray(kern(None, jnp.asarray(scores),
                              jnp.asarray(cand_mask),
                              jnp.asarray(ignore), jnp.asarray(correct)))

        s = np.where(cand_mask[None, :], scores, -np.inf)
        for b in range(B):
            for j in ignore[b]:
                if j < N:
                    s[b, j] = -np.inf
        order = np.argsort(-s, axis=1, kind="stable")
        ranks = np.empty_like(order)
        for b in range(B):
            ranks[b, order[b]] = np.arange(N)
        for b in range(B):
            for p in range(P2):
                c = correct[b, p]
                expected = N if c >= N else ranks[b, c]
                assert got[b, p] == expected, (b, p, c)


class TestMeasuresBatch:
    """The vectorized batch measures (eval/ranking.py _measures_batch)
    must reproduce the scalar per-user reference implementation
    (_user_measures) exactly — including skip rules and cutoffs."""

    @pytest.mark.parametrize("n", [-1, 10])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_scalar_path(self, seed, n):
        from mymedialite_tpu.eval.ranking import _measures_batch
        from mymedialite_tpu.eval.results import ItemRecommendationResults

        rng = np.random.default_rng(seed)
        B, P2 = 40, 8
        num_items = 50
        m_arr = rng.integers(0, P2 + 1, B)
        n_cand_arr = rng.integers(10, 40, B)
        # guarantee a few skip cases: m == 0 and m == n_cand
        m_arr[0] = 0
        m_arr[1] = 5
        n_cand_arr[1] = 5
        ranks = np.full((B, P2), num_items, dtype=np.int64)
        for b in range(B):
            m = int(m_arr[b])
            if m:
                # distinct ranks below n_cand (valid ranking positions)
                ranks[b, :m] = rng.choice(int(n_cand_arr[b]),
                                          size=min(m, int(n_cand_arr[b])),
                                          replace=False)
                if m > n_cand_arr[b]:
                    m_arr[b] = n_cand_arr[b]

        sums = {k: 0.0 for k in ItemRecommendationResults.ALL_MEASURES}
        count = _measures_batch(ranks.copy(), m_arr, n_cand_arr, n, sums)

        exp = {k: 0.0 for k in sums}
        exp_count = 0
        for b in range(B):
            m = int(m_arr[b])
            n_cand = int(n_cand_arr[b])
            if m == 0 or m == n_cand:
                continue
            cutoff = n_cand if n < 0 else min(n, n_cand)
            got = _user_measures(np.sort(ranks[b, :m]), m, n_cand, cutoff)
            for k, v in got.items():
                exp[k] += v
            exp_count += 1

        assert count == exp_count
        for k in exp:
            assert sums[k] == pytest.approx(exp[k]), k

    def test_overlap_raises(self):
        from mymedialite_tpu.eval.ranking import _measures_batch

        # a correct item that exists but can never be ranked (rank >=
        # n_cand) with full-list evaluation -> reference AUC.cs:64 throws
        ranks = np.array([[2, 30, 50, 50]], dtype=np.int64)
        with pytest.raises(ValueError):
            _measures_batch(ranks, np.array([2]), np.array([20]), -1,
                            {k: 0.0 for k in
                             ("AUC", "MAP", "NDCG", "MRR", "prec@5",
                              "prec@10", "recall@5", "recall@10")})
