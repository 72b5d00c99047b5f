"""Metric oracle tests: AUC/logloss vs sklearn, HR/NDCG goldens
(reference: deepfm/training/metrics.py definitions)."""

import numpy as np
import pytest

from deepfm_tpu.training.metrics import (
    RankingEvaluator,
    compute_auc,
    compute_calibration,
    compute_hr_at_k,
    compute_logloss,
    compute_ndcg_at_k,
    grouped_ranking_metrics,
)


def test_auc_matches_sklearn_random():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 500).astype(float)
    scores = rng.random(500)
    assert compute_auc(labels, scores) == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-12
    )


def test_auc_matches_sklearn_with_ties():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(1)
    labels = rng.integers(0, 2, 400).astype(float)
    scores = rng.integers(0, 5, 400) / 4.0  # heavy ties
    assert compute_auc(labels, scores) == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-12
    )


def test_auc_single_class_raises():
    with pytest.raises(ValueError):
        compute_auc(np.ones(10), np.random.rand(10))


def test_auc_perfect_and_inverted():
    labels = np.array([0, 0, 1, 1])
    assert compute_auc(labels, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert compute_auc(labels, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0


def test_logloss_matches_sklearn():
    from sklearn.metrics import log_loss

    rng = np.random.default_rng(2)
    labels = rng.integers(0, 2, 300).astype(float)
    scores = np.clip(rng.random(300), 1e-7, 1 - 1e-7)
    assert compute_logloss(labels, scores) == pytest.approx(
        log_loss(labels, scores), rel=1e-9
    )


def test_hr_ndcg_goldens():
    # positive at index 0 of the ground truth
    rankings = [
        np.array([0, 3, 1, 2]),  # hit at rank 1
        np.array([2, 0, 1, 3]),  # hit at rank 2
        np.array([3, 1, 2, 0]),  # hit at rank 4
    ]
    assert compute_hr_at_k(rankings, 1) == pytest.approx(1 / 3)
    assert compute_hr_at_k(rankings, 2) == pytest.approx(2 / 3)
    assert compute_hr_at_k(rankings, 4) == pytest.approx(1.0)
    expected = (1.0 + 1.0 / np.log2(3)) / 3
    assert compute_ndcg_at_k(rankings, 2) == pytest.approx(expected)


def test_ranking_evaluator():
    ev = RankingEvaluator(ks=[1, 2])
    scores = [np.array([0.9, 0.1, 0.5]), np.array([0.2, 0.8, 0.3])]
    labels = [np.array([1, 0, 0]), np.array([1, 0, 0])]
    m = ev.evaluate(scores, labels)
    assert m["HR@1"] == pytest.approx(0.5)
    assert m["HR@2"] == pytest.approx(0.5)
    # user2's positive lands at rank 3 -> no NDCG@2 contribution
    assert m["NDCG@2"] == pytest.approx(0.5)


def test_grouped_ranking_skips_degenerate_users():
    # user 1: pos+neg (kept); user 2: all pos (skipped); user 3: all neg
    uids = np.array([1, 1, 2, 2, 3, 3])
    labels = np.array([1, 0, 1, 1, 0, 0], dtype=float)
    scores = np.array([0.9, 0.1, 0.5, 0.6, 0.2, 0.3])
    m = grouped_ranking_metrics(uids, scores, labels, [1])
    assert m["HR@1"] == 1.0  # only user 1 evaluated; positive ranked first


def test_grouped_ranking_empty():
    uids = np.array([1, 1])
    labels = np.array([1.0, 1.0])
    scores = np.array([0.5, 0.6])
    assert grouped_ranking_metrics(uids, scores, labels, [1]) == {}


class TestCalibration:
    def test_calibrated_scores(self):
        """Labels drawn Bernoulli(score) -> PCOC ~ 1, ECE ~ 0."""
        rng = np.random.default_rng(0)
        scores = rng.uniform(0.05, 0.95, 200_000)
        labels = (rng.random(len(scores)) < scores).astype(float)
        m = compute_calibration(labels, scores)
        assert m["pcoc"] == pytest.approx(1.0, abs=0.02)
        assert m["ece"] < 0.01

    def test_overprediction_shows_in_both(self):
        rng = np.random.default_rng(1)
        p = rng.uniform(0.05, 0.45, 100_000)
        labels = (rng.random(len(p)) < p).astype(float)
        scores = np.clip(2.0 * p, 0.0, 1.0)  # doubled prediction
        m = compute_calibration(labels, scores)
        assert m["pcoc"] == pytest.approx(2.0, abs=0.05)
        assert m["ece"] > 0.2

    def test_no_positives_omits_pcoc(self):
        m = compute_calibration(np.zeros(10), np.full(10, 0.3))
        assert "pcoc" not in m  # NaN would poison strict-JSON consumers
        assert m["ece"] == pytest.approx(0.3, abs=1e-9)

    def test_exact_constant_bin(self):
        labels = np.array([1.0, 0.0, 1.0, 0.0])
        scores = np.full(4, 0.5)
        m = compute_calibration(labels, scores)
        assert m["pcoc"] == pytest.approx(1.0)
        assert m["ece"] == pytest.approx(0.0)

    def test_bins_match_sklearn_calibration_curve(self):
        """ECE's per-bin (mean_pred, frac_pos) decomposition equals
        sklearn's calibration_curve with uniform bins."""
        from sklearn.calibration import calibration_curve

        rng = np.random.default_rng(7)
        scores = rng.uniform(0, 1, 5000)
        labels = (rng.random(5000) < scores ** 2).astype(float)
        frac_pos, mean_pred = calibration_curve(
            labels, scores, n_bins=10, strategy="uniform"
        )
        # recompute our ECE from sklearn's bins and compare
        edges = np.linspace(0.0, 1.0, 11)
        which = np.clip(np.digitize(scores, edges[1:-1]), 0, 9)
        counts = np.bincount(which, minlength=10).astype(float)
        weights = counts[counts > 0] / len(scores)
        want = float(np.sum(weights * np.abs(mean_pred - frac_pos)))
        got = compute_calibration(labels, scores)["ece"]
        assert got == pytest.approx(want, abs=1e-9)
