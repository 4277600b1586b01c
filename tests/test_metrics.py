"""Metric parity with sklearn."""

import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

from rat_tpu.metrics import AUC, evaluate_metrics, logloss


def test_auc_matches_sklearn(rng):
    y = rng.randint(0, 2, 500)
    p = rng.rand(500)
    assert AUC(y, p) == pytest.approx(roc_auc_score(y, p), abs=1e-12)


def test_auc_with_ties(rng):
    y = rng.randint(0, 2, 100)
    p = np.round(rng.rand(100), 1)  # heavy ties
    assert AUC(y, p) == pytest.approx(roc_auc_score(y, p), abs=1e-12)


def test_logloss_eps_clipping():
    y = np.array([1.0, 0.0])
    p = np.array([1.0, 0.0])  # would be -log(0) without clipping
    val = logloss(y, p)
    assert val == pytest.approx(-np.log(1 - 1e-7), rel=1e-6)


def test_logloss_basic():
    y = np.array([1.0, 0.0, 1.0])
    p = np.array([0.9, 0.2, 0.6])
    want = -np.mean([np.log(0.9), np.log(0.8), np.log(0.6)])
    assert logloss(y, p) == pytest.approx(want, rel=1e-12)


def test_evaluate_metrics_dict(rng):
    y = rng.randint(0, 2, 50)
    p = rng.rand(50)
    out = evaluate_metrics(y, p, ["AUC", "logloss"])
    assert set(out) == {"AUC", "logloss"}


def test_group_metrics(rng):
    from rat_tpu.metrics import GAUC, MRR, NDCG, HitRate
    # two groups; group 0 perfectly ranked, group 1 inverted
    y = np.array([1, 0, 0, 0, 1, 0], dtype=float)
    p = np.array([0.9, 0.5, 0.1, 0.9, 0.5, 0.1])
    g = np.array([0, 0, 0, 1, 1, 1])
    assert GAUC(y, p, g) == pytest.approx(0.75)  # (1.0 + 0.5) weighted
    assert MRR(y, p, g) == pytest.approx((1.0 + 1 / 2) / 2)
    assert HitRate(y, p, g, k=1) == pytest.approx(0.5)
    assert 0 < NDCG(y, p, g) <= 1


def test_group_metrics_via_evaluate(rng):
    y = rng.randint(0, 2, 40)
    p = rng.rand(40)
    g = rng.randint(0, 5, 40)
    out = evaluate_metrics(y, p, ["GAUC", "NDCG", "MRR", "HitRate"],
                           group_index=g)
    assert all(0 <= v <= 1 for v in out.values()), out
