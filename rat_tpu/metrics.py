"""Evaluation metrics (reference: fuxictr/metrics.py:22-41).

Computed on the host at float64 over the full prediction vector so the
numbers are exactly comparable with the reference's sklearn calls:
- logloss: clip predictions to [1e-7, 1 - 1e-7] (sklearn log_loss
  eps=1e-7 semantics, which newer sklearn removed);
- AUC: sklearn roc_auc_score (exact, tie-aware rank statistic).
"""

import logging

import numpy as np
from sklearn.metrics import roc_auc_score


def logloss(y_true, y_pred, eps=1e-7):
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.clip(np.asarray(y_pred, dtype=np.float64), eps, 1 - eps)
    return float(-np.mean(y_true * np.log(y_pred) + (1 - y_true) * np.log(1 - y_pred)))


def AUC(y_true, y_pred):
    return float(roc_auc_score(y_true, y_pred))


def _group_slices(group_index):
    order = np.argsort(group_index, kind="mergesort")
    sorted_groups = np.asarray(group_index)[order]
    boundaries = np.flatnonzero(np.diff(sorted_groups)) + 1
    return order, np.split(order, boundaries)


def GAUC(y_true, y_pred, group_index):
    """Impression-weighted mean per-group AUC (groups with one class
    are skipped, standard GAUC convention)."""
    _, groups = _group_slices(group_index)
    total_w = 0.0
    total = 0.0
    for g in groups:
        yt = y_true[g]
        if yt.min() == yt.max():
            continue
        total += len(g) * roc_auc_score(yt, y_pred[g])
        total_w += len(g)
    return float(total / total_w) if total_w else 0.0


def NDCG(y_true, y_pred, group_index, k=10):
    _, groups = _group_slices(group_index)
    scores = []
    for g in groups:
        yt, yp = y_true[g], y_pred[g]
        order = np.argsort(-yp, kind="stable")[:k]
        gains = (2 ** yt[order] - 1) / np.log2(np.arange(2, len(order) + 2))
        ideal_order = np.argsort(-yt, kind="stable")[:k]
        ideal = (2 ** yt[ideal_order] - 1) / np.log2(np.arange(2, len(ideal_order) + 2))
        denom = ideal.sum()
        scores.append(gains.sum() / denom if denom > 0 else 0.0)
    return float(np.mean(scores)) if scores else 0.0


def MRR(y_true, y_pred, group_index):
    _, groups = _group_slices(group_index)
    scores = []
    for g in groups:
        yt, yp = y_true[g], y_pred[g]
        order = np.argsort(-yp, kind="stable")
        hits = np.flatnonzero(yt[order] > 0)
        scores.append(1.0 / (hits[0] + 1) if len(hits) else 0.0)
    return float(np.mean(scores)) if scores else 0.0


def HitRate(y_true, y_pred, group_index, k=10):
    _, groups = _group_slices(group_index)
    scores = []
    for g in groups:
        yt, yp = y_true[g], y_pred[g]
        order = np.argsort(-yp, kind="stable")[:k]
        scores.append(1.0 if (yt[order] > 0).any() else 0.0)
    return float(np.mean(scores)) if scores else 0.0


def evaluate_metrics(y_true, y_pred, metrics, **kwargs):
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    result = dict()
    for metric in metrics:
        if metric in ["logloss", "binary_crossentropy"]:
            result[metric] = logloss(y_true, y_pred)
        elif metric == "AUC":
            result[metric] = AUC(y_true, y_pred)
        elif metric in ["GAUC", "NDCG", "MRR", "HitRate"]:
            # declared-but-unimplemented stubs in the reference
            # (metrics.py:30-39); implemented for real here
            assert "group_index" in kwargs, \
                "group_index is required for {}".format(metric)
            fn = {"GAUC": GAUC, "NDCG": NDCG, "MRR": MRR,
                  "HitRate": HitRate}[metric]
            result[metric] = fn(y_true, y_pred, kwargs["group_index"])
        else:
            raise NotImplementedError("metric={} is not supported.".format(metric))
    logging.info("[Metrics] " + " - ".join(
        "{}: {:.6f}".format(k, v) for k, v in result.items()))
    return result
