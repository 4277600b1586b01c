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


def evaluate_metrics(y_true, y_pred, metrics, **kwargs):
    result = dict()
    for metric in metrics:
        if metric in ["logloss", "binary_crossentropy"]:
            result[metric] = logloss(y_true, y_pred)
        elif metric == "AUC":
            result[metric] = AUC(y_true, y_pred)
        elif metric in ["GAUC", "NDCG", "MRR", "HitRate"]:
            # group-wise ranking metrics are declared but unimplemented in
            # the reference (metrics.py:30-39); kept as explicit stubs
            raise NotImplementedError("metric={} is a stub in the reference"
                                      .format(metric))
        else:
            raise NotImplementedError("metric={} is not supported.".format(metric))
    logging.info("[Metrics] " + " - ".join(
        "{}: {:.6f}".format(k, v) for k, v in result.items()))
    return result
