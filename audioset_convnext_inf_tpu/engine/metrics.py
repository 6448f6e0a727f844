"""Evaluation metrics: per-class AP, ROC-AUC, d-prime.

Same math as the reference Evaluator (pytorch/evaluate.py:44-58) and
utilities.d_prime (utilities.py:246-248); runs host-side on gathered
outputs. Classes without positives are masked to NaN for AP, classes
without positives OR without negatives for AUC (where sklearn raises);
summaries report nanmeans. On the official eval sets every class is
populated both ways => identical numbers to the reference.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from scipy.stats import norm
from sklearn import metrics as skm


def d_prime(auc: np.ndarray) -> np.ndarray:
    return np.sqrt(2.0) * norm.ppf(auc)


def evaluate_clipwise(
    clipwise_output: np.ndarray, target: np.ndarray
) -> Dict[str, np.ndarray]:
    """(N, C) probs + (N, C) multi-hot targets -> per-class statistics dict
    {'average_precision', 'auc', 'd_prime'} (each (C,))."""
    target = np.asarray(target)
    clipwise_output = np.asarray(clipwise_output)
    n_classes = target.shape[1]

    pos = target.sum(axis=0)
    # AP is well-defined whenever a class has any positive (sklearn computes
    # it for all-positive classes too); AUC additionally needs a negative.
    # Masking all-positive classes out of AP would silently diverge from the
    # reference on eval subsets with an always-positive class.
    ap_valid = pos > 0
    auc_valid = (pos > 0) & (pos < target.shape[0])

    ap = np.full(n_classes, np.nan)
    auc = np.full(n_classes, np.nan)
    idx = np.where(ap_valid)[0]
    if len(idx):
        ap[idx] = skm.average_precision_score(
            target[:, idx], clipwise_output[:, idx], average=None)
    idx = np.where(auc_valid)[0]
    if len(idx):
        auc[idx] = skm.roc_auc_score(
            target[:, idx], clipwise_output[:, idx], average=None)

    return {"average_precision": ap, "auc": auc, "d_prime": d_prime(auc)}


def summarize(statistics: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Macro averages: mAP / mAUC / d-prime(mean AUC) as printed by
    evaluate_convnext_on_audioset.py:93-105."""
    m_ap = float(np.nanmean(statistics["average_precision"]))
    m_auc = float(np.nanmean(statistics["auc"]))
    return {"mAP": m_ap, "mAUC": m_auc, "dprime": float(d_prime(np.array(m_auc)))}
