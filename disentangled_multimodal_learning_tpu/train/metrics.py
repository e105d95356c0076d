"""Host-side evaluation metrics (numpy; sklearn used when available).

Reference mapping: ``compute_avg_metrics`` (utils/metrics.py:68-84) returns
(acc, f1_macro, auc_ovr, balanced_acc, sens_macro, spec_macro, prec_macro);
survival uses the censored concordance index (sksurv wrapper at
utils/utils.py:315-317).  sksurv/imblearn are not available in this image, so
sensitivity/specificity and the c-index are implemented here in numpy and
unit-tested against hand-computed values (tests/test_metrics.py).
"""

from __future__ import annotations

import numpy as np


def _confusion(y_true: np.ndarray, y_pred: np.ndarray, n_classes: int) -> np.ndarray:
    cm = np.zeros((n_classes, n_classes), dtype=np.int64)
    for t, p in zip(y_true, y_pred):
        cm[int(t), int(p)] += 1
    return cm


def sensitivity_macro(y_true, y_pred, n_classes) -> float:
    """Macro recall (imblearn sensitivity_score(average='macro') equivalent)."""
    cm = _confusion(y_true, y_pred, n_classes)
    support = cm.sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        rec = np.where(support > 0, np.diag(cm) / np.maximum(support, 1), 0.0)
    present = support > 0
    return float(rec[present].mean()) if present.any() else 0.0


def specificity_macro(y_true, y_pred, n_classes) -> float:
    """Macro specificity: mean over classes of TN / (TN + FP)."""
    cm = _confusion(y_true, y_pred, n_classes)
    total = cm.sum()
    specs = []
    for k in range(n_classes):
        tp = cm[k, k]
        fp = cm[:, k].sum() - tp
        fn = cm[k, :].sum() - tp
        tn = total - tp - fp - fn
        denom = tn + fp
        specs.append(tn / denom if denom > 0 else 0.0)
    return float(np.mean(specs))


def _auc_binary(y_true: np.ndarray, score: np.ndarray) -> float:
    """Rank-based ROC-AUC (Mann-Whitney U), ties get half credit."""
    pos = score[y_true == 1]
    neg = score[y_true == 0]
    if len(pos) == 0 or len(neg) == 0:
        return np.nan
    order = np.argsort(np.concatenate([pos, neg]), kind="mergesort")
    ranks = np.empty(len(order), dtype=np.float64)
    sorted_scores = np.concatenate([pos, neg])[order]
    # average ranks for ties
    i = 0
    n = len(order)
    while i < n:
        j = i
        while j + 1 < n and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i: j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    r_pos = ranks[: len(pos)].sum()
    n_pos, n_neg = len(pos), len(neg)
    return float((r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def auc_ovr_macro(y_true: np.ndarray, probs: np.ndarray) -> float:
    """One-vs-rest macro AUC (sklearn roc_auc_score(multi_class='ovr'))."""
    if probs.ndim == 1 or probs.shape[1] == 1:
        return _auc_binary(y_true, probs.ravel())
    aucs = []
    for k in range(probs.shape[1]):
        mask_true = (y_true == k).astype(np.int64)
        if mask_true.sum() == 0 or mask_true.sum() == len(mask_true):
            continue
        aucs.append(_auc_binary(mask_true, probs[:, k]))
    return float(np.mean(aucs)) if aucs else 0.0


def compute_avg_metrics(ground_truth, activations):
    """(acc, f1_macro, auc_ovr, bac, sens_macro, spec_macro, prec_macro) —
    reference utils/metrics.py:68-84.  Inputs: labels [M], probs [M, C]."""
    y = np.asarray(ground_truth).astype(np.int64)
    probs = np.asarray(activations, dtype=np.float64)
    pred = probs.argmax(-1)
    n_classes = probs.shape[1]

    try:
        from sklearn.metrics import (
            accuracy_score, balanced_accuracy_score, f1_score, precision_score,
            roc_auc_score)

        acc = accuracy_score(y, pred)
        f1 = f1_score(y, pred, average="macro")
        try:
            auc = roc_auc_score(y, probs if n_classes > 2 else probs[:, 1],
                                multi_class="ovr")
        except ValueError:
            auc = 0.0
        bac = balanced_accuracy_score(y, pred)
        prec = precision_score(y, pred, average="macro", zero_division=0)
    except ImportError:  # numpy fallback
        acc = float((pred == y).mean())
        cm = _confusion(y, pred, n_classes)
        recalls, precisions, f1s = [], [], []
        for k in range(n_classes):
            tp = cm[k, k]
            r = tp / cm[k].sum() if cm[k].sum() else 0.0
            p = tp / cm[:, k].sum() if cm[:, k].sum() else 0.0
            recalls.append(r)
            precisions.append(p)
            f1s.append(2 * p * r / (p + r) if p + r else 0.0)
        present = cm.sum(1) > 0
        f1 = float(np.mean(f1s))
        bac = float(np.asarray(recalls)[present].mean())
        prec = float(np.mean(precisions))
        auc = auc_ovr_macro(y, probs)
    sens = sensitivity_macro(y, pred, n_classes)
    spec = specificity_macro(y, pred, n_classes)
    return acc, f1, auc, bac, sens, spec, prec


def concordance_index_censored(event_indicator, event_time, risk_score,
                               tied_tol: float = 1e-8) -> float:
    """Harrell's censored concordance index, sksurv semantics
    (reference utils/utils.py:315-317 calls
    sksurv.metrics.concordance_index_censored((1-censorship).astype(bool),
    times, risks)):

    - comparable pairs: (i, j) with time_i < time_j and event_i, plus
      tied-time pairs where i had an event and j was censored;
    - concordant when risk_i > risk_j; |risk diff| <= tied_tol counts 0.5.
    """
    ev = np.asarray(event_indicator).astype(bool)
    t = np.asarray(event_time, dtype=np.float64)
    r = np.asarray(risk_score, dtype=np.float64)
    n = len(t)
    # vectorized over all ordered pairs (i, j), i with event:
    # comparable when t_j > t_i, or t_j == t_i and j censored
    ti = t[:, None]
    tj = t[None, :]
    comparable = ev[:, None] & ((tj > ti) | ((tj == ti) & ~ev[None, :]))
    np.fill_diagonal(comparable, False)
    d = r[:, None] - r[None, :]
    n_comp = int(comparable.sum())
    if n_comp == 0:
        return 0.0
    tied = int((comparable & (np.abs(d) <= tied_tol)).sum())
    concordant = int((comparable & (d > tied_tol)).sum())
    return float((concordant + 0.5 * tied) / n_comp)


def cindex(all_risk_scores, all_censorships, all_event_times) -> float:
    """Reference CIndex_sksurv call shape (utils/utils.py:315-317)."""
    return concordance_index_censored(
        (1 - np.asarray(all_censorships)).astype(bool),
        all_event_times, all_risk_scores)


def make_one_hot(data: np.ndarray, n: int = 0) -> np.ndarray:
    """reference utils/metrics.py:12-17."""
    num = n if n else int(np.max(data) + 1)
    return (np.arange(num) == np.asarray(data)[:, None]).astype(np.int16)


def compute_confusion_matrix(ground_truth, activations, labels) -> np.ndarray:
    """reference utils/metrics.py:87-94."""
    y = np.asarray(ground_truth).astype(np.int64)
    pred = np.asarray(activations).argmax(-1)
    n = len(labels)
    cm = np.zeros((n, n), dtype=np.int64)
    index = {int(l): i for i, l in enumerate(labels)}
    for t, p in zip(y, pred):
        if int(t) in index and int(p) in index:
            cm[index[int(t)], index[int(p)]] += 1
    return cm


def compute_avg_metrics_micro(ground_truth, activations):
    """Micro-averaged variant (reference utils/metrics.py:19-65)."""
    y = np.asarray(ground_truth).astype(np.int64)
    probs = np.asarray(activations, dtype=np.float64)
    pred = probs.argmax(-1)
    n_classes = probs.shape[1]
    acc = float((pred == y).mean())
    onehot = make_one_hot(y, n=n_classes).ravel()
    auc = _auc_binary(onehot, probs.ravel())
    cm = _confusion(y, pred, n_classes)
    tp = np.diag(cm).sum()
    fp = cm.sum() - tp
    # micro precision == micro recall == micro F1 == accuracy (multi-class)
    prec = rec = f1 = tp / max(cm.sum(), 1)
    total = cm.sum()
    tn_sum = fp_sum = 0
    for k in range(n_classes):
        tpk = cm[k, k]
        fpk = cm[:, k].sum() - tpk
        fnk = cm[k, :].sum() - tpk
        tn_sum += total - tpk - fpk - fnk
        fp_sum += fpk
    spec = tn_sum / max(tn_sum + fp_sum, 1)
    try:
        from sklearn.metrics import balanced_accuracy_score

        bac = balanced_accuracy_score(y, pred)
    except ImportError:
        recs = [cm[k, k] / cm[k].sum() for k in range(n_classes) if cm[k].sum()]
        bac = float(np.mean(recs))
    return acc, f1, auc, bac, rec, spec, prec


def cindex_lifelines(hazards, event_all, survtime_all) -> float:
    """CIndex_lifeline equivalent (reference utils/utils.py:312-313):
    concordance of -hazards as predicted scores with observed events."""
    return concordance_index_censored(np.asarray(event_all).astype(bool),
                                      survtime_all, np.asarray(hazards))
