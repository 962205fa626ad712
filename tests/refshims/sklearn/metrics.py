"""roc_auc_score / average_precision_score, sklearn definitions.

- ROC-AUC via the Mann-Whitney U rank statistic with average ranks for
  ties — identical to sklearn's trapezoidal integration of the ROC.
- AP with sklearn's step-wise definition over distinct thresholds in
  descending order: AP = sum_k (dTP_k / n_pos) * precision_k.

These mirror ugfraud_spark.operators.evalmetrics (which is itself
asserted against this definition in tests/test_spectral.py).
"""

import numpy as np


def roc_auc_score(y_true, y_score) -> float:
    y = np.asarray(y_true, dtype=np.float64)
    s = np.asarray(y_score, dtype=np.float64)
    n_pos = float(y.sum())
    n_neg = float(len(y) - y.sum())
    if n_pos == 0 or n_neg == 0:
        raise ValueError("Only one class present in y_true")
    order = np.argsort(s, kind="mergesort")
    ranks = np.empty(len(s), dtype=np.float64)
    sorted_s = s[order]
    i = 0
    r = 1.0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        avg = (r + (r + (j - i))) / 2.0
        ranks[order[i:j + 1]] = avg
        r += j - i + 1
        i = j + 1
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def average_precision_score(y_true, y_score) -> float:
    y = np.asarray(y_true, dtype=np.float64)
    s = np.asarray(y_score, dtype=np.float64)
    order = np.argsort(-s, kind="mergesort")
    y = y[order]
    s = s[order]
    n_pos = y.sum()
    if n_pos == 0:
        return 0.0
    tp = np.cumsum(y)
    n = np.arange(1, len(y) + 1, dtype=np.float64)
    # group ties: evaluate only at the last row of each distinct score
    last = np.r_[s[1:] != s[:-1], True]
    tp_t = tp[last]
    n_t = n[last]
    prec = tp_t / n_t
    dtp = np.diff(np.r_[0.0, tp_t])
    return float((dtp * prec).sum() / n_pos)
