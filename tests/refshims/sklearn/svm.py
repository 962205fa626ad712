"""svm.SVC shim — a RUNNABLE deterministic linear-kernel SVC so the
verbatim reference classify stage (``SVD.py:97-102`` ``classify_binary``:
``clf = svm.SVC(); clf.fit(...); clf.predict(...)``) executes in this
sandbox (sklearn absent). The linear kernel is the documented
substitution for sklearn's RBF default (SURVEY §7 risk register /
round-2 VERDICT #5); the optimizer implements the same published spec as
the engine (ugfraud_spark/operators/svd.py:linear_svm_fit) and the
oracle fixture, each written independently: L2-regularized hinge loss,
full-batch subgradient descent, w0 = 0, lr_t = 2/(lam*(t+100)),
lam = 0.01, 300 epochs. Deterministic — no randomness anywhere.
"""

import numpy as np

_LAMBDA = 0.01
_EPOCHS = 300


class SVC:
    def __init__(self, *args, **kwargs):
        # constructor args (C, tol, probability, ...) are accepted for
        # API compatibility; the deterministic substitute is fixed-config
        self._w = None
        self._b = 0.0
        self.classes_ = None

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y)
        self.classes_ = np.unique(y)
        if len(self.classes_) != 2:
            raise ValueError(
                f"linear-SVC shim is binary; got classes {self.classes_}"
            )
        # y -> -1/+1 by class order (sklearn convention: classes_ sorted)
        ypm = np.where(y == self.classes_[1], 1.0, -1.0)
        n, d = X.shape
        w = np.zeros(d)
        b = 0.0
        for t in range(_EPOCHS):
            lr = 2.0 / (_LAMBDA * (t + 100.0))
            active = ypm * (X.dot(w) + b) < 1.0
            grad_w = _LAMBDA * w
            grad_b = 0.0
            if active.any():
                grad_w = grad_w - X[active].T.dot(ypm[active]) / n
                grad_b = -ypm[active].sum() / n
            w = w - lr * grad_w
            b = b - lr * grad_b
        self._w, self._b = w, b
        return self

    def decision_function(self, X):
        return np.asarray(X, dtype=np.float64).dot(self._w) + self._b

    def predict(self, X):
        dec = self.decision_function(X)
        return np.where(dec > 0, self.classes_[1], self.classes_[0])

    def predict_proba(self, X):
        # monotone squash of the margin — enough for rank-based AUC/AP
        dec = self.decision_function(X)
        p1 = 1.0 / (1.0 + np.exp(-dec))
        return np.stack([1.0 - p1, p1], axis=1)
