"""scipy.sparse.linalg shim: svds via full dense SVD truncation.

scipy's svds returns the top-k triplet with singular values ASCENDING
and arbitrary per-column sign; consumers in the reference are
sign/order-invariant (fBox row norms, fBox.py:60-62) or feed an SVM
(SVD.py) — we keep the ascending order for faithfulness.
"""

import numpy as np


def svds(m, k=6):
    a = m.a if hasattr(m, "a") else np.asarray(m)
    a = a.astype(np.float64)
    u, s, vt = np.linalg.svd(a, full_matrices=False)
    # top-k, then flip to scipy's ascending order
    idx = np.arange(min(k, s.size))
    u, s, vt = u[:, idx], s[idx], vt[idx, :]
    return u[:, ::-1], s[::-1], vt[::-1, :]
