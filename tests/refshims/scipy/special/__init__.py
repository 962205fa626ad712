"""scipy.special shim: logsumexp with scipy's exact semantics for the
call shapes the reference uses (SpEagle.py:210-215 — axis=1 and axis=None
over small 2x2 arrays; ZooBP.py:144 — axis=None over a column vector)."""

import numpy as np


def logsumexp(a, axis=None, b=None, keepdims=False, return_sign=False):
    a = np.asarray(a, dtype=np.float64)
    if b is not None or return_sign:
        raise NotImplementedError("shim covers the reference's call shapes only")
    a_max = np.amax(a, axis=axis, keepdims=True)
    # scipy replaces non-finite maxima by 0 so all-(-inf) rows give -inf
    if a_max.ndim > 0:
        a_max[~np.isfinite(a_max)] = 0
    elif not np.isfinite(a_max):
        a_max = 0
    tmp = np.exp(a - a_max)
    s = np.sum(tmp, axis=axis, keepdims=keepdims)
    out = np.log(s)
    if not keepdims:
        a_max = np.squeeze(a_max, axis=axis) if axis is not None else np.squeeze(a_max)
    out += a_max
    return out
