"""scipy.sparse shim, dense ndarray backed.

Covers exactly the constructors / methods / operators the reference
detectors call (see tests/refshims/scipy/__init__.py).  Semantics follow
scipy where the reference depends on them:

- coo duplicate (row, col) entries SUM (``np.add.at``);
- negative indices raise ValueError (scipy's _check);
- float index arrays are downcast to int (the reference's ZooBP builds
  float indices via ``Lpos[:,0] - np.ones(...)``; old scipy accepted
  them — values are exact integers);
- ``.sum(axis=...)`` returns ``np.matrix`` so the reference's ``.A`` /
  ``np.squeeze(...)`` / ``np.array(...).reshape(-1,)`` idioms hold;
- ``*`` is MATRIX multiplication (scipy sparse semantics), with a fast
  path when the right factor is diagonal (Fraudar's ``M * colDiag``);
- ``.nonzero()`` is row-major sorted like CSR/LIL;
- ``.tolil().rows`` gives per-row sorted column-index lists
  (``Fraudar.py:219,227`` iterate them).
"""

from __future__ import annotations

import numpy as np

from . import linalg  # noqa: F401  (scipy.sparse.linalg)


def _as_index(arr, what: str) -> np.ndarray:
    a = np.asarray(arr)
    if a.dtype.kind == "f":
        a = a.astype(np.int64)  # permissive downcast (exact-int values)
    else:
        a = a.astype(np.int64)
    if a.size and a.min() < 0:
        raise ValueError(f"negative {what} index found")
    return a


class _SpShim:
    """One dense-backed class standing in for coo/csr/csc/lil/dok."""

    def __init__(self, arr):
        self.a = np.asarray(arr)
        self._rows_cache = None

    # --------------------------------------------------------- basics
    @property
    def shape(self):
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def copy(self):
        return _SpShim(self.a.copy())

    def _fmt(self):  # every format is the same dense backing
        return _SpShim(self.a.copy())

    tolil = tocsr = tocsc = todok = tocoo = _fmt

    def asfptype(self):
        return _SpShim(self.a.astype(np.float64))

    def astype(self, dt):
        return _SpShim(self.a.astype(dt))

    def transpose(self):
        return _SpShim(self.a.T.copy())

    @property
    def T(self):
        return self.transpose()

    def toarray(self):
        return np.asarray(self.a)

    @property
    def A(self):
        return self.toarray()

    # ------------------------------------------------------ reductions
    def sum(self, axis=None):
        if axis is None:
            return self.a.sum()
        return np.matrix(self.a.sum(axis=axis, keepdims=True))

    def nonzero(self):
        return np.nonzero(self.a)

    def count_nonzero(self):
        return int(np.count_nonzero(self.a))

    # ------------------------------------------------------- LIL .rows
    @property
    def rows(self):
        if self._rows_cache is None:
            self._rows_cache = [list(np.flatnonzero(r)) for r in self.a]
        return self._rows_cache

    def setdiag(self, values):
        v = np.asarray(values, dtype=np.float64).reshape(-1)
        n = min(self.a.shape)
        if self.a.dtype.kind != "f":
            self.a = self.a.astype(np.float64)
        self.a[np.arange(n), np.arange(n)] = v[:n]
        self._rows_cache = None

    # ------------------------------------------------------- indexing
    def __getitem__(self, key):
        if isinstance(key, tuple):
            i, j = key
            if np.isscalar(i) and np.isscalar(j):
                return self.a[int(i), int(j)]
            sub = self.a[i, :] if isinstance(j, slice) and j == slice(None) else None
            if sub is not None:
                return _SpShim(np.atleast_2d(sub))
            if isinstance(i, slice) and i == slice(None):
                return _SpShim(np.atleast_2d(self.a[:, j]))
            return _SpShim(np.atleast_2d(self.a[i, j]))
        return _SpShim(np.atleast_2d(self.a[key]))

    def __setitem__(self, key, value):
        i, j = key
        if self.a.dtype.kind not in "fiu":
            self.a = self.a.astype(np.float64)
        self.a[i, j] = value
        self._rows_cache = None

    # ------------------------------------------------------ arithmetic
    def __gt__(self, other):
        if np.isscalar(other):
            return _SpShim(self.a > other)
        return _SpShim(self.a > other.a)

    def _coerce(self, other):
        return other.a if isinstance(other, _SpShim) else np.asarray(other)

    def __add__(self, other):
        return _SpShim(self.a + self._coerce(other))

    __radd__ = __add__

    def __sub__(self, other):
        return _SpShim(self.a - self._coerce(other))

    def __rsub__(self, other):
        return _SpShim(self._coerce(other) - self.a)

    def __neg__(self):
        return _SpShim(-self.a)

    def __mul__(self, other):
        # scipy sparse semantics: * is matrix multiplication against a
        # matrix-like, elementwise scaling against a scalar
        if np.isscalar(other):
            return _SpShim(self.a * other)
        if isinstance(other, _SpShim):
            ob = other.a
            if (
                ob.shape[0] == ob.shape[1]
                and np.count_nonzero(ob - np.diag(np.diagonal(ob))) == 0
            ):
                return _SpShim(self.a * np.diagonal(ob)[None, :])  # fast diag
            return _SpShim(self.a @ ob)
        other = np.asarray(other)
        if other.ndim <= 1:
            return self.a @ other
        return self.a @ other  # dense rhs -> plain ndarray like scipy

    def __rmul__(self, other):
        if np.isscalar(other):
            return _SpShim(self.a * other)
        return _SpShim(np.asarray(other) @ self.a)

    def dot(self, other):
        if isinstance(other, _SpShim):
            return _SpShim(self.a @ other.a)
        return self.a @ np.asarray(other)


# ------------------------------------------------------------ constructors

def coo_matrix(arg, shape=None, dtype=None):
    if isinstance(arg, tuple) and len(arg) == 2 and all(
        np.isscalar(x) for x in arg
    ):  # empty by shape: coo_matrix((m, n), dtype=...)
        return _SpShim(np.zeros(arg, dtype=dtype or np.float64))
    data, (row, col) = arg
    row = _as_index(row, "row")
    col = _as_index(col, "column")
    data = np.asarray(data)
    if shape is None:
        shape = (int(row.max()) + 1, int(col.max()) + 1)
    out = np.zeros(shape, dtype=np.result_type(data.dtype, np.float64)
                   if dtype is None else dtype)
    np.add.at(out, (row, col), data)  # coo duplicates SUM
    return _SpShim(out)


def csr_matrix(arg, shape=None, dtype=None):
    return coo_matrix(arg, shape=shape, dtype=dtype)


def lil_matrix(arg, dtype=None):
    if isinstance(arg, tuple):
        return _SpShim(np.zeros(arg, dtype=dtype or np.float64))
    if isinstance(arg, _SpShim):
        return arg.copy()
    return _SpShim(np.asarray(arg))


def diags(values):
    return _SpShim(np.diag(np.asarray(values, dtype=np.float64).reshape(-1)))


def eye(n, dtype=np.float64):
    return _SpShim(np.eye(int(n), dtype=dtype))


def kron(a, b):
    aa = a.a if isinstance(a, _SpShim) else np.asarray(a)
    bb = b.a if isinstance(b, _SpShim) else np.asarray(b)
    return _SpShim(np.kron(aa, bb))


def hstack(mats):
    return _SpShim(np.hstack([m.a if isinstance(m, _SpShim) else np.asarray(m)
                              for m in mats]))


def vstack(mats):
    return _SpShim(np.vstack([m.a if isinstance(m, _SpShim) else np.asarray(m)
                              for m in mats]))
