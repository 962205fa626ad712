"""Minimal numpy-backed stand-in for the scipy surface used by the
reference detectors at /root/reference (scipy is not installed in this
sandbox).  Dense-backed: correct and adequate at parity-fixture scale.

Covered (from the reference's imports and call sites):
- scipy.sparse: coo_matrix, csr_matrix, lil_matrix, kron, hstack,
  vstack, diags, eye  (Fraudar.py, GANG.py, ZooBP.py, fBox.py)
- scipy.sparse.linalg.svds  (fBox.py:58, SVD.py:54)
- scipy.special.logsumexp  (SpEagle.py:11, ZooBP.py:8)

Shim faithfulness is itself tested against plain numpy semantics in
tests/test_reference_parity.py.
"""

from . import sparse, special  # noqa: F401
