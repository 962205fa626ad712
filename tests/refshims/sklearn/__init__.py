"""sklearn shim: numpy implementations of the two metrics the reference
uses (helper.py:1-2) plus a RUNNABLE deterministic linear-kernel
svm.SVC (SVD.py:9-10 imports it at module level; SVD.py:97-102
classify_binary now executes through it — see svm.py for the documented
linear-for-RBF substitution)."""

from . import metrics, svm  # noqa: F401
