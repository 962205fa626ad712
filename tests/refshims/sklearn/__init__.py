"""sklearn shim: numpy implementations of the two metrics the reference
uses (helper.py:1-2) plus an svm.SVC stub (SVD.py:9-10 imports it at
module level; actually *running* the SVC stage is documented out of
sandbox scope — SURVEY §2.10 E2)."""

from . import metrics, svm  # noqa: F401
