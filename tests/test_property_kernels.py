"""Property-based tests (hypothesis) for the pure driver-side kernels.

These kernels run inside bounded driver funnels (the exact Fraudar peel,
SURVEY §7) where a single wrong branch silently changes which block the
distributed pipeline extracts — example tests pin known traces, these
pin the full contract against a brute-force model on random inputs.
No SparkSession: pure python/numpy, fast."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ugfraud_spark.operators.fraudar import IndexedMinHeap

finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


class NaiveHeap:
    """Brute-force model of IndexedMinHeap's contract: argmin with
    smallest-index tie-break (the reference MinTree's left-child
    preference, Fraudar.py via MinTree.py)."""

    def __init__(self, values):
        self.a = [float(v) for v in values]

    def min(self):
        m = min(self.a)
        return self.a.index(m), m

    def add(self, idx, delta):
        self.a[idx] += delta

    def set_inf(self, idx):
        self.a[idx] = math.inf


@st.composite
def heap_trace(draw):
    n = draw(st.integers(min_value=1, max_value=33))
    init = draw(st.lists(finite, min_size=n, max_size=n))
    ops = draw(st.lists(
        st.one_of(
            st.tuples(st.just("add"),
                      st.integers(min_value=0, max_value=n - 1), finite),
            st.tuples(st.just("set_inf"),
                      st.integers(min_value=0, max_value=n - 1)),
        ),
        max_size=60,
    ))
    return init, ops


@settings(max_examples=200, deadline=None)
@given(heap_trace())
def test_indexed_min_heap_matches_naive_model(trace):
    init, ops = trace
    heap = IndexedMinHeap(np.array(init, dtype=float))
    model = NaiveHeap(init)
    assert heap.min() == model.min()
    for op in ops:
        if op[0] == "add":
            _, idx, delta = op
            heap.add(idx, delta)
            model.add(idx, delta)
        else:
            _, idx = op
            heap.set_inf(idx)
            model.set_inf(idx)
        got_i, got_v = heap.min()
        want_i, want_v = model.min()
        if math.isinf(want_v):
            # all entries peeled: value contract only (index is the
            # padding-leaf artifact both callers ignore at this point)
            assert math.isinf(got_v)
        else:
            assert (got_i, got_v) == (want_i, want_v)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False),
                min_size=2, max_size=2))
def test_lse2_matches_numpy_logaddexp(vals):
    """The JVM-side lse2 column expr mirrors the reference's safe
    logsumexp (SpEagle.py:210-215); its python spec is np.logaddexp —
    check the max-shift formula itself, which is what the Column expr
    encodes symbol-for-symbol."""
    a, b = vals
    mx = max(a, b)
    got = mx + math.log(math.exp(a - mx) + math.exp(b - mx))
    assert math.isclose(got, float(np.logaddexp(a, b)),
                        rel_tol=1e-12, abs_tol=1e-12)
