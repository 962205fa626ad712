"""TF-IDF/BM25 known-value semantics (operators/tfidf.py). The full
cross-engine gate (tokenize → tf → df → idf → BM25 → rank vs DuckDB)
runs in test_oracle_parity via the shadow registry (tfidf_topk)."""

from __future__ import annotations

import math

import pytest

from ugfraud_spark.operators.tfidf import BM25_B, BM25_K1, tfidf_topk


def test_tfidf_known_values_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(0, "apple apple banana"),   # apple tf=2 rare-ish, banana everywhere
         (1, "banana banana banana"),
         (2, "cherry banana")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["rank"]): r for r in tfidf_topk(docs, k=2).collect()}

    # doc 0: apple df=1, banana df=3, N=3
    apple = out[(0, 1)]
    assert apple["term"] == "apple" and apple["tf"] == 2
    assert apple["score"] == round(2 * (math.log(4 / 2) + 1), 6)
    assert out[(0, 2)]["term"] == "banana"

    # doc 2: cherry (df=1) outranks banana (df=3) despite equal tf
    assert out[(2, 1)]["term"] == "cherry"

    # BM25 known value for doc 1's banana: tf=3, df=3, dl=3, avg_dl=8/3
    b = out[(1, 1)]
    idf = math.log(1 + (3 - 3 + 0.5) / (3 + 0.5))
    tf_part = (3 * (BM25_K1 + 1)) / (
        3 + BM25_K1 * (1 - BM25_B + BM25_B * 3 / (8 / 3)))
    assert b["bm25"] == round(idf * tf_part, 6)


def test_tfidf_equal_scores_break_by_term(spark):
    docs = spark.createDataFrame(
        [(0, "zeta alpha"), (1, "zeta alpha")], "doc_id long, text string")
    out = {(r["doc_id"], r["rank"]): r["term"]
           for r in tfidf_topk(docs, k=2).collect()}
    # identical tf and df → identical score → lexicographic term order
    assert out[(0, 1)] == "alpha" and out[(0, 2)] == "zeta"
    assert out[(1, 1)] == "alpha" and out[(1, 2)] == "zeta"


def test_bm25_retrieval_semantics(spark):
    """Retrieval claims the shared-formula oracle can't see: more
    matching occurrences rank higher at equal length, longer docs are
    penalized at equal tf, rare query terms outweigh common ones, and
    the score equals a python replay."""
    from ugfraud_spark.operators.tfidf import bm25_retrieval

    docs = spark.createDataFrame(
        [(0, "apple apple apple pad"),       # tf(apple)=3, dl=4
         (1, "apple apple filler pad"),      # tf(apple)=2, dl=4
         (2, "apple apple filler pad pad pad pad pad"),  # tf=2, dl=8
         (3, "rare pad pad"),                # the df=1 term
         (4, "apple pad"),
         (5, "pad pad pad")],                # no query term → absent
        "doc_id long, text string")
    out = bm25_retrieval(docs, ["apple", "rare"], k=10).collect()
    score = {r["doc_id"]: r["score"] for r in out}
    nhit = {r["doc_id"]: r["n_hit"] for r in out}
    assert 5 not in score and len(score) == 5
    assert score[0] > score[1]          # more tf, same dl
    assert score[1] > score[2]          # same tf, longer doc penalized
    # rare (df=1) in doc 3 beats a single common apple (df=4) in doc 4
    assert score[3] > score[4]
    assert nhit == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1}

    # python replay of doc 0
    import math
    n, df_apple = 6, 4
    dls = {0: 4, 1: 4, 2: 8, 3: 3, 4: 2, 5: 3}
    avg_dl = sum(dls.values()) / 6
    idf = math.log(1 + (n - df_apple + 0.5) / (df_apple + 0.5))
    tp = (3 * (1.2 + 1.0)) / (3 + 1.2 * (0.25 + 0.75 * 4 / avg_dl))
    assert score[0] == round(idf * tp, 6)


def test_textrank_python_replay_and_centrality(spark):
    """Exact python replay of weighted PageRank on the adjacent-word
    graph; the word that co-occurs with everything ranks first."""
    from collections import defaultdict

    from ugfraud_spark.operators.tfidf import textrank_keywords

    texts = ["hub alpha hub beta hub gamma",
             "delta hub alpha beta",
             "gamma delta"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    out = [(r["word"], r["textrank"])
           for r in textrank_keywords(docs, k=10, iters=5).collect()]

    w = defaultdict(float)
    for t in texts:
        ws = t.split(" ")
        for x, y in zip(ws, ws[1:]):
            if x != y:
                w[(min(x, y), max(x, y))] += 1.0
    adj = defaultdict(dict)
    for (a, b), c in w.items():
        adj[a][b] = adj[a].get(b, 0) + c
        adj[b][a] = adj[b].get(a, 0) + c
    verts = sorted(adj)
    n = len(verts)
    outw = {v: sum(adj[v].values()) for v in verts}
    r = {v: 1.0 / n for v in verts}
    for _ in range(5):
        nxt = {}
        for v in verts:
            mass = sum((r[u] / outw[u]) * cw for u, cw in adj[v].items())
            nxt[v] = 0.15 / n + 0.85 * mass
        r = nxt
    want = sorted(((round(s, 6), v) for v, s in r.items()),
                  key=lambda t: (-t[0], t[1]))
    assert out == [(v, s) for s, v in want]
    assert out[0][0] == "hub"


def test_inverted_index_positions_and_df(spark):
    """Hand replay: positions are 1-based raw-split offsets (a doubled
    space burns a slot but emits no posting), tf = |positions|,
    doc_freq counts postings per term."""
    from ugfraud_spark.operators.tfidf import inverted_index

    docs = spark.createDataFrame(
        [(1, "a b a  b a"),   # raw split: a,b,a,'',b,a -> a@1,3,6 b@2,5
         (2, "b c"),
         (3, "c")],
        "doc_id long, text string")
    out = {(r["term"], r["doc_id"]): r for r in
           inverted_index(docs).collect()}

    assert set(out) == {("a", 1), ("b", 1), ("b", 2), ("c", 2), ("c", 3)}
    assert out[("a", 1)]["positions"] == "1,3,6"
    assert out[("a", 1)]["tf"] == 3
    assert out[("b", 1)]["positions"] == "2,5"
    assert out[("b", 2)]["positions"] == "1"
    assert out[("a", 1)]["doc_freq"] == 1
    assert out[("b", 1)]["doc_freq"] == 2
    assert out[("b", 2)]["doc_freq"] == 2
    assert out[("c", 3)]["doc_freq"] == 2


def test_rrf_fusion_hand_replay(spark):
    """RRF replayed from the two component rankings; docs in only one
    list get the single term; ordering is (rrf desc, doc_id)."""
    from ugfraud_spark.operators.tfidf import (
        bm25_retrieval, rrf_fusion, tf_retrieval)

    texts = [
        (1, "spark spark spark hash"),
        (2, "spark hash window window hash"),
        (3, "window"),
        (4, "nothing relevant here at all"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    q = ["spark", "hash", "window"]
    # deterministic rank replay: (score desc, doc_id)
    ra = {r["doc_id"]: i + 1 for i, r in enumerate(sorted(
        bm25_retrieval(docs, q, 3).collect(),
        key=lambda r: (-r["score"], r["doc_id"])))}
    rb = {r["doc_id"]: i + 1 for i, r in enumerate(sorted(
        tf_retrieval(docs, q, 3).collect(),
        key=lambda r: (-r["n_hits"], r["doc_id"])))}
    want = {}
    for d in set(ra) | set(rb):
        want[d] = (1.0 / (ra[d] + 60) if d in ra else 0.0) \
            + (1.0 / (rb[d] + 60) if d in rb else 0.0)
    got = {r["doc_id"]: r["rrf"]
           for r in rrf_fusion(docs, q, k=3).collect()}
    top3 = dict(sorted(want.items(),
                       key=lambda kv: (-kv[1], kv[0]))[:3])
    assert got == top3
    assert 4 not in got  # no query term, in neither list


def test_heaps_law_hand_curve(spark):
    """Two-bucket hand corpus: trigram types counted once at their
    FIRST bucket, prefix sums over bucket totals, and the OLS slope
    matching the two-point closed form under the 6dp schedule."""
    import math

    from ugfraud_spark.operators import tfidf as T

    rows = [
        (0, "a b c d"),   # types: "a b c", "b c d"
        (1, "a b c e"),   # new type: "b c e"
        (2, "a b c d"),   # nothing new
        (3, "x y z w"),   # new: "x y z", "y z w"
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in
           T.heaps_law(docs, bucket_docs=2).collect()}
    assert out[0]["cum_tokens"] == 4 and out[0]["cum_vocab"] == 3
    assert out[1]["cum_tokens"] == 8 and out[1]["cum_vocab"] == 5
    x = [round(math.log(4), 6), round(math.log(8), 6)]
    y = [round(math.log(3), 6), round(math.log(5), 6)]
    n = 2.0
    sx, sy = sum(x), sum(y)
    sxy = sum(round(a * b, 6) for a, b in zip(x, y))
    sxx = sum(round(a * a, 6) for a in x)
    beta = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    ln_k = round((sy - beta * sx) / n, 6)
    assert out[0]["beta"] == pytest.approx(beta, abs=2e-6)
    assert out[0]["ln_k"] == pytest.approx(ln_k, abs=2e-6)


def test_spelling_variants_hand_corpus(spark):
    """Deletion-neighborhood candidates find all three ed-1 classes
    (deletion, insertion, substitution) and nothing at distance 2;
    counts ride along so the rarer spelling is identifiable."""
    from ugfraud_spark.operators.tfidf import spelling_variants_demo

    # doc_ids chosen so NO planting mods fire (9,10,12 don't divide 1,7)
    rows = [
        (1, "table cable tble tablet grape"),
        (7, "table table value"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["term_a"], r["term_b"]): r
           for r in spelling_variants_demo(docs).collect()}
    assert set(out) == {
        ("cable", "table"),    # substitution c→t
        ("table", "tble"),     # deletion of 'a'
        ("table", "tablet"),   # insertion of 't'
    }
    # grape is >=2 edits from everything; value–cable etc. absent
    r = out[("cable", "table")]
    assert r["c_a"] == 1 and r["c_b"] == 3 and r["dist"] == 1


def test_postings_compression_hand_lists(spark):
    """Varint ladder exactness: a dense list (all 1-byte gaps), a list
    whose first sentinel gap and a 20000-wide jump cross the 1→2-byte
    boundary, and the byte math on each."""
    from ugfraud_spark.operators.tfidf import postings_compression

    rows = [(d, "dense") for d in range(5)]            # gaps 1,1,1,1 (+1st)
    rows += [(0, "sparse"), (200, "sparse"), (20600, "sparse")]
    docs = spark.createDataFrame(
        [(d, t) for d, t in rows], "doc_id long, text string")
    out = {r["term"]: r for r in postings_compression(docs).collect()}

    d = out["dense"]
    assert d["n_postings"] == 5 and d["bytes_raw"] == 40
    assert d["bytes_varint"] == 5          # every gap < 128
    assert d["ratio"] == 0.125

    s = out["sparse"]
    # gaps: 0-(-1)=1 (1B), 200-0=200 (2B), 20600-200=20400 (2B... 
    # 20400 >= 16384 -> 3B)
    assert s["n_postings"] == 3 and s["bytes_raw"] == 24
    assert s["bytes_varint"] == 1 + 2 + 3
    assert s["ratio"] == 0.25


def test_zipf_alpha_known_counts(spark):
    """CSN discrete MLE on a corpus engineered to known trigram
    counts: within-doc repetition drives the counts, and the closed
    form over {3,2,2} reproduces alpha exactly."""
    import math

    from ugfraud_spark.operators.tfidf import zipf_alpha

    # doc engineered so gram "a b c" appears 3x, "b c a"/"c a b" 2x,
    # and the tail grams only once (below cmin=2)
    docs = spark.createDataFrame(
        [(1, "a b c a b c a b c x y z")], "doc_id long, text string")
    r = zipf_alpha(docs).collect()[0]
    counts = [3, 2, 2]
    s = sum(round(math.log(c / 1.5), 6) for c in counts)
    assert r["n_tail"] == 3
    assert r["alpha"] == pytest.approx(round(1.0 + 3 / s, 6), abs=2e-6)
