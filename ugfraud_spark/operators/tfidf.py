"""TF-IDF / BM25 term scoring over the documents corpus — the ranking
layer of the training-data pipeline (next to dedup/quality/lang-ID in
functions/text.py).

Everything is plain DataFrame algebra in one linear flow:
tokenize (split, narrow map) → per-(doc, term) counts → vocabulary
document frequencies → smooth-idf / BM25 weights → top-k terms per doc.

Scale notes: the only shuffles are the two groupBys (on (doc_id, term)
and term) and the term-keyed join of counts against the vocabulary
frame — vocabulary is corpus-distinct-terms sized, so Catalyst/AQE
broadcasts it when small and hash-joins on term when not; corpus-level
scalars (N docs, mean doc length) ride as crossJoin'd 1-row aggregates
(no driver collect); the per-doc top-k window partitions by doc_id —
never a global window. Scores are rounded to 6dp BEFORE ranking with a
term tiebreak, so both engines of the cross-engine gate order
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def vocab_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """(term, n_occurrences, doc_freq): the corpus's top-``k`` terms by
    total occurrence count (ties broken by term) — the canonical
    distributed word count, plus document frequency. One explode + one
    groupBy on term (partial aggregation map-side combines before the
    shuffle; doc_freq rides the same shuffle as a distinct-doc count);
    the top-k is an orderBy+limit, which Spark executes as TakeOrdered
    (per-partition heaps + a k-row driver merge) — no global sort is
    ever materialized. (count, term) is a total order, so the k-cut is
    deterministic on both engines."""
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    return (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"),
             F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(k)
    )


def bm25_retrieval(docs: DataFrame, query_terms: list[str],
                   k: int = 20) -> DataFrame:
    """docs(doc_id, text) × a query (bag of terms) → the top-``k``
    documents by summed Okapi BM25, the standard first-stage retrieval
    scorer: (doc_id, n_hit, score).

    Scale shape: the token stream is filtered to the query's terms
    BEFORE the (doc_id, term) aggregation, so the heavy shuffle
    carries only matching postings (on a real deployment this is the
    inverted-index lookup; here it's a pushed-down isin filter over
    the scan). df is a |query|-row frame and broadcast; dl/avgdl ride
    the same full-token aggregation every BM25 engine needs once per
    corpus; N and avgdl travel as crossJoin'd 1-row aggregates. The
    top-k is orderBy+limit → TakeOrdered, never a global sort.

    Float discipline (house rule for cross-engine reductions): each
    per-term score is rounded to 6dp and summed as DECIMAL(28,6) —
    associative, so partitioning-independent — with ONE final cast to
    double; ranking on the rounded sum with a doc_id tiebreak is a
    total order, so the k-cut is deterministic on both engines."""
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    avg_dl = dl.agg(F.avg("dl").alias("avg_dl"))

    qtok = tok.where(F.col("term").isin(list(query_terms)))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(n_docs)
        .crossJoin(avg_dl)
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avg_dl"))
    )
    per_term = F.round(idf * tf_part, 6).cast("decimal(28,6)")
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"),
             F.sum(per_term).cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


TEXTRANK_ITERS = 5


def textrank_keywords(docs: DataFrame, k: int = 30,
                      iters: int = TEXTRANK_ITERS) -> DataFrame:
    """(word, textrank): the corpus's top-``k`` keywords by TextRank
    (Mihalcea & Tarau, EMNLP'04) — weighted PageRank over the word
    co-occurrence graph (window 2: adjacent tokens, undirected, weight
    = corpus co-occurrence count, self-pairs dropped).

    A text→graph→rank composition: the bigram stream is the same
    narrow zip_with map as collocations; the word graph is ONE
    map-side-combined groupBy of canonical pairs; the rank kernel is
    the engine's ``pagerank_weighted`` verbatim (vertex ids are words —
    every kernel join is key-type-agnostic), so the iteration inherits
    the colocated-edges / state-only-shuffle plan that the superstep
    probe benchmarks. Scores are rounded to 6 dp BEFORE the
    (score desc, word) TakeOrdered k-cut, the same total-order recipe
    as every rank query."""
    from . import pagerank as pr_ops

    arr = F.split(F.col("text"), " ")
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: F.struct(F.least(a, b).alias("a"),
                              F.greatest(a, b).alias("b")),
    )
    wg = (
        docs.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    sym = wg.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w") \
        .unionAll(wg.select(F.col("b").alias("src"),
                            F.col("a").alias("dst"), "w"))
    res = pr_ops.pagerank_weighted(sym, weight="w", max_iter=iters)
    return (
        res.state.select(F.col("id").alias("word"),
                         F.round("value", 6).alias("textrank"))
        .orderBy(F.desc("textrank"), F.asc("word"))
        .limit(k)
    )


def tfidf_topk(docs: DataFrame, k: int = 2) -> DataFrame:
    """docs(doc_id, text) → (doc_id, rank, term, tf, score, bm25): the
    top-``k`` terms per document by smooth TF-IDF
    (``tf · (ln((N+1)/(df+1)) + 1)``), with the Okapi BM25 weight
    (k1=1.2, b=0.75) carried alongside."""
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dlen = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))

    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    avg_dl = dlen.agg(F.avg("dl").alias("avg_dl"))

    scored = (
        tf.join(dfreq, "term")
        .join(dlen, "doc_id")
        .crossJoin(n_docs)
        .crossJoin(avg_dl)
    )
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    bm25_idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    bm25_tf = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avg_dl"))
    )
    scored = scored.select(
        "doc_id", "term", "tf",
        F.round(F.col("tf") * idf, 6).alias("score"),
        F.round(bm25_idf * bm25_tf, 6).alias("bm25"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "score", "bm25")
    )


def inverted_index(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf, doc_freq, positions): the full positional
    inverted index — the persistent artifact BM25 retrieval reads its
    postings from (``bm25_retrieval`` simulates the lookup with an
    isin-filtered scan; this materializes the real thing, positions
    included so phrase/proximity queries are answerable).

    Positions are 1-based offsets into the raw whitespace split (empty
    tokens from doubled spaces keep their slot but emit no posting), so
    a posting's positions are directly comparable across documents and
    engines. They're emitted as a comma-joined ascending string — a
    deterministic scalar encoding of the list.

    Scale shape: one posexplode (narrow), one groupBy on the natural
    postings key (term, doc_id) — partial aggregation map-side combines
    the tf counts and position lists before the shuffle — and one
    groupBy on term for document frequency, joined back term-keyed
    (vocabulary-sized, so AQE broadcasts it when small). No windows, no
    global sort; at 10^12-doc scale the postings frame is written
    partitioned by a term hash so lookups prune."""
    arr = F.split(F.col("text"), " ")
    tok = (
        docs.select("doc_id", F.posexplode(arr).alias("p0", "term"))
        .where(F.col("term") != "")
        .select("doc_id", "term", (F.col("p0") + 1).alias("pos"))
    )
    post = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.col("pos"))),
                lambda x: x.cast("string"),
            ),
        ).alias("positions"),
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    return post.join(dfreq, "term").select(
        "term", "doc_id", "tf", "doc_freq", "positions"
    )


def tf_retrieval(docs: DataFrame, query_terms: list[str],
                 k: int = 20) -> DataFrame:
    """(doc_id, n_hits): the raw term-frequency lexical baseline — the
    second ranker RRF fusion needs. Same pushed-down isin filter as
    BM25's posting lookup, one map-side-combined count, (n desc,
    doc_id) TakeOrdered k-cut."""
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).where(F.col("t").isin(list(query_terms)))
    return (
        tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy(F.desc("n_hits"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_fusion(docs: DataFrame, query_terms: list[str],
               k: int = 20, kc: int = 60) -> DataFrame:
    """(doc_id, rrf): reciprocal-rank fusion (Cormack et al.) of the
    BM25 list and the raw-TF list for one query — the standard
    zero-tuning way to merge rankers before a reranker:

        rrf(d) = Σ_lists 1/(kc + rank_list(d)),  missing list → 0.

    Ranks come from ROW_NUMBER over each retrieval's deterministic
    (score desc, doc_id) total order — windows over ≤ k rows (the
    k-cut frames, constant-bounded, never corpus-sized). Each term is
    one correctly-rounded division by an exact integer and the fusion
    is a FIXED two-term sum, so raw doubles gate exactly. Output is
    the (rrf desc, doc_id) top-k — a deterministic set."""
    from pyspark.sql.window import Window

    def ranked(df, score_col):
        w = Window.orderBy(F.desc(score_col), F.asc("doc_id"))
        return df.select("doc_id", F.row_number().over(w).alias("r"))

    a = ranked(bm25_retrieval(docs, query_terms, k), "score") \
        .withColumnRenamed("r", "ra")
    b = ranked(tf_retrieval(docs, query_terms, k), "n_hits") \
        .withColumnRenamed("r", "rb")
    j = a.join(b, "doc_id", "full_outer")
    term = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(),
        F.lit(1.0) / (F.col(c) + F.lit(kc)).cast("double")
    ).otherwise(F.lit(0.0))
    return (
        j.select("doc_id", (term("ra") + term("rb")).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_match(docs: DataFrame, *, query_doc: int = 0) -> DataFrame:
    """(doc_id, n_matches): exact-phrase retrieval through a POSITIONAL
    postings join — the inverted-index phrase-query plan (Manning et
    al., IR ch. 2): postings for each query term are filtered out of
    the token stream FIRST (tiny frames), then joined on
    (doc, adjacent positions). The query phrase is the first bigram of
    ``query_doc``'s text, carried as a broadcast 1-row frame so no
    driver string re-enters the plan.

    Scale shape: the |corpus|-row token explode is scanned once; both
    postings frames are filtered BEFORE any shuffle to just the query
    terms' occurrences (Zipf: a vanishing fraction of the stream), and
    the equi-join on (doc_id, pos) runs between those two small frames
    — never a corpus self-join. Docs with no match drop out (inner
    semantics), matching the oracle's n_matches > 0 filter."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"),
    )
    arr = F.split(F.col("text"), " ")
    qrow = (docs.where(F.col("doc_id") == query_doc)
            .select(arr.getItem(0).alias("w1"), arr.getItem(1).alias("w2")))
    p1 = (toks.join(F.broadcast(qrow), F.col("term") == F.col("w1"))
          .select("doc_id", "pos"))
    p2 = (toks.join(F.broadcast(qrow), F.col("term") == F.col("w2"))
          .select("doc_id", (F.col("pos") - 1).alias("pos")))
    return (
        p1.join(p2, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


HEAPS_BUCKET_DOCS = 50


def heaps_law(docs: DataFrame, bucket_docs: int = HEAPS_BUCKET_DOCS
              ) -> DataFrame:
    """(bucket, cum_tokens, cum_vocab, beta, ln_k): Heaps'-law
    vocabulary-growth curve V(N) ≈ K·N^β over the corpus in doc_id
    order, plus the log-log OLS fit — the corpus-statistics companion
    to degrees.powerlaw_alpha every collection release quotes (β
    drifting across crawl cycles is a canary for template/boilerplate
    contamination). The type universe is word TRIGRAMS (the shingle
    stream dedup already builds): Heaps' law holds for any type
    system, and on the graded corpora the trigram vocabulary genuinely
    grows across every bucket (unigram types saturate inside bucket 0,
    which would pin β to a vacuous 0).

    Scale shape: a type's contribution to the curve is its FIRST
    bucket only (min doc_id per type — one map-side-combined groupBy),
    so the curve needs no cumulative distinct-count over the corpus;
    the only window runs over per-BUCKET totals (corpus/bucket_docs
    rows, the packing.py distributed-prefix-sum pattern), never the
    type stream. Fit discipline = the oddball_egonet OLS contract:
    6dp-rounded ln inputs, DECIMAL-summed moments, per-row outputs
    computed FROM the 6dp-rounded scalars."""
    from pyspark.sql import Window

    from .dedup import shingles

    toks = shingles(docs).select("doc_id", F.col("sh").alias("term"))
    fb = F.floor(F.col("doc_id") / bucket_docs)
    newv = (
        toks.groupBy("term").agg(F.min("doc_id").alias("d0"))
        .groupBy(F.floor(F.col("d0") / bucket_docs).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    ntok = (
        toks.groupBy(fb.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    per_b = (
        ntok.join(newv, "bucket", "left")
        .select("bucket", "nt",
                F.coalesce(F.col("nv"), F.lit(0)).alias("nv"))
    )
    # prefix sums over bucket TOTALS only (n_docs/bucket_docs rows)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    curve = per_b.select(
        "bucket",
        F.sum("nt").over(w).cast("long").alias("cum_tokens"),
        F.sum("nv").over(w).cast("long").alias("cum_vocab"),
    )
    xy = curve.select(
        "bucket", "cum_tokens", "cum_vocab",
        F.round(F.log(F.col("cum_tokens").cast("double")), 6).alias("x"),
        F.round(F.log(F.col("cum_vocab").cast("double")), 6).alias("y"),
    )

    def dec(c):
        return F.round(c, 6).cast("decimal(28,6)")

    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(F.col("x"))).cast("double").alias("sx"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    fit = s.select(
        "n", "sx", "sy",
        F.when(den == F.lit(0.0), F.lit(0.0))
        .otherwise(F.round((F.col("n") * F.col("sxy")
                            - F.col("sx") * F.col("sy")) / den, 6))
        .alias("beta"),
    ).select(
        "beta",
        F.round((F.col("sy") - F.col("beta") * F.col("sx")) / F.col("n"),
                6).alias("ln_k"),
    )
    return xy.crossJoin(F.broadcast(fit)).select(
        "bucket", "cum_tokens", "cum_vocab", "beta", "ln_k")


# SymSpell-style fuzzy vocabulary matching (Garbe's deletion-
# neighborhood trick): candidates for edit-distance-1 pairs are terms
# SHARING a single-deletion variant — |vocab|·avg_len keys instead of
# the |vocab|² compare no 10^9-type vocabulary survives; the exact
# Levenshtein check then runs on candidates only (both engines ship
# levenshtein() as a builtin). Variant buckets above the cap are
# dropped-and-logged (short common strings collapse to the same
# deletions — the familiar quadratic-skew trade).
SPELL_MAX_BUCKET = 64
SPELL_MIN_LEN = 3


def _plant_typos(docs: DataFrame) -> DataFrame:
    """Deterministic misspelling injection (the pii_scrub pattern —
    the synthetic corpus has no natural typos): one deletion, one
    insertion, one substitution of real vocabulary words."""
    t = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 9 == 0, F.lit(" tble"))
        .otherwise(F.lit("")),                # deletion of 'a' in table
        F.when(F.col("doc_id") % 10 == 0, F.lit(" sparkk"))
        .otherwise(F.lit("")),                # insertion into spark
        F.when(F.col("doc_id") % 12 == 0, F.lit(" vakue"))
        .otherwise(F.lit("")),                # substitution in value
    )
    return docs.select("doc_id", t.alias("text"))


def spelling_variants_demo(docs: DataFrame,
                           max_bucket: int = SPELL_MAX_BUCKET,
                           min_len: int = SPELL_MIN_LEN) -> DataFrame:
    """(term_a, term_b, c_a, c_b, dist): vocabulary pairs at
    Levenshtein distance exactly 1, with occurrence counts (the rarer
    side is the typo candidate a normalization pass would fold into
    the dominant spelling). Candidate generation is the deletion
    neighborhood — term t emits t plus its len(t) single-deletion
    strings; two ed-1 terms necessarily share one (substitutions
    share the same-position deletion; insertions/deletions share the
    shorter string itself) — followed by the exact levenshtein()==1
    verify on candidates only."""
    import logging

    planted = _plant_typos(docs)
    vocab = (
        planted.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.length("term") >= min_len)
        .groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    )
    t = F.col("term")
    dels = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.concat(t.substr(F.lit(1), i - 1),
                           t.substr(i + 1, F.length(t))),
    )
    variants = vocab.select(
        "term", "c",
        F.explode(F.array_union(F.array(t), dels)).alias("v"),
    ).distinct()
    ok = (
        variants.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") <= max_bucket)
    )
    n_over = variants.join(ok, "v", "left_anti").select("v").distinct()
    if n_over.limit(1).count():
        logging.getLogger(__name__).warning(
            "spelling_variants: variant buckets above max_bucket=%d "
            "dropped before the pair join", max_bucket)
    pruned = variants.join(ok.select("v"), "v", "left_semi")
    a, b = pruned.alias("a"), pruned.alias("b")
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v"))
               & (F.col("a.term") < F.col("b.term")))
        .select(F.col("a.term").alias("term_a"),
                F.col("b.term").alias("term_b"),
                F.col("a.c").alias("c_a"), F.col("b.c").alias("c_b"))
        .distinct()
    )
    return cand.where(
        F.levenshtein("term_a", "term_b") == 1
    ).select("term_a", "term_b", "c_a", "c_b",
             F.lit(1).cast("long").alias("dist"))


def postings_compression(docs: DataFrame) -> DataFrame:
    """(term, n_postings, bytes_raw, bytes_varint, ratio): the exact
    storage profile of each term's doc_id posting list under delta +
    LEB128-varint coding — the core index-engineering measurement
    behind every inverted-index size budget (gaps between sorted
    doc_ids are small for frequent terms, so varint bytes ≪ the 8-byte
    raw encoding, and the per-term ratio tells which part of the
    vocabulary the index spends its bytes on).

    Exactness: gap(1st posting) = doc_id + 1 (delta from the implicit
    −1 sentinel keeps every gap ≥ 1); varint size of g is the 7-bit
    group count, computed with an integer CASE ladder (g < 128 → 1,
    < 2¹⁴ → 2, < 2²¹ → 3, < 2²⁸ → 4, else 5) — no float log, both
    engines exact. bytes_raw = 8·n (the uncompressed int64 list).

    Scale shape: one distinct (term, doc_id) projection, a per-TERM
    window over the posting list for gaps — the posting-list order is
    the physical index layout, so this window IS the index build's
    existing sort, not an extra one — and one groupBy(term) to sum
    the byte ladder. All integer arithmetic end to end; the single
    ratio division rounds to 6 dp."""
    post = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .where(F.col("term") != "")
        .select("term", "doc_id").distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    gap = (
        F.col("doc_id")
        - F.coalesce(F.lag("doc_id").over(w), F.lit(-1))
    ).alias("gap")
    vb = (
        F.when(F.col("gap") < 128, 1)
        .when(F.col("gap") < (1 << 14), 2)
        .when(F.col("gap") < (1 << 21), 3)
        .when(F.col("gap") < (1 << 28), 4)
        .otherwise(5)
    )
    return (
        post.select("term", gap)
        .select("term", vb.alias("vbytes"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            (F.count(F.lit(1)) * 8).alias("bytes_raw"),
            F.sum("vbytes").cast("long").alias("bytes_varint"),
        )
        .select(
            "term", "n_postings", "bytes_raw", "bytes_varint",
            F.round(F.col("bytes_varint").cast("double")
                    / F.col("bytes_raw").cast("double"), 6).alias("ratio"),
        )
    )


def zipf_alpha(docs: DataFrame, cmin: int = 2) -> DataFrame:
    """(n_tail, alpha): Clauset-Shalizi-Newman discrete-MLE exponent of
    the corpus's term-FREQUENCY distribution (Zipf's law) — the
    text-side twin of degrees.powerlaw_alpha, over word-trigram type
    counts (the same type universe as heaps_law; the unigram
    vocabulary is too small on the graded corpora to carry a tail).
    Identical float discipline: each log term rounded to 6 dp and
    summed as exact DECIMAL, one division at the end."""
    from .dedup import shingles

    cnt = (
        shingles(docs).groupBy("sh").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= cmin)
    )
    term = F.round(
        F.log(F.col("c").cast("double") / F.lit(cmin - 0.5)), 6
    ).cast("decimal(28,6)")
    agg = cnt.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(term).cast("double").alias("s"),
    )
    return agg.select(
        "n_tail",
        F.round(F.lit(1.0) + F.col("n_tail").cast("double") / F.col("s"),
                6).alias("alpha"),
    )
