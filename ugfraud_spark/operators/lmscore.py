"""Corpus-LM document scoring (CCNet-style perplexity filtering).

The quality signal CCNet/RedPajama filter on: score every document by
its average token log-probability under a language model trained on
the corpus itself — here an add-one-smoothed bigram model, the
classical count-based LM that is exactly expressible in relational
algebra (so the DuckDB oracle replays it verbatim):

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)

with c(w1 w2) the corpus bigram count, c(w1 ·) the count of w1 as a
bigram head, and V the corpus vocabulary size.

Scale shape: the bigram stream is the corpus token stream (the one
genuinely |corpus·len|-sized frame) — it is built by a narrow
zip_with projection, counted with ONE map-side-combined groupBy, and
scored by joining the stream back to the two count tables on their
natural keys (bigram / head token). Both count tables are aggregates
(≤ distinct-bigram sized); at 100 TB the stream⋈counts join is a
plain shuffle hash join on the bigram key and AQE handles the Zipf
head. V rides a broadcast 1-row crossJoin.

Determinism: each bigram's log-prob is rounded to 6 dp and the
per-doc mean is computed as an exact DECIMAL(28,6) sum divided by the
bigram count — associative, so partitioning- and engine-order-
independent. Docs with < 2 tokens have no bigram and are absent from
the output on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigram_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, bg): one row per bigram occurrence, head token
    carried natively (no string re-parsing downstream)."""
    arr = F.split(F.col("text"), " ")
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: F.struct(
            a.alias("w1"), F.concat(a, F.lit(" "), b).alias("bg")
        ),
    )
    return docs.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))


COLLOC_MIN_COUNT = 5


def collocations(docs: DataFrame, min_count: int = COLLOC_MIN_COUNT,
                 k: int = 30) -> DataFrame:
    """(w1, w2, n_pair, pmi): the corpus's top-``k`` adjacent-bigram
    collocations by pointwise mutual information — the phrase-mining
    primitive (Mikolov-style word2phrase, ELI5 "New York" detection)
    that sits next to the per-doc LM score in a text pipeline.

        pmi = ln( P(w1 w2) / (P(w1)·P(w2)) )
            = ln( c(w1 w2)·N² / (N_bg·c(w1)·c(w2)) )

    with N total tokens, N_bg total bigrams, all counts corpus-level
    integers. ``min_count`` drops the unstable low-count tail (the
    standard collocation-mining guard: a 1-occurrence pair of two
    hapaxes has maximal PMI and zero evidence).

    Scale shape: the bigram stream is a narrow zip_with map (no
    posexplode/window shuffle — the shingle lesson); the three count
    frames are ONE map-side-combined groupBy each; the pair table is
    distinct-bigram-sized, so the two unigram joins broadcast (w1/w2
    key) and the scalars ride a crossJoin'd 1-row frame; the k-cut is
    orderBy+limit → TakeOrdered, never a global sort. Determinism: pmi
    is one LN of a ratio of exact BIGINT products evaluated in an
    identical left-associated double expression on both engines (every
    product < 2^53 at sandbox scales; lift to DECIMAL(38,0) counts at
    10¹² tokens), rounded to 6 dp; (pmi desc, w1, w2) is a total
    order, so the k-cut is engine-independent."""
    arr = F.split(F.col("text"), " ")
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    stream = docs.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    # the stream feeds the pair count and the bigram total; the token
    # scan feeds unigram counts + the token total (one pass each)
    stream = stream.localCheckpoint(eager=True)
    pair_counts = (
        stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    )
    n_bg = stream.agg(F.count(F.lit(1)).alias("n_bg"))
    tok = docs.select(F.explode(arr).alias("tok"))
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n_tok = tok.agg(F.count(F.lit(1)).alias("n_tok"))
    scored = (
        pair_counts.where(F.col("n_pair") >= min_count)
        .join(F.broadcast(uni.select(F.col("tok").alias("w1"),
                                     F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(uni.select(F.col("tok").alias("w2"),
                                     F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(n_bg))
        .crossJoin(F.broadcast(n_tok))
    )
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast("double") * F.col("n_tok") * F.col("n_tok"))
            / (F.col("n_bg").cast("double") * F.col("c1") * F.col("c2"))
        ),
        6,
    )
    return (
        scored.select("w1", "w2", "n_pair", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def lm_doc_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob): each doc's mean add-one-
    smoothed bigram log-probability under the corpus's own counts —
    low scores mark improbable (junk/boilerplate-mangled) text."""
    # the stream feeds three consumers (two count tables + the scoring
    # join): materialize it once, house rule for multi-consumer frames
    stream = _bigram_stream(docs).localCheckpoint(eager=True)
    bg_counts = stream.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    w1_counts = stream.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    # vocab needs ALL tokens (a 1-token doc is in V but has no bigram),
    # so it cannot come from the stream; it is a separate column-pruned
    # scan feeding one map-side-combined count-distinct
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    logp = F.round(
        F.log(
            (F.col("c_bg") + 1).cast("double")
            / (F.col("c_w1") + F.col("v")).cast("double")
        ),
        6,
    )
    scored = (
        stream.join(bg_counts, "bg")
        .join(w1_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", logp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.col("lp").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_logprob"),
    )


def skipgram_pairs(docs: DataFrame, window: int = 3,
                   min_count: int = COLLOC_MIN_COUNT) -> DataFrame:
    """(w1, w2, n): skip-gram co-occurrence counts — every forward
    (center, context-within-+window) token pair over the corpus, the
    training-pair extraction word2vec/GloVe pipelines run (collocations
    above is the adjacent-only PMI subset; this is the full window).

    Pair formation is PURE ARRAY EXPRESSIONS over one split() — for
    each offset d in 1..window, `transform(slice(ws, 1, n-d))` pairs
    ws[i] with ws[i+d] — so nothing shuffles until the (w1, w2) count
    groupBy (map-side combined; output is vocabulary², not corpus,
    sized). Pairs are formed at RAW whitespace offsets (doubled spaces
    leave empty slots that keep distances honest) and pairs touching an
    empty slot are dropped after, exactly like inverted_index's
    position rule. The min_count filter makes the output a
    deterministic SET — no top-k tie cut.
    """
    ws = F.split(F.col("text"), " ")
    per_d = [
        F.expr(
            f"transform(slice(ws, 1, greatest(size(ws) - {d}, 0)), "
            f"(x, i) -> struct(x AS w1, ws[i + {d}] AS w2))"
        )
        for d in range(1, window + 1)
    ]
    pairs = (
        docs.select(ws.alias("ws"))
        .select(F.explode(F.concat(*per_d)).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )


def source_lm_profile(docs: DataFrame) -> DataFrame:
    """(source, n_docs, mean_logprob): the per-source LM-quality
    profile — mean per-document corpus-LM score by source, the number
    a source-level filtering/weighting decision (C4-style "drop the
    spammy feed") actually reads. Docs with no bigram carry no score
    and are excluded by the join, like in lm_doc_scores itself.

    Float discipline: per-doc avg_logprob is already 6dp (see
    lm_doc_scores); the per-source mean sums those as exact
    DECIMAL(28,6) — associative, partitioning-independent — with one
    division + one final 6dp round (the house decimal-reduce rule).
    Scale shape: the doc_id join plus ONE map-side-combined groupBy
    on the tiny source key."""
    per_doc = lm_doc_scores(docs)
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("avg_logprob").cast("decimal(28,6)"))
                .cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_logprob"),
        )
    )


def retrieval_tau(ra: DataFrame, rb: DataFrame) -> DataFrame:
    """(n_common, concordant, discordant, tau): Kendall tau-a between
    two retrieval rankings over their COMMON documents — the exact
    rank-agreement certificate for a ranker swap (tau 1 = same order,
    −1 = reversed). `ra`/`rb` are (doc_id, r) rank frames.

    Pure integers until ONE division: pairs of common docs are a
    self-join of the (tiny, k-cut-bounded) joined rank frame —
    C(k,2) rows at most, never corpus-sized."""
    j = ra.select("doc_id", F.col("r").alias("r_a")).join(
        rb.select("doc_id", F.col("r").alias("r_b")), "doc_id")
    l, r = j.alias("l"), j.alias("r")
    pairs = l.join(
        r, F.col("l.doc_id") < F.col("r.doc_id")).select(
        ((F.col("l.r_a") < F.col("r.r_a"))
         == (F.col("l.r_b") < F.col("r.r_b"))).cast("bigint").alias("conc"))
    n = j.agg(F.count(F.lit(1)).alias("n_common"))
    agg = pairs.agg(
        F.sum("conc").alias("concordant"),
        F.sum(F.lit(1) - F.col("conc")).alias("discordant"),
    )
    return (
        agg.crossJoin(F.broadcast(n))
        .select(
            "n_common",
            F.coalesce("concordant", F.lit(0)).alias("concordant"),
            F.coalesce("discordant", F.lit(0)).alias("discordant"),
            F.when(
                F.col("n_common") >= 2,
                (F.coalesce("concordant", F.lit(0))
                 - F.coalesce("discordant", F.lit(0))).cast("double")
                / F.expr("(n_common * (n_common - 1)) div 2")
                .cast("double"),
            ).alias("tau"),
        )
    )
