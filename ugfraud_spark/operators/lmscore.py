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
