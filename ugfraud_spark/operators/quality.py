"""Gopher/C4-style document quality filter.

The keep/drop verdict a training-data pipeline applies before
tokenization, composed entirely from the engine's existing text
measurements (``functions/text.py``): token-count floor, stopword
presence, mean-token-length band, duplicate-word and duplicate-bigram
repetition caps. Every rule is a pure zero-shuffle projection over the
document scan (no UDF, no aggregation) — at 100 TB the whole filter
runs at parquet scan speed with column pruning down to (doc_id, text).

Determinism: each metric is rounded to 6 dp BEFORE the threshold
comparison on both engines, so no float low-bit can flip a verdict;
``fail_rules`` lists the failed rule names in fixed declaration order
(``concat_ws`` skips the NULLs of passing rules identically in Spark
and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_exprs, repetition_exprs

MIN_TOKENS = 15
AVG_TOK_LO = 3.0
AVG_TOK_HI = 10.0
MAX_DUP_WORD = 0.68
MAX_DUP_BIGRAM = 0.08


def _rules(q: dict[str, Column], r: dict[str, Column]) -> list[
        tuple[str, Column]]:
    """(name, passes) in fixed declaration order."""
    return [
        ("min_tokens", q["n_tokens"] >= MIN_TOKENS),
        ("stopwords", q["stopword_ratio"] > 0.0),
        ("avg_token_len",
         (q["avg_token_len"] >= AVG_TOK_LO)
         & (q["avg_token_len"] <= AVG_TOK_HI)),
        ("dup_words", r["dup_word_frac"] <= MAX_DUP_WORD),
        ("dup_bigrams", r["dup_bigram_frac"] <= MAX_DUP_BIGRAM),
    ]


def quality_filter(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_failed, fail_rules, keep): the per-doc
    filter verdict with its audit trail — which rules failed, in rule
    order, comma-joined (empty string when the doc passes)."""
    q = quality_exprs(F.col("text"))
    r = repetition_exprs(F.col("text"))
    rules = _rules(q, r)
    n_failed = None
    for _, passes in rules:
        term = F.when(passes, 0).otherwise(1)
        n_failed = term if n_failed is None else n_failed + term
    fail_rules = F.concat_ws(
        ",", *[F.when(~passes, F.lit(name)) for name, passes in rules]
    )
    return docs.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        n_failed.cast("long").alias("n_failed"),
        fail_rules.alias("fail_rules"),
        (n_failed == 0).alias("keep"),
    )
