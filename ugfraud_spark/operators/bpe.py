"""BPE vocabulary learning as DataFrame algebra.

The tokenizer-training step of a training-data platform: learn the
top-K byte-pair merges from the corpus's word-frequency table
(Sennrich et al., ACL'16 — counts over the word-freq table, not raw
text, exactly as the reference implementation trains).

Each round is pure relational algebra, so the DuckDB oracle replays
the whole training loop verbatim:

  1. adjacent-symbol pair counts, weighted by word frequency — one
     map-side-combined groupBy over the exploded pair stream;
  2. the arg-max pair under the total order (count DESC, pair ASC) —
     a TakeOrdered(1), never a global sort;
  3. the merge applied to every word's symbol sequence with ONE
     boundary-safe REPLACE (' a b ' → ' ab ' on the space-padded
     sequence).

Merge-pass semantics (documented variant): REPLACE is a single
left-to-right non-overlapping pass whose scan resumes AFTER the
matched segment, so in a CONSECUTIVE run ('x x x x' merging (x,x))
the 2nd occurrence's leading space was consumed by the 1st match and
only alternate occurrences merge that round — the remainder surfaces
in a later round if still frequent. Sennrich's greedy would merge
both; Spark's ``replace`` and DuckDB's ``REPLACE`` share OUR
semantics exactly (probed), which is what makes the training loop
cross-engine-exact. Sequences stay bijective with their words
(strip spaces = word), so no re-aggregation is needed between rounds.

Scale shape: state is the DISTINCT-WORD table (vocabulary-sized, not
corpus-sized — the corpus is touched once to build it); each round is
one groupBy + a 1-row argmax broadcast + a narrow string projection.
K merges = K sequential rounds by nature of the algorithm (each
argmax depends on all prior merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_MERGES = 8


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, cnt): the corpus word-frequency table."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    arr = F.split(F.col("seq"), " ")
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        seqs.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n"))
    )


def _train(docs: DataFrame, merges: int):
    """Run the training loop; returns (per-round merge frames, final
    word→symbol-sequence state). The state stays vocabulary-sized and
    bijective with the word table (strip spaces = word)."""
    seqs = (
        word_freqs(docs)
        .select(
            F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 "))
            .alias("seq"),
            "cnt",
        )
        .localCheckpoint(eager=True)
    )
    rounds = []
    for k in range(1, merges + 1):
        top = (
            _pair_counts(seqs)
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .select(F.lit(k).alias("round"), "pair", "n")
            .localCheckpoint(eager=True)  # pin the decision
        )
        rounds.append(top)
        merged = F.replace(F.col("pair"), F.lit(" "), F.lit(""))
        seqs = (
            seqs.crossJoin(F.broadcast(top.select("pair")))
            .select(
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                        F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                        F.concat(F.lit(" "), merged, F.lit(" ")),
                    )
                ).alias("seq"),
                "cnt",
            )
            .localCheckpoint(eager=True)
        )
    return rounds, seqs


def learn_bpe(docs: DataFrame, merges: int = BPE_MERGES) -> DataFrame:
    """(round, pair, merged, n): the learned merge table — round k's
    most frequent adjacent symbol pair (weighted by word frequency),
    its merged symbol, and its count at selection time."""
    rounds, _ = _train(docs, merges)
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionAll(r)
    return out.select(
        "round", "pair",
        F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
        "n",
    )


def token_counts(docs: DataFrame, merges: int = BPE_MERGES) -> DataFrame:
    """(doc_id, n_words, n_tokens): encode the corpus with the learned
    merges — per document, word count and BPE token count (sum of each
    word's post-merge symbol count).

    The encode path reuses training's FINAL word→sequence state as the
    vocabulary dimension (word, tokens-per-word): no per-document merge
    replay, just one corpus-sized explode joined to the vocabulary on
    ``word``. The join's build side has exactly one row per key, so
    stopword skew is probe-side only (AQE splits it); at web scale the
    vocabulary outgrows a broadcast, so the default shuffle join is the
    scale-correct shape.
    """
    _, seqs = _train(docs, merges)
    vocab = seqs.select(
        F.replace(F.col("seq"), F.lit(" "), F.lit("")).alias("word"),
        F.size(F.split(F.col("seq"), " ")).alias("wtok"),
    )
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    return (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("wtok").alias("n_tokens"),
        )
    )


def tokenizer_fertility(docs: DataFrame, merges: int = BPE_MERGES) -> DataFrame:
    """(lang, n_docs, n_words, n_tokens, fertility): per-language BPE
    fertility — tokens emitted per whitespace word — the standard
    tokenizer-equity report for a multilingual pretraining corpus (a
    vocabulary trained on the pooled corpus over-segments low-resource
    languages; this is the metric that shows it).

    All counts are exact BIGINT sums over `token_counts`; fertility is
    ONE double division (house rule: zero rounding sites). Scale shape:
    the encode join from `token_counts` plus one map-side-combined
    groupBy on lang (|langs| rows out) — the doc_id join is
    broadcast-or-shuffle per AQE, payload 3 ints/doc."""
    tc = token_counts(docs, merges)
    return (
        tc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            "lang", "n_docs", "n_words", "n_tokens",
            (F.col("n_tokens").cast("double")
             / F.col("n_words").cast("double")).alias("fertility"),
        )
    )
