"""Text-analysis column expressions for the training-data pipeline:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All built-in-function compositions (JVM, codegen) with
exact DuckDB mirrors — no UDFs.

Cross-engine discipline: token counts use length/replace arithmetic
(identical semantics in Spark and DuckDB; regex engines differ, so no
regexp in checked paths), fingerprints use a polynomial rolling hash
over rpad-fixed prefixes (ascii() identical both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_LEN = 32  # fingerprint prefix length
FP_BASE = 31
FP_MOD = 1_000_000_007

LANG_MARKERS: dict[str, list[str]] = {
    # marker tokens scored by occurrence count; deterministic argmax
    "en": ["the", "join", "query"],
    "de": ["der", "und", "gross"],
    "es": ["el", "la", "datos"],
    "fr": ["le", "donnees", "avec"],
    "zh": ["shuju", "biao", "hang"],
}

STOPWORDS = ["the", "a", "of", "and"]


def occurrences(text: Column, marker: str) -> Column:
    """# of (possibly overlapping-free) occurrences of ``marker`` via
    length/replace arithmetic — identical in Spark and DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("long")


def token_count(text: Column) -> Column:
    """Whitespace token count: #spaces + 1 (documents are single-space
    separated; mirrors ``len(line.split())`` for that shape)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    ).cast("long")


def word_occurrences(text: Column, word: str) -> Column:
    """Count of the exact token: pad the text with spaces and count
    ' word ' substrings (no regex)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return occurrences(padded, f" {word} ")


def quality_exprs(text: Column) -> dict[str, Column]:
    n_chars = F.length(text).cast("long")
    n_tok = token_count(text)
    stop = None
    for w in STOPWORDS:
        o = word_occurrences(text, w)
        stop = o if stop is None else stop + o
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "avg_token_len": F.round(
            (n_chars - (n_tok - 1)) / n_tok.cast("double"), 6
        ),
        "stopword_ratio": F.round(stop / n_tok.cast("double"), 6),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        lang: sum(word_occurrences(text, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(text: Column) -> Column:
    """argmax lang score, ties → lexicographically smallest lang (the
    n-gram-heuristic language-ID operator; deterministic). Expressed as
    greatest + first-match CASE so the SQL mirror is verbatim."""
    scores = lang_scores(text)
    mx = F.greatest(*scores.values())
    expr = None
    for lang in sorted(scores):
        cond = scores[lang] == mx
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(
            cond, F.lit(lang)
        )
    return expr


def repetition_exprs(text: Column) -> dict[str, Column]:
    """Gopher/C4-style repetition metrics — duplicate-word fraction,
    top-word fraction, duplicate-bigram fraction — as PURE array
    expressions (split → array_distinct / zip_with / sorted-run
    aggregate): zero shuffle, zero UDF, scan-speed at any corpus size.
    The top-word count is the longest run in the sorted token array
    (``F.aggregate`` with a (prev, run, best) struct fold), so no
    explode + groupBy is needed on the engine side; the DuckDB mirror
    computes the same number by unnest + group-by max — independent
    algorithms, equal results."""
    arr = F.split(text, " ")
    n = F.size(arr)
    nd = n.cast("double")
    bigrams = F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    srt = F.array_sort(arr)
    run_next = lambda acc, x: F.when(  # noqa: E731
        x == acc["prev"], acc["run"] + 1
    ).otherwise(F.lit(1))
    best = F.aggregate(
        srt,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_next(acc, x).alias("run"),
            F.greatest(acc["best"], run_next(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return {
        "n_tokens": n.cast("long"),
        "dup_word_frac": F.round(
            F.lit(1.0) - F.size(F.array_distinct(arr)) / nd, 6
        ),
        "top_word_frac": F.round(best / nd, 6),
        "dup_bigram_frac": F.when(
            n > 1,
            F.round(
                F.lit(1.0) - F.size(F.array_distinct(bigrams)) / (nd - 1.0), 6
            ),
        ).otherwise(F.lit(0.0)),
    }


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash of the first FP_LEN chars (space-padded):
    Σ ascii(c_i)·31^i mod 1e9+7 — the document-fingerprint operator."""
    padded = F.rpad(text, FP_LEN, " ")
    total = F.lit(0).cast("long")
    p = 1
    for i in range(1, FP_LEN + 1):
        total = total + F.ascii(F.substring(padded, i, 1)).cast("long") * F.lit(p)
        p = (p * FP_BASE) % FP_MOD
    return (total % FP_MOD).alias("fingerprint")


# ---------------------------------------------------------- SQL mirrors

def sql_occurrences(text: str, marker: str) -> str:
    m = marker.replace("'", "''")
    return (
        f"CAST((LENGTH({text}) - LENGTH(REPLACE({text}, '{m}', ''))) "
        f"/ {len(marker)} AS BIGINT)"
    )


def sql_token_count(text: str) -> str:
    return (
        f"CAST(LENGTH({text}) - LENGTH(REPLACE({text}, ' ', '')) + 1 AS BIGINT)"
    )


def sql_word_occurrences(text: str, word: str) -> str:
    return sql_occurrences(f"(' ' || {text} || ' ')", f" {word} ")


def sql_fingerprint(text: str) -> str:
    terms = []
    p = 1
    for i in range(1, FP_LEN + 1):
        terms.append(
            f"CAST(ASCII(SUBSTRING(RPAD({text}, {FP_LEN}, ' '), {i}, 1)) "
            f"AS BIGINT) * {p}"
        )
        p = (p * FP_BASE) % FP_MOD
    return f"(({' + '.join(terms)}) % {FP_MOD})"
