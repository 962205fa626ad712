"""Corpus mixing: deterministic per-stratum sampling for training-data
mixture weighting ("keep all of lang A, a quarter of lang B, ...").

Beyond the reference (training-data pipeline layer, task brief): the
reference's only sampling is `semi_data` / `random_split` over users
(`Utils/helper.py`); this is the documents-table analog a pretraining
pipeline runs to hit target language/source proportions.

Mechanics: a document is kept iff its Knuth-multiplicative id hash
falls below its stratum's integer cut ``floor(rate * PRIOR_MOD)`` —
the same deterministic, shuffle-free decision rule `random_split` and
the svm_classify fit cap already use, so keep-sets are stable across
runs, engines, partitionings, and cluster sizes (no RNG, no
`sample()`), and a re-run after adding documents keeps exactly the
docs it kept before. The cuts are computed ONCE in Python and shipped
as integer literals so both the engine and the DuckDB oracle do pure
int64 arithmetic — no float rounding can diverge.

Scale: the rate table is configuration-sized and broadcast; the filter
is a narrow map over the corpus scan (predicate on id and the joined
cut — no shuffle, no window, no aggregation), so the operator runs at
scan speed on any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import PRIOR_MOD, PRIOR_MULT


def stratum_cuts(rates: dict[str, float]) -> dict[str, int]:
    """rate in [0, 1] -> integer hash cut, floored once in Python."""
    return {k: int(float(v) * PRIOR_MOD) for k, v in rates.items()}


def corpus_sample(docs: DataFrame, rates: dict[str, float],
                  default_rate: float = 1.0,
                  strat_col: str = "lang") -> DataFrame:
    """(doc_id, <strat_col>, source): the kept subset of ``docs`` under
    per-stratum keep rates (unlisted strata use ``default_rate``)."""
    spark = docs.sparkSession
    cuts = stratum_cuts(rates)
    dim = spark.createDataFrame(
        sorted(cuts.items()), f"{strat_col} string, cut long"
    )
    default_cut = int(float(default_rate) * PRIOR_MOD)
    h = F.pmod(F.col("doc_id") * F.lit(PRIOR_MULT), F.lit(PRIOR_MOD))
    return (
        docs.join(F.broadcast(dim), strat_col, "left")
        .where(h < F.coalesce("cut", F.lit(default_cut)))
        .select("doc_id", strat_col, "source")
    )


TEST_PERMILLE = 100


def grouped_split(docs: DataFrame, test_permille: int = TEST_PERMILLE,
                  group_col: str = "source") -> DataFrame:
    """(doc_id, source, split): leakage-safe train/test holdout —
    the split decision is a function of the GROUP (source domain), so
    every document from one source lands on the same side. Splitting
    i.i.d. by document leaks: near-duplicate boilerplate within a
    domain puts effectively-identical text on both sides and inflates
    held-out scores — group-aware splitting is the standard fix
    (cf. scikit-learn's GroupShuffleSplit; dedup-aware LM eval splits).

    Decision rule: the first 8 hex chars of md5(source) as an integer,
    mod 1000, < ``test_permille`` → test. md5-string math is the
    engine's one cross-engine-exact string hash (the HyperBall /
    integrity-hash trick): Spark evaluates it with one ``conv``, the
    oracle with positional nibble arithmetic — identical int64.
    Shuffle-free narrow projection; group sizes never matter because
    nothing aggregates."""
    h = F.conv(F.substring(F.md5(F.col(group_col)), 1, 8), 16, 10)
    return docs.select(
        "doc_id", group_col,
        F.when((h.cast("bigint") % 1000) < test_permille, F.lit("test"))
        .otherwise(F.lit("train")).alias("split"),
    )


SAMPLE_A = 1_103_515_245
SAMPLE_B = 747_796_405
SAMPLE_P = 2_147_483_647  # 2^31 - 1


def importance_sample(ranked: DataFrame, k_expected: float = 2000.0,
                      seed: int = 5) -> DataFrame:
    """(id, pagerank): deterministic Poisson sampling PROPORTIONAL TO
    RANK — vertex v is kept iff hash(v) < k·pr(v)·P, so inclusion
    probability is min(1, k·pr(v)) and the expected sample size is
    ~k_expected (Σpr ≈ 1). The importance-weighted corpus subset a
    quality-over-quantity pretraining mix draws (high-rank pages
    certain, tail pages proportionally), without any sort or global
    structure: ONE narrow filter over the rank frame, embarrassingly
    parallel, reproducible in (ranks, seed).

    `ranked` is (id, pagerank) with pagerank ALREADY 6dp-rounded (the
    gate's certified rank output): both engines then evaluate the
    identical double product k·pr·P against the identical integer
    hash — correctly-rounded IEEE ops on identical operands, no
    rounding site (the compare itself is exact)."""
    h = (F.col("id") * F.lit(SAMPLE_A) + F.lit(seed)) % F.lit(SAMPLE_P)
    h = (h * F.lit(SAMPLE_A) + F.lit(SAMPLE_B)) % F.lit(SAMPLE_P)
    thr = (F.lit(float(k_expected)) * F.col("pagerank")
           * F.lit(float(SAMPLE_P)))
    return ranked.where(h.cast("double") < thr).select("id", "pagerank")


# DSIR (Xie et al., *Data Selection for Language Models via Importance
# Resampling*, NeurIPS 2023): score every raw document by the
# log-likelihood ratio of a hashed-n-gram bag-of-features model of the
# TARGET distribution vs the RAW distribution, then keep the top-N.
# The paper resamples with Gumbel noise; the deterministic top-N
# variant keeps the gate replayable (same selection given same data).
DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"
DSIR_KEEP_N = 200


def dsir_weights(docs: DataFrame, target_lang: str = DSIR_TARGET_LANG,
                 n_buckets: int = DSIR_BUCKETS,
                 keep_n: int = DSIR_KEEP_N) -> DataFrame:
    """(doc_id, n_feats, log_w, selected): hashed unigram+bigram
    importance weights. Features hash through the portable md5 bucket
    (features._md5_int % n_buckets); the per-bucket log-ratio
    ln[(c_t+1)/(N_t+B)] − ln[(c_r+1)/(N_r+B)] (add-one smoothing) is
    ONE LN of an exact-int64-derived double, rounded to 6 dp, and each
    doc's log_w sums cnt·ratio as exact DECIMAL(28,6) (associative —
    partitioning-independent), so the ranking that drives selection is
    bit-stable across engines. selected = membership in the top-keep_n
    by (log_w DESC, doc_id) — a bounded TakeOrdered, never a global
    sort.

    Scale shape: one (doc, bucket) count shuffle with map-side combine
    + two O(B)-row distribution aggregates broadcast back + the top-N.
    The model state is O(B) — DSIR's entire point is that importance
    estimation stays a bag-of-hashed-counts problem at any corpus
    size."""
    from .features import _md5_int

    toks = F.split("text", " ")
    bi_arr = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select("doc_id", "lang", toks.alias("t"), bi_arr.alias("b"))
    feats = (
        base.select("doc_id", "lang", F.explode("t").alias("f"))
        .unionAll(base.select("doc_id", "lang", F.explode("b").alias("f")))
        .select("doc_id", "lang",
                (_md5_int(F.col("f")) % F.lit(n_buckets)).alias("bucket"))
    ).localCheckpoint(eager=True)  # feeds 4 aggregates

    cnts = feats.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("cnt"))
    ct = (feats.where(F.col("lang") == target_lang)
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t")))
    cr = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_r"))
    nt = (feats.where(F.col("lang") == target_lang)
          .agg(F.count(F.lit(1)).cast("double").alias("n_t")))
    nr = feats.agg(F.count(F.lit(1)).cast("double").alias("n_r"))

    spark = docs.sparkSession
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    B = float(n_buckets)
    lr = (
        buckets.join(ct, "bucket", "left").join(cr, "bucket", "left")
        .crossJoin(F.broadcast(nt)).crossJoin(F.broadcast(nr))
        .select(
            "bucket",
            F.round(F.log(
                ((F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast("double")
                 * (F.col("n_r") + F.lit(B)))
                / ((F.coalesce(F.col("c_r"), F.lit(0)) + 1).cast("double")
                   * (F.col("n_t") + F.lit(B)))
            ), 6).alias("lr"),
        )
    )
    w = (
        cnts.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            F.round(
                F.sum(F.round(F.col("cnt") * F.col("lr"), 6)
                      .cast("decimal(28,6)")).cast("double"), 6
            ).alias("log_w"),
        )
    )
    sel = (w.orderBy(F.desc("log_w"), F.asc("doc_id")).limit(keep_n)
           .select("doc_id", F.lit(1).alias("is_sel")))
    return (
        w.join(sel, "doc_id", "left")
        .select("doc_id", "n_feats", "log_w",
                F.coalesce(F.col("is_sel"), F.lit(0)).cast("long")
                .alias("selected"))
    )


# Efraimidis-Spirakis weighted sampling without replacement (*Weighted
# random sampling with a reservoir*, IPL 2006): give item i the key
# u_i^(1/w_i) with u_i uniform — the k largest keys are an EXACT-size
# weighted sample without replacement, computable as a top-k with no
# coordination (importance_sample's Poisson filter above only controls
# the EXPECTED size; this is the fixed-budget variant a curriculum
# sampler wants). Deterministic here: u_i derives from the md5 hash.
ES_SAMPLE_K = 100


def weighted_sample(docs: DataFrame, k: int = ES_SAMPLE_K) -> DataFrame:
    """(doc_id, w, key, sampled): ES keys over the documents table
    with w = n_chars (any positive weight column works), sampled = 1
    for the k largest (key DESC, doc_id ASC) — a bounded TakeOrdered,
    never a global sort. Keys are ln(u)/w (the log-domain ES variant
    — monotone in u^(1/w), overflow-free), u = (md5_low32+1)/2^32 ∈
    (0,1], rounded to 6 dp with the doc_id tie-break making the k-cut
    a total order."""
    from .features import _md5_int

    h = _md5_int(F.col("doc_id").cast("string"))
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 32))
    key = F.round(F.log(u) / F.col("n_chars").cast("double"), 6)
    scored = docs.select("doc_id", F.col("n_chars").alias("w"),
                         key.alias("key"))
    top = (scored.orderBy(F.desc("key"), F.asc("doc_id")).limit(k)
           .select("doc_id", F.lit(1).alias("is_s")))
    return (
        scored.join(top, "doc_id", "left")
        .select("doc_id", "w", "key",
                F.coalesce(F.col("is_s"), F.lit(0)).cast("long")
                .alias("sampled"))
    )
