"""Count–min sketch: sublinear frequency estimation and heavy hitters.

The reference's eval/stat layer counts exact frequencies with full
group-bys (UGFraud Utils/eval_helper.py histogram paths); at 100 TB a
full per-key count of a high-cardinality stream is itself a giant
shuffle whose OUTPUT doesn't fit anywhere useful. The count–min sketch
(Cormode & Muthukrishnan 2005) replaces it with a fixed d×w counter
grid: every occurrence of key x increments d buckets h_r(x); the
estimate is the MIN over the d buckets, which never under-counts and
over-counts by ≤ εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Distributed shape — why this scales where exact counting doesn't:
- The sketch is ADDITIVE: sketch(A ⊎ B) = sketch(A) + sketch(B)
  elementwise, so map-side partial sketches combine associatively
  through one tiny (d·w)-key shuffle, independent of input size or key
  cardinality (test pins the merge identity on a real split).
- In batch we pre-aggregate per key first (map-side combine on the
  key shuffle Spark would do anyway), then burst each distinct key
  into its d (row, bucket) cells; a one-pass streaming build would
  burst per occurrence instead — same grid either way.
- The estimate join broadcasts the d×w grid (a few KB) back against
  the distinct keys; nothing wide ever sits on the driver.

Hashes are the house scramble (walks.py constants) with a PER-ROW
multiplier a_r = ((r+1)·C + B) mod P: h_r(x) = ((x mod P)·a_r + r·B
+ salt) mod P, scrambled once more, mod w. The per-row multiplier is
load-bearing for row independence: with one shared multiplier the
difference (x−y)·A² mod P is IDENTICAL in every row, so a pair that
collides in one row tends to collide in all d — measured max error
252 vs 20 on the same zipf input after the fix (the min-over-rows
defense only works if the rows fail independently). The second
scramble round stays load-bearing too (walks.py: bare linear mod
clusters catastrophically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .walks import WALK_A, WALK_B, WALK_C, WALK_P

CMS_SALT = 17


def _bucket(key, r, w: int):
    a_r = ((r + F.lit(1)) * F.lit(WALK_C) + F.lit(WALK_B)) % F.lit(WALK_P)
    h = ((key % F.lit(WALK_P)) * a_r + r * F.lit(WALK_B)
         + F.lit(CMS_SALT)) % F.lit(WALK_P)
    h = (h * F.lit(WALK_A) + F.lit(WALK_B)) % F.lit(WALK_P)
    return (h % F.lit(w)).alias("bucket")


def cms_sketch(keys: DataFrame, d: int = 4, w: int = 64) -> DataFrame:
    """keys(key: long), one row per occurrence → the d×w counter grid
    (r, bucket, cnt). Batch build: exact per-key counts ride the
    key-partitioned shuffle's map-side combine, then each distinct key
    bursts into d cells and the grid reduces on (r, bucket) — the
    second shuffle has at most d·w keys no matter the input."""
    cnt = keys.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
    cells = cnt.select(
        "key", "cnt",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.lit(d - 1).cast("long"))).alias("r"),
    ).select("cnt", "r", _bucket(F.col("key"), F.col("r"), w))
    return cells.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimates(keys: DataFrame, d: int = 4, w: int = 64) -> DataFrame:
    """(key, est, true_cnt) for every distinct key: est = min over the
    d rows of the key's bucket counters. est ≥ true_cnt always (each
    bucket holds the key's own count plus non-negative collision
    mass). true_cnt is carried for error accounting; at true scale
    you'd drop it — the sketch exists so you don't have to count."""
    cnt = keys.groupBy("key").agg(F.count(F.lit(1)).alias("true_cnt"))
    sketch = cms_sketch(keys, d=d, w=w)
    probes = cnt.select(
        "key", "true_cnt",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.lit(d - 1).cast("long"))).alias("r"),
    ).select("key", "true_cnt", "r",
             _bucket(F.col("key"), F.col("r"), w))
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("key", "true_cnt")
        .agg(F.min("cnt").alias("est"))
        .select("key", "est", "true_cnt")
    )


def cms_heavy_hitters(keys: DataFrame, d: int = 4, w: int = 64,
                      k: int = 20) -> DataFrame:
    """Top-``k`` keys by sketch estimate (ties broken by key asc —
    (est, key) is a total order, so the cut is deterministic). The
    orderBy+limit runs as TakeOrdered: per-partition heaps plus a
    k-row driver merge, never a global sort."""
    return (
        cms_estimates(keys, d=d, w=w)
        .orderBy(F.desc("est"), F.asc("key"))
        .limit(k)
    )


# capture-recapture (Lincoln-Petersen; Bharat-Broder's web-index-size
# estimation, WWW 1998): estimate the size of a population you can
# only sample — two independent uniform hash samples, N̂ = |A|·|B| /
# |A∩B|. At web scale this is how index/corpus sizes are measured
# WITHOUT a full distinct-count: each sample is a narrow hash-range
# filter (the "capture"), and the intersection is a sample-sized join.
CR_SAMPLE_PERMILLE = 300  # 30% capture probability per sample
CR_HASH_SPACE = 1 << 32


def capture_recapture(docs: DataFrame,
                      permille: int = CR_SAMPLE_PERMILLE) -> DataFrame:
    """(n_a, n_b, n_both, n_true, n_hat, rel_err): Lincoln-Petersen
    estimate of the corpus's distinct-CONTENT size from two
    independent md5-range samples of the text-fingerprint universe,
    alongside the exact truth the estimator is judged against.

    Samples are keyed on the distinct text md5 (content units, not
    pages — mirrors dedup_exact's universe): capture A = fingerprints
    whose hash falls in the low ``permille``/1000 of 2³², capture B
    the same under an independent ('#2'-salted) hash. Everything is
    exact integer arithmetic until the final N̂ division (single IEEE
    op) and 6dp rounds; rel_err is computed FROM the rounded N̂.

    Scale shape: two narrow filters + three 1-row counts + one
    sample×sample semi join — the corpus is scanned once for
    fingerprints and never again; that asymmetry (estimate from
    samples, never count the universe) is the entire point of the
    estimator."""
    cut = (CR_HASH_SPACE * permille) // 1000
    fp = docs.select(F.md5("text").alias("fp")).distinct()
    h1 = F.conv(F.substring(F.md5(F.col("fp")), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(F.concat(F.col("fp"), F.lit("#2"))),
                            1, 8), 16, 10).cast("long")
    marked = fp.select(
        "fp", (h1 < cut).alias("in_a"), (h2 < cut).alias("in_b"))
    agg = marked.agg(
        F.sum(F.col("in_a").cast("long")).alias("n_a"),
        F.sum(F.col("in_b").cast("long")).alias("n_b"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).alias("n_both"),
        F.count(F.lit(1)).alias("n_true"),
    )
    return agg.select(
        "n_a", "n_b", "n_both", "n_true",
        F.round(F.col("n_a").cast("double") * F.col("n_b").cast("double")
                / F.col("n_both").cast("double"), 6).alias("n_hat"),
    ).select(
        "*",
        F.round(F.abs(F.col("n_hat") - F.col("n_true").cast("double"))
                / F.col("n_true").cast("double"), 6).alias("rel_err"),
    )


# HyperLogLog with EXPLICIT registers (Flajolet-Fuchs-Gandouet-Meunier
# 2007): the sketch is a 64-row (bucket, max-rho) frame — built by one
# map-side-combined groupBy-max, mergeable across partitions/epochs by
# the same max, which is the entire reason HLL is the distinct-counter
# of choice for 10^12-key streams. approx_distinct_stream gates
# Spark's built-in; this op gates the algorithm itself, register by
# register, against DuckDB.
HLL_M = 64  # 2^6 registers; low 6 hash bits pick the bucket
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)  # the paper's alpha_m


def hll_distinct(keys: DataFrame, key_col: str, m: int = HLL_M
                 ) -> DataFrame:
    """keys → 1 row (m_registers, v_zero, est, n_true, rel_err):
    HyperLogLog estimate with the exact truth alongside.

    bucket = low-6 md5 bits; rho = leading-zero count of the remaining
    26-bit word + 1, computed EXACTLY as 27 − len(bin(w)) (no float
    log); 2^−register is the exact dyadic 1/(1<<reg). The paper's
    small-range correction applies verbatim: if E ≤ 2.5m and empty
    registers exist, linear counting m·ln(m/V) replaces the raw
    harmonic estimate. One LN/division at the end, ROUND 6, rel_err
    FROM the rounded estimate. n_true is computed for the gate's
    verdict only — production reads the 64-row sketch, never the
    universe."""
    k = keys.select(F.col(key_col).alias("k")).distinct()
    h = F.conv(F.substring(F.md5(F.col("k")), 1, 8), 16, 10).cast("long")
    hashed = k.select(
        (h % m).alias("bucket"),
        F.floor(h / m).cast("long").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(27)).otherwise(
        F.lit(27) - F.length(F.bin(F.col("w"))))
    regs = hashed.select("bucket", rho.alias("rho")) \
        .groupBy("bucket").agg(F.max("rho").alias("reg"))
    spark = keys.sparkSession
    full = (
        spark.range(m).select(F.col("id").alias("bucket"))
        .join(regs, "bucket", "left")
        .select(F.coalesce(F.col("reg"), F.lit(0)).alias("reg"))
    )
    agg = full.agg(
        F.sum(F.lit(1.0)
              / F.expr("shiftleft(CAST(1 AS BIGINT), CAST(reg AS INT))")
              .cast("double")).alias("ssum"),
        F.sum((F.col("reg") == 0).cast("long")).alias("v_zero"),
    )
    truth = k.agg(F.count(F.lit(1)).alias("n_true"))
    raw = F.lit(float(HLL_ALPHA)) * F.lit(float(m * m)) / F.col("ssum")
    est = F.round(
        F.when((raw <= F.lit(2.5 * m)) & (F.col("v_zero") > 0),
               F.lit(float(m)) * F.log(F.lit(float(m))
                                       / F.col("v_zero").cast("double")))
        .otherwise(raw), 6)
    return (
        agg.crossJoin(F.broadcast(truth))
        .select(
            F.lit(m).cast("long").alias("m_registers"),
            "v_zero", est.alias("est"), "n_true",
        )
        .select(
            "*",
            F.round(F.abs(F.col("est") - F.col("n_true").cast("double"))
                    / F.col("n_true").cast("double"), 6).alias("rel_err"),
        )
    )


def hll_demo(docs: DataFrame) -> DataFrame:
    """Two universes through the same register pipeline, exercising
    BOTH estimator branches: the trigram-shingle vocabulary (≫ 2.5m —
    raw harmonic path) and the language set (5 keys — linear-counting
    path). Output: (universe, m_registers, v_zero, est, n_true,
    rel_err)."""
    from .dedup import shingles

    big = hll_distinct(shingles(docs), "sh").select(
        F.lit("shingles").alias("universe"), "*")
    small = hll_distinct(docs.select("lang"), "lang").select(
        F.lit("langs").alias("universe"), "*")
    return big.unionAll(small)
