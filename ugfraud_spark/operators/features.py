"""Feature engineering for model training: the hashing trick and
embedding quantization.

The reference's feature paths materialize explicit id↔index
dictionaries before building matrices (UGFraud Utils/helper.py
listToSparseMatrix and the SVD pipeline's id↔index dims); at 100 TB a
term dictionary is itself a giant build artifact and a mandatory extra
join on every use. Feature hashing (Weinberger et al. 2009) deletes
it: dim(term) = H(term) mod d with a signed correction bit, so the
featurizer is a stateless per-row map — no vocabulary shuffle, no
dictionary broadcast, new terms at inference time just work.

Cross-engine hash: H = first 8 hex chars of md5(term) as an integer —
md5 is bit-identical everywhere, the oracle parses the same slice with
('0x'||hex)::BIGINT. At production scale you'd swap in xxhash64 for
throughput; md5 is the replayable default the gate can check (and
what the reference itself uses for integrity hashes — get_hash,
Utils/helper.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_DIMS = 32


def _md5_int(col):
    """First 32 bits of md5 as a non-negative long, identically
    computable in DuckDB as ('0x' || substr(md5(x), 1, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hashed_features(docs: DataFrame, d: int = HASH_DIMS) -> DataFrame:
    """docs(doc_id, text) → sparse signed-hash vectors (doc_id, dim,
    val): val = Σ_{term: H(term) mod d = dim} sign(term)·tf, with
    sign(term) = ±1 from an independent bit of the same hash (bit 8 —
    disjoint from the low ⌈log2 d⌉ dim bits). The sign makes collision
    noise zero-mean, so hashed inner products are unbiased estimates
    of the true ones (the property test checks a planted collision
    cancels). Zero-sum cells are dropped — the output is the sparse
    vector, not the dense grid.

    Scale shape: one (doc_id, term) shuffle with map-side combine,
    one (doc_id, dim) shuffle — and NOTHING else. No document-
    frequency join, no vocabulary broadcast, no driver state: the
    whole featurizer is two partial-aggregated groupBys, which is the
    reason this beats dictionary features at 100 TB."""
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = _md5_int(F.col("term"))
    signed = tf.select(
        "doc_id",
        (h % F.lit(d)).alias("dim"),
        F.when(F.shiftright(h, 8) % 2 == 0, F.col("tf"))
        .otherwise(-F.col("tf")).alias("sval"),
    )
    return (
        signed.groupBy("doc_id", "dim")
        .agg(F.sum("sval").alias("val"))
        .where(F.col("val") != 0)
    )


def quantize_embeddings(embs: DataFrame, bits: int = 8) -> DataFrame:
    """embs(vec_id, embedding: array<float>) → (vec_id, dim, code,
    dequant): per-DIMENSION min/max scalar quantization to 2^bits
    levels — code = round((x−lo)·(2^bits−1)/(hi−lo)), dequant = the
    reconstructed double — the standard 4× shrink (float32→int8)
    applied to an ANN corpus before sharding it to serving nodes.

    Determinism: every arithmetic step is a single IEEE-exact double
    op (float→double widening is exact; one subtraction, one multiply,
    one division, FLOOR(x+0.5) for half-up rounding — Spark's
    ROUND/DuckDB's ROUND disagree on ties, FLOOR doesn't), so codes
    are bit-identical across engines and partitionings. Constant
    dimensions (hi = lo) quantize to code 0 and dequant lo exactly.

    Scale shape: posexplode → one groupBy(dim) for the 64-row range
    frame (map-side combined) → broadcast join back. The ranges frame
    is O(dims) regardless of corpus size; nothing global but it. The
    dequant column is carried so the gate pins reconstruction, not
    just codes; serving would store (code, lo, hi) only."""
    levels = (1 << bits) - 1
    flat = embs.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    ranges = flat.groupBy("dim").agg(F.min("x").alias("lo"),
                                     F.max("x").alias("hi"))
    q = flat.join(F.broadcast(ranges), "dim")
    code = F.when(
        F.col("hi") == F.col("lo"), F.lit(0).cast("long")
    ).otherwise(
        F.floor((F.col("x") - F.col("lo")) * F.lit(float(levels))
                / (F.col("hi") - F.col("lo")) + F.lit(0.5))
    )
    q = q.select("vec_id", "dim", code.alias("code"), "lo", "hi")
    dequant = (F.col("lo") + F.col("code")
               * (F.col("hi") - F.col("lo")) / F.lit(float(levels)))
    return q.select(
        "vec_id", "dim", "code",
        F.round(dequant, 6).alias("dequant"),
    )


def quantile_transform(docs: DataFrame, value_col: str = "n_chars"
                       ) -> DataFrame:
    """(doc_id, v, cdf): each document's value mapped to its midrank
    empirical CDF position, cdf = (#{v' < v} + ½·#{v = v}) / N — the
    rank-normalization (sklearn's QuantileTransformer with the
    midrank convention) that makes downstream thresholds
    distribution-free. Ties share one CDF value by construction, so
    the map is a pure function of the value — deterministic and
    engine-exact.

    Scale shape: ONE value-frequency groupBy, a prefix sum over the
    DISTINCT-VALUE totals only (value cardinality, not corpus rows —
    the packing.py bounded-window pattern; continuous signals are
    6dp-quantized by the house rounding before they reach this op,
    which bounds the cardinality), and a value-keyed join back. One
    double division, ROUND 6."""
    from pyspark.sql import Window

    freq = (
        docs.groupBy(F.col(value_col).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cdf = (
        freq.select(
            "v", "cnt",
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("below"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "v",
            F.round(
                (F.col("below").cast("double")
                 + F.lit(0.5) * F.col("cnt").cast("double"))
                / F.col("n").cast("double"), 6).alias("cdf"),
        )
    )
    return docs.select("doc_id", F.col(value_col).alias("v")) \
        .join(cdf, "v").select("doc_id", "v", "cdf")
