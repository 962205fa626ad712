"""Deterministic epoch shuffle: a seeded global permutation of the
corpus, as a rank.

Training pipelines re-order the corpus every epoch with a seeded
pseudo-random permutation (then pack — see ``operators/packing.py``).
The permutation here is "rank of a multiplicative hash with a
SEED-DEPENDENT multiplier":

    pos(doc) = rank of (h(doc), doc_id),
    h = (doc_id · mult(seed) + seed) mod PRIOR_MOD,
    mult(seed) = PRIOR_MULT^(seed+1) mod PRIOR_MOD   (driver literal)

— pure int64 arithmetic both engines evaluate identically, with
doc_id breaking hash-collision ties so the order is total. The seed
MUST enter through the multiplier: a seed that only shifts the hash
additively (h = h0 + c mod P) rotates one fixed circular order, so
"epochs" would keep every adjacent doc pair together — the exact
correlation an epoch shuffle exists to destroy (found by review; the
cross-engine gate cannot see it because the oracle mirrors the same
hash). PRIOR_MOD is prime and mult ≢ 0, so d ↦ d·mult is a bijection
on residues and different seeds give structurally different orders
(pinned by the adjacent-pair-overlap test).

The scale bomb, same family as packing's: a global
``ROW_NUMBER() OVER (ORDER BY h)`` plans one all-corpus sort on a
single partition. Implemented instead as range-bucketed two-phase
ranking: h is uniform on [0, PRIOR_MOD), so ``floor(h·B/PRIOR_MOD)``
range-buckets the corpus evenly AND in h-order; within-bucket
row_number runs partitioned, bucket row-counts (B rows) take the only
SinglePartition window, and the exclusive bucket offsets ride a
broadcast join back. The DuckDB oracle is deliberately the naive
global ROW_NUMBER — value-identity proves the decomposition exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.tables import PRIOR_MOD, PRIOR_MULT

SHUFFLE_BUCKETS = 256


def seed_mult(seed: int) -> int:
    """The seed's hash multiplier: PRIOR_MULT^(seed+1) mod PRIOR_MOD,
    computed driver-side so both engines see one literal. Nonzero for
    every seed (PRIOR_MOD is prime, PRIOR_MULT not a multiple)."""
    return pow(PRIOR_MULT, seed + 1, PRIOR_MOD)


def epoch_shuffle(docs: DataFrame, seed: int = 1,
                  n_buckets: int = SHUFFLE_BUCKETS) -> DataFrame:
    """(doc_id, shuffle_pos): the doc's 0-based position in the seeded
    epoch permutation. Positions are a bijection onto [0, |corpus|)."""
    h = (F.col("doc_id") * F.lit(seed_mult(seed)) + F.lit(seed)) \
        % F.lit(PRIOR_MOD)
    t = docs.select(
        "doc_id",
        h.alias("h"),
    ).withColumn(
        # h·B < 2^53, so the double division is exact and floor lands
        # every h in its range bucket (contiguous in h-order)
        "bkt", F.floor((F.col("h") * n_buckets) / F.lit(PRIOR_MOD))
    )
    rn = F.row_number().over(
        Window.partitionBy("bkt").orderBy("h", "doc_id")
    )
    within = t.withColumn("rn", rn)
    counts = t.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = counts.select(
        "bkt", F.coalesce(F.sum("cnt").over(w_b), F.lit(0)).alias("boff")
    )
    return within.join(F.broadcast(boff), "bkt").select(
        "doc_id",
        (F.col("boff") + F.col("rn") - 1).cast("long").alias("shuffle_pos"),
    )
