"""Synchronous label propagation with deterministic tie-breaking.

Kernel (mirrored by ``oracle.sql_lpa``): each round, every vertex adopts
the most frequent label among its neighbors; ties break to the smallest
label; isolated vertices keep their own. Deterministic by construction
(no hash-order dependence), unlike classic asynchronous LPA.

Physical plan per round: join sym-edges⋈labels on src (1 shuffle unless
labels broadcast), count per (dst, lbl) with map-side partials, then a
per-dst argmax via ``max_by``-style struct-max — an aggregation, not a
window, so no per-group sort at scale. The winner aggregation covers
EVERY vertex (``verts`` are endpoints of the symmetrized edge set, so
each appears as a dst and receives ≥1 message): the next state IS the
winner frame — no per-round join back to the previous state, which
would add a |V|-row shuffle per round for a fallback that never fires.
Isolated vertices cannot occur here by construction; a caller with
degree-0 vertices must seed them separately (they keep their own label
forever regardless).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .superstep import colocate_edges, iterate


def lpa(edges_ab: DataFrame, iters: int = 4) -> DataFrame:
    sym = colocate_edges(
        edges_ab.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
            edges_ab.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
    )
    verts = sym.select(F.col("src").alias("id")).distinct()
    state0 = verts.withColumn("lbl", F.col("id"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        counts = (
            sym.join(
                state.select(F.col("id").alias("src"), "lbl").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("id"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # argmax by (c desc, lbl asc) == max of struct(c, -lbl); every
        # vertex gets >=1 message (symmetrized edges), so this IS the
        # full next state — no join back to `state` needed
        return counts.groupBy("id").agg(
            F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))).alias("w")
        ).select("id", (-F.col("w.neg")).alias("lbl"))

    res = iterate(state0, step, max_iter=iters, checkpoint_every=1)
    return res.state.select("id", F.col("lbl").alias("label"))
