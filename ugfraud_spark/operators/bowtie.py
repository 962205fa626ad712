"""Bow-tie decomposition of the directed link graph (Broder et al.,
WWW'00 — the canonical macro-structure picture of the web).

Regions relative to the CORE = the strongly connected component of a
deterministic pivot (the minimum vertex id — on a real crawl, a known
core host): F = vertices forward-reachable from the pivot, B =
backward-reachable; then

    SCC = F ∩ B,  OUT = F \\ B,  IN = B \\ F,  OTHER = neither
    (tendrils + disconnected components, unrefined).

Exact full SCC decomposition is a recursion depth the superstep model
can't bound (see COVERAGE W2 for the impossibility-honesty pattern);
the bow-tie relative to one pivot needs exactly TWO fixed-round BFS
sweeps — the web-scale trade Broder's original measurement made too
(their SCC/IN/OUT numbers come from BFS out of sampled pivots).

Fixed ``iters`` rounds on both sweeps (oracle-parity mode, the
cc_minprop pattern): regions are exact once iters ≥ the directed
graph's effective reach depth from/to the pivot; the DuckDB oracle
unrolls the identical recurrence either way. Each sweep is the
frontier-delta BFS kernel (one state-side shuffle per round over the
colocated edge cache); the classification is two vertex-keyed left
joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import vertices_of
from .bfs import bfs_hops

BOWTIE_ITERS = 10


def bowtie(edges_dir: DataFrame, iters: int = BOWTIE_ITERS) -> DataFrame:
    """(id, region): region ∈ {'SCC','IN','OUT','OTHER'} relative to
    the min-id pivot's strongly connected component."""
    e = edges_dir.select("src", "dst")
    verts = vertices_of(e)
    pivot = verts.agg(F.min("id").alias("id"))
    fwd = bfs_hops(e, pivot, iters=iters).select(
        "id", F.lit(1).alias("f"))
    bwd = bfs_hops(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        pivot, iters=iters,
    ).select("id", F.lit(1).alias("b"))
    region = (
        F.when(F.col("f").isNotNull() & F.col("b").isNotNull(), "SCC")
        .when(F.col("f").isNotNull(), "OUT")
        .when(F.col("b").isNotNull(), "IN")
        .otherwise("OTHER")
    )
    return (
        verts.join(fwd, "id", "left")
        .join(bwd, "id", "left")
        .select("id", region.alias("region"))
    )
