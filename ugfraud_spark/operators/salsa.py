"""SALSA hubs & authorities (Lempel & Moran, WWW'00) — the random-walk
counterpart of HITS.

Not in the reference (UGFraud's spectral family plays the analogous
role — see ``operators/hits.py``); included because the north rule's
deliverable is a general link-graph engine over web pages, and SALSA is
the link-analysis kernel production web search actually shipped (e.g.
as a query-time neighborhood ranker): it resists the tightly-knit-
community (TKC) effect that makes HITS score a dense spam farm above a
genuinely endorsed page.

Authority chain: a two-step random walk that from authority ``v`` steps
*backward* along a uniformly-chosen in-link to a hub, then *forward*
along a uniformly-chosen out-link to the next authority:

    hm_{t}(u) = Σ_{(u,v)∈E} a_t(v) / ind(v)
    a_{t+1}(w) = Σ_{(u,w)∈E} hm_t(u) / outd(u)

and the hub chain is its mirror (forward first, then backward). Both
are stochastic, so **L1 mass is preserved exactly and no per-half-step
normalization exists** — unlike HITS there is zero scalar aggregation
inside the loop; each iteration is four co-partitioned SpMV joins and
nothing else (the known closed form — within one connected bipartite
support component the stationary authority weight is proportional to
in-degree — is pinned as a property test).

Plan shape at scale: the edge frames are hash-partitioned once on the
message-join key (``colocate_edges``) and every per-iteration join
probes that cached layout; state frames are |V|-sized and
localCheckpoint'ed per round to keep lineage flat. No collect, no
driver loop over data — iteration count is a fixed hyperparameter the
DuckDB oracle unrolls step-for-step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .superstep import colocate_edges


def salsa(edges: DataFrame, iters: int = 5) -> DataFrame:
    """edges(src, dst) directed → (id, hub, authority).

    Authority/hub scores are each a probability distribution over the
    vertices with in-/out-degree > 0 (L1 = 1); vertices outside a
    side's support get exactly 0.0 for that side.
    """
    fwd = colocate_edges(edges.select("src", "dst"))
    rev = colocate_edges(edges.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))

    # per-vertex degree dims double as the two sides' support sets
    ind = (rev.groupBy(F.col("src").alias("id"))
           .agg(F.count(F.lit(1)).alias("ind")).persist())
    outd = (fwd.groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("outd")).persist())
    verts = (
        fwd.select(F.col("src").alias("id"))
        .unionAll(fwd.select(F.col("dst").alias("id")))
        .distinct()
        .repartition("id")
        .persist()
    )
    verts.count()

    def _step(edge_df: DataFrame, state: DataFrame, deg: DataFrame,
              deg_col: str) -> DataFrame:
        # one SpMV half-step: divide state by its side's degree, push
        # along edge_df, sum per destination. The degree join is
        # |support|-sized and co-partitioned on id.
        x = (
            state.join(deg, "id")
            .select(F.col("id").alias("src"),
                    (F.col("x") / F.col(deg_col)).alias("x"))
        )
        return (
            edge_df.join(x.hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("x"))
        )

    # uniform init over each side's support; the 1-row count frames ride
    # along as crossJoins so the init stays lazy (no driver collect)
    na = ind.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    nh = outd.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    auth = ind.crossJoin(na).select("id", (F.lit(1.0) / F.col("_n")).alias("x"))
    hub = outd.crossJoin(nh).select("id", (F.lit(1.0) / F.col("_n")).alias("x"))

    for _ in range(iters):
        # authority chain: backward (÷ind) then forward (÷outd)
        auth = _step(fwd, _step(rev, auth, ind, "ind"), outd, "outd")
        # hub chain: forward (÷outd) then backward (÷ind)
        hub = _step(rev, _step(fwd, hub, outd, "outd"), ind, "ind")
        # flat lineage; eager so the old state's plan is dropped now
        auth = auth.localCheckpoint(eager=True)
        hub = hub.localCheckpoint(eager=True)

    out = (
        verts.join(hub.withColumnRenamed("x", "hub"), "id", "left")
        .join(auth.withColumnRenamed("x", "authority"), "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("authority", F.lit(0.0)).alias("authority"),
        )
    )
    ind.unpersist()
    outd.unpersist()
    return out
