"""CSR-like adjacency blocks with explicit hub salting + block SpMV.

This is the north_star's physical layout for the iterative kernels:
edges are stored as hash-partitioned CSR-like adjacency blocks (grouped
struct arrays), hub vertices are salted/split across blocks, and each
superstep is a partition-local SpMV (Arrow-vectorized numpy over one
block) followed by a shuffle-reduce of the partial messages
(``groupBy(dst).sum`` with map-side combine).

Why blocks beat the plain join at 100 TB: the per-superstep
``edges ⋈ state`` shuffle re-hashes the full *edge* table every
iteration. Blocks shuffle the edges ONCE at build time; every superstep
then moves only the (|V|-sized) state into the (pre-partitioned) blocks
and the (≤|V|·fanout partial-aggregated) messages out — the 100 TB edge
payload never crosses the wire again. Salting bounds the largest block:
a Zipfian hub whose out-edges would otherwise land in one task is split
into ``ceil(out_deg / hub_cap)`` salt groups, its state value is
replicated to each (the classic two-level partial/final aggregation made
explicit across the join, reference-free skew handling the reference
never needed at 38k nodes).

Reference parity: the blocks are exactly the reference's adjacency dicts
``{u_id: [(p_id, …)]}`` (``/root/reference/UGFraud/Utils/helper.py:132-167``)
in columnar, partitioned form; `spmv` is its per-node neighbor loop
(``GANG.py:128``, ``ZooBP.py:144``) as one vectorized kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOCK_SCHEMA = (
    "block_id int, srcs array<long>, dsts array<long>, weights array<double>"
)


@dataclass
class AdjacencyBlocks:
    """blocks(block_id, srcs, dsts, weights) — parallel arrays sorted by
    (src, dst) inside each block; routes(id, block_id) — the distinct
    (salted) block memberships of every src vertex."""

    blocks: DataFrame
    routes: DataFrame
    n_blocks: int


def build_adjacency_blocks(
    edges: DataFrame, n_blocks: int = 32, hub_cap: int = 100_000
) -> AdjacencyBlocks:
    """One-time layout shuffle: edges(src, dst[, weight]) → CSR blocks.

    ``salt = pmod(xxhash64(dst), ceil(out_deg(src)/hub_cap))`` splits a
    hub's edge list deterministically; ``block_id = pmod(xxhash64(src,
    salt), n_blocks)`` scatters the splits. The packed blocks are
    repartitioned on block_id and pinned with ``persist()`` (NOT
    localCheckpoint — an ExistingRDD scan reports UnknownPartitioning
    and the per-superstep cogroup would re-Exchange the |E|-sized block
    payload every iteration, exactly the movement this layout exists to
    avoid; InMemoryRelation keeps the HashPartitioning visible so
    EnsureRequirements elides the block-side exchange, same mechanism as
    ``superstep.colocate_edges``). ``routes`` is joined on id each
    superstep and re-keyed to block_id regardless, so checkpointing it
    is fine.
    """
    w = (
        edges.select("src", "dst", "weight")
        if "weight" in edges.columns
        else edges.select("src", "dst", F.lit(1.0).alias("weight"))
    )
    deg = w.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    salted = (
        w.join(deg, "src")
        .withColumn(
            "_salt",
            F.pmod(
                F.xxhash64("dst"), F.ceil(F.col("_deg") / F.lit(hub_cap))
            ).cast("int"),
        )
        .withColumn(
            "block_id", F.pmod(F.xxhash64("src", "_salt"), F.lit(n_blocks)).cast("int")
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["src", "dst"], kind="mergesort")
        return pd.DataFrame(
            {
                "block_id": [int(pdf["block_id"].iloc[0])],
                "srcs": [pdf["src"].to_numpy(dtype="int64")],
                "dsts": [pdf["dst"].to_numpy(dtype="int64")],
                "weights": [pdf["weight"].to_numpy(dtype="float64")],
            }
        )

    blocks = (
        salted.select("block_id", "src", "dst", "weight")
        .groupBy("block_id")
        .applyInPandas(pack, schema=BLOCK_SCHEMA)
        # the pack UDF's output attrs are fresh, so the groupBy's own
        # hash partitioning is not provable on them — re-key once here
        # (one-time build cost) to make it visible through the cache
        .repartition(n_blocks, "block_id")
        .persist()
    )
    blocks.count()
    routes = (
        salted.select(F.col("src").alias("id"), "block_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    return AdjacencyBlocks(blocks=blocks, routes=routes, n_blocks=n_blocks)


def spmv(adj: AdjacencyBlocks, state: DataFrame) -> DataFrame:
    """One superstep: (id, c) state → (id, mass) where
    ``mass(v) = Σ_{(u,v)∈E} w(u,v) · c(u)``.

    Physical plan: state is routed to its salted blocks (join on id —
    state side is |V|, tiny next to |E|), cogrouped with the
    pre-partitioned blocks on block_id, reduced partition-locally with
    numpy inside Arrow (`np.bincount` over block-local dst codes), and
    the per-block partials are shuffle-reduced by dst. Only state and
    partial messages move; the edge arrays stay put.
    """
    routed = adj.routes.join(state.select("id", "c"), "id").select(
        "block_id", "id", "c"
    )

    def kernel(block_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if block_pdf.empty or state_pdf.empty:
            return pd.DataFrame({"id": np.array([], dtype="int64"),
                                 "partial": np.array([], dtype="float64")})
        out_ids: list[np.ndarray] = []
        out_vals: list[np.ndarray] = []
        lut = pd.Series(
            state_pdf["c"].to_numpy(dtype="float64"),
            index=state_pdf["id"].to_numpy(dtype="int64"),
        )
        # one row per block (a block_id group normally holds exactly one)
        for i in range(len(block_pdf)):
            srcs = np.asarray(block_pdf["srcs"].iloc[i], dtype="int64")
            dsts = np.asarray(block_pdf["dsts"].iloc[i], dtype="int64")
            ws = np.asarray(block_pdf["weights"].iloc[i], dtype="float64")
            c = lut.reindex(srcs).to_numpy(dtype="float64")
            mask = ~np.isnan(c)
            if not mask.any():
                continue
            contrib = ws[mask] * c[mask]
            uniq, codes = np.unique(dsts[mask], return_inverse=True)
            out_ids.append(uniq)
            out_vals.append(np.bincount(codes, weights=contrib))
        if not out_ids:
            return pd.DataFrame({"id": np.array([], dtype="int64"),
                                 "partial": np.array([], dtype="float64")})
        return pd.DataFrame(
            {"id": np.concatenate(out_ids), "partial": np.concatenate(out_vals)}
        )

    partials = (
        adj.blocks.groupby("block_id")
        .cogroup(routed.groupby("block_id"))
        .applyInPandas(kernel, schema="id long, partial double")
    )
    return partials.groupBy("id").agg(F.sum("partial").alias("mass"))


def spmv_arrow(adj: AdjacencyBlocks, state: DataFrame) -> DataFrame:
    """``spmv`` with the north_star's literal kernel boundary:
    ``applyInArrow`` (Spark 4) instead of ``applyInPandas`` — the block
    list arrays flatten to numpy ZERO-COPY from Arrow (no pandas
    object-Series materialization of array<long> columns, no per-row
    ``.iloc``), and the state lookup is a sorted-array ``searchsorted``
    instead of a pandas reindex. Same partial-message contract: the
    per-block partials are exact sums over that block's edges, reduced
    by the downstream ``groupBy(id).sum`` (float summation order inside
    a block may differ from ``spmv`` by ~1e-15 — both kernels are
    fixpoint-equivalent, asserted in tests)."""
    import pyarrow as pa

    routed = adj.routes.join(state.select("id", "c"), "id").select(
        "block_id", "id", "c"
    )

    def kernel(block_tbl: "pa.Table", state_tbl: "pa.Table") -> "pa.Table":
        empty = pa.table(
            {"id": pa.array([], type=pa.int64()),
             "partial": pa.array([], type=pa.float64())}
        )
        if block_tbl.num_rows == 0 or state_tbl.num_rows == 0:
            return empty
        sid = state_tbl.column("id").to_numpy(zero_copy_only=False)
        sc = state_tbl.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(sid, kind="stable")
        sid, sc = sid[order], sc[order]

        def flat(name, dtype):
            arr = block_tbl.column(name).combine_chunks()
            return arr.flatten().to_numpy(zero_copy_only=False).astype(
                dtype, copy=False)

        # rows of a block group are independent edge segments; the dst
        # partial sum is associative, so flatten them all and reduce once
        srcs = flat("srcs", "int64")
        dsts = flat("dsts", "int64")
        ws = flat("weights", "float64")
        pos = np.searchsorted(sid, srcs)
        pos_c = np.minimum(pos, len(sid) - 1)
        mask = sid[pos_c] == srcs
        if not mask.any():
            return empty
        contrib = ws[mask] * sc[pos_c[mask]]
        uniq, codes = np.unique(dsts[mask], return_inverse=True)
        return pa.table(
            {"id": pa.array(uniq, type=pa.int64()),
             "partial": pa.array(np.bincount(codes, weights=contrib),
                                 type=pa.float64())}
        )

    partials = (
        adj.blocks.groupby("block_id")
        .cogroup(routed.groupby("block_id"))
        .applyInArrow(kernel, schema="id long, partial double")
    )
    return partials.groupBy("id").agg(F.sum("partial").alias("mass"))
