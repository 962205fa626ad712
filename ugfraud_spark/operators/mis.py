"""Deterministic Luby-style maximal independent set over the undirected
link graph — the classic symmetry-breaking primitive (parallel greedy
colorability / scheduling seed; reference has nothing like it, this is
forward coverage for the link-graph toolkit).

Algorithm: every vertex gets a static hashed priority (one
multiplicative scramble round mod P — the bare linear hash clusters,
see walks.py), totally ordered by (priority, vertex id). Each round, an
active vertex joins the MIS iff it beats EVERY active neighbor in that
order; winners and their neighbors deactivate. This is the
lexicographically-first MIS of the hashed permutation, computed in
parallel rounds — deterministic in (edges, seed), independent of
partitioning, and empirically O(log n)-ish rounds on hashed priorities.

Scale shape per round: the symmetric edge frame joins the active-state
frame on BOTH endpoints (two hash joins on the same vertex key), one
map-side-combined groupBy counts beating neighbors, and the active set
shrinks geometrically — each round's state is localCheckpoint'ed
(lineage truncation, the house iterative-kernel rule). The engine
early-exits on an empty active set; a fixpoint round selects nothing,
so running extra rounds (as the unrolled DuckDB oracle does) is
output-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIS_A = 1_103_515_245
MIS_B = 747_796_405
MIS_C = 2_891_336_453
MIS_P = 2_147_483_647  # 2^31 - 1
MIS_ROUNDS = 8  # observed fixpoint: 3 rounds at sf0.001 and sf0.01


def _priority(v, seed: int):
    # every term nonnegative and < 2^62, so plain % agrees with DuckDB
    h = (v * F.lit(MIS_A) + F.lit(MIS_C + seed)) % F.lit(MIS_P)
    return (h * F.lit(MIS_A) + F.lit(MIS_B)) % F.lit(MIS_P)


def maximal_independent_set(und: DataFrame, seed: int = 1,
                            max_rounds: int = MIS_ROUNDS) -> DataFrame:
    """und(a, b) canonical undirected edges → (vertex, mis_round) for
    every MIS member, mis_round = the round it was selected. Isolated
    vertices don't appear in the edge set and are trivially in any MIS;
    callers with a vertex dim can union them in at round 0."""
    sym = und.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    act = (
        sym.select("v").distinct()
        .select("v", _priority(F.col("v"), seed).alias("h"))
        .localCheckpoint(eager=True)
    )
    picked = []
    for r in range(1, max_rounds + 1):
        e = (
            sym.join(act.withColumnRenamed("h", "h_v"), "v")
            .join(
                act.select(F.col("v").alias("u"), F.col("h").alias("h_u")),
                "u",
            )
        )
        beats = e.groupBy("v").agg(
            F.sum(
                F.when(
                    (F.col("h_u") < F.col("h_v"))
                    | ((F.col("h_u") == F.col("h_v")) & (F.col("u") < F.col("v"))),
                    1,
                ).otherwise(0)
            ).alias("nb")
        )
        sel = (
            act.join(beats, "v", "left")
            .where(F.coalesce(F.col("nb"), F.lit(0)) == 0)
            .select("v")
            .localCheckpoint(eager=True)
        )
        picked.append(
            sel.select(F.col("v").alias("vertex"),
                       F.lit(r).alias("mis_round"))
        )
        dom = (
            e.join(sel.withColumnRenamed("v", "u"), "u")
            .select("v").distinct()
        )
        act = (
            act.join(sel, "v", "left_anti")
            .join(dom, "v", "left_anti")
            .localCheckpoint(eager=True)
        )
        if act.limit(1).count() == 0:
            break
    out = picked[0]
    for p in picked[1:]:
        out = out.unionAll(p)
    return out


COLOR_ROUNDS = 64  # longest priority-decreasing path: 41 (sf0.001), 51 (sf0.01)


def greedy_coloring(und: DataFrame, seed: int = 1,
                    max_rounds: int = COLOR_ROUNDS) -> DataFrame:
    """und(a, b) → (vertex, color): Jones-Plassmann greedy coloring
    with color = selection round — each round, every uncolored vertex
    that beats ALL its uncolored neighbors in the (hashed priority, id)
    total order takes the round number as its color. Every color class
    is an independent set by construction, so the coloring is proper;
    rounds = the longest priority-decreasing path, O(log n)-ish on
    hashed priorities. Same per-round shape as the MIS kernel (two hash
    joins of edges against state + one map-side-combined groupBy) minus
    the domination removal; state localCheckpoint'ed per round."""
    sym = und.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        und.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    act = (
        sym.select("v").distinct()
        .select("v", _priority(F.col("v"), seed).alias("h"))
        .localCheckpoint(eager=True)
    )
    picked = []
    for r in range(1, max_rounds + 1):
        e = (
            sym.join(act.withColumnRenamed("h", "h_v"), "v")
            .join(
                act.select(F.col("v").alias("u"), F.col("h").alias("h_u")),
                "u",
            )
        )
        beats = e.groupBy("v").agg(
            F.sum(
                F.when(
                    (F.col("h_u") < F.col("h_v"))
                    | ((F.col("h_u") == F.col("h_v")) & (F.col("u") < F.col("v"))),
                    1,
                ).otherwise(0)
            ).alias("nb")
        )
        sel = (
            act.join(beats, "v", "left")
            .where(F.coalesce(F.col("nb"), F.lit(0)) == 0)
            .select("v")
            .localCheckpoint(eager=True)
        )
        picked.append(
            sel.select(F.col("v").alias("vertex"), F.lit(r).alias("color"))
        )
        act = act.join(sel, "v", "left_anti").localCheckpoint(eager=True)
        if act.limit(1).count() == 0:
            break
    out = picked[0]
    for p in picked[1:]:
        out = out.unionAll(p)
    return out


MATCH_ROUNDS = 8


def greedy_matching(und: DataFrame, seed: int = 1,
                    max_rounds: int = MATCH_ROUNDS) -> DataFrame:
    """und(a, b) → (a, b, match_round): deterministic parallel greedy
    MAXIMAL MATCHING — the edge-wise sibling of the MIS above (a
    matching is an independent set of the line graph). Every edge gets
    a hashed priority; each round an edge matches iff it is the
    (h, a, b)-lexicographic minimum among the incident edges of BOTH
    its endpoints (the handshake), matched endpoints retire, and the
    survivor edge set shrinks geometrically. The result is exactly the
    sequential greedy matching that scans edges in priority order —
    the classic 2-approximation to maximum matching — computed in
    O(log n)-ish parallel rounds and replayable in (edges, seed).

    Uses: one-pass dedup pairing (each near-dup pair retires both
    docs), crawl-budget pairing of mirror hosts, and the scheduling
    primitive the MIS docstring describes, on edges. Per round: two
    per-endpoint windows ordered by (h, b)/(h, a) — bounded by vertex
    degree, never global — one join to intersect the two argmins, and
    two anti joins to retire endpoints; state localCheckpoint'ed."""
    from pyspark.sql import Window

    act = und.select(
        "a", "b",
        _priority(F.col("a") * F.lit(131) + F.col("b"), seed).alias("h"),
    ).localCheckpoint(eager=True)
    out = []
    for r in range(1, max_rounds + 1):
        # per-VERTEX incidence (an edge competes at both endpoints —
        # partitioning by the raw a/b columns would never pit (2,3)
        # against (3,4), since vertex 3 sits in different columns)
        inc = act.select(F.col("a").alias("v"), "a", "b", "h").unionAll(
            act.select(F.col("b").alias("v"), "a", "b", "h"))
        wv = Window.partitionBy("v").orderBy("h", "a", "b")
        minv = (
            inc.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1).select("a", "b")
        )
        won = (
            minv.groupBy("a", "b").agg(F.count(F.lit(1)).alias("nw"))
            .where(F.col("nw") == 2).select("a", "b")
            .localCheckpoint(eager=True)
        )
        if won.limit(1).count() == 0:
            break  # fixpoint: no edge can win ⇒ matching is maximal
        out.append(won.select("a", "b", F.lit(r).alias("match_round")))
        mv = won.select(F.col("a").alias("v")) \
            .unionAll(won.select(F.col("b").alias("v"))).distinct()
        act = (
            act.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b", "h")
            .localCheckpoint(eager=True)
        )
    if not out:  # edgeless input: the empty matching, correctly typed
        return und.select(
            "a", "b", F.lit(0).alias("match_round")).where(F.lit(False))
    res = out[0]
    for frame in out[1:]:
        res = res.unionAll(frame)
    return res
