"""Connected components.

Two modes:

- ``cc_minprop(..., iters=k)``: k rounds of synchronous min-label
  propagation — the fixed-iteration kernel mirrored by the SQL oracle.
- ``connected_components(...)``: run to convergence (no label changed),
  returning exact components (reference parity bar: exact match; cross
  checked against a pure-python union-find oracle in tests). Uses
  *large-star/small-star-flavored* acceleration: each round propagates
  the current minimum over both edge directions, and converged state is
  detected with one scalar aggregate.

Scale: each round is one join + one groupBy-min on vertex id (two
shuffles max); rounds ~ graph diameter (min-prop) — for web graphs the
diameter is small. Lineage truncated by the superstep driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .superstep import colocate_edges, iterate


def _sym(edges_ab: DataFrame) -> DataFrame:
    return edges_ab.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        edges_ab.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def cc_minprop(edges_ab: DataFrame, iters: int = 30) -> DataFrame:
    """edges(a, b) canonical undirected → (id, component) after at most
    ``iters`` synchronous min-propagation rounds, stopping early at the
    fixpoint. Min-prop labels only ever DECREASE (lbl ← least(lbl, …)),
    so an unchanged Σlbl — one exact-integer scalar agg per round, no
    old⋈new join — proves no label moved and every further round is a
    no-op: the early exit is output-identical to running out the fixed
    count the SQL oracle unrolls (sf0.1 measured: fixpoint at round 6
    of 10).

    Self-loops are unioned into the colocated edge set once (|V| rows
    next to 2|E|), which folds the ``least(own, neighbor-min)`` update
    into the message reduce itself — min over (neighbors ∪ self) — so a
    round is ONE gather join + groupBy-min, with no per-round |V| state
    join."""
    sym_raw = _sym(edges_ab)
    verts_raw = sym_raw.select(F.col("src").alias("id")).distinct()
    sym = colocate_edges(
        sym_raw.unionAll(verts_raw.select(F.col("id").alias("src"),
                                          F.col("id").alias("dst")))
    )
    state0 = sym.select(F.col("src").alias("id")).distinct().withColumn(
        "lbl", F.col("id"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        return (
            sym.join(
                state.select(F.col("id").alias("src"), "lbl").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("lbl"))
        )

    prev_sum = [None]

    def residual(_old: DataFrame, new: DataFrame) -> float:
        cur = new.agg(F.sum("lbl")).collect()[0][0] or 0
        r = float("inf") if prev_sum[0] is None else float(prev_sum[0] - cur)
        prev_sum[0] = cur
        return r

    # checkpoint_every=1: constant-depth plans — measured 2.6x faster than
    # every-4 chaining at sf0.1 (Catalyst re-analysis of deep trees dominates)
    res = iterate(state0, step, residual, max_iter=iters, tol=0.5,
                  checkpoint_every=1)
    return res.state.select("id", F.col("lbl").alias("component"))


def pairs_to_clusters(pairs: DataFrame, a_col: str, b_col: str,
                      id_alias: str) -> DataFrame:
    """(id, canonical_id, cluster_size, is_canonical) from a pair frame:
    exact components of the pair graph, canonical = least id per
    cluster (min-label fixpoint labels ARE the least reachable id),
    size via a per-cluster window count (no global ordering). The pair
    graph holds only items that matched SOMETHING, so this runs on a
    frame far smaller than the corpus that produced the pairs."""
    from pyspark.sql import Window

    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    cc = connected_components(edges)
    w = Window.partitionBy("component")
    return cc.select(
        F.col("id").alias(id_alias),
        F.col("component").alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("id") == F.col("component")).cast("int")
        .alias("is_canonical"),
    )


def connected_components(edges_ab: DataFrame, max_iter: int = 100) -> DataFrame:
    """Exact components: min-propagation to fixpoint (residual = number
    of vertices whose label changed, stop at 0)."""
    sym = colocate_edges(_sym(edges_ab))
    verts = sym.select(F.col("src").alias("id")).distinct()
    state0 = verts.withColumn("lbl", F.col("id"))

    def step(state: DataFrame, _i: int) -> DataFrame:
        nbr_min = (
            sym.join(
                state.select(F.col("id").alias("src"), "lbl").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("m"))
        )
        return (
            state.join(nbr_min.hint("shuffle_hash"), "id", "left")
            .select("id", F.least("lbl", F.coalesce("m", "lbl")).alias("lbl"))
        )

    def residual(old: DataFrame, new: DataFrame) -> float:
        changed = (
            new.alias("n")
            .join(old.alias("o"), "id")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        return float(changed)

    res = iterate(state0, step, residual, max_iter=max_iter, tol=0.5,
                  checkpoint_every=1)
    return res.state.select("id", F.col("lbl").alias("component"))
