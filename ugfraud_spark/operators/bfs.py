"""BFS hop distances by iterative frontier relaxation (reference T4).

Reference: ``/root/reference/UGFraud/Detector/SpEagle.py:354-379`` uses a
driver-side BFS (visited set + queue) to build its schedule; the Spark
re-expression is the standard synchronous relaxation

    dist_0(seed) = 0
    dist_{t+1}(v) = min(dist_t(v), 1 + min_{(u,v)∈E} dist_t(u))

— per superstep one join edges⋈frontier + one groupBy(min), the same
gather-scatter shape as every other kernel here, so it shares the
superstep driver (checkpointing, metrics, resume). K iterations bound
the hop radius; vertices never reached are absent from the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .superstep import SuperstepResult, colocate_edges, iterate


def bfs_hops(edges_sym: DataFrame, seeds: DataFrame, *,
             iters: int = 6, checkpoint_every: int = 1,
             checkpoint_dir: str | None = None) -> DataFrame:
    """edges_sym(src, dst) directed-both-ways + seeds(id) → (id, dist).

    Fixed ``iters`` supersteps (oracle-parity mode: the DuckDB oracle
    unrolls the same recurrence); dist is exact for every vertex within
    ``iters`` hops of a seed.
    """
    edges_sym = colocate_edges(edges_sym.select("src", "dst"))
    state0 = seeds.select("id", F.lit(0).alias("dist"))

    def step(state: DataFrame, i: int) -> DataFrame:
        # frontier-delta relaxation: with unit hops, a vertex's dist is
        # final the round it is first reached, and a vertex first reached
        # at round i carries dist == i exactly — so the frontier is a
        # pure FILTER on the state (no old⋈new comparison join), and the
        # gather join sees |frontier| rows instead of the whole reached
        # set. Re-propagating already-settled vertices only re-derives
        # minima that already won; output is identical to the full
        # relaxation the oracle unrolls.
        relaxed = (
            edges_sym.join(
                state.where(F.col("dist") == i)
                .select(F.col("id").alias("src"), "dist").hint("shuffle_hash"),
                "src",
            )
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        return (
            state.unionAll(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
        )

    res: SuperstepResult = iterate(
        state0, step, max_iter=iters,
        checkpoint_every=checkpoint_every, checkpoint_dir=checkpoint_dir,
    )
    return res.state
