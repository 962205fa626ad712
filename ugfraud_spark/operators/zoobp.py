"""ZooBP heterogeneous linearized BP, closed-form 2x2 kron action.

Reference (``/root/reference/UGFraud/Detector/ZooBP.py:76-154``) builds
``M = P − Q + I`` from Kronecker products of the signed adjacency with
``ep·H``, ``H = [[.5,−.5],[−.5,.5]]`` (``Demo/eval_ZooBP.py:16``).
Because centered 2-class beliefs satisfy b1 = −b0, the whole 2-vector
system collapses to a *scalar* signed propagation (SURVEY F6):

    b ← e + (ep/2) · Σ_{u~v} s(u,v) · b(u),   s = +1 (sign=1) / −1 (sign=2)

This is the paper-faithful fixpoint; the reference's literal
``logsumexp(M·B)``-as-a-scalar deviation (``ZooBP.py:144``) is a
documented bug we do not replicate (SURVEY §7 risk register). Priors are
centered at 0.5 like ``ZooBP.py:78-79``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .superstep import SuperstepResult, colocate_edges, iterate


def zoobp(
    edges: DataFrame,
    priors: DataFrame,
    *,
    ep: float = 0.01,
    max_iter: int = 5,
    tol: float | None = None,
    checkpoint_dir: str | None = None,
) -> SuperstepResult:
    """edges(src, dst, sign 1|2) + priors(id, prior) → state(id, belief)."""
    s_col = F.when(F.col("sign") == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
    sym = colocate_edges(
        edges.select("src", "dst", s_col.alias("s")).unionAll(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), s_col.alias("s")
            )
        )
    )
    pri = priors.select(
        "id", (F.col("prior") - F.lit(0.5)).alias("p")
    ).repartition("id").persist()
    pri.count()
    state0 = pri.select("id", F.col("p").alias("value"))
    h = ep / 2.0

    def step(state: DataFrame, _i: int) -> DataFrame:
        msg = (
            sym.join(
                state.select(F.col("id").alias("src"), "value").hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("s") * F.col("value")).alias("m"))
        )
        return pri.join(msg.hint("shuffle_hash"), "id", "left").select(
            "id",
            (F.col("p") + F.lit(h) * F.coalesce("m", F.lit(0.0))).alias("value"),
        )

    def residual(old: DataFrame, new: DataFrame) -> float:
        r = (
            new.alias("n").join(old.alias("o"), "id")
            .select(F.sum(F.abs(F.col("n.value") - F.col("o.value"))).alias("r"))
            .collect()[0]["r"]
        )
        return float(r or 0.0)

    res = iterate(
        state0,
        step,
        residual_fn=(None if tol is None else residual),
        max_iter=max_iter,
        tol=tol or 0.0,
        checkpoint_every=5,
        checkpoint_dir=checkpoint_dir,
    )
    res.state = res.state.select("id", F.col("value").alias("belief"))
    return res
