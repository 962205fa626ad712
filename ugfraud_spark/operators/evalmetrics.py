"""Model-evaluation operators (reference E1, ``Utils/helper.py:39-63``).

The reference collects score dicts and calls sklearn. Distributed
versions as exact rank statistics:

- ROC-AUC = Mann-Whitney U with average ranks for ties — identical to
  sklearn's trapezoidal ``roc_auc_score``.
- Average precision with sklearn's step-wise definition:
  AP = Σ_k (ΔTP_k / n_pos) · precision_k over distinct thresholds
  descending.

Both are one groupBy(score) plus one ordered window over *distinct*
scores — the window operates on |distinct scores| rows, not |rows|, so
no full-data single-partition sort at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_ap(scored: DataFrame, score: str = "score", label: str = "label") -> DataFrame:
    """scored(score, label ∈ {0,1}) → 1 row (auc, ap)."""
    g = scored.groupBy(F.col(score).alias("s")).agg(
        F.count(F.lit(1)).alias("c"), F.sum(label).alias("pos")
    )
    w_asc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    w_desc = Window.orderBy(F.desc("s")).rowsBetween(Window.unboundedPreceding, 0)
    o = g.select(
        "s", "c", "pos",
        F.coalesce(F.sum("c").over(w_asc), F.lit(0)).alias("lower"),
        F.sum("pos").over(w_desc).alias("ctp"),
        F.sum("c").over(w_desc).alias("cn"),
    )
    return o.agg(
        (
            (
                F.sum(F.col("pos") * (F.col("lower") + (F.col("c") + 1) / 2.0))
                - F.sum("pos") * (F.sum("pos") + 1) / 2.0
            )
            / (F.sum("pos") * (F.sum("c") - F.sum("pos")))
        ).alias("auc"),
        (
            F.sum(F.col("pos") * F.col("ctp") / F.col("cn")) / F.sum("pos")
        ).alias("ap"),
    )


def ground_truth_users(edges: DataFrame) -> DataFrame:
    """Reference A5 (``helper.py:11-36``): a user is spam (1) iff any of
    its reviews has the spam label; here the deterministic label carrier
    is the edge sign (2 = negative ≙ label −1)."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.max(F.when(F.col("sign") == 2, 1).otherwise(0)).alias("gt")
    )


def ground_truth_reviews(edges: DataFrame) -> DataFrame:
    return edges.select(
        "src", "dst", F.when(F.col("sign") == 2, 1).otherwise(0).alias("gt")
    )
