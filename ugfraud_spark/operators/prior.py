"""Prior baseline pipeline (``Demo/eval_Prior.py``): the review prior,
min-max scaled to (0,1), *is* the suspiciousness belief; evaluated with
AUC/AP against ground truth. Implements the documented intent of
``scale_value`` (``helper.py:66-86``) — see SURVEY §7 on the for/else
indentation bug we deliberately do not replicate."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import minmax_scale
from .evalmetrics import auc_ap, ground_truth_reviews


def prior_review_beliefs(review_priors: DataFrame) -> DataFrame:
    """(src, dst, belief): scaled review priors."""
    scaled = minmax_scale(review_priors, "prior", out="belief")
    return scaled.select("src", "dst", "belief")


def prior_eval(edges: DataFrame, review_priors: DataFrame) -> DataFrame:
    """1-row (auc, ap) of the scaled-prior baseline vs sign-derived
    ground truth — the full eval_Prior pipeline."""
    beliefs = prior_review_beliefs(review_priors)
    gt = ground_truth_reviews(edges)
    scored = beliefs.join(gt, ["src", "dst"]).select(
        F.col("belief").alias("score"), F.col("gt").alias("label")
    )
    return auc_ap(scored)
