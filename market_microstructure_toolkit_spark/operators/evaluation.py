"""In-engine model evaluation.

Extracted from the gate queries (round-6 verdict #2) so the evaluation
machinery is reusable outside the registry; the ``book_feature_auc``
gate's DuckDB oracle pins this exact code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_auc"]


def exact_auc(
    feat: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    keys: tuple[str, ...] = (),
    round_dp: int = 6,
) -> DataFrame:
    """Exact tie-aware ROC AUC per key group, computed WITHOUT sorting
    samples: AUC is the Mann-Whitney concordance P(x_pos > x_neg) +
    P(tie)/2, assembled from per-distinct-score class counts and one
    cumulative window over the (small) distinct-score domain. The heavy
    groupBy partial-aggregates map-side on (keys, x); the window orders
    distinct scores only (thousands after quantization), so a 100 TB
    input reduces before anything is ordered. Ties get the standard
    half-credit; rational arithmetic until the final round.

    ``feat`` must have non-null ``x_col`` (score) and 0/1 ``y_col``
    (label); filter nulls upstream.
    """
    grouped = feat.groupBy(*keys, x_col).agg(
        F.sum(y_col).cast("long").alias("n_pos_x"),
        (F.count(F.lit(1)) - F.sum(y_col)).cast("long").alias("n_neg_x"),
    )
    wcum = (
        Window.partitionBy(*keys)
        .orderBy(x_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grouped.withColumn(
        "neg_below", F.coalesce(F.sum("n_neg_x").over(wcum), F.lit(0))
    )
    return cum.groupBy(*keys).agg(
        F.round(
            F.sum(
                F.col("n_pos_x")
                * (F.col("neg_below") + F.col("n_neg_x") / F.lit(2.0))
            )
            / (F.sum("n_pos_x") * F.sum("n_neg_x")),
            round_dp,
        ).alias("auc"),
        F.sum("n_pos_x").cast("long").alias("n_pos"),
        F.sum("n_neg_x").cast("long").alias("n_neg"),
    )
