"""Time-bucketed OHLC bars and their hierarchical rollup.

Extracted from the ``book_resample_ohlc`` / ``book_ohlc_rollup_ladder``
gate queries (round-6 verdict #2); the gates' DuckDB oracles pin this
exact code. The rollup MERGEABILITY (coarse bars derived from fine bars
equal coarse bars computed from ticks) is what lets a 100 TB tape keep
only fine bars and materialize every coarser resolution incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ohlc_bars", "rollup_ohlc"]


def ohlc_bars(
    df: DataFrame,
    value_col: str,
    bucket_cols: list[str],
    keys: tuple[str, ...],
    order_cols: list[str],
) -> DataFrame:
    """One OHLC bar per (keys, *bucket_cols): open = first value in
    ``order_cols`` order, close = last, high/low = max/min, n = count.
    First/last are exact row_number picks (deterministic under the
    total order), aggregated via the max-of-one-row idiom so the whole
    thing is two window passes + one grouped aggregate, keyed on the
    same (instrument, bucket) shuffle."""
    wa = Window.partitionBy(*keys, *bucket_cols).orderBy(*order_cols)
    wd = Window.partitionBy(*keys, *bucket_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    v = F.col(value_col)
    return (
        df.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy(*keys, *bucket_cols)
        .agg(
            F.max(F.when(F.col("rn_a") == 1, v)).alias("o"),
            F.max(v).alias("h"),
            F.min(v).alias("l"),
            F.max(F.when(F.col("rn_d") == 1, v)).alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def rollup_ohlc(
    fine: DataFrame,
    coarse_col: str,
    fine_col: str,
    keys: tuple[str, ...],
) -> DataFrame:
    """Merge fine OHLC bars (columns o/h/l/c/n from :func:`ohlc_bars`)
    into coarse bars: open = first fine open, close = last fine close,
    high/low = max/min, n = sum — the continuous-aggregate merge
    algebra. Touches bar counts, not tick counts."""
    wf_a = Window.partitionBy(*keys, coarse_col).orderBy(fine_col)
    wf_d = Window.partitionBy(*keys, coarse_col).orderBy(
        F.col(fine_col).desc()
    )
    return (
        fine.withColumn("rf_a", F.row_number().over(wf_a))
        .withColumn("rf_d", F.row_number().over(wf_d))
        .groupBy(*keys, coarse_col)
        .agg(
            F.max(F.when(F.col("rf_a") == 1, F.col("o"))).alias("open_mid"),
            F.max("h").alias("high_mid"),
            F.min("l").alias("low_mid"),
            F.max(F.when(F.col("rf_d") == 1, F.col("c"))).alias("close_mid"),
            F.sum("n").cast("long").alias("n_snapshots"),
        )
    )
