"""Depth analytics (SURVEY §2.4 A1-A4, §2.5 W11): melt the wide book into
(level, price, size) rows and aggregate across time.

The reference does this with pandas concat over per-level frames
(``advanced_plots.py:193-238``); Spark-first it is one ``stack``
projection (no shuffle) followed by a single groupBy — the only shuffle.
At 100 TB the melt multiplies rows by 2K but the aggregate is partial
(map-side combined) so the shuffle carries only (symbol, level) groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark import schema as S


def melt_levels(df: DataFrame, depth: int | None = None) -> DataFrame:
    """Wide book -> long (side, level, price, size) rows (A3's
    ``_extract_depth``, advanced_plots.py:193-212), keeping meta columns."""
    k = depth or S.infer_depth(df)
    pairs = []
    for side in ("bid", "ask"):
        for i in range(1, k + 1):
            pairs.append(
                f"'{side}', {i}, {side}{i}_price, {side}{i}_size"
            )
    stack_expr = f"stack({2 * k}, {', '.join(pairs)}) as (side, level, price, size)"
    keep = [c for c in ("exchange_id", "symbol", "ts_ms", "raw_nonce") if c in df.columns]
    return df.selectExpr(*keep, stack_expr)


def avg_size_per_level(
    df: DataFrame,
    depth: int | None = None,
    keys: tuple[str, ...] = S.PARTITION_KEYS,
) -> DataFrame:
    """Mean size (and price) per (side, level) across time (A3,
    advanced_plots.py:223-233)."""
    long = melt_levels(df, depth)
    return long.groupBy(*keys, "side", "level").agg(
        F.avg("size").alias("avg_size"),
        F.avg("price").alias("avg_price"),
        F.count("size").alias("n_obs"),
    )


def depth_slope_across_levels(
    avg_levels: DataFrame, keys: tuple[str, ...] = S.PARTITION_KEYS
) -> DataFrame:
    """Finite-difference of avg size along the level axis (W11,
    advanced_plots.py:241-269): ``avg_size - lag(avg_size)`` per side."""
    w = Window.partitionBy(*keys, "side").orderBy("level")
    return avg_levels.withColumn(
        "size_slope", F.col("avg_size") - F.lag("avg_size").over(w)
    )


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 60,
) -> DataFrame:
    """Fixed-range histogram (A4, advanced_plots.py:122-130): bucket index
    + count. Values outside [lo, hi) are clamped into the edge buckets,
    NULLs dropped — one partial-aggregated groupBy."""
    x = F.col(col)
    idx = F.floor((x - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins))
    idx = F.least(F.greatest(idx, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(x.isNotNull())
        .groupBy(idx.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
