"""Partition-shaping helpers.

``spread`` guards expression-heavy stages (hashing, shingling, per-row
media decode) against under-partitioned inputs. On a real cluster a big
table arrives in thousands of file splits and this is a no-op; locally a
small single-file parquet otherwise serializes the whole stage onto one
core of local[32].
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *by: str, target: int | None = None) -> DataFrame:
    """Ensure at least ``target`` (default: defaultParallelism) partitions.

    With ``by`` columns, repartitions by hash of those keys so a following
    ``groupBy(*by)`` reuses the exchange instead of shuffling again. A
    DataFrame that already has enough partitions is returned untouched —
    this never *coalesces*, so at cluster scale (input already split) it
    costs nothing.
    """
    sess = df.sparkSession
    want = target or sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    if by:
        return df.repartition(want, *by)
    return df.repartition(want)
