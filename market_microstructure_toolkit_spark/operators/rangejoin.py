"""Distributed interval (range) join — points against time intervals.

Spark has no native band/interval join; the naive formulation
(`p.ts BETWEEN i.start AND i.end` as the ONLY join condition) degenerates
to a broadcast-nested-loop or cartesian product, which is exactly the
plan that dies at scale. The standard distributed shape instead
BUCKETIZES time:

- each interval explodes to the fixed-width bins it covers (a span of
  `w` ms touches ceil(w / bin_ms) + 1 bins at most);
- each point maps to its single bin;
- the join becomes an EQUI-join on (keys..., bin) — a plain shuffled
  hash join with uniform keys — plus a residual `start <= ts < end`
  filter that removes same-bin false positives.

Both sides stay big (no broadcast requirement, unlike `asof_nearest`
whose target side is schedule-sized); pick `bin_ms` near the typical
interval width so the explode factor stays ~2 and bucket occupancy stays
flat. A point matches an exploded interval copy only in the point's own
bin, so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: tuple[str, ...],
    point_ts_col: str,
    start_col: str,
    end_col: str,
    bin_ms: int,
) -> DataFrame:
    """Inner-join each point to every interval (same ``keys``) whose
    half-open [start, end) span contains the point's timestamp.

    Returns the joined rows with all columns from both sides (non-key
    column names must be disjoint). Degenerate intervals (end <= start)
    match nothing and are dropped before the explode.
    """
    b = F.lit(bin_ms)
    ivl = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b),
                F.floor((F.col(end_col) - 1) / b),
            )
        ),
    )
    pts = points.withColumn("__bin", F.floor(F.col(point_ts_col) / b))
    return (
        pts.join(ivl, [*keys, "__bin"])
        .filter(
            (F.col(point_ts_col) >= F.col(start_col))
            & (F.col(point_ts_col) < F.col(end_col))
        )
        .drop("__bin")
    )
