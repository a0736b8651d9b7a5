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

from pyspark.sql import Column, DataFrame
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_ms: int,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner-join interval pairs (same ``keys``) whose half-open spans
    overlap: ``l.start < r.end AND r.start < l.end``.

    Same bucketize-to-equi-join shape as :func:`interval_join`, with
    BOTH sides exploded to the fixed-width bins they cover. A pair whose
    spans share several bins would meet once per shared bin, so the
    dedup predicate keeps only the bin containing the overlap's start
    (``floor(max(l.start, r.start) / bin) == bin``) — exact, local, and
    computed from columns already on the joined row (no post-join
    distinct, which would re-shuffle the whole pair set).

    ``extra_cond`` joins extra predicates into the bucket join (e.g.
    ``col("sym_a") < col("sym_b")`` for unordered cross-series pairs) so
    Catalyst can apply them during the join rather than after. Column
    names across the two sides must be disjoint apart from ``keys``.
    Degenerate spans (end <= start) match nothing and are dropped before
    the explode. Pick ``bin_ms`` near the typical span width: explode
    factor stays ~2 and per-bin pair fan-out stays bounded by bin
    occupancy — the quadratic-blowup guard a naive theta-join lacks.
    """
    b = F.lit(bin_ms)

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.filter(F.col(e) > F.col(s)).withColumn(
            "__bin",
            F.explode(
                F.sequence(F.floor(F.col(s) / b), F.floor((F.col(e) - 1) / b))
            ),
        )

    cond = (
        (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        & (
            F.floor(F.greatest(F.col(left_start), F.col(right_start)) / b)
            == F.col("__bin")
        )
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return (
        binned(left, left_start, left_end)
        .join(binned(right, right_start, right_end), [*keys, "__bin"])
        .filter(cond)
        .drop("__bin")
    )
