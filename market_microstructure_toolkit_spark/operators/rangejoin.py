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

from pyspark.sql import Column, DataFrame, Window
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


def sorted_interval_overlap_pairs(
    left: DataFrame,
    right: DataFrame,
    keys: tuple[str, ...],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    check_contract: bool = True,
    segmented: bool = False,
) -> DataFrame:
    """Overlap join for SORTED interval streams — work proportional to
    the TRUE pair count, with no bin-width parameter at all.

    Contract: within each ``keys`` group, BOTH sides' start and end
    columns are strictly increasing (consecutive-tick intervals
    [t_{i-1}, t_i) always are). Then the right intervals overlapping a
    given left interval form one CONTIGUOUS index range
    [lo, hi]:

    - ``lo`` = 1 + #{right : right_end <= left_start}  (skip the rights
      that ended at-or-before this left began; half-open semantics),
    - ``hi`` = #{right : right_start < left_end}  (rights that began
      strictly before this left ended).

    Both counts come from ONE merged ordered pass each (union the
    boundary stream with a tag, running count over a keyed window —
    ties break so that ``<=`` / ``<`` come out exactly right), then the
    pair list is ``explode(sequence(lo, hi))`` equi-joined back to the
    index — fan-out exactly the true overlap count, never bin
    occupancy. This is the shape that survives ANY gap distribution:
    the bucketized :func:`interval_overlap_join` needs a bin width that
    is simultaneously ≥ most widths (explode bound) and ≤ the local
    tick spacing (occupancy bound), which a bimodal burst-and-gap tape
    makes impossible (measured: a 100x-density burst tape OOMs every
    fixed or quantile-tuned bin, and runs here).

    Non-key column names must be disjoint across the two sides.

    ``check_contract`` (default on) guards the one contract violation
    that would produce SILENTLY WRONG answers rather than an error:
    duplicate ``left_start`` values within a key make the
    (keys, left_start) join-back below fan out each duplicated left row
    into every duplicate's pair range. The guard replaces the join key
    with a ``raise_error`` branch when ``lag(left_start)`` repeats, so a
    violating frame fails at execution time instead. Cost: one extra
    keyed window over the left side (same partitioning as the bounds
    join it protects); pass ``check_contract=False`` only when the
    caller has already proven strict monotonicity upstream.
    """
    from market_microstructure_toolkit_spark.operators.window_metrics import (
        add_cumulative_segmented,
        add_position_segmented,
        series_stages,
    )

    if check_contract:
        ls_type = left.schema[left_start].dataType.simpleString()
        left = (
            series_stages(
                left,
                lambda w: {"__prev_ls": F.lag(left_start).over(w)},
                window=2,
                segmented=segmented,
                keys=tuple(keys),
                order_col=left_start,
            )
            .withColumn(
                left_start,
                F.when(
                    F.col("__prev_ls") == F.col(left_start),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "sorted_interval_overlap_pairs: duplicate "
                                f"{left_start} within a key group (value "
                            ),
                            F.col(left_start).cast("string"),
                            F.lit(
                                ") violates the strictly-increasing-starts"
                                " contract; the (keys, left_start)"
                                " join-back would silently fan out"
                            ),
                        )
                    ).cast(ls_type),
                ).otherwise(F.col(left_start)),
            )
            .drop("__prev_ls")
        )

    if segmented:
        # segmented-rank index (wscale audit): one side's intervals per
        # key grow with data, so the row_number fans out per segment
        r_idx = add_position_segmented(
            right, keys=tuple(keys), order_col=right_start, pos_col="__p0"
        ).withColumn("__ridx", (F.col("__p0") + 1).cast("int")).drop("__p0")
    else:
        wr = Window.partitionBy(*keys).orderBy(right_start)
        r_idx = right.withColumn("__ridx", F.row_number().over(wr))

    run = (
        Window.partitionBy(*keys)
        .orderBy("__val", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def count_stream(bound_col: str, left_probe: str, right_first: bool):
        """Running count of right-boundary events at each left probe.
        ``right_first`` puts equal-valued right rows BEFORE the probe
        (inclusive <=) or AFTER it (strict <)."""
        r_tag, l_tag = (0, 1) if right_first else (1, 0)
        rs = r_idx.select(
            *keys, F.col(bound_col).alias("__val"), F.lit(r_tag).alias("__tag"),
            F.lit(None).cast("long").alias("__probe_ord"),
        )
        ls = left.select(
            *keys, F.col(left_probe).alias("__val"), F.lit(l_tag).alias("__tag"),
            F.col(left_start).alias("__probe_ord"),
        )
        is_r = F.when(F.col("__tag") == F.lit(r_tag), 1).otherwise(0)
        u = rs.unionByName(ls)
        if segmented:
            # integer 0/1 summands -> the segmented prefix-sum is exact;
            # cast back to long (the scan's null-carry promotes to
            # double, exact far below 2^53)
            merged = add_cumulative_segmented(
                u.withColumn("__is_r", is_r),
                "__is_r",
                out_col="__cnt",
                keys=tuple(keys),
                order_col=["__val", "__tag"],
            ).withColumn("__cnt", F.col("__cnt").cast("long"))
        else:
            merged = u.select(
                *keys,
                "__probe_ord",
                F.sum(is_r).over(run).alias("__cnt"),
            )
        return merged.filter(F.col("__probe_ord").isNotNull()).select(
            *keys, F.col("__probe_ord"), F.col("__cnt")
        )

    # lo - 1 = count of right_end <= left_start (right first on ties)
    lo = count_stream(right_end, left_start, right_first=True)
    # hi = count of right_start < left_end (left probe first on ties)
    hi = count_stream(right_start, left_end, right_first=False)
    bounds = lo.withColumnRenamed("__cnt", "__lo_m1").join(
        hi.withColumnRenamed("__cnt", "__hi"), [*keys, "__probe_ord"]
    )
    # left_start is strictly increasing per key (the contract), so
    # (keys, left_start) uniquely keys the bounds back onto left rows
    ranged = left.join(
        bounds.withColumnRenamed("__probe_ord", left_start),
        [*keys, left_start],
    )
    pairs = (
        ranged.filter(F.col("__hi") > F.col("__lo_m1"))
        .withColumn(
            "__ridx",
            F.explode(F.sequence(F.col("__lo_m1") + 1, F.col("__hi"))),
        )
        .drop("__lo_m1", "__hi")
    )
    return pairs.join(r_idx, [*keys, "__ridx"]).drop("__ridx")


def scd2_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Temporal (SCD Type-2) dimension join: each fact row picks the
    dimension VERSION whose half-open [start, end) validity contains the
    fact's timestamp.

    The versioned-dimension lookup every warehouse fact pipeline needs
    once dimensions change over time (customer moved segment, instrument
    changed tick size). Scale shape: dimensions are small relative to
    facts even versioned, so the dim side is broadcast and the join
    plans as a BroadcastHashJoin on the equi key with the validity range
    as an in-stage filter — zero shuffle of the fact table, which at
    100 TB is the only acceptable cost. (A big-big versioned dim would
    ride interval_join's binned path instead.) Non-key columns must be
    disjoint; degenerate versions (end <= start) match nothing.
    """
    d = dim.filter(F.col(end_col) > F.col(start_col))
    out = facts.join(F.broadcast(d), on=key, how="inner").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return out
