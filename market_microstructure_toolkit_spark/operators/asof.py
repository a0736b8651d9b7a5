"""Nearest-timestamp (as-of) join — SURVEY §2.3 J1.

The reference matches each jittered slice target to the snapshot row with
the nearest ``ts_ms`` via a monotone two-pointer over a single series
(``impact_twap.py:174-188``). Spark-first: a tolerance-bounded range join
(the band predicate keeps it from exploding to a full cross product) +
``row_number`` to keep the single nearest row per target. The target side
is tiny (slice schedules, alert timestamps) so it broadcasts; the big
snapshot side never shuffles for the join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark import schema as S


def asof_nearest(
    snapshots: DataFrame,
    targets: DataFrame,
    tolerance_ms: int,
    keys: tuple[str, ...] = S.PARTITION_KEYS,
    ts_col: str = "ts_ms",
    target_ts_col: str = "target_ts",
    target_id_col: str = "target_id",
    tiebreak_cols: tuple[str, ...] = ("ts_ms", "raw_nonce"),
) -> DataFrame:
    """For each target row, the nearest snapshot within ``tolerance_ms``.

    Ties (equidistant rows) break deterministically toward the earlier
    ``tiebreak_cols``. Targets with no snapshot in tolerance are dropped
    (inner semantics). ``targets`` is broadcast — it is schedule-sized
    (O(slices)), never data-sized.
    """
    # Alias both sides: targets are often derived from the snapshot frame
    # itself (a self-join), which Spark otherwise flags as ambiguous.
    s, t = snapshots.alias("__s"), F.broadcast(targets.alias("__t"))
    d = F.abs(F.col(f"__s.{ts_col}") - F.col(f"__t.{target_ts_col}"))
    cond = (d <= tolerance_ms)
    for k in keys:
        cond = cond & (F.col(f"__s.{k}") == F.col(f"__t.{k}"))
    joined = s.join(t, on=cond, how="inner").select(
        *[F.col(f"__s.{c}") for c in snapshots.columns],
        F.col(f"__t.{target_id_col}"),
        F.col(f"__t.{target_ts_col}"),
        d.alias("abs_delta"),
    )
    w = Window.partitionBy(*keys, target_id_col).orderBy(
        "abs_delta", *tiebreak_cols
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_backward_union(
    snapshots: DataFrame,
    targets: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    value_cols: tuple[str, ...],
    target_ts_col: str = "ts_ms",
    snapshot_order_col: str | None = "raw_nonce",
    target_payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Backward as-of for BIG-BIG inputs: each target row picks the last
    snapshot at-or-before its timestamp, without broadcasting either
    side.

    ``asof_nearest`` broadcasts the target side — right for
    schedule-sized targets, wrong when both sides are data-sized (e.g.
    aligning one instrument's tape onto another's). This variant is the
    standard distributed shape instead: tag both streams, UNION, and run
    ONE keyed ordered window carrying the last non-null snapshot values
    forward — cost is a single shuffle on ``keys`` shared by every
    downstream window, state O(1) per row, no join at all.

    Tie rules are explicit and match DuckDB's ``ASOF JOIN`` on the
    nonce-deduped snapshot stream: a snapshot sharing the target's exact
    timestamp counts (snapshots sort before targets at equal ts), and
    duplicate-ts snapshots resolve to the highest ``snapshot_order_col``
    (last written wins). Targets before the first snapshot emit NULLs —
    filter on the carried columns for inner semantics.

    Returns the target rows + ``value_cols`` carried from the snapshot
    side + ``src_ts_ms`` (the matched snapshot's timestamp).
    """
    tag_order = [ts_col, "__tag"] + (
        [snapshot_order_col] if snapshot_order_col else []
    )
    snaps = snapshots.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__tag"),
        *(
            [F.col(snapshot_order_col)]
            if snapshot_order_col
            else []
        ),
        F.col(ts_col).alias("__src_ts"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[
            F.lit(None).cast(targets.schema[c].dataType).alias(f"__p_{c}")
            for c in target_payload_cols
        ],
    )
    tgts = targets.select(
        *keys,
        F.col(target_ts_col).alias(ts_col),
        F.lit(1).alias("__tag"),
        *(
            [F.lit(None).cast("long").alias(snapshot_order_col)]
            if snapshot_order_col
            else []
        ),
        F.lit(None).cast("long").alias("__src_ts"),
        *[
            F.lit(None).cast(snapshots.schema[c].dataType).alias(f"__v_{c}")
            for c in value_cols
        ],
        *[F.col(c).alias(f"__p_{c}") for c in target_payload_cols],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = snaps.unionByName(tgts).select(
        *keys,
        ts_col,
        "__tag",
        *[F.col(f"__p_{c}").alias(c) for c in target_payload_cols],
        F.last("__src_ts", ignorenulls=True).over(w).alias("src_ts_ms"),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return merged.filter(F.col("__tag") == 1).drop("__tag")
