"""Nearest-timestamp (as-of) join — SURVEY §2.3 J1.

The reference matches each jittered slice target to the snapshot row with
the nearest ``ts_ms`` via a monotone two-pointer over a single series
(``impact_twap.py:174-188``). Spark-first: NO join operator at all —
both variants here tag the two streams, UNION them, and run keyed
ordered window passes that carry the candidate snapshot as ONE atomic
struct (``last(ignorenulls)`` over a struct of every carried column;
per-column carries would tear rows whose individual fields are NULL).

- :func:`asof_nearest`: two-sided (backward + forward carry), nearest
  within a tolerance, exact pair-rank tie semantics.
- :func:`asof_backward_union`: one-sided backward carry for big-big
  inputs (both sides data-sized), left semantics.

Why this shape: pair-join forms (inequality nested-loop or tolerance-
banded hash join) materialize candidates proportional to target-density
× tolerance × snapshots — measured 43× (nested loop) and ~12× (banded)
wall going sf0.1 → sf1. The union form is one sort on the instrument
key — O(n log n), tolerance-independent, the same keyed shuffle every
other series op rides (docs/SCALE_NOTES.md has the 100× probe).
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
    segmented: bool = False,
) -> DataFrame:
    """For each target row, the nearest snapshot within ``tolerance_ms``.

    Ties (equidistant rows) break deterministically toward the earlier
    ``tiebreak_cols``. Targets with no snapshot in tolerance are dropped
    (inner semantics).

    TWO-SIDED SORT-MERGE, not a join: targets union into the snapshot
    stream and two keyed ordered window passes carry (a) the latest
    snapshot at-or-before and (b) the earliest snapshot at-or-after each
    target, as ATOMIC structs (one ``last(ignorenulls)`` over a struct
    of every snapshot column — per-column carries would tear rows whose
    individual fields are legitimately NULL). The nearer of the two
    candidates inside tolerance wins; equal distance resolves backward
    (the earlier ``ts``), and same-``ts`` snapshots resolve to the
    earliest ``tiebreak_cols`` — exactly the semantics of ranking all
    in-tolerance pairs by (|Δt|, *tiebreak_cols).

    Why this shape: the pair-join forms (inequality nested-loop, or
    tolerance-banded hash join) materialize candidates proportional to
    target-density × tolerance × snapshots — measured 43× (nested loop)
    and still ~12× (banded, tolerance 1h) wall going sf0.1 → sf1 on the
    round-6 sweep, because BOTH sides grow with the data. The union
    form is two sorts on the instrument key — O(n log n), tolerance-
    independent, and the same keyed shuffle every other series op rides.

    Contract edges (differ from a rank-1-per-``target_id`` pair join):

    - Duplicate (keys, ``target_id``) target ROWS each emit one output
      row — the operator keys matches on the row, not on ``target_id``;
      pass unique ids (all call sites do) or dedupe upstream if rank-1
      per id is required.
    - NULL-keyed targets DO match NULL-keyed snapshots: the window's
      partitionBy groups NULL keys together, where an equi-join would
      drop them. Filter NULL keys upstream for join-like semantics.
    """
    scols = snapshots.columns
    extra_tb = [c for c in tiebreak_cols if c != ts_col]
    snap_struct = F.struct(*[F.col(c) for c in scols])
    su = snapshots.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("__uts"),
        F.lit(0).alias("__is_t"),
        *[F.col(c).alias(f"__tb_{c}") for c in extra_tb],
        snap_struct.alias("__snap"),
        F.lit(None).cast(
            targets.schema[target_id_col].dataType
        ).alias(target_id_col),
        F.lit(None).cast(
            targets.schema[target_ts_col].dataType
        ).alias(target_ts_col),
    )
    tu = targets.select(
        *[F.col(k) for k in keys],
        F.col(target_ts_col).alias("__uts"),
        F.lit(1).alias("__is_t"),
        *[
            F.lit(None).cast(snapshots.schema[c].dataType).alias(f"__tb_{c}")
            for c in extra_tb
        ],
        F.lit(None).cast(su.schema["__snap"].dataType).alias("__snap"),
        F.col(target_id_col),
        F.col(target_ts_col),
    )
    u = su.unionByName(tu)
    # Backward: ascending event time; snapshots sort BEFORE a same-ts
    # target (__is_t) so a zero-distance snapshot is seen; same-ts
    # snapshots sort by tiebreaks DESCENDING so the carried last = the
    # EARLIEST tiebreak (the rank-1 row of the pair formulation).
    if segmented:
        # Segmented scale path (round-9 window audit): each carry is a
        # running last-non-null over an ORDER that is plain-ascending
        # after direction encoding — backward keeps __uts, forward
        # negates it, and the desc_nulls_first tiebreaks negate too
        # (asc default = nulls first, matching desc_nulls_first on the
        # original sign). Two two-phase segmented fills replace the two
        # single-task-per-key windows; the struct carry is selection,
        # so both paths are value-identical (dispatch-parity-pinned).
        #
        # CONTRACT (round-9 advice): direction-by-negation requires
        # NUMERIC ts/tiebreak columns and NON-NULL ts values. A string
        # tiebreak can't negate at all, and a NULL __uts would flip
        # position between DESC (nulls last) and negated-ASC (nulls
        # first), silently diverging from the plain path. Types are
        # asserted here; NULL ts stays a documented caller contract
        # (checking it costs a data scan — every call site derives ts
        # from non-null event time).
        from pyspark.sql.types import NumericType

        for _c in ("__uts", *[f"__tb_{c}" for c in extra_tb]):
            _dt = u.schema[_c].dataType
            if not isinstance(_dt, NumericType):
                raise TypeError(
                    f"asof_nearest(segmented=True): order/tiebreak column "
                    f"{_c!r} is {_dt.simpleString()}, not numeric — the "
                    f"negation encoding only preserves order for numeric "
                    f"non-null columns; use segmented=False"
                )
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            add_running_last_segmented,
        )

        enc = u.withColumn("__o_b", F.col("__uts")).withColumn(
            "__o_f", -F.col("__uts")
        )
        for c in extra_tb:
            enc = enc.withColumn(f"__o_tb_{c}", -F.col(f"__tb_{c}"))
        tb_enc = [f"__o_tb_{c}" for c in extra_tb]
        enc = add_running_last_segmented(
            enc, "__snap", out_col="__b", keys=tuple(keys),
            order_col=["__o_b", "__is_t", *tb_enc],
        )
        enc = add_running_last_segmented(
            enc, "__snap", out_col="__f", keys=tuple(keys),
            order_col=["__o_f", "__is_t", *tb_enc],
        )
        both = enc.select(
            *keys, target_id_col, target_ts_col, "__is_t", "__b", "__f"
        ).filter(F.col("__is_t") == 1)
    else:
        carry = Window.partitionBy(*keys).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        wb = carry.orderBy(
            F.col("__uts").asc(),
            F.col("__is_t").asc(),
            *[F.col(f"__tb_{c}").desc_nulls_first() for c in extra_tb],
        )
        # Forward: descending event time (last carried = earliest at-or-
        # after); same-ts ordering mirrors backward.
        wf = carry.orderBy(
            F.col("__uts").desc(),
            F.col("__is_t").asc(),
            *[F.col(f"__tb_{c}").desc_nulls_first() for c in extra_tb],
        )
        both = u.select(
            *keys,
            target_id_col,
            target_ts_col,
            "__is_t",
            F.last("__snap", ignorenulls=True).over(wb).alias("__b"),
            F.last("__snap", ignorenulls=True).over(wf).alias("__f"),
        ).filter(F.col("__is_t") == 1)
    db = F.col(target_ts_col) - F.col(f"__b.{ts_col}")
    df_ = F.col(f"__f.{ts_col}") - F.col(target_ts_col)
    valid_b = F.col("__b").isNotNull() & (db <= tolerance_ms)
    valid_f = F.col("__f").isNotNull() & (df_ <= tolerance_ms)
    use_b = valid_b & (~valid_f | (db <= df_))
    chosen = F.when(use_b, F.col("__b")).when(valid_f, F.col("__f"))
    delta = F.when(use_b, db).when(valid_f, df_)
    return (
        both.select(
            chosen.alias("__c"),
            F.col(target_id_col),
            F.col(target_ts_col),
            delta.alias("abs_delta"),
        )
        .filter(F.col("__c").isNotNull())
        .select(
            *[F.col(f"__c.{c}").alias(c) for c in scols],
            target_id_col,
            target_ts_col,
            "abs_delta",
        )
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
    segmented: bool = False,
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
    filter on ``src_ts_ms`` for inner semantics.

    The carry is a SINGLE ``last(ignorenulls)`` over one struct packing
    ``src_ts_ms`` and every value column — NOT one carry per column.
    Per-column carries tear rows: if the matched (latest) snapshot has a
    legitimate NULL in one value column, that column alone back-fills
    from an OLDER snapshot while ``src_ts_ms`` comes from the newer one,
    emitting a (timestamp, value) pair that never coexisted. The struct
    is non-NULL for every snapshot row (a struct with NULL fields is
    still a non-NULL struct), so the carried match is always one atomic
    snapshot — same fix as :func:`asof_nearest`'s ``__snap`` carry.

    Returns the target rows + ``value_cols`` carried from the snapshot
    side + ``src_ts_ms`` (the matched snapshot's timestamp).

    ``segmented=True`` (round-9 window audit) replaces the per-key
    running window — which serializes one instrument's merged
    snapshot+target stream through a single task — with the two-phase
    segmented forward-fill (``add_running_last_segmented``): per
    range-segment local carry in parallel, then a config-sized
    per-segment carry-in join. The struct carry is selection, not
    accumulation, so both paths are value-identical (pinned by the
    dispatch-parity tests).
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
        F.struct(
            F.col(ts_col).alias("__src_ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("__s"),
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
            [
                F.lit(None)
                .cast(snapshots.schema[snapshot_order_col].dataType)
                .alias(snapshot_order_col)
            ]
            if snapshot_order_col
            else []
        ),
        F.lit(None).cast(snaps.schema["__s"].dataType).alias("__s"),
        *[F.col(c).alias(f"__p_{c}") for c in target_payload_cols],
    )
    u = snaps.unionByName(tgts)
    if segmented:
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            add_running_last_segmented,
        )

        merged = add_running_last_segmented(
            u, "__s", out_col="__m", keys=tuple(keys), order_col=tag_order
        ).select(
            *keys,
            ts_col,
            "__tag",
            *[F.col(f"__p_{c}").alias(c) for c in target_payload_cols],
            "__m",
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*tag_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        merged = u.select(
            *keys,
            ts_col,
            "__tag",
            *[F.col(f"__p_{c}").alias(c) for c in target_payload_cols],
            F.last("__s", ignorenulls=True).over(w).alias("__m"),
        )
    return (
        merged.filter(F.col("__tag") == 1)
        .select(
            *keys,
            ts_col,
            *target_payload_cols,
            F.col("__m.__src_ts").alias("src_ts_ms"),
            *[F.col(f"__m.{c}").alias(c) for c in value_cols],
        )
    )
