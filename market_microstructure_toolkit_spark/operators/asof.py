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
