"""Conversion attribution over an event log.

Extracted from the ``events_conversion_attribution`` /
``events_conversion_latency`` gate queries (round-6 verdict #2); their
DuckDB oracles pin this exact code.

Scale shape: ONE shuffle on the user key; the RANGE-frame window's
state is bounded by the lookback horizon, so the plan is identical at
any tape length. The argmin/argmax over the range frame uses the
engine-portable sortable-string encoding ``printf('%020d|%019d', ts,
id)`` (struct-min inside a window is not portable across engines).
Both fields are sized for the FULL non-negative int64 domain (max
9223372036854775807 = 19 digits), so no in-range id can widen the
field and shift the decode substring — the silent-wrong-id hazard a
narrower %010d field had. Negative ts/id are outside the contract
(a '-' breaks the lexicographic ordering); event times and ids are
non-negative in every source this operator serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["touch_attribution"]


def touch_attribution(
    events: DataFrame,
    conv_type: str,
    lookback: int,
    ts_col: str = "ts",
    id_col: str = "event_id",
    user_col: str = "user_id",
    type_col: str = "event_type",
    first: bool = True,
    last: bool = True,
    keep_conv_ts: bool = False,
) -> DataFrame:
    """First-/last-touch attribution: for every conversion event (type
    == ``conv_type``), the earliest and/or latest NON-conversion event
    of the same user within ``lookback`` (in ``ts_col`` units) strictly
    before the conversion. Conversions with an empty lookback window
    attribute to NULL.

    Returns (conversion_event_id, user_id[, first_touch_event_id]
    [, last_touch_event_id][, conv_ts])."""
    tagged = events.select(
        user_col,
        id_col,
        ts_col,
        (F.col(type_col) == F.lit(conv_type)).alias("is_conv"),
    )
    enc = F.when(
        ~F.col("is_conv"),
        F.format_string("%020d|%019d", F.col(ts_col), F.col(id_col)),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col)
        .rangeBetween(-lookback, -1)
    )
    cols = [user_col, id_col, ts_col, "is_conv"]
    proj = [F.col(c) for c in cols]
    if first:
        proj.append(F.min(enc).over(w).alias("ft"))
    if last:
        proj.append(F.max(enc).over(w).alias("lt"))
    windowed = tagged.select(*proj)
    out = [
        F.col(id_col).alias("conversion_event_id"),
        F.col(user_col).alias("user_id"),
    ]
    if first:
        out.append(
            F.substring("ft", 22, 19).cast("long").alias("first_touch_event_id")
        )
    if last:
        out.append(
            F.substring("lt", 22, 19).cast("long").alias("last_touch_event_id")
        )
    if keep_conv_ts:
        out.append(F.col(ts_col).alias("conv_ts"))
    return windowed.filter(F.col("is_conv")).select(*out)
