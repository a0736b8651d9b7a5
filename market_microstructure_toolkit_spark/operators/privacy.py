"""Right-to-be-forgotten (GDPR/CCPA erasure) over an event log.

Extracted from the ``events_gdpr_erasure`` gate query so the scrub and
its audit report are reusable on arbitrary event tables (and unit-
testable against deliberately broken scrubs). Reference parity note:
the reference toolkit has no privacy tier; this is part of the
large-scale training-data pipeline surface.

Scale shape (100 TB log): the deletion-request list is human-scale next
to the log, so it broadcasts; the scrub is ONE broadcast LEFT ANTI join
(no shuffle of the log), the audit re-probes the scrubbed stream with a
broadcast semi join (again map-side). The per-type report aggregations
shuffle only event_type-cardinality rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["erase_users", "erasure_report"]


def erase_users(events: DataFrame, users: DataFrame) -> DataFrame:
    """The scrubbed log: drop every event of every user in ``users``
    (a one-column ``user_id`` frame) via a broadcast LEFT ANTI join."""
    return events.join(
        F.broadcast(users.select("user_id").distinct()), "user_id", "left_anti"
    )


def erasure_report(
    events: DataFrame,
    users: DataFrame,
    remaining: DataFrame | None = None,
) -> DataFrame:
    """Auditable per-event-type erasure report over ``events`` scrubbed
    of ``users``: (event_type, n_before, n_erased, n_after,
    erasure_complete).

    Two failure directions are detected, not assumed:

    - **Leak** (requested user survives): ``erasure_complete`` is
      computed by semi-probing the scrubbed stream against the request
      list — any survivor flips it FALSE.
    - **Over-deletion** (non-requested user dropped): ``n_after`` is
      COUNTED from the scrubbed frame per type, never derived as
      ``n_before − n_erased`` — an over-deleting scrub makes the
      counted value fall short of the arithmetic identity (which the
      gate's DuckDB oracle computes, so the cross-engine hash breaks).

    ``remaining`` defaults to ``erase_users(events, users)``; tests
    inject corrupted scrubs here to pin both detections.
    """
    erase = F.broadcast(users.select("user_id").distinct())
    if remaining is None:
        remaining = erase_users(events, erase)
    leak = remaining.join(erase, "user_id", "left_semi").agg(
        F.count(F.lit(1)).alias("__n_leaked")
    )
    req = F.col("user_id").isNotNull() & F.col("__req_user").isNotNull()
    per_type = (
        events.join(
            F.broadcast(
                erase.select(F.col("user_id").alias("__req_user"))
            ),
            F.col("user_id") == F.col("__req_user"),
            "left",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.sum(req.cast("long")).alias("n_erased"),
        )
    )
    after_type = remaining.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n_after_counted")
    )
    return (
        per_type.join(after_type, "event_type", "left")
        .crossJoin(F.broadcast(leak))
        .select(
            "event_type",
            "n_before",
            "n_erased",
            F.coalesce(F.col("__n_after_counted"), F.lit(0)).alias("n_after"),
            (F.col("__n_leaked") == 0).alias("erasure_complete"),
        )
    )
