"""Change-data-capture apply: merge a change stream into a base snapshot.

The incremental-ingest primitive every training-data pipeline needs once
the corpus stops being write-once: upstream emits (key, op, payload)
change rows — upserts ('U') and deletes ('D') — and the next corpus
snapshot is base ⊎ changes with latest-version-wins semantics. This is
the same merge Delta Lake's MERGE INTO / Hudi's copy-on-write compaction
performs, expressed as plain DataFrame algebra so it runs on bare
parquet.

Scale shape: ONE wide shuffle, keyed on the merge key — base and changes
are unioned (map-side, no join), then a single per-key window picks the
highest-version row and drops it if that winner is a delete. A
join-based merge would shuffle BOTH inputs too, but as two exchanges
plus a join; the union form is strictly cheaper and naturally handles
keys present only in the changes (inserts) or only in the base
(untouched rows). Version ties break deterministically on the op column
(deletes win) so replaying the same batch is idempotent. At 100 TB the
win is that the change set is usually tiny relative to base: AQE sizes
the post-union exchange from actual bytes, and if base is bucketed on
the key (partitioning.write_bucketed) the base side's shuffle disappears
entirely on the v2 bucketed-scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["apply_cdc"]


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str] | str,
    op_col: str = "op",
    version_col: str | None = None,
    strict: bool = True,
) -> DataFrame:
    """Return ``base`` with ``changes`` merged in, latest version wins.

    ``changes`` must carry every ``base`` column plus ``op_col``
    ('U' upsert / 'D' delete) and, optionally, ``version_col`` — a
    monotonically increasing change ordinal (commit LSN, batch id).
    Without ``version_col`` every change outranks the base row (single
    change batch). With it, the per-key winner is the row with the
    highest (version, is_change) ordering; a delete that wins removes
    the key. Contract: (key, version) identifies ONE change — two
    same-version upserts with different payloads have no defined winner
    (in this or any engine; the window tie is plan-order).

    Guard rails (both were silent-wrong before): a change row with a
    NULL version RAISES at execution time (NULL sorts last under desc,
    so the change would silently lose to the base); and a change whose
    version equals the base's synthetic version 0 wins deterministically
    via the change-beats-base tiebreak rather than by plan order.

    ``strict`` (default on) additionally DETECTS the out-of-contract
    batch instead of letting plan order pick a winner: with a
    ``version_col``, two upserts sharing (key, version) raise at
    execution time (even equal payloads — the contract is that (key,
    version) identifies one change). Cost: one extra keyed window over
    the CHANGES side only (tiny next to base in any incremental merge);
    pass ``strict=False`` when the producer already guarantees unique
    change ordinals.
    """
    kcols = [keys] if isinstance(keys, str) else list(keys)
    data_cols = [c for c in base.columns]
    ver = (
        F.when(
            F.col(version_col).isNull(),
            F.raise_error(
                F.lit(
                    f"apply_cdc: NULL {version_col} in changes — the row "
                    "would silently lose every version comparison; emit "
                    "an explicit change ordinal instead"
                )
            ).cast("long"),
        ).otherwise(F.col(version_col).cast("long"))
        if version_col is not None
        else F.lit(1).cast("long")
    )
    tagged_base = base.select(
        *data_cols,
        F.lit(0).alias("__ver"),
        F.lit(0).alias("__chg"),
        F.lit("U").alias("__op"),
    )
    # normalize ops: anything that isn't a delete IS an upsert ('I'nsert,
    # 'U'pdate, 'M'erge — producers differ); without this, an op code
    # sorting before 'D' would silently win the equal-version tie that
    # deletes must win
    tagged_chg = changes.select(
        *data_cols,
        ver.alias("__ver"),
        F.lit(1).alias("__chg"),
        F.when(F.col(op_col) == "D", F.lit("D")).otherwise(F.lit("U")).alias(
            "__op"
        ),
    )
    if strict and version_col is not None:
        wdup = Window.partitionBy(*kcols, "__ver", "__op")
        tagged_chg = (
            tagged_chg.withColumn("__dup", F.count(F.lit(1)).over(wdup))
            .withColumn(
                "__op",
                F.when(
                    (F.col("__dup") > 1) & (F.col("__op") == "U"),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "apply_cdc: multiple upserts share one "
                                f"(key, {version_col}) — no defined winner; "
                                "ill-formed change batch (version "
                            ),
                            F.col("__ver").cast("string"),
                            F.lit(")"),
                        )
                    ).cast("string"),
                ).otherwise(F.col("__op")),
            )
            .drop("__dup")
        )
    unioned = tagged_base.unionByName(tagged_chg)
    # tie order at equal version: changes beat the base (__chg desc),
    # then deletes beat upserts (__op asc) -> delete wins the tie,
    # making same-batch replay idempotent
    w = Window.partitionBy(*kcols).orderBy(
        F.col("__ver").desc(), F.col("__chg").desc(), F.col("__op").asc()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("__op") != "D"))
        .select(*data_cols)
    )
