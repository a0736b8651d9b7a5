"""Book snapshot readers/writers with the reference's file conventions.

Missing-value convention (SURVEY §1.2, reference ``record.py:70-84``):
- CSV stores blanks (``""``) for missing levels and formats floats
  ``%.10f``; every value is a string.
- Parquet stores real nulls and native doubles; ``ts_ms`` is int64.

The engine computes on doubles ALWAYS; 10-dp formatting happens only at
the CSV boundary (P16) — otherwise golden/hash comparisons break on
representation (SURVEY §4.5).

Scale notes: readers take directories or globs (Spark's splittable file
scan), writers partition by ``exchange_id/symbol`` (and date when a
``ts_ms``-derived date column is requested) so downstream reads prune
partitions (SURVEY §4 "partition recorded data by exchange/symbol/date").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark import schema as S
from market_microstructure_toolkit_spark.functions.microstructure import (
    format_float_10dp,
)


def read_book_csv(
    spark: SparkSession, path: str, depth: int
) -> DataFrame:
    """CSV source (S7, metrics_cli.py:44-50): header row, all-string cells,
    ``""`` -> NULL, then typed casts per the book schema.

    ``try_cast``-style safety: malformed numerics become NULL rather than
    failing the scan (the reference's ``_as_float_or_none``, P17).
    """
    raw = spark.read.option("header", True).csv(path)
    # P18: validate the load-bearing columns up front — optional meta
    # cols (e.g. ``iso``) may be absent, L1 must not be.
    S.require_columns(raw, ["ts_ms", "best_bid", "best_ask", "bid1_price"])
    out = []
    for f in S.book_schema(depth).fields:
        if f.name in raw.columns:
            c = F.nullif(F.col(f.name), F.lit("")).try_cast(f.dataType)
        else:
            # derived frames may omit optional meta cols (e.g. ``iso``)
            c = F.lit(None).cast(f.dataType)
        out.append(c.alias(f.name))
    return raw.select(*out)


def read_book_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet source (S8): schema travels with the file; depth recovered
    from column names (schema.infer_depth) — no data probing."""
    return spark.read.parquet(path)


def write_book_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Parquet sink (S6): native nulls/doubles; optional hive partitioning
    for partition-pruned reads at scale."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_book_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (S5, record.py:92-98): header, ``%.10f`` float formatting,
    NULL -> blank. Formatting is applied ONLY here."""
    out = []
    for f in df.schema.fields:
        if f.dataType.simpleString() == "double":
            out.append(format_float_10dp(F.col(f.name)).alias(f.name))
        else:
            out.append(F.col(f.name))
    df.select(*out).write.mode(mode).option("header", True).option(
        "emptyValue", ""
    ).option("nullValue", "").csv(path)


def write_summary_append(df: DataFrame, path: str) -> None:
    """Summary-append sink (S10, impact_twap_cli.py:51-56): one-row
    summaries accumulate across runs."""
    df.write.mode("append").option("header", True).csv(path)


def write_book_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """ORC sink: same conventions as the parquet sink (native
    nulls/doubles, lossless for the book's types, optional hive
    partitioning). ORC's per-stripe min/max + bloom-filter indexes give
    a warehouse already standardized on ORC the same pushdown story the
    parquet path has; both sinks share one writer surface so the format
    is a config choice, not a code fork."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_book_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source: schema travels with the file, depth recovered from
    column names exactly as the parquet path (schema.infer_depth)."""
    return spark.read.orc(path)
