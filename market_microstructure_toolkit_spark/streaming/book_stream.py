"""Structured Streaming tier: live book-snapshot ingestion + streaming
metrics (SURVEY §2.9; reference S9 ``ws_record.py:115-284``).

The reference's streaming layer is an asyncio producer/queue/single-writer
loop: push-based WS updates (or fixed-Hz REST polls) appended in arrival
order to one CSV, backpressure via a bounded queue, sentinel shutdown.
Structured Streaming replaces every piece of that machinery with engine
services: the file/Kafka source replaces the producer, micro-batches +
checkpointing replace queue/backpressure/sentinel, and the sink's
exactly-once file commit protocol replaces the single-writer discipline.

Three surfaces:

- ``read_book_stream`` / ``record_stream`` — the recorder (S3/S5/S6/S9):
  stream in, append out, checkpointed.
- ``windowed_book_metrics`` — event-time tumbling-window aggregates with a
  watermark for late data (the resampled-series view the reference never
  had; its rows are wall-clock arrival-ordered).
- ``stateful_ofi`` — the lag-based W1 OFI as a keyed stateful operator:
  per (exchange_id, symbol) the state is ONE tiny row (previous L1
  quote); each micro-batch sorts its rows in event order, diffs against
  state, and emits per-update OFI. This is the event-indexed semantics of
  ``event_metrics.py:8-10`` (per update, not per wall-clock window) in
  streaming form.

Scale: state size is O(#instruments), not O(rows) — thousands of keys,
each a 6-field row. Shuffle is one hash exchange on the instrument key,
identical to the batch window stage.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from market_microstructure_toolkit_spark import schema as S

if TYPE_CHECKING:
    import pandas as pd


def read_book_stream(
    spark: SparkSession,
    path: str,
    depth: int,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of wide book snapshots (the replay twin of the
    live recorder; a Kafka topic of snapshot JSON drops into the same
    spot via ``readStream.format("kafka")`` + ``from_json``)."""
    reader = (
        spark.readStream.format(fmt)
        .schema(S.book_schema(depth))
    )
    if fmt == "csv":
        reader = reader.option("header", True).option("nullValue", "")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def record_stream(
    df: DataFrame, out_path: str, checkpoint: str, fmt: str = "parquet"
):
    """S9's single-writer sink as a checkpointed streaming write. Returns
    the (not-yet-started) writer so callers pick the trigger."""
    return (
        df.writeStream.format(fmt)
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def with_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Attach a native timestamp column derived from ``ts_ms`` epoch
    millis (the reference keeps only the integer; event-time windows need
    a TimestampType)."""
    return df.withColumn(col, F.timestamp_millis(F.col("ts_ms")))


def windowed_book_metrics(
    stream: DataFrame,
    window: str = "1 second",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Per-instrument tumbling-window L1 metrics with late-data handling.

    Averages/extrema of spread and mid per (instrument, window). The
    watermark bounds state: windows older than max(event time) - watermark
    finalize and evict. All aggregates are built-in partial-aggregating
    functions — streaming state per open window is O(1).
    """
    et = with_event_time(stream)
    spread = F.col("best_ask") - F.col("best_bid")
    mid = (F.col("best_bid") + F.col("best_ask")) / F.lit(2.0)
    return (
        et.withWatermark("ts", watermark)
        .groupBy(*S.PARTITION_KEYS, F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_snapshots"),
            F.avg(mid).alias("avg_mid"),
            F.min(spread).alias("min_spread"),
            F.max(spread).alias("max_spread"),
            F.avg(spread).alias("avg_spread"),
        )
        .select(
            *S.PARTITION_KEYS,
            F.col("w.start").alias("window_start"),
            "n_snapshots", "avg_mid", "min_spread", "max_spread", "avg_spread",
        )
    )


OFI_OUTPUT_SCHEMA = StructType(
    [
        StructField("exchange_id", StringType()),
        StructField("symbol", StringType()),
        StructField("ts_ms", LongType()),
        StructField("raw_nonce", LongType()),
        StructField("ofi_l1", DoubleType()),
    ]
)

#: prev-row L1 quote carried between micro-batches (one per instrument).
OFI_STATE_SCHEMA = StructType(
    [
        StructField("bid1_price", DoubleType()),
        StructField("ask1_price", DoubleType()),
        StructField("bid1_size", DoubleType()),
        StructField("ask1_size", DoubleType()),
    ]
)


def stateful_ofi(stream: DataFrame) -> DataFrame:
    """Strict-mode L1 OFI as a keyed stateful streaming operator.

    ``applyInPandasWithState`` keyed by instrument; state = previous L1
    quote (4 doubles). Rows inside a micro-batch are sorted by
    (ts_ms, raw_nonce) — the file/Kafka source guarantees batch boundaries
    but not intra-batch order. The first update of a key emits NULL
    (reference first-row ``""``), then every update diffs against state.

    The per-batch math is vectorized numpy (shift + where), identical to
    the batch ``ofi_l1_expr(mode='strict')`` semantics (reference
    metrics.py:293-333): any of the 8 inputs NaN -> NaN (which Arrow
    serializes back as NULL); strict price comparisons; ties contribute 0.
    """
    import numpy as np
    import pandas as pd

    l1_cols = ["bid1_price", "ask1_price", "bid1_size", "ask1_size"]

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        frames = [f for f in pdfs if not f.empty]
        if not frames:
            return
        batch = (
            pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
        )
        batch = batch.sort_values(["ts_ms", "raw_nonce"], kind="mergesort")
        cur = batch[l1_cols].to_numpy(dtype="float64")
        prev = np.empty_like(cur)
        prev[1:] = cur[:-1]
        if state.exists:
            prev[0] = [np.nan if v is None else v for v in state.get]
        else:
            prev[0] = np.nan  # first-ever row of this key -> NULL
        bb, ba, bq, aq = cur.T
        pbb, pba, pbq, paq = prev.T
        bid_part = np.where(bb > pbb, bq - pbq, np.where(bb < pbb, -pbq, 0.0))
        ask_part = np.where(ba < pba, aq - paq, np.where(ba > pba, -paq, 0.0))
        ofi = bid_part + ask_part
        ofi[np.isnan(cur).any(axis=1) | np.isnan(prev).any(axis=1)] = np.nan
        state.update(
            tuple(None if np.isnan(v) else float(v) for v in cur[-1])
        )
        yield pd.DataFrame(
            {
                "exchange_id": key[0],
                "symbol": key[1],
                "ts_ms": batch["ts_ms"].values,
                "raw_nonce": batch["raw_nonce"].values,
                "ofi_l1": ofi,
            }
        )

    cols = ["ts_ms", "raw_nonce", "bid1_price", "ask1_price", "bid1_size", "ask1_size"]
    return (
        stream.select(*S.PARTITION_KEYS, *cols)
        .groupBy(*S.PARTITION_KEYS)
        .applyInPandasWithState(
            fn,
            outputStructType=OFI_OUTPUT_SCHEMA,
            stateStructType=OFI_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
