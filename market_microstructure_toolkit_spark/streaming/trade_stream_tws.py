"""transformWithState ports of the keyed stateful trade operators.

Spark 4.x's ``transformWithStateInPandas`` removes the one-
``applyInPandasWithState``-per-stream limit that forced the fused
sign+volume-clock operator in ``trade_stream.py`` (see
``stateful_signed_buckets``): with the new API the Lee-Ready tick-rule
state and the VPIN volume clock are two INDEPENDENT operators chained in
one streaming plan, each with its own RocksDB-backed state store (and
optional state TTL via ``getValueState(..., ttlDurationMs=...)``).

ENVIRONMENT CONSTRAINT: the transformWithState Python driver worker
imports ``google.protobuf`` (state-server wire protocol,
``pyspark/sql/streaming/proto/StateMessage_pb2.py``), which is not
installed in this container and cannot be added (no network, no pip).
Every entry point therefore guards with :func:`tws_available` and raises
a clear error instead of crashing the JVM-side pre-init runner. The
un-fused semantics are STILL exercised end-to-end in this environment by
the two-query handoff replay (``streaming_vpin_two_stage_replay`` gate),
which chains the two single-state ``applyInPandasWithState`` operators
through an intermediate sink — the production pattern when operators
live in separate jobs/topics. On a deployment with protobuf, the
``tests/test_trades.py`` tws tests un-skip and pin sign/bucket parity
of this module against the fused operator.

Semantics are exactly ``stateful_lee_ready`` followed by
``stateful_volume_buckets`` (same state tuples, same vectorized numpy
per batch-group). The sign rule is the public-literature standard —
Lee & Ready (1991), "Inferring Trade Direction from Intraday Data",
Journal of Finance 46(2): quote rule against the prevailing mid,
tick-rule fallback at the midpoint; the reference repo itself has no
trades module (this is an extension).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame

from market_microstructure_toolkit_spark.streaming.trade_stream import (
    BUCKETED_OUTPUT_SCHEMA,
    TRADE_SIGNS_OUTPUT_SCHEMA,
)

if TYPE_CHECKING:
    import pandas as pd

__all__ = [
    "tws_available",
    "LeeReadyProcessor",
    "VolumeBucketProcessor",
    "tws_lee_ready",
    "tws_volume_buckets",
    "tws_signed_buckets",
]

#: SparkSession conf required by every transformWithState query — the
#: default HDFS-backed store does not implement the new operator's
#: schema-evolution contract.
ROCKSDB_CONF = (
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider",
)


def tws_available() -> bool:
    """True when the transformWithState Python worker can start here
    (its wire protocol needs google.protobuf)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _require_tws() -> None:
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf for its "
            "state-server protocol; it is not installed in this "
            "environment. Use streaming.trade_stream (fused operator) or "
            "the two-query handoff pattern instead."
        )


def _lazy_processors():
    """Define the StatefulProcessor subclasses lazily: importing
    pyspark.sql.streaming.stateful_processor is cheap, but keeping the
    class bodies here lets the module import cleanly everywhere while
    the guard stays at call time."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LeeReadyProcessor(StatefulProcessor):
        """Per-instrument Lee-Ready with tick-rule lookback carried in a
        two-scalar value state — the un-fused twin of
        ``trade_stream.stateful_lee_ready``."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "lee_ready", "last_price double, tick_sign int"
            )

        def close(self) -> None:
            pass

        def handleInputRows(
            self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
        ) -> Iterator["pd.DataFrame"]:
            import numpy as np
            import pandas as pd

            frames = [f for f in rows if len(f)]
            if not frames:
                return
            df = pd.concat(frames, ignore_index=True).sort_values(
                ["ts_ms", "raw_nonce"], kind="mergesort"
            )
            prior = self._st.get()
            last_price, tick_sign = prior if prior else (np.nan, 0)
            price = df["price"].to_numpy(dtype=np.float64)
            mid = df["mid"].to_numpy(dtype=np.float64)
            prev = np.concatenate(([last_price], price[:-1]))
            with np.errstate(invalid="ignore"):
                raw = np.where(
                    price > prev, 1, np.where(price < prev, -1, 0)
                )
            raw[np.isnan(prev)] = 0
            idx = np.arange(len(raw))
            nz = np.where(raw != 0, idx, -1)
            carry_idx = np.maximum.accumulate(nz)
            carried = np.where(
                carry_idx >= 0, raw[np.maximum(carry_idx, 0)], tick_sign
            )
            side = np.where(
                mid < price, 1, np.where(price < mid, -1, carried)
            )
            self._st.update((float(price[-1]), int(carried[-1])))
            yield df.assign(side=side.astype("int32"))[
                [
                    "exchange_id",
                    "symbol",
                    "ts_ms",
                    "raw_nonce",
                    "mid",
                    "price",
                    "qty",
                    "side",
                ]
            ]

    class VolumeBucketProcessor(StatefulProcessor):
        """Per-instrument VPIN volume clock in a one-scalar value state
        — the un-fused twin of ``trade_stream.stateful_volume_buckets``.
        ``bucket_volume`` is bound at construction."""

        def __init__(self, bucket_volume: float) -> None:
            self._bucket_volume = float(bucket_volume)

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("vol_clock", "cum_vol double")

        def close(self) -> None:
            pass

        def handleInputRows(
            self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: Any
        ) -> Iterator["pd.DataFrame"]:
            import numpy as np
            import pandas as pd

            frames = [f for f in rows if len(f)]
            if not frames:
                return
            df = pd.concat(frames, ignore_index=True).sort_values(
                ["ts_ms", "raw_nonce"], kind="mergesort"
            )
            prior = self._st.get()
            cum0 = prior[0] if prior else 0.0
            qty = df["qty"].to_numpy(dtype=np.float64)
            pre = cum0 + np.cumsum(qty) - qty
            bucket = np.floor(pre / self._bucket_volume).astype("int64")
            self._st.update((float(cum0 + qty.sum()),))
            yield df.assign(bucket=bucket)[
                [
                    "exchange_id",
                    "symbol",
                    "ts_ms",
                    "raw_nonce",
                    "mid",
                    "price",
                    "qty",
                    "side",
                    "bucket",
                ]
            ]

    return LeeReadyProcessor, VolumeBucketProcessor


def __getattr__(name: str):  # module-level lazy class access
    if name in ("LeeReadyProcessor", "VolumeBucketProcessor"):
        lr, vb = _lazy_processors()
        return {"LeeReadyProcessor": lr, "VolumeBucketProcessor": vb}[name]
    raise AttributeError(name)


def tws_lee_ready(stream: DataFrame) -> DataFrame:
    """``stateful_lee_ready`` on transformWithState."""
    _require_tws()
    lr, _ = _lazy_processors()
    return stream.groupBy("exchange_id", "symbol").transformWithStateInPandas(
        lr(),
        outputStructType=TRADE_SIGNS_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def tws_volume_buckets(classified: DataFrame, bucket_volume: float) -> DataFrame:
    """``stateful_volume_buckets`` on transformWithState."""
    _require_tws()
    _, vb = _lazy_processors()
    return classified.groupBy(
        "exchange_id", "symbol"
    ).transformWithStateInPandas(
        vb(bucket_volume),
        outputStructType=BUCKETED_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def tws_signed_buckets(stream: DataFrame, bucket_volume: float) -> DataFrame:
    """The un-fused chain the old API could not express: TWO stateful
    operators in ONE streaming plan (sign state, then volume-clock
    state), each with its own store — no merged state tuple."""
    return tws_volume_buckets(tws_lee_ready(stream), bucket_volume)
