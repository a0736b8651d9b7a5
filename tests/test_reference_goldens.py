"""End-to-end parity against the reference's SHIPPED golden outputs.

The reference repo ships the full output of its `mmt-metrics` and
`mmt-event-metrics` CLIs on real exchange recordings
(`/root/reference/data/*_metrics.csv`, `*_evtmetrics_w20.csv`). Running
our Spark operators on the same input recordings and matching those
files row-for-row is the strongest whole-pipeline parity evidence we
can produce — it covers P2/P3/P4 (row metrics) and P5/P7/W2/W4/W5
(event metrics) on live data with nulls, crossed ticks, and duplicate
timestamps, not synthetic fixtures.

Golden files are full-precision pandas ``to_csv`` output
(event_metrics_cli.py:80 — no float_format), so comparisons use a
1e-9 relative tolerance.
"""

from __future__ import annotations

import math
import os

import pytest

REF = "/root/reference/data"
# (input, golden, K): K is the reference CLI's required top-K depth arg
# (metrics_cli.py:96) the shipped golden was generated with — recovered
# by matching imbalance_k (ETH: full depth 100; BTC demo: top-10).
ROW_CASES = [
    ("ETHUSDT_swap_30s.parquet", "ETHUSDT_swap_30s_metrics.csv", 100),
    ("BTCUSDT_swap_demo_10s.parquet", "BTCUSDT_swap_demo_10s_metrics.csv", 10),
]
# CSV-source cases exercise S7 (blank->NULL + try_cast ingest) on the
# same golden pipeline
CSV_ROW_CASES = [
    ("BTCUSDT_swap_demo_20s.csv", "BTCUSDT_swap_demo_20s_metrics.csv", 10, 100),
    (
        "ws_bybit_ETHUSDTUSDT_d5_5s_5hz.csv",
        "ws_bybit_ETHUSDTUSDT_d5_5s_5hz_metrics.csv",
        5,
        5,
    ),
]


def _close(a, b, tol=1e-9) -> bool:
    if a is None or (isinstance(a, float) and math.isnan(a)):
        return b is None or (isinstance(b, float) and math.isnan(b))
    if b is None or (isinstance(b, float) and math.isnan(b)):
        return False
    return math.isclose(a, b, rel_tol=tol, abs_tol=tol)


@pytest.mark.parametrize("inp,golden,depth", ROW_CASES)
def test_row_metrics_match_reference_shipped_outputs(spark, inp, golden, depth):
    if not (os.path.exists(f"{REF}/{inp}") and os.path.exists(f"{REF}/{golden}")):
        pytest.skip("reference data not available")
    import pandas as pd

    from market_microstructure_toolkit_spark.operators.row_metrics import (
        compute_row_metrics,
    )
    from market_microstructure_toolkit_spark.sources.book_io import (
        read_book_parquet,
    )

    book = read_book_parquet(spark, f"{REF}/{inp}")
    ours = (
        compute_row_metrics(book, depth=depth)
        .select("ts_ms", "spread", "mid", "imbalance_l1", "imbalance_k")
        .toPandas()
        .sort_values("ts_ms")
        .reset_index(drop=True)
    )
    ref = (
        pd.read_csv(f"{REF}/{golden}")[
            ["ts_ms", "spread", "mid", "imbalance_l1", "imbalance_k"]
        ]
        .sort_values("ts_ms")
        .reset_index(drop=True)
    )
    assert len(ours) == len(ref)
    for col in ("spread", "mid", "imbalance_l1", "imbalance_k"):
        for i, (a, b) in enumerate(zip(ours[col], ref[col])):
            a = None if pd.isna(a) else float(a)
            b = None if pd.isna(b) else float(b)
            assert _close(a, b), f"{golden} row {i} col {col}: {a} != {b}"


@pytest.mark.parametrize("inp,golden,k,file_depth", CSV_ROW_CASES)
def test_row_metrics_match_goldens_via_csv_source(spark, inp, golden, k, file_depth):
    if not (os.path.exists(f"{REF}/{inp}") and os.path.exists(f"{REF}/{golden}")):
        pytest.skip("reference data not available")
    import pandas as pd

    from market_microstructure_toolkit_spark.operators.row_metrics import (
        compute_row_metrics,
    )
    from market_microstructure_toolkit_spark.sources.book_io import (
        read_book_csv,
    )

    book = read_book_csv(spark, f"{REF}/{inp}", file_depth)
    ours = (
        compute_row_metrics(book, depth=k)
        .select("ts_ms", "spread", "mid", "imbalance_l1", "imbalance_k")
        .toPandas()
        .sort_values("ts_ms")
        .reset_index(drop=True)
    )
    ref = (
        pd.read_csv(f"{REF}/{golden}")[
            ["ts_ms", "spread", "mid", "imbalance_l1", "imbalance_k"]
        ]
        .sort_values("ts_ms")
        .reset_index(drop=True)
    )
    assert len(ours) == len(ref)
    for col in ("spread", "mid", "imbalance_l1", "imbalance_k"):
        for i, (a, b) in enumerate(zip(ours[col], ref[col])):
            a = None if pd.isna(a) else float(a)
            b = None if pd.isna(b) else float(b)
            assert _close(a, b), f"{golden} row {i} col {col}: {a} != {b}"


def test_event_metrics_match_reference_shipped_w20(spark):
    inp = f"{REF}/ws_bybit_ETHUSDTUSDT_d5_5s_5hz.csv"
    golden = f"{REF}/ws_bybit_ETHUSDTUSDT_d5_5s_5hz_evtmetrics_w20.csv"
    if not (os.path.exists(inp) and os.path.exists(golden)):
        pytest.skip("reference data not available")
    import pandas as pd

    from market_microstructure_toolkit_spark.operators.row_metrics import (
        compute_event_time_metrics,
    )

    # The recording has duplicate ts_ms rows whose relative ORDER defines
    # ofi/returns; preserve file order with an explicit sequence column
    # (the reference iterates the frame in file order).
    raw = pd.read_csv(inp)
    raw["raw_nonce"] = range(len(raw))
    df = spark.createDataFrame(raw)
    ours = (
        compute_event_time_metrics(df, rv_window=20, order_col="raw_nonce")
        .select(
            "raw_nonce", "mid", "spread_bps", "microprice", "ofi_l1",
            "ret_mid", "rv_event_20",
        )
        .toPandas()
        .sort_values("raw_nonce")
        .reset_index(drop=True)
    )
    ref = pd.read_csv(golden)
    assert len(ours) == len(ref)
    for col in ("mid", "spread_bps", "microprice", "ofi_l1", "ret_mid",
                "rv_event_20"):
        for i, (a, b) in enumerate(zip(ours[col], ref[col])):
            a = None if pd.isna(a) else float(a)
            b = None if pd.isna(b) else float(b)
            assert _close(a, b), f"evtmetrics row {i} col {col}: {a} != {b}"
