"""Head-to-head throughput race: the reference implementation vs this
repo's Spark engine on the SAME replicated real recording.

BASELINE.md documents that the reference publishes no benchmark numbers,
so this tool MEASURES its single-node throughput directly: the
reference's own metrics pipeline (metrics_cli.py semantics: load rows as
dicts -> compute_row_metrics per row -> rolling RV -> OFI loop -> CSV
with %.10f formatting) is imported from /root/reference/src and timed
against the repo's equivalent Spark pipeline (row-metrics bundle +
rolling RV + OFI + the %.10f CSV sink) on an N-fold replication of the
shipped ETH_bybit_L2_60s.parquet recording (60 rows x 408 cols, depth
100 — replicas shift ts_ms/raw_nonce so the series stays strictly
ordered).

The reference functions are CALLED, never copied. Usage:

    python tools/baseline_race.py [n_copies] [depth]

Prints one JSON line: rows, per-side wall seconds, rows/sec, speedup.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, "/root/reference/src")

REC = "/root/reference/data/ETH_bybit_L2_60s.parquet"


def build_tape(n_copies: int, out: str) -> int:
    """Replicate the recording n_copies times, ts/nonce-shifted."""
    import pandas as pd

    base = pd.read_parquet(REC)
    span = int(base["ts_ms"].max() - base["ts_ms"].min()) + 10_000
    copies = []
    for c in range(n_copies):
        cp = base.copy()
        # ts shift alone keeps the tape strictly ordered; raw_nonce is a
        # string in real recordings and is not an order column here
        cp["ts_ms"] = cp["ts_ms"] + c * span
        copies.append(cp)
    tape = pd.concat(copies, ignore_index=True)
    tape.to_parquet(out, index=False)
    return len(tape)


def run_reference(tape_path: str, depth: int, rv_window: int, out_csv: str) -> float:
    """The reference metrics pipeline, by its own functions."""
    from market_microstructure_toolkit.metrics import (
        compute_row_metrics,
        ofi_l1,
        rolling_realized_variance,
    )
    from market_microstructure_toolkit.metrics_cli import (
        _as_float_or_none,
        _format_float,
        _load_rows,
        _write_csv,
    )

    t0 = time.perf_counter()
    rows = list(_load_rows(Path(tape_path)))
    enriched = []
    for r in rows:
        m = compute_row_metrics(r, depth=depth)
        formatted = {k: _format_float(v) for k, v in m.items()}
        enriched.append({**r, **formatted})
    mids = [_as_float_or_none(r.get("mid")) for r in enriched]
    rv = rolling_realized_variance(mids, window=rv_window)
    ofis = [""]
    for i in range(1, len(rows)):
        val = ofi_l1(rows[i - 1], rows[i])
        ofis.append("" if val is None else f"{float(val):.10f}")
    for i, r in enumerate(enriched):
        r["rv_window"] = rv_window
        r["rv"] = "" if rv[i] is None else f"{float(rv[i]):.10f}"
        r["ofi_l1"] = ofis[i]
    header = list(enriched[0].keys())
    _write_csv(enriched, header, Path(out_csv))
    return time.perf_counter() - t0


def run_spark(spark, tape_path: str, depth: int, rv_window: int, out_dir: str) -> float:
    """The repo's equivalent pipeline on a warm session."""
    from pyspark.sql import functions as F

    from market_microstructure_toolkit_spark.operators.row_metrics import (
        compute_row_metrics,
    )
    from market_microstructure_toolkit_spark.operators.window_metrics import (
        add_log_return,
        add_ofi_l1,
        add_rolling_rv,
    )
    from market_microstructure_toolkit_spark.sources.book_io import (
        write_book_csv,
    )

    from market_microstructure_toolkit_spark.operators.window_metrics import (
        with_narrow_window,
    )
    from market_microstructure_toolkit_spark.partitioning import spread

    t0 = time.perf_counter()
    # the replicated tape is ONE parquet file -> one input split; spread
    # so the expression-heavy per-row stage uses the whole machine (a
    # production recording arrives in many splits — see partitioning.py)
    book = spread(spark.read.parquet(tape_path))
    rm = compute_row_metrics(book, depth=depth)

    def series(narrow):
        s = add_log_return(narrow, price_col="mid", out_col="__ret")
        s = add_rolling_rv(s, ret_col="__ret", window=rv_window, out_col="rv")
        return add_ofi_l1(s, out_col="ofi_l1").drop("__ret")

    # single-instrument windows funnel through one task by nature; run
    # them on a narrow projection and broadcast-graft back so the
    # 400-column rows never shuffle (operators/window_metrics.py)
    out = with_narrow_window(
        rm,
        id_cols=("ts_ms", "raw_nonce"),
        input_cols=(
            "exchange_id",
            "symbol",
            "mid",
            "bid1_price",
            "bid1_size",
            "ask1_price",
            "ask1_size",
        ),
        builder=series,
    )
    write_book_csv(out, out_dir)
    return time.perf_counter() - t0


def main() -> int:
    import tempfile

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    rv_window = 20
    scratch = tempfile.mkdtemp(prefix="baseline_race_")
    tape = f"{scratch}/tape.parquet"
    n_rows = build_tape(n_copies, tape)

    from market_microstructure_toolkit_spark.session import get_spark

    spark = get_spark("baseline-race")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM so the race measures throughput, not startup
    spark.read.parquet(tape).count()
    spark_sec = run_spark(spark, tape, depth, rv_window, f"{scratch}/spark_csv")
    ref_sec = run_reference(tape, depth, rv_window, f"{scratch}/ref.csv")

    print(
        json.dumps(
            {
                "recording": REC,
                "n_rows": n_rows,
                "depth": depth,
                "reference_sec": round(ref_sec, 2),
                "spark_sec": round(spark_sec, 2),
                "reference_rows_per_sec": round(n_rows / ref_sec),
                "spark_rows_per_sec": round(n_rows / spark_sec),
                "speedup": round(ref_sec / spark_sec, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
