"""Single-key race: plain bounded-frame rolling window vs the
chunk+halo segmented form (operators/window_metrics.py::rolling_segmented).

ONE instrument (the worst case — a keyed window puts the whole series in
one task), N synthetic ticks. Prints wall for both paths, the agreement
checksum (sum of quantized rv values + null count — the two paths must
match EXACTLY), and the executor-parallelism evidence.

Usage: python tools/rolling_race.py [n_rows] [window] [n_chunks]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.operators import window_metrics as W
from market_microstructure_toolkit_spark.session import get_spark


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("rolling-race")
    # deterministic synthetic returns: quantized binary fractions so the
    # two paths' sums are comparable exactly, ~2.7% nulls for the gate
    df = (
        spark.range(n)
        .select(
            F.lit("sim").alias("exchange_id"),
            F.lit("S0").alias("symbol"),
            (F.lit(1_700_000_000_000) + F.col("id") * 7).alias("ts_ms"),
            F.col("id").alias("raw_nonce"),
            F.when(
                F.col("id") % 37 != 0,
                ((F.col("id") * 13) % 29).cast("double") / F.lit(8.0),
            ).alias("ret"),
        )
        .repartition(64)
        .persist()
    )
    df.count()

    def checksum(out):
        row = out.agg(
            F.sum("rv").alias("s"),
            F.count("rv").alias("c"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return (row.s, row.c, row.n)

    order = ["ts_ms", "raw_nonce"]
    t0 = time.time()
    plain = W.add_rolling_rv(df, ret_col="ret", window=window, order_col=order)
    cs_plain = checksum(plain)
    t_plain = time.time() - t0

    t0 = time.time()
    seg = W.add_rolling_rv_segmented(
        df, ret_col="ret", window=window, order_col=order, n_chunks=n_chunks
    )
    cs_seg = checksum(seg)
    t_seg = time.time() - t0

    print(f"rows={n} window={window} n_chunks={n_chunks}")
    print(f"plain window : {t_plain:6.1f}s  checksum={cs_plain}")
    print(f"segmented    : {t_seg:6.1f}s  checksum={cs_seg}")
    print(f"match={cs_plain == cs_seg}  speedup={t_plain / t_seg:.2f}x")
    return 0 if cs_plain == cs_seg else 1


if __name__ == "__main__":
    raise SystemExit(main())
