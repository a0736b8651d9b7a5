"""Same-session decade ratio probe: time each query at two sf dirs in
ONE Spark session and report the wall ratio.

Unlike joining two separate bench artifacts (the r7/r8 protocol), both
arms here share a process, JVM warm-up, and machine state, so the ratio
carries no cross-session drift. Each query runs A then B back-to-back.

Usage:
    python tools/decade_ratio.py [--out FILE] DIR_A DIR_B [query ...]

Default query set: the sf0.1->sf1 >3x tail from RATIO_SF1_r8 (round-8
verdict ask #1).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TAIL = [
    "dedup_simhash",
    "doc_token_counts",
    "similarity_lsh_pairs",
    "streaming_vpin_replay",
    "dedup_embedding_nn",
    "trade_realized_spread",
    "orders_late_shipping_priority",
    "dedup_winnow",
    "streaming_trade_signs_replay",
    "streaming_cdc_replay",
    "shipping_priority_top10",
    "book_asof_tolerance",
    "events_json_props",
]


def main() -> int:
    argv = sys.argv[1:]
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i : i + 2]
    dir_a, dir_b = argv[0], argv[1]
    names = argv[2:] or TAIL

    from market_microstructure_toolkit_spark.plans.queries import REGISTRY
    from market_microstructure_toolkit_spark.session import get_spark

    spark = get_spark("decade-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM once so query 1's arm-A time isn't JVM start-up
    spark.read.parquet(f"{dir_a}/lineitem.parquet").count()

    report: dict[str, dict] = {}
    for name in names:
        q = REGISTRY[name].spark
        t0 = time.perf_counter()
        n_a = q(spark, dir_a).count()
        t_a = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_b = q(spark, dir_b).count()
        t_b = time.perf_counter() - t0
        ratio = t_b / t_a if t_a else float("inf")
        report[name] = {
            "a_sec": round(t_a, 2),
            "b_sec": round(t_b, 2),
            "ratio": round(ratio, 2),
            "a_rows": n_a,
            "b_rows": n_b,
        }
        print(
            f"{name:34s} {t_a:7.2f}s -> {t_b:8.2f}s  x{ratio:5.2f}  "
            f"rows {n_a} -> {n_b}",
            flush=True,
        )
    doc = {"dir_a": dir_a, "dir_b": dir_b, "queries": report}
    if out:
        with open(out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"-> {out}")
    else:
        print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
