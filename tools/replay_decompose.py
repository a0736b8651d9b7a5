"""Per-batch decomposition of streaming replay gates (round-9 verdict
asks #3 and #6).

Runs the named replay gates at one or more sf dirs in ONE Spark session
and attributes each gate's wall time to its micro-batches using the
StreamingQueryProgress records that ``replay_to_parquet`` now exposes
(``plans/base.py::LAST_PROGRESS``): batch count, per-batch input rows,
``triggerExecution`` duration, ``addBatch`` duration, and state-store
row totals. This answers questions like "is streaming_cdc_replay's
6.35x decade ratio batch-count growth or per-batch state throughput?"
with a measurement instead of a hypothesis.

Usage:
    python tools/replay_decompose.py [--out FILE] DIR [DIR ...] \
        [--queries name,name,...]

Default queries: streaming_cdc_replay, streaming_vpin_replay,
streaming_vpin_skewed_replay (the skew-stress twin).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT = [
    "streaming_cdc_replay",
    "streaming_vpin_replay",
    "streaming_vpin_skewed_replay",
]


def main() -> int:
    argv = sys.argv[1:]
    out = None
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i : i + 2]
    names = DEFAULT
    if "--queries" in argv:
        i = argv.index("--queries")
        names = argv[i + 1].split(",")
        del argv[i : i + 2]
    dirs = argv

    from market_microstructure_toolkit_spark.plans import base as B
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY
    from market_microstructure_toolkit_spark.session import get_spark

    spark = get_spark("replay-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {}
    for d in dirs:
        spark.read.parquet(f"{d}/documents.parquet").count()  # warm
        for name in names:
            t0 = time.time()
            n_out = REGISTRY[name].spark(spark, d).count()
            wall = time.time() - t0
            batches = []
            for p in B.LAST_PROGRESS:
                dur = p.get("durationMs", {})
                st = p.get("stateOperators") or [{}]
                batches.append(
                    {
                        "batchId": p.get("batchId"),
                        "inputRows": p.get("numInputRows"),
                        "triggerMs": dur.get("triggerExecution"),
                        "addBatchMs": dur.get("addBatch"),
                        "stateRowsTotal": st[0].get("numRowsTotal"),
                        "stateMemUsedBytes": st[0].get("memoryUsedBytes"),
                    }
                )
            trig = sum(b["triggerMs"] or 0 for b in batches) / 1000.0
            rec = {
                "wall_s": round(wall, 2),
                "output_rows": n_out,
                "n_batches": len(batches),
                "sum_trigger_s": round(trig, 2),
                "non_trigger_s": round(wall - trig, 2),
                "batches": batches,
            }
            report.setdefault(name, {})[d] = rec
            print(
                f"{name:34s} {d}: wall {wall:7.1f}s  batches "
                f"{len(batches):3d}  trigger-sum {trig:7.1f}s  "
                f"out {n_out}"
            )
            sys.stdout.flush()
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"-> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
