"""Capture .explain("formatted") for named registry queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan-diff
evidence (guide §1: record plan shape before and after every change).

Usage: python tools/capture_plans.py <suffix> <query> [query ...]
       SPARK_GRAFT_PLAN_TAG=r13 (default) picks the output dir.

Note: gates that execute eagerly during construction (streaming replays,
driver-side sim schedules) run their jobs here; the captured plan is the
RETURNED DataFrame's — the exact frame the bench's noop sink times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r13")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from market_microstructure_toolkit_spark.plans.queries import REGISTRY
    from market_microstructure_toolkit_spark.session import get_spark

    spark = get_spark("mmt-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        qd = REGISTRY[name]
        try:
            df = qd.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 - record the failure, move on
            plan = f"CAPTURE ERROR: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
            f.write("\n")
        print(f"[plan] {name} -> {path}", flush=True)


if __name__ == "__main__":
    main()
