"""Noise-immune per-gate cost profile: scheduled jobs / stages / tasks.

Wall-clock on this box stalls up to 15x on individual gates (round-13
measurement environment), so per-invocation FIXED COSTS are profiled by
counting what the scheduler actually ran: for each registry gate, the
constructor + one noop-sink materialization execute under a dedicated
job group, then the driver UI's REST API reports how many jobs, stages
and tasks that group scheduled. A gate whose constructor schedules
probe jobs (count/min/max scans) shows up as extra jobs regardless of
machine speed; a shuffle-width problem shows up as tasks.

Usage: python tools/job_profile.py [--out PATH] [--sf-dir DIR] [query ...]

Second run of each gate in the same process (default) so plan-analysis
and codegen warm-up do not count; --cold profiles the first run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(ui: str, app_id: str, path: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/job_profile.json")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cold", action="store_true", help="profile the first run, not the second")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_ROUND", "0")
    os.environ.pop("SPARK_GRAFT_SCRATCH_DIR", None)

    from market_microstructure_toolkit_spark.session import get_spark
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    spark = get_spark("mmt-job-profile")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    ui = sc.uiWebUrl
    if ui is None:
        # r13 ADVICE: without the UI there is no REST endpoint to read
        # job counts from — fail with a clear message instead of an
        # opaque crash inside _rest
        sys.exit("job_profile needs spark.ui.enabled=true (sc.uiWebUrl is None)")
    app_id = sc.applicationId

    names = args.queries or list(REGISTRY)
    prof: dict[str, dict] = {}
    for name in names:
        qd = REGISTRY[name]
        runs = 1 if args.cold else 2
        for i in range(runs):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t = time.perf_counter()
            try:
                df = qd.spark(spark, args.sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                prof[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
                break
            finally:
                # r13 ADVICE: clear the group even when the gate raises,
                # so later ad-hoc jobs are not misattributed in the UI
                sc.setJobGroup(None, None)
            wall = round(time.perf_counter() - t, 3)
        else:
            jobs = _rest(ui, app_id, "jobs")
            mine = [j for j in jobs if j.get("jobGroup") == group]
            n_stages = sum(len(j.get("stageIds", [])) for j in mine)
            n_tasks = sum(j.get("numTasks", 0) for j in mine)
            prof[name] = {
                "jobs": len(mine),
                "stages": n_stages,
                "tasks": n_tasks,
                "wall_s": wall,
            }
            print(
                f"{name:44s} jobs={len(mine):3d} stages={n_stages:3d} "
                f"tasks={n_tasks:5d} wall={wall:7.2f}",
                file=sys.stderr, flush=True,
            )
    with open(args.out, "w") as f:
        json.dump(prof, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"profiled": len(prof), "out": args.out}))


if __name__ == "__main__":
    main()
