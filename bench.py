"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query materializes fully via the no-op sink (measures the whole
distributed plan without driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Rotation-invariant bench (round-10 verdict #2): the registry
    # rotation exists for the DRIVER's correctness sample, but letting it
    # reorder bench execution made per-query numbers incomparable across
    # rounds — JVM warm-up migrated to whichever stratum ran first
    # (dedup_simhash read 6.0 s in r10 purely from running ~15th in a
    # cold JVM vs 1.07 s warmed). Pin the bench process to canonical
    # order unless the caller explicitly overrides.
    os.environ.setdefault("SPARK_GRAFT_ROUND", "0")
    # Pin the replay scratch + tape-cache root to the /dev/shm default
    # (round-12 verdict #2a): a shell still carrying the century-sweep
    # SPARK_GRAFT_SCRATCH_DIR override silently moves every streaming
    # replay's checkpoint, parquet scratch sink, AND memoized tape off
    # tmpfs onto disk — the exact signature of r12's streaming-only
    # 1.5-2.2x bench slowdown on untouched files. Recorded benches must
    # be environment-invariant; SPARK_GRAFT_BENCH_SCRATCH_DIR is the
    # explicit escape hatch when a bench genuinely needs custom scratch.
    bench_scratch = os.environ.get("SPARK_GRAFT_BENCH_SCRATCH_DIR")
    if bench_scratch:
        os.environ["SPARK_GRAFT_SCRATCH_DIR"] = bench_scratch
    else:
        os.environ.pop("SPARK_GRAFT_SCRATCH_DIR", None)
    from market_microstructure_toolkit_spark.session import get_spark
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    spark = get_spark("mmt-bench")
    # ERROR by default so no JVM WARN line can interleave with (and
    # corrupt) the single JSON stdout line the driver parses; set
    # SPARK_GRAFT_BENCH_LOGLEVEL=WARN for warning-attribution runs —
    # paired with the per-query [bench] markers below, every WARN in
    # stderr then attributes to the query that planned it.
    spark.sparkContext.setLogLevel(
        os.environ.get("SPARK_GRAFT_BENCH_LOGLEVEL", "ERROR")
    )
    # warm the JVM + parquet footers once
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # Drift canary (round-8 verdict #2b): a fixed, deterministic,
    # data-independent CPU-bound query timed at the start of every
    # recorded bench. Absolute bench numbers on this host drift up to
    # ~1.2x across sessions on identical code (measured: 81 s cold
    # spread, docs/RATIO_r8.md); the canary pins the machine's speed at
    # artifact time so cross-round comparisons can normalize by
    # canary_s instead of arguing about drift. Two runs, second
    # recorded (the first absorbs codegen compilation); ~200M-row
    # whole-stage-codegen hash aggregate, zero I/O, constant size.
    from pyspark.sql import functions as F  # noqa: E402

    canary_s = None
    for _ in range(2):
        tc = time.perf_counter()
        # % 1e6 bounds the ANSI-mode sum far below long overflow
        spark.range(0, 1_000_000_000, 1, 32).select(
            F.sum(F.xxhash64(F.col("id")) % F.lit(1_000_000)).alias("s")
        ).collect()
        canary_s = round(time.perf_counter() - tc, 3)

    # SPARK_GRAFT_BENCH_WARM=1: run each query twice, report the second
    # (steady-state) time. Default stays cold/one-shot — the driver's
    # protocol — but at this scale one-shot numbers are dominated by
    # per-plan analysis + codegen compilation (measured 2-5x inflation;
    # e.g. corpus_curation 10.7s cold vs 4.3s warm), so cross-round
    # per-query comparisons should use the warm mode.
    warm = os.environ.get("SPARK_GRAFT_BENCH_WARM", "") == "1"
    # SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run (smoke/debug only —
    # the driver's per-round artifact always runs the full registry).
    only = {
        s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s
    }
    # Physical-plan audit rides the bench loop (the DataFrames are built
    # here anyway): every batch query's plan is checked for the 100 TB
    # anti-patterns (cartesian, data-sized BNLJ, global window, non-
    # scalar single-partition exchange) and the result lands in a
    # checked-in PLAN_AUDIT artifact. Audit wall-time is tracked
    # separately so `value` stays comparable across rounds; streaming
    # replays are skipped (they execute eagerly; their operators are
    # audited via their batch twins). Disable with
    # SPARK_GRAFT_BENCH_AUDIT=0.
    do_audit = os.environ.get("SPARK_GRAFT_BENCH_AUDIT", "1") == "1"
    audit_fn = None
    if do_audit:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        from plan_audit import audit as audit_fn  # noqa: E402

    timings: dict[str, float] = {}
    cold_timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    audit_flags: dict[str, list[str]] = {}
    n_audited = 0
    audit_wall = 0.0
    t0 = time.perf_counter()
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        print(f"[bench] {name}", file=sys.stderr, flush=True)
        try:
            runs = 2 if warm else 1
            df = None
            for i in range(runs):
                t = time.perf_counter()
                df = qd.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                elapsed = round(time.perf_counter() - t, 3)
                timings[name] = elapsed
                if i == 0:
                    cold_timings[name] = elapsed
            if audit_fn is not None and not name.startswith("streaming_"):
                ta = time.perf_counter()
                flags = audit_fn(name, df)
                audit_wall += time.perf_counter() - ta
                n_audited += 1
                if flags:
                    audit_flags[name] = flags
                    print(
                        f"PLAN AUDIT FLAG {name}: {flags}", file=sys.stderr
                    )
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # zero out the whole benchmark artifact (round-2 lesson: an
            # environment change crashed query 1 and lost all 56 numbers)
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"BENCH ERROR {name}: {errors[name]}", file=sys.stderr)
    total = round(time.perf_counter() - t0, 3)
    # The cross-round comparable: sum of the RECORDED per-query timings
    # (cold mode: the cold runs; warm mode: the second, steady-state runs
    # only). `value` below stays the all-in wall of the whole loop —
    # in warm mode that INCLUDES the cold priming pass, so `value` in a
    # warm artifact is NOT "warm total"; total_query_s is.
    total_query_s = round(sum(timings.values()), 3)

    if do_audit:
        audit_path = os.environ.get(
            "SPARK_GRAFT_PLAN_AUDIT",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "PLAN_AUDIT.json"
            ),
        )
        with open(audit_path, "w") as f:
            json.dump(
                {
                    "audited": n_audited,
                    "flagged": audit_flags,
                    "n_flagged": len(audit_flags),
                    "skipped_streaming": sorted(
                        n for n in timings if n.startswith("streaming_")
                    ),
                    "audit_wall_s": round(audit_wall, 3),
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query timings go to a checked-in detail file: at 134
    # queries the complete dict overflows the driver's fixed-size tail
    # capture (BENCH_r03/r04 "parsed": null — the tail started mid-JSON),
    # so the stdout line must stay small enough to always fit a tail.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    detail = {
        "metric": "total_bench_wall_seconds",
        "value": total,  # all-in wall: in warm mode includes the cold pass
        "total_query_s": total_query_s,  # sum of recorded (warm-only) runs
        "unit": "sec",
        "sf": sf_val,
        "warm": warm,
        "queries": timings,
        "plan_audit_flagged": len(audit_flags),
        "canary_s": canary_s,
    }
    if warm:
        detail["queries_cold"] = cold_timings
    if errors:
        detail["errors"] = errors
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")

    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    out = {
        "metric": "total_bench_wall_seconds",
        "value": total,
        "total_query_s": total_query_s,
        "unit": "sec",
        "queries": slowest,  # 10 slowest only — full dict in detail file
        "n_queries": len(timings),
        "n_errors": len(errors),
        "n_plan_flags": len(audit_flags),
        "detail": os.path.basename(detail_path),
        "sf": sf_val,
        "canary_s": canary_s,
    }
    # the timings line must be the ONLY stdout line and must not be torn
    # by late stderr flushes: drain stderr first, then emit compact JSON
    sys.stderr.flush()
    time.sleep(0.2)
    print(json.dumps(out, separators=(",", ":")), flush=True)
    if errors:  # partial timings above are already printed — fail loudly
        sys.exit(1)


if __name__ == "__main__":
    main()
