"""Median-of-N cold-bench protocol (round-8 verdict #1): run bench.py N
times in FRESH processes (true cold runs — JVM, codegen, page cache all
re-primed per run), collect the per-query detail files, and write one
median artifact. Optionally interleave a plants-off A/B twin
(SPARK_GRAFT_PLANTS=0) run-for-run, so the planted-fixture cost and
machine variance decompose from one session:

    python tools/bench_median.py --runs 3 --out BENCH_MEDIAN_r8.json \
        [--ab-plants] [--sf-dir /root/testdata/sf0.1] [--warm]

With --ab-plants the runs alternate ON,OFF,ON,OFF,... (2N runs total),
so slow machine phases hit both arms equally; the artifact carries
`queries` (median ON), `queries_plants_off` (median OFF), and the
per-query plant cost `delta = on - off`.

Median, not mean: one GC/compile stall in one run must not move the
recorded number (identical r7 cold runs spanned 260.8-292.8 s).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(
    plants_on: bool, sf_dir: str, warm: bool, tag: str, repo: str = REPO
) -> dict:
    detail = os.path.join(
        tempfile.gettempdir(), f"bench_detail_{tag}_{os.getpid()}.json"
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_DETAIL"] = detail
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_PLANTS"] = "1" if plants_on else "0"
    # plan audit rides every bench pass; skip it here (measured
    # separately by the recorded per-round bench) to keep runs short
    env["SPARK_GRAFT_BENCH_AUDIT"] = "0"
    if warm:
        env["SPARK_GRAFT_BENCH_WARM"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"bench run {tag} failed rc={proc.returncode}")
    with open(detail) as f:
        d = json.load(f)
    os.unlink(detail)
    print(
        f"[median] run {tag} plants={'on' if plants_on else 'off'} "
        f"total_query_s={d['total_query_s']}",
        file=sys.stderr,
        flush=True,
    )
    return d


def med(per_run: list[dict], q: str) -> float:
    return round(statistics.median(r["queries"][q] for r in per_run), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="BENCH_MEDIAN.json")
    ap.add_argument("--ab-plants", action="store_true")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--warm", action="store_true")
    ap.add_argument(
        "--ab-repo",
        default=None,
        help="path to a SECOND checkout of the repo (e.g. a git-archive "
        "export of an older commit); runs its bench.py as the "
        "interleaved B arm — the missing round-over-round CODE control "
        "(round-8 verdict #2a). Totals are additionally reported over "
        "the SHARED query set, since registries differ across rounds.",
    )
    args = ap.parse_args()

    on_runs: list[dict] = []
    off_runs: list[dict] = []
    for i in range(args.runs):
        on_runs.append(one_run(True, args.sf_dir, args.warm, f"on{i}"))
        if args.ab_plants:
            off_runs.append(one_run(False, args.sf_dir, args.warm, f"off{i}"))
        if args.ab_repo:
            off_runs.append(
                one_run(True, args.sf_dir, args.warm, f"b{i}", repo=args.ab_repo)
            )

    qs = sorted(on_runs[0]["queries"])
    out = {
        "metric": "median_cold_query_seconds" if not args.warm else "median_warm_query_seconds",
        "runs": args.runs,
        "sf": on_runs[0]["sf"],
        "warm": args.warm,
        "protocol": "median over fresh-process runs"
        + (", interleaved plants on/off A/B" if args.ab_plants else "")
        + (
            f", interleaved code A/B vs {args.ab_repo}" if args.ab_repo else ""
        ),
        "total_query_s_runs": [r["total_query_s"] for r in on_runs],
        "total_query_s": round(
            statistics.median(r["total_query_s"] for r in on_runs), 3
        ),
        "queries": {q: med(on_runs, q) for q in qs},
    }
    if off_runs:
        qs_off = sorted(off_runs[0]["queries"])
        out["total_query_s_runs_plants_off"] = [
            r["total_query_s"] for r in off_runs
        ]
        out["total_query_s_plants_off"] = round(
            statistics.median(r["total_query_s"] for r in off_runs), 3
        )
        out["queries_plants_off"] = {q: med(off_runs, q) for q in qs_off}
        out["plants_delta_s"] = {
            q: round(out["queries"][q] - out["queries_plants_off"][q], 3)
            for q in qs
            if q in out["queries_plants_off"]
        }
        out["plants_delta_total_s"] = round(
            out["total_query_s"] - out["total_query_s_plants_off"], 3
        )
        # registries differ across rounds: the comparable total is over
        # the SHARED query set only
        shared = sorted(set(qs) & set(qs_off))
        out["n_shared_queries"] = len(shared)
        out["total_query_s_shared_a"] = round(
            sum(out["queries"][q] for q in shared), 3
        )
        out["total_query_s_shared_b"] = round(
            sum(out["queries_plants_off"][q] for q in shared), 3
        )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({k: out[k] for k in ("total_query_s", "total_query_s_runs") }))


if __name__ == "__main__":
    main()
