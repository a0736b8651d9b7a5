"""Join two bench detail artifacts and emit the per-query wall ratio
table (markdown) — the round-6 verdict's "cold sf1/sf0.1 ratio table in
SCALE_NOTES flagging anything >3x".

Usage: python tools/ratio_report.py BASE_DETAIL.json BIG_DETAIL.json [threshold]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    base = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    bq, gq = base["queries"], big["queries"]
    rows = []
    for name in bq:
        if name not in gq:
            continue
        r = gq[name] / bq[name] if bq[name] > 0 else float("inf")
        rows.append((r, name, bq[name], gq[name]))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > thresh]
    print(
        f"| query | sf{base['sf']} | sf{big['sf']} | ratio |\n"
        "|---|---|---|---|"
    )
    for r, name, b, g in rows[:25]:
        mark = f" **>{thresh:g}x**" if r > thresh else ""
        print(f"| {name} | {b:.2f}s | {g:.2f}s | {r:.1f}x{mark} |")
    import statistics

    ratios = [r for r, *_ in rows]
    print(
        f"\n{len(rows)} queries; median ratio "
        f"{statistics.median(ratios):.2f}x, mean {statistics.mean(ratios):.2f}x, "
        f"{len(flagged)} above {thresh}x"
    )
    totb, totg = sum(bq[n] for _, n, *_ in rows), sum(gq[n] for _, n, *_ in rows)
    print(f"total wall (shared queries): {totb:.1f}s -> {totg:.1f}s "
          f"({totg / totb:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
