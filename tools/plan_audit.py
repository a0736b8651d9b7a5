"""Full-registry physical-plan audit: the 100 TB smell test.

For every registered batch query, materialize the optimized physical plan
and flag the patterns that stop scaling long before correctness breaks:

- ``CartesianProduct``          — all-pairs blow-up
- ``BroadcastNestedLoopJoin``   — non-equi join fallback (fine only when
                                  the broadcast side is config-sized)
- ``Exchange SinglePartition``  — global funnel (fine only for 1-row
                                  scalar finals)
- ``Window`` with an empty ``partitionBy`` (single-task sort of the
  whole input)

Streaming replay queries are skipped (they execute eagerly; their plans
are audited by their batch twins, which share the same operators).

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SKIP_PREFIXES = ("streaming_",)
# queries whose *output* is one row: a single-partition final exchange is
# the answer's cardinality, not a scale bug
SCALAR_OK = re.compile(r"(quantile|curation|recall|split|mix_report)")


def audit(name: str, df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        # benign form: the broadcast side is a global scalar aggregate
        # (keys=[] -> 1 row) or a literal LocalTableScan (config-sized
        # probe list / query vector) — a map over the big side. Flag
        # only when some BNLJ's broadcast subtree is data-sized.
        lines = plan.splitlines()
        data_sized = False
        for i, ln in enumerate(lines):
            # every BNLJ build side broadcasts via IdentityBroadcastMode;
            # inspect what feeds that exchange
            if "BroadcastExchange IdentityBroadcastMode" not in ln:
                continue
            below = "\n".join(lines[i + 1 : i + 5])
            benign = (
                "keys=[]" in below            # 1-row global aggregate
                or "LocalTableScan" in below  # config-sized literal table
                or "EqualTo(" in below        # key-equality filter (the
                                              # query-vector row)
                or "LessThanOrEqual(" in below  # bounded key range (the
                                                # config-sized centroid /
                                                # probe table)
                or re.search(r"Filter \(\w+#\d+ = 1\)", below)  # top-1 pick
            )
            if not benign:
                data_sized = True
        if data_sized:
            flags.append("BNLJ")
    if not SCALAR_OK.search(name):
        # a single-partition exchange is benign when it feeds a global
        # scalar aggregate (HashAggregate(keys=[]) right below it — the
        # 1-row broadcast-graft pattern); flag the rest
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            below = "\n".join(lines[i + 1 : i + 3])
            # HashAggregate prints "keys=[]", SortAggregate "key=[]" —
            # both are the benign grouped-by-nothing 1-row final
            if "keys=[]" not in below and "key=[]" not in below:
                flags.append("SINGLE_PARTITION")
                break
    # unpartitioned data-sized window. WindowExec's simpleString on this
    # Spark omits an empty partitionSpec entirely, so the global form is
    # TWO lists — "Window [exprs], [order ASC ...]" — while a partitioned
    # window prints three: "Window [exprs], [keys], [order]". Detect the
    # two-list form whose second group is an ordering spec (ASC/DESC);
    # two groups with a plain column list = partitionBy with no ordering
    # (count-over-partition), which distributes fine. Kept alongside: the
    # explicit empty-middle three-list form other Spark versions print
    # ("Window [exprs], [], [order]"). Pinned against real plans in
    # tests/test_properties_and_plans.py::test_plan_audit_detects_global_window.
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\](?!, \[)", plan):
        if re.search(r"ASC|DESC", m.group(1)):
            flags.append("GLOBAL_WINDOW")
            break
    else:
        if re.search(r"Window \[[^\]]*\], \[\], \[[^\]]*\]", plan):
            flags.append("GLOBAL_WINDOW")
    return flags


def main() -> int:
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY
    from market_microstructure_toolkit_spark.session import get_spark

    spark = get_spark("plan-audit")
    names = sys.argv[1:] or [
        n for n in REGISTRY if not n.startswith(SKIP_PREFIXES)
    ]
    flagged = 0
    for name in names:
        try:
            df = REGISTRY[name].spark(spark, "/root/testdata/sf0.001")
            flags = audit(name, df)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} ERROR {type(e).__name__}: {e}")
            flagged += 1
            continue
        if flags:
            flagged += 1
            print(f"{name:36s} {','.join(flags)}")
    print(f"-- audited {len(names)} plans, {flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
