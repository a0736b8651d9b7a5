"""Per-gate verification ledger (round-10 verdict #7).

Rounds 8-10 established the registry's multi-scale evidence — driver
rounds, sf1/sf10/sf100 value probes, skew parity — but the coverage
union lived in the judge's head (and one-off shell pipelines). This
tool materializes it: scan every checked-in verification artifact and
emit ONE table with, per registered gate,

- ``driver_rounds``: rounds whose CORRECTNESS_r{N}.json shows the gate
  fully green (rows + schema + hash, no err) under the DRIVER's own
  independent harness;
- ``max_sf``: the largest scale factor at which a builder-side oracle
  sweep (ORACLE_LOCAL / ORACLE_SF1 / ORACLE_SF10 / ORACLE_SF100)
  value-verified the gate (status ok + hash/sample match);
- ``skew``: scale factors of the skewed-twin fixture sweeps
  (SKEW_PARITY artifacts) covering the gate;
- ``century``: whether the gate has sf100 evidence.

Output: ``docs/VERIFICATION_LEDGER.md`` (human table) and
``docs/verification_ledger.json`` (machine-readable; consumed by
``tests/test_verification_ledger.py``, which FAILS when a registered
gate lacks sf1 evidence — the checked-in enforcement that every new
gate earns decade-path evidence before it ships).

Usage: python tools/verification_ledger.py [--repo DIR]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fully_green(rec: dict) -> bool:
    """Driver-gate convention: all three matches true, no error."""
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and rec.get("hash_match")
        and not rec.get("err")
    )


def _oracle_ok(rec: dict) -> bool:
    """Builder-sweep convention: status ok and the value compare
    (full-hash, or sum64+sample for >200k-row results) matched."""
    if rec.get("status") != "ok":
        return False
    if not rec.get("hash_match"):
        return False
    # the sampled hasher additionally records a row-sample compare
    if "sample_match" in rec and not rec.get("sample_match"):
        return False
    return True


def collect(repo: str = REPO) -> dict[str, dict]:
    """Union every verification artifact in *repo* into
    {gate: {driver_rounds: [...], sfs: [...], skew: [...]}}."""
    gates: dict[str, dict] = {}

    def g(name: str) -> dict:
        return gates.setdefault(
            name, {"driver_rounds": [], "sfs": set(), "skew": set()}
        )

    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else -1
        try:
            doc = json.load(open(path))
        except Exception:
            continue
        for name, rec in doc.items():
            if isinstance(rec, dict) and _fully_green(rec):
                g(name)["driver_rounds"].append(rnd)

    for path in sorted(glob.glob(os.path.join(repo, "ORACLE_*_r*.json"))):
        try:
            doc = json.load(open(path))
        except Exception:
            continue
        for sf, recs in (doc.get("sfs") or {}).items():
            skew = sf.endswith("_skew")
            sf_val = float(sf.replace("_skew", "").replace("_", "."))
            for name, rec in recs.items():
                if isinstance(rec, dict) and _oracle_ok(rec):
                    (g(name)["skew"] if skew else g(name)["sfs"]).add(sf_val)

    for path in sorted(glob.glob(os.path.join(repo, "SKEW_PARITY_r*.json"))):
        try:
            doc = json.load(open(path))
        except Exception:
            continue
        for sf, recs in (doc.get("sfs") or {}).items():
            sf_val = float(sf.replace("_skew", ""))
            for name, rec in recs.items():
                if isinstance(rec, dict) and _oracle_ok(rec):
                    g(name)["skew"].add(sf_val)

    for rec in gates.values():
        rec["driver_rounds"] = sorted(set(rec["driver_rounds"]))
        rec["sfs"] = sorted(rec["sfs"])
        rec["skew"] = sorted(rec["skew"])
        rec["max_sf"] = max(rec["sfs"], default=0.0)
    return gates


def _fmt_sf(x: float) -> str:
    return str(int(x)) if x == int(x) else str(x)


def main() -> None:
    repo = REPO
    if "--repo" in sys.argv:
        repo = sys.argv[sys.argv.index("--repo") + 1]
    sys.path.insert(0, repo)
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    os.environ.setdefault("SPARK_GRAFT_ROUND", "0")
    gates = collect(repo)
    registered = list(REGISTRY.keys())

    missing_sf1 = [
        n for n in registered if gates.get(n, {}).get("max_sf", 0.0) < 1
    ]
    never_driver = [
        n for n in registered if not gates.get(n, {}).get("driver_rounds")
    ]

    out_json = {
        "gates": {
            n: gates.get(
                n,
                {"driver_rounds": [], "sfs": [], "skew": [], "max_sf": 0.0},
            )
            for n in registered
        },
        "n_registered": len(registered),
        "missing_sf1": missing_sf1,
        "never_driver_verified": never_driver,
    }
    jpath = os.path.join(repo, "docs", "verification_ledger.json")
    with open(jpath, "w") as f:
        json.dump(out_json, f, indent=1, sort_keys=True)
        f.write("\n")

    lines = [
        "# Verification ledger",
        "",
        "Generated by `tools/verification_ledger.py` — the union of every",
        "checked-in verification artifact, one row per registered gate.",
        "`driver` = rounds the DRIVER's independent gate passed it;",
        "`max SF` = largest scale factor value-verified by a builder",
        "oracle sweep; `skew` = skewed-twin fixture SFs covered.",
        "Regenerate after every sweep; `tests/test_verification_ledger.py`",
        "fails the suite when a registered gate lacks sf1 evidence.",
        "",
        f"- registered gates: **{len(registered)}**",
        f"- missing sf1 evidence: **{len(missing_sf1)}**"
        + (f" — {', '.join(missing_sf1)}" if missing_sf1 else ""),
        f"- never driver-verified: **{len(never_driver)}**"
        + (f" — {', '.join(never_driver)}" if never_driver else ""),
        "",
        "| gate | driver rounds | max SF | skew SFs | sf100 |",
        "|---|---|---|---|---|",
    ]
    for n in registered:
        rec = out_json["gates"][n]
        dr = ",".join(str(r) for r in rec["driver_rounds"]) or "—"
        sk = ",".join(_fmt_sf(s) for s in rec["skew"]) or "—"
        cent = "✓" if 100 in rec["sfs"] else ""
        lines.append(
            f"| {n} | {dr} | {_fmt_sf(rec['max_sf'])} | {sk} | {cent} |"
        )
    mpath = os.path.join(repo, "docs", "VERIFICATION_LEDGER.md")
    with open(mpath, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"ledger: {len(registered)} gates, "
        f"{len(missing_sf1)} missing sf1, "
        f"{len(never_driver)} never driver-verified -> {mpath}"
    )


if __name__ == "__main__":
    main()
