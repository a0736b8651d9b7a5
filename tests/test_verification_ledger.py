"""Ledger enforcement (round-10 verdict #7): every registered gate must
carry sf1 value-oracle evidence in a checked-in artifact, and the
checked-in ledger must be regenerable from those artifacts. This turns
the coverage-union computation the judge did by hand in round 10 into a
maintained, test-enforced artifact — a new gate that ships without an
sf1 sweep fails the suite, not a future audit.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_keys() -> list[str]:
    # subprocess so the registry import is rotation-independent and does
    # not pollute this process (mirrors tests/test_registry_rotation.py)
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys, json; sys.path.insert(0, %r); "
            "import __spark_entry__ as e; "
            "print(json.dumps(list(e.queries().keys())))" % REPO,
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_ROUND": "0"},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_every_gate_has_sf1_evidence():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from verification_ledger import collect

    gates = collect(REPO)
    missing = [
        n
        for n in _registry_keys()
        if gates.get(n, {}).get("max_sf", 0.0) < 1
    ]
    assert missing == [], (
        f"{len(missing)} registered gate(s) lack sf1 value-oracle "
        f"evidence: {missing} — run "
        "`python tools/check_oracle.py --artifact ORACLE_SF1_r<N>.json "
        "testdata_sf1 <gate>` and commit the artifact"
    )


def test_checked_in_ledger_is_current():
    """The committed docs/verification_ledger.json must cover every
    registered gate (regeneration is cheap; staleness silently hides
    coverage gaps)."""
    path = os.path.join(REPO, "docs", "verification_ledger.json")
    assert os.path.exists(path), "run python tools/verification_ledger.py"
    doc = json.load(open(path))
    missing = [n for n in _registry_keys() if n not in doc["gates"]]
    assert missing == [], (
        f"ledger missing gates {missing} — regenerate with "
        "python tools/verification_ledger.py"
    )


def test_ledger_not_older_than_newest_correctness_artifact():
    """Round-11 verdict #3 (wrong-list item): the committed ledger went
    stale because CORRECTNESS_r11.json landed after generation. Pin the
    invariant structurally: every driver round with a checked-in
    CORRECTNESS artifact must be reflected in the ledger's
    driver_rounds union — if a round's artifact exists but no gate
    credits that round, the ledger predates it and needs a regen."""
    import glob
    import re

    with open(os.path.join(REPO, "docs", "verification_ledger.json")) as f:
        ledger = json.load(f)
    gates = ledger["gates"] if "gates" in ledger else ledger
    credited = set()
    for rec in gates.values():
        credited.update(rec.get("driver_rounds", []))
    on_disk = set()
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", p)
        with open(p) as f:
            art = json.load(f)
        any_green = any(
            isinstance(v, dict)
            and v.get("rows_match")
            and v.get("schema_match")
            and v.get("hash_match")
            for v in art.values()
        )
        if m and any_green:
            on_disk.add(int(m.group(1)))
    stale = on_disk - set(map(int, credited))
    assert stale == set(), (
        f"driver round(s) {sorted(stale)} have CORRECTNESS artifacts on "
        "disk but are not credited in docs/verification_ledger.json — "
        "regenerate with `python tools/verification_ledger.py` and "
        "commit"
    )
