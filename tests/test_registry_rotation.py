"""The driver's independent correctness gate samples the FIRST 50
registry entries; ``plans.queries._rotate_registry`` rotates the
insertion order by round so that sample covers a fresh stratum each
round (round-9 verdict #2). These tests pin the two properties the
rotation must keep: it is a pure reordering (same name->gate mapping),
and consecutive rounds expose different first-50 strata. Run via
subprocess because the rotation happens at import time, keyed off
``SPARK_GRAFT_ROUND`` / the driver's PROGRESS.jsonl heartbeat.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SNIPPET = (
    "import sys, json; sys.path.insert(0, {repo!r}); "
    "import __spark_entry__ as e; "
    "print(json.dumps(list(e.queries().keys())))"
)


def _keys_for_round(rnd: str | None) -> list[str]:
    env = dict(os.environ)
    if rnd is None:
        env.pop("SPARK_GRAFT_ROUND", None)
    else:
        env["SPARK_GRAFT_ROUND"] = rnd
    out = subprocess.run(
        [sys.executable, "-c", _SNIPPET.format(repo=REPO)],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_rotation_is_pure_reordering_and_strata_differ():
    base = _keys_for_round("0")  # historical order
    r10 = _keys_for_round("10")
    r11 = _keys_for_round("11")
    assert set(base) == set(r10) == set(r11)  # nothing added/dropped
    assert len(base) == len(set(base))  # no duplicate names
    # consecutive rounds hand the driver a different first-50 sample
    assert set(r10[:50]) != set(r11[:50])
    # and the rotation is exactly a rotation of the historical order
    off = base.index(r10[0])
    assert r10 == base[off:] + base[:off]


def test_default_round_comes_from_progress_heartbeat():
    """With no env override the rotation keys off the LAST ``round`` in
    PROGRESS.jsonl, so it advances automatically when the driver starts
    a new round — no hardcoded default to forget to bump."""
    progress = os.path.join(REPO, "PROGRESS.jsonl")
    if not os.path.exists(progress):
        import pytest

        pytest.skip("no driver heartbeat in this checkout")
    rnd = 0
    with open(progress) as fh:
        for line in fh:
            if line.strip():
                rnd = int(json.loads(line).get("round", 0)) or rnd
    assert _keys_for_round(None) == _keys_for_round(str(rnd or 10))
