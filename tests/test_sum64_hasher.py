"""Pin the strength of the sum64 fast oracle hasher (round-8 verdict #4).

The sf10 value probes hash 10M-row results with ``canon_hash_fast``
instead of the per-cell repr canon. These tests make the "sf10
hash-exact" claim auditable: single-cell corruptions of a frame larger
than the FAST_ROWS dispatch threshold MUST move the hash, row order
MUST NOT, and the deterministic ~1% repr-canon stratum MUST agree
between two frames iff their multisets agree.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

from check_oracle import FAST_ROWS, canon_hash, canon_hash_fast  # noqa: E402

N = FAST_ROWS + 50_000  # 250k rows: above the fast-hasher dispatch size


def _frame() -> pd.DataFrame:
    rng = np.random.RandomState(7)
    return pd.DataFrame(
        {
            "k": np.arange(N, dtype="int64"),
            "grp": rng.randint(0, 97, N).astype("int32"),
            "x": rng.randn(N),
            "s": pd.Series(
                [f"tok{v}" if v % 11 else None for v in range(N)],
                dtype=object,
            ),
        }
    )


@pytest.fixture(scope="module")
def base():
    pdf = _frame()
    h, cols, n, samp, sn = canon_hash_fast(pdf, with_sample=True)
    return pdf, (h, cols, n, samp, sn)


def test_permutation_invariant(base):
    pdf, (h, _, n, samp, sn) = base
    perm = pdf.sample(frac=1.0, random_state=3).reset_index(drop=True)
    h2, _, n2, samp2, sn2 = canon_hash_fast(perm, with_sample=True)
    assert (h2, n2, samp2, sn2) == (h, n, samp, sn)


@pytest.mark.parametrize(
    "col,mutate",
    [
        # one ulp on one float cell — the smallest representable change
        ("x", lambda v: np.nextafter(v, np.inf)),
        ("k", lambda v: v + 1),  # one integer cell
        ("s", lambda v: (v or "") + "!"),  # one string cell
        ("s", lambda v: None),  # value -> NULL
        ("x", lambda v: float("nan")),  # value -> NaN
    ],
)
def test_single_cell_corruption_moves_hash(base, col, mutate):
    pdf, (h, _, n, _, _) = base
    bad = pdf.copy()
    row = 123_456  # mid-frame, s is non-null there (123456 % 11 != 0)
    bad.loc[row, col] = mutate(bad.loc[row, col])
    h2, _, n2 = canon_hash_fast(bad)
    assert n2 == n
    assert h2 != h, f"corrupting {col}[{row}] did not move the sum64 hash"


def test_offsetting_pair_corruption_moves_hash(base):
    # the abelian-sum worry: +d on one row, -d on another must NOT
    # cancel (hash deltas, not value deltas, are what sums)
    pdf, (h, _, _, _, _) = base
    bad = pdf.copy()
    bad.loc[1000, "x"] = bad.loc[1000, "x"] + 1.0
    bad.loc[2000, "x"] = bad.loc[2000, "x"] - 1.0
    h2, _, _ = canon_hash_fast(bad)
    assert h2 != h


def test_normalizations_match_repr_canon():
    # the two folds the fast canon applies (-0.0 -> 0.0, NaN unified)
    # are exactly the repr canon's: frames equal under one canon are
    # equal under the other
    a = pd.DataFrame({"x": [0.0, float("nan"), 1.5], "k": [1, 2, 3]})
    b = pd.DataFrame(
        {
            "x": np.array([-0.0, np.float64("nan"), 1.5]),
            "k": np.array([1, 2, 3], dtype="int32"),
        }
    )
    assert canon_hash(a) == canon_hash(b)
    assert canon_hash_fast(a) == canon_hash_fast(b)


def test_sample_stratum_is_repr_verified(base):
    pdf, (_, _, _, samp, sn) = base
    # the stratum is ~1% and produced by the SLOW canon — recompute it
    # independently and confirm
    assert 0 < sn < N // 50
    cols = sorted(pdf.columns)
    norm = {}
    for c in cols:
        s = pdf[c]
        if s.dtype.kind in "iu":
            s = s.astype("int64")
        elif s.dtype.kind == "f":
            v = s.astype("float64").to_numpy(copy=True)
            v[np.isnan(v)] = np.float64("nan")
            s = pd.Series(v + 0.0, index=s.index)
        elif s.dtype == object:
            s = s.map(
                lambda v: "∅"
                if v is None or (isinstance(v, float) and v != v)
                else (v if isinstance(v, str) else repr(v))
            )
        norm[c] = s
    hv = (
        pd.util.hash_pandas_object(pd.DataFrame(norm)[cols], index=False)
        .values.astype("uint64")
    )
    idx = np.nonzero(hv % np.uint64(101) == np.uint64(0))[0]
    ref_h, _, ref_n = canon_hash(pdf.iloc[idx])
    assert (ref_h, ref_n) == (samp, sn)


def test_systematic_dtype_drift_fails_the_stratum(base):
    # the divergence class the stratum exists to catch: a whole column
    # shifted (e.g. an engine returning cents vs dollars, or a string
    # re-encoding) must fail BOTH the sum and the sampled repr hash
    pdf, (h, _, _, samp, _) = base
    drift = pdf.copy()
    drift["x"] = drift["x"] * (1 + 1e-12)
    h2, _, _, samp2, _ = canon_hash_fast(drift, with_sample=True)
    assert h2 != h
    assert samp2 != samp
