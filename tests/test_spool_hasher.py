"""The --spool transport's chunked hasher must be chunking-invariant
and transport-invariant: the (sum64, count, sample) triple may depend
only on the row MULTISET. Round-11 regression pinned here: pyarrow's
per-batch to_pandas surfaces a null-free chunk of an int column as
int64 but a null-bearing chunk as float64, so the same integer hashed
differently per chunk until the nullable types_mapper +
_norm_transport canonicalization (caught live on trade_dollar_bars at
sf100 — bar_id null in some row groups only). No Spark needed: the
hasher is pure pandas/pyarrow.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from check_oracle import (  # noqa: E402
    _int_bool_nullable,
    _norm_transport,
    canon_hash_batches,
)


def _frame(n=250_000, seed_shift=0):
    # > FAST_ROWS so the sum64 streaming regime engages; nulls land in
    # the SECOND half only, so naive chunking sees mixed dtypes
    ids = np.arange(n, dtype="int64") + seed_shift
    vals = (ids % 1000).astype("float64") / 8.0
    bar = ids.astype("object")
    for i in range(n // 2, n, 97):
        bar[i] = None
    return pd.DataFrame(
        {
            "doc_id": ids,
            "score": vals,
            "bar_id": pd.array(bar, dtype="Int64"),
            "tag": np.where(ids % 3 == 0, "alpha", "beta"),
        }
    )


def _arrow_chunks(pdf, sizes):
    tab = pa.Table.from_pandas(pdf, preserve_index=False)
    off = 0
    for s in sizes:
        yield tab.slice(off, s).to_pandas(types_mapper=_int_bool_nullable)
        off += s
    if off < len(pdf):
        yield tab.slice(off).to_pandas(types_mapper=_int_bool_nullable)


def _hash_with_chunks(pdf, sizes):
    return canon_hash_batches(_arrow_chunks(pdf, sizes), list(pdf.columns))


def test_chunking_invariance_with_partial_nulls():
    pdf = _frame()
    a = _hash_with_chunks(pdf, [50_000] * 5)
    b = _hash_with_chunks(pdf, [1_000, 199_000, 30_000])
    c = _hash_with_chunks(pdf, [250_000])
    assert a == b == c
    assert a[2] == len(pdf)
    assert a[3] is not None  # streaming regime: sample stratum present


def test_row_order_invariance():
    pdf = _frame()
    shuf = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    assert _hash_with_chunks(pdf, [60_000] * 4) == _hash_with_chunks(
        shuf, [250_000]
    )


def test_single_cell_sensitivity():
    pdf = _frame()
    base = _hash_with_chunks(pdf, [100_000, 150_000])
    for col, newval in [
        ("score", 123456.5),
        ("doc_id", -1),
        ("bar_id", pd.NA),
        ("tag", "gamma"),
    ]:
        mut = pdf.copy()
        mut.loc[123_456, col] = newval
        got = _hash_with_chunks(mut, [100_000, 150_000])
        assert got[0] != base[0], f"mutating {col} did not move the hash"


def test_small_results_use_repr_canon():
    pdf = _frame(n=1_000)
    h = _hash_with_chunks(pdf, [400, 600])
    assert not h[0].startswith("s")  # repr canon, not sum64
    assert h[3] is None
    # and it's still chunking-invariant
    assert h == _hash_with_chunks(pdf, [1_000])


def test_norm_transport_masked_int_equals_any_null_layout():
    # the canonicalized object column must not depend on which chunk
    # the nulls fell into
    s1 = pd.array([1, None, 3], dtype="Int64")
    s2 = pd.array([1, 2, 3], dtype="Int64")
    out1 = _norm_transport(pd.DataFrame({"x": s1}))["x"].tolist()
    out2 = _norm_transport(pd.DataFrame({"x": s2}))["x"].tolist()
    assert out1 == ["1", "∅", "3"]
    assert out2 == ["1", "2", "3"]
