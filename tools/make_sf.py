"""Synthesize a larger scale factor from /root/testdata/sf0.1 by key-shifted
replication — the scale-evidence harness the round-5 verdict asked for
(no sf1 directory is shipped; correctness comparisons stay valid because
Spark and the DuckDB oracle read the SAME generated files).

Design: N replicas of every fact table with every primary AND foreign key
shifted by ``replica * (max_key + 1)`` so referential joins keep exactly
their sf0.1 fan-out; fixed-size dims (region, nation) are copied.
Documents get a per-replica text suffix (n_chars updated — the fixture
invariant n_chars == length(text) holds) so the corpus isn't 90% exact
duplicates; embeddings get a per-replica cyclic dimension rotation —
norm-preserving with ZERO float arithmetic, so intra-replica geometry is
bit-identical and cross-replica vectors are distinct. The time axis is
left untouched: 10x rows in the same span = 10x event density, which is
how real feeds grow.

Usage: python tools/make_sf.py [--out DIR] [--replicas N]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> columns shifted by that table's own stride
PK = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# table -> {column: table whose stride applies} (foreign keys)
FK = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
}
COPY = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of fact tables to synthesize "
        "(dims are always copied); default = all. Lets a century-scale "
        "probe (replicas=1000) build only the tables its gates read.",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    facts = [*PK, "lineitem"]
    if args.tables:
        want = set(args.tables.split(","))
        unknown = want - set(facts)
        if unknown:
            raise SystemExit(f"unknown tables: {sorted(unknown)}")
        facts = [t for t in facts if t in want]
    # stride sources must include FK referents even when not emitted
    need = set(facts) | {ref for t in facts for ref in FK.get(t, {}).values()}
    tables = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in [*COPY, *[f for f in [*PK, "lineitem"] if f in need]]
    }
    stride = {}
    for t, cols in PK.items():
        if t not in tables:
            continue
        # one stride per table: max over its own-key columns, so event_id
        # and user_id shift by the same amount is NOT wanted — stride is
        # per (table, column) for multi-key tables
        stride[t] = {
            c: int(pa.compute.max(tables[t][c]).as_py()) + 1 for c in cols
        }

    for t in COPY:
        pq.write_table(tables[t], f"{args.out}/{t}.parquet")
        print(t, "copied", tables[t].num_rows)

    for t in facts:
        base = tables[t]
        # stream one replica per row group instead of concat-in-memory:
        # replicas=1000 (sf100) would otherwise hold the whole 100M-row
        # fact table in RAM before the single write. Output rows are
        # identical either way; per-replica row groups additionally give
        # footer stats the dispatch hints can read per key stripe.
        writer = None
        total = 0
        for i in range(args.replicas):
            tab = base
            shifts: dict[str, int] = {}
            for c in PK.get(t, {}):
                shifts[c] = i * stride[t][c]
            for c, ref in FK.get(t, {}).items():
                ref_col = PK[ref][0]
                shifts[c] = i * stride[ref][ref_col]
            cols = []
            for name in tab.column_names:
                col = tab[name]
                if name in shifts and i > 0:
                    col = pa.compute.add(col, shifts[name]).cast(col.type)
                elif t == "documents" and name == "text" and i > 0:
                    col = pa.compute.binary_join_element_wise(
                        col.cast(pa.string()), f" #r{i}", ""
                    )
                elif t == "documents" and name == "n_chars" and i > 0:
                    col = pa.compute.add(col, len(f" #r{i}")).cast(col.type)
                elif t == "embeddings" and name == "embedding" and i > 0:
                    arrs = col.to_pylist()
                    k = i % len(arrs[0])
                    rotated = [
                        (None if a is None else a[k:] + a[:k]) for a in arrs
                    ]
                    col = pa.chunked_array([pa.array(rotated, type=col.type)])
                cols.append(col)
            rep = pa.table(
                dict(zip(tab.column_names, cols)), schema=None
            ).cast(base.schema.remove_metadata())
            if writer is None:
                writer = pq.ParquetWriter(
                    f"{args.out}/{t}.parquet", rep.schema
                )
            writer.write_table(rep)
            total += rep.num_rows
        if writer is None:
            raise SystemExit(
                f"{t}: no replicas written — --replicas must be >= 1"
            )
        writer.close()
        print(t, "->", total, "rows")


if __name__ == "__main__":
    main()
