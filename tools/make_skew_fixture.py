"""Skewed twin of a driver sf fixture dir (round-9 verdict #1).

Every driver fixture is uniform by construction (`user_id % 4` book
symbols, roughly balanced document sources), which made the old
average-based dispatch hints accidentally correct. Production data is
never uniform: one listing dominates a tape, one crawl dominates a
corpus. This tool derives a SKEWED twin of an sf dir with identical
schemas, so the dispatch hints, the segmented window paths, and the
DuckDB oracles can all be exercised under a hot key:

- ``events.parquet``: ``user_id`` collapses to residue 0 (mod 4) for
  90% of rows (``user_id % 10 != 0`` -> ``(user_id DIV 4) * 4``), so
  the derived book puts ~90% of snapshots on symbol S0 while keeping
  every other column byte-identical. The remap is a pure per-row
  function of the original ``user_id`` — deterministic, engine-free.
- ``documents.parquet``: ``source`` collapses to ``'common_crawl'``
  for 90% of docs (``doc_id % 10 != 0``) — a zipf-ish head for the
  corpus tier's source-keyed groupings.
- every other ``*.parquet``: symlinked from the source dir.

Both Spark gates and DuckDB oracles read the SAME skewed parquet, so
oracle parity needs no SQL changes. Usage:

    python tools/make_skew_fixture.py SRC_SF_DIR OUT_DIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _skew_events(src: str, dst: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    u = t.column("user_id").combine_chunks()
    vals = u.to_numpy(zero_copy_only=False).astype(np.int64)
    # C-remainder semantics match Spark/DuckDB `%`; fixture ids are
    # non-negative so fmod == mod here, but keep the engines' contract
    hot = np.fmod(vals, 10) != 0
    remapped = np.where(hot, (vals // 4) * 4, vals)
    idx = t.schema.get_field_index("user_id")
    t = t.set_column(
        idx, t.schema.field(idx), pa.array(remapped, type=u.type)
    )
    pq.write_table(t, dst)


def _skew_documents(src: str, dst: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    d = t.column("doc_id").combine_chunks().to_numpy(zero_copy_only=False)
    s = t.column("source").combine_chunks().to_pylist()
    hot = np.fmod(d.astype(np.int64), 10) != 0
    out = ["common_crawl" if h else v for h, v in zip(hot, s)]
    idx = t.schema.get_field_index("source")
    t = t.set_column(
        idx, t.schema.field(idx), pa.array(out, type=t.schema.field(idx).type)
    )
    pq.write_table(t, dst)


def make_skew_dir(src_sf_dir: str, out_dir: str) -> str:
    """Build (or reuse) the skewed twin under ``out_dir``; idempotent —
    an existing complete twin is returned as-is."""
    os.makedirs(out_dir, exist_ok=True)
    done = os.path.join(out_dir, ".complete")
    if os.path.exists(done):
        return out_dir
    for fn in sorted(os.listdir(src_sf_dir)):
        if not fn.endswith(".parquet"):
            continue
        src = os.path.join(src_sf_dir, fn)
        dst = os.path.join(out_dir, fn)
        if os.path.lexists(dst):
            os.remove(dst)
        if fn == "events.parquet":
            _skew_events(src, dst)
        elif fn == "documents.parquet":
            _skew_documents(src, dst)
        else:
            os.symlink(os.path.abspath(src), dst)
    with open(done, "w") as f:
        f.write("ok\n")
    return out_dir


if __name__ == "__main__":
    src, out = sys.argv[1], sys.argv[2]
    print(make_skew_dir(src, out))
