"""Clustered (mixture-of-Gaussians) embeddings twin (round-9 verdict #4).

The driver's ``embeddings.parquet`` is near-uniform random, which puts
honest IVF/PQ recall in the 0.0-0.6 band — the assertion machinery in
``tests/test_ann_recall_thresholds.py`` works there, but a floor of 0.0
can't regress. Real embedding spaces are CLUSTERED (that's why IVF works
at all), and in a clustered regime a bucketing or probing bug moves
recall from ~0.9 to ~0.1 — the sensitive band the floors should pin.

This tool derives a twin sf dir whose ``embeddings.parquet`` is replaced
by a deterministic mixture of 8 Gaussians with the SAME schema, rowcount,
and id/label columns:

- 8 unit-norm cluster centers from a fixed-seed generator;
- vector i belongs to cluster ``i % 8``; embedding = center + sigma*noise
  (whole matrix drawn in one seeded shot — bit-reproducible);
- labels keep the source values (label semantics are orthogonal).

The IVF gates use vectors 1..8 as coarse centroids; under this layout
vector i (1..8) is a noisy sample of center ``i % 8``, so the 8 cells
align with the 8 true clusters and recall lands where a working IVF
should. Every other table is symlinked, so the same recall GATES (and
their DuckDB oracles) run unchanged against the twin.

Usage: python tools/make_clustered_embeddings.py SRC_SF_DIR OUT_DIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLUSTERS = 8
DIM = 64
# sigma sweep at sf0.1 (round 10): 0.08 -> ivf 1.0 (too easy to detect a
# one-probe-short bug), 0.30 -> ivf 0.9 / multiprobe 1.0 (the sensitive
# 0.7-0.95 band the floors should pin), 0.40 -> ivf 0.6. 0.30 keeps the
# multi-probe-beats-single-probe invariant STRICT in the clustered
# regime while a bucketing/probing bug still craters the number.
SIGMA = 0.30
SEED = 0xC1D5


def _clustered_embeddings(src: str, dst: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    n = t.num_rows
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vec_ids = t.column("vec_id").combine_chunks().to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    assign = vec_ids % N_CLUSTERS
    noise = rng.standard_normal((n, DIM)) * SIGMA
    vecs = (centers[assign] + noise).astype(np.float32)
    emb_field = t.schema.field("embedding")
    flat = pa.array(vecs.reshape(-1), type=emb_field.type.value_type)
    offsets = pa.array(
        np.arange(0, (n + 1) * DIM, DIM, dtype=np.int32), type=pa.int32()
    )
    emb = pa.ListArray.from_arrays(offsets, flat)
    idx = t.schema.get_field_index("embedding")
    t = t.set_column(idx, emb_field, emb.cast(emb_field.type))
    pq.write_table(t, dst)


def make_clustered_dir(src_sf_dir: str, out_dir: str) -> str:
    """Build (or reuse) the clustered twin under ``out_dir``."""
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
        if fn == "embeddings.parquet":
            _clustered_embeddings(src, dst)
        else:
            os.symlink(os.path.abspath(src), dst)
    with open(done, "w") as f:
        f.write("ok\n")
    return out_dir


if __name__ == "__main__":
    src, out = sys.argv[1], sys.argv[2]
    print(make_clustered_dir(src, out))
