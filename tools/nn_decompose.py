"""Decompose dedup_embedding_nn's wall time by pipeline stage
(round-10 verdict #6: 312 s at sf100 was the heaviest single century
probe; attribute it the way the CDC replay was decomposed).

Stages, each materialized through the no-op sink so the wall covers the
whole distributed plan and nothing downstream:

- ``scan_norm``: read embeddings, cast to double, fold the per-vector
  norm (the linear base cost).
- ``keyed``: + band explode, (band, bucket) shuffle, hot-bucket count
  window + filter — the bucketing stage (``operators.similarity.
  lsh_keyed``, the exact lineage the gate consumes).
- ``pairs``: + postings-list pair generation, per-pair dot fold,
  (id_a, id_b) min-dedup shuffle (``lsh_banded_pairs``).
- ``nn``: the full gate (+ mirror explode and per-vec_id rank window).

Deltas between consecutive stages attribute the cost; pair count and
bucket occupancy quantify the fan-out. Usage:

    python tools/nn_decompose.py [--out FILE] SF_DIR
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    out_path = None
    argv = sys.argv[1:]
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from market_microstructure_toolkit_spark.operators.similarity import (
        as_double,
        l2_norm,
        lsh_banded_pairs,
        lsh_keyed,
    )
    from market_microstructure_toolkit_spark.plans.base import _emb
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY
    from market_microstructure_toolkit_spark.session import get_spark

    spark = get_spark("nn-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    emb = _emb(spark, sf_dir)
    n_vec = emb.count()

    def timed(name, df):
        t = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        w = round(time.perf_counter() - t, 2)
        print(f"{name:12s} {w:8.2f}s")
        return w

    report = {"sf_dir": sf_dir, "n_vectors": n_vec, "stages": {}}
    report["stages"]["scan_norm"] = timed(
        "scan_norm",
        emb.select(
            "vec_id",
            as_double("embedding").alias("v"),
        ).withColumn("nrm", l2_norm("v")),
    )
    keyed = lsh_keyed(emb, bits_per_band="auto", n_bands=4, max_bucket=1000)
    report["stages"]["keyed"] = timed("keyed", keyed)
    pairs = lsh_banded_pairs(
        emb, bits_per_band="auto", n_bands=4, min_cosine=-2.0, max_bucket=1000
    )
    report["stages"]["pairs"] = timed("pairs", pairs)
    report["stages"]["nn"] = timed(
        "nn", REGISTRY["dedup_embedding_nn"].spark(spark, sf_dir)
    )

    # fan-out attribution: surviving keyed rows, candidate pairs, and
    # the occupancy histogram's top (cheap aggregates, timed separately)
    report["keyed_rows"] = keyed.count()
    report["candidate_pairs"] = pairs.count()
    occ = (
        keyed.groupBy("band", "bucket")
        .count()
        .agg(
            F.max("count").alias("max_occ"),
            F.avg("count").alias("avg_occ"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .first()
    )
    report["bucket_occupancy"] = {
        "max": occ["max_occ"],
        "avg": round(float(occ["avg_occ"]), 1),
        "n_buckets": occ["n_buckets"],
    }
    d = report["stages"]
    report["attribution"] = {
        "scan_and_norm_s": d["scan_norm"],
        "bucket_shuffle_s": round(d["keyed"] - d["scan_norm"], 2),
        "pair_gen_and_dedup_s": round(d["pairs"] - d["keyed"], 2),
        "mirror_and_rank_s": round(d["nn"] - d["pairs"], 2),
    }
    print(json.dumps(report, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    main()
