"""Scale probe: run the data-pipeline queries on a 10x corpus and report
wall-time scaling vs sf0.1.

Builds /tmp/scale10/{documents,embeddings}.parquet = 10 salted copies of
the sf0.1 tables (each copy's doc text gains one distinct leading token,
so copies are NEAR-duplicates of their original — a templated-corpus
stress that exercises the LSH band buckets, hot-key guards, and cluster
resolution exactly where a real web crawl does; embeddings perturb one
coordinate per copy so ANN buckets grow without becoming pure dups).

A linear-shaped operator should land near 10x wall time on local[32]
(same cores, 10x rows); anything super-linear is a pair blow-up the
guards failed to bound. Usage:

    python tools/scale_probe.py [query ...]   # default: the doc/emb set
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

BASE = "/root/testdata/sf0.1"
COPIES = int(os.environ.get("SCALE_PROBE_COPIES", "10"))
OUT = os.environ.get("SCALE_PROBE_OUT", f"/tmp/scale{COPIES}")
DEFAULT = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_winnow",
    "dedup_clusters",
    "decontaminate",
    "pack_sequences",
    "doc_repetition",
    "doc_length_quantiles",
    "corpus_curation",
    "similarity_topk",
    "similarity_lsh_pairs",
    "similarity_ivf_multiprobe",
    "dedup_embedding_nn",
    "dedup_semantic_clusters",
    "doc_tfidf_top_terms",
    "doc_unigram_logprob",
    "doc_ngram_novelty",
    "doc_chunking",
]


def build(spark) -> None:
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    embs = spark.read.parquet(f"{BASE}/embeddings.parquet")
    doc_copies = []
    emb_copies = []
    for c in range(COPIES):
        salt = F.concat(F.lit(f"s{c} "), F.col("text")) if c else F.col("text")
        doc_copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(1_000_000 * c)).alias("doc_id"),
                salt.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        def perturb(delta: float):
            return lambda x, i: (
                F.when(i == 0, x + F.lit(delta)).otherwise(x).cast("float")
            )

        emb_copies.append(
            embs.select(
                (F.col("vec_id") + F.lit(1_000_000 * c)).alias("vec_id"),
                F.transform("embedding", perturb(c * 1e-3)).alias("embedding"),
                "label",
            )
        )
    alld = doc_copies[0]
    for d in doc_copies[1:]:
        alld = alld.unionByName(d)
    alle = emb_copies[0]
    for e in emb_copies[1:]:
        alle = alle.unionByName(e)
    shutil.rmtree(OUT, ignore_errors=True)
    # 32 output files so downstream scans start with full parallelism
    # (the sf0.1 fixtures are single-file and rely on spread())
    alld.repartition(32).write.parquet(f"{OUT}/documents.parquet")
    alle.repartition(32).write.parquet(f"{OUT}/embeddings.parquet")


def build_events(spark) -> None:
    """10x events for the book/trade-tier probes: copy c shifts ts by c
    ms and offsets event_id, so per-symbol tick density grows 10x (the
    stress that matters for windows, interval overlap, and VPIN
    buckets). ts is written as BIGINT epoch-nanos — read_events'
    passthrough arrival type."""
    from market_microstructure_toolkit_spark.sources.events import (
        read_events,
    )

    ev = read_events(spark, BASE)
    copies = []
    for c in range(COPIES):
        copies.append(
            ev.select(
                (F.col("event_id") + F.lit(1_000_000 * c)).alias("event_id"),
                (F.col("ts") + F.lit(c * 1_000_000)).alias("ts"),
                "user_id",
                "event_type",
                "value",
                "props",
            )
        )
    alle = copies[0]
    for e in copies[1:]:
        alle = alle.unionByName(e)
    alle.repartition(32).write.parquet(f"{OUT}/events.parquet")


def main() -> int:
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY
    from market_microstructure_toolkit_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scale-probe")
    if not Path(f"{OUT}/documents.parquet").exists():
        build(spark)
    if not Path(f"{OUT}/events.parquet").exists():
        build_events(spark)
    # dims/facts the probe does NOT scale link through at 1x — realistic
    # (dimensions stay small while facts grow) and keeps every gate
    # runnable against OUT as its sf_dir
    for t in (
        "region nation customer supplier part orders lineitem".split()
    ):
        dst = Path(f"{OUT}/{t}.parquet")
        if not dst.exists():
            dst.symlink_to(f"{BASE}/{t}.parquet")
    report = {}
    for name in names:
        q = REGISTRY[name].spark
        t0 = time.time()
        n_small = q(spark, BASE).count()
        t_small = time.time() - t0
        t0 = time.time()
        n_big = q(spark, OUT).count()
        t_big = time.time() - t0
        ratio = t_big / t_small if t_small else float("inf")
        report[name] = {
            "sf0.1_sec": round(t_small, 2),
            "x10_sec": round(t_big, 2),
            "ratio": round(ratio, 1),
            "sf0.1_rows": n_small,
            "x10_rows": n_big,
        }
        print(
            f"{name:32s} {t_small:7.2f}s -> {t_big:8.2f}s  x{ratio:5.1f}  "
            f"rows {n_small} -> {n_big}",
            flush=True,
        )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
