"""Sharded / decomposed DuckDB oracles for century-scale gates.

The monolithic DuckDB twins of the pair-generating sf100 gates exceed
this box: ``similarity_lsh_pairs`` needs >62 GB of out-of-core spill
for the 258M-pair bucket join, and ``dedup_semantic_clusters`` layers
twelve min-label rounds on top of the same join. The Spark sides
complete (disk-backed checkpointing, round-12); only the single-process
oracle is the ceiling.

The order-invariant sum64 canon makes an EXACT decomposition possible:
``canon_hash_batches`` folds per-row hashes with modular addition and
samples rows by a content-deterministic predicate (row_hash % 101 == 0),
so hashing the CONCATENATION of disjoint shard results is bit-identical
to hashing the full result. Each gate here therefore runs its oracle as
K disjoint DuckDB queries (sharded on ``id_a % K`` — every output row
has exactly one id_a, so shards are disjoint and covering) whose batch
iterators are chained into ONE hasher call. The bucket-size caps inside
the LSH SQL stay global: the shard predicate references a non-partition
column, so it cannot (and does not) push below the COUNT(*) OVER /
HAVING that computes bucket occupancy — each shard sees the same capped
bucket set, verified by shard-vs-full hash equality at sf0.1/sf1
(``tests/test_century_shard_oracle.py``).

``dedup_semantic_clusters`` additionally decomposes in TWO STAGES,
because its final output (the global fixpoint) cannot be sharded:

- stage A verifies the thresholded EDGE SET: Spark writes the pairs to
  parquet and hashes them (--phase spark); DuckDB recomputes them in K
  shards from the raw embeddings and must hash-match (--phase duck).
- stage B verifies the FIXPOINT: DuckDB runs the gate's own twelve
  min-label pointer-doubling rounds reading the stage-A edge parquet
  (mirroring the direction itself — nothing is trusted from Spark but
  the already-verified pair set) and the final labels must hash-match
  the gate's spooled Spark result.

Together the stages are a full independent verification with bounded
intermediates: stage A's per-shard join is ~1/K of the monolith, stage
B's per-round state is one label row per node.

Usage:
  python tools/century_shard_oracle.py SF_DIR --phase spark \
      --artifact ORACLE_SF100_r12.json [--gates g1,g2]
  python tools/century_shard_oracle.py SF_DIR --phase duck \
      --artifact ORACLE_SF100_r12.json [--shards 16]

--phase spark writes edge parquet + hashes into <artifact>.sparkside.json
(same file check_oracle --phase spark uses; the final-labels record for
dedup_semantic_clusters must already be there from the gate's own spark
phase). --phase duck runs the sharded oracles with no JVM in the
process and merges records into the artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.check_oracle import (  # noqa: E402
    _int_bool_nullable,
    canon_hash_batches,
)

EDGE_DIR_KEY = "__edges_dir__"


def _edges_dir(artifact: str) -> str:
    root = os.environ.get("SPARK_GRAFT_CENTURY_SCRATCH", "/tmp")
    tag = os.path.basename(artifact).replace(".", "_")
    return os.path.join(root, f"mmt_century_edges_{tag}")


def _duck_con(sf_dir: str):
    import duckdb
    import tempfile

    con = duckdb.connect()
    spill = tempfile.mkdtemp(prefix="mmt_duck_spill_")
    con.execute(f"SET temp_directory='{spill}'")
    con.execute("SET preserve_insertion_order=false")
    try:
        ram_gb = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) // (1 << 30)
        default = f"{max(1, int(ram_gb * 0.6))}GB"
    except (ValueError, OSError, AttributeError):
        default = "8GB"
    con.execute(
        "SET memory_limit='"
        + os.environ.get("SPARK_GRAFT_DUCK_MEM", default)
        + "'"
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
    return con


def _sharded_batches(con, sql_for_shard, k: int):
    """Chain K disjoint shard queries into one (names, batches) pair.
    Shards run strictly sequentially — the canon fold is
    order-invariant, and one bounded query at a time is the point."""
    import pyarrow as pa

    names_holder: list = []

    def gen():
        for i in range(k):
            cur = con.execute(sql_for_shard(i))
            reader = cur.fetch_record_batch(1_048_576)
            if not names_holder:
                names_holder.extend(reader.schema.names)
            while True:
                try:
                    b = reader.read_next_batch()
                except StopIteration:
                    break
                yield pa.Table.from_batches([b]).to_pandas(
                    types_mapper=_int_bool_nullable
                )
            print(f"  shard {i + 1}/{k} done", flush=True)

    # pull the first shard's schema eagerly so names are known
    it = gen()
    first = []
    try:
        first.append(next(it))
    except StopIteration:
        pass

    def full():
        yield from first
        yield from it

    if not names_holder:
        # zero-row result: names from a LIMIT 0 probe of shard 0
        cur = con.execute(
            f"SELECT * FROM ({sql_for_shard(0)}) __probe LIMIT 0"
        )
        names_holder.extend(cur.fetch_record_batch(1).schema.names)
    return names_holder, full()


# ---------------------------------------------------------------- gates


def _lsh_pairs_shard_sql():
    from market_microstructure_toolkit_spark.plans.similarity_queries import (
        _LSH_PAIRS_SQL,
    )

    def make(k: int):
        def for_shard(i: int) -> str:
            return (
                f"SELECT * FROM ({_LSH_PAIRS_SQL}) __t "
                f"WHERE (__t.id_a % {k}) = {i}"
            )

        return for_shard

    return make


def _semantic_edges_shard_sql():
    from market_microstructure_toolkit_spark.plans.corpus_queries import (
        _BANDED_PAIR_CTES,
    )

    def make(k: int):
        def for_shard(i: int) -> str:
            return (
                "WITH "
                + _BANDED_PAIR_CTES
                + "\nSELECT id_a, id_b FROM pairs "
                f"WHERE ROUND(cos_sim, 6) >= 0.25 AND (id_a % {k}) = {i}"
            )

        return for_shard

    return make


def _semantic_fixpoint_batches(con, edges_glob: str, max_rounds: int = 64):
    """Min-label propagation with pointer doubling, iterated to the
    EXACT fixpoint via temp tables (one statement per round, previous
    round dropped — bounded memory, bounded disk).

    The gates' monolithic oracle unrolls 12 rounds as CTEs — verified
    sufficient through sf10, and a shortfall cannot pass silently (the
    hashes diverge, which is exactly how the sf100 run surfaced it: a
    63M-edge / 2M-node graph needs more than 12 doubling rounds). The
    century path must match Spark's run-to-convergence semantics, so it
    iterates like ``operators.dedup.dedup_clusters`` does and stops on
    changed == 0. Returns (names, batch_iterator) over the final
    labels."""
    import pyarrow as pa

    con.execute("DROP TABLE IF EXISTS __cc_edges")
    con.execute(
        "CREATE TEMP TABLE __cc_edges AS "
        f"SELECT id_a AS src, id_b AS dst FROM read_parquet('{edges_glob}') "
        "UNION ALL "
        f"SELECT id_b AS src, id_a AS dst FROM read_parquet('{edges_glob}')"
    )
    con.execute("DROP TABLE IF EXISTS __cc_it0")
    con.execute(
        "CREATE TEMP TABLE __cc_it0 AS "
        "SELECT vec_id AS id, vec_id AS lab FROM embeddings"
    )
    k = 0
    while True:
        if k >= max_rounds:
            raise RuntimeError(
                f"fixpoint not reached after {max_rounds} rounds"
            )
        con.execute(f"DROP TABLE IF EXISTS __cc_it{k + 1}")
        con.execute(
            f"""CREATE TEMP TABLE __cc_it{k + 1} AS
  SELECT n.id,
         LEAST(n.lab, COALESCE(nb.mlab, n.lab), COALESCE(ll.lab, n.lab))
           AS lab
  FROM __cc_it{k} n
  LEFT JOIN (SELECT e.dst AS id, MIN(x.lab) AS mlab
             FROM __cc_edges e JOIN __cc_it{k} x ON x.id = e.src
             GROUP BY e.dst) nb ON nb.id = n.id
  LEFT JOIN __cc_it{k} ll ON ll.id = n.lab"""
        )
        changed = con.execute(
            f"SELECT COUNT(*) FROM __cc_it{k + 1} b "
            f"JOIN __cc_it{k} a USING (id) WHERE a.lab <> b.lab"
        ).fetchone()[0]
        con.execute(f"DROP TABLE __cc_it{k}")
        k += 1
        print(f"  fixpoint round {k}: {changed} changed", flush=True)
        if changed == 0:
            break
    cur = con.execute(
        f"SELECT id AS vec_id, lab AS cluster_id FROM __cc_it{k}"
    )
    reader = cur.fetch_record_batch(1_048_576)

    def batches():
        while True:
            try:
                b = reader.read_next_batch()
            except StopIteration:
                return
            yield pa.Table.from_batches([b]).to_pandas(
                types_mapper=_int_bool_nullable
            )

    return reader.schema.names, batches()


def _e2e_staged_batches(con, contam_shards: int = 8):
    """corpus_pipeline_e2e's oracle executed as staged temp tables —
    the SAME computation as the gate's monolithic ``_PIPELINE_SQL``
    (identical SQL fragments, identical textual FROM-substitutions),
    restructured so each stage materializes, spills independently, and
    FREES its operators before the next begins. The monolith hit an
    unspillable allocation at sf100 even under a 100 GB cap: all six
    stages' pipelines live simultaneously in one query. Differences
    from the monolith, both convergence-safe: the min-label rounds
    iterate to the exact changed==0 fixpoint (the unrolled 12 are a
    verified-through-sf10 artifact), and the contamination shingle join
    runs in ``contam_shards`` doc_id slices accumulated by INSERT (the
    corpus side explodes to ~1e9 shingles at sf100; sharding bounds the
    probe-side working set; disjoint+covering since contam groups by
    doc_id). Staged == monolith pinned at sf0.01 in
    tests/test_century_shard_oracle.py. Returns (names, batches) over
    the final packed report."""
    import pyarrow as pa

    from market_microstructure_toolkit_spark.plans.base import (
        DOCS_PLANTED_SQL,
    )
    from market_microstructure_toolkit_spark.plans.book import _plants_on
    from market_microstructure_toolkit_spark.plans.corpus_queries import (
        _MINHASH_SQL,
        _PACK_SQL,
        _QUALITY_SQL,
    )

    # the gate's Spark side reads _docs() = PLANTED documents, and the
    # registry rewrites every oracle's raw `documents` through the
    # planted CTE (plants_rewrite_sql) — the staged oracle must see the
    # same rows or stage 1 diverges by exactly the planted-doc count
    # (~20k at sf100, found the hard way this round)
    con.execute("DROP VIEW IF EXISTS e2e_docs")
    if _plants_on():
        con.execute(f"CREATE TEMP VIEW e2e_docs AS {DOCS_PLANTED_SQL}")
    else:
        con.execute(
            "CREATE TEMP VIEW e2e_docs AS SELECT * FROM documents"
        )
    con.execute("DROP TABLE IF EXISTS e2e_s1")
    con.execute(
        """CREATE TEMP TABLE e2e_s1 AS
WITH h1 AS (SELECT doc_id, md5(text) AS h FROM e2e_docs),
canon1 AS (SELECT MIN(doc_id) AS doc_id FROM h1 GROUP BY h)
SELECT d.* FROM e2e_docs d JOIN canon1 USING (doc_id)"""
    )
    con.execute("DROP TABLE IF EXISTS e2e_pairs")
    con.execute(
        "CREATE TEMP TABLE e2e_pairs AS SELECT id_a, id_b FROM ("
        + _MINHASH_SQL.replace("FROM documents", "FROM e2e_s1")
        + ") mh"
    )
    # min-label propagation to the exact fixpoint (temp-table rounds)
    con.execute("DROP TABLE IF EXISTS e2e_edges")
    con.execute(
        "CREATE TEMP TABLE e2e_edges AS "
        "SELECT id_a AS src, id_b AS dst FROM e2e_pairs "
        "UNION ALL SELECT id_b, id_a FROM e2e_pairs"
    )
    con.execute("DROP TABLE IF EXISTS e2e_it0")
    con.execute(
        "CREATE TEMP TABLE e2e_it0 AS SELECT doc_id AS id, doc_id AS lab "
        "FROM e2e_s1"
    )
    k = 0
    while True:
        if k >= 64:
            raise RuntimeError("e2e fixpoint not reached after 64 rounds")
        con.execute(f"DROP TABLE IF EXISTS e2e_it{k + 1}")
        con.execute(
            f"""CREATE TEMP TABLE e2e_it{k + 1} AS
  SELECT n.id,
         LEAST(n.lab, COALESCE(nb.mlab, n.lab), COALESCE(ll.lab, n.lab))
           AS lab
  FROM e2e_it{k} n
  LEFT JOIN (SELECT e.dst AS id, MIN(x.lab) AS mlab
             FROM e2e_edges e JOIN e2e_it{k} x ON x.id = e.src
             GROUP BY e.dst) nb ON nb.id = n.id
  LEFT JOIN e2e_it{k} ll ON ll.id = n.lab"""
        )
        changed = con.execute(
            f"SELECT COUNT(*) FROM e2e_it{k + 1} b "
            f"JOIN e2e_it{k} a USING (id) WHERE a.lab <> b.lab"
        ).fetchone()[0]
        con.execute(f"DROP TABLE e2e_it{k}")
        k += 1
        print(f"  e2e fixpoint round {k}: {changed} changed", flush=True)
        if changed == 0:
            break
    con.execute("DROP TABLE IF EXISTS e2e_s2")
    con.execute(
        f"""CREATE TEMP TABLE e2e_s2 AS
SELECT s1.* FROM e2e_s1 s1
JOIN (SELECT id AS doc_id FROM e2e_it{k} WHERE id = lab) c USING (doc_id)"""
    )
    con.execute("DROP TABLE e2e_edges")
    con.execute(f"DROP TABLE e2e_it{k}")
    con.execute("DROP TABLE IF EXISTS e2e_bench")
    con.execute(
        """CREATE TEMP TABLE e2e_bench AS
SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
FROM (SELECT string_split(text, ' ') AS w FROM e2e_docs
      WHERE doc_id % 50 = 0)
WHERE len(w) >= 3"""
    )
    con.execute("DROP TABLE IF EXISTS e2e_contam")
    con.execute(
        "CREATE TEMP TABLE e2e_contam (doc_id BIGINT)"
    )
    for i in range(contam_shards):
        con.execute(
            f"""INSERT INTO e2e_contam
SELECT c.doc_id FROM (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM e2e_s2
        WHERE doc_id % 50 != 0 AND doc_id % {contam_shards} = {i})
  WHERE len(w) >= 3
) c JOIN e2e_bench USING (g)
GROUP BY c.doc_id HAVING COUNT(*) >= 2"""
        )
        print(f"  e2e contam shard {i + 1}/{contam_shards}", flush=True)
    con.execute("DROP TABLE e2e_bench")
    con.execute("DROP TABLE IF EXISTS e2e_s3")
    con.execute(
        """CREATE TEMP TABLE e2e_s3 AS
SELECT t.* FROM (SELECT * FROM e2e_s2 WHERE doc_id % 50 != 0) t
ANTI JOIN e2e_contam USING (doc_id)"""
    )
    con.execute("DROP TABLE e2e_s2")
    con.execute("DROP TABLE e2e_contam")
    con.execute("DROP TABLE IF EXISTS e2e_s5")
    con.execute(
        "CREATE TEMP TABLE e2e_s5 AS "
        "SELECT s3.* FROM e2e_s3 s3 JOIN ("
        + _QUALITY_SQL.replace("FROM documents", "FROM e2e_s3")
        + """) q USING (doc_id)
WHERE q.quality_score >= 0.5
  AND substr(md5(CAST(s3.doc_id AS VARCHAR)), 31, 2) < 'f8'"""
    )
    con.execute("DROP TABLE e2e_s3")
    cur = con.execute(
        _PACK_SQL.replace("FROM documents", "FROM e2e_s5")
    )
    reader = cur.fetch_record_batch(1_048_576)

    def batches():
        while True:
            try:
                b = reader.read_next_batch()
            except StopIteration:
                return
            yield pa.Table.from_batches([b]).to_pandas(
                types_mapper=_int_bool_nullable
            )

    return reader.schema.names, batches()


def spark_phase(sf_dir: str, artifact: str, gates: list[str]) -> None:
    """Write the semantic-clusters edge parquet + its hash into the
    sparkside sidecar (the only Spark work this tool owns)."""
    if "dedup_semantic_clusters" not in gates:
        return
    import shutil

    import pyarrow.dataset as pads
    from pyspark.sql import functions as F

    from market_microstructure_toolkit_spark.operators.similarity import (
        lsh_banded_pairs,
    )
    from market_microstructure_toolkit_spark.plans.corpus_queries import _emb
    from market_microstructure_toolkit_spark.session import get_spark

    edir = _edges_dir(artifact)
    if not (
        os.environ.get("SPARK_GRAFT_EDGES_REUSE") == "1"
        and os.path.isdir(edir)
    ):
        spark = get_spark("century-shard-spark")
        shutil.rmtree(edir, ignore_errors=True)
        emb = _emb(spark, sf_dir)
        pairs = (
            lsh_banded_pairs(
                emb, bits_per_band="auto", n_bands=4, min_cosine=-2.0,
                max_bucket=1000,
            )
            .filter(F.round("cos_sim", 6) >= 0.25)
            .select("id_a", "id_b")
        )
        pairs.write.parquet(edir)
    dset = pads.dataset(edir)
    # the SAME Arrow->pandas transport as every other side of a spool
    # comparison (_int_bool_nullable -> _norm_transport repr-strings):
    # the first sf100 run hashed duck ints numerically and spark ints
    # as repr strings — identical VALUES, different hashes (round-12)
    h, cols, n, samp, sn = canon_hash_batches(
        (
            b.to_pandas(types_mapper=_int_bool_nullable)
            for b in dset.to_batches(batch_size=1_048_576)
        ),
        dset.schema.names,
    )
    side_path = artifact + ".sparkside.json"
    side = {}
    if os.path.exists(side_path):
        with open(side_path) as f:
            side = json.load(f)
    side["dedup_semantic_clusters.edges"] = {
        "hash": h,
        "cols": list(cols),
        "rows": n,
        "sample_hash": samp,
        "sample_rows": sn,
        EDGE_DIR_KEY: edir,
    }
    with open(side_path, "w") as f:
        json.dump(side, f, indent=1, sort_keys=True)
    print(f"edges -> {edir}: rows {n} hash {h}")


def _compare(name, side_rec, dh, dcols, drows, d_samp, d_sn, note):
    sh, scols, srows = side_rec["hash"], side_rec["cols"], side_rec["rows"]
    s_samp, s_sn = side_rec.get("sample_hash"), side_rec.get("sample_rows")
    ok_cols = sorted(scols) == sorted(dcols)
    ok_count = srows == drows
    samp_ok = s_samp == d_samp and s_sn == d_sn
    ok_hash = sh == dh and samp_ok
    ok = ok_cols and ok_count and ok_hash
    print(
        f"{name:34s} {'OK ' if ok else 'FAIL'} rows {srows}/{drows} "
        f"cols={'=' if ok_cols else 'DIFF'} hash {sh}/{dh}"
    )
    return ok, {
        "status": "ok" if ok else "fail",
        "rows_spark": srows,
        "rows_duckdb": drows,
        "rows_match": ok_count,
        "schema_match": ok_cols,
        "hash_spark": sh,
        "hash_duckdb": dh,
        "hash_match": ok_hash,
        "sample_hash_spark": s_samp,
        "sample_hash_duckdb": d_samp,
        "sample_rows": s_sn,
        "sample_match": samp_ok,
        "hasher": note,
    }


def duck_phase(
    sf_dir: str, artifact: str, gates: list[str], shards: int
) -> int:
    side_path = artifact + ".sparkside.json"
    with open(side_path) as f:
        side = json.load(f)
    con = _duck_con(sf_dir)
    records: dict[str, dict] = {}
    failures = 0

    if "similarity_lsh_pairs" in gates:
        rec = side.get("similarity_lsh_pairs")
        if rec is None:
            print("similarity_lsh_pairs: no spark-side record, skip")
        else:
            names, batches = _sharded_batches(
                con, _lsh_pairs_shard_sql()(shards), shards
            )
            dh, dcols, drows, d_samp, d_sn = canon_hash_batches(
                batches, names
            )
            ok, records["similarity_lsh_pairs"] = _compare(
                "similarity_lsh_pairs",
                rec, dh, dcols, drows, d_samp, d_sn,
                f"sum64+sample+spool+sharded{shards}",
            )
            failures += 0 if ok else 1

    if "corpus_pipeline_e2e" in gates:
        rec = side.get("corpus_pipeline_e2e")
        if rec is None:
            print("corpus_pipeline_e2e: no spark-side record, skip")
        else:
            names, batches = _e2e_staged_batches(con)
            dh, dcols, drows, d_samp, d_sn = canon_hash_batches(
                batches, names
            )
            ok, records["corpus_pipeline_e2e"] = _compare(
                "corpus_pipeline_e2e",
                rec, dh, dcols, drows, d_samp, d_sn,
                "sum64+sample+spool+staged",
            )
            failures += 0 if ok else 1

    if "dedup_semantic_clusters" in gates:
        erec = side.get("dedup_semantic_clusters.edges")
        frec = side.get("dedup_semantic_clusters")
        if erec is None or frec is None:
            print("dedup_semantic_clusters: missing spark-side records, skip")
        else:
            prior = {}
            if os.path.exists(artifact):
                with open(artifact) as f:
                    prior = (
                        json.load(f)
                        .get("sfs", {})
                        .get(sf_dir.rstrip("/").rsplit("sf", 1)[-1], {})
                        .get("dedup_semantic_clusters", {})
                        .get("edges", {})
                    )
            if (
                os.environ.get("SPARK_GRAFT_FIXPOINT_ONLY") == "1"
                and prior.get("status") == "ok"
            ):
                # the edge stage already verified in a prior run of this
                # artifact — reuse its record, re-run only the fixpoint
                ok_a, rec_a = True, prior
                print("dedup_semantic_clusters[edges]     OK (prior run)")
            else:
                # stage A: thresholded edge set, sharded
                names, batches = _sharded_batches(
                    con, _semantic_edges_shard_sql()(shards), shards
                )
                dh, dcols, drows, d_samp, d_sn = canon_hash_batches(
                    batches, names
                )
                ok_a, rec_a = _compare(
                    "dedup_semantic_clusters[edges]",
                    erec, dh, dcols, drows, d_samp, d_sn,
                    f"sum64+sample+spool+sharded{shards}",
                )
            # stage B: fixpoint over the (now verified) edge parquet
            glob = os.path.join(erec[EDGE_DIR_KEY], "*.parquet")
            fp_names, fp_batches = _semantic_fixpoint_batches(con, glob)
            dh, dcols, drows, d_samp, d_sn = canon_hash_batches(
                fp_batches, fp_names
            )
            ok_b, rec_b = _compare(
                "dedup_semantic_clusters[fixpoint]",
                frec, dh, dcols, drows, d_samp, d_sn,
                "sum64+sample+spool+2stage",
            )
            ok = ok_a and ok_b
            records["dedup_semantic_clusters"] = {
                **rec_b,
                "status": "ok" if ok else "fail",
                "hash_match": ok_a and ok_b,
                "hasher": (
                    f"2stage: edges sharded{shards} "
                    f"({'ok' if ok_a else 'FAIL'}) + fixpoint-on-verified-"
                    f"edges ({'ok' if ok_b else 'FAIL'})"
                ),
                "edges": rec_a,
            }
            failures += 0 if ok else 1

    print("FAILURES:", failures)
    if records:
        import datetime as dt

        sf_key = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        doc = {}
        if os.path.exists(artifact):
            with open(artifact) as f:
                doc = json.load(f)
        doc.setdefault("sfs", {}).setdefault(sf_key, {}).update(records)
        doc["generated_utc"] = dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        )
        doc["n_queries"] = {k: len(v) for k, v in doc["sfs"].items()}
        doc["n_failures"] = {
            k: sum(
                1
                for r in v.values()
                if r.get("status") not in ("ok", "rows-only")
            )
            for k, v in doc["sfs"].items()
        }
        with open(artifact, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"artifact -> {artifact} (sf {sf_key}, {len(records)} gates)")
    return 1 if failures else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--phase", choices=["spark", "duck"], required=True)
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument(
        "--gates",
        default="similarity_lsh_pairs,dedup_semantic_clusters",
    )
    args = ap.parse_args()
    gates = [g for g in args.gates.split(",") if g]
    if args.phase == "spark":
        spark_phase(args.sf_dir, args.artifact, gates)
        return 0
    return duck_phase(args.sf_dir, args.artifact, gates, args.shards)


if __name__ == "__main__":
    raise SystemExit(main())
