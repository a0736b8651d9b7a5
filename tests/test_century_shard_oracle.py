"""Shard-invariance of the century decomposed oracles.

The sharded DuckDB oracle (tools/century_shard_oracle.py) claims that
chaining K disjoint ``id_a % K`` shards through the order-invariant
canon hasher is bit-identical to the monolithic query. These tests pin
that claim on real fixture data, duck-vs-duck (no Spark in the loop, so
a failure isolates the decomposition itself):

1. sharded similarity_lsh_pairs == monolithic similarity_lsh_pairs;
2. sharded semantic edge set == monolithic thresholded pair set;
3. the stage-B fixpoint SQL over an edge parquet == the gate's own
   monolithic SQL (same minlabel rounds, edges from parquet instead of
   inline CTEs).
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata absent"
)


def _con():
    import tools.century_shard_oracle as cso

    return cso._duck_con(SF_DIR)


def _hash_sql(con, sql):
    """Hash via check_oracle's OWN duck transport — the transport the
    real spool comparison uses. The first sf100 run failed precisely
    because the shard tool used a different Arrow->pandas mapping than
    the spark spool side (plain ints vs nullable-Int64 repr strings);
    hashing the monolith through _duckdb_batches pins that the sharded
    transport matches it bit-for-bit."""
    from tools.check_oracle import _duckdb_batches, canon_hash_batches

    names, batches = _duckdb_batches(con, sql, chunk_rows=65536)
    return canon_hash_batches(batches, names)


def test_lsh_pairs_shards_equal_monolith():
    import tools.century_shard_oracle as cso
    from market_microstructure_toolkit_spark.plans.similarity_queries import (
        _LSH_PAIRS_SQL,
    )

    con = _con()
    full = _hash_sql(con, _LSH_PAIRS_SQL)
    for k in (3, 7):
        names, batches = cso._sharded_batches(
            con, cso._lsh_pairs_shard_sql()(k), k
        )
        sharded = cso.canon_hash_batches(batches, names)
        assert sharded == full, (k, sharded, full)


def test_semantic_edges_shards_equal_monolith():
    import tools.century_shard_oracle as cso
    from market_microstructure_toolkit_spark.plans.corpus_queries import (
        _BANDED_PAIR_CTES,
    )

    con = _con()
    full_sql = (
        "WITH "
        + _BANDED_PAIR_CTES
        + "\nSELECT id_a, id_b FROM pairs WHERE ROUND(cos_sim, 6) >= 0.25"
    )
    full = _hash_sql(con, full_sql)
    names, batches = cso._sharded_batches(
        con, cso._semantic_edges_shard_sql()(5), 5
    )
    sharded = cso.canon_hash_batches(batches, names)
    assert sharded == full


def test_fixpoint_on_edge_parquet_equals_gate_sql(tmp_path):
    import tools.century_shard_oracle as cso
    from market_microstructure_toolkit_spark.plans.corpus_queries import (
        _BANDED_PAIR_CTES,
        _SEMANTIC_CLUSTERS_SQL,
    )

    con = _con()
    # materialize the thresholded pair set to parquet, as stage A does
    edir = tmp_path / "edges"
    edir.mkdir()
    con.execute(
        "COPY (WITH "
        + _BANDED_PAIR_CTES
        + "\nSELECT id_a, id_b FROM pairs WHERE ROUND(cos_sim, 6) >= 0.25)"
        + f" TO '{edir}/part.parquet' (FORMAT parquet)"
    )
    full = _hash_sql(con, _SEMANTIC_CLUSTERS_SQL)
    names, batches = cso._semantic_fixpoint_batches(
        con, f"{edir}/*.parquet"
    )
    staged = cso.canon_hash_batches(batches, names)
    assert staged == full


def test_e2e_staged_equals_monolith():
    """Staged == the gate's REGISTERED oracle — i.e. the monolith AFTER
    the plants rewrite. Comparing against the raw module constant would
    miss the planted documents CTE, which is exactly the sf100 bug this
    pins (stage-1 survivor counts off by the planted-doc count)."""
    import tools.century_shard_oracle as cso
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    con = _con()
    full = _hash_sql(con, REGISTRY["corpus_pipeline_e2e"].sql)
    names, batches = cso._e2e_staged_batches(con, contam_shards=3)
    staged = cso.canon_hash_batches(batches, names)
    assert staged == full
