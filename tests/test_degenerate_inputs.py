"""Degenerate-input robustness: core operators must return EMPTY (or the
correct trivial answer), never crash, on empty frames, single rows, and
all-null columns — the edge a production pipeline hits on its first
(or gappiest) partition of the day."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.operators import dedup as D
from market_microstructure_toolkit_spark.operators.cdc import apply_cdc
from market_microstructure_toolkit_spark.operators.rangejoin import (
    sorted_interval_overlap_pairs,
)
from market_microstructure_toolkit_spark.operators.window_metrics import (
    add_cumulative_segmented,
)


def _empty(spark, ddl):
    return spark.createDataFrame([], ddl)


class TestEmptyInputs:
    def test_apply_cdc_empty_changes_is_identity(self, spark):
        base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        chg = _empty(spark, "k long, v string, op string")
        got = sorted(
            (r.k, r.v) for r in apply_cdc(base, chg, "k").collect()
        )
        assert got == [(1, "a"), (2, "b")]

    def test_apply_cdc_empty_base_inserts_all(self, spark):
        base = _empty(spark, "k long, v string")
        chg = spark.createDataFrame(
            [(1, "a", "U"), (2, None, "D")], "k long, v string, op string"
        )
        got = {r.k: r.v for r in apply_cdc(base, chg, "k").collect()}
        assert got == {1: "a"}

    def test_exact_dedup_empty(self, spark):
        assert D.exact_dedup(_empty(spark, "doc_id long, text string")).count() == 0

    def test_minhash_candidates_empty_and_singleton(self, spark):
        empty = _empty(spark, "doc_id long, text string")
        assert D.minhash_lsh_candidates(empty).count() == 0
        one = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        assert D.minhash_lsh_candidates(one).count() == 0

    def test_sorted_overlap_empty_sides(self, spark):
        l = _empty(spark, "k string, s_a long, e_a long")
        r = spark.createDataFrame([("x", 0, 10)], "k string, s_b long, e_b long")
        assert sorted_interval_overlap_pairs(
            l, r, ("k",), "s_a", "e_a", "s_b", "e_b"
        ).count() == 0
        assert sorted_interval_overlap_pairs(
            r.selectExpr("k", "s_b as s_a", "e_b as e_a"),
            _empty(spark, "k string, s_b long, e_b long"),
            ("k",),
            "s_a",
            "e_a",
            "s_b",
            "e_b",
        ).count() == 0

    def test_segmented_cumsum_empty_and_single_row(self, spark):
        empty = _empty(spark, "exchange_id string, symbol string, ts_ms long, x double")
        assert add_cumulative_segmented(empty, "x").count() == 0
        one = spark.createDataFrame(
            [("e", "S", 5, 2.5)],
            "exchange_id string, symbol string, ts_ms long, x double",
        )
        got = add_cumulative_segmented(one, "x").collect()
        assert len(got) == 1 and got[0]["x_cum"] == 2.5

    def test_contamination_empty_benchmark_flags_nothing(self, spark):
        corpus = spark.createDataFrame(
            [(1, "a b c d")], "doc_id long, text string"
        )
        bench = _empty(spark, "doc_id long, text string")
        assert D.contamination_flags(corpus, bench).count() == 0


class TestAllNullColumns:
    def test_cumulative_all_null_stays_null(self, spark):
        df = spark.createDataFrame(
            [("e", "S", i, None) for i in range(5)],
            "exchange_id string, symbol string, ts_ms long, x double",
        )
        got = add_cumulative_segmented(df, "x").collect()
        assert len(got) == 5 and all(r["x_cum"] is None for r in got)

    def test_minhash_all_short_docs_no_rows(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, "x")], "doc_id long, text string"
        )
        assert D.minhash_signatures(df).count() == 0
        assert D.minhash_lsh_candidates(df).count() == 0
