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


class TestRollingSegmentedDegenerate:
    def test_empty_single_row_and_all_null(self, spark):
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            add_rolling_rv_segmented,
        )

        schema = (
            "exchange_id string, symbol string, ts_ms long,"
            " raw_nonce long, r double"
        )
        empty = _empty(spark, schema)
        assert (
            add_rolling_rv_segmented(
                empty, ret_col="r", window=5, order_col=["ts_ms", "raw_nonce"]
            ).count()
            == 0
        )
        one = spark.createDataFrame([("e", "S", 5, 0, 1.0)], schema)
        got = add_rolling_rv_segmented(
            one, ret_col="r", window=1, order_col=["ts_ms", "raw_nonce"]
        ).collect()
        assert len(got) == 1 and got[0]["rv"] == 1.0  # window=1: r^2
        nulls = spark.createDataFrame(
            [("e", "S", i, i, None) for i in range(6)], schema
        )
        got = add_rolling_rv_segmented(
            nulls, ret_col="r", window=3, order_col=["ts_ms", "raw_nonce"]
        ).collect()
        # count gate never reaches 3 non-null obs -> all NULL
        assert len(got) == 6 and all(r["rv"] is None for r in got)

    def test_null_order_and_null_key_rows_match_plain_window(self, spark):
        """ADVICE r7: NULL ts_ms rows must land where the plain window's
        asc-nulls-first sort puts them (segment 0, first), and NULL-key
        rows must survive the broadcast joins as their own group — both
        previously silent plain-vs-segmented divergences."""
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            add_cumulative,
            add_cumulative_segmented,
            add_rolling_rv,
            add_rolling_rv_segmented,
        )

        schema = (
            "exchange_id string, symbol string, ts_ms long,"
            " raw_nonce long, r double"
        )
        rows = [
            ("e", "S", None, 0, 0.5),   # NULL order value
            ("e", "S", None, 1, 0.25),
            ("e", None, 10, 2, 1.0),    # NULL key rows form a group
            ("e", None, 20, 3, 0.75),
            ("e", None, 30, 4, 0.5),
        ] + [("e", "S", 100 + i, 5 + i, float(i % 3) / 4.0) for i in range(20)]
        df = spark.createDataFrame(rows, schema)

        plain_rv = {
            r.raw_nonce: r.rv
            for r in add_rolling_rv(
                df, ret_col="r", window=3, order_col=["ts_ms", "raw_nonce"]
            ).collect()
        }
        seg_rv = {
            r.raw_nonce: r.rv
            for r in add_rolling_rv_segmented(
                df,
                ret_col="r",
                window=3,
                order_col=["ts_ms", "raw_nonce"],
                n_chunks=4,
            ).collect()
        }
        assert plain_rv == seg_rv and len(seg_rv) == len(rows)

        plain_cum = {
            r.raw_nonce: r.r_cum
            for r in add_cumulative(
                df, "r", order_col=["ts_ms", "raw_nonce"]
            ).collect()
        }
        seg_cum = {
            r.raw_nonce: r.r_cum
            for r in add_cumulative_segmented(
                df, "r", order_col=["ts_ms", "raw_nonce"], n_segments=4
            ).collect()
        }
        assert len(seg_cum) == len(rows)
        for k, v in plain_cum.items():
            assert seg_cum[k] == v, (k, v, seg_cum[k])

    def test_constant_ts_all_rows_one_segment(self, spark):
        """Every row shares one order value (zero span): segmentation
        must not divide by zero and ties stay in one segment; the
        raw_nonce tiebreak still gives a total order."""
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            add_rolling_rv,
            add_rolling_rv_segmented,
        )

        schema = (
            "exchange_id string, symbol string, ts_ms long,"
            " raw_nonce long, r double"
        )
        df = spark.createDataFrame(
            [("e", "S", 100, i, float(i % 4) / 4.0) for i in range(40)],
            schema,
        )
        plain = {
            r.raw_nonce: r.rv
            for r in add_rolling_rv(
                df, ret_col="r", window=7, order_col=["ts_ms", "raw_nonce"]
            ).collect()
        }
        seg = {
            r.raw_nonce: r.rv
            for r in add_rolling_rv_segmented(
                df,
                ret_col="r",
                window=7,
                order_col=["ts_ms", "raw_nonce"],
                n_chunks=8,
            ).collect()
        }
        assert plain == seg
