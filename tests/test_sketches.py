"""Accuracy contracts for the approximate-sketch gates. Since round 5
the gates are value-bearing: each emits the exact answer plus a
deterministic ``approx_ok`` boolean (sketch error within its published
contract) that the DuckDB oracle asserts TRUE — so the driver hash gate
itself checks sketch accuracy. These tests pin the mechanics
independently: the boolean must be true, and the underlying estimates
must actually satisfy the contract when recomputed from scratch."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestApproxDistinct:
    def test_gate_boolean_true_and_hll_within_contract(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY
        from market_microstructure_toolkit_spark.sources.events import (
            read_events,
        )

        rows = REGISTRY["events_approx_distinct"].spark(spark, sf_dir).collect()
        assert rows  # one per event_type
        for r in rows:
            assert r.exact_users > 0
            assert r.approx_ok, r.event_type

        # recompute the raw estimate to pin the 5-sigma rel-error bound
        # the gate boolean encodes (rsd 0.02 -> 0.10)
        est = {
            r.event_type: (r.approx, r.exact)
            for r in read_events(spark, sf_dir)
            .groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id", 0.02).alias("approx"),
                F.countDistinct("user_id").alias("exact"),
            )
            .collect()
        }
        for et, (approx, exact) in est.items():
            rel = abs(approx - exact) / exact
            assert rel <= 0.10, (et, rel)


class TestApproxQuantiles:
    def test_gate_boolean_true_and_gk_rank_error_within_contract(
        self, spark, sf_dir
    ):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY
        from market_microstructure_toolkit_spark.sources.events import (
            read_events,
        )

        ev_rows = (
            REGISTRY["events_approx_quantiles"].spark(spark, sf_dir).collect()
        )
        assert ev_rows
        for r in ev_rows:
            assert r.approx_ok, r.event_type
            assert r.q50_exact <= r.q90_exact <= r.q99_exact

        # independent replay of the GK rank-error check the gate encodes:
        # approx quantile's empirical rank within n*1e-4 + 1 of target
        ev = read_events(spark, sf_dir).select("event_type", "value").cache()
        try:
            qs = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
            approx = {
                r.event_type: (r.q, r.n)
                for r in ev.groupBy("event_type")
                .agg(
                    F.percentile_approx("value", qs, 10000).alias("q"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            }
            for et, (q, n) in approx.items():
                vals = ev.filter(F.col("event_type") == et)
                for target, av in zip((0.5, 0.9, 0.99), q):
                    rank = vals.filter(F.col("value") <= av).count()
                    assert abs(rank - target * n) <= n * 1e-4 + 1, (et, target)
        finally:
            ev.unpersist()
