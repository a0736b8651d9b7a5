"""Accuracy contracts for the approximate-sketch gates (rows-only in the
driver gate — sketch internals are engine-specific, so the contract here
IS the correctness check)."""

from __future__ import annotations


class TestApproxDistinct:
    def test_hll_relative_error_within_contract(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = REGISTRY["events_approx_distinct"].spark(spark, sf_dir).collect()
        assert rows  # one per event_type
        for r in rows:
            assert r.exact_users > 0
            rel = abs(r.approx_users - r.exact_users) / r.exact_users
            # rsd 0.02; allow 5 sigma for small-cardinality wobble
            assert rel <= 0.10, (r.event_type, rel)


class TestApproxQuantiles:
    def test_gk_rank_error_within_contract(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY
        from pyspark.sql import functions as F

        ev_rows = (
            REGISTRY["events_approx_quantiles"].spark(spark, sf_dir).collect()
        )
        assert ev_rows
        # GK guarantees rank error <= 1/accuracy; verify via the exact
        # empirical CDF: the approx quantile's rank must be within
        # n * (target + 1/accuracy) of the target rank.
        from market_microstructure_toolkit_spark.sources.events import (
            read_events,
        )

        ev = read_events(spark, sf_dir).select("event_type", "value").cache()
        try:
            for r in ev_rows:
                vals = ev.filter(F.col("event_type") == r.event_type)
                n = r.n_events
                for target, approx in zip((0.5, 0.9, 0.99), r.approx_q):
                    rank = vals.filter(F.col("value") <= approx).count()
                    assert abs(rank - target * n) <= n * (1e-4) + 1, (
                        r.event_type,
                        target,
                    )
        finally:
            ev.unpersist()
