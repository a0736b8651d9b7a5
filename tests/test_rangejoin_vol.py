"""interval_overlap_join semantics + bipower/Hayashi-Yoshida estimators
on hand-computed fixtures (the gate queries pin the cross-engine hashes;
these pin the math)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.operators.rangejoin import (
    interval_overlap_join,
)


def _ivl(spark, rows, side):
    return spark.createDataFrame(
        [(k, s, e, i) for k, s, e, i in rows],
        f"k string, s_{side} long, e_{side} long, id_{side} long",
    )


class TestIntervalOverlapJoin:
    def test_overlap_and_non_overlap(self, spark):
        left = _ivl(spark, [("x", 0, 10, 1), ("x", 20, 30, 2)], "a")
        right = _ivl(spark, [("x", 5, 15, 10), ("x", 40, 50, 11)], "b")
        got = interval_overlap_join(
            left, right, ("k",), "s_a", "e_a", "s_b", "e_b", bin_ms=8
        ).select("id_a", "id_b").collect()
        assert [(r.id_a, r.id_b) for r in got] == [(1, 10)]

    def test_half_open_touching_spans_do_not_match(self, spark):
        # [0,10) and [10,20): share only the boundary instant -> no pair
        left = _ivl(spark, [("x", 0, 10, 1)], "a")
        right = _ivl(spark, [("x", 10, 20, 10)], "b")
        assert (
            interval_overlap_join(
                left, right, ("k",), "s_a", "e_a", "s_b", "e_b", bin_ms=4
            ).count()
            == 0
        )

    def test_multi_bin_pair_emitted_once(self, spark):
        # both spans cover bins 0..12 with bin_ms=4 -> without the
        # overlap-start dedup the pair would appear ~13 times
        left = _ivl(spark, [("x", 0, 50, 1)], "a")
        right = _ivl(spark, [("x", 1, 49, 10)], "b")
        got = interval_overlap_join(
            left, right, ("k",), "s_a", "e_a", "s_b", "e_b", bin_ms=4
        ).count()
        assert got == 1

    def test_degenerate_and_cross_key_excluded(self, spark):
        left = _ivl(spark, [("x", 5, 5, 1), ("y", 0, 10, 2)], "a")
        right = _ivl(spark, [("x", 0, 10, 10)], "b")
        assert (
            interval_overlap_join(
                left, right, ("k",), "s_a", "e_a", "s_b", "e_b", bin_ms=4
            ).count()
            == 0
        )

    def test_extra_cond_applied(self, spark):
        left = _ivl(spark, [("x", 0, 10, 1), ("x", 0, 10, 2)], "a")
        right = _ivl(spark, [("x", 0, 10, 1), ("x", 0, 10, 2)], "b")
        got = interval_overlap_join(
            left,
            right,
            ("k",),
            "s_a",
            "e_a",
            "s_b",
            "e_b",
            bin_ms=16,
            extra_cond=F.col("id_a") < F.col("id_b"),
        ).count()
        assert got == 1  # only (1, 2)


class TestEstimatorMath:
    def test_bipower_flags_jump(self, spark, sf_dir):
        """A pure-diffusion tape has jump_frac 0 (BV/RV -> pi/2 > 1,
        clipped); the estimator itself: with constant |r| = c over n
        returns, RV = n c^2 and BV = (pi/2)(n-1) c^2."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        out = {
            r.symbol: r
            for r in REGISTRY["book_bipower_jump"]
            .spark(spark, sf_dir)
            .collect()
        }
        for r in out.values():
            assert r.realized_var >= 0 and r.bipower_var >= 0
            assert 0.0 <= r.jump_frac <= 1.0
            assert r.n_returns > 0

    def test_hayashi_yoshida_known_value(self, spark):
        """Two async tapes: A has intervals [0,10) r=.1, [10,30) r=.2;
        B has [0,15) r=.3, [15,30) r=-.1. Overlaps: (A1,B1), (A2,B1),
        (A2,B2) -> HY = .1*.3 + .2*.3 + .2*(-.1) = 0.07."""
        rows = [
            ("e", "A", 0, 10, 0.1),
            ("e", "A", 10, 30, 0.2),
            ("e", "B", 0, 15, 0.3),
            ("e", "B", 15, 30, -0.1),
        ]
        ivl = spark.createDataFrame(
            rows, "exchange_id string, symbol string, s long, e long, r double"
        )
        a = ivl.select(
            "exchange_id",
            F.col("symbol").alias("sym_a"),
            F.col("s").alias("s_a"),
            F.col("e").alias("e_a"),
            F.col("r").alias("r_a"),
        )
        b = ivl.select(
            "exchange_id",
            F.col("symbol").alias("sym_b"),
            F.col("s").alias("s_b"),
            F.col("e").alias("e_b"),
            F.col("r").alias("r_b"),
        )
        row = (
            interval_overlap_join(
                a,
                b,
                ("exchange_id",),
                "s_a",
                "e_a",
                "s_b",
                "e_b",
                bin_ms=8,
                extra_cond=F.col("sym_a") < F.col("sym_b"),
            )
            .agg(
                F.sum(F.col("r_a") * F.col("r_b")).alias("hy"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()[0]
        )
        assert row.n == 3
        assert row.hy == pytest.approx(0.07, abs=1e-12)

    def test_hy_gate_no_cartesian(self, spark, sf_dir):
        """The gate plan must contain no nested-loop/cartesian join —
        the bucketized equi-join is the whole point."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        plan = (
            REGISTRY["book_hayashi_yoshida"]
            .spark(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestAsofBackwardUnion:
    def _run(self, spark, snaps, tgts, **kw):
        from market_microstructure_toolkit_spark.operators.asof import (
            asof_backward_union,
        )

        s = spark.createDataFrame(
            snaps, "k string, ts_ms long, raw_nonce long, v double"
        )
        t = spark.createDataFrame(
            tgts, "k string, ts_ms long, tid long"
        )
        return asof_backward_union(
            s,
            t,
            keys=("k",),
            ts_col="ts_ms",
            value_cols=("v",),
            target_payload_cols=("tid",),
            **kw,
        ).collect()

    def test_backward_pick_and_pre_first_null(self, spark):
        out = {
            r.tid: (r.src_ts_ms, r.v)
            for r in self._run(
                spark,
                [("x", 10, 1, 1.0), ("x", 20, 2, 2.0)],
                [("x", 5, 100), ("x", 15, 101), ("x", 25, 102)],
            )
        }
        assert out[100] == (None, None)  # before first snapshot
        assert out[101] == (10, 1.0)
        assert out[102] == (20, 2.0)

    def test_equal_ts_snapshot_counts_and_dup_resolves_to_max_nonce(
        self, spark
    ):
        out = {
            r.tid: (r.src_ts_ms, r.v)
            for r in self._run(
                spark,
                # two snapshots at ts=10: nonce 2 (v=9) must win
                [("x", 10, 1, 1.0), ("x", 10, 2, 9.0)],
                [("x", 10, 100)],
            )
        }
        assert out[100] == (10, 9.0)

    def test_keys_partition_streams(self, spark):
        out = {
            r.tid: r.v
            for r in self._run(
                spark,
                [("x", 10, 1, 1.0)],
                [("y", 20, 100)],  # other key: no snapshot visible
            )
        }
        assert out[100] is None

    def test_atomic_carry_no_row_tearing(self, spark):
        """THE round-7 fix: the matched snapshot carries ATOMICALLY.
        If the latest at-or-before snapshot has a NULL value column,
        the output must be (its ts, NULL) — a per-column
        last(ignorenulls) carry would instead pair the new src_ts_ms
        with the OLDER snapshot's value, a row that never existed."""
        out = {
            r.tid: (r.src_ts_ms, r.v)
            for r in self._run(
                spark,
                # ts=10 has v=1.0; ts=20 (the match for tid 101) has v=NULL
                [("x", 10, 1, 1.0), ("x", 20, 2, None)],
                [("x", 15, 100), ("x", 25, 101)],
            )
        }
        assert out[100] == (10, 1.0)
        assert out[101] == (20, None)  # NOT (20, 1.0): no tearing

    def test_no_join_in_plan(self, spark, sf_dir):
        """The whole point: a plan with no join operator at all."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        plan = (
            REGISTRY["book_cross_asset_align"]
            .spark(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan
        assert "CartesianProduct" not in plan


class TestSortedIntervalOverlapPairs:
    def _pairs(self, spark, left, right):
        from market_microstructure_toolkit_spark.operators.rangejoin import (
            sorted_interval_overlap_pairs,
        )

        l = spark.createDataFrame(
            left, "k string, s_a long, e_a long, r_a double"
        )
        r = spark.createDataFrame(
            right, "k string, s_b long, e_b long, r_b double"
        )
        return sorted_interval_overlap_pairs(
            l, r, ("k",), "s_a", "e_a", "s_b", "e_b"
        )

    def test_matches_known_overlap_set(self, spark):
        """Same fixture as the HY known-value test: overlaps are
        (A1,B1), (A2,B1), (A2,B2); HY = .1*.3 + .2*.3 + .2*(-.1)."""
        out = self._pairs(
            spark,
            [("e", 0, 10, 0.1), ("e", 10, 30, 0.2)],
            [("e", 0, 15, 0.3), ("e", 15, 30, -0.1)],
        )
        got = sorted((r.s_a, r.s_b) for r in out.collect())
        assert got == [(0, 0), (10, 0), (10, 15)]
        import pytest as _pytest

        hy = out.agg(F.sum(F.col("r_a") * F.col("r_b"))).collect()[0][0]
        assert hy == _pytest.approx(0.07, abs=1e-12)

    def test_half_open_touching_excluded_both_directions(self, spark):
        # B ends exactly where A starts, and B2 starts exactly where A
        # ends -> neither is an overlap under [s, e)
        out = self._pairs(
            spark,
            [("e", 10, 20, 1.0)],
            [("e", 0, 10, 1.0), ("e", 20, 30, 1.0)],
        )
        assert out.count() == 0

    def test_contiguous_range_under_burst(self, spark):
        # one wide A interval spanning a burst of 5 hairline B intervals
        # -> exactly 5 true pairs, no bin parameter involved
        out = self._pairs(
            spark,
            [("e", 0, 1000, 1.0)],
            [("e", 100 + i, 101 + i, 1.0) for i in range(5)],
        )
        assert out.count() == 5

    def test_keys_isolate(self, spark):
        out = self._pairs(
            spark,
            [("x", 0, 10, 1.0)],
            [("y", 0, 10, 1.0)],
        )
        assert out.count() == 0

    def test_duplicate_left_start_raises_not_fans_out(self, spark):
        """Contract guard: duplicate left_start within a key would make
        the (keys, left_start) join-back silently fan out; the guard
        must turn that into an execution-time error instead."""
        out = self._pairs(
            spark,
            [("e", 0, 10, 1.0), ("e", 0, 12, 2.0)],  # duplicate start 0
            [("e", 0, 15, 0.3)],
        )
        with pytest.raises(Exception, match="strictly-increasing-starts"):
            out.collect()

    def test_duplicate_start_other_key_unaffected(self, spark):
        """The guard is per-key: a clean key must not be poisoned by a
        violating one when filtered before execution."""
        from market_microstructure_toolkit_spark.operators.rangejoin import (
            sorted_interval_overlap_pairs,
        )

        l = spark.createDataFrame(
            [("bad", 0, 10, 1.0), ("bad", 0, 12, 2.0), ("ok", 0, 10, 3.0)],
            "k string, s_a long, e_a long, r_a double",
        )
        r = spark.createDataFrame(
            [("ok", 5, 15, 0.3)], "k string, s_b long, e_b long, r_b double"
        )
        got = sorted_interval_overlap_pairs(
            l.filter(F.col("k") == "ok"),
            r,
            ("k",),
            "s_a",
            "e_a",
            "s_b",
            "e_b",
        ).collect()
        assert [(row.s_a, row.s_b) for row in got] == [(0, 5)]

    def test_check_contract_off_preserves_legacy_behavior(self, spark):
        """check_contract=False skips the guard window entirely (for
        callers that proved monotonicity upstream): valid input returns
        the same pairs, and no raise_error appears in the plan."""
        from market_microstructure_toolkit_spark.operators.rangejoin import (
            sorted_interval_overlap_pairs,
        )

        l = spark.createDataFrame(
            [("e", 0, 10, 0.1), ("e", 10, 30, 0.2)],
            "k string, s_a long, e_a long, r_a double",
        )
        r = spark.createDataFrame(
            [("e", 0, 15, 0.3), ("e", 15, 30, -0.1)],
            "k string, s_b long, e_b long, r_b double",
        )
        out = sorted_interval_overlap_pairs(
            l, r, ("k",), "s_a", "e_a", "s_b", "e_b", check_contract=False
        )
        assert "raise_error" not in out._jdf.queryExecution().analyzed().toString()
        got = sorted((row.s_a, row.s_b) for row in out.collect())
        assert got == [(0, 0), (10, 0), (10, 15)]


class TestSortedOverlapProperty:
    def test_matches_bruteforce_on_random_sorted_streams(self, spark):
        """Property: for random sorted tick streams (random gaps incl.
        bursts), the merge join's pair set equals the brute-force
        O(n*m) overlap set."""
        import random

        rng = random.Random(1234)
        for trial in range(5):
            def stream(n):
                t, out = 0, []
                for _ in range(n):
                    prev = t
                    # bursty: mostly hairline steps, occasional huge gap
                    t += rng.choice([1, 1, 2, 3, 500, 10_000])
                    out.append((prev, t))
                return out
            A = stream(rng.randint(5, 40))
            B = stream(rng.randint(5, 40))
            expect = sorted(
                (sa, sb)
                for (sa, ea) in A
                for (sb, eb) in B
                if sa < eb and sb < ea
            )
            from market_microstructure_toolkit_spark.operators.rangejoin import (
                sorted_interval_overlap_pairs,
            )

            l = spark.createDataFrame(
                [("k", s, e, 0.0) for s, e in A],
                "k string, s_a long, e_a long, r_a double",
            )
            r = spark.createDataFrame(
                [("k", s, e, 0.0) for s, e in B],
                "k string, s_b long, e_b long, r_b double",
            )
            got = sorted(
                (row.s_a, row.s_b)
                for row in sorted_interval_overlap_pairs(
                    l, r, ("k",), "s_a", "e_a", "s_b", "e_b"
                ).collect()
            )
            assert got == expect, f"trial {trial}"
