"""Trade-tape estimators (operators/trades.py): Lee-Ready signs, VPIN
buckets, Kyle lambda, effective/realized spread — pinned on tiny
hand-computed tapes, plus plan/scale shape checks on the gate fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.operators import trades as T

KEYS = ["sym"]
ORDER = ["t"]


def _tape(spark, rows):
    return spark.createDataFrame(
        [(sym, t, float(p), float(m), float(q)) for sym, t, p, m, q in rows],
        "sym string, t long, price double, mid double, qty double",
    )


class TestLeeReady:
    def test_quote_rule_dominates(self, spark):
        tape = _tape(
            spark,
            [
                ("A", 1, 10.1, 10.0, 1.0),  # above mid -> buy
                ("A", 2, 9.9, 10.0, 1.0),  # below mid -> sell
            ],
        )
        out = (
            T.classify_lee_ready(tape, KEYS, ORDER)
            .orderBy("t")
            .select("side")
            .collect()
        )
        assert [r.side for r in out] == [1, -1]

    def test_tick_rule_at_midpoint(self, spark):
        # 3rd print at the mid: last price CHANGE was down (10.1 -> 10.0),
        # so the tick rule says sell; 4th at the mid after an uptick -> buy.
        tape = _tape(
            spark,
            [
                ("A", 1, 10.1, 10.0, 1.0),
                ("A", 2, 10.0, 10.05, 1.0),  # below its mid -> sell
                ("A", 3, 10.0, 10.0, 1.0),  # midpoint, downtick -> -1
                ("A", 4, 10.2, 10.1, 1.0),  # above mid -> buy
                ("A", 5, 10.2, 10.2, 1.0),  # midpoint, zero-tick: carry +1
            ],
        )
        out = (
            T.classify_lee_ready(tape, KEYS, ORDER)
            .orderBy("t")
            .select("side")
            .collect()
        )
        assert [r.side for r in out] == [1, -1, -1, 1, 1]

    def test_first_midpoint_unclassifiable(self, spark):
        tape = _tape(spark, [("A", 1, 10.0, 10.0, 1.0)])
        out = T.classify_lee_ready(tape, KEYS, ORDER).collect()
        assert out[0].side == 0

    def test_partitioned_per_symbol(self, spark):
        # B's tape must not see A's ticks: B's first midpoint print is 0.
        tape = _tape(
            spark,
            [
                ("A", 1, 9.0, 10.0, 1.0),
                ("A", 2, 11.0, 10.0, 1.0),
                ("B", 3, 10.0, 10.0, 1.0),
            ],
        )
        out = {
            (r.sym, r.t): r.side
            for r in T.classify_lee_ready(tape, KEYS, ORDER).collect()
        }
        assert out[("B", 3)] == 0


class TestVolumeBucketsAndVpin:
    def test_bucket_assignment_pre_trade_cumvol(self, spark):
        # V=2: trades of qty 1 each -> cum_prev 0,1,2,3 -> buckets 0,0,1,1
        tape = _tape(
            spark,
            [("A", i, 10.0 + i, 10.0, 1.0) for i in range(1, 5)],
        )
        out = (
            T.add_volume_buckets(tape, 2.0, KEYS, ORDER)
            .orderBy("t")
            .select("bucket")
            .collect()
        )
        assert [r.bucket for r in out] == [0, 0, 1, 1]

    def test_vpin_imbalance(self, spark):
        # one bucket: buys 3.0, sells 1.0, total 4.0 -> vpin 0.5
        tape = _tape(
            spark,
            [
                ("A", 1, 10.1, 10.0, 2.0),  # buy 2
                ("A", 2, 10.1, 10.0, 1.0),  # buy 1
                ("A", 3, 9.9, 10.0, 1.0),  # sell 1
            ],
        )
        classified = T.classify_lee_ready(tape, KEYS, ORDER)
        row = T.vpin(classified, 100.0, KEYS, ORDER).collect()[0]
        assert row.buy_vol == 3.0 and row.sell_vol == 1.0
        assert row.total_vol == 4.0 and row.n_trades == 3
        assert row.vpin == pytest.approx(0.5)

    def test_unclassified_counts_volume_not_flow(self, spark):
        tape = _tape(spark, [("A", 1, 10.0, 10.0, 5.0)])  # side 0
        row = T.vpin(
            T.classify_lee_ready(tape, KEYS, ORDER), 100.0, KEYS, ORDER
        ).collect()[0]
        assert row.buy_vol == 0.0 and row.sell_vol == 0.0
        assert row.total_vol == 5.0 and row.vpin == 0.0


class TestKyleLambda:
    def test_exact_linear_impact_recovered(self, spark):
        # mid moves exactly 0.01 per unit signed volume -> lambda = 0.01
        rows, mid = [], 100.0
        svols = [2.0, -1.0, 3.0, -2.0, 1.0]
        for i, sv in enumerate(svols, start=1):
            mid += 0.01 * sv
            side = 1.0 if sv > 0 else -1.0
            rows.append(("A", i, mid + side * 0.001, mid, abs(sv)))
        tape = _tape(spark, rows)
        classified = T.classify_lee_ready(tape, KEYS, ORDER)
        row = T.kyle_lambda(classified, KEYS, ORDER).collect()[0]
        # first dmid is NULL (no lag) -> 4 ticks enter the regression
        assert row.n_ticks == len(svols) - 1
        assert row.kyle_lambda == pytest.approx(0.01, abs=1e-6)


class TestEffectiveRealizedSpread:
    def test_decomposition(self, spark):
        # buy at 10.05 vs mid 10.0 -> eff 0.1; mid 1 ahead is 10.02
        # -> realized 2*(10.05-10.02)=0.06, impact 0.04
        tape = _tape(
            spark,
            [
                ("A", 1, 10.05, 10.0, 1.0),
                ("A", 2, 10.0, 10.02, 1.0),
            ],
        )
        classified = T.classify_lee_ready(tape, KEYS, ORDER)
        row = T.effective_realized_spread(
            classified, 1, KEYS, ORDER
        ).collect()[0]
        assert row.avg_effective_spread == pytest.approx((0.1 + 0.04) / 2)
        # only trade 1 has a 1-ahead mid
        assert row.n_classified_with_future == 1
        assert row.avg_realized_spread == pytest.approx(0.06)
        assert row.avg_price_impact == pytest.approx(0.04)

    def test_side0_excluded(self, spark):
        tape = _tape(spark, [("A", 1, 10.0, 10.0, 1.0)])
        row = T.effective_realized_spread(
            T.classify_lee_ready(tape, KEYS, ORDER), 1, KEYS, ORDER
        ).collect()[0]
        assert row.avg_effective_spread is None
        assert row.n_classified_with_future == 0


class TestGateFixtureShape:
    def test_synthetic_tape_exercises_all_branches(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.book import (
            synthetic_trades,
        )

        tape = synthetic_trades(spark, sf_dir)
        sides = (
            T.classify_lee_ready(
                tape, ["exchange_id", "symbol"], ["ts_ms", "raw_nonce"]
            )
            .groupBy("side")
            .count()
            .collect()
        )
        got = {r.side for r in sides}
        assert {1, -1}.issubset(got)
        # midpoint prints exist (raw_nonce % 7 == 3) and nearly all
        # resolve via the tick rule, so side 0 is rare but the +/- spread
        # is exercised
        n = tape.count()
        assert sum(r["count"] for r in sides) == n

    def test_no_global_window_in_plans(self, spark, sf_dir):
        """Every trade-tier window partitions by instrument keys."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        for q in (
            "trade_signs_lee_ready",
            "trade_vpin",
            "trade_kyle_lambda",
            "trade_effective_spread",
        ):
            plan = (
                REGISTRY[q]
                .spark(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "Window" in plan
            import re

            assert not re.search(r"Window \[[^\]]*\], \[\], \[[^\]]*\]", plan), q


class TestStreamingLeeReady:
    def test_tick_state_crosses_batch_boundary(self, spark, tmp_path):
        """The deciding tick lands in batch 1; the midpoint print that
        needs it lands in batch 2 — only carried state can classify it."""
        import time

        from market_microstructure_toolkit_spark.streaming.trade_stream import (
            stateful_lee_ready,
        )

        rows_a = [  # batch 1: buy above mid, then the downtick
            ("e", "A", 1, 1, 10.0, 10.1, 1.0),  # price 10.1 > mid -> +1
            ("e", "A", 2, 2, 10.05, 10.0, 1.0),  # 10.0 < mid; downtick -1
        ]
        rows_b = [  # zero-tick midpoint print: needs the batch-1 sign
            ("e", "A", 3, 3, 10.0, 10.0, 1.0),
        ]
        schema = (
            "exchange_id string, symbol string, ts_ms long, raw_nonce long,"
            " mid double, price double, qty double"
        )
        base = str(tmp_path)
        spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(
            f"{base}/data/a"
        )
        time.sleep(0.05)
        spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(
            f"{base}/data/b"
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/data/*/")
        )
        q = (
            stateful_lee_ready(stream)
            .writeStream.format("memory")
            .queryName("signs_state_test")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.raw_nonce: r.side
            for r in spark.table("signs_state_test").collect()
        }
        assert got == {1: 1, 2: -1, 3: -1}


class TestMrrDecomposition:
    def test_two_regressor_ols_recovers_exact_coefficients(self, spark):
        """Tape built so dp_t = 0.02*x_t - 0.005*x_{t-1} EXACTLY: the
        closed-form normal-equation solve must recover both
        coefficients to rounding precision."""
        import itertools

        a_true, b_true = 0.02, -0.005
        # alternating-ish sign pattern with varied autocorrelation
        signs = [1, 1, -1, 1, -1, -1, 1, -1, 1, 1, -1, 1]
        rows, price = [], 100.0
        prev = 0
        for t, x in enumerate(signs, start=1):
            if t > 1:
                price += a_true * x + b_true * prev
            # quote rule must reproduce x: put the print on the right
            # side of a mid chosen around the price
            mid = price - x * 0.001
            rows.append(("A", t, price, mid, 1.0))
            prev = x
        tape = _tape(spark, rows)
        from pyspark.sql import Window
        from market_microstructure_toolkit_spark.operators import trades as T

        classified = T.classify_lee_ready(tape, KEYS, ORDER)
        w = Window.partitionBy("sym").orderBy("t")
        staged = classified.select(
            "sym",
            (F.col("price") - F.lag("price").over(w)).alias("dp"),
            F.col("side").cast("double").alias("x"),
            F.lag(F.col("side").cast("double")).over(w).alias("xl"),
        ).filter(F.col("dp").isNotNull() & F.col("xl").isNotNull())
        m = staged.groupBy("sym").agg(
            F.var_samp("x").alias("sxx"),
            F.var_samp("xl").alias("sll"),
            F.covar_samp("x", "xl").alias("sxl"),
            F.covar_samp("dp", "x").alias("syx"),
            F.covar_samp("dp", "xl").alias("syl"),
        )
        det = F.col("sxx") * F.col("sll") - F.col("sxl") * F.col("sxl")
        row = m.select(
            (
                (F.col("syx") * F.col("sll") - F.col("syl") * F.col("sxl"))
                / det
            ).alias("a"),
            (
                (F.col("syl") * F.col("sxx") - F.col("syx") * F.col("sxl"))
                / det
            ).alias("b"),
        ).collect()[0]
        assert row.a == pytest.approx(a_true, abs=1e-9)
        assert row.b == pytest.approx(b_true, abs=1e-9)


class TestL1EventInference:
    def test_event_hierarchy(self, spark, sf_dir):
        """Gate output covers the taxonomy and counts add up to the
        tape length; price moves must dominate size moves."""
        from market_microstructure_toolkit_spark.plans.book import (
            synthetic_book,
        )
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        out = REGISTRY["book_l1_event_inference"].spark(spark, sf_dir)
        rows = out.collect()
        n = sum(r.n_ticks for r in rows)
        assert n == synthetic_book(spark, sf_dir).count()
        bid_kinds = {r.bid_event for r in rows}
        assert {"bid_improve", "bid_worsen", "first"}.issubset(bid_kinds)


class TestStreamingVpin:
    def test_volume_clock_crosses_batch_boundary(self, spark, tmp_path):
        """Bucket volume 4: batch 1 trades fill 3 units of the first
        bucket; batch 2's first trade (qty 2) must still land in bucket
        0's... no — pre-trade cum is 3 < 4 -> bucket 0, and the next
        (cum 5) opens bucket 1. Only carried cumulative volume gets
        this right; per-batch clocks would reset to bucket 0."""
        import time

        from market_microstructure_toolkit_spark.streaming.trade_stream import (
            stateful_signed_buckets,
        )

        schema = (
            "exchange_id string, symbol string, ts_ms long, raw_nonce long,"
            " mid double, price double, qty double"
        )
        rows_a = [
            ("e", "A", 1, 1, 10.0, 10.1, 1.0),
            ("e", "A", 2, 2, 10.0, 10.1, 2.0),
        ]
        rows_b = [
            ("e", "A", 3, 3, 10.0, 10.1, 2.0),  # pre-cum 3 -> bucket 0
            ("e", "A", 4, 4, 10.0, 10.1, 1.0),  # pre-cum 5 -> bucket 1
        ]
        base = str(tmp_path)
        spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(
            f"{base}/data/a"
        )
        time.sleep(0.05)
        spark.createDataFrame(rows_b, schema).coalesce(1).write.parquet(
            f"{base}/data/b"
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/data/*/")
        )
        q = (
            stateful_signed_buckets(stream, 4.0)
            .writeStream.format("memory")
            .queryName("vpin_state_test")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.raw_nonce: (r.bucket, r.side)
            for r in spark.table("vpin_state_test").collect()
        }
        assert got == {1: (0, 1), 2: (0, 1), 3: (0, 1), 4: (1, 1)}


class TestOutlierWinsorize:
    def test_planted_spikes_flagged_exactly(self, spark, sf_dir):
        """The fixture plants a +5% spike on every 211th print; the MAD
        flag must fire on exactly those nonces (5% of price >> 5 MADs of
        the quarter-spread offsets) and nothing else."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = (
            REGISTRY["trade_outlier_winsorize"].spark(spark, sf_dir).collect()
        )
        flagged = {r.raw_nonce for r in rows if r.is_outlier}
        expected = {r.raw_nonce for r in rows if r.raw_nonce % 211 == 0}
        assert flagged == expected and flagged
        for r in rows:
            if r.is_outlier:
                assert r.price_winsorized < r.price_raw  # clipped down
            else:
                assert r.price_winsorized == r.price_raw


class TestRealizedSpread:
    def test_decomposition_identity_and_sign(self, spark, sf_dir):
        """effective = realized + impact must hold per instrument (to
        rounding), and the synthetic tape's mean-reverting offsets give
        a positive effective spread."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = (
            REGISTRY["trade_realized_spread"].spark(spark, sf_dir).collect()
        )
        assert rows
        for r in rows:
            assert r.n_trades > 0
            assert r.avg_effective_spread > 0
            assert abs(
                r.avg_effective_spread
                - (r.avg_realized_spread + r.avg_price_impact)
            ) <= 2e-6  # identity up to the 6dp rounding of each term


class TestSignAutocorrelation:
    def test_acf_bounded_and_pair_counts_decay(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = (
            REGISTRY["trade_sign_autocorrelation"].spark(spark, sf_dir).collect()
        )
        assert rows
        by_key = {}
        for r in rows:
            assert -1.0 <= r.sign_acf <= 1.0
            by_key.setdefault((r.exchange_id, r.symbol), {})[r.lag] = r
        for key, lags in by_key.items():
            assert sorted(lags) == [1, 2, 3, 4, 5]
            # lag k loses exactly k leading pairs per instrument
            for k in range(1, 5):
                assert lags[k].n_pairs == lags[k + 1].n_pairs + 1


class TestPriceClustering:
    def test_histogram_covers_tape_and_buckets_valid(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY
        from market_microstructure_toolkit_spark.plans.book import (
            synthetic_trades,
        )

        rows = (
            REGISTRY["trade_price_clustering"].spark(spark, sf_dir).collect()
        )
        assert rows
        assert all(0 <= r.cent_bucket <= 99 for r in rows)
        total = sum(r.n_trades for r in rows)
        # quote-less prints (NULL price, empty-ask plants) have no cent
        # digit and are excluded from the histogram
        priced = (
            synthetic_trades(spark, sf_dir)
            .filter(F.col("price").isNotNull())
            .count()
        )
        assert total == priced


class TestSplitAdjust:
    def test_adjustment_halves_across_each_split(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = REGISTRY["trade_split_adjust"].spark(spark, sf_dir).collect()
        assert rows
        by_key = {}
        for r in rows:
            by_key.setdefault((r.exchange_id, r.symbol), []).append(r)
        saw_split = False
        for key, rs in by_key.items():
            rs.sort(key=lambda r: (r.ts_ms, r.raw_nonce))
            # counts are non-increasing in time and drop by exactly 1
            # after each split event
            for a, b in zip(rs, rs[1:]):
                assert a.n_future_splits >= b.n_future_splits
                if a.raw_nonce % 997 == 0:
                    saw_split = True
            last = rs[-1]
            assert last.n_future_splits == 0
            assert last.price_adjusted == last.price_raw
            first = rs[0]
            k = first.n_future_splits
            assert first.price_adjusted * (2**k) == pytest.approx(
                first.price_raw, rel=1e-6
            )
        assert saw_split


class TestTransformWithState:
    def test_tws_guard_explains_missing_protobuf(self, spark):
        """transformWithStateInPandas needs google.protobuf (its state-
        server wire protocol); absent here, the port must refuse with a
        clear error instead of crashing the JVM pre-init runner."""
        import pytest

        from market_microstructure_toolkit_spark.streaming.trade_stream_tws import (
            tws_available,
            tws_signed_buckets,
        )

        if tws_available():
            pytest.skip("protobuf present - covered by the parity test")
        import tempfile

        stream = spark.readStream.schema(
            "exchange_id string, symbol string, ts_ms long, raw_nonce long,"
            " mid double, price double, qty double"
        ).parquet(tempfile.mkdtemp(prefix="mmt_tws_guard_"))
        with pytest.raises(RuntimeError, match="google.protobuf"):
            tws_signed_buckets(stream, 50.0)

    def test_tws_unfused_chain_matches_fused(self, spark, sf_dir):
        """On a deployment WITH protobuf: the un-fused two-operator
        chain (sign state, then volume-clock state, one streaming plan)
        must emit exactly what the fused operator emits."""
        import pytest

        from market_microstructure_toolkit_spark.streaming.trade_stream_tws import (
            ROCKSDB_CONF,
            tws_available,
            tws_signed_buckets,
        )

        if not tws_available():
            pytest.skip(
                "google.protobuf not installed in this environment "
                "(transformWithState worker cannot start)"
            )
        import tempfile
        import uuid

        from pyspark.sql import functions as F

        from market_microstructure_toolkit_spark.plans.book import (
            synthetic_trades,
        )
        from market_microstructure_toolkit_spark.plans.queries import (
            _stamp_batch_order,
        )
        from market_microstructure_toolkit_spark.streaming.trade_stream import (
            stateful_signed_buckets,
        )

        base = tempfile.mkdtemp(prefix="mmt_tws_parity_")
        tape = synthetic_trades(spark, sf_dir)
        mid = tape.agg(
            ((F.min("ts_ms") + F.max("ts_ms")) / 2).cast("long").alias("m")
        ).collect()[0]["m"]
        tape.filter(F.col("ts_ms") <= mid).coalesce(1).write.parquet(
            f"{base}/data/a"
        )
        tape.filter(F.col("ts_ms") > mid).coalesce(1).write.parquet(
            f"{base}/data/b"
        )
        _stamp_batch_order(f"{base}/data/a", f"{base}/data/b")
        schema = (
            "exchange_id string, symbol string, ts_ms long, raw_nonce long,"
            " mid double, price double, qty double"
        )

        def run(op):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/data/*/")
            )
            name = f"tws_par_{uuid.uuid4().hex[:8]}"
            q = (
                op(stream, 50.0)
                .writeStream.format("memory")
                .queryName(name)
                .option("checkpointLocation", f"{base}/ckpt_{name}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            return {
                tuple(r)
                for r in spark.table(name)
                .select(
                    "exchange_id", "symbol", "raw_nonce", "side", "bucket"
                )
                .collect()
            }

        prev = spark.conf.get(ROCKSDB_CONF[0], None)
        spark.conf.set(*ROCKSDB_CONF)
        try:
            assert run(tws_signed_buckets) == run(stateful_signed_buckets)
        finally:
            if prev is not None:
                spark.conf.set(ROCKSDB_CONF[0], prev)
