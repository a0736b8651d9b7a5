"""Direct unit tests for the operators extracted in round 6
(evaluation/bars/attribution/similarity.pq-ivf) — hand-computed
expectations on tiny frames, independent of the oracle gates that also
pin them."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestExactAuc:
    def test_matches_hand_computed_mann_whitney(self, spark):
        from market_microstructure_toolkit_spark.operators.evaluation import (
            exact_auc,
        )

        # scores: pos at {3, 2}, neg at {1, 2} ->
        # pairs (pos, neg): (3,1)win (3,2)win (2,1)win (2,2)tie
        # AUC = (3 + 0.5) / 4 = 0.875
        df = spark.createDataFrame(
            [("g", 3.0, 1), ("g", 2.0, 1), ("g", 1.0, 0), ("g", 2.0, 0)],
            "k string, x double, y int",
        )
        row = exact_auc(df, "x", "y", keys=("k",)).collect()[0]
        assert row.auc == 0.875 and row.n_pos == 2 and row.n_neg == 2

    def test_perfect_and_inverted(self, spark):
        from market_microstructure_toolkit_spark.operators.evaluation import (
            exact_auc,
        )

        perfect = spark.createDataFrame(
            [("g", float(x), 1 if x > 2 else 0) for x in range(1, 6)],
            "k string, x double, y int",
        )
        assert exact_auc(perfect, "x", "y", ("k",)).collect()[0].auc == 1.0
        inverted = perfect.withColumn("y", 1 - F.col("y"))
        assert exact_auc(inverted, "x", "y", ("k",)).collect()[0].auc == 0.0


class TestOhlcBars:
    def _ticks(self, spark):
        rows = [
            # (key, bucket, fine, ts, nonce, value)
            ("A", 0, 0, 1, 1, 10.0),
            ("A", 0, 0, 2, 2, 12.0),
            ("A", 0, 1, 3, 3, 9.0),
            ("A", 0, 1, 4, 4, 11.0),
            ("A", 5, 5, 6, 5, 20.0),
        ]
        return spark.createDataFrame(
            rows, "k string, coarse long, fine long, ts long, nonce long, v double"
        )

    def test_bars_and_rollup_equal_direct(self, spark):
        from market_microstructure_toolkit_spark.operators.bars import (
            ohlc_bars,
            rollup_ohlc,
        )

        ticks = self._ticks(spark)
        fine = ohlc_bars(ticks, "v", ["coarse", "fine"], ("k",), ["ts", "nonce"])
        got = {
            (r.k, r.coarse, r.fine): (r.o, r.h, r.l, r.c, r.n)
            for r in fine.collect()
        }
        assert got[("A", 0, 0)] == (10.0, 12.0, 10.0, 12.0, 2)
        assert got[("A", 0, 1)] == (9.0, 11.0, 9.0, 11.0, 2)
        rolled = {
            (r.k, r.coarse): (
                r.open_mid, r.high_mid, r.low_mid, r.close_mid, r.n_snapshots
            )
            for r in rollup_ohlc(fine, "coarse", "fine", ("k",)).collect()
        }
        assert rolled[("A", 0)] == (10.0, 12.0, 9.0, 11.0, 4)
        direct = ohlc_bars(ticks, "v", ["coarse"], ("k",), ["ts", "nonce"])
        d = {
            (r.k, r.coarse): (r.o, r.h, r.l, r.c, r.n) for r in direct.collect()
        }
        assert rolled == d  # the continuous-aggregate merge property


class TestTouchAttribution:
    def test_first_last_and_empty_lookback(self, spark):
        from market_microstructure_toolkit_spark.operators.attribution import (
            touch_attribution,
        )

        rows = [
            # user 1: touches at t=10 (id 1), t=20 (id 2); conv t=25 (id 3)
            (1, 1, 10, "view"),
            (1, 2, 20, "view"),
            (1, 3, 25, "zconv"),
            # user 2: touch OUTSIDE lookback (t=1, conv t=100, lookback 50)
            (2, 4, 1, "view"),
            (2, 5, 100, "zconv"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, event_id long, ts long, event_type string"
        )
        out = {
            r.conversion_event_id: r
            for r in touch_attribution(ev, "zconv", 50).collect()
        }
        assert out[3].first_touch_event_id == 1
        assert out[3].last_touch_event_id == 2
        assert out[5].first_touch_event_id is None
        assert out[5].last_touch_event_id is None

    def test_conversions_are_not_touches(self, spark):
        from market_microstructure_toolkit_spark.operators.attribution import (
            touch_attribution,
        )

        # two conversions in a row: the second must NOT attribute to the
        # first conversion, only to the real touch
        rows = [(1, 1, 10, "view"), (1, 2, 20, "zconv"), (1, 3, 30, "zconv")]
        ev = spark.createDataFrame(
            rows, "user_id long, event_id long, ts long, event_type string"
        )
        out = {
            r.conversion_event_id: r
            for r in touch_attribution(ev, "zconv", 100).collect()
        }
        assert out[3].last_touch_event_id == 1


class TestPqIvfOperators:
    def _emb(self, spark, n=40, dim=16):
        import random

        rng = random.Random(7)
        rows = [
            (i, i % 3, [rng.uniform(-1, 1) for _ in range(dim)])
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, label int, v array<double>"
        )

    def test_pq_adc_top1_is_reasonable_and_deterministic(self, spark):
        from market_microstructure_toolkit_spark.operators.similarity import (
            pq_adc_scores,
        )

        emb = self._emb(spark)
        a = pq_adc_scores(emb, m=4, sub_dim=4, n_cents=8).collect()
        b = pq_adc_scores(emb, m=4, sub_dim=4, n_cents=8).collect()
        assert {(r.vec_id, r.adc_dist) for r in a} == {
            (r.vec_id, r.adc_dist) for r in b
        }
        assert len(a) == 39  # every vector except the query itself
        # a centroid vector's ADC distance to the query equals the
        # query's own table entry sum for that centroid's codes — and
        # centroid 1..8 encode to THEMSELVES (distance 0 per subspace)
        by_id = {r.vec_id: r.adc_dist for r in a}
        assert all(by_id[c] >= 0 for c in range(1, 9))

    def test_ivf_assign_puts_centroids_in_their_own_cell(self, spark):
        from market_microstructure_toolkit_spark.operators.similarity import (
            ivf_assign,
            ivf_centroid_dists,
        )

        emb = self._emb(spark)
        assigned = ivf_assign(ivf_centroid_dists(emb, n_cents=8))
        cells = {r.vec_id: r.cid for r in assigned.collect()}
        for c in range(1, 9):
            assert cells[c] == c  # zero self-distance wins
        assert set(cells.values()) <= set(range(1, 9))
