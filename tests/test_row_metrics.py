"""Exact-value unit tests mirroring the reference's tests/test_metrics.py
(same fixture numbers, same expected values) on tiny Spark DataFrames."""

from __future__ import annotations

import math

from pyspark.sql import Row

from market_microstructure_toolkit_spark import schema as S
from market_microstructure_toolkit_spark.operators.row_metrics import (
    add_book_slopes,
    compute_row_metrics,
)


def _fake_row(**over):
    """Reference tests/test_metrics.py:29-56 `_fake_row` as typed values."""
    base = dict(
        ts_ms=1_700_000_000_000,
        iso="2023-11-14T00:00:00+00:00",
        exchange_id="fake",
        symbol="BTC/USDT",
        book_level="L2",
        raw_nonce=42,
        best_bid=100.0,
        best_ask=100.1,
        bid1_price=100.0,
        bid1_size=1.0,
        ask1_price=100.1,
        ask1_size=0.5,
        bid2_price=99.9,
        bid2_size=1.01,
        ask2_price=None,
        ask2_size=None,
        bid3_price=None,
        bid3_size=None,
        ask3_price=None,
        ask3_size=None,
    )
    base.update(over)
    return base


def _book_df(spark, rows, depth=3):
    """Build a wide book frame from dicts, in schema column order."""
    schema = S.book_schema(depth)
    data = [tuple(r.get(f.name) for f in schema.fields) for r in rows]
    return spark.createDataFrame(data, schema)


def _one_row_metrics(spark, depth=3, **over):
    df = _book_df(spark, [_fake_row(**over)], depth)
    return compute_row_metrics(df, depth).collect()[0]


def test_compute_row_metrics_depth3(spark):
    m = _one_row_metrics(spark)
    assert abs(m["spread"] - 0.1) < 1e-12
    assert abs(m["mid"] - 100.05) < 1e-12
    assert abs(m["imbalance_l1"] - (1.0 / 1.5)) < 1e-12
    expected_k = (1.0 + 1.01) / (1.0 + 1.01 + 0.5)
    assert abs(m["imbalance_k"] - expected_k) < 1e-12


def test_relative_spread_and_microprice(spark):
    m = _one_row_metrics(spark)
    exp = 10_000.0 * 0.1 / 100.05
    assert abs(m["relative_spread_bps"] - exp) < 1e-9
    assert 100.0 < m["microprice"] < 100.1
    # ask queue smaller -> lean toward ask -> positive imbalance
    assert m["microprice_imbalance_bps"] > 0


def test_notional_depth(spark):
    m = _one_row_metrics(spark, depth=3)
    assert abs(m["notional_bid_k"] - (100.0 * 1.0 + 99.9 * 1.01)) < 1e-9
    assert abs(m["notional_ask_k"] - (100.1 * 0.5)) < 1e-9


def test_book_slope_requires_two_levels(spark):
    df = _book_df(spark, [_fake_row()], 3)
    row = add_book_slopes(df, 2).collect()[0]
    # bid side has 2 valid levels, ask side only 1 -> NULL slope
    assert row["slope_bid"] is not None
    assert row["slope_ask"] is None
    # verify against the closed form: x=[0, 0.1], y=[1.0, 2.01]
    xs = [0.0, abs(99.9 - 100.0)]
    ys = [1.0, 1.0 + 1.01]
    n = 2
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    exp = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row["slope_bid"] - exp) < 1e-9


def test_crossed_book_yields_null_spread_bps(spark):
    m = _one_row_metrics(spark, best_bid=100.2, best_ask=100.1)
    assert m["relative_spread_bps"] is None


def test_missing_l1_sizes_null_paths(spark):
    m = _one_row_metrics(spark, bid1_size=None, ask1_size=None)
    assert m["microprice"] is None
    assert m["imbalance_l1"] is None
    # depth-K imbalance still works off level 2
    assert m["imbalance_k"] is not None


def test_all_levels_missing_notional_is_null(spark):
    m = _one_row_metrics(
        spark,
        ask1_price=None,
        ask1_size=None,
        ask2_price=None,
        ask2_size=None,
        ask3_price=None,
        ask3_size=None,
    )
    assert m["notional_ask_k"] is None


def test_range_volatility_estimators_match_formulas(spark):
    import math

    import pytest

    from market_microstructure_toolkit_spark.functions.microstructure import (
        garman_klass_var,
        parkinson_var,
        rogers_satchell_var,
    )

    o, h, l, c = 100.0, 102.0, 99.0, 101.0
    df = spark.createDataFrame(
        [(o, h, l, c)], "o double, h double, l double, c double"
    )
    got = df.select(
        parkinson_var("h", "l").alias("p"),
        garman_klass_var("o", "h", "l", "c").alias("gk"),
        rogers_satchell_var("o", "h", "l", "c").alias("rs"),
    ).collect()[0]
    hl = math.log(h / l)
    co = math.log(c / o)
    assert got["p"] == pytest.approx(hl * hl / (4 * math.log(2)), rel=1e-12)
    assert got["gk"] == pytest.approx(
        0.5 * hl * hl - (2 * math.log(2) - 1) * co * co, rel=1e-12
    )
    assert got["rs"] == pytest.approx(
        math.log(h / c) * math.log(h / o) + math.log(l / c) * math.log(l / o),
        rel=1e-12,
    )
    # flat bucket (O=H=L=C): every estimator is exactly zero
    flat = spark.createDataFrame(
        [(5.0, 5.0, 5.0, 5.0)], "o double, h double, l double, c double"
    ).select(
        parkinson_var("h", "l").alias("p"),
        garman_klass_var("o", "h", "l", "c").alias("gk"),
        rogers_satchell_var("o", "h", "l", "c").alias("rs"),
    ).collect()[0]
    assert flat["p"] == 0.0 and flat["gk"] == 0.0 and flat["rs"] == 0.0
