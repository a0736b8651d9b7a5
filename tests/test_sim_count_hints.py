"""Round-13 metadata rowcount hints for the impact simulators.

The sim gates replace their per-invocation Spark count jobs
(``_count_single_series`` / the grouped ``groupBy().count()`` collect)
with counts read from the events arrow histogram
(``book_symbol_rows`` / ``book_symbol_group_counts``). These tests pin:

1. hint == live Spark count on the real fixture (the parity the gates
   rely on);
2. hint == live Spark count on a synthetic fixture with NEGATIVE and
   NULL user_ids (the C-style-modulo / NULL-symbol edge the histogram
   must reproduce);
3. hinted and unhinted simulator runs return identical rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_symbol_rows_hint_matches_live_count(spark, sf_dir):
    from market_microstructure_toolkit_spark.plans.base import book_symbol_rows
    from market_microstructure_toolkit_spark.plans.book import synthetic_book

    book = synthetic_book(spark, sf_dir)
    for res in range(4):
        live = book.filter(F.col("symbol") == f"S{res}").count()
        assert book_symbol_rows(sf_dir, res) == live


def test_group_counts_hint_matches_live_groupby(spark, sf_dir):
    from market_microstructure_toolkit_spark.plans.base import (
        book_symbol_group_counts,
    )
    from market_microstructure_toolkit_spark.plans.book import synthetic_book

    book = synthetic_book(spark, sf_dir)
    live = {
        (r["exchange_id"], r["symbol"]): r["n"]
        for r in book.groupBy("exchange_id", "symbol")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert book_symbol_group_counts(sf_dir) == live


def test_hint_handles_negative_and_null_user_ids(spark, tmp_path):
    """Negative user_id -> C-style residue ('S-1'); NULL -> NULL symbol.
    The histogram must reproduce Spark's % exactly on both."""
    from market_microstructure_toolkit_spark.plans.base import (
        book_symbol_group_counts,
        book_symbol_rows,
    )
    from market_microstructure_toolkit_spark.plans.book import synthetic_book

    d = str(tmp_path / "sfneg")
    os.makedirs(d)
    rows = [
        (i, uid, 1_700_000_000_000_000_000 + i * 1_000_000, float(i), "t")
        for i, uid in enumerate(
            [-7, -6, -5, -4, -3, -2, -1, 0, 1, 2, 3, 4, None, None, 8]
        )
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double, event_type string"
    ).coalesce(1).write.parquet(f"{d}/events.parquet")

    book = synthetic_book(spark, d)
    live = {
        (r["exchange_id"], r["symbol"]): r["n"]
        for r in book.groupBy("exchange_id", "symbol")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert book_symbol_group_counts(d) == live
    assert book_symbol_rows(d, 0) == book.filter(F.col("symbol") == "S0").count()
    assert (
        book_symbol_rows(d, -1) == book.filter(F.col("symbol") == "S-1").count()
    )


def test_hinted_simulator_rows_identical(spark, sf_dir):
    from market_microstructure_toolkit_spark.operators.impact import (
        simulate_twap_naive,
    )
    from market_microstructure_toolkit_spark.plans.base import book_symbol_rows
    from market_microstructure_toolkit_spark.plans.book import synthetic_book

    book = synthetic_book(spark, sf_dir).filter(F.col("symbol") == "S0")
    _, unhinted = simulate_twap_naive(
        book, "buy", total_qty=40.0, slices=20, depth=5, want_summary=False
    )
    _, hinted = simulate_twap_naive(
        book, "buy", total_qty=40.0, slices=20, depth=5,
        want_summary=False, n_rows=book_symbol_rows(sf_dir, 0),
    )
    a = sorted(map(tuple, unhinted.collect()))
    b = sorted(map(tuple, hinted.collect()))
    assert a == b


def test_bad_hint_residue_returns_none(sf_dir):
    from market_microstructure_toolkit_spark.plans.base import book_symbol_rows

    assert book_symbol_rows(sf_dir, 5) is None
    assert book_symbol_rows("/nonexistent_dir_xyz", 0) is None
