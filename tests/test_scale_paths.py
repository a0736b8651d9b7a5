"""Scale-path robustness: depth-100 wide schemas (the reference's real
recording shape, 8 + 400 columns) through the full metric stack, and the
salted-join skew utility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark import schema as S
from market_microstructure_toolkit_spark.operators import row_metrics as RM
from market_microstructure_toolkit_spark.partitioning import salted_join
from market_microstructure_toolkit_spark.plans.book import synthetic_book


@pytest.fixture(scope="module")
def deep_book(spark, sf_dir):
    # depth-100 synthetic book: 8 + 400 columns, like the shipped
    # ETH_bybit_L2_60s.parquet (60 x 408)
    return synthetic_book(spark, sf_dir, depth=100)


def test_depth100_schema_shape(deep_book):
    assert S.infer_depth(deep_book) == 100
    assert len(deep_book.columns) == 7 + 400  # fixture omits iso


def test_depth100_row_metrics(deep_book):
    out = RM.compute_row_metrics(deep_book, 100)
    row = out.filter(F.col("raw_nonce") == 1).select(
        "spread", "mid", "imbalance_k", "notional_bid_k"
    ).first()
    assert row["spread"] is not None and row["mid"] is not None
    assert 0.0 <= row["imbalance_k"] <= 1.0
    assert row["notional_bid_k"] > 0


def test_depth100_slope_and_walk(deep_book):
    from market_microstructure_toolkit_spark.functions import microstructure as M
    from market_microstructure_toolkit_spark.functions.arrays import (
        ladder_from_wide,
        valid_levels,
        walk_book,
    )

    state = F.explode(
        F.array(F.struct(M.book_slope_state("bid", 100).alias("b")))
    )
    fill = walk_book(valid_levels(ladder_from_wide("ask", 100)), 250.0)
    out = (
        deep_book.limit(50)
        .select("raw_nonce", fill.alias("f"), state.alias("st"))
        .select(
            "raw_nonce",
            F.col("f.filled").alias("filled"),
            F.col("f.levels_touched").alias("lvls"),
            M.book_slope_from_state(F.col("st.b")).alias("slope"),
        )
        .collect()
    )
    assert len(out) == 50
    # a 250-unit order must walk well past L1 on a depth-100 ladder
    assert any(r["lvls"] > 10 for r in out)
    assert all(r["slope"] is None or r["slope"] > 0 for r in out)


def test_salted_join_equals_plain_join(spark):
    # one hot key (90% of rows) + long tail
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [("HOT", 1.0), ("k5", 2.0), ("k15", 3.0), ("missing", 9.9)],
        "k string, w double",
    )
    plain = {(r["k"], r["v"], r["w"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["k"], r["v"], r["w"])
        for r in salted_join(left, right, "k", n_salts=4).collect()
    }
    assert salted == plain
    assert sum(1 for t in salted if t[0] == "HOT") == 1800


def test_partitioned_layout_prunes_scan(spark, sf_dir, tmp_path):
    """The recommended at-scale layout (SURVEY §4: partition recorded data
    by exchange/symbol) must produce partition-pruned scans: a one-symbol
    query reads one hive partition, verified in the physical plan."""
    from market_microstructure_toolkit_spark.sources.book_io import (
        write_book_parquet,
    )

    book = synthetic_book(spark, sf_dir)
    out = str(tmp_path / "by_symbol")
    write_book_parquet(book, out, partition_by=("exchange_id", "symbol"))

    back = spark.read.parquet(out).filter(F.col("symbol") == "S1")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "symbol" in plan
    n_all = spark.read.parquet(out).count()
    n_s1 = back.count()
    assert 0 < n_s1 < n_all
    # layout actually fanned out into per-symbol hive directories
    import glob

    dirs = glob.glob(f"{out}/exchange_id=*/symbol=*")
    assert len(dirs) == 4  # fixture has 4 symbols under one exchange


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key (SURVEY §2.3/§7: co-located
    joins at scale) must remove the per-query shuffle: the sort-merge
    join reads bucketed tables with no Exchange above either scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable("li_b"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable("orders_b"))
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # at real scale neither side broadcasts; force the sort-merge path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("li_b")
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        # no shuffle below the join: bucketed scans are pre-partitioned
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")
