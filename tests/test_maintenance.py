"""Bucketed-table joins, CDC apply, small-files compaction, ORC
roundtrip, and TSRV — the round-4 maintenance/layout tier. Plan-shape
assertions pin the scale claims (no Exchange on the bucketed join;
fewer files after compaction); semantics are pinned by the DuckDB
oracle gates, so these tests focus on the properties the hash can't
see."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.operators.cdc import apply_cdc
from market_microstructure_toolkit_spark.partitioning import (
    compact_files,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedJoin:
    def test_no_exchange_on_bucketed_merge_join(self, spark):
        base = tempfile.mkdtemp(prefix="mmt_test_bucket_")
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice"
        )
        write_bucketed(orders, "t_bk_orders", f"{base}/o", "o_orderkey")
        write_bucketed(li, "t_bk_lineitem", f"{base}/l", "l_orderkey")
        bo = spark.table("t_bk_orders").hint("merge")
        bl = spark.table("t_bk_lineitem")
        j = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 0, plan
        # contrast: the identical merge join on raw parquet shuffles both sides
        po = spark.read.parquet(f"{SF}/orders.parquet").hint("merge")
        pj = po.join(li, po["o_orderkey"] == li["l_orderkey"])
        assert _plan(pj).count("Exchange") == 2
        # and the data agrees with the plain join
        assert j.count() == pj.count()

    def test_bucketed_join_groupby_same_key_no_extra_shuffle(self, spark):
        # a groupBy on the bucket key rides the bucketed distribution too
        bo = spark.table("t_bk_orders")
        agg = bo.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
        assert _plan(agg).count("Exchange") == 0

    def test_schema_qualified_table_name(self, spark):
        # dotted names (db.table) are valid; each segment is validated
        base = tempfile.mkdtemp(prefix="mmt_test_bucket_q_")
        spark.sql("CREATE DATABASE IF NOT EXISTS mmt_testdb")
        region = spark.read.parquet(f"{SF}/region.parquet")
        write_bucketed(
            region, "mmt_testdb.t_bk_region", f"{base}/r", "r_regionkey"
        )
        assert spark.table("mmt_testdb.t_bk_region").count() == region.count()
        # re-run replaces (exercises DROP on the quoted dotted name)
        write_bucketed(
            region, "mmt_testdb.t_bk_region", f"{base}/r2", "r_regionkey"
        )
        assert spark.table("mmt_testdb.t_bk_region").count() == region.count()
        import pytest as _pytest

        for bad in ("a.b; DROP TABLE x", "a..b", "1abc", "a.b-c"):
            with _pytest.raises(ValueError):
                write_bucketed(region, bad, f"{base}/bad", "r_regionkey")


class TestApplyCdc:
    def _base(self, spark):
        return spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
        )

    def test_upsert_insert_delete(self, spark):
        chg = spark.createDataFrame(
            [
                Row(k=2, v="b2", op="U"),   # update
                Row(k=3, v=None, op="D"),   # delete
                Row(k=4, v="d", op="U"),    # insert
            ]
        )
        out = apply_cdc(self._base(spark), chg, "k")
        got = {r["k"]: r["v"] for r in out.collect()}
        assert got == {1: "a", 2: "b2", 4: "d"}

    def test_delete_wins_tie_and_replay_idempotent(self, spark):
        # same key carries U and D at the same version: delete must win,
        # and applying the batch twice must equal applying it once
        chg = spark.createDataFrame(
            [Row(k=2, v="b2", op="U"), Row(k=2, v=None, op="D")]
        )
        once = apply_cdc(self._base(spark), chg, "k")
        twice = apply_cdc(once, chg, "k")
        assert {r["k"] for r in once.collect()} == {1, 3}
        assert sorted(r["k"] for r in twice.collect()) == sorted(
            r["k"] for r in once.collect()
        )

    def test_version_ordering(self, spark):
        # higher version wins regardless of batch row order
        chg = spark.createDataFrame(
            [
                Row(k=1, v="v1", op="U", ver=1),
                Row(k=1, v="v9", op="U", ver=9),
                Row(k=1, v="v5", op="U", ver=5),
            ]
        )
        out = apply_cdc(self._base(spark), chg, "k", version_col="ver")
        assert {r["v"] for r in out.filter("k = 1").collect()} == {"v9"}

    def test_version_zero_change_beats_base_deterministically(self, spark):
        """A change at version 0 ties the base's synthetic __ver 0; the
        change-beats-base tiebreak must make the change win (before the
        guard this was plan-order nondeterministic)."""
        chg = spark.createDataFrame([Row(k=1, v="z", op="U", ver=0)])
        out = apply_cdc(self._base(spark), chg, "k", version_col="ver")
        assert {r["v"] for r in out.filter("k = 1").collect()} == {"z"}

    def test_null_version_raises_not_silently_loses(self, spark):
        chg = spark.createDataFrame(
            [Row(k=1, v="x", op="U", ver=7), Row(k=2, v="y", op="U", ver=None)],
            "k long, v string, op string, ver long",
        )
        out = apply_cdc(self._base(spark), chg, "k", version_col="ver")
        with pytest.raises(Exception, match="NULL ver"):
            out.collect()

    def test_strict_detects_same_version_upsert_pair(self, spark):
        """Two upserts sharing (key, version) have no defined winner —
        strict mode (default) must raise instead of letting plan order
        pick one."""
        chg = spark.createDataFrame(
            [Row(k=1, v="a1", op="U", ver=3), Row(k=1, v="a2", op="U", ver=3)]
        )
        out = apply_cdc(self._base(spark), chg, "k", version_col="ver")
        with pytest.raises(Exception, match="no defined winner"):
            out.collect()
        # opting out restores the (documented) engine-tie behavior
        relaxed = apply_cdc(
            self._base(spark), chg, "k", version_col="ver", strict=False
        )
        assert relaxed.filter("k = 1").count() == 1

    def test_strict_allows_delete_upsert_tie(self, spark):
        """U+D at the same version IS defined (delete wins) and must not
        trip the strict duplicate detector."""
        chg = spark.createDataFrame(
            [Row(k=1, v="a1", op="U", ver=3), Row(k=1, v=None, op="D", ver=3)]
        )
        out = apply_cdc(self._base(spark), chg, "k", version_col="ver")
        assert {r["k"] for r in out.collect()} == {2, 3}


class TestCompaction:
    def test_fewer_files_and_lossless(self, spark):
        base = tempfile.mkdtemp(prefix="mmt_test_compact_")
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        docs.repartition(16).write.mode("overwrite").parquet(f"{base}/small")
        n_out = compact_files(
            spark, f"{base}/small", f"{base}/big", target_bytes=64 * 1024 * 1024
        )
        before = len(spark.read.parquet(f"{base}/small").inputFiles())
        after = len(spark.read.parquet(f"{base}/big").inputFiles())
        assert before == 16
        assert after == n_out < before
        a = docs.orderBy("doc_id").collect()
        b = spark.read.parquet(f"{base}/big").orderBy("doc_id").collect()
        assert a == b

    def test_target_bytes_drives_file_count(self, spark):
        base = tempfile.mkdtemp(prefix="mmt_test_compact2_")
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        docs.repartition(8).write.mode("overwrite").parquet(f"{base}/small")
        # a tiny target must yield more output files than a huge target
        n_small_target = compact_files(
            spark, f"{base}/small", f"{base}/a", target_bytes=16 * 1024
        )
        n_big_target = compact_files(
            spark, f"{base}/small", f"{base}/b", target_bytes=1 << 30
        )
        assert n_big_target == 1
        assert n_small_target > n_big_target


class TestOrcRoundtrip:
    def test_orc_lossless_and_partition_pruned(self, spark):
        from market_microstructure_toolkit_spark.plans.book import synthetic_book
        from market_microstructure_toolkit_spark.sources.book_io import (
            read_book_orc,
            write_book_orc,
        )

        book = synthetic_book(spark, SF)
        base = tempfile.mkdtemp(prefix="mmt_test_orc_")
        write_book_orc(book, base, partition_by=("symbol",))
        back = read_book_orc(spark, base)
        assert back.count() == book.count()
        # partition filter prunes to one directory
        one = back.filter(F.col("symbol") == "S0")
        plan = _plan(one)
        assert "PartitionFilters" in plan and "symbol" in plan


class TestTsrv:
    def test_tsrv_debiases_noise(self, spark):
        """On a noisy constant-price series (pure microstructure noise,
        no true variance), RV_all explodes with n while TSRV must land
        near zero — the estimator's whole point."""
        import math
        import random

        rng = random.Random(7)
        rows = [
            Row(
                exchange_id="E",
                symbol="S",
                ts_ms=i,
                raw_nonce=i,
                # price = 100 * exp(noise), noise iid
                best_bid=100.0 * math.exp(rng.gauss(0, 1e-4)) - 0.01,
                best_ask=100.0 * math.exp(rng.gauss(0, 1e-4)) + 0.01,
            )
            for i in range(2000)
        ]
        df = spark.createDataFrame(rows)
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        # drive the same expressions directly (the gate runs on the book)
        from pyspark.sql import Window

        w = Window.partitionBy("exchange_id", "symbol").orderBy(
            "ts_ms", "raw_nonce"
        )
        mid = (F.col("best_bid") + F.col("best_ask")) / F.lit(2.0)
        k = 5
        rets = df.select(
            "exchange_id",
            "symbol",
            F.log(mid / F.lag(mid).over(w)).alias("r1"),
            F.log(mid / F.lag(mid, k).over(w)).alias("rk"),
        )
        n = F.count("r1")
        rv_all = F.sum(F.col("r1") * F.col("r1"))
        rv_k = F.sum(F.col("rk") * F.col("rk")) / F.lit(float(k))
        nbar_over_n = (n - k + F.lit(1.0)) / F.lit(float(k)) / n
        row = rets.groupBy("exchange_id", "symbol").agg(
            rv_all.alias("rv"),
            ((rv_k - nbar_over_n * rv_all) / (F.lit(1.0) - nbar_over_n)).alias(
                "tsrv"
            ),
        ).collect()[0]
        # iid noise: E[RV_all] = 2 n sigma^2, TSRV -> true IV = 0
        assert row["rv"] > 10 * abs(row["tsrv"])

    def test_gate_runs_at_sf0001(self, spark):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        out = REGISTRY["book_tsrv"].spark(spark, SF)
        rows = out.collect()
        assert len(rows) >= 1
        for r in rows:
            assert r["rv_all"] >= 0 and r["rv_k_avg"] >= 0


class TestScd2Join:
    def test_broadcast_no_fact_shuffle(self, spark):
        from market_microstructure_toolkit_spark.operators.rangejoin import (
            scd2_join,
        )

        facts = spark.range(0, 1000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("t")
        )
        dim = spark.createDataFrame(
            [(k, f"v1_{k}", 0, 500) for k in range(50)]
            + [(k, f"v2_{k}", 500, 10**9) for k in range(50)],
            "k long, label string, valid_from long, valid_to long",
        )
        j = scd2_join(facts, dim, key="k", ts_col="t")
        plan = _plan(j)
        assert "BroadcastHashJoin" in plan
        assert "ShuffleExchange" not in plan.replace(
            "BroadcastExchange", ""
        ) and plan.count("Exchange") == plan.count("BroadcastExchange")

    def test_half_open_boundary(self, spark):
        # a fact exactly at a version split lands in the NEW version only
        from market_microstructure_toolkit_spark.operators.rangejoin import (
            scd2_join,
        )

        facts = spark.createDataFrame([(1, 500)], "k long, t long")
        dim = spark.createDataFrame(
            [(1, "old", 0, 500), (1, "new", 500, 1000)],
            "k long, label string, valid_from long, valid_to long",
        )
        rows = scd2_join(facts, dim, key="k", ts_col="t").collect()
        assert [r["label"] for r in rows] == ["new"]

    def test_degenerate_version_dropped(self, spark):
        from market_microstructure_toolkit_spark.operators.rangejoin import (
            scd2_join,
        )

        facts = spark.createDataFrame([(1, 5)], "k long, t long")
        dim = spark.createDataFrame(
            [(1, "empty", 5, 5), (1, "ok", 0, 10)],
            "k long, label string, valid_from long, valid_to long",
        )
        rows = scd2_join(facts, dim, key="k", ts_col="t").collect()
        assert [r["label"] for r in rows] == ["ok"]


class TestZorderLayout:
    def test_both_dims_bounded_vs_single_sort(self, spark):
        """Z-ordered files must bound BOTH dimensions' per-file ranges;
        a single-dim time sort leaves the user dimension full-width in
        every file. Compare mean per-file user-bucket span under the
        gate's layout vs a pure time sort on the same data."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        # sf0.01: ~1500 users spread the 8-bit rank; sf0.001's ~15 users
        # can't show per-file narrowing (every file holds every user)
        sf = "/root/testdata/sf0.01"
        out = REGISTRY["events_zorder_layout"].spark(spark, sf).collect()
        z_user_span = sum(
            r["max_user_bucket"] - r["min_user_bucket"] for r in out
        ) / len(out)
        z_time_span = sum(
            r["max_time_bucket"] - r["min_time_bucket"] for r in out
        ) / len(out)
        from market_microstructure_toolkit_spark.sources.events import (
            read_events,
        )
        from pyspark.sql import Window

        ev = read_events(spark, sf).select(
            "event_id",
            (F.col("user_id") % 256).alias("xb"),
            ((F.expr("ts DIV 1000000") / F.lit(60000)).cast("long") % 256)
            .alias("yb"),
        )
        n = ev.count()
        per_file = -(-n // 16)
        w = Window.orderBy("yb", "event_id")  # pure time sort
        filed = ev.withColumn(
            "fid", ((F.row_number().over(w) - 1) / F.lit(per_file)).cast("long")
        )
        ts = filed.groupBy("fid").agg(
            (F.max("xb") - F.min("xb")).alias("us"),
            (F.max("yb") - F.min("yb")).alias("vs"),
        ).collect()
        t_user_span = sum(r["us"] for r in ts) / len(ts)
        # time sort: user dim roughly full-width per file (measured 149)
        assert t_user_span > 0.5 * 255
        # z-order: user dim strictly narrower (measured 80), and the
        # time dim stays bounded (measured ~75) instead of exploding
        assert z_user_span < 0.7 * t_user_span
        assert z_time_span < 128


class TestNewGateProperties:
    def test_vamp_null_when_depth_insufficient(self, spark):
        """A book whose visible ask depth can't absorb Q must yield NULL
        vamp, not a partial-fill price."""
        from market_microstructure_toolkit_spark.functions.arrays import (
            ladder_from_wide,
            valid_levels,
            walk_book,
        )

        df = spark.createDataFrame(
            [
                # 3 units available per side < Q=10
                (100.0, 101.0, 3.0, 3.0, 99.0, 102.0),
            ],
            "best_bid double, best_ask double, bid1_size double, "
            "ask1_size double, bid1_price double, ask1_price double",
        ).withColumn("bid1_price", F.col("best_bid")).withColumn(
            "ask1_price", F.col("best_ask")
        )
        q = F.lit(10.0)
        wa = walk_book(valid_levels(ladder_from_wide("ask", 1)), q)
        out = df.withColumn("__a", wa).select(
            F.when(F.col("__a.filled") == q, F.col("__a.cost") / q).alias(
                "vwap_or_null"
            ),
            F.col("__a.filled").alias("filled"),
        ).collect()[0]
        assert out["vwap_or_null"] is None
        assert out["filled"] == 3.0

    def test_markov_rows_normalize(self, spark):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        out = REGISTRY["events_markov_transitions"].spark(spark, SF)
        sums = (
            out.groupBy("prev_type").agg(F.sum("p").alias("s")).collect()
        )
        for r in sums:
            assert abs(r["s"] - 1.0) < 1e-12, r

    def test_cube_grouping_levels(self, spark):
        """grand total == sum of per-type subtotals == sum of detail."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = REGISTRY["events_cube_report"].spark(spark, SF).collect()
        detail = [r for r in rows if r["grouping_id"] == 0]
        by_type = [r for r in rows if r["grouping_id"] == 1]
        by_day = [r for r in rows if r["grouping_id"] == 2]
        grand = [r for r in rows if r["grouping_id"] == 3]
        assert len(grand) == 1
        n = grand[0]["n_events"]
        assert sum(r["n_events"] for r in detail) == n
        assert sum(r["n_events"] for r in by_type) == n
        assert sum(r["n_events"] for r in by_day) == n

    def test_dollar_bars_conserve_tape(self, spark):
        """Bars partition the tape: volumes and trade counts sum to the
        tape totals, and each bar's notional is bounded by threshold +
        one max trade (the clock can only overshoot by the final print)."""
        from market_microstructure_toolkit_spark.plans.book import (
            synthetic_trades,
        )
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        bars = REGISTRY["trade_dollar_bars"].spark(spark, SF).collect()
        tape = synthetic_trades(spark, SF)
        tot = tape.agg(
            F.sum("qty").alias("v"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        assert abs(sum(r["volume"] for r in bars) - tot["v"]) < 1e-9
        assert sum(r["n_trades"] for r in bars) == tot["n"]


def test_cdc_nonstandard_op_codes_normalize(spark):
    """A producer coding inserts as 'I' (which sorts BEFORE 'D') must not
    steal the equal-version tie that deletes win."""
    from pyspark.sql import Row

    base = spark.createDataFrame([Row(k=1, v="a")])
    chg = spark.createDataFrame(
        [Row(k=1, v="a2", op="I"), Row(k=1, v=None, op="D")]
    )
    out = apply_cdc(base, chg, "k")
    assert out.count() == 0  # delete wins over the 'I' at equal version


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),           # key
        st.integers(min_value=1, max_value=4),           # version
        st.sampled_from(["U", "D"]),                     # op
        st.integers(min_value=0, max_value=99),          # payload
    ),
    min_size=0,
    max_size=20,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=_ops)
def test_apply_cdc_matches_dict_model(spark, changes):
    """apply_cdc == a sequential dict replay of the change log in
    (version, D-before-U) order — the declarative one-shot merge must
    equal the imperative per-row application for ANY change batch,
    including multi-change keys, version ties, and delete-only keys."""
    from pyspark.sql import Row

    # dedupe (key, version, op) triples: two same-version upserts with
    # different payloads are out of contract (a change log's (key,
    # version) identifies one change) and the winner would be plan-
    # nondeterministic in ANY engine
    seen = set()
    changes = [
        c for c in changes
        if (c[0], c[1], c[2]) not in seen and not seen.add((c[0], c[1], c[2]))
    ]
    base_rows = [(k, -1) for k in range(3)]  # keys 0..2 exist, 3..5 don't
    model = {k: v for k, v in base_rows}
    # winner per key: max version, delete beats upsert on ties
    best: dict[int, tuple] = {}
    for k, ver, op, payload in changes:
        cand = (ver, 1 if op == "D" else 0, op, payload)  # D outranks U at a tie
        if k not in best or cand[:2] > best[k][:2]:
            best[k] = cand
    for k, (_ver, _pri, op, payload) in best.items():
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = payload

    base = spark.createDataFrame(base_rows, "k long, v long")
    if changes:
        chg = spark.createDataFrame(
            [(k, v, o, p) for k, v, o, p in changes],
            "k long, ver long, op string, v long",
        ).select("k", "v", "op", "ver")
        got_df = apply_cdc(base, chg, "k", version_col="ver")
    else:
        got_df = base
    got = {r["k"]: r["v"] for r in got_df.collect()}
    assert got == model, (changes, got, model)


def test_pq_recall_high_on_clustered_vectors(spark):
    """The fixture's 0.1 ADC recall is the DATA (iid vectors,
    concentration of measure), not the machinery: on embeddings with
    real cluster structure the same pipeline must rank the query's own
    cluster first. 16 tight clusters, centers far apart; the query
    (vec_id 0) and vectors 1..16 (the sampled codebook) are placed so
    each cluster contributes a codebook entry, then ADC top-10 must be
    dominated by the query's cluster."""
    import random

    rng = random.Random(11)
    dim, n_clusters, per = 64, 16, 15
    centers = [
        [rng.uniform(-10, 10) for _ in range(dim)] for _ in range(n_clusters)
    ]

    def member(c):
        return [x + rng.gauss(0, 0.05) for x in centers[c]]

    rows = []
    # vec_id 1..16: one per cluster (the sampled codebook sees every mode)
    for c in range(n_clusters):
        rows.append((c + 1, member(c), c))
    # query: cluster 0
    rows.append((0, member(0), 0))
    nid = n_clusters + 1
    for c in range(n_clusters):
        for _ in range(per):
            rows.append((nid, member(c), c))
            nid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, v array<double>, label int"
    ).select("vec_id", "label", "v")

    from market_microstructure_toolkit_spark.plans.queries import _pq_adc_from

    top = (
        _pq_adc_from(emb)
        .orderBy("adc_dist", "vec_id")
        .limit(10)
        .collect()
    )
    same_cluster = sum(1 for r in top if r["label"] == 0)
    assert same_cluster >= 9, [(r["vec_id"], r["label"]) for r in top]


_docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]),  # tiny alphabet -> chunk collisions
        min_size=1,
        max_size=25,
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(token_docs=_docs_strategy)
def test_chunk_dedup_matches_python_model(spark, token_docs):
    """documents_chunk_dedup's Spark plan == a direct Python replay of
    the C4-style rule (first corpus-wide occurrence of each 10-token
    chunk wins, ordered by (doc_id, idx); docs rebuilt from survivors)
    for arbitrary corpora with heavy chunk collisions."""
    texts = [" ".join(toks) for toks in token_docs]
    # python model
    first: dict[str, tuple] = {}
    chunks_of: dict[int, list] = {}
    for did, toks in enumerate(token_docs):
        cs = [
            " ".join(toks[i * 10 : i * 10 + 10])
            for i in range(-(-len(toks) // 10))
        ]
        chunks_of[did] = cs
        for idx, c in enumerate(cs):
            if c not in first:
                first[c] = (did, idx)
    model = {}
    for did, cs in chunks_of.items():
        kept = [c for idx, c in enumerate(cs) if first[c] == (did, idx)]
        if kept:
            model[did] = (" ".join(kept), len(kept), len(cs))

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    # mirror the gate's plan on the synthetic frame
    n10 = F.ceil(F.size(F.split(F.col("text"), " ", -1)) / F.lit(10.0))
    chunked = docs.select(
        "doc_id",
        F.split(F.col("text"), " ", -1).alias("ts"),
        F.explode(F.sequence(F.lit(0), (n10 - 1).cast("long"))).alias("idx"),
    ).select(
        "doc_id",
        "idx",
        F.array_join(F.expr("slice(ts, idx * 10 + 1, 10)"), " ").alias(
            "chunk"
        ),
    )
    from pyspark.sql import Window

    wk = Window.partitionBy("chunk").orderBy("doc_id", "idx")
    keep = (
        chunked.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == 1)
        .select("doc_id", "idx", "chunk")
    )
    totals = chunked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("tot")
    )
    rebuilt = keep.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("text_clean"),
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["kept"], r["tot"])
        for r in rebuilt.join(totals, "doc_id").collect()
    }
    assert got == model, (texts, got, model)


class TestForeachBatchUpsert:
    def test_final_snapshot_matches_one_shot_merge(self, spark, sf_dir):
        """Three execution tiers — one-shot batch merge, keyed-state
        streaming CDC, and the foreachBatch copy-on-write loop — must
        produce the identical table."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        feb = (
            REGISTRY["streaming_foreachbatch_upsert"]
            .spark(spark, sf_dir)
            .orderBy("doc_id")
            .collect()
        )
        batch = (
            REGISTRY["documents_cdc_apply"]
            .spark(spark, sf_dir)
            .orderBy("doc_id")
            .collect()
        )
        assert feb == batch


class TestConstraintAudit:
    def test_each_planted_violation_detected_once(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        got = {
            r.check_name: r.n_violations
            for r in REGISTRY["orders_constraint_audit"]
            .spark(spark, sf_dir)
            .collect()
        }
        assert got == {"duplicate_pk": 1, "null_fk": 1, "orphan_fk": 1}


class TestNonceGapAudit:
    def test_ordered_tape_has_no_regressions_and_audit_is_consistent(
        self, spark, sf_dir
    ):
        """The synthetic tape is time/nonce-ordered, so regressions must
        be zero; per-symbol nonce steps ARE irregular (symbol is
        user_id % 4 — not a fixed stride), so gaps are expected but must
        be internally consistent: every gap contributes at least one
        missing message."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = REGISTRY["book_nonce_gap_audit"].spark(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.n_nonce_regressions == 0 and r.n_ts_regressions == 0
            assert r.n_missing >= r.n_gaps >= 0
            assert r.n_rows > 1

    def test_planted_gap_detected(self, spark):
        """Drop two interior rows from one instrument: the audit must
        report one gap of exactly two missing messages there."""
        from pyspark.sql import Row

        from market_microstructure_toolkit_spark.plans.queries import (
            KEYS,
            ORDER_COLS,
        )

        rows = [
            Row(exchange_id="e", symbol="S", ts_ms=1000 + 10 * i,
                raw_nonce=100 + i)
            for i in range(10)
            if i not in (4, 5)
        ]
        df = spark.createDataFrame(rows)
        w = Window.partitionBy(*KEYS).orderBy(*ORDER_COLS)
        d = df.select(
            *KEYS,
            (F.col("raw_nonce") - F.lag("raw_nonce").over(w)).alias("dn"),
        ).filter(F.col("dn").isNotNull())
        step = d.groupBy(*KEYS).agg(F.min("dn").alias("min_step"))
        out = (
            d.join(step, list(KEYS))
            .groupBy(*KEYS)
            .agg(
                F.sum((F.col("dn") > F.col("min_step")).cast("long")).alias(
                    "n_gaps"
                ),
                F.sum(
                    F.when(
                        F.col("dn") > F.col("min_step"),
                        (F.col("dn") - F.col("min_step")) / F.col("min_step"),
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("n_missing"),
            )
            .collect()[0]
        )
        assert out.n_gaps == 1 and out.n_missing == 2


class TestDocumentsProfile:
    def test_single_scan_and_counts_match_direct(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        df = REGISTRY["documents_profile"].spark(spark, sf_dir)
        # one table scan in the plan, not one per profiled column
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan parquet") == 1
        got = {r.column_name: r for r in df.collect()}
        # the gate profiles the F7-planted fixture (which adds NULL
        # langs) — compare against the same input
        from market_microstructure_toolkit_spark.plans.base import plant_docs

        docs = plant_docs(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        assert got["doc_id"].n_distinct == docs.select("doc_id").distinct().count()
        assert got["lang"].n_null == docs.filter("lang IS NULL").count()
        assert got["lang"].n_null > 0


from hypothesis import HealthCheck as _HC2
from hypothesis import given as _given2
from hypothesis import settings as _settings2
from hypothesis import strategies as _st2

_delta_plan = _st2.fixed_dictionaries(
    {
        "dels": _st2.sets(_st2.integers(0, 29), max_size=8),
        "mods": _st2.sets(_st2.integers(0, 29), max_size=8),
        # text set to NULL in v2 (value->NULL change) — must be flagged
        "nulls": _st2.sets(_st2.integers(0, 29), max_size=6),
        # base rows whose text is NULL in BOTH versions (NULL==NULL:
        # must NOT be flagged) and, when also in mods, NULL->value
        "base_nulls": _st2.sets(_st2.integers(0, 29), max_size=6),
        "ins": _st2.sets(_st2.integers(100, 120), max_size=5),
    }
)


@_settings2(
    max_examples=10,
    deadline=None,
    suppress_health_check=[_HC2.function_scoped_fixture],
)
@_given2(plan=_delta_plan)
def test_merkle_diff_property_random_deltas(spark, plan):
    """Property: for ANY random delete/modify/insert/nullify delta, the
    SHIPPED operators.reconcile.table_diff (fingerprint+prune+detail
    join) equals the expected delta — on 8 buckets so multi-row buckets
    (changed+unchanged mixes) occur, and with NULL text on both the
    unchanged path (NULL==NULL must not flag) and the changed paths
    (value->NULL and NULL->value must flag)."""
    from pyspark.sql import functions as F

    from market_microstructure_toolkit_spark.operators.reconcile import (
        table_diff,
    )

    base_nulls = plan["base_nulls"]
    rows = [
        (i, None if i in base_nulls else f"text {i}", "en", "s", 10 + i)
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # v2 text: NULLed for `nulls`; '[mod]'-suffixed (or NULL->'mod i')
    # for `mods`; else unchanged (possibly NULL from base_nulls).
    mods, nulls = plan["mods"], plan["nulls"]
    v2 = (
        docs.filter(~F.col("doc_id").isin(*plan["dels"]) if plan["dels"] else F.lit(True))
        .withColumn(
            "text",
            F.when(
                F.col("doc_id").isin(*nulls) if nulls else F.lit(False),
                F.lit(None).cast("string"),
            )
            .when(
                F.col("doc_id").isin(*mods) if mods else F.lit(False),
                F.coalesce(
                    F.concat(F.col("text"), F.lit(" [mod]")),
                    F.concat(F.lit("mod "), F.col("doc_id").cast("string")),
                ),
            )
            .otherwise(F.col("text")),
        )
        .unionByName(
            spark.createDataFrame(
                [(i, f"new {i}", "en", "s", 0) for i in sorted(plan["ins"])],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
        )
    )
    got = {
        (r.doc_id, r.status)
        for r in table_diff(docs, v2, "doc_id", n_buckets=8).collect()
    }
    surviving = set(range(30)) - plan["dels"]
    changed = (
        # value -> NULL (only a change if the base text was non-null)
        {i for i in nulls & surviving if i not in base_nulls}
        # modified: value->'... [mod]' or NULL->'mod i'; `nulls` wins
        | {i for i in (mods - nulls) & surviving}
    )
    expect = (
        {(i, "only_v1") for i in plan["dels"]}
        | {(i, "changed") for i in changed}
        | {(i, "only_v2") for i in plan["ins"]}
    )
    assert got == expect, plan


@_settings2(
    max_examples=10,
    deadline=None,
    suppress_health_check=[_HC2.function_scoped_fixture],
)
@_given2(
    vals=_st2.lists(
        _st2.one_of(_st2.none(), _st2.floats(0.5, 100.0, allow_nan=False)),
        min_size=2,
        max_size=25,
    )
)
def test_delta_reconstruct_property_random_null_tape(spark, vals):
    """Property: sentinel delta-encoding then last-non-null carry
    reconstructs ANY single-field tape exactly, including null runs,
    value->null and null->value transitions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i long, x double")
    w = Window.partitionBy("k").orderBy("i")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    enc = F.coalesce(F.col("x"), F.lit(-1.0))
    deltas = df.select(
        "k",
        "i",
        enc.alias("e"),
        F.when(
            F.lag(enc).over(w).isNull() | (enc != F.lag(enc).over(w)), enc
        ).alias("d"),
    )
    recon = deltas.withColumn(
        "r", F.last("d", ignorenulls=True).over(wrun)
    ).collect()
    got = [
        None if r.r == -1.0 else r.r for r in sorted(recon, key=lambda r: r.i)
    ]
    assert got == list(vals)
