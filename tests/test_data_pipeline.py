"""Unit tests for the data-pipeline tier (dedup, similarity, text
analysis, multimodal plumbing) on tiny hand-checkable inputs, mirroring
the reference's exact-value test style (SURVEY §5)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.operators import dedup as D
from market_microstructure_toolkit_spark.operators import multimodal as MM
from market_microstructure_toolkit_spark.operators import similarity as SIM
from market_microstructure_toolkit_spark.operators import text_analysis as TA


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def test_word_shingles(spark):
    df = docs_df(spark, [(1, "a b c d"), (2, "a b"), (3, "x x x x")])
    out = {
        r["doc_id"]: sorted(r["sh"])
        for r in df.select(
            "doc_id", D.word_shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # shorter than n
    assert out[3] == ["x x x"]  # distinct


def test_exact_dedup(spark):
    df = docs_df(spark, [(1, "same text"), (2, "same text"), (3, "other")])
    out = {r["canonical_doc_id"]: r["n_copies"] for r in D.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_signature_set_semantics(spark):
    # identical shingle SETS (duplication and order of extra repeats can't
    # change a min-hash) -> identical signatures
    df = docs_df(spark, [(1, "a b c d"), (2, "a b c d"), (3, "q w e r")])
    sigs = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
            for r in D.minhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    # cross-check one element against a pure-python recompute
    grams = ["a b c", "b c d"]
    want = min(hashlib.md5(f"{g}#0".encode()).hexdigest() for g in grams)
    assert sigs[1][0] == want


def test_minhash_short_docs_drop_out(spark):
    df = docs_df(spark, [(1, "only two"), (2, "a b c")])
    ids = [r["doc_id"] for r in D.minhash_signatures(df).collect()]
    assert ids == [2]


def test_minhash_lsh_candidates(spark):
    df = docs_df(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely here now today ok"),
        ],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in D.minhash_lsh_candidates(df).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_exact_value(spark):
    # doc1 shingles {a b c, b c d}; doc2 shingles {a b c, b c e}
    # intersection 1, union 3 -> 1/3
    df = docs_df(spark, [(1, "a b c d"), (2, "a b c e")])
    rows = D.ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert len(rows) == 1
    assert rows[0]["id_a"] == 1 and rows[0]["id_b"] == 2
    assert rows[0]["jaccard"] == pytest.approx(1 / 3, abs=1e-12)


def test_simhash16_matches_python_recompute(spark):
    text = "the quick brown fox"
    df = docs_df(spark, [(1, text), (2, text), (3, "zzz yyy xxx")])
    out = {r["doc_id"]: r["sh"] for r in df.select(
        "doc_id", D.simhash16("text").alias("sh")).collect()}
    assert out[1] == out[2]
    assert 0 <= out[1] <= 0xFFFF

    votes = [0] * 16
    for tok in text.split(" "):
        h = hashlib.md5(tok.encode()).hexdigest()
        for b in range(16):
            votes[b] += 1 if h[b] >= "8" else -1
    want = sum(1 << b for b in range(16) if votes[b] > 0)
    assert out[1] == want


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------

def emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering(spark):
    df = emb_df(
        spark,
        [
            (0, [1.0, 0.0]),          # query
            (1, [2.0, 0.0]),          # cos 1.0
            (2, [1.0, 1.0]),          # cos ~0.7071
            (3, [0.0, 1.0]),          # cos 0.0
            (4, [-1.0, 0.0]),         # cos -1.0
        ],
    )
    q = df.filter(F.col("vec_id") == 0).select(
        SIM.as_double("embedding").alias("qv")
    )
    out = SIM.cosine_topk(df.filter(F.col("vec_id") != 0), q, k=2).collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    assert out[0]["cos_sim"] == pytest.approx(1.0)
    assert out[1]["cos_sim"] == pytest.approx(math.sqrt(0.5))


def test_lsh_single_band_same_orthant(spark):
    # n_bands=1 degenerates the banded generator to plain sign-LSH:
    # same-orthant vectors pair, the opposite orthant does not.
    df = emb_df(
        spark,
        [
            (1, [1.0] * 8),
            (2, [0.5] * 8),     # same sign pattern as 1 -> same bucket
            (3, [-1.0] * 8),    # different bucket
        ],
    )
    pairs = {(r["id_a"], r["id_b"]): r for r in
             SIM.lsh_banded_pairs(
                 df, bits_per_band=8, n_bands=1, min_cosine=-2.0
             ).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["cos_sim"] == pytest.approx(1.0)


def test_contamination_flags_counts_distinct_shared_shingles(spark):
    corpus = docs_df(
        spark,
        [
            (1, "the quick brown fox jumps high"),  # shares 2 shingles
            (2, "the quick brown cat"),             # shares 1 -> unflagged
            (3, "zz yy xx ww"),                     # shares 0
            (4, "the quick brown fox the quick brown fox"),  # dup shingles
        ],
    )
    bench = docs_df(spark, [(100, "the quick brown fox jumps")])
    out = {r["doc_id"]: r["n_shared"] for r in D.contamination_flags(
        corpus, bench, shingle_n=3, min_shared=2).collect()}
    # doc 1: 'the quick brown','quick brown fox','brown fox jumps' = 3
    # doc 4 repeats its shingles but distinct-counts only 2
    assert out == {1: 3, 4: 2}


def test_contamination_benchmark_is_broadcast(spark):
    corpus = docs_df(spark, [(1, "a b c d e")])
    bench = docs_df(spark, [(9, "a b c")])
    plan = (
        D.contamination_flags(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rebalance_keeps_smallest_group_whole(spark):
    rows = [(i, "t", "en") for i in range(200)] + [
        (1000 + i, "t", "fr") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = TA.rebalance_keep_flag(df, group_col="lang")
    per = {
        r["lang"]: (r["n"], r["k"])
        for r in out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("kept").cast("int")).alias("k"))
        .collect()
    }
    assert per["fr"] == (20, 20)          # smallest group keeps all
    n, k = per["en"]
    assert n == 200 and 5 <= k <= 45      # ~10% rate, hash-random
    # deterministic: same flags on re-evaluation
    again = {r["doc_id"]: r["kept"] for r in
             TA.rebalance_keep_flag(df, group_col="lang").collect()}
    first = {r["doc_id"]: r["kept"] for r in out.collect()}
    assert again == first


def test_pack_assignments_splits_on_boundary(spark):
    from market_microstructure_toolkit_spark.operators import packing as PK

    # one shard (n_shards=1), budget 5; doc 1 = 3 toks, doc 2 = 4 toks
    # stream: doc1 [0,3), doc2 [3,7) -> doc2 spans seqs 0 and 1 (2+2)
    df = docs_df(spark, [(1, "a b c"), (2, "d e f g")])
    out = sorted(
        (r["seq_id"], r["doc_id"], r["tok_in_seq"])
        for r in PK.pack_assignments(df, budget=5, n_shards=1).collect()
    )
    assert out == [(0, 1, 3), (0, 2, 2), (1, 2, 2)]


def test_pack_stats_full_sequences_hold_exactly_budget(spark, sf_dir):
    from market_microstructure_toolkit_spark.operators import packing as PK
    from market_microstructure_toolkit_spark.plans.queries import _docs

    stats = PK.pack_stats(_docs(spark, sf_dir), budget=256, n_shards=8)
    w = Window.partitionBy("shard")
    rows = stats.withColumn("last", F.col("seq_id") == F.max("seq_id").over(w))
    bad = rows.filter(~F.col("last") & (F.col("seq_tokens") != 256)).count()
    assert bad == 0
    assert rows.filter(F.col("seq_tokens") > 256).count() == 0


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    """The 3-probe candidate set is a superset of single-probe's (the
    query's own cell is by definition its nearest centroid), so recall
    can only go up — the invariant that makes the probe count a safe
    dial."""
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    sp = REGISTRY["similarity_ann_recall"].spark(spark, sf).first()
    mp = REGISTRY["similarity_ann_recall_multiprobe"].spark(spark, sf).first()
    assert mp["n_overlap"] >= sp["n_overlap"]
    assert 0.0 <= mp["recall_at_10"] <= 1.0


def test_ivf_multiprobe_stays_broadcast(spark):
    """Probe expansion must not introduce a shuffle join: probes and the
    query vector are 3-row/1-row broadcasts over the assigned table."""
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    df = REGISTRY["similarity_ivf_multiprobe"].spark(
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_lang_id(spark):
    df = docs_df(
        spark,
        [
            (1, "the cat and the dog of a house"),
            (2, "der hund und die katze ist gut"),
            (3, "qqq www eee"),
        ],
    )
    out = {r["doc_id"]: r["lang"] for r in df.select(
        "doc_id", TA.lang_id_expr("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_lang_id_tie_breaks_alphabetically(spark):
    # 'le' is fr-marker, 'el' is es-marker: one hit each -> 'es' < 'fr'
    df = docs_df(spark, [(1, "le el")])
    assert df.select(TA.lang_id_expr("text")).first()[0] == "es"


def test_quality_features_exact(spark):
    text = "Hello world 42."
    df = docs_df(spark, [(1, text)])
    r = TA.quality_features(df).first()
    assert r["n_tokens"] == 3
    # nonspace = 13 chars over 3 tokens
    assert r["avg_token_len"] == pytest.approx(13 / 3)
    assert r["alpha_ratio"] == pytest.approx(10 / 15)
    assert r["digit_ratio"] == pytest.approx(2 / 15)
    assert r["punct_ratio"] == pytest.approx(1 / 15)
    assert r["stopword_ratio"] == pytest.approx(0.0)
    want = (
        min(3 / 20, 1.0) * 0.4
        + (10 / 15) * 0.4
        + (1.0 - min((2 / 15) * 5, 1.0)) * 0.1
        + (1.0 - min((1 / 15) * 10, 1.0)) * 0.1
    )
    assert r["quality_score"] == pytest.approx(want, abs=1e-12)


def test_stopword_ratio(spark):
    df = docs_df(spark, [(1, "The cat and the dog"), (2, "zzz qqq")])
    out = {r["doc_id"]: r["sw"] for r in df.select(
        "doc_id", TA.stopword_ratio("text").alias("sw")).collect()}
    assert out[1] == pytest.approx(3 / 5)  # the, and, the
    assert out[2] == pytest.approx(0.0)


def test_fingerprint_prefix_semantics(spark):
    base = "word " * 30  # normalized prefix (64 chars) identical
    df = docs_df(
        spark,
        [
            (1, base + "tail one"),
            (2, base.upper() + "tail   two"),  # case/whitespace-insensitive
            (3, "different start " + base),
        ],
    )
    out = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", TA.fingerprint_expr("text").alias("fp")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_token_count_bpe_ish(spark):
    # "don't stop, it's 2024" -> don ' t stop , it ' s 2024 = 9 pieces
    df = docs_df(spark, [(1, "don't stop, it's 2024")])
    assert df.select(TA.token_count_bpe_ish("text")).first()[0] == 9


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_extract_features_matches_recompute(spark):
    docs = docs_df(spark, [(1, "abc"), (2, "hello world"), (5, "xyz")])
    assets = MM.synthetic_assets(spark, docs)
    out = {r["asset_id"]: r for r in MM.extract_features(assets).collect()}
    assert set(out) == {1, 2, 5}
    for doc_id, text in [(1, "abc"), (2, "hello world"), (5, "xyz")]:
        payload = text.encode()
        assert out[doc_id]["n_bytes"] == len(payload)
        buckets = [0] * 8
        for byte in payload:
            buckets[byte % 8] += 1
        want = [b / len(payload) for b in buckets]
        assert out[doc_id]["features"] == pytest.approx(want)


def test_frame_sample_plan_counts(spark):
    docs = docs_df(spark, [(2, "v"), (3500, "v"), (3, "not video")])
    assets = MM.synthetic_assets(spark, docs)  # doc_id % 3 == 2 -> video
    out = MM.frame_sample_plan(assets, every_ms=1000).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append(r["sample_ts_ms"])
    # duration = doc_id % 10000 + 1000; samples = sequence(0, dur-1, 1000)
    assert sorted(by_asset[2]) == [0, 1000]                     # dur 1002
    assert sorted(by_asset[3500]) == list(range(0, 4500, 1000))  # dur 4500
    assert 3 not in by_asset


def test_metadata_plan_prunes_payload(spark):
    docs = docs_df(spark, [(1, "abc")])
    assets = MM.synthetic_assets(spark, docs)
    plan = MM.frame_sample_plan(assets)._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" not in plan


def test_resize_images_stub(spark):
    docs = docs_df(spark, [(3, "image doc payload bytes here"), (1, "audio")])
    assets = MM.synthetic_assets(spark, docs)  # doc_id % 3 == 0 -> image
    out = MM.resize_images(assets, target_w=2, target_h=2).collect()
    assert [r["asset_id"] for r in out] == [3]
    r = out[0]
    assert (r["width"], r["height"]) == (2, 2)
    # stub keeps a deterministic area-proportional prefix
    src = "image doc payload bytes here".encode()
    keep = max(1, len(src) * 4 // ((3 % 640 + 1) * (3 % 480 + 1)))
    assert bytes(r["payload"]) == src[:keep]


def test_winnow_guarantee_and_selectivity(spark):
    # docs 1/2 share a 40-char substring >> k + w - 1 = 13 -> must share
    # fingerprints; doc 3 shares nothing that long
    common = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"
    df = docs_df(
        spark,
        [
            (1, "prefix one " + common),
            (2, common + " suffix two"),
            (3, "totally unrelated content with no overlap at all here"),
        ],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in D.winnow_candidates(df, k=8, w=6, min_shared=1).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p for p in pairs)


def test_winnow_short_doc_empty(spark):
    df = docs_df(spark, [(1, "short")])  # < k chars -> no fingerprints
    out = df.select(D.winnow_fingerprints("text", 8, 6).alias("fp")).first()
    assert out["fp"] == []


def test_events_funnel_strict_ordering(spark, tmp_path):
    # user 1 converts fully in order; user 2 clicked BEFORE their first
    # view (click must not count); user 3 never views
    import pyspark.sql.functions as F

    ms = 1_000_000  # nanos per milli
    rows = [
        (1, 1, 10 * ms, "view"), (2, 1, 20 * ms, "click"),
        (3, 1, 30 * ms, "purchase"),
        (4, 2, 50 * ms, "click"), (5, 2, 60 * ms, "view"),
        (6, 3, 70 * ms, "click"), (7, 3, 80 * ms, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    ).withColumn("value", F.lit(1.0)).withColumn("props", F.lit("{}"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    r = REGISTRY["events_funnel"].spark(spark, str(tmp_path)).first()
    assert (r["n_view"], r["n_click_after_view"], r["n_purchase_after_click"]) == (
        2, 1, 1
    )


def test_dedup_clusters_transitive_and_singleton(spark):
    # chain 1-2-3 must collapse to one cluster (needs >1 propagation
    # round); 4 is a singleton; 5-6 a separate pair
    docs = docs_df(spark, [(i, f"doc {i}") for i in range(1, 7)])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters(docs, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_lsh_banded_pairs_unions_bands_and_dedups(spark):
    # 16-dim vectors, 2 bands x 8 bits. v1/v2 agree in band 0 only;
    # v1/v3 agree in both bands (pair must still appear ONCE).
    base = [1.0] * 16
    v2 = [0.5] * 8 + [-1.0] * 8
    v3 = [2.0] * 16
    df = emb_df(spark, [(1, base), (2, v2), (3, v3)])
    out = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in SIM.lsh_banded_pairs(
            df, bits_per_band=8, n_bands=2, min_cosine=-2.0, max_bucket=None
        ).collect()
    }
    assert (1, 2) in out and (1, 3) in out and (2, 3) in out
    assert len(out) == 3
    assert out[(1, 3)] == pytest.approx(1.0)


def test_lsh_banded_max_bucket_drops_hot_buckets(spark):
    # 5 identical vectors -> every (band, bucket) group has 5 members;
    # cap 4 must eliminate all candidate pairs.
    df = emb_df(spark, [(i, [1.0] * 16) for i in range(5)])
    out = SIM.lsh_banded_pairs(
        df, bits_per_band=8, n_bands=2, min_cosine=-2.0, max_bucket=4
    )
    assert out.count() == 0


def test_minhash_hot_bucket_guard(spark):
    # 5 identical docs share every band bucket: cap 3 drops the bucket
    # entirely, cap None (or a cap above 5) keeps all 10 pairs.
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    df = docs_df(spark, rows)
    capped = D.minhash_lsh_candidates(df, max_bucket_size=3).count()
    uncapped = D.minhash_lsh_candidates(df, max_bucket_size=None).count()
    assert capped == 0
    assert uncapped == 10


def test_repetition_stats_exact(spark):
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        repetition_stats,
    )

    # "a b a b a b" -> 2-grams: [a b, b a, a b, b a, a b]: top 'a b' x3 of 5
    # 5-grams: [a b a b a, b a b a b]: both distinct -> dup5_frac 0
    df = docs_df(spark, [(1, "a b a b a b"), (2, "x y z w v v v v v v")])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n2"] == 5 and out[1]["top2_cnt"] == 3
    assert out[1]["top2_frac"] == 3 / 5 and out[1]["dup5_frac"] == 0.0
    # doc 2: 10 tokens -> 6 5-grams, 'v v v v v' appears twice -> 1 dup of 6
    assert out[2]["n5"] == 6 and abs(out[2]["dup5_frac"] - 1 / 6) < 1e-15


def test_repetition_short_docs_drop(spark):
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        repetition_stats,
    )

    df = docs_df(spark, [(1, "just four words here"), (2, "a b c d e")])
    assert [r["doc_id"] for r in repetition_stats(df).collect()] == [2]


def test_split_expr_deterministic_and_uniform(spark):
    import hashlib

    from market_microstructure_toolkit_spark.operators.text_analysis import (
        split_expr,
    )

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["s"] for r in df.select("doc_id", split_expr().alias("s")).collect()}
    for i in (0, 7, 1999):
        b = hashlib.md5(str(i).encode()).hexdigest()[30:32]
        want = "train" if b < "f8" else ("val" if b < "fc" else "test")
        assert got[i] == want
    from collections import Counter

    c = Counter(got.values())
    assert c["train"] > 1800 and c["val"] > 0 and c["test"] > 0


def test_interval_join_halfopen_and_bin_spanning(spark):
    from market_microstructure_toolkit_spark.operators.rangejoin import (
        interval_join,
    )

    # interval [95, 205) with bin 100 spans bins 0,1,2
    ivl = spark.createDataFrame(
        [(1, "u", 95, 205), (2, "u", 300, 300)],  # second is degenerate
        "ivl_id long, k string, s long, e long",
    )
    pts = spark.createDataFrame(
        [("u", 94), ("u", 95), ("u", 150), ("u", 204), ("u", 205), ("x", 150)],
        "k string, t long",
    )
    out = sorted(
        (r["ivl_id"], r["t"])
        for r in interval_join(
            pts, ivl, keys=("k",), point_ts_col="t",
            start_col="s", end_col="e", bin_ms=100,
        ).collect()
    )
    # start inclusive, end exclusive, key must match, degenerate drops
    assert out == [(1, 95), (1, 150), (1, 204)]


def test_interval_join_is_shuffled_hash_not_nested_loop(spark):
    from market_microstructure_toolkit_spark.operators.rangejoin import (
        interval_join,
    )

    ivl = spark.createDataFrame(
        [(1, "u", 0, 100)], "ivl_id long, k string, s long, e long"
    )
    pts = spark.createDataFrame([("u", 50)], "k string, t long")
    plan = (
        interval_join(
            pts, ivl, keys=("k",), point_ts_col="t",
            start_col="s", end_col="e", bin_ms=100,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tfidf_top_terms_exact(spark):
    # 3 docs; 'rare' appears only in doc 1 (tf=2), 'common' in all three.
    df = docs_df(
        spark,
        [
            (1, "rare rare common x"),
            (2, "common y y z"),
            (3, "common z z z"),
        ],
    )
    out = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["tfidf"])
        for r in TA.tfidf_top_terms(df, top_k=2).collect()
    }
    # doc 1 top term: 'rare' tf=2 df=1 -> 2*ln(3)
    term, tf, dfq, tfidf = out[(1, 1)]
    assert (term, tf, dfq) == ("rare", 2, 1)
    assert tfidf == round(2 * math.log(3.0), 6)
    # 'common' has df=3 -> idf ln(1)=0 everywhere
    assert all(
        v[3] == 0.0 for k, v in out.items() if v[0] == "common"
    )
    # ranks are dense per doc and capped at top_k
    assert {k[1] for k in out if k[0] == 2} == {1, 2}


def test_unigram_logprob_exact(spark):
    # corpus: 4 tokens total; p(a)=2/4, p(b)=1/4, p(c)=1/4
    df = docs_df(spark, [(1, "a a b"), (2, "c")])
    out = {r["doc_id"]: r for r in TA.unigram_logprob(df).collect()}
    lp1 = (2 * math.log(0.5) + math.log(0.25)) / 3
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logprob"] == round(lp1, 6)
    assert out[2]["n_tokens"] == 1
    assert out[2]["avg_logprob"] == round(math.log(0.25), 6)


def test_ngram_novelty_first_owner(spark):
    # doc 1 introduces 'a b c','b c d'; doc 2 repeats 'a b c' and adds
    # 'b c x'; doc 3 is all repeats of doc 1's grams.
    df = docs_df(
        spark,
        [(1, "a b c d"), (2, "a b c x"), (3, "a b c d")],
    )
    out = {r["doc_id"]: r for r in TA.ngram_novelty(df, n=3).collect()}
    assert (out[1]["n_grams"], out[1]["n_novel"]) == (2, 2)
    assert out[1]["novelty"] == 1.0
    # doc 2: grams {'a b c' (first=1), 'b c x' (first=2)} -> 1/2
    assert (out[2]["n_grams"], out[2]["n_novel"]) == (2, 1)
    assert out[2]["novelty"] == 0.5
    assert out[3]["n_novel"] == 0


def test_semantic_clusters_components(spark):
    # Two clearly-similar vector pairs in one bucket + one loner:
    # v1~v2 (same direction), v3~v4 (same direction, different bucket
    # pattern), v5 alone.
    rows = [
        (1, [1.0, 1.0, 1.0, 1.0, 0.1, 0.1, 0.1, 0.1]),
        (2, [0.9, 1.1, 1.0, 1.0, 0.1, 0.1, 0.1, 0.1]),
        (3, [-1.0, -1.0, 1.0, 1.0, 0.2, 0.1, 0.1, 0.1]),
        (4, [-1.1, -0.9, 1.0, 1.0, 0.2, 0.1, 0.1, 0.1]),
        (5, [1.0, -1.0, -1.0, 1.0, -0.5, 0.1, 0.1, 0.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = (
        SIM.lsh_banded_pairs(emb, bits_per_band=8, n_bands=1, min_cosine=-2.0)
        .filter(F.round("cos_sim", 6) >= 0.9)
        .select("id_a", "id_b")
    )
    out = {
        r["vec_id"]: r["cluster_id"]
        for r in D.dedup_clusters(
            emb.select("vec_id"), pairs, id_col="vec_id"
        ).collect()
    }
    assert out[1] == 1 and out[2] == 1
    assert out[3] == 3 and out[4] == 3
    assert out[5] == 5


def test_chunk_documents_windows_and_overlap(spark):
    from market_microstructure_toolkit_spark.operators.packing import (
        chunk_documents,
    )

    # 10 tokens, chunk=4, overlap=2 -> step=2; chunks start at 0,2,4,6
    # (start 6 reaches the end: 6+4 >= 10)
    df = docs_df(spark, [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b")])
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    }
    assert out[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert out[(1, 1)] == ("t2 t3 t4 t5", 4)
    assert out[(1, 3)] == ("t6 t7 t8 t9", 4)
    assert (1, 4) not in out
    # short doc: single (possibly partial) chunk
    assert out[(2, 0)] == ("a b", 2)
    # consecutive chunks share exactly `overlap` tokens
    assert out[(1, 0)][0].split()[-2:] == out[(1, 1)][0].split()[:2]


class TestTargetMixSample:
    def test_temperature_mix_flattens_shares(self, spark, sf_dir):
        """alpha=0.5 must move the kept mix toward uniform: every
        source's kept share sits between its raw share and the uniform
        share (the defining property of temperature flattening), and
        the realized keep counts track r_s * n_s within binomial noise."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = (
            REGISTRY["corpus_target_mix_sample"].spark(spark, sf_dir).collect()
        )
        assert rows
        tot_n = sum(r.n_source for r in rows)
        tot_kept = sum(r.n_kept for r in rows)
        assert 0 < tot_kept <= tot_n
        k = len(rows)
        for r in rows:
            raw = r.n_source / tot_n
            kept = r.n_kept / tot_kept
            lo, hi = sorted((raw, 1.0 / k))
            assert lo - 0.05 <= kept <= hi + 0.05, (r.source, raw, kept)


class TestMinhashCalibration:
    def test_candidates_skew_to_high_jaccard(self, spark, sf_dir):
        """With 4 bands x 2 rows the s-curve passes ~50% at J~0.54, so
        candidate mass should sit in the upper deciles; the histogram
        must be internally consistent (sums positive, deciles in 0..9)."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = (
            REGISTRY["dedup_minhash_calibration"].spark(spark, sf_dir).collect()
        )
        assert rows
        total = sum(r.n_pairs for r in rows)
        hi = sum(r.n_pairs for r in rows if r.jaccard_decile >= 5)
        assert total > 0 and hi / total >= 0.5
        for r in rows:
            assert 0 <= r.jaccard_decile <= 9
            assert 0 < r.sum_intersection <= r.sum_union


class TestHardNegatives:
    def test_negatives_exclude_probe_label_and_rank_dense(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY
        from pyspark.sql import functions as F

        rows = (
            REGISTRY["embedding_hard_negatives"].spark(spark, sf_dir).collect()
        )
        assert rows
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        labels = {
            r.vec_id: r.label
            for r in emb.filter(
                (F.col("vec_id") % 50 == 0) & (F.col("vec_id") <= 1550)
            ).collect()
        }
        by_probe = {}
        for r in rows:
            by_probe.setdefault(r.qid, []).append(r)
            assert r.label != labels[r.qid]  # a negative, never the class
        for qid, rs in by_probe.items():
            assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))
            sims = [x.cos_sim for x in sorted(rs, key=lambda x: x.rank)]
            assert sims == sorted(sims, reverse=True)


class TestSessionWindowReplay:
    def test_watermark_holds_back_open_sessions(self, spark, sf_dir):
        """Append-mode session windows must NOT emit sessions still open
        at the final watermark — the emitted set is strictly smaller
        than the full batch sessionization."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        emitted = (
            REGISTRY["streaming_session_window_replay"]
            .spark(spark, sf_dir)
            .count()
        )
        total = REGISTRY["events_sessionize"].spark(spark, sf_dir).count()
        assert 0 < emitted < total


class TestScd2Build:
    def test_versions_tile_each_users_timeline(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = REGISTRY["users_scd2_build"].spark(spark, sf_dir).collect()
        assert rows
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        for uid, vs in by_user.items():
            vs.sort(key=lambda r: r.valid_from_us)
            assert sum(1 for r in vs if r.is_current) == 1
            assert vs[-1].is_current and vs[-1].valid_to_us is None
            for a, b in zip(vs, vs[1:]):
                assert a.valid_to_us == b.valid_from_us  # half-open tiling
                assert a.valid_from_us < a.valid_to_us


class TestIncrementalDedup:
    def test_kinds_partition_batch_and_exact_implies_match(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY
        from pyspark.sql import functions as F

        rows = (
            REGISTRY["documents_incremental_dedup"].spark(spark, sf_dir).collect()
        )
        assert rows
        kinds = {r.dup_kind for r in rows}
        assert kinds <= {"exact", "near", "unique"}
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        rng = docs.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).collect()[0]
        mid = (rng["lo"] + rng["hi"]) // 2
        # every batch doc classified exactly once
        n_batch = docs.filter(F.col("doc_id") > mid).count()
        assert len(rows) == n_batch
        # 'exact' really means the text exists in the corpus half
        corpus_texts = {
            r.text
            for r in docs.filter(F.col("doc_id") <= mid).select("text").collect()
        }
        batch_texts = {
            r.doc_id: r.text
            for r in docs.filter(F.col("doc_id") > mid).collect()
        }
        for r in rows:
            if r.dup_kind == "exact":
                assert batch_texts[r.doc_id] in corpus_texts
            if r.dup_kind == "unique":
                assert batch_texts[r.doc_id] not in corpus_texts


class TestGdprErasure:
    def test_erasure_report_consistent_and_complete(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = REGISTRY["events_gdpr_erasure"].spark(spark, sf_dir).collect()
        assert rows
        assert all(r.erasure_complete for r in rows)
        assert any(r.n_erased > 0 for r in rows)
        for r in rows:
            assert r.n_after == r.n_before - r.n_erased

    def _fixture(self, spark):
        from pyspark.sql import functions as F

        ev = spark.createDataFrame(
            [(i, i % 10, "click" if i % 2 else "view") for i in range(100)],
            "event_id long, user_id long, event_type string",
        )
        requests = ev.filter(F.col("user_id") % 3 == 0).select("user_id")
        return ev, requests

    def test_over_deleting_scrub_breaks_arithmetic_identity(self, spark):
        """An over-deleting scrub (drops non-requested users too) must
        make the COUNTED n_after fall short of n_before - n_erased —
        the arithmetic identity the DuckDB oracle computes — while a
        leak-only audit would have passed it (erasure_complete TRUE)."""
        from pyspark.sql import functions as F

        from market_microstructure_toolkit_spark.operators.privacy import (
            erasure_report,
        )

        ev, requests = self._fixture(spark)
        # over-delete: also scrubs user 1 (never requested: 1 % 3 != 0)
        bad_remaining = ev.filter(
            (F.col("user_id") % 3 != 0) & (F.col("user_id") != 1)
        )
        rows = erasure_report(ev, requests, remaining=bad_remaining).collect()
        assert all(r.erasure_complete for r in rows)  # the old blind spot
        assert any(r.n_after < r.n_before - r.n_erased for r in rows)

    def test_leaking_scrub_flips_erasure_complete(self, spark):
        from pyspark.sql import functions as F

        from market_microstructure_toolkit_spark.operators.privacy import (
            erasure_report,
        )

        ev, requests = self._fixture(spark)
        # leak: requested user 0 survives the scrub
        bad_remaining = ev.filter(
            (F.col("user_id") % 3 != 0) | (F.col("user_id") == 0)
        )
        rows = erasure_report(ev, requests, remaining=bad_remaining).collect()
        assert all(not r.erasure_complete for r in rows)

    def test_correct_scrub_passes_both_directions(self, spark):
        from market_microstructure_toolkit_spark.operators.privacy import (
            erasure_report,
        )

        ev, requests = self._fixture(spark)
        rows = erasure_report(ev, requests).collect()
        assert rows and all(r.erasure_complete for r in rows)
        for r in rows:
            assert r.n_after == r.n_before - r.n_erased


class TestConversionAttribution:
    def test_touch_ordering_and_lookback(self, spark, sf_dir):
        """First touch <= last touch in time, both strictly before the
        conversion, within 7 days, and never a conversion event
        themselves; NULL only when the lookback is empty."""
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY
        from market_microstructure_toolkit_spark.sources.events import (
            read_events,
        )

        rows = (
            REGISTRY["events_conversion_attribution"]
            .spark(spark, sf_dir)
            .collect()
        )
        assert rows
        ev = read_events(spark, sf_dir).collect()
        ts = {r.event_id: r.ts for r in ev}
        conv_type = max(r.event_type for r in ev)
        types = {r.event_id: r.event_type for r in ev}
        n_attributed = 0
        for r in rows:
            assert types[r.conversion_event_id] == conv_type
            if r.first_touch_event_id is None:
                assert r.last_touch_event_id is None
                continue
            n_attributed += 1
            ft, lt, ct = (
                ts[r.first_touch_event_id],
                ts[r.last_touch_event_id],
                ts[r.conversion_event_id],
            )
            assert ft <= lt < ct
            assert ct - ft <= 604_800_000_000_000
            assert types[r.first_touch_event_id] != conv_type
            assert types[r.last_touch_event_id] != conv_type
        assert n_attributed > 0


class TestConversionLatency:
    def test_latency_positive_and_counts_match_attribution(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = (
            REGISTRY["events_conversion_latency"].spark(spark, sf_dir).collect()
        )
        assert rows
        total = sum(r.n_conversions for r in rows)
        attributed = (
            REGISTRY["events_conversion_attribution"]
            .spark(spark, sf_dir)
            .filter("last_touch_event_id IS NOT NULL")
            .count()
        )
        assert total == attributed
        for r in rows:
            assert 0 <= r.median_latency_ms <= r.p90_latency_ms


class TestLangidConfusion:
    def test_matrix_mass_and_diagonal_dominance(self, spark, sf_dir):
        from market_microstructure_toolkit_spark.plans.queries import REGISTRY

        rows = (
            REGISTRY["doc_langid_confusion"].spark(spark, sf_dir).collect()
        )
        assert rows
        total = sum(r.n_docs for r in rows)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert total == n_docs  # every doc classified exactly once
        # the fixture's text is English-like regardless of its lang
        # LABEL (the matrix exists precisely to surface such
        # label/content mismatches) — so the defensible invariants are:
        # labeled-en docs classify en-dominantly, and predictions are
        # only known languages or 'und'
        en = {r.predicted_lang: r.n_docs for r in rows if r.labeled_lang == "en"}
        assert en.get("en", 0) > sum(v for k, v in en.items() if k != "en")
        from market_microstructure_toolkit_spark.operators.text_analysis import (
            LANG_MARKERS,
        )

        # F7 plants add NULL-text docs (no prediction at all -> NULL,
        # distinct from 'und' = real text with no markers) and NULL
        # labels; both must appear as real matrix cells
        allowed = set(LANG_MARKERS) | {"und", None}
        assert {r.predicted_lang for r in rows} <= allowed
        assert any(r.predicted_lang is None for r in rows)
        assert any(r.labeled_lang is None for r in rows)


def test_substring_dup_spans_maximal_merge_and_guards(spark):
    docs = spark.createDataFrame(
        [
            # docs 1/2 share the 7-token phrase "a b c d e f g": three
            # overlapping duplicated 5-shingles must merge to ONE span
            (1, "x1 x2 a b c d e f g y1 y2"),
            (2, "z a b c d e f g"),
            # internal repetition: same 5-gram at pos 1 and 12, gap 11
            # > L -> two islands, not one corpus-sized smear
            (3, "p q r s t m1 m2 m3 m4 m5 m6 p q r s t"),
            (4, "u1 u2 u3 u4 u5 u6 u7 u8"),  # unique -> no spans
            (5, "a b c"),  # shorter than L -> contributes nothing
            (6, None),  # NULL text -> contributes nothing
            # exactly-adjacent duplicated 5-grams (gap == L) are one
            # contiguous union -> one merged 10-token span
            (7, "c1 c2 c3 c4 c5 d1 d2 d3 d4 d5"),
            (8, "c1 c2 c3 c4 c5"),
            (9, "d1 d2 d3 d4 d5"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["span_tokens"])
        for r in D.substring_dup_spans(docs, min_tokens=5).collect()
    }
    assert out == {
        (1, 3): (9, 7),
        (2, 2): (8, 7),
        (3, 1): (5, 5),
        (3, 12): (16, 5),
        (7, 1): (10, 10),
        (8, 1): (5, 5),
        (9, 1): (5, 5),
    }
