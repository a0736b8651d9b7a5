"""Document-corpus gate queries (dedup, text analysis, packing,
curation, multimodal, lifecycle) - split from plans/queries.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from market_microstructure_toolkit_spark.operators import trades as T
from market_microstructure_toolkit_spark.operators import window_metrics as W
from market_microstructure_toolkit_spark.plans.base import (
    _CDC_SQL,
    _docs,
    _emb,
    _scratch,
    lsh_keyed_sql,
    parquet_col_range,
    parquet_rows,
    plant_docs,
    register_planted as register,
)


def _docs_id_range(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(min, max) doc_id — from parquet row-group statistics when exact
    (a metadata pull; plants never touch doc_id, so the raw-file stats
    ARE the planted frame's range), else one Spark aggregate fallback
    (round 13, guide §1.2: three gates each paid a full scheduled
    min/max scan per invocation for this constant)."""
    rng = parquet_col_range(f"{sf_dir}/documents.parquet", "doc_id")
    if rng is None:
        row = _docs(spark, sf_dir).agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).collect()[0]
        rng = (row["lo"], row["hi"])
    return rng


_DEDUP_EXACT_SQL = """
SELECT content_hash,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS canonical_doc_id
FROM (SELECT doc_id, md5(text) AS content_hash FROM documents)
GROUP BY content_hash
HAVING COUNT(*) >= 1
"""


@register("dedup_exact", _DEDUP_EXACT_SQL)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy keeping the lowest doc_id as
    canonical. At 100 TB this is the standard single-shuffle dedup; the
    hash-group keys distribute uniformly so no skew handling needed."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.col("doc_id"), F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


_TEXT_STATS_SQL = """
SELECT
  doc_id,
  lang,
  n_chars,
  length(text) AS text_len,
  len(string_split(text, ' ')) AS n_tokens,
  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
  CASE WHEN len(string_split(text, ' ')) > 0
       THEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / CAST(len(string_split(text, ' ')) AS DOUBLE)
  END AS avg_token_len
FROM documents
"""


@register("doc_text_stats", _TEXT_STATS_SQL)
def q_doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality stats: length, whitespace token count, avg token
    length — pure JVM string expressions, no UDF."""
    docs = _docs(spark, sf_dir)
    text = F.col("text")
    n_tokens = F.size(F.split(text, " ", -1))
    nonspace = F.length(F.regexp_replace(text, " ", ""))
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.length(text).alias("text_len"),
        n_tokens.cast("long").alias("n_tokens"),
        (F.length(text) - nonspace).cast("long").alias("n_spaces"),
        F.when(
            n_tokens > 0, nonspace.cast("double") / n_tokens.cast("double")
        ).alias("avg_token_len"),
    )


_MINHASH_SQL = """
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gs
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
),
sigs AS (
  SELECT doc_id,
         list_aggregate(list_transform(gs, g -> md5(g || '#0')), 'min') AS mh0,
         list_aggregate(list_transform(gs, g -> md5(g || '#1')), 'min') AS mh1,
         list_aggregate(list_transform(gs, g -> md5(g || '#2')), 'min') AS mh2,
         list_aggregate(list_transform(gs, g -> md5(g || '#3')), 'min') AS mh3,
         list_aggregate(list_transform(gs, g -> md5(g || '#4')), 'min') AS mh4,
         list_aggregate(list_transform(gs, g -> md5(g || '#5')), 'min') AS mh5,
         list_aggregate(list_transform(gs, g -> md5(g || '#6')), 'min') AS mh6,
         list_aggregate(list_transform(gs, g -> md5(g || '#7')), 'min') AS mh7
  FROM grams
),
keyed AS (
  SELECT doc_id, band, key FROM (
    SELECT doc_id, 0 AS band, concat_ws('|', mh0, mh1) AS key FROM sigs WHERE mh0 IS NOT NULL
    UNION ALL
    SELECT doc_id, 1, concat_ws('|', mh2, mh3) FROM sigs WHERE mh0 IS NOT NULL
    UNION ALL
    SELECT doc_id, 2, concat_ws('|', mh4, mh5) FROM sigs WHERE mh0 IS NOT NULL
    UNION ALL
    SELECT doc_id, 3, concat_ws('|', mh6, mh7) FROM sigs WHERE mh0 IS NOT NULL
  )
  -- hot-bucket guard (max_bucket_size=64) + singleton pruning, mirroring
  -- minhash_lsh_candidates
  QUALIFY COUNT(*) OVER (PARTITION BY band, key) BETWEEN 2 AND 64
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM keyed a JOIN keyed b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
"""


@register("dedup_minhash_lsh", _MINHASH_SQL)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 3-word shingles -> 8 md5 min-hashes
    -> 4 banded keys -> bucket self-join. The lexicographic-min-of-hex trick
    keeps the hash family engine-portable. Shuffle is keyed on band values;
    pairwise work is per-bucket, not global n^2."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        minhash_lsh_candidates,
    )

    docs = _docs(spark, sf_dir)
    return minhash_lsh_candidates(docs, k=8, rows_per_band=2, shingle_n=3)


_NGRAM_JACCARD_SQL = """
WITH grams0 AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
),
rare AS (SELECT g FROM grams0 GROUP BY g
         HAVING COUNT(*) <= (SELECT GREATEST(10, COUNT(*) // 5000)
                             FROM documents)),
grams AS (SELECT g0.doc_id, g0.g FROM grams0 g0 JOIN rare USING (g)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.05
"""


@register("dedup_ngram_jaccard", _NGRAM_JACCARD_SQL)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over an inverted shingle index (explode +
    shingle self-join + integer set algebra — engine-exact values). The
    corpus-relative hot-shingle guard (df <= max(10, n_docs // 5000))
    bounds the self-join fan-out (boilerplate shingle in d docs ->
    d^2/2 rows) and is mirrored in the oracle's `rare` CTE."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        auto_doc_freq_cap,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf_dir)
    return ngram_jaccard_pairs(
        docs,
        shingle_n=3,
        threshold=0.05,
        # same integer as "auto" (plants are row-preserving, so the
        # parquet footer rowcount == docs.count()), minus the Spark
        # count job "auto" schedules per invocation (round 13)
        max_doc_freq=auto_doc_freq_cap(
            parquet_rows(f"{sf_dir}/documents.parquet")
        ),
    )


_DECONTAM_SQL = """
WITH bench AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
  FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 50 = 0)
  WHERE len(w) >= 3
),
corp AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE doc_id % 50 != 0)
  WHERE len(w) >= 3
)
SELECT c.doc_id, COUNT(*) AS n_shared
FROM corp c JOIN bench USING (g)
GROUP BY c.doc_id
HAVING COUNT(*) >= 2
"""


@register("decontaminate", _DECONTAM_SQL)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the corpus: every 50th document
    plays the held-out eval set; corpus docs sharing >= 2 distinct
    3-gram shingles with ANY benchmark doc are flagged (doc_id,
    n_shared). The benchmark's distinct-shingle vocabulary is broadcast,
    so the pass is map-side semi-join + partial-aggregated count — the
    shape that decontaminates a 100 TB corpus without a corpus-keyed
    self-join."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        contamination_flags,
    )

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_flags(corpus, bench, shingle_n=3, min_shared=2)


_PACK_SQL = """
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
  FROM documents
),
cum AS (
  SELECT doc_id, shard, tok,
         CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS e
  FROM toks
),
spans AS (
  SELECT shard, doc_id, tok, e - tok AS s, e,
         unnest(range((e - tok) // 256, (e - 1) // 256 + 1)) AS seq_id
  FROM cum
)
SELECT shard, seq_id, COUNT(*) AS n_docs,
       CAST(SUM(LEAST(e, (seq_id + 1) * 256) - GREATEST(s, seq_id * 256))
            AS BIGINT) AS seq_tokens
FROM spans
GROUP BY shard, seq_id
"""


@register("pack_sequences", _PACK_SQL)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing over the corpus: 8 shards,
    256-token sequences, documents spanning chunk boundaries split by
    exact interval arithmetic. Output is the per-sequence occupancy
    report (shard, seq_id, n_docs, seq_tokens) a packing job emits —
    every sequence but each shard's last must hold exactly 256 tokens.
    The cumsum window is PARTITIONED by shard (n independent sorts, not
    one global sort), the stats groupBy keys on (shard, seq): both
    survive a 100 TB corpus by raising n_shards."""
    from market_microstructure_toolkit_spark.operators.packing import pack_stats

    return pack_stats(
        _docs(spark, sf_dir),
        budget=256,
        n_shards=8,
        # per-shard rows = corpus / 8 — size-dispatch the cumsum.
        # Skew-safe by CONSTRUCTION, not by fixture luck: the shard key
        # is pmod(doc_id, n_shards), assigned by the operator itself —
        # uniform for any id distribution, so average == max here
        # (docs/WINDOW_AUDIT.md "Dispatch hints and skew safety")
        segmented=W.use_segmented(
            parquet_rows(f"{sf_dir}/documents.parquet") // 8
        ),
    )


_REBALANCE_SQL = """
WITH counts AS (SELECT lang, COUNT(*) AS n_group FROM documents GROUP BY lang),
cap AS (SELECT MIN(n_group) AS cap FROM counts),
flags AS (
  SELECT d.lang,
         CASE WHEN c.n_group <= cap.cap THEN TRUE
              ELSE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                   < printf('%08x',
                            CAST(floor(CAST(cap.cap AS DOUBLE) / c.n_group
                                       * 4294967296.0) AS BIGINT))
         END AS kept
  FROM documents d JOIN counts c USING (lang) CROSS JOIN cap
)
SELECT lang, COUNT(*) AS n_before,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_after
FROM flags
GROUP BY lang
"""


@register("corpus_rebalance", _REBALANCE_SQL)
def q_corpus_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix rebalancing report: every language downsampled
    toward the smallest one's count (the corpus is en-heavy) via the
    deterministic md5-threshold keep flag. Counts broadcast back onto
    the corpus, so the flagging pass itself is map-side — the shape that
    rebalances a 100 TB crawl without shuffling it."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        rebalance_keep_flag,
    )

    flagged = rebalance_keep_flag(_docs(spark, sf_dir), group_col="lang")
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_after"),
    )


_SIMHASH_SQL = (
    "WITH votes AS (\n"
    "  SELECT doc_id,\n"
    + ",\n".join(
        f"    SUM(CASE WHEN substr(md5(t), {b + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v{b}"
        for b in range(16)
    )
    + "\n  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)\n"
    "  GROUP BY doc_id\n"
    ")\n"
    # NULL-text docs keep their row with a NULL fingerprint (0 is a
    # valid fingerprint class) - LEFT JOIN from documents + text guard,
    # matching the Spark operator's NULL-preserving semantics
    "SELECT d.doc_id,\n  CASE WHEN d.text IS NULL THEN NULL ELSE "
    + " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    + " END AS simhash16\nFROM documents d LEFT JOIN votes USING (doc_id)"
)


@register("dedup_simhash", _SIMHASH_SQL)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints (per-bit majority over token md5 bits);
    bucketing on the fingerprint gives Hamming-near candidates."""
    from market_microstructure_toolkit_spark.operators.dedup import simhash16

    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", simhash16("text").alias("simhash16"))


def _lang_hits_sql(lang: str, markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return (
        f"len(list_filter(string_split(text, ' '), "
        f"t -> list_contains([{lst}], t))) AS h_{lang}"
    )


def _lang_id_sql() -> str:
    from market_microstructure_toolkit_spark.operators.text_analysis import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    hits = ",\n  ".join(_lang_hits_sql(g, LANG_MARKERS[g]) for g in langs)
    m = "GREATEST(" + ", ".join(f"h_{g}" for g in langs) + ")"
    pred = "CASE WHEN " + m + " < 1 THEN 'und' " + " ".join(
        f"WHEN h_{g} = {m} THEN '{g}'" for g in langs
    ) + " END"
    return (
        f"WITH hits AS (\n  SELECT doc_id, lang,\n  {hits}\n  FROM documents\n)\n"
        f"SELECT doc_id, lang AS labeled_lang, {pred} AS predicted_lang FROM hits"
    )


@register("doc_lang_id", _lang_id_sql())
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (marker-lexicon argmax, alphabetical
    tie-break) next to the corpus's labeled lang."""
    from market_microstructure_toolkit_spark.operators.text_analysis import lang_id_expr

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id_expr("text").alias("predicted_lang"),
    )


_QUALITY_SQL = """
WITH feat AS (
  SELECT doc_id,
    len(string_split(text, ' ')) AS n_tok,
    length(text) AS n_chars,
    length(regexp_replace(text, ' ', '', 'g')) AS nonspace,
    length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
    length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
    len(list_filter(string_split(text, ' '),
        t -> list_contains(['the','a','an','and','or','of','to','in','is','it',
                            'that','for','on','with','as','was','at','by','be'],
                           lower(t)))) AS sw_hits
  FROM documents
)
SELECT doc_id,
  CAST(n_tok AS BIGINT) AS n_tokens,
  CASE WHEN n_tok > 0 THEN CAST(nonspace AS DOUBLE) / n_tok END AS avg_token_len,
  CASE WHEN n_chars > 0 THEN CAST(alpha AS DOUBLE) / n_chars END AS alpha_ratio,
  CASE WHEN n_chars > 0 THEN CAST(digits AS DOUBLE) / n_chars END AS digit_ratio,
  CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars END AS punct_ratio,
  CASE WHEN n_tok > 0 THEN CAST(sw_hits AS DOUBLE) / n_tok END AS stopword_ratio,
  LEAST(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
    + COALESCE(CASE WHEN n_chars > 0 THEN CAST(alpha AS DOUBLE) / n_chars END, 0.0) * 0.4
    + (1.0 - LEAST(COALESCE(CASE WHEN n_chars > 0 THEN CAST(digits AS DOUBLE) / n_chars END, 0.0) * 5, 1.0)) * 0.1
    + (1.0 - LEAST(COALESCE(CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars END, 0.0) * 10, 1.0)) * 0.1
    AS quality_score
FROM feat
"""


@register("doc_quality", _QUALITY_SQL)
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal bundle + composite score (pure per-row string/ratio
    expressions; engine-exact)."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        quality_features,
    )

    docs = _docs(spark, sf_dir)
    return quality_features(docs).select(
        "doc_id", "n_tokens", "avg_token_len", "alpha_ratio",
        "digit_ratio", "punct_ratio", "stopword_ratio", "quality_score",
    )


_SOURCE_CAP_SQL = """
WITH feat AS (
  SELECT doc_id, source,
    len(string_split(text, ' ')) AS n_tok,
    length(text) AS n_chars,
    length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
    length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
    length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct
  FROM documents
),
scored AS (
  SELECT doc_id, source,
    LEAST(CAST(n_tok AS DOUBLE) / 20.0, 1.0) * 0.4
    + COALESCE(CASE WHEN n_chars > 0 THEN CAST(alpha AS DOUBLE) / n_chars END, 0.0) * 0.4
    + (1.0 - LEAST(COALESCE(CASE WHEN n_chars > 0 THEN CAST(digits AS DOUBLE) / n_chars END, 0.0) * 5, 1.0)) * 0.1
    + (1.0 - LEAST(COALESCE(CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars END, 0.0) * 10, 1.0)) * 0.1
    AS quality_score
  FROM feat
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY quality_score DESC, doc_id
  ) AS rk
  FROM scored
)
SELECT doc_id, source, quality_score, CAST(rk AS INTEGER) AS source_rank
FROM ranked WHERE rk <= 40
"""


@register("source_cap_sample", _SOURCE_CAP_SQL)
def q_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (domain) cap: keep each source's top-40 docs by quality
    score — the standard crawl-mix guard against one domain dominating a
    training corpus. One window keyed on source (shuffle spreads over
    domains, which number in the millions at crawl scale); the rank
    orders on the engine-exact per-row score with doc_id tiebreak, so no
    rounding is needed for cross-engine determinism."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        quality_features,
    )

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    return (
        quality_features(docs)
        .withColumn("source_rank", F.row_number().over(w))
        .filter(F.col("source_rank") <= 40)
        .select("doc_id", "source", "quality_score", "source_rank")
    )


_FINGERPRINT_SQL = """
SELECT fp AS fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc_id
FROM (
  SELECT doc_id,
         md5(substring(regexp_replace(lower(text), '\\s+', ' ', 'g'), 1, 64)) AS fp
  FROM documents
)
GROUP BY fp
"""


@register("doc_fingerprint", _FINGERPRINT_SQL)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-prefix fingerprint groups (near-exact-dup keying that
    survives trailing edits)."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        fingerprint_expr,
    )

    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", fingerprint_expr("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


_FRAME_SAMPLE_SQL = """
SELECT doc_id AS asset_id,
       unnest(range(0, doc_id % 10000 + 1000, 1000)) AS sample_ts_ms
FROM documents
WHERE doc_id % 3 = 2
"""


@register("multimodal_frame_sample", _FRAME_SAMPLE_SQL)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: sequence+explode fan-out of sample
    timestamps per video asset (decode itself is the stubbed Pandas-UDF
    stage, exercised rows-only in multimodal_features)."""
    from market_microstructure_toolkit_spark.operators.multimodal import (
        frame_sample_plan,
        synthetic_assets,
    )

    docs = _docs(spark, sf_dir)
    assets = synthetic_assets(spark, docs)
    return frame_sample_plan(assets, every_ms=1000)


_MM_FEATURES_SQL = """
WITH assets AS (
  SELECT doc_id AS asset_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS modality,
         COALESCE(octet_length(encode(text)), 0) AS n_bytes,
         CASE WHEN octet_length(encode(text)) > 0
              THEN encode(text)::BIT END AS bv
  FROM documents
),
bytes AS (
  -- TRUE utf-8 byte stream via the BIT cast (the raw corpus is ASCII,
  -- but the F7 unicode plant adds multibyte/astral docs — codepoint
  -- enumeration would diverge from the Spark side's encode() payload);
  -- b % 8 needs only each byte's low 3 bits
  SELECT asset_id,
         get_bit(bv, (8*(i-1)+5)::INT)*4 + get_bit(bv, (8*(i-1)+6)::INT)*2
           + get_bit(bv, (8*(i-1)+7)::INT) AS b
  FROM assets, unnest(range(1, n_bytes + 1)) AS u(i)
),
hist AS (
  SELECT asset_id, b AS feature_idx, COUNT(*) AS cnt
  FROM bytes GROUP BY asset_id, b
)
SELECT a.asset_id, a.modality, a.n_bytes,
       idx.feature_idx,
       COALESCE(h.cnt, 0) / CAST(GREATEST(a.n_bytes, 1) AS DOUBLE) AS value
FROM assets a
CROSS JOIN (SELECT unnest(range(0, 8)) AS feature_idx) idx
LEFT JOIN hist h ON h.asset_id = a.asset_id AND h.feature_idx = idx.feature_idx
"""


@register("multimodal_features", _MM_FEATURES_SQL)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (decode stubbed as a deterministic byte histogram — no media libs in
    the container). Output is EXPLODED to (asset_id, feature_idx, value)
    scalars: array cells are not canonicalizable by the gate's
    pandas-based comparator, and the long shape gives the oracle an exact
    SQL formulation (byte histogram of the utf-8 payload)."""
    from market_microstructure_toolkit_spark.operators.multimodal import (
        extract_features,
        synthetic_assets,
    )

    docs = _docs(spark, sf_dir)
    feats = extract_features(synthetic_assets(spark, docs))
    return feats.select(
        "asset_id", "modality", "n_bytes",
        F.posexplode("features").alias("feature_idx", "value"),
    ).withColumn("feature_idx", F.col("feature_idx").cast("long"))


_TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
  len(string_split(text, ' ')) AS n_tokens_ws,
  len(list_filter(
        regexp_split_to_array(
          regexp_replace(text, '([0-9]+|[^a-zA-Z0-9 ])', ' \1 ', 'g'),
          '\s+'),
        p -> p != '')) AS n_tokens_bpe_ish
FROM documents
"""


@register("doc_token_counts", _TOKEN_COUNTS_SQL)
def q_doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and the BPE-ish regex
    segmentation (digits runs and punctuation isolated as pieces) — pure
    JVM string expressions, shuffle-free."""
    from market_microstructure_toolkit_spark.operators.dedup import tokens
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        token_count_bpe_ish,
    )

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tokens_ws"),
        token_count_bpe_ish("text").cast("long").alias("n_tokens_bpe_ish"),
    )


_BANDED_PAIR_CTES = (
    lsh_keyed_sql()
    + """,
capped AS ("""
    + """
  SELECT vec_id, v, band, bucket FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn FROM keyed
  ) WHERE bn <= 1000
),
bandpairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(b.v, b.v))) AS cos
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT id_a, id_b, MIN(cos) AS cos_sim FROM bandpairs GROUP BY id_a, id_b
)"""
)


_EMB_NN_SQL = (
    "WITH "
    + _BANDED_PAIR_CTES
    + """,
mirrored AS (
  SELECT id_a AS vec_id, id_b AS nn_id, ROUND(cos_sim, 6) AS cos_sim
  FROM pairs
  UNION ALL
  SELECT id_b AS vec_id, id_a AS nn_id, ROUND(cos_sim, 6) AS cos_sim
  FROM pairs
)
SELECT vec_id, nn_id, cos_sim FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY cos_sim DESC, nn_id) AS rn
  FROM mirrored
) WHERE rn = 1
"""
)


@register("dedup_embedding_nn", _EMB_NN_SQL)
def q_dedup_embedding_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup primitive: each vector's single nearest
    LSH-candidate neighbor (candidate canonical pairing). Candidates come
    from the guarded banded generator (4 bands x auto-width bits — the
    bucket count grows with the corpus so occupancy stays ~100, hot
    buckets capped) — the only pair path in the repo; the final
    per-key window rank keeps state at one row per vector, shuffle keyed
    on vec_id."""
    from market_microstructure_toolkit_spark.operators.similarity import (
        lsh_banded_pairs,
    )

    emb = _emb(spark, sf_dir)
    pairs = lsh_banded_pairs(
        emb,
        bits_per_band="auto",
        n_bands=4,
        min_cosine=-2.0,
        max_bucket=1000,
        # footer rowcount hint: kills the auto-width count job (r13)
        n_rows=parquet_rows(f"{sf_dir}/embeddings.parquet"),
    )
    # both directions from ONE evaluation of the bucket self-join — a
    # union of two selects over `pairs` would run the join twice
    sim = F.round("cos_sim", 6)
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("vec_id"),
                    F.col("id_b").alias("nn_id"),
                    sim.alias("cos_sim"),
                ),
                F.struct(
                    F.col("id_b").alias("vec_id"),
                    F.col("id_a").alias("nn_id"),
                    sim.alias("cos_sim"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("nn_id")
    )
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "nn_id", "cos_sim")
    )


_DEDUP_APPLY_SQL = """
WITH hashed AS (
  SELECT doc_id, lang, md5(text) AS h FROM documents
),
canon AS (
  SELECT h, MIN(doc_id) AS keep_id FROM hashed GROUP BY h
)
SELECT d.doc_id, d.lang
FROM hashed d JOIN canon c ON d.h = c.h AND d.doc_id = c.keep_id
"""


@register("documents_dedup_apply", _DEDUP_APPLY_SQL)
def q_documents_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end exact dedup APPLICATION: keep only each content group's
    canonical (min doc_id) row — hash, min-by-group, semi-join back. At
    scale this is one shuffle on the content hash; the join back is on
    the same key so it reuses the exchange."""
    docs = _docs(spark, sf_dir)
    hashed = docs.select("doc_id", "lang", F.md5("text").alias("h"))
    # rename the grouped side's key: `hashed.h == canon.h` resolves both
    # legs to the SAME attribute in a self-derived join, collapses to
    # TRUE, and silently re-keys the join on keep_id alone (losing the
    # h-exchange reuse this plan is built around)
    canon = (
        hashed.groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"))
        .withColumnRenamed("h", "canon_h")
    )
    return (
        hashed.join(
            canon,
            (F.col("h") == F.col("canon_h"))
            & (F.col("doc_id") == F.col("keep_id")),
        )
        .select("doc_id", "lang")
    )


_VOCAB_SQL = """
SELECT t AS token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
)
WHERE t != ''
GROUP BY t
ORDER BY freq DESC, token
LIMIT 100
"""


@register("corpus_vocab_top100", _VOCAB_SQL)
def q_corpus_vocab_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by frequency with document
    frequency (the vocab/stopword-discovery pass of a training-data
    pipeline). explode -> two-phase count aggregate (map-side combine) ->
    distributed top-k; integer counts make cross-engine order exact."""
    from market_microstructure_toolkit_spark.operators.dedup import tokens

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.count_distinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("freq").desc(), "token")
        .limit(100)
    )


_MM_RESIZE_SQL = """
SELECT doc_id AS asset_id,
       'application/octet-stream' AS mime,
       -- COALESCE, not raw octet_length: NULL-text assets (F7 plant)
       -- resize to an EMPTY payload on the Spark side, and DuckDB's
       -- NULL-ignoring LEAST/GREATEST would otherwise turn the NULL
       -- length into 1
       LEAST(COALESCE(octet_length(encode(text)), 0),
             GREATEST(1, COALESCE(octet_length(encode(text)), 0) * 50176
                         // GREATEST(1, (doc_id % 640 + 1) * (doc_id % 480 + 1))))
         AS n_bytes,
       CAST(224 AS BIGINT) AS width,
       CAST(224 AS BIGINT) AS height
FROM documents
WHERE doc_id % 3 = 0
"""


@register("multimodal_resize", _MM_RESIZE_SQL)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize stage over binary payloads (stubbed pixel transform —
    no codec in the env; Spark-side filter/schema/Arrow-batch plumbing is
    real and unit-tested). The gate output carries length(payload) instead
    of the raw binary so the deterministic stub (area-ratio truncation,
    50176 = 224*224) is exactly SQL-oracle-able."""
    from market_microstructure_toolkit_spark.operators.multimodal import (
        resize_images,
        synthetic_assets,
    )

    docs = _docs(spark, sf_dir)
    resized = resize_images(synthetic_assets(spark, docs), 224, 224)
    return resized.select(
        "asset_id", "mime",
        F.length("payload").cast("long").alias("n_bytes"),
        "width", "height",
    )


_WINNOW_SQL = """
WITH hashes AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - 7, 0) + 1),
                        i -> substring(md5(substring(text, i, 8)), 1, 12)) AS hs
  FROM documents
),
fps AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_transform(range(1, greatest(len(hs) - 5, 0) + 1),
                          i -> list_aggregate(hs[i:i+5], 'min')))) AS fp
  FROM hashes
  WHERE len(hs) >= 6
),
rare AS (
  -- corpus-relative guard (round-9 decade fix): a fixed cap saturates
  -- when duplication multiplicity scales with the corpus
  SELECT fp FROM fps GROUP BY fp
  HAVING COUNT(*) <= (SELECT GREATEST(10, COUNT(*) // 5000) FROM documents)
),
kept AS (
  SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON f.fp = r.fp
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 2
"""


@register("dedup_winnow", _WINNOW_SQL)
def q_dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprint dedup: char-8-gram md5 ->
    window-of-6 minima -> distinct fingerprints -> inverted-index
    self-join, pairs sharing >= 2 rare fingerprints (doc-freq <=
    max(10, n_docs // 5000), the corpus-RELATIVE hot-key guard — a fixed
    cap saturates when duplication multiplicity scales with the corpus;
    boilerplate fingerprints are dropped pre-join). Any shared substring
    of >= 13 chars guarantees a shared fingerprint (MOSS bound k+w-1)."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        auto_doc_freq_cap,
        winnow_candidates,
    )

    docs = _docs(spark, sf_dir)
    return winnow_candidates(
        docs,
        k=8,
        w=6,
        min_shared=2,
        # footer-rowcount "auto" (row-preserving plants): same cap, no
        # per-invocation Spark count job (round 13)
        max_doc_freq=auto_doc_freq_cap(
            parquet_rows(f"{sf_dir}/documents.parquet")
        ),
    )


_LEN_QUANTILES_SQL = """
WITH l AS (SELECT length(text) AS len FROM documents WHERE text IS NOT NULL),
o AS (SELECT len, ROW_NUMBER() OVER (ORDER BY len) AS rn FROM l),
n AS (SELECT COUNT(*) AS c FROM l)
SELECT MAX(CASE WHEN rn = CAST(ceil(0.50 * c) AS BIGINT) THEN len END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(0.90 * c) AS BIGINT) THEN len END) AS p90,
       MAX(CASE WHEN rn = CAST(ceil(0.99 * c) AS BIGINT) THEN len END) AS p99,
       MAX(CASE WHEN rn = c THEN len END) AS p100
FROM o, n
"""


@register("doc_length_quantiles", _LEN_QUANTILES_SQL)
def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles (order statistics, rank = ceil(q*n)) of
    document length — integer answers, engine-exact, unlike interpolated
    percentile_cont whose float formula differs across engines.

    Scale shape: NO global row sort and no global window. Pass 1
    compresses the corpus to a value histogram (groupBy(len) — a
    distributed shuffle keyed on the value, map-side combined); pass 2
    collapses the DISTINCT lengths — a domain bounded by max document
    length (thousands of entries at any corpus size) — into ONE sorted
    array row and walks it with a single JVM-side fold that carries the
    running count and latches each order statistic as its rank
    threshold is crossed. The smallest len whose cumulative count
    reaches ceil(q*n) is the exact rank-ceil(q*n) order statistic."""
    docs = _docs(spark, sf_dir)
    # quantiles are defined over docs WITH text: a NULL length has no
    # rank (DuckDB would sort it last and poison p100 — F7 plant)
    hist = (
        docs.filter(F.col("text").isNotNull())
        .select(F.length("text").alias("len"))
        .groupBy("len")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    one = hist.agg(
        F.sort_array(F.collect_list(F.struct("len", "cnt"))).alias("h"),
        F.sum("cnt").alias("c"),
    )
    # One pass over the tiny histogram array: accumulator carries the
    # running count and the latched quantiles. Exploding the 1-element
    # result array is the Generate barrier that stops the fold from being
    # re-evaluated once per extracted field.
    folded = one.select(
        F.col("c"),
        F.explode(
            F.array(
                F.aggregate(
                    "h",
                    F.struct(
                        F.lit(0).cast("long").alias("cum"),
                        F.lit(None).cast("long").alias("p50"),
                        F.lit(None).cast("long").alias("p90"),
                        F.lit(None).cast("long").alias("p99"),
                    ),
                    lambda acc, x: F.struct(
                        (acc["cum"] + x["cnt"]).alias("cum"),
                        F.coalesce(
                            acc["p50"],
                            F.when(
                                acc["cum"] + x["cnt"]
                                >= F.ceil(F.lit(0.50) * F.col("c")).cast("long"),
                                x["len"].cast("long"),
                            ),
                        ).alias("p50"),
                        F.coalesce(
                            acc["p90"],
                            F.when(
                                acc["cum"] + x["cnt"]
                                >= F.ceil(F.lit(0.90) * F.col("c")).cast("long"),
                                x["len"].cast("long"),
                            ),
                        ).alias("p90"),
                        F.coalesce(
                            acc["p99"],
                            F.when(
                                acc["cum"] + x["cnt"]
                                >= F.ceil(F.lit(0.99) * F.col("c")).cast("long"),
                                x["len"].cast("long"),
                            ),
                        ).alias("p99"),
                    ),
                )
            )
        ).alias("q"),
        F.element_at("h", -1)["len"].cast("long").alias("p100"),
    )
    return folded.select(
        F.col("q")["p50"].alias("p50"),
        F.col("q")["p90"].alias("p90"),
        F.col("q")["p99"].alias("p99"),
        "p100",
    )


_REPETITION_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g2 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)),
                        i -> w[i] || ' ' || w[i+1])) AS g
  FROM w WHERE len(w) >= 2
),
t2 AS (
  SELECT doc_id, MAX(c) AS top2_cnt, CAST(SUM(c) AS BIGINT) AS n2
  FROM (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g)
  GROUP BY doc_id
),
f5 AS (
  SELECT doc_id, len(gs) AS n5, len(list_distinct(gs)) AS n5_distinct
  FROM (SELECT doc_id,
               list_transform(range(1, len(w) - 3),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) AS gs
        FROM w WHERE len(w) >= 5)
)
SELECT f5.doc_id,
       n2,
       CAST(top2_cnt AS BIGINT) AS top2_cnt,
       top2_cnt / CAST(n2 AS DOUBLE) AS top2_frac,
       CAST(n5 AS BIGINT) AS n5,
       (n5 - n5_distinct) / CAST(n5 AS DOUBLE) AS dup5_frac
FROM f5 JOIN t2 USING (doc_id)
"""


@register("doc_repetition", _REPETITION_SQL)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: most-frequent
    2-gram share and duplicate-5-gram fraction (the filters large-corpus
    curation applies before training). Shuffles key on (doc, gram) —
    corpus-hot n-grams cannot skew a partition."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        repetition_stats,
    )

    return repetition_stats(_docs(spark, sf_dir))


_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
FROM ranked WHERE rank <= 3
"""


@register("doc_tfidf_top_terms", _TFIDF_SQL)
def q_doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF keywords — the tagging/routing pass of a
    curation pipeline. tf x df equi-join on term after per-key combine;
    top-k via a doc-keyed rank window (never a global sort)."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        tfidf_top_terms,
    )

    return tfidf_top_terms(_docs(spark, sf_dir), top_k=3)


_UNIGRAM_LP_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
vocab AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
total AS (SELECT COUNT(*) AS total FROM toks)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(AVG(floor(ln(CAST(cnt AS DOUBLE) / total) * 67108864.0 + 0.5) / 67108864.0), 6) AS avg_logprob
FROM toks JOIN vocab USING (term) CROSS JOIN total
GROUP BY doc_id
"""


@register("doc_unigram_logprob", _UNIGRAM_LP_SQL)
def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    unigram model — the cheap stand-in for the KenLM-perplexity quality
    filter (low score = unusual token mix = candidate junk). One explode
    feeds both the vocabulary aggregate and the doc-keyed average."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        unigram_logprob,
    )

    return unigram_logprob(_docs(spark, sf_dir))


_NOVELTY_SQL = """
WITH grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
),
first AS (
  SELECT doc_id, g, MIN(doc_id) OVER (PARTITION BY g) AS first_doc
  FROM grams
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS novelty
FROM first
GROUP BY doc_id
"""


@register("doc_ngram_novelty", _NOVELTY_SQL)
def q_doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each document's distinct 3-gram shingles first seen in
    THIS document (minimum owning doc id) — a curation-ordering signal
    separating new text from restated boilerplate. First-owner via a
    min-window on the shingle; exact-integer ratio, engine-exact."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        ngram_novelty,
    )

    return ngram_novelty(_docs(spark, sf_dir), n=3)


_CHUNKING_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
),
c AS (
  SELECT doc_id, w,
    CASE WHEN n <= 64 THEN 1
         ELSE CAST(FLOOR((n - 64 + 47) / 48.0) AS BIGINT) + 1 END AS n_chunks
  FROM t
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(w[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ')
         AS chunk_text
FROM (SELECT doc_id, w, unnest(range(0, n_chunks)) AS chunk_idx FROM c)
"""


@register("doc_chunking", _CHUNKING_SQL)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token windows, 16-token overlap) — the
    retrieval/context preprocessing pass. Map-only per-row array
    expressions behind one Generate; no shuffle at any corpus size."""
    from market_microstructure_toolkit_spark.operators.packing import (
        chunk_documents,
    )

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=64, overlap=16)


_SPLIT_SQL = """
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM (
  SELECT doc_id, n_chars,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 31, 2) < 'f8' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 31, 2) < 'fc' THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
GROUP BY split
"""


@register("corpus_split", _SPLIT_SQL)
def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-mod train/val/test assignment (248/4/4 of 256
    md5 buckets) summarized per split. Membership is a pure map over the
    id — re-runnable, join-free, stable under corpus growth — which is
    the property that matters when the corpus is 100 TB and the split
    must never move a document between runs."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        split_expr,
    )

    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", "n_chars", split_expr().alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


_SOURCE_MIX_SQL = """
WITH g AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source, lang
), t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM documents)
SELECT source, lang, n_docs, total_chars,
       total_chars / CAST(n_docs AS DOUBLE) AS avg_chars,
       n_docs / total AS corpus_share
FROM g, t
"""


@register("source_mix_report", _SOURCE_MIX_SQL)
def q_source_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report per (source, lang): doc counts, char
    volume, and share of corpus — the mix dashboard a data-curation run
    ends with. One hash aggregate plus a 1-row broadcast for the total;
    every derived ratio is a single integer-to-double division (exact on
    both engines, no rounding needed)."""
    docs = _docs(spark, sf_dir)
    g = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    t = docs.agg(F.count(F.lit(1)).cast("double").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        (F.col("total_chars") / F.col("n_docs").cast("double")).alias("avg_chars"),
        (F.col("n_docs") / F.col("total")).alias("corpus_share"),
    )


def _minlabel_rounds_sql(n_rounds: int) -> str:
    """Unrolled min-label propagation WITH pointer doubling — the
    oracle twin of ``operators.dedup.dedup_clusters``: each round every
    node takes LEAST(own label, min neighbor label, label-of-label).
    Each round is ONE linear edges join + one node-sized self join, so
    the oracle stays tractable on a giant component, where the previous
    recursive transitive closure (every (node, reachable-label) pair —
    quadratic in component size) ground to a halt on the sf1 sweep.
    Doubling converges in ~log2(diameter) rounds; ``n_rounds`` covers
    diameter up to 2^n_rounds, and a non-converged unroll cannot pass
    the gate silently (Spark iterates to the EXACT fixpoint, so the
    hashes would differ)."""
    ctes = ["it0 AS MATERIALIZED (SELECT id, id AS lab FROM nodes)"]
    for k in range(n_rounds):
        ctes.append(f"""it{k + 1} AS MATERIALIZED (
  SELECT n.id,
         LEAST(n.lab, COALESCE(nb.mlab, n.lab), COALESCE(ll.lab, n.lab))
           AS lab
  FROM it{k} n
  LEFT JOIN (SELECT e.dst AS id, MIN(x.lab) AS mlab
             FROM edges e JOIN it{k} x ON x.id = e.src
             GROUP BY e.dst) nb ON nb.id = n.id
  LEFT JOIN it{k} ll ON ll.id = n.lab
)""")
    return ",\n".join(ctes)


_CLUSTERS_SQL = ("""
WITH pairs AS (
  SELECT id_a, id_b FROM (""" + _MINHASH_SQL + """) mh
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
"""
    + _minlabel_rounds_sql(12)
    + """
SELECT id AS doc_id, lab AS cluster_id FROM it12
""")


@register("dedup_clusters", _CLUSTERS_SQL)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH candidate-pair graph:
    cluster_id = min doc id reachable through near-dup pairs (singletons
    keep their own id) — the keep/drop resolution step downstream of any
    pairwise dedup. Spark side is bounded min-label propagation with
    lineage checkpoints; the unique fixpoint makes it hash-comparable to
    the oracle's recursive CTE."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_candidates,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_candidates(docs, k=8, rows_per_band=2, shingle_n=3)
    return dedup_clusters(docs, pairs)


_CURATION_SQL = """
WITH q AS (""" + _QUALITY_SQL + """),
kept_docs AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN q ON d.doc_id = q.doc_id
  WHERE q.quality_score >= 0.5
),
pairs AS (
  SELECT id_a, id_b FROM (""" + _MINHASH_SQL.replace(
    "FROM documents", "FROM kept_docs"
) + """) mh
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS MATERIALIZED (SELECT doc_id AS id FROM kept_docs),
""" + _minlabel_rounds_sql(12) + """,
canon AS (
  SELECT id AS doc_id FROM it12 WHERE id = lab
)
SELECT (SELECT COUNT(*) FROM kept_docs) AS n_quality_kept,
       (SELECT COUNT(*) FROM canon) AS n_canonical,
       (SELECT CAST(SUM(CAST(len(string_split(k.text, ' ')) AS BIGINT))
                    AS BIGINT)
        FROM kept_docs k JOIN canon c ON k.doc_id = c.doc_id) AS total_tokens
"""


@register("corpus_curation", _CURATION_SQL)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation, the pipeline a training-data run
    actually executes: quality-score filter (>= 0.5) -> MinHash-LSH
    near-dup graph over the survivors -> connected-component resolution
    keeping each cluster's min-id canonical -> corpus stats (docs kept,
    canonical docs, total whitespace tokens). All-integer outputs keep
    the three-stage composition hash-exact against the oracle."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_candidates,
    )
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        quality_features,
    )

    docs = _docs(spark, sf_dir)
    keep = quality_features(docs).filter(F.col("quality_score") >= 0.5).select("doc_id")
    # `kept` feeds four consumers (LSH candidates, cluster vertices, the
    # kept-count agg, the token-sum join); without a checkpoint each one
    # re-runs the scan + quality scoring — materialize it once.
    kept = docs.join(keep, "doc_id").select("doc_id", "text").localCheckpoint()
    pairs = minhash_lsh_candidates(kept, k=8, rows_per_band=2, shingle_n=3)
    # canon feeds TWO consumers (the count agg and the token-sum join);
    # since round 13 dedup_clusters returns a LAZY singleton-rejoin
    # frame, each consumer would re-run that join — one localCheckpoint
    # of the id-only canonical set (tiny) truncates it (guide §1.2)
    canon = (
        dedup_clusters(kept, pairs)
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id")
        .localCheckpoint()
    )
    tok = F.size(F.split(F.col("text"), " ", -1)).cast("long")
    return (
        kept.agg(F.count(F.lit(1)).alias("n_quality_kept"))
        .crossJoin(canon.agg(F.count(F.lit(1)).alias("n_canonical")))
        .crossJoin(
            kept.join(canon, "doc_id")
            .agg(F.sum(tok).alias("total_tokens"))
        )
    )




_SEMANTIC_CLUSTERS_SQL = (
    "WITH "
    + _BANDED_PAIR_CTES
    + """,
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs WHERE ROUND(cos_sim, 6) >= 0.25
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs WHERE ROUND(cos_sim, 6) >= 0.25
),
nodes AS MATERIALIZED (SELECT vec_id AS id FROM embeddings),
"""
    + _minlabel_rounds_sql(12)
    + """
SELECT id AS vec_id, lab AS cluster_id FROM it12
"""
)


@register("dedup_semantic_clusters", _SEMANTIC_CLUSTERS_SQL)
def q_dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup in embedding space: banded sign-LSH
    candidate pairs (guarded generator — 4 bands x auto-width bits, hot
    buckets capped) scored by exact cosine, thresholded (>= 0.25 on the
    6-dp-rounded value so the edge set is engine-exact), then resolved
    into connected components — cluster_id = min reachable vec_id; keep
    one representative per cluster to drop semantic near-duplicates.
    Same min-label propagation as document clustering, keyed on vectors."""
    from market_microstructure_toolkit_spark.operators.dedup import dedup_clusters
    from market_microstructure_toolkit_spark.operators.similarity import (
        lsh_banded_pairs,
    )

    emb = _emb(spark, sf_dir)
    pairs = (
        lsh_banded_pairs(
            emb,
            bits_per_band="auto",
            n_bands=4,
            min_cosine=-2.0,
            max_bucket=1000,
            # footer rowcount hint: kills the auto-width count job (r13)
            n_rows=parquet_rows(f"{sf_dir}/embeddings.parquet"),
        )
        .filter(F.round("cos_sim", 6) >= 0.25)
        .select("id_a", "id_b")
    )
    return dedup_clusters(emb.select("vec_id"), pairs, id_col="vec_id")


@register(
    "documents_jsonl_roundtrip",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_documents_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink -> source end-to-end for the documents corpus (the
    training-data interchange format): write the table as JSON-lines,
    read it back under the PINNED explicit schema (no inference scan —
    at 100 TB schema inference is a full extra pass), return the
    round-tripped frame. The schema is strings + 64-bit ints, so JSONL
    is lossless (embedded newlines/quotes escape per JSON) and the
    oracle is the table itself — any drop, mangle, or type drift breaks
    the hash."""
    from market_microstructure_toolkit_spark.sources.docs_io import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    docs = plant_docs(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    path = _scratch(prefix="mmt_jsonl_rt_")
    write_documents_jsonl(docs, path)
    return read_documents_jsonl(spark, path).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@register("documents_cdc_apply", _CDC_SQL)
def q_documents_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus merge (operators/cdc.apply_cdc): a derived
    change batch — revisions for doc_id%7, deletes for doc_id%13,
    backfilled inserts for doc_id%11 — applied onto the documents
    snapshot with latest-version-wins semantics (the Delta MERGE INTO /
    Hudi compaction shape on bare parquet). One union + one keyed
    window, no join; the oracle replays the same merge relationally in
    DuckDB, so the hash pins upsert, delete, insert, AND the
    delete-beats-upsert tie rule at once."""
    from market_microstructure_toolkit_spark.operators.cdc import apply_cdc

    docs = plant_docs(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    did = F.col("doc_id")
    upd = docs.filter((did % 7 == 0) & (did % 13 != 0)).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" [rev2]")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + 7).alias("n_chars"),
        F.lit("U").alias("op"),
    )
    dels = docs.filter(did % 13 == 0).withColumn("op", F.lit("D"))
    ins = docs.filter(did % 11 == 0).select(
        (did + 10_000_000).alias("doc_id"),
        "text",
        "lang",
        F.lit("cdc_backfill").alias("source"),
        "n_chars",
        F.lit("U").alias("op"),
    )
    changes = upd.unionByName(dels).unionByName(ins)
    return apply_cdc(docs, changes, "doc_id")


@register(
    "documents_compaction",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_documents_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (partitioning.compact_files): the corpus
    is first shattered into 64 tiny parquet files (the streaming-ingest
    pathology), then rewritten with the file count sized from actual
    input bytes at a 4 MiB target. The gate returns the compacted
    table's full content against the identity oracle — compaction must
    be byte-lossless — and the file-count reduction itself is pinned in
    pytest (an environment-dependent number that doesn't belong in a
    cross-engine hash)."""
    from market_microstructure_toolkit_spark.partitioning import compact_files

    docs = plant_docs(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    base = _scratch(prefix="mmt_compact_")
    src, dst = f"{base}/small", f"{base}/compacted"
    docs.repartition(64).write.mode("overwrite").parquet(src)
    compact_files(spark, src, dst, target_bytes=4 * 1024 * 1024)
    return spark.read.parquet(dst).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


_CHUNK_DEDUP_SQL = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
chunks AS (
  SELECT doc_id, u.i AS idx,
         array_to_string(ts[(u.i * 10 + 1):(u.i * 10 + 10)], ' ') AS chunk
  FROM tok, UNNEST(range(0, CAST(ceil(len(ts) / 10.0) AS BIGINT))) u(i)
),
keep AS (
  SELECT doc_id, idx, chunk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
    FROM chunks
  ) WHERE rn = 1
),
totals AS (SELECT doc_id, COUNT(*) AS n_chunks_total FROM chunks GROUP BY doc_id)
SELECT k.doc_id,
       COUNT(*) AS n_chunks_kept,
       t.n_chunks_total,
       array_to_string(list(k.chunk ORDER BY k.idx), ' ') AS text_clean
FROM keep k JOIN totals t USING (doc_id)
GROUP BY k.doc_id, t.n_chunks_total
"""


@register("documents_chunk_dedup", _CHUNK_DEDUP_SQL)
def q_documents_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus chunk-level dedup — the C4/RefinedWeb "remove
    duplicated lines across the corpus" pass, on 10-token chunks (the
    fixture has no newlines; a newline split is the same plan with a
    different delimiter): every chunk keeps only its FIRST occurrence
    corpus-wide (min (doc_id, idx)), and each document is reassembled
    from its surviving chunks in order. One shuffle keyed by chunk text
    (content-uniform keys — boilerplate chunks are exactly the hot keys
    the first-occurrence window prunes to one row each), then one
    doc-keyed regroup; documents whose every chunk was seen earlier
    drop out entirely. The oracle replays the pass relationally, so the
    hash pins the tie order AND the reassembly."""
    docs = _docs(spark, sf_dir)
    n10 = F.ceil(F.size(F.split(F.col("text"), " ", -1)) / F.lit(10.0))
    chunked = docs.select(
        "doc_id",
        F.split(F.col("text"), " ", -1).alias("ts"),
        F.explode(F.sequence(F.lit(0), (n10 - 1).cast("long"))).alias("idx"),
    ).select(
        "doc_id",
        "idx",
        F.array_join(
            F.expr("slice(ts, idx * 10 + 1, 10)"), " "
        ).alias("chunk"),
    )
    wk = Window.partitionBy("chunk").orderBy("doc_id", "idx")
    keep = (
        chunked.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == 1)
        .select("doc_id", "idx", "chunk")
    )
    totals = chunked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks_total")
    )
    rebuilt = keep.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("idx", "chunk"))
                ),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("text_clean"),
    )
    return rebuilt.join(totals, "doc_id").select(
        "doc_id", "n_chunks_kept", "n_chunks_total", "text_clean"
    )


_BPE_SQL = """
WITH words AS (
  SELECT w, COUNT(*) AS freq
  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) >= 2
  GROUP BY w
),
pairs AS (
  SELECT substr(w, u.i, 2) AS pair, freq
  FROM words, UNNEST(range(1, len(w))) u(i)
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT 20
"""


@register("bpe_pair_counts", _BPE_SQL)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training inner loop, distributed: corpus word
    frequencies (one hash aggregate — the vocabulary is tiny next to
    the corpus), then every adjacent character pair of every DISTINCT
    word weighted by its corpus frequency, reduced to the top-20 merge
    candidates. This is exactly the statistic each merge round of
    byte-pair-encoding tokenizer training recomputes; at 100 TB the
    crucial shape is counting pairs over the DEDUPLICATED vocabulary
    (|vocab| words) instead of the raw token stream (|corpus| tokens) —
    the aggregate does the compression before the expensive explode.
    Integer counts, TakeOrdered top-k: no float or window concerns."""
    docs = _docs(spark, sf_dir)
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ", -1)).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


_LEN_QUANTILES_SRC_SQL = """
WITH l AS (SELECT source, length(text) AS len FROM documents WHERE text IS NOT NULL),
o AS (SELECT source, len,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY len) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS c
      FROM l)
SELECT source,
  MAX(CASE WHEN rn = CAST(ceil(0.50 * c) AS BIGINT) THEN len END) AS p50,
  MAX(CASE WHEN rn = CAST(ceil(0.90 * c) AS BIGINT) THEN len END) AS p90,
  MAX(CASE WHEN rn = CAST(ceil(0.99 * c) AS BIGINT) THEN len END) AS p99,
  MAX(CASE WHEN rn = c THEN len END) AS p100,
  MAX(c) AS n_docs
FROM o GROUP BY source
"""


@register("doc_length_quantiles_by_source", _LEN_QUANTILES_SRC_SQL)
def q_doc_length_quantiles_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact per-GROUP order statistics — doc_length_quantiles' sorted-
    domain fold generalized under a key, proving the no-global-sort
    shape survives grouping: pass 1 is a (source, len) histogram (one
    shuffle, map-side combined); pass 2 collapses each source's
    distinct-length domain into one sorted array row and walks it with
    the same rank-latching fold, now per group. The per-group state is
    bounded by the length domain (not the row count), so a source with
    a billion docs folds the same few-thousand-entry array as one with
    a million. The oracle uses the relational rank form per source;
    integer answers, engine-exact."""
    docs = _docs(spark, sf_dir)
    hist = (
        docs.filter(F.col("text").isNotNull())
        .select("source", F.length("text").alias("len"))
        .groupBy("source", "len")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    one = hist.groupBy("source").agg(
        F.sort_array(F.collect_list(F.struct("len", "cnt"))).alias("h"),
        F.sum("cnt").alias("c"),
    )
    folded = one.select(
        "source",
        F.col("c"),
        F.explode(
            F.array(
                F.aggregate(
                    "h",
                    F.struct(
                        F.lit(0).cast("long").alias("cum"),
                        F.lit(None).cast("long").alias("p50"),
                        F.lit(None).cast("long").alias("p90"),
                        F.lit(None).cast("long").alias("p99"),
                    ),
                    lambda acc, x: F.struct(
                        (acc["cum"] + x["cnt"]).alias("cum"),
                        F.coalesce(
                            acc["p50"],
                            F.when(
                                acc["cum"] + x["cnt"]
                                >= F.ceil(F.lit(0.50) * F.col("c")).cast("long"),
                                x["len"].cast("long"),
                            ),
                        ).alias("p50"),
                        F.coalesce(
                            acc["p90"],
                            F.when(
                                acc["cum"] + x["cnt"]
                                >= F.ceil(F.lit(0.90) * F.col("c")).cast("long"),
                                x["len"].cast("long"),
                            ),
                        ).alias("p90"),
                        F.coalesce(
                            acc["p99"],
                            F.when(
                                acc["cum"] + x["cnt"]
                                >= F.ceil(F.lit(0.99) * F.col("c")).cast("long"),
                                x["len"].cast("long"),
                            ),
                        ).alias("p99"),
                    ),
                )
            )
        ).alias("q"),
        F.element_at("h", -1)["len"].cast("long").alias("p100"),
    )
    return folded.select(
        "source",
        F.col("q")["p50"].alias("p50"),
        F.col("q")["p90"].alias("p90"),
        F.col("q")["p99"].alias("p99"),
        "p100",
        F.col("c").alias("n_docs"),
    )


_SCHEMA_EVO_SQL = """
WITH mid AS (
  SELECT CAST((MIN(doc_id) + MAX(doc_id)) // 2 AS BIGINT) AS m FROM documents
),
v1 AS (
  SELECT doc_id, lang, CAST(NULL AS DOUBLE) AS quality_score
  FROM documents, mid WHERE doc_id <= m
),
v2 AS (
  SELECT doc_id, lang, (n_chars % 1000) / 16.0 AS quality_score
  FROM documents, mid WHERE doc_id > m
),
u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(quality_score) AS n_with_quality,
       SUM(quality_score) AS sum_quality
FROM u GROUP BY lang
"""


@register("documents_schema_evolution", _SCHEMA_EVO_SQL)
def q_documents_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet generations: the corpus's older
    half is written with the v1 schema, the newer half with v2 (adds a
    quality_score double — the column a curation pass bolts on
    mid-corpus), and the lake is read back as ONE table via
    ``mergeSchema`` — v1 rows surface the new column as NULL, exactly
    the additive-column evolution contract Delta/Iceberg formalize and
    plain parquet already supports at read time. The rollup counts and
    sums the evolved column per language; the oracle builds the same
    union with an explicit NULL cast. quality_score is (n_chars %
    1000)/16 — an exact binary fraction, so the sums need no rounding.

    Scale shape: mergeSchema reconciles FOOTERS (schema metadata), not
    data; the scan stays one pass with column pruning intact on both
    generations."""
    docs = _docs(spark, sf_dir)
    # footer-stats range (plants never touch doc_id) — no Spark job (r13)
    lo, hi = _docs_id_range(spark, sf_dir)
    mid = (lo + hi) // 2
    base = _scratch(prefix="mmt_schemaevo_")
    docs.filter(F.col("doc_id") <= mid).select("doc_id", "lang").write.parquet(
        f"{base}/gen/v1"
    )
    docs.filter(F.col("doc_id") > mid).select(
        "doc_id",
        "lang",
        ((F.col("n_chars") % 1000) / F.lit(16.0)).alias("quality_score"),
    ).write.parquet(f"{base}/gen/v2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen/v1", f"{base}/gen/v2"
    )
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("quality_score").alias("n_with_quality"),
        F.sum("quality_score").alias("sum_quality"),
    )


_TDIFF_V2_SQL = """
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 89 = 0 THEN text || ' [rev2]' ELSE text END AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
         text, lang, source, n_chars
  FROM documents WHERE doc_id % 101 = 0
)
"""


_TABLE_DIFF_SQL = f"""
WITH {_TDIFF_V2_SQL}
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN b.doc_id IS NULL THEN 'only_v1'
            WHEN a.doc_id IS NULL THEN 'only_v2'
            ELSE 'changed' END AS status
FROM documents a FULL JOIN v2 b USING (doc_id)
WHERE a.doc_id IS NULL OR b.doc_id IS NULL
   OR a.text IS DISTINCT FROM b.text OR a.lang IS DISTINCT FROM b.lang
   OR a.source IS DISTINCT FROM b.source
   OR a.n_chars IS DISTINCT FROM b.n_chars
"""


@register("documents_table_diff", _TABLE_DIFF_SQL)
def q_documents_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style table reconciliation: find the row-level delta
    between two corpus versions WITHOUT a full-table compare. Phase 1
    fingerprints each version per bucket (doc_id % 256): row count plus
    the exact SUM of a 40-bit integer slice of md5(row) — engine-
    portable (Spark ``conv(hex,16,10)``, DuckDB ``CAST('0x'||hex)``)
    and order-free exact (256 * 1e6 rows * 2^40 < int64). Phase 2
    compares the two 256-row fingerprint tables (driver-size metadata)
    and keeps only differing buckets; phase 3 full-outer-joins the ROW
    DATA of those buckets alone to emit per-doc statuses. At 100 TB
    with a bucketed layout, an unchanged table costs two metadata-light
    scans and zero detail reads; a 0.1%-changed table reads ~0.1% of
    buckets in phase 3. The oracle diffs the versions directly with a
    full outer join — hash-equality proves bucket pruning loses
    nothing. v2 is derived in-plan (delete/modify/insert by doc_id
    modulus), identically in the SQL CTE."""
    docs = _docs(spark, sf_dir)
    # footer-stats max (plants never touch doc_id) — no Spark job (r13)
    max_id = _docs_id_range(spark, sf_dir)[1]
    v2 = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 89 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 101 == 0).withColumn(
                "doc_id", F.col("doc_id") + F.lit(max_id + 1)
            )
        )
    )
    from market_microstructure_toolkit_spark.operators.reconcile import (
        table_diff,
    )

    return table_diff(
        docs,
        v2,
        "doc_id",
        compare_cols=["text", "lang", "source", "n_chars"],
        n_buckets=256,
    )


_TARGET_MIX_SQL = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
),
rates AS (
  SELECT source, n_s,
         LEAST(
           1.0,
           (SELECT floor(COUNT(*) / 2.0) FROM documents)
             * (sqrt(CAST(n_s AS DOUBLE))
                / (SELECT SUM(sqrt(CAST(n_s AS DOUBLE))) FROM counts))
             / CAST(n_s AS DOUBLE)
         ) AS r
  FROM counts
),
flagged AS (
  SELECT d.source, r.n_s,
         CASE WHEN r.r >= 1.0 THEN TRUE
              ELSE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                   < printf('%08x', CAST(floor(r.r * 4294967296.0) AS BIGINT))
         END AS kept
  FROM documents d JOIN rates r USING (source)
)
SELECT source, n_s AS n_source,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM flagged GROUP BY source, n_s
"""


@register("corpus_target_mix_sample", _TARGET_MIX_SQL)
def q_corpus_target_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted mixture sampling (the multilingual-corpus
    standard, alpha = 0.5): target share of source s is proportional to
    n_s^alpha — big sources are downweighted sub-linearly instead of
    capped to the minimum (``corpus_rebalance``'s uniform mix is the
    alpha->0 limit). Budget = half the corpus; per-source keep rate
    r_s = min(1, T * p_s / n_s); membership is the engine-portable
    lexicographic-hex md5 threshold (content-free, re-runnable,
    join-free at apply time — same idiom as rebalance_keep_flag, and
    the sqrt/divide arithmetic is IEEE-identical across engines).
    Scale shape: one groupBy for counts, broadcast of the tiny rate
    table, map-side flag; no corpus shuffle."""
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    tot = counts.agg(
        F.floor(F.sum("n_s") / F.lit(2.0)).alias("t"),
        F.sum(F.sqrt(F.col("n_s").cast("double"))).alias("wsum"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_s",
        F.least(
            F.lit(1.0),
            F.col("t")
            * (F.sqrt(F.col("n_s").cast("double")) / F.col("wsum"))
            / F.col("n_s").cast("double"),
        ).alias("r"),
    )
    thr = F.lower(
        F.lpad(F.hex(F.floor(F.col("r") * F.lit(4294967296.0))), 8, "0")
    )
    kept = F.when(F.col("r") >= 1.0, F.lit(True)).otherwise(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < thr
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .select("source", "n_s", kept.alias("kept"))
        .groupBy("source", F.col("n_s").alias("n_source"))
        .agg(F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"))
    )


_LSH_CALIBRATION_SQL = """
WITH cand AS (""" + _MINHASH_SQL + """),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gs
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
),
j AS (
  SELECT c.id_a, c.id_b,
         len(list_intersect(ga.gs, gb.gs)) AS inter,
         len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs)) AS uni
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.id_a
  JOIN grams gb ON gb.doc_id = c.id_b
)
SELECT CAST(LEAST(9, (10 * inter) // uni) AS BIGINT) AS jaccard_decile,
       COUNT(*) AS n_pairs,
       CAST(SUM(inter) AS BIGINT) AS sum_intersection,
       CAST(SUM(uni) AS BIGINT) AS sum_union
FROM j GROUP BY CAST(LEAST(9, (10 * inter) // uni) AS BIGINT)
"""


@register("dedup_minhash_calibration", _LSH_CALIBRATION_SQL)
def q_dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve of the MinHash-LSH candidate generator: for
    every candidate pair, the TRUE shingle-set Jaccard, histogrammed by
    decile — the evaluation a dedup pipeline runs before trusting its
    banding parameters (8 hashes / 4 bands targets the s-curve
    1-(1-s^2)^4, so most candidates should sit in the upper deciles;
    a mass of low-decile candidates means the bands are too loose).
    The true Jaccard is computed ONLY for candidate pairs — the
    verification join is candidate-sized, never corpus-quadratic, which
    is what makes post-hoc calibration affordable at 100 TB. Integer
    arithmetic end to end (set sizes, integer-division deciles):
    engine-exact with no rounding."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        minhash_lsh_candidates,
        word_shingles,
    )

    docs = _docs(spark, sf_dir)
    cand = minhash_lsh_candidates(docs)
    grams = docs.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("gs")
    ).filter(F.size("gs") >= 1)
    ga = grams.select(
        F.col("doc_id").alias("id_a"), F.col("gs").alias("gs_a")
    )
    gb = grams.select(
        F.col("doc_id").alias("id_b"), F.col("gs").alias("gs_b")
    )
    inter = F.size(F.array_intersect(F.col("gs_a"), F.col("gs_b")))
    uni = F.size("gs_a") + F.size("gs_b") - inter
    paired = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            inter.alias("inter"),
            uni.alias("uni"),
        )
    )
    decile = F.least(F.lit(9), F.expr("(10 * inter) DIV uni")).cast("long")
    return paired.groupBy(decile.alias("jaccard_decile")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("inter").cast("long").alias("sum_intersection"),
        F.sum("uni").cast("long").alias("sum_union"),
    )


_INCR_DEDUP_SQL = """
WITH mid AS (
  SELECT CAST((MIN(doc_id) + MAX(doc_id)) // 2 AS BIGINT) AS m FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gs
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
),
sigs AS (
  SELECT doc_id,
         list_aggregate(list_transform(gs, g -> md5(g || '#0')), 'min') AS mh0,
         list_aggregate(list_transform(gs, g -> md5(g || '#1')), 'min') AS mh1,
         list_aggregate(list_transform(gs, g -> md5(g || '#2')), 'min') AS mh2,
         list_aggregate(list_transform(gs, g -> md5(g || '#3')), 'min') AS mh3,
         list_aggregate(list_transform(gs, g -> md5(g || '#4')), 'min') AS mh4,
         list_aggregate(list_transform(gs, g -> md5(g || '#5')), 'min') AS mh5,
         list_aggregate(list_transform(gs, g -> md5(g || '#6')), 'min') AS mh6,
         list_aggregate(list_transform(gs, g -> md5(g || '#7')), 'min') AS mh7
  FROM grams
),
keyed AS (
  SELECT doc_id, band, key FROM (
    SELECT doc_id, 0 AS band, concat_ws('|', mh0, mh1) AS key FROM sigs WHERE mh0 IS NOT NULL
    UNION ALL
    SELECT doc_id, 1, concat_ws('|', mh2, mh3) FROM sigs WHERE mh0 IS NOT NULL
    UNION ALL
    SELECT doc_id, 2, concat_ws('|', mh4, mh5) FROM sigs WHERE mh0 IS NOT NULL
    UNION ALL
    SELECT doc_id, 3, concat_ws('|', mh6, mh7) FROM sigs WHERE mh0 IS NOT NULL
  )
),
keys_c AS (
  SELECT DISTINCT band, key FROM keyed CROSS JOIN mid WHERE doc_id <= m
),
near_ids AS (
  SELECT DISTINCT k.doc_id
  FROM keyed k JOIN keys_c USING (band, key) CROSS JOIN mid
  WHERE k.doc_id > m
),
chash AS (
  SELECT DISTINCT md5(text) AS h FROM documents CROSS JOIN mid WHERE doc_id <= m
)
SELECT d.doc_id,
       CASE WHEN md5(d.text) IN (SELECT h FROM chash) THEN 'exact'
            WHEN d.doc_id IN (SELECT doc_id FROM near_ids) THEN 'near'
            ELSE 'unique' END AS dup_kind
FROM documents d CROSS JOIN mid WHERE d.doc_id > m
"""


@register("documents_incremental_dedup", _INCR_DEDUP_SQL)
def q_documents_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW batch against an EXISTING corpus
    snapshot — the shape live ingestion actually runs (self-dedup of the
    union would re-pay the whole corpus every batch). The corpus's older
    id-half plays the snapshot, the newer half the arriving batch; each
    batch doc classifies as 'exact' (content hash already in the
    corpus), 'near' (shares a MinHash LSH band key with any corpus doc),
    or 'unique'. Scale shape: the corpus side reduces to two DISTINCT
    key sets — content hashes and (band, key) pairs — and the batch
    probes them with semi-joins; fan-out is at most 1 per probe (the
    corpus sets are distinct), so there is NO pairwise candidate
    generation at all, unlike self-dedup. At 100 TB the corpus key sets
    are incrementally maintainable (append-only), making per-batch cost
    independent of corpus size except for the key-set join."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = _docs(spark, sf_dir)
    # footer-stats range (plants never touch doc_id) — no Spark job (r13)
    lo, hi = _docs_id_range(spark, sf_dir)
    mid = (lo + hi) // 2

    chash = (
        docs.filter(F.col("doc_id") <= mid)
        .select(F.md5("text").alias("__h"))
        .distinct()
    )
    sigs = minhash_signatures(docs)
    keyed = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")
                        ).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    keys_c = (
        keyed.filter(F.col("doc_id") <= mid).select("band", "key").distinct()
    )
    near_ids = (
        keyed.filter(F.col("doc_id") > mid)
        .join(keys_c, ["band", "key"], "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__near", F.lit(True))
    )
    batch = docs.filter(F.col("doc_id") > mid).withColumn(
        "__h", F.md5("text")
    )
    exact_ids = (
        batch.join(chash, "__h", "left_semi")
        .select("doc_id")
        .withColumn("__exact", F.lit(True))
    )
    return (
        batch.join(exact_ids, "doc_id", "left")
        .join(near_ids, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__exact"), F.lit("exact"))
            .when(F.col("__near"), F.lit("near"))
            .otherwise(F.lit("unique"))
            .alias("dup_kind"),
        )
    )


_PROFILE_SQL = """
SELECT 'doc_id' AS column_name,
       CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT doc_id) AS n_distinct,
       CAST(MIN(doc_id) AS VARCHAR) AS min_value,
       CAST(MAX(doc_id) AS VARCHAR) AS max_value
FROM documents
UNION ALL
SELECT 'lang',
       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT lang), MIN(lang), MAX(lang)
FROM documents
UNION ALL
SELECT 'source',
       CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT source), MIN(source), MAX(source)
FROM documents
UNION ALL
SELECT 'n_chars',
       CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(DISTINCT n_chars),
       CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
FROM documents
"""


@register("documents_profile", _PROFILE_SQL)
def q_documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the Deequ/Great-Expectations analyzer pass): per
    column, null count, exact distinct count, and min/max — the summary
    every ingest job publishes before downstream consumers trust a drop.
    All four columns profile in ONE aggregate pass (Spark computes the
    grouped-by-nothing aggregate with partial aggregation; the
    per-column rows are unpivoted from that single row in-plan), not one
    scan per column — at 100 TB the difference between 1 and k table
    scans. Values stringified for a uniform schema; integer/string
    outputs are engine-exact."""
    from market_microstructure_toolkit_spark.operators.reconcile import (
        profile_table,
    )

    docs = plant_docs(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    return profile_table(docs, ["doc_id", "lang", "source", "n_chars"])


_STRAT_SAMPLE_CAP = 100


_STRAT_SAMPLE_SQL = f"""
WITH ranked AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rk
  FROM documents
)
SELECT source,
       COUNT(*) AS n_source,
       CAST(SUM(CASE WHEN rk <= {_STRAT_SAMPLE_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sampled,
       CAST(MIN(CASE WHEN rk <= {_STRAT_SAMPLE_CAP} THEN doc_id END)
            AS BIGINT) AS min_sampled_id
FROM ranked GROUP BY source
"""


@register("corpus_exact_stratified_sample", _STRAT_SAMPLE_SQL)
def q_corpus_exact_stratified_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT-count stratified sampling: exactly min(n_s, 100) documents
    per source, chosen by hash rank — unlike the Bernoulli-threshold
    samplers (corpus_rebalance, corpus_target_mix_sample) whose counts
    are binomial, this is the contract evaluation sets need ("exactly
    100 per stratum"). Hash-order rank keeps the choice content-free,
    deterministic, and stable under reruns; the rank window partitions
    by stratum (never global), so parallelism = #strata and the cap
    bounds per-task output. Skew note: a jumbo stratum still sorts its
    partition — for 100 TB strata the two-phase trick is pre-filtering
    on the hash threshold that admits ~2x the cap, then ranking the
    survivors; the gate output (census + min sampled id) is identical."""
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "source", "doc_id", F.row_number().over(w).alias("rk")
    )
    incap = F.col("rk") <= _STRAT_SAMPLE_CAP
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_source"),
        F.sum(incap.cast("long")).alias("n_sampled"),
        F.min(F.when(incap, F.col("doc_id"))).cast("long").alias(
            "min_sampled_id"
        ),
    )


_LANGID_CONFUSION_SQL = (
    "WITH preds AS (\n"
    + _lang_id_sql()
    + "\n)\n"
    "SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs\n"
    "FROM preds GROUP BY labeled_lang, predicted_lang"
)


@register("doc_langid_confusion", _LANGID_CONFUSION_SQL)
def q_doc_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language classifier against the
    corpus's labels — the in-engine evaluation of doc_lang_id (the same
    pattern as book_feature_auc: model, prediction, AND its quality
    report all inside the DataFrame plan). The matrix is label-count
    sized (languages², not documents), so it reduces map-side; the
    misclassification cells tell a curation pipeline which language
    pairs its marker lexicons confuse before it routes documents by
    prediction. Integer-exact."""
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        lang_id_expr,
    )

    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            lang_id_expr("text").alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SUBSTR_SPANS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
posed AS (
  SELECT doc_id, unnest(range(1, len(w) - 3)) AS pos, w
  FROM toks WHERE len(w) >= 5
),
sh AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         array_to_string(list_slice(w, pos, pos + 4), ' ') AS shingle
  FROM posed
),
dup AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) > 1),
anchors AS (SELECT s.doc_id, s.pos FROM sh s JOIN dup USING (shingle)),
brk AS (
  SELECT doc_id, pos,
    CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
         THEN 0 ELSE 1 END AS brk
  FROM anchors
),
isl AS (
  SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM brk
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + 4 AS span_end,
       MAX(pos) + 4 - MIN(pos) + 1 AS span_tokens
FROM isl GROUP BY doc_id, island
"""


@register("dedup_substring_spans", _SUBSTR_SPANS_SQL)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022 ExactSubstr, the one major
    production dedup mode the tier lacked — round-8 verdict #7): every
    maximal token span of >= 5 tokens whose content occurs more than
    once in the corpus, as (doc_id, span_start, span_end, span_tokens).
    Shingle-anchored relational formulation instead of the paper's
    suffix array: duplicated 5-token shingles are the anchors, merged
    per document by a gaps-and-islands window — O(corpus tokens) rows
    end to end, one uniform shuffle on the shingle string, no pair
    fan-out (hot boilerplate shingles are COUNTS, not pairs), doc-keyed
    windows bounded by document length. Integer-exact output."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        substring_dup_spans,
    )

    return substring_dup_spans(_docs(spark, sf_dir), min_tokens=5)


_PIPELINE_SQL = (
    """
WITH h1 AS (SELECT doc_id, md5(text) AS h FROM documents),
canon1 AS (SELECT MIN(doc_id) AS doc_id FROM h1 GROUP BY h),
s1 AS (SELECT d.* FROM documents d JOIN canon1 USING (doc_id)),
pairs AS (
  SELECT id_a, id_b FROM ("""
    + _MINHASH_SQL.replace("FROM documents", "FROM s1")
    + """) mh
),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS MATERIALIZED (SELECT doc_id AS id FROM s1),
"""
    + _minlabel_rounds_sql(12)
    + """,
canon2 AS (SELECT id AS doc_id FROM it12 WHERE id = lab),
s2 AS (SELECT s1.* FROM s1 JOIN canon2 USING (doc_id)),
bench AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
  FROM (SELECT string_split(text, ' ') AS w FROM documents
        WHERE doc_id % 50 = 0)
  WHERE len(w) >= 3
),
corp AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM s2
        WHERE doc_id % 50 != 0)
  WHERE len(w) >= 3
),
contam AS (
  SELECT c.doc_id FROM corp c JOIN bench USING (g)
  GROUP BY c.doc_id HAVING COUNT(*) >= 2
),
s3 AS (
  SELECT t.* FROM (SELECT * FROM s2 WHERE doc_id % 50 != 0) t
  ANTI JOIN contam USING (doc_id)
),
q AS ("""
    + _QUALITY_SQL.replace("FROM documents", "FROM s3")
    + """),
s4 AS (
  SELECT s3.* FROM s3 JOIN q USING (doc_id) WHERE q.quality_score >= 0.5
),
s5 AS (
  SELECT * FROM s4
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 31, 2) < 'f8'
),
packed AS ("""
    + _PACK_SQL.replace("FROM documents", "FROM s5")
    + """)
SELECT * FROM packed
"""
)


@register("corpus_pipeline_e2e", _PIPELINE_SQL)
def q_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-corpus build as ONE composition (round-9
    verdict ask #5): exact dedup (min doc per md5(text); NULL/empty
    texts group like any other content hash) -> MinHash-LSH near-dup
    clusters keeping each cluster's min-id canonical -> benchmark
    decontamination (every 50th raw doc plays the eval set; survivors
    sharing >= 2 distinct 3-gram shingles drop, and eval docs never
    enter the output) -> quality filter (score >= 0.5) -> train-split
    selection (md5 bucket < 'f8') -> sequence packing (8 shards, 256
    tokens). Output = the packed-sequence occupancy report, so the gate
    hashes the FINAL artifact of the pipeline — any semantic drift at
    ANY stage boundary moves it.

    Composition shape at 100 TB: the exact-dedup survivor set is
    localCheckpoint'd ONCE because three consumers branch from it (LSH
    candidate generation, cluster vertices, the survivor join) — without
    it each branch re-runs the scan + hash-aggregate; every later stage
    is single-consumer lazy composition (anti-join, semi-joins,
    map-side filters) with no materialization between stages, and the
    packing cumsum size-dispatches to the segmented scan like the
    standalone gate. Verified on the executed plan: stages 2-6 read the
    checkpointed survivors (ExistingRDD), and the raw corpus parquet
    appears exactly twice post-checkpoint (the eval-set shingle build +
    its count), not once per stage."""
    from market_microstructure_toolkit_spark.operators.dedup import (
        contamination_flags,
        dedup_clusters,
        minhash_lsh_candidates,
    )
    from market_microstructure_toolkit_spark.operators.packing import (
        pack_stats,
    )
    from market_microstructure_toolkit_spark.operators.text_analysis import (
        quality_features,
        split_expr,
    )

    docs = _docs(spark, sf_dir)
    # stage 1: exact dedup (one shuffle on the content hash)
    canon1 = (
        docs.select("doc_id", F.md5(F.col("text")).alias("__h"))
        .groupBy("__h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s1 = docs.join(canon1, "doc_id").localCheckpoint()
    # stage 2: near-dup clusters over the exact survivors
    pairs = minhash_lsh_candidates(s1, k=8, rows_per_band=2, shingle_n=3)
    # id-only canonical set localCheckpoint'd (round 13): the stage-3+
    # lazy chain references its consumer subtree repeatedly, and since
    # dedup_clusters now returns a LAZY singleton-rejoin frame each
    # re-evaluation would re-run that join — truncate it once (tiny
    # frame, one job; guide §1.2)
    canon2 = (
        dedup_clusters(s1, pairs)
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id")
        .localCheckpoint()
    )
    s2 = s1.join(canon2, "doc_id")
    # stage 3: decontamination (broadcast eval shingles, anti-join)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = s2.filter(F.col("doc_id") % 50 != 0)
    flagged = contamination_flags(
        corpus, bench, shingle_n=3, min_shared=2
    ).select("doc_id")
    s3 = corpus.join(flagged, "doc_id", "left_anti")
    # stage 4: quality gate (map-side expressions, one semi-join)
    keepq = (
        quality_features(s3)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id")
    )
    s4 = s3.join(keepq, "doc_id")
    # stage 5: train-split selection (pure map over the id)
    s5 = s4.filter(split_expr() == F.lit("train"))
    # stage 6: pack the survivors (rows // 8 hint: skew-safe by
    # construction — the shard key is operator-assigned pmod(doc_id, 8),
    # see the pack_sequences gate's note)
    return pack_stats(
        s5,
        budget=256,
        n_shards=8,
        segmented=W.use_segmented(
            parquet_rows(f"{sf_dir}/documents.parquet") // 8
        ),
    )
