"""Embedding similarity gate queries (ANN, IVF, PQ, LSH, centroids)
- split from plans/queries.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from market_microstructure_toolkit_spark.functions import arrays as A
from market_microstructure_toolkit_spark.functions import microstructure as M
from market_microstructure_toolkit_spark.plans.base import (
    _emb,
    lsh_keyed_sql,
    parquet_rows,
    q2k_col,
    register,
)


_PQ_M, _PQ_SUB, _PQ_C = 8, 8, 16

_SIMILARITY_SQL = """
WITH q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id, e.label,
         ROUND(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))),
           6) AS cos_sim
  FROM embeddings e, q
  WHERE e.vec_id <> 0
)
SELECT vec_id, label, cos_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rk
  FROM scored
)
WHERE rk <= 25
"""


@register("similarity_topk", _SIMILARITY_SQL)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a query vector (vec_id=0): the
    exact-ANN baseline. The query vector broadcasts; scoring is a
    shuffle-free map (zip_with + aggregate); top-k is a single reduce.
    Cosine rounded at 6dp (64-term dot products reorder at ~1e-15)."""
    emb = _emb(spark, sf_dir)
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    emb_d = emb.select("vec_id", "label", vec_d.alias("v"))
    qv = F.broadcast(
        emb_d.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    )
    scored = (
        emb_d.filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select(
            "vec_id",
            "label",
            F.round(
                A.dot("v", "qv") / (A.l2_norm("v") * A.l2_norm("qv")), 6
            ).alias("cos_sim"),
        )
    )
    # TakeOrderedAndProject: distributed partial top-k, no global window.
    return (
        scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(25)
        .select("vec_id", "label", "cos_sim")
    )


_LSH_PAIRS_SQL = (
    "WITH "
    + lsh_keyed_sql()
    + """,
ok AS (SELECT band, bucket FROM keyed GROUP BY band, bucket
       HAVING COUNT(*) <= 1000),
k2 AS (SELECT keyed.vec_id, keyed.v, keyed.band, keyed.bucket
       FROM keyed JOIN ok USING (band, bucket)),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM k2 a JOIN k2 b
    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT p.id_a, p.id_b,
       FLOOR(list_dot_product(ea.v, eb.v)
             / (sqrt(list_dot_product(ea.v, ea.v))
                * sqrt(list_dot_product(eb.v, eb.v)))
             * 65536.0 + 0.5) / 65536.0 AS cos_sim
FROM pairs p
JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) ea
  ON ea.vec_id = p.id_a
JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) eb
  ON eb.vec_id = p.id_b
"""
)


@register("similarity_lsh_pairs", _LSH_PAIRS_SQL)
def q_similarity_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH ANN candidates: 4 bands x auto-width sign bits
    (8 at <=25.6k vectors, growing to keep expected occupancy <=100 —
    see operators.similarity.auto_bits_per_band) over distinct
    coordinate blocks, exact-cosine only WITHIN (band, bucket) groups,
    pairs dedup'd across bands — |bucket|^2-instead-of-n^2 with the
    bucket count scaling with the corpus, plus the max_bucket hot-bucket
    guard (an IVF coarse quantizer slots into the same plan shape).

    cos_sim is quantized to 2^-16 multiples via FLOOR(x*65536+0.5)/65536
    — every step of that formula is exact in IEEE-754 given bit-
    identical x (power-of-two multiply shifts the exponent; +0.5 and
    FLOOR are exact), unlike decimal ROUND(x, 6) whose double->decimal
    conversion differs between engines on boundary values: the sf100
    sweep (258M pairs) surfaced exactly that — row counts and the pair
    SET hash-exact, a handful of 6-dp roundings apart (round-12)."""
    from market_microstructure_toolkit_spark.operators.similarity import (
        lsh_banded_pairs,
    )

    emb = _emb(spark, sf_dir)
    out = lsh_banded_pairs(
        emb,
        bits_per_band="auto",
        n_bands=4,
        min_cosine=-2.0,
        max_bucket=1000,
        # corpus rowcount from the parquet footer (metadata pull;
        # _emb's spread() is row-preserving) — kills the per-invocation
        # auto-width count job (round 13, guide §1/§6)
        n_rows=parquet_rows(f"{sf_dir}/embeddings.parquet"),
    )
    # NaN passthrough (ADVICE r12): Spark's F.floor returns LongType, so
    # floor(NaN*65536+0.5)/65536 silently becomes 0.0 while DuckDB's
    # FLOOR propagates NaN — a zero-norm embedding (cos_sim NaN) would
    # diverge between engines. Quantize only finite values.
    quant = (
        F.floor(F.col("cos_sim") * F.lit(65536.0) + F.lit(0.5))
        / F.lit(65536.0)
    )
    return out.select(
        "id_a",
        "id_b",
        F.when(F.isnan(F.col("cos_sim")), F.col("cos_sim"))
        .otherwise(quant)
        .alias("cos_sim"),
    )


def _ivf_dists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-to-centroid distances for the IVF coarse quantizer over
    the embeddings fixture — delegates to
    ``operators.similarity.ivf_centroid_dists`` (extracted round 6)."""
    from market_microstructure_toolkit_spark.operators.similarity import (
        ivf_centroid_dists,
    )

    emb = _emb(spark, sf_dir).select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return ivf_centroid_dists(emb, n_cents=8)


def _ivf_assigned(dists: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (operators.similarity.ivf_assign)."""
    from market_microstructure_toolkit_spark.operators.similarity import (
        ivf_assign,
    )

    return ivf_assign(dists)


_IVF_SQL = """
WITH emb AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id BETWEEN 1 AND 8),
dists AS (
  SELECT e.vec_id, e.label, e.v, c.cid,
         list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
  FROM emb e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, label, v, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM dists
  ) WHERE rn = 1
),
q AS (SELECT v AS qv, cid AS qcid FROM assigned WHERE vec_id = 0)
SELECT a.vec_id, a.label,
       ROUND(list_dot_product(a.v, q.qv)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))),
             6) AS cos_sim
FROM assigned a, q
WHERE a.cid = q.qcid AND a.vec_id != 0
ORDER BY cos_sim DESC, a.vec_id
LIMIT 10
"""


@register("similarity_ivf", _IVF_SQL)
def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: 8 fixed coarse-quantizer centroids (vectors 1..8 —
    a trained k-means would slot in identically), every vector assigned to
    its nearest centroid (broadcast centroids, argmin by L2), then the
    query probes ONLY its own cell and reranks by exact cosine. At scale
    the scan per query drops from n to n/cells; assignment is one
    broadcast-join map stage."""
    from market_microstructure_toolkit_spark.functions import arrays as AR

    assigned = _ivf_assigned(_ivf_dists(spark, sf_dir))
    q = F.broadcast(
        assigned.filter(F.col("vec_id") == 0).select(
            F.col("v").alias("qv"), F.col("cid").alias("qcid")
        )
    )
    return (
        assigned.join(q, F.col("cid") == F.col("qcid"))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id", "label",
            F.round(AR.cosine("v", "qv"), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


_IVF_MP_SQL = """
WITH emb AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id BETWEEN 1 AND 8),
dists AS (
  SELECT e.vec_id, e.label, e.v, c.cid,
         list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
  FROM emb e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, label, v, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM dists
  ) WHERE rn = 1
),
probes AS (SELECT cid FROM dists WHERE vec_id = 0 ORDER BY dist, cid LIMIT 3),
q AS (SELECT v AS qv FROM emb WHERE vec_id = 0)
SELECT a.vec_id, a.label,
       ROUND(list_dot_product(a.v, q.qv)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))),
             6) AS cos_sim
FROM assigned a JOIN probes p ON a.cid = p.cid CROSS JOIN q
WHERE a.vec_id != 0
ORDER BY cos_sim DESC, a.vec_id
LIMIT 10
"""


@register("similarity_ivf_multiprobe", _IVF_MP_SQL)
def q_similarity_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN: the query visits its 3 nearest cells (not
    just its own) before the exact-cosine rerank — the standard recall
    remedy the single-probe docstring names. Scan cost rises from
    n/cells to 3n/cells, still far from the full scan; the probe list is
    a broadcast of 3 rows, so the plan stays assign -> bucket-join ->
    rerank with no extra shuffle. Recall vs single probe is measured by
    ``similarity_ann_recall_multiprobe``."""
    from market_microstructure_toolkit_spark.functions import arrays as AR

    dists = _ivf_dists(spark, sf_dir)
    assigned = _ivf_assigned(dists)
    probes = F.broadcast(
        dists.filter(F.col("vec_id") == 0)
        .orderBy("dist", "cid")
        .limit(3)
        .select("cid")
    )
    # query vector straight from the embedding scan (round 13): unlike
    # single-probe, this branch needs only qv — not the query's argmin
    # cell — and `v` is the unchanged cast embedding, so routing the
    # broadcast through `assigned` ran the whole centroid-distance +
    # argmin aggregate just to pass one row through. The oracle's own
    # `q` CTE reads FROM emb for the same reason. Plan effect: the BNLJ
    # build side is a pushed-filter point scan again, not a data-sized
    # aggregate (PLAN_AUDIT had flagged the aggregate form).
    q = F.broadcast(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .select(
            F.transform("embedding", lambda x: x.cast("double")).alias("qv")
        )
    )
    return (
        assigned.join(probes, "cid")
        .filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "vec_id", "label",
            F.round(AR.cosine("v", "qv"), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


_ANN_RECALL_SQL = """
WITH exact10 AS (
  SELECT vec_id FROM (""" + _SIMILARITY_SQL + """) e
  ORDER BY cos_sim DESC, vec_id LIMIT 10
),
ivf10 AS (
  SELECT vec_id FROM (""" + _IVF_SQL + """) i
)
SELECT COUNT(*) AS n_overlap,
       CAST(COUNT(*) AS DOUBLE) / 10.0 AS recall_at_10
FROM exact10 JOIN ivf10 USING (vec_id)
"""


@register("similarity_ann_recall", _ANN_RECALL_SQL)
def q_similarity_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF cell-probe ANN against the exact brute-force
    top-10 — the quality metric that justifies (or vetoes) the n/cells
    scan reduction. Both operand sets are individually hash-exact, so
    their intersection count is too. On this corpus the number is LOW
    (~0.1 at sf0.1): the embeddings are near-uniform random, where
    single-probe cell pruning genuinely loses the neighborhood — exactly
    the veto signal this metric exists to raise (remedies: multi-probe,
    more/trained centroids, or brute force below a size threshold)."""
    exact10 = (
        q_similarity_topk(spark, sf_dir)
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    ivf10 = q_similarity_ivf(spark, sf_dir).select("vec_id")
    return exact10.join(ivf10, "vec_id").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall_at_10"),
    )


_ANN_RECALL_MP_SQL = """
WITH exact10 AS (
  SELECT vec_id FROM (""" + _SIMILARITY_SQL + """) e
  ORDER BY cos_sim DESC, vec_id LIMIT 10
),
mp10 AS (
  SELECT vec_id FROM (""" + _IVF_MP_SQL + """) i
)
SELECT COUNT(*) AS n_overlap,
       CAST(COUNT(*) AS DOUBLE) / 10.0 AS recall_at_10
FROM exact10 JOIN mp10 USING (vec_id)
"""


@register("similarity_ann_recall_multiprobe", _ANN_RECALL_MP_SQL)
def q_similarity_ann_recall_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the 3-probe IVF against the exact top-10 — the
    companion measurement to ``similarity_ann_recall`` that shows what
    multi-probe buys back: on these near-uniform embeddings single-probe
    recall is ~0.1 and 3 probes roughly triples the visited candidate
    set, so the delta between the two queries IS the multi-probe payoff
    (and the pair demonstrates the recall/scan-cost dial a production
    deployment tunes)."""
    exact10 = (
        q_similarity_topk(spark, sf_dir)
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
        .select("vec_id")
    )
    mp10 = q_similarity_ivf_multiprobe(spark, sf_dir).select("vec_id")
    return exact10.join(mp10, "vec_id").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall_at_10"),
    )


_PQ_CTES = f"""emb AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id BETWEEN 1 AND {_PQ_C}),
mm AS (SELECT UNNEST(range(1, {_PQ_M} + 1)) AS m),
d AS (
  SELECT e.vec_id, e.label, mm.m, c.cid,
    list_sum(list_transform(range(1, {_PQ_SUB} + 1),
      i -> (e.v[(mm.m - 1) * {_PQ_SUB} + i] - c.cv[(mm.m - 1) * {_PQ_SUB} + i])
         * (e.v[(mm.m - 1) * {_PQ_SUB} + i] - c.cv[(mm.m - 1) * {_PQ_SUB} + i])))
      AS dist
  FROM emb e CROSS JOIN mm CROSS JOIN cents c
),
codes AS (
  SELECT vec_id, label, m, cid FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rn
    FROM d
  ) WHERE rn = 1
),
dq AS (
  SELECT m, cid, floor(dist * 1048576.0 + 0.5) / 1048576.0 AS qd
  FROM d WHERE vec_id = 0
),
adc AS (
  SELECT c.vec_id, c.label, SUM(q.qd) AS adc_dist
  FROM codes c JOIN dq q USING (m, cid)
  WHERE c.vec_id != 0
  GROUP BY c.vec_id, c.label
)"""


_PQ_SQL = f"""WITH {_PQ_CTES}
SELECT vec_id, label, adc_dist FROM adc
ORDER BY adc_dist, vec_id
LIMIT 10
"""


def _pq_adc_from(emb: DataFrame) -> DataFrame:
    """Shared PQ pipeline over any (vec_id, label, v: array<double>)
    frame — delegates to ``operators.similarity.pq_adc_scores``
    (extracted round 6) with the gates' M/sub/centroid constants, so
    the oracles pin that exact code."""
    from market_microstructure_toolkit_spark.operators.similarity import (
        pq_adc_scores,
    )

    return pq_adc_scores(
        emb, m=_PQ_M, sub_dim=_PQ_SUB, n_cents=_PQ_C, query_vec_id=0
    )


def _pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return _pq_adc_from(emb)


@register("similarity_pq_adc", _PQ_SQL)
def q_similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ compression + asymmetric-distance top-10 (Jégou, Douze &
    Schmid 2011): vectors encode once to M={_PQ_M} one-byte codes (argmin
    vs 16 broadcast centroids per subspace — sampled codebook, the repo's
    IVF convention; trained k-means slots in identically), and the query
    scans by summing 8 lookups from its broadcast 8x16 distance table.
    At 100 TB this is the layout that keeps the index in memory: 64
    float32 dims -> 8 bytes per vector (32x), with encode a broadcast
    map stage and the scan a shuffle-free lookup-sum + TakeOrdered. The
    query's table entries are quantized to 2^-20 so the 8-term ADC sum
    is exact in any order — rankings hash-stable with no rounding."""
    return (
        _pq_adc(spark, sf_dir)
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )


_PQ_RECALL_SQL = f"""WITH {_PQ_CTES},
top_adc AS (
  SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT 10
),
cand AS (SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT 100),
exact AS (
  SELECT e.vec_id,
    list_sum(list_transform(range(1, 65),
      i -> (e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i]))) AS dist
  FROM emb e, (SELECT v AS qv FROM emb WHERE vec_id = 0) q
  WHERE e.vec_id != 0
),
top_exact AS (SELECT vec_id FROM exact ORDER BY dist, vec_id LIMIT 10),
top_rerank AS (
  SELECT c.vec_id FROM cand c JOIN exact e USING (vec_id)
  ORDER BY e.dist, c.vec_id LIMIT 10
)
SELECT
  (SELECT COUNT(*) FROM top_adc JOIN top_exact USING (vec_id)) / 10.0
    AS recall_at_10,
  (SELECT COUNT(*) FROM top_rerank JOIN top_exact USING (vec_id)) / 10.0
    AS recall_at_10_reranked
"""


@register("similarity_pq_recall", _PQ_RECALL_SQL)
def q_similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the PQ scan vs the exact L2 top-10, BOTH ways the
    index is queried — ADC-only and ADC+top-100-exact-rerank — in one
    row (0.1 -> 0.3 on the sf0.1 fixture; ann_recall convention:
    measure, don't claim). A sampled 16-centroid codebook on
    near-uniform vectors loses real recall — iid vectors are the
    concentration-of-measure worst case; the further remedies are a
    trained codebook, more centroids, OPQ rotation, deeper candidate
    lists."""
    return _recall_from_adc(_pq_adc(spark, sf_dir), spark, sf_dir)


def _recall_from_adc(
    adc: DataFrame, spark: SparkSession, sf_dir: str, n_cand: int = 100
) -> DataFrame:
    """Shared recall@10 measurement (ADC-only and ADC+rerank vs the
    exact L2 top-10) — used by both the sampled-codebook (n_cand=100,
    the historical driver-pinned depth) and the trained-codebook
    (n_cand=1000) PQ recall gates. Candidate depth is the production
    recall/cost knob: the rerank fetches n_cand exact vectors whatever
    the corpus size, so deepening it is O(1) vs corpus — at sf1 the
    trained codebook measured rerank recall 0.6 at depth 100 vs 1.0 at
    depth 1000 (within-cluster ADC ties get arbitrary candidate order;
    depth must cover the tie group, not the corpus)."""
    top_adc = adc.orderBy("adc_dist", "vec_id").limit(10).select("vec_id")
    cand = adc.orderBy("adc_dist", "vec_id").limit(n_cand).select("vec_id")
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    )
    fold = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select("vec_id", fold.alias("dist"))
    )
    top_exact = exact.orderBy("dist", "vec_id").limit(10).select("vec_id")
    top_rerank = (
        cand.join(exact, "vec_id")
        .orderBy("dist", "vec_id")
        .limit(10)
        .select("vec_id")
    )
    r_adc = top_adc.join(top_exact, "vec_id").agg(
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall_at_10")
    )
    r_rr = top_rerank.join(top_exact, "vec_id").agg(
        (F.count(F.lit(1)) / F.lit(10.0)).alias("recall_at_10_reranked")
    )
    return r_adc.crossJoin(r_rr)


_PQ_RERANK_SQL = f"""WITH {_PQ_CTES},
cand AS (
  SELECT vec_id, label FROM adc ORDER BY adc_dist, vec_id LIMIT 100
),
rr AS (
  SELECT c.vec_id, c.label,
    list_sum(list_transform(range(1, 65),
      i -> (e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i]))) AS l2_dist
  FROM cand c
  JOIN emb e USING (vec_id),
       (SELECT v AS qv FROM emb WHERE vec_id = 0) q
)
SELECT vec_id, label, ROUND(l2_dist, 6) AS l2_dist
FROM rr ORDER BY l2_dist, vec_id LIMIT 10
"""


@register("similarity_pq_rerank", _PQ_RERANK_SQL)
def q_similarity_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC + exact rerank — the production PQ query shape: the compressed
    scan prunes the corpus to 100 candidates (table lookups only, no
    float vectors touched), then ONLY those 100 fetch their exact
    vectors for a true-L2 rerank. At 100 TB the exact side reads 100
    rows instead of n — the scan cost stays in the compressed domain
    while the rerank recovers what survives the prune: measured
    recall@10 goes 0.1 (ADC-only) -> 0.3 on the sf0.1 fixture. The
    fixture is PQ's concentration-of-measure worst case — iid
    near-uniform vectors have no cluster structure, so ADC ordering is
    close to noise and only 3 of the true top-10 land in the top-100
    candidates; real embedding corpora cluster, which is exactly what
    the codebook quantizes. Output rounds the rerank distance at 6 dp
    (order-sensitive 64-term fold)."""
    adc = _pq_adc(spark, sf_dir)
    cand = adc.orderBy("adc_dist", "vec_id").limit(100).select("vec_id", "label")
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    )
    fold = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rr = (
        cand.join(emb, "vec_id")
        .crossJoin(q)
        .select("vec_id", "label", fold.alias("l2_dist"))
    )
    return (
        rr.select("vec_id", "label", F.round("l2_dist", 6).alias("l2_dist"))
        .orderBy("l2_dist", "vec_id")
        .limit(10)
    )


def _pq_train_ctes(steps: int) -> tuple[str, str]:
    """DuckDB twin of ``operators.similarity.pq_train_codebooks`` —
    generates the Lloyd-step CTE chain so the oracle trains the SAME
    codebook the Spark plan trains (init = sampled vectors 1..C per
    subspace; each step = nearest-centroid assignment + per-cluster
    elementwise mean quantized to 2^-16, the cross-engine determinism
    pattern). Returns (ctes_sql, final_centroid_cte_name)."""
    sd, m_, nc = _PQ_SUB, _PQ_M, _PQ_TRAINED_C
    parts = [
        f"""emb AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
mm AS (SELECT UNNEST(range(1, {m_} + 1)) AS m),
subs AS (
  SELECT e.vec_id, e.label, mm.m,
    list_transform(range(1, {sd} + 1), i -> e.v[(mm.m - 1) * {sd} + i]) AS sv
  FROM emb e CROSS JOIN mm
),
c0 AS (
  SELECT mm.m, e.vec_id AS cid,
    list_transform(range(1, {sd} + 1), i -> e.v[(mm.m - 1) * {sd} + i]) AS scv
  FROM emb e CROSS JOIN mm WHERE e.vec_id BETWEEN 1 AND {nc}
)"""
    ]
    prev = "c0"
    for s in range(1, steps + 1):
        parts.append(
            f"""d{s} AS (
  SELECT s.vec_id, s.m, c.cid,
    list_sum(list_transform(range(1, {sd} + 1),
      i -> (s.sv[i] - c.scv[i]) * (s.sv[i] - c.scv[i]))) AS dist
  FROM subs s JOIN {prev} c USING (m)
),
a{s} AS (
  SELECT vec_id, m, cid FROM (
    SELECT vec_id, m, cid,
      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rn
    FROM d{s}
  ) WHERE rn = 1
),
c{s} AS (
  SELECT m, cid, list(qx ORDER BY dim) AS scv FROM (
    SELECT a.m, a.cid, u.i AS dim,
      FLOOR(AVG(s.sv[u.i]) * 65536.0 + 0.5) / 65536.0 AS qx
    FROM a{s} a JOIN subs s USING (vec_id, m), UNNEST(range(1, {sd} + 1)) u(i)
    GROUP BY a.m, a.cid, u.i
  ) GROUP BY m, cid
)"""
        )
        prev = f"c{s}"
    return ",\n".join(parts), prev


#: Trained-codebook budget: 128 centroids/subspace (half the one-byte
#: code ceiling of 256) — measured on the clustered sf0.1 fixture at
#: rerank depth 100: 16 cents -> reranked recall 0.5 (within-cluster
#: code collisions cap ADC resolution), 64 -> 0.5, 128 -> 0.8 with ADC
#: itself at 0.3. More Lloyd steps do NOT substitute for centroid
#: budget (16 cents at 8 steps measured 0.4): with tight clusters the
#: codebook needs enough cells to SPLIT each cluster per subspace, not
#: better-placed coarse cells. Steps=2 suffices once the budget is
#: there; rerank depth 1000 (still O(1) exact fetches vs corpus) then
#: covers the residual tie group -> reranked 1.0 at sf0.1 AND sf1.
_PQ_TRAINED_STEPS = 2
_PQ_TRAINED_C = 128
_TRAIN_CTES, _TRAIN_FINAL = _pq_train_ctes(_PQ_TRAINED_STEPS)

_PQ_TRAINED_RECALL_SQL = f"""WITH {_TRAIN_CTES},
dT AS (
  SELECT s.vec_id, s.m, c.cid,
    list_sum(list_transform(range(1, {_PQ_SUB} + 1),
      i -> (s.sv[i] - c.scv[i]) * (s.sv[i] - c.scv[i]))) AS dist
  FROM subs s JOIN {_TRAIN_FINAL} c USING (m)
),
codes AS (
  SELECT vec_id, m, cid FROM (
    SELECT vec_id, m, cid,
      ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS rn
    FROM dT
  ) WHERE rn = 1
),
dq AS (
  SELECT m, cid, floor(dist * 1048576.0 + 0.5) / 1048576.0 AS qd
  FROM dT WHERE vec_id = 0
),
adc AS (
  SELECT c.vec_id, SUM(q.qd) AS adc_dist
  FROM codes c JOIN dq q USING (m, cid)
  WHERE c.vec_id != 0
  GROUP BY c.vec_id
),
top_adc AS (SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT 10),
cand AS (SELECT vec_id FROM adc ORDER BY adc_dist, vec_id LIMIT 1000),
exact AS (
  SELECT e.vec_id,
    list_sum(list_transform(range(1, 65),
      i -> (e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i]))) AS dist
  FROM emb e, (SELECT v AS qv FROM emb WHERE vec_id = 0) q
  WHERE e.vec_id != 0
),
top_exact AS (SELECT vec_id FROM exact ORDER BY dist, vec_id LIMIT 10),
top_rerank AS (
  SELECT c.vec_id FROM cand c JOIN exact e USING (vec_id)
  ORDER BY e.dist, c.vec_id LIMIT 10
)
SELECT
  (SELECT COUNT(*) FROM top_adc JOIN top_exact USING (vec_id)) / 10.0
    AS recall_at_10,
  (SELECT COUNT(*) FROM top_rerank JOIN top_exact USING (vec_id)) / 10.0
    AS recall_at_10_reranked
"""


@register("similarity_pq_recall_trained", _PQ_TRAINED_RECALL_SQL)
def q_similarity_pq_recall_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@10 of a TRAINED-codebook PQ scan (round-10 verdict #4):
    identical measurement to ``similarity_pq_recall`` but the codebook
    is Lloyd-refined for {_PQ_TRAINED_STEPS} steps from the sampled
    init (``operators/similarity.py:pq_train_codebooks``) instead of
    frozen at it. On clustered corpora the refined centroids converge
    toward the cluster projections, so quantization error collapses to
    within-cluster noise and recall becomes a SHARP regression signal —
    the clustered-fixture floor test pins the reranked value (vs the
    sampled codebook's insensitive 0.3). Cross-engine determinism: the
    per-cluster mean (the only order-sensitive reduction in training)
    is quantized to 2^-16 on both engines, so codebooks, assignments
    and ADC sums compare exactly. At 100 TB training runs on a bounded
    sample with ≤ m*n_cents broadcast centroid rows per step; encode
    and scan keep the production PQ plan shape (broadcast map + lookup
    sum, no shuffle grows with the corpus)."""
    from market_microstructure_toolkit_spark.operators.similarity import (
        pq_adc_scores,
        pq_train_codebooks,
    )

    emb = _emb(spark, sf_dir).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # the recall measurement references the ADC lineage four ways
    # (top-10, candidates, and their joins); without a cut the 2-step
    # training chain re-executes per reference. The codebook is ≤
    # m x n_cents = 1024 tiny rows — the repo's justified-checkpoint
    # shape (bounded, reused, expensive to recompute)
    cents = pq_train_codebooks(
        emb,
        m=_PQ_M,
        sub_dim=_PQ_SUB,
        n_cents=_PQ_TRAINED_C,
        steps=_PQ_TRAINED_STEPS,
    ).localCheckpoint(eager=True)
    adc = pq_adc_scores(
        emb,
        m=_PQ_M,
        sub_dim=_PQ_SUB,
        n_cents=_PQ_TRAINED_C,
        query_vec_id=0,
        cents_sub=cents,
    )
    return _recall_from_adc(adc, spark, sf_dir, n_cand=1000)


_EMB_LABEL_SQL = """
WITH emb AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
dims AS (
  SELECT vec_id, label, u.i AS dim, v[u.i] AS x
  FROM emb, UNNEST(range(1, 65)) u(i)
),
cent AS (
  SELECT label, dim, AVG(x) AS c FROM dims GROUP BY label, dim
),
scored AS (
  SELECT d.vec_id, d.label,
         SUM(d.x * c.c) AS dot,
         SQRT(SUM(d.x * d.x)) AS nv,
         SQRT(SUM(c.c * c.c)) AS nc
  FROM dims d JOIN cent c USING (label, dim)
  GROUP BY d.vec_id, d.label
)
SELECT label,
       COUNT(*) AS n_vectors,
       ROUND(AVG(floor(dot / (nv * nc) * 67108864.0 + 0.5) / 67108864.0), 6) AS mean_cos_to_centroid,
       ROUND(MIN(dot / (nv * nc)), 6) AS min_cos_to_centroid
FROM scored GROUP BY label
"""


@register("embedding_label_centroids", _EMB_LABEL_SQL)
def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding cohesion report — the sanity check a
    labeled-embedding corpus needs before the labels are trusted for
    training splits or stratified sampling: each label's centroid
    (element-wise mean over an exploded (label, dim) aggregate — no
    driver-side vectors) and each member's cosine to it, reduced to
    mean/min per label. Dim-exploded rows are 64x the vector count but
    map-side partial-aggregated on (label, dim) before the shuffle;
    the per-vector rescore is one co-keyed join. The outer mean runs
    over 2^-26-quantized cosines (exact in any accumulation order,
    ADVICE r7); both cosine reductions round at 6 dp.
    On the iid fixture cohesion is near zero by construction; the gate
    pins the MACHINERY (a real corpus shows real separation)."""
    emb = _emb(spark, sf_dir).select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode("v").alias("dim0", "x"),
    ).select("vec_id", "label", (F.col("dim0") + 1).alias("dim"), "x")
    cent = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    scored = (
        dims.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("x") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nv"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc"),
        )
    )
    cos = F.col("dot") / (F.col("nv") * F.col("nc"))
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(q2k_col(cos, 26)), 6).alias("mean_cos_to_centroid"),
        F.round(F.min(cos), 6).alias("min_cos_to_centroid"),
    )


_HARD_NEG_SQL = """
WITH probes AS (
  SELECT vec_id AS qid, label AS qlabel, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id <= 1550
),
scored AS (
  SELECT p.qid, e.vec_id, e.label,
         ROUND(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), p.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(p.qv, p.qv))),
           6) AS cos_sim
  FROM embeddings e, probes p
  WHERE e.label <> p.qlabel
)
SELECT qid, rk AS rank, vec_id, label, cos_sim
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY cos_sim DESC, vec_id) AS rk
  FROM scored
)
WHERE rk <= 5
"""


@register("embedding_hard_negatives", _HARD_NEG_SQL)
def q_embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe
    vector (every 50th id), the 5 most-similar vectors with a DIFFERENT
    label — the near-misses that make the best negatives (the easy,
    dissimilar ones teach nothing). The probe set is CONFIG-SIZED (at
    most 32 ids: every 50th id up to 1550 — mining runs per bounded
    probe batch, never per unbounded corpus slice), broadcasts, and
    scoring is one map-side pass over the corpus; rank is a probe-keyed
    window (probe-count partitions, never global). At full scale the
    same contract swaps the brute-force scorer for the IVF path
    (similarity_ivf) — this gate is the exact baseline that path is
    measured against. Cosine rounded 6dp (dot-product reorder), rank
    ties broken by vec_id."""
    emb = _emb(spark, sf_dir)
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    emb_d = emb.select("vec_id", "label", vec_d.alias("v"))
    probes = F.broadcast(
        emb_d.filter(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") <= 1550)
        ).select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("v").alias("qv"),
        )
    )
    scored = (
        emb_d.crossJoin(probes)
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            "vec_id",
            "label",
            F.round(
                A.dot("v", "qv") / (A.l2_norm("v") * A.l2_norm("qv")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "rank", "vec_id", "label", "cos_sim")
    )
