"""Similarity search over embedding columns (``array<float>``).

Two tiers (SURVEY north star / BASELINE.json):

- ``cosine_topk``: brute-force exact top-k vs a query vector — broadcast
  the query, score as a shuffle-free map (zip_with dot product), single
  top-k reduce. The correctness baseline at any scale where a full scan
  is acceptable.
- ``lsh_banded_pairs``: banded sign-LSH bucketing — each vector keys,
  per band, on the sign pattern of ``bits_per_band`` coordinates (a
  fixed axis-aligned hyperplane family: deterministic, portable,
  seedless); near neighbors collide in some band with high probability,
  and pairwise scoring runs only WITHIN (band, bucket) groups, hot
  groups dropped by ``max_bucket``. This is the 100 TB path: the
  crossJoin becomes a bucket-keyed shuffle join, bounded |bucket|^2
  work instead of n^2. Every embedding-similarity query in the repo
  routes through this one generator — there is deliberately no
  capless / single-band variant.

An IVF variant (k-means coarse quantizer) would slot in the same shape:
assign -> bucket-join -> rerank; omitted because the container has no
trained centroids — the LSH family demonstrates the identical plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark.functions.arrays import cosine, dot, l2_norm


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_vec: DataFrame,
    k: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a 1-row query frame (column ``qv``).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — per-partition
    partial top-k merged at the driver, no single-partition sort — which is
    the only global-rank shape that survives a 100 TB scan. (A global
    ``row_number`` window would funnel every scored row through one task.)
    """
    emb = df.select(F.col(id_col), as_double(vec_col).alias("v"))
    scored = emb.crossJoin(F.broadcast(query_vec)).select(
        id_col, cosine("v", "qv").alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def sign_bucket(vec: Column | str, n_bits: int = 8, offset: int = 0) -> Column:
    """Sign-pattern bucket id over ``n_bits`` coordinates starting at
    ``offset``: sum of 2^i over coordinates with value > 0."""
    v = F.col(vec) if isinstance(vec, str) else vec
    terms = [
        F.when(F.element_at(v, offset + i + 1) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i in range(n_bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


#: expected-occupancy target for ``auto`` band sizing: the smallest bit
#: width keeping E[|bucket|] = n / 2^bits at or below this. 100 keeps
#: per-bucket pair work at C(100,2) ~ 5k rows and total candidate pairs
#: ~ n_bands * occ * n — LINEAR in corpus size until the bit ceiling.
AUTO_TARGET_OCC = 100


def auto_bits_per_band(
    n_rows: int, n_bands: int = 4, dim: int = 64
) -> int:
    """Corpus-size-adaptive sign-LSH band width (round-9 decade fix).

    A FIXED bucket space is a quadratic time bomb: with 4x8 bits the
    1024 (band, bucket) groups fill linearly with corpus size, so
    candidate pairs grow as n^2/1024 — measured 31k -> 3.1M -> 312M
    pairs across sf0.1 -> sf1 -> sf10 (2k -> 200k vectors), the last
    OOMing a 128 GB heap. The guard cap (1000/bucket) never fires on
    uniform mass: occupancy at sf10 was 781-914, just under it.

    Returns the smallest ``bits`` in [8, min(16, dim // n_bands)] with
    ``n_rows <= AUTO_TARGET_OCC * 2^bits`` — integer thresholds (25 600,
    51 200, 102 400, ... at the defaults), NOT a float log2, so the
    DuckDB oracles can reproduce the choice with an exact CASE chain.
    At the ceiling (n > 100 * 2^16 ~ 6.5M at 64 dims / 4 bands) the
    sign family's resolution is exhausted: beyond it, raise ``dim``,
    chain an IVF coarse quantizer in front (see module docstring), or
    accept occupancy growth bounded by ``max_bucket``.
    """
    hi = min(16, dim // n_bands)
    bits = 8
    while bits < hi and n_rows > AUTO_TARGET_OCC << bits:
        bits += 1
    return bits


def lsh_keyed(
    df: DataFrame,
    bits_per_band: int | str = 8,
    n_bands: int = 4,
    max_bucket: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """The bucketing stage of :func:`lsh_banded_pairs`, exposed so
    stage-level instrumentation (``tools/nn_decompose.py``, round-10
    verdict #6) times the exact lineage the pair stage consumes.
    Returns (id, v, nrm, band, bucket) with hot buckets already dropped.

    The per-vector norm folds HERE — once per vector, before the band
    explode — not per pair: the per-pair cosine used to fold both
    operands' norms per pair, 3 x dim multiply-adds times
    O(occupancy x n x bands) pairs; precomputing leaves one dot fold
    per pair at a bit-identical value (same l2_norm expression over the
    same array; measured walls in docs/SCALE_NOTES.md)."""
    if bits_per_band == "auto":
        # ``n_rows`` is the caller's metadata hint (parquet footer
        # rowcount for raw-table inputs — free); without it, one
        # column-pruned count job measures the frame (round 13: every
        # gate passes the hint, so the per-invocation count job is gone)
        if n_rows is None:
            n_rows = df.count()
        bits_per_band = auto_bits_per_band(n_rows, n_bands=n_bands)
    v = as_double(vec_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                sign_bucket(v, bits_per_band, j * bits_per_band).alias(
                    "bucket"
                ),
            )
            for j in range(n_bands)
        ]
    )
    keyed = df.select(
        F.col(id_col),
        v.alias("v"),
        l2_norm(v).alias("nrm"),
        F.explode(bands).alias("bb"),
    ).select(
        id_col,
        "v",
        "nrm",
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    if max_bucket is not None:
        # count window riding the bucket shuffle the pair stage needs
        # anyway — an aggregate + semi-join would re-evaluate the keyed
        # lineage per branch (no CSE across self-join/semi-join branches)
        keyed = (
            keyed.withColumn(
                "__n",
                F.count(F.lit(1)).over(Window.partitionBy("band", "bucket")),
            )
            .filter(F.col("__n") <= max_bucket)
            .drop("__n")
        )
    return keyed


def lsh_banded_pairs(
    df: DataFrame,
    bits_per_band: int | str = 8,
    n_bands: int = 4,
    min_cosine: float = 0.0,
    max_bucket: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Banded multi-probe sign-LSH: the 100 TB candidate generator.

    Band j buckets on the sign pattern of coordinates
    ``[j*bits_per_band, (j+1)*bits_per_band)``; a pair is a candidate if
    it collides in ANY band (union, dedup'd). Versus the single-band
    variant this fixes both scale gaps:

    - Parallelism / pair volume: the shuffle keys on (band, bucket) —
      ``n_bands * 2^bits_per_band`` keys (4x8 -> 1024) instead of 2^8 =
      256 global buckets, and each +1 bit halves expected bucket size.
      At larger corpora raise ``bits_per_band``: pair work scales with
      sum over buckets of |bucket|^2, so bucket occupancy — not corpus
      size — sets the join cost.
    - Hot buckets: ``max_bucket`` drops (band, bucket) groups larger
      than the cap BEFORE the self-join (a degenerate bucket of d
      near-identical vectors fans d^2/2 rows; such clusters belong to
      exact/MinHash dedup, not ANN candidate generation). Same hot-key
      guard as winnow/ngram dedup.

    Recall control: collide-in-any-band makes false negatives fall
    exponentially with ``n_bands`` (same geometry as the MinHash band
    construction, reference parity: dedup.py banding).

    Returns (id_a < id_b, cos_sim >= min_cosine), scored by exact cosine
    once per surviving pair.

    ``bits_per_band="auto"`` sizes the band width from the corpus row
    count via :func:`auto_bits_per_band` (one cheap count job — parquet
    footer metadata for raw-table inputs). This is the scale path: a
    fixed width is quadratic in corpus size (see auto_bits_per_band);
    every gate routing through this generator uses auto.
    """
    keyed = lsh_keyed(
        df,
        bits_per_band=bits_per_band,
        n_bands=n_bands,
        max_bucket=max_bucket,
        id_col=id_col,
        vec_col=vec_col,
        n_rows=n_rows,
    )
    # postings-list pair generation: one evaluation of the keyed lineage,
    # pairs emitted map-side after the bucket groupBy; group size (and so
    # the collected vector array) is bounded by max_bucket
    from market_microstructure_toolkit_spark.operators.dedup import grouped_pairs

    scored = grouped_pairs(
        keyed,
        ["band", "bucket"],
        F.struct(F.col(id_col).alias("id"), "v", "nrm"),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.when(
            (F.col("a.nrm") > 0) & (F.col("b.nrm") > 0),
            dot(F.col("a.v"), F.col("b.v"))
            / (F.col("a.nrm") * F.col("b.nrm")),
        ).alias("cos_sim"),
    )
    # a pair colliding in k bands appears k times with an identical score;
    # min() dedups deterministically without a second join
    return (
        scored.groupBy("id_a", "id_b")
        .agg(F.min("cos_sim").alias("cos_sim"))
        .filter(F.col("cos_sim") >= min_cosine)
    )


def pq_adc_scores(
    emb: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    n_cents: int = 16,
    query_vec_id: int = 0,
    cents_sub: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization compression + asymmetric-distance scoring
    (Jégou, Douze & Schmid 2011) over an (vec_id, label, v:
    array<double>) frame: every vector encodes once to ``m`` one-byte
    subspace codes (argmin vs ``n_cents`` broadcast centroids per
    subspace — centroids are vectors 1..n_cents, the repo's sampled-
    codebook convention; a trained k-means slots in identically), and
    the query (``query_vec_id``) scans the corpus by summing ``m``
    lookups from its broadcast ``m x n_cents`` distance table. At
    100 TB this is the layout that keeps the index in memory: 64
    float32 dims -> ``m`` bytes per vector, encode a broadcast map
    stage, the scan a shuffle-free lookup-sum. The query's table
    entries are quantized to 2^-20 multiples so the m-term ADC sum is
    exact in ANY aggregation order — rankings hash-stable with no
    rounding. Extracted from the similarity_pq_* gates (round-6
    verdict #2); their DuckDB oracles pin this exact code.

    Optional ``cents_sub`` overrides the sampled codebook with TRAINED
    per-subspace centroids — a (m, cid, scv: array<double>[sub_dim])
    frame such as :func:`pq_train_codebooks` returns (round-10 verdict
    #4: sampled codebooks leave the PQ recall floor insensitive even on
    clustered data; a trained codebook quantizes the cluster structure
    and recall becomes a sharp regression signal).

    Returns (vec_id, label, adc_dist) for every corpus vector."""
    m_col = F.explode(F.sequence(F.lit(1), F.lit(m))).alias("m")
    sub = f"slice(v, (m - 1) * {sub_dim} + 1, {sub_dim})"
    csub = f"slice(cv, (m - 1) * {sub_dim} + 1, {sub_dim})"
    if cents_sub is None:
        cents = emb.filter(F.col("vec_id").between(1, n_cents)).select(
            F.col("vec_id").alias("cid"), F.col("v").alias("cv")
        )
        cents_sub = cents.select(
            "cid", F.explode(F.sequence(F.lit(1), F.lit(m))).alias("m"), "cv"
        ).select("cid", "m", F.expr(csub).alias("scv"))
    subs = emb.select("vec_id", "label", m_col, "v").select(
        "vec_id", "label", "m", F.expr(sub).alias("sv")
    )
    fold = F.aggregate(
        F.zip_with("sv", "scv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = subs.join(F.broadcast(cents_sub), "m").select(
        "vec_id", "label", "m", "cid", fold.alias("dist")
    )
    # argmin via min(struct(dist, cid)): identical row to the former
    # row_number-over-(dist, cid) window (cid is unique per group, so the
    # struct order is total and the pick deterministic), but the n_cents
    # candidate rows per (vec, m) collapse MAP-SIDE in the partial
    # aggregate — the broadcast join leaves them colocated — so the
    # exchange moves 1/n_cents the rows and the per-group sort is gone
    # (round 13, guide §2.3 "aggregate before you shuffle")
    codes = (
        d.groupBy("vec_id", "label", "m")
        .agg(F.min(F.struct("dist", "cid")).alias("__mn"))
        .select("vec_id", "label", "m", F.col("__mn.cid").alias("cid"))
    )
    dq = d.filter(F.col("vec_id") == query_vec_id).select(
        "m",
        "cid",
        (
            F.floor(F.col("dist") * F.lit(1048576.0) + F.lit(0.5))
            / F.lit(1048576.0)
        ).alias("qd"),
    )
    return (
        codes.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(dq), ["m", "cid"])
        .groupBy("vec_id", "label")
        .agg(F.sum("qd").alias("adc_dist"))
    )


def pq_train_codebooks(
    emb: DataFrame,
    m: int = 8,
    sub_dim: int = 8,
    n_cents: int = 16,
    steps: int = 2,
) -> DataFrame:
    """Lloyd-refined PQ codebooks (round-10 verdict #4): the sampled
    codebook (vectors 1..n_cents) is only the INIT; each step assigns
    every vector's subvector to its nearest per-subspace centroid and
    recomputes each live centroid as the cluster's elementwise mean,
    QUANTIZED to 2^-16 multiples — the repo's cross-engine determinism
    pattern. The mean is the single order-sensitive reduction in the
    loop; quantizing it several orders of magnitude above double
    reordering error makes Spark and the DuckDB oracle land on
    bit-identical codebooks, so every downstream assignment/ADC compare
    is exact. Boundary assumption (round-11 ADVICE #2, accepted): the
    rounding is only deterministic while the partition-order float
    error of ``avg`` (~1e-13 relative) stays far from a
    ``(k + 0.5) / 65536`` rounding boundary (~7.6e-6 spacing) — a
    cluster mean landing within ~1e-12 of a boundary could quantize
    differently across runs/engines and cascade into different
    codebooks. Measured green across every sweep (sf0.001..sf1, both
    engines, repeated runs); the exact-sum alternative (quantize inputs
    first, mean = exact-binary sum / count) is the upgrade path if a
    boundary hit is ever observed. Centroids that starve (no assigned vectors) drop out of
    the group-by on BOTH engines identically — fewer live centroids,
    same semantics.

    At 100 TB this is the standard production shape: train on a bounded
    sample (here the corpus IS the sample), broadcast the ≤ m*n_cents
    centroid rows each step, one aggregation per step — no stage's
    output grows with corpus size except the linear assignment scan.

    Returns (m, cid, scv: array<double>[sub_dim])."""
    sub = f"slice(v, (m - 1) * {sub_dim} + 1, {sub_dim})"
    csub = f"slice(cv, (m - 1) * {sub_dim} + 1, {sub_dim})"
    subs = emb.select(
        "vec_id", F.explode(F.sequence(F.lit(1), F.lit(m))).alias("m"), "v"
    ).select("vec_id", "m", F.expr(sub).alias("sv"))
    cents_sub = (
        emb.filter(F.col("vec_id").between(1, n_cents))
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        .select(
            "cid", F.explode(F.sequence(F.lit(1), F.lit(m))).alias("m"), "cv"
        )
        .select("m", "cid", F.expr(csub).alias("scv"))
    )
    fold = F.aggregate(
        F.zip_with("sv", "scv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for _ in range(steps):
        d = subs.join(F.broadcast(cents_sub), "m").select(
            "vec_id", "m", "cid", "sv", fold.alias("dist")
        )
        # argmin via min(struct(dist, cid, sv)) — same row as the former
        # row_number window ((dist, cid) is already total; sv rides along
        # and never participates in a tie), candidates collapse map-side,
        # no per-group sort (round 13, guide §2.3)
        assign = (
            d.groupBy("vec_id", "m")
            .agg(F.min(F.struct("dist", "cid", "sv")).alias("__mn"))
            .select(
                "vec_id",
                "m",
                F.col("__mn.cid").alias("cid"),
                F.col("__mn.sv").alias("sv"),
            )
        )
        cents_sub = assign.groupBy("m", "cid").agg(
            F.array(
                *[
                    F.floor(
                        F.avg(F.col("sv")[i]) * F.lit(65536.0) + F.lit(0.5)
                    )
                    / F.lit(65536.0)
                    for i in range(sub_dim)
                ]
            ).alias("scv")
        )
    return cents_sub


def ivf_centroid_dists(emb: DataFrame, n_cents: int = 8) -> DataFrame:
    """Vector-to-centroid squared-L2 distances for an IVF coarse
    quantizer (centroids = vectors 1..n_cents, broadcast — a trained
    k-means slots in identically). Shared input for single- and
    multi-probe IVF: the argmin assigns cells, the query's slice ranks
    probe candidates. Extracted from the similarity_ivf* gates."""
    cents = emb.filter(F.col("vec_id").between(1, n_cents)).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    dist = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "v", "cid", dist.alias("dist")
    )


def ivf_assign(dists: DataFrame) -> DataFrame:
    """Nearest-centroid cell assignment: argmin per vector over its
    centroid distances (ties break on cid for determinism).

    Implemented as ``min(struct(dist, cid, v))`` rather than a
    row_number window: identical pick ((dist, cid) is a total order per
    vector — cid is unique), but the n_cents candidate rows collapse in
    the map-side partial aggregate (the broadcast centroid join leaves
    them colocated), so the exchange moves one row per vector and the
    per-group sort disappears (round 13, guide §2.3)."""
    return (
        dists.groupBy("vec_id", "label")
        .agg(F.min(F.struct("dist", "cid", "v")).alias("__mn"))
        .select(
            "vec_id",
            "label",
            F.col("__mn.v").alias("v"),
            F.col("__mn.cid").alias("cid"),
        )
    )
