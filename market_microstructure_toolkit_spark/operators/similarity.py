"""Similarity search over embedding columns (``array<float>``).

Two tiers (SURVEY north star / BASELINE.json):

- ``cosine_topk``: brute-force exact top-k vs a query vector — broadcast
  the query, score as a shuffle-free map (zip_with dot product), single
  top-k reduce. The correctness baseline at any scale where a full scan
  is acceptable.
- ``lsh_bucketed_pairs``: sign-LSH bucketing — each vector keys on the
  sign pattern of ``n_bits`` chosen coordinates (a fixed axis-aligned
  hyperplane family: deterministic, portable, seedless); near neighbors
  collide with high probability, and pairwise scoring runs only WITHIN
  buckets. This is the 100 TB path: the crossJoin becomes a bucket-keyed
  shuffle join, |bucket|^2 work instead of n^2.

An IVF variant (k-means coarse quantizer) would slot in the same shape:
assign -> bucket-join -> rerank; omitted because the container has no
trained centroids — the LSH family demonstrates the identical plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def sign_bucket(vec: Column | str, n_bits: int = 8) -> Column:
    """Sign-pattern bucket id over the first ``n_bits`` coordinates:
    sum of 2^i over coordinates with value > 0."""
    v = F.col(vec) if isinstance(vec, str) else vec
    terms = [
        F.when(F.element_at(v, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def lsh_bucketed_pairs(
    df: DataFrame,
    n_bits: int = 8,
    min_cosine: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-neighbor candidate pairs within sign-LSH buckets, scored by
    exact cosine. Returns (id_a < id_b, bucket, cos_sim >= min_cosine)."""
    keyed = df.select(
        F.col(id_col),
        as_double(vec_col).alias("v"),
        sign_bucket(as_double(vec_col), n_bits).alias("bucket"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.bucket").alias("bucket"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cosine)
    )
