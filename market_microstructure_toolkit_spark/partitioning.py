"""Partition-shaping helpers.

``spread`` guards expression-heavy stages (hashing, shingling, per-row
media decode) against under-partitioned inputs. On a real cluster a big
table arrives in thousands of file splits and this is a no-op; locally a
small single-file parquet otherwise serializes the whole stage onto one
core of local[32].
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *by: str, target: int | None = None) -> DataFrame:
    """Ensure at least ``target`` (default: defaultParallelism) partitions.

    With ``by`` columns, repartitions by hash of those keys so a following
    ``groupBy(*by)`` reuses the exchange instead of shuffling again. A
    DataFrame that already has enough partitions is returned untouched —
    this never *coalesces*, so at cluster scale (input already split) it
    costs nothing.
    """
    sess = df.sparkSession
    want = target or sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    if by:
        return df.repartition(want, *by)
    return df.repartition(want)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explicit salting for the case AQE's
    skew-join split can't fix (a single hot key exceeding one task even
    after splitting, e.g. a dominant symbol or a null-heavy key).

    The big/skewed side gets a deterministic per-row salt (hash of the
    whole row, so re-runs are stable); the small side is replicated
    ``n_salts`` times; the join key becomes ``(on..., salt)``, spreading
    one hot key across ``n_salts`` tasks. Output equals the plain join.
    """
    from pyspark.sql import functions as F

    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = lhs.join(rhs, keys + ["__salt"], how)
    return out.drop("__salt")
