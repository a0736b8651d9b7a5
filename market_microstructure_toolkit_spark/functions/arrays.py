"""Higher-order array functions over price ladders.

The execution simulators' core primitive is "walk the book": consume levels
best->worse until a target quantity fills (reference ``impact.py:111-145``
``_walk_book``, ``impact_vwap.py:211-244`` ``_fill_slice``). In Spark that
greedy loop is a closed-form per-level expression — with ``cum_{i-1}`` the
size consumed before level i, each level's take is
``clamp(qty - cum_{i-1}, 0, size_i)`` — so one ``F.aggregate`` with a
struct accumulator computes filled qty, notional cost and levels touched in
a single codegen'd pass. No UDF, fully distributed, O(K) per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ladder_from_wide(side: str, depth: int) -> Column:
    """Wide level columns -> ``array<struct<price,size>>`` (best->worse)."""
    return F.array(
        *[
            F.struct(
                F.col(f"{side}{i}_price").cast("double").alias("price"),
                F.col(f"{side}{i}_size").cast("double").alias("size"),
            )
            for i in range(1, depth + 1)
        ]
    )


def valid_levels(ladder: Column) -> Column:
    """Skip-and-continue blank handling (impact.py:74-108): drop levels with
    missing price/size or non-positive size, keep the rest in order."""
    return F.filter(
        ladder,
        lambda e: e["price"].isNotNull()
        & e["size"].isNotNull()
        & (e["size"] > 0),
    )


def truncate_at_first_blank(ladder: Column) -> Column:
    """Stop-at-first-blank handling (impact_twap.py:65-98): keep only the
    prefix before the first missing/non-positive level.

    Implemented as a prefix-length scan: an aggregate that counts leading
    valid levels (a struct accumulator ``(n, stopped)``), then ``slice``.
    """
    prefix_len = F.aggregate(
        ladder,
        F.struct(F.lit(0).alias("n"), F.lit(False).alias("stopped")),
        lambda acc, e: F.struct(
            F.when(
                ~acc["stopped"]
                & e["price"].isNotNull()
                & e["size"].isNotNull()
                & (e["size"] > 0),
                acc["n"] + 1,
            )
            .otherwise(acc["n"])
            .alias("n"),
            (
                acc["stopped"]
                | e["price"].isNull()
                | e["size"].isNull()
                | (e["size"] <= 0)
            ).alias("stopped"),
        ),
        lambda acc: acc["n"],
    )
    return F.slice(ladder, F.lit(1), prefix_len)


def walk_book(ladder: Column, qty: Column | float) -> Column:
    """Greedy fill of ``qty`` against a (already-validated) ladder.

    Returns ``struct<filled:double, cost:double, levels_touched:int>`` where
    ``cost = sum(take_i * price_i)`` — the fill VWAP is ``cost / filled``
    (NULL-guarded by callers when filled == 0, matching ``_fills_vwap``
    impact.py:148-163). Partial fills allowed; never consumes beyond the
    ladder (impact.py:111-145).
    """
    q = F.lit(float(qty)) if isinstance(qty, (int, float)) else qty
    zero = F.lit(0.0)
    return F.aggregate(
        ladder,
        F.struct(
            zero.alias("filled"),
            zero.alias("cost"),
            F.lit(0).alias("levels_touched"),
            q.cast("double").alias("remaining"),
        ),
        lambda acc, e: F.struct(
            (acc["filled"] + F.least(acc["remaining"], e["size"])).alias("filled"),
            (acc["cost"] + F.least(acc["remaining"], e["size"]) * e["price"]).alias(
                "cost"
            ),
            (
                acc["levels_touched"]
                + F.when(
                    F.least(acc["remaining"], e["size"]) > 0, F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("levels_touched"),
            F.greatest(
                acc["remaining"] - e["size"], zero
            ).alias("remaining"),
        ),
        lambda acc: F.struct(
            acc["filled"].alias("filled"),
            acc["cost"].alias("cost"),
            acc["levels_touched"].alias("levels_touched"),
        ),
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two double arrays via ``zip_with`` + ``aggregate``."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of a double array."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is 0."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))
