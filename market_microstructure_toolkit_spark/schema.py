"""Parametric order-book snapshot schema and wide<->nested converters.

The reference's one fundamental table is a wide, flat, fixed-width-per-depth
snapshot row: 8 meta columns then ``bid{i}_price, bid{i}_size`` (i=1..K,
best->worse descending price) followed by ``ask{i}_price, ask{i}_size``
(best->worse ascending price); missing levels padded so every row has
identical width (reference ``record.py:32-52`` ``_meta_header`` /
``_header_for_depth``, padding ``record.py:74-84``).

Spark-first design: the wide form is the *interchange* format (what the
reference writes and what users have on disk); the *compute* format nests
each side as ``array<struct<price:double, size:double>>`` so every depth-K
operator is an O(1)-expression higher-order function (``aggregate`` /
``transform`` / ``filter``) instead of O(K) generated columns. Converters
are pure ``select`` projections — Catalyst prunes unused levels from the
parquet scan either way.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_COLS: tuple[str, ...] = (
    "ts_ms",
    "iso",
    "exchange_id",
    "symbol",
    "book_level",
    "raw_nonce",
    "best_bid",
    "best_ask",
)

#: Default partition keys for every series/window operator.
PARTITION_KEYS: tuple[str, ...] = ("exchange_id", "symbol")

LEVEL = StructType(
    [StructField("price", DoubleType()), StructField("size", DoubleType())]
)


def level_cols(depth: int) -> list[str]:
    """Level column names in reference header order (record.py:46-52)."""
    cols: list[str] = []
    for side in ("bid", "ask"):
        for i in range(1, depth + 1):
            cols.append(f"{side}{i}_price")
            cols.append(f"{side}{i}_size")
    return cols


def book_header(depth: int) -> list[str]:
    """Full wide header: 8 meta + 4*depth level columns."""
    return list(META_COLS) + level_cols(depth)


def book_schema(depth: int) -> StructType:
    """Wide snapshot schema for a given depth K (8 + 4K columns)."""
    fields = [
        StructField("ts_ms", LongType()),
        StructField("iso", StringType()),
        StructField("exchange_id", StringType()),
        StructField("symbol", StringType()),
        StructField("book_level", StringType()),
        StructField("raw_nonce", LongType()),
        StructField("best_bid", DoubleType()),
        StructField("best_ask", DoubleType()),
    ]
    fields += [StructField(c, DoubleType()) for c in level_cols(depth)]
    return StructType(fields)


def nested_book_schema() -> StructType:
    """Nested compute schema: meta + bids/asks arrays of (price, size)."""
    fields = list(book_schema(0).fields)
    fields.append(StructField("bids", ArrayType(LEVEL)))
    fields.append(StructField("asks", ArrayType(LEVEL)))
    return StructType(fields)


_LEVEL_RE = re.compile(r"^(bid|ask)(\d+)_price$")


def infer_depth(df: DataFrame) -> int:
    """Recover K from a wide frame's columns.

    Schema-based analog of the reference's probe-until-missing loop
    (``impact_twap.py:78-98``) — reads ``df.schema`` instead of data.
    """
    depth = 0
    for c in df.columns:
        m = _LEVEL_RE.match(c)
        if m:
            depth = max(depth, int(m.group(2)))
    return depth


def require_columns(df: DataFrame, cols: list[str] | tuple[str, ...]) -> None:
    """Fail fast with every missing column listed (P18, reference
    ``event_metrics.py:18-22`` ``_require_cols``) — schema validation
    before building a plan beats an UNRESOLVED_COLUMN error mid-query."""
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"missing required columns: {missing}; have {sorted(df.columns)}"
        )


def side_array(side: str, depth: int) -> Column:
    """Build ``array<struct<price,size>>`` from wide level columns."""
    return F.array(
        *[
            F.struct(
                F.col(f"{side}{i}_price").cast("double").alias("price"),
                F.col(f"{side}{i}_size").cast("double").alias("size"),
            )
            for i in range(1, depth + 1)
        ]
    )


def to_nested(df: DataFrame, depth: int | None = None) -> DataFrame:
    """Wide -> nested: pack level columns into ``bids``/``asks`` arrays."""
    k = depth or infer_depth(df)
    keep = [c for c in df.columns if not re.match(r"^(bid|ask)\d+_", c)]
    return df.select(
        *keep,
        side_array("bid", k).alias("bids"),
        side_array("ask", k).alias("asks"),
    )


def to_wide(df: DataFrame, depth: int) -> DataFrame:
    """Nested -> wide: unpack arrays into reference-ordered level columns."""
    keep = [c for c in df.columns if c not in ("bids", "asks")]
    proj: list[Column] = [F.col(c) for c in keep]
    for side, arr in (("bid", "bids"), ("ask", "asks")):
        for i in range(1, depth + 1):
            # element_at is 1-based; out-of-range -> NULL (pad semantics).
            lvl = F.element_at(F.col(arr), i)
            proj.append(lvl["price"].alias(f"{side}{i}_price"))
            proj.append(lvl["size"].alias(f"{side}{i}_size"))
    return df.select(*proj)
