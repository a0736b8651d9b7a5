"""Shared gate-registry infrastructure: the REGISTRY, the register
decorator (required-conf wrapper), scratch/tape helpers for streaming
replays, fixture loaders, and the SQL fragments shared across domains.
Split out of the former plans/queries.py monolith (round-6 verdict #2);
see plans/queries.py for the determinism rules every oracle follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from market_microstructure_toolkit_spark.functions import arrays as A
from market_microstructure_toolkit_spark.plans.book import book_sql
from market_microstructure_toolkit_spark.plans.book import synthetic_book
from market_microstructure_toolkit_spark.plans.book import synthetic_trades
from market_microstructure_toolkit_spark.plans.book import trades_sql
from collections.abc import Callable
from dataclasses import dataclass


KEYS = ("exchange_id", "symbol")


IDS = ["exchange_id", "symbol", "ts_ms", "raw_nonce"]


_BOOK_CTE = f"WITH book AS ({book_sql()})"


_W = "PARTITION BY exchange_id, symbol ORDER BY ts_ms, raw_nonce"


@dataclass(frozen=True)


class QueryDef:
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None -> rows-only check (non-SQL-expressible)


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, sql: str | None):
    """Register a gate query; the stored callable is wrapped so required
    runtime confs (nanos-parquet reads, UTC tz) are applied to WHATEVER
    SparkSession the harness passes in — gate queries must never depend on
    the repo's own session factory having built the session."""

    def deco(fn):
        import functools

        from market_microstructure_toolkit_spark.session import (
            ensure_session_confs,
        )

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(spark=wrapped, sql=sql)
        return fn

    return deco


def q2k_col(c, k: int):
    """Quantize a double Column to multiples of 2^-k (round-half-up via
    floor(x*2^k + 0.5)) BEFORE an order-sensitive sum/mean: sums of such
    binary fractions are exact in ANY accumulation order (while partial
    sums stay under 2^(53-k)), so AVG/SUM reductions stop being one-ulp-
    from-a-ROUND-boundary time bombs (ADVICE r7: a raw ROUND(AVG(double),
    6) survives rounds by luck until any partition/order change flips a
    boundary value). Pick k so quantum << value scale and
    n_rows * max|value| < 2^(53-k)."""
    s = float(2**k)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def q2k_sql(expr: str, k: int) -> str:
    """DuckDB twin of :func:`q2k_col` (bare decimal literal is fine in
    DuckDB; Spark-side code must use q2k_col, not this string)."""
    s = 2**k
    return f"floor(({expr}) * {s}.0 + 0.5) / {s}.0"


def parquet_rows(path: str) -> int:
    """Footer-only rowcount for a parquet file OR directory of part
    files — a metadata pull (no Spark job, no data scan), the same
    signal ``_tape_parts`` sizes streaming state by. Used to size-
    dispatch the plain-vs-segmented window paths per key."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    files = (
        sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if _os.path.isdir(path)
        else [path]
    )
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def book_rows_per_key(sf_dir: str) -> int:
    """Approximate per-(exchange, symbol) rowcount of the synthetic book:
    events footer rowcount over its 4 uniform symbols (user_id % 4)."""
    return parquet_rows(f"{sf_dir}/events.parquet") // 4


def _tape_parts(spark, glob_path: str, hi: int, per_part: int = 50_000) -> str:
    """Replay partitions for a tape already on disk: parquet footer
    rowcount (metadata-only) scaled at per_part rows/partition, clamped
    [2, hi]. ``hi`` encodes the replay's key cardinality ceiling — an
    instrument-keyed state op (4 symbols) gains nothing past 4 state
    partitions, while extra partitions cost a Python worker spin-up
    per micro-batch each (measured both ways: 8 partitions on sf0.1
    tapes wasted ~2.4s/gate on spin-up; 2 partitions at sf1 halved the
    state throughput — size-adaptive is the only setting that survives
    both)."""
    n = spark.read.parquet(glob_path).count()
    return _stream_parts(n, per_part=per_part, lo=2, hi=hi)


def _stream_parts(n_rows: int, per_part: int = 50_000, lo: int = 8, hi: int = 32) -> str:
    """Shuffle/state partition count for a DATA-KEYED streaming replay
    (dedup on content hash, CDC on doc_id): scale with input size
    instead of pinning a constant. The sf10 decade probe showed the
    failure mode: 5M docs through 8 fixed state partitions turned the
    CDC replay's decade ratio super-linear (6.4x for 10x data) — a
    parallelism ceiling, not a plan defect. Instrument-keyed replays
    (4 symbols) stay at a small constant instead; a real cluster sizes
    this by key cardinality x executor count."""
    return str(max(lo, min(hi, (n_rows + per_part - 1) // per_part)))


def _scratch(prefix: str) -> str:
    """Scratch dir for replay chunks / checkpoints / roundtrip files.

    Prefers the /dev/shm tmpfs when present: gate replays are ephemeral
    by construction, so the checkpoint's durability guarantee buys
    nothing here and the disk round-trip is pure overhead. A production
    stream points checkpointLocation at durable storage instead.
    """
    import os
    import tempfile

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def _stamp_batch_order(*dirs: str) -> None:
    """Pin the micro-batch replay order: give every file under each dir
    an explicit mtime, strictly increasing by 2s per dir in argument
    order. Spark's file stream source orders files by modification time,
    and the 0.05s-sleep-between-writes this replaces is undefined on
    filesystems with coarse (>=1s) mtime granularity — for the watermark
    gates a flipped batch order changes the accepted/dropped sets and
    breaks the oracle hash."""
    import os
    import time

    t0 = time.time()
    for i, d in enumerate(dirs):
        ts = t0 + 2.0 * i
        for root, _, files in os.walk(d):
            for fn in files:
                os.utime(os.path.join(root, fn), (ts, ts))


_TAPE_MEMO: dict[tuple[str, str], str] = {}


def _memo_tape(sf_dir: str, kind: str, build) -> str:
    """Memoized replay tape: ``build(base)`` writes the micro-batch
    chunk dirs under ``base`` and returns them in batch order (they get
    mtime-stamped here). Tapes are pure functions of (sf_dir, kind), so
    one process writes each once; checkpoints must stay PER-RUN (a
    reused checkpoint replays committed offsets and emits nothing)."""
    key = (sf_dir, kind)
    hit = _TAPE_MEMO.get(key)
    if hit:
        return hit
    base = _scratch(prefix=f"mmt_tape_{kind}_")
    _stamp_batch_order(*build(base))
    _TAPE_MEMO[key] = base
    return base


def _split2(df: DataFrame, ts_col: str, base: str) -> list[str]:
    """Write ``df`` as two chunks split at the midpoint of its
    ``ts_col`` range (chunk a = earlier half for EVERY key, so
    micro-batch 2 genuinely depends on batch-1 state). ``persist()``
    bounds the build to one derivation scan instead of three."""
    df = df.persist()
    try:
        rng = df.agg(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).collect()[0]
        split = (rng["lo"] + rng["hi"]) // 2
        df.filter(F.col(ts_col) <= split).coalesce(1).write.parquet(
            f"{base}/data/a"
        )
        df.filter(F.col(ts_col) > split).coalesce(1).write.parquet(
            f"{base}/data/b"
        )
    finally:
        df.unpersist()
    return [f"{base}/data/a", f"{base}/data/b"]


def _split3(df: DataFrame, ts_col: str, base: str) -> list[str]:
    """Three chunks at the thirds of the ``ts_col`` range (the shape the
    watermark gates need: Spark 4.1 plans batch N's late filter with
    batch N-1's watermark, so late-data semantics need >= 3 batches)."""
    df = df.persist()
    try:
        rng = df.agg(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).collect()[0]
        lo, hi = rng["lo"], rng["hi"]
        c1, c2 = lo + (hi - lo) // 3, lo + 2 * ((hi - lo) // 3)
        df.filter(F.col(ts_col) <= c1).coalesce(1).write.parquet(
            f"{base}/data/a"
        )
        df.filter(
            (F.col(ts_col) > c1) & (F.col(ts_col) <= c2)
        ).coalesce(1).write.parquet(f"{base}/data/b")
        df.filter(F.col(ts_col) > c2).coalesce(1).write.parquet(
            f"{base}/data/c"
        )
    finally:
        df.unpersist()
    return [f"{base}/data/a", f"{base}/data/b", f"{base}/data/c"]


def _tape2(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Two-chunk tape over the book/trades fixture (see _memo_tape)."""
    df_fn = synthetic_book if kind == "book2" else synthetic_trades
    return _memo_tape(
        sf_dir, kind, lambda base: _split2(df_fn(spark, sf_dir), "ts_ms", base)
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan, spread over cores (hash/shingle stages are
    expression-heavy; a single-file local input would otherwise pin them
    to one task — no-op on an already-split cluster input)."""
    from market_microstructure_toolkit_spark.partitioning import spread

    return spread(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from market_microstructure_toolkit_spark.partitioning import spread

    return spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id")


_OFI_STRICT_SQL = f"""{_BOOK_CTE},
lagged AS (
  SELECT exchange_id, symbol, ts_ms, raw_nonce,
         bid1_price, ask1_price, bid1_size, ask1_size,
         LAG(bid1_price) OVER ({_W}) AS pbb,
         LAG(ask1_price) OVER ({_W}) AS pba,
         LAG(bid1_size) OVER ({_W}) AS pbq,
         LAG(ask1_size) OVER ({_W}) AS paq
  FROM book
)
SELECT exchange_id, symbol, ts_ms, raw_nonce,
  CASE WHEN bid1_price IS NOT NULL AND ask1_price IS NOT NULL
            AND bid1_size IS NOT NULL AND ask1_size IS NOT NULL
            AND pbb IS NOT NULL AND pba IS NOT NULL
            AND pbq IS NOT NULL AND paq IS NOT NULL
       THEN (CASE WHEN bid1_price > pbb THEN bid1_size - pbq
                  WHEN bid1_price < pbb THEN -pbq
                  ELSE 0.0 END)
          + (CASE WHEN ask1_price < pba THEN ask1_size - paq
                  WHEN ask1_price > pba THEN -paq
                  ELSE 0.0 END)
  END AS ofi_l1
FROM lagged
"""


_TRADES_CTE = f"{_BOOK_CTE},\ntrades AS ({trades_sql()})"


_CLASSIFIED_CTE = f"""{_TRADES_CTE},
ticked AS (
  SELECT *,
    CASE WHEN price > LAG(price) OVER ({_W}) THEN 1
         WHEN price < LAG(price) OVER ({_W}) THEN -1 END AS raw_tick
  FROM trades
),
classified AS (
  SELECT exchange_id, symbol, ts_ms, raw_nonce, mid, price, qty,
    CASE WHEN price > mid THEN 1
         WHEN price < mid THEN -1
         ELSE COALESCE(LAST_VALUE(raw_tick IGNORE NULLS) OVER
           ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
    END AS side
  FROM ticked
)"""


_TRADE_SIGNS_SQL = f"""{_CLASSIFIED_CTE}
SELECT exchange_id, symbol, ts_ms, raw_nonce,
       ROUND(price, 6) AS price, qty, side
FROM classified
"""


_VPIN_SQL = f"""{_CLASSIFIED_CTE},
bucketed AS (
  SELECT *,
    CAST(FLOOR(COALESCE(SUM(qty) OVER
      ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
      / 50.0) AS BIGINT) AS bucket
  FROM classified
),
grouped AS (
  SELECT exchange_id, symbol, bucket,
    SUM(CASE WHEN side > 0 THEN qty ELSE 0.0 END) AS buy_vol,
    SUM(CASE WHEN side < 0 THEN qty ELSE 0.0 END) AS sell_vol,
    SUM(qty) AS total_vol,
    COUNT(*) AS n_trades
  FROM bucketed GROUP BY exchange_id, symbol, bucket
)
SELECT exchange_id, symbol, bucket, buy_vol, sell_vol, total_vol, n_trades,
       ABS(buy_vol - sell_vol) / total_vol AS vpin
FROM grouped
"""


_CDC_SQL = """
WITH upd AS (
  SELECT doc_id, text || ' [rev2]' AS text, lang, source,
         n_chars + 7 AS n_chars, 'U' AS op
  FROM documents WHERE doc_id % 7 = 0 AND doc_id % 13 <> 0
),
dels AS (
  SELECT doc_id, text, lang, source, n_chars, 'D' AS op
  FROM documents WHERE doc_id % 13 = 0
),
ins AS (
  SELECT doc_id + 10000000 AS doc_id, text, lang,
         'cdc_backfill' AS source, n_chars, 'U' AS op
  FROM documents WHERE doc_id % 11 = 0
),
changes AS (
  SELECT * FROM upd UNION ALL SELECT * FROM dels UNION ALL SELECT * FROM ins
),
unioned AS (
  SELECT doc_id, text, lang, source, n_chars, 0 AS ver, 'U' AS op
  FROM documents
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars, 1 AS ver, op FROM changes
)
SELECT doc_id, text, lang, source, n_chars
FROM unioned
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY ver DESC, op ASC) = 1
        AND op <> 'D'
"""
