"""Per-row metric bundles — the ``mmt-metrics`` / ``mmt-event-metrics``
projection surfaces.

The reference computes these row-at-a-time in a Python loop
(``metrics_cli.py:117-122`` calling ``compute_row_metrics``
``metrics.py:336-379``); here the whole bundle is ONE lazy ``select``
projection — a single whole-stage-codegen stage with no shuffle, and
Catalyst prunes unread level columns from the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark import schema as S
from market_microstructure_toolkit_spark.functions import microstructure as M

#: Metric column order appended by the reference CLI (metrics_cli.py:142-157).
METRIC_COLS = [
    "spread",
    "mid",
    "relative_spread_bps",
    "microprice",
    "microprice_imbalance_bps",
    "imbalance_l1",
    "imbalance_k",
    "notional_bid_k",
    "notional_ask_k",
]


def compute_row_metrics(df: DataFrame, depth: int | None = None) -> DataFrame:
    """Append the scalar metric bundle (reference ``compute_row_metrics``,
    metrics.py:336-379) to a wide book frame.

    Window-dependent columns (``rv``, ``ofi_l1``) are added separately by
    :mod:`window_metrics` — keeping this operator shuffle-free.
    """
    k = depth or S.infer_depth(df)
    bb, ba = F.col("best_bid"), F.col("best_ask")
    bsz, asz = F.col("bid1_size"), F.col("ask1_size")
    return df.withColumns(
        {
            "spread": M.spread(bb, ba),
            "mid": M.mid(bb, ba),
            "relative_spread_bps": M.relative_spread_bps(bb, ba),
            "microprice": M.microprice(bb, ba, bsz, asz),
            "microprice_imbalance_bps": M.microprice_imbalance_bps(bb, ba, bsz, asz),
            "imbalance_l1": M.imbalance_l1(bsz, asz),
            "imbalance_k": M.imbalance_depth_k(k),
            "notional_bid_k": M.notional_depth("bid", k),
            "notional_ask_k": M.notional_depth("ask", k),
        }
    )


def add_book_slopes(df: DataFrame, depth: int | None = None) -> DataFrame:
    """Append per-row OLS book slopes for both sides (metrics.py:256-290)."""
    k = depth or S.infer_depth(df)
    return df.withColumns(
        {
            "slope_bid": M.book_slope("bid", k),
            "slope_ask": M.book_slope("ask", k),
        }
    )


def compute_event_time_metrics(
    df: DataFrame,
    rv_window: int = 50,
    keys: tuple[str, ...] = S.PARTITION_KEYS,
    order_col: str = "ts_ms",
) -> DataFrame:
    """Event-indexed L1 metrics (reference ``event_metrics.py:38-111``):
    ``mid, spread_bps, microprice (mid-fallback variant), ofi_l1 (kyle),
    ret_mid, rv_event_<W>``.

    Event-indexed = per update, not wall-clock (event_metrics.py:8-10);
    windows count rows, not time.
    """
    from market_microstructure_toolkit_spark.operators import window_metrics as W

    bb, ba = F.col("best_bid"), F.col("best_ask")
    has_sizes = "bid1_size" in df.columns and "ask1_size" in df.columns
    if has_sizes:
        bsz, asz = F.col("bid1_size"), F.col("ask1_size")
    else:
        # Reference fills absent size columns as zero -> microprice
        # falls back to mid (event_metrics.py:60-64, 77-82).
        bsz, asz = F.lit(0.0), F.lit(0.0)

    # Event-variant spread_bps (event_metrics.py:71-74): only requires both
    # quotes > 0 — a crossed book yields NEGATIVE bps here, unlike the
    # scalar P5 semantic which nulls it (divergence noted in SURVEY §2.2).
    m = M.mid(bb, ba)
    spread_bps = F.when((bb > 0) & (ba > 0), (ba - bb) / m * F.lit(1e4))
    out = df.withColumns(
        {
            "mid": m,
            "spread_bps": spread_bps,
            "microprice": M.microprice(bb, ba, bsz, asz, fallback_to_mid=True),
        }
    )
    out = W.add_ofi_l1(out, mode="kyle", keys=keys, order_col=order_col)
    out = W.add_log_return(out, "mid", out_col="ret_mid", keys=keys, order_col=order_col)
    out = W.add_rolling_rv(
        out,
        ret_col="ret_mid",
        window=rv_window,
        out_col=f"rv_event_{rv_window}",
        keys=keys,
        order_col=order_col,
    )
    return out
