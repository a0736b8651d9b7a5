"""Scalar microstructure metrics as null-propagating Column expressions.

Semantics mirror the reference implementations exactly (file:line cites per
function; reference = ``Gruntrexpewrus/market-microstructure-toolkit``,
``src/market_microstructure_toolkit/metrics.py`` unless noted). The
reference's "missing -> None, propagate" convention (its ``_parse_level``,
metrics.py:40-53) maps 1:1 onto SQL NULL arithmetic, so most guards are a
single ``F.when``.

All helpers take Columns (or column-name strings) and return a Column, so
they compose into a single ``select``/``withColumns`` projection — one
codegen stage, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def spread(best_bid: Column | str, best_ask: Column | str) -> Column:
    """``ask - bid``; NULL if either side missing (metrics.py:56-65)."""
    return _c(best_ask) - _c(best_bid)


def mid(best_bid: Column | str, best_ask: Column | str) -> Column:
    """``(bid + ask) / 2``; NULL if either missing (metrics.py:56-65)."""
    return (_c(best_bid) + _c(best_ask)) / F.lit(2.0)


def imbalance_l1(bid_size: Column | str, ask_size: Column | str) -> Column:
    """L1 queue imbalance ``b / (b + a)`` (metrics.py:68-75).

    Missing sizes coalesce to 0; NULL when the denominator is <= 0 —
    exactly the reference's ``None if denom <= 0`` guard.
    """
    b = F.coalesce(_c(bid_size), F.lit(0.0))
    a = F.coalesce(_c(ask_size), F.lit(0.0))
    denom = b + a
    return F.when(denom > 0, b / denom)


def relative_spread_bps(best_bid: Column | str, best_ask: Column | str) -> Column:
    """``1e4 * (ask - bid) / mid`` (metrics.py:98-121), scalar semantics.

    NULL unless ``bid > 0`` and ``ask > bid`` (crossed/locked books yield
    NULL — the P5 semantic chosen over the vectorized P6 variant which let
    crossed books produce negative bps; divergence documented in SURVEY §2.2).
    """
    b, a = _c(best_bid), _c(best_ask)
    m = (b + a) / F.lit(2.0)
    return F.when((b > 0) & (a > b) & (m > 0), F.lit(1e4) * (a - b) / m)


def microprice(
    best_bid: Column | str,
    best_ask: Column | str,
    bid_size: Column | str,
    ask_size: Column | str,
    *,
    fallback_to_mid: bool = False,
) -> Column:
    """Size-weighted microprice ``(ask*bsz + bid*asz) / (bsz + asz)``.

    Two reference semantics, both kept (SURVEY §2.2 P7):
    - scalar (metrics.py:124-142): NULL if any input missing or denom <= 0;
    - event-time (event_metrics.py:77-82): falls back to ``mid`` when sizes
      are missing/zero — enable with ``fallback_to_mid=True``.
    """
    b, a = _c(best_bid), _c(best_ask)
    bsz, asz = _c(bid_size), _c(ask_size)
    denom = bsz + asz
    mp = F.when(denom > 0, (a * bsz + b * asz) / denom)
    if fallback_to_mid:
        bsz0 = F.coalesce(bsz, F.lit(0.0))
        asz0 = F.coalesce(asz, F.lit(0.0))
        return F.when(
            bsz0 + asz0 > 0, (a * bsz0 + b * asz0) / (bsz0 + asz0)
        ).otherwise(mid(b, a))
    return mp


def microprice_imbalance_bps(
    best_bid: Column | str,
    best_ask: Column | str,
    bid_size: Column | str,
    ask_size: Column | str,
) -> Column:
    """``1e4 * (microprice - mid) / mid``; NULL if mid <= 0 or microprice
    NULL (metrics.py:145-167)."""
    m = mid(best_bid, best_ask)
    mp = microprice(best_bid, best_ask, bid_size, ask_size)
    return F.when(m > 0, F.lit(1e4) * (mp - m) / m)


def _sum_levels(side: str, depth: int, term) -> Column:
    """Null-skipping horizontal sum over top-K level columns.

    ``term(price_col, size_col) -> Column`` gives each level's contribution;
    levels where it evaluates NULL contribute 0 (the reference skips
    unparseable levels).
    """
    terms = [
        F.coalesce(
            term(F.col(f"{side}{i}_price"), F.col(f"{side}{i}_size")),
            F.lit(0.0),
        )
        for i in range(1, depth + 1)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def imbalance_depth_k(depth: int) -> Column:
    """Depth-K imbalance ``sum(bid sizes) / (sum(bid)+sum(ask))`` over the
    top-K wide columns; NULL if denom <= 0 (metrics.py:78-95).

    Invalid (NULL) sizes are skipped, matching the reference's per-level
    ``_parse_level`` -> skip behavior.
    """
    bid_sum = _sum_levels("bid", depth, lambda p, s: s)
    ask_sum = _sum_levels("ask", depth, lambda p, s: s)
    denom = bid_sum + ask_sum
    return F.when(denom > 0, bid_sum / denom)


def notional_depth(side: str, depth: int) -> Column:
    """Per-side top-K notional ``sum(price_i * size_i)``; NULL when no level
    is valid (metrics.py:235-253)."""
    total = _sum_levels(side, depth, lambda p, s: p * s)
    valid = [
        F.when(
            F.col(f"{side}{i}_price").isNotNull()
            & F.col(f"{side}{i}_size").isNotNull(),
            F.lit(1),
        ).otherwise(F.lit(0))
        for i in range(1, depth + 1)
    ]
    cnt = valid[0]
    for v in valid[1:]:
        cnt = cnt + v
    return F.when(cnt > 0, total)


def book_slope_state(side: str, depth: int) -> Column:
    """One-pass OLS accumulator struct for ``book_slope``:
    ``(n, p1, cumy, sx, sy, sxx, sxy)`` folded over the valid levels in a
    SINGLE ``aggregate``. Callers should materialize it once (e.g. behind
    an ``explode(array(...))`` Generate barrier) and derive the slope with
    ``book_slope_from_state`` — extracting many fields straight off the
    aggregate would re-evaluate the whole fold per field (higher-order
    functions are interpreted and invisible to common-subexpression
    elimination)."""
    from market_microstructure_toolkit_spark.functions.arrays import (
        ladder_from_wide,
        valid_levels,
    )

    lv = valid_levels(ladder_from_wide(side, depth))

    def step(acc: Column, e: Column) -> Column:
        p1 = F.coalesce(acc["p1"], e["price"])
        x = F.abs(e["price"] - p1)
        cumy = acc["cumy"] + e["size"]
        return F.struct(
            (acc["n"] + 1).alias("n"),
            p1.alias("p1"),
            cumy.alias("cumy"),
            (acc["sx"] + x).alias("sx"),
            (acc["sy"] + cumy).alias("sy"),
            (acc["sxx"] + x * x).alias("sxx"),
            (acc["sxy"] + x * cumy).alias("sxy"),
        )

    init = F.struct(
        F.lit(0).alias("n"),
        F.lit(None).cast("double").alias("p1"),
        F.lit(0.0).alias("cumy"),
        F.lit(0.0).alias("sx"),
        F.lit(0.0).alias("sy"),
        F.lit(0.0).alias("sxx"),
        F.lit(0.0).alias("sxy"),
    )
    return F.aggregate(lv, init, step)


def book_slope_from_state(s: Column) -> Column:
    """OLS slope from a ``book_slope_state`` struct: NULL if < 2 valid
    levels or zero x-variance, else (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)."""
    n = s["n"].cast("double")
    denom = n * s["sxx"] - s["sx"] * s["sx"]
    return F.when(
        (s["n"] >= 2) & (denom != 0),
        (n * s["sxy"] - s["sx"] * s["sy"]) / denom,
    )


def book_slope(side: str, depth: int) -> Column:
    """Per-row OLS slope of cumulative size vs price distance from L1
    (metrics.py:256-290): x_i = |p_i - p_1|, y_i = cumsum(q_i) over valid
    levels; slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2); NULL if < 2 valid
    levels or zero x-variance.

    Pure expression over an array of valid levels — no UDF. Prefer
    ``book_slope_state`` + ``book_slope_from_state`` behind a Generate
    barrier in hot paths: this convenience form builds each sum as its own
    interpreted higher-order aggregate re-walking xs/ys subtrees.
    """
    from market_microstructure_toolkit_spark.functions.arrays import (
        ladder_from_wide,
        valid_levels,
    )

    lv = valid_levels(ladder_from_wide(side, depth))
    n = F.size(lv).cast("double")
    p1 = F.element_at(lv, 1)["price"]

    # x_i = |price_i - price_1|  ;  y_i = sum of sizes[1..i]
    xs = F.transform(lv, lambda e: F.abs(e["price"] - p1))
    sizes = F.transform(lv, lambda e: e["size"])
    ys = F.transform(
        sizes,
        lambda s, i: F.aggregate(
            F.slice(sizes, F.lit(1), i + 1), F.lit(0.0), lambda acc, v: acc + v
        ),
    )
    sx = F.aggregate(xs, F.lit(0.0), lambda acc, v: acc + v)
    sy = F.aggregate(ys, F.lit(0.0), lambda acc, v: acc + v)
    sxx = F.aggregate(xs, F.lit(0.0), lambda acc, v: acc + v * v)
    sxy = F.aggregate(
        F.zip_with(xs, ys, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    denom = n * sxx - sx * sx
    return F.when((n >= 2) & (denom != 0), (n * sxy - sx * sy) / denom)


def slippage_bps(
    exec_px: Column | str, ref_px: Column | str, side: Column | str
) -> Column:
    """Execution slippage in bps, positive = worse (impact.py:183-193,
    impact_twap.py:324-337): buy ``1e4*(px/ref - 1)``, sell ``1e4*(1 - px/ref)``.
    NULL when ref <= 0 or either price missing."""
    px, ref = _c(exec_px), _c(ref_px)
    s = _c(side)
    raw = F.when(s == F.lit("buy"), F.lit(1e4) * (px / ref - F.lit(1.0))).otherwise(
        F.lit(1e4) * (F.lit(1.0) - px / ref)
    )
    return F.when(ref > 0, raw)


def apply_fee(
    notional: Column | str, fee_bps: Column | str | float, side: Column | str
) -> Column:
    """Fee-adjusted notional (impact_twap.py:101-109): buys pay
    ``notional * (1 + fee/1e4)``, sells receive ``notional * (1 - fee/1e4)``
    floored at 0."""
    nt = _c(notional)
    fee = F.lit(fee_bps) if isinstance(fee_bps, (int, float)) else _c(fee_bps)
    s = _c(side)
    adj = F.when(
        s == F.lit("buy"), nt * (F.lit(1.0) + fee / F.lit(1e4))
    ).otherwise(nt * (F.lit(1.0) - fee / F.lit(1e4)))
    return F.greatest(adj, F.lit(0.0))


def iso_utc(ts_ms: Column | str) -> Column:
    """Epoch-millis -> ISO-8601 UTC string (snapshot.py:38-39)."""
    return F.date_format(
        F.timestamp_millis(_c(ts_ms)), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
    )


def format_float_10dp(x: Column | str) -> Column:
    """CSV-boundary 10-dp formatting, NULL -> '' (metrics_cli.py:60-66).

    Only for CSV export — metrics always compare on doubles (SURVEY §4.5).
    """
    return F.coalesce(F.format_string("%.10f", _c(x)), F.lit(""))


# --- range-based volatility estimators (beyond-reference rollup tier) ---

def parkinson_var(high: Column | str, low: Column | str) -> Column:
    """Parkinson (1980) range variance: ln(H/L)^2 / (4 ln 2)."""
    hl = F.log(_c(high) / _c(low))
    return (hl * hl) / (F.lit(4.0) * F.log(F.lit(2.0)))


def garman_klass_var(
    open_: Column | str, high: Column | str, low: Column | str, close: Column | str
) -> Column:
    """Garman-Klass (1980): 0.5 ln(H/L)^2 - (2 ln 2 - 1) ln(C/O)^2."""
    hl = F.log(_c(high) / _c(low))
    co = F.log(_c(close) / _c(open_))
    return F.lit(0.5) * hl * hl - (
        F.lit(2.0) * F.log(F.lit(2.0)) - F.lit(1.0)
    ) * co * co


def rogers_satchell_var(
    open_: Column | str, high: Column | str, low: Column | str, close: Column | str
) -> Column:
    """Rogers-Satchell (1991), drift-robust:
    ln(H/C) ln(H/O) + ln(L/C) ln(L/O)."""
    o, h, lo_, c = _c(open_), _c(high), _c(low), _c(close)
    return F.log(h / c) * F.log(h / o) + F.log(lo_ / c) * F.log(lo_ / o)
