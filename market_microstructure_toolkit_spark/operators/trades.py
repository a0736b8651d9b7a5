"""Trade-tape microstructure estimators: trade-sign classification
(Lee-Ready), VPIN, Kyle's lambda, and effective/realized spread.

The reference toolkit records quote snapshots only (its impact sims fill
against the book: ``/root/reference/src/market_microstructure_toolkit/
impact_twap.py``), so a trade tape is an extension tier — but it is the
standard companion surface for a microstructure engine, and each
estimator here is the canonical published definition:

- Lee & Ready (1991): quote rule (trade above/below the prevailing mid
  is buyer-/seller-initiated) with the tick rule as the midpoint
  fallback (inherit the sign of the last price-changing tick).
- Easley, Lopez de Prado & O'Hara (2012) VPIN: volume-synchronized
  buckets, per-bucket |buy - sell| / total order-flow imbalance.
- Kyle (1985) lambda: price-impact slope of mid change on signed
  volume, estimated per instrument as Cov(dmid, q*side)/Var(q*side).
- Effective / realized spread (e.g. SEC Rule 605 definitions):
  2*side*(price - mid) at trade time vs. against the mid H ticks ahead;
  their difference is the permanent price impact.

Scale notes: every operator is one instrument-keyed window plus (for the
aggregated estimators) a groupBy on the same keys — the shuffle
co-partitions across stages and state is O(1) per row. No UDFs, no
driver loops; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(keys: Sequence[str], order_cols: Sequence[str]):
    return Window.partitionBy(*keys).orderBy(*order_cols)


def classify_lee_ready(
    trades: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    price_col: str = "price",
    mid_col: str = "mid",
    out_col: str = "side",
    segmented: bool = False,
) -> DataFrame:
    """Append a {-1, 0, +1} trade-sign column (Lee-Ready).

    Quote rule first: price above (below) the prevailing mid is a buy
    (sell). At the midpoint, fall back to the tick rule — the sign of
    the most recent price *change* on the tape, carried forward across
    zero-ticks via a running last-non-null window. A midpoint trade
    with no prior price change stays 0 (unclassifiable).

    ``segmented=True`` is the scale path (round-9 dispatch audit): the
    lag-1 tick sign runs on the chunk+halo pipeline and the unbounded
    carry on the two-phase segmented forward-fill
    (``add_running_last_segmented``) — one instrument's multi-year tape
    no longer serializes through a single task. Value-identical: both
    stages are selection, not accumulation, so there is no float caveat.
    """
    price, mid = F.col(price_col), F.col(mid_col)
    if segmented:
        from market_microstructure_toolkit_spark.operators import (
            window_metrics as WM,
        )

        def build(w):
            prev = F.lag(price).over(w)
            return {
                "__raw_tick": F.when(price > prev, F.lit(1)).when(
                    price < prev, F.lit(-1)
                )
            }

        staged = WM.rolling_segmented(
            trades, build, window=2,
            keys=tuple(keys), order_col=list(order_cols),
        )
        carried = WM.add_running_last_segmented(
            staged, "__raw_tick", out_col="__tick_sign",
            keys=tuple(keys), order_col=list(order_cols),
        )
        side = (
            F.when(price > mid, F.lit(1))
            .when(price < mid, F.lit(-1))
            .otherwise(F.coalesce(F.col("__tick_sign"), F.lit(0)))
        )
        return carried.withColumn(out_col, side).drop(
            "__raw_tick", "__tick_sign"
        )
    w = _w(keys, order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag(price).over(w)
    raw_tick = (
        F.when(price > prev, F.lit(1)).when(price < prev, F.lit(-1))
    )  # NULL on zero-tick / first trade -> carried over by last()
    tick_sign = F.last(raw_tick, ignorenulls=True).over(run)
    side = (
        F.when(price > mid, F.lit(1))
        .when(price < mid, F.lit(-1))
        .otherwise(F.coalesce(tick_sign, F.lit(0)))
    )
    return trades.withColumn(out_col, side)


def add_volume_buckets(
    trades: DataFrame,
    bucket_volume: float,
    keys: Sequence[str],
    order_cols: Sequence[str],
    qty_col: str = "qty",
    out_col: str = "bucket",
    segmented: bool = False,
) -> DataFrame:
    """Assign each trade to a volume-synchronized bucket: bucket k holds
    the trades whose *pre-trade* cumulative volume lies in
    [k*V, (k+1)*V). Whole trades are assigned (no split fills), the
    standard discrete-tape simplification of the VPIN clock.

    ``segmented=True`` computes the pre-trade cumulative as the
    segmented prefix-sum minus the row's own qty (exact-binary trade
    sizes make the two associations bit-identical) — the scale path for
    a single instrument's unbounded tape."""
    if segmented:
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            add_cumulative_segmented,
        )

        cum = add_cumulative_segmented(
            trades, qty_col, out_col="__cum_incl",
            keys=tuple(keys), order_col=list(order_cols),
        )
        cum_prev = F.coalesce(
            F.col("__cum_incl") - F.col(qty_col), F.lit(0.0)
        )
        return cum.withColumn(
            out_col,
            F.floor(cum_prev / F.lit(float(bucket_volume))).cast("long"),
        ).drop("__cum_incl")
    w = _w(keys, order_cols).rowsBetween(Window.unboundedPreceding, -1)
    cum_prev = F.coalesce(F.sum(qty_col).over(w), F.lit(0.0))
    return trades.withColumn(
        out_col, F.floor(cum_prev / F.lit(float(bucket_volume))).cast("long")
    )


def vpin(
    classified: DataFrame,
    bucket_volume: float,
    keys: Sequence[str],
    order_cols: Sequence[str],
    qty_col: str = "qty",
    side_col: str = "side",
    segmented: bool = False,
) -> DataFrame:
    """Per volume-bucket order-flow imbalance |buy - sell| / total.

    The VPIN series is this per-bucket imbalance; the headline VPIN
    metric is its rolling mean, which callers take with a standard
    window over the (instrument, bucket) output. Unclassified trades
    (side 0) count toward bucket volume but neither flow side —
    matching the bulk-classification convention of discarding
    indeterminate prints from the imbalance numerator."""
    qty, side = F.col(qty_col), F.col(side_col)
    bucketed = add_volume_buckets(
        classified, bucket_volume, keys, order_cols, qty_col=qty_col,
        segmented=segmented,
    )
    return bucketed.groupBy(*keys, "bucket").agg(
        F.sum(F.when(side > 0, qty).otherwise(F.lit(0.0))).alias("buy_vol"),
        F.sum(F.when(side < 0, qty).otherwise(F.lit(0.0))).alias("sell_vol"),
        F.sum(qty).alias("total_vol"),
        F.count(F.lit(1)).alias("n_trades"),
    ).withColumn(
        "vpin",
        F.abs(F.col("buy_vol") - F.col("sell_vol")) / F.col("total_vol"),
    )


def kyle_lambda(
    classified: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    mid_col: str = "mid",
    qty_col: str = "qty",
    side_col: str = "side",
    segmented: bool = False,
) -> DataFrame:
    """Kyle (1985) price-impact slope per instrument: the OLS slope of
    the tick-to-tick mid change on signed volume,
    Cov(dmid, side*qty) / Var(side*qty). One window pass for the lagged
    mid, then a partial-aggregating groupBy on the same keys. The moment
    reductions are order-sensitive float sums -> 6-dp rounding (repo
    determinism idiom). ``segmented=True`` runs the lag on the
    chunk+halo path (lookback 1); the groupBy moments partial-aggregate
    either way."""
    svol = F.col(side_col).cast("double") * F.col(qty_col)
    if segmented:
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            rolling_segmented,
        )

        lagged = rolling_segmented(
            classified,
            lambda w: {
                "__dmid": F.col(mid_col) - F.lag(mid_col).over(w)
            },
            window=2,
            keys=tuple(keys),
            order_col=list(order_cols),
        )
        staged = lagged.select(
            *keys, F.col("__dmid").alias("dmid"), svol.alias("svol")
        ).filter(F.col("dmid").isNotNull())
        return staged.groupBy(*keys).agg(
            F.round(
                F.covar_samp("dmid", "svol") / F.var_samp("svol"), 6
            ).alias("kyle_lambda"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    w = _w(keys, order_cols)
    dmid = F.col(mid_col) - F.lag(mid_col).over(w)
    # Both moments must run over the SAME sample: each instrument's
    # first tick has no lagged mid, and covar_samp would skip it while
    # var_samp kept it — a mismatched denominator that biases the slope
    # (caught by the exact-linear-impact unit test).
    staged = classified.select(
        *keys, dmid.alias("dmid"), svol.alias("svol")
    ).filter(F.col("dmid").isNotNull())
    return staged.groupBy(*keys).agg(
        F.round(
            F.covar_samp("dmid", "svol") / F.var_samp("svol"), 6
        ).alias("kyle_lambda"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def effective_realized_spread(
    classified: DataFrame,
    horizon: int,
    keys: Sequence[str],
    order_cols: Sequence[str],
    price_col: str = "price",
    mid_col: str = "mid",
    side_col: str = "side",
    segmented: bool = False,
) -> DataFrame:
    """Per-instrument average effective spread 2*side*(p - mid),
    realized spread 2*side*(p - mid_{t+H}), and permanent price impact
    (their difference), H trades ahead. Trades within H of the tape end
    (no future mid) are excluded from the realized/impact averages, as
    are unclassified (side 0) trades from all three — a side-0 term
    would contribute 0 and bias the mean toward zero.

    Per-trade spreads are quantized to 2^-26 multiples (~1.5e-8, far
    below the 6-dp output rounding) before averaging, so the mean is
    exact in ANY accumulation order — a raw AVG(double) is one ulp
    from a ROUND boundary on some partition layout eventually (ADVICE
    r7). Impact is the exact difference of the two quantized terms,
    preserving eff = realized + impact bit-exactly."""
    side = F.col(side_col).cast("double")
    if segmented:
        # bounded LOOKAHEAD on the chunk+halo path: each chunk borrows
        # the next chunk's first `horizon` rows (forward halo), so the
        # lead is exact per row and one instrument's tape fans out
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            rolling_segmented,
        )

        classified = rolling_segmented(
            classified,
            lambda w: {"__mid_fut": F.lead(mid_col, horizon).over(w)},
            window=1,
            lookahead=horizon,
            keys=tuple(keys),
            order_col=list(order_cols),
        )
        mid_fut = F.col("__mid_fut")
    else:
        w = _w(keys, order_cols)
        mid_fut = F.lead(mid_col, horizon).over(w)
    q = F.lit(float(2**26))
    eff = F.floor(
        F.lit(2.0) * side * (F.col(price_col) - F.col(mid_col)) * q
        + F.lit(0.5)
    ) / q
    rlz = F.floor(
        F.lit(2.0) * side * (F.col(price_col) - mid_fut) * q + F.lit(0.5)
    ) / q
    classified_only = F.col(side_col) != 0
    staged = classified.select(
        *keys,
        F.when(classified_only, eff).alias("eff"),
        F.when(classified_only, rlz).alias("rlz"),
        F.when(classified_only, eff - rlz).alias("impact"),
    )
    return staged.groupBy(*keys).agg(
        F.round(F.avg("eff"), 6).alias("avg_effective_spread"),
        F.round(F.avg("rlz"), 6).alias("avg_realized_spread"),
        F.round(F.avg("impact"), 6).alias("avg_price_impact"),
        F.count("rlz").alias("n_classified_with_future"),
    )


__all__ = [
    "classify_lee_ready",
    "add_volume_buckets",
    "vpin",
    "kyle_lambda",
    "effective_realized_spread",
]
