"""Plot tier: the Spark counterpart of the reference's ``mmt-plot`` /
``mmt-plot-adv`` console tools (``plot_cli.py:188-262`` ``_plot``,
``advanced_plots.py:275-337`` ``run_advanced_plots``).

Architecture: every series/aggregate a figure needs is computed as a LAZY
Spark plan by the existing operators (row metrics, OFI, rolling RV,
rolling corr, depth stats, spread histogram) — the plot layer only
``toPandas()``'s figure-sized results and hands them to matplotlib. Two
consequences at scale:

- Aggregate figures (histogram, depth curve/slope) collect a result whose
  size is set by bins/levels, never by row count — safe at any scale.
- Series figures (mid, OFI, RV) are downsampled to ``max_points`` rows
  SPARK-SIDE (positional stride over the instrument-keyed window) before
  collection, so the driver never materializes a full 100 TB series. The
  reference plots whole (60-row) recordings; the stride is a no-op there.

matplotlib is optional (this container ships without it): ``render``
falls back to writing each figure's table as CSV next to where the PNG
would go, so the compute path stays fully testable. Swapping in a real
renderer changes nothing upstream.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from market_microstructure_toolkit_spark import schema as S


def _stride_sample(df: DataFrame, max_points: int, order_col: str = "ts_ms") -> DataFrame:
    """Keep every k-th row per instrument so <= ~max_points rows survive.

    One instrument-keyed window (shared shuffle with the series metrics);
    the modulus is computed from the per-instrument count, so each series
    keeps its shape under downsampling.
    """
    keys = [k for k in S.PARTITION_KEYS if k in df.columns]
    order = ["ts_ms", "raw_nonce"] if "raw_nonce" in df.columns else [order_col]
    w = Window.partitionBy(*keys).orderBy(*order)
    wc = Window.partitionBy(*keys)
    return (
        df.withColumn("__pos", F.row_number().over(w) - 1)
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .withColumn(
            "__k", F.greatest(F.ceil(F.col("__n") / F.lit(max_points)), F.lit(1))
        )
        .filter(F.col("__pos") % F.col("__k") == 0)
        .drop("__n", "__k")
    )


def compute_plot_tables(
    df: DataFrame,
    depth: int,
    rv_window: int = 20,
    depth_k: int = 10,
    max_points: int = 20_000,
) -> dict[str, "object"]:
    """The basic-plot series set (plot_cli.py:112-185 ``ensure_metrics``):
    mid/microprice, relative spread bps, strict L1 OFI + cumulative,
    rolling RV of log mid returns, depth-K size/notional OFI + cumulative.
    Returns {figure_name: pandas.DataFrame} with a shared ``t`` (ts_ms)
    axis. All series share ONE instrument-keyed shuffle.
    """
    from market_microstructure_toolkit_spark.operators import row_metrics as RM
    from market_microstructure_toolkit_spark.operators import window_metrics as W

    k = min(depth, depth_k)
    base = RM.compute_row_metrics(df, depth)
    base = W.add_ofi_l1(base, mode="strict")
    base = W.add_cumulative(base, "ofi_l1", out_col="ofi_l1_cum")
    base = W.add_log_return(base, "mid", out_col="ret_log")
    base = W.add_rolling_rv(base, "ret_log", window=rv_window, out_col="rv")
    base = W.add_depth_ofi(base, depth=k, out_col=f"ofi_k{k}_size")
    base = W.add_depth_ofi(
        base, depth=k, notional=True, out_col=f"ofi_k{k}_notional"
    )
    base = W.add_cumulative(base, f"ofi_k{k}_size", out_col=f"ofi_k{k}_size_cum")
    base = W.add_cumulative(
        base, f"ofi_k{k}_notional", out_col=f"ofi_k{k}_notional_cum"
    )
    sampled = _stride_sample(base, max_points)
    pdf = (
        sampled.select(
            F.col("ts_ms").alias("t"),
            "mid",
            "microprice",
            "relative_spread_bps",
            "ofi_l1",
            "ofi_l1_cum",
            "rv",
            f"ofi_k{k}_size",
            f"ofi_k{k}_size_cum",
            f"ofi_k{k}_notional",
            f"ofi_k{k}_notional_cum",
        )
        .orderBy("t")
        .toPandas()
    )
    return {
        "mid_micro": pdf[["t", "mid", "microprice"]],
        "spread_bps": pdf[["t", "relative_spread_bps"]],
        "ofi": pdf[["t", "ofi_l1"]],
        "ofi_cum": pdf[["t", "ofi_l1_cum"]],
        "rv": pdf[["t", "rv"]],
        f"ofi_k{k}_size": pdf[["t", f"ofi_k{k}_size", f"ofi_k{k}_size_cum"]],
        f"ofi_k{k}_notional": pdf[
            ["t", f"ofi_k{k}_notional", f"ofi_k{k}_notional_cum"]
        ],
    }


def compute_advanced_tables(
    df: DataFrame,
    depth: int,
    depth_k: int = 10,
    rv_window: int = 100,
    corr_window: int = 100,
    hist_bins: int = 50,
    max_points: int = 20_000,
) -> dict[str, "object"]:
    """The six mmt-plot-adv figures (advanced_plots.py:275-337): spread
    histogram, microprice premium, OFI-vs-returns rolling corr, event-time
    RV, per-level depth curve, across-level depth slope. Histogram and
    depth tables are aggregates (bin/level-sized, scale-free); the series
    are stride-sampled."""
    from market_microstructure_toolkit_spark.operators import depth as D
    from market_microstructure_toolkit_spark.operators import row_metrics as RM
    from market_microstructure_toolkit_spark.operators import window_metrics as W

    k = min(depth, depth_k)
    base = RM.compute_row_metrics(df, depth)
    base = W.add_ofi_l1(base, mode="strict")
    base = W.add_log_return(base, "mid", out_col="ret_log")
    base = W.add_rolling_rv(base, "ret_log", window=rv_window, out_col="rv_event")
    base = W.add_rolling_corr(
        base, "ofi_l1", "ret_log", window=corr_window, out_col="ofi_ret_corr"
    )

    # histogram range from one bounds agg (bin table stays bins-sized)
    bounds = base.agg(
        F.min("relative_spread_bps").alias("lo"),
        F.max("relative_spread_bps").alias("hi"),
    ).collect()[0]
    lo = float(bounds["lo"] if bounds["lo"] is not None else 0.0)
    hi = float(bounds["hi"] if bounds["hi"] is not None else 1.0)
    if hi <= lo:
        hi = lo + 1.0
    spread_hist = (
        D.histogram(base, "relative_spread_bps", lo, hi, bins=hist_bins)
        .orderBy("bucket")
        .toPandas()
    )
    level_stats = D.avg_size_per_level(df, depth).orderBy("side", "level")
    depth_curve = level_stats.toPandas()
    depth_slope = D.depth_slope_across_levels(level_stats).toPandas()

    sampled = _stride_sample(base, max_points)
    series = (
        sampled.select(
            F.col("ts_ms").alias("t"),
            (F.col("microprice") - F.col("mid")).alias("micro_premium"),
            "ofi_ret_corr",
            "rv_event",
        )
        .orderBy("t")
        .toPandas()
    )
    return {
        "spread_hist": spread_hist,
        "micro_premium": series[["t", "micro_premium"]],
        "ofi_vs_returns": series[["t", "ofi_ret_corr"]],
        "rv_event": series[["t", "rv_event"]],
        "depth_curve": depth_curve,
        "depth_slope": depth_slope,
    }


def render(tables: dict, outdir: str | Path) -> list[Path]:
    """Write one file per figure table into ``outdir``.

    With matplotlib present: line plots over ``t`` (bar for histogram /
    depth tables) as PNG, mirroring the reference's figure set. Without
    it (this container): each table lands as CSV with the same stem —
    the environment-constrained fallback, clearly reported — so e2e
    tests exercise everything up to the render call.
    """
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        plt = None

    for name, pdf in tables.items():
        if plt is None:
            path = outdir / f"{name}.csv"
            pdf.to_csv(path, index=False)
            written.append(path)
            continue
        fig = plt.figure(figsize=(12, 4) if "t" in pdf.columns else (8, 4))
        if "t" in pdf.columns:
            for col in pdf.columns:
                if col != "t":
                    plt.plot(pdf["t"], pdf[col], label=col)
            plt.legend()
        else:
            cols = [c for c in pdf.columns if pdf[c].dtype.kind in "if"]
            xs = range(len(pdf))
            plt.bar(xs, pdf[cols[0]] if cols else [])
        plt.title(name)
        path = outdir / f"{name}.png"
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written
