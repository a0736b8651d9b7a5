"""Command-line surface mirroring the reference's console entry points
(`pyproject.toml:65-73` of the reference: mmt-metrics, mmt-event-metrics,
mmt-impact, mmt-impact-twap, mmt-impact-vwap, mmt-record/mmt-ws-record)
on the Spark engine, so a reference user can run the same jobs verbatim:

    python -m market_microstructure_toolkit_spark.cli metrics book.parquet
    python -m market_microstructure_toolkit_spark.cli impact-twap book.csv \
        --side buy --qty 50 --slices 20 --depth 25

Each subcommand builds ONE lazy DataFrame plan and writes once — the CLI
is a thin argv adapter; all semantics live in operators/.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from market_microstructure_toolkit_spark import schema as S
from market_microstructure_toolkit_spark.session import get_spark


def _read_any(spark: SparkSession, path: str, depth: int | None):
    """CSV or Parquet book input; depth inferred from schema when omitted
    (reference probes data keys, impact_twap.py:78-98 — we read columns)."""
    from market_microstructure_toolkit_spark.sources.book_io import (
        read_book_csv,
        read_book_parquet,
    )

    if path.endswith(".csv") or path.rstrip("/").endswith(".csv"):
        if depth is None:
            # header-only read to infer depth, then typed re-read
            probe = spark.read.option("header", True).csv(path)
            depth = S.infer_depth(probe)
        return read_book_csv(spark, path, depth), depth
    df = read_book_parquet(spark, path)
    return df, (depth or S.infer_depth(df))


def _write(df: DataFrame, out: str) -> None:
    from market_microstructure_toolkit_spark.sources.book_io import (
        write_book_csv,
        write_book_parquet,
    )

    if out.endswith(".parquet"):
        write_book_parquet(df, out)
    else:
        write_book_csv(df, out)
    print(f"wrote {out}")


def _default_out(inp: str, suffix: str, ext: str | None = None) -> str:
    p = Path(inp)
    ext = ext or (".parquet" if ".parquet" in p.name else ".csv")
    return str(p.with_name(p.stem + suffix + ext))


def cmd_metrics(args) -> None:
    """mmt-metrics (metrics_cli.py:88-162): row metrics bundle + reset-RV
    over mid + strict OFI, appended to the input columns."""
    from market_microstructure_toolkit_spark.operators import row_metrics as RM
    from market_microstructure_toolkit_spark.operators import window_metrics as W

    spark = get_spark("mmt-metrics")
    df, depth = _read_any(spark, args.input, args.depth)
    out = RM.compute_row_metrics(df, depth)
    if args.rv_window:
        out = W.add_rolling_rv_reset(out, window=args.rv_window)
    out = W.add_ofi_l1(out, mode="strict")
    _write(out, args.out or _default_out(args.input, "_metrics"))


def cmd_event_metrics(args) -> None:
    """mmt-event-metrics (event_metrics.py:38-111): event-indexed L1
    metrics with kyle OFI and per-event RV."""
    from market_microstructure_toolkit_spark.operators import row_metrics as RM

    spark = get_spark("mmt-event-metrics")
    df, _ = _read_any(spark, args.input, args.depth)
    out = RM.compute_event_time_metrics(df, rv_window=args.rv_window)
    _write(out, args.out or _default_out(args.input, "_event_metrics"))


def _print_summary(summary: DataFrame) -> None:
    row = summary.collect()[0].asDict()
    print(json.dumps({k: row[k] for k in sorted(row)}, default=str, indent=2))


def cmd_impact(args) -> None:
    """mmt-impact (impact.py:230-396): naive TWAP and/or VWAP-now."""
    from market_microstructure_toolkit_spark.operators.impact import (
        simulate_twap_naive,
        simulate_vwap_onbook,
    )

    spark = get_spark("mmt-impact")
    df, depth = _read_any(spark, args.input, args.depth)
    if args.mode in ("twap", "both"):
        summary, per_slice = simulate_twap_naive(
            df, args.side, args.qty, args.slices, depth
        )
        print("# naive TWAP")
        _print_summary(summary)
        if args.per_slice_out:
            _write(per_slice, args.per_slice_out)
    if args.mode in ("vwap", "both"):
        summary = simulate_vwap_onbook(df, args.side, args.qty, depth)
        print("# VWAP-now (first snapshot)")
        _print_summary(summary)


def cmd_impact_twap(args) -> None:
    """mmt-impact-twap (impact_twap.py:191-311): realistic TWAP — equal or
    Dirichlet slice sizes, jittered schedule, as-of row match, fees."""
    from market_microstructure_toolkit_spark.operators.impact import (
        TwapConfig,
        simulate_twap_real,
    )
    from market_microstructure_toolkit_spark.sources.book_io import (
        write_summary_append,
    )

    spark = get_spark("mmt-impact-twap")
    df, depth = _read_any(spark, args.input, args.depth)
    cfg = TwapConfig(
        side=args.side, target_qty=args.qty, slices=args.slices,
        depth_cap=min(depth, args.depth or depth), fee_bps=args.fee_bps,
        jitter_ms=args.jitter_ms, schedule=args.schedule, seed=args.seed,
    )
    summary, per_slice = simulate_twap_real(df, cfg)
    _print_summary(summary)
    if args.per_slice_out:
        _write(per_slice, args.per_slice_out)
    if args.summary_out:
        write_summary_append(summary, args.summary_out)
        print(f"appended summary -> {args.summary_out}")


def cmd_impact_vwap(args) -> None:
    """mmt-impact-vwap (impact_vwap.py:247-377): proxy-weighted child
    sizes with carry roll-forward."""
    from market_microstructure_toolkit_spark.operators.impact import (
        VwapConfig,
        simulate_vwap_real,
    )
    from market_microstructure_toolkit_spark.sources.book_io import (
        write_summary_append,
    )

    spark = get_spark("mmt-impact-vwap")
    df, depth = _read_any(spark, args.input, args.depth)
    cfg = VwapConfig(
        side=args.side, target_qty=args.qty, slices=args.slices,
        depth_k=min(depth, args.depth or depth), fee_bps=args.fee_bps,
        proxy=args.proxy,
    )
    summary, per_slice = simulate_vwap_real(df, cfg)
    _print_summary(summary)
    if args.per_slice_out:
        _write(per_slice, args.per_slice_out)
    if args.summary_out:
        write_summary_append(summary, args.summary_out)
        print(f"appended summary -> {args.summary_out}")


def cmd_depth_stats(args) -> None:
    """mmt-plot-adv tabular backend (advanced_plots.py:193-269): per-level
    average size/price and the across-level depth slope."""
    from market_microstructure_toolkit_spark.operators.depth import (
        avg_size_per_level,
        depth_slope_across_levels,
    )

    spark = get_spark("mmt-depth-stats")
    df, depth = _read_any(spark, args.input, args.depth)
    stats = avg_size_per_level(df, depth)
    out = depth_slope_across_levels(stats)
    _write(out, args.out or _default_out(args.input, "_depth_stats"))


def cmd_plot(args) -> None:
    """mmt-plot (plot_cli.py:188-262): mid/microprice, spread bps, L1 OFI
    (+cum), rolling RV, depth-K OFI figures. Series computed Spark-side,
    stride-downsampled, rendered per figure (CSV fallback sans
    matplotlib)."""
    from market_microstructure_toolkit_spark.plotting import (
        compute_plot_tables,
        render,
    )

    spark = get_spark("mmt-plot")
    df, depth = _read_any(spark, args.input, args.depth)
    if args.tail:
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            tail_n,
        )

        df = tail_n(df, args.tail)
    tables = compute_plot_tables(
        df, depth, rv_window=args.rv_window, max_points=args.max_points
    )
    outdir = args.outdir or str(Path("plots") / Path(args.input).stem)
    for p in render(tables, outdir):
        print(f"wrote {p}")


def cmd_plot_adv(args) -> None:
    """mmt-plot-adv (advanced_plots.py:275-337): spread histogram,
    microprice premium, OFI-vs-returns rolling corr, event-time RV,
    depth curve, depth slope."""
    from market_microstructure_toolkit_spark.plotting import (
        compute_advanced_tables,
        render,
    )

    spark = get_spark("mmt-plot-adv")
    df, depth = _read_any(spark, args.input, args.depth)
    if args.tail:
        from market_microstructure_toolkit_spark.operators.window_metrics import (
            tail_n,
        )

        df = tail_n(df, args.tail)
    tables = compute_advanced_tables(
        df,
        depth,
        depth_k=args.depth_k,
        rv_window=args.rv_window,
        corr_window=args.corr_window,
        max_points=args.max_points,
    )
    outdir = args.outdir or str(Path("plots") / Path(args.input).stem)
    for p in render(tables, outdir):
        print(f"wrote {p}")


def cmd_compact(args) -> None:
    """Small-files compaction (partitioning.compact_files): rewrite a
    directory with file count sized from actual input bytes."""
    from market_microstructure_toolkit_spark.partitioning import compact_files

    spark = get_spark("mmt-compact")
    n = compact_files(
        spark, args.src, args.dst, target_bytes=args.target_bytes, fmt=args.format
    )
    print(f"wrote {args.dst} ({n} files, target {args.target_bytes} bytes)")


def cmd_dedup_exact(args) -> None:
    """Exact-dedup application: keep each content group's canonical
    (min id) row — one shuffle on the content hash. NULL-text rows have
    no content to compare, so they bypass the hash join entirely and are
    all kept as non-duplicates (md5(NULL) is NULL and a NULL key never
    equi-joins, which would otherwise silently DROP them from the
    output)."""
    from pyspark.sql import functions as F

    spark = get_spark("mmt-dedup-exact")
    df = spark.read.parquet(args.input)
    nulls = df.filter(F.col(args.text_col).isNull())
    hashed = df.filter(F.col(args.text_col).isNotNull()).withColumn(
        "__h", F.md5(F.col(args.text_col))
    )
    canon = (
        hashed.groupBy("__h")
        .agg(F.min(args.id_col).alias("__keep"))
        .withColumnRenamed("__h", "__hk")
    )
    kept = (
        hashed.join(
            canon,
            (hashed["__h"] == canon["__hk"])
            & (hashed[args.id_col] == canon["__keep"]),
        )
        .drop("__h", "__hk", "__keep")
    )
    kept.unionByName(nulls).write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.out}")


def cmd_table_diff(args) -> None:
    """Merkle-style version diff (operators/reconcile.table_diff):
    per-bucket fingerprints first, row detail only for differing
    buckets."""
    from market_microstructure_toolkit_spark.operators.reconcile import (
        table_diff,
    )

    spark = get_spark("mmt-table-diff")
    v1 = spark.read.parquet(args.v1)
    v2 = spark.read.parquet(args.v2)
    cols = args.columns.split(",") if args.columns else None
    out = table_diff(v1, v2, args.key, compare_cols=cols)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        for r in out.orderBy(args.key).collect():
            print(f"{r[args.key]}\t{r['status']}")


def cmd_profile(args) -> None:
    """One-scan per-column profile (operators/reconcile.profile_table)."""
    from market_microstructure_toolkit_spark.operators.reconcile import (
        profile_table,
    )

    spark = get_spark("mmt-profile")
    df = spark.read.parquet(args.input)
    cols = args.columns.split(",") if args.columns else None
    for r in profile_table(df, cols).collect():
        print(
            f"{r['column_name']}\tnulls={r['n_null']}\t"
            f"distinct={r['n_distinct']}\tmin={r['min_value']}\t"
            f"max={r['max_value']}"
        )


def cmd_cdc_apply(args) -> None:
    """Merge a change batch into a base snapshot (operators/cdc.apply_cdc:
    latest version wins, delete beats upsert at equal version)."""
    from market_microstructure_toolkit_spark.operators.cdc import apply_cdc

    spark = get_spark("mmt-cdc-apply")
    base = spark.read.parquet(args.base)
    changes = spark.read.parquet(args.changes)
    out = apply_cdc(
        base,
        changes,
        keys=args.key,
        op_col=args.op_col,
        version_col=args.version_col,
    )
    out.write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.out}")


def cmd_record_replay(args) -> None:
    """mmt-record / mmt-ws-record batch analog: replay a directory of
    snapshot files through the checkpointed streaming recorder
    (ws_record.py:115-284's queue/sentinel machinery is engine-provided)."""
    from market_microstructure_toolkit_spark.streaming.book_stream import (
        read_book_stream,
        record_stream,
    )

    spark = get_spark("mmt-record-replay")
    stream = read_book_stream(
        spark, args.input, args.depth, fmt=args.in_format
    )
    q = (
        record_stream(stream, args.out, args.checkpoint, fmt=args.out_format)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print(f"recorded -> {args.out}")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mmt-spark",
        description="PySpark market-microstructure toolkit (reference-parity CLI)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("metrics", help="row + series metrics table")
    m.add_argument("input")
    m.add_argument("--depth", type=int)
    m.add_argument("--rv-window", type=int, default=20)
    m.add_argument("--out")
    m.set_defaults(fn=cmd_metrics)

    e = sub.add_parser("event-metrics", help="event-indexed L1 metrics")
    e.add_argument("input")
    e.add_argument("--depth", type=int)
    e.add_argument("--rv-window", type=int, default=50)
    e.add_argument("--out")
    e.set_defaults(fn=cmd_event_metrics)

    i = sub.add_parser("impact", help="naive TWAP / VWAP-now simulators")
    i.add_argument("input")
    i.add_argument("--mode", choices=["twap", "vwap", "both"], default="both")
    i.add_argument("--side", choices=["buy", "sell"], default="buy")
    i.add_argument("--qty", type=float, required=True)
    i.add_argument("--slices", type=int, default=20)
    i.add_argument("--depth", type=int)
    i.add_argument("--per-slice-out")
    i.set_defaults(fn=cmd_impact)

    t = sub.add_parser("impact-twap", help="realistic TWAP simulator")
    t.add_argument("input")
    t.add_argument("--side", choices=["buy", "sell"], default="buy")
    t.add_argument("--qty", type=float, required=True)
    t.add_argument("--slices", type=int, default=20)
    t.add_argument("--depth", type=int)
    t.add_argument("--fee-bps", type=float, default=0.0)
    t.add_argument("--jitter-ms", type=int, default=0)
    t.add_argument(
        "--schedule", choices=["equal", "stochastic"], default="equal"
    )
    t.add_argument("--seed", type=int, default=7)
    t.add_argument("--per-slice-out")
    t.add_argument("--summary-out")
    t.set_defaults(fn=cmd_impact_twap)

    v = sub.add_parser("impact-vwap", help="realistic VWAP simulator (carry)")
    v.add_argument("input")
    v.add_argument("--side", choices=["buy", "sell"], default="buy")
    v.add_argument("--qty", type=float, required=True)
    v.add_argument("--slices", type=int, default=24)
    v.add_argument("--depth", type=int)
    v.add_argument("--fee-bps", type=float, default=0.0)
    v.add_argument("--proxy", choices=["l1_sum", "topk_sum"], default="topk_sum")
    v.add_argument("--per-slice-out")
    v.add_argument("--summary-out")
    v.set_defaults(fn=cmd_impact_vwap)

    d = sub.add_parser("depth-stats", help="per-level averages + depth slope")
    d.add_argument("input")
    d.add_argument("--depth", type=int)
    d.add_argument("--out")
    d.set_defaults(fn=cmd_depth_stats)

    pl = sub.add_parser("plot", help="basic metric figures (mmt-plot)")
    pl.add_argument("input")
    pl.add_argument("--depth", type=int)
    pl.add_argument("--rv-window", type=int, default=20)
    pl.add_argument("--tail", type=int)
    pl.add_argument("--max-points", type=int, default=20_000)
    pl.add_argument("--outdir")
    pl.set_defaults(fn=cmd_plot)

    pa = sub.add_parser("plot-adv", help="advanced analytics figures (mmt-plot-adv)")
    pa.add_argument("input")
    pa.add_argument("--depth", type=int)
    pa.add_argument("--depth-k", type=int, default=10)
    pa.add_argument("--rv-window", type=int, default=100)
    pa.add_argument("--corr-window", type=int, default=100)
    pa.add_argument("--tail", type=int)
    pa.add_argument("--max-points", type=int, default=20_000)
    pa.add_argument("--outdir")
    pa.set_defaults(fn=cmd_plot_adv)

    c = sub.add_parser("compact", help="small-files compaction (rewrite at target file size)")
    c.add_argument("src")
    c.add_argument("dst")
    c.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    c.add_argument("--format", default="parquet")
    c.set_defaults(fn=cmd_compact)

    de = sub.add_parser("dedup-exact", help="drop exact-duplicate rows, keep min-id canonical")
    de.add_argument("input")
    de.add_argument("--out", required=True)
    de.add_argument("--text-col", default="text")
    de.add_argument("--id-col", default="doc_id")
    de.set_defaults(fn=cmd_dedup_exact)

    ca = sub.add_parser("cdc-apply", help="merge a change batch into a base snapshot")
    ca.add_argument("base")
    ca.add_argument("changes")
    ca.add_argument("--out", required=True)
    ca.add_argument("--key", default="doc_id")
    ca.add_argument("--op-col", default="op")
    ca.add_argument("--version-col", default=None)
    ca.set_defaults(fn=cmd_cdc_apply)

    td = sub.add_parser(
        "table-diff", help="Merkle-style row-level diff of two versions"
    )
    td.add_argument("v1")
    td.add_argument("v2")
    td.add_argument("--key", default="doc_id")
    td.add_argument("--columns", default=None, help="comma list; default all shared")
    td.add_argument("--out", default=None, help="parquet out; default print")
    td.set_defaults(fn=cmd_table_diff)

    pr = sub.add_parser("profile", help="per-column null/distinct/min/max, one scan")
    pr.add_argument("input")
    pr.add_argument("--columns", default=None)
    pr.set_defaults(fn=cmd_profile)

    r = sub.add_parser("record-replay", help="streaming recorder replay")
    r.add_argument("input")
    r.add_argument("out")
    r.add_argument("--depth", type=int, required=True)
    r.add_argument("--checkpoint", required=True)
    r.add_argument("--in-format", choices=["parquet", "csv"], default="parquet")
    r.add_argument("--out-format", choices=["parquet", "csv"], default="parquet")
    r.set_defaults(fn=cmd_record_replay)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
