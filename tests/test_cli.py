"""End-to-end CLI tests: every subcommand run via main(argv) on a small
recorded book (CSV and parquet), mirroring the reference's CLI e2e style
(tests/test_event_metrics_cli.py)."""

from __future__ import annotations

import pytest

from market_microstructure_toolkit_spark import schema as S
from market_microstructure_toolkit_spark.cli import main
from market_microstructure_toolkit_spark.plans.book import BOOK_DEPTH, synthetic_book
from market_microstructure_toolkit_spark.sources.book_io import (
    read_book_csv,
    write_book_csv,
)


@pytest.fixture(scope="module")
def book_files(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_book")
    book = synthetic_book(spark, sf_dir)
    book.coalesce(1).write.parquet(str(d / "book.parquet"))
    write_book_csv(book.coalesce(1), str(d / "book.csv"))
    # a single recording (one instrument) — what the reference's impact
    # CLIs load; the simulators reject merged multi-instrument frames
    from pyspark.sql import functions as F

    book.filter(F.col("symbol") == "S0").coalesce(1).write.parquet(
        str(d / "book_s0.parquet")
    )
    return d


def test_metrics_cmd_parquet(spark, book_files, tmp_path):
    out = str(tmp_path / "m.parquet")
    assert main(["metrics", str(book_files / "book.parquet"), "--out", out]) == 0
    got = spark.read.parquet(out)
    for c in ("spread", "mid", "microprice", "imbalance_l1", "rv", "ofi_l1"):
        assert c in got.columns
    assert got.count() == 1000


def test_metrics_cmd_csv_roundtrip(spark, book_files, tmp_path):
    out = str(tmp_path / "m.csv")
    assert main(["metrics", str(book_files / "book.csv"), "--out", out]) == 0
    # CSV output follows the blank/%.10f conventions and re-reads cleanly
    got = read_book_csv(spark, out, BOOK_DEPTH)
    assert got.count() == 1000


def test_event_metrics_cmd(spark, book_files, tmp_path):
    out = str(tmp_path / "em.parquet")
    assert (
        main(["event-metrics", str(book_files / "book.parquet"), "--out", out])
        == 0
    )
    got = spark.read.parquet(out)
    assert "rv_event_50" in got.columns and got.count() == 1000


def test_impact_cmd(book_files, capsys):
    assert (
        main(
            ["impact", str(book_files / "book_s0.parquet"),
             "--qty", "5", "--slices", "4"]
        )
        == 0
    )
    printed = capsys.readouterr().out
    assert "naive TWAP" in printed and "VWAP-now" in printed
    assert '"vwap"' in printed


def test_impact_twap_cmd(spark, book_files, tmp_path, capsys):
    slices_out = str(tmp_path / "slices.parquet")
    summary_out = str(tmp_path / "summary.csv")
    argv = [
        "impact-twap", str(book_files / "book_s0.parquet"),
        "--qty", "5", "--slices", "4", "--jitter-ms", "100",
        "--schedule", "stochastic", "--seed", "11",
        "--per-slice-out", slices_out, "--summary-out", summary_out,
    ]
    assert main(argv) == 0
    assert spark.read.parquet(slices_out).count() == 4
    # summary-append sink accumulates across runs
    assert main(argv) == 0
    n = spark.read.option("header", True).csv(summary_out).count()
    assert n == 2


def test_impact_vwap_cmd(spark, book_files, tmp_path, capsys):
    slices_out = str(tmp_path / "vslices.parquet")
    assert (
        main(
            ["impact-vwap", str(book_files / "book_s0.parquet"),
             "--qty", "5", "--slices", "6", "--fee-bps", "10",
             "--per-slice-out", slices_out]
        )
        == 0
    )
    assert spark.read.parquet(slices_out).count() == 6
    assert '"fees_paid"' in capsys.readouterr().out


def test_record_replay_cmd(spark, book_files, tmp_path):
    out = str(tmp_path / "rec")
    assert (
        main(
            ["record-replay", str(book_files / "book.parquet"), out,
             "--depth", str(BOOK_DEPTH), "--checkpoint", str(tmp_path / "ck")]
        )
        == 0
    )
    assert spark.read.parquet(out).count() == 1000


def test_depth_stats_cmd(spark, book_files, tmp_path):
    out = str(tmp_path / "ds.parquet")
    assert (
        main(["depth-stats", str(book_files / "book.parquet"), "--out", out])
        == 0
    )
    got = spark.read.parquet(out)
    assert {"side", "level", "avg_size", "size_slope"} <= set(got.columns)
    # 2 sides x 5 levels x 4 symbols
    assert got.count() == 40


def test_plot_cmd_writes_figures(spark, book_files, tmp_path):
    # matplotlib absent in this container -> CSV-fallback per figure; the
    # Spark compute path (metrics + OFI + RV + depth-K OFI) runs for real
    outdir = tmp_path / "figs"
    assert (
        main(
            ["plot", str(book_files / "book.parquet"),
             "--outdir", str(outdir), "--max-points", "500"]
        )
        == 0
    )
    names = {p.stem for p in outdir.iterdir()}
    assert {"mid_micro", "spread_bps", "ofi", "ofi_cum", "rv",
            "ofi_k5_size", "ofi_k5_notional"} <= names
    import csv

    with open(next(outdir.glob("mid_micro.*"))) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["t", "mid", "microprice"]
    assert 1 < len(rows) <= 4 * 500 + 1  # stride cap per instrument


def test_plot_adv_cmd_writes_figures(spark, book_files, tmp_path):
    outdir = tmp_path / "figs_adv"
    assert (
        main(
            ["plot-adv", str(book_files / "book.parquet"),
             "--outdir", str(outdir), "--max-points", "300"]
        )
        == 0
    )
    names = {p.stem for p in outdir.iterdir()}
    assert {"spread_hist", "micro_premium", "ofi_vs_returns", "rv_event",
            "depth_curve", "depth_slope"} == names


def test_compact_cmd(spark, tmp_path):
    from market_microstructure_toolkit_spark import cli

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(
        8
    ).write.parquet(src)
    cli.main(["compact", src, dst, "--target-bytes", str(1 << 30)])
    assert len(spark.read.parquet(dst).inputFiles()) == 1
    assert spark.read.parquet(dst).count() == spark.read.parquet(src).count()


def test_dedup_exact_cmd(spark, tmp_path):
    from market_microstructure_toolkit_spark import cli

    src, out = str(tmp_path / "docs"), str(tmp_path / "dedup")
    spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "uniq")], "doc_id long, text string"
    ).write.parquet(src)
    cli.main(["dedup-exact", src, "--out", out])
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 3]


def test_dedup_exact_cmd_keeps_null_text_rows(spark, tmp_path):
    """md5(NULL) is NULL and never equi-joins: without the null split,
    rows 4 and 5 would vanish from the output instead of being kept as
    non-duplicates."""
    from market_microstructure_toolkit_spark import cli

    src, out = str(tmp_path / "docs_null"), str(tmp_path / "dedup_null")
    spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "uniq"), (4, None), (5, None)],
        "doc_id long, text string",
    ).write.parquet(src)
    cli.main(["dedup-exact", src, "--out", out])
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 3, 4, 5]


def test_cdc_apply_cmd(spark, tmp_path):
    from market_microstructure_toolkit_spark import cli

    base, chg, out = (
        str(tmp_path / "base"),
        str(tmp_path / "chg"),
        str(tmp_path / "merged"),
    )
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).write.parquet(base)
    spark.createDataFrame(
        [(2, "b2", "U"), (1, None, "D"), (3, "c", "U")],
        "doc_id long, text string, op string",
    ).write.parquet(chg)
    cli.main(["cdc-apply", base, chg, "--out", out, "--key", "doc_id"])
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got == {2: "b2", 3: "c"}


def test_table_diff_cmd(spark, tmp_path, capsys):
    from market_microstructure_toolkit_spark import cli

    v1, v2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    ).write.parquet(v1)
    spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    ).write.parquet(v2)
    cli.main(["table-diff", v1, v2, "--key", "doc_id"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["2\tchanged", "3\tonly_v1", "4\tonly_v2"]


def test_profile_cmd(spark, tmp_path, capsys):
    from market_microstructure_toolkit_spark import cli

    src = str(tmp_path / "prof")
    spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "k long, v string"
    ).write.parquet(src)
    cli.main(["profile", src])
    out = capsys.readouterr().out
    assert "k\tnulls=0\tdistinct=2" in out
    assert "v\tnulls=1\tdistinct=2" in out
