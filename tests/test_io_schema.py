"""IO kernel + schema tests: header shape (8+4K, mirroring the reference's
tests/test_record.py:76-99), CSV blank/format round-trip, wide<->nested
round-trip, depth inference."""

from __future__ import annotations

import math

from market_microstructure_toolkit_spark import schema as S
from market_microstructure_toolkit_spark.sources.book_io import (
    read_book_csv,
    write_book_csv,
)
from tests.test_row_metrics import _book_df, _fake_row


def test_header_shape_8_plus_4k():
    for k in (1, 3, 25, 100):
        hdr = S.book_header(k)
        assert len(hdr) == 8 + 4 * k
        assert hdr[:8] == list(S.META_COLS)
        # bids first (best->worse), then asks — record.py:46-52 order
        assert hdr[8] == "bid1_price" and hdr[9] == "bid1_size"
        assert hdr[8 + 2 * k] == "ask1_price"


def test_infer_depth(spark):
    df = _book_df(spark, [_fake_row()], 3)
    assert S.infer_depth(df) == 3


def test_wide_nested_roundtrip(spark):
    df = _book_df(spark, [_fake_row()], 3)
    nested = S.to_nested(df, 3)
    assert "bids" in nested.columns and "asks" in nested.columns
    row = nested.collect()[0]
    assert [e["price"] for e in row["bids"]] == [100.0, 99.9, None]
    back = S.to_wide(nested, 3)
    assert sorted(back.columns) == sorted(df.columns)
    orig, rt = df.collect()[0], back.collect()[0]
    for c in df.columns:
        assert orig[c] == rt[c], c


def test_csv_roundtrip_blank_and_format(spark, tmp_path):
    df = _book_df(spark, [_fake_row()], 3)
    out = str(tmp_path / "book_csv")
    write_book_csv(df, out)
    back = read_book_csv(spark, out, 3)
    assert back.schema == S.book_schema(3)
    orig, rt = df.collect()[0], back.collect()[0]
    for c in df.columns:
        o, r = orig[c], rt[c]
        if isinstance(o, float):
            assert r is not None and math.isclose(o, r, rel_tol=0, abs_tol=5e-11), c
        else:
            assert o == r, c
    # blank levels stay NULL through the round trip
    assert rt["ask2_price"] is None and rt["bid3_size"] is None


def test_csv_malformed_cells_become_null(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    cols = S.book_header(1)
    row = {c: "" for c in cols}
    row.update(
        ts_ms="1700000000000", exchange_id="x", symbol="A", book_level="L2",
        best_bid="not-a-number", best_ask="100.5", bid1_price="1e9999",
    )
    (p / "part.csv").write_text(
        ",".join(cols) + "\n" + ",".join(row[c] for c in cols) + "\n"
    )
    got = read_book_csv(spark, str(p), 1).collect()[0]
    assert got["best_bid"] is None
    assert got["best_ask"] == 100.5
    assert got["ts_ms"] == 1700000000000


def test_require_columns(spark):
    import pytest as _pytest

    from market_microstructure_toolkit_spark import schema as S

    df = spark.createDataFrame([(1,)], "ts_ms long")
    S.require_columns(df, ["ts_ms"])  # present -> no raise
    with _pytest.raises(ValueError, match="best_bid"):
        S.require_columns(df, ["ts_ms", "best_bid", "best_ask"])


def test_iso_utc_format(spark):
    from pyspark.sql import functions as F

    from market_microstructure_toolkit_spark.functions.microstructure import iso_utc

    df = spark.createDataFrame([(1704067200123,)], "ts_ms long")
    out = df.select(iso_utc(F.col("ts_ms")).alias("iso")).first()["iso"]
    assert out.startswith("2024-01-01T00:00:00.123")


def test_setup_logging_creates_file_and_propagates(tmp_path):
    # reference tests/test_setup_log.py:39 analog: file handler lands in
    # log_dir, module loggers propagate to it, and re-calling does not
    # stack handlers
    import logging

    from market_microstructure_toolkit_spark.logsetup import setup_logging

    root = logging.getLogger()
    saved = list(root.handlers)
    try:
        setup_logging(log_dir=str(tmp_path), name="unit")
        # re-running must replace, not stack, handlers (and truncates the
        # file — reference mode="w" semantics)
        log = setup_logging(log_dir=str(tmp_path), name="unit")
        assert len(root.handlers) == 2
        log.info("hello-from-test")
        logging.getLogger("some.module").info("child-message")
        for h in root.handlers:
            h.flush()
        text = (tmp_path / "unit.log").read_text()
        assert "hello-from-test" in text and "child-message" in text
    finally:
        for h in list(root.handlers):
            root.removeHandler(h)
            h.close()
        for h in saved:
            root.addHandler(h)


# ---------------------------------------------------------------------------
# events reader: ts normalization must be type-adaptive (the parquet
# TIMESTAMP(NANOS) column arrives as BIGINT, TIMESTAMP, or TIMESTAMP_NTZ
# depending on Spark version/conf — downstream code requires epoch-nanos
# BIGINT either way)
# ---------------------------------------------------------------------------

def test_normalize_ts_nanos_passthrough_long(spark):
    from market_microstructure_toolkit_spark.sources.events import (
        normalize_ts_nanos,
    )

    df = spark.createDataFrame([(1, 1704067200123456000)], "id long, ts long")
    out = normalize_ts_nanos(df)
    assert dict(out.dtypes)["ts"] == "bigint"
    assert out.collect()[0]["ts"] == 1704067200123456000


def test_normalize_ts_nanos_from_timestamp_types(spark):
    import datetime as dt

    from pyspark.sql import functions as F
    from market_microstructure_toolkit_spark.session import ensure_session_confs
    from market_microstructure_toolkit_spark.sources.events import (
        normalize_ts_nanos,
    )

    ensure_session_confs(spark)  # UTC session zone
    t = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)  # naive wall clock
    expect = 1704067200123456000  # epoch nanos of that instant as UTC
    for cast_to in ("timestamp", "timestamp_ntz"):
        df = spark.createDataFrame([(1, t)], "id long, ts timestamp").select(
            "id", F.col("ts").cast(cast_to).alias("ts")
        )
        out = normalize_ts_nanos(df)
        assert dict(out.dtypes)["ts"] == "bigint", cast_to
        assert out.collect()[0]["ts"] == expect, cast_to


def test_read_events_agrees_with_physical_nanos_at_micros(spark):
    """The TIMESTAMP/TIMESTAMP_NTZ arrival path truncates ts to micros
    (unix_micros * 1000) while a BIGINT arrival keeps full nanos — and
    the fixture generator DOES emit sub-microsecond nanos, so the two
    paths differ in the last three digits. The invariant the repo
    actually relies on: whatever Spark surfaces, read_events' ts equals
    the physical parquet instants at microsecond granularity — and
    therefore at the millisecond flooring every consumer applies. The
    physical unit itself drifts between driver rounds (TIMESTAMP(NANOS)
    in rounds 1-3, TIMESTAMP(MICROS) in round 4), so the comparison
    normalizes whatever pyarrow surfaces to epoch-nanos first. A TZ
    regression or a lossy arrival type breaks the µs equality here,
    loudly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from market_microstructure_toolkit_spark.sources.events import read_events

    sf_dir = "/root/testdata/sf0.001"
    physical = np.sort(
        pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])["ts"]
        .cast(pa.timestamp("ns"))
        .cast("int64")
        .to_numpy()
    )
    got = np.sort(
        np.array(
            [r["ts"] for r in read_events(spark, sf_dir).select("ts").collect()],
            dtype=np.int64,
        )
    )
    assert len(got) == len(physical)
    assert (got // 1000 == physical // 1000).all()
    # micro-truncation only ever rounds DOWN within the same microsecond
    assert (got <= physical).all()


def test_read_events_yields_nanos_long(spark):
    from market_microstructure_toolkit_spark.sources.events import read_events

    ev = read_events(spark, "/root/testdata/sf0.001")
    assert dict(ev.dtypes)["ts"] == "bigint"
    lo = ev.agg({"ts": "min"}).collect()[0][0]
    # driver fixtures are 2024+ instants: epoch-nanos magnitude check
    assert lo > 1_500_000_000 * 10**9
