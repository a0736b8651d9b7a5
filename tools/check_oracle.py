"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf dir, then compares row count, sorted column names, and an
order-insensitive value hash. Both sides are materialized through PANDAS
(``toPandas()`` / ``fetchdf()``) and canonicalized the way the driver does
— sort columns by name, lexsort rows, hash cell reprs — so dtype drift
(DuckDB HUGEINT -> float64) and unhashable cells (array columns) fail HERE
before they fail in the real gate.

Usage: python tools/check_oracle.py [--vanilla] [--spool] [--artifact PATH]
       [sf_dir] [query ...]

``--spool`` is the century-scale transport: the Spark result spools to
scratch parquet (distributed write) and both engines hash in bounded
Arrow chunks — same (sum64, count, 1%-repr-stratum) triple as the
in-memory path, O(chunk) driver memory. Required at sf100 where
input-sized outputs (100M rows) OOM a toPandas.

``--vanilla`` runs the Spark side on a bare SparkSession with NONE of the
repo's session confs (and a non-UTC JVM/session timezone), emulating the
driver's injected session.

``--artifact PATH`` additionally records one JSON object per query
(rows/schema/hash per side, error text if any) under the sf being
checked, MERGING into an existing file — so three sweeps produce one
auditable ORACLE_LOCAL_r{N}.json covering every registered query at
every scale factor (round-3 verdict item #3).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")


def canon_hash(pdf) -> tuple[str, list[str], int]:
    """Driver-style canonicalization: columns sorted by name, rows
    lexsorted, cells hashed via repr (floats through float64 repr)."""
    import numpy as np

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    lines = []
    for row in pdf.itertuples(index=False, name=None):
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and v != v):
                parts.append("∅" if v is None else "nan")
            elif isinstance(v, (np.floating, float)):
                # + 0.0 folds -0.0 into 0.0 (numerically equal; engines
                # legitimately differ in the sign of a cancelled sum)
                fv = float(v) + 0.0
                parts.append("nan" if fv != fv else repr(fv))
            elif isinstance(v, np.integer):
                parts.append(repr(int(v)))
            else:
                parts.append(repr(v))
        lines.append("|".join(parts))
    lines.sort()
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16], cols, len(lines)


#: row-count threshold above which the vectorized hasher kicks in —
#: the per-cell repr canon is ~5 us/cell, which is fine at the driver's
#: sf0.01 (60k-row results) but hours over a full sf1 sweep (1M-row
#: results x 173 queries). Both sides of a query always use the SAME
#: hasher, so the comparison stays a true value comparison either way;
#: the artifact records which hasher produced each hash.
FAST_ROWS = 200_000


def _row_hashes(pdf):
    """Per-row uint64 content hashes with the fast canon's dtype
    normalization (int widths collapse, -0.0 -> 0.0, one NaN pattern,
    None/NaN unified and non-str object scalars reprified). Row hashes
    depend ONLY on row values, so hashing a frame in chunks yields the
    identical multiset — the property the --spool path relies on."""
    import numpy as np
    import pandas as pd

    norm = {}
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype.kind in "iu":
            s = s.astype("int64")
        elif s.dtype.kind == "f":
            # normalize -0.0 -> 0.0 (the + 0.0 identity) and collapse
            # every NaN to ONE bit pattern — the hash is bit-based,
            # while the slow canon's repr treats all NaNs as "nan"
            v = s.astype("float64").to_numpy(copy=True)
            v[np.isnan(v)] = np.float64("nan")
            s = pd.Series(v + 0.0, index=s.index)
        elif s.dtype == object:
            # unify None/NaN and stringify non-str scalars the way the
            # slow canon's repr does (DuckDB fetchdf yields object cols
            # for VARCHAR with NULLs and for HUGEINT)
            s = s.map(
                lambda v: "∅"
                if v is None or (isinstance(v, float) and v != v)
                else (v if isinstance(v, str) else repr(v))
            )
        norm[c] = s
    h = pd.util.hash_pandas_object(pd.DataFrame(norm), index=False)
    return h.values.astype("uint64")


def _int_bool_nullable(t):
    """types_mapper for Arrow->pandas chunk conversion: force every
    integer/bool column to its NULLABLE pandas dtype regardless of
    whether THIS chunk contains nulls. Without it, pyarrow surfaces a
    null-free chunk as int64 and a null-bearing chunk of the SAME
    column as float64 — chunk-dependent dtypes hash the same integer
    differently per chunk (found on trade_dollar_bars at sf100: bar_id
    has nulls in some row groups only)."""
    import pandas as pd
    import pyarrow as pa

    if pa.types.is_integer(t):
        return pd.Int64Dtype()
    if pa.types.is_boolean(t):
        return pd.BooleanDtype()
    return None


def _norm_transport(pdf):
    """Unify transport-dependent column representations before hashing
    a --spool chunk:

    - timestamps: an Arrow/parquet roundtrip surfaces Spark timestamps
      tz-aware (UTC) where ``toPandas``/``fetchdf`` surface them naive,
      and batch readers mix ns/us units -> tz-naive UTC microseconds
      (micros, not nanos: SCD2 far-future sentinels overflow ns).
    - nullable Int64/boolean (from :func:`_int_bool_nullable`) and
      categorical: canonicalize to object strings ("∅" for null,
      repr otherwise) — chunk-invariant and engine-invariant.
    """
    import pandas as pd

    out = pdf
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype.kind == "M":
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            s = s.astype("datetime64[us]")
        elif isinstance(s.dtype, pd.CategoricalDtype):
            s = s.astype(object)
        elif s.dtype.kind in "iub" and not isinstance(
            s.dtype, __import__("numpy").dtype
        ):
            # pandas masked extension dtype (Int64/boolean)
            s = pd.Series(
                [
                    "∅" if v is None else repr(int(v))
                    for v in s.to_numpy(dtype=object, na_value=None)
                ],
                index=s.index,
                dtype=object,
            )
        else:
            continue
        if out is pdf:
            out = pdf.copy()
        out[c] = s
    return out


def canon_hash_batches(batches, columns):
    """Chunked canonicalization for results too large to materialize on
    the driver (the sf100 century probes: 100M-row input-sized outputs
    OOM a toPandas at ~8 GB/frame). Buffers chunks only until the total
    passes FAST_ROWS; below that it reproduces the exact repr canon
    (``canon_hash``), above it the exact fast canon with its 1%
    repr-verified stratum (``canon_hash_fast(with_sample=True)``) —
    per-row hashes are chunking-invariant, so the (sum, count, sample)
    triple is identical to the in-memory computation at O(chunk)
    memory. Returns (hash, cols, n, sample_hash|None, sample_n|None)."""
    import numpy as np
    import pandas as pd

    cols = sorted(columns)
    buf: list = []
    samples: list = []
    total = 0
    n = 0
    streaming = False

    def accum(pdf) -> None:
        nonlocal total
        hv = _row_hashes(pdf)
        total = (total + int(np.sum(hv, dtype="uint64"))) % (1 << 64)
        idx = np.nonzero(hv % np.uint64(101) == np.uint64(0))[0]
        if len(idx):
            samples.append(pdf.iloc[idx])

    for pdf in batches:
        if not len(pdf):
            continue
        pdf = _norm_transport(pdf[cols])
        n += len(pdf)
        if not streaming:
            buf.append(pdf)
            if n > FAST_ROWS:
                streaming = True
                for b in buf:
                    accum(b)
                buf.clear()
        else:
            accum(pdf)
    if not streaming:
        full = (
            pd.concat(buf, ignore_index=True)
            if buf
            else pd.DataFrame({c: [] for c in cols})
        )
        h, c, n2 = canon_hash(full)
        return h, c, n2, None, None
    samp = (
        pd.concat(samples, ignore_index=True)
        if samples
        else pd.DataFrame({c: [] for c in cols})
    )
    sh, _, sn = canon_hash(samp)
    return f"s{total:016x}", cols, n, sh, sn


def _spark_spool(spark, df, chunk_rows: int = 1_048_576):
    """Spool a Spark result to scratch parquet (DISTRIBUTED write — the
    driver never holds the frame) and yield pandas chunks via pyarrow.
    Context manager yielding (columns, batch_iterator); the scratch dir
    is reclaimed on exit."""
    import contextlib
    import shutil
    import tempfile

    import pyarrow.dataset as pads

    @contextlib.contextmanager
    def cm():
        scratch = tempfile.mkdtemp(prefix="mmt_oracle_spool_")
        try:
            df.write.mode("overwrite").parquet(scratch)
            dset = pads.dataset(scratch)
            yield (
                dset.schema.names,
                (
                    b.to_pandas(types_mapper=_int_bool_nullable)
                    for b in dset.to_batches(batch_size=chunk_rows)
                ),
            )
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    return cm()


def _duckdb_batches(con, sql: str, chunk_rows: int = 1_048_576):
    """Chunked DuckDB materialization: record-batch reader, never one
    giant fetchdf."""
    reader = con.execute(sql).fetch_record_batch(chunk_rows)

    def it():
        while True:
            try:
                b = reader.read_next_batch()
            except StopIteration:
                return
            yield b.to_pandas(types_mapper=_int_bool_nullable)

    return reader.schema.names, it()


def canon_hash_fast(pdf, with_sample: bool = False):
    """Vectorized order-insensitive canonicalization: per-row uint64
    hashes (pandas' C siphash over every column, dtype-normalized the
    same way the slow canon's reprs are: integer widths collapse, float
    NaN/None unify) summed mod 2^64 with the row count. Equal row
    multisets -> equal (sum, count) under ANY row order; a mismatch in
    any cell value perturbs its row hash and therefore the sum.

    Strength bound (round-8 verdict #4). This is NOT a quantized or
    lossy digest: every cell contributes its full dtype-normalized bit
    pattern (float64 after -0.0 -> 0.0 and NaN unification — the same
    two folds the repr canon applies; int64; repr for object scalars).
    The only way two differing row multisets can agree on both sum and
    count is a 64-bit hash coincidence: modeling hash_pandas_object's
    SipHash as a random oracle, a single differing row collides with
    probability 2^-64, and k differing rows require their hash deltas
    to cancel mod 2^64 — again 2^-64 for any fixed difference pattern.
    So per query comparison, P[false "hash-exact"] ~= 2^-64 ~= 5e-20 —
    far below the per-run chance of a cosmic-ray bit flip. The residual
    gap vs the repr canon is therefore collision risk only, not
    sensitivity: no value difference is quantized away. Verified by
    ``tests/test_sum64_hasher.py`` (single-cell corruptions of a
    >200k-row frame move the hash; permutations don't) and, on real
    probe data, by the ``with_sample`` stratum below.

    ``with_sample=True`` additionally repr-canon-hashes a deterministic
    ~1% stratum (rows whose own content hash is 0 mod 101) and returns
    ``(hash, cols, n, sample_hash, sample_n)``. Equal multisets select
    identical strata, so matching frames always produce matching sample
    hashes; on real data the stratum cross-checks that the fast canon's
    dtype normalization agrees with the slow repr canon (a systematic
    per-column divergence — dtype drift, encoding skew — lands in the
    stratum and fails its repr hash)."""
    import numpy as np
    import pandas as pd

    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    hv = _row_hashes(pdf)
    total = int(np.sum(hv, dtype="uint64"))
    if not with_sample:
        return f"s{total:016x}", cols, len(pdf)
    # deterministic content-keyed ~1% stratum, repr-canon-hashed: the
    # same rows are selected on both sides iff the multisets agree, and
    # the slow canon then re-verifies them cell-by-cell via repr
    idx = np.nonzero(hv % np.uint64(101) == np.uint64(0))[0]
    sh, _, sn = canon_hash(pdf.iloc[idx])
    return f"s{total:016x}", cols, len(pdf), sh, sn


def dtype_map(pdf) -> dict[str, str]:
    return {c: str(t) for c, t in pdf.dtypes.items()}


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod

    argv = [a for a in sys.argv[1:]]
    vanilla = "--vanilla" in argv
    if vanilla:
        argv.remove("--vanilla")
    spool = "--spool" in argv
    if spool:
        argv.remove("--spool")
    # --phase spark|duck|both (spool mode only): century gates need the
    # 64g Spark JVM and a near-RAM DuckDB memory cap, which cannot
    # co-reside. phase=spark spools + hashes every Spark result and
    # writes them to <artifact>.sparkside.json, then the PROCESS exits
    # (releasing the JVM heap entirely); phase=duck reloads that file,
    # runs only the DuckDB twins, and writes the merged artifact — so a
    # failed oracle can be retried without re-running Spark.
    phase = "both"
    if "--phase" in argv:
        i = argv.index("--phase")
        phase = argv[i + 1]
        del argv[i : i + 2]
        assert phase in ("spark", "duck", "both"), phase
    artifact = None
    if "--artifact" in argv:
        i = argv.index("--artifact")
        artifact = argv[i + 1]
        del argv[i : i + 2]
    if phase != "both":
        assert spool and artifact, "--phase requires --spool and --artifact"
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    if phase == "duck":
        spark = None  # never start the JVM — that is the point
    elif vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[16]")
            .appName("check-oracle-vanilla")
            .config("spark.ui.showConsoleProgress", "false")
            .config("spark.sql.session.timeZone", "America/New_York")
            # sizing only, never semantics: the default 1g heap OOMs on
            # the sf1 sweep's 1M-row collections (the driver's own gate
            # runs at sf0.01 where 1g is plenty); the sf10 probes
            # collect 10M-row results and need more — override via env
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_ORACLE_DRIVER_MEM", "8g"),
            )
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from market_microstructure_toolkit_spark.session import get_spark

        spark = get_spark("check-oracle")

    import json as _json

    sparkside_path = (artifact + ".sparkside.json") if artifact else None
    sparkside_in: dict = {}
    if phase == "duck":
        with open(sparkside_path) as f:
            sparkside_in = _json.load(f)
    sparkside_out: dict = {}
    if phase == "spark" and sparkside_path and os.path.exists(sparkside_path):
        # merge semantics mirror the artifact: a restricted spark-phase
        # run must not drop earlier gates' spooled hashes
        with open(sparkside_path) as f:
            sparkside_out = _json.load(f)

    con = duckdb.connect()
    # an in-memory DuckDB has NO temp directory, so it cannot spill and
    # a century-scale oracle (corpus_curation at sf100: distinct + joins
    # over 5M multi-KB docs) dies with "Out of Memory Error" instead of
    # going out-of-core. Point temp at disk and cap the resident set
    # below the JVM's share of the box.
    import tempfile as _tf

    _spill = _tf.mkdtemp(prefix="mmt_duck_spill_")
    con.execute(f"SET temp_directory='{_spill}'")
    # row order is irrelevant here — every comparison canonicalizes
    # (sorted repr / order-invariant sum64) — so let DuckDB drop
    # insertion-order preservation: pipeline breakers become streaming
    # operators and century-scale oracles spill a fraction as much
    # (the sf100 banded-pair CTEs exhausted a 60GB temp volume with
    # order preservation on)
    con.execute("SET preserve_insertion_order=false")
    # default the resident cap to ~60% of PHYSICAL RAM (round-11 ADVICE
    # #3: a hardcoded 64GB can EXCEED a smaller box's memory, raising
    # DuckDB's own 80%-of-RAM default instead of lowering it and
    # risking OOM before spill engages); SPARK_GRAFT_DUCK_MEM overrides
    try:
        _ram_gb = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) // (1 << 30)
        _duck_default = f"{max(1, int(_ram_gb * 0.6))}GB"
    except (ValueError, OSError, AttributeError):
        _duck_default = "8GB"
    con.execute(
        "SET memory_limit='"
        + os.environ.get("SPARK_GRAFT_DUCK_MEM", _duck_default)
        + "'"
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if not os.path.exists(f"{sf_dir}/{t}.parquet"):
            # partial synthetic SFs (make_sf --tables) omit tables the
            # probed gates don't read; a gate that DOES read one fails
            # loudly at query time instead of blocking the whole sweep
            print(f"note: {t}.parquet absent in {sf_dir}; view skipped")
            continue
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    duck_skips: list[str] = []
    records: dict[str, dict] = {}

    def flush_partial() -> None:
        # incremental safety net: a JVM crash or a runaway query mid-
        # sweep must not lose the completed queries' records (the first
        # sf1 sweep died at query 112 of 174 and left nothing on disk)
        if not artifact:
            return
        import json as _json

        with open(artifact + ".partial", "w") as f:
            _json.dump(records, f, indent=1, sort_keys=True)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        flush_partial()
        if spool:
            # century-scale path (round-10 verdict #3 follow-through):
            # the Spark result spools to scratch parquet (distributed
            # write) and BOTH engines hash in bounded Arrow chunks — a
            # 100M-row result costs O(chunk) driver memory instead of
            # an ~8 GB toPandas that OOMs the JVM
            if phase == "duck":
                sp = sparkside_in.get(name)
                if sp is None:
                    # loud, exit-code-visible (ADVICE r12): a spark
                    # phase that crashed mid-sweep (or a typoed gate
                    # name) must not yield a green duck phase silently
                    # covering fewer gates than intended
                    print(f"{name:28s} SKIP (no spark-side record)")
                    duck_skips.append(name)
                    failures += 1
                    continue
                sh, scols, srows = sp["hash"], sp["cols"], sp["rows"]
                s_samp, s_sn = sp.get("sample_hash"), sp.get("sample_rows")
            else:
                try:
                    with _spark_spool(spark, fn(spark, sf_dir)) as (sn_, sit):
                        sh, scols, srows, s_samp, s_sn = canon_hash_batches(
                            sit, sn_
                        )
                except Exception as exc:  # noqa: BLE001
                    print(f"{name:28s} SPARK-ERR {type(exc).__name__}: {exc}")
                    records[name] = {
                        "status": "spark-err",
                        "err": f"{type(exc).__name__}: {exc}"[:300],
                    }
                    failures += 1
                    continue
            if phase == "spark":
                sparkside_out[name] = {
                    "hash": sh,
                    "cols": list(scols),
                    "rows": srows,
                    "sample_hash": s_samp,
                    "sample_rows": s_sn,
                }
                with open(sparkside_path, "w") as f:
                    _json.dump(sparkside_out, f, indent=1, sort_keys=True)
                print(f"{name:28s} SPARK-SIDE rows {srows} hash {sh}")
                continue
            if name not in oracles:
                print(f"{name:28s} rows-only: {srows} rows")
                records[name] = {"status": "rows-only", "rows": srows}
                continue
            try:
                dn_, dit = _duckdb_batches(con, oracles[name])
                dh, dcols, drows, d_samp, d_sn = canon_hash_batches(dit, dn_)
            except Exception as exc:  # noqa: BLE001
                print(f"{name:28s} ORACLE-ERR {type(exc).__name__}: {exc}")
                records[name] = {
                    "status": "canon-err",
                    "err": f"{type(exc).__name__}: {exc}"[:300],
                }
                failures += 1
                continue
            samp = None
            if s_samp is not None or d_samp is not None:
                samp = {
                    "sample_hash_spark": s_samp,
                    "sample_hash_duckdb": d_samp,
                    "sample_rows": s_sn,
                    "sample_match": s_samp == d_samp and s_sn == d_sn,
                }
            ok_cols = scols == dcols
            ok_count = srows == drows
            ok_hash = sh == dh and (samp is None or samp["sample_match"])
            status = "OK " if (ok_cols and ok_count and ok_hash) else "FAIL"
            records[name] = {
                "status": status.strip().lower(),
                "rows_spark": srows,
                "rows_duckdb": drows,
                "rows_match": ok_count,
                "schema_match": ok_cols,
                "hash_spark": sh,
                "hash_duckdb": dh,
                "hash_match": ok_hash,
                # each side picks its canon regime from its OWN row
                # count; when the two straddle FAST_ROWS (only possible
                # under a row-count mismatch, already a FAIL) the hash
                # fields are format-incomparable — record both regimes
                # so the artifact is diagnosable (round-11 ADVICE #1)
                "hasher": (
                    ("sum64+sample+spool" if s_samp is not None else "repr+spool")
                    if (s_samp is None) == (d_samp is None)
                    else "spool DIVERGED spark:%s/duckdb:%s"
                    % (
                        "sum64" if s_samp is not None else "repr",
                        "sum64" if d_samp is not None else "repr",
                    )
                ),
            }
            if samp is not None:
                records[name].update(samp)
            if status == "FAIL":
                failures += 1
            print(
                f"{name:28s} {status} rows {srows}/{drows} "
                f"cols={'=' if ok_cols else sorted(set(scols) ^ set(dcols))} "
                f"hash {sh}/{dh}"
            )
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} SPARK-ERR {type(exc).__name__}: {exc}")
            records[name] = {
                "status": "spark-err",
                "err": f"{type(exc).__name__}: {exc}"[:300],
            }
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(spdf)} rows")
            records[name] = {"status": "rows-only", "rows": len(spdf)}
            continue
        dpdf = con.execute(oracles[name]).fetchdf()
        fast = max(len(spdf), len(dpdf)) > FAST_ROWS
        samp = None
        try:
            if fast:
                sh, scols, srows, s_samp, s_sn = canon_hash_fast(
                    spdf, with_sample=True
                )
                dh, dcols, drows, d_samp, d_sn = canon_hash_fast(
                    dpdf, with_sample=True
                )
                samp = {
                    "sample_hash_spark": s_samp,
                    "sample_hash_duckdb": d_samp,
                    "sample_rows": s_sn,
                    "sample_match": s_samp == d_samp and s_sn == d_sn,
                }
            else:
                sh, scols, srows = canon_hash(spdf)
                dh, dcols, drows = canon_hash(dpdf)
        except Exception as exc:  # noqa: BLE001 - e.g. unhashable cells
            print(f"{name:28s} CANON-ERR {type(exc).__name__}: {exc}")
            records[name] = {
                "status": "canon-err",
                "err": f"{type(exc).__name__}: {exc}"[:300],
            }
            failures += 1
            continue
        ok_cols = scols == dcols
        ok_count = srows == drows
        ok_hash = sh == dh and (samp is None or samp["sample_match"])
        status = "OK " if (ok_cols and ok_count and ok_hash) else "FAIL"
        records[name] = {
            "status": status.strip().lower(),
            "rows_spark": srows,
            "rows_duckdb": drows,
            "rows_match": ok_count,
            "schema_match": ok_cols,
            "hash_spark": sh,
            "hash_duckdb": dh,
            "hash_match": ok_hash,
            "hasher": "sum64+sample" if fast else "repr",
        }
        if samp is not None:
            records[name].update(samp)
        if status == "FAIL":
            failures += 1
        print(
            f"{name:28s} {status} rows {srows}/{drows} "
            f"cols={'=' if ok_cols else sorted(set(scols) ^ set(dcols))} "
            f"hash {sh}/{dh}"
        )
        if not ok_hash and ok_cols and ok_count:
            sd, dd = dtype_map(spdf), dtype_map(dpdf)
            diff = {c: (sd[c], dd[c]) for c in sd if sd.get(c) != dd.get(c)}
            if diff:
                print(f"  dtypes differ: {diff}")
            spdf2 = spdf[scols].copy()
            dpdf2 = dpdf[dcols].copy()
            srepr = sorted(map(str, spdf2.itertuples(index=False, name=None)))
            drepr = sorted(map(str, dpdf2.itertuples(index=False, name=None)))
            for a, b in zip(srepr, drepr):
                if a != b:
                    print(f"  spark:  {a[:240]}")
                    print(f"  duckdb: {b[:240]}")
                    break
    if duck_skips:
        print(
            f"DUCK-PHASE SKIPS (counted as failures): {len(duck_skips)} "
            f"— {', '.join(duck_skips[:20])}"
        )
    print("FAILURES:", failures)
    if artifact:
        import datetime as dt
        import json

        sf_key = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        doc = {}
        if os.path.exists(artifact):
            with open(artifact) as f:
                doc = json.load(f)
        # merge per-query (a restricted run must not drop the full
        # sweep's records for the untouched queries)
        doc.setdefault("sfs", {}).setdefault(sf_key, {}).update(records)
        doc["session"] = "vanilla" if vanilla else "repo"
        doc["generated_utc"] = dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        )
        doc["n_queries"] = {k: len(v) for k, v in doc["sfs"].items()}
        doc["n_failures"] = {
            k: sum(
                1
                for r in v.values()
                if r.get("status") not in ("ok", "rows-only")
            )
            for k, v in doc["sfs"].items()
        }
        with open(artifact, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.write("\n")
        if os.path.exists(artifact + ".partial"):
            os.remove(artifact + ".partial")
        print(f"artifact -> {artifact} (sf {sf_key}, {len(records)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
