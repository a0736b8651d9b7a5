"""JSONL source/sink for document corpora.

JSON-lines is the lingua franca of LLM training data (one JSON object
per line, newline-delimited, splittable). The reference's I/O surface is
CSV/Parquet for book snapshots (record.py); this module extends the same
sink/source discipline to the documents table.

Design rules for scale:

- **Schema is always explicit on read.** `spark.read.json` without a
  schema runs a full inference pass over the data — a second 100 TB scan
  before the first real one. Callers pass (or default to) the pinned
  documents schema; malformed lines surface as nulls under the default
  PERMISSIVE mode rather than killing the job.
- JSONL is lossless for the documents schema (strings + 64-bit ints;
  Spark escapes embedded newlines/quotes per JSON, so multi-line text
  round-trips exactly). The parquet-vs-jsonl roundtrip gate hash-proves
  it.
- Output is written by whatever partitioning the frame carries — one
  file per task, the layout downstream bulk loaders expect. Use
  ``df.repartition(n)`` before the sink to pick shard count/size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as Ty

#: The pinned documents-table schema (TESTDATA.md).
DOCUMENTS_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("text", Ty.StringType()),
        Ty.StructField("lang", Ty.StringType()),
        Ty.StructField("source", Ty.StringType()),
        Ty.StructField("n_chars", Ty.LongType()),
    ]
)


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """Write a document frame as JSON-lines (one object per row)."""
    df.write.mode("overwrite").json(path)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: Ty.StructType | None = None
) -> DataFrame:
    """Read a JSONL corpus with an EXPLICIT schema (no inference scan)."""
    return spark.read.schema(schema or DOCUMENTS_SCHEMA).json(path)


__all__ = [
    "DOCUMENTS_SCHEMA",
    "read_documents_jsonl",
    "write_documents_jsonl",
]
