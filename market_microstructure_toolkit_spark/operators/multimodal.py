"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the DECODE step is stubbed
(deterministic fake features, clearly marked); everything Spark-side —
schema, batch iteration, partitioning, UDF signatures — is real and
tested, so swapping the stub for PIL/torchvision/ffmpeg is a one-function
change.

Scale notes: binary payloads ride the shuffle only when repartitioning is
explicit; ``mapInPandas`` streams Arrow batches so executor memory is
bounded by batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``),
not partition size. Metadata-only plans never deserialize the payload
(Parquet column pruning drops the binary column from the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Asset table schema: payload + typed metadata (modality, mime, dims).
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _fake_decode_features(payload: bytes, n: int = 8) -> list[float]:
    """STUB decode: deterministic byte-histogram features.

    Replace with a real decoder (PIL image -> pixel stats, ffmpeg frame
    sample, librosa spectral features). Marked fake on purpose — the
    container ships no media libraries (environment constraint).

    Vectorized with numpy: a per-byte Python loop was the measured hot
    spot of the whole bench (O(total corpus bytes) interpreter work inside
    the Arrow batch); ``bincount`` is the same histogram at C speed.
    """
    import numpy as np

    if payload is None:
        return [0.0] * n
    arr = np.frombuffer(payload, dtype=np.uint8)
    buckets = np.bincount(arr % n, minlength=n)
    total = max(1, len(payload))
    return [float(b) / total for b in buckets]


def extract_features(assets: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` keeps the pipeline vectorized: each Arrow batch is one
    pandas frame; the loop below is per-asset *within* a batch (the decode
    itself is inherently per-asset work).
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p, n_features) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize_images(
    assets: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Image resize stage over binary payloads via Arrow-batched
    ``mapInPandas`` — metadata is recomputed Spark-side-visible (width/
    height become the target), the pixel transform itself is STUBBED
    (payload truncated proportionally to the area ratio, deterministic)
    because the container ships no image codec; swapping in PIL's
    ``Image.resize`` changes only ``_fake_resize``.

    Plan shape notes: only image-modality rows enter the stage (filter
    pushed below the Python boundary), and the Arrow batch size bounds
    executor memory, not partition size.
    """
    import pandas as pd

    def _fake_resize(payload: bytes, w0, h0) -> bytes:
        if payload is None:
            return b""
        area0 = max(1, int(w0 or 1) * int(h0 or 1))
        keep = min(len(payload), max(1, len(payload) * target_w * target_h // area0))
        return payload[:keep]

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "payload": [
                        _fake_resize(p, w, h)
                        for p, w, h in zip(
                            pdf["payload"], pdf["width"], pdf["height"]
                        )
                    ],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "mime", "payload", "width", "height")
        .mapInPandas(run, RESIZED_SCHEMA)
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled timestamp.

    The timestamp fan-out is pure Spark (sequence + explode — distributed,
    no UDF); actual frame decode would replace the stub in
    ``extract_features`` downstream.
    """
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ts_ms"),
        )
    )


def synthetic_assets(spark, df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a deterministic fake asset table from the documents corpus
    (payload = utf-8 bytes; modality round-robins) so the plumbing is
    testable without media files."""
    return df.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.col("doc_id") % 640 + 1).alias("width"),
        (F.col("doc_id") % 480 + 1).alias("height"),
        (F.col("doc_id") % 10000 + 1000).alias("duration_ms"),
    )
