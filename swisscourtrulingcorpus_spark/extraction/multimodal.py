"""Multimodal columns: opaque binary payloads + typed metadata.

Design (per the 100 TB training-pipeline brief): media lives as
``binary`` columns (or object-store URIs) with a typed metadata struct
alongside; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so bytes never leave the executor
and batch size bounds memory.

The actual codecs (PIL/libav/soundfile) are NOT in this container, so
the decode step is STUBBED: ``decode_image_stub`` computes real,
deterministic features of the payload bytes (length, md5) and raises
``NotImplementedError`` from ``decode_image_real`` where the codec
would plug in.  Everything Spark-side — schema, UDF signature, Arrow
batch shape, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Fixture adapter: treat the document text's UTF-8 bytes as an
    opaque media payload with deterministic metadata (the shape a real
    ingest would produce from image/audio files)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/stub").alias("media_type"),
        (F.length(F.col(text_col)) % 1024).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 768).cast("int").alias("height"),
    )


def decode_image_real(payload: bytes) -> dict:
    """Where PIL/OpenCV would decode; codecs absent in this container."""
    raise NotImplementedError(
        "image decode requires PIL/OpenCV which are not installed; "
        "use decode_image_stub (deterministic byte features) instead"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "checksum": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "width": pdf["width"],
                "height": pdf["height"],
            }
        )


def decode_image_stub(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — the
    real plumbing (Arrow batches of binary cells, bounded by
    maxRecordsPerBatch), with stub features standing in for pixels."""
    return media.mapInPandas(_feature_batches, FEATURE_SCHEMA)


def resize_image_stub(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize step (1→1): rescale the metadata dims to fit max_dim
    preserving aspect ratio — pure column arithmetic on the metadata
    (a real resize would be a mapInPandas over the payload exactly like
    decode_image_stub; the *scheduling* shape is identical, so the stub
    keeps this one JVM-side where a metadata-only transform belongs)."""
    scale = F.when(
        F.greatest("width", "height") > max_dim,
        F.lit(max_dim) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    # both dims in ONE projection — sequential withColumn would
    # recompute `scale` against the already-resized width
    return media.withColumns(
        {
            "width": F.floor(F.col("width") * scale).cast("int"),
            "height": F.floor(F.col("height") * scale).cast("int"),
        }
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_offset_ms", LongType()),
        StructField("frame_checksum", StringType()),
    ]
)

_FRAME_INTERVAL_MS = 40  # 25 fps


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            continue
        checksums = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
        n_frames = (pdf["payload"].map(len) % 5 + 1).to_numpy()
        doc_ids = np.repeat(pdf["doc_id"].to_numpy(), n_frames)
        base = np.repeat(checksums.to_numpy(), n_frames)
        idx = np.concatenate([np.arange(k) for k in n_frames])
        yield pd.DataFrame(
            {
                "doc_id": doc_ids,
                "frame_idx": idx.astype("int32"),
                "ts_offset_ms": (idx * _FRAME_INTERVAL_MS).astype("int64"),
                "frame_checksum": [
                    hashlib.md5(f"{c}#{i}".encode()).hexdigest()
                    for c, i in zip(base, idx)
                ],
            }
        )


def sample_frames_stub(media: DataFrame) -> DataFrame:
    """Frame sampling (1→N fan-out): each payload yields a
    deterministic number of 'frames' (len % 5 + 1) with per-frame
    checksums — the UDTF-shaped multimodal stage (a real implementation
    would pull frames out of a video container here; batch shape,
    fan-out semantics and Arrow plumbing are identical)."""
    return media.mapInPandas(_frame_batches, FRAME_SCHEMA)
