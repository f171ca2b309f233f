"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark side — schemas, Arrow batch shapes, partition-size control,
UDF signatures — is real and tested; the media *decode* step is a
deliberate stub (the container ships no image/audio libs): pass
``decoder=`` a real function in production, or use the deterministic
fake (`fake_image_decoder`) in tests. Decoders that raise
NotImplementedError mark rows as failed instead of killing the job —
at 10^12 rows a 0.01% corrupt-media rate is a certainty, so per-row
error capture is part of the operator contract.

Batch shape: mapInArrow with binary columns; each Arrow batch is
processed as a list of (bytes, metadata) without materializing more
than spark.sql.execution.arrow.maxRecordsPerBatch blobs at once —
cap media partition bytes via spark.sql.files.maxPartitionBytes when
reading real WARC/media tables.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), True),  # image/audio/video
        StructField("codec", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("ok", BooleanType(), False),
        StructField("error", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def stub_decoder(blob: bytes) -> np.ndarray:
    """Placeholder for a real image/audio decode. Intentionally not
    implemented in this container (no codec libs); swap in e.g. a
    PIL/torchaudio-backed callable in production."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment"
    )


def fake_image_decoder(blob: bytes) -> np.ndarray:
    """Deterministic fake decode: treats the blob bytes as a tiny
    'pixel' buffer — byte histogram as an 8-dim feature. Lets the
    full Spark plumbing (schema, batching, failure capture) run in
    tests without codec libs."""
    if not blob:
        raise ValueError("empty media blob")
    arr = np.frombuffer(blob, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=8, range=(0, 256))
    return (hist / max(arr.size, 1)).astype(np.float32)


def extract_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    decoder: Callable[[bytes], np.ndarray] = stub_decoder,
    batch_limit: int = 1024,
) -> DataFrame:
    """Decode/feature-extract a binary media column.

    Returns (id, ok, error, feature). Rows whose decode raises get
    ok=false + the error message; the job never dies on corrupt media.
    """

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            blobs = batch.column(1).to_pylist()
            n = len(ids)
            if n == 0:
                continue
            for start in range(0, n, batch_limit):
                sl = slice(start, min(start + batch_limit, n))
                out_ok: list[bool] = []
                out_err: list[str | None] = []
                out_feat: list[list[float] | None] = []
                for blob in blobs[sl]:
                    try:
                        feat = decoder(blob if blob is not None else b"")
                        out_ok.append(True)
                        out_err.append(None)
                        out_feat.append([float(x) for x in np.asarray(feat).ravel()])
                    except Exception as e:  # per-row failure capture
                        out_ok.append(False)
                        out_err.append(f"{type(e).__name__}: {e}")
                        out_feat.append(None)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.asarray(ids[sl], dtype=np.int64)),
                        pa.array(out_ok, type=pa.bool_()),
                        pa.array(out_err, type=pa.string()),
                        pa.array(out_feat, type=pa.list_(pa.float32())),
                    ],
                    names=["id", "ok", "error", "feature"],
                )

    keyed = df.select(
        F.col(id_col).cast("long").alias("__id"), F.col(blob_col).alias("__b")
    )
    return keyed.mapInArrow(kernel, FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, id_col: str, blob_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: expands (video, duration) into one
    row per sample timestamp — the shuffle-free explode that precedes a
    real frame decode. Decode itself is stubbed (see stub_decoder)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("sample_ms"),
    )
