"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark side — schemas, Arrow batch shapes, partition-size control,
UDF signatures — is real and tested. AUDIO decode is real too
(``wav_decoder``: stdlib ``wave`` PCM parsing, no external codec
libs). Image/video decode remains a deliberate stub (no PIL/cv2/av in
this container): pass ``decoder=`` a real function in production, or
use the deterministic fake (``fake_image_decoder``) in tests.
Decoders that raise mark rows as failed instead of killing the job —
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
    """Placeholder for image/video decode. Intentionally not
    implemented in this container (no PIL/cv2/av); swap in e.g. a
    PIL/torchaudio-backed callable in production. AUDIO decode is real
    — see ``wav_decoder``; IMAGE decode is import-gated — see
    ``pil_image_decoder``."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment"
    )


def pil_image_decoder(blob: bytes) -> np.ndarray:
    """REAL image decode, import-gated: uses Pillow when it is on the
    executors (pip-install it into the cluster image) and degrades to
    the documented NotImplementedError here, where no codec libs ship.
    Returns an (H, W[, C]) uint8 array ready for ``resize_nearest`` /
    ``resize_features(decoder=pil_image_decoder)``."""
    try:
        from PIL import Image  # noqa: PLC0415 — executor-side optional dep
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow, which this environment does not "
            "ship; install it on the executors to activate this decoder"
        ) from e
    import io as _io

    with Image.open(_io.BytesIO(blob)) as im:
        return np.asarray(im)


def wav_decoder(blob: bytes) -> np.ndarray:
    """REAL audio decode (stdlib ``wave`` — no external codec libs):
    parses PCM WAV bytes and returns the feature vector
    ``[duration_s, n_channels, sample_rate, rms, peak, zero_cross_rate]``.

    Raises on malformed/truncated blobs; ``extract_features`` converts
    that into per-row ok=false capture."""
    import io
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        fr = w.getframerate()
        nf = w.getnframes()
        raw = w.readframes(nf)
    if sw not in (1, 2, 4):
        raise ValueError(f"unsupported PCM sample width {sw}")
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[sw]
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        x -= 128.0  # 8-bit WAV is unsigned
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    x /= float(1 << (8 * sw - 1))
    if x.size == 0:
        raise ValueError("empty audio stream")
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.abs(x).max())
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return np.asarray(
        [nf / float(fr), float(nch), float(fr), rms, peak, zcr], dtype=np.float32
    )


def synth_wav(
    freq_hz: float = 440.0,
    seconds: float = 0.25,
    rate: int = 8000,
    channels: int = 1,
    amplitude: float = 0.5,
) -> bytes:
    """Deterministic 16-bit PCM WAV bytes (pure sine) — the test-fixture
    producer for the audio path; real corpora supply real WAV blobs."""
    import io
    import wave

    n = int(seconds * rate)
    t = np.arange(n, dtype=np.float64) / rate
    x = (amplitude * np.sin(2 * np.pi * freq_hz * t) * 32767).astype(np.int16)
    if channels > 1:
        x = np.repeat(x[:, None], channels, axis=1).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


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

def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W[, C]) array — the standard
    pre-embedding normalization step, pure NumPy index math (one
    gather). Works on anything a decoder returns as a 2-/3-d array;
    the synthetic image decoder below exercises it in tests so the
    Spark-side plumbing is real even while codec decode is stubbed."""
    if img.ndim not in (2, 3):
        raise ValueError(f"expected (H, W[, C]) array, got shape {img.shape}")
    h, w = img.shape[0], img.shape[1]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[rows[:, None], cols[None, :]]


def fake_pixel_decoder(shape: tuple[int, int] = (8, 8)):
    """Decoder factory: deterministic fake 2-D 'decode' (blob bytes
    tiled into an HxW uint8 image) so resize/feature plumbing runs
    end-to-end without codec libs."""
    h, w = shape

    def decode(blob: bytes) -> np.ndarray:
        if not blob:
            raise ValueError("empty media blob")
        arr = np.frombuffer(blob, dtype=np.uint8)
        reps = -(-(h * w) // arr.size)
        return np.tile(arr, reps)[: h * w].reshape(h, w)

    return decode


def resize_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    out_h: int = 4,
    out_w: int = 4,
    decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> flattened pixel features,
    with per-row failure capture (same contract as extract_features).
    ``decoder`` defaults to the deterministic fake pixel decoder; swap
    in a real codec-backed decoder on a cluster that ships one."""
    dec = decoder if decoder is not None else fake_pixel_decoder()

    def fe(blob: bytes) -> np.ndarray:
        img = dec(blob)
        return resize_nearest(img, out_h, out_w).astype(np.float32).reshape(-1)

    return extract_features(df, id_col, blob_col, decoder=fe)

