"""Scale rehearsal for the multimodal image pipeline: generate a
mixed-format binary-column table (PNG / baseline JPEG / progressive
JPEG / lossless WebP / BMP / deliberately corrupt), run the
decode->resize->features operator over it at local[32], and report
per-format throughput plus the corrupt-capture rate.

Everything is distributed: blobs are ENCODED inside mapInArrow tasks
(deterministic per id), written as parquet, then decoded by
resize_features — so the numbers measure the real executor-side path
(Arrow batch -> stdlib decoders -> resize -> feature vector), not a
driver loop.

Usage: python tools/stress_media.py [n_images]
"""
from __future__ import annotations

import json
import resource
import sys
import tempfile
import time
from collections.abc import Iterator

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402

FORMATS = ("png", "jpeg", "jpeg_prog", "webp", "gif", "tiff", "bmp",
           "corrupt")
#          25%    20%     15%          15%     10%    5%      5%    5%
_CUM = (25, 45, 60, 75, 85, 90, 95, 100)


def _format_of(i: int) -> str:
    r = (i * 2654435761) % 100
    for fmt, hi in zip(FORMATS, _CUM):
        if r < hi:
            return fmt
    return "png"


def _make_blob(i: int) -> bytes:
    from heavykeeper_rs_spark.operators.jpeg import encode_jpeg
    from heavykeeper_rs_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        synth_image,
    )
    from heavykeeper_rs_spark.operators.webp import encode_webp_lossless

    fmt = _format_of(i)
    img = synth_image(32 + (i % 3) * 8, 48 + (i % 5) * 4, 3, seed=i)
    if fmt == "png":
        return encode_png(img)
    if fmt == "jpeg":
        return encode_jpeg(img, quality=85 + (i % 3) * 5)
    if fmt == "jpeg_prog":
        return encode_jpeg(img, quality=90, progressive=True)
    if fmt == "webp":
        return encode_webp_lossless(img, subtract_green=bool(i % 2))
    if fmt == "gif":
        from heavykeeper_rs_spark.operators.gif import encode_gif

        return encode_gif((img // 64 * 64).astype("uint8"), interlace=bool(i % 2))
    if fmt == "tiff":
        from heavykeeper_rs_spark.operators.tiff import encode_tiff

        return encode_tiff(img, compression=("lzw", "packbits")[i % 2],
                           predictor=bool(i % 3 == 0))
    if fmt == "bmp":
        return encode_bmp(img)
    return encode_png(img)[: 40 + i % 50]  # corrupt: truncated PNG


def main() -> None:
    from pyspark.sql import functions as F

    from heavykeeper_rs_spark.operators.multimodal import (
        image_decoder,
        resize_features,
    )
    from heavykeeper_rs_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app="stress-media", master="local[32]",
                      shuffle_partitions=32)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy()
            if len(ids) == 0:
                continue
            blobs = [_make_blob(int(i)) for i in ids]
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.asarray(ids, dtype=np.int64)),
                 pa.array(blobs, type=pa.binary())],
                names=["mid", "blob"],
            )

    data_dir = tempfile.mkdtemp(prefix="hk_media_")
    t0 = time.time()
    (
        spark.range(n, numPartitions=32)
        .mapInArrow(gen, "mid long, blob binary")
        .write.parquet(f"{data_dir}/imgs")
    )
    gen_wall = round(time.time() - t0, 1)
    df = spark.read.parquet(f"{data_dir}/imgs")
    total_bytes = (
        df.select(F.sum(F.length("blob")).alias("b")).first()["b"]
    )

    t0 = time.time()
    feats = resize_features(df, "mid", "blob", 8, 8, decoder=image_decoder)
    counts = (
        feats.groupBy("ok").count().collect()
    )
    wall = round(time.time() - t0, 2)
    ok_n = sum(r["count"] for r in counts if r["ok"])
    bad_n = sum(r["count"] for r in counts if not r["ok"])
    expected_bad = sum(1 for i in range(n) if _format_of(i) == "corrupt")

    # per-format decode spot-check: 64 ids per format decode to the
    # exact source pixels for the lossless formats
    spot_ok = True
    from heavykeeper_rs_spark.operators.multimodal import synth_image

    checked = {f: 0 for f in FORMATS}
    for i in range(n):
        fmt = _format_of(i)
        if fmt in ("jpeg", "jpeg_prog", "corrupt") or checked[fmt] >= 64:
            continue
        img = synth_image(32 + (i % 3) * 8, 48 + (i % 5) * 4, 3, seed=i)
        if fmt == "gif":
            img = (img // 64 * 64).astype(np.uint8)
        spot_ok = spot_ok and bool(
            (image_decoder(_make_blob(i)) == img).all()
        )
        checked[fmt] += 1
        if all(v >= 64 for f, v in checked.items()
               if f not in ("jpeg", "jpeg_prog", "corrupt")):
            break

    out = {
        "n_images": n,
        "gen_wall_s": gen_wall,
        "decode_wall_s": wall,
        "images_per_sec": round((ok_n + bad_n) / wall, 1),
        "mb_per_sec": round(total_bytes / wall / 1e6, 1),
        "ok": ok_n,
        "captured_corrupt": bad_n,
        "expected_corrupt": expected_bad,
        "corrupt_capture_exact": bad_n == expected_bad,
        "lossless_spot_checks_ok": spot_ok,
        "driver_peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
