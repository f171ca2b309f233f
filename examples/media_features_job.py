"""spark-submit entry point: image featurization over a binary media
column — the multimodal leg of a curation pipeline.

Reads a parquet table with (id long, blob binary) — e.g. images
extracted from WARC responses — decodes every row with the
dependency-free decoders (PNG / baseline+progressive JPEG / lossless
WebP / GIF / TIFF / BMP / netpbm; the gated formats raise through the
per-row capture unless Pillow ships on the executors), resizes to a fixed feature
grid, and writes (id, ok, error, feature) parquet. Corrupt blobs
become ok=false rows, never task failures — at 10^12 rows corrupt
media is a certainty, not an exception.

Usage:

    python -m zipfile -c /tmp/hk.zip heavykeeper_rs_spark
    spark-submit --py-files /tmp/hk.zip examples/media_features_job.py \
        <media_parquet> <out_parquet> [grid=8]

Prints one JSON line of funnel stats. Pair with
tools/stress_media.py for the measured throughput envelope
(100k mixed-format images: 4653 imgs/s on local[32]).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    in_path, out_path = sys.argv[1], sys.argv[2]
    grid = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = SparkSession.builder.appName("media-features").getOrCreate()

    from heavykeeper_rs_spark.operators.multimodal import (
        image_decoder,
        resize_features,
    )

    df = spark.read.parquet(in_path)
    id_col, blob_col = df.columns[0], df.columns[1]
    feats = resize_features(df, id_col, blob_col, grid, grid,
                            decoder=image_decoder)
    feats.write.mode("overwrite").parquet(out_path)
    done = spark.read.parquet(out_path)
    by_ok = {r["ok"]: r["count"] for r in done.groupBy("ok").count().collect()}
    top_errors = [
        (r["error"], r["count"])
        for r in done.where(~F.col("ok"))
        .groupBy("error").count().orderBy(F.desc("count")).limit(5).collect()
    ]
    print(json.dumps({
        "rows": int(sum(by_ok.values())),
        "ok": int(by_ok.get(True, 0)),
        "failed": int(by_ok.get(False, 0)),
        "grid": grid,
        "top_errors": top_errors,
    }))


if __name__ == "__main__":
    main()
