"""spark-submit entry point: stateful windowed streaming top-K.

End-to-end shape of the production streaming deployment (the streaming
analog of examples/topk_domains_job.py): an unbounded source flows
through ``stateful_windowed_topk_stream`` — per-(event-time-window,
shard) HeavyKeeper blobs held in Spark's state store, finalized by
watermark — and a ``foreachBatch`` consumer folds the emitted blobs
with ``merge_window_blobs`` to print each window's top-K.

Usage:

    python -m zipfile -c /tmp/hk.zip heavykeeper_rs_spark
    spark-submit --master local[8] --py-files /tmp/hk.zip \
        examples/streaming_windowed_topk_job.py \
        [source] [k] [window] [watermark] [checkpoint_dir]

``source`` is either ``rate`` (the built-in rate source; keys are a
Zipf-ish projection of the counter so there IS a top-K to find) or a
directory watched for parquet files with (event_type, ts) columns —
e.g. point it at a copy of the testdata events table landing file by
file. The query restarts from ``checkpoint_dir``: state (sketch blobs
+ event-time timeouts) survives kill/restart, which
tests/test_stateful_streaming.py proves matches the batch per-window
top-K exactly.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    source = sys.argv[1] if len(sys.argv) > 1 else "rate"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    window = sys.argv[3] if len(sys.argv) > 3 else "1 minute"
    watermark = sys.argv[4] if len(sys.argv) > 4 else "30 seconds"
    ckpt = sys.argv[5] if len(sys.argv) > 5 else "/tmp/hk-stream-ckpt"
    spark = SparkSession.builder.appName("hk-windowed-stream").getOrCreate()
    from heavykeeper_rs_spark.kernel import HKParams
    from heavykeeper_rs_spark.streaming.stateful import (
        merge_window_blobs,
        stateful_windowed_topk_stream,
    )

    if source == "rate":
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 5000)
            .load()
            .select(
                # Zipf-ish skew: key j appears ~ proportionally more
                # often for small j (value % (value % 97 + 1) piles
                # mass on small residues deterministically)
                F.concat(
                    F.lit("key"), (F.col("value") % (F.col("value") % 97 + 1))
                ).alias("event_type"),
                F.col("timestamp").alias("ts"),
            )
        )
    else:
        raw = spark.readStream.schema(
            "event_type string, ts timestamp"
        ).parquet(source)

    params = HKParams(k=2 * k, width=65536, depth=4, decay=0.9, seed=12345)
    out = stateful_windowed_topk_stream(
        raw, "event_type", "ts", params,
        window=window, watermark=watermark, n_shards=8,
    )

    rows: list = []

    def sink(batch_df, batch_id: int) -> None:
        batch = batch_df.collect()
        rows.extend(batch)
        merged = merge_window_blobs(rows)
        for wstart in sorted(merged):
            top = sorted(merged[wstart].list(), key=lambda t: (-t[1], t[0]))[:k]
            line = ", ".join(
                f"{it.decode('utf-8', 'replace')}:{c}" for it, c in top
            )
            print(f"[window {wstart}] {line}", flush=True)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()


if __name__ == "__main__":
    main()
