"""Structured Streaming tests: file-source micro-batches folded into a
HeavyKeeper accumulator; windowed exact aggregation with watermark."""

import os
import time

import pytest
from pyspark.sql import functions as F

from heavykeeper_rs_spark.kernel import HKParams
from heavykeeper_rs_spark.streaming.topk_stream import StreamingTopK, windowed_exact_topk


@pytest.fixture()
def stream_dir(spark, tmp_path):
    """Three parquet 'arrivals' with a known skewed key distribution."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for i in range(3):
        part = ev.filter(F.col("event_id") % 3 == i)
        part.coalesce(1).write.parquet(f"{src}/batch{i}", mode="overwrite")
    # flatten: move parquet files into src root for the file stream
    import glob
    import shutil

    for i, f in enumerate(glob.glob(f"{src}/batch*/*.parquet")):
        shutil.copy(f, f"{src}/arrival-{i}.parquet")
    for i in range(3):
        shutil.rmtree(f"{src}/batch{i}")
    return src


def test_streaming_topk_matches_batch(spark, stream_dir, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    params = HKParams(k=5, width=2048, depth=4, decay=0.9, seed=12345)
    acc = StreamingTopK(params)
    q = acc.start(stream, "event_type", str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(120)
    assert acc.batches_seen >= 1
    got = dict(acc.topk())
    truth = {
        r[0].encode(): r[1]
        for r in ev.groupBy("event_type")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    }
    assert got == truth  # exact regime: stream fold == batch truth


def test_windowed_exact_topk(spark, stream_dir, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(stream_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> event-time
    )
    agg = windowed_exact_topk(stream, "event_type", "ts", window="1 day", watermark="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_topk")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win_topk").collect()
    assert len(rows) > 0
    truth = {
        (r[0], r[1]): r[2]
        for r in ev.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d"), "event_type"
        )
        .count()
        .collect()
    }
    got = {(r["window_start"], r["event_type"]): r["cnt"] for r in rows}
    assert got == truth
