"""applyInPandasWithState streaming sketch: state-store-backed shards,
results equal the exact batch answer in the exact regime."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from heavykeeper_rs_spark.kernel import HKParams
from heavykeeper_rs_spark.streaming.stateful import (
    merge_shard_blobs,
    stateful_topk_stream,
)


def test_stateful_topk_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for i in range(3):
        part = ev.filter(F.col("event_id") % 3 == i)
        part.coalesce(1).write.parquet(f"{src}/b{i}", mode="overwrite")
    for i, f in enumerate(glob.glob(f"{src}/b*/*.parquet")):
        shutil.copy(f, f"{src}/arrival-{i}.parquet")
    for i in range(3):
        shutil.rmtree(f"{src}/b{i}")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    params = HKParams(k=5, width=2048, depth=4, decay=0.9, seed=12345)
    out = stateful_topk_stream(stream, "event_type", params, n_shards=4)
    q = (
        out.writeStream.format("memory")
        .queryName("shard_sketches")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "select * from shard_sketches"
    ).collect()
    assert rows, "no shard updates emitted"
    sk = merge_shard_blobs(rows)
    got = dict(sk.list())
    truth = {
        r[0].encode(): r[1]
        for r in ev.groupBy("event_type")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    }
    assert got == truth
    # state survived across the 3 file triggers: total rows folded == input
    latest = {}
    for r in rows:
        latest[r["shard"]] = max(latest.get(r["shard"], 0), r["rows_seen"])
    assert sum(latest.values()) == ev.count()


def test_stateful_stream_restart_resumes_state(spark, tmp_path):
    """Kill the query, add new data, restart from the SAME checkpoint:
    the state store must carry the sketch counts across restarts."""
    src = str(tmp_path / "src2")
    os.makedirs(src)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.parquet(f"{src}/a", mode="overwrite")
    for i, f in enumerate(glob.glob(f"{src}/a/*.parquet")):
        shutil.copy(f, f"{src}/f0.parquet")
    shutil.rmtree(f"{src}/a")

    params = HKParams(k=5, width=2048, depth=4, decay=0.9, seed=12345)
    ckpt = str(tmp_path / "ck2")

    captured: list = []

    def run_once(qname):
        stream = spark.readStream.schema(ev.schema).parquet(src)
        out = stateful_topk_stream(stream, "event_type", params, n_shards=4)

        def sink(batch_df, batch_id):
            captured.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(180)

    run_once("restart_run1")
    # second arrival AFTER the first query fully stopped
    second.coalesce(1).write.parquet(f"{src}/b", mode="overwrite")
    for i, f in enumerate(glob.glob(f"{src}/b/*.parquet")):
        shutil.copy(f, f"{src}/f1.parquet")
    shutil.rmtree(f"{src}/b")
    captured.clear()
    run_once("restart_run2")

    rows = captured
    assert rows, "restarted query emitted nothing"
    sk = merge_shard_blobs(rows)
    got = dict(sk.list())
    truth = {
        r[0].encode(): r[1]
        for r in ev.groupBy("event_type")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    }
    # counts include BOTH halves => state carried across the restart
    assert got == truth
