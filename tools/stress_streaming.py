"""Streaming-sketch scale stress: N events (default 5M) through
``stateful_windowed_topk_stream`` across many event-time windows, with
a REAL mid-stream restart (two availableNow runs over one checkpoint —
the second resumes the first's state store), then exact verification
of sampled windows against batch groupBy truth.

The gate's streaming row (`streaming_ok`) proves semantics at sf0.01;
this proves the plumbing at volume: events/sec through the stateful
operator, state growth bounded by (open windows x shards), and
restart-exactness when the state store is orders of magnitude larger
than the tests'.

Usage: python tools/stress_streaming.py [n_events] [n_files]
"""
from __future__ import annotations

import glob
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from heavykeeper_rs_spark.kernel import HKParams  # noqa: E402
from heavykeeper_rs_spark.session import get_spark  # noqa: E402
from heavykeeper_rs_spark.streaming.stateful import (  # noqa: E402
    merge_window_blobs,
    stateful_windowed_topk_stream,
)

BASE = 1_700_000_000  # epoch anchor
SPAN = 5 * 24 * 3600  # 5 days of event time -> ~120 one-hour windows


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app="stress-streaming", master="local[32]", shuffle_partitions=32)
    from pyspark.sql import functions as F

    root = "/tmp/stream_stress"
    shutil.rmtree(root, ignore_errors=True)
    src, ck = f"{root}/src", f"{root}/ck"
    os.makedirs(src)

    # deterministic events: time-ordered (id -> ts monotone with small
    # jitter), Zipf-hot user domain of 1000 (exact regime at w=8192)
    ev = (
        spark.range(n_events, numPartitions=32)
        .withColumn(
            "ts",
            F.from_unixtime(
                F.lit(BASE)
                + (F.col("id") * SPAN / n_events).cast("long")
                + F.pmod(F.abs(F.xxhash64("id")), F.lit(60))
            ).cast("timestamp"),
        )
        .withColumn(
            "user",
            F.concat(
                F.lit("u"),
                F.least(
                    F.pmod(F.abs(F.xxhash64("id", F.lit(1))), F.lit(1000)),
                    F.pmod(F.abs(F.xxhash64("id", F.lit(2))), F.lit(1000)),
                ),
            ),
        )
        .select("id", "ts", "user")
    )
    ev.cache()
    ev.count()

    # n_files sequential time slices; hold the last 3 back for phase B
    per = n_events // n_files
    t0 = time.time()
    for i in range(n_files):
        hi_id = n_events if i == n_files - 1 else (i + 1) * per
        sl = ev.where((F.col("id") >= i * per) & (F.col("id") < hi_id))
        sl.coalesce(4).write.parquet(f"{root}/slice{i}", mode="overwrite")
    gen_wall = round(time.time() - t0, 1)

    params = HKParams(k=20, width=8192, depth=4, decay=0.9, seed=12345)
    captured: list = []

    def run_phase(file_ids: list[int]) -> float:
        for i in file_ids:
            for j, f in enumerate(sorted(glob.glob(f"{root}/slice{i}/*.parquet"))):
                shutil.copy(f, f"{src}/arrival-{i:03d}-{j}.parquet")
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(src)
        )
        out = stateful_windowed_topk_stream(
            stream, "user", "ts", params,
            window="1 hour", watermark="5 minutes", n_shards=4,
        )

        def sink(batch_df, batch_id):
            captured.extend(batch_df.collect())

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ck)
            .start()
        )
        t = time.time()
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError(
                "streaming phase exceeded 600s — aborting so the next "
                "phase cannot start against a still-active checkpoint"
            )
        return time.time() - t

    phase_a = run_phase(list(range(n_files - 3)))
    phase_b = run_phase(list(range(n_files - 3, n_files)))  # restart resumes state

    rows = captured
    finals = [r for r in rows if r["final"] == 1]
    merged = merge_window_blobs(rows)

    # exact verification, tie-robust: every emitted count must equal
    # the exact count for that key, and the top-10 count SEQUENCE must
    # equal the exact one (membership inside an equal-count tie group
    # spanning the PQ boundary is legitimately order-dependent)
    wstarts = sorted(merged)
    checked = 0
    for wstart in wstarts[:: max(len(wstarts) // 7, 1)][:7]:
        acc = merged[wstart]
        got = sorted(acc.list(), key=lambda t: (-t[1], t[0]))[:10]
        lo = F.from_unixtime(F.lit(wstart)).cast("timestamp")
        hi = F.from_unixtime(F.lit(wstart + 3600)).cast("timestamp")
        exact = {
            r[0].encode(): r[1]
            for r in ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
            .groupBy("user").count().collect()
        }
        for key, c in got:
            assert exact.get(key) == c, f"window {wstart}: {key} {c} != {exact.get(key)}"
        want_counts = sorted(exact.values(), reverse=True)[:10]
        assert [c for _, c in got] == want_counts, f"window {wstart} count seq"
        checked += 1

    wall = phase_a + phase_b
    out_stats = {
        "n_events": n_events,
        "n_windows": len(wstarts),
        "finalized_rows": len(finals),
        "gen_wall_sec": gen_wall,
        "phase_a_sec": round(phase_a, 1),
        "phase_b_after_restart_sec": round(phase_b, 1),
        "events_per_sec": int(n_events / wall),
        "windows_verified_exact": checked,
        "driver_peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        ),
    }
    assert checked >= 5 and len(finals) > 0
    print(json.dumps(out_stats))


if __name__ == "__main__":
    main()
