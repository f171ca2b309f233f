"""Scale rehearsal for the incremental MinHash index
(operators/dedup_index.py): build a corpus index at ~1M docs, probe a
50k-doc increment with planted exact and near duplicates, report
build/probe wall, recall on the planted pairs, false-match rate on the
novel slice, and driver peak RSS.

Usage: python tools/stress_dedup_index.py [n_corpus] [n_increment]
"""
from __future__ import annotations

import json
import resource
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from heavykeeper_rs_spark.operators.dedup_index import (  # noqa: E402
    build_minhash_index,
    dedup_against_index,
)
from heavykeeper_rs_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_inc = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark(app="stress-dedup-index", master="local[32]", shuffle_partitions=32)
    from pyspark.sql import functions as F

    # deterministic synthetic docs: 30 "words", each word one of 4096
    # tokens chosen by a hash of (doc id, position) — distinct docs are
    # near-orthogonal in 5-byte shingle space
    def docs_df(ids):
        words = [
            F.concat(F.lit("w"), F.pmod(F.abs(F.xxhash64("id", F.lit(p))), F.lit(4096)))
            for p in range(30)
        ]
        return ids.select("id", F.concat_ws(" ", *words).alias("text"))

    corpus = docs_df(spark.range(n_corpus, numPartitions=32))
    index_dir = "/tmp/mhidx_stress"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    build_minhash_index(corpus, "id", "text", index_dir)
    build_wall = round(time.time() - t0, 1)

    # increment: a third exact copies of corpus docs (ids shifted), a
    # third near-dups (last 2 words replaced), a third novel docs.
    # Offsets scale with n_corpus so the three id ranges (and the
    # corpus range) can never collide at any requested scale.
    third = n_inc // 3
    off = 10 ** (len(str(n_corpus)) + 1)  # > n_corpus, power of 10
    srcs = (
        spark.range(third, numPartitions=8)
        .select(F.pmod(F.abs(F.xxhash64("id")), F.lit(n_corpus)).alias("id"))
        .distinct()
    )
    src_docs = docs_df(srcs)
    exact = src_docs.select(
        (F.col("id") + 1 * off).alias("id"), "text", F.col("id").alias("want")
    )
    near = src_docs.select(
        (F.col("id") + 2 * off).alias("id"),
        F.concat(
            F.substring_index("text", " ", 28), F.lit(" edited tokens")
        ).alias("text"),
        F.col("id").alias("want"),
    )
    novel = docs_df(
        spark.range(third, numPartitions=8).select((F.col("id") + 3 * off).alias("id"))
    ).select("id", "text", F.lit(None).cast("long").alias("want"))
    inc = exact.unionByName(near).unionByName(novel)
    inc.cache()
    truth = {
        int(r["id"]): (None if r["want"] is None else int(r["want"]))
        for r in inc.select("id", "want").collect()
    }

    t0 = time.time()
    pairs = dedup_against_index(
        inc.select("id", "text"), "id", "text", index_dir, min_est_jaccard=0.7
    )
    got = pairs.groupBy("new_id").agg(
        F.max("est_jaccard").alias("best"),
        F.count("*").alias("n_matches"),
    ).collect()
    probe_wall = round(time.time() - t0, 1)

    matched = {int(r["new_id"]) for r in got}
    exact_ids = {i for i, w in truth.items() if w is not None and i < 2 * off}
    near_ids = {i for i, w in truth.items() if w is not None and 2 * off <= i < 3 * off}
    novel_ids = {i for i, w in truth.items() if w is None}
    recall_exact = len(matched & exact_ids) / max(len(exact_ids), 1)
    recall_near = len(matched & near_ids) / max(len(near_ids), 1)
    out = {
        "n_corpus": n_corpus,
        "n_increment": n_inc,
        "index_build_sec": build_wall,
        "probe_sec": probe_wall,
        # exact copies share every band hash — banding cannot miss them
        "recall_exact": round(recall_exact, 4),
        # near-dups (2 of 30 words edited, J ~ 0.85) are LSH-bounded:
        # P(miss) = (1 - J^rows_per_band)^bands ~ 0.7% at 16x8
        "recall_near": round(recall_near, 4),
        "novel_match_rate": round(len(matched & novel_ids) / max(len(novel_ids), 1), 4),
        "driver_peak_rss_mb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
        ),
    }
    assert recall_exact == 1.0, out
    assert recall_near >= 0.98, out
    print(json.dumps(out))


if __name__ == "__main__":
    main()
