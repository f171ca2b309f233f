"""spark-submit entry point: the crawl-increment dedup workflow.

Day 0 builds a persisted MinHash index over the kept corpus; each
following day probes the new crawl batch against it (corpus scanned
map-side, never shuffled), keeps the documents with no near-dup in the
corpus, and appends the keepers to the index — so tomorrow's increment
deduplicates against today's keepers too.

Usage:

    python -m zipfile -c /tmp/hk.zip heavykeeper_rs_spark
    # build (once):
    spark-submit --py-files /tmp/hk.zip examples/incremental_dedup_job.py \
        build <corpus_parquet> <index_dir>
    # per increment:
    spark-submit --py-files /tmp/hk.zip examples/incremental_dedup_job.py \
        probe <increment_parquet> <index_dir> <keepers_out_parquet> \
        [min_est_jaccard=0.7]

Input tables need (doc_id long, text string). Prints one JSON line of
funnel stats per run.

Idempotency: the index append is keyed by an increment id derived
from the increment path, so re-running the same increment (cron
retry, failed driver) indexes it exactly once — the replay reports
``increment_applied: false`` and writes nothing. Probing excludes
corpus_id == new_id matches, so the replay also cannot self-match
against its previously indexed copies.
"""

from __future__ import annotations

import json
import re
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    mode = sys.argv[1]
    spark = SparkSession.builder.appName(f"incremental-dedup-{mode}").getOrCreate()
    from heavykeeper_rs_spark.operators.dedup_index import (
        build_minhash_index,
        dedup_against_index,
        update_minhash_index,
    )

    if mode == "build":
        corpus, index_dir = sys.argv[2], sys.argv[3]
        df = spark.read.parquet(corpus).select("doc_id", "text")
        build_minhash_index(df, "doc_id", "text", index_dir)
        print(json.dumps({"mode": "build", "docs": df.count(), "index": index_dir}))
        return

    if mode != "probe":
        raise SystemExit(f"unknown mode {mode!r}: build|probe")
    inc_path, index_dir, out_path = sys.argv[2], sys.argv[3], sys.argv[4]
    tau = float(sys.argv[5]) if len(sys.argv) > 5 else 0.7
    inc = spark.read.parquet(inc_path).select("doc_id", "text")
    # intra-increment dedup FIRST: a day's crawl refetches the same
    # page many times; only the min-id representative of each
    # near-dup group may survive into (and be indexed by) the corpus
    from heavykeeper_rs_spark.operators.dedup import minhash_dedup_groups

    groups = minhash_dedup_groups(inc, "doc_id", "text")
    reps = (
        inc.join(groups.withColumnRenamed("id", "doc_id"), "doc_id")
        .where(F.col("doc_id") == F.col("rep_id"))
        .select("doc_id", "text")
    )
    pairs = dedup_against_index(
        reps, "doc_id", "text", index_dir, min_est_jaccard=tau
    )
    dupes = pairs.select(F.col("new_id").alias("doc_id")).distinct()
    keepers = reps.join(dupes, "doc_id", "left_anti")
    keepers.write.mode("overwrite").parquet(out_path)
    kept = spark.read.parquet(out_path)
    # name the increment after its input path: re-running the same
    # increment (cron retry, failed driver) indexes it exactly once
    inc_id = re.sub(r"[^A-Za-z0-9._-]", "_", inc_path.rstrip("/"))[-200:]
    applied = update_minhash_index(
        kept, "doc_id", "text", index_dir, increment_id=inc_id
    )
    print(
        json.dumps(
            {
                "mode": "probe",
                "increment": inc.count(),
                "intra_increment_reps": reps.count(),
                "near_dup_pairs": pairs.count(),
                "dropped_vs_corpus": dupes.count(),
                "kept_and_indexed": kept.count(),
                "increment_applied": applied,
            }
        )
    )


if __name__ == "__main__":
    main()
