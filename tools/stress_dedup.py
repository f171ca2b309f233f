"""Full-pipeline dedup stress rehearsal (round-4 verdict #7).

Runs the COMPLETE near-dup curation pipeline a 100 TB job runs —
signatures -> size-gated LSH candidates -> exact n-gram Jaccard
verify -> min-id label propagation -> per-component representatives —
at 3M documents (10x the bench SF, deliberately dup-degenerate
synthetic webtext), reporting per-stage wall time, row counts,
convergence rounds and peak RSS. Results land in BENCH.md.

Usage: python tools/stress_dedup.py [n_docs]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from heavykeeper_rs_spark.operators.dedup import (
    label_propagate,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from heavykeeper_rs_spark.session import get_spark
from heavykeeper_rs_spark.sources.synth import webtext


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    spark = get_spark(app="stress-dedup", master="local[32]", shuffle_partitions=32)
    out: dict = {"n_docs": n_docs}

    data_dir = os.path.join(tempfile.gettempdir(), f"hk_stress_docs_{n_docs}")
    if not os.path.exists(data_dir):
        webtext(spark, n_docs, partitions=64).select("doc_id", "text").write.parquet(
            data_dir, mode="overwrite"
        )
    docs = spark.read.parquet(data_dir)

    t0 = time.time()
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=128, bands=16)
    cands = lsh_candidate_pairs(sigs, bucket_cap=64, oversize="star")
    # materialize candidates once: both verify and the count need them,
    # and a 100 TB job would persist this boundary anyway
    cand_dir = os.path.join(tempfile.gettempdir(), f"hk_stress_cands_{n_docs}")
    cands.write.parquet(cand_dir, mode="overwrite")
    cands = spark.read.parquet(cand_dir)
    out["candidate_pairs"] = cands.count()
    out["stage_candidates_sec"] = round(time.time() - t0, 1)

    t1 = time.time()
    verified = ngram_jaccard_pairs(
        docs, "doc_id", "text", cands, n=5, min_jaccard=0.8
    ).select("id_a", "id_b")
    ver_dir = os.path.join(tempfile.gettempdir(), f"hk_stress_ver_{n_docs}")
    verified.write.parquet(ver_dir, mode="overwrite")
    verified = spark.read.parquet(ver_dir)
    out["verified_pairs"] = verified.count()
    out["stage_verify_sec"] = round(time.time() - t1, 1)

    t2 = time.time()
    ids = docs.select(F.col("doc_id").cast("long").alias("id"))
    stats: dict = {}
    labels = label_propagate(ids, verified, max_rounds=20, stats=stats)
    reps = labels.filter(F.col("rep_id") != F.col("id"))
    out["dup_rows_folded"] = reps.count()
    out["components"] = labels.select("rep_id").distinct().count()
    out["lp_rounds"] = stats.get("rounds")
    out["lp_converged"] = stats.get("converged")
    out["stage_group_sec"] = round(time.time() - t2, 1)

    out["total_sec"] = round(time.time() - t0, 1)
    out["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
