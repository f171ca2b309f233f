"""spark-submit entry point: end-to-end training-data curation pass
over a documents parquet/Iceberg table (doc_id, url?, text, lang?).

Pipeline (each stage is the library operator a 100 TB run would use):

  1. exact dedup         — hash-groupBy on the normalized content
                           fingerprint; keeps min-id representatives
  2. near-dup grouping   — MinHash banded LSH candidates, exact
                           n-gram-Jaccard verification, min-id label
                           propagation; drops non-representatives
  3. quality + lang      — JVM-side heuristics; filters low-quality docs
  4. length bucketing    — t-digest quantile buckets over token counts
                           (batching/curriculum prep)
  5. split               — id-stable train/val/test assignment (no
                           recompute leakage)
  6. stats               — token counts, top-K tokens (sketch), vocab
                           coverage, and the survivor counts per stage

Usage:

    python -m zipfile -c /tmp/hk.zip heavykeeper_rs_spark
    spark-submit --master local[8] --py-files /tmp/hk.zip \
        examples/curate_corpus_job.py <input_parquet> <output_parquet> \
        [min_quality=0.3] [jaccard=0.8]

Writes the curated corpus to <output_parquet> and prints one JSON line
of funnel stats.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    src = sys.argv[1]
    dst = sys.argv[2]
    min_quality = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    jaccard = float(sys.argv[4]) if len(sys.argv) > 4 else 0.8
    spark = SparkSession.builder.appName("hk-curate-corpus").getOrCreate()
    # --py-files zips land on sys.path once the context is up
    from pyspark.sql import functions as F

    from heavykeeper_rs_spark.functions.text import (
        doc_fingerprint,
        lang_from_scores,
        lang_scores,
        quality_score,
        token_count,
    )
    from heavykeeper_rs_spark.operators.agg import quantile_buckets
    from heavykeeper_rs_spark.operators.dedup import minhash_dedup_groups
    from heavykeeper_rs_spark.operators.sampling import split
    from heavykeeper_rs_spark.operators.topk import build_vocab, topk_tokens

    docs = spark.read.parquet(src)
    stats: dict = {"input": src, "n_input": docs.count()}

    # 1. exact dedup: min doc_id per identical normalized text
    fp = docs.select("doc_id", doc_fingerprint("text").alias("__fp"))
    keep_exact = fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    docs = docs.join(keep_exact.select("doc_id"), "doc_id", "leftsemi")
    stats["n_after_exact_dedup"] = docs.count()

    # 2. near-dup grouping (LSH recall + exact-Jaccard verify): keep
    #    only group representatives (rep_id == id)
    groups = minhash_dedup_groups(
        docs, "doc_id", "text", n_hashes=128, bands=16, min_jaccard=jaccard
    )
    reps = groups.filter(F.col("rep_id") == F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(reps, "doc_id", "leftsemi")
    stats["n_after_near_dedup"] = docs.count()

    # 3. quality + language annotation, low-quality filter
    docs = (
        docs.withColumn("quality", quality_score("text"))
        .withColumn("__s", lang_scores("text"))
        .withColumn("lang_pred", lang_from_scores("__s"))
        .drop("__s")
        .withColumn("n_tokens", token_count("text"))
        .filter(F.col("quality") >= min_quality)
    )
    stats["n_after_quality"] = docs.count()

    # 4. length buckets (batching/curriculum) + 5. id-stable split
    docs, bounds = quantile_buckets(
        docs.withColumn("__len", F.col("n_tokens").cast("double")),
        "__len",
        n_buckets=4,
        out_col="len_bucket",
    )
    docs = split(
        docs.drop("__len"), "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    stats["len_bucket_bounds"] = [round(b, 1) for b in bounds]
    stats["split_counts"] = {
        r["split"]: r["count"] for r in docs.groupBy("split").count().collect()
    }

    # 6. write + corpus stats
    docs.write.partitionBy("split").parquet(dst, mode="overwrite")
    stats["total_tokens"] = docs.agg(F.sum("n_tokens")).collect()[0][0]
    top = topk_tokens(docs, "text", k=20, tie_break_key=True).collect()
    stats["top_tokens"] = [[r["item"], r["count"]] for r in top[:10]]
    _, coverage = build_vocab(docs, "text", 10, width=1 << 18)
    stats["vocab10_coverage"] = round(coverage, 4)
    stats["output"] = dst
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
