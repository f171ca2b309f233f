"""spark-submit entry point: the north-star pipeline over RAW Common-
Crawl-style archives — WARC in, elephant flows out.

    python -m zipfile -c /tmp/hk.zip heavykeeper_rs_spark
    spark-submit --master local[8] --py-files /tmp/hk.zip \
        examples/warc_topk_job.py <warc_dir> <k> [out_parquet]

Set HK_WARC_STREAM=1 to read through ``read_warc_stream`` instead —
the bounded-task-memory path for multi-GB segments (see
sources/warc.py; pass object-store openers there if needed).

Stages (each the scale-safe path — blob-only shuffles, no row-wise
Python):
  1. WARC decode: per-record-gzip archives -> (url, warc_ts, html,
     text) rows, file-level parallelism (sources/warc.py).
  2. Top-K domains (HeavyKeeper over domain_of(url)).
  3. Top-K tokens (in-kernel zero-object tokenizer).
  4. Exact dedup rate (hash-groupBy on the normalized fingerprint).
  5. Optionally persist the curated table size-targeted
     (sources/writer.write_sized) for downstream Iceberg ingestion.

With no arguments, synthesizes a small WARC fixture first so the job
is runnable end-to-end in this container.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import SparkSession


def main() -> None:
    warc_dir = sys.argv[1] if len(sys.argv) > 1 else None
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    spark = SparkSession.builder.appName("hk-warc-topk").getOrCreate()
    from pyspark.sql import functions as F

    from heavykeeper_rs_spark.functions.text import domain_of
    from heavykeeper_rs_spark.operators.dedup import exact_dedup
    from heavykeeper_rs_spark.operators.topk import topk, topk_tokens
    from heavykeeper_rs_spark.sources.warc import read_warc

    if warc_dir is None:
        import tempfile

        from heavykeeper_rs_spark.sources.synth import webtext
        from heavykeeper_rs_spark.sources.warc import write_warc_file

        warc_dir = tempfile.mkdtemp(prefix="hk_warc_demo_")
        docs = webtext(spark, 2000).select(
            F.concat(F.lit("https://site-"), (F.col("doc_id") % 50),
                     F.lit(".test/p/"), F.col("doc_id")).alias("url"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
            "html",
        ).collect()
        recs = [(r["url"], r["ts"], bytes(r["html"])) for r in docs]
        for i in range(4):
            write_warc_file(recs[i::4], f"{warc_dir}/part{i}.warc.gz")

    if os.environ.get("HK_WARC_STREAM"):
        from heavykeeper_rs_spark.sources.warc import read_warc_stream

        pages = read_warc_stream(spark, warc_dir)
    else:
        pages = read_warc(spark, warc_dir)
    # decode once, reuse across all downstream aggregates
    pages.cache()
    n_pages = pages.count()

    out: dict = {"warc_dir": warc_dir, "n_pages": n_pages, "k": k}
    doms = pages.withColumn("domain", domain_of("url"))
    out["top_domains"] = [
        (r["item"], r["count"])
        for r in topk(doms, "domain", k=k, width=65536, depth=4).collect()
    ]
    out["top_tokens"] = [
        (r["item"], r["count"])
        for r in topk_tokens(pages, "text", k=k, width=65536, depth=4).collect()
    ]
    groups = exact_dedup(pages.withColumn("doc_id", F.xxhash64("url")), "doc_id", "text")
    n_groups = groups.count()
    out["dup_rate"] = round(1.0 - n_groups / max(n_pages, 1), 4)
    if out_path:
        from heavykeeper_rs_spark.sources.writer import write_sized

        out["out_files"] = write_sized(
            pages.select("url", "warc_ts", "text"), out_path, target_mb=256
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
