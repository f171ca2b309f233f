"""spark-submit entry point: top-K domains + tokens over a webtext
parquet table.

Usage (north-rule deployment shape — the package ships as a zip via
--py-files, no install step on executors):

    python -m zipfile -c /tmp/hk.zip heavykeeper_rs_spark
    spark-submit --master local[8] --py-files /tmp/hk.zip \
        examples/topk_domains_job.py <input_parquet> <k> [checkpoint_dir]

On a real cluster swap --master for YARN/K8s and point the input at
an Iceberg/parquet table path; everything else is unchanged.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    path = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    ckpt = sys.argv[3] if len(sys.argv) > 3 else None
    spark = SparkSession.builder.appName("hk-topk-domains").getOrCreate()
    # --py-files zips land on sys.path once the context is up, so the
    # package import happens after getOrCreate()
    from heavykeeper_rs_spark.functions.text import domain_of
    from heavykeeper_rs_spark.kernel import HKParams
    from heavykeeper_rs_spark.operators.topk import topk, topk_tokens
    df = spark.read.parquet(path)
    cols = set(df.columns)
    out: dict = {"input": path, "k": k}
    if "url" in cols:
        with_dom = df.withColumn("domain", domain_of("url"))
        if ckpt:
            from heavykeeper_rs_spark.plans.checkpoint import topk_checkpointed

            sk, rep = topk_checkpointed(
                with_dom,
                "domain",
                HKParams(k=k, width=65536, depth=4),
                ckpt,
                lineage=path,
            )
            out["domains"] = [
                (item.decode("utf-8", "replace"), c) for item, c in sk.list()
            ]
            out["checkpoint"] = {
                "resumed": rep.resumed_partitions,
                "computed": rep.computed_partitions,
            }
        else:
            out["domains"] = [
                (r["item"], r["count"])
                for r in topk(with_dom, "domain", k=k, width=65536).collect()
            ]
    if "text" in cols:
        out["tokens"] = [
            (r["item"], r["count"])
            for r in topk_tokens(df, "text", k=k, width=65536).collect()
        ]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
