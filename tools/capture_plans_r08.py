"""Capture .explain("formatted") output for round-8 optimization
evidence into plans/r08/<query>_<tag>.txt.

Usage: python tools/capture_plans_r08.py <before|after> [sf_dir] [query ...]

Most relational queries are captured as the DataFrame the entry
returns. Sketch/top-k queries materialize internally (the returned DF
is a local result), so for those we capture the distributed part of
the pipeline: the keyed projection -> mapInArrow partials stage that
actually runs, rebuilt here with the same parameters as the entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from heavykeeper_rs_spark.session import get_spark
from pyspark.sql import functions as F


def _explain_str(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def _topk_partials(spark, sf_dir, src, col, cast, **kw):
    """Rebuild the keyed->partials stage topk()/topk_sketch() runs."""
    from heavykeeper_rs_spark.kernel import HKParams
    from heavykeeper_rs_spark.operators import topk as T

    df = spark.read.parquet(f"{sf_dir}/{src}.parquet")
    if cast == "string":
        keyed = df.select(F.col(col).cast("string").alias("__key"))
    else:
        keyed = df.select(F.col(col).cast("long").alias("__key"))
    params = HKParams(k=kw.get("k", 256), width=kw["width"], depth=kw["depth"],
                     decay=0.9, seed=12345)
    keyed = T._scan_parallelize(keyed) if hasattr(T, "_scan_parallelize") else keyed
    n_parts = T.estimate_partitions(keyed)
    return keyed.mapInArrow(
        T._build_partial(params, max(n_parts, 1), False), T._BLOB_SCHEMA
    )


def plan_df(name: str, spark, sf_dir: str, tag: str):
    """``tag`` selects the pipeline SHAPE for internally-materializing
    queries: 'before' = the round-start entry shape, anything else =
    the current entry shape. Lazy queries always capture their own
    returned DataFrame."""
    qs = entrymod.queries()
    from heavykeeper_rs_spark.operators import topk as T
    from heavykeeper_rs_spark.kernel import HKParams

    before = tag == "before"
    if name == "hk_topk_event_type":
        return _topk_partials(spark, sf_dir, "events", "event_type", "string",
                              width=1024, depth=4)
    if name == "hk_topk_user":
        # before: cast-to-string lane; after: int64 fast lane
        return _topk_partials(spark, sf_dir, "events", "user_id",
                              "string" if before else "long",
                              width=65536, depth=4)
    if name == "hk_weighted_topk_part":
        if before:
            return _topk_partials(spark, sf_dir, "lineitem", "l_partkey", "long",
                                  width=262144, depth=5)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
            F.col("l_partkey").cast("long").alias("__key")
        ).agg(F.sum(F.col("l_quantity").cast("long")).alias("__w"))
        params = HKParams(k=256, width=262144, depth=5, decay=0.9, seed=12345)
        n_parts = T.estimate_partitions(li)
        return li.mapInArrow(
            T._build_partial(params, max(n_parts, 1), True), T._BLOB_SCHEMA
        )
    if name in ("hk_topk_tokens", "hk_topk_tokens_inkernel"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        params = HKParams(k=256, width=65536, depth=4, decay=0.9, seed=12345)
        if before and name == "hk_topk_tokens":
            # round-start shape: explode through the Arrow channel
            from heavykeeper_rs_spark.functions import text as TX
            toks = docs.select(F.explode(TX.tokens("text")).alias("token"))
            keyed = toks.select(F.col("token").cast("string").alias("__key"))
            n_parts = T.estimate_partitions(keyed)
            return keyed.mapInArrow(
                T._build_partial(params, max(n_parts, 1), False), T._BLOB_SCHEMA
            )
        # in-kernel tokenization: text column straight into the kernel
        keyed = docs.select(F.col("text").cast("string").alias("__text"))
        if hasattr(T, "parallelize_scan"):
            keyed = T.parallelize_scan(keyed)
        n_parts = T.estimate_partitions(keyed)
        return keyed.mapInArrow(
            T._build_partial(params, max(n_parts, 1), False), T._BLOB_SCHEMA
        )
    # default: the query's own returned DataFrame
    return qs[name](spark, sf_dir)


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
    names = sys.argv[3:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r08")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app="plans-r08", master="local[8]", shuffle_partitions=8)
    for name in names:
        df = plan_df(name, spark, sf_dir, tag)
        txt = _explain_str(df)
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
