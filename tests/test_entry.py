"""Entry-contract smoke tests: entry() runs and yields rows; every
queries() entry runs at sf0.001; binary flow keys flow through topk."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from heavykeeper_rs_spark.operators.topk import topk_sketch
from heavykeeper_rs_spark.sources.synth import flows


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"item", "count"}


def test_every_query_has_oracle_or_is_documented(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    # rows-only entries must be the genuinely non-SQL-expressible ones
    assert rows_only <= {"simhash_near_dup_pairs", "embedding_near_dup"}


@pytest.mark.slow
def test_all_queries_run_at_sf0001(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_binary_flow_keys_topk(spark):
    """ip_files analog: 13-byte binary keys through the sketch."""
    fl = flows(spark, 20000, n_flows=500, alpha=2.0, partitions=4)
    sample = fl.limit(1).collect()[0]["flow_key"]
    assert len(sample) == 13
    sk = topk_sketch(fl, "flow_key", k=10, width=8192, depth=4)
    top = sk.list()
    assert len(top) == 10
    assert all(isinstance(item, bytes) and len(item) == 13 for item, _ in top)
    truth = {
        bytes(r["flow_key"]): r["cnt"]
        for r in fl.groupBy("flow_key")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(10)
        .collect()
    }
    got = dict(top)
    hits = sum(1 for k in truth if k in got)
    assert hits >= 9  # power-law head: near-perfect recall

    est = sk.estimate(np.asarray(list(truth), dtype=object))
    for (k, v), e in zip(truth.items(), est):
        assert abs(int(e) - v) <= max(2, 0.01 * v)


def test_grouped_blob_tree_multilevel(spark):
    """partitions >> fan_in exercises the intermediate
    groupBy(group, salt // fan_in) merge levels; results must equal the
    single-level path and the exact answer (exact regime)."""
    from pyspark.sql import functions as F

    from heavykeeper_rs_spark.operators.topk import topk_by_group

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartition(20)
        .withColumn("bucket", (F.col("user_id") % 3).cast("string"))
    )
    got = topk_by_group(ev, "bucket", "event_type", k=2, width=1024, depth=4, fan_in=4)
    rows = {(r["group"], r["item"], r["count"]) for r in got.collect()}
    exact = (
        ev.groupBy("bucket", "event_type")
        .agg(F.count("*").alias("count"))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "bucket"
                ).orderBy(F.desc("count"), "event_type")
            ),
        )
        .filter("rn <= 2")
    )
    want = {(r["bucket"], r["event_type"], r["count"]) for r in exact.collect()}
    assert rows == want


def test_grouped_builder_bounded_memory_eviction(spark):
    """max_live_groups far below the group count forces early partial
    emission + LRU eviction; the merge tree must still produce exact
    results (exact regime) — high-cardinality group keys cost bounded
    mapper memory."""
    from pyspark.sql import functions as F

    from heavykeeper_rs_spark.operators.topk import topk_by_group

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "bucket", (F.col("user_id") % 50).cast("string")
    )
    got = topk_by_group(
        ev, "bucket", "event_type", k=2, width=1024, depth=4, max_live_groups=8
    )
    rows = {(r["group"], r["item"], r["count"]) for r in got.collect()}
    from pyspark.sql.window import Window

    exact = (
        ev.groupBy("bucket", "event_type")
        .agg(F.count("*").alias("count"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("bucket").orderBy(F.desc("count"), "event_type")
            ),
        )
        .filter("rn <= 2")
    )
    want = {(r["bucket"], r["event_type"], r["count"]) for r in exact.collect()}
    assert rows == want
