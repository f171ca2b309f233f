"""Partition pruning on a hive-partitioned webtext table — the layout
a 10^12-doc Iceberg/parquet corpus would use (partition by lang/date so
per-language or per-crawl queries never touch other partitions)."""

import pytest
from pyspark.sql import functions as F

from heavykeeper_rs_spark.operators.topk import topk
from heavykeeper_rs_spark.sources.synth import webtext


@pytest.fixture(scope="module")
def partitioned_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wt_part"))
    webtext(spark, 4000, seed=42, partitions=4).write.partitionBy("lang").parquet(
        d, mode="overwrite"
    )
    return d


def test_scan_prunes_partitions(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir).filter(F.col("lang") == "de")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:200]
    # and the result only contains the partition's rows
    langs = {r[0] for r in df.select("lang").distinct().collect()}
    assert langs == {"de"}


def test_topk_on_pruned_partition_matches_full_filter(spark, partitioned_dir):
    part = spark.read.parquet(partitioned_dir).filter(F.col("lang") == "fr")
    full = webtext(spark, 4000, seed=42, partitions=4).filter(F.col("lang") == "fr")
    got = topk(part.withColumn("d", F.substring_index(F.substring_index("url", "://", -1), "/", 1)),
               "d", k=5, width=8192, tie_break_key=True)
    want = topk(full.withColumn("d", F.substring_index(F.substring_index("url", "://", -1), "/", 1)),
                "d", k=5, width=8192, tie_break_key=True)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
