"""Empty/null-input robustness: every operator must return an empty or
well-formed result, never crash, on degenerate inputs."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


@pytest.fixture(scope="module")
def null_docs(spark):
    return spark.createDataFrame(
        [(1, None), (2, None)], "doc_id bigint, text string"
    )


def test_topk_empty_and_null(spark, empty_docs, null_docs):
    from heavykeeper_rs_spark.operators.topk import topk, topk_tokens

    assert topk(empty_docs, "text", k=3, width=64, depth=2).count() == 0
    assert topk(null_docs, "text", k=3, width=64, depth=2).count() == 0
    assert topk_tokens(empty_docs, "text", k=3, width=64).count() == 0
    assert topk_tokens(null_docs, "text", k=3, width=64).count() == 0


def test_grouped_empty_and_null(spark, empty_docs, null_docs):
    from heavykeeper_rs_spark.operators.topk import topk_by_group

    e = empty_docs.withColumn("g", F.lit("a"))
    assert topk_by_group(e, "g", "text", k=2, width=64, depth=2).count() == 0
    n = null_docs.withColumn("g", F.lit("a"))
    assert topk_by_group(n, "g", "text", k=2, width=64, depth=2).count() == 0


def test_estimate_with_nulls(spark):
    from heavykeeper_rs_spark.kernel import HeavyKeeper, HKParams
    from heavykeeper_rs_spark.operators.topk import estimate

    sk = HeavyKeeper(HKParams(k=4, width=64, depth=2))
    sk.add_batch(np.asarray([b"a", b"a", b"b"], dtype=object))
    df = spark.createDataFrame([Row(k="a"), Row(k=None), Row(k="zz")])
    got = {r["k"]: r["est_count"] for r in estimate(df, "k", sk).collect()}
    assert got["a"] == 2 and got[None] == 0 and got["zz"] == 0


def test_dedup_similarity_empty(spark, empty_docs):
    from heavykeeper_rs_spark.operators.dedup import (
        exact_dedup,
        minhash_signatures,
        rolling_fingerprints,
        simhash_signatures,
    )

    assert exact_dedup(empty_docs, "doc_id", "text").count() == 0
    assert minhash_signatures(empty_docs, "doc_id", "text").count() == 0
    assert simhash_signatures(empty_docs, "doc_id", "text").count() == 0
    assert rolling_fingerprints(empty_docs, "doc_id", "text").count() == 0


def test_minhash_null_text(spark, null_docs):
    from heavykeeper_rs_spark.operators.dedup import minhash_signatures

    # null text hashes as empty string; must not crash and both
    # null-text docs collide (identical empty content)
    sigs = minhash_signatures(null_docs, "doc_id", "text", n_hashes=16, bands=4)
    assert sigs.count() == 2 * 4


def test_sketch_agg_empty(spark, empty_docs):
    from heavykeeper_rs_spark.operators.agg import hll_distinct

    assert hll_distinct(empty_docs, "text") == 0.0


def test_window_ops_empty(spark, empty_docs):
    from heavykeeper_rs_spark.operators.window_ops import asof_join, session_stats

    e = empty_docs.withColumn("ts", F.current_timestamp())
    assert session_stats(e, "doc_id", "ts").count() == 0
    r = e.select("doc_id", F.col("ts").alias("p_ts"), F.lit(1.0).alias("v"))
    assert (
        asof_join(e, r, ["doc_id"], "ts", "p_ts", ["v"]).count() == 0
    )
