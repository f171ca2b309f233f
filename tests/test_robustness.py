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


class TestNewOpEdges:
    def test_bloom_prefilter_empty_small_side(self, spark):
        from pyspark.sql import Row

        from heavykeeper_rs_spark.operators.joins import bloom_prefilter

        big = spark.createDataFrame([Row(k="a"), Row(k="b")])
        small = spark.createDataFrame([Row(j="zzz")]).filter("j = 'nope'")
        assert small.count() == 0
        out = bloom_prefilter(big, "k", small, "j")
        assert out.count() == 0  # empty set: nothing can match

    def test_quantile_buckets_constant_column(self, spark):
        from pyspark.sql import Row

        from heavykeeper_rs_spark.operators.agg import quantile_buckets

        df = spark.createDataFrame([Row(v=5.0)] * 50)
        bucketed, bounds = quantile_buckets(df, "v", n_buckets=4)
        # degenerate distribution: every row lands in ONE bucket
        got = bucketed.select("bucket").distinct().collect()
        assert len(got) == 1

    def test_uniform_exact_n_larger_than_table(self, spark):
        from pyspark.sql import Row

        from heavykeeper_rs_spark.operators.sampling import uniform_exact_n

        df = spark.createDataFrame([Row(x=i) for i in range(5)])
        assert uniform_exact_n(df, 100, seed=1).count() == 5

    def test_build_vocab_empty_corpus(self, spark):
        from pyspark.sql import Row

        from heavykeeper_rs_spark.operators.topk import build_vocab

        df = spark.createDataFrame([Row(text=""), Row(text="123 456 !!!")])
        vocab, cov = build_vocab(df, "text", 5, width=256)
        assert vocab.count() == 0 and cov == 0.0

    def test_ivf_search_missing_centroids_file(self, spark, tmp_path):
        import pytest as _pt

        from heavykeeper_rs_spark.operators.similarity import ivf_search_index

        with _pt.raises(FileNotFoundError):
            ivf_search_index(spark, str(tmp_path / "no-index"), [1.0, 0.0])

    def test_bucket_pairs_single_row_buckets(self, spark):
        from pyspark.sql import Row

        from heavykeeper_rs_spark.operators.dedup import _bucket_pairs

        sig = spark.createDataFrame(
            [Row(band=0, band_hash=i, id=i) for i in range(10)]
        )
        assert _bucket_pairs(sig, ["band", "band_hash"], "id", 4).count() == 0
