"""Sampling operators: exact-n, stratified, id-stable splits."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from heavykeeper_rs_spark.operators.sampling import (
    split,
    stratified_exact_n,
    uniform_exact_n,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_uniform_exact_n(spark, docs):
    s = uniform_exact_n(docs, 37, seed=1)
    assert s.count() == 37
    assert s.columns == docs.columns
    # a sample is a subset of the table
    assert s.join(docs, "doc_id", "leftsemi").count() == 37
    # seed changes the draw
    ids1 = {r["doc_id"] for r in s.collect()}
    ids2 = {r["doc_id"] for r in uniform_exact_n(docs, 37, seed=2).collect()}
    assert ids1 != ids2


def test_stratified_exact_n(spark, docs):
    per = stratified_exact_n(docs, "lang", 5, seed=1).groupBy("lang").count().collect()
    sizes = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert all(r["count"] == min(5, sizes[r["lang"]]) for r in per)
    assert {r["lang"] for r in per} == set(sizes)


def test_split_stable_and_partitioning(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = split(docs, "doc_id", w, seed=9)
    b = split(docs.repartition(7), "doc_id", w, seed=9)
    # identical assignment regardless of physical layout
    ja = {(r["doc_id"], r["split"]) for r in a.select("doc_id", "split").collect()}
    jb = {(r["doc_id"], r["split"]) for r in b.select("doc_id", "split").collect()}
    assert ja == jb
    # exhaustive partition: every row in exactly one split
    assert a.count() == docs.count()
    assert set(r["split"] for r in a.select("split").distinct().collect()) <= set(w)
    with pytest.raises(ValueError, match="sum to 1"):
        split(docs, "doc_id", {"a": 0.5, "b": 0.4})
