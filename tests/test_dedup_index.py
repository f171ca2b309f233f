"""Incremental dedup against a persisted MinHash index
(operators/dedup_index.py): build, probe, append, scale-plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from heavykeeper_rs_spark.operators.dedup_index import (
    build_minhash_index,
    dedup_against_index,
    minhash_index_rows,
    read_index_meta,
    update_minhash_index,
)

VOCAB = [f"word{i:02d}" for i in range(40)]
NOVEL = [f"zzz{i:02d}q" for i in range(40)]


def _doc(rng, vocab, n=30):
    return " ".join(rng.choice(vocab, size=n))


@pytest.fixture(scope="module")
def corpus_and_increment(spark, tmp_path_factory):
    rng = np.random.default_rng(5)
    corpus = [(i, _doc(rng, VOCAB)) for i in range(200)]
    inc = []
    # 10 exact duplicates of corpus docs (fresh ids)
    for j in range(10):
        inc.append((1000 + j, corpus[j * 7][1]))
    # 10 near-duplicates: one word swapped
    for j in range(10):
        words = corpus[j * 11 + 1][1].split()
        words[3] = "swapped"
        inc.append((2000 + j, " ".join(words)))
    # 20 novel docs over a disjoint vocabulary
    for j in range(20):
        inc.append((3000 + j, _doc(rng, NOVEL)))
    cdf = spark.createDataFrame(corpus, "doc_id long, text string").repartition(4)
    idf = spark.createDataFrame(inc, "doc_id long, text string").repartition(2)
    index_dir = str(tmp_path_factory.mktemp("mhidx") / "index")
    build_minhash_index(cdf, "doc_id", "text", index_dir, n_hashes=128, bands=16)
    return cdf, idf, index_dir, corpus


def test_meta_roundtrip(spark, corpus_and_increment):
    _, _, index_dir, _ = corpus_and_increment
    assert read_index_meta(spark, index_dir) == {
        "n_hashes": 128, "shingle": 5, "bands": 16, "seed": 12345,
    }


def test_index_rows_shape(spark, corpus_and_increment):
    cdf, _, _, _ = corpus_and_increment
    rows = minhash_index_rows(cdf.limit(3), "doc_id", "text")
    pdf = rows.toPandas()
    assert len(pdf) == 3 * 16
    # sig present exactly on the band-0 row, 128 lanes of 8 bytes
    assert (pdf["band"] == 0).sum() == 3
    for _, r in pdf.iterrows():
        if r["band"] == 0:
            assert len(r["sig"]) == 128 * 8
        else:
            assert r["sig"] is None


def test_increment_dedup_finds_dups_and_skips_novel(spark, corpus_and_increment):
    _, idf, index_dir, corpus = corpus_and_increment
    pairs = dedup_against_index(idf, "doc_id", "text", index_dir).toPandas()
    by_new = {int(r.new_id): (int(r.corpus_id), float(r.est_jaccard))
              for r in pairs.itertuples()}
    # every exact duplicate matches its source with est_jaccard 1.0
    for j in range(10):
        cid, est = by_new[1000 + j]
        assert cid == j * 7 and est == 1.0
    # every near-duplicate matches its source above threshold
    for j in range(10):
        assert 2000 + j in by_new
        cid, est = by_new[2000 + j]
        assert cid == j * 11 + 1 and est >= 0.7
    # novel docs produce no pairs
    assert all(nid < 3000 for nid in by_new)


def test_update_index_then_probe(spark, corpus_and_increment, tmp_path):
    cdf, _, index_dir0, corpus = corpus_and_increment
    # fresh copy of the index so this test cannot pollute the fixture
    index_dir = str(tmp_path / "index")
    build_minhash_index(cdf, "doc_id", "text", index_dir)
    extra = spark.createDataFrame(
        [(500, corpus[0][1] + " tail tail")], "doc_id long, text string"
    )
    update_minhash_index(extra, "doc_id", "text", index_dir)
    probe = spark.createDataFrame(
        [(9000, corpus[0][1] + " tail tail")], "doc_id long, text string"
    )
    pairs = dedup_against_index(probe, "doc_id", "text", index_dir).toPandas()
    got = {(int(r.new_id), int(r.corpus_id)) for r in pairs.itertuples()}
    assert (9000, 500) in got  # the appended doc is probe-visible
    assert any(c == 0 for _, c in got)  # and so is the original


def test_scale_plan_shape(spark, corpus_and_increment):
    """The corpus side must never shuffle: both corpus joins are
    broadcast joins (increment side broadcast), and the bucket probe
    reads only (id, band, band_hash) — parquet column pruning keeps
    signature bytes out of pass 1."""
    _, idf, index_dir, _ = corpus_and_increment
    out = dedup_against_index(idf, "doc_id", "text", index_dir)
    # result correctness is asserted elsewhere; here check the upstream
    # plan that produced it was broadcast-shaped. localCheckpoint hides
    # the executed plan, so re-derive the candidate join lazily:
    index = spark.read.parquet(f"{index_dir}/data")
    inc_b = minhash_index_rows(idf, "doc_id", "text").select(
        F.col("id").alias("new_id"), "band", "band_hash"
    )
    cand = index.select(F.col("id").alias("corpus_id"), "band", "band_hash").join(
        F.broadcast(inc_b), ["band", "band_hash"]
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ReadSchema: struct<id:bigint,band:bigint,band_hash:bigint>" in plan
    assert out.count() >= 20


def test_band_hash_parity_with_batch_dedup_path(spark, corpus_and_increment):
    """Index rows and minhash_signatures must emit IDENTICAL
    (id, band, band_hash) triples — both run dedup._sig_and_bands, and
    a persisted index probed by a future build must stay
    hash-compatible with the batch path."""
    from heavykeeper_rs_spark.operators.dedup import minhash_signatures

    cdf, _, _, _ = corpus_and_increment
    sub = cdf.limit(50)
    a = {
        (r["id"], r["band"], r["band_hash"])
        for r in minhash_index_rows(sub, "doc_id", "text").collect()
    }
    b = {
        (r["id"], r["band"], r["band_hash"])
        for r in minhash_signatures(sub, "doc_id", "text").collect()
    }
    assert a == b and len(a) == 50 * 16


class TestIdempotentIncrements:
    """Round-7 verdict item 2: named increments are exactly-once —
    the filesystem _SUCCESS marker is the applied manifest."""

    def test_reapply_same_increment_is_noop(self, spark, corpus_and_increment, tmp_path):
        cdf, _, _, corpus = corpus_and_increment
        index_dir = str(tmp_path / "idx")
        build_minhash_index(cdf.limit(20), "doc_id", "text", index_dir)
        extra = spark.createDataFrame(
            [(700, corpus[1][1])], "doc_id long, text string"
        )
        assert update_minhash_index(extra, "doc_id", "text", index_dir,
                                    increment_id="crawl-2026-08-17") is True
        n1 = spark.read.parquet(index_dir + "/data").count()
        # replaying the exact same increment writes nothing
        assert update_minhash_index(extra, "doc_id", "text", index_dir,
                                    increment_id="crawl-2026-08-17") is False
        assert spark.read.parquet(index_dir + "/data").count() == n1
        # a DIFFERENT id applies
        assert update_minhash_index(extra, "doc_id", "text", index_dir,
                                    increment_id="crawl-2026-08-18") is True
        assert spark.read.parquet(index_dir + "/data").count() > n1

        from heavykeeper_rs_spark.operators.dedup_index import (
            applied_index_increments,
        )

        assert applied_index_increments(spark, index_dir) == [
            "__base__", "crawl-2026-08-17", "crawl-2026-08-18",
        ]

    def test_crashed_partial_increment_is_retried_clean(
        self, spark, corpus_and_increment, tmp_path
    ):
        import os

        cdf, _, _, corpus = corpus_and_increment
        index_dir = str(tmp_path / "idx")
        build_minhash_index(cdf.limit(20), "doc_id", "text", index_dir)
        # simulate a crashed write: increment dir with files, no _SUCCESS
        part = index_dir + "/data/inc=crashed"
        os.makedirs(part)
        with open(part + "/part-00000-junk.parquet", "wb") as f:
            f.write(b"not parquet")
        extra = spark.createDataFrame(
            [(701, corpus[2][1])], "doc_id long, text string"
        )
        assert update_minhash_index(extra, "doc_id", "text", index_dir,
                                    increment_id="crashed") is True
        assert not os.path.exists(part + "/part-00000-junk.parquet")
        # the retried increment is valid and probe-visible
        probe = spark.createDataFrame(
            [(9100, corpus[2][1])], "doc_id long, text string"
        )
        pairs = dedup_against_index(probe, "doc_id", "text", index_dir).toPandas()
        assert (9100, 701) in {
            (int(r.new_id), int(r.corpus_id)) for r in pairs.itertuples()
        }

    def test_v1_meta_rejected_with_rebuild_message(self, spark, tmp_path):
        index_dir = str(tmp_path / "oldidx")
        spark.createDataFrame(
            [(128, 5, 16, 12345, 1)],
            "n_hashes long, shingle long, bands long, seed long, version long",
        ).write.parquet(index_dir + "/_meta")
        with pytest.raises(ValueError, match="rebuild"):
            read_index_meta(spark, index_dir)

    def test_bad_increment_id_rejected(self, spark, corpus_and_increment, tmp_path):
        cdf, _, _, corpus = corpus_and_increment
        index_dir = str(tmp_path / "idx")
        build_minhash_index(cdf.limit(5), "doc_id", "text", index_dir)
        extra = spark.createDataFrame(
            [(702, corpus[0][1])], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="increment_id"):
            update_minhash_index(extra, "doc_id", "text", index_dir,
                                 increment_id="../escape")

    def test_ivf_append_idempotent(self, spark, tmp_path):
        from heavykeeper_rs_spark.operators.similarity import (
            ivf_append_index,
            ivf_build_index,
            ivf_search_index,
        )

        rng = np.random.default_rng(3)
        vecs = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(64)]
        emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        idxp = str(tmp_path / "ivf")
        ivf_build_index(emb, "vec_id", "embedding", idxp, n_centroids=4, seed=1)
        n0 = spark.read.parquet(idxp).count()
        extra = spark.createDataFrame(
            [(1000, vecs[0][1])], "vec_id long, embedding array<double>"
        )
        assert ivf_append_index(extra, "vec_id", "embedding", idxp,
                                increment_id="day1") is True
        n1 = spark.read.parquet(idxp).count()
        assert n1 == n0 + 1
        assert ivf_append_index(extra, "vec_id", "embedding", idxp,
                                increment_id="day1") is False
        assert spark.read.parquet(idxp).count() == n1
        # the appended vector is searchable (it IS vec 0, so top-1)
        top = ivf_search_index(spark, idxp, vecs[0][1], k=2, n_probe=2).toPandas()
        assert set(top["id"]) == {0, 1000}

    def test_ivf_legacy_flat_layout_rejected(self, spark, tmp_path):
        import os

        from heavykeeper_rs_spark.operators.similarity import ivf_append_index

        idxp = str(tmp_path / "ivf_old")
        os.makedirs(idxp + "/centroid=0")
        emb = spark.createDataFrame(
            [(1, [0.1, 0.2])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="flat layout"):
            ivf_append_index(emb, "vec_id", "embedding", idxp)
