"""Dedup, similarity-search, and multimodal plumbing tests."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from heavykeeper_rs_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup_groups,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from heavykeeper_rs_spark.operators.multimodal import (
    extract_features,
    fake_image_decoder,
    frame_sample_plan,
    stub_decoder,
)
from heavykeeper_rs_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm "
    "windowsill and the rain falls softly on the quiet street outside the old house"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # clusters of near-duplicates + unique docs
    for i in range(5):
        rows.append(Row(doc_id=i, text=BASE))  # exact dup cluster {0..4}
    rows.append(Row(doc_id=10, text=BASE.replace("quick", "swift")))  # near-dup of base
    rows.append(Row(doc_id=11, text=BASE.replace("rain", "snow").replace("cat", "bird")))
    for i in range(20, 40):
        rows.append(
            Row(doc_id=i, text=f"completely different document number {i} about topic "
                + " ".join(f"word{i}x{j}" for j in range(25)))
        )
    return spark.createDataFrame(rows).cache()


class TestExactDedup:
    def test_groups(self, spark, docs):
        out = {r["keep_id"]: r["dup_count"] for r in exact_dedup(docs, "doc_id", "text").collect()}
        assert out[0] == 5  # the 5 identical docs collapse to doc 0
        assert sum(out.values()) == docs.count()


class TestMinHash:
    def test_signatures_shape(self, spark, docs):
        sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=64, bands=8)
        assert sigs.columns == ["id", "band", "band_hash"]
        assert sigs.count() == docs.count() * 8

    def test_near_dups_found_and_no_false_groups(self, spark, docs):
        # n=128, b=16, r=8 -> LSH threshold ~ (1/16)^(1/8) ~ 0.71
        labels = minhash_dedup_groups(docs, "doc_id", "text", n_hashes=128, bands=16)
        lab = {r["id"]: r["rep_id"] for r in labels.collect()}
        # exact dups + near-dups all map to rep 0
        for i in [0, 1, 2, 3, 4, 10]:
            assert lab[i] == 0, (i, lab[i])
        # unique docs stay their own representative
        for i in range(20, 40):
            assert lab[i] == i

    def test_jaccard_verification(self, spark, docs):
        sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=64, bands=16)
        cands = lsh_candidate_pairs(sigs)
        verified = ngram_jaccard_pairs(docs, "doc_id", "text", cands, n=5, min_jaccard=0.8)
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
        assert (0, 1) in got and got[(0, 1)] == 1.0
        assert all(j >= 0.8 for j in got.values())


class TestSimHash:
    def test_exact_dups_same_signature(self, spark, docs):
        sigs = {r["id"]: r["simhash"] for r in simhash_signatures(docs, "doc_id", "text").collect()}
        assert sigs[0] == sigs[1] == sigs[4]

    def test_near_pairs(self, spark, docs):
        sigdf = simhash_signatures(docs, "doc_id", "text")
        pairs = simhash_near_pairs(sigdf, max_hamming=6)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (0, 1) in got  # identical text -> hamming 0
        # dissimilar docs don't pair up
        for a, b in got:
            assert not (a >= 20 and b >= 20 and a != b) or abs(a - b) == 0


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    base = rng.standard_normal(16).astype(np.float32)
    rows = []
    for i in range(3):  # near-dups of base
        v = base + rng.standard_normal(16).astype(np.float32) * 0.01
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    for i in range(10, 60):
        v = rng.standard_normal(16).astype(np.float32)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    return spark.createDataFrame(rows).cache()


class TestSimilarity:
    def test_brute_force_topk(self, spark, vectors):
        q = [r["embedding"] for r in vectors.filter("vec_id = 0").collect()][0]
        top = brute_force_topk(vectors, "vec_id", "embedding", q, k=3).collect()
        assert top[0]["vec_id"] == 0 and top[0]["cosine"] > 0.9999
        assert {r["vec_id"] for r in top} >= {0, 1, 2}

    def test_lsh_topk_finds_near_dups(self, spark, vectors):
        q = [r["embedding"] for r in vectors.filter("vec_id = 0").collect()][0]
        top = lsh_topk(vectors, "vec_id", "embedding", q, k=3, n_bits=16, bands=4)
        ids = {r["vec_id"] for r in top.collect()}
        assert 0 in ids and len(ids & {0, 1, 2}) >= 2

    def test_embedding_near_dup_pairs(self, spark, vectors):
        pairs = embedding_near_dup_pairs(
            vectors, "vec_id", "embedding", dim=16, tau=0.99, n_bits=16, bands=4
        )
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert {(0, 1), (0, 2), (1, 2)} <= got
        for a, b in got:
            assert a in (0, 1, 2) and b in (0, 1, 2)

    def test_ivf_topk_recall(self, spark, vectors):
        from heavykeeper_rs_spark.operators.similarity import ivf_topk

        q = [r["embedding"] for r in vectors.filter("vec_id = 0").collect()][0]
        exact = {
            r["vec_id"]
            for r in brute_force_topk(vectors, "vec_id", "embedding", q, k=5).collect()
        }
        approx = ivf_topk(
            vectors, "vec_id", "embedding", q, k=5, n_centroids=8, n_probe=4
        )
        got = {r["vec_id"] for r in approx.collect()}
        # near-dup cluster of the query must be found; recall >= 3/5
        assert 0 in got and len(got & exact) >= 3

    def test_on_driver_embeddings_table(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = [r["embedding"] for r in emb.limit(1).collect()][0]
        top = brute_force_topk(emb, "vec_id", "embedding", [float(x) for x in q], k=5)
        rows = top.collect()
        assert len(rows) == 5 and rows[0]["cosine"] >= rows[-1]["cosine"]

    def test_lossy_banding_recall_bound(self, spark):
        """The production recall-vs-cost regime (8 two-bit bands out of
        16 signature bits) must recover >= 90% of exact cosine>=0.40
        pairs on the real embeddings table — the former
        pipeline_ops_ok lsh_recall flag, kept here after round 6
        promoted the complete 28x2-bit regime to the row-level
        ``lsh_banded_pairs`` gate (which can't see the lossy knob)."""
        from heavykeeper_rs_spark.operators.similarity import brute_force_pairs

        emb = (
            spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
            .orderBy("vec_id")
            .limit(4096)
            .withColumn("emb_d", F.col("embedding").cast("array<double>"))
        )
        dim = len(emb.select("emb_d").first()[0])
        n_exact = brute_force_pairs(emb, "vec_id", "emb_d", tau=0.40).count()
        # bucket_cap must exceed the 2-bit-band bucket size at this
        # scale or star-thinning (not banding) dominates the measure
        n_lsh = embedding_near_dup_pairs(
            emb, "vec_id", "emb_d", dim=dim, tau=0.40, n_bits=16, bands=8,
            bucket_cap=4096,
        ).count()
        assert n_exact > 0 and n_lsh >= 0.9 * n_exact


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [
            Row(media_id=1, blob=bytes(range(256)), duration_ms=3500),
            Row(media_id=2, blob=b"\x00" * 64, duration_ms=1000),
            Row(media_id=3, blob=b"", duration_ms=None),  # corrupt
        ]
        return spark.createDataFrame(rows)

    def test_stub_decoder_marks_rows_failed(self, spark, media):
        out = extract_features(media, "media_id", "blob", decoder=stub_decoder)
        rows = {r["id"]: r for r in out.collect()}
        assert all(not r["ok"] for r in rows.values())
        assert "NotImplementedError" in rows[1]["error"]

    def test_fake_decoder_plumbing(self, spark, media):
        out = extract_features(media, "media_id", "blob", decoder=fake_image_decoder)
        rows = {r["id"]: r for r in out.collect()}
        assert rows[1]["ok"] and len(rows[1]["feature"]) == 8
        assert abs(sum(rows[1]["feature"]) - 1.0) < 1e-5
        assert not rows[3]["ok"] and "ValueError" in rows[3]["error"]

    def test_frame_sample_plan(self, spark, media):
        plan = frame_sample_plan(media, "media_id", "blob", every_ms=1000)
        got = {(r["media_id"], r["sample_ms"]) for r in plan.collect()}
        assert {(1, 0), (1, 1000), (1, 2000), (1, 3000), (2, 0), (3, 0)} == got


class TestRollingFingerprintExact:
    """The vectorized Rabin–Karp must equal a scalar Horner evaluation
    mod 2^61-1 (the documented polynomial), not merely be deterministic."""

    def test_matches_scalar_horner(self, spark):
        from heavykeeper_rs_spark.operators.dedup import (
            _RH_BASE,
            _RH_MOD,
            rolling_fingerprints,
        )

        rng = np.random.default_rng(7)
        texts = [
            "".join(chr(rng.integers(32, 127)) for _ in range(int(rng.integers(1, 200))))
            for _ in range(25)
        ] + ["", "a", "éé unicode ☃"]
        rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows)
        got = {
            r["id"]: r["rfp"]
            for r in rolling_fingerprints(df, "doc_id", "text").collect()
        }

        def horner(t: str) -> int:
            b = " ".join(t.lower().split()).encode("utf-8")
            h = 0
            for byte in b:
                h = (h * _RH_BASE + byte) % _RH_MOD
            return h

        for i, t in enumerate(texts):
            assert got[i] == horner(t), f"doc {i}"


class TestOversizedBuckets:
    """Degenerate (boilerplate) buckets must not silently drop pairs:
    star thinning keeps every member connected."""

    def test_star_preserves_connectivity(self, spark):
        # 200 identical docs -> every band bucket has 200 members,
        # far above bucket_cap
        rows = [Row(doc_id=i, text=BASE) for i in range(200)]
        df = spark.createDataFrame(rows)
        sigs = minhash_signatures(df, "doc_id", "text", n_hashes=32, bands=4)
        pairs = lsh_candidate_pairs(sigs, bucket_cap=64).collect()
        # star edges: every doc is connected to doc 0
        connected = {r["id_b"] for r in pairs if r["id_a"] == 0}
        assert connected == set(range(1, 200))
        # and dedup grouping resolves ALL of them into one group
        groups = minhash_dedup_groups(
            df, "doc_id", "text", n_hashes=32, bands=4, min_jaccard=0.8
        ).collect()
        assert {r["rep_id"] for r in groups} == {0}

    def test_drop_mode_loses_and_stats_report(self, spark):
        from heavykeeper_rs_spark.operators.dedup import lsh_bucket_stats

        rows = [Row(doc_id=i, text=BASE) for i in range(100)]
        df = spark.createDataFrame(rows)
        sigs = minhash_signatures(df, "doc_id", "text", n_hashes=32, bands=4)
        dropped = lsh_candidate_pairs(sigs, bucket_cap=64, oversize="drop")
        assert dropped.count() == 0  # the old silent-loss behavior, now opt-in
        stats = lsh_bucket_stats(sigs, bucket_cap=64).collect()[0]
        assert stats["n_oversized"] >= 1
        assert stats["max_bucket"] == 100


class TestReservoirSample:
    def test_covers_all_partitions(self, spark):
        from heavykeeper_rs_spark.operators.similarity import _reservoir_sample

        rows = [Row(vid=i, vec=[float(i), 0.0]) for i in range(4000)]
        df = spark.createDataFrame(rows).repartition(8)
        sample = _reservoir_sample(df, "vec", 256, seed=42)
        assert sample.shape[1] == 2
        assert sample.shape[0] >= 256
        # unbiased across the id range: head-limit sampling would
        # concentrate in one shard; reservoir must span the range
        firsts = sample[:, 0]
        assert firsts.min() < 1000 and firsts.max() > 3000
        # deterministic
        again = _reservoir_sample(df, "vec", 256, seed=42)
        assert np.array_equal(np.sort(firsts), np.sort(again[:, 0]))


class TestJvmSimhash64:
    def test_full_64_bits_and_locality(self, spark):
        from heavykeeper_rs_spark.functions.text import simhash64

        texts = [
            Row(doc_id=0, text=BASE),
            Row(doc_id=1, text=BASE),                       # identical
            Row(doc_id=2, text=BASE.replace("fox", "wolf")),  # near
            Row(doc_id=3, text="completely different content about "
                               "numerical linear algebra and gpu kernels " * 3),
        ]
        df = spark.createDataFrame(texts).select(
            "doc_id", simhash64("text").alias("sh")
        )
        got = {r["doc_id"]: r["sh"] for r in df.collect()}
        assert got[0] == got[1]
        def ham(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")
        assert ham(got[0], got[2]) < ham(got[0], got[3])
        # genuinely 64-bit: some signature uses bits above the low 16
        assert any((abs(v) >> 16) != 0 for v in got.values())


class TestWavAudio:
    """Real audio decode through the multimodal operator (stdlib wave)."""

    def test_wav_roundtrip_features(self, spark):
        from pyspark.sql import Row

        from heavykeeper_rs_spark.operators.multimodal import (
            extract_features,
            synth_wav,
            wav_decoder,
        )

        rows = [
            Row(media_id=0, blob=synth_wav(440.0, 0.25, 8000)),
            Row(media_id=1, blob=synth_wav(880.0, 0.5, 16000, channels=2)),
            Row(media_id=2, blob=b"RIFFgarbage-not-a-wav"),
            Row(media_id=3, blob=None),
        ]
        df = spark.createDataFrame(rows)
        out = {
            r["id"]: r
            for r in extract_features(df, "media_id", "blob", decoder=wav_decoder).collect()
        }
        f0 = out[0]["feature"]
        assert out[0]["ok"] and abs(f0[0] - 0.25) < 1e-3   # duration
        assert f0[2] == 8000.0                              # sample rate
        assert abs(f0[3] - 0.5 / 2**0.5) < 0.01             # sine rms = A/sqrt(2)
        # 440 Hz -> 880 zero crossings/s -> zcr = 880/8000
        assert abs(f0[5] - 880.0 / 8000.0) < 0.005
        f1 = out[1]["feature"]
        assert out[1]["ok"] and abs(f1[0] - 0.5) < 1e-3 and f1[1] == 2.0
        assert not out[2]["ok"] and out[2]["error"]
        assert not out[3]["ok"]  # null blob -> captured failure


class TestBucketPairsSizeGate:
    """The bucket-size cap must act BEFORE any member-list
    materialization: a degenerate bucket's ids are never collected
    into one aggregation value (the 100 TB OOM that motivated
    _bucket_pairs)."""

    def _sig_rows(self, spark, n_big, n_small=4):
        rows = [Row(band=0, band_hash=7, id=i) for i in range(n_big)]
        rows += [Row(band=1, band_hash=9, id=i) for i in range(n_small)]
        rows += [Row(band=2, band_hash=1, id=99_999)]  # singleton: no pairs
        return spark.createDataFrame(rows)

    def test_star_routes_oversized_through_window_not_collect(self, spark):
        from heavykeeper_rs_spark.operators.dedup import _bucket_pairs

        sig = self._sig_rows(spark, n_big=5000)
        pairs = _bucket_pairs(sig, ["band", "band_hash"], "id", bucket_cap=64)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        # the collect_set aggregate exists only on the small-bucket
        # branch, which is size-filtered BEFORE the aggregate; the
        # oversized branch is pure window columns (min over partition)
        assert "collect_set" in plan
        assert "window" in plan.lower()
        assert "__m" in plan  # the pre-materialization size gate
        got = pairs.collect()
        star = {(r["a"], r["b"]) for r in got if r["a"] == 0 or r["b"] == 0}
        # oversized bucket -> 4999 star edges to min id 0
        assert {(0, i) for i in range(1, 5000)} <= {(r["a"], r["b"]) for r in got}
        small = {(r["a"], r["b"]) for r in got if r["a"] < 4 and r["b"] < 4}
        assert small >= {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
        assert len(got) == 4999 + 6
        assert star  # silence lint: star edges exist

    def test_allpairs_uses_self_join_no_collect_of_big(self, spark):
        from heavykeeper_rs_spark.operators.dedup import _bucket_pairs

        sig = self._sig_rows(spark, n_big=100)
        pairs = _bucket_pairs(
            sig, ["band", "band_hash"], "id", bucket_cap=10, oversize="allpairs"
        )
        got = {(r["a"], r["b"]) for r in pairs.collect()}
        want = {(i, j) for i in range(100) for j in range(i + 1, 100)}
        want |= {(i, j) for i in range(4) for j in range(i + 1, 4)}
        assert got == want

    def test_drop_mode(self, spark):
        from heavykeeper_rs_spark.operators.dedup import _bucket_pairs

        sig = self._sig_rows(spark, n_big=100)
        got = {
            (r["a"], r["b"])
            for r in _bucket_pairs(
                sig, ["band", "band_hash"], "id", bucket_cap=10, oversize="drop"
            ).collect()
        }
        assert got == {(i, j) for i in range(4) for j in range(i + 1, 4)}

    def test_struct_member_star(self, spark):
        from heavykeeper_rs_spark.operators.dedup import _bucket_pairs

        rows = [Row(band=0, bh=3, id=i, payload=i * 10) for i in range(50)]
        df = spark.createDataFrame(rows).withColumn(
            "__member", F.struct("id", "payload")
        )
        pairs = _bucket_pairs(df, ["band", "bh"], "__member", bucket_cap=8)
        got = {(r["a"]["id"], r["b"]["id"], r["b"]["payload"]) for r in pairs.collect()}
        assert got == {(0, i, i * 10) for i in range(1, 50)}

    def test_bad_mode_raises(self, spark):
        from heavykeeper_rs_spark.operators.dedup import _bucket_pairs

        with pytest.raises(ValueError, match="oversize"):
            _bucket_pairs(
                self._sig_rows(spark, 10), ["band", "band_hash"], "id", 4, "nope"
            )


class TestSimhashBandGuard:
    """Shifts >= 64 wrap mod 64 in the JVM — n_bands must tile the
    64-bit signature exactly or the pigeonhole guarantee silently
    breaks (ADVICE r2)."""

    def test_rejects_non_divisor_bands(self, spark):
        sig = spark.createDataFrame([Row(id=0, simhash=0), Row(id=1, simhash=0)])
        with pytest.raises(ValueError, match="divide 64"):
            simhash_near_pairs(sig, n_bands=5)
        with pytest.raises(ValueError, match="divide 64"):
            simhash_near_pairs(sig, n_bands=3)

    def test_eight_bands_cover_all_64_bits(self, spark):
        # two sigs differing ONLY in the top 8 bits (band 7 of 8):
        # with a wrapped shift that band would alias band 0 and the
        # pair below (hamming 1 in the high byte) could be missed
        a = -(1 << 63)  # bit 63 set
        sig = spark.createDataFrame(
            [Row(id=0, simhash=5), Row(id=1, simhash=5 + a)]
        )
        got = simhash_near_pairs(sig, max_hamming=1, n_bands=8).collect()
        assert {(r["id_a"], r["id_b"], r["hamming"]) for r in got} == {(0, 1, 1)}


class TestLabelPropagationConvergence:
    def test_diameter_chain_converges(self, spark):
        from heavykeeper_rs_spark.operators.dedup import label_propagate

        # path graph 0-1-2-...-9: diameter 9, well past any fixed
        # 3-hop bound
        ids = spark.createDataFrame([Row(id=i) for i in range(10)])
        edges = spark.createDataFrame(
            [Row(id_a=i, id_b=i + 1) for i in range(9)]
        )
        got = {r["id"]: r["rep_id"] for r in label_propagate(ids, edges).collect()}
        assert got == {i: 0 for i in range(10)}

    def test_fixed_rounds_is_a_lazy_bound(self, spark):
        from heavykeeper_rs_spark.operators.dedup import label_propagate

        ids = spark.createDataFrame([Row(id=i) for i in range(10)])
        edges = spark.createDataFrame(
            [Row(id_a=i, id_b=i + 1) for i in range(9)]
        )
        got = {
            r["id"]: r["rep_id"]
            for r in label_propagate(ids, edges, rounds=2).collect()
        }
        # 2 hops cannot resolve the far end of a diameter-9 path
        assert got[9] != 0
        assert got[1] == 0 and got[2] == 0


class TestResize:
    def test_resize_nearest_math(self):
        from heavykeeper_rs_spark.operators.multimodal import resize_nearest

        img = np.arange(16).reshape(4, 4)
        up = resize_nearest(img, 8, 8)
        assert up.shape == (8, 8)
        assert up[0, 0] == 0 and up[7, 7] == 15
        down = resize_nearest(img, 2, 2)
        assert down.tolist() == [[0, 2], [8, 10]]
        rgb = np.arange(48).reshape(4, 4, 3)
        assert resize_nearest(rgb, 2, 2).shape == (2, 2, 3)
        with pytest.raises(ValueError):
            resize_nearest(np.arange(3), 2, 2)

    def test_resize_features_plumbing(self, spark):
        from pyspark.sql import Row

        from heavykeeper_rs_spark.operators.multimodal import resize_features

        rows = [
            Row(mid=1, blob=bytes(range(64))),
            Row(mid=2, blob=b""),  # corrupt: captured, not fatal
            Row(mid=3, blob=b"\xff" * 10),
        ]
        df = spark.createDataFrame(rows)
        got = {r["id"]: r for r in resize_features(df, "mid", "blob", 4, 4).collect()}
        assert got[1]["ok"] and len(got[1]["feature"]) == 16
        assert not got[2]["ok"] and "empty media blob" in got[2]["error"]
        assert got[3]["ok"] and set(got[3]["feature"]) == {255.0}


def test_pil_image_decoder_gating():
    """Import-gated real image decode: with Pillow absent (this
    container) it raises the documented NotImplementedError; when
    Pillow exists it must return an ndarray (both branches covered so
    the decoder activates untouched once codec libs appear)."""
    from heavykeeper_rs_spark.operators.multimodal import pil_image_decoder

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            pil_image_decoder(b"\x89PNG fake")
    else:  # pragma: no cover - not this container
        import io as _io

        from PIL import Image

        buf = _io.BytesIO()
        Image.new("L", (4, 4)).save(buf, format="PNG")
        assert pil_image_decoder(buf.getvalue()).shape == (4, 4)


class TestImageDecode:
    """REAL dependency-free image decode (round-4: PNG via stdlib
    zlib, netpbm, uncompressed BMP) — decode -> resize -> features on
    real bytes in this codec-less container; the stub now covers video
    only."""

    def test_round_trips_all_formats(self):
        from heavykeeper_rs_spark.operators.multimodal import (
            decode_bmp,
            decode_png,
            decode_ppm,
            encode_bmp,
            encode_png,
            encode_ppm,
            synth_image,
        )

        rgb = synth_image(12, 16, 3, seed=7)
        gray = synth_image(9, 11, 1, seed=3)
        assert (decode_png(encode_png(rgb)) == rgb).all()
        assert (decode_png(encode_png(gray)) == gray).all()
        assert (decode_ppm(encode_ppm(rgb)) == rgb).all()
        assert (decode_ppm(encode_ppm(gray)) == gray).all()
        assert (decode_bmp(encode_bmp(rgb)) == rgb).all()
        rgba = np.dstack([rgb, np.full(rgb.shape[:2], 200, np.uint8)])
        assert (decode_png(encode_png(rgba)) == rgba).all()

    def test_png_all_five_filters_and_palette(self):
        """Hand-filtered scanlines (filters 0-4 cycling) and a
        palette image, checked against a straight-line reference
        unfilter — the decoder must reverse every predictor."""
        import struct
        import zlib

        from heavykeeper_rs_spark.operators.multimodal import decode_png

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        h, w, ch = 6, 5, 3
        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (h, w * ch)).astype(np.uint8)
        lines = bytearray()
        prev = np.zeros(w * ch, np.int64)
        for y in range(h):
            f = y % 5
            cur = px[y].astype(np.int64)
            filt = np.zeros(w * ch, np.int64)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[f]
                filt[x] = (cur[x] - pred) & 0xFF
            lines.append(f)
            lines.extend(filt.astype(np.uint8).tobytes())
            prev = cur
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b"")
        )
        assert (decode_png(blob).reshape(h, w * ch) == px).all()

        pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
        idx = rng.integers(0, 4, (h, w)).astype(np.uint8)
        scan = np.concatenate([np.zeros((h, 1), np.uint8), idx], axis=1)
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(scan.tobytes()))
            + chunk(b"IEND", b"")
        )
        assert (decode_png(blob) == pal[idx]).all()

    def test_dispatch_and_corrupt_capture(self):
        from heavykeeper_rs_spark.operators.multimodal import (
            encode_bmp,
            encode_png,
            encode_ppm,
            image_decoder,
            synth_image,
        )

        img = synth_image(8, 8, 3, seed=1)
        for enc in (encode_png, encode_ppm, encode_bmp):
            assert (image_decoder(enc(img)) == img).all()
        with pytest.raises(ValueError):
            image_decoder(b"")
        with pytest.raises(ValueError):
            image_decoder(encode_png(img)[:30])  # truncated IDAT
        # corrupt JPEG is a per-row-capturable ValueError (since r7 the
        # baseline decoder is real), not a Pillow gate
        with pytest.raises(ValueError):
            image_decoder(b"\xff\xd8\xff\xe0 not-really-jpeg")
        # lossy VP8 WebP falls through to the gated PIL path (r7:
        # LOSSLESS WebP decodes natively — see tests/test_webp.py)
        import struct as _s

        lossy = (b"RIFF" + _s.pack("<I", 16) + b"WEBP"
                 + b"VP8 " + _s.pack("<I", 4) + b"\x00\x00\x00\x00")
        with pytest.raises(NotImplementedError):
            image_decoder(lossy)
        # truncated/chunkless WebP is corrupt -> per-row ValueError
        with pytest.raises(ValueError):
            image_decoder(b"RIFF\x00\x00\x00\x00WEBPVP8 ")

    def test_spark_decode_resize_features_end_to_end(self, spark):
        """The full image path on REAL bytes through Spark: encode ->
        binary column -> image_decoder -> resize -> features, with the
        corrupt-row capture contract intact."""
        from pyspark.sql import Row

        from heavykeeper_rs_spark.operators.multimodal import (
            encode_bmp,
            encode_png,
            encode_ppm,
            image_decoder,
            resize_features,
            resize_nearest,
            synth_image,
        )

        imgs = {
            1: synth_image(12, 16, 3, seed=7),
            2: synth_image(20, 8, 3, seed=9),
            3: synth_image(10, 10, 1, seed=2),
        }
        rows = [
            Row(mid=1, blob=encode_png(imgs[1])),
            Row(mid=2, blob=encode_bmp(imgs[2])),
            Row(mid=3, blob=encode_ppm(imgs[3])),
            Row(mid=4, blob=b"\x89PNG\r\n\x1a\ntruncated"),
        ]
        df = spark.createDataFrame(rows)
        got = {
            r["id"]: r
            for r in resize_features(
                df, "mid", "blob", 4, 4, decoder=image_decoder
            ).collect()
        }
        for mid, img in imgs.items():
            assert got[mid]["ok"], got[mid]["error"]
            want = resize_nearest(img, 4, 4).astype(np.float32).reshape(-1)
            assert np.allclose(got[mid]["feature"], want)
        assert not got[4]["ok"] and got[4]["error"]


class TestIvfIndex:
    def test_build_search_and_partition_pruning(self, spark, tmp_path):
        """Persisted centroid-partitioned IVF index: full-probe search
        equals brute force; pruned search reads ONLY its partitions
        (PartitionFilters in the scan)."""
        from pyspark.sql import functions as F

        from heavykeeper_rs_spark.operators.similarity import (
            brute_force_topk,
            ivf_build_index,
            ivf_search_index,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        idxp = str(tmp_path / "ivf")
        cents = ivf_build_index(emb, "vec_id", "embedding", idxp, n_centroids=8, seed=1)
        assert cents.shape[0] == 8
        got = [
            (r["id"], r["cosine"])
            for r in ivf_search_index(spark, idxp, q, k=10, n_probe=8).collect()
        ]
        want = [
            (r["vec_id"], r["cosine"])
            for r in brute_force_topk(emb, "vec_id", "embedding", q, 10).collect()
        ]
        assert got == want
        pruned = ivf_search_index(spark, idxp, q, k=10, n_probe=2)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "centroid" in plan
        # the query vector's own list is probed first -> top hit found
        assert pruned.collect()[0]["id"] == 0

    def test_append_then_search(self, spark, tmp_path):
        """ivf_append_index assigns increments with the SAVED
        centroids: an appended near-copy of the query becomes the
        top full-probe hit, and old results are undisturbed."""
        from pyspark.sql import functions as F

        from heavykeeper_rs_spark.operators.similarity import (
            ivf_append_index,
            ivf_build_index,
            ivf_search_index,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        idxp = str(tmp_path / "ivf")
        ivf_build_index(emb, "vec_id", "embedding", idxp, n_centroids=8, seed=1)
        before = [
            r["id"] for r in ivf_search_index(spark, idxp, q, k=5, n_probe=8).collect()
        ]
        extra = spark.createDataFrame(
            [(99_000, q)], "vec_id long, embedding array<double>"
        )
        ivf_append_index(extra, "vec_id", "embedding", idxp)
        after = ivf_search_index(spark, idxp, q, k=5, n_probe=8).collect()
        ids = [r["id"] for r in after]
        assert 99_000 in ids[:2] and ids[0] in (0, 99_000)  # cosine-1.0 tie
        # appended vector landed in the query's own nearest list:
        # pruned n_probe=1 search still finds it
        pruned_ids = [
            r["id"] for r in ivf_search_index(spark, idxp, q, k=5, n_probe=1).collect()
        ]
        assert 99_000 in pruned_ids
        # old results undisturbed: the appended duplicate only
        # displaces the tail of the top-5
        assert [i for i in ids if i != 99_000] == before[:4]


class TestBloomPrefilter:
    def test_superset_and_bounded_fp(self, spark):
        from pyspark.sql import functions as F

        from heavykeeper_rs_spark.operators.joins import bloom_prefilter

        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        exact_ids = {
            r["o_orderkey"]
            for r in orders.join(
                cust, orders.o_custkey == cust.c_custkey, "leftsemi"
            ).collect()
        }
        pre = bloom_prefilter(orders, "o_custkey", cust, "c_custkey", fpp=0.01)
        pre_ids = {r["o_orderkey"] for r in pre.collect()}
        assert exact_ids <= pre_ids  # no false negatives, row-level
        total = orders.count()
        assert len(pre_ids) - len(exact_ids) <= max(
            0.05 * (total - len(exact_ids)), 50
        )
        # schema passthrough: all original columns survive
        assert pre.columns == orders.columns

    def test_null_keys_never_pass(self, spark):
        from pyspark.sql import Row

        from heavykeeper_rs_spark.operators.joins import bloom_prefilter

        big = spark.createDataFrame(
            [Row(k="a", v=1), Row(k=None, v=2), Row(k="zz", v=3)]
        )
        small = spark.createDataFrame([Row(j="a")])
        got = {r["v"] for r in bloom_prefilter(big, "k", small, "j").collect()}
        assert 1 in got and 2 not in got


class TestPng16AndInterlace:
    """Round-5 verdict #9: 16-bit depth and Adam7 interlacing in the
    stdlib PNG decoder."""

    def test_16bit_round_trip(self):
        from heavykeeper_rs_spark.operators.multimodal import (
            decode_png,
            encode_png,
            synth_image,
        )

        rgb = synth_image(11, 13, 3, seed=5)
        gray = synth_image(7, 9, 1, seed=6)
        # encoder widens v -> (v<<8|v); decoder strips to the high byte
        assert (decode_png(encode_png(rgb, depth=16)) == rgb).all()
        assert (decode_png(encode_png(gray, depth=16)) == gray).all()

    def test_16bit_high_byte_strip_semantics(self):
        """A hand-built 16-bit sample 0xAB12 must decode to 0xAB
        (libpng strip-16), not a rounding of 0xAB12/257."""
        import struct
        import zlib

        from heavykeeper_rs_spark.operators.multimodal import decode_png

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        scan = b"\x00" + bytes([0xAB, 0x12, 0x00, 0xFF, 0x7F, 0x80])  # 3 gray px
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 1, 16, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b"")
        )
        assert decode_png(blob).tolist() == [[0xAB, 0x00, 0x7F]]

    @pytest.mark.parametrize("hw", [(1, 1), (2, 3), (8, 8), (13, 7), (16, 17)])
    def test_adam7_round_trip_odd_dims(self, hw):
        from heavykeeper_rs_spark.operators.multimodal import (
            decode_png,
            encode_png,
            synth_image,
        )

        h, w = hw
        img = synth_image(h, w, 3, seed=h * 31 + w)
        assert (decode_png(encode_png(img, interlace=1)) == img).all()
        gray = synth_image(h, w, 1, seed=h + w)
        assert (decode_png(encode_png(gray, interlace=1)) == gray).all()

    def test_adam7_16bit_combined(self):
        from heavykeeper_rs_spark.operators.multimodal import (
            decode_png,
            encode_png,
            synth_image,
        )

        img = synth_image(13, 7, 3, seed=99)
        assert (decode_png(encode_png(img, depth=16, interlace=1)) == img).all()

    def test_adam7_filtered_passes(self):
        """Interlaced decode with a NON-ZERO filter inside a pass: each
        pass is independently filtered, so an Up-filtered second row of
        pass 7 must reconstruct against pass-local geometry."""
        import struct
        import zlib

        from heavykeeper_rs_spark.operators.multimodal import (
            _ADAM7,
            decode_png,
            encode_png,
            synth_image,
        )

        h, w = 8, 8
        img = synth_image(h, w, 1, seed=3)
        # build interlaced stream with filter 1 (Sub) on every row
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = img[y0::dy, x0::dx].astype(np.int64)
            if not sub.size:
                continue
            for row in sub:
                filt = np.zeros(row.shape[0], np.int64)
                for x in range(row.shape[0]):
                    a = row[x - 1] if x >= 1 else 0
                    filt[x] = (row[x] - a) & 0xFF
                parts.append(b"\x01" + filt.astype(np.uint8).tobytes())
        raw = b"".join(parts)

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert (decode_png(blob) == img).all()

    def test_corrupt_variants(self):
        import struct
        import zlib

        from heavykeeper_rs_spark.operators.multimodal import (
            decode_png,
            encode_png,
            synth_image,
        )

        img = synth_image(9, 9, 3, seed=2)
        blob = encode_png(img, depth=16, interlace=1)
        # truncated interlaced stream -> ValueError, never a crash
        with pytest.raises(ValueError):
            decode_png(blob[:60])

        # short pixel data inside a valid zlib stream
        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        short = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(short)
        # 16-bit palette is invalid per spec
        pal16 = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(pal16)
        # unsupported depth still rejected
        d4 = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(d4)


class TestVideoAvi:
    """Round-6: real video decode for uncompressed AVI (RIFF walk +
    DIB frames), MJPEG import-gated, codec formats still stubbed."""

    def _clip(self, n=6, h=9, w=5, seed=3):
        # w=5 forces stride padding (15 -> 16 bytes/row)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (n, h, w, 3), dtype=np.int64).astype(np.uint8)

    def test_round_trip_exact(self):
        from heavykeeper_rs_spark.operators.multimodal import decode_avi, encode_avi

        frames = self._clip()
        got = decode_avi(encode_avi(frames, fps=12))
        assert got.shape == frames.shape and (got == frames).all()

    def test_frame_selection_and_lazy_iter(self):
        from heavykeeper_rs_spark.operators.multimodal import (
            decode_avi,
            encode_avi,
            iter_avi_frames,
        )

        frames = self._clip(n=8)
        blob = encode_avi(frames)
        sel = decode_avi(blob, frame_indices=[0, 3, 7])
        assert (sel == frames[[0, 3, 7]]).all()
        it = iter_avi_frames(blob)
        first = next(it)
        assert (first == frames[0]).all()  # lazy: no full materialize

    def test_video_decoder_feature_vector(self):
        from heavykeeper_rs_spark.operators.multimodal import encode_avi, video_decoder

        frames = self._clip(n=4, h=6, w=6)
        feat = video_decoder(encode_avi(frames, fps=25))
        assert feat[:4].tolist() == [4.0, 6.0, 6.0, 25.0]
        assert abs(feat[4] - round(float(frames[0].mean()), 3)) < 1e-2

    def test_corrupt_and_codec_blobs(self):
        from heavykeeper_rs_spark.operators.multimodal import decode_avi, encode_avi

        with pytest.raises(ValueError):
            decode_avi(b"RIFFxxxxNOPE")
        frames = self._clip(n=2)
        blob = bytearray(encode_avi(frames))
        # flip the biCompression field to a codec fourcc -> documented
        # NotImplementedError, not a crash
        idx = bytes(blob).find(b"strf")
        blob[idx + 8 + 16 : idx + 8 + 20] = b"H264"
        with pytest.raises(NotImplementedError):
            decode_avi(bytes(blob))
        # truncated frame data -> ValueError
        with pytest.raises(ValueError):
            decode_avi(encode_avi(frames)[:-40])

    def test_audio_first_stream_list_is_skipped(self):
        """An AVI may legally list its audio strl before the video one;
        the audio strf (WAVEFORMATEX) must not be parsed as frame
        geometry."""
        import struct

        from heavykeeper_rs_spark.operators.multimodal import decode_avi, encode_avi

        def chunk(fourcc, data):
            return (
                fourcc + struct.pack("<I", len(data)) + data
                + (b"\0" if len(data) & 1 else b"")
            )

        frames = self._clip(n=3)
        orig = encode_avi(frames, fps=10)
        # audio strf: 24 bytes that would decode as w=9999 garbage if
        # mistaken for a BITMAPINFOHEADER
        audio_strf = struct.pack("<Iii", 0, 9999, 9999) + struct.pack("<HHII", 1, 8, 0, 0)
        audio_strl = chunk(
            b"LIST",
            b"strl"
            + chunk(b"strh", b"auds" + b"\0" * 52)
            + chunk(b"strf", audio_strf),
        )
        body = audio_strl + orig[12:]
        blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
        got = decode_avi(blob)
        assert got.shape == frames.shape and (got == frames).all()

    def test_sample_frames_null_media_id(self, spark):
        """A null id row costs itself an ok=false row, never the task."""
        from pyspark.sql.types import (
            BinaryType,
            LongType,
            StructField,
            StructType,
        )

        from heavykeeper_rs_spark.operators.multimodal import encode_avi, sample_frames

        f1 = self._clip(n=2, h=4, w=4, seed=5)
        schema = StructType(
            [StructField("mid", LongType(), True), StructField("blob", BinaryType(), True)]
        )
        df = spark.createDataFrame(
            [(7, bytes(encode_avi(f1))), (None, bytes(encode_avi(f1)))], schema
        )
        out = sample_frames(df, "mid", "blob").collect()
        good = [r for r in out if r["media_id"] == 7]
        bad = [r for r in out if r["media_id"] == -1]
        assert len(good) == 2 and all(r["ok"] for r in good)
        assert len(bad) == 1 and not bad[0]["ok"] and "media id" in bad[0]["error"]

    def test_sample_frames_spark_end_to_end(self, spark):
        from heavykeeper_rs_spark.operators.multimodal import (
            encode_avi,
            resize_nearest,
            sample_frames,
        )

        f1 = self._clip(n=6, h=8, w=8, seed=1)
        f2 = self._clip(n=4, h=10, w=7, seed=2)
        df = spark.createDataFrame(
            [
                Row(mid=1, blob=bytes(encode_avi(f1))),
                Row(mid=2, blob=bytes(encode_avi(f2))),
                Row(mid=3, blob=b"RIFF not a real avi"),
            ]
        )
        out = sample_frames(df, "mid", "blob", every_n=2, out_h=4, out_w=4).collect()
        by_key = {(r["media_id"], r["frame_idx"]): r for r in out}
        assert {(r["media_id"]) for r in out} == {1, 2, 3}
        assert not by_key[(3, -1)]["ok"]  # corrupt row captured
        # media 1: frames 0,2,4 kept; values match local decode+resize
        for fi in (0, 2, 4):
            want = resize_nearest(f1[fi], 4, 4).astype(np.float32).ravel()
            got = np.asarray(by_key[(1, fi)]["feature"], dtype=np.float32)
            assert (got == want).all()
        assert {(2, 0), (2, 2)} <= set(by_key)

    def test_extract_features_with_video_decoder(self, spark):
        from heavykeeper_rs_spark.operators.multimodal import (
            encode_avi,
            extract_features,
            video_decoder,
        )

        df = spark.createDataFrame(
            [
                Row(mid=1, blob=bytes(encode_avi(self._clip(n=3)))),
                Row(mid=2, blob=b"\x00\x01bad"),
            ]
        )
        got = {
            r["id"]: r
            for r in extract_features(df, "mid", "blob", decoder=video_decoder).collect()
        }
        assert got[1]["ok"] and got[1]["feature"][0] == 3.0
        assert not got[2]["ok"]


class TestBruteForceBlockGemm:
    """brute_force_pairs is a block GEMM since round 6 — the sf1
    rehearsal caught the cross-block orientation bug, pinned here."""

    def test_multi_block_equals_single_block(self, spark):
        from heavykeeper_rs_spark.operators.similarity import brute_force_pairs

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).withColumn("emb_d", F.col("embedding").cast("array<double>"))
        single = sorted(
            tuple(r)
            for r in brute_force_pairs(
                emb, "vec_id", "emb_d", tau=0.40, block=1 << 30
            ).collect()
        )
        multi = sorted(
            tuple(r)
            for r in brute_force_pairs(
                emb, "vec_id", "emb_d", tau=0.40, block=16
            ).collect()
        )
        assert multi == single and len(single) > 0

    def test_pairs_are_canonical_and_thresholded(self, spark, vectors):
        from heavykeeper_rs_spark.operators.similarity import brute_force_pairs

        got = brute_force_pairs(vectors, "vec_id", "embedding", tau=0.99, block=4).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in got}
        assert {(0, 1), (0, 2), (1, 2)} <= pairs
        for r in got:
            assert r["id_a"] < r["id_b"] and r["cosine"] >= 0.99


class TestRoundingWindowPrefilter:
    """Round-7 ADVICE: the GEMM prefilter must admit the whole
    round-to-6 window. Survivors are kept by round(cos, 6) >= tau,
    which accepts raw cosines down to tau - 5e-7; a prefilter at
    tau - 1e-9 dropped pairs the DuckDB oracle keeps. Fixture pair
    sits at raw cosine 0.3999996 (< tau - 1e-9, rounds to 0.400000)."""

    def _boundary_df(self, spark):
        x = 0.3999996
        y = float(np.sqrt(1.0 - x * x))
        rows = [
            Row(vec_id=1, emb=[1.0, 0.0]),
            Row(vec_id=2, emb=[x, y]),
        ]
        return spark.createDataFrame(rows)

    def test_brute_force_pairs_keeps_rounding_window(self, spark):
        from heavykeeper_rs_spark.operators.similarity import brute_force_pairs

        got = brute_force_pairs(
            self._boundary_df(spark), "vec_id", "emb", tau=0.40
        ).collect()
        assert [(r["id_a"], r["id_b"], r["cosine"]) for r in got] == [(1, 2, 0.4)]

    def test_near_dup_pairs_keeps_rounding_window(self, spark):
        from heavykeeper_rs_spark.operators.similarity import (
            embedding_near_dup_pairs,
        )

        got = embedding_near_dup_pairs(
            self._boundary_df(spark), "vec_id", "emb", dim=2,
            tau=0.40, n_bits=16, bands=16,
        ).collect()
        assert [(r["id_a"], r["id_b"], r["cosine"]) for r in got] == [(1, 2, 0.4)]


class TestAviSecondStream:
    """Round-7 ADVICE: frame chunks of a NON-video stream (two-digit
    prefix not owned by the vids strl) must be dropped, not decoded
    with the video stream's strf geometry."""

    def test_second_stream_frames_ignored(self):
        import struct

        from heavykeeper_rs_spark.operators.multimodal import decode_avi, encode_avi

        rng = np.random.default_rng(11)
        frames = rng.integers(0, 256, (3, 6, 4, 3), dtype=np.int64).astype(np.uint8)
        orig = encode_avi(frames, fps=10)
        # splice a second stream's frame chunk (01db, wrong size) into
        # movi: old code appended it and decoded garbage / crashed
        movi_at = orig.find(b"movi")
        assert movi_at > 0
        list_hdr = movi_at - 8
        (movi_len,) = struct.unpack_from("<I", orig, list_hdr + 4)
        alien = b"01db" + struct.pack("<I", 10) + b"\xab" * 10
        body = (
            orig[:list_hdr]
            + b"LIST" + struct.pack("<I", movi_len + len(alien))
            + orig[list_hdr + 8 : list_hdr + 8 + movi_len]
            + alien
        )
        inner = body[12:]
        blob = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
        got = decode_avi(blob)
        assert got.shape == frames.shape and (got == frames).all()
