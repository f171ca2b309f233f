"""Kernel unit tests mirroring the reference's in-file #[cfg(test)] suites
(src/heavykeeper.rs:580-1563, src/priority_queue.rs:278-429). Decay is
forced on/off via the `_force_decay` hook — the analog of the reference
tests overwriting the decay-threshold table."""

import numpy as np
import pytest

from heavykeeper_rs_spark.errors import (
    InvalidDecay,
    InvalidDepth,
    InvalidK,
    InvalidWidth,
    SketchCompatError,
)
from heavykeeper_rs_spark.kernel import HeavyKeeper, HKParams, TopKQueue, hash_items


def keys(*xs):
    return np.asarray([x.encode() if isinstance(x, str) else x for x in xs], dtype=object)


# ---------------------------------------------------------------- queue
class TestQueue:
    def test_insert_and_order(self):
        q = TopKQueue(3)
        q.upsert(b"a", 5)
        q.upsert(b"b", 9)
        q.upsert(b"c", 5)
        # ties by insertion sequence asc (src/priority_queue.rs:204-207)
        assert q.items_sorted() == [(b"b", 9), (b"a", 5), (b"c", 5)]

    def test_capacity_eviction_strictly_greater(self):
        q = TopKQueue(2)
        q.upsert(b"a", 5)
        q.upsert(b"b", 9)
        assert q.upsert(b"c", 5) is None  # equal min -> rejected
        assert b"c" not in q.counts
        assert q.upsert(b"c", 6) == b"a"  # strictly greater evicts min
        assert q.items_sorted() == [(b"b", 9), (b"c", 6)]

    def test_update_never_decreases(self):
        q = TopKQueue(2)
        q.upsert(b"a", 5)
        q.update_if_present(b"a", 3)
        assert q.counts[b"a"] == 5
        q.update_if_present(b"a", 7)
        assert q.counts[b"a"] == 7

    def test_min_count(self):
        q = TopKQueue(2)
        assert q.min_count() == 0
        q.upsert(b"a", 5)
        assert q.min_count() == 0  # not full yet
        q.upsert(b"b", 9)
        assert q.min_count() == 5


# ---------------------------------------------------------------- params
class TestParams:
    def test_builder_validation(self):
        with pytest.raises(InvalidK):
            HKParams(k=0, width=8, depth=2)
        with pytest.raises(InvalidWidth):
            HKParams(k=1, width=0, depth=2)
        with pytest.raises(InvalidDepth):
            HKParams(k=1, width=8, depth=0)
        with pytest.raises(InvalidDecay):
            HKParams(k=1, width=8, depth=2, decay=1.5)
        with pytest.raises(InvalidDecay):
            HKParams(k=1, width=8, depth=2, decay=float("nan"))

    def test_merge_compat(self):
        a = HeavyKeeper.new(10, 64, 4)
        b = HeavyKeeper.new(10, 128, 4)
        with pytest.raises(SketchCompatError):
            a.merge(b)
        c = HeavyKeeper.with_seed(10, 64, 4, 0.9, seed=99)
        with pytest.raises(SketchCompatError):
            a.merge(c)


# ---------------------------------------------------------------- hashing
class TestHashing:
    def test_deterministic_and_seeded(self):
        a = keys("x", "y", "emoji☃")
        h1 = hash_items(a, 12345)
        h2 = hash_items(a, 12345)
        h3 = hash_items(a, 54321)
        assert (h1 == h2).all()
        assert (h1 != h3).any()
        assert h1.dtype == np.uint64

    def test_bytes_vs_str_disjoint_but_stable(self):
        assert hash_items(keys("abc"), 1)[0] == hash_items(keys("abc"), 1)[0]


# ---------------------------------------------------------------- sketch
class TestSketch:
    def test_exact_when_uncontended(self):
        # src/heavykeeper.rs:653-687: with ample width, counts are exact
        sk = HeavyKeeper.new(10, 1024, 4)
        items = keys(*([f"k{i}" for i in range(20) for _ in range(i + 1)]))
        sk.add_batch(items)
        est = sk.estimate(keys(*[f"k{i}" for i in range(20)]))
        assert list(est) == [i + 1 for i in range(20)]
        top = sk.list()
        assert top[0] == (b"k19", 20)
        assert len(top) == 10
        assert [c for _, c in top] == list(range(20, 10, -1))

    def test_weighted_add(self):
        sk = HeavyKeeper.new(5, 256, 4)
        sk.add_batch(keys("a", "b"), np.array([100, 7]))
        sk.add_batch(keys("a"), np.array([1]))
        assert sk.estimate(keys("a"))[0] == 101
        assert sk.estimate(keys("b"))[0] == 7
        assert sk.estimate(keys("zzz"))[0] == 0

    def test_zero_increment_noop(self):
        sk = HeavyKeeper.new(5, 64, 2)
        sk.add_batch(keys("a"), np.array([0]))
        assert sk.estimate(keys("a"))[0] == 0
        assert len(sk.pq) == 0

    def test_contains_and_topk_membership(self):
        sk = HeavyKeeper.new(2, 256, 4)
        sk.add_batch(keys("a", "a", "b"))
        assert sk.contains("a")
        assert sk.contains_top_k("a")
        assert not sk.contains("nope")
        assert not sk.contains_top_k("nope")

    def test_overwrite_after_full_decay(self):
        # src/heavykeeper.rs:766-794: add 3000 of B against a cell
        # holding A at 1000 under forced decay -> B count 2001
        sk = HeavyKeeper.new(5, 1, 1)  # width 1: guaranteed collision
        sk._force_decay = False
        sk.add_batch(keys("A"), np.array([1000]))
        sk._force_decay = True
        sk.add_batch(keys("B"), np.array([3000]))
        assert sk.estimate(keys("B"), use_heap=False)[0] == 2001
        assert sk.estimate(keys("A"), use_heap=False)[0] == 0

    def test_forced_no_decay_keeps_occupant(self):
        sk = HeavyKeeper.new(5, 1, 1)
        sk._force_decay = False
        sk.add_batch(keys("A"), np.array([10]))
        sk.add_batch(keys("B"), np.array([1000]))
        assert sk.estimate(keys("A"), use_heap=False)[0] == 10
        assert sk.estimate(keys("B"), use_heap=False)[0] == 0

    def test_failed_eviction_purity(self):
        # a loser keeps count 0 and is not tracked
        # (src/bucketed.rs:1117-1136, src/heavykeeper.rs:341-343)
        sk = HeavyKeeper.new(5, 1, 1)
        sk._force_decay = False
        sk.add_batch(keys("A"), np.array([10]))
        sk.add_batch(keys("B"), np.array([3]))
        assert not sk.contains_top_k("B")
        assert sk.estimate(keys("B"))[0] == 0

    def test_skew_recall(self):
        # src/heavykeeper.rs:901-964: top-10-of-100 skew recall >= 8/10
        rng = np.random.default_rng(7)
        ks, ws = [], []
        for i in range(100):
            ks.append(f"key{i}".encode())
            ws.append(1000 - 9 * i if i < 10 else rng.integers(1, 20))
        order = rng.permutation(
            np.repeat(np.asarray(ks, dtype=object), np.asarray(ws, dtype=np.int64))
        )
        sk = HeavyKeeper.new(10, 64, 4)
        for chunk in np.array_split(order, 7):
            sk.add_batch(chunk)
        got = {item for item, _ in sk.list()}
        want = {f"key{i}".encode() for i in range(10)}
        assert len(got & want) >= 8

    def test_unicode_keys(self):
        # src/heavykeeper.rs:711-746: non-ASCII + emoji
        sk = HeavyKeeper.new(5, 256, 4)
        sk.add_batch(keys("héllo", "héllo", "☃", "日本語", "日本語", "日本語"))
        top = dict(sk.list())
        assert top["日本語".encode()] == 3
        assert top["héllo".encode()] == 2
        assert top["☃".encode()] == 1

    def test_determinism_same_seed(self):
        # src/cuckoo.rs:1039-1057 analog: same seed + same input order
        # -> identical full state
        data = np.random.default_rng(3).integers(0, 500, 20000)
        items = np.asarray([f"u{i}" for i in data], dtype=object)
        a = HeavyKeeper.with_seed(20, 128, 4, 0.9, 42)
        b = HeavyKeeper.with_seed(20, 128, 4, 0.9, 42)
        a.add_batch(items)
        b.add_batch(items)
        assert (a.fps == b.fps).all() and (a.counts == b.counts).all()
        assert a.list() == b.list()


# ---------------------------------------------------------------- merge
class TestMerge:
    def test_merge_sums_disjoint_and_shared(self):
        # src/heavykeeper.rs:1160-1186: merged counts are summed
        a = HeavyKeeper.new(10, 1024, 4)
        b = HeavyKeeper.new(10, 1024, 4)
        a.add_batch(keys("x"), np.array([5]))
        a.add_batch(keys("y"), np.array([2]))
        b.add_batch(keys("x"), np.array([3]))
        b.add_batch(keys("z"), np.array([7]))
        a.merge(b)
        est = a.estimate(keys("x", "y", "z"))
        assert list(est) == [8, 2, 7]
        assert dict(a.list()) == {b"x": 8, b"y": 2, b"z": 7}

    def test_merge_untracked_fallback(self):
        # bucketed-style pre-merge bucket_count fallback
        # (src/bucketed.rs:377-401): other tracks an item self only has
        # in cells -> merged candidate count includes self's cell mass
        a = HeavyKeeper.new(1, 1024, 4)
        b = HeavyKeeper.new(1, 1024, 4)
        a.add_batch(keys("big", "small"), np.array([100, 3]))  # a tracks big only
        b.add_batch(keys("small"), np.array([10]))  # b tracks small
        assert not a.contains_top_k("small")
        a.merge(b)
        assert a.estimate(keys("small"))[0] == 13

    def test_serialize_roundtrip(self):
        sk = HeavyKeeper.new(10, 128, 4)
        sk.add_batch(keys(*[f"k{i % 30}" for i in range(500)]))
        blob = sk.serialize()
        back = HeavyKeeper.deserialize(blob)
        assert back.params == sk.params
        assert (back.fps == sk.fps).all() and (back.counts == sk.counts).all()
        assert back.list() == sk.list()

    def test_merge_order_estimate_bound(self):
        # merge is associative only up to sketch error (SURVEY §2.7):
        # assert top-K set & estimates agree across merge orders for an
        # uncontended workload (where both must be exact)
        parts = []
        for pid in range(4):
            sk = HeavyKeeper.with_seed(10, 2048, 4, 0.9, 42)
            items = np.asarray(
                [f"k{i}" for i in range(30) for _ in range((i + 1) * (pid + 1))],
                dtype=object,
            )
            sk.add_batch(items)
            parts.append(sk.serialize())
        from heavykeeper_rs_spark.kernel import merge_blobs

        m1 = HeavyKeeper.deserialize(merge_blobs(parts))
        m2 = HeavyKeeper.deserialize(merge_blobs(parts[::-1]))
        assert dict(m1.list()) == dict(m2.list())
        truth = {f"k{i}".encode(): (i + 1) * 10 for i in range(30)}
        for item, c in m1.list():
            assert c == truth[item]


class TestStringBufferHash:
    """The canonical str/bytes hash is hash_string_buffers — the object
    lane (probe/PQ-fallback) and the Arrow zero-copy lane (distributed
    builders) MUST produce identical hashes, or fingerprints from the
    two paths would never match."""

    def test_object_and_arrow_lanes_agree(self):
        import pyarrow as pa

        from heavykeeper_rs_spark.kernel import (
            arrow_string_buffers,
            hash_items,
            hash_string_buffers,
        )

        keys = ["hello", "wörld", "", "x" * 300, "flow\x00key", "a", "ab"]
        h_obj = hash_items(np.asarray(keys, dtype=object), 12345)
        off, data = arrow_string_buffers(pa.array(keys))
        assert np.array_equal(h_obj, hash_string_buffers(off, data, 12345))
        # bytes objects hash like their utf-8 str twins
        hb = hash_items(np.asarray([k.encode() for k in keys], dtype=object), 12345)
        assert np.array_equal(h_obj, hb)
        # sliced arrow arrays (non-zero offset) still hash right
        sl = pa.array(keys).slice(2, 4)
        off2, data2 = arrow_string_buffers(sl)
        assert np.array_equal(h_obj[2:6], hash_string_buffers(off2, data2, 12345))
        # seed separation + all distinct
        assert not np.array_equal(h_obj, hash_items(np.asarray(keys, dtype=object), 1))
        assert len(set(h_obj.tolist())) == len(keys)

    def test_prefix_and_length_discrimination(self):
        from heavykeeper_rs_spark.kernel import hash_items

        ks = ["a", "aa", "aaa", "ab", "ba", "a\x00", "\x00a"]
        h = hash_items(np.asarray(ks, dtype=object), 7)
        assert len(set(h.tolist())) == len(ks)

    def test_add_batch_hashed_matches_add_batch(self):
        import pyarrow as pa
        import pyarrow.compute as pc

        from heavykeeper_rs_spark.kernel import (
            arrow_string_buffers,
            hash_string_buffers,
        )

        rng = np.random.default_rng(0)
        zipf = np.minimum(rng.zipf(1.3, 100_000), 20_000)
        skeys = np.asarray([f"key{v}" for v in zipf], dtype=object)
        p = HKParams(k=20, width=4096, depth=4, decay=0.9, seed=7)
        a = HeavyKeeper(p, rng=np.random.default_rng(1))
        a.add_batch(skeys)
        b = HeavyKeeper(p, rng=np.random.default_rng(1))
        col = pa.array(skeys.tolist(), type=pa.string())
        d = pc.dictionary_encode(col)
        idx = d.indices.to_numpy(zero_copy_only=False)
        w = np.bincount(idx, minlength=len(d.dictionary)).astype(np.int64)
        off, data = arrow_string_buffers(d.dictionary)
        h = hash_string_buffers(off, data, 7)
        dic = d.dictionary
        b.add_batch_hashed(
            h, w, lambda sel: np.asarray(dic.take(pa.array(sel)).to_pylist(), dtype=object)
        )
        assert a.list() == b.list()
        assert np.array_equal(a.counts, b.counts) and np.array_equal(a.fps, b.fps)

    def test_add_batch_hashed_refuses_custom_hasher(self):
        import pytest

        from heavykeeper_rs_spark.kernel import HeavyKeeper

        sk = HeavyKeeper.with_hasher(
            2, 64, 2, 0.9, 1,
            hasher=lambda items, seed: np.arange(len(items), dtype=np.uint64),
        )
        with pytest.raises(ValueError, match="custom-hasher"):
            sk.add_batch_hashed(
                np.asarray([1], dtype=np.uint64),
                np.asarray([1.0]),
                lambda s: np.asarray(["x"], dtype=object),
            )


def test_radix_argsort_matches_comparison_sort():
    from heavykeeper_rs_spark.kernel import _radix_argsort

    rng = np.random.default_rng(0)
    for nbits, n in ((21, 1), (35, 1000), (50, 50_000), (14, 37)):
        key = rng.integers(0, 1 << nbits, n, dtype=np.uint64)
        got = _radix_argsort(key, nbits)
        want = np.argsort(key, kind="stable")
        assert np.array_equal(got, want), (nbits, n)


def test_dense_preagg_matches_factorize():
    """The dense small-domain bincount preagg in add_batch must agree
    with the khash-factorize lane: identical exact counts on an
    uncontended fixture (where order effects cannot matter), identical
    (unique, weight) multisets on weighted and cancelling inputs."""
    import heavykeeper_rs_spark.kernel as _K
    import heavykeeper_rs_spark.variants as _V

    # pin the cap so the test is independent of HK_DENSE_CAP in the env
    old_caps = _K._DENSE_DOMAIN_CAP, _V._DENSE_DOMAIN_CAP
    _K._DENSE_DOMAIN_CAP = _V._DENSE_DOMAIN_CAP = 1 << 22
    try:
        _dense_preagg_body()
    finally:
        _K._DENSE_DOMAIN_CAP, _V._DENSE_DOMAIN_CAP = old_caps


def _dense_preagg_body():
    from heavykeeper_rs_spark.kernel import _DENSE_DOMAIN_CAP

    rng = np.random.default_rng(42)
    n = 20_000
    keys = rng.integers(0, 500, n, dtype=np.int64)  # dense-eligible
    wide = HKParams(k=600, width=8192, depth=4, decay=0.9, seed=7)

    dense = HeavyKeeper(wide)
    dense.add_batch(keys)
    assert int(keys.max()) < min(4 * n, _DENSE_DOMAIN_CAP)  # took dense

    fact = HeavyKeeper(wide)
    for chunk in np.array_split(keys, 8):  # < 4096 rows -> factorize
        assert chunk.size < 4096
        fact.add_batch(chunk)

    truth = {int(k): int(c) for k, c in zip(*np.unique(keys, return_counts=True))}
    got_dense = {k: c for k, c in dense.list()}
    got_fact = {k: c for k, c in fact.list()}
    assert got_dense == truth
    assert got_fact == truth

    # weighted + zero/cancel weights: nonpositive totals are dropped
    # on both lanes
    wk = np.asarray([1, 1, 2, 3, 3, 4], dtype=np.int64)
    ww = np.asarray([5, -5, 0, 2, 2, 7], dtype=np.int64)
    wk_big = np.tile(wk, 1024)  # cross the 4096-row dense threshold
    ww_big = np.tile(ww, 1024)
    a = HeavyKeeper(wide)
    a.add_batch(wk_big, ww_big)
    assert dict(a.list()) == {3: 4096, 4: 7168}

    # large / negative domains must fall back (and stay correct)
    neg = np.r_[np.full(5000, -3, dtype=np.int64), np.arange(5000, dtype=np.int64)]
    b = HeavyKeeper(wide)
    b.add_batch(neg)
    assert b.estimate(np.asarray([-3], dtype=np.int64))[0] == 5000

    # uint64 batches take the dense lane too (bincount can't safe-cast
    # uint64 — the lane must int64-view them; regression for a crash)
    ukeys = keys.astype(np.uint64)
    c = HeavyKeeper(wide)
    c.add_batch(ukeys)
    assert dict(c.list()) == truth

    # the variants share the dense _preagg twin
    from heavykeeper_rs_spark.variants import BucketedTopK, CuckooTopK

    for cls in (BucketedTopK, CuckooTopK):
        vd = cls(600, 8192, 4, seed=7)
        vd.add_batch(ukeys)  # uint64: exercises the int64-view guard
        vd2 = cls(600, 8192, 4, seed=7)
        vd2.add_batch(keys)
        assert dict(vd2.list()) == truth, cls.__name__
        vf = cls(600, 8192, 4, seed=7)
        for chunk in np.array_split(keys, 8):
            vf.add_batch(chunk)
        assert dict(vd.list()) == truth, cls.__name__
        assert dict(vf.list()) == truth, cls.__name__


def test_query_deprecated_alias():
    """O10 parity: query() == contains() with a DeprecationWarning
    (deprecated in the reference since 0.6.9)."""
    import warnings

    from heavykeeper_rs_spark.variants import BucketedTopK, CuckooTopK

    for sk in (
        HeavyKeeper(HKParams(k=2, width=64, depth=2, decay=0.9, seed=1)),
        BucketedTopK(2, 64, 2, seed=1),
        CuckooTopK(2, 64, 2, seed=1),
    ):
        sk.add_batch(np.asarray(["hot", "hot", "cold"], dtype=object))
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            assert sk.query("hot") is True
            assert sk.query("never-seen") is False
        assert any(issubclass(w.category, DeprecationWarning) for w in rec)


def test_fluent_builder_parity():
    """builder() fluent construction on all three layouts with the
    reference's validation surface."""
    from heavykeeper_rs_spark.errors import InvalidDecay, InvalidK
    from heavykeeper_rs_spark.variants import BucketedTopK, CuckooTopK

    sk = HeavyKeeper.builder().k(5).width(64).depth(2).decay(0.8).seed(3).build()
    assert sk.params.k == 5 and sk.params.decay == 0.8 and sk.params.seed == 3
    ck = CuckooTopK.builder().k(3).width(32).depth(2).max_kicks(4).build()
    assert isinstance(ck, CuckooTopK) and ck.max_kicks == 4
    bk = BucketedTopK.builder().k(3).width(32).depth(2).build()
    assert isinstance(bk, BucketedTopK)
    import pytest

    with pytest.raises(InvalidK):
        HeavyKeeper.builder().width(64).depth(2).build()
    with pytest.raises(InvalidDecay):
        HeavyKeeper.builder().k(2).width(64).depth(2).decay(1.5).build()
    with pytest.raises(ValueError, match="cuckoo"):
        HeavyKeeper.builder().k(2).width(64).depth(2).max_kicks(3).build()
    with pytest.raises(ValueError, match="hasher"):
        BucketedTopK.builder().k(2).width(64).depth(2).hasher(lambda i, s: i).build()


class TestSparseMergeFastPath:
    """r8: merge_blobs routes sparse (v2) blobs through the O(nnz)
    fast path (_merge_parsed_sparse); it must be BIT-identical to the
    dense pairwise merge on cells, candidates and a serialize round-
    trip, across exact and contested regimes."""

    def _dense_merge(self, blobs):
        acc = HeavyKeeper.deserialize(blobs[0])
        for b in blobs[1:]:
            acc.merge(HeavyKeeper.deserialize(b))
        return acc

    def _check(self, blobs):
        from heavykeeper_rs_spark.kernel import _parse_blob_sparse, merge_blobs

        assert all(_parse_blob_sparse(b) is not None for b in blobs[1:]), (
            "fixture must produce sparse (v2) blobs for the fast path"
        )
        fast = HeavyKeeper.deserialize(merge_blobs(blobs))
        slow = self._dense_merge(blobs)
        assert np.array_equal(fast.fps, slow.fps)
        assert np.array_equal(fast.counts, slow.counts)
        assert fast.pq.counts == slow.pq.counts
        assert fast.list() == slow.list()

    def test_exact_regime_disjoint_and_shared_keys(self):
        rng = np.random.default_rng(7)
        blobs = []
        for p in range(5):
            sk = HeavyKeeper(HKParams(k=32, width=4096, depth=4))
            keys = rng.integers(0, 500, 3000, dtype=np.int64)
            if p % 2:
                keys = keys + 400  # overlap + disjoint mix
            sk.add_batch(keys)
            blobs.append(sk.serialize())
        self._check(blobs)

    def test_contested_regime_string_keys(self):
        rng = np.random.default_rng(11)
        blobs = []
        for p in range(4):
            # width*depth = 3072 cells vs ~300 keys: collisions (and
            # decay duels) happen, but nnz*3 < cells keeps the blobs
            # sparse so the fast path runs
            sk = HeavyKeeper(
                HKParams(k=8, width=1024, depth=3, decay=0.9, seed=99),
                rng=np.random.default_rng(p),
            )
            keys = np.asarray(
                [f"k{int(v)}" for v in rng.zipf(1.3, 4000) % 300], dtype=object
            )
            sk.add_batch(keys)
            b = sk.serialize()
            # contested regime fills most cells: force the sparse
            # layout by checking; skip if dense (fixture guard)
            blobs.append(b)
        from heavykeeper_rs_spark.kernel import _parse_blob_sparse

        if any(_parse_blob_sparse(b) is None for b in blobs[1:]):
            import pytest

            pytest.skip("fixture produced dense blobs; fast path not exercised")
        self._check(blobs)

    def test_empty_sparse_blob(self):
        a = HeavyKeeper(HKParams(k=4, width=1024, depth=2))
        a.add_batch(np.asarray([1, 2, 3], dtype=np.int64))
        empty = HeavyKeeper(HKParams(k=4, width=1024, depth=2)).serialize()
        self._check([a.serialize(), empty])
