"""Property-based tests (hypothesis): kernel invariants that must hold
for ANY input, extending the reference's seeded-random strategy."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from heavykeeper_rs_spark.kernel import HeavyKeeper, TopKQueue, merge_blobs
from heavykeeper_rs_spark.variants import BucketedTopK, CuckooTopK

keys_st = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=1, max_size=300
)


def build(cls, keys, **kw):
    sk = cls(**kw) if cls is not HeavyKeeper else HeavyKeeper.with_seed(**kw)
    sk.add_batch(np.asarray([k.encode() for k in keys], dtype=object))
    return sk


@settings(max_examples=40, deadline=None)
@given(keys_st)
def test_uncontended_exactness_all_variants(keys):
    """With width*depth >> distinct keys, every variant degenerates to
    an exact counter (src/heavykeeper.rs:653-687)."""
    import collections

    truth = collections.Counter(k.encode() for k in keys)
    uniq = np.asarray(sorted(truth), dtype=object)
    arr = np.asarray([k.encode() for k in keys], dtype=object)
    for sk in (
        HeavyKeeper.with_seed(k=len(truth), width=4096, depth=4, decay=0.9, seed=1),
        BucketedTopK(len(truth), 4096, 4, 0.9, 1),
        CuckooTopK(len(truth), 4096, 4, 0.9, 1),
    ):
        sk.add_batch(arr)
        est = sk.estimate(uniq)
        assert [int(e) for e in est] == [truth[k] for k in uniq]


@settings(max_examples=30, deadline=None)
@given(keys_st, keys_st)
def test_merge_equals_union_uncontended(a_keys, b_keys):
    """merge(a, b) == build(a + b) exactly in the uncontended regime
    (src/heavykeeper.rs:1160-1186 generalized)."""
    import collections

    truth = collections.Counter(k.encode() for k in a_keys + b_keys)
    a = HeavyKeeper.with_seed(k=64, width=4096, depth=4, decay=0.9, seed=3)
    b = HeavyKeeper.with_seed(k=64, width=4096, depth=4, decay=0.9, seed=3)
    a.add_batch(np.asarray([k.encode() for k in a_keys], dtype=object))
    b.add_batch(np.asarray([k.encode() for k in b_keys], dtype=object))
    a.merge(b)
    uniq = np.asarray(sorted(truth), dtype=object)
    est = a.estimate(uniq)
    for k, e in zip(uniq, est):
        assert int(e) == truth[k]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.binary(min_size=1, max_size=4), st.integers(1, 1000)),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 10),
)
def test_queue_invariants(ops, k):
    """TopKQueue: size <= k; min tracked; monotone counts; deterministic
    (count desc, seq asc) order (src/priority_queue.rs:278-429)."""
    q = TopKQueue(k)
    shadow: dict[bytes, int] = {}
    for item, c in ops:
        prev = q.counts.get(item)
        q.upsert(item, c)
        now = q.counts.get(item)
        if prev is not None:
            assert now >= prev  # never decreases
        assert len(q.counts) <= k
    out = q.items_sorted()
    counts = [c for _, c in out]
    assert counts == sorted(counts, reverse=True)
    assert len(q.counts) <= k
    if len(q.counts) == k:
        assert q.min_count() == min(q.counts.values())


@settings(max_examples=15, deadline=None)
@given(st.lists(keys_st, min_size=2, max_size=5), st.randoms())
def test_merge_blob_order_independent_uncontended(parts, rnd):
    """Any merge order yields identical estimates when uncontended."""
    import collections

    truth = collections.Counter(
        k.encode() for keys in parts for k in keys
    )
    blobs = []
    for i, keys in enumerate(parts):
        sk = HeavyKeeper.with_seed(k=64, width=4096, depth=4, decay=0.9, seed=9)
        sk.rng = np.random.default_rng(100 + i)
        sk.add_batch(np.asarray([k.encode() for k in keys], dtype=object))
        blobs.append(sk.serialize())
    shuffled = blobs[:]
    rnd.shuffle(shuffled)
    m1 = HeavyKeeper.deserialize(merge_blobs(blobs))
    m2 = HeavyKeeper.deserialize(merge_blobs(shuffled))
    uniq = np.asarray(sorted(truth), dtype=object)
    assert list(m1.estimate(uniq)) == list(m2.estimate(uniq))
    for k, e in zip(uniq, m1.estimate(uniq)):
        assert int(e) == truth[k]


@settings(max_examples=25, deadline=None)
@given(keys_st)
def test_serialize_roundtrip_identity(keys):
    for cls in (BucketedTopK, CuckooTopK):
        sk = cls(16, 256, 4, 0.9, 5)
        sk.add_batch(np.asarray([k.encode() for k in keys], dtype=object))
        back = cls.deserialize(sk.serialize())
        assert back.list() == sk.list()
        uniq = np.asarray(sorted({k.encode() for k in keys}), dtype=object)
        assert list(back.estimate(uniq)) == list(sk.estimate(uniq))


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=0, max_codepoint=0x2FF),
            max_size=40,
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_buffer_hash_lane_identity(keys, seed):
    """Property: the Arrow zero-copy lane and the object-array lane
    produce identical hashes for ANY str keys (incl. non-ASCII,
    empties, duplicates) — the invariant every distributed fingerprint
    depends on."""
    import numpy as np
    import pyarrow as pa

    from heavykeeper_rs_spark.kernel import (
        arrow_string_buffers,
        hash_items,
        hash_string_buffers,
    )

    h_obj = hash_items(np.asarray(keys, dtype=object), seed)
    col = pa.array(keys, type=pa.string())
    off, data = arrow_string_buffers(col)
    h_arrow = hash_string_buffers(off, data, seed)
    assert np.array_equal(h_obj, h_arrow)
    # equal keys hash equal, and the map is injective on this sample
    # modulo true 64-bit collisions (astronomically unlikely here)
    uniq = {}
    for k, h in zip(keys, h_obj.tolist()):
        if k in uniq:
            assert uniq[k] == h
        uniq[k] = h
    assert len({v for v in uniq.values()}) == len(uniq)


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_image_codec_roundtrip_property(h, w, ch, seed):
    """PNG (all channel counts), PPM/PGM (1/3), BMP (3) must round-trip
    arbitrary uint8 pixel data bit-exactly."""
    import numpy as np

    from heavykeeper_rs_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        decode_ppm,
        encode_bmp,
        encode_png,
        encode_ppm,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    if ch == 1:
        img = img[:, :, 0]
    assert (decode_png(encode_png(img)) == img).all()
    if ch in (1, 3):
        assert (decode_ppm(encode_ppm(img)) == img).all()
    if ch == 3:
        assert (decode_bmp(encode_bmp(img)) == img).all()
