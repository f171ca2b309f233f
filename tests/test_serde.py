"""Blob codec: restricted, non-executable, tamper-tolerant."""

import numpy as np
import pytest

from heavykeeper_rs_spark.serde import dumps, loads


def test_roundtrip_all_types():
    d = {
        "i": 42, "neg": -7, "big": 1 << 70, "f": 2.5, "b": True, "none": None,
        "s": "héllo ☃", "by": b"\x00\xff raw",
        "u64": np.arange(5, dtype=np.uint64),
        "mat": np.ones((2, 3), dtype=np.float32),
        "empty": np.zeros(0, dtype=np.int64),
        "nested": [[b"k", 3, 0], [5, 2, 1]],
    }
    r = loads(dumps(d))
    assert r["i"] == 42 and r["big"] == 1 << 70 and r["b"] is True
    assert r["none"] is None and r["s"] == "héllo ☃" and r["by"] == b"\x00\xff raw"
    assert r["u64"].dtype == np.uint64 and (r["u64"] == np.arange(5)).all()
    assert r["mat"].shape == (2, 3) and r["empty"].size == 0
    assert r["nested"] == [[b"k", 3, 0], [5, 2, 1]]


def test_rejects_object_dtype_and_unknown_types():
    with pytest.raises(TypeError):
        dumps(np.asarray(["a", object()], dtype=object))
    with pytest.raises(TypeError):
        dumps({"fn": lambda: 1})


def test_tampered_blob_raises_not_executes():
    blob = bytearray(dumps({"x": np.arange(4, dtype=np.int64)}))
    blob[0] = 250  # unknown tag
    with pytest.raises(ValueError):
        loads(bytes(blob))
    # truncated
    with pytest.raises(Exception):
        loads(dumps({"x": b"abcdef"})[:-3])


def test_sketch_blobs_contain_no_pickle():
    """No blob in the family may embed a pickle stream."""
    from heavykeeper_rs_spark.kernel import HeavyKeeper, HKParams
    from heavykeeper_rs_spark.sketches.bloom import Bloom
    from heavykeeper_rs_spark.sketches.cms import CountMin
    from heavykeeper_rs_spark.sketches.hll import HLL
    from heavykeeper_rs_spark.sketches.kll import KLL
    from heavykeeper_rs_spark.sketches.tdigest import TDigest
    from heavykeeper_rs_spark.variants import BucketedTopK, CuckooTopK

    hk = HeavyKeeper(HKParams(k=4, width=64, depth=2))
    hk.add_batch(np.asarray([b"a", b"b", b"a"], dtype=object))
    sketches = [hk, BucketedTopK(4, 64, 2), CuckooTopK(4, 64, 2),
                Bloom(1 << 10, 3, 1), CountMin(64, 3, 1), HLL(8, 1),
                KLL(64, 1), TDigest(100.0)]
    for sk in sketches:
        blob = sk.serialize()
        # pickle protocol>=2 streams start with b'\x80'; also check the
        # classic opcode tail b'.' isn't preceded by pickle marks
        assert b"\x80\x04" not in blob and b"\x80\x05" not in blob, type(sk)
        # roundtrip through the family deserializer
        rt = type(sk).deserialize(blob)
        assert rt.serialize() == blob


def test_sparse_blob_roundtrip_edges():
    """v2 sparse layout: empty sketch, single live cell, and the
    dense/sparse boundary all roundtrip byte-stably."""
    import numpy as np

    from heavykeeper_rs_spark.kernel import HeavyKeeper, HKParams

    empty = HeavyKeeper(HKParams(k=2, width=4096, depth=4))
    rt = HeavyKeeper.deserialize(empty.serialize())
    assert rt.list() == [] and (rt.counts == 0).all()

    one = HeavyKeeper(HKParams(k=2, width=4096, depth=4))
    one.add_batch(np.asarray([b"solo"], dtype=object))
    blob = one.serialize()
    assert blob[4] == 2  # sparse version byte
    rt = HeavyKeeper.deserialize(blob)
    assert rt.list() == [(b"solo", 1)]
    assert (rt.counts == one.counts).all() and (rt.fps == one.fps).all()

    dense = HeavyKeeper(HKParams(k=4, width=8, depth=1))
    dense.add_batch(np.asarray([f"k{i}".encode() for i in range(40)], dtype=object))
    blob = dense.serialize()
    assert blob[4] == 1  # dense version byte (fill >= 1/3)
    rt = HeavyKeeper.deserialize(blob)
    assert (rt.counts == dense.counts).all() and rt.list() == dense.list()


def test_truncated_and_deep_blobs_raise_valueerror():
    import pytest

    with pytest.raises(ValueError):
        loads(b"\x02")  # int tag, no payload
    deep = b"\x06" + (1).to_bytes(8, "little")
    blob = deep * 50 + b"\x00"  # 50-deep nested single-element lists
    with pytest.raises(ValueError, match="depth"):
        loads(blob)


def test_legacy_pickle_blob_clear_error():
    """Blobs from pre-serde builds (pickled candidate section under the
    same magic) must fail with a version message, not an opaque
    'unknown tag'."""
    import pickle
    import struct

    import pytest

    from heavykeeper_rs_spark.kernel import HKParams, HeavyKeeper, _MAGIC
    from heavykeeper_rs_spark.variants import BucketedTopK

    p = HKParams(k=2, width=8, depth=2, decay=0.9, seed=1)
    sk = HeavyKeeper(p)
    import numpy as np

    header = struct.pack("<4sBqqqdq", _MAGIC, 1, p.k, p.width, p.depth, p.decay, p.seed)
    legacy = header + sk.fps.tobytes() + sk.counts.tobytes() + pickle.dumps([])
    with pytest.raises(ValueError, match="older incompatible version"):
        HeavyKeeper.deserialize(legacy)
    legacy_var = b"HKB1" + pickle.dumps({"params": p.__dict__})
    with pytest.raises(ValueError, match="older incompatible version"):
        BucketedTopK.deserialize(legacy_var)
