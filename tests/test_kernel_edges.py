"""Kernel edge cases mirroring the reference's boundary tests:
decay=1.0 full-range scaling (src/heavykeeper.rs:1488-1522), decay=0,
u64-range thresholds (src/heavykeeper.rs:1458-1486), non-power-of-two
widths (the % path of src/hash_composition.rs:39-43)."""

import numpy as np
import pytest

from heavykeeper_rs_spark.kernel import HeavyKeeper, compose_indices, hash_items
from heavykeeper_rs_spark.variants import BucketedTopK, CuckooTopK


def obj(*xs):
    return np.asarray(
        [x.encode() if isinstance(x, str) else x for x in xs], dtype=object
    )


def test_decay_one_always_decrements():
    # decay=1.0: every trial decrements -> a heavier challenger always
    # overwrites (deterministic takeover, like the forced-decay tests)
    sk = HeavyKeeper.with_seed(5, 1, 1, 1.0, 42)
    sk.add_batch(obj("A"), np.array([100]))
    sk.add_batch(obj("B"), np.array([300]))
    # B kills A's 100 in 100 trials, seizes with 300-100+1 = 201
    assert sk.estimate(obj("B"), use_heap=False)[0] == 201
    assert sk.estimate(obj("A"), use_heap=False)[0] == 0


def test_decay_zero_never_decrements():
    sk = HeavyKeeper.with_seed(5, 1, 1, 0.0, 42)
    sk.add_batch(obj("A"), np.array([3]))
    sk.add_batch(obj("B"), np.array([10**6]))
    assert sk.estimate(obj("A"), use_heap=False)[0] == 3
    assert sk.estimate(obj("B"), use_heap=False)[0] == 0


@pytest.mark.parametrize("cls", [HeavyKeeper.with_seed, BucketedTopK, CuckooTopK])
def test_non_power_of_two_width(cls):
    if cls is HeavyKeeper.with_seed:
        sk = HeavyKeeper.with_seed(10, 1000, 4, 0.9, 7)
    else:
        sk = cls(10, 1000, 4, 0.9, 7)
    sk.add_batch(obj(*[f"k{i}" for i in range(50) for _ in range(i + 1)]))
    est = sk.estimate(obj(*[f"k{i}" for i in range(50)]))
    want = np.arange(1, 51)
    # at width=1000 a couple of keys share one row's cell; duels may
    # shave a count or two — that's in-bound sketch error, not a bug
    assert (np.abs(est - want) <= np.maximum(4, want // 5)).all()
    assert (est == want).mean() >= 0.9


def test_index_range_mod_path():
    h = hash_items(obj(*[f"x{i}" for i in range(1000)]), 1)
    idx = compose_indices(h, 4, 1000)
    assert idx.max() < 1000 and idx.min() >= 0
    # distribution sanity: all rows hit a wide range of buckets
    for d in range(4):
        assert len(np.unique(idx[d])) > 500


def test_huge_counts_no_overflow_surprise():
    sk = HeavyKeeper.with_seed(5, 64, 2, 0.9, 1)
    sk.add_batch(obj("big"), np.array([2**40]))
    sk.add_batch(obj("big"), np.array([2**40]))
    assert sk.estimate(obj("big"))[0] == 2**41
    blob = sk.serialize()
    assert HeavyKeeper.deserialize(blob).estimate(obj("big"))[0] == 2**41


def test_empty_and_null_batches():
    sk = HeavyKeeper.new(5, 64, 2)
    sk.add_batch(np.asarray([], dtype=object))
    assert sk.list() == []
    sk.add_batch(obj("x"))
    assert dict(sk.list()) == {b"x": 1}


def test_min_shape_sketch():
    # k=1, width=1, depth=1 degenerate shapes (FIXTURES.md)
    sk = HeavyKeeper.new(1, 1, 1)
    sk._force_decay = False
    sk.add_batch(obj("a", "a", "b"))
    assert sk.contains_top_k("a")
    assert len(sk.pq) == 1
