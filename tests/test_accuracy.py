"""Seeded-Zipf accuracy suite with the reference's CI floors
(tests/accuracy_compare.rs) as hard assertions.

Floors (see BASELINE.md):
- hit_ratio >= 0.80 / 0.50 / 0.20 at Zipf s = 2.0 / 1.2 / 1.05
- ARE < 1.0 at s in {2.0, 1.2}
- paper-style (s=1.2, phi=0.0005, K=512): precision >= 0.85,
  recall >= 0.75, ARE < 0.25

The reference runs 5M/1M samples; we run 1M by default (set
HK_FULL_ACCURACY=1 for the full 5M) — floors are scale-free ratios.
Ground truth is the exact counter, as in accuracy_compare.rs:43-49.
"""

import collections
import os

import numpy as np
import pytest

from heavykeeper_rs_spark.kernel import HeavyKeeper

FULL = os.environ.get("HK_FULL_ACCURACY") == "1"
N_HIT = 5_000_000 if FULL else 1_000_000
N_PAPER = 1_000_000
ZIPF_N = 1_000_000
SEED = 0xACC04ACC


def zipf_stream(s: float, n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, ZIPF_N + 1, dtype=np.float64)
    cdf = np.cumsum(ranks**-s)
    cdf /= cdf[-1]
    return np.searchsorted(cdf, rng.random(n), side="left").astype(np.int64)


def build(keys_int: np.ndarray, k: int, width: int = 256, depth: int = 4,
          decay: float = 0.9, batches: int = 16) -> HeavyKeeper:
    keys = keys_int.astype(str).astype(object)
    sk = HeavyKeeper.with_seed(k, width, depth, decay, 12345)
    for chunk in np.array_split(keys, batches):
        sk.add_batch(chunk)
    return sk


@pytest.mark.parametrize(
    "s,floor",
    [(2.0, 0.80), (1.2, 0.50), (1.05, 0.20)],
)
def test_hit_ratio_floors(s, floor):
    stream = zipf_stream(s, N_HIT, SEED)
    sk = build(stream, k=100)
    truth = collections.Counter(stream)
    top = {str(k).encode() for k, _ in truth.most_common(100)}
    got = {item for item, _ in sk.list()}
    hit = len(got & top) / 100
    assert hit >= floor, f"hit_ratio {hit} < floor {floor} at s={s}"


@pytest.mark.parametrize("s", [2.0, 1.2])
def test_are_bound(s):
    stream = zipf_stream(s, N_HIT, SEED)
    sk = build(stream, k=100)
    truth = collections.Counter(stream)
    got = dict(sk.list())
    errs = [
        abs(got.get(str(k).encode(), 0) - c) / c for k, c in truth.most_common(100)
    ]
    are = float(np.mean(errs))
    assert are < 1.0, f"ARE {are} >= 1.0 at s={s}"


def test_paper_style_heavy_hitter_metrics():
    # s=1.2, phi=0.0005 -> threshold = ceil(phi * len), K=512
    stream = zipf_stream(1.2, N_PAPER, SEED + 1)
    phi = 0.0005
    thresh = int(np.ceil(phi * N_PAPER))
    truth = collections.Counter(stream)
    true_hh = {str(k).encode(): c for k, c in truth.items() if c >= thresh}
    assert len(true_hh) < 512, "K must exceed true HH count (sanity)"
    sk = build(stream, k=512)
    reported = {item: c for item, c in sk.list() if c >= thresh}
    tp = set(reported) & set(true_hh)
    precision = len(tp) / max(len(reported), 1)
    recall = len(tp) / max(len(true_hh), 1)
    are = float(
        np.mean([abs(reported.get(k, 0) - c) / c for k, c in true_hh.items()])
    )
    assert precision >= 0.85, f"precision {precision}"
    assert recall >= 0.75, f"recall {recall}"
    assert are < 0.25, f"ARE {are}"


def test_merge_preserves_accuracy_across_partitions():
    """Distributed shape: split the stream into P partition sketches,
    merge pairwise in random orders; floors must still hold and the two
    merge orders must agree on the top-K set (SURVEY §2.7: agreement
    within bound; exactness of the set is the stronger empirical check)."""
    stream = zipf_stream(1.2, N_PAPER, SEED + 2)
    parts = np.array_split(stream, 8)
    blobs = []
    for i, part in enumerate(parts):
        sk = HeavyKeeper.with_seed(100, 256, 4, 0.9, 12345)
        sk.rng = np.random.default_rng(12345 + i)
        sk.add_batch(part.astype(str).astype(object))
        blobs.append(sk.serialize())

    def fold(order):
        acc = HeavyKeeper.deserialize(blobs[order[0]])
        for i in order[1:]:
            acc.merge(HeavyKeeper.deserialize(blobs[i]))
        return acc

    m1 = fold(list(range(8)))
    m2 = fold(list(range(7, -1, -1)))
    truth = collections.Counter(stream)
    top = {str(k).encode() for k, _ in truth.most_common(100)}
    for m in (m1, m2):
        got = {item for item, _ in m.list()}
        assert len(got & top) / 100 >= 0.50
    # estimate agreement between merge orders within HK bound (loose 10%)
    g1, g2 = dict(m1.list()), dict(m2.list())
    common = set(g1) & set(g2)
    assert len(common) >= 80
    for k in common:
        hi, lo = max(g1[k], g2[k]), min(g1[k], g2[k])
        assert hi == 0 or (hi - lo) / hi < 0.10
