"""Single-core kernel throughput on the BENCH.md fixtures.

Usage: python tools/bench_kernel.py [n_keys]
Prints M keys/s per fixture so rounds are comparable to BASELINE.md's
Melem/s figures (reference Rust hot loop: ~21 M/s single-thread).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from heavykeeper_rs_spark.kernel import HeavyKeeper, HKParams  # noqa: E402
from heavykeeper_rs_spark.variants import BucketedTopK, CuckooTopK  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000


def cpu_control(tag):
    """Same control as bench.py: a fixed NumPy burn whose Mops rate
    brackets the run — single-core numbers on this box swing ~3x with
    co-tenant load, so compare A/B *within* a bracket whose pre/post
    controls agree, never across sessions. Best-of-3 with an untimed
    warm pass: a cold first allocation reads ~5x slow and would make
    every bracket look dirty."""
    x = np.arange(5_000_000, dtype=np.float64)
    y = np.sqrt(x)  # warm pages + ufunc dispatch
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        for _ in range(5):
            y = np.sqrt(x) * 1.0000001
            y += 1.0
        best = max(best, 25_000_000 / (time.time() - t0) / 1e6)
    print(f"cpu_control_{tag:46s} {best:6.2f} Mops")
    return best
# Kernel feed size in the distributed path: _build_partial coalesces
# Spark's 65536-row Arrow batches to _COALESCE_ROWS before each kernel
# pass (operators/topk.py), so the single-core bench feeds the same way.
B = 1048576


def run(name, keys, params, cls=None, reps=1):
    best = 0.0
    for _ in range(reps):
        sk = (
            HeavyKeeper(params)
            if cls is None
            else cls(params.k, params.width, params.depth, params.decay, params.seed)
        )
        t0 = time.time()
        for i in range(0, len(keys), B):
            sk.add_batch(keys[i : i + B])
        dt = time.time() - t0
        best = max(best, len(keys) / dt / 1e6)
    print(f"{name:55s} {best:6.2f} M keys/s")
    return best


rng = np.random.default_rng(42)

# THE reference bench fixture (benches/topk_vs_bucketed.rs:13-23):
# bounded Zipf(universe=1e6, s=1.2) u64 keys, K=100, width=4096,
# depth=4, decay=0.9 — reference single-thread result: ~21 M elem/s
ranks = np.arange(1, 1_000_001, dtype=np.float64)
cdf = np.cumsum(ranks ** -1.2)
cdf /= cdf[-1]
bounded = (np.searchsorted(cdf, rng.random(N), side="left") + 1).astype(np.int64)
# best-of-3 on the headline fixture: this box's single-core swings
# with co-tenant load (see BENCH.md cpu_control notes), and the
# headline is what rounds compare
run(
    "REFERENCE fixture: bounded Zipf(1e6,1.2) w=4096 d=4 K=100",
    bounded,
    HKParams(k=100, width=4096, depth=4),
    reps=3,
)

# adversarial variant: unbounded Zipf tail mixed over u64 — more
# distinct keys (~10% of stream) than cells, duels never stop
zipf = rng.zipf(1.2, N)
with np.errstate(over="ignore"):
    u64 = (
        (zipf.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        % np.uint64(1 << 40)
    ).astype(np.int64)
run("adversarial unbounded-Zipf u64 width=65536 K=100", u64, HKParams(k=100, width=65536, depth=4))
run("adversarial unbounded-Zipf u64 width=4096  K=100", u64, HKParams(k=100, width=4096, depth=4))

as_str = np.asarray([str(x) for x in bounded[: N // 2]], dtype=object)
run("u64-as-string Zipf(1.2)  width=4096  K=100", as_str, HKParams(k=100, width=4096, depth=4))

domains = np.asarray(
    [f"host-{x % 10_000}.example.com" for x in zipf[: N // 2]], dtype=object
)
run("domain strings (10k distinct) width=16384 K=100", domains, HKParams(k=100, width=16384, depth=4))


def run_dict(name, strs, params):
    """What the distributed path actually does for string columns:
    Arrow dictionary_encode per batch, distinct values hashed straight
    off the Arrow buffers, zero-object insert (operators.topk
    _feed_str_col with hashed=True)."""
    import pyarrow as pa
    import time as _t

    from heavykeeper_rs_spark.operators.topk import _feed_str_col

    col = pa.array(list(strs), type=pa.string())
    sk = HeavyKeeper(params)
    t0 = _t.time()
    for i in range(0, len(col), B):
        _feed_str_col(sk, col.slice(i, B), None, params.seed, hashed=True)
    dt = _t.time() - t0
    print(f"{name:55s} {len(col)/dt/1e6:6.2f} M keys/s")


run_dict(
    "domain strings via arrow buffer-hash (distributed path)",
    domains,
    HKParams(k=100, width=16384, depth=4),
)
run_dict(
    "u64-as-string via arrow buffer-hash (distributed path)",
    as_str,
    HKParams(k=100, width=4096, depth=4),
)

# same-session A/B with cpu-control bracket (round-5 verdict #2):
# best-of-3 each, interleaved-free back-to-back, controls pre/post —
# the parity claim (cuckoo >= 0.9x bucketed) is only valid when the
# two controls agree
ctl_pre = cpu_control("pre")
b = run("bucketed variant, reference fixture w=4096 K=100", bounded[: N // 2],
        HKParams(k=100, width=4096, depth=4), cls=BucketedTopK, reps=3)
c = run("cuckoo variant, reference fixture w=4096 K=100", bounded[: N // 2],
        HKParams(k=100, width=4096, depth=4), cls=CuckooTopK, reps=3)
ctl_post = cpu_control("post")
print(
    f"{'cuckoo/bucketed parity (controls pre/post above)':55s} "
    f"{c / b:6.3f}"
)
