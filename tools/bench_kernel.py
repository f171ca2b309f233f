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
B = 65536  # Arrow batch size in the distributed path


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
zipf = rng.zipf(1.2, N)

u64 = (zipf * 0x9E3779B97F4A7C15 % (1 << 40)).astype(np.int64)
run("u64 int64-lanes Zipf(1.2) width=65536 K=100", u64, HKParams(k=100, width=65536, depth=4))
run("u64 int64-lanes Zipf(1.2) width=4096  K=100", u64, HKParams(k=100, width=4096, depth=4))

as_str = np.asarray([str(x) for x in u64[: N // 2]], dtype=object)
run("u64-as-string Zipf(1.2)  width=4096  K=100", as_str, HKParams(k=100, width=4096, depth=4))

domains = np.asarray(
    [f"host-{x % 10_000}.example.com" for x in zipf[: N // 2]], dtype=object
)
run("domain strings (10k distinct) width=16384 K=100", domains, HKParams(k=100, width=16384, depth=4))


def run_dict(name, strs, params):
    """What the distributed path actually does for string columns:
    Arrow dictionary_encode per batch, kernel hashes only uniques."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import time as _t

    col = pa.array(list(strs), type=pa.string())
    sk = HeavyKeeper(params)
    t0 = _t.time()
    for i in range(0, len(col), B):
        d = pc.dictionary_encode(col.slice(i, B))
        idx = d.indices.to_numpy(zero_copy_only=False)
        w = np.bincount(idx, minlength=len(d.dictionary)).astype(np.int64)
        sk.add_batch(d.dictionary.to_numpy(zero_copy_only=False), weights=w)
    dt = _t.time() - t0
    print(f"{name:55s} {len(col)/dt/1e6:6.2f} M keys/s")


run_dict(
    "domain strings via arrow dict-encode (distributed path)",
    domains,
    HKParams(k=100, width=16384, depth=4),
)

run("bucketed variant u64 width=65536 K=100", u64[: N // 2],
    HKParams(k=100, width=65536, depth=4), cls=BucketedTopK)
run("cuckoo variant u64 width=65536 K=100", u64[: N // 2],
    HKParams(k=100, width=65536, depth=4), cls=CuckooTopK)
