"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Also reports sketch throughput (rows/sec through the HeavyKeeper build)
so rounds are comparable to BASELINE.md's Melem/s figures.
Set BENCH_SCALING=1 to additionally run the flagship at local[8] vs
local[32] on identical input and report scaling efficiency (north rule
evidence — see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from heavykeeper_rs_spark.session import get_spark

BENCH_QUERIES = [
    # r4 note: r1-r3 also timed hll_distinct_users_ok (~1.0-1.7 s);
    # it was folded into the sketch_bounds_ok gate (not a perf query),
    # so cross-round suite totals compare against r3 minus that entry.
    "hk_topk_event_type",
    "hk_topk_user",
    "hk_topk_tokens",
    "hk_weighted_topk_part",
    "hk_estimate_event_types",
    "exact_topk_tokens",
    "lineitem_pricing_summary",
    "revenue_by_segment",
    "top_sources_per_lang",
    "token_stats_per_lang",
    "exact_dedup_text",
    "tpch_q3_shipping",
    "minhash_near_dup_pairs",
    "embedding_topk_cosine",
    "lang_id_counts",
]


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        assert n >= 0
    return out


def _cpu_control(reps: int = 5, n: int = 5_000_000) -> dict:
    """No-Spark CPU control stamped into EVERY bench emission (round-4
    verdict #2): a single-process pure-python burn whose rate depends
    only on this box's free CPU. On an idle box the reps agree within
    a few percent; under host contention the absolute rate drops and
    the spread blows up — so a polluted bench artifact (like the
    driver-window BENCH_r03.json, uniformly ~1.3x slow) self-identifies
    instead of reading as a code regression. Observed range on this
    container (round 4): ~12-16 Mops single-proc; compare pre/post and
    across artifacts rather than against an absolute — the box never
    sits fully idle."""
    rates = []
    for _ in range(reps):
        t0 = time.time()
        _burn(n)
        rates.append(n / (time.time() - t0))
    rates.sort()
    return {
        "best_mops": round(rates[-1] / 1e6, 2),
        "median_mops": round(rates[len(rates) // 2] / 1e6, 2),
        "spread": round((rates[-1] - rates[0]) / rates[-1], 3),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    cpu_pre = _cpu_control()
    spark = get_spark(app="hk-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    # headline keys/sec FIRST, on the pristine JVM: running ANY python
    # job with a different Arrow schema first (even an identity map
    # over a string cast) permanently deoptimizes the JVM's Arrow
    # column-writer call sites (monomorphic -> megamorphic JIT inline
    # caches) and the same warm stage measures ~6 s instead of ~1.4 s.
    # The reference benches its hot loop in a dedicated binary; the
    # fresh-JVM number is the comparable one. Isolation evidence in
    # BENCH.md (identity-map experiments); the suite below then runs
    # at the realistic mixed-schema steady state.
    u64 = run_keys_per_sec(spark)
    # headline docs/sec SECOND (round-4 verdict #2: before the suite,
    # not after 16 mixed-schema queries) — only the u64 fixture's
    # int64 schema has touched the JVM at this point
    docs = run_docs_per_sec(spark)
    # warm the JVM + python workers once so per-query numbers are steady
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    from heavykeeper_rs_spark.operators.topk import topk

    topk(
        spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000),
        "event_type",
        k=1,
        width=64,
        depth=1,
    ).count()
    # median-of-3 suite (round-4 verdict #2): per-query medians +
    # every total, so one contention spike reads as variance, not
    # regression
    n_reps = int(os.environ.get("BENCH_SUITE_REPS", "3"))
    rep_queries: list[dict[str, float]] = []
    rep_totals: list[float] = []
    for _ in range(n_reps):
        t0 = time.time()
        rep_queries.append(run_suite(spark, sf_dir))
        rep_totals.append(round(time.time() - t0, 3))
    queries = {
        name: sorted(r[name] for r in rep_queries)[n_reps // 2]
        for name in rep_queries[0]
    }
    total = round(sorted(rep_totals)[n_reps // 2], 3)
    result = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "suite_rep_totals": rep_totals,
        "sf": float(sf),
        "cpus": int(cpus),
    }
    # docs/sec (north-rule metric), measured pre-suite above; a
    # steady-state remeasure after the mixed-schema suite shows the
    # JIT-deopt gap explicitly instead of polluting the headline
    result["docs_per_sec"] = docs
    result["docs_per_sec_steady_state"] = run_docs_per_sec(spark)
    # headline keys/sec: the reference's own bench fixture end to end
    # (BASELINE.md: Rust single-thread hot loop = 21 M keys/s)
    result["u64_keys_per_sec"] = u64
    # contention fingerprint: pre/post controls bracket the whole run
    result["cpu_control_pre"] = cpu_pre
    result["cpu_control_post"] = _cpu_control()
    spark.stop()
    if os.environ.get("BENCH_SCALING"):
        result["scaling"] = run_scaling()
    elif os.environ.get("BENCH_SCALING_LIGHT"):
        # light two-parallelism check: same token-topk job on identical
        # input at local[2] vs local[8] (a true 4x physical-core step).
        # The authoritative scaling evidence (multiple runs + hardware
        # control, per the north rule) lives in BENCH.md — this shared
        # box's minute-to-minute contention makes single-shot numbers
        # swing 2x, so it is not recorded by default.
        result["scaling"] = run_scaling_light()
    print(json.dumps(result))



def run_keys_per_sec(spark) -> dict:
    """End-to-end distributed u64 top-K on the REFERENCE'S bench
    fixture (benches/topk_vs_bucketed.rs: bounded Zipf(1e6, 1.2),
    K=100, w=4096, d=4), 40M keys: parquet scan -> Arrow -> kernel ->
    merge tree -> driver. Warm, best of 2. The fixture parquet is
    generated once and cached in the temp dir."""
    import tempfile

    import numpy as np

    from heavykeeper_rs_spark.operators.topk import topk

    n = 40_000_000
    path = os.path.join(tempfile.gettempdir(), "hk_zipf40m.parquet")
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(42)
        keys = np.minimum(rng.zipf(1.2, n), 1_000_000).astype(np.int64)
        pq.write_table(
            pa.table({"key": keys}), path, row_group_size=n // 128
        )
    df = spark.read.parquet(path)
    df.count()  # warm the scan
    topk(df, "key", k=100, width=4096, depth=4).count()  # warm the kernel path
    reps = []
    for _ in range(4):
        t0 = time.time()
        topk(df, "key", k=100, width=4096, depth=4).count()
        reps.append(time.time() - t0)
    best = min(reps)
    # report best-of-4 plus every rep so variance (host contention,
    # JIT state) is visible rather than silently folded in
    return {
        "n_keys": n,
        "sec": round(best, 3),
        "keys_per_sec": round(n / best, 1),
        "rep_secs": [round(r, 2) for r in reps],
        "reference_single_thread": 21_000_000,
    }

def run_docs_per_sec(spark) -> dict:
    """Token top-K throughput over a deterministic webtext corpus —
    the docs/sec figure of the BASELINE metric, reusing the live
    session (warm workers)."""
    import tempfile

    from heavykeeper_rs_spark.operators.topk import topk_tokens
    from heavykeeper_rs_spark.sources.synth import webtext

    n_docs = int(os.environ.get("BENCH_DOCS", "300000"))
    data_dir = os.path.join(tempfile.gettempdir(), f"hk_docs_{n_docs}")
    if not os.path.exists(data_dir):
        webtext(spark, n_docs, partitions=64).select("doc_id", "text").write.parquet(
            data_dir, mode="overwrite"
        )
    df = spark.read.parquet(data_dir)
    topk_tokens(df, "text", k=100, width=16384, depth=4).count()  # warm
    best = None
    for _ in range(2):
        t1 = time.time()
        topk_tokens(df, "text", k=100, width=16384, depth=4).count()
        dt = time.time() - t1
        best = dt if best is None else min(best, dt)
    return {
        "n_docs": n_docs,
        "sec": round(best, 3),
        "docs_per_sec": round(n_docs / best, 1),
        "tokens_per_sec": round(40 * n_docs / best, 1),
    }


def run_scaling_light() -> dict:
    import tempfile

    from heavykeeper_rs_spark.operators.topk import topk_tokens
    from heavykeeper_rs_spark.sources.synth import webtext

    n_docs = int(os.environ.get("BENCH_SCALE_DOCS", "1200000"))
    data_dir = os.path.join(tempfile.gettempdir(), f"hk_scale_tok_{n_docs}")
    if not os.path.exists(data_dir):
        s = get_spark(app="hk-scale-gen", master="local[32]", shuffle_partitions=32)
        webtext(s, n_docs, partitions=64).select("doc_id", "text").write.parquet(
            data_dir, mode="overwrite"
        )
        s.stop()
    out: dict = {"n_docs": n_docs, "job": "topk_tokens(k=100,w=16384,d=4)"}
    for par in (1, 2, 4, 8):
        s = get_spark(app=f"hk-scale-{par}", master=f"local[{par}]", shuffle_partitions=par)
        s.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        df = s.read.parquet(data_dir)
        topk_tokens(df, "text", k=100, width=16384, depth=4).count()  # warm
        best = None
        for _ in range(2):
            t1 = time.time()
            topk_tokens(df, "text", k=100, width=16384, depth=4).count()
            dt = time.time() - t1
            best = dt if best is None else min(best, dt)
        out[f"local[{par}]"] = {
            "sec": round(best, 3),
            "docs_per_sec": round(n_docs / best, 1),
        }
        s.stop()
    # two independent 4x steps: 1->4 is the clean one on this box;
    # 2->8 straddles the single-socket memory-bandwidth ceiling (see
    # BENCH.md round-3 analysis and the HK_TOKENIZE_ARROW control)
    out["efficiency_1_to_4"] = round(
        out["local[4]"]["docs_per_sec"] / out["local[1]"]["docs_per_sec"] / 4.0, 3
    )
    out["efficiency_2_to_8"] = round(
        out["local[8]"]["docs_per_sec"] / out["local[2]"]["docs_per_sec"] / 4.0, 3
    )
    # the no-Spark CPU control: what 2->8 workers is physically worth
    # on this box (see BENCH.md methodology)
    out["raw_cpu_eff_2_to_8"] = _hw_ceiling()["raw_cpu_eff_2_to_8"]
    out["efficiency_vs_hw_ceiling"] = round(
        out["efficiency_2_to_8"] / max(out["raw_cpu_eff_2_to_8"], 1e-9), 3
    )
    return out


def _hw_ceiling() -> dict:
    """Hardware control: raw multiprocess CPU scaling on this box.

    The container advertises 32 CPUs but pure CPU-bound multiprocess
    work tops out below 4x going 8 -> 32 workers (SMT/shared-cache
    ceiling). Cluster scaling efficiency must be judged against this
    ceiling, not against an ideal 4x the silicon can't deliver."""
    import multiprocessing as mp

    def _t(procs: int) -> float:
        with mp.Pool(procs) as p:
            p.map(_burn, [1] * procs)  # warm pool
            t0 = time.time()
            p.map(_burn, [3_000_000] * procs * 4)
            return (procs * 4) / (time.time() - t0)

    u2, u8, u32 = _t(2), _t(8), _t(32)
    return {
        "raw_cpu_eff_2_to_8": round(u8 / u2 / 4.0, 3),
        "raw_cpu_eff_8_to_32": round(u32 / u8 / 4.0, 3),
    }


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def run_scaling() -> dict:
    """North-rule scaling evidence: the SAME job over the SAME on-disk
    input at two parallelism-level pairs, (local[2] -> local[8]) and
    (local[8] -> local[32]), each a 4x core step. The job is token
    top-K over webtext with in-kernel tokenization — python-compute
    bound, the distributed word_count analog. Input is materialized
    once (128 parquet files >> cores, so no level is split-bound);
    each session gets a warm-up run so JVM/worker startup isn't billed
    to throughput. A raw multiprocess CPU control establishes the
    hardware ceiling for the 8 -> 32 step (SMT)."""
    import tempfile

    from heavykeeper_rs_spark.operators.topk import topk_tokens
    from heavykeeper_rs_spark.sources.synth import webtext

    n_docs = int(os.environ.get("BENCH_SCALE_DOCS", "1500000"))
    reps = int(os.environ.get("BENCH_SCALE_REPS", "2"))
    data_dir = os.path.join(tempfile.gettempdir(), f"hk_scale_tok_{n_docs}")
    if not os.path.exists(data_dir):
        s = get_spark(app="hk-scale-gen", master="local[32]", shuffle_partitions=32)
        webtext(s, n_docs, partitions=128).select("doc_id", "text").write.parquet(
            data_dir, mode="overwrite"
        )
        s.stop()

    def job(s):
        df = s.read.parquet(data_dir)
        return topk_tokens(df, "text", k=100, width=16384, depth=4, merge_groups=16).count()

    scaling: dict = {"n_docs": n_docs, "job": "topk_tokens(k=100,w=16384,d=4)"}
    for par in (2, 8, 32):
        s = get_spark(app=f"hk-scale-{par}", master=f"local[{par}]", shuffle_partitions=par)
        s.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        job(s)  # warm-up
        best = None
        for _ in range(reps):
            t1 = time.time()
            job(s)
            dt = time.time() - t1
            best = dt if best is None else min(best, dt)
        scaling[f"local[{par}]"] = {
            "sec": round(best, 3),
            "docs_per_sec": round(n_docs / best, 1),
        }
        s.stop()
    d2 = scaling["local[2]"]["docs_per_sec"]
    d8 = scaling["local[8]"]["docs_per_sec"]
    d32 = scaling["local[32]"]["docs_per_sec"]
    scaling["efficiency_2_to_8"] = round(d8 / d2 / 4.0, 3)
    scaling["efficiency_8_to_32"] = round(d32 / d8 / 4.0, 3)
    scaling.update(_hw_ceiling())
    scaling["efficiency_8_to_32_vs_hw_ceiling"] = round(
        scaling["efficiency_8_to_32"] / max(scaling["raw_cpu_eff_8_to_32"], 1e-9), 3
    )
    return scaling


if __name__ == "__main__":
    main()
