"""Extra benchmarks for the optimization round (bench.py is FROZEN for
measurement; this file holds the per-query isolation and phase
breakdowns the optimization guide §1 calls for).

Usage:
    python bench_extra.py [sf_dir] [query ...]   # per-query reps
    BENCH_EXTRA_REPS=3 python bench_extra.py ...

Prints one JSON line: {"sf_dir": ..., "queries": {name: [rep_secs...]},
"total_min": ...}. Uses the same session factory and query registry as
bench.py so numbers are comparable; queries that return local-result
DataFrames are timed over the full call + count, like bench.py does.
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


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not names:
        names = BENCH_QUERIES
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app="hk-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    qs = entrymod.queries()
    # warm the JVM + python workers like bench.py does
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    from heavykeeper_rs_spark.operators.topk import topk

    topk(spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000),
         "event_type", k=1, width=64, depth=1).count()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(round(time.time() - t0, 3))
            assert n >= 0
        out[name] = samples
    spark.stop()
    total_min = round(sum(min(v) for v in out.values()), 3)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out,
                      "total_min": total_min}))


if __name__ == "__main__":
    main()
