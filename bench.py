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
    "hll_distinct_users_ok",
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app="hk-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    # warm the JVM + python workers once so per-query numbers are steady
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    t0 = time.time()
    queries = run_suite(spark, sf_dir)
    total = round(time.time() - t0, 3)
    result = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf),
        "cpus": int(cpus),
    }
    if os.environ.get("BENCH_SCALING"):
        from heavykeeper_rs_spark.operators.topk import topk
        from heavykeeper_rs_spark.sources.synth import webtext

        spark.stop()
        scaling = {}
        n_docs = int(os.environ.get("BENCH_SCALE_DOCS", "400000"))
        for par in (8, 32):
            s = get_spark(app=f"hk-scale-{par}", master=f"local[{par}]", shuffle_partitions=par)
            wt = webtext(s, n_docs, partitions=par * 2)
            t1 = time.time()
            topk(wt, "url", k=100, width=65536, depth=4).count()
            dt = time.time() - t1
            scaling[f"local[{par}]"] = {
                "sec": round(dt, 3),
                "docs_per_sec": round(n_docs / dt, 1),
            }
            s.stop()
        eff = (
            scaling["local[32]"]["docs_per_sec"]
            / scaling["local[8]"]["docs_per_sec"]
            / 4.0
        )
        result["scaling"] = {**scaling, "efficiency_8_to_32": round(eff, 3)}
    else:
        spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
