"""ANN scale rehearsal: persisted IVF index at 100k+ vectors.

The gate-scale embeddings table (500-2000 vectors) proves correctness;
this drives the 10^12-shape claims: build the centroid-partitioned
index once at n>=100k, then measure search recall@10 and wall time as
n_probe sweeps from 1 to n_centroids — the recall-vs-cost curve a real
deployment tunes. Ground truth is brute-force cosine over the same
vectors. Results land in BENCH.md.

Usage: python tools/stress_ann.py [n_vectors] [dim] [n_centroids]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from pyspark.sql import functions as F

    from heavykeeper_rs_spark.operators.similarity import (
        brute_force_topk,
        ivf_build_index,
        ivf_search_index,
    )
    from heavykeeper_rs_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cent = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark(app="stress-ann", master="local[32]", shuffle_partitions=32)

    # clustered synthetic vectors (ANN is trivial on uniform noise):
    # 256 Gaussian cluster centers, vectors = center + noise
    data_dir = os.path.join(tempfile.gettempdir(), f"hk_ann_{n}_{dim}")
    if not os.path.exists(data_dir):
        rng = np.random.default_rng(11)
        centers = rng.normal(size=(256, dim)).astype(np.float32)  # unit-scale: clusters OVERLAP, so n_probe actually trades recall
        assign = rng.integers(0, 256, n)
        vecs = centers[assign] + rng.normal(size=(n, dim)).astype(np.float32)
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "vec_id": np.arange(n, dtype=np.int64),
                    "embedding": list(vecs.astype(np.float64)),
                }
            ),
            os.path.join(tempfile.gettempdir(), f"hk_ann_{n}_{dim}.parquet"),
        )
        os.makedirs(data_dir)
        os.replace(
            os.path.join(tempfile.gettempdir(), f"hk_ann_{n}_{dim}.parquet"),
            os.path.join(data_dir, "part0.parquet"),
        )
    emb = spark.read.parquet(data_dir)

    out: dict = {"n_vectors": n, "dim": dim, "n_centroids": n_cent}
    idxp = os.path.join(tempfile.gettempdir(), f"hk_ann_idx_{n}_{dim}_{n_cent}")
    t0 = time.time()
    cents = ivf_build_index(
        emb, "vec_id", "embedding", idxp, n_centroids=n_cent, train_sample=8192
    )
    out["build_sec"] = round(time.time() - t0, 1)

    # held-out queries: dataset vectors + Gaussian noise at half the
    # cluster radius — a query that IS a dataset vector makes recall
    # trivially 1 at tiny n_probe (its own copy dominates the top-10);
    # perturbed queries trace the real recall-vs-cost curve
    qrows = emb.orderBy("vec_id").limit(10).collect()
    qrng = np.random.default_rng(97)
    queries = [
        [
            float(x) + float(e)
            for x, e in zip(r["embedding"], 0.5 * qrng.normal(size=dim))
        ]
        for r in qrows
    ]

    t0 = time.time()
    truths = []
    for q in queries:
        truths.append(
            {r["vec_id"] for r in brute_force_topk(emb, "vec_id", "embedding", q, 10).collect()}
        )
    out["brute_force_sec_per_query"] = round((time.time() - t0) / len(queries), 2)

    for n_probe in (1, 2, 4, 8, 16, 32, n_cent):
        if n_probe > n_cent:
            continue
        t0 = time.time()
        hits = 0
        for q, truth in zip(queries, truths):
            got = {
                r["id"]
                for r in ivf_search_index(
                    spark, idxp, q, k=10, n_probe=n_probe, centroids=cents
                ).collect()
            }
            hits += len(got & truth)
        out[f"probe_{n_probe}"] = {
            "recall_at_10": round(hits / (10 * len(queries)), 3),
            "sec_per_query": round((time.time() - t0) / len(queries), 2),
            # index is partitionBy(centroid): a probe lists exactly
            # n_probe of n_cent partition dirs (PartitionFilters prune
            # the rest before any file IO)
            "partition_fraction_listed": round(n_probe / n_cent, 4),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
