"""Trace-scoring harness — the packaged analog of the reference's
examples/ip_files.rs accuracy runner (the one reference artifact round
3 listed as having no equivalent here).

Scores all three sketch layouts over a flow workload exactly the way
the reference does (ip_files.rs:116-173, 200-280):

- the SAME cell budgets: TopK(1000, 16384, 2), BucketedTopK(1000,
  8192, 4), CuckooTopK(1000, 8192, 4), decay 0.95;
- the SAME metrics: hit_ratio (reported ∩ true top-K / reported),
  ARE_reported (relative error of reported counts vs truth, skipping
  unknown items), ARE_true_top_k (relative error over the TRUE top-K
  via the sketch's own count(), so missing items score as zero);
- ground-truth top-K with the reference's tie-break (count desc, key
  bytes asc — ip_files.rs:107-114).

The build itself is the distributed path (scan → Arrow → kernel →
merge tree), not a driver loop; truth is one exact groupBy.

Usage:
  python tools/score_accuracy.py synth [n_packets]       # deterministic fixture
  python tools/score_accuracy.py synthfile [n_packets] [n_flows] [alpha]
      # reference-scale rehearsal: writes the deterministic fixture to
      # on-disk .dat shards first (examples/ip_files.rs reads files),
      # then scores through read_flow_trace over those files
  python tools/score_accuracy.py /path/to/traces [glob]  # CAIDA-style .dat files
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TOP_K = 1000
DECAY = 0.95


def score_results(results, truth, true_top_set, sketch_count):
    """ip_files.rs:126-173, verbatim semantics."""
    hits = sum(1 for item, _ in results if item in true_top_set)
    hit_ratio = hits / len(results) if results else 0.0
    s = n = 0
    for item, est in results:
        tc = truth.get(item, 0)
        if tc > 0:
            s += abs(est - tc) / tc
            n += 1
    are_reported = s / n if n else 0.0
    st = 0.0
    for item in true_top_set:
        st += abs(float(sketch_count(item)) - truth[item]) / truth[item]
    are_true_top_k = st / len(true_top_set) if true_top_set else 0.0
    return {
        "hit_ratio": round(hit_ratio, 4),
        "are_reported": round(are_reported, 6),
        "are_true_top_k": round(are_true_top_k, 6),
    }


def main() -> None:
    from heavykeeper_rs_spark.operators.topk import topk_sketch
    from heavykeeper_rs_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "synth"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app="score-accuracy", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    if src == "synth":
        from heavykeeper_rs_spark.sources.synth import flows

        n_packets = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
        df = flows(spark, n_packets, n_flows=100_000, alpha=1.3, seed=7)
    elif src == "synthfile":
        from heavykeeper_rs_spark.sources.synth import flows
        from heavykeeper_rs_spark.sources.trace import read_flow_trace

        n_packets = int(sys.argv[2]) if len(sys.argv) > 2 else 27_500_000
        n_flows = int(sys.argv[3]) if len(sys.argv) > 3 else 1_030_000
        alpha = float(sys.argv[4]) if len(sys.argv) > 4 else 1.3
        tdir = f"/tmp/flow_trace_{n_packets}_{n_flows}_{alpha}"
        if not os.path.isdir(tdir) or not os.listdir(tdir):
            os.makedirs(tdir, exist_ok=True)
            src_df = flows(spark, n_packets, n_flows=n_flows, alpha=alpha, seed=7)

            def dump(batches):
                import pyarrow as pa
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                n = 0
                with open(f"{tdir}/part-{pid:05d}.dat", "wb") as f:
                    for batch in batches:
                        col = batch.column(0)
                        buf = b"".join(col.to_pylist())
                        f.write(buf)
                        n += len(col)
                yield pa.RecordBatch.from_arrays(
                    [pa.array([n], type=pa.int64())], names=["n"]
                )

            wrote = src_df.mapInArrow(dump, "n long").groupBy().sum().collect()[0][0]
            print(f"wrote {wrote} records to {tdir}", file=sys.stderr)
        df = read_flow_trace(spark, tdir, key_size=13, glob="*.dat")
        src = tdir
    else:
        from heavykeeper_rs_spark.sources.trace import read_flow_trace

        glob = sys.argv[2] if len(sys.argv) > 2 else "*.dat"
        df = read_flow_trace(spark, src, key_size=13, glob=glob)
    df = df.cache()
    n_keys = df.count()

    # exact ground truth: one distributed groupBy (the reference builds
    # a HashMap while reading — ip_files.rs:29-32)
    truth_rows = df.groupBy("flow_key").count().collect()
    truth = {bytes(r["flow_key"]): int(r["count"]) for r in truth_rows}
    # reference tie-break: count desc, key bytes asc (ip_files.rs:110)
    ordered = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    true_top_set = {k for k, _ in ordered}

    out = {
        "n_keys": n_keys,
        "n_flows": len(truth),
        "top_k": TOP_K,
        "true_topk_threshold": ordered[-1][1] if ordered else 0,
        "source": src,
    }
    # reference cell budgets (ip_files.rs:216-220): ~32-41k cells each
    configs = [
        ("topk", 16384, 2),
        ("bucketed", 8192, 4),
        ("cuckoo", 8192, 4),
    ]
    for variant, width, depth in configs:
        t0 = time.time()
        sk = topk_sketch(
            df, "flow_key", k=TOP_K, width=width, depth=depth, decay=DECAY,
            variant=variant,
        )
        dt = time.time() - t0
        results = [(bytes(it), int(c)) for it, c in sk.list()]

        # one vectorized probe for the whole true top-K (the reference
        # calls count() per item — ip_files.rs:231; a python-side
        # per-item loop would pay 1000 numpy dispatches instead)
        tt = list(true_top_set)
        est = sk.estimate(np.asarray(tt, dtype=object))
        counts = {item: int(e) for item, e in zip(tt, est)}
        m = score_results(results, truth, true_top_set, counts.__getitem__)
        out[variant] = {
            "width": width,
            "depth": depth,
            "reported": len(results),
            "sec": round(dt, 3),
            "mpps": round(n_keys / dt / 1e6, 2),
            **m,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
