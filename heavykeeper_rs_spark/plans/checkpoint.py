"""Per-partition lineage + metrics checkpointing for resumable sketch jobs.

North-rule contract: a 10^12-row build must survive preemption. The
partial (per-partition) sketches ARE the job state, so checkpointing
them makes the whole aggregation resumable:

- during the partial stage each task atomically writes
  ``{dir}/partials/part-{pid}.bin`` (temp + rename) plus a metrics
  JSON line (rows, uniques, seconds, mem_bytes, input lineage token);
- on re-run, a task whose blob already exists short-circuits: it
  emits the saved blob without doing any Python sketch work (the scan
  cost of already-done partitions is bounded by early-exit);
- blobs are validated against the job's params fingerprint — a
  checkpoint from a different sketch shape or input lineage is
  refused, not silently merged;
- the final merged sketch is written to ``{dir}/final.bin``; a
  completed job resumes in O(1).

On a real cluster ``dir`` is shared storage (S3/HDFS); locally it's a
directory. Only POSIX rename atomicity is assumed.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, IntegerType, StringType, StructField, StructType

from ..kernel import HeavyKeeper, HKParams, merge_blobs


def _params_token(params: HKParams, lineage: str, n_parts: int) -> str:
    """Job identity: sketch shape + input lineage + PARTITION LAYOUT.

    The partition count is part of the identity because partial blobs
    are keyed by partition id — a rerun that splits the same input
    differently (changed spark.sql.files.maxPartitionBytes, different
    parallelism, new files) would otherwise reuse blobs for partitions
    that now hold different rows, silently dropping/double-counting.
    A layout change makes the token mismatch and the job refuses the
    stale checkpoint instead.
    """
    return (
        f"k={params.k};w={params.width};d={params.depth};"
        f"decay={params.decay};seed={params.seed};lineage={lineage};"
        f"n_parts={n_parts}"
    )


def _atomic_write(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


@dataclass
class CheckpointReport:
    total_partitions: int
    resumed_partitions: int
    computed_partitions: int
    final_was_cached: bool


def topk_checkpointed(
    df: DataFrame,
    col: str,
    params: HKParams,
    ckpt_dir: str,
    lineage: str = "",
    merge_groups: int = 8,
) -> tuple[HeavyKeeper, CheckpointReport]:
    """Resumable distributed HeavyKeeper build.

    Returns (sketch, report). ``lineage`` should identify the input
    (table path + snapshot/version); it is baked into the checkpoint
    token so stale checkpoints never silently merge.
    """
    os.makedirs(f"{ckpt_dir}/partials", exist_ok=True)
    keyed = df.select(F.col(col).cast(StringType()).alias("__key"))
    n_input_parts = max(keyed.rdd.getNumPartitions(), 1)
    token = _params_token(params, lineage, n_input_parts)
    token_path = f"{ckpt_dir}/TOKEN"
    if os.path.exists(token_path):
        existing = open(token_path).read()
        if existing != token:
            raise ValueError(
                f"checkpoint dir {ckpt_dir} belongs to a different job: "
                f"{existing!r} != {token!r}"
            )
    else:
        _atomic_write(token_path, token.encode())

    final_path = f"{ckpt_dir}/final.bin"
    if os.path.exists(final_path):
        sk = HeavyKeeper.deserialize(open(final_path, "rb").read())
        n_parts = len(
            [f for f in os.listdir(f"{ckpt_dir}/partials") if f.endswith(".bin")]
        )
        return sk, CheckpointReport(n_parts, n_parts, 0, True)

    schema = StructType(
        [
            StructField("salt", IntegerType(), False),
            StructField("sketch", BinaryType(), False),
            StructField("status", StringType(), False),
        ]
    )

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        blob_path = f"{ckpt_dir}/partials/part-{pid:05d}.bin"
        if os.path.exists(blob_path):
            # resume: emit the saved partial, skip all sketch work
            yield pa.RecordBatch.from_pydict(
                {
                    "salt": pa.array([pid % merge_groups], type=pa.int32()),
                    "sketch": pa.array([open(blob_path, "rb").read()], type=pa.binary()),
                    "status": pa.array(["resumed"], type=pa.string()),
                }
            )
            return
        rng = np.random.default_rng(
            np.random.PCG64(((params.seed << 17) ^ 0x9E3779B97F4A7C15) + pid)
        )
        sk = HeavyKeeper(params, rng=rng)
        t0 = time.time()
        rows = 0
        for batch in batches:
            if batch.num_rows == 0:
                continue
            keys = batch.column(0).to_numpy(zero_copy_only=False)
            valid = pd.notna(keys)
            rows += int(valid.sum())
            sk.add_batch(keys[valid])
        blob = sk.serialize()
        _atomic_write(blob_path, blob)
        metrics = {
            "pid": pid,
            "rows": rows,
            "tracked": len(sk.pq),
            "mem_bytes": sk.mem_bytes(),
            "seconds": round(time.time() - t0, 3),
            "token": token,
            "ts": time.time(),
        }
        _atomic_write(
            f"{ckpt_dir}/partials/part-{pid:05d}.metrics.json",
            json.dumps(metrics).encode(),
        )
        yield pa.RecordBatch.from_pydict(
            {
                "salt": pa.array([pid % merge_groups], type=pa.int32()),
                "sketch": pa.array([blob], type=pa.binary()),
                "status": pa.array(["computed"], type=pa.string()),
            }
        )

    partials = keyed.mapInArrow(build, schema)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = merge_blobs(list(pdf["sketch"]))
        vals = list(pdf["status"])
        # carry COUNTS, not a deduped set — a merge group folding many
        # partitions must report every one of them
        res = sum(1 for s in vals if s == "resumed")
        comp = sum(1 for s in vals if s == "computed")
        return pd.DataFrame(
            {
                "salt": [int(pdf["salt"].iloc[0])],
                "sketch": [blob],
                "status": [f"resumed:{res},computed:{comp}"],
            }
        )

    combined = partials.groupBy("salt").applyInPandas(merge_group, schema).collect()
    status_counts = {"resumed": 0, "computed": 0}
    for r in combined:
        for part in r["status"].split(","):
            kind, _, n = part.partition(":")
            status_counts[kind] += int(n)
    blobs = [r["sketch"] for r in combined]
    if not blobs:
        sk = HeavyKeeper(params)
    else:
        sk = HeavyKeeper.deserialize(merge_blobs(blobs))
    _atomic_write(final_path, sk.serialize())
    resumed = status_counts["resumed"]
    computed = status_counts["computed"]
    summary = {
        "token": token,
        "resumed": resumed,
        "computed": computed,
        "tracked": len(sk.pq),
        "finished_ts": time.time(),
    }
    _atomic_write(f"{ckpt_dir}/SUMMARY.json", json.dumps(summary).encode())
    n_parts = len(
        [f for f in os.listdir(f"{ckpt_dir}/partials") if f.endswith(".bin")]
    )
    return sk, CheckpointReport(n_parts, resumed, computed, False)


def read_metrics(ckpt_dir: str) -> list[dict]:
    out = []
    pdir = f"{ckpt_dir}/partials"
    if not os.path.isdir(pdir):
        return out
    for fn in sorted(os.listdir(pdir)):
        if fn.endswith(".metrics.json"):
            out.append(json.loads(open(f"{pdir}/{fn}").read()))
    return out
