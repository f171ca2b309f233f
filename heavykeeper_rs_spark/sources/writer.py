"""Size-targeted output writing.

At 100 TB the difference between 50 MB and 5 GB output files is the
difference between a healthy downstream scan and a listing/stragglers
mess. ``write_sized`` sizes the file count from Catalyst's OWN
statistics (``optimizedPlan().stats().sizeInBytes`` — the same
estimate the optimizer uses for broadcast decisions, propagated from
source file sizes through the plan) instead of counting rows or
writing twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the DataFrame's plan — the ON-DISK
    (compressed) size at file-scan leaves, selectivity-propagated
    through filters/projections. For write-what-you-read pipelines it
    therefore approximates output size directly; adjust with
    ``compression_ratio`` when the pipeline materially changes row
    width (e.g. dropping the text column)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def write_sized(
    df: DataFrame,
    path: str,
    target_mb: int = 256,
    compression_ratio: float = 1.0,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_files: int = 100_000,
) -> int:
    """Write ``df`` as parquet with files sized ~``target_mb`` on disk.

    n_files = estimated_bytes / compression_ratio / target_mb. The
    leaf estimate is already compressed on-disk size, so the default
    ratio is 1; raise it when the written rows are materially narrower
    than the scanned ones. Returns the file count used. ``partition_by`` writes hive-style
    partitions; the repartition then hashes on those columns so each
    output partition directory is written by the tasks that own it
    (no small-file explosion of n_tasks x n_partitions).
    """
    est = estimated_bytes(df)
    n = max(1, min(int(est / compression_ratio / (target_mb << 20)) + 1, max_files))
    if partition_by:
        out = df.repartition(n, *partition_by)
        out.write.partitionBy(*partition_by).mode(mode).parquet(path)
    else:
        out = df.repartition(n)
        out.write.mode(mode).parquet(path)
    return n
