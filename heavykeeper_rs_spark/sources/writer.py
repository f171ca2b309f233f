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

import warnings

from pyspark.sql import DataFrame

# Catalyst propagates sizeInBytes MULTIPLICATIVELY through joins and
# falls back to huge defaults for plans without leaf stats (mapInArrow,
# some aggregates) — estimates beyond this are treated as "no estimate"
# rather than sized against, or write_sized would silently emit
# max_files tiny files: the exact mess it exists to prevent.
_IMPLAUSIBLE_BYTES = 1 << 50  # 1 PiB from a single write is not a real plan stat


def _schema_row_bytes(schema) -> int:
    """Rough uncompressed bytes/row from the schema (Catalyst
    defaultSize-style widths) — only used for the implausible-stats
    fallback, where order-of-magnitude is enough to pick a file count."""
    widths = {
        "byte": 1, "boolean": 1, "short": 2, "int": 4, "float": 4,
        "date": 4, "long": 8, "double": 8, "timestamp": 8, "timestamp_ntz": 8,
    }
    total = 0
    for f in schema.fields:
        s = f.dataType.simpleString()
        if s in widths:
            total += widths[s]
        elif s.startswith("decimal"):
            total += 16
        elif s.startswith(("array", "map", "struct", "binary")) or s == "string":
            total += 64  # payload columns: assume modest variable width
        else:
            total += 16
    return max(total, 8)


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
    if est >= _IMPLAUSIBLE_BYTES:
        # Catalyst has no real stats for this plan (join-multiplied or
        # defaulted). Pay one count job and size from schema widths
        # with a conservative 3x parquet compression guess instead of
        # trusting a number that would explode the file count.
        rows = df.count()
        est = int(rows * _schema_row_bytes(df.schema) / 3)
        warnings.warn(
            "write_sized: Catalyst sizeInBytes was implausible "
            f"(>= {_IMPLAUSIBLE_BYTES}); fell back to a row-count estimate "
            f"({rows} rows -> ~{est} bytes). Pass compression_ratio or "
            "materialize the input for accurate sizing.",
            RuntimeWarning,
            stacklevel=2,
        )
    n = max(1, min(int(est / compression_ratio / (target_mb << 20)) + 1, max_files))
    if partition_by:
        out = df.repartition(n, *partition_by)
        out.write.partitionBy(*partition_by).mode(mode).parquet(path)
    else:
        out = df.repartition(n)
        out.write.mode(mode).parquet(path)
    return n
