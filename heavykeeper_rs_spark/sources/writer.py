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
    defaultSize-style widths) — the FLOOR for the implausible-stats
    fallback; variable-width columns are measured from sampled rows
    (``_sampled_row_bytes``), since a flat 64-byte guess undershoots
    multi-KB html/text payloads ~50x and would re-create the giant
    files this helper exists to prevent."""
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
            total += 64  # payload columns: floor; sampling refines this
        else:
            total += 16
    return max(total, 8)


def _cell_bytes(v) -> int:
    if v is None:
        return 1
    if isinstance(v, str):
        return len(v.encode("utf-8", "replace"))
    if isinstance(v, (bytes, bytearray)):
        return len(v)
    if isinstance(v, (list, tuple)):
        return sum(_cell_bytes(x) for x in v)
    if isinstance(v, dict):
        return sum(_cell_bytes(x) + _cell_bytes(y) for x, y in v.items())
    return 8


def _sampled_row_bytes(df: DataFrame, n: int = 128) -> int:
    """Average uncompressed bytes/row measured from the first ``n``
    rows — keeps the fallback order-of-magnitude honest for wide
    html/text payloads. Head rows may be unrepresentative; combined
    with the schema floor via max()."""
    rows = df.limit(n).collect()
    if not rows:
        return 0
    return max(
        sum(sum(_cell_bytes(v) for v in row) for row in rows) // len(rows), 1
    )


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
        # defaulted). Pay one count job plus a head sample: bytes/row
        # = max(schema floor, measured sample average), then a 3x
        # parquet compression guess — trusting the bogus number would
        # explode the file count, and a schema-only width undershoots
        # wide text/html payloads by ~50x (giant files instead).
        rows = df.count()
        per_row = max(_schema_row_bytes(df.schema), _sampled_row_bytes(df))
        est = int(rows * per_row / 3)
        warnings.warn(
            "write_sized: Catalyst sizeInBytes was implausible "
            f"(>= {_IMPLAUSIBLE_BYTES}); fell back to a row-count estimate "
            f"({rows} rows x ~{per_row} B -> ~{est} bytes). Pass "
            "compression_ratio or materialize the input for accurate sizing.",
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
