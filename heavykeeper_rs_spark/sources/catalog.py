"""Catalog-aware table loading: Iceberg when configured, parquet otherwise.

The north-star deployment reads Common-Crawl-style webtext from Iceberg
tables. Everything downstream of the scan is format-agnostic DataFrame
code, so the ONLY Iceberg-specific line in the whole engine is
``spark.read.table(...)`` here — partition pruning, column pruning and
predicate pushdown flow through Spark's DataSource V2 for Iceberg
exactly as they do for the parquet scans the tests exercise
(tests/test_partition_pruning.py).

This container ships no Iceberg runtime jar, so ``iceberg_available``
is False here and the loaders fall back to the driver-provided parquet
layout; on a real cluster, setting the standard catalog conf

    spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.<name>.type = glue | hive | hadoop | rest

makes ``load_table(spark, "web.documents")`` hit Iceberg with zero
changes to any operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import TABLES
from .tables import load as load_parquet


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is on the classpath AND at
    least one spark.sql.catalog.* is configured to use it."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    pairs = dict(spark.sparkContext.getConf().getAll())
    try:
        # session-level settings (spark.conf.set / SQL SET) live in the
        # RuntimeConfig, not the static SparkConf
        it = spark._jsparkSession.conf().getAll().iterator()
        while it.hasNext():
            kv = it.next()
            pairs[kv._1()] = kv._2()
    except Exception:
        pass  # static conf alone (non-JVM test doubles)
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
        for k, v in pairs.items()
    )


def snapshot_lineage(
    spark: SparkSession, name: str, sf_dir: str | None = None
) -> str:
    """Input-lineage token for checkpoint identity
    (``plans.checkpoint``): the Iceberg SNAPSHOT ID when a catalog is
    live, so a resume after the table advanced to a new snapshot is
    refused by construction (the token mismatches) instead of silently
    merging partials built from two different table states.

    Parquet fallback: path + file count + total bytes — any rewrite of
    the directory changes the token.
    """
    if iceberg_available(spark):
        rows = spark.sql(
            f"SELECT snapshot_id FROM {name}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        snap = rows[0][0] if rows else "empty"
        return f"iceberg:{name}@{snap}"
    import os

    base = name.rsplit(".", 1)[-1]
    if sf_dir is None:
        raise ValueError("sf_dir required in parquet-fallback mode")
    path = f"{sf_dir}/{base}.parquet"
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path) if not f.startswith((".", "_"))
        )
        total = sum(os.path.getsize(os.path.join(path, f)) for f in files)
        return f"parquet:{path}:n={len(files)}:bytes={total}"
    total = os.path.getsize(path) if os.path.exists(path) else 0
    return f"parquet:{path}:n=1:bytes={total}"


def load_table(
    spark: SparkSession, name: str, sf_dir: str | None = None
) -> DataFrame:
    """Read a table by catalog identifier (``cat.db.table``) when an
    Iceberg catalog is live, else from the parquet test layout.

    ``name`` may be a bare table name (resolved against ``sf_dir`` in
    parquet mode) or a fully-qualified identifier (used verbatim in
    catalog mode; the last component picks the parquet file in
    fallback mode)."""
    if iceberg_available(spark):
        return spark.read.table(name)
    base = name.rsplit(".", 1)[-1]
    if base not in TABLES:
        raise ValueError(f"unknown table {name!r}; parquet fallback knows {TABLES}")
    if sf_dir is None:
        raise ValueError("sf_dir required in parquet-fallback mode")
    return load_parquet(spark, sf_dir, base)
