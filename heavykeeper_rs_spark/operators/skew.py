"""Explicit skew-mitigation operators.

The sketch path absorbs value skew by construction (hot keys live in
fixed-size cells; the combine stage is salted). These helpers cover the
EXACT aggregation paths where a Zipf head key would otherwise pin a
single reducer — the north rule's "partitioning / shuffle / skew
handled explicitly" requirement for the non-sketch side:

- salted_count: two-phase count — shuffle on (key, salt) so a hot
  key's rows spread over ``salts`` reducers, then a second tiny
  shuffle on key re-combines the partials. Identical result to
  groupBy(key).count(); bounded per-reducer fan-in by construction
  (works even where AQE skew-join splitting does not apply, e.g.
  single-stage aggregations on a hot key).
- salted_topn: exact top-N most frequent keys using salted_count +
  TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key_col: str, salts: int = 32, weight_col: str | None = None
) -> DataFrame:
    """Exact per-key counts with a bounded-fan-in two-phase shuffle."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    salted = df.select(
        F.col(key_col).alias("key"),
        (F.rand(seed=0) * salts).cast("int").alias("__salt"),
        w.alias("__w"),
    )
    partial = salted.groupBy("key", "__salt").agg(F.sum("__w").alias("__c"))
    return partial.groupBy("key").agg(F.sum("__c").alias("count"))


def salted_topn(
    df: DataFrame, key_col: str, n: int, salts: int = 32, weight_col: str | None = None
) -> DataFrame:
    """Exact top-N by frequency, skew-safe."""
    return (
        salted_count(df, key_col, salts, weight_col)
        .orderBy(F.desc("count"), "key")
        .limit(n)
        .select(F.col("key").alias("item"), "count")
    )
