"""Event-sequence operators Spark lacks as built-ins: gap-based
sessionization and as-of (most-recent-at-or-before) joins.

Both are single-shuffle window compositions — no range-join explosion,
no Python:

- ``sessionize``: one hash shuffle on the entity key; session ids are
  a lag-gap flag cumulative-summed within each partition-sorted
  window. Per-entity data is bounded (a user's events), so the window
  sort never spills beyond one entity's rows.
- ``asof_join``: the classic union trick — right rows interleave into
  the left timeline and a ``last(ignorenulls)`` running window carries
  the most recent right payload forward. One shuffle on the key,
  O(n log n) per-key sort, versus the O(n·m) blowup of the naive
  range-join formulation. DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    out_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per entity.

    A new session starts when the time since the entity's previous
    event exceeds ``gap_minutes`` (or at the entity's first event).
    ``out_col`` is 1-based and contiguous per entity. Exactly the ANSI
    window-function formulation, so DuckDB can oracle it.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    new_sess = (
        prev.isNull()
        | ((ts.cast("double") - prev.cast("double")) > gap_minutes * 60.0)
    ).cast("long")
    return df.withColumn(
        out_col,
        F.sum(new_sess).over(
            Window.partitionBy(entity_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """(entity, n_sessions, n_events, avg_session_events) rollup."""
    s = sessionize(df, entity_col, ts_col, gap_minutes)
    return (
        s.groupBy(entity_col)
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "avg_session_events",
            F.round(F.col("n_events") / F.col("n_sessions"), 4),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same key (left as-of join).

    Right payload columns come back with their own names; rows with no
    prior right match keep NULLs. Ties on equal timestamps match (<=),
    NULL right timestamps never match, and multiple right rows at the
    same (key, ts) resolve to the one row with the greatest payload
    tuple (lexicographic struct max) — pre-aggregate the right side if
    a different rule is needed.
    """
    lcols = left.columns
    tag = "__asof_tag"
    ts = "__asof_ts"
    L = left.withColumn(tag, F.lit(1)).withColumn(
        ts, F.col(left_ts).cast("timestamp")
    )
    # deterministic tie resolution inside equal (key, ts): keep the
    # row with the greatest payload TUPLE (a struct max — per-column
    # independent maxes would stitch a synthetic row); rows with a
    # NULL right_ts can never satisfy right_ts <= left_ts and are
    # dropped (matching SQL ASOF semantics)
    payload = F.max(F.struct(*[F.col(c) for c in right_value_cols])).alias("__p")
    R = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            *key_cols,
            F.col(right_ts).cast("timestamp").alias(ts),
            *[F.col(c) for c in right_value_cols],
        )
        .groupBy(*key_cols, ts)
        .agg(payload)
        .select(
            *key_cols,
            ts,
            *[F.col(f"__p.{c}").alias(c) for c in right_value_cols],
        )
        .withColumn(tag, F.lit(0))
    )
    merged = L.unionByName(R, allowMissingColumns=True)
    # right rows (tag 0) sort before left rows at the same instant, so
    # an equal-timestamp right row is visible to the left row (<=)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts, tag)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE last() over a struct of (match ts + all payload columns):
    # per-column independent last(ignorenulls) would stitch values from
    # DIFFERENT right rows whenever the most recent right row holds a
    # NULL in one payload column — the carried match must be one right
    # row atomically (ASOF semantics; the DuckDB oracle returns the
    # matched row's NULLs as-is)
    carried = (
        F.last(
            F.when(
                F.col(tag) == 0,
                F.struct(
                    F.col(ts).alias("__asof_matched_ts"),
                    *[F.col(c) for c in right_value_cols],
                ),
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("__c")
    )
    out = merged.select(*lcols, F.col(tag), carried).filter(F.col(tag) == 1)
    return out.select(
        *lcols,
        F.col("__c.__asof_matched_ts").alias("__asof_matched_ts"),
        *[F.col(f"__c.{c}").alias(c) for c in right_value_cols],
    )
