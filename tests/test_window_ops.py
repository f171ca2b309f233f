"""Sessionization and as-of join semantics."""

from datetime import datetime

import pytest
from pyspark.sql import Row


def ts(m, s=0):
    return datetime(2024, 1, 1, 12, m, s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions (gap 40 min > 30)
        Row(user_id=1, ts=ts(0), event_type="view", value=1.0),
        Row(user_id=1, ts=ts(10), event_type="purchase", value=5.0),
        Row(user_id=1, ts=ts(50), event_type="click", value=2.0),
        # user 2: one session, no purchase
        Row(user_id=2, ts=ts(5), event_type="view", value=1.0),
        Row(user_id=2, ts=ts(20), event_type="click", value=1.0),
    ]
    return spark.createDataFrame(rows)


def test_sessionize_gap_rule(spark, events):
    from heavykeeper_rs_spark.operators.window_ops import sessionize

    out = {
        (r["user_id"], r["ts"].minute): r["session_id"]
        for r in sessionize(events, "user_id", "ts", gap_minutes=30).collect()
    }
    assert out[(1, 0)] == 1 and out[(1, 10)] == 1 and out[(1, 50)] == 2
    assert out[(2, 5)] == 1 and out[(2, 20)] == 1


def test_sessionize_exact_gap_is_same_session(spark):
    from heavykeeper_rs_spark.operators.window_ops import sessionize

    rows = [Row(user_id=1, ts=ts(0)), Row(user_id=1, ts=ts(30))]  # == gap
    out = sessionize(spark.createDataFrame(rows), "user_id", "ts", 30).collect()
    assert {r["session_id"] for r in out} == {1}  # strictly-greater rule


def test_asof_join_matches_most_recent_and_ties(spark, events):
    from heavykeeper_rs_spark.operators.window_ops import asof_join

    purchases = events.filter("event_type = 'purchase'").select(
        "user_id", events.ts.alias("p_ts"), events.value.alias("p_value")
    )
    out = asof_join(
        events.select("user_id", "ts", "event_type"),
        purchases,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_value_cols=["p_value"],
    ).collect()
    got = {(r["user_id"], r["ts"].minute): r["p_value"] for r in out}
    assert got[(1, 0)] is None          # before any purchase
    assert got[(1, 10)] == 5.0          # equal timestamp matches (<=)
    assert got[(1, 50)] == 5.0          # carried forward
    assert got[(2, 5)] is None and got[(2, 20)] is None  # no purchases
    assert len(out) == 5                # every left row survives


def test_asof_join_null_left_ts(spark):
    from pyspark.sql import functions as F

    from heavykeeper_rs_spark.operators.window_ops import asof_join

    left = spark.createDataFrame(
        [(1, None, "x"), (1, ts(30), "y")], "user_id bigint, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, ts(10), 7.0)], "user_id bigint, p_ts timestamp, v double"
    )
    out = {r["tag"]: r["v"] for r in asof_join(
        left, right, ["user_id"], "ts", "p_ts", ["v"]).collect()}
    assert out["y"] == 7.0
    assert out["x"] is None  # null timestamp matches nothing


def test_asof_carry_is_one_row_atomic(spark):
    """A NULL in one payload column of the most recent right row must
    come through as NULL — not be back-filled from an older right row
    (per-column independent last() would stitch two rows; ADVICE r2)."""
    from pyspark.sql import functions as F

    from heavykeeper_rs_spark.operators.window_ops import asof_join

    left = spark.createDataFrame(
        [Row(k="a", lts="2024-01-01 00:10:00")]
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            Row(k="a", rts="2024-01-01 00:01:00", x=1, y=10),
            Row(k="a", rts="2024-01-01 00:05:00", x=2, y=None),
        ]
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    got = asof_join(left, right, ["k"], "lts", "rts", ["x", "y"]).collect()
    assert len(got) == 1
    assert got[0]["x"] == 2
    assert got[0]["y"] is None  # NOT 10 from the older row
