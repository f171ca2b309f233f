"""Fault-tolerant stateful streaming sketches via applyInPandasWithState.

streaming/topk_stream.py holds the accumulator on the driver
(foreachBatch) — simple, but driver-lifetime state. This module keeps
the sketch in Spark's *state store* instead: keys are salted into
``n_shards`` groups, each shard owns a serialized HeavyKeeper in
GroupState, and every trigger folds the shard's new rows into it. The
state survives query restarts from the checkpoint — the streaming
analog of plans/checkpoint.py.

Output per trigger: one row per shard with the shard's current
serialized sketch (downstream consumers merge the <= n_shards blobs —
same merge the batch path uses). Event-time timeout is left to the
caller (sketches are monotone summaries; eviction happens inside the
sketch, not by dropping state).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..kernel import HeavyKeeper, HKParams

_OUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("rows_seen", LongType(), False),
        StructField("sketch", BinaryType(), False),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("rows_seen", LongType(), True),
        StructField("sketch", BinaryType(), True),
    ]
)


def stateful_topk_stream(
    stream_df: DataFrame,
    col: str,
    params: HKParams,
    n_shards: int = 8,
) -> DataFrame:
    """Transform a streaming DataFrame into per-shard sketch updates.

    Write with update output mode; merge the latest blob per shard to
    read the global top-K at any point.
    """

    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        if state.exists:
            rows_seen, blob = state.get
            sk = HeavyKeeper.deserialize(blob)
        else:
            rows_seen = 0
            sk = HeavyKeeper(
                params,
                rng=np.random.default_rng(
                    np.random.PCG64((params.seed << 9) ^ shard)
                ),
            )
        for pdf in pdfs:
            keys = pdf["__key"].to_numpy()
            valid = pd.notna(keys)
            rows_seen += int(valid.sum())
            sk.add_batch(keys[valid])
        blob = sk.serialize()
        state.update((rows_seen, blob))
        yield pd.DataFrame(
            {"shard": [shard], "rows_seen": [rows_seen], "sketch": [blob]}
        )

    keyed = stream_df.select(
        (F.xxhash64(F.col(col).cast("string")) % n_shards)
        .cast("int")
        .alias("__shard"),
        F.col(col).cast("string").alias("__key"),
    ).withColumn("__shard", F.abs(F.col("__shard")))
    return keyed.groupBy("__shard").applyInPandasWithState(
        fold,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_shard_blobs(rows: list) -> HeavyKeeper:
    """Merge the latest blob per shard into one sketch (driver-side)."""
    latest: dict[int, bytes] = {}
    for r in rows:
        latest[r["shard"]] = r["sketch"]
    blobs = list(latest.values())
    acc = HeavyKeeper.deserialize(blobs[0])
    for b in blobs[1:]:
        acc.merge(HeavyKeeper.deserialize(b))
    return acc
