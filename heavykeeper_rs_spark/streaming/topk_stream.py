"""Structured Streaming front-end for the sketch family.

The reference library is stream-agnostic — callers push items
(SURVEY §2.4: no time model). In Spark the natural fit is
``foreachBatch``: every micro-batch is folded into partition sketches
with the same mapInArrow kernel as the batch path, then merged into a
driver-held accumulator. The accumulator is the exact state a
``flatMapGroupsWithState`` operator would hold, but foreachBatch keeps
it mergeable with batch-built sketches and checkpointable with
plans/checkpoint.py.

Also provided: windowed_exact_topk — the pure-DataFrame watermark +
tumbling-window top-K-per-window stream (late data handled by the
watermark), for when exact per-window results are wanted and keys fit.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..kernel import HeavyKeeper, HKParams
from ..operators.topk import topk_sketch


class StreamingTopK:
    """Continuously folds a streaming DataFrame's key column into a
    HeavyKeeper sketch. Thread-safe snapshot access via .topk()."""

    def __init__(self, params: HKParams, merge_groups: int = 4) -> None:
        self.params = params
        self.merge_groups = merge_groups
        self._lock = threading.Lock()
        self._acc = HeavyKeeper(params)
        self.batches_seen = 0

    def _fold_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        sk = topk_sketch(
            batch_df,
            self._col,
            k=self.params.k,
            width=self.params.width,
            depth=self.params.depth,
            decay=self.params.decay,
            seed=self.params.seed,
            merge_groups=self.merge_groups,
        )
        with self._lock:
            self._acc.merge(sk)
            self.batches_seen += 1

    def start(
        self,
        stream_df: DataFrame,
        col: str,
        checkpoint_dir: str,
        trigger_once: bool = False,
    ) -> StreamingQuery:
        self._col = col
        writer = stream_df.writeStream.foreachBatch(self._fold_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def topk(self) -> list[tuple[bytes, int]]:
        with self._lock:
            return self._acc.list()

    def sketch(self) -> HeavyKeeper:
        with self._lock:
            return HeavyKeeper.deserialize(self._acc.serialize())


def windowed_exact_topk(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    k: int = 10,
) -> DataFrame:
    """Exact per-window top-K candidates as an update-mode aggregate.

    Watermark bounds state for late data; the final per-window rank
    cut happens at read time (rank-over-window is not stream-updatable,
    so we emit counts and let the consumer cut K, or run in
    complete/update mode for small key spaces)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("cnt"),
        )
    )
