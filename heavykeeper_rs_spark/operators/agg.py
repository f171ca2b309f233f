"""Generic distributed sketch aggregation.

One runner for the whole sketch family: partial build per partition
(``mapInArrow``), salted combine (``groupBy(salt).applyInPandas``),
final merge on the driver. Identical plan shape to operators/topk.py —
only the sketch kernel differs. The shuffle carries only serialized
sketch blobs (KiB-scale), never rows, so the plan's network cost is
O(partitions), independent of input size: the property that makes this
viable at 10^12 rows.

Also exposes DataFrame-level conveniences:
- hll_distinct(df, col)          -> float estimate
- cms_build(df, col, ...)        -> CountMin
- bloom_build(df, col, ...)      -> Bloom
- kll_build(df, col, ...)        -> KLL   (numeric column)
- tdigest_build(df, col, ...)    -> TDigest (numeric column)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..sketches.bloom import Bloom
from ..sketches.cms import CountMin
from ..sketches.hll import HLL
from ..sketches.kll import KLL
from ..sketches.tdigest import TDigest

_BLOB_SCHEMA = StructType(
    [StructField("salt", IntegerType(), False), StructField("sketch", BinaryType(), False)]
)


def _sketch_seed(sk) -> int:
    """Resolve a sketch's seed for per-partition RNG derivation.

    Sketches keep their seed either as an attribute (HLL, CMS, Bloom,
    KLL) or on ``params`` (HeavyKeeper family); some have none
    (TDigest). A duck-typed ``getattr(sk, 'seed', 0)`` would silently
    collapse the params-carried families to seed 0 and destroy the
    intended per-family seed separation."""
    s = getattr(sk, "seed", None)
    if s is None:
        s = getattr(getattr(sk, "params", None), "seed", None)
    return int(s) if s is not None else 0


def sketch_agg(
    df: DataFrame,
    col: str,
    make: Callable[[], object],
    deserialize: Callable[[bytes], object],
    numeric: bool = False,
    weight_col: str | None = None,
    merge_groups: int = 64,
):
    """Fold df[col] into a mergeable sketch; returns the merged sketch."""
    cast = DoubleType() if numeric else StringType()
    cols = [F.col(col).cast(cast).alias("__v")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast(DoubleType()).alias("__w"))
    keyed = df.select(*cols)
    weighted = weight_col is not None

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        sk = make()
        if hasattr(sk, "rng"):
            sk.rng = np.random.default_rng(
                np.random.PCG64((_sketch_seed(sk) << 7) + pid)
            )
        saw = False
        for batch in batches:
            if batch.num_rows == 0:
                continue
            saw = True
            v = batch.column(0).to_numpy(zero_copy_only=False)
            if weighted:
                w = batch.column(1).to_numpy(zero_copy_only=False)
                valid = pd.notna(v) & pd.notna(w)
                sk.add_batch(v[valid], np.asarray(w[valid], dtype=np.float64))
            else:
                valid = pd.notna(v)
                sk.add_batch(v[valid])
        if saw:
            yield pa.RecordBatch.from_pydict(
                {
                    "salt": pa.array([pid % merge_groups], type=pa.int32()),
                    "sketch": pa.array([sk.serialize()], type=pa.binary()),
                }
            )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        blobs = list(pdf["sketch"])
        acc = deserialize(blobs[0])
        for b in blobs[1:]:
            acc.merge(deserialize(b))
        return pd.DataFrame({"salt": [int(pdf["salt"].iloc[0])], "sketch": [acc.serialize()]})

    # multi-level bounded-fan-in merge tree (see operators/topk.py
    # _tree_merge): salt starts as partition id, divides by fan_in per
    # level until <= fan_in blobs reach the driver
    from .topk import estimate_partitions

    n_parts = estimate_partitions(keyed)
    fan_in = max(int(merge_groups), 2)  # caller's fan-in, BEFORE rebinding
    merge_groups = n_parts  # build closure salts by pid
    combined = keyed.mapInArrow(build, _BLOB_SCHEMA)
    groups = n_parts
    while groups > fan_in:
        combined = (
            combined.withColumn("salt", (F.col("salt") / fan_in).cast("int"))
            .groupBy("salt")
            .applyInPandas(merge_group, _BLOB_SCHEMA)
        )
        groups = -(-groups // fan_in)
    blobs = [r["sketch"] for r in combined.select("sketch").collect()]
    if not blobs:
        return make()
    acc = deserialize(blobs[0])
    for b in blobs[1:]:
        acc.merge(deserialize(b))
    return acc


# ---------------------------------------------------------------- wrappers

def hll_build(df: DataFrame, col: str, p: int = 14, seed: int = 12345, **kw) -> HLL:
    return sketch_agg(df, col, lambda: HLL(p, seed), HLL.deserialize, **kw)


def hll_distinct(df: DataFrame, col: str, p: int = 14, seed: int = 12345, **kw) -> float:
    return hll_build(df, col, p, seed, **kw).estimate()


def cms_build(
    df: DataFrame, col: str, width: int = 2048, depth: int = 5, seed: int = 12345, **kw
) -> CountMin:
    return sketch_agg(df, col, lambda: CountMin(width, depth, seed), CountMin.deserialize, **kw)


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 7, seed: int = 12345, **kw
) -> Bloom:
    return sketch_agg(df, col, lambda: Bloom(m_bits, k, seed), Bloom.deserialize, **kw)


def kll_build(df: DataFrame, col: str, k: int = 200, seed: int = 12345, **kw) -> KLL:
    return sketch_agg(
        df, col, lambda: KLL(k, seed), KLL.deserialize, numeric=True, **kw
    )


def tdigest_build(df: DataFrame, col: str, delta: float = 200.0, **kw) -> TDigest:
    return sketch_agg(
        df, col, lambda: TDigest(delta), TDigest.deserialize, numeric=True, **kw
    )


# ------------------------------------------------------- grouped variants

def sketch_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    make: Callable[[], object],
    finalize: Callable[[object], float],
    numeric: bool = False,
    out_col: str = "value",
    deserialize: Callable[[bytes], object] | None = None,
    fan_in: int = 64,
    max_live_groups: int = 4096,
) -> DataFrame:
    """One sketch per group: (group, finalize(sketch)) — scale-safe.

    Partial sketches are built per (partition, group) inside
    ``mapInArrow``; the shuffle then carries only serialized blobs
    through a bounded-fan-in per-group merge tree
    (``operators.topk.grouped_blob_tree``). No row crosses the network,
    so a Zipf-hot group costs each mapper bounded sketch memory rather
    than landing its full row set on one reducer.

    ``deserialize`` defaults to ``type(make()).deserialize``.
    """
    from .topk import grouped_blob_tree

    out_schema = StructType(
        [
            StructField("group", StringType(), False),
            StructField(out_col, DoubleType(), False),
        ]
    )
    cast = DoubleType() if numeric else StringType()
    if deserialize is None:
        deserialize = type(make()).deserialize

    from .topk import grouped_partial_builder

    def new_sketch(pid: int):
        sk = make()
        if hasattr(sk, "rng"):
            sk.rng = np.random.default_rng(
                np.random.PCG64((_sketch_seed(sk) << 7) + pid)
            )
        return sk

    def feed(sk, vals) -> None:
        if numeric:
            sk.add_batch(np.asarray(vals, dtype=np.float64))
        else:
            sk.add_batch(np.asarray(vals, dtype=object))

    build = grouped_partial_builder(new_sketch, feed, max_live_groups)

    def merge_fn(blobs: list[bytes]) -> bytes:
        acc = deserialize(blobs[0])
        for b in blobs[1:]:
            acc.merge(deserialize(b))
        return acc.serialize()

    def final(group: str, blobs: list[bytes]) -> pd.DataFrame:
        acc = deserialize(blobs[0])
        for b in blobs[1:]:
            acc.merge(deserialize(b))
        return pd.DataFrame({"group": [group], out_col: [float(finalize(acc))]})

    keyed = df.select(
        F.coalesce(F.col(group_col).cast(StringType()), F.lit("None")).alias("__g"),
        F.col(value_col).cast(cast).alias("__v"),
    )
    return grouped_blob_tree(keyed, build, merge_fn, final, out_schema, fan_in=fan_in)


def hll_distinct_by_group(
    df: DataFrame, group_col: str, value_col: str, p: int = 14, seed: int = 12345
) -> DataFrame:
    """(group, n_distinct_est) — HLL per group."""
    return sketch_by_group(
        df,
        group_col,
        value_col,
        lambda: HLL(p, seed),
        lambda sk: sk.estimate(),
        out_col="n_distinct_est",
    )


def tdigest_quantile_by_group(
    df: DataFrame, group_col: str, value_col: str, q: float, delta: float = 200.0
) -> DataFrame:
    """(group, qXX) — t-digest quantile per group."""
    return sketch_by_group(
        df,
        group_col,
        value_col,
        lambda: TDigest(delta),
        lambda sk: float(sk.quantile(q)[0]),
        numeric=True,
        out_col="quantile_est",
    )

def sketch_blobs_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    make: Callable[[], object],
    numeric: bool = False,
    deserialize: Callable[[bytes], object] | None = None,
    fan_in: int = 64,
    max_live_groups: int = 4096,
) -> DataFrame:
    """One MERGED sketch blob per group: (group string, sketch binary).

    Same scale-safe plan as ``sketch_by_group`` (per-(partition,group)
    partials, blob-only shuffle through a bounded-fan-in merge tree)
    but the finalize step returns the serialized sketch itself instead
    of a scalar — for callers that probe the per-group sketches with
    group-specific keys afterwards (grouped CMS point queries, grouped
    Bloom membership), or persist them as a sketch table for reuse.
    """
    from .topk import grouped_blob_tree, grouped_partial_builder

    out_schema = StructType(
        [
            StructField("group", StringType(), False),
            StructField("sketch", BinaryType(), False),
        ]
    )
    cast = DoubleType() if numeric else StringType()
    if deserialize is None:
        deserialize = type(make()).deserialize

    def new_sketch(pid: int):
        sk = make()
        if hasattr(sk, "rng"):
            sk.rng = np.random.default_rng(
                np.random.PCG64((_sketch_seed(sk) << 7) + pid)
            )
        return sk

    def feed(sk, vals) -> None:
        if numeric:
            sk.add_batch(np.asarray(vals, dtype=np.float64))
        else:
            sk.add_batch(np.asarray(vals, dtype=object))

    build = grouped_partial_builder(new_sketch, feed, max_live_groups)

    def merge_fn(blobs: list[bytes]) -> bytes:
        acc = deserialize(blobs[0])
        for b in blobs[1:]:
            acc.merge(deserialize(b))
        return acc.serialize()

    def final(group: str, blobs: list[bytes]) -> pd.DataFrame:
        return pd.DataFrame({"group": [group], "sketch": [merge_fn(blobs)]})

    keyed = df.select(
        F.coalesce(F.col(group_col).cast(StringType()), F.lit("None")).alias("__g"),
        F.col(value_col).cast(cast).alias("__v"),
    )
    return grouped_blob_tree(keyed, build, merge_fn, final, out_schema, fan_in=fan_in)


def cms_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    width: int = 2048,
    depth: int = 5,
    seed: int = 12345,
) -> DataFrame:
    """(group, serialized CountMin over value_col) — probe with
    ``CountMin.deserialize(blob).estimate(keys)``."""
    return sketch_blobs_by_group(
        df, group_col, value_col, lambda: CountMin(width, depth, seed)
    )


def bloom_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
    seed: int = 12345,
) -> DataFrame:
    """(group, serialized Bloom over value_col) — probe with
    ``Bloom.deserialize(blob).contains(keys)``."""
    return sketch_blobs_by_group(
        df, group_col, value_col, lambda: Bloom(m_bits, k, seed)
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 4,
    delta: float = 500.0,
    out_col: str = "bucket",
) -> tuple[DataFrame, list[float]]:
    """Assign each row an (approximately) equal-mass quantile bucket of
    ``value_col`` — the length-bucketing step batching/curriculum
    pipelines run over document lengths.

    One distributed t-digest pass computes the n_buckets-1 interior
    quantile boundaries (mergeable blobs, no row shuffle); assignment
    is then a pure-JVM CASE over the broadcast boundaries. Returns
    (df + bucket int column, boundaries). Buckets are 0-based;
    boundary ties go to the lower bucket (value <= boundary). Rows
    with NULL ``value_col`` get a NULL bucket (they are unmeasurable,
    not "largest" — the naive CASE would fall through every
    ``v <= bound`` NULL comparison into the top bucket)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    td = tdigest_build(df, value_col, delta=delta)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = [float(td.quantile(q)[0]) for q in qs]
    v = F.col(value_col).cast(DoubleType())
    expr = None
    for i, bnd in enumerate(bounds):
        cond = v <= F.lit(bnd)
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    expr = (
        F.lit(len(bounds)) if expr is None else expr.otherwise(len(bounds))
    ).cast("int")
    expr = F.when(v.isNotNull(), expr)
    return df.withColumn(out_col, expr), bounds

