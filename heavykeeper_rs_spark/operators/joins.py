"""Sketch-accelerated join pruning.

``bloom_prefilter``: the classic map-side Bloom semi-join. Build a
Bloom filter over the small side's join key (distributed, mergeable —
``operators.agg.bloom_build``), broadcast the bits once, and drop
fact-side rows whose key cannot be in the set BEFORE any
shuffle/join. Guarantees:

- NO false negatives: the output is a superset of the exact semi-join
  (a Bloom filter never reports an inserted key absent), so a real
  join placed after the prefilter is still exact;
- false positives are bounded by the filter's fp rate (sized via
  ``Bloom.for_capacity``), so the shuffled fact volume shrinks to
  ~selectivity + fpp of the input.

At 100 TB this is the difference between shuffling the full fact table
into a join and shuffling only the ~matching slice: the Bloom bits are
a few MB broadcast once, and the probe is one vectorized hash pass per
Arrow batch over dictionary-encoded keys (distinct values probed once
per batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketches.bloom import Bloom
from .agg import sketch_agg


def bloom_prefilter(
    big: DataFrame,
    big_col: str,
    small: DataFrame,
    small_col: str,
    fpp: float = 0.01,
    capacity: int | None = None,
    seed: int = 12345,
) -> DataFrame:
    """Rows of ``big`` whose ``big_col`` MAY appear in
    ``small[small_col]`` — superset of the exact semi-join, thinned to
    ~(selectivity + fpp). ``capacity`` sizes the filter (defaults to a
    cheap distinct-count of the small side — pass it explicitly at
    scale to skip that job)."""
    if capacity is None:
        capacity = small.select(small_col).distinct().count()
    proto = Bloom.for_capacity(max(int(capacity), 1), fpp=fpp, seed=seed)
    bloom = sketch_agg(
        small,
        small_col,
        lambda: Bloom(proto.m, proto.k, seed),
        Bloom.deserialize,
    )
    blob = bloom.serialize()
    bc = big.sparkSession.sparkContext.broadcast(blob)
    out_schema = big.schema

    def probe(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        bl = Bloom.deserialize(bc.value)
        key_idx = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if key_idx is None:
                key_idx = batch.schema.get_field_index("__bloom_key")
            col = batch.column(key_idx)
            d = pc.dictionary_encode(col)
            idx = d.indices.to_numpy(zero_copy_only=False)
            uniq = d.dictionary.to_numpy(zero_copy_only=False)
            hit_u = bl.contains(uniq) if len(uniq) else np.zeros(0, dtype=bool)
            keep = np.zeros(len(col), dtype=bool)
            valid = pd.notna(idx)
            if valid.any():
                keep[valid] = hit_u[idx[valid].astype(np.int64)]
            out = batch.drop_columns(["__bloom_key"]).filter(pa.array(keep))
            if out.num_rows:
                yield out

    withkey = big.withColumn("__bloom_key", F.col(big_col).cast("string"))
    return withkey.mapInArrow(probe, out_schema)
