"""Sampling operators for training-data curation.

All pure Catalyst — no Python in the path:

- ``uniform_exact_n``: exactly-n uniform sample as a
  TakeOrderedAndProject over a seeded rand key — per-partition top-n
  then a driver merge of n rows, no full shuffle, no second pass.
  (Spark's ``df.sample(fraction)`` is Bernoulli: approximate size, no
  exact-n contract.)
- ``stratified_exact_n``: exactly n per stratum via a row_number
  window over the seeded key — one hash shuffle on the stratum column;
  strata are processed independently so a skewed stratum costs only
  its own partition sort.
- ``split``: deterministic train/val/test assignment by hashing a
  stable id column — reproducible across runs and cluster layouts, and
  NEVER leaks a row into two splits (the failure mode of rand()-based
  splitting when a stage is recomputed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def uniform_exact_n(df: DataFrame, n: int, seed: int = 12345) -> DataFrame:
    """Exactly ``n`` rows, uniformly without replacement (all rows
    equally likely; deterministic for a fixed seed and input)."""
    return (
        df.withColumn("__r", F.rand(seed))
        .orderBy("__r")
        .limit(int(n))
        .drop("__r")
    )


def stratified_exact_n(
    df: DataFrame, strata_col: str, n_per_stratum: int, seed: int = 12345
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer when a stratum
    is smaller), uniform within each stratum."""
    w = Window.partitionBy(strata_col).orderBy(F.rand(seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(n_per_stratum))
        .drop("__rn")
    )


def split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 12345,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, id-stable split assignment: the split of a row
    depends only on (id, seed), so reruns, retries, and different
    partitionings assign identically — a row can never appear in two
    splits. ``weights`` maps split name -> fraction (must sum to ~1)."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    # uniform in [0, 1) from a seeded 64-bit hash of the id
    u = (
        F.shiftrightunsigned(F.xxhash64(F.col(id_col), F.lit(seed)), 11)
        / F.lit(float(1 << 53))
    )
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, frac in items[:-1]:
        acc += frac
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)
