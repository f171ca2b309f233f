"""Similarity search over an embedding column (array<float>).

Two paths, same results contract:

- brute_force_topk: exact cosine top-k. The dot product is a JVM-side
  ``aggregate(zip_with(...))`` expression — whole-stage codegen, no
  Python — followed by TakeOrderedAndProject. This is the baseline
  and the verifier for the approximate path.
- lsh_topk: random-hyperplane (sign) LSH. Each vector gets a B-bit
  signature from a broadcast hyperplane matrix (one vectorized Arrow
  kernel); the probe only scores vectors whose signature matches the
  query's in at least one band. At 10^12 rows this turns a full scan
  into a bucket-pruned scan; recall is tunable by bands/bits.
- embedding_near_dup_pairs: all pairs with cosine >= tau via the same
  banded signatures (bucket self-join, output-proportional like
  minhash LSH in operators/dedup.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _cosine_col(vec_col: str, qvec: list[float]) -> F.Column:
    """JVM-side cosine similarity against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(
        F.aggregate(F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    norm_q = float(np.sqrt(np.dot(qvec, qvec)))
    return dot / (norm_v * F.lit(norm_q))


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, qvec: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k: one scan, no shuffle of vectors (top-k is a
    TakeOrderedAndProject with per-partition pruning).

    The vector column is cast to array<double> up front: zip_with
    between an array<float> column and double literals trips Spark's
    ArrowColumnVector getFloat limitation (UNSUPPORTED_CALL), so a raw
    float[] embedding column would otherwise crash with a cryptic JVM
    error."""
    vd = df.withColumn("__vd", F.col(vec_col).cast("array<double>"))
    return (
        vd.select(
            F.col(id_col),
            F.round(_cosine_col("__vd", qvec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits)).astype(np.float32)


def signature_df(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_bits: int = 32,
    seed: int = 12345,
) -> DataFrame:
    """(id, sig long): sign-LSH signatures, vectorized per Arrow batch
    (matrix multiply against broadcast hyperplanes)."""
    planes = _hyperplanes(dim, n_bits, seed)
    out_schema = StructType(
        [StructField("id", LongType(), False), StructField("sig", LongType(), False)]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            vecs = np.vstack(batch.column(1).to_numpy(zero_copy_only=False))
            proj = vecs.astype(np.float32) @ planes  # (n, n_bits)
            bits = (proj > 0).astype(np.uint64)
            sig = np.zeros(len(ids), dtype=np.uint64)
            for b in range(n_bits):
                sig |= bits[:, b] << np.uint64(b)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.asarray(ids, dtype=np.int64)),
                    pa.array(sig.astype(np.int64)),
                ],
                names=["id", "sig"],
            )

    from .topk import ensure_parallelism

    keyed = ensure_parallelism(
        df.select(F.col(id_col).cast("long").alias("__id"), F.col(vec_col).alias("__v"))
    )
    return keyed.mapInArrow(kernel, out_schema)


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    qvec: list[float],
    k: int = 10,
    n_bits: int = 32,
    bands: int = 4,
    seed: int = 12345,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors sharing >= 1 LSH
    band with the query. Candidate set is a pushed-down semi-join on
    banded signature equality (hash join on small ints) — the IVF-ish
    scale path."""
    dim = len(qvec)
    assert n_bits % bands == 0
    bits_per_band = n_bits // bands
    mask = (1 << bits_per_band) - 1
    planes = _hyperplanes(dim, n_bits, seed)
    qproj = np.asarray(qvec, dtype=np.float32) @ planes
    qsig = 0
    for b in range(n_bits):
        if qproj[b] > 0:
            qsig |= 1 << b
    qbands = [(qsig >> (bits_per_band * i)) & mask for i in range(bands)]
    sigs = signature_df(df, id_col, vec_col, dim, n_bits, seed)
    band_match = None
    for i, qb in enumerate(qbands):
        cond = (
            F.shiftrightunsigned(F.col("sig"), bits_per_band * i).bitwiseAND(
                F.lit(mask)
            )
            == F.lit(qb)
        )
        band_match = cond if band_match is None else (band_match | cond)
    cand_ids = sigs.filter(band_match).select("id")
    # no forced broadcast: a popular signature region can exceed driver
    # memory at 10^12 rows — AQE broadcasts when the candidate set is
    # under spark.sql.autoBroadcastJoinThreshold and falls back to a
    # shuffle semi-join otherwise
    cands = df.join(cand_ids, df[id_col].cast("long") == cand_ids.id, "leftsemi")
    return brute_force_topk(cands, id_col, vec_col, qvec, k)


def brute_force_pairs(
    df: DataFrame, id_col: str, vec_col: str, tau: float
) -> DataFrame:
    """Exact cosine threshold self-join (id_a < id_b, cosine >= tau).

    O(n^2) — the *verifier* for the LSH path, and the right choice only
    for small re-rank sets; at corpus scale use
    embedding_near_dup_pairs (bucket-pruned)."""
    a = df.select(
        F.col(id_col).cast("long").alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = df.select(
        F.col(id_col).cast("long").alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda s, x: s + x * x))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(dot / (na * nb), 6))
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )


def _kmeans(sample: np.ndarray, n_centroids: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (coarse
    quantizer training). L2-normalized so assignment order matches
    cosine similarity."""
    rng = np.random.default_rng(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    idx = rng.choice(x.shape[0], size=min(n_centroids, x.shape[0]), replace=False)
    cents = x[idx].copy()
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(cents.shape[0]):
            members = x[assign == c]
            if members.shape[0]:
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    carry_vec: bool = False,
) -> DataFrame:
    """(id, centroid int[, vec]): IVF coarse assignment — one broadcast
    matmul per Arrow batch (the inverted-file 'list id' of FAISS-style
    IVF). ``carry_vec=True`` carries the vector through (as
    array<double>) so an index write needs no join back to the table."""
    fields = [
        StructField("id", LongType(), False),
        StructField("centroid", LongType(), False),
    ]
    if carry_vec:
        from pyspark.sql.types import ArrayType, DoubleType

        fields.append(StructField("vec", ArrayType(DoubleType()), True))
    out_schema = StructType(fields)
    cents = centroids.astype(np.float32)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            vecs = np.vstack(batch.column(1).to_numpy(zero_copy_only=False)).astype(
                np.float32
            )
            norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            assign = (norm @ cents.T).argmax(axis=1).astype(np.int64)
            cols = [pa.array(np.asarray(ids, dtype=np.int64)), pa.array(assign)]
            names = ["id", "centroid"]
            if carry_vec:
                cols.append(batch.column(1).cast(pa.list_(pa.float64())))
                names.append("vec")
            yield pa.RecordBatch.from_arrays(cols, names=names)

    keyed = df.select(F.col(id_col).cast("long").alias("__id"), F.col(vec_col).alias("__v"))
    return keyed.mapInArrow(kernel, out_schema)


def ivf_build_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    n_centroids: int = 16,
    train_sample: int = 2048,
    seed: int = 12345,
) -> np.ndarray:
    """Write a PERSISTED, centroid-partitioned IVF index: train the
    coarse quantizer on a partition-stratified reservoir, assign every
    vector, and write (id, vec) parquet partitioned by ``centroid``.
    Returns the centroids (also saved next to the index).

    This is the 10^12-row shape: the index is written once, and every
    search reads ONLY its n_probe partitions — the centroid filter is
    a partition-pruning predicate at the scan (verified in
    tests/test_dedup_similarity.py via PartitionFilters), so a search
    touches n_probe/n_centroids of the files instead of the corpus.
    ``index_path`` is shared storage on a cluster (S3/HDFS) — the
    centroids sidecar is written THROUGH Spark (a tiny parquet under
    ``<index_path>/_ivf_centroids``; the leading underscore keeps it
    out of the main index scan's file listing) so the whole index,
    sidecar included, lands on whatever filesystem the path names —
    a local ``np.save`` would fail on ``s3://...`` at build time."""
    sample = _reservoir_sample(df, vec_col, train_sample, seed)
    cents = _kmeans(sample, n_centroids, seed)
    assigned = ivf_assign(df, id_col, vec_col, cents, carry_vec=True)
    assigned.write.partitionBy("centroid").mode("overwrite").parquet(index_path)
    spark = df.sparkSession
    cent_rows = [(int(i), [float(x) for x in row]) for i, row in enumerate(cents)]
    spark.createDataFrame(cent_rows, "centroid_id int, vec array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(_centroids_path(index_path))
    return cents


def _centroids_path(index_path: str) -> str:
    return index_path.rstrip("/") + "/_ivf_centroids"


def _load_centroids(spark, index_path: str) -> np.ndarray:
    from pyspark.errors import AnalysisException

    path = _centroids_path(index_path)
    try:
        rows = spark.read.parquet(path).collect()
    except AnalysisException as e:
        raise FileNotFoundError(
            f"no IVF centroid sidecar at {path} — was the index built with "
            "ivf_build_index?"
        ) from e
    rows.sort(key=lambda r: r["centroid_id"])
    return np.asarray([r["vec"] for r in rows], dtype=np.float32)


def ivf_search_index(
    spark,
    index_path: str,
    qvec: list[float],
    k: int = 10,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Top-k cosine search against a persisted IVF index: pick the
    query's n_probe nearest centroids and scan ONLY those partitions
    (Spark prunes the rest at file-listing time)."""
    if centroids is None:
        centroids = _load_centroids(spark, index_path)
    q = np.asarray(qvec, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = [int(c) for c in np.argsort(-(centroids @ qn))[:n_probe]]
    idx = spark.read.parquet(index_path).filter(F.col("centroid").isin(probe))
    return brute_force_topk(idx, "id", "vec", qvec, k)


def _reservoir_sample(df: DataFrame, vec_col: str, n: int, seed: int) -> np.ndarray:
    """Unbiased training sample: per-partition reservoir (every
    partition contributes, every row in a partition has equal
    probability) — unlike ``limit(n)``, which takes the head of the
    first partition(s) and trains the quantizer on one shard's
    distribution. One extra column-pruned pass, no count job."""
    from pyspark import TaskContext

    # array<double> end-to-end: collecting an array<float> back out of
    # a mapInArrow stage trips Spark's ArrowColumnVector getFloat
    # limitation (UNSUPPORTED_CALL) in the final projection
    keyed = df.select(F.col(vec_col).cast("array<double>").alias("__v"))
    from .topk import estimate_partitions

    n_parts = estimate_partitions(keyed, bias="low")
    m = max(-(-n // n_parts), 8)  # per-partition reservoir size
    out_schema = StructType(
        [StructField("v", keyed.schema["__v"].dataType, True)]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        rng = np.random.default_rng(np.random.PCG64((seed << 13) ^ (pid * 0x9E3779B9)))
        reservoir: list = []
        seen = 0
        for batch in batches:
            col = batch.column(0)
            if col.null_count:
                valid_idx = np.flatnonzero(
                    col.is_valid().to_numpy(zero_copy_only=False)
                )
            else:
                valid_idx = np.arange(len(col))
            nb = valid_idx.size
            if nb == 0:
                continue
            gidx = seen + np.arange(nb)
            fill = np.flatnonzero(gidx < m)
            if fill.size:
                reservoir.extend(col.take(pa.array(valid_idx[fill])).to_pylist())
            rest = np.flatnonzero(gidx >= m)
            if rest.size:
                # accept row with prob m/(global_index+1); accepted rows
                # overwrite uniform slots in arrival order — only the
                # (few) accepted rows ever cross into Python
                u = rng.random(rest.size)
                acc = rest[u < m / (gidx[rest] + 1.0)]
                if acc.size:
                    slots = rng.integers(0, m, acc.size)
                    vals = col.take(pa.array(valid_idx[acc])).to_pylist()
                    for s, v in zip(slots, vals):
                        reservoir[s] = v
            seen += nb
        if reservoir:
            yield pa.RecordBatch.from_pydict({"v": reservoir})

    rows = keyed.mapInArrow(kernel, out_schema).collect()
    return np.asarray([list(r[0]) for r in rows], dtype=np.float32)


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    qvec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    seed: int = 12345,
) -> DataFrame:
    """IVF approximate cosine top-k: train a coarse quantizer on a
    partition-stratified reservoir sample, assign every vector to its
    nearest centroid, then score ONLY vectors in the query's n_probe
    nearest lists.

    At 10^12 vectors the assignment is a write-once index column
    (partition the table by centroid and probing prunes whole
    partitions); here it is computed inline. Recall is tuned by
    n_probe/n_centroids; brute_force_topk is the verifier.
    """
    sample = _reservoir_sample(df, vec_col, train_sample, seed)
    cents = _kmeans(sample, n_centroids, seed)
    q = np.asarray(qvec, dtype=np.float32)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(cents @ qn))[:n_probe].tolist()
    assigned = ivf_assign(df, id_col, vec_col, cents)
    cand_ids = assigned.filter(F.col("centroid").isin(probe)).select("id")
    # AQE picks broadcast vs shuffle semi-join by candidate size (an
    # n_probe/n_centroids fraction of the corpus can exceed any driver)
    cands = df.join(cand_ids, df[id_col].cast("long") == cand_ids.id, "leftsemi")
    return brute_force_topk(cands, id_col, vec_col, qvec, k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    tau: float = 0.95,
    n_bits: int = 32,
    bands: int = 4,
    seed: int = 12345,
    bucket_cap: int = 256,
) -> DataFrame:
    """(id_a < id_b, cosine) pairs with cosine >= tau — embedding
    near-duplicate detection. Banded signature buckets bound the
    candidate set; exact cosine verifies.

    Oversized buckets (degenerate signature regions) are size-gated
    BEFORE any member-list materialization and thinned to star edges
    against the bucket min — see ``operators.dedup._bucket_pairs`` for
    the window-based routing (no reducer ever holds a whole degenerate
    bucket's id list)."""
    assert n_bits % bands == 0
    bpb = n_bits // bands
    mask = (1 << bpb) - 1
    sigs = signature_df(df, id_col, vec_col, dim, n_bits, seed)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), bpb * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    from .dedup import _bucket_pairs

    pairs = (
        _bucket_pairs(banded, ["band", "bh"], "id", bucket_cap)
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .distinct()
    )
    va = df.select(
        F.col(id_col).cast("long").alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    vb = df.select(
        F.col(id_col).cast("long").alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    dot = F.aggregate(F.zip_with("va", "vb", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda s, x: s + x * x))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", F.round(dot / (na * nb), 6))
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )
