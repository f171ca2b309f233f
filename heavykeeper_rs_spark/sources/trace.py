"""CAIDA-style fixed-width binary flow-trace source.

The reference's headline workload reads ``data/*.dat`` files of
13-byte records — src_ip(4) ‖ sport(2) ‖ dst_ip(4) ‖ dport(2) ‖
proto(1) — sequentially on one thread (examples/ip_files.rs:13-98).
Here the same files become a DataFrame of BinaryType keys: Spark's
``binaryFile`` source lists/distributes the files (one task per file —
traces ship as many sequential ``.dat`` parts, so file-level
parallelism is the natural split), and an Arrow kernel slices each
file's bytes into fixed-width records with one reshape — no per-record
Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BinaryType, StructField, StructType

_KEY_SCHEMA = StructType([StructField("flow_key", BinaryType(), False)])


def _emit_keys(mv, key_size: int) -> pa.RecordBatch:
    """(flow_key binary) RecordBatch over a buffer whose length is a
    whole number of ``key_size`` records — zero-copy: ``py_buffer``
    holds the memoryview (which holds the chunk / Arrow buffer), no
    tobytes copy. The single fixed-width slicer every trace lane
    (batch, streamed, byte-range split) shares."""
    n = len(mv) // key_size
    flat = pa.py_buffer(mv)
    offsets = pa.array(np.arange(0, (n + 1) * key_size, key_size, dtype=np.int32))
    keys = pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, offsets.buffers()[1], flat]
    )
    return pa.RecordBatch.from_arrays([keys], names=["flow_key"])


def _trace_blob_kernel(key_size: int):
    """mapInArrow kernel over a (content binary) column of whole trace
    files — module-level so the null-content guard is unit-testable."""

    def slice_records(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            col = batch.column(0)
            for i in range(len(col)):
                if not col[i].is_valid:
                    continue  # null content: as_buffer() would be None
                # zero-copy view over the Arrow buffer — no second
                # whole-file bytes copy into Python per task
                blob = memoryview(col[i].as_buffer())
                if len(blob) == 0:
                    continue
                n = len(blob) // key_size
                if n == 0:
                    continue
                # the binary column's data buffer IS the file bytes
                yield _emit_keys(blob[: n * key_size], key_size)

    return slice_records


def read_flow_trace(
    spark: SparkSession, path: str, key_size: int = 13, glob: str = "*.dat"
) -> DataFrame:
    """(flow_key binary) — one row per ``key_size``-byte record across
    every matching trace file. A trailing partial record (truncated
    final write) is dropped, mirroring the reference's read_exact loop
    (examples/ip_files.rs:27-33, which stops at the first short
    read)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )
    return files.mapInArrow(_trace_blob_kernel(key_size), _KEY_SCHEMA)


def read_flow_trace_stream(
    spark: SparkSession,
    path: str,
    key_size: int = 13,
    glob: str = "*.dat",
    chunk_bytes: int = 8 << 20,
    opener=None,
    parallelism: int | None = None,
) -> DataFrame:
    """Streamed trace reader: same rows as ``read_flow_trace`` with
    task memory bounded by ``chunk_bytes`` instead of the whole file
    (the multi-GB-trace shape). Tasks receive file PATHS listed on the
    driver and read fixed-width records chunk-by-chunk, carrying the
    partial record at each chunk boundary forward; a truncated final
    record is dropped (read_exact semantics, examples/ip_files.rs:27-33).
    Default ``open()`` covers local/NFS paths; pass ``opener`` for
    object stores."""
    import glob as _glob
    import os

    raw = path[7:] if path.startswith("file://") else path
    pat = os.path.join(raw, glob) if os.path.isdir(raw) else raw
    files = sorted(_glob.glob(pat))
    if not files:
        raise FileNotFoundError(f"no trace files match {pat}")
    par = parallelism or min(len(files), spark.sparkContext.defaultParallelism)
    # deterministic one-file-per-task placement: neither path-hash nor
    # repartition(n)'s randomized round-robin spreads a few 1-row
    # partitions evenly (see warc._one_file_per_task_df)
    from .warc import _one_file_per_task_df

    pdf = _one_file_per_task_df(spark, files, par)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        def emit(mv) -> pa.RecordBatch:
            return _emit_keys(mv, key_size)

        for batch in batches:
            for p in batch.column(0).to_pylist():
                fh = opener(p) if opener is not None else open(p, "rb")
                try:
                    carry = b""
                    while True:
                        chunk = fh.read(chunk_bytes)
                        if not chunk:
                            break
                        mv = memoryview(chunk)
                        if carry:
                            # complete ONLY the carried record — never
                            # re-copy the whole chunk through a concat
                            need = key_size - len(carry)
                            if len(chunk) < need:
                                carry = carry + chunk
                                continue
                            yield emit(memoryview(carry + bytes(mv[:need])))
                            mv = mv[need:]
                            carry = b""
                        usable = (len(mv) // key_size) * key_size
                        if usable:
                            yield emit(mv[:usable])
                        carry = bytes(mv[usable:])
                finally:
                    fh.close()

    return pdf.mapInArrow(kernel, _KEY_SCHEMA)


def read_flow_trace_split(
    spark: SparkSession,
    path: str,
    key_size: int = 13,
    glob: str = "*.dat",
    split_bytes: int = 256 << 20,
    chunk_bytes: int = 8 << 20,
    opener=None,
    parallelism: int | None = None,
) -> DataFrame:
    """Intra-file parallel trace reader: ONE oversized ``.dat`` becomes
    many byte-range tasks (the WARC analog is ``read_warc_indexed``,
    but fixed-width records need no index — any multiple of
    ``key_size`` is a record boundary). The driver lists files with
    sizes and plans record-aligned slices of ≤ ``split_bytes``; each
    task seeks to its slice and streams it in ``chunk_bytes`` reads,
    so task memory stays bounded AND a 100 GB trace engages the whole
    cluster instead of one task. A truncated final record is dropped
    (read_exact semantics, examples/ip_files.rs:27-33). Rows match
    ``read_flow_trace`` exactly (as a multiset; row order follows
    slice order). ``opener`` must return a seekable handle."""
    import glob as _glob
    import os

    from pyspark.sql import functions as F

    raw = path[7:] if path.startswith("file://") else path
    pat = os.path.join(raw, glob) if os.path.isdir(raw) else raw
    files = sorted(_glob.glob(pat))
    if not files:
        raise FileNotFoundError(f"no trace files match {pat}")
    recs_per_split = max(1, split_bytes // key_size)
    slices: list[tuple[str, int, int]] = []  # (path, start_record, n_records)
    for f in files:
        n_rec = os.path.getsize(f) // key_size
        for s in range(0, n_rec, recs_per_split):
            slices.append((f, s, min(recs_per_split, n_rec - s)))
    if not slices:
        # only empty/sub-record files: an empty result with the schema
        return spark.createDataFrame([], _KEY_SCHEMA)
    par = parallelism or min(len(slices), spark.sparkContext.defaultParallelism)
    # deterministic one-slice-per-task placement (see _rows_per_task_df)
    from .warc import _rows_per_task_df

    pdf = _rows_per_task_df(
        spark,
        {
            "path": [p for p, _, _ in slices],
            "start_rec": [s for _, s, _ in slices],
            "n_rec": [c for _, _, c in slices],
        },
        par,
    )

    # chunk reads stay record-aligned so every emitted buffer is a
    # whole number of records — no carry logic needed
    chunk_aligned = max(key_size, (chunk_bytes // key_size) * key_size)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        def emit(mv) -> pa.RecordBatch:
            return _emit_keys(mv, key_size)

        for batch in batches:
            for p, start, cnt in zip(
                batch.column(0).to_pylist(),
                batch.column(1).to_pylist(),
                batch.column(2).to_pylist(),
            ):
                fh = opener(p) if opener is not None else open(p, "rb")
                try:
                    fh.seek(start * key_size)
                    remaining = cnt * key_size
                    buf = b""
                    while remaining:
                        chunk = fh.read(min(chunk_aligned, remaining))
                        if not chunk:
                            break  # file shrank under us: drop the tail
                        remaining -= len(chunk)
                        buf = buf + chunk if buf else chunk
                        usable = (len(buf) // key_size) * key_size
                        if usable:
                            yield emit(memoryview(buf)[:usable])
                            buf = buf[usable:]
                finally:
                    fh.close()

    return pdf.mapInArrow(kernel, _KEY_SCHEMA)


def write_flow_trace(keys: list[bytes], path: str) -> None:
    """Fixture producer: write records back-to-back the way the
    reference's data tooling lays them out (data/generate.py)."""
    with open(path, "wb") as f:
        for k in keys:
            f.write(k)
