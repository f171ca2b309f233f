"""Raw text-file corpus source.

The reference's examples consume plain text files (mmap + tokenizer —
examples/word_count.rs; newline-delimited flows in examples/
ip_files.rs). The Spark-native equivalent is the ``text`` data source:
each file (or line) becomes a document row that feeds the same
operators the parquet tables do — tokens top-K, dedup, fingerprints.

Scale notes: ``spark.read.text`` splits by file (wholetext) or by HDFS
block (line mode), so parallelism comes from the file layout;
``pathGlobFilter``/``recursiveFileLookup`` prune at listing time, and
the scan stays a single projected string column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(
    spark: SparkSession,
    path: str,
    per_file: bool = True,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """(doc_id long, source string, text string) from raw text files.

    ``per_file=True`` (wholetext): one document per file — the
    word_count shape; ``doc_id`` is the xxhash64 of the file path, so
    ids are deterministic across runs and cluster layouts.
    ``per_file=False``: one document per line (the ip_files shape);
    ``doc_id`` hashes (path, line) — deterministic, and duplicate
    lines in one file intentionally share an id (they are the same
    flow record).
    """
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.text(path, wholetext=per_file).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source"),
    )
    if per_file:
        key = F.xxhash64("source")
    else:
        key = F.xxhash64("source", "text")
    return df.select(key.alias("doc_id"), "source", "text")
