"""Hadoop-filesystem helpers for index sidecars and idempotent
increment commits.

These go through the JVM Hadoop FileSystem of the SparkSession, so
they work on whatever filesystem the path names (local, HDFS, S3A) —
a driver-side ``os.path`` check would silently misread ``s3a://``
paths as absent.

The idempotency contract both persisted indexes use
(``operators/dedup_index.py``, ``operators/similarity.py`` IVF):
an increment writes into its own partition directory
``<index>/.../inc=<increment_id>/`` and is APPLIED exactly when
Spark's ``_SUCCESS`` marker exists in that directory. The marker is
written last by the committer, so it is atomic with the data —
a separate manifest file could say "applied" while the data write
died halfway (or vice versa), and the two can never be updated
together atomically on an object store. Re-applying an applied
increment is a no-op; retrying a crashed one first clears the
partial directory, then rewrites it.
"""

from __future__ import annotations

import re

_INC_ID_RE = re.compile(r"[A-Za-z0-9._-]{1,200}")


def check_increment_id(increment_id: str) -> str:
    """Increment ids become path components (``inc=<id>``): restrict
    to filesystem-safe characters so ids cannot escape the dataset
    directory or collide with partition syntax. ``fullmatch`` (not
    ``$``-anchored match — that accepts a trailing newline)."""
    if not _INC_ID_RE.fullmatch(increment_id):
        raise ValueError(
            "increment_id must match [A-Za-z0-9._-]{1,200} (it becomes a "
            f"partition directory name): {increment_id!r}"
        )
    return increment_id


def _fs_and_path(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def fs_exists(spark, path: str) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def fs_delete(spark, path: str) -> bool:
    """Recursive delete; returns whether anything was removed."""
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.delete(jpath, True))


def fs_list_dirs(spark, path: str) -> "list[str]":
    """Names (not full paths) of the immediate subdirectories."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(jpath)
        if st.isDirectory()
    ]


def increment_dir(base: str, increment_id: str) -> str:
    return f"{base.rstrip('/')}/inc={check_increment_id(increment_id)}"


def increment_applied(spark, base: str, increment_id: str) -> bool:
    """True iff the increment committed fully (``_SUCCESS`` present)."""
    return fs_exists(spark, increment_dir(base, increment_id) + "/_SUCCESS")


def prepare_increment_dir(spark, base: str, increment_id: str) -> "str | None":
    """Idempotent-commit gate: returns the target directory to write,
    or None when this increment is already applied (caller no-ops).
    A directory left behind by a crashed write (present, no
    ``_SUCCESS``) is cleared so the retry starts clean — its partial
    files were visible to readers until now, which is why retrying a
    failed increment promptly matters.

    CONTRACT (r7 review): at most ONE live writer per increment_id.
    Two drivers retrying the same increment can interleave this
    clear-then-write sequence, and a dead writer's stray part files
    could land inside the directory the survivor then commits with
    ``_SUCCESS``. Retries of a crashed driver are safe (the crashed
    process is gone before the retry starts — the streaming
    foreachBatch model); concurrent ingestion jobs must partition the
    increment_id space or serialize externally."""
    target = increment_dir(base, increment_id)
    if fs_exists(spark, target + "/_SUCCESS"):
        return None
    if fs_exists(spark, target):
        fs_delete(spark, target)
    return target


def applied_increments(spark, base: str) -> "list[str]":
    """The applied-increment manifest, derived from the filesystem
    (``inc=*`` directories whose ``_SUCCESS`` exists) — strictly
    stronger than a stored list, which can disagree with the data."""
    out = []
    for name in fs_list_dirs(spark, base):
        if name.startswith("inc="):
            inc = name[4:]
            if fs_exists(spark, f"{base.rstrip('/')}/{name}/_SUCCESS"):
                out.append(inc)
    return sorted(out)


def read_applied(spark, base: str):
    """DataFrame over ONLY the committed increments of an incremental
    dataset — readers must honor the same ``_SUCCESS`` manifest the
    writers commit through, or a crashed (never-retried) increment's
    partial files would be served as data forever. ``basePath`` keeps
    the ``inc=`` (and any nested) partition columns in the schema, so
    plans are identical to a whole-tree read minus the uncommitted
    directories."""
    incs = applied_increments(spark, base)
    if not incs:
        raise FileNotFoundError(
            f"no committed increments under {base} — index missing or "
            "every write crashed before commit"
        )
    paths = [increment_dir(base, i) for i in incs]
    return spark.read.option("basePath", base).parquet(*paths)
