"""Vectorized language-ID over a documents table.

Semantically identical to the JVM expression pair
``functions.text.lang_scores`` / ``lang_from_scores`` (argmax of
per-family stopword hit counts over the ``[a-z]+``/len<=64 tokenizer,
earlier family wins ties, 'und' when no hit) — but computed off the
Arrow string buffers with NumPy instead of a per-token ``aggregate``
fold of array built-ins. The JVM fold allocates two transient arrays
per token per row; at ~70 us/doc it was the most expensive scan in the
suite (guide §4.2: hand whole batches to vectorized native code). Here
tokens come from the shared ``_ascii_token_slices`` tokenizer (the same
one the in-kernel token top-K is oracle-pinned on), candidate tokens
(<= 5 bytes — the longest family word) are packed into uint64 lanes and
matched against the 26 family words with exact byte equality: no
hashing, no collisions, bit-identical scores to the JVM path.

Non-ASCII batches fall back to a per-document Python replay of the
exact oracle semantics (``re.findall('[a-z]+', text.lower())``), so
mixed corpora stay correct; the synthetic corpus and any ASCII web
text take the vector lane.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.text import _LANG_FAMS, MAX_TOKEN_LEN
from ..kernel import arrow_string_buffers


def _pack_word(w: bytes) -> int:
    v = 0
    for i, b in enumerate(w):
        v |= b << (8 * i)
    return v


_LANGS = list(_LANG_FAMS)  # family order IS the tie priority
_MAX_WORD = max(len(w) for ws in _LANG_FAMS.values() for w in ws)
_FAM_PACKED = [
    np.asarray([_pack_word(w.encode()) for w in ws], dtype=np.uint64)
    for ws in _LANG_FAMS.values()
]
assert _MAX_WORD <= 8, "packed-uint64 matching requires family words <= 8 bytes"
# mask LUT: keep the first L bytes of a little-endian packed token
_LEN_MASK = np.asarray(
    [(1 << (8 * l)) - 1 for l in range(8)] + [0xFFFFFFFFFFFFFFFF], dtype=np.uint64
)

_OUT_SCHEMA = StructType(
    [StructField("lid", StringType(), False), StructField("n", LongType(), False)]
)


def _classify_ascii(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Per-doc family index (len(_LANGS) == 'und') for one ASCII batch."""
    from .topk import _ascii_token_slices

    ndocs = offsets.shape[0] - 1
    scores = np.zeros((ndocs, len(_LANGS)), dtype=np.int64)
    if data.size:
        starts, lens, low = _ascii_token_slices(offsets, data, 0)
        # only tokens short enough to BE a family word can score; the
        # tokenizer's 64-byte cap never excludes one of these
        keep = lens <= _MAX_WORD
        s, l = starts[keep], lens[keep]
        if s.size:
            pad = np.concatenate([low, np.zeros(8, dtype=np.uint8)])
            win = np.lib.stride_tricks.sliding_window_view(pad, 8)
            packed = np.ascontiguousarray(win[s]).view(np.uint64).reshape(-1)
            packed = packed & _LEN_MASK[np.minimum(l, 8)]
            doc_idx = np.searchsorted(offsets, s, side="right") - 1
            for fi, words in enumerate(_FAM_PACKED):
                m = packed == words[0]
                for wv in words[1:]:
                    m |= packed == wv
                scores[:, fi] = np.bincount(doc_idx[m], minlength=ndocs)
    best = scores.max(axis=1)
    # np.argmax returns the FIRST maximum — exactly the "earlier family
    # wins ties" rule of lang_from_scores
    return np.where(best > 0, scores.argmax(axis=1), len(_LANGS))


def _classify_python(texts: list) -> np.ndarray:
    """Exact per-document replay of the JVM tokenizer + scoring for
    non-ASCII batches."""
    import re

    rex = re.compile("[a-z]+")
    fams = [set(ws) for ws in _LANG_FAMS.values()]
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = [x for x in rex.findall((t or "").lower()) if len(x) <= MAX_TOKEN_LEN]
        sc = [sum(tok in ws for tok in toks) for ws in fams]
        b = max(sc)
        out[i] = sc.index(b) if b > 0 else len(_LANGS)
    return out


def lang_id_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(lid, n) language histogram of ``df[text_col]`` — one vectorized
    pass per partition, per-batch partial counts (<= 5 rows each), one
    tiny shuffle for the final sum. Small single-row-group scans are
    fanned out first (``parallelize_scan``) so the classifier uses the
    whole machine."""
    from .topk import parallelize_scan

    names = _LANGS + ["und"]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        counts = np.zeros(len(names), dtype=np.int64)
        saw = False
        for batch in batches:
            if batch.num_rows == 0:
                continue
            saw = True
            col = batch.column(0)
            if col.null_count:
                col = pc.fill_null(col, "")
            offsets, data = arrow_string_buffers(col)
            if data.size and int(data.max()) >= 128:
                lid = _classify_python(col.to_pylist())
            else:
                lid = _classify_ascii(offsets, data)
            counts += np.bincount(lid, minlength=len(names))
        if saw:
            yield pa.RecordBatch.from_pydict(
                {
                    "lid": pa.array(names, type=pa.string()),
                    "n": pa.array(counts, type=pa.int64()),
                }
            )

    keyed = parallelize_scan(df.select(F.col(text_col).cast("string").alias("__t")))
    partial = keyed.mapInArrow(kernel, _OUT_SCHEMA)
    return (
        partial.groupBy("lid")
        .agg(F.sum("n").alias("n"))
        .filter(F.col("n") > 0)
        .orderBy("lid")
    )
