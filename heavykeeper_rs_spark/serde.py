"""Restricted, non-executable binary codec for sketch blobs.

Sketch blobs travel through shuffles AND are persisted to shared
storage by plans/checkpoint.py. ``pickle`` there would mean that a
tampered or corrupted checkpoint file executes arbitrary code on
deserialization; it is also a fragile long-lived on-disk format.

This codec encodes exactly the value shapes sketch state needs —
None/bool/int/float/str/bytes, numpy ndarrays (dtype + shape + raw
buffer), and lists/dicts of those — as length-prefixed tagged fields.
Decoding allocates buffers and builds plain containers; there is no
object construction hook, so untrusted blobs can at worst raise
ValueError (truncation and hostile nesting are converted/capped).

Format (little-endian): each value is ``tag:u8`` followed by a
tag-specific payload. Arrays are ``dtype-str, ndim, shape[i]:i64...,
nbytes:i64, raw``. Oversized ints (beyond i64) are decimal strings.
"""

from __future__ import annotations

import struct

import numpy as np

_T_NONE = 0
_T_BOOL = 1
_T_INT = 2
_T_FLOAT = 3
_T_STR = 4
_T_BYTES = 5
_T_LIST = 6
_T_DICT = 7
_T_NDARRAY = 8
_T_BIGINT = 9

_I64_MIN = -(1 << 63)
_I64_MAX = (1 << 63) - 1

#: dtypes a blob may carry — everything a sketch stores; rejects
#: object/void dtypes outright on both encode and decode
_ALLOWED_DTYPES = frozenset(
    "<u1 <u2 <u4 <u8 <i1 <i2 <i4 <i8 <f4 <f8 |u1 |i1 |b1".split()
)


def dumps(obj) -> bytes:
    out: list[bytes] = []
    _enc(obj, out)
    return b"".join(out)


def _enc(o, out: list[bytes]) -> None:
    if o is None:
        out.append(struct.pack("<B", _T_NONE))
    elif isinstance(o, (bool, np.bool_)):
        out.append(struct.pack("<Bb", _T_BOOL, int(o)))
    elif isinstance(o, (int, np.integer)):
        v = int(o)
        if _I64_MIN <= v <= _I64_MAX:
            out.append(struct.pack("<Bq", _T_INT, v))
        else:
            b = str(v).encode()
            out.append(struct.pack("<Bq", _T_BIGINT, len(b)))
            out.append(b)
    elif isinstance(o, (float, np.floating)):
        out.append(struct.pack("<Bd", _T_FLOAT, float(o)))
    elif isinstance(o, str):
        b = o.encode("utf-8")
        out.append(struct.pack("<Bq", _T_STR, len(b)))
        out.append(b)
    elif isinstance(o, (bytes, bytearray, memoryview)):
        b = bytes(o)
        out.append(struct.pack("<Bq", _T_BYTES, len(b)))
        out.append(b)
    elif isinstance(o, np.ndarray):
        a = np.ascontiguousarray(o)
        dt = a.dtype.str
        if dt not in _ALLOWED_DTYPES:
            raise TypeError(f"refusing to serialize ndarray dtype {dt!r}")
        dtb = dt.encode()
        raw = a.tobytes()
        out.append(struct.pack("<BB", _T_NDARRAY, len(dtb)))
        out.append(dtb)
        out.append(struct.pack("<B", a.ndim))
        if a.ndim:
            out.append(struct.pack(f"<{a.ndim}q", *a.shape))
        out.append(struct.pack("<q", len(raw)))
        out.append(raw)
    elif isinstance(o, (list, tuple)):
        out.append(struct.pack("<Bq", _T_LIST, len(o)))
        for x in o:
            _enc(x, out)
    elif isinstance(o, dict):
        out.append(struct.pack("<Bq", _T_DICT, len(o)))
        for k, v in o.items():
            if not isinstance(k, str):
                raise TypeError(f"dict keys must be str, got {type(k)}")
            _enc(k, out)
            _enc(v, out)
    else:
        raise TypeError(f"unsupported type for sketch blob: {type(o)}")


#: nesting bound: sketch state is at most ~3 levels (dict -> list ->
#: tuple); 32 leaves huge headroom while stopping hostile deep-nest
#: blobs from exhausting the Python stack
_MAX_DEPTH = 32


def loads(blob: bytes):
    try:
        v, off = _dec(blob, 0, 0)
    except struct.error as e:  # truncated/corrupt framing
        raise ValueError(f"corrupt blob: {e}") from None
    if off != len(blob):
        raise ValueError(f"trailing {len(blob) - off} bytes after value")
    return v


def _dec(b: bytes, off: int, depth: int):
    if depth > _MAX_DEPTH:
        raise ValueError("blob nesting exceeds depth cap")
    (tag,) = struct.unpack_from("<B", b, off)
    off += 1
    if tag == _T_NONE:
        return None, off
    if tag == _T_BOOL:
        (v,) = struct.unpack_from("<b", b, off)
        return bool(v), off + 1
    if tag == _T_INT:
        (v,) = struct.unpack_from("<q", b, off)
        return v, off + 8
    if tag == _T_FLOAT:
        (v,) = struct.unpack_from("<d", b, off)
        return v, off + 8
    if tag in (_T_STR, _T_BYTES, _T_BIGINT):
        (n,) = struct.unpack_from("<q", b, off)
        off += 8
        if n < 0 or off + n > len(b):
            raise ValueError("bad length")
        raw = b[off : off + n]
        off += n
        if tag == _T_BYTES:
            return raw, off
        s = raw.decode("utf-8")
        return (int(s), off) if tag == _T_BIGINT else (s, off)
    if tag == _T_LIST:
        (n,) = struct.unpack_from("<q", b, off)
        off += 8
        if n < 0:
            raise ValueError("bad list length")
        out = []
        for _ in range(n):
            v, off = _dec(b, off, depth + 1)
            out.append(v)
        return out, off
    if tag == _T_DICT:
        (n,) = struct.unpack_from("<q", b, off)
        off += 8
        if n < 0:
            raise ValueError("bad dict length")
        d = {}
        for _ in range(n):
            k, off = _dec(b, off, depth + 1)
            if not isinstance(k, str):
                raise ValueError("dict key must decode to str")
            v, off = _dec(b, off, depth + 1)
            d[k] = v
        return d, off
    if tag == _T_NDARRAY:
        (dtlen,) = struct.unpack_from("<B", b, off)
        off += 1
        dt = b[off : off + dtlen].decode("ascii")
        off += dtlen
        if dt not in _ALLOWED_DTYPES:
            raise ValueError(f"refusing ndarray dtype {dt!r}")
        (ndim,) = struct.unpack_from("<B", b, off)
        off += 1
        shape = struct.unpack_from(f"<{ndim}q", b, off) if ndim else ()
        off += 8 * ndim
        (nbytes,) = struct.unpack_from("<q", b, off)
        off += 8
        if nbytes < 0 or off + nbytes > len(b):
            raise ValueError("bad ndarray length")
        arr = np.frombuffer(b[off : off + nbytes], dtype=np.dtype(dt))
        off += nbytes
        expect = int(np.prod(shape)) if shape else arr.size
        if arr.size != expect:
            raise ValueError("ndarray shape/buffer mismatch")
        return arr.reshape(shape).copy(), off
    raise ValueError(f"unknown tag {tag}")
