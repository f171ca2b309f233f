"""Baseline TIFF decode/encode with no external dependencies — the
sixth web image format next to PNG / JPEG / WebP / GIF / BMP.

``decode_tiff`` implements TIFF 6.0 baseline + the common extensions:
both byte orders (II/MM), IFD walking with the inline-value rule
(values <= 4 bytes live in the entry), strip-organized chunky images,
Compression 1 (none), 32773 (PackBits) and 5 (LZW — the TIFF flavor:
MSB-first bit packing and the EARLY-CHANGE code-width rule, one code
before the table fills, unlike GIF), Predictor 2 (horizontal
differencing), Photometric 0/1 (grayscale, white-is-zero inverted),
2 (RGB, with an alpha ExtraSample) and 3 (palette, 16-bit color map
scaled down), 8-bit samples, RowsPerStrip tiling. Multi-page files
decode their first IFD (the curation-thumbnail contract, like GIF's
first frame). Tiled TIFFs, planar configuration 2, and non-8-bit
depths raise ``UnsupportedTiffError`` — ``image_decoder`` routes
those to the Pillow gate; corrupt input stays a per-row ValueError.

``encode_tiff`` is the fixture producer: little-endian, gray/RGB/RGBA,
compression in ('none', 'packbits', 'lzw'), optional predictor=2 and
multi-strip layout — real strip streams for every decode path.
PackBits and TIFF-LZW (early change!) are additionally pinned by
hand-assembled strips in the tests, independent of the encoder."""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedTiffError(ValueError):
    """Legal TIFF this decoder does not implement (tiles, planar=2,
    16-bit samples, JPEG-in-TIFF, ...). ``image_decoder`` routes these
    to the Pillow gate; plain ValueError means corrupt input."""


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4}


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while len(out) < expected:
        if pos >= n:
            raise ValueError("truncated PackBits strip")
        h = data[pos]
        pos += 1
        if h < 128:  # literal run of h+1 bytes
            if pos + h + 1 > n:
                raise ValueError("truncated PackBits literal")
            out += data[pos : pos + h + 1]
            pos += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if pos >= n:
                raise ValueError("truncated PackBits repeat")
            out += bytes([data[pos]]) * (257 - h)
            pos += 1
        # h == 128: no-op
    if len(out) != expected:
        raise ValueError("PackBits strip over-ran its byte count")
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (
            i < n
            and i - lit_start < 128
            and not (i + 1 < n and data[i] == data[i + 1])
        ):
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW (MSB-first, 256-byte roots, EARLY-CHANGE width rule);
    the decoder core is shared with GIF in operators/_lzw.py."""
    from heavykeeper_rs_spark.operators._lzw import lzw_decode

    return lzw_decode(data, 8, expected, msb_first=True, early_change=True)


def _tiff_lzw_encode(data: bytes) -> bytes:
    clear, eoi = 256, 257
    out = bytearray()
    buf = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
        buf &= (1 << nbits) - 1

    table: dict = {}
    next_code, width = 258, 9
    put(clear, width)
    prev = -1
    for b in data:
        if prev == -1:  # phrase start: the raw byte IS the root code
            prev = b
            continue
        key = (prev, b)
        if key in table:
            prev = table[key]
            continue
        put(prev, width)
        table[key] = next_code
        next_code += 1
        # early change, shifted one add later than the decoder's rule
        # (the decoder adds nothing for the first code after a clear,
        # so its next_code lags this one by exactly one)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            put(clear, width)
            table = {}
            next_code, width = 258, 9
        prev = b
    if prev != -1:
        put(prev, width)
    put(eoi, width)
    if nbits:
        put(0, 8 - nbits)
    return bytes(out)


# --------------------------------------------------------------- decoder


def _read_ifd_entries(blob, order, off):
    if off + 2 > len(blob):
        raise ValueError("truncated TIFF IFD")
    (count,) = struct.unpack_from(order + "H", blob, off)
    entries = {}
    pos = off + 2
    if pos + 12 * count + 4 > len(blob):
        raise ValueError("truncated TIFF IFD entries")
    for _ in range(count):
        tag, typ, n = struct.unpack_from(order + "HHI", blob, pos)
        size = _TYPE_SIZE.get(typ, 0) * n
        if size == 0:
            pos += 12
            continue  # unknown type: skip tag
        if size <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(order + "I", blob, pos + 8)
            if voff + size > len(blob):
                raise ValueError("TIFF value offset out of range")
        fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}.get(typ)
        if fmt:
            entries[tag] = list(
                struct.unpack_from(order + fmt * n, blob, voff)
            )
        pos += 12
    return entries


def decode_tiff(blob: bytes) -> np.ndarray:
    """Decode the first IFD of a TIFF to (H, W[, C]) uint8. Raises
    ValueError on corrupt input, UnsupportedTiffError (a ValueError
    subclass — the Pillow-gate signal) on legal-but-unimplemented
    layouts."""
    if len(blob) < 8 or blob[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF (bad byte-order header)")
    order = "<" if blob[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(order + "I", blob, 4)
    e = _read_ifd_entries(blob, order, ifd_off)

    def one(tag, default=None):
        v = e.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    spp = one(277, 1)
    bits = e.get(258, [8] * spp)
    comp = one(259, 1)
    photo = one(262)
    planar = one(284, 1)
    if 322 in e or 323 in e:
        raise UnsupportedTiffError("tiled TIFF needs a full reader")
    if planar != 1:
        raise UnsupportedTiffError(f"planar configuration {planar}")
    if any(b != 8 for b in bits):
        raise UnsupportedTiffError(f"bits-per-sample {bits} (8-bit only)")
    if comp not in (1, 5, 32773):
        raise UnsupportedTiffError(f"TIFF compression {comp}")
    if photo not in (0, 1, 2, 3):
        raise UnsupportedTiffError(f"photometric interpretation {photo}")
    if w == 0 or h == 0 or not (1 <= spp <= 4):
        raise ValueError("invalid TIFF geometry")
    offsets = e.get(273)
    counts = e.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts missing or mismatched")
    rows_per_strip = one(278, h)
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise UnsupportedTiffError(f"TIFF predictor {predictor}")

    row_bytes = w * spp
    raw = bytearray()
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(blob):
            raise ValueError("TIFF strip out of range")
        strip_rows = min(rows_per_strip, remaining_rows)
        expected = strip_rows * row_bytes
        chunk = bytes(blob[off : off + cnt])
        if comp == 1:
            if len(chunk) < expected:
                raise ValueError("truncated uncompressed strip")
            raw += chunk[:expected]
        elif comp == 32773:
            raw += _packbits_decode(chunk, expected)
        else:
            raw += _tiff_lzw_decode(chunk, expected)
        remaining_rows -= strip_rows
    if remaining_rows > 0:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")
    img = np.frombuffer(bytes(raw), np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: cumsum per channel
        img = np.cumsum(img.astype(np.uint32), axis=1).astype(np.uint8)
    n_extra = len(e.get(338, []))
    if photo == 3:  # palette
        if spp != 1:
            raise UnsupportedTiffError(
                "palette TIFF with extra samples needs a full reader"
            )
        cmap = e.get(320)
        if not cmap:
            raise ValueError("palette TIFF missing ColorMap")
        if len(cmap) % 3:
            raise ValueError("ColorMap length is not 3 x N (corrupt TIFF)")
        ncol = len(cmap) // 3
        pal = (np.asarray(cmap, dtype=np.uint32).reshape(3, ncol).T // 257
               ).astype(np.uint8)  # 16-bit map -> 8-bit
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("palette index out of range")
        return pal[idx]
    if photo == 0:  # white is zero: invert the IMAGE samples only
        n_img = max(1, spp - n_extra)
        img = img.copy()
        img[:, :, :n_img] = 255 - img[:, :, :n_img]
    return img[:, :, 0] if spp == 1 else img


# --------------------------------------------------------------- encoder


def encode_tiff(
    img: np.ndarray,
    compression: str = "lzw",
    predictor: bool = False,
    rows_per_strip: "int | None" = None,
) -> bytes:
    """Fixture producer: (H, W[, C in 1/3/4]) uint8 -> little-endian
    TIFF with real strip streams ('none' / 'packbits' / 'lzw', the
    TIFF early-change LZW; optional horizontal-differencing
    predictor)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3, 4):
        raise ValueError("expected (H, W[, 1|3|4]) uint8")
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_id is None:
        raise ValueError(f"unknown compression {compression!r}")
    h, w, spp = arr.shape
    rows_per_strip = rows_per_strip or max(1, h // 3)
    data = arr
    if predictor:
        d = data.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        data = (d & 0xFF).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        block = data[y0 : y0 + rows_per_strip]
        if comp_id == 1:
            strips.append(block.tobytes())
        elif comp_id == 32773:
            # TIFF 6.0: each row compresses separately (runs must not
            # cross row boundaries); decoders consume the strip as one
            # stream either way, so concatenation is the layout
            strips.append(
                b"".join(_packbits_encode(row.tobytes()) for row in block)
            )
        else:
            strips.append(_tiff_lzw_encode(block.tobytes()))

    entries = []  # (tag, type, count, values)
    entries.append((256, 4, 1, [w]))
    entries.append((257, 4, 1, [h]))
    entries.append((258, 3, spp, [8] * spp))
    entries.append((259, 3, 1, [comp_id]))
    entries.append((262, 3, 1, [1 if spp == 1 else 2]))
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 4, 1, [rows_per_strip]))
    if spp == 4:
        entries.append((338, 3, 1, [2]))  # unassociated alpha
    if predictor:
        entries.append((317, 3, 1, [2]))

    # layout: header(8) + IFD + out-of-line values + strip data
    n_strip = len(strips)
    entries.append((273, 4, n_strip, [0] * n_strip))  # patched below
    entries.append((279, 4, n_strip, [len(s) for s in strips]))
    entries.sort(key=lambda t: t[0])
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    tail_base = ifd_off + ifd_size

    def value_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack("<" + fmt * len(vals), *vals)

    # size the out-of-line tail so strip offsets are known up front
    strip_base = tail_base + sum(
        len(vb) for vb in (value_bytes(t, v) for _, t, _, v in entries)
        if len(vb) > 4
    )
    strip_offsets = []
    cur = strip_base
    for sdata in strips:
        strip_offsets.append(cur)
        cur += len(sdata)
    entries = [
        (tag, typ, cnt, strip_offsets if tag == 273 else vals)
        for tag, typ, cnt, vals in entries
    ]

    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    tail = bytearray()
    tail_cursor = tail_base
    for tag, typ, cnt, vals in entries:
        vb = value_bytes(typ, vals)
        out += struct.pack("<HHI", tag, typ, cnt)
        if len(vb) <= 4:
            out += vb + b"\x00" * (4 - len(vb))
        else:
            out += struct.pack("<I", tail_cursor)
            tail += vb
            tail_cursor += len(vb)
    out += struct.pack("<I", 0)  # no next IFD
    out += tail
    for sdata in strips:
        out += sdata
    return bytes(out)
