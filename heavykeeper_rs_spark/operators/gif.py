"""GIF decode/encode with no external dependencies — completes the
web image-format set next to PNG (multimodal), JPEG (jpeg.py) and
WebP (webp.py).

``decode_gif`` implements GIF87a/89a: logical screen descriptor,
global/local color tables, variable-code-size LZW decompression
(clear/EOI codes, code-width growth to 12 bits, the deferred-clear
convention), interlaced row ordering (the four-pass scheme), GCE
transparency, and multi-frame animations with disposal methods 0-3
composited onto the logical screen (``decode_gif(all_frames=True)``
returns the composited frame stack; the default returns the FIRST
composited frame — the curation-pipeline contract, where an animation
thumbnail is one image). Returns (H, W, 3) RGB or (H, W, 4) RGBA
uint8 (alpha only when some pixel is transparent).

``encode_gif`` is the fixture producer: one frame (or several),
optional interlace, 256-color palettes built from the image (images
with more distinct colors are rejected — real corpora supply real
blobs), emitting REAL LZW streams (9-bit initial codes with code
growth and clear handling).

Spec pinning: the tests decode a hand-assembled LZW stream (in-test
bit writer, explicit code table walk) so the LZW semantics —
first-code-after-clear, the KwKwK case, code-width growth — are
checked independently of the module's encoder."""

from __future__ import annotations

import struct

import numpy as np


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start, step)


# ------------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF LZW (LSB-first, standard width growth) -> palette indices;
    the decoder core is shared with TIFF in operators/_lzw.py."""
    from heavykeeper_rs_spark.operators._lzw import lzw_decode

    return np.frombuffer(
        lzw_decode(data, min_code_size, expected,
                   msb_first=False, early_change=False),
        dtype=np.uint8,
    )


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW encoder (dict-of-tuples — fixture-scale simplicity)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: dict = {(-1, int(v)): int(v) for v in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    put(clear, width)
    prev = -1
    for v in indices:
        v = int(v)
        key = (prev, v)
        if key in table:
            prev = table[key]
            continue
        put(prev, width)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            put(clear, width)
            table = {(-1, int(c)): int(c) for c in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        prev = table[(-1, v)]
    if prev != -1:
        put(prev, width)
    put(eoi, width)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


# --------------------------------------------------------------- decoder


def _read_blocks(data: bytes, pos: int) -> "tuple[bytes, int]":
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + ln])
        if len(chunks[-1]) < ln:
            raise ValueError("truncated GIF sub-block")
        pos += ln


def decode_gif(blob: bytes, all_frames: bool = False) -> np.ndarray:
    """Decode GIF bytes: the first composited frame by default, or the
    (n, H, W, C) composited animation stack with ``all_frames=True``.
    Raises ValueError on corrupt/truncated input."""
    if len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/89a signature)")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    if w == 0 or h == 0:
        raise ValueError("empty GIF logical screen")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(blob):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    screen = np.zeros((h, w, 4), dtype=np.uint8)  # transparent canvas
    frames = []
    transparent = None
    disposal = 0
    saw_trailer = False
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x3B:  # trailer
            saw_trailer = True
            break
        if b0 == 0x21:  # extension
            if pos + 2 > len(blob):
                raise ValueError("truncated GIF extension")
            label = blob[pos + 1]
            if label == 0xF9:  # graphic control
                if pos + 8 > len(blob):
                    raise ValueError("truncated graphic control block")
                ln = blob[pos + 2]
                if ln != 4:
                    raise ValueError(
                        f"graphic control block size {ln} != 4 (corrupt GIF)"
                    )
                gflags = blob[pos + 3]
                disposal = (gflags >> 2) & 7
                transparent = blob[pos + 6] if gflags & 1 else None
                pos += 3 + ln
                if blob[pos] != 0:
                    raise ValueError("unterminated graphic control block")
                pos += 1
            else:  # comment/app/plain text: skip sub-blocks
                pos += 2
                _, pos = _read_blocks(blob, pos)
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > len(blob):
                raise ValueError("truncated GIF image descriptor")
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", blob, pos + 1)
            pos += 10
            if ix + iw > w or iy + ih > h:
                raise ValueError("GIF frame exceeds the logical screen")
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 7)
                if pos + 3 * n + 1 > len(blob):
                    raise ValueError("truncated GIF local color table")
                table = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF frame has no color table")
            if pos >= len(blob):
                raise ValueError("truncated GIF image data")
            min_code = blob[pos]
            pos += 1
            if not 2 <= min_code <= 8:  # spec max 8: roots are bytes
                raise ValueError(f"invalid LZW minimum code size {min_code}")
            lzw, pos = _read_blocks(blob, pos)
            idx = _lzw_decode(lzw, min_code, iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: reorder the four passes
                ordered = np.empty_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    for r in rows:
                        ordered[r] = idx[src]
                        src += 1
                idx = ordered
            if int(idx.max(initial=0)) >= table.shape[0]:
                raise ValueError("palette index out of range (corrupt GIF)")
            rgb = table[idx]
            alpha = np.full((ih, iw), 255, dtype=np.uint8)
            if transparent is not None:
                alpha[idx == transparent] = 0
            prev_region = screen[iy : iy + ih, ix : ix + iw].copy()
            region = screen[iy : iy + ih, ix : ix + iw]
            opaque = alpha == 255
            region[opaque, :3] = rgb[opaque]
            region[opaque, 3] = 255
            frames.append(screen.copy())
            if disposal == 2:  # restore to background (transparent)
                screen[iy : iy + ih, ix : ix + iw] = 0
            elif disposal == 3:  # restore to previous
                screen[iy : iy + ih, ix : ix + iw] = prev_region
            transparent = None
            disposal = 0
            if not all_frames:
                saw_trailer = True  # first frame decoded fully — done
                break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not saw_trailer:
        raise ValueError("truncated GIF (missing trailer)")
    if not frames:
        raise ValueError("GIF has no image data")
    stack = np.stack(frames)
    if (stack[..., 3] == 255).all():
        stack = stack[..., :3]
    return stack if all_frames else stack[0]


# --------------------------------------------------------------- encoder


def encode_gif(
    frames: np.ndarray, interlace: bool = False, loop: bool = False
) -> bytes:
    """Fixture producer: (H, W, 3) RGB uint8 (or (n, H, W, 3) for an
    animation) -> GIF89a bytes with a real LZW stream. Builds the
    palette from the distinct colors (max 256 — real corpora supply
    real blobs)."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("expected (H, W, 3) or (n, H, W, 3) RGB uint8")
    n, h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if palette.shape[0] > 256:
        raise ValueError("fixture encoder needs <= 256 distinct colors")
    bits = max(2, int(palette.shape[0] - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: palette.shape[0]] = palette
    idx_frames = inverse.reshape(n, h, w).astype(np.uint8)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    if loop and n > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(n):
        if n > 1:
            out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE: 100ms
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        idx = idx_frames[f]
        if interlace:
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            idx = idx[rows]
        min_code = max(2, bits)
        out.append(min_code)
        lzw = _lzw_encode(idx.reshape(-1), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
