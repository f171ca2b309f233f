"""Lossless WebP (VP8L) decode: exact encoder roundtrips (lossless ⇒
bit-equality), transform coverage, and hand-assembled bitstream pins.

The hand-built streams in TestSpecPinned use an in-test LSB bit writer
and in-test canonical code assignment, so LZ77 distance mapping, the
color cache, and the prefix-value coding are checked independently of
the module's own encoder (the jpeg.py pinning pattern — matched
encoder/decoder bugs cannot cancel).
"""

import struct

import numpy as np
import pytest

from heavykeeper_rs_spark.operators.multimodal import synth_image
from heavykeeper_rs_spark.operators.webp import (
    _DIST_MAP,
    UnsupportedWebpError,
    decode_webp,
    encode_webp_lossless,
)


class TestDistanceMap:
    def test_head_matches_rfc_list(self):
        # RFC 9649 §4.2.2.3 opens its neighborhood list with exactly
        # these offsets
        assert _DIST_MAP[:12] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
            (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
        ]
        assert len(_DIST_MAP) == 120

    def test_libwebp_packed_bytes(self):
        # libwebp packs each entry as (y << 4) | (8 - x); its table's
        # first 40 bytes are well-known constants
        packed = bytes((y << 4) | (8 - x) for x, y in _DIST_MAP[:40])
        assert packed == bytes([
            0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
            0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
            0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
            0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
        ])

    def test_all_entries_in_window(self):
        assert all(-8 <= x <= 8 and 0 <= y <= 8 for x, y in _DIST_MAP)
        assert all(x > 0 for x, y in _DIST_MAP if y == 0)
        assert len(set(_DIST_MAP)) == 120


class TestRoundtrip:
    def test_rgb_exact(self):
        img = synth_image(13, 17, 3)
        out = decode_webp(encode_webp_lossless(img))
        assert out.shape == img.shape and (out == img).all()

    def test_gray_and_rgba_exact(self):
        g = synth_image(9, 11, 1)
        out = decode_webp(encode_webp_lossless(g))
        assert (out == np.repeat(g[:, :, None], 3, 2)).all()
        rgba = np.dstack([
            synth_image(8, 10, 3),
            (np.arange(80).reshape(8, 10) * 3 % 256).astype(np.uint8),
        ])
        out = decode_webp(encode_webp_lossless(rgba))
        assert out.shape == (8, 10, 4) and (out == rgba).all()

    def test_subtract_green_transform(self):
        img = synth_image(12, 15, 3)
        assert (decode_webp(encode_webp_lossless(img, subtract_green=True))
                == img).all()

    @pytest.mark.parametrize("mode", list(range(14)))
    def test_all_predictor_modes(self, mode):
        # the predictor subimage is a REAL recursive entropy-coded
        # image, so this also covers the non-level0 decode path
        img = synth_image(12, 15, 3)
        out = decode_webp(encode_webp_lossless(img, predictor=mode))
        assert (out == img).all()

    def test_single_pixel_and_single_row(self):
        one = np.array([[[7, 200, 31]]], dtype=np.uint8)
        assert (decode_webp(encode_webp_lossless(one)) == one).all()
        row = synth_image(1, 16, 3)
        assert (decode_webp(encode_webp_lossless(row)) == row).all()


# ---------------------------------------------------- hand-built streams


class _W:
    """In-test LSB-first bit writer (independent of the module's)."""

    def __init__(self):
        self.bytes_ = bytearray()
        self.buf = 0
        self.n = 0

    def bits(self, v, n):
        self.buf |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.bytes_.append(self.buf & 0xFF)
            self.buf >>= 8
            self.n -= 8

    def code(self, c, ln):  # canonical code, MSB first
        for b in range(ln - 1, -1, -1):
            self.bits((c >> b) & 1, 1)

    def done(self):
        if self.n:
            self.bytes_.append(self.buf & 0xFF)
        return bytes(self.bytes_)


def _canon(lengths):
    codes, code, prev = {}, 0, 0
    for ln, sym in sorted((ln, s) for s, ln in enumerate(lengths) if ln):
        code <<= ln - prev
        prev = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def _write_full_tree(w, lengths, cl_a, cl_b):
    """Code-length-coded tree whose lengths all lie in {cl_a, cl_b}."""
    order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
    w.bits(0, 1)
    idx = {s: i for i, s in enumerate(order)}
    n = max(4, idx[cl_a] + 1, idx[cl_b] + 1)
    w.bits(n - 4, 4)
    cl = [0] * 19
    cl[cl_a] = cl[cl_b] = 1
    for i in range(n):
        w.bits(cl[order[i]], 3)
    w.bits(0, 1)  # no max-symbol
    cc = _canon(cl)
    for ln in lengths:
        w.code(*cc[ln])
    return _canon(lengths)


def _wrap_vp8l(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


_GREEN_LEN = [8] * 232 + [9] * 48  # 280 syms (no cache), Kraft-complete
_BYTE_LEN = [8] * 256
_DIST_LEN = [5] * 24 + [6] * 16


def _literal(w, trees, a, r, g, b):
    green, red, blue, alpha = trees
    w.code(*green[g])
    w.code(*red[r])
    w.code(*blue[b])
    w.code(*alpha[a])


class TestSpecPinned:
    def _header(self, w, width, height):
        w.bits(width - 1, 14)
        w.bits(height - 1, 14)
        w.bits(0, 1)  # alpha hint
        w.bits(0, 3)  # version
        w.bits(0, 1)  # no transforms

    def test_lz77_near_distance_code_maps_to_2d_offset(self):
        # 4x2 image: 4 literals, then a backref of LENGTH 4 with
        # distance code 4 -> _DIST_MAP[3] = (-1, 1) -> dist = w - 1 = 3.
        # Expected: row 2 pixels copy from 3 back: [p1, p2, p3, p1]
        w = _W()
        self._header(w, 4, 2)
        w.bits(0, 1)  # no color cache
        w.bits(0, 1)  # no meta-Huffman
        green = _write_full_tree(w, _GREEN_LEN, 8, 9)
        red = _write_full_tree(w, _BYTE_LEN, 8, 0)
        blue = _write_full_tree(w, _BYTE_LEN, 8, 0)
        alpha = _write_full_tree(w, _BYTE_LEN, 8, 0)
        dist = _write_full_tree(w, _DIST_LEN, 5, 6)
        trees = (green, red, blue, alpha)
        px = [(255, 10, 20, 30), (255, 40, 50, 60),
              (255, 70, 80, 90), (255, 110, 120, 130)]
        for a, r, g, b in px:
            _literal(w, trees, a, r, g, b)
        # length prefix symbol 256+3 -> value 4 (codes 0..3 carry no
        # extra bits); distance prefix symbol 3 -> value 4 = dist_code
        w.code(*green[256 + 3])
        w.code(*dist[3])
        blob = _wrap_vp8l(b"\x2f" + w.done())
        out = decode_webp(blob)
        assert out.shape == (2, 4, 3)
        exp_row1 = [(10, 20, 30), (40, 50, 60), (70, 80, 90),
                    (110, 120, 130)]
        exp_row2 = [(40, 50, 60), (70, 80, 90), (110, 120, 130),
                    (40, 50, 60)]
        assert [tuple(p) for p in out[0]] == exp_row1
        assert [tuple(p) for p in out[1]] == exp_row2

    def test_long_distance_code_and_overlapping_copy(self):
        # 4x2: one literal, then a backref length 7 distance 1
        # (dist_code 121 -> distance 1): the classic overlapping RLE.
        # length 7 -> prefix code 5 (offset (2+1)<<1 = 6, +bits(1)+1),
        # extra bit 0 -> 7. distance 121 -> prefix code 13
        # (offset (2+1)<<5 = 96, +bits(5)+1): extra 24 -> 121.
        w = _W()
        self._header(w, 4, 2)
        w.bits(0, 1)
        w.bits(0, 1)
        green = _write_full_tree(w, _GREEN_LEN, 8, 9)
        red = _write_full_tree(w, _BYTE_LEN, 8, 0)
        blue = _write_full_tree(w, _BYTE_LEN, 8, 0)
        alpha = _write_full_tree(w, _BYTE_LEN, 8, 0)
        dist = _write_full_tree(w, _DIST_LEN, 5, 6)
        _literal(w, (green, red, blue, alpha), 255, 9, 8, 7)
        w.code(*green[256 + 5])
        w.bits(0, 1)  # length extra bit
        w.code(*dist[13])
        w.bits(24, 5)  # distance extra bits
        out = decode_webp(_wrap_vp8l(b"\x2f" + w.done()))
        assert (out == np.array([9, 8, 7], np.uint8)[None, None, :]).all()

    def test_color_cache_symbol(self):
        # cache_bits=4; literal pixel P inserts at
        # (0x1e35a7bd * P) >> 28; a later green symbol 256+24+idx must
        # reproduce P exactly
        cache_bits = 4
        green_len = [8] * 216 + [9] * 80  # 296 = 280 + 16 cache syms
        w = _W()
        self._header(w, 3, 1)
        w.bits(1, 1)  # color cache present
        w.bits(cache_bits, 4)
        w.bits(0, 1)  # no meta-Huffman
        green = _write_full_tree(w, green_len, 8, 9)
        red = _write_full_tree(w, _BYTE_LEN, 8, 0)
        blue = _write_full_tree(w, _BYTE_LEN, 8, 0)
        alpha = _write_full_tree(w, _BYTE_LEN, 8, 0)
        _write_full_tree(w, _DIST_LEN, 5, 6)
        trees = (green, red, blue, alpha)
        p = (255 << 24) | (12 << 16) | (34 << 8) | 56
        idx = (p * 0x1E35A7BD & 0xFFFFFFFF) >> (32 - cache_bits)
        _literal(w, trees, 255, 12, 34, 56)
        _literal(w, trees, 255, 1, 2, 3)
        w.code(*green[256 + 24 + idx])  # cache hit for pixel 1
        out = decode_webp(_wrap_vp8l(b"\x2f" + w.done()))
        assert [tuple(q) for q in out[0]] == [(12, 34, 56), (1, 2, 3),
                                              (12, 34, 56)]


class TestErrorSurface:
    def test_lossy_vp8_routes_to_pillow_gate(self):
        from heavykeeper_rs_spark.operators.multimodal import image_decoder

        blob = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
                + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
        with pytest.raises(UnsupportedWebpError):
            decode_webp(blob)
        with pytest.raises(NotImplementedError):  # no Pillow here
            image_decoder(blob)

    def test_truncated_stream_raises(self):
        blob = encode_webp_lossless(synth_image(16, 16, 3))
        with pytest.raises(ValueError):
            decode_webp(blob[: len(blob) // 2])

    def test_not_webp(self):
        with pytest.raises(ValueError, match="WebP"):
            decode_webp(b"RIFF\x00\x00\x00\x00WAVE")

    def test_image_decoder_dispatch(self):
        from heavykeeper_rs_spark.operators.multimodal import image_decoder

        img = synth_image(10, 14, 3)
        assert (image_decoder(encode_webp_lossless(img)) == img).all()


class TestFailFast:
    def test_huge_dims_truncated_blob_fails_fast(self):
        # review finding: a tiny blob claiming 16383x16383 used to
        # decode fabricated zero bits for minutes before the final
        # overrun check; the in-loop check bounds it to ~4k pixels
        import time

        w = _W()
        w.bits(16382, 14)
        w.bits(16382, 14)
        w.bits(0, 1)
        w.bits(0, 3)
        w.bits(0, 1)  # no transforms
        w.bits(0, 1)  # no cache
        w.bits(0, 1)  # no meta
        _write_full_tree(w, _GREEN_LEN, 8, 9)
        _write_full_tree(w, _BYTE_LEN, 8, 0)
        _write_full_tree(w, _BYTE_LEN, 8, 0)
        _write_full_tree(w, _BYTE_LEN, 8, 0)
        _write_full_tree(w, _DIST_LEN, 5, 6)
        blob = _wrap_vp8l(b"\x2f" + w.done())  # trees, zero pixel data
        t0 = time.time()
        with pytest.raises(ValueError):
            decode_webp(blob)
        assert time.time() - t0 < 5.0

    def test_max_symbol_exceeding_alphabet_rejected(self):
        w = _W()
        w.bits(0, 14)  # 1x1
        w.bits(0, 14)
        w.bits(0, 1)
        w.bits(0, 3)
        w.bits(0, 1)
        w.bits(0, 1)
        w.bits(0, 1)
        # green tree with the max-symbol form claiming 2 + 1000 slots
        w.bits(0, 1)  # not simple
        w.bits(0, 4)  # 4 code lengths
        for sym_len in (0, 0, 1, 1):  # order 17,18,0,1 -> symbols 0,1
            w.bits(sym_len, 3)
        w.bits(1, 1)  # use max-symbol
        w.bits(7, 3)  # length_nbits = 16
        w.bits(1000, 16)  # max_symbol = 1002 > 280
        with pytest.raises(ValueError, match="max-symbol"):
            decode_webp(_wrap_vp8l(b"\x2f" + w.done()))
