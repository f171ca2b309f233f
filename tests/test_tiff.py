"""TIFF decode: exact roundtrips across compressions/predictor/strip
layouts, hand-assembled PackBits and TIFF-LZW (early change!) strips,
big-endian and palette files, the Pillow-gate classification, and the
corrupt-input error surface."""

import struct

import numpy as np
import pytest

from heavykeeper_rs_spark.operators.multimodal import synth_image
from heavykeeper_rs_spark.operators.tiff import (
    UnsupportedTiffError,
    _packbits_decode,
    _tiff_lzw_decode,
    decode_tiff,
    encode_tiff,
)


class TestRoundtrip:
    @pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
    @pytest.mark.parametrize("pred", [False, True])
    def test_rgb_exact(self, comp, pred):
        img = synth_image(13, 17, 3)
        out = decode_tiff(encode_tiff(img, compression=comp, predictor=pred))
        assert (out == img).all()

    def test_gray_rgba_and_multistrip(self):
        g = synth_image(9, 11, 1)
        assert (decode_tiff(encode_tiff(g)) == g).all()
        img = synth_image(13, 17, 3)
        rgba = np.dstack([img, (np.arange(13 * 17).reshape(13, 17) % 256
                                ).astype(np.uint8)])
        assert (decode_tiff(encode_tiff(rgba)) == rgba).all()
        big = synth_image(50, 40, 3)
        assert (decode_tiff(encode_tiff(big, rows_per_strip=7)) == big).all()


class TestSpecPinned:
    def test_packbits_hand_stream(self):
        # TIFF 6.0 PackBits example semantics: literal + repeat + noop
        data = bytes([2, 10, 20, 30,        # literal of 3
                      257 - 4, 7,           # repeat 7 x4
                      128,                  # no-op
                      0, 99])               # literal of 1
        assert _packbits_decode(data, 8) == bytes([10, 20, 30, 7, 7, 7, 7, 99])

    def test_tiff_lzw_hand_stream_early_change_and_kwkwk(self):
        # MSB-first 9-bit codes: CLEAR(256), 'A'(65), 258 (KwKwK ->
        # 'AA'), 'B'(66), EOI(257). Output: A AA B  = b"AAAB"
        bits = ""
        for code in (256, 65, 258, 66, 257):
            bits += f"{code:09b}"
        bits += "0" * ((8 - len(bits) % 8) % 8)
        data = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
        assert _tiff_lzw_decode(data, 4) == b"AAAB"

    def test_big_endian_file(self):
        # hand-build a tiny MM (big-endian) uncompressed 2x1 gray TIFF
        px = bytes([7, 200])
        entries = [
            (256, 3, 1, 2), (257, 3, 1, 1), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 1), (273, 4, 1, 0),  # patched
            (277, 3, 1, 1), (278, 4, 1, 1), (279, 4, 1, len(px)),
        ]
        ifd = struct.pack(">H", len(entries))
        strip_off = 8 + 2 + 12 * len(entries) + 4
        body = b""
        for tag, typ, cnt, val in entries:
            if tag == 273:
                val = strip_off
            if typ == 3:
                v = struct.pack(">H", val) + b"\x00\x00"
            else:
                v = struct.pack(">I", val)
            body += struct.pack(">HHI", tag, typ, cnt) + v
        blob = (b"MM\x00*" + struct.pack(">I", 8) + ifd + body
                + struct.pack(">I", 0) + px)
        out = decode_tiff(blob)
        assert out.shape == (1, 2) and out.tolist() == [[7, 200]]

    @staticmethod
    def _hand_tiff(entries, tail=b"", px=b""):
        """Little-endian TIFF from (tag, type, count, values) entries;
        out-of-line values go in ``tail`` with offsets precomputed by
        the caller; pixel data follows the tail."""
        ifd_size = 2 + 12 * len(entries) + 4
        out = bytearray(b"II*\x00" + struct.pack("<I", 8))
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val4 in entries:
            out += struct.pack("<HHI", tag, typ, cnt) + val4
        out += struct.pack("<I", 0)
        assert len(out) == 8 + ifd_size
        return bytes(out) + tail + px

    def test_palette_photometric(self):
        # hand-built photometric-3 file: 3x1 indices through a 16-bit
        # ColorMap (decode scales by //257)
        idx = bytes([0, 1, 2])
        ncol = 4
        cmap = []
        reds, greens, blues = [65535, 0, 257, 0], [0, 65535, 514, 0], [0, 0, 771, 65535]
        cmap = reds + greens + blues
        tail_off = 8 + 2 + 12 * 10 + 4
        cmap_bytes = struct.pack("<" + "H" * 12, *cmap)
        px_off = tail_off + len(cmap_bytes)
        short = lambda v: struct.pack("<H", v) + b"\x00\x00"
        long_ = lambda v: struct.pack("<I", v)
        entries = [
            (256, 4, 1, long_(3)), (257, 4, 1, long_(1)),
            (258, 3, 1, short(8)), (259, 3, 1, short(1)),
            (262, 3, 1, short(3)),  # palette
            (273, 4, 1, long_(px_off)), (277, 3, 1, short(1)),
            (278, 4, 1, long_(1)), (279, 4, 1, long_(3)),
            (320, 3, 12, long_(tail_off)),
        ]
        out = decode_tiff(self._hand_tiff(entries, cmap_bytes, idx))
        assert out.shape == (1, 3, 3)
        assert out[0, 0].tolist() == [255, 0, 0]
        assert out[0, 1].tolist() == [0, 255, 0]
        assert out[0, 2].tolist() == [1, 2, 3]  # 257//257, 514//257, 771//257

    def test_white_is_zero_inverts(self):
        px = bytes([0, 255, 10])
        px_off = 8 + 2 + 12 * 9 + 4
        short = lambda v: struct.pack("<H", v) + b"\x00\x00"
        long_ = lambda v: struct.pack("<I", v)
        entries = [
            (256, 4, 1, long_(3)), (257, 4, 1, long_(1)),
            (258, 3, 1, short(8)), (259, 3, 1, short(1)),
            (262, 3, 1, short(0)),  # white is zero
            (273, 4, 1, long_(px_off)), (277, 3, 1, short(1)),
            (278, 4, 1, long_(1)), (279, 4, 1, long_(3)),
        ]
        out = decode_tiff(self._hand_tiff(entries, b"", px))
        assert out.tolist() == [[255, 0, 245]]


class TestGateAndErrors:
    def test_unsupported_routes_to_pillow_gate(self):
        from heavykeeper_rs_spark.operators.multimodal import image_decoder

        blob = bytearray(encode_tiff(synth_image(8, 8, 3)))
        # flip BitsPerSample inline values 8 -> 16 (tag 258, type SHORT)
        idx = blob.find(struct.pack("<HHI", 258, 3, 3))
        with pytest.raises(UnsupportedTiffError):
            # patch the out-of-line bits array (3 shorts) to 16s
            off = struct.unpack_from("<I", blob, idx + 8)[0]
            struct.pack_into("<HHH", blob, off, 16, 16, 16)
            decode_tiff(bytes(blob))
        with pytest.raises(NotImplementedError):  # no Pillow here
            image_decoder(bytes(blob))

    def test_corrupt_and_truncated(self):
        with pytest.raises(ValueError, match="byte-order"):
            decode_tiff(b"XX*\x00garbage")
        blob = encode_tiff(synth_image(16, 16, 3), compression="lzw")
        with pytest.raises(ValueError):
            decode_tiff(blob[: len(blob) - 20])

    def test_image_decoder_dispatch(self):
        from heavykeeper_rs_spark.operators.multimodal import image_decoder

        img = synth_image(10, 14, 3)
        assert (image_decoder(encode_tiff(img, compression="lzw",
                                          predictor=True)) == img).all()


class TestReviewFixes:
    def test_palette_with_extra_samples_gates(self):
        # photometric 3 + spp 2 is legal TIFF this decoder gates
        short = lambda v: struct.pack("<H", v) + b"\x00\x00"
        long_ = lambda v: struct.pack("<I", v)
        px_off = 8 + 2 + 12 * 9 + 4
        entries = [
            (256, 4, 1, long_(1)), (257, 4, 1, long_(1)),
            (258, 3, 2, struct.pack("<HH", 8, 8)), (259, 3, 1, short(1)),
            (262, 3, 1, short(3)), (273, 4, 1, long_(px_off)),
            (277, 3, 1, short(2)), (278, 4, 1, long_(1)),
            (279, 4, 1, long_(2)),
        ]
        blob = TestSpecPinned._hand_tiff(entries, b"", bytes([0, 255]))
        with pytest.raises(UnsupportedTiffError):
            decode_tiff(blob)

    def test_white_is_zero_does_not_invert_alpha(self):
        # gray+alpha, photometric 0: only the gray sample inverts
        short = lambda v: struct.pack("<H", v) + b"\x00\x00"
        long_ = lambda v: struct.pack("<I", v)
        px_off = 8 + 2 + 12 * 10 + 4
        entries = [
            (256, 4, 1, long_(2)), (257, 4, 1, long_(1)),
            (258, 3, 2, struct.pack("<HH", 8, 8)), (259, 3, 1, short(1)),
            (262, 3, 1, short(0)), (273, 4, 1, long_(px_off)),
            (277, 3, 1, short(2)), (278, 4, 1, long_(1)),
            (279, 4, 1, long_(4)), (338, 3, 1, short(2)),
        ]
        px = bytes([0, 255, 200, 128])  # (gray, alpha) x2
        out = decode_tiff(TestSpecPinned._hand_tiff(entries, b"", px))
        assert out[0, 0].tolist() == [255, 255]  # gray inverted, alpha kept
        assert out[0, 1].tolist() == [55, 128]

    def test_packbits_rows_compress_separately(self):
        # a constant image whose runs would otherwise cross rows: each
        # row's stream must decode stand-alone (spec conformance)
        from heavykeeper_rs_spark.operators.tiff import (
            _packbits_decode,
            encode_tiff,
        )

        img = np.full((4, 10, 3), 7, dtype=np.uint8)
        blob = encode_tiff(img, compression="packbits", rows_per_strip=4)
        assert (decode_tiff(blob) == img).all()
        # extract the strip and decode row-at-a-time
        e_off = blob.rfind(bytes([257 - 30, 7]) if False else b"")
        # simpler: per-row stream = repeat-30 marker pairs; a 30-byte
        # row of a constant image is exactly (0xE3, 7)
        strip = blob[-8:]  # 4 rows x 2 bytes
        for r in range(4):
            assert _packbits_decode(strip[2 * r : 2 * r + 2], 30) == bytes([7] * 30)


class TestBmpPalette:
    """8-bit palette BMP (round-7 decode_bmp extension) — lives here
    with the other hand-built format pins."""

    def test_palette_bmp_roundtrip(self):
        import struct as _s

        from heavykeeper_rs_spark.operators.multimodal import decode_bmp

        w, h = 5, 3
        idx = np.arange(w * h, dtype=np.uint8).reshape(h, w) % 4
        pal = np.array([[10, 20, 30], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                       np.uint8)
        stride = (w + 3) & ~3
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w] = idx[::-1]  # bottom-up
        quads = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
        data_off = 14 + 40 + len(quads)
        px = rows.tobytes()
        blob = (
            b"BM" + _s.pack("<IHHI", data_off + len(px), 0, 0, data_off)
            + _s.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(px),
                      2835, 2835, 4, 0)
            + quads + px
        )
        out = decode_bmp(blob)
        assert out.shape == (h, w, 3)
        assert (out == pal[idx]).all()

    def test_palette_bmp_corrupt(self):
        import struct as _s

        from heavykeeper_rs_spark.operators.multimodal import decode_bmp

        with pytest.raises(ValueError, match="header"):
            decode_bmp(b"BM" + b"\x00" * 20)  # shorter than any header
        # negative width: would flip stride negative (silent garbage)
        base = bytearray(b"BM" + b"\x00" * 60)
        _s.pack_into("<I", base, 10, 54)
        _s.pack_into("<Iii", base, 14, 40, -4, 2)
        _s.pack_into("<HI", base, 28, 8, 0)
        with pytest.raises(ValueError, match="dimensions"):
            decode_bmp(bytes(base))
        # valid geometry but pixel data past the end
        _s.pack_into("<Iii", base, 14, 40, 4, 200)
        with pytest.raises(ValueError, match="pixel data"):
            decode_bmp(bytes(base))
        # color table would extend past the end (n_colors=0 -> 256)
        _s.pack_into("<Iii", base, 14, 40, 1, 1)
        _s.pack_into("<I", base, 10, 58)
        with pytest.raises(ValueError, match="color table"):
            decode_bmp(bytes(base))
