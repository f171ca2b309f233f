"""GIF decode: exact roundtrips (palette format ⇒ bit-equality where
the palette covers the image), LZW spec pins via a hand-assembled
stream (independent in-test bit writer — the jpeg/webp pattern),
interlacing, animation compositing/disposal, transparency, and the
corrupt-input error surface."""

import struct

import numpy as np
import pytest

from heavykeeper_rs_spark.operators.gif import (
    decode_gif,
    encode_gif,
)
from heavykeeper_rs_spark.operators.multimodal import synth_image


def _img(h=13, w=17, mod=64, seed=7):
    return (synth_image(h, w, 3, seed=seed) % mod).astype(np.uint8)


class TestRoundtrip:
    def test_small_exact(self):
        img = _img()
        out = decode_gif(encode_gif(img))
        assert out.shape == img.shape and (out == img).all()

    def test_lzw_width_growth_exact(self):
        # enough distinct 2-grams to push codes past 9 and 10 bits
        big = (synth_image(64, 96, 3) // 16 * 16).astype(np.uint8)
        assert np.unique(big.reshape(-1, 3), axis=0).shape[0] <= 256
        assert (decode_gif(encode_gif(big)) == big).all()

    def test_interlaced_exact(self):
        # true palette image: 23 rows exercise uneven interlace passes
        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
        img = pal[rng.integers(0, 32, (23, 31))]
        assert (decode_gif(encode_gif(img, interlace=True)) == img).all()

    def test_animation_composited_stack(self):
        base = _img(10, 12, mod=16)
        frames = np.stack([base, base[::-1], np.rot90(base, 2)])
        out = decode_gif(encode_gif(frames, loop=True), all_frames=True)
        assert out.shape == frames.shape and (out == frames).all()
        # default: first composited frame only
        first = decode_gif(encode_gif(frames))
        assert (first == frames[0]).all()


def _wrap_gif(w, h, palette_bits, gct, body):
    head = b"GIF89a" + struct.pack(
        "<HHBBB", w, h, 0x80 | (palette_bits - 1), 0, 0
    ) + gct
    return head + body + b"\x3b"


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, code, width):
        self.buf |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.n -= 8

    def done(self):
        if self.n:
            self.out.append(self.buf & 0xFF)
        return bytes(self.out)


class TestLzwSpecPinned:
    def test_kwkwk_and_code_growth(self):
        # 2-bit palette (indices 0..3): clear=4, eoi=5, first dynamic
        # code 6, initial width 3. Stream (after clear):
        #   0        -> emits [0]
        #   6 (KwKwK!) -> prev=0's string + its first byte = [0, 0]
        #   7 (KwKwK)  -> entry6+first(6) = [0, 0, 0]
        #   1        -> [1]
        # total pixels: 1 + 2 + 3 + 1 = 7 -> a 7x1 image
        wr = _BitW()
        wr.put(4, 3)  # clear
        wr.put(0, 3)
        wr.put(6, 3)  # KwKwK on the very first dynamic slot
        wr.put(7, 3)  # ... after this add next_code hits 8 = 2^3
        wr.put(1, 4)  # so subsequent codes read at width 4
        wr.put(5, 4)  # EOI
        lzw = wr.done()
        gct = bytes(
            [10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40]
        )  # 4 colors
        body = (
            b"\x2c" + struct.pack("<HHHHB", 0, 0, 7, 1, 0)
            + bytes([2])  # min code size
            + bytes([len(lzw)]) + lzw + b"\x00"
        )
        out = decode_gif(_wrap_gif(7, 1, 2, gct, body))
        exp_idx = [0, 0, 0, 0, 0, 0, 1]
        exp = np.array([[10, 10, 10]] * 6 + [[20, 20, 20]], np.uint8)
        assert (out[0] == exp).all(), (out[0], exp_idx)

    def test_clear_code_resets_table(self):
        # 0, 1, CLEAR, 0, 1 — after the clear, code 6 would be invalid
        wr = _BitW()
        wr.put(4, 3)
        wr.put(0, 3)
        wr.put(1, 3)
        wr.put(4, 3)  # clear mid-stream
        wr.put(0, 3)
        wr.put(1, 3)
        wr.put(5, 3)
        lzw = wr.done()
        gct = bytes([1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4])
        body = (
            b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 1, 0)
            + bytes([2]) + bytes([len(lzw)]) + lzw + b"\x00"
        )
        out = decode_gif(_wrap_gif(4, 1, 2, gct, body))
        assert out[0].tolist() == [[1, 1, 1], [2, 2, 2], [1, 1, 1], [2, 2, 2]]

    def test_invalid_code_rejected(self):
        wr = _BitW()
        wr.put(4, 3)
        wr.put(7, 3)  # undefined, and not the KwKwK slot
        lzw = wr.done()
        gct = bytes(12)
        body = (
            b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
            + bytes([2]) + bytes([len(lzw)]) + lzw + b"\x00"
        )
        with pytest.raises(ValueError, match="LZW"):
            decode_gif(_wrap_gif(2, 1, 2, gct, body))


class TestTransparencyAndDisposal:
    def test_transparent_pixels_get_alpha(self):
        # GCE marks index 1 transparent; expect RGBA output
        img = np.array([[0, 1], [1, 0]], np.uint8)
        gct = bytes([100, 0, 0, 0, 200, 0] + [0] * 6)
        wr = _BitW()
        wr.put(4, 3)
        for v in img.reshape(-1):
            wr.put(int(v), 3)
        wr.put(5, 3)
        lzw = wr.done()
        body = (
            b"\x21\xf9\x04\x01\x00\x00\x01\x00"  # GCE: transparent idx 1
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
            + bytes([2]) + bytes([len(lzw)]) + lzw + b"\x00"
        )
        out = decode_gif(_wrap_gif(2, 2, 2, gct, body))
        assert out.shape == (2, 2, 4)
        assert out[0, 0].tolist() == [100, 0, 0, 255]
        assert out[0, 1, 3] == 0  # transparent

    def test_error_surface(self):
        with pytest.raises(ValueError, match="GIF87a"):
            decode_gif(b"NOTAGIFxxxx")
        blob = encode_gif(_img())
        with pytest.raises(ValueError):
            decode_gif(blob[: len(blob) // 2])

    def test_image_decoder_dispatch(self):
        from heavykeeper_rs_spark.operators.multimodal import image_decoder

        img = _img()
        assert (image_decoder(encode_gif(img)) == img).all()
