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


def _lzw_raw(indices, min_code):
    """In-test LZW: emit every index as a root code (clear first)."""
    wr = _BitW()
    clear = 1 << min_code
    width = min_code + 1
    wr.put(clear, width)
    # emitting only root codes still grows the decoder's table by one
    # entry per code after the first — track width like the decoder
    next_code = clear + 2
    for k, v in enumerate(indices):
        wr.put(int(v), width)
        if k > 0:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
    wr.put(clear + 1, width)  # EOI
    return wr.done()


def _frame(ix, iy, iw, ih, indices, min_code=2, lct=None, lct_bits=2):
    body = b"\x2c" + struct.pack(
        "<HHHHB", ix, iy, iw, ih, (0x80 | (lct_bits - 1)) if lct else 0
    )
    if lct:
        body += lct
    lzw = _lzw_raw(indices, min_code)
    return body + bytes([min_code, len(lzw)]) + lzw + b"\x00"


def _gce(disposal, transparent=None):
    gflags = (disposal << 2) | (1 if transparent is not None else 0)
    return b"\x21\xf9\x04" + bytes(
        [gflags, 0, 0, transparent if transparent is not None else 0]
    ) + b"\x00"


class TestDisposalAndLct:
    GCT = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 99, 99, 99])  # A, B, C, -

    def test_disposal_2_restores_background(self):
        # frame 1: full 2x2 of A, disposal 2 (clear region after);
        # frame 2: 1x1 of B at (0,0). Composited frame 2 = B + holes.
        body = (
            _gce(2) + _frame(0, 0, 2, 2, [0, 0, 0, 0])
            + _gce(0) + _frame(0, 0, 1, 1, [1])
        )
        out = decode_gif(_wrap_gif(2, 2, 2, self.GCT, body), all_frames=True)
        assert out.shape == (2, 2, 2, 4)
        assert (out[0, :, :, :3] == [10, 0, 0]).all()  # frame 1: all A
        assert out[1, 0, 0].tolist() == [0, 20, 0, 255]  # B
        assert (out[1, :, :, 3].reshape(-1)[1:] == 0).all()  # cleared

    def test_disposal_3_restores_previous(self):
        # frame 1: full A (disposal 0); frame 2: B at (0,0) with
        # disposal 3; frame 3: C at (1,1). Frame 3 composited: A
        # everywhere (frame 2's B rolled back) except C at (1,1).
        body = (
            _frame(0, 0, 2, 2, [0, 0, 0, 0])
            + _gce(3) + _frame(0, 0, 1, 1, [1])
            + _gce(0) + _frame(1, 1, 1, 1, [2])
        )
        out = decode_gif(_wrap_gif(2, 2, 2, self.GCT, body), all_frames=True)
        assert out.shape[0] == 3
        assert out[1, 0, 0].tolist()[:3] == [0, 20, 0]  # B visible in f2
        assert out[2, 0, 0].tolist()[:3] == [10, 0, 0]  # rolled back to A
        assert out[2, 1, 1].tolist()[:3] == [0, 0, 30]  # C

    def test_local_color_table_overrides_global(self):
        lct = bytes([200, 0, 0, 0, 0, 200] + [0] * 6)
        body = _frame(0, 0, 2, 1, [0, 1], lct=lct)
        out = decode_gif(_wrap_gif(2, 1, 2, self.GCT, body))
        assert out[0, 0].tolist() == [200, 0, 0]
        assert out[0, 1].tolist() == [0, 0, 200]

    def test_truncation_contract_is_valueerror(self):
        # every byte-prefix of an animated blob must raise ValueError
        # (never IndexError/struct.error) or decode the FULL content
        base = _img(6, 7, mod=16)
        blob = encode_gif(np.stack([base, base[::-1]]), loop=True)
        full = decode_gif(blob, all_frames=True)
        for cut in range(6, len(blob)):
            try:
                got = decode_gif(blob[:cut], all_frames=True)
            except ValueError:
                continue
            assert (got == full).all(), f"silent partial decode at {cut}"
        # missing trailer alone is truncation
        with pytest.raises(ValueError, match="trailer"):
            decode_gif(blob[:-1], all_frames=True)
