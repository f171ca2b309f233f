"""Baseline JPEG decode: spec-pinned single-block streams, encoder
roundtrips, MJPG-in-AVI, and the corrupt-input error surface.

The hand-assembled streams in TestSpecPinned are built byte-by-byte in
the test (marker segments + manual Huffman bits) and checked against
closed-form ITU-T.81 math — they pin zigzag orientation, dequant
scaling, and IDCT normalization independently of encode_jpeg, so a
matched encoder/decoder bug cannot cancel out.
"""

import struct

import numpy as np
import pytest

from heavykeeper_rs_spark.operators.jpeg import (
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)
from heavykeeper_rs_spark.operators.multimodal import synth_image


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _bits_to_bytes(s: str) -> bytes:
    s += "1" * ((8 - len(s) % 8) % 8)  # T.81 pads entropy with 1-bits
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _single_block_jpeg(entropy_bits: str, q: int = 16) -> bytes:
    """8x8 grayscale, flat quant table q, tiny hand-rolled Huffman
    tables: DC categories 0..5 as the six len-3 codes 000..101, AC
    symbols EOB(0x00)='00' and 0x03 (run 0, size 3)='01'."""
    dc_bits = [0, 0, 6] + [0] * 13
    ac_bits = [0, 2] + [0] * 14
    return (
        b"\xff\xd8"
        + _seg(0xDB, b"\x00" + bytes([q] * 64))
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + _seg(0xC4, bytes([0x00] + dc_bits + [0, 1, 2, 3, 4, 5]))
        + _seg(0xC4, bytes([0x10] + ac_bits + [0x00, 0x03]))
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + _bits_to_bytes(entropy_bits)
        + b"\xff\xd9"
    )


class TestSpecPinned:
    def test_zigzag_head_matches_t81(self):
        # T.81 figure 5: scan starts (0,0)(0,1)(1,0)(2,0)(1,1)(0,2)...
        head = [(int(i) // 8, int(i) % 8) for i in _ZIGZAG[:6]]
        assert head == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
        assert sorted(_ZIGZAG.tolist()) == list(range(64))

    def test_dc_only_block_is_flat_at_closed_form_value(self):
        # DC category 3 (code '011'), magnitude bits '101' = 5, EOB '0'.
        # Orthonormal IDCT of a DC-only block: every sample =
        # dequantized_DC / 8, so pixel = round(5*16/8) + 128 = 138.
        img = decode_jpeg(_single_block_jpeg("011" + "101" + "00"))
        assert img.shape == (8, 8) and img.dtype == np.uint8
        assert (img == 138).all()

    def test_dc_negative_magnitude_sign_extension(self):
        # category 3, bits '010' = extend -> 2 - 8 + 1 = -5 -> 118.
        img = decode_jpeg(_single_block_jpeg("011" + "010" + "00"))
        assert (img == 118).all()

    def test_single_ac_coefficient_orientation_and_scale(self):
        # DC cat 0 ('000'); AC symbol 0x03 run=0 size=3 ('01'),
        # magnitude '111' = 7 at zigzag index 1 = spatial (0,1) —
        # HORIZONTAL frequency 1; then EOB '00'.
        img = decode_jpeg(_single_block_jpeg("000" + "01" + "111" + "00"))
        # rows constant (no vertical variation), columns follow
        # 128 + 7*16 * A[0,r]*A[1,c] = 128 + 112*cos((2c+1)pi/16)/(2*sqrt(8))
        c = np.arange(8)
        exp = np.clip(
            np.rint(128 + 112 * np.cos((2 * c + 1) * np.pi / 16) / (2 * np.sqrt(8))),
            0,
            255,
        ).astype(np.uint8)
        assert (img == img[0:1, :]).all()
        assert (img[0, :] == exp).all()


class TestRoundtrip:
    def test_constant_gray_exact(self):
        img = np.full((16, 24), 130, dtype=np.uint8)
        assert (decode_jpeg(encode_jpeg(img, quality=90)) == img).all()

    def test_rgb_444(self):
        img = synth_image(24, 33, 3)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        d = np.abs(out.astype(int) - img.astype(int))
        assert d.mean() < 4 and d.max() <= 40

    def test_rgb_420_smooth(self):
        y, x = np.mgrid[0:32, 0:48]
        img = np.stack(
            [(40 + x * 2), (60 + y * 3), (80 + x + y)], axis=2
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95, subsample=True))
        d = np.abs(out.astype(int) - img.astype(int))
        assert d.max() <= 8 and d.mean() < 2

    def test_odd_sizes_and_gray(self):
        img = synth_image(13, 17, 1)
        out = decode_jpeg(encode_jpeg(img, quality=92))
        assert out.shape == (13, 17)
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 4
        # odd sizes through the subsampled path too (pad + crop)
        rgb = synth_image(13, 17, 3)
        out = decode_jpeg(encode_jpeg(rgb, quality=92, subsample=True))
        assert out.shape == (13, 17, 3)

    def test_restart_markers_do_not_change_pixels(self):
        img = synth_image(24, 33, 3)
        base = decode_jpeg(encode_jpeg(img, quality=90))
        with_rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
        assert (base == with_rst).all()

    def test_dht_less_mjpeg_convention(self):
        # Strip the DHT segments: decode must fall back to the Annex K
        # tables (what AVI 'MJPG' streams rely on) and match exactly.
        full = encode_jpeg(synth_image(20, 28, 3), quality=90)
        out = bytearray(full[:2])
        pos = 2
        while pos < len(full):
            m = full[pos + 1]
            if m == 0xDA:
                out.extend(full[pos:])
                break
            (ln,) = struct.unpack_from(">H", full, pos + 2)
            if m != 0xC4:
                out.extend(full[pos : pos + 2 + ln])
            pos += 2 + ln
        assert (decode_jpeg(bytes(out)) == decode_jpeg(full)).all()


class TestErrorSurface:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n\x1a\nnope")

    def test_truncated_entropy_raises_or_decodes_partially(self):
        blob = encode_jpeg(synth_image(24, 33, 3), quality=90)
        with pytest.raises(ValueError):
            decode_jpeg(blob[: len(blob) // 4])

    def test_lossless_sof_rejected_with_clear_message(self):
        blob = bytearray(encode_jpeg(synth_image(16, 16, 3)))
        idx = blob.find(b"\xff\xc0")
        blob[idx + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless)
        with pytest.raises(ValueError, match="SOF marker 0xc3"):
            decode_jpeg(bytes(blob))

    def test_corrupt_huffman_prefix(self):
        # an undefined-prefix stream: AC table has only len-2 codes
        # 00/01; force prefix '11' by wiring magnitude bits into lookup
        with pytest.raises(ValueError):
            decode_jpeg(_single_block_jpeg("000" + "11"))

    def test_missing_quant_table(self):
        full = encode_jpeg(synth_image(8, 8, 1))
        out = bytearray()
        pos = 0
        data = bytes(full)
        out.extend(data[:2])
        pos = 2
        while pos < len(data):
            m = data[pos + 1]
            if m == 0xDA:
                out.extend(data[pos:])
                break
            (ln,) = struct.unpack_from(">H", data, pos + 2)
            if m != 0xDB:
                out.extend(data[pos : pos + 2 + ln])
            pos += 2 + ln
        with pytest.raises(ValueError, match="quantization"):
            decode_jpeg(bytes(out))


class TestMjpgAvi:
    def test_mjpg_avi_roundtrip_and_dispatch(self):
        from heavykeeper_rs_spark.operators.multimodal import (
            decode_avi,
            encode_avi,
            image_decoder,
            video_decoder,
        )

        y, x = np.mgrid[0:24, 0:32]
        frames = np.stack(
            [
                np.stack(
                    [(40 + x * 2 + i * 5) % 200 + 20, (60 + y * 3) % 200,
                     (80 + x + y) % 200],
                    axis=2,
                ).astype(np.uint8)
                for i in range(4)
            ]
        )
        blob = encode_avi(frames, codec="mjpg", quality=95)
        dec = decode_avi(blob)
        assert dec.shape == frames.shape
        assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 4
        summary = video_decoder(blob)
        assert summary[0] == 4 and summary[1] == 24 and summary[2] == 32
        # image_decoder dispatches on the JPEG magic without Pillow
        img = synth_image(20, 28, 3)
        out = image_decoder(encode_jpeg(img, quality=95))
        assert out.shape == img.shape


class TestProgressive:
    """SOF2 decode (full T.81 G.2 scan algebra). The encoder's
    progressive scan script reconstructs the quantized coefficients
    exactly, so decoded pixels must be BIT-IDENTICAL to the baseline
    encoding of the same image at the same quality — any error in
    spectral selection, successive approximation, refinement or EOB
    runs breaks the identity."""

    @pytest.mark.parametrize(
        "img,kw",
        [
            (synth_image(13, 17, 1), {}),
            (synth_image(24, 33, 3), {}),
            (synth_image(24, 33, 3), {"subsample": True}),
            (synth_image(40, 56, 3), {"quality": 55}),
            (synth_image(64, 96, 3), {"subsample": True, "quality": 85}),
        ],
        ids=["gray", "rgb444", "rgb420", "q55", "big420q85"],
    )
    def test_progressive_bit_identical_to_baseline(self, img, kw):
        base = decode_jpeg(encode_jpeg(img, **kw))
        prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
        assert (base == prog).all()

    def test_sparse_high_frequency_forces_zrl_and_eob_runs(self):
        # mostly-flat image with isolated impulses: long zero runs in
        # the 6-63 band (ZRL + corrections) and multi-block EOB runs
        img = np.full((48, 64), 120, dtype=np.uint8)
        img[5, 7] = 250
        img[37, 51] = 0
        base = decode_jpeg(encode_jpeg(img, quality=95))
        prog = decode_jpeg(encode_jpeg(img, quality=95, progressive=True))
        assert (base == prog).all()

    def test_progressive_through_image_decoder(self):
        from heavykeeper_rs_spark.operators.multimodal import image_decoder

        img = synth_image(20, 28, 3)
        blob = encode_jpeg(img, progressive=True)
        out = image_decoder(blob)
        assert (out == decode_jpeg(encode_jpeg(img))).all()

    def test_truncated_progressive_raises(self):
        blob = encode_jpeg(synth_image(24, 33, 3), progressive=True)
        with pytest.raises(ValueError):
            decode_jpeg(blob[: len(blob) // 3])

    def test_progressive_restart_unsupported_in_encoder(self):
        with pytest.raises(ValueError, match="restart"):
            encode_jpeg(synth_image(8, 8, 1), progressive=True,
                        restart_interval=2)


class TestReviewFixes:
    """Round-7 code-review findings on the decoder."""

    def test_unsupported_families_fall_to_pillow_gate(self):
        # 4:1:1 sampling and 4-component CMYK are LEGAL JPEGs this
        # decoder doesn't implement: they must raise the Unsupported
        # subclass (image_decoder's Pillow-fallback signal), while
        # corrupt input stays a plain ValueError
        from heavykeeper_rs_spark.operators.jpeg import UnsupportedJpegError

        blob = bytearray(encode_jpeg(synth_image(16, 16, 3)))
        idx = blob.find(b"\xff\xc0")
        blob[idx + 11] = 0x41  # comp 1 sampling 4x1
        with pytest.raises(UnsupportedJpegError):
            decode_jpeg(bytes(blob))
        # a WELL-FORMED 4-component (CMYK-shaped) SOF: extend the
        # segment with a 4th component and fix the length field
        blob = bytearray(encode_jpeg(synth_image(16, 16, 3)))
        seglen = struct.unpack_from(">H", blob, idx + 2)[0]
        insert_at = idx + 2 + seglen
        blob[idx + 2 : idx + 4] = struct.pack(">H", seglen + 3)
        blob[idx + 9] = 4
        blob[insert_at:insert_at] = bytes([4, 0x11, 1])
        with pytest.raises(UnsupportedJpegError):
            decode_jpeg(bytes(blob))
        # patching only the count (payload for 3) is CORRUPT, not gated
        blob = bytearray(encode_jpeg(synth_image(16, 16, 3)))
        blob[idx + 9] = 4
        with pytest.raises(ValueError, match="truncated SOF"):
            decode_jpeg(bytes(blob))
        # image_decoder: Unsupported -> NotImplementedError (no Pillow
        # here); corrupt -> ValueError (captured per-row, NOT Pillow)
        from heavykeeper_rs_spark.operators.multimodal import image_decoder

        blob = bytearray(encode_jpeg(synth_image(16, 16, 3)))
        blob[idx + 11] = 0x41
        with pytest.raises(NotImplementedError):
            image_decoder(bytes(blob))
        with pytest.raises(ValueError):
            image_decoder(b"\xff\xd8\xff\xe0 not-really-jpeg")

    def test_truncated_entropy_with_valid_eoi_raises(self):
        # cutting entropy bytes but keeping EOI used to decode garbage
        # silently (zero-fill reads valid Annex K symbols forever);
        # the overrun check must catch the fabricated bits
        blob = encode_jpeg(synth_image(24, 24, 3), quality=90)
        cut = blob[: blob.rfind(b"\xff\xd9") - 40] + b"\xff\xd9"
        with pytest.raises(ValueError, match="underrun|truncated"):
            decode_jpeg(cut)
        # progressive too
        blob = encode_jpeg(synth_image(24, 24, 3), progressive=True)
        cut = blob[: blob.rfind(b"\xff\xd9") - 25] + b"\xff\xd9"
        with pytest.raises(ValueError):
            decode_jpeg(cut)

    def test_ff_fill_bytes_before_markers_tolerated(self):
        # T.81 B.1.1.2: markers may be preceded by any number of FF
        # fill bytes
        blob = encode_jpeg(synth_image(16, 20, 3))
        idx = blob.find(b"\xff\xda")
        padded = blob[:idx] + b"\xff\xff\xff" + blob[idx:]
        assert (decode_jpeg(padded) == decode_jpeg(blob)).all()

    def test_increment_id_trailing_newline_rejected(self):
        from heavykeeper_rs_spark.fsutil import check_increment_id

        with pytest.raises(ValueError):
            check_increment_id("abc\n")
        assert check_increment_id("crawl-2026.08.18_a") == "crawl-2026.08.18_a"


class TestFailFast:
    def test_huge_dims_truncated_blob_fails_fast(self):
        # the VP8L hardening applied to JPEG: a tiny blob claiming
        # 2000x2000 used to burn seconds (quadratic to ~1h at 65535^2)
        # decoding fabricated zero bits before the end-of-scan check
        import time

        blob = bytearray(encode_jpeg(synth_image(16, 16, 3), quality=90))
        idx = blob.find(b"\xff\xc0")
        struct.pack_into(">HH", blob, idx + 5, 4000, 4000)  # h, w
        t0 = time.time()
        with pytest.raises(ValueError):
            decode_jpeg(bytes(blob))
        assert time.time() - t0 < 3.0
        # progressive too
        blob = bytearray(
            encode_jpeg(synth_image(16, 16, 3), progressive=True)
        )
        idx = blob.find(b"\xff\xc2")
        struct.pack_into(">HH", blob, idx + 5, 4000, 4000)
        t0 = time.time()
        with pytest.raises(ValueError):
            decode_jpeg(bytes(blob))
        assert time.time() - t0 < 3.0

    def test_unknown_scan_component_is_valueerror(self):
        blob = bytearray(encode_jpeg(synth_image(8, 8, 1)))
        idx = blob.find(b"\xff\xda")
        blob[idx + 5] = 99  # scan names component id 99
        with pytest.raises(ValueError, match="unknown component"):
            decode_jpeg(bytes(blob))
