"""FLAC decode: exact roundtrips (lossless ⇒ bit-equality), all four
stereo decorrelations, LPC + escape-partition hand-built frames, the
WAV cross-format feature pin, and the corrupt-input error surface."""

import struct
import wave as wave_mod
from io import BytesIO

import numpy as np
import pytest

from heavykeeper_rs_spark.operators.flac import (
    _crc8,
    _crc16,
    _MsbWriter,
    decode_flac,
    encode_flac,
    flac_decoder,
)


def _pcm(n=3000, seed=3, stereo=False):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    left = (3000 * np.sin(2 * np.pi * 440 * t / 16000)
            + rng.integers(-200, 200, n)).astype(np.int16)
    if not stereo:
        return left
    right = (left // 2 + rng.integers(-50, 50, n)).astype(np.int16)
    return np.stack([left, right], axis=1)


class TestRoundtrip:
    def test_mono_exact_with_partial_last_block(self):
        pcm = _pcm(4000)
        s, rate, bps = decode_flac(encode_flac(pcm, rate=16000, block_size=512))
        assert rate == 16000 and bps == 16 and s.shape == (4000, 1)
        assert (s[:, 0] == pcm).all()

    @pytest.mark.parametrize("mode", [None, "ls", "rs", "ms"])
    def test_stereo_decorrelations_exact(self, mode):
        st = _pcm(3000, stereo=True)
        s, _, _ = decode_flac(
            encode_flac(st, rate=22050, block_size=512, stereo_mode=mode)
        )
        assert (s == st).all()

    def test_constant_subframe(self):
        c = np.full(1000, -123, dtype=np.int16)
        s, _, _ = decode_flac(encode_flac(c, block_size=256))
        assert (s[:, 0] == c).all()

    def test_wav_cross_format_features_identical(self):
        from heavykeeper_rs_spark.operators.multimodal import (
            audio_decoder,
            wav_decoder,
        )

        st = _pcm(5000, stereo=True)
        buf = BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(st.astype("<i2").tobytes())
        wav_blob = buf.getvalue()
        flac_blob = encode_flac(st, rate=16000, stereo_mode="ms")
        wf = wav_decoder(wav_blob)
        ff = flac_decoder(flac_blob)
        assert np.allclose(wf, ff)  # lossless: identical PCM -> features
        # audio_decoder dispatches both formats
        assert np.allclose(audio_decoder(wav_blob), audio_decoder(flac_blob))


def _frame_header(wr, ch_code, bs):
    wr.bits(0x3FFE, 14)
    wr.bits(0, 2)
    wr.bits(7, 4)  # 16-bit block size field follows
    wr.bits(0, 4)
    wr.bits(ch_code, 4)
    wr.bits(4, 3)  # 16 bps
    wr.bits(0, 1)
    wr.bits(0, 8)  # frame number 0
    wr.bits(bs - 1, 16)
    wr.bits(_crc8(bytes(wr.out)), 8)


def _streaminfo(n, rate=8000, ch=1, bps=16, block=4096):
    packed = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
    body = (struct.pack(">HH", block, block) + b"\x00" * 6
            + packed.to_bytes(8, "big") + b"\x00" * 16)
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


class TestHandBuilt:
    def test_lpc_subframe(self):
        # LPC order 2, precision 5, shift 2, coeffs [3, -1]:
        # x[i] = resid[i] + ((3*x[i-1] - x[i-2]) >> 2)
        warm = [100, 110]
        resid = [5, -3, 0, 7]
        wr = _MsbWriter()
        _frame_header(wr, 0, 6)
        wr.bits(0, 1)
        wr.bits(32 + 1, 6)  # LPC order 2 = 0b100000 + (order-1)
        wr.bits(0, 1)  # no wasted bits
        for v in warm:
            wr.bits(v & 0xFFFF, 16)
        wr.bits(4, 4)  # precision-1 = 4 -> 5-bit coeffs
        wr.bits(2, 5)  # shift 2
        for c in (3, -1):
            wr.bits(c & 0x1F, 5)
        wr.bits(0, 2)  # rice method 0
        wr.bits(0, 4)  # partition order 0
        wr.bits(3, 4)  # rice parameter 3
        for v in resid:
            zz = (v << 1) if v >= 0 else ((-v) << 1) - 1
            q = zz >> 3
            if q:
                wr.bits(0, q)
            wr.bits(1, 1)
            wr.bits(zz & 7, 3)
        body = wr.flush()
        blob = _streaminfo(6) + body + struct.pack(">H", _crc16(body))
        s, _, _ = decode_flac(blob)
        exp = list(warm)
        for r in resid:
            exp.append(r + ((3 * exp[-1] - exp[-2]) >> 2))
        assert s[:, 0].tolist() == exp

    def test_escape_partition_raw_residuals(self):
        # FIXED order 0 with an ESCAPED partition: param 0b1111 then
        # 5-bit raw size; residuals are raw signed values == samples
        vals = [3, -7, 12, 0]
        wr = _MsbWriter()
        _frame_header(wr, 0, 4)
        wr.bits(0, 1)
        wr.bits(8, 6)  # FIXED order 0
        wr.bits(0, 1)
        wr.bits(0, 2)
        wr.bits(0, 4)
        wr.bits(15, 4)  # escape
        wr.bits(5, 5)  # raw 5-bit residuals
        for v in vals:
            wr.bits(v & 0x1F, 5)
        body = wr.flush()
        blob = _streaminfo(4) + body + struct.pack(">H", _crc16(body))
        s, _, _ = decode_flac(blob)
        assert s[:, 0].tolist() == vals


class TestErrorSurface:
    def test_not_flac(self):
        with pytest.raises(ValueError, match="fLaC"):
            decode_flac(b"RIFFxxxxWAVE")

    def test_truncated_raises(self):
        blob = encode_flac(_pcm(2000))
        with pytest.raises(ValueError):
            decode_flac(blob[: len(blob) // 2])

    def test_crc_mismatch_raises(self):
        blob = bytearray(encode_flac(_pcm(500)))
        blob[-3] ^= 0x40  # flip a bit inside the last frame body
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(blob))

    def test_spark_extract_features_mixed_audio(self, spark):
        from heavykeeper_rs_spark.operators.multimodal import (
            audio_decoder,
            extract_features,
            synth_wav,
        )

        rows = [
            (1, bytearray(synth_wav(440.0))),
            (2, bytearray(encode_flac(_pcm(2000), rate=16000))),
            (3, bytearray(b"fLaC truncated")),
        ]
        df = spark.createDataFrame(rows, "mid long, blob binary")
        got = {
            r["id"]: r
            for r in extract_features(
                df, "mid", "blob", decoder=audio_decoder
            ).collect()
        }
        assert got[1]["ok"] and got[2]["ok"] and not got[3]["ok"]
        assert got[2]["feature"][2] == 16000.0  # sample rate lane
