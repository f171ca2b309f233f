"""FLAC audio decode/encode with no external dependencies — the audio
analog of operators/jpeg.py and operators/webp.py: WAV decode has been
real since round 4 (stdlib ``wave``); this closes the dominant
LOSSLESS compressed-audio format with a pure-Python/NumPy decoder.

``decode_flac`` implements the FLAC format (RFC 9639): STREAMINFO
metadata, frame sync + header (block size / sample rate / channel
assignment / bit depth codes, UTF-8-coded frame numbers, CRC-8),
subframes (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32 with
quantized coefficients), Rice-coded residuals (4- and 5-bit parameter
partitions, escape codes, zigzag), wasted bits, and the four stereo
decorrelation modes (independent, left/side, right/side, mid/side).
Returns (samples int32 array shaped (n, channels), sample_rate).

``flac_decoder`` matches ``wav_decoder``'s feature contract
([duration_s, n_channels, sample_rate, rms, peak, zcr]) so
``extract_features`` runs on FLAC binary columns unchanged — a FLAC
and a WAV of the same PCM produce IDENTICAL features (lossless),
which is the cross-format test pin.

``encode_flac`` is the fixture producer: 16-bit PCM, FIXED predictors
(order chosen per frame from 0-2 by residual energy) with one Rice
partition — enough to exercise sync/header/CRC/Rice/zigzag/stereo
paths on real bytes; an LPC subframe is additionally hand-assembled
in the tests. Reference scope note: heavykeeper-rs has no media
surface; this extends SURVEY.md §2.3's multimodal row.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_BIT_DEPTHS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _MsbReader:
    """MSB-first bit reader (FLAC bit packing). Reads past the end
    raise immediately — FLAC frames are length-delimited by their own
    content, so fabricated bits are never legitimate."""

    __slots__ = ("data", "bitpos", "nbits_total")

    def __init__(self, data: bytes, start_byte: int = 0):
        self.data = data
        self.bitpos = 8 * start_byte
        self.nbits_total = 8 * len(data)

    def bits(self, n: int) -> int:
        if self.bitpos + n > self.nbits_total:
            raise ValueError("truncated FLAC stream")
        v = 0
        pos = self.bitpos
        data = self.data
        while n > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            v = (v << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0 bits until the terminating 1 bit."""
        q = 0
        pos = self.bitpos
        data = self.data
        total = self.nbits_total
        while True:
            if pos >= total:
                raise ValueError("truncated FLAC stream (unary run)")
            byte = data[pos >> 3]
            rem = 8 - (pos & 7)
            chunk = byte & ((1 << rem) - 1)
            if chunk == 0:
                q += rem
                pos += rem
                continue
            lead = rem - chunk.bit_length()
            q += lead
            pos += lead + 1
            self.bitpos = pos
            return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (
                crc << 1) & 0xFFFF
    return crc


def _read_utf8_number(br: _MsbReader) -> int:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0:
        raise ValueError("invalid UTF-8 frame number")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = br.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _MsbReader, block_size: int, order: int) -> np.ndarray:
    """Rice-coded residual: 2-bit method (4- or 5-bit parameters),
    partition order, escape code 0b1111/0b11111 -> raw n-bit."""
    method = br.bits(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.bits(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise ValueError("partition order does not divide block size")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(n_part):
        count = (block_size >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("predictor order exceeds first partition")
        param = br.bits(pbits)
        if param == escape:
            raw = br.bits(5)
            for i in range(count):
                out[idx + i] = br.signed(raw) if raw else 0
        else:
            for i in range(count):
                q = br.unary()
                r = br.bits(param) if param else 0
                zz = (q << param) | r
                out[idx + i] = (zz >> 1) ^ -(zz & 1)  # un-zigzag
        idx += count
    return out


def _read_subframe(br: _MsbReader, block_size: int, bps: int) -> np.ndarray:
    if br.bits(1):
        raise ValueError("subframe padding bit set (corrupt frame)")
    ftype = br.bits(6)
    wasted = 0
    if br.bits(1):  # wasted bits-per-sample flag
        wasted = 1 + br.unary()
        bps -= wasted
    if ftype == 0:  # CONSTANT
        v = br.signed(bps)
        out = np.full(block_size, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.fromiter(
            (br.signed(bps) for _ in range(block_size)),
            dtype=np.int64, count=block_size,
        )
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [br.signed(bps) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coeffs):
                pred += c * out[i - 1 - j]
            out[i] = resid[i - order] + pred
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        warm = [br.signed(bps) for _ in range(order)]
        precision = br.bits(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = br.signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coeffs = [br.signed(precision) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            acc = 0
            for j in range(order):
                acc += coeffs[j] * int(out[i - 1 - j])
            out[i] = resid[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(blob: bytes) -> "tuple[np.ndarray, int, int]":
    """(samples (n, channels) int32, sample_rate, bits_per_sample).
    Raises ValueError on corrupt/truncated input (per-row captured by
    the pipeline)."""
    if len(blob) < 42 or blob[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(blob):  # metadata blocks
        hdr = blob[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + blob[pos + 1 : pos + 4])
        body = blob[pos + 4 : pos + 4 + ln]
        if btype == 0:
            if len(body) < 34:
                raise ValueError("truncated STREAMINFO")
            packed = int.from_bytes(body[10:18], "big")
            streaminfo = {
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bps": ((packed >> 36) & 0x1F) + 1,
                "total": packed & ((1 << 36) - 1),
            }
        pos += 4 + ln
        if last:
            break
    if streaminfo is None or streaminfo["sample_rate"] == 0:
        raise ValueError("missing/invalid STREAMINFO")
    rate = streaminfo["sample_rate"]
    chunks = []
    while pos < len(blob):
        frame_start = pos
        br = _MsbReader(blob, pos)
        sync = br.bits(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {pos}")
        if br.bits(1):
            raise ValueError("reserved frame-header bit set")
        br.bits(1)  # blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        bd_code = br.bits(3)
        if br.bits(1):
            raise ValueError("reserved frame-header bit set")
        _read_utf8_number(br)
        if bs_code in (0,):
            raise ValueError("reserved block-size code")
        if bs_code == 6:
            block_size = br.bits(8) + 1
        elif bs_code == 7:
            block_size = br.bits(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        elif sr_code == 15:
            raise ValueError("invalid sample-rate code")
        bps = streaminfo["bps"] if bd_code == 0 else _BIT_DEPTHS.get(bd_code)
        if bps is None:
            raise ValueError("reserved bit-depth code")
        hdr_end = (br.bitpos + 7) >> 3
        if _crc8(blob[frame_start:hdr_end]) != br.bits(8):
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [_read_subframe(br, block_size, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):  # L/S, R/S, M/S — side gets +1 bit
            n_ch = 2
            if ch_code == 8:
                left = _read_subframe(br, block_size, bps)
                side = _read_subframe(br, block_size, bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:
                side = _read_subframe(br, block_size, bps + 1)
                right = _read_subframe(br, block_size, bps)
                subs = [side + right, right]
            else:  # mid/side: mid = (L+R)>>1 (floor), side = L-R
                mid = _read_subframe(br, block_size, bps)
                side = _read_subframe(br, block_size, bps + 1)
                m2 = (mid << 1) | (side & 1)  # restore the dropped LSB
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError("reserved channel assignment")
        br.align()
        frame_end = br.bitpos >> 3
        if frame_end + 2 > len(blob):
            raise ValueError("truncated FLAC frame footer")
        (crc,) = struct.unpack_from(">H", blob, frame_end)
        if _crc16(blob[frame_start:frame_end]) != crc:
            raise ValueError("frame CRC-16 mismatch")
        chunks.append(np.stack(subs, axis=1))
        pos = frame_end + 2
    if not chunks:
        raise ValueError("FLAC stream has no frames")
    samples = np.concatenate(chunks, axis=0)
    total = streaminfo["total"]
    if total:
        if samples.shape[0] < total:
            raise ValueError(
                "truncated FLAC stream (fewer samples than STREAMINFO total)"
            )
        samples = samples[:total]
    return samples.astype(np.int32), rate, streaminfo["bps"]


def flac_decoder(blob: bytes) -> np.ndarray:
    """``wav_decoder``-contract features from FLAC bytes:
    [duration_s, n_channels, sample_rate, rms, peak, zero_cross_rate]
    — a FLAC and a WAV of the same PCM produce IDENTICAL features
    (lossless), the cross-format pytest pin. Amplitudes normalize by
    2^(bps-1) to wav_decoder's [-1, 1] scale."""
    from heavykeeper_rs_spark.operators.multimodal import audio_features

    samples, rate, bps = decode_flac(blob)
    n, ch = samples.shape
    x = (samples.astype(np.float64) / float(1 << (bps - 1))).mean(axis=1)
    return audio_features(x, n, ch, rate)


# --------------------------------------------------------------- encoder


class _MsbWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        self.buf = (self.buf << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.buf >> self.nbits) & 0xFF)
        self.buf &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.bits(0, 8 - self.nbits)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number encoding: k continuation bytes
    carry 6 bits each, the lead byte carries 6-k payload bits under a
    (k+1)-one-bit prefix."""
    if n < 0x80:
        return bytes([n])
    for k in range(1, 6):
        if n < (1 << (6 - (k + 1) + 6 * k + 1)):
            prefix = (0xFF << (7 - k)) & 0xFF
            out = [prefix | (n >> (6 * k))]
            for i in range(k - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _rice_write(wr: _MsbWriter, resid: np.ndarray, param: int) -> None:
    for v in resid:
        v = int(v)
        zz = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        q = zz >> param
        if q:
            wr.bits(0, q)
        wr.bits(1, 1)
        if param:
            wr.bits(zz & ((1 << param) - 1), param)


def _write_subframe(wr: _MsbWriter, x: np.ndarray, bps: int) -> None:
    """CONSTANT when flat, else FIXED order 0-2 by residual energy,
    one Rice partition."""
    bs = x.shape[0]
    wr.bits(0, 1)
    if bs > 1 and (x == x[0]).all():
        wr.bits(0, 6)  # CONSTANT
        wr.bits(0, 1)
        wr.bits(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best_order, best_resid, best_cost = 0, None, None
    for order in (0, 1, 2):
        if bs <= order:
            continue
        r = x.copy().astype(np.int64)
        for _ in range(order):
            r = np.diff(r)
        cost = np.abs(r).sum()
        if best_resid is None or cost < best_cost:
            best_order, best_resid, best_cost = order, r, cost
    order, resid = best_order, best_resid
    wr.bits(8 + order, 6)  # FIXED
    wr.bits(0, 1)  # no wasted bits
    for i in range(order):
        wr.bits(int(x[i]) & ((1 << bps) - 1), bps)
    # residual: method 0 (4-bit parameters), partition order 0
    wr.bits(0, 2)
    wr.bits(0, 4)
    mean = max(1.0, float(np.abs(resid).mean()) if resid.size else 1.0)
    param = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
    wr.bits(param, 4)
    _rice_write(wr, resid, param)


def encode_flac(samples: np.ndarray, rate: int = 16000,
                block_size: int = 1024,
                stereo_mode: "str | None" = None) -> bytes:
    """Fixture producer: (n,) or (n, channels) int16 PCM -> FLAC bytes
    (CONSTANT or FIXED order 0-2 subframes, one Rice partition).
    ``stereo_mode`` in ('ls', 'rs', 'ms') writes the decorrelated
    channel assignments for 2-channel input (the side subframe carries
    bps+1 bits, per spec). Lossless: decode_flac returns the exact
    samples."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if not (1 <= ch <= 8) or n == 0:
        raise ValueError("expected (n, 1..8) samples")
    if arr.min() < -(1 << 15) or arr.max() >= (1 << 15):
        raise ValueError("fixture encoder is 16-bit PCM")
    if stereo_mode is not None and ch != 2:
        raise ValueError("stereo_mode needs 2-channel input")
    bps = 16
    packed = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
    # STREAMINFO: min/max block size (2B each), min/max frame size
    # (3B each, 0 = unknown), packed rate/ch/bps/total, md5 (unset)
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" + b"\x00\x00\x00"
        + packed.to_bytes(8, "big") + b"\x00" * 16
    )
    head = b"fLaC" + bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    frames = []
    frame_no = 0
    for start in range(0, n, block_size):
        blk = arr[start : start + block_size]
        bs = blk.shape[0]
        wr = _MsbWriter()
        wr.bits(0x3FFE, 14)
        wr.bits(0, 1)
        wr.bits(0, 1)  # fixed blocking
        wr.bits(7, 4)  # block size: 16-bit field follows
        wr.bits(0, 4)  # sample rate: from STREAMINFO
        ch_code = {None: ch - 1, "ls": 8, "rs": 9, "ms": 10}[stereo_mode]
        wr.bits(ch_code, 4)
        wr.bits(4, 3)  # 16 bps
        wr.bits(0, 1)
        for b in _utf8_number(frame_no):
            wr.bits(b, 8)
        wr.bits(bs - 1, 16)
        # header is byte-aligned here (14+1+1+4+4+4+3+1 = 32 bits +
        # whole utf8 bytes + 16) — append its CRC-8
        assert wr.nbits == 0
        wr.bits(_crc8(bytes(wr.out)), 8)
        if stereo_mode is None:
            for c in range(ch):
                _write_subframe(wr, blk[:, c], bps)
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if stereo_mode == "ls":
                _write_subframe(wr, left, bps)
                _write_subframe(wr, side, bps + 1)
            elif stereo_mode == "rs":
                _write_subframe(wr, side, bps + 1)
                _write_subframe(wr, right, bps)
            else:  # ms: mid = (L+R)>>1 (floor), side carries the LSB
                mid = (left + right) >> 1
                _write_subframe(wr, mid, bps)
                _write_subframe(wr, side, bps + 1)
        wr.align()
        body = wr.flush()
        frames.append(body + struct.pack(">H", _crc16(body)))
        frame_no += 1
    return head + b"".join(frames)
