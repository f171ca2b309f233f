"""Lossless WebP (VP8L) decode/encode with no external dependencies.

``decode_webp`` walks the RIFF container and decodes VP8L payloads —
the full bitstream spec (RFC 9649 §4-5): LSB-first bit reading,
canonical Huffman codes (simple and code-length-coded, with the
16/17/18 RLE symbols and the max-symbol short form), meta-Huffman
group images, color cache, LZ77 backward references with the 120-entry
close-neighborhood distance mapping, and all four transforms
(predictor with its 14 modes, cross-color, subtract-green,
color-indexing with sub-byte bundling), applied inverse in reverse
read order. Lossy VP8 payloads raise ``UnsupportedWebpError`` —
``image_decoder`` routes those to the import-gated Pillow fallback,
like the arithmetic/lossless JPEG families.

``encode_webp_lossless`` is the fixture producer (the ``encode_png``
pattern): literal-only VP8L with complete canonical trees (green 232x8
+ 48x9 bits, r/b/a 256x8, distances 24x5 + 16x6 — Kraft-complete by
construction), optional subtract-green and one-block predictor
transforms so the transform machinery round-trips on real bytes.

Spec pinning: the distance neighborhood table is generated from the
spec's ordering (all offsets with y in 0..8, |x| <= 8, x > 0 when
y == 0, sorted by x^2 + y^2 with ties broken by larger y then larger
x); the pytest suite pins its head against the RFC's literal list and
spot-checks the libwebp packed-byte encoding ((y << 4) | (8 - x)).
LZ77/color-cache/prefix-code decoding is additionally pinned by
hand-assembled bitstreams in the tests, independent of the encoder.

The pixel loop is per-pixel Python — correct-first closure of the
format; media decode at cluster scale should ship libwebp/Pillow on
the executors and swap ``pil_image_decoder`` in, exactly as for codec
video. Reference scope note: heavykeeper-rs has no media surface;
this extends SURVEY.md §2.3's multimodal row.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedWebpError(ValueError):
    """Legal WebP this decoder does not implement (lossy VP8,
    animation). ``image_decoder`` routes these to the Pillow gate;
    plain ValueError means corrupt input (captured per-row)."""


# ------------------------------------------------------------- constants

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
# color-cache hash multiplier (spec): (0x1e35a7bd * pixel) >> (32 - bits)


def _distance_map() -> "list[tuple[int, int]]":
    """The 120 close-neighborhood (dx, dy) offsets for distance codes
    1..120, generated from the spec ordering; pinned in tests against
    the RFC list head and libwebp's packed bytes."""
    cands = []
    for y in range(0, 9):
        for x in range(-8, 9):
            if y == 0 and x <= 0:
                continue
            cands.append((x, y))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cands[:120]


_DIST_MAP = _distance_map()


# ------------------------------------------------------------ bit reader


class _LsbReader:
    """LSB-first bit reader (DEFLATE byte order). Reads past the end
    feed 0 bits; ``overrun()`` reports whether any fabricated bit was
    consumed — the truncation signal, as in operators/jpeg."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.buf |= b << self.nbits
            self.nbits += 8
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbits -= n
        return v

    def overrun(self) -> bool:
        return 8 * self.pos - self.nbits > 8 * len(self.data)


# --------------------------------------------------------------- huffman


class _Huff:
    """Canonical Huffman decoder. VP8L reads code bits one at a time,
    most-significant-code-bit first, from the LSB-first stream — so a
    lookahead of K raw bits indexes a DEFLATE-style table keyed on the
    bit-reversed code. ``nbits == 0`` encodes the single-symbol tree
    (zero bits consumed per symbol)."""

    __slots__ = ("lut", "mask", "nbits", "only")

    def __init__(self, lengths: "list[int]"):
        maxlen = max(lengths) if lengths else 0
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("empty Huffman tree (corrupt VP8L)")
        if len(used) == 1:
            self.nbits = 0
            self.only = used[0][1]
            self.lut = None
            self.mask = 0
            return
        kraft = sum(1 << (maxlen - ln) for ln, _ in used)
        if kraft != (1 << maxlen):
            raise ValueError("incomplete/oversubscribed Huffman tree")
        self.nbits = maxlen
        self.only = -1
        self.mask = (1 << maxlen) - 1
        # r8: one PACKED python-list LUT ((len << 16) | symbol) — the
        # per-symbol read did two NumPy scalar gathers + int() each;
        # list indexing returns ready ints (~2x on the pixel loop)
        lut_np = np.zeros(1 << maxlen, dtype=np.int64)
        code = 0
        prev_len = 0
        for ln, sym in sorted(used):
            code <<= ln - prev_len
            prev_len = ln
            rev = int(f"{code:0{ln}b}"[::-1], 2)  # bit-reversed code
            step = 1 << ln
            lut_np[rev :: step] = (ln << 16) | sym
            code += 1
        self.lut = lut_np.tolist()

    @classmethod
    def single(cls, symbol: int) -> "_Huff":
        """Zero-bit tree for the one-symbol case (simple codes, and
        degenerate code-length codes)."""
        h = cls.__new__(cls)
        h.nbits = 0
        h.only = symbol
        h.lut = None
        h.mask = 0
        return h

    def read(self, br: _LsbReader) -> int:
        if self.nbits == 0:
            return self.only
        while br.nbits < self.nbits and br.pos < len(br.data):
            br.buf |= br.data[br.pos] << br.nbits
            br.pos += 1
            br.nbits += 8
        v = self.lut[br.buf & self.mask]
        ln = v >> 16
        if ln == 0 or ln > br.nbits:
            if ln == 0:
                raise ValueError("invalid Huffman prefix (corrupt VP8L)")
            br.bits(ln)  # triggers zero-fill + overrun accounting
        else:
            br.buf >>= ln
            br.nbits -= ln
        return v & 0xFFFF


def _read_code_lengths(br, cl_huff, num_symbols, max_symbol) -> "list[int]":
    lengths = [0] * num_symbols
    prev = 8
    symbol = 0
    while symbol < num_symbols and max_symbol > 0:
        max_symbol -= 1
        cl = cl_huff.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.bits(2), prev
            elif cl == 17:
                repeat, fill = 3 + br.bits(3), 0
            else:
                repeat, fill = 11 + br.bits(7), 0
            if symbol + repeat > num_symbols:
                raise ValueError("code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_huffman(br: _LsbReader, alphabet_size: int) -> _Huff:
    if br.bits(1):  # simple code: 1 or 2 symbols
        num = br.bits(1) + 1
        first_8bit = br.bits(1)
        s0 = br.bits(8 if first_8bit else 1)
        if num == 1:
            if s0 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            return _Huff.single(s0)  # 0 bits per read
        lengths = [0] * alphabet_size
        s1 = br.bits(8)
        if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
            raise ValueError("simple-code symbols invalid")
        lengths[s0] = lengths[s1] = 1
        return _Huff(lengths)
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    if sum(cl_lengths) == 0:
        raise ValueError("empty code-length code")
    if sum(1 for v in cl_lengths if v) == 1:
        cl_huff = _Huff.single(next(i for i, v in enumerate(cl_lengths) if v))
    else:
        cl_huff = _Huff(cl_lengths)
    if br.bits(1):  # use max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("max-symbol exceeds the alphabet (corrupt VP8L)")
    else:
        max_symbol = alphabet_size
    lengths = _read_code_lengths(br, cl_huff, alphabet_size, max_symbol)
    return _Huff(lengths)


# ----------------------------------------------------------- image decode


def _prefix_value(code: int, br: _LsbReader) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §4.2.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _decode_entropy_coded(br, w, h, is_level0):
    """One entropy-coded image (main image or transform/meta
    subimage): optional color cache, optional meta-Huffman (level 0
    only), Huffman groups, then the literal/backref/cache pixel loop.
    Returns (h*w,) uint32 ARGB."""
    cache_bits = 0
    meta = None
    meta_bits = 0
    n_groups = 1
    if br.bits(1):  # color-cache-info comes FIRST (RFC 9649 §5 ABNF)
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache size {cache_bits}")
    if is_level0 and br.bits(1):  # meta-Huffman image
        meta_bits = br.bits(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_px = _decode_entropy_coded(br, mw, mh, False)
        meta = ((meta_px >> np.uint32(8)) & np.uint32(0xFFFF)).astype(np.int64)
        n_groups = int(meta.max()) + 1
        meta = meta.reshape(mh, mw)
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_huffman(br, green_size),
                _read_huffman(br, 256),  # red
                _read_huffman(br, 256),  # blue
                _read_huffman(br, 256),  # alpha
                _read_huffman(br, 40),  # distance
            )
        )
    # r8: pixels live in an array('I') during decode — the loop does
    # one scalar write per pixel (plus backref reads), and stdlib-array
    # element access is ~3x cheaper than NumPy scalar indexing at the
    # same 4 bytes/pixel; the color cache is a plain list. Converted
    # to ndarray once at the end.
    from array import array

    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_len = len(cache) if cache is not None else 0
    cache_shift = 32 - cache_bits if cache_bits else 0
    total = w * h
    px = array("I", bytes(4 * total))
    pos = 0
    g = groups[0]
    single = n_groups == 1 and meta is None
    g0, g1, g2, g3, g4 = g
    # r8 inline fast path (single-group images — which includes every
    # transform/meta subimage): the four per-literal Huffman reads run
    # on LOCAL reader state with the packed-list LUTs; the method-call
    # _Huff.read was ~2/3 of decode. Rare paths (group switch, LZ77
    # helpers, refill-past-end) sync the locals back into the reader
    # and use the shared code, so semantics — including the zero-fill
    # overrun accounting — are byte-identical.
    datab = br.data
    dlen = len(datab)
    buf = br.buf
    nbits = br.nbits
    bp = br.pos
    while pos < total:
        if pos & 0xFFF == 0 and (bp << 3) - nbits > (dlen << 3):
            # fail FAST on truncation: fabricated zero bits decode as
            # valid literals forever, and a tiny blob claiming 16k x
            # 16k dims would otherwise burn minutes before the whole
            # final overrun check (found by review; bounded to ~4k px)
            raise ValueError("truncated VP8L stream (entropy underrun)")
        if not single:
            y, x = divmod(pos, w)
            g0, g1, g2, g3, g4 = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        # --- inline g0.read ---
        nb = g0.nbits
        if nb == 0:
            s = g0.only
        else:
            while nbits < nb and bp < dlen:
                buf |= datab[bp] << nbits
                bp += 1
                nbits += 8
            v = g0.lut[buf & g0.mask]
            ln = v >> 16
            if ln == 0 or ln > nbits:
                if ln == 0:
                    raise ValueError("invalid Huffman prefix (corrupt VP8L)")
                br.buf, br.nbits, br.pos = buf, nbits, bp
                br.bits(ln)  # zero-fill + overrun accounting
                buf, nbits, bp = br.buf, br.nbits, br.pos
            else:
                buf >>= ln
                nbits -= ln
            s = v & 0xFFFF
        if s < 256:
            pixel = s << 8
            for shift, tree in ((16, g1), (0, g2), (24, g3)):
                nb = tree.nbits
                if nb == 0:
                    c = tree.only
                else:
                    while nbits < nb and bp < dlen:
                        buf |= datab[bp] << nbits
                        bp += 1
                        nbits += 8
                    v = tree.lut[buf & tree.mask]
                    ln = v >> 16
                    if ln == 0 or ln > nbits:
                        if ln == 0:
                            raise ValueError(
                                "invalid Huffman prefix (corrupt VP8L)")
                        br.buf, br.nbits, br.pos = buf, nbits, bp
                        br.bits(ln)
                        buf, nbits, bp = br.buf, br.nbits, br.pos
                    else:
                        buf >>= ln
                        nbits -= ln
                    c = v & 0xFFFF
                pixel |= c << shift
            px[pos] = pixel
            if cache is not None:
                cache[(pixel * 0x1E35A7BD & 0xFFFFFFFF) >> cache_shift] = pixel
            pos += 1
        elif s < 280:
            br.buf, br.nbits, br.pos = buf, nbits, bp
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(g4.read(br), br)
            buf, nbits, bp = br.buf, br.nbits, br.pos
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise ValueError("LZ77 reference out of range (corrupt VP8L)")
            if cache is None:
                # C-level block copies in dist-sized chunks: each
                # chunk's source span ends at (or before) the write
                # cursor, so overlap degenerates to repeating the
                # dist-sized period exactly as the scalar loop would
                while length:
                    n_copy = min(length, dist)
                    px[pos : pos + n_copy] = px[pos - dist : pos - dist + n_copy]
                    pos += n_copy
                    length -= n_copy
            else:
                for _ in range(length):  # sequential: overlap is legal
                    pixel = px[pos - dist]
                    px[pos] = pixel
                    cache[(pixel * 0x1E35A7BD & 0xFFFFFFFF) >> cache_shift] = pixel
                    pos += 1
        else:
            if cache is None:
                raise ValueError("color-cache symbol without a cache")
            idx = s - 280
            if idx >= cache_len:
                raise ValueError("color-cache index out of range")
            px[pos] = cache[idx]
            pos += 1
    br.buf, br.nbits, br.pos = buf, nbits, bp  # the caller reads on
    return np.frombuffer(px, dtype=np.uint32).copy()


# -------------------------------------------------------------- transforms


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _unpack(p: int) -> "tuple[int, int, int, int]":
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    """The 14 VP8L spatial predictors (RFC 9649 §4.3.1), per-pixel."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    la, lr, lg, lb = _unpack(l)
    ta, tr_, tg, tb = _unpack(t)
    if mode == 5:
        xa, xr, xg, xb = _unpack(tr)
        return _pack(
            _avg2(_avg2(la, xa), ta), _avg2(_avg2(lr, xr), tr_),
            _avg2(_avg2(lg, xg), tg), _avg2(_avg2(lb, xb), tb),
        )
    ca, cr, cg, cb = _unpack(tl)
    if mode == 6:
        return _pack(_avg2(la, ca), _avg2(lr, cr), _avg2(lg, cg), _avg2(lb, cb))
    if mode == 7:
        return _pack(_avg2(la, ta), _avg2(lr, tr_), _avg2(lg, tg), _avg2(lb, tb))
    if mode == 8:
        return _pack(_avg2(ca, ta), _avg2(cr, tr_), _avg2(cg, tg), _avg2(cb, tb))
    xa, xr, xg, xb = _unpack(tr)
    if mode == 9:
        return _pack(_avg2(ta, xa), _avg2(tr_, xr), _avg2(tg, xg), _avg2(tb, xb))
    if mode == 10:
        return _pack(
            _avg2(_avg2(la, ca), _avg2(ta, xa)),
            _avg2(_avg2(lr, cr), _avg2(tr_, xr)),
            _avg2(_avg2(lg, cg), _avg2(tg, xg)),
            _avg2(_avg2(lb, cb), _avg2(tb, xb)),
        )
    if mode == 11:  # Select: the gradient-closer of L and T
        p = (la + ta - ca, lr + tr_ - cr, lg + tg - cg, lb + tb - cb)
        p_l = sum(abs(p[i] - c) for i, c in enumerate((la, lr, lg, lb)))
        p_t = sum(abs(p[i] - c) for i, c in enumerate((ta, tr_, tg, tb)))
        return l if p_l < p_t else t
    if mode == 12:  # ClampAddSubtractFull
        return _pack(
            min(max(la + ta - ca, 0), 255), min(max(lr + tr_ - cr, 0), 255),
            min(max(lg + tg - cg, 0), 255), min(max(lb + tb - cb, 0), 255),
        )
    if mode == 13:  # ClampAddSubtractHalf
        def h(a, b, c):
            m = _avg2(a, b)
            v = m + int((m - c) / 2)  # C truncation toward zero
            return min(max(v, 0), 255)

        return _pack(h(la, ta, ca), h(lr, tr_, cr), h(lg, tg, cg),
                     h(lb, tb, cb))
    raise ValueError(f"invalid predictor mode {mode}")


def _inv_predictor(px: np.ndarray, w: int, h: int, modes: np.ndarray,
                   size_bits: int) -> None:
    """In-place inverse predictor transform: residual + prediction mod
    256 per channel, sequential (prediction uses FINAL neighbors).
    Edge rules: (0,0) uses black, row 0 uses L, column 0 uses T; the
    top-right of the last column is the first pixel of the SAME row
    (the rows-are-contiguous convention libwebp decodes with)."""
    for y in range(h):
        row = y * w
        for x in range(w):
            pos = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(px[pos - 1])
            elif x == 0:
                pred = int(px[pos - w])
            else:
                mode = int(modes[y >> size_bits, x >> size_bits]) >> 8 & 0xFF
                tr = int(px[pos - w + 1]) if x + 1 < w else int(px[row])
                pred = _predict(
                    mode, int(px[pos - 1]), int(px[pos - w]),
                    int(px[pos - w - 1]), tr,
                )
            p = int(px[pos])
            px[pos] = (
                (((p >> 24) + (pred >> 24)) & 0xFF) << 24
                | (((p >> 16) + (pred >> 16)) & 0xFF) << 16
                | (((p >> 8) + (pred >> 8)) & 0xFF) << 8
                | ((p + pred) & 0xFF)
            )


def _delta(t: int, c: int) -> int:
    """ColorTransformDelta: (signed int8 t * signed int8 c) >> 3? No —
    >> 5 per the spec; both operands sign-extended."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(px: np.ndarray, w: int, h: int,
                         cte: np.ndarray, size_bits: int) -> None:
    """Inverse cross-color transform (RFC 9649 §4.3.2): red +=
    delta(g2r, green); blue += delta(g2b, green) + delta(r2b, red')
    with red' the UPDATED red — all mod 256, element picked per
    block."""
    for y in range(h):
        row = y * w
        for x in range(w):
            pos = row + x
            e = int(cte[y >> size_bits, x >> size_bits])
            g2r = e & 0xFF          # blue channel of the element
            g2b = (e >> 8) & 0xFF   # green channel
            r2b = (e >> 16) & 0xFF  # red channel
            p = int(px[pos])
            green = (p >> 8) & 0xFF
            red = (((p >> 16) & 0xFF) + _delta(g2r, green)) & 0xFF
            blue = ((p & 0xFF) + _delta(g2b, green) + _delta(r2b, red)) & 0xFF
            px[pos] = (p & 0xFF00FF00) | (red << 16) | blue


def _inv_subtract_green(px: np.ndarray) -> None:
    g = (px >> np.uint32(8)) & np.uint32(0xFF)
    r = (((px >> np.uint32(16)) & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    b = ((px & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    px &= np.uint32(0xFF00FF00)
    px |= (r << np.uint32(16)) | b


def _inv_color_indexing(px: np.ndarray, w: int, h: int, palette: np.ndarray,
                        width_bits: int) -> np.ndarray:
    """Palette lookup, unbundling sub-byte indices when the palette is
    small (<=16 colors pack 2-8 indices per green byte). Out-of-range
    indices decode as 0x00000000, the libwebp convention."""
    n_pal = palette.shape[0]
    lut = np.zeros(256, dtype=np.uint32)
    lut[:n_pal] = palette
    if width_bits == 0:
        # a green byte is always a valid lut index (256 entries);
        # out-of-palette indices decode to 0 below
        idx = (px >> np.uint32(8)) & np.uint32(0xFF)
        out = lut[idx.astype(np.int64)]
        out[idx >= n_pal] = 0
        return out
    bpp = 8 >> width_bits
    mask = (1 << bpp) - 1
    packed_w = -(-w // (1 << width_bits))
    packed = ((px >> np.uint32(8)) & np.uint32(0xFF)).reshape(h, packed_w)
    xs = np.arange(w)
    shifts = ((xs & ((1 << width_bits) - 1)) * bpp).astype(np.uint32)
    cols = (xs >> width_bits).astype(np.int64)
    idx = (packed[:, cols] >> shifts[None, :]) & np.uint32(mask)
    out = lut[np.minimum(idx, n_pal - 1).astype(np.int64)]
    out[idx >= n_pal] = 0
    return out.reshape(-1)


# ------------------------------------------------------------- top level


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload to (H, W, 3) RGB or (H, W, 4) RGBA
    uint8 (alpha kept only when some pixel is non-opaque)."""
    if len(payload) < 5 or payload[0] != 0x2F:
        raise ValueError("not a VP8L payload (bad signature)")
    br = _LsbReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint (content decides below)
    if br.bits(3) != 0:
        raise UnsupportedWebpError("unknown VP8L version")
    transforms = []  # (type, data) in read order
    seen = set()
    data_w = w  # color-indexing bundling shrinks the coded width
    while br.bits(1):
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / cross-color
            size_bits = br.bits(3) + 2
            bw = -(-data_w // (1 << size_bits))
            bh = -(-h // (1 << size_bits))
            sub = _decode_entropy_coded(br, bw, bh, False).reshape(bh, bw)
            transforms.append((ttype, (sub, size_bits)))
        elif ttype == 2:  # subtract green
            transforms.append((2, None))
        else:  # color indexing
            n_pal = br.bits(8) + 1
            pal = _decode_entropy_coded(br, n_pal, 1, False)
            # palette entries are delta-coded per channel mod 256
            a = (pal >> np.uint32(24)) & np.uint32(0xFF)
            r = (pal >> np.uint32(16)) & np.uint32(0xFF)
            g = (pal >> np.uint32(8)) & np.uint32(0xFF)
            b = pal & np.uint32(0xFF)
            for ch in (a, r, g, b):
                np.cumsum(ch, out=ch)
                ch &= np.uint32(0xFF)
            pal = (a << np.uint32(24)) | (r << np.uint32(16)) | (
                g << np.uint32(8)) | b
            if n_pal <= 2:
                width_bits = 3
            elif n_pal <= 4:
                width_bits = 2
            elif n_pal <= 16:
                width_bits = 1
            else:
                width_bits = 0
            data_w = -(-data_w // (1 << width_bits))
            transforms.append((3, (pal, width_bits)))
    px = _decode_entropy_coded(br, data_w, h, True)
    if br.overrun():
        raise ValueError("truncated VP8L stream (entropy underrun)")
    cur_w = data_w
    for ttype, tdata in reversed(transforms):
        if ttype == 3:
            pal, width_bits = tdata
            px = _inv_color_indexing(px, w, h, pal, width_bits)
            cur_w = w
        elif ttype == 2:
            _inv_subtract_green(px)
        elif ttype == 1:
            sub, size_bits = tdata
            _inv_color_transform(px, cur_w, h, sub, size_bits)
        else:
            sub, size_bits = tdata
            _inv_predictor(px, cur_w, h, sub, size_bits)
    if cur_w != w:
        raise ValueError("color-indexing transform missing (corrupt VP8L)")
    a = ((px >> np.uint32(24)) & np.uint32(0xFF)).astype(np.uint8)
    r = ((px >> np.uint32(16)) & np.uint32(0xFF)).astype(np.uint8)
    g = ((px >> np.uint32(8)) & np.uint32(0xFF)).astype(np.uint8)
    b = (px & np.uint32(0xFF)).astype(np.uint8)
    if (a != 255).any():
        return np.stack([r, g, b, a], axis=1).reshape(h, w, 4)
    return np.stack([r, g, b], axis=1).reshape(h, w, 3)


def decode_webp(blob: bytes) -> np.ndarray:
    """RIFF walk: decode the VP8L chunk (directly or inside a VP8X
    extended container). Lossy 'VP8 ' and animations raise
    UnsupportedWebpError (the Pillow-gate signal)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP blob")
    pos = 12
    n = len(blob)
    while pos + 8 <= n:
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        start = pos + 8
        end = min(start + size, n)
        if fourcc == b"VP8L":
            if end - start < size:
                raise ValueError("truncated VP8L chunk")
            return decode_vp8l(blob[start:end])
        if fourcc == b"VP8 ":
            raise UnsupportedWebpError(
                "lossy VP8 WebP needs a codec library (Pillow/libwebp)"
            )
        if fourcc == b"ANIM" or fourcc == b"ANMF":
            raise UnsupportedWebpError("animated WebP is not supported")
        # VP8X and metadata chunks: keep walking to the image chunk
        pos = start + size + (size & 1)
    raise ValueError("WebP has no image chunk")


# --------------------------------------------------------------- encoder


class _LsbWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        self.buf |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def code(self, c: int, ln: int) -> None:
        """Canonical Huffman code: most-significant code bit first —
        the bit order the VP8L reader reconstructs codes in."""
        for b in range(ln - 1, -1, -1):
            self.bits((c >> b) & 1, 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nbits = 0
        return bytes(self.out)


def _canonical_codes(lengths: "list[int]") -> "dict[int, tuple[int, int]]":
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev = 0
    for ln, sym in sorted((ln, s) for s, ln in enumerate(lengths) if ln):
        code <<= ln - prev
        prev = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def _write_tree(wr: _LsbWriter, lengths: "list[int]", cl_syms) -> dict:
    """Full (code-length-coded) tree whose symbol lengths all lie in
    ``cl_syms`` (1-2 distinct values; a dummy second CL symbol keeps
    the CL code complete when only one is used). Returns the canonical
    symbol->(code,len) map for the pixel writer."""
    a = cl_syms[0]
    b = cl_syms[1] if len(cl_syms) > 1 else (0 if a != 0 else 1)
    wr.bits(0, 1)  # not simple
    order_idx = {sym: i for i, sym in enumerate(_CL_ORDER)}
    n = max(4, order_idx[a] + 1, order_idx[b] + 1)
    wr.bits(n - 4, 4)
    cl_len = [0] * 19
    cl_len[a] = cl_len[b] = 1
    for i in range(n):
        wr.bits(cl_len[_CL_ORDER[i]], 3)
    wr.bits(0, 1)  # no max-symbol short form: every slot coded
    cl_codes = _canonical_codes(cl_len)
    for ln in lengths:
        c, length = cl_codes[ln]
        wr.code(c, length)
    return _canonical_codes(lengths)


# complete-by-construction length vectors (Kraft sums to exactly 1)
_GREEN_LENGTHS = [8] * 232 + [9] * 48  # 280 = 256 literals + 24 lengths
_BYTE_LENGTHS = [8] * 256
_DIST_LENGTHS = [5] * 24 + [6] * 16


def _write_literal_image(wr: _LsbWriter, argb: np.ndarray) -> None:
    """One non-level0 entropy-coded image (a transform subimage),
    literal-only: the cache bit, then the shared trees+pixels body
    (subimages carry no meta-Huffman bit)."""
    wr.bits(0, 1)  # no color cache
    _write_literal_image_main(wr, argb)


def encode_webp_lossless(
    img: np.ndarray,
    subtract_green: bool = False,
    predictor: "int | None" = None,
) -> bytes:
    """Fixture producer: (H, W) gray, (H, W, 3) RGB or (H, W, 4) RGBA
    uint8 -> lossless WebP bytes (literal-only VP8L). ``subtract_green``
    and ``predictor=<mode>`` (one whole-image block) exercise the
    transform machinery on real bytes; decode is bit-exact either way.
    Real corpora supply real blobs — this exists so the decoder runs on
    genuine VP8L streams with no codec libs."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ValueError("expected (H, W[, 3|4]) uint8")
    h, w = arr.shape[0], arr.shape[1]
    if not (1 <= w <= 512 and 1 <= h <= 512):
        raise ValueError("fixture encoder supports 1..512 per side")
    if subtract_green and predictor is not None:
        raise ValueError("fixture encoder: one transform at a time")
    a = (arr[:, :, 3] if arr.shape[2] == 4
         else np.full((h, w), 255, np.uint8)).astype(np.uint32)
    r = arr[:, :, 0].astype(np.uint32)
    g = arr[:, :, 1].astype(np.uint32)
    b = arr[:, :, 2].astype(np.uint32)
    argb = (a << 24) | (r << 16) | (g << 8) | b

    wr = _LsbWriter()
    wr.bits(w - 1, 14)
    wr.bits(h - 1, 14)
    wr.bits(int((a != 255).any()), 1)
    wr.bits(0, 3)  # version
    if subtract_green:
        wr.bits(1, 1)
        wr.bits(2, 2)  # transform type: subtract green
        rr = (r - g) & 0xFF
        bb = (b - g) & 0xFF
        argb = (a << 24) | (rr << 16) | (g << 8) | bb
    elif predictor is not None:
        if not 0 <= predictor <= 13:
            raise ValueError("predictor mode 0..13")
        size_bits = 2
        while (1 << size_bits) < max(w, h):
            size_bits += 1
        wr.bits(1, 1)
        wr.bits(0, 2)  # transform type: predictor
        wr.bits(size_bits - 2, 3)
        sub = np.array([[0xFF000000 | (predictor << 8)]], dtype=np.uint32)
        _write_literal_image(wr, sub)  # 1x1 mode image
        res = np.zeros_like(argb)
        flat = argb.reshape(-1)
        for y in range(h):
            for x in range(w):
                pos = y * w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(flat[pos - 1])
                elif x == 0:
                    pred = int(flat[pos - w])
                else:
                    tr = int(flat[pos - w + 1]) if x + 1 < w else int(
                        flat[y * w])
                    pred = _predict(predictor, int(flat[pos - 1]),
                                    int(flat[pos - w]),
                                    int(flat[pos - w - 1]), tr)
                p = int(flat[pos])
                res.reshape(-1)[pos] = (
                    (((p >> 24) - (pred >> 24)) & 0xFF) << 24
                    | (((p >> 16) - (pred >> 16)) & 0xFF) << 16
                    | (((p >> 8) - (pred >> 8)) & 0xFF) << 8
                    | ((p - pred) & 0xFF)
                )
        argb = res
    wr.bits(0, 1)  # end of transforms
    # main-image body in spec order: color-cache bit FIRST, then the
    # level-0-only meta-Huffman bit, then the prefix codes
    wr.bits(0, 1)  # no color cache
    wr.bits(0, 1)  # no meta-Huffman
    _write_literal_image_main(wr, argb)
    payload = b"\x2f" + wr.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _write_literal_image_main(wr: _LsbWriter, argb: np.ndarray) -> None:
    """Main-image body AFTER the cache/meta bits were written by the
    caller in spec order (cache first, then meta)."""
    green = _write_tree(wr, _GREEN_LENGTHS, (8, 9))
    red = _write_tree(wr, _BYTE_LENGTHS, (8,))
    blue = _write_tree(wr, _BYTE_LENGTHS, (8,))
    alpha = _write_tree(wr, _BYTE_LENGTHS, (8,))
    _write_tree(wr, _DIST_LENGTHS, (5, 6))
    for p in argb.reshape(-1):
        p = int(p)
        c, ln = green[(p >> 8) & 0xFF]
        wr.code(c, ln)
        c, ln = red[(p >> 16) & 0xFF]
        wr.code(c, ln)
        c, ln = blue[p & 0xFF]
        wr.code(c, ln)
        c, ln = alpha[(p >> 24) & 0xFF]
        wr.code(c, ln)
