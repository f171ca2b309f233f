"""The one variable-width LZW decoder core shared by the GIF and TIFF
codecs — the two formats differ ONLY in framing knobs, and a fix to
the dictionary/KwKwK/validity logic must reach both, so it lives in
exactly one place:

- GIF: LSB-first bit packing, variable root alphabet (``1 <<
  min_code_size`` roots), code width grows when ``next_code`` REACHES
  ``2^width`` (after the add).
- TIFF: MSB-first bit packing, fixed 256-byte root alphabet, the
  EARLY-CHANGE rule — width grows one code earlier, at ``next_code ==
  2^width - 1``.

Both use a STRING-TABLE dictionary (each entry stores its full byte
expansion, built as ``parent + first_byte_of_current`` — r8: the
parent-pointer chain walk emitted one Python-level byte per step; the
expansion table emits whole strings with C-level copies, ~4x faster,
and its total memory is bounded by ``expected`` + one byte per entry
since entry lengths sum to at most the bytes already emitted), the
clear/EOI conventions, and the KwKwK case (the only legal
not-yet-defined code is ``next_code`` when a previous code exists).
Decoding stops once ``expected`` units have been produced; a stream
that ends earlier raises ValueError (both callers' corrupt-capture
contract)."""

from __future__ import annotations


def lzw_decode(
    data: bytes,
    min_code_size: int,
    expected: int,
    msb_first: bool,
    early_change: bool,
) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    first_dyn = clear + 2
    max_entries = 4096
    grow_off = 1 if early_change else 0
    roots = [bytes((i,)) for i in range(clear)]
    table: list[bytes] = []  # dynamic entries, code = first_dyn + index
    out = bytearray()

    next_code, width, prev = first_dyn, min_code_size + 1, -1
    prev_s = b""
    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated LZW stream")
            if msb_first:
                buf = (buf << 8) | data[pos]
            else:
                buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        if msb_first:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            buf &= (1 << nbits) - 1
        else:
            code = buf & ((1 << width) - 1)
            buf >>= width
            nbits -= width
        if code == clear:
            table.clear()
            next_code, width, prev = first_dyn, min_code_size + 1, -1
            continue
        if code == eoi:
            break
        # the only legal not-yet-defined code is next_code (KwKwK)
        kwk = prev != -1 and code == next_code
        if (code > next_code or (code == next_code and not kwk)
                or code >= max_entries):
            raise ValueError("invalid LZW code (corrupt stream)")
        if kwk:
            s = prev_s + prev_s[:1]
        elif code < clear:
            s = roots[code]
        else:  # a defined dynamic entry (code != clear/eoi checked above)
            s = table[code - first_dyn]
        out += s
        if prev != -1 and next_code < max_entries:
            table.append(prev_s + s[:1])
            next_code += 1
            if next_code == (1 << width) - grow_off and width < 12:
                width += 1
        prev = code
        prev_s = s
    if len(out) < expected:
        raise ValueError("LZW stream ended before its expected length")
    return bytes(out[:expected])
