"""Native GIF decode/encode (LZW) — no image library required.

Third real media format after PNG (``operators/png.py``) and WAV
(``operators/wav.py``): GIF87a/89a is a public format whose only
nontrivial part is LZW with variable-width codes. The decoder handles
global/local color tables, interlacing, multiple image descriptors
(first frame returned), and skips extension blocks; the encoder emits
a minimal single-frame GIF87a so tests can roundtrip without any
external library (the ``h5_mini_writer`` precedent).

Out of scope (raise, never misread): transparency compositing and
multi-frame animation assembly — frame COUNT is still reported so the
feature extractor can expose it.
"""

from __future__ import annotations

import struct

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)

GIF_MAGICS = (b"GIF87a", b"GIF89a")


class GifError(ValueError):
    pass


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW: variable code width, clear/end codes, MSB-packed
    little-endian bit order."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader
    bitpos = 0
    nbits = len(data) * 8

    def read(width):
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            if byte >> ((bitpos + i) & 7) & 1:
                v |= 1 << i
        bitpos += width
        return v

    table: list[bytes] = []

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    width = min_code_size + 1
    prev: bytes | None = None
    reset()
    while len(out) < expected:
        code = read(width)
        if code is None or code == end:
            break
        if code == clear:
            reset()
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GifError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_gif(b: bytes):
    """bytes → (width, height, n_frames, rgb_pixels) for the FIRST
    frame; ``rgb_pixels`` is a flat numpy uint8 array (h*w*3)."""
    import numpy as np

    if b[:6] not in GIF_MAGICS:
        raise GifError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    off = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        gct = np.frombuffer(b[off : off + 3 * n], dtype=np.uint8).reshape(n, 3)
        off += 3 * n
    first = None
    n_frames = 0
    while off < len(b):
        block = b[off]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: skip sub-blocks
            off += 2
            while off < len(b) and b[off] != 0:
                off += 1 + b[off]
            off += 1
            continue
        if block != 0x2C:
            raise GifError(f"unexpected block 0x{block:02x} at {off}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", b, off + 1)
        off += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x7)
            ct = np.frombuffer(b[off : off + 3 * n], dtype=np.uint8).reshape(
                n, 3
            )
            off += 3 * n
        if ct is None:
            raise GifError("no color table")
        min_code = b[off]
        off += 1
        data = bytearray()
        while off < len(b) and b[off] != 0:
            ln = b[off]
            data += b[off + 1 : off + 1 + ln]
            off += 1 + ln
        off += 1
        n_frames += 1
        if first is None:
            idx = np.frombuffer(
                bytes(_lzw_decode(min_code, bytes(data), iw * ih)), dtype=np.uint8
            )
            if len(idx) < iw * ih:
                raise GifError("truncated image data")
            idx = idx[: iw * ih]
            if iflags & 0x40:  # interlaced: de-interlace row order
                rows = idx.reshape(ih, iw)
                order = (
                    list(range(0, ih, 8))
                    + list(range(4, ih, 8))
                    + list(range(2, ih, 4))
                    + list(range(1, ih, 2))
                )
                out = np.empty_like(rows)
                out[order] = rows
                rows = out
                idx = rows.reshape(-1)
            first = (iw, ih, ct[np.clip(idx, 0, len(ct) - 1)].reshape(-1))
    if first is None:
        raise GifError("no image frame")
    w, h, px = first
    return w, h, n_frames, px


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    outbits = bytearray()
    acc = 0
    accn = 0

    def emit(code):
        nonlocal acc, accn
        acc |= code << accn
        accn += width
        while accn >= 8:
            outbits.append(acc & 0xFF)
            acc >>= 8
            accn -= 8

    emit(clear)
    run = b""
    for ch in indices:
        cand = run + bytes([ch])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        run = bytes([ch])
    if run:
        emit(table[run])
    emit(end)
    if accn:
        outbits.append(acc & 0xFF)
    return bytes(outbits)


def encode_gif(width: int, height: int, palette, indices) -> bytes:
    """Minimal single-frame GIF87a: ``palette`` is [(r,g,b), ...] (len a
    power of two ≥ 2), ``indices`` one palette index per pixel."""
    n = len(palette)
    if n & (n - 1) or n < 2:
        raise GifError("palette size must be a power of two >= 2")
    depth = n.bit_length() - 1
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    for r, g, b_ in palette:
        out += bytes((r, g, b_))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    min_code = max(2, depth)
    out.append(min_code)
    data = _lzw_encode(min_code, bytes(indices))
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
