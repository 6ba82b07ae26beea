"""Pure-Python PNG decoder for the media feature-extraction path.

The container ships no PIL, but PNG is a fully public format (RFC 2083 /
W3C PNG spec) whose compression is stdlib ``zlib`` — so the engine can
decode real PNG pixels natively: chunk walk → IHDR geometry → IDAT
inflate → per-scanline unfilter (all five filter types) → pixel array.

Scope: the overwhelmingly common web/training-corpus shapes — 8-bit
greyscale (color type 0), RGB (2), palette (3), grey+alpha (4), RGBA
(6), non-interlaced. 16-bit depth and Adam7 interlace raise
``NotImplementedError`` (rare in training corpora; a real cluster would
route those through a library decoder).

Runs inside the Arrow-batched ``mapInPandas`` extractor
(``multimodal.decode_image_features``) — one decode per blob, numpy
vectorized unfiltering per scanline.
"""

from __future__ import annotations

import struct
import zlib

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)  # runs inside mapInPandas on workers

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → samples/pixel


def decode_png(data: bytes):
    """PNG bytes → ``(width, height, channels, pixels)`` with ``pixels``
    a flat ``numpy.uint8`` array of length w*h*channels (palette images
    are expanded to RGB, so channels is 3 for color type 3)."""
    import numpy as np

    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG file")
    pos = len(PNG_MAGIC)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", chunk)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} interlace={interlace}: only 8-bit "
            "non-interlaced supported natively"
        )
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")

    img = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_at = y * (stride + 1)
        filt = raw[row_at]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_at + 1)
        if filt == 0:  # None
            cur = line.copy()
        elif filt == 2:  # Up
            cur = line + prev
        elif filt in (1, 3, 4):
            # Sub/Average/Paeth reference the pixel `nch` bytes left —
            # sequential within the row, vector over the rest
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0  # left
                b = int(prev[x])  # up
                if filt == 1:
                    pred = a
                elif filt == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prev[x - nch]) if x >= nch else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {filt}")
        img[y] = cur
        prev = cur

    pixels = img.reshape(-1)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        pixels = palette[pixels].reshape(-1)
        nch = 3
    return width, height, nch, pixels


def encode_png(width: int, height: int, channels: int, pixels, filters=None) -> bytes:
    """Minimal PNG encoder (tests + fixture generation): 8-bit
    grey/RGB/RGBA, one chosen filter byte per row (default 0). Kept next
    to the decoder so the format knowledge lives in one place; the
    decoder is still independently pinned by committed binary fixtures."""
    import numpy as np

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, width * channels)
    raw = bytearray()
    prev = np.zeros(width * channels, dtype=np.uint8)
    for y in range(height):
        filt = filters[y % len(filters)] if filters else 0
        line = arr[y]
        if filt == 0:
            enc = line.copy()
        elif filt == 2:
            enc = line - prev
        elif filt == 1:
            enc = line.copy()
            enc[channels:] = line[channels:] - line[:-channels]
        else:
            raise ValueError("encoder supports filters 0/1/2")
        raw.append(filt)
        raw += enc.tobytes()
        prev = line

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
