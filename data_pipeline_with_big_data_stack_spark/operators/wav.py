"""Native RIFF/WAVE (PCM) decode — no audio library required.

WAV is a public, trivially parseable container (RIFF chunks + a PCM
``fmt `` header), so the audio side of the multimodal path gets a real
decoder just like PNG on the image side (``operators/png.py``): parse
the chunk list, read ``fmt ``, slice ``data``, return samples.

Supports integer PCM (format 1) and IEEE-float PCM (format 3) at
8/16/32-bit (8-bit is unsigned per spec, wider widths signed). Other
encodings (ADPCM, mu-law…) raise ``WavError`` — never misread.
"""

from __future__ import annotations

import struct

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)  # runs inside mapInPandas workers

WAV_MAGIC = b"RIFF"


class WavError(ValueError):
    pass


def decode_wav(b: bytes):
    """bytes → (sample_rate, n_channels, bits_per_sample, samples).

    ``samples`` is a 1-D numpy array of raw interleaved samples
    (uint8 for 8-bit, int16/int32/float32 otherwise)."""
    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE file")
    fmt = None
    data = None
    off = 12
    while off + 8 <= len(b):
        cid = b[off : off + 4]
        (csize,) = struct.unpack_from("<I", b, off + 4)
        body = off + 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", b, body)
        elif cid == b"data":
            data = b[body : body + csize]
        off = body + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt/data chunk")
    audio_fmt, nch, rate, _brate, _align, bits = fmt
    if audio_fmt == 1 and bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8)
    elif audio_fmt == 1 and bits == 16:
        arr = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    elif audio_fmt == 1 and bits == 32:
        arr = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4")
    elif audio_fmt == 3 and bits == 32:
        arr = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4")
    else:
        raise WavError(f"unsupported WAV encoding fmt={audio_fmt} bits={bits}")
    return rate, nch, bits, arr
