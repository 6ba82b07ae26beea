"""Multimodal (image/audio/video) column operators.

Design for a 100 TB training-data pipeline: media are opaque ``binary``
columns with a typed metadata struct riding alongside; decode /
feature-extract / frame-sample run distributed, Arrow-batched. The
reference has no media path (its closest analogue is the opaque NetCDF
binary ingest, ``goes_satellite_etl.py:133-388``) — this module is part
of the engine's extended training-data surface.

Container note: no image/audio libs are installed here; all real media
magics decode natively via the pure-Python decoders in this package —
PNG (``operators/png.py``, stdlib zlib), JPEG baseline+progressive
(``operators/jpeg.py``), GIF (``operators/gif.py``), and RIFF/WAV
(``operators/wav.py``) — no library gates remain; synthetic media
(deterministic bytes derived from ``md5`` of a seed column —
reproducible in any engine) flow through a deterministic byte-level
feature extractor. Everything Spark-side — schema, batch shape,
partitioning, UDF signatures — is real and tested.

Scale notes:
- synthetic media and all metadata derivation are native column
  expressions (JVM, whole-stage codegen) — no Python in those paths;
- feature extraction is ``mapInPandas`` (one Arrow batch of blobs in,
  one batch of fixed-width feature rows out) — the same shape a real
  CLIP/whisper embedding stage would use;
- frame sampling is pure ``substring``/``posexplode`` arithmetic on the
  binary column — no UDF, explodes to at most ``n_frames/k`` rows.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators.gif import decode_gif
from data_pipeline_with_big_data_stack_spark.operators.jpeg import JPEG_MAGIC, decode_jpeg
from data_pipeline_with_big_data_stack_spark.operators.png import PNG_MAGIC, decode_png
from data_pipeline_with_big_data_stack_spark.operators.wav import decode_wav
from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)  # feature extractors ship by value to workers

N_HIST_BINS = 16


def _nibble(col: Column | str, i: int) -> Column:
    """i-th hex nibble of md5(col) as an int (0-15) — cross-engine
    deterministic (DuckDB: strpos('0123..f', substr(md5(c),i+1,1))-1)."""
    return (
        F.instr(F.lit("0123456789abcdef"), F.substring(F.md5(col), i + 1, 1)) - 1
    ).cast("int")


def synth_media(seed_col: str, n_repeat: int = 8) -> Column:
    """Deterministic fake media bytes: ``unhex(repeat(md5(seed), n))`` —
    16*n bytes, identical in any md5-capable engine, no Python."""
    return F.unhex(F.repeat(F.md5(F.col(seed_col)), n_repeat))


def attach_image(df: DataFrame, seed_col: str = "text", n_repeat: int = 8) -> DataFrame:
    """Add ``media`` (binary) + ``media_meta`` (typed struct) columns.

    Metadata is derived deterministically from the seed's md5 so oracles
    can recompute it: width/height in 64..184 step 8, 3 channels, format
    cycling over a small set.
    """
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp"), F.lit("bmp")),
        _nibble(seed_col, 0) % 4 + 1,
    )
    meta = F.struct(
        (F.lit(64) + _nibble(seed_col, 1) * 8).alias("width"),
        (F.lit(64) + _nibble(seed_col, 2) * 8).alias("height"),
        F.lit(3).alias("channels"),
        fmt.alias("format"),
    )
    return df.withColumn("media", synth_media(seed_col, n_repeat)).withColumn(
        "media_meta", meta
    )


def attach_video(df: DataFrame, seed_col: str = "text", frame_bytes: int = 16,
                 n_repeat: int = 64) -> DataFrame:
    """Video twin: binary is a concatenation of fixed-size frames;
    metadata carries fps and the frame geometry needed to slice without
    decoding."""
    n_frames = (F.lit(n_repeat * 16) / frame_bytes).cast("int")
    meta = F.struct(
        (F.lit(12) + _nibble(seed_col, 3) % 4 * 6).alias("fps"),
        n_frames.alias("n_frames"),
        F.lit(frame_bytes).alias("frame_bytes"),
    )
    return df.withColumn("media", synth_media(seed_col, n_repeat)).withColumn(
        "video_meta", meta
    )


def decode_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the ``media`` column.

    All four real formats decode natively, no library: PNG
    (``operators/png.py``), baseline + progressive JPEG
    (``operators/jpeg.py``), GIF (``operators/gif.py``) to PIXEL-level
    features — width/height/channels plus mean and 16-bin histogram
    over decoded values, ``decoded = true`` — and WAV through
    ``decode_audio_features``. Unsupported encodings inside those
    containers (arithmetic-coded or lossless JPEG) raise — never
    silently misread. Synthetic media yield deterministic BYTE-level
    features, ``decoded = false``.
    """
    schema = (
        f"{id_col} long, n_bytes int, decoded boolean, width int, "
        f"height int, channels int, mean_byte double, hist array<int>"
    )

    def extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                b = bytes(blob)
                # synth_media blobs are a repeated 16-byte md5 digest;
                # ~1 in 65k digests BEGINS with a container magic (ffd8
                # is only two bytes), which would misroute the blob into
                # a real decoder and crash on garbage — the exact
                # periodicity test is unambiguous (no real container is
                # 16-byte-periodic), so check it FIRST
                synthetic = (
                    len(b) >= 32
                    and len(b) % 16 == 0
                    and b == b[:16] * (len(b) // 16)
                )
                if synthetic:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    geom = (False, None, None, None)
                elif b.startswith(PNG_MAGIC):
                    w, h, nch, arr = decode_png(b)
                    geom = (True, w, h, nch)
                elif b.startswith(b"GIF8"):
                    w, h, _nf, arr = decode_gif(b)
                    geom = (True, w, h, 3)
                elif b.startswith(JPEG_MAGIC):
                    w, h, nch, arr = decode_jpeg(b)
                    geom = (True, w, h, nch)
                else:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    geom = (False, None, None, None)
                rows.append(
                    (
                        _id,
                        len(b),
                        *geom,
                        float(arr.mean()) if len(arr) else 0.0,
                        np.bincount(arr >> 4, minlength=N_HIST_BINS).astype(
                            "int32"
                        ),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_bytes", "decoded", "width", "height",
                    "channels", "mean_byte", "hist",
                ],
            )

    return df.select(id_col, "media").mapInPandas(extract, schema)


def resize_images(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched image RESIZE (brief: "decode / feature-extract /
    resize / frame-sample"): native-PNG inputs decode (operators/png.py),
    resample by nearest neighbor (pure numpy index arithmetic — the
    deterministic choice; no resampling-kernel float variance), and
    re-encode as PNG. Non-PNG blobs pass through unchanged with
    ``resized = false`` — the real-decoder gate stays in the decode op."""
    schema = (
        f"{id_col} long, resized boolean, width int, height int, "
        f"media binary"
    )

    def do_resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from data_pipeline_with_big_data_stack_spark.operators.png import encode_png

        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                b = bytes(blob)
                if not b.startswith(PNG_MAGIC):
                    rows.append((_id, False, None, None, b))
                    continue
                w, h, nch, px = decode_png(b)
                img = np.asarray(px).reshape(h, w, nch)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                out = img[ys][:, xs]
                rows.append(
                    (
                        _id, True, out_w, out_h,
                        encode_png(out_w, out_h, nch, out.reshape(-1)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "resized", "width", "height", "media"]
            )

    return df.select(id_col, "media").mapInPandas(do_resize, schema)


_WAV_RATE = 8000
_WAV_PAYLOAD = 128  # bytes = 8 md5 repeats of 16 bytes, u8 mono PCM


def _wav_header(payload_len: int, rate: int = _WAV_RATE) -> bytes:
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36 + payload_len)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data"
        + struct.pack("<I", payload_len)
    )


def attach_wav(df: DataFrame, seed_col: str = "text") -> DataFrame:
    """Add an ``audio`` column of REAL (byte-valid) WAV files: a fixed
    44-byte PCM header + md5-derived u8 mono samples. The container is
    genuine RIFF/WAVE — ``decode_audio_features`` parses it with the
    same chunk walker any external WAV would take — while the sample
    payload stays md5-deterministic so DuckDB oracles can recompute the
    expected features from first principles."""
    hdr = _wav_header(_WAV_PAYLOAD)
    return df.withColumn(
        "audio", F.concat(F.lit(hdr), synth_media(seed_col, _WAV_PAYLOAD // 16))
    )


def decode_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched REAL audio decode over the ``audio`` binary column:
    RIFF chunk walk → fmt/data parse → sample statistics. PCM
    int8/int16/int32/float32 decode natively (``operators/wav.py``);
    non-PCM encodings raise ``WavError`` — never silent garbage."""
    schema = (
        f"{id_col} long, n_bytes int, sample_rate int, channels int, "
        f"bits int, n_samples long, duration_sec double, "
        f"mean_sample double, peak_sample double"
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _id, blob in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                b = bytes(blob)
                rate, nch, bits, arr = decode_wav(b)
                n = len(arr) // max(nch, 1)
                rows.append(
                    (
                        _id, len(b), rate, nch, bits, n,
                        n / rate if rate else 0.0,
                        float(arr.mean()) if len(arr) else 0.0,
                        float(arr.max()) if len(arr) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_bytes", "sample_rate", "channels", "bits",
                    "n_samples", "duration_sec", "mean_sample", "peak_sample",
                ],
            )

    return df.select(id_col, "audio").mapInPandas(extract, schema)


def sample_frames(df: DataFrame, every_k: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling without decode: every k-th fixed-size frame sliced
    out of the binary by ``substring`` arithmetic (1-based). Pure native
    expressions — at scale this is a narrow map, no shuffle."""
    nf = F.col("video_meta.n_frames")
    fb = F.col("video_meta.frame_bytes")
    idx = F.explode(F.sequence(F.lit(0), nf - 1, F.lit(every_k))).alias("frame_idx")
    out = df.select(id_col, "media", "video_meta", idx)
    return out.select(
        id_col,
        F.col("frame_idx"),
        F.substring(F.col("media"), (F.col("frame_idx") * fb + 1).cast("int"), fb)
        .alias("frame"),
    )
