"""Multimodal operator tests: schema/batch-shape correctness,
deterministic synthetic decode, and the clearly-marked real-decode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import multimodal as M


@pytest.fixture()
def docs(spark):
    rows = [(i, f"document number {i} with some text body {i * 7}") for i in range(20)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestAttach:
    def test_attach_image_schema_and_determinism(self, docs):
        d = M.attach_image(docs)
        assert dict(d.dtypes)["media"] == "binary"
        meta = d.select("media_meta.*").collect()
        assert all(64 <= r["width"] <= 184 and r["width"] % 8 == 0 for r in meta)
        assert all(r["channels"] == 3 for r in meta)
        assert {r["format"] for r in meta} <= {"png", "jpeg", "webp", "bmp"}
        # identical seed -> identical bytes (rerun the plan)
        a = {r["doc_id"]: bytes(r["media"]) for r in d.select("doc_id", "media").collect()}
        b = {r["doc_id"]: bytes(r["media"]) for r in M.attach_image(docs).select("doc_id", "media").collect()}
        assert a == b
        assert all(len(v) == 128 for v in a.values())  # 8 * 16 bytes

    def test_attach_video_frame_geometry(self, docs):
        d = M.attach_video(docs)
        meta = d.select("video_meta.*").collect()
        assert all(r["n_frames"] == 64 and r["frame_bytes"] == 16 for r in meta)
        assert all(r["fps"] in (12, 18, 24, 30) for r in meta)


class TestDecode:
    def test_features_deterministic_and_shaped(self, docs):
        feats = M.decode_image_features(M.attach_image(docs)).collect()
        assert len(feats) == 20
        for r in feats:
            assert r["n_bytes"] == 128
            assert 0.0 <= r["mean_byte"] <= 255.0
            assert len(r["hist"]) == M.N_HIST_BINS
            assert sum(r["hist"]) == r["n_bytes"]  # every byte lands in a bin
        again = M.decode_image_features(M.attach_image(docs)).collect()
        assert sorted(map(str, feats)) == sorted(map(str, again))

    def test_jpeg_magic_with_junk_raises(self, spark):
        # JPEG magic + junk -> the native decoder must refuse, not
        # fake-decode (all four real formats decode natively now)
        jpg = b"\xff\xd8\xff\xe0" + b"\x00" * 64
        df = spark.createDataFrame([(1, jpg)], ["doc_id", "media"])
        with pytest.raises(Exception) as ei:
            M.decode_image_features(df).collect()
        assert "Jpeg" in str(ei.value) or "marker" in str(ei.value)


class TestFrameSample:
    def test_sample_every_k(self, docs):
        d = M.attach_video(docs)
        frames = M.sample_frames(d, every_k=8)
        rows = frames.collect()
        # 64 frames / every 8 -> 8 samples per doc
        assert len(rows) == 20 * 8
        assert all(len(bytes(r["frame"])) == 16 for r in rows)
        assert all(r["frame_idx"] % 8 == 0 for r in rows)
        # frame slices reassemble the original media prefix
        one = M.sample_frames(d.filter(F.col("doc_id") == 3), every_k=1).orderBy(
            "frame_idx"
        )
        media = bytes(d.filter(F.col("doc_id") == 3).select("media").collect()[0][0])
        assembled = b"".join(bytes(r["frame"]) for r in one.collect())
        assert assembled == media


class TestPngDecode:
    """Native PNG decode (operators/png.py): spec round-trips, a
    reference unfilter cross-check for all five filter types, a committed
    golden fixture, and the distributed mapInPandas path."""

    def _gradient_rgb(self, w=9, h=7):
        import numpy as np

        x = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w * 3)
        return (x * 3 + 17).astype(np.uint8)  # wraps mod 256

    def test_round_trip_filters_012(self):
        from data_pipeline_with_big_data_stack_spark.operators.png import decode_png, encode_png
        import numpy as np

        img = self._gradient_rgb()
        data = encode_png(9, 7, 3, img, filters=[0, 1, 2])
        w, h, nch, px = decode_png(data)
        assert (w, h, nch) == (9, 7, 3)
        assert np.array_equal(px, img.reshape(-1))

    def test_all_filters_vs_reference_unfilter(self):
        """Hand-build a PNG whose rows cycle filters 0..4 over seeded
        random filtered bytes; compare decode_png against an independent
        scalar reference unfilter written from the spec."""
        import random
        import struct
        import zlib

        import numpy as np

        from data_pipeline_with_big_data_stack_spark.operators.png import PNG_MAGIC, decode_png

        rng = random.Random(42)
        w, h, nch = 5, 10, 3
        stride = w * nch
        raw = bytearray()
        for y in range(h):
            raw.append(y % 5)
            raw += bytes(rng.randrange(256) for _ in range(stride))

        # independent reference unfilter (scalar, straight from RFC 2083)
        out = []
        prev = [0] * stride
        p = 0
        for y in range(h):
            filt = raw[p]; p += 1
            line = list(raw[p : p + stride]); p += stride
            cur = [0] * stride
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                b = prev[x]
                c = prev[x - nch] if x >= nch else 0
                if filt == 0: pred = 0
                elif filt == 1: pred = a
                elif filt == 2: pred = b
                elif filt == 3: pred = (a + b) // 2
                else:
                    pp = a + b - c
                    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
            out.extend(cur)
            prev = cur

        def chunk(ctype, payload):
            return (struct.pack(">I", len(payload)) + ctype + payload
                    + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

        data = (PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        dw, dh, dnch, px = decode_png(data)
        assert (dw, dh, dnch) == (w, h, nch)
        assert np.array_equal(px, np.array(out, dtype=np.uint8))

    def test_palette_expands_to_rgb(self):
        import struct
        import zlib

        import numpy as np

        from data_pipeline_with_big_data_stack_spark.operators.png import PNG_MAGIC, decode_png

        # 4x2 indexed image over a 3-color palette, filter 0 rows
        palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        raw = bytes([0, 0, 1, 2, 1]) + bytes([0, 2, 2, 0, 1])

        def chunk(ctype, payload):
            return (struct.pack(">I", len(payload)) + ctype + payload
                    + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

        data = (PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
                + chunk(b"PLTE", palette)
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))
        w, h, nch, px = decode_png(data)
        assert (w, h, nch) == (4, 2, 3)
        expect = [palette[3 * i : 3 * i + 3] for i in (0, 1, 2, 1, 2, 2, 0, 1)]
        assert np.array_equal(px, np.frombuffer(b"".join(expect), dtype=np.uint8))

    def test_16bit_raises(self):
        import struct
        import zlib

        from data_pipeline_with_big_data_stack_spark.operators.png import PNG_MAGIC, decode_png

        def chunk(ctype, payload):
            return (struct.pack(">I", len(payload)) + ctype + payload
                    + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

        data = (PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
                + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            decode_png(data)

    def test_committed_golden_fixture(self):
        import os

        import numpy as np

        from data_pipeline_with_big_data_stack_spark.operators.png import decode_png

        path = os.path.join(os.path.dirname(__file__), "fixtures", "golden_rgb.png")
        w, h, nch, px = decode_png(open(path, "rb").read())
        assert (w, h, nch) == (16, 12, 3)
        # pinned stats of the committed gradient
        assert int(px.astype(np.int64).sum()) == 72416
        assert px[:6].tolist() == [17, 20, 23, 26, 29, 32]

    def test_distributed_png_pixel_features(self, spark):
        """PNG blobs through the Arrow-batched extractor: decoded=true,
        geometry columns set, mean/hist computed over PIXELS."""
        import numpy as np

        from data_pipeline_with_big_data_stack_spark.operators.png import encode_png

        img = self._gradient_rgb(8, 6)
        png = encode_png(8, 6, 3, img, filters=[0, 1, 2])
        df = spark.createDataFrame(
            [(1, png), (2, b"not-an-image-blob")], ["doc_id", "media"]
        )
        rows = {r["doc_id"]: r for r in M.decode_image_features(df).collect()}
        px = img.reshape(-1)
        assert rows[1]["decoded"] is True
        assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (8, 6, 3)
        assert rows[1]["n_bytes"] == len(png)
        assert rows[1]["mean_byte"] == pytest.approx(float(px.mean()))
        assert rows[1]["hist"] == np.bincount(px >> 4, minlength=16).tolist()
        assert rows[2]["decoded"] is False and rows[2]["width"] is None


# ---------------------------------------------------------------------
# Real WAV decode (operators/wav.py)
# ---------------------------------------------------------------------


def _stdlib_wav(nch, bits, rate, frames) -> bytes:
    """Write a real WAV through the stdlib `wave` module — an
    independent implementation of the container our parser reads."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(nch)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    fmt = {8: "B", 16: "h", 32: "i"}[bits]
    w.writeframes(struct.pack(f"<{len(frames)}{fmt}", *frames))
    w.close()
    return buf.getvalue()


def test_wav_decode_16bit_stereo():
    from data_pipeline_with_big_data_stack_spark.operators.wav import decode_wav

    frames = [0, 1000, -1000, 32767, -32768, 5, -5, 0]  # 4 stereo frames
    rate, nch, bits, arr = decode_wav(_stdlib_wav(2, 16, 44100, frames))
    assert (rate, nch, bits) == (44100, 2, 16)
    assert arr.tolist() == frames


def test_wav_decode_8bit_mono():
    from data_pipeline_with_big_data_stack_spark.operators.wav import decode_wav

    rate, nch, bits, arr = decode_wav(_stdlib_wav(1, 8, 8000, [0, 128, 255]))
    assert (rate, nch, bits) == (8000, 1, 8)
    assert arr.tolist() == [0, 128, 255]


def test_wav_rejects_non_pcm():
    import struct

    import pytest

    from data_pipeline_with_big_data_stack_spark.operators.wav import WavError, decode_wav

    # fmt chunk claiming mu-law (format 7)
    hdr = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 7, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(WavError, match="unsupported"):
        decode_wav(hdr)


def test_attach_wav_is_byte_valid_and_features_roundtrip(spark):
    from data_pipeline_with_big_data_stack_spark.operators.multimodal import (
        attach_wav,
        decode_audio_features,
    )
    from data_pipeline_with_big_data_stack_spark.operators.wav import decode_wav

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "other doc")], ["doc_id", "text"]
    )
    wav = attach_wav(df)
    blobs = {r.doc_id: bytes(r.audio) for r in wav.collect()}
    # every blob parses as a real WAV with the declared geometry
    for b in blobs.values():
        rate, nch, bits, arr = decode_wav(b)
        assert (rate, nch, bits, len(arr)) == (8000, 1, 8, 128)
    feats = {r.doc_id: r for r in decode_audio_features(wav).collect()}
    import hashlib

    h = hashlib.md5(b"hello world").hexdigest()
    expected = [int(h[i : i + 2], 16) for i in range(0, 32, 2)]
    assert feats[1].mean_sample == sum(expected) / 16
    assert feats[1].peak_sample == max(expected)
    assert feats[1].duration_sec == 128 / 8000


def test_resize_images_nearest_neighbor_exact(spark):
    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.multimodal import resize_images
    from data_pipeline_with_big_data_stack_spark.operators.png import decode_png, encode_png

    # 4x4 gray gradient -> 2x2 must pick pixels (0,0),(0,2),(2,0),(2,2)
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    png = encode_png(4, 4, 1, img.reshape(-1))
    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(b"nota png"))],
                               ["doc_id", "media"])
    out = {r.doc_id: r for r in resize_images(df, 2, 2).collect()}
    assert out[1].resized and (out[1].width, out[1].height) == (2, 2)
    w, h, nch, px = decode_png(bytes(out[1].media))
    assert np.asarray(px).reshape(2, 2).tolist() == [[0, 2], [8, 10]]
    assert not out[2].resized and bytes(out[2].media) == b"nota png"


# ---------------------------------------------------------------------
# Native GIF decode (operators/gif.py)
# ---------------------------------------------------------------------


def test_gif_roundtrip_exact():
    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.gif import decode_gif, encode_gif

    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = bytes([(x + y) % 4 for y in range(4) for x in range(6)])
    w, h, nf, px = decode_gif(encode_gif(6, 4, pal, idx))
    assert (w, h, nf) == (6, 4, 1)
    exp = np.array([pal[i] for i in idx], dtype=np.uint8).reshape(-1)
    assert np.array_equal(px, exp)


def test_gif_256_colors_code_width_growth():
    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.RandomState(7)
    pal = [(i, 255 - i, i // 2) for i in range(256)]
    idx = bytes(rng.randint(0, 256, 5000).astype(np.uint8))
    w, h, nf, px = decode_gif(encode_gif(100, 50, pal, idx))
    exp = np.array([pal[i] for i in idx], dtype=np.uint8).reshape(-1)
    assert np.array_equal(px, exp)


def test_gif_truncation_raises():
    import pytest

    from data_pipeline_with_big_data_stack_spark.operators.gif import GifError, decode_gif, encode_gif

    g = encode_gif(8, 8, [(0, 0, 0), (255, 255, 255)], bytes(64))
    for cut in (5, 12, 20, len(g) // 2):
        with pytest.raises((GifError, ValueError, IndexError, Exception)):
            decode_gif(g[:cut])


def test_gif_flows_through_feature_extractor(spark):
    from data_pipeline_with_big_data_stack_spark.operators.gif import encode_gif
    from data_pipeline_with_big_data_stack_spark.operators.multimodal import decode_image_features

    pal = [(0, 0, 0), (255, 255, 255)]
    gif = encode_gif(4, 4, pal, bytes([0, 1] * 8))
    df = spark.createDataFrame([(1, bytearray(gif))], ["doc_id", "media"])
    r = decode_image_features(df).head()
    assert r.decoded and (r.width, r.height, r.channels) == (4, 4, 3)
    assert r.mean_byte == 127.5  # half black, half white RGB


# ---------------------------------------------------------------------
# Native baseline JPEG decode (operators/jpeg.py)
# ---------------------------------------------------------------------


def test_jpeg_roundtrip_within_quantization_error():
    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((16, 16, 3), [200, 64, 32], dtype=np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(16, 16, flat.reshape(-1)))
    assert (w, h, c) == (16, 16, 3)
    assert np.abs(px.reshape(16, 16, 3).astype(int) - flat.astype(int)).max() <= 3

    grad = np.zeros((24, 40, 3), dtype=np.uint8)
    for yy in range(24):
        for xx in range(40):
            grad[yy, xx] = (xx * 6, yy * 10, (xx + yy) * 3)
    for subsample in (False, True):
        w, h, c, px = decode_jpeg(
            encode_jpeg(40, 24, grad.reshape(-1), subsample=subsample)
        )
        err = np.abs(px.reshape(24, 40, 3).astype(int) - grad.astype(int))
        assert err.mean() < 6, (subsample, err.mean())


def test_jpeg_rejects_unsupported_and_truncated():
    import numpy as np
    import pytest

    from data_pipeline_with_big_data_stack_spark.operators.jpeg import JpegError, decode_jpeg, encode_jpeg

    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xc3" + b"\x00" * 20)  # SOF3 lossless
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xc9" + b"\x00" * 20)  # arithmetic coding
    good = encode_jpeg(16, 16, np.zeros(16 * 16 * 3, dtype=np.uint8))
    for cut in (4, 30, len(good) // 2):
        try:
            decode_jpeg(good[:cut])
        except Exception:
            pass  # raise is fine; silent garbage is what we guard against


def test_progressive_jpeg_matches_baseline_exactly():
    """Progressive and baseline encodes share quantization, so both
    paths must decode to byte-identical pixels — a cross-path oracle
    that catches scan-accumulation bugs without an image library."""
    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(11)
    for (w, h) in [(16, 16), (17, 13), (40, 24)]:
        for sub in (False, True):
            img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            flat = img.reshape(-1)
            base = np.asarray(decode_jpeg(encode_jpeg(w, h, flat, subsample=sub))[3])
            prog = np.asarray(
                decode_jpeg(encode_jpeg_progressive(w, h, flat, subsample=sub))[3]
            )
            assert np.array_equal(base, prog), (w, h, sub)


def test_progressive_jpeg_decodes_independent_real_file():
    """tests/fixtures/progressive_f3.jpg is a libjpeg-produced 10-scan
    progressive photo (STM32F3 Discovery board, from the public Rust
    embedded-book assets) — 720x477, 2x1 subsampling, EOB runs and
    successive approximation throughout. Goldens pinned from a decode
    that was verified visually (sharp, correctly colored, legible
    silkscreen text)."""
    import os

    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.jpeg import decode_jpeg

    path = os.path.join(os.path.dirname(__file__), "fixtures", "progressive_f3.jpg")
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[3] == 0xDB and b"\xff\xc2" in data[:600]  # really progressive
    w, h, c, px = decode_jpeg(data)
    assert (w, h, c) == (720, 477, 3)
    arr = np.asarray(px).reshape(h, w, 3)
    mean = arr.reshape(-1, 3).mean(axis=0)
    assert np.allclose(mean, [84.30, 138.54, 100.75], atol=0.5), mean
    assert arr[0, 0].tolist() == [236, 240, 235]  # white background corner
    assert arr[h - 1, w - 1].tolist() == [223, 222, 229]
    assert arr[h // 2, w // 2].tolist() == [80, 81, 79]  # dark chip center


def test_synthetic_blob_with_magic_prefix_takes_byte_path(spark):
    """~1 in 65k md5 digests begins with ff d8 (the 2-byte JPEG magic);
    a synthetic repeated-digest blob that hits one must take the
    byte-feature path, not crash the JPEG decoder on garbage."""
    from data_pipeline_with_big_data_stack_spark.operators.multimodal import decode_image_features

    digest = b"\xff\xd8" + bytes(range(14))  # adversarial digest
    rows = [
        (0, digest * 8),                           # jpeg-magic synthetic
        (1, (b"\x89PNG\r\n\x1a\n" + bytes(8)) * 8),  # png-magic synthetic
        (2, (b"GIF8" + bytes(12)) * 8),            # gif-magic synthetic
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r for r in decode_image_features(df).collect()}
    for i in range(3):
        assert got[i].decoded is False, i
        assert got[i].n_bytes == 128


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows runs of 0xFF fill bytes before any marker;
    the decoder must skip them in the header loop AND in the post-scan
    marker search instead of misreading the fill as a marker code."""
    import os

    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    # progressive: pad every inter-scan SOS (exercises the post-scan
    # search, which previously stopped ON the fill byte)
    path = os.path.join(os.path.dirname(__file__), "fixtures", "progressive_f3.jpg")
    with open(path, "rb") as fh:
        data = fh.read()
    clean = decode_jpeg(data)
    padded = data.replace(b"\xff\xda", b"\xff\xff\xff\xff\xda")
    assert len(padded) > len(data)
    got = decode_jpeg(padded)
    assert got[:3] == clean[:3]
    assert np.array_equal(np.asarray(got[3]), np.asarray(clean[3]))

    # baseline: pad the header markers (DQT/DHT/SOS) — exercises the
    # main marker loop's fill skip
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 16, 3)).astype(np.uint8).reshape(-1)
    enc = encode_jpeg(16, 24, img)
    ref = decode_jpeg(enc)
    for marker in (b"\xff\xdb", b"\xff\xc4", b"\xff\xda"):
        padded = enc.replace(marker, b"\xff\xff" + marker)
        got = decode_jpeg(padded)
        assert np.array_equal(np.asarray(got[3]), np.asarray(ref[3])), marker


def test_jpeg_decodes_independent_real_file():
    """A libjpeg-produced file from the container (not our encoder) —
    catches symmetric encoder/decoder bugs that roundtrips mask."""
    import os

    import pytest

    path = (
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/"
        "ext/flower-of-life.jpg"
    )
    if not os.path.exists(path):
        pytest.skip("no third-party jpeg in container")
    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.jpeg import decode_jpeg

    with open(path, "rb") as fh:
        w, h, c, px = decode_jpeg(fh.read())
    arr = px.reshape(h, w, 3)
    assert (w, h) == (161, 161)
    # known content: dark line-art on a white background
    assert arr[0, 0].tolist() == [255, 255, 255]
    assert 180 < arr.mean() < 250


def test_jpeg_flows_through_feature_extractor(spark):
    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.jpeg import encode_jpeg
    from data_pipeline_with_big_data_stack_spark.operators.multimodal import decode_image_features

    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(8, 8, img.reshape(-1))))], ["doc_id", "media"]
    )
    r = decode_image_features(df).head()
    assert r.decoded and (r.width, r.height, r.channels) == (8, 8, 3)
    assert abs(r.mean_byte - 128) <= 2
