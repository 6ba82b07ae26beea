"""Multimodal query surface — synthetic media over the ``documents``
table (operators/multimodal.py).

Media bytes and metadata derive deterministically from ``md5(text)``, so
the DuckDB oracle recomputes them bit-identically: the binary is
``unhex(repeat(md5(text), k))`` and metadata fields come from md5
nibbles. The *decode* step (byte-histogram features) is a mapInPandas
operator — genuinely non-SQL — and is registered rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import multimodal as M
from data_pipeline_with_big_data_stack_spark.operators.rollup_maintenance import (
    round4_ratio as _r4,
)
from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.session import prepare_session
from data_pipeline_with_big_data_stack_spark.tables import load_table

# DuckDB twin of multimodal._nibble
def _nib_sql(i: int) -> str:
    return f"(strpos('0123456789abcdef', substr(md5(text), {i + 1}, 1)) - 1)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# Metadata profile: the "what's in this media corpus" query a pipeline
# runs before spending GPU-decode budget. All-native on both sides.
# --------------------------------------------------------------------------
@query(
    "q_media_metadata_profile",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             ['png','jpeg','webp','bmp'][{_nib_sql(0)} % 4 + 1] AS format,
             64 + {_nib_sql(1)} * 8                             AS width,
             64 + {_nib_sql(2)} * 8                             AS height,
             octet_length(unhex(repeat(md5(text), 8)))          AS n_bytes
      FROM documents)
    SELECT format,
           count(*)                                   AS n_media,
           ((20000*sum(width)::HUGEINT + count(*))
              // (2*count(*))) / 10000.0              AS avg_width,
           ((20000*sum(height)::HUGEINT + count(*))
              // (2*count(*))) / 10000.0              AS avg_height,
           ((20000*sum((width * height * 3)::HUGEINT) + count(*))
              // (2*count(*))) / 10000.0              AS avg_raw_pixbytes,
           (sum(n_bytes))::BIGINT                     AS total_bytes
    FROM m GROUP BY format
    """,
)
def q_media_metadata_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = M.attach_image(_docs(spark, sf_dir))
    m = d.select(
        "doc_id",
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.length("media").alias("n_bytes"),
    )
    return m.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_media"),
        _r4(F.sum("width"), F.count(F.lit(1))).alias("avg_width"),
        _r4(F.sum("height"), F.count(F.lit(1))).alias("avg_height"),
        _r4(
            F.sum(F.col("width") * F.col("height") * 3), F.count(F.lit(1))
        ).alias("avg_raw_pixbytes"),
        F.sum("n_bytes").alias("total_bytes"),
    )


# --------------------------------------------------------------------------
# Frame sampling: every 4th frame of each synthetic video, identified by
# its md5 — pure substring arithmetic on the binary, no decode, no UDF.
# --------------------------------------------------------------------------
@query(
    "q_media_frame_sample",
    oracle="""
    WITH v AS (
      -- DuckDB md5/substring don't operate on BLOBs, so the oracle works
      -- on the hex image of the same bytes (1 frame = 16 bytes = 32 hex)
      SELECT doc_id, upper(repeat(md5(text), 64)) AS media_hex
      FROM documents WHERE doc_id < 50),
    idx AS (SELECT unnest(range(0, 64, 4)) AS frame_idx)
    SELECT v.doc_id, idx.frame_idx,
           substr(v.media_hex, (idx.frame_idx * 32 + 1)::INT, 32) AS frame_hex
    FROM v CROSS JOIN idx
    """,
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = M.attach_video(_docs(spark, sf_dir).filter(F.col("doc_id") < 50))
    frames = M.sample_frames(d, every_k=4)
    return frames.select(
        "doc_id", "frame_idx", F.hex("frame").alias("frame_hex")
    )


# --------------------------------------------------------------------------
# Real WAV decode: the audio column holds byte-valid RIFF/WAVE files
# (44-byte PCM header + md5-derived samples); Spark PARSES the real
# container (operators/wav.py chunk walk), while the oracle recomputes
# the expected statistics from first principles on the md5 payload —
# so a header/offset/dtype bug in the parser fails the gate.
# --------------------------------------------------------------------------
@query(
    "q_media_wav_features",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             [('0x' || substr(md5(text), 2*i - 1, 2))::INT
              for i in range(1, 17)] AS bytes
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           8000                              AS sample_rate,
           1                                 AS channels,
           8                                 AS bits,
           128::BIGINT                       AS n_samples,
           0.016                             AS duration_sec,
           round(list_sum(bytes) / 16.0, 4)  AS mean_sample,
           (list_max(bytes))::DOUBLE         AS peak_sample
    FROM b
    """,
)
def q_media_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = M.attach_wav(_docs(spark, sf_dir).filter(F.col("doc_id") < 100))
    feats = M.decode_audio_features(d)
    return feats.select(
        "doc_id",
        "sample_rate",
        "channels",
        "bits",
        "n_samples",
        F.round("duration_sec", 4).alias("duration_sec"),
        F.round("mean_sample", 4).alias("mean_sample"),
        "peak_sample",
    )


# --------------------------------------------------------------------------
# Byte-feature decode: mapInPandas (Arrow batches). The synthetic media
# blob is unhex(repeat(md5(text), 8)) — 16 digest bytes repeated 8× —
# so the oracle recomputes every feature from first principles on the
# md5 (same device as the WAV query): the repeat leaves the byte MEAN
# unchanged (sum128/128 == sum16/16, both exact power-of-two
# divisions) and scales each 16-wide histogram bin count by 8. A
# mapInPandas offset/dtype/binning bug therefore fails the value gate.
# --------------------------------------------------------------------------
@query(
    "q_media_byte_features",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             [('0x' || substr(md5(text), 2*i - 1, 2))::INT
              for i in range(1, 17)] AS bytes
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           128                                               AS n_bytes,
           round(list_sum(bytes) / 16.0, 4)                  AS mean_byte,
           (8 * len(list_filter(bytes, x -> x // 16 = 0)))::INT  AS hist_bin0,
           (8 * len(list_filter(bytes, x -> x // 16 = 15)))::INT AS hist_bin15
    FROM b
    """,
)
def q_media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = M.attach_image(_docs(spark, sf_dir).filter(F.col("doc_id") < 100))
    feats = M.decode_image_features(d)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round("mean_byte", 4).alias("mean_byte"),
        F.element_at("hist", 1).alias("hist_bin0"),
        F.element_at("hist", 16).alias("hist_bin15"),
    )
