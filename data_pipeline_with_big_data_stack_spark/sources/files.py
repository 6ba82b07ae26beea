"""File-based source readers (SURVEY §2.1 S8, S12, S13, S21).

Each reader returns the same record shape the reference's DAG produces,
but as a distributed scan with pushdown-friendly options instead of a
driver-side pandas loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Combined-log-format regex — semantics of ``database_etl.py:231`` (the
# web-log parser S13), field-per-group.
COMBINED_LOG_PATTERN = (
    r'^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) [^"]*" (\d{3}) (\d+|-)'
    r' "([^"]*)" "([^"]*)"'
)


def csv_directory(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """S8: read every ``*.csv`` under ``path``; enrich each row with
    ``source_file`` and an extraction timestamp
    (``real_data_etl.py:150-194``). Schema inference mirrors the
    reference's pandas behavior; production callers pass a schema."""
    df = (
        spark.read.option("header", header)
        .option("inferSchema", infer_schema)
        .option("pathGlobFilter", "*.csv")
        .csv(path)
    )
    return df.withColumn(
        "source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    ).withColumn("timestamp", F.unix_timestamp(F.current_timestamp()))


def json_objects(
    spark: SparkSession,
    path: str,
    multiline: bool = True,
) -> DataFrame:
    """S12: read ``*.json`` objects (array-of-records files exploded
    natively), enriched with provenance ``file_name``
    (``database_etl.py:173-218``)."""
    df = (
        spark.read.option("multiLine", multiline)
        .option("pathGlobFilter", "*.json")
        .json(path)
    )
    return df.withColumn(
        "file_name", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


def web_access_logs(spark: SparkSession, path: str) -> DataFrame:
    """S13: combined-log-format text → structured records
    (``database_etl.py:220-263``): ip, method, url, int status/size,
    referer, user_agent, plus provenance."""
    lines = spark.read.text(path)
    v = F.col("value")
    pat = COMBINED_LOG_PATTERN
    size = F.regexp_extract(v, pat, 6)
    return (
        lines.filter(v.rlike(pat))
        .select(
            F.regexp_extract(v, pat, 1).alias("ip_address"),
            F.regexp_extract(v, pat, 2).alias("log_time"),
            F.regexp_extract(v, pat, 3).alias("method"),
            F.regexp_extract(v, pat, 4).alias("url"),
            F.regexp_extract(v, pat, 5).cast("int").alias("status_code"),
            F.when(size == "-", 0).otherwise(size.cast("int")).alias("response_size"),
            F.regexp_extract(v, pat, 7).alias("referer"),
            F.regexp_extract(v, pat, 8).alias("user_agent"),
        )
        .withColumn("timestamp", F.unix_timestamp(F.current_timestamp()))
        .withColumn("source", F.lit("web_logs"))  # database_etl.py:252
    )


def archive_processed(fs_dir: str, processed_dir: str, files: list[str]) -> list[str]:
    """S21: move-after-process archival for batch file sources
    (``goes_satellite_etl.py:298-301``). Streaming reads get the same
    semantics from ``cleanSource=archive`` instead."""
    os.makedirs(processed_dir, exist_ok=True)
    moved = []
    for name in files:
        src = os.path.join(fs_dir, name)
        if os.path.exists(src):
            dst = os.path.join(processed_dir, name)
            os.replace(src, dst)
            moved.append(dst)
    return moved


def streaming_csv_directory(
    spark: SparkSession,
    path: str,
    schema,
    archive_dir: str | None = None,
) -> DataFrame:
    """Streaming twin of S8+S21: file-source stream with
    archive-after-process semantics."""
    reader = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("pathGlobFilter", "*.csv")
        .option("maxFilesPerTrigger", 1000)
    )
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    df = reader.csv(path)
    return df.withColumn(
        "source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )


def write_orc_table(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Columnar interchange sink #2: ORC (built into Spark alongside
    parquet). Same pushdown/pruning properties; some warehouses
    standardize on it, so the engine reads AND writes both."""
    w = df.write.mode("overwrite").format("orc")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_orc_table(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — predicate pushdown and column pruning reach the
    reader exactly as with parquet (pinned in tests/test_plans.py)."""
    return spark.read.orc(path)
