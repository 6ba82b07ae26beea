"""Stream execution helpers: sources, sinks, and run-to-completion.

The reference's streaming loop is Kafka topic → Druid supervisor
(SURVEY §2.9); locally there is no broker, so tests and the bench drive
the same plans through the file source (JSON drop-dir — the S8/S12 shape)
with ``availableNow`` triggers, which exercises checkpointing, offset
tracking, and restart-resume exactly as a Kafka-fed deployment would.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def json_dir_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a JSON drop directory (streaming twin of
    S8/S12 — ``real_data_etl.py:150-194`` polls a drop dir per DAG run;
    here the engine tails it continuously). ``maxFilesPerTrigger`` is the
    file-source analogue of Kafka's ``maxOffsetsPerTrigger`` (T6)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Built-in rate source — the engine's synthetic tick generator twin
    (S16 ``demoKafka.py:24-49`` emits one record per tick)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def run_available_now(
    df: DataFrame,
    checkpoint: str,
    query_name: str | None = None,
    output_mode: str = "update",
    timeout_s: int = 120,
) -> DataFrame:
    """Run a streaming DataFrame to exhaustion of currently-available
    input (``trigger(availableNow=True)``) into a memory sink and return
    the result as a batch DataFrame. Test/bench harness only — production
    sinks are parquet (``ingest.write_stream``) or Kafka."""
    name = query_name or f"q_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError(f"stream {name} did not drain in {timeout_s}s")
    return df.sparkSession.table(name)


def run_to_parquet_available_now(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    timeout_s: int = 120,
) -> None:
    """Drain currently-available input into a parquet sink (append mode,
    exactly-once via the checkpoint WAL — a strict upgrade over the
    reference's at-least-once Kafka produce, SURVEY §2.9 T8)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    q.awaitTermination(timeout_s)
    if q.isActive:  # pragma: no cover - hang guard
        q.stop()
        raise TimeoutError(f"parquet stream did not drain in {timeout_s}s")
