"""Ingestion compiler: DatasourceSpec + source DataFrame → canonical table.

Mirrors what a Druid Kafka-ingestion supervisor does to every record
(SURVEY §2.1 S18): apply ``timestampSpec`` (posix → ``__time``), apply
``dimensionsSpec`` (typed cast/select), floor to ``queryGranularity``,
optionally rollup, and write time-partitioned columnar storage
(``segmentGranularity`` DAY/HOUR → partition columns). The streaming twin
applies the same plan to a ``readStream`` DataFrame.

Scale notes (100 TB design):
- storage is Parquet partitioned by ``__date`` (and ``__hour`` for HOUR
  segments) → partition pruning replicates Druid's segment pruning for
  any ``__time`` predicate on the partition column;
- ``maxRecordsPerFile`` maps Druid's ``maxRowsPerSegment`` → bounded file
  sizes regardless of executor count;
- rollup (when enabled) runs partial aggregation map-side before the one
  shuffle on (floored time, dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators.cleanup import cast_dimensions, parse_event_time
from data_pipeline_with_big_data_stack_spark.schemas import DatasourceSpec

# Druid's standard granularity ladder → date_trunc units. FIFTEEN_MINUTE
# and friends have no date_trunc unit and are floored arithmetically.
_GRAIN_TO_UNIT = {
    "SECOND": "second",
    "MINUTE": "minute",
    "HOUR": "hour",
    "DAY": "day",
    "WEEK": "week",
    "MONTH": "month",
    "QUARTER": "quarter",
    "YEAR": "year",
}
_GRAIN_TO_SECONDS = {"FIFTEEN_MINUTE": 900, "THIRTY_MINUTE": 1800,
                     "FIVE_MINUTE": 300, "TEN_MINUTE": 600}


def _floor_time(grain: str, col):
    if grain in _GRAIN_TO_UNIT:
        return F.date_trunc(_GRAIN_TO_UNIT[grain], col)
    if grain in _GRAIN_TO_SECONDS:
        secs = _GRAIN_TO_SECONDS[grain]
        return F.timestamp_seconds(
            (F.unix_timestamp(col) / secs).cast("long") * secs
        )
    raise ValueError(
        f"unsupported queryGranularity {grain!r}; supported: "
        f"{sorted(_GRAIN_TO_UNIT) + sorted(_GRAIN_TO_SECONDS)} or NONE"
    )


def compile_transform(spec: DatasourceSpec, source: DataFrame) -> DataFrame:
    """The supervisor's record pipeline as one declarative plan:
    timestamp parse → dimension cast → query-granularity floor →
    optional rollup."""
    ts = parse_event_time(spec.timestamp.column, spec.timestamp.format)
    df = source.withColumn("__time", ts)
    df = cast_dimensions(df, spec.schema())

    if spec.granularity.query != "NONE":
        df = df.withColumn(
            "__time", _floor_time(spec.granularity.query, F.col("__time"))
        )

    if spec.granularity.rollup:
        # rollup=true semantics (A8): pre-aggregate identical
        # (floored time, dims) rows at ingest with a count metric.
        dims = [d.name for d in spec.dimensions]
        df = df.groupBy("__time", *dims).agg(F.count(F.lit(1)).alias("__count"))
    return df


def partition_columns(spec: DatasourceSpec) -> list[str]:
    return ["__date", "__hour"] if spec.granularity.segment == "HOUR" else ["__date"]


def with_partition_columns(spec: DatasourceSpec, df: DataFrame) -> DataFrame:
    out = df.withColumn("__date", F.to_date("__time"))
    if spec.granularity.segment == "HOUR":
        out = out.withColumn("__hour", F.hour("__time"))
    return out


def write_batch(
    spec: DatasourceSpec,
    df: DataFrame,
    path: str,
    mode: str = "append",
    register_as: str | None = None,
) -> None:
    """Write the canonical table: time-partitioned parquet with bounded
    file sizes (Druid ``maxRowsPerSegment`` — e.g.
    ``M/druid-goes-satellite-datasource.json:17``)."""
    out = with_partition_columns(spec, df)
    writer = (
        out.write.mode(mode)
        .option("maxRecordsPerFile", spec.max_rows_per_segment)
        .partitionBy(*partition_columns(spec))
    )
    writer.parquet(path)
    if register_as:
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {register_as}")
        spark.catalog.createTable(register_as, path=path, source="parquet")
        try:  # pick up the partitions for the metastore-backed table
            spark.sql(f"MSCK REPAIR TABLE {register_as}")
        except Exception as exc:
            # path-based datasource tables discover partitions at read
            # time; surface (don't hide) a real repair failure
            import warnings

            warnings.warn(
                f"MSCK REPAIR TABLE {register_as} failed: {exc}; if the "
                "metastore manages file-source partitions, queries may "
                "see no rows until a manual repair",
                stacklevel=2,
            )


def ingest_batch(
    spec: DatasourceSpec,
    source: DataFrame,
    path: str,
    mode: str = "append",
    register_as: str | None = None,
) -> DataFrame:
    df = compile_transform(spec, source)
    write_batch(spec, df, path, mode=mode, register_as=register_as)
    return df.sparkSession.read.parquet(path)


# fixed-length granularities a streaming rollup window can express;
# MONTH/QUARTER/YEAR are calendar-variable and stay batch-only
_GRAIN_FIXED_SECONDS = {
    "SECOND": 1,
    "MINUTE": 60,
    "HOUR": 3600,
    "DAY": 86400,
    "WEEK": 604800,
    **_GRAIN_TO_SECONDS,
}


def compile_stream(
    spec: DatasourceSpec,
    stream: DataFrame,
    rollup_watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``compile_transform`` for a readStream source
    that already carries the topic's JSON-parsed columns. Raw (non-rollup)
    ingestion is append-mode with NO watermark — exact parity with
    Druid's accept-any-lateness segments (SURVEY §2.9 T5).

    ``rollup: true`` becomes a watermarked tumbling-window count at the
    query granularity: same (__time, dims, __count) schema as batch
    rollup, with ``__time`` = window start. The watermark is the
    documented T5 deviation — an aggregating stream must bound its
    state, so events later than ``rollup_watermark`` are dropped rather
    than merged into an already-emitted rollup row (Druid would merge
    them; its own supervisors all run ``rollup: false``,
    ``M/druid-goes-satellite-datasource.json:22``). In append output
    mode a rollup row emits once its window falls behind the watermark —
    exactly-once parquet semantics preserved."""
    if spec.granularity.rollup:
        grain = spec.granularity.query
        if grain not in _GRAIN_FIXED_SECONDS:
            raise ValueError(
                f"streaming rollup needs a fixed-length queryGranularity, "
                f"got {grain!r}; use batch rollup (ingest_batch) for "
                "calendar granularities or NONE"
            )
        ts = parse_event_time(spec.timestamp.column, spec.timestamp.format)
        df = cast_dimensions(stream.withColumn("__time", ts), spec.schema())
        dims = [d.name for d in spec.dimensions]
        win = F.window("__time", f"{_GRAIN_FIXED_SECONDS[grain]} seconds")
        out = (
            df.withWatermark("__time", rollup_watermark)
            .groupBy(win.alias("w"), *dims)
            .agg(F.count(F.lit(1)).alias("__count"))
        )
        return out.select(F.col("w.start").alias("__time"), *dims, "__count")
    return compile_transform(spec, stream)


def write_stream(
    spec: DatasourceSpec,
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_seconds: int | None = None,
):
    out = with_partition_columns(spec, df)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_columns(spec))
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def kafka_json_stream(
    spark: SparkSession,
    spec: DatasourceSpec,
    bootstrap_servers: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S18: Kafka topic of JSON objects → typed columns per the spec.
    ``useEarliestOffset: true`` in every reference supervisor
    (``M/druid-goes-satellite-datasource.json:13``) → startingOffsets
    "earliest"; exactly-once resume comes from the sink checkpoint."""
    import pyspark.sql.types as T

    raw_fields = [
        T.StructField(spec.timestamp.column, T.StringType())
    ] + [T.StructField(d.name, T.StringType()) for d in spec.dimensions]
    raw_schema = T.StructType(raw_fields)
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", spec.topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.from_json(F.col("value").cast("string"), raw_schema).alias("r"))
        .select("r.*")
    )


def to_kafka_json(df: DataFrame) -> DataFrame:
    """S17: record → JSON value column for a Kafka sink
    (``json.dumps`` producer serializer, ``goes_satellite_etl.py:41-43``)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))
