"""External system sources (SURVEY §2.1 S9-S12): JDBC, Mongo, object
storage. All are *reader builders* — they declare the scan + pushdown and
return lazily; no external service exists in the test container, so tests
exercise plan construction and the pushdown predicates against local
stand-in DataFrames, and a deployment only needs the driver jar on the
classpath.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def jdbc_query(
    spark: SparkSession,
    url: str,
    query: str,
    user: str | None = None,
    password: str | None = None,
    fetchsize: int = 10_000,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound: str | None = None,
    upper_bound: str | None = None,
):
    """S9 (`database_etl.py:20-78`): SQL pushed to the source database.

    At scale, pass ``partition_column``/bounds/``num_partitions`` so the
    scan issues N parallel range-partitioned queries instead of one
    single-threaded cursor — the JDBC equivalent of a parallel file scan.
    Returns the configured ``DataFrameReader`` (call ``.load()``).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .option("fetchsize", str(fetchsize))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader


def incremental_predicate(ts_col: str, lookback_hours: int = 1):
    """S10's incremental window (`database_etl.py:99-111`:
    ``order_date >= NOW() - INTERVAL 1 HOUR``) as a reusable Column
    predicate — applied to a JDBC table read it is pushed down to the
    source; applied to a DataFrame it prunes partitions/row-groups."""
    return F.col(ts_col) >= F.current_timestamp() - F.expr(
        f"INTERVAL {lookback_hours} HOURS"
    )


def jdbc_incremental(
    spark: SparkSession,
    url: str,
    table: str,
    ts_col: str,
    lookback_hours: int = 1,
    **kwargs,
):
    """S10: time-windowed incremental pull with the filter pushed into
    the source DB (visible as PushedFilters in the scan)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(kwargs.get("fetchsize", 10_000)))
    )
    for k, v in kwargs.items():
        if k != "fetchsize":
            reader = reader.option(k, str(v))
    # .load() then .filter() — Spark pushes the timestamp comparison down
    return reader, incremental_predicate(ts_col, lookback_hours)


def mongo_collection(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    lookback_hours: int | None = 1,
):
    """S11 (`database_etl.py:131-171`): Mongo scan with a $gte time
    filter. Requires the mongo-spark connector on the classpath; raises
    ImportError-shaped guidance otherwise (container ships none)."""
    reader = (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
    )
    if lookback_hours is not None:
        # aggregation pipeline pushdown — the connector sends this to mongod
        reader = reader.option(
            "aggregation.pipeline",
            f'[{{"$match": {{"timestamp": {{"$gte": '
            f'{{"$dateSubtract": {{"startDate": "$$NOW", "unit": "hour", '
            f'"amount": {lookback_hours}}}}}}}}}}}]',
        )
    return reader


def object_store_json(
    spark: SparkSession, path: str, multiline: bool = False
) -> DataFrame:
    """S12 (`database_etl.py:173-218`): JSON objects under a bucket
    prefix, with per-file provenance. Works identically for s3a:// gcs://
    abfss:// and local paths; arrays of records explode natively."""
    df = spark.read.option("multiLine", str(multiline).lower()).json(path)
    return df.withColumn(
        "file_name",
        F.element_at(F.split(F.input_file_name(), "/"), -1),
    )
