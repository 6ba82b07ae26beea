"""Canonical table access for the driver's parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under an ``sf_dir``.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


# Scan-stage parallelism floor — OPT-IN, for compute-heavy pipelines
# only. A parquet scan yields at most one non-empty task per ROW GROUP
# regardless of split planning, and the scan stage also runs every
# narrow transformation fused above it (shingling, minhash, regex
# tokenization, partial aggregation) — so a big single-row-group file
# serializes all that compute on one core. Callers whose per-row
# compute dwarfs a row's shuffle cost pass ``rebalance=True`` to
# redistribute the (column-pruned) scan output first. Cheap pipelines
# (plain joins, thin aggregations) must NOT opt in: for them the extra
# round-robin exchange is pure overhead — measured 2-3× slowdowns on
# sub-second queries. At production scale tables span many files/row
# groups, the guard fails, and the opt-in is a no-op — no extra
# exchange appears in an at-scale plan.
_REBALANCE_MIN_BYTES = 512 * 1024  # below this the table is broadcast-class


@functools.lru_cache(maxsize=64)
def _row_groups(path: str, _mtime: float) -> int:
    try:
        import pyarrow.parquet as pq

        return max(1, pq.ParquetFile(path).metadata.num_row_groups)
    except Exception:  # non-local FS or exotic layout: assume splittable
        return 1 << 30


def _scan_rebalance(df: DataFrame, path: str) -> DataFrame:
    if not os.path.isfile(path):  # multi-file dataset: already splittable
        return df
    size = os.path.getsize(path)
    if size < _REBALANCE_MIN_BYTES:
        return df
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if _row_groups(path, os.path.getmtime(path)) >= parallelism:
        return df
    return df.repartition(parallelism)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    from data_pipeline_with_big_data_stack_spark.session import prepare_session

    prepare_session(spark)  # nanosAsLong must be set before the read
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    # Nano-precision timestamp columns arrive as epoch-nano longs (see
    # session._RUNTIME_CONF); convert to TimestampType at micro precision.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Defensive: if inferTimestampNTZ was set before this session's conf
    # took effect (or a cached scan kept it), normalize NTZ → session-UTC
    # TIMESTAMP so watermarks and epoch arithmetic work uniformly.
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return _scan_rebalance(df, path) if rebalance else df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load the requested tables (all by default) as DataFrames."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> None:
    """Register temp views named after the tables (mirrors the DuckDB
    oracle environment, where the same names are pre-registered views)."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
