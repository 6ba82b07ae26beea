"""Incremental materialized-rollup maintenance — the hypertable
"continuous aggregate" / Druid auto-compaction pattern.

A materialized rollup (hourly per-dimension aggregates, parquet
partitioned by day) must absorb late or newly arrived raw events
WITHOUT rescanning history. The maintenance step:

1. derives the set of day partitions the new batch touches (one tiny
   distinct over the batch),
2. reads ONLY those partitions back from the rollup store (partition
   pruning does the work — the unaffected history is never opened),
3. merges mergeable partial aggregates (count, sum; avg derives from
   them — never stored, since averages don't merge),
4. rewrites just the touched partitions via dynamic partition
   overwrite.

At 100 TB this is the difference between an O(new data) nightly job
and an O(history) one. Correctness contract: maintenance result ==
full recompute from all raw data, for any split/ordering of arrivals —
pinned by the oracled registry query (late batch applied incrementally
vs straight SQL over everything) and property tests over random
splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_DIMS = ("event_type",)  # default dims — callers can pass their own
ROLLUP_KEYS = ("__date", "bucket", *ROLLUP_DIMS)
_MERGEABLE = ("n_events", "sum_value_micros")
# every non-key column of a store; merge/serve derive a store's dims
# from its schema as (columns − metrics − time keys), so maintenance
# works on any dim set the store was built with
_METRIC_COLS = (
    "n_events",
    "sum_value_micros",
    "min_value_micros",
    "max_value_micros",
    "users_hll",
)


def store_dims(df: DataFrame) -> tuple[str, ...]:
    """The dimension columns of a rollup store DataFrame, in schema
    order — everything that isn't a time key or a metric."""
    skip = {"__date", "bucket", *_METRIC_COLS}
    return tuple(c for c in df.columns if c not in skip)
# Druid's HLLSketchBuild metric column: the rollup stores a mergeable
# user sketch per bucket (a few KB of binary) and unions it at merge /
# serve time — distinct counts over pre-aggregated data, the thing a
# plain count column can never give back. lgK=14 keeps the sketch in
# its exact regime far beyond fixture cardinality (verified exact at
# 1,098 distinct per served bucket = sf0.1; the gate runs at sf0.01
# with ≤150), so the serving query carries a full value oracle — the
# same exact-below-capacity device as the Theta/MG queries.
_SKETCH_LGK = 14


def _merge_exprs() -> list:
    """Aggregates that merge two rollup states: integer sums for the
    additive metrics, min/max for the extrema (Druid's longMin/longMax
    metric types — the documented "daily max" dashboard needs them),
    register-max union (order-independent) for the sketch column."""
    return [
        *[F.sum(c).alias(c) for c in _MERGEABLE],
        F.min("min_value_micros").alias("min_value_micros"),
        F.max("max_value_micros").alias("max_value_micros"),
        F.hll_union_agg("users_hll").alias("users_hll"),
    ]


def rollup_aggregate(
    events: DataFrame, dims: tuple[str, ...] = ROLLUP_DIMS
) -> DataFrame:
    """Raw events → hourly per-dimension partial aggregates (``dims``
    mirrors a Druid datasource's dimensionsSpec — any event columns).
    Totals are kept as exact integer micro-units so merge order can
    never change a result (same device as the streaming state
    accumulators); the distinct-user state is a mergeable HLL sketch."""
    return (
        events.withColumn("bucket", F.date_trunc("hour", "ts"))
        .withColumn("__date", F.to_date("bucket"))
        .groupBy("__date", "bucket", *dims)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "sum_value_micros"
            ),
            F.min(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "min_value_micros"
            ),
            F.max(F.round(F.col("value") * 1_000_000).cast("long")).alias(
                "max_value_micros"
            ),
            F.hll_sketch_agg("user_id", _SKETCH_LGK).alias("users_hll"),
        )
    )


def build_rollup(
    events: DataFrame, path: str, dims: tuple[str, ...] = ROLLUP_DIMS
) -> None:
    """Initial materialization, partitioned by day."""
    rollup_aggregate(events, dims).write.mode("overwrite").partitionBy(
        "__date"
    ).parquet(path)


def touched_slice(spark: SparkSession, path: str, touched: list) -> DataFrame:
    """The rollup rows for the touched day partitions ONLY — the isin
    filter lands in the scan's PartitionFilters, so unaffected history
    is never opened (plan-pinned in tests/test_plans.py)."""
    return spark.read.parquet(path).filter(F.col("__date").isin(touched))


def _store_exists(spark: SparkSession, path: str) -> bool:
    # Hadoop FS API so any scheme (file:, s3a:, hdfs:) answers correctly
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath)) and len(fs.listStatus(hpath)) > 0


def apply_increment(
    spark: SparkSession,
    path: str,
    new_events: DataFrame,
    dims: tuple[str, ...] = ROLLUP_DIMS,
) -> None:
    """Merge a new raw batch into the materialized rollup, touching only
    the day partitions the batch lands in. A missing/empty store is
    created from the batch (with ``dims`` — the first micro-batch of a
    streaming maintenance loop needs this); an existing store's dims
    are read from its schema, so maintenance follows whatever dim set
    the store was built with."""
    if not _store_exists(spark, path):
        build_rollup(new_events, path, dims)
        return
    # merge keys come from the STORE's schema, not the default — a
    # store built with custom dims maintains itself with them
    prev_all = spark.read.parquet(path)
    dims = store_dims(prev_all)
    inc = rollup_aggregate(new_events, dims)
    touched = [r["__date"] for r in inc.select("__date").distinct().collect()]
    if not touched:
        return
    # materialize the touched slice BEFORE the overwrite starts so the
    # job never reads a path it is concurrently replacing (the slice is
    # rollup rows for a handful of days — tiny)
    prev = prev_all.filter(F.col("__date").isin(touched)).localCheckpoint(
        eager=True
    )
    merged = (
        prev.unionByName(inc)
        .groupBy("__date", "bucket", *dims)
        .agg(*_merge_exprs())
    )
    # dynamic overwrite replaces exactly the touched partitions; history
    # partitions are neither read (partition-pruned filter above) nor
    # rewritten
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("__date").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


# grains the hourly store can serve: hour buckets nest EXACTLY inside
# every coarser date_trunc grain (date_trunc(g, date_trunc('hour', ts))
# == date_trunc(g, ts) for all of these), so re-aggregating the
# mergeable state is equal to aggregating raw events — never an
# approximation
SERVE_GRAINS = ("hour", "day", "week", "month", "quarter", "year")


def serve_rollup(
    spark: SparkSession,
    path: str,
    grain: str = "hour",
    dims: tuple[str, ...] = ("event_type",),
    with_distinct: bool = False,
) -> DataFrame:
    """Answer a time-bucketed dashboard aggregation FROM the
    materialized rollup — the Druid implicit-serving path (dashboards
    hit pre-aggregated segments, not raw data). Any ``grain`` coarser
    than the stored hour re-aggregates the mergeable partials; ``dims``
    must be a subset of the rollup dimensions (a dim can be dropped —
    partials merge — but never added back); avg derives at read time
    from the merged state. The plan scans only the rollup store: at
    100 TB the dashboard reads hours × types rows, not raw events —
    plan-pinned in tests/test_plans.py."""
    if grain not in SERVE_GRAINS:
        raise ValueError(f"grain {grain!r} not servable from an hourly rollup")
    r = spark.read.parquet(path)
    rollup_dims = set(store_dims(r))
    extra = set(dims) - rollup_dims
    if extra:
        raise ValueError(f"dims {sorted(extra)} not in the rollup (has {sorted(rollup_dims)})")
    aggs = [
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_value_micros").alias("_m"),
        F.min("min_value_micros").alias("_lo"),
        F.max("max_value_micros").alias("_hi"),
    ]
    extra_cols = []
    if with_distinct:
        # union the stored per-hour sketches up to the served grain —
        # distinct users over pre-aggregated data (Druid's
        # HLLSketchMerge at query time); exact in the sketch's
        # below-capacity regime, ±~1% beyond it
        aggs.append(
            F.hll_sketch_estimate(F.hll_union_agg("users_hll"))
            .cast("long")
            .alias("approx_users")
        )
        extra_cols = ["approx_users"]
    return (
        r.groupBy(F.date_trunc(grain, "bucket").alias("bucket"), *dims)
        .agg(*aggs)
        .select(
            "bucket",
            *dims,
            "n_events",
            F.round(F.col("_m") / 1_000_000, 4).alias("sum_value"),
            F.round(F.col("_m") / 1_000_000 / F.col("n_events"), 4).alias(
                "avg_value"
            ),
            F.round(F.col("_lo") / 1_000_000, 4).alias("min_value"),
            F.round(F.col("_hi") / 1_000_000, 4).alias("max_value"),
            *extra_cols,
        )
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The serving view: derived columns (avg) come from the mergeable
    state at read time."""
    r = spark.read.parquet(path)
    return r.select(
        "__date",
        "bucket",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("sum_value_micros") / 1_000_000).alias("sum_value"),
        (
            F.col("sum_value_micros") / 1_000_000 / F.col("n_events")
        ).alias("avg_value"),
    )


def register_rollup_store(
    spark: SparkSession, name: str, path: str, source_table: str
) -> None:
    """Catalog the materialized rollup like any ingested table (S20):
    metastore registration so the SQL surface sees it by name, plus a
    lineage edge (source → rollup, via maintenance) so ``upstream_of``
    answers where the pre-aggregates came from — the OpenMetadata
    pipeline-lineage story applied to the continuous aggregate."""
    from data_pipeline_with_big_data_stack_spark import catalog as C

    C.register_parquet_table(
        spark,
        name,
        path,
        comment=f"hourly rollup of {source_table} (count/sum/min/max/HLL)",
    )
    C.record_lineage(spark, [(source_table, name, "rollup_maintenance")])


def expire_partitions(spark: SparkSession, path: str, keep_from) -> list:
    """Druid's drop/kill retention rules for the rollup store: delete
    every day partition strictly OLDER than ``keep_from`` (a
    ``datetime.date`` or ISO string). Deletion is directory-level via
    the Hadoop FS API (any scheme), so it is O(dropped partitions) —
    history is never read, and the surviving store serves unchanged.
    Returns the dropped partition dates, oldest first.

    If the store is catalog-registered (:func:`register_rollup_store`),
    run ``MSCK REPAIR TABLE <name> [DROP PARTITIONS]`` afterwards — the
    metastore keeps partition entries for the deleted directories
    otherwise (pinned in tests/test_catalog_external.py)."""
    import datetime

    if isinstance(keep_from, str):
        keep_from = datetime.date.fromisoformat(keep_from)
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    dropped = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("__date="):
            continue
        day = datetime.date.fromisoformat(name.split("=", 1)[1])
        if day < keep_from:
            fs.delete(status.getPath(), True)
            dropped.append(day)
    return sorted(dropped)
