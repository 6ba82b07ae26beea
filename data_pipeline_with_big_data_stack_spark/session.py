"""Session factory with scale-aware defaults.

The reference enables AQE explicitly for its one Spark job
(``M/app_airflow/app/dags/demoSpark.py:16-21``); we adopt that and add the
settings that matter for a 1000-executor / 100 TB deployment: adaptive
coalescing + skew-join handling, Arrow for the (rare) pandas-UDF path, UTC
session time so event-time semantics are engine-independent.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SCRATCH_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """Session-scoped scratch directory for queries that materialize a
    store/index/checkpoint as part of their oracle-replay shape. All
    scratch lands under ONE per-process root removed at interpreter
    exit (ADVICE r14: per-invocation ``tempfile.mkdtemp`` leaked an
    ivfpq_rerank_* dir into /tmp on every gate/bench run, and the same
    accretion pattern ran across the whole IVF-PQ / rollup / streaming
    query family). Cleanup is at EXIT, not per query, because callers
    return lazy DataFrames that read the directory only when the
    harness collects them."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)

# Runtime-settable confs we also re-assert on externally provided sessions
# (the driver harness hands us its own SparkSession).
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet TIMESTAMP(NANOS) columns (e.g. the events fixture) are
    # rejected by Spark 4 by default; read them as epoch-nano longs and
    # let the table loader convert to TimestampType (micro truncation).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive (isAdjustedToUTC=false) parquet timestamps must read as
    # session-UTC TIMESTAMP, not TIMESTAMP_NTZ: event-time watermarks
    # require TimestampType, and the DuckDB oracle treats the same bytes
    # as UTC-naive. Fixture dtype drift (ns → naive µs) flipped this on
    # us in round 2; pin it off.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def get_spark(
    app_name: str = "data_pipeline_with_big_data_stack_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Local test/bench mode: ``local[$SPARK_GRAFT_CPUS]`` (default 32). On a
    real cluster the caller passes ``master=None`` and spark-submit confs
    win; nothing here assumes single-node.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local mode: ~cores. Cluster deployments override via spark-submit
        # (or rely on AQE coalescing from a higher initial value).
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # reliable checkpoints written by session.materialize are
        # reclaimed when their RDD is GC'd instead of accumulating
        # forever on the checkpoint filesystem (context-creation-time
        # conf — cannot be asserted later by prepare_session)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def materialize(df):
    """Cut lineage and pin an intermediate that multiple consumers or an
    iterative loop will re-read (CC label propagation, BPE rounds, the
    MG sketch, q15's revenue table, semdedup assignments, rollup
    read-backs).

    THE one checkpoint-policy decision point (VERDICT r6 #4 — eight call
    sites previously re-justified the same trade individually):

    - When a checkpoint directory is configured — either
      ``sparkContext.setCheckpointDir(...)`` was called or
      ``SPARK_GRAFT_CHECKPOINT_DIR`` is set (picked up here on first
      use) — use a RELIABLE checkpoint: blocks live on the configured
      (HDFS/object-store) path and survive executor loss, the right
      default on a real cluster.
    - Otherwise fall back to ``localCheckpoint(eager=True)``:
      executor-local shuffle-block storage, no distributed-FS round
      trip — but an executor loss between materialization and the last
      consumer fails the query and the OUTER retry recomputes (the
      failure analysis q15's docstring walks through). Fine on
      local[...] test/bench runs, which is why it is the no-config
      default.

    Either way the returned plan's lineage is cut eagerly.

    Storage lifecycle: localCheckpoint blocks are freed by the
    ContextCleaner when the returned DataFrame is GC'd — loops (BPE/CC)
    drop references each round, bounding live storage at one round's
    blocks. Reliable checkpoint DIRECTORIES are only auto-deleted when
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` is on —
    :func:`get_spark` sets it, but it is context-creation-time only, so
    on an externally built session configure it yourself or prune the
    checkpoint dir on a schedule. The plan is persisted around a
    reliable checkpoint so its lineage runs once, not twice (RDD
    checkpointing recomputes in the checkpoint-write job otherwise)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        env_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        if env_dir:
            sc.setCheckpointDir(env_dir)
    if sc.getCheckpointDir() is not None:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist()
    return df.localCheckpoint(eager=True)


def prepare_session(spark: SparkSession) -> SparkSession:
    """Assert engine-critical runtime confs on an externally built session.

    Every conf here is runtime-settable. UTC session time in particular is
    required for event-time parity with the DuckDB oracle (duckdb
    timestamps are UTC-naive).
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - non-settable conf on some builds
            pass
    return spark
