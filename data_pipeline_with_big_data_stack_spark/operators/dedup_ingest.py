"""Streaming ingestion dedup against an accumulated signature index —
the production 100 TB fuzzy-dedup shape (reference analogue: the
continuous-ingest path of `M/app_airflow/app/dags/goes_satellite_etl.py`
feeding Druid; here the stream is document batches and the rollup is a
banded MinHash index).

Every micro-batch:
  1. signs the batch (MinHash bands, `operators/dedup_index`),
  2. caps bucket membership at the batch family's ``_LSH_MAX_BUCKET``
     using a **per-bucket count sidecar** — NOT a re-aggregation of the
     accumulated bands index, so per-batch planning cost is bounded by
     the sidecar (one row per (bucket, epoch) touched), never
     O(accumulated index),
  3. joins the capped batch bands against the prior index on the bucket
     key for candidate pairs (lower-id partner only),
  4. exact-verifies trigram Jaccard on candidates (raw text joined to
     candidate-scale rows only), and
  5. publishes the batch's rejections, bands, counts, and documents.

Exactly-once under foreachBatch retry: EVERY sink — decisions, bands
index, counts sidecar, doc store — is a per-epoch ``batch_id=<eid>``
partition written with ``mode('overwrite')``, and every *read* of prior
state filters ``batch_id < eid`` (partition-pruned). A crash anywhere in
:func:`dedup_ingest_batch` replays the epoch against exactly the same
prior state (its own half-written partition is excluded by the filter
and then overwritten), so retry ≡ single run for all four stores.
This is the same per-epoch-partition idempotence device as the rollup
store's staged publish (`operators/rollup_maintenance`), applied to all
side stores rather than just the result sink.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_SINKS = ("decisions", "bands_idx", "counts", "docstore")


class DedupIngestStore:
    """Paths + schemas for the four per-epoch-partitioned sinks."""

    def __init__(self, base: str):
        self.base = base
        self.decisions = os.path.join(base, "decisions")
        self.bands_idx = os.path.join(base, "bands_idx")
        self.counts = os.path.join(base, "counts")
        self.docstore = os.path.join(base, "docstore")


def init_dedup_ingest_store(spark: SparkSession, base: str) -> DedupIngestStore:
    """Seed each sink with an empty ``batch_id=-1`` partition so root
    reads discover the partition column before the first epoch lands."""
    st = DedupIngestStore(base)
    seeds = {
        st.decisions: "doc_id long, dup_of long, jaccard double",
        st.bands_idx: "doc_id long, band int, band_key string, rk long",
        st.counts: "band int, band_key string, n long",
        st.docstore: "doc_id long, text string",
    }
    for path, schema in seeds.items():
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            os.path.join(path, "batch_id=-1")
        )
    return st


def _prior(spark: SparkSession, path: str, eid: int) -> DataFrame:
    """Committed state as of epoch ``eid``: partition-pruned to
    ``batch_id < eid`` so a replayed epoch never sees its own
    half-written rows, then the partition column dropped."""
    return (
        spark.read.parquet(path)
        .filter(F.col("batch_id") < F.lit(int(eid)))
        .drop("batch_id")
    )


def dedup_ingest_batch(
    batch: DataFrame,
    eid: int,
    store: DedupIngestStore,
    *,
    tau: float = 0.8,
    max_bucket: int = 256,
    fail_after: str | None = None,
) -> None:
    """Process one micro-batch (the foreachBatch body). Deterministic
    given (batch contents, prior committed epochs); idempotent under
    retry — see module docstring.

    ``fail_after`` is a crash-injection hook for tests: one of
    ``'decisions' | 'bands_idx' | 'counts' | 'docstore'`` raises
    RuntimeError immediately after that sink's write, simulating a crash
    between the write and the checkpoint commit.
    """
    from data_pipeline_with_big_data_stack_spark.operators.dedup_index import (
        minhash_signatures,
        verify_jaccard,
    )

    s = batch.sparkSession
    if batch.isEmpty():
        return
    eid = int(eid)

    bands = minhash_signatures(batch).select(
        "doc_id",
        F.posexplode(F.array("band0", "band1", "band2")).alias("band", "band_key"),
    )
    w = W.partitionBy("band", "band_key").orderBy("doc_id")
    new_ranked = bands.withColumn("brk", F.row_number().over(w))
    # per-bucket prior occupancy from the SIDECAR (one row per touched
    # (bucket, epoch)) — the bands index itself is never aggregated here
    prior_counts = (
        _prior(s, store.counts, eid)
        .groupBy("band", "band_key")
        .agg(F.max("n").alias("prior_n"))
    )
    capped = (
        new_ranked.join(prior_counts, ["band", "band_key"], "left")
        .withColumn("rk", F.coalesce("prior_n", F.lit(0)) + F.col("brk"))
        .filter(F.col("rk") <= max_bucket)
        .select("doc_id", "band", "band_key", "rk")
    )
    prior_bands = _prior(s, store.bands_idx, eid)
    all_bands = prior_bands.unionByName(capped)
    cand = (
        capped.alias("n")
        .join(all_bands.alias("p"), ["band", "band_key"])
        .filter(F.col("p.doc_id") < F.col("n.doc_id"))
        .select(
            F.col("p.doc_id").alias("doc_a"),
            F.col("n.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # verify via operators/dedup_index.verify_jaccard: joins move raw
    # text, shingling runs AFTER them on candidate-scale rows only —
    # per-batch verify compute is O(candidates), never O(store)
    texts = _prior(s, store.docstore, eid).unionByName(batch)
    ver = verify_jaccard(cand, texts, threshold=tau)
    wv = W.partitionBy("doc_b").orderBy("doc_a")
    rejected = (
        ver.withColumn("vrk", F.row_number().over(wv))
        .filter(F.col("vrk") == 1)
        .select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("dup_of"),
            "jaccard",
        )
    )
    # capped feeds three sinks (decisions via cand, the index partition,
    # the counts partition) — persist so the signature pipeline and the
    # rank window run once per batch
    capped.persist()
    try:
        part = f"batch_id={eid}"
        rejected.write.mode("overwrite").parquet(
            os.path.join(store.decisions, part)
        )
        if fail_after == "decisions":
            raise RuntimeError("injected crash after decisions write")
        capped.write.mode("overwrite").parquet(
            os.path.join(store.bands_idx, part)
        )
        if fail_after == "bands_idx":
            raise RuntimeError("injected crash after bands_idx write")
        # this epoch's sidecar rows: the new cumulative occupancy of
        # every bucket it touched (rk is already cumulative)
        capped.groupBy("band", "band_key").agg(F.max("rk").alias("n")).write.mode(
            "overwrite"
        ).parquet(os.path.join(store.counts, part))
        if fail_after == "counts":
            raise RuntimeError("injected crash after counts write")
        batch.select("doc_id", "text").write.mode("overwrite").parquet(
            os.path.join(store.docstore, part)
        )
        if fail_after == "docstore":
            raise RuntimeError("injected crash after docstore write")
    finally:
        capped.unpersist()


def run_dedup_ingest_stream(
    spark: SparkSession,
    src: str,
    store: DedupIngestStore,
    *,
    tau: float = 0.8,
    max_bucket: int = 256,
    fail_epoch: int | None = None,
    fail_after: str | None = None,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``src`` (a parquet file-source dir of (doc_id, text)
    chunks) through :func:`dedup_ingest_batch` with availableNow.
    ``fail_epoch``/``fail_after`` inject one crash for recovery tests;
    restarting without them resumes from the checkpoint."""

    def process(batch: DataFrame, eid: int) -> None:
        dedup_ingest_batch(
            batch,
            eid,
            store,
            tau=tau,
            max_bucket=max_bucket,
            fail_after=fail_after if eid == fail_epoch else None,
        )

    # single-writer lock for the drain: the store compactor
    # (compact_dedup_ingest_store) swaps sink directories wholesale, so
    # a drain racing it could write epoch partitions into a dir about
    # to be renamed away — same lock machinery as the ANN index /
    # rollup-store writers, stale-holder reclaim included
    from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
        _index_write_lock,
    )

    lease = _index_write_lock(spark, store.base)
    try:
        st = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(src)
        )
        q = (
            st.writeStream.foreachBatch(process)
            .option("checkpointLocation", os.path.join(store.base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        lease.release()


def compact_dedup_ingest_store(
    spark: SparkSession, store: DedupIngestStore, target_file_bytes: int = 128 * 1024 * 1024
) -> dict[str, int]:
    """Small-file hygiene for a long-running ingest: every epoch appends
    ~1 file per sink per shuffle partition, so thousands of micro-batches
    accumulate thousands of tiny files. Fold all COMMITTED epochs of each
    sink into the single highest committed ``batch_id`` partition via
    ``layout.compact_table``'s staged-rename protocol (crash mid-swap
    heals on the next call). Monotonic epoch ids make this safe: Spark
    never reuses a committed batch id after restart, so every future
    epoch's ``batch_id < eid`` prior-filter still covers the folded
    partition. Holds the store's single-writer lock (shared with
    :func:`run_dedup_ingest_stream`'s drain) so a compaction can never
    rename a sink out from under a live micro-batch. Returns the new
    per-sink file counts."""
    from data_pipeline_with_big_data_stack_spark.operators.ann_index import (
        _index_write_lock,
    )

    lease = _index_write_lock(spark, store.base)
    try:
        return _compact_sinks(spark, store, target_file_bytes)
    finally:
        lease.release()


def _compact_sinks(
    spark: SparkSession, store: DedupIngestStore, target_file_bytes: int
) -> dict[str, int]:
    from data_pipeline_with_big_data_stack_spark.operators.layout import (
        recover_compaction,
        table_files,
    )

    out: dict[str, int] = {}
    for sink in _SINKS:
        path = getattr(store, sink)
        recover_compaction(path)
        parts = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(path)
            if d.startswith("batch_id=")
        )
        hi = parts[-1]
        df = spark.read.parquet(path).drop("batch_id")
        staging = path.rstrip("/") + "__compacting"
        files = table_files(spark, path)
        total = max(1, sum(os.path.getsize(f) for f in files))
        n_out = max(1, -(-total // target_file_bytes))
        df.repartition(int(n_out)).write.mode("overwrite").parquet(
            os.path.join(staging, f"batch_id={hi}")
        )
        # seed partition so root reads still discover batch_id even if
        # every data row folded away
        spark.read.parquet(path).limit(0).drop("batch_id").write.mode(
            "overwrite"
        ).parquet(os.path.join(staging, "batch_id=-1"))
        backup = path.rstrip("/") + "__precompact"
        os.rename(path, backup)
        os.rename(staging, path)
        import shutil

        shutil.rmtree(backup, ignore_errors=True)
        out[sink] = len(table_files(spark, path))
    return out


def stage_ordered_chunks(
    spark: SparkSession, docs: DataFrame, n_chunks: int = 4
) -> tuple[str, str]:
    """Write ``docs`` as ``n_chunks`` single-file parquet chunks in
    ascending doc_id ranges with ascending mtimes, so the file source
    streams them in id order (the crawl-shard arrival contract the
    batch oracle's full-corpus replay assumes). Returns (base, src)."""
    base = tempfile.mkdtemp(prefix="dedup_ingest_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).head()
    span = max(1, (hi - lo + 1))
    for i in range(n_chunks):
        a = lo + span * i // n_chunks
        b = lo + span * (i + 1) // n_chunks
        chunk = docs.filter((F.col("doc_id") >= a) & (F.col("doc_id") < b))
        tmp = os.path.join(base, f"tmp_{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"chunk_{i}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return base, src
