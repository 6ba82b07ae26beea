"""Streaming/incremental exact-substring dedup — the continuous-ingest
form of :func:`queries.curation.exact_substring_dedup` (the Lee et al.
2022 suffix-array dedup, re-expressed relationally; reference analogue:
the continuous-ingest path of
`M/app_airflow/app/dags/goes_satellite_etl.py` feeding Druid — here the
stream is crawl-shard document batches and the accumulated state is the
corpus's window-fingerprint index).

At 100 TB the production shape of exact-substring dedup is not a
full-corpus re-run per crawl drop: shards arrive continuously, each
batch is checked against the windows the corpus has ALREADY seen, and
only the index grows. Every micro-batch:

  1. explodes the batch's docs into fingerprinted sliding K-token
     windows (:func:`queries.curation.substring_windows` — the same
     guarded position packing and 128-bit fingerprint as the batch op),
  2. reads the accumulated window index pruned to committed epochs
     (``batch_id < eid``) AND the batch's touched fingerprint buckets —
     per-batch scan cost is O(touched fraction of the index), never
     O(accumulated index),
  3. marks a window occurrence duplicated iff its fingerprint exists in
     the prior index (any prior occurrence is strictly earlier — doc
     ids arrive monotone, the crawl-shard contract) OR an earlier
     occurrence exists within the batch (``pos != batch-min pos``),
  4. merges covered positions into disjoint per-doc spans
     (:func:`queries.curation.substring_span_accounting` — the doc is
     wholly contained in its batch, so span accounting is batch-local)
     and publishes the per-doc DECISIONS epoch, and
  5. appends the batch's NEW window fingerprints to the index.

**Batch-boundary independence (the correctness contract).** A window's
global first occurrence is its min packed position; positions grow with
doc id and ids arrive monotone, so every keep/remove decision depends
only on already-arrived data. The drained decisions therefore equal the
batch operator's full-corpus result for ANY chunking of the stream, and
the registry twin (``q_stream_exact_substring_dedup``) gates against
the SAME full-corpus DuckDB replay
(:data:`queries.curation.EXACT_SUBSTRING_ORACLE`).

**Exactly-once under foreachBatch retry.** Both sinks are per-epoch
``batch_id=<eid>`` static-overwrite partitions and every prior read
filters ``batch_id < eid`` — a replayed epoch sees exactly the prior
state the first attempt saw (its own half-written partition is excluded
then overwritten), the identical argument to `operators/dedup_ingest`.

**Index size and lifecycle.** The index holds 16 bytes + bucket per
DISTINCT corpus window — the suffix-array-equivalent state, linear in
corpus tokens and hash-bucket-partitioned (``bkt = pmod(hash(w1),
n_bkt)``). An unbounded ingest accretes one small partition per epoch;
the epoch-fold/compaction/generation lifecycle of
`operators/dedup_ingest` applies to this two-sink layout unchanged and
is deliberately not duplicated here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import fsio, segman
from data_pipeline_with_big_data_stack_spark.operators.dedup_ingest import (
    _META,
    MetaStoreBase,
    _write_epoch,
)

_SINKS = ("decisions", "windows_idx")
_SINK_SCHEMAS = {
    "decisions": (
        "doc_id long, n_windows long, n_dup_windows long, "
        "removed_tokens long, kept_tokens long"
    ),
    "windows_idx": "w1 long, w2 long",
}
_DEFAULT_N_BKT = 16


class SubstringIngestStore(MetaStoreBase):
    """Two-sink store root (decisions + windows index). Shares the
    cached-Fs and persisted-``n_bkt`` plumbing (never guessed — see
    :class:`dedup_ingest.MetaStoreBase`)."""

    _KIND = "substring-ingest store"
    _INIT_FN = "init_substring_store"

    def sink(self, name: str) -> str:
        if name not in _SINKS:
            raise ValueError(f"unknown sink {name!r}; one of {_SINKS}")
        return os.path.join(self.base, name)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Manifest-aware full read of one sink (committed seed epoch
        ``batch_id=-1`` is empty by construction, so no filter is
        needed for values — callers drop ``batch_id`` themselves)."""
        return segman.read_table(spark, self.fs, self.sink(name))


def init_substring_store(
    spark: SparkSession, base: str, n_bkt: int = _DEFAULT_N_BKT
) -> SubstringIngestStore:
    """Create the store with seeded empty sinks. Refuses an existing
    store: re-seeding would reset the index under a checkpoint that
    keeps numbering epochs, silently re-admitting every known window."""
    fs = fsio.Fs(spark, base)
    meta = os.path.join(base, _META)
    if fs.exists(meta) or any(fs.exists(os.path.join(base, s)) for s in _SINKS):
        raise FileExistsError(
            f"substring-ingest store at {base!r} is already initialized — "
            "open it with SubstringIngestStore(base) or delete the base "
            "directory to start over"
        )
    fs.mkdirs(base)
    fs.write_text_atomic(meta, json.dumps({"n_bkt": int(n_bkt)}))
    # seed empty partitions so root reads discover the partition columns
    # before the first epoch lands
    for s, sub in (("decisions", "batch_id=-1"), ("windows_idx", "batch_id=-1/bkt=0")):
        spark.createDataFrame([], _SINK_SCHEMAS[s]).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, s, sub))
    st = SubstringIngestStore(base, fs=fs)
    st._n_bkt = int(n_bkt)
    return st


def substring_ingest_batch(
    batch: DataFrame,
    eid: int,
    store: SubstringIngestStore,
    k: int = 8,
    fail_after: str | None = None,
) -> None:
    """Process one micro-batch (the foreachBatch body). Deterministic
    given (batch contents, prior committed epochs); idempotent under
    retry — see module docstring. ``fail_after='decisions'`` is the
    crash-injection hook: raises after the decisions publish, before
    the index publish, simulating a crash mid-epoch."""
    from data_pipeline_with_big_data_stack_spark.queries.curation import (
        substring_span_accounting,
        substring_windows,
    )

    spark = batch.sparkSession
    n_bkt = store.n_bkt
    base, c = substring_windows(batch.select("doc_id", "text"), k)
    # PERSIST the exploded/fingerprinted windows and the index-joined
    # firsts: the epoch runs three separate actions (touched-bucket
    # collect, decisions write, index write) and without caching each
    # would re-run the explode + double-xxhash64 over the whole batch
    # and re-scan/re-join the prior index — the per-epoch hot path this
    # module exists for (same pattern as dedup_ingest_batch)
    c = c.withColumn(
        "bkt", F.pmod(F.hash("w1"), F.lit(int(n_bkt))).cast("int")
    ).persist()
    persisted = [c]
    try:
        # bounded driver collect: <= n_bkt values, the partition-prune
        # key set for the prior index read (same contract as
        # dedup_ingest)
        touched = [
            int(r["bkt"]) for r in c.select("bkt").distinct().collect()
        ]
        prior = (
            store.read(spark, "windows_idx")
            .filter(F.col("batch_id") < F.lit(int(eid)))
            .filter(
                F.col("bkt").isin(touched) if touched else F.lit(False)
            )
            .select("w1", "w2")
        )
        firsts = (
            c.groupBy("w1", "w2", "bkt")
            .agg(F.min("pos").alias("first_pos"))
            .join(prior.withColumn("seen", F.lit(True)), ["w1", "w2"], "left")
            .persist()
        )
        persisted.append(firsts)
        marked = c.join(
            firsts.select("w1", "w2", "first_pos", "seen"), ["w1", "w2"]
        )
        dup = marked.filter(
            F.col("seen").isNotNull() | (F.col("pos") != F.col("first_pos"))
        ).select("doc_id", "s", (F.col("s") + F.lit(k - 1)).alias("e_pos"))
        decisions = substring_span_accounting(base, c, dup, k)
        _write_epoch(decisions, store.sink("decisions"), eid, None)
        if fail_after == "decisions":
            raise RuntimeError("injected crash after decisions publish")
        new_wins = firsts.filter(F.col("seen").isNull()).select(
            "w1", "w2", "bkt"
        )
        _write_epoch(new_wins, store.sink("windows_idx"), eid, "bkt", n_bkt)
    finally:
        for df in persisted:
            df.unpersist()


def run_substring_ingest_stream(
    spark: SparkSession,
    src: str,
    store: SubstringIngestStore,
    *,
    k: int = 8,
    fail_epoch: int | None = None,
    fail_after: str | None = None,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain ``src`` (a parquet file-source dir of (doc_id, text)
    chunks, streamed in id order) through :func:`substring_ingest_batch`
    with availableNow. ``fail_epoch``/``fail_after`` inject one crash
    for recovery tests; restarting without them resumes from the
    checkpoint and replays the crashed epoch idempotently."""

    def process(b: DataFrame, eid: int) -> None:
        substring_ingest_batch(
            b,
            eid,
            store,
            k=k,
            fail_after=fail_after if eid == fail_epoch else None,
        )

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
