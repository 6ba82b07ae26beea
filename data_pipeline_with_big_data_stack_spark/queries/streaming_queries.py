"""Streaming operators surfaced through the query registry.

Each query drives a REAL Structured Streaming pipeline: the events table
is re-served as a file-source *stream* (parquet directory + schema),
processed with the engine's streaming operators, drained with an
``availableNow`` trigger into a memory sink, and returned as the final
batch DataFrame. Because every event is currently-available, the drained
result is deterministic and — for windowed aggregation — expressible in
SQL, so these streaming operators get full value-hash oracles
(``time_bucket`` on the DuckDB side == tumbling ``window()`` start).

The stateful operator (running totals via ``applyInPandasWithState``)
emits per-micro-batch cumulative rows whose batch boundaries depend on
file chunking — genuinely non-SQL — so it reduces to its final per-key
state, which IS deterministic, and keeps a full oracle too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark import streaming
from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.session import prepare_session, scratch_dir


def _events_stream_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table re-served as a bounded stream: a parquet file
    source over the fixture dir (glob-filtered to the events file) — the
    same micro-batch machinery a Kafka topic would feed."""
    prepare_session(spark)
    raw = (
        spark.readStream.schema(spark.read.parquet(f"{sf_dir}/events.parquet").schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # mirror load_table's nano→micro normalization when needed
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # mirror load_table's NTZ → session-UTC TIMESTAMP normalization:
    # withWatermark rejects TIMESTAMP_NTZ event-time columns.
    if dict(raw.dtypes).get("ts") == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


@query(
    "q_stream_hourly_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*)              AS n_events,
           round(sum(value::DECIMAL(18,6)), 4)::DOUBLE  AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _events_stream_dir(spark, sf_dir)
    agg = streaming.tumbling_agg(
        st,
        "ts",
        "1 hour",
        dims=["event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_value": F.round(
                F.sum(F.col("value").cast("decimal(18,6)")), 4
            ).cast("double"),
        },
        watermark="2 hours",
    )
    out = streaming.run_available_now(
        agg,
        checkpoint=scratch_dir("ckpt_hourly_"),
        output_mode="complete",
    )
    return out.select("window_start", "event_type", "n_events", "total_value")


@query(
    "q_stream_running_totals_final",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key,
           count(*)                 AS n_events,
           round(sum(value::DECIMAL(18,6)), 4)::DOUBLE AS total,
           round(max(value), 4)     AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_running_totals_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _events_stream_dir(spark, sf_dir)
    run = streaming.running_totals(st, "user_id", "value")
    drained = streaming.run_available_now(
        run,
        checkpoint=scratch_dir("ckpt_run_"),
        output_mode="update",
    )
    # update-mode emissions are cumulative per key; the final state per
    # key is the row with the max n_events
    from pyspark.sql import Window as W

    w = W.partitionBy("key").orderBy(F.col("n_events").desc())
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "key",
            "n_events",
            F.round("total", 4).alias("total"),
            F.round("max_value", 4).alias("max_value"),
        )
    )


@query(
    "q_stream_session_windows",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                   OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sess AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps)
    SELECT user_id,
           min(ts)                            AS session_start,
           max(ts) + INTERVAL '30 minutes'    AS session_end,
           count(*)                           AS n_events
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (gap 30 min). Spark's session_window end
    = last event + gap; the oracle reproduces that with a lag-based gap
    sessionization — the two formulations must agree exactly."""
    st = _events_stream_dir(spark, sf_dir)
    agg = streaming.session_agg(
        st, "ts", "30 minutes", dims=["user_id"], watermark="2 hours"
    )
    out = streaming.run_available_now(
        agg,
        checkpoint=scratch_dir("ckpt_sess_"),
        output_mode="complete",
    )
    return out.select("user_id", "session_start", "session_end", "n_events")


@query(
    "q_stream_sliding_2h_1h",
    oracle="""
    WITH expanded AS (
      SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
                     time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour'])
               AS window_start,
             value
      FROM events)
    SELECT window_start,
           window_start + INTERVAL '2 hours' AS window_end,
           count(*)             AS n_events,
           round(sum(value::DECIMAL(18,6)), 4)::DOUBLE AS total_value
    FROM expanded
    GROUP BY window_start
    """,
)
def q_stream_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 2 h duration, 1 h slide — every event
    lands in exactly two windows. The oracle expands each event into its
    two window-start buckets and re-aggregates."""
    st = _events_stream_dir(spark, sf_dir)
    agg = streaming.sliding_agg(
        st,
        "ts",
        "2 hours",
        "1 hour",
        aggs={
            "n_events": F.count(F.lit(1)),
            # decimal accumulation: double sum order varies with file-split
            # parallelism and flips fixed-precision rounding boundaries
            "total_value": F.round(
                F.sum(F.col("value").cast("decimal(18,6)")), 4
            ).cast("double"),
        },
        watermark="4 hours",
    )
    out = streaming.run_available_now(
        agg,
        checkpoint=scratch_dir("ckpt_slide_"),
        output_mode="complete",
    )
    return out.select("window_start", "window_end", "n_events", "total_value")


@query(
    "q_stream_dedup_within_watermark",
    oracle="""
    SELECT event_id, event_type, round(value, 4) AS value
    FROM events
    """,
)
def q_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: every event is duplicated in-flight
    (explode ×2) and ``dropDuplicatesWithinWatermark`` on event_id must
    restore exactly the original stream — watermark-bounded state, the
    at-scale shape for at-least-once upstream delivery."""
    st = _events_stream_dir(spark, sf_dir)
    doubled = st.select(
        "event_id", "event_type", "value", "ts",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("copy"),
    ).drop("copy")
    dedup = streaming.stream_dedup(doubled, ["event_id"], time_col="ts",
                                   watermark="1 hour")
    out = streaming.run_available_now(
        dedup,
        checkpoint=scratch_dir("ckpt_dedup_"),
        output_mode="append",
    )
    return out.select("event_id", "event_type", F.round("value", 4).alias("value"))


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id,
           round(p.value, 4) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '10 minutes'
     AND c.ts <= p.ts
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (purchases ⋈ clicks within a 10-minute
    lookback per user), watermarked on both sides so join state is
    bounded — drained with availableNow, the result equals the batch
    range join the oracle expresses."""
    purchases = (
        _events_stream_dir(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        _events_stream_dir(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    )
    out = streaming.run_available_now(
        joined,
        checkpoint=scratch_dir("ckpt_ssj_"),
        output_mode="append",
    )
    return out.select(
        "purchase_id",
        "click_id",
        "user_id",
        F.round("p_value", 4).alias("purchase_value"),
    )


@query(
    "q_stream_static_enrich",
    oracle="""
    SELECT e.event_id, e.event_type, n.n_name AS user_nation,
           round(e.value, 4) AS value
    FROM (SELECT * FROM events WHERE event_type IN ('purchase', 'signup')) e
    JOIN nation n ON n.n_nationkey = e.user_id % 25
    """,
)
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    dimension table (broadcast per micro-batch, no stream state at all —
    the cheapest join class in Structured Streaming)."""
    from data_pipeline_with_big_data_stack_spark.tables import load_table

    st = _events_stream_dir(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "signup")
    )
    nation = load_table(spark, sf_dir, "nation")  # static side
    joined = st.join(
        F.broadcast(nation),
        nation.n_nationkey == (st.user_id % 25),
        "inner",
    )
    out = streaming.run_available_now(
        joined.select(
            "event_id",
            "event_type",
            F.col("n_name").alias("user_nation"),
            F.round("value", 4).alias("value"),
        ),
        checkpoint=scratch_dir("ckpt_ss_"),
        output_mode="append",
    )
    return out


@query(
    "q_stream_user_profile_final",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key,
           count(*)                 AS n_events,
           round(sum(value::DECIMAL(18,6)), 4)::DOUBLE AS total,
           round(max(value), 4)     AS max_value,
           count(DISTINCT event_type)::BIGINT AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_user_profile_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithState (Spark 4 arbitrary-state API) end to end:
    ValueState totals + MapState per-type counts per user, RocksDB
    state store, availableNow drain, final state per key — which is
    deterministic and therefore fully value-oracled."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(*streaming.ROCKSDB_CONF)
    try:
        st = _events_stream_dir(spark, sf_dir)
        prof = streaming.user_profile_stats(st, "user_id", "value", "event_type")
        drained = streaming.run_available_now(
            prof,
            checkpoint=scratch_dir("ckpt_twstate_"),
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    from pyspark.sql import Window as W

    w = W.partitionBy("key").orderBy(F.col("n_events").desc())
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "key",
            "n_events",
            F.round("total", 4).alias("total"),
            F.round("max_value", 4).alias("max_value"),
            "n_types",
        )
    )


# --------------------------------------------------------------------------
# Streaming frequent items (Misra-Gries state per key): Druid's
# topN-over-streams shape with hard-bounded memory — ≤ k counters per
# key regardless of stream cardinality (streaming/stateful.py). In the
# exact-below-capacity regime (k=4096 vs ≤1.5 K distinct users on the
# fixtures) the drained final state equals the exact per-(type, user)
# counts, so the streaming sketch carries a FULL value oracle — the
# same device as the batch q_frequent_items_users.
# --------------------------------------------------------------------------
@query(
    "q_stream_frequent_items",
    oracle="""
    WITH c AS (
      SELECT event_type::VARCHAR AS key, user_id::VARCHAR AS item,
             count(*)::BIGINT AS cnt
      FROM events GROUP BY event_type, user_id)
    SELECT key, item, cnt, cnt AS max_cnt FROM (
      SELECT *, row_number() OVER (PARTITION BY key
                  ORDER BY cnt DESC, item) AS rn
      FROM c)
    WHERE rn <= 10
    """,
)
def q_stream_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _events_stream_dir(spark, sf_dir)
    mg = streaming.stream_frequent_items(st, "event_type", "user_id", k=4096)
    drained = streaming.run_available_now(
        mg,
        checkpoint=scratch_dir("ckpt_freq_"),
        output_mode="update",
    )
    # update-mode emissions are cumulative; n_seen is monotone per key,
    # so the final sketch is the emission with the key's max n_seen
    from pyspark.sql import Window as W

    final = (
        drained.withColumn(
            "mx", F.max("n_seen").over(W.partitionBy("key"))
        )
        .filter(F.col("n_seen") == F.col("mx"))
    )
    top = W.partitionBy("key").orderBy(F.col("cnt").desc(), "item")
    return (
        final.withColumn("rn", F.row_number().over(top))
        .filter(F.col("rn") <= 10)
        .select("key", "item", "cnt", (F.col("cnt") + F.col("err")).alias("max_cnt"))
    )


# --------------------------------------------------------------------------
# Streaming rollup maintenance — the reference's core loop end to end,
# engine-native: events arrive as a stream, each micro-batch is merged
# into the materialized hourly rollup INCREMENTALLY (foreachBatch →
# operators/rollup_maintenance.apply_increment: only the touched day
# partitions are read back and dynamically overwritten — Druid's
# realtime ingestion + auto-compaction), and the daily dashboard is
# then SERVED from the store (never re-scanning raw events). The
# oracle recomputes the dashboard straight from raw events, so the
# whole loop — stream → incremental merge → grain-coarsened serving —
# is value-checked exactly; multi-batch merge order is separately
# pinned by the random-split property tests.
# --------------------------------------------------------------------------
@query(
    "q_stream_rollup_maintenance",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
             event_type,
             (round(value * 1000000))::BIGINT AS micros
      FROM events)
    SELECT bucket, event_type,
           count(*)::BIGINT                            AS n_events,
           (sign(sum(micros))::HUGEINT * ((2*abs(sum(micros)::HUGEINT) + 100) // 200)) / 10000.0 AS sum_value,
           (sign(sum(micros))::HUGEINT * ((2*abs(sum(micros)::HUGEINT) + 100*count(*)) // (200*count(*)))) / 10000.0                   AS avg_value,
           (sign(min(micros))::HUGEINT * ((2*abs(min(micros)::HUGEINT) + 100) // 200)) / 10000.0 AS min_value,
           (sign(max(micros))::HUGEINT * ((2*abs(max(micros)::HUGEINT) + 100) // 200)) / 10000.0 AS max_value
    FROM m GROUP BY 1, 2
    """,
)
def q_stream_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM

    st = _events_stream_dir(spark, sf_dir)
    path = scratch_dir("rollup_stream_")
    ckpt = scratch_dir("ckpt_rollup_stream_")
    q = (
        st.writeStream.foreachBatch(
            # epoch id as batch_id → the staged-publish exactly-once
            # path: a foreachBatch retry skips already-published
            # partitions instead of double-merging them
            lambda df, eid: RM.apply_increment(
                df.sparkSession, path, df, batch_id=eid
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return RM.serve_rollup(spark, path, grain="day", dims=("event_type",))


# --------------------------------------------------------------------------
# Streaming scoring twin of the trained NB quality classifier (round 7,
# VERDICT r6 #3): train-once / score-per-batch is the production shape —
# CCNet-style pipelines score crawl shards as they arrive against a
# model trained on a curated seed. The model is trained ONCE on the
# static documents table and frozen (materialized constant-size bucket
# table, curation.nb_train_quality_model); the documents then arrive as
# a multi-file stream and each micro-batch is scored by the SAME
# curation.nb_score_documents the batch gate query uses — scores are a
# per-doc pure function of (model, doc), so the drained result is
# batch-boundary independent and shares the batch query's full value
# oracle. Each micro-batch overwrites its own batch_id=<epoch> sink
# partition, so a foreachBatch retry republishes instead of
# double-appending (the rollup store's exactly-once device, file-sink
# edition).
# --------------------------------------------------------------------------
from data_pipeline_with_big_data_stack_spark.queries.curation import (  # noqa: E402
    _NB_ORACLE as _NB_STREAM_ORACLE,
)


@query("q_stream_quality_scores", oracle=_NB_STREAM_ORACLE)
def q_stream_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_with_big_data_stack_spark.queries.curation import (
        nb_score_documents,
        nb_train_quality_model,
    )
    from data_pipeline_with_big_data_stack_spark.queries.textops import _docs

    d = _docs(spark, sf_dir, rebalance=True)
    model = nb_train_quality_model(d)  # frozen before the stream starts
    base = scratch_dir("nb_stream_")
    src = base + "/src"
    d.select("doc_id", "text").repartition(4).write.parquet(src)
    sink = base + "/scored"
    st = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # several micro-batches, not one
        .parquet(src)
    )
    q = (
        st.writeStream.foreachBatch(
            lambda df, eid: nb_score_documents(model, df)
            .write.mode("overwrite")
            .parquet(f"{sink}/batch_id={eid}")
        )
        .option("checkpointLocation", base + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink).drop("batch_id")


# --------------------------------------------------------------------------
# Streaming ingestion dedup against the MATERIALIZED signature index
# (round 7; exactly-once + count-sidecar rework round 8): the
# production shape of fuzzy dedup at 100 TB is not a full-corpus
# re-dedup per run — crawl shards arrive continuously, each batch is
# checked against the accumulated index, and only the index grows.
# The per-batch machinery lives in operators/dedup_ingest:
#   - minhash signatures (operators/dedup_index — the same salted-md5
#     pipeline the batch queries replay in SQL), band buckets capped at
#     the SAME 256-id ceiling as the batch LSH family (ranks assigned
#     at insertion: prior bucket occupancy + within-batch rank — ids
#     only grow, so a doc's capped-band membership never changes);
#   - prior bucket occupancy comes from a per-bucket COUNT SIDECAR
#     (one row per bucket touched per epoch), so per-batch planning
#     never aggregates the accumulated bands index;
#   - candidate pairs = batch bands x (index + batch) bands, exact
#     trigram Jaccard >= 0.8 against the accumulated doc store, REJECT
#     iff a lower-id doc verifies (dup_of = the lowest such partner).
# Ingest ids are monotone (files streamed in id order — the crawl-shard
# contract), so every decision depends only on already-arrived docs and
# the drained result is batch-boundary independent: the oracle replays
# the WHOLE corpus through the batch LSH + verify machinery and keeps
# each doc's lowest-id verified partner. ALL FOUR sinks (decisions,
# bands index, count sidecar, doc store) are per-epoch batch_id=<eid>
# overwrite partitions and every prior-state read filters
# batch_id < eid — a foreachBatch retry republishes identical
# partitions and never double-appends (crash-injection pinned in
# tests/test_dedup_index.py). Since round 10 the accumulated sinks are
# ALSO partitioned by a hash bucket of their lookup key, so every
# prior-state read partition-prunes to the batch's touched buckets —
# per-batch cost is O(touched fraction), never O(accumulated index) —
# and the whole store lives behind a generation pointer
# (operators/generations) so compaction never pauses readers.
# --------------------------------------------------------------------------
_STREAM_DEDUP_TAU = 0.8


from data_pipeline_with_big_data_stack_spark.queries.textops import (  # noqa: E402
    _LSH_DUCK as _SD_LSH,
    _VERIFY_DUCK as _SD_VERIFY,
)

_STREAM_DEDUP_ORACLE = f"""
    WITH {_SD_LSH},
    {_SD_VERIFY}
    SELECT doc_id, dup_of, jaccard FROM (
      SELECT v.doc_b AS doc_id, v.doc_a AS dup_of, v.jaccard,
             row_number() OVER (PARTITION BY v.doc_b ORDER BY v.doc_a) AS rk
      FROM ver v) WHERE rk = 1
"""


@query("q_stream_dedup_ingest", oracle=_STREAM_DEDUP_ORACLE)
def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_with_big_data_stack_spark.operators.dedup_ingest import (
        init_dedup_ingest_store,
        run_dedup_ingest_stream,
        stage_ordered_chunks,
    )
    from data_pipeline_with_big_data_stack_spark.queries.textops import (
        _LSH_MAX_BUCKET,
        _docs,
    )

    prepare_session(spark)
    d = _docs(spark, sf_dir).select("doc_id", "text")
    base, chunks = stage_ordered_chunks(spark, d, n_chunks=4)
    store = init_dedup_ingest_store(spark, base)
    run_dedup_ingest_stream(
        spark, chunks, store, tau=_STREAM_DEDUP_TAU, max_bucket=_LSH_MAX_BUCKET
    )
    return store.read(spark, "decisions").drop("batch_id")


@query("q_stream_dedup_ingest_compacted", oracle=_STREAM_DEDUP_ORACLE)
def q_stream_dedup_ingest_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the ingestion-dedup stream, then run the store compactor
    (fold every committed epoch of all four sinks into one partition of
    a NEW generation published behind the store's atomic ``_CURRENT``
    pointer, under the single-writer lock — the small-file hygiene a
    long-running 100 TB ingest needs, reader-safe: a concurrent serving
    read keeps the grace predecessor) and serve the DECISIONS from the
    compacted store. Shares the full-corpus replay oracle with
    ``q_stream_dedup_ingest``: compaction must be invisible to every
    reader, so the driver value-checks the whole drain → compact →
    serve path."""
    from data_pipeline_with_big_data_stack_spark.operators.dedup_ingest import (
        compact_dedup_ingest_store,
        init_dedup_ingest_store,
        run_dedup_ingest_stream,
        stage_ordered_chunks,
    )
    from data_pipeline_with_big_data_stack_spark.queries.textops import (
        _LSH_MAX_BUCKET,
        _docs,
    )

    prepare_session(spark)
    d = _docs(spark, sf_dir).select("doc_id", "text")
    base, chunks = stage_ordered_chunks(spark, d, n_chunks=4)
    store = init_dedup_ingest_store(spark, base)
    run_dedup_ingest_stream(
        spark, chunks, store, tau=_STREAM_DEDUP_TAU, max_bucket=_LSH_MAX_BUCKET
    )
    compact_dedup_ingest_store(spark, store)
    return store.read(spark, "decisions").drop("batch_id")


# --------------------------------------------------------------------------
# Streaming exact-substring dedup (round 13): the continuous-ingest
# twin of q_doc_exact_substring_dedup. Crawl shards arrive in doc-id
# order; each micro-batch's windows are checked against the accumulated
# window-fingerprint index (bucket-pruned prior reads, exactly-once
# epoch partitions — operators/substring_ingest); only the index grows.
# Decisions are batch-boundary independent (keep-first depends only on
# lower positions, and ids arrive monotone), so the drained result
# gates against the SAME full-corpus DuckDB replay as the batch op.
# --------------------------------------------------------------------------


from data_pipeline_with_big_data_stack_spark.queries.curation import (  # noqa: E402
    EXACT_SUBSTRING_ORACLE as _EXACT_SUBSTRING_ORACLE,
)


@query("q_stream_exact_substring_dedup", oracle=_EXACT_SUBSTRING_ORACLE)
def q_stream_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the documents table as 4 id-ordered crawl shards through
    the incremental exact-substring dedup — WITH the maintenance
    lifecycle in the loop (an in-drain incremental fold after epoch 2
    and a final full compaction, round 14): epochs past the fold read
    folded prior state, so the gate also pins that folding never
    changes a decision. Serve the accumulated per-doc span accounting,
    value-gated against the batch operator's full-corpus oracle — the
    strongest possible check that incremental decisions match a
    from-scratch re-run."""
    from data_pipeline_with_big_data_stack_spark.operators.dedup_ingest import (
        stage_ordered_chunks,
    )
    from data_pipeline_with_big_data_stack_spark.operators.substring_ingest import (
        compact_substring_ingest_store,
        init_substring_store,
        run_substring_ingest_stream,
    )
    from data_pipeline_with_big_data_stack_spark.queries.textops import _docs

    prepare_session(spark)
    d = _docs(spark, sf_dir).select("doc_id", "text")
    base, chunks = stage_ordered_chunks(spark, d, n_chunks=4)
    store = init_substring_store(spark, os.path.join(base, "store"))
    run_substring_ingest_stream(spark, chunks, store, compact_every=2)
    compact_substring_ingest_store(spark, store)
    return store.read(spark, "decisions").drop("batch_id")
