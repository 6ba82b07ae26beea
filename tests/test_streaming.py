"""Streaming-surface tests (SURVEY §2.9).

Strategy: drive every streaming operator through the file source with
``availableNow`` triggers — checkpointing, offset tracking, and resume are
exercised exactly as in a Kafka-fed deployment (no broker in the test
env). Windowed operators are additionally checked for batch/stream parity:
the same operator applied to the same rows as a batch DataFrame must
produce identical results.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_with_big_data_stack_spark import ingest, streaming
from data_pipeline_with_big_data_stack_spark.schemas import SPARK_ANALYTICS

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),  # ISO string in the JSON feed
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_feed(dirpath: str, rows: list[dict], fname: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _feed_rows(n: int = 60, start_min: int = 0) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": start_min * 1000 + i,
                "ts": f"2024-03-01T10:{(start_min + i // 10) % 60:02d}:{(i * 7) % 60:02d}",
                "user_id": i % 5,
                "event_type": ["view", "click", "purchase"][i % 3],
                "value": float(i),
            }
        )
    return rows


@pytest.fixture()
def feed_dir(tmp_path):
    d = str(tmp_path / "feed")
    _write_feed(d, _feed_rows(60), "batch1.json")
    _write_feed(d, _feed_rows(40, start_min=30), "batch2.json")
    return d


def _stream(spark, feed_dir):
    raw = streaming.json_dir_stream(spark, feed_dir, EVENTS_SCHEMA)
    return raw.withColumn("ts", F.to_timestamp("ts"))


def _batch(spark, feed_dir):
    raw = spark.read.schema(EVENTS_SCHEMA).json(feed_dir)
    return raw.withColumn("ts", F.to_timestamp("ts"))


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


class TestWindows:
    def test_tumbling_batch_stream_parity(self, spark, feed_dir, tmp_path):
        aggs = {
            "n": F.count(F.lit(1)),
            "total": F.round(F.sum("value"), 6),
        }
        got = streaming.run_available_now(
            streaming.tumbling_agg(
                _stream(spark, feed_dir), "ts", "5 minutes",
                dims=["event_type"], aggs=aggs,
            ),
            checkpoint=str(tmp_path / "ckpt_tumble"),
            output_mode="complete",
        )
        want = streaming.tumbling_agg(
            _batch(spark, feed_dir), "ts", "5 minutes",
            dims=["event_type"], aggs=aggs,
        )
        assert _canon(got) == _canon(want)
        assert got.count() > 0

    def test_sliding_batch_stream_parity(self, spark, feed_dir, tmp_path):
        got = streaming.run_available_now(
            streaming.sliding_agg(
                _stream(spark, feed_dir), "ts", "10 minutes", "5 minutes"
            ),
            checkpoint=str(tmp_path / "ckpt_slide"),
            output_mode="complete",
        )
        want = streaming.sliding_agg(
            _batch(spark, feed_dir), "ts", "10 minutes", "5 minutes"
        )
        assert _canon(got) == _canon(want)
        # every event lands in exactly 2 sliding windows
        assert got.agg(F.sum("n_events")).collect()[0][0] == 2 * 100

    def test_session_windows(self, spark, feed_dir, tmp_path):
        got = streaming.run_available_now(
            streaming.session_agg(
                _stream(spark, feed_dir), "ts", "2 minutes", dims=["user_id"]
            ),
            checkpoint=str(tmp_path / "ckpt_sess"),
            output_mode="complete",
        )
        want = streaming.session_agg(
            _batch(spark, feed_dir), "ts", "2 minutes", dims=["user_id"]
        )
        assert _canon(got) == _canon(want)
        rows = got.collect()
        assert all(r["session_end"] > r["session_start"] for r in rows)

    def test_stream_dedup_within_watermark(self, spark, tmp_path):
        d = str(tmp_path / "dupfeed")
        rows = _feed_rows(30)
        _write_feed(d, rows + rows[:10], "dup.json")  # 10 exact dup keys
        got = streaming.run_available_now(
            streaming.stream_dedup(
                _stream(spark, d), ["event_id"], time_col="ts"
            ),
            checkpoint=str(tmp_path / "ckpt_dedup"),
            output_mode="append",
        )
        assert got.count() == 30


class TestStatefulOps:
    def test_running_totals(self, spark, feed_dir, tmp_path):
        got = streaming.run_available_now(
            streaming.running_totals(_stream(spark, feed_dir), "user_id", "value"),
            checkpoint=str(tmp_path / "ckpt_run"),
            output_mode="update",
        )
        # last emission per key must equal the batch aggregate
        batch = (
            _batch(spark, feed_dir)
            .groupBy(F.col("user_id").cast("string").alias("key"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total"),
                F.max("value").alias("max_value"),
            )
        )
        last = {
            r["key"]: (r["n_events"], r["total"], r["max_value"])
            for r in got.orderBy("n_events").collect()
        }  # later (cumulative) rows overwrite earlier ones per key
        want = {
            r["key"]: (r["n_events"], r["total"], r["max_value"])
            for r in batch.collect()
        }
        assert last == want

    def test_threshold_alerts_fire_once(self, spark, feed_dir, tmp_path):
        got = streaming.run_available_now(
            streaming.threshold_alerts(
                _stream(spark, feed_dir), "user_id", "value", threshold=100.0
            ),
            checkpoint=str(tmp_path / "ckpt_alert"),
            output_mode="update",
        )
        rows = got.collect()
        keys = [r["key"] for r in rows]
        assert len(keys) == len(set(keys))  # at most one alert per key
        assert all(r["total"] >= 100.0 for r in rows)
        # every user accumulates >= 100 over the full feed -> all 5 fire
        assert sorted(keys) == ["0", "1", "2", "3", "4"]


class TestStreamingIngest:
    def test_spec_stream_to_parquet(self, spark, tmp_path):
        # posix-timestamp feed shaped like the spark_analytics topic
        feed = str(tmp_path / "sessions_feed")
        rows = [
            {
                "session_id": f"session_{1000 + i}",
                "user_id": i % 7,
                "page_views": 1 + i % 20,
                "time_spent_minutes": 1 + i % 120,
                "device_type": ["mobile", "desktop", "tablet"][i % 3],
                "country": ["US", "UK", "DE"][i % 3],
                "timestamp": 1709290000 + i * 60,
                "revenue": 0.0 if i % 3 else round(i * 1.5, 2),
            }
            for i in range(50)
        ]
        _write_feed(feed, rows, "s1.json")
        schema = T.StructType(
            [T.StructField(SPARK_ANALYTICS.timestamp.column, T.LongType())]
            + [
                T.StructField(d.name, d.spark_type)
                for d in SPARK_ANALYTICS.dimensions
            ]
        )
        stream = streaming.json_dir_stream(spark, feed, schema)
        plan = ingest.compile_stream(SPARK_ANALYTICS, stream)
        out = str(tmp_path / "sessions_table")
        # write via the runner (availableNow) rather than ingest.write_stream's
        # continuous trigger so the test drains deterministically
        from data_pipeline_with_big_data_stack_spark.ingest import partition_columns, with_partition_columns

        streaming.run_to_parquet_available_now(
            with_partition_columns(SPARK_ANALYTICS, plan),
            out,
            str(tmp_path / "ckpt_ingest"),
            partition_by=partition_columns(SPARK_ANALYTICS),
        )
        back = spark.read.parquet(out)
        assert back.count() == 50
        assert "__time" in back.columns and "__date" in back.columns
        assert dict(back.dtypes)["__time"] == "timestamp"
        # restart-resume: second availableNow run sees no new files -> no dup rows
        streaming.run_to_parquet_available_now(
            with_partition_columns(SPARK_ANALYTICS, plan),
            out,
            str(tmp_path / "ckpt_ingest"),
            partition_by=partition_columns(SPARK_ANALYTICS),
        )
        assert spark.read.parquet(out).count() == 50
        # new file arrives -> only the delta is appended (exactly-once)
        _write_feed(
            feed,
            [dict(rows[0], session_id="session_x", timestamp=1709297000)],
            "s2.json",
        )
        streaming.run_to_parquet_available_now(
            with_partition_columns(SPARK_ANALYTICS, plan),
            out,
            str(tmp_path / "ckpt_ingest"),
            partition_by=partition_columns(SPARK_ANALYTICS),
        )
        assert spark.read.parquet(out).count() == 51

    def test_rate_stream_smoke(self, spark, tmp_path):
        st = streaming.rate_stream(spark, rows_per_second=500)
        assert st.isStreaming
        enriched = st.withColumn("coin", F.element_at(
            F.array(F.lit("BTC"), F.lit("ETH"), F.lit("BTT"), F.lit("DOT")),
            (F.col("value") % 4 + 1).cast("int"),
        ))
        q = (
            enriched.writeStream.format("memory")
            .queryName("rate_smoke")
            .outputMode("append")
            .trigger(processingTime="250 milliseconds")
            .start()
        )
        import time

        deadline = time.time() + 20
        try:
            while time.time() < deadline:
                if spark.table("rate_smoke").count() >= 4:
                    break
                time.sleep(0.5)
            got = spark.table("rate_smoke")
            assert got.count() >= 4
            assert set(r["coin"] for r in got.select("coin").distinct().collect()) <= {
                "BTC", "ETH", "BTT", "DOT"
            }
        finally:
            q.stop()


class TestStateRecovery:
    def test_running_totals_resume_from_checkpoint(self, spark, tmp_path):
        """State must survive a stream restart: drain batch 1, stop, add
        batch 2, drain again with the SAME checkpoint — cumulative totals
        continue from the recovered state store, not from zero."""
        feed = str(tmp_path / "resume_feed")
        ckpt = str(tmp_path / "ckpt_resume")
        sink = str(tmp_path / "resume_sink")
        _write_feed(feed, _feed_rows(30), "b1.json")

        def drain():
            # memory sinks cannot recover a checkpoint; foreachBatch to
            # parquet is the fault-tolerant production shape
            run = streaming.running_totals(_stream(spark, feed), "user_id", "value")
            q = (
                run.writeStream.foreachBatch(
                    lambda df, bid: df.withColumn("batch_id", F.lit(bid))
                    .write.mode("append")
                    .parquet(sink)
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            out = spark.read.parquet(sink)
            from pyspark.sql import Window as W

            w = W.partitionBy("key").orderBy(F.col("n_events").desc())
            return {
                r["key"]: r
                for r in out.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .collect()
            }

        first = drain()
        n_first = {k: r["n_events"] for k, r in first.items()}
        assert sum(n_first.values()) == 30

        _write_feed(feed, _feed_rows(20, start_min=40), "b2.json")
        second = drain()
        # latest emission per key is cumulative incl. recovered batch-1 state
        batch = _batch(spark, feed)
        want = {
            r["key"]: (r["n"], r["t"])
            for r in batch.groupBy(
                F.col("user_id").cast("string").alias("key")
            ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t")).collect()
        }
        got = {k: (r["n_events"], r["total"]) for k, r in second.items()}
        assert got == want  # 50 events total, never re-zeroed


class TestStreamingRollup:
    """rollup:true on a stream — watermarked tumbling count with the
    batch rollup's (__time, dims, __count) schema, emitted append-mode
    (exactly-once) once windows finalize; batch/stream parity on the
    finalized set."""

    def _rollup_spec(self):
        from dataclasses import replace

        from data_pipeline_with_big_data_stack_spark.schemas import DEMO, GranularitySpec

        return replace(
            DEMO, granularity=GranularitySpec("HOUR", "MINUTE", rollup=True)
        )

    def _tick_rows(self):
        base = 1709290000
        rows = [
            {
                "timestamp": base + i * 5,
                "name": ["btc", "eth"][i % 2],
                "data_id": i % 3,
            }
            for i in range(120)  # 10 minutes of 5 s ticks
        ]
        # sentinel 2 h later: advances the watermark so every main-window
        # rollup row finalizes and emits in append mode
        rows.append({"timestamp": base + 7200, "name": "btc", "data_id": 0})
        return rows

    def test_stream_rollup_matches_batch(self, spark, tmp_path):
        spec = self._rollup_spec()
        feed = str(tmp_path / "ticks")
        rows = self._tick_rows()
        _write_feed(feed, rows, "t1.json")
        schema = T.StructType(
            [
                T.StructField("timestamp", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("data_id", T.LongType()),
            ]
        )
        stream = streaming.json_dir_stream(spark, feed, schema)
        plan = ingest.compile_stream(spec, stream, rollup_watermark="10 minutes")
        got = streaming.run_available_now(
            plan, checkpoint=str(tmp_path / "ckpt_rollup"), output_mode="append"
        )
        assert set(got.columns) == {"__time", "name", "data_id", "__count"}

        # batch twin over the rows whose windows finalized (all but the
        # sentinel, which the watermark holds back)
        batch = spark.createDataFrame(
            [r for r in rows if r["timestamp"] < 1709290000 + 7200], schema
        )
        want = ingest.compile_transform(spec, batch)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # rollup genuinely pre-aggregated: 120 ticks collapsed
        assert got.count() < 120
        assert sum(r["__count"] for r in got.collect()) == 120

    def test_calendar_granularity_rejected(self, spark, tmp_path):
        from dataclasses import replace

        from data_pipeline_with_big_data_stack_spark.schemas import DEMO, GranularitySpec

        spec = replace(
            DEMO, granularity=GranularitySpec("DAY", "MONTH", rollup=True)
        )
        feed = str(tmp_path / "ticks2")
        _write_feed(feed, self._tick_rows(), "t1.json")
        schema = T.StructType([T.StructField("timestamp", T.LongType())])
        stream = streaming.json_dir_stream(spark, feed, schema)
        with pytest.raises(ValueError, match="fixed-length"):
            ingest.compile_stream(spec, stream)


class TestTransformWithState:
    def test_profile_fallback_matches_batch(self, spark, monkeypatch):
        """The applyInPandasWithState twin (used when the TWS worker
        can't run) must produce the same final state as a batch agg."""
        import tempfile

        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from data_pipeline_with_big_data_stack_spark import streaming
        from data_pipeline_with_big_data_stack_spark.queries.streaming_queries import _events_stream_dir
        from data_pipeline_with_big_data_stack_spark.streaming import stateful
        from data_pipeline_with_big_data_stack_spark.tables import load_table
        from tests.conftest import SF_SMOKE

        monkeypatch.setattr(stateful, "ensure_tws_runtime", lambda _s: False)
        st = _events_stream_dir(spark, SF_SMOKE)
        prof = stateful.user_profile_stats(st, "user_id", "value", "event_type")
        drained = streaming.run_available_now(
            prof,
            checkpoint=tempfile.mkdtemp(prefix="ckpt_twsfb_"),
            output_mode="update",
        )
        w = W.partitionBy("key").orderBy(F.col("n_events").desc())
        final = (
            drained.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("key", "n_events", F.round("total", 4).alias("total"), "n_types")
        )
        batch = (
            load_table(spark, SF_SMOKE, "events")
            .groupBy(F.col("user_id").cast("string").alias("key"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
                .cast("double")
                .alias("total"),
                F.countDistinct("event_type").cast("long").alias("n_types"),
            )
        )
        got = {tuple(r) for r in final.collect()}
        exp = {tuple(r) for r in batch.collect()}
        assert got == exp


class TestStreamingRollupMaintenance:
    def test_multi_batch_increments_equal_batch_aggregate(self, spark, tmp_path):
        """Four micro-batches (one file per trigger), with later files
        carrying LATE rows for days already materialized by earlier
        batches — the served dashboard must equal a straight batch
        aggregation over everything, and the first batch must have
        created the store."""
        from pyspark.sql import functions as F

        from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM
        from data_pipeline_with_big_data_stack_spark.tables import load_table
        from tests.conftest import SF_CORRECTNESS

        e = load_table(spark, SF_CORRECTNESS, "events")
        src = tmp_path / "src"
        # interleave by event_id so every file spans many days => every
        # batch after the first merges into already-written partitions
        for i in range(4):
            e.filter(F.col("event_id") % 4 == i).write.parquet(
                str(src / f"f{i}.parquet")
            )
        st = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        store = str(tmp_path / "rollup")
        batches = []
        q = (
            st.writeStream.foreachBatch(
                lambda df, eid: (
                    batches.append(eid),
                    RM.apply_increment(df.sparkSession, store, df),
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert len(batches) == 4
        served = {
            tuple(r)
            for r in RM.serve_rollup(
                spark, store, grain="day", dims=("event_type",)
            ).collect()
        }
        expected = {
            tuple(r)
            for r in (
                e.groupBy(
                    F.date_trunc("day", "ts").alias("bucket"), "event_type"
                )
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_events"),
                    F.sum(
                        F.round(F.col("value") * 1_000_000).cast("long")
                    ).alias("_m"),
                    F.min(
                        F.round(F.col("value") * 1_000_000).cast("long")
                    ).alias("_lo"),
                    F.max(
                        F.round(F.col("value") * 1_000_000).cast("long")
                    ).alias("_hi"),
                )
                .select(
                    "bucket",
                    "event_type",
                    "n_events",
                    RM.round4_micros(F.col("_m")).alias("sum_value"),
                    RM.round4_micros(F.col("_m"), F.col("n_events")).alias(
                        "avg_value"
                    ),
                    RM.round4_micros(F.col("_lo")).alias("min_value"),
                    RM.round4_micros(F.col("_hi")).alias("max_value"),
                )
                .collect()
            )
        }
        assert served == expected
