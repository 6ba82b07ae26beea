"""Time-series query surface over the ``events`` table.

These re-express the reference's Druid SQL dashboard/report queries
(SURVEY §2.4 A4-A8: ``README.md:173-193``, ``M/GOES_PIPELINE_REPORT.md:
275-314``) and the ingest-side time semantics (timestampSpec posix parse,
queryGranularity floor — ``M/druid-goes-satellite-datasource.json:21-24,80``)
on the driver's ``events`` fixture.

Timestamp parity note: ``events.ts`` is nanosecond-precision parquet.
Spark truncates to microseconds on read while DuckDB keeps TIMESTAMP_NS,
so every emitted timestamp is floored to an exact second/minute/hour on
BOTH sides, and time anchors derive from ``date_trunc('second', max(ts))``
rather than wall clock (driver determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators.rollup_maintenance import (
    round4_micros as _RM_round4,
    round4_ratio as _RM_ratio4,
    round_ratio as _RM_rr,
)
from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.session import prepare_session, scratch_dir
from data_pipeline_with_big_data_stack_spark.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# A4: time-bucketed aggregate — the hourly dashboard query
# (`SELECT TIME_FLOOR(__time,'PT1H'), AVG(x), COUNT(*) ... GROUP BY 1`,
# README.md:173-182).
# --------------------------------------------------------------------------
@query(
    "q_events_hourly_rollup",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           count(*)                 AS n,
           (sign(sum(value::DECIMAL(18,6)))::HUGEINT * ((2*abs((sum(value::DECIMAL(18,6)) * 1000000)::HUGEINT) + 100*count(*)) // (200*count(*)))) / 10000.0 AS avg_value,
           round(sum(value::DECIMAL(18,6)), 2)::DOUBLE AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            # exact-integer 4-dp average: the double path diverges from
            # DuckDB at .5 boundaries (operators/rollup_maintenance.
            # round4_micros — the decimal(18,6) sum IS integer micros)
            _RM_round4(
                F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000,
                F.count(F.lit(1)),
            ).alias("avg_value"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double").alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# A4 daily-max variant (GOES_PIPELINE_REPORT.md:306-314).
# --------------------------------------------------------------------------
@query(
    "q_events_daily_max",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           round(max(value), 2) AS max_value,
           round(min(value), 2) AS min_value,
           count(*)             AS n
    FROM events
    GROUP BY 1
    """,
)
def q_events_daily_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# A5: per-dimension profile (GROUP BY source_file: COUNT, MIN(__time),
# MAX(__time) ORDER BY count DESC — GOES_PIPELINE_REPORT.md:275-283).
# --------------------------------------------------------------------------
@query(
    "q_events_type_profile",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS first_seen,
           CAST(date_trunc('second', max(ts)) AS TIMESTAMP) AS last_seen,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_events_type_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.date_trunc("second", F.min("ts")).alias("first_seen"),
        F.date_trunc("second", F.max("ts")).alias("last_seen"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# A6: validation count over a trailing window (README.md:318). The anchor
# is data-derived (second-floored max ts) instead of CURRENT_TIMESTAMP so
# both engines agree bit-for-bit.
# --------------------------------------------------------------------------
@query(
    "q_events_trailing_24h_count",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE ts >= (SELECT date_trunc('second', max(ts)) - INTERVAL 24 HOUR FROM events)
    GROUP BY event_type
    """,
)
def q_events_trailing_24h_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    anchor = e.agg(
        (F.date_trunc("second", F.max("ts")) - F.expr("INTERVAL 24 HOURS")).alias("lo")
    )
    return (
        e.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("lo"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# A7: storage-growth metrics — global agg + linear projections
# (goes_satellite_etl.py:415-489; output schema druid-goes-storage-metrics).
# `value` plays the role of file_size_mb.
# --------------------------------------------------------------------------
@query(
    "q_events_storage_metrics",
    oracle="""
    WITH s AS (
      SELECT count(*) AS current_files_processed,
             round(sum(value::DECIMAL(18,6)), 2)::DOUBLE AS current_storage_mb,
             (sum(value::DECIMAL(18,6)) * 1000000)::HUGEINT AS t_m,
             greatest(date_diff('day', min(ts), max(ts)), 1)::HUGEINT AS d
      FROM events)
    SELECT current_files_processed,
           current_storage_mb,
           (sign(t_m)::HUGEINT * ((2*abs(t_m)*10000 + 1000000*d) // (2000000*d))) / 10000.0
             AS projected_daily_growth_mb,
           (sign(t_m)::HUGEINT * ((2*7*abs(t_m)*10000 + 1000000*d) // (2000000*d))) / 10000.0
             AS projected_weekly_growth_mb,
           (sign(t_m)::HUGEINT * ((2*30*abs(t_m)*10000 + 1000000*d) // (2000000*d))) / 10000.0
             AS projected_monthly_growth_mb,
           (sign(t_m)::HUGEINT * ((2*7*abs(t_m)*1000000 + 1024000000*d) // (2048000000*d))) / 1000000.0
             AS projected_weekly_growth_gb,
           (sign(t_m)::HUGEINT * ((2*30*abs(t_m)*1000000 + 1024000000*d) // (2048000000*d))) / 1000000.0
             AS projected_monthly_growth_gb
    FROM s
    """,
)
def q_events_storage_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # exact decimal total + integer-device rounding: avg_v·(n/days)
    # equals total/days in rational terms, and the double path's round
    # diverged between engines at half boundaries (round4_micros note)
    agg = e.agg(
        F.count(F.lit(1)).alias("current_files_processed"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    days = F.greatest(F.datediff("max_ts", "min_ts"), F.lit(1)).cast("long")
    return agg.select(
        "current_files_processed",
        F.round("total", 2).cast("double").alias("current_storage_mb"),
        _RM_rr(F.col("total"), days, 4).alias("projected_daily_growth_mb"),
        _RM_rr(F.col("total") * 7, days, 4).alias("projected_weekly_growth_mb"),
        _RM_rr(F.col("total") * 30, days, 4).alias("projected_monthly_growth_mb"),
        _RM_rr(F.col("total") * 7, days * 1024, 6).alias(
            "projected_weekly_growth_gb"
        ),
        _RM_rr(F.col("total") * 30, days * 1024, 6).alias(
            "projected_monthly_growth_gb"
        ),
    )


# --------------------------------------------------------------------------
# §2.5: the change_24h semantic the reference imports pre-computed
# (real_data_etl.py:48) re-expressed as a lag window per entity.
# --------------------------------------------------------------------------
@query(
    "q_events_value_change_per_user",
    oracle="""
    SELECT user_id, event_id,
           CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_sec,
           round(value, 2) AS value,
           round(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 2) AS change_prev,
           CASE WHEN sign(lag(value) OVER w) = -1 THEN NULL ELSE
             ((2 * abs(100 * ((round(value * 1000000))::HUGEINT
                              - (round(lag(value) OVER w * 1000000))::HUGEINT)) * 10000
               + nullif((round(lag(value) OVER w * 1000000))::HUGEINT, 0))
              // (2 * nullif((round(lag(value) OVER w * 1000000))::HUGEINT, 0)))
             * sign(100 * ((round(value * 1000000))::HUGEINT
                           - (round(lag(value) OVER w * 1000000))::HUGEINT))
             / 10000.0 END AS change_pct
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_events_value_change_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.date_trunc("second", "ts").alias("ts_sec"),
        F.round("value", 2).alias("value"),
        F.round(F.col("value") - prev, 2).alias("change_prev"),
        F.when(
            prev > 0,
            _RM_ratio4(
                F.lit(100)
                * (
                    F.round(F.col("value") * 1_000_000).cast("long")
                    - F.round(prev * 1_000_000).cast("long")
                ),
                F.round(prev * 1_000_000).cast("long"),
            ),
        ).alias("change_pct"),
    )


# --------------------------------------------------------------------------
# A8: rollup=true ingestion semantics — queryGranularity MINUTE floor plus
# dimension grouping with count/sum metrics
# (druid-goes-satellite-datasource.json:80-81).
# --------------------------------------------------------------------------
@query(
    "q_events_minute_grain_rollup",
    oracle="""
    SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute,
           event_type,
           count(*)             AS n,
           round(sum(value::DECIMAL(18,6)), 2)::DOUBLE AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_minute_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return e.groupBy(
        F.date_trunc("minute", "ts").alias("minute"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double").alias("sum_value"),
    )


# --------------------------------------------------------------------------
# F2: JSON field extraction from the `props` payload column (the
# from_json/get_json_object path — real_data_etl.py:86-94 nested access).
# --------------------------------------------------------------------------
@query(
    "q_events_json_props_extract",
    oracle="""
    WITH j AS (
      SELECT CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS raw,
             value
      FROM events)
    SELECT CASE WHEN regexp_matches(raw, '^-?[0-9]+$')
                THEN TRY_CAST(raw AS BIGINT) END AS k,
           count(*)             AS n,
           (sign(sum(value::DECIMAL(18,6)))::HUGEINT
            * ((2*abs((sum(value::DECIMAL(18,6))*1000000)::HUGEINT)
                + 100*count(*))
               // (200*count(*)))) / 10000.0 AS avg_value
    FROM j
    GROUP BY 1
    """,
)
def q_events_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # integer-shaped-or-NULL extraction, aligned across engines: a raw
    # get_json_object(...).cast("bigint") THROWS under ANSI on a float-
    # valued k, and DuckDB both errors on malformed JSON (json_valid
    # guard) and ROUNDS '12.5' on a plain string→BIGINT cast (regex
    # guard + TRY_CAST). Non-integer / malformed / overflowing values
    # group under the NULL key in both engines.
    raw = F.get_json_object("props", "$.k")
    k = F.when(raw.rlike("^-?[0-9]+$"), raw.try_cast("bigint"))
    return (
        e.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _RM_round4(
                F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000,
                F.count(F.lit(1)),
            ).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
# Sessionization — gap-based sessions (30 min) via lag + cumulative sum.
# Streaming twin: session_window(ts, '30 minutes') in streaming/ingest.
# --------------------------------------------------------------------------
@query(
    "q_events_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked)
    SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    # epoch-micros arithmetic: CAST(ts AS DOUBLE) is illegal on
    # TIMESTAMP_NTZ inputs (the round-2 bench crasher); unix_micros over
    # a timestamp-cast column is NTZ-proof and keeps sub-second precision.
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
    new_session = F.when(
        prev_ts.isNull() | (gap_us > 1800 * 1_000_000), 1
    ).otherwise(0)
    marked = e.select("user_id", "ts", "event_id", new_session.alias("new_session"))
    sessions = marked.select(
        "user_id",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# Gap-filled hourly series with last-observation-carried-forward — the
# hypertable/dashboard operator for irregular event streams: a dense
# hour grid per event_type, observed buckets aggregated exactly like
# q_events_hourly_rollup, holes filled by the previous value. Scale
# shape: the grid derives from a broadcast 1-row global min/max
# aggregate × the (tiny) type dimension; the fill is one window over
# the grid (grid rows = types × hours, orders of magnitude smaller
# than the event stream it summarizes).
# --------------------------------------------------------------------------
@query(
    "q_events_gapfill_locf",
    oracle="""
    WITH h AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
             (sign(sum(value::DECIMAL(18,6)))::HUGEINT * ((2*abs((sum(value::DECIMAL(18,6)) * 1000000)::HUGEINT) + 100*count(*)) // (200*count(*)))) / 10000.0 AS avg_value
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS lo,
             CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS hi
      FROM events),
    grid AS (
      SELECT t.event_type, CAST(g.h AS TIMESTAMP) AS hour
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(range((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds) + INTERVAL 1 HOUR,
                                      INTERVAL 1 HOUR)) AS h) g)
    SELECT g.event_type, g.hour,
           (h.avg_value IS NOT NULL) AS observed,
           last_value(h.avg_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
    FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.hour = g.hour
    """,
)
def q_events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        _RM_round4(
            F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000,
            F.count(F.lit(1)),
        ).alias("avg_value")
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = e.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.col("avg_value").isNotNull().alias("observed"),
            F.last("avg_value", ignorenulls=True).over(w).alias("value_filled"),
        )
    )


# --------------------------------------------------------------------------
# Ordered conversion funnel: view → click → purchase, each step's
# timestamp strictly after the previous step's (the Druid/ClickHouse
# `windowFunnel` shape). Scale shape: three min-aggregations keyed on
# user_id — after the first shuffle every later join is co-partitioned
# on the same key; event rows are filtered to one type before each agg,
# so no step touches the full stream twice.
# --------------------------------------------------------------------------
@query(
    "q_events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id),
    j AS (
      SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id)
    SELECT count(*)::BIGINT                                    AS n_step_view,
           count(t_click)::BIGINT                              AS n_step_click,
           count(t_purchase)::BIGINT                           AS n_step_purchase,
           ((20000*count(t_click)::HUGEINT + count(*))
              // (2*count(*))) / 10000.0                      AS click_rate,
           ((20000*count(t_purchase)::HUGEINT + count(*))
              // (2*count(*))) / 10000.0                      AS purchase_rate,
           round(avg(CASE WHEN t_purchase IS NOT NULL
                 THEN epoch_us(t_purchase - t_view) END), 4)   AS avg_us_to_convert
    FROM j
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    j = v.join(c, "user_id", "left").join(p, "user_id", "left")
    n = F.count(F.lit(1))
    convert_us = F.when(
        F.col("t_purchase").isNotNull(),
        F.unix_micros("t_purchase") - F.unix_micros("t_view"),
    )
    return j.agg(
        n.cast("long").alias("n_step_view"),
        F.count("t_click").cast("long").alias("n_step_click"),
        F.count("t_purchase").cast("long").alias("n_step_purchase"),
        _RM_ratio4(F.count("t_click"), n).alias("click_rate"),
        _RM_ratio4(F.count("t_purchase"), n).alias(
            "purchase_rate"
        ),
        F.round(F.avg(convert_us), 4).alias("avg_us_to_convert"),
    )


# --------------------------------------------------------------------------
# Retention cohorts: users grouped by first-activity day, counted on
# each later activity day — the dashboard triangle behind every
# engagement report. Scale shape: the (user, day) activity set is a
# pre-aggregated distinct (orders of magnitude smaller than the event
# stream); cohort assignment is one more min-agg on the same user_id
# partitioning, and the final join is co-partitioned.
# --------------------------------------------------------------------------
@query(
    "q_events_retention_cohorts",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events),
    c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
    SELECT c.cohort_day,
           date_diff('day', c.cohort_day, a.day)::BIGINT AS day_offset,
           count(*)::BIGINT                              AS n_users
    FROM a JOIN c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    a = e.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    c = a.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        a.join(c, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").cast("long").alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


# --------------------------------------------------------------------------
# Z-score anomaly profile: per-type outlier counts against the type's
# own mean/σ — the monitoring query behind every "alert on unusual
# value" dashboard panel. Moments accumulate as exact decimals (sum and
# sum-of-squares), so mean/σ — and therefore the |z|>3 threshold — are
# bit-identical across engines and partitionings; a float stddev_samp
# would drift in the last ulp and flip boundary events. Two passes over
# the type partition (combiner-friendly agg + broadcast join back);
# no window, no sort.
# --------------------------------------------------------------------------
@query(
    "q_events_anomaly_zscore",
    oracle="""
    WITH m AS (
      SELECT event_type,
             count(*)                            AS n,
             sum(value::DECIMAL(18,6))::DOUBLE   AS s1,
             -- one operand DECIMAL(19,6): DuckDB then types the product
             -- DECIMAL(37,12) on the int128 path (18x18 stays int64 and
             -- OVERFLOWS at |v| > ~3034); Spark's 18,6 x 18,6 is the
             -- same exact DECIMAL(37,12)
             sum((value::DECIMAL(19,6)) * (value::DECIMAL(18,6)))::DOUBLE AS s2
      FROM events GROUP BY event_type),
    stats AS (
      SELECT event_type, n,
             s1 / n AS mean,
             sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
      FROM m)
    SELECT e.event_type,
           any_value(st.n)::BIGINT AS n_events,
           sum(CASE WHEN abs((e.value - st.mean) / st.sd) > 3
                    THEN 1 ELSE 0 END)::BIGINT AS n_anomalies,
           round(sum(CASE WHEN abs((e.value - st.mean) / st.sd) > 3
                          THEN 1 ELSE 0 END)::DOUBLE / any_value(st.n), 4)
             AS anomaly_rate,
           round(any_value(st.mean), 4) AS mean_value,
           round(any_value(st.sd), 4)   AS std_value
    FROM events e JOIN stats st ON e.event_type = st.event_type
    GROUP BY e.event_type
    """,
)
def q_events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # decimal(18,6) squared is decimal(37,12) in BOTH Spark and DuckDB —
    # wider operands diverge: Spark caps dec*dec at DECIMAL(38,6) under
    # allowPrecisionLoss (rounds each square to 6 dp) while DuckDB keeps
    # DECIMAL(38,24), so s2 would desync the moment fixture values carry
    # more than a few decimal digits
    dec = F.col("value").cast("decimal(18,6)")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    stats = m.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    z = F.abs((F.col("value") - F.col("mean")) / F.col("sd"))
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n").cast("long").alias("n_events"),
            F.sum((z > 3).cast("long")).alias("n_anomalies"),
            F.round(
                F.sum((z > 3).cast("long")).cast("double") / F.any_value("n"), 4
            ).alias("anomaly_rate"),
            F.round(F.any_value("mean"), 4).alias("mean_value"),
            F.round(F.any_value("sd"), 4).alias("std_value"),
        )
    )


# --------------------------------------------------------------------------
# Hypertable continuous aggregate: the materialized hourly rollup is
# built from early data, then two incremental batches (one of them
# late-arriving rows for days already materialized) are merged through
# operators/rollup_maintenance.apply_increment — which reads and
# rewrites ONLY the touched day partitions. The oracle is a straight
# SQL rollup over ALL events: incremental maintenance must be
# indistinguishable from a full recompute.
# --------------------------------------------------------------------------
@query(
    "q_rollup_incremental_maintenance",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             event_type,
             (round(value * 1000000))::BIGINT AS micros
      FROM events),
    r AS (
      SELECT bucket, event_type,
             count(*) AS n,
             sum(micros) AS s_micros
      FROM m GROUP BY 1, 2)
    SELECT bucket, event_type,
           n::BIGINT                                AS n_events,
           (sign(s_micros)::HUGEINT * ((2*abs(s_micros::HUGEINT) + 100) // 200)) / 10000.0          AS sum_value,
           (sign(s_micros)::HUGEINT * ((2*abs(s_micros::HUGEINT) + 100*n) // (200*n))) / 10000.0    AS avg_value
    FROM r
    """,
)
def q_rollup_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:

    from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM

    e = _events(spark, sf_dir)
    cutoff = F.lit("2024-01-20").cast("date")
    late_held_back = (F.to_date("ts") < cutoff) & (F.col("event_id") % 7 == 0)
    initial = e.filter((F.to_date("ts") < cutoff) & ~(F.col("event_id") % 7 == 0))
    inc_a = e.filter(
        (F.to_date("ts") >= cutoff) & (F.to_date("ts") < F.date_add(cutoff, 5))
    )
    # batch B mixes genuinely new days with LATE rows for already-
    # materialized days — the case naive append-only rollups get wrong
    inc_b = e.filter(
        (F.to_date("ts") >= F.date_add(cutoff, 5)) | late_held_back
    )
    path = scratch_dir("rollup_maint_")
    RM.build_rollup(initial, path)
    RM.apply_increment(spark, path, inc_a)
    RM.apply_increment(spark, path, inc_b)
    r = RM.read_rollup(spark, path)
    # read_rollup's serving view already emits exact-integer-rounded
    # 4-dp values (round4_micros) — no double re-round here
    return r.select("bucket", "event_type", "n_events", "sum_value", "avg_value")


# --------------------------------------------------------------------------
# Rollup SERVING — the other half of the continuous-aggregate story:
# Druid dashboards implicitly read pre-aggregated segments, not raw
# rows. Here a DAILY per-type dashboard is answered entirely from the
# materialized HOURLY rollup (grain coarsening re-aggregates the
# mergeable integer-micros partials; avg derives at read time), and the
# oracle recomputes the same dashboard from raw events — proving
# served == raw exactly. The serving plan scans hours × types rollup
# rows, never the events table (plan-pinned).
# --------------------------------------------------------------------------
@query(
    "q_rollup_served_daily_dashboard",
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
def q_rollup_served_daily_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:

    from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM

    e = _events(spark, sf_dir)
    path = scratch_dir("rollup_serve_")
    RM.build_rollup(e, path)
    return RM.serve_rollup(spark, path, grain="day", dims=("event_type",))


# --------------------------------------------------------------------------
# Sketch-valued rollup metrics — the reason Druid loads
# druid-datasketches at ingest time: the rollup stores a mergeable HLL
# user sketch per (hour, type) bucket (HLLSketchBuild) and unions it at
# query time (HLLSketchMerge), so "distinct users per day" is
# answerable FROM the pre-aggregated store — a plain count column can
# never give that back. lgK=14 keeps the sketch exact far beyond
# fixture cardinality (verified exact at the sf0.1 1,098-users/bucket
# regime; the gate runs sf0.01 at ≤150), so the oracle checks the
# exact distinct count — the Theta/MG exact-below-capacity device.
# --------------------------------------------------------------------------
@query(
    "q_rollup_served_distinct_users",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           event_type,
           count(*)::BIGINT                 AS n_events,
           count(DISTINCT user_id)::BIGINT  AS approx_users
    FROM events GROUP BY 1, 2
    """,
)
def q_rollup_served_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:

    from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM

    e = _events(spark, sf_dir)
    path = scratch_dir("rollup_serve_hll_")
    RM.build_rollup(e, path)
    served = RM.serve_rollup(
        spark, path, grain="day", dims=("event_type",), with_distinct=True
    )
    return served.select("bucket", "event_type", "n_events", "approx_users")


# --------------------------------------------------------------------------
# Rollup SCHEMA EVOLUTION, driver-verified end to end (round 5): the
# store is built with (event_type) only, then an increment arrives
# carrying a NEW dimension (user_cohort) and opts into
# on_new_columns="evolve" through the exactly-once staged-publish path
# (batch_id set). Druid's per-segment schema semantics: pre-evolution
# partitions are never rewritten, so their rows serve NULL for the new
# dimension while post-evolution rows carry real values — the oracle
# replicates that exactly with a CASE on the cutoff. Totals, extrema
# and averages must still merge exactly across the schema boundary.
# --------------------------------------------------------------------------
@query(
    "q_rollup_schema_evolution",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
             event_type,
             CASE WHEN ts >= TIMESTAMP '2024-01-15'
                  THEN (user_id % 5)::BIGINT ELSE NULL END AS user_cohort,
             (round(value * 1000000))::BIGINT AS micros
      FROM events)
    SELECT bucket, event_type, user_cohort,
           count(*)::BIGINT                             AS n_events,
           (sign(sum(micros))::HUGEINT * ((2*abs(sum(micros)::HUGEINT) + 100) // 200)) / 10000.0 AS sum_value,
           (sign(sum(micros))::HUGEINT * ((2*abs(sum(micros)::HUGEINT) + 100*count(*)) // (200*count(*)))) / 10000.0                   AS avg_value,
           (sign(min(micros))::HUGEINT * ((2*abs(min(micros)::HUGEINT) + 100) // 200)) / 10000.0 AS min_value,
           (sign(max(micros))::HUGEINT * ((2*abs(max(micros)::HUGEINT) + 100) // 200)) / 10000.0 AS max_value
    FROM m GROUP BY 1, 2, 3
    """,
)
def q_rollup_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:

    from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM

    e = _events(spark, sf_dir).withColumn(
        "user_cohort", (F.col("user_id") % 5).cast("long")
    )
    cutoff = F.col("ts") >= F.lit("2024-01-15").cast("timestamp")
    path = scratch_dir("rollup_evolve_") + "/store"
    RM.build_rollup(e.filter(~cutoff), path, dims=("event_type",))
    RM.apply_increment(
        spark,
        path,
        e.filter(cutoff),
        dims=("event_type", "user_cohort"),
        on_new_columns="evolve",
        batch_id=1,
    )
    return RM.serve_rollup(
        spark, path, grain="day", dims=("event_type", "user_cohort")
    )


# --------------------------------------------------------------------------
# The funnel again, ONE-SCAN (round 5): q_events_funnel expresses the
# strict view→click→purchase sequence as three grouped mins + joins —
# clear, co-partitioned, but it reads events three times and plans 6
# exchanges. This variant is the at-scale shape: a single scan, a
# single hash shuffle (all three windows + the per-user groupBy share
# the user_id partitioning), sequential qualification via STACKED
# running-mins — first_view-so-far qualifies clicks, first-qualified-
# click-so-far qualifies purchases. Strict-inequality tie semantics are
# order-independent (an equal-timestamp event never qualifies either
# way), so the result is identical to the join formulation and the two
# queries SHARE the oracle — the driver proves the rewrite.
# --------------------------------------------------------------------------
@query(
    "q_events_funnel_one_pass",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id),
    j AS (
      SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id)
    SELECT count(*)::BIGINT                                    AS n_step_view,
           count(t_click)::BIGINT                              AS n_step_click,
           count(t_purchase)::BIGINT                           AS n_step_purchase,
           ((20000*count(t_click)::HUGEINT + count(*))
              // (2*count(*))) / 10000.0                      AS click_rate,
           ((20000*count(t_purchase)::HUGEINT + count(*))
              // (2*count(*))) / 10000.0                      AS purchase_rate,
           round(avg(CASE WHEN t_purchase IS NOT NULL
                 THEN epoch_us(t_purchase - t_view) END), 4)   AS avg_us_to_convert
    FROM j
    """,
)
def q_events_funnel_one_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s1 = e.select(
        "user_id",
        "ts",
        "event_id",  # the windows' deterministic tie-break key
        "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .over(w)
        .alias("fv"),
    )
    s2 = s1.withColumn(
        "qc",
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("fv")),
            F.col("ts"),
        ),
    ).withColumn("fqc", F.min("qc").over(w))
    s3 = s2.withColumn(
        "qp",
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("fqc")),
            F.col("ts"),
        ),
    )
    per_user = (
        s3.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "t_view"
            ),
            F.min("qc").alias("t_click"),
            F.min("qp").alias("t_purchase"),
        )
        .filter(F.col("t_view").isNotNull())
    )
    n = F.count(F.lit(1))
    convert_us = F.when(
        F.col("t_purchase").isNotNull(),
        F.unix_micros("t_purchase") - F.unix_micros("t_view"),
    )
    return per_user.agg(
        n.cast("long").alias("n_step_view"),
        F.count("t_click").cast("long").alias("n_step_click"),
        F.count("t_purchase").cast("long").alias("n_step_purchase"),
        _RM_ratio4(F.count("t_click"), n).alias("click_rate"),
        _RM_ratio4(F.count("t_purchase"), n).alias(
            "purchase_rate"
        ),
        F.round(F.avg(convert_us), 4).alias("avg_us_to_convert"),
    )
