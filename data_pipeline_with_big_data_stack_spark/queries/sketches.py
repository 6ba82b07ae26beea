"""Approximate / sketch aggregations (SURVEY §2.4 A9).

Druid loads ``druid-datasketches`` and ``druid-histogram``
(``M/app_druid/environment.env:5``) without using them in any spec; the
engine exposes the Spark equivalents: HyperLogLog++
(``approx_count_distinct``), Apache DataSketches HLL
(``hll_sketch_agg``/``hll_sketch_estimate`` — mergeable across
partitions/tables, the property Druid sketches exist for), and
``percentile_approx`` (GK-quantile).

Approximate answers are engine-specific by nature, so these queries are
registered ROWS-ONLY (no value oracle); the accuracy contract is pinned
by unit tests asserting relative error vs the exact answer
(tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.session import prepare_session
from data_pipeline_with_big_data_stack_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


@query("q_approx_distinct_users", oracle=None)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type, with the exact count beside
    it — a single pass; at 100 TB the approx column shuffles O(sketch)
    bytes per group while exact distinct shuffles every key."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


@query("q_hll_sketch_mergeable", oracle=None)
def q_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL: per-type sketches merged into a global estimate
    (hll_sketch_agg → hll_union_agg) — the pre-aggregate-then-merge
    pattern Druid's datasketches extension serves, here as two cheap
    aggregation levels with no raw-key reshuffle."""
    e = _t(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_total_users"),
        F.sum("n_events").alias("n_events"),
    )


@query("q_approx_percentiles_value", oracle=None)
def q_approx_percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-quantile percentiles per event type. Three scalar double
    columns (not one array column — array cells break row-hash
    canonicalization downstream); one aggregation pass computes the
    shared sketch, Catalyst dedups the three percentile_approx calls."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.percentile_approx("value", 0.95, 10000).alias("approx_p95"),
        F.percentile_approx("value", 0.99, 10000).alias("approx_p99"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("exact_p50"),
    )
