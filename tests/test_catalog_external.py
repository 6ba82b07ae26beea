"""Catalog (S20) and external-source builder (S9-S12) tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark import catalog
from tests.conftest import reset_managed_table
from data_pipeline_with_big_data_stack_spark.sources import external


class TestCatalog:
    def test_register_and_list(self, spark, tmp_path):
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        p = str(tmp_path / "t1")
        df.write.parquet(p)
        catalog.register_parquet_table(spark, "cat_t1", p, comment="test table")
        names = [e.name for e in catalog.list_tables(spark, "cat_*")]
        assert "cat_t1" in names
        assert spark.table("cat_t1").count() == 10
        spark.sql("DROP TABLE IF EXISTS cat_t1")

    def test_topic_filter_include_patterns(self):
        topics = [
            "goes_satellite_data", "real_crypto_prices", "weather_data",
            "stock_prices", "spark_analytics", "demo", "goes_storage_metrics",
            "__consumer_offsets", "internal.heartbeat",
        ]
        # the reference lists its seven topics explicitly; globs also work
        got = catalog.filter_topics(topics, ["goes_*", "spark_analytics", "demo"])
        assert got == ["demo", "goes_satellite_data", "goes_storage_metrics",
                       "spark_analytics"]
        assert "__consumer_offsets" not in got

    def test_lineage_roundtrip(self, spark):
        reset_managed_table(spark, "engine_lineage")
        catalog.record_lineage(
            spark,
            [
                ("kafka:goes_satellite_data", "table:goes_satellite", "ingest"),
                ("http:citic", "kafka:goes_satellite_data", "etl_dag"),
                ("table:goes_satellite", "dashboard:solar", "superset"),
            ],
        )
        up = catalog.upstream_of(spark, "dashboard:solar")
        assert up == [
            "http:citic", "kafka:goes_satellite_data", "table:goes_satellite"
        ]
        spark.sql("DROP TABLE IF EXISTS engine_lineage")


class TestExternalSources:
    def test_jdbc_query_builder_configures_reader(self, spark):
        r = external.jdbc_query(
            spark, "jdbc:postgresql://h/db", "SELECT 1 AS x",
            partition_column="x", lower_bound="0", upper_bound="100",
            num_partitions=4,
        )
        # builder returns a lazily-configured reader; no connection yet
        assert r is not None

    def test_incremental_predicate_prunes(self, spark):
        df = spark.range(10).withColumn(
            "order_date",
            F.current_timestamp() - F.expr("make_interval(0,0,0,0,id*1,0,0)"),
        )  # rows 0..9 at now-0h..now-9h
        got = df.filter(external.incremental_predicate("order_date", 3)).count()
        assert got == 4  # 0h,1h,2h old + the row exactly on the 3h boundary

    def test_object_store_json_provenance(self, spark, tmp_path):
        d = tmp_path / "bucket" / "prefix"
        os.makedirs(d)
        (d / "a.json").write_text(json.dumps({"k": 1}) + "\n" + json.dumps({"k": 2}))
        (d / "b.json").write_text(json.dumps({"k": 3}))
        df = external.object_store_json(spark, str(d))
        rows = df.select("k", "file_name").collect()
        assert {(r["k"], r["file_name"]) for r in rows} == {
            (1, "a.json"), (2, "a.json"), (3, "b.json")
        }

    def test_mongo_builder_no_connector_is_lazy(self, spark):
        r = external.mongo_collection(
            spark, "mongodb://h", "db", "coll", lookback_hours=2
        )
        assert r is not None  # .load() would need the connector jar


def test_rollup_store_registered_with_lineage(spark, tmp_path):
    """The materialized rollup participates in the catalog like any
    table: queryable by name and lineage-upstream of its source."""
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.catalog import upstream_of
    from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM
    from data_pipeline_with_big_data_stack_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    # engine_lineage is a MANAGED table: self-healing reset before,
    # drop after — a bare DROP can't clear a warehouse dir leaked by an
    # aborted run (LOCATION_ALREADY_EXISTS on the next saveAsTable)
    reset_managed_table(spark, "engine_lineage")
    try:
        e = load_table(spark, SF_SMOKE, "events")
        path = str(tmp_path / "rollup")
        RM.build_rollup(e, path)
        RM.register_rollup_store(
            spark, "events_hourly_rollup_cat", path, source_table="events"
        )
        n = spark.sql(
            "SELECT sum(n_events) AS n FROM events_hourly_rollup_cat"
        ).collect()[0].n
        assert n == e.count()
        assert "events" in upstream_of(spark, "events_hourly_rollup_cat")
    finally:
        spark.sql("DROP TABLE IF EXISTS engine_lineage")
        spark.sql("DROP TABLE IF EXISTS events_hourly_rollup_cat")


def test_expire_then_repair_keeps_registered_table_servable(spark, tmp_path):
    """Retention + catalog interplay: expiring day partitions under a
    REGISTERED store resyncs the metastore AUTOMATICALLY when the sweep
    is given the table name (it runs MSCK REPAIR ... SYNC PARTITIONS
    itself — the recipe used to be a docstring instruction), and the
    table then serves exactly the kept days."""
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM
    from data_pipeline_with_big_data_stack_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    reset_managed_table(spark, "engine_lineage")
    try:
        e = load_table(spark, SF_SMOKE, "events")
        path = str(tmp_path / "rollup")
        RM.build_rollup(e, path)
        RM.register_rollup_store(
            spark, "events_rollup_retention_cat", path, source_table="events"
        )
        days = sorted(
            r["__date"]
            for r in spark.sql(
                "SELECT DISTINCT __date FROM events_rollup_retention_cat"
            ).collect()
        )
        cutoff = days[len(days) // 2]
        RM.expire_partitions(
            spark, path, cutoff, table="events_rollup_retention_cat"
        )
        kept = sorted(
            r["__date"]
            for r in spark.sql(
                "SELECT DISTINCT __date FROM events_rollup_retention_cat"
            ).collect()
        )
        assert kept == [d for d in days if d >= cutoff]
        n = spark.sql(
            "SELECT sum(n_events) AS n FROM events_rollup_retention_cat"
        ).collect()[0].n
        assert n == e.filter(F.to_date("ts") >= F.lit(str(cutoff))).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS engine_lineage")
        spark.sql("DROP TABLE IF EXISTS events_rollup_retention_cat")
