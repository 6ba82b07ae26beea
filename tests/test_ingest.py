"""Ingestion-layer tests: spec compilation, time semantics, partition
layout, rollup, cleanup operators — the Druid-supervisor semantics
(SURVEY §1.4, §2.2) on reference-shaped synthetic data."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_with_big_data_stack_spark import ingest
from data_pipeline_with_big_data_stack_spark.operators import cleanup
from data_pipeline_with_big_data_stack_spark.schemas import (
    ALL_DATASOURCES,
    DEMO,
    GOES_SATELLITE,
    SPARK_ANALYTICS,
)
from data_pipeline_with_big_data_stack_spark.sources.generators import (
    coin_ticks_source,
    goes_sample_source,
    sessions_source,
)


def test_all_specs_schema_has_time_and_typed_dims():
    for spec in ALL_DATASOURCES:
        schema = spec.schema()
        assert schema.fields[0].name == "__time"
        assert isinstance(schema.fields[0].dataType, T.TimestampType)
        assert len(schema.fields) == len(spec.dimensions) + 1


def test_compile_transform_posix_parse_and_floor(spark):
    src = goes_sample_source(spark, n=10, anchor_epoch=1_700_000_000)
    out = ingest.compile_transform(GOES_SATELLITE, src)
    rows = out.select("__time").orderBy(F.desc("__time")).limit(1).collect()
    # queryGranularity MINUTE floors the anchor to its minute
    assert rows[0][0].second == 0
    assert out.schema["__time"].dataType == T.TimestampType()
    # all declared dimensions present with declared types
    for dim in GOES_SATELLITE.dimensions:
        assert out.schema[dim.name].dataType == dim.spark_type


def test_ingest_batch_partition_layout(spark, tmp_path):
    src = sessions_source(spark, n=200, anchor_epoch=1_700_000_000)
    path = str(tmp_path / "spark_analytics")
    ingest.ingest_batch(SPARK_ANALYTICS, src, path, mode="overwrite")
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert "__date" in back.columns
    # date partitioning materialized on disk (partition pruning surface)
    parts = [p.name for p in (tmp_path / "spark_analytics").iterdir() if p.is_dir()]
    assert any(p.startswith("__date=") for p in parts)


def test_hour_segment_partitioning(spark, tmp_path):
    src = coin_ticks_source(spark, n_ticks=50)
    path = str(tmp_path / "demo")
    ingest.ingest_batch(DEMO, src, path, mode="overwrite")
    back = spark.read.parquet(path)
    assert back.count() == 200  # 4 coins per tick
    assert {"__date", "__hour"} <= set(back.columns)


def test_rollup_preaggregates(spark):
    from dataclasses import replace

    from data_pipeline_with_big_data_stack_spark.schemas import GranularitySpec

    spec = replace(
        DEMO, granularity=GranularitySpec("HOUR", "HOUR", rollup=True)
    )
    src = coin_ticks_source(spark, n_ticks=100)  # 100 s of ticks, same hour
    out = ingest.compile_transform(spec, src)
    rows = out.collect()
    # 4 coins × small data_id ranges collapse heavily within one hour
    assert all(r["__count"] >= 1 for r in rows)
    assert sum(r["__count"] for r in rows) == 400


def test_zero_fill_nan(spark):
    df = spark.createDataFrame(
        [(1, float("nan"), None, None), (2, 3.5, 4.0, 7)],
        "id int, a double, b double, c long",
    )
    out = cleanup.zero_fill_nan(df).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["a"] == 0.0 and by_id[1]["b"] == 0.0 and by_id[1]["c"] == 0
    assert by_id[2]["a"] == 3.5 and by_id[2]["c"] == 7


def test_resolve_synonyms(spark):
    df = spark.createDataFrame([(1e-7, 2.0)], "xrsa_short double, xrsb1 double")
    out = cleanup.resolve_synonyms(
        df,
        {
            "irradiance_xrsa1": ("irradiance_xrsa1", "xrsa1", "xrsa_short"),
            "irradiance_xrsb1": ("irradiance_xrsb1", "xrsb1"),
            "dispersion_angle": ("dispersion_angle", "disp_angle"),
        },
    )
    row = out.collect()[0]
    assert math.isclose(row["irradiance_xrsa1"], 1e-7)
    assert row["irradiance_xrsb1"] == 2.0
    assert row["dispersion_angle"] == 0.0  # zero-filled missing
    assert "xrsa_short" not in out.columns


def test_strip_percent(spark):
    df = spark.createDataFrame([("1.25%",), ("-0.3%",)], "change_percent string")
    vals = [r[0] for r in df.select(cleanup.strip_percent("change_percent")).collect()]
    assert vals == ["1.25", "-0.3"]


def test_parse_event_time_formats(spark):
    df = spark.createDataFrame(
        [(1_700_000_000, 1_700_000_000_123, "2023-11-14T22:13:20")],
        "posix long, millis long, iso string",
    )
    row = df.select(
        cleanup.parse_event_time("posix", "posix").alias("p"),
        cleanup.parse_event_time("millis", "millis").alias("m"),
        cleanup.parse_event_time("iso", "iso").alias("i"),
    ).collect()[0]
    assert row["p"] == row["i"]
    assert abs((row["m"] - row["p"]).total_seconds()) < 1


def test_to_kafka_json_roundtrip(spark):
    src = coin_ticks_source(spark, n_ticks=2)
    msgs = ingest.to_kafka_json(src)
    assert msgs.columns == ["value"]
    import json

    parsed = json.loads(msgs.collect()[0]["value"])
    assert set(parsed) == {"timestamp", "name", "data_id"}


def test_generators_deterministic(spark):
    a = goes_sample_source(spark, n=50).collect()
    b = goes_sample_source(spark, n=50).collect()
    assert a == b
    s = sessions_source(spark, n=50).collect()
    assert all(r["revenue"] == 0.0 or r["revenue"] > 0 for r in s)
    # zero-inflation wiring: some zeros, some positive
    assert any(r["revenue"] == 0.0 for r in s)
    assert any(r["revenue"] > 0 for r in s)


def test_goes_expected_invariant_30_rows_per_file(spark):
    """The reference's expected-result query: GROUP BY source_file →
    COUNT(*) = 30 (GOES_PIPELINE_REPORT.md:285-289) on a fixture-shaped
    synthetic table."""
    src = goes_sample_source(spark, n=30)
    out = ingest.compile_transform(GOES_SATELLITE, src)
    prof = out.groupBy("source_file").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(prof) == 1 and prof[0]["n"] == 30


def test_fifteen_minute_grain_and_full_ladder(spark):
    from data_pipeline_with_big_data_stack_spark.schemas import DatasourceSpec, Dimension, GranularitySpec, TimestampSpec

    spec = DatasourceSpec(
        name="g15", topic="g15",
        timestamp=TimestampSpec("t", "posix"),
        dimensions=(Dimension("k", "string"),),
        granularity=GranularitySpec("DAY", "FIFTEEN_MINUTE"),
    )
    base = 1_699_999_200  # multiple of 900 — bucket-aligned
    src = spark.createDataFrame(
        [(base + s, "a") for s in (0, 450, 900, 1350)], ["t", "k"]
    )
    out = ingest.compile_transform(spec, src).select("__time").distinct()
    assert out.count() == 2  # 0/450 floor together; 900/1350 floor together


def test_auto_timestamp_format(spark):
    from data_pipeline_with_big_data_stack_spark.operators.cleanup import parse_event_time

    df = spark.createDataFrame(
        [("1700000000",), ("1700000000123",), ("2023-11-14T22:13:20",)], ["t"]
    ).select(parse_event_time("t", "auto").alias("ts"))
    got = sorted(str(r["ts"]) for r in df.collect())
    # all three forms land on the same instant (2023-11-14 22:13:20 UTC)
    assert len(set(g[:19] for g in got)) == 1


def test_unsupported_grain_raises_cleanly(spark):
    from data_pipeline_with_big_data_stack_spark.ingest import _floor_time

    import pytest as _pytest

    with _pytest.raises(ValueError, match="queryGranularity"):
        _floor_time("DURATION", None)
