"""End-to-end pipeline integration: the full reference workflow on Spark.

Mirrors the reference's complete lifecycle (SURVEY §3.1/§3.3) in one
test session: acquire (generators / fake-fetcher REST / fake NetCDF) →
ingest per supervisor spec (typed dims, __time, date partitions) →
register in the catalog with lineage → query through the Druid SQL
dialect shim — the documented dashboard queries running verbatim against
the ingested tables, exactly what a reference user would run after
switching engines.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark import catalog, ingest
from data_pipeline_with_big_data_stack_spark.plans.sql_shim import druid_sql
from data_pipeline_with_big_data_stack_spark.schemas import (
    GOES_SATELLITE,
    REAL_CRYPTO,
    SPARK_ANALYTICS,
)
from data_pipeline_with_big_data_stack_spark.sources import generators, netcdf, rest


@pytest.fixture(scope="module")
def pipeline_tables(spark, tmp_path_factory):
    """Ingest three representative datasources end-to-end."""
    base = tmp_path_factory.mktemp("warehouse")

    # 1. GOES: fake NetCDF files → binaryFile scan → mapInPandas → spec
    ncdir = base / "landing_nc"
    ncdir.mkdir()
    for i in range(4):
        payload = {
            "units": "seconds since 2023-04-26 00:00:00",
            "variables": {
                "time": [t * 10 for t in range(30)],
                "xrsa1": [1e-7 + i * 1e-9 + t * 1e-10 for t in range(30)],
                "xrsb1": [2e-8] * 30,
            },
        }
        (ncdir / f"OR_EXIS-L1b-SFXR_G18_s{i}_e{i}_c{i}.nc").write_bytes(
            b"FAKENC1\n" + json.dumps(payload).encode()
        )
    goes_raw = netcdf.read_netcdf_directory(spark, str(ncdir))
    goes_path = str(base / "goes_satellite")
    ingest.ingest_batch(GOES_SATELLITE, goes_raw, goes_path)
    catalog.register_parquet_table(
        spark, "goes_satellite_datasource", goes_path, comment="GOES EXIS/SFXR"
    )

    # 2. crypto: REST poll (fake fetcher) → spec
    payload = {
        c: {"usd": 10.0 * (i + 1), "usd_market_cap": 1000 * (i + 1),
            "usd_24h_change": i - 1.5}
        for i, c in enumerate(rest.COINS)
    }
    crypto_raw = rest.crypto_prices(spark, lambda u: payload, 1_700_000_000)
    crypto_path = str(base / "real_crypto")
    ingest.ingest_batch(REAL_CRYPTO, crypto_raw, crypto_path)
    catalog.register_parquet_table(spark, "real_crypto_datasource", crypto_path)

    # 3. sessions: seeded generator → spec
    sess_raw = generators.sessions_source(spark, n=500, seed=3)
    sess_path = str(base / "spark_analytics")
    ingest.ingest_batch(SPARK_ANALYTICS, sess_raw, sess_path)
    catalog.register_parquet_table(spark, "spark_analytics_datasource", sess_path)

    from tests.conftest import reset_managed_table

    reset_managed_table(spark, "e2e_lineage")  # managed table — self-heal
    catalog.record_lineage(
        spark,
        [
            ("file:landing_nc", "table:goes_satellite_datasource", "netcdf_ingest"),
            ("api:coingecko", "table:real_crypto_datasource", "rest_ingest"),
            ("gen:sessions", "table:spark_analytics_datasource", "generator"),
        ],
        table="e2e_lineage",
    )
    yield
    for t in (
        "goes_satellite_datasource",
        "real_crypto_datasource",
        "spark_analytics_datasource",
        "e2e_lineage",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_goes_table_shape_and_invariant(spark, pipeline_tables):
    t = spark.table("goes_satellite_datasource")
    assert t.count() == 4 * 30
    # per-file profile — GROUP BY source_file → COUNT(*)=30 (the report's
    # documented validation query)
    prof = t.groupBy("source_file").count().collect()
    assert len(prof) == 4 and all(r["count"] == 30 for r in prof)
    # minute queryGranularity floored __time; date partition column present
    assert "__date" in t.columns
    assert t.filter(F.second("__time") != 0).count() == 0


def test_druid_dashboard_sql_runs_verbatim(spark, pipeline_tables):
    # README.md:173-182-shaped hourly dashboard over the ingested table
    out = druid_sql(
        spark,
        """
        SELECT TIME_FLOOR(__time, 'PT1H') AS hour,
               AVG(irradiance_xrsa1) AS avg_xrsa1,
               AVG(irradiance_xrsb1) AS avg_xrsb1,
               COUNT(*) AS n
        FROM goes_satellite_datasource
        GROUP BY 1 ORDER BY 1
        """,
    ).collect()
    assert len(out) >= 1
    assert sum(r["n"] for r in out) == 120
    # market-cap ordering query (README.md:185-192 shape)
    coins = druid_sql(
        spark,
        """
        SELECT coin_id, price_usd, market_cap
        FROM real_crypto_datasource
        ORDER BY market_cap DESC
        """,
    ).collect()
    assert [r["coin_id"] for r in coins][0] == "polkadot"  # largest cap fake


def test_demoSpark_report_queries(spark, pipeline_tables):
    # the reference's Spark job aggregations (demoSpark.py:69-94) on the
    # ingested sessions table
    t = spark.table("spark_analytics_datasource")
    by_country = (
        t.groupBy("country")
        .agg(
            F.count(F.lit(1)).alias("sessions"),
            F.avg("page_views").alias("avg_pages"),
            F.sum("revenue").alias("total_revenue"),
        )
        .orderBy(F.desc("sessions"))
    ).collect()
    assert sum(r["sessions"] for r in by_country) == 500
    high_value = t.filter(F.col("revenue") > 100).select(
        "user_id", "revenue", "device_type", "country"
    )
    assert high_value.count() > 0


def test_lineage_traceable(spark, pipeline_tables):
    up = catalog.upstream_of(
        spark, "table:goes_satellite_datasource", table="e2e_lineage"
    )
    assert up == ["file:landing_nc"]


def test_remaining_datasources_ingest(spark, tmp_path):
    """The other four datasources end-to-end: weather and stocks from
    fake-fetcher REST polls, demo coin-ticks from the generator, and the
    GOES storage-metrics record derived from an ingested GOES table —
    all seven reference datasources compile through their specs."""
    from data_pipeline_with_big_data_stack_spark.operators.metrics import storage_metrics_from_goes
    from data_pipeline_with_big_data_stack_spark.schemas import (
        DEMO,
        GOES_SATELLITE,
        GOES_STORAGE_METRICS,
        STOCKS,
        WEATHER,
    )
    from data_pipeline_with_big_data_stack_spark.sources.generators import coin_ticks_source, goes_sample_source

    # weather
    w_raw = rest.weather(
        spark,
        lambda url: {
            "main": {"temp": 22.0, "humidity": 70, "pressure": 1011.0},
            "weather": [{"description": "clear"}],
            "wind": {"speed": 2.0},
        },
        1_700_000_000,
        cities=("Cartago",),
    )
    w_path = str(tmp_path / "weather")
    ingest.ingest_batch(WEATHER, w_raw, w_path)
    wt = spark.read.parquet(w_path)
    assert wt.count() == 1 and dict(wt.dtypes)["temperature"] == "double"

    # stocks
    s_raw = rest.stock_prices(
        spark,
        lambda url: {
            "Global Quote": {
                "05. price": "10.5", "09. change": "0.5",
                "10. change percent": "5.0%", "06. volume": "1000",
            }
        },
        1_700_000_000,
        symbols=("AAPL",),
    )
    s_path = str(tmp_path / "stocks")
    ingest.ingest_batch(STOCKS, s_raw, s_path)
    st = spark.read.parquet(s_path)
    assert st.count() == 1
    assert dict(st.dtypes)["change_percent"] == "string"  # parity quirk

    # demo coin ticks (HOUR segments -> __hour partition column)
    d_raw = coin_ticks_source(spark, n_ticks=10)
    d_path = str(tmp_path / "demo")
    ingest.ingest_batch(DEMO, d_raw, d_path)
    dt = spark.read.parquet(d_path)
    assert dt.count() == 40 and "__hour" in dt.columns

    # storage metrics from an ingested GOES table
    g_raw = goes_sample_source(spark, n=60)
    g_path = str(tmp_path / "goes")
    ingest.ingest_batch(GOES_SATELLITE, g_raw, g_path)
    metrics = storage_metrics_from_goes(
        spark.read.parquet(g_path), extraction_epoch=1_700_000_000
    )
    m_path = str(tmp_path / "metrics")
    ingest.ingest_batch(GOES_STORAGE_METRICS, metrics, m_path)
    mt = spark.read.parquet(m_path).collect()[0]
    # generator: one synthetic "file" of 15.5 MB (sample-data shape)
    assert mt["current_files_processed"] == 1
    assert mt["current_storage_mb"] == 15.5
    assert mt["projected_daily_growth_mb"] == round(15.5 * 144, 2)
    assert mt["projected_weekly_growth_gb"] == round(15.5 * 144 * 7 / 1024, 4)


def test_druid_datasketches_sql_shim(spark):
    """Druid's druid-datasketches SQL aggregators run through the shim
    against the events table: DS_HLL/DS_THETA distinct counts land
    within sketch error of exact (theta exact below nominal entries),
    quantiles are real data-order statistics."""
    from data_pipeline_with_big_data_stack_spark.tables import load_table
    from tests.conftest import SF_CORRECTNESS

    load_table(spark, SF_CORRECTNESS, "events").createOrReplaceTempView(
        "ev_sketch"
    )
    out = druid_sql(
        spark,
        """
        SELECT event_type,
               APPROX_COUNT_DISTINCT_DS_HLL(user_id) AS hll_users,
               APPROX_COUNT_DISTINCT_DS_THETA(user_id) AS theta_users,
               APPROX_COUNT_DISTINCT(user_id) AS builtin_users,
               APPROX_QUANTILE_DS(value, 0.5) AS p50_ds,
               APPROX_QUANTILE(value, 0.5) AS p50_gk,
               COUNT(DISTINCT user_id) AS exact_users,
               MIN(value) AS lo, MAX(value) AS hi
        FROM ev_sketch GROUP BY event_type
        """,
    ).collect()
    assert len(out) == 5
    for r in out:
        assert r.theta_users == r.exact_users  # exact below nominal entries
        assert abs(r.hll_users - r.exact_users) <= max(3, 0.05 * r.exact_users)
        assert abs(r.builtin_users - r.exact_users) <= max(3, 0.05 * r.exact_users)
        assert r.lo <= r.p50_ds <= r.hi and r.lo <= r.p50_gk <= r.hi


def test_druid_dashboard_sql_served_from_rollup(spark):
    """The reference's documented dashboard shapes (hourly avg, daily
    max — README.md:173-182) run through the dialect shim VERBATIM
    against a view of the materialized rollup serving `__time`, and
    return exactly what the same SQL computes over raw events — the
    full Druid experience: dashboard SQL in, pre-aggregated segments
    underneath."""
    import tempfile

    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM
    from data_pipeline_with_big_data_stack_spark.tables import load_table
    from tests.conftest import SF_CORRECTNESS

    e = load_table(spark, SF_CORRECTNESS, "events")
    path = tempfile.mkdtemp(prefix="rollup_dash_")
    RM.build_rollup(e, path)
    # the serving view exposes Druid's column contract: __time + metrics
    RM.serve_rollup(spark, path, grain="hour", dims=("event_type",)).select(
        F.col("bucket").alias("__time"),
        "event_type",
        "n_events",
        "sum_value",
        "avg_value",
        "min_value",
        "max_value",
    ).createOrReplaceTempView("events_datasource")
    daily_max = druid_sql(
        spark,
        """
        SELECT TIME_FLOOR(__time, 'P1D') AS day,
               event_type,
               MAX(max_value) AS daily_max
        FROM events_datasource
        GROUP BY 1, 2
        """,
    ).collect()
    expected = {
        (r.day, r.event_type): r.m
        for r in e.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.round(
                F.max(F.round(F.col("value") * 1_000_000).cast("long"))
                / 1_000_000,
                4,
            ).alias("m")
        )
        .collect()
    }
    assert len(daily_max) == len(expected)
    for r in daily_max:
        assert r.daily_max == expected[(r.day, r.event_type)], r
