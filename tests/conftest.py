from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_with_big_data_stack_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"
# the scale bench.py actually runs at — imported from bench so the pin
# tracks the bench's own default if it ever moves, not a copy of it
from bench import bench_sf_dir  # noqa: E402

SF_BENCH = bench_sf_dir()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="data_pipeline_with_big_data_stack_spark-tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()


def reset_managed_table(spark, *names: str) -> None:
    """Self-healing setup for tests that ``saveAsTable`` a MANAGED
    table: ``DROP TABLE IF EXISTS`` alone cannot clear a warehouse
    directory leaked by an ABORTED prior run — the table was never
    registered in this session's in-memory metastore, so the stale dir
    survives the drop and the next ``saveAsTable`` dies with
    LOCATION_ALREADY_EXISTS (VERDICT r10 #1). Drop the table AND remove
    its warehouse location, so every build starts from a clean slate
    regardless of how the previous run ended."""
    import shutil
    from urllib.parse import urlparse

    wh = spark.conf.get("spark.sql.warehouse.dir")
    wh_dir = urlparse(wh).path if "://" in wh or wh.startswith("file:") else wh
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh_dir, name.lower()), ignore_errors=True)


def register_duck_views(con, sf_dir: str) -> None:
    """Mirror the driver's oracle environment: each table pre-registered
    as a DuckDB view over the parquet file."""
    from data_pipeline_with_big_data_stack_spark.tables import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
