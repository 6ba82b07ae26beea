"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (hourly dashboard rollup — the
reference's headline Druid dashboard query, SURVEY §3.3) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the engine's full query surface
from ``data_pipeline_with_big_data_stack_spark.queries`` for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_with_big_data_stack_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from data_pipeline_with_big_data_stack_spark.queries.reference_shapes import q_druid_hourly_dashboard

    return q_druid_hourly_dashboard(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(ORACLES)
