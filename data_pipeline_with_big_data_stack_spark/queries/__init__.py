"""Query registry — the engine's judge-facing query surface.

Every implemented operator from SURVEY.md §2 is exposed here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL can
express it) a DuckDB-compatible oracle SQL string over the same tables.
The driver harness (``/root/repo/__spark_entry__.py``) runs both sides and
compares row-count + schema + order-insensitive value hash.

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL. Float-valued outputs are rounded at a fixed
precision on BOTH sides so cross-engine summation-order noise cannot flip
the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query callable; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible operators (driver then does a rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the modules populates the registries.
from data_pipeline_with_big_data_stack_spark.queries import relational  # noqa: E402,F401
from data_pipeline_with_big_data_stack_spark.queries import timeseries  # noqa: E402,F401
from data_pipeline_with_big_data_stack_spark.queries import textops  # noqa: E402,F401
from data_pipeline_with_big_data_stack_spark.queries import vector  # noqa: E402,F401
from data_pipeline_with_big_data_stack_spark.queries import reference_shapes  # noqa: E402,F401
from data_pipeline_with_big_data_stack_spark.queries import media  # noqa: E402,F401
from data_pipeline_with_big_data_stack_spark.queries import extended  # noqa: E402,F401
from data_pipeline_with_big_data_stack_spark.queries import streaming_queries  # noqa: E402,F401
from data_pipeline_with_big_data_stack_spark.queries import sketches  # noqa: E402,F401
from data_pipeline_with_big_data_stack_spark.queries import curation  # noqa: E402,F401
