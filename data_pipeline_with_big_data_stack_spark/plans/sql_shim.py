"""Druid SQL dialect shim.

The reference's documented dashboard queries (``README.md:170-193``,
``M/GOES_PIPELINE_REPORT.md:273-314``) use exactly two Druid-isms on top of
ANSI SQL:

1. ``TIME_FLOOR(col, 'PT1H' | 'PT1M' | 'P1D' | ...)`` — ISO-8601-period
   time bucketing → Spark ``date_trunc(unit, col)``.
2. the ``__time`` column name — kept as a physical column by the ingest
   layer, so no rewrite is needed.

Per SURVEY §3.3 the shim is deliberately tiny (regex rewrite, no parser):
resist building a Calcite-compatible frontend for two constructs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# ISO-8601 period → date_trunc unit (the grains Druid queries actually use,
# plus the rest of Druid's standard granularity ladder for completeness).
_PERIOD_TO_UNIT = {
    "PT1S": "second",
    "PT1M": "minute",
    "PT1H": "hour",
    "P1D": "day",
    "P1W": "week",
    "P1M": "month",
    "P3M": "quarter",
    "P1Y": "year",
}

_TIME_FLOOR_RE = re.compile(
    r"TIME_FLOOR\s*\(\s*([^,()]+?)\s*,\s*'(P[T0-9A-Z]+)'\s*\)", re.IGNORECASE
)

# TIME_EXTRACT(col, 'HOUR') → extract(HOUR FROM col)
_TIME_EXTRACT_RE = re.compile(
    r"TIME_EXTRACT\s*\(\s*([^,()]+?)\s*,\s*'([A-Za-z]+)'\s*\)", re.IGNORECASE
)


def rewrite_druid_sql(sql: str) -> str:
    """Rewrite the Druid-dialect constructs in ``sql`` to Spark SQL."""

    def _floor(m: re.Match) -> str:
        col, period = m.group(1), m.group(2).upper()
        unit = _PERIOD_TO_UNIT.get(period)
        if unit is None:
            raise ValueError(f"unsupported TIME_FLOOR period {period!r}")
        return f"date_trunc('{unit}', {col})"

    def _extract(m: re.Match) -> str:
        col, unit = m.group(1), m.group(2).upper()
        return f"extract({unit} FROM {col})"

    out = _TIME_FLOOR_RE.sub(_floor, sql)
    out = _TIME_EXTRACT_RE.sub(_extract, out)
    return out


def druid_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run a Druid-dialect query through the shim against the session
    catalog (tables registered by the ingest layer, with ``__time`` kept
    as a physical column for dialect compatibility)."""
    return spark.sql(rewrite_druid_sql(sql))
