"""Druid SQL dialect shim.

The reference's documented dashboard queries (``README.md:170-193``,
``M/GOES_PIPELINE_REPORT.md:273-314``) use exactly two Druid-isms on top of
ANSI SQL:

1. ``TIME_FLOOR(col, 'PT1H' | 'PT1M' | 'P1D' | ...)`` — ISO-8601-period
   time bucketing → Spark ``date_trunc(unit, col)``.
2. the ``__time`` column name — kept as a physical column by the ingest
   layer, so no rewrite is needed.

Beyond the documented queries, Druid's SQL layer exposes the
druid-datasketches aggregators it loads (``M/app_druid/environment.env:5``)
— a user switching dashboards over would reach for them next, and every
target sketch exists in Spark, so the shim maps them too:

- ``APPROX_COUNT_DISTINCT_DS_HLL(col[, lgK])`` →
  ``hll_sketch_estimate(hll_sketch_agg(...))``
- ``APPROX_COUNT_DISTINCT_DS_THETA(col)`` →
  ``theta_sketch_estimate(theta_sketch_agg(col))``
- ``APPROX_QUANTILE_DS(col, prob[, k])`` →
  ``kll_sketch_get_quantile_double(kll_sketch_agg_double(...), prob)``
- ``APPROX_QUANTILE(col, prob)`` → ``percentile_approx(col, prob)``
  (Druid's plain ``APPROX_COUNT_DISTINCT`` needs no rewrite — Spark has
  the same name.)

Druid's remaining common time functions map too (round 5):
``TIME_SHIFT(col, 'PT1H', k)`` → ``timestampadd(hour, k, col)``;
``TIME_PARSE(s)`` → ``to_timestamp(s)`` (ISO default);
``MILLIS_TO_TIMESTAMP`` / ``TIMESTAMP_TO_MILLIS`` →
``timestamp_millis`` / ``unix_millis``.

Per SURVEY §3.3 the shim is deliberately tiny (regex rewrite, no parser;
arguments are simple column refs/literals, like the dashboard queries):
resist building a Calcite-compatible frontend for a handful of constructs.
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

# every function-name regex carries the identifier-boundary guard so a
# user-defined MY_TIME_PARSE(x) / X_TIME_FLOOR(y) passes through
# untouched instead of being corrupted mid-identifier (ADVICE r5)
_ID_BOUNDARY_EARLY = r"(?<![A-Za-z0-9_])"

_TIME_FLOOR_RE = re.compile(
    _ID_BOUNDARY_EARLY
    + r"TIME_FLOOR\s*\(\s*([^,()]+?)\s*,\s*'(P[T0-9A-Z]+)'\s*\)",
    re.IGNORECASE,
)

# TIME_EXTRACT(col, 'HOUR') → extract(HOUR FROM col)
_TIME_EXTRACT_RE = re.compile(
    _ID_BOUNDARY_EARLY
    + r"TIME_EXTRACT\s*\(\s*([^,()]+?)\s*,\s*'([A-Za-z]+)'\s*\)",
    re.IGNORECASE,
)

# TIME_SHIFT(col, 'PT1H', k) → timestampadd(hour, k, col)
_TIME_SHIFT_RE = re.compile(
    _ID_BOUNDARY_EARLY
    + r"TIME_SHIFT\s*\(\s*([^,()]+?)\s*,\s*'(P[T0-9A-Z]+)'\s*,\s*(-?\d+)\s*\)",
    re.IGNORECASE,
)

# TIME_PARSE('2024-01-01T00:00:00') → to_timestamp(...) (ISO default)
_TIME_PARSE_RE = re.compile(
    _ID_BOUNDARY_EARLY + r"TIME_PARSE\s*\(\s*([^,()]+?)\s*\)", re.IGNORECASE
)
_MILLIS_TO_TS_RE = re.compile(
    _ID_BOUNDARY_EARLY + r"MILLIS_TO_TIMESTAMP\s*\(\s*([^,()]+?)\s*\)",
    re.IGNORECASE,
)
_TS_TO_MILLIS_RE = re.compile(
    _ID_BOUNDARY_EARLY + r"TIMESTAMP_TO_MILLIS\s*\(\s*([^,()]+?)\s*\)",
    re.IGNORECASE,
)

# druid-datasketches SQL aggregators (simple-argument forms)
_ID_BOUNDARY = r"(?<![A-Za-z0-9_])"  # not a suffix of a longer identifier
_DS_HLL_RE = re.compile(
    _ID_BOUNDARY
    + r"APPROX_COUNT_DISTINCT_DS_HLL\s*\(\s*([^,()]+?)\s*(?:,\s*(\d+)\s*)?\)",
    re.IGNORECASE,
)
_DS_THETA_RE = re.compile(
    _ID_BOUNDARY + r"APPROX_COUNT_DISTINCT_DS_THETA\s*\(\s*([^,()]+?)\s*\)",
    re.IGNORECASE,
)
_DS_QUANTILE_RE = re.compile(
    _ID_BOUNDARY
    + r"APPROX_QUANTILE_DS\s*\(\s*([^,()]+?)\s*,\s*([0-9.]+)\s*(?:,\s*(\d+)\s*)?\)",
    re.IGNORECASE,
)
_APPROX_QUANTILE_RE = re.compile(
    _ID_BOUNDARY + r"APPROX_QUANTILE\s*\(\s*([^,()]+?)\s*,\s*([0-9.]+)\s*\)",
    re.IGNORECASE,
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

    def _ds_hll(m: re.Match) -> str:
        col, lgk = m.group(1), m.group(2)
        agg = f"hll_sketch_agg({col}, {lgk})" if lgk else f"hll_sketch_agg({col})"
        return f"cast(hll_sketch_estimate({agg}) as bigint)"

    def _ds_theta(m: re.Match) -> str:
        return (
            f"cast(theta_sketch_estimate(theta_sketch_agg({m.group(1)})) as bigint)"
        )

    def _ds_quantile(m: re.Match) -> str:
        col, prob, k = m.group(1), m.group(2), m.group(3)
        agg = (
            f"kll_sketch_agg_double(cast({col} as double), {k})"
            if k
            else f"kll_sketch_agg_double(cast({col} as double))"
        )
        return f"kll_sketch_get_quantile_double({agg}, cast({prob} as double))"

    def _shift(m: re.Match) -> str:
        col, period, k = m.group(1), m.group(2).upper(), m.group(3)
        unit = _PERIOD_TO_UNIT.get(period)
        if unit is None:
            raise ValueError(f"unsupported TIME_SHIFT period {period!r}")
        return f"timestampadd({unit}, {k}, {col})"

    out = _TIME_FLOOR_RE.sub(_floor, sql)
    out = _TIME_SHIFT_RE.sub(_shift, out)
    out = _TIME_PARSE_RE.sub(lambda m: f"to_timestamp({m.group(1)})", out)
    out = _MILLIS_TO_TS_RE.sub(lambda m: f"timestamp_millis({m.group(1)})", out)
    out = _TS_TO_MILLIS_RE.sub(lambda m: f"unix_millis({m.group(1)})", out)
    out = _TIME_EXTRACT_RE.sub(_extract, out)
    out = _DS_HLL_RE.sub(_ds_hll, out)
    out = _DS_THETA_RE.sub(_ds_theta, out)
    out = _DS_QUANTILE_RE.sub(_ds_quantile, out)
    # plain APPROX_QUANTILE last: the _DS variant was already rewritten,
    # so this can't touch it
    out = _APPROX_QUANTILE_RE.sub(
        lambda m: f"percentile_approx({m.group(1)}, {m.group(2)})", out
    )
    # the rewrites above only match the simple column/literal argument
    # forms the dashboard queries use; a nested-expression argument
    # (e.g. APPROX_COUNT_DISTINCT_DS_HLL(coalesce(a, b))) slips past the
    # regexes and would later die in Spark with an opaque
    # unknown-function error — fail at the shim with a diagnostic instead
    leftover = re.search(
        _ID_BOUNDARY
        + r"(APPROX_COUNT_DISTINCT_DS_(?:HLL|THETA)|APPROX_QUANTILE_DS"
        + r"|TIME_FLOOR|TIME_EXTRACT|TIME_SHIFT|TIME_PARSE"
        + r"|MILLIS_TO_TIMESTAMP|TIMESTAMP_TO_MILLIS)\s*\(",
        out,
        re.IGNORECASE,
    )
    if leftover:
        raise ValueError(
            f"unsupported argument form for {leftover.group(1)}: the shim "
            "rewrites simple column/literal arguments only — alias the "
            "expression in a subquery first"
        )
    return out


def druid_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run a Druid-dialect query through the shim against the session
    catalog (tables registered by the ingest layer, with ``__time`` kept
    as a physical column for dialect compatibility)."""
    return spark.sql(rewrite_druid_sql(sql))
