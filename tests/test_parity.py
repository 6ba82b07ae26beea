"""Local replica of the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle at sf0.01, compare row count, column
names, and order-insensitive canonical values exactly.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

# SLOW TIER (r16, VERDICT r15 #7): this file replays the ENTIRE query
# registry against DuckDB — the single biggest chunk of the ~50-minute
# full suite, and a duplicate of the check the round driver itself runs
# (its own oracle gate) and of tools/driver_sim_sweep.py. The driver's
# verify window truncated the full suite (tests_ok lost to an all-dots
# timeout), so the default run excludes it; run with `-m slow`.
pytestmark = pytest.mark.slow

from data_pipeline_with_big_data_stack_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_CORRECTNESS, register_duck_views


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, rows sorted, values canonicalized."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("<null>")
            elif isinstance(v, float):
                row.append(f"{v:.10g}")
            elif isinstance(v, pd.Timestamp):
                row.append(v.isoformat())
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    register_duck_views(duck, SF_CORRECTNESS)
    spark_df = QUERIES[name](spark, SF_CORRECTNESS).toPandas()
    duck_df = duck.sql(ORACLES[name]).df()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"duck={sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count spark={len(spark_df)} duck={len(duck_df)}"
    )
    # Driver-replica dtype-kind check: the driver's value hasher renders
    # int64 `123` and float64 `123.0` differently, so an int column on one
    # side that comes back float on the other (e.g. DuckDB HUGEINT→float64)
    # is a hash-fail even with identical values. Exempt columns containing
    # nulls (pandas widens nullable ints to float64 on either side).
    for col in spark_df.columns:
        sk, dk = spark_df[col].dtype.kind, duck_df[col].dtype.kind
        if {sk, dk} == {"i", "f"} or {sk, dk} == {"u", "f"}:
            has_null = spark_df[col].isna().any() or duck_df[col].isna().any()
            assert has_null, (
                f"{name}.{col}: int-vs-float dtype drift (spark={sk} duck={dk}) "
                "with no nulls — the driver hasher will fail this"
            )
    s_rows = canonicalize(spark_df)
    d_rows = canonicalize(duck_df)
    if s_rows != d_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_all_queries_have_entries():
    assert len(QUERIES) >= 25
    # every oracle key corresponds to a query
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
