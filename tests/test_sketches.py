"""Accuracy contracts for the approximate aggregations (rows-only in the
oracle gate — error bounds are pinned here instead)."""

from __future__ import annotations

from data_pipeline_with_big_data_stack_spark.queries.sketches import (
    q_approx_distinct_users,
    q_approx_percentiles_value,
    q_hll_sketch_mergeable,
)
from tests.conftest import SF_CORRECTNESS


def test_hllpp_distinct_within_rsd(spark):
    rows = q_approx_distinct_users(spark, SF_CORRECTNESS).collect()
    assert len(rows) > 0
    for r in rows:
        rel_err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel_err < 0.10, (r["event_type"], rel_err)


def test_hll_sketch_merge_close_to_global_exact(spark):
    from data_pipeline_with_big_data_stack_spark.tables import load_table

    exact = (
        load_table(spark, SF_CORRECTNESS, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    got = q_hll_sketch_mergeable(spark, SF_CORRECTNESS).collect()[0]
    rel_err = abs(got["approx_total_users"] - exact) / max(exact, 1)
    assert rel_err < 0.10, (got["approx_total_users"], exact)


def test_approx_percentile_between_bounds(spark):
    for r in q_approx_percentiles_value(spark, SF_CORRECTNESS).collect():
        p50, p95, p99 = r["approx_p50"], r["approx_p95"], r["approx_p99"]
        assert p50 <= p95 <= p99
        # percentile_approx returns an actual data point near the exact p50
        assert abs(p50 - r["exact_p50"]) / max(abs(r["exact_p50"]), 1e-9) < 0.05
