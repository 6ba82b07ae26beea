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


def test_theta_sketch_exact_at_fixture_cardinality(spark, duck):
    """Below 4096 nominal entries theta runs exact — the driver gate
    value-checks it; this pins the same invariant in CI plus the set
    algebra being internally consistent."""
    from data_pipeline_with_big_data_stack_spark.queries.sketches import q_theta_sketch_user_sets

    r = q_theta_sketch_user_sets(spark, SF_CORRECTNESS).collect()[0]
    assert r.n_both + r.n_view_only == r.n_view
    assert r.n_view + r.n_purchase - r.n_both == r.n_either
    assert 0 < r.n_both <= min(r.n_view, r.n_purchase)


def test_kll_quantiles_within_rank_error(spark):
    """KLL compaction is randomized, so assert the statistically correct
    contract: the estimate's RANK lies within a window around the target
    (default k=200 → normalized rank error ~1.65% at one sigma; ±6% is
    ~3.6 sigma, far enough out that the test is stable)."""
    from data_pipeline_with_big_data_stack_spark.queries.sketches import q_kll_quantile_sketch
    from data_pipeline_with_big_data_stack_spark.tables import load_table

    rows = {r.event_type: r for r in q_kll_quantile_sketch(spark, SF_CORRECTNESS).collect()}
    e = load_table(spark, SF_CORRECTNESS, "events")
    import pyspark.sql.functions as F

    eps = 0.06
    exact = {
        r.event_type: r
        for r in e.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5 - eps)).alias("p50_lo"),
            F.percentile("value", F.lit(0.5 + eps)).alias("p50_hi"),
            F.percentile("value", F.lit(0.95 - eps)).alias("p95_lo"),
            F.percentile("value", F.lit(min(0.95 + eps, 1.0))).alias("p95_hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    total = sum(x.n for x in exact.values())
    assert rows["__all__"].sketch_n == total  # merge loses nothing
    for t, x in exact.items():
        assert rows[t].sketch_n == x.n
        assert x.p50_lo - 1e-9 <= rows[t].kll_p50 <= x.p50_hi + 1e-9, t
        assert x.p95_lo - 1e-9 <= rows[t].kll_p95 <= x.p95_hi + 1e-9, t
