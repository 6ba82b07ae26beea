"""Incremental rollup maintenance: merge-equivalence for any arrival
order/split, and the only-touched-partitions I/O contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM
from data_pipeline_with_big_data_stack_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _final(spark, path):
    return {
        (r.bucket, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in RM.read_rollup(spark, path).collect()
    }


def test_any_split_equals_full_recompute(spark, tmp_path):
    e = load_table(spark, SF_SMOKE, "events")
    full = str(tmp_path / "full")
    RM.build_rollup(e, full)
    expected = _final(spark, full)

    for salt in (3, 5):
        inc = str(tmp_path / f"inc{salt}")
        RM.build_rollup(e.filter(F.col("event_id") % salt == 0), inc)
        RM.apply_increment(spark, inc, e.filter(F.col("event_id") % salt == 1))
        RM.apply_increment(spark, inc, e.filter(F.col("event_id") % salt > 1))
        assert _final(spark, inc) == expected, salt


def test_increment_touches_only_affected_partitions(spark, tmp_path):
    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "roll")
    RM.build_rollup(e, path)
    days = sorted(
        d for d in os.listdir(path) if d.startswith("__date=")
    )
    assert len(days) > 2
    touched_day = days[0].split("=")[1]
    untouched = days[-1]

    def snapshot(part):
        pdir = os.path.join(path, part)
        return {
            f: os.path.getmtime(os.path.join(pdir, f))
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        }

    before = snapshot(untouched)
    late = e.filter(F.to_date("ts") == F.lit(touched_day).cast("date")).limit(50)
    assert late.count() > 0
    RM.apply_increment(spark, path, late)
    assert snapshot(untouched) == before, "untouched partition was rewritten"


def test_serve_time_range_prunes_partitions(spark, tmp_path):
    """A "last N days" dashboard opens only the N day directories: the
    since/until bounds land in the scan's PartitionFilters, and values
    equal the unbounded serve filtered after the fact."""
    from pyspark.sql import functions as F  # noqa: F811

    e = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "roll")
    RM.build_rollup(e, path)
    days = sorted(
        d.split("=")[1] for d in os.listdir(path) if d.startswith("__date=")
    )
    since, until = days[1], days[-1]
    bounded = RM.serve_rollup(spark, path, grain="day", since=since, until=until)
    got = {
        (r.bucket, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in bounded.collect()
    }
    full = RM.serve_rollup(spark, path, grain="day")
    want = {
        (r.bucket, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in full.collect()
        if since <= r.bucket.strftime("%Y-%m-%d") < until
    }
    assert got == want and got
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__date" in plan
