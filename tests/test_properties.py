"""Property-based tests (hypothesis) for the pure rewrite/cleanup layers,
plus batched data-property tests for the cleanup semantics in Spark."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.catalog import filter_topics
from data_pipeline_with_big_data_stack_spark.plans.sql_shim import rewrite_druid_sql

_GRAINS = {
    "PT1S": "second", "PT1M": "minute", "PT1H": "hour", "P1D": "day",
    "P1W": "week", "P1M": "month", "P3M": "quarter", "P1Y": "year",
}

_ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,20}", fullmatch=True)


class TestSqlShimProperties:
    @given(col=_ident, grain=st.sampled_from(sorted(_GRAINS)))
    def test_time_floor_rewrites_to_date_trunc(self, col, grain):
        out = rewrite_druid_sql(f"SELECT TIME_FLOOR({col}, '{grain}') FROM t")
        assert out == f"SELECT date_trunc('{_GRAINS[grain]}', {col}) FROM t"

    @given(col=_ident, grain=st.sampled_from(sorted(_GRAINS)), n=st.integers(1, 4))
    def test_rewrite_is_idempotent_and_total(self, col, grain, n):
        sql = " UNION ALL ".join(
            f"SELECT TIME_FLOOR({col}, '{grain}') FROM t" for _ in range(n)
        )
        once = rewrite_druid_sql(sql)
        assert rewrite_druid_sql(once) == once  # fixpoint
        assert "TIME_FLOOR" not in once

    @given(sql=st.text(alphabet=st.characters(blacklist_characters="'"), max_size=80))
    def test_non_druid_sql_untouched(self, sql):
        if "TIME_FLOOR" in sql.upper() or "TIME_EXTRACT" in sql.upper():
            return
        assert rewrite_druid_sql(sql) == sql


class TestTopicFilterProperties:
    @given(
        topics=st.lists(
            st.from_regex(r"[a-z_]{1,12}", fullmatch=True), max_size=12
        )
    )
    def test_include_all_is_sorted_dedup(self, topics):
        got = filter_topics(topics, ["*"])
        assert got == sorted(set(topics))

    @given(
        topics=st.lists(st.from_regex(r"[a-z_]{1,12}", fullmatch=True), max_size=12),
        patterns=st.lists(st.from_regex(r"[a-z_*]{1,8}", fullmatch=True), max_size=4),
    )
    def test_filter_subset_and_monotone(self, topics, patterns):
        got = filter_topics(topics, patterns)
        assert set(got) <= set(topics)
        wider = filter_topics(topics, patterns + ["*"])
        assert set(got) <= set(wider)


class TestCleanupDataProperties:
    """Batched data-property test: one generated corpus, invariants over
    every row (per-example Spark jobs would be pathologically slow)."""

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(
                st.floats(allow_nan=True, allow_infinity=False),
                st.none(),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_zero_fill_semantics(self, spark_global, vals):
        from data_pipeline_with_big_data_stack_spark.operators.cleanup import zero_fill_nan

        df = spark_global.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "i long, x double"
        )
        out = {r["i"]: r["x"] for r in zero_fill_nan(df, ["x"]).collect()}
        for i, v in enumerate(vals):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                assert out[i] == 0.0
            else:
                assert out[i] == v


# session-scoped spark fixture is function-args-incompatible with @given;
# expose it through a module-level alias fixture
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark
