"""Bounded-bucket contract for the fuzzy-dedup pipelines.

Real corpora contain degenerate LSH mega-buckets (empty/boilerplate docs
hash identically). These tests prove the shared ``capped_buckets``
operator bounds per-task state for such buckets and costs no extra
shuffle over the uncapped shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators.bucketing import capped_buckets

CAP = 64


N_MEGA = 2  # mega-buckets in the degenerate corpus


def _mega_bucket_df(spark, n=10_000):
    """n rows split across N_MEGA mega-buckets. Keys must be genuinely
    data-dependent — literal or `id*0` keys get constant-folded, which
    empties the window partitioning and turns the plan into a global
    TakeOrderedAndProject (a different, single-bucket-only shape)."""
    return spark.range(n).select(
        (F.col("id") % N_MEGA).cast("int").alias("band"),
        F.md5((F.col("id") % N_MEGA).cast("string")).alias("band_key"),
        F.col("id").alias("doc_id"),
    )


class TestCappedBuckets:
    def test_mega_bucket_is_capped(self, spark):
        out = capped_buckets(
            _mega_bucket_df(spark), ["band", "band_key"], "doc_id",
            F.col("doc_id"), CAP,
        ).collect()
        assert len(out) == N_MEGA
        for row in out:
            # deterministic: the first CAP members of the bucket in
            # doc_id order (bucket b holds ids ≡ b mod N_MEGA)
            b = row["band"]
            assert row["ids"] == [b + N_MEGA * i for i in range(CAP)]

    def test_pair_explosion_is_bounded(self, spark):
        """10K identical docs → pairs are CAP·(CAP-1)/2, not ~50M."""
        buckets = capped_buckets(
            _mega_bucket_df(spark), ["band", "band_key"], "doc_id",
            F.col("doc_id"), CAP,
        )
        pairs = buckets.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(ids, (x, i) ->
                        transform(slice(ids, i + 2, size(ids)), y ->
                            struct(x AS a, y AS b))))
                    """
                )
            ).alias("p")
        )
        assert pairs.count() == N_MEGA * CAP * (CAP - 1) // 2

    def test_cap_happens_before_collect(self, spark):
        """The memory bound must hold INSIDE the aggregation: the
        row_number filter has to run before collect_list, so the agg
        buffer never holds more than cap entries. Pin the plan order:
        Window → Filter → ObjectHashAggregate, with exactly one
        hash-partitioning exchange on the bucket key (window and groupBy
        share it)."""
        df = capped_buckets(
            _mega_bucket_df(spark), ["band", "band_key"], "doc_id",
            F.col("doc_id"), CAP,
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # AQE prints Final + Initial sections; assert on the final only
        plan = plan.split("== Initial Plan ==")[0]
        i_window = plan.index("Window")
        i_agg = plan.index("Aggregate")
        # executedPlan prints top-down: the aggregate consumes the window
        assert i_agg < i_window
        assert "collect_list" in plan
        # bonus from the rank-then-collect shape: Spark plants a partial
        # WindowGroupLimit BEFORE the exchange, so even the shuffle is
        # bounded at cap rows per bucket per map partition
        assert "WindowGroupLimit" in plan
        n_hash_exchanges = sum(
            1
            for line in plan.splitlines()
            if "Exchange hashpartitioning" in line
        )
        assert n_hash_exchanges == 1

    def test_small_buckets_pass_through(self, spark):
        bands = spark.createDataFrame(
            [(0, "k1", 1), (0, "k1", 2), (0, "k2", 3), (1, "k1", 4), (1, "k1", 5)],
            "band int, band_key string, doc_id int",
        )
        rows = {
            (r["band"], r["band_key"]): r["ids"]
            for r in capped_buckets(
                bands, ["band", "band_key"], "doc_id", F.col("doc_id"), CAP
            ).collect()
        }
        # singleton bucket (0,'k2') dropped; others intact and sorted
        assert rows == {(0, "k1"): [1, 2], (1, "k1"): [4, 5]}


# ---------------------------------------------------------------------
# scan-rebalance guards (tables._scan_rebalance)
# ---------------------------------------------------------------------


def test_scan_rebalance_guards(spark, tmp_path):
    import pyspark.sql.functions as F

    from data_pipeline_with_big_data_stack_spark import tables as T

    # small file: guard off — plan unchanged (no extra exchange)
    small = str(tmp_path / "small.parquet")
    spark.range(100).withColumn("x", F.rand(1)).coalesce(1).write.parquet(small)
    import glob as g

    part = g.glob(small + "/part-*.parquet")[0]
    df = spark.read.parquet(small)
    assert T._scan_rebalance(df, part) is df

    # multi-file dataset path (directory): guard off
    assert T._scan_rebalance(df, small) is df

    # big single-row-group single file: rebalanced to default parallelism
    big = str(tmp_path / "big")
    spark.range(300_000).withColumn("s", F.repeat(F.lit("x"), 10)).coalesce(
        1
    ).write.parquet(big)
    bigfile = g.glob(big + "/part-*.parquet")[0]
    import os

    if os.path.getsize(bigfile) >= T._REBALANCE_MIN_BYTES:
        out = T._scan_rebalance(spark.read.parquet(bigfile), bigfile)
        assert "Repartition" in out._jdf.queryExecution().logical().toString()
