"""Accuracy contracts for the approximate aggregations (rows-only in the
oracle gate — error bounds are pinned here instead)."""

from __future__ import annotations

import pytest

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


def test_theta_estimate_mode_error_bounds(spark):
    """Above 4096 nominal entries theta leaves exact mode — this is the
    path that runs at production cardinality, so pin its statistical
    contract at 180 K distinct keys: ±5% (≈3.2σ of the k=4096 RSE
    ≈1.56%) on direct sketches and unions; intersections/differences
    error scales with the UNION cardinality (DataSketches bound), so
    they get a proportionally wider ±15% window. Theta hashing is
    seeded deterministically (library seed 9001), so the estimates —
    and this test — are stable run to run."""
    from pyspark.sql import functions as F

    a = spark.range(0, 120_000).select(F.lit("view").alias("t"), F.col("id"))
    b = spark.range(60_000, 180_000).select(F.lit("purchase").alias("t"), F.col("id"))
    per = a.unionByName(b).groupBy("t").agg(F.theta_sketch_agg("id").alias("sk"))
    row = per.groupBy().pivot("t", ["view", "purchase"]).agg(F.first("sk"))
    est = F.theta_sketch_estimate
    r = row.select(
        est("view").alias("n_view"),
        est("purchase").alias("n_purchase"),
        est(F.theta_intersection("view", "purchase")).alias("n_both"),
        est(F.theta_difference("view", "purchase")).alias("n_view_only"),
        est(F.theta_union("view", "purchase")).alias("n_either"),
    ).collect()[0]

    def rel(got, true):
        return abs(got - true) / true

    assert rel(r.n_view, 120_000) < 0.05, r.n_view
    assert rel(r.n_purchase, 120_000) < 0.05, r.n_purchase
    assert rel(r.n_either, 180_000) < 0.05, r.n_either
    assert rel(r.n_both, 60_000) < 0.15, r.n_both
    assert rel(r.n_view_only, 60_000) < 0.15, r.n_view_only
    # set-algebra consistency holds approximately in estimate mode
    assert rel(r.n_both + r.n_view_only, r.n_view) < 0.10
    # and we really are in estimate mode, not exact (exact would be int)
    assert r.n_either > 4096


def test_kll_estimate_mode_rank_error_at_scale(spark):
    """Merged-KLL contract at 200 K values (far beyond the k=200
    sketch's exact capacity): the estimated quantile's TRUE RANK must
    lie within ±6% (~3.6σ of the ~1.65% normalized rank error) of the
    target rank, for the per-type sketches AND the merge fold — the
    exact shape q_kll_quantile_sketch runs, on uniform data where rank
    is computable in closed form (rank(v) = v / n)."""
    from pyspark.sql import functions as F

    n = 200_000
    vals = spark.range(n).select(
        F.col("id").cast("double").alias("v"),
        (F.col("id") % 4).cast("string").alias("t"),
    )
    per = vals.groupBy("t").agg(F.kll_sketch_agg_double("v").alias("sk"))
    per_type = per.select(
        "t",
        F.kll_sketch_get_n_double("sk").alias("sketch_n"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("p95"),
    )
    merged = (
        per.agg(F.collect_list("sk").alias("arr"))
        .select(
            F.aggregate(
                F.slice("arr", 2, 1_000_000),
                F.element_at("arr", 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("msk")
        )
        .select(
            F.kll_sketch_get_n_double("msk").alias("sketch_n"),
            F.kll_sketch_get_quantile_double("msk", F.lit(0.5)).alias("p50"),
            F.kll_sketch_get_quantile_double("msk", F.lit(0.95)).alias("p95"),
        )
        .collect()[0]
    )
    assert merged.sketch_n == n  # merge loses nothing
    assert abs(merged.p50 / n - 0.5) < 0.06, merged.p50
    assert abs(merged.p95 / n - 0.95) < 0.06, merged.p95
    for r in per_type.collect():
        assert r.sketch_n == n // 4
        # each type stripe is uniform over [0, n): same closed-form rank
        assert abs(r.p50 / n - 0.5) < 0.06, (r.t, r.p50)
        assert abs(r.p95 / n - 0.95) < 0.06, (r.t, r.p95)


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


def test_mg_exact_regime_matches_groupby(spark):
    """Below summary capacity Misra-Gries never reduces: counts equal
    an exact groupBy and the error bracket collapses (the invariant the
    q_frequent_items_users value oracle rides on)."""
    from data_pipeline_with_big_data_stack_spark.operators.freq import mg_frequent_items
    from data_pipeline_with_big_data_stack_spark.tables import load_table

    e = load_table(spark, SF_CORRECTNESS, "events")
    got = mg_frequent_items(e, "user_id", k=4096, top_n=10).collect()
    exact = dict(
        e.groupBy(e.user_id.cast("string").alias("item"))
        .count()
        .collect()
    )
    assert len(got) == 10
    for r in got:
        assert r.est_count == exact[r.item]
        assert r.max_count == r.est_count


def test_mg_estimate_mode_heavy_hitters_at_scale(spark):
    """Estimate mode — what runs at 100 TB: 200 K rows, ~100 K distinct
    tail keys, 10 planted heavy hitters, k=256 (far below the
    cardinality). MG's deterministic guarantee: every reported
    ``est_count`` is an undercount by at most the summed per-partition
    reduction error, so ``est_count <= true <= max_count``; any item
    with true count > n/(k+1) MUST survive, so all 10 planted heavies
    are reported and rank above the tail."""
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators.freq import mg_frequent_items

    n_tail, heavy_freq = 180_000, 2_000
    tail = spark.range(n_tail).select(
        # ~90 K distinct tail keys (two rows each), md5-scattered
        F.md5(F.concat(F.lit("t"), (F.col("id") % 90_000).cast("string"))).alias(
            "item"
        )
    )
    heavies = (
        spark.range(10 * heavy_freq)
        .select((F.col("id") % 10).alias("h"))
        .select(F.concat(F.lit("heavy_"), F.col("h").cast("string")).alias("item"))
    )
    df = tail.unionAll(heavies).repartition(32)
    n_total = n_tail + 10 * heavy_freq
    got = mg_frequent_items(df, "item", k=256, top_n=25).collect()

    reported = {r.item: r for r in got}
    top10 = [r.item for r in got[:10]]
    assert sorted(top10) == [f"heavy_{i}" for i in range(10)], top10
    for i in range(10):
        r = reported[f"heavy_{i}"]
        assert r.est_count <= heavy_freq <= r.max_count, (r, heavy_freq)
        # the bracket is the global MG bound, not vacuously wide
        assert r.max_count - r.est_count <= n_total // (256 + 1) * 32


def test_stream_mg_state_survives_micro_batches(spark, tmp_path):
    """The streaming MG summary must accumulate ACROSS micro-batches
    (state, not per-batch recompute): planted heavies spread over 4
    files processed one per trigger must come back with est ≤ true ≤
    est + err, heavies surviving every reduction, state ≤ k items."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_pipeline_with_big_data_stack_spark import streaming as S

    src = tmp_path / "stream_src"
    src.mkdir()
    n_files, tail_per_file, heavy_per_file = 4, 3000, 200
    for f in range(n_files):
        items = [f"tail_{f}_{i}" for i in range(tail_per_file)] + [
            f"heavy_{h}" for h in range(5) for _ in range(heavy_per_file)
        ]
        pq.write_table(
            pa.table(
                {
                    "key": pa.array(["k"] * len(items)),
                    "item": pa.array(items),
                }
            ),
            str(src / f"part{f}.parquet"),
        )
    st = (
        spark.readStream.schema("key string, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    k = 64
    out = S.run_available_now(
        S.stream_frequent_items(st, "key", "item", k=k),
        checkpoint=str(tmp_path / "ckpt"),
        output_mode="update",
    )
    import pandas as pd

    pdf = out.toPandas()
    final = pdf[pdf.n_seen == pdf.n_seen.max()]
    assert final.n_seen.max() == n_files * (tail_per_file + 5 * heavy_per_file)
    assert len(final) <= k
    true_heavy = n_files * heavy_per_file
    got = {r.item: r for r in final.itertuples()}
    for h in range(5):
        r = got[f"heavy_{h}"]
        assert r.cnt <= true_heavy <= r.cnt + r.err, (r, true_heavy)
    # multiple reductions must actually have happened (tail >> k)
    assert final.err.max() > 0


def test_mg_null_items_excluded(spark):
    """NULL items must not leak into the summary (NULL is the error-row
    sentinel) nor corrupt the error total."""
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators.freq import mg_frequent_items

    df = spark.range(100).select(
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.concat(F.lit("i"), (F.col("id") % 5).cast("string")))
        .alias("item")
    )
    got = mg_frequent_items(df, "item", k=64, top_n=10).collect()
    items = {r.item for r in got}
    assert None not in items and "None" not in items
    assert sum(r.est_count for r in got) == 66  # only the non-null rows
    assert all(r.max_count == r.est_count for r in got)


def test_mg_weighted_estimate_mode_bounds(spark):
    """Weighted MG in estimate mode: 90 K distinct tail keys with small
    weights, 10 planted heavy keys whose total WEIGHT (not row count)
    dominates; with k=256 every heavy must survive, rank above the
    tail, and carry the est ≤ true ≤ max bracket on its weight sum."""
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators.freq import mg_frequent_items

    tail = spark.range(180_000).select(
        F.md5(F.concat(F.lit("t"), (F.col("id") % 90_000).cast("string"))).alias(
            "item"
        ),
        (F.col("id") % 7 + 1).alias("w"),
    )
    # 10 heavies, 100 rows each, weight 500 per row → true weight 50 000
    heavies = spark.range(1_000).select(
        F.concat(F.lit("heavy_"), (F.col("id") % 10).cast("string")).alias("item"),
        F.lit(500).alias("w"),
    )
    df = tail.unionAll(heavies).repartition(32)
    got = mg_frequent_items(df, "item", k=256, top_n=25, weight_col="w").collect()
    top10 = sorted(r.item for r in got[:10])
    assert top10 == [f"heavy_{i}" for i in range(10)], top10
    for r in got[:10]:
        assert r.est_count <= 50_000 <= r.max_count, r


def test_rollup_sketch_estimate_mode_at_scale(spark, tmp_path):
    """The rollup's HLL metric column beyond its exact regime — the
    100 TB path: 200 K distinct users in one served day bucket, built
    across two increments so the estimate rides merged sketches. The
    lgK=14 sketch's relative standard error is ~0.81%; assert ±3%
    (~3.7σ) on the served estimate."""
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators import rollup_maintenance as RM

    n_users = 200_000
    base = spark.range(n_users).select(
        F.lit("2024-03-01 00:00:00").cast("timestamp").alias("ts_base"),
        (F.col("id") % 24).alias("h"),
        F.col("id").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
    ).select(
        (F.col("ts_base") + F.make_interval(hours=F.col("h"))).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    store = str(tmp_path / "rollup")
    RM.build_rollup(base.filter(F.col("user_id") % 2 == 0), store)
    RM.apply_increment(spark, store, base.filter(F.col("user_id") % 2 == 1))
    r = RM.serve_rollup(
        spark, store, grain="day", dims=("event_type",), with_distinct=True
    ).collect()
    assert len(r) == 1
    est = r[0].approx_users
    assert abs(est - n_users) / n_users < 0.03, est
    assert r[0].n_events == n_users


def test_mg_negative_weights_are_excluded(spark):
    """Weighted MG assumes monotone (non-negative) counters: a negative
    weight sum would flip the reduction into INCREASING counters and
    void the est ≤ true ≤ max bracket (ADVICE r4). Negative-weight rows
    are dropped at the source, so the sketch over the remaining rows is
    exact in the below-capacity regime."""
    from pyspark.sql import functions as F

    from data_pipeline_with_big_data_stack_spark.operators.freq import mg_frequent_items

    rows = [("a", 10), ("a", -7), ("b", 5), ("b", -100), ("c", -1)]
    df = spark.createDataFrame(rows, "item string, w long")
    got = {r.item: r.est_count for r in
           mg_frequent_items(df, "item", k=16, top_n=10, weight_col="w").collect()}
    # only the non-negative rows count; c (negative-only) vanishes
    assert got == {"a": 10, "b": 5}


# ---------------------------------------------------------------------------
# Count-Min Sketch (round 7): deterministic md5-hashed counters
# ---------------------------------------------------------------------------


def test_cms_never_underestimates_and_bounds_overcount(spark):
    """The two CMS contracts on data with REAL collisions (width << the
    key space, zipf-ish skew): est >= true for EVERY key (counters only
    add), and the average overcount stays within the classic N/width
    scale (min-over-depth beats the single-row expectation N/w)."""
    import pyspark.sql.functions as F

    from data_pipeline_with_big_data_stack_spark.operators.cms import cms_build, cms_estimate

    depth, width = 4, 256
    n = 200_000
    # skewed keys: id % (id % 997 + 1) concentrates mass on small keys
    df = spark.range(n).select(
        F.concat(
            F.lit("k"), (F.col("id") % (F.col("id") % 997 + 1)).cast("string")
        ).alias("item")
    )
    sk = cms_build(df, "item", depth=depth, width=width)
    truth = df.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("t"))
    est = cms_estimate(sk, truth.select("item"), "item", depth=depth, width=width)
    rows = truth.join(est, "item").collect()
    assert len(rows) > 900  # far more keys than buckets → collisions
    over = [r.est_count - r.t for r in rows]
    assert min(over) >= 0, "CMS underestimated a key"
    assert max(over) > 0, "no collisions — the bound was not exercised"
    assert sum(over) / len(over) <= 2 * n / width, (
        sum(over) / len(over),
        n / width,
    )


def test_cms_merge_equals_global_sketch(spark):
    """Counters are linear: the cell-wise sum of per-partition sketches
    must equal the sketch of the union — the mergeability contract that
    makes CMS a per-source/per-batch aggregator."""
    import pyspark.sql.functions as F

    from data_pipeline_with_big_data_stack_spark.operators.cms import cms_build, cms_merge

    df = spark.range(50_000).select(
        (F.col("id") % 3).alias("part"),
        F.concat(F.lit("u"), (F.col("id") % 1234).cast("string")).alias("item"),
    )
    merged = cms_merge(
        *[
            cms_build(df.filter(F.col("part") == p), "item", depth=3, width=128)
            for p in range(3)
        ]
    )
    whole = cms_build(df, "item", depth=3, width=128)
    a = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    b = {(r.row, r.bucket): r.cnt for r in whole.collect()}
    assert a == b


def test_cms_merge_zero_sketches_raises():
    from data_pipeline_with_big_data_stack_spark.operators.cms import cms_merge

    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_cms_estimate_geometry_mismatch_raises(spark):
    """The sketch carries its build geometry; probing with a different
    depth must raise in-plan (a silent mismatch would return wrong
    estimates — probed rows beyond the built depth simply miss)."""
    import pyspark.sql.functions as F

    from data_pipeline_with_big_data_stack_spark.operators.cms import cms_build, cms_estimate

    df = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("item")
    )
    sk = cms_build(df, "item", depth=4, width=128)
    wrong = cms_estimate(sk, df.select("item").distinct(), "item", depth=8, width=128)
    with pytest.raises(Exception, match="built with d=4"):
        wrong.collect()


def test_sketch_bounds_hold_at_bench_scale(spark):
    """VERDICT r12 #6: the four rows-only sketch queries (no SQL oracle
    is possible for approximate aggregates) get their error bounds
    pinned at BENCH scale (sf0.1), not just the sf0.01 gate scale, so
    driver-gate rotation staleness is covered by the suite itself."""
    import pyspark.sql.functions as F

    from data_pipeline_with_big_data_stack_spark.queries.sketches import (
        q_kll_quantile_sketch,
    )
    from data_pipeline_with_big_data_stack_spark.tables import load_table

    from tests.conftest import SF_BENCH

    sf = SF_BENCH
    # HLL++ grouped distincts within the configured rsd
    for r in q_approx_distinct_users(spark, sf).collect():
        rel = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel < 0.10, (r["event_type"], rel)
    # mergeable HLL union vs global exact
    exact = load_table(spark, sf, "events").select("user_id").distinct().count()
    got = q_hll_sketch_mergeable(spark, sf).collect()[0]
    assert abs(got["approx_total_users"] - exact) / max(exact, 1) < 0.10
    # approx percentiles ordered and near exact p50
    for r in q_approx_percentiles_value(spark, sf).collect():
        assert r["approx_p50"] <= r["approx_p95"] <= r["approx_p99"]
        assert (
            abs(r["approx_p50"] - r["exact_p50"])
            / max(abs(r["exact_p50"]), 1e-9)
            < 0.05
        )
    # KLL quantiles within a ±6% rank window (same contract as the
    # sf0.01 test — randomized compaction, so rank-window not value)
    rows = {r.event_type: r for r in q_kll_quantile_sketch(spark, sf).collect()}
    eps = 0.06
    ex = {
        r.event_type: r
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5 - eps)).alias("p50_lo"),
            F.percentile("value", F.lit(0.5 + eps)).alias("p50_hi"),
            F.percentile("value", F.lit(0.95 - eps)).alias("p95_lo"),
            F.percentile("value", F.lit(min(0.95 + eps, 1.0))).alias("p95_hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert rows["__all__"].sketch_n == sum(x.n for x in ex.values())
    for t, x in ex.items():
        assert rows[t].sketch_n == x.n
        assert x.p50_lo - 1e-9 <= rows[t].kll_p50 <= x.p50_hi + 1e-9, t
        assert x.p95_lo - 1e-9 <= rows[t].kll_p95 <= x.p95_hi + 1e-9, t


def test_in_plan_certification_red_path(spark):
    """Round 15 (VERDICT r14 #3): the four rows-only sketch queries
    self-certify in-plan — the estimate column materializes through a
    guard computing the exact reference in the same query. Red path: a
    broken estimate (outside its bound) must raise DURING execution, so
    a driver rows-green is a semantic assertion, not just a count."""
    import pyspark.sql.functions as F

    from data_pipeline_with_big_data_stack_spark.queries.sketches import _certified

    ok = spark.range(1).select(
        _certified(F.lit(1.5), F.lit(1.0), F.lit(2.0), "t").alias("v")
    )
    assert ok.collect()[0].v == 1.5  # in-bound estimates pass through
    for est in (0.5, 2.5):  # below and above the bound
        bad = spark.range(1).select(
            _certified(F.lit(est), F.lit(1.0), F.lit(2.0), "t").alias("v")
        )
        with pytest.raises(Exception, match="violated its documented bound"):
            bad.collect()
    # integer-typed estimates (the HLL counts / sketch_n lanes) guard too
    with pytest.raises(Exception, match="violated its documented bound"):
        spark.range(1).select(
            _certified(F.lit(7), F.lit(9), F.lit(9), "t", "long").alias("v")
        ).collect()


def test_certification_enforce_gate_passes_small_groups(spark):
    """The value-window certifications are vacuous below _CERT_MIN_N
    rows (the sketch returns a data point, the exact reference
    interpolates — on a tiny group the nearest data point can sit far
    outside any interpolated window while being exactly right), so an
    enforce=False gate must pass the estimate through unguarded."""
    import pyspark.sql.functions as F

    from data_pipeline_with_big_data_stack_spark.queries.sketches import _certified

    out = spark.range(1).select(
        _certified(
            F.lit(10.0), F.lit(4.75), F.lit(5.25), "t", enforce=F.lit(False)
        ).alias("v")
    )
    assert out.collect()[0].v == 10.0
    with pytest.raises(Exception, match="violated its documented bound"):
        spark.range(1).select(
            _certified(
                F.lit(10.0), F.lit(4.75), F.lit(5.25), "t", enforce=F.lit(True)
            ).alias("v")
        ).collect()
