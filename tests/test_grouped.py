"""Grouped-map operator contracts (applyInPandas batch ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators import grouped
from data_pipeline_with_big_data_stack_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_normalize_per_group_stats(spark):
    e = load_table(spark, SF_SMOKE, "events").select("event_id", "event_type", "value")
    z = grouped.normalize_per_group(e, "event_type", "value")
    assert z.count() == e.count()
    stats = z.groupBy("event_type").agg(
        F.avg("z").alias("m"), F.stddev_samp("z").alias("s")
    ).collect()
    for r in stats:
        assert abs(r["m"]) < 1e-9
        assert abs(r["s"] - 1.0) < 1e-9


def test_winsorize_clamps_to_group_quantiles(spark):
    e = load_table(spark, SF_SMOKE, "events").select("event_id", "event_type", "value")
    w = grouped.winsorize_per_group(e, "event_type", "value", 0.1, 0.9)
    assert w.count() == e.count()
    # clamped range must be inside the original range, strictly when
    # the group has outliers
    orig = {r["event_type"]: (r["lo"], r["hi"]) for r in
            e.groupBy("event_type").agg(F.min("value").alias("lo"),
                                        F.max("value").alias("hi")).collect()}
    clamped = {r["event_type"]: (r["lo"], r["hi"]) for r in
               w.groupBy("event_type").agg(F.min("value").alias("lo"),
                                           F.max("value").alias("hi")).collect()}
    for k in orig:
        assert clamped[k][0] >= orig[k][0]
        assert clamped[k][1] <= orig[k][1]
        assert clamped[k][1] < orig[k][1]  # 90th pct < max with real data


def test_quantize_micros_matches_decimal_reference():
    """The vectorized float128 quantization must agree with pure
    Decimal quantize-half-even on every element — including crafted
    near-.5-boundary values, large magnitudes, negatives, and
    denormal-scale inputs."""
    from decimal import Decimal

    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.grouped import quantize_micros

    rng = np.random.RandomState(123)
    crafted = np.array(
        [
            0.0,
            -0.0,
            1.0,
            -1.0,
            0.0000005,      # nominal .5 boundary (not exactly representable)
            -0.0000005,
            0.0000015,
            123.4567895,
            -123.4567885,
            1e-9,
            -1e-9,
            3.0000004999999,
            2.9999995000001,
            987654321.123456789,
            -987654321.987654321,
            1e11 + 0.4999995,
            1e12,           # slow-path magnitude gate
            -5e12,
        ]
    )
    randoms = np.concatenate(
        [
            rng.randn(20000) * 10.0 ** rng.uniform(-6, 10, 20000),
            rng.randint(-10**6, 10**6, 5000).astype(float),
            np.round(rng.randn(5000) * 1000, 6),
        ]
    )
    for arr in (crafted, randoms):
        fast = quantize_micros(arr)
        for x, got in zip(arr, fast):
            exp = int(Decimal(float(x)).quantize(Decimal("0.000001")).scaleb(6))
            assert int(got) == exp, (x, int(got), exp)


def test_exact_decimal_moments_matches_decimal_reference():
    from decimal import Decimal

    import numpy as np

    from data_pipeline_with_big_data_stack_spark.operators.grouped import (
        exact_decimal_moments,
    )

    rng = np.random.RandomState(5)
    v = rng.randn(30000) * 10.0 ** rng.uniform(-4, 8, 30000)
    n, s1, s2 = exact_decimal_moments(v)
    q = Decimal("0.000001")
    dv = [Decimal(float(x)).quantize(q) for x in v]
    assert n == len(v)
    assert s1 == float(sum(dv))
    assert s2 == float(sum(d * d for d in dv))


# ---------------------------------------------------------------------
# distributed Lloyd's k-means (operators/kmeans.py)
# ---------------------------------------------------------------------


def test_lloyd_kmeans_separates_obvious_clusters(spark):
    import pytest
    import pyspark.sql.functions as F

    from data_pipeline_with_big_data_stack_spark.operators.kmeans import lloyd_kmeans

    pts = [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)] + [
        (10 + i, [10.0 + i * 0.01, 10.0]) for i in range(5)
    ]
    vecs = spark.createDataFrame(pts, ["vec_id", "emb"])
    init = (
        vecs.filter(F.col("vec_id").isin([0, 10]))
        .select(
            (F.col("vec_id") / 10).cast("long").alias("cell_id"),
            F.col("emb").alias("c_emb"),
        )
        .agg(F.collect_list(F.struct("cell_id", "c_emb")).alias("cb"))
    )
    assigned, cb = lloyd_kmeans(vecs, init, iters=2)
    got = {r.vec_id: r.cluster_id for r in assigned.collect()}
    assert all(got[i] == 0 for i in range(5))
    assert all(got[10 + i] == 1 for i in range(5))
    cents = {c.cell_id: c.c_emb for c in cb.head().cb}
    assert cents[0][0] == pytest.approx(0.02)  # mean of 0.00..0.04
    assert cents[1][1] == pytest.approx(10.0)
