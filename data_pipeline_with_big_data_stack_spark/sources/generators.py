"""Seeded synthetic sources (SURVEY §2.1 S14-S16).

The reference generates sample data with unseeded ``random``/``np.random``
driver-side (``goes_satellite_etl.py:390-413``, ``demoSpark.py:31-49``,
``demoKafka.py:24-49``). The engine versions are distributed
(``spark.range`` + seeded ``rand()``) and deterministic, so tests and
oracles are meaningful. Value ranges match the reference exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _uniform(seed: int, lo: float, hi: float) -> Column:
    return F.rand(seed) * (hi - lo) + lo


def _choice(seed: int, options: list[str]) -> Column:
    """Deterministic uniform pick from a literal list."""
    arr = F.array(*[F.lit(o) for o in options])
    idx = (F.rand(seed) * len(options)).cast("int") + 1
    return F.element_at(arr, idx)


def goes_sample_source(
    spark: SparkSession,
    n: int = 100,
    anchor_epoch: int = 1_700_000_000,
    seed: int = 42,
    cadence_seconds: int = 60,
) -> DataFrame:
    """S14: GOES-shaped sample records — one per ``cadence_seconds``
    counting back from the anchor (reference: 1/min), uniform-random
    irradiances in physical ranges, ``channel_{i % 4}`` labels
    (``goes_satellite_etl.py:390-413``)."""
    df = spark.range(n)
    step = F.col("id") * cadence_seconds
    return df.select(
        (F.lit(anchor_epoch) - step).alias("time"),
        F.date_format(
            F.timestamp_seconds(F.lit(anchor_epoch) - step),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("product_time"),
        F.concat(F.lit("channel_"), F.pmod("id", F.lit(4))).alias(
            "solar_array_current_channel_index_label"
        ),
        _uniform(seed + 1, 1e-9, 1e-6).alias("irradiance_xrsa1"),
        _uniform(seed + 2, 1e-9, 1e-6).alias("irradiance_xrsa2"),
        _uniform(seed + 3, 1e-10, 1e-7).alias("irradiance_xrsb1"),
        _uniform(seed + 4, 1e-10, 1e-7).alias("irradiance_xrsb2"),
        _uniform(seed + 5, 1e-10, 1e-7).alias("primary_xrsb"),
        _uniform(seed + 6, 0.0, 360.0).alias("dispersion_angle"),
        _uniform(seed + 7, 1.0, 10.0).alias("integration_time"),
        F.lit("sample_data_generator").alias("source_file"),
        F.lit(anchor_epoch).cast("long").alias("extraction_timestamp"),
        F.lit(15.5).alias("file_size_mb"),
    )


def sessions_source(
    spark: SparkSession,
    n: int = 100,
    anchor_epoch: int = 1_700_000_000,
    seed: int = 7,
) -> DataFrame:
    """S15: web-analytics sessions with zero-inflated revenue
    (``demoSpark.py:31-49``: revenue 0 w.p. 0.7 else uniform(0,500))."""
    df = spark.range(n)
    revenue = F.when(
        F.rand(seed + 4) > 0.7, F.round(F.rand(seed + 5) * 500, 2)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.concat(F.lit("session_"), (F.rand(seed) * 9000).cast("int") + 1000).alias(
            "session_id"
        ),
        ((F.rand(seed + 1) * 500).cast("long") + 1).alias("user_id"),
        ((F.rand(seed + 2) * 20).cast("long") + 1).alias("page_views"),
        ((F.rand(seed + 3) * 120).cast("long") + 1).alias("time_spent_minutes"),
        _choice(seed + 6, ["mobile", "desktop", "tablet"]).alias("device_type"),
        _choice(seed + 7, ["US", "UK", "DE", "FR", "ES", "IT", "JP"]).alias("country"),
        (F.lit(anchor_epoch) - (F.rand(seed + 8) * 3600).cast("long")).alias(
            "timestamp"
        ),
        revenue.alias("revenue"),
    )


def coin_ticks_source(
    spark: SparkSession,
    n_ticks: int = 100,
    anchor_epoch: int = 1_700_000_000,
    seed: int = 11,
) -> DataFrame:
    """S16: per tick one record per coin with coin-specific random ranges
    (``demoKafka.py:24-49``) — four structs exploded per tick."""
    ranges = {"BTC": (10, 400), "ETH": (10, 250), "DOT": (40, 170), "BTT": (10, 40)}
    df = spark.range(n_ticks)
    coins = F.array(
        *[
            F.struct(
                F.lit(name).alias("name"),
                (F.rand(seed + i) * (hi - lo) + lo).cast("long").alias("data_id"),
            )
            for i, (name, (lo, hi)) in enumerate(ranges.items())
        ]
    )
    return (
        df.select(
            (F.lit(anchor_epoch) + F.col("id")).alias("timestamp"),
            F.explode(coins).alias("c"),
        )
        .select("timestamp", F.col("c.name").alias("name"), F.col("c.data_id").alias("data_id"))
    )


def pg_users_source(spark: SparkSession, n: int = 100, seed: int = 13) -> DataFrame:
    """S9's synthetic generate_series SELECT re-expressed natively
    (``database_etl.py:52-60``): user_{n}, random revenue, CASE-based
    plan/platform, LIMIT 100."""
    df = spark.range(1, n + 1)
    return df.select(
        F.unix_timestamp(F.current_timestamp()).cast("double").alias("timestamp"),
        F.concat(F.lit("user_"), F.col("id")).alias("user_id"),
        F.round(F.rand(seed) * 1000, 2).alias("revenue"),
        F.when(F.rand(seed + 1) > 0.5, "premium").otherwise("basic").alias("plan_type"),
        F.when(F.rand(seed + 2) > 0.5, "web").otherwise("mobile").alias("platform"),
        F.lit("postgresql").alias("source"),
    ).limit(n)
