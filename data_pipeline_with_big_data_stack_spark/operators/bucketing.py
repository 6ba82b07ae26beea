"""Bounded LSH-bucket grouping.

All fuzzy-dedup pipelines in this engine share one scale-critical shape:
explode per-row band keys, group rows by bucket, and explode i<j pairs
inside each bucket. LSH keeps buckets near-singleton by construction,
but real corpora have degenerate mega-buckets (empty or boilerplate
documents hash identically), and an unbounded ``collect_list`` would
materialize such a bucket in a single task's aggregation buffer.

``capped_buckets`` bounds that: a ``row_number`` window over the bucket
keys keeps only the first ``cap`` members (deterministic ``order_col``
order) BEFORE the collect, so the aggregation buffer never holds more
than ``cap`` entries. The window needs the same hash partitioning as the
following groupBy, so Catalyst plans exactly ONE exchange on the bucket
key — capping is free shuffle-wise (the window sort replaces the
sort_array the uncapped shape needed anyway).

Recall trade: members beyond the first ``cap`` of a bucket lose
candidacy via that band only — with multi-band LSH they can still pair
via their other bands. DuckDB oracles mirror the cap exactly with
``row_number() OVER (PARTITION BY <keys> ORDER BY <order_col>) <= cap``
so correctness gates stay bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def capped_buckets(
    bands: DataFrame,
    keys: list[str],
    order_col: str,
    payload: Column,
    cap: int,
) -> DataFrame:
    """Group ``bands`` rows into buckets of at most ``cap`` members.

    Returns one row per bucket with ``keys`` and an ``ids`` array of the
    first ``cap`` ``payload`` values in ``order_col`` order (ascending).
    Buckets with fewer than 2 members are dropped — they cannot produce
    pairs.
    """
    w = W.partitionBy(*keys).orderBy(order_col)
    capped = (
        bands.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
    return (
        capped.groupBy(*keys)
        .agg(F.sort_array(F.collect_list(payload)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
