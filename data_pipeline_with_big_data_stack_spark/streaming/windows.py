"""Streaming window operators (SURVEY §2.9 T3-T5, T9).

The reference's only windowing is Druid's ``queryGranularity`` floor and
the dashboards' ``TIME_FLOOR`` hourly/daily buckets (``README.md:173-182``,
``M/druid-kafka-datasource.json:40``); here those become Structured
Streaming tumbling windows, plus the sliding / session-window and
streaming-dedup operators Druid lacks but the engine exposes.

Watermark policy (T5): Druid accepts arbitrarily late events into
existing segments — "infinite lateness". Raw append ingestion replicates
that exactly (no watermark, ``ingest.write_stream``). Any *aggregating*
stream must bound state, so every operator here takes an explicit
``watermark`` argument — a documented, deliberate deviation recorded in
SURVEY §2.9 T5.

Scale notes: all aggregations are keyed by (window, dims) so state is
hash-partitioned across executors; watermarks bound total state size;
none of these operators collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_exprs(aggs: dict[str, Column] | None) -> list[Column]:
    if not aggs:
        return [F.count(F.lit(1)).alias("n_events")]
    return [c.alias(name) for name, c in aggs.items()]


def tumbling_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    dims: list[str] | None = None,
    aggs: dict[str, Column] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window aggregation — the streaming twin of the dashboard
    ``TIME_FLOOR(__time,'PT1H') ... GROUP BY 1`` query (``README.md:175``).

    Emits (window_start, window_end, *dims, *aggs). Works identically on
    batch DataFrames (no watermark applied) so batch/stream parity is
    testable on one code path.
    """
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    w = F.window(F.col(time_col), duration)
    out = df.groupBy(w.alias("w"), *(dims or [])).agg(*_agg_exprs(aggs))
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(dims or []),
        *[c for c in out.columns if c != "w" and c not in (dims or [])],
    )


def sliding_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    slide: str,
    dims: list[str] | None = None,
    aggs: dict[str, Column] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding (hopping) window aggregation (T4 — not present in the
    reference; built-in Spark capability the engine exposes)."""
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    w = F.window(F.col(time_col), duration, slide)
    out = df.groupBy(w.alias("w"), *(dims or [])).agg(*_agg_exprs(aggs))
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(dims or []),
        *[c for c in out.columns if c != "w" and c not in (dims or [])],
    )


def session_agg(
    df: DataFrame,
    time_col: str,
    gap: str,
    dims: list[str],
    aggs: dict[str, Column] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per dims key (``session_window`` — dynamic-length state)."""
    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    w = F.session_window(F.col(time_col), gap)
    out = df.groupBy(w.alias("w"), *dims).agg(*_agg_exprs(aggs))
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *dims,
        *[c for c in out.columns if c != "w" and c not in dims],
    )


def stream_dedup(
    df: DataFrame,
    keys: list[str],
    time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication (T9). With a time column, state is
    bounded by the watermark (``dropDuplicatesWithinWatermark``);
    without, state grows with distinct keys (exact parity with a global
    ``dropDuplicates`` — use only on bounded key domains)."""
    if df.isStreaming and time_col is not None:
        return df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
