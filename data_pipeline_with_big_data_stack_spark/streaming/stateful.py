"""Custom stateful streaming operators (SURVEY §2.9 T9).

The reference has no stateful stream processing (Druid ingestion is
stateless row-append); these are the engine's extension points, built on
``applyInPandasWithState`` — Arrow-batched per-key state, the idiomatic
Spark shape for "operator Spark lacks" custom state machines.

Provided operators:
- ``running_totals``: per-key running count/sum emitted every batch —
  the streaming twin of the storage-metrics accumulator
  (``M/app_airflow/app/dags/goes_satellite_etl.py:415-489`` keeps
  cumulative file counts/sizes across DAG runs via Druid queries; here
  the accumulation is engine state).
- ``threshold_alerts``: emits one row when a key's running aggregate
  crosses a threshold — the alerting shape dashboards poll for.

Scale notes: state is hash-partitioned by key across executors; state
timeouts (``GroupStateTimeout``) bound memory; Arrow batches keep the
Python exchange vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)  # state fns must not require executor-side imports

_RUNNING_SCHEMA = "key string, n_events long, total double, max_value double"
_STATE_SCHEMA = "n long, total_micros long, max_value double"


def _running_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # totals accumulate as integer micro-units: float accumulation order
    # varies with batch/file splits and would diverge from an exact
    # (decimal) batch aggregate at fixed rounding precision
    (n, total_micros, mx) = state.get if state.exists else (0, 0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total_micros += int(round(pdf["value"] * 1_000_000).sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total_micros, mx))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_events": [n],
            "total": [total_micros / 1_000_000],
            "max_value": [mx],
        }
    )


def running_totals(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum, max) over a stream of (key, value).

    Input: any DataFrame with ``key_col`` (string-castable) and
    ``value_col`` (numeric). Output: one row per key per micro-batch with
    the cumulative aggregate — update semantics.
    """
    from pyspark.sql import functions as F

    slim = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return slim.groupBy("key").applyInPandasWithState(
        _running_fn,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_ALERT_SCHEMA = "key string, total double, crossed_at_n long"


def _alert_fn_factory(threshold: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (n, total, fired) = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        newly_fired = fired == 0 and total >= threshold
        state.update((n, total, 1 if (fired or newly_fired) else 0))
        if newly_fired:
            yield pd.DataFrame({"key": [key[0]], "total": [total], "crossed_at_n": [n]})
        else:
            yield pd.DataFrame({"key": [], "total": [], "crossed_at_n": []}).astype(
                {"key": "object", "total": "float64", "crossed_at_n": "int64"}
            )

    return fn


def threshold_alerts(
    df: DataFrame, key_col: str, value_col: str, threshold: float
) -> DataFrame:
    """Emit one alert row the first time a key's running sum crosses
    ``threshold`` (at-most-one alert per key — dedup is engine state, not
    downstream logic)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    slim = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return slim.groupBy("key").applyInPandasWithState(
        _alert_fn_factory(threshold),
        outputStructType=_ALERT_SCHEMA,
        stateStructType="n long, total double, fired long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
