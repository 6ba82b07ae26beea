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

from data_pipeline_with_big_data_stack_spark.operators.freq import mg_update
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


# ---------------------------------------------------------------------
# transformWithState (Spark 4 arbitrary-state API): the successor to
# applyInPandasWithState — named, typed state variables (ValueState /
# MapState / ListState, optional TTL and timers) behind a
# StatefulProcessor lifecycle, required to run on the RocksDB state
# store (state spills to disk instead of executor heap — the 100 TB
# shape for billions of keys). ``user_profile_stats`` keeps per-key
# scalar totals in a ValueState and per-event-type counts in a
# MapState, something the single-tuple applyInPandasWithState state
# cannot express without packing maps into strings.
# ---------------------------------------------------------------------

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: E402

_PROFILE_SCHEMA = (
    "key string, n_events long, total double, max_value double, n_types long"
)


class _ProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        # integer micro-units: see _running_fn's accumulation note
        self.totals = handle.getValueState(
            "totals", "n long, total_micros long, mx double"
        )
        self.types = handle.getMapState("types", "t string", "c long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self.totals.exists():
            n, tm, mx = self.totals.get()
        else:
            n, tm, mx = 0, 0, float("-inf")
        for pdf in rows:
            if not len(pdf):
                continue
            n += len(pdf)
            tm += int(round(pdf["value"] * 1_000_000).sum())
            mx = max(mx, float(pdf["value"].max()))
            for t, c in pdf["event_type"].value_counts().items():
                prev = (
                    self.types.getValue((str(t),))[0]
                    if self.types.containsKey((str(t),))
                    else 0
                )
                self.types.updateValue((str(t),), (int(prev) + int(c),))
        self.totals.update((n, tm, mx))
        n_types = sum(1 for _ in self.types.keys())
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "total": [tm / 1_000_000],
                "max_value": [mx],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def user_profile_stats(
    df: DataFrame, key_col: str, value_col: str, type_col: str
) -> DataFrame:
    """Per-key running (count, sum, max) + distinct-type count.

    Uses transformWithState when its python worker can run here
    (``ensure_tws_runtime``) — in that case run the stream with the
    RocksDB state store provider (``stateful.ROCKSDB_CONF``) — else
    falls back to the applyInPandasWithState twin; the output contract
    (and the registry oracle) is identical either way."""
    from pyspark.sql import functions as F

    slim = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
        F.col(type_col).cast("string").alias("event_type"),
    )
    if ensure_tws_runtime(df.sparkSession):
        return slim.groupBy("key").transformWithStateInPandas(
            statefulProcessor=_ProfileProcessor(),
            outputStructType=_PROFILE_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    return slim.groupBy("key").applyInPandasWithState(
        _profile_fallback_fn,
        outputStructType=_PROFILE_SCHEMA,
        stateStructType=_PROFILE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ROCKSDB_CONF = ("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)


def ensure_tws_runtime(spark) -> bool:
    """True if transformWithState's python worker can run here.

    The worker needs ``google.protobuf``. If the interpreter has it,
    nothing to do. Otherwise look for a vendored copy
    (``$SPARK_GRAFT_PROTOBUF_DIR``, or the google-cloud-sdk appengine
    platform, which bundles a full runtime) and inject it into the
    worker environment via ``sc.environment`` + the compat_site
    sitecustomize shim — PythonFunction env vars reach the worker
    without restarting the JVM, so this works on a harness-provided
    session too."""
    import importlib.util
    import os

    try:
        # find_spec raises if the parent "google" namespace is absent
        if importlib.util.find_spec("google.protobuf") is not None:
            return True
    except ModuleNotFoundError:
        pass
    candidates = [
        os.environ.get("SPARK_GRAFT_PROTOBUF_DIR"),
        "/usr/lib/google-cloud-sdk/platform/google_appengine",
    ]
    for cand in candidates:
        if cand and os.path.isfile(
            os.path.join(cand, "google", "protobuf", "descriptor.py")
        ):
            import data_pipeline_with_big_data_stack_spark.compat_site as _cs

            shim = os.path.dirname(os.path.abspath(_cs.__file__))
            sc = spark.sparkContext
            prev = sc.environment.get(
                "PYTHONPATH", os.environ.get("PYTHONPATH", "")
            )
            if shim not in prev.split(os.pathsep):
                sc.environment["PYTHONPATH"] = (
                    shim + ((os.pathsep + prev) if prev else "")
                )
            sc.environment["SPARK_GRAFT_TWS_PROTOBUF"] = cand
            return True
    return False


# applyInPandasWithState twin of _ProfileProcessor — used when the
# transformWithState worker cannot run (no protobuf anywhere); the
# distinct-type set is packed into a sorted CSV string because this
# API's state is one flat tuple.
_PROFILE_STATE = "n long, total_micros long, mx double, types string"


def _profile_fallback_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, tm, mx, types) = (
        state.get if state.exists else (0, 0, float("-inf"), "")
    )
    seen = set(types.split(",")) - {""}
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        tm += int(round(pdf["value"] * 1_000_000).sum())
        mx = max(mx, float(pdf["value"].max()))
        seen.update(str(t) for t in pdf["event_type"].unique())
    state.update((n, tm, mx, ",".join(sorted(seen))))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_events": [n],
            "total": [tm / 1_000_000],
            "max_value": [mx],
            "n_types": [len(seen)],
        }
    )


# --------------------------------------------------------------------------
# Streaming frequent items: a Misra-Gries summary AS the per-key state —
# the streaming twin of operators/freq.py (Druid's topN-over-streams
# shape with hard-bounded memory). Each key holds ≤ k counters no
# matter how many distinct items the stream carries; every micro-batch
# folds its items into the summary (the same mg_update as the batch
# fold, so the two paths can't drift) and re-emits the key's summary —
# update semantics, take the last emission (max n_seen) for the final
# sketch. Exact below capacity, est ≤ true ≤ est + err above it.
# --------------------------------------------------------------------------
_MG_OUT_SCHEMA = "key string, item string, cnt long, err long, n_seen long"
_MG_STATE_SCHEMA = (
    "items array<string>, cnts array<long>, err long, n_seen long"
)


def _mg_fn_factory(k: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        # mg_update is closed over from the module scope — a runtime
        # package import here would fail on executors that don't have
        # the repo on sys.path (fns ship by value, imports don't)
        if state.exists:
            items, cnts, err, n_seen = state.get
            counts = dict(zip(items, cnts))
        else:
            counts, err, n_seen = {}, 0, 0
        for pdf in pdfs:
            n_seen += len(pdf)
            err += mg_update(counts, pdf["item"], k)
        state.update((list(counts), list(counts.values()), err, n_seen))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(counts),
                "item": list(counts),
                "cnt": list(counts.values()),
                "err": [err] * len(counts),
                "n_seen": [n_seen] * len(counts),
            }
        ).astype({"cnt": "int64", "err": "int64", "n_seen": "int64"})

    return fn


def stream_frequent_items(
    df: DataFrame, key_col: str, item_col: str, k: int
) -> DataFrame:
    """Per-key streaming Misra-Gries: one summary row per surviving
    item per micro-batch (update mode), ``err`` the key's cumulative
    reduction error and ``n_seen`` its cumulative row count (monotone —
    selects the final emission downstream)."""
    from pyspark.sql import functions as F

    slim = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(item_col).cast("string").alias("item"),
    ).filter(F.col("item").isNotNull())  # NULL is not a countable item
    return slim.groupBy("key").applyInPandasWithState(
        _mg_fn_factory(k),
        outputStructType=_MG_OUT_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
