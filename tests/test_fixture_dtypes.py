"""Fixture-dtype-drift regression tests.

Round 2 broke because the driver regenerated the parquet fixtures with a
different timestamp physical type (timestamp[ns] → naive timestamp[us]),
which Spark 4 reads as TIMESTAMP_NTZ by default — a type ``withWatermark``
rejects and ``CAST(... AS DOUBLE)`` crashes on. The loaders must absorb
ANY of the three plausible physical encodings of ``events.ts``:

  * epoch-nanos int64 (read as bigint via legacy nanosAsLong)
  * naive timestamp[us] (would read NTZ without the session pin)
  * UTC-adjusted timestamp[us]

Each twin is written from the same rows; the batch loader and one
watermarked streaming query must produce identical results over all
three.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_pipeline_with_big_data_stack_spark.tables import load_table
from tests.conftest import SF_SMOKE

_EVENTS = os.path.join(SF_SMOKE, "events.parquet")


@pytest.fixture(scope="module")
def dtype_twins(tmp_path_factory):
    """Three copies of the events fixture, one per ts physical type.

    Each twin lives in its own directory (the loaders address tables as
    ``{sf_dir}/events.parquet``).
    """
    src = pq.read_table(_EVENTS)
    i = src.schema.get_field_index("ts")
    ts = src.column("ts")

    # normalize to epoch-micro int64 first so every twin encodes the
    # same instants regardless of the source fixture's current dtype
    if pa.types.is_timestamp(ts.type):
        micros = ts.cast(pa.timestamp("us")).cast(pa.int64())
    else:  # already epoch-nanos int64
        micros = pa.compute.divide(ts.cast(pa.int64()), 1000)

    variants = {
        # epoch-nanos as a plain int64 column — the shape the legacy
        # nanosAsLong conf produces from timestamp[ns] parquet
        "ns_long": pa.compute.multiply(micros, 1000),
        "us_ntz": micros.cast(pa.timestamp("us")),
        "us_utc": micros.cast(pa.timestamp("us", tz="UTC")),
    }

    dirs = {}
    for name, col in variants.items():
        d = tmp_path_factory.mktemp(f"sf_{name}")
        pq.write_table(src.set_column(i, "ts", col), str(d / "events.parquet"))
        dirs[name] = str(d)
    return dirs


def test_loader_normalizes_every_ts_encoding(spark, dtype_twins):
    baselines = None
    for name, d in dtype_twins.items():
        df = load_table(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        got = sorted(
            (r["event_id"], r["ts"]) for r in df.select("event_id", "ts").collect()
        )
        if baselines is None:
            baselines = got
        else:
            assert got == baselines, f"{name} decoded different instants"


def test_watermarked_query_runs_on_every_ts_encoding(spark, dtype_twins):
    from data_pipeline_with_big_data_stack_spark.queries.streaming_queries import (
        q_stream_hourly_counts,
    )

    counts = {
        name: q_stream_hourly_counts(spark, d).count()
        for name, d in dtype_twins.items()
    }
    assert len(set(counts.values())) == 1, counts
    assert next(iter(counts.values())) > 0


def test_sessionization_runs_on_every_ts_encoding(spark, dtype_twins):
    from data_pipeline_with_big_data_stack_spark.queries.timeseries import (
        q_events_sessionization,
    )

    rows = {
        name: sorted(
            tuple(r) for r in q_events_sessionization(spark, d).collect()
        )
        for name, d in dtype_twins.items()
    }
    vals = list(rows.values())
    assert vals[0] == vals[1] == vals[2]
