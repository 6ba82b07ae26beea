"""The reference's seven datasource schemas as data.

Each Druid datasource spec (``M/druid-*-datasource.json``) declares a
Kafka topic, a posix-seconds timestamp column, typed dimensions
(string/double/long only — SURVEY §1.2/§1.3), a segment granularity
(DAY/HOUR) and a query granularity (MINUTE/HOUR/NONE). These dataclasses
carry exactly that information; ``ingest.compile_batch/compile_stream``
turn a spec + source DataFrame into the engine's canonical table form.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_TYPE_MAP = {
    "string": T.StringType(),
    "double": T.DoubleType(),
    "long": T.LongType(),
    # engine extensions beyond the reference's three types
    "int": T.IntegerType(),
    "float": T.FloatType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


@dataclass(frozen=True)
class Dimension:
    name: str
    type: str = "string"  # druid dimension type name

    @property
    def spark_type(self) -> T.DataType:
        return _TYPE_MAP[self.type]


@dataclass(frozen=True)
class TimestampSpec:
    """``timestampSpec`` block: column + format. The reference uses
    ``posix`` (epoch seconds) everywhere (e.g.
    ``M/druid-goes-satellite-datasource.json:21-24``); ``iso`` and
    ``millis`` are supported for completeness."""

    column: str = "timestamp"
    format: str = "posix"  # posix | millis | iso


@dataclass(frozen=True)
class GranularitySpec:
    """``granularitySpec``: segment granularity drives the storage
    partitioning (DAY/HOUR → partition columns), query granularity
    floors ``__time`` at ingest, rollup pre-aggregates when enabled
    (declared-but-disabled in the reference —
    ``M/druid-goes-satellite-datasource.json:79-81``)."""

    segment: str = "DAY"  # DAY | HOUR
    query: str = "NONE"  # NONE | MINUTE | HOUR | DAY
    rollup: bool = False


@dataclass(frozen=True)
class DatasourceSpec:
    name: str
    topic: str
    timestamp: TimestampSpec
    dimensions: tuple[Dimension, ...]
    granularity: GranularitySpec = field(default_factory=GranularitySpec)
    max_rows_per_segment: int = 5_000_000

    def schema(self) -> T.StructType:
        """Schema of the ingested table: ``__time`` + typed dimensions."""
        fields = [T.StructField("__time", T.TimestampType(), False)]
        fields += [T.StructField(d.name, d.spark_type, True) for d in self.dimensions]
        return T.StructType(fields)


def _d(*pairs: tuple[str, str]) -> tuple[Dimension, ...]:
    return tuple(Dimension(n, t) for n, t in pairs)


# --- the seven reference datasources (SURVEY §1.4 table) -------------------

GOES_SATELLITE = DatasourceSpec(
    name="goes_satellite_datasource",  # M/druid-goes-satellite-datasource.json
    topic="goes_satellite_data",
    timestamp=TimestampSpec("time", "posix"),
    dimensions=_d(
        ("product_time", "string"),
        ("solar_array_current_channel_index_label", "string"),
        ("source_file", "string"),
        ("irradiance_xrsa1", "double"),
        ("irradiance_xrsa2", "double"),
        ("irradiance_xrsb1", "double"),
        ("irradiance_xrsb2", "double"),
        ("primary_xrsb", "double"),
        ("dispersion_angle", "double"),
        ("integration_time", "double"),
        ("extraction_timestamp", "long"),
        ("file_size_mb", "double"),
    ),
    granularity=GranularitySpec("DAY", "MINUTE", rollup=False),
    max_rows_per_segment=1_000_000,
)

REAL_CRYPTO = DatasourceSpec(
    name="real_crypto_datasource",  # M/druid-real-crypto-datasource.json
    topic="real_crypto_prices",
    timestamp=TimestampSpec("timestamp", "posix"),
    dimensions=_d(
        ("coin_id", "string"),
        ("source", "string"),
        ("price_usd", "double"),
        ("market_cap", "long"),
        ("change_24h", "double"),
    ),
)

WEATHER = DatasourceSpec(
    name="weather_datasource",  # M/druid-weather-datasource.json
    topic="weather_data",
    timestamp=TimestampSpec("timestamp", "posix"),
    dimensions=_d(
        ("city", "string"),
        ("weather", "string"),
        ("temperature", "double"),
        ("humidity", "long"),
        ("pressure", "double"),
        ("wind_speed", "double"),
    ),
)

STOCKS = DatasourceSpec(
    name="stocks_datasource",  # M/druid-stocks-datasource.json
    topic="stock_prices",
    timestamp=TimestampSpec("timestamp", "posix"),
    dimensions=_d(
        ("symbol", "string"),
        ("source", "string"),
        ("price", "double"),
        ("change", "double"),
        # kept string for parity (stripped of '%' upstream) —
        # M/druid-stocks-datasource.json:44-46
        ("change_percent", "string"),
        ("volume", "long"),
    ),
)

SPARK_ANALYTICS = DatasourceSpec(
    name="spark_analytics_datasource",  # M/druid-spark-datasource.json
    topic="spark_analytics",
    timestamp=TimestampSpec("timestamp", "posix"),
    dimensions=_d(
        ("session_id", "string"),
        ("user_id", "long"),
        ("page_views", "long"),
        ("time_spent_minutes", "long"),
        ("device_type", "string"),
        ("country", "string"),
        ("revenue", "double"),
    ),
)

DEMO = DatasourceSpec(
    name="demo_datasource",  # M/druid-kafka-datasource.json
    topic="demo",
    timestamp=TimestampSpec("timestamp", "posix"),
    dimensions=_d(("name", "string"), ("data_id", "long")),
    granularity=GranularitySpec("HOUR", "MINUTE", rollup=False),
)

GOES_STORAGE_METRICS = DatasourceSpec(
    name="goes_storage_metrics",  # M/druid-goes-storage-metrics.json
    topic="goes_storage_metrics",
    timestamp=TimestampSpec("timestamp", "posix"),
    dimensions=_d(
        ("current_files_processed", "long"),
        ("current_storage_mb", "double"),
        ("projected_daily_growth_mb", "double"),
        ("projected_weekly_growth_mb", "double"),
        ("projected_monthly_growth_mb", "double"),
        ("projected_weekly_growth_gb", "double"),
        ("projected_monthly_growth_gb", "double"),
    ),
    granularity=GranularitySpec("DAY", "HOUR", rollup=False),
    max_rows_per_segment=100_000,
)

ALL_DATASOURCES: tuple[DatasourceSpec, ...] = (
    GOES_SATELLITE,
    REAL_CRYPTO,
    WEATHER,
    STOCKS,
    SPARK_ANALYTICS,
    DEMO,
    GOES_STORAGE_METRICS,
)

DATASOURCES_BY_NAME = {s.name: s for s in ALL_DATASOURCES}
DATASOURCES_BY_TOPIC = {s.topic: s for s in ALL_DATASOURCES}


# --- Druid supervisor-spec JSON compatibility ------------------------------

def from_druid_json(spec: dict | str) -> DatasourceSpec:
    """Load a Druid Kafka-ingestion supervisor spec (the reference's
    ``druid-*-datasource.json`` format) into a :class:`DatasourceSpec`,
    so existing spec files drive the Spark engine unmodified.

    Reads: ``spec.ioConfig.topic``, ``spec.dataSchema.dataSource``,
    ``timestampSpec{column,format}``, ``dimensionsSpec.dimensions``
    (strings or ``{name,type}`` objects — Druid treats bare strings as
    string dimensions), ``granularitySpec{segmentGranularity,
    queryGranularity,rollup}``, and
    ``tuningConfig.maxRowsPerSegment``.
    """
    import json as _json

    if isinstance(spec, str):
        spec = _json.loads(spec)
    body = spec.get("spec", spec)
    schema = body["dataSchema"]
    io = body.get("ioConfig", {})
    tuning = body.get("tuningConfig", {})

    ts = schema.get("timestampSpec", {})
    dims = []
    for d in schema.get("dimensionsSpec", {}).get("dimensions", []):
        if isinstance(d, str):
            dims.append(Dimension(d, "string"))
        else:
            dims.append(Dimension(d["name"], d.get("type", "string").lower()))

    gran = schema.get("granularitySpec", {})
    q = gran.get("queryGranularity", "NONE")
    if isinstance(q, dict):  # {"type": "none"} form
        q = q.get("type", "NONE")
    return validate_spec(
        DatasourceSpec(
            name=schema["dataSource"],
            topic=io.get("topic", schema["dataSource"]),
            timestamp=TimestampSpec(
                ts.get("column", "timestamp"), ts.get("format", "posix")
            ),
            dimensions=tuple(dims),
            granularity=GranularitySpec(
                segment=str(gran.get("segmentGranularity", "DAY")).upper(),
                query=str(q).upper(),
                rollup=bool(gran.get("rollup", False)),
            ),
            max_rows_per_segment=int(tuning.get("maxRowsPerSegment", 5_000_000)),
        )
    )


def validate_spec(spec: DatasourceSpec) -> DatasourceSpec:
    """Fail fast on spec values the compiler can't execute (so a loaded
    Druid JSON spec errors at load time, not deep inside a job)."""
    from data_pipeline_with_big_data_stack_spark.ingest import _GRAIN_TO_SECONDS, _GRAIN_TO_UNIT

    if spec.timestamp.format not in ("posix", "millis", "iso", "auto"):
        raise ValueError(f"unsupported timestampSpec format {spec.timestamp.format!r}")
    q = spec.granularity.query
    if q != "NONE" and q not in _GRAIN_TO_UNIT and q not in _GRAIN_TO_SECONDS:
        raise ValueError(f"unsupported queryGranularity {q!r}")
    if spec.granularity.segment not in ("DAY", "HOUR"):
        raise ValueError(f"unsupported segmentGranularity {spec.granularity.segment!r}")
    for d in spec.dimensions:
        if d.type not in _TYPE_MAP:
            raise ValueError(f"unsupported dimension type {d.type!r} for {d.name!r}")
    return spec
