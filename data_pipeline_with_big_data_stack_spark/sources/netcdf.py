"""NetCDF scientific-array reader (SURVEY §2.1 S2-S4) — the flagship
ingest path: satellite files → one flat record per timestep.

Architecture (Spark-first): a ``binaryFile`` scan distributes whole files
across executors; a ``mapInPandas`` batch parser turns each file's bytes
into N long-form rows (one per timestep) with the reference's semantics:

- time decode: ``units``-attribute offset + per-step seconds
  (``goes_satellite_etl.py:243-255``);
- variable-synonym resolution: first present of the candidate names
  (``:218-234``), missing variables zero-filled (``:236-238``);
- NaN → 0.0 (``:277-289``);
- per-file provenance: ``source_file``, ``file_size_mb``,
  ``extraction_timestamp`` (``:267-274``).

Binary decode is format-dispatched, all native, no library needed:
classic NetCDF-3 (magic ``CDF``) via the pure-Python reader in
``netcdf3.py``; NetCDF-4/HDF5 (magic ``\\x89HDF``) — the format of the
reference's real GOES downloads — via the pure-Python HDF5 subset
reader in ``hdf5lite.py``; and the test fixture format (``FAKENC1`` +
JSON payload) deterministically.
All Spark-side plumbing — scan, schema, batching, partition parallelism —
is real and tested. Many-small-files (187 KB each) are handled by the scan
packing many files per task (``maxPartitionBytes``) and the parser looping
files within one Arrow batch.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value
from data_pipeline_with_big_data_stack_spark.sources.hdf5lite import parse_hdf5_netcdf
from data_pipeline_with_big_data_stack_spark.sources.netcdf3 import parse_netcdf3

pickle_by_value(__name__)  # the mapInPandas parser ships by value
# NB: parse_netcdf3 must be a module-level reference — netcdf3 is also
# registered by value, so cloudpickle ships it with the parser closure;
# an inside-function import would re-resolve on the worker and fail
# when the package isn't on the executor's sys.path.

# canonical science variables ← synonym candidates, in priority order
# (goes_satellite_etl.py:218-226 and the sunpy remap :328-339)
SYNONYMS: dict[str, tuple[str, ...]] = {
    "irradiance_xrsa1": ("irradiance_xrsa1", "xrsa1", "xrsa_short"),
    "irradiance_xrsa2": ("irradiance_xrsa2", "xrsa2"),
    "irradiance_xrsb1": ("irradiance_xrsb1", "xrsb1", "xrsb_long"),
    "irradiance_xrsb2": ("irradiance_xrsb2", "xrsb2"),
    "primary_xrsb": ("primary_xrsb", "xrsb_primary", "primary_chan"),
    "dispersion_angle": ("dispersion_angle", "disp_angle"),
    "integration_time": ("integration_time", "int_time"),
}

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("time", T.LongType()),
        T.StructField("product_time", T.StringType()),
        T.StructField("solar_array_current_channel_index_label", T.StringType()),
        T.StructField("irradiance_xrsa1", T.DoubleType()),
        T.StructField("irradiance_xrsa2", T.DoubleType()),
        T.StructField("irradiance_xrsb1", T.DoubleType()),
        T.StructField("irradiance_xrsb2", T.DoubleType()),
        T.StructField("primary_xrsb", T.DoubleType()),
        T.StructField("dispersion_angle", T.DoubleType()),
        T.StructField("integration_time", T.DoubleType()),
        T.StructField("source_file", T.StringType()),
        T.StructField("file_size_mb", T.DoubleType()),
        T.StructField("extraction_timestamp", T.LongType()),
    ]
)

FAKE_MAGIC = b"FAKENC1\n"


_UNIT_SECONDS = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400}


def _decode_units(units: str, offsets, extraction_ts: int) -> list[int]:
    """``<unit> since <ref-time>`` + offsets → epoch seconds (the
    time-units decode of goes_satellite_etl.py:243-255). The reference
    guards the whole decode and falls back to an extraction-anchored
    10 s cadence on ANY parse failure (``units='unknown'`` is its own
    default when the attr is missing, :199) — replicated here, plus
    minute/hour/day offset units and tolerance for a trailing zone word
    (``... 12:00:00 UTC``)."""
    try:
        unit_word = units.split()[0].lower()
        scale = _UNIT_SECONDS[unit_word]
        ref_str = units.split("since", 1)[1].strip()
        for suffix in (" UTC", " utc", "Z"):
            if ref_str.endswith(suffix):
                ref_str = ref_str[: -len(suffix)].strip()
        ref = datetime.fromisoformat(ref_str).replace(tzinfo=timezone.utc)
        return [
            int((ref + timedelta(seconds=float(o) * scale)).timestamp())
            for o in offsets
        ]
    except Exception:
        n = len(offsets)
        return [extraction_ts - 10 * (n - 1 - i) for i in range(n)]


def _parse_one(path: str, content: bytes, extraction_ts: int) -> "object":
    """bytes → pandas.DataFrame of flat records for one file."""
    import numpy as np
    import pandas as pd

    if content.startswith(FAKE_MAGIC):
        payload = json.loads(content[len(FAKE_MAGIC):])
        variables = payload["variables"]
        units = payload.get("units", "seconds since 1970-01-01 00:00:00")
    elif content[:3] == b"CDF" and content[3] in (1, 2):
        # classic NetCDF-3: decoded natively, no library needed
        variables, var_attrs, _gatts = parse_netcdf3(content)
        # reference default when the attr is missing is 'unknown', which
        # routes to the cadence fallback (goes_satellite_etl.py:199)
        units = var_attrs.get("time", {}).get("units", "unknown")
    elif content[:4] == b"\x89HDF":
        # NetCDF-4/HDF5 — the real GOES product format — decoded by the
        # native pure-Python HDF5 subset reader (sources/hdf5lite.py)
        variables, var_attrs, _gatts = parse_hdf5_netcdf(content)
        units = var_attrs.get("time", {}).get("units", "unknown")
    else:
        raise ValueError(f"unrecognized file format for {path!r}")

    if "time" in variables:
        times = _decode_units(units, variables["time"], extraction_ts)
    else:
        # S4 sunpy-fallback shape: no time var; synthesize a 10 s cadence
        # ending at extraction (goes_satellite_etl.py:306-355).
        n = max(len(v) for v in variables.values()) if variables else 0
        times = [extraction_ts - 10 * (n - 1 - i) for i in range(n)]

    n = len(times)
    name = path.rsplit("/", 1)[-1]
    parts = name.split("_")
    product_time = parts[3] if len(parts) > 3 else name
    out = {
        "time": times,
        "product_time": [product_time] * n,
        "solar_array_current_channel_index_label": [
            f"channel_{i % 4}" for i in range(n)
        ],
        "source_file": [name] * n,
        "file_size_mb": [round(len(content) / 1024 / 1024, 6)] * n,
        "extraction_timestamp": [extraction_ts] * n,
    }
    def _to_float(v) -> float:
        # per-value guard → 0.0, like the reference's try/except around
        # each float() (goes_satellite_etl.py:278-289); None covers
        # netCDF4 masked-array .tolist() fills and JSON nulls
        try:
            f = float(v)
        except (TypeError, ValueError):
            return 0.0
        return 0.0 if np.isnan(f) else f

    for canonical, candidates in SYNONYMS.items():
        series = None
        for cand in candidates:
            if cand in variables:
                series = [_to_float(v) for v in variables[cand]]
                break
        if series is None:
            series = [0.0] * n  # zero-fill missing variable
        series += [0.0] * (n - len(series))  # index-overrun → 0.0
        out[canonical] = series[:n]
    return pd.DataFrame(out)


def read_netcdf_directory(
    spark: SparkSession,
    path: str,
    glob: str = "*.nc",
    extraction_ts: int = 1_700_000_000,
) -> DataFrame:
    """S3: distributed NetCDF scan → long-form records. One ``binaryFile``
    scan (files packed into tasks by size) feeding an Arrow-batched
    parser; no driver-side file loop."""
    binary = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )

    def parse_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            frames = [
                _parse_one(row.path, row.content, extraction_ts)
                for row in pdf.itertuples(index=False)
            ]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return binary.select("path", "content").mapInPandas(parse_batches, RECORD_SCHEMA)


def discover_manifest(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S2: a discovery step (WebDAV/HTTP listing in the reference —
    ``test_citic_download_v2.py:344-438``) reduced to its engine-side
    form: a manifest DataFrame of file URLs to scan, deduplicated and
    sorted (F19 semantics)."""
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    # case-insensitive suffix, matching parse_webdav_listing (the
    # reference's endswith('.nc') is case-sensitive; .NC files are
    # equally NetCDF — documented deviation)
    return (
        df.filter(F.lower(F.col("path")).endswith(".nc"))
        .distinct()
        .orderBy("path")
    )
