"""Record-cleanup operators (SURVEY §2.2).

The reference applies these per-record in driver-side Python while
flattening NetCDF files and API payloads
(``M/app_airflow/app/dags/goes_satellite_etl.py:236-289``,
``real_data_etl.py:131-139``). Here they are pure column expressions so
Catalyst keeps them inside whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def resolve_synonyms(df: DataFrame, synonym_map: Mapping[str, Sequence[str]]) -> DataFrame:
    """Column-synonym resolution (P11): for each canonical name, take the
    first present candidate column; emit 0.0 when none exists (zero-fill
    semantics of ``goes_satellite_etl.py:218-238``).

    ``synonym_map`` maps canonical → candidate names in priority order
    (the canonical name itself may appear among candidates).
    """
    out = df
    for canonical, candidates in synonym_map.items():
        # re-read columns each iteration: a candidate consumed (dropped)
        # by an earlier canonical must not be referenced again
        existing = set(out.columns)
        present = [c for c in candidates if c in existing]
        if not present:
            out = out.withColumn(canonical, F.lit(0.0))
        else:
            expr = F.coalesce(*[F.col(c) for c in present], F.lit(0.0))
            out = out.withColumn(canonical, expr)
            drop = [c for c in present if c != canonical]
            if drop:
                out = out.drop(*drop)
    return out


def zero_fill_nan(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """NaN→0.0 and NULL→0.0 on numeric columns (P7 —
    ``goes_satellite_etl.py:277-289``). Lossy by design in the reference;
    callers that want null preservation simply skip this operator."""
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    }
    # `is None` (not falsy): an explicit empty list means "no columns",
    # matching the int-column branch below
    targets = [c for c in (df.columns if columns is None else columns) if c in numeric]
    out = df
    for c in targets:
        out = out.withColumn(
            c, F.when(F.isnan(F.col(c)) | F.col(c).isNull(), 0.0).otherwise(F.col(c))
        )
    # integer-typed columns can only be NULL, not NaN
    int_targets = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType))
        and (columns is None or f.name in columns)
    ]
    return out.na.fill(0, subset=int_targets) if int_targets else out


def cast_dimensions(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast/select columns to a declared schema (P8), adding missing
    columns as NULL — the dimensionsSpec application step of Druid
    streaming ingestion (``M/druid-goes-satellite-datasource.json:25-76``)."""
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def strip_percent(col: str | Column) -> Column:
    """``change_percent.strip('%')`` (F10 — ``real_data_etl.py:136``);
    stays a string for parity with the stocks schema."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "%", "")


def enrich_provenance(
    df: DataFrame,
    source: str | None = None,
    with_file: bool = False,
    with_extraction_ts: bool = False,
) -> DataFrame:
    """Constant/derived provenance columns (P9): ``source``,
    ``source_file`` (from the scan's input file), ``extraction_timestamp``
    (epoch seconds) — ``real_data_etl.py:49,176-177``."""
    out = df
    if source is not None:
        out = out.withColumn("source", F.lit(source))
    if with_file:
        out = out.withColumn(
            "source_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
    if with_extraction_ts:
        out = out.withColumn(
            "extraction_timestamp", F.unix_timestamp(F.current_timestamp())
        )
    return out


def parse_event_time(col: str | Column, fmt: str = "posix") -> Column:
    """timestampSpec parse (T2): posix epoch-seconds / epoch-millis / ISO
    string → TimestampType (``M/druid-*-datasource.json:21-24``).
    ``auto`` (Druid's default) sniffs per value: all-digit strings are
    epoch seconds (13+ digits: millis), anything else parses as ISO."""
    c = F.col(col) if isinstance(col, str) else col
    if fmt == "posix":
        return F.timestamp_seconds(c.cast("long"))
    if fmt == "millis":
        return F.timestamp_millis(c.cast("long"))
    if fmt == "iso":
        return F.to_timestamp(c)
    if fmt == "auto":
        s = c.cast("string")
        return (
            F.when(
                s.rlike(r"^\d{13,}$"), F.timestamp_millis(s.cast("long"))
            )
            .when(s.rlike(r"^\d+$"), F.timestamp_seconds(s.cast("long")))
            .otherwise(F.to_timestamp(s))
        )
    raise ValueError(f"unsupported timestamp format {fmt!r}")
