"""Metadata catalog (SURVEY §2.1 S20).

The reference registers Druid tables, Kafka topics, pipelines, and
dashboards in OpenMetadata (`M/app_airflow/app/dags/metadata_ingestion.py:19-101`)
with include-pattern topic filters
(`M/app_openmetadata/kafka-metadata-ingest.json:15-19`). The Spark-native
equivalent is the session catalog (metastore): ingested tables are
registered with ``saveAsTable``/``createTable`` + COMMENT metadata, and
lineage is recorded as an engine-owned edges table — queryable with the
same SQL surface as any other table.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    kind: str  # table | topic | pipeline | dashboard
    comment: str = ""


def register_parquet_table(
    spark: SparkSession, name: str, path: str, comment: str = ""
) -> None:
    """Register an ingested parquet table in the metastore so the SQL
    surface (and any BI tool on the thrift server) sees it by name."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.catalog.createTable(name, path=path, source="parquet")
    if comment:
        try:
            spark.sql(f"COMMENT ON TABLE {name} IS '{comment}'")
        except Exception:  # pragma: no cover - dialect without COMMENT ON
            pass
    try:
        spark.sql(f"MSCK REPAIR TABLE {name}")
    except Exception:
        pass


def filter_topics(topics: list[str], include_patterns: list[str]) -> list[str]:
    """The OpenMetadata topic include-filter (S20): keep topics matching
    any include glob (`kafka-metadata-ingest.json:15-19` lists the seven
    pipeline topics explicitly)."""
    return sorted(
        {t for t in topics if any(fnmatch.fnmatch(t, p) for p in include_patterns)}
    )


def list_tables(spark: SparkSession, pattern: str = "*") -> list[CatalogEntry]:
    return [
        CatalogEntry(t.name, "table", t.description or "")
        for t in spark.catalog.listTables()
        if fnmatch.fnmatch(t.name, pattern)
    ]


# --------------------------------------------------------------------------
# Lineage: engine-recorded (source → target, via) edges — the Spark twin
# of OpenMetadata's pipeline lineage registration.
# --------------------------------------------------------------------------
_LINEAGE_SCHEMA = "src string, dst string, via string, recorded_at timestamp"


def lineage_edges(spark: SparkSession, edges: list[tuple[str, str, str]]) -> DataFrame:
    from pyspark.sql import functions as F

    df = spark.createDataFrame(edges, ["src", "dst", "via"])
    return df.withColumn("recorded_at", F.current_timestamp())


def record_lineage(
    spark: SparkSession,
    edges: list[tuple[str, str, str]],
    table: str = "engine_lineage",
) -> None:
    lineage_edges(spark, edges).write.mode("append").saveAsTable(table)


def upstream_of(spark: SparkSession, target: str, table: str = "engine_lineage") -> list[str]:
    """Transitive upstream closure of a catalog entity, computed with an
    iterative frontier expansion (lineage graphs are small — driver-side
    loop over a cached edges table is appropriate here, unlike data ops)."""
    edges = [(r["src"], r["dst"]) for r in spark.table(table).select("src", "dst").distinct().collect()]
    seen: set[str] = set()
    frontier = {target}
    while frontier:
        nxt = {s for s, d in edges if d in frontier and s not in seen}
        seen |= nxt
        frontier = nxt
    return sorted(seen)
