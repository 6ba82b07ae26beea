"""GOES storage-growth metrics (SURVEY §2.4 A7).

The reference's ``calculate_storage_metrics``
(``goes_satellite_etl.py:415-489``) sums processed-file sizes, averages
them, and projects linear growth at the observed cadence (144 files/day:
sums :439-443, projections :459-462), emitting one record to the
``goes_storage_metrics`` datasource
(``M/druid-goes-storage-metrics.json:25-59``). Engine version computes
the same quantities from the ingested GOES table itself — one aggregate
over the distinct (source_file, file_size_mb) pairs, no driver-side file
listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FILES_PER_DAY = 144  # observed cadence: one file / 10 min (README.md:201)


def storage_metrics_from_goes(
    goes: DataFrame, extraction_epoch: int | None = None
) -> DataFrame:
    """One metrics record (the goes_storage_metrics row shape) from an
    ingested GOES table: current files/MB plus daily/weekly/monthly
    linear projections at the observed file cadence."""
    files = goes.select("source_file", "file_size_mb").distinct()
    agg = files.agg(
        F.count(F.lit(1)).alias("current_files_processed"),
        F.round(F.sum(F.col("file_size_mb").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("current_storage_mb"),
        F.avg("file_size_mb").alias("avg_file_mb"),
    )
    daily = F.round(F.col("avg_file_mb") * FILES_PER_DAY, 2)
    ts = (
        F.lit(extraction_epoch).cast("long")
        if extraction_epoch is not None
        else F.unix_timestamp(F.current_timestamp())
    )
    return agg.select(
        ts.alias("timestamp"),
        "current_files_processed",
        "current_storage_mb",
        daily.alias("projected_daily_growth_mb"),
        F.round(daily * 7, 2).alias("projected_weekly_growth_mb"),
        F.round(daily * 30, 2).alias("projected_monthly_growth_mb"),
        F.round(daily * 7 / 1024, 4).alias("projected_weekly_growth_gb"),
        F.round(daily * 30 / 1024, 4).alias("projected_monthly_growth_gb"),
    )
