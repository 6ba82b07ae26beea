"""Grouped-map pandas operators (SURVEY §2.10's `applyInPandas` row).

The batch counterpart of the streaming state operators: per-group
vectorized pandas transforms for logic the built-in aggregates can't
express row-wise — here per-group z-score normalization (the standard
feature-scaling step before embedding/model stages) and per-group
winsorization. Each group must fit one executor's memory — the right
contract for normalization groups (labels, event types), never for
whole-table ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)  # grouped fns ship by value to workers


def normalize_per_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score via Arrow-batched grouped-map: one shuffle on
    the group key, then vectorized pandas per group."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, {out_col} double"

    def norm(pdf):
        v = pdf[value_col]
        sd = v.std()
        pdf[out_col] = (v - v.mean()) / sd if sd and sd > 0 else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(norm, schema=schema)


def winsorize_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
) -> DataFrame:
    """Clamp each group's values to its [lower_q, upper_q] quantiles —
    the outlier-capping step of a quality-filter pipeline."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)

    def wins(pdf):
        lo, hi = pdf[value_col].quantile([lower_q, upper_q])
        pdf[value_col] = pdf[value_col].clip(lo, hi)
        return pdf

    return df.groupBy(group_col).applyInPandas(wins, schema=fields)
