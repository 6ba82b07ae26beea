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
    the group key, then vectorized pandas per group.

    The group moments (sum, sum-of-squares) accumulate EXACTLY over
    decimal(18,6)-quantized values, so mean/σ — and every z — are
    bit-reproducible across engines, partitionings, and row orders
    (the same exact-moments device as q_events_anomaly_zscore; a float
    ``Series.std()`` drifts in the last ulp with summation order). A
    degenerate group (n < 2 or σ = 0) normalizes to 0.0."""
    import math
    from decimal import Decimal

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, {out_col} double"
    quantum = Decimal("0.000001")

    def norm(pdf):
        v = pdf[value_col]
        n = len(v)
        dv = [Decimal(float(x)).quantize(quantum) for x in v]
        s1 = float(sum(dv))
        s2 = float(sum(d * d for d in dv))
        mean = s1 / n
        sd = (
            math.sqrt(max((s2 - s1 * s1 / n) / (n - 1), 0.0)) if n > 1 else 0.0
        )
        pdf[out_col] = (v - mean) / sd if sd > 0 else 0.0
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
    the outlier-capping step of a quality-filter pipeline.

    Quantiles use the NEAREST-RANK (inverse-CDF) definition: the bound
    at quantile q is the actual data value at sorted rank
    ``max(1, ceil(q·n))``, with the rank arithmetic done in exact
    decimal. Interpolated quantiles would make the bounds synthetic
    floats whose last ulp depends on the engine's interpolation
    expression; rank-selected bounds are values already in the data, so
    the clamp is bit-reproducible across engines — SQL oracles mirror
    it with an explicit ``row_number = ceil(q * n)`` pick."""
    import math
    from decimal import Decimal

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    lo_q, hi_q = Decimal(str(lower_q)), Decimal(str(upper_q))

    def wins(pdf):
        import numpy as np

        n = len(pdf)
        vs = np.sort(pdf[value_col].values)
        lo = float(vs[max(1, math.ceil(lo_q * n)) - 1])
        hi = float(vs[max(1, math.ceil(hi_q * n)) - 1])
        pdf[value_col] = pdf[value_col].clip(lo, hi)
        return pdf

    return df.groupBy(group_col).applyInPandas(wins, schema=fields)
