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

from decimal import Decimal

from pyspark.sql import DataFrame

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)  # grouped fns ship by value to workers

_QUANTUM = Decimal("0.000001")


def quantize_micros(values):
    """Exact decimal(·,6) quantization of a float64 array, vectorized:
    int64 micros m with m/10⁶ == Decimal(v).quantize(1e-6, HALF_EVEN).

    The hot path multiplies in float128 (64-bit mantissa) and rounds
    half-even with ``rint``; any element whose scaled value sits within
    the float128 error bound of a .5 rounding boundary — or is too
    large for the bound to stay below 1 — falls back to exact
    ``Decimal`` arithmetic. This keeps the corpus-bounded work
    vectorized (no per-row Python loop) while staying bit-identical to
    the pure-Decimal reference, which the tests pin."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64)
    m128 = v.astype(np.float128) * np.float128(10**6)
    m = np.rint(m128).astype(np.int64)
    frac = m128 - np.floor(m128)
    # float128 relative error ~2^-63; use a wide 1e-15 margin, plus an
    # absolute floor for subnormal-scale values
    bound = np.maximum(np.abs(m128) * np.float128(1e-15), np.float128(1e-9))
    slow = (np.abs(frac - 0.5) <= bound) | (np.abs(v) >= 1e12)
    if slow.any():
        for i in np.flatnonzero(slow):
            m[i] = int(
                Decimal(float(v[i])).quantize(_QUANTUM).scaleb(6)
            )
    return m


def exact_decimal_moments(values):
    """(n, s1, s2): count and float64 images of the EXACT sums of the
    decimal(·,6)-quantized values and their squares — the engine's
    cross-engine-reproducible moment device, vectorized. Totals are
    accumulated as arbitrary-precision Python ints (object dtype — a
    C-level loop over machine ints, ~10× per-row Decimal), so neither
    sum can overflow."""
    import numpy as np

    m = quantize_micros(values)
    n = len(m)
    if n and int(np.abs(m).max()) <= 3_000_000_000:
        # common-magnitude fast path (|v| ≤ ~3000): m² fits int64, and
        # splitting each square into 32-bit lanes keeps BOTH lane sums
        # inside int64 for any realistic group size — fully vectorized,
        # no object boxing at all
        s1_int = int(m.sum())
        sq = m * m
        s2_int = (int((sq >> 32).sum()) << 32) + int((sq & 0xFFFFFFFF).sum())
    elif n:
        mo = m.astype(object)
        s1_int = int(mo.sum())
        s2_int = int(np.dot(mo, mo))
    else:
        s1_int = s2_int = 0
    s1 = float(Decimal(s1_int).scaleb(-6))
    s2 = float(Decimal(s2_int).scaleb(-12))
    return n, s1, s2


def normalize_per_group(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "z"
) -> DataFrame:
    """Per-group z-score via Arrow-batched grouped-map: one shuffle on
    the group key, then vectorized pandas per group.

    The group moments (sum, sum-of-squares) accumulate EXACTLY over
    decimal(18,6)-quantized values (:func:`exact_decimal_moments` —
    vectorized, no per-row Python loop), so mean/σ — and every z — are
    bit-reproducible across engines, partitionings, and row orders
    (the same exact-moments device as q_events_anomaly_zscore; a float
    ``Series.std()`` drifts in the last ulp with summation order). A
    degenerate group (n < 2 or σ = 0) normalizes to 0.0."""
    import math

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, {out_col} double"

    def norm(pdf):
        v = pdf[value_col]
        n, s1, s2 = exact_decimal_moments(v.values)
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
