"""Count-Min Sketch (Cormode & Muthukrishnan 2005) over a key column.

Completes the engine's sketch family next to HLL / Theta / KLL /
Misra-Gries: MG answers "which items are frequent"; CMS answers "how
often does THIS item occur" for arbitrary point queries from fixed
memory — the per-item counter Druid's datasketches expose for
frequency estimation under memory bounds.

Deterministic by construction: row-``i``'s hash is the engine's
standard md5 device over ``"r{i}:" || key`` (hex→long, mod width), so
the d×w counter table — and therefore every estimate — is a pure
function of the data. That is what lets the registry query carry a
FULL DuckDB value oracle (the oracle replays the identical hashing,
counting, and min-over-rows), unlike RNG-seeded sketch libraries.

Scale shape (100 TB):
- **build**: one combiner-friendly groupBy over d rows per input row,
  keyed on (row, bucket) — the output is FIXED at d×w rows no matter
  the corpus size, so map-side partial aggregation compresses each
  task to ≤ d×w rows before the single shuffle.
- **merge**: counters are linear — summing per-source / per-batch
  sketches equals the sketch of the union (pinned in
  tests/test_sketches.py), the same mergeability contract as the HLL
  and Theta queries.
- **estimate**: ``est(x) = min_i counter[i][h_i(x)]`` via a broadcast
  of the d×w sketch (constant-size at any scale); always ≥ the true
  count, and ≤ true + e·N/w per row with probability ≥ 1 − e^-d under
  the classic analysis (empirical bounds pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key_col, row: int, width: int):
    """Deterministic row-``row`` bucket: md5("r{row}:" || key) hex→long
    mod width — replayed in DuckDB as
    ``('0x' || substr(md5('r' || row || ':' || item), 1, 8))::BIGINT
    % width`` (8 hex digits < 2^32, so the value is non-negative in
    both engines)."""
    h = F.md5(F.concat(F.lit(f"r{row}:"), key_col))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast(
        "int"
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """``df[key_col]`` (cast to string) → counter table
    ``(row int, bucket int, cnt long)`` of exactly the non-zero cells
    of the d×w sketch. With ``weight_col``, counters accumulate weight
    sums instead of row counts."""
    key = F.col(key_col).cast("string")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    cells = df.select(
        F.posexplode(
            F.array(*[_bucket(key, i, width) for i in range(depth)])
        ).alias("row", "bucket"),
        w.alias("__w"),
    )
    # geometry rides with the sketch (constant literal columns) so
    # merge/estimate can verify it instead of trusting call-site
    # constants — a silent depth/width mismatch returns wrong (not
    # merely over-) estimates
    return (
        cells.groupBy("row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
        .withColumn("d", F.lit(int(depth)))
        .withColumn("w", F.lit(int(width)))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum counters cell-wise — sketch(A) + sketch(B) == sketch(A ∪ B)
    exactly (counters are linear). Grouping keeps the (d, w) geometry
    columns: merging sketches of differing geometry produces mixed
    (d, w) groups, which :func:`cms_estimate`'s in-plan guard rejects
    instead of silently summing incompatible counter tables."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket", "d", "w").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """``probes[key_col]`` → ``(key_col, est_count)`` with
    ``est = min over rows of the probed cell`` (absent cell = 0). The
    sketch rides along as a broadcast (d×w rows, constant at any
    scale); probes are never shuffled.

    Geometry guard: the sketch carries its build-time (d, w) as
    constant columns; any matched cell whose geometry differs from the
    ``depth``/``width`` this call probes with raises in-plan
    (``raise_error`` inside the min aggregate, so it cannot be pruned
    away) instead of silently returning wrong estimates."""
    key = F.col(key_col).cast("string")
    probed = probes.select(
        key_col,
        F.posexplode(
            F.array(*[_bucket(key, i, width) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    joined = probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    bad = F.col("cnt").isNotNull() & (
        (F.col("d") != F.lit(int(depth))) | (F.col("w") != F.lit(int(width)))
    )
    cell = F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(
                    f"cms_estimate: probed with depth={depth} width={width} "
                    "but sketch was built with d="
                ),
                F.col("d").cast("string"),
                F.lit(" w="),
                F.col("w").cast("string"),
            )
        ).cast("long"),
    ).otherwise(F.coalesce("cnt", F.lit(0)))
    return (
        joined.groupBy(key_col)
        .agg(F.min(cell).cast("long").alias("est_count"))
    )
