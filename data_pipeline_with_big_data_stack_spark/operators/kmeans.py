"""Distributed Lloyd's k-means over an embedding column.

The scale-correct Spark shape for each iteration:

- **assign**: the K-row codebook rides along as ONE broadcast array
  column; nearest-centroid is a map-side argmin projection (zero corpus
  shuffle — same pattern as the IVF cell assignment in
  ``queries/vector.py``).
- **update**: ``posexplode`` the assigned vectors and aggregate
  per (cluster, dimension). The groupBy keys have at most K×dim
  distinct values, so map-side partial aggregation compresses each
  task's output to ≤ K×dim rows before the one shuffle — the classic
  combiner-friendly centroid update.

Determinism (the oracle gate is exact): init centroids are a
deterministic id-based sample, per-dimension sums accumulate
``decimal(38,14)`` (summation-order independent, matching the engine's
money-aggregate policy), and argmin ties break on cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 24 integral digits: decimal(28,14) overflowed (ANSI throws) on
# large-magnitude coordinates — a 1e18-scale embedding is representable
# in float32 and must not kill the training job. 38 is the engine max
# in BOTH Spark and DuckDB; coordinates beyond ~1e24 still raise, a
# documented domain bound (hostile-embeddings robustness suite).
_DEC = "decimal(38,14)"


def _sqdist(a, b):
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def _assign(vecs: DataFrame, codebook: DataFrame) -> DataFrame:
    """vecs(vec_id, emb) × codebook(1 row: cb array<struct<cell_id,c_emb>>)
    → vecs + cluster_id, by broadcast map-side argmin."""
    ranked = F.array_sort(
        F.transform(
            F.col("cb"),
            lambda c: F.struct(
                _sqdist(F.col("emb"), c["c_emb"]).alias("dist"),
                c["cell_id"].alias("cell_id"),
            ),
        )
    )
    return (
        vecs.join(F.broadcast(codebook))
        .withColumn("cluster_id", F.element_at(ranked, 1)["cell_id"])
        .drop("cb")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Assigned vectors → new 1-row codebook of per-cluster means."""
    ex = assigned.select(
        "cluster_id", F.posexplode("emb").alias("pos", "x")
    )
    dims = (
        ex.groupBy("cluster_id", "pos")
        .agg(
            F.sum(F.col("x").cast(_DEC)).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "cluster_id",
            "pos",
            (F.col("s").cast("double") / F.col("n")).alias("m"),
        )
    )
    cents = dims.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("c_emb")
    )
    return cents.agg(
        F.collect_list(
            F.struct(F.col("cluster_id").alias("cell_id"), "c_emb")
        ).alias("cb")
    )


def lloyd_kmeans(
    vecs: DataFrame, init_codebook: DataFrame, iters: int = 2
) -> DataFrame:
    """``iters`` rounds of assign+update, then a final assignment.
    Returns vecs + ``cluster_id`` against the trained codebook. The
    whole loop is a single lazy plan — no driver-side collect; the
    codebook stays a broadcast 1-row aggregate between rounds."""
    cb = init_codebook
    for _ in range(iters):
        cb = _update(_assign(vecs, cb))
    return _assign(vecs, cb), cb


def _fused_round(vecs: DataFrame, combined: DataFrame, slices) -> DataFrame:
    """One FUSED Lloyd round over N codebooks trained on column slices
    of the same ``emb`` column: a single corpus scan assigns every
    codebook (all N ride along in ONE broadcast 1-row frame), the
    per-codebook (cluster, dimension) partials share a single shuffle
    keyed ``(cbk, cluster_id, pos)``, and one aggregation rebuilds the
    combined frame. ``slices[i]`` is ``(offset, length)`` in F.slice's
    1-based convention, or ``(None, None)`` for the full vector.

    Per codebook the result is BIT-IDENTICAL to a separate
    :func:`_assign` + :func:`_update` over the sliced corpus: the argmin
    ranks the same (dist, cell_id) structs, and the decimal sums group
    on disjoint ``cbk`` keys with the same addends — decimal addition is
    order-independent, so fusing changes no value
    (tests/test_kmeans_fused.py pins this on the real fixture)."""

    def _entry(i: int):
        off, ln = slices[i]
        sub = F.col("emb") if off is None else F.slice("emb", off, ln)
        ranked = F.array_sort(
            F.transform(
                F.col(f"cb_{i}"),
                lambda c: F.struct(
                    _sqdist(sub, c["c_emb"]).alias("dist"),
                    c["cell_id"].alias("cell_id"),
                ),
            )
        )
        return F.struct(
            F.lit(i).alias("cbk"),
            F.element_at(ranked, 1)["cell_id"].alias("cluster_id"),
            sub.alias("sub"),
        )

    n = len(slices)
    # explode the N (codebook, cluster, sub-vector) entries inline in a
    # select (never via an aliased withColumn — the generator-pitfall
    # rule), then posexplode the sub-vector ATTRIBUTE: the argmin exprs
    # evaluate once per row in the first Generate, and the second
    # generator's implicit size filter touches only a plain column
    ex = vecs.join(F.broadcast(combined)).select(
        F.explode(F.array(*[_entry(i) for i in range(n)])).alias("g")
    ).select(
        F.col("g.cbk").alias("cbk"),
        F.col("g.cluster_id").alias("cluster_id"),
        F.posexplode("g.sub").alias("pos", "x"),
    )
    dims = (
        ex.groupBy("cbk", "cluster_id", "pos")
        .agg(
            F.sum(F.col("x").cast(_DEC)).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "cbk",
            "cluster_id",
            "pos",
            (F.col("s").cast("double") / F.col("n")).alias("m"),
        )
    )
    cents = dims.groupBy("cbk", "cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("c_emb")
    )
    return cents.agg(
        *[
            F.collect_list(
                F.when(
                    F.col("cbk") == i,
                    F.struct(F.col("cluster_id").alias("cell_id"), F.col("c_emb")),
                )
            ).alias(f"cb_{i}")
            for i in range(n)
        ]
    )


def lloyd_kmeans_multi(
    vecs: DataFrame, init_combined: DataFrame, slices, iters: int = 2
) -> DataFrame:
    """Train N codebooks over column slices of ONE embedding column in
    fused passes (guide §1.2/§2.4: the N independent lloyd chains each
    map-scanned the corpus per round and ran as separate driver
    actions; fused, every round is one scan and one partial-agg
    shuffle for all N, and the whole training is ONE action when the
    caller materializes it). ``init_combined`` is a 1-row frame with
    columns ``cb_0..cb_{N-1}`` (each the usual array<struct<cell_id,
    c_emb>>); returns the same shape after ``iters`` rounds. Values are
    bit-identical per codebook to :func:`lloyd_kmeans` over each slice
    — see :func:`_fused_round`."""
    cb = init_combined
    for _ in range(iters):
        cb = _fused_round(vecs, cb, slices)
    return cb
