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
