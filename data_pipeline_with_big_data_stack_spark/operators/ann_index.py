"""Materialized IVF index for ANN search (the at-scale shape).

The registry query ``q_ann_ivf_topk`` assigns cells inline — correct,
but at 100 TB the corpus-side assignment is the dominant linear cost
and must be paid ONCE, not per probe batch. The production pipeline:

    build_ivf_index(vecs, path)  →  assignments written PARTITIONED BY
                                     cell_id + codebook sidecar  (one
                                     broadcast-argmin pass, one write)
    search_ivf_index(probes)     →  rank probe cells against the tiny
                                     codebook, then read ONLY the
                                     nprobe partitions — the scan's
                                     partition filter prunes the other
                                     K-nprobe cells entirely

The probe-side cell list is collected to build the pruning predicate —
a deliberate, documented driver-side step at METADATA scale (nprobe ×
|probe batch| ints, like ``catalog.upstream_of``); the corpus is never
collected and never re-assigned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators.kmeans import _assign, _sqdist


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def build_ivf_index(
    vecs: DataFrame, path: str, codebook: DataFrame, id_col: str = "vec_id"
) -> None:
    """``vecs(id, emb, ...)`` + 1-row ``codebook(cb)`` → parquet at
    ``path`` partitioned by ``cluster_id`` (+ ``_codebook`` sidecar).
    One broadcast map-side argmin pass over the corpus, zero shuffle
    before the partitioned write."""
    assigned = _assign(vecs, codebook)
    (
        assigned.write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(path)
    )
    codebook.select(F.explode("cb").alias("c")).select(
        F.col("c.cell_id").alias("cell_id"), F.col("c.c_emb").alias("c_emb")
    ).write.mode("overwrite").parquet(path + "_codebook")


def search_ivf_index(
    spark: SparkSession,
    path: str,
    probes: DataFrame,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """``probes(q_id, q_emb)`` → top-``k`` cosine matches per probe,
    reading only each probe's ``nprobe`` nearest index partitions."""
    cb_tbl = spark.read.parquet(path + "_codebook")
    cb = cb_tbl.agg(
        F.collect_list(F.struct("cell_id", "c_emb")).alias("cb")
    )
    ranked = F.array_sort(
        F.transform(
            F.col("cb"),
            lambda c: F.struct(
                _sqdist(F.col("q_emb"), c["c_emb"]).alias("dist"),
                c["cell_id"].alias("cell_id"),
            ),
        )
    )
    probe_cells = (
        probes.join(F.broadcast(cb))
        .select(
            "q_id",
            "q_emb",
            F.explode(F.slice(ranked, 1, nprobe)).alias("cell"),
        )
        .select("q_id", "q_emb", F.col("cell")["cell_id"].alias("cluster_id"))
    )
    # metadata-scale collect: nprobe cells per probe → partition-pruning
    # predicate for the index scan
    cells = sorted(
        {r.cluster_id for r in probe_cells.select("cluster_id").distinct().collect()}
    )
    index = spark.read.parquet(path).filter(F.col("cluster_id").isin(cells))
    cand = (
        index.join(F.broadcast(probe_cells), "cluster_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            id_col,
            "cluster_id",
            F.round(
                _dot(F.col("q_emb"), F.col("emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("emb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
