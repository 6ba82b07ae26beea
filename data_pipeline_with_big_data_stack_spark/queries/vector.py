"""Similarity-search surface over the ``embeddings`` table.

ANN over an ``array<float>`` embedding column: brute-force cosine top-k as
the correctness baseline, and a sign-bit LSH-bucketed variant as the scale
path (bucketed search touches only same-bucket candidates — the shuffle is
on the bucket key, not a full cross join).

All vector math is done in double precision on both engines and similarity
is rounded before ranking, so cross-engine summation-order noise cannot
reorder the top-k. Dot products stay JVM-side via higher-order functions
(``zip_with`` + ``aggregate``) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.session import prepare_session
from data_pipeline_with_big_data_stack_spark.tables import load_table

N_QUERY_VECS = 5  # vec_id < 5 are the probe vectors
TOP_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, "embeddings").withColumn(
        "emb", F.col("embedding").cast("array<double>")
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


# --------------------------------------------------------------------------
# Per-label embedding stats (norms) — sanity surface for the vector column.
# --------------------------------------------------------------------------
@query(
    "q_embed_label_stats",
    oracle="""
    WITH t AS (
      SELECT label,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings)
    SELECT label, count(*) AS n,
           round(avg(nrm), 4) AS avg_norm,
           round(min(nrm), 4) AS min_norm,
           round(max(nrm), 4) AS max_norm
    FROM t GROUP BY label
    """,
)
def q_embed_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    t = e.select("label", _norm(F.col("emb")).alias("nrm"))
    return t.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("nrm"), 4).alias("avg_norm"),
        F.round(F.min("nrm"), 4).alias("min_norm"),
        F.round(F.max("nrm"), 4).alias("max_norm"),
    )


# --------------------------------------------------------------------------
# Brute-force cosine top-k: N probe vectors against the full corpus.
# The probe side is broadcast; the corpus never shuffles. At 100 TB the
# identical plan holds for any probe batch that fits in a broadcast.
# --------------------------------------------------------------------------
_COSINE_ORACLE = f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings
      WHERE vec_id < {N_QUERY_VECS}),
    c AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
    sims AS (
      SELECT q.q_id, c.vec_id, c.label,
             round(list_dot_product(q.q_emb, c.emb)
                   / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                      * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cosine
      FROM q CROSS JOIN c
      WHERE c.vec_id != q.q_id)
    SELECT q_id, vec_id, label, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, vec_id) AS rn
      FROM sims)
    WHERE rn <= {TOP_K}
"""


@query("q_ann_cosine_topk", oracle=_COSINE_ORACLE)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    c = e.select("vec_id", "label", "emb")
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "label",
            F.round(
                _dot(F.col("q_emb"), F.col("emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("emb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", "label", "cosine")
    )


# --------------------------------------------------------------------------
# Sign-bit LSH buckets (axis-aligned hyperplane family): bucket id from the
# signs of the first 4 components. The scale path for ANN — candidates are
# only same-bucket vectors, so the join shuffles on a small int key.
# --------------------------------------------------------------------------
_N_BITS = 4
_BUCKET_SQL = " + ".join(
    f"(CASE WHEN emb[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(_N_BITS)
)

_LSH_ORACLE = f"""
    WITH t AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings),
    b AS (
      SELECT vec_id, label, emb, {_BUCKET_SQL} AS bucket FROM t),
    q AS (SELECT vec_id AS q_id, emb AS q_emb, bucket FROM b
          WHERE vec_id < {N_QUERY_VECS}),
    sims AS (
      SELECT q.q_id, b.vec_id, b.bucket,
             round(list_dot_product(q.q_emb, b.emb)
                   / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                      * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cosine
      FROM q JOIN b ON q.bucket = b.bucket AND b.vec_id != q.q_id)
    SELECT q_id, vec_id, bucket, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, vec_id) AS rn
      FROM sims)
    WHERE rn <= {TOP_K}
"""


@query("q_ann_lsh_bucketed_topk", oracle=_LSH_ORACLE)
def q_ann_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    bucket = None
    for i in range(_N_BITS):
        bit = F.when(F.element_at("emb", i + 1) >= 0, F.lit(1 << i)).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    b = e.select("vec_id", "label", "emb", bucket.alias("bucket"))
    q = b.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"), "bucket"
    )
    sims = (
        b.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "bucket",
            F.round(
                _dot(F.col("q_emb"), F.col("emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("emb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", "bucket", "cosine")
    )


# --------------------------------------------------------------------------
# Embedding near-duplicate detection: cosine >= threshold over LSH-blocked
# pairs (embedding-cosine near-dup from the dedup suite).
# --------------------------------------------------------------------------
_NEARDUP_ORACLE = f"""
    WITH t AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    b AS (SELECT vec_id, emb, {_BUCKET_SQL} AS bucket FROM t)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.emb, b.emb)
                 / (sqrt(list_dot_product(a.emb, a.emb))
                    * sqrt(list_dot_product(b.emb, b.emb))), 6) AS cosine
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.emb, b.emb)
          / (sqrt(list_dot_product(a.emb, a.emb))
             * sqrt(list_dot_product(b.emb, b.emb))) >= 0.95
"""


@query("q_embed_near_duplicates", oracle=_NEARDUP_ORACLE)
def q_embed_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    bucket = None
    for i in range(_N_BITS):
        bit = F.when(F.element_at("emb", i + 1) >= 0, F.lit(1 << i)).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    b = e.select("vec_id", "emb", bucket.alias("bucket"))
    a = b.alias("a")
    bb = b.alias("b")
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (
        _norm(F.col("a.emb")) * _norm(F.col("b.emb"))
    )
    return (
        a.join(
            bb,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= 0.95)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
    )


# --------------------------------------------------------------------------
# IVF-style ANN: coarse quantization into K cells (centroids = a fixed,
# deterministic sample of the corpus — vec_id multiples of N/K — playing
# the role of a trained codebook), probe searches its nprobe nearest
# cells only. The inverted-file pattern at scale: the corpus is
# partitioned by cell_id once at index build; a probe touches
# nprobe/K of the data, and the cell assignment join broadcasts only
# the K-row codebook.
# --------------------------------------------------------------------------
_K_CELLS = 8
_NPROBE = 2


def _ivf_cells_duck() -> str:
    return f"""
    cents AS (
      SELECT (vec_id / 100)::BIGINT AS cell_id, embedding::DOUBLE[] AS c_emb
      FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < {_K_CELLS * 100}),
    assigned AS (
      SELECT t.vec_id, t.label, t.emb, a.cell_id
      FROM (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings) t
      CROSS JOIN LATERAL (
        SELECT cell_id FROM cents
        ORDER BY list_distance(t.emb, c_emb), cell_id LIMIT 1) a),
    probe_cells AS (
      SELECT q.vec_id AS q_id, q.emb AS q_emb, c.cell_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY list_distance(q.emb, c.c_emb), c.cell_id) AS rk
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
            WHERE vec_id < {N_QUERY_VECS}) q CROSS JOIN cents c)
    """


_IVF_ORACLE = f"""
    WITH {_ivf_cells_duck()}
    , cand AS (
      SELECT p.q_id, a.vec_id, a.cell_id,
             round(list_dot_product(p.q_emb, a.emb)
                   / (sqrt(list_dot_product(p.q_emb, p.q_emb))
                      * sqrt(list_dot_product(a.emb, a.emb))), 6) AS cosine
      FROM probe_cells p JOIN assigned a ON p.cell_id = a.cell_id
      WHERE p.rk <= {_NPROBE} AND a.vec_id != p.q_id)
    SELECT q_id, vec_id, cell_id, cosine FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, vec_id) AS rn
      FROM cand)
    WHERE rn <= {TOP_K}
"""


@query("q_ann_ivf_topk", oracle=_IVF_ORACLE)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    cents = (
        e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < _K_CELLS * 100))
        .select(
            (F.col("vec_id") / 100).cast("long").alias("cell_id"),
            F.col("emb").alias("c_emb"),
        )
    )

    def sqdist(a, b):
        d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
        return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)

    # assign: broadcast the K-row codebook, keep nearest cell per vector
    w_assign = W.partitionBy("vec_id").orderBy("dist", "cell_id")
    assigned = (
        e.select("vec_id", "label", "emb")
        .join(F.broadcast(cents))
        .withColumn("dist", F.sqrt(sqdist(F.col("emb"), F.col("c_emb"))))
        .withColumn("rk", F.row_number().over(w_assign))
        .filter(F.col("rk") == 1)
        .select("vec_id", "label", "emb", "cell_id")
    )
    # probes: nprobe nearest cells each
    probes = (
        e.filter(F.col("vec_id") < N_QUERY_VECS)
        .select(F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"))
        .join(F.broadcast(cents))
        .withColumn("dist", F.sqrt(sqdist(F.col("q_emb"), F.col("c_emb"))))
        .withColumn(
            "rk",
            F.row_number().over(W.partitionBy("q_id").orderBy("dist", "cell_id")),
        )
        .filter(F.col("rk") <= _NPROBE)
        .select("q_id", "q_emb", "cell_id")
    )
    cand = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            "cell_id",
            F.round(
                _dot(F.col("q_emb"), F.col("emb"))
                / (_norm(F.col("q_emb")) * _norm(F.col("emb"))),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", "cell_id", "cosine")
    )
