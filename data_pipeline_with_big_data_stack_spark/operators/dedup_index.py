"""Materialized fuzzy-dedup index (the at-scale shape).

The registry queries (`q_dedup_minhash_lsh`, `q_dedup_simhash`) compute
shingles + signatures inline — correct, but at 100 TB the signature
computation is the dominant linear cost and must not be re-evaluated per
query branch or per run. The production pipeline is:

    build_minhash_index(docs)  →  signatures+bands table   (ONE pass,
                                   written bucketed by band key)
    candidate_pairs(index)     →  pair explode inside buckets
    verify_jaccard(pairs,docs) →  exact verify on candidates only

The index write is bucketed by (band, band_key) so the candidate-pair
stage reads bucket-to-bucket with no shuffle at all, and incremental
corpora append new signatures without touching old ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.queries.textops import _SHINGLES_SPARK

_SALTS = ("s0", "s1", "s2", "s3", "s4", "s5")


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """One row per doc: k=6 salted-md5 minhash signature columns plus the
    3 band keys (2 rows/band). Single pass, no shuffle. NULL text
    coalesces to '' BEFORE shingling, exactly like the inline batch
    family (`queries/textops._shingled`) — without it a NULL document's
    signatures diverge between the index path and the batch oracles."""
    d = docs.withColumn(
        "words", F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    ).withColumn("sh", F.expr(_SHINGLES_SPARK))

    def mh(salt: str):
        return F.array_min(F.transform("sh", lambda s: F.md5(F.concat(F.lit(salt), s))))

    sig = d.select(id_col, *[mh(s).alias(f"mh{i}") for i, s in enumerate(_SALTS)])
    return sig.select(
        id_col,
        *[f"mh{i}" for i in range(6)],
        F.md5(F.concat("mh0", "mh1")).alias("band0"),
        F.md5(F.concat("mh2", "mh3")).alias("band1"),
        F.md5(F.concat("mh4", "mh5")).alias("band2"),
    )


def build_minhash_index(
    docs: DataFrame,
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Materialize the signature index as a metastore table bucketed by
    band0 — signatures are computed exactly once for the corpus; the
    candidate stage and any later re-run read the index, never the raw
    text. Incremental corpora use mode='append'."""
    sig = minhash_signatures(docs, text_col, id_col)
    (
        sig.write.mode(mode)
        .bucketBy(n_buckets, "band0")
        .sortBy("band0")
        .format("parquet")
        .saveAsTable(table)
    )


def candidate_pairs(
    index: DataFrame, id_col: str = "doc_id", max_bucket: int | None = None
) -> DataFrame:
    """LSH candidate pairs from a signature index: explode the 3 band
    keys, group docs per bucket, emit i<j pairs inside buckets — one
    shuffle on the band key (zero if the index is bucketed on it).
    Buckets are capped at the batch family's ``_LSH_MAX_BUCKET`` ceiling
    (lowest ids win — same rule the inline queries' oracles replay), so
    a degenerate mega-bucket (boilerplate/empty documents hashing
    identically) bounds per-task memory instead of materializing an
    unbounded collect_list."""
    from data_pipeline_with_big_data_stack_spark.operators.bucketing import capped_buckets
    from data_pipeline_with_big_data_stack_spark.queries.textops import _LSH_MAX_BUCKET

    if max_bucket is None:
        max_bucket = _LSH_MAX_BUCKET
    bands = index.select(
        id_col,
        F.posexplode(F.array("band0", "band1", "band2")).alias("band", "band_key"),
    )
    # capped_buckets already drops <2-member buckets
    buckets = capped_buckets(
        bands, ["band", "band_key"], id_col, F.col(id_col), max_bucket
    ).withColumnRenamed("ids", "docs")
    pairs = buckets.select(
        F.explode(
            F.expr(
                """
                flatten(transform(docs, (x, i) ->
                    transform(slice(docs, i + 2, size(docs)), y ->
                        struct(x AS doc_a, y AS doc_b))))
                """
            )
        ).alias("p")
    )
    return pairs.select("p.doc_a", "p.doc_b").distinct()


def verify_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact trigram-set Jaccard on candidate pairs only. The joins move
    RAW TEXT and shingling happens AFTER them, so the expensive set
    construction runs on candidate-scale rows — shingling the corpus
    before the join would evaluate it for every document per call, and
    pre-pruning via a semi-join would add a corpus shuffle instead
    (measured 1.4× slower end-to-end). The join strategy is AQE's
    call: when the pair list is genuinely small it broadcasts and the
    corpus never shuffles; no hint, since dup candidates are
    corpus-proportional at web dup rates."""
    t = docs.select(F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias("__t"))
    a = t.select(F.col(id_col).alias("doc_a"), F.col("__t").alias("__ta"))
    b = t.select(F.col(id_col).alias("doc_b"), F.col("__t").alias("__tb"))
    joined = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("words", F.split("__ta", " "))
        .withColumn("sh_a", F.expr(_SHINGLES_SPARK))
        .withColumn("words", F.split("__tb", " "))
        .withColumn("sh_b", F.expr(_SHINGLES_SPARK))
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union
    return (
        joined.withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
