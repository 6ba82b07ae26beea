"""Training-data curation operators over the ``documents`` corpus.

The reference stack stops at ingest + dashboard aggregation
(GOES_PIPELINE_REPORT.md:275-289 profiles source tables); a 100 TB
training-data pipeline additionally needs corpus CURATION: repetition/
quality filtering, PII redaction, deterministic split assignment,
chunking for fixed-context training, benchmark-contamination checks,
and duplicate CLUSTERING (candidate pairs alone don't dedup a corpus —
you keep one canonical doc per connected component).

Every operator here is linear in corpus size with at most one hash
shuffle on ``doc_id``-sized keys, except the cluster query whose
iterative joins run on the (tiny, LSH-filtered) candidate-pair edge
set — never on the corpus.

Quality heuristics follow the publicly documented Gopher rules (Rae et
al. 2021, "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher", App. A1.1): mean word length in [3, 10], duplicate
word/n-gram fractions, top-bigram fraction <= 0.18.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.session import materialize

from data_pipeline_with_big_data_stack_spark.operators.rollup_maintenance import (
    round4_ratio as _r4,
)
from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.queries.textops import _docs
from data_pipeline_with_big_data_stack_spark.queries.textops import (
    _LSH_DUCK,
    _SHINGLES_DUCK,
    _lsh_bands,
    _lsh_candidate_pairs,
    _shingled,
)

# --------------------------------------------------------------------------
# Gopher-style repetition / quality signals, per document.
# --------------------------------------------------------------------------


@query(
    "q_doc_gopher_quality",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    m AS (
      SELECT doc_id,
             list_sum([len(x) for x in words])::HUGEINT AS ls,
             len(words)::HUGEINT                        AS n,
             len(list_distinct(words))::HUGEINT         AS nd,
             CASE WHEN len(words) >= 3 THEN
               len(list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                                  for i in range(1, len(words) - 1)]))::HUGEINT
             ELSE 0 END AS ndt
      FROM w),
    bx AS (SELECT doc_id,
                  unnest([words[i] || ' ' || words[i+1]
                          for i in range(1, len(words))]) AS bg
           FROM w),
    bc AS (SELECT doc_id, bg, count(*) AS c FROM bx GROUP BY doc_id, bg),
    tp AS (SELECT doc_id, max(c)::HUGEINT AS mx, sum(c)::HUGEINT AS s
           FROM bc GROUP BY doc_id)
    SELECT m.doc_id,
           ((20000*ls + n) // (2*n)) / 10000.0           AS mean_word_len,
           ((20000*(n - nd) + n) // (2*n)) / 10000.0     AS dup_word_frac,
           CASE WHEN n >= 3 THEN
             ((20000*((n-2) - ndt) + (n-2)) // (2*(n-2))) / 10000.0
           ELSE 0.0 END                                  AS dup_trigram_frac,
           CASE WHEN tp.doc_id IS NULL THEN 0.0
                ELSE ((20000*mx + s) // (2*s)) / 10000.0 END AS top_bigram_frac,
           (ls::DOUBLE / n BETWEEN 3 AND 10
            AND coalesce(mx::DOUBLE / s, 1) <= 0.18)     AS quality_ok
    FROM m LEFT JOIN tp ON m.doc_id = tp.doc_id
    """,
)
def q_doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition metrics + the Gopher keep/drop flag. One
    explode+group pass for the top-bigram mode, everything else stays
    in the scan stage as array expressions; the final join is
    doc_id-keyed (both sides already hash-partitioned by doc_id)."""
    d = _docs(spark, sf_dir, rebalance=True).withColumn(
        "words", F.split("text", " ")
    )
    n = F.size("words")
    sum_len = F.aggregate(
        F.transform("words", F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    nd = F.size(F.array_distinct("words"))
    # slice-based windows, NOT sequence(0, size-k): sequence DESCENDS
    # when the upper bound is negative (1-word docs), and the lambda's
    # words[i+1] then reads out of bounds — ANSI mode throws. slice
    # with a greatest(…, 0) length is empty for short docs instead.
    tri = F.expr(
        "transform(slice(words, 1, greatest(size(words) - 2, 0)), "
        "(x, i) -> concat_ws(' ', x, words[i+1], words[i+2]))"
    )
    ndt = F.size(F.array_distinct(tri))
    # fractions round via the exact-integer device (_r4); the keep/drop
    # comparisons stay on the raw double ratio — identical integer
    # inputs give identical IEEE doubles in both engines, only round()
    # diverges at half boundaries
    m = d.select(
        "doc_id",
        "words",
        (sum_len.cast("double") / n).alias("mwl"),
        _r4(sum_len, n).alias("mean_word_len"),
        _r4(n - nd, n).alias("dup_word_frac"),
        F.when(n >= 3, _r4((n - 2) - ndt, n - 2))
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    )
    bx = m.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(words, 1, size(words) - 1), "
                "(x, i) -> concat_ws(' ', x, words[i+1]))"
            )
        ).alias("bg"),
    )
    tp = (
        bx.groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(
            (F.max("count").cast("double") / F.sum("count")).alias("tbf"),
            _r4(F.max("count"), F.sum("count")).alias("tbf_r4"),
        )
    )
    return (
        m.drop("words")
        .join(tp, "doc_id", "left")
        .select(
            "doc_id",
            "mean_word_len",
            "dup_word_frac",
            "dup_trigram_frac",
            F.coalesce("tbf_r4", F.lit(0.0)).alias("top_bigram_frac"),
            (
                F.col("mwl").between(3, 10)
                & (F.coalesce("tbf", F.lit(1.0)) <= 0.18)
            ).alias("quality_ok"),
        )
    )


# --------------------------------------------------------------------------
# PII redaction: count + strip emails / phone numbers / IPv4 addresses.
# Pure regexp_replace / regexp_extract_all — JVM-side, no UDF. The
# registry output carries md5(redacted) instead of the full text so the
# gate's hash compare stays cheap; tests/test_curation.py proves the
# redaction itself on crafted strings.
# --------------------------------------------------------------------------
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9][0-9 ()-]{6,}[0-9]"
_PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact_pii(col: F.Column) -> F.Column:
    """Email -> phone -> IPv4 replacement, in that order (emails can
    embed digit runs a phone pattern would otherwise split)."""
    out = F.regexp_replace(col, F.lit(_PII_EMAIL), F.lit("<EMAIL>"))
    out = F.regexp_replace(out, F.lit(_PII_PHONE), F.lit("<PHONE>"))
    return F.regexp_replace(out, F.lit(_PII_IPV4), F.lit("<IP>"))


@query(
    "q_doc_pii_redaction",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_EMAIL}'))::BIGINT AS n_emails,
           len(regexp_extract_all(text, '{_PII_PHONE}'))::BIGINT AS n_phones,
           len(regexp_extract_all(text, '{_PII_IPV4}'))::BIGINT  AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
                 '{_PII_IPV4}', '<IP>', 'g'))                    AS redacted_hash
    FROM documents
    """,
)
def q_doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_IPV4), 0))
        .cast("long")
        .alias("n_ips"),
        F.md5(redact_pii(F.col("text"))).alias("redacted_hash"),
    )


# --------------------------------------------------------------------------
# Deterministic train/val/test split: bucket = md5(doc_id || salt) mod
# 100 — reproducible across engines, runs, and cluster sizes; no RNG
# state, no shuffle (pure projection).
# --------------------------------------------------------------------------
_SPLIT_SALT = "split-v1"


@query(
    "q_doc_hash_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(doc_id::VARCHAR || ':{_SPLIT_SALT}'), 1, 8))::BIGINT
               % 100 AS bucket
      FROM documents)
    SELECT doc_id,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q_doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.lit(_SPLIT_SALT))), 1, 8
        ),
        16,
        10,
    ).cast("long") % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return d.select("doc_id", split.alias("split"))


# --------------------------------------------------------------------------
# Document chunking for fixed-context training: sliding token windows of
# CHUNK tokens at STRIDE (overlap = CHUNK - STRIDE). Pure array
# expressions + one generator — stays in the scan stage, linear, no
# shuffle at all.
# --------------------------------------------------------------------------
_CHUNK = 16
_STRIDE = 12

# Position-packing stride shared by the corpus-dedup ops: a packed
# position is ``doc_id * 2**20 + index`` (chunk index or token offset),
# one orderable int64 whose min() is the canonical first occurrence.
# Bounds — guarded IN-PLAN so overflow raises instead of silently
# bleeding into a neighboring doc's range (the oracle packs identically,
# so the hash gate could never catch a silent collision): index < 2^20
# (≥1M-token docs for the sliding-window op; ~16.8M tokens at
# _CHUNK=16 for chunk removal) and 0 <= doc_id < 2^43.
_POS_STRIDE = 2**20
_DOC_ID_MAX = 2**43


def _packed_pos(idx, what: str):
    """``doc_id * 2**20 + idx`` with a loud in-plan overflow guard."""
    ok = (
        (idx >= 0)
        & (idx < _POS_STRIDE)
        & (F.col("doc_id") >= 0)
        & (F.col("doc_id") < _DOC_ID_MAX)
    )
    err = F.concat(
        F.lit(f"{what}: position-packing overflow (doc_id="),
        F.col("doc_id").cast("string"),
        F.lit(", idx="),
        idx.cast("string"),
        F.lit("); bounds: 0 <= idx < 2^20, 0 <= doc_id < 2^43"),
    )
    return F.when(ok, F.col("doc_id") * _POS_STRIDE + idx).otherwise(
        F.raise_error(err).cast("long")
    )


@query(
    "q_doc_chunking",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           s // {_STRIDE}                                    AS chunk_idx,
           len(words[s+1 : s+{_CHUNK}])::BIGINT              AS n_chunk_tokens,
           md5(array_to_string(words[s+1 : s+{_CHUNK}], ' ')) AS chunk_hash
    FROM (SELECT doc_id, words, unnest(range(0, len(words), {_STRIDE})) AS s
          FROM w)
    """,
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("words", F.split("text", " "))
    # explode the start-offset expression INLINE (generator pitfall —
    # see tests/test_plans.py::TestGeneratorPitfall)
    ex = d.select(
        "doc_id",
        "words",
        F.explode(
            F.expr(f"sequence(0, size(words) - 1, {_STRIDE})")
        ).alias("s"),
    )
    chunk = F.expr(f"slice(words, s + 1, {_CHUNK})")
    return ex.select(
        "doc_id",
        (F.col("s") / _STRIDE).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


# --------------------------------------------------------------------------
# Benchmark-contamination check: fraction of a doc's distinct 5-grams
# that appear in a "benchmark" probe set (docs 0..19 stand in for a
# held-out eval set). The probe side is tiny by construction -> Spark
# broadcasts it; the corpus side is one explode + one doc_id-keyed
# aggregation — linear at 100 TB. (The 13-gram variant of this check is
# the publicly documented GPT-3/Gopher decontamination procedure; 5-grams
# fit the short synthetic docs.)
# --------------------------------------------------------------------------
_N_PROBE_DOCS = 20
_GRAM = 5


def _grams_sql_duck(gram: int) -> str:
    return (
        f"list_distinct([array_to_string(words[i : i+{gram - 1}], ' ') "
        f"for i in range(1, len(words) - {gram - 2})])"
    )


@query(
    "q_contamination_check",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE len(string_split(text, ' ')) >= {_GRAM}),
    g AS (SELECT doc_id, {_grams_sql_duck(_GRAM)} AS grams FROM w),
    probe AS (SELECT DISTINCT unnest(grams) AS gram FROM g
              WHERE doc_id < {_N_PROBE_DOCS}),
    corpus AS (SELECT doc_id, unnest(grams) AS gram, len(grams) AS n_grams
               FROM g WHERE doc_id >= {_N_PROBE_DOCS})
    SELECT c.doc_id,
           count(p.gram)::BIGINT AS n_overlap,
           any_value(c.n_grams)::BIGINT AS n_grams,
           round(count(p.gram)::DOUBLE / any_value(c.n_grams), 4) AS contamination
    FROM corpus c JOIN probe p ON c.gram = p.gram
    GROUP BY c.doc_id
    """,
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, rebalance=True).withColumn(
        "words", F.split("text", " ")
    )
    d = d.filter(F.size("words") >= _GRAM)
    grams = F.expr(
        f"array_distinct(transform(sequence(0, size(words) - {_GRAM}), "
        f"i -> concat_ws(' ', slice(words, i + 1, {_GRAM}))))"
    )
    g = d.select("doc_id", grams.alias("grams"))
    probe = (
        g.filter(F.col("doc_id") < _N_PROBE_DOCS)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    corpus = g.filter(F.col("doc_id") >= _N_PROBE_DOCS).select(
        "doc_id", F.size("grams").alias("n_grams"), F.explode("grams").alias("gram")
    )
    return (
        corpus.join(F.broadcast(probe), "gram")
        .groupBy("doc_id")
        .agg(
            F.count("gram").cast("long").alias("n_overlap"),
            F.any_value("n_grams").cast("long").alias("n_grams"),
            F.round(
                F.count("gram").cast("double") / F.any_value("n_grams"), 4
            ).alias("contamination"),
        )
    )


# --------------------------------------------------------------------------
# Duplicate clustering: connected components over the MinHash-LSH
# candidate-pair graph, with the cluster minimum as the canonical doc.
# Candidate pairs alone don't dedup a corpus — transitive duplicates
# (A~B, B~C) must land in ONE cluster so exactly one doc survives.
#
# Spark side: min-label propagation with POINTER DOUBLING (each round
# also shortcuts label := label(label), the Shiloach-Vishkin / pointer-
# jumping trick), so convergence takes O(log diameter) rounds instead of
# O(diameter) — a 1M-node duplicate chain converges in ~21 rounds, not
# 1M. The edge set is the LSH candidate list — orders of magnitude
# smaller than the corpus — and every round is three hash joins on it.
# Each round localCheckpoints to cut lineage growth. Non-convergence
# within _CC_MAX_ITERS raises rather than returning wrong labels (the
# bound allows diameters ~2^_CC_MAX_ITERS — unreachable in practice).
# This is the documented non-SQL-shape exception in the engine
# (driver-side convergence loop; per-round work fully distributed).
# --------------------------------------------------------------------------
_CC_MAX_ITERS = 40


def connected_components(edges: DataFrame) -> DataFrame:
    """Min-label propagation + pointer doubling over an undirected edge
    list (``a``/``b`` long columns). Returns (node, label) with label =
    min node id reachable. Exact fixpoint (not hash-approximate), so the
    DuckDB transitive-closure oracle matches bit-for-bit. Raises
    ``RuntimeError`` if the fixpoint is not reached in ``_CC_MAX_ITERS``
    rounds (needs ~log2(diameter) rounds)."""
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = materialize(sym)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    sentinel = F.lit(2**62)
    for _ in range(_CC_MAX_ITERS):
        # one-hop: min label among my neighbors
        neigh = (
            sym.join(labels, sym.a == labels.node)
            .select(F.col("b").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nlabel"))
        )
        # pointer jump: the label of my label. Every label value is a
        # node id (labels start as node ids and only propagate), so the
        # self-join always hits; "left" is belt-and-braces.
        jump = labels.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        new = (
            labels.join(neigh, "node", "left")
            .join(jump, F.col("label") == F.col("jnode"), "left")
            .select(
                "node",
                F.least(
                    "label",
                    F.coalesce("nlabel", sentinel),
                    F.coalesce("jlabel", sentinel),
                ).alias("label"),
                (
                    F.least(
                        F.coalesce("nlabel", sentinel),
                        F.coalesce("jlabel", sentinel),
                    )
                    < F.col("label")
                ).alias("chg"),
            )
        )
        new = materialize(new)
        changed = new.filter("chg").limit(1).count()
        labels = new.drop("chg")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {_CC_MAX_ITERS} rounds "
        "(graph diameter > 2^rounds is implausible; investigate the edge set)"
    )


@query(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_LSH_DUCK},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM cand
      UNION
      SELECT doc_b AS a, doc_a AS b FROM cand),
    reach AS (
      SELECT a AS node, b AS peer FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a)
    SELECT node                             AS doc_id,
           least(node, min(peer))::BIGINT   AS cluster_id,
           (least(node, min(peer)) = node)  AS is_canonical
    FROM reach GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _lsh_candidate_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    labels = connected_components(edges)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").cast("long").alias("cluster_id"),
        (F.col("label") == F.col("node")).alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# The full curation pipeline as ONE query — the corpus-prep flow a
# training run actually executes, composed from the operators above:
#   1. fuzzy-dedup the corpus (LSH candidates → connected components →
#      keep each cluster's canonical doc),
#   2. quality-filter the survivors (Gopher rules),
#   3. assign deterministic train/val/test splits,
#   4. report per (split, lang) document and token counts.
# Everything stays linear + bucketed (the cluster step touches only the
# candidate-pair edge set); the oracle reproduces the ENTIRE pipeline,
# so a regression in any stage fails the gate.
# --------------------------------------------------------------------------
@query(
    "q_curation_pipeline",
    oracle=f"""
    WITH RECURSIVE {_LSH_DUCK},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM cand
      UNION
      SELECT doc_b AS a, doc_a AS b FROM cand),
    reach AS (
      SELECT a AS node, b AS peer FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a),
    clusters AS (
      SELECT node AS doc_id, least(node, min(peer)) AS cluster_id
      FROM reach GROUP BY node),
    survivors AS (
      SELECT d.* FROM documents d
      LEFT JOIN clusters c ON c.doc_id = d.doc_id
      WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id),
    w AS (SELECT doc_id, lang, text,
                 string_split(text, ' ') AS words FROM survivors),
    m AS (
      SELECT doc_id, lang, len(words) AS n_tokens,
             list_sum([len(x) for x in words])::DOUBLE / len(words) AS mwl
      FROM w),
    bx AS (SELECT doc_id,
                  unnest([words[i] || ' ' || words[i+1]
                          for i in range(1, len(words))]) AS bg
           FROM w),
    bc AS (SELECT doc_id, bg, count(*) AS c FROM bx GROUP BY doc_id, bg),
    tp AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS tbf FROM bc GROUP BY doc_id),
    kept AS (
      SELECT m.doc_id, m.lang, m.n_tokens
      FROM m LEFT JOIN tp ON m.doc_id = tp.doc_id
      WHERE m.mwl BETWEEN 3 AND 10 AND coalesce(tp.tbf, 1) <= 0.18),
    split AS (
      SELECT doc_id, lang, n_tokens,
             CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':{_SPLIT_SALT}'),
                        1, 8))::BIGINT % 100 < 90 THEN 'train'
                  WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':{_SPLIT_SALT}'),
                        1, 8))::BIGINT % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM kept)
    SELECT split, lang,
           count(*)::BIGINT          AS n_docs,
           (sum(n_tokens))::BIGINT   AS total_tokens
    FROM split GROUP BY split, lang
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    labels = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    # canonical-keep: drop any doc that belongs to a cluster it doesn't
    # lead (docs outside every cluster survive via the left join).
    # NEVER hint-broadcast `labels`: it holds every doc in any duplicate
    # cluster, and web-scale dup membership is commonly 30-50% of the
    # corpus — corpus-proportional, far past any broadcast ceiling at
    # 100×. A plain shuffled join on doc_id is the scale-safe plan; AQE
    # may still choose broadcast when the measured side is actually
    # small (VERDICT r5 #2).
    survivors = (
        d.join(labels, "doc_id", "left")
        .filter(
            F.col("cluster_id").isNull()
            | (F.col("cluster_id") == F.col("doc_id"))
        )
        .drop("cluster_id")
    )
    w = survivors.withColumn("words", F.split("text", " "))
    n = F.size("words")
    mwl = F.aggregate(
        F.transform("words", F.length), F.lit(0).cast("long"), lambda a, x: a + x
    ).cast("double") / n
    m = w.select(
        "doc_id", "lang", n.alias("n_tokens"), mwl.alias("mwl"), "words"
    )
    bx = m.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(words, 1, size(words) - 1), "
                "(x, i) -> concat_ws(' ', x, words[i+1]))"
            )
        ).alias("bg"),
    )
    tp = (
        bx.groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg((F.max("count").cast("double") / F.sum("count")).alias("tbf"))
    )
    kept = (
        m.drop("words")
        .join(tp, "doc_id", "left")
        .filter(
            F.col("mwl").between(3, 10)
            & (F.coalesce("tbf", F.lit(1.0)) <= 0.18)
        )
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id"), F.lit(_SPLIT_SALT))), 1, 8
        ),
        16,
        10,
    ).cast("long") % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        kept.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Sequence packing: concat-and-chunk assignment of documents into
# fixed-length training sequences (the GPT-style "pack the corpus into
# 2048-token rows" step), sharded by source so shards pack in parallel.
# Scale shape: one window per shard (hash-partitioned by source, sorted
# by doc_id inside the shard) — the cumulative offset never crosses
# shards, so there is no global sort and no single-task window; at
# 100 TB you add more shards (e.g. source × date), not more memory.
# --------------------------------------------------------------------------
_SEQ_LEN = 512


@query(
    "q_doc_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' '))::BIGINT AS n_tok
      FROM documents),
    s AS (
      SELECT doc_id, source, n_tok,
             coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS start_offset
      FROM t)
    SELECT doc_id, source, n_tok, start_offset,
           (start_offset // {_SEQ_LEN})::BIGINT                AS seq_first,
           ((start_offset + n_tok - 1) // {_SEQ_LEN})::BIGINT  AS seq_last,
           ((start_offset + n_tok - 1) // {_SEQ_LEN}
             - start_offset // {_SEQ_LEN} + 1)::BIGINT         AS n_seqs_spanned
    FROM s
    """,
)
def q_doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each doc's token span in the packed stream of its source shard:
    start offset, first/last sequence index, sequences spanned."""
    from pyspark.sql.window import Window as W

    t = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    s = t.withColumn("start_offset", start)
    last_tok = F.col("start_offset") + F.col("n_tok") - 1
    seq_first = F.floor(F.col("start_offset") / _SEQ_LEN).cast("long")
    seq_last = F.floor(last_tok / _SEQ_LEN).cast("long")
    return s.select(
        "doc_id",
        "source",
        "n_tok",
        "start_offset",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        (seq_last - seq_first + 1).alias("n_seqs_spanned"),
    )


# --------------------------------------------------------------------------
# Corpus-level repeated-chunk removal (the RefinedWeb/C4 "drop text
# repeated across documents, keep the first occurrence" pass), on
# non-overlapping {_CHUNK}-token chunks (this corpus has no newlines, so
# fixed-width chunks stand in for paragraphs). Scale shape: one explode,
# one combiner-friendly groupBy on the chunk hash (first occurrence =
# min(packed doc_id·stride + idx), an order-independent aggregate), one
# hash-co-partitioned join back, one doc_id aggregation — all linear.
# --------------------------------------------------------------------------


@query(
    "q_doc_repeated_chunk_removal",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    c AS (
      SELECT doc_id,
             doc_id * 1048576 + s // {_CHUNK}              AS pos,
             array_to_string(words[s+1 : s+{_CHUNK}], ' ') AS chunk,
             len(words[s+1 : s+{_CHUNK}])::BIGINT          AS n_tok
      FROM (SELECT doc_id, words, unnest(range(0, len(words), {_CHUNK})) AS s
            FROM w)),
    firsts AS (
      SELECT chunk, min(pos) AS first_pos, count(*) AS n_occ
      FROM c GROUP BY chunk)
    SELECT c.doc_id,
           count(*)::BIGINT                            AS n_chunks,
           sum(CASE WHEN f.n_occ > 1 AND c.pos <> f.first_pos
                    THEN 1 ELSE 0 END)::BIGINT         AS n_removed,
           sum(CASE WHEN f.n_occ > 1 AND c.pos <> f.first_pos
                    THEN 0 ELSE c.n_tok END)::BIGINT   AS kept_tokens
    FROM c JOIN firsts f ON c.chunk = f.chunk
    GROUP BY c.doc_id
    """,
)
def q_doc_repeated_chunk_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc: chunks dropped because an identical chunk appeared
    earlier in the corpus (position-packed min), and tokens kept."""
    return repeated_chunk_removal(_docs(spark, sf_dir, rebalance=True))


def repeated_chunk_removal(d: DataFrame, chunk_tokens: int = _CHUNK) -> DataFrame:
    """Corpus-level repeated-chunk removal accounting over a
    ``(doc_id, text)`` frame — see :func:`q_doc_repeated_chunk_removal`.
    First occurrence is ``min(doc_id * 2**20 + chunk_index)`` (guarded
    packing, see :func:`_packed_pos`), so documents up to ~16.8M tokens
    and doc ids up to 2**43 attribute collision-free."""
    d = d.withColumn("words", F.split("text", " "))
    ex = d.select(
        "doc_id",
        "words",
        F.explode(
            F.expr(f"sequence(0, size(words) - 1, {chunk_tokens})")
        ).alias("s"),
    )
    chunk = F.expr(f"slice(words, s + 1, {chunk_tokens})")
    # 128-bit chunk fingerprint instead of the raw {chunk_tokens}-token
    # text on the wide ops — same rationale and collision bound as
    # :func:`exact_substring_dedup` (two xxhash64 lanes, P ≤ n²/2^129);
    # the oracle groups on the raw text, so the value gate verifies it.
    chunk_text = F.concat_ws(" ", chunk)
    c = ex.select(
        "doc_id",
        _packed_pos(
            (F.col("s") / chunk_tokens).cast("long"), "repeated_chunk_removal"
        ).alias("pos"),
        F.xxhash64(chunk_text).alias("c1"),
        F.xxhash64(F.lit(1), chunk_text).alias("c2"),
        F.size(chunk).cast("long").alias("n_tok"),
    )
    firsts = c.groupBy("c1", "c2").agg(
        F.min("pos").alias("first_pos"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    j = c.join(firsts, ["c1", "c2"])
    removed = (F.col("n_occ") > 1) & (F.col("pos") != F.col("first_pos"))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(removed.cast("long")).alias("n_removed"),
        F.sum(F.when(removed, 0).otherwise(F.col("n_tok"))).cast("long").alias(
            "kept_tokens"
        ),
    )


# --------------------------------------------------------------------------
# Exact-substring dedup, sliding-window form (the suffix-array dedup of
# "Deduplicating Training Data Makes Language Models Better", Lee et al.
# 2022, re-expressed relationally): a duplicated span is ANY K-token
# window occurring elsewhere in the corpus, at any offset — not just on
# fixed chunk boundaries like q_doc_repeated_chunk_removal. One copy
# (the position-packed first occurrence) is kept; every other doc's
# covered token positions are merged into disjoint spans
# (gaps-and-islands over per-doc window functions) and counted as
# removed. Scale shape: the window explode is linear in corpus tokens
# (K-1 extra rows per token vs the suffix array's O(n log n) sort —
# same candidates, shuffle-friendly); the only wide ops are one
# combiner-friendly groupBy on the window fingerprint, one hash join
# back, and one doc_id-partitioned window pass. No suffix array is ever
# materialized, so the op shards over any number of executors. The
# grouping key is a 128-bit window fingerprint (see the in-function
# comment), so shuffle width is 16 bytes/window, not the window text.
# --------------------------------------------------------------------------
_SUB_K = 8

# Shared by the batch op below and its streaming twin
# (q_stream_exact_substring_dedup): the drained incremental result is
# batch-boundary independent (doc ids arrive monotone, and keep-first
# decisions depend only on lower-pos occurrences), so BOTH gate against
# this one full-corpus replay.
EXACT_SUBSTRING_ORACLE = f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    base AS (SELECT doc_id, len(words)::BIGINT AS n_tok, words FROM w),
    ex AS (
      SELECT doc_id,
             s,
             doc_id * 1048576 + s                             AS pos,
             array_to_string(words[s+1 : s+{_SUB_K}], ' ')    AS win
      FROM (SELECT doc_id, words,
                   unnest(range(0, len(words) - {_SUB_K} + 1)) AS s
            FROM base WHERE len(words) >= {_SUB_K})),
    firsts AS (
      SELECT win, min(pos) AS first_pos, count(*) AS n_occ
      FROM ex GROUP BY win),
    dup AS (
      SELECT e.doc_id, e.s, e.s + {_SUB_K - 1} AS e_pos
      FROM ex e JOIN firsts f USING (win)
      WHERE f.n_occ > 1 AND e.pos <> f.first_pos),
    marked AS (
      SELECT doc_id, s, e_pos,
             CASE WHEN s > coalesce(max(e_pos) OVER (
                    PARTITION BY doc_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM dup),
    islands AS (
      SELECT doc_id, isl, min(s) AS i_s, max(e_pos) AS i_e,
             count(*) AS n_w
      FROM (SELECT doc_id, s, e_pos,
                   sum(new_island) OVER (
                     PARTITION BY doc_id ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
            FROM marked)
      GROUP BY doc_id, isl),
    rem AS (
      SELECT doc_id,
             sum(i_e - i_s + 1)::BIGINT AS removed_tokens,
             sum(n_w)::BIGINT           AS n_dup_windows
      FROM islands GROUP BY doc_id),
    nw AS (SELECT doc_id, count(*)::BIGINT AS n_windows FROM ex GROUP BY doc_id)
    SELECT b.doc_id,
           coalesce(nw.n_windows, 0)::BIGINT       AS n_windows,
           coalesce(rem.n_dup_windows, 0)::BIGINT  AS n_dup_windows,
           coalesce(rem.removed_tokens, 0)::BIGINT AS removed_tokens,
           (b.n_tok - coalesce(rem.removed_tokens, 0))::BIGINT AS kept_tokens
    FROM base b
    LEFT JOIN nw USING (doc_id)
    LEFT JOIN rem USING (doc_id)
    """


@query("q_doc_exact_substring_dedup", oracle=EXACT_SUBSTRING_ORACLE)
def q_doc_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc: sliding K-token windows duplicated elsewhere in the
    corpus (keeping the position-packed first occurrence), their merged
    covered spans, and the tokens removed/kept under span removal."""
    return exact_substring_dedup(_docs(spark, sf_dir, rebalance=True))


def substring_windows(d: DataFrame, k: int = _SUB_K) -> tuple[DataFrame, DataFrame]:
    """Explode a ``(doc_id, text)`` frame into sliding K-token windows.
    Returns ``(base, c)``: ``base = (doc_id, n_tok)`` for every doc
    (sub-K docs included — they legitimately have zero windows) and
    ``c = (doc_id, s, pos, w1, w2)`` — one row per window occurrence,
    position-packed (:func:`_packed_pos`, guarded) and fingerprinted.

    The (w1, w2) pair is a 128-bit window FINGERPRINT (two independent
    xxhash64 lanes), not the raw K-token text: downstream wide ops
    shuffle 16 bytes where the text would be ~6-8 bytes/token × K (a
    ~5-10× shuffle-width cut at K=8 — at 100 TB the window-keyed
    exchange is this op family's dominant cost). Collision bound: two
    DIFFERENT windows must collide on BOTH lanes, P ≤ n²/2^129 — at
    10^13 corpus windows that is ~4·10^-14, far below any hardware
    error rate. The DuckDB oracles still group on the raw window text,
    so the per-round value gate verifies the fingerprint path
    end-to-end rather than assuming it."""
    d = d.withColumn("words", F.split("text", " "))
    base = d.select("doc_id", "words", F.size("words").cast("long").alias("n_tok"))
    # explode the start-offset expression INLINE (generator pitfall);
    # guard size >= K — in ANSI mode sequence(0, negative) DESCENDS
    ex = base.filter(F.size("words") >= k).select(
        "doc_id",
        "words",
        F.explode(F.expr(f"sequence(0, size(words) - {k}, 1)")).alias("s"),
    )
    win = F.concat_ws(" ", F.expr(f"slice(words, s + 1, {k})"))
    c = ex.select(
        "doc_id",
        "s",
        _packed_pos(F.col("s"), "exact_substring_dedup").alias("pos"),
        F.xxhash64(win).alias("w1"),
        F.xxhash64(F.lit(1), win).alias("w2"),
    )
    return base.select("doc_id", "n_tok"), c


def substring_span_accounting(
    base: DataFrame, c: DataFrame, dup: DataFrame, k: int = _SUB_K
) -> DataFrame:
    """Merge duplicated window occurrences into disjoint per-doc spans
    (gaps-and-islands over ONE doc-partitioned window pass) and emit the
    per-doc accounting frame. ``dup`` is ``(doc_id, s, e_pos)`` — the
    occurrences NOT kept; ``base``/``c`` as from
    :func:`substring_windows`."""
    from pyspark.sql.window import Window as W

    prev = (
        W.partitionBy("doc_id").orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    )
    run = (
        W.partitionBy("doc_id").orderBy("s").rowsBetween(W.unboundedPreceding, 0)
    )
    islands = (
        dup.withColumn(
            "new_island",
            (
                F.col("s")
                > F.coalesce(F.max("e_pos").over(prev), F.lit(-1))
            ).cast("long"),
        )
        .withColumn("isl", F.sum("new_island").over(run))
        .groupBy("doc_id", "isl")
        .agg(
            F.min("s").alias("i_s"),
            F.max("e_pos").alias("i_e"),
            F.count(F.lit(1)).alias("n_w"),
        )
    )
    # dup-window count rides the island aggregation (already doc-
    # partitioned by the window pass) — no separate shuffle + join
    rem = islands.groupBy("doc_id").agg(
        F.sum(F.col("i_e") - F.col("i_s") + 1).cast("long").alias("removed_tokens"),
        F.sum("n_w").cast("long").alias("n_dup_windows"),
    )
    nw = c.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("n_windows"))
    return (
        base.join(nw, "doc_id", "left")
        .join(rem, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.coalesce(F.col("removed_tokens"), F.lit(0))
            .cast("long")
            .alias("removed_tokens"),
            (F.col("n_tok") - F.coalesce(F.col("removed_tokens"), F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


def exact_substring_dedup(d: DataFrame, k: int = _SUB_K) -> DataFrame:
    """Sliding-window exact-substring dedup accounting over a
    ``(doc_id, text)`` frame — see :func:`q_doc_exact_substring_dedup`.
    Position packing is ``doc_id * 2**20 + offset``: documents up to
    ~1M tokens (any realistic web/book document) and doc ids up to
    ~2**43 pack into one orderable int64 — the canonical "first
    occurrence" is just ``min(pos)``, an order-independent aggregate.
    The packing is guarded in-plan (:func:`_packed_pos`): a document or
    id past the bounds raises instead of silently colliding."""
    base, c = substring_windows(d, k)
    firsts = c.groupBy("w1", "w2").agg(
        F.min("pos").alias("first_pos"), F.count(F.lit(1)).alias("n_occ")
    )
    dup = (
        c.join(firsts, ["w1", "w2"])
        .filter((F.col("n_occ") > 1) & (F.col("pos") != F.col("first_pos")))
        .select("doc_id", "s", (F.col("s") + F.lit(k - 1)).alias("e_pos"))
    )
    return substring_span_accounting(base, c, dup, k)


# --------------------------------------------------------------------------
# Unigram-LM quality score: average log-probability of a document under
# the corpus's own unigram distribution — the cheap perplexity proxy
# used to rank/filter web text before an expensive model-based pass.
# Scale shape: the vocabulary is Zipf-bounded (≪ corpus), built with one
# combiner-friendly groupBy and broadcast back; per-doc scoring is one
# explode + one doc_id aggregation. No shuffle touches full documents.
# --------------------------------------------------------------------------


@query(
    "q_doc_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    total AS (SELECT sum(c)::DOUBLE AS n FROM vocab)
    SELECT doc_id,
           count(*)::BIGINT                              AS n_tok,
           round(sum(ln(c / (SELECT n FROM total)))
                 / count(*), 4)                          AS avg_logprob
    FROM tok JOIN vocab USING (tok)
    GROUP BY doc_id
    """,
)
def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = (
        _docs(spark, sf_dir, rebalance=True)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("n"))
    # no forced broadcast on vocab: Zipf keeps it ≪ corpus on natural
    # language, but raw open-web token sets (URLs, typos, code) can
    # outgrow any broadcast ceiling — same reasoning that hash-bucketed
    # the DSIR estimator. The optimizer broadcasts when the measured
    # size allows; `total` is 1 row and always safe to hint.
    scored = tok.join(vocab, "tok").join(F.broadcast(total))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.round(
            F.sum(F.log(F.col("c") / F.col("n"))) / F.count(F.lit(1)), 4
        ).alias("avg_logprob"),
    )


# --------------------------------------------------------------------------
# FUZZY benchmark decontamination: q_contamination_check flags exact
# 5-gram overlap; real leakage is usually near-duplicate (reformatted /
# lightly edited benchmark items), which exact n-grams miss. This pass
# LSH-matches corpus docs against the probe set (docs 0..19 stand in
# for a held-out benchmark), then verifies candidates with exact
# shingle-set Jaccard — generation via bands, verification on the tiny
# candidate list only. Scale shape: the probe band table is benchmark-
# sized → broadcast; the corpus is touched once to band; the Jaccard
# join runs on candidates, not the corpus.
# --------------------------------------------------------------------------
_FUZZY_CONTAM_THRESH = 0.5


@query(
    "q_fuzzy_decontamination",
    oracle=f"""
    WITH {_LSH_DUCK},
    pb AS (SELECT DISTINCT band, band_key, doc_id AS probe_id
           FROM bands WHERE doc_id < {_N_PROBE_DOCS}),
    cb AS (SELECT DISTINCT band, band_key, doc_id
           FROM bands WHERE doc_id >= {_N_PROBE_DOCS}),
    cand2 AS (
      SELECT DISTINCT cb.doc_id, pb.probe_id
      FROM cb JOIN pb ON cb.band = pb.band AND cb.band_key = pb.band_key),
    sh AS (
      SELECT doc_id, {_SHINGLES_DUCK} AS sh
      FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS words
            FROM documents)),
    ver AS (
      SELECT c.doc_id, c.probe_id,
             CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(x.sh, y.sh))) AS jac
      FROM cand2 c
      JOIN sh x ON x.doc_id = c.doc_id
      JOIN sh y ON y.doc_id = c.probe_id)
    SELECT doc_id,
           probe_id                            AS matched_probe,
           round(jac, 4)                       AS jaccard,
           (jac >= {_FUZZY_CONTAM_THRESH})     AS contaminated
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY jac DESC, probe_id) AS rk FROM ver)
    WHERE rk = 1
    """,
)
def q_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    bands = _lsh_bands(spark, sf_dir)
    pb = (
        bands.filter(F.col("doc_id") < _N_PROBE_DOCS)
        .select("band", "band_key", F.col("doc_id").alias("probe_id"))
        .distinct()
    )
    cb = bands.filter(F.col("doc_id") >= _N_PROBE_DOCS).select(
        "band", "band_key", "doc_id"
    )
    cand = (
        cb.join(F.broadcast(pb), ["band", "band_key"])
        .select("doc_id", "probe_id")
        .distinct()
    )
    sh = _shingled(spark, sf_dir).select("doc_id", F.col("shingles").alias("sh"))
    x, y = sh.alias("x"), sh.alias("y")
    jac = (
        F.size(F.array_intersect(F.col("x.sh"), F.col("y.sh"))).cast("double")
        / F.size(F.array_union(F.col("x.sh"), F.col("y.sh")))
    )
    ver = (
        cand.join(x, cand.doc_id == F.col("x.doc_id"))
        .join(F.broadcast(y), cand.probe_id == F.col("y.doc_id"))
        .select(cand.doc_id, "probe_id", jac.alias("jac"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("jac").desc(), "probe_id")
    return (
        ver.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("probe_id").alias("matched_probe"),
            F.round("jac", 4).alias("jaccard"),
            (F.col("jac") >= _FUZZY_CONTAM_THRESH).alias("contaminated"),
        )
    )


# --------------------------------------------------------------------------
# Corpus mixture (data mixing): deterministic hash-sampling each source
# to a target weight — how a training run hits "1 epoch of web, 2 of
# code, 4 of wiki" ratios without an RNG (same md5-bucket device as the
# split assignment, different salt, so the two samplings are
# independent). Pure projection + one aggregation; no shuffle touches
# document text.
# --------------------------------------------------------------------------
_MIX_SALT = "mix-v1"
# weight = % of the source kept; tiers stand in for quality classes
_MIX_SQL_WEIGHT = (
    "CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 100 "
    "WHEN source IN ('src5','src6','src7','src8','src9') THEN 50 "
    "ELSE 25 END"
)


@query(
    "q_corpus_mixture_sampling",
    oracle=f"""
    WITH d AS (
      SELECT source,
             len(string_split(text, ' '))::BIGINT AS n_tok,
             ('0x' || substr(md5(doc_id::VARCHAR || ':{_MIX_SALT}'), 1, 8))::BIGINT
               % 100 AS bucket,
             {_MIX_SQL_WEIGHT} AS weight
      FROM documents),
    k AS (
      SELECT source, weight,
             count(*)                                         AS n_docs,
             sum(CASE WHEN bucket < weight THEN 1 ELSE 0 END) AS n_kept,
             sum(CASE WHEN bucket < weight THEN n_tok ELSE 0 END) AS kept_tokens
      FROM d GROUP BY source, weight)
    SELECT source, weight,
           n_docs::BIGINT      AS n_docs,
           n_kept::BIGINT      AS n_kept,
           kept_tokens::BIGINT AS kept_tokens,
           ((20000*kept_tokens::HUGEINT + (SELECT sum(kept_tokens) FROM k))
              // (2*(SELECT sum(kept_tokens) FROM k))) / 10000.0 AS token_share
    FROM k
    """,
)
def q_corpus_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("doc_id"), F.lit(_MIX_SALT))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 100
        ).alias("bucket"),
        F.expr(_MIX_SQL_WEIGHT).alias("weight"),
    )
    kept = F.col("bucket") < F.col("weight")
    k = d.groupBy("source", "weight").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).cast("long").alias(
            "kept_tokens"
        ),
    )
    total = k.agg(F.sum("kept_tokens").alias("tot"))
    return k.join(F.broadcast(total)).select(
        "source",
        "weight",
        "n_docs",
        "n_kept",
        "kept_tokens",
        _r4(F.col("kept_tokens"), F.col("tot")).alias("token_share"),
    )


# --------------------------------------------------------------------------
# Canonical-representative selection — the OTHER keep policy (round 5).
# q_curation_pipeline keeps each duplicate cluster's min-id member (a
# deterministic but arbitrary choice); production corpus prep usually
# keeps the BEST member — here the longest (token count), the common
# "retain the most complete near-duplicate" rule, tie-broken by id so
# the result is total-ordered. One row per duplicate cluster: the
# representative's id, its token count, and the cluster size. The
# cluster step touches only the candidate-pair edge set (bucketed LSH,
# never a corpus self-join) and the ranking is one window over rows
# already reduced to cluster members — linear at 100 TB.
# --------------------------------------------------------------------------
@query(
    "q_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_LSH_DUCK},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM cand
      UNION
      SELECT doc_b AS a, doc_a AS b FROM cand),
    reach AS (
      SELECT a AS node, b AS peer FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a),
    clusters AS (
      SELECT node AS doc_id, least(node, min(peer)) AS cluster_id
      FROM reach GROUP BY node),
    members AS (
      SELECT c.cluster_id, c.doc_id,
             len(string_split(d.text, ' '))::BIGINT AS n_tokens
      FROM clusters c JOIN documents d ON d.doc_id = c.doc_id)
    SELECT cluster_id::BIGINT AS cluster_id,
           doc_id             AS kept_doc_id,
           n_tokens           AS kept_tokens,
           n_members
    FROM (
      SELECT *, count(*) OVER (PARTITION BY cluster_id)::BIGINT AS n_members,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_tokens DESC, doc_id) AS rn
      FROM members)
    WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = _docs(spark, sf_dir)
    labels = q_dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    # `labels` is corpus-proportional (every duplicate-cluster member) —
    # see q_curation_pipeline: never hint-broadcast it; shuffled join on
    # doc_id, AQE free to downgrade when genuinely small (VERDICT r5 #2)
    members = (
        d.join(labels, "doc_id")
        .select(
            "cluster_id",
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
    )
    w = W.partitionBy("cluster_id")
    ranked = members.withColumn(
        "n_members", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn(
        "rn",
        F.row_number().over(w.orderBy(F.col("n_tokens").desc(), "doc_id")),
    )
    return ranked.filter(F.col("rn") == 1).select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("doc_id").alias("kept_doc_id"),
        F.col("n_tokens").alias("kept_tokens"),
        "n_members",
    )


# --------------------------------------------------------------------------
# DSIR-style domain selection (round 5, hash-bucketed round 6): rank
# the general corpus by how much each document resembles a TARGET
# domain, using the ratio of two add-1-smoothed HASHED-unigram LMs
# (Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling" — the paper's estimator hashes n-grams into a fixed
# bucket space precisely because the raw open-web vocabulary (URLs,
# typos, code tokens) grows near-linearly with the corpus and cannot
# be broadcast). Tokens map to 2^13 buckets via the same md5-derived
# hash as the train/val/test split (replayed exactly in the DuckDB
# oracle), so the LM state is FIXED-SIZE regardless of corpus scale —
# the broadcast back onto the token stream is now always legal. Docs
# from sources src0-src2 stand in for the target domain; every other
# doc gets avg_w ln(p_target(h(w)) / p_raw(h(w))) and the top 50 are
# selected. Scale shape: one tokenize pass, one bucket groupBy with
# conditional counts (≤2^13 rows → broadcast join back), one per-doc
# aggregation, top-k fusion. Deterministic: smoothing makes every
# ratio finite, scores round to 4, ties break by doc_id.
# --------------------------------------------------------------------------
_DSIR_TARGET = ("src0", "src1", "src2")
_DSIR_TOP = 50
_DSIR_BUCKETS = 8192  # 2^13 — fixed LM size at any corpus scale


@query(
    "q_dsir_domain_selection",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source IN {str(tuple(_DSIR_TARGET))} AS tgt,
             ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 8))::BIGINT
               % {_DSIR_BUCKETS} AS bkt
      FROM documents),
    vocab AS (
      SELECT bkt,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END)::DOUBLE     AS ct,
             sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END)::DOUBLE AS cr
      FROM tok GROUP BY bkt),
    tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr,
                   count(*)::DOUBLE AS v FROM vocab)
    SELECT doc_id,
           count(*)::BIGINT AS n_tok,
           round(sum(ln(((vocab.ct + 1) / (tot.nt + tot.v))
                        / ((vocab.cr + 1) / (tot.nr + tot.v))))
                 / count(*), 4) AS dsir_score
    FROM tok JOIN vocab USING (bkt) CROSS JOIN tot
    WHERE NOT tok.tgt
    GROUP BY doc_id
    ORDER BY dsir_score DESC, doc_id
    LIMIT {_DSIR_TOP}
    """,
)
def q_dsir_domain_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, rebalance=True)
    tok = d.select(
        "doc_id",
        F.col("source").isin(*_DSIR_TARGET).alias("tgt"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).select(
        "doc_id",
        "tgt",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("bkt"),
    )
    vocab = tok.groupBy("bkt").agg(
        F.sum(F.when(F.col("tgt"), 1).otherwise(0)).cast("double").alias("ct"),
        F.sum(F.when(~F.col("tgt"), 1).otherwise(0)).cast("double").alias("cr"),
    )
    tot = vocab.agg(
        F.sum("ct").alias("nt"),
        F.sum("cr").alias("nr"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    # vocab is ≤ _DSIR_BUCKETS rows by construction — the broadcast is
    # fixed-size at any corpus scale (the whole point of the hashing)
    scored = (
        tok.filter(~F.col("tgt"))
        .join(F.broadcast(vocab), "bkt")
        .join(F.broadcast(tot))
    )
    ratio = F.log(
        ((F.col("ct") + 1) / (F.col("nt") + F.col("v")))
        / ((F.col("cr") + 1) / (F.col("nr") + F.col("v")))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.round(F.sum(ratio) / F.count(F.lit(1)), 4).alias("dsir_score"),
        )
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(_DSIR_TOP)
    )


# --------------------------------------------------------------------------
# Per-source quality cap (round 5): the standard corpus-mixing guard
# against any single domain/crawl dominating training data — keep at
# most N docs per source, PREFERRING the highest-quality ones (lexical
# diversity here), instead of a blind truncation. One window over rows
# pre-grouped by source; rank ties break by doc_id so the cap is
# deterministic. Complements q_corpus_mixture_sampling (which targets
# proportions) with a hard per-domain ceiling.
# --------------------------------------------------------------------------
_SOURCE_CAP = 5


@query(
    "q_source_capped_sampling",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             ((20000*len(list_distinct(string_split(text, ' ')))::HUGEINT
                   + len(string_split(text, ' ')))
                  // (2*len(string_split(text, ' ')))) / 10000.0 AS distinct_ratio
      FROM documents),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY source
               ORDER BY distinct_ratio DESC, doc_id) AS rank
      FROM t)
    SELECT source, doc_id, rank::BIGINT AS rank,
           distinct_ratio, n_tokens::BIGINT AS n_tokens
    FROM r WHERE rank <= {_SOURCE_CAP}
    """,
)
def q_source_capped_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    t = d.select(
        "source",
        "doc_id",
        F.size(toks).alias("n_tokens"),
        _r4(F.size(F.array_distinct(toks)), F.size(toks)).alias(
            "distinct_ratio"
        ),
    )
    w = W.partitionBy("source").orderBy(F.col("distinct_ratio").desc(), "doc_id")
    return (
        t.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _SOURCE_CAP)
        .select("source", "doc_id", "rank", "distinct_ratio", "n_tokens")
    )


# --------------------------------------------------------------------------
# Learned quality/language classifier (round 6): the fasttext-style
# linear-over-hashed-ngrams model every public LLM data pipeline runs
# (CCNet, GPT-3, Llama: a classifier trained on a curated seed scores
# every crawled doc). The SQL-replayable member of that family is
# multinomial Naive Bayes over hashed BIGRAM features: train = two
# counting aggregations (class priors + per-bucket class counts with
# Laplace smoothing), score = one fixed-size-broadcast join + one
# doc_id groupBy summing log-odds. The reference stack has no learned
# scoring at all (its quality signals are the heuristic dashboards);
# this complements the engine's heuristic lang-ID (q_doc_language_id)
# and importance-weighting (q_dsir_domain_selection) with the trained-
# classifier leg of the standard curation triad.
#
# Scale shape (100 TB): features hash to a FIXED 2^13-bucket space
# (same md5 device the DSIR estimator and split logic replay exactly
# in DuckDB), so the broadcast-back side is constant-size at any
# corpus scale; priors/totals are 1-row aggregates; the corpus is
# touched twice (train counts, score) with exactly one doc_id-keyed
# shuffle on the scoring side. Seed labels come from metadata
# (lang == 'en'), the usual bootstrap before model-labeled rounds.
#
# predicted_pos derives from the ROUNDED score so both engines decide
# the boundary from the value they agree on (sum-of-logs at 4 dp —
# the same determinism class as q_doc_unigram_logprob, sweep-green at
# all three fixture scales).
# --------------------------------------------------------------------------
_NB_BUCKETS = 8192  # 2^13 — fixed model size at any corpus scale
_NB_POS_LANG = "en"


_NB_ORACLE = f"""
    WITH w AS (
      SELECT doc_id, lang = '{_NB_POS_LANG}' AS pos,
             string_split(text, ' ') AS words
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    big AS (
      SELECT doc_id, pos,
             ('0x' || substr(md5(unnest(
                 [words[i] || ' ' || words[i+1]
                  for i in range(1, len(words))])), 1, 8))::BIGINT
               % {_NB_BUCKETS} AS bkt
      FROM w),
    vocab AS (
      SELECT bkt,
             sum(CASE WHEN pos THEN 1 ELSE 0 END)::DOUBLE     AS cp,
             sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)::DOUBLE AS cn
      FROM big GROUP BY bkt),
    tot AS (SELECT sum(cp) AS np, sum(cn) AS nn,
                   count(*)::DOUBLE AS v FROM vocab),
    prior AS (
      SELECT ln(nullif(sum(CASE WHEN pos THEN 1 ELSE 0 END)::DOUBLE, 0)
                / nullif(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END), 0)) AS lp
      FROM w),
    scored AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_feat,
             round(any_value(prior.lp)
                   + sum(ln(((vocab.cp + 1) / (tot.np + tot.v))
                            / ((vocab.cn + 1) / (tot.nn + tot.v)))),
                   4) AS nb_score
      FROM big JOIN vocab USING (bkt) CROSS JOIN tot CROSS JOIN prior
      GROUP BY doc_id)
    SELECT doc_id, n_feat, nb_score, nb_score > 0 AS predicted_pos
    FROM scored
    """


def _nb_feature_buckets(docs: DataFrame, with_pos: bool) -> DataFrame:
    """``(doc_id, [pos,] bkt)`` — one row per hashed-bigram feature.
    Bigrams inline in the select (generator-pitfall rule: never explode
    an aliased complex expression after a withColumn); buckets via the
    engine's DuckDB-replayable md5 device."""
    cols = ["doc_id"]
    if with_pos:
        cols.append((F.col("lang") == _NB_POS_LANG).alias("pos"))
    w = docs.select(
        *cols, F.split("text", " ").alias("words")
    ).filter(F.size("words") >= 2)
    keep = ["doc_id", "pos"] if with_pos else ["doc_id"]
    return w.select(
        *keep,
        F.explode(
            F.expr(
                "transform(slice(words, 1, size(words) - 1),"
                " (x, i) -> concat(x, ' ', words[i + 1]))"
            )
        ).alias("gram"),
    ).select(
        *keep,
        (
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
            % _NB_BUCKETS
        ).alias("bkt"),
    )


def nb_train_quality_model(docs: DataFrame) -> DataFrame:
    """Train the hashed-bigram Naive Bayes quality model over labeled
    ``docs(doc_id, lang, text, ...)`` and return it FROZEN
    (materialized): ≤ ``_NB_BUCKETS`` rows of
    ``(bkt, log_odds, lp, default_lo)`` — per-bucket Laplace-smoothed
    log-odds plus the class prior and the unseen-bucket default, ready
    to broadcast under any number of scoring batches. Train-once /
    score-per-batch is the production split (CCNet scores crawl shards
    as they arrive); :func:`nb_score_documents` is the scoring half.

    Scale shape: the corpus is touched twice (bucket counts + prior),
    both combiner-friendly aggregations; the model is constant-size at
    any corpus scale. Vocab totals use the q11/q15 threshold pattern —
    materialize the vocab once (two consumers), 1-row agg, broadcast
    crossJoin — NOT a Window.partitionBy() (retired in r7: the global
    window tripped the single-partition audit and spammed WindowExec
    warnings)."""
    big = _nb_feature_buckets(docs, with_pos=True)
    vocab = materialize(
        big.groupBy("bkt").agg(
            F.sum(F.when(F.col("pos"), 1).otherwise(0))
            .cast("double")
            .alias("cp"),
            F.sum(F.when(~F.col("pos"), 1).otherwise(0))
            .cast("double")
            .alias("cn"),
        )
    )
    tot = vocab.agg(
        F.sum("cp").alias("np"),
        F.sum("cn").alias("nn"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    w = docs.select((F.col("lang") == _NB_POS_LANG).alias("pos"), "text").filter(
        F.size(F.split("text", " ")) >= 2
    )
    # nullif on BOTH prior terms: a single-class seed corpus is a
    # degenerate training set, and the two engines disagree on the raw
    # math (ANSI Spark THROWS on x/0 — one hostile corpus would kill
    # the job — while DuckDB returns ±inf). With the guards, both sides
    # agree on a NULL prior → NULL scores, the same survive-don't-crash
    # policy as the zero-norm cosine nullif.
    prior = w.agg(
        F.log(
            F.nullif(
                F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("double"),
                F.lit(0.0),
            )
            / F.nullif(
                F.sum(F.when(~F.col("pos"), 1).otherwise(0)).cast("double"),
                F.lit(0.0),
            )
        ).alias("lp")
    )
    log_odds = F.log(
        ((F.col("cp") + 1) / (F.col("np") + F.col("v")))
        / ((F.col("cn") + 1) / (F.col("nn") + F.col("v")))
    )
    # a bucket never seen in training scores the pure-Laplace ratio
    default_lo = F.log((F.col("nn") + F.col("v")) / (F.col("np") + F.col("v")))
    return materialize(
        vocab.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(prior))
        .select(
            "bkt",
            log_odds.alias("log_odds"),
            "lp",
            default_lo.alias("default_lo"),
        )
    )


def nb_score_documents(model: DataFrame, docs: DataFrame) -> DataFrame:
    """Score ``docs(doc_id, text, ...)`` against a frozen
    :func:`nb_train_quality_model` model — the per-batch half of the
    train-once/score-per-batch split, shared verbatim by the batch gate
    query and the streaming twin (``q_stream_quality_scores``), so
    stream-scored == batch-scored by construction (pinned in
    tests/test_quality_classifier.py). One broadcast join on the
    fixed-size model + one doc_id groupBy — the only corpus shuffle."""
    feats = _nb_feature_buckets(docs, with_pos=False)
    consts = model.agg(
        F.min("lp").alias("lp"), F.min("default_lo").alias("default_lo")
    )
    scored = feats.join(
        F.broadcast(model.select("bkt", "log_odds")), "bkt", "left"
    ).join(F.broadcast(consts))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feat"),
            F.round(
                F.min("lp") + F.sum(F.coalesce("log_odds", "default_lo")), 4
            ).alias("nb_score"),
        )
        .select(
            "doc_id",
            "n_feat",
            "nb_score",
            (F.col("nb_score") > 0).alias("predicted_pos"),
        )
    )


@query("q_quality_classifier_nb", oracle=_NB_ORACLE)
def q_quality_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, rebalance=True)
    return nb_score_documents(nb_train_quality_model(d), d)


# the PR-curve oracle reuses the NB oracle's CTE chain up to `scored`
_NB_ORACLE_BODY = _NB_ORACLE.split("SELECT doc_id, n_feat")[0].strip()
assert _NB_ORACLE_BODY.startswith("WITH ") and _NB_ORACLE_BODY.endswith(")")
_NB_ORACLE_BODY = _NB_ORACLE_BODY[len("WITH "):] + ","


# --------------------------------------------------------------------------
# Classifier EVALUATION: the precision/recall sweep every curation
# pipeline runs before picking the keep threshold (CCNet publishes
# exactly this curve for its quality classifier). Scores come from the
# SAME frozen model as the gate query (deterministic 4-dp sum-of-logs),
# labels from the metadata bootstrap (lang == 'en'), thresholds from a
# fixed grid broadcast over the scored corpus: one corpus-scale pass,
# one (threshold)-keyed combiner-friendly aggregation. Ratios use the
# exact integer count device (round4_ratio / HUGEINT replay) — and the
# 0-predictions edge nullifs to an agreed NULL precision.
# --------------------------------------------------------------------------
_PR_THRESHOLDS = (-20, -10, -5, -2, 0, 2, 5, 10, 20)


@query(
    "q_quality_classifier_pr",
    oracle=f"""
    WITH {_NB_ORACLE_BODY}
    labels AS (
      SELECT doc_id, lang = '{_NB_POS_LANG}' AS is_pos FROM documents),
    t AS (SELECT unnest([{", ".join(str(t) for t in _PR_THRESHOLDS)}]) AS threshold),
    j AS (
      SELECT t.threshold, s.nb_score > t.threshold AS pred, l.is_pos
      FROM scored s JOIN labels l USING (doc_id) CROSS JOIN t),
    agg AS (
      SELECT threshold,
             sum(CASE WHEN pred THEN 1 ELSE 0 END)::BIGINT AS n_pred_pos,
             sum(CASE WHEN pred AND is_pos THEN 1 ELSE 0 END)::BIGINT AS tp,
             sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS n_pos
      FROM j GROUP BY threshold)
    SELECT threshold::BIGINT AS threshold, n_pred_pos, tp,
           ((20000*tp::HUGEINT + nullif(n_pred_pos, 0))
              // (2*nullif(n_pred_pos, 0))) / 10000.0 AS precision_at_t,
           ((20000*tp::HUGEINT + nullif(n_pos, 0))
              // (2*nullif(n_pos, 0))) / 10000.0      AS recall_at_t
    FROM agg
    """,
)
def q_quality_classifier_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, rebalance=True)
    scored = nb_score_documents(nb_train_quality_model(d), d)
    labels = d.select("doc_id", (F.col("lang") == _NB_POS_LANG).alias("is_pos"))
    t = spark.createDataFrame(
        [(int(x),) for x in _PR_THRESHOLDS], "threshold long"
    )
    j = (
        scored.join(labels, "doc_id")
        .crossJoin(F.broadcast(t))
        .select(
            "threshold",
            (F.col("nb_score") > F.col("threshold")).alias("pred"),
            "is_pos",
        )
    )
    agg = j.groupBy("threshold").agg(
        F.sum(F.when(F.col("pred"), 1).otherwise(0)).cast("long").alias("n_pred_pos"),
        F.sum(F.when(F.col("pred") & F.col("is_pos"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("is_pos"), 1).otherwise(0)).cast("long").alias("n_pos"),
    )
    return agg.select(
        "threshold",
        "n_pred_pos",
        "tp",
        _r4(F.col("tp"), F.nullif(F.col("n_pred_pos"), F.lit(0))).alias(
            "precision_at_t"
        ),
        _r4(F.col("tp"), F.nullif(F.col("n_pos"), F.lit(0))).alias("recall_at_t"),
    )


# --------------------------------------------------------------------------
# Duplicate-cluster-aware train/val/test split (round 6): hashing each
# doc_id independently (q_doc_hash_split) lets NEAR-duplicates straddle
# the train/test boundary — the classic eval-leakage hole (a lightly
# edited copy of a test doc sits in train). The leakage-safe split keys
# the hash on the doc's duplicate-CLUSTER id (LSH candidates → connected
# components; singletons key on themselves), so an entire near-dup
# cluster always lands on ONE side. Same md5-bucket split device as
# q_doc_hash_split, same salt — singleton assignments are identical to
# the naive split's by construction.
#
# Scale shape: the LSH/CC machinery is the q_dedup_clusters pipeline
# (banded, capped buckets; pointer-doubling on the candidate-pair edge
# set only); the label join is PLAIN — cluster membership is corpus-
# proportional at web dup rates, so hint-broadcasting it is exactly the
# r5 scale mistake this engine removed. The split itself stays a pure
# projection.
# --------------------------------------------------------------------------


@query(
    "q_cluster_aware_split",
    oracle=f"""
    WITH RECURSIVE {_LSH_DUCK},
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM cand
      UNION
      SELECT doc_b AS a, doc_a AS b FROM cand),
    reach AS (
      SELECT a AS node, b AS peer FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a),
    labels AS (
      SELECT node, least(node, min(peer))::BIGINT AS label
      FROM reach GROUP BY node),
    k AS (
      SELECT d.doc_id, coalesce(l.label, d.doc_id) AS split_key
      FROM documents d LEFT JOIN labels l ON l.node = d.doc_id),
    b AS (
      SELECT doc_id, split_key,
             ('0x' || substr(md5(split_key::VARCHAR || ':{_SPLIT_SALT}'), 1, 8))::BIGINT
               % 100 AS bucket
      FROM k)
    SELECT doc_id,
           split_key::BIGINT AS split_key,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def q_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    pairs = _lsh_candidate_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    labels = connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("label")
    )
    # plain join — no broadcast hint on the corpus-proportional labels
    keyed = (
        d.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("label", "doc_id").alias("split_key")
        )
    )
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.col("split_key"), F.lit(_SPLIT_SALT))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return keyed.select(
        "doc_id",
        F.col("split_key").cast("long").alias("split_key"),
        split.alias("split"),
    )
