"""Text-analysis & deduplication surface over the ``documents`` table.

Large-scale training-data operators (beyond the reference's own surface,
per the build brief): exact dedup, n-gram Jaccard near-dup, MinHash+LSH,
token counting, quality scoring, language-ID, document fingerprinting.

Cross-engine determinism trick: every hash used here is ``md5`` (identical
hex output in Spark and DuckDB), and MinHash takes the lexicographic MIN
of salted md5 hex strings — a valid uniform hash family that both engines
compute bit-identically, with no dependency on engine-specific hash
functions. At 100 TB the same plans hold: shingling explodes rows but the
band-bucket join shuffles only (band_key) pairs, and exact dedup is a
single hash-partitioned groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators.bucketing import capped_buckets
from data_pipeline_with_big_data_stack_spark.operators.rollup_maintenance import (
    round4_ratio as _r4,
)
from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.session import prepare_session, scratch_dir
from data_pipeline_with_big_data_stack_spark.tables import load_table

# Tiny in-query stopword sets for the language-ID heuristic. Real corpora
# would load a broadcast table; inline literals keep the oracle expressible.
_STOP = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "de", "et", "que"),
}


def _docs(
    spark: SparkSession, sf_dir: str, rebalance: bool = False
) -> DataFrame:
    """``rebalance=True`` is for pipelines whose per-row compute
    (shingling, minhash, regex tokenization, rolling hashes) dwarfs a
    row's shuffle cost — see ``tables._scan_rebalance``. Cheap
    pipelines keep the default."""
    prepare_session(spark)
    return load_table(spark, sf_dir, "documents", rebalance=rebalance)


# --------------------------------------------------------------------------
# Token counting + basic text stats (whitespace tokenizer).
# --------------------------------------------------------------------------
@query(
    "q_doc_token_stats",
    oracle="""
    SELECT lang,
           count(*)                                               AS n_docs,
           round(avg(len(string_split(text, ' '))), 4)            AS avg_tokens,
           round(avg(n_chars), 4)                                 AS avg_chars,
           (sum(len(string_split(text, ' '))))::BIGINT            AS total_tokens,
           max(len(string_split(text, ' ')))                      AS max_tokens
    FROM documents
    GROUP BY lang
    """,
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    ntok = F.size(F.split(F.col("text"), " "))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(ntok).alias("total_tokens"),
        F.max(ntok).alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# Quality scoring: length / distinct-token ratio / stopword ratio — the
# heuristics a pretraining filter pipeline applies per document.
# --------------------------------------------------------------------------
@query(
    "q_doc_quality_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, n_chars,
             string_split(text, ' ') AS toks
      FROM documents)
    SELECT doc_id, lang,
           len(toks)                                          AS n_tokens,
           len(list_distinct(toks))                           AS n_distinct,
           ((20000*len(list_distinct(toks))::HUGEINT + len(toks))
              // (2*len(toks))) / 10000.0                     AS distinct_ratio,
           ((20000*len(list_filter(toks,
                 w -> w IN ('the','a','of','and','to')))::HUGEINT + len(toks))
              // (2*len(toks))) / 10000.0                     AS stopword_ratio,
           ((20000*n_chars::HUGEINT + len(toks))
              // (2*len(toks))) / 10000.0                     AS avg_token_len,
           CASE WHEN len(toks) BETWEEN 10 AND 2000
                 AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.1
                THEN 1 ELSE 0 END                             AS passes_filter
    FROM t
    """,
)
def q_doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    d = d.withColumn("toks", toks)
    n_tokens = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    stop = F.array(*[F.lit(w) for w in _STOP["en"]])
    n_stop = F.size(F.filter("toks", lambda w: F.array_contains(stop, w)))
    distinct_ratio = _r4(n_distinct, n_tokens)
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        distinct_ratio.alias("distinct_ratio"),
        _r4(n_stop, n_tokens).alias("stopword_ratio"),
        _r4(F.col("n_chars"), n_tokens).alias("avg_token_len"),
        F.when(
            n_tokens.between(10, 2000)
            & (n_distinct.cast("double") / n_tokens > 0.1),
            1,
        )
        .otherwise(0)
        .alias("passes_filter"),
    )


# --------------------------------------------------------------------------
# Language-ID: n-gram/stopword-hit heuristic with deterministic argmax.
# --------------------------------------------------------------------------
def _hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _STOP[lang])
    return f"len(list_filter(toks, w -> w IN ({words})))"


@query(
    "q_doc_language_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    scored AS (
      SELECT doc_id, lang,
             {_hits_sql('en')} AS en_hits,
             {_hits_sql('es')} AS es_hits,
             {_hits_sql('de')} AS de_hits,
             {_hits_sql('fr')} AS fr_hits
      FROM t)
    SELECT doc_id, lang AS actual_lang, en_hits, es_hits, de_hits, fr_hits,
           CASE WHEN greatest(en_hits, es_hits, de_hits, fr_hits) = 0 THEN 'unknown'
                WHEN en_hits >= greatest(es_hits, de_hits, fr_hits) THEN 'en'
                WHEN es_hits >= greatest(de_hits, fr_hits) THEN 'es'
                WHEN de_hits >= fr_hits THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM scored
    """,
)
def q_doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    d = d.withColumn("toks", F.split(F.col("text"), " "))
    def hit_count(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter("toks", lambda w: F.array_contains(arr, w)))

    hits = {lang: hit_count(words) for lang, words in _STOP.items()}
    scored = d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        hits["en"].alias("en_hits"),
        hits["es"].alias("es_hits"),
        hits["de"].alias("de_hits"),
        hits["fr"].alias("fr_hits"),
    )
    best = F.greatest("en_hits", "es_hits", "de_hits", "fr_hits")
    predicted = (
        F.when(best == 0, "unknown")
        .when(F.col("en_hits") >= F.greatest("es_hits", "de_hits", "fr_hits"), "en")
        .when(F.col("es_hits") >= F.greatest("de_hits", "fr_hits"), "es")
        .when(F.col("de_hits") >= F.col("fr_hits"), "de")
        .otherwise("fr")
    )
    return scored.withColumn("predicted_lang", predicted)


# --------------------------------------------------------------------------
# Document fingerprinting: md5 content hash + a cheap structural
# fingerprint (first/last token + length) for blocking.
# --------------------------------------------------------------------------
@query(
    "q_doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text)))                     AS content_hash,
           string_split(text, ' ')[1] || ':' ||
             string_split(text, ' ')[-1] || ':' ||
             CAST(len(string_split(text, ' ')) AS VARCHAR) AS struct_key
    FROM documents
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"),
        # F.concat (NULL-propagating, matching DuckDB ||), NOT concat_ws
        # (which skips nulls): a NULL text must yield a NULL struct_key
        # in both engines
        F.concat(
            toks.getItem(0),
            F.lit(":"),
            F.element_at(toks, -1),
            F.lit(":"),
            F.size(toks).cast("string"),
        ).alias("struct_key"),
    )


# --------------------------------------------------------------------------
# Exact dedup: hash-groupBy on normalized content. At 100 TB this is ONE
# shuffle on a 128-bit key with partial aggregation map-side.
# --------------------------------------------------------------------------
@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           count(*)               AS n_copies,
           min(doc_id)            AS canonical_doc_id
    FROM documents
    GROUP BY 1
    HAVING count(*) >= 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_copies") >= 1)
    )


# --------------------------------------------------------------------------
# Shingling: token 3-grams (the n-gram unit for fuzzy dedup). Unigrams
# degenerate on small vocabularies — every doc shares most words — while
# trigram shingles separate documents sharply, which keeps MinHash bands
# selective and LSH buckets small at scale.
# --------------------------------------------------------------------------
_SHINGLES_SPARK = """
    CASE WHEN size(words) >= 3
         THEN array_distinct(transform(sequence(0, size(words) - 3),
              i -> concat_ws(' ', words[i], words[i+1], words[i+2])))
         ELSE array(concat_ws(' ', words)) END
"""

_SHINGLES_DUCK = """
    CASE WHEN len(words) >= 3
         THEN list_distinct([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                             for i in range(1, len(words) - 1)])
         ELSE [array_to_string(words, ' ')] END
"""


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL text normalizes to '' BEFORE shingling: Spark's concat_ws
    already folds a null words array to the empty shingle while
    DuckDB's array_to_string propagates NULL, so without the coalesce
    (mirrored in _SIG_DUCK and every shingle-consuming oracle) a NULL
    document diverges from its oracle across the whole MinHash family
    — caught by the hostile-documents robustness suite."""
    d = _docs(spark, sf_dir, rebalance=True)
    return d.withColumn(
        "words", F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    ).withColumn("shingles", F.expr(_SHINGLES_SPARK))


# q_dedup_ngram_jaccard is defined AFTER the MinHash/LSH block below — it
# verifies LSH candidate pairs with exact n-gram-set Jaccard (candidate
# generation + verification, the production fuzzy-dedup pipeline shape).


# --------------------------------------------------------------------------
# MinHash signatures: k=6 salted-md5 min-hash over the trigram-shingle
# set. min(md5(salt || s)) is computed identically by both engines (hex
# strings compare lexicographically) — no engine-specific hash needed.
# --------------------------------------------------------------------------
_SALTS = ("s0", "s1", "s2", "s3", "s4", "s5")


def _mh_sql(salt: str) -> str:
    return f"list_min([md5('{salt}' || s) for s in sh])"


_SIG_DUCK = f"""
      SELECT doc_id,
             {_mh_sql('s0')} AS mh0, {_mh_sql('s1')} AS mh1,
             {_mh_sql('s2')} AS mh2, {_mh_sql('s3')} AS mh3,
             {_mh_sql('s4')} AS mh4, {_mh_sql('s5')} AS mh5
      FROM (SELECT doc_id, {_SHINGLES_DUCK} AS sh
            FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS words
                  FROM documents))
"""


@query(
    "q_minhash_signatures",
    oracle=f"WITH sig AS ({_SIG_DUCK}) SELECT * FROM sig",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _shingled(spark, sf_dir).select("doc_id", F.col("shingles").alias("sh"))

    def minhash(salt: str):
        # NB: the transform lambda must take exactly one arg — a two-arg
        # lambda is interpreted by Spark as (element, index).
        return F.array_min(
            F.transform("sh", lambda s: F.md5(F.concat(F.lit(salt), s)))
        )

    cols = [minhash(salt).alias(f"mh{i}") for i, salt in enumerate(_SALTS)]
    return t.select("doc_id", *cols)


# --------------------------------------------------------------------------
# MinHash-LSH candidate pairs: 3 bands × 2 rows; band key = md5 of the
# concatenated row signatures; docs sharing any band key are candidates.
# The only shuffle is on band_key — the classic shingle→minhash→band→
# bucket-join pipeline, linear in corpus size.
# --------------------------------------------------------------------------
# Per-bucket id cap. LSH keeps buckets near-singleton by construction,
# but real web corpora have degenerate mega-buckets (empty / boilerplate
# documents hash identically); an unbounded collect_list would
# materialize such a bucket in one task. The cap bounds per-task memory
# at the cost of recall INSIDE a mega-bucket only (docs beyond the first
# _LSH_MAX_BUCKET ids of a bucket lose candidacy via that band; they can
# still pair via their other bands). The oracle applies the identical
# cap (row_number ≤ cap over the same doc_id order) so the gate stays
# exact.
_LSH_MAX_BUCKET = 256

_LSH_DUCK = f"""
    sig AS ({_SIG_DUCK}),
    bands AS (
      SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS band_key FROM sig
      UNION ALL
      SELECT doc_id, 1 AS band, md5(mh2 || mh3) AS band_key FROM sig
      UNION ALL
      SELECT doc_id, 2 AS band, md5(mh4 || mh5) AS band_key FROM sig),
    bands_capped AS (
      SELECT doc_id, band, band_key FROM (
        SELECT doc_id, band, band_key,
               row_number() OVER (PARTITION BY band, band_key
                                  ORDER BY doc_id) AS rk
        FROM bands) WHERE rk <= {_LSH_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands_capped a JOIN bands_capped b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
"""

# Exact-Jaccard verification of the LSH candidates — THE one definition
# of the verify rule (threshold, shingle source, rounding), shared by
# the inline batch query, the materialized-index pipeline, and the
# streaming ingest-dedup oracle so the three gates can never
# desynchronize. Appended after _LSH_DUCK in a WITH chain; yields `ver`.
_VERIFY_DUCK = f"""
    sh AS (
      SELECT doc_id, {_SHINGLES_DUCK} AS sh
      FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS words
            FROM documents)),
    ver AS (
      SELECT c.doc_a, c.doc_b,
             round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                   / len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.8)
"""


def _lsh_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (doc, band) with the band's bucket key. Built with a
    single posexplode so the signature pipeline is computed ONCE per plan
    branch — a 3-way union of per-band selects re-evaluates the minhash
    subtree per band (observed 10× slower at sf0.1)."""
    sig = q_minhash_signatures(spark, sf_dir)
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.md5(F.concat("mh0", "mh1")),
                F.md5(F.concat("mh2", "mh3")),
                F.md5(F.concat("mh4", "mh5")),
            )
        ).alias("band", "band_key"),
    )


def _lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-grouped pair generation: ONE pass computes signatures, ONE
    shuffle groups docs by (band, band_key), and pairs explode inside
    each bucket (sorted doc list → i<j combinations). A self-join
    formulation evaluates the whole signature subtree twice and shuffles
    the table twice; this shape is linear in corpus size + Σ bucket², and
    LSH keeps buckets tiny by construction — the correct scale behavior
    at 100 TB (skewed mega-buckets would indicate a degenerate band
    width, not a join-strategy problem)."""
    bands = _lsh_bands(spark, sf_dir)
    buckets = capped_buckets(
        bands, ["band", "band_key"], "doc_id", F.col("doc_id"), _LSH_MAX_BUCKET
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


@query(
    "q_dedup_minhash_lsh",
    oracle=f"WITH {_LSH_DUCK} SELECT doc_a, doc_b FROM cand",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_candidate_pairs(spark, sf_dir)


# --------------------------------------------------------------------------
# N-gram Jaccard near-dup: exact trigram-shingle-set Jaccard computed on
# the LSH candidate pairs (generation via LSH bands, verification via
# exact set Jaccard — the production fuzzy-dedup pipeline). The verify
# join is two hash joins on doc_id; the pair list is tiny relative to the
# corpus, so the expensive set intersection runs only on candidates.
# --------------------------------------------------------------------------
@query(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_LSH_DUCK},
    {_VERIFY_DUCK}
    SELECT doc_a, doc_b, jaccard FROM ver
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand = _lsh_candidate_pairs(spark, sf_dir)
    sh = _shingled(spark, sf_dir).select("doc_id", F.col("shingles").alias("sh"))
    x = sh.alias("x")
    y = sh.alias("y")
    inter = F.size(F.array_intersect(F.col("x.sh"), F.col("y.sh")))
    union = F.size(F.array_union(F.col("x.sh"), F.col("y.sh")))
    jac = inter.cast("double") / union
    return (
        cand.join(x, F.col("doc_a") == F.col("x.doc_id"))
        .join(y, F.col("doc_b") == F.col("y.doc_id"))
        .withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# Per-source profile (A5 analogue on documents — GROUP BY source_file
# profile, GOES_PIPELINE_REPORT.md:275-283).
# --------------------------------------------------------------------------
@query(
    "q_doc_source_profile",
    oracle="""
    SELECT source, count(*) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY source
    """,
)
def q_doc_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


# --------------------------------------------------------------------------
# BPE-ish regex tokenization (brief: "token counting — whitespace + a
# BPE-ish regex"): lowercase runs / capitalized words / digit runs /
# single punctuation — the pre-tokenizer split GPT-style BPE vocabularies
# assume. Whitespace counting is q_doc_token_stats above.
# --------------------------------------------------------------------------
_BPE_PAT = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\s]"


@query(
    "q_doc_bpe_token_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_extract_all(text, '{_BPE_PAT}') AS toks
      FROM documents)
    SELECT lang,
           count(*)                                    AS n_docs,
           (sum(len(toks)))::BIGINT                    AS total_tokens,
           round(avg(len(toks)), 4)                    AS avg_tokens,
           round(avg(len(list_distinct(toks))), 4)     AS avg_distinct,
           max(len(toks))                              AS max_tokens
    FROM t GROUP BY lang
    """,
)
def q_doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, rebalance=True)
    # F.lit pattern, not an F.expr SQL literal — Spark SQL string parsing
    # would eat the backslash in \s and silently tokenize whitespace
    toks = F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    d = d.withColumn("toks", toks)
    n = F.size("toks")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n).alias("total_tokens"),
        F.round(F.avg(n), 4).alias("avg_tokens"),
        F.round(F.avg(F.size(F.array_distinct("toks"))), 4).alias("avg_distinct"),
        F.max(n).alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# Rolling-hash document fingerprint (brief: "document fingerprinting
# (rolling hash)"): polynomial hash acc = (acc*31 + h(token)) mod p over
# the token stream — order-sensitive (unlike the md5 content hash above),
# so reordered-token docs get distinct fingerprints while identical
# streams collide. h(token) is the usual cross-engine md5-prefix int.
# --------------------------------------------------------------------------
_MOD = 1_000_000_007


@query(
    "q_doc_rolling_hash",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             [('0x' || substr(md5(w), 1, 8))::BIGINT
              for w in string_split(text, ' ')] AS hs
      FROM documents)
    SELECT doc_id,
           list_reduce(list_prepend(0::BIGINT, hs),
                       (acc, x) -> (acc * 31 + x) % {_MOD}) AS fingerprint,
           len(hs) AS n_tokens
    FROM t
    """,
)
def q_doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir, rebalance=True)
    hs = F.expr(
        "transform(split(text, ' '), "
        "w -> cast(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT))"
    )
    fp = F.aggregate(
        hs, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % _MOD
    )
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# Corpus TF-IDF term statistics: the classic text-analysis reduction
# (term importance for indexing / keyword surfacing). One explode +
# two term-keyed aggregations — linear, map-side-combinable; N rides
# along as a broadcast 1-row aggregate. Ranking uses the ROUNDED score
# (plus term tie-break) so a last-ulp ln() difference between engines
# cannot reorder the result.
# --------------------------------------------------------------------------
_TFIDF_TOP = 20


@query(
    "q_doc_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
    agg AS (SELECT term, (sum(tf))::BIGINT AS total_tf, count(*) AS df
            FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term, total_tf, df,
           round(total_tf * ln(n_docs::DOUBLE / df), 4) AS tfidf
    FROM agg CROSS JOIN n
    ORDER BY tfidf DESC, term LIMIT {_TFIDF_TOP}
    """,
)
def q_doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).withColumn("words", F.split("text", " "))
    tok = d.select("doc_id", F.explode("words").alias("term"))
    tf = tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    agg = tf.groupBy("term").agg(
        F.sum("tf").cast("long").alias("total_tf"),
        F.count(F.lit(1)).alias("df"),
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = agg.crossJoin(F.broadcast(n)).select(
        "term",
        "total_tf",
        "df",
        F.round(
            F.col("total_tf")
            * F.log(F.col("n_docs").cast("double") / F.col("df")),
            4,
        ).alias("tfidf"),
    )
    return scored.orderBy(F.col("tfidf").desc(), "term").limit(_TFIDF_TOP)


# --------------------------------------------------------------------------
# BPE merge training (operators/bpe.py): learn the first merges of a
# GPT-style tokenizer from the corpus itself. Iterative driver-
# coordinated loop (argmax row per round) over a distributed
# Zipf-bounded word-frequency table. Fully ORACLED since round 8: the
# trainer is deterministic (count-desc / pair-lex tie-breaks,
# left-to-right non-overlapping fold), so queries/bpe_oracle.py replays
# the whole k-round trajectory as chained DuckDB CTEs — the same device
# as the MMR / k-means oracles — including the batched disjoint-pair
# greedy selection (a recursive CTE) and the merge fold (islands +
# parity over adjacent-match runs). Bit-exact equality with a
# pure-Python reference implementation remains pinned in
# tests/test_bpe.py.
# --------------------------------------------------------------------------
_BPE_N_MERGES = 12

from data_pipeline_with_big_data_stack_spark.queries.bpe_oracle import (  # noqa: E402
    bpe_tokenize_oracle,
    bpe_train_oracle,
)


@query("q_bpe_train_merges", oracle=bpe_train_oracle(_BPE_N_MERGES))
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_with_big_data_stack_spark.operators.bpe import train_bpe

    words = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    merges = train_bpe(words, _BPE_N_MERGES)
    return spark.createDataFrame(
        merges, "rank long, left string, right string, merged string, pair_count long"
    ).select("rank", "left", "right", "merged", "pair_count")


@query("q_doc_tokenize_bpe", oracle=bpe_tokenize_oracle(_BPE_N_MERGES))
def q_doc_tokenize_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the corpus BPE merges in BATCHED mode (top-N disjoint
    pairs per round — the production-training trick, one Spark round
    instead of one per merge), then tokenize the corpus with them
    (vocabulary-cached constant-depth apply — see
    operators/bpe.apply_bpe) and report per-doc whitespace vs BPE token
    counts. Deterministic end to end and fully oracled (round 8): the
    DuckDB side replays the batched training trajectory and reads the
    final vocabulary state (sequential apply of the learned merges to
    the training corpus IS the trainer's final state); trainer (both
    modes) and applier also stay pinned bit-exactly vs the pure-Python
    reference in tests/test_bpe.py. ``tokens_per_word`` rounds in
    integer space (round4 half-offset device) so the 4-dp value is
    engine-independent."""
    from data_pipeline_with_big_data_stack_spark.operators.bpe import apply_bpe, train_bpe

    d = _docs(spark, sf_dir)
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    merges = train_bpe(words, _BPE_N_MERGES, merges_per_round=_BPE_N_MERGES)
    out = apply_bpe(d, "text", merges, "doc_id")
    n_ws = F.size(F.split("text", " ")).cast("long")
    # integer-space 4-dp rounding: round(p/q, 4) on a double diverges
    # between engines at exact half-boundaries (q = 160 makes p/q a
    # non-representable .XXXX5); both counts are non-negative so the
    # sign-less half-offset form is exact here, and `div` keeps the
    # whole device in BIGINT arithmetic
    return out.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        "n_bpe_tokens",
        (
            F.expr(
                "(2 * n_bpe_tokens * 10000 + size(split(text, ' '))) "
                "div (2 * size(split(text, ' ')))"
            )
            / F.lit(10000.0)
        ).alias("tokens_per_word"),
    )


# --------------------------------------------------------------------------
# The MATERIALIZED half of fuzzy dedup (round 7): build the signature
# index ONCE as a band0-bucketed metastore table
# (operators/dedup_index.build_minhash_index — at 100 TB signature
# computation is the dominant linear cost and must not re-run per
# query), then generate candidates from the INDEX and verify exact
# Jaccard on candidates only. Signatures, caps, and the verify rule are
# byte-identical to the inline batch pipeline, so this query shares
# q_dedup_ngram_jaccard's oracle — the driver value-checks the whole
# build → bucketed-scan → pair → verify path, like
# q_ann_ivfpq_index_search does for the vector index. The verified
# pairs are written to a temp parquet before the managed table is
# dropped (the lazy plan must not outlive its table).
# --------------------------------------------------------------------------
@query(
    "q_dedup_index_pipeline",
    oracle=f"""
    WITH {_LSH_DUCK},
    {_VERIFY_DUCK}
    SELECT doc_a, doc_b, jaccard FROM ver
    """,
)
def q_dedup_index_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from data_pipeline_with_big_data_stack_spark.operators.dedup_index import (
        build_minhash_index,
        candidate_pairs,
        verify_jaccard,
    )

    d = _docs(spark, sf_dir, rebalance=True)
    tbl = f"dedup_idx_{uuid.uuid4().hex[:12]}"
    out = scratch_dir("dedup_index_") + "/pairs"
    build_minhash_index(d, tbl)
    try:
        ver = verify_jaccard(candidate_pairs(spark.table(tbl)), d, threshold=0.8)
        ver.write.mode("overwrite").parquet(out)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    return spark.read.parquet(out)
