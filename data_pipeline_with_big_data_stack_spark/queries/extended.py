"""Extended operator surface: SimHash dedup, as-of join, range join,
exact percentiles, grouping sets, and additional TPC-H-shaped queries.

These fill capability rows the reference lacks entirely (joins §2.3,
windows §2.5, sketches A9) with Spark-first implementations and DuckDB
oracles. Cross-engine hash determinism uses the same md5 trick as
textops.py; SimHash bits are the high bit of each md5 hex nibble.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators.bucketing import capped_buckets
from data_pipeline_with_big_data_stack_spark.operators.rollup_maintenance import (
    round4_ratio as _r4,
    round_ratio as _rr,
)
from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.queries.textops import (
    _SHINGLES_DUCK,
    _SHINGLES_SPARK,
)
from data_pipeline_with_big_data_stack_spark.session import materialize, prepare_session
from data_pipeline_with_big_data_stack_spark.tables import load_table


def _t(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name, rebalance=rebalance)


# ==========================================================================
# SimHash near-duplicate detection — standard 64-bit fingerprint carried
# as two 32-bit halves (hi/lo), hamming threshold 3.
#
# Per shingle: a 64-bit hash from the md5 hex prefix. Per document, bit j
# is the sign of the Σ(+1/-1) vote over shingles. The vote is an
# EXPLODE + hash-aggregate with 64 conditional sums — whole-stage-codegen
# columnar aggregation, not an interpreted higher-order lambda (measured
# ~4× faster at sf0.1), and the partial aggregation makes the shuffle
# carry only one 64-sum row per document.
#
# Candidates: 4 × 16-bit bands (pigeonhole guarantees any pair with
# hamming <= 3 shares one); 16-bit bands keep buckets near-singleton at
# any corpus size where 64-bit simhash is meaningful, so the Σ bucket²
# pair explosion stays linear-ish — the property that matters at 100 TB.
# ==========================================================================
_HAM_T = 3


def _vote_sums_duck() -> str:
    hi = ", ".join(
        f"sum(CASE WHEN (hi >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS h{j}"
        for j in range(32)
    )
    lo = ", ".join(
        f"sum(CASE WHEN (lo >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS l{j}"
        for j in range(32)
    )
    return hi + ", " + lo


def _sig_assemble_duck() -> tuple[str, str]:
    hi = " + ".join(f"(CASE WHEN h{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
    lo = " + ".join(f"(CASE WHEN l{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(32))
    return hi, lo


def _simhash_duck() -> str:
    hi_expr, lo_expr = _sig_assemble_duck()
    return f"""
      WITH sh AS (
        SELECT doc_id, {_SHINGLES_DUCK} AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
      ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      v AS (
        SELECT doc_id,
               ('0x' || substr(md5(s), 1, 8))::BIGINT AS hi,
               ('0x' || substr(md5(s), 9, 8))::BIGINT AS lo
        FROM ex),
      bits AS (SELECT doc_id, {_vote_sums_duck()} FROM v GROUP BY doc_id),
      sig AS (SELECT doc_id, ({hi_expr})::BIGINT AS sig_hi,
                             ({lo_expr})::BIGINT AS sig_lo FROM bits)
    """


# Per-bucket cap — see operators/bucketing.py for the memory/recall
# trade; the oracle mirrors it exactly via row_number ≤ cap below.
_SIM_MAX_BUCKET = 256

_SIMHASH_PAIRS_ORACLE = (
    _simhash_duck()
    + f"""
    , bands AS (
      SELECT doc_id, sig_hi, sig_lo, b.band_idx,
             CASE b.band_idx
               WHEN 0 THEN (sig_hi >> 16) & 65535
               WHEN 1 THEN sig_hi & 65535
               WHEN 2 THEN (sig_lo >> 16) & 65535
               ELSE sig_lo & 65535 END AS band_val
      FROM sig CROSS JOIN (SELECT unnest(range(4)) AS band_idx) b),
    bands_capped AS (
      SELECT doc_id, sig_hi, sig_lo, band_idx, band_val FROM (
        SELECT *, row_number() OVER (PARTITION BY band_idx, band_val
                                     ORDER BY doc_id) AS rk
        FROM bands) WHERE rk <= {_SIM_MAX_BUCKET}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sig_hi AS ahi, a.sig_lo AS alo,
             b.sig_hi AS bhi, b.sig_lo AS blo
      FROM bands_capped a JOIN bands_capped b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) AS hamming
    FROM cand
    WHERE bit_count(xor(ahi, bhi)) + bit_count(xor(alo, blo)) <= {_HAM_T}
    """
)


def _simhash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: 64-bit-per-shingle voting is the heaviest per-row
    # compute in the text family (see tables._scan_rebalance)
    d = _t(spark, sf_dir, "documents", rebalance=True)
    # NB: explode is applied to the shingle expression INLINE — exploding a
    # withColumn'd alias makes Catalyst splice the full expression into the
    # generator's implicit `size(e) > 0 AND isnotnull(e)` filter, where it
    # is re-evaluated (twice, interpreted) per input row: measured 12×
    # slower at sf0.1.
    ex = d.withColumn("words", F.split("text", " ")).select(
        "doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("s")
    )
    v = ex.select(
        "doc_id",
        F.expr("cast(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)").alias("hi"),
        F.expr("cast(conv(substring(md5(s), 9, 8), 16, 10) AS BIGINT)").alias("lo"),
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col(h), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"{h[0]}{j}")
        for h in ("hi", "lo")
        for j in range(32)
    ]
    bits = v.groupBy("doc_id").agg(*votes)
    sig_hi = None
    sig_lo = None
    for j in range(32):
        bh = F.when(F.col(f"h{j}") >= 0, F.lit(1 << j)).otherwise(0)
        bl = F.when(F.col(f"l{j}") >= 0, F.lit(1 << j)).otherwise(0)
        sig_hi = bh if sig_hi is None else sig_hi + bh
        sig_lo = bl if sig_lo is None else sig_lo + bl
    return bits.select(
        "doc_id",
        sig_hi.cast("long").alias("sig_hi"),
        sig_lo.cast("long").alias("sig_lo"),
    )


@query("q_dedup_simhash", oracle=_SIMHASH_PAIRS_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _simhash_spark(spark, sf_dir)
    # bucket-grouped pair generation (see textops._lsh_candidate_pairs):
    # signatures computed once, one shuffle on the band key, pairs explode
    # inside each (near-singleton, thanks to 16-bit bands) bucket
    bands = sig.select(
        "doc_id",
        "sig_hi",
        "sig_lo",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_idx"),
    ).withColumn(
        "band_val",
        F.expr(
            "CASE band_idx WHEN 0 THEN shiftright(sig_hi, 16) & 65535 "
            "WHEN 1 THEN sig_hi & 65535 "
            "WHEN 2 THEN shiftright(sig_lo, 16) & 65535 "
            "ELSE sig_lo & 65535 END"
        ),
    )
    buckets = capped_buckets(
        bands,
        ["band_idx", "band_val"],
        "doc_id",
        F.struct("doc_id", "sig_hi", "sig_lo"),
        _SIM_MAX_BUCKET,
    ).withColumnRenamed("ids", "docs")
    pairs = buckets.select(
        F.explode(
            F.expr(
                """
                flatten(transform(docs, (x, i) ->
                    transform(slice(docs, i + 2, size(docs)), y ->
                        struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
                               x.sig_hi AS ahi, x.sig_lo AS alo,
                               y.sig_hi AS bhi, y.sig_lo AS blo))))
                """
            )
        ).alias("p")
    )
    cand = pairs.select("p.*").distinct()
    ham = F.bit_count(F.col("ahi").bitwiseXOR(F.col("bhi"))) + F.bit_count(
        F.col("alo").bitwiseXOR(F.col("blo"))
    )
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= _HAM_T
    )


# ==========================================================================
# As-of join: each 'purchase' event matched to the most recent prior (or
# simultaneous) 'click' by the same user. Spark-first implementation is
# the union+window pattern (SURVEY §2.3): ONE shuffle on user_id, no
# range explosion — the scalable as-of at any data size. Refs are
# pre-deduped per (user, ts) so the match is deterministic on ties.
# ==========================================================================
@query(
    "q_asof_purchase_to_click",
    oracle="""
    WITH refs AS (
      SELECT user_id, ts, max(value) AS ref_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    probes AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts,
           r.ts AS matched_ts,
           round(r.ref_value, 6) AS matched_value,
           round(p.value, 6) AS purchase_value
    FROM probes p ASOF JOIN refs r
      ON p.user_id = r.user_id AND p.ts >= r.ts
    """,
)
def q_asof_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    refs = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("ref_value"))
        .select("user_id", "ts", "ref_value", F.lit(1).alias("is_ref"))
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(0).alias("is_ref"),
    )
    tagged = refs.unionByName(probes, allowMissingColumns=True)
    # refs sort before probes at equal ts (is_ref desc) so >= semantics hold
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_ref").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ref_ts = F.last(F.when(F.col("is_ref") == 1, F.col("ts")), ignorenulls=True).over(w)
    ref_val = F.last(
        F.when(F.col("is_ref") == 1, F.col("ref_value")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("matched_ts", ref_ts)
        .withColumn("matched_value", F.round(ref_val, 6))
        .filter((F.col("is_ref") == 0) & F.col("matched_ts").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            "matched_ts",
            "matched_value",
            F.round("purchase_value", 6).alias("purchase_value"),
        )
    )


# ==========================================================================
# Range join: events binned by literal value bands — broadcast the band
# table, BNLJ against it (4 rows broadcast; never a shuffle of events).
# ==========================================================================
_BANDS = [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 300.0),
          ("extreme", 300.0, 1000.0)]
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@query(
    "q_range_join_value_bands",
    oracle=f"""
    SELECT b.band,
           count(*)                 AS n_events,
           (sign(sum(e.value::DECIMAL(18,6)))::HUGEINT * ((2*abs((sum(e.value::DECIMAL(18,6)) * 1000000)::HUGEINT) + 100*count(*)) // (200*count(*)))) / 10000.0 AS avg_value,
           round(min(e.value), 4)   AS min_value,
           round(max(e.value), 4)   AS max_value
    FROM events e
    JOIN (VALUES {_BANDS_SQL}) b(band, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def q_range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    bands = e.sparkSession.createDataFrame(_BANDS, ["band", "lo", "hi"])
    joined = e.join(
        F.broadcast(bands), (e.value >= bands.lo) & (e.value < bands.hi)
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        _r4(
            F.sum(F.col("value").cast("decimal(18,6)")), F.count(F.lit(1))
        ).alias("avg_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


# ==========================================================================
# Exact percentiles per group (A9's sketch row, exact flavor — Druid
# loads histogram/quantile extensions; Spark's exact `percentile` and
# DuckDB's quantile_cont interpolate identically).
# ==========================================================================
@query(
    "q_percentiles_by_event_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 4) AS p25,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.75), 4) AS p75,
           round(quantile_cont(value, 0.95), 4) AS p95
    FROM events GROUP BY event_type
    """,
)
def q_percentiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("value", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
    )


# ==========================================================================
# Grouping sets over orders (SQL surface; gap row in SURVEY §2.4).
# ==========================================================================
@query(
    "q_grouping_sets_orders",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice::DECIMAL(18,6)), 2)::DOUBLE AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
)
def q_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gs")
    return o.sparkSession.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_orders,
               CAST(round(sum(cast(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
        """
    )


# ==========================================================================
# TPC-H-shaped additions over the fixture's column subset.
# ==========================================================================
@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum((l_extendedprice * l_discount)::DECIMAL(18,6)), 2)::DOUBLE AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q10_returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6)), 2)::DOUBLE AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT (sign(sum((CASE WHEN p.p_type = 'ECONOMY'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)::DECIMAL(18,6)))::HUGEINT
            * ((2 * abs((100 * sum((CASE WHEN p.p_type = 'ECONOMY'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)::DECIMAL(18,6)) * 1000000)::HUGEINT) * 10000
             + (sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6)) * 1000000)::HUGEINT)
            // (2 * (sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6)) * 1000000)::HUGEINT)))
           / 10000.0 AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-09-01'
      AND l.l_shipdate < DATE '1996-10-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-09-01")
            & (F.col("l_shipdate") < "1996-10-01")
        )
        .join(p, l.l_partkey == p.p_partkey)
        .agg(
            _rr(
                F.lit(100)
                * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0).cast("decimal(18,6)")),
                F.sum(rev.cast("decimal(18,6)")),
                4,
            ).alias("promo_share_pct")
        )
    )


@query(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped EXISTS: orders having any lineitem shipped >90 days
    after order date (the fixture lacks commit/receipt dates) — a
    left-semi join, no row multiplication."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# ==========================================================================
# Web-log regex parsing (S13/F11 — `database_etl.py:220-263`): combined-
# log-format lines parsed back to structured records with regexp_extract
# per field + int casts, then profiled by status. Lines are synthesized
# deterministically from events so the oracle rebuilds the exact corpus.
# ==========================================================================
_LOG_PAT = r'^(\S+) \S+ \S+ \[([^\]]*)\] "(\S+) (\S+) [^"]*" (\d+) (\d+)'


@query(
    "q_weblog_parse_profile",
    oracle=f"""
    WITH lines AS (
      SELECT printf('10.0.%d.%d - - [01/Jan/2024] "GET /page/%d HTTP/1.1" %d %d',
                    (user_id % 250)::INT, (event_id % 250)::INT,
                    (event_id % 40)::INT,
                    CASE event_type WHEN 'error' THEN 500
                         WHEN 'view' THEN 200 WHEN 'click' THEN 200
                         WHEN 'purchase' THEN 201 ELSE 302 END,
                    floor(value * 10)::INT) AS line
      FROM events),
    parsed AS (
      SELECT regexp_extract(line, '{_LOG_PAT}', 1)        AS ip,
             regexp_extract(line, '{_LOG_PAT}', 3)        AS method,
             regexp_extract(line, '{_LOG_PAT}', 4)        AS url,
             regexp_extract(line, '{_LOG_PAT}', 5)::INT   AS status,
             regexp_extract(line, '{_LOG_PAT}', 6)::BIGINT AS size
      FROM lines)
    SELECT status, count(*) AS n_requests,
           count(DISTINCT ip) AS n_ips,
           count(DISTINCT url) AS n_urls,
           (sum(size))::BIGINT AS total_bytes
    FROM parsed
    WHERE method = 'GET'
    GROUP BY status
    """,
)
def q_weblog_parse_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    status = (
        F.when(F.col("event_type") == "error", 500)
        .when(F.col("event_type").isin("view", "click"), 200)
        .when(F.col("event_type") == "purchase", 201)
        .otherwise(302)
    )
    lines = e.select(
        F.format_string(
            '10.0.%d.%d - - [01/Jan/2024] "GET /page/%d HTTP/1.1" %d %d',
            (F.col("user_id") % 250).cast("int"),
            (F.col("event_id") % 250).cast("int"),
            (F.col("event_id") % 40).cast("int"),
            status,
            F.floor(F.col("value") * 10).cast("int"),
        ).alias("line")
    )
    parsed = lines.select(
        F.regexp_extract("line", _LOG_PAT, 1).alias("ip"),
        F.regexp_extract("line", _LOG_PAT, 3).alias("method"),
        F.regexp_extract("line", _LOG_PAT, 4).alias("url"),
        F.regexp_extract("line", _LOG_PAT, 5).cast("int").alias("status"),
        F.regexp_extract("line", _LOG_PAT, 6).cast("long").alias("size"),
    )
    return (
        parsed.filter(F.col("method") == "GET")
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.countDistinct("ip").alias("n_ips"),
            F.countDistinct("url").alias("n_urls"),
            F.sum("size").alias("total_bytes"),
        )
    )


# ==========================================================================
# Further TPC-H shapes on the fixture's column subset — multi-join
# volume/market-share analytics, distribution, correlated-aggregate
# filters. Broadcast hints on dimension tables throughout.
# ==========================================================================
@query(
    "q7_nation_volume_matrix",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           -- exact decimal summation: double-sum order noise flips the
           -- cent-rounding boundary on large many-group totals
           round(sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6)), 2)::DOUBLE
             AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
      AND l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY cn.n_name, sn.n_name, year(l.l_shipdate)
    """,
)
def q7_nation_volume_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.round(F.sum(rev.cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_suppliers_by_revenue",
    oracle="""
    WITH srev AS (
      SELECT l_suppkey, round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM srev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM srev)
    """,
)
def q15_top_suppliers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue view + equality with its own max (the spec's
    CREATE VIEW consumed twice). The view is MATERIALIZED once — tiny,
    one row per active supplier — then the max is a 1-row aggregate
    broadcast back onto it (the q11 threshold pattern). This avoids
    both scale traps: a global window would funnel the SF-proportional
    supplier rows through ONE task (sf100 ≈ 1 M rows in a single
    partition), and a naive self-reference would re-scan lineitem for
    the max branch (Catalyst does not reuse the exchange across the
    broadcast boundary — measured, 2 scans without the checkpoint).

    localCheckpoint vs the alternatives, deliberately: it stores
    executor-local blocks without lineage, so losing an executor
    between materialization and the final join FAILS the query (an
    outer retry recomputes from source) rather than recomputing
    in-flight. persist() would recompute on loss but leaks the cached
    plan's exchanges into the textual plan the shuffle-budget pins
    count (measured: 5 vs 3), and reliable checkpoint() needs a
    configured HDFS checkpoint dir. srev is one row per active
    supplier, so the exposure window is seconds even at 100×."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    srev = (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_rev")
        )
    )
    srev = materialize(srev)
    mx = srev.agg(F.max("total_rev").alias("mx"))
    best = srev.join(F.broadcast(mx)).filter(F.col("total_rev") == F.col("mx"))
    return best.join(s, best.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_rev"
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice::DECIMAL(18,6))::DOUBLE / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: correlated average via a window over partkey — ONE pass over
    lineitem instead of the correlated-subquery rescan."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("l_partkey")
    lw = l.withColumn("avg_qty", F.avg("l_quantity").over(w))
    return (
        lw.join(p.filter(F.col("p_brand") == "Brand#11"),
                lw.l_partkey == p.p_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           sum(l.l_quantity) AS total_qty
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@query(
    "q19_disjunctive_predicate_revenue",
    oracle="""
    SELECT round(sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6)), 2)::DOUBLE AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#16' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#16") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#22") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")), 2
        ).cast("double").alias("revenue")
    )


@query(
    "q8_market_share",
    oracle="""
    WITH volumes AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             (l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'ASIA')
    SELECT o_year,
           (sign(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                          ELSE 0 END))::HUGEINT
            * ((2 * abs((sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                          ELSE 0 END) * 1000000)::HUGEINT) * 1000000
             + (sum(volume) * 1000000)::HUGEINT)
            // (2 * (sum(volume) * 1000000)::HUGEINT)))
           / 1000000.0 AS mkt_share
    FROM volumes GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's purchase volume per
    year — six joins, all dimension sides broadcast, exact decimal sums
    so the share is rounding-stable."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    volumes = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return volumes.groupBy("o_year").agg(
        _rr(
            F.sum(
                F.when(
                    F.col("supp_nation") == "NATION_1", F.col("volume")
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ),
            F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q22_idle_wealthy_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0)
    SELECT c.c_mktsegment,
           count(*) AS n_custs,
           round(sum(c.c_acctbal::DECIMAL(18,6)), 2)::DOUBLE AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders —
    a scalar aggregate broadcast into the filter plus a left-anti join
    (idle = no orders since 2000 — every fixture customer has SOME
    order, so the classic no-orders-ever predicate would be vacuous)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01")
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2).cast("double").alias("total_bal"),
    )


@query(
    "q_unpivot_irradiance_long",
    oracle="""
    SELECT event_id, metric, round(val, 6) AS val
    FROM (SELECT event_id, value AS raw_value, value * 2 AS doubled,
                 value * value AS squared
          FROM events WHERE event_id < 500)
    UNPIVOT (val FOR metric IN (raw_value, doubled, squared))
    """,
)
def q_unpivot_irradiance_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) — the inverse of pivot, used to turn the
    GOES per-channel wide rows into long-form series. Native `unpivot`,
    no shuffle (row-local explode)."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    wide = e.select(
        "event_id",
        F.col("value").alias("raw_value"),
        (F.col("value") * 2).alias("doubled"),
        (F.col("value") * F.col("value")).alias("squared"),
    )
    long = wide.unpivot(
        ids=["event_id"],
        values=["raw_value", "doubled", "squared"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.select("event_id", "metric", F.round("val", 6).alias("val"))


@query(
    "q_events_map_operations",
    oracle="""
    WITH base AS (SELECT * FROM events WHERE event_id < 1000)
    SELECT event_id, 'k' AS map_key,
           json_extract(props, '$.k')::BIGINT AS map_value
    FROM base
    UNION ALL
    SELECT event_id, 'type_len' AS map_key,
           len(event_type)::BIGINT AS map_value
    FROM base
    """,
)
def q_events_map_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (SURVEY §2.8 notes the reference uses no map
    functions; the engine exposes them): JSON → map, map built from
    columns, map_concat, and entry explosion to long form."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    props_map = F.from_json("props", "map<string,bigint>")
    derived = F.create_map(
        F.lit("type_len"), F.length("event_type").cast("bigint")
    )
    merged = F.map_concat(props_map, derived)
    return e.select(
        "event_id", F.explode(merged).alias("map_key", "map_value")
    )


@query(
    "q_grouped_normalize_values",
    oracle="""
    WITH m AS (
      SELECT event_type,
             count(*)                           AS n,
             sum(value::DECIMAL(18,6))::DOUBLE  AS s1,
             -- DECIMAL(19,6) left operand forces DuckDB's int128
             -- multiply (DECIMAL(37,12), = Spark's product type);
             -- 18x18 would overflow int64 at |v| > ~3034
             sum((value::DECIMAL(19,6)) * (value::DECIMAL(18,6)))::DOUBLE AS s2
      FROM events GROUP BY event_type),
    st AS (
      SELECT event_type,
             s1 / n AS mean,
             CASE WHEN n > 1
                  THEN sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), 0.0))
                  ELSE 0.0 END AS sd
      FROM m)
    SELECT e.event_id, e.event_type, e.value,
           round(CASE WHEN st.sd > 0
                      THEN (e.value - st.mean) / st.sd
                      ELSE 0.0 END, 6) AS z
    FROM events e JOIN st ON e.event_type = st.event_type
    """,
)
def q_grouped_normalize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (batch twin of the stateful streaming
    operators): per-event-type z-score normalization. Full SQL oracle:
    the operator accumulates the group moments exactly over
    decimal(18,6)-quantized values (see operators/grouped.py), so mean
    and σ — and therefore every z — are bit-identical to the DuckDB
    window computation; the 6-dp round on both sides is belt and
    braces for the gate's hash."""
    from data_pipeline_with_big_data_stack_spark.operators.grouped import normalize_per_group

    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return normalize_per_group(e, "event_type", "value").withColumn(
        "z", F.round("z", 6)
    )


@query(
    "q_grouped_winsorize_values",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
             count(*)    OVER (PARTITION BY event_type)                 AS n
      FROM events),
    b AS (
      SELECT event_type,
             max(CASE WHEN rk = greatest(1, ceil(0.05 * n)) THEN value END) AS lo,
             max(CASE WHEN rk = greatest(1, ceil(0.95 * n)) THEN value END) AS hi
      FROM ranked GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           CASE WHEN e.value < b.lo THEN b.lo
                WHEN e.value > b.hi THEN b.hi
                ELSE e.value END AS value_w
    FROM events e JOIN b ON e.event_type = b.event_type
    """,
)
def q_grouped_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas #2: per-type winsorization. Fully
    value-oracled because the operator's nearest-rank quantile bounds
    are actual data values (see operators/grouped.winsorize_per_group)
    — the DuckDB side picks the identical sorted ranks with exact
    decimal arithmetic (0.05/0.95 literals are DECIMAL in DuckDB,
    matching the operator's ``Decimal`` rank math), so the clamp is
    bit-exact with no rounding device at all."""
    from data_pipeline_with_big_data_stack_spark.operators.grouped import winsorize_per_group

    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return winsorize_per_group(e, "event_type", "value").select(
        "event_id", "event_type", F.col("value").alias("value_w")
    )


# ==========================================================================
# TPC-H shape completion. The fixture schema is TPC-H-ish but lacks
# partsupp and lineitem commit/receipt dates, so Q2/Q9/Q11/Q12/Q16/Q20/
# Q21 cannot be transcribed verbatim; each query below preserves its
# TPC-H counterpart's SHAPE — the join topology, subquery class, and
# aggregation structure that exercise the engine — against the columns
# that exist. With these, all 22 TPC-H query shapes are registered.
# ==========================================================================


# Q2 shape: correlated best-per-group over a 4-table join (the min-cost
# supplier becomes the max-acctbal supplier among those who shipped).
@query(
    "q2_best_supplier_per_part",
    oracle="""
    WITH shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name,
             row_number() OVER (PARTITION BY p.p_partkey
               ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rk
      FROM part p
      JOIN shipped sh ON sh.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = sh.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_size = 15 AND p.p_type = 'PROMO')
    SELECT p_partkey, p_name, s_name,
           round(s_acctbal, 2) AS best_acctbal, n_name
    FROM cand WHERE rk = 1
    """,
)
def q2_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    shipped = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        p.join(shipped, p.p_partkey == shipped.l_partkey)
        .join(s, shipped.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    w = W.partitionBy("p_partkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.round("s_acctbal", 2).alias("best_acctbal"),
            "n_name",
        )
    )


# Q9 shape: profit per (nation, year) over part×supplier×lineitem, with
# p_retailprice standing in for ps_supplycost.
@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation,
           year(l.l_shipdate) AS o_year,
           round(sum((l.l_extendedprice * (1 - l.l_discount)
                      - p.p_retailprice * l.l_quantity)::DECIMAL(18,6)), 2)::DOUBLE
             AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(profit.cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
    )


# Q11 shape: per-key value with a HAVING against a global-total scalar
# subquery (importance threshold).
@query(
    "q11_important_part_value",
    oracle="""
    WITH v AS (
      SELECT l.l_partkey,
             sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(18,6)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey)
    SELECT l_partkey, round(val, 2)::DOUBLE AS part_value
    FROM v
    WHERE val > (SELECT sum(val) * 0.002 FROM v)
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val"))
    )
    thresh = v.agg((F.sum("val") * 0.002).alias("thresh"))
    return (
        v.join(F.broadcast(thresh))
        .filter(F.col("val") > F.col("thresh"))
        .select("l_partkey", F.round("val", 2).cast("double").alias("part_value"))
    )


# Q12 shape: dual conditional counts by a categorical "mode" dimension
# under a lateness predicate (shipdate vs orderdate stands in for
# receipt vs commit).
@query(
    "q12_late_shipment_modes",
    oracle="""
    SELECT l.l_returnflag AS mode,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def q12_late_shipment_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add("o_orderdate", 60))
        .groupBy(F.col("l_returnflag").alias("mode"))
        .agg(
            F.sum(hi.cast("long")).alias("high_line_count"),
            F.sum((~hi).cast("long")).alias("low_line_count"),
        )
    )


# Q16 shape: distinct-supplier counts per part attribute triple, with a
# NOT-IN supplier exclusion (negative acctbal stands in for the
# complaints filter) and a brand exclusion.
@query(
    "q16_supplier_part_diversity",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# Q20 shape: semi-join suppliers against a correlated share-of-total
# condition (shipped more than half of a part's total quantity).
@query(
    "q20_concentrated_suppliers",
    oracle="""
    WITH q AS (
      SELECT l.l_partkey, l.l_suppkey,
             sum(l.l_quantity) AS supp_qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
      GROUP BY 1, 2),
    tot AS (SELECT l_partkey, sum(supp_qty) AS part_qty FROM q GROUP BY 1),
    conc AS (
      SELECT DISTINCT q.l_suppkey
      FROM q JOIN tot ON q.l_partkey = tot.l_partkey
      WHERE q.supp_qty > 0.15 * tot.part_qty)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM conc)
    """,
)
def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    q = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    tot = q.groupBy("l_partkey").agg(F.sum("supp_qty").alias("part_qty"))
    conc = (
        q.join(tot, "l_partkey")
        .filter(F.col("supp_qty") > 0.15 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(conc, s.s_suppkey == conc.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
    )


# Q21 shape: EXISTS + NOT-EXISTS self-joins on the order key — the
# "only supplier whose shipment was late in a multi-supplier order"
# analysis, with shipdate-vs-orderdate lateness.
@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH l1 AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    SELECT s.s_name, count(*)::BIGINT AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("l_shipdate") > F.date_add("o_orderdate", 90))
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    has_other = late.join(
        others,
        (late.l_orderkey == others.o_key) & (late.l_suppkey != others.o_supp),
        "left_semi",
    )
    late_others = late.select(
        F.col("l_orderkey").alias("lo_key"), F.col("l_suppkey").alias("lo_supp")
    )
    only_late = has_other.join(
        late_others,
        (has_other.l_orderkey == late_others.lo_key)
        & (has_other.l_suppkey != late_others.lo_supp),
        "left_anti",
    )
    return (
        only_late.join(s, only_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
