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

from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.queries.textops import (
    _SHINGLES_DUCK,
    _SHINGLES_SPARK,
)
from data_pipeline_with_big_data_stack_spark.session import prepare_session
from data_pipeline_with_big_data_stack_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name)


# ==========================================================================
# SimHash near-duplicate detection (dedup suite, 16-bit fingerprint).
#
# bit j of a shingle's hash = high bit of hex nibble j of md5(shingle);
# the document's simhash bit j = sign of sum over shingles of (+1/-1).
# Candidate pairs share at least one of 4 4-bit bands (pigeonhole: any
# pair with hamming <= 3 shares a band); verification is bit_count(xor).
# At scale: the band join shuffles on a tiny (band_idx, band_val) key and
# the verify step is pure integer math — same shape as MinHash LSH.
# ==========================================================================
_N_BITS = 16
_HAM_T = 3


def _simhash_duck() -> str:
    bit_sums = ", ".join(
        f"list_sum([CASE WHEN strpos('0123456789abcdef', "
        f"substr(md5(s), {j + 1}, 1)) > 8 THEN 1 ELSE -1 END for s in sh]) AS b{j}"
        for j in range(_N_BITS)
    )
    value = " + ".join(f"(CASE WHEN b{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(_N_BITS))
    return f"""
      WITH sh AS (
        SELECT doc_id, {_SHINGLES_DUCK} AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)),
      bits AS (SELECT doc_id, {bit_sums} FROM sh),
      sig AS (SELECT doc_id, ({value})::BIGINT AS simhash FROM bits)
    """


_SIMHASH_PAIRS_ORACLE = (
    _simhash_duck()
    + f"""
    , bands AS (
      SELECT doc_id, simhash, b.band_idx,
             (simhash >> (b.band_idx * 4)) & 15 AS band_val
      FROM sig CROSS JOIN (SELECT unnest(range(4)) AS band_idx) b),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           bit_count(xor(sig_a, sig_b)) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= {_HAM_T}
    """
)


def _simhash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    d = d.withColumn("words", F.split("text", " ")).withColumn(
        "sh", F.expr(_SHINGLES_SPARK)
    )
    sig = None
    for j in range(_N_BITS):
        vote = F.expr(
            f"aggregate(transform(sh, s -> CASE WHEN instr('0123456789abcdef', "
            f"substring(md5(s), {j + 1}, 1)) > 8 THEN 1 ELSE -1 END), "
            f"0, (acc, x) -> acc + x)"
        )
        bit = F.when(vote >= 0, F.lit(1 << j)).otherwise(0)
        sig = bit if sig is None else sig + bit
    return d.select("doc_id", sig.cast("long").alias("simhash"))


@query("q_dedup_simhash", oracle=_SIMHASH_PAIRS_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _simhash_spark(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_idx"),
    ).withColumn("band_val", F.expr("shiftright(simhash, band_idx * 4) & 15"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
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
           round(avg(e.value), 4)   AS avg_value,
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
        F.round(F.avg("value"), 4).alias("avg_value"),
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
           round(sum(o_totalprice), 2) AS total
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
               round(sum(o_totalprice), 2) AS total
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
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
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
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q10_returned_item_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
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
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'ECONOMY'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
           AS promo_share_pct
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
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0))
                / F.sum(rev),
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
