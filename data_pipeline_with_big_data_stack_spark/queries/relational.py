"""Relational query surface: joins, aggregations, windows, set ops, sorts.

The reference implements projections/filters/aggs (SURVEY §2.2/§2.4, e.g.
``M/app_airflow/app/dags/demoSpark.py:69-97``) and *no* joins/windows/set
ops (§2.3/§2.5/§2.7 — explicit gaps filled natively by Spark). This module
declares the full relational surface as DataFrame plans and registers a
DuckDB oracle for each.

Determinism rules used throughout:
- every float aggregate is rounded at a fixed precision on both sides;
- every LIMIT/top-k is totally ordered (unique-key tiebreak);
- no wall-clock functions — time anchors derive from the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_pipeline_with_big_data_stack_spark.operators.rollup_maintenance import (
    round4_ratio as _r4,
)
from data_pipeline_with_big_data_stack_spark.queries import query
from data_pipeline_with_big_data_stack_spark.session import prepare_session
from data_pipeline_with_big_data_stack_spark.tables import load_table


# Exact-summation type for money aggregates: double sum order varies with
# partitioning and flips fixed-precision rounding boundaries.
_DEC = "decimal(18,6)"


def _t(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    prepare_session(spark)
    return load_table(spark, sf_dir, name, rebalance=rebalance)


# --------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1 shape: the canonical grouped multi-agg
# (reference analogue: demoSpark.py:69-75 per-country count/avg/sum).
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    -- every sum accumulates DECIMAL(18,6): double summation order varies
    -- with partitioning and flips fixed-precision rounding boundaries
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity::DECIMAL(18,6)), 2)::DOUBLE                 AS sum_qty,
           round(sum(l_extendedprice::DECIMAL(18,6)), 2)::DOUBLE            AS sum_base_price,
           round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE
                                                                            AS sum_disc_price,
           round(sum((l_extendedprice * (1 - l_discount) * (1 + l_tax))::DECIMAL(18,6)), 2)::DOUBLE
                                                                            AS sum_charge,
           (sign(sum(l_quantity::DECIMAL(18,6)))::HUGEINT * ((2*abs((sum(l_quantity::DECIMAL(18,6)) * 1000000)::HUGEINT) + 100*count(*)) // (200*count(*)))) / 10000.0 AS avg_qty,
           (sign(sum(l_extendedprice::DECIMAL(18,6)))::HUGEINT * ((2*abs((sum(l_extendedprice::DECIMAL(18,6)) * 1000000)::HUGEINT) + 100*count(*)) // (200*count(*)))) / 10000.0 AS avg_price,
           (sign(sum(l_discount::DECIMAL(18,6)))::HUGEINT * ((2*abs((sum(l_discount::DECIMAL(18,6)) * 1000000)::HUGEINT) + 100*count(*)) // (200*count(*)))) / 10000.0 AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: the decimal(18,6) partial aggregation over every row is
    # the whole query; a single-row-group file would serialize it
    l = _t(spark, sf_dir, "lineitem", rebalance=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(_DEC)), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast(_DEC)), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price.cast(_DEC)), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum((disc_price * (1 + F.col("l_tax"))).cast(_DEC)), 2).cast("double").alias("sum_charge"),
            _r4(F.sum(F.col("l_quantity").cast(_DEC)), F.count(F.lit(1))).alias("avg_qty"),
            _r4(F.sum(F.col("l_extendedprice").cast(_DEC)), F.count(F.lit(1))).alias("avg_price"),
            _r4(F.sum(F.col("l_discount").cast(_DEC)), F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q3_shipping_priority — 3-way join + agg + total-order top-k.
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE
             AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    # customer is the smaller side of customer⋈orders but grows with SF
    # (sf100 ≈ 15M rows) — no forced broadcast; AQE picks the strategy
    # from measured sizes. lineitem⋈orders shuffles on orderkey only.
    return (
        l.join(
            o.join(c, F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)), 2
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q5_local_supplier_volume — 6-way star join, dims broadcast.
# --------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE
             AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)), 2
            ).cast("double").alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Semi / anti joins (SURVEY §2.3 — built-in gap fill).
# --------------------------------------------------------------------------
@query(
    "q_semi_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q_semi_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )


# --------------------------------------------------------------------------
# Outer join with null-handling (coalesce over the missing side).
# --------------------------------------------------------------------------
@query(
    "q_outer_customer_order_counts",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey)                  AS n_orders,
           round(coalesce(sum(o_totalprice::DECIMAL(18,6))::DOUBLE, 0.0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def q_outer_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum(F.col("o_totalprice").cast(_DEC)).cast("double"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


# --------------------------------------------------------------------------
# Window functions (SURVEY §2.5 — gap filled via pyspark.sql.Window).
# --------------------------------------------------------------------------
@query(
    "q_window_top3_orders_per_customer",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_order_delta_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(o_totalprice
                 - lag(o_totalprice) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey), 2)
             AS delta_prev,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
)
def q_window_order_delta_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias(
            "delta_prev"
        ),
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
            2,
        ).alias("running_spend"),
    )


# --------------------------------------------------------------------------
# Distinct aggregation (SURVEY §2.4 gap: countDistinct built-in).
# --------------------------------------------------------------------------
@query(
    "q_distinct_parts_per_supplier_nation",
    oracle="""
    SELECT n_name,
           count(DISTINCT l_partkey)  AS n_parts,
           count(DISTINCT l_orderkey) AS n_orders,
           count(*)                   AS n_lineitems
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_distinct_parts_per_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# ROLLUP / CUBE (SURVEY §2.4 gap — built-in df.rollup/df.cube).
# NULL grouping slots are coalesced to 'ALL' so the subtotal rows are
# unambiguous across engines.
# --------------------------------------------------------------------------
@query(
    "q_rollup_returnflag_linestatus",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*)                      AS n,
           round(sum(l_quantity::DECIMAL(18,6)), 2)::DOUBLE     AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("l_quantity").cast(_DEC)), 2).cast("double").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "q_cube_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*)                         AS n,
           round(sum(o_totalprice::DECIMAL(18,6)), 2)::DOUBLE      AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("o_totalprice").cast(_DEC)), 2).cast("double").alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7 gap — union/intersect/except built-in).
# --------------------------------------------------------------------------
@query(
    "q_union_active_parties",
    oracle="""
    SELECT party_key, party_name, kind FROM (
      SELECT c_custkey AS party_key, c_name AS party_name, 'customer' AS kind
      FROM customer WHERE c_acctbal > 5000
      UNION ALL
      SELECT s_suppkey AS party_key, s_name AS party_name, 'supplier' AS kind
      FROM supplier WHERE s_acctbal > 5000)
    """,
)
def q_union_active_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(
            F.col("c_custkey").alias("party_key"),
            F.col("c_name").alias("party_name"),
            F.lit("customer").alias("kind"),
        )
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(
            F.col("s_suppkey").alias("party_key"),
            F.col("s_name").alias("party_name"),
            F.lit("supplier").alias("kind"),
        )
    )
    return c.unionByName(s)


@query(
    "q_intersect_nations_with_both",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_except_nations_without_suppliers",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except_nations_without_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (distinct) semantics, matching the SQL oracle


# --------------------------------------------------------------------------
# Pivot (SURVEY §2.4 "not present" list — built-in groupBy().pivot()).
# Oracle is the portable CASE-WHEN expansion.
# --------------------------------------------------------------------------
@query(
    "q_pivot_orders_status_by_segment",
    oracle="""
    SELECT c_mktsegment,
           (sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END))::BIGINT AS n_f,
           (sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END))::BIGINT AS n_o,
           (sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END))::BIGINT AS n_p
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_pivot_orders_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    piv = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


# --------------------------------------------------------------------------
# Sorted top-k (SURVEY §2.6 — fuses to TakeOrderedAndProject).
# --------------------------------------------------------------------------
@query(
    "q_topk_orders_by_value",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_topk_orders_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "o_orderdate",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# CASE enrichment + casts (SURVEY §2.2 P8/P10 — database_etl.py:56-58).
# --------------------------------------------------------------------------
@query(
    "q_case_customer_tiers",
    oracle="""
    SELECT c_mktsegment,
           CASE WHEN c_acctbal >= 7500 THEN 'premium'
                WHEN c_acctbal >= 2500 THEN 'standard'
                ELSE 'basic' END AS tier,
           count(*)              AS n,
           (sign(sum(c_acctbal::DECIMAL(18,6)))::HUGEINT
            * ((2*abs((sum(c_acctbal::DECIMAL(18,6))*1000000)::HUGEINT)
                + 100*count(*))
               // (200*count(*)))) / 10000.0 AS avg_bal
    FROM customer
    GROUP BY 1, 2
    """,
)
def q_case_customer_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") >= 7500, "premium")
        .when(F.col("c_acctbal") >= 2500, "standard")
        .otherwise("basic")
    )
    return (
        c.withColumn("tier", tier)
        .groupBy("c_mktsegment", "tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r4(
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")),
                F.count(F.lit(1)),
            ).alias("avg_bal"),
        )
    )


# --------------------------------------------------------------------------
# String functions (SURVEY §2.8 F8-F13: split/concat/regexp/strip).
# --------------------------------------------------------------------------
@query(
    "q_string_part_features",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[1]                           AS first_word,
           string_split(p_name, ' ')[-1]                          AS last_word,
           upper(p_type)                                          AS type_upper,
           concat(p_brand, ':', p_type)                           AS brand_type,
           regexp_replace(p_brand, '[^0-9]', '', 'g')             AS brand_num,
           length(p_name)                                         AS name_len
    FROM part
    """,
)
def q_string_part_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        words.getItem(0).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.upper("p_type").alias("type_upper"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_brand", "[^0-9]", "").alias("brand_num"),
        F.length("p_name").alias("name_len"),
    )


# --------------------------------------------------------------------------
# Cross join (small dimensional cross — SURVEY §2.3).
# --------------------------------------------------------------------------
@query(
    "q_cross_region_status_grid",
    oracle="""
    SELECT r_name, o_orderstatus AS status, n_orders FROM region
    CROSS JOIN (SELECT o_orderstatus, count(*) AS n_orders
                FROM orders GROUP BY o_orderstatus)
    """,
)
def q_cross_region_status_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").select("r_name")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return r.crossJoin(F.broadcast(o))
