"""Query registry: every operator from SURVEY.md §2 expressed as a
named (Spark DataFrame builder, DuckDB oracle SQL) pair.

The driver runs each Spark query and its oracle side-by-side at
sf0.01 and hash-compares row counts, schemas and values — so every
computed column is aliased identically on both sides, and every
float-producing aggregate goes through *exact decimal* arithmetic
(all money/value columns in the testdata are exact 2-decimal
doubles) before a final cast to DOUBLE, making the result
bit-identical regardless of aggregation order. Genuinely float-path
results (cosine similarity, percentiles) are rounded to 6 decimals
on both sides.

Registry conventions:
- every Spark callable has signature (spark, sf_dir) -> DataFrame
- deterministic output: unique sort keys before any limit
- oracle=None marks non-SQL-expressible ops (driver does a weaker
  rows-only check; pytest covers their semantics instead)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import functions as RF  # Redshift-dialect compat layer
from .operators import (
    asof_join,
    date_spine,
    dedupe_latest,
    dim_dates,
    range_join,
    rolling_agg,
    running_total,
    sessionize,
    top_k_per_group,
)
from .operators.sessionize import session_rollup


@dataclass
class QuerySpec:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, QuerySpec] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# Exact-decimal casts for money-ish doubles (values are 2-decimal).
def _d(c, p: int = 12) -> F.Column:
    return c.cast(f"decimal({p},2)")


def dsum(c, alias: str) -> F.Column:
    """Order-independent exact sum of a 2-decimal double -> DOUBLE."""
    return F.sum(_d(c)).cast("double").alias(alias)


# SQL-side equivalents of the decimal-exact idioms.
_SQL_D = "CAST({c} AS DECIMAL(12,2))"


def _sql_dsum(c: str, alias: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DOUBLE) AS {alias}"


# ===========================================================================
# Headline / TPC-H-shaped queries (SURVEY §2.3-2.5, §2.7)
# ===========================================================================

@q(
    "q1_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the reference's nightly rollup idiom (GROUP BY
    + SUM/AVG/COUNT, reference 08_sessions.sql:5-16). Single scan,
    partial aggregation map-side, one shuffle on a 6-value key."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = _d(F.col("l_extendedprice")) * (1 - F.col("l_discount").cast("decimal(4,2)"))
    charge = disc_price * (1 + F.col("l_tax").cast("decimal(4,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_d(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_d(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@q(
    "q3_top_revenue_orders",
    oracle="""
SELECT
  o.o_orderkey,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  o.o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> agg ->
    global top-k. customer is broadcast (dimension-sized); lineitem
    never shuffles on more than the join key."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    disc_price = _d(F.col("l_extendedprice")) * (1 - F.col("l_discount").cast("decimal(4,2)"))
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@q(
    "q5_regional_revenue",
    oracle="""
SELECT
  n.n_name,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the reference's 12-way star join idiom
    (3_master/subscription.sql:247-273). All dimensions broadcast;
    the only shuffles are fact-fact (orders⋈lineitem)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc_price = _d(F.col("l_extendedprice")) * (1 - F.col("l_discount").cast("decimal(4,2)"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@q(
    "master_customer",
    oracle="""
WITH order_stats AS (
  SELECT
    o_custkey,
    COUNT(*) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
    MIN(o_orderdate) AS first_order_at,
    MAX(o_orderdate) AS last_order_at,
    COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
    COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent
  FROM orders GROUP BY o_custkey
),
li_stats AS (
  SELECT
    o.o_custkey,
    CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
    COUNT(DISTINCT l.l_partkey) AS n_distinct_parts
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
)
SELECT
  c.c_custkey,
  c.c_name,
  n.n_name AS nation,
  r.r_name AS region,
  c.c_mktsegment,
  COALESCE(os.n_orders, 0) AS n_orders,
  COALESCE(os.total_spend, 0.0) AS total_spend,
  os.first_order_at,
  os.last_order_at,
  COALESCE(os.n_finished, 0) AS n_finished,
  COALESCE(os.n_urgent, 0) AS n_urgent,
  COALESCE(ls.total_qty, 0.0) AS total_qty,
  COALESCE(ls.n_distinct_parts, 0) AS n_distinct_parts,
  GREATEST(CAST(c.c_acctbal AS DECIMAL(12,2)), 0) = CAST(c.c_acctbal AS DECIMAL(12,2)) AS is_in_credit,
  CASE
    WHEN os.n_orders IS NULL THEN 'prospect'
    WHEN os.n_orders >= 20 THEN 'vip'
    WHEN os.n_orders >= 5 THEN 'active'
    ELSE 'occasional'
  END AS customer_tier
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN order_stats os ON os.o_custkey = c.c_custkey
LEFT JOIN li_stats ls ON ls.o_custkey = c.c_custkey
ORDER BY c.c_custkey
""",
)
def master_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's flagship: a master-entity wide build in the shape
    of reference 3_master/customer.sql (staged rollup CTEs -> wide
    LEFT-join assembly -> CASE tiering -> full refresh). Fact
    rollups pre-aggregate to the customer grain BEFORE joining, so
    the wide join is dimension-sized — the same staging the reference
    forces with temp tables, here left to Catalyst."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    order_stats = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "total_spend"),
        F.min("o_orderdate").alias("first_order_at"),
        F.max("o_orderdate").alias("last_order_at"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
    )
    li_stats = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            dsum(F.col("l_quantity"), "total_qty"),
            F.countDistinct("l_partkey").alias("n_distinct_parts"),
        )
    )
    acct = F.col("c_acctbal").cast("decimal(12,2)")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .join(order_stats, order_stats.o_custkey == c.c_custkey, "left")
        .join(li_stats.withColumnRenamed("o_custkey", "li_custkey"),
              F.col("li_custkey") == c.c_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
            "first_order_at",
            "last_order_at",
            F.coalesce("n_finished", F.lit(0)).alias("n_finished"),
            F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
            F.coalesce("total_qty", F.lit(0.0)).alias("total_qty"),
            F.coalesce("n_distinct_parts", F.lit(0)).alias("n_distinct_parts"),
            (RF.greatest(acct, F.lit(0)) == acct).alias("is_in_credit"),
            F.when(F.col("n_orders").isNull(), "prospect")
            .when(F.col("n_orders") >= 20, "vip")
            .when(F.col("n_orders") >= 5, "active")
            .otherwise("occasional")
            .alias("customer_tier"),
        )
        .orderBy("c_custkey")
    )
