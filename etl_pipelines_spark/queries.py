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
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is parquet TIMESTAMP(NANOS), read as long via
        # spark.sql.legacy.parquet.nanosAsLong; convert exactly to a
        # micros timestamp (integer DIV — values are micro-precision).
        # Oracle SQL must CAST(ts AS TIMESTAMP) for raw-ts outputs so
        # DuckDB's nanosecond values are truncated identically.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


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


# ===========================================================================
# Projection / filter / predicates (SURVEY §2.3 P1-P8)
# ===========================================================================

@q(
    "p_filter_predicates",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderstatus
FROM orders
WHERE o_totalprice BETWEEN 100000 AND 300000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
  AND o_orderstatus <> 'P'
  AND o_orderdate IS NOT NULL
ORDER BY o_orderkey
""",
)
def p_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P7: BETWEEN, IN-list, <>, IS NOT NULL, boolean algebra
    (reference 4_dwh_finance/asset_collection_curves.sql:15-19).
    All predicates push down to the parquet scan."""
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_totalprice").between(100000, 300000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") != "P")
            & F.col("o_orderdate").isNotNull()
        )
        .select("o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@q(
    "p_like_ilike",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE '%ECO%'
   OR (p_name ILIKE '%RED%' AND p_name NOT ILIKE '%WIDGET%')
ORDER BY p_partkey
""",
)
def p_like_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: LIKE / ILIKE / NOT ILIKE (233/146 files in the reference;
    08_sessions.sql:8)."""
    p = load(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_type").like("%ECO%")
            | (F.col("p_name").ilike("%RED%") & ~F.col("p_name").ilike("%WIDGET%"))
        )
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


@q(
    "p_regex",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE regexp_matches(c_name, '^Customer#0*1[0-9]{2}$')
ORDER BY c_custkey
""",
)
def p_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6: POSIX ~ regex and SIMILAR TO (reference
    01_track_events.sql:148, 1_pricing_outlier_removal.sql:16)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_name").rlike("^Customer#0*1[0-9]{2}$"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@q(
    "p_case_nested",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CASE
    WHEN l_quantity >= 35 THEN CASE WHEN l_returnflag = 'R' THEN 'bulk_returned' ELSE 'bulk' END
    WHEN l_quantity >= 18 THEN 'mid'
    ELSE CASE l_linestatus WHEN 'F' THEN 'small_final' ELSE 'small_open' END
  END AS qty_class
FROM lineitem
WHERE l_orderkey < 500
ORDER BY l_orderkey, l_linenumber
""",
)
def p_case_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: nested searched + simple CASE (reference
    3_master/customer.sql:266-304)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    return (
        li.filter(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.when(
                qty >= 35,
                F.when(F.col("l_returnflag") == "R", "bulk_returned").otherwise("bulk"),
            )
            .when(qty >= 18, "mid")
            .otherwise(
                F.when(F.col("l_linestatus") == "F", "small_final").otherwise("small_open")
            )
            .alias("qty_class"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@q(
    "p_distinct",
    oracle="""
SELECT DISTINCT c_mktsegment, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
ORDER BY c_mktsegment, o_orderpriority
""",
)
def p_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: SELECT DISTINCT over a join (customer.sql:138)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_mktsegment", "o_orderpriority")
        .distinct()
        .orderBy("c_mktsegment", "o_orderpriority")
    )


# ===========================================================================
# Joins (SURVEY §2.4 J3-J12; J1/J2 covered by q3/q5/master_customer)
# ===========================================================================

@q(
    "j_full_outer_calendar",
    oracle="""
WITH od AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders FROM orders GROUP BY 1
),
ed AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n_events FROM events GROUP BY 1
)
SELECT COALESCE(od.d, ed.d) AS date, od.n_orders, ed.n_events
FROM od FULL OUTER JOIN ed ON od.d = ed.d
ORDER BY date
""",
)
def j_full_outer_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: FULL OUTER with USING-style key coalescing (reference
    4_dwh_core/daily_kpi_report_main_tables.sql:209). Orders span
    1995-2001 and events 2024, so both null sides are exercised."""
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    od = o.groupBy(F.to_date("o_orderdate").alias("od_d")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    ed = e.groupBy(F.to_date("ts").alias("ed_d")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        od.join(ed, od.od_d == ed.ed_d, "full")
        .select(
            F.coalesce("od_d", "ed_d").alias("date"), "n_orders", "n_events"
        )
        .orderBy("date")
    )


@q(
    "j_cross_spine",
    oracle="""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY)) AS DATE) AS date
),
types AS (SELECT DISTINCT event_type FROM events),
cnt AS (
  SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
)
SELECT days.date, types.event_type, COALESCE(cnt.c, 0) AS n_events
FROM days CROSS JOIN types
LEFT JOIN cnt ON cnt.d = days.date AND cnt.event_type = types.event_type
ORDER BY days.date, types.event_type
""",
)
def j_cross_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: date-spine × entities cross join for gap-filling
    (reference 1_ods_core/00_asset_payments_new_infra.sql:39). The
    spine is broadcast — a cross join against a 31-row side is a
    broadcast nested loop, safe at any left-side scale."""
    e = load(spark, sf_dir, "events")
    days = date_spine(spark, "2024-01-01", "2024-01-31", "date")
    types = e.select("event_type").distinct()
    cnt = e.groupBy(F.to_date("ts").alias("d"), "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        days.crossJoin(types)
        .join(
            cnt,
            (cnt.d == F.col("date")) & (cnt.event_type == types.event_type),
            "left",
        )
        .select("date", types.event_type, F.coalesce("c", F.lit(0)).alias("n_events"))
        .orderBy("date", "event_type")
    )


@q(
    "j_right_parts",
    oracle="""
SELECT p.p_partkey, p.p_name, COUNT(l.l_orderkey) AS n_lineitems
FROM lineitem l RIGHT JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_partkey, p.p_name
ORDER BY p.p_partkey
""",
)
def j_right_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: RIGHT JOIN (1 hit in the reference corpus) — parts with
    zero lineitems retained with count 0."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey", "p_name")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
        .orderBy("p_partkey")
    )


@q(
    "j_semi_in",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
""",
)
def j_semi_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: semi-join via IN (SELECT ...) (reference
    06_page_views.sql:65-69) -> left_semi."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@q(
    "j_anti_not_in",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
)
def j_anti_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: anti-join via NOT IN (reference 00_allocation.sql:101).
    ⚠ NOT IN is null-sensitive; o_custkey is non-null here, which is
    exactly the condition under which left_anti matches it
    (SURVEY §2.4 J7)."""
    c = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@q(
    "j_exists_corr",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (
  SELECT 1 FROM events e WHERE e.user_id = c.c_custkey AND e.event_type = 'purchase'
) AND NOT EXISTS (
  SELECT 1 FROM events e2 WHERE e2.user_id = c.c_custkey AND e2.event_type = 'error'
)
ORDER BY c_custkey
""",
)
def j_exists_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: correlated [NOT] EXISTS (reference
    2_ods_risk/00_order_decline_reason.sql:43) -> semi + anti join."""
    c = load(spark, sf_dir, "customer")
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    errors = e.filter(F.col("event_type") == "error")
    return (
        c.join(purchases, c.c_custkey == purchases.user_id, "left_semi")
        .join(errors, F.col("c_custkey") == errors.user_id, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@q(
    "j_range_bands",
    oracle="""
WITH bands(band, lo, hi) AS (VALUES ('low', 1, 17), ('mid', 18, 34), ('high', 35, 50))
SELECT band,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity <= hi
GROUP BY band
ORDER BY band
""",
)
def j_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: range/interval join against a small band dimension
    (reference v_seasonality.sql:28) — broadcast BNLJ is the right
    physical plan for a 3-row interval side at any fact scale."""
    li = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        [("low", 1, 17), ("mid", 18, 34), ("high", 35, 50)], ["band", "lo", "hi"]
    )
    return (
        range_join(li, bands, "l_quantity", "lo", "hi")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_extendedprice"), "total_price"),
        )
        .orderBy("band")
    )


@q(
    "j_asof_attribution",
    oracle="""
SELECT p.event_id, p.user_id, p.ts,
       c.click_ts, c.click_event_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (
  SELECT user_id, ts, ts AS click_ts, event_id AS click_event_id
  FROM events WHERE event_type = 'click'
) c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
)
def j_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: as-of join — for each purchase, the same user's latest
    click at or before it (the reference's exchange-rate cutoff
    idiom, subscription.sql:27-36, generalized). Implemented as
    union + one window pass (operators/asof.py), which shuffles each
    side once on user_id — no range-join explosion at scale."""
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_event_id"),
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_ts", "click_event_id"],
    ).orderBy("event_id")


@q(
    "j_dod_delta",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM events GROUP BY 1
)
SELECT d AS date, revenue,
  lag(revenue) OVER (ORDER BY d) AS prev_revenue,
  revenue - lag(revenue) OVER (ORDER BY d) AS delta
FROM daily
ORDER BY date
""",
)
def j_dod_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: the reference's ±1-day self-join change detection
    (Wallet_expansion.sql:89-91), expressed as LAG — one window
    instead of a self-join, per SURVEY §2.4."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("date")).agg(
        dsum(F.col("value"), "revenue")
    )
    w = Window.orderBy("date")
    return daily.select(
        "date",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("delta"),
    ).orderBy("date")


@q(
    "j_dedup_right",
    oracle="""
WITH latest AS (
  SELECT user_id, ts, event_type FROM (
    SELECT user_id, ts, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT c_custkey, c_name, l.ts AS last_event_ts, l.event_type AS last_event_type
FROM customer c LEFT JOIN latest l ON l.user_id = c.c_custkey
WHERE c_custkey < 300
ORDER BY c_custkey
""",
)
def j_dedup_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: join against a window-deduped right side (reference
    customer.sql:315-317) — dedupe FIRST, then join, to avoid join
    fanout (the reference's implicit anti-fanout rule)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 300)
    e = load(spark, sf_dir, "events")
    latest = dedupe_latest(
        e.select("user_id", "ts", "event_type", "event_id"),
        keys=["user_id"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    )
    return (
        c.join(latest, latest.user_id == c.c_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.col("ts").alias("last_event_ts"),
            F.col("event_type").alias("last_event_type"),
        )
        .orderBy("c_custkey")
    )


# ===========================================================================
# Set operations (SURVEY §2.8 U1-U4)
# ===========================================================================

@q(
    "u_union_all_pad",
    oracle="""
SELECT 'order' AS src, o_orderkey AS id, o_totalprice AS amount, NULL AS event_type
FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT 'event' AS src, event_id AS id, value AS amount, event_type
FROM events WHERE event_type = 'purchase'
ORDER BY src, id
""",
)
def u_union_all_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: UNION ALL with NULL-padded schema alignment (reference
    05_all_events_incremental.sql:54,107) -> unionByName with
    allowMissingColumns."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    a = o.select(
        F.lit("order").alias("src"),
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
    )
    b = e.select(
        F.lit("event").alias("src"),
        F.col("event_id").alias("id"),
        F.col("value").alias("amount"),
        "event_type",
    )
    return a.unionByName(b, allowMissingColumns=True).orderBy("src", "id")


@q(
    "u_union_distinct",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
ORDER BY user_id
""",
)
def u_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: UNION (dedup) (reference customer.sql:70-95)."""
    e = load(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct().orderBy("user_id")


@q(
    "u_except",
    oracle="""
SELECT o_custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY o_custkey
""",
)
def u_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: EXCEPT with set (distinct) semantics (reference
    dm_recommerce.recommerce_stages.sql:160) -> subtract()."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_custkey")
        .subtract(
            o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
        )
        .orderBy("o_custkey")
    )


@q(
    "u_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
ORDER BY user_id
""",
)
def u_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: INTERSECT (unused in the reference but part of the
    engine's set-op surface)."""
    e = load(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b).orderBy("user_id")
