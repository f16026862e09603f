"""Mini-warehouse: the reference's layer topology rebuilt over the
driver's star schema (SURVEY.md §0 topology diagram, §7 P3).

Layers (≅ reference directories):
  ods      — conformed staging w/ dedup (0_/1_/2_ods_*)
  master   — wide core entities (3_master)
  master_historical — daily snapshots keyed by `date` (5_master_historical)
  dwh      — domain marts (4_dwh_*)
  mon      — monitoring tables (8_monitoring)

Write modes per layer match the reference: ods/master/dwh are full
refreshes (W1), events are incremental upserts (W2), historical is
a daily snapshot partition overwrite (W4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators import dedupe_latest, sessionize
from ..quality.checks import duplicate_keys, missing_dates, volume_anomaly
from .model import Model, RunContext, TaskGroup
from .pipeline import Pipeline


def _dec(c, p: int = 12):
    return F.col(c).cast(f"decimal({p},2)")


# --- ods ------------------------------------------------------------------

def ods_events(ctx: RunContext) -> DataFrame:
    """Raw events, deduped by event_id keeping latest ts (the
    reference's ROW_NUMBER()=1 message_id idiom, 01_track_events.sql:
    28,144), typed props via get_json_object."""
    ev = ctx.source("events")
    return dedupe_latest(
        ev, keys=["event_id"], order_by=[F.col("ts").desc()]
    ).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.to_date("ts").alias("event_date"),
    )


def ods_orders(ctx: RunContext) -> DataFrame:
    """Conformed orders: status decode + priority rank (the ods
    conformance shape, 1_ods_core/01_order.sql)."""
    o = ctx.source("orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_orderstatus",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("order_status"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1))
        .cast("int")
        .alias("priority_rank"),
        "o_totalprice",
    )


# --- master ---------------------------------------------------------------

def master_customer(ctx: RunContext) -> DataFrame:
    """Wide customer entity (reference 3_master/customer.sql shape):
    fact rollups pre-aggregated to customer grain, then a broadcast
    dimension join."""
    c = ctx.source("customer")
    n = ctx.source("nation")
    r = ctx.source("region")
    o = ctx.read("ods.orders")

    order_stats = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"),
        F.min("o_orderdate").alias("first_order_at"),
        F.max("o_orderdate").alias("last_order_at"),
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .join(order_stats, order_stats.o_custkey == c.c_custkey, "left")
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
            F.when(F.col("n_orders").isNull(), "prospect")
            .when(F.col("n_orders") >= 20, "vip")
            .when(F.col("n_orders") >= 5, "active")
            .otherwise("occasional")
            .alias("customer_tier"),
        )
    )


# --- dwh ------------------------------------------------------------------

def dwh_daily_kpi(ctx: RunContext) -> DataFrame:
    """Daily KPI mart (reference 4_dwh_core/daily_kpi_report shape):
    per-day order & event counts full-outer-joined on the date."""
    o = ctx.read("ods.orders")
    ev = ctx.read("ods.events")
    daily_orders = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("order_value"),
    )
    daily_events = ev.groupBy(F.col("event_date").alias("d")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_active_users"),
    )
    return (
        daily_orders.join(daily_events, "d", "full")
        .select(
            F.col("d").alias("date"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("order_value", F.lit(0.0)).alias("order_value"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_active_users", F.lit(0)).alias("n_active_users"),
        )
    )


def dwh_sessions(ctx: RunContext) -> DataFrame:
    """Gap-based sessions over deduped events (31_segment_… shape)."""
    ev = ctx.read("ods.events")
    s = sessionize(ev, user_col="user_id", ts_col="ts", gap_minutes=30)
    return s.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("session_value"),
    )


def dwh_rfm_segments(ctx: RunContext) -> DataFrame:
    """RFM quartile scores over the master customer entity
    (2_ods_marketing/00_customer_rfm_segmentation.sql shape) —
    reads the MATERIALIZED master table (§4 materialize-if-reused:
    master.customer also feeds the historical snapshot and the
    duplicate monitor, so it is built once and read from parquet),
    then scores with the two-phase distributed global-rank operator,
    so the nightly rebuild carries no single-reducer sort."""
    from ..operators.globalrank import attach_percent_rank

    m = ctx.read("master.customer").select(
        "c_custkey", "c_mktsegment", "n_orders", "total_spend"
    )
    m = attach_percent_rank(m, "n_orders", "frequency_rank")
    m = attach_percent_rank(m, "total_spend", "monetary_rank")

    def quartile(col: str):
        r = F.col(col)
        return (
            F.when(r <= 0.25, 1)
            .when(r <= 0.5, 2)
            .when(r <= 0.75, 3)
            .otherwise(4)
        )

    return m.select(
        "c_custkey",
        "c_mktsegment",
        quartile("frequency_rank").alias("f_score"),
        quartile("monetary_rank").alias("m_score"),
        (quartile("frequency_rank") * 10 + quartile("monetary_rank")).alias(
            "fm"
        ),
    )


# --- monitoring -----------------------------------------------------------

def mon_duplicates(ctx: RunContext) -> DataFrame:
    """master_duplicates.sql:4-18 shape: business keys appearing >1×."""
    return duplicate_keys(ctx.read("master.customer"), ["c_custkey"])


def mon_missing_dates(ctx: RunContext) -> DataFrame:
    """missing_dates.sql:3-8 shape: calendar days with no orders."""
    o = ctx.read("ods.orders")
    return missing_dates(o, F.to_date("o_orderdate"))


def mon_event_volume(ctx: RunContext) -> DataFrame:
    """snowplow_monitoring.sql shape: per-event-type daily volume
    z-scores against the trailing window, flagging drifted days."""
    ev = ctx.read("ods.events")
    return volume_anomaly(ev, F.col("event_date"), ["event_type"])


# --- registry promotion ---------------------------------------------------

def registry_model(name: str, query: str, **kwargs) -> Model:
    """Promote a registry query into a nightly-pipeline Model.

    The build IS the registry Spark callable run against the raw
    source dir, so the materialized table is hash-equal to the
    registry query by construction (single source of truth — the
    reference's .sql file is simultaneously its model definition AND
    a runnable query; this keeps that identity). The Model adds what
    the registry form lacks: a schema-qualified target, a write mode
    (W1/W2/W4), and a position in the config-ordered layer topology
    (pipeline_config.json via dag_fullload_pipeline.py:43-80)."""
    from ..queries import REGISTRY

    spec = REGISTRY[query]

    def build(ctx: RunContext) -> DataFrame:
        return spec.spark(ctx.spark, ctx.source_dir)

    return Model(name, build, **kwargs)


def _promoted_groups() -> "list[TaskGroup]":
    """The composite registry queries as config-ordered task groups —
    each group ≅ one pipeline_config.json entry (a Datawarehouse-ETL
    directory), names kept close to the reference's:

      1_ods_core        → ods (allocation conformance)
      30_segment_events → segment_events (track-events staging, W2)
      31_segment_page_view_and_sessions → segment_sessions
      3_master          → master (wide entities, W1)
      5_master_historical → master_historical (daily snapshots, W4
                          + the SCD2 compaction of the snapshots)
      4_dwh_core / finance / luxco-SPV / grover_card / marketing
                        → the domain marts (W1)
      5_dwh_widgets / reporting → reporting marts (W1)
      8_monitoring      → mon (runs LAST, reads what was built)
    """
    return [
        TaskGroup(
            "ods",
            [
                Model("ods.events", ods_events, write="upsert",
                      keys=["event_id"], partition_by=["event_date"]),
                Model("ods.orders", ods_orders),
                # 1_ods_core/00_allocation.sql: double-QUALIFY
                # allocation conformance
                registry_model("ods.allocation", "ops_allocation"),
            ],
        ),
        TaskGroup(
            "segment_events",
            [
                # 30_segment_events/01_track_events.sql: JSON guard →
                # parse → dedup; DELETE+INSERT upsert in the reference
                # (05_all_events_incremental.sql:160-170) → W2 keyed
                # by event_id, partitioned by the collector date
                registry_model(
                    "ods.track_events", "wh_track_events",
                    write="upsert", keys=["event_id"],
                    partition_by=["collector_date"],
                ),
            ],
        ),
        TaskGroup(
            "segment_sessions",
            [
                # 31_segment_page_view_and_sessions, file order
                # 06_page_views → 08_sessions → 13_sessions_union
                registry_model("dwh.page_views", "wh_page_views"),
                registry_model("dwh.sessions_mart", "wh_sessions_mart"),
                registry_model(
                    "dwh.sessions_union", "sessions_union_stitch"
                ),
            ],
        ),
        TaskGroup(
            "master",
            [
                Model("master.customer", master_customer),
                # 3_master/subscription.sql
                registry_model(
                    "master.subscription", "master_subscription"
                ),
            ],
        ),
        TaskGroup(
            "master_historical",
            [
                Model(
                    "master_historical.customer_historical",
                    master_customer,
                    write="snapshot",
                    date_col="date",
                ),
                # 5_master_historical/subscription_historical.sql
                registry_model(
                    "master_historical.subscription_historical",
                    "master_subscription",
                    write="snapshot", date_col="date",
                ),
                # SCD2 compaction of the daily snapshots
                registry_model(
                    "master_historical.customer_scd2", "scd2_history"
                ),
            ],
        ),
        TaskGroup(
            "dwh_core",
            [
                Model("dwh.daily_kpi", dwh_daily_kpi),
                Model("dwh.sessions", dwh_sessions),
                registry_model(
                    "dwh.shipment_funnel", "ops_shipment_funnel"
                ),
            ],
        ),
        TaskGroup(
            "dwh_finance",
            [
                # finance / luxco / SPV marts
                registry_model(
                    "dwh.collection_curves", "fin_collection_curves"
                ),
                registry_model(
                    "dwh.payment_retries", "pay_retry_payments"
                ),
                registry_model(
                    "dwh.luxco_report", "luxco_multigrain_union"
                ),
                registry_model(
                    "dwh.spv_price_outliers", "spv_price_outliers"
                ),
            ],
        ),
        TaskGroup(
            "dwh_grover_card",
            [
                registry_model(
                    "dwh.gc_account_balance", "gc_account_balance"
                ),
                registry_model(
                    "dwh.gc_wallet_expansion", "gc_wallet_expansion"
                ),
            ],
        ),
        TaskGroup(
            "dwh_marketing",
            [
                registry_model(
                    "dwh.affiliate_payout", "mkt_affiliate_payout"
                ),
                registry_model(
                    "dwh.order_attribution", "braze_order_attribution"
                ),
                # 2_ods_marketing/00_customer_rfm_segmentation.sql
                registry_model(
                    "dwh.rfm_segmentation", "dm_rfm_segmentation"
                ),
                Model("dwh.rfm_segments", dwh_rfm_segments),
            ],
        ),
        TaskGroup(
            "reporting",
            [
                # 5_dwh_widgets/toptenproducts
                registry_model("reporting.top_products", "top_products"),
                registry_model(
                    "reporting.sustainability_seasonality",
                    "sust_seasonality",
                ),
            ],
        ),
        TaskGroup(
            "mon",
            [
                Model("mon.customer_duplicates", mon_duplicates),
                Model("mon.order_missing_dates", mon_missing_dates),
                Model("mon.event_volume", mon_event_volume),
                # ANALYZE-style source profile (quality/table_stats)
                registry_model("mon.table_stats", "mon_table_stats"),
            ],
        ),
    ]


def build_warehouse_pipeline(**kwargs) -> Pipeline:
    """The config-ordered group list (≅ pipeline_config.json): 11
    layer groups / 31 models — ods and segment staging first, then
    master entities, their daily-snapshot history, the domain marts
    (core, finance/luxco/SPV, grover-card, marketing), reporting,
    and monitoring last so the monitors read what the run built."""
    return Pipeline(name="fullload", groups=_promoted_groups(), **kwargs)
