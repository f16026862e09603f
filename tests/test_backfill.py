"""Backfill (plans/pipeline.backfill) — Airflow-catchup semantics:
run every execution date in a range in order, snapshot models
overwrite only their own date partition, re-running any sub-range is
idempotent, and later dates can read earlier dates' outputs."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.plans import (
    Model,
    Pipeline,
    RunContext,
    TaskGroup,
    backfill,
)
from etl_pipelines_spark.sources.catalog import Catalog


@pytest.fixture()
def ctx(spark, sf_dir, tmp_path):
    return RunContext(
        spark=spark,
        catalog=Catalog(spark, str(tmp_path / "wh")),
        source_dir=sf_dir,
        run_date=dt.date(1998, 8, 1),
    )


def _daily_model():
    def build(ctx: RunContext):
        return (
            ctx.source("events")
            .filter(F.to_date("ts") == ctx.run_date_lit())
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("date", ctx.run_date_lit().cast("string"))
        )

    return Model(
        "mon.daily_counts", build, write="snapshot", date_col="date"
    )


def _dates(spark, sf_dir):
    from etl_pipelines_spark.queries import load

    rows = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .groupBy("d").count().orderBy("d").limit(4).collect()
    )
    return [r.d for r in rows]


class TestBackfill:
    def test_range_builds_one_partition_per_date(self, spark, sf_dir, ctx):
        days = _dates(spark, sf_dir)[:3]
        pipe = Pipeline("bf", [TaskGroup("g", [_daily_model()])])
        out = backfill(pipe, ctx, days[0], days[2])
        assert sorted(out) == days
        assert all(
            r.status == "success" for rs in out.values() for r in rs
        )
        got = ctx.read("mon.daily_counts")
        # partition-dir values read back type-inferred as DATE
        have_dates = {
            r.date for r in got.select("date").distinct().collect()
        }
        assert have_dates == set(days)

    def test_refill_subrange_is_idempotent(self, spark, sf_dir, ctx):
        days = _dates(spark, sf_dir)[:3]
        pipe = Pipeline("bf", [TaskGroup("g", [_daily_model()])])
        backfill(pipe, ctx, days[0], days[2])
        before = sorted(
            map(tuple, ctx.read("mon.daily_counts").collect())
        )
        # re-run just the middle day: its partition is overwritten in
        # place, every other partition untouched
        backfill(pipe, ctx, days[1], days[1])
        after = sorted(
            map(tuple, ctx.read("mon.daily_counts").collect())
        )
        assert before == after

    def test_partition_matches_direct_batch(self, spark, sf_dir, ctx):
        days = _dates(spark, sf_dir)[:2]
        pipe = Pipeline("bf", [TaskGroup("g", [_daily_model()])])
        backfill(pipe, ctx, days[0], days[1])
        got = (
            ctx.read("mon.daily_counts")
            .filter(F.col("date") == F.lit(days[0]))
            .select("event_type", "n")
        )
        want = (
            ctx.source("events")
            .filter(F.to_date("ts") == F.lit(days[0].isoformat()).cast("date"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
