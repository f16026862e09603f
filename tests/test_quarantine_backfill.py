"""End-to-end incident narrative (VERDICT r5 #5): a corrupt gzip
day in the JSONL landing zone → its lines QUARANTINED verbatim
(sources/jsonl.compact_json_with_quarantine) → the daily snapshot
pipeline runs anyway and the day shows up as a GAP in the
missing-dates monitor → the quarantined originals are repaired and
replayed → plans/pipeline.backfill catches the day up → the gap
closes. Three run dates, every piece the production engine would
use — the composition the unit tests (test_sources.py quarantine,
test_backfill.py catchup) previously proved only in isolation.
"""

from __future__ import annotations

import datetime as dt
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.plans import Model, Pipeline, RunContext, TaskGroup, backfill
from etl_pipelines_spark.quality.checks import missing_dates
from etl_pipelines_spark.sources import compact_json_with_quarantine
from etl_pipelines_spark.sources.catalog import Catalog

DAYS = [dt.date(2024, 3, 1), dt.date(2024, 3, 2), dt.date(2024, 3, 3)]
SCHEMA = "event_id BIGINT, ts STRING, event_type STRING, value DOUBLE"


def _write_landing(root: str) -> None:
    """Three Firehose-style day partitions of gzipped JSONL; day 2's
    producer prefixed every record with a log header ("<ts> INFO ")
    — a classic upstream deploy bug: every line malformed as JSON,
    none droppable, all mechanically repairable."""
    for i, day in enumerate(DAYS):
        d = os.path.join(root, day.isoformat())
        os.makedirs(d, exist_ok=True)
        lines = []
        for n in range(5):
            rec = {
                "event_id": i * 100 + n,
                "ts": f"{day.isoformat()}T0{n}:00:00",
                "event_type": "view" if n % 2 else "click",
                "value": float(n),
            }
            if day == DAYS[1]:
                lines.append(f"{day.isoformat()} INFO " + json.dumps(rec))
            else:
                lines.append(json.dumps(rec))
        with gzip.open(os.path.join(d, "part-000.jsonl.gz"), "wt") as f:
            f.write("\n".join(lines) + "\n")


def _pipeline(landing: str, staged: str) -> Pipeline:
    """Two models: the day's staged slice snapshotted by date (W4),
    then the calendar-gap monitor over the whole landed table."""

    def land_day(ctx: RunContext):
        day_dir = os.path.join(staged, ctx.run_date.isoformat())
        df = ctx.spark.read.parquet(day_dir)
        return df.withColumn("event_date", F.to_date("ts"))

    def monitor(ctx: RunContext):
        return missing_dates(
            ctx.read("ods.events_landed"), F.col("event_date")
        )

    return Pipeline(
        "incident",
        [
            TaskGroup("ods", [
                Model("ods.events_landed", land_day,
                      write="snapshot", date_col="snapshot_date"),
            ]),
            TaskGroup("mon", [
                Model("mon.event_gaps", monitor),
            ]),
        ],
        retries=0,
    )


class TestQuarantineBackfillGapClose:
    def test_corrupt_day_quarantines_then_backfill_closes_the_gap(
        self, spark, tmp_path
    ):
        landing = str(tmp_path / "landing")
        staged = str(tmp_path / "staged")
        quarantine = str(tmp_path / "quarantine")
        _write_landing(landing)

        # --- ingest each day: corrupt lines quarantine, never abort
        counts = {}
        for day in DAYS:
            counts[day] = compact_json_with_quarantine(
                spark,
                os.path.join(landing, day.isoformat()),
                os.path.join(staged, day.isoformat()),
                os.path.join(quarantine, day.isoformat()),
                schema=SCHEMA,
            )
        assert counts[DAYS[0]] == (5, 0)
        assert counts[DAYS[1]] == (0, 5)  # the whole day quarantined
        assert counts[DAYS[2]] == (5, 0)

        # --- nightly backfill over the three dates runs GREEN (the
        # corrupt day lands zero rows; the DAG must not abort)
        ctx = RunContext(
            spark=spark,
            catalog=Catalog(spark, str(tmp_path / "wh")),
            source_dir="/root/testdata/sf0.001",
            run_date=DAYS[0],
        )
        pipe = _pipeline(landing, staged)
        out = backfill(pipe, ctx, DAYS[0], DAYS[2])
        assert all(r.status == "success" for rs in out.values() for r in rs)

        # --- the monitor SEES the gap: day 2 missing from the calendar
        gaps = {r.date for r in ctx.read("mon.event_gaps").collect()}
        assert gaps == {DAYS[1]}

        # --- incident fix: the quarantined originals are verbatim and
        # replayable — strip the producer's log prefix and re-compact
        # the repaired lines through the SAME ingester
        qdir = os.path.join(quarantine, DAYS[1].isoformat())
        repaired = [
            r.value.split(" INFO ", 1)[1]
            for r in spark.read.text(qdir).collect()
        ]
        fixed_dir = str(tmp_path / "fixed" / DAYS[1].isoformat())
        os.makedirs(fixed_dir, exist_ok=True)
        with open(os.path.join(fixed_dir, "part-000.jsonl"), "w") as f:
            f.write("\n".join(repaired) + "\n")
        n_good, n_bad = compact_json_with_quarantine(
            spark,
            fixed_dir,
            os.path.join(staged, DAYS[1].isoformat()),
            os.path.join(quarantine, "replay-" + DAYS[1].isoformat()),
            schema=SCHEMA,
        )
        assert (n_good, n_bad) == (5, 0)

        # --- catchup: re-backfill ONLY the broken date (Airflow
        # clear-task semantics); snapshot overwrite is idempotent
        out2 = backfill(pipe, ctx, DAYS[1], DAYS[1])
        assert all(r.status == "success" for rs in out2.values() for r in rs)

        # --- gap closed; landed table is complete and not duplicated
        assert ctx.read("mon.event_gaps").count() == 0
        landed = ctx.read("ods.events_landed")
        assert landed.count() == 15
        per_day = {
            r.event_date: r.n
            for r in landed.groupBy("event_date")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert per_day == {d: 5 for d in DAYS}

    def test_missing_day_dir_fails_loud_not_silent(self, spark, tmp_path):
        """A day whose staged dir never landed at ALL (vs landed-
        empty) must fail its model run loudly — the all_done DAG
        records the failure and later groups still run."""
        landing = str(tmp_path / "landing")
        staged = str(tmp_path / "staged")
        _write_landing(landing)
        for day in (DAYS[0],):
            compact_json_with_quarantine(
                spark,
                os.path.join(landing, day.isoformat()),
                os.path.join(staged, day.isoformat()),
                str(tmp_path / "q" / day.isoformat()),
                schema=SCHEMA,
            )
        ctx = RunContext(
            spark=spark,
            catalog=Catalog(spark, str(tmp_path / "wh")),
            source_dir="/root/testdata/sf0.001",
            run_date=DAYS[0],
        )
        pipe = _pipeline(landing, staged)
        out = backfill(pipe, ctx, DAYS[0], DAYS[1])
        day2 = {r.name: r.status for r in out[DAYS[1]]}
        assert day2["ods.events_landed"] == "failed"
        assert day2["mon.event_gaps"] == "success"  # trigger_rule all_done
