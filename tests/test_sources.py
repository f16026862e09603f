from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.sources.copy_unload import copy_csv, unload
from etl_pipelines_spark.sources.reverse_etl import (
    ErrorThresholdExceeded,
    PushResult,
    chunked,
    push,
    push_distributed,
)


class TestCopyCsv:
    def test_copy_with_header_and_delimiter(self, spark, tmp_path):
        p = tmp_path / "in.csv"
        p.write_text("id;name;amount\n1;a;10.5\n2;b;\n3;;7.25\n")
        df = copy_csv(
            spark, str(p), "id int, name string, amount double", sep=";"
        )
        rows = {r.id: (r.name, r.amount) for r in df.collect()}
        assert rows == {1: ("a", 10.5), 2: ("b", None), 3: (None, 7.25)}

    def test_column_list_projection(self, spark, tmp_path):
        p = tmp_path / "in.csv"
        p.write_text("id;name;amount\n1;a;10.5\n")
        df = copy_csv(
            spark, str(p), "id int, name string, amount double",
            sep=";", columns=["id", "amount"],
        )
        assert df.columns == ["id", "amount"]

    def test_permissive_bad_rows_null(self, spark, tmp_path):
        p = tmp_path / "in.csv"
        p.write_text("id;amount\n1;10.5\nnot_an_int;zzz\n")
        df = copy_csv(spark, str(p), "id int, amount double", sep=";")
        assert df.filter(F.col("id").isNull()).count() == 1


class TestUnload:
    def test_parallel_off_single_file(self, spark, sf_dir, tmp_path):
        df = spark.read.parquet(f"{sf_dir}/region.parquet")
        out = str(tmp_path / "out")
        unload(df, out, parallel=False)
        import glob

        files = glob.glob(out + "/*.parquet")
        assert len(files) == 1
        assert spark.read.parquet(out).count() == df.count()

    def test_max_records_per_file_splits(self, spark, sf_dir, tmp_path):
        df = spark.read.parquet(f"{sf_dir}/customer.parquet")
        out = str(tmp_path / "out")
        unload(df, out, parallel=False, max_records_per_file=50)
        import glob

        files = glob.glob(out + "/*.parquet")
        assert len(files) >= df.count() // 50
        assert spark.read.parquet(out).count() == df.count()


class TestReverseEtl:
    def test_chunked(self):
        assert list(chunked(iter([{"i": i} for i in range(5)]), 2)) == [
            [{"i": 0}, {"i": 1}], [{"i": 2}, {"i": 3}], [{"i": 4}],
        ]

    def test_push_all_ok(self, spark):
        df = spark.range(10).withColumnRenamed("id", "user_id")
        sent = []
        res = push(df, lambda c: (sent.append(c), True)[1], chunk_size=4)
        assert res == PushResult(n_rows=10, n_chunks=3, n_failed_chunks=0)
        assert sum(len(c) for c in sent) == 10

    def test_push_error_gate_trips(self, spark):
        df = spark.range(10).withColumnRenamed("id", "user_id")

        def flaky(chunk):
            return chunk[0]["user_id"] >= 8  # 2 of 3 chunks fail

        with pytest.raises(ErrorThresholdExceeded):
            push(df, flaky, chunk_size=4, error_threshold=0.5)

    def test_push_error_gate_tolerates_below_threshold(self, spark):
        df = spark.range(10).withColumnRenamed("id", "user_id")

        def one_bad(chunk):
            return chunk[0]["user_id"] != 0

        res = push(df, one_bad, chunk_size=4, error_threshold=0.5)
        assert res.n_failed_chunks == 1

    def test_push_distributed_counts(self, spark):
        df = spark.range(100).withColumnRenamed("id", "user_id")
        res = push_distributed(df, lambda c: True, chunk_size=10)
        assert res.n_rows == 100
        assert res.n_failed_chunks == 0
        assert res.n_chunks >= 10  # partition boundaries may add chunks


class TestPartitionedScan:
    """S2/S3: partitioned external tables + partition registration.
    In Spark, registration is partition discovery; the y/m/d predicate
    pushdown the reference hand-builds becomes PartitionFilters."""

    def test_partition_pruning(self, spark, sf_dir, tmp_path):
        from etl_pipelines_spark.queries import load
        from etl_pipelines_spark.sources.writers import full_refresh

        ev = load(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        path = str(tmp_path / "events_part")
        full_refresh(ev, path, partition_by=["event_date"])

        back = spark.read.parquet(path)
        one_day = back.filter(F.col("event_date") == "2024-01-03")
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        # pruned scan reads only the matching partition
        expected = ev.filter(F.col("event_date") == "2024-01-03").count()
        assert one_day.count() == expected
        assert expected > 0


class TestJsonlCompaction:
    """S6: Firehose JSON hour-partition -> parquet rewrite."""

    def test_compact_and_stringify(self, spark, tmp_path):
        import json

        from etl_pipelines_spark.sources.jsonl import (
            compact_json_hour_partition,
        )

        src = tmp_path / "y=2024" / "m=01" / "d=01" / "h=00"
        src.mkdir(parents=True)
        rows = [
            {"messageId": "m1", "userId": 7, "value": 1.5},
            {"messageId": "m2", "userId": 8, "value": None},
        ]
        (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
        out = str(tmp_path / "parquet" / "h=00")
        n = compact_json_hour_partition(
            spark, str(src), out, rename={"messageId": "message_id"}
        )
        assert n == 2
        back = spark.read.parquet(out)
        assert set(back.columns) == {"message_id", "userId", "value"}
        # all-string landing (typing happens downstream, like the reference)
        assert all(t == "string" for _, t in back.dtypes)
