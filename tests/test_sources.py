from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.sources.copy_unload import copy_csv, unload
from etl_pipelines_spark.sources.extract import (
    LocalDirExchange,
    StaleFeedError,
    ingest_exchange_files,
    latest_collection_file,
    paged_api_extract,
    send_exchange_export,
    sql_pull,
)
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


class TestSqlPull:
    """S7: injected-executor SQL pull (duckdb stands in for the
    reference's pd.read_sql over Redshift)."""

    def test_pull_roundtrip(self, spark):
        import duckdb

        df = sql_pull(
            spark,
            "SELECT i AS id, i * 2.5 AS amount FROM range(5) t(i)",
            lambda q: duckdb.sql(q).df(),
            schema="id bigint, amount double",
        )
        rows = {r.id: r.amount for r in df.collect()}
        assert rows == {i: i * 2.5 for i in range(5)}

    def test_zero_rows_early_exit(self, spark):
        import duckdb

        df = sql_pull(
            spark,
            "SELECT 1 AS x WHERE false",
            lambda q: duckdb.sql(q).df(),
        )
        assert df is None


class TestJdbcDerby:
    """S7 through Spark's REAL JDBC source — wire-faithful, driven
    against the embedded Derby engine Spark ships (no fake: actual
    JDBC driver, actual SQL database, actual connection). Production
    swaps URL/driver; the code path is identical."""

    DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

    def _url(self, name):
        return f"jdbc:derby:memory:{name};create=true"

    def test_push_then_pull_roundtrip(self, spark):
        from etl_pipelines_spark.sources.extract import jdbc_pull, jdbc_push

        url = self._url("t_round")
        src = spark.range(20).selectExpr(
            "id", "cast(id * 2.5 as double) as amount"
        )
        jdbc_push(src, url, "payments", self.DRIVER)
        back = jdbc_pull(spark, url, "payments", self.DRIVER)
        assert back.count() == 20
        got = {r.id: r.amount for r in back.collect()}
        assert got == {i: i * 2.5 for i in range(20)}

    def test_filter_pushdown_reaches_the_database(self, spark):
        """The predicate must appear as PushedFilters on the JDBC
        scan — the database does the filtering, not Spark (the whole
        point of a JDBC extract vs pull-everything pandas)."""
        from etl_pipelines_spark.sources.extract import jdbc_pull, jdbc_push

        url = self._url("t_push")
        jdbc_push(spark.range(50).selectExpr("id"), url, "t", self.DRIVER)
        q = jdbc_pull(spark, url, "t", self.DRIVER).filter("id >= 40")
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "GreaterThanOrEqual(id,40)" in plan
        assert q.count() == 10

    def test_subquery_pushdown_form(self, spark):
        """dbtable as '(SELECT ...) alias' runs database-side —
        the reference's extract-SQL idiom."""
        from etl_pipelines_spark.sources.extract import jdbc_pull, jdbc_push

        url = self._url("t_sub")
        jdbc_push(
            spark.range(10).selectExpr("id", "id % 2 as k"),
            url, "t2", self.DRIVER,
        )
        # Spark's JDBC writer quotes identifiers, so Derby stores
        # case-sensitive lowercase names — the subquery must quote
        # them back (the usual cross-dialect identifier gotcha).
        back = jdbc_pull(
            spark, url,
            '(SELECT "k", COUNT(*) AS n FROM t2 GROUP BY "k") src',
            self.DRIVER,
        )
        assert {(r["k"], r["N"]) for r in back.collect()} == {(0, 5), (1, 5)}

    def test_partitioned_parallel_read(self, spark):
        """partitionColumn/bounds/numPartitions split the pull into
        N concurrent range queries — the scan must carry N input
        partitions (the 100 TB single-connection fix)."""
        from etl_pipelines_spark.sources.extract import jdbc_pull, jdbc_push

        url = self._url("t_par")
        jdbc_push(spark.range(100).selectExpr("id"), url, "t", self.DRIVER)
        back = jdbc_pull(
            spark, url, "t", self.DRIVER,
            partition_column="id", lower_bound=0, upper_bound=100,
            num_partitions=4,
        )
        assert back.rdd.getNumPartitions() == 4
        assert back.count() == 100


class TestPagedApiExtract:
    """S8: cursor-paged bulk export with explicit schema."""

    def _fake_api(self):
        pages = {
            None: ([{"id": 1, "code": "a"}, {"id": 2, "code": "b"}], "p2"),
            "p2": ([{"id": 3, "code": "c"}], "p3"),
            "p3": ([], None),
        }
        calls = []

        def fetch(cursor):
            calls.append(cursor)
            return pages[cursor]

        return fetch, calls

    def test_walks_cursors_to_exhaustion(self, spark):
        fetch, calls = self._fake_api()
        df = paged_api_extract(spark, fetch, "id int, code string")
        assert calls == [None, "p2", "p3"]
        assert {r.id: r.code for r in df.collect()} == {1: "a", 2: "b", 3: "c"}
        assert df.schema.simpleString() == "struct<id:int,code:string>"

    def test_runaway_pagination_guard(self, spark):
        with pytest.raises(RuntimeError, match="did not terminate"):
            paged_api_extract(
                spark, lambda c: ([], "again"), "id int", max_pages=3
            )


class TestCollectionFeed:
    """S9: newest date-stamped scraper drop, staleness-gated."""

    LISTING = [
        "drops/price-collection-amazon-2024-01-03.csv",
        "drops/price-collection-amazon-2024-01-05.csv",
        "drops/price-collection-amazon-2024-01-09.csv",  # future vs run
        "drops/price-collection-rebuy-2024-01-06.csv",  # other feed
        "drops/price-collection-amazon-junkdate.csv",
    ]

    def test_picks_latest_at_or_before_run_date(self):
        from datetime import date

        got = latest_collection_file(
            self.LISTING, "price-collection-amazon-", ".csv", date(2024, 1, 7)
        )
        assert got.path.endswith("amazon-2024-01-05.csv")
        assert got.stamp == date(2024, 1, 5)

    def test_stale_feed_raises(self):
        from datetime import date

        with pytest.raises(StaleFeedError, match="older than 4d"):
            latest_collection_file(
                self.LISTING, "price-collection-amazon-", ".csv",
                date(2024, 1, 31),
            )

    def test_no_match_raises(self):
        from datetime import date

        with pytest.raises(StaleFeedError, match="no price-collection-ebay-"):
            latest_collection_file(
                self.LISTING, "price-collection-ebay-", ".csv", date(2024, 1, 7)
            )


class TestFileExchange:
    """S10: SFTP-shaped exchange with a local-directory fake."""

    def test_ingest_inbound_files(self, spark, tmp_path):
        remote = tmp_path / "remote"
        (remote / "inbox").mkdir(parents=True)
        (remote / "inbox" / "g1.csv").write_text("order_id;grade\n1;A\n2;B\n")
        (remote / "inbox" / "g2.csv").write_text("order_id;grade\n3;C\n")
        (remote / "inbox" / "notes.txt").write_text("ignore me")

        ex = LocalDirExchange(str(remote))
        df, names = ingest_exchange_files(
            spark, ex, "inbox", str(tmp_path / "staging"),
            "order_id int, grade string",
        )
        assert names == ["g1.csv", "g2.csv"]
        assert {r.order_id: r.grade for r in df.collect()} == {
            1: "A", 2: "B", 3: "C",
        }

    def test_empty_inbox_skips(self, spark, tmp_path):
        ex = LocalDirExchange(str(tmp_path / "remote"))
        df, names = ingest_exchange_files(
            spark, ex, "inbox", str(tmp_path / "staging"), "order_id int"
        )
        assert df is None and names == []

    def test_outbound_roundtrip(self, spark, tmp_path):
        remote = tmp_path / "remote"
        ex = LocalDirExchange(str(remote))
        df = spark.range(5).select(
            F.col("id").alias("order_id"),
            F.concat(F.lit("G"), F.col("id")).alias("status"),
        )
        send_exchange_export(
            df, ex, "outbox/status.csv", str(tmp_path / "scratch")
        )
        back = spark.read.option("sep", ";").option("header", True).csv(
            str(remote / "outbox" / "status.csv")
        )
        assert back.count() == 5
        assert set(back.columns) == {"order_id", "status"}


class TestFormatParity:
    """UNLOAD format surface: the same frame must roundtrip through
    every Spark-native export format the reference's UNLOAD/COPY
    family touches (parquet, csv, json) plus ORC (the columnar
    alternative some warehouses land)."""

    def test_unload_roundtrips_all_formats(self, spark, tmp_path):
        from etl_pipelines_spark.sources.copy_unload import unload

        src = spark.createDataFrame(
            [(1, "alpha", 1.5), (2, "beta", -2.25), (3, None, 0.0)],
            ["id", "name", "score"],
        )
        want = sorted(map(str, src.collect()))

        for fmt in ("parquet", "orc", "json", "csv"):
            path = str(tmp_path / f"out_{fmt}")
            opts = {"header": True} if fmt == "csv" else {}
            unload(src, path, fmt=fmt, parallel=True, **opts)
            r = spark.read
            if fmt == "csv":
                got_df = r.schema(src.schema).option("header", True).csv(path)
            elif fmt == "json":
                got_df = r.schema(src.schema).json(path)
            else:
                got_df = getattr(r, fmt)(path)
            assert sorted(map(str, got_df.collect())) == want, fmt


class TestJsonlQuarantine:
    def test_corrupt_lines_quarantined_good_rows_land(
        self, spark, tmp_path
    ):
        import gzip

        from etl_pipelines_spark.sources import compact_json_with_quarantine

        jdir = tmp_path / "landing"
        jdir.mkdir()
        good = [
            '{"id": 1, "name": "a"}',
            '{"id": 2, "name": "b"}',
            '{"id": 3, "name": "c"}',
        ]
        bad = ['{"id": 4, "name": ', "not json at all"]
        (jdir / "part-0.json").write_text("\n".join(good[:2] + bad[:1]))
        # gzip member: Spark decompresses by extension
        with gzip.open(jdir / "part-1.json.gz", "wt") as f:
            f.write("\n".join([good[2], bad[1]]))

        n_good, n_bad = compact_json_with_quarantine(
            spark,
            str(jdir),
            str(tmp_path / "out"),
            str(tmp_path / "quarantine"),
            schema="id bigint, name string",
        )
        assert (n_good, n_bad) == (3, 2)
        landed = spark.read.parquet(str(tmp_path / "out"))
        assert sorted(r.id for r in landed.collect()) == [1, 2, 3]
        # quarantined originals are verbatim, replayable
        q = {r.value for r in spark.read.text(str(tmp_path / "quarantine")).collect()}
        assert q == set(bad)

    def test_all_good_means_empty_quarantine(self, spark, tmp_path):
        from etl_pipelines_spark.sources import compact_json_with_quarantine

        jdir = tmp_path / "landing2"
        jdir.mkdir()
        (jdir / "a.json").write_text('{"id": 1, "name": "x"}')
        n_good, n_bad = compact_json_with_quarantine(
            spark, str(jdir), str(tmp_path / "o2"), str(tmp_path / "q2"),
            schema="id bigint, name string",
        )
        assert (n_good, n_bad) == (1, 0)
