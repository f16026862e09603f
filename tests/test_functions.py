"""Unit tests for the Redshift-dialect compat layer — the functions
SURVEY.md §4 flags as semantics risks (DATEDIFF boundary counting,
TO_CHAR codes, DOW numbering, DECODE null-matching, LISTAGG
ordering, SPLIT_PART out-of-bounds)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_pipelines_spark import functions as RF


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def ts(s: str):
    return F.lit(s).cast("timestamp")


class TestDatediffBoundary:
    """Redshift counts unit BOUNDARIES crossed, not elapsed units."""

    def test_year_boundary(self, spark):
        assert _one(spark, RF.datediff("year", ts("2023-12-31"), ts("2024-01-01"))) == 1

    def test_year_no_boundary(self, spark):
        assert _one(spark, RF.datediff("year", ts("2024-01-01"), ts("2024-12-31"))) == 0

    def test_month_boundary(self, spark):
        assert _one(spark, RF.datediff("month", ts("2024-01-31"), ts("2024-02-01"))) == 1
        assert _one(spark, RF.datediff("month", ts("2024-01-01"), ts("2024-01-31"))) == 0

    def test_day_boundary(self, spark):
        assert _one(spark, RF.datediff("day", ts("2024-01-01 23:59:59"), ts("2024-01-02 00:00:00"))) == 1
        assert _one(spark, RF.datediff("day", ts("2024-01-01 00:00:00"), ts("2024-01-01 23:59:59"))) == 0

    def test_week_starts_monday(self, spark):
        # 2024-01-07 is a Sunday, 2024-01-08 a Monday -> boundary
        assert _one(spark, RF.datediff("week", ts("2024-01-07"), ts("2024-01-08"))) == 1
        assert _one(spark, RF.datediff("week", ts("2024-01-08"), ts("2024-01-14"))) == 0

    def test_second_boundary(self, spark):
        assert _one(spark, RF.datediff("second", ts("2024-01-01 00:00:00.9"), ts("2024-01-01 00:00:01.1"))) == 1

    def test_negative(self, spark):
        assert _one(spark, RF.datediff("day", ts("2024-01-05"), ts("2024-01-01"))) == -4

    def test_quarter(self, spark):
        assert _one(spark, RF.datediff("quarter", ts("2024-03-31"), ts("2024-04-01"))) == 1


class TestDateadd:
    def test_day(self, spark):
        assert _one(spark, RF.dateadd("day", 7, ts("2024-01-01"))) == dt.datetime(2024, 1, 8)

    def test_month_clamps(self, spark):
        assert _one(spark, RF.dateadd("month", 1, ts("2024-01-31"))) == dt.datetime(2024, 2, 29)

    def test_hour(self, spark):
        assert _one(spark, RF.dateadd("hour", -2, ts("2024-01-01 01:00:00"))) == dt.datetime(2023, 12, 31, 23)


class TestToChar:
    def test_datetime_format(self, spark):
        assert _one(spark, RF.to_char(ts("2024-03-07 14:05:09"), "YYYY-MM-DD HH24:MI:SS")) == "2024-03-07 14:05:09"

    def test_month_day_names(self, spark):
        assert _one(spark, RF.to_char(ts("2024-01-07"), "MONTH")) == "January"
        assert _one(spark, RF.to_char(ts("2024-01-07"), "DAY")) == "Sunday"
        assert _one(spark, RF.to_char(ts("2024-01-07"), "DY")) == "Sun"

    def test_dow_digit(self, spark):
        # Redshift 'd': 1=Sunday .. 7=Saturday
        assert _one(spark, RF.to_char(ts("2024-01-07"), "d")) == "1"
        assert _one(spark, RF.to_char(ts("2024-01-08"), "d")) == "2"

    def test_mixed_with_dow(self, spark):
        assert _one(spark, RF.to_char(ts("2024-01-07"), "YYYY/d")) == "2024/1"

    def test_quarter_code(self, spark):
        assert _one(spark, RF.to_char(ts("2024-08-15"), "Q")) == "3"


class TestDatePart:
    def test_dow_zero_sunday(self, spark):
        assert _one(spark, RF.date_part("dow", ts("2024-01-07"))) == 0  # Sunday
        assert _one(spark, RF.date_part("dow", ts("2024-01-13"))) == 6  # Saturday

    def test_epoch(self, spark):
        assert _one(spark, RF.date_part("epoch", ts("1970-01-01 00:01:00"))) == 60

    def test_doy(self, spark):
        assert _one(spark, RF.date_part("doy", ts("2024-02-01"))) == 32


class TestConvertTimezone:
    def test_utc_to_berlin_winter(self, spark):
        out = _one(spark, RF.convert_timezone("UTC", "Europe/Berlin", ts("2024-01-15 12:00:00")))
        assert out == dt.datetime(2024, 1, 15, 13)

    def test_utc_to_berlin_summer(self, spark):
        out = _one(spark, RF.convert_timezone("UTC", "Europe/Berlin", ts("2024-07-15 12:00:00")))
        assert out == dt.datetime(2024, 7, 15, 14)


class TestStrings:
    def test_split_part_oob_returns_empty(self, spark):
        assert _one(spark, RF.split_part(F.lit("a,b"), ",", 5)) == ""

    def test_split_part_basic(self, spark):
        assert _one(spark, RF.split_part(F.lit("a,b,c"), ",", 2)) == "b"

    def test_right_shorter_than_n(self, spark):
        assert _one(spark, RF.right(F.lit("ab"), 5)) == "ab"

    def test_right_basic(self, spark):
        assert _one(spark, RF.right(F.lit("hello"), 3)) == "llo"

    def test_similar_to_is_anchored(self, spark):
        assert _one(spark, RF.similar_to(F.lit("12345"), "[0-9]*")) is True
        assert _one(spark, RF.similar_to(F.lit("12a45"), "[0-9]*")) is False
        assert _one(spark, RF.similar_to(F.lit("abc"), "a%")) is True

    def test_charindex(self, spark):
        assert _one(spark, RF.charindex("l", F.lit("hello"))) == 3
        assert _one(spark, RF.charindex("z", F.lit("hello"))) == 0


class TestJson:
    def test_extract_path(self, spark):
        assert _one(spark, RF.json_extract_path_text(F.lit('{"a":{"b":"x"}}'), "a", "b")) == "x"

    def test_extract_missing_is_null(self, spark):
        assert _one(spark, RF.json_extract_path_text(F.lit('{"a":1}'), "z")) is None

    def test_is_valid_json(self, spark):
        assert _one(spark, RF.is_valid_json(F.lit('{"a":1}'))) is True
        assert _one(spark, RF.is_valid_json(F.lit("not json"))) is False
        assert _one(spark, RF.is_valid_json(F.lit(None).cast("string"))) is False

    def test_array_element(self, spark):
        assert _one(spark, RF.json_extract_array_element_text(F.lit('[10,20,30]'), 1)) == "20"


class TestDecode:
    def test_basic(self, spark):
        assert _one(spark, RF.decode(F.lit("b"), "a", 1, "b", 2, 0)) == 2

    def test_default(self, spark):
        assert _one(spark, RF.decode(F.lit("z"), "a", 1, "b", 2, 0)) == 0

    def test_no_default_is_null(self, spark):
        assert _one(spark, RF.decode(F.lit("z"), "a", 1)) is None

    def test_null_matches_null(self, spark):
        # Oracle/Redshift DECODE: NULL == NULL (unlike the = operator)
        out = _one(
            spark,
            RF.decode(F.lit(None).cast("string"), F.lit(None).cast("string"), "matched", "not"),
        )
        assert out == "matched"


class TestListagg:
    def test_sorted_by_value(self, spark):
        df = spark.createDataFrame([("g", "b"), ("g", "a"), ("g", "c")], ["g", "v"])
        out = df.groupBy("g").agg(RF.listagg("v", ",").alias("s")).collect()[0].s
        assert out == "a,b,c"

    def test_distinct(self, spark):
        df = spark.createDataFrame([("g", "b"), ("g", "a"), ("g", "b")], ["g", "v"])
        out = df.groupBy("g").agg(RF.listagg("v", "|", distinct=True).alias("s")).collect()[0].s
        assert out == "a|b"

    def test_order_by_other_key(self, spark):
        df = spark.createDataFrame(
            [("g", 3, "c"), ("g", 1, "a"), ("g", 2, "b")], ["g", "k", "v"]
        )
        out = df.groupBy("g").agg(RF.listagg("v", ">", order_by="k").alias("s")).collect()[0].s
        assert out == "a>b>c"

    def test_drops_nulls(self, spark):
        df = spark.createDataFrame([("g", "a"), ("g", None)], ["g", "v"])
        out = df.groupBy("g").agg(RF.listagg("v", ",").alias("s")).collect()[0].s
        assert out == "a"


class TestMisc:
    def test_mod_sign_follows_dividend(self, spark):
        assert _one(spark, RF.mod(F.lit(-7), 3)) == -1

    def test_nvl2(self, spark):
        assert _one(spark, RF.nvl2(F.lit("x"), F.lit(1), F.lit(2))) == 1
        assert _one(spark, RF.nvl2(F.lit(None).cast("string"), F.lit(1), F.lit(2))) == 2

    def test_identity_hashes_match_hashlib(self, spark):
        """Reference hashes identities with MD5/SHA1 (11_marketing_
        reporting/Braze Datamart/03_braze_order_attribution.sql:37-41).
        The braze_order_attribution oracle uses sha256 (DuckDB has no
        sha1); this pins Spark's sha1/md5/sha2 to the standard."""
        import hashlib

        row = (
            spark.range(1)
            .select(
                F.md5(F.lit("cust-42")).alias("m"),
                F.sha1(F.lit("click")).alias("s1"),
                F.sha2(F.lit("click"), 256).alias("s2"),
            )
            .collect()[0]
        )
        assert row.m == hashlib.md5(b"cust-42").hexdigest()
        assert row.s1 == hashlib.sha1(b"click").hexdigest()
        assert row.s2 == hashlib.sha256(b"click").hexdigest()
