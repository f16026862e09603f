from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.skew import salted_agg, salted_join
from etl_pipelines_spark.sources.bucketing import co_located_join, write_bucketed


@pytest.fixture()
def skewed(spark):
    # 90% of rows share key 0 — the classic hot key
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


class TestSaltedAgg:
    def test_matches_plain_groupby(self, spark, skewed):
        plain = {
            (r.k): (r.s, r.n, r.mn, r.mx)
            for r in skewed.groupBy("k")
            .agg(
                F.sum("v").alias("s"),
                F.count(F.lit(1)).alias("n"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            )
            .collect()
        }
        salted = {
            (r.k): (r.s, r.n, r.mn, r.mx)
            for r in salted_agg(
                skewed,
                ["k"],
                {"s": "sum(v)", "n": "count(*)", "mn": "min(v)", "mx": "max(v)"},
                salt=16,
            ).collect()
        }
        assert salted == plain

    def test_rejects_non_algebraic(self, skewed):
        with pytest.raises(ValueError, match="non-algebraic"):
            salted_agg(skewed, ["k"], {"a": "avg(v)"}).collect()


class TestSaltedJoin:
    def test_matches_plain_join(self, spark, skewed):
        dim = spark.createDataFrame(
            [(0, "hot"), (10, "cold"), (20, "cold")], ["k", "label"]
        )
        plain = (
            skewed.join(dim, ["k"]).groupBy("label").count().collect()
        )
        salted = (
            salted_join(skewed, dim, ["k"], salt=8)
            .groupBy("label")
            .count()
            .collect()
        )
        assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))

    def test_left_join_keeps_unmatched(self, spark, skewed):
        dim = spark.createDataFrame([(0, "hot")], ["k", "label"])
        out = salted_join(skewed, dim, ["k"], how="left", salt=4)
        assert out.count() == skewed.count()
        assert out.filter(F.col("label").isNull()).count() == skewed.filter(
            F.col("k") != 0
        ).count()


class TestBucketing:
    def test_co_located_join_has_no_shuffle(self, spark, sf_dir):
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        # at test scale the planner would broadcast instead (and skip
        # bucketing); force the SMJ path the bucket layout exists for
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            write_bucketed(
                o, "b_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"]
            )
            write_bucketed(
                li.withColumnRenamed("l_orderkey", "o_orderkey"),
                "b_lineitem",
                ["o_orderkey"],
                8,
                sort_by=["o_orderkey"],
            )
            joined = co_located_join(
                spark, "b_orders", "b_lineitem", ["o_orderkey"]
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # and it is still correct
            expected = li.join(
                o, li.l_orderkey == o.o_orderkey
            ).count()
            assert joined.count() == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestBloomPrefilter:
    def test_join_identical_to_plain_join(self, spark, sf_dir):
        from etl_pipelines_spark.operators.bloom import bloom_prefilter_join
        from etl_pipelines_spark.queries import load

        c = (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select(F.col("c_custkey").alias("o_custkey"))
        )
        o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        got = sorted(
            (r["o_orderkey"], r["o_custkey"])
            for r in bloom_prefilter_join(o, c, "o_custkey").collect()
        )
        want = sorted(
            (r["o_orderkey"], r["o_custkey"])
            for r in o.join(c, "o_custkey").collect()
        )
        assert got == want and len(want) > 0

    def test_prefilter_actually_prunes(self, spark, sf_dir):
        """The point of the bitmap is rows dying at the scan: the
        pruned fact must sit between the true-match count and well
        below the full fact (false positives <= ~5% of non-matches
        at the REGISTERED query's 2^17-bit geometry, which keeps
        >=10 bits/key at every test scale factor)."""
        from etl_pipelines_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )
        from etl_pipelines_spark.queries import load

        m_bits = 1 << 17  # the j_bloom_prefilter geometry
        c = (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select(F.col("c_custkey").alias("o_custkey"))
        )
        o = load(spark, sf_dir, "orders").select("o_custkey")
        bitmap = bloom_build(c, "o_custkey", m_bits=m_bits)
        total = o.count()
        kept = o.filter(
            bloom_might_contain(F.col("o_custkey"), bitmap, m_bits=m_bits)
        ).count()
        matches = o.join(c, "o_custkey", "left_semi").count()
        assert matches <= kept  # no false negatives, ever
        non_match = total - matches
        false_pos = kept - matches
        assert false_pos <= max(1, int(0.05 * non_match)), (
            total,
            matches,
            kept,
        )

    def test_lazy_word_table_matches_literal_bitmap(self, spark, sf_dir):
        """bloom_word_table (the lazy DataFrame form the registered
        query uses) must hold exactly the bits bloom_build collects."""
        from etl_pipelines_spark.operators.bloom import (
            bloom_build,
            bloom_word_table,
        )
        from etl_pipelines_spark.queries import load

        c = (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select(F.col("c_custkey").alias("o_custkey"))
        )
        bitmap = bloom_build(c, "o_custkey")
        table = {
            r["w"]: r["mask"]
            for r in bloom_word_table(c, "o_custkey").collect()
        }
        for w, mask in enumerate(bitmap):
            assert table.get(w, 0) == mask, w

    def test_no_false_negatives_exhaustive(self, spark):
        from etl_pipelines_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        dim = spark.range(0, 300).withColumnRenamed("id", "k")
        bitmap = bloom_build(dim, "k")
        kept = (
            spark.range(0, 300)
            .withColumnRenamed("id", "k")
            .filter(bloom_might_contain(F.col("k"), bitmap))
            .count()
        )
        assert kept == 300


class TestCms:
    def test_never_undercounts_any_key(self, spark, sf_dir):
        """est >= exact for EVERY key is the CMS hard invariant
        (collisions only ever add) — asserted corpus-wide, not just
        on the heavy hitters."""
        from etl_pipelines_spark.operators.cms import cms_estimate, cms_table
        from etl_pipelines_spark.queries import load

        e = load(spark, sf_dir, "events").select("user_id")
        grid = cms_table(e, "user_id")
        exact = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        rows = cms_estimate(exact, grid, "user_id").collect()
        assert rows
        assert all(r["cms_estimate"] >= r["n"] for r in rows)

    def test_grid_mass_conservation(self, spark, sf_dir):
        """Each hash row of the grid must hold exactly N total
        counts (every input lands in exactly one cell per row)."""
        from etl_pipelines_spark.operators.cms import DEPTH, cms_table
        from etl_pipelines_spark.queries import load

        e = load(spark, sf_dir, "events").select("user_id")
        n = e.count()
        per_row = {
            r["i"]: r["s"]
            for r in cms_table(e, "user_id")
            .groupBy("i")
            .agg(F.sum("cnt").alias("s"))
            .collect()
        }
        assert per_row == {i: n for i in range(DEPTH)}

    def test_absent_key_estimates_bounded(self, spark):
        """Keys never inserted can still collide, but the estimate
        for them is bounded by the grid's collision mass — and is 0
        when the build set is small relative to the width."""
        from etl_pipelines_spark.operators.cms import cms_estimate, cms_table

        build = spark.range(0, 50).withColumnRenamed("id", "k")
        grid = cms_table(build, "k")
        probes = spark.range(1000, 1100).withColumnRenamed("id", "k")
        rows = cms_estimate(probes, grid, "k").collect()
        # 50 keys in 4x512 cells: an absent key needs a collision in
        # ALL 4 rows to estimate > 0 — p < (50/512)^4 ~ 1e-4 per key
        assert sum(r["cms_estimate"] for r in rows) <= 1
