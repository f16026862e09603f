"""Quality-layer operators: table profiling and drift."""

from __future__ import annotations

from pyspark.sql import functions as F




class TestTableStats:
    def test_exact_profile_with_nulls(self, spark):
        from etl_pipelines_spark.quality import table_stats

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (2, "b"), (4, "b")], ["k", "s"]
        )
        out = {r.column_name: r for r in table_stats(df).collect()}
        assert out["k"].n_rows == 4 and out["k"].n_nulls == 0
        assert out["k"].n_distinct == 3
        assert (out["k"].min_value, out["k"].max_value) == ("1", "4")
        assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
        assert (out["s"].min_value, out["s"].max_value) == ("a", "b")

    def test_exact_histogram_form_matches_single_aggregate(self, spark):
        """r12: the exact path computes per-column profiles from the
        value histogram instead of one multi-distinct Expand
        aggregate. Pin value parity against the straightforward
        single-aggregate spelling, including the empty-input corner
        (n_rows 0, n_nulls NULL — SUM over zero rows — matching the
        SQL oracle)."""
        from etl_pipelines_spark.quality import table_stats

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (2, "b"), (4, "b"), (None, "b")],
            "k int, s string",
        )
        ref = {
            c: df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_value"),
                F.max(F.col(c)).cast("string").alias("max_value"),
            ).collect()[0]
            for c in df.columns
        }
        out = {r.column_name: r for r in table_stats(df).collect()}
        for c in df.columns:
            for f in ("n_rows", "n_nulls", "n_distinct",
                      "min_value", "max_value"):
                assert getattr(out[c], f) == getattr(ref[c], f), (c, f)
        # empty input: SUM-over-nothing semantics must survive
        empty = df.limit(0)
        eout = {r.column_name: r for r in table_stats(empty).collect()}
        for c in df.columns:
            assert eout[c].n_rows == 0
            assert eout[c].n_nulls is None
            assert eout[c].n_distinct == 0
            assert eout[c].min_value is None and eout[c].max_value is None
        # the exact plan must NOT Expand (that was the r12 rewrite's
        # point: no rows x columns intermediate)
        plan = table_stats(df)._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan

    def test_approx_path_single_scan(self, spark):
        from etl_pipelines_spark.quality import table_stats

        df = spark.range(0, 5000).selectExpr(
            "id AS k", "CAST(id % 97 AS STRING) AS s"
        )
        out = {r.column_name: r for r in
               table_stats(df, approx=True).collect()}
        assert abs(out["k"].n_distinct - 5000) / 5000 < 0.05
        assert abs(out["s"].n_distinct - 97) / 97 < 0.05
        # approx plan must not Expand (the exact form's scan blow-up)
        plan = table_stats(df, approx=True)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Expand" not in plan


class TestValueDriftPsi:
    def test_identical_windows_have_near_zero_psi(self, spark):
        from etl_pipelines_spark.quality import value_drift_psi

        rows = [(float(i % 100), i % 2 == 0) for i in range(2000)]
        df = spark.createDataFrame(rows, ["value", "cur"])
        out = value_drift_psi(
            df, "value", F.col("cur"), bucket_width=10.0
        ).collect()
        assert abs(sum(r.psi_term for r in out)) < 1e-6

    def test_shifted_distribution_flags(self, spark):
        """Reference mass in low buckets, current mass in high
        buckets: PSI must be large and the biggest terms must sit in
        the buckets where the mass moved."""
        from etl_pipelines_spark.quality import value_drift_psi

        rows = [(float(i % 30), False) for i in range(1500)]
        rows += [(float(60 + i % 30), True) for i in range(1500)]
        df = spark.createDataFrame(rows, ["value", "cur"])
        out = {r.bucket: r for r in value_drift_psi(
            df, "value", F.col("cur"), bucket_width=10.0
        ).collect()}
        psi = sum(r.psi_term for r in out.values())
        assert psi > 0.5  # way past the 0.2 alert line
        # low buckets: ref-only mass; high buckets: cur-only
        assert out[0].ref_n > 0 and out[0].cur_n == 0
        assert out[6].cur_n > 0 and out[6].ref_n == 0
        assert out[0].psi_term > 0 and out[6].psi_term > 0

    def test_empty_buckets_still_emit_smoothed_terms(self, spark):
        """A bucket with zero rows in BOTH windows still carries a
        nonzero smoothed term whenever the window totals differ
        (p=1/(tr+n) != q=1/(tc+n)); the output is always exactly
        n_buckets rows so the sum over psi_term IS the index."""
        from etl_pipelines_spark.quality import value_drift_psi

        # all mass in bucket 0; 100 ref rows vs 300 cur rows
        rows = [(1.0, False)] * 100 + [(1.0, True)] * 300
        df = spark.createDataFrame(rows, ["value", "cur"])
        out = {r.bucket: r for r in value_drift_psi(
            df, "value", F.col("cur"), bucket_width=10.0
        ).collect()}
        assert sorted(out) == list(range(10))  # full spine
        for b in range(1, 10):
            assert out[b].ref_n == 0 and out[b].cur_n == 0
            assert out[b].psi_term > 0  # 1/110 vs 1/310, p != q

    def test_every_term_nonnegative_in_disjoint_case(self, spark):
        """(p-q)ln(p/q) >= 0 always — same sign factors."""
        from etl_pipelines_spark.quality import value_drift_psi

        import random
        rng = random.Random(7)
        rows = [(rng.uniform(0, 100), rng.random() < 0.5) for _ in range(3000)]
        df = spark.createDataFrame(rows, ["value", "cur"])
        for r in value_drift_psi(df, "value", F.col("cur"), 10.0).collect():
            assert r.psi_term >= 0
