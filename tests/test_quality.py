

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
