from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipelines_spark.ml import (
    LinearModel,
    load_model,
    one_hot,
    score_expression,
    score_with_pandas,
)

MODEL = LinearModel(
    intercept=-0.5,
    weights={"n_orders": 0.03, "spend_scaled": 0.8},
    categorical={"c_mktsegment": {"BUILDING": 0.2, "MACHINERY": -0.1}},
)


def _features(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (F.coalesce(F.sum("o_totalprice"), F.lit(0.0)) / 1e5)
            .alias("spend_scaled"),
        )
    )


class TestArtifact:
    def test_json_roundtrip(self, tmp_path):
        p = tmp_path / "model.json"
        p.write_text(MODEL.to_json())
        m = load_model(str(p))
        assert m == MODEL

    def test_one_hot(self, spark):
        df = spark.createDataFrame(
            [("BUILDING",), ("AUTOMOBILE",), (None,)], ["c_mktsegment"]
        )
        out = df.select(*one_hot("c_mktsegment", ["BUILDING", "MACHINERY"]))
        vals = [tuple(r) for r in out.collect()]
        assert vals == [(1.0, 0.0), (0.0, 0.0), (0.0, 0.0)]


class TestScoring:
    def test_expression_vs_pandas_agree(self, spark, sf_dir):
        feat = _features(spark, sf_dir)
        via_expr = feat.select(
            "c_custkey", score_expression(MODEL).alias("score")
        )
        via_pandas = score_with_pandas(feat, MODEL, id_cols=["c_custkey"])
        joined = via_expr.alias("a").join(
            via_pandas.alias("b"), "c_custkey"
        ).select(
            (F.abs(F.col("a.score") - F.col("b.score")) < 1e-12).alias("ok")
        )
        assert joined.filter(~F.col("ok")).count() == 0
        assert via_pandas.count() == feat.count()

    def test_scores_are_probabilities(self, spark, sf_dir):
        feat = _features(spark, sf_dir)
        s = feat.select(score_expression(MODEL).alias("p"))
        assert s.filter((F.col("p") < 0) | (F.col("p") > 1)).count() == 0

    def test_null_features_score_as_zero_contribution(self, spark):
        df = spark.createDataFrame(
            [(1, None, None, None)],
            "c_custkey int, n_orders int, spend_scaled double, c_mktsegment string",
        )
        got = df.select(score_expression(MODEL).alias("p")).first().p
        import math

        assert abs(got - 1 / (1 + math.exp(0.5))) < 1e-12


class TestTreeEnsemble:
    """GBT-shaped artifact through the same plumbing (ml/trees.py)."""

    def _feat_pdf(self, spark, sf_dir):
        from etl_pipelines_spark.queries import load

        p = load(spark, sf_dir, "part")
        li = load(spark, sf_dir, "lineitem")
        return (
            p.join(li, li.l_partkey == p.p_partkey, "left")
            .groupBy("p_partkey", "p_size", "p_retailprice")
            .agg(
                F.coalesce(F.sum("l_quantity"), F.lit(0.0))
                .cast("double")
                .alias("qty_sum"),
                F.count("l_orderkey").cast("double").alias("line_cnt"),
            )
            .select(
                "p_partkey",
                F.col("p_size").cast("double").alias("p_size"),
                "p_retailprice",
                "qty_sum",
                "line_cnt",
            )
        )

    def test_roundtrip_artifact(self, tmp_path):
        from etl_pipelines_spark.ml import (
            TreeEnsemble,
            load_tree_model,
            make_demo_pricing_model,
        )

        m = make_demo_pricing_model()
        path = tmp_path / "model.json"
        path.write_text(m.to_json())
        m2 = load_tree_model(str(path))
        assert m2 == m
        assert m2 == TreeEnsemble.from_json(m.to_json())

    def test_mapinpandas_matches_scalar_reference(self, spark, sf_dir):
        """Vectorized mask-descent scoring must agree bit-for-bit
        with a row-at-a-time recursive descent on the driver."""
        from etl_pipelines_spark.ml import (
            make_demo_pricing_model,
            score_trees_pandas,
            score_trees_reference,
        )

        model = make_demo_pricing_model()
        feat = self._feat_pdf(spark, sf_dir)
        got = {
            r.p_partkey: r.score
            for r in score_trees_pandas(
                feat, model, id_cols=["p_partkey"], score_col="score"
            ).collect()
        }
        pdf = feat.toPandas().sort_values("p_partkey").reset_index(drop=True)
        want = score_trees_reference(pdf, model)
        assert len(got) == len(pdf)
        for i, pk in enumerate(pdf["p_partkey"]):
            assert got[pk] == want[i]  # bit-identical

    def test_trees_actually_branch(self, spark, sf_dir):
        """The demo ensemble must produce a non-degenerate score
        distribution (more than one distinct leaf path taken)."""
        from etl_pipelines_spark.ml import make_demo_pricing_model, score_trees_pandas

        model = make_demo_pricing_model()
        feat = self._feat_pdf(spark, sf_dir)
        n = (
            score_trees_pandas(feat, model, id_cols=["p_partkey"], score_col="s")
            .select("s")
            .distinct()
            .count()
        )
        assert n > 10


class TestMlp:
    """Matmul-MLP artifact (ml/mlp.py) — the neural shape."""

    def _feat(self, spark, sf_dir):
        from pyspark.sql import functions as F

        e = spark.read.parquet(f"{sf_dir}/events.parquet")
        return e.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("double").alias("n_purchases"),
            F.count(F.when(F.col("event_type") == "view", 1))
            .cast("double").alias("n_views"),
            F.countDistinct(F.to_date("ts")).cast("double").alias("active_days"),
        )

    def test_roundtrip_artifact(self):
        from etl_pipelines_spark.ml import MLPModel, make_demo_mlp

        m = make_demo_mlp(["a", "b"], hidden=3, seed=5)
        assert MLPModel.from_json(m.to_json()) == m

    def test_mapinpandas_matches_scalar_reference(self, spark, sf_dir):
        """Vectorized fold-order scoring must agree bit-for-bit with
        the pure-python scalar evaluation."""
        from etl_pipelines_spark.ml import (
            make_demo_mlp,
            score_mlp_pandas,
            score_mlp_reference,
        )

        feats = ["n_events", "n_purchases", "n_views", "active_days"]
        model = make_demo_mlp(feats, hidden=6, seed=11)
        feat = self._feat(spark, sf_dir)
        got = {
            r.user_id: r.score
            for r in score_mlp_pandas(
                feat, model, id_cols=["user_id"], score_col="score"
            ).collect()
        }
        rows = [r.asDict() for r in feat.collect()]
        want = score_mlp_reference(model, rows)
        assert len(got) == len(rows)
        for r, w in zip(rows, want):
            assert got[r["user_id"]] == w  # bit-identical

    def test_relu_actually_fires(self, spark, sf_dir):
        """Non-degenerate: some hidden units must be clipped for some
        rows and active for others (otherwise the net is affine and
        the test proves nothing beyond the linear path)."""
        import numpy as np

        from etl_pipelines_spark.ml import make_demo_mlp

        feats = ["n_events", "n_purchases", "n_views", "active_days"]
        model = make_demo_mlp(feats, hidden=6, seed=11)
        X = np.array(
            [[r.n_events, r.n_purchases, r.n_views, r.active_days]
             for r in self._feat(spark, sf_dir).collect()]
        )
        Z = X @ np.array(model.w1) + np.array(model.b1)
        clipped = (Z < 0).any(axis=0)
        active = (Z > 0).any(axis=0)
        assert (clipped & active).any()
