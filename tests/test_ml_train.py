"""Distributed logistic-regression training (ml/train.py).

The trainer's contract: each iteration is one JVM-side aggregation
(the k×dim-moment discipline), only the model reaches the driver, and
the result is the existing LinearModel artifact — so train -> score
composes inside one engine. Float partial sums combine in partition
order, so assertions are convergence properties + layout-insensitivity
at tight tolerance, not bit equality.
"""

from __future__ import annotations

import math

import pytest

from etl_pipelines_spark.ml import (
    LinearModel,
    feature_standardizer,
    logreg_gradient,
    logreg_train_distributed,
    score_expression,
)


def _toy(spark, n=400, parts=8):
    """Deterministic, linearly separable-ish 2-feature frame: label
    is 1 iff 2*x1 - x2 > 0.5 plus a margin band."""
    rows = []
    for i in range(n):
        x1 = math.sin(i * 0.7) * 3.0 + (i % 7) * 0.25
        x2 = math.cos(i * 1.3) * 2.0
        y = 1.0 if 2.0 * x1 - x2 > 0.5 else 0.0
        rows.append((i, x1, x2, y))
    return spark.createDataFrame(
        rows, ["id", "x1", "x2", "y"]
    ).repartition(parts)


class TestGradient:
    def test_gradient_at_zero_matches_closed_form(self, spark):
        """At w=0, b=0: p=0.5 for every row, so dL/dw_i =
        mean((0.5 - y) * x_i) and dL/db = mean(0.5 - y) exactly."""
        df = _toy(spark)
        rows = df.collect()
        n = len(rows)
        want_g1 = sum((0.5 - r.y) * r.x1 for r in rows) / n
        want_g2 = sum((0.5 - r.y) * r.x2 for r in rows) / n
        want_gb = sum(0.5 - r.y for r in rows) / n
        grad, gb, loss, cnt = logreg_gradient(
            df, ["x1", "x2"], "y", [0.0, 0.0], 0.0
        )
        assert cnt == n
        assert abs(grad[0] - want_g1) < 1e-9
        assert abs(grad[1] - want_g2) < 1e-9
        assert abs(gb - want_gb) < 1e-9
        assert abs(loss - math.log(2.0)) < 1e-12  # p=0.5 everywhere

    def test_standardizer_moments(self, spark):
        df = _toy(spark)
        rows = df.collect()
        n = len(rows)
        means, stds = feature_standardizer(df, ["x1", "x2"])
        m1 = sum(r.x1 for r in rows) / n
        v1 = sum((r.x1 - m1) ** 2 for r in rows) / n
        assert abs(means[0] - m1) < 1e-9
        assert abs(stds[0] - math.sqrt(v1)) < 1e-9


class TestTraining:
    def test_loss_decreases_and_separates(self, spark):
        df = _toy(spark)
        model, trace = logreg_train_distributed(
            df, ["x1", "x2"], "y", lr=1.0, iters=40
        )
        assert trace[-1] < trace[0] * 0.5
        # monotone non-increasing within float slack (full-batch GD
        # with standardized features and lr=1 is stable here)
        for a, b in zip(trace, trace[1:]):
            assert b <= a + 1e-9
        scored = df.withColumn("p", score_expression(model)).collect()
        acc = sum(
            1 for r in scored if (r.p >= 0.5) == (r.y >= 0.5)
        ) / len(scored)
        assert acc >= 0.97

    def test_layout_insensitive(self, spark):
        """1-partition vs 8-partition training must agree to ~1e-9
        relative — the distributed aggregation is a true sum."""
        df = _toy(spark)
        m1, _ = logreg_train_distributed(
            df.coalesce(1), ["x1", "x2"], "y", iters=10
        )
        m8, _ = logreg_train_distributed(
            df.repartition(8), ["x1", "x2"], "y", iters=10
        )
        for c in ["x1", "x2"]:
            denom = max(abs(m1.weights[c]), 1.0)
            assert abs(m1.weights[c] - m8.weights[c]) / denom < 1e-9
        assert abs(m1.intercept - m8.intercept) < 1e-9

    def test_l2_shrinks_weights(self, spark):
        df = _toy(spark)
        m0, _ = logreg_train_distributed(df, ["x1", "x2"], "y", iters=30)
        mr, _ = logreg_train_distributed(
            df, ["x1", "x2"], "y", iters=30, l2=0.5
        )
        n0 = sum(v * v for v in m0.weights.values())
        nr = sum(v * v for v in mr.weights.values())
        assert nr < n0

    def test_artifact_roundtrip_scores_raw_features(self, spark):
        """The returned model is over RAW features (standardization
        folded back) and survives the JSON artifact round-trip into
        the registered scoring path."""
        df = _toy(spark)
        model, _ = logreg_train_distributed(df, ["x1", "x2"], "y", iters=20)
        clone = LinearModel.from_json(model.to_json())
        a = df.withColumn("p", score_expression(model)).collect()
        b = df.withColumn("p", score_expression(clone)).collect()
        for ra, rb in zip(a, b):
            assert ra.p == rb.p
        # spot-check against pure-python sigmoid on raw features
        for r in a[:20]:
            z = (
                model.intercept
                + model.weights["x1"] * r.x1
                + model.weights["x2"] * r.x2
            )
            assert abs(r.p - 1.0 / (1.0 + math.exp(-z))) < 1e-12


@pytest.mark.parametrize("standardize", [True, False])
def test_no_python_in_training_plan(spark, standardize):
    """The gradient job must be pure JVM: no BatchEvalPython /
    ArrowEvalPython / mapInPandas nodes in the aggregation plan."""
    df = _toy(spark)
    from pyspark.sql import functions as F

    from etl_pipelines_spark.ml.train import _sigmoid_z

    prob = _sigmoid_z(["x1", "x2"], [0.3, -0.2], 0.1)
    agg = df.agg(F.sum(prob - F.col("y")).alias("g"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "HashAggregate" in plan


class TestQualityClassifierPipeline:
    """End-to-end LLM-data use: corpus -> JVM feature extraction ->
    DISTRIBUTED training -> in-engine scoring. The classifier learns
    to imitate the rule-based quality score from cheap text stats —
    the classic bootstrap for a learned quality filter (rules label,
    model generalizes) — entirely inside Spark."""

    def test_train_quality_classifier_on_documents(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_pipelines_spark.queries import load
        from etl_pipelines_spark.textops.analysis import with_quality_score
        from etl_pipelines_spark.textops.sampling import hash_bucket

        d = with_quality_score(load(spark, sf_dir, "documents"))
        feats = d.select(
            "doc_id",
            F.col("n_tokens").cast("double").alias("f_ntok"),
            F.col("avg_token_len").alias("f_wlen"),
            F.col("punct_ratio").alias("f_punct"),
            F.col("digit_ratio").alias("f_digit"),
            F.col("stopword_ratio").alias("f_stop"),
            (F.col("quality_score") >= 1.0).cast("double").alias("label"),
            hash_bucket(F.col("doc_id")).alias("__b"),
        ).cache()
        train = feats.filter(F.col("__b") < 80)
        test = feats.filter(F.col("__b") >= 80)
        fcols = ["f_ntok", "f_wlen", "f_punct", "f_digit", "f_stop"]
        # both classes must exist or the exercise is vacuous
        classes = {r.label for r in train.select("label").distinct().collect()}
        assert classes == {0.0, 1.0}

        model, trace = logreg_train_distributed(
            train, fcols, "label", lr=1.0, iters=60
        )
        assert trace[-1] < trace[0]
        scored = test.withColumn("p", score_expression(model)).collect()
        acc = sum(
            1 for r in scored if (r.p >= 0.5) == (r.label >= 0.5)
        ) / len(scored)
        # the strict-quality boundary is learnable from the stats
        # (the stopword-mass rule dominates); held-out accuracy must
        # be near-perfect, not merely majority-class
        assert acc >= 0.95, acc
        train_scored = train.withColumn("p", score_expression(model)).collect()
        train_acc = sum(
            1 for r in train_scored if (r.p >= 0.5) == (r.label >= 0.5)
        ) / len(train_scored)
        assert train_acc >= 0.98, train_acc
