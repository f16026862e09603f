"""Margin-based bitext mining (similarity.bitext_mine_forward)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.textops import bitext_mine_forward


def _frame(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )


class TestBitextMine:
    def test_translation_accepted_hub_rejected(self, spark):
        """Query 0 has one standout neighbor (a 'translation');
        query 10 sits near a hub cluster where top1 barely beats the
        rest — margin must separate the two."""
        d = 8
        e1 = [1.0] + [0.0] * (d - 1)
        hub = [0.0, 1.0, 1.0, 1.0] + [0.0] * (d - 4)
        queries = _frame(spark, [(0, e1), (10, hub)]).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        corpus = _frame(spark, [
            (1, [0.99, 0.1] + [0.0] * (d - 2)),   # 0's translation
            # a near-tied cluster around the hub direction: top1
            # beats the rest by well under the 1.05 margin
            (3, [0.0, 1.0, 0.9, 0.9] + [0.0] * (d - 4)),
            (5, [0.0, 0.9, 1.0, 0.9] + [0.0] * (d - 4)),
            (7, [0.0, 0.9, 0.9, 1.0] + [0.0] * (d - 4)),
            (9, [0.0, 0.92, 0.95, 0.9] + [0.0] * (d - 4)),
        ])
        out = {r.query_id: r for r in
               bitext_mine_forward(corpus, queries, k=4).collect()}
        assert out[0].best_id == 1
        # query 0's remaining neighbors are orthogonal (rest sum 0):
        # margin is NULL by contract, accept decided by the decimal
        # rule (infinitely better than nothing)
        assert out[0].accepted is True and out[0].margin is None
        assert out[10].best_id == 9  # dead-center of the hub cluster
        assert out[10].accepted is False  # others are nearly as close
        assert out[10].margin < 1.05

    def test_margin_matches_numpy(self, spark):
        rng = np.random.RandomState(4)
        qv = rng.randn(6, 8)
        cv = rng.randn(20, 8)
        queries = _frame(spark, [(i, v) for i, v in enumerate(qv)]).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        corpus = _frame(spark, [(100 + i, v) for i, v in enumerate(cv)])
        out = {r.query_id: r for r in
               bitext_mine_forward(corpus, queries, k=4).collect()}
        qn = qv / np.linalg.norm(qv, axis=1, keepdims=True)
        cn = cv / np.linalg.norm(cv, axis=1, keepdims=True)
        sims = qn @ cn.T
        for i in range(6):
            order = np.argsort(-sims[i], kind="stable")
            top = np.round(sims[i][order[:4]], 6)
            want_margin = round(top[0] * 3 / top[1:].sum(), 6)
            assert out[i].best_id == 100 + order[0]
            assert abs(out[i].margin - want_margin) < 2e-6
            assert out[i].accepted == bool(
                round(top[0] * 3, 6) >= round(1.05 * top[1:].sum(), 6)
            ) or abs(top[0] * 3 - 1.05 * top[1:].sum()) < 1e-5
