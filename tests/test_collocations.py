"""Collocation mining (textops/analysis.collocations_topk) — the
log-free PMI ranking: closed-form lift on a hand-built corpus, the
monotone-with-PMI property, and the top-k plan discipline (no
single-reducer sort, no Python nodes)."""

from __future__ import annotations

import math

from etl_pipelines_spark.textops import collocations_topk


def _corpus(spark):
    """'data pipeline' always adjacent (strong collocation); 'the'
    everywhere (high count, low lift); 'rare gem' appears 3x."""
    docs = (
        ["data pipeline runs the job"] * 6
        + ["the data pipeline is the thing"] * 4
        + ["rare gem rare gem rare gem"]
        + ["the the the job runs"] * 3
    )
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )


class TestCollocations:
    def test_closed_form_lift(self, spark):
        out = {
            r.bigram: r
            for r in collocations_topk(_corpus(spark), min_count=3).collect()
        }
        # hand counts: N tokens, c(data pipeline)=10, c(data)=10,
        # c(pipeline)=10
        n_tokens = sum(
            len(t.split())
            for t in [r.text for r in _corpus(spark).collect()]
        )
        r = out["data pipeline"]
        assert (r.n_xy, r.n_w1, r.n_w2) == (10, 10, 10)
        assert r.lift_bp == (n_tokens * 10 * 10000) // (10 * 10)
        # every returned score is exactly the integer formula
        for r in out.values():
            assert r.lift_bp == (n_tokens * r.n_xy * 10000) // (
                r.n_w1 * r.n_w2
            )

    def test_ranking_is_monotone_with_pmi(self, spark):
        rows = collocations_topk(_corpus(spark), min_count=3).collect()
        n_tokens = sum(
            len(t.split())
            for t in [r.text for r in _corpus(spark).collect()]
        )
        pmis = [
            math.log(n_tokens * r.n_xy / (r.n_w1 * r.n_w2))
            for r in sorted(rows, key=lambda r: r.rank)
        ]
        # integer basis points can tie where PMI is within 1e-4;
        # outside ties, rank order must follow PMI descending
        for a, b in zip(pmis, pmis[1:]):
            assert b <= a + 1e-4

    def test_rare_strong_pair_outranks_frequent_weak_pair(self, spark):
        rows = {r.bigram: r.rank for r in
                collocations_topk(_corpus(spark), min_count=3).collect()}
        assert rows["rare gem"] < rows["the the"]

    def test_plan_no_global_sort_no_python(self, spark, sf_dir):
        import re

        from etl_pipelines_spark.queries import REGISTRY

        df = REGISTRY["txt_collocations"].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        nodes = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
        assert "TakeOrderedAndProject" in nodes, plan
        for n in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert n not in nodes, n
        # the only SinglePartition exchange allowed is the 1-row
        # token-total broadcast / the post-LIMIT head
        for m in re.finditer(
            r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: "
            r"SinglePartition",
            plan,
        ):
            cols = m.group(1).lower()
            assert "bigram" not in cols or "rank" in cols, m.group(0)
