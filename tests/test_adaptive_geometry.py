"""Adaptive candidate-bucket geometry (round 4).

The r3 scale-slope run measured the two embedding-dedup paths
super-linear at 10x data (lsh_neardup_pairs x11.5, semantic_dedup
x8.2): with FIXED bucket geometry, 10x corpus means 10x bucket
occupancy and ~100x candidate pairs. The fix is the occupancy
ladder — signature bit-count grows with corpus size so expected
occupancy stays constant — implemented once
(similarity.occupancy_mask_cases) and rendered into both engines.

These tests pin:
- Spark CASE and DuckDB CASE render the IDENTICAL mask for any n
  (the cross-engine exactness precondition);
- at the small-n floor the adaptive forms emit exactly the fixed
  forms' output (the correctness-gate invariant);
- adaptive outputs remain subsets of the lossless all-pairs verifier
  with bit-identical cosines;
- the ladder actually caps occupancy: on a 10x-replicated frame the
  candidate-pair count grows sub-quadratically.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.queries import load
from etl_pipelines_spark.textops.similarity import (
    all_pairs_cosine,
    lsh_neardup_pairs,
    occupancy_mask_cases,
    occupancy_mask_col,
    occupancy_mask_sql,
    semantic_dedup_pairs,
)


class TestMaskLadder:
    def test_spark_and_duckdb_masks_agree_for_all_n(self, spark):
        """Sweep n across every ladder boundary (±1) plus far points;
        the Spark CASE column and the DuckDB CASE must agree."""
        params = dict(base_buckets=1, target_occ=16, r_min=6, r_max=14)
        cases = occupancy_mask_cases(**params)
        ns = sorted(
            {1, 5, 10**9}
            | {t for t, _ in cases}
            | {t + 1 for t, _ in cases}
            | {t - 1 for t, _ in cases}
        )
        df = spark.createDataFrame([(n,) for n in ns], ["n"])
        got = {
            r.n: r.m
            for r in df.select(
                "n", occupancy_mask_col(F.col("n"), **params).alias("m")
            ).collect()
        }
        sql = occupancy_mask_sql("n", **params)
        for n in ns:
            want = duckdb.sql(
                f"SELECT {sql} AS m FROM (SELECT {n}::BIGINT AS n)"
            ).fetchone()[0]
            assert got[n] == want, n

    def test_ladder_is_monotone_and_floor_capped(self):
        cases = occupancy_mask_cases(
            base_buckets=16, target_occ=32, r_min=0, r_max=10
        )
        assert cases[0] == (32 * 16, 0)  # floor: mask 0 = pure clusters
        thresholds = [t for t, _ in cases]
        masks = [m for _, m in cases]
        assert thresholds == sorted(thresholds)
        assert masks == sorted(masks)
        assert masks[-1] == (1 << 10) - 1


class TestAdaptiveLsh:
    def test_floor_output_equals_fixed_geometry(self, spark, sf_dir):
        """At n below the first ladder threshold the mask equals the
        fixed 6-bit mask, so the adaptive form must emit the exact
        same pair set — the invariant that keeps the correctness-gate
        output unchanged across the r4 rewrite."""
        e = load(spark, sf_dir, "embeddings")
        assert e.count() <= 16 * (1 << 6)
        fixed = {
            (r.id_a, r.id_b): r.cosine
            for r in lsh_neardup_pairs(e, threshold=0.4, dim=64).collect()
        }
        auto = {
            (r.id_a, r.id_b): r.cosine
            for r in lsh_neardup_pairs(
                e, threshold=0.4, dim=64, auto_planes=True
            ).collect()
        }
        assert fixed == auto

    def test_adaptive_pairs_subset_of_all_pairs(self, spark, sf_dir):
        e = load(spark, sf_dir, "embeddings")
        exact = {
            (r.id_a, r.id_b): r.cosine
            for r in all_pairs_cosine(e, threshold=0.4, dim=64).collect()
        }
        got = lsh_neardup_pairs(
            e, threshold=0.4, dim=64, auto_planes=True
        ).collect()
        assert got
        for r in got:
            assert exact[(r.id_a, r.id_b)] == r.cosine  # bit-identical

    def test_occupancy_stays_capped_on_replicated_corpus(self, spark, sf_dir):
        """Replicate the corpus 8x with rolled vectors (new ids, no
        fake twins). The fixed geometry's candidate count grows
        ~quadratically; the ladder must hold the adaptive form's
        growth under 3x-linear."""
        e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        n = e.count()
        reps = [
            e.select(
                (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                F.concat(
                    F.slice("embedding", k + 1, 64 - k),
                    F.slice("embedding", 1, k),
                ).alias("embedding"),
            )
            for k in range(8)
        ]
        big = reps[0]
        for r in reps[1:]:
            big = big.unionAll(r)

        def cand_pairs(df, auto):
            return lsh_neardup_pairs(
                df, threshold=-1.0, dim=64, auto_planes=auto
            ).count()  # threshold -1 => count ALL candidate pairs

        small_auto = cand_pairs(e, True)
        big_auto = cand_pairs(big, True)
        big_fixed = cand_pairs(big, False)
        assert big_fixed > 8 * 3 * max(small_auto, 1)
        assert big_auto <= 8 * 3 * max(small_auto, 1)


class TestAdaptiveSemanticDedup:
    def test_floor_output_equals_pure_clusters(self, spark, sf_dir):
        e = load(spark, sf_dir, "embeddings")
        assert e.count() <= 32 * 16  # below the first refinement rung
        pure = {
            (r.id_a, r.id_b): (r.list_id, r.cosine)
            for r in semantic_dedup_pairs(e, threshold=0.4).collect()
        }
        auto = {
            (r.id_a, r.id_b): (r.list_id, r.cosine)
            for r in semantic_dedup_pairs(
                e, threshold=0.4, auto_refine=True
            ).collect()
        }
        assert pure == auto

    def test_refined_pairs_subset_of_pure_within_cluster_pairs(
        self, spark, sf_dir
    ):
        """Force refinement by dropping the ladder floor: every
        refined pair must still be a within-cluster pair with the
        identical cosine (refinement only SPLITS clusters)."""
        e = load(spark, sf_dir, "embeddings")
        pure = {
            (r.id_a, r.id_b): (r.list_id, r.cosine)
            for r in semantic_dedup_pairs(e, threshold=0.4).collect()
        }
        refined = semantic_dedup_pairs(
            e, threshold=0.4, auto_refine=True, target_occ=1
        ).collect()
        assert len(refined) < len(pure)  # sub-buckets really split
        for r in refined:
            assert pure[(r.id_a, r.id_b)] == (r.list_id, r.cosine)


@pytest.mark.parametrize("name", ["dd_embedding_neardup", "dd_semantic_dedup"])
def test_registered_query_matches_duckdb_oracle(spark, sf_dir, name):
    """End-to-end: the rewired adaptive queries still hash-match
    their (now adaptive) DuckDB oracles at the test SF — the same
    comparison the driver runs."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
    )
    import pandas.testing as pdt
    from canon import pandas_canon

    from etl_pipelines_spark.queries import REGISTRY

    entry = REGISTRY[name]
    got = pandas_canon(entry.spark(spark, sf_dir).toPandas())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = pandas_canon(con.sql(entry.oracle).df())
    pdt.assert_frame_equal(got, want, check_dtype=False)
