"""Property-based checks (hypothesis) for the riskiest compat-layer
semantics (SURVEY.md §7 hard parts 1-3) and writer idempotence.

Examples are batched: each property materializes ONE DataFrame per
example set, so Spark round-trips stay bounded.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipelines_spark import functions as RF

FAST = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

dates = st.dates(dt.date(1990, 1, 1), dt.date(2030, 12, 28))


class TestDatediffBoundarySemantics:
    """Redshift DATEDIFF counts unit *boundaries crossed* — the
    reference's trickiest divergence (SURVEY §2.9)."""

    @FAST
    @given(st.lists(st.tuples(dates, dates), min_size=1, max_size=25))
    def test_month_boundaries(self, spark, pairs):
        df = spark.createDataFrame(
            [(a.isoformat(), b.isoformat()) for a, b in pairs], ["a", "b"]
        ).select(F.to_date("a").alias("a"), F.to_date("b").alias("b"))
        got = [
            r.d for r in df.select(
                RF.datediff("month", "a", "b").alias("d")
            ).collect()
        ]
        expected = [
            (b.year - a.year) * 12 + (b.month - a.month) for a, b in pairs
        ]
        assert got == expected

    @FAST
    @given(st.lists(st.tuples(dates, dates), min_size=1, max_size=25))
    def test_week_boundaries_monday(self, spark, pairs):
        # weeks crossed = difference of ISO-Monday week indices
        df = spark.createDataFrame(
            [(a.isoformat(), b.isoformat()) for a, b in pairs], ["a", "b"]
        ).select(F.to_date("a").alias("a"), F.to_date("b").alias("b"))
        got = [
            r.d for r in df.select(
                RF.datediff("week", "a", "b").alias("d")
            ).collect()
        ]
        expected = [
            (b - dt.timedelta(days=b.weekday())).toordinal() // 7
            - (a - dt.timedelta(days=a.weekday())).toordinal() // 7
            for a, b in pairs
        ]
        assert got == expected

    @FAST
    @given(st.lists(st.tuples(dates, dates), min_size=1, max_size=25))
    def test_day_is_plain_difference(self, spark, pairs):
        df = spark.createDataFrame(
            [(a.isoformat(), b.isoformat()) for a, b in pairs], ["a", "b"]
        ).select(F.to_date("a").alias("a"), F.to_date("b").alias("b"))
        got = [
            r.d for r in df.select(
                RF.datediff("day", "a", "b").alias("d")
            ).collect()
        ]
        assert got == [(b - a).days for a, b in pairs]


class TestListaggDeterminism:
    @FAST
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 3),
                st.integers(-1000, 1000),
                st.text(
                    alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
                    min_size=0,
                    max_size=6,
                ),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def test_matches_python_sort(self, spark, rows):
        """LISTAGG WITHIN GROUP (ORDER BY k, v): equals a python
        groupby + lexicographic (k, v) sort, NULL-free join."""
        df = spark.createDataFrame(rows, ["g", "k", "v"])
        got = {
            r.g: r.s
            for r in df.groupBy("g")
            .agg(RF.listagg("v", ",", order_by=["k", "v"]).alias("s"))
            .collect()
        }
        expected: dict[int, list[tuple[int, str]]] = {}
        for g, k, v in rows:
            expected.setdefault(g, []).append((k, v))
        for g, pairs in expected.items():
            assert got[g] == ",".join(v for _, v in sorted(pairs))

    @FAST
    @given(st.lists(st.integers(-50, 50), min_size=1, max_size=30))
    def test_unordered_form_sorts_by_value(self, spark, vals):
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        got = df.agg(RF.listagg("v", "|").alias("s")).first().s
        assert got == "|".join(sorted(str(v) for v in vals))


class TestUpsertProperties:
    @FAST
    @given(
        st.lists(
            st.tuples(st.integers(0, 20), st.integers(0, 100)),
            min_size=1,
            max_size=30,
        ),
        st.lists(
            st.tuples(st.integers(0, 20), st.integers(0, 100)),
            min_size=1,
            max_size=30,
        ),
    )
    def test_upsert_last_write_wins_and_idempotent(
        self, spark, tmp_path_factory, base, incoming
    ):
        from etl_pipelines_spark.sources.writers import full_refresh, upsert

        path = str(tmp_path_factory.mktemp("upsert") / "t")
        base_dedup = {k: v for k, v in base}
        inc_dedup = {k: v for k, v in incoming}
        full_refresh(
            spark.createDataFrame(list(base_dedup.items()), ["k", "v"]), path
        )
        inc_df = spark.createDataFrame(list(inc_dedup.items()), ["k", "v"])
        upsert(spark, inc_df, path, keys=["k"])
        upsert(spark, inc_df, path, keys=["k"])  # replay
        got = {r.k: r.v for r in spark.read.parquet(path).collect()}
        assert got == {**base_dedup, **inc_dedup}


class TestComponentsProperty:
    @given(
        st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=15, deadline=None)
    def test_matches_reference_union_find(self, spark, edges):
        """Random graphs: component labeling must equal a trivial
        reference union-find, on BOTH execution paths."""
        from etl_pipelines_spark.textops import neardup_components

        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        # reference: naive python union-find
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        expected = {x: find(x) for x in parent}

        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        for kwargs in ({}, {"driver_max_edges": 0}):
            got = {
                r.doc_id: r.component_id
                for r in neardup_components(pairs, **kwargs).collect()
            }
            assert got == expected


class TestScd2Property:
    """Random snapshot sequences: the SCD2 history must answer every
    as-of question exactly as the full-snapshot method would."""

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.dictionaries(
            st.integers(1, 6),                       # key universe
            st.sampled_from(["a", "b", "c", None]),  # attr incl NULL
            min_size=1, max_size=6,
        ),
        min_size=1, max_size=5,
    ))
    def test_as_of_equals_snapshot(self, spark, snapshots):
        import datetime as _dt

        from etl_pipelines_spark.operators import as_of, scd2_merge

        hist = None
        run_days = []
        carried: dict[int, str | None] = {}
        expected_by_day = []
        for i, snap in enumerate(snapshots):
            day = _dt.date(2024, 1, 1) + _dt.timedelta(days=i * 7)
            run_days.append(day)
            # carry-forward semantics: keys absent from a snapshot
            # keep their previous value
            carried.update(snap)
            expected_by_day.append(dict(carried))
            inc = spark.createDataFrame(
                [(k, v) for k, v in snap.items()],
                "cust_id int, tier string",
            )
            hist = scd2_merge(hist, inc, ["cust_id"], ["tier"], day)

        for day, want in zip(run_days, expected_by_day):
            got = {
                r.cust_id: r.tier
                for r in as_of(hist, day + _dt.timedelta(days=3)).collect()
            }
            assert got == want
        # interval sanity: one open row per live key; no overlaps
        rows = hist.collect()
        open_per_key: dict[int, int] = {}
        for r in rows:
            if r.valid_to is None:
                open_per_key[r.cust_id] = open_per_key.get(r.cust_id, 0) + 1
            else:
                assert r.valid_from < r.valid_to or r.valid_from == r.valid_to
        assert all(v == 1 for v in open_per_key.values())


class TestSketchProperties:
    """The sketch family's hard invariants under arbitrary inputs:
    CMS never undercounts, Bloom never false-negatives, HLL is
    duplication-blind. Each example batches one DataFrame."""

    @FAST
    @given(
        st.lists(
            st.integers(min_value=-(10**9), max_value=10**9),
            min_size=1,
            max_size=120,
        )
    )
    def test_cms_never_undercounts(self, spark, keys):
        from collections import Counter

        from etl_pipelines_spark.operators.cms import cms_estimate, cms_table

        df = spark.createDataFrame([(k,) for k in keys], ["k"])
        grid = cms_table(df, "k")
        probes = spark.createDataFrame(
            [(k,) for k in set(keys)], ["k"]
        )
        true = Counter(keys)
        for r in cms_estimate(probes, grid, "k").collect():
            assert r["cms_estimate"] >= true[r["k"]], (r, true[r["k"]])

    @FAST
    @given(
        st.lists(
            st.integers(min_value=-(10**9), max_value=10**9),
            min_size=1,
            max_size=120,
            unique=True,
        )
    )
    def test_bloom_never_false_negative(self, spark, keys):
        from etl_pipelines_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        df = spark.createDataFrame([(k,) for k in keys], ["k"])
        bitmap = bloom_build(df, "k")
        kept = df.filter(bloom_might_contain(F.col("k"), bitmap)).count()
        assert kept == len(keys)

    @FAST
    @given(
        st.lists(
            st.integers(min_value=0, max_value=10**6),
            min_size=1,
            max_size=120,
        ),
        st.integers(min_value=2, max_value=4),
    )
    def test_hll_blind_to_duplication(self, spark, keys, times):
        from etl_pipelines_spark.operators import hll_distinct

        df = spark.createDataFrame([(k,) for k in keys], ["k"])
        rep = df
        for _ in range(times - 1):
            rep = rep.unionAll(df)
        one = hll_distinct(df.withColumn("g", F.lit(1)), ["g"], "k").collect()
        many = hll_distinct(rep.withColumn("g", F.lit(1)), ["g"], "k").collect()
        assert one[0]["hll_estimate"] == many[0]["hll_estimate"]


class TestPqProperties:
    """PQ edge properties (r3 VERDICT "Next round" #8): the encoder
    and the ADC scorer must agree bit-for-bit on their shared math,
    and encoding must be a pure per-row function of the vector."""

    DIM, M, KSUB = 8, 4, 4

    def _frames(self, spark, vecs):
        from etl_pipelines_spark.textops.pq import pq_codebooks

        cb = pq_codebooks(dim=self.DIM, m=self.M, ksub=self.KSUB, seed=5)
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        corpus = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        return cb, corpus

    @FAST
    @given(
        st.lists(
            st.lists(
                st.floats(-4, 4, allow_nan=False, allow_infinity=False),
                min_size=8,
                max_size=8,
            ),
            min_size=1,
            max_size=10,
        )
    )
    def test_adc_self_distance_equals_recon_err(self, spark, vecs):
        """ADC(q, codes(v)) with q == v IS the reconstruction error:
        both sides accumulate the same per-subspace squared
        distances in the same left-to-right fold, so equality is
        exact in float64 — any drift means the LUT and the encoder
        disagree about the math they supposedly share."""
        from etl_pipelines_spark.textops.pq import (
            pq_adc_topk,
            pq_encode_exact,
        )

        cb, corpus = self._frames(spark, vecs)
        queries = corpus.selectExpr(
            "vec_id as query_id", "embedding"
        )
        err = {
            r.vec_id: r.recon_err
            for r in pq_encode_exact(corpus, cb).collect()
        }
        topk = pq_adc_topk(corpus, queries, cb, k=len(vecs)).collect()
        self_rows = [r for r in topk if r.query_id == r.vec_id]
        assert len(self_rows) == len(vecs)
        for r in self_rows:
            assert r.adist == err[r.query_id], (r, err[r.query_id])

    @FAST
    @given(
        st.lists(
            st.lists(
                st.floats(-4, 4, allow_nan=False, allow_infinity=False),
                min_size=8,
                max_size=8,
            ),
            min_size=2,
            max_size=10,
        )
    )
    def test_codes_invariant_to_partitioning(self, spark, vecs):
        """argmin stability: the code assignment is a pure function
        of the vector — repartitioning (different Arrow batch
        boundaries, different row order) must yield identical codes
        and errors."""
        from etl_pipelines_spark.textops.pq import pq_encode_exact

        cb, corpus = self._frames(spark, vecs)
        a = {
            r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3, r.recon_err)
            for r in pq_encode_exact(corpus.repartition(1), cb).collect()
        }
        b = {
            r.vec_id: (r.code_0, r.code_1, r.code_2, r.code_3, r.recon_err)
            for r in pq_encode_exact(corpus.repartition(7), cb).collect()
        }
        assert a == b


class TestBpeProperties:
    """BPE encoder properties: the codegen string-replace corpus
    encoder implements exactly the greedy adjacent-merge semantics
    of the per-word reference encoder, on arbitrary text."""

    corpus_text = st.text(
        alphabet="theandigorTHE !.,0123 ", min_size=0, max_size=80
    )

    @staticmethod
    def _ref_token_count(text: str, merges) -> int:
        import re

        s = re.sub(r" +", " ", re.sub(r"[^a-z ]", "", text.lower())).strip()
        if not s:
            return 0
        total = 0
        for w in s.split(" "):
            syms = list(w) + ["#"]
            for a, b in merges:
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            total += len(syms)
        return total

    @FAST
    @given(st.lists(corpus_text, min_size=1, max_size=8))
    def test_corpus_encoder_matches_reference(self, spark, texts):
        from etl_pipelines_spark.textops.bpe import (
            FIXED_MERGES,
            bpe_corpus_token_stats,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r.doc_id: r.n_tokens
            for r in bpe_corpus_token_stats(df, FIXED_MERGES).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == self._ref_token_count(t, FIXED_MERGES), t

    @FAST
    @given(st.lists(corpus_text, min_size=1, max_size=6))
    def test_token_count_monotone_in_merges(self, spark, texts):
        """Applying one more merge rule can only merge pairs — the
        corpus token count is non-increasing along the merge-table
        prefix chain (token-count conservation: each applied merge
        removes exactly one token per merged occurrence)."""
        from etl_pipelines_spark.textops.bpe import (
            FIXED_MERGES,
            bpe_corpus_token_stats,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        prev = None
        for k in (0, 2, 6, len(FIXED_MERGES)):
            total = (
                bpe_corpus_token_stats(df, FIXED_MERGES[:k])
                .agg(F.sum("n_tokens").alias("t"))
                .collect()[0]["t"]
            )
            if prev is not None:
                assert total <= prev, (k, total, prev)
            prev = total


class TestCodecProperties:
    """Pure-python codec laws (no Spark session needed): GIF LZW is
    lossless for any <=256-color image; JPEG with flat-8 quantization
    is exact on per-block-flat images and its error is bounded on
    arbitrary ones."""

    @given(
        st.integers(1, 24), st.integers(1, 24),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_gif_roundtrip_identity(self, h, w, seed):
        import numpy as np

        from etl_pipelines_spark.multimodal.binary import _gif_codec

        rng = np.random.RandomState(seed)
        arr = (rng.randint(0, 6, (h, w, 3)) * 51).astype(np.uint8)
        encode, decode = _gif_codec()
        assert (decode(encode(arr)) == arr).all()

    @given(
        st.integers(1, 4), st.integers(1, 4),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_jpeg_blockflat_exact(self, bh, bw, seed):
        import numpy as np

        from etl_pipelines_spark.multimodal.jpeg import _jpeg_codec

        rng = np.random.RandomState(seed)
        tiles = rng.randint(0, 256, (bh, bw)).astype(np.uint8)
        arr = np.kron(tiles, np.ones((8, 8), np.uint8))
        encode, decode = _jpeg_codec()
        assert (decode(encode(arr))[:, :, 0] == arr).all()

    @given(
        st.integers(1, 40), st.integers(1, 40),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=20, deadline=None)
    def test_jpeg_error_bounded(self, h, w, seed):
        import numpy as np

        from etl_pipelines_spark.multimodal.jpeg import _jpeg_codec

        rng = np.random.RandomState(seed)
        arr = rng.randint(0, 256, (h, w)).astype(np.uint8)
        encode, decode = _jpeg_codec()
        out = decode(encode(arr))[:, :, 0].astype(int)
        # worst-case IDCT error under flat-8 quantization: each of 64
        # coefficients off by <=4, spread over the block
        assert np.abs(out - arr.astype(int)).max() <= 32

    @given(st.integers(1, 16), st.integers(1, 16), st.integers(0, 255))
    @settings(max_examples=30, deadline=None)
    def test_jpeg_solid_exact_any_size(self, h, w, v):
        import numpy as np

        from etl_pipelines_spark.multimodal.jpeg import _jpeg_codec

        arr = np.full((h, w), v, np.uint8)
        encode, decode = _jpeg_codec()
        assert (decode(encode(arr))[:, :, 0] == arr).all()

    @given(st.integers(0, 2**32 - 1))
    @settings(max_examples=20, deadline=None)
    def test_mp4_meta_roundtrip(self, seed):
        import random

        from etl_pipelines_spark.multimodal.video import (
            parse_mp4_meta,
            synth_mp4_payload,
        )

        rng = random.Random(seed)
        mid = rng.randrange(0, 10**9)
        dur = rng.randrange(1, 100000)
        w, h = rng.randrange(16, 8192), rng.randrange(16, 8192)
        m = parse_mp4_meta(synth_mp4_payload(mid, dur, w, h))
        t = m["tracks"][0]
        assert m["duration_ms"] == dur * 1000
        assert (t["width"], t["height"]) == (w, h)
        assert t["track_id"] == mid % 1000 + 1


class TestStarComponentsProperty:
    """large-star/small-star contraction must agree with union-find
    on arbitrary graphs — including the chainy graphs it exists for
    (O(log^2 n) rounds vs propagation's O(diameter))."""

    @given(
        st.lists(
            st.tuples(st.integers(0, 40), st.integers(0, 40)),
            min_size=1, max_size=60,
        )
    )
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_union_find(self, spark, edges):
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        from etl_pipelines_spark.textops.dedup import star_components

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r.doc_id: r.component_id for r in star_components(df).collect()
        }
        # reference union-find
        parent: dict[int, int] = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        want = {x: find(x) for x in parent}
        assert got == want

    def test_raises_on_max_rounds_exhaustion(self, spark):
        """An unconverged labeling is over-split — the loop must stop
        loudly instead of returning wrong components undetected."""
        import pytest as _pytest

        from etl_pipelines_spark.textops.dedup import star_components

        # a chain needs >0 rounds to contract, so max_rounds=0 cannot
        # reach the fixpoint check and must raise
        df = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "id_a long, id_b long"
        )
        with _pytest.raises(RuntimeError, match="max_rounds"):
            star_components(df, max_rounds=0)


class TestExactQuantilesProperty:
    """exact_quantiles (two-phase, distributed) must match the
    sorted-list DISC reference — smallest value whose cumulative
    count reaches ceil(q*n) — on arbitrary multisets."""

    @given(
        st.lists(
            st.integers(-50, 50), min_size=1, max_size=120
        ),
        st.integers(0, 2**31 - 1),
    )
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_sorted_reference(self, spark, vals, seed):
        import math

        from etl_pipelines_spark.operators.globalrank import exact_quantiles

        qs = [(1, 4), (1, 2), (3, 4), (99, 100)]
        df = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(5)
        got = {
            round(r.q, 6): r.quantile
            for r in exact_quantiles(df, "x", qs).collect()
        }
        s = sorted(vals)
        n = len(s)
        for num, den in qs:
            need = -(-num * n // den)  # ceil
            want = s[need - 1]
            assert got[round(num / den, 6)] == want, (num, den, s)

    def test_plan_has_no_full_frame_single_partition_sort(self, spark):
        import re

        from etl_pipelines_spark.operators.globalrank import exact_quantiles

        df = spark.range(0, 10000).selectExpr("id % 997 AS x")
        plan = exact_quantiles(df, "x", [(1, 2)])._jdf.queryExecution(
        ).explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # SinglePartition exchanges may carry only the partition-total
        # frame (pid/count columns), never the data column x
        for m in re.finditer(
            r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: "
            r"SinglePartition",
            plan,
        ):
            assert "x#" not in m.group(1), m.group(0)


class TestCodecBitstreamProperties:
    """Randomized bitstream-shape coverage beyond the fixed-seed
    tests: GIF decode vs the reference compressor at every legal
    min-code-size; JPEG restart intervals drawn at random must be
    pixel-invisible."""

    @given(st.integers(2, 8), st.integers(0, 2**31 - 1))
    @settings(max_examples=15, deadline=None)
    def test_gif_reference_compression_any_mcs(self, mcs, seed):
        import numpy as np

        from etl_pipelines_spark.multimodal.binary import _gif_codec
        from tests.test_gif_codec import (
            _reference_lzw_compress,
            _wrap_gif,
        )

        rng = np.random.RandomState(seed)
        n_colors = 1 << mcs
        side = 24
        idx = rng.randint(0, n_colors, side * side).astype(np.uint8)
        palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        data = _reference_lzw_compress(idx, mcs=mcs)
        gif = _wrap_gif(side, side, palette, mcs, data)
        _, decode = _gif_codec()
        assert (
            decode(gif) == palette[idx].reshape(side, side, 3)
        ).all()

    @given(
        st.integers(1, 9), st.integers(0, 2**31 - 1),
        st.booleans(),
    )
    @settings(max_examples=10, deadline=None)
    def test_jpeg_random_restart_interval_invisible(
        self, interval, seed, color
    ):
        import numpy as np

        from etl_pipelines_spark.multimodal.jpeg import _jpeg_codec

        rng = np.random.RandomState(seed)
        shape = (24, 40, 3) if color else (24, 40)
        arr = rng.randint(0, 256, shape).astype(np.uint8)
        encode, decode = _jpeg_codec()
        assert (
            decode(encode(arr))
            == decode(encode(arr, restart_interval=interval))
        ).all()


class TestPipelineInvariants:
    """Conservation/budget laws on the corpus-pipeline operators."""

    @given(
        st.lists(st.integers(0, 60), min_size=1, max_size=40),
        st.integers(8, 64),
    )
    @settings(
        max_examples=10, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_pack_plan_conserves_tokens(self, spark, lens, seq):
        """Every non-empty doc's tokens land in exactly one
        contiguous packed span: Σ n_tok == last offset + last len,
        and chunk spans tile [0, total) with no gaps."""
        from etl_pipelines_spark.textops.analysis import pack_plan

        docs = [
            (i, "src", " ".join(["w"] * n)) for i, n in enumerate(lens)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
        out = sorted(
            pack_plan(df, seq_tokens=seq).collect(),
            key=lambda r: r.tok_offset,
        )
        nonzero = [n for n in lens if n > 0]
        assert len(out) == len(nonzero)
        total = 0
        for r in out:
            assert r.tok_offset == total  # gapless tiling
            total += r.n_tok
        assert total == sum(nonzero)
        for r in out:
            assert r.seq_start == r.tok_offset // seq
            assert r.seq_end == (r.tok_offset + r.n_tok - 1) // seq

    @given(st.integers(0, 2**31 - 1))
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_quarantine_conserves_lines(self, spark, seed):
        """good + quarantined == total input lines, for any mix of
        valid and broken JSONL."""
        import json as _json
        import os
        import random
        import shutil
        import tempfile

        from etl_pipelines_spark.sources import compact_json_with_quarantine

        rng = random.Random(seed)
        root = tempfile.mkdtemp()
        try:
            lines = []
            n_bad = 0
            for i in range(rng.randrange(1, 40)):
                if rng.random() < 0.3:
                    lines.append('{"broken: ' + str(i))
                    n_bad += 1
                else:
                    lines.append(_json.dumps({"id": i, "name": f"n{i}"}))
            os.makedirs(f"{root}/in")
            with open(f"{root}/in/part.json", "w") as f:
                f.write("\n".join(lines))
            ng, nb = compact_json_with_quarantine(
                spark, f"{root}/in", f"{root}/out", f"{root}/qr",
                schema="id bigint, name string",
            )
            assert ng + nb == len(lines)
            assert nb == n_bad
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestSourceMixInvariants:
    @given(st.integers(0, 2**31 - 1), st.integers(2, 6))
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_budget_and_weight_laws(self, spark, seed, n_sources):
        """For any corpus: per-source kept tokens never exceed
        available tokens, keep fractions stay in [0, 10000] bp,
        weights are a distribution (sum 1), and kept docs are a
        subset of the source's docs."""
        import random

        from etl_pipelines_spark.textops.sampling import source_mix

        rng = random.Random(seed)
        rows = []
        did = 0
        for s in range(n_sources):
            for _ in range(rng.randrange(3, 25)):
                n = rng.randrange(1, 40)
                rows.append((did, f"s{s}", " ".join(["w"] * n)))
                did += 1
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = source_mix(df).collect()
        assert len(out) == n_sources
        # output weights are rounded to 6dp — the sum can be off by
        # up to n_sources * 5e-7
        assert abs(sum(r.weight for r in out) - 1.0) <= n_sources * 1e-6
        for r in out:
            assert 0 <= r.keep_bp <= 10000
            assert 0 <= r.n_docs_kept <= r.n_docs
            assert 0 <= r.n_tokens_kept <= r.n_tokens
