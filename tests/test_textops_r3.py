"""Round-3 operator tests: PII redaction, line-level dedup, n-gram
decontamination, unigram LM scoring, source mixing, SemDeDup, and
the ROLLUP multi-grain query."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from etl_pipelines_spark.queries import REGISTRY, load
from etl_pipelines_spark.textops import (
    line_dedup,
    ngram_contamination,
    ngrams_exact,
    redact_pii,
    semantic_dedup_pairs,
    source_mix,
    unigram_logprob,
)


def _bucket(key: int, n: int = 10000) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % n


class TestRedactPii:
    def test_counts_and_placeholders(self, spark):
        df = spark.createDataFrame(
            [
                (1, "mail me at a.b@x.io or c@y.org thanks"),
                (2, "call +1-555-0042 from 10.0.0.7 today"),
                (3, "nothing sensitive here"),
            ],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in redact_pii(df).collect()}
        assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (2, 0, 0)
        assert out[1].redacted == "mail me at <EMAIL> or <EMAIL> thanks"
        assert (out[2].n_emails, out[2].n_phones, out[2].n_ips) == (0, 1, 1)
        assert out[2].redacted == "call <PHONE> from <IP> today"
        assert out[3].redacted == "nothing sensitive here"

    def test_counts_on_original_not_redacted(self, spark):
        # the placeholder itself must not be re-counted or re-matched
        df = spark.createDataFrame([(1, "x@y.io x@y.io")], ["doc_id", "text"])
        r = redact_pii(df).collect()[0]
        assert r.n_emails == 2
        assert r.redacted == "<EMAIL> <EMAIL>"


class TestLineDedup:
    def test_first_occurrence_wins(self, spark):
        # 2-token lines; doc 1 defines both lines, doc 2 repeats them
        # exactly (keeps nothing), doc 3 shares line one only.
        df = spark.createDataFrame(
            [
                (1, "a b c d"),
                (2, "a b c d"),
                (3, "a b x y"),
            ],
            ["doc_id", "text"],
        )
        out = {r.doc_id: r for r in line_dedup(df, line_tokens=2).collect()}
        assert (out[1].n_lines, out[1].n_kept) == (2, 2)
        assert out[1].new_text == "a b c d"
        assert (out[2].n_kept, out[2].new_text) == (0, "")
        assert (out[3].n_lines, out[3].n_kept) == (2, 1)
        assert out[3].new_text == "x y"

    def test_intra_doc_duplicate_lines_collapse(self, spark):
        df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
        r = line_dedup(df, line_tokens=2).collect()[0]
        assert (r.n_lines, r.n_kept, r.new_text) == (2, 1, "a b")

    def test_partial_final_line(self, spark):
        df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        r = line_dedup(df, line_tokens=2).collect()[0]
        assert (r.n_lines, r.n_kept, r.new_text) == (2, 2, "a b c")


class TestNgramDecontamination:
    def test_short_docs_have_no_ngrams(self, spark):
        df = spark.createDataFrame([(1, "only four tokens here")], ["i", "t"])
        assert df.select(
            F.size(ngrams_exact(F.col("t"), 13)).alias("n")
        ).collect()[0].n == 0

    def test_overlap_detection(self, spark):
        base = " ".join(f"w{i}" for i in range(20))
        corpus = spark.createDataFrame([(1, base)], ["doc_id", "text"])
        batch = spark.createDataFrame(
            [
                (10, base + " trailing extra"),  # shares 13-grams
                (11, " ".join(f"w{i}" for i in reversed(range(20)))),  # clean
                (12, "too short for grams"),  # exempt
            ],
            ["batch_id", "text"],
        )
        out = {
            r.batch_id: r
            for r in ngram_contamination(corpus, batch, n=13).collect()
        }
        assert out[10].contaminated and out[10].n_overlap == 8  # 20-12 grams
        assert not out[11].contaminated and out[11].n_ngrams == 8
        assert not out[12].contaminated and out[12].n_ngrams == 0


class TestUnigramLogprob:
    def test_hand_computed(self, spark):
        # corpus tokens: a a b  -> p(a)=2/3, p(b)=1/3
        df = spark.createDataFrame([(1, "a a"), (2, "b")], ["doc_id", "text"])
        out = {r.doc_id: r for r in unigram_logprob(df).collect()}
        lp_a = round(math.log(2 / 3), 6)
        lp_b = round(math.log(1 / 3), 6)
        assert out[1].n_tokens == 2
        assert abs(out[1].avg_logprob - lp_a) < 1e-9
        assert abs(out[2].avg_logprob - lp_b) < 1e-9


class TestSourceMix:
    def test_weights_and_budget(self, spark, sf_dir):
        d = load(spark, sf_dir, "documents")
        rows = source_mix(d).collect()
        assert rows, "source mix must produce per-source rows"
        total_w = sum(r.weight for r in rows)
        assert abs(total_w - 1.0) < 1e-4
        for r in rows:
            assert 0 <= r.keep_bp <= 10000
            assert r.n_docs_kept <= r.n_docs
            assert r.n_tokens_kept <= r.n_tokens
        # the 30% budget must actually bite somewhere (not keep all)
        assert any(r.n_docs_kept < r.n_docs for r in rows)

    def test_alpha_upweights_small_sources(self, spark):
        # one big + one small source; alpha<1 must give the small
        # source a keep fraction strictly larger than its token share
        big = [(i, "s_big", "tok " * 50) for i in range(40)]
        small = [(100 + i, "s_small", "tok " * 50) for i in range(4)]
        df = spark.createDataFrame(
            big + small, ["doc_id", "source", "text"]
        )
        out = {r.source: r for r in source_mix(df).collect()}
        share_small = out["s_small"].n_tokens / (
            out["s_small"].n_tokens + out["s_big"].n_tokens
        )
        assert out["s_small"].weight > share_small
        # deterministic md5 sampling: recompute one source by hand
        kept = [
            i
            for i in range(40)
            if _bucket(i) < out["s_big"].keep_bp
        ]
        assert out["s_big"].n_docs_kept == len(kept)


class TestSemanticDedup:
    def test_pairs_subset_of_all_pairs_with_exact_cosine(
        self, spark, sf_dir
    ):
        from etl_pipelines_spark.textops.similarity import all_pairs_cosine

        e = load(spark, sf_dir, "embeddings")
        exact = {
            (r.id_a, r.id_b): r.cosine
            for r in all_pairs_cosine(e, threshold=0.4).collect()
        }
        sem = semantic_dedup_pairs(e, threshold=0.4).collect()
        assert sem, "semantic dedup must find pairs on the corpus"
        for r in sem:
            assert (r.id_a, r.id_b) in exact
            assert abs(r.cosine - exact[(r.id_a, r.id_b)]) < 1e-12

    def test_pairs_share_a_cluster(self, spark, sf_dir):
        from etl_pipelines_spark.textops import (
            fixed_ivf_centroids,
            ivf_assign_exact,
        )

        e = load(spark, sf_dir, "embeddings")
        cents = fixed_ivf_centroids(dim=64, nlist=16, seed=7)
        assign = {
            r.vec_id: r.lid
            for r in ivf_assign_exact(e, cents, nprobe=1)
            .select("vec_id", F.col("__list").alias("lid"))
            .collect()
        }
        for r in semantic_dedup_pairs(e, threshold=0.4).collect():
            assert assign[r.id_a] == assign[r.id_b] == r.list_id


class TestRollupQuery:
    def test_grand_total_row(self, spark, sf_dir):
        rows = REGISTRY["a_rollup_multigrain"].spark(spark, sf_dir).collect()
        grand = [r for r in rows if r.grain == 3]
        assert len(grand) == 1
        n_orders = load(spark, sf_dir, "orders").count()
        assert grand[0].n_orders == n_orders
        # subtotals per status must sum to the grand total
        st = [r for r in rows if r.grain == 1]
        assert sum(r.n_orders for r in st) == n_orders


class TestTimeRangeRolling:
    def test_seven_day_boundary_inclusive(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 10, 12, 0, 0)
        rows = [
            (1, base - dt.timedelta(days=7), 1, 10.0),
            (2, base - dt.timedelta(days=7, microseconds=1), 1, 5.0),
            (3, base, 1, 2.0),
            (4, base, 2, 9.0),
        ]
        df = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "value"]
        )
        from pyspark.sql import Window

        w = (
            Window.partitionBy("user_id")
            .orderBy(F.unix_micros("ts"))
            .rangeBetween(-7 * 86400 * 1000000, 0)
        )
        out = {
            r.event_id: (r.n, r.s)
            for r in df.select(
                "event_id",
                F.count(F.lit(1)).over(w).alias("n"),
                F.sum(F.col("value").cast("decimal(12,2)"))
                .over(w)
                .cast("double")
                .alias("s"),
            ).collect()
        }
        # event 3's frame includes event 1 (exactly 7 days old,
        # inclusive) but NOT event 2 (1 microsecond beyond)
        assert out[3] == (2, 12.0)
        assert out[4] == (1, 9.0)


class TestGopherFilter:
    def test_rules_and_conjunction(self, spark, sf_dir):
        rows = REGISTRY["txt_gopher_filter"].spark(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.keep == (
                r.pass_length
                and r.pass_word_shape
                and r.pass_stopwords
                and r.pass_repetition
            )
        # every rule must fire somewhere on the corpus
        for flag in ("pass_length", "pass_word_shape",
                     "pass_stopwords", "pass_repetition"):
            vals = {getattr(r, flag) for r in rows}
            assert vals == {True, False}, flag


class TestImagePatchPlan:
    def test_grid_and_edge_clipping(self, spark):
        from pyspark.sql import functions as F

        from etl_pipelines_spark.multimodal import image_patch_plan

        df = spark.createDataFrame(
            [(1, 70, 33)], ["media_id", "w", "h"]
        ).select(
            "media_id",
            F.struct(
                F.col("w").alias("width"), F.col("h").alias("height")
            ).alias("meta"),
        )
        out = image_patch_plan(df, patch=32).collect()
        # 70x33 -> 3x2 grid
        assert len(out) == 6
        by_idx = {r.patch_idx: r for r in out}
        assert (by_idx[0].x0, by_idx[0].y0, by_idx[0].x1, by_idx[0].y1) == (
            0, 0, 32, 32)
        # right-edge patch clips to width 70
        assert (by_idx[2].x0, by_idx[2].x1) == (64, 70)
        # bottom-right clips both dims
        assert (by_idx[5].x0, by_idx[5].y0, by_idx[5].x1, by_idx[5].y1) == (
            64, 32, 70, 33)


class TestDistributedKmeans:
    def test_convergence_and_agreement_with_assignment(self, spark, sf_dir):
        """Lloyd iterations over the full corpus: the mean cosine of
        members to their assigned centroid must be non-decreasing
        (spherical k-means monotonicity), and the returned centroids
        must be unit-norm."""
        from etl_pipelines_spark.textops import kmeans_lloyd_distributed

        e = load(spark, sf_dir, "embeddings")
        cents, hist = kmeans_lloyd_distributed(e, k=8, iters=4)
        assert len(cents) == 8 and len(hist) == 4
        for a, b in zip(hist, hist[1:]):
            assert b >= a - 1e-9, hist
        for c in cents:
            n = sum(x * x for x in c) ** 0.5
            assert abs(n - 1.0) < 1e-9


class TestBpeTrain:
    @staticmethod
    def _py_reference(word_counts, n_merges):
        """Pure-python BPE trainer with the same deterministic
        tie-break — the oracle for the distributed implementation."""
        vocab = {tuple(list(w) + ["</w>"]): n for w, n in word_counts.items()}
        merges = []
        for _ in range(n_merges):
            counts = {}
            for syms, n in vocab.items():
                for i in range(len(syms) - 1):
                    counts[(syms[i], syms[i + 1])] = (
                        counts.get((syms[i], syms[i + 1]), 0) + n
                    )
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < 2:
                break
            (a, b) = best[0]
            merges.append((a, b))
            new_vocab = {}
            for syms, n in vocab.items():
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + n
            vocab = new_vocab
        return merges

    def test_matches_python_reference_on_classic_corpus(self, spark):
        from collections import Counter

        from etl_pipelines_spark.textops import bpe_train

        text = "low low low low low lower lower newest newest newest " \
               "newest newest newest widest widest widest"
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        got = bpe_train(df, n_merges=8)
        want = self._py_reference(Counter(text.split()), 8)
        assert got == want
        assert len(got) == 8

    def test_encode_roundtrip(self, spark):
        from etl_pipelines_spark.textops import bpe_encode_word, bpe_train

        df = spark.createDataFrame(
            [(1, "banana banana banana bandana")], ["doc_id", "text"]
        )
        merges = bpe_train(df, n_merges=5)
        toks = bpe_encode_word("banana", merges)
        # merges applied in order must reassemble the original word
        assert "".join(toks).replace("</w>", "") == "banana"
        assert len(toks) < len("banana") + 1  # something actually merged


class TestBpeCorpusEncode:
    """The corpus-scale replace-chain encoder must agree with the
    per-word reference encoder (bpe_encode_word) — including the
    no-cross-symbol-boundary and no-cross-word-boundary rules."""

    def _reference_doc_tokens(self, text, merges):
        from etl_pipelines_spark.textops import bpe_encode_word
        import re

        clean = re.sub(r" +", " ", re.sub(r"[^a-z ]", "", text.lower())).strip()
        words = [w for w in clean.split(" ") if w]
        # map the reference's </w> marker onto the encoder's '#'
        mapped = [
            tuple(s.replace("</w>", "#") for s in m) if "</w>" in m else m
            for m in merges
        ]
        total = 0
        for w in words:
            syms = [c for c in w] + ["#"]
            for a, b in mapped:
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
        return len(words), total

    def test_matches_reference_encoder(self, spark):
        from etl_pipelines_spark.textops import (
            FIXED_MERGES,
            bpe_corpus_token_stats,
        )

        docs = [
            (1, "The theater then thinned.  Another anthem!"),
            (2, "abc abab the the the in inning ing"),
            (3, "Numbers 123 and punctuation -- gone; the rest remains."),
            (4, ""),
            (5, "!!! 42 ???"),
            (6, "a"),
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r["doc_id"]: (r["n_words"], r["n_tokens"])
            for r in bpe_corpus_token_stats(df, FIXED_MERGES).collect()
        }
        for doc_id, text in docs:
            assert got[doc_id] == self._reference_doc_tokens(
                text, FIXED_MERGES
            ), (doc_id, text)

    def test_boundaries_block_merges(self, spark):
        """'b'+'c' must not merge inside the symbol 'ab'+'c', and
        't'+'h' must not merge across a word boundary ('at home')."""
        from etl_pipelines_spark.textops import bpe_corpus_token_stats

        df = spark.createDataFrame(
            [(1, "abc"), (2, "at home")], ["doc_id", "text"]
        )
        out = {
            r["doc_id"]: r["n_tokens"]
            for r in bpe_corpus_token_stats(
                df, [("a", "b"), ("b", "c")]
            ).collect()
        }
        # abc -> [ab, c, #]: the (b,c) rule sees no adjacent b,c
        assert out[1] == 3
        # at home -> a t # h o m e # : 't h' split by the boundary
        assert out[2] == 8

    def test_empty_and_stripped_docs(self, spark):
        from etl_pipelines_spark.textops import (
            FIXED_MERGES,
            bpe_corpus_token_stats,
        )

        df = spark.createDataFrame([(1, ""), (2, "123 !?")], ["doc_id", "text"])
        rows = {r["doc_id"]: r for r in bpe_corpus_token_stats(df, FIXED_MERGES).collect()}
        for i in (1, 2):
            assert rows[i]["n_words"] == 0
            assert rows[i]["n_tokens"] == 0
            assert rows[i]["tokens_per_word"] is None


class TestProductQuantization:
    def test_codes_in_range_and_one_row_per_vector(self, spark, sf_dir):
        from etl_pipelines_spark.textops import pq_codebooks, pq_encode_exact

        e = load(spark, sf_dir, "embeddings")
        out = pq_encode_exact(e, pq_codebooks()).collect()
        assert len(out) == e.count()
        for r in out:
            for j in range(8):
                assert 0 <= r[f"code_{j}"] < 16
            assert r["recon_err"] >= 0.0

    def test_adc_self_distance_equals_recon_err(self, spark, sf_dir):
        """ADC(q, q) = sum_j d(q_j, centroid[code_j(q)]) — exactly
        the reconstruction error of q. Exercises encode, LUT, and
        the JVM lookup chain against each other bit-for-bit."""
        from etl_pipelines_spark.textops import (
            pq_adc_topk,
            pq_codebooks,
            pq_encode_exact,
        )

        cb = pq_codebooks()
        e = load(spark, sf_dir, "embeddings")
        queries = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        err = {
            r["vec_id"]: r["recon_err"]
            for r in pq_encode_exact(
                e.filter(F.col("vec_id") < 5), cb
            ).collect()
        }
        adc = pq_adc_topk(e, queries, cb, k=10).collect()
        self_rows = {r["query_id"]: r["adist"] for r in adc if r["query_id"] == r["vec_id"]}
        # every query's own vector must appear in its top-10 with
        # adist == its reconstruction error, bit-for-bit
        assert set(self_rows) == set(err)
        for qid, dist in self_rows.items():
            assert dist == err[qid], (qid, dist, err[qid])

    def test_ranking_is_dense_and_ascending(self, spark, sf_dir):
        from etl_pipelines_spark.textops import pq_adc_topk, pq_codebooks

        e = load(spark, sf_dir, "embeddings")
        queries = e.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        rows = pq_adc_topk(e, queries, pq_codebooks(), k=10).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rs] == list(range(1, 11))
            dists = [r["adist"] for r in rs]
            assert dists == sorted(dists)


class TestHllDistinct:
    def test_duplication_invariance(self, spark, sf_dir):
        """A cardinality sketch must be blind to duplication:
        HLL(df UNION ALL df) == HLL(df), bit-for-bit."""
        from etl_pipelines_spark.operators import hll_distinct

        e = load(spark, sf_dir, "events").select("event_type", "user_id")
        one = {
            r["event_type"]: r["hll_estimate"]
            for r in hll_distinct(e, ["event_type"], "user_id").collect()
        }
        two = {
            r["event_type"]: r["hll_estimate"]
            for r in hll_distinct(
                e.unionAll(e), ["event_type"], "user_id"
            ).collect()
        }
        assert one == two

    def test_error_within_theoretical_bound(self, spark, sf_dir):
        from etl_pipelines_spark.queries import REGISTRY

        rows = REGISTRY["mon_hll_distinct"].spark(spark, sf_dir).collect()
        assert rows
        for r in rows:
            # raw HLL, m=64: sigma ~ 1.04/8 = 13%; allow 3 sigma
            assert r["rel_err"] < 0.4, (r["event_type"], r["rel_err"])

    def test_rank_is_integer_exact(self, spark):
        """rho from the base-2 string must equal the arithmetic
        leading-zero count for hand-picked remainders, incl. w=0."""
        from etl_pipelines_spark.operators.hll import (
            C,
            W_BITS,
            hll_register_rows,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i,) for i in range(200)], ["v"]
        )
        bucket, rho = hll_register_rows(F.col("v"))
        got = df.select(F.col("v"), bucket.alias("b"), rho.alias("r")).collect()
        import hashlib

        for row in got:
            h = int(hashlib.md5(str(row["v"]).encode()).hexdigest()[:15], 16)
            b = h >> W_BITS
            w = h & ((1 << W_BITS) - 1)
            want = C if w == 0 else C - w.bit_length()
            assert (row["b"], row["r"]) == (b, want), row


class TestTfidfTopterms:
    def test_rare_term_outranks_common(self, spark):
        from etl_pipelines_spark.textops import tfidf_topterms

        df = spark.createDataFrame(
            [
                (1, "alpha zebra"),
                (2, "alpha beta"),
                (3, "alpha beta"),
            ],
            "doc_id long, text string",
        )
        rows = {
            (r.doc_id, r.term): r
            for r in tfidf_topterms(df, k=5).collect()
        }
        # equal tf, but zebra appears in 1 doc vs alpha's 3: the idf
        # factor (4/2 vs 4/4) decides the ranking
        assert rows[(1, "zebra")].term_rank < rows[(1, "alpha")].term_rank
        assert rows[(1, "zebra")].tfidf == 1 * 4 / 2
        assert rows[(1, "alpha")].tfidf == 1 * 4 / 4

    def test_topk_bound_and_determinism(self, spark):
        from etl_pipelines_spark.textops import tfidf_topterms

        df = spark.createDataFrame(
            [(i, "a b c d e f g h") for i in range(10)],
            "doc_id long, text string",
        )
        out = tfidf_topterms(df, k=3).groupBy("doc_id").count().collect()
        assert all(r["count"] == 3 for r in out)
        # all-equal scores tie-break on term asc
        first = (
            tfidf_topterms(df, k=3)
            .filter("doc_id = 0")
            .orderBy("term_rank")
            .collect()
        )
        assert [r.term for r in first] == ["a", "b", "c"]


class TestPackPlan:
    def test_concatenate_and_chop_offsets(self, spark):
        from etl_pipelines_spark.textops import pack_plan

        # stream s: docs of 3, 4, 2 tokens, budget 4:
        # offsets 0, 3, 7 -> seqs (0,0), (0,1), (1,2)
        df = spark.createDataFrame(
            [
                (1, "a b c", "s"),
                (2, "a b c d", "s"),
                (3, "a b", "s"),
                (4, "x", "t"),
            ],
            "doc_id long, text string, source string",
        )
        rows = {
            r.doc_id: r
            for r in pack_plan(df, seq_tokens=4).collect()
        }
        assert (rows[1].tok_offset, rows[1].seq_start, rows[1].seq_end) == (0, 0, 0)
        assert (rows[2].tok_offset, rows[2].seq_start, rows[2].seq_end) == (3, 0, 1)
        assert rows[2].offset_in_seq == 3
        assert (rows[3].tok_offset, rows[3].seq_start, rows[3].seq_end) == (7, 1, 2)
        # independent stream restarts at offset 0
        assert rows[4].tok_offset == 0

    def test_empty_docs_dropped_and_totals_conserved(self, spark):
        from pyspark.sql import functions as F

        from etl_pipelines_spark.textops import pack_plan

        df = spark.createDataFrame(
            [(1, "a b", "s"), (2, "", "s"), (3, "c", "s")],
            "doc_id long, text string, source string",
        )
        out = pack_plan(df, seq_tokens=8)
        assert out.count() == 2
        # last doc's offset + len == total stream tokens
        last = out.orderBy(F.desc("tok_offset")).first()
        assert last.tok_offset + last.n_tok == 3


class TestWeightedSample:
    def test_monotone_in_weight_and_zero_excluded(self, spark):
        from etl_pipelines_spark.textops import weighted_sample_topk

        rows = [(i, (i % 7) + 1) for i in range(200)] + [(999, 0)]
        df = spark.createDataFrame(rows, ["doc_id", "w"])
        picked = {
            r.doc_id for r in weighted_sample_topk(df, "doc_id", "w", 30).collect()
        }
        assert 999 not in picked and len(picked) == 30
        # doubling every weight halves every priority: the SAME set
        # wins (scale invariance of the ratio order)
        df2 = df.withColumn("w", F.col("w") * 2)
        picked2 = {
            r.doc_id for r in weighted_sample_topk(df2, "doc_id", "w", 30).collect()
        }
        assert picked == picked2
        # raising ONE unpicked doc's weight enough must pull it in
        loser = min(set(r[0] for r in rows[:-1]) - picked)
        df3 = df.withColumn(
            "w", F.when(F.col("doc_id") == loser, 10**9).otherwise(F.col("w"))
        )
        picked3 = {
            r.doc_id for r in weighted_sample_topk(df3, "doc_id", "w", 30).collect()
        }
        assert loser in picked3

    def test_heavier_population_overrepresented(self, spark):
        """Statistical contract: docs with weight 10 should appear in
        the sample far above their count share vs weight-1 docs."""
        from etl_pipelines_spark.textops import weighted_sample_topk

        rows = [(i, 10 if i < 200 else 1) for i in range(2000)]
        df = spark.createDataFrame(rows, ["doc_id", "w"])
        picked = [
            r.doc_id for r in weighted_sample_topk(df, "doc_id", "w", 200).collect()
        ]
        heavy = sum(1 for d in picked if d < 200)
        # heavy docs are 10% of the population but ~10x likelier:
        # expect well above 2x their count share in the sample
        assert heavy > 40, heavy


class TestBigramLogprob:
    def test_sequence_sensitivity(self, spark):
        """Same bag of tokens, different order: the doc whose
        bigrams match the corpus's dominant phrasing must outscore
        the shuffled one — the thing unigram scoring cannot see."""
        from etl_pipelines_spark.textops import bigram_logprob

        docs = [(i, "the data pipeline runs fast") for i in range(20)]
        docs.append((100, "the data pipeline runs fast"))
        docs.append((101, "fast the runs pipeline data"))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = {r.doc_id: r.avg_logprob for r in bigram_logprob(df).collect()}
        assert out[100] > out[101]

    def test_closed_form_tiny_corpus(self, spark):
        from math import log

        from etl_pipelines_spark.textops import bigram_logprob

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
        )
        out = {r.doc_id: r for r in bigram_logprob(df).collect()}
        # vocab = {a, b, c} -> V=3; c(a)=3
        # p(b|a) = (2+1)/(3+3); p(c|a) = (1+1)/(3+3)
        lp_ab = round(log(3 / 6), 6)
        lp_ac = round(log(2 / 6), 6)
        assert abs(out[1].avg_logprob - lp_ab) < 1e-9
        assert out[1].n_bigrams == 1
        assert abs(out[3].avg_logprob - lp_ac) < 1e-9

    def test_single_token_docs_emit_nothing(self, spark):
        from etl_pipelines_spark.textops import bigram_logprob

        df = spark.createDataFrame(
            [(1, "solo"), (2, "a b")], ["doc_id", "text"]
        )
        ids = {r.doc_id for r in bigram_logprob(df).collect()}
        assert ids == {2}


class TestBigramLogprobPruned:
    def test_closed_form_prune_and_backoff(self, spark):
        """c12 >= min_count bigrams score from the model; pruned
        singletons back off to the add-1 unigram probability of
        their second word (KenLM --prune shape)."""
        from math import log

        from etl_pipelines_spark.textops import bigram_logprob_pruned

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
        )
        out = {
            r.doc_id: r
            for r in bigram_logprob_pruned(df, min_count=2).collect()
        }
        # vocab {a,b,c} -> V=3, N=6 tokens; c(a)=3, c(b)=2, c(c)=1
        # "a b" c12=2 survives: lp = ln((2+1)/(3+3))
        lp_ab = round(log(3 / 6), 6)
        assert abs(out[1].avg_logprob - lp_ab) < 1e-9
        assert out[1].n_backoff == 0
        # "a c" c12=1 pruned: backoff ln((c(c)+1)/(N+V)) = ln(2/9)
        lp_backoff_c = round(log(2 / 9), 6)
        assert abs(out[3].avg_logprob - lp_backoff_c) < 1e-9
        assert out[3].n_backoff == 1

    def test_min_count_one_matches_unpruned(self, spark):
        """With min_count=1 nothing is pruned: scores must equal the
        unpruned model exactly (backoff path never taken)."""
        from etl_pipelines_spark.textops import (
            bigram_logprob,
            bigram_logprob_pruned,
        )

        docs = [
            (i, t)
            for i, t in enumerate(
                ["a b c a b", "b c d", "x y", "a c b a", "d d d"]
            )
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        want = {
            r.doc_id: (r.n_bigrams, r.avg_logprob)
            for r in bigram_logprob(df).collect()
        }
        got = {
            r.doc_id: (r.n_bigrams, r.avg_logprob)
            for r in bigram_logprob_pruned(df, min_count=1).collect()
        }
        assert got == want

    def test_model_table_is_bounded_by_prune(self, spark):
        """The point of pruning: singleton bigrams (the corpus-sized
        tail) never reach the join. All-unique text -> every doc
        scores fully from backoff."""
        from etl_pipelines_spark.textops import bigram_logprob_pruned

        docs = [(i, f"u{i} v{i} w{i}") for i in range(30)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = bigram_logprob_pruned(df, min_count=2).collect()
        assert len(out) == 30
        for r in out:
            assert r.n_backoff == r.n_bigrams == 2
