"""Text analysis: language-ID, quality scoring, token counting,
document fingerprinting. All Catalyst array/string expressions — no
UDFs, no shuffles; every function is a per-row map over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.cacheutil import tracked_cache

# Whitespace tokenizer + a BPE-ish fallback that also splits
# punctuation off words (the testdata corpus is already clean
# lowercase; real corpora aren't).
_TOKEN_SPLIT_RE = r"\s+"
_BPE_ISH_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Tiny per-language marker-word lists (function words). Real systems
# use character n-gram profiles; marker-word voting is the
# deterministic, SQL-expressible heuristic variant.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "y", "es"],
    "fr": ["le", "la", "les", "et", "est", "que"],
    "zh": [],  # no-space script: handled by the cjk-ratio signal
}
_LANG_ORDER = ["en", "de", "es", "fr", "zh"]  # deterministic tie-break


def tokenize(text: Column, mode: str = "whitespace") -> Column:
    """Array of tokens. mode='whitespace' | 'bpe-ish' (regexp that
    separates alpha / digit / punctuation runs)."""
    if mode == "whitespace":
        return F.filter(F.split(text, _TOKEN_SPLIT_RE), lambda t: t != "")
    if mode == "bpe-ish":
        return F.regexp_extract_all(text, F.lit(_BPE_ISH_RE), 0)
    raise ValueError(f"unknown tokenize mode: {mode!r}")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts (whitespace + BPE-ish), char length, avg token
    length, punctuation/digit/whitespace ratios, stopword ratio."""
    t = F.col(text_col)
    toks = tokenize(t)
    n_tok = F.size(toks)
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    return (
        df.withColumn("n_chars_actual", F.length(t).cast("long"))
        .withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("n_tokens_bpeish", F.size(tokenize(t, "bpe-ish")).cast("long"))
        .withColumn(
            "avg_token_len",
            F.when(
                n_tok > 0,
                F.aggregate(
                    toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
                ).cast("double")
                / n_tok,
            ),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                F.length(t) > 0,
                F.regexp_count(t, F.lit(r"[^\w\s]")).cast("double") / F.length(t),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "digit_ratio",
            F.when(
                F.length(t) > 0,
                F.regexp_count(t, F.lit(r"[0-9]")).cast("double") / F.length(t),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(
                n_tok > 0,
                F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).cast(
                    "double"
                )
                / n_tok,
            ).otherwise(F.lit(0.0)),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A Gopher-rules-flavored quality score in [0,1]: length in
    range, mean word length in range, low punctuation/digit noise,
    some stopword mass. Deterministic arithmetic only."""
    d = with_text_stats(df, text_col)
    length_ok = (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000)
    wordlen_ok = (F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0)
    # Integer weights summed before a single division keep the score
    # bit-identical across engines (no float accumulation).
    score = (
        length_ok.cast("int") * 40
        + wordlen_ok.cast("int") * 20
        + (F.col("punct_ratio") <= 0.2).cast("int") * 15
        + (F.col("digit_ratio") <= 0.3).cast("int") * 15
        + (F.col("stopword_ratio") >= 0.01).cast("int") * 10
    )
    return d.withColumn("quality_score", (score / F.lit(100)).cast("double"))


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word-vote language ID + a CJK-character-ratio override.
    Ties resolve in _LANG_ORDER (en first) — deterministic."""
    t = F.col(text_col)
    toks = tokenize(t)
    n_tok = F.size(toks)
    out = df
    for lang in _LANG_ORDER:
        markers = LANG_MARKERS[lang]
        if markers:
            arr = F.array([F.lit(w) for w in markers])
            hits = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
        else:
            hits = F.lit(0)
        out = out.withColumn(f"__hits_{lang}", hits)
    cjk_ratio = F.when(
        F.length(t) > 0,
        F.regexp_count(t, F.lit(r"[一-鿿]")).cast("double") / F.length(t),
    ).otherwise(F.lit(0.0))
    best = F.lit("en")
    best_hits = F.col("__hits_en")
    for lang in _LANG_ORDER[1:]:
        cond = F.col(f"__hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"__hits_{lang}")).otherwise(best_hits)
    detected = F.when(cjk_ratio > 0.2, F.lit("zh")).otherwise(best)
    out = out.withColumn("detected_lang", detected).withColumn(
        "lang_confidence",
        F.when(n_tok > 0, best_hits.cast("double") / n_tok).otherwise(F.lit(0.0)),
    )
    return out.drop(*[f"__hits_{lang}" for lang in _LANG_ORDER])


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of casefolded, punctuation-stripped,
    whitespace-collapsed text — the exact-dedup key that survives
    cosmetic edits. (A Rabin-Karp winnowing variant lives in
    dedup.simhash for the fuzzy path.)"""
    t = F.col(text_col)
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(t), r"[^\w\s]", ""), r"\s+", " "
        )
    )
    return df.withColumn("fingerprint", F.md5(normalized))


def with_repetition(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 5)
) -> DataFrame:
    """Intra-document repetition signals (the Gopher-rule family,
    Rae et al. 2021 'Scaling Language Models' §A1.1.2 — public
    heuristics every LLM corpus filter applies): for each n in ``ns``
    the fraction of duplicate n-grams, 1 - distinct/total. Highly
    repetitive documents (boilerplate, keyword stuffing, decode
    loops) score near 1 and get filtered before training.

    Pure array expressions — total n-gram count is arithmetic on the
    token count (size - n + 1), distinct count reuses dedup.shingles
    (already a distinct set), so no non-distinct gram list is ever
    materialized. Narrow per-row map, no shuffle, safe at 100 TB."""
    from .dedup import shingles

    t = F.col(text_col)
    toks = tokenize(t)
    n_tok = F.size(toks)
    out = df
    for n in ns:
        total = F.when(n_tok >= n, n_tok - (n - 1)).otherwise(
            F.when(n_tok > 0, F.lit(1)).otherwise(F.lit(0))
        )
        distinct = F.when(n_tok > 0, F.size(shingles(t, n))).otherwise(F.lit(0))
        out = out.withColumn(
            f"dup_{n}gram_frac",
            F.when(
                total > 0,
                F.lit(1.0) - distinct.cast("double") / total.cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    return out


def chunk_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
) -> DataFrame:
    """Sequence-packing plan: one row per fixed-budget training chunk
    — (id, chunk_idx, tok_start, tok_end, n_chunk_tokens) for
    non-overlapping windows of ``chunk_tokens`` whitespace tokens.
    The text itself is not carried; the downstream tokenizer joins
    the plan back by id and slices, so the exploded plan stays
    narrow. Per-row posexplode over a sequence — the mm_frame_plan
    shape applied to text; no shuffle, safe at 100 TB."""
    toks = tokenize(F.col(text_col))
    n_tok = F.size(toks)
    n_chunks = F.ceil(n_tok.cast("double") / chunk_tokens).cast("int")
    base = df.select(
        F.col(id_col),
        n_tok.cast("long").alias("__n_tok"),
        F.greatest(n_chunks, F.lit(1)).alias("__n_chunks"),
    )
    seq = F.sequence(F.lit(0), F.col("__n_chunks") - 1)
    ex = base.select(
        id_col, "__n_tok", F.posexplode(seq).alias("chunk_idx", "__i")
    )
    start = F.col("chunk_idx").cast("long") * chunk_tokens
    end = F.least(F.col("__n_tok"), start + chunk_tokens)
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.alias("tok_start"),
        end.alias("tok_end"),
        (end - start).alias("n_chunk_tokens"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability under an in-corpus
    unigram LM — the CCNet-style LM quality signal (Wenzek et al.
    2020): documents whose tokens are improbable under the corpus
    distribution (gibberish, boilerplate codes) score low and are
    filtered or down-weighted before training. (CCNet uses a 5-gram
    KenLM; the unigram model is the SQL-expressible member of the
    family and the standard cheap first pass.)

    Cross-engine exactness: per-token log-probs are rounded to 6
    decimals and cast DECIMAL(18,6), so the per-document SUM is exact
    and order-independent — float addition order never enters (the
    engine's exact-decimal money-sum discipline applied to log
    space).

    Scale: two hash aggs (token frequencies; per-doc rollup) and one
    token-keyed join — tokens and 8-byte decimals shuffle, text does
    not. The frequency table is vocabulary-sized (≪ corpus);
    broadcast it explicitly when the vocab is known small."""
    toks = df.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    # NOT cached (r13 negative result): freq has two consumers
    # (total, the lp join), but a tracked_cache here measured WORSE
    # in paired A/B (0.65-0.96 s uncached vs 0.97-1.34 s cached,
    # three alternations) — the materialization barrier costs more
    # than the single corpus re-tokenize it saves at this scale,
    # unlike the bigram models below where the cache removes three
    # duplicated corpus passes.
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    lp = freq.crossJoin(F.broadcast(total)).select(
        "token",
        F.round(
            F.log(
                F.col("cnt").cast("double") / F.col("total").cast("double")
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    return (
        toks.join(lp, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lp").cast("double") / F.count(F.lit(1))).alias(
                "avg_logprob"
            ),
        )
    )


def vocab_topk(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by frequency with a
    deterministic (count desc, token) order and dense rank. The
    explode shuffles (token, partial count) with map-side combine —
    the aggregated vocabulary is orders of magnitude smaller than
    the corpus; ranking happens after LIMIT on the tiny head, so no
    single-partition window ever sees the full vocab."""
    toks = tokenize(F.col(text_col))
    counts = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return counts.withColumn("rank", F.row_number().over(w).cast("int"))


def tfidf_topterms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document top-k characteristic terms by a tf-idf score —
    the keyword-extraction / topic-fingerprint step of a corpus
    analysis pipeline.

    Score = tf * (N + 1) / (doc_freq + 1): the smoothed-idf family
    with the logarithm DROPPED. Rationale: ln() is monotone, so for
    a FIXED term the ranking information is identical, and the
    rational form is one integer multiply + one IEEE division —
    correctly rounded on every engine, hence hash-exact vs the
    DuckDB oracle with no rounding tolerance (the repo's exactness
    discipline; ln(x) agrees only to ~1 ulp across libm
    implementations). Cross-term order differs from the ln variant
    only where ln's compression would demote a high-tf common term —
    acceptable for a fingerprint, and swapping in log_score =
    tf * ln((N+1)/(df+1)) is a one-line change where exact oracle
    parity isn't required.

    Plan: explode -> (id, term) counts (one shuffle, map-side
    combine); doc-frequency rollup over that frame (second shuffle
    at vocabulary grain); the corpus size N broadcasts as a 1-row
    literal join; top-k per doc is a window over the (id, term)
    frame partitioned BY DOCUMENT — every partition sorts only its
    own terms, nothing global. Text never shuffles; only (id, term,
    counts) rows move."""
    from pyspark.sql import Window

    toks = tokenize(F.col(text_col))
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # doc_freq as an unordered window COUNT over term — NOT a
    # groupBy + self-join, which would plan a second scan+explode of
    # the whole corpus (Catalyst does not deduplicate the shared tf
    # subtree; verified on the executed plan). This way the text is
    # read and exploded exactly once and the (doc, term, tf) frame
    # shuffles once on term. n_docs comes from a doc-id-only scan
    # (column-pruned) broadcast as one literal row.
    docfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    n_docs = df.select(
        F.count(F.lit(1)).alias("__n_docs")
    )
    scored = (
        tf.withColumn("doc_freq", docfreq)
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "doc_freq",
            (
                (F.col("tf") * (F.col("__n_docs") + 1)).cast("double")
                / (F.col("doc_freq") + 1).cast("double")
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= k)
    )


def pack_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_col: str = "source",
    seq_tokens: int = 256,
) -> DataFrame:
    """Concatenate-and-chop sequence packing plan — the GPT-style
    pretraining batcher: within each stream, documents concatenate
    in id order into one token tape that is cut every ``seq_tokens``
    tokens; a document records which training sequence its first
    token lands in, which its last token lands in (docs straddle
    cuts, exactly as real packing does), and its offset inside the
    first sequence. Complements chunk_plan (per-doc chunking): this
    is the cross-document packing that wastes no pad tokens.

    Plan: one integer running SUM over a window partitioned by
    stream, ordered by id — each stream's prefix sums compute inside
    its own partition, so parallelism = number of streams (shard the
    stream key, e.g. (source, day), when a single stream outgrows a
    reducer; offsets then chain per shard). All arithmetic is
    BIGINT-exact: no tolerance anywhere."""
    from pyspark.sql import Window

    n_tok = F.size(tokenize(F.col(text_col))).cast("long")
    base = df.select(
        F.col(id_col), F.col(stream_col), n_tok.alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("tok_offset")
    out = base.select(id_col, stream_col, "n_tok", offset)
    return out.select(
        id_col,
        stream_col,
        "n_tok",
        "tok_offset",
        F.floor(F.col("tok_offset") / seq_tokens).alias("seq_start"),
        F.floor(
            (F.col("tok_offset") + F.col("n_tok") - 1) / seq_tokens
        ).alias("seq_end"),
        (F.col("tok_offset") % seq_tokens).alias("offset_in_seq"),
    )


def collocations_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 30,
    min_count: int = 3,
) -> DataFrame:
    """Corpus-level collocation mining: top-k adjacent bigrams by
    LIFT, lift(x,y) = N * c(xy) / (c(x) * c(y)) — the same ranking
    as pointwise mutual information (PMI = log lift, a monotone
    transform), kept LOG-FREE so the score is integer-exact across
    engines: lift_bp = (N * c_xy * 10000) div (c_x * c_y), pure
    BIGINT arithmetic (the txt_tfidf_topterms trick applied to PMI).

    Plan shape: bigrams are a JVM array transform over the token
    array (no Python, text explodes only as single tokens / 2-token
    strings); unigram and bigram counts are map-side-combined hash
    aggs; the count-floored bigram table joins the (much smaller)
    vocabulary twice — AQE broadcasts when the vocab fits; top-k is
    orderBy().limit() (TakeOrderedAndProject, per-task heaps) and
    ranking windows only the k-row head — the vocab_topk discipline,
    no single-reducer sort anywhere.

    At 100 TB the BIGINT product N*c_xy*10000 needs headroom: with
    N ~ 1e12 tokens move the score to DECIMAL(38,0) (same integer
    semantics); the min_count floor already keeps the joined frame
    vocabulary-sized."""
    from pyspark.sql import Window

    toks = tokenize(F.col(text_col))
    t = df.select(toks.alias("__t"))
    bigrams = F.transform(
        F.slice(
            F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))
        ),
        lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("__t"), i + 2)),
    )
    uni = (
        t.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    big = (
        t.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    tot = uni.agg(F.sum("n_w").alias("__n_tokens"))
    parts = F.split("bigram", " ")
    scored = (
        big.withColumn("w1", F.element_at(parts, 1))
        .withColumn("w2", F.element_at(parts, 2))
        .join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            "n_xy",
            "n_w1",
            "n_w2",
            F.expr("(__n_tokens * n_xy * 10000) div (n_w1 * n_w2)").alias(
                "lift_bp"
            ),
        )
    )
    head = scored.orderBy(F.col("lift_bp").desc(), "bigram").limit(k)
    w = Window.orderBy(F.col("lift_bp").desc(), "bigram")
    return head.withColumn("rank", F.row_number().over(w).cast("int"))


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean BIGRAM log-probability with add-1 smoothing
    — the next LM up from unigram_logprob toward CCNet's 5-gram
    KenLM: p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V). Catches what the
    unigram filter cannot (every token common, the SEQUENCE wrong:
    shuffled boilerplate, keyword-stuffed spam), which is exactly
    why LM-based quality filtering moved past bag-of-words.

    Cross-engine exactness: the probability is a ratio of exact
    INTEGERS (smoothed counts), so both engines ln() the identical
    double; per-bigram logs round to 6dp, ride the exact
    DECIMAL(18,6) sum, and divide once at the end — the
    unigram_logprob discipline, conditional-probability edition.

    Scale: bigrams are a JVM array transform (the collocations
    spelling; text never explodes beyond 2-token strings); counts
    map-side combine; the doc-bigram stream joins the bigram-count
    table on the bigram key (the one unavoidable gram shuffle — the
    model table IS corpus-sized worst case) and the unigram table on
    w1 (vocabulary-sized, AQE broadcasts); V and nothing else is a
    1-row broadcast. Docs with < 2 tokens emit no row (no bigram, no
    conditional to score)."""
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    toks = tokenize(F.col(text_col))
    bigrams = F.transform(
        F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("__t"), i + 2)),
    )
    base = df.select(F.col(id_col), toks.alias("__t"))
    doc_bigrams = base.select(
        id_col, F.explode(bigrams).alias("bigram")
    )
    # Vocabulary-sized, two consumers (the __v scalar and the w1
    # join): cached so each does not re-run the corpus tokenize —
    # uncached this plan carried FOUR Generate (explode) passes over
    # documents (plans/r13/txt_bigram_logprob_before.txt).
    uni = (
        base.select(F.explode("__t").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
        .transform(tracked_cache)
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("__v"))
    big = (
        doc_bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c12"))
        .withColumn("w1", F.element_at(F.split("bigram", " "), 1))
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            F.round(
                F.log(
                    (F.col("c12") + 1).cast("double")
                    / (F.col("c1") + F.col("__v")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
    )
    return (
        doc_bigrams.join(big, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum("lp").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob_pruned(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """bigram_logprob with KenLM-style min-count pruning — the form
    that survives 100 TB. The unpruned model table is corpus-sized
    (Heaps' law: singleton bigrams grow ~linearly with the corpus,
    and they were the measured worst scale slope in the fleet,
    BENCH_SF1 4.55×); pruning bigrams with c12 < min_count bounds
    the model at the head of the distribution, and pruned/unseen
    bigrams back off to the add-1 smoothed UNIGRAM probability of
    their second word: lp = ln((c(w2)+1)/(N+V)) — KenLM's
    prune-to-backoff recipe (--prune), interpolation weights left
    out so both engines score ratios of exact integers.

    Cross-engine exactness: both the retained-bigram and the backoff
    probability are integer ratios, ln() on engine-identical
    doubles, rounded to 6dp, summed as DECIMAL(18,6), ONE division
    at the end — the house discipline.

    Scale: same join shape as the unpruned form, but the model side
    of the bigram join is now bounded (min-count filter happens
    map-side-combined BEFORE any join); the backoff join is on the
    vocabulary-sized unigram table (AQE broadcasts it). Docs with
    < 2 tokens emit no row."""
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    toks = tokenize(F.col(text_col))
    bigrams = F.transform(
        F.slice(F.col("__t"), 1, F.greatest(F.size("__t") - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("__t"), i + 2)),
    )
    base = df.select(F.col(id_col), toks.alias("__t"))
    doc_bigrams = base.select(
        id_col,
        F.explode(bigrams).alias("bigram"),
    ).withColumn("w2", F.element_at(F.split("bigram", " "), 2))
    # Vocabulary-sized with THREE consumers (tot, the model's w1
    # join, the backoff table) — uncached the corpus tokenize ran
    # SIX times in one plan (6 Generate nodes,
    # plans/r13/txt_bigram_logprob_pruned_before.txt); cached it
    # runs twice (bigram stream + this fill).
    uni = (
        base.select(F.explode("__t").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
        .transform(tracked_cache)
    )
    tot = uni.agg(
        F.count(F.lit(1)).alias("__v"),
        F.sum("c1").alias("__n"),
    )
    big = (
        doc_bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)  # the prune — before any join
        .withColumn("w1", F.element_at(F.split("bigram", " "), 1))
        .join(uni, "w1")
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram",
            F.round(
                F.log(
                    (F.col("c12") + 1).cast("double")
                    / (F.col("c1") + F.col("__v")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp_model"),
        )
    )
    backoff = (
        uni.select(F.col("w1").alias("w2"), F.col("c1").alias("c2"))
        .crossJoin(F.broadcast(tot))
        .select(
            "w2",
            F.round(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("__n") + F.col("__v")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp_backoff"),
        )
    )
    return (
        doc_bigrams.join(big, "bigram", "left")
        .join(backoff, "w2")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("lp_model").isNull(), 1).otherwise(0)
            ).alias("n_backoff"),
            (
                F.sum(F.coalesce("lp_model", "lp_backoff")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_logprob"),
        )
    )
