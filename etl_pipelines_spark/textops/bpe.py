"""Distributed BPE merge training (Sennrich et al. 2016) — the
tokenizer-training step of an LLM data pipeline, next to the token
counting / vocab-head ops in analysis.py.

Shape: BPE training operates on the WORD-FREQUENCY table, not the
corpus — so after one corpus-sized aggregation (word counts), every
merge round works on vocabulary-sized data:

  1. corpus → (word, n) counts: ONE shuffle over tokens, the only
     corpus-sized step. 100 TB of text collapses to a vocab of
     10⁵-10⁷ rows.
  2. per round: explode adjacent symbol pairs from each word's
     current symbol sequence (zip_with against its own 1-shift —
     narrow), weighted-count pairs (vocab-sized shuffle), take the
     argmax pair with a deterministic tie-break (count desc, then
     pair lexicographic), and apply the merge to every word's
     symbol sequence (greedy left-to-right, an Arrow map over the
     vocab).

Only the winning pair (a 2-string row) ever reaches the driver per
round — the model, not the data. Rounds are Spark jobs over the
cached vocab frame; lineage is truncated per round with
localCheckpoint (the iterative-plan rule, see
textops/dedup.neardup_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokenize


END_OF_WORD = "</w>"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus → (word, n): the single corpus-sized aggregation."""
    return (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into characters + the end-of-word marker —
    the classic BPE starting alphabet."""
    return words.select(
        F.concat(
            F.split(F.col("word"), ""),
            F.array(F.lit(END_OF_WORD)),
        ).alias("symbols"),
        "n",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts: zip_with the symbol array
    against its own 1-shift (narrow, the shingles idiom), explode,
    and sum word frequencies per pair. Shuffle rows are
    (pair, partial count) at vocabulary scale."""
    pairs = F.filter(
        F.zip_with(
            F.col("symbols"),
            F.slice(
                F.col("symbols"),
                2,
                F.greatest(F.size("symbols") - 1, F.lit(0)),
            ),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
        lambda p: p["b"].isNotNull(),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (a, b) → a+b in every
    word's symbol sequence — an Arrow map over the vocab frame (the
    overlapping-adjacency collapse is inherently sequential per
    word, which array expressions can't express; the vocab is the
    SMALL table, so Python here costs nothing at corpus scale)."""
    import pandas as pd

    merged = a + b

    def gen(batches):
        for pdf in batches:
            out = []
            for syms in pdf["symbols"]:
                syms = list(syms)
                res = []
                i = 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"symbols": out, "n": pdf["n"]})

    return vocab.mapInPandas(gen, schema="symbols array<string>, n long")


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> "list[tuple[str, str]]":
    """Learn the first n_merges BPE merge rules from the corpus.
    Deterministic: ties break by (count desc, pair lexicographic).
    Returns the ordered merge list — the tokenizer model."""
    vocab = _initial_symbols(_word_counts(df, text_col)).localCheckpoint()
    merges: "list[tuple[str, str]]" = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
    return merges


SEP = "~"
EOW = "#"
WBOUND = "|"

#: A fixed, data-independent merge table for the oracle-checked
#: corpus encoder (same swap-the-model relationship as
#: similarity.fixed_ivf_centroids vs the k-means trainer): common
#: English merges, in rank order, including second-order merges
#: (t+h, then th+e) and end-of-word merges (the+#) so the ordered
#: application and the word-final mechanics are both exercised.
FIXED_MERGES: "list[tuple[str, str]]" = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("a", "t"),
    ("e", "n"),
    ("o", "r"),
    ("an", "d"),
    ("in", "g"),
    ("the", EOW),
    ("and", EOW),
    ("er", EOW),
    ("ing", EOW),
]


def bpe_corpus_token_stats(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge table to the WHOLE corpus and count the
    resulting BPE tokens per document — the tokenizer-APPLICATION
    step (bpe_train learns the model; this runs it at corpus scale
    for token accounting / sequence budgeting).

    Spark-first trick: BPE encoding is "apply each merge rule, in
    rank order, to every adjacent symbol pair" — and with symbols
    spelled as ``~sym~`` in a flat string, one merge rule IS one
    literal string replace (``~a~~b~`` → ``~ab~``). Both engines'
    replace() scans left-to-right non-overlapping and resumes after
    the replacement, which is exactly the greedy adjacent-merge
    semantics of bpe_encode_word (property-tested). Each symbol
    keeps its own delimiters, so a replace can never match across a
    symbol boundary (``~ab~~c~`` does not contain ``~b~~c~``), and
    the unwrapped word boundary ``|`` stops cross-word merges.

    The whole encoder is therefore a chain of JVM string expressions
    — no Python workers, no shuffle, scan-speed at 100 TB — and the
    oracle is the same chain in DuckDB. Pipeline per document:
    lowercase → strip to [a-z ] → squeeze/trim → mark word ends with
    the end-of-word symbol ``#`` → wrap chars → apply merges →
    count: n_tokens = wrapped-symbol count, n_words = boundary
    count.
    """
    s = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", ""),
            " +",
            " ",
        )
    )
    s = F.when(F.length(s) > 0, F.concat(s, F.lit(" "))).otherwise(F.lit(""))
    s = F.regexp_replace(s, "(.)", f"{SEP}$1{SEP}")
    s = F.replace(
        s, F.lit(f"{SEP} {SEP}"), F.lit(f"{SEP}{EOW}{SEP}{WBOUND}")
    )
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
            F.lit(f"{SEP}{a}{b}{SEP}"),
        )
    n_sep = F.length(s) - F.length(F.replace(s, F.lit(SEP), F.lit("")))
    n_words = (
        F.length(s) - F.length(F.replace(s, F.lit(WBOUND), F.lit("")))
    ).cast("int")
    n_tokens = (n_sep / F.lit(2)).cast("long")
    avg = F.when(
        n_words > 0,
        F.round(n_tokens.cast("double") / n_words.cast("double"), 6),
    )
    return df.select(
        id_col,
        n_words.alias("n_words"),
        n_tokens.alias("n_tokens"),
        avg.alias("tokens_per_word"),
    )


def bpe_token_stats_oracle_sql(
    merges: "list[tuple[str, str]]",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for bpe_corpus_token_stats: the identical
    wrap-then-replace chain (replace() semantics match), with the
    merge table inlined as nested replace calls in rank order."""
    enc = (
        f"replace(regexp_replace(CASE WHEN length(s) > 0 "
        f"THEN s || ' ' ELSE '' END, '(.)', '{SEP}\\1{SEP}', 'g'), "
        f"'{SEP} {SEP}', '{SEP}{EOW}{SEP}{WBOUND}')"
    )
    for a, b in merges:
        enc = (
            f"replace({enc}, '{SEP}{a}{SEP}{SEP}{b}{SEP}', "
            f"'{SEP}{a}{b}{SEP}')"
        )
    return f"""
WITH s0 AS (
  SELECT {id_col},
    trim(regexp_replace(regexp_replace(lower({text_col}),
      '[^a-z ]', '', 'g'), ' +', ' ', 'g')) AS s
  FROM {table}
),
enc AS (
  SELECT {id_col}, {enc} AS s FROM s0
)
SELECT {id_col},
  CAST(length(s) - length(replace(s, '{WBOUND}', '')) AS INT) AS n_words,
  CAST((length(s) - length(replace(s, '{SEP}', ''))) // 2 AS BIGINT) AS n_tokens,
  CASE WHEN length(s) - length(replace(s, '{WBOUND}', '')) > 0 THEN
    round(CAST((length(s) - length(replace(s, '{SEP}', ''))) // 2 AS DOUBLE)
      / (length(s) - length(replace(s, '{WBOUND}', ''))), 6)
  END AS tokens_per_word
FROM enc
ORDER BY {id_col}
"""


def bpe_encode_word(word: str, merges: "list[tuple[str, str]]") -> "list[str]":
    """Driver-side reference encoder: apply the learned merges in
    order to one word (test oracle for the distributed trainer)."""
    syms = list(word) + [END_OF_WORD]
    for a, b in merges:
        res = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms
