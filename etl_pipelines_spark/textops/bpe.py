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
