"""Deterministic sampling / splitting for training-data pipelines.

Spark's native `sample()` / `randomSplit()` draw from a per-partition
RNG: results change with partitioning, retries, and cluster layout —
unacceptable for train/val/test splits that must be reproducible
across runs and engines. The scalable idiom is HASH-MOD assignment:
bucket = md5(stable_key) mod N. Properties:

- deterministic: a document's split NEVER changes, regardless of
  partitioning, cluster size, engine, or what other rows exist;
- stable under growth: adding documents never moves existing ones
  between splits (the property Bernoulli sampling lacks);
- narrow: a per-row expression, no shuffle, no state;
- cross-engine exact: md5 is md5 everywhere, so the DuckDB oracle
  reproduces the assignment bit-for-bit.

`stratified_take` adds per-group quotas (e.g. N docs per language)
with hash-order ranking — deterministic "random" within each group,
one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 8 md5 hex chars
    of the key's string form, mod n. 32 bits of hash is plenty for
    split assignment and keeps the arithmetic exact in a BIGINT."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % n_buckets


def with_split(
    df: DataFrame,
    key: str,
    train_pct: int = 90,
    val_pct: int = 5,
    split_col: str = "split",
) -> DataFrame:
    """train/val/test assignment by hash-mod percentile: buckets
    [0, train) -> train, [train, train+val) -> val, rest -> test."""
    b = hash_bucket(F.col(key))
    return df.withColumn(
        split_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def hash_sample(df: DataFrame, key: str, pct: int) -> DataFrame:
    """Deterministic pct% sample: keep rows whose bucket < pct."""
    return df.filter(hash_bucket(F.col(key)) < pct)


def source_mix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.7,
    budget_num: int = 3,
    budget_den: int = 10,
) -> DataFrame:
    """Temperature-weighted source mixing — the corpus-reweighting
    step behind multi-source pretraining mixes (the n_s^α sampling
    rule of GPT-3 / multilingual data balancing, α<1 up-weights small
    sources): compute per-source sampling weights w_s = n_s^α / Σ
    n_s^α over token counts, turn a token budget (budget_num/
    budget_den of the corpus) into a per-source keep fraction, and
    realize it with the engine's deterministic md5 hash-mod sampler —
    so the selected subset is reproducible across runs, engines and
    partitionings.

    Cross-engine exactness: n_s^α is rounded to 6dp and summed as
    DECIMAL (order-independent); the budget is integer arithmetic;
    keep fractions become integer basis points before the bucket
    comparison.

    Scale: doc-grain work is two narrow projections + two hash aggs
    keyed by source; the per-source mix table (|sources| rows)
    broadcasts back onto the corpus for the keep filter. Text never
    shuffles.

    Returns one row per source: n_docs, n_tokens, weight, keep_bp,
    n_docs_kept, n_tokens_kept."""
    from .analysis import tokenize

    stats = df.select(
        F.col(source_col),
        F.col(id_col),
        F.size(tokenize(F.col(text_col))).cast("long").alias("__ntok"),
    )
    per_src = stats.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__ntok").alias("n_tokens"),
    )
    pw = per_src.withColumn(
        "__pw",
        F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)), 6)
        .cast("decimal(28,6)"),
    )
    tot = pw.agg(
        F.sum("n_tokens").alias("__total"), F.sum("__pw").alias("__z")
    )
    target = (F.col("__total") * budget_num).cast("bigint") / F.lit(
        budget_den
    )
    mix = pw.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        "n_tokens",
        (F.col("__pw").cast("double") / F.col("__z").cast("double")).alias(
            "weight"
        ),
        F.floor(
            F.least(
                F.lit(1.0),
                (
                    F.floor(target).cast("double")
                    * (
                        F.col("__pw").cast("double")
                        / F.col("__z").cast("double")
                    )
                )
                / F.col("n_tokens").cast("double"),
            )
            * 10000
        )
        .cast("int")
        .alias("keep_bp"),
    )
    kept = (
        stats.join(
            F.broadcast(mix.select(source_col, "keep_bp")), source_col
        )
        .filter(hash_bucket(F.col(id_col), 10000) < F.col("keep_bp"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("__ntok").alias("n_tokens_kept"),
        )
    )
    return mix.join(F.broadcast(kept), source_col, "left").select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round("weight", 6).alias("weight"),
        "keep_bp",
        F.coalesce("n_docs_kept", F.lit(0)).alias("n_docs_kept"),
        F.coalesce("n_tokens_kept", F.lit(0)).alias("n_tokens_kept"),
    )


def stratified_take(
    df: DataFrame,
    group_col: str,
    key: str,
    n_per_group: int,
) -> DataFrame:
    """Up to n rows per group, chosen by hash order (deterministic
    'random'): rank within group by (md5(key), key) and keep rank <=
    n. One shuffle on the group key; the md5 tiebreak makes the
    selection independent of insertion or storage order."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_group)
        .drop("__rk")
    )


def weighted_sample_topk(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic WEIGHTED sampling — bottom-k priority sampling
    (the Rosén / priority-sample family): each row gets priority
    u/w where u = its 32-bit md5 hash (the deterministic stand-in
    for a uniform draw, the same hash-mod philosophy as with_split)
    and w = its weight; the k SMALLEST priorities win, so inclusion
    odds grow with weight while the selection stays reproducible
    across runs, engines, partitionings and insertion order —
    everything Bernoulli/reservoir sampling is not.

    Exactness: u and w are integers; the ordering key u/w is ONE
    IEEE division of two exact integers, identical in any engine,
    with (key) as the total-order tie-break. Scale: priorities are
    per-row expressions; top-k is orderBy().limit() —
    TakeOrderedAndProject per-task heaps, no global sort exchange.

    Zero/negative weights are excluded (a zero-weight row must never
    be sampled; guarding also keeps the division total)."""
    u = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    pri = u.cast("double") / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__priority", pri)
        .orderBy("__priority", key)
        .limit(k)
    )
