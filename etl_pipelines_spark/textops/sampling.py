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
