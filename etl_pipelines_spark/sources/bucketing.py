"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4 —
the Spark answer to Redshift DISTKEY).

The reference co-locates its big fact-fact joins by declaring
`DISTSTYLE KEY DISTKEY(customer_id)` on both tables
(Datawarehouse-ETL/3_master/DDL/customer.ddl:126-127); Redshift then
joins slice-locally. Spark's equivalent is `bucketBy`: both sides
written with the same bucket count/keys join with NO Exchange —
at 100 TB the difference between re-shuffling both fact tables
nightly and reading them pre-placed.

sortBy within buckets additionally removes the Sort from
sort-merge-join reads (the SORTKEY analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (bucket metadata lives in
    the session catalog — path-based reads can't carry it)."""
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables. With matching bucket
    spec on the join keys, the plan contains no shuffle Exchange on
    either side (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
