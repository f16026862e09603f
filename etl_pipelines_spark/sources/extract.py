"""Extract connectors: SQL pull, paged REST export, scraped
collection feeds, SFTP-style file exchange (SURVEY.md §2.1 S7-S10).

The reference runs these driver-side in Airflow workers — they are
API/SFTP-bound, not data-bound, and feed *curated-scale* inputs
(thousands-to-millions of rows) into the warehouse. We keep that
split: the transport is an injected callable/protocol (tests use
local fakes; production wraps requests / paramiko / a JDBC driver),
and the moment bytes exist the data goes to Spark with an EXPLICIT
schema and lands as partitioned parquet, so everything downstream is
scan-prunable. Nothing here sits on the 100 TB path — the big data
always arrives via S1/S2/S6 file scans.

Reference shapes:
- S7 SQL pull: pd.read_sql into pandas, zero-row early exit
  (data-airflow-prod/business_logic/reverse_etl/braze/
  custom_attributes/custom_attributes.py:44-55;
  ds-airflow-prod/business_logic/churn_prediction/logic.py:16-28).
- S8 paged/bulk REST export → S3 staging
  (data-airflow-prod/dags/voucherify/voucherify_ingestion.py:40-64;
  business_logic/pricing_apis/collections.py).
- S9 scraper collection feeds: pick the newest date-stamped CSV from
  a drop bucket, staleness-gated
  (business_logic/mozenda/amazon.py:6-14 —
  `get_latest_data_available_from_bucket(file_name_pattern=
  'price-collection-amazon-Default-YYYY-MM-DD.csv', days_threshold=4)`).
- S10 SFTP exchange: list/get remote grading files, push exports back
  (business_logic/recommerce/ingram_micro/
  send_order_grading_status.py:12,63-70).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence
from dataclasses import dataclass
from datetime import date, timedelta
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# ---------------------------------------------------------------- S7

ExecuteSql = Callable[[str], "Any"]  # str -> pandas.DataFrame


def sql_pull(
    spark: SparkSession,
    sql: str,
    execute: ExecuteSql,
    schema: StructType | str | None = None,
) -> DataFrame | None:
    """S7: SQL pull into a DataFrame via an injected executor.

    `execute` returns a pandas DataFrame (tests inject
    ``lambda q: duckdb.sql(q).df()``; production wraps
    `spark.read.jdbc` or a SQLAlchemy engine like
    custom_attributes.py:47-49). Returns None on zero rows — the
    reference's early-exit contract ("exits if this is the case",
    custom_attributes.py:30-33) so callers can skip the downstream
    write instead of overwriting staging with an empty table.
    """
    pdf = execute(sql)
    if pdf.shape[0] == 0:
        return None
    if schema is not None:
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)


def jdbc_pull(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    options: "dict[str, str] | None" = None,
) -> DataFrame:
    """S7 through Spark's REAL JDBC source (upgrades the injected-
    executor form above from shape-faithful to wire-faithful; proven
    in-repo against the embedded Derby engine Spark ships —
    tests/test_sources.py::TestJdbcDerby — production swaps the URL/
    driver for Postgres/Redshift/MySQL, same code path).

    ``table`` may be a table name OR a pushdown subquery
    ``"(SELECT ...) AS src"`` — the reference's extract SQL runs
    database-side either way, and Catalyst additionally pushes
    filters/column pruning into the JDBC scan (PushedFilters shows
    in the plan; test-asserted).

    100 TB posture: a single-connection JDBC read is one executor
    doing all the work. ``partition_column``+bounds+``num_partitions``
    split the pull into N concurrent range queries (Spark's stride
    partitioning) — the knob the reference's pandas `pd.read_sql`
    never had; for tables without a numeric key, pass
    ``options={"fetchsize": ...}`` and land once, then let the
    warehouse re-partition."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load()


def jdbc_push(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "overwrite",
    options: "dict[str, str] | None" = None,
) -> None:
    """Reverse-ETL companion to jdbc_pull: land a DataFrame in an
    RDBMS table through Spark's JDBC sink (executor-parallel INSERT
    batches; `batchsize` in options tunes round trips)."""
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
    )
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save()


# ---------------------------------------------------------------- S8

# fetch(cursor) -> (rows, next_cursor); next_cursor None = done.
FetchPage = Callable[[Any], tuple[Sequence[dict], Any]]


def paged_api_extract(
    spark: SparkSession,
    fetch_page: FetchPage,
    schema: StructType | str,
    first_cursor: Any = None,
    max_pages: int = 10_000,
) -> DataFrame:
    """S8: cursor-paged REST bulk export → DataFrame.

    Pages are pulled driver-side (the API is the bottleneck, exactly
    as in voucherify_ingestion.py:40-58's PythonOperator pulls) and
    assembled under an EXPLICIT schema — raw API payloads never get
    schema inference, which both flakes (field present only on page
    17) and costs an extra pass at scale. `max_pages` is the runaway
    guard the reference gets from task execution_timeouts
    (voucherify_ingestion.py:27).
    """
    rows: list[dict] = []
    cursor = first_cursor
    for _ in range(max_pages):
        page, cursor = fetch_page(cursor)
        rows.extend(page)
        if cursor is None:
            break
    else:
        raise RuntimeError(f"pagination did not terminate in {max_pages} pages")
    return spark.createDataFrame(rows, schema=schema)


# ---------------------------------------------------------------- S9


class StaleFeedError(RuntimeError):
    """Newest collection file is older than the freshness threshold."""


@dataclass
class CollectionFile:
    path: str
    stamp: date


def latest_collection_file(
    listing: Sequence[str],
    prefix: str,
    suffix: str,
    run_date: date,
    days_threshold: int = 4,
) -> CollectionFile:
    """S9: pick the newest date-stamped scraper drop, staleness-gated.

    Mirrors mozenda_utils.get_latest_data_available_from_bucket
    (mozenda/amazon.py:6-14): files are named
    ``{prefix}YYYY-MM-DD{suffix}``; choose the max date ≤ run_date,
    and fail the run if it is more than `days_threshold` days old —
    a silent stale price feed is worse than a loud missing one.
    `run_date` is injected (never wall-clock) per the engine's
    determinism rule.
    """
    best: CollectionFile | None = None
    for p in listing:
        name = os.path.basename(p)
        if not (name.startswith(prefix) and name.endswith(suffix)):
            continue
        stamp_s = name[len(prefix) : len(name) - len(suffix)]
        try:
            stamp = date.fromisoformat(stamp_s)
        except ValueError:
            continue
        if stamp <= run_date and (best is None or stamp > best.stamp):
            best = CollectionFile(p, stamp)
    if best is None:
        raise StaleFeedError(f"no {prefix}*{suffix} file at or before {run_date}")
    if best.stamp < run_date - timedelta(days=days_threshold):
        raise StaleFeedError(
            f"newest drop {best.path} is {best.stamp}, older than "
            f"{days_threshold}d before run_date {run_date}"
        )
    return best


# --------------------------------------------------------------- S10


class FileExchange(Protocol):
    """SFTP-shaped transport (SFTPHook surface the reference uses:
    list_directory / retrieve_file / store_file,
    send_order_grading_status.py:63-70)."""

    def list_directory(self, remote_dir: str) -> list[str]: ...

    def retrieve_file(self, remote_path: str, local_path: str) -> None: ...

    def store_file(self, local_path: str, remote_path: str) -> None: ...


class LocalDirExchange:
    """Local-directory fake of an SFTP server (tests + local runs)."""

    def __init__(self, root: str):
        self.root = root

    def _abs(self, p: str) -> str:
        return os.path.join(self.root, p.lstrip("/"))

    def list_directory(self, remote_dir: str) -> list[str]:
        d = self._abs(remote_dir)
        return sorted(os.listdir(d)) if os.path.isdir(d) else []

    def retrieve_file(self, remote_path: str, local_path: str) -> None:
        shutil.copyfile(self._abs(remote_path), local_path)

    def store_file(self, local_path: str, remote_path: str) -> None:
        dst = self._abs(remote_path)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(local_path, dst)


def ingest_exchange_files(
    spark: SparkSession,
    exchange: FileExchange,
    remote_dir: str,
    staging_dir: str,
    schema: StructType | str,
    suffix: str = ".csv",
    sep: str = ";",
    header: bool = True,
) -> tuple[DataFrame | None, list[str]]:
    """S10 inbound: pull every `suffix` file from the exchange into a
    local staging dir, then read the whole directory as ONE Spark csv
    scan (explicit schema). Returns (df, ingested_names); (None, [])
    when the remote side has nothing — callers skip the load, like
    the reference skips empty grading batches."""
    os.makedirs(staging_dir, exist_ok=True)
    names = [n for n in exchange.list_directory(remote_dir) if n.endswith(suffix)]
    for n in names:
        exchange.retrieve_file(os.path.join(remote_dir, n), os.path.join(staging_dir, n))
    if not names:
        return None, []
    df = (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", header)
        .csv(staging_dir)
    )
    return df, names


def send_exchange_export(
    df: DataFrame,
    exchange: FileExchange,
    remote_path: str,
    scratch_dir: str,
    sep: str = ";",
) -> str:
    """S10 outbound: export `df` as ONE csv file (these are
    recon/grading files measured in KB — coalesce(1) is the point,
    not a bottleneck) and store it on the exchange."""
    out_dir = os.path.join(scratch_dir, "export.csv.dir")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("sep", sep)
        .option("header", True)
        .csv(out_dir)
    )
    part = next(
        f for f in sorted(os.listdir(out_dir)) if f.startswith("part-") and f.endswith(".csv")
    )
    exchange.store_file(os.path.join(out_dir, part), remote_path)
    return remote_path
