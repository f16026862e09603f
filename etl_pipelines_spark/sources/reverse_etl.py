"""Reverse-ETL sink: warehouse table -> chunked HTTP-ish push with an
error-threshold gate (SURVEY.md §2.1 S11).

Reference shape (data-airflow-prod/business_logic/reverse_etl/braze/
custom_attributes/custom_attributes.py:28-62): read curated rows,
chunk them, POST each chunk to an external API, count failures, and
abort the run if the failure ratio crosses a threshold.

Spark-first: the transport is an injected callable (tests use a
recording fake; production would wrap `requests`). Two execution
paths:
- driver-side (`push`): `toLocalIterator` streams partitions to the
  driver one at a time — right for the reference's curated outputs
  (thousands of rows), keeps ordering deterministic, no executor-side
  network fan-out.
- distributed (`push_distributed`): `foreachPartition` posts from
  executors — the 100 TB path; failure counts come back through a
  Spark accumulator, and the threshold check happens after the job.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame

Transport = Callable[[list[dict]], bool]  # returns success


class ErrorThresholdExceeded(RuntimeError):
    pass


@dataclass
class PushResult:
    n_rows: int
    n_chunks: int
    n_failed_chunks: int


def chunked(rows: Iterable[dict], size: int) -> Iterator[list[dict]]:
    buf: list[dict] = []
    for r in rows:
        buf.append(r)
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def push(
    df: DataFrame,
    send: Transport,
    chunk_size: int = 75,
    error_threshold: float = 0.1,
) -> PushResult:
    """Driver-side chunked push with the reference's error gate:
    if failed_chunks / total_chunks > error_threshold, raise (the
    reference aborts the DAG run the same way)."""
    n_rows = n_chunks = n_failed = 0
    for chunk in chunked(
        (row.asDict(recursive=True) for row in df.toLocalIterator()),
        chunk_size,
    ):
        n_chunks += 1
        n_rows += len(chunk)
        ok = False
        try:
            ok = send(chunk)
        except Exception:
            ok = False
        if not ok:
            n_failed += 1
    if n_chunks and n_failed / n_chunks > error_threshold:
        raise ErrorThresholdExceeded(
            f"{n_failed}/{n_chunks} chunks failed (> {error_threshold:.0%})"
        )
    return PushResult(n_rows, n_chunks, n_failed)


def push_distributed(
    df: DataFrame,
    send: Transport,
    chunk_size: int = 75,
    error_threshold: float = 0.1,
) -> PushResult:
    """Executor-side push via foreachPartition; counts travel back in
    accumulators. `send` must be picklable and idempotent-ish (Spark
    may re-run failed tasks — the same at-least-once contract the
    reference accepts from Airflow retries)."""
    sc = df.sparkSession.sparkContext
    acc_chunks = sc.accumulator(0)
    acc_failed = sc.accumulator(0)
    acc_rows = sc.accumulator(0)
    # nested re-implementation on purpose: referencing the module-level
    # chunked() would cloudpickle the closure with a by-reference import
    # of this package, which workers can't resolve when the driver runs
    # from outside the repo (no sys.path propagation to workers).
    def _chunked(rows, size):
        buf: list[dict] = []
        for r in rows:
            buf.append(r)
            if len(buf) >= size:
                yield buf
                buf = []
        if buf:
            yield buf

    def work(it):
        for chunk in _chunked((r.asDict(recursive=True) for r in it), chunk_size):
            acc_chunks.add(1)
            acc_rows.add(len(chunk))
            try:
                ok = send(chunk)
            except Exception:
                ok = False
            if not ok:
                acc_failed.add(1)

    df.foreachPartition(work)
    n_chunks, n_failed = acc_chunks.value, acc_failed.value
    if n_chunks and n_failed / n_chunks > error_threshold:
        raise ErrorThresholdExceeded(
            f"{n_failed}/{n_chunks} chunks failed (> {error_threshold:.0%})"
        )
    return PushResult(acc_rows.value, n_chunks, n_failed)
