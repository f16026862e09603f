"""CLI entry point (python -m etl_pipelines_spark)."""

from __future__ import annotations

from etl_pipelines_spark.__main__ import main


class TestCli:
    def test_list_covers_registry(self, capsys):
        from etl_pipelines_spark.queries import REGISTRY

        assert main(["list"]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == len(REGISTRY)
        assert any("oracle" in line for line in out)

    def test_run_unknown_query_fails_cleanly(self, capsys):
        assert main(["run", "no_such_query"]) == 2

    def test_run_query_prints_rows(self, spark, sf_dir, capsys):
        rc = main([
            "run", "q1_pricing_summary", "--sf", sf_dir, "--limit", "2"
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "l_returnflag" in out and "2 row(s) shown" in out

    def test_rebuild_into_tmp(self, spark, sf_dir, tmp_path, capsys):
        rc = main(["rebuild", "--sf", sf_dir, "--out", str(tmp_path / "wh")])
        assert rc == 0
        out = capsys.readouterr().out
        assert "0 failed" in out
