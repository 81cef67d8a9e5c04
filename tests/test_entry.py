"""Smoke tests for the driver contract in __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["month", "mau"]


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0


def test_cli_list_and_run(spark, sf_smoke, capsys):
    """CLI surface: list names every registered query; run executes
    one against a fixture dir (reuses the session fixture's JVM)."""
    from programmers_data_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "mau" in out and "oracle" in out

    assert main(["--sf-dir", sf_smoke, "run", "dau", "-n", "2"]) == 0
    assert "dau" in capsys.readouterr().out

    assert main(["--sf-dir", sf_smoke, "explain", "mau"]) == 0
    assert "Physical Plan" in capsys.readouterr().out

    assert main(["--sf-dir", sf_smoke, "run", "nope"]) == 2
