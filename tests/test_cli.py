"""CLI one-shot coverage (reference: columnq-cli/src/main.rs): table and
json outputs, and the -d/--disable-read-only flag gating SQL DML (the
same flag the server exposes; the reference CLI is read-only, the DML
surface is this repo's extension)."""

from __future__ import annotations

import json
import os

import pytest

from roapi_spark import cli
from tests.conftest import spark  # noqa: F401


@pytest.fixture()
def csv_table(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,a\n2,b\n")
    return str(p)


def test_cli_one_shot_table_output(spark, csv_table, capsys):
    assert cli.main(["sql", "SELECT count(*) AS n FROM t", "-t", f"t={csv_table}"]) == 0
    out = capsys.readouterr().out
    assert "| n" in out and "| 2" in out


def test_cli_one_shot_json_output(spark, csv_table, capsys):
    assert (
        cli.main(
            ["sql", "SELECT id FROM t ORDER BY id", "-t", f"t={csv_table}",
             "-o", "json"]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert json.loads(out) == [{"id": 1}, {"id": 2}]


def test_cli_dml_requires_disable_read_only(spark, tmp_path, capsys):
    from roapi_spark.catalog import ReadOnlyError
    from roapi_spark.sinks.delta import write_delta

    d = str(tmp_path / "inv")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, name string"),
        d,
        mode="overwrite",
    )
    targ = f"inv={d},format=delta"
    with pytest.raises(ReadOnlyError):
        cli.main(["sql", "DELETE FROM inv WHERE id = 2", "-t", targ])
    # with -d the DML routes to the sink and the summary row prints
    assert cli.main(["sql", "DELETE FROM inv WHERE id = 2", "-t", targ, "-d"]) == 0
    out = capsys.readouterr().out
    assert "DELETE" in out
    assert os.path.isfile(os.path.join(d, "_delta_log", f"{1:020d}.json"))
    capsys.readouterr()
    assert cli.main(["sql", "SELECT count(*) AS n FROM inv", "-t", targ]) == 0
    assert "| 1" in capsys.readouterr().out


def test_cli_maintenance_statements(spark, tmp_path, capsys):
    """OPTIMIZE / VACUUM route through the same SQL surface the CLI
    exposes: gated by -d, summary row printed, content preserved."""
    from roapi_spark.catalog import ReadOnlyError
    from roapi_spark.sinks.delta import write_delta

    d = str(tmp_path / "mt")
    write_delta(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20)], "id bigint, v double"
        ).repartition(4),
        d,
        mode="overwrite",
    )
    targ = f"mt={d},format=delta"
    with pytest.raises(ReadOnlyError):
        cli.main(["sql", "OPTIMIZE mt", "-t", targ])
    assert cli.main(["sql", "OPTIMIZE mt ZORDER BY (id, v)", "-t", targ, "-d"]) == 0
    assert "OPTIMIZE" in capsys.readouterr().out
    assert cli.main(
        ["sql", "VACUUM mt RETAIN 168 HOURS", "-t", targ, "-d", "-o", "json"]
    ) == 0
    row = json.loads(capsys.readouterr().out)[0]
    assert row["operation"] == "VACUUM" and row["files_deleted"] == 0
    assert cli.main(
        ["sql", "VACUUM mt RETAIN 1 VERSIONS", "-t", targ, "-d", "-o", "json"]
    ) == 0
    row = json.loads(capsys.readouterr().out)[0]
    assert row["operation"] == "VACUUM" and row["files_deleted"] >= 1
    capsys.readouterr()
    assert cli.main(["sql", "SELECT count(*) AS n FROM mt", "-t", targ]) == 0
    assert "| 20" in capsys.readouterr().out


def test_cli_stdin_csv(spark, capsys, monkeypatch):
    """S11 stdin source end-to-end (reference: parse_table_uri_arg's
    'stdin' branch, columnq/src/table/mod.rs:888-896): bytes piped on
    stdin land as a queryable table, dispatched by the declared format."""
    import io

    monkeypatch.setattr(
        "sys.stdin", io.TextIOWrapper(io.BytesIO(b"id,name\n1,a\n2,b\n3,c\n"))
    )
    assert (
        cli.main(
            [
                "sql",
                "SELECT count(*) AS n, max(id) AS mx FROM t",
                "-t",
                "t=stdin,format=csv",
            ]
        )
        == 0
    )
    out = capsys.readouterr().out
    assert "| 3" in out and "| 2 " not in out.split("\n")[3]


def test_cli_stdin_json(spark, capsys, monkeypatch):
    """stdin with format=json (NDJSON body) and the '-' alias."""
    import io

    monkeypatch.setattr(
        "sys.stdin",
        io.TextIOWrapper(io.BytesIO(b'{"id": 1, "v": "x"}\n{"id": 2, "v": "y"}\n')),
    )
    assert (
        cli.main(
            [
                "sql",
                "SELECT id FROM j ORDER BY id",
                "-t",
                "j=-,format=ndjson",
                "-o",
                "json",
            ]
        )
        == 0
    )
    assert json.loads(capsys.readouterr().out) == [{"id": 1}, {"id": 2}]


def test_cli_stdin_requires_format(spark):
    """Missing format is a loud ConfigError (sources/stdin.py): there are
    no bytes to sniff a format from before consuming the pipe."""
    from roapi_spark.config import ConfigError

    with pytest.raises(ConfigError, match="format"):
        cli.main(["sql", "SELECT 1", "-t", "t=stdin"])
