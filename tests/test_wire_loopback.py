"""Wire-protocol loopback e2e (r12 verdict item 6): this repo ships BOTH
a pg-wire *client* (sources/pgwire.py — the no-JDBC-jars path for
``postgres://`` table sources, reference semantics columnq/src/table/
database.rs:37-73) and a pg-wire *server* (server/postgres.py). The
sandbox has no live Postgres (reference CI boots one —
.github/workflows/build.yml), so the client was previously tested only
against scripted byte exchanges. Running our client against our server
closes the interop loop with zero external dependencies: every byte the
client sends must be parsed by a real protocol implementation and vice
versa, over a real socket, including the full table-source load path
(load_table -> wire read -> Arrow -> DataFrame).
"""

from __future__ import annotations

import pytest

from roapi_spark.catalog import Catalog
from roapi_spark.config import parse_table_config
from roapi_spark.server.postgres import PostgresServer
from tests.conftest import spark  # noqa: F401


@pytest.fixture()
def pg_loop(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pgloop")
    (root / "inv.csv").write_text(
        "id,name,qty\n1,widget,10\n2,gadget,0\n3,gizmo,7\n"
    )
    cat = Catalog(spark)
    cat.load_table(
        parse_table_config({"name": "inv", "uri": str(root / "inv.csv")})
    )
    server = PostgresServer(cat)
    server.start()
    yield server
    server.stop()


def test_pgwire_client_against_our_server(pg_loop):
    """Raw client query: typed decode (int8 via oid 20) must round-trip
    through the server's RowDescription/DataRow encoding."""
    from roapi_spark.sources.pgwire import PgWireClient

    c = PgWireClient("127.0.0.1", pg_loop.port, user="t", database="t")
    try:
        res = c.query(
            "SELECT id, name, qty FROM inv WHERE qty > 0 ORDER BY id"
        )
    finally:
        c.close()
    assert res.columns == ["id", "name", "qty"]
    assert res.rows == [[1, "widget", 10], [3, "gizmo", 7]]
    # ints decoded as ints (oid-driven), not strings
    assert all(isinstance(r[0], int) for r in res.rows)


def test_pg_table_source_load_through_loopback(spark, pg_loop):
    """The full S10 path: a postgres:// TableSource resolves through the
    wire-client fallback against OUR server and lands as a DataFrame
    whose values match the catalog's own view of the table."""
    from roapi_spark.sources import load_table

    ts = parse_table_config(
        {
            "name": "inv",
            "uri": f"postgres://t@127.0.0.1:{pg_loop.port}/t",
            "option": {"format": "postgres", "table": "inv"},
        }
    )
    df = load_table(spark, ts)
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        tuple(r) for r in pg_loop.catalog.table("inv").collect()
    )
    assert got == want
    assert df.columns == ["id", "name", "qty"]


def test_pgwire_client_custom_query_and_error(pg_loop):
    """A custom SQL through read_table, and a server-side error must
    surface as PgWireError (not a hang or a silent empty result)."""
    from roapi_spark.sources.pgwire import (
        PgWireClient,
        PgWireError,
        read_table,
    )

    res = read_table(
        f"postgres://t@127.0.0.1:{pg_loop.port}/t",
        "inv",
        sql="SELECT sum(qty) AS total FROM inv",
    )
    assert res.columns == ["total"] and res.rows == [[17]]

    c = PgWireClient("127.0.0.1", pg_loop.port, user="t", database="t")
    try:
        with pytest.raises(PgWireError):
            c.query("SELECT * FROM no_such_table")
        # the connection must survive the error (ReadyForQuery resync)
        res = c.query("SELECT count(*) AS n FROM inv")
        assert res.rows == [[3]]
    finally:
        c.close()


def test_pg_complex_and_binary_values_render_as_data_not_reprs(pg_loop, spark):
    """collect() yields bytearray for BinaryType and Row for structs;
    pg text format must carry \\x-hex / JSON text, never Python reprs."""
    import json

    from roapi_spark.sources.pgwire import PgWireClient

    spark.sql(
        "SELECT cast('abc' as binary) AS b, array('x', 'y') AS arr, "
        "named_struct('k', 7) AS st"
    ).createOrReplaceTempView("pgcplx")  # catalog shares this session
    c = PgWireClient("127.0.0.1", pg_loop.port, user="t", database="t")
    try:
        res = c.query("SELECT b, arr, st FROM pgcplx")
    finally:
        c.close()
    (b, arr, st), = res.rows
    assert b == bytes.fromhex("616263") or b == "\\x616263", (
        f"bytea must be hex-escaped payload, got {b!r}"
    )
    assert json.loads(arr) == ["x", "y"]
    assert json.loads(st) == {"k": 7}
