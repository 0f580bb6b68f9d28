"""Postgres wire e2e (reference: roapi/tests/postgres_test.rs — COUNT over
pg wire). No pg client lib in this container, so the test speaks raw
protocol v3 bytes: startup -> AuthenticationOk -> Q -> RowDescription/
DataRow/CommandComplete -> ReadyForQuery."""

from __future__ import annotations

import socket
import struct

import pytest

from roapi_spark.catalog import Catalog
from roapi_spark.config import parse_table_config
from roapi_spark.server.postgres import PostgresServer


class MiniPgClient:
    def __init__(self, port: int) -> None:
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        payload = struct.pack(">I", 196608) + b"user\x00t\x00database\x00t\x00\x00"
        self.sock.sendall(struct.pack(">I", len(payload) + 4) + payload)
        msgs = self._read_until(b"Z")
        assert msgs[0][0] == b"R" and struct.unpack(">I", msgs[0][1])[0] == 0  # AuthOk

    def _recv_exact(self, n: int) -> bytes:
        data = b""
        while len(data) < n:
            chunk = self.sock.recv(n - len(data))
            if not chunk:
                raise ConnectionError("closed")
            data += chunk
        return data

    def _read_until(self, end_tag: bytes) -> list[tuple[bytes, bytes]]:
        msgs = []
        while True:
            tag = self._recv_exact(1)
            length = struct.unpack(">I", self._recv_exact(4))[0]
            payload = self._recv_exact(length - 4)
            msgs.append((tag, payload))
            if tag == end_tag:
                return msgs

    def query(self, sql: str) -> list[tuple[bytes, bytes]]:
        payload = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack(">I", len(payload) + 4) + payload)
        return self._read_until(b"Z")

    def close(self) -> None:
        self.sock.sendall(b"X" + struct.pack(">I", 4))
        self.sock.close()


def parse_data_rows(msgs):
    rows = []
    for tag, payload in msgs:
        if tag != b"D":
            continue
        (n,) = struct.unpack(">H", payload[:2])
        off, vals = 2, []
        for _ in range(n):
            (ln,) = struct.unpack(">i", payload[off : off + 4])
            off += 4
            if ln == -1:
                vals.append(None)
            else:
                vals.append(payload[off : off + ln].decode())
                off += ln
        rows.append(tuple(vals))
    return rows


@pytest.fixture(scope="module")
def pg(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pg")
    (root / "t.csv").write_text("id,name,ok\n1,alpha,true\n2,beta,false\n3,,true\n")
    cat = Catalog(spark)
    cat.load_table(parse_table_config({"name": "pgt", "uri": str(root / "t.csv")}))
    server = PostgresServer(cat)
    server.start()
    yield server
    server.stop()


def test_count_roundtrip(pg):
    c = MiniPgClient(pg.port)
    msgs = c.query("SELECT count(*) AS n FROM pgt")
    assert parse_data_rows(msgs) == [("3",)]
    # RowDescription announces int8 oid (20) for the count
    rowdesc = next(p for t, p in msgs if t == b"T")
    (oid,) = struct.unpack(">I", rowdesc[2 + len(b"n") + 1 + 6 : 2 + len(b"n") + 1 + 10])
    assert oid == 20
    c.close()


def test_types_and_nulls_as_text(pg):
    c = MiniPgClient(pg.port)
    rows = parse_data_rows(c.query("SELECT id, name, ok FROM pgt ORDER BY id"))
    assert rows == [("1", "alpha", "t"), ("2", "beta", "f"), ("3", None, "t")]
    c.close()


def test_multi_statement_and_show_set(pg):
    c = MiniPgClient(pg.port)
    msgs = c.query("SET search_path TO x; SELECT 1 AS a; SELECT 2 AS b")
    completes = [p for t, p in msgs if t == b"C"]
    assert [x.rstrip(b"\x00") for x in completes] == [b"SET", b"SELECT 1", b"SELECT 1"]
    assert parse_data_rows(msgs) == [("1",), ("2",)]
    msgs = c.query("SHOW server_version")
    assert [t for t, _ in msgs] == [b"C", b"Z"]
    c.close()


def test_error_then_recovers(pg):
    c = MiniPgClient(pg.port)
    msgs = c.query("SELECT * FROM missing_table")
    assert msgs[0][0] == b"E" and msgs[-1][0] == b"Z"
    # connection still usable
    assert parse_data_rows(c.query("SELECT 42 AS x")) == [("42",)]
    c.close()
