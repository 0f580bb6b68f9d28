"""Minimal Postgres wire-protocol v3 *client* — the no-JDBC-jars path for
``postgres://`` table sources.

The reference loads database tables by a full-table ``SELECT *`` through
ConnectorX into memory (``columnq/src/table/database.rs:37-73``); this
client gives the same semantics with zero dependencies: startup,
cleartext/md5 password auth, one simple query ('Q'), text-format result
decode by type OID. Big tables on a real cluster should use the Spark
JDBC path (parallel partitioned reads) — this is the fallback, and the
driver-side read is bounded by the same whole-table materialization the
reference does.
"""

from __future__ import annotations

import hashlib
import socket
import struct
from dataclasses import dataclass
from datetime import date, datetime
from typing import Any
from urllib.parse import unquote, urlparse


class PgWireError(RuntimeError):
    pass


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


@dataclass
class PgResult:
    columns: list[str]
    oids: list[int]
    rows: list[list[Any]]


_BOOL_OID = 16
_INT_OIDS = {20, 21, 23, 26}
_FLOAT_OIDS = {700, 701, 1700}
_DATE_OID = 1082
_TS_OIDS = {1114, 1184}


def _decode(raw: bytes | None, oid: int) -> Any:
    if raw is None:
        return None
    text = raw.decode()
    if oid == _BOOL_OID:
        return text == "t"
    if oid in _INT_OIDS:
        return int(text)
    if oid in _FLOAT_OIDS:
        return float(text)
    if oid == _DATE_OID:
        return date.fromisoformat(text)
    if oid in _TS_OIDS:
        return datetime.fromisoformat(text.replace(" ", "T").split("+")[0])
    return text


class PgWireClient:
    """One connection, simple-query protocol only."""

    def __init__(
        self,
        host: str,
        port: int,
        user: str = "spark",
        password: str = "",
        database: str = "postgres",
        timeout: float = 30.0,
    ) -> None:
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.user, self.password = user, password
        params = _cstr("user") + _cstr(user) + _cstr("database") + _cstr(database) + b"\x00"
        payload = struct.pack(">I", 196608) + params
        self.sock.sendall(struct.pack(">I", len(payload) + 4) + payload)
        self._auth()

    def _recv_exact(self, n: int) -> bytes:
        data = b""
        while len(data) < n:
            chunk = self.sock.recv(n - len(data))
            if not chunk:
                raise PgWireError("server closed connection")
            data += chunk
        return data

    def _read_msg(self) -> tuple[bytes, bytes]:
        tag = self._recv_exact(1)
        (length,) = struct.unpack(">I", self._recv_exact(4))
        return tag, self._recv_exact(length - 4)

    def _send(self, tag: bytes, payload: bytes) -> None:
        self.sock.sendall(tag + struct.pack(">I", len(payload) + 4) + payload)

    @staticmethod
    def _error_text(payload: bytes) -> str:
        # ErrorResponse: (code byte, cstr) fields until \x00; 'M' = message
        fields = {}
        i = 0
        while i < len(payload) and payload[i] != 0:
            code = chr(payload[i])
            end = payload.index(b"\x00", i + 1)
            fields[code] = payload[i + 1 : end].decode(errors="replace")
            i = end + 1
        return fields.get("M", payload.decode(errors="replace"))

    def _auth(self) -> None:
        while True:
            tag, payload = self._read_msg()
            if tag == b"E":
                raise PgWireError(f"auth failed: {self._error_text(payload)}")
            if tag == b"R":
                (code,) = struct.unpack(">I", payload[:4])
                if code == 0:
                    continue
                if code == 3:  # cleartext password
                    self._send(b"p", _cstr(self.password))
                elif code == 5:  # md5(md5(password+user)+salt)
                    salt = payload[4:8]
                    inner = hashlib.md5((self.password + self.user).encode()).hexdigest()
                    outer = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send(b"p", _cstr("md5" + outer))
                else:
                    raise PgWireError(f"unsupported auth method {code}")
            elif tag == b"Z":
                return
            # 'S' parameter status, 'K' backend key, 'N' notice: skip

    def query(self, sql: str) -> PgResult:
        self._send(b"Q", _cstr(sql))
        columns: list[str] = []
        oids: list[int] = []
        rows: list[list[Any]] = []
        error: str | None = None
        while True:
            tag, payload = self._read_msg()
            if tag == b"T":
                (nfields,) = struct.unpack(">H", payload[:2])
                off = 2
                columns, oids = [], []
                for _ in range(nfields):
                    end = payload.index(b"\x00", off)
                    columns.append(payload[off:end].decode())
                    off = end + 1
                    # table oid(I) attnum(H) type oid(I) typlen(h) typmod(i) fmt(h)
                    (type_oid,) = struct.unpack(">I", payload[off + 6 : off + 10])
                    oids.append(type_oid)
                    off += 18
            elif tag == b"D":
                (nvals,) = struct.unpack(">H", payload[:2])
                off = 2
                row: list[Any] = []
                for i in range(nvals):
                    (ln,) = struct.unpack(">i", payload[off : off + 4])
                    off += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        row.append(_decode(payload[off : off + ln], oids[i]))
                        off += ln
                rows.append(row)
            elif tag == b"E":
                error = self._error_text(payload)
            elif tag == b"Z":
                if error:
                    raise PgWireError(error)
                return PgResult(columns, oids, rows)
            # 'C' command complete, 'N' notice, 'S': skip

    def close(self) -> None:
        try:
            self._send(b"X", b"")
        except OSError:
            pass
        self.sock.close()


def parse_pg_uri(uri: str) -> dict[str, Any]:
    u = urlparse(uri if "://" in uri else "postgres://" + uri)
    return {
        "host": u.hostname or "127.0.0.1",
        "port": u.port or 5432,
        "user": unquote(u.username) if u.username else "spark",
        "password": unquote(u.password) if u.password else "",
        "database": (u.path or "/postgres").lstrip("/") or "postgres",
    }


def read_table(uri: str, table: str, sql: str | None = None) -> PgResult:
    """Full-table read, database.rs:54-63 semantics (``SELECT * FROM t``).

    The table name goes in bare (no double-quoting): the server side may be
    ANSI postgres or a Spark-SQL-backed wire server, and a bare lowercase
    identifier is the portable spelling across both.
    """
    client = PgWireClient(**parse_pg_uri(uri))
    try:
        return client.query(sql or f"SELECT * FROM {table}")
    finally:
        client.close()
