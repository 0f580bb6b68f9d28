"""PostgreSQL wire-protocol (v3) server — simple-query flavor (reference:
roapi/src/server/postgres.rs, 543 LoC on the pgwire crate).

Behavior parity:
- simple query 'Q' with multi-statement split on ';'
  (postgres.rs:360-395);
- ``SHOW``/``SET`` are accepted no-ops returning an empty result
  (postgres.rs:114-123);
- every value is rendered as text (postgres.rs:132-141) with the type-OID
  map from postgres.rs:51-103 (unsigned -> next wider, timestamps ->
  TIMESTAMP, lists/structs -> JSON-ish text);
- SSLRequest answered with 'N' (no TLS), extended-protocol messages get a
  clean error + Sync recovery.

Pure-stdlib implementation (struct + socketserver); psycopg-compatible for
the subset above.
"""

from __future__ import annotations

import socketserver
import struct
import threading
from datetime import date, datetime

from pyspark.sql import types as T

from roapi_spark.catalog import Catalog

_SSL_REQUEST = 80877103
_STARTUP_V3 = 196608
_CANCEL_REQUEST = 80877102

# Spark type -> (pg type oid, typlen); contract: postgres.rs:51-103
_OID_TEXT = 25
_TYPE_OIDS: list[tuple[type, int]] = [
    (T.BooleanType, 16),
    (T.ByteType, 21),
    (T.ShortType, 21),
    (T.IntegerType, 23),
    (T.LongType, 20),
    (T.FloatType, 700),
    (T.DoubleType, 701),
    (T.DecimalType, 1700),
    (T.DateType, 1082),
    (T.TimestampType, 1114),
    (T.TimestampNTZType, 1114),
    (T.BinaryType, 17),
    (T.StringType, _OID_TEXT),
]


def _oid_for(dt: T.DataType) -> int:
    for cls, oid in _TYPE_OIDS:
        if isinstance(dt, cls):
            return oid
    return _OID_TEXT  # arrays/structs/maps render as text (postgres.rs:79-83)


def _render(v: object) -> bytes | None:
    """Text-format rendering, pg conventions (all-text like the reference)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, bytes):
        return b"\\x" + v.hex().encode()
    if isinstance(v, datetime):
        return v.isoformat(sep=" ").encode()
    if isinstance(v, date):
        return v.isoformat().encode()
    if isinstance(v, (list, dict)):
        import json

        return json.dumps(v, default=str).encode()
    return str(v).encode()


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack(">I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class _Handler(socketserver.BaseRequestHandler):
    # self.server is the ThreadingTCPServer; PostgresServer attaches
    # `catalog` onto it before serving

    def handle(self) -> None:  # noqa: C901
        sock = self.request
        try:
            if not self._startup(sock):
                return
            buf = b""
            while True:
                hdr = self._recv_exact(sock, 5)
                if hdr is None:
                    return
                tag, length = hdr[0:1], struct.unpack(">I", hdr[1:5])[0]
                payload = self._recv_exact(sock, length - 4) or b""
                if tag == b"X":  # Terminate
                    return
                if tag == b"Q":
                    self._simple_query(sock, payload[:-1].decode("utf-8", "replace"))
                elif tag == b"S":  # Sync (extended protocol recovery)
                    sock.sendall(_msg(b"Z", b"I"))
                else:
                    self._error(sock, f"unsupported message type {tag!r}")
                    sock.sendall(_msg(b"Z", b"I"))
                del buf
        except (ConnectionResetError, BrokenPipeError):
            pass

    # -- protocol pieces ---------------------------------------------------

    def _recv_exact(self, sock, n: int) -> bytes | None:
        data = b""
        while len(data) < n:
            chunk = sock.recv(n - len(data))
            if not chunk:
                return None
            data += chunk
        return data

    def _startup(self, sock) -> bool:
        while True:
            head = self._recv_exact(sock, 8)
            if head is None:
                return False
            length, code = struct.unpack(">II", head)
            rest = self._recv_exact(sock, length - 8) or b""
            if code == _SSL_REQUEST:
                sock.sendall(b"N")  # no TLS
                continue
            if code == _CANCEL_REQUEST:
                return False
            if code == _STARTUP_V3:
                del rest  # client params (user/database) — accepted as-is
                sock.sendall(_msg(b"R", struct.pack(">I", 0)))  # AuthenticationOk
                for k, v in (
                    ("server_version", "14.0 (roapi_spark)"),
                    ("server_encoding", "UTF8"),
                    ("client_encoding", "UTF8"),
                    ("DateStyle", "ISO"),
                ):
                    sock.sendall(_msg(b"S", _cstr(k) + _cstr(v)))
                sock.sendall(_msg(b"K", struct.pack(">II", 0, 0)))  # BackendKeyData
                sock.sendall(_msg(b"Z", b"I"))  # ReadyForQuery idle
                return True
            self._error(sock, f"unsupported protocol code {code}")
            return False

    def _simple_query(self, sock, sql: str) -> None:
        # multi-statement split on ';' (postgres.rs:360-395)
        statements = [s.strip() for s in sql.split(";")]
        ran_any = False
        for stmt in statements:
            if not stmt:
                continue
            ran_any = True
            low = stmt.lower()
            if low.startswith(("show", "set")):  # accepted no-ops
                sock.sendall(_msg(b"C", _cstr("SET" if low.startswith("set") else "SHOW")))
                continue
            try:
                df = self.server.catalog.query_sql(stmt)
                fields = df.schema.fields
                rows = df.collect()
            except Exception as exc:  # noqa: BLE001 — surface as pg error
                self._error(sock, str(exc).splitlines()[0][:500])
                sock.sendall(_msg(b"Z", b"I"))
                return
            # RowDescription
            desc = struct.pack(">H", len(fields))
            for f in fields:
                desc += (
                    _cstr(f.name)
                    + struct.pack(">IHIhih", 0, 0, _oid_for(f.dataType), -1, -1, 0)
                )
            sock.sendall(_msg(b"T", desc))
            for row in rows:
                body = struct.pack(">H", len(fields))
                for v in row:
                    r = _render(v)
                    if r is None:
                        body += struct.pack(">i", -1)
                    else:
                        body += struct.pack(">i", len(r)) + r
                sock.sendall(_msg(b"D", body))
            sock.sendall(_msg(b"C", _cstr(f"SELECT {len(rows)}")))
        if not ran_any:
            sock.sendall(_msg(b"I", b""))  # EmptyQueryResponse
        sock.sendall(_msg(b"Z", b"I"))

    def _error(self, sock, message: str) -> None:
        payload = b"S" + _cstr("ERROR") + b"C" + _cstr("XX000") + b"M" + _cstr(message) + b"\x00"
        sock.sendall(_msg(b"E", payload))


class PostgresServer:
    """Threaded pg-wire endpoint over a Catalog."""

    def __init__(self, catalog: Catalog, host: str = "127.0.0.1", port: int = 0) -> None:
        self.catalog = catalog
        socketserver.ThreadingTCPServer.allow_reuse_address = True
        self._server = socketserver.ThreadingTCPServer((host, port), _Handler)
        self._server.daemon_threads = True
        self._server.catalog = catalog  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
