"""Minimal MySQL client/server protocol *client* — the no-JDBC-jars path
for ``mysql://`` table sources, mirroring :mod:`roapi_spark.sources.pgwire`.

The reference loads MySQL tables by a full-table ``SELECT *`` through
ConnectorX into memory (``columnq/src/table/database.rs:37-73``; live test
``columnq/tests/table_mysql_test.rs``); this client gives the same
semantics with zero dependencies: v10 handshake, ``mysql_native_password``
and ``caching_sha2_password`` (fast path) auth, AuthSwitch handling, one
``COM_QUERY`` text-protocol result decode by column type. Big tables on a
real cluster should use the Spark JDBC path (parallel partitioned reads);
this fallback is bounded by the same whole-table materialization the
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

# capability flags (protocol::CapabilityFlags)
_CLIENT_LONG_PASSWORD = 0x1
_CLIENT_PROTOCOL_41 = 0x200
_CLIENT_CONNECT_WITH_DB = 0x8
_CLIENT_SECURE_CONNECTION = 0x8000
_CLIENT_PLUGIN_AUTH = 1 << 19

# column types (protocol::ColumnType) that need non-string decode
_INT_TYPES = {1, 2, 3, 8, 9, 13}  # TINY SHORT LONG LONGLONG INT24 YEAR
_FLOAT_TYPES = {4, 5}  # FLOAT DOUBLE
_DECIMAL_TYPES = {0x00, 0xF6}  # DECIMAL NEWDECIMAL
_DATE_TYPE = 10
_DATETIME_TYPES = {7, 12}  # TIMESTAMP DATETIME


class MySqlWireError(RuntimeError):
    pass


@dataclass
class MySqlResult:
    columns: list[str]
    types: list[int]
    rows: list[list[Any]]


def _decode(raw: bytes | None, ctype: int) -> Any:
    if raw is None:
        return None
    text = raw.decode()
    if ctype in _INT_TYPES:
        return int(text)
    if ctype in _FLOAT_TYPES or ctype in _DECIMAL_TYPES:
        return float(text)
    if ctype == _DATE_TYPE:
        return date.fromisoformat(text)
    if ctype in _DATETIME_TYPES:
        return datetime.fromisoformat(text.replace(" ", "T"))
    return text


def _native_password_scramble(password: str, nonce: bytes) -> bytes:
    """mysql_native_password: SHA1(pwd) XOR SHA1(nonce + SHA1(SHA1(pwd)))."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(nonce + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def _caching_sha2_scramble(password: str, nonce: bytes) -> bytes:
    """caching_sha2_password fast path:
    SHA256(pwd) XOR SHA256(SHA256(SHA256(pwd)) + nonce)."""
    if not password:
        return b""
    h1 = hashlib.sha256(password.encode()).digest()
    h2 = hashlib.sha256(h1).digest()
    h3 = hashlib.sha256(h2 + nonce).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


class MySqlWireClient:
    """One connection, COM_QUERY text protocol only."""

    def __init__(
        self,
        host: str,
        port: int,
        user: str = "spark",
        password: str = "",
        database: str = "",
        timeout: float = 30.0,
    ) -> None:
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.user, self.password = user, password
        self.database = database
        self._seq = 0
        self._handshake()

    # -- packet framing: 3-byte LE length + 1-byte sequence id --------------

    def _recv_exact(self, n: int) -> bytes:
        data = b""
        while len(data) < n:
            chunk = self.sock.recv(n - len(data))
            if not chunk:
                raise MySqlWireError("server closed connection")
            data += chunk
        return data

    def _read_packet(self) -> bytes:
        # a payload of exactly 0xFFFFFF is split: continuation packets
        # follow until one arrives with length < 0xFFFFFF (possibly 0)
        data = b""
        while True:
            header = self._recv_exact(4)
            length = header[0] | (header[1] << 8) | (header[2] << 16)
            self._seq = header[3] + 1
            data += self._recv_exact(length)
            if length < 0xFFFFFF:
                return data

    def _send_packet(self, payload: bytes) -> None:
        # mirror of the read side: emit 16MB-1 chunks, each with its own
        # header, plus a terminating short (possibly empty) packet
        while True:
            chunk, payload = payload[:0xFFFFFF], payload[0xFFFFFF:]
            header = struct.pack("<I", len(chunk))[:3] + bytes([self._seq & 0xFF])
            self.sock.sendall(header + chunk)
            self._seq += 1
            if len(chunk) < 0xFFFFFF:
                return

    # -- lenenc helpers -----------------------------------------------------

    @staticmethod
    def _lenenc_int(buf: bytes, off: int) -> tuple[int | None, int]:
        first = buf[off]
        if first < 0xFB:
            return first, off + 1
        if first == 0xFB:  # NULL (in row context)
            return None, off + 1
        if first == 0xFC:
            return struct.unpack_from("<H", buf, off + 1)[0], off + 3
        if first == 0xFD:
            return buf[off + 1] | (buf[off + 2] << 8) | (buf[off + 3] << 16), off + 4
        return struct.unpack_from("<Q", buf, off + 1)[0], off + 9

    @classmethod
    def _lenenc_str(cls, buf: bytes, off: int) -> tuple[bytes | None, int]:
        n, off = cls._lenenc_int(buf, off)
        if n is None:
            return None, off
        return buf[off : off + n], off + n

    @staticmethod
    def _err_text(payload: bytes) -> str:
        # ERR packet: 0xff code(2) ['#' sqlstate(5)] message
        off = 3
        if len(payload) > off and payload[off : off + 1] == b"#":
            off += 6
        return payload[off:].decode(errors="replace")

    # -- connection phase ---------------------------------------------------

    def _handshake(self) -> None:
        greeting = self._read_packet()
        if greeting[:1] == b"\xff":
            raise MySqlWireError(f"server refused: {self._err_text(greeting)}")
        if greeting[0] != 10:
            raise MySqlWireError(f"unsupported protocol version {greeting[0]}")
        off = 1
        end = greeting.index(b"\x00", off)  # server version
        off = end + 1
        off += 4  # thread id
        nonce = greeting[off : off + 8]
        off += 8 + 1  # auth-data-1 + filler
        off += 2 + 1 + 2 + 2  # cap_low, charset, status, cap_high
        auth_len = greeting[off] if off < len(greeting) else 0
        off += 1 + 10  # auth_len + reserved
        if off < len(greeting):
            extra = max(13, auth_len - 8)
            nonce += greeting[off : off + extra].rstrip(b"\x00")
            off += extra
        plugin = "mysql_native_password"
        if off < len(greeting):
            pend = greeting.find(b"\x00", off)
            plugin = greeting[off : pend if pend >= 0 else len(greeting)].decode()
        nonce = nonce[:20]

        caps = (
            _CLIENT_LONG_PASSWORD
            | _CLIENT_PROTOCOL_41
            | _CLIENT_SECURE_CONNECTION
            | _CLIENT_PLUGIN_AUTH
        )
        if self.database:
            caps |= _CLIENT_CONNECT_WITH_DB
        auth = self._auth_response(plugin, nonce)
        payload = (
            struct.pack("<IIB", caps, 1 << 24, 0x21)  # caps, max packet, utf8
            + b"\x00" * 23
            + self.user.encode()
            + b"\x00"
            + bytes([len(auth)])
            + auth
            + (self.database.encode() + b"\x00" if self.database else b"")
            + plugin.encode()
            + b"\x00"
        )
        self._send_packet(payload)
        self._auth_loop()

    def _auth_response(self, plugin: str, nonce: bytes) -> bytes:
        if plugin == "caching_sha2_password":
            return _caching_sha2_scramble(self.password, nonce)
        return _native_password_scramble(self.password, nonce)

    def _auth_loop(self) -> None:
        while True:
            pkt = self._read_packet()
            head = pkt[0]
            if head == 0x00:  # OK
                return
            if head == 0xFF:
                raise MySqlWireError(f"auth failed: {self._err_text(pkt)}")
            if head == 0xFE:  # AuthSwitchRequest: plugin \x00 new-nonce
                end = pkt.index(b"\x00", 1)
                plugin = pkt[1:end].decode()
                nonce = pkt[end + 1 :].rstrip(b"\x00")[:20]
                self._send_packet(self._auth_response(plugin, nonce))
            elif head == 0x01:  # AuthMoreData (caching_sha2)
                if pkt[1:2] == b"\x03":  # fast_auth_success -> OK follows
                    continue
                raise MySqlWireError(
                    "caching_sha2_password full auth requested (unknown "
                    "password cache): needs TLS/RSA — use the JDBC path or "
                    "mysql_native_password"
                )
            else:
                raise MySqlWireError(f"unexpected auth packet 0x{head:02x}")

    # -- query phase --------------------------------------------------------

    def query(self, sql: str) -> MySqlResult:
        self._seq = 0
        self._send_packet(b"\x03" + sql.encode())  # COM_QUERY
        first = self._read_packet()
        if first[0] == 0xFF:
            raise MySqlWireError(self._err_text(first))
        if first[0] == 0x00:  # OK (no result set)
            return MySqlResult([], [], [])
        ncols, _ = self._lenenc_int(first, 0)
        columns: list[str] = []
        types: list[int] = []
        for _ in range(ncols or 0):
            cdef = self._read_packet()
            off = 0
            # catalog, schema, table, org_table, name, org_name (lenenc strs)
            for i in range(5):
                _, off = self._lenenc_str(cdef, off)
            name_b, off = self._lenenc_str(cdef, off)
            _, off = self._lenenc_int(cdef, off)  # fixed-fields length (0x0c)
            ctype = cdef[off + 6]  # charset(2) + column_length(4) -> type
            columns.append((name_b or b"").decode())
            types.append(ctype)
        rows: list[list[Any]] = []
        seen_col_eof = False
        while True:
            pkt = self._read_packet()
            if pkt[0] == 0xFE and len(pkt) < 9:  # EOF
                if not seen_col_eof:
                    seen_col_eof = True  # EOF after column defs; rows follow
                    continue
                return MySqlResult(columns, types, rows)
            if pkt[0] == 0xFF:
                raise MySqlWireError(self._err_text(pkt))
            off = 0
            row: list[Any] = []
            for i in range(len(columns)):
                raw, off = self._lenenc_str(pkt, off)
                row.append(_decode(raw, types[i]))
            rows.append(row)

    def close(self) -> None:
        try:
            self._seq = 0
            self._send_packet(b"\x01")  # COM_QUIT
        except OSError:
            pass
        self.sock.close()


def parse_mysql_uri(uri: str) -> dict[str, Any]:
    u = urlparse(uri if "://" in uri else "mysql://" + uri)
    return {
        "host": u.hostname or "127.0.0.1",
        "port": u.port or 3306,
        "user": unquote(u.username) if u.username else "spark",
        "password": unquote(u.password) if u.password else "",
        "database": (u.path or "").lstrip("/"),
    }


def read_table(uri: str, table: str, sql: str | None = None) -> MySqlResult:
    """Full-table read, database.rs:54-63 semantics (``SELECT * FROM t``)."""
    client = MySqlWireClient(**parse_mysql_uri(uri))
    try:
        return client.query(sql or f"SELECT * FROM {table}")
    finally:
        client.close()
