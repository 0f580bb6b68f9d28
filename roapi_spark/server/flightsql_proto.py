"""Minimal protobuf wire codec for the Arrow FlightSQL command messages
(reference protocol: roapi/src/server/flight_sql.rs, which uses the
arrow-flight crate's generated types for arrow.flight.protocol.sql).

pyarrow ships no FlightSQL bindings and this container has no protoc, but
every FlightSQL command we need is a flat message of string/bytes fields —
trivially encodable by hand:

- wire type 2 (len-delimited) for string/bytes/message fields,
- wire type 0 (varint) for bool/uint fields,
- ``google.protobuf.Any`` is itself just ``{1: type_url, 2: value}``.

The public helpers speak Any-wrapped command bytes exactly as an ADBC/JDBC
FlightSQL client puts them in ``FlightDescriptor.cmd`` / ``Ticket.ticket``
/ ``Action.body``.
"""

from __future__ import annotations

_ANY_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."


# -- wire primitives ---------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if shift > 63:
            raise ValueError("varint longer than 64 bits")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def encode_bytes_field(num: int, value: bytes) -> bytes:
    return _varint(num << 3 | 2) + _varint(len(value)) + value


def encode_str_field(num: int, value: str) -> bytes:
    return encode_bytes_field(num, value.encode())


def encode_varint_field(num: int, value: int) -> bytes:
    return _varint(num << 3 | 0) + _varint(value)


def decode_fields(buf: bytes) -> dict[int, list[int | bytes]]:
    """Parse a message into {field_number: [values]} (varint + len-delim).
    Raises ValueError — and only ValueError — on malformed input
    (truncated varint, length past the buffer, unknown wire type): the
    Flight server feeds it client-controlled bytes, and conformant
    protobuf decoders reject a lying length rather than silently
    returning a truncated value."""
    fields: dict[int, list[int | bytes]] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        num, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("length-delimited field past end of buffer")
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            if pos + 4 > len(buf):
                raise ValueError("truncated fixed32 field")
            v = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        elif wt == 1:  # fixed64
            if pos + 8 > len(buf):
                raise ValueError("truncated fixed64 field")
            v = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        fields.setdefault(num, []).append(v)
    return fields


# -- google.protobuf.Any -----------------------------------------------------


def any_pack(msg_name: str, payload: bytes) -> bytes:
    return encode_str_field(1, _ANY_PREFIX + msg_name) + encode_bytes_field(2, payload)


def any_unpack(buf: bytes) -> tuple[str, bytes] | None:
    """Return (short message name, payload) if buf is a FlightSQL Any.
    Total: returns None on ANY non-Any input (the server calls this on
    every client-controlled descriptor/ticket/action body — a malformed
    frame must map to a clean 'unknown command', never an exception;
    field 1 can decode as a varint on garbage, hence the type check)."""
    try:
        fields = decode_fields(buf)
        url = fields[1][0]
        if isinstance(url, bytes):
            url = url.decode()
        if not isinstance(url, str) or not url.startswith(_ANY_PREFIX):
            return None
        value = fields.get(2, [b""])[0]
    except Exception:  # noqa: BLE001 — not a protobuf Any
        return None
    return url[len(_ANY_PREFIX) :], value if isinstance(value, bytes) else b""


# -- command builders (client side / tests) ----------------------------------


def command_statement_query(query: str) -> bytes:
    return any_pack("CommandStatementQuery", encode_str_field(1, query))


def command_get_catalogs() -> bytes:
    return any_pack("CommandGetCatalogs", b"")


def command_get_db_schemas() -> bytes:
    return any_pack("CommandGetDbSchemas", b"")


def command_get_tables(include_schema: bool = False) -> bytes:
    body = encode_varint_field(5, 1) if include_schema else b""
    return any_pack("CommandGetTables", body)


def command_get_sql_info(ids: list[int] | None = None) -> bytes:
    body = b"".join(encode_varint_field(1, i) for i in ids or [])
    return any_pack("CommandGetSqlInfo", body)


def command_prepared_statement_query(handle: bytes) -> bytes:
    return any_pack("CommandPreparedStatementQuery", encode_bytes_field(1, handle))


def command_get_table_types() -> bytes:
    return any_pack("CommandGetTableTypes", b"")


def command_get_xdbc_type_info(data_type: int | None = None) -> bytes:
    # proto int32: negatives (XDBC_BIGINT=-5 etc.) varint-encode as
    # 64-bit two's complement
    body = (
        encode_varint_field(1, data_type & 0xFFFFFFFFFFFFFFFF)
        if data_type is not None
        else b""
    )
    return any_pack("CommandGetXdbcTypeInfo", body)


def action_create_prepared_statement(query: str) -> bytes:
    return any_pack("ActionCreatePreparedStatementRequest", encode_str_field(1, query))


def action_close_prepared_statement(handle: bytes) -> bytes:
    return any_pack("ActionClosePreparedStatementRequest", encode_bytes_field(1, handle))


def ticket_statement_query(handle: bytes) -> bytes:
    return any_pack("TicketStatementQuery", encode_bytes_field(1, handle))


def parse_prepared_statement_result(buf: bytes) -> tuple[bytes, bytes]:
    """ActionCreatePreparedStatementResult -> (handle, dataset_schema_ipc)."""
    unpacked = any_unpack(buf)
    if unpacked is None or unpacked[0] != "ActionCreatePreparedStatementResult":
        raise ValueError("not an ActionCreatePreparedStatementResult")
    fields = decode_fields(unpacked[1])
    handle = fields.get(1, [b""])[0]
    schema = fields.get(2, [b""])[0]
    return handle, schema  # type: ignore[return-value]
