"""Golden-bytes tests for the hand-rolled FlightSQL protobuf codec
(roapi_spark/server/flightsql_proto.py).

Until now the codec's decoder was only ever exercised on bytes produced
by its own encoder — a shared bug (wrong field number, wrong wire type)
would cancel out and never surface (r9 verdict item #6). The vectors
below are INDEPENDENT: hand-assembled byte literals built straight from
the published message definitions in apache/arrow
``format/FlightSql.proto`` and the protobuf wire format
(https://protobuf.dev/programming-guides/encoding/):

- key byte = (field_number << 3) | wire_type; wire type 2 =
  len-delimited (string/bytes/message/packed), wire type 0 = varint
- ``google.protobuf.Any`` = { string type_url = 1; bytes value = 2 }
- field numbers used (from FlightSql.proto):
    CommandStatementQuery.query                          = 1
    CommandGetTables.include_schema                      = 5
    CommandGetSqlInfo.info (repeated uint32, PACKED)     = 1
    CommandGetXdbcTypeInfo.data_type (optional int32)    = 1
    CommandPreparedStatementQuery.prepared_statement_handle = 1
    ActionCreatePreparedStatementRequest.query           = 1
    ActionCreatePreparedStatementResult.prepared_statement_handle = 1
    ActionCreatePreparedStatementResult.dataset_schema   = 2
    TicketStatementQuery.statement_handle                = 1

Every byte literal was assembled by hand from those rules (lengths
counted, varints spelled out) — none of them round-trips through the
codec under test.
"""

from __future__ import annotations

import roapi_spark.server.flightsql_proto as fsp

_URL = b"type.googleapis.com/arrow.flight.protocol.sql."


def test_statement_query_golden_decode_and_encode_parity():
    # Any{ type_url(1): ...CommandStatementQuery, value(2):
    #      CommandStatementQuery{ query(1) = "SELECT 1" } }
    # 0x0A = field 1 LEN; 0x43 = 67 = len(type_url)
    # 0x12 = field 2 LEN; 0x0A = 10 = len(inner)
    # inner: 0x0A 0x08 "SELECT 1"
    golden = (
        b"\x0a\x43" + _URL + b"CommandStatementQuery"
        b"\x12\x0a\x0a\x08SELECT 1"
    )
    name, payload = fsp.any_unpack(golden)
    assert name == "CommandStatementQuery"
    assert fsp.decode_fields(payload)[1][0] == b"SELECT 1"
    # prost/protoc emit fields in field-number order, so for non-empty
    # flat messages our encoder must be byte-identical
    assert fsp.command_statement_query("SELECT 1") == golden


def test_statement_query_two_byte_length_varint():
    """A query long enough that the Any.value length needs a 2-byte
    varint (0xC6 0x01 = 198): multi-byte varint decode must not be
    masked by single-byte-only test data."""
    q = "SELECT " + ", ".join(f"c{i}" for i in range(40))
    assert len(q) == 195  # inner msg = 2 (key+len) + 1 + 195 = 198
    golden = (
        b"\x0a\x43" + _URL + b"CommandStatementQuery"
        b"\x12\xc6\x01\x0a\xc3\x01" + q.encode()
    )
    name, payload = fsp.any_unpack(golden)
    assert name == "CommandStatementQuery"
    assert fsp.decode_fields(payload)[1][0] == q.encode()
    assert fsp.command_statement_query(q) == golden


def test_get_tables_include_schema_golden():
    # include_schema is field 5 varint: key = (5<<3)|0 = 0x28, value 1
    golden = (
        b"\x0a\x3e" + _URL + b"CommandGetTables" b"\x12\x02\x28\x01"
    )
    name, payload = fsp.any_unpack(golden)
    assert name == "CommandGetTables"
    assert fsp.decode_fields(payload)[5][0] == 1
    assert fsp.command_get_tables(include_schema=True) == golden


def test_empty_command_without_value_field():
    """proto3 omits empty fields: a conformant client (prost/ADBC)
    sends CommandGetCatalogs as the bare type_url with NO value field.
    Our any_unpack must treat the absent field 2 as b"". (Our own
    encoder emits an explicit zero-length field 2 — also valid wire
    format; both forms must decode.)"""
    client_form = b"\x0a\x40" + _URL + b"CommandGetCatalogs"
    name, payload = fsp.any_unpack(client_form)
    assert name == "CommandGetCatalogs" and payload == b""
    ours = fsp.command_get_catalogs()
    assert fsp.any_unpack(ours) == ("CommandGetCatalogs", b"")


def test_xdbc_type_info_negative_int32_golden():
    """proto int32 varints encode negatives as 64-bit two's complement
    (10 bytes): XDBC_BIGINT = -5 -> fb ff ff ff ff ff ff ff ff 01."""
    golden = (
        b"\x0a\x44" + _URL + b"CommandGetXdbcTypeInfo"
        b"\x12\x0b\x08\xfb\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    )
    name, payload = fsp.any_unpack(golden)
    assert name == "CommandGetXdbcTypeInfo"
    raw = fsp.decode_fields(payload)[1][0]
    assert raw & 0xFFFFFFFF == 0xFFFFFFFB  # two's-complement -5
    assert fsp.command_get_xdbc_type_info(-5) == golden


def test_get_sql_info_packed_repeated_golden():
    """proto3 repeated uint32 is PACKED by default: a conformant client
    sends info ids as ONE len-delimited field of concatenated varints
    (500=0xf4 0x03, 501, 502), not three varint fields. The server-side
    consumer must unpack both forms (server/flight.py does)."""
    golden = (
        b"\x0a\x3f" + _URL + b"CommandGetSqlInfo"
        b"\x12\x08\x0a\x06\xf4\x03\xf5\x03\xf6\x03"
    )
    name, payload = fsp.any_unpack(golden)
    assert name == "CommandGetSqlInfo"
    packed = fsp.decode_fields(payload)[1][0]
    assert isinstance(packed, bytes)
    ids, pos = [], 0
    while pos < len(packed):
        x, pos = fsp._read_varint(packed, pos)
        ids.append(x)
    assert ids == [500, 501, 502]


def test_prepared_statement_flow_goldens():
    # ActionCreatePreparedStatementRequest{ query(1) = "SELECT 2" }
    req = (
        b"\x0a\x52" + _URL + b"ActionCreatePreparedStatementRequest"
        b"\x12\x0a\x0a\x08SELECT 2"
    )
    name, payload = fsp.any_unpack(req)
    assert name == "ActionCreatePreparedStatementRequest"
    assert fsp.decode_fields(payload)[1][0] == b"SELECT 2"
    assert fsp.action_create_prepared_statement("SELECT 2") == req

    # ActionCreatePreparedStatementResult{ handle(1)=b"H1",
    #                                      dataset_schema(2)=010203 }
    res = (
        b"\x0a\x51" + _URL + b"ActionCreatePreparedStatementResult"
        b"\x12\x09\x0a\x02H1\x12\x03\x01\x02\x03"
    )
    handle, schema = fsp.parse_prepared_statement_result(res)
    assert handle == b"H1" and schema == b"\x01\x02\x03"

    # CommandPreparedStatementQuery{ prepared_statement_handle(1) }
    cmd = (
        b"\x0a\x4b" + _URL + b"CommandPreparedStatementQuery"
        b"\x12\x04\x0a\x02H1"
    )
    name, payload = fsp.any_unpack(cmd)
    assert name == "CommandPreparedStatementQuery"
    assert fsp.decode_fields(payload)[1][0] == b"H1"
    assert fsp.command_prepared_statement_query(b"H1") == cmd


def test_ticket_statement_query_binary_handle_golden():
    """Handles are opaque bytes — include non-UTF8 bytes so a decoder
    that sneaks in a .decode() fails loudly here."""
    golden = (
        b"\x0a\x42" + _URL + b"TicketStatementQuery"
        b"\x12\x0a\x0a\x08\x00\xffhandle"
    )
    name, payload = fsp.any_unpack(golden)
    assert name == "TicketStatementQuery"
    assert fsp.decode_fields(payload)[1][0] == b"\x00\xffhandle"
    assert fsp.ticket_statement_query(b"\x00\xffhandle") == golden


def test_non_flightsql_bytes_rejected():
    assert fsp.any_unpack(b"\x00\x01garbage") is None
    # a valid Any whose type_url is outside arrow.flight.protocol.sql
    other = b"\x0a\x09other/Msg\x12\x00"
    assert fsp.any_unpack(other) is None
