"""Property-based tests (hypothesis) for the pure-Python layers: REST
literal parsing, sort parsing, type parsing, JSON pointer — the layers
where malformed user input lands first."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from roapi_spark.encoders.json import rows_to_json_bytes
from roapi_spark.query.rest import parse_literal, sort_columns
from roapi_spark.sources.json_doc import resolve_pointer
from roapi_spark.types import TypeParseError, parse_data_type


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_parse_literal_ints(n):
    assert parse_literal(str(n)) == n


@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_parse_literal_floats(x):
    v = parse_literal(repr(float(x)))
    assert isinstance(v, (int, float)) and float(v) == pytest.approx(float(x))


@given(st.text(alphabet=st.characters(blacklist_characters="'\"", blacklist_categories=("Cs",)), max_size=40))
def test_parse_literal_quoted_roundtrip(s):
    assert parse_literal(f"'{s}'") == s


@given(st.lists(st.sampled_from(["a", "-b", "+c", "d_e", "-f2"]), max_size=6))
@settings(max_examples=25, deadline=None)
def test_sort_columns_count(spark, tokens):
    # F.col needs an active SparkContext in Spark 4 — hence the fixture
    cols = sort_columns(",".join(tokens))
    assert len(cols) == len(tokens)


@given(
    st.recursive(
        st.sampled_from(["Utf8", "Int64", "Float64", "Boolean", "Date32", "Decimal128(10, 2)"]),
        lambda inner: st.one_of(
            inner.map(lambda t: f"List<{t}>"),
            st.tuples(inner, inner).map(lambda ts: f"Map<{ts[0]}, {ts[1]}>"),
            inner.map(lambda t: f"Struct<f1: {t}, f2: Utf8>"),
        ),
        max_leaves=4,
    )
)
def test_parse_data_type_never_crashes_on_valid(spec):
    parse_data_type(spec)  # must not raise


@given(st.text(max_size=30))
def test_parse_data_type_garbage(spec):
    try:
        parse_data_type(spec)
    except TypeParseError:
        pass  # rejecting is fine; crashing with anything else is not


@given(
    st.recursive(
        st.one_of(st.integers(), st.text(max_size=8), st.none()),
        lambda inner: st.one_of(
            st.lists(inner, max_size=4),
            st.dictionaries(st.text(min_size=1, max_size=6), inner, max_size=4),
        ),
        max_leaves=8,
    )
)
def test_resolve_pointer_root_identity(doc):
    assert resolve_pointer(doc, "") is doc


@settings(max_examples=30)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "a": st.one_of(st.none(), st.integers(min_value=-(2**53), max_value=2**53)),
                "b": st.one_of(
                    st.none(),
                    st.text(
                        max_size=12,
                        alphabet=st.characters(blacklist_categories=("Cs",)),
                    ),
                ),
                "c": st.one_of(st.none(), st.floats(allow_nan=True, allow_infinity=True)),
            }
        ),
        max_size=8,
    )
)
def test_json_encoder_always_valid_json(rows):
    import pyarrow as pa

    table = pa.Table.from_pylist(rows) if rows else pa.table({"a": pa.array([], pa.int64())})
    out = json.loads(rows_to_json_bytes(table))
    assert isinstance(out, list) and len(out) == len(rows)


# -- avro_lite codec round-trip ---------------------------------------------

_AVRO_PRIM = st.sampled_from(["long", "double", "string", "boolean", "bytes"])


def _avro_value(t):
    return {
        "long": st.integers(min_value=-(2**62), max_value=2**62),
        "double": st.floats(allow_nan=False, allow_infinity=False),
        "string": st.text(max_size=50),
        "boolean": st.booleans(),
        "bytes": st.binary(max_size=30),
    }[t]


@st.composite
def _avro_schema_and_rows(draw):
    n_fields = draw(st.integers(min_value=1, max_value=5))
    fields = []
    row_strats = {}
    for i in range(n_fields):
        t = draw(_AVRO_PRIM)
        nullable = draw(st.booleans())
        arr = draw(st.booleans())
        ftype: object = {"type": "array", "items": t} if arr else t
        if nullable:
            ftype = ["null", ftype]
        name = f"f{i}"
        fields.append({"name": name, "type": ftype})
        v = _avro_value(t)
        if arr:
            v = st.lists(v, max_size=5)
        if nullable:
            v = st.none() | v
        row_strats[name] = v
    schema = {"type": "record", "name": "r", "fields": fields}
    rows = draw(st.lists(st.fixed_dictionaries(row_strats), max_size=8))
    return schema, rows


@given(_avro_schema_and_rows(), st.sampled_from(["null", "deflate"]))
@settings(max_examples=60, deadline=None)
def test_avro_codec_roundtrip(schema_rows, codec):
    from roapi_spark.sources.avro_lite import read_container, write_container

    schema, rows = schema_rows
    out_schema, decoded = read_container(write_container(schema, rows, codec))
    assert out_schema == schema
    assert decoded == rows
