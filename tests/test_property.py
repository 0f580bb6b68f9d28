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


# -- round-7 bit-level kernels: the bulk bit packers must be bit-exact ------


@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=24), st.randoms()),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=60, deadline=None)
def test_jpeg_bulk_writer_matches_scalar_reference(pairs):
    """The deferred JPEG _BitWriter (bulk numpy pack + vectorized byte
    stuffing) must emit byte-identical streams to a scalar reference
    writer for arbitrary (value, nbits) sequences, including 0xFF
    stuffing and the 1-padded flush."""
    from roapi_spark.functions.jpeg import _BitWriter

    vals, lens = [], []
    for nbits, rnd in pairs:
        vals.append(rnd.getrandbits(nbits))
        lens.append(nbits)

    # scalar reference: the pre-round-7 semantics
    out = bytearray()
    acc = n = 0
    for v, ln in zip(vals, lens):
        acc = (acc << ln) | (v & ((1 << ln) - 1))
        n += ln
        while n >= 8:
            n -= 8
            b = (acc >> n) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        acc &= (1 << n) - 1
    if n:
        acc = (acc << (8 - n)) | (0x7F & ((1 << (8 - n)) - 1))
        b = acc & 0xFF
        out.append(b)
        if b == 0xFF:
            out.append(0x00)

    bw = _BitWriter()
    for v, ln in zip(vals, lens):
        bw.put(v, ln)
    assert bw.flush() == bytes(out)


@given(
    st.lists(st.integers(min_value=-(2**14), max_value=2**14), min_size=1, max_size=200),
    st.integers(min_value=0, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_flac_residual_roundtrip_property(res_list, order):
    """Any residual block round-trips exactly through the FLAC Rice
    writer and BOTH readers (vectorized cache path == scalar path),
    regardless of the k chosen or unary run lengths."""
    import numpy as np

    from roapi_spark.functions.flac import (
        _BitReader,
        _BitWriter,
        _read_residual,
        _write_residual,
    )

    res = np.array(res_list, dtype=np.int64)
    n = len(res)
    if order > n - 1:
        order = 0
    bw = _BitWriter()
    _write_residual(bw, res, block=n + order, order=order)
    bw.align()
    blob = bw.bytes()
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    cache = (bits, np.flatnonzero(bits).astype(np.int32))
    got_vec = _read_residual(_BitReader(blob, 0, cache=cache), n + order, order)
    got_scalar = _read_residual(_BitReader(blob, 0), n + order, order)
    assert np.array_equal(got_vec, res)
    assert np.array_equal(got_scalar, res)


@given(st.lists(st.integers(min_value=-(2**15), max_value=2**15 - 1),
                min_size=1, max_size=400))
@settings(max_examples=40, deadline=None)
def test_flac_full_roundtrip_property(samples):
    """encode_flac -> decode_flac is sample-exact for arbitrary 16-bit
    mono PCM (fixed predictors, Rice + escape paths, CRC/MD5 verify)."""
    import numpy as np

    from roapi_spark.functions.flac import decode_flac, encode_flac

    pcm = np.array(samples, dtype=np.int16)
    rate, got = decode_flac(encode_flac(8000, pcm))
    assert rate == 8000
    assert np.array_equal(got, pcm.astype(np.int64))
