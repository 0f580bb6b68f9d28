"""Avro object-container source: schema-mapped load through the stdlib
codec (round-trips via avro_lite.write_container, the same writer the
Iceberg fixtures use). Covers logical types, nested records, arrays,
maps, enums, nullable unions, deflate, multi-file loads, and the
empty-file stable-schema guarantee."""

from __future__ import annotations

import datetime
import decimal

import pytest

from roapi_spark.config import parse_table_config
from roapi_spark.sources import load_table
from roapi_spark.sources.avro_lite import write_container

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {
            "name": "price",
            "type": {"type": "bytes", "logicalType": "decimal",
                     "precision": 10, "scale": 2},
        },
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {
            "name": "kind",
            "type": {"type": "enum", "name": "kind_e", "symbols": ["A", "B"]},
        },
        {
            "name": "loc",
            "type": ["null", {
                "type": "record", "name": "loc_r",
                "fields": [{"name": "lat", "type": "double"},
                           {"name": "lon", "type": "double"}],
            }],
        },
    ],
}


def _unscaled(d: str) -> bytes:
    n = int(decimal.Decimal(d).scaleb(2))
    return n.to_bytes((n.bit_length() + 8) // 8 or 1, "big", signed=True)


ROWS = [
    {
        "id": 1, "title": "alpha", "score": 1.5, "flag": True,
        "day": 19723,  # 2024-01-01
        "ts": 1_700_000_000_000_000,
        "price": _unscaled("12.34"),
        "tags": ["x", "y"], "attrs": {"n": 3}, "kind": "A",
        "loc": {"lat": 51.5, "lon": -0.13},
    },
    {
        "id": 2, "title": None, "score": -0.25, "flag": False,
        "day": 0,
        "ts": 0,
        "price": _unscaled("-1.00"),
        "tags": [], "attrs": {}, "kind": "B",
        "loc": None,
    },
]


def _load(spark, cfg: dict):
    return load_table(spark, parse_table_config(cfg))


@pytest.fixture(scope="module")
def avro_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("avro_fixtures")
    (root / "docs.avro").write_bytes(write_container(SCHEMA, ROWS))
    (root / "docs_deflate.avro").write_bytes(
        write_container(SCHEMA, ROWS, codec="deflate")
    )
    (root / "empty.avro").write_bytes(write_container(SCHEMA, []))
    multi = root / "multi"
    multi.mkdir()
    (multi / "part-0.avro").write_bytes(write_container(SCHEMA, ROWS[:1]))
    (multi / "part-1.avro").write_bytes(write_container(SCHEMA, ROWS[1:]))
    return root


def test_avro_types_and_values(spark, avro_dir):
    df = _load(spark, {"name": "a", "uri": str(avro_dir / "docs.avro")})
    dt = dict(df.dtypes)
    assert dt["id"] == "bigint"
    assert dt["day"] == "date"
    assert dt["ts"].startswith("timestamp")
    assert dt["price"] == "decimal(10,2)"
    assert dt["tags"] == "array<string>"
    assert dt["attrs"] == "map<string,bigint>"
    assert dt["kind"] == "string"
    assert dt["loc"] == "struct<lat:double,lon:double>"
    rows = {r["id"]: r for r in df.collect()}
    r1, r2 = rows[1], rows[2]
    assert r1["day"] == datetime.date(2024, 1, 1)
    assert r1["price"] == decimal.Decimal("12.34")
    assert r1["tags"] == ["x", "y"] and r1["attrs"] == {"n": 3}
    assert r1["loc"]["lat"] == pytest.approx(51.5)
    assert r2["title"] is None and r2["loc"] is None
    assert r2["price"] == decimal.Decimal("-1.00")
    assert r1["ts"] == datetime.datetime.utcfromtimestamp(1_700_000_000)


def test_avro_deflate_matches_null_codec(spark, avro_dir):
    a = _load(spark, {"name": "a", "uri": str(avro_dir / "docs.avro")})
    b = _load(spark, {"name": "b", "uri": str(avro_dir / "docs_deflate.avro")})
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_avro_empty_file_stable_schema(spark, avro_dir):
    df = _load(spark, {"name": "e", "uri": str(avro_dir / "empty.avro")})
    assert df.count() == 0
    assert dict(df.dtypes)["price"] == "decimal(10,2)"


def test_avro_directory_multifile(spark, avro_dir):
    df = _load(
        spark,
        {"name": "m", "uri": str(avro_dir / "multi"), "option": {"format": "avro"}},
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 2]


def test_avro_format_sniffed_from_extension(avro_dir):
    ts = parse_table_config({"name": "a", "uri": str(avro_dir / "docs.avro")})
    assert ts.resolved_format() == "avro"


def test_avro_corrupt_file_raises_loaderror(spark, avro_dir, tmp_path):
    from roapi_spark.sources import LoadError

    bad = tmp_path / "bad.avro"
    bad.write_bytes((avro_dir / "docs.avro").read_bytes()[:40])
    with pytest.raises(LoadError, match="avro table"):
        _load(spark, {"name": "bad", "uri": str(bad)})
