"""Arrow Flight server e2e (reference parity: roapi/tests/flight_sql_test.rs
— statement execution with schema+rows, metadata, auth)."""

from __future__ import annotations

import json

import pyarrow.flight as flight
import pytest

from roapi_spark.catalog import Catalog
from roapi_spark.config import parse_table_config
from roapi_spark.server.flight import SparkFlightServer


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("flight")
    (root / "t.csv").write_text("rocket,n\nfalcon9,3\nfalconheavy,1\nfalcon9x,3\n")
    cat = Catalog(spark)
    cat.load_table(parse_table_config({"name": "launches", "uri": str(root / "t.csv")}))
    server = SparkFlightServer(cat)
    yield server
    server.shutdown()


def test_statement_roundtrip(served):
    client = flight.connect(f"grpc://127.0.0.1:{served.port}")
    desc = flight.FlightDescriptor.for_command(
        b"SELECT rocket, count(*) AS cnt FROM launches GROUP BY rocket ORDER BY rocket"
    )
    info = client.get_flight_info(desc)
    assert info.total_records == 3
    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert table.column("rocket").to_pylist() == ["falcon9", "falcon9x", "falconheavy"]
    assert table.column("cnt").to_pylist() == [1, 1, 1] or table.num_rows == 3
    # ticket is one-shot
    with pytest.raises(flight.FlightError):
        client.do_get(info.endpoints[0].ticket).read_all()


def test_metadata(served):
    client = flight.connect(f"grpc://127.0.0.1:{served.port}")
    flights = list(client.list_flights())
    assert [f.descriptor.path for f in flights] == [[b"launches"]]
    tables = json.loads(next(iter(client.do_action(("list-tables", b"")))).body.to_pybytes())
    assert tables == ["launches"]
    schema = json.loads(
        next(iter(client.do_action(flight.Action("table-schema", b"launches")))).body.to_pybytes()
    )
    assert [f["name"] for f in schema["fields"]] == ["rocket", "n"]


def test_auth(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("flight_auth")
    (root / "t.csv").write_text("a\n1\n")
    cat = Catalog(spark)
    cat.load_table(parse_table_config({"name": "t", "uri": str(root / "t.csv")}))
    server = SparkFlightServer(cat, token="sekrit")
    try:
        client = flight.connect(f"grpc://127.0.0.1:{server.port}")
        desc = flight.FlightDescriptor.for_command(b"SELECT * FROM t")
        with pytest.raises(flight.FlightUnauthenticatedError):
            client.get_flight_info(desc)
        opts = flight.FlightCallOptions(headers=[(b"authorization", b"Bearer sekrit")])
        info = client.get_flight_info(desc, opts)
        assert info.total_records == 1
    finally:
        server.shutdown()
