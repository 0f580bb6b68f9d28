"""Declared-schema type parsing + config parsing tests
(reference shapes: columnq/src/table/mod.rs:170-219, roapi/src/config.rs)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from roapi_spark.config import (
    ConfigError,
    parse_config,
    parse_table_uri_arg,
    sniff_format,
)
from roapi_spark.types import TypeParseError, parse_data_type, parse_table_schema


@pytest.mark.parametrize(
    ("spec", "expected"),
    [
        ("Utf8", T.StringType()),
        ("Int64", T.LongType()),
        ("UInt32", T.LongType()),  # widen unsigned (postgres.rs:60)
        ("UInt64", T.DecimalType(20, 0)),
        ("Float64", T.DoubleType()),
        ("Boolean", T.BooleanType()),
        ("Date32", T.DateType()),
        ("Timestamp(ms)", T.TimestampType()),
        ("Timestamp(ns, UTC)", T.TimestampType()),
        ("Time64(us)", T.LongType()),
        ("Decimal128(10, 2)", T.DecimalType(10, 2)),
        ("List<Int64>", T.ArrayType(T.LongType())),
        ("Map<Utf8, Int32>", T.MapType(T.StringType(), T.IntegerType())),
        (
            "Struct<reply_id: Int32, next_id: Int32>",
            T.StructType(
                [
                    T.StructField("reply_id", T.IntegerType(), True),
                    T.StructField("next_id", T.IntegerType(), True),
                ]
            ),
        ),
        ("List<Struct<t: Int64, r: Utf8>>", T.ArrayType(
            T.StructType([
                T.StructField("t", T.LongType(), True),
                T.StructField("r", T.StringType(), True),
            ])
        )),
    ],
)
def test_parse_data_type(spec, expected):
    assert parse_data_type(spec) == expected


def test_parse_data_type_unknown():
    with pytest.raises(TypeParseError):
        parse_data_type("Widget")


def test_parse_table_schema():
    st = parse_table_schema(
        {
            "columns": [
                {"name": "city", "data_type": "Utf8", "nullable": False},
                {"name": "lat", "data_type": "Float64"},
            ]
        }
    )
    assert st == T.StructType(
        [
            T.StructField("city", T.StringType(), False),
            T.StructField("lat", T.DoubleType(), True),
        ]
    )


def test_sniff_format():
    assert sniff_format("/data/foo.csv") == "csv"
    assert sniff_format("s3://bucket/x.parquet") == "parquet"
    assert sniff_format("sqlite://db/sample.db") == "sqlite"
    assert sniff_format("postgres://h/db") == "postgres"
    assert sniff_format("/data/unknown.bin") is None


def test_parse_config_roundtrip():
    cfg = parse_config(
        {
            "addr": "0.0.0.0:9000",
            "read_only": False,
            "spark": {"spark.sql.shuffle.partitions": 8},
            "tables": [
                {
                    "name": "t1",
                    "uri": "/tmp/x.csv",
                    "option": {"format": "csv", "has_header": True, "use_memory_table": True},
                },
                {"name": "t2", "uri": "/tmp/y.parquet", "reload_interval": 5},
            ],
            "kvstores": [
                {"name": "kv1", "uri": "/tmp/z.json", "key": "id", "value": "name"}
            ],
        }
    )
    assert cfg.addr == "0.0.0.0:9000"
    assert not cfg.read_only
    assert cfg.spark_conf == {"spark.sql.shuffle.partitions": "8"}
    t1 = cfg.tables[0]
    assert t1.resolved_format() == "csv"
    assert t1.use_memory_table is True
    assert t1.option == {"has_header": True}
    assert cfg.tables[1].reload_interval == 5
    assert cfg.kvstores[0].key == "id"


def test_parse_table_uri_arg():
    ts = parse_table_uri_arg("cities=/tmp/uk_cities.csv")
    assert ts.name == "cities" and ts.resolved_format() == "csv"
    ts = parse_table_uri_arg("/tmp/uk_cities.csv")
    assert ts.name == "uk_cities"
    ts = parse_table_uri_arg("t=/tmp/data,format=ndjson")
    assert ts.resolved_format() == "ndjson"
    with pytest.raises(ConfigError):
        parse_table_uri_arg("t=/tmp/x.nope").resolved_format()


def test_batch_size_option_parses_and_applies(spark, tmp_path):
    """Per-table batch_size (reference columnq table/mod.rs:570-572):
    parsed from option or top level, validated, applied to the session's
    scan/transfer batch confs at load."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from roapi_spark.config import ConfigError, parse_table_config
    from roapi_spark.sources import load_table

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"x": pa.array([1, 2, 3], pa.int64())}), p)

    ts = parse_table_config(
        {"name": "t", "uri": p, "option": {"batch_size": 1024}}
    )
    assert ts.batch_size == 1024
    # top-level spelling too (reference accepts the field on the table)
    assert parse_table_config(
        {"name": "t", "uri": p, "batch_size": 4096}
    ).batch_size == 4096
    assert parse_table_config({"name": "t", "uri": p}).batch_size is None

    before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    df = load_table(spark, ts)
    assert df.count() == 3
    # the knob is SCOPED to the load: columnq batches at load time, but
    # Spark reads these confs at query time, so a lasting session-wide
    # set would leak the last-loaded table's batch size into every other
    # table's scans (review finding) — confs must be restored
    assert (
        spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch") == before
    )

    # use_memory_table + batch_size: materialized under the scoped conf
    ts_mem = parse_table_config(
        {"name": "t", "uri": p,
         "option": {"batch_size": 512, "use_memory_table": True}}
    )
    assert load_table(spark, ts_mem).count() == 3

    for bad in (0, -5, "lots", 8192.7, True):
        with _pytest.raises(ConfigError):
            parse_table_config(
                {"name": "t", "uri": p, "option": {"batch_size": bad}}
            )


def test_batch_size_concurrent_loads_serialized(spark, tmp_path):
    """Concurrent batch_size loads (e.g. the catalog refresh thread racing
    a foreground load) must each see their OWN batch size inside the scope
    and restore the original afterwards — interleaved set/restore without
    the lock can leak a stale value permanently (ADVICE r5)."""
    import threading

    import pyarrow as pa
    import pyarrow.parquet as pq

    from roapi_spark.config import parse_table_config
    from roapi_spark.sources import load_table

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"x": pa.array([1, 2, 3], pa.int64())}), p)

    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(conf_key)
    observed: dict[int, str] = {}
    barrier = threading.Barrier(2, timeout=10)

    import roapi_spark.sources.parquet as parquet_mod

    real = parquet_mod.to_dataframe

    def spy(spark_, ts_):
        # rendezvous both loads inside the conf scope: without the lock
        # both would be inside simultaneously and one would observe the
        # other's batch size
        try:
            barrier.wait(timeout=0.5)
        except threading.BrokenBarrierError:
            pass  # serialized (expected with the lock): partner never arrives
        observed[ts_.batch_size] = spark_.conf.get(conf_key)
        return real(spark_, ts_)

    parquet_mod.to_dataframe = spy
    try:
        threads = [
            threading.Thread(
                target=lambda b=b: load_table(
                    spark,
                    parse_table_config(
                        {"name": f"t{b}", "uri": p, "option": {"batch_size": b}}
                    ),
                ).count()
            )
            for b in (777, 555)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
    finally:
        parquet_mod.to_dataframe = real

    # each load saw exactly its own batch size, and the original came back
    assert observed == {777: "777", 555: "555"}
    assert spark.conf.get(conf_key) == before
