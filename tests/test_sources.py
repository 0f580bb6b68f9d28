"""Loader tests over synthesized fixtures mirroring the reference's test
corpus shapes (FIXTURES.md: uk_cities CSV, spacex-like nested NDJSON,
ubuntu_ami-like array-encoded JSON with pointer, partitioned CSV,
blogs-like parquet, sqlite, arrow IPC)."""

from __future__ import annotations

import json
import sqlite3

import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq
import pytest

from roapi_spark.config import parse_table_config
from roapi_spark.sources import load_table
from roapi_spark.sources.json_doc import resolve_pointer

CITIES = [("london", 51.5074, -0.1278), ("leeds", 53.8008, -1.5491), ("york", 53.96, -1.08)]


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    root = tmp_path_factory.mktemp("src_fixtures")
    # csv with header
    csv = root / "uk_cities.csv"
    csv.write_text("city,lat,lng\n" + "\n".join(f"{c},{a},{b}" for c, a, b in CITIES))
    # partitioned csv year=/month=
    for y, m, rows in [
        (2022, 12, [(100, 0.5), (101, 7.8), (102, 4.0)]),
        (2023, 1, [(201, -1.0), (202, 100.0), (203, 0.0)]),
    ]:
        d = root / "pcsv" / f"year={y}" / f"month={m}"
        d.mkdir(parents=True)
        (d / "p001.csv").write_text("ts,value\n" + "\n".join(f"{t},{v}" for t, v in rows))
    # document json with pointer + array_encoded rows
    (root / "ami.json").write_text(
        json.dumps({"aaData": [["us-east-1", "jammy", "22.04"], ["eu-west-1", "focal", "20.04"]]})
    )
    # plain document json (top-level array, nested structs)
    (root / "launches.json").write_text(
        json.dumps(
            [
                {"id": "a", "success": True, "cores": [{"flight": 1, "reused": False}]},
                {"id": "b", "success": None, "cores": []},
            ]
        )
    )
    # ndjson
    (root / "events.ndjson").write_text(
        '{"id": 1, "tags": ["x", "y"], "meta": {"k": "v"}}\n{"id": 2, "tags": [], "meta": {"k": null}}\n'
    )
    # parquet with nulls
    pq.write_table(
        pa.table({"blog_id": [1, 2, None], "reply_id": [None, 5, None]}),
        root / "blogs.parquet",
    )
    # sqlite
    db = root / "sample.db"
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE uk_cities (city TEXT, lat REAL, lng REAL)")
    conn.executemany("INSERT INTO uk_cities VALUES (?,?,?)", CITIES)
    conn.commit()
    conn.close()
    # arrow ipc file + stream
    t = pa.table({"city": [c for c, _, _ in CITIES], "lat": [a for _, a, _ in CITIES]})
    with ipc.new_file(str(root / "cities.arrow"), t.schema) as w:
        w.write_table(t)
    with ipc.new_stream(str(root / "cities.arrows"), t.schema) as w:
        w.write_table(t)
    return root


def _load(spark, cfg: dict):
    return load_table(spark, parse_table_config(cfg))


def test_csv_infer(spark, fixtures):
    df = _load(spark, {"name": "c", "uri": str(fixtures / "uk_cities.csv")})
    assert df.count() == 3
    assert dict(df.dtypes)["lat"] == "double"


def test_csv_declared_schema(spark, fixtures):
    df = _load(
        spark,
        {
            "name": "c",
            "uri": str(fixtures / "uk_cities.csv"),
            "schema": {
                "columns": [
                    {"name": "city", "data_type": "Utf8"},
                    {"name": "lat", "data_type": "Float32"},
                    {"name": "lng", "data_type": "Float32"},
                ]
            },
        },
    )
    assert dict(df.dtypes) == {"city": "string", "lat": "float", "lng": "float"}


def test_partitioned_csv(spark, fixtures):
    df = _load(
        spark,
        {
            "name": "p",
            "uri": str(fixtures / "pcsv"),
            "option": {"format": "csv"},
            "partition_columns": [
                {"name": "year", "data_type": "Int32"},
                {"name": "month", "data_type": "Int32"},
            ],
        },
    )
    rows = sorted((r.year, r.month, r.ts, r.value) for r in df.collect())
    assert rows == [
        (2022, 12, 100, 0.5),
        (2022, 12, 101, 7.8),
        (2022, 12, 102, 4.0),
        (2023, 1, 201, -1.0),
        (2023, 1, 202, 100.0),
        (2023, 1, 203, 0.0),
    ]
    assert dict(df.dtypes)["year"] == "int"
    # partition pruning: filter on partition col must prune the file list
    plan = df.filter("year = 2023")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(year" in plan


def test_json_pointer_array_encoded(spark, fixtures):
    df = _load(
        spark,
        {
            "name": "ami",
            "uri": str(fixtures / "ami.json"),
            "option": {"format": "json", "pointer": "/aaData", "array_encoded": True},
            "schema": {
                "columns": [
                    {"name": "zone", "data_type": "Utf8"},
                    {"name": "name", "data_type": "Utf8"},
                    {"name": "version", "data_type": "Utf8"},
                ]
            },
        },
    )
    rows = {tuple(r) for r in df.collect()}
    assert rows == {("us-east-1", "jammy", "22.04"), ("eu-west-1", "focal", "20.04")}


def test_json_nested(spark, fixtures):
    df = _load(spark, {"name": "l", "uri": str(fixtures / "launches.json")})
    assert df.count() == 2
    assert "cores" in dict(df.dtypes)
    assert df.filter("success IS NULL").count() == 1
    # nested access through SQL
    df.createOrReplaceTempView("launches_t")
    n = spark.sql(
        "SELECT count(*) AS n FROM launches_t WHERE size(cores) > 0"
    ).collect()[0].n
    assert n == 1


def test_ndjson(spark, fixtures):
    df = _load(spark, {"name": "e", "uri": str(fixtures / "events.ndjson")})
    assert df.count() == 2
    assert df.select("meta.k").where("id = 1").collect()[0][0] == "v"


def test_parquet_nulls(spark, fixtures):
    df = _load(spark, {"name": "b", "uri": str(fixtures / "blogs.parquet")})
    assert df.where("reply_id IS NULL").count() == 2


def test_sqlite(spark, fixtures):
    df = _load(
        spark,
        {"name": "uk_cities", "uri": f"sqlite://{fixtures}/sample.db"},
    )
    assert df.count() == 3
    assert {r.city for r in df.collect()} == {"london", "leeds", "york"}


def test_arrow_ipc_file_and_stream(spark, fixtures):
    for fname in ("cities.arrow", "cities.arrows"):
        df = _load(spark, {"name": "a", "uri": str(fixtures / fname)})
        assert df.count() == 3
        assert dict(df.dtypes)["lat"] == "double"


def test_resolve_pointer():
    doc = {"a": {"b/c": [{"~x": 1}]}}
    assert resolve_pointer(doc, "/a/b~1c/0/~0x") == 1
    assert resolve_pointer([1, 2], "") == [1, 2]


def test_http_source(spark, fixtures):
    import functools
    import http.server
    import threading

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(fixtures)
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        port = httpd.server_address[1]
        df = _load(
            spark,
            {"name": "h", "uri": f"http://127.0.0.1:{port}/uk_cities.csv"},
        )
        assert df.count() == 3
    finally:
        httpd.shutdown()


def test_gsheets_values_inference(spark):
    from roapi_spark.sources.gsheets import values_to_dataframe

    values = [
        ["name", "n", "flag", "mixed"],
        ["a", "1", "true", "1"],
        ["b", "2.5", "false", "x"],
        ["c", "", "true", ""],
    ]
    df = values_to_dataframe(spark, values)
    assert dict(df.dtypes) == {
        "name": "string",
        "n": "double",  # int+float conflict -> float
        "flag": "boolean",
        "mixed": "string",  # conflict -> string upcast
    }
    rows = df.collect()
    assert rows[0].n == 1.0 and rows[2].n is None


def _col_letters(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        s = chr(ord("A") + rem) + s
    return s


def _write_xlsx(path, sheets: dict[str, list[list]]):
    """Hand-rolled minimal OOXML workbook (enough for the decoder: shared
    + inline strings, bools, numbers, gaps)."""
    import zipfile

    shared: list[str] = []

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if v not in shared:
            shared.append(v)
        return f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    sheet_xmls = []
    for rows in sheets.values():
        body = "".join(
            f'<row r="{ri + 1}">'
            + "".join(cell_xml(f"{_col_letters(ci)}{ri + 1}", v) for ci, v in enumerate(row))
            + "</row>"
            for ri, row in enumerate(rows)
        )
        sheet_xmls.append(f'<worksheet {ns}><sheetData>{body}</sheetData></worksheet>')
    wb_sheets = "".join(
        f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(sheets)
    )
    rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
        f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(sheets))
    )
    sst = "".join(f"<si><t>{s}</t></si>" for s in shared)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", f"<workbook {ns} {rns}><sheets>{wb_sheets}</sheets></workbook>")
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
            f'relationships">{rels}</Relationships>',
        )
        zf.writestr("xl/sharedStrings.xml", f"<sst {ns}>{sst}</sst>")
        for i, xml in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)


def test_excel_xlsx_decode(spark, fixtures):
    # pure-Python decode path (sources/xlsx.py standing in for calamine,
    # excel.rs:220-360): shared strings, bools, int-collapse, None gaps
    _write_xlsx(
        fixtures / "wb.xlsx",
        {
            "cities": [
                ["city", "pop", "capital"],
                ["london", 8900000, True],
                ["york", 141685, False],
                ["leeds", None, False],
            ],
            "extra": [["k", "v"], ["a", 1.5]],
        },
    )
    df = _load(spark, {"name": "x", "uri": str(fixtures / "wb.xlsx")})
    assert df.count() == 3
    got = {r.city: (r.pop, r.capital) for r in df.collect()}
    assert got["london"] == (8900000, True)
    assert got["leeds"] == (None, False)
    # sheet selection by name
    df2 = _load(
        spark,
        {"name": "x", "uri": str(fixtures / "wb.xlsx"), "option": {"sheet_name": "extra"}},
    )
    assert df2.collect()[0].v == 1.5


def test_excel_range_windows(spark, fixtures):
    # rows/columns range windows (excel.rs:36-94): skip a title banner row
    # and clip to 2 data rows x 2 columns
    _write_xlsx(
        fixtures / "win.xlsx",
        {
            "s": [
                ["TITLE BANNER", None, None],
                ["a", "b", "c"],
                [1, 10, 100],
                [2, 20, 200],
                [3, 30, 300],
            ]
        },
    )
    df = _load(
        spark,
        {
            "name": "w",
            "uri": str(fixtures / "win.xlsx"),
            "option": {
                "rows_range_start": 1,
                "rows_range_end": 3,
                "columns_range_start": 0,
                "columns_range_end": 1,
            },
        },
    )
    assert df.columns == ["a", "b"]
    assert [(r.a, r.b) for r in df.orderBy("a").collect()] == [(1, 10), (2, 20)]


def _write_ods(path, rows: list[list], name: str = "Sheet1"):
    """Hand-rolled minimal OpenDocument spreadsheet (enough for the
    decoder: value types, text runs, repeated empty cells like
    LibreOffice's trailing-column padding)."""
    import zipfile

    def cell_xml(v) -> str:
        if v is None:
            return "<table:table-cell/>"
        if isinstance(v, bool):
            return (
                f'<table:table-cell office:value-type="boolean" '
                f'office:boolean-value="{"true" if v else "false"}"/>'
            )
        if isinstance(v, (int, float)):
            return (
                f'<table:table-cell office:value-type="float" '
                f'office:value="{v}"><text:p>{v}</text:p></table:table-cell>'
            )
        return (
            '<table:table-cell office:value-type="string">'
            f"<text:p>{v}</text:p></table:table-cell>"
        )

    body = "".join(
        "<table:table-row>"
        + "".join(cell_xml(v) for v in row)
        # LibreOffice-style trailing empty-column padding: must cost nothing
        + '<table:table-cell table:number-columns-repeated="1018"/>'
        "</table:table-row>"
        for row in rows
    )
    content = (
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        f'<table:table table:name="{name}">{body}</table:table>'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)


def test_excel_ods_decode_with_ranges(spark, fixtures):
    # OpenDocument decode (sources/ods.py standing in for calamine) with
    # the same range windows the reference's ods e2e uses
    # (excel.rs:695-718 on test_data/excel_range.ods: skip banner rows,
    # clip the skip columns, 3 data rows survive)
    _write_ods(
        fixtures / "rng.ods",
        [
            ["skip this", None, None, None, None, None],
            ["skip this"] * 6,
            ["skip_col", "bool_column", "int_column", "float_column", "string_column", "skip_col2"],
            [1, True, 1, 1.1, "one", 1],
            [2, False, 2, 2.2, "two", 2],
            [3, True, 3, 3.3, "three", 3],
        ],
    )
    df = _load(
        spark,
        {
            "name": "r",
            "uri": str(fixtures / "rng.ods"),
            "option": {
                "rows_range_start": 2,
                "rows_range_end": 5,
                "columns_range_start": 1,
                "columns_range_end": 4,
            },
        },
    )
    assert df.columns == ["bool_column", "int_column", "float_column", "string_column"]
    assert df.count() == 3
    got = {r.int_column: (r.bool_column, r.float_column, r.string_column) for r in df.collect()}
    assert got[2] == (False, 2.2, "two")


def test_excel_ods_utf8_upcast(spark, fixtures):
    # conflict -> Utf8 upcast (excel.rs:158-167) applies to ods like xlsx
    _write_ods(
        fixtures / "mix.ods",
        [["mixed", "ok"], [1, "a"], ["x", "b"], [2.5, "c"]],
    )
    df = _load(spark, {"name": "m", "uri": str(fixtures / "mix.ods")})
    assert dict(df.dtypes)["mixed"] == "string"
    assert {r.mixed for r in df.collect()} == {"1", "x", "2.5"}


def test_excel_gated(spark, fixtures):
    # legacy .xls (not a zip) must fail with the dependency hint, not a
    # bare traceback
    import pytest as _pytest

    from roapi_spark.sources import LoadError

    (fixtures / "x.xlsx").write_bytes(b"\xd0\xcf\x11\xe0 not a real workbook")
    with _pytest.raises((LoadError, Exception)):
        _load(spark, {"name": "x", "uri": str(fixtures / "x.xlsx")})


def test_http_source_custom_headers(spark, fixtures):
    # reference: tables served over HTTP with custom headers
    # (roapi/tests/http_table_test.rs:10-50) via io_option.headers
    import http.server
    import threading

    seen = {}

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(fixtures), **kw)

        def do_GET(self):
            seen["auth"] = self.headers.get("Authorization")
            super().do_GET()

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        from roapi_spark.config import parse_table_config
        from roapi_spark.sources import load_table

        port = httpd.server_address[1]
        ts = parse_table_config(
            {
                "name": "h2",
                "uri": f"http://127.0.0.1:{port}/uk_cities.csv",
                "io_option": {"headers": {"Authorization": "Bearer tok123"}},
            }
        )
        assert load_table(spark, ts).count() == 3
        assert seen["auth"] == "Bearer tok123"
    finally:
        httpd.shutdown()


def test_parquet_schema_from_files(spark, fixtures):
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    d = fixtures / "multi_pq"
    d.mkdir(exist_ok=True)
    _pq.write_table(_pa.table({"a": [1, 2]}), d / "p1.parquet")
    _pq.write_table(_pa.table({"a": [3], "b": ["x"]}), d / "p2.parquet")
    df = _load(
        spark,
        {
            "name": "m",
            "uri": str(d),
            "option": {"format": "parquet", "mergeSchema": True},
        },
    )
    assert set(df.columns) == {"a", "b"}
    assert df.count() == 3 and df.where("b IS NULL").count() == 2


# -- object-store conf mapping (columnq/src/columnq.rs:209-273 parity) -------


def test_object_store_s3_conf_mapping(spark):
    from roapi_spark.config import parse_table_config
    from roapi_spark.sources.object_store import (
        apply_object_store_conf,
        hadoop_confs_for,
        rewrite_uri,
    )

    ts = parse_table_config(
        {
            "name": "cloud",
            "uri": "s3://bucket/path/blogs.parquet",
            "io_option": {
                "access_key_id": "AKID",
                "secret_access_key": "SEKRET",
                "endpoint": "http://minio.local:9000",
                "region": "us-west-2",
                "session_token": "TOK",
                "allow_http": "true",
            },
        }
    )
    confs = hadoop_confs_for(ts)
    assert confs["fs.s3a.access.key"] == "AKID"
    assert confs["fs.s3a.secret.key"] == "SEKRET"
    assert confs["fs.s3a.endpoint"] == "http://minio.local:9000"
    assert confs["fs.s3a.endpoint.region"] == "us-west-2"
    assert confs["fs.s3a.session.token"] == "TOK"
    assert confs["fs.s3a.path.style.access"] == "true"
    assert confs["fs.s3a.connection.ssl.enabled"] == "false"
    assert rewrite_uri(ts.uri) == "s3a://bucket/path/blogs.parquet"
    # applying sets the Hadoop configuration + rewrites the ts URI
    ts2 = apply_object_store_conf(spark, ts)
    assert ts2.uri == "s3a://bucket/path/blogs.parquet"
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AKID"


def test_object_store_env_fallback(monkeypatch):
    from roapi_spark.config import parse_table_config
    from roapi_spark.sources.object_store import hadoop_confs_for

    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "ENVKEY")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "ENVSECRET")
    ts = parse_table_config({"name": "t", "uri": "s3://b/k.parquet"})
    confs = hadoop_confs_for(ts)
    assert confs["fs.s3a.access.key"] == "ENVKEY"
    assert confs["fs.s3a.secret.key"] == "ENVSECRET"
    # explicit io_option wins over env
    ts = parse_table_config(
        {"name": "t", "uri": "s3://b/k.parquet", "io_option": {"access_key_id": "X"}}
    )
    assert hadoop_confs_for(ts)["fs.s3a.access.key"] == "X"


def test_object_store_gcs_azure_mapping():
    from roapi_spark.config import parse_table_config
    from roapi_spark.sources.object_store import hadoop_confs_for, rewrite_uri

    gs = parse_table_config(
        {
            "name": "g",
            "uri": "gs://bucket/t.parquet",
            "io_option": {"service_account_path": "/tmp/sa.json", "project_id": "p1"},
        }
    )
    confs = hadoop_confs_for(gs)
    assert confs["fs.gs.auth.service.account.json.keyfile"] == "/tmp/sa.json"
    assert confs["fs.gs.project.id"] == "p1"
    assert rewrite_uri("gcs://b/x") == "gs://b/x"

    az = parse_table_config(
        {
            "name": "a",
            "uri": "az://container@myacct/path/t.parquet",
            "io_option": {"access_key": "AZKEY"},
        }
    )
    assert (
        rewrite_uri(az.uri)
        == "abfss://container@myacct.dfs.core.windows.net/path/t.parquet"
    )
    confs = hadoop_confs_for(az)
    assert confs["fs.azure.account.key.myacct.dfs.core.windows.net"] == "AZKEY"


# -- Delta Lake via pure-Python log replay (columnq/src/table/delta.rs) ------


@pytest.fixture(scope="module")
def delta_table(tmp_path_factory):
    """Hand-built minimal Delta table: v0 adds two files, v1 removes one
    and adds another — snapshot semantics without delta jars."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = tmp_path_factory.mktemp("delta") / "blogs"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _pq.write_table(_pa.table({"id": [1, 2], "title": ["a", "b"]}), root / "part-0.parquet")
    _pq.write_table(_pa.table({"id": [3], "title": ["c"]}), root / "part-1.parquet")
    _pq.write_table(_pa.table({"id": [4, 5], "title": ["d", "e"]}), root / "part-2.parquet")

    def commit(version, actions):
        (log / f"{version:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions)
        )

    commit(0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "m", "format": {"provider": "parquet"}, "schemaString": "{}"}},
        {"add": {"path": "part-0.parquet", "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "part-1.parquet", "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    commit(1, [
        {"remove": {"path": "part-1.parquet", "dataChange": True}},
        {"add": {"path": "part-2.parquet", "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    return root


def test_delta_log_replay_latest(spark, delta_table):
    df = _load(spark, {"name": "blogs", "uri": str(delta_table), "option": {"format": "delta"}})
    assert sorted(r.id for r in df.collect()) == [1, 2, 4, 5]  # part-1 removed


def test_delta_time_travel_version(spark, delta_table):
    df = _load(
        spark,
        {"name": "blogs", "uri": str(delta_table),
         "option": {"format": "delta", "version": 0}},
    )
    assert sorted(r.id for r in df.collect()) == [1, 2, 3]


def test_delta_time_travel_timestamp(spark, delta_table):
    import datetime

    future = (
        datetime.datetime.now() + datetime.timedelta(days=1)
    ).isoformat(timespec="seconds")
    df = _load(
        spark,
        {"name": "blogs", "uri": str(delta_table),
         "option": {"format": "delta", "timestamp": future}},
    )
    assert sorted(r.id for r in df.collect()) == [1, 2, 4, 5]


def test_delta_missing_log_errors(spark, tmp_path):
    from roapi_spark.sources import LoadError

    (tmp_path / "notdelta").mkdir()
    with pytest.raises(LoadError):
        _load(
            spark,
            {"name": "x", "uri": str(tmp_path / "notdelta"), "option": {"format": "delta"}},
        )


def _mk_delta(tmp_path, actions_by_version):
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = tmp_path / "dv"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _pq.write_table(_pa.table({"id": [1]}), root / "part-0.parquet")
    for version, actions in actions_by_version.items():
        (log / f"{version:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions)
        )
    return root


def test_delta_reader_version_guard(spark, tmp_path):
    """Modern-protocol reader features the replay can't honor (e.g.
    variantType) must fail loudly, not return wrong rows (delta-rs gives
    the reference these free, delta.rs:104-297). deletionVectors,
    columnMapping, and v2Checkpoint are honored since round 4."""
    from roapi_spark.sources import LoadError

    root = _mk_delta(tmp_path, {
        0: [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["variantType"]}},
            {"metaData": {"id": "m", "format": {"provider": "parquet"}}},
            {"add": {"path": "part-0.parquet", "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    })
    with pytest.raises(LoadError, match="variantType"):
        _load(spark, {"name": "x", "uri": str(root), "option": {"format": "delta"}})


def _cm_schema_string():
    """Spark StructType JSON with columnMapping physicalName metadata —
    the exact shape delta-spark writers produce for mode=name."""
    return json.dumps({
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aaa"}},
            {"name": "title", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bbb"}},
            {"name": "meta", "nullable": True,
             "type": {"type": "struct", "fields": [
                 {"name": "views", "type": "long", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 4,
                               "delta.columnMapping.physicalName": "col-ddd"}},
             ]},
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-ccc"}},
            {"name": "added_later", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 5,
                          "delta.columnMapping.physicalName": "col-eee"}},
        ],
    })


def test_delta_column_mapping_read(spark, tmp_path):
    """Column mapping mode=name: parquet files carry physical col-<uuid>
    names; the replay must surface logical names, rename nested struct
    fields, and null-fill columns added after the files were written
    (delta-rs gives the reference this free, delta.rs:104-297)."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = tmp_path / "cm"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _pq.write_table(
        _pa.table({
            "col-aaa": [1, 2],
            "col-bbb": ["a", "b"],
            "col-ccc": [{"col-ddd": 10}, {"col-ddd": 20}],
        }),
        root / "part-0.parquet",
    )
    (log / f"{0:020d}.json").write_text("\n".join(json.dumps(a) for a in [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "m", "format": {"provider": "parquet"},
                      "schemaString": _cm_schema_string(),
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "part-0.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]))
    df = _load(spark, {"name": "cm", "uri": str(root), "option": {"format": "delta"}})
    assert df.columns == ["id", "title", "meta", "added_later"]
    assert df.schema["meta"].dataType.fieldNames() == ["views"]
    rows = sorted(df.collect(), key=lambda r: r.id)
    assert [(r.id, r.title, r.meta.views, r.added_later) for r in rows] == [
        (1, "a", 10, None), (2, "b", 20, None),
    ]


def test_delta_column_mapping_reader_features(spark, tmp_path):
    """minReaderVersion=3 + readerFeatures=[columnMapping] (the modern
    spelling) reads the same way."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = tmp_path / "cm3"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    _pq.write_table(
        _pa.table({"col-aaa": [7], "col-bbb": ["z"],
                   "col-ccc": [{"col-ddd": 1}]}),
        root / "part-0.parquet",
    )
    (log / f"{0:020d}.json").write_text("\n".join(json.dumps(a) for a in [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"]}},
        {"metaData": {"id": "m", "format": {"provider": "parquet"},
                      "schemaString": _cm_schema_string(),
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": "part-0.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]))
    df = _load(spark, {"name": "cm3", "uri": str(root), "option": {"format": "delta"}})
    assert [(r.id, r.title) for r in df.collect()] == [(7, "z")]


def test_delta_column_mapping_unknown_mode_guard(spark, tmp_path):
    from roapi_spark.sources import LoadError

    root = _mk_delta(tmp_path, {
        0: [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": {"id": "m", "format": {"provider": "parquet"},
                          "configuration": {"delta.columnMapping.mode": "weird"}}},
            {"add": {"path": "part-0.parquet", "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    })
    with pytest.raises(LoadError, match="column mapping"):
        _load(spark, {"name": "x", "uri": str(root), "option": {"format": "delta"}})


def test_delta_deletion_vector_unreadable_guard(spark, tmp_path):
    # an add carrying a deletionVector that can't be decoded must fail
    # loudly, never silently surface deleted rows (the happy path lives
    # in test_deletion_vectors.py)
    from roapi_spark.sources import LoadError

    root = _mk_delta(tmp_path, {
        0: [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"add": {"path": "part-0.parquet", "size": 1, "modificationTime": 0,
                     "dataChange": True,
                     "deletionVector": {"storageType": "u", "pathOrInlineDv": "x",
                                        "sizeInBytes": 40, "cardinality": 1}}},
        ],
    })
    with pytest.raises(LoadError, match="deletion vector"):
        _load(spark, {"name": "x", "uri": str(root), "option": {"format": "delta"}})


def test_delta_timestamp_ntz_feature_allowed(spark, tmp_path):
    # timestampNtz is a type-level reader feature the parquet scan handles:
    # a v3 protocol that requires only it must still load
    root = _mk_delta(tmp_path, {
        0: [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["timestampNtz"]}},
            {"add": {"path": "part-0.parquet", "size": 1,
                     "modificationTime": 0, "dataChange": True}},
        ],
    })
    df = _load(spark, {"name": "x", "uri": str(root), "option": {"format": "delta"}})
    assert [r.id for r in df.collect()] == [1]


def test_gsheets_fetch_via_mock_api(spark):
    # full Sheets REST path (google_spreadsheets.rs: resolve sheet from
    # properties, then fetch values) against a local mock of the API
    import http.server
    import json as _json
    import threading

    seen = {}

    class SheetsMock(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen.setdefault("auth", self.headers.get("Authorization"))
            if "values" in self.path:
                body = {"values": [["city", "pop"], ["london", "8900000"], ["york", "141685"]]}
            else:
                body = {"sheets": [{"properties": {"title": "cities"}}]}
            data = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), SheetsMock)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = _load(
            spark,
            {
                "name": "g",
                "uri": "https://docs.google.com/spreadsheets/d/1abc_XY-9/edit#gid=0",
                "format": "google_spreadsheet",
                "option": {
                    "token": "tok123",
                    "api_base_url": f"http://127.0.0.1:{srv.server_address[1]}",
                },
            },
        )
        rows = {r.city: r.pop for r in df.collect()}
        assert rows == {"london": 8900000, "york": 141685}
        assert seen["auth"] == "Bearer tok123"
    finally:
        srv.shutdown()


def test_gsheets_no_credentials_gate(spark):
    import pytest as _pytest

    from roapi_spark.sources import LoadError
    from roapi_spark.sources.gsheets import spreadsheet_id_from_uri

    assert (
        spreadsheet_id_from_uri(
            "https://docs.google.com/spreadsheets/d/1QE0A-BCDefg/edit#gid=0"
        )
        == "1QE0A-BCDefg"
    )
    with _pytest.raises(LoadError, match="credentials"):
        _load(
            spark,
            {
                "name": "g",
                "uri": "https://docs.google.com/spreadsheets/d/1abc/edit",
                "format": "google_spreadsheet",
            },
        )


def test_orc_scan(spark, fixtures):
    # ORC is Spark-native (beyond the reference's formats, zero deps):
    # lazy scan with declared-schema cast, pushdown comes free
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    path = str(fixtures / "t_orc")
    src.write.mode("overwrite").orc(path)
    df = _load(spark, {"name": "t", "uri": path, "option": {"format": "orc"}})
    assert {(r.id, r.s) for r in df.collect()} == {(1, "a"), (2, "b")}
    plan = (
        df.filter("id = 2")._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "EqualTo(id,2)" in plan


# -- Delta checkpoints: classic, multi-part, v2 + sidecars -------------------


def _ckpt_table(rows):
    """Build a checkpoint parquet table: one action per row, struct
    columns protocol/metaData/add/remove/sidecar (absent cells None)."""
    import pyarrow as _pa

    cols = {
        "protocol": ({"minReaderVersion": None, "minWriterVersion": None}, [])
        ,
        "metaData": ({"id": None, "schemaString": None}, []),
        "add": ({"path": None, "size": None, "dataChange": None}, []),
        "remove": ({"path": None}, []),
        "sidecar": ({"path": None, "sizeInBytes": None}, []),
    }
    for row in rows:
        for c, (proto, vals) in cols.items():
            v = row.get(c)
            vals.append({**proto, **v} if v else None)
    arrays, names = [], []
    for c, (_proto, vals) in cols.items():
        if any(vals):
            arrays.append(_pa.array(vals))
            names.append(c)
    return _pa.table(dict(zip(names, arrays)))


def _delta_root(tmp_path, parts):
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = tmp_path / "ck"
    (root / "_delta_log").mkdir(parents=True)
    for name, ids in parts.items():
        _pq.write_table(
            _pa.table({"id": _pa.array(ids, type=_pa.int64())}), root / name
        )
    return root


def test_delta_classic_checkpoint_seed(spark, tmp_path):
    import pyarrow.parquet as _pq

    root = _delta_root(tmp_path, {"a.parquet": [1], "b.parquet": [2], "c.parquet": [3]})
    log = root / "_delta_log"
    _pq.write_table(
        _ckpt_table([
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "m"}},
            {"add": {"path": "a.parquet", "size": 1, "dataChange": True}},
            {"add": {"path": "b.parquet", "size": 1, "dataChange": True}},
        ]),
        log / f"{10:020d}.checkpoint.parquet",
    )
    (log / "_last_checkpoint").write_text(json.dumps({"version": 10}))
    # a commit before the checkpoint must be ignored; one after applies
    (log / f"{10:020d}.json").write_text(json.dumps(
        {"add": {"path": "zzz-not-used.parquet", "dataChange": True}}))
    (log / f"{11:020d}.json").write_text("\n".join([
        json.dumps({"remove": {"path": "b.parquet", "dataChange": True}}),
        json.dumps({"add": {"path": "c.parquet", "size": 1,
                            "modificationTime": 0, "dataChange": True}}),
    ]))
    df = _load(spark, {"name": "ck", "uri": str(root), "option": {"format": "delta"}})
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_delta_multipart_checkpoint(spark, tmp_path):
    import pyarrow.parquet as _pq

    root = _delta_root(tmp_path, {"a.parquet": [1], "b.parquet": [2]})
    log = root / "_delta_log"
    _pq.write_table(
        _ckpt_table([
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "m"}},
            {"add": {"path": "a.parquet", "size": 1, "dataChange": True}},
        ]),
        log / f"{5:020d}.checkpoint.{1:010d}.{2:010d}.parquet",
    )
    _pq.write_table(
        _ckpt_table([
            {"add": {"path": "b.parquet", "size": 1, "dataChange": True}},
        ]),
        log / f"{5:020d}.checkpoint.{2:010d}.{2:010d}.parquet",
    )
    (log / "_last_checkpoint").write_text(json.dumps({"version": 5, "parts": 2}))
    (log / f"{5:020d}.json").write_text("")
    df = _load(spark, {"name": "ck", "uri": str(root), "option": {"format": "delta"}})
    assert sorted(r.id for r in df.collect()) == [1, 2]


def test_delta_v2_checkpoint_json_with_sidecars(spark, tmp_path):
    import pyarrow.parquet as _pq

    root = _delta_root(tmp_path, {"a.parquet": [1], "b.parquet": [2], "c.parquet": [3]})
    log = root / "_delta_log"
    (log / "_sidecars").mkdir()
    _pq.write_table(
        _ckpt_table([
            {"add": {"path": "a.parquet", "size": 1, "dataChange": True}},
            {"add": {"path": "b.parquet", "size": 1, "dataChange": True}},
            {"remove": {"path": "b.parquet"}},
        ]),
        log / "_sidecars" / "sc-001.parquet",
    )
    v2 = [
        {"checkpointMetadata": {"version": 7, "tags": {}}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"]}},
        {"metaData": {"id": "m", "format": {"provider": "parquet"},
                      "schemaString": "{}"}},
        {"sidecar": {"path": "sc-001.parquet", "sizeInBytes": 1}},
    ]
    (log / f"{7:020d}.checkpoint.80a083e8-7026.json").write_text(
        "\n".join(json.dumps(a) for a in v2))
    (log / "_last_checkpoint").write_text(json.dumps({"version": 7}))
    (log / f"{7:020d}.json").write_text("")
    (log / f"{8:020d}.json").write_text(json.dumps(
        {"add": {"path": "c.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}}))
    df = _load(spark, {"name": "ck", "uri": str(root), "option": {"format": "delta"}})
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_delta_checkpoint_allnull_dv_struct(spark, tmp_path):
    """Checkpoint writers materialize the absent deletionVector struct as
    all-None fields; that must not route the file through DV decoding."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = _delta_root(tmp_path, {"a.parquet": [7]})
    log = root / "_delta_log"
    dv_none = {"storageType": None, "pathOrInlineDv": None, "offset": None,
               "sizeInBytes": None, "cardinality": None}
    tbl = _pa.table({
        "protocol": _pa.array([{"minReaderVersion": 1, "minWriterVersion": 2},
                               None, None]),
        "metaData": _pa.array([None, {"id": "m", "schemaString": None}, None]),
        "add": _pa.array(
            [None, None,
             {"path": "a.parquet", "size": 1, "dataChange": True,
              "deletionVector": dv_none}],
            type=_pa.struct([
                ("path", _pa.string()), ("size", _pa.int64()),
                ("dataChange", _pa.bool_()),
                ("deletionVector", _pa.struct([
                    ("storageType", _pa.string()),
                    ("pathOrInlineDv", _pa.string()),
                    ("offset", _pa.int32()),
                    ("sizeInBytes", _pa.int32()),
                    ("cardinality", _pa.int64()),
                ])),
            ]),
        ),
    })
    _pq.write_table(tbl, log / f"{3:020d}.checkpoint.parquet")
    (log / "_last_checkpoint").write_text(json.dumps({"version": 3}))
    (log / f"{3:020d}.json").write_text("")
    df = _load(spark, {"name": "x", "uri": str(root), "option": {"format": "delta"}})
    assert [r.id for r in df.collect()] == [7]


# -- Airtable (reference's own unchecked roadmap box) ------------------------


@pytest.fixture(scope="module")
def airtable_mock():
    """Local mock of the Airtable Web API: bearer-auth check + two-page
    offset-cursor pagination."""
    import http.server
    import threading
    import urllib.parse as _up

    class H(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.headers.get("Authorization") != "Bearer key123":
                self.send_response(401)
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"{}")
                return
            q = dict(_up.parse_qsl(_up.urlparse(self.path).query))
            if "offset" not in q:
                payload = {
                    "records": [
                        {"id": "rec1", "createdTime": "2024-01-01T00:00:00.000Z",
                         "fields": {"Name": "a", "Qty": 3}},
                        {"id": "rec2", "createdTime": "2024-01-02T00:00:00.000Z",
                         "fields": {"Name": "b"}},  # sparse fields
                    ],
                    "offset": "itrNEXT",
                }
            else:
                assert q["offset"] == "itrNEEXT".replace("EE", "E")
                payload = {
                    "records": [
                        {"id": "rec3", "createdTime": "2024-01-03T00:00:00.000Z",
                         "fields": {"Name": "c", "Qty": 7, "Done": True}},
                    ]
                }
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = __import__("http.server", fromlist=["ThreadingHTTPServer"]).ThreadingHTTPServer(
        ("127.0.0.1", 0), H
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_airtable_paginated_fetch(spark, airtable_mock):
    df = _load(spark, {
        "name": "tasks",
        "uri": "airtable://appBASE/Tasks",
        "option": {"api_key": "key123", "api_base_url": airtable_mock},
    })
    rows = {r._id: r for r in df.collect()}
    assert set(rows) == {"rec1", "rec2", "rec3"}  # both pages landed
    assert rows["rec1"].Name == "a" and rows["rec1"].Qty == 3
    assert rows["rec2"].Qty is None  # sparse field -> NULL
    assert rows["rec3"].Done is True
    assert rows["rec3"]._created_time == "2024-01-03T00:00:00.000Z"


def test_airtable_bad_key_fails_loudly(spark, airtable_mock):
    from roapi_spark.sources import LoadError

    with pytest.raises(LoadError, match="airtable API error 401"):
        _load(spark, {
            "name": "tasks",
            "uri": "airtable://appBASE/Tasks",
            "option": {"api_key": "WRONG", "api_base_url": airtable_mock},
        })


def test_airtable_needs_key(spark, monkeypatch):
    from roapi_spark.sources import LoadError

    monkeypatch.delenv("AIRTABLE_API_KEY", raising=False)
    with pytest.raises(LoadError, match="no API key"):
        _load(spark, {"name": "t", "uri": "airtable://appX/T"})


def test_delta_replay_partition_pruning(spark, tmp_path):
    """The pure-Python replay hands Spark an explicit file list with
    basePath — hive-style partition dirs must still surface as columns
    AND prune at the scan (the property that matters at 100 TB)."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = tmp_path / "pdelta"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    for y, ids in ((2023, [1, 2]), (2024, [3])):
        d = root / f"year={y}"
        d.mkdir()
        _pq.write_table(_pa.table({"id": _pa.array(ids, type=_pa.int64())}),
                        d / "part-0.parquet")
    (log / f"{0:020d}.json").write_text("\n".join(json.dumps(a) for a in [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "m", "format": {"provider": "parquet"},
                      "schemaString": "{}"}},
        {"add": {"path": "year=2023/part-0.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "partitionValues": {"year": "2023"}}},
        {"add": {"path": "year=2024/part-0.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "partitionValues": {"year": "2024"}}},
    ]))
    df = _load(spark, {"name": "pd", "uri": str(root), "option": {"format": "delta"}})
    assert sorted(r.id for r in df.collect()) == [1, 2, 3]
    filtered = df.filter("year = 2024")
    assert [r.id for r in filtered.collect()] == [3]
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(year" in plan


@pytest.fixture(scope="module")
def delta_cdf_table(tmp_path_factory):
    """Delta table with a Change Data Feed history: v0 blind insert
    (derived), v1 explicit cdc files (update pre/post images), v2 remove
    (derived delete)."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = tmp_path_factory.mktemp("delta_cdf") / "accounts"
    log = root / "_delta_log"
    (root / "_change_data").mkdir(parents=True)
    log.mkdir(parents=True)
    _pq.write_table(_pa.table({"id": [1, 2], "bal": [10.0, 20.0]}), root / "f0.parquet")
    _pq.write_table(_pa.table({"id": [1], "bal": [11.0]}), root / "f1.parquet")
    _pq.write_table(
        _pa.table({
            "id": [1, 1],
            "bal": [10.0, 11.0],
            "_change_type": ["update_preimage", "update_postimage"],
        }),
        root / "_change_data" / "cdc-0.parquet",
    )

    def commit(version, actions):
        (log / f"{version:020d}.json").write_text(
            "\n".join(json.dumps(a) for a in actions)
        )

    commit(0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {"metaData": {"id": "m", "format": {"provider": "parquet"},
                      "schemaString": "{}",
                      "configuration": {"delta.enableChangeDataFeed": "true"}}},
        {"add": {"path": "f0.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": True}},
    ])
    commit(1, [
        {"cdc": {"path": "_change_data/cdc-0.parquet", "size": 1,
                 "dataChange": False}},
        {"remove": {"path": "f0.parquet", "dataChange": False}},
        {"add": {"path": "f1.parquet", "size": 1, "modificationTime": 0,
                 "dataChange": False}},
    ])
    commit(2, [
        {"remove": {"path": "f1.parquet", "dataChange": True}},
    ])
    return root


def test_delta_change_data_feed(spark, delta_cdf_table):
    from roapi_spark.sources.delta import table_changes

    ch = table_changes(spark, str(delta_cdf_table), 0).collect()
    by_ver = {}
    for r in ch:
        by_ver.setdefault(r["_commit_version"], []).append(r)
    # v0: derived inserts for both rows
    assert sorted((r["id"], r["_change_type"]) for r in by_ver[0]) == [
        (1, "insert"), (2, "insert")]
    # v1: explicit cdc pre/post images only (add/remove had dataChange=false)
    assert sorted((r["bal"], r["_change_type"]) for r in by_ver[1]) == [
        (10.0, "update_preimage"), (11.0, "update_postimage")]
    # v2: derived delete of the rewritten file's rows
    assert [(r["id"], r["_change_type"]) for r in by_ver[2]] == [(1, "delete")]
    assert all(r["_commit_timestamp"] is not None for r in ch)


def test_delta_cdf_version_range_and_loader_option(spark, delta_cdf_table):
    from roapi_spark.sources.delta import table_changes

    only_v1 = table_changes(spark, str(delta_cdf_table), 1, 1).collect()
    assert {r["_change_type"] for r in only_v1} == {
        "update_preimage", "update_postimage"}
    df = _load(spark, {
        "name": "ch", "uri": str(delta_cdf_table),
        "option": {"format": "delta", "changes_from": 2},
    })
    assert [(r["id"], r["_change_type"]) for r in df.collect()] == [(1, "delete")]


def test_binary_blob_directory_scan(spark, tmp_path):
    # the multimodal ingest seam: dir of real blobs -> one row per file
    import numpy as np

    from roapi_spark.config import TableSource
    from roapi_spark.functions.multimodal import encode_png
    from roapi_spark.sources import load_table

    d = tmp_path / "imgs"
    (d / "sub").mkdir(parents=True)
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    (d / "a.png").write_bytes(encode_png(img))
    (d / "sub" / "b.png").write_bytes(encode_png(img.T.copy()))
    (d / "notes.txt").write_bytes(b"not an image")

    ts = TableSource(
        name="blobs", uri=str(d), format="binary", option={"glob": "*.png"}
    )
    df = load_table(spark, ts)
    assert dict(df.dtypes)["content"] == "binary"
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert set(rows) == {"a.png", "b.png"}  # txt filtered, subdir recursed
    # the blobs round-trip through the real decoder
    from roapi_spark.functions.multimodal import decode_image

    assert decode_image(rows["a.png"]).shape == (8, 8)
    # non-recursive listing sees only the top level
    flat = load_table(
        spark,
        TableSource(
            name="flat",
            uri=str(d),
            format="binary",
            option={"glob": "*.png", "recursive": "false"},
        ),
    )
    assert flat.count() == 1
