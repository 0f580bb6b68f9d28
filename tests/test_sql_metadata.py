"""information_schema-equivalent surface (reference enables DataFusion's
information_schema + EXPLAIN through the SQL passthrough,
columnq/src/columnq.rs:50-51): SHOW TABLES / DESCRIBE / EXPLAIN /
spark.catalog all work through the same passthrough here."""

from __future__ import annotations

import pytest

from roapi_spark.catalog import Catalog
from roapi_spark.config import parse_table_config


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("meta") / "t.csv"
    p.write_text("id,name\n1,a\n")
    c = Catalog(spark)
    c.load_table(parse_table_config({"name": "meta_t", "uri": str(p)}))
    return c


def test_show_tables(cat):
    names = {r.tableName for r in cat.query_sql("SHOW TABLES").collect()}
    assert "meta_t" in names


def test_describe(cat):
    rows = {r.col_name: r.data_type for r in cat.query_sql("DESCRIBE meta_t").collect()}
    assert rows == {"id": "int", "name": "string"}


def test_explain_passthrough(cat):
    out = cat.query_sql("EXPLAIN SELECT id FROM meta_t WHERE id > 0").collect()
    assert "Physical Plan" in out[0].plan


def test_catalog_listing(cat):
    tables = [t.name for t in cat.spark.catalog.listTables()]
    assert "meta_t" in tables
    cols = [c.name for c in cat.spark.catalog.listColumns("meta_t")]
    assert cols == ["id", "name"]


def test_information_schema_tables(cat):
    # literal information_schema.* queries (DataFusion-native in the
    # reference; rewritten onto catalog-backed views here)
    rows = cat.query_sql(
        "SELECT table_name, table_type FROM information_schema.tables "
        "WHERE table_schema = 'public'"
    ).collect()
    assert ("meta_t", "BASE TABLE") in {(r.table_name, r.table_type) for r in rows}


def test_information_schema_columns(cat):
    rows = cat.query_sql(
        "SELECT column_name, data_type, ordinal_position, is_nullable "
        "FROM Information_Schema.Columns WHERE table_name = 'meta_t' "
        "ORDER BY ordinal_position"
    ).collect()
    assert [(r.column_name, r.data_type, r.ordinal_position) for r in rows] == [
        ("id", "int", 1),
        ("name", "string", 2),
    ]
    assert all(r.is_nullable == "YES" for r in rows)
