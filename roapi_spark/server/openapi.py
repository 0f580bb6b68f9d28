"""OpenAPI 3.0 document generation for the REST layer — the reference's
own unchecked roadmap box ('[ ] auto gen OpenAPI doc for rest layer',
README.md). The spec is derived live from the catalog: one
``/api/tables/{name}`` path item per registered table with its REST
query parameters (columns/sort/limit/page/filter[col]op=) and a typed
response schema built from the table's Spark schema, plus the fixed
SQL/GraphQL/schema/KV/health routes."""

from __future__ import annotations

# keys are StructType.jsonValue() names (the shape catalog.schema emits)
_SPARK_TO_OAS = {
    "string": ("string", None),
    "boolean": ("boolean", None),
    "byte": ("integer", "int32"),
    "short": ("integer", "int32"),
    "integer": ("integer", "int32"),
    "long": ("integer", "int64"),
    "float": ("number", "float"),
    "double": ("number", "double"),
    "date": ("string", "date"),
    "timestamp": ("string", "date-time"),
    "timestamp_ntz": ("string", "date-time"),
    "binary": ("string", "byte"),
}


def _field_schema(dtype) -> dict:
    # nested types arrive as jsonValue dicts, not strings
    if isinstance(dtype, dict):
        t = dtype.get("type")
        if t == "array":
            return {"type": "array",
                    "items": _field_schema(dtype.get("elementType"))}
        if t == "struct":
            return {
                "type": "object",
                "properties": {
                    f["name"]: _field_schema(f["type"])
                    for f in dtype.get("fields", [])
                },
            }
        if t == "map":
            return {"type": "object",
                    "additionalProperties": _field_schema(dtype.get("valueType"))}
        return {"type": "object", "description": f"spark type: {t}"}
    if isinstance(dtype, str) and dtype.startswith("decimal"):
        return {"type": "number", "description": f"spark type: {dtype}"}
    t, fmt = _SPARK_TO_OAS.get(dtype, ("string", None))
    out: dict = {"type": t}
    if fmt:
        out["format"] = fmt
    if dtype not in _SPARK_TO_OAS:
        out["description"] = f"spark type: {dtype}"
    return out


def _table_item(name: str, fields: list[dict]) -> dict:
    props = {f["name"]: _field_schema(f["type"]) for f in fields}
    params = [
        {"name": "columns", "in": "query", "required": False,
         "schema": {"type": "string"},
         "description": "comma-separated projection"},
        {"name": "sort", "in": "query", "required": False,
         "schema": {"type": "string"},
         "description": "comma-separated sort keys; leading '-' = descending"},
        {"name": "limit", "in": "query", "required": False,
         "schema": {"type": "integer"}},
        {"name": "page", "in": "query", "required": False,
         "schema": {"type": "integer"},
         "description": "0-based page of `limit` rows"},
    ]
    for f in fields:
        if isinstance(f["type"], dict):
            continue  # nested columns are not filterable via REST
        params.append(
            {"name": f"filter[{f['name']}]", "in": "query", "required": False,
             "schema": {"type": "string"},
             "description": "eq filter; operator forms: "
                            f"filter[{f['name']}]op= with op in "
                            "eq,lt,lteq,gt,gteq (plus `like` for strings)"}
        )
    return {
        "get": {
            "summary": f"Query table {name}",
            "parameters": params,
            "responses": {
                "200": {
                    "description": "rows",
                    "content": {
                        "application/json": {
                            "schema": {
                                "type": "array",
                                "items": {"type": "object", "properties": props},
                            }
                        }
                    },
                },
                "400": {"$ref": "#/components/responses/QueryError"},
            },
        }
    }


def openapi_doc(catalog, version: str) -> dict:
    sql_op = {
        "requestBody": {
            "required": True,
            "content": {"text/plain": {"schema": {"type": "string"}}},
        },
        "responses": {
            "200": {"description": "result rows (content negotiated: json, "
                                   "csv, parquet, arrow file/stream, msgpack)"},
            "400": {"$ref": "#/components/responses/QueryError"},
        },
    }
    paths: dict = {
        "/health": {"get": {"responses": {"200": {"description": "OK"}}}},
        "/api/version": {"get": {"responses": {"200": {"description": "version string"}}}},
        "/api/sql": {"post": {"summary": "Execute SQL", **sql_op}},
        "/api/graphql": {"post": {"summary": "Execute a GraphQL query", **sql_op}},
        "/api/schema": {"get": {"responses": {"200": {"description": "all table schemas"}}}},
    }
    for name, sch in sorted(catalog.schemas().items()):
        fields = sch["fields"]
        paths[f"/api/tables/{name}"] = _table_item(name, fields)
        paths[f"/api/schema/{name}"] = {
            "get": {"responses": {"200": {"description": f"schema of {name}"}}}
        }
    for kv in sorted(getattr(catalog, "_kv_sources", {})):
        paths[f"/api/kv/{kv}/{{key}}"] = {
            "get": {
                "parameters": [{"name": "key", "in": "path", "required": True,
                                "schema": {"type": "string"}}],
                "responses": {"200": {"description": "value (empty if missing)"}},
            }
        }
    return {
        "openapi": "3.0.3",
        "info": {"title": "roapi_spark", "version": version},
        "paths": paths,
        "components": {
            "responses": {
                "QueryError": {
                    "description": "query error",
                    "content": {
                        "application/json": {
                            "schema": {
                                "type": "object",
                                "properties": {
                                    "code": {"type": "integer"},
                                    "error": {"type": "string"},
                                    "message": {"type": "string"},
                                },
                            }
                        }
                    },
                }
            }
        },
    }
