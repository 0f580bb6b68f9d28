"""REST query-param planner.

Reference semantics (columnq/src/query/rest.rs):
- ``filter[col]`` / ``filter[col]eq`` / lt / lte|lteq / gt / gte|gteq
  (rest.rs:60-115); values are SQL-ish literals: quoted -> string,
  otherwise int then float then bare string (rest.rs:23-51).
- ``columns=c1,c2`` projection (rest.rs:117-123).
- ``sort=c1,-c2,+c3`` — ``-`` desc, bare/``+`` asc; **nulls first in both
  directions** (query/mod.rs:6-20). Spark's desc defaults to nulls-last, so
  we call desc_nulls_first explicitly.
- ``limit=N&page=P`` applied after sort (limit-after-sort determinism,
  rest.rs:139-153); skip = (page-1)*limit.
- Plan order is fixed: filters -> projection -> sort -> limit/page
  (rest.rs:64-155).

The planner only *builds* a DataFrame chain — Catalyst still pushes the
predicates into the scan, so a REST call over a 100 TB table reads only the
matching row groups / partitions.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FILTER_RE = re.compile(r"^filter\[(?P<col>[^\]]+)\](?P<op>\w*)$")

_OPS = {
    None: "eq",
    "": "eq",
    "eq": "eq",
    "lt": "lt",
    "lte": "lteq",
    "lteq": "lteq",
    "gt": "gt",
    "gte": "gteq",
    "gteq": "gteq",
}


class RestQueryError(ValueError):
    pass


def parse_literal(raw: str) -> Any:
    """SQL-ish literal parse (reference tokenizes via sqlparser,
    rest.rs:23-51): quoted string, else int, else float, else bare string;
    true/false -> boolean."""
    s = raw.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"'):
        return s[1:-1]
    low = s.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _apply_op(c: Column, op: str, value: Any) -> Column:
    if op == "eq":
        return c == F.lit(value)
    if op == "lt":
        return c < F.lit(value)
    if op == "lteq":
        return c <= F.lit(value)
    if op == "gt":
        return c > F.lit(value)
    if op == "gteq":
        return c >= F.lit(value)
    raise RestQueryError(f"unsupported filter op: {op}")


def sort_columns(sort_param: str) -> list[Column]:
    """``sort=c1,-c2,+c3`` -> order-by columns, nulls first both ways."""
    cols: list[Column] = []
    for token in sort_param.split(","):
        token = token.strip()
        if not token:
            continue
        if token.startswith("-"):
            cols.append(F.col(token[1:]).desc_nulls_first())
        elif token.startswith("+"):
            cols.append(F.col(token[1:]).asc_nulls_first())
        else:
            cols.append(F.col(token).asc_nulls_first())
    return cols


def rest_query_to_df(df: DataFrame, params: dict[str, str]) -> DataFrame:
    """Apply REST params in the reference's fixed order:
    filters -> projection -> sort -> limit/page."""
    # 1. filters (each ANDed via successive .filter, rest.rs:84-115)
    for key, raw in params.items():
        m = FILTER_RE.match(key)
        if not m:
            continue
        op = _OPS.get(m.group("op"))
        if op is None:
            raise RestQueryError(f"unsupported filter op in {key!r}")
        df = df.filter(_apply_op(F.col(m.group("col")), op, parse_literal(raw)))

    # 2. projection
    if "columns" in params:
        cols = [c.strip() for c in params["columns"].split(",") if c.strip()]
        df = df.select(*cols)

    # 3. sort
    if "sort" in params:
        order = sort_columns(params["sort"])
        if order:
            df = df.orderBy(*order)

    # 4. limit/page (after sort)
    if "limit" in params:
        limit = int(params["limit"])
        page = int(params.get("page", "1"))
        if page > 1:
            df = df.offset((page - 1) * limit)
        df = df.limit(limit)
    return df
