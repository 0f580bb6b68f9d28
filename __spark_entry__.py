"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 + the
LLM-pipeline operators (dedup / similarity / text analysis).
``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names;
queries without an entry are non-SQL-expressible and get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file by path; make the package importable
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from roapi_spark.plans.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from roapi_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _latest_rows() -> dict[str, dict]:
    """name -> the most recent driver row for that query (highest round)."""
    import glob
    import json
    import os
    import re

    latest: dict[str, tuple[int, dict]] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, row)
    return {n: row for n, (_, row) in latest.items()}


def _is_full_pass(row: dict) -> bool:
    return (
        isinstance(row, dict)
        and row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
    )


def _ordered_specs():
    # The driver records registry entries in iteration order and caps a
    # round at 50 rows, so ordering decides what gets (re-)recorded.
    # Priority: (1) queries whose LATEST recorded row is not a full pass
    # (errors, stale no-oracle rows-only checks — these have fixes that
    # need re-recording), (2) never-recorded queries (newest operators),
    # (3) the rest in registration order (already green in some round).
    specs = load_all()
    latest = _latest_rows()
    # A spec with no oracle can never hash-match — only an err row means
    # its rows-only check needs a re-run (keeps future oracle-less ops
    # from hogging the front of every capped round).
    needs_rerecord = {
        n: s
        for n, s in specs.items()
        if n in latest
        and not _is_full_pass(latest[n])
        and (s.oracle is not None or latest[n].get("err") is not None)
    }
    out = dict(needs_rerecord)
    out.update({n: s for n, s in specs.items() if n not in latest})
    out.update({n: s for n, s in specs.items() if n not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered_specs().items()
        if spec.oracle is not None
    }
