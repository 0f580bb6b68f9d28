"""Local mirror of the driver's correctness gate.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
Runs every registered query on Spark and its DuckDB oracle, compares
row-count + columns + order-insensitive value hash, prints a PASS/FAIL
table, exits nonzero on any failure.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from roapi_spark.plans.registry import load_all
from roapi_spark.session import get_spark
from roapi_spark.testing.oracle import CompareResult, compare, duckdb_conn


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = load_all()
    spark = get_spark("check_correctness")
    conn = duckdb_conn(sf_dir)

    failures = 0
    for name, spec in specs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.builder(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                res = CompareResult(name, True, n, -1, "rows-only (no oracle)")
            else:
                res = compare(name, df, conn, spec.oracle)
        except Exception as exc:  # noqa: BLE001
            res = CompareResult(name, False, -1, -1, f"EXCEPTION {type(exc).__name__}: {exc}")
        dt = time.time() - t0
        status = "PASS" if res.ok else "FAIL"
        print(f"{status}  {name:32s} rows={res.spark_rows:<7d} {dt:5.1f}s  {res.detail[:400]}")
        failures += 0 if res.ok else 1
    print(f"\n{'OK' if failures == 0 else 'FAILURES: %d' % failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
