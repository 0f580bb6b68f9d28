"""Round-14 diagnostic: split per-query wall time into (a) Python-side
builder/plan construction, (b) driver-side analysis+optimization (explain),
(c) execution through the noop sink — to decide whether the bench's long
tail (~230 queries averaging ~0.6 s) is dominated by a shared fixed
overhead worth attacking globally (guide §1.2: find where the time goes
before optimizing anything).

Usage: python tools/overhead_probe.py [--sf SF_DIR] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roapi_spark.plans.registry import load_all  # noqa: E402
from roapi_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    specs = load_all()
    spark = get_spark("overhead_probe")
    spark.range(1000).count()
    specs["q6_revenue_delta"].builder(spark, sf_dir).count()

    print(f"{'query':36s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'exec2':>7s}")
    for name in args:
        spec = specs[name]
        t0 = time.time()
        df = spec.builder(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        # formatted explain forces analysis + optimization + physical
        # planning without executing
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        t_plan = time.time() - t0
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t_exec = time.time() - t0
        # second execution of the SAME DataFrame (plan cached): pure run
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t_exec2 = time.time() - t0
        print(
            f"{name:36s} {t_build:7.3f} {t_plan:7.3f} {t_exec:7.3f}"
            f" {t_exec2:7.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
