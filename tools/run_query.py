"""Run any catalog query by name — the engine's CLI.

Usage:
  python tools/run_query.py <query_name> [sf_dir] [--explain] [--show N]
  python tools/run_query.py --list

Examples:
  python tools/run_query.py substr_groupby_sum /root/testdata/sf0.01 --show 10
  python tools/run_query.py q18_large_orders --explain
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lambda_refarch_mapreduce_spark import get_spark  # noqa: E402
from lambda_refarch_mapreduce_spark.plans import catalog, catalog_analytics, catalog_llm  # noqa: E402,F401


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    if "--list" in flags or not args:
        for name in sorted(catalog.REGISTRY):
            qd = catalog.REGISTRY[name]
            kind = "oracle" if qd.oracle else "rows-only"
            print(f"{name:42s} {kind}")
        return

    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    if name not in catalog.REGISTRY:
        sys.exit(f"unknown query {name!r}; --list shows all")

    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = catalog.REGISTRY[name].spark(spark, sf_dir)
    if "--explain" in flags:
        print(
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
        return
    n = 20
    for f in flags:
        if f.startswith("--show"):
            parts = f.split("=")
            if len(parts) == 2:
                n = int(parts[1])
    df.show(n, truncate=False)
    print(f"rows: {df.count()}")


if __name__ == "__main__":
    main()
