"""Capture .explain("formatted") for named registered queries into files.

Usage: python scripts/capture_plans.py --out plans/r13 --suffix before \
           [--names pricing_summary,join_left_composite,...]

Defaults to the bench.py HEADLINE list. Writes <out>/<name>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--names", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench
    from ningaloo_turtle_etl_spark import registry
    from ningaloo_turtle_etl_spark.session import get_spark

    names = (
        [n.strip() for n in args.names.split(",") if n.strip()]
        if args.names
        else list(bench.HEADLINE)
    )
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()
    for name in names:
        fn = bench.HEADLINE_OVERRIDES.get(name) or queries[name]
        df = fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
