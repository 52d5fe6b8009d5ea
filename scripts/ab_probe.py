"""Micro A/B harness: time one or more callables (registered query names or
dotted callables in this file's AB table) min-of-N on a fresh session.

Usage: python scripts/ab_probe.py --names join_left_composite --runs 5
       python scripts/ab_probe.py --extras minhash_pairs_100k --runs 2

Headline-name timings use the same collect/checksum policy as bench.py so
numbers are comparable. A warm pricing_summary canary runs first and last.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--extras", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench
    from ningaloo_turtle_etl_spark import registry
    from ningaloo_turtle_etl_spark.session import get_spark

    spark = get_spark("ab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    def canary() -> float:
        gc.collect()
        spark._jvm.System.gc()
        df = queries["pricing_summary"](spark, args.sf)
        t0 = time.perf_counter()
        df.collect()
        return round(time.perf_counter() - t0, 3)

    # warmup (untimed) then canary
    queries["pricing_summary"](spark, args.sf).collect()
    out: dict = {"canary_start": canary(), "runs": args.runs}

    names = [n for n in args.names.split(",") if n.strip()]
    extras = [n for n in args.extras.split(",") if n.strip()]

    for name in names:
        ts = []
        for _ in range(args.runs):
            gc.collect()
            spark._jvm.System.gc()
            fn = bench.HEADLINE_OVERRIDES.get(name) or queries[name]
            df = fn(spark, args.sf)
            t0 = time.perf_counter()
            if name in bench.CHECKSUM:
                df.agg({bench.CHECKSUM[name]: "sum"}).collect()
            else:
                df.collect()
            ts.append(time.perf_counter() - t0)
        out[name] = {"min": round(min(ts), 3), "all": [round(t, 3) for t in ts]}

    for name in extras:
        fn = bench.EXTRAS.get(name) or bench.SCALE_EXTRAS.get(name)
        if fn is None:
            raise SystemExit(f"unknown extras probe {name}")
        ts = []
        for _ in range(args.runs):
            gc.collect()
            spark._jvm.System.gc()
            if name in bench.EAGER_EXTRAS:
                t0 = time.perf_counter()
                fn(spark, args.sf).collect()
            else:
                df = fn(spark, args.sf)
                t0 = time.perf_counter()
                df.collect()
            ts.append(time.perf_counter() - t0)
        out[name] = {"min": round(min(ts), 3), "all": [round(t, 3) for t in ts]}

    out["canary_end"] = canary()
    out["loadavg"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
