"""Benchmark harness — driver contract (one JSON line on stdout).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints:
  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Timing policy: one untimed warmup action first (JIT + code cache + parquet
footer cache), then each query timed once, end-to-end (plan + execute +
collect). Results are small aggregates by design — collect cost is the
driver-side constant, not the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ningaloo_turtle_etl_spark import registry  # noqa: E402
from ningaloo_turtle_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per workload family — wide agg scan, broadcast-chain join,
# pivot, fact-fact shuffle join, window, and the flagship composite.
HEADLINE = [
    "pricing_summary",
    "lookup_chain_revenue",
    "flagship_summary_pivot",
    "pivot_event_types",
    "join_left_composite",
    "topk_per_group",
]


def main() -> None:
    spark = get_spark("ningaloo-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    # Warmup: run the cheapest headline once, untimed.
    queries["pricing_summary"](spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, SF_DIR)
        t0 = time.perf_counter()
        if len(df.columns) > 0 and name == "join_left_composite":
            # Row-heavy output: measure execution, not pandas transfer.
            df.agg({"n_lines": "sum"}).collect()
        else:
            df.collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
