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
# pivot, fact-fact shuffle join, window, flagship composite, streaming-batch
# window, spatial UDF join, and the training-data ops (dedup, ANN).
HEADLINE = [
    "pricing_summary",
    "lookup_chain_revenue",
    "flagship_summary_pivot",
    "pivot_event_types",
    "join_left_composite",
    "topk_per_group",
    "tumbling_daily_tally",
    "spatial_tag_regions",
    "dedup_exact",
    "minhash_near_dups",
    "embedding_cosine_topk",
]

# Row-heavy outputs: measure execution with an order-insensitive checksum
# agg instead of shipping rows to pandas.
CHECKSUM = {
    "join_left_composite": "n_lines",
    "dedup_exact": "doc_id",
}


def main() -> None:
    spark = get_spark("ningaloo-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    # Warmup, untimed: one JVM query (codegen/JIT + parquet footer cache).
    # Deliberately NO pandas-UDF warmup: spawning one Python worker per core
    # up front (spark.range(N).select(udf)) measurably degrades the whole
    # session afterward in local mode; the spatial query's UDF warms the
    # worker pool with the handful of workers its scan actually needs.
    queries["pricing_summary"](spark, SF_DIR).collect()

    import gc

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # Untimed GC between queries: session-lifetime debris (dropped
        # DataFrames, spent broadcasts) otherwise piles into the old gen and
        # can slow later array-heavy queries by 10x+. Python gc first so
        # py4j releases JVM-side references System.gc() can then reclaim.
        gc.collect()
        spark._jvm.System.gc()
        df = queries[name](spark, SF_DIR)
        t0 = time.perf_counter()
        if name in CHECKSUM:
            df.agg({CHECKSUM[name]: "sum"}).collect()
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
