"""r14 job-count evidence for the lazy-checkpoint count fusions (guide
§1.2): run each iterative graph operator on a fixed synthetic fixture and
report how many Spark JOBS the call launched (via the status tracker),
plus wall seconds. The fusion claims are about job count per round —
before: eager checkpoint + separate convergence-count job (+ a recount of
the unchanged edge frame in k_core); after: ONE fused job — so this
artifact, generated once from the r13 baseline worktree and once from the
r14 tree, is the before/after evidence.

Usage: python scripts/job_counts.py [--json OUT.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))




def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.graph import (
        bfs_hops,
        connected_components,
        k_core,
        k_truss,
    )
    from ningaloo_turtle_etl_spark.session import get_spark

    spark = get_spark("r14-job-counts")
    spark.sparkContext.setLogLevel("ERROR")

    n = 20_000
    ids = spark.range(n, numPartitions=8)
    # chain-of-cliques graph: CC needs several pointer-jump rounds,
    # k_core/k_truss several peel rounds
    edges = ids.select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    ).where((F.col("dst") < n) & (F.floor(F.col("src") / 50) == F.floor(F.col("dst") / 50)))
    tri_edges = (
        spark.range(3000)
        .select(F.col("id").alias("src"), ((F.col("id") * 7 + 3) % 3000).alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    seeds = spark.range(0, n, 500).select(F.col("id").alias("node"))

    out = {}

    def probe(name, fn):
        # job-group-scoped job ids via the status tracker (the session
        # runs with the UI disabled, so the REST API is unavailable)
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        fn()
        sec = round(time.perf_counter() - t0, 3)
        sc.setJobGroup(None, None)
        out[name] = {
            "jobs": len(sc.statusTracker().getJobIdsForGroup(name)),
            "sec": sec,
        }
        print(name, out[name])

    probe(
        "connected_components",
        lambda: connected_components(
            edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
        ).count(),
    )
    probe("bfs_hops", lambda: bfs_hops(edges, seeds, max_hops=6).count())
    probe("k_core_3", lambda: k_core(tri_edges, 3).count())
    probe("k_truss_4", lambda: k_truss(tri_edges, k=4).count())

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=2, sort_keys=True)
        print(f"wrote {args.json}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
