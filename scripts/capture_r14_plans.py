"""r14 loop-body plan evidence: .explain("formatted") for the per-round
scans the r14 optimizations changed, before (reconstructed expression /
union forms — the exact pre-r14 code, inlined here the same way r13's
lloyd_assignment_scan capture did) and after (the shipped helpers).

The registered pca/ktruss/graph queries execute their loops during query
CONSTRUCTION and return driver-built rows, so their top-level .explain is
a LocalTableScan — the loop-body plan is the honest evidence surface.

Usage: python scripts/capture_r14_plans.py --out plans/r14
Writes:
  pca_cov_apply_scan_{before,after}.txt   (per power-iteration round)
  pca_coord_sum_scan_{before,after}.txt   (mean pass)
  ktruss_support_round_{before,after}.txt (per peeling round)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.graph import _truss_edge_support
    from ningaloo_turtle_etl_spark.operators.scale import barrier_col
    from ningaloo_turtle_etl_spark.operators.similarity import (
        _as_double,
        _pca_coord_sum_grid,
        _pca_cov_apply_grid,
    )
    from ningaloo_turtle_etl_spark.session import get_spark

    spark = get_spark("r14-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    def write(name: str, df) -> None:
        path = os.path.join(args.out, f"{name}.txt")
        with open(path, "w") as fh:
            fh.write(_explain(df))
        print(f"wrote {path}")

    # ---- pca loop bodies (d=64, the registered-query grain) ----
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.select(
        F.col("vec_id").alias("vid"),
        F.transform(
            _as_double(F.col("embedding")),
            lambda x: F.round(x * F.lit(1e6), 0).cast("long"),
        ).alias("xm"),
    ).localCheckpoint(eager=True)
    d = 64
    mu_m = [0] * d
    v = [1.0] + [0.0] * (d - 1)

    # BEFORE (pre-r14 expression form, verbatim): zip_with/aggregate fold
    # + posexplode round-sum over a second checkpointed centered frame
    mu_arr = F.array([F.lit(int(m)).cast("long") for m in mu_m])
    cent = (
        barrier_col(
            base,
            "c",
            F.zip_with(F.col("xm"), mu_arr, lambda a, b: (a - b) / F.lit(1e6)),
        )
        .select("vid", "c")
        .localCheckpoint(eager=True)
    )
    v_arr = F.array([F.lit(float(x)) for x in v])
    s_terms = F.zip_with(
        F.col("c"),
        v_arr,
        lambda cj, vj: F.round(cj * vj * F.lit(1e6), 0).cast("long"),
    )
    step = barrier_col(
        cent,
        "sv",
        F.aggregate(s_terms, F.lit(0).cast("long"), lambda acc, t: acc + t)
        / F.lit(1e6),
    )
    before_round = (
        step.select("sv", F.posexplode("c").alias("j0", "cj"))
        .groupBy("j0")
        .agg(
            F.sum(
                F.round(F.col("sv") * F.col("cj") * F.lit(1e6), 0).cast("long")
            ).alias("gw")
        )
    )
    write("pca_cov_apply_scan_before", before_round)
    before_mean = (
        base.select(F.posexplode("xm").alias("j0", "xv"))
        .groupBy("j0")
        .agg(F.sum("xv").alias("s"))
    )
    write("pca_coord_sum_scan_before", before_mean)

    # AFTER (r14 Arrow grids)
    write(
        "pca_cov_apply_scan_after",
        _pca_cov_apply_grid(base, mu_m, v, d, _frame_only=True),
    )
    write(
        "pca_coord_sum_scan_after",
        _pca_coord_sum_grid(base, d, _frame_only=True),
    )

    # ---- ktruss support round (copurchase-scale synthetic edge frame) ----
    ed = (
        spark.range(2000)
        .select(
            F.col("id").alias("a"), ((F.col("id") * 7 + 3) % 2000).alias("b")
        )
        .where(F.col("a") < F.col("b"))
        .localCheckpoint(eager=True)
    )
    # BEFORE (pre-r14): 3-way unionAll of projections of the triangle frame
    xy = ed.select(F.col("a").alias("x"), F.col("b").alias("y"))
    yz = ed.select(F.col("a").alias("y"), F.col("b").alias("z"))
    xz = ed.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = xy.join(yz, on="y").join(xz, on=["x", "z"])
    sides_union = (
        tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
        .unionAll(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
        .unionAll(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
    )
    write(
        "ktruss_support_round_before",
        sides_union.groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("long").alias("support")
        ),
    )
    write("ktruss_support_round_after", _truss_edge_support(ed))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
