"""A/B: hash-once slot derivation (r05, current) vs per-slot xxhash64 (r01-r04)
for the xxhash64-family MinHash signature inside minhash_near_dup_pairs.

NB the r05 version of this script monkeypatched ``D.minhash_signature``,
which minhash_near_dup_pairs never calls (it uses minhash_slots_from_hashes
on the pre-hashed ``sh`` column directly) — that A/B was a no-op. This one
reproduces the two REAL pipelines:

  * hashonce (r05): sh = xxhash64(shingle) once; sig = 32 integer
    2-universal min-folds over sh; cache carries (id, sh, sig).
  * perslot (r01-r04): sig = 32 × array_min(transform(sh_str,
    s -> xxhash64(seed_i, s))); cache additionally carries sh_str
    (string arrays) because the signature reads strings.

Bucketing, capping, candidate join, and hashed-shingle verification are
identical (verbatim from operators/dedup.py). Run on an idle host
(loadavg < 0.5) — r05's headline artifact started at loadavg 2.49.

Usage: python scripts/ab_minhash.py [n_docs ...]   (default: 500 20000)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark import StorageLevel
from pyspark.sql import SparkSession

from ningaloo_turtle_etl_spark.operators.dedup import (
    minhash_coeffs,
    minhash_slots_from_hashes,
    shingles,
)

MERSENNE61 = (1 << 61) - 1

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def corpus(n_docs: int):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    n_base = base.count()
    if n_docs <= n_base:
        df = base.limit(n_docs).select("doc_id", "text")
    else:
        reps = (n_docs + n_base - 1) // n_base
        rep = spark.range(reps).select(F.col("id").alias("_r"))
        df = (
            base.select("doc_id", "text")
            .crossJoin(F.broadcast(rep))
            .select(
                (F.col("doc_id") + F.col("_r") * n_base).alias("doc_id"),
                # Perturb text per replica so replicas aren't exact dups.
                F.concat(
                    F.col("text"), F.lit(" rep"), F.col("_r").cast("string")
                ).alias("text"),
            )
            .filter(F.col("doc_id") < n_docs)
        )
    df = df.repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    return df


def pairs(df, form: str, num_hashes=32, bands=8, threshold=0.5, cap=500):
    """minhash_near_dup_pairs body with the signature form switched."""
    rows = num_hashes // bands
    sh = df.select(
        F.col("doc_id").alias("id"), shingles("text", 3).alias("sh_str")
    ).select(
        "id",
        "sh_str",
        F.array_distinct(F.transform("sh_str", lambda s: F.xxhash64(s))).alias("sh"),
    )
    if form == "hashonce":
        sig_expr = minhash_slots_from_hashes(F.col("sh"), num_hashes)
        cached = sh.select("id", "sh", sig_expr.alias("sig"))
    else:  # perslot: r01-r04 form, strings hashed 32x, sh_str rides the cache

        def slot(i: int):
            seed = F.lit(i)
            return F.array_min(F.transform(F.col("sh_str"), lambda s: F.xxhash64(seed, s)))

        sig_expr = F.array(*[slot(i) for i in range(num_hashes)])
        cached = sh.select("id", "sh", "sh_str", sig_expr.alias("sig"))
    sig = cached.persist(StorageLevel.MEMORY_AND_DISK)
    band_bucket = [
        F.xxhash64(F.lit(b), *[F.col("sig")[b * rows + r] for r in range(rows)])
        for b in range(bands)
    ]
    banded = sig.select("id", F.explode(F.array(*band_bucket)).alias("bucket"))
    counts = banded.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bn"))
    banded = banded.join(counts, on="bucket").filter(F.col("_bn") <= cap).drop("_bn")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[F.col("a.bucket") == F.col("b.bucket"), F.col("a.id") < F.col("b.id")],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = sig.select("id", "sh", F.size("sh").alias("n_sh"))
    cand = cand.join(
        sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("n_a")),
        on="id_a",
    ).join(
        sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("n_b")),
        on="id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.col("n_a") + F.col("n_b") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    out = (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out, sig


def run(df, form):
    t0 = time.time()
    out, sig = pairs(df, form)
    n = out.count()
    dt = time.time() - t0
    sig.unpersist()
    return dt, n


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [500, 20000]
    results = {}
    for n_docs in sizes:
        df = corpus(n_docs)
        # warmup both forms once (JIT, codegen cache)
        run(df, "hashonce")
        run(df, "perslot")
        timings = {"hashonce": [], "perslot": []}
        n_pairs = {}
        for rep in range(3):
            for form in ("hashonce", "perslot"):
                t, n = run(df, form)
                timings[form].append(round(t, 3))
                n_pairs[form] = n
                print(f"n={n_docs} rep{rep} {form}: {t:.3f}s pairs={n}", flush=True)
        df.unpersist()
        results[str(n_docs)] = {
            "hashonce_sec": timings["hashonce"],
            "perslot_sec": timings["perslot"],
            "hashonce_min": min(timings["hashonce"]),
            "perslot_min": min(timings["perslot"]),
            "pairs": n_pairs,
        }
    results["loadavg"] = list(os.getloadavg())
    print(json.dumps(results))
    spark.stop()
