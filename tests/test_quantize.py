"""Quantization tests: round-trip error bounds and recall vs full precision
on the real embeddings table."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.quantize import (
    dequantize_expr,
    fit_quantizer,
    quantize_expr,
    quantized_cosine_topk,
)
from ningaloo_turtle_etl_spark.operators.similarity import cosine_topk
from ningaloo_turtle_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_roundtrip_error_bounded_by_half_bucket(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    lo, hi = fit_quantizer(emb)
    out = emb.limit(200).select(
        "embedding",
        dequantize_expr(quantize_expr("embedding", lo, hi), lo, hi).alias("restored"),
    ).collect()
    half_bucket = (hi - lo) / 255.0  # per-dim max round-trip error
    for r in out:
        err = np.abs(np.asarray(r["embedding"], dtype=np.float64) - np.asarray(r["restored"]))
        assert (err <= half_bucket * 0.5 + 1e-9).all()


def test_quantized_column_is_tinyint_array(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    lo, hi = fit_quantizer(emb)
    q = emb.select(quantize_expr("embedding", lo, hi).alias("q"))
    assert q.schema["q"].dataType.simpleString() == "array<tinyint>"
    vals = q.limit(50).collect()
    assert all(-128 <= x <= 127 for r in vals for x in r["q"])


def test_quantized_topk_recall_vs_full_precision(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 10)
    lo, hi = fit_quantizer(emb)
    exact = cosine_topk(emb, queries, k=5).collect()
    quant = quantized_cosine_topk(emb, queries, lo, hi, k=5).collect()
    exact_sets: dict = {}
    quant_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in quant:
        quant_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(exact_sets[q] & quant_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.8  # int8 loses little on cosine ordering


# --- product quantization ---------------------------------------------------


def test_pq_encode_matches_numpy_argmin(spark):
    from ningaloo_turtle_etl_spark.operators.quantize import (
        fit_pq_codebooks,
        with_pq_codes,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    books = fit_pq_codebooks(emb, m_subvectors=8, k_codes=16)
    m, k, d_sub = books.shape
    assert (m, k, d_sub) == (8, 16, 8)
    rows = with_pq_codes(emb, books).select("embedding", "pq_code").limit(40).collect()
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64).reshape(m, d_sub)
        ref = ((v[:, None, :] - books) ** 2).sum(-1).argmin(1)
        assert list(r["pq_code"]) == [int(x) for x in ref]


def test_pq_codebooks_deterministic(spark):
    from ningaloo_turtle_etl_spark.operators.quantize import fit_pq_codebooks

    emb = load_table(spark, "embeddings", SF_DIR)
    a = fit_pq_codebooks(emb, m_subvectors=4, k_codes=8)
    b = fit_pq_codebooks(emb.repartition(7), m_subvectors=4, k_codes=8)
    # hash-rule sampling → bit-identical across partitionings
    assert np.array_equal(a, b)


def test_pq_topk_recall_and_rerank(spark):
    from ningaloo_turtle_etl_spark.operators.quantize import (
        fit_pq_codebooks,
        pq_topk,
    )
    from ningaloo_turtle_etl_spark.operators.similarity import cosine_topk

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 10)
    # m=16 (4-dim subspaces): near-random unit vectors are PQ's worst case,
    # so the test uses the finer split; coarser m=8 measured adc≈0.20.
    books = fit_pq_codebooks(emb, m_subvectors=16, k_codes=16)
    # Exact baseline: squared-L2 == cosine ordering only for normalized
    # vectors, so build the L2 exact baseline directly.
    k = 5
    corpus_rows = emb.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in corpus_rows}
    exact_sets = {}
    for q in range(10):
        d = sorted(
            (float(((vecs[i] - vecs[q]) ** 2).sum()), i)
            for i in vecs if i != q
        )[:k]
        exact_sets[q] = {i for _, i in d}

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(exact_sets[q] & got.get(q, set())) for q in exact_sets)
        return hits / (k * len(exact_sets))

    adc = recall(pq_topk(emb, queries, books, k=k))
    two_stage = recall(pq_topk(emb, queries, books, k=k, rerank=100))
    assert adc >= 0.15  # raw ADC on random unit vectors (measured 0.26)
    assert two_stage >= adc  # exact re-rank can only help
    assert two_stage >= 0.85  # 100-candidate shortlist closes the gap (measured 0.98)


def test_pq_rerank_distances_are_exact(spark):
    from ningaloo_turtle_etl_spark.operators.quantize import (
        fit_pq_codebooks,
        pq_topk,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 3)
    books = fit_pq_codebooks(emb, m_subvectors=8, k_codes=16)
    out = pq_topk(emb, queries, books, k=3, rerank=20).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    for r in out:
        ref = float(((vecs[r["vec_id"]] - vecs[r["query_id"]]) ** 2).sum())
        assert abs(r["distance"] - ref) < 1e-5


def test_ivf_pq_topk_fused_pipeline_recall_floor(spark):
    """The fused IVF → PQ/ADC → exact pipeline: (a) its exact-stage
    distances are true squared L2; (b) recall vs brute-force L2 clears a
    floor and grows with nprobe; (c) at nprobe = n_cells (no IVF cut)
    it matches plain pq_topk with the same shortlist — the IVF tier only
    removes candidates, never rescores them."""
    from ningaloo_turtle_etl_spark.operators.quantize import (
        fit_pq_codebooks,
        ivf_pq_topk,
        pq_topk,
    )
    from ningaloo_turtle_etl_spark.operators.similarity import fit_centroids

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 10)
    cents = fit_centroids(emb, 8)
    books = fit_pq_codebooks(emb, m_subvectors=16, k_codes=16)
    k = 5

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    exact_sets = {}
    for q in range(10):
        d = sorted(
            (float(((vecs[i] - vecs[q]) ** 2).sum()), i)
            for i in vecs
            if i != q
        )[:k]
        exact_sets[q] = {i for _, i in d}

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(exact_sets[q] & got.get(q, set())) for q in exact_sets)
        return hits / (k * len(exact_sets))

    out2 = ivf_pq_topk(
        emb, queries, cents, books, k=k, nprobe=2, shortlist=100
    )
    # (a) exact-stage distances are true squared L2
    for r in out2.collect():
        ref = float(((vecs[r["vec_id"]] - vecs[r["query_id"]]) ** 2).sum())
        assert abs(r["distance"] - ref) < 1e-5
    r2 = recall(out2)
    r_all = recall(
        ivf_pq_topk(emb, queries, cents, books, k=k, nprobe=8, shortlist=100)
    )
    # (b) floor + monotonicity in nprobe (measured: 0.62 @ nprobe=2,
    # 0.98 @ nprobe=8 on the sf0.001 table)
    assert r2 >= 0.4
    assert r_all >= r2
    assert r_all >= 0.85

    # (c) nprobe = n_cells disables the IVF cut: identical rows to the
    # single-tier PQ path at the same shortlist
    fused_all = {
        (r["query_id"], r["vec_id"], r["distance"], r["rank"])
        for r in ivf_pq_topk(
            emb, queries, cents, books, k=k, nprobe=8, shortlist=100
        ).collect()
    }
    plain = {
        (r["query_id"], r["vec_id"], r["distance"], r["rank"])
        for r in pq_topk(emb, queries, books, k=k, rerank=100).collect()
    }
    assert fused_all == plain

    import pytest

    with pytest.raises(ValueError):
        ivf_pq_topk(emb, queries, cents, books, k=5, shortlist=3)


def test_sign_bit_hamming_replica_and_semantics(spark):
    """sign_bit_words/hamming_topk vs a numpy replica on deterministic
    vectors: identical packed words, exact Hamming distances, rank-1 is
    the sign-identical vector, and the binary distance preserves the
    coarse cosine ordering it exists to estimate (Charikar)."""
    import numpy as np

    from ningaloo_turtle_etl_spark.operators.quantize import (
        hamming_topk,
        sign_bit_words,
    )

    rng = np.random.RandomState(11)
    dim, n = 64, 40
    vecs = rng.randn(n, dim).astype(np.float32)
    # v1 shares v0's sign pattern exactly → Hamming 0 despite different values
    vecs[1] = np.where(vecs[0] > 0, 0.5, -0.5).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )

    # packed words match the replica exactly
    words = df.select(
        "vec_id", *[w.alias(f"w{i}") for i, w in enumerate(sign_bit_words("embedding", dim))]
    ).collect()
    bits = (vecs > 0).astype(np.int64)
    for r in words:
        w0 = int(sum(bits[r["vec_id"]][i] << i for i in range(32)))
        w1 = int(sum(bits[r["vec_id"]][32 + i] << i for i in range(32)))
        assert (r["w0"], r["w1"]) == (w0, w1)

    out = hamming_topk(df, df.filter(F.col("vec_id") == 0), dim=dim, k=n - 1)
    got = {r["vec_id"]: (r["hamming"], r["rank"]) for r in out.collect()}
    ham = {
        j: int((bits[0] != bits[j]).sum()) for j in range(1, n)
    }
    assert {j: h for j, (h, _) in got.items()} == ham
    # the sign-identical vector is rank 1 at distance 0
    assert got[1] == (0, 1)
    # coarse agreement with cosine: mean cosine of the 5 hamming-nearest
    # beats the 5 hamming-farthest by a wide margin
    cos = {
        j: float(
            vecs[0] @ vecs[j] / (np.linalg.norm(vecs[0]) * np.linalg.norm(vecs[j]))
        )
        for j in range(1, n)
    }
    by_rank = sorted(got, key=lambda j: got[j][1])
    near = np.mean([cos[j] for j in by_rank[:5]])
    far = np.mean([cos[j] for j in by_rank[-5:]])
    assert near > far + 0.3


def test_pq_train_codebooks_lloyd_grain_and_inertia(spark):
    """Distributed PQ training audit: the output covers the full
    (subspace, code) grid, every subspace's n_vecs sums to the corpus
    size (each vector gets exactly one code per subspace), and a second
    Lloyd round never increases total inertia (monotone descent, up to
    the 0.5-micro recentering quantization)."""
    import collections

    from ningaloo_turtle_etl_spark.operators.quantize import (
        pq_train_codebooks_lloyd,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    n = emb.count()
    one = pq_train_codebooks_lloyd(emb, 4, 4, iterations=1).collect()
    two = pq_train_codebooks_lloyd(emb, 4, 4, iterations=2).collect()
    for rows in (one, two):
        assert len(rows) == 16
        per_s = collections.Counter()
        for r in rows:
            per_s[r["subspace"]] += r["n_vecs"]
        assert all(v == n for v in per_s.values())
        assert all(r["centroid_l1"] > 0 for r in rows)
    i1 = sum(r["inertia"] for r in one)
    i2 = sum(r["inertia"] for r in two)
    # measured on sf0.001: 452.93 -> 447.74
    assert i2 <= i1 + 1e-6


def test_trained_ivf_pq_topk_closed_loop(spark):
    """The fused train→encode→serve loop: (a) exact-stage distances are
    true squared L2 on the micro-quantized vectors; (b) recall vs
    brute force clears a floor at a real cut (nprobe=2, shortlist=100);
    (c) with every cut opened (nprobe = k_cells, shortlist >= corpus)
    the loop IS brute force — recall exactly 1.0, the end-to-end
    correctness pin for the trained tiers; (d) invalid params raise."""
    import pytest

    from ningaloo_turtle_etl_spark.operators.quantize import (
        trained_ivf_pq_topk,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 8)
    k = 5
    vecs = {
        r["vec_id"]: np.round(
            np.asarray(r["embedding"], dtype=np.float64) * 1e6
        )
        for r in emb.collect()
    }
    exact_sets = {}
    for q in range(8):
        d = sorted(
            (float(((vecs[i] - vecs[q]) ** 2).sum()), i)
            for i in vecs
            if i != q
        )[:k]
        exact_sets[q] = {i for _, i in d}

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(
            len(exact_sets[q] & got.get(q, set())) for q in exact_sets
        )
        return hits / (k * len(exact_sets))

    out = trained_ivf_pq_topk(
        emb,
        queries,
        k_cells=4,
        coarse_iterations=2,
        m_subvectors=4,
        k_codes=4,
        pq_iterations=2,
        k=k,
        nprobe=2,
        shortlist=100,
    )
    for r in out.collect():
        ref = ((vecs[r["vec_id"]] - vecs[r["query_id"]]) ** 2).sum() / 1e12
        assert abs(r["distance"] - ref) < 1e-5
    # measured 0.625 on sf0.001 (nprobe=2, shortlist=100)
    assert recall(out) >= 0.5

    n = len(vecs)
    opened = trained_ivf_pq_topk(
        emb,
        queries,
        k_cells=4,
        coarse_iterations=2,
        m_subvectors=4,
        k_codes=4,
        pq_iterations=2,
        k=k,
        nprobe=4,
        shortlist=n,
    )
    assert recall(opened) == 1.0

    with pytest.raises(ValueError):
        trained_ivf_pq_topk(emb, queries, k=5, shortlist=3)


def test_trained_ivf_pq_train_once_serve_many(spark, tmp_path):
    """Train-once/serve-many (r12 verdict item 7): the standalone
    train / write / load / encode / write-index / load-index / serve
    pipeline must produce EXACTLY the fused trained_ivf_pq_topk rows —
    the persisted parquet artifacts (trained params + cell-partitioned
    index) are a faithful serialization, not a parallel implementation.
    Also pins: the reloaded params equal the trained ones value-for-
    value, and the index parquet is laid out partitioned by cell."""
    import os

    from ningaloo_turtle_etl_spark.operators.quantize import (
        encode_ivf_pq,
        load_ivf_pq_index,
        load_trained_ivf_pq,
        serve_trained_ivf_pq_topk,
        train_ivf_pq,
        trained_ivf_pq_topk,
        write_ivf_pq_index,
        write_trained_ivf_pq,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") < 6)
    kw = dict(
        k_cells=4, coarse_iterations=2, m_subvectors=4, k_codes=4,
        pq_iterations=2,
    )

    params = train_ivf_pq(emb, **kw)
    ppath = str(tmp_path / "trained_params")
    write_trained_ivf_pq(spark, params, ppath)
    loaded = load_trained_ivf_pq(spark, ppath)
    assert loaded.dim == params.dim
    assert loaded.cents == [[int(x) for x in c] for c in params.cents]
    assert loaded.books == [
        [[int(x) for x in c] for c in bk] for bk in params.books
    ]

    enc = encode_ivf_pq(emb, loaded)
    ipath = str(tmp_path / "ivf_pq_index")
    write_ivf_pq_index(enc, ipath)
    # cell-partitioned layout: probe-side partition pruning is the
    # on-disk probe
    assert any(
        d.startswith("cell=") for d in os.listdir(ipath)
    ), "index parquet must be partitioned by cell"

    served = serve_trained_ivf_pq_topk(
        load_ivf_pq_index(spark, ipath), emb, queries, loaded,
        k=5, nprobe=2, shortlist=100,
    )
    fused = trained_ivf_pq_topk(
        emb, queries, k=5, nprobe=2, shortlist=100, **kw
    )
    cols = ["query_id", "vec_id", "distance", "rank"]
    srows = sorted(tuple(r[c] for c in cols) for r in served.collect())
    frows = sorted(tuple(r[c] for c in cols) for r in fused.collect())
    assert srows == frows


def test_trained_ivf_pq_incremental_encode_batches(spark, tmp_path):
    """Production index maintenance under frozen trained params: new
    corpus batches are encoded INDEPENDENTLY (map-only, no retrain, no
    contact with earlier batches) and unioned into the index; because
    encode is a deterministic per-row argmin under fixed parameters,
    the batched union must equal the one-shot full encode row-for-row —
    the property that makes incremental 100 TB index upserts safe."""
    from ningaloo_turtle_etl_spark.operators.quantize import (
        encode_ivf_pq,
        train_ivf_pq,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    params = train_ivf_pq(
        emb, k_cells=4, coarse_iterations=2, m_subvectors=4, k_codes=4,
        pq_iterations=2,
    )
    full = encode_ivf_pq(emb, params)
    batched = encode_ivf_pq(
        emb.filter(F.col("vec_id") % 3 == 0), params
    ).unionByName(
        encode_ivf_pq(emb.filter(F.col("vec_id") % 3 == 1), params)
    ).unionByName(
        encode_ivf_pq(emb.filter(F.col("vec_id") % 3 == 2), params)
    )
    cols = ["vec_id", "cell", "code"]

    def rows(df):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["code"])) for r in df.collect()
        )

    assert rows(batched) == rows(full)


def test_lloyd_arrow_grid_matches_catalyst_reference(spark):
    """r13 pins the Arrow-batched Lloyd grid against the original
    Catalyst expression form it replaced: same assignment (exact-int64
    argmin, first-min tie to the smallest code), same per-cell counts,
    per-coordinate sums, and distance sums — on a fixture with exact
    distance TIES (duplicate vectors and symmetric centroids) so the tie
    rule itself is exercised, for both the m=1 (coarse) and m>1 (PQ
    subvector) grains."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.quantize import (
        _lloyd_grid_rows,
        _micro_base,
    )

    df = spark.createDataFrame(
        [
            (i, [float((i * 7) % 5 - 2), float((i * 3) % 4 - 1),
                 float(i % 3 - 1), float((i * 11) % 6 - 3)])
            for i in range(40)
        ]
        # duplicate rows: equidistant cases must tie to the smaller code
        + [(100 + i, [0.0, 0.0, 0.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    base = _micro_base(df, "vec_id", "embedding").persist()
    base.count()
    try:
        for m, k in ((1, 3), (2, 2)):
            d_sub = 4 // m
            init = base.orderBy("id").limit(k).collect()
            books = [
                [list(r["vm"])[i * d_sub : (i + 1) * d_sub] for r in init]
                for i in range(m)
            ]
            got = {
                (int(r["s"]), int(r["code"])): (
                    int(r["n"]),
                    tuple(int(r[f"s{j}"]) for j in range(d_sub)),
                    int(r["dsum"]),
                )
                for r in _lloyd_grid_rows(
                    base, books, m, k, d_sub, with_dist=True
                )
            }

            # Catalyst reference: the pre-r13 expression form
            def dist_expr(sv, c):
                carr = F.array(*[F.lit(int(x)) for x in c])
                return F.aggregate(
                    F.zip_with(sv, carr, lambda a, b: (a - b) * (a - b)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                )

            def sub_col(i):
                return F.slice(F.col("vm"), i * d_sub + 1, d_sub)

            ex = base.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("s"),
                                F.array_min(
                                    F.array(
                                        *[
                                            F.struct(
                                                dist_expr(sub_col(i), c).alias("d"),
                                                F.lit(j).alias("j"),
                                            )
                                            for j, c in enumerate(books[i])
                                        ]
                                    )
                                )["j"].alias("code"),
                                F.array_min(
                                    F.array(
                                        *[
                                            F.struct(
                                                dist_expr(sub_col(i), c).alias("d"),
                                                F.lit(j).alias("j"),
                                            )
                                            for j, c in enumerate(books[i])
                                        ]
                                    )
                                )["d"].alias("d"),
                                sub_col(i).alias("sv"),
                            )
                            for i in range(m)
                        ]
                    )
                ).alias("e")
            ).select("e.s", "e.code", "e.d", "e.sv")
            ref = {
                (int(r["s"]), int(r["code"])): (
                    int(r["n"]),
                    tuple(int(r[f"s{j}"]) for j in range(d_sub)),
                    int(r["dsum"]),
                )
                for r in ex.groupBy("s", "code")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(F.col("sv").getItem(j)).alias(f"s{j}")
                        for j in range(d_sub)
                    ],
                    F.sum("d").alias("dsum"),
                )
                .collect()
            }
            assert got == ref, f"grid mismatch at m={m}, k={k}"
    finally:
        base.unpersist()


def test_encode_arrow_matches_expression_argmin(spark):
    """r13: the Arrow encode stage must reproduce the expression-form
    per-row argmins (cell + m PQ codes) including distance ties."""
    import pyspark.sql.functions as F

    from ningaloo_turtle_etl_spark.operators.quantize import (
        TrainedIvfPq,
        _encode_from_base,
        _micro_base,
    )

    df = spark.createDataFrame(
        [(i, [float((i * 5) % 7 - 3), float((i * 2) % 5 - 2),
              float(i % 4 - 2), float((i * 9) % 8 - 4)]) for i in range(30)]
        + [(200 + i, [1.0, -1.0, 1.0, -1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    base = _micro_base(df, "vec_id", "embedding")
    cents = [[0, 0, 0, 0], [1_000_000, -1_000_000, 1_000_000, -1_000_000]]
    books = [
        [[0, 0], [1_000_000, -1_000_000]],
        [[0, 0], [-1_000_000, 1_000_000]],
    ]
    params = TrainedIvfPq(cents=cents, books=books, dim=4)
    got = sorted(
        (r["vec_id"], r["cell"], tuple(r["code"]))
        for r in _encode_from_base(base, params).collect()
    )

    def argmin_expr(col, cs):
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

    ref_df = base.select(
        F.col("id").alias("vec_id"),
        argmin_expr(F.col("vm"), cents).alias("cell"),
        F.array(
            *[
                argmin_expr(F.slice(F.col("vm"), i * 2 + 1, 2), books[i]).cast("int")
                for i in range(2)
            ]
        ).alias("code"),
    )
    ref = sorted(
        (r["vec_id"], r["cell"], tuple(r["code"])) for r in ref_df.collect()
    )
    assert got == ref
