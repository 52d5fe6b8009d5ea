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


def fit_quantizer(
    corpus: DataFrame, vec_col: str = "embedding", sample_rows: int = 2048, seed: int = 7
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension [min, max] from a seeded uniform sample over all
    partitions (same discipline as IVF's fit_centroids — limit() would read
    the first partitions only)."""
    from ningaloo_turtle_etl_spark.operators.similarity import _as_double

    rows = (
        corpus.select(_as_double(F.col(vec_col)).alias("v"))
        .rdd.takeSample(False, sample_rows, seed)
    )
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
