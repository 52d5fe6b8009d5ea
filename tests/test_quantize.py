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
