"""Streaming corpus curation: the batch curation operators applied to a
document stream.

Quality scoring, repetition metrics and PII redaction are stateless
map-only projections/filters, so the SAME operator functions the batch
queries register run unchanged on a streaming DataFrame — one code path,
two execution modes (the engine stance the reference's re-read-everything
dashboard loop is re-expressed with; cf. streaming/tallies.py). Stateful
curation (exact dedup across batches) lives in streaming/stateful.py's
first-seen dedup.

At scale: a curation gate in the ingest stream means quarantine/score at
arrival time instead of re-scanning the corpus later; being map-only it
adds no streaming state beyond the source offsets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ningaloo_turtle_etl_spark.operators.curation import (
    with_pii_redaction,
    with_repetition_metrics,
)
from ningaloo_turtle_etl_spark.operators.text import (
    with_quality_score,
    with_token_counts,
)


def curation_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_punct_ratio: float = 0.2,
    max_dup_2gram_ratio: float = 0.5,
) -> DataFrame:
    """Score → gate → redact, as one stateless plan that runs identically on
    batch and streaming frames: drop docs that are too short, punctuation
    soup, or boilerplate, then strip PII from the survivors. Returns the
    curated rows with their scores and redaction counts."""
    scored = with_repetition_metrics(
        with_quality_score(with_token_counts(docs), text_col=text_col),
        text_col=text_col,
    )
    gated = scored.filter(
        (F.col("n_words") >= min_words)
        & (F.col("punct_ratio") < max_punct_ratio)
        & (F.col("dup_2gram_ratio") < max_dup_2gram_ratio)
    )
    red = with_pii_redaction(gated, text_col=text_col)
    return red.select(
        "doc_id",
        "lang",
        "n_words",
        F.round("quality_score", 6).alias("quality_score"),
        F.round("dup_2gram_ratio", 6).alias("dup_2gram_ratio"),
        "n_email",
        "n_phone",
        "n_ipv4",
        F.substring(F.md5("redacted_text"), 1, 16).alias("redacted_fp"),
    )
