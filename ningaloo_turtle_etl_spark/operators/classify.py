"""Model-based quality classification — the fastText/CCNet-style learned
quality filter (Wenzek et al. 2020; the GPT-3/LLaMA data-curation pattern of
training a classifier to separate "high-quality" from raw web text),
re-expressed Spark-first:

- **Features** are pure-Catalyst projections (stopword density, punctuation
  ratio, word-shape, length, repetition) — map-only, fused with the scan.
- **Training** is distributed MLlib ``LogisticRegression`` over those
  features: gradients computed executor-side, driver holds only the
  coefficient vector. No sampled-to-driver sklearn fit — at 100 TB the
  labeled set can itself be huge.
- **Serving** exports the fitted coefficients into a closed-form sigmoid
  column expression: scoring a corpus needs neither MLlib nor Python — it's
  a codegen'd arithmetic projection, deployable inside any existing query.

The reference has no ML layer (its closest analog is the rule-based QA
validation suite, tagging-etl.Rmd:134-184); this extends the engine per the
build brief's training-data-pipeline surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ningaloo_turtle_etl_spark.operators.curation import with_repetition_metrics
from ningaloo_turtle_etl_spark.operators.text import (
    with_quality_score,
    with_token_counts,
)

#: Feature order is part of the model contract: coefficients are exported in
#: this order and the serving expression indexes it positionally.
QUALITY_FEATURES: tuple[str, ...] = (
    "stopword_ratio",
    "punct_ratio",
    "log_n_words",
    "chars_per_word",
    "dup_2gram_ratio",
)


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the QUALITY_FEATURES columns — one fused pure-Catalyst
    projection built from the text-analysis operators."""
    out = with_repetition_metrics(
        with_quality_score(with_token_counts(df, text_col), text_col), text_col, ns=(2,)
    )
    return out.withColumns(
        {
            "log_n_words": F.log1p(F.col("n_words").cast("double")),
            "chars_per_word": F.when(
                F.col("n_words") > 0,
                F.col("n_chars").cast("double") / F.col("n_words"),
            ).otherwise(F.lit(0.0)),
        }
    )


def train_quality_model(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 64,
    reg_param: float = 1e-3,
) -> dict:
    """Fit logistic regression distributed (MLlib) on the Catalyst features;
    return a plain-Python model dict ``{"features": [...], "coefficients":
    [...], "intercept": float}`` — small, serializable, and sufficient for
    the closed-form serving expression (`quality_probability_expr`). The
    heavy lifting (feature projection + gradient aggregation) runs
    executor-side; the driver sees O(n_features) state."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = featurize(labeled, text_col)
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="_features"
    ).transform(feats)
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    model = lr.fit(assembled)
    return {
        "features": list(QUALITY_FEATURES),
        "coefficients": [float(c) for c in model.coefficients],
        "intercept": float(model.intercept),
    }


def quality_probability_expr(model: dict) -> Column:
    """σ(w·x + b) over the QUALITY_FEATURES columns as a single arithmetic
    expression — the model serves with zero MLlib/Python dependency and
    fuses into whole-stage codegen."""
    z = F.lit(float(model["intercept"]))
    for name, w in zip(model["features"], model["coefficients"]):
        z = z + F.lit(float(w)) * F.col(name).cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def with_quality_probability(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Featurize + score in one plan; drops the intermediate feature
    columns it added."""
    scored = featurize(df, text_col).withColumn(
        out_col, quality_probability_expr(model)
    )
    added = set(QUALITY_FEATURES + ("n_words", "n_chars", "n_tokens_est",
                                    "quality_score", "n_2grams")) - set(df.columns)
    return scored.drop(*added)


# --- hashed bag-of-words classifier (fastText-style) -------------------------
# The heuristic-feature model above separates junk from prose; real corpus
# filters (CCNet's fastText, the GPT-3 WebText classifier) learn over the
# VOCABULARY. Same Spark-first split: hashed token features are Catalyst
# expressions keyed by F.hash (Murmur3, seed 42) — one hash function used
# at BOTH train and serve time, so there is no train/serve skew by
# construction (MLlib's HashingTF hashes differently, which is exactly the
# skew this avoids) — training is distributed MLlib LR over sparse vectors,
# and serving is explode → broadcast-join the coefficient dim → per-doc sum
# → sigmoid: no MLlib, no Python, one doc-width shuffle.


def hashed_token_features(
    df: DataFrame,
    n_features: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, idx, cnt): lowercased whitespace tokens hashed into
    [0, n_features) buckets with Spark's Murmur3 (`F.hash`)."""
    from ningaloo_turtle_etl_spark.operators.text import tokens

    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok"),
    )
    return (
        toks.select(
            F.col(id_col), F.pmod(F.hash("_tok"), F.lit(n_features)).alias("idx")
        )
        .groupBy(id_col, "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_hashed_text_model(
    labeled: DataFrame,
    n_features: int = 1024,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iter: int = 64,
    reg_param: float = 1e-3,
) -> dict:
    """Fit LR over hashed bag-of-words counts. The sparse-vector assembly
    uses a Python UDF — train-time only, over the labeled set (bounded by
    labeling budget, not corpus size); gradients aggregate executor-side as
    usual. Returns ``{"n_features", "coefficients" (dense list),
    "intercept"}`` for the Catalyst serving path."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql.functions import udf

    feats = hashed_token_features(labeled, n_features, id_col, text_col)
    pairs = feats.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("idx"), F.col("cnt")))
        ).alias("_pairs")
    )

    @udf(returnType=VectorUDT())
    def to_vec(pairs_):
        return SparseVector(
            n_features,
            [int(p["idx"]) for p in pairs_],
            [float(p["cnt"]) for p in pairs_],
        )

    assembled = (
        labeled.select(id_col, label_col)
        .join(pairs, on=id_col, how="inner")
        .withColumn("_features", to_vec(F.col("_pairs")))
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    model = lr.fit(assembled)
    return {
        "n_features": int(n_features),
        "coefficients": [float(c) for c in model.coefficients.toArray()],
        "intercept": float(model.intercept),
    }


def hashed_text_scores(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score a corpus with the hashed-BoW model, MLlib-free: explode tokens
    → hash to idx → broadcast-join the (idx, weight) dim (non-zero
    coefficients only) → per-doc partial-agg sum → sigmoid. Docs with no
    tokens (or only zero-weight buckets) score σ(intercept)."""
    spark = df.sparkSession
    coef = [
        (i, w) for i, w in enumerate(model["coefficients"]) if w != 0.0
    ]
    coef_df = spark.createDataFrame(coef or [(0, 0.0)], "idx int, w double")
    feats = hashed_token_features(df, model["n_features"], id_col, text_col)
    z = (
        feats.join(F.broadcast(coef_df), on="idx", how="inner")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("_z"))
    )
    b = float(model["intercept"])
    return (
        df.join(z, on=id_col, how="left")
        .withColumn(
            out_col,
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("_z"), F.lit(0.0)) + F.lit(b)))),
        )
        .drop("_z")
    )
