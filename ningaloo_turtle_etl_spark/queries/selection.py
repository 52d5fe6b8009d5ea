"""Data-selection queries: exact stratified sampling, weighted sampling,
corpus drift, DSIR importance selection (full DuckDB oracles — every hash
is md5-derived, so the oracle reproduces the sample bit-for-bit), plus the
learned quality classifier (rows-only: LBFGS training is not
SQL-expressible; semantics pinned in tests/test_classify.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.selection import (
    corpus_drift_metrics,
    dsir_top_select,
    stratified_sample_exact,
    weighted_sample_topn,
)
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table

_TOKENS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"
_G2 = "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"

_SAMPLE_N = 200


@register(
    "stratified_sample_exact",
    f"""
    WITH per AS (
        SELECT source, COUNT(*) AS w FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(w) AS tw FROM per),
    alloc AS (
        SELECT source, w,
               CAST(FLOOR({_SAMPLE_N} * CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))
                    AS BIGINT) AS base,
               {_SAMPLE_N} * CAST(w AS DOUBLE) / CAST(tw AS DOUBLE)
                 - FLOOR({_SAMPLE_N} * CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))
                   AS frac
        FROM per, tot
    ),
    quota AS (
        SELECT source, w,
               LEAST(w, base + CASE WHEN ROW_NUMBER() OVER
                                        (ORDER BY frac DESC, source)
                                    <= {_SAMPLE_N} - SUM(base) OVER ()
                                    THEN 1 ELSE 0 END) AS quota
        FROM alloc
    ),
    ranked AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id
               ) AS INT) AS sample_rank
        FROM documents
    )
    SELECT r.doc_id, r.source, r.sample_rank
    FROM ranked r JOIN quota q USING (source)
    WHERE r.sample_rank <= q.quota
    """,
)
def q_stratified_sample_exact(spark, sf_dir):
    """EXACT-size stratified sample (largest-remainder allocation over
    sources, per-stratum smallest-md5-of-id winners). The rate-based
    samplers (training_mix_sample etc.) only hit their size in expectation;
    this one hits a fixed token/row budget exactly — and stays
    deterministic under retries. Scale path (map-side hash gate before the
    skewed stratum window) is exercised equivalence-tested in pytest."""
    docs = load_table(spark, "documents", sf_dir)
    return stratified_sample_exact(
        docs, _SAMPLE_N, stratum_col="source", id_col="doc_id"
    ).select("doc_id", "source", "sample_rank")


@register(
    "corpus_drift_metrics",
    f"""
    WITH ta AS (
        SELECT unnest(toks) AS token
        FROM (SELECT {_TOKENS} AS toks FROM documents WHERE doc_id % 2 = 0)
    ),
    tb AS (
        SELECT unnest(toks) AS token
        FROM (SELECT {_TOKENS} AS toks FROM documents WHERE doc_id % 2 = 1)
    ),
    ca AS (SELECT token, COUNT(*) AS na FROM ta GROUP BY token),
    cb AS (SELECT token, COUNT(*) AS nb FROM tb GROUP BY token),
    j AS (
        SELECT COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
        FROM ca FULL OUTER JOIN cb ON ca.token = cb.token
    ),
    t AS (SELECT SUM(na) AS ta_, SUM(nb) AS tb_, COUNT(*) AS v FROM j),
    e AS (
        SELECT na, nb, ta_, tb_, v,
               (na + 0.5) / (ta_ + 0.5 * v) AS pa,
               (nb + 0.5) / (tb_ + 0.5 * v) AS pb
        FROM j, t
    )
    SELECT CAST(MAX(ta_) AS BIGINT) AS n_tokens_a,
           CAST(MAX(tb_) AS BIGINT) AS n_tokens_b,
           MAX(v) AS vocab_size,
           ROUND(SUM(pa * ln(pa / pb)), 6) AS kl_ab,
           ROUND(SUM(pb * ln(pb / pa)), 6) AS kl_ba,
           ROUND(SUM(pa * ln(pa / ((pa + pb) / 2.0))) / 2
                 + SUM(pb * ln(pb / ((pa + pb) / 2.0))) / 2, 6) AS js_divergence,
           ROUND(SUM(ABS(pa - pb)) / 2, 6) AS total_variation
    FROM e
    """,
)
def q_corpus_drift_metrics(spark, sf_dir):
    """Crawl-over-crawl drift monitoring: smoothed unigram KL both ways,
    Jensen-Shannon, and total variation between two corpus snapshots (here:
    the doc_id parity halves standing in for old/new crawls)."""
    docs = load_table(spark, "documents", sf_dir)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    return corpus_drift_metrics(a, b, smoothing=0.5)


@register(
    "weighted_sample_topn",
    """
    SELECT doc_id, n_chars, sample_key
    FROM (
        SELECT doc_id, n_chars,
               ROUND(POW(
                   (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) + 1.0) / 4294967297.0,
                   1.0 / CAST(n_chars AS DOUBLE)), 9) AS sample_key
        FROM documents WHERE n_chars > 0
    )
    ORDER BY sample_key DESC, doc_id
    LIMIT 150
    """,
)
def q_weighted_sample_topn(spark, sf_dir):
    """Deterministic weight-proportional sampling without replacement
    (Efraimidis–Spirakis A-Res keys over md5 uniforms): longer docs (by
    n_chars) are proportionally likelier to be kept. The oracle reproduces
    the exact selected set — keys are md5-derived and rounded before
    ranking."""
    docs = load_table(spark, "documents", sf_dir)
    return weighted_sample_topn(docs, 150, weight_col="n_chars").select(
        "doc_id", "n_chars", "sample_key"
    )


_DSIR_B = 512
_DSIR_N = 100


@register(
    "dsir_importance_select",
    f"""
    WITH pool AS (SELECT doc_id, text FROM documents WHERE lang <> 'en'),
    tgt AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
    gt AS (
        SELECT CAST(concat('0x', substr(md5(unnest({_G2})), 1, 8)) AS BIGINT)
               % {_DSIR_B} AS bucket
        FROM (SELECT {_TOKENS} AS toks FROM tgt)
    ),
    gr AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(unnest({_G2})), 1, 8)) AS BIGINT)
               % {_DSIR_B} AS bucket
        FROM (SELECT doc_id, {_TOKENS} AS toks FROM pool)
    ),
    bt AS (SELECT bucket, COUNT(*) AS nt FROM gt GROUP BY bucket),
    br AS (SELECT bucket, COUNT(*) AS nr FROM gr GROUP BY bucket),
    jb AS (
        SELECT COALESCE(bt.bucket, br.bucket) AS bucket,
               COALESCE(nt, 0) AS nt, COALESCE(nr, 0) AS nr
        FROM bt FULL OUTER JOIN br ON bt.bucket = br.bucket
    ),
    tot AS (SELECT SUM(nt) AS tt, SUM(nr) AS tr FROM jb),
    ratios AS (
        SELECT bucket,
               ln((nt + 1.0) / (tt + 1.0 * {_DSIR_B}))
               - ln((nr + 1.0) / (tr + 1.0 * {_DSIR_B})) AS log_ratio
        FROM jb, tot
    ),
    scored AS (
        SELECT gr.doc_id, COUNT(*) AS n_grams,
               SUM(r.log_ratio) AS log_weight
        FROM gr JOIN ratios r USING (bucket)
        GROUP BY gr.doc_id
    )
    SELECT p.doc_id,
           CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
           ROUND(COALESCE(s.log_weight, 0.0), 6) AS log_weight
    FROM pool p LEFT JOIN scored s USING (doc_id)
    ORDER BY ROUND(COALESCE(s.log_weight, 0.0), 6) DESC, p.doc_id
    LIMIT {_DSIR_N}
    """,
)
def q_dsir_importance_select(spark, sf_dir):
    """DSIR importance selection (Xie et al. 2023): non-English docs scored
    by hashed-bigram importance toward the English docs' distribution, top
    100 kept. Every hash is md5-derived, so the oracle reproduces bucket
    assignment — and therefore weights and ranks — exactly."""
    docs = load_table(spark, "documents", sf_dir)
    pool = docs.filter(F.col("lang") != "en")
    target = docs.filter(F.col("lang") == "en")
    return dsir_top_select(
        pool, target, _DSIR_N, ngram_n=2, n_buckets=_DSIR_B, smoothing=1.0
    )


@register("quality_classifier_scores", None)
def q_quality_classifier_scores(spark, sf_dir):
    """Learned quality filter (CCNet/fastText pattern): weak labels from
    the heuristic rules bootstrap a distributed MLlib logistic regression;
    the fitted coefficients serve as a closed-form sigmoid column
    expression (no MLlib at scoring time). Rows-only — training is
    iterative LBFGS; separability, AUC and Catalyst-serve parity are pinned
    in tests/test_classify.py."""
    from ningaloo_turtle_etl_spark.operators.classify import (
        featurize,
        train_quality_model,
        with_quality_probability,
    )

    docs = load_table(spark, "documents", sf_dir)
    weak = featurize(docs).withColumn(
        "label",
        ((F.col("quality_score") >= 0.4) & (F.col("dup_2gram_ratio") < 0.3))
        .cast("double"),
    ).select("doc_id", "text", "label")
    model = train_quality_model(weak)
    return with_quality_probability(docs, model).select(
        "doc_id", F.round("quality_prob", 3).alias("quality_prob")
    )


@register("text_classifier_scores", None)
def q_text_classifier_scores(spark, sf_dir):
    """Hashed bag-of-words classifier (the fastText pattern): trained
    distributed to recognize English documents from hashed token counts,
    served MLlib-free (explode → broadcast coefficient dim → per-doc sum →
    sigmoid). Rows-only; vocabulary separation and serve parity are pinned
    in tests/test_classify.py."""
    from ningaloo_turtle_etl_spark.operators.classify import (
        hashed_text_scores,
        train_hashed_text_model,
    )

    docs = load_table(spark, "documents", sf_dir)
    labeled = docs.withColumn("label", (F.col("lang") == "en").cast("double"))
    model = train_hashed_text_model(labeled, n_features=512)
    return hashed_text_scores(docs, model, out_col="p_english").select(
        "doc_id", "lang", F.round("p_english", 3).alias("p_english")
    )
