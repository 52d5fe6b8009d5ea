"""Series-statistics queries: per-group OLS trends (SQL-standard regr_*
aggregates), CUSUM change-point scans, cross-source rank normalization, and
PMI collocations. All full DuckDB-oracle rows — both engines implement
regr_slope/intercept/r2 and percent_rank with identical definitions."""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table


def _daily_series(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.to_unix_timestamp("ts") / 86400).alias("day"),
        )
        .agg(F.round(F.avg("value"), 6).alias("v"))
    )


_DAILY_SQL = """
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             round(AVG(value), 6) AS v
      FROM events GROUP BY 1, 2
"""


@register(
    "daily_trend_by_type",
    f"""
    WITH d AS ({_DAILY_SQL})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(regr_slope(v, day), 6) AS slope,
           ROUND(regr_intercept(v, day), 6) AS intercept,
           ROUND(regr_r2(v, day), 6) AS r2
    FROM d GROUP BY event_type
    ORDER BY event_type
    """,
)
def daily_trend_by_type(spark, sf_dir):
    """OLS trend of the daily mean value per event type
    (`operators/trend.py group_trend`): is the metric drifting, and how
    well does a line explain it? Two hash aggregates (daily grain, then
    regr_* per group) — both map-side partial, no window, no numpy. The
    daily means are rounded to 6 dp BEFORE the regression in both engines
    so the fit inputs are bit-identical."""
    from ningaloo_turtle_etl_spark.operators.trend import group_trend

    return group_trend(_daily_series(spark, sf_dir), "event_type", "day", "v")


@register(
    "value_change_points",
    f"""
    WITH d AS ({_DAILY_SQL}),
    s AS (
      SELECT event_type, AVG(v) AS mu, stddev_pop(v) AS sd,
             CAST(COUNT(*) AS BIGINT) AS n_steps
      FROM d GROUP BY 1
    ),
    c AS (
      SELECT d.event_type, d.day, s.n_steps, s.sd,
             SUM(d.v - s.mu) OVER (PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      FROM d JOIN s USING (event_type)
    ),
    r AS (
      SELECT event_type, day, n_steps, cusum, sd,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(cusum) DESC, day ASC) AS rk
      FROM c
    )
    SELECT event_type, day AS change_point, n_steps,
           ROUND(abs(cusum), 6) AS cusum_peak,
           ROUND(abs(cusum) / (sd * sqrt(n_steps)), 6) AS cusum_stat
    FROM r WHERE rk = 1
    ORDER BY event_type
    """,
)
def value_change_points(spark, sf_dir):
    """CUSUM change-point scan over each event type's daily mean series
    (`operators/trend.py cusum_scan`): the day where the cumulative
    deviation from the series mean peaks, with the KS-normalized peak
    height. The scan runs entirely on the aggregated daily grain."""
    from ningaloo_turtle_etl_spark.operators.trend import cusum_scan

    return cusum_scan(_daily_series(spark, sf_dir), "event_type", "day", "v")


@register(
    "source_quantile_norm",
    """
    SELECT doc_id, source, n_chars,
           ROUND(percent_rank() OVER (PARTITION BY source ORDER BY n_chars),
                 6) AS pct_rank
    FROM documents
    ORDER BY doc_id
    """,
)
def source_quantile_norm(spark, sf_dir):
    """Rank-normalize document length within each source
    (`operators/trend.py quantile_normalize`) — the cross-source score
    calibration that makes a single global threshold meaningful when
    sources have different length distributions."""
    from ningaloo_turtle_etl_spark.operators.trend import quantile_normalize

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", "n_chars"
    )
    return quantile_normalize(docs, "source", "n_chars")


@register(
    "pmi_collocations",
    r"""
    WITH toks AS (
      SELECT DISTINCT doc_id AS _id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ),
    dfq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY 1),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    kept AS (
      SELECT t._id, t.tok, d.n_tok FROM toks t
      JOIN dfq d USING (tok) CROSS JOIN nd
      WHERE d.n_tok <= n_docs * 0.95
    ),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, a.n_tok AS n_a, b.n_tok AS n_b,
             CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM kept a JOIN kept b ON a._id = b._id AND a.tok < b.tok
      GROUP BY 1, 2, 3, 4
      HAVING COUNT(*) >= 25
    )
    SELECT tok_a, tok_b, n_pair,
           ROUND(ln(n_pair * n_docs * 1.0 / (n_a * n_b)), 6) AS pmi
    FROM pairs CROSS JOIN nd
    ORDER BY pmi DESC, tok_a, tok_b
    LIMIT 50
    """,
)
def pmi_collocations(spark, sf_dir):
    """Top-50 token collocations by document-level PMI (df cut at
    0.95 — this corpus's ~31-token vocabulary is nearly all high-df, so a
    realistic 0.3 cut would empty it; real corpora use the default)
    (`operators/text.py pmi_cooccurrence`): which words co-occur far more
    than chance — the topic/phrase-structure probe. The df<=0.3N cut keeps
    the within-doc pairing off stopword-grade tokens."""
    from ningaloo_turtle_etl_spark.operators.text import pmi_cooccurrence

    docs = load_table(spark, "documents", sf_dir)
    out = pmi_cooccurrence(docs, min_pair_count=25, max_df_frac=0.95)
    return out.orderBy(
        F.desc("pmi"), F.asc("tok_a"), F.asc("tok_b")
    ).limit(50)
