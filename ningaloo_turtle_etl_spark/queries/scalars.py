"""Scalar-layer queries — SURVEY.md §2.8 (F1-F14) exercised end-to-end.

Each query drives one scalar family through a realistic pipeline fragment so
the oracle checks the *semantics* (parse order, timezone math, null paths),
not just that the expression compiles.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.functions.scalars import (
    make_timestamp_from,
    parse_date_time,
)
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table


@register(
    "timestamp_parse_multi",
    """
    WITH raw AS (
        SELECT event_id,
               CASE event_id % 3
                   WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
                   WHEN 1 THEN strftime(ts, '%m/%d/%Y %H:%M:%S')
                   ELSE strftime(ts, '%Y-%m-%d')
               END AS raw_ts
        FROM events
    )
    SELECT event_id, raw_ts,
           COALESCE(try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S'),
                    try_strptime(raw_ts, '%m/%d/%Y %H:%M:%S'),
                    try_strptime(raw_ts, '%Y-%m-%d')) AS parsed
    FROM raw
    """,
)
def timestamp_parse_multi(spark, sf_dir):
    """F1: lubridate parse_date_time(orders=c(...)) — try formats in sequence
    (ningaloo-etl.Rmd:170-178, turtle-tracks.Rmd:46-54). The mixed-format
    string column is manufactured from events.ts, then re-parsed through the
    engine's coalesce(try_to_timestamp…) chain."""
    ev = load_table(spark, "events", sf_dir)
    raw = ev.select(
        "event_id",
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "MM/dd/yyyy HH:mm:ss"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd"))
        .alias("raw_ts"),
    )
    return raw.withColumn(
        "parsed",
        parse_date_time(
            "raw_ts", ["yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy HH:mm:ss", "yyyy-MM-dd"]
        ),
    )


@register(
    "timestamp_pipeline",
    """
    WITH raw AS (
        SELECT event_id, ts,
               CASE event_id % 3
                   WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
                   WHEN 1 THEN strftime(ts, '%m/%d/%Y %H:%M:%S')
                   ELSE strftime(ts, '%Y-%m-%d')
               END AS raw_ts
        FROM events
    )
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(ts AS TIMESTAMP) + INTERVAL 8 HOURS AS ts_perth,
           CAST(CAST(ts AS TIMESTAMP) + INTERVAL 8 HOURS AS DATE) AS observation_date,
           YEAR(ts) AS y, MONTH(ts) AS mo, DAY(ts) AS d,
           HOUR(ts) AS h, MINUTE(ts) AS mi,
           CAST(EXTRACT(SECOND FROM ts) AS INT) AS s,
           WEEK(ts) AS isoweek,
           CAST(date_trunc('second', ts) AS TIMESTAMP) AS recombined,
           raw_ts,
           COALESCE(try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S'),
                    try_strptime(raw_ts, '%m/%d/%Y %H:%M:%S'),
                    try_strptime(raw_ts, '%Y-%m-%d')) AS parsed
    FROM raw
    """,
)
def timestamp_pipeline(spark, sf_dir):
    """F1-F5 as one pipeline over events (merged so each lands a driver
    correctness row within the 50-slot window):

    - F1 multi-format parse: lubridate parse_date_time(orders=c(...))
      (ningaloo-etl.Rmd:170-178, turtle-tracks.Rmd:46-54) — a mixed-format
      string column manufactured from ts, re-parsed through the
      coalesce(try_to_timestamp…) chain.
    - F2/F5 tz conversion + date cast: with_tz(ts, 'Australia/Perth') then
      as_date — the local observation-day derivation (turtle-tracks.Rmd:55,64;
      tagging-etl.Rmd:396). Spark uses the real tz database; AWST = UTC+8 with
      no DST, so the oracle states it as fixed-interval arithmetic.
    - F3 component extraction: lubridate year/…/isoweek
      (ningaloo-etl.Rmd:178-179, wastd-api.Rmd:40,67).
    - F4 recombination: date.id + hours()+minutes()+seconds()
      (ningaloo-etl.Rmd:178, tagging-etl.Rmd:395) via make_timestamp — feeding
      ts to itself as both halves reproduces date_trunc('second')."""
    ev = load_table(spark, "events", sf_dir)
    perth = F.from_utc_timestamp("ts", "Australia/Perth")
    raw_ts = (
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "MM/dd/yyyy HH:mm:ss"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd"))
    )
    return ev.select(
        "event_id",
        "ts",
        perth.alias("ts_perth"),
        F.to_date(perth).alias("observation_date"),
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.weekofyear("ts").alias("isoweek"),
        make_timestamp_from("ts", "ts").alias("recombined"),
        raw_ts.alias("raw_ts"),
    ).withColumn(
        "parsed",
        parse_date_time(
            "raw_ts", ["yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy HH:mm:ss", "yyyy-MM-dd"]
        ),
    )


@register(
    "string_null_funcs",
    """
    SELECT l.l_orderkey, l.l_linenumber,
           COALESCE(p.p_name, 'NA') AS part_name,
           COALESCE(p.p_retailprice, 0.0) AS retail_price,
           (p.p_partkey IS NULL) AS is_orphan,
           REGEXP_REPLACE(LOWER(COALESCE(p.p_name, 'NA')), '[# ]', '_', 'g') AS slug,
           CONCAT_WS(' / ', COALESCE(p.p_name, 'NA'), COALESCE(p.p_brand, 'NA')) AS label,
           LENGTH(COALESCE(p.p_name, 'NA')) AS name_len
    FROM lineitem l
    LEFT JOIN (SELECT * FROM part WHERE p_size > 40) p ON l.l_partkey = p.p_partkey
    """,
)
def string_null_funcs(spark, sf_dir):
    """F9/F10/F11 as one pipeline (merged round-2 for driver-window reasons):
    is.na / NA→'NA' / fill=0 null handling (ningaloo-etl.Rmd:238,313) over
    manufactured lookup misses, then str_replace_all sanitation + paste()
    concatenation (turtle-tracks.Rmd:38-39,89; tagging-etl.Rmd:283) applied
    to the null-patched columns."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_size") > 40)
    j = li.join(p, li.l_partkey == p.p_partkey, "left")
    part_name = F.coalesce("p_name", F.lit("NA"))
    return j.select(
        "l_orderkey",
        "l_linenumber",
        part_name.alias("part_name"),
        F.coalesce("p_retailprice", F.lit(0.0)).alias("retail_price"),
        F.col("p_partkey").isNull().alias("is_orphan"),
        F.regexp_replace(F.lower(part_name), "[# ]", "_").alias("slug"),
        F.concat_ws(
            " / ", part_name, F.coalesce("p_brand", F.lit("NA"))
        ).alias("label"),
        F.length(part_name).alias("name_len"),
    )


@register(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k2
    FROM events
    """,
)
def json_extract_props(spark, sf_dir):
    """F14: nested-JSON field extraction (turtle-tracks.Rmd:28-43,
    track_analysis.R:17-35) with an explicit payload schema — from_json, not
    string hacking, so malformed payloads become NULLs not errors."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    ev = load_table(spark, "events", sf_dir)
    payload = StructType([StructField("k", IntegerType())])
    parsed = ev.withColumn("_p", F.from_json("props", payload))
    return parsed.select(
        "event_id",
        F.col("_p.k").alias("k"),
        (F.col("_p.k") * 2).alias("k2"),
    )
