"""QA-rule and validation-suite tests (SURVEY.md §5.1, U6/F16)."""

from __future__ import annotations

from ningaloo_turtle_etl_spark.operators.quality import (
    duplicated_key_rows,
    missing_coordinates,
    na_lookup_rows,
    only_clean,
    only_errors,
    orphan_observations,
    validate_fk_exists,
    validate_measurements,
)


def test_qa_rules(spark):
    sites = spark.createDataFrame(
        [
            (1, "A", 1.0, 1.0, 2.0, 2.0),
            (2, "A", 1.0, 1.0, 2.0, 2.0),  # duplicate subsection
            (3, "B", None, 1.0, 2.0, 2.0),  # missing coord
        ],
        "id long, subsection string, y_max double, y_min double, x_max double, x_min double",
    )
    assert duplicated_key_rows(sites, ["subsection"]).count() == 1
    assert missing_coordinates(sites).collect()[0]["id"] == 3

    crawls = spark.createDataFrame(
        [(1, 100, "Green"), (2, 999, "NA"), (3, 100, None)],
        "crawl_id long, survey_id long, species_name string",
    )
    surveys = spark.createDataFrame([(100,)], "survey_id long")
    assert orphan_observations(crawls, surveys).collect()[0]["crawl_id"] == 2
    assert {r["crawl_id"] for r in na_lookup_rows(crawls, "species_name").collect()} == {2, 3}


def test_validate_measurements_bounds(spark):
    # tagging-etl.Rmd:361-369: bounds live in TRT_MEASUREMENT_TYPES.
    bounds = spark.createDataFrame(
        [("CCL", 30.0, 200.0), ("WT", 1.0, 300.0)],
        "measurement_type string, min_value double, max_value double",
    )
    m = spark.createDataFrame(
        [(1, "CCL", 98.5), (2, "CCL", 10.0), (3, "WT", 500.0), (4, "XX", 5.0)],
        "observation_id long, measurement_type string, value double",
    )
    out = validate_measurements(m, bounds)
    errs = {r["observation_id"]: r["error_number"] for r in only_errors(out).collect()}
    assert errs == {2: 1002, 3: 1003, 4: 1001}
    assert only_clean(out).collect()[0]["observation_id"] == 1
    msgs = {r["observation_id"]: r["error_message"] for r in only_errors(out).collect()}
    assert "below minimum" in msgs[2] and "above maximum" in msgs[3]


def test_validate_fk_exists(spark):
    tags = spark.createDataFrame(
        [(1, "WA1234"), (2, "WA9999")], "obs long, tag_name string"
    )
    known = spark.createDataFrame([("WA1234",)], "tag_name string")
    out = validate_fk_exists(tags, known, "tag_name", 2001, "unknown flipper tag")
    errs = only_errors(out).collect()
    assert len(errs) == 1 and errs[0]["obs"] == 2
    assert errs[0]["error_message"] == "unknown flipper tag"


def test_lang_id_detects_unsegmented_chinese(spark):
    # Regression (r04 review): whitespace tokenization leaves real Chinese
    # as ONE token, so token-equality scoring never fired and every CJK doc
    # was 'und'. Marker-character counting must detect it.
    from ningaloo_turtle_etl_spark.operators.text import with_lang_id

    df = spark.createDataFrame(
        [(1, "我是学生的朋友我们在这里"), (2, "the cat and the dog in a house")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_lang_id(df).collect()}
    assert rows[1]["predicted_lang"] == "zh" and rows[1]["score_zh"] >= 4
    assert rows[2]["predicted_lang"] == "en"


def test_quality_score_does_not_punish_cjk_letters(spark):
    # Regression (r04 review): ASCII-only \w counted every CJK/accented
    # letter as punctuation, scoring fluent Chinese punct_ratio ≈ 1.0.
    from ningaloo_turtle_etl_spark.operators.text import with_quality_score

    df = spark.createDataFrame(
        [(1, "我们 在 这里 学习 中文 課程 今天 天氣 很好 朋友"),
         (2, "café résumé naïve Übung schön señor année déjà vu être")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_quality_score(df).collect()}
    assert rows[1]["punct_ratio"] == 0.0
    assert rows[2]["punct_ratio"] == 0.0


def test_token_counts_zero_for_null_text(spark):
    # Regression (r04 review): size(NULL) = -1 made NULL-text rows
    # contribute negative token counts to budget sums.
    from ningaloo_turtle_etl_spark.operators.text import with_token_counts

    df = spark.createDataFrame([(1, None), (2, "two words")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in with_token_counts(df).collect()}
    assert rows[1]["n_words"] == 0 and rows[1]["n_chars"] == 0
    assert rows[1]["n_tokens_est"] == 0
    assert rows[2]["n_words"] == 2


def test_grouped_html_table_escapes_cells(spark):
    from ningaloo_turtle_etl_spark.operators.relational import grouped_html_table

    df = spark.createDataFrame(
        [("g", "<script>alert(1)</script>", "a&b")], "g string, x string, y string"
    )
    html = grouped_html_table(df, "g", ["x", "y"]).collect()[0]["html"]
    assert "<script>" not in html
    assert "&lt;script&gt;" in html and "a&amp;b" in html
