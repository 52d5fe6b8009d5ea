"""Training-data pipeline queries over ``documents`` / ``embeddings`` —
dedup, text analysis, similarity search. Since r04 everything here is
oracle-checked: MinHash/SimHash ride the cross-engine md5 hash family,
the ANN tiers and semantic dedup serve seed-regenerated or frozen-fixture
parameters, and the multimodal fake codec replays byte-for-byte in SQL;
independent Python reference implementations in tests/test_llm_ops.py
additionally pin recall/planted-pair behavior.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.dedup import (
    exact_dedup_semi,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from ningaloo_turtle_etl_spark.operators.similarity import (
    ann_recall_report,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from ningaloo_turtle_etl_spark.operators.text import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_counts,
)
from ningaloo_turtle_etl_spark.registry import register
from ningaloo_turtle_etl_spark.sources.tables import load_table

_NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
# Raw-case tokenizer for oracles whose Spark side hashes the ORIGINAL text
# (minhash/simhash shingle and token hashes): lowercasing here would merge
# case-variant shingles the operator keeps distinct — latent divergence on
# the first capitalized document (r04 review, reproduced on a mixed-case
# corpus).
_TOKENS_RAW = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')" 
_TOKENS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"


@register(
    "dedup_exact",
    f"""
    SELECT doc_id, lang, source, n_chars
    FROM (SELECT doc_id, lang, source, n_chars,
                 ROW_NUMBER() OVER (
                     PARTITION BY substr(md5({_NORM}), 1, 16)
                     ORDER BY doc_id) AS rn
          FROM documents)
    WHERE rn = 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup via the zero-body-shuffle variant: only (fingerprint, id)
    shuffles to elect keepers, then an id semi-join — document bodies stay
    map-side. (The window form in operators.dedup.exact_dedup shuffles full
    rows on the fingerprint; same answer, wrong trade at 100 TB.)"""
    docs = load_table(spark, "documents", sf_dir)
    return exact_dedup_semi(docs).select("doc_id", "lang", "source", "n_chars")


@register(
    "text_token_stats",
    rf"""
    SELECT doc_id,
           len({_TOKENS}) AS n_words,
           length(text) AS n_chars,
           greatest(
               len(list_filter(string_split_regex(
                   regexp_replace(text, '([^\w\s]|\d)', ' \1 ', 'g'), '\s+'),
                   x -> x <> '')),
               CAST(ceil(length(text) / 4.0) AS INT)
           ) AS n_tokens_est
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace words + BPE-ish subword estimate."""
    docs = load_table(spark, "documents", sf_dir)
    return with_token_counts(docs).select("doc_id", "n_words", "n_chars", "n_tokens_est")


@register(
    "text_quality_scores",
    rf"""
    WITH t AS (
        SELECT doc_id, text, {_TOKENS} AS toks, length(text) AS n_chars
        FROM documents
    ), m AS (
        SELECT doc_id, n_chars, len(toks) AS n_words,
               len(list_filter(toks, x -> x IN
                   ('the','and','of','to','a','in','is','it','that','was','for','on')))
                   AS n_stop,
               n_chars - length(regexp_replace(text, '[^\p{{L}}\p{{N}}_\s]', '', 'g')) AS n_punct
        FROM t
    )
    SELECT doc_id,
           ROUND(CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END, 6)
               AS stopword_ratio,
           ROUND(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 6)
               AS punct_ratio,
           ROUND(
             (CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.2 END)
           * (CASE WHEN n_words > 0 AND CAST(n_stop AS DOUBLE)/n_words > 0.05 THEN 1.0 ELSE 0.5 END)
           * (CASE WHEN n_chars > 0 AND CAST(n_punct AS DOUBLE)/n_chars < 0.2 THEN 1.0 ELSE 0.3 END)
           * (CASE WHEN n_words > 0 AND CAST(n_chars AS DOUBLE)/n_words BETWEEN 2 AND 12
                   THEN 1.0 ELSE 0.5 END), 6) AS quality_score
    FROM m
    """,
)
def text_quality_scores(spark, sf_dir):
    """Gopher/C4-style quality heuristics as one fused projection."""
    docs = load_table(spark, "documents", sf_dir)
    q = with_quality_score(docs)
    return q.select(
        "doc_id",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )


_MARKER_SQL = {
    "en": "('the','and','of','to','a','in','is')",
    "de": "('der','die','das','und','ist','nicht','ein')",
    "fr": "('le','la','les','et','est','une','dans')",
    "es": "('el','la','los','y','es','una','en')",
    "zh": "('的','是','在','了','和','有','我')",
}
def _zh_char_score_sql() -> str:
    # Character-occurrence counts via length deltas (replace() is identical
    # cross-engine) — token-equality scoring never fires on unsegmented CJK.
    terms = " + ".join(
        f"(length(text) - length(replace(text, '{m}', '')))"
        for m in ("的", "是", "在", "了", "和", "有", "我")
    )
    return f"COALESCE({terms}, 0) AS score_zh"


_SCORES_SQL = ",\n".join(
    (
        _zh_char_score_sql()
        if k == "zh"
        else f"len(list_filter(toks, t -> t IN {v})) AS score_{k}"
    )
    for k, v in _MARKER_SQL.items()
)


@register(
    "lang_id_confusion",
    f"""
    WITH t AS (SELECT doc_id, lang, text, {_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id, lang, {_SCORES_SQL} FROM t),
    p AS (
        SELECT lang,
               CASE WHEN greatest(score_en,score_de,score_fr,score_es,score_zh) = 0
                        THEN 'und'
                    WHEN score_de = greatest(score_en,score_de,score_fr,score_es,score_zh) THEN 'de'
                    WHEN score_en = greatest(score_en,score_de,score_fr,score_es,score_zh) THEN 'en'
                    WHEN score_es = greatest(score_en,score_de,score_fr,score_es,score_zh) THEN 'es'
                    WHEN score_fr = greatest(score_en,score_de,score_fr,score_es,score_zh) THEN 'fr'
                    ELSE 'zh' END AS predicted_lang
        FROM s
    )
    SELECT lang, predicted_lang, COUNT(*) AS n FROM p GROUP BY 1, 2
    """,
)
def lang_id_confusion(spark, sf_dir):
    """Language-ID confusion matrix: labeled lang vs marker-word prediction.
    (Synthetic word-salad text makes accuracy meaningless; determinism of
    the scoring — including tie-breaks — is what the oracle pins.)"""
    docs = load_table(spark, "documents", sf_dir)
    tagged = with_lang_id(docs)
    return tagged.groupBy("lang", "predicted_lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "doc_fingerprints",
    f"SELECT doc_id, substr(md5({_NORM}), 1, 16) AS fingerprint FROM documents",
)
def doc_fingerprints(spark, sf_dir):
    """Portable content fingerprint (md5 prefix of normalized text)."""
    docs = load_table(spark, "documents", sf_dir)
    return with_fingerprint(docs).select("doc_id", "fingerprint")


@register(
    "ngram_jaccard_near_dups",
    rf"""
    WITH t AS (
        SELECT doc_id, lang, list_distinct({_TOKENS}) AS sh
        FROM documents WHERE doc_id < 150
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(list_cat(a.sh, b.sh))), 6) AS jaccard
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_cat(a.sh, b.sh))) >= 0.5
    """,
)
def ngram_jaccard_near_dups(spark, sf_dir):
    """Blocked exact n-gram Jaccard (block = lang): the verify stage of the
    filter-verify dedup pattern, run exact on a bounded candidate set."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 150)
    return ngram_jaccard_pairs(
        docs, block_col="lang", shingle_n=1, threshold=0.5
    )


_DOT = "list_sum(list_transform(list_zip(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), x -> x[1]*x[2]))"
_NORMSQ = "list_sum(list_transform(CAST({0}.embedding AS DOUBLE[]), x -> x*x))"


@register(
    "embedding_cosine_topk",
    f"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               ROUND({_DOT} / (sqrt({_NORMSQ.format('c')}) * sqrt({_NORMSQ.format('q')})), 6)
                   AS cosine
        FROM embeddings c, embeddings q
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT query_id, vec_id, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id) AS INT) AS rank
        FROM pairs
    ) WHERE rank <= 3
    """,
)
def embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (the exact ANN baseline): broadcast query
    set, map-side dot products in double, ranked window per query."""
    emb = load_table(spark, "embeddings", sf_dir)
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)


# --- MinHash / SimHash: full oracles via the md5 hash family ----------------
# The md5 family (operators/dedup.py) pays ONE digest per shingle/token and
# derives everything else with integer arithmetic DuckDB reproduces verbatim
# — which is what turns these two flagship dedup operators from pytest-
# trusted rows-only checks into hash-proven oracle rows.

_H60 = "('0x' || substr(md5({0}), 1, 15))::BIGINT"


def _minhash_oracle_sql(
    max_id: int = 500,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int = 500,
) -> str:
    """DuckDB SQL replicating minhash_near_dup_pairs(hash_family='md5')
    end-to-end: shingle → md5-60 hash → universal-hash signature → folded
    band buckets (with the size cap) → candidate self-join → exact Jaccard
    on the hashed shingle sets."""
    from ningaloo_turtle_etl_spark.operators.dedup import (
        FOLD_MULT,
        FOLD_MULT2,
        FOLD_P,
        MERSENNE61,
        minhash_coeffs,
    )

    rows = num_hashes // bands
    slots = ",\n               ".join(
        f"list_min(list_transform(sh, h -> ({a} * (h & 2147483647) + {b}) "
        f"% {MERSENNE61}))"
        for a, b in minhash_coeffs(num_hashes)
    )

    def fold(b: int, mult: int) -> str:
        acc = f"({b} % {FOLD_P})"
        for r in range(rows):
            acc = f"(({acc} * {mult} + (sig[{b * rows + r + 1}] & 4294967295)) % {FOLD_P})"
        return acc

    buckets = ", ".join(
        f"{fold(b, FOLD_MULT)} * 2147483648 + {fold(b, FOLD_MULT2)}"
        for b in range(bands)
    )
    return f"""
    WITH t AS (
        SELECT doc_id AS id, {_TOKENS_RAW} AS toks
        FROM documents WHERE doc_id < {max_id}
    ),
    sstr AS (
        SELECT id,
               CASE WHEN len(toks) >= {shingle_n}
                    THEN list_distinct(list_transform(
                             range(len(toks) - {shingle_n - 1}),
                             i -> array_to_string(
                                 list_slice(toks, i + 1, i + {shingle_n}), ' ')))
                    ELSE [array_to_string(toks, ' ')] END AS sh_str
        FROM t
    ),
    hashed AS (
        SELECT id,
               list_distinct(list_transform(sh_str, s -> {_H60.format('s')})) AS sh
        FROM sstr
    ),
    sig AS (
        SELECT id,
               [{slots}] AS sig
        FROM hashed
    ),
    banded AS (
        SELECT id, unnest([{buckets}]) AS bucket FROM sig
    ),
    capped AS (
        SELECT id, bucket FROM (
            SELECT id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS bn
            FROM banded
        ) WHERE bn <= {max_bucket_size}
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM capped a JOIN capped b ON a.bucket = b.bucket AND a.id < b.id
    ),
    verified AS (
        SELECT id_a, id_b,
               CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
                   AS jac
        FROM cand
        JOIN hashed sa ON cand.id_a = sa.id
        JOIN hashed sb ON cand.id_b = sb.id
    )
    SELECT id_a, id_b, ROUND(jac, 6) AS jaccard
    FROM verified WHERE jac >= {threshold}
    """


def _simhash_oracle_sql(
    max_id: int = 500, max_hamming: int = 3, width: int = 60
) -> str:
    """DuckDB SQL replicating simhash_near_dup_pairs(signature='md5'):
    60-bit md5-token-hash signature by bit-majority, exact (block, value)
    integer-packed buckets, pigeonhole candidate join, bit_count(xor)
    verification."""
    blocks = max_hamming + 1
    bounds = [round(width * k / blocks) for k in range(blocks + 1)]
    w_max = max(bounds[k + 1] - bounds[k] for k in range(blocks))
    bits = " + ".join(
        f"CASE WHEN 2 * len(list_filter(hs, h -> (h >> {b}) & 1 = 1)) > len(hs) "
        f"THEN {1 << b}::BIGINT ELSE 0 END"
        for b in range(width)
    )
    buckets = ", ".join(
        f"{k * (1 << w_max)} + ((sig >> {bounds[k]}) & {(1 << (bounds[k + 1] - bounds[k])) - 1})"
        for k in range(blocks)
    )
    return f"""
    WITH t AS (
        SELECT doc_id AS id, {_TOKENS_RAW} AS toks
        FROM documents WHERE doc_id < {max_id}
    ),
    th AS (
        SELECT id, list_transform(toks, tk -> {_H60.format('tk')}) AS hs FROM t
    ),
    sig AS (
        SELECT id, COALESCE({bits}, 0) AS sig FROM th
    ),
    banded AS (
        SELECT id, sig, unnest([{buckets}]) AS bucket FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               a.sig AS sig_a, b.sig AS sig_b
        FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


@register("minhash_near_dups", _minhash_oracle_sql())
def minhash_near_dups(spark, sf_dir):
    """MinHash+LSH near-dup pairs (filter-verify), md5 hash family: one
    digest per shingle, 2-universal integer slots, folded band buckets —
    the whole pipeline (including the bucket-size cap) replays in DuckDB,
    so this is a full hash row, not rows-only. Planted-pair recall and the
    xxhash64 family's parity stay pinned in tests/test_llm_ops.py."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 500)
    return minhash_near_dup_pairs(docs, shingle_n=3, threshold=0.5, hash_family="md5")


@register("simhash_near_dups", _simhash_oracle_sql())
def simhash_near_dups(spark, sf_dir):
    """SimHash near-dup pairs, md5 family: 60-bit bit-majority signature
    over md5 token hashes, exact integer-packed pigeonhole blocks — fully
    reproduced by the DuckDB oracle (bit_count(xor) verification included)."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 500)
    return simhash_near_dup_pairs(docs, max_hamming=3, signature="md5")


from ningaloo_turtle_etl_spark.queries.ann_oracles import (
    ivf_oracle_sql,
    matryoshka_recall_oracle_sql,
    matryoshka_topk_oracle_sql,
    ndcg_oracle_sql,
    ivf_recall_oracle_sql,
    jl_distortion_oracle_sql,
    lsh_recall_oracle_sql,
    lsh_oracle_sql,
    ivf_pq_oracle_sql,
    pq_oracle_sql,
    pq_recall_oracle_sql,
    pq_train_oracle_sql,
    quantized_oracle_sql,
    trained_ivf_pq_oracle_sql,
)


@register("ann_lsh_topk", lsh_oracle_sql())
def ann_lsh_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN (bucket + multiprobe + exact re-rank).
    Full oracle row since r04: the seeded hyperplanes are data-independent
    constants, so the DuckDB oracle regenerates them and replays the
    sign-bucket collisions and re-rank bit-for-bit."""
    emb = load_table(spark, "embeddings", sf_dir)
    return lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, bits=6, tables=6)


@register("ann_ivf_recall", ivf_recall_oracle_sql(k=10))
def ann_ivf_recall(spark, sf_dir):
    """Recall@10 of the IVF index (frozen centroids, nprobe=3) against the
    brute-force ground truth — the companion acceptance row to
    ann_lsh_recall, so the two index families publish comparable numbers."""
    import numpy as np

    from ningaloo_turtle_etl_spark.queries.ann_oracles import _fixture

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") < 5)
    cents = np.asarray(_fixture("ivf_centroids")["centroids"], dtype=float)
    approx = ivf_topk(emb, qs, k=10, nprobe=3, centroids=cents)
    exact = cosine_topk(emb, qs, k=10)
    return ann_recall_report(approx, exact).orderBy("query_id")


@register("ann_lsh_recall", lsh_recall_oracle_sql(k=10))
def ann_lsh_recall(spark, sf_dir):
    """Recall@10 of the LSH ANN index against the brute-force ground truth
    (`operators/similarity.py ann_recall_report`): the acceptance metric an
    approximate index must publish before replacing the exact scan. Both
    halves replay in the DuckDB oracle (seeded hyperplanes + brute-force
    rank), so the recall numbers themselves are hash-proven."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") < 5)
    approx = lsh_topk(emb, qs, k=10, bits=6, tables=6)
    exact = cosine_topk(emb, qs, k=10)
    return ann_recall_report(approx, exact).orderBy("query_id")


@register("ann_pq_recall", pq_recall_oracle_sql(k=10, rerank=50))
def ann_pq_recall(spark, sf_dir):
    """Recall@10 of the PQ/ADC index (frozen codebooks, 50-candidate exact
    re-rank) against the exact squared-L2 ground truth — completing the
    acceptance-metric trio with ann_lsh_recall / ann_ivf_recall. Ground
    truth is L2, not cosine: PQ ranks by squared-L2, and on unnormalized
    embeddings the two orderings disagree, so a cosine ground truth would
    misstate the index's recall. Both halves replay in the DuckDB oracle
    (LUT chains + brute L2 rank), so the recall numbers are hash-proven."""
    import numpy as np

    from ningaloo_turtle_etl_spark.operators.quantize import pq_topk
    from ningaloo_turtle_etl_spark.operators.similarity import l2_topk
    from ningaloo_turtle_etl_spark.queries.ann_oracles import _fixture

    fix = _fixture("pq_codebooks")
    books = np.asarray(fix["codebooks"], dtype=float)
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") < 5)
    approx = pq_topk(emb, qs, books, k=10, rerank=50)
    exact = l2_topk(emb, qs, k=10)
    return ann_recall_report(approx, exact).orderBy("query_id")


@register("ann_ivf_topk", ivf_oracle_sql())
def ann_ivf_topk(spark, sf_dir):
    """IVF ANN (centroid cells + nprobe + exact re-rank), blocking against
    the FROZEN ivf_centroids fixture (deterministic md5-hash-sampled
    k-means) — argmin assignment, nprobe probing and the re-rank all
    replay in the DuckDB oracle (r04)."""
    import numpy as np

    from ningaloo_turtle_etl_spark.queries.ann_oracles import _fixture

    emb = load_table(spark, "embeddings", sf_dir)
    cents = np.asarray(_fixture("ivf_centroids")["centroids"], dtype=float)
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=3, nprobe=3, centroids=cents
    )


@register(
    "corpus_clean_pipeline",
    rf"""
    WITH fp AS (
        SELECT doc_id, text, lang, n_chars,
               substr(md5({_NORM}), 1, 16) AS fingerprint
        FROM documents
    ),
    kept AS (
        SELECT f.* FROM fp f JOIN (
            SELECT fingerprint, MIN(doc_id) AS doc_id FROM fp GROUP BY fingerprint
        ) k ON f.doc_id = k.doc_id
    ),
    t AS (
        SELECT doc_id, lang, n_chars, {_TOKENS} AS toks, text FROM kept
    ),
    m AS (
        SELECT doc_id, lang, n_chars, len(toks) AS n_words,
               len(list_filter(toks, x -> x IN
                   ('the','and','of','to','a','in','is','it','that','was','for','on')))
                   AS n_stop,
               n_chars - length(regexp_replace(text, '[^\p{{L}}\p{{N}}_\s]', '', 'g')) AS n_punct
        FROM t
    )
    SELECT doc_id, lang, n_words, n_chars
    FROM m
    WHERE n_words >= 5
      AND (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 1.0 END) < 0.2
      AND lang IN ('en', 'de', 'fr', 'es')
    """,
)
def corpus_clean_pipeline(spark, sf_dir):
    """End-to-end LLM corpus prep as ONE lazy plan: exact dedup (keep lowest
    id per fingerprint) → quality gate (min words, punctuation ratio) →
    language allowlist → per-doc stats. The composition the individual
    operators exist for — each stage is the same operator the standalone
    queries register, fused by Catalyst into dedup's shuffle plus map-only
    stages."""
    docs = load_table(spark, "documents", sf_dir)
    deduped = exact_dedup_semi(docs)
    q = with_quality_score(with_token_counts(deduped))
    cleaned = q.filter(
        (F.col("n_words") >= 5)
        & (F.col("punct_ratio") < 0.2)
        & (F.col("lang").isin("en", "de", "fr", "es"))
    )
    return cleaned.select("doc_id", "lang", "n_words", "n_chars")


@register(
    "sketch_profile",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_within_3rsd,
           TRUE AS p50_within_rank_eps,
           TRUE AS p95_within_rank_eps
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def sketch_profile(spark, sf_dir):
    """One-pass sketch profile per event_type: HLL++ distinct users +
    Greenwald-Khanna value quantiles — the bounded-state form of the
    profiling questions that need full shuffles when asked exactly. The
    native estimates are engine-specific (DuckDB cannot replay HLL++/GK
    sketch state), so the registered row outputs what IS cross-engine
    checkable: the exact calibration column plus error-bound booleans —
    |hll − exact|/exact ≤ 3·rsd, and each GK quantile landing inside the
    exact percentile envelope at ±2% rank (orders of magnitude wider than
    GK's n/accuracy rank guarantee). The oracle asserts the bounds as
    literal TRUE, so a sketch regression flips a boolean and fails the
    value hash — this was the registry's only no-oracle row r3-r7. Raw
    estimate values remain available via `operators/sketches.py
    approx_distinct / approx_quantiles`; error tracking vs exact is also
    pinned in tests/test_sketches.py."""
    from ningaloo_turtle_etl_spark.operators.sketches import (
        approx_distinct,
        approx_quantiles,
    )

    ev = load_table(spark, "events", sf_dir)
    d = approx_distinct(ev, "user_id", by=["event_type"], rsd=0.02)
    q = approx_quantiles(
        ev, "value", probabilities=(0.5, 0.95), accuracy=10_000, by=["event_type"]
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("percentile(value, 0.48D)").alias("_p50_lo"),
        F.expr("percentile(value, 0.52D)").alias("_p50_hi"),
        F.expr("percentile(value, 0.93D)").alias("_p95_lo"),
        F.expr("percentile(value, 0.97D)").alias("_p95_hi"),
    )
    out = d.join(q, on="event_type").join(exact, on="event_type")
    est = F.col("approx_distinct_user_id").cast("double")
    ex = F.col("exact_users").cast("double")
    p50 = F.col("approx_quantiles_value")[0]
    p95 = F.col("approx_quantiles_value")[1]
    return out.select(
        "event_type",
        "exact_users",
        (F.abs(est - ex) / ex <= F.lit(0.06)).alias("hll_within_3rsd"),
        p50.between(F.col("_p50_lo"), F.col("_p50_hi")).alias(
            "p50_within_rank_eps"
        ),
        p95.between(F.col("_p95_lo"), F.col("_p95_hi")).alias(
            "p95_within_rank_eps"
        ),
    ).orderBy("event_type")


@register(
    "portable_sketch_profile",
    """
    WITH d AS (
      SELECT DISTINCT l_returnflag AS flag,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT AS h32
      FROM lineitem
    ),
    b AS (
      SELECT flag, h32 // 16777216 AS bucket,
             CASE WHEN h32 % 16777216 = 0 THEN 25
                  ELSE 25 - length(bin(h32 % 16777216)) END AS rho
      FROM d
    ),
    r AS (SELECT flag, bucket, MAX(rho) AS mr FROM b GROUP BY flag, bucket),
    h AS (
      SELECT flag,
             SUM(power(2.0, -mr)) + (256 - COUNT(*)) AS sum_inv,
             256 - COUNT(*) AS zeros
      FROM r GROUP BY flag
    ),
    est AS (
      SELECT flag,
             CASE WHEN 47072.71267120224 / sum_inv <= 640.0 AND zeros > 0
                  THEN 256.0 * ln(256.0 / zeros)
                  ELSE 47072.71267120224 / sum_inv END AS hll_raw
      FROM h
    ),
    k AS (
      SELECT flag, h32,
             row_number() OVER (PARTITION BY flag ORDER BY h32) AS rn,
             COUNT(*) OVER (PARTITION BY flag) AS cnt
      FROM d
    ),
    km AS (
      SELECT flag,
             CASE WHEN cnt < 256 THEN CAST(cnt AS DOUBLE)
                  ELSE 1095216660480.0 / h32 END AS kmv_raw
      FROM k WHERE rn = CASE WHEN cnt < 256 THEN cnt ELSE 256 END
    ),
    ex AS (
      SELECT l_returnflag AS flag, COUNT(DISTINCT l_orderkey) AS exact_distinct
      FROM lineitem GROUP BY 1
    )
    SELECT ex.flag AS l_returnflag, exact_distinct,
           round(est.hll_raw, 4) AS hll_estimate,
           round(km.kmv_raw, 4) AS kmv_estimate,
           round(abs(round(est.hll_raw, 4) - exact_distinct)
                 / exact_distinct, 4) AS hll_rel_err,
           round(abs(round(km.kmv_raw, 4) - exact_distinct)
                 / exact_distinct, 4) AS kmv_rel_err
    FROM ex JOIN est ON ex.flag = est.flag JOIN km ON ex.flag = km.flag
    """,
)
def portable_sketch_profile(spark, sf_dir):
    """Engine-portable sketch calibration: exact distinct orders per return
    flag vs md5-based HLL (m=256) and KMV (k=256) estimates with relative
    errors. Unlike sketch_profile's built-in HLL++/GK (engine-specific →
    rows-only), every intermediate here is an integer or exact dyadic
    rational, so DuckDB reproduces the estimates bit-for-bit — this is the
    sketch family's full-oracle row. Sketch state is mergeable
    (registers/min-hashes merge by max/min; tests/test_sketches.py) and
    retry-stable, which is what a 100 TB profiling pass needs."""
    from ningaloo_turtle_etl_spark.operators.sketches import portable_sketch_report

    li = load_table(spark, "lineitem", sf_dir)
    return portable_sketch_report(li, "l_orderkey", by=["l_returnflag"])


@register(
    "near_dup_clusters",
    rf"""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, list_distinct({_TOKENS}) AS sh
        FROM documents WHERE doc_id < 150
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_cat(a.sh, b.sh))) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, anc) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.anc FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS doc_id, MIN(anc) AS component FROM reach GROUP BY id
    """,
)
def near_dup_clusters(spark, sf_dir):
    """Transitive near-dup clusters: the oracle-checked n-gram Jaccard pairs
    fed through distributed min-label propagation, checked against DuckDB's
    recursive-CTE transitive closure — component = min doc_id reachable.
    The step that turns pair-finding into actual dedup."""
    from ningaloo_turtle_etl_spark.operators.graph import connected_components

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 150)
    pairs = ngram_jaccard_pairs(docs, block_col="lang", shingle_n=1, threshold=0.5)
    comp = connected_components(pairs)
    return comp.select(F.col("id").alias("doc_id"), "component")


@register("ann_quantized_topk", quantized_oracle_sql())
def ann_quantized_topk(spark, sf_dir):
    """Cosine top-k over int8-quantized corpus vectors (4x storage cut;
    dequantize is a map-only Catalyst expression in the scan projection),
    with the [lo, hi] ranges from the FROZEN quantizer fixture — the int8
    round-trip is exact integer arithmetic in both engines, so the full
    pipeline carries a DuckDB oracle row (r04). Round-trip error and
    recall >= 0.8 vs full precision stay pinned in tests/test_quantize.py."""
    import numpy as np

    from ningaloo_turtle_etl_spark.operators.quantize import quantized_cosine_topk
    from ningaloo_turtle_etl_spark.queries.ann_oracles import _fixture

    fix = _fixture("quantizer")
    lo = np.asarray(fix["lo"], dtype=float)
    hi = np.asarray(fix["hi"], dtype=float)
    emb = load_table(spark, "embeddings", sf_dir)
    return quantized_cosine_topk(emb, emb.filter(F.col("vec_id") < 5), lo, hi, k=3)


@register("ann_pq_topk", pq_oracle_sql())
def ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011) over the FROZEN
    pq_codebooks fixture: map-side encode to m tinyint codes, ADC
    shortlist, exact re-rank — all replayed by the DuckDB oracle (the
    oracle recomputes each LUT entry with the same (q_sub − centroid)²
    chains numpy fills the LUT with, so the ADC shortlist is
    bit-identical). Encode parity, recall floors and exact-rerank
    distances stay pinned in tests/test_quantize.py."""
    import numpy as np

    from ningaloo_turtle_etl_spark.operators.quantize import pq_topk
    from ningaloo_turtle_etl_spark.queries.ann_oracles import _fixture

    fix = _fixture("pq_codebooks")
    books = np.asarray(fix["codebooks"], dtype=float)
    emb = load_table(spark, "embeddings", sf_dir)
    return pq_topk(emb, emb.filter(F.col("vec_id") < 5), books, k=3, rerank=50)


@register("ann_ivf_pq_topk", ivf_pq_oracle_sql(k=3, nprobe=3, shortlist=20))
def ann_ivf_pq_topk(spark, sf_dir):
    """The fused three-tier ANN production query (`operators/quantize.py
    ivf_pq_topk`) — IVF cell shortlist → PQ/ADC re-rank → exact squared-L2
    final top-k, the serving shape at 10⁹ vectors: the index the corpus
    carries is (vec_id, cell, m tinyint codes); full vectors are fetched
    by id only for the exact stage's shortlist·|Q| rows. Both frozen
    fixtures (ivf_centroids + pq_codebooks) replay in the DuckDB oracle,
    so every tier's cut — probed cells, ADC shortlist, exact ranks — is
    hash-proven end-to-end; the recall floor vs brute-force L2 is pinned
    in tests/test_quantize.py."""
    import numpy as np

    from ningaloo_turtle_etl_spark.operators.quantize import ivf_pq_topk
    from ningaloo_turtle_etl_spark.queries.ann_oracles import _fixture

    cents = np.asarray(_fixture("ivf_centroids")["centroids"], dtype=float)
    books = np.asarray(_fixture("pq_codebooks")["codebooks"], dtype=float)
    emb = load_table(spark, "embeddings", sf_dir)
    return ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        cents,
        books,
        k=3,
        nprobe=3,
        shortlist=20,
    )


@register("pq_train_codebooks", pq_train_oracle_sql(4, 4, 2, 64))
def pq_train_codebooks(spark, sf_dir):
    """DISTRIBUTED PQ codebook training (`operators/quantize.py
    pq_train_codebooks_lloyd`) — the production train stage the served
    PQ tiers consume (r11 verdict item 3: the frozen-fixture gap). Per
    iteration: ONE full-corpus scan with all m·k integer distance
    expressions inlined, ONE map-side-combined aggregate to
    m·k·(dim/m+1) cells; driver state is m·k·(dim/m) ints. The audit
    row carries n_vecs + inertia from the final assignment AND the
    trained centroid's L1 norm, so the codebook values themselves are
    hash-proven; the unrolled DuckDB oracle replays the whole integer-
    micro trajectory bit-for-bit (the kmeans_embedding_clusters
    convention at subvector grain)."""
    from ningaloo_turtle_etl_spark.operators.quantize import (
        pq_train_codebooks_lloyd,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    return pq_train_codebooks_lloyd(
        emb, m_subvectors=4, k_codes=4, iterations=2
    )


@register(
    "ann_trained_ivf_pq_topk",
    trained_ivf_pq_oracle_sql(
        k_cells=4,
        coarse_iterations=2,
        m=4,
        k_codes=4,
        pq_iterations=2,
        k=3,
        nprobe=2,
        shortlist=20,
        dim=64,
        query_cut=4,
    ),
)
def ann_trained_ivf_pq_topk(spark, sf_dir):
    """The CLOSED train→encode→serve ANN loop in ONE query
    (`operators/quantize.py trained_ivf_pq_topk`): distributed Lloyd
    trains the IVF coarse centroids (full-vector grain) and the PQ
    codebooks (subvector grain) on the corpus itself, then the trained
    parameters drive the three-tier serving shape — cell probe → ADC
    shortlist → exact re-rank — with NO frozen fixture anywhere (r11
    verdict item 3). The entire loop is integer micro-unit arithmetic,
    so the unrolled DuckDB oracle replays training trajectories, cell
    argmins, PQ codes, ADC tables and the exact ranks bit-for-bit; the
    recall floor vs brute-force L2 is pinned in tests/test_quantize.py."""
    from ningaloo_turtle_etl_spark.operators.quantize import (
        trained_ivf_pq_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    return trained_ivf_pq_topk(
        emb,
        emb.filter(F.col("vec_id") < 4),
        k_cells=4,
        coarse_iterations=2,
        m_subvectors=4,
        k_codes=4,
        pq_iterations=2,
        k=3,
        nprobe=2,
        shortlist=20,
    ).orderBy("query_id", "rank")


def _multimodal_oracle_sql(max_id: int = 200, bins: int = 8) -> str:
    """DuckDB SQL replicating the 'fake' codec byte-for-byte: UTF-8 bytes
    recovered from hex(encode(text)), dims from the first/last-8-byte sums,
    np.resize's cyclic fill as j → bytes[(j % nb) + 1], integer-exact mean
    and luma-histogram bins (np.histogram's [0,255]8-bin edges reduce to
    least(floor(v·8/255), 7) for integer v)."""
    f_cols = ",\n           ".join(
        f"ROUND(CASE WHEN len(flat) > 0 THEN "
        f"CAST(len(list_filter(flat, v -> least(CAST(floor(v * 8.0 / 255.0) "
        f"AS BIGINT), {bins - 1}) = {k})) AS DOUBLE) / len(flat) "
        f"ELSE 0.0 END, 6) AS f{k}"
        for k in range(bins)
    )
    return f"""
    WITH d AS (
        SELECT doc_id AS media_id, hex(encode(text)) AS hx
        FROM documents WHERE doc_id < {max_id}
    ),
    b AS (
        SELECT media_id, length(hx) // 2 AS nb,
               list_transform(range(length(hx) // 2),
                   i -> ('0x' || substr(hx, 2*i + 1, 2))::BIGINT) AS bytes
        FROM d
    ),
    dims AS (
        SELECT media_id, nb, bytes,
               CAST(CASE WHEN nb = 0 THEN 0
                    ELSE (list_sum(list_slice(bytes, 1, least(8, nb))) % 31) + 2
                    END AS BIGINT) AS width,
               CAST(CASE WHEN nb = 0 THEN 0
                    ELSE (list_sum(list_slice(bytes, nb - least(8, nb) + 1, nb))
                          % 23) + 2
                    END AS BIGINT) AS height
        FROM b
    ),
    px AS (
        SELECT media_id, nb, width, height,
               CASE WHEN nb = 0 THEN []
                    ELSE list_transform(range(width * height),
                                        j -> bytes[(j % nb) + 1]) END AS flat
        FROM dims
    )
    SELECT media_id,
           CAST(width AS INTEGER) AS width,
           CAST(height AS INTEGER) AS height,
           CAST(nb AS BIGINT) AS n_bytes,
           ROUND(CASE WHEN len(flat) > 0
                      THEN CAST(list_sum(flat) AS DOUBLE) / len(flat)
                      ELSE 0.0 END, 6) AS mean_luma,
           {f_cols}
    FROM px
    """


@register("multimodal_image_features", _multimodal_oracle_sql())
def multimodal_image_features(spark, sf_dir):
    """Binary-column decode/feature plumbing via mapInPandas. The 'fake'
    codec derives everything deterministically from the blob bytes, so the
    whole path — Arrow batching, dims, cyclic pixel fill, luma histogram —
    now has a full DuckDB oracle row (r03 item 4). The histogram vector is
    exposed as 8 numeric columns (f0..f7) rather than a joined string:
    Java's and DuckDB's double→string rules disagree on scientific
    notation, and numeric columns compare exactly."""
    from ningaloo_turtle_etl_spark.operators.multimodal import (
        documents_as_media,
        extract_image_features,
    )

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    feats = extract_image_features(documents_as_media(docs), decoder="fake")
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_bytes",
        F.round("mean_luma", 6).alias("mean_luma"),
        *[F.round(F.col("feature")[k], 6).alias(f"f{k}") for k in range(8)],
    )


_G3 = (
    "list_transform(range(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"
)
_G2 = "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"


@register(
    "decontaminate_corpus",
    rf"""
    WITH g AS (
        SELECT doc_id, list_distinct({_G3}) AS grams
        FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
    ),
    bench AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
    ),
    bv AS (SELECT COALESCE(list(gram), []) AS bench_grams FROM bench),
    scored AS (
        SELECT doc_id, len(grams) AS n_grams,
               len(list_intersect(grams, bv.bench_grams)) AS n_contaminated
        FROM g, bv WHERE doc_id % 97 <> 0
    )
    SELECT doc_id, n_grams, n_contaminated,
           CASE WHEN n_grams > 0
                THEN CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END AS contam_ratio,
           CASE WHEN n_grams > 0
                THEN CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END >= 0.2 AS contaminated
    FROM scored
    """,
)
def decontaminate_corpus(spark, sf_dir):
    """Benchmark decontamination: docs with doc_id % 97 == 0 stand in for a
    held-out eval suite; every other doc is scored by the fraction of its
    distinct word 3-grams that appear in the eval set. The corpus side never
    shuffles — the eval n-gram vocabulary broadcasts and the exploded grams
    collapse map-side (partial agg) before the doc-width shuffle."""
    from ningaloo_turtle_etl_spark.operators.curation import contamination_flags

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_flags(corpus, bench, n=3, threshold=0.2)


@register(
    "repetition_metrics",
    rf"""
    SELECT doc_id,
           len(g2) AS n_2grams,
           CASE WHEN len(g2) > 0
                THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                           / CAST(len(g2) AS DOUBLE)
                ELSE 0.0 END AS dup_2gram_ratio,
           CASE WHEN len(g3) > 0
                THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
                           / CAST(len(g3) AS DOUBLE)
                ELSE 0.0 END AS dup_3gram_ratio
    FROM (SELECT doc_id, {_G2} AS g2, {_G3} AS g3
          FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents))
    """,
)
def repetition_metrics(spark, sf_dir):
    """Gopher-style intra-doc repetition: duplicate word-2/3-gram fractions
    as one map-only projection fused with the scan — the boilerplate/spam
    drop rule of pre-training pipelines."""
    from ningaloo_turtle_etl_spark.operators.curation import with_repetition_metrics

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    return with_repetition_metrics(docs).select(
        "doc_id", "n_2grams", "dup_2gram_ratio", "dup_3gram_ratio"
    )


@register(
    "training_mix_sample",
    """
    WITH per AS (
        SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS w
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_chars) AS DOUBLE) AS tw FROM documents),
    rates AS (
        SELECT lang,
               LEAST(CAST(1.0 AS DOUBLE),
                     (CAST(0.5 AS DOUBLE) *
                      CASE lang WHEN 'en' THEN CAST(0.4 AS DOUBLE)
                                WHEN 'de' THEN CAST(0.2 AS DOUBLE)
                                WHEN 'fr' THEN CAST(0.2 AS DOUBLE)
                                WHEN 'es' THEN CAST(0.2 AS DOUBLE) END)
                     * (tw / w)) AS rate
        FROM per, tot
        WHERE lang IN ('en', 'de', 'fr', 'es')
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r USING (lang)
    WHERE r.rate >= 1.0
       OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
          < lower(lpad(to_hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT)),
                       8, '0'))
    """,
)
def training_mix_sample(spark, sf_dir):
    """Deterministic training-mix rebalance: per-language char totals (tiny
    agg) set sampling rates toward a 40/20/20/20 en/de/fr/es mix within a
    half-corpus budget; docs kept iff their 32-bit md5-of-id prefix clears
    the rate threshold. No RNG — stable under retries and re-runs, which is
    what a 100 TB sampling job needs — and the corpus pass is map-only
    against broadcast rates. zh is excluded from the mix (rate-less strata
    drop)."""
    from ningaloo_turtle_etl_spark.operators.curation import training_mix_sample as mix

    docs = load_table(spark, "documents", sf_dir)
    shares = {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.2}
    return mix(docs, shares, budget_fraction=0.5).select("doc_id", "lang")


@register(
    "pii_redaction",
    r"""
    WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com at 10.0.'
                         || CAST(doc_id % 255 AS VARCHAR)
                         || '.7 or 555-123-4567'
                    ELSE text END AS text
        FROM documents
    )
    -- Sequential semantics (r04): each pattern counts on the text AFTER
    -- earlier patterns were redacted, so counts equal output markers.
    SELECT doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(r1,
               '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
           len(regexp_extract_all(r2,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
           substr(md5(
               regexp_replace(r2,
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g')
           ), 1, 16) AS redacted_fp
    FROM (
        SELECT doc_id, text,
               regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g') AS r1,
               regexp_replace(
                   regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g'),
                   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '[PHONE]', 'g') AS r2
        FROM planted
    )
    """,
)
def pii_redaction(spark, sf_dir):
    """PII scrub over a corpus with deterministically planted emails /
    phones / IPs (every 7th doc): per-pattern counts plus a fingerprint of
    the redacted text, proving removal. Map-only regexp work, codegen'd;
    the oracle replays the same plant + RE2-compatible patterns."""
    from ningaloo_turtle_etl_spark.operators.curation import with_pii_redaction

    docs = load_table(spark, "documents", sf_dir)
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com at 10.0."),
                (F.col("doc_id") % 255).cast("string"),
                F.lit(".7 or 555-123-4567"),
            ),
        ).otherwise(F.col("text")),
    )
    out = with_pii_redaction(planted)
    return out.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        F.substring(F.md5("redacted_text"), 1, 16).alias("redacted_fp"),
    )


@register(
    "near_dup_dedup",
    rf"""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, n_chars, list_distinct({_TOKENS}) AS sh
        FROM documents WHERE doc_id < 150
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_cat(a.sh, b.sh))) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, anc) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.anc FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id, MIN(anc) AS component FROM reach GROUP BY id)
    SELECT d.doc_id, d.lang, d.n_chars
    FROM t d LEFT JOIN comp c ON d.doc_id = c.id
    WHERE c.id IS NULL OR d.doc_id = c.component
    """,
)
def near_dup_dedup(spark, sf_dir):
    """The full near-dup dedup, end to end: Jaccard pair-finding →
    connected components → keep one representative (min doc_id) per cluster,
    singletons untouched. Completes the dedup story the pair queries start;
    the oracle replays it as a recursive-CTE transitive closure."""
    from ningaloo_turtle_etl_spark.operators.graph import cluster_representatives

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 150)
    pairs = ngram_jaccard_pairs(docs, block_col="lang", shingle_n=1, threshold=0.5)
    kept = cluster_representatives(docs, pairs)
    return kept.select("doc_id", "lang", "n_chars")


@register(
    "quality_budget_select",
    rf"""
    WITH t AS (
        SELECT doc_id, text, {_TOKENS} AS toks, length(text) AS n_chars
        FROM documents
    ), m AS (
        SELECT doc_id, n_chars, len(toks) AS n_words,
               len(list_filter(toks, x -> x IN
                   ('the','and','of','to','a','in','is','it','that','was','for','on')))
                   AS n_stop,
               n_chars - length(regexp_replace(text, '[^\p{{L}}\p{{N}}_\s]', '', 'g')) AS n_punct,
               greatest(
                   len(list_filter(string_split_regex(
                       regexp_replace(text, '([^\w\s]|\d)', ' \1 ', 'g'), '\s+'),
                       x -> x <> '')),
                   CAST(ceil(length(text) / 4.0) AS INT)
               ) AS n_tokens_est
        FROM t
    ), q AS (
        SELECT doc_id, n_tokens_est,
             (CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.2 END)
           * (CASE WHEN n_words > 0 AND CAST(n_stop AS DOUBLE)/n_words > 0.05
                   THEN 1.0 ELSE 0.5 END)
           * (CASE WHEN n_chars > 0 AND CAST(n_punct AS DOUBLE)/n_chars < 0.2
                   THEN 1.0 ELSE 0.3 END)
           * (CASE WHEN n_words > 0 AND CAST(n_chars AS DOUBLE)/n_words BETWEEN 2 AND 12
                   THEN 1.0 ELSE 0.5 END) AS quality_score
        FROM m
    ), c AS (
        SELECT doc_id, n_tokens_est, quality_score,
               SUM(n_tokens_est) OVER (ORDER BY quality_score DESC, doc_id) AS cum
        FROM q
    )
    SELECT doc_id, n_tokens_est, ROUND(quality_score, 6) AS quality_score
    FROM c WHERE cum <= 15000
    """,
)
def quality_budget_select(spark, sf_dir):
    """Token-budget curation: keep the highest-quality docs until a 15k
    estimated-token budget is spent — exact global prefix selection WITHOUT
    the single-reducer global window the oracle's ``SUM() OVER (ORDER BY)``
    implies. budget_select range-partitions on the sort key, turns
    per-partition totals (one row per partition) into broadcast prefix
    offsets, and adds a within-partition cumsum — identical answer,
    partition-parallel at any scale."""
    from ningaloo_turtle_etl_spark.operators.curation import budget_select

    docs = load_table(spark, "documents", sf_dir)
    scored = with_quality_score(with_token_counts(docs))
    sel = budget_select(
        scored,
        budget=15000,
        weight_col="n_tokens_est",
        order_col="quality_score",
        id_col="doc_id",
        num_partitions=8,
    )
    return sel.select(
        "doc_id", "n_tokens_est", F.round("quality_score", 6).alias("quality_score")
    )


@register(
    "corpus_curation_pipeline",
    rf"""
    WITH base AS (
        SELECT doc_id, lang, n_chars, lower(text) AS text FROM documents
    ),
    dedup AS (
        SELECT doc_id, lang, n_chars, text FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY substr(md5({_NORM}), 1, 16)
                ORDER BY doc_id) AS rn
            FROM base) WHERE rn = 1
    ),
    btok AS (SELECT doc_id, {_TOKENS} AS toks FROM base),
    bench AS (
        SELECT DISTINCT unnest(list_distinct({_G3})) AS gram
        FROM btok WHERE doc_id % 97 = 0
    ),
    bv AS (SELECT COALESCE(list(gram), []) AS bench_grams FROM bench),
    ctok AS (
        SELECT doc_id, lang, n_chars, {_TOKENS} AS toks
        FROM dedup WHERE doc_id % 97 <> 0
    ),
    feat AS (
        SELECT doc_id, lang, n_chars, len(toks) AS n_words,
               {_G2} AS g2, list_distinct({_G3}) AS g3d
        FROM ctok
    ),
    scored AS (
        SELECT doc_id, lang, n_chars, n_words,
               CASE WHEN len(g2) > 0
                    THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                               / CAST(len(g2) AS DOUBLE)
                    ELSE 0.0 END AS dup2,
               CASE WHEN len(g3d) > 0
                    THEN CAST(len(list_intersect(g3d, bv.bench_grams)) AS DOUBLE)
                         / CAST(len(g3d) AS DOUBLE)
                    ELSE 0.0 END AS contam
        FROM feat, bv
    ),
    gated AS (
        SELECT doc_id, lang, n_chars FROM scored
        WHERE n_words >= 5 AND dup2 < 0.5 AND contam < 0.2
    ),
    per AS (SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS w FROM gated GROUP BY lang),
    tot AS (SELECT CAST(SUM(n_chars) AS DOUBLE) AS tw FROM gated),
    rates AS (
        SELECT lang,
               LEAST(CAST(1.0 AS DOUBLE),
                     (CAST(0.5 AS DOUBLE) *
                      CASE lang WHEN 'en' THEN CAST(0.4 AS DOUBLE)
                                WHEN 'de' THEN CAST(0.2 AS DOUBLE)
                                WHEN 'fr' THEN CAST(0.2 AS DOUBLE)
                                WHEN 'es' THEN CAST(0.2 AS DOUBLE) END)
                     * (tw / w)) AS rate
        FROM per, tot
        WHERE lang IN ('en', 'de', 'fr', 'es')
    )
    SELECT g.doc_id, g.lang, g.n_chars
    FROM gated g JOIN rates r USING (lang)
    WHERE r.rate >= 1.0
       OR substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 8)
          < lower(lpad(to_hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT)),
                       8, '0'))
    """,
)
def corpus_curation_pipeline(spark, sf_dir):
    """The full curation chain as ONE lazy plan: exact dedup (zero-body
    shuffle) → repetition + length gate → benchmark-decontamination gate
    (broadcast eval vocab) → deterministic 40/20/20/20 mix sample within a
    half-corpus budget, rates derived from the GATED corpus (the plan's own
    tiny agg). Every stage is the same operator its standalone query
    registers; the oracle replays the whole composition in SQL."""
    from ningaloo_turtle_etl_spark.operators.curation import (
        contamination_flags,
        training_mix_sample as mix,
        with_repetition_metrics,
    )

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = exact_dedup_semi(docs).filter(F.col("doc_id") % 97 != 0)
    rep = with_repetition_metrics(with_token_counts(corpus))
    # Map-only gates run BEFORE the contamination join-back, so the only
    # row-keyed shuffle in the plan carries gate survivors, not the corpus.
    pre = rep.filter((F.col("n_words") >= 5) & (F.col("dup_2gram_ratio") < 0.5))
    flags = contamination_flags(
        pre.select("doc_id", "text"), bench, n=3
    ).select("doc_id", "contam_ratio")
    gated = (
        pre.join(flags, on="doc_id")
        .filter(F.col("contam_ratio") < 0.2)
        .select("doc_id", "lang", "n_chars")
    )
    shares = {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.2}
    return mix(gated, shares, budget_fraction=0.5).select("doc_id", "lang", "n_chars")


@register(
    "text_token_quality",
    rf"""
    WITH t AS (
        SELECT doc_id, text, {_TOKENS} AS toks, length(text) AS n_chars
        FROM documents
    ), m AS (
        SELECT doc_id, text, n_chars, len(toks) AS n_words,
               len(list_filter(toks, x -> x IN
                   ('the','and','of','to','a','in','is','it','that','was','for','on')))
                   AS n_stop,
               n_chars - length(regexp_replace(text, '[^\p{{L}}\p{{N}}_\s]', '', 'g')) AS n_punct
        FROM t
    )
    SELECT doc_id, n_words, n_chars,
           greatest(
               len(list_filter(string_split_regex(
                   regexp_replace(text, '([^\w\s]|\d)', ' \1 ', 'g'), '\s+'),
                   x -> x <> '')),
               CAST(ceil(length(text) / 4.0) AS INT)
           ) AS n_tokens_est,
           ROUND(CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END, 6)
               AS stopword_ratio,
           ROUND(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 6)
               AS punct_ratio,
           ROUND(
             (CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.2 END)
           * (CASE WHEN n_words > 0 AND CAST(n_stop AS DOUBLE)/n_words > 0.05 THEN 1.0 ELSE 0.5 END)
           * (CASE WHEN n_chars > 0 AND CAST(n_punct AS DOUBLE)/n_chars < 0.2 THEN 1.0 ELSE 0.3 END)
           * (CASE WHEN n_words > 0 AND CAST(n_chars AS DOUBLE)/n_words BETWEEN 2 AND 12
                   THEN 1.0 ELSE 0.5 END), 6) AS quality_score
    FROM m
    """,
)
def text_token_quality(spark, sf_dir):
    """Token counting + Gopher/C4-style quality heuristics fused into one
    map-only projection (driver-window consolidation of text_token_stats +
    text_quality_scores, which remain registered for the pytest sweep).
    Whitespace words, BPE-ish subword estimate, stopword/punct ratios and
    the composite quality gate — all pure Catalyst columns."""
    docs = load_table(spark, "documents", sf_dir)
    q = with_quality_score(with_token_counts(docs))
    return q.select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_tokens_est",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )


@register(
    "dedup_audit",
    rf"""
    WITH RECURSIVE t AS (
        SELECT doc_id, lang, n_chars, list_distinct({_TOKENS}) AS sh
        FROM documents WHERE doc_id < 150
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_cat(a.sh, b.sh))) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, anc) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.anc FROM edges e JOIN reach r ON e.dst = r.id
    ),
    comp AS (SELECT id, MIN(anc) AS component FROM reach GROUP BY id)
    SELECT c.component,
           COUNT(*) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars_total,
           CAST(SUM(CASE WHEN d.doc_id = c.component THEN 0 ELSE d.n_chars END)
                AS BIGINT) AS chars_removed
    FROM comp c JOIN t d ON c.id = d.doc_id
    GROUP BY c.component
    """,
)
def dedup_audit(spark, sf_dir):
    """Dedup observability: per near-dup cluster, how many docs collapse and
    how many chars the collapse removes — the audit table a curation run
    ships alongside its output (what got deleted and why is the first
    question asked of any dedup job)."""
    from ningaloo_turtle_etl_spark.operators.graph import connected_components

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 150)
    pairs = ngram_jaccard_pairs(docs, block_col="lang", shingle_n=1, threshold=0.5)
    comp = connected_components(pairs)
    labeled = comp.join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), on="id"
    )
    return labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_total"),
        F.sum(
            F.when(F.col("id") == F.col("component"), 0).otherwise(F.col("n_chars"))
        ).alias("chars_removed"),
    )


@register(
    "doc_chunks",
    rf"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    nz AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    e AS (
        SELECT doc_id, toks, n,
               unnest(range(0, CAST(ceil(n / 64.0) AS INT))) AS chunk_id
        FROM nz
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           len(list_slice(toks, chunk_id * 64 + 1,
                          least((chunk_id + 1) * 64, n))) AS n_chunk_tokens,
           substr(md5(array_to_string(
               list_slice(toks, chunk_id * 64 + 1,
                          least((chunk_id + 1) * 64, n)), ' ')), 1, 16)
               AS chunk_fp
    FROM e
    """,
)
def doc_chunks(spark, sf_dir):
    """Context-window chunking: each doc split into consecutive ≤64-token
    chunks (one row per chunk, fingerprint instead of text so the harness
    hashes compactly) — the pre-training sharding step. Map-only:
    sequence+slice inside one projection, no shuffle."""
    from ningaloo_turtle_etl_spark.operators.curation import chunk_documents

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    ch = chunk_documents(docs, max_tokens=64)
    return ch.select(
        "doc_id",
        "chunk_id",
        "n_chunk_tokens",
        F.substring(F.md5("chunk_text"), 1, 16).alias("chunk_fp"),
    )


@register(
    "sequence_packing",
    """
    WITH b AS (
        SELECT doc_id, n_chars,
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    AS INTEGER) % 16 AS bucket
        FROM documents
    ),
    c AS (
        SELECT doc_id, bucket, n_chars,
               SUM(n_chars) OVER (PARTITION BY bucket ORDER BY doc_id) AS cum
        FROM b
    )
    SELECT doc_id, bucket,
           CAST(floor((cum - n_chars) / 2000.0) AS INT) AS bin_id,
           CAST(cum - n_chars AS BIGINT) AS bin_pos
    FROM c
    """,
)
def sequence_packing(spark, sf_dir):
    """Deterministic distributed sequence packing: docs hash into 16
    buckets (window partitions — no single-partition window), a
    within-bucket cumsum bins them at ~2000-char capacity boundaries.
    The batch-building step of training prep, reproducible under retries;
    the straddle-overflow rule is pinned in tests/test_curation.py."""
    from ningaloo_turtle_etl_spark.operators.curation import pack_chunks

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    packed = pack_chunks(docs, "n_chars", bin_capacity=2000, num_buckets=16)
    return packed.select("doc_id", "bucket", "bin_id", "bin_pos")


@register(
    "packed_chunk_batches",
    rf"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    nz AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    e AS (
        SELECT doc_id, toks, n,
               unnest(range(0, CAST(ceil(n / 64.0) AS INT))) AS chunk_id
        FROM nz
    ),
    ch AS (
        SELECT doc_id * 16 + chunk_id AS chunk_key,
               len(list_slice(toks, chunk_id * 64 + 1,
                              least((chunk_id + 1) * 64, n))) AS n_chunk_tokens
        FROM e
    ),
    b AS (
        SELECT chunk_key, n_chunk_tokens,
               CAST(concat('0x', substr(md5(CAST(chunk_key AS VARCHAR)), 1, 4))
                    AS INTEGER) % 16 AS bucket
        FROM ch
    ),
    c AS (
        SELECT chunk_key, n_chunk_tokens, bucket,
               SUM(n_chunk_tokens) OVER (PARTITION BY bucket ORDER BY chunk_key)
                   AS cum
        FROM b
    )
    SELECT chunk_key, bucket,
           CAST(floor((cum - n_chunk_tokens) / 256.0) AS INT) AS bin_id,
           n_chunk_tokens
    FROM c
    """,
)
def packed_chunk_batches(spark, sf_dir):
    """Chunk → pack, composed: docs split into ≤64-token chunks, chunks
    packed into ~256-token training batches (md5-bucketed cumsum bins).
    The full batch-building path of LLM data prep as one lazy plan — the
    only shuffle is the 16-partition window for binning."""
    from ningaloo_turtle_etl_spark.operators.curation import (
        chunk_documents,
        pack_chunks,
    )

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    ch = chunk_documents(docs, max_tokens=64).select(
        (F.col("doc_id") * 16 + F.col("chunk_id")).alias("chunk_key"),
        "n_chunk_tokens",
    )
    packed = pack_chunks(
        ch, "n_chunk_tokens", bin_capacity=256, id_col="chunk_key", num_buckets=16
    )
    return packed.select("chunk_key", "bucket", "bin_id", "n_chunk_tokens")


@register(
    "chunk_dedup",
    rf"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    nz AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
    e AS (
        SELECT doc_id, toks, n,
               unnest(range(0, CAST(ceil(n / 32.0) AS INT))) AS chunk_id
        FROM nz
    ),
    ch AS (
        SELECT doc_id * 64 + chunk_id AS chunk_key,
               md5(array_to_string(
                   list_slice(toks, chunk_id * 32 + 1,
                              least((chunk_id + 1) * 32, n)), ' ')) AS fp
        FROM e
    )
    SELECT chunk_key, substr(fp, 1, 16) AS chunk_fp
    FROM (SELECT chunk_key, fp,
                 ROW_NUMBER() OVER (PARTITION BY fp ORDER BY chunk_key) AS rn
          FROM ch)
    WHERE rn = 1
    """,
)
def chunk_dedup(spark, sf_dir):
    """Chunk-granularity exact dedup: identical ≤32-token chunks collapse to
    the lowest chunk_key — the boilerplate-paragraph form of dedup that
    doc-level fingerprints miss (repeated headers/footers across distinct
    docs). Same zero-body-shuffle shape as dedup_exact: only
    (fingerprint, key) pairs shuffle to elect keepers."""
    from ningaloo_turtle_etl_spark.operators.curation import chunk_documents
    from pyspark.sql.window import Window

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    ch = chunk_documents(docs, max_tokens=32).select(
        (F.col("doc_id") * 64 + F.col("chunk_id")).alias("chunk_key"),
        F.md5("chunk_text").alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("chunk_key")
    kept = ch.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.select("chunk_key", F.substring("fp", 1, 16).alias("chunk_fp"))


@register(
    "embedding_norm_stats",
    """
    WITH n AS (
        SELECT vec_id,
               sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                            x -> x * x))) AS l2
        FROM embeddings
    )
    SELECT COUNT(*) AS n_vectors,
           ROUND(MIN(l2), 6) AS min_norm,
           ROUND(MAX(l2), 6) AS max_norm,
           ROUND(AVG(l2), 6) AS avg_norm,
           CAST(SUM(CASE WHEN l2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
    FROM n
    """,
)
def embedding_norm_stats(spark, sf_dir):
    """Embedding-column hygiene profile: L2-norm distribution + zero-vector
    count — the sanity pass before any cosine math (zero vectors NaN-poison
    cosine similarity). Norms via a JVM-side F.aggregate fold over the float
    array; one map pass + one scalar agg."""
    emb = load_table(spark, "embeddings", sf_dir)
    l2 = F.sqrt(
        F.aggregate(
            F.col("embedding").cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    n = emb.select(l2.alias("l2"))
    return n.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.min("l2"), 6).alias("min_norm"),
        F.round(F.max("l2"), 6).alias("max_norm"),
        F.round(F.avg("l2"), 6).alias("avg_norm"),
        F.sum(F.when(F.col("l2") == 0, 1).otherwise(0)).alias("n_zero"),
    )


@register(
    "bloom_decontaminate",
    rf"""
    WITH g AS (
        SELECT doc_id, list_distinct({_G3}) AS grams
        FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
    ),
    bench AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
    ),
    bv AS (SELECT COALESCE(list(gram), []) AS bench_grams FROM bench),
    scored AS (
        SELECT doc_id, len(grams) AS n_grams,
               len(list_intersect(grams, bv.bench_grams)) AS n_contaminated
        FROM g, bv WHERE doc_id % 97 <> 0
    )
    SELECT doc_id, n_grams, n_contaminated,
           CASE WHEN n_grams > 0
                THEN CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END AS contam_ratio,
           CASE WHEN n_grams > 0
                THEN CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE)
                ELSE 0.0 END >= 0.2 AS contaminated
    FROM scored
    """,
)
def bloom_decontaminate(spark, sf_dir):
    """Bloom-prefiltered decontamination: same fixture, threshold, and EXACT
    output as ``decontaminate_corpus`` (identical oracle), but the eval set
    is broadcast as a Bloom bitmap tested with pure integer Catalyst
    expressions, and only bloom-surviving grams reach the exact verification
    join — the shape that still works when the eval vocabulary is too big to
    broadcast as a join table (false positives die in the verify join, so no
    approximation leaks into the result)."""
    from ningaloo_turtle_etl_spark.operators.curation import (
        bloom_contamination_flags,
    )

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return bloom_contamination_flags(corpus, bench, n=3, threshold=0.2)


@register(
    "incremental_dedup",
    f"""
    WITH fp AS (
        SELECT doc_id, lang, source, n_chars,
               substr(md5({_NORM}), 1, 16) AS fingerprint
        FROM documents
    ),
    seen AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 5 <> 4),
    fresh AS (
        SELECT n.* FROM fp n LEFT JOIN seen s USING (fingerprint)
        WHERE n.doc_id % 5 = 4 AND s.fingerprint IS NULL
    )
    SELECT doc_id, lang, source, n_chars
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY fingerprint ORDER BY doc_id) AS rn FROM fresh)
    WHERE rn = 1
    """,
)
def incremental_dedup(spark, sf_dir):
    """Incremental ingestion dedup: docs with doc_id % 5 == 4 stand in for
    today's crawl increment, the rest for the existing corpus snapshot (as
    a fingerprint set). The increment is deduped against the snapshot by
    fingerprint anti-join, then within itself — snapshot bodies are never
    read, so per-day cost scales with the increment, not the corpus."""
    from ningaloo_turtle_etl_spark.operators.dedup import incremental_exact_dedup
    from ningaloo_turtle_etl_spark.operators.text import with_fingerprint

    docs = load_table(spark, "documents", sf_dir)
    new_batch = docs.filter(F.col("doc_id") % 5 == 4)
    snapshot_fps = with_fingerprint(
        docs.filter(F.col("doc_id") % 5 != 4)
    ).select("fingerprint")
    out = incremental_exact_dedup(new_batch, snapshot_fps)
    return out.select("doc_id", "lang", "source", "n_chars")


@register(
    "lm_quality_scores",
    rf"""
    WITH t AS (
        SELECT doc_id, unnest({_TOKENS}) AS w
        FROM (SELECT doc_id, lower(text) AS text FROM documents)
    ),
    cnt AS (SELECT w, COUNT(*) AS c FROM t GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM cnt),
    vocab AS (SELECT w, c FROM cnt ORDER BY c DESC, w ASC LIMIT 20),
    scored AS (
        SELECT t.doc_id,
               -ln(CAST(COALESCE(v.c, 1) AS DOUBLE) / tot.n) AS nll
        FROM t LEFT JOIN vocab v USING (w), tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(nll), 6) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def lm_quality_scores(spark, sf_dir):
    """CCNet-style perplexity filter, unigram backbone: score every doc by
    average negative log-likelihood under a corpus-fit unigram LM (top-20
    vocab here so the OOV floor path is exercised on the synthetic corpus).
    Token counts collapse map-side to a vocab-sized table; scoring is a
    broadcast join + per-doc agg — no body shuffle."""
    from ningaloo_turtle_etl_spark.operators.text import unigram_lm_scores

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    return unigram_lm_scores(docs, vocab_size=20)


@register(
    "bigram_lm_scores",
    rf"""
    WITH t AS (
        SELECT doc_id, {_TOKENS} AS toks
        FROM (SELECT doc_id, lower(text) AS text FROM documents)
    ),
    pairs AS (
        SELECT doc_id, pw.p AS prev, pw.w AS w FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                       i -> struct_pack(p := toks[i], w := toks[i+1]))) AS pw
            FROM t
        )
    ),
    bc AS (SELECT prev, w, COUNT(*) AS bc FROM pairs GROUP BY prev, w),
    pc AS (SELECT prev, CAST(SUM(bc) AS BIGINT) AS pc FROM bc GROUP BY prev),
    uc AS (
        SELECT w, COUNT(*) AS uc
        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(uc) AS BIGINT) AS n_total,
                   COUNT(*) AS v_size FROM uc),
    scored AS (
        SELECT p.doc_id,
               -ln(0.7 * (CAST(COALESCE(b.bc, 0) AS DOUBLE)
                          / CAST(c.pc AS DOUBLE))
                   + 0.3 * (CAST(COALESCE(u.uc, 0) + 1 AS DOUBLE)
                            / CAST(tot.n_total + tot.v_size + 1 AS DOUBLE)))
                   AS nll
        FROM pairs p
        LEFT JOIN bc b ON p.prev = b.prev AND p.w = b.w
        LEFT JOIN pc c ON p.prev = c.prev
        LEFT JOIN uc u ON p.w = u.w, tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(nll), 6) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def q_bigram_lm_scores(spark, sf_dir):
    """CCNet-style perplexity filter, one rung up the n-gram ladder: every
    doc scored by average NLL under a corpus-fit Jelinek-Mercer
    bigram/unigram mixture (λ=0.7, add-one unigram floor carries the OOV
    mass). Fully relational — bigram/prefix/unigram count tables with no
    broadcast hint (AQE decides; bigram types outgrow broadcast on real
    corpora) — and the whole fit+score pipeline replays in the DuckDB
    oracle."""
    from ningaloo_turtle_etl_spark.operators.text import bigram_lm_scores

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    return bigram_lm_scores(docs, lambda_=0.7)


def _semantic_centroid_fixture():
    from ningaloo_turtle_etl_spark.operators.classify import load_model_fixture

    return load_model_fixture("semantic_centroids")


def _semantic_dedup_oracle_sql(threshold: float = 0.4) -> str:
    """DuckDB SQL replicating semantic_dedup over the frozen centroid
    fixture end-to-end: argmin-cell assignment against literal centroids
    (list_position of list_min ties to the lowest index, matching Spark's
    (dist, idx) struct sort), within-cell cosine pairs, then connected
    components as a recursive min-reachable-id CTE, keeping vec_id ==
    component. Float parity holds because both engines sum distance/dot
    terms in element order over the same doubles."""
    fix = _semantic_centroid_fixture()
    dist_exprs = ", ".join(
        "list_sum(list_transform(list_zip(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + "]::DOUBLE[]), x -> (x[1]-x[2])*(x[1]-x[2])))"
        for c in fix["centroids"]
    )
    dot = (
        "list_sum(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]))"
    )
    normsq = "list_sum(list_transform({0}.v, x -> x*x))"
    return f"""
    WITH RECURSIVE emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
    ),
    assigned AS (
        SELECT vec_id, v, label,
               list_position(dists, list_min(dists)) - 1 AS cell
        FROM (SELECT vec_id, v, label, [{dist_exprs}] AS dists FROM emb)
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE {dot} / (sqrt({normsq.format('a')}) * sqrt({normsq.format('b')}))
              >= {threshold}
    ),
    undirected AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT vec_id, vec_id FROM emb
        UNION
        SELECT e.d, reach.r FROM reach JOIN undirected e ON e.s = reach.id
    ),
    comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
    SELECT emb.vec_id, emb.label
    FROM emb JOIN comp ON emb.vec_id = comp.id
    WHERE emb.vec_id = comp.component
    """


@register("semantic_dedup", _semantic_dedup_oracle_sql())
def semantic_dedup_query(spark, sf_dir):
    """SemDeDup-style semantic dedup over the embeddings table, blocking
    against the FROZEN centroid fixture (deterministic md5-hash-sampled
    k-means, scripts/train_classifier_fixtures.py): argmin-cell assignment,
    within-cell exact cosine pairs at ≥0.4, connected components, keep
    min-id per cluster. Full oracle row since r04 — fixed literal centroids
    make cell assignment plain SQL, and the component labeling replays as a
    recursive min-reachable-id CTE. The n_centroids=1 ≡ exact all-pairs
    property stays pinned in tests/test_llm_ops.py."""
    import numpy as np

    from ningaloo_turtle_etl_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, "embeddings", sf_dir)
    cents = np.asarray(_semantic_centroid_fixture()["centroids"], dtype=float)
    kept = semantic_dedup(emb, threshold=0.4, centroids=cents)
    return kept.select("vec_id", "label")


@register(
    "duplicate_passage_removal",
    r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        FROM documents
    ),
    pas AS (
        SELECT doc_id, idx,
               array_to_string(list_slice(t, idx*20 + 1, idx*20 + 20), ' ')
                   AS passage
        FROM (
            SELECT doc_id, t,
                   unnest(range(CAST(ceil(len(t)/20.0) AS BIGINT))) AS idx
            FROM toks
        )
    ),
    marked AS (
        SELECT doc_id, idx, passage,
               ROW_NUMBER() OVER (PARTITION BY passage ORDER BY doc_id, idx)
                   AS rn
        FROM pas
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_passages,
               CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_removed,
               COALESCE(
                   STRING_AGG(CASE WHEN rn = 1 THEN passage END, ' '
                              ORDER BY idx), '') AS cleaned_text
        FROM marked GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_passages, 0) AS n_passages,
           COALESCE(p.n_removed, 0) AS n_removed,
           COALESCE(p.cleaned_text, '') AS cleaned_text
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def duplicate_passage_removal(spark, sf_dir):
    """Cross-document duplicate-passage removal (Lee et al. 2022's exact
    substring dedup at passage granularity): global first occurrence of
    every 20-token passage survives, later occurrences are cut, documents
    are reconstructed from their surviving passages. The oracle states the
    identical policy relationally (ROW_NUMBER over passage groups)."""
    from ningaloo_turtle_etl_spark.operators.dedup import (
        duplicate_passage_removal as dpr,
    )

    docs = load_table(spark, "documents", sf_dir)
    return dpr(docs, passage_tokens=20)


@register(
    "temperature_mix_sample",
    """
    WITH per AS (
        SELECT lang, CAST(SUM(n_chars) AS DOUBLE) AS w
        FROM documents GROUP BY lang
    ),
    p2 AS (SELECT lang, w, power(w, 0.5) AS pw FROM per),
    tot AS (SELECT SUM(w) AS tw, SUM(pw) AS tpw FROM p2),
    rates AS (
        SELECT lang,
               LEAST(CAST(1.0 AS DOUBLE),
                     (CAST(0.5 AS DOUBLE) * (pw / tpw)) * (tw / w)) AS rate
        FROM p2, tot
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r USING (lang)
    WHERE r.rate >= 1.0
       OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
          < lower(lpad(to_hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT)),
                       8, '0'))
    """,
)
def temperature_mix_sample(spark, sf_dir):
    """Temperature-flattened mix at T=2 (exponent 0.5 = sqrt, IEEE-exact on
    both engines) over language strata within a half-corpus budget — the
    no-hand-targets counterpart of training_mix_sample; same deterministic
    md5-of-id keep rule."""
    from ningaloo_turtle_etl_spark.operators.curation import (
        temperature_mix_sample as tms,
    )

    docs = load_table(spark, "documents", sf_dir)
    return tms(docs, temperature=2.0, budget_fraction=0.5).select("doc_id", "lang")


@register(
    "tfidf_top_terms",
    rf"""
    WITH pairs AS (
        SELECT doc_id, unnest(toks) AS term
        FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM pairs GROUP BY 1, 2),
    df_ AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
        FROM tf JOIN df_ USING (term), n
    )
    SELECT doc_id, term, tfidf, rank FROM (
        SELECT doc_id, term, tfidf,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
)
def q_tfidf_top_terms(spark, sf_dir):
    """Per-document TF-IDF keyword extraction (smoothed sklearn idf): one
    explode pass builds (doc, term, tf); document frequency re-aggregates
    those pairs; scores round to 6 dp before ranking so the top-3 terms
    reproduce cross-engine despite last-ulp ln() differences."""
    from ningaloo_turtle_etl_spark.operators.text import tfidf_top_terms

    docs = load_table(spark, "documents", sf_dir)
    return tfidf_top_terms(docs, n_top=3)


@register(
    "corpus_overlap_sketch",
    r"""
    WITH t AS (
      SELECT lang, list_filter(string_split_regex(lower(text), '\s+'),
                               x -> x <> '') AS toks
      FROM documents
    ),
    s AS (
      SELECT lang, unnest(list_transform(range(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM t
    ),
    h AS (
      SELECT DISTINCT lang, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h32 FROM s
    ),
    r AS (
      SELECT lang, h32,
             row_number() OVER (PARTITION BY lang ORDER BY h32) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM h
    ),
    sk AS (SELECT lang, h32 FROM r WHERE rn <= CASE WHEN n < 256 THEN n ELSE 256 END),
    g AS (SELECT DISTINCT lang FROM sk),
    p AS (SELECT a.lang AS ga, b.lang AS gb FROM g a JOIN g b ON a.lang < b.lang),
    e AS (
      SELECT p.ga, p.gb, sk.h32, 1 AS in_a, 0 AS in_b FROM p JOIN sk ON sk.lang = p.ga
      UNION ALL
      SELECT p.ga, p.gb, sk.h32, 0 AS in_a, 1 AS in_b FROM p JOIN sk ON sk.lang = p.gb
    ),
    m AS (SELECT ga, gb, h32, MAX(in_a) AS ia, MAX(in_b) AS ib FROM e GROUP BY 1, 2, 3),
    w AS (SELECT ga, gb, ia, ib,
                 row_number() OVER (PARTITION BY ga, gb ORDER BY h32) AS rn
          FROM m)
    SELECT ga AS lang_a, gb AS lang_b,
           CAST(COUNT(*) AS BIGINT) AS sample_size,
           CAST(SUM(ia * ib) AS BIGINT) AS n_common,
           round(CAST(SUM(ia * ib) AS DOUBLE) / COUNT(*), 6) AS jaccard_est
    FROM w WHERE rn <= 256 GROUP BY 1, 2
    """,
)
def corpus_overlap_sketch(spark, sf_dir):
    """Cross-corpus overlap from sketches alone: pairwise 3-gram-shingle
    Jaccard between every two languages' sub-corpora, estimated from their
    KMV sketches (Beyer et al., SIGMOD 2007) — after the per-group sketch
    pass, everything touches ≤ groups²·k fixed-width rows, which is how two
    100 TB corpora get compared without shuffling either. md5 hash family →
    the DuckDB oracle reproduces every estimate bit-for-bit; convergence to
    exact Jaccard as k grows is pinned in tests/test_sketches.py."""
    from ningaloo_turtle_etl_spark.operators.curation import word_ngrams_from_tokens
    from ningaloo_turtle_etl_spark.operators.sketches import kmv_jaccard_pairs
    from ningaloo_turtle_etl_spark.operators.text import tokens

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("lang", tokens(F.lower(F.col("text"))).alias("toks"))
    sh = toks.select(
        "lang", F.explode(word_ngrams_from_tokens(F.col("toks"), 3)).alias("sh")
    )
    out = kmv_jaccard_pairs(sh, "sh", "lang", k=256)
    return out.select(
        F.col("group_a").alias("lang_a"),
        F.col("group_b").alias("lang_b"),
        "sample_size",
        "n_common",
        "jaccard_est",
    )


@register(
    "portable_quantile_profile",
    """
    WITH b AS (
      SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
             CAST(max(l_extendedprice) AS DOUBLE) AS hi
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    h AS (
      SELECT l_returnflag AS flag, lo, hi,
             CAST(CASE WHEN hi = lo THEN 0
                       ELSE greatest(0, least(1023,
                            floor((CAST(l_extendedprice AS DOUBLE) - lo) * 1024.0
                                  / (hi - lo)))) END AS BIGINT) AS bin,
             COUNT(*) AS n
      FROM lineitem, b WHERE l_extendedprice IS NOT NULL
      GROUP BY 1, 2, 3, 4
    ),
    c AS (
      SELECT flag, lo, hi, bin, n,
             SUM(n) OVER (PARTITION BY flag ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY flag) AS tot
      FROM h
    ),
    p AS (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS p),
    sel AS (
      SELECT c.flag, p.p, c.lo, c.hi, c.bin, c.n, c.cum, c.tot
      FROM c, p
      WHERE c.cum >= p.p * c.tot AND (c.cum - c.n) < p.p * c.tot
    ),
    e AS (
      SELECT l_returnflag AS flag,
             quantile_cont(l_extendedprice, [0.5, 0.95, 0.99]) AS qs
      FROM lineitem GROUP BY 1
    ),
    ex AS (SELECT flag, unnest(qs) AS qx,
                  CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS p
           FROM e)
    SELECT sel.flag AS l_returnflag, sel.p,
           round(lo + (hi - lo) / 1024.0
                 * (bin + (sel.p * tot - (cum - n)) / n), 4) AS q_est,
           round(ex.qx, 4) AS q_exact,
           round(abs(round(lo + (hi - lo) / 1024.0
                           * (bin + (sel.p * tot - (cum - n)) / n), 4)
                     - round(ex.qx, 4)) / round(ex.qx, 4), 6) AS rel_err
    FROM sel JOIN ex ON sel.flag = ex.flag AND sel.p = ex.p
    """,
)
def portable_quantile_profile(spark, sf_dir):
    """Engine-portable quantile calibration: fixed-grid binned p50/p95/p99
    of l_extendedprice per return flag vs the exact interpolated percentile,
    with relative errors. The grid histogram is the portable counterpart of
    percentile_approx's GK sketch — mergeable by bin-wise addition across
    shards or engines, deterministic double arithmetic DuckDB reproduces
    bit-for-bit. Rank error ≤ one bin (1/1024 of the range); measured here
    ≤ 0.03% of the exact value."""
    from ningaloo_turtle_etl_spark.operators.sketches import (
        portable_binned_quantiles,
    )

    probs = (0.5, 0.95, 0.99)
    li = load_table(spark, "lineitem", sf_dir)
    q = portable_binned_quantiles(
        li, "l_extendedprice", probs, by=["l_returnflag"]
    )
    p_arr = F.array(*[F.lit(float(p)) for p in probs])
    exact = (
        li.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", p_arr).alias("qs"))
        .select("l_returnflag", F.posexplode("qs").alias("i", "qx"))
        .select(
            "l_returnflag",
            F.element_at(p_arr, F.col("i") + 1).alias("p"),
            "qx",
        )
    )
    out = q.join(exact, on=["l_returnflag", "p"])
    q_exact = F.round(F.col("qx"), 4)
    return out.select(
        "l_returnflag",
        "p",
        "q_est",
        q_exact.alias("q_exact"),
        F.round(F.abs(F.col("q_est") - q_exact) / q_exact, 6).alias("rel_err"),
    )


@register(
    "sampled_token_frequencies",
    r"""
    WITH s AS (
      SELECT text FROM documents
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
            < lower(lpad(to_hex(CAST(floor(0.25 * 4294967296.0) AS BIGINT)), 8, '0'))
    ),
    st AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')) AS tok
      FROM s
    ),
    samp AS (SELECT tok, COUNT(*) AS n_sample FROM st GROUP BY 1),
    ft AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ),
    ex AS (SELECT tok, COUNT(*) AS n_exact FROM ft GROUP BY 1)
    SELECT samp.tok AS token,
           CAST(n_sample AS BIGINT) AS n_sample,
           round(n_sample / 0.25, 4) AS est_n,
           CAST(n_exact AS BIGINT) AS n_exact,
           round(abs(round(n_sample / 0.25, 4) - n_exact) / n_exact, 6) AS rel_err
    FROM samp JOIN ex ON samp.tok = ex.tok
    ORDER BY est_n DESC, token ASC LIMIT 20
    """,
)
def sampled_token_frequencies(spark, sf_dir):
    """Portable heavy-hitter calibration: top-20 corpus tokens by frequency
    estimated from a deterministic 25% document sample (md5-of-id rate
    gate), with exact counts and relative errors alongside. Misra-Gries
    state merges order-dependently and can never be reproduced by another
    engine; the hash-rate sample is bit-identical everywhere, retry-stable,
    and reads ~rate of the corpus (sample predicate is map-side). The
    sampling unit is the document (cluster sampling), so estimator variance
    is ((1-rate)/rate)*sum(per-doc count squared) — heavy items stay tight,
    the tail is noisy by contract (bound pinned in tests/test_sketches.py)."""
    from ningaloo_turtle_etl_spark.operators.sketches import (
        sampled_item_frequencies,
    )
    from ningaloo_turtle_etl_spark.operators.text import tokens

    docs = load_table(spark, "documents", sf_dir)
    ex = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    samp = sampled_item_frequencies(ex, "tok", "doc_id", rate=0.25)
    exact = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    out = samp.join(exact, samp["item"] == exact["tok"])
    return (
        out.select(
            F.col("item").alias("token"),
            "n_sample",
            "est_n",
            "n_exact",
            F.round(
                F.abs(F.col("est_n") - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err"),
        )
        .orderBy(F.desc("est_n"), F.asc("token"))
        .limit(20)
    )


@register(
    "bpe_pair_counts",
    r"""
    WITH w AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')) AS word
      FROM documents
    ),
    wf AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY 1),
    sym AS (
      SELECT freq, list_append(string_split(word, ''), '</w>') AS s FROM wf
    ),
    pairs AS (
      SELECT freq,
             unnest(list_transform(range(1, len(s)),
                    i -> s[i] || chr(1) || s[i+1])) AS pr
      FROM sym
    )
    SELECT split_part(pr, chr(1), 1) AS "left",
           split_part(pr, chr(1), 2) AS "right",
           CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM pairs GROUP BY 1, 2
    ORDER BY pair_count DESC, "left" ASC, "right" ASC LIMIT 20
    """,
)
def bpe_pair_counts(spark, sf_dir):
    """BPE induction's inner aggregation as a hash row: the top-20 weighted
    adjacent symbol pairs over the initial character+end-marker vocabulary
    (Sennrich et al. 2016 step 0). This is the aggregation every merge
    iteration re-runs, so proving it bit-for-bit covers the distributed
    heart of learn_bpe; the greedy loop itself is rows-only
    (`bpe_merges`) with exact Python-reference parity in
    tests/test_bpe.py."""
    from ningaloo_turtle_etl_spark.operators.bpe import (
        pair_counts,
        with_symbols,
        word_frequencies,
    )

    docs = load_table(spark, "documents", sf_dir)
    pc = pair_counts(with_symbols(word_frequencies(docs)))
    return pc.orderBy(
        F.desc("pair_count"), F.asc("left"), F.asc("right")
    ).limit(20)


def _bpe_oracle_sql(num_merges: int) -> str:
    """Full-oracle SQL for the iterative BPE induction, by UNROLLING the
    merge loop into a chained CTE per step: pair counts → deterministic
    argmax → apply-merge. Symbols live in a chr(31)-joined string so the
    apply step is a ``list_reduce`` string fold with the same left-to-right
    non-overlapping greedy semantics as ``operators.bpe.apply_merge`` (the
    accumulator's LAST symbol is compared whole — ``acc = l`` or
    ``ends_with(acc, sep || l)`` — so "aaa" under merge (a,a) yields
    ["aa","a"] in both engines). chr(31) never occurs in whitespace-split
    tokens, so the encoding is lossless here."""
    us = "chr(31)"
    parts = [
        f"""
    wf AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest({_TOKENS}) AS word FROM documents)
        GROUP BY word
    ),
    s0 AS (
        SELECT word, freq,
               array_to_string(
                   list_append(
                       list_transform(range(1, length(word) + 1),
                                      i -> substr(word, i, 1)),
                       '</w>'),
                   {us}) AS sym
        FROM wf
    )"""
    ]
    for i in range(1, num_merges + 1):
        prev = f"s{i - 1}"
        parts.append(
            f""",
    pc{i} AS (
        SELECT pr.l AS bl, pr.r AS br, CAST(SUM(freq) AS BIGINT) AS c
        FROM (
            SELECT freq,
                   unnest(list_transform(range(1, len(tk)),
                       j -> struct_pack(l := tk[j], r := tk[j + 1]))) AS pr
            FROM (SELECT freq, string_split(sym, {us}) AS tk FROM {prev})
        ) GROUP BY 1, 2
    ),
    b{i} AS (SELECT bl, br, c FROM pc{i}
             ORDER BY c DESC, bl ASC, br ASC LIMIT 1),
    s{i} AS (
        SELECT word, freq,
               list_reduce(string_split(sym, {us}),
                   (acc, x) -> CASE WHEN x = br AND
                                     (acc = bl OR ends_with(acc, {us} || bl))
                               THEN acc || x
                               ELSE acc || {us} || x END) AS sym
        FROM {prev} CROSS JOIN b{i}
    )"""
        )
    selects = "\n    UNION ALL\n    ".join(
        f'SELECT {i} AS step, bl AS "left", br AS "right", '
        f"bl || br AS merged, c AS pair_count FROM b{i}"
        for i in range(1, num_merges + 1)
    )
    return "WITH " + "".join(parts) + "\n    " + selects


def _bpe_encode_oracle_sql(num_merges: int) -> str:
    """Encoding oracle: reuse the unrolled chain's FINAL symbol table
    (s<N> maps word -> chr(31)-joined symbols) as the tokenizer dim, join
    it onto position-tagged corpus words, and reassemble per doc."""
    us = "chr(31)"
    chain = _bpe_oracle_sql(num_merges)
    body = chain[len("WITH ") : chain.rindex("\n    SELECT 1 AS step")]
    return f"""
    WITH {body},
    wp AS (
        SELECT doc_id, pw.pos AS pos, pw.w AS word
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) + 1),
                       j -> struct_pack(pos := j, w := toks[j]))) AS pw
            FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
        )
    ),
    enc AS (
        SELECT wp.doc_id, wp.pos,
               COALESCE(sv.sym,
                   array_to_string(
                       list_append(
                           list_transform(range(1, length(wp.word) + 1),
                                          i -> substr(wp.word, i, 1)),
                           '</w>'),
                       {us})) AS sym
        FROM wp LEFT JOIN s{num_merges} sv ON wp.word = sv.word
    ),
    per AS (
        SELECT doc_id,
               CAST(SUM(len(string_split(sym, {us}))) AS BIGINT) AS n_tokens,
               string_agg(replace(sym, {us}, ' '), ' ' ORDER BY pos)
                   AS token_stream
        FROM enc GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(per.n_tokens, 0) AS n_tokens,
           COALESCE(per.token_stream, '') AS token_stream
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """


@register("bpe_merges", _bpe_oracle_sql(8))
def bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer induction: the first 8 learned merges over
    the corpus word-frequency table — (step, left, right, merged,
    pair_count). The greedy argmax loop is driver-ITERATIVE on the Spark
    side (each step depends on the previous rewrite), but for a FIXED
    merge budget it is still SQL-expressible by unrolling — the oracle
    chains one (pair-count → argmax → list_reduce fold) CTE block per
    merge, so this row is a full hash comparison since r04 (previously
    rows-only). Exact merge-for-merge equality with a from-scratch Python
    BPE is additionally pinned in tests/test_bpe.py, and the
    per-iteration aggregation alone carries `bpe_pair_counts`."""
    from ningaloo_turtle_etl_spark.operators.bpe import learn_bpe, merge_table
    from ningaloo_turtle_etl_spark.operators.cache import release_tracked_caches

    docs = load_table(spark, "documents", sf_dir)
    merges, _sym = learn_bpe(docs, num_merges=8)
    out = merge_table(spark, merges)
    release_tracked_caches()
    return out


@register(
    "gopher_repetition_stats",
    rf"""
    WITH t AS (
        SELECT doc_id, {_TOKENS} AS toks FROM documents
    ),
    b AS (
        SELECT doc_id,
               length(array_to_string(toks, ' ')) AS n_chars,
               len(toks) AS n_words,
               len(list_distinct(toks)) AS n_distinct,
               toks
        FROM t
    ),
    g AS (
        SELECT doc_id, nn,
               unnest(CASE WHEN len(toks) >= nn THEN
                   list_transform(range(1, len(toks) - nn + 2),
                                  i -> array_to_string(toks[i:i+nn-1], ' '))
               ELSE [] END) AS gram
        FROM t, (SELECT unnest([2, 3]) AS nn)
    ),
    c AS (SELECT doc_id, nn, gram, COUNT(*) AS c FROM g GROUP BY 1, 2, 3),
    r AS (
        SELECT doc_id, nn, gram, c,
               row_number() OVER (PARTITION BY doc_id, nn
                                  ORDER BY c DESC, gram ASC) AS rk
        FROM c
    ),
    p AS (
        SELECT doc_id,
               MAX(CASE WHEN nn = 2 AND rk = 1 THEN c * length(gram) END) AS t2,
               MAX(CASE WHEN nn = 3 AND rk = 1 THEN c * length(gram) END) AS t3,
               SUM(CASE WHEN nn = 2 AND c > 1 THEN c * length(gram) ELSE 0 END) AS d2,
               SUM(CASE WHEN nn = 3 AND c > 1 THEN c * length(gram) ELSE 0 END) AS d3
        FROM r GROUP BY 1
    ),
    f AS (
        SELECT b.doc_id,
               ROUND(CASE WHEN n_chars > 0
                     THEN CAST(COALESCE(t2, 0) AS DOUBLE) / n_chars
                     ELSE 0.0 END, 6) AS top_2gram_char_frac,
               ROUND(CASE WHEN n_chars > 0
                     THEN CAST(COALESCE(t3, 0) AS DOUBLE) / n_chars
                     ELSE 0.0 END, 6) AS top_3gram_char_frac,
               ROUND(CASE WHEN n_chars > 0
                     THEN CAST(COALESCE(d2, 0) AS DOUBLE) / n_chars
                     ELSE 0.0 END, 6) AS dup_2gram_char_frac,
               ROUND(CASE WHEN n_chars > 0
                     THEN CAST(COALESCE(d3, 0) AS DOUBLE) / n_chars
                     ELSE 0.0 END, 6) AS dup_3gram_char_frac,
               ROUND(CASE WHEN n_words > 0
                     THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_words
                     ELSE 0.0 END, 6) AS repeated_word_frac
        FROM b LEFT JOIN p ON b.doc_id = p.doc_id
    )
    SELECT *,
           CASE WHEN top_2gram_char_frac <= 0.20
                 AND top_3gram_char_frac <= 0.18
                 AND dup_3gram_char_frac <= 0.60
                THEN 1 ELSE 0 END AS repetition_ok
    FROM f
    """,
)
def q_gopher_repetition_stats(spark, sf_dir):
    """Character-weighted Gopher repetition rules (Rae et al. 2021 A1):
    top-2/3-gram char fractions, duplicated-2/3-gram char fractions,
    repeated-word fraction, and the composite keep flag. Complements
    `repetition_metrics` (type-level duplicate ratios) with the
    occurrence×length-weighted form the paper actually thresholds."""
    from ningaloo_turtle_etl_spark.operators.curation import (
        gopher_repetition_stats,
    )

    docs = load_table(spark, "documents", sf_dir)
    return gopher_repetition_stats(docs)


_BIGRAM_SCORES_CTE = rf"""
    t AS (
        SELECT doc_id, {_TOKENS} AS toks
        FROM (SELECT doc_id, lower(text) AS text FROM documents)
    ),
    pairs AS (
        SELECT doc_id, pw.p AS prev, pw.w AS w FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                       i -> struct_pack(p := toks[i], w := toks[i+1]))) AS pw
            FROM t
        )
    ),
    bc AS (SELECT prev, w, COUNT(*) AS bc FROM pairs GROUP BY prev, w),
    pc AS (SELECT prev, CAST(SUM(bc) AS BIGINT) AS pc FROM bc GROUP BY prev),
    uc AS (
        SELECT w, COUNT(*) AS uc
        FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(uc) AS BIGINT) AS n_total,
                   COUNT(*) AS v_size FROM uc),
    nlls AS (
        SELECT p.doc_id,
               -ln(0.7 * (CAST(COALESCE(b.bc, 0) AS DOUBLE)
                          / CAST(c.pc AS DOUBLE))
                   + 0.3 * (CAST(COALESCE(u.uc, 0) + 1 AS DOUBLE)
                            / CAST(tot.n_total + tot.v_size + 1 AS DOUBLE)))
                   AS nll
        FROM pairs p
        LEFT JOIN bc b ON p.prev = b.prev AND p.w = b.w
        LEFT JOIN pc c ON p.prev = c.prev
        LEFT JOIN uc u ON p.w = u.w, tot
    ),
    scores AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(nll), 6) AS avg_nll
        FROM nlls GROUP BY doc_id
    )
"""


@register(
    "ccnet_perplexity_buckets",
    rf"""
    WITH {_BIGRAM_SCORES_CTE},
    labeled AS (
        SELECT d.doc_id, d.lang, s.n_bigrams, s.avg_nll
        FROM documents d JOIN scores s ON d.doc_id = s.doc_id
    ),
    cuts AS (
        SELECT lang,
               ROUND(quantile_cont(avg_nll, 1.0/3.0), 6) AS c1,
               ROUND(quantile_cont(avg_nll, 2.0/3.0), 6) AS c2
        FROM labeled GROUP BY lang
    ),
    bucketed AS (
        SELECT l.lang,
               CASE WHEN l.avg_nll <= c.c1 THEN 'head'
                    WHEN l.avg_nll <= c.c2 THEN 'middle'
                    ELSE 'tail' END AS bucket,
               l.avg_nll
        FROM labeled l JOIN cuts c ON l.lang = c.lang
    )
    SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
           -- integer micro-NLL sum: per-doc scores are already rounded to
           -- 1e-6, so summing them as exact integers kills the
           -- summation-order ulp that a double AVG can land on a .5
           -- rounding boundary
           ROUND(SUM(CAST(ROUND(avg_nll * 1e6, 0) AS BIGINT))
                 / (COUNT(*) * 1000000.0), 6) AS mean_nll,
           ROUND(MIN(avg_nll), 6) AS min_nll,
           ROUND(MAX(avg_nll), 6) AS max_nll
    FROM bucketed GROUP BY lang, bucket
    """,
)
def ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail partitioning (Wenzek et al. 2020): per-lang
    perplexity terciles under the corpus-fit bigram LM, by broadcast
    tercile cut points (not an ntile window — the corpus side stays
    map-only). Output: per (lang, bucket) doc counts and NLL stats."""
    from ningaloo_turtle_etl_spark.operators.text import perplexity_buckets

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    b = perplexity_buckets(docs, lambda_=0.7)
    # mean via exact integer micro-NLL sum — see the oracle comment
    return b.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.round(F.col("avg_nll") * 1e6, 0).cast("long"))
            / (F.count(F.lit(1)) * F.lit(1000000.0)),
            6,
        ).alias("mean_nll"),
        F.round(F.min("avg_nll"), 6).alias("min_nll"),
        F.round(F.max("avg_nll"), 6).alias("max_nll"),
    )


_SUBSTR_RANKED_CTE = """
    t AS (SELECT doc_id, coalesce(text, '') AS t,
                 length(coalesce(text, '')) AS len
          FROM documents),
    w AS (
        SELECT doc_id, pos, substr(md5(substr(t, pos, 40)), 1, 16) AS h
        FROM (SELECT doc_id, t, len,
                     unnest(range(1, len - 40 + 2)) AS pos
              FROM t WHERE len >= 40)
    ),
    r AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
               COUNT(*) OVER (PARTITION BY h) AS cnt
        FROM w
    )
"""


@register(
    "substring_dup_stats",
    f"""
    WITH {_SUBSTR_RANKED_CTE},
    s AS (
        SELECT doc_id, pos, rn, cnt,
               MAX(CASE WHEN cnt >= 2 THEN pos + 40 END) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS dpe,
               MAX(CASE WHEN rn >= 2 THEN pos + 40 END) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rpe
        FROM r
    ),
    p AS (
        SELECT doc_id,
               COUNT(*) AS n_windows,
               SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS n_dup,
               SUM(CASE WHEN rn >= 2 THEN 1 ELSE 0 END) AS n_rem,
               SUM(CASE WHEN cnt >= 2 THEN GREATEST(0, pos + 40
                   - GREATEST(pos, COALESCE(dpe, pos))) ELSE 0 END) AS dupc,
               SUM(CASE WHEN rn >= 2 THEN GREATEST(0, pos + 40
                   - GREATEST(pos, COALESCE(rpe, pos))) ELSE 0 END) AS remc
        FROM s GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(n_rem, 0) AS BIGINT) AS n_removable_windows,
           ROUND(CASE WHEN len > 0
                 THEN CAST(COALESCE(dupc, 0) AS DOUBLE) / len
                 ELSE 0.0 END, 6) AS dup_char_frac,
           ROUND(CASE WHEN len > 0
                 THEN CAST(COALESCE(remc, 0) AS DOUBLE) / len
                 ELSE 0.0 END, 6) AS removable_char_frac
    FROM t LEFT JOIN p USING (doc_id)
    """,
)
def q_substring_dup_stats(spark, sf_dir):
    """Character-granularity exact-substring duplication profile (Lee et
    al. 2022 measured via overlapping hashed 40-char windows): per-doc
    duplicated / removable window counts and interval-union char
    fractions. Detects any duplicated substring >= 40 chars, including
    ones that straddle token-passage boundaries."""
    from ningaloo_turtle_etl_spark.operators.dedup import substring_dup_stats

    docs = load_table(spark, "documents", sf_dir)
    out = substring_dup_stats(docs, k=40, hash_family="md5")
    return out.select(
        "doc_id",
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        F.col("n_removable_windows").cast("long").alias(
            "n_removable_windows"
        ),
        "dup_char_frac",
        "removable_char_frac",
    )


@register(
    "substring_span_removal",
    f"""
    WITH {_SUBSTR_RANKED_CTE},
    rm AS (SELECT doc_id, pos FROM r WHERE rn >= 2),
    g AS (
        SELECT doc_id,
               COALESCE(MAX(pos + 40) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   1) AS gs,
               pos AS ge
        FROM rm
    ),
    segs AS (
        SELECT doc_id, gs, ge FROM g WHERE ge > gs
        UNION ALL
        SELECT m.doc_id, m.mx AS gs, t.len + 1 AS ge
        FROM (SELECT doc_id, MAX(pos + 40) AS mx FROM rm GROUP BY doc_id) m
        JOIN t USING (doc_id)
        WHERE t.len + 1 > m.mx
    ),
    reb AS (
        SELECT rd.doc_id, COALESCE(sg.txt, '') AS cleaned
        FROM (SELECT DISTINCT doc_id FROM rm) rd
        LEFT JOIN (
            SELECT s.doc_id,
                   string_agg(substr(t.t, s.gs, s.ge - s.gs), ''
                              ORDER BY s.gs) AS txt
            FROM segs s JOIN t USING (doc_id)
            GROUP BY s.doc_id
        ) sg USING (doc_id)
    )
    SELECT t.doc_id,
           CAST(t.len AS BIGINT) AS n_chars,
           CAST(t.len - length(COALESCE(reb.cleaned, t.t)) AS BIGINT)
               AS n_removed_chars,
           COALESCE(reb.cleaned, t.t) AS cleaned_text
    FROM t LEFT JOIN reb USING (doc_id)
    """,
)
def q_substring_span_removal(spark, sf_dir):
    """Exact-substring span removal: corpus-wide first occurrence of every
    40-char window survives, later occurrences' spans are cut (merged when
    overlapping) and each doc is rebuilt from the surviving characters.
    The char-granularity sibling of duplicate_passage_removal."""
    from ningaloo_turtle_etl_spark.operators.dedup import (
        substring_span_removal,
    )

    docs = load_table(spark, "documents", sf_dir)
    out = substring_span_removal(docs, k=40, hash_family="md5")
    return out.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_removed_chars").cast("long").alias("n_removed_chars"),
        "cleaned_text",
    )


@register("bpe_encode_corpus", _bpe_encode_oracle_sql(8))
def bpe_encode_corpus(spark, sf_dir):
    """Tokenizer APPLICATION: encode every document with the 8-merge BPE
    induced from this corpus — per doc, token count and the space-joined
    token stream. Corpus explodes once; the vocabulary-sized symbol table
    broadcasts; reassembly is one doc-keyed groupBy. The oracle reuses the
    unrolled induction chain's final symbol table as its tokenizer dim."""
    from ningaloo_turtle_etl_spark.operators.bpe import (
        encode_corpus,
        learn_bpe,
    )

    docs = load_table(spark, "documents", sf_dir)
    merges, sym = learn_bpe(docs, num_merges=8)
    # merges drive the OOV fallback; unused on the training corpus itself,
    # where every word hits the symbol table (the oracle's fallback is
    # bare chars for the same reason — neither path can fire here).
    return encode_corpus(docs, sym, merges)


@register(
    "zipf_corpus_fit",
    rf"""
    WITH wf AS (
        SELECT source AS grp, word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT source, unnest({_TOKENS}) AS word FROM documents)
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT grp, freq,
               CAST(ROUND(ln(CAST(row_number() OVER (
                   PARTITION BY grp ORDER BY freq DESC, word ASC
               ) AS DOUBLE)) * 1e6, 0) AS BIGINT) AS xi,
               CAST(ROUND(ln(CAST(freq AS DOUBLE)) * 1e6, 0) AS BIGINT)
                   AS yi
        FROM wf
    ),
    m AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(freq) AS BIGINT) AS n_tokens,
               CAST(SUM(xi) AS BIGINT) AS sx,
               CAST(SUM(yi) AS BIGINT) AS sy,
               CAST(SUM(xi * xi) AS BIGINT) AS sxx,
               CAST(SUM(xi * yi) AS BIGINT) AS sxy,
               CAST(SUM(yi * yi) AS BIGINT) AS syy
        FROM ranked GROUP BY grp
    )
    SELECT grp AS source, n_types, n_tokens,
           ROUND(CASE WHEN CAST(n_types AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0 THEN
               (CAST(n_types AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n_types AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           END, 6) AS zipf_slope,
           ROUND(CASE WHEN CAST(n_types AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0 THEN
               (CAST(sy AS DOUBLE) - ((CAST(n_types AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n_types AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
               / (CAST(n_types AS DOUBLE) * 1e6)
           END, 6) AS zipf_intercept,
           ROUND(CASE WHEN (CAST(n_types AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0)
                       AND (CAST(n_types AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0) THEN
               (CAST(n_types AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               * (CAST(n_types AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / ((CAST(n_types AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n_types AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           END, 6) AS fit_r2
    FROM m
    """,
)
def zipf_corpus_fit(spark, sf_dir):
    """Zipf's-law rank-frequency fit per source: OLS slope/intercept/r2 of
    ln(freq) on ln(rank) over each source's word-frequency table. Exact
    integer micro-unit moments make the fit summation-order-proof; the
    rank window sorts only the vocabulary."""
    from ningaloo_turtle_etl_spark.operators.text import zipf_fit

    docs = load_table(spark, "documents", sf_dir)
    return zipf_fit(docs, group_col="source")


@register(
    "phrase_search_top_bigram",
    rf"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    p AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                   i -> struct_pack(a := toks[i], b := toks[i + 1]))) AS pr
        FROM t
    ),
    p2 AS (SELECT doc_id, pr.a AS a, pr.b AS b FROM p),
    c AS (SELECT a, b, COUNT(*) AS n FROM p2 GROUP BY 1, 2),
    top AS (SELECT a, b FROM c ORDER BY n DESC, a ASC, b ASC LIMIT 1),
    m AS (
        SELECT p2.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM p2 JOIN top ON p2.a = top.a AND p2.b = top.b
        GROUP BY 1
    )
    SELECT m.doc_id, top.a AS term_a, top.b AS term_b, m.n_occurrences
    FROM m, top
    """,
)
def phrase_search_top_bigram(spark, sf_dir):
    """Positional-index phrase search: build the inverted index, elect the
    corpus's most frequent bigram, and count its exact adjacent
    occurrences per doc FROM THE INDEX (positional merge over postings —
    the corpus is never rescanned). The oracle recomputes the same counts
    directly from token adjacency, so the index path is cross-checked
    against a structurally different formulation."""
    from ningaloo_turtle_etl_spark.operators.search import (
        build_inverted_index,
        phrase_occurrences,
        top_bigram,
    )

    docs = load_table(spark, "documents", sf_dir)
    a, b = top_bigram(docs)
    idx = build_inverted_index(docs)
    return phrase_occurrences(idx, [a, b]).select(
        "doc_id",
        F.lit(a).alias("term_a"),
        F.lit(b).alias("term_b"),
        "n_occurrences",
    )


@register(
    "bm25_top10",
    rf"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    p2 AS (
        SELECT doc_id, pr.a AS a, pr.b AS b FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                       i -> struct_pack(a := toks[i], b := toks[i + 1])))
                       AS pr
            FROM t
        )
    ),
    top AS (SELECT a, b FROM (
        SELECT a, b, COUNT(*) AS n FROM p2 GROUP BY 1, 2)
        ORDER BY n DESC, a ASC, b ASC LIMIT 1),
    q AS (SELECT DISTINCT term FROM (
        SELECT a AS term FROM top UNION ALL SELECT b FROM top)),
    idx AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM t)
        GROUP BY 1, 2
    ),
    dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM idx GROUP BY term),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
           FROM idx GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     AVG(dl) AS avgdl FROM dl),
    scored AS (
        SELECT i.doc_id,
               CAST(ROUND(
                   ln((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5)
                      / (CAST(f.df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(i.tf AS DOUBLE) * 2.2
                      / (CAST(i.tf AS DOUBLE)
                         + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)))
                   * 1e6, 0) AS BIGINT) AS s
        FROM idx i
        JOIN q ON i.term = q.term
        JOIN dfs f ON i.term = f.term
        JOIN dl d ON i.doc_id = d.doc_id, stats s
    )
    SELECT doc_id,
           ROUND(SUM(s) / 1e6, 6) AS bm25_score,
           CAST(COUNT(*) AS BIGINT) AS n_query_terms_matched
    FROM scored GROUP BY doc_id
    ORDER BY bm25_score DESC, doc_id ASC LIMIT 10
    """,
)
def bm25_top10(spark, sf_dir):
    """BM25 top-10 for the corpus's most frequent bigram as a two-term
    query, answered entirely from the inverted index (corpus stats from a
    broadcast 1-row aggregate; per-term scores in integer micro-units so
    the per-doc sum is order-proof). k1=1.2, b=0.75 — hence the literal
    2.2 numerator and 0.25 + 0.75·dl/avgdl damping in the oracle."""
    from ningaloo_turtle_etl_spark.operators.search import (
        bm25_topk,
        build_inverted_index,
        top_bigram,
    )

    docs = load_table(spark, "documents", sf_dir)
    a, b = top_bigram(docs)
    idx = build_inverted_index(docs)
    return bm25_topk(idx, [a, b], k=10)


def _pagerank_oracle_sql(iterations: int, damping: float = 0.85) -> str:
    """Unrolled power-iteration oracle (same chaining trick as the BPE
    merge loop): one CTE per round. All arithmetic mirrors the operator:
    0.85 is forced to DOUBLE (DuckDB would otherwise do DECIMAL math and
    round differently), contributions round to whole micro-units before
    the exact-integer sum."""
    base = int(round((1.0 - damping) * 1e6))
    parts = [
        """
    eo AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS src
           FROM lineitem),
    ed0 AS (
        SELECT DISTINCT a.src AS src, b.src AS dst
        FROM eo a JOIN eo b ON a.ok = b.ok AND a.src <> b.src
    ),
    od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
           FROM ed0 GROUP BY src),
    ed AS (SELECT ed0.src, ed0.dst, od.outdeg
           FROM ed0 JOIN od USING (src)),
    nodes AS (SELECT src AS node FROM ed0
              UNION SELECT dst FROM ed0),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rm FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    r{i} AS (
        SELECT n.node, CAST({base} + COALESCE(s.s, 0) AS BIGINT) AS rm
        FROM nodes n LEFT JOIN (
            SELECT ed.dst AS node,
                   CAST(SUM(CAST(ROUND(CAST({damping} AS DOUBLE) * r.rm
                       / ed.outdeg, 0) AS BIGINT)) AS BIGINT) AS s
            FROM ed JOIN r{i - 1} r ON ed.src = r.node
            GROUP BY ed.dst
        ) s ON n.node = s.node
    )"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f"""
    SELECT node, ROUND(rm / 1e6, 6) AS rank FROM r{iterations}"""
    )


@register("pagerank_copurchase", _pagerank_oracle_sql(5))
def pagerank_copurchase(spark, sf_dir):
    """PageRank (5 synchronous power iterations, d=0.85) over the part
    co-purchase graph — parts are linked when they share an order. The
    Spark side is a driver-counted distributed loop (rank vector joins
    degree-annotated edges, dst-keyed integer-exact reduce per round);
    the oracle unrolls the same five rounds into chained CTEs."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        copurchase_edges,
        pagerank,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = copurchase_edges(li)
    return pagerank(edges, iterations=5, damping=0.85).select(
        "node", "rank"
    )


@register(
    "bfs_hop_distance",
    """
    WITH RECURSIVE
    eo AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS src
           FROM lineitem),
    ed AS (
        SELECT DISTINCT a.src AS src, b.src AS dst
        FROM eo a JOIN eo b ON a.ok = b.ok AND a.src <> b.src
    ),
    walk(node, hops) AS (
        SELECT DISTINCT src AS node, 0 AS hops FROM eo WHERE src <= 3
        UNION
        SELECT ed.dst, w.hops + 1
        FROM walk w JOIN ed ON ed.src = w.node
        WHERE w.hops < 3
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(MIN(hops) AS INT) AS hops
    FROM walk GROUP BY node ORDER BY node
    """,
)
def bfs_hop_distance(spark, sf_dir):
    """Multi-source BFS (`operators/graph.py bfs_hops`, 3 rounds) over
    the part co-purchase graph from the seed set {parts 1-3 present in
    lineitem}: minimum hop count to every node within 3 hops. Spark
    expands a frontier per round (frontier-sized joins, visited-set
    anti-join, each node expanded once ever); the oracle states the same
    semantics independently as a depth-bounded recursive CTE with a
    MIN(hops) rollup — a different algorithm shape entirely, so
    agreement pins the traversal, not the implementation."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        bfs_hops,
        copurchase_edges,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = copurchase_edges(li)
    seeds = (
        li.filter(F.col("l_partkey") <= 3)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    return (
        bfs_hops(edges, seeds, max_hops=3)
        .select("node", F.col("hops").cast("int").alias("hops"))
        .orderBy("node")
    )


# Ed-Join prefix-filtered edit-distance pairs over customer names — shared
# between the pair query and the entity-resolution clustering on top of it.
_EDIT_CTES = """
    s AS (SELECT c_custkey AS id, c_name AS s FROM customer),
    -- q-1 sentinel chars pad both ends (prefix-filter completeness for
    -- strings near length q; see edit_similarity_self_join)
    sp AS (SELECT id, repeat(chr(2), 2) || s || repeat(chr(2), 2) AS ps
           FROM s),
    grams AS (
        SELECT id, unnest(list_distinct(list_transform(
            range(1, length(ps) - 3 + 2),
            i -> substr(ps, i, 3)))) AS gram
        FROM sp
    ),
    freq AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS gf
             FROM grams GROUP BY gram),
    prefix AS (
        SELECT id, gram FROM (
            SELECT g.id, g.gram,
                   row_number() OVER (PARTITION BY g.id
                                      ORDER BY f.gf ASC, g.gram ASC) AS rn
            FROM grams g JOIN freq f USING (gram))
        WHERE rn <= 4
    ),
    cand AS (
        SELECT DISTINCT a.id AS ida, b.id AS idb
        FROM prefix a JOIN prefix b USING (gram)
        WHERE a.id < b.id
    ),
    vpairs AS (
        SELECT c.ida AS id_a, c.idb AS id_b,
               CAST(levenshtein(x.s, y.s) AS BIGINT) AS edit_distance
        FROM cand c
        JOIN s x ON c.ida = x.id
        JOIN s y ON c.idb = y.id
        WHERE abs(length(x.s) - length(y.s)) <= 1
          AND levenshtein(x.s, y.s) <= 1
    )
"""


@register(
    "edit_similarity_pairs",
    f"""
    WITH {_EDIT_CTES}
    SELECT id_a, id_b, edit_distance FROM vpairs
    """,
)
def edit_similarity_pairs(spark, sf_dir):
    """Similarity self-join over customer names: every pair within
    Levenshtein distance 1, via Ed-Join prefix filtering (rarest
    q·k+1 grams elect candidates; exact levenshtein verifies) — the
    record-linkage primitive, never materializing all-pairs."""
    from ningaloo_turtle_etl_spark.operators.relational import (
        edit_similarity_self_join,
    )

    cust = load_table(spark, "customer", sf_dir)
    return edit_similarity_self_join(
        cust, text_col="c_name", id_col="c_custkey", max_edit=1, q=3
    )


@register(
    "triangle_clustering",
    """
    WITH eo AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                FROM lineitem),
    e AS (
        SELECT DISTINCT LEAST(a.p, b.p) AS a, GREATEST(a.p, b.p) AS b
        FROM eo a JOIN eo b ON a.ok = b.ok AND a.p <> b.p
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node
    ),
    tri AS (
        SELECT w.x, w.y, w.z
        FROM (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b) w
        JOIN e ON e.a = w.y AND e.b = w.z
    ),
    corners AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
        GROUP BY node
    )
    SELECT d.node, d.degree,
           COALESCE(c.triangles, 0) AS triangles,
           ROUND(CASE WHEN d.degree >= 2
                 THEN COALESCE(c.triangles, 0)
                      / (d.degree * (d.degree - 1) / 2.0)
                 ELSE 0.0 END, 6) AS clustering_coeff
    FROM deg d LEFT JOIN corners c ON d.node = c.node
    """,
)
def triangle_clustering(spark, sf_dir):
    """Per-node triangle counts and local clustering coefficients over the
    part co-purchase graph, via the oriented wedge-close (wedges built
    only at each triangle's smallest corner, bounding hub fan-out)."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        copurchase_edges,
        triangle_stats,
    )
    from ningaloo_turtle_etl_spark.operators.cache import (
        release_tracked_caches,
    )

    li = load_table(spark, "lineitem", sf_dir)
    out = triangle_stats(copurchase_edges(li))
    return out


@register(
    "heaps_vocab_growth",
    rf"""
    WITH toks AS (
        SELECT source AS grp, doc_id AS doc, unnest({_TOKENS}) AS word
        FROM documents
    ),
    pdt AS (SELECT grp, doc, CAST(COUNT(*) AS BIGINT) AS n_toks
            FROM toks GROUP BY 1, 2),
    nt AS (
        SELECT grp, doc, CAST(COUNT(*) AS BIGINT) AS n_new FROM (
            SELECT grp, word, MIN(doc) AS doc FROM toks GROUP BY 1, 2)
        GROUP BY 1, 2
    ),
    curve AS (
        SELECT grp,
               SUM(p.n_toks) OVER (PARTITION BY grp ORDER BY p.doc
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens,
               SUM(COALESCE(n.n_new, 0)) OVER (PARTITION BY grp
                   ORDER BY p.doc ROWS UNBOUNDED PRECEDING) AS cum_types
        FROM pdt p LEFT JOIN nt n USING (grp, doc)
    ),
    mi AS (
        SELECT grp, cum_tokens, cum_types,
               CAST(ROUND(ln(CAST(cum_tokens AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS xi,
               CAST(ROUND(ln(CAST(cum_types AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS yi
        FROM curve
    ),
    m AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MAX(cum_tokens) AS BIGINT) AS total_tokens,
               CAST(MAX(cum_types) AS BIGINT) AS total_types,
               CAST(SUM(xi) AS BIGINT) AS sx, CAST(SUM(yi) AS BIGINT) AS sy,
               CAST(SUM(xi * xi) AS BIGINT) AS sxx,
               CAST(SUM(xi * yi) AS BIGINT) AS sxy,
               CAST(SUM(yi * yi) AS BIGINT) AS syy
        FROM mi GROUP BY grp
    )
    SELECT grp AS source, n_docs, total_tokens, total_types,
           ROUND(CASE WHEN CAST(n_docs AS DOUBLE) * sxx
                           - CAST(sx AS DOUBLE) * sx > 0 THEN
               (CAST(n_docs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n_docs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           END, 6) AS heaps_beta,
           ROUND(CASE WHEN CAST(n_docs AS DOUBLE) * sxx
                           - CAST(sx AS DOUBLE) * sx > 0 THEN
               (CAST(sy AS DOUBLE)
                - ((CAST(n_docs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n_docs AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx)) * sx)
               / (CAST(n_docs AS DOUBLE) * 1e6)
           END, 6) AS heaps_log_k,
           ROUND(CASE WHEN (CAST(n_docs AS DOUBLE) * sxx
                            - CAST(sx AS DOUBLE) * sx > 0)
                       AND (CAST(n_docs AS DOUBLE) * syy
                            - CAST(sy AS DOUBLE) * sy > 0) THEN
               (CAST(n_docs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               * (CAST(n_docs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / ((CAST(n_docs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n_docs AS DOUBLE) * syy
                     - CAST(sy AS DOUBLE) * sy))
           END, 6) AS fit_r2
    FROM m
    """,
)
def heaps_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit per source: OLS of ln(cumulative
    types) on ln(cumulative tokens) along doc order — types appear at
    their first-occurrence doc, so the curve needs one (group,word)-keyed
    min plus a doc-sized cumsum window, never per-token scan state."""
    from ningaloo_turtle_etl_spark.operators.text import heaps_fit

    docs = load_table(spark, "documents", sf_dir)
    return heaps_fit(docs, group_col="source")


@register(
    "countmin_token_counts",
    rf"""
    WITH toks AS (SELECT unnest({_TOKENS}) AS tok FROM documents),
    exact AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact FROM toks GROUP BY 1
    ),
    hrows AS (SELECT unnest([0, 1, 2, 3]) AS row),
    cells AS (
      SELECT row,
             ('0x' || substr(md5(tok || '|' || row), 1, 8))::BIGINT % 16 AS col,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM toks CROSS JOIN hrows GROUP BY 1, 2
    ),
    est AS (
      SELECT e.tok, MIN(c.n) AS cm_estimate
      FROM exact e CROSS JOIN hrows r
      JOIN cells c ON c.row = r.row
       AND c.col = ('0x' || substr(md5(e.tok || '|' || r.row), 1, 8))::BIGINT % 16
      GROUP BY 1
    )
    SELECT e.tok, e.n_exact, s.cm_estimate,
           s.cm_estimate - e.n_exact AS overestimate
    FROM exact e JOIN est s USING (tok)
    ORDER BY n_exact DESC, tok LIMIT 20
    """,
)
def countmin_token_counts(spark, sf_dir):
    """Count-min sketch calibration over document tokens
    (`operators/sketches.py countmin_table/countmin_estimate`): top-20
    exact token counts vs the depth-4 × width-16 sketch estimate, with the
    guaranteed-nonnegative overestimate. Width 16 is deliberately far
    below the vocabulary so collisions are exercised; the production
    default (512) makes the error ≤ ~2N/512 w.h.p. The sketch state is
    depth × width cells regardless of corpus size, merges by cell-wise
    addition, and reproduces bit-for-bit in any engine with md5()."""
    from ningaloo_turtle_etl_spark.operators.sketches import (
        countmin_estimate,
        countmin_table,
    )

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    toks = toks.persist()
    cm = countmin_table(toks, "tok", depth=4, width=16)
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
    est = countmin_estimate(cm, exact.select("tok"), "tok", depth=4, width=16)
    return (
        exact.join(est, on="tok")
        .select(
            "tok",
            "n_exact",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("n_exact")).alias("overestimate"),
        )
        .orderBy(F.desc("n_exact"), F.asc("tok"))
        .limit(20)
    )


def _entity_resolution_oracle_sql(rounds: int = 16) -> str:
    """Unrolled POINTER-JUMPING connected components over the Ed-Join
    match edges — min-of-neighbors then label ← label(label) per round,
    exactly the Spark operator's algorithm (`operators/graph.py
    connected_components`), so after convergence the labels are
    identical by determinism; ``rounds`` pointer-jumped rounds cover
    component diameter ~2^rounds, far past any real name graph.

    Replaces the r3 RECURSIVE transitive-closure form, which
    materialized |cluster|² reach rows — at sf0.1 the synthetic
    customer names ('Customer#000000123') are all within edit-1 digit
    flips of each other, the graph collapses toward ONE 15k-member
    cluster, and the closure hit 225M rows / 33 GB / ~an hour in
    DuckDB. Pointer jumping is node-grain per round: seconds at any
    sf (the exact scale lesson SCALING.md teaches for the Spark side,
    applied to the oracle)."""
    parts = [
        f"""
    {_EDIT_CTES},
    edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM vpairs
        UNION
        SELECT id_b, id_a FROM vpairs
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
    l0 AS (SELECT id, id AS lbl FROM nodes)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
    m{t} AS MATERIALIZED (
        SELECT n.id,
               LEAST(l.lbl, COALESCE(nm.nmin, l.lbl)) AS mid
        FROM nodes n
        JOIN l{t - 1} l ON n.id = l.id
        LEFT JOIN (
            SELECT e.src AS id, MIN(l.lbl) AS nmin
            FROM edges e JOIN l{t - 1} l ON e.dst = l.id
            GROUP BY e.src
        ) nm ON n.id = nm.id
    ),
    l{t} AS MATERIALIZED (
        SELECT a.id, COALESCE(b.mid, a.mid) AS lbl
        FROM m{t} a LEFT JOIN m{t} b ON a.mid = b.id
    )"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f""",
    comp AS (SELECT id, lbl AS cluster_id FROM l{rounds}),
    sizes AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM comp GROUP BY 1
    )
    SELECT c.cluster_id, c.id AS member_id, n.c_name AS member_name,
           r.c_name AS rep_name, sz.n_members
    FROM comp c
    JOIN customer n ON n.c_custkey = c.id
    JOIN customer r ON r.c_custkey = c.cluster_id
    JOIN sizes sz ON sz.cluster_id = c.cluster_id
    ORDER BY c.cluster_id, member_id"""
    )


@register("entity_resolution_clusters", _entity_resolution_oracle_sql(16))
def entity_resolution_clusters(spark, sf_dir):
    """Entity resolution end-to-end: Ed-Join edit-distance blocking over
    customer names (`operators/relational.py edit_similarity_self_join`) →
    pointer-jumping connected components (`operators/graph.py`) →
    canonical-record election (the cluster's min id is its CC label, so
    the representative lookup is one broadcast-sized join, no extra
    election pass). The record-linkage pipeline a warehouse dedupe runs:
    block, verify, cluster, canonicalize — all-pairs never materializes,
    and only matched entities (clusters of >= 2) appear."""
    from ningaloo_turtle_etl_spark.operators.graph import connected_components
    from ningaloo_turtle_etl_spark.operators.relational import (
        edit_similarity_self_join,
    )

    cust = load_table(spark, "customer", sf_dir)
    pairs = edit_similarity_self_join(
        cust, text_col="c_name", id_col="c_custkey", max_edit=1, q=3
    )
    comp = connected_components(pairs).select(
        F.col("id").alias("member_id"), F.col("component").alias("cluster_id")
    )
    names = cust.select(
        F.col("c_custkey").alias("member_id"), F.col("c_name").alias("member_name")
    )
    reps = cust.select(
        F.col("c_custkey").alias("cluster_id"), F.col("c_name").alias("rep_name")
    )
    sizes = comp.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        comp.join(names, on="member_id")
        .join(F.broadcast(reps), on="cluster_id")
        .join(F.broadcast(sizes), on="cluster_id")
        .select("cluster_id", "member_id", "member_name", "rep_name", "n_members")
        .orderBy("cluster_id", "member_id")
    )


def _kcore_oracle_sql(k: int, rounds: int) -> str:
    """Unrolled synchronous-peeling oracle (the pagerank/BPE chaining
    trick): one degree-filter-prune CTE triple per round. Peeling is
    idempotent at fixpoint, so ``rounds`` only needs to be >= the true
    peeling depth at every graded SF (measured: 0 / 10 / 2 rounds at
    sf0.001 / 0.01 / 0.1 — 16 leaves margin); the Spark operator
    independently raises if IT hasn't converged, so a too-shallow unroll
    can't silently pass."""
    parts = [
        """
    eo AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem),
    -- MATERIALIZED stops DuckDB inlining each round's CTE into its (several)
    -- consumers — inlined, the chain re-expands the base scan ~5^rounds times.
    e0 AS MATERIALIZED (
        SELECT a.s AS a, b.s AS b
        FROM eo a JOIN eo b ON a.ok = b.ok AND a.s < b.s
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    d{i} AS MATERIALIZED (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT a AS node FROM e{i - 1}
            UNION ALL SELECT b FROM e{i - 1}
        ) GROUP BY 1
    ),
    k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k}),
    e{i} AS MATERIALIZED (
        SELECT a, b FROM e{i - 1}
        WHERE a IN (SELECT node FROM k{i})
          AND b IN (SELECT node FROM k{i})
    )"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f"""
    SELECT node, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
        SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds}
    ) GROUP BY 1 ORDER BY node"""
    )


@register("kcore_copurchase", _kcore_oracle_sql(3, 16))
def kcore_copurchase(spark, sf_dir):
    """3-core of the support-2 co-purchase graph (`operators/graph.py
    k_core`): parts that survive iterative peeling to a mutually-dense
    cluster — the dense-substructure filter a one-shot degree cut can't
    express (removing a weak node strips its neighbors). Spark peels to
    fixpoint with a driver-counted loop (degree agg + two semi-joins per
    round on the shrinking subgraph); the oracle unrolls the same
    synchronous rounds as chained CTEs."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        copurchase_edges,
        k_core,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = copurchase_edges(li, min_shared=2)
    return k_core(edges, k=3).orderBy("node")


@register(
    "containment_near_dups",
    rf"""
    WITH t AS (
        SELECT doc_id, lang, list_distinct({_TOKENS}) AS sh
        FROM documents WHERE doc_id < 150
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(a.sh), 6) AS containment
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id <> b.doc_id
    WHERE len(a.sh) > 0
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.9
    """,
)
def containment_near_dups(spark, sf_dir):
    """Asymmetric shingle-containment pairs (|A∩B|/|A| >= 0.9, block =
    lang): the subset-duplicate detector — a doc quoted inside a larger
    one has high containment but LOW Jaccard, so the symmetric passes
    (`ngram_jaccard_near_dups`, MinHash) structurally miss it
    (`operators/dedup.py ngram_containment_pairs`). Directed: a row says
    id_a is covered by id_b; dedup policy drops the contained side."""
    from ningaloo_turtle_etl_spark.operators.dedup import ngram_containment_pairs

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 150)
    return ngram_containment_pairs(
        docs, block_col="lang", shingle_n=1, threshold=0.9
    )


@register(
    "readability_scores",
    r"""
    WITH f AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\s+'),
                 x -> x <> '')) AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))
               AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS n_syllables
      FROM documents
    )
    SELECT doc_id, CAST(n_words AS INT) AS n_words,
           CAST(n_sentences AS INT) AS n_sentences,
           CAST(n_syllables AS INT) AS n_syllables,
           CASE WHEN n_words > 0 THEN
             ROUND(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                   - 84.6 * (n_syllables * 1.0 / n_words), 4)
           END AS flesch
    FROM f ORDER BY doc_id
    """,
)
def readability_scores(spark, sf_dir):
    """Flesch reading-ease over the corpus (`operators/text.py
    readability_scores`): sentence-length and syllable-density signals
    from three map-only regex passes — the readability axis the ratio
    heuristics in text_quality_scores don't cover."""
    from ningaloo_turtle_etl_spark.operators.text import readability_scores

    docs = load_table(spark, "documents", sf_dir)
    return readability_scores(docs).select(
        "doc_id", "n_words", "n_sentences", "n_syllables", "flesch"
    ).orderBy("doc_id")


@register(
    "soft_dedup_weights",
    f"""
    SELECT doc_id,
           CAST(COUNT(*) OVER (
               PARTITION BY substr(md5({_NORM}), 1, 16)) AS BIGINT)
               AS cluster_size,
           ROUND(1.0 / COUNT(*) OVER (
               PARTITION BY substr(md5({_NORM}), 1, 16)), 6) AS weight
    FROM documents
    """,
)
def q_soft_dedup_weights(spark, sf_dir):
    """Down-weighting dedup (soft counterpart of dedup_exact): every copy
    survives with training weight 1/cluster_size, so each exact-duplicate
    cluster contributes one document's worth of gradient mass. Only
    (fingerprint, id) shuffles; bodies stay map-side."""
    from ningaloo_turtle_etl_spark.operators.dedup import soft_dedup_weights

    docs = load_table(spark, "documents", sf_dir)
    return soft_dedup_weights(docs)


@register(
    "length_bucket_batches",
    f"""
    WITH sized AS (
        SELECT doc_id, len({_TOKENS_RAW}) AS l,
               CASE WHEN len({_TOKENS_RAW}) <= 16 THEN 16
                    WHEN len({_TOKENS_RAW}) <= 32 THEN 32
                    WHEN len({_TOKENS_RAW}) <= 64 THEN 64
                    WHEN len({_TOKENS_RAW}) <= 128 THEN 128
                    WHEN len({_TOKENS_RAW}) <= 256 THEN 256
                    WHEN len({_TOKENS_RAW}) <= 512 THEN 512
                    ELSE 1024 END AS bucket
        FROM documents
    ),
    slotted AS (
        SELECT bucket, l,
               CAST(floor((ROW_NUMBER() OVER (PARTITION BY bucket
                                              ORDER BY doc_id) - 1)
                          / 8.0) AS INT) AS batch_id
        FROM sized
    )
    SELECT CAST(bucket AS INT) AS bucket, batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(l) AS INT) AS max_len,
           CAST(SUM(l) AS BIGINT) AS sum_len,
           ROUND(1.0 - SUM(l) / CAST(COUNT(*) * GREATEST(MAX(l), 1) AS DOUBLE),
                 6) AS pad_frac
    FROM slotted GROUP BY bucket, batch_id
    """,
)
def q_length_bucket_batches(spark, sf_dir):
    """Length-bucketed batch building: pow2 token-length buckets, 8-doc
    batches filled in id order within each bucket, padding waste accounted
    against each batch's own max length. The bucketing bounds pad_frac at
    ~0.5 worst-case; the oracle restates the policy with the identical
    CASE ladder."""
    from ningaloo_turtle_etl_spark.operators.curation import length_bucket_batches

    docs = load_table(spark, "documents", sf_dir)
    return length_bucket_batches(docs, batch_size=8)


@register(
    "curriculum_order",
    """
    SELECT doc_id,
           CAST(NTILE(5) OVER (ORDER BY n_chars DESC, doc_id) AS INT) AS stage,
           substr(md5('curriculum ' || CAST(doc_id AS VARCHAR)), 1, 12)
               AS shuffle_key
    FROM documents
    """,
)
def q_curriculum_order(spark, sf_dir):
    """Curriculum staging by document length (n_chars as the difficulty
    proxy): 5 equal-count stages, easiest (longest) first, plus a
    deterministic md5 within-stage shuffle key. exact=True NTILE path for
    oracle parity; the exact=False approx-percentile binning path (no
    global sort, the 100 TB shape) is pinned against this one in
    tests/test_llm_ops.py."""
    from ningaloo_turtle_etl_spark.operators.curation import curriculum_order

    docs = load_table(spark, "documents", sf_dir)
    return curriculum_order(docs, score_col="n_chars", n_stages=5).select(
        "doc_id", "stage", "shuffle_key"
    )


@register(
    "oov_rate",
    f"""
    WITH pairs AS (
        SELECT doc_id, unnest({_TOKENS}) AS tok FROM documents
    ),
    counts AS (SELECT tok, COUNT(*) AS n FROM pairs GROUP BY tok),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS r
            FROM counts) WHERE r <= 500
    ),
    scored AS (
        SELECT p.doc_id, COUNT(*) AS n_tokens,
               SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM pairs p LEFT JOIN vocab v USING (tok) GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(s.n_oov, 0) AS BIGINT) AS n_oov,
           ROUND(COALESCE(s.n_oov / CAST(s.n_tokens AS DOUBLE), 0.0), 6)
               AS oov_frac
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def q_oov_rate(spark, sf_dir):
    """Tokenizer-vocabulary coverage screen: top-500 corpus vocabulary
    (frequency then lexicographic — a deterministic total order) and each
    document's out-of-vocabulary token fraction
    (`operators/text.py oov_rate`). Vocabulary-sized count table, explode +
    broadcast probe scoring pass."""
    from ningaloo_turtle_etl_spark.operators.text import oov_rate

    docs = load_table(spark, "documents", sf_dir)
    return oov_rate(docs, vocab_size=500)


@register(
    "ngram_novelty",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKENS_RAW} AS t FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               CASE WHEN len(t) >= 3
                    THEN array_to_string(list_slice(t, i + 1, i + 3), ' ')
                    ELSE array_to_string(t, ' ') END AS gram
        FROM (
            SELECT doc_id, t,
                   unnest(range(CASE WHEN len(t) >= 3 THEN len(t) - 2
                                     ELSE 1 END)) AS i
            FROM toks
        )
    ),
    first_occ AS (SELECT gram, MIN(doc_id) AS first_id FROM grams GROUP BY 1),
    per_doc AS (
        SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel
        FROM grams g JOIN first_occ f USING (gram) GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.n_novel, 0) AS n_novel,
           ROUND(COALESCE(p.n_novel / CAST(p.n_grams AS DOUBLE), 0.0), 6)
               AS novelty
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def q_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty vs everything earlier in the corpus
    (`operators/dedup.py ngram_novelty`): fraction of the doc's distinct
    shingles first seen in this doc. One gram-keyed min election + a
    payload-free join back; the redundancy signal dual to dedup."""
    from ningaloo_turtle_etl_spark.operators.dedup import ngram_novelty

    docs = load_table(spark, "documents", sf_dir)
    return ngram_novelty(docs, n=3)


@register(
    "label_centroid_cosine",
    """
    WITH ex AS (
        SELECT label, CAST(i AS INT) AS pos, embedding[i + 1] AS v
        FROM (SELECT label, embedding,
                     unnest(range(len(embedding))) AS i
              FROM embeddings)
    ),
    cent AS (SELECT label, pos, AVG(v) AS c FROM ex GROUP BY 1, 2),
    norms AS (SELECT label, sqrt(SUM(c * c)) AS nrm FROM cent GROUP BY 1),
    dots AS (
        SELECT a.label AS label_a, b.label AS label_b, SUM(a.c * b.c) AS dot
        FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
        GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN norms na ON na.label = dots.label_a
    JOIN norms nb ON nb.label = dots.label_b
    """,
)
def q_label_centroid_cosine(spark, sf_dir):
    """Class-separation diagnostic over the embedding space
    (`operators/similarity.py label_centroid_cosine`): pairwise cosine
    between per-label centroids. Raw vectors are touched once by the
    centroid pass; all pair math runs on the labels x dims table."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        label_centroid_cosine,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    return label_centroid_cosine(emb)


@register(
    "session_funnel_view_click_purchase",
    """
    WITH lagged AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS secs,
             lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_type,
             SUM(CASE WHEN prev IS NULL OR secs - prev > 1800
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM lagged
    ),
    s1 AS (
        SELECT user_id, session_seq, MIN(ts) AS t FROM flagged
        WHERE event_type = 'view' GROUP BY 1, 2
    ),
    s2 AS (
        SELECT f.user_id, f.session_seq, MIN(f.ts) AS t
        FROM flagged f JOIN s1 ON f.user_id = s1.user_id
                              AND f.session_seq = s1.session_seq
        WHERE f.event_type = 'click' AND f.ts > s1.t
        GROUP BY 1, 2
    ),
    s3 AS (
        SELECT f.user_id, f.session_seq, MIN(f.ts) AS t
        FROM flagged f JOIN s2 ON f.user_id = s2.user_id
                              AND f.session_seq = s2.session_seq
        WHERE f.event_type = 'purchase' AND f.ts > s2.t
        GROUP BY 1, 2
    ),
    c AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS c1,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS c2,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS c3)
    SELECT 1 AS step_index, 'view' AS step, c1 AS sessions_reached,
           ROUND(c1 / CAST(GREATEST(c1, 1) AS DOUBLE), 6) AS conversion_rate
    FROM c
    UNION ALL
    SELECT 2, 'click', c2,
           ROUND(c2 / CAST(GREATEST(c1, 1) AS DOUBLE), 6) FROM c
    UNION ALL
    SELECT 3, 'purchase', c3,
           ROUND(c3 / CAST(GREATEST(c1, 1) AS DOUBLE), 6) FROM c
    """,
)
def q_session_funnel(spark, sf_dir):
    """Within-session view→click→purchase funnel (30-min gap sessions):
    `operators/temporal.py session_funnel` — the conversion unit is the
    session, so cross-session step pairs never count. Sessionize's one
    key shuffle plus funnel_steps' conditional-min chain on the
    (user, session) composite."""
    from ningaloo_turtle_etl_spark.operators.temporal import session_funnel

    events = load_table(spark, "events", sf_dir)
    return session_funnel(
        events, ["view", "click", "purchase"], gap_seconds=1800,
        tiebreak_col="event_id",
    )


@register(
    "hard_negative_mining",
    f"""
    WITH pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               q.label AS label_a, c.label AS label_b,
               ROUND({_DOT} / (sqrt({_NORMSQ.format('c')})
                               * sqrt({_NORMSQ.format('q')})), 6) AS cosine
        FROM embeddings c, embeddings q
        WHERE q.vec_id < 120 AND c.label <> q.label
    )
    SELECT query_id, vec_id, label_a, label_b, cosine, rank FROM (
        SELECT query_id, vec_id, label_a, label_b, cosine,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY cosine DESC, vec_id) AS INT) AS rank
        FROM pairs
    ) WHERE rank <= 5
    """,
)
def q_hard_negative_mining(spark, sf_dir):
    """Contrastive hard negatives for a probe set (anchors = vec_id < 120):
    per anchor, the top-5 most cosine-similar vectors with a DIFFERENT
    label (`operators/similarity.py hard_negatives`) — the metric-learning
    pair miner and the standard label-noise probe. Anchors broadcast, the
    corpus streams map-side, WindowGroupLimit trims per-anchor top-k."""
    from ningaloo_turtle_etl_spark.operators.similarity import hard_negatives

    emb = load_table(spark, "embeddings", sf_dir)
    anchors = emb.filter(F.col("vec_id") < 120)
    return hard_negatives(emb, k=5, anchors=anchors)


@register(
    "minhash_incremental_near_dups",
    "SELECT id_a, id_b, jaccard FROM (" + _minhash_oracle_sql() + ") WHERE id_b >= 400",
)
def q_minhash_incremental_near_dups(spark, sf_dir):
    """Incremental MinHash dedup of a new batch (doc_id >= 400) against the
    existing corpus (`operators/dedup.py minhash_incremental_pairs`):
    new x old and new x new pairs only, never old x old, with bucket caps
    counted over the union so the output equals the full run restricted to
    new-id pairs — which is exactly how the oracle states it (the full
    corpus pipeline filtered to id_b >= 400)."""
    from ningaloo_turtle_etl_spark.operators.dedup import (
        minhash_incremental_pairs,
    )

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 500)
    old = docs.filter(F.col("doc_id") < 400)
    new = docs.filter(F.col("doc_id") >= 400)
    return minhash_incremental_pairs(
        old, new, shingle_n=3, threshold=0.5, hash_family="md5"
    )


@register(
    "cross_source_duplication",
    f"""
    WITH fp AS (
        SELECT substr(md5(lower(array_to_string(
                   list_slice({_TOKENS_RAW}, 1, 8), ' '))), 1, 16)
                   AS fingerprint,
               source, doc_id
        FROM documents
    ),
    per AS (
        SELECT fingerprint, source AS src, COUNT(*) AS n
        FROM fp GROUP BY 1, 2
    ),
    tot AS (SELECT fingerprint, SUM(n) AS n_total FROM per GROUP BY 1),
    dup AS (
        SELECT p.* FROM per p JOIN tot USING (fingerprint)
        WHERE n_total > 1
    ),
    pairs AS (
        SELECT a.src AS source_a, b.src AS source_b,
               CASE WHEN a.src = b.src THEN a.n ELSE a.n + b.n END AS nd
        FROM dup a JOIN dup b ON a.fingerprint = b.fingerprint
         AND (a.src < b.src OR (a.src = b.src AND a.n > 1))
    )
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(nd) AS BIGINT) AS n_docs
    FROM pairs GROUP BY 1, 2
    """,
)
def q_cross_source_duplication(spark, sf_dir):
    """Cross-source duplicate-leakage matrix
    (`operators/dedup.py cross_source_duplication`): per source pair, the
    duplicate clusters spanning both sources and the documents they hold —
    the are-these-feeds-rescraping-each-other diagnostic, here in its
    8-token shared-opening (boilerplate/template) variant so the synthetic
    corpus exercises real collisions. Fingerprint-keyed narrow shuffles;
    pair math on per-fingerprint source lists."""
    from ningaloo_turtle_etl_spark.operators.dedup import (
        cross_source_duplication,
    )

    docs = load_table(spark, "documents", sf_dir)
    return cross_source_duplication(docs, prefix_tokens=8)


@register(
    "boilerplate_removal",
    """
    WITH ex AS (
        SELECT doc_id AS id, source AS grp, i AS pos,
               array_to_string(list_slice(words, i * 2 + 1, i * 2 + 2), ' ')
                   AS seg
        FROM (SELECT doc_id, source, string_split(text, ' ') AS words
              FROM documents),
             unnest(range(CAST(ceil(len(words) / 2.0) AS BIGINT))) AS u(i)
    ),
    c AS (
        SELECT grp, seg, COUNT(DISTINCT id) AS nd FROM ex GROUP BY 1, 2
    ),
    m AS (
        SELECT ex.*, CASE WHEN c.nd >= 3 THEN 1 ELSE 0 END AS rm
        FROM ex JOIN c USING (grp, seg)
    )
    SELECT id AS doc_id, MIN(grp) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(rm) AS BIGINT) AS n_removed,
           ROUND(SUM(rm) / CAST(COUNT(*) AS DOUBLE), 6) AS removed_ratio,
           CAST(length(COALESCE(string_agg(CASE WHEN rm = 0 THEN seg END,
                                           ' ' ORDER BY pos), ''))
                AS BIGINT) AS cleaned_len,
           md5(COALESCE(string_agg(CASE WHEN rm = 0 THEN seg END,
                                   ' ' ORDER BY pos), '')) AS cleaned_md5
    FROM m GROUP BY id
    """,
)
def q_boilerplate_removal(spark, sf_dir):
    """CCNet/RefinedWeb-style cross-document segment dedup
    (`operators/curation.py boilerplate_segment_removal`): strip segments
    shared by >= 3 docs within a source — the template/banner scrubber
    that exact and near dedup leave behind. This corpus has no newlines,
    so the query runs the fixed-width 2-word-segment mode; the
    delimiter='\\n' line mode is pinned in tests/test_curation.py."""
    from ningaloo_turtle_etl_spark.operators.curation import (
        boilerplate_segment_removal,
    )

    docs = load_table(spark, "documents", sf_dir)
    return boilerplate_segment_removal(
        docs, "text", "doc_id", "source", seg_words=2, min_docs=3
    )


def _silhouette_oracle_sql() -> str:
    """DuckDB SQL replicating cell_silhouette over the frozen centroid
    fixture: squared distances in element order (same doubles as Spark's
    zip_with fold), argmin cell via list_position(list_min) (ties to the
    lowest index), nearest-other via min over the argmin-excised slices,
    then the per-cell mean fold."""
    fix = _semantic_centroid_fixture()
    dist_exprs = ", ".join(
        "list_sum(list_transform(list_zip(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + "]::DOUBLE[]), x -> (x[1]-x[2])*(x[1]-x[2])))"
        for c in fix["centroids"]
    )
    k = len(fix["centroids"])
    return f"""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    d AS (SELECT vec_id, [{dist_exprs}] AS dists FROM emb),
    a AS (
        SELECT vec_id, dists, list_min(dists) AS a2,
               list_position(dists, list_min(dists)) - 1 AS cell
        FROM d
    ),
    b AS (
        SELECT vec_id, cell, a2,
               list_min(list_concat(dists[1:cell],
                                    dists[cell + 2:{k}])) AS b2
        FROM a
    ),
    s AS (
        SELECT cell, a2,
               CASE WHEN greatest(sqrt(a2), sqrt(b2)) > 0
                    THEN (sqrt(b2) - sqrt(a2))
                         / greatest(sqrt(a2), sqrt(b2))
                    ELSE 0.0 END AS sil
        FROM b
    )
    SELECT CAST(cell AS INT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(AVG(sil), 6) AS mean_silhouette,
           ROUND(AVG(sqrt(a2)), 6) AS mean_intra_dist
    FROM s GROUP BY 1
    """


@register("semantic_cell_silhouette", _silhouette_oracle_sql())
def q_semantic_cell_silhouette(spark, sf_dir):
    """Per-cell centroid silhouette for the frozen SemDeDup/IVF blocking
    (`operators/similarity.py cell_silhouette`): which cells leak
    near-dups across their boundary / under-probe in IVF — the raise-
    n_centroids-or-nprobe diagnostic, computed in one map-only pass +
    one 16-cell aggregate."""
    import numpy as np

    from ningaloo_turtle_etl_spark.operators.similarity import (
        cell_silhouette,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    cents = np.asarray(_semantic_centroid_fixture()["centroids"], dtype=float)
    return cell_silhouette(emb, cents)


@register(
    "source_quality_scorecard",
    rf"""
    WITH base AS (
        SELECT source AS src, lang AS lg,
               substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))),
                      1, 16) AS fingerprint,
               length(text) AS nc,
               len({_TOKENS_RAW}) AS nt
        FROM documents
    ),
    stats AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(AVG(nc), 6) AS mean_chars,
               ROUND(AVG(nt), 6) AS mean_tokens,
               ROUND(1 - COUNT(DISTINCT fingerprint) * 1.0 / COUNT(*), 6)
                   AS dup_rate
        FROM base GROUP BY 1
    ),
    lc AS (
        SELECT src, lg, CAST(COUNT(*) AS BIGINT) AS c,
               row_number() OVER (PARTITION BY src
                                  ORDER BY COUNT(*) DESC, lg) AS rk
        FROM base GROUP BY src, lg
    )
    SELECT stats.src AS source, n_docs, mean_chars, mean_tokens, dup_rate,
           lc.lg AS top_lang,
           ROUND(lc.c * 1.0 / n_docs, 6) AS top_lang_share
    FROM stats JOIN lc ON lc.src = stats.src AND lc.rk = 1
    """,
)
def q_source_quality_scorecard(spark, sf_dir):
    """Per-source corpus health triage table
    (`operators/text.py source_scorecard`): volume, mean length, exact-dup
    rate, dominant language + purity — the rollup that says which feed
    deserves the deep diagnostic pass."""
    from ningaloo_turtle_etl_spark.operators.text import source_scorecard

    docs = load_table(spark, "documents", sf_dir)
    return source_scorecard(docs)


@register(
    "embedding_drift_by_label",
    """
    WITH ex AS (
        SELECT label AS grp,
               ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
                   % 2 AS half,
               r.i AS idx, CAST(embedding AS DOUBLE[])[r.i + 1] AS x
        FROM embeddings, unnest(range(len(embedding))) AS r(i)
    ),
    ds AS (
        SELECT grp, half, idx, SUM(x) AS s, COUNT(*) AS c
        FROM ex GROUP BY 1, 2, 3
    ),
    j AS (
        SELECT a.grp, a.c AS n_a, b.c AS n_b,
               a.s / a.c AS xa, b.s / b.c AS xb
        FROM ds a JOIN ds b ON a.grp = b.grp AND a.idx = b.idx
        WHERE a.half = 0 AND b.half = 1
    )
    SELECT grp AS label,
           CAST(MIN(n_a) AS BIGINT) AS n_a,
           CAST(MIN(n_b) AS BIGINT) AS n_b,
           ROUND(SUM(xa * xb) / (sqrt(SUM(xa * xa)) * sqrt(SUM(xb * xb))),
                 6) AS centroid_cosine,
           ROUND(sqrt(SUM((xa - xb) * (xa - xb))), 6) AS centroid_shift
    FROM j GROUP BY 1
    """,
)
def q_embedding_drift_by_label(spark, sf_dir):
    """Embedding-space drift per label between md5-parity halves of the
    corpus (`operators/similarity.py embedding_drift`): cosine + L2 shift
    between half-centroids — the semantic drift the vocabulary-level
    monitors can't see. Shuffle carries 2·groups·dim partial sums."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        embedding_drift,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    return embedding_drift(emb, "label")


@register(
    "domain_reweight_mix",
    """
    WITH l AS (
        SELECT source, 1.0 / ln(2.0 + length(text)) AS loss FROM documents
    ),
    g AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(AVG(loss), 6) AS mean_loss
        FROM l GROUP BY 1
    ),
    base AS (
        SELECT ROUND(AVG(mean_loss), 6) AS bl, COUNT(*) AS k FROM g
    ),
    r AS (
        SELECT g.*, bl, exp(1.0 * (mean_loss - bl)) / k AS wr
        FROM g, base
    )
    SELECT source, n_docs, mean_loss,
           ROUND(mean_loss - bl, 6) AS excess_loss,
           ROUND(wr / SUM(wr) OVER (), 6) AS weight
    FROM r
    """,
)
def q_domain_reweight_mix(spark, sf_dir):
    """DoReMi-flavored next-epoch domain weights
    (`operators/curation.py domain_reweight`): sources with above-baseline
    loss (here the deterministic short-doc proxy 1/ln(2+chars)) get
    exp(eta·excess) up-weighting from a uniform prior — the loop-closer
    feeding temperature_mix_sample's rates."""
    from ningaloo_turtle_etl_spark.operators.curation import domain_reweight

    docs = load_table(spark, "documents", sf_dir)
    loss = 1.0 / F.log(F.lit(2.0) + F.length("text"))
    return domain_reweight(docs, "source", loss, eta=1.0)


@register(
    "rolling_value_p95",
    """
    WITH hist AS (
        SELECT CAST(ts AS DATE) AS src,
               CAST(greatest(0, least(999,
                    floor((value - 0.0) * 1000.0 / 500.0))) AS BIGINT)
                   AS bin,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT src FROM hist),
    pairs AS (
        SELECT b.src AS d, a.src
        FROM days a JOIN days b
          ON a.src <= b.src AND date_diff('day', a.src, b.src) < 7
    ),
    merged AS (
        SELECT p.d, h.bin, SUM(h.n) AS n
        FROM pairs p JOIN hist h USING (src)
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT d, bin, n,
               SUM(n) OVER (PARTITION BY d ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(n) OVER (PARTITION BY d) AS tot
        FROM merged
    ),
    probs(p) AS (VALUES (0.5), (0.95)),
    sel AS (
        SELECT d, bin, n, cum, tot, p
        FROM cum CROSS JOIN probs
        WHERE cum >= p * tot AND (cum - n) < p * tot
    )
    SELECT d AS day, CAST(tot AS BIGINT) AS n_rows, p,
           ROUND(0.0 + (500.0 / 1000.0)
                 * (bin + (p * tot - (cum - n)) / n), 4) AS q_est
    FROM sel
    """,
)
def q_rolling_value_p95(spark, sf_dir):
    """Rolling 7-day p50/p95 of event value via mergeable fixed-grid
    histograms (`operators/sketches.py rolling_binned_quantile`):
    days x 1000 counters merge instead of re-sorting the raw window —
    `rolling_distinct_hll`'s state-moves-not-data argument applied to
    quantiles."""
    from ningaloo_turtle_etl_spark.operators.sketches import (
        rolling_binned_quantile,
    )

    ev = load_table(spark, "events", sf_dir)
    return rolling_binned_quantile(
        ev, "value", "ts", (0.5, 0.95), window_days=7,
        n_bins=1000, lo=0.0, hi=500.0,
    )


@register(
    "assoc_rules_copurchase",
    """
    WITH bi AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ),
    supp AS (
        SELECT it, CAST(COUNT(*) AS BIGINT) AS s FROM bi GROUP BY 1
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS n FROM bi),
    fi AS (SELECT it FROM supp WHERE s >= 2),
    kept AS (SELECT bi.bk, bi.it FROM bi JOIN fi USING (it)),
    capped AS (
        SELECT bk, it FROM (
            SELECT bk, it, COUNT(*) OVER (PARTITION BY bk) AS bn FROM kept
        ) WHERE bn <= 1000
    ),
    pairs AS (
        SELECT a.it AS item_a, b.it AS item_b,
               CAST(COUNT(*) AS BIGINT) AS ps
        FROM capped a JOIN capped b ON a.bk = b.bk AND a.it < b.it
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    directed AS (
        SELECT item_a AS antecedent, item_b AS consequent, ps FROM pairs
        UNION ALL
        SELECT item_b AS antecedent, item_a AS consequent, ps FROM pairs
    )
    SELECT d.antecedent, d.consequent, d.ps AS pair_support,
           sa.s AS antecedent_support, sb.s AS consequent_support,
           ROUND(d.ps * 1.0 / n, 6) AS support,
           ROUND(d.ps * 1.0 / sa.s, 6) AS confidence,
           ROUND((d.ps * 1.0 / sa.s) / (sb.s * 1.0 / n), 6) AS lift
    FROM directed d
    JOIN supp sa ON d.antecedent = sa.it
    JOIN supp sb ON d.consequent = sb.it
    CROSS JOIN nb
    ORDER BY antecedent, consequent
    """,
)
def q_assoc_rules_copurchase(spark, sf_dir):
    """Apriori association rules over co-purchase baskets
    (`operators/basket.py association_rules`): directed a -> b rules at
    pair min_support=2 with support / confidence / lift. The item dim is
    support-pruned BEFORE the per-basket pair blowup (downward closure),
    the pair join is basket-keyed so the quadratic term stays per-basket,
    and the rule metrics are two broadcast dim joins — the affinity
    companion to pagerank/kcore over the same facts."""
    from ningaloo_turtle_etl_spark.operators.basket import association_rules

    li = load_table(spark, "lineitem", sf_dir)
    return association_rules(
        li, "l_orderkey", "l_partkey", min_support=2
    ).orderBy("antecedent", "consequent")


def _bpe_fertility_oracle_sql(num_merges: int) -> str:
    """Fertility oracle: wrap the encode oracle's chain as a CTE and roll
    per-doc token counts up to language grain alongside word/char totals."""
    enc = _bpe_encode_oracle_sql(num_merges)
    idx = enc.rindex("SELECT d.doc_id")
    body = enc[:idx].rstrip().rstrip(",")
    final = enc[idx:]
    return f"""{body},
    enc_out AS ({final}),
    j AS (
        SELECT e.doc_id, e.n_tokens, d.lang, d.n_chars,
               len({_TOKENS}) AS n_words
        FROM enc_out e JOIN documents d USING (doc_id)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           ROUND(CASE WHEN SUM(n_words) > 0
                 THEN SUM(n_tokens) * 1.0 / SUM(n_words) ELSE 0.0 END, 6)
               AS fertility,
           ROUND(CASE WHEN SUM(n_tokens) > 0
                 THEN SUM(n_chars) * 1.0 / SUM(n_tokens) ELSE 0.0 END, 6)
               AS chars_per_token
    FROM j GROUP BY lang ORDER BY lang
    """


@register("tokenizer_fertility", _bpe_fertility_oracle_sql(8))
def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer EVALUATION: per-language fertility (subword tokens per
    word) and compression (chars per token) of the corpus-induced 8-merge
    BPE — the acceptance metrics a tokenizer change must publish before a
    retrain (high fertility on a language = that language pays more
    sequence length per word). Rolls the encode plan's per-doc counts up
    to language grain: the symbol dim still broadcasts, and the rollup
    adds one lang-keyed hash aggregate over doc-grain rows."""
    from ningaloo_turtle_etl_spark.operators.bpe import (
        encode_corpus,
        learn_bpe,
    )
    from ningaloo_turtle_etl_spark.operators.text import tokens

    docs = load_table(spark, "documents", sf_dir)
    merges, sym = learn_bpe(docs, num_merges=8)
    enc = encode_corpus(docs, sym, merges)
    j = enc.join(
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.size(tokens(F.lower(F.col("text")))).alias("n_words"),
        ),
        on="doc_id",
    )
    agg = j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_tokens",
        "n_chars",
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.col("n_tokens") / F.col("n_words"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("fertility"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_chars") / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("chars_per_token"),
    ).orderBy("lang")


def _ahash_oracle_sql(max_id: int = 250, edit_below: int = 60,
                      max_hamming: int = 8) -> str:
    """DuckDB replay of the aHash near-dup pipeline over the fake codec:
    same byte extraction and dims as _multimodal_oracle_sql, cells = the
    first least(64, w*h) cyclic pixels, integer-exact above-mean bits
    (cell*n > sum) packed into two 32-bit lanes, 4x16-bit band LSH join
    keyed by (n_cells, band, value), exact popcount-hamming verify."""
    return f"""
    WITH media AS (
        SELECT doc_id AS media_id, text FROM documents
        WHERE lang = 'en' AND doc_id < {max_id}
        UNION ALL
        SELECT doc_id + 100000,
               substr(text, 1, 10) || 'X' || substr(text, 12)
        FROM documents WHERE lang = 'en' AND doc_id < {edit_below}
    ),
    d AS (SELECT media_id, hex(encode(text)) AS hx FROM media),
    b AS (
        SELECT media_id, length(hx) // 2 AS nb,
               list_transform(range(length(hx) // 2),
                   i -> ('0x' || substr(hx, 2*i + 1, 2))::BIGINT) AS bytes
        FROM d
    ),
    dims AS (
        SELECT media_id, nb, bytes,
               CAST(CASE WHEN nb = 0 THEN 0
                    ELSE (list_sum(list_slice(bytes, 1, least(8, nb))) % 31) + 2
                    END AS BIGINT) AS w,
               CAST(CASE WHEN nb = 0 THEN 0
                    ELSE (list_sum(list_slice(bytes, nb - least(8, nb) + 1, nb))
                          % 23) + 2
                    END AS BIGINT) AS h
        FROM b
    ),
    cl AS (
        SELECT media_id, CAST(least(64, w * h) AS BIGINT) AS n,
               list_transform(range(CAST(least(64, w * h) AS BIGINT)),
                              j -> bytes[(j % nb) + 1]) AS cells
        FROM dims
    ),
    hashes AS (
        SELECT media_id, CAST(n AS INTEGER) AS n_cells,
               COALESCE(list_sum(list_transform(range(least(n, 32)),
                   j -> CASE WHEN cells[j+1] * n > list_sum(cells)
                             THEN (1::BIGINT << j) ELSE 0::BIGINT END)), 0)
                   AS h0,
               COALESCE(list_sum(list_transform(range(32, greatest(n, 32)),
                   j -> CASE WHEN cells[j+1] * n > list_sum(cells)
                             THEN (1::BIGINT << (j - 32)) ELSE 0::BIGINT END)),
                   0) AS h1
        FROM cl
    ),
    bands AS (
        -- only bands covering real cells (band*16 < n_cells): mirrors the
        -- operator's guard against structurally-zero upper-band cliques
        SELECT media_id, n_cells, band,
               CASE band WHEN 0 THEN h0 & 65535
                         WHEN 1 THEN (h0 >> 16) & 65535
                         WHEN 2 THEN h1 & 65535
                         ELSE (h1 >> 16) & 65535 END AS val
        FROM hashes, (SELECT unnest(range(4)) AS band)
        WHERE band * 16 < n_cells
    ),
    cand AS (
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        FROM bands a JOIN bands b
          ON a.n_cells = b.n_cells AND a.band = b.band AND a.val = b.val
         AND a.media_id < b.media_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(ha.h0, hb.h0))
                + bit_count(xor(ha.h1, hb.h1)) AS INTEGER) AS hamming
    FROM cand
    JOIN hashes ha ON cand.id_a = ha.media_id
    JOIN hashes hb ON cand.id_b = hb.media_id
    WHERE bit_count(xor(ha.h0, hb.h0)) + bit_count(xor(ha.h1, hb.h1))
          <= {max_hamming}
    ORDER BY id_a, id_b
    """


@register("image_ahash_near_dups", _ahash_oracle_sql())
def image_ahash_near_dups(spark, sf_dir):
    """Perceptual-hash near-duplicate image detection over binary media
    (`operators/multimodal.py image_ahash + ahash_near_dup_pairs`): the
    fake-codec corpus plus single-character-edited variants, aHash'd in
    the Arrow batch stage, then banded 16-bit hamming LSH and exact
    popcount verification — the image twin of the SimHash text family.
    Each edited variant pairs with its original at a small hamming
    distance; everything after the codec is pure Catalyst and the whole
    chain replays in DuckDB."""
    from ningaloo_turtle_etl_spark.operators.multimodal import (
        ahash_near_dup_pairs,
        image_ahash,
    )

    docs = load_table(spark, "documents", sf_dir).filter(
        (F.col("lang") == "en") & (F.col("doc_id") < 250)
    )
    orig = docs.select("doc_id", "text")
    edited = docs.filter(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 10),
            F.lit("X"),
            F.expr("substring(text, 12)"),
        ).alias("text"),
    )
    media = (
        orig.unionByName(edited)
        .select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("content"),
        )
    )
    hashes = image_ahash(media, decoder="fake")
    return ahash_near_dup_pairs(hashes, max_hamming=8).orderBy(
        "id_a", "id_b"
    )


@register(
    "jl_distortion_pairs",
    jl_distortion_oracle_sql(out_dim=16, seed=11, max_id=40),
)
def jl_distortion_pairs(spark, sf_dir):
    """Johnson-Lindenstrauss distance-preservation audit
    (`operators/similarity.py jl_project`, 64 -> 16 dims, seeded ±1/√k
    signs): every pairwise L2 distance among the first 40 vectors in
    original and projected space with the preservation ratio — the
    acceptance harness for choosing out_dim before the 4x-cheaper
    projected vectors feed IVF/PQ. Projection is map-only (one literal
    fold per output coordinate, zero shuffles at any corpus size); the
    bounded pairwise audit is acceptance-path only, like the ANN recall
    ground truths."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        _as_double,
        jl_project,
    )

    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 40)
    proj = jl_project(emb, out_dim=16, seed=11)
    both = emb.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).join(proj, "vec_id")
    a = both.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("jl").alias("ja"),
    )
    b = both.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("jl").alias("jb"),
    )
    sq = lambda x, y: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(x, y, lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
    d_orig = sq(F.col("va"), F.col("vb"))
    d_proj = sq(F.col("ja"), F.col("jb"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(d_orig, 6).alias("d_orig"),
        F.round(d_proj, 6).alias("d_proj"),
        F.round(
            F.when(d_orig > 0, d_proj / d_orig), 6
        ).alias("ratio"),
    ).orderBy("id_a", "id_b")


@register(
    "winnowing_quote_pairs",
    r"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        WHERE lang = 'en' AND doc_id < 200
        UNION ALL
        SELECT doc_id + 100000, substr(text, 1, 250)
        FROM documents WHERE lang = 'en' AND doc_id < 50
    ),
    toks AS (
        SELECT doc_id AS id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS t
        FROM corpus
    ),
    hs AS (
        SELECT id,
               CASE WHEN len(t) >= 3 THEN list_transform(
                   list_transform(range(greatest(len(t) - 3, 0) + 1),
                       i -> array_to_string(list_slice(t, i + 1, i + 3), ' ')),
                   g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)
               ELSE []::BIGINT[] END AS hs
        FROM toks
    ),
    sel AS (
        SELECT id,
               list_distinct(list_transform(
                   range(greatest(len(hs) - 4, 0) + 1),
                   p -> list_min(list_slice(hs, p + 1, p + 4)))) AS fps
        FROM hs
    ),
    fps0 AS (SELECT id, unnest(fps) AS fp FROM sel),
    fps AS (SELECT id, fp FROM fps0 WHERE fp IS NOT NULL),
    freq AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 500),
    kept AS (SELECT fps.id, fps.fp FROM fps JOIN freq USING (fp)),
    sizes AS (
        SELECT id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fps GROUP BY id
    ),
    shared AS (
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.id <> b.id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_shared,
           ROUND(n_shared * 1.0 / n_fp, 6) AS containment
    FROM shared JOIN sizes ON sizes.id = shared.id_a
    WHERE n_shared * 1.0 / n_fp >= 0.6
    ORDER BY id_a, id_b
    """,
)
def winnowing_quote_pairs(spark, sf_dir):
    """MOSS-style winnowing fingerprint containment over a quoting corpus
    (`operators/dedup.py winnowing_fingerprints +
    winnowing_containment_pairs`, k=3, window=4): each doc keeps the
    per-window minimum k-gram hash (guaranteeing any k+window-1-token
    shared run shares a fingerprint), a frequency cap drops boilerplate
    fingerprints, and the inverted fingerprint index itself generates
    candidates — no blocking column needed. The fixture plants 50
    truncated quoters (prefix of a real doc under a new id); each must
    surface as (quoter -> original) with high containment. Everything is
    md5-integer arithmetic, replayed list-for-list in DuckDB."""
    from ningaloo_turtle_etl_spark.operators.dedup import (
        winnowing_containment_pairs,
    )

    docs = load_table(spark, "documents", sf_dir).filter(
        (F.col("lang") == "en") & (F.col("doc_id") < 200)
    )
    quoters = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.substring("text", 1, 250).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(quoters)
    return winnowing_containment_pairs(
        corpus, k=3, window=4, threshold=0.6, max_fp_docs=500
    ).orderBy("id_a", "id_b")


@register(
    "bleu_rouge_by_source",
    r"""
    WITH corpus AS (
        SELECT doc_id AS _id, source,
               substr(text, 1, 300) || ' xyzzy' AS cand,
               text AS ref
        FROM documents
    ),
    tok AS (
        SELECT _id, source,
               list_filter(string_split_regex(cand, '\s+'), x -> x <> '') AS tc,
               list_filter(string_split_regex(ref,  '\s+'), x -> x <> '') AS tr
        FROM corpus
    ),
    nn AS (SELECT unnest(range(1, 5)) AS n),
    cg AS (
        SELECT _id, source, n, unnest(gs) AS gram FROM (
            SELECT _id, source, nn.n AS n,
                   CASE WHEN len(tc) >= nn.n
                        THEN list_transform(range(len(tc) - nn.n + 1),
                             i -> array_to_string(
                                 list_slice(tc, i + 1, i + nn.n), ' '))
                        ELSE [] END AS gs
            FROM tok CROSS JOIN nn
        )
    ),
    rg AS (
        SELECT _id, n, unnest(gs) AS gram FROM (
            SELECT _id, nn.n AS n,
                   CASE WHEN len(tr) >= nn.n
                        THEN list_transform(range(len(tr) - nn.n + 1),
                             i -> array_to_string(
                                 list_slice(tr, i + 1, i + nn.n), ' '))
                        ELSE [] END AS gs
            FROM tok CROSS JOIN nn
        )
    ),
    cc AS (
        SELECT _id, source, n, gram, COUNT(*) AS cc
        FROM cg GROUP BY 1, 2, 3, 4
    ),
    rc AS (SELECT _id, n, gram, COUNT(*) AS rc FROM rg GROUP BY 1, 2, 3),
    clip AS (
        SELECT cc.source, cc.n, SUM(least(cc.cc, rc.rc)) AS clip_n
        FROM cc JOIN rc
          ON cc._id = rc._id AND cc.n = rc.n AND cc.gram = rc.gram
        GROUP BY 1, 2
    ),
    cand_tot AS (SELECT source, n, SUM(cc) AS cand_n FROM cc GROUP BY 1, 2),
    ref_tot AS (
        SELECT t.source, rc.n, SUM(rc.rc) AS ref_n
        FROM rc JOIN (SELECT DISTINCT _id, source FROM tok) t
          ON rc._id = t._id
        GROUP BY 1, 2
    ),
    per_n AS (
        SELECT cand_tot.source, cand_tot.n, cand_n,
               COALESCE(clip_n, 0) AS clip_n, ref_n
        FROM cand_tot
        LEFT JOIN clip USING (source, n)
        LEFT JOIN ref_tot USING (source, n)
    ),
    wide AS (
        SELECT source,
               MAX(CASE WHEN n = 1 THEN clip_n * 1.0 / cand_n END) AS p1,
               MAX(CASE WHEN n = 2 THEN clip_n * 1.0 / cand_n END) AS p2,
               MAX(CASE WHEN n = 3 THEN clip_n * 1.0 / cand_n END) AS p3,
               MAX(CASE WHEN n = 4 THEN clip_n * 1.0 / cand_n END) AS p4,
               MAX(CASE WHEN n = 1 THEN clip_n * 1.0 / ref_n END) AS r1,
               MAX(CASE WHEN n = 2 THEN clip_n * 1.0 / ref_n END) AS r2
        FROM per_n GROUP BY 1
    ),
    lens AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(len(tc)) AS BIGINT) AS cand_tokens,
               CAST(SUM(len(tr)) AS BIGINT) AS ref_tokens
        FROM tok GROUP BY 1
    ),
    fin AS (
        SELECT lens.source, n_pairs, cand_tokens, ref_tokens,
               CASE WHEN cand_tokens = 0 THEN 0.0
                    WHEN cand_tokens >= ref_tokens THEN 1.0
                    ELSE exp(1.0 - ref_tokens * 1.0 / cand_tokens)
               END AS bp,
               p1, p2, p3, p4, r1, r2
        FROM lens JOIN wide USING (source)
    )
    SELECT source, n_pairs, cand_tokens, ref_tokens,
           ROUND(bp, 6) AS brevity_penalty,
           ROUND(COALESCE(p1, 0), 6) AS p1,
           ROUND(COALESCE(p2, 0), 6) AS p2,
           ROUND(COALESCE(p3, 0), 6) AS p3,
           ROUND(COALESCE(p4, 0), 6) AS p4,
           ROUND(COALESCE(r1, 0), 6) AS rouge1_recall,
           ROUND(COALESCE(r2, 0), 6) AS rouge2_recall,
           ROUND(CASE WHEN p1 > 0 AND p2 > 0 AND p3 > 0 AND p4 > 0
                      THEN bp * exp((ln(p1) + ln(p2) + ln(p3) + ln(p4)) / 4.0)
                      ELSE 0.0 END, 6) AS bleu
    FROM fin ORDER BY source
    """,
)
def bleu_rouge_by_source(spark, sf_dir):
    """Corpus BLEU-4 + ROUGE-1/2 recall per source
    (`operators/text.py corpus_bleu_rouge`): candidates are each
    document truncated to 300 chars plus one wrong token, references the
    full text — truncation drives the brevity penalty below 1, the bogus
    token pushes precision below 1, and every n-gram stage (clipped
    multiset counts, micro-averaged corpus totals, geometric-mean BLEU)
    replays list-for-list in DuckDB. The shape a distillation /
    rewrite pipeline reports nightly over generated-vs-reference pairs."""
    from ningaloo_turtle_etl_spark.operators.text import corpus_bleu_rouge

    docs = load_table(spark, "documents", sf_dir)
    paired = docs.select(
        "doc_id",
        "source",
        F.concat(F.substring("text", 1, 300), F.lit(" xyzzy")).alias("cand"),
        F.col("text").alias("ref"),
    )
    return corpus_bleu_rouge(
        paired, "cand", "ref", "doc_id", max_n=4, group_cols=["source"]
    ).orderBy("source")


@register(
    "bitext_margin_pairs",
    """
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        FROM embeddings
    ),
    a AS (SELECT vec_id, v FROM emb WHERE label % 2 = 0),
    b AS (SELECT vec_id, v FROM emb WHERE label % 2 = 1),
    scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_sum(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]))
               / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
                  * sqrt(list_sum(list_transform(b.v, x -> x*x)))) AS cos
        FROM a, b
    ),
    ranked AS (
        SELECT id_a, id_b, cos,
               ROW_NUMBER() OVER (PARTITION BY id_a
                                  ORDER BY cos DESC, id_b) AS ra,
               ROW_NUMBER() OVER (PARTITION BY id_b
                                  ORDER BY cos DESC, id_a) AS rb
        FROM scored
    ),
    dx AS (SELECT id_a, AVG(cos) AS dx FROM ranked WHERE ra <= 4 GROUP BY 1),
    dy AS (SELECT id_b, AVG(cos) AS dy FROM ranked WHERE rb <= 4 GROUP BY 1)
    SELECT r.id_a, r.id_b,
           ROUND(r.cos, 6) AS cosine,
           ROUND(r.cos / ((dx.dx + dy.dy) / 2.0), 6) AS margin
    FROM ranked r
    JOIN dx ON r.id_a = dx.id_a
    JOIN dy ON r.id_b = dy.id_b
    WHERE r.ra = 1 AND r.cos / ((dx.dx + dy.dy) / 2.0) >= 1.1
    ORDER BY r.id_a
    """,
)
def bitext_margin_pairs(spark, sf_dir):
    """Margin-criterion parallel-pair mining across the two label-parity
    halves of the embedding space (`operators/similarity.py
    margin_bitext_pairs`, k=4, margin >= 1.1): each even-label vector's
    best odd-label cosine candidate survives only when it clears the
    ratio margin against BOTH sides' local top-k neighborhood density —
    the Artetxe-Schwenk criterion that suppresses hub vectors absolute
    cosine over-mines. The exact verify stage of a bitext/aligned-pair
    mining pipeline; at corpus scale the ann_* blocked passes generate
    the candidates and this margin math is unchanged."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        margin_bitext_pairs,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    a = emb.filter(F.col("label") % 2 == 0)
    b = emb.filter(F.col("label") % 2 == 1)
    return margin_bitext_pairs(a, b, k=4, threshold=1.1).orderBy("id_a")


@register(
    "table_digest_by_flag",
    """
    WITH h AS (
        SELECT l_returnflag,
               ('0x' || substr(md5(concat_ws(chr(31),
                   coalesce(CAST(l_orderkey AS VARCHAR), chr(31) || chr(0)),
                   coalesce(CAST(l_partkey AS VARCHAR), chr(31) || chr(0)),
                   coalesce(CAST(l_suppkey AS VARCHAR), chr(31) || chr(0)),
                   coalesce(CAST(l_linenumber AS VARCHAR), chr(31) || chr(0)),
                   coalesce(l_returnflag, chr(31) || chr(0)),
                   coalesce(l_linestatus, chr(31) || chr(0))
               )), 1, 15))::BIGINT AS rh
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(rh) AS BIGINT) AS xor_digest,
           CAST(SUM(CAST(rh AS HUGEINT)) % 2305843009213693951 AS BIGINT)
               AS sum_digest
    FROM h GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def table_digest_by_flag(spark, sf_dir):
    """Order-independent per-partition content digest of lineitem's
    business key + status columns (`operators/delta.py dataset_digest`):
    bit_xor and overflow-safe modular-sum folds of the md5-60 row hash,
    plus the row count — the constant-width change-detection primitive
    that lets a 100 TB snapshot comparison short-circuit equal partitions
    before any row-level diff runs. The digest arithmetic (decimal-
    accumulated sum mod 2^61-1) replays bit-for-bit in DuckDB."""
    from ningaloo_turtle_etl_spark.operators.delta import dataset_digest

    li = load_table(spark, "lineitem", sf_dir)
    return dataset_digest(
        li,
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
        ],
        by=["l_returnflag"],
    ).orderBy("l_returnflag")


@register(
    "kneser_ney_lm_scores",
    rf"""
    WITH t AS (
        SELECT doc_id, {_TOKENS} AS toks
        FROM (SELECT doc_id, lower(text) AS text FROM documents)
    ),
    pairs AS (
        SELECT doc_id, pw.p AS prev, pw.w AS w FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                       i -> struct_pack(p := toks[i], w := toks[i+1]))) AS pw
            FROM t
        )
    ),
    bc AS MATERIALIZED (
        SELECT prev, w, COUNT(*) AS bc FROM pairs GROUP BY prev, w
    ),
    pst AS (
        SELECT prev, CAST(SUM(bc) AS BIGINT) AS pc, COUNT(*) AS n1p
        FROM bc GROUP BY prev
    ),
    cont AS (SELECT w, COUNT(*) AS cont FROM bc GROUP BY w),
    tot AS (
        SELECT (SELECT COUNT(*) FROM bc) AS b_types,
               (SELECT COUNT(DISTINCT w)
                FROM (SELECT unnest(toks) AS w FROM t)) AS v_size
    ),
    scored AS (
        SELECT p.doc_id,
               -ln(CASE WHEN COALESCE(s.pc, 0) > 0 THEN
                     greatest(CAST(COALESCE(b.bc, 0) AS DOUBLE) - 0.75, 0.0)
                       / CAST(s.pc AS DOUBLE)
                     + 0.75 * CAST(s.n1p AS DOUBLE) / CAST(s.pc AS DOUBLE)
                       * (CAST(COALESCE(c.cont, 0) + 1 AS DOUBLE)
                          / CAST(tot.b_types + tot.v_size AS DOUBLE))
                   ELSE CAST(COALESCE(c.cont, 0) + 1 AS DOUBLE)
                        / CAST(tot.b_types + tot.v_size AS DOUBLE)
                   END) AS nll
        FROM pairs p
        LEFT JOIN bc b ON p.prev = b.prev AND p.w = b.w
        LEFT JOIN pst s ON p.prev = s.prev
        LEFT JOIN cont c ON p.w = c.w, tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(nll), 6) AS avg_nll
    FROM scored GROUP BY doc_id
    """,
)
def q_kneser_ney_lm_scores(spark, sf_dir):
    """Kneser-Ney bigram perplexity scoring (`operators/text.py
    kneser_ney_bigram_scores`, D=0.75) — the KenLM-default smoothing one
    rung above the JM mixture (`bigram_lm_scores`): absolute-discounted
    bigram mass backs off to CONTINUATION counts (how many distinct left
    contexts a word follows), the fix for frequent-but-context-bound
    words. Every KN statistic is an aggregate of the bigram-type table,
    and the whole fit+score replays in DuckDB."""
    from ningaloo_turtle_etl_spark.operators.text import (
        kneser_ney_bigram_scores,
    )

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.lower(F.col("text"))
    )
    return kneser_ney_bigram_scores(docs, discount=0.75)


def _lpa_oracle_sql(rounds: int = 8, min_shared: int = 2) -> str:
    """Unrolled synchronous-LPA oracle: the support-thresholded symmetric
    co-purchase edge list, then one count→argmax CTE per round (same
    MATERIALIZED discipline as the k-core unroll — each round's labels
    feed one join, but DuckDB would still inline the chain)."""
    parts = [
        f"""
    WITH eo AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS s FROM lineitem
    ),
    e AS MATERIALIZED (
        SELECT a.s AS a, b.s AS b
        FROM eo a JOIN eo b ON a.ok = b.ok AND a.s <> b.s
        GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT a AS node, a AS label FROM e
    )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    l{i} AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT e.a AS node, l.label,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.a
                       ORDER BY COUNT(*) DESC, l.label
                   ) AS rk
            FROM e JOIN l{i - 1} l ON e.b = l.node
            GROUP BY e.a, l.label
        ) WHERE rk = 1
    )"""
        )
    parts.append(
        f"""
    SELECT node, label AS community
    FROM l{rounds} ORDER BY node"""
    )
    return "".join(parts)


@register("lpa_copurchase_communities", _lpa_oracle_sql(8, 2))
def lpa_copurchase_communities(spark, sf_dir):
    """Synchronous label-propagation communities over the support-2
    co-purchase graph (`operators/graph.py
    label_propagation_communities`, 8 fixed rounds): parts adopt the
    most-frequent neighbor label (ties to the smallest), finding DENSE
    purchase affinity groups inside the giant connected component —
    the community structure connected_components (which merges anything
    touching) and k-core (which only filters) cannot express. The oracle
    unrolls the same synchronous rounds as materialized CTEs."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        copurchase_edges,
        label_propagation_communities,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = copurchase_edges(li, min_shared=2)
    return label_propagation_communities(edges, rounds=8).orderBy("node")


def _rbo_oracle_sql(p: float = 0.9, depth: int = 10) -> str:
    """LSH-vs-exact RBO oracle: both ranking halves are the existing ANN
    oracles; each shared (query, item) contributes the literal
    coefficient c_{max(ra, rb)} — the same doubles the Spark side embeds
    (rbo_coefficients)."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        rbo_coefficients,
    )
    from ningaloo_turtle_etl_spark.queries.ann_oracles import (
        brute_oracle_sql,
        lsh_oracle_sql,
    )

    coeffs = rbo_coefficients(p, depth)
    carr = "[" + ", ".join(repr(float(c)) for c in coeffs) + "]"
    return f"""
    WITH approx AS ({lsh_oracle_sql(k=depth)}),
    exact AS ({brute_oracle_sql(k=depth)}),
    shared AS (
        SELECT a.query_id,
               ({carr}::DOUBLE[])[greatest(a.rank, e.rank)] AS c
        FROM approx a JOIN exact e
          ON a.query_id = e.query_id AND a.vec_id = e.vec_id
        WHERE a.rank <= {depth} AND e.rank <= {depth}
    ),
    per_q AS (
        SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_shared,
               SUM(c) AS s
        FROM shared GROUP BY query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
           ROUND({1.0 - p!r} * COALESCE(s, 0.0), 6) AS rbo
    FROM (SELECT DISTINCT query_id FROM approx) q
    LEFT JOIN per_q ON q.query_id = per_q.query_id
    ORDER BY q.query_id
    """


@register("ann_lsh_rbo", _rbo_oracle_sql(0.9, 10))
def ann_lsh_rbo(spark, sf_dir):
    """Top-weighted ranking agreement of the LSH ANN index against the
    exact cosine ranking (`operators/similarity.py rank_biased_overlap`,
    p=0.9, depth=10): the acceptance metric recall@k cannot express —
    recall counts hits anywhere in the top-k equally, while RBO pays
    more for agreement at the TOP, exactly where a downstream re-ranking
    budget spends. Completes the ANN acceptance suite (recall trio +
    rank-order agreement); coefficients are shared literals so the
    number is hash-proven."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
        rank_biased_overlap,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") < 5)
    approx = lsh_topk(emb, qs, k=10, bits=6, tables=6)
    exact = cosine_topk(emb, qs, k=10)
    return rank_biased_overlap(approx, exact, p=0.9, depth=10).orderBy(
        "query_id"
    )


@register(
    "zorder_layout_buckets",
    """
    WITH q AS (
        SELECT l_orderkey, l_partkey, l_suppkey,
               least(greatest(CAST(floor((l_partkey - 1.0) / 2000.0 * 256.0)
                                   AS BIGINT), 0), 255) AS qp,
               least(greatest(CAST(floor((l_suppkey - 1.0) / 100.0 * 256.0)
                                   AS BIGINT), 0), 255) AS qs
        FROM lineitem
    ),
    z AS (
        SELECT l_partkey, l_suppkey,
               (((qp >> 0) & 1) << 0) + (((qs >> 0) & 1) << 1)
             + (((qp >> 1) & 1) << 2) + (((qs >> 1) & 1) << 3)
             + (((qp >> 2) & 1) << 4) + (((qs >> 2) & 1) << 5)
             + (((qp >> 3) & 1) << 6) + (((qs >> 3) & 1) << 7)
             + (((qp >> 4) & 1) << 8) + (((qs >> 4) & 1) << 9)
             + (((qp >> 5) & 1) << 10) + (((qs >> 5) & 1) << 11)
             + (((qp >> 6) & 1) << 12) + (((qs >> 6) & 1) << 13)
             + (((qp >> 7) & 1) << 14) + (((qs >> 7) & 1) << 15)
               AS zkey
        FROM q
    )
    SELECT zkey >> 10 AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS part_lo,
           CAST(MAX(l_partkey) AS BIGINT) AS part_hi,
           CAST(MIN(l_suppkey) AS BIGINT) AS supp_lo,
           CAST(MAX(l_suppkey) AS BIGINT) AS supp_hi
    FROM z GROUP BY 1 ORDER BY 1
    """,
)
def zorder_layout_buckets(spark, sf_dir):
    """Z-order (Morton) layout buckets over lineitem's (partkey, suppkey)
    (`operators/scale.py quantize_minmax + zorder_key`, 8 bits/dim):
    each zkey-range bucket — the unit a clustered write would put in one
    file — carries BOTH dimensions' min/max spans, demonstrating the
    locality that makes range predicates on EITHER key prune files
    (test-pinned: per-bucket spans are a small fraction of the domain,
    which no single-column sort gives the trailing key). Pure integer
    bit arithmetic, replayed exactly in DuckDB."""
    from ningaloo_turtle_etl_spark.operators.scale import (
        quantize_minmax,
        zorder_key,
    )

    li = load_table(spark, "lineitem", sf_dir)
    q = li.select(
        "l_partkey",
        "l_suppkey",
        quantize_minmax("l_partkey", 1.0, 2001.0, bits=8).alias("qp"),
        quantize_minmax("l_suppkey", 1.0, 101.0, bits=8).alias("qs"),
    )
    z = q.select(
        "l_partkey",
        "l_suppkey",
        zorder_key([F.col("qp"), F.col("qs")], bits=8).alias("zkey"),
    )
    return (
        z.groupBy(F.shiftright("zkey", 10).alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").cast("long").alias("part_lo"),
            F.max("l_partkey").cast("long").alias("part_hi"),
            F.min("l_suppkey").cast("long").alias("supp_lo"),
            F.max("l_suppkey").cast("long").alias("supp_hi"),
        )
        .orderBy("zbucket")
    )


def _hilbert_oracle_sql(bits: int = 6) -> str:
    """Chained-CTE replay of the unrolled Hilbert xy2d state machine
    (`operators/scale.py hilbert_key`): one CTE per level computing the
    next (hx, hy, digit-accumulated hd) under fresh column names — no
    lateral-alias ambiguity — from 6-bit quantized (l_partkey, l_suppkey)."""
    ctes = [
        """
    q AS (
        SELECT least(greatest(CAST(floor((l_partkey - 1.0) / 2000.0 * 64.0)
                                   AS BIGINT), 0), 63) AS hx0,
               least(greatest(CAST(floor((l_suppkey - 1.0) / 100.0 * 64.0)
                                   AS BIGINT), 0), 63) AS hy0,
               CAST(0 AS BIGINT) AS hd0,
               l_partkey, l_suppkey
        FROM lineitem
    )"""
    ]
    prev = "q"
    for idx, i in enumerate(range(bits - 1, -1, -1)):
        s = 1 << i
        a, b = idx, idx + 1
        ctes.append(f"""
    h{b} AS (
        SELECT l_partkey, l_suppkey,
               CASE WHEN hy{a} >= {s} THEN hx{a} & {s - 1}
                    WHEN hx{a} >= {s} THEN {s - 1} - (hy{a} & {s - 1})
                    ELSE hy{a} & {s - 1} END AS hx{b},
               CASE WHEN hy{a} >= {s} THEN hy{a} & {s - 1}
                    WHEN hx{a} >= {s} THEN {s - 1} - (hx{a} & {s - 1})
                    ELSE hx{a} & {s - 1} END AS hy{b},
               hd{a} + {s * s} * (CASE WHEN hx{a} >= {s} AND hy{a} >= {s} THEN 2
                                       WHEN hx{a} >= {s} THEN 3
                                       WHEN hy{a} >= {s} THEN 1
                                       ELSE 0 END) AS hd{b}
        FROM {prev})""")
        prev = f"h{b}"
    return f"""
    WITH {','.join(ctes)}
    SELECT hd{bits} >> 6 AS hbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS part_lo,
           CAST(MAX(l_partkey) AS BIGINT) AS part_hi,
           CAST(MIN(l_suppkey) AS BIGINT) AS supp_lo,
           CAST(MAX(l_suppkey) AS BIGINT) AS supp_hi
    FROM {prev} GROUP BY 1 ORDER BY 1
    """


@register("hilbert_layout_buckets", _hilbert_oracle_sql(6))
def hilbert_layout_buckets(spark, sf_dir):
    """Hilbert-curve layout buckets over lineitem's (partkey, suppkey)
    (`operators/scale.py quantize_minmax + hilbert_key`, 6 bits/dim) —
    the locality-preserving twin of zorder_layout_buckets: consecutive
    key values are always grid NEIGHBORS (pinned by the adjacency
    property test), so each 64-key bucket is a connected curve segment
    and its per-dimension min/max spans run tighter than Morton's
    Z-jumps for the same bucket count — tighter spans = more files
    pruned by a range predicate at 100 TB. Pure unrolled integer
    Catalyst arithmetic, no UDF; the oracle replays the same six levels
    as chained CTEs."""
    from ningaloo_turtle_etl_spark.operators.scale import (
        quantize_minmax,
        with_hilbert_key,
    )

    li = load_table(spark, "lineitem", sf_dir)
    q = li.select(
        "l_partkey",
        "l_suppkey",
        quantize_minmax("l_partkey", 1.0, 2001.0, bits=6).alias("qp"),
        quantize_minmax("l_suppkey", 1.0, 101.0, bits=6).alias("qs"),
    )
    z = with_hilbert_key(q, "qp", "qs", bits=6, name="hkey")
    return (
        z.groupBy(F.shiftright("hkey", 6).alias("hbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").cast("long").alias("part_lo"),
            F.max("l_partkey").cast("long").alias("part_hi"),
            F.min("l_suppkey").cast("long").alias("supp_lo"),
            F.max("l_suppkey").cast("long").alias("supp_hi"),
        )
        .orderBy("hbucket")
    )


@register(
    "ppjoin_jaccard_pairs",
    rf"""
    WITH sets AS (
        SELECT doc_id AS id, list_distinct({_TOKENS}) AS s
        FROM (SELECT doc_id, lower(text) AS text FROM documents
              WHERE doc_id < 150)
    ),
    sized AS (SELECT id, s, len(s) AS n FROM sets WHERE len(s) > 0),
    tok AS (SELECT id, n, unnest(s) AS tk FROM sized),
    freq AS (SELECT tk, COUNT(*) AS f FROM tok GROUP BY tk),
    ranked AS (
        SELECT tok.id, tok.n, tok.tk,
               ROW_NUMBER() OVER (PARTITION BY tok.id
                                  ORDER BY freq.f, tok.tk) AS rn
        FROM tok JOIN freq ON tok.tk = freq.tk
    ),
    prefix AS (
        SELECT id, n, tk FROM ranked
        WHERE rn <= n - CAST(ceil(0.5 * n) AS BIGINT) + 1
    ),
    cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM prefix a JOIN prefix b ON a.tk = b.tk AND a.id < b.id
        WHERE b.n >= 0.5 * a.n AND b.n <= a.n / 0.5
    ),
    verified AS (
        SELECT c.id_a, c.id_b,
               CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
                 / (x.n + y.n - len(list_intersect(x.s, y.s))) AS jac
        FROM cand c
        JOIN sized x ON c.id_a = x.id
        JOIN sized y ON c.id_b = y.id
    )
    SELECT id_a, id_b, ROUND(jac, 6) AS jaccard
    FROM verified WHERE jac >= 0.5
    ORDER BY id_a, id_b
    """,
)
def ppjoin_jaccard_pairs(spark, sf_dir):
    """Exact token-set Jaccard self-join by PPJoin prefix filtering
    (`operators/dedup.py ppjoin_pairs`, t=0.5): pairs must share one of
    each side's rarest-prefix tokens, pass the length gate, then verify
    exact Jaccard — deterministic 100% recall without MinHash's banded
    probability or ngram_jaccard's blocking column, at prefix-join cost.
    Brute-force completeness is pinned in tests/test_llm_ops.py."""
    from ningaloo_turtle_etl_spark.operators.dedup import ppjoin_pairs

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 150
    )
    return ppjoin_pairs(docs, threshold=0.5).orderBy("id_a", "id_b")


def _kmeans_oracle_sql(k: int = 8, iterations: int = 3, dim: int = 64) -> str:
    """Unrolled Lloyd oracle (the pagerank/BPE chaining trick): one
    assign→sum→recenter CTE triple per iteration. Every number is exact
    integer micro arithmetic — quantize once, integer squared-distance
    sums, exact half-up recentering floor(s/n + 1/2) = (2s+n) // (2n)
    via the explicit floor-div idiom (r14, matching the engine and the
    trained-ANN oracle; the old CAST(s AS DOUBLE)/n form was only exact
    below the 2^53 cliff) — so the fit replays bit-for-bit."""
    d2 = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "i -> (v.vm[i] - c.c[i]) * (v.vm[i] - c.c[i])))"
    )
    parts = [
        f"""
    vm AS (
        SELECT vec_id AS id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS vm
        FROM embeddings
    ),
    c0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cluster, vm AS c
        FROM (SELECT id, vm FROM vm ORDER BY id LIMIT {k})
    )"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f""",
    a{t} AS (
        SELECT id, vm, cluster, dist,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY dist, cluster) AS rn
        FROM (SELECT v.id, v.vm, c.cluster, {d2} AS dist
              FROM vm v CROSS JOIN c{t - 1} c)
    ),
    s{t} AS (
        SELECT cluster, i, CAST(SUM(vm[i]) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM a{t}, range(1, {dim + 1}) t(i)
        WHERE rn = 1 GROUP BY cluster, i
    ),
    c{t} AS (
        SELECT p.cluster, COALESCE(u.c, p.c) AS c
        FROM c{t - 1} p LEFT JOIN (
            SELECT cluster,
                   list(CAST((2*s + n
                              - (((2*s + n) % (2*n)) + 2*n) % (2*n))
                             // (2*n) AS BIGINT)
                        ORDER BY i) AS c
            FROM s{t} GROUP BY cluster
        ) u USING (cluster)
    )"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f""",
    af AS (
        SELECT id, cluster, dist,
               ROW_NUMBER() OVER (PARTITION BY id
                                  ORDER BY dist, cluster) AS rn
        FROM (SELECT v.id, c.cluster, {d2} AS dist
              FROM vm v CROSS JOIN c{iterations} c)
    )
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(CAST(SUM(dist) AS BIGINT) / 1e12, 6) AS inertia
    FROM af WHERE rn = 1 GROUP BY cluster ORDER BY cluster"""
    )


@register("kmeans_embedding_clusters", _kmeans_oracle_sql(8, 3, 64))
def kmeans_embedding_clusters(spark, sf_dir):
    """Distributed Lloyd k-means over the embeddings table
    (`operators/similarity.py kmeans_lloyd`, k=8, 3 iterations,
    smallest-id init): the full-corpus clustering stage SemDeDup /
    diversity sampling / IVF builds sit on — never sampled, one map-side
    scan per assignment, one combined aggregate per update, all exact
    integer micro arithmetic. The oracle unrolls all three
    assign→sum→recenter rounds into chained CTEs and replays the fit
    bit-for-bit (reference analog: the reference has no clustering; this
    is the large-corpus extension its spatial PCNM dedup gestures at,
    `spatial_modelling.Rmd:196-215`)."""
    from ningaloo_turtle_etl_spark.operators.similarity import kmeans_lloyd

    emb = load_table(spark, "embeddings", sf_dir)
    return kmeans_lloyd(emb, k=8, iterations=3).orderBy("cluster")


def _hits_oracle_sql(iterations: int = 5) -> str:
    """Unrolled HITS oracle: two propagate→total→requantize CTE triples
    per round, all exact-integer (the (2·raw·1e6 + tot) // (2·tot)
    half-up division mirrors the operator's `div` exactly)."""
    parts = [
        """
    eo AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS src
           FROM lineitem),
    ed AS MATERIALIZED (
        SELECT DISTINCT a.src AS src, b.src AS dst
        FROM eo a JOIN eo b ON a.ok = b.ok AND a.src <> b.src
    ),
    nodes AS MATERIALIZED (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
    h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS m FROM nodes)"""
    ]
    for t in range(1, iterations + 1):
        for tag, kin, kout in (("a", "src", "dst"), ("h", "dst", "src")):
            prev = f"h{t - 1}" if tag == "a" else f"a{t}"
            parts.append(
                f""",
    {tag}r{t} AS MATERIALIZED (
        SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS raw
        FROM nodes n LEFT JOIN (
            SELECT ed.{kout} AS node, CAST(SUM(v.m) AS BIGINT) AS s
            FROM ed JOIN {prev} v ON ed.{kin} = v.node
            GROUP BY ed.{kout}
        ) s ON n.node = s.node
    ),
    {tag}t{t} AS (SELECT CAST(SUM(raw) AS BIGINT) AS tot FROM {tag}r{t}),
    {tag}{t} AS MATERIALIZED (
        SELECT node,
               CASE WHEN tot > 0
                    THEN (2 * raw * 1000000 + tot) // (2 * tot)
                    ELSE CAST(0 AS BIGINT) END AS m
        FROM {tag}r{t}, {tag}t{t}
    )"""
            )
    return (
        "WITH "
        + "".join(parts)
        + f"""
    SELECT n.node, ROUND(a.m / 1e6, 6) AS auth, ROUND(h.m / 1e6, 6) AS hub
    FROM nodes n
    JOIN a{iterations} a ON n.node = a.node
    JOIN h{iterations} h ON n.node = h.node
    ORDER BY n.node"""
    )


@register("hits_copurchase", _hits_oracle_sql(5))
def hits_copurchase(spark, sf_dir):
    """HITS hubs & authorities (5 synchronous rounds, integer-micro
    normalization) over the part co-purchase graph
    (`operators/graph.py hits_scores`): separates basket ANCHORS
    (authorities) from basket BINDERS (hubs), the two roles pagerank's
    single endorsement score mixes. The oracle unrolls all ten
    half-steps into chained exact-integer CTEs."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        copurchase_edges,
        hits_scores,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = copurchase_edges(li)
    return hits_scores(edges, iterations=5).orderBy("node")


@register(
    "adamic_adar_part_links",
    """
    WITH eo AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS src FROM lineitem
    ),
    e2 AS MATERIALIZED (
        SELECT a.src AS a, b.src AS b
        FROM eo a JOIN eo b ON a.ok = b.ok AND a.src <> b.src
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    und AS MATERIALIZED (SELECT DISTINCT a, b FROM e2),
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY a),
    centers AS MATERIALIZED (
        SELECT und.a AS z, und.b AS nb,
               CAST(round(1e6 / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS w
        FROM und JOIN deg ON und.a = deg.a
        WHERE deg BETWEEN 2 AND 1000
    ),
    scored AS (
        SELECT x.nb AS id_a, y.nb AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM(x.w) AS BIGINT) AS wm
        FROM centers x JOIN centers y
          ON x.z = y.z AND x.nb < y.nb
        GROUP BY 1, 2
    ),
    pred AS (
        SELECT s.id_a, s.id_b, s.n_common, s.wm
        FROM scored s LEFT JOIN und ex
          ON s.id_a = ex.a AND s.id_b = ex.b
        WHERE ex.a IS NULL
    )
    SELECT id_a, id_b, n_common, ROUND(wm / 1e6, 6) AS aa_score
    FROM pred ORDER BY aa_score DESC, id_a, id_b LIMIT 200
    """,
)
def adamic_adar_part_links(spark, sf_dir):
    """Adamic-Adar link prediction over the support-2 part co-purchase
    graph (`operators/graph.py adamic_adar_links`): the top-200
    NON-adjacent part pairs most likely to co-occur next, scored by
    selectivity-weighted common neighbors — wedge weights quantize to
    integer micros before the per-pair sum, wedge centers are capped at
    degree 1000."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        adamic_adar_links,
        copurchase_edges,
    )

    li = load_table(spark, "lineitem", sf_dir)
    edges = copurchase_edges(li, min_shared=2)
    return (
        adamic_adar_links(edges, max_degree=1000)
        .orderBy(F.desc("aa_score"), "id_a", "id_b")
        .limit(200)
    )


@register(
    "good_turing_token_counts",
    rf"""
    WITH toks AS (SELECT {_TOKENS} AS t FROM documents),
    tok AS (
        SELECT unnest(CASE WHEN len(t) >= 3 THEN
            list_transform(range(1, len(t) - 3 + 2),
                i -> array_to_string(list_slice(t, i, i + 2), ' '))
            ELSE []::VARCHAR[] END) AS tk
        FROM toks
    ),
    tf AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS r FROM tok GROUP BY tk),
    nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tf GROUP BY r),
    total AS (SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_total FROM nr),
    body AS (
        SELECT nr.r, nr.n_r,
               ROUND((nr.r + 1) * nx.n_r * 1.0 / nr.n_r, 6) AS r_star,
               ROUND(nr.r * nr.n_r * 1.0 / total.n_total, 6) AS gt_mass
        FROM nr LEFT JOIN nr nx ON nx.r = nr.r + 1
        CROSS JOIN total
        WHERE nr.r <= 10
    ),
    zero AS (
        SELECT CAST(0 AS BIGINT) AS r, CAST(0 AS BIGINT) AS n_r,
               ROUND(nr.n_r * 1.0 / total.n_total, 6) AS r_star,
               ROUND(nr.n_r * 1.0 / total.n_total, 6) AS gt_mass
        FROM nr CROSS JOIN total WHERE nr.r = 1
    )
    SELECT * FROM zero UNION ALL SELECT * FROM body ORDER BY r
    """,
)
def good_turing_token_counts(spark, sf_dir):
    """Good-Turing count-of-counts re-estimation over the corpus word
    TRIGRAMS (`operators/text.py good_turing_counts`, n=3, r ≤ 10): the
    adjusted counts r* = (r+1)N_{r+1}/N_r and the unseen mass N_1/N — the
    smoothing diagnostic under Katz backoff, all exact-integer until one
    final division per row. Trigram grain because the synthetic corpus's
    unigram vocabulary is tiny (31 types, min count 26 at sf0.01 — no GT
    regime); trigrams have the genuine power-law tail GT exists for."""
    from ningaloo_turtle_etl_spark.operators.text import good_turing_counts

    docs = load_table(spark, "documents", sf_dir)
    return good_turing_counts(docs, max_r=10, ngram_n=3).orderBy("r")


@register(
    "source_lang_diversity",
    """
    WITH cell AS (
        SELECT source AS g, lang AS cl, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM cell GROUP BY g),
    terms AS (
        SELECT cell.g, tot.n,
               CAST(round(-(cell.c * 1.0 / tot.n)
                          * ln(cell.c * 1.0 / tot.n) * 1e9) AS BIGINT) AS hm,
               CAST(round((cell.c * 1.0 / tot.n) * (cell.c * 1.0 / tot.n)
                          * 1e9) AS BIGINT) AS sm
        FROM cell JOIN tot USING (g)
    ),
    agg AS (
        SELECT g, MAX(n) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(hm) AS BIGINT) AS h_nano,
               CAST(SUM(sm) AS BIGINT) AS s_nano
        FROM terms GROUP BY g
    )
    SELECT g AS source, n_rows, n_classes,
           ROUND(h_nano / 1e9, 6) AS shannon_h,
           ROUND(exp(h_nano / 1e9), 6) AS effective_classes,
           ROUND(1.0 - s_nano / 1e9, 6) AS simpson,
           ROUND(s_nano / 1e9, 6) AS hhi
    FROM agg ORDER BY source
    """,
)
def source_lang_diversity(spark, sf_dir):
    """Language-diversity profile per source (`operators/curation.py
    class_diversity_profile`): Shannon entropy / effective languages /
    Simpson / HHI of each source's language mix — the corpus-composition
    dashboard row; per-class terms quantize to integer nanos before the
    per-group sum."""
    from ningaloo_turtle_etl_spark.operators.curation import (
        class_diversity_profile,
    )

    docs = load_table(spark, "documents", sf_dir)
    return class_diversity_profile(docs, "source", "lang").orderBy("source")


@register(
    "compaction_bin_plan",
    """
    WITH files AS (
        SELECT l_returnflag AS rf,
               CAST(floor(epoch(CAST(l_shipdate AS TIMESTAMP)) / 2592000)
                    AS BIGINT) AS age_bucket,
               CAST(COUNT(*) AS BIGINT) * 200 AS file_bytes
        FROM lineitem GROUP BY 1, 2
    ),
    binned AS (
        SELECT rf, age_bucket, file_bytes,
               CAST(floor(COALESCE(SUM(file_bytes) OVER (
                   ORDER BY rf, age_bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   / 2000000.0) AS BIGINT) AS bin
        FROM files
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(file_bytes) AS BIGINT) AS total_bytes,
           ROUND(AVG(file_bytes), 2) AS avg_bytes,
           MIN(rf) AS first_key, MAX(rf) AS last_key
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def compaction_bin_plan(spark, sf_dir):
    """Small-file compaction plan over a synthetic file inventory derived
    from lineitem's (returnflag, ship-month) cells (`operators/scale.py
    compaction_bins`, ~2 MB target): the OPTIMIZE-style cumulative-size
    split that rewrites a long tail of small files into near-target bins
    while preserving the layout-key order (pairs with
    zorder_layout_buckets)."""
    from ningaloo_turtle_etl_spark.operators.scale import compaction_bins

    li = load_table(spark, "lineitem", sf_dir)
    files = li.select(
        F.col("l_returnflag").alias("rf"),
        F.floor(
            F.unix_timestamp(F.col("l_shipdate").cast("timestamp"))
            / F.lit(2592000)
        )
        .cast("long")
        .alias("age_bucket"),
    ).groupBy("rf", "age_bucket").agg(
        (F.count(F.lit(1)) * 200).cast("long").alias("file_bytes")
    )
    return compaction_bins(
        files, "file_bytes", ["rf", "age_bucket"], target_size=2_000_000
    )


def _rake_oracle_sql(top_n: int = 50, max_len: int = 4) -> str:
    from ningaloo_turtle_etl_spark.operators.text import RAKE_STOPWORDS

    stop = "|".join(RAKE_STOPWORDS)
    delim = rf"(?i)([^a-z0-9\s]+|\b(?:{stop})\b)"
    return rf"""
    WITH ph0 AS (
        SELECT unnest(string_split_regex(
            regexp_replace(lower(text), '{delim}', '|', 'g'), '\|')) AS p
        FROM documents
    ),
    phx AS (
        SELECT phrase, string_split(phrase, ' ') AS words,
               len(string_split(phrase, ' ')) AS n_words
        FROM (SELECT trim(regexp_replace(p, '\s+', ' ', 'g')) AS phrase
              FROM ph0)
        WHERE phrase <> '' AND len(string_split(phrase, ' ')) <= {max_len}
    ),
    wstats AS (
        SELECT w,
               CAST(round(1e6 * SUM(plen) * 1.0 / COUNT(*)) AS BIGINT)
                   AS wscore
        FROM (SELECT unnest(words) AS w, n_words AS plen FROM phx)
        GROUP BY w
    ),
    pgrid AS (
        SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(MAX(n_words) AS INT) AS n_words
        FROM phx GROUP BY phrase
    ),
    scored AS (
        SELECT pw.phrase, CAST(SUM(wstats.wscore) AS BIGINT) AS sm
        FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w
              FROM pgrid) pw
        JOIN wstats USING (w) GROUP BY pw.phrase
    )
    SELECT p.phrase, p.n_occurrences, p.n_words,
           ROUND(s.sm / 1e6, 6) AS rake_score
    FROM pgrid p JOIN scored s USING (phrase)
    ORDER BY rake_score DESC, p.phrase LIMIT {top_n}
    """


@register("rake_top_phrases", _rake_oracle_sql(50, 4))
def rake_top_phrases(spark, sf_dir):
    """RAKE keyword extraction over the corpus (`operators/text.py
    rake_keywords`, top-50, phrases ≤ 4 words): candidate phrases are
    maximal stopword/punctuation-free runs; words score degree/frequency
    in integer micros; phrases sum their word scores — the untrained
    corpus-keyword surfacer complementing TF-IDF's per-doc terms."""
    from ningaloo_turtle_etl_spark.operators.text import rake_keywords

    docs = load_table(spark, "documents", sf_dir)
    return rake_keywords(docs, top_n=50, max_phrase_len=4)


@register(
    "nb_lang_confusion",
    rf"""
    WITH base AS (
        SELECT doc_id AS id, lang AS y, {_TOKENS} AS toks FROM documents
    ),
    tok AS (SELECT id, y, unnest(toks) AS tk FROM base),
    classes AS (SELECT DISTINCT y AS k FROM tok),
    vocab AS (SELECT DISTINCT tk FROM tok),
    vn AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    kt AS (SELECT y AS k, tk, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    nk AS (SELECT y AS k, CAST(COUNT(*) AS BIGINT) AS nk
           FROM tok GROUP BY 1),
    model AS (
        SELECT g.k, g.tk,
               CAST(round(ln((COALESCE(kt.c, 0) + 1.0)
                             / (nk.nk + 1.0 * vn.v)) * 1e9) AS BIGINT)
                   AS llm
        FROM (SELECT k, tk FROM classes CROSS JOIN vocab) g
        LEFT JOIN kt ON g.k = kt.k AND g.tk = kt.tk
        JOIN nk ON g.k = nk.k CROSS JOIN vn
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    prior AS (
        SELECT y AS k,
               CAST(round(ln(COUNT(*) * 1.0 / nd.n) * 1e9) AS BIGINT) AS lpm
        FROM base CROSS JOIN nd GROUP BY y, nd.n
    ),
    scores AS (
        SELECT tok.id, model.k,
               CAST(SUM(model.llm) AS BIGINT) + ANY_VALUE(prior.lpm)
                   AS score
        FROM tok JOIN model ON tok.tk = model.tk
        JOIN prior ON model.k = prior.k
        GROUP BY tok.id, model.k
    ),
    pred AS (
        SELECT id, k AS predicted FROM (
            SELECT id, k,
                   ROW_NUMBER() OVER (PARTITION BY id
                                      ORDER BY score DESC, k) AS rn
            FROM scores
        ) WHERE rn = 1
    ),
    empty_pred AS (
        -- token-less docs: prior-only argmax (same tie-break)
        SELECT base.id,
               (SELECT k FROM prior ORDER BY lpm DESC, k LIMIT 1)
                   AS predicted
        FROM base WHERE len(toks) = 0
    ),
    allpred AS (
        SELECT * FROM pred UNION ALL SELECT * FROM empty_pred
    )
    SELECT base.y AS actual, allpred.predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM base JOIN allpred ON base.id = allpred.id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def nb_lang_confusion(spark, sf_dir):
    """Multinomial Naive Bayes language classifier trained distributed
    on the corpus and replayed in-sample as an (actual, predicted, n)
    confusion grid (`operators/classify.py naive_bayes_confusion`,
    Laplace α=1): priors and smoothed log-likelihoods are one-pass
    aggregations quantized to integer nanos in the model table, so
    per-document argmax scores are exact-integer sums — the labeling-
    pipeline audit loop, fully oracle-replayed."""
    from ningaloo_turtle_etl_spark.operators.classify import (
        naive_bayes_confusion,
    )

    docs = load_table(spark, "documents", sf_dir)
    return naive_bayes_confusion(docs, "lang").orderBy(
        "actual", "predicted"
    )


@register(
    "gini_best_split_features",
    rf"""
    WITH feats AS (
        SELECT CAST(n_chars AS DOUBLE) AS n_chars,
               CAST(len({_TOKENS}) AS DOUBLE) AS n_tokens,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    unpiv AS (
        SELECT 'n_chars' AS feature, n_chars AS v, y FROM feats
        UNION ALL
        SELECT 'n_tokens', n_tokens, y FROM feats
    ),
    grid AS (
        SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM unpiv WHERE v IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
        SELECT feature, v,
               CAST(SUM(n) OVER (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS nl,
               CAST(SUM(pos) OVER (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS pl,
               CAST(SUM(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
               CAST(SUM(pos) OVER (PARTITION BY feature) AS BIGINT) AS pt
        FROM grid
    ),
    scored AS (
        SELECT feature, v AS threshold, nl AS n_left, nt - nl AS n_right,
               ROUND((nl * 1.0 / nt) * (1.0 - (pl * 1.0 / nl) * (pl * 1.0 / nl)
                       - ((nl - pl) * 1.0 / nl) * ((nl - pl) * 1.0 / nl))
                   + ((nt - nl) * 1.0 / nt)
                     * (1.0 - ((pt - pl) * 1.0 / (nt - nl))
                             * ((pt - pl) * 1.0 / (nt - nl))
                        - ((nt - nl - pt + pl) * 1.0 / (nt - nl))
                          * ((nt - nl - pt + pl) * 1.0 / (nt - nl))),
                   6) AS gini_split,
               ROUND(1.0 - (pt * 1.0 / nt) * (pt * 1.0 / nt)
                     - ((nt - pt) * 1.0 / nt) * ((nt - pt) * 1.0 / nt),
                   6) AS gini_root
        FROM cum WHERE nl < nt
    )
    SELECT feature, threshold, n_left, n_right, gini_split, gini_root,
           ROUND(gini_root - gini_split, 6) AS gain
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY feature
              ORDER BY gini_split, threshold) AS rn FROM scored)
    WHERE rn = 1 ORDER BY feature
    """,
)
def gini_best_split_features(spark, sf_dir):
    """CART root-node split search over document features (n_chars,
    token count) for predicting lang='en' (`operators/classify.py
    gini_best_splits`): cumulative class counts over each feature's
    sorted distinct-value grid give every cut's weighted Gini in one
    window pass; argmin per feature on the ROUNDED impurity with a
    threshold tiebreak — the single-split purity screen next to
    woe_iv_source_vs_english."""
    from ningaloo_turtle_etl_spark.operators.classify import (
        gini_best_splits,
    )
    from ningaloo_turtle_etl_spark.operators.text import tokens

    docs = load_table(spark, "documents", sf_dir).select(
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(tokens(F.lower(F.col("text")))).cast("double").alias(
            "n_tokens"
        ),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    return gini_best_splits(
        docs, ["n_chars", "n_tokens"], "y"
    ).orderBy("feature")


def _logistic_gd_oracle_sql(iterations: int = 3, lr: float = 0.5) -> str:
    """Unrolled full-batch gradient-descent oracle: one gradient CTE +
    one weight CTE per iteration (the pagerank/BPE chaining trick).
    Per-row gradient terms quantize to integer nanos before the exact-
    integer SUM, mirroring the operator; the weight step arithmetic is
    written with identical operation order."""
    margin = "(w.w0 * _intercept + w.w1 * f_chars + w.w2 * f_tokens)"
    parts = [
        rf"""
    base AS MATERIALIZED (
        SELECT 1.0 AS _intercept,
               CAST(n_chars AS DOUBLE) / 1000.0 AS f_chars,
               CAST(len({_TOKENS}) AS DOUBLE) / 100.0 AS f_tokens,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS _y
        FROM documents
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f""",
    g{t} AS (
        SELECT
            CAST(SUM(CAST(round((p - _y) * _intercept * 1e9) AS BIGINT))
                 AS BIGINT) AS g0,
            CAST(SUM(CAST(round((p - _y) * f_chars * 1e9) AS BIGINT))
                 AS BIGINT) AS g1,
            CAST(SUM(CAST(round((p - _y) * f_tokens * 1e9) AS BIGINT))
                 AS BIGINT) AS g2
        FROM (SELECT base.*,
                     1.0 / (1.0 + exp(-{margin})) AS p
              FROM base CROSS JOIN w{t - 1} w)
    ),
    w{t} AS (
        SELECT w.w0 - {lr} * ((g.g0 / 1e9) / nn.n) AS w0,
               w.w1 - {lr} * ((g.g1 / 1e9) / nn.n) AS w1,
               w.w2 - {lr} * ((g.g2 / 1e9) / nn.n) AS w2
        FROM w{t - 1} w CROSS JOIN g{t} g CROSS JOIN nn
    )"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f""",
    scored AS (
        SELECT base.*, {margin} AS m
        FROM base CROSS JOIN w{iterations} w
    ),
    metrics AS (
        SELECT ROUND(SUM(CASE WHEN (CASE WHEN m >= 0 THEN 1.0 ELSE 0.0 END)
                                    = _y THEN 1 ELSE 0 END) * 1.0
                     / ANY_VALUE(nn.n), 6) AS train_acc,
               ROUND((CAST(SUM(CAST(round(
                   ln(1.0 + exp(-((2.0 * _y - 1.0) * m))) * 1e9) AS BIGINT))
                   AS BIGINT) / 1e9) / ANY_VALUE(nn.n), 6) AS train_logloss
        FROM scored CROSS JOIN nn
    )
    SELECT f.feature, ROUND(f.weight, 6) AS weight,
           m.train_acc, m.train_logloss
    FROM (SELECT '_intercept' AS feature, w0 AS weight FROM w{iterations}
          UNION ALL SELECT 'f_chars', w1 FROM w{iterations}
          UNION ALL SELECT 'f_tokens', w2 FROM w{iterations}) f
    CROSS JOIN metrics m
    ORDER BY f.feature"""
    )


def _pca_power_oracle_sql(iterations: int = 3, d: int = 64) -> str:
    """Unrolled matrix-free power-iteration oracle (the logistic/kmeans
    chaining pattern) over the coordinate grain (embeddings × range(d)):
    per round one vid-keyed dot CTE and one j-keyed accumulate CTE, with
    every accumulation term rounded to integer MICROS before its
    exact-integer SUM, the covariance 1/n applied before the norm, and
    norm/normalize arithmetic in plain double — mirroring
    `operators/similarity.py pca_power_component` token-for-token
    (floor(x+0.5) for the non-negative squared terms, exactly the
    operator's driver-side helper)."""
    parts = [
        f"""
    coord AS MATERIALIZED (
        SELECT vec_id AS vid, CAST(j AS BIGINT) AS j,
               CAST(round(CAST(embedding[j] AS DOUBLE) * 1e6) AS BIGINT)
                   AS xm
        FROM embeddings, range(1, {d + 1}) t(j)
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    mu AS (
        SELECT j, CAST(floor(CAST(SUM(xm) AS BIGINT) / n + 0.5) AS BIGINT)
                   AS mu_m
        FROM coord CROSS JOIN nn GROUP BY j, n
    ),
    cent AS MATERIALIZED (
        SELECT vid, coord.j, (xm - mu_m) / 1e6 AS c
        FROM coord JOIN mu ON coord.j = mu.j
    ),
    v0 AS (
        SELECT j, CASE WHEN j = 1 THEN CAST(1.0 AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END AS v
        FROM mu
    )"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f""",
    s{t} AS (
        SELECT vid,
               CAST(SUM(CAST(round(c * v * 1e6) AS BIGINT)) AS BIGINT) AS g
        FROM cent JOIN v{t - 1} USING (j) GROUP BY vid
    ),
    sv{t} AS (SELECT vid, g / 1e6 AS sv FROM s{t}),
    w{t} AS (
        SELECT j,
               CAST(SUM(CAST(round(sv * c * 1e6) AS BIGINT)) AS BIGINT)
                   AS gw
        FROM cent JOIN sv{t} USING (vid) GROUP BY j
    ),
    wd{t} AS (SELECT j, (gw / 1e6) / nn.n AS wd FROM w{t} CROSS JOIN nn),
    ns{t} AS (
        SELECT CAST(SUM(CAST(floor(wd * wd * 1e6 + 0.5) AS BIGINT))
                    AS BIGINT) AS nsq
        FROM wd{t}
    ),
    v{t} AS (
        SELECT j, wd / sqrt(nsq / 1e6) AS v
        FROM wd{t} CROSS JOIN ns{t}
    )"""
        )
    n = iterations
    return (
        "WITH "
        + "".join(parts)
        + f"""
    SELECT CAST(j AS INT) AS dim_idx, ROUND(v, 6) AS loading,
           ROUND(sqrt(nsq / 1e6), 6) AS eigenvalue
    FROM v{n} CROSS JOIN ns{n}
    ORDER BY dim_idx"""
    )


def _pca_power_components_oracle_sql(
    p: int = 2, iterations: int = 3, d: int = 64
) -> str:
    """Unrolled DEFLATED power-iteration oracle: the single-component
    chain (`_pca_power_oracle_sql`) repeated per component, with each
    later component's per-round wd deflated by every finished
    component — wd − (λ_m·(dot_m/1e6))·v_m[j] in component order, the
    dot quantized to exact integer micros — token-for-token the driver
    arithmetic in `operators/similarity.py pca_power_components`."""
    parts = [
        f"""
    coord AS MATERIALIZED (
        SELECT vec_id AS vid, CAST(j AS BIGINT) AS j,
               CAST(round(CAST(embedding[j] AS DOUBLE) * 1e6) AS BIGINT)
                   AS xm
        FROM embeddings, range(1, {d + 1}) t(j)
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    mu AS (
        SELECT j, CAST(floor(CAST(SUM(xm) AS BIGINT) / n + 0.5) AS BIGINT)
                   AS mu_m
        FROM coord CROSS JOIN nn GROUP BY j, n
    ),
    cent AS MATERIALIZED (
        SELECT vid, coord.j, (xm - mu_m) / 1e6 AS c
        FROM coord JOIN mu ON coord.j = mu.j
    )"""
    ]
    T = iterations
    for k in range(1, p + 1):
        parts.append(
            f""",
    v{k}_0 AS MATERIALIZED (
        SELECT j, CASE WHEN j = {k} THEN CAST(1.0 AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END AS v
        FROM mu
    )"""
        )
        for t in range(1, T + 1):
            parts.append(
                f""",
    s{k}_{t} AS MATERIALIZED (
        SELECT vid,
               CAST(SUM(CAST(round(c * v * 1e6) AS BIGINT)) AS BIGINT) AS g
        FROM cent JOIN v{k}_{t - 1} USING (j) GROUP BY vid
    ),
    sv{k}_{t} AS MATERIALIZED (SELECT vid, g / 1e6 AS sv FROM s{k}_{t}),
    w{k}_{t} AS MATERIALIZED (
        SELECT j,
               CAST(SUM(CAST(round(sv * c * 1e6) AS BIGINT)) AS BIGINT)
                   AS gw
        FROM cent JOIN sv{k}_{t} USING (vid) GROUP BY j
    ),
    wd{k}_{t} AS MATERIALIZED (
        SELECT j, (gw / 1e6) / nn.n AS wd FROM w{k}_{t} CROSS JOIN nn
    )"""
            )
            if k > 1:
                # deflation: quantized dot per prior component, then the
                # sequential per-j subtraction in component order
                for m in range(1, k):
                    parts.append(
                        f""",
    dot{k}_{t}_{m} AS MATERIALIZED (
        SELECT CAST(SUM(CAST(round(a.v * b.v * 1e6) AS BIGINT)) AS BIGINT)
                   AS dm
        FROM v{m}_{T} a JOIN v{k}_{t - 1} b USING (j)
    )"""
                    )
                sub = "".join(
                    f" - (sqrt(ns{m}_{T}.nsq / 1e6)"
                    f" * (dot{k}_{t}_{m}.dm / 1e6)) * a{m}.v"
                    for m in range(1, k)
                )
                joins = "".join(
                    f" JOIN v{m}_{T} a{m} USING (j)"
                    f" CROSS JOIN ns{m}_{T} CROSS JOIN dot{k}_{t}_{m}"
                    for m in range(1, k)
                )
                parts.append(
                    f""",
    wdef{k}_{t} AS MATERIALIZED (
        SELECT w.j, w.wd{sub} AS wd
        FROM wd{k}_{t} w{joins}
    )"""
                )
            src = f"wdef{k}_{t}" if k > 1 else f"wd{k}_{t}"
            parts.append(
                f""",
    ns{k}_{t} AS MATERIALIZED (
        SELECT CAST(SUM(CAST(floor(wd * wd * 1e6 + 0.5) AS BIGINT))
                    AS BIGINT) AS nsq
        FROM {src}
    ),
    v{k}_{t} AS MATERIALIZED (
        SELECT j, wd / sqrt(nsq / 1e6) AS v
        FROM {src} CROSS JOIN ns{k}_{t}
    )"""
            )
    finals = "\n    UNION ALL ".join(
        f"SELECT {k} AS component, CAST(j AS INT) AS dim_idx,"
        f" ROUND(v, 6) AS loading,"
        f" ROUND(sqrt(nsq / 1e6), 6) AS eigenvalue"
        f" FROM v{k}_{T} CROSS JOIN ns{k}_{T}"
        for k in range(1, p + 1)
    )
    return (
        "WITH "
        + "".join(parts)
        + f"""
    {finals}
    ORDER BY component, dim_idx"""
    )


@register("pca_power_components", _pca_power_components_oracle_sql(2, 3, 64))
def pca_power_components_query(spark, sf_dir):
    """Top-2 principal components of the embedding corpus by deflated
    power iteration (`operators/similarity.py pca_power_components`,
    3 rounds per component, v0 = e_k): component 2 iterates on the
    covariance with component 1's λ·vvᵀ removed — deflation happens on
    the d-sized driver vector, so the distributed shape stays one
    scan + one coordinate-grain aggregate per round at any corpus
    size. The full two-component trajectory (including the quantized
    deflation dots) replays bit-for-bit in the unrolled oracle."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        pca_power_components,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    return pca_power_components(emb, n_components=2, iterations=3)


@register("pca_power_component", _pca_power_oracle_sql(3, 64))
def pca_power_component_query(spark, sf_dir):
    """Top principal component of the embedding corpus by matrix-free
    power iteration (`operators/similarity.py pca_power_component`, 3
    rounds, v0 = e_1): the covariance never materializes — each round is
    two coordinate-grain passes and a d-row normalize, the shape that
    holds at any dimension and corpus size. Integer-micro coordinates,
    floor(s/n+0.5) mean, nano-quantized accumulation terms: the whole
    trajectory replays bit-for-bit in the unrolled oracle."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        pca_power_component,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    return pca_power_component(emb, iterations=3)


def _mf_gd_oracle_sql(iterations: int = 3) -> str:
    """Unrolled rank-1 matrix-factorization GD oracle (the logistic-GD
    chaining pattern): per round one joined-error CTE feeds two mean-
    gradient CTEs (per-pair terms rounded to integer nanos before the
    exact-integer SUM) and two factor-step CTEs whose double arithmetic
    mirrors `operators/similarity.py mf_gd_factors` token-for-token.
    lr = 0.0625 (binary-exact literal)."""
    parts = [
        """
    base AS MATERIALIZED (
        SELECT o_custkey AS u, l_partkey AS i,
               CAST(SUM(l_quantity) AS DOUBLE) / CAST(10 AS DOUBLE) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey <= 80 AND l_partkey <= 120
        GROUP BY 1, 2
    ),
    p0 AS (SELECT u, 0.5 + CAST(u % 7 AS DOUBLE) / CAST(10 AS DOUBLE) AS pf
           FROM (SELECT DISTINCT u FROM base)),
    q0 AS (SELECT i, 0.5 + CAST(i % 11 AS DOUBLE) / CAST(10 AS DOUBLE) AS qf
           FROM (SELECT DISTINCT i FROM base))"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f""",
    j{t} AS (
        SELECT base.u, base.i, base.r, p.pf, q.qf
        FROM base JOIN p{t - 1} p USING (u) JOIN q{t - 1} q USING (i)
    ),
    gp{t} AS (
        SELECT u,
               CAST(SUM(CAST(round((r - pf * qf) * qf * 1e9) AS BIGINT))
                    AS BIGINT) AS g,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM j{t} GROUP BY u
    ),
    gq{t} AS (
        SELECT i,
               CAST(SUM(CAST(round((r - pf * qf) * pf * 1e9) AS BIGINT))
                    AS BIGINT) AS g,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM j{t} GROUP BY i
    ),
    p{t} AS (
        SELECT p.u, p.pf + 0.0625 * ((g.g / 1e9) / g.n) AS pf
        FROM p{t - 1} p JOIN gp{t} g USING (u)
    ),
    q{t} AS (
        SELECT q.i, q.qf + 0.0625 * ((g.g / 1e9) / g.n) AS qf
        FROM q{t - 1} q JOIN gq{t} g USING (i)
    )"""
        )
    n = iterations
    return (
        "WITH "
        + "".join(parts)
        + f""",
    fit AS (
        SELECT base.r, p.pf, q.qf
        FROM base JOIN p{n} p USING (u) JOIN q{n} q USING (i)
    ),
    rmse AS (
        SELECT ROUND(sqrt((CAST(SUM(CAST(round(
                   (r - pf * qf) * (r - pf * qf) * 1e9) AS BIGINT))
                   AS BIGINT) / 1e9) / COUNT(*)), 6) AS train_rmse
        FROM fit
    )
    SELECT f.side, f.id, ROUND(f.factor, 6) AS factor, m.train_rmse
    FROM (SELECT 'user' AS side, u AS id, pf AS factor FROM p{n}
          UNION ALL SELECT 'item', i, qf FROM q{n}) f
    CROSS JOIN rmse m
    ORDER BY f.side, f.id"""
    )


@register("mf_gd_factors", _mf_gd_oracle_sql(3))
def mf_gd_factors_query(spark, sf_dir):
    """Rank-1 Funk-SVD trained distributed on the (customer, part,
    quantity/10) implicit-rating matrix (`operators/similarity.py
    mf_gd_factors`, 3 synchronous mean-gradient rounds, lr=1/16): the
    recsys-training family next to logistic_gd_weights, with the learned
    user/item factor trajectory as the oracle contract and the final
    train RMSE carried on every row. Bounded entity sets (custkey<=80,
    partkey<=120) keep the factor tables broadcastable at every SF while
    ratings-per-entity still grow with the data."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        mf_gd_factors,
    )

    li = load_table(spark, "lineitem", sf_dir)
    od = load_table(spark, "orders", sf_dir)
    ratings = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter((F.col("o_custkey") <= 80) & (F.col("l_partkey") <= 120))
        .groupBy("o_custkey", "l_partkey")
        .agg(
            (
                F.sum("l_quantity").cast("double")
                / F.lit(10).cast("double")
            ).alias("rating")
        )
    )
    return mf_gd_factors(
        ratings,
        iterations=3,
        lr=0.0625,
        user_col="o_custkey",
        item_col="l_partkey",
        rating_col="rating",
    )


@register("logistic_gd_weights", _logistic_gd_oracle_sql(3, 0.5))
def logistic_gd_weights(spark, sf_dir):
    """Distributed full-batch logistic-regression training on document
    features (`operators/classify.py logistic_gd_train`, 3 GD rounds,
    lr=0.5, features: intercept + n_chars/1000 + tokens/100, label
    lang='en'): each round is ONE map-side-combined gradient aggregate
    with nano-quantized terms, so the entire weight TRAJECTORY replays
    bit-for-bit in the unrolled oracle — training as a first-class
    verified operator, not a frozen fixture (contrast
    quality_classifier_scores, which serves a frozen model)."""
    from ningaloo_turtle_etl_spark.operators.classify import (
        logistic_gd_train,
    )
    from ningaloo_turtle_etl_spark.operators.text import tokens

    docs = load_table(spark, "documents", sf_dir).select(
        (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("f_chars"),
        (
            F.size(tokens(F.lower(F.col("text")))).cast("double")
            / F.lit(100.0)
        ).alias("f_tokens"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    return logistic_gd_train(
        docs, ["f_chars", "f_tokens"], "y", iterations=3, lr=0.5
    )


@register(
    "moment_profile_by_type",
    """
    WITH agg AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 1e9, 0) AS DECIMAL(38,0)))
                    AS DOUBLE) / 1e9 AS s1,
               CAST(SUM(CAST(ROUND(value * value * 1e6, 0)
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS s2,
               CAST(SUM(CAST(ROUND(value * value * value * 1e3, 0)
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e3 AS s3,
               CAST(SUM(CAST(ROUND(value * value * value * value, 0)
                    AS DECIMAL(38,0))) AS DOUBLE) AS s4
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(s1 / n, 6) AS mean,
           ROUND(s2 / n - (s1 / n) * (s1 / n), 6) AS variance,
           ROUND(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0 THEN
               (s3 / n - 3.0 * (s1 / n) * (s2 / n)
                + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
               / ((s2 / n - (s1 / n) * (s1 / n))
                  * sqrt(s2 / n - (s1 / n) * (s1 / n))) END, 6) AS skewness,
           ROUND(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > 0 THEN
               (s4 / n - 4.0 * (s1 / n) * (s3 / n)
                + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
               / ((s2 / n - (s1 / n) * (s1 / n))
                  * (s2 / n - (s1 / n) * (s1 / n))) - 3.0 END, 6)
               AS kurtosis_excess
    FROM agg ORDER BY event_type
    """,
)
def moment_profile_by_type(spark, sf_dir):
    """Four-moment value profile per event type (`operators/relational.py
    moment_profile`): mean / population variance / skewness g1 / excess
    kurtosis g2 from raw power sums with the formulas written out —
    Spark's and DuckDB's built-in skewness()/kurtosis() use different
    estimator conventions, so the explicit power-sum form IS the
    cross-engine contract."""
    from ningaloo_turtle_etl_spark.operators.relational import (
        moment_profile,
    )

    ev = load_table(spark, "events", sf_dir)
    return moment_profile(ev, "value", by=["event_type"]).orderBy(
        "event_type"
    )


@register(
    "item_cosine_top100",
    """
    WITH bi AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ),
    ni AS (SELECT it AS i, CAST(COUNT(*) AS BIGINT) AS ni
           FROM bi GROUP BY it),
    co AS (
        SELECT a.it AS id_a, b.it AS id_b, CAST(COUNT(*) AS BIGINT) AS co
        FROM bi a JOIN bi b ON a.bk = b.bk AND a.it < b.it
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT co.id_a, co.id_b, co.co,
           ROUND(co.co / sqrt(CAST(x.ni AS DOUBLE) * CAST(y.ni AS DOUBLE)),
                 6) AS cosine
    FROM co JOIN ni x ON co.id_a = x.i JOIN ni y ON co.id_b = y.i
    ORDER BY cosine DESC, co.id_a, co.id_b LIMIT 100
    """,
)
def item_cosine_top100(spark, sf_dir):
    """Top-100 item-item cosine (Ochiai) similarities over the
    order-part incidence (`operators/basket.py item_cosine_pairs`,
    min_co=2): the item-based collaborative-filtering ranking —
    symmetric similarity from the co-occurrence grid and per-item
    counts only, the serving complement to assoc_rules_copurchase's
    directional confidence."""
    from ningaloo_turtle_etl_spark.operators.basket import (
        item_cosine_pairs,
    )

    li = load_table(spark, "lineitem", sf_dir)
    return item_cosine_pairs(
        li, "l_orderkey", "l_partkey", min_co=2, top_n=100
    )


@register("ranking_ndcg_eval", ndcg_oracle_sql(10))
def ranking_ndcg_eval(spark, sf_dir):
    """Retrieval evaluation (`operators/similarity.py ranking_metrics`):
    NDCG@10, precision@10, MRR and hit count per query over the exact
    cosine top-10, with relevance = candidate shares the query's label
    and the corpus-wide relevant count feeding the ideal DCG — the
    metric loop that grades every ANN/CF/embedding stage. Discount
    weights are shared integer-nano literals (no engine calls log2), so
    only one final division is float."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        cosine_topk,
        ranking_metrics,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") < 5)
    ranked = cosine_topk(emb, qs, k=10)
    return ranking_metrics(ranked, emb, k=10)


@register(
    "ann_hamming_topk",
    """
    WITH codes AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(generate_series(0, 31),
                   i -> CASE WHEN embedding[i + 1] > 0
                             THEN 1::BIGINT << i
                             ELSE 0::BIGINT END)) AS BIGINT) AS w0,
               CAST(list_sum(list_transform(generate_series(32, 63),
                   i -> CASE WHEN embedding[i + 1] > 0
                             THEN 1::BIGINT << (i - 32)
                             ELSE 0::BIGINT END)) AS BIGINT) AS w1
        FROM embeddings
    ),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               CAST(bit_count(xor(c.w0, q.w0))
                    + bit_count(xor(c.w1, q.w1)) AS BIGINT) AS hamming
        FROM codes c, codes q
        WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id, hamming, rank FROM (
        SELECT query_id, vec_id, hamming,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY hamming, vec_id) AS INT)
                   AS rank
        FROM pairs
    ) WHERE rank <= 10
    """,
)
def ann_hamming_topk(spark, sf_dir):
    """Binary-quantized ANN (Charikar sign-bit codes, STOC'02): Hamming
    top-10 for the first eight query vectors over 32-bit-word sign
    codes (`operators/quantize.py sign_bit_words / hamming_topk`) — the
    coarsest, cheapest tier of the quantization ladder (1 bit/dim;
    XOR+popcount per pair). Both engines build the identical BIGINT
    words, so the distances are exact integers."""
    from ningaloo_turtle_etl_spark.operators.quantize import hamming_topk

    emb = load_table(spark, "embeddings", sf_dir)
    return hamming_topk(emb, emb.filter(F.col("vec_id") < 8), dim=64, k=10)


def _textrank_oracle_sql(
    iterations: int = 3, damping: float = 0.85, top_k: int = 20
) -> str:
    r"""Unrolled weighted-PageRank oracle for textrank_keywords: the same
    chained-CTE pattern as _pagerank_oracle_sql, with co-occurrence
    weights (contribution = round(d·rank·w/strength) in whole micros)
    and the map-only adjacent-pair extraction replayed with list
    functions."""
    base = int(round((1.0 - damping) * 1e6))
    parts = [
        r"""
    tl AS (
        SELECT list_filter(string_split_regex(lower(text), '\s+'),
               x -> regexp_matches(x, '^[a-z]{4,}$')) AS l
        FROM documents
    ),
    adj AS (
        SELECT unnest(list_transform(generate_series(1, len(l) - 1),
               i -> struct_pack(a := l[i], b := l[i + 1]))) AS p
        FROM tl
    ),
    ab AS (SELECT p.a AS a, p.b AS b FROM adj WHERE p.a <> p.b),
    und AS (
        SELECT least(a, b) AS u, greatest(a, b) AS v,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM ab GROUP BY 1, 2
    ),
    ed0 AS (
        SELECT u AS src, v AS dst, w FROM und
        UNION ALL SELECT v, u, w FROM und
    ),
    st AS (SELECT src, CAST(SUM(w) AS BIGINT) AS strength
           FROM ed0 GROUP BY src),
    ed AS (SELECT ed0.src, ed0.dst, ed0.w, st.strength
           FROM ed0 JOIN st USING (src)),
    nodes AS (SELECT src AS node FROM ed0
              UNION SELECT dst FROM ed0),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rm FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    r{i} AS (
        SELECT n.node, CAST({base} + COALESCE(s.s, 0) AS BIGINT) AS rm
        FROM nodes n LEFT JOIN (
            SELECT ed.dst AS node,
                   CAST(SUM(CAST(ROUND(CAST({damping} AS DOUBLE) * r.rm
                       * ed.w / ed.strength, 0) AS BIGINT)) AS BIGINT) AS s
            FROM ed JOIN r{i - 1} r ON ed.src = r.node
            GROUP BY ed.dst
        ) s ON n.node = s.node
    )"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f"""
    SELECT token, rank, pos FROM (
        SELECT node AS token, ROUND(rm / 1e6, 6) AS rank,
               CAST(ROW_NUMBER() OVER (ORDER BY rm DESC, node) AS INT)
                   AS pos
        FROM r{iterations}
    ) WHERE pos <= {top_k} ORDER BY pos"""
    )


@register("textrank_keywords", _textrank_oracle_sql(3))
def q_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction over the corpus (`operators/text.py
    textrank_keywords` → `operators/graph.py weighted_pagerank`): global
    top-20 tokens by 3 rounds of the weighted PageRank recursion on the
    adjacent-token co-occurrence graph — the unsupervised keyword scorer
    of the curation stack. The oracle unrolls the identical integer-
    micro rounds as chained CTEs."""
    from ningaloo_turtle_etl_spark.operators.text import textrank_keywords

    docs = load_table(spark, "documents", sf_dir)
    return textrank_keywords(docs, top_k=20, iterations=3)


def _ppr_oracle_sql(
    iterations: int, damping: float = 0.85, brand: str = "Brand#11"
) -> str:
    """Unrolled personalized-PageRank oracle: the pagerank CTE chain
    with teleport mass restricted to the seed nodes (is_seed · base per
    round, seed-only initial mass)."""
    base = int(round((1.0 - damping) * 1e6))
    parts = [
        f"""
    eo AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS src
           FROM lineitem),
    ed0 AS (
        SELECT DISTINCT a.src AS src, b.src AS dst
        FROM eo a JOIN eo b ON a.ok = b.ok AND a.src <> b.src
    ),
    od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
           FROM ed0 GROUP BY src),
    ed AS (SELECT ed0.src, ed0.dst, od.outdeg
           FROM ed0 JOIN od USING (src)),
    nodes0 AS (SELECT src AS node FROM ed0
               UNION SELECT dst FROM ed0),
    sd AS (SELECT DISTINCT p_partkey AS node FROM part
           WHERE p_brand = '{brand}'),
    nodes AS (
        SELECT n.node,
               CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
        FROM nodes0 n LEFT JOIN sd s ON n.node = s.node
    ),
    r0 AS (SELECT node, CAST(is_seed * 1000000 AS BIGINT) AS rm
           FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
    r{i} AS (
        SELECT n.node,
               CAST(n.is_seed * {base} + COALESCE(s.s, 0) AS BIGINT) AS rm
        FROM nodes n LEFT JOIN (
            SELECT ed.dst AS node,
                   CAST(SUM(CAST(ROUND(CAST({damping} AS DOUBLE) * r.rm
                       / ed.outdeg, 0) AS BIGINT)) AS BIGINT) AS s
            FROM ed JOIN r{i - 1} r ON ed.src = r.node
            GROUP BY ed.dst
        ) s ON n.node = s.node
    )"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f"""
    SELECT node, ROUND(rm / 1e6, 6) AS rank FROM r{iterations}"""
    )


@register("ppr_copurchase_brand", _ppr_oracle_sql(5))
def ppr_copurchase_brand(spark, sf_dir):
    """Personalized PageRank from one brand's parts over the co-purchase
    graph (`operators/graph.py personalized_pagerank`, 5 rounds, d=0.85):
    random walk with restart at the Brand#11 seed set — proximity-to-
    seeds item recommendation, where global pagerank_copurchase would
    resurface the same overall hubs for every brand. Integer-micro
    rounds, seed set broadcast once."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        copurchase_edges,
        personalized_pagerank,
    )

    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    seeds = part.filter(F.col("p_brand") == "Brand#11").select(
        F.col("p_partkey").alias("node")
    )
    edges = copurchase_edges(li)
    return personalized_pagerank(edges, seeds, iterations=5).select(
        "node", "rank"
    )


def _unigram_oracle_sql(top_k: int = 64, L: int = 4) -> str:
    r"""Recursive-CTE replay of the unigram-Viterbi fold: the vocab CTE
    re-derives the identical (singles ∪ top-k) piece table, ln P
    quantizes to integer nanos (absorbing the Python-vs-DuckDB libm
    ulp), and the walk advances one char per step carrying the last-4
    dp cells, with the same (score·8 + len) argmax key as the Spark
    fold."""
    SENT = -(1 << 62)
    HALF = SENT // 2
    # candidate keys: piece of length l ends at p = w.pos + 1, starts at
    # w.pos + 2 - l; prev dp cell for length l is (s{l}, c{l})
    cands = []
    for l in range(1, L + 1):
        cands.append(
            f"CASE WHEN {l} <= w.pos + 1 AND v{l}.lp IS NOT NULL"
            f" AND w.s{l} > CAST({HALF} AS BIGINT)"
            f" THEN (w.s{l} + v{l}.lp) * 8 + {l}"
            f" ELSE CAST({SENT} AS BIGINT) END"
        )
    best = "GREATEST(" + ", ".join(cands) + ")"
    ldec = f"((({best}) % 8) + 8) % 8"
    c_new = (
        f"CASE {ldec} "
        + " ".join(f"WHEN {l} THEN w.c{l} + 1" for l in range(1, L))
        + f" ELSE w.c{L} + 1 END"
    )
    joins = "\n".join(
        f"    LEFT JOIN vlp v{l} ON v{l}.piece ="
        f" substr(t.tx, w.pos + 2 - {l}, {l})"
        for l in range(1, L + 1)
    )
    scols = ", ".join(f"s{l}, c{l}" for l in range(1, L + 1))
    base_cells = "CAST(0 AS BIGINT), 0, " + ", ".join(
        f"CAST({SENT} AS BIGINT), 0" for _ in range(L - 1)
    )
    shift = ", ".join(f"w.s{l}, w.c{l}" for l in range(1, L))
    return f"""
    WITH RECURSIVE
    t AS MATERIALIZED (
        SELECT doc_id, source AS g, lower(text) AS tx
        FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ),
    sub AS MATERIALIZED (
        SELECT piece, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT unnest(flatten(list_transform(
                generate_series(1, length(tx)),
                i -> list_transform(
                    generate_series(1, least({L}, length(tx) - i + 1)),
                    l -> substr(tx, CAST(i AS INT), CAST(l AS INT))))))
                AS piece
            FROM t
        ) GROUP BY piece
    ),
    vocab AS (
        SELECT piece, c FROM sub WHERE length(piece) = 1
        UNION ALL
        SELECT piece, c FROM (
            SELECT piece, c,
                   ROW_NUMBER() OVER (ORDER BY c DESC, piece) AS rk
            FROM sub WHERE length(piece) >= 2
        ) WHERE rk <= {top_k}
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM vocab),
    vlp AS MATERIALIZED (
        SELECT piece, CAST(round(ln(c * 1.0 / tot) * 1e9) AS BIGINT) AS lp
        FROM vocab, tot
    ),
    walk(doc_id, pos, {scols}) AS (
        SELECT doc_id, 0, {base_cells} FROM t
        UNION ALL
        SELECT w.doc_id, w.pos + 1,
               CAST((({best}) - ({ldec})) / 8 AS BIGINT),
               {c_new},
               {shift}
        FROM walk w
        JOIN t ON t.doc_id = w.doc_id AND w.pos < length(t.tx)
{joins}
    ),
    fin AS (
        SELECT w.doc_id, w.s1 AS s, w.c1 AS np
        FROM walk w
        JOIN t ON t.doc_id = w.doc_id AND w.pos = length(t.tx)
    )
    SELECT t.g AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(t.tx)) AS BIGINT) AS n_chars,
           CAST(SUM(fin.np) AS BIGINT) AS n_pieces,
           ROUND(CAST(SUM(fin.np) AS BIGINT)
                 / CAST(SUM(length(t.tx)) AS DOUBLE), 6) AS fertility,
           ROUND((CAST(SUM(fin.s) AS BIGINT) / 1e9)
                 / CAST(SUM(length(t.tx)) AS BIGINT), 6) AS ll_per_char
    FROM fin JOIN t ON fin.doc_id = t.doc_id
    GROUP BY t.g ORDER BY t.g
    """


@register("unigram_tokenizer_stats", _unigram_oracle_sql(64, 4))
def unigram_tokenizer_stats(spark, sf_dir):
    """Unigram-LM (SentencePiece, Kudo 2018) Viterbi tokenization stats
    per source (`operators/bpe.py unigram_vocab / unigram_viterbi_stats`):
    fit the singles ∪ top-64 substring vocabulary on the corpus, segment
    every document by the exact Viterbi DP under the unigram piece LM —
    a map-only in-document fold, the probabilistic counterpart of the
    BPE greedy encoder — and report per-source fertility (pieces/char)
    and log-likelihood per char. Integer-nano piece log-probs make the
    DP exact-integer; the oracle replays fit + DP end-to-end as a
    recursive CTE."""
    from ningaloo_turtle_etl_spark.operators.bpe import (
        unigram_viterbi_stats,
        unigram_vocab,
    )

    docs = load_table(spark, "documents", sf_dir)
    vocab = unigram_vocab(docs, top_k=64, max_piece_len=4)
    return unigram_viterbi_stats(
        docs, vocab, group_col="source", max_piece_len=4
    )


def _quantile_gd_oracle_sql(
    iterations: int = 4, lr: float = 64.0, q: float = 0.75
) -> str:
    """Unrolled pinball-subgradient oracle (the logistic-GD chaining
    pattern): per round one gradient CTE + one weight CTE, per-row
    terms nano-quantized, identical operation order; the weekend flag
    derives from the epoch-day index (day 0 = Thursday, so weekend =
    day % 7 IN (2, 3)) — pure integer math, timezone-free."""
    qm1 = q - 1.0
    margin = "(w.w0 * _intercept + w.w1 * f_wknd + w.w2 * f_click)"
    ind = f"CASE WHEN {margin} > _y THEN 1.0 ELSE 0.0 END"
    parts = [
        f"""
    base AS MATERIALIZED (
        SELECT 1.0 AS _intercept,
               CASE WHEN CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7
                         IN (2, 3) THEN 1.0 ELSE 0.0 END AS f_wknd,
               CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END
                   AS f_click,
               value AS _y
        FROM events
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f""",
    g{t} AS (
        SELECT
            CAST(SUM(CAST(round((ind - {q}) * _intercept * 1e9) AS BIGINT))
                 AS BIGINT) AS g0,
            CAST(SUM(CAST(round((ind - {q}) * f_wknd * 1e9) AS BIGINT))
                 AS BIGINT) AS g1,
            CAST(SUM(CAST(round((ind - {q}) * f_click * 1e9) AS BIGINT))
                 AS BIGINT) AS g2
        FROM (SELECT base.*, {ind} AS ind
              FROM base CROSS JOIN w{t - 1} w)
    ),
    w{t} AS (
        SELECT w.w0 - {lr} * ((g.g0 / 1e9) / nn.n) AS w0,
               w.w1 - {lr} * ((g.g1 / 1e9) / nn.n) AS w1,
               w.w2 - {lr} * ((g.g2 / 1e9) / nn.n) AS w2
        FROM w{t - 1} w CROSS JOIN g{t} g CROSS JOIN nn
    )"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f""",
    scored AS (
        SELECT base.*, {margin} AS m
        FROM base CROSS JOIN w{iterations} w
    ),
    metrics AS (
        SELECT ROUND(SUM(CASE WHEN _y <= m THEN 1 ELSE 0 END) * 1.0
                     / ANY_VALUE(nn.n), 6) AS coverage,
               ROUND((CAST(SUM(CAST(round(
                   (CASE WHEN _y - m >= 0 THEN {q} * (_y - m)
                         ELSE CAST({qm1} AS DOUBLE) * (_y - m) END)
                   * 1e9) AS BIGINT)) AS BIGINT) / 1e9)
                   / ANY_VALUE(nn.n), 6) AS pinball_loss
        FROM scored CROSS JOIN nn
    )
    SELECT f.feature, ROUND(f.weight, 6) AS weight,
           m.coverage, m.pinball_loss
    FROM (SELECT '_intercept' AS feature, w0 AS weight FROM w{iterations}
          UNION ALL SELECT 'f_wknd', w1 FROM w{iterations}
          UNION ALL SELECT 'f_click', w2 FROM w{iterations}) f
    CROSS JOIN metrics m
    ORDER BY f.feature"""
    )


@register("quantile_gd_weights", _quantile_gd_oracle_sql(4, 64.0, 0.75))
def quantile_gd_weights(spark, sf_dir):
    """Linear p75 quantile regression of event value on (weekend,
    is-click) trained by the distributed pinball-subgradient loop
    (`operators/classify.py quantile_gd_train`, 4 rounds, lr=64): the
    conditional-quantile rung of the trainer stack next to
    logistic_gd_weights (classification) and mf_gd_factors
    (factorization) — budget/SLA questions are quantile questions, not
    mean questions. The weight trajectory replays bit-for-bit in the
    unrolled oracle."""
    from ningaloo_turtle_etl_spark.operators.classify import (
        quantile_gd_train,
    )
    from ningaloo_turtle_etl_spark.operators.temporal import _epoch_seconds

    raw = load_table(spark, "events", sf_dir)
    base = raw.select(
        (
            (
                F.floor(_epoch_seconds(raw, "ts") / F.lit(86400)).cast(
                    "long"
                )
                % 7
            ).isin(2, 3)
        )
        .cast("double")
        .alias("f_wknd"),
        (F.col("event_type") == "click").cast("double").alias("f_click"),
        F.col("value").alias("y"),
    )
    return quantile_gd_train(
        base, ["f_wknd", "f_click"], "y", q=0.75, iterations=4, lr=64.0
    )


def _als_rank1_oracle_sql(iterations: int = 3) -> str:
    """Unrolled rank-1 ALS oracle: per round one user half-solve and one
    item half-solve CTE — per-rating numerator/denominator terms rounded
    to integer nanos before exact-integer per-key SUMs, the closed-form
    division in the same association as
    `operators/similarity.py als_rank1_factors`. λ = 0.25 binary-exact;
    init q_i = 0.5 + (i%7)/10. All CTEs MATERIALIZED."""
    parts = [
        """
    base AS MATERIALIZED (
        SELECT o_custkey AS u, l_partkey AS i,
               CAST(SUM(l_quantity) AS DOUBLE) / CAST(10 AS DOUBLE) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey <= 80 AND l_partkey <= 120
        GROUP BY 1, 2
    ),
    q0 AS MATERIALIZED (
        SELECT i, 0.5 + CAST(i % 7 AS DOUBLE) / CAST(10 AS DOUBLE) AS qf
        FROM (SELECT DISTINCT i FROM base)
    )"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f""",
    p{t} AS MATERIALIZED (
        SELECT u,
               (CAST(SUM(CAST(round(r * qf * 1e9) AS BIGINT)) AS BIGINT)
                / 1e9)
               / (0.25 + CAST(SUM(CAST(round(qf * qf * 1e9) AS BIGINT))
                              AS BIGINT) / 1e9) AS pf
        FROM base JOIN q{t - 1} USING (i) GROUP BY u
    ),
    q{t} AS MATERIALIZED (
        SELECT i,
               (CAST(SUM(CAST(round(r * pf * 1e9) AS BIGINT)) AS BIGINT)
                / 1e9)
               / (0.25 + CAST(SUM(CAST(round(pf * pf * 1e9) AS BIGINT))
                              AS BIGINT) / 1e9) AS qf
        FROM base JOIN p{t} USING (u) GROUP BY i
    )"""
        )
    T = iterations
    return (
        "WITH "
        + "".join(parts)
        + f""",
    fit AS MATERIALIZED (
        SELECT sqrt((CAST(SUM(CAST(round((r - pf * qf) * (r - pf * qf)
                                         * 1e9) AS BIGINT)) AS BIGINT)
                     / 1e9) / CAST(COUNT(*) AS BIGINT)) AS train_rmse
        FROM base JOIN p{T} USING (u) JOIN q{T} USING (i)
    )
    SELECT side, id, ROUND(factor, 6) AS factor,
           ROUND(train_rmse, 6) AS train_rmse
    FROM (SELECT 'user' AS side, CAST(u AS BIGINT) AS id, pf AS factor
          FROM p{T}
          UNION ALL
          SELECT 'item', CAST(i AS BIGINT), qf FROM q{T})
    CROSS JOIN fit
    ORDER BY side, id"""
    )


@register("als_rank1_factors", _als_rank1_oracle_sql(3))
def als_rank1_factors_query(spark, sf_dir):
    """Rank-1 ALTERNATING least squares on the same (customer, part,
    quantity/10) implicit-rating matrix as mf_gd_factors
    (`operators/similarity.py als_rank1_factors`, 3 alternations,
    λ=1/4): the closed-form distributed recsys trainer next to the GD
    one — each half-step solves its side exactly in one join + one
    exact-integer aggregate, no driver state at all. The factor
    trajectory and final train RMSE replay in the unrolled oracle."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        als_rank1_factors,
    )

    li = load_table(spark, "lineitem", sf_dir)
    od = load_table(spark, "orders", sf_dir)
    ratings = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter((F.col("o_custkey") <= 80) & (F.col("l_partkey") <= 120))
        .groupBy("o_custkey", "l_partkey")
        .agg(
            (
                F.sum("l_quantity").cast("double")
                / F.lit(10).cast("double")
            ).alias("rating")
        )
    )
    return als_rank1_factors(
        ratings,
        iterations=3,
        lam=0.25,
        user_col="o_custkey",
        item_col="l_partkey",
        rating_col="rating",
    )


@register(
    "audio_wav_features",
    """
    WITH ids AS (
        SELECT doc_id AS media_id,
               800 + (doc_id % 50) * 16 AS n,
               3 + doc_id % 7 AS m
        FROM documents WHERE doc_id < 200
    ),
    w AS (
        SELECT media_id, n,
               list_transform(range(0, n),
                   k -> ((k * m + media_id) % 4001) - 2000) AS vs
        FROM ids
    ),
    f AS (
        SELECT media_id, n,
               CAST(list_sum(list_transform(vs, v -> v * v)) AS BIGINT)
                   AS sumsq,
               CAST(len(list_filter(range(1, n),
                   i -> vs[i] * vs[i + 1] < 0)) AS BIGINT) AS zc,
               [CAST(list_sum(list_transform(range(b * (n // 4) + 1,
                        (b + 1) * (n // 4) + 1), i -> vs[i] * vs[i]))
                    AS BIGINT) FOR b IN [0, 1, 2, 3]] AS be
        FROM w
    )
    SELECT media_id, 8000 AS sample_rate, n AS n_samples,
           ROUND(n / 8000, 6) AS duration_sec,
           ROUND(sqrt(sumsq / n) / 32768.0, 6) AS rms,
           zc AS zero_crossings,
           ROUND(be[1] / 32768.0 / 32768.0, 6) AS e0,
           ROUND(be[2] / 32768.0 / 32768.0, 6) AS e1,
           ROUND(be[3] / 32768.0 / 32768.0, 6) AS e2,
           ROUND(be[4] / 32768.0 / 32768.0, 6) AS e3
    FROM f ORDER BY media_id
    """,
)
def audio_wav_features(spark, sf_dir):
    """Audio-tier multimodal plumbing with a REAL codec: synthesize a
    deterministic PCM16 WAV blob per document id (sawtooth-ish samples
    v_k = ((k·m + id) mod 4001) − 2000), decode it back through the
    RIFF/WAVE parser (`operators/multimodal.py _wav_decode` — chunk
    walk, fmt validation, 16-bit PCM), and extract integer-exact
    features (RMS, zero crossings, equal-time band energies) via
    Arrow-batched mapInPandas (`extract_wav_features`). The oracle
    regenerates the same PCM from the formula and recomputes every
    feature from exact integer sums — so the full synth→encode→decode→
    feature path is value-hash-proven, not just schema-checked."""
    import numpy as np
    import pandas as pd

    from ningaloo_turtle_etl_spark.operators.multimodal import (
        extract_wav_features,
        synth_pcm16_wav,
    )

    ids = load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 200
    ).select(F.col("doc_id").alias("media_id"))

    def synth(batches):
        for batch in batches:
            out = []
            for mid in batch["media_id"]:
                mid = int(mid)
                n = 800 + (mid % 50) * 16
                m = 3 + mid % 7
                k = np.arange(n, dtype=np.int64)
                v = ((k * m + mid) % 4001) - 2000
                out.append(
                    {
                        "media_id": mid,
                        "content": synth_pcm16_wav(
                            v.astype(np.int16), 8000
                        ),
                    }
                )
            yield pd.DataFrame(out)

    media = ids.mapInPandas(synth, schema="media_id long, content binary")
    feats = extract_wav_features(media, n_bands=4)
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        F.round("duration_sec", 6).alias("duration_sec"),
        F.round("rms", 6).alias("rms"),
        "zero_crossings",
        F.round("e0", 6).alias("e0"),
        F.round("e1", 6).alias("e1"),
        F.round("e2", 6).alias("e2"),
        F.round("e3", 6).alias("e3"),
    ).orderBy("media_id")


def _wordpiece_oracle_sql(top_k: int = 64, L: int = 4) -> str:
    r"""Recursive-CTE replay of the WordPiece greedy scan: the same
    (singles ∪ top-k) vocab fit as the unigram oracle, then a walk that
    advances one char per step carrying (skip, np, nu, s) — longest
    match chosen by a length-descending COALESCE, [UNK] fallback at the
    fixed penalty, mirroring `operators/bpe.py wordpiece_greedy_stats`
    decision-for-decision."""
    UNK = -25_000_000_000
    lp_cases = ", ".join(
        f"CASE WHEN w.pos + {l} <= length(t.tx) AND v{l}.lp IS NOT NULL"
        f" THEN v{l}.lp END"
        for l in range(L, 0, -1)
    )
    l_cases = ", ".join(
        f"CASE WHEN w.pos + {l} <= length(t.tx) AND v{l}.lp IS NOT NULL"
        f" THEN {l} END"
        for l in range(L, 0, -1)
    )
    lp_choice = f"COALESCE({lp_cases}, CAST({UNK} AS BIGINT))"
    l_choice = f"COALESCE({l_cases}, 1)"
    joins = "\n".join(
        f"    LEFT JOIN vlp v{l} ON v{l}.piece ="
        f" substr(t.tx, w.pos + 1, {l})"
        for l in range(1, L + 1)
    )
    return f"""
    WITH RECURSIVE
    t AS MATERIALIZED (
        SELECT doc_id, source AS g, lower(text) AS tx
        FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ),
    sub AS MATERIALIZED (
        SELECT piece, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT unnest(flatten(list_transform(
                generate_series(1, length(tx)),
                i -> list_transform(
                    generate_series(1, least({L}, length(tx) - i + 1)),
                    l -> substr(tx, CAST(i AS INT), CAST(l AS INT))))))
                AS piece
            FROM t
        ) GROUP BY piece
    ),
    vocab AS (
        SELECT piece, c FROM sub WHERE length(piece) = 1
        UNION ALL
        SELECT piece, c FROM (
            SELECT piece, c,
                   ROW_NUMBER() OVER (ORDER BY c DESC, piece) AS rk
            FROM sub WHERE length(piece) >= 2
        ) WHERE rk <= {top_k}
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM vocab),
    vlp AS MATERIALIZED (
        SELECT piece, CAST(round(ln(c * 1.0 / tot) * 1e9) AS BIGINT) AS lp
        FROM vocab, tot
    ),
    walk(doc_id, pos, skip, np, nu, s) AS (
        SELECT doc_id, 0, 0, 0, 0, CAST(0 AS BIGINT) FROM t
        UNION ALL
        SELECT w.doc_id, w.pos + 1,
               CASE WHEN w.skip > 0 THEN w.skip - 1
                    ELSE ({l_choice}) - 1 END,
               CASE WHEN w.skip > 0 THEN w.np ELSE w.np + 1 END,
               CASE WHEN w.skip > 0
                         OR ({lp_choice}) <> CAST({UNK} AS BIGINT)
                    THEN w.nu ELSE w.nu + 1 END,
               CASE WHEN w.skip > 0 THEN w.s
                    ELSE w.s + ({lp_choice}) END
        FROM walk w
        JOIN t ON t.doc_id = w.doc_id AND w.pos < length(t.tx)
{joins}
    ),
    fin AS (
        SELECT w.doc_id, w.np, w.nu, w.s
        FROM walk w
        JOIN t ON t.doc_id = w.doc_id AND w.pos = length(t.tx)
    )
    SELECT t.g AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(t.tx)) AS BIGINT) AS n_chars,
           CAST(SUM(fin.np) AS BIGINT) AS n_pieces,
           CAST(SUM(fin.nu) AS BIGINT) AS n_unk,
           ROUND(CAST(SUM(fin.np) AS BIGINT)
                 / CAST(SUM(length(t.tx)) AS DOUBLE), 6) AS fertility,
           ROUND((CAST(SUM(fin.s) AS BIGINT) / 1e9)
                 / CAST(SUM(length(t.tx)) AS BIGINT), 6) AS ll_per_char
    FROM fin JOIN t ON fin.doc_id = t.doc_id
    GROUP BY t.g ORDER BY t.g
    """


@register("wordpiece_tokenizer_stats", _wordpiece_oracle_sql(64, 4))
def wordpiece_tokenizer_stats(spark, sf_dir):
    """WordPiece greedy longest-match tokenization stats per source
    (`operators/bpe.py wordpiece_greedy_stats`) under the SAME fitted
    vocabulary as unigram_tokenizer_stats — completing the tokenizer
    trio (BPE merges / unigram Viterbi / WordPiece greedy) and
    measuring greedy's fertility/likelihood gap vs the Viterbi optimum
    on identical pieces. Map-only in-document fold; the oracle replays
    fit + greedy scan as a recursive CTE."""
    from ningaloo_turtle_etl_spark.operators.bpe import (
        unigram_vocab,
        wordpiece_greedy_stats,
    )

    docs = load_table(spark, "documents", sf_dir)
    vocab = unigram_vocab(docs, top_k=64, max_piece_len=4)
    return wordpiece_greedy_stats(
        docs, vocab, group_col="source", max_piece_len=4
    )


def _gbm_stumps_oracle_sql(iterations: int = 3, lr: float = 0.5) -> str:
    """Unrolled L2-boosting oracle: per round one residual/unpivot/grid
    CTE chain with cumulative windows on the (feature, value) grid, one
    argmax CTE (micro-quantized score, feature/threshold tiebreak), one
    stump CTE — prediction rebuilt per round from the prior stump CTEs
    in the same CASE association as
    `operators/classify.py gbm_stumps_train`. All CTEs MATERIALIZED."""

    def pred(upto: int) -> str:
        p = "f0.f0"
        for s in range(1, upto + 1):
            p += (
                f" + {lr} * (CASE WHEN st{s}.feature = 'n_chars'"
                f" THEN (CASE WHEN b.x_chars <= st{s}.v"
                f" THEN st{s}.lv ELSE st{s}.rv END)"
                f" ELSE (CASE WHEN b.x_tokens <= st{s}.v"
                f" THEN st{s}.lv ELSE st{s}.rv END) END)"
            )
        return p

    def joins(upto: int) -> str:
        return "".join(f" CROSS JOIN st{s}" for s in range(1, upto + 1))

    parts = [
        f"""
    b AS MATERIALIZED (
        SELECT CAST(n_chars AS DOUBLE) AS x_chars,
               CAST(len({_TOKENS}) AS DOUBLE) AS x_tokens,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS _y
        FROM documents
    ),
    hd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(round(_y * 1e9) AS BIGINT)) AS BIGINT)
                      AS sy
           FROM b),
    f0 AS (SELECT n, (sy / 1e9) / n AS f0 FROM hd)"""
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f""",
    g{t} AS MATERIALIZED (
        SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(rn) AS BIGINT) AS s
        FROM (
            SELECT u.feature, u.v,
                   CAST(round((b._y - ({pred(t - 1)})) * 1e9) AS BIGINT)
                       AS rn
            FROM b CROSS JOIN f0{joins(t - 1)}
            CROSS JOIN LATERAL (VALUES ('n_chars', b.x_chars),
                                ('n_tokens', b.x_tokens)) u(feature, v)
            WHERE u.v IS NOT NULL
        ) GROUP BY feature, v
    ),
    c{t} AS MATERIALIZED (
        SELECT feature, v,
               CAST(SUM(c) OVER (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS nl,
               CAST(SUM(s) OVER (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS sl,
               CAST(SUM(c) OVER (PARTITION BY feature) AS BIGINT) AS nt,
               CAST(SUM(s) OVER (PARTITION BY feature) AS BIGINT) AS st
        FROM g{t}
    ),
    st{t} AS MATERIALIZED (
        SELECT feature, v, (sl / 1e9) / nl AS lv,
               ((st - sl) / 1e9) / (nt - nl) AS rv
        FROM (
            SELECT feature, v, nl, nt, sl, st,
                   CAST(round(((sl / 1e9) * (sl / 1e9) / nl
                        + ((st - sl) / 1e9) * ((st - sl) / 1e9)
                          / (nt - nl)) * 1e6) AS BIGINT) AS sc
            FROM c{t} WHERE nl < nt
            ORDER BY sc DESC, feature ASC, v ASC LIMIT 1
        )
    )"""
        )
    T = iterations
    finals = "\n    UNION ALL ".join(
        f"SELECT {s} AS round, st{s}.feature,"
        f" ROUND(st{s}.v, 6) AS threshold,"
        f" ROUND(st{s}.lv, 6) AS left_value,"
        f" ROUND(st{s}.rv, 6) AS right_value,"
        f" ROUND(f0.f0, 6) AS f0, ROUND(m.mse, 6) AS train_mse"
        f" FROM st{s} CROSS JOIN f0 CROSS JOIN m"
        for s in range(1, T + 1)
    )
    return (
        "WITH "
        + "".join(parts)
        + f""",
    m AS MATERIALIZED (
        SELECT (CAST(SUM(CAST(round((b._y - ({pred(T)}))
                   * (b._y - ({pred(T)})) * 1e9) AS BIGINT)) AS BIGINT)
                / 1e9) / ANY_VALUE(f0.n) AS mse
        FROM b CROSS JOIN f0{joins(T)}
    )
    {finals}
    ORDER BY round"""
    )


@register("gbm_stumps_lang_model", _gbm_stumps_oracle_sql(3, 0.5))
def gbm_stumps_lang_model(spark, sf_dir):
    """L2 gradient-boosted decision stumps predicting lang='en' from
    document length features (`operators/classify.py gbm_stumps_train`,
    3 rounds, lr=1/2): the nonlinear-model rung above
    logistic_gd_weights — each round fits the best variance-reduction
    stump to the current residuals on the distinct-value grid and the
    whole stump trajectory + train MSE replays in the unrolled
    oracle."""
    from ningaloo_turtle_etl_spark.operators.classify import (
        gbm_stumps_train,
    )
    from ningaloo_turtle_etl_spark.operators.text import tokens

    docs = load_table(spark, "documents", sf_dir).select(
        F.col("n_chars").cast("double").alias("n_chars"),
        F.size(tokens(F.lower(F.col("text")))).cast("double").alias(
            "n_tokens"
        ),
        (F.col("lang") == "en").cast("double").alias("y"),
    )
    return gbm_stumps_train(
        docs, ["n_chars", "n_tokens"], "y", iterations=3, lr=0.5
    )


@register(
    "ann_matryoshka_recall",
    matryoshka_recall_oracle_sql(k=10, dims=(16, 32)),
)
def ann_matryoshka_recall(spark, sf_dir):
    """Matryoshka truncation evaluation (Kusupati et al. 2022): recall@10
    of prefix-truncated cosine top-k (first 16 and first 32 of 64 dims)
    against the full-dimension exact neighbors — the acceptance metric
    for serving shortened embeddings (4x/2x cheaper dot products and
    memory) from the same stored vectors, next to the LSH/IVF/PQ recall
    rows. Truncation is a zero-copy list slice; both halves replay in
    the DuckDB oracle."""
    from ningaloo_turtle_etl_spark.operators.similarity import (
        ann_recall_report,
        cosine_topk,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, qs, k=10)
    outs = []
    for d in (16, 32):
        trunc = lambda df: df.select(  # noqa: E731
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        approx = cosine_topk(trunc(emb), trunc(qs), k=10)
        outs.append(
            ann_recall_report(approx, exact).select(
                F.lit(d).alias("trunc_dim"),
                "query_id",
                "n_exact",
                "n_hit",
                "recall_at_k",
            )
        )
    return outs[0].unionByName(outs[1]).orderBy("trunc_dim", "query_id")


@register(
    "ann_matryoshka_topk",
    matryoshka_topk_oracle_sql(k=10, d_short=16, shortlist=50),
)
def ann_matryoshka_topk(spark, sf_dir):
    """Fused two-stage Matryoshka ANN serving: prefix-16 cosine
    SHORTLIST (4x-cheaper dot products over the same stored vectors —
    no index to build, the Matryoshka adaptive-retrieval pattern) then
    EXACT full-dimension re-rank of the 50-candidate shortlist. The
    production sibling of ann_ivf_pq_topk with truncation instead of
    quantization as the cheap tier; full vectors touch only shortlist
    rows. Both stages replay in the oracle."""
    from ningaloo_turtle_etl_spark.operators.similarity import cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") < 5)
    t16 = lambda df: df.select(  # noqa: E731
        "vec_id", F.slice("embedding", 1, 16).alias("embedding")
    )
    short = cosine_topk(t16(emb), t16(qs), k=50).select(
        "query_id", "vec_id"
    )
    # full vectors are fetched BY ID for shortlist rows only — the
    # ivf_pq_topk serving convention
    cand = short.join(emb, on="vec_id").select(
        "query_id", "vec_id", "embedding"
    )
    from ningaloo_turtle_etl_spark.operators.similarity import (
        _as_double,
        _dot,
        _norm,
    )

    q = qs.select(
        F.col("vec_id").alias("query_id"),
        _as_double(F.col("embedding")).alias("qv"),
    ).withColumn("q_norm", _norm(F.col("qv")))
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(_as_double(F.col("embedding")), F.col("qv"))
                / (_norm(_as_double(F.col("embedding"))) * F.col("q_norm")),
                6,
            ).alias("cosine"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .orderBy("query_id", "rank")
    )


@register(
    "modularity_copurchase_brands",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    edges AS (
        SELECT DISTINCT a.pk AS src, b.pk AS dst
        FROM items a JOIN items b USING (ok) WHERE a.pk <> b.pk
    ),
    e2 AS (
        SELECT e.src, e.dst, ps.p_brand AS cs, pd.p_brand AS cd
        FROM edges e
        JOIN part ps ON e.src = ps.p_partkey
        JOIN part pd ON e.dst = pd.p_partkey
    ),
    per_c AS (
        SELECT cs AS community,
               CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
               CAST(COUNT(*) AS BIGINT) AS degree_sum,
               CAST(SUM(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS BIGINT)
                   AS intra_directed
        FROM e2 GROUP BY 1
    ),
    m2 AS (SELECT CAST(SUM(degree_sum) AS BIGINT) AS m2 FROM per_c),
    terms AS (
        SELECT community, n_nodes, degree_sum, intra_directed,
               CAST(intra_directed AS DOUBLE) / CAST(m2 AS DOUBLE)
               - (CAST(degree_sum AS DOUBLE) / CAST(m2 AS DOUBLE))
                 * (CAST(degree_sum AS DOUBLE) / CAST(m2 AS DOUBLE))
                   AS qt
        FROM per_c, m2
    ),
    qtot AS (
        SELECT SUM(CAST(ROUND(qt * 1000000.0, 0) AS HUGEINT)) AS qs
        FROM terms
    )
    SELECT community, n_nodes, degree_sum, intra_directed,
           ROUND(qt, 6) AS q_term,
           ROUND(CAST(qs AS DOUBLE) / 1000000.0, 6) AS modularity
    FROM terms, qtot ORDER BY community
    """,
)
def modularity_copurchase_brands(spark, sf_dir):
    """Newman modularity of the BRAND partition over the part
    co-purchase graph (`operators/graph.py newman_modularity`): scores
    a given partition instead of discovering one — the quality metric
    complement to lpa_copurchase_communities, usable on any labeling
    (LPA output, brands, shard plans). Exact bigint degree/intra
    counts on the community grain; micro-quantized Q terms summed
    exactly."""
    from ningaloo_turtle_etl_spark.operators.graph import (
        copurchase_edges,
        newman_modularity,
    )

    li = load_table(spark, "lineitem", sf_dir)
    parts = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("node"),
        F.col("p_brand").alias("community"),
    )
    edges = copurchase_edges(li)
    return newman_modularity(edges, parts, "node", "community")


@register(
    "cohens_kappa_langid",
    f"""
    WITH t AS (SELECT doc_id, lang, text, {_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id, lang, {_SCORES_SQL} FROM t),
    p AS (
        SELECT lang,
               CASE WHEN greatest(score_en,score_de,score_fr,score_es,score_zh) = 0
                        THEN 'und'
                    WHEN score_de = greatest(score_en,score_de,score_fr,score_es,score_zh) THEN 'de'
                    WHEN score_en = greatest(score_en,score_de,score_fr,score_es,score_zh) THEN 'en'
                    WHEN score_es = greatest(score_en,score_de,score_fr,score_es,score_zh) THEN 'es'
                    WHEN score_fr = greatest(score_en,score_de,score_fr,score_es,score_zh) THEN 'fr'
                    ELSE 'zh' END AS predicted_lang
        FROM s
    ),
    cells AS (
        SELECT lang AS a, predicted_lang AS b, CAST(COUNT(*) AS BIGINT) AS n
        FROM p GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
    ra AS (SELECT a, CAST(SUM(n) AS BIGINT) AS na FROM cells GROUP BY a),
    rb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS nb FROM cells GROUP BY b),
    ag AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN a = b THEN n END), 0) AS BIGINT)
                   AS agree
        FROM cells
    ),
    pc AS (
        SELECT CAST(SUM(CAST(na AS HUGEINT) * CAST(nb AS HUGEINT))
                    AS HUGEINT) AS pesum
        FROM ra JOIN rb ON ra.a = rb.b
    )
    SELECT nn AS n_docs, agree AS n_agree,
           ROUND(CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS po,
           ROUND(CAST(pesum AS DOUBLE)
                 / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS pe,
           ROUND(CASE WHEN 1.0 - CAST(pesum AS DOUBLE)
                              / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)) > 0
                 THEN (CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE)
                       - CAST(pesum AS DOUBLE)
                         / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
                      / (1.0 - CAST(pesum AS DOUBLE)
                               / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
                 END, 6) AS kappa
    FROM tot, ag, pc
    """,
)
def cohens_kappa_langid(spark, sf_dir):
    """Cohen's kappa between the labeled lang column and the marker-word
    lang-ID prediction — the chance-corrected agreement scalar on top of
    lang_id_confusion's matrix (raw accuracy rewards a degenerate
    majority-class predictor; kappa subtracts the marginal-product
    chance rate). All inputs are exact bigint cell counts from ONE
    category-grain aggregate; po/pe/kappa run in one fixed double
    association mirrored by the oracle. Category grain ≤ 6×6 — the
    marginal join broadcasts trivially."""
    from ningaloo_turtle_etl_spark.operators.text import with_lang_id

    docs = load_table(spark, "documents", sf_dir)
    cells = (
        with_lang_id(docs)
        .groupBy(F.col("lang").alias("a"), F.col("predicted_lang").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    ra = cells.groupBy("a").agg(F.sum("n").cast("long").alias("na"))
    rb = cells.groupBy("b").agg(F.sum("n").cast("long").alias("nb"))
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.coalesce(
            F.sum(F.when(F.col("a") == F.col("b"), F.col("n"))), F.lit(0)
        ).cast("long").alias("agree"),
    )
    pe = (
        ra.join(F.broadcast(rb), ra["a"] == rb["b"])
        .agg(
            F.sum(
                F.col("na").cast("decimal(38,0)")
                * F.col("nb").cast("decimal(38,0)")
            ).alias("pesum")
        )
    )
    j = tot.crossJoin(F.broadcast(pe))
    nn = F.col("nn").cast("double")
    po_raw = F.col("agree").cast("double") / nn
    pe_raw = F.col("pesum").cast("double") / (nn * nn)
    return j.select(
        F.col("nn").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        F.round(po_raw, 6).alias("po"),
        F.round(pe_raw, 6).alias("pe"),
        F.round(
            F.when(
                F.lit(1.0) - pe_raw > 0,
                (po_raw - pe_raw) / (F.lit(1.0) - pe_raw),
            ),
            6,
        ).alias("kappa"),
    )


@register(
    "query_likelihood_top10",
    rf"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    p2 AS (
        SELECT doc_id, pr.a AS a, pr.b AS b FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                       i -> struct_pack(a := toks[i], b := toks[i + 1])))
                       AS pr
            FROM t
        )
    ),
    top AS (SELECT a, b FROM (
        SELECT a, b, COUNT(*) AS n FROM p2 GROUP BY 1, 2)
        ORDER BY n DESC, a ASC, b ASC LIMIT 1),
    q AS (SELECT DISTINCT term FROM (
        SELECT a AS term FROM top UNION ALL SELECT b FROM top)),
    idx AS (
        SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM t)
        GROUP BY 1, 2
    ),
    hits AS (SELECT i.doc_id, i.term, i.tf
             FROM idx i JOIN q ON i.term = q.term),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
           FROM idx GROUP BY doc_id),
    stats AS (SELECT CAST(SUM(tf) AS BIGINT) AS ctot FROM idx),
    ctf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS ctf
            FROM hits GROUP BY term),
    cand AS (SELECT DISTINCT doc_id FROM hits),
    g AS (
        SELECT c.doc_id, f.term, f.ctf, h.tf, d.dl, s.ctot
        FROM cand c CROSS JOIN ctf f
        LEFT JOIN hits h ON h.doc_id = c.doc_id AND h.term = f.term
        JOIN dl d ON d.doc_id = c.doc_id, stats s
    ),
    scored AS (
        SELECT doc_id,
               CAST(round(ln((CAST(COALESCE(tf, 0) AS DOUBLE)
                              + CAST(50 AS DOUBLE)
                                * (CAST(ctf AS DOUBLE)
                                   / CAST(ctot AS DOUBLE)))
                             / (CAST(dl AS DOUBLE) + CAST(50 AS DOUBLE)))
                          * 1e6) AS BIGINT) AS sm,
               CASE WHEN tf IS NOT NULL THEN 1 ELSE 0 END AS m
        FROM g
    )
    SELECT doc_id,
           ROUND(SUM(sm) / 1e6, 6) AS ql_score,
           CAST(SUM(m) AS BIGINT) AS n_query_terms_matched
    FROM scored GROUP BY doc_id
    ORDER BY ql_score DESC, doc_id ASC LIMIT 10
    """,
)
def query_likelihood_top10(spark, sf_dir):
    """Dirichlet-smoothed query-likelihood top-10 for the corpus's most
    frequent bigram (`operators/search.py query_likelihood_topk`,
    μ = 50): the language-modeling retrieval rung next to bm25_top10 —
    same inverted index, same query, the other classic scoring family.
    Candidates × query-terms grid keeps the zero-tf smoothed term in
    the score; per-term micro-units before the per-doc sum."""
    from ningaloo_turtle_etl_spark.operators.search import (
        build_inverted_index,
        query_likelihood_topk,
        top_bigram,
    )

    docs = load_table(spark, "documents", sf_dir)
    a, b = top_bigram(docs)
    idx = build_inverted_index(docs)
    return query_likelihood_topk(idx, [a, b], k=10, mu=50.0)


def _mrr_map_oracle_sql(k: int = 10, query_cut: int = 5) -> str:
    """retrieval_mrr_map: MRR + MAP@k of brute-force cosine retrieval
    against label-equality relevance — same rounded-cosine ranking as
    the brute oracle, AP terms micro-quantized before the per-query
    sum so the rational additions are order-proof."""
    dot = (
        "list_sum(list_transform(list_zip("
        "CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), "
        "x -> x[1]*x[2]))"
    )
    norm = (
        "sqrt(list_sum(list_transform(CAST({0}.embedding AS DOUBLE[]), "
        "x -> x*x)))"
    )
    return f"""
    WITH ranked AS (
        SELECT query_id, vec_id, rel,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS rel,
                   ROUND({dot} / ({norm.format('c')} * {norm.format('q')}),
                         6) AS cosine
            FROM embeddings c, embeddings q
            WHERE q.vec_id < {query_cut} AND c.vec_id <> q.vec_id
        )
    ),
    cum AS (
        SELECT query_id, rank, rel,
               SUM(rel) OVER (PARTITION BY query_id ORDER BY rank) AS cumrel
        FROM ranked WHERE rank <= {k}
    ),
    perq AS (
        SELECT query_id,
               CAST(SUM(rel) AS BIGINT) AS n_rel_retrieved,
               MIN(CASE WHEN rel = 1 THEN rank END) AS frr,
               CAST(SUM(CASE WHEN rel = 1 THEN
                        CAST(round(CAST(cumrel AS DOUBLE) / rank * 1e6)
                             AS BIGINT) ELSE 0 END) AS BIGINT) AS ap_micro
        FROM cum GROUP BY query_id
    ),
    nrel AS (
        SELECT q.vec_id AS query_id, CAST(COUNT(*) AS BIGINT) AS n_rel_total
        FROM embeddings q JOIN embeddings c
          ON c.label = q.label AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {query_cut} GROUP BY q.vec_id
    )
    SELECT p.query_id,
           CAST(COALESCE(n.n_rel_total, 0) AS BIGINT) AS n_rel_total,
           p.n_rel_retrieved,
           CAST(COALESCE(p.frr, 0) AS BIGINT) AS first_rel_rank,
           ROUND(CASE WHEN p.frr IS NOT NULL
                      THEN CAST(1 AS DOUBLE) / p.frr ELSE 0.0 END,
                 6) AS reciprocal_rank,
           ROUND(CASE WHEN COALESCE(n.n_rel_total, 0) > 0
                      THEN CAST(p.ap_micro AS DOUBLE) / 1e6
                           / least(n.n_rel_total, {k})
                      ELSE 0.0 END, 6) AS ap_at_k
    FROM perq p LEFT JOIN nrel n ON p.query_id = n.query_id
    ORDER BY p.query_id
    """


@register("retrieval_mrr_map", _mrr_map_oracle_sql(10, 5))
def retrieval_mrr_map(spark, sf_dir):
    """MRR and MAP@10 of brute-force cosine retrieval against
    label-equality relevance — the order-sensitive retrieval-quality
    rung next to ranking_ndcg_eval (reciprocal rank rewards the first
    hit, average precision the whole prefix). Same rounded-cosine
    ranking as embedding_cosine_topk; AP's rational terms quantize to
    integer micro-units before the per-query sum. Scale shape: the
    ranking is the brute baseline's broadcast cross-score (the ANN
    tiers replace it at volume); relevance totals are one broadcast
    self-join on the label dimension."""
    from ningaloo_turtle_etl_spark.operators.similarity import cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    ranked = cosine_topk(emb, q, k=10)
    labels = emb.select("vec_id", "label")
    qlab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    ).filter(F.col("query_id") < 5)
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("rank")
    hits = (
        ranked.join(F.broadcast(labels), on="vec_id")
        .join(F.broadcast(qlab), on="query_id")
        .withColumn(
            "rel", (F.col("label") == F.col("qlabel")).cast("long")
        )
        .withColumn("cumrel", F.sum("rel").over(w))
    )
    ap_term = F.when(
        F.col("rel") == 1,
        F.round(
            F.col("cumrel").cast("double") / F.col("rank") * 1e6, 0
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    perq = hits.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("n_rel_retrieved"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("frr"),
        F.sum(ap_term).alias("ap_micro"),
    )
    nrel = (
        emb.alias("c")
        .join(
            F.broadcast(qlab),
            (F.col("c.label") == F.col("qlabel"))
            & (F.col("c.vec_id") != F.col("query_id")),
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rel_total"))
    )
    out = perq.join(nrel, on="query_id", how="left")
    rr = F.when(
        F.col("frr").isNotNull(),
        F.lit(1.0) / F.col("frr"),
    ).otherwise(F.lit(0.0))
    ap = F.when(
        F.coalesce(F.col("n_rel_total"), F.lit(0)) > 0,
        F.col("ap_micro").cast("double")
        / F.lit(1e6)
        / F.least(F.col("n_rel_total"), F.lit(10)),
    ).otherwise(F.lit(0.0))
    return out.select(
        "query_id",
        F.coalesce("n_rel_total", F.lit(0)).cast("long").alias("n_rel_total"),
        "n_rel_retrieved",
        F.coalesce("frr", F.lit(0)).cast("long").alias("first_rel_rank"),
        F.round(rr, 6).alias("reciprocal_rank"),
        F.round(ap, 6).alias("ap_at_k"),
    ).orderBy("query_id")


def _ktruss_oracle_sql(k: int = 4, rounds: int = 10, max_part: int = 2000) -> str:
    """ktruss_copurchase_hist: unrolled synchronous truss peeling (the
    k_core oracle's MATERIALIZED chaining — inlined, each round's CTE
    re-expands the triangle join exponentially). ``rounds`` only needs
    to be >= the true peel depth at every graded SF (measured 0 / 2 / 2
    at sf0.001 / 0.01 / 0.1 with the part cut; 10 leaves the r12-ADVICE
    margin — fixpoint rounds are idempotent no-ops, so the extra unrolls
    cost little and a peel depth up to 10 can no longer diverge the
    oracle from a correctly-converged operator); the Spark operator
    independently raises past ITS max_rounds if it hasn't converged."""
    parts = [
        f"""
    eo AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS s
           FROM lineitem WHERE l_partkey < {max_part}),
    e0 AS MATERIALIZED (
        SELECT DISTINCT a.s AS a, b.s AS b
        FROM eo a JOIN eo b ON a.ok = b.ok AND a.s < b.s
    )"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    t{i} AS MATERIALIZED (
        SELECT xy.a AS x, xy.b AS y, yz.b AS z
        FROM e{i - 1} xy
        JOIN e{i - 1} yz ON xy.b = yz.a
        JOIN e{i - 1} xz ON xz.a = xy.a AND xz.b = yz.b
    ),
    s{i} AS MATERIALIZED (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT x AS a, y AS b FROM t{i}
            UNION ALL SELECT y AS a, z AS b FROM t{i}
            UNION ALL SELECT x AS a, z AS b FROM t{i}
        ) GROUP BY 1, 2
    ),
    e{i} AS MATERIALIZED (
        SELECT e.a, e.b FROM e{i - 1} e LEFT JOIN s{i} s USING (a, b)
        WHERE COALESCE(s.n, 0) >= {k - 2}
    )"""
        )
    return (
        "WITH "
        + "".join(parts)
        + f""",
    tf AS MATERIALIZED (
        SELECT xy.a AS x, xy.b AS y, yz.b AS z
        FROM e{rounds} xy
        JOIN e{rounds} yz ON xy.b = yz.a
        JOIN e{rounds} xz ON xz.a = xy.a AND xz.b = yz.b
    ),
    sf AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT x AS a, y AS b FROM tf
            UNION ALL SELECT y AS a, z AS b FROM tf
            UNION ALL SELECT x AS a, z AS b FROM tf
        ) GROUP BY 1, 2
    )
    SELECT CAST(COALESCE(s.n, 0) AS BIGINT) AS support,
           CAST(COUNT(*) AS BIGINT) AS n_edges
    FROM e{rounds} e LEFT JOIN sf s USING (a, b)
    GROUP BY 1 ORDER BY support"""
    )


@register("ktruss_copurchase_hist", _ktruss_oracle_sql(4, 10, 2000))
def ktruss_copurchase_hist(spark, sf_dir):
    """4-truss backbone of the copurchase graph (`operators/graph.py
    k_truss`, parts < 2000 so the subgraph grain is SF-stable): every
    surviving edge lies in >= 2 triangles among surviving edges — the
    cohesion rung above kcore_copurchase that also demands shared-
    neighbor witnesses, peeled synchronously to the fixpoint. Output is
    the final support histogram (support, n_edges); the per-edge grain
    stays inside the operator."""
    from ningaloo_turtle_etl_spark.operators.graph import k_truss

    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_partkey") < 2000
    )
    eo = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("s")
    ).distinct()
    edges = (
        eo.alias("a")
        .join(eo.alias("b"), on="ok")
        .where(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    out = k_truss(edges, k=4, max_rounds=16)
    return (
        out.groupBy("support")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .orderBy("support")
    )
