"""Distributed BPE tokenizer induction (Sennrich et al., ACL 2016) — the
"train the tokenizer on the corpus" step of a training-data pipeline.

Scale shape: classic BPE trains on the WORD-FREQUENCY table, not the raw
corpus, so the corpus is touched exactly once (token explode → groupBy
word). Every merge iteration then runs over that vocabulary-sized frame:
one weighted adjacent-pair aggregation (map-side combined, pair-keyed
shuffle of vocabulary width) plus a map-only fold that applies the chosen
merge. The driver holds only the running merge list (N rows) and the
argmax pair per step — never data. N merges = N small jobs, the same
driver-looped-but-each-step-distributed shape as graph.py's connected
components.

Determinism: the argmax pair breaks ties by (count desc, left asc, right
asc); the fold applies merges left-to-right non-overlapping exactly like
the reference algorithm (an "aaa" word under merge (a,a) becomes
["aa","a"]). Exact-equality parity with a from-scratch Python BPE is
pinned in tests/test_bpe.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

END_MARK = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the vocabulary-sized
    training table every BPE step runs on."""
    from ningaloo_turtle_etl_spark.operators.text import tokens

    return (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def with_symbols(wordfreq: DataFrame) -> DataFrame:
    """Initial symbol sequences: characters plus the end-of-word marker
    (distinguishes 'st' word-final from 'st' word-internal, per the
    paper)."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return wordfreq.select(
        "word",
        "freq",
        F.concat(chars, F.array(F.lit(END_MARK))).alias("symbols"),
    )


def pair_counts(symframe: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol table: (left, right,
    pair_count). One explode + one pair-keyed aggregation."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("symbols") - 1),
        lambda i: F.struct(
            F.element_at("symbols", i).alias("l"),
            F.element_at("symbols", i + 1).alias("r"),
        ),
    )
    exploded = symframe.select("freq", F.explode(pairs).alias("p"))
    return exploded.groupBy(
        F.col("p.l").alias("left"), F.col("p.r").alias("right")
    ).agg(F.sum("freq").alias("pair_count"))


def apply_merge(symbols: Column, left: str, right: str) -> Column:
    """Merge every left-to-right non-overlapping (left, right) adjacency in
    a symbol array — a pure-Catalyst fold (no Python worker): append each
    symbol, or replace the just-appended left with left||right when the
    current symbol completes the pair."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    docs: DataFrame, num_merges: int, text_col: str = "text"
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges; returns (merges, final symbol
    table). merges[i] = (left, right, pair_count at selection time).

    Each iteration caches the new symbol table and releases the previous
    one (the fold otherwise nests N deep in a single plan); caches are
    vocabulary-sized. Stops early when no adjacent pair remains."""
    sym = with_symbols(word_frequencies(docs, text_col)).cache()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(num_merges):
            best = (
                pair_counts(sym)
                .orderBy(
                    F.desc("pair_count"), F.asc("left"), F.asc("right")
                )
                .limit(1)
                .collect()
            )
            if not best:
                break
            left, right, n = (
                best[0]["left"],
                best[0]["right"],
                int(best[0]["pair_count"]),
            )
            merges.append((left, right, n))
            nxt = sym.withColumn(
                "symbols", apply_merge(F.col("symbols"), left, right)
            ).cache()
            try:
                nxt.count()  # materialize before dropping the parent cache
            except Exception:
                nxt.unpersist()  # don't leak the half-built iteration cache
                raise
            sym.unpersist()
            sym = nxt
        from ningaloo_turtle_etl_spark.operators.cache import track_cache

        # The returned table stays cached (callers consume it lazily);
        # released via operators.cache.release_tracked_caches / scope.
        return merges, track_cache(sym)
    except Exception:
        sym.unpersist()
        raise


def merge_table(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merges as a DataFrame: (step, left, right, merged,
    pair_count) — the artifact a tokenizer ships."""
    rows = [
        (i + 1, l, r, l + r, n) for i, (l, r, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "step int, left string, right string, merged string, pair_count long"
    )


def encode_corpus(
    docs: DataFrame,
    symtable: DataFrame,
    merges: list[tuple[str, str, int]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained BPE: per doc, the token count and
    the space-joined token stream under the merges baked into ``symtable``
    (the (word, symbols) frame ``learn_bpe`` returns).

    Scale shape: the corpus explodes once to (id, word-position, word); the
    vocabulary joins on word — vocabulary-sized, so AQE broadcasts it and
    the corpus side stays map-only (the classic big-fact × small-dim
    tokenizer shape); reassembly is ONE groupBy(id) carrying the per-word
    symbol arrays. Out-of-vocabulary words are encoded by applying the
    ``merges`` list (pass ``learn_bpe``'s first return) to their character
    symbols — what a real subword tokenizer does with unseen words, not a
    bail-to-characters; with ``merges=None`` the fallback is bare chars +
    end mark. Either way encoding is total for any input."""
    from ningaloo_turtle_etl_spark.operators.text import tokens

    words = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "word"),
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    fallback = F.concat(chars, F.array(F.lit(END_MARK)))
    for left, right, _n in merges or []:
        fallback = apply_merge(fallback, left, right)
    joined = words.join(
        symtable.select("word", "symbols"), on="word", how="left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("symbols"), fallback).alias("symbols"),
    )
    per_doc = joined.groupBy(id_col).agg(
        F.sum(F.size("symbols")).alias("n_tokens"),
        F.concat_ws(
            " ",
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "symbols"))
                    ),
                    lambda s: s.symbols,
                )
            ),
        ).alias("token_stream"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("token_stream", F.lit("")).alias("token_stream"),
        )
    )
