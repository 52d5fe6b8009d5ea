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


# Sentinel for "position unreachable / before the string starts" in the
# unigram-Viterbi fold: far below any real nano-scaled log-likelihood, far
# above long-overflow when a candidate adds one more piece logp.
_VIT_SENT = -(1 << 62)


def unigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 64,
    max_piece_len: int = 4,
) -> list[tuple[str, int]]:
    """Fit the unigram-LM candidate vocabulary (the seed step of
    SentencePiece's unigram model, Kudo 2018): count EVERY substring of
    length 1..``max_piece_len`` of the lowercased corpus, keep all
    length-1 pieces (so segmentation is always feasible) plus the
    ``top_k`` most frequent multi-char pieces, ties broken by piece
    string. Returns [(piece, count)] — a BOUNDED driver list
    (charset + top_k rows; the collect is the documented dimension-sized
    exception, same class as the BPE merge list).

    Scale shape: the substring explode is map-only (nested transform,
    no join); the count shuffle is piece-keyed with map-side combine;
    top-k is TakeOrdered, never a global window."""
    L = int(max_piece_len)
    tx = F.lower(F.col(text_col))
    t = docs.select(tx.alias("tx")).where(
        F.col("tx").isNotNull() & (F.length("tx") > 0)
    )
    # same small-input spread as the DP pass: the substring explode is
    # map-heavy, and a single-file corpus would run it on one core
    par = t.sparkSession.sparkContext.defaultParallelism
    if t.rdd.getNumPartitions() < par:
        t = t.repartition(par)
    pieces = t.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("tx")),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(F.lit(L), F.length("tx") - i + 1),
                        ),
                        lambda l: F.col("tx").substr(i, l),
                    ),
                )
            )
        ).alias("piece")
    )
    counts = pieces.groupBy("piece").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    singles = counts.filter(F.length("piece") == 1)
    multis = (
        counts.filter(F.length("piece") >= 2)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(int(top_k))
    )
    rows = singles.union(multis).collect()  # bounded: charset + top_k
    return sorted((r["piece"], int(r["c"])) for r in rows)


def unigram_viterbi_stats(
    docs: DataFrame,
    vocab: list[tuple[str, int]],
    group_col: str = "source",
    text_col: str = "text",
    max_piece_len: int = 4,
) -> DataFrame:
    """Viterbi segmentation of every document under a unigram piece LM
    (the E-step scoring pass of SentencePiece's unigram trainer, Kudo
    2018), rolled up to tokenizer-evaluation stats per group:

        dp[i] = max over piece p ending at i (len ≤ L, p ∈ vocab) of
                dp[i − |p|] + ln P(p)

    with P(p) = count(p) / Σ counts over the vocabulary. The DP runs as
    ONE in-document `F.aggregate` fold over character positions — state
    is the last L (score, pieces) cells — so segmentation is map-only
    and fuses with the scan: no joins, no shuffles until the final
    group rollup; cross-document parallelism is full.

    Determinism: ln P quantizes to integer NANOS per piece BEFORE the DP
    (so the fold is exact-integer and a 1-ulp ln() difference between
    engines — or between Python literals and DuckDB — is absorbed by the
    rounding, the repo's accepted libm caveat); the argmax packs
    (score, piece_len) into one BIGINT key (score·8 + len, monotone in
    score, longer piece wins ties) replayed bit-for-bit by the oracle's
    recursive CTE.

    Returns one row per group: n_docs, n_chars, n_pieces, fertility
    (pieces per char — the compression the learned vocab buys vs 1.0
    for char-level), ll_per_char (mean log-likelihood per char), 6dp."""
    import math

    L = int(max_piece_len)
    if not vocab:
        raise ValueError("vocab must be non-empty")
    total = sum(c for _, c in vocab)
    lp = {p: int(round(math.log(c / total) * 1e9)) for p, c in vocab}
    if any(len(p) > L for p, _ in vocab):
        raise ValueError("vocab piece longer than max_piece_len")
    m = F.create_map(
        *[F.lit(x) for kv in lp.items() for x in (kv[0], kv[1])]
    )
    tx = F.lower(F.col(text_col))
    t = docs.select(
        F.col(group_col).alias("g"), tx.alias("tx")
    ).where(F.col("tx").isNotNull() & (F.length("tx") > 0))
    # The DP is CPU-bound per document: if the input arrives in fewer
    # partitions than the session has cores (one small parquet file),
    # spread the doc grain first — one narrow shuffle of the text column
    # buys full-core segmentation (95 s -> seconds on the sf0.1 single
    # file). At real corpus scale partitions >> cores and this is a
    # no-op.
    par = t.sparkSession.sparkContext.defaultParallelism
    if t.rdd.getNumPartitions() < par:
        t = t.repartition(par)

    # state: array of L dp cells, state[k] = dp[i-1-k] = (score, pieces)
    cell = lambda s, c: F.struct(  # noqa: E731
        F.lit(s).cast("long").alias("s"), F.lit(c).cast("int").alias("c")
    )
    init = F.array(cell(0, 0), *[cell(_VIT_SENT, 0) for _ in range(L - 1)])

    def merge(acc, i):
        cands = []
        for l in range(1, L + 1):
            prev = F.element_at(acc, l)
            piece_lp = F.element_at(m, F.col("tx").substr(i - (l - 1), F.lit(l)))
            cands.append(
                F.when(
                    (F.lit(l) <= i)
                    & piece_lp.isNotNull()
                    & (prev["s"] > F.lit(_VIT_SENT // 2)),
                    (prev["s"] + piece_lp) * 8 + l,
                ).otherwise(F.lit(_VIT_SENT))
            )
        best = F.greatest(*cands)
        l_dec = ((best % 8) + 8) % 8
        s_new = ((best - l_dec) / F.lit(8)).cast("long")
        c_prev = None
        for l in range(L, 0, -1):
            base = F.element_at(acc, l)["c"] + F.lit(1)
            c_prev = (
                base
                if c_prev is None
                else F.when(l_dec == l, base).otherwise(c_prev)
            )
        new_cell = F.struct(
            s_new.alias("s"), c_prev.cast("int").alias("c")
        )
        return F.concat(
            F.array(new_cell), F.slice(acc, 1, L - 1)
        )

    state = F.aggregate(
        F.sequence(F.lit(1), F.length("tx")), init, merge
    )
    final = F.element_at(state, 1)
    scored = t.select(
        "g",
        F.length("tx").cast("long").alias("nch"),
        final["s"].alias("s"),
        final["c"].cast("long").alias("np"),
    )
    return (
        scored.groupBy(F.col("g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nch").cast("long").alias("n_chars"),
            F.sum("np").cast("long").alias("n_pieces"),
            F.round(
                F.sum("np") / F.sum("nch").cast("double"), 6
            ).alias("fertility"),
            F.round(
                (F.sum("s") / F.lit(1e9)) / F.sum("nch"), 6
            ).alias("ll_per_char"),
        )
        .orderBy(group_col)
    )


# [UNK]-character penalty for WordPiece greedy segmentation: a char not in
# the fitted vocabulary scores this many nanos (ln-prob scale). Far below
# any real piece logp, far above long overflow when summed per document.
_WP_UNK_NANOS = -25_000_000_000


def wordpiece_greedy_stats(
    docs: DataFrame,
    vocab: list[tuple[str, int]],
    group_col: str = "source",
    text_col: str = "text",
    max_piece_len: int = 4,
) -> DataFrame:
    """GREEDY LONGEST-MATCH-FIRST segmentation (the WordPiece/BERT
    tokenization rule, Wu et al. 2016) under the same fitted substring
    vocabulary as :func:`unigram_viterbi_stats` — completing the
    tokenizer trio (BPE: merge-rule replay; unigram: global-optimum
    Viterbi; WordPiece: local greedy): at each position take the
    LONGEST vocab piece that matches, advance by its length. Greedy is
    what production BERT tokenizers actually run, and its fertility is
    provably ≥ Viterbi's under the same vocab (pinned in tests) — this
    operator measures that gap per group.

    One simplification vs BERT, documented: no '##' continuation-form
    distinction — the fitted vocab is position-free (the unigram fit
    produces no word-boundary roles), so initial and continuation
    positions share pieces. A character absent from the vocabulary
    consumes one position as an [UNK] piece with a fixed penalty
    log-prob (−25 ln-units — below any real piece).

    Scale shape: identical to the Viterbi pass — the scan is ONE
    in-document `F.aggregate` fold over character positions (state:
    skip-counter + piece count + nano score), map-only, no joins before
    the group rollup; the CPU-bound fold gets the same
    partitions<cores spread. Determinism: ln P quantizes to integer
    nanos per piece before the fold; longest-match needs no tiebreak
    (lengths are distinct); the oracle replays the scan as a recursive
    CTE.

    Returns one row per group: n_docs, n_chars, n_pieces, n_unk,
    fertility, ll_per_char, 6dp."""
    import math

    L = int(max_piece_len)
    if not vocab:
        raise ValueError("vocab must be non-empty")
    total = sum(c for _, c in vocab)
    lp = {p: int(round(math.log(c / total) * 1e9)) for p, c in vocab}
    if any(len(p) > L for p, _ in vocab):
        raise ValueError("vocab piece longer than max_piece_len")
    m = F.create_map(
        *[F.lit(x) for kv in lp.items() for x in (kv[0], kv[1])]
    )
    tx = F.lower(F.col(text_col))
    t = docs.select(
        F.col(group_col).alias("g"), tx.alias("tx")
    ).where(F.col("tx").isNotNull() & (F.length("tx") > 0))
    par = t.sparkSession.sparkContext.defaultParallelism
    if t.rdd.getNumPartitions() < par:
        t = t.repartition(par)

    # state struct: skip (chars left inside the current piece), np
    # (pieces so far), nu (unk pieces so far), s (nano score)
    init = F.struct(
        F.lit(0).cast("int").alias("skip"),
        F.lit(0).cast("int").alias("np"),
        F.lit(0).cast("int").alias("nu"),
        F.lit(0).cast("long").alias("s"),
    )

    def merge(acc, i):
        # longest match at position i: try l = L .. 1; encode the chosen
        # (logp, l) pair via coalesce over length-descending lookups
        choice = None  # struct(lp long, l int)
        for l in range(L, 0, -1):
            piece_lp = F.element_at(m, F.col("tx").substr(i, F.lit(l)))
            cand = F.when(
                (i + F.lit(l) - 1 <= F.length("tx"))
                & piece_lp.isNotNull(),
                F.struct(
                    piece_lp.alias("lp"), F.lit(l).cast("int").alias("l")
                ),
            )
            choice = cand if choice is None else F.coalesce(choice, cand)
        choice = F.coalesce(
            choice,
            F.struct(
                F.lit(_WP_UNK_NANOS).cast("long").alias("lp"),
                F.lit(1).cast("int").alias("l"),
            ),
        )
        inside = acc["skip"] > 0
        is_unk = choice["lp"] == F.lit(_WP_UNK_NANOS)
        return F.struct(
            F.when(inside, acc["skip"] - 1)
            .otherwise(choice["l"] - 1)
            .cast("int")
            .alias("skip"),
            F.when(inside, acc["np"])
            .otherwise(acc["np"] + 1)
            .cast("int")
            .alias("np"),
            F.when(inside | ~is_unk, acc["nu"])
            .otherwise(acc["nu"] + 1)
            .cast("int")
            .alias("nu"),
            F.when(inside, acc["s"])
            .otherwise(acc["s"] + choice["lp"])
            .cast("long")
            .alias("s"),
        )

    state = F.aggregate(
        F.sequence(F.lit(1), F.length("tx")), init, merge
    )
    scored = t.select(
        "g",
        F.length("tx").cast("long").alias("nch"),
        state["np"].cast("long").alias("np"),
        state["nu"].cast("long").alias("nu"),
        state["s"].alias("s"),
    )
    return (
        scored.groupBy(F.col("g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nch").cast("long").alias("n_chars"),
            F.sum("np").cast("long").alias("n_pieces"),
            F.sum("nu").cast("long").alias("n_unk"),
            F.round(
                F.sum("np") / F.sum("nch").cast("double"), 6
            ).alias("fertility"),
            F.round(
                (F.sum("s") / F.lit(1e9)) / F.sum("nch"), 6
            ).alias("ll_per_char"),
        )
        .orderBy(group_col)
    )
