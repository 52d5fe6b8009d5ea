"""Distributed BPE induction vs a from-scratch Python reference: the
learned merges must match merge-for-merge, and the fold that applies a
merge must handle overlapping runs exactly like the sequential algorithm."""

from __future__ import annotations

import re
from collections import Counter

import pyspark.sql.functions as F

from ningaloo_turtle_etl_spark.operators.bpe import (
    END_MARK,
    apply_merge,
    learn_bpe,
    pair_counts,
    with_symbols,
    word_frequencies,
)
from ningaloo_turtle_etl_spark.operators.cache import release_tracked_caches
from ningaloo_turtle_etl_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _python_bpe(word_freqs: dict[str, int], num_merges: int):
    """Sennrich et al. reference: greedy pair merges over the word-frequency
    table, ties broken (count desc, left asc, right asc)."""
    vocab = {tuple(list(w) + [END_MARK]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, n))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges, vocab


def _corpus_word_freqs(spark) -> dict[str, int]:
    docs = load_table(spark, "documents", SF_DIR)
    freqs: Counter = Counter()
    for r in docs.select(F.lower("text").alias("t")).collect():
        for w in re.split(r"\s+", r["t"]):
            if w:
                freqs[w] += 1
    return dict(freqs)


def test_learn_bpe_matches_python_reference(spark):
    docs = load_table(spark, "documents", SF_DIR)
    try:
        got_merges, sym = learn_bpe(docs, num_merges=8)
        expected_merges, expected_vocab = _python_bpe(_corpus_word_freqs(spark), 8)
        assert got_merges == expected_merges
        # final symbol tables agree word-for-word
        got_vocab = {
            tuple(r["symbols"]): r["freq"]
            for r in sym.select("symbols", "freq").collect()
        }
        assert got_vocab == expected_vocab
    finally:
        release_tracked_caches()


def test_apply_merge_nonoverlapping_fold(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a", "b"],)],
        "symbols array<string>",
    )
    got = [
        r["m"] for r in df.select(apply_merge(F.col("symbols"), "a", "a").alias("m"))
        .collect()
    ]
    assert got == [["aa", "a"], ["aa", "aa"], ["b", "aa", "b"]]


def test_pair_counts_weighted_by_freq(spark):
    docs = load_table(spark, "documents", SF_DIR)
    pc = pair_counts(with_symbols(word_frequencies(docs)))
    rows = {(r["left"], r["right"]): r["pair_count"] for r in pc.collect()}
    expected: Counter = Counter()
    for w, f in _corpus_word_freqs(spark).items():
        syms = list(w) + [END_MARK]
        for a, b in zip(syms, syms[1:]):
            expected[(a, b)] += f
    assert rows == dict(expected)


def test_learn_bpe_empty_corpus_stops_early(spark):
    docs = spark.createDataFrame([("",), ("   ",)], "text string")
    try:
        merges, sym = learn_bpe(docs, num_merges=4)
        assert merges == []
        assert sym.count() == 0
    finally:
        release_tracked_caches()


def test_encode_corpus_matches_python_reference(spark):
    """Encoding must apply the learned merges exactly (greedy left-to-right
    per merge, in merge order) and fall back to character symbols for
    out-of-vocabulary words."""
    from ningaloo_turtle_etl_spark.operators.bpe import encode_corpus

    train = spark.createDataFrame(
        [(1, "low lower lowest low low newer new"),
         (2, "the them theme the the banana")],
        "doc_id long, text string",
    )
    merges, sym = learn_bpe(train, num_merges=4)
    try:
        # encode a DIFFERENT frame: includes an OOV word ('zap')
        apply_df = spark.createDataFrame(
            [(10, "low newer zap"), (11, "the lowest theme"), (12, None)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["token_stream"])
            for r in encode_corpus(apply_df, sym, merges).collect()
        }
    finally:
        release_tracked_caches()

    def py_encode(word: str) -> list[str]:
        syms = list(word) + [END_MARK]
        for left, right, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    exp = {}
    for did, text in [(10, "low newer zap"), (11, "the lowest theme"), (12, None)]:
        toks = []
        for w in (text or "").lower().split():
            toks.extend(py_encode(w))  # OOV words get the merges too
        exp[did] = (len(toks), " ".join(toks))
    assert got == exp
    # the OOV word really went through the merge-applying fallback
    assert "z a p </w>" in got[10][1]


def test_unigram_viterbi_replica_and_compression(spark):
    """unigram_vocab + unigram_viterbi_stats vs an exact Python Viterbi
    replica (same nano-quantized log-probs, same longer-piece tie-break),
    plus the semantics: with multi-char pieces in the vocab the
    segmentation compresses (fertility < 1), and under a singles-only
    vocab it degrades to char-level (fertility exactly 1)."""
    import math

    from ningaloo_turtle_etl_spark.operators.bpe import (
        unigram_viterbi_stats,
        unigram_vocab,
    )

    rows = [
        (1, "A", "abab abab"),
        (2, "A", "ababab"),
        (3, "B", "ba ba ab"),
        (4, "B", "aaaa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    vocab = unigram_vocab(docs, top_k=4, max_piece_len=4)
    got = {
        r["source"]: r
        for r in unigram_viterbi_stats(docs, vocab, "source").collect()
    }

    total = sum(c for _, c in vocab)
    lp = {p: round(math.log(c / total) * 1e9) for p, c in vocab}

    def viterbi(tx):
        n = len(tx)
        dp = [(0, 0)] + [None] * n
        for i in range(1, n + 1):
            best = None
            for l in range(1, min(4, i) + 1):
                piece = tx[i - l : i]
                if piece in lp and dp[i - l] is not None:
                    key = (dp[i - l][0] + lp[piece]) * 8 + l
                    if best is None or key > best:
                        best = key
            ld = best % 8
            dp[i] = ((best - ld) // 8, dp[i - ld][1] + 1)
        return dp[n]

    agg = {}
    for _, src, tx in rows:
        s, c = viterbi(tx.lower())
        sc, nc, np_, n = agg.get(src, (0, 0, 0, 0))
        agg[src] = (sc + s, nc + len(tx), np_ + c, n + 1)
    for src, (sc, nc, np_, n) in agg.items():
        r = got[src]
        assert r["n_docs"] == n and r["n_chars"] == nc
        assert r["n_pieces"] == np_
        assert abs(r["fertility"] - round(np_ / nc, 6)) < 1e-9
        assert abs(r["ll_per_char"] - round((sc / 1e9) / nc, 6)) < 1e-9
        assert r["fertility"] < 1.0  # multi-char pieces compress

    singles = [(p, c) for p, c in vocab if len(p) == 1]
    char_level = {
        r["source"]: r
        for r in unigram_viterbi_stats(docs, singles, "source").collect()
    }
    assert all(r["fertility"] == 1.0 for r in char_level.values())


def test_wordpiece_greedy_replica_unk_and_viterbi_gap(spark):
    """Three pins: (a) the greedy scan matches a Python replica
    piece-for-piece on a hand vocab (including a case where greedy and
    Viterbi disagree); (b) characters outside the vocab count as [UNK]
    pieces at the fixed penalty; (c) under the SAME vocab, greedy
    fertility >= Viterbi fertility and greedy ll <= Viterbi ll (Viterbi
    is the optimum)."""
    import math

    from ningaloo_turtle_etl_spark.operators.bpe import (
        _WP_UNK_NANOS,
        unigram_viterbi_stats,
        wordpiece_greedy_stats,
    )

    # vocab where greedy is suboptimal on 'abc': greedy takes 'ab'+'c'
    # (2 pieces) but if 'c' were absent... use 'abcd': greedy ab+cd,
    # viterbi could pick a+bcd if bcd is much more likely
    vocab = [
        ("a", 10), ("b", 10), ("c", 10), ("d", 10),
        ("ab", 50), ("bcd", 400),
    ]
    total = sum(c for _, c in vocab)
    lp = {p: round(math.log(c / total) * 1e9) for p, c in vocab}
    docs = spark.createDataFrame(
        [("g", "abcd"), ("g", "ab"), ("g", "xa")], "source string, text string"
    )
    got = wordpiece_greedy_stats(
        docs, vocab, group_col="source", max_piece_len=4
    ).collect()[0]
    # greedy: 'abcd' -> ab, c, d (3 pieces); 'ab' -> ab (1);
    # 'xa' -> [UNK], a (2, one unk)
    want_np = 3 + 1 + 2
    want_s = (
        lp["ab"] + lp["c"] + lp["d"] + lp["ab"] + _WP_UNK_NANOS + lp["a"]
    )
    assert got["n_pieces"] == want_np
    assert got["n_unk"] == 1
    assert got["n_chars"] == 8
    assert got["ll_per_char"] == round((want_s / 1e9) / 8, 6)

    # Viterbi on 'abcd' alone: a + bcd beats ab + c + d
    docs1 = spark.createDataFrame(
        [("g", "abcd")], "source string, text string"
    )
    vit = unigram_viterbi_stats(
        docs1, vocab, group_col="source", max_piece_len=4
    ).collect()[0]
    assert vit["n_pieces"] == 2  # a + bcd
    grd = wordpiece_greedy_stats(
        docs1, vocab, group_col="source", max_piece_len=4
    ).collect()[0]
    assert grd["n_pieces"] == 3  # ab + c + d
    assert grd["fertility"] >= vit["fertility"]
    assert grd["ll_per_char"] <= vit["ll_per_char"]
