"""Semantic pins for the unigram-LM (SentencePiece) tokenizer trainer
(round-8 wave 1; the auto-parametrized oracle test in
test_oracle_queries.py covers hash parity at sf0.001 — these pin the
invariants a hash match alone would not prove, including the
distributed-vs-python trainer parity proof on a corpus RICHER than the
31-word gate vocabulary, and a pure-python third-engine replay of the
whole token-counts pipeline)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow.parquet as pq

from sea_streamer_spark.operators.unigram import (
    UNK_COST,
    py_train_unigram,
    py_viterbi,
    train_unigram,
    viterbi_pieces,
    viterbi_token_count,
    _cost_map_literal,
)
from sea_streamer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


# ------------------------------------------------------------ pure python


def test_py_trainer_learns_repeated_piece():
    # "abab" repeated dominates: a multi-char piece covering the repeat
    # must survive training and segment "abab…" into fewer tokens than
    # characters.
    wc = {"abababab": 50, "abab": 30, "xy": 5, "q": 3}
    vocab = py_train_unigram(wc)
    pieces = {p for p, _c, _co in vocab}
    assert {"a", "b", "x", "y", "q"} <= pieces  # chars always survive
    assert any(len(p) > 1 and set(p) <= {"a", "b"} for p in pieces)
    costs = {p: co for p, _c, co in vocab}
    n_tok, path = py_viterbi("abababab", costs)
    assert n_tok < 8 and "".join(reversed(path)) == "abababab"
    assert n_tok == len(path)


def test_py_trainer_mstep_fixed_point_consistent():
    # Every cost is exactly -round(1e6·ln(count/total)) of the emitted
    # counts — the vocabulary row IS the full M-step witness.
    wc = {"spark": 10, "sparkle": 4, "park": 6}
    vocab = py_train_unigram(wc)
    total = sum(c for _p, c, _co in vocab)
    for p, c, co in vocab:
        assert co == -round(1e6 * math.log(c / total))
        assert c >= 1 and (len(p) == 1 or c >= 2)


def test_py_viterbi_unk_and_tiebreak():
    costs = {"a": 100, "b": 100, "ab": 150}
    # "ab" as one piece (cost 150·1024+1 per token) beats "a"+"b"
    # (200·1024+2): fewer micro-nats wins.
    n, path = py_viterbi("ab", costs)
    assert (n, path) == (1, ["ab"])
    # cost tie between ["ab"] and ["c?"+…]: unseen char pays UNK_COST and
    # still segments (coverage guarantee).
    n, path = py_viterbi("zb", costs)
    assert n == 2 and path[::-1] == ["z", "b"]
    # exact combined tie (cost AND token count): the k-encode prefers the
    # SHORTER piece at the final boundary.
    tie = {"a": 100, "b": 100, "c": 200, "bc": 300, "abc": 400, "ab": 200}
    # paths ["ab","c"] and ["abc"]… construct a true tie instead:
    # "ab"(200)+ "c"(200) = 400 micro @2 tokens vs "abc"(400) @1 token —
    # token count breaks it first (1 < 2), abc wins.
    n, path = py_viterbi("abc", tie)
    assert (n, path) == (1, ["abc"])


# ------------------------------------------------- distributed vs python


def test_trainer_parity_sf0001(spark):
    """The BPE-style trainer parity proof: the distributed trainer
    (seed aggregation + per-round Viterbi explode/count over the word
    table) emits byte-for-byte the python reference's vocabulary."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    wc: Counter = Counter()
    for text in t.column("text").to_pylist():
        for w in re.split(r"\s+", text or ""):
            if w:
                wc[w] += 1
    py = py_train_unigram(dict(wc))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert train_unigram(docs) == py


def test_trainer_parity_rich_crafted_corpus(spark):
    """Parity on a corpus with a much richer substring lattice than the
    gate corpus's 31 words — overlapping repeats, shared prefixes and
    suffixes, punctuation-free unicode-ish variety, and words whose best
    segmentation changes between EM rounds."""
    texts = [
        "internationalization international internal nation nationalize",
        "tokenizer tokenize token tokens tokenized tokenizing",
        "sparksql sparkly spark sparse parse parser parsing",
        "aaaa aaaaaaa aaa aa a abab ababab abba baba",
        "prefixpost prefix postfix fixpoint pointfree freeform",
        "internationalization tokenization normalization realization",
    ] * 3
    wc: Counter = Counter()
    for text in texts:
        for w in text.split():
            wc[w] += 1
    py = py_train_unigram(dict(wc))
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    sp = train_unigram(docs)
    assert sp == py
    assert any(len(p) > 3 for p, _c, _co in sp)  # long pieces learned


def test_spark_viterbi_matches_python_per_word(spark):
    wc = {"abababab": 5, "tokenizer": 3, "zq": 1, "a": 1}
    vocab = py_train_unigram(wc)
    costs = {p: co for p, _c, co in vocab}
    cm = _cost_map_literal(costs)
    from pyspark.sql import functions as F

    words = spark.createDataFrame([(w,) for w in sorted(wc)], "w string")
    rows = words.select(
        "w",
        viterbi_token_count(F.col("w"), cm).alias("n"),
        viterbi_pieces(F.col("w"), cm).alias("ps"),
    ).collect()
    for r in rows:
        n, path = py_viterbi(r["w"], costs)
        assert (r["n"], list(r["ps"])) == (n, path)


# ------------------------------------------------------ registered queries


def test_vocab_query_constant_across_sf(spark):
    a = _run(spark, "tokenizer_unigram_counts", SF).collect()
    b = _run(spark, "tokenizer_unigram_counts", "/root/testdata/sf0.01").collect()
    assert a == b  # gate-corpus-pinned training set


def test_token_counts_full_python_replay(spark):
    """Third-engine proof: re-train in pure python, re-segment every word
    occurrence of every sf0.001 document in pure python, and reproduce the
    registered query's output exactly."""
    gate = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["text"]
    )
    wc: Counter = Counter()
    for text in gate.column("text").to_pylist():
        for w in re.split(r"\s+", text or ""):
            if w:
                wc[w] += 1
    costs = {p: co for p, _c, co in py_train_unigram(dict(wc))}

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = {}
    seg_cache: dict[str, int] = {}
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        words = [w for w in re.split(r"\s+", text or "") if w]
        n_tok = 0
        for w in words:
            if w not in seg_cache:
                seg_cache[w] = py_viterbi(w, costs)[0]
            n_tok += seg_cache[w]
        exp[doc_id] = (len(words), n_tok)

    rows = _run(spark, "tokenizer_unigram_token_counts", SF).collect()
    assert len(rows) == len(exp)
    for r in rows:
        assert (r["n_words"], r["n_unigram_tokens"]) == exp[r["doc_id"]], r


def test_token_counts_bounds(spark):
    rows = _run(spark, "tokenizer_unigram_token_counts", SF).collect()
    docs = dict(
        zip(
            pq.read_table(f"{SF}/documents.parquet")
            .column("doc_id")
            .to_pylist(),
            pq.read_table(f"{SF}/documents.parquet").column("text").to_pylist(),
        )
    )
    for r in rows:
        # subwords never exceed characters, never undercut words
        n_chars = sum(len(w) for w in re.split(r"\s+", docs[r["doc_id"]] or "") if w)
        assert r["n_words"] <= r["n_unigram_tokens"] <= n_chars


def test_registered_with_query_specific_oracles():
    vocab_o = QUERIES["tokenizer_unigram_counts"].oracle
    assert vocab_o is not None and "VALUES" in vocab_o
    assert "n_viterbi" in vocab_o and "cost_micro" in vocab_o
    apply_o = QUERIES["tokenizer_unigram_token_counts"].oracle
    assert apply_o is not None and "WITH RECURSIVE" in apply_o
    assert f"% {1024}" in apply_o  # the token-count decode of the DP encode
    assert str(UNK_COST) in apply_o  # OOV coverage floor baked in


# ------------------------------------------------- tokenizer family table


def test_family_compare_reconciles_with_per_doc_queries(spark):
    """The per-source family table must sum to exactly the per-doc
    tokenizer queries' totals — same trained vocabularies, same apply
    paths, different grain."""
    fam = _run(spark, "tokenizer_family_compare", SF).collect()
    bpe = _run(spark, "tokenizer_bpe_counts", SF).collect()
    uni = _run(spark, "tokenizer_unigram_token_counts", SF).collect()
    assert sum(r["bpe_tokens"] for r in fam) == sum(r["n_bpe_tokens"] for r in bpe)
    assert sum(r["unigram_tokens"] for r in fam) == sum(
        r["n_unigram_tokens"] for r in uni
    )
    assert sum(r["ws_tokens"] for r in fam) == sum(r["n_words"] for r in bpe)


def test_family_compare_bounds(spark):
    for r in _run(spark, "tokenizer_family_compare", SF).collect():
        # every subword tokenizer emits at least one token per word and
        # at most one per character
        for col in ("bpe_tokens", "wp_tokens", "unigram_tokens"):
            assert r["ws_tokens"] <= r[col] <= r["n_chars"], (r["source"], col)
        # chars-per-token therefore lives in [1, chars/words]
        for col in ("bpe_cpt_micro", "wp_cpt_micro", "uni_cpt_micro"):
            assert 1_000_000 <= r[col] <= 1_000_000 * r["n_chars"] // r["ws_tokens"]
