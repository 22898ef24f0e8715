"""Round-8 operator waves.

Wave 1 — the unigram-LM (SentencePiece) tokenizer trainer (r7 judge task
#1, carried from r6): completes the BPE / WordPiece / unigram trainer
family in :mod:`..operators.bpe` / :mod:`..operators.unigram`.

- ``tokenizer_unigram_counts`` — the trainer-parity query: the DISTRIBUTED
  trainer's final vocabulary (piece, Viterbi count, fixed-point micro-nat
  cost) against a golden-VALUES oracle built at import time by the
  pure-python reference trainer — the BPE hash-proof pattern, applied to
  Viterbi-EM.
- ``tokenizer_unigram_token_counts`` — the application query: per-doc
  Viterbi token counts corpus-wide; the DuckDB oracle replays the exact
  integer-encode DP as a recursive CTE over the distinct-word table.

House rules (llm_ops.py): integer fixed-point only, deterministic
ordering, every aggregate aliased identically in Spark and the oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.unigram import UNK_COST
from ..sources.tables import load_tables
from .llm_ops import ORACLE_SF_DIR
from .registry import query

#: DP encode moduli — MUST match operators/unigram.py (_TOK_MOD, _K_MOD).
_TOK_MOD = 1024
_K_MOD = 8

_uni_cache: dict[str, object] = {}


def unigram_train_py(parquet_path: str):
    """Import-time oracle trainer: DuckDB word counts from the gate corpus
    → the pure-python unigram trainer (operators/unigram.py_train_unigram,
    integer-exact contract-identical to the distributed trainer). Returns
    the (piece, n_viterbi, cost_micro) list or None when the gate parquet
    is absent (absent gate: expected skip, not cached; training errors on
    present data propagate — the bpe_train_py contract)."""
    key = f"py|{parquet_path}"
    if key not in _uni_cache:
        if not os.path.exists(parquet_path):
            return None
        import duckdb

        from ..operators.unigram import py_train_unigram

        rows = duckdb.sql(
            f"SELECT w, COUNT(*) AS n FROM (SELECT unnest("
            f"string_split_regex(text, '\\s+')) AS w FROM "
            f"'{parquet_path}') WHERE len(w) > 0 GROUP BY w"
        ).fetchall()
        _uni_cache[key] = py_train_unigram({w: int(n) for w, n in rows})
    return _uni_cache[key]


def unigram_train_spark(spark: SparkSession, sf_dir: str):
    """Memoized DISTRIBUTED training run (operators/unigram.train_unigram)
    over the gate corpus — the registered query returns this table, so the
    driver's value hash checks the distributed trainer end-to-end against
    the oracle's pure-python trainer: if any seed count, Viterbi tie-break,
    E-step count, pruning decision, or M-step cost diverged, some row of
    the vocabulary would differ."""
    key = f"spark|{sf_dir}"
    if key not in _uni_cache:
        from ..operators.unigram import train_unigram

        t = load_tables(spark, sf_dir, "documents")
        _uni_cache[key] = train_unigram(t.documents)
    return _uni_cache[key]


def _gate(sf_dir: str) -> str:
    return (
        ORACLE_SF_DIR
        if os.path.exists(os.path.join(ORACLE_SF_DIR, "documents.parquet"))
        else sf_dir
    )


def _sq(s: str) -> str:
    return s.replace("'", "''")


def _build_unigram_vocab_oracle() -> str | None:
    vocab = unigram_train_py(os.path.join(ORACLE_SF_DIR, "documents.parquet"))
    if vocab is None:
        return None
    vals = ", ".join(
        f"('{_sq(p)}', CAST({c} AS BIGINT), CAST({co} AS BIGINT))"
        for p, c, co in vocab
    )
    return f"""
    SELECT piece, n_viterbi, cost_micro
    FROM (VALUES {vals}) AS t(piece, n_viterbi, cost_micro)
    ORDER BY piece"""


def _build_unigram_apply_oracle() -> str | None:
    """Recursive-CTE replay of the exact integer-encode Viterbi DP
    (operators/unigram.py module docstring): best[i+1] = min over piece
    length k of ((best[i+1-k] + cost·1024 + 1)·8 + k) // 8, vocabulary
    baked as VALUES from the pure-python trainer. DP runs once per
    DISTINCT word; token counts join back by word — the same plan the
    Spark side uses."""
    vocab = unigram_train_py(os.path.join(ORACLE_SF_DIR, "documents.parquet"))
    if vocab is None:
        return None
    vals = ", ".join(
        f"('{_sq(p)}', CAST({co} AS BIGINT))" for p, _c, co in vocab
    )
    return f"""
    WITH RECURSIVE vocab(piece, cost) AS (VALUES {vals}),
    toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ),
    occ AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS n_occ
      FROM (SELECT doc_id, unnest(t) AS w FROM toks)
      WHERE len(w) > 0 GROUP BY doc_id, w
    ),
    words AS (SELECT DISTINCT w FROM occ),
    dp AS (
      SELECT w, 0 AS i, [CAST(0 AS BIGINT)] AS best FROM words
      UNION ALL
      SELECT d.w, d.i + 1, list_append(d.best, CAST(least(
          (d.best[d.i+1] + (COALESCE(v1.cost, {UNK_COST}) * {_TOK_MOD} + 1))
            * {_K_MOD} + 1,
          CASE WHEN d.i+1 >= 2 AND v2.cost IS NOT NULL
               THEN (d.best[d.i]   + (v2.cost * {_TOK_MOD} + 1))
                      * {_K_MOD} + 2 END,
          CASE WHEN d.i+1 >= 3 AND v3.cost IS NOT NULL
               THEN (d.best[d.i-1] + (v3.cost * {_TOK_MOD} + 1))
                      * {_K_MOD} + 3 END,
          CASE WHEN d.i+1 >= 4 AND v4.cost IS NOT NULL
               THEN (d.best[d.i-2] + (v4.cost * {_TOK_MOD} + 1))
                      * {_K_MOD} + 4 END
        ) // {_K_MOD} AS BIGINT))
      FROM dp d
      LEFT JOIN vocab v1 ON v1.piece = substr(d.w, d.i + 1, 1)
      LEFT JOIN vocab v2 ON v2.piece = substr(d.w, d.i,     2)
      LEFT JOIN vocab v3 ON v3.piece = substr(d.w, d.i - 1, 3)
      LEFT JOIN vocab v4 ON v4.piece = substr(d.w, d.i - 2, 4)
      WHERE d.i < len(d.w)
    ),
    wt AS (
      SELECT w, CAST(best[len(w)+1] % {_TOK_MOD} AS BIGINT) AS n_tok
      FROM dp WHERE i = len(w)
    ),
    per_doc AS (
      SELECT o.doc_id, CAST(SUM(o.n_occ) AS BIGINT) AS n_words,
             CAST(SUM(o.n_occ * wt.n_tok) AS BIGINT) AS n_unigram_tokens
      FROM occ o JOIN wt USING (w) GROUP BY o.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
           CAST(COALESCE(p.n_unigram_tokens, 0) AS BIGINT) AS n_unigram_tokens
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id"""


@query(
    "tokenizer_unigram_counts",
    oracle=_build_unigram_vocab_oracle(),
    tags=("llm", "text"),
)
def tokenizer_unigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece) tokenizer trainer (Kudo 2018,
    arXiv:1804.10959; operators/unigram.py): Viterbi-EM over the
    word-frequency table with fixed-point micro-nat likelihoods and a
    deterministic pruning order, trained DISTRIBUTED on the gate corpus
    (seed-substring aggregation + one explode/piece-count shuffle per EM
    round over the vocab-bounded word table; memoized per-process).
    Output = the final vocabulary (piece, Viterbi count, cost). The
    oracle retrains with the pure-python reference trainer at import
    time and bakes the result as golden VALUES, so the driver hash
    proves distributed-vs-python trainer parity end-to-end — the
    tokenizer_bpe_counts proof, applied to EM. Constant across sf_dir by
    design (the gate corpus pins the training set, the whiten_fit /
    bpe_train posture)."""
    gate = _gate(sf_dir)
    vocab = unigram_train_spark(spark, gate)
    return spark.createDataFrame(
        vocab, "piece string, n_viterbi long, cost_micro long"
    ).orderBy("piece")


@query(
    "tokenizer_unigram_token_counts",
    oracle=_build_unigram_apply_oracle(),
    tags=("llm", "text"),
)
def tokenizer_unigram_token_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-wide unigram-LM tokenizer application: per-doc whitespace
    word count and Viterbi-best subword token count under the vocabulary
    trained on the gate corpus (see tokenizer_unigram_counts).

    Plan, 100 TB-first: the Viterbi DP (an integer-encode aggregate fold,
    operators/unigram.viterbi_token_count — zero Python, zero shuffle)
    runs once per DISTINCT word, never per occurrence; the corpus-side
    cost is one (doc_id, word) count aggregation plus a broadcast
    join-back of the word→token-count table (vocabulary-bounded). The
    DuckDB oracle replays the identical DP as a recursive CTE, so the
    hash proves the segmentation itself, not just totals."""
    from ..operators.unigram import _cost_map_literal, viterbi_token_count

    gate = _gate(sf_dir)
    vocab = unigram_train_spark(spark, gate)
    costs = {p: int(co) for p, _c, co in vocab}

    docs = load_tables(spark, sf_dir, "documents").documents
    occ = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"),
                    lambda x: F.length(x) > 0,
                )
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    wt = (
        occ.select("w")
        .distinct()
        .select(
            "w",
            viterbi_token_count(
                F.col("w"), _cost_map_literal(costs)
            ).alias("n_tok"),
        )
    )
    per_doc = (
        occ.join(F.broadcast(wt), "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("long").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("n_tok"))
            .cast("long")
            .alias("n_unigram_tokens"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_unigram_tokens", F.lit(0))
            .cast("long")
            .alias("n_unigram_tokens"),
        )
        .orderBy("doc_id")
    )
