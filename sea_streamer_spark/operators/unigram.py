"""Distributed unigram-LM (SentencePiece) tokenizer training + application
(Kudo 2018, arXiv:1804.10959) — the third trainer of the subword family
(BPE / WordPiece live in :mod:`.bpe`), the one public multilingual
pipelines default to. Trained the way production SentencePiece is: on the
**word-frequency table** (one groupBy over the corpus, after which nothing
scales with corpus size), with EM over segmentation lattices and
likelihood-based pruning; applied corpus-wide as Viterbi segmentation.

This implementation is the hard-EM (Viterbi-EM) variant: the E-step uses
the single best segmentation per word instead of full forward-backward
expected counts. That choice is what makes the trainer EXACTLY replayable
across three engines — every quantity is an integer:

- Piece likelihoods are fixed-point **micro-nats**:
  ``cost(x) = -round(1e6 · ln(count(x)/total))``. The ln runs ONCE per
  M-step in driver python (identical code in the distributed and the
  pure-python trainer, so there is no cross-engine float at all); every
  downstream comparison is exact integer arithmetic.
- The Viterbi DP compares candidates through the injective integer encode
  ``((best_prefix + cost·1024 + 1)·8 + k)`` — lexicographic
  (total path cost, token count, piece length): minimal cost first, then
  fewer tokens, then the SHORTER piece at the boundary. A total order, so
  the chosen path — and hence every E-step count — is deterministic in
  Spark expressions, pure python, and the DuckDB recursive-CTE replay.
- Pruning is a total order too: multi-char pieces need Viterbi count ≥ 2
  to survive a round; the final round keeps the top ``k_final`` by
  ``(count desc, piece asc)``; single characters always survive (with a
  count floor of 1) so every string stays segmentable.

Determinism contract (what makes the registered queries oracle-checkable):
seed = ALL substrings of length 1..``max_k`` weighted by word frequency
(multi-char seeds need weighted count ≥ 2, capped to the top ``seed_cap``
by the same total order); ``rounds`` Viterbi-EM iterations as above; the
final vocabulary is the (piece, viterbi_count, cost_micro) table sorted by
piece.

Plan shape, 100 TB-first: the corpus is touched exactly once (the
word-count shuffle). Every E-step is ONE explode + piece-count shuffle
over the vocabulary-bounded word table; collects are vocab-bounded (the
piece table, hundreds of rows — the geometry-bounded collect posture of
the embedding ops). Costs are baked into the expression tree as a map
literal (fine to ~1k pieces; the production swap for a 32k-piece vocab is
a broadcast join against the piece table, same plan shape). Application
never shuffles the corpus: Viterbi runs once per DISTINCT word and joins
back by word.

Reference parity: the reference repo has no tokenizer trainer — this
family exists for the LLM-curation layer (SURVEY §2 "beyond-reference"
operators), alongside file:line-cited stream operators elsewhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts

__all__ = [
    "UNK_COST",
    "seed_piece_counts",
    "viterbi_token_count",
    "viterbi_pieces",
    "train_unigram",
    "py_train_unigram",
    "py_viterbi",
]

#: Cost (micro-nats) of an out-of-vocabulary single character at apply
#: time: e^-40 ≈ 4e-18, far below any trained piece, so UNK chars are
#: used only when nothing in the vocabulary covers a position. Training
#: itself never needs it (every character of the training corpus is a
#: seed piece and single chars never get pruned).
UNK_COST = 40_000_000

#: DP candidate encode moduli — see the module docstring. 1024 bounds the
#: token count per word (words ≤ 1023 chars; longer words would need a
#: wider encode), 8 bounds the piece length (max_k ≤ 7).
_TOK_MOD = 1024
_K_MOD = 8


def seed_piece_counts(
    wc: DataFrame, max_k: int = 4, word_col: str = "word", n_col: str = "n"
) -> DataFrame:
    """(piece, c): every substring of length 1..``max_k`` of every word,
    weighted by word frequency (ALL occurrence positions count — the
    SentencePiece seed statistic). Runs over the vocabulary-bounded word
    table, never the corpus."""
    w = F.col(word_col)
    pieces = wc.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length(w)),
                    lambda i: F.filter(
                        F.transform(
                            F.sequence(F.lit(1), F.lit(max_k)),
                            lambda k: F.when(
                                i + k - 1 <= F.length(w), w.substr(i, k)
                            ),
                        ),
                        lambda p: p.isNotNull(),
                    ),
                )
            )
        ).alias("piece"),
        n_col,
    )
    return pieces.groupBy("piece").agg(
        F.sum(n_col).cast("long").alias("c")
    )


def _cost_map_literal(costs: dict[str, int]) -> Column:
    """The piece→cost table as a map literal (pieces sorted for a stable
    expression tree). Production swap for huge vocabularies: broadcast
    join against the piece table instead — same plan shape."""
    args: list[Column] = []
    for p in sorted(costs):
        args.append(F.lit(p))
        args.append(F.lit(int(costs[p])).cast("long"))
    return F.create_map(*args)


def _dp_arrays(w: Column, cost_map: Column, max_k: int) -> Column:
    """The Viterbi DP over one word as a single ``aggregate`` fold (never
    unrolled at plan time — expression size is O(max_k), iteration count
    is the runtime word length). Returns struct(best: array<long>,
    bk: array<int>): ``best[i+1]`` is the minimal
    ``path_cost·1024 + token_count`` over prefixes of length i,
    ``bk[i]`` the chosen piece length at prefix i (1-indexed arrays)."""
    init = F.struct(
        F.array(F.lit(0).cast("long")).alias("best"),
        F.expr("CAST(array() AS ARRAY<INT>)").alias("bk"),
    )

    def step(acc: Column, i: Column) -> Column:
        cands = []
        for k in range(1, max_k + 1):
            cost = F.try_element_at(cost_map, w.substr(i - k + 1, F.lit(k)))
            if k == 1:
                cost = F.coalesce(cost, F.lit(UNK_COST).cast("long"))
            # NULL when the prefix is too short or (k>1) the piece is not
            # in the vocabulary; least() skips NULL candidates. k=1 always
            # yields a candidate (UNK floor), so least never sees all-NULL.
            cands.append(
                F.when(
                    i >= k,
                    (
                        F.element_at(acc["best"], (i - k + 1).cast("int"))
                        + cost * _TOK_MOD
                        + 1
                    )
                    * _K_MOD
                    + k,
                ).cast("long")
            )
        chosen = F.least(*cands)
        return F.struct(
            F.concat(
                acc["best"], F.array(F.shiftright(chosen, 3))
            ).alias("best"),
            F.concat(
                acc["bk"], F.array(chosen.bitwiseAND(F.lit(7)).cast("int"))
            ).alias("bk"),
        )

    return F.aggregate(F.sequence(F.lit(1), F.length(w)), init, step)


def viterbi_token_count(w: Column, cost_map: Column, max_k: int = 4) -> Column:
    """Token count of the Viterbi-best segmentation of ``w`` — a pure
    projection (the DP fold above; zero shuffles, zero Python)."""
    dp = _dp_arrays(w, cost_map, max_k)
    return (
        F.element_at(dp["best"], (F.length(w) + 1).cast("int")) % _TOK_MOD
    ).cast("long")


def viterbi_pieces(w: Column, cost_map: Column, max_k: int = 4) -> Column:
    """The Viterbi-best segmentation of ``w`` as its array of pieces
    (right-to-left backtrace order — multiplicity is what the E-step
    counts, so order is irrelevant)."""
    dp = _dp_arrays(w, cost_map, max_k)
    bk = dp["bk"]
    init = F.struct(
        F.length(w).cast("int").alias("pos"),
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("ps"),
    )

    def step(acc: Column, _i: Column) -> Column:
        k = F.element_at(bk, acc["pos"])
        return F.when(
            acc["pos"] > 0,
            F.struct(
                (acc["pos"] - k).cast("int").alias("pos"),
                F.concat(
                    acc["ps"], F.array(w.substr(acc["pos"] - k + 1, k))
                ).alias("ps"),
            ),
        ).otherwise(acc)

    # The path has at most L pieces, so L backtrace steps always suffice;
    # steps after pos hits 0 are no-ops.
    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)), init, step, lambda a: a["ps"]
    )


def _mstep(counts: dict[str, int]) -> dict[str, int]:
    """Fixed-point M-step: cost = -round(1e6·ln(c/total)). Driver-side
    python in BOTH trainers, so trainer parity never depends on
    cross-engine ln behavior."""
    total = sum(counts.values())
    return {p: -round(1e6 * math.log(c / total)) for p, c in counts.items()}


def _prune(
    vcounts: dict[str, int],
    chars: set[str],
    final: bool,
    k_final: int,
) -> dict[str, int]:
    """Deterministic pruning: multi-char pieces need Viterbi count ≥ 2; the
    final round keeps the top ``k_final`` by (count desc, piece asc);
    single chars always survive with a count floor of 1."""
    multi = {p: c for p, c in vcounts.items() if len(p) > 1 and c >= 2}
    if final:
        kept = sorted(multi.items(), key=lambda kv: (-kv[1], kv[0]))[:k_final]
        multi = dict(kept)
    out = {p: max(vcounts.get(p, 0), 1) for p in chars}
    out.update(multi)
    return out


def train_unigram(
    df: DataFrame,
    rounds: int = 3,
    max_k: int = 4,
    seed_cap: int = 256,
    k_final: int = 128,
    text_col: str = "text",
) -> list[tuple[str, int, int]]:
    """Distributed unigram-LM training. Returns the final vocabulary as
    ``(piece, viterbi_count, cost_micro)`` sorted by piece.

    One corpus pass (word counts); per round ONE explode + piece-count
    aggregation over the word table; driver-side state is always the
    vocab-bounded piece table. ``localCheckpoint`` severs lineage so the
    corpus shuffle runs exactly once (the train_bpe posture)."""
    wc = word_counts(df, text_col).localCheckpoint(eager=True)

    seed_rows = seed_piece_counts(wc, max_k=max_k).collect()
    seed = {r["piece"]: int(r["c"]) for r in seed_rows}
    chars = {p for p in seed if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1 and c >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_cap]
    pieces = {p: seed[p] for p in chars}
    pieces.update(dict(multi))
    costs = _mstep(pieces)

    for r in range(1, rounds + 1):
        cost_map = _cost_map_literal(costs)
        vrows = (
            wc.select(
                F.explode(
                    viterbi_pieces(F.col("word"), cost_map, max_k=max_k)
                ).alias("piece"),
                "n",
            )
            .groupBy("piece")
            .agg(F.sum("n").cast("long").alias("c"))
            .collect()
        )
        vcounts = {row["piece"]: int(row["c"]) for row in vrows}
        pieces = _prune(vcounts, chars, final=(r == rounds), k_final=k_final)
        costs = _mstep(pieces)

    return sorted((p, pieces[p], costs[p]) for p in pieces)


# ------------------------------------------------------------------ python
# Pure-python reference trainer — the oracle replica of train_unigram
# (identical seed statistic, encode, tie-break, pruning, and M-step).


def py_viterbi(
    w: str, costs: dict[str, int], max_k: int = 4
) -> tuple[int, list[str]]:
    """(token_count, pieces) of the Viterbi-best segmentation — the exact
    integer-encode DP of :func:`viterbi_token_count` /
    :func:`viterbi_pieces`."""
    L = len(w)
    best = [0]
    bk: list[int] = []
    for i in range(1, L + 1):
        cands = []
        for k in range(1, min(max_k, i) + 1):
            c = costs.get(w[i - k : i])
            if c is None:
                if k != 1:
                    continue
                c = UNK_COST
            cands.append((best[i - k] + c * _TOK_MOD + 1) * _K_MOD + k)
        chosen = min(cands)
        best.append(chosen // _K_MOD)
        bk.append(chosen % _K_MOD)
    pieces = []
    i = L
    while i > 0:
        k = bk[i - 1]
        pieces.append(w[i - k : i])
        i -= k
    return best[L] % _TOK_MOD, pieces


def py_train_unigram(
    wc: dict[str, int],
    rounds: int = 3,
    max_k: int = 4,
    seed_cap: int = 256,
    k_final: int = 128,
) -> list[tuple[str, int, int]]:
    """Pure-python reference trainer over a word-count dict — byte-for-byte
    the same contract as :func:`train_unigram`."""
    seed: dict[str, int] = {}
    for w, n in wc.items():
        for i in range(len(w)):
            for k in range(1, max_k + 1):
                if i + k <= len(w):
                    p = w[i : i + k]
                    seed[p] = seed.get(p, 0) + n
    chars = {p for p in seed if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1 and c >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_cap]
    pieces = {p: seed[p] for p in chars}
    pieces.update(dict(multi))
    costs = _mstep(pieces)

    for r in range(1, rounds + 1):
        vcounts: dict[str, int] = {}
        for w, n in wc.items():
            _, ps = py_viterbi(w, costs, max_k=max_k)
            for p in ps:
                vcounts[p] = vcounts.get(p, 0) + n
        pieces = _prune(vcounts, chars, final=(r == rounds), k_final=k_final)
        costs = _mstep(pieces)

    return sorted((p, pieces[p], costs[p]) for p in pieces)
