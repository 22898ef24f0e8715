"""Semantic pins for the round-7 llm_ops10 waves (the auto-parametrized
oracle test in test_oracle_queries.py covers hash parity; these pin the
invariants a hash match alone would not prove — including full
pure-python third-engine replays of both wave-1 pipelines)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pyarrow.parquet as pq

from sea_streamer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


def _py_tokens(text: str) -> list[str]:
    # Same semantics as F.split(text, "\\s+") with limit -1: leading and
    # trailing whitespace produce empty-string tokens on both sides.
    return re.split(r"\s+", text)


def _load_docs(sf=SF):
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def test_perplexity_pure_python_replay(spark):
    """Third-engine proof: an independent pure-python Stupid-Backoff
    trainer+scorer reproduces every doc's (n_scored, sum_logp_micro)
    bit-for-bit at sf0.001."""
    docs = _load_docs()
    toks = {d: _py_tokens(t) for d, t in docs}
    uni: Counter = Counter()
    bi: Counter = Counter()
    tri: Counter = Counter()
    for d, t in toks.items():
        if d % 2 != 0:
            continue
        uni.update(t)
        bi.update(zip(t, t[1:]))
        tri.update(zip(t, t[1:], t[2:]))
    n_total = sum(uni.values())
    v_size = len(uni)
    want = {}
    for d, t in toks.items():
        s_micro = 0
        n = 0
        for w1, w2, w3 in zip(t, t[1:], t[2:]):
            if (w1, w2, w3) in tri:
                s = tri[(w1, w2, w3)] / bi[(w1, w2)]
            elif (w2, w3) in bi:
                s = 0.4 * bi[(w2, w3)] / uni[w2]
            else:
                s = 0.4 * 0.4 * (uni.get(w3, 0) + 1) / (n_total + v_size)
            # round-half-away-from-zero, matching F.round / DuckDB ROUND
            v = math.log(s) * 1_000_000
            s_micro += int(math.floor(v + 0.5)) if v >= 0 else -int(
                math.floor(-v + 0.5)
            )
            n += 1
        if n:
            want[d] = (n, s_micro)
    rows = {r.doc_id: r for r in _run(spark, "quality_perplexity_buckets").collect()}
    assert set(rows) == set(want)
    for d, (n, s_micro) in want.items():
        assert rows[d].n_scored == n, d
        assert rows[d].sum_logp_micro == s_micro, d


def test_perplexity_buckets_are_balanced_terciles(spark):
    rows = _run(spark, "quality_perplexity_buckets").collect()
    assert rows
    counts = Counter(r.ppl_bucket for r in rows)
    assert set(counts) == {"head", "middle", "tail"}
    assert max(counts.values()) - min(counts.values()) <= 1
    # bucket quality ordering: mean per-position score strictly improves
    # from tail to head in aggregate
    mean = {
        b: sum(r.sum_logp_micro for r in rows if r.ppl_bucket == b)
        / sum(r.n_scored for r in rows if r.ppl_bucket == b)
        for b in counts
    }
    assert mean["head"] > mean["middle"] > mean["tail"]


def test_decontaminate_pure_python_replay(spark):
    """Third-engine proof at sf0.001: independent python 13-gram overlap
    reproduces the full audit table."""
    K = 13
    docs = _load_docs()
    toks = {d: _py_tokens(t) for d, t in docs}
    grams = {
        d: [tuple(t[i : i + K]) for i in range(len(t) - K + 1)]
        for d, t in toks.items()
        if len(t) >= K
    }
    eval_grams: dict[tuple, set] = {}
    for d, gs in grams.items():
        if d % 10 == 7:
            for g in set(gs):
                eval_grams.setdefault(g, set()).add(d)
    want = {}
    for d, gs in grams.items():
        if d % 10 == 7:
            continue
        hit_pos = sum(1 for g in gs if g in eval_grams)
        eval_docs = set().union(*(eval_grams[g] for g in gs if g in eval_grams)) if hit_pos else set()
        if hit_pos:
            want[d] = (len(gs), hit_pos, len(eval_docs), 1000 * hit_pos // len(gs))
    rows = {r.doc_id: r for r in _run(spark, "curation_eval_decontaminate").collect()}
    assert set(rows) == set(want)
    for d, (n_grams, hits, n_eval, permille) in want.items():
        r = rows[d]
        assert (r.n_grams, r.hit_positions, r.n_eval_docs, r.contam_permille) == (
            n_grams,
            hits,
            n_eval,
            permille,
        ), d


def test_decontaminate_excludes_eval_docs_and_bounds(spark):
    rows = _run(spark, "curation_eval_decontaminate").collect()
    assert rows  # non-trivial on the synthetic corpus (4 docs at sf0.001)
    for r in rows:
        assert r.doc_id % 10 != 7  # eval docs are never audited as training
        assert 1 <= r.hit_positions <= r.n_grams
        assert r.n_eval_docs >= 1
        assert 0 <= r.contam_permille <= 1000


def test_wave1_registered_with_oracles():
    # Pin query-specific invariants of each oracle text, not just presence
    # (the old `name in oracle or 'SELECT' in oracle` disjunct was vacuously
    # true for any SQL string — r7 ADVICE).
    ppl = QUERIES["quality_perplexity_buckets"].oracle
    assert ppl is not None
    assert "NTILE(3)" in ppl  # head/middle/tail terciles
    assert "% 2 = 0" in ppl  # train split = even doc_ids
    decon = QUERIES["curation_eval_decontaminate"].oracle
    assert decon is not None
    assert "13" in decon  # the GPT-3/Llama-2 13-gram rule
    assert "% 10 = 7" in decon  # eval-set membership rule
