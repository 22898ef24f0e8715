"""Boundary-exactness proof for maximal_duplicate_spans (r5 judge task #7):
on a crafted corpus where the duplicated substring and its flanks are known
by construction, the emitted spans must be EXACTLY the duplicated copies —
no k-gram-grain slop on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.operators.dedup import maximal_duplicate_spans

L = 10


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def crafted(spark):
    dup12 = _words("d", 12)  # the shared substring, 12 tokens
    dup9 = _words("s", 9)  # below the L=10 threshold — must be invisible
    rows = [
        # dup12 at token offset 20, unique flanks
        (1, _words("a", 20) + " " + dup12 + " " + _words("b", 20)),
        # dup12 at token offset 15, different unique flanks
        (2, _words("c", 15) + " " + dup12 + " " + _words("e", 25)),
        # all-unique doc: no spans
        (3, _words("f", 30)),
        # adjacent self-repeat: the wrap-around 10-grams are unique, so the
        # two copies are separate maximal spans (they must NOT merge)
        (4, dup12 + " " + dup12),
        # 9-token repeat in two docs: under threshold, no spans
        (5, _words("g", 12) + " " + dup9),
        (6, _words("h", 12) + " " + dup9),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_are_exactly_the_duplicated_copies(crafted):
    out = (
        maximal_duplicate_spans(crafted, min_len=L)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    got = [(r.doc_id, r.span_start, r.span_len) for r in out]
    assert got == [(1, 20, 12), (2, 15, 12), (4, 0, 12), (4, 12, 12)]
    # every span is the SAME substring — one fingerprint across all copies
    assert len({r.span_fp for r in out}) == 1
    # d0..d9 occurs 4 times corpus-wide (docs 1, 2, and twice in doc 4)
    assert all(r.n_occ_min == 4 for r in out)


def test_maximality_no_extension_survives(crafted, spark):
    """Extending any emitted span by one token in either direction yields a
    substring that occurs only once — checked against the corpus itself,
    not against the generator's intent."""
    toks = {
        r.doc_id: r.text.split()
        for r in crafted.select("doc_id", "text").collect()
    }
    corpus = [" ".join(t) for t in toks.values()]

    def occurrences(sub: str) -> int:
        return sum(c.count(sub) for c in corpus)

    spans = maximal_duplicate_spans(crafted, min_len=L).collect()
    assert spans, "crafted corpus must produce spans"
    for r in spans:
        tk = toks[r.doc_id]
        s, e = r.span_start, r.span_start + r.span_len  # [s, e)
        body = " ".join(tk[s:e])
        assert occurrences(body) >= 2
        if s > 0:
            assert occurrences(" ".join(tk[s - 1 : e])) == 1
        if e < len(tk):
            assert occurrences(" ".join(tk[s : e + 1])) == 1


def test_under_threshold_and_unique_docs_emit_nothing(crafted):
    out = maximal_duplicate_spans(crafted, min_len=L)
    assert out.filter(F.col("doc_id").isin(3, 5, 6)).count() == 0


def test_oracle_parity_sf0001(spark):
    from tests.oracle import check_query

    rows = check_query(
        spark, "dedup_exact_substring_spans", "/root/testdata/sf0.001"
    )
    assert rows > 0


def test_exact_removal_is_subset_of_kgram_removal(spark):
    """Every token cut at L=10 span grain lies under a duplicated 3-gram
    too (an L-gram contains duplicated 3-grams), so per-doc n_removed_exact
    <= n_removed_k3 — the 'converges from below' relationship between the
    two grains."""
    from sea_streamer_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    exact = {
        r.doc_id: r.n_removed
        for r in QUERIES["dedup_span_removal_exact"].fn(spark, sf).collect()
    }
    coarse = {
        r.doc_id: r.n_removed
        for r in QUERIES["dedup_span_removal"].fn(spark, sf).collect()
    }
    assert set(exact) == set(coarse)
    assert all(exact[d] <= coarse[d] for d in exact)
    # and the exact grain actually removes something on this corpus
    assert sum(exact.values()) > 0
