"""Semantic pins for the winnowing fingerprint wave (round-8 wave 2;
Schleimer et al. SIGMOD 2003). The auto-parametrized oracle test covers
hash parity vs DuckDB; these pin the paper's guarantees and add a pure
python third-engine replay of the whole fingerprint pipeline."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from sea_streamer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"
MOD = 1_000_000_007
K, W, PM = 3, 4, 1 << 20


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


def _char_fold(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % MOD
    return h


def py_winnow(tokens: list[str], k: int = K, w: int = W):
    """Independent winnowing replay: returns ({(pos, hash)}, n_positions).
    Same selection rule as the registered queries: per window of w
    consecutive k-gram hashes, minimal hash, RIGHTMOST position on ties
    (via the h·2^20 + (2^20-1-pos) encode)."""
    P = len(tokens) - k + 1
    if P < w:
        return set(), max(P, 0)
    hs = [_char_fold(" ".join(tokens[i : i + k])) for i in range(P)]
    prints = set()
    for e in range(w - 1, P):
        m = min(hs[p] * PM + (PM - 1 - p) for p in range(e - w + 1, e + 1))
        prints.add((PM - 1 - (m % PM), m >> 20))
    return prints, P


def _toks(text: str) -> list[str]:
    # split-only (no empty filter): _shingle_array builds on tokens() =
    # split(\s+), and the oracle mirrors string_split_regex — the corpus
    # has no leading/trailing whitespace so the views agree.
    return re.split(r"\s+", text or "")


def test_full_python_replay_sf0001(spark):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = {}
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        prints, P = py_winnow(_toks(text))
        if P >= W:
            exp[doc_id] = (
                P,
                len(prints),
                sum(h for _p, h in prints) % MOD,
            )
    rows = _run(spark, "text_winnowing_fingerprints").collect()
    assert len(rows) == len(exp)
    for r in rows:
        P, n, chk = exp[r["doc_id"]]
        assert (r["n_positions"], r["n_prints"], r["fp_checksum"]) == (P, n, chk)
        assert r["n_windows"] == P - W + 1
        assert r["density_permille"] == 1000 * n // (P - W + 1)


def test_paper_detection_guarantee():
    """Any shared substring of >= W+K-1 tokens must produce at least one
    shared fingerprint — the winnowing correctness theorem, checked over
    every insertion offset of the shared span in both documents."""
    span = ["zq1", "zq2", "zq3", "zq4", "zq5", "zq6"]  # W+K-1 = 6 tokens
    base_a = [f"a{i}" for i in range(12)]
    base_b = [f"b{i}" for i in range(12)]
    for off_a in range(0, 7, 3):
        for off_b in range(0, 7, 2):
            da = base_a[:off_a] + span + base_a[off_a:]
            db = base_b[:off_b] + span + base_b[off_b:]
            pa, _ = py_winnow(da)
            pb, _ = py_winnow(db)
            ha = {h for _p, h in pa}
            hb = {h for _p, h in pb}
            assert ha & hb, (off_a, off_b)


def test_density_near_two_over_w_plus_one():
    # Expected density 2/(W+1) = 0.4 for distinct-ish hashes; allow a
    # generous band — the pin is "winnowing selected a sparse subset",
    # not the exact constant.
    toks = [f"w{i * 7919 % 1000}x{i}" for i in range(500)]
    prints, P = py_winnow(toks)
    density = len(prints) / (P - W + 1)
    assert 0.25 <= density <= 0.55


def test_rightmost_tie_rule():
    # A run of identical tokens gives identical k-gram hashes; the encode
    # must select the RIGHTMOST position of each window's minimal hash,
    # so a window fully inside the run selects its last position.
    toks = ["rep"] * 10
    prints, P = py_winnow(toks)
    # every window has one hash value; selected positions are window ends
    assert {p for p, _h in prints} == set(range(W - 1, P))


def test_pairs_query_semantics(spark):
    rows = _run(spark, "dedup_winnowing_pairs").collect()
    assert rows  # the sf0.001 corpus contains near-dups by construction
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(
        zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    )
    # Recompute expected pairs in python, including the df-cap rule.
    by_doc = {d: {h for _p, h in py_winnow(_toks(x))[0]} for d, x in docs.items()}
    from collections import Counter

    df = Counter(h for hs in by_doc.values() for h in hs)
    ok = {h for h, c in df.items() if 2 <= c <= 50}
    exp = {}
    ds = sorted(by_doc)
    for i, a in enumerate(ds):
        for b in ds[i + 1 :]:
            shared = len(by_doc[a] & by_doc[b] & ok)
            if shared >= 3:
                exp[(a, b)] = shared
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in rows}
    assert got == exp
    for (a, b), _n in got.items():
        assert a < b
