"""Semantic pins for the round-8 llm_ops11 waves 4-5 (packing efficiency,
cross-source overlap matrix). Waves 1-3 are pinned in test_unigram.py /
test_winnowing.py; the auto-parametrized oracle test covers hash parity."""

from __future__ import annotations

import re
from collections import defaultdict

import pyarrow.parquet as pq

from sea_streamer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


def _doc_tokens(sf=SF) -> dict[int, int]:
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return {
        d: len([w for w in re.split(r"\s+", x or "") if w])
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }


def test_packing_full_python_replay(spark):
    toks = _doc_tokens()
    order = sorted(toks)
    rows = _run(spark, "curation_packing_efficiency").collect()
    assert [r["ctx_len"] for r in rows] == [512, 1024, 2048]
    for r in rows:
        L = r["ctx_len"]
        total = sum(toks.values())
        s = 0
        splits = 0
        pad_seq = 0
        pad_waste = 0
        packed = 0
        for d in order:
            tok = toks[d]
            if tok > 0:
                packed += 1
                if s // L != (s + tok - 1) // L:
                    splits += 1
                ps = -(-tok // L)
                pad_seq += ps
                pad_waste += ps * L - tok
            s += tok
        chop_seq = -(-total // L)
        assert r["total_tokens"] == total
        assert r["n_docs_packed"] == packed
        assert r["chop_sequences"] == chop_seq
        assert r["chop_tail_waste"] == chop_seq * L - total
        assert r["chop_split_docs"] == splits
        assert r["chop_split_permille"] == 1000 * splits // packed
        assert r["pad_sequences"] == pad_seq
        assert r["pad_waste_tokens"] == pad_waste
        assert r["pad_waste_permille"] == 1000 * pad_waste // (pad_seq * L)


def test_packing_strategy_bracketing(spark):
    """Chop never pads mid-stream (only the tail), pad-per-doc never
    splits; any real packer lands between the two sequence counts."""
    for r in _run(spark, "curation_packing_efficiency").collect():
        assert r["chop_tail_waste"] < r["ctx_len"]
        assert r["chop_sequences"] <= r["pad_sequences"]
        assert r["pad_waste_tokens"] >= r["chop_tail_waste"]
        # short-doc corpus: splitting gets RARER as context grows
    rows = _run(spark, "curation_packing_efficiency").collect()
    splits = [r["chop_split_docs"] for r in rows]
    assert splits == sorted(splits, reverse=True)


def test_overlap_matrix_consistent_with_cluster_query(spark):
    """Recompute the matrix in python from the keep-longest query's OWN
    cluster assignment (same LSH+CC relation) + the parquet source column
    — the two registered queries can never disagree about clusters."""
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in _run(spark, "dedup_keep_longest_per_cluster").collect()
    }
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    src = dict(
        zip(t.column("doc_id").to_pylist(), t.column("source").to_pylist())
    )
    per_cluster: dict[int, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for d, c in clusters.items():
        per_cluster[c][src[d]] += 1
    exp: dict[tuple[str, str], list[int]] = defaultdict(lambda: [0, 0, 0])
    for c, by_src in per_cluster.items():
        ss = sorted(by_src)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                e = exp[(a, b)]
                e[0] += 1
                e[1] += by_src[a]
                e[2] += by_src[b]
    rows = _run(spark, "curation_source_overlap_matrix").collect()
    got = {
        (r["source_a"], r["source_b"]): [
            r["n_shared_clusters"],
            r["n_docs_a"],
            r["n_docs_b"],
        ]
        for r in rows
    }
    assert got == dict(exp)
    assert all(a < b for a, b in got)
