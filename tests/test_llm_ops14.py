"""Semantic pins for the round-10 llm_ops14 waves (SemDeDup scale
posture); the auto-parametrized oracle test covers hash parity."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sea_streamer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


# ---------------------------------------------------------------- wave 1


def test_semantic_cells_for_formula():
    """semantic_cells_for = smallest power of two >= ceil(n/target_pop);
    the (k >= c and k//2 < c) membership predicate both query engines
    evaluate must agree with it for every n."""
    from sea_streamer_spark.operators.similarity import semantic_cells_for

    assert semantic_cells_for(500) == 16
    assert semantic_cells_for(2000) == 64
    assert semantic_cells_for(512) == 16
    assert semantic_cells_for(513) == 32
    assert semantic_cells_for(1) == 1
    assert semantic_cells_for(0) == 1
    for n in list(range(1, 300)) + [511, 512, 513, 10**6, 10**9]:
        k = semantic_cells_for(n)
        c = (n + 31) // 32
        assert k >= c and k // 2 < c, (n, k, c)
        # and it IS a power of two
        assert k & (k - 1) == 0


def test_exact_cosine_pairs_matches_jvm_fold(spark):
    """The blocked numpy tile sweep is BIT-IDENTICAL to the JVM
    zip_with/aggregate fold: same pairs at the same threshold, including
    any borderline cosines (the left-fold accumulation order is shared,
    so the doubles are equal, not merely close)."""
    from pyspark.sql import functions as F

    from sea_streamer_spark.operators import similarity as S
    from sea_streamer_spark.sources.tables import load_tables

    emb = load_tables(spark, SF, "embeddings").embeddings
    got = set(
        map(tuple, S.exact_cosine_pairs(emb, 0.45, block=128).collect())
    )
    a, b = emb.alias("a"), emb.alias("b")
    jvm = set(
        map(
            tuple,
            a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
            .filter(
                S.cosine(F.col("a.embedding"), F.col("b.embedding"))
                >= F.lit(0.45)
            )
            .select(F.col("a.vec_id"), F.col("b.vec_id"))
            .collect(),
        )
    )
    assert got == jvm and len(got) > 0


def test_cell_sweep_full_python_replay(spark):
    """Third-engine replay: truth pairs via the cos_py left fold, cell
    assignment via the same gate centroid literals and (sim, -cell)
    argmax, counts in pure python."""
    from sea_streamer_spark.operators.similarity import cos_py, dot_py
    from sea_streamer_spark.plans.llm_ops import gate_ivf_centroids

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    vecs = [list(v) for v in t.column("embedding").to_pylist()]
    n = len(ids)
    import math

    nrm = [math.sqrt(dot_py(v, v)) for v in vecs]
    truth = set()
    order = sorted(range(n), key=lambda i: ids[i])
    for ii in range(n):
        i = order[ii]
        for jj in range(ii + 1, n):
            j = order[jj]
            if dot_py(vecs[i], vecs[j]) / (nrm[i] * nrm[j]) >= 0.45:
                truth.add((ids[i], ids[j]))
    got = {r["n_cells"]: r for r in _run(spark, "dedup_semantic_cell_sweep").collect()}
    assert set(got) == {4, 16, 64}
    for k, r in got.items():
        cents = gate_ivf_centroids(n_cells=k)
        cell = {}
        for i in range(n):
            best = max(
                ((dot_py(vecs[i], cv), -c) for c, cv in cents),
            )
            cell[ids[i]] = -best[1]
        pops: dict = {}
        for c in cell.values():
            pops[c] = pops.get(c, 0) + 1
        n_cand = sum(p * (p - 1) // 2 for p in pops.values())
        n_coloc = sum(1 for a, b in truth if cell[a] == cell[b])
        assert r["n_vectors"] == n
        assert r["n_true_pairs"] == len(truth)
        assert r["n_candidate_pairs"] == n_cand, k
        assert r["n_true_colocated"] == n_coloc, k
        assert r["recall_permille"] == (
            (1000 * n_coloc) // len(truth) if truth else 1000
        )
        assert r["candidate_share_permille"] == (1000 * n_cand) // (
            n * (n - 1) // 2
        )
        c = (n + 31) // 32
        assert r["recommended"] == (k >= c and k // 2 < c)
    # exactly one swept count is the formula's answer at this N
    assert sum(1 for r in got.values() if r["recommended"]) == 1


def test_scaled_cluster_equals_fixed_at_the_16_rung(spark):
    """At N=500 the formula resolves to the same 16-cell quantizer the
    fixed query pins, so the scaled operator must reproduce
    dedup_semantic_cluster row-for-row (plus the n_cells column)."""
    fixed = {
        r["vec_id"]: (r["cell"], r["cos_c_micro"], r["kept"])
        for r in _run(spark, "dedup_semantic_cluster").collect()
    }
    scaled = _run(spark, "dedup_semantic_cluster_scaled").collect()
    assert len(scaled) == len(fixed)
    for r in scaled:
        assert r["n_cells"] == 16
        assert fixed[r["vec_id"]] == (
            r["cell"],
            r["cos_c_micro"],
            r["kept"],
        )


def test_scaled_cluster_unbaked_rung_fails_loudly(spark, tmp_path):
    """A corpus size outside the baked rungs must raise on BOTH engines
    (ValueError at plan build / error() in the oracle) — never silently
    run the wrong granularity."""
    import duckdb
    import numpy as np

    n = 700  # semantic_cells_for(700) = 32: not a baked rung
    rng = [
        [((i * 37 + d * 11) % 97) / 97.0 for d in range(8)]
        for i in range(n)
    ]
    table = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(rng, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    qd = QUERIES["dedup_semantic_cluster_scaled"]
    with pytest.raises(ValueError, match="unbaked"):
        qd.fn(spark, str(tmp_path))
    con = duckdb.connect()
    try:
        con.sql(
            f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{tmp_path}/embeddings.parquet'"
        )
        with pytest.raises(Exception, match="unbaked"):
            con.sql(qd.oracle).fetchall()
    finally:
        con.close()
    assert np is not None


def test_cell_sweep_volume_shrinks_with_cells(spark):
    """More cells must never increase candidate volume, and recall must
    never increase either (splitting only removes comparisons) — the
    monotone tradeoff the calibration table exists to expose."""
    rows = sorted(
        _run(spark, "dedup_semantic_cell_sweep").collect(),
        key=lambda r: r["n_cells"],
    )
    for a, b in zip(rows, rows[1:]):
        assert b["n_candidate_pairs"] <= a["n_candidate_pairs"]
        assert b["n_true_colocated"] <= a["n_true_colocated"]


# ---------------------------------------------------------------- wave 2


def test_pii_audit_full_python_replay(spark):
    """Third-engine replay with python's re module (a third regex
    implementation — Java on Spark, RE2 in DuckDB): same injection
    formula, same five patterns, same per-source rollup."""
    import re

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    from sea_streamer_spark.plans.llm_ops14 import _PII_PATTERNS

    pats = [(n, re.compile(p)) for n, p, _ in _PII_PATTERNS]

    def inject(d, text):
        m = d % 7
        if m == 0:
            return f"{text} contact user{d}@example.org"
        if m == 1:
            return f"{text} call 555-{d * 7 % 1000:03d}-{d * 13 % 10000:04d}"
        if m == 2:
            return f"{text} from 10.{d % 256}.{d * 3 % 256}.{d * 7 % 256}"
        if m == 3:
            return f"{text} id {d % 1000:03d}-{d * 3 % 100:02d}-{d * 7 % 10000:04d}"
        if m == 4:
            return (
                f"{text} card {d % 10000:04d}-{d * 3 % 10000:04d}"
                f"-{d * 7 % 10000:04d}-{d * 11 % 10000:04d}"
            )
        return text

    agg: dict = {}
    for d, text, src in zip(
        t.column("doc_id").to_pylist(),
        t.column("text").to_pylist(),
        t.column("source").to_pylist(),
    ):
        inj = inject(d, text)
        a = agg.setdefault(
            src, {n: 0 for n, _ in pats} | {"docs": 0, "with": 0, "raw": 0}
        )
        a["docs"] += 1
        tot = 0
        for n, p in pats:
            c = len(p.findall(inj))
            a[n] += c
            tot += c
            a["raw"] += len(p.findall(text))
        if tot:
            a["with"] += 1
    got = {r["source"]: r for r in _run(spark, "privacy_pii_audit").collect()}
    assert set(got) == set(agg)
    for src, a in agg.items():
        r = got[src]
        assert r["n_docs"] == a["docs"]
        assert r["n_docs_with_pii"] == a["with"]
        assert r["n_emails"] == a["email"]
        assert r["n_phones"] == a["phone"]
        assert r["n_ipv4"] == a["ipv4"]
        assert r["n_ids"] == a["ssn"]
        assert r["n_cards"] == a["ccard"]
        assert r["n_raw_hits"] == a["raw"] == 0  # fixture carries no PII


def test_pii_redaction_removes_everything(spark):
    """post_hits is computed by re-running the detectors on the
    redacted text — it must be exactly 0 everywhere, with one
    placeholder per pre hit."""
    rows = _run(spark, "privacy_pii_redact_roundtrip").collect()
    assert rows and all(r["post_hits"] == 0 for r in rows)
    assert all(r["n_placeholders"] == r["pre_hits"] for r in rows)
    assert sum(r["pre_hits"] for r in rows) > 0


def test_pii_patterns_are_pairwise_disjoint():
    """The redaction chain's order-independence rests on the five
    patterns never overlapping — fuzz every injected shape against
    every pattern with python re."""
    import re

    from sea_streamer_spark.plans.llm_ops14 import _PII_PATTERNS

    samples = {
        "email": "user123@example.org",
        "phone": "555-042-9137",
        "ipv4": "10.3.77.201",
        "ssn": "123-45-6789",
        "ccard": "1234-5678-9012-3456",
    }
    for name, pat, _ in _PII_PATTERNS:
        p = re.compile(pat)
        for sname, s in samples.items():
            hits = p.findall(f"pad {s} pad")
            if sname == name:
                assert hits == [s], (name, sname, hits)
            else:
                assert hits == [], (name, sname, hits)
