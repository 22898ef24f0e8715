"""Semantic pins for the round-11 llm_ops15 waves; the auto-parametrized
oracle test covers hash parity."""

from __future__ import annotations

import math

from sea_streamer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


# ---------------------------------------------------------------- wave 1


def _copurchase_graph(spark, sf):
    """Full-python rebuild of the AA co-purchase graph (support >= 2)."""
    from sea_streamer_spark.sources.tables import load_tables

    li = load_tables(spark, sf, "lineitem").lineitem
    rows = li.select("l_orderkey", "l_partkey").collect()
    by_order: dict = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], []).append(r["l_partkey"])
    from collections import Counter

    # the plan counts lineitem ROW pairs per order (a.partkey <
    # b.partkey over the row self-join), not distinct parts — replicate
    # exactly.
    co = Counter()
    for parts in by_order.values():
        for i in range(len(parts)):
            for j in range(len(parts)):
                if parts[i] < parts[j]:
                    co[(parts[i], parts[j])] += 1
    edges = {p for p, n in co.items() if n >= 2}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, adj


def test_aa_hubcapped_full_python_replay(spark):
    """Every column of the one-row hub-cap measurement reproduced in
    plain python from the same graph: wedge volumes from the degree
    sequence, AA mass from per-center micro-rounded 1/ln(deg) terms,
    and the two top-20 rankings with the registered tie-break."""
    edges, adj = _copurchase_graph(spark, SF)
    deg = {u: len(vs) for u, vs in adj.items()}
    D = 8
    n_wedges_total = sum(d * (d - 1) // 2 for d in deg.values())
    n_wedges_kept = sum(d * (d - 1) // 2 for d in deg.values() if d <= D)
    # candidate pairs: unlinked endpoints of wedges
    aa_all: dict = {}
    aa_cap: dict = {}
    for w, vs in adj.items():
        term = round(1_000_000 / math.log(deg[w]))
        vs_s = sorted(vs)
        for i in range(len(vs_s)):
            for j in range(i + 1, len(vs_s)):
                u, v = vs_s[i], vs_s[j]
                if (u, v) in edges:
                    continue
                aa_all[(u, v)] = aa_all.get((u, v), 0) + term
                if deg[w] <= D:
                    aa_cap[(u, v)] = aa_cap.get((u, v), 0) + term
    m_all = sum(aa_all.values())
    m_cap = sum(aa_cap.get(p, 0) for p in aa_all)
    top_u = sorted(aa_all, key=lambda p: (-aa_all[p], p))[:20]
    top_c = sorted(
        (p for p in aa_all if aa_cap.get(p, 0) > 0),
        key=lambda p: (-aa_cap[p], p),
    )[:20]
    got = _run(spark, "graph_adamic_adar_hubcapped").collect()[0]
    assert got["d_cap"] == D
    assert got["n_wedges_total"] == n_wedges_total
    assert got["n_wedges_kept"] == n_wedges_kept
    assert got["wedge_share_permille"] == 1000 * n_wedges_kept // n_wedges_total
    assert got["aa_mass_kept_permille"] == 1000 * m_cap // m_all
    assert got["n_top20_overlap"] == len(set(top_u) & set(top_c))


def test_aa_hubcapped_single_sources_registered_graph(spark):
    """The capped row's uncapped AA scores must be IDENTICAL to the
    registered row's (same graph, same term): the registered top-20 is
    reproduced by ranking the hub-cap query's own candidate relation."""
    from pyspark.sql import functions as F

    from sea_streamer_spark.plans.llm_ops14 import _aa_graph

    reg = _run(spark, "graph_adamic_adar_linkpred").select(
        "part_a", "part_b", "aa_micro"
    )
    pairs, e, deg, wedges = _aa_graph(spark, SF)
    unlinked = wedges.join(
        pairs.select(F.col("pa").alias("u"), F.col("pb").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    cand = (
        unlinked.join(deg.withColumnRenamed("u", "w"), "w")
        .groupBy("u", "v")
        .agg(
            F.sum(
                F.round(
                    F.lit(1_000_000) / F.log(F.col("d").cast("double"))
                ).cast("long")
            )
            .cast("long")
            .alias("aa_micro")
        )
        .orderBy(F.desc("aa_micro"), "u", "v")
        .limit(20)
    )
    assert sorted(map(tuple, reg.collect())) == sorted(
        map(tuple, cand.collect())
    )


# ---------------------------------------------------------------- wave 2


def test_planted_sweep_full_python_replay(spark):
    """Third-engine replay of the planted-near-dup sweep: corpus
    derivation (×1.25 on dim j−1, replica id scheme), truth via the
    cos_py left fold, cell assignment via the gate centroid literals,
    planted-pair flagging via the base-key rule — every column in pure
    python."""
    import pyarrow.parquet as pq

    from sea_streamer_spark.operators.similarity import cos_py, dot_py
    from sea_streamer_spark.plans.llm_ops import gate_ivf_centroids

    t = pq.read_table(f"{SF}/embeddings.parquet")
    base_ids = t.column("vec_id").to_pylist()
    base_vecs = [list(map(float, v)) for v in t.column("embedding").to_pylist()]
    ids, vecs, key = [], [], {}
    for i, b in enumerate(base_ids):
        ids.append(b)
        vecs.append(base_vecs[i])
        key[b] = b
        if b % 10 == 0:
            for j in (1, 2, 3):
                v = list(base_vecs[i])
                v[j - 1] = v[j - 1] * 1.25
                rid = 1_000_000 + b * 100 + j
                ids.append(rid)
                vecs.append(v)
                key[rid] = b
    n = len(ids)
    nrm = [math.sqrt(dot_py(v, v)) for v in vecs]
    order = sorted(range(n), key=lambda i: ids[i])
    truth, planted = set(), set()
    for ii in range(n):
        i = order[ii]
        for jj in range(ii + 1, n):
            j = order[jj]
            if dot_py(vecs[i], vecs[j]) / (nrm[i] * nrm[j]) >= 0.45:
                p = (ids[i], ids[j])
                truth.add(p)
                if key[p[0]] == key[p[1]]:
                    planted.add(p)
    got = {
        r["n_cells"]: r
        for r in _run(spark, "dedup_semantic_recall_planted").collect()
    }
    assert set(got) == {16, 32, 128}
    for k, r in got.items():
        cents = gate_ivf_centroids(n_cells=k)
        cell = {}
        for i in range(n):
            best = max((dot_py(vecs[i], cv), -c) for c, cv in cents)
            cell[ids[i]] = -best[1]
        pops: dict = {}
        for c in cell.values():
            pops[c] = pops.get(c, 0) + 1
        n_cand = sum(p * (p - 1) // 2 for p in pops.values())
        n_coloc = sum(1 for a, b in truth if cell[a] == cell[b])
        n_pl_coloc = sum(1 for a, b in planted if cell[a] == cell[b])
        assert r["n_vectors"] == n
        assert r["n_true_pairs"] == len(truth)
        assert r["n_planted_pairs"] == len(planted)
        assert r["n_candidate_pairs"] == n_cand, k
        assert r["n_true_colocated"] == n_coloc, k
        assert r["n_planted_colocated"] == n_pl_coloc, k
        assert r["recall_permille"] == (1000 * n_coloc) // len(truth)
        assert r["planted_recall_permille"] == (1000 * n_pl_coloc) // len(
            planted
        )
        c = (n + 31) // 32
        assert r["recommended"] == (k >= c and k // 2 < c)
    assert sum(1 for r in got.values() if r["recommended"]) == 1


def test_planted_corpus_clusters_are_true_near_dups(spark):
    """The fixture's defining property: EVERY within-cluster pair is in
    the exact cosine truth (within-cluster cosine ≥ 0.45 by a wide
    margin), and the headline claim holds — planted recall at the
    recommended semantic_cells_for rung is ≥ 900‰ while the candidate
    share is below the 16-cell fixed pin's."""
    rows = {
        r["n_cells"]: r
        for r in _run(spark, "dedup_semantic_recall_planted").collect()
    }
    rec = [r for r in rows.values() if r["recommended"]]
    assert len(rec) == 1
    r = rec[0]
    # every planted pair survives into the exact truth
    n_bases = r["n_planted_pairs"] // 6  # C(4,2) = 6 pairs per cluster
    assert r["n_planted_pairs"] == 6 * n_bases
    assert r["planted_recall_permille"] >= 900
    assert (
        r["candidate_share_permille"]
        < rows[16]["candidate_share_permille"]
        or r["n_cells"] == 16
    )
