"""Semantic pins for the round-9 llm_ops12 wave 1 (SemDeDup semantic
dedup); the auto-parametrized oracle test covers hash parity."""

from __future__ import annotations

import math

import pyarrow.parquet as pq

from sea_streamer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


def _embeddings(sf=SF) -> dict[int, list[float]]:
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    return dict(zip(t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()))


def _py_semantic(sf=SF):
    """Pure-python third-engine replay of the whole SemDeDup chain:
    gate-pinned centroids → dot-argmax cell assignment (smaller-cell
    tie-break) → micro-rounded cosine-to-centroid → greedy drop against
    any better-ranked (cos_c_micro, vec_id) same-cell neighbor with
    cosine ≥ threshold. Mirrors operators/similarity.cos_py's fold so
    all three engines agree bit-for-bit before the micro-rounding."""
    from sea_streamer_spark.operators.similarity import cos_py, dot_py
    from sea_streamer_spark.plans.llm_ops import gate_ivf_centroids
    from sea_streamer_spark.plans.llm_ops3 import _SEM_CELLS, _SEM_THRESHOLD

    cents = gate_ivf_centroids(n_cells=_SEM_CELLS)
    assert cents is not None, "gate testdata absent"
    emb = _embeddings(sf)
    rows = {}
    for vid, v in emb.items():
        best = max(
            ((dot_py(v, cvec), -cell) for cell, cvec in cents),
        )
        cell = -best[1]
        cvec = cents[cell][1]
        micro = math.floor(cos_py(v, cvec) * 1000000.0 + 0.5)
        rows[vid] = (cell, micro)
    kept = {}
    for vid, (cell, micro) in rows.items():
        kept[vid] = not any(
            ob_cell == cell
            and (ob_micro, ovid) < (micro, vid)
            and cos_py(emb[vid], emb[ovid]) >= _SEM_THRESHOLD
            for ovid, (ob_cell, ob_micro) in rows.items()
            if ovid != vid
        )
    return rows, kept


def test_semantic_cluster_full_python_replay(spark):
    rows, kept = _py_semantic()
    got = {
        r["vec_id"]: (r["cell"], r["cos_c_micro"], r["kept"])
        for r in _run(spark, "dedup_semantic_cluster").collect()
    }
    assert set(got) == set(rows)
    for vid, (cell, micro) in rows.items():
        assert got[vid] == (cell, micro, kept[vid]), vid


def test_semantic_keeps_exactly_one_per_duplicate_clique(spark):
    """Within a cell, the drop rule is a strict total order on
    (cos_c_micro, vec_id): among any set of mutually-near vectors the
    minimum survives and every other member is dropped — keep-ONE-
    representative, not keep-none (the failure mode a naive 'drop if
    any near neighbor' rule has)."""
    from sea_streamer_spark.operators.similarity import cos_py
    from sea_streamer_spark.plans.llm_ops3 import _SEM_THRESHOLD

    rows, kept = _py_semantic()
    emb = _embeddings()
    # build the near-dup graph within cells; check each connected clique
    by_cell: dict[int, list[int]] = {}
    for vid, (cell, _m) in rows.items():
        by_cell.setdefault(cell, []).append(vid)
    n_groups_checked = 0
    for cell, vids in by_cell.items():
        for a in vids:
            near = [
                b
                for b in vids
                if b != a and cos_py(emb[a], emb[b]) >= _SEM_THRESHOLD
            ]
            if not near:
                assert kept[a], f"isolated vector {a} must be kept"
                continue
            group = [a, *near]
            ranked = sorted(group, key=lambda v: (rows[v][1], v))
            # the best-ranked member of a's neighborhood is never dropped
            # BY this neighborhood; a itself survives iff it is that member
            if a == ranked[0]:
                assert kept[a], f"best-ranked {a} wrongly dropped"
            else:
                assert not kept[a], f"{a} has a better-ranked near neighbor"
            n_groups_checked += 1
    # the corpus must actually exercise the rule (sf0.001 has cos-near pairs)
    assert n_groups_checked > 0


def test_semantic_recall_eval_invariants(spark):
    r = _run(spark, "dedup_semantic_recall_eval").collect()[0]
    # precision is structural: every sem pair is cosine-verified
    assert r["precision_permille"] == 1000
    assert r["n_common"] == r["n_sem_pairs"]
    assert r["n_sem_pairs"] <= r["n_true_pairs"]
    assert 0 <= r["recall_permille"] <= 1000
    assert r["n_overlap_docs"] <= min(r["n_sem_dropped"], r["n_jaccard_dup_docs"])
    # dropped count must agree with the cluster query's verdict column
    k = _run(spark, "dedup_semantic_cluster")
    assert r["n_sem_dropped"] == k.filter("NOT kept").count()


def test_semantic_cluster_plan_quality(spark):
    """Scale pins: cell assignment is a projection (no shuffle before the
    centroid broadcast join), the centroid join IS a broadcast, the
    near-dup join is cell-keyed (no cartesian product anywhere), and no
    row-at-a-time Python executes."""
    df = _run(spark, "dedup_semantic_cluster")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # 16-row centroid table
    # the dedup self-join keys on cell (cluster-bucketed, never all-pairs)
    assert "cell" in plan
