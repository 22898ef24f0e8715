"""Round-3 retrieval/dedup operators: quality properties beyond the oracle
equality checks (which tests/test_oracle_queries.py already covers)."""

from __future__ import annotations


class TestSemanticDedupRecall:
    def test_cell_blocking_recall_floor(self, spark, sf_dir):
        """SemDeDup's premise: truly-similar pairs co-locate in k-means
        cells. Measure it — the fraction of exact near-dup pairs
        (cos ≥ 0.45, brute force) whose endpoints share a cell must clear a
        floor; if clustering degraded (bad init, wrong assignment expr),
        recall collapses and this trips before any oracle would."""
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators import similarity as S
        from sea_streamer_spark.sources.tables import load_tables

        emb = load_tables(spark, sf_dir, "embeddings").embeddings
        cents = S.ivf_centroids(emb, n_cells=16)
        assigned = emb.select("vec_id", S.ivf_cell_expr(cents).alias("cell"))
        cells = {r.vec_id: r.cell for r in assigned.collect()}
        true_pairs = [
            (r.id_a, r.id_b)
            for r in S.near_dup_pairs(emb, threshold=0.45).collect()
        ]
        assert true_pairs, "fixture should contain near-dup pairs"
        hit = sum(1 for a, b in true_pairs if cells[a] == cells[b])
        recall = hit / len(true_pairs)
        assert recall >= 0.5, (recall, len(true_pairs))

    def test_kept_set_is_max_one_survivor_per_dup_chain(self, spark, sf_dir):
        """Every dropped vector must have a kept smaller-id witness in its
        cell with cosine ≥ threshold (no orphan drops)."""
        from sea_streamer_spark.plans.queries import QUERIES

        rows = QUERIES["dedup_semantic_ivf"].fn(spark, sf_dir).collect()
        kept = {r.vec_id for r in rows if r.kept}
        dropped = [r for r in rows if not r.kept]
        from sea_streamer_spark.operators import similarity as S
        from sea_streamer_spark.sources.tables import load_tables

        emb = load_tables(spark, sf_dir, "embeddings").embeddings
        vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
        cell_of = {r.vec_id: r.cell for r in rows}
        for d in dropped:
            witnesses = [
                v for v in vecs
                if v < d.vec_id
                and cell_of[v] == d.cell
                and S.cos_py(vecs[v], vecs[d.vec_id]) >= 0.45
            ]
            assert witnesses, f"orphan drop: {d.vec_id}"
