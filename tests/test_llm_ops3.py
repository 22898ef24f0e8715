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


class TestCharLmScore:
    """Round-4-ready (registry-deferred) LM quality scorer: exactness vs a
    pure-python reference + the monotonicity that makes it a filter."""

    def test_matches_reference_and_ranks_naturalness(self, spark):
        import math
        from collections import Counter

        from sea_streamer_spark.operators.quality import char_lm_score

        rows = [
            (0, "the cat sat on the mat and then the cat slept"),
            (1, "the dog sat on the log"),
            (2, "zxqj vkw qjzx wkv zzzz"),
            (3, "x"),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_bigrams, r.mean_logp_micro)
            for r in char_lm_score(df).collect()
        }
        bg, pre = Counter(), Counter()
        for _, t in rows:
            for i in range(len(t) - 1):
                bg[t[i : i + 2]] += 1
                pre[t[i]] += 1

        def ref(t):
            lps = [
                math.log((bg[t[i : i + 2]] + 1) / (pre[t[i]] + 256))
                for i in range(len(t) - 1)
            ]
            return (len(lps), round(sum(lps) / len(lps) * 1e6) if lps else 0)

        for d, t in rows:
            assert got[d] == ref(t), (d, got[d], ref(t))
        # the signal: natural prose above consonant junk; degenerate docs 0
        assert got[0][1] > got[2][1]
        assert got[3] == (0, 0) and got[4] == (0, 0)

    def test_corpus_run_is_total(self, spark, sf_dir):
        from sea_streamer_spark.operators.quality import char_lm_score
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        out = char_lm_score(docs)
        assert out.count() == docs.count()  # every doc scored, none dropped
