"""ANN operators: recall against the exact brute-force baseline.

The approximate paths (LSH buckets, IVF cells) are rows-only at the driver
gate because they are approximate by construction; these tests pin their
quality instead: every returned similarity must be exact, and recall against
the brute-force answer must clear a floor.
"""

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.operators import similarity as S
from sea_streamer_spark.sources.tables import load_tables


@pytest.fixture()
def emb(spark, sf_dir):
    return load_tables(spark, sf_dir, "embeddings").embeddings


class TestIvf:
    def test_cells_cover_corpus(self, spark, emb):
        cents = S.ivf_centroids(emb, n_cells=8)
        assert len(cents) == 8
        assigned = emb.withColumn("cell", S.ivf_cell_expr(cents))
        n = emb.count()
        assert assigned.filter(F.col("cell").between(0, 7)).count() == n
        # assignment must be deterministic
        a1 = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
        a2 = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
        assert a1 == a2

    def test_topk_recall_vs_brute_force(self, spark, emb):
        exact = {r.vec_id for r in S.cosine_topk(emb, query_id=0, k=10).collect()}
        approx_rows = S.ann_ivf_topk(emb, query_id=0, k=10, n_cells=16, nprobe=4).collect()
        approx = {r.vec_id for r in approx_rows}
        assert len(approx_rows) == 10
        recall = len(exact & approx) / 10
        assert recall >= 0.5, f"IVF recall too low: {recall}"
        # probing ALL cells must reproduce the exact answer
        full = {r.vec_id for r in S.ann_ivf_topk(emb, query_id=0, k=10, n_cells=16, nprobe=16).collect()}
        assert full == exact

    def test_returned_sims_are_exact(self, spark, emb):
        rows = S.ann_ivf_topk(emb, query_id=0, k=5, n_cells=8, nprobe=3).collect()
        brute = {
            r.vec_id: r.cosine_sim for r in S.cosine_topk(emb, query_id=0, k=10_000).collect()
        }
        for r in rows:
            assert abs(brute[r.vec_id] - r.cosine_sim) < 1e-12


class TestLshRecall:
    def test_bucketed_pairs_subset_of_exact(self, spark, emb):
        small = emb.filter(F.col("vec_id") < 150)
        exact = {
            (r.id_a, r.id_b) for r in S.near_dup_pairs(small, threshold=0.45).collect()
        }
        approx = {(r.id_a, r.id_b) for r in S.ann_lsh(small, threshold=0.45).collect()}
        assert approx <= exact  # in-bucket scores are exact -> no false pairs
        if exact:
            recall = len(approx & exact) / len(exact)
            assert recall >= 0.5, f"LSH recall too low: {recall}"


class TestSketchAccuracy:
    """agg_approx_sketches: sketch answers must track the exact ones."""

    def test_hll_and_tdigest_error_bounds(self, spark, sf_dir):
        from sea_streamer_spark.plans.queries import QUERIES

        approx = {
            r.o_orderpriority: r
            for r in QUERIES["agg_approx_sketches"].fn(spark, sf_dir).collect()
        }
        t = load_tables(spark, sf_dir, "orders")
        exact = {
            r.o_orderpriority: r
            for r in t.orders.groupBy("o_orderpriority")
            .agg(
                F.countDistinct("o_custkey").alias("n_cust"),
                F.expr("percentile(o_totalprice, 0.5)").alias("median"),
            )
            .collect()
        }
        assert set(approx) == set(exact)
        for k, e in exact.items():
            a = approx[k]
            assert abs(a.approx_custs - e.n_cust) / max(e.n_cust, 1) < 0.05
            assert abs(a.approx_median - e.median) / max(abs(e.median), 1) < 0.05


class TestMultimodal:
    """Arrow-batch plumbing: real byte-histogram features, frame splitting."""

    def test_features_match_pure_python(self, spark, sf_dir):
        from sea_streamer_spark.operators.multimodal import (
            attach_binary_payload,
            extract_features,
        )

        docs = load_tables(spark, sf_dir, "documents").documents.filter(F.col("doc_id") < 20)
        feats = {
            r.doc_id: r.features
            for r in extract_features(attach_binary_payload(docs), n_bins=16).collect()
        }
        for r in docs.select("doc_id", "text").collect():
            data = r.text.encode()
            hist = [0] * 16
            for b in data:
                hist[b // 16] += 1
            expect = [h / len(data) for h in hist]
            assert feats[r.doc_id] == pytest.approx(expect, abs=1e-12)

    def test_frames_reassemble_to_payload(self, spark, sf_dir):
        from sea_streamer_spark.operators.multimodal import (
            attach_binary_payload,
            sample_frames,
        )

        docs = load_tables(spark, sf_dir, "documents").documents.filter(F.col("doc_id") < 10)
        frames = sample_frames(attach_binary_payload(docs), n_frames=4).collect()
        by_doc = {}
        for f in sorted(frames, key=lambda r: (r.doc_id, r.frame_idx)):
            by_doc.setdefault(f.doc_id, b"")
            by_doc[f.doc_id] += bytes(f.frame)
        for r in docs.select("doc_id", "text").collect():
            assert by_doc[r.doc_id] == r.text.encode()  # lossless split

    def test_resize_stub_schema(self, spark, sf_dir):
        from sea_streamer_spark.operators.multimodal import (
            attach_binary_payload,
            resize_media,
        )

        docs = load_tables(spark, sf_dir, "documents").documents.limit(5)
        out = resize_media(attach_binary_payload(docs), width=64, height=48).collect()
        assert len(out) == 5
        assert all(r.width == 64 and r.height == 48 for r in out)


class TestCuration:
    """hash_split determinism/proportions; pack_token_budget invariants."""

    def test_split_deterministic_and_proportional(self, spark, sf_dir):
        from sea_streamer_spark.operators.curation import hash_split
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        a = {r.doc_id: r.split for r in hash_split(docs).select("doc_id", "split").collect()}
        # rerun on a repartitioned input: identical assignment
        b = {
            r.doc_id: r.split
            for r in hash_split(docs.repartition(7)).select("doc_id", "split").collect()
        }
        assert a == b
        n = len(a)
        from collections import Counter

        frac = {k: v / n for k, v in Counter(a.values()).items()}
        assert abs(frac["train"] - 0.8) < 0.05 and abs(frac["val"] - 0.1) < 0.03

    def test_pack_chunks_invariants(self, spark, sf_dir):
        from sea_streamer_spark.operators.curation import pack_token_budget
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        budget = 512
        out = pack_token_budget(docs, budget=budget).select(
            "source", "doc_id", "n_tokens", "chunk_id"
        ).toPandas()
        assert len(out) == docs.count()  # exactly-once
        for _, g in out.groupby("source"):
            g = g.sort_values("doc_id")
            # chunk ids start at 0, are sorted along doc order, and contiguous
            ids = g.chunk_id.to_numpy()
            assert ids[0] == 0 and (ids[1:] >= ids[:-1]).all()
            assert set(ids) == set(range(ids.max() + 1))
            # a doc's chunk is where its first token lands
            cum_before = g.n_tokens.cumsum().shift(fill_value=0)
            assert (ids == (cum_before // budget)).all()
            # every chunk except the last holds >= budget tokens only via the
            # straddling doc: tokens strictly before the straddler < budget
            sums = g.groupby("chunk_id").n_tokens.sum()
            assert (sums.iloc[:-1] + g.n_tokens.max() >= budget).all()
