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
