"""Semantic pins for the llm_ops8 wave (dedup finishers, embedding-QA
outliers, last-touch attribution) — properties the oracle hash can't
express directly: keep-rule exactness, cross-query agreement with the
registered cluster relation, and driver-side recomputation of the
integer-micros distance math."""

import duckdb
import pyspark.sql.functions as F
import pytest

from sea_streamer_spark.plans.queries import QUERIES

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def keep(spark):
    return QUERIES["dedup_keep_longest_per_cluster"].fn(spark, SF_DIR).cache()


class TestKeepLongest:
    def test_exactly_one_kept_per_cluster(self, keep):
        bad = (
            keep.groupBy("cluster_id")
            .agg(F.sum(F.col("kept").cast("int")).alias("n_kept"))
            .filter(F.col("n_kept") != 1)
            .count()
        )
        assert bad == 0

    def test_kept_doc_is_longest(self, spark, keep):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "n_chars"
        )
        j = keep.join(docs, "doc_id")
        mx = j.groupBy("cluster_id").agg(F.max("n_chars").alias("mx"))
        bad = (
            j.filter("kept")
            .join(mx, "cluster_id")
            .filter(F.col("n_chars") != F.col("mx"))
            .count()
        )
        assert bad == 0

    def test_singletons_all_kept(self, keep):
        assert keep.filter("cluster_size = 1 AND NOT kept").count() == 0

    def test_agrees_with_dedup_clusters(self, spark, keep):
        ref = QUERIES["dedup_clusters"].fn(spark, SF_DIR)
        assert keep.select("doc_id", "cluster_id").exceptAll(
            ref.select("doc_id", "cluster_id")
        ).count() == 0

    def test_rate_by_source_accounts_for_every_removal(self, spark, keep):
        rate = QUERIES["dedup_rate_by_source"].fn(spark, SF_DIR)
        agg = rate.agg(
            F.sum("n_docs").alias("docs"), F.sum("n_removed").alias("rm")
        ).collect()[0]
        n_docs = keep.count()
        n_clusters = keep.select("cluster_id").distinct().count()
        assert agg["docs"] == n_docs
        assert agg["rm"] == n_docs - n_clusters
        bad = rate.filter(
            (F.col("dup_permille") < 0) | (F.col("dup_permille") > 1000)
        ).count()
        assert bad == 0


class TestEmbeddingOutlier:
    def test_top1_matches_driver_recompute(self, spark):
        out = QUERIES["embedding_outlier_centroid"].fn(spark, SF_DIR).collect()
        assert len(out) == 20
        dists = [r["dist_sq"] for r in out]
        assert dists == sorted(dists, reverse=True)
        # independent integer-micros recompute via DuckDB fetch + python ints
        rows = duckdb.sql(
            f"SELECT vec_id, embedding FROM "
            f"'{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
        ).fetchall()
        import math

        micro = {
            vid: [math.floor(float(x) * 1_000_000) for x in emb]
            for vid, emb in rows
        }
        d = len(next(iter(micro.values())))
        n = len(micro)
        mean = [
            sum(v[i] for v in micro.values()) // n for i in range(d)
        ]
        best = max(
            micro.items(),
            key=lambda kv: (
                sum((x - m) * (x - m) for x, m in zip(kv[1], mean)),
                -kv[0],
            ),
        )
        want = sum((x - m) * (x - m) for x, m in zip(best[1], mean))
        assert out[0]["vec_id"] == best[0]
        assert out[0]["dist_sq"] == want


class TestLastTouchAttribution:
    def test_purchase_total_and_type_domain(self, spark):
        out = QUERIES["events_last_touch_attribution"].fn(spark, SF_DIR)
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        total = ev.filter("event_type = 'purchase'").count()
        got = out.agg(F.sum("n_purchases")).collect()[0][0]
        assert got == total
        types = {r["attributed_type"] for r in out.collect()}
        domain = {
            r["event_type"]
            for r in ev.select("event_type").distinct().collect()
        } - {"purchase"} | {"direct"}
        assert types <= domain
