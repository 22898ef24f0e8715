"""Scale machinery: bucketed joins must be Exchange-free; salted aggregation
must be exact for decomposable aggregates."""

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.operators.scale import (
    bucketed_join,
    plan_has_exchange,
    salted_agg,
    write_bucketed,
)
from sea_streamer_spark.sources.tables import load_tables


class TestBucketedJoin:
    def test_colocated_join_has_no_shuffle(self, spark, sf_dir):
        t = load_tables(spark, sf_dir, "orders", "lineitem")
        write_bucketed(
            t.lineitem.select("l_orderkey", "l_quantity"),
            "li_bucketed", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"],
        )
        write_bucketed(
            t.orders.select("o_orderkey", "o_totalprice"),
            "ord_bucketed", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
        )
        joined = spark.table("li_bucketed").join(
            spark.table("ord_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        joined.count()  # materialize so executedPlan is final (AQE)
        assert not plan_has_exchange(joined), joined._jdf.queryExecution().executedPlan().toString()
        # and it is still correct
        expect = t.lineitem.join(
            t.orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == expect

    def test_unbucketed_join_does_shuffle(self, spark, sf_dir):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t = load_tables(spark, sf_dir, "orders", "lineitem")
            joined = t.lineitem.select("l_orderkey").join(
                t.orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey")
            )
            joined.count()
            assert plan_has_exchange(joined)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


class TestSaltedAgg:
    def test_salted_sum_equals_plain_sum(self, spark, sf_dir):
        t = load_tables(spark, sf_dir, "lineitem")
        qty = F.sum(F.expr("CAST(l_quantity AS DECIMAL(12,2))"))
        plain = {
            r.l_returnflag: float(r.s)
            for r in t.lineitem.groupBy("l_returnflag").agg(qty.alias("s")).collect()
        }
        salted = {
            r.l_returnflag: float(r.s)
            for r in salted_agg(
                t.lineitem, "l_returnflag", qty, "s", salt_n=16, combine="sum"
            ).collect()
        }
        assert salted == plain  # decimal partials -> exact regardless of split

    def test_salted_count_and_max(self, spark, sf_dir):
        t = load_tables(spark, sf_dir, "orders")
        plain_n = t.orders.count()
        salted_n = sum(
            r.n
            for r in salted_agg(
                t.orders, "o_orderstatus", F.count(F.lit(1)), "n", combine="sum"
            ).collect()
        )
        assert salted_n == plain_n
        plain_mx = {
            r.o_orderstatus: r.mx
            for r in t.orders.groupBy("o_orderstatus").agg(F.max("o_totalprice").alias("mx")).collect()
        }
        salted_mx = {
            r.o_orderstatus: r.mx
            for r in salted_agg(
                t.orders, "o_orderstatus", F.max("o_totalprice"), "mx", combine="max"
            ).collect()
        }
        assert salted_mx == plain_mx


class TestCorpusBlowUp:
    """Scale-up smoke: replicate the corpus 20x into token-disjoint
    namespaces (every token gets a replica suffix, so replicas share no
    shingles) and run the full MinHash-LSH -> connected-components -> keep
    rule. Pair/cluster counts must scale exactly linearly — the banding must
    not produce cross-replica candidates, and no stage may blow up
    quadratically with corpus size."""

    def test_minhash_cluster_pipeline_scales_linearly(self, spark):
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.dedup import minhash_lsh_dedup
        from sea_streamer_spark.operators.graph import dedup_clusters
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, "/root/testdata/sf0.01", "documents").documents
        base_pairs = minhash_lsh_dedup(docs, threshold=0.5).count()
        assert base_pairs > 0

        k = 20
        reps = spark.range(k).select(F.col("id").alias("rep"))
        big = (
            docs.crossJoin(reps)
            .select(
                (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
                F.regexp_replace(
                    "text", r"(\S+)", F.concat(F.lit("$1r"), F.col("rep"))
                ).alias("text"),
            )
        )
        n_docs = big.count()
        assert n_docs == docs.count() * k

        pairs = minhash_lsh_dedup(big, threshold=0.5).select("doc_a", "doc_b")
        assert pairs.count() == base_pairs * k

        clusters = dedup_clusters(big, pairs)
        kept = clusters.filter(F.col("doc_id") == F.col("cluster_id")).count()
        # every near-dup pair removes at least one doc; clusters never span
        # replica namespaces, so the reduction also scales linearly
        base_kept = dedup_clusters(
            docs, minhash_lsh_dedup(docs, threshold=0.5).select("doc_a", "doc_b")
        ).filter(F.col("doc_id") == F.col("cluster_id")).count()
        assert kept == base_kept * k


class TestGeometryBoundedModels:
    """The late-wave operators' 100 TB contract: model/driver state is
    bounded by configuration GEOMETRY (buckets, vocab, boundaries), never
    by corpus size. Verified by blowing the corpus up and asserting the
    bounded artifacts stay fixed-size and replica-invariant."""

    def _blown_up(self, spark, sf_dir, k=5):
        from pyspark.sql import functions as F

        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        reps = spark.range(k).select(F.col("id").alias("rep"))
        return docs, docs.crossJoin(reps).select(
            (F.col("doc_id") * k + F.col("rep")).alias("doc_id"), "text"
        )

    def test_dsir_fit_grid_is_replica_invariant(self, spark, sf_dir):
        """k exact replicas multiply every bucket count by exactly k — the
        fit stays an m-int array and the log-ratio grid is IDENTICAL
        (Laplace smoothing aside), because p̂(b) is scale-free."""
        from sea_streamer_spark.operators import selection as SEL

        base, big = self._blown_up(spark, sf_dir)
        m = 128
        c1 = SEL.fit_bucket_counts(base, m=m)
        c5 = SEL.fit_bucket_counts(big, m=m)
        assert len(c1) == len(c5) == m
        assert c5 == [5 * v for v in c1]

    def test_bpe_merges_are_replica_invariant(self, spark, sf_dir):
        """Exact replicas scale every pair count by k without changing the
        argmax order ⇒ the learned merge SEQUENCE is identical and the
        counts are exactly k×. (Training state = the word table — replicas
        dedupe into it, so corpus blow-up does not grow it at all.)"""
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators import bpe as B
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents.limit(200)
        m1 = B.train_bpe(docs, 6)
        reps = spark.range(5).select(F.col("id").alias("rep"))
        big200 = docs.crossJoin(reps).select(
            (F.col("doc_id") * 5 + F.col("rep")).alias("doc_id"), "text"
        )
        m5 = B.train_bpe(big200, 6)
        assert [(l, r) for l, r, _ in m5] == [(l, r) for l, r, _ in m1]
        assert [c for _, _, c in m5] == [5 * c for _, _, c in m1]

    def test_zorder_boundaries_fixed_size_any_corpus(self, spark, sf_dir):
        from sea_streamer_spark.operators import layout as L
        from sea_streamer_spark.sources.tables import load_tables

        ev = load_tables(spark, sf_dir, "events").events
        for bits in (4, 8):
            bs = L.quantile_boundaries(ev, "user_id", bits=bits)
            assert len(bs) == (1 << bits) - 1


class TestSaltedJoin:
    def _skewed(self, spark):
        from pyspark.sql import Row

        # 2000 rows on one hot key + a tail, small side with a duplicate key
        big = spark.createDataFrame(
            [Row(k=1, rid=i, v=i % 7) for i in range(2000)]
            + [Row(k=2, rid=10_000, v=3), Row(k=3, rid=10_001, v=4)]
        )
        small = spark.createDataFrame(
            [Row(k=1, tag="hot"), Row(k=1, tag="hot2"), Row(k=2, tag="cold")]
        )
        return big, small

    def test_inner_identical_to_plain_join(self, spark):
        from sea_streamer_spark.operators.scale import salted_join

        big, small = self._skewed(spark)
        got = sorted(
            (r.k, r.rid, r.v, r.tag)
            for r in salted_join(big, small, ["k"], n_salts=8).collect()
        )
        want = sorted(
            (r.k, r.rid, r.v, r.tag) for r in big.join(small, ["k"]).collect()
        )
        assert got == want and len(got) == 2 * 2000 + 1

    def test_left_and_semi_identical(self, spark):
        from sea_streamer_spark.operators.scale import salted_join

        big, small = self._skewed(spark)
        for how in ("left", "left_semi", "left_anti"):
            got = sorted(
                tuple(r) for r in salted_join(big, small, ["k"], 4, how).collect()
            )
            want = sorted(tuple(r) for r in big.join(small, ["k"], how).collect())
            assert got == want, how

    def test_rejects_multiplicity_breaking_how(self, spark):
        from sea_streamer_spark.operators.scale import salted_join

        big, small = self._skewed(spark)
        for how in ("right", "full", "full_outer"):
            with pytest.raises(ValueError):
                salted_join(big, small, ["k"], 4, how)

    def test_hot_key_actually_spreads(self, spark):
        """The point of the salt: the hot key's rows land on n_salts
        distinct sub-keys (so no reducer sees them all)."""
        from sea_streamer_spark.operators.scale import salted_join  # noqa: F401
        from pyspark.sql import Row

        big = spark.createDataFrame([Row(k=1, rid=i) for i in range(2000)])
        n = (
            big.withColumn(
                "__salt", F.pmod(F.xxhash64("k", "rid"), F.lit(8)).cast("int")
            )
            .select("k", "__salt")
            .distinct()
            .count()
        )
        assert n == 8

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "join_skew_salted", "/root/testdata/sf0.001") > 0


class TestBloomPrefilterJoin:
    def test_prefilter_keeps_all_matches_and_prunes(self, spark, sf_dir):
        from sea_streamer_spark.operators.bloom import (
            bloom_build,
            bloom_might_contain,
        )

        t = load_tables(spark, sf_dir, "orders", "customer")
        dim = t.customer.filter(
            (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
        ).select("c_custkey")
        model = bloom_build(dim, "c_custkey", m_bits=1 << 14)
        survivors = t.orders.filter(
            bloom_might_contain(model, F.col("o_custkey"))
        )
        # no false negatives: every truly-matching order survives
        true_match = t.orders.join(
            dim, t.orders["o_custkey"] == dim["c_custkey"], "left_semi"
        )
        assert true_match.exceptAll(
            survivors.join(dim, survivors["o_custkey"] == dim["c_custkey"], "left_semi")
        ).count() == 0
        # and the prefilter actually prunes (the point of the technique)
        n_all, n_kept, n_true = (
            t.orders.count(), survivors.count(), true_match.count(),
        )
        assert n_true <= n_kept < n_all / 2, (n_all, n_kept, n_true)

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "join_bloom_prefilter", "/root/testdata/sf0.001") > 0


class TestPointInTimeJoin:
    def test_every_order_joins_exactly_once(self, spark, sf_dir):
        """The SCD2 validity windows partition the timeline per customer,
        so the per-version order counts must sum to the order count —
        no order is dropped, none joins two versions (temporal-leakage
        safety is exactly this invariant)."""
        from sea_streamer_spark.plans.queries import QUERIES

        out = QUERIES["join_point_in_time"].fn(spark, sf_dir).collect()
        total = load_tables(spark, sf_dir, "orders").orders.count()
        assert sum(r["n_orders"] for r in out) == total
        assert len(out) == 3 and all(r["n_orders"] > 0 for r in out)

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "join_point_in_time", "/root/testdata/sf0.001") > 0


class TestFanOutProbeMemo:
    def test_memo_matches_replanning_and_fan_out_widens(self, spark):
        """r13: fan_out's partition probe is memoized on the analyzed
        plan's semanticHash (df.rdd.getNumPartitions() replans the whole
        query per call — ~87 ms of driver time at bench scale). The memo
        must agree with a fresh replan for rebuilt-identical plans, and
        fan_out must still widen a narrow input."""
        from sea_streamer_spark.operators.scale import (
            _NPART_MEMO,
            _probe_num_partitions,
            fan_out,
        )

        df1 = spark.range(0, 100, 1, 1).withColumnRenamed("id", "doc_id")
        n1 = _probe_num_partitions(df1)
        assert n1 == df1.rdd.getNumPartitions() == 1
        # rebuilt-identical plan: memo hit must return the same count
        df2 = spark.range(0, 100, 1, 1).withColumnRenamed("id", "doc_id")
        key = (id(df2.sparkSession), df2.semanticHash())
        assert key in _NPART_MEMO
        assert _probe_num_partitions(df2) == 1
        # different plan (different literal) must not collide
        df3 = spark.range(0, 101, 1, 1).withColumnRenamed("id", "doc_id")
        assert df3.semanticHash() != df1.semanticHash()
        # fan_out still widens the 1-partition input
        wide = fan_out(df1, key="doc_id")
        assert wide.rdd.getNumPartitions() > 1
