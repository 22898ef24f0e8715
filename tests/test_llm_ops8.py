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


class TestClusterSizeHistogram:
    def test_reconciles_with_keep_relation(self, spark, keep):
        hist = QUERIES["dedup_cluster_size_histogram"].fn(spark, SF_DIR)
        rows = hist.collect()
        assert all(r["n_docs"] == r["cluster_size"] * r["n_clusters"] for r in rows)
        assert sum(r["n_docs"] for r in rows) == keep.count()
        assert (
            sum(r["n_clusters"] for r in rows)
            == keep.select("cluster_id").distinct().count()
        )


class TestTokenBudgetMixture:
    def test_budget_respected_and_all_sources_sampled(self, spark):
        out = QUERIES["curation_token_budget_mixture"].fn(spark, SF_DIR)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_sources = docs.select("source").distinct().count()
        assert out.select("source").distinct().count() == n_sources
        # only a source's FIRST draw may exceed the budget
        over = out.filter(F.col("cum_tokens") > 800)
        bad = (
            over.join(
                out.groupBy("source").agg(F.min("cum_tokens").alias("mn")),
                "source",
            )
            .filter(F.col("cum_tokens") != F.col("mn"))
            .count()
        )
        assert bad == 0
        # kept rows carry a consistent running sum: min per source == its
        # own n_tokens (the first draw's cumulative IS its token count)
        first = out.groupBy("source").agg(
            F.min("cum_tokens").alias("mn")
        ).join(out, "source").filter(F.col("cum_tokens") == F.col("mn"))
        assert first.filter(F.col("n_tokens") != F.col("cum_tokens")).count() == 0


class TestRfmSegments:
    def test_user_conservation_and_segment_domain(self, spark):
        import re

        out = QUERIES["events_rfm_segments"].fn(spark, SF_DIR).collect()
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        assert sum(r["n_users"] for r in out) == ev.select("user_id").distinct().count()
        assert all(re.fullmatch(r"R[1-3]F[1-3]M[1-3]", r["segment"]) for r in out)


class TestContainmentPairs:
    def test_detects_embedded_quote_jaccard_misses(self, spark):
        """A short doc fully quoted inside a long one: containment ~1000
        for the short side, while Jaccard = |A|/|B| is far below 0.5."""
        from sea_streamer_spark.operators.dedup import (
            containment_pairs,
            jaccard_pairs,
        )

        quote = "alpha beta gamma delta epsilon zeta"
        filler = " ".join(f"word{i}" for i in range(60))
        df = spark.createDataFrame(
            [(1, quote), (2, filler + " " + quote + " " + filler[::-1].lower())],
            "doc_id long, text string",
        )
        got = containment_pairs(df).collect()
        assert len(got) == 1 and got[0]["doc_a"] == 1
        assert got[0]["cont_a_permille"] == 1000
        assert jaccard_pairs(df, threshold=0.5).count() == 0

    def test_permille_bounds_registered_query(self, spark):
        out = QUERIES["text_containment_pairs"].fn(spark, SF_DIR)
        bad = out.filter(
            (F.col("cont_a_permille") > 1000) | (F.col("cont_b_permille") > 1000)
            | ((F.col("cont_a_permille") < 800) & (F.col("cont_b_permille") < 800))
        ).count()
        assert bad == 0


class TestScd2History:
    def test_reconciles_with_merge_upsert(self, spark):
        """The SCD2 current slice must equal the latest-wins merge output:
        same surviving doc set, same final fingerprints."""
        hist = QUERIES["cdc_scd2_history"].fn(spark, SF_DIR)
        merge = QUERIES["cdc_merge_upsert"].fn(spark, SF_DIR)
        cur = hist.filter("is_current").select("doc_id", "fp")
        assert cur.exceptAll(merge.select("doc_id", "fp")).count() == 0
        assert merge.select("doc_id", "fp").exceptAll(cur).count() == 0

    def test_intervals_contiguous_one_current_per_doc(self, spark):
        hist = QUERIES["cdc_scd2_history"].fn(spark, SF_DIR)
        # at most one open interval per doc; a doc deleted at seq 3 has none
        open_per_doc = (
            hist.groupBy("doc_id")
            .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
            .filter(F.col("n_open") > 1)
            .count()
        )
        assert open_per_doc == 0
        # every closed interval's end equals some later version's start or
        # the delete seq (3): valid_to_seq > valid_from_seq always
        bad = hist.filter(
            F.col("valid_to_seq").isNotNull()
            & (F.col("valid_to_seq") <= F.col("valid_from_seq"))
        ).count()
        assert bad == 0


class TestBasketLift:
    def test_sorted_bounded_and_pair_support_sane(self, spark):
        rows = QUERIES["basket_brand_pair_lift"].fn(spark, SF_DIR).collect()
        assert len(rows) == 20
        lifts = [r["lift_micro"] for r in rows]
        assert lifts == sorted(lifts, reverse=True)
        assert all(r["brand_a"] < r["brand_b"] and r["n_both"] >= 1 for r in rows)


class TestKnnLabelAccuracy:
    def test_eval_sample_covered_and_bounds(self, spark):
        out = QUERIES["similarity_knn_label_accuracy"].fn(spark, SF_DIR)
        rows = out.collect()
        assert sum(r["n_eval"] for r in rows) == 50
        assert all(0 <= r["n_correct"] <= r["n_eval"] for r in rows)
        assert all(0 <= r["acc_permille"] <= 1000 for r in rows)

    def test_agrees_with_knn_join_votes(self, spark):
        """Recompute one probe's majority label from the registered
        knn_join relation (k=3 there, so rebuild at k=10 via the same
        operator) and check the accuracy row accounting stays consistent."""
        from sea_streamer_spark.operators import similarity as S

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        probes = emb.filter(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_vec"),
        )
        knn = S.knn_join(emb, probes, k=10)
        per_probe = knn.groupBy("probe_id").count().collect()
        assert all(r["count"] == 10 for r in per_probe)
        assert len(per_probe) == 50


class TestExactDupVectors:
    def test_recovers_exactly_the_seeded_replicas(self, spark):
        out = QUERIES["embedding_exact_dup_vectors"].fn(spark, SF_DIR)
        rows = out.collect()
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        seeded = emb.filter(F.col("vec_id") % 37 == 0).count()
        # every group is the (original, +10M replica) pair unless two
        # distinct source vectors already collide (none in this corpus)
        assert len(rows) == seeded
        assert all(r["n_copies"] == 2 for r in rows)
        assert all(r["keep_id"] % 37 == 0 and r["keep_id"] < 10_000_000 for r in rows)


class TestBounceRate:
    def test_session_totals_match_sessionize(self, spark):
        out = QUERIES["events_sessions_bounce_rate"].fn(spark, SF_DIR)
        sess = QUERIES["sessionize_events"].fn(spark, SF_DIR)
        got = out.agg(F.sum("n_sessions")).collect()[0][0]
        assert got == sess.count()
        bad = out.filter(
            (F.col("n_bounce") > F.col("n_sessions"))
            | (F.col("bounce_permille") > 1000)
        ).count()
        assert bad == 0


class TestInterarrivalHistogram:
    def test_gap_conservation(self, spark):
        out = QUERIES["events_interarrival_histogram"].fn(spark, SF_DIR)
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        n_users = ev.select("user_id").distinct().count()
        total = out.agg(F.sum("n_gaps")).collect()[0][0]
        assert total == ev.count() - n_users  # one first-event per user


class TestPiiRateBySource:
    def test_density_matches_seeding_rule(self, spark):
        out = QUERIES["curation_pii_rate_by_source"].fn(spark, SF_DIR)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        expect = (
            docs.filter(
                (F.col("doc_id") % 7 == 0)
                | (F.col("doc_id") % 11 == 0)
                | (F.col("doc_id") % 13 == 0)
            )
            .groupBy("source")
            .count()
        )
        j = out.join(expect, "source", "left").fillna(0, subset=["count"])
        assert j.filter(F.col("docs_with_pii") != F.col("count")).count() == 0
        # rate and redaction can never disagree: total category hits equal
        # the seeded counts (one per matching residue)
        tot = out.agg(
            F.sum("n_email").alias("e"), F.sum("n_ipv4").alias("i"),
            F.sum("n_phone").alias("p"),
        ).collect()[0]
        assert tot["e"] == docs.filter(F.col("doc_id") % 7 == 0).count()
        assert tot["i"] == docs.filter(F.col("doc_id") % 11 == 0).count()
        assert tot["p"] == docs.filter(F.col("doc_id") % 13 == 0).count()


class TestParetoConcentration:
    def test_crossing_index_is_tight(self, spark):
        """n_top_half is the MINIMAL prefix reaching half: the prefix sum at
        n_top_half crosses 50%, and (when n_top_half > 1) the one before
        does not."""
        out = QUERIES["orders_pareto_concentration"].fn(spark, SF_DIR)
        rows = out.collect()
        assert all(1 <= r["n_top_half"] <= r["n_customers"] for r in rows)
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        nat = spark.read.parquet(f"{SF_DIR}/nation.parquet")
        cents = (F.col("o_totalprice").cast("decimal(14,2)") * 100).cast("long")
        rev = (
            orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"), "c_custkey")
            .agg(F.sum(cents).alias("cents"))
        )
        by_nation = {
            n: sorted(
                [(r["cents"], r["c_custkey"]) for r in g],
                key=lambda x: (-x[0], x[1]),
            )
            for n, g in __import__("itertools").groupby(
                sorted(rev.collect(), key=lambda r: r["nation"]),
                key=lambda r: r["nation"],
            )
        }
        for r in rows:
            seq = [c for c, _ in by_nation[r["nation"]]]
            tot = sum(seq)
            k = r["n_top_half"]
            assert 2 * sum(seq[:k]) >= tot
            if k > 1:
                assert 2 * sum(seq[: k - 1]) < tot


class TestSnippetHighlight:
    def test_snippet_contains_term_and_window_bounds(self, spark):
        rows = QUERIES["search_snippet_highlight"].fn(spark, SF_DIR).collect()
        assert len(rows) == 15
        tfs = [r["tf"] for r in rows]
        assert tfs == sorted(tfs, reverse=True)
        for r in rows:
            toks = r["snippet"].split(" ")
            assert "window" in toks
            assert len(toks) <= 7


class TestGiniByNation:
    def test_bounds_and_pareto_consistency(self, spark):
        """Gini in [0,1); a nation whose half-revenue prefix is a SMALLER
        share of customers cannot have lower inequality than a perfectly
        equal one (gini 0 implies n_top_half ~ half the customers)."""
        gini = {r["nation"]: r for r in
                QUERIES["agg_gini_by_nation"].fn(spark, SF_DIR).collect()}
        par = {r["nation"]: r for r in
               QUERIES["orders_pareto_concentration"].fn(spark, SF_DIR).collect()}
        assert set(gini) == set(par)
        for n, g in gini.items():
            assert 0 <= g["gini_micro"] < 1_000_000
            if g["gini_micro"] == 0:
                assert par[n]["n_top_half"] * 2 >= par[n]["n_customers"]

    def test_matches_driver_float_recompute(self, spark):
        import duckdb

        rows = duckdb.sql(f"""
          SELECT n.n_name, c.c_custkey,
                 SUM(CAST(CAST(o.o_totalprice AS DECIMAL(14,2))*100 AS BIGINT)) cents
          FROM '{SF_DIR}/orders.parquet' o
          JOIN '{SF_DIR}/customer.parquet' c ON c.c_custkey = o.o_custkey
          JOIN '{SF_DIR}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
          GROUP BY 1,2""").fetchall()
        by_nation = {}
        for nat, _ck, cents in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
            by_nation.setdefault(nat, []).append(int(cents))
        out = {r["nation"]: r["gini_micro"] for r in
               QUERIES["agg_gini_by_nation"].fn(spark, SF_DIR).collect()}
        import math

        for nat, xs in by_nation.items():
            n, sx = len(xs), sum(xs)
            sixi = sum((i + 1) * x for i, x in enumerate(xs))
            want = math.floor((1000000.0 * ((2 * sixi) - ((n + 1) * sx))) / (n * sx))
            assert out[nat] == want, nat


class TestAsofTolerance:
    def test_tolerance_nulls_only_stale_matches(self, spark):
        tol = QUERIES["asof_join_tolerance_15m"].fn(spark, SF_DIR)
        plain = QUERIES["asof_join_purchase_click"].fn(spark, SF_DIR)
        j = tol.alias("t").join(
            plain.select("event_id", F.col("ts_click").alias("raw_click")),
            "event_id",
        )
        # fresh matches identical; stale (>15m) nulled; never invents one
        fresh_mismatch = j.filter(
            (F.col("raw_click") >= F.col("ts") - F.expr("INTERVAL 15 MINUTE"))
            & (F.col("ts_click") != F.col("raw_click"))
        ).count()
        stale_kept = j.filter(
            (F.col("raw_click") < F.col("ts") - F.expr("INTERVAL 15 MINUTE"))
            & F.col("ts_click").isNotNull()
        ).count()
        invented = j.filter(
            F.col("raw_click").isNull() & F.col("ts_click").isNotNull()
        ).count()
        assert fresh_mismatch == 0 and stale_kept == 0 and invented == 0
        assert tol.count() == plain.count()  # left rows always survive


class TestTokenSavings:
    def test_token_and_doc_rates_share_the_cut(self, spark, keep):
        """removed_tokens must equal the token mass of exactly the docs the
        keep-rule drops — no drift between the doc-rate and token-rate
        views of the same cut."""
        sav = QUERIES["dedup_token_savings_by_source"].fn(spark, SF_DIR)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
        dropped = (
            keep.filter(~F.col("kept"))
            .join(docs.select("doc_id", n_tok.alias("n_tokens")), "doc_id")
            .agg(F.sum("n_tokens"))
            .collect()[0][0]
        ) or 0
        got = sav.agg(F.sum("removed_tokens")).collect()[0][0]
        assert got == dropped
        assert sav.filter(
            F.col("removed_tokens") > F.col("total_tokens")
        ).count() == 0


class TestWeekdayHourHeatmap:
    def test_grid_conservation_and_domain(self, spark):
        rows = QUERIES["events_weekday_hour_heatmap"].fn(spark, SF_DIR).collect()
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        assert sum(r["n_events"] for r in rows) == ev.count()
        assert all(1 <= r["dow"] <= 7 and 0 <= r["hour"] <= 23 for r in rows)


class TestLshRecallEval:
    def test_full_recall_and_subset_property(self, spark):
        """LSH output is verified, hence a SUBSET of exact pairs; on this
        corpus the registered contract is FULL recall."""
        row = QUERIES["dedup_lsh_recall_eval"].fn(spark, SF_DIR).collect()[0]
        assert row["n_common"] == row["n_lsh_pairs"] <= row["n_exact_pairs"]
        assert row["recall_permille"] == 1000
        assert row["n_exact_pairs"] > 0  # the eval is not vacuous


class TestErrorBurstDetect:
    def test_peak_matches_driver_recompute(self, spark):
        import collections

        rows = QUERIES["events_error_burst_detect"].fn(spark, SF_DIR).collect()
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "event_type", (F.unix_micros(F.col("ts").cast("timestamp"))
                           / F.lit(900_000_000)).cast("long").alias("b")
        ).collect()
        per_type = collections.defaultdict(collections.Counter)
        for r in ev:
            per_type[r["event_type"]][r["b"]] += 1
        for r in rows:
            c = per_type[r["event_type"]]
            best, best_b = -1, None
            for b in sorted(c):
                n1h = sum(c.get(b - i, 0) for i in range(4))
                if n1h > best:
                    best, best_b = n1h, b
            assert r["peak_1h_events"] == best, r["event_type"]
            assert r["peak_bucket"] == best_b, r["event_type"]


class TestLengthByLang:
    def test_conservation(self, spark):
        out = QUERIES["profile_length_by_lang"].fn(spark, SF_DIR)
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        assert out.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
        bad = out.filter(
            (F.col("min_chars") > F.col("mean_chars"))
            | (F.col("mean_chars") > F.col("max_chars"))
        ).count()
        assert bad == 0


class TestLangidConfusion:
    def test_matrix_conserves_docs_and_agrees_with_classifier(self, spark):
        """The matrix must conserve the corpus and reproduce exactly the
        registered classifier's per-prediction totals. NOTE the corpus
        text is English-ish tech vocabulary regardless of the synthetic
        ``lang`` label — the matrix truthfully reports near-total en
        prediction mass, which is precisely the mis-routing a confusion
        matrix exists to surface (so no diagonal-dominance assertion)."""
        rows = QUERIES["text_langid_confusion"].fn(spark, SF_DIR).collect()
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        assert sum(r["n_docs"] for r in rows) == docs.count()
        clf = QUERIES["text_lang_id"].fn(spark, SF_DIR)
        per_pred = {
            r["pred_lang"]: r["count"]
            for r in clf.groupBy("pred_lang").count().collect()
        }
        got = {}
        for r in rows:
            got[r["pred_lang"]] = got.get(r["pred_lang"], 0) + r["n_docs"]
        assert got == per_pred


class TestHhiByNation:
    def test_bounds_and_agreement_with_gini(self, spark):
        hhi = {r["nation"]: r for r in
               QUERIES["agg_hhi_by_nation"].fn(spark, SF_DIR).collect()}
        for n, r in hhi.items():
            lo = 1_000_000 // r["n_customers"] - 1  # floor slack
            assert lo <= r["hhi_micro"] <= 1_000_000, (n, r)


class TestLangUpsamplePlan:
    def test_factors_bring_langs_toward_max(self, spark):
        rows = QUERIES["curation_lang_upsample_plan"].fn(spark, SF_DIR).collect()
        mx = max(r["n_docs"] for r in rows)
        for r in rows:
            assert r["copies"] == mx // r["n_docs"]
            assert r["docs_after"] == r["n_docs"] * r["copies"]
            # whole copies never overshoot the target
            assert r["docs_after"] <= mx


class TestDimVarianceAudit:
    def test_moment_recompute_one_dim(self, spark):
        import duckdb
        import math

        rows = QUERIES["embedding_dim_variance_audit"].fn(spark, SF_DIR).collect()
        assert len(rows) == 64
        vals = [
            math.floor(float(v) * 1_000_000)
            for (v,) in duckdb.sql(
                f"SELECT embedding[1] FROM '{SF_DIR}/embeddings.parquet'"
            ).fetchall()
        ]
        n = len(vals)
        mm = sum(vals) // n
        var = sum((x - mm) ** 2 for x in vals) // n
        r0 = rows[0]
        assert r0["pos"] == 1 and r0["mean_micro"] == mm
        assert r0["var_micro2"] == var
        assert r0["min_micro"] == min(vals) and r0["max_micro"] == max(vals)


class TestPipelineSummary:
    def test_headline_row_reconciles_with_breakdowns(self, spark, keep):
        row = QUERIES["curation_dedup_pipeline_summary"].fn(spark, SF_DIR).collect()[0]
        assert row["n_docs"] == keep.count()
        assert row["n_kept"] == keep.filter("kept").count()
        assert row["n_families"] == keep.select("cluster_id").distinct().count()
        sav = QUERIES["dedup_token_savings_by_source"].fn(spark, SF_DIR)
        agg = sav.agg(
            F.sum("total_tokens").alias("tot"), F.sum("removed_tokens").alias("rm")
        ).collect()[0]
        assert row["tokens_before"] == agg["tot"]
        assert row["tokens_before"] - row["tokens_after"] == agg["rm"]


class TestDayOverDayGrowth:
    def test_first_day_null_and_delta_recompute(self, spark):
        rows = QUERIES["events_day_over_day_growth"].fn(spark, SF_DIR).collect()
        assert rows[0]["events_dod_permille"] is None
        import math

        for prev, cur in zip(rows, rows[1:]):
            want = math.floor(
                1000.0 * (cur["n_events"] - prev["n_events"]) / prev["n_events"]
            )
            assert cur["events_dod_permille"] == want


class TestSeasonalityIndex:
    def test_index_averages_to_flat_year(self, spark):
        rows = QUERIES["orders_seasonality_index"].fn(spark, SF_DIR).collect()
        assert len(rows) == 12
        total = sum(r["n_orders"] for r in rows)
        # Σ month_share * n_months = n_months exactly; permille floors sum
        # to within n_months of 12000
        s = sum(r["seasonality_permille"] for r in rows)
        assert 12000 - 12 <= s <= 12000
        assert all(r["seasonality_permille"] >= 0 for r in rows)
        assert total == spark.read.parquet(f"{SF_DIR}/orders.parquet").count()


class TestGopherRateBySource:
    def test_rate_agrees_with_per_doc_flags(self, spark):
        out = QUERIES["quality_gopher_rate_by_source"].fn(spark, SF_DIR)
        flags = QUERIES["quality_gopher_flags"].fn(spark, SF_DIR)
        total_pass = flags.filter("passes").count()
        assert out.agg(F.sum("n_pass")).collect()[0][0] == total_pass
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        assert out.agg(F.sum("n_docs")).collect()[0][0] == docs.count()


class TestSourceLangCrosstab:
    def test_margins_match_existing_profiles(self, spark):
        ct = QUERIES["curation_source_lang_crosstab"].fn(spark, SF_DIR)
        by_lang = ct.groupBy("lang").agg(F.sum("n_docs").alias("n"))
        prof = QUERIES["profile_length_by_lang"].fn(spark, SF_DIR).select(
            "lang", F.col("n_docs").alias("want")
        )
        bad = by_lang.join(prof, "lang").filter(F.col("n") != F.col("want")).count()
        assert bad == 0


class TestUserActivityHistogram:
    def test_count_of_counts_conserves_users_and_events(self, spark):
        rows = QUERIES["events_user_activity_histogram"].fn(spark, SF_DIR).collect()
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        assert sum(r["n_users"] for r in rows) == ev.select("user_id").distinct().count()
        assert sum(r["events_per_user"] * r["n_users"] for r in rows) == ev.count()


class TestDailyStreak:
    def test_streak_recompute_driver_side(self, spark):
        import collections
        import datetime

        rows = QUERIES["events_longest_daily_streak"].fn(spark, SF_DIR).collect()
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "user_id", F.to_date("ts").alias("day")
        ).distinct().collect()
        days = collections.defaultdict(set)
        for r in ev:
            days[r["user_id"]].add(r["day"])
        for r in rows:
            ds = sorted(days[r["user_id"]])
            best, best_start, cur, start = 0, None, 0, None
            prev = None
            for d in ds:
                if prev is not None and (d - prev).days == 1:
                    cur += 1
                else:
                    cur, start = 1, d
                if cur > best:
                    best, best_start = cur, start
                prev = d
            assert r["longest_streak_days"] == best, r["user_id"]
            assert r["streak_start"] == best_start.strftime("%Y-%m-%d")


class TestLocfImputation:
    def test_fills_exactly_the_carried_value(self, spark):
        out = QUERIES["events_locf_imputation"].fn(spark, SF_DIR)
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        cents = (F.col("value").cast("decimal(10,2)") * 100).cast("long")
        truth = ev.select("event_id", cents.alias("true_cents"))
        j = out.join(truth, "event_id")
        # non-nulled rows pass their own value through unchanged
        assert j.filter(
            (~F.col("was_null")) & (F.col("filled_cents") != F.col("true_cents"))
        ).count() == 0
        # nulled rows never leak their own (hidden) value by accident:
        # the filled value must equal the previous non-nulled event's
        from pyspark.sql.window import Window as W

        w = (
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        prev = ev.select(
            "event_id", "user_id", "ts",
            F.last(
                F.when(F.col("event_id") % 5 != 0, cents), ignorenulls=True
            ).over(w).alias("prev_real"),
        ).select("event_id", "prev_real")
        jj = out.filter("was_null").join(prev, "event_id")
        # Null-safe compare (r5 ADVICE): plain != is NULL when exactly one
        # side is NULL, silently not counting a filled-vs-missing mismatch.
        bad = jj.filter(
            ~F.col("filled_cents").eqNullSafe(F.col("prev_real"))
        ).count()
        assert bad == 0
