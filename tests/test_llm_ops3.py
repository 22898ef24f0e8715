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
            r.doc_id: (r.n_bigrams, r.mean_logp_micro, r.sum_logp_micro)
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
            return (
                len(lps),
                round(sum(lps) / len(lps) * 1e6) if lps else 0,
                sum(round(lp * 1e6) for lp in lps),
            )

        for d, t in rows:
            assert got[d] == ref(t), (d, got[d], ref(t))
        # the signal: natural prose above consonant junk; degenerate docs 0
        assert got[0][1] > got[2][1]
        assert got[3] == (0, 0, 0) and got[4] == (0, 0, 0)

    def test_corpus_run_is_total(self, spark, sf_dir):
        from sea_streamer_spark.operators.quality import char_lm_score
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        out = char_lm_score(docs)
        assert out.count() == docs.count()  # every doc scored, none dropped


class TestDuplicatedSpanCoverage:
    """duplicated_span_coverage vs a pure-python positional reference
    (the Lee et al. exact-substring-dedup metric; registry-deferred to
    round 4 so round 3's driver budget keeps its exact backlog fit)."""

    CORPUS = [
        # (doc_id, text) — crafted so coverage exercises: overlapping dup
        # spans (union, not sum), within-doc repetition, cross-doc spans,
        # docs with zero dups, and docs shorter than k.
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a quick brown fox runs fast"),           # shares "quick brown fox"
        (2, "the quick brown fox jumps high today"),  # shares 4-token span -> overlap union
        (3, "entirely unique words appear here only"),
        (4, "rep rep rep rep"),                       # within-doc repeated 3-gram
        (5, "two words"),                             # shorter than k -> 0/0
    ]

    @staticmethod
    def _reference(corpus, k=3, min_occ=2):
        from collections import Counter

        import re

        # split semantics: '' -> [''] — matches Spark split / DuckDB string_split
        toks = {i: re.split(r"\s+", t) for i, t in corpus}
        occ = Counter()
        for i, tk in toks.items():
            for p in range(len(tk) - k + 1):
                occ[" ".join(tk[p : p + k])] += 1
        out = {}
        for i, tk in toks.items():
            covered = set()
            for p in range(len(tk) - k + 1):
                if occ[" ".join(tk[p : p + k])] >= min_occ:
                    covered.update(range(p, p + k))
            n = len(tk)
            out[i] = (n, len(covered), (len(covered) * 1000 // n) if n else 0)
        return out


    # --- randomized sweep (fixed seeds — Spark jobs are too heavy for
    # per-example hypothesis, so this is the bounded-fuzz equivalent) ---

    def test_randomized_corpora_match_reference(self, spark):
        import random

        from sea_streamer_spark.operators.dedup import duplicated_span_coverage

        vocab = [f"w{i}" for i in range(12)]  # small vocab -> dense collisions
        for seed in (7, 42, 1337):
            rng = random.Random(seed)
            corpus = [
                (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
                for i in range(40)
            ]
            df = spark.createDataFrame(corpus, ["doc_id", "text"])
            got = {
                r.doc_id: (r.n_tokens, r.covered_tokens, r.dup_permille)
                for r in duplicated_span_coverage(df).collect()
            }
            assert got == self._reference(corpus), seed

    def test_matches_pure_python_reference(self, spark):
        from sea_streamer_spark.operators.dedup import duplicated_span_coverage

        df = spark.createDataFrame(self.CORPUS, ["doc_id", "text"])
        got = {
            r.doc_id: (r.n_tokens, r.covered_tokens, r.dup_permille)
            for r in duplicated_span_coverage(df).collect()
        }
        assert got == self._reference(self.CORPUS)
        # sanity on the fixture itself: overlap-union cases really occur
        assert got[0][1] > 0 and got[3][1] == 0 and got[5] == (2, 0, 0)
        assert got[4][1] == 4  # within-doc repetition covers the whole doc

    def test_on_documents_table_and_plan_shape(self, spark, sf_dir):
        """Runs on the driver corpus; plan must contain no cartesian/BNLJ
        (every join is keyed by shingle or doc id)."""
        from sea_streamer_spark.operators.dedup import duplicated_span_coverage
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        out = duplicated_span_coverage(docs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        rows = out.collect()
        assert len(rows) == docs.count()
        for r in rows:
            assert 0 <= r.covered_tokens <= max(r.n_tokens, 1)
            assert 0 <= r.dup_permille <= 1000


class TestBloomIncrementalDedup:
    """operators/bloom.py: the broadcastable-membership incremental dedup
    gate (registry-deferred to round 4 with a plain anti-join oracle)."""

    def _frames(self, spark, n_corpus=2000, overlap=500, n_new=1500):
        corpus = spark.createDataFrame(
            [(f"doc-{i}",) for i in range(n_corpus)], ["fp"]
        )
        new = spark.createDataFrame(
            [(f"doc-{i}",) for i in range(n_corpus - overlap, n_corpus - overlap + n_new)],
            ["fp"],
        )
        return corpus, new

    def test_no_false_negatives_ever(self, spark):
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.bloom import bloom_build, bloom_might_contain

        corpus, _ = self._frames(spark)
        model = bloom_build(corpus, "fp", m_bits=1 << 15, g=5)
        misses = (
            corpus.select(bloom_might_contain(model, F.col("fp")).alias("c"))
            .filter(~F.col("c"))
            .count()
        )
        assert misses == 0  # the Bloom invariant the exactness proof rests on

    def test_fp_rate_within_occupancy_bound(self, spark):
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.bloom import bloom_build, bloom_might_contain

        corpus, _ = self._frames(spark)
        model = bloom_build(corpus, "fp", m_bits=1 << 15, g=5)
        probe = spark.createDataFrame(
            [(f"other-{i}",) for i in range(4000)], ["fp"]
        )
        fps = (
            probe.select(bloom_might_contain(model, F.col("fp")).alias("c"))
            .filter(F.col("c"))
            .count()
        )
        # (set_bits/m)^g is the expected rate; allow 3x slack for variance
        assert fps / 4000 <= 3 * model.fp_rate() + 1e-3, (fps, model.fp_rate())

    def test_result_equals_exact_anti_join(self, spark):
        from sea_streamer_spark.operators.bloom import bloom_incremental_dedup

        corpus, new = self._frames(spark)
        got = sorted(r.fp for r in bloom_incremental_dedup(new, corpus, "fp").collect())
        want = sorted(
            r.fp for r in new.join(corpus, "fp", "left_anti").collect()
        )
        assert got == want and len(got) == 1000

    def test_model_reuse_and_probe_plan_is_join_free(self, spark):
        """The steady-state path: a persisted model probes map-side — the
        definite-new branch's plan must contain no join at all."""
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.bloom import (
            bloom_build,
            bloom_incremental_dedup,
            bloom_might_contain,
        )

        corpus, new = self._frames(spark)
        model = bloom_build(corpus, "fp", m_bits=1 << 15, g=5)
        definite = new.filter(~bloom_might_contain(model, F.col("fp")))
        plan = definite._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "Exchange" not in plan
        out = bloom_incremental_dedup(new, corpus, "fp", model=model)
        assert out.count() == 1000



class TestEmbeddingWhitening:
    """operators/embedding.py: one-pass distributed PCA whitening."""

    def test_matches_single_machine_numpy(self, spark, sf_dir):
        """The distributed sufficient-statistic reduction must agree with
        plain numpy PCA on the collected matrix (float tolerance — the
        partition-order of the float sums differs, nothing else may)."""
        import numpy as np

        from sea_streamer_spark.operators.embedding import fit_whiten, whiten
        from sea_streamer_spark.sources.tables import load_tables

        emb = load_tables(spark, sf_dir, "embeddings").embeddings.repartition(7)
        model = fit_whiten(emb, "embedding")
        x = np.asarray(
            [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
        )
        mu = x.mean(axis=0)
        cov = (x - mu).T @ (x - mu) / x.shape[0]
        lam = np.sort(np.linalg.eigvalsh(cov))[::-1]
        np.testing.assert_allclose(np.asarray(model.mean), mu, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(model.eigvals), np.maximum(lam, 0), rtol=1e-6, atol=1e-8
        )

    def test_whitened_covariance_is_identity(self, spark, sf_dir):
        import numpy as np

        from sea_streamer_spark.operators.embedding import fit_whiten, whiten
        from sea_streamer_spark.sources.tables import load_tables

        emb = load_tables(spark, sf_dir, "embeddings").embeddings
        model = fit_whiten(emb, "embedding", k=16)
        out = whiten(emb, model, "embedding")
        assert out.columns == emb.columns + ["whitened"]  # carries all cols
        y = np.asarray(
            [r.whitened for r in out.select("whitened").collect()], dtype=np.float64
        )
        cov = (y - y.mean(axis=0)).T @ (y - y.mean(axis=0)) / y.shape[0]
        np.testing.assert_allclose(cov, np.eye(16), atol=5e-3)

    def test_deterministic_across_partitionings(self, spark, sf_dir):
        """Model reproducibility: the sign convention + eigh must give the
        same components regardless of how the data was partitioned (float
        sums reorder, so exact equality is on the rounded model)."""
        import numpy as np

        from sea_streamer_spark.operators.embedding import fit_whiten
        from sea_streamer_spark.sources.tables import load_tables

        emb = load_tables(spark, sf_dir, "embeddings").embeddings
        m1 = fit_whiten(emb.repartition(3), "embedding", k=8)
        m2 = fit_whiten(emb.repartition(11), "embedding", k=8)
        np.testing.assert_allclose(
            np.asarray(m1.components), np.asarray(m2.components), atol=1e-6
        )

    def test_plan_is_map_only(self, spark, sf_dir):
        from sea_streamer_spark.operators.embedding import fit_whiten, whiten
        from sea_streamer_spark.sources.tables import load_tables

        emb = load_tables(spark, sf_dir, "embeddings").embeddings
        model = fit_whiten(emb, "embedding", k=4)
        plan = whiten(emb, model, "embedding")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan


class TestStreamingBloomDedup:
    """streaming_bloom_dedup_sink: firehose-vs-all-history dedup with a
    persisted, incrementally-updated filter."""

    def _run_batch(self, spark, sink, rows, batch_id):
        df = spark.createDataFrame(rows, ["doc_id", "fp"])
        sink(df, batch_id)

    def test_cross_batch_and_within_batch_dedup(self, spark, tmp_path):
        from sea_streamer_spark.operators.bloom import streaming_bloom_dedup_sink

        out = str(tmp_path / "out")
        state = str(tmp_path / "state")
        sink = streaming_bloom_dedup_sink(out, state, key_col="fp")
        self._run_batch(spark, sink, [(1, "a"), (2, "b"), (3, "b")], 0)
        self._run_batch(spark, sink, [(4, "b"), (5, "c"), (6, "a")], 1)
        self._run_batch(spark, sink, [(7, "d"), (8, "c")], 2)
        got = sorted(r.fp for r in spark.read.parquet(out).collect())
        # one survivor per distinct key, ever
        assert got == ["a", "b", "c", "d"]

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        from sea_streamer_spark.operators.bloom import streaming_bloom_dedup_sink

        out = str(tmp_path / "out")
        state = str(tmp_path / "state")
        sink = streaming_bloom_dedup_sink(out, state, key_col="fp")
        self._run_batch(spark, sink, [(1, "a"), (2, "b")], 0)
        self._run_batch(spark, sink, [(3, "c")], 1)
        # crash-replay of batch 1: overwrite-by-batch-path + idempotent OR
        self._run_batch(spark, sink, [(3, "c")], 1)
        got = sorted(r.fp for r in spark.read.parquet(out).collect())
        assert got == ["a", "b", "c"]

    def test_streaming_end_to_end(self, spark, tmp_path):
        """Through a real streaming query (availableNow, rate-limited file
        source standing in for the firehose)."""
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.bloom import streaming_bloom_dedup_sink
        from sea_streamer_spark.streaming.sink import idempotent_foreach_batch

        src = str(tmp_path / "src")
        # 3 files -> 3 micro-batches (maxFilesPerTrigger=1); keys overlap
        for i, keys in enumerate((["x", "y"], ["y", "z"], ["z", "x", "w"])):
            spark.createDataFrame(
                [(i * 10 + j, k) for j, k in enumerate(keys)], ["doc_id", "fp"]
            ).coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}")
        out = str(tmp_path / "out")
        state = str(tmp_path / "state")
        stream = (
            spark.readStream.schema("doc_id long, fp string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        q = (
            stream.writeStream.foreachBatch(
                idempotent_foreach_batch(
                    streaming_bloom_dedup_sink(out, state, key_col="fp"),
                    str(tmp_path / "marker"),
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(r.fp for r in spark.read.parquet(out).collect())
        assert got == ["w", "x", "y", "z"]

    def test_ledger_is_bucket_partitioned_for_pruned_verify(self, spark, tmp_path):
        """The per-batch history scan must be prunable: ledger files live
        under hive-style bucket= partitions keyed by a key hash."""
        import os

        from sea_streamer_spark.operators.bloom import streaming_bloom_dedup_sink

        out = str(tmp_path / "out")
        state = str(tmp_path / "state")
        sink = streaming_bloom_dedup_sink(out, state, key_col="fp", n_buckets=8)
        self._run_batch(spark, sink, [(i, f"k{i}") for i in range(40)], 0)
        batch_dir = os.path.join(state, "keys", "batch_id=0")
        subdirs = sorted(d for d in os.listdir(batch_dir) if d.startswith("bucket="))
        assert len(subdirs) > 1  # keys really spread across bucket partitions
        # cross-batch dedup still exact through the pruned path
        self._run_batch(spark, sink, [(100 + i, f"k{i}") for i in range(0, 40, 2)], 1)
        self._run_batch(spark, sink, [(200, "k0"), (201, "fresh")], 2)
        got = sorted(r.fp for r in spark.read.parquet(out).collect())
        assert got == sorted([f"k{i}" for i in range(40)] + ["fresh"])


class TestCountMinSketch:
    """operators/sketch.py: bounded-memory frequency estimation."""

    def test_one_sided_error_and_bound(self, spark):
        import random

        from sea_streamer_spark.operators.sketch import CMS_DEPTH, cms_build

        rng = random.Random(11)
        # zipf-ish: key i appears ~ 1000/i times
        rows = [(f"key{i}",) for i in range(1, 200) for _ in range(1000 // i)]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, ["k"])
        model = cms_build(df, "k", width=512)
        from collections import Counter

        true = Counter(r[0] for r in rows)
        n = len(rows)
        eps = 2.718 / 512  # e/w
        over = 0
        for k, t in true.items():
            est = model.estimate(k)
            assert est >= t, (k, est, t)  # one-sided, always
            if est > t + eps * n:
                over += 1
        # est <= true + eps*N holds w.p. 1-exp(-d) per key
        assert over <= len(true) * (2.72 ** -CMS_DEPTH) * 3 + 1, over
        assert model.total == n

    def test_merge_equals_rebuild(self, spark):
        from sea_streamer_spark.operators.sketch import cms_build, cms_merge

        a = spark.createDataFrame([(f"a{i % 7}",) for i in range(50)], ["k"])
        b = spark.createDataFrame([(f"a{i % 5}",) for i in range(30)], ["k"])
        merged = cms_merge(cms_build(a, "k", 256), cms_build(b, "k", 256))
        rebuilt = cms_build(a.unionByName(b), "k", 256)
        assert merged == rebuilt  # the streaming-accumulator property

    def test_expr_matches_python_estimate(self, spark):
        from pyspark.sql import functions as F

        from sea_streamer_spark.operators.sketch import cms_build, cms_estimate_expr

        df = spark.createDataFrame([(f"t{i % 9}",) for i in range(90)], ["k"])
        model = cms_build(df, "k", width=128)
        got = {
            r.k: r.est
            for r in df.distinct()
            .select("k", cms_estimate_expr(model, F.col("k")).alias("est"))
            .collect()
        }
        for k, est in got.items():
            assert est == model.estimate(k)
        # probe plan is join- and shuffle-free (literal grid lookups)
        plan = (
            df.select(cms_estimate_expr(model, F.col("k")))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan and "Exchange" not in plan


class TestLeakageSafeSplit:
    def test_clusters_never_straddle_splits(self, spark, sf_dir):
        """The whole point: every near-dup pair (and transitively every
        cluster) lands in ONE split; the marginal split ratios stay close
        to 80/10/10."""
        from sea_streamer_spark.plans.queries import QUERIES

        rows = QUERIES["curation_leakage_safe_split"].fn(spark, sf_dir).collect()
        split_of = {}
        by_cluster = {}
        for r in rows:
            split_of[r.doc_id] = r.split
            by_cluster.setdefault(r.cluster_id, set()).add(r.split)
        assert all(len(s) == 1 for s in by_cluster.values())

        from sea_streamer_spark.operators import dedup as D
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        pairs = D.minhash_lsh_dedup(docs, threshold=0.5).collect()
        assert pairs, "fixture should contain near-dup pairs"
        for p in pairs:
            assert split_of[p.doc_a] == split_of[p.doc_b], (p.doc_a, p.doc_b)

        n = len(rows)
        frac_train = sum(1 for r in rows if r.split == "train") / n
        assert 0.6 < frac_train < 0.95, frac_train


class TestContrastiveTriples:
    def test_triple_invariants(self, spark, sf_dir):
        """Positive is the anchor's TOP match above threshold; negatives
        sit strictly inside the hard band, ranked by similarity; every
        anchor emits at most n_neg rows."""
        from sea_streamer_spark.plans.queries import QUERIES

        rows = QUERIES["triples_hard_negatives"].fn(spark, sf_dir).collect()
        assert rows, "fixture should yield triples"
        by_anchor: dict = {}
        for r in rows:
            assert r.pos_sim >= 0.45
            assert 0.15 <= r.neg_sim < 0.35
            assert r.pos_sim > r.neg_sim
            by_anchor.setdefault(r.anchor_id, []).append(r)
        for a, rs in by_anchor.items():
            rs = sorted(rs, key=lambda r: r.neg_rank)
            assert [r.neg_rank for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= 3
            sims = [r.neg_sim for r in rs]
            assert sims == sorted(sims, reverse=True)
            # one positive per anchor
            assert len({(r.pos_id, r.pos_sim) for r in rs}) == 1

    def test_positive_is_true_argmax(self, spark, sf_dir):
        """Cross-check the positive against brute-force near_dup_pairs."""
        from sea_streamer_spark.operators import similarity as S
        from sea_streamer_spark.plans.queries import QUERIES
        from sea_streamer_spark.sources.tables import load_tables

        emb = load_tables(spark, sf_dir, "embeddings").embeddings
        best: dict = {}
        for p in S.near_dup_pairs(emb, threshold=0.45).collect():
            for a, b in ((p.id_a, p.id_b), (p.id_b, p.id_a)):
                cur = best.get(a)
                if cur is None or (p.cosine_sim, -b) > (cur[1], -cur[0]):
                    best[a] = (b, p.cosine_sim)
        rows = QUERIES["triples_hard_negatives"].fn(spark, sf_dir).collect()
        for r in rows:
            assert best[r.anchor_id][0] == r.pos_id, r


class TestSaltedSpanCoverage:
    """duplicated_span_coverage_salted ≡ the window formulation, exercised
    on the corpus shape it exists FOR: a heavy-hitter shingle present in
    every document (boilerplate). Output equality on both the crafted and
    randomized corpora proves the salted two-phase swap changes the plan,
    never the answer."""

    def test_boilerplate_corpus_equality(self, spark):
        from sea_streamer_spark.operators.dedup import (
            duplicated_span_coverage,
            duplicated_span_coverage_salted,
        )

        # every doc opens with the same 5-token boilerplate: one shingle
        # occurs ~n_docs times — the exact skew case the window buffers
        corpus = [
            (i, "all rights reserved terms apply " + " ".join(f"u{i}w{j}" for j in range(6)))
            for i in range(60)
        ]
        df = spark.createDataFrame(corpus, ["doc_id", "text"])
        want = {
            r.doc_id: (r.n_tokens, r.covered_tokens, r.dup_permille)
            for r in duplicated_span_coverage(df).collect()
        }
        for n_salts in (1, 4, 16):
            got = {
                r.doc_id: (r.n_tokens, r.covered_tokens, r.dup_permille)
                for r in duplicated_span_coverage_salted(df, n_salts=n_salts).collect()
            }
            assert got == want, n_salts
        # the boilerplate really is covered in every doc
        assert all(v[1] >= 5 for v in want.values())

    def test_randomized_equality(self, spark):
        import random

        from sea_streamer_spark.operators.dedup import (
            duplicated_span_coverage,
            duplicated_span_coverage_salted,
        )

        vocab = [f"w{i}" for i in range(12)]
        rng = random.Random(99)
        corpus = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
            for i in range(40)
        ]
        df = spark.createDataFrame(corpus, ["doc_id", "text"])
        want = {tuple(r) for r in duplicated_span_coverage(df).collect()}
        got = {tuple(r) for r in duplicated_span_coverage_salted(df).collect()}
        assert got == want
