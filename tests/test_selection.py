"""DSIR importance resampling (operators/selection.py): bit-exact parity
with a pure-python reference, scale-shape invariants, and a semantic sanity
check (target-language docs outscore off-target docs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ---------------------------------------------------------------- reference

BASE, MOD = 31, 1_000_000_007


def py_fold(s: str) -> int:
    h = 0
    for c in s:
        h = (h * BASE + ord(c)) % MOD
    return h


def py_ngrams(text: str) -> list[str]:
    import re

    tk = re.split(r"\s+", text)
    return tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]


def py_counts(texts: list[str], m: int) -> list[int]:
    out = [0] * m
    for t in texts:
        for g in py_ngrams(t):
            out[py_fold(g) % m] += 1
    return out


def py_grid(target: list[int], raw: list[int]) -> list[int]:
    m = len(target)
    nt, nr = sum(target), sum(raw)
    return [
        int(
            round(
                1e6
                * (
                    math.log((target[b] + 1) / (nt + m))
                    - math.log((raw[b] + 1) / (nr + m))
                )
            )
        )
        for b in range(m)
    ]


def py_score(text: str, grid: list[int]) -> tuple[int, int]:
    m = len(grid)
    gs = py_ngrams(text)
    return len(gs), sum(grid[py_fold(g) % m] for g in gs)


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox"),
    (2, "lorem ipsum dolor sit amet consectetur"),
    (3, "jumps over the lazy dog again and again"),
    (4, "entirely unrelated string of rare tokens xyzzy plugh"),
    (5, "single"),
    (6, "the the the the the"),
]
TARGET_IDS = {0, 1, 3}


class TestDsirParity:
    def test_fit_matches_python(self, spark):
        from sea_streamer_spark.operators import selection as SEL

        m = 64
        df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        target = df.filter(F.col("doc_id").isin(list(TARGET_IDS)))
        assert SEL.fit_bucket_counts(target, m=m) == py_counts(
            [t for i, t in CORPUS if i in TARGET_IDS], m
        )
        assert SEL.fit_bucket_counts(df, m=m) == py_counts(
            [t for _, t in CORPUS], m
        )

    def test_score_matches_python_bit_exact(self, spark):
        from sea_streamer_spark.operators import selection as SEL

        m = 64
        df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        grid = py_grid(
            py_counts([t for i, t in CORPUS if i in TARGET_IDS], m),
            py_counts([t for _, t in CORPUS], m),
        )
        target = df.filter(F.col("doc_id").isin(list(TARGET_IDS)))
        assert SEL.dsir_logratio_grid(
            SEL.fit_bucket_counts(target, m=m), SEL.fit_bucket_counts(df, m=m)
        ) == grid
        got = {
            r.doc_id: (r.n_ngrams, r.logw_micro)
            for r in SEL.dsir_score(df, grid).collect()
        }
        want = {i: py_score(t, grid) for i, t in CORPUS}
        assert got == want

    def test_select_topk_deterministic(self, spark):
        from sea_streamer_spark.operators import selection as SEL

        m = 64
        df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        grid = py_grid(
            py_counts([t for i, t in CORPUS if i in TARGET_IDS], m),
            py_counts([t for _, t in CORPUS], m),
        )
        scores = {i: py_score(t, grid) for i, t in CORPUS}
        want = sorted(scores, key=lambda i: (-scores[i][1], i))[:3]
        got = [r.doc_id for r in SEL.dsir_select(df, grid, k=3).collect()]
        assert got == want

    def test_target_docs_outscore_raw_on_average(self, spark):
        """The operator's point: with an in-corpus target slice, the target
        members' mean importance weight must exceed the non-members'."""
        from sea_streamer_spark.operators import selection as SEL

        m = 64
        df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        target = df.filter(F.col("doc_id").isin(list(TARGET_IDS)))
        grid = SEL.dsir_logratio_grid(
            SEL.fit_bucket_counts(target, m=m), SEL.fit_bucket_counts(df, m=m)
        )
        rows = SEL.dsir_score(df, grid).collect()
        t = [r.logw_micro for r in rows if r.doc_id in TARGET_IDS]
        o = [r.logw_micro for r in rows if r.doc_id not in TARGET_IDS]
        assert sum(t) / len(t) > sum(o) / len(o)


class TestDsirPlanShape:
    def test_fit_collect_is_geometry_bounded(self, spark, sf_dir):
        """The fit's aggregate output is ≤ m rows no matter the corpus —
        the bloom/CMS bounded-model contract."""
        from sea_streamer_spark.operators import selection as SEL
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        m = 32
        counts = SEL.fit_bucket_counts(docs, m=m)
        assert len(counts) == m and sum(counts) > 0

    def test_score_plan_has_no_join_and_single_agg_shuffle(self, spark, sf_dir):
        """Scoring must stay a projection + one doc-keyed aggregate over
        the exploded relation (plus the left join back for empty docs);
        the grid lookup must NOT plan as a join."""
        from sea_streamer_spark.operators import selection as SEL
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        grid = [1] * 64
        df = SEL.dsir_score(docs, grid)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==", 1)[0]
        assert "BroadcastNestedLoopJoin" not in plan
        assert "PythonEval" not in plan  # all-JVM scoring path
        shuffles = sum(
            1
            for line in plan.splitlines()
            if line.strip().lstrip("+-*: ").startswith("Exchange")
            and "SinglePartition" not in line
        )
        # one agg shuffle + one doc-key join co-location pair at most
        assert shuffles <= 3, plan

    def test_language_target_ranks_language_docs_first(self, spark, sf_dir):
        """Fit target = English docs; the top-quartile of the selection
        must be overwhelmingly English — the DSIR paper's qualitative
        claim, measurable here because the corpus is language-tagged."""
        from sea_streamer_spark.operators import selection as SEL
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        en = docs.filter(F.col("lang") == "en")
        grid = SEL.dsir_logratio_grid(
            SEL.fit_bucket_counts(en), SEL.fit_bucket_counts(docs)
        )
        n = docs.count()
        top = SEL.dsir_select(docs, grid, k=max(n // 4, 10))
        frac_en = (
            top.join(docs.select("doc_id", "lang"), "doc_id")
            .filter(F.col("lang") == "en")
            .count()
            / top.count()
        )
        base = en.count() / n
        assert frac_en > min(0.9, base * 1.5), (frac_en, base)


class TestNullTextRobustness:
    def test_dsir_and_bpe_handle_null_text(self, spark):
        """NULL text must score logw 0 (DSIR) and count 0 tokens (BPE) —
        the oracle-parity contract for degenerate rows, not a crash."""
        from sea_streamer_spark.operators import bpe as B
        from sea_streamer_spark.operators import selection as SEL

        df = spark.createDataFrame(
            [(0, "hello world"), (1, None), (2, "")],
            "doc_id long, text string",
        )
        grid = [7] * 32
        got = {
            r.doc_id: (r.n_ngrams, r.logw_micro)
            for r in SEL.dsir_score(df, grid).collect()
        }
        assert got[1] == (0, 0)
        assert got[0][0] == 3  # 2 unigrams + 1 bigram

        merges = [("l", "o", 2)]
        counts = {
            r.doc_id: r.t
            for r in df.select(
                "doc_id", B.bpe_token_count("text", merges).alias("t")
            ).collect()
        }
        assert counts[1] == 0 and counts[2] == 0 and counts[0] > 0
