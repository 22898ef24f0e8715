"""BPE tokenizer (operators/bpe.py): distributed-vs-python trainer parity,
merge-application scan semantics, and the zero-shuffle apply plan."""

from __future__ import annotations

from pyspark.sql import functions as F


CORPUS = [
    (0, "low lower lowest low low"),
    (1, "newer newest new low"),
    (2, "wider wide wider  "),
    (3, ""),
    (4, "aaaa aa a"),
]


def _py_wc(rows):
    wc: dict[str, int] = {}
    for _, t in rows:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


class TestBpeTrainer:
    def test_distributed_matches_python(self, spark):
        from sea_streamer_spark.operators import bpe as B

        df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        assert B.train_bpe(df, 10) == B.py_train_bpe(_py_wc(CORPUS), 10)

    def test_early_stop_when_nothing_repeats(self, spark):
        from sea_streamer_spark.operators import bpe as B

        rows = [(0, "ab cd ef")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = B.train_bpe(df, 10)
        assert got == B.py_train_bpe(_py_wc(rows), 10)
        assert len(got) < 10  # no pair reaches count 2 after the vocab drains

    def test_shared_separator_scan_semantics(self, spark):
        """The ' a a a a ' → ' aa a a ' replace-scan contract: after merge
        (a,a), the word 'aaaa' is [aa, a, a] — NOT [aa, aa] — and the
        python trainer, the distributed trainer, and the apply expression
        must all agree on it."""
        from sea_streamer_spark.operators import bpe as B

        rows = [(0, "aaaa aaaa")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        merges = B.train_bpe(df, 1)
        assert merges == B.py_train_bpe(_py_wc(rows), 1) == [("a", "a", 6)]
        n = df.select(B.bpe_token_count("text", merges).alias("t")).collect()[0].t
        # each 'aaaa' → [aa, a, a] = 3 tokens, two words → 6
        assert n == 6


class TestBpeApply:
    def test_token_counts_match_python_apply(self, spark):
        from sea_streamer_spark.operators import bpe as B

        df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
        merges = B.train_bpe(df, 8)

        def py_apply(t: str) -> int:
            n = 0
            for w in t.split():
                s = f" {' '.join(w)} "
                for left, right, _ in merges:
                    s = s.replace(f" {left} {right} ", f" {left}{right} ")
                n += len(s.strip().split(" "))
            return n

        got = {
            r.doc_id: r.t
            for r in df.select(
                "doc_id", B.bpe_token_count("text", merges).alias("t")
            ).collect()
        }
        assert got == {i: py_apply(t) for i, t in CORPUS}
        assert got[3] == 0  # empty doc

    def test_apply_plan_is_shuffle_free_and_jvm_only(self, spark, sf_dir):
        from sea_streamer_spark.operators import bpe as B
        from sea_streamer_spark.sources.tables import load_tables

        docs = load_tables(spark, sf_dir, "documents").documents
        merges = [("e", "r", 3), ("t", "h", 2)]
        df = docs.select("doc_id", B.bpe_token_count("text", merges).alias("t"))
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==", 1)[0]
        assert "Exchange" not in plan, plan
        assert "PythonEval" not in plan


class TestBpeRandomized:
    def test_random_corpora_trainer_parity(self, spark):
        """Seeded-random corpora over a tiny alphabet (maximally collided
        pair counts ⇒ the tie-break carries the determinism) — distributed
        trainer vs the pure-python reference, merges AND applied counts."""
        import random

        from sea_streamer_spark.operators import bpe as B

        rng = random.Random(1)
        for trial in range(4):
            rows = [
                (
                    i,
                    " ".join(
                        "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
                        for _ in range(rng.randint(0, 8))
                    ),
                )
                for i in range(rng.randint(2, 6))
            ]
            df = spark.createDataFrame(rows, ["doc_id", "text"])
            n_merges = rng.choice([3, 5, 8])
            merges = B.train_bpe(df, n_merges)
            assert merges == B.py_train_bpe(_py_wc(rows), n_merges), (trial, rows)

            def py_apply(t: str) -> int:
                n = 0
                for w in t.split():
                    s = f" {' '.join(w)} "
                    for left, right, _ in merges:
                        s = s.replace(f" {left} {right} ", f" {left}{right} ")
                    n += len(s.strip().split(" "))
                return n

            got = {
                r.doc_id: r.t
                for r in df.select(
                    "doc_id", B.bpe_token_count("text", merges).alias("t")
                ).collect()
            }
            assert got == {i: py_apply(t) for i, t in rows}, (trial, rows)
