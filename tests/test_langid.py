"""Cavnar-Trenkle n-gram language ID (operators/langid.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.operators import langid as L

SF_DIR = "/root/testdata/sf0.001"

#: Held-out sentences (NOT in the seed text) per language.
HELD_OUT = {
    "en": "she walked to the station in the rain because the bus had "
    "already left and there would not be another one until the evening",
    "de": "sie ging im regen zum bahnhof weil der bus schon abgefahren "
    "war und es bis zum abend keinen weiteren geben wuerde",
    "es": "ella camino a la estacion bajo la lluvia porque el autobus ya "
    "habia salido y no habria otro hasta la noche",
    "fr": "elle a marche jusqu a la gare sous la pluie parce que le bus "
    "etait deja parti et qu il n y en aurait pas d autre avant le soir",
    "it": "lei ha camminato fino alla stazione sotto la pioggia perche l "
    "autobus era gia partito e non ce ne sarebbe stato un altro fino a sera",
    "pt": "ela caminhou ate a estacao na chuva porque o onibus ja tinha "
    "partido e nao haveria outro ate a noite",
}


class TestProfiles:
    def test_profile_shapes(self):
        for lang, prof in L.PROFILES.items():
            assert 0 < len(prof) <= L.PROFILE_K, lang
            ranks = sorted(prof.values())
            assert ranks == list(range(1, len(prof) + 1)), lang

    def test_profile_rows_cover_all_profiles(self):
        rows = L.profile_rows()
        grams = {r[0] for r in rows}
        assert grams == {g for p in L.PROFILES.values() for g in p}
        # absent grams carry the miss penalty so the join side can
        # coalesce uniformly
        for row in rows:
            for r in row[1:]:
                assert 1 <= r <= L.MISS_PENALTY

    def test_python_reference_classifies_held_out(self):
        for lang, sent in HELD_OUT.items():
            assert L.classify_py(sent) == lang, (lang, L.classify_py(sent))

    def test_python_reference_unknown_for_empty(self):
        assert L.classify_py("12345 678") == "unknown"
        assert L.classify_py("") == "unknown"


class TestSparkClassifier:
    @pytest.fixture(scope="class")
    def spark(self):
        from sea_streamer_spark.session import get_spark

        return get_spark(app_name="test-langid")

    def test_spark_matches_python_on_held_out(self, spark):
        rows = [(i, t) for i, (_, t) in enumerate(sorted(HELD_OUT.items()))]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r["pred_lang"] for r in L.lang_id_ngram(df).collect()}
        expected = {
            i: lang for i, (lang, _) in enumerate(sorted(HELD_OUT.items()))
        }
        assert out == expected

    def test_spark_matches_python_on_corpus_sample(self, spark):
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") % 7 == 0)
            .select("doc_id", "text")
        )
        got = {
            r["doc_id"]: r["pred_lang"] for r in L.lang_id_ngram(docs).collect()
        }
        for r in docs.collect():
            assert got[r["doc_id"]] == L.classify_py(r["text"]), r["doc_id"]

    def test_short_and_empty_docs_are_unknown_not_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "la pioggia cade sulla citta vecchia ogni sera"),
             (2, "42 17"), (3, ""), (4, "ab")],
            ["doc_id", "text"],
        )
        out = L.lang_id_ngram(df).collect()
        assert len(out) == 4
        by_id = {r["doc_id"]: r for r in out}
        assert by_id[2]["pred_lang"] == "unknown"
        assert by_id[3]["pred_lang"] == "unknown"
        assert by_id[4]["pred_lang"] == "unknown"
        assert by_id[1]["pred_lang"] == "it"
        for i in (2, 3, 4):
            assert all(by_id[i][f"dist_{lang}"] == 0 for lang in L.LANGS)

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "text_lang_id_ngram", SF_DIR) > 0
