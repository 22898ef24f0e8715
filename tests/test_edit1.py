"""Deletion-neighborhood edit-distance-1 join (operators/text.edit1_pairs)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row

from sea_streamer_spark.operators.text import edit1_pairs

SF_DIR = "/root/testdata/sf0.001"


def lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def spark():
    from sea_streamer_spark.session import get_spark

    return get_spark(app_name="test-edit1")


class TestEdit1Pairs:
    VOCAB = [
        "table", "tables", "tble", "cable", "fable",  # dels/subs of table-ish
        "merge", "marge", "mergee",
        "hash", "hush", "has",
        "window", "widow",
        "stream", "streams", "stream1",
        "qqqq", "zzzz",  # isolated
    ]

    def test_matches_brute_force(self, spark):
        df = spark.createDataFrame([Row(token=t) for t in self.VOCAB])
        got = {
            (r["token_a"], r["token_b"]) for r in edit1_pairs(df, "token").collect()
        }
        want = {
            tuple(sorted((a, b)))
            for a, b in itertools.combinations(set(self.VOCAB), 2)
            if lev(a, b) == 1
        }
        assert got == want
        assert len(want) >= 8  # the fixture genuinely exercises all 3 edit kinds

    def test_covers_insert_delete_substitute(self, spark):
        df = spark.createDataFrame(
            [Row(token=t) for t in ["abcd", "abxd", "abd", "abcde"]]
        )
        got = {
            (r["token_a"], r["token_b"]) for r in edit1_pairs(df, "token").collect()
        }
        assert ("abcd", "abxd") in got  # substitute
        assert ("abcd", "abd") not in got or lev("abcd", "abd") == 1
        assert ("abcd", "abcde") in got  # insert
        assert ("abd", "abcd") in got or ("abcd", "abd") in got  # delete

    def test_no_identity_or_distance2(self, spark):
        df = spark.createDataFrame(
            [Row(token=t) for t in ["abcd", "abcd", "axyd", "wxyz"]]
        )
        got = edit1_pairs(df, "token").collect()
        for r in got:
            assert r["token_a"] != r["token_b"]
            assert lev(r["token_a"], r["token_b"]) == 1

    def test_registered_query_oracle(self, spark):
        from tests.oracle import check_query

        assert check_query(spark, "text_typo_pairs", SF_DIR) > 0
