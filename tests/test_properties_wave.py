"""Property-based tests (hypothesis) for the continuation-wave operators'
pure-python cores: the Cavnar-Trenkle classifier, the deletion-neighborhood
block-cover lemma, bottom-k merge semantics, and dHash locality."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sea_streamer_spark.operators import langid as L

WORDS = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=10)


class TestLangIdProperties:
    @given(st.data())
    @settings(max_examples=40, deadline=None)
    def test_seed_excerpts_classify_as_their_language(self, data):
        lang = data.draw(st.sampled_from(sorted(L.SEED_TEXT)))
        text = L.SEED_TEXT[lang]
        words = text.split()
        start = data.draw(st.integers(0, max(0, len(words) - 30)))
        n = data.draw(st.integers(20, 30))
        excerpt = " ".join(words[start : start + n])
        assert L.classify_py(excerpt) == lang, excerpt

    @given(st.text(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_normalize_idempotent(self, s):
        once = L.normalize_py(s)
        assert L.normalize_py(once) == once

    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz ", min_size=3, max_size=80))
    @settings(max_examples=100, deadline=None)
    def test_trigram_count(self, s):
        norm = L.normalize_py(s)
        assert len(L.trigrams_py(norm)) == max(0, len(norm) - 2)


def _del_keys(tok: str) -> set[str]:
    """Block keys: the token itself + every single-char deletion (the
    pure-python mirror of operators/text.edit1_pairs' key set)."""
    return {tok} | {tok[:i] + tok[i + 1 :] for i in range(len(tok))}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestDeletionBlockCover:
    @given(tok=WORDS, data=st.data())
    @settings(max_examples=200, deadline=None)
    def test_every_edit1_pair_shares_a_key(self, tok, data):
        """The lemma edit1_pairs relies on: ANY pair at edit distance 1
        shares at least one deletion-neighborhood key."""
        kind = data.draw(st.sampled_from(["ins", "del", "sub"]))
        pos = data.draw(st.integers(0, len(tok)))
        ch = data.draw(st.sampled_from("abcdefghijklmnopqrstuvwxyz"))
        if kind == "ins":
            other = tok[:pos] + ch + tok[pos:]
        elif kind == "del":
            if len(tok) < 2:
                return
            pos = min(pos, len(tok) - 1)
            other = tok[:pos] + tok[pos + 1 :]
        else:
            if not tok:
                return
            pos = min(pos, len(tok) - 1)
            other = tok[:pos] + ch + tok[pos + 1 :]
        if other == tok:
            return
        assert _lev(tok, other) == 1
        assert _del_keys(tok) & _del_keys(other), (tok, other)


class TestBottomKMergeProperty:
    @given(
        a=st.lists(st.tuples(st.integers(0, 1 << 30), st.integers(0, 1000)), max_size=60),
        b=st.lists(st.tuples(st.integers(0, 1 << 30), st.integers(0, 1000)), max_size=60),
        k=st.integers(1, 16),
    )
    @settings(max_examples=150, deadline=None)
    def test_merge_equals_rebuild(self, a, b, k):
        """bottom-k (by (h, v) total order, multiset semantics) of a union
        == re-ranked truncation of the per-part bottom-k's — the pure
        model of operators/sketch.bottomk_value_sample's contract."""

        def bottomk(rows):
            return sorted(rows)[:k]

        merged = sorted(bottomk(a) + bottomk(b))[:k]
        rebuilt = bottomk(a + b)
        assert merged == rebuilt


class TestDhashLocality:
    @given(data=st.data())
    @settings(max_examples=25, deadline=None)
    def test_single_pixel_change_flips_at_most_two_bits(self, data):
        """Each pixel participates in at most two adjacent-gradient
        comparisons in its row, so a one-pixel edit moves the hash by
        hamming <= 2 — the locality that makes dHash a NEAR-dup signal."""
        import numpy as np

        from sea_streamer_spark.operators.multimodal import DHASH_H, DHASH_W
        from sea_streamer_spark.operators.png import encode_png
        from tests.test_dhash import dhash_py

        w, h = DHASH_W + 1, DHASH_H
        rng_bytes = data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
        px = np.array(rng_bytes, dtype=np.uint8)
        base = dhash_py(encode_png(w, h, px.tobytes()))
        i = data.draw(st.integers(0, w * h * 3 - 1))
        delta = data.draw(st.integers(1, 255))
        px2 = px.copy()
        px2[i] = (int(px2[i]) + delta) % 256
        mod = dhash_py(encode_png(w, h, px2.tobytes()))
        assert bin(base ^ mod).count("1") <= 2
