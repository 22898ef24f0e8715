"""Semantic pins for the round-6 llm_ops9 waves (the auto-parametrized
oracle test in test_oracle_queries.py covers hash parity; these pin the
invariants a hash match alone would not prove)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


def test_stickiness_bounded_by_definition(spark):
    """DAU users on day d are inside d's trailing 28-day window, so
    dau <= mau and the permille can never exceed 1000."""
    rows = _run(spark, "events_dau_mau_stickiness").collect()
    assert rows
    for r in rows:
        assert 0 < r.dau <= r.mau
        assert 0 < r.stickiness_permille <= 1000


def test_cumulative_new_users_reconciles(spark):
    rows = _run(spark, "events_cumulative_new_users").orderBy("day").collect()
    assert rows
    # running sum reconstructs exactly, and the final value is the
    # distinct-user count of the underlying table
    acc = 0
    for r in rows:
        acc += r.new_users
        assert r.cum_users == acc
    from sea_streamer_spark.sources.tables import load_tables

    n_users = (
        load_tables(spark, SF, "events").events.select("user_id").distinct().count()
    )
    assert rows[-1].cum_users == n_users


def test_ship_latency_partitions_lineitem(spark):
    from sea_streamer_spark.sources.tables import load_tables

    rows = _run(spark, "orders_ship_latency_histogram").collect()
    n_lineitem = load_tables(spark, SF, "lineitem").lineitem.count()
    assert sum(r.n_items for r in rows) == n_lineitem
    assert sum(r.share_permille for r in rows) <= 1000  # floor rounding
    for r in rows:
        assert r.min_days <= r.max_days


def test_spend_quartiles_are_ordered_and_balanced(spark):
    rows = {r.quartile: r for r in _run(spark, "customer_spend_quartiles").collect()}
    assert set(rows) == {1, 2, 3, 4}
    sizes = [rows[q].n_customers for q in (1, 2, 3, 4)]
    assert max(sizes) - min(sizes) <= 1  # NTILE balance
    # quartile 1 holds the highest spenders; bands may touch at ties
    for q in (1, 2, 3):
        assert rows[q].min_cents >= rows[q + 1].max_cents


def test_kcore_matches_pure_python_peel(spark):
    """Replay the peel in plain python over the collected pair list —
    the full semantics check, independent of both engines' SQL."""
    from collections import Counter

    from sea_streamer_spark.operators.dedup import minhash_lsh_dedup
    from sea_streamer_spark.sources.tables import load_tables

    docs = load_tables(spark, SF, "documents").documents
    pairs = [
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_dedup(docs, threshold=0.5).select("doc_a", "doc_b").collect()
    ]
    edges = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    for _ in range(4):
        deg = Counter(u for u, _ in edges)
        keep = {u for u, d in deg.items() if d >= 2}
        edges = [(u, v) for u, v in edges if u in keep and v in keep]
    expect = dict(Counter(u for u, _ in edges))
    got = {r.doc_id: r.degree for r in _run(spark, "graph_kcore_peel").collect()}
    assert got == expect


def test_weighted_sample_keep_rates_track_thresholds(spark):
    rows = {r.band: r for r in _run(spark, "curation_quality_weighted_sample").collect()}
    assert set(rows) == {"long", "medium", "short"}
    for band, lo, hi in (("long", 0.65, 0.95), ("medium", 0.35, 0.65), ("short", 0.05, 0.35)):
        r = rows[band]
        assert 0 < r.n_kept <= r.n_total
        frac = r.n_kept / r.n_total
        assert lo < frac < hi, (band, frac)


def test_span_queries_registered_with_oracles():
    for name in (
        "dedup_exact_substring_spans",
        "dedup_span_removal_exact",
        "events_dau_mau_stickiness",
        "events_cumulative_new_users",
        "orders_ship_latency_histogram",
        "customer_spend_quartiles",
        "graph_kcore_peel",
        "curation_quality_weighted_sample",
    ):
        assert name in QUERIES and QUERIES[name].oracle is not None
