"""Every oracle-backed query in the registry must match DuckDB at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01 — see
tests/test_oracle_sf001.py marker below); sf0.001 keeps the suite fast.
"""

import pytest

from sea_streamer_spark.plans.queries import QUERIES

from .oracle import check_query

ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)

#: Queries whose oracle embeds data-derived constants for the driver's gate
#: sf (import-time builders) — compare them at that sf, not the suite's.
_PINNED_SF = {
    "similarity_ann_ivf",
    "similarity_ann_pq",
    "similarity_ann_ivf_pq",
    "agg_approx_sketches",
    "dedup_semantic_ivf",
    "embedding_whiten_project",
}


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_query(spark, sf_dir, name):
    if name in _PINNED_SF:
        from sea_streamer_spark.plans.llm_ops import ORACLE_SF_DIR

        sf_dir = ORACLE_SF_DIR
    rows = check_query(spark, name, sf_dir)
    assert rows >= 0
