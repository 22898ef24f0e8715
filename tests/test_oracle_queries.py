"""Every oracle-backed query in the registry must match DuckDB at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01 — see
tests/test_oracle_sf001.py marker below); sf0.001 keeps the suite fast.
"""

import pytest

from sea_streamer_spark.plans.queries import QUERIES

from .oracle import check_query

ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_query(spark, sf_dir, name):
    rows = check_query(spark, name, sf_dir)
    assert rows >= 0
