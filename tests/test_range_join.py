"""Range join vs a brute-force pandas reference, plus its plan contract
(equi-join on the time bucket — never a nested-loop)."""

import numpy as np
import pandas as pd
import pytest

from sea_streamer_spark.operators.range_join import range_join


def _frames(seed=11, n_left=300, n_right=400, n_keys=9):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**5, n_left), unit="s"),
            "lid": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**5, n_right), unit="s"),
            "rid": np.arange(n_right),
        }
    )
    return left, right


def _expected_pairs(left, right, lo_s, hi_s, by=True):
    m = left.merge(right, how="cross", suffixes=("", "_right"))
    if by:
        m = m[m.k == m.k_right]
    lo = pd.Timedelta(seconds=lo_s)
    hi = pd.Timedelta(seconds=hi_s)
    m = m[(m.ts_right >= m.ts - lo) & (m.ts_right <= m.ts + hi)]
    return set(zip(m.lid, m.rid))


@pytest.mark.parametrize(
    "lo_s,hi_s",
    [(3600, 3600), (3600, 0), (0, 7200), (1, 1)],
    ids=["symmetric", "backward", "forward", "tiny"],
)
def test_matches_bruteforce(spark, lo_s, hi_s):
    left, right = _frames()
    exp = _expected_pairs(left, right, lo_s, hi_s)
    out = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="ts",
        lower_seconds=lo_s, upper_seconds=hi_s, by="k",
    ).toPandas()
    got = set(zip(out.lid, out.rid_right))
    assert got == exp
    # exactly-once: no duplicate pairs from the bucket fan-out
    assert len(out) == len(got)


def test_no_key_global_window(spark):
    left, right = _frames(n_left=60, n_right=80, n_keys=1)
    exp = _expected_pairs(left, right, 100, 100, by=False)
    out = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="ts",
        lower_seconds=100, upper_seconds=100,
    ).toPandas()
    assert set(zip(out.lid, out.rid_right)) == exp


def test_boundary_inclusive(spark):
    left = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01 01:00:00"]), "lid": [0]})
    right = pd.DataFrame(
        {
            "k": [1, 1, 1, 1],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",  # exactly ts - lower: in
                    "2024-01-01 02:00:00",  # exactly ts + upper: in
                    "2023-12-31 23:59:59",  # just below: out
                    "2024-01-01 02:00:01",  # just above: out
                ]
            ),
            "rid": [0, 1, 2, 3],
        }
    )
    out = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="ts",
        lower_seconds=3600, upper_seconds=3600, by="k",
    ).toPandas()
    assert sorted(out.rid_right) == [0, 1]


def test_plan_is_equi_join(spark):
    """The scale contract: bucketing restores an equi-key, so the plan is a
    hash/sort-merge join — never BroadcastNestedLoop or Cartesian."""
    left, right = _frames(n_left=50, n_right=50)
    df = range_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="ts",
        lower_seconds=3600, upper_seconds=3600, by="k",
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
