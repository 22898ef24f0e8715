"""As-of join vs pandas ``merge_asof`` (an independent reference
implementation) across inclusive / strict / tolerance variants."""

import numpy as np
import pandas as pd
import pytest

from sea_streamer_spark.operators.asof import asof_join


def _frames(seed=7, n_left=400, n_right=300, n_keys=13):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, n_left), unit="s"),
            "lv": rng.normal(size=n_left).round(3),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, n_right), unit="s"),
            "rv": rng.normal(size=n_right).round(3),
        }
    )
    # merge_asof resolves equal-time duplicates by taking the LAST right row;
    # our window tie order within one side is plan-dependent, so keep right
    # (k, ts) unique — the variant under test is the time comparison itself.
    right = right.drop_duplicates(["k", "ts"])
    return left, right


def _expected(left, right, strict=False, tolerance=None, direction="backward"):
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable").rename(columns={"ts": "ts_right", "rv": "rv_right"}),
        left_on="ts",
        right_on="ts_right",
        by="k",
        allow_exact_matches=not strict,
        tolerance=tolerance,
        direction=direction,
    )
    return exp.sort_values(["k", "ts", "lv"], ignore_index=True)


def _actual(spark, left, right, **kw):
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    out = asof_join(sl, sr, on="ts", by="k", **kw).toPandas()
    return out.sort_values(["k", "ts", "lv"], ignore_index=True)


@pytest.mark.parametrize(
    "kw,pd_kw",
    [
        ({}, {}),
        ({"strict": True}, {"strict": True}),
        (
            {"tolerance_expr": "INTERVAL 1 DAY"},
            {"tolerance": pd.Timedelta(days=1)},
        ),
        ({"direction": "forward"}, {"direction": "forward"}),
        ({"direction": "forward", "strict": True}, {"direction": "forward", "strict": True}),
        ({"direction": "nearest"}, {"direction": "nearest"}),
        (
            {"direction": "nearest", "tolerance_expr": "INTERVAL 6 HOURS"},
            {"direction": "nearest", "tolerance": pd.Timedelta(hours=6)},
        ),
    ],
    ids=[
        "inclusive",
        "strict",
        "tolerance",
        "forward",
        "forward-strict",
        "nearest",
        "nearest-tolerance",
    ],
)
@pytest.mark.parametrize("seed", [7, 23])
def test_matches_pandas_merge_asof(spark, kw, pd_kw, seed):
    left, right = _frames(seed=seed)
    exp = _expected(left, right, **pd_kw)
    got = _actual(spark, left, right, suffix="_right", **kw)
    assert len(got) == len(exp)
    for c_got, c_exp in [("ts_right", "ts_right"), ("rv_right", "rv_right")]:
        g, e = got[c_got], exp[c_exp]
        both_na = g.isna() & e.isna()
        assert (both_na | (g == e)).all(), (
            pd.concat([got[~(both_na | (g == e))], exp[~(both_na | (g == e))]], axis=1)
        )


def test_unmatched_left_rows_survive_with_nulls(spark):
    left = pd.DataFrame(
        {"k": [1, 1], "ts": pd.to_datetime(["2024-01-01", "2024-01-05"]), "lv": [1.0, 2.0]}
    )
    right = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-03"]), "rv": [9.0]})
    out = _actual(spark, left, right)
    assert len(out) == 2
    assert out.loc[0, "rv_right"] is None or pd.isna(out.loc[0, "rv_right"])
    assert out.loc[1, "rv_right"] == 9.0


def test_null_right_value_at_match_stays_null(spark):
    """A matched right row whose value column is NULL must yield NULL — not
    fall back to an older non-null value (rows must not mix)."""
    left = pd.DataFrame(
        {"k": [1], "ts": pd.to_datetime(["2024-01-10"]), "lv": [1.0]}
    )
    right = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-05"]),
            "rv": [7.0, None],
        }
    )
    out = _actual(spark, left, right)
    assert out.loc[0, "ts_right"] == pd.Timestamp("2024-01-05")
    assert pd.isna(out.loc[0, "rv_right"])


def test_single_shuffle_plan(spark):
    """The operator's scale contract: one hash-partition exchange (the
    window), nothing else."""
    left, right = _frames(n_left=50, n_right=50)
    df = asof_join(spark.createDataFrame(left), spark.createDataFrame(right), on="ts", by="k")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    shuffles = sum(
        1
        for line in plan.splitlines()
        if line.strip().lstrip("+-*: ").startswith("Exchange")
    )
    assert shuffles == 1, plan


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_single_shuffle_every_direction(spark, direction):
    """All directions share the hash partitioning on the key: one Exchange
    (nearest adds a second in-partition sort, never a second shuffle)."""
    left, right = _frames(n_left=40, n_right=40)
    df = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="ts", by="k", direction=direction,
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    shuffles = sum(
        1 for line in plan.splitlines()
        if line.strip().lstrip("+-*: ").startswith("Exchange")
    )
    assert shuffles == 1, plan
