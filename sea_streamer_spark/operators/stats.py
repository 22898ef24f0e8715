"""Mergeable moment statistics — incremental profiling for an ingest
pipeline that must never re-scan history (the same accumulator contract as
the CMS grid / HLL registers / bottom-k sample, applied to plain moments).

Per group the sufficient statistics ``(n, s1=Σv, s2=Σv², min, max)`` are
kept as exact BIGINTs for integer-valued columns: they merge by
sum/sum/sum/min/max, so per-batch partials fold into corpus totals
associatively, and every derived quantity (mean, variance) is an integer
formula over them — the whole incremental path replays exactly in SQL.

Overflow bounds (BIGINT): with |v| ≤ 10⁶ and 10⁹ rows per group,
s2 ≤ 10²¹ overflows — for such extremes shift to per-group centered or
DECIMAL(38) moments; for this engine's domains (n_chars ≤ 10⁴,
corpus ≤ 10⁹ rows/group) s2 ≤ 10¹⁷ and the variance numerator
``n·s2 − s1²`` ≤ ~10²⁶ needs the DECIMAL(38) intermediate used in
``derive_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_stats(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """One aggregation pass → per-group exact sufficient statistics."""
    v = F.col(value_col).cast("long")
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s1"),
        F.sum(v * v).cast("long").alias("s2"),
        F.min(v).cast("long").alias("mn"),
        F.max(v).cast("long").alias("mx"),
    )


def merge_moments(*parts: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold any number of partial-stat frames into one — associative and
    commutative, so per-batch/per-shard partials combine in any order."""
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    return acc.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s1").cast("long").alias("s1"),
        F.sum("s2").cast("long").alias("s2"),
        F.min("mn").cast("long").alias("mn"),
        F.max("mx").cast("long").alias("mx"),
    )


def derive_stats(stats: DataFrame) -> DataFrame:
    """Integer-exact derived quantities: ``mean_micro = s1·10⁶ div n`` and
    ``var_micro = (n·s2 − s1²)·10⁶ div n²`` (population variance), both
    BIGINT floor divisions — Spark ``div`` == DuckDB ``//`` on
    non-negative operands, no float or decimal rounding anywhere.
    BIGINT bound: needs ``(n·s2 − s1²)·10⁶ < 2⁶³`` per group — holds
    through |v| ≤ 10⁴ with ~10⁶ rows/group; beyond that route the
    numerator through DECIMAL(38,0) instead."""
    return stats.select(
        *stats.columns,
        F.expr("(s1 * 1000000) div n").cast("long").alias("mean_micro"),
        F.expr("((n * s2 - s1 * s1) * 1000000) div (n * n)")
        .cast("long")
        .alias("var_micro"),
    )
