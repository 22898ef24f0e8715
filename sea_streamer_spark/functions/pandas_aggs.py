"""Arrow-vectorized pandas UDFs — the remaining rows of the §2.7
extension-surface matrix (mapInPandas, applyInPandasWithState, foreachBatch
and registered DataSources are exercised elsewhere; this module covers the
``pandas_udf`` SCALAR and GROUPED_AGG shapes).

Both are deliberately things the built-in functions can't express directly
— NOT replacements for JVM expressions (the repo rule stays: built-ins
first, Arrow-batched python only where built-ins genuinely can't):

- ``exact_median_agg``: a true GROUPED_AGG over the whole group's values
  (pandas' interpolating median — Spark's ``percentile`` is the SQL analog
  but a *UDAF in python* is the extension point being demonstrated);
- ``mad_scalar``: a SCALAR vectorized transform using pandas semantics
  (per-batch abs-deviation from a broadcast center).

Scale note: GROUPED_AGG buffers each group's column in memory on the
executor — same posture as the exact-percentile built-in; the documented
at-scale swap is the bottom-k sample sketch (operators/sketch.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def exact_median_agg(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: pandas' linear-interpolation median of the
    group (equals SQL ``percentile(col, 0.5)``, which interpolates too)."""
    return float(v.median())


def mad_from(center_lit: float):
    """SCALAR pandas_udf factory: per-row absolute deviation from a fixed
    center — Arrow-batched, one python call per batch (never per row)."""

    @pandas_udf("double")
    def mad_scalar(v: pd.Series) -> pd.Series:
        return (v - center_lit).abs()

    return mad_scalar


def group_median_mad(df, group_col: str, value_col: str):
    """Per-group median (GROUPED_AGG UDF) + mean absolute deviation from
    the GLOBAL median (SCALAR UDF feeding a built-in avg) — the two
    pandas_udf shapes composed in one plan."""
    global_median = df.selectExpr(
        f"percentile({value_col}, 0.5) AS m"
    ).first()["m"]
    mad = mad_from(float(global_median))
    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT) — two group-keyed aggs
    # sharing the same partitioning, joined back
    med = df.groupBy(group_col).agg(
        exact_median_agg(F.col(value_col).cast("double")).alias("median")
    )
    dev = df.groupBy(group_col).agg(
        F.avg(mad(F.col(value_col).cast("double"))).alias("mad_from_global")
    )
    return med.join(dev, group_col)
