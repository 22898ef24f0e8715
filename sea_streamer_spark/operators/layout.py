"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning —
the lakehouse-grade write-path optimization (Delta/Iceberg OPTIMIZE ZORDER
analog, public technique: bit-interleaved space-filling curves).

Why it matters at 100 TB: parquet pruning is one-dimensional — sorting by
``ts`` makes time filters cheap but scatters ``user_id`` across every file,
so a (user AND time-range) query scans everything. Interleaving the bits of
both dimensions' bucket indices produces a single sort key under which rows
close in EITHER dimension land in few files: both predicates prune at the
row-group level simultaneously.

Plan shape:

- **Boundaries** (the per-dimension quantile cut points) are the only
  model state: ``2^bits - 1`` values per column, computed once —
  ``approxQuantile`` at scale (bounded sketch, never a global sort), or
  exact quantiles from a gate corpus for the oracle-checked registered
  query (both are driver-side literal arrays afterwards).
- **Bucketing + interleave** are pure map-side projections (a fold over
  the literal boundary array, then a fold over bit positions — all inside
  whole-stage codegen). NO global window: the classic ntile z-order
  implementation funnels the corpus through one partition, which is
  exactly the 100 TB cliff this module avoids.
- **Write** = ``repartitionByRange(zval)`` (one range shuffle — sampled
  boundaries, no global sort) + ``sortWithinPartitions(zval)`` so parquet
  row-group min/max stats become tight boxes on the curve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quantile_boundaries",
    "bucket_expr",
    "zvalue_expr",
    "zorder_by",
]

DEFAULT_BITS = 8


def quantile_boundaries(
    df: DataFrame, col: str, bits: int = DEFAULT_BITS, rel_err: float = 0.001
) -> list[float]:
    """``2^bits - 1`` approximate quantile cut points for one dimension —
    the bounded-sketch scale path (Greenwald-Khanna via approxQuantile;
    never a sort, never a collect beyond the cut-point array)."""
    n = (1 << bits) - 1
    qs = [i / (n + 1) for i in range(1, n + 1)]
    return df.approxQuantile(col, qs, rel_err)


def bucket_expr(col: Column | str, boundaries: list) -> Column:
    """Map-side bucket index in ``[0, len(boundaries)]``: the count of cut
    points ≤ x, as a fold over the literal boundary array (whole-stage
    codegen; no join, no window)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.lit(boundaries),
        F.lit(0),
        lambda acc, b: acc + F.when(c >= b, 1).otherwise(0),
    )


def zvalue_expr(*buckets: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of k bucket indices: bit i of dimension d lands at
    position ``i*k + d`` (round-robin from the low bits, so every dimension
    contributes to every significance level). Pure integer arithmetic; with
    k dims × ``bits`` bits the z-value needs k·bits ≤ 63 bits."""
    k = len(buckets)
    if k < 2:
        raise ValueError("zvalue_expr interleaves at least 2 dimensions")
    if k * bits > 63:
        raise ValueError(f"{k} dims x {bits} bits overflows a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), i * k + d
            )
    return z


def zorder_by(
    df: DataFrame,
    dims: list[tuple[str, list]],
    bits: int = DEFAULT_BITS,
    n_files: int | None = None,
    zval_col: str = "zval",
) -> DataFrame:
    """Attach the z-value and lay the frame out for writing: range-partition
    on the curve (sampled boundaries — one shuffle, no global sort) and
    sort within partitions so every parquet row group covers a tight curve
    segment. ``dims`` = [(column, boundaries), ...] for 2+ dimensions.

    The bucket folds are projected into named columns BEFORE the
    interleave: zvalue_expr references each bucket ``bits`` times, and
    Catalyst does not CSE lambda-bearing expressions (the simhash lesson,
    operators/dedup.py) — inlining the 255-literal fold would replicate it
    8x per dimension per row on the write path. CollapseProject keeps the
    two projections separate because the bucket outputs are non-cheap and
    multiply referenced."""
    bcols = [f"__zb{i}" for i in range(len(dims))]
    staged = df.select(
        "*", *[bucket_expr(c, b).alias(a) for (c, b), a in zip(dims, bcols)]
    )
    out = staged.withColumn(
        zval_col, zvalue_expr(*[F.col(a) for a in bcols], bits=bits)
    ).drop(*bcols)
    parts = n_files if n_files is not None else df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(parts, F.col(zval_col)).sortWithinPartitions(zval_col)
