"""Dataset snapshot diff — the versioning primitive of a training-data
pipeline (beyond-reference LLM-curation layer; the reference's nearest
concept is stream replay between two offsets).

A corpus is rebuilt or re-curated; downstream consumers (tokenizer runs,
dedup ledgers, eval splits) need to know exactly WHAT changed, not re-read
100 TB. ``snapshot_diff`` computes the added/removed/changed row sets with:

- ONE key-keyed shuffle (a full-outer equi-join on the snapshot key) —
  co-partitioned if both snapshots are written bucketed by key
  (``operators/scale.write_bucketed``), in which case the diff plans with
  zero Exchange;
- a map-side md5 row digest over the compared columns (null-sentinel
  separated), so wide rows compare as one string each and the change test
  never widens the shuffle;
- output that scales with the CHANGE volume, never the snapshot size
  (unchanged rows are filtered before any collection).

``apply_diff(old, diff, new_rows)`` folds a diff back onto the old
snapshot (remove removed/changed, add added/changed from the new side) —
the round-trip ``apply_diff(old, snapshot_diff(old,new)) == new`` is the
operator's defining invariant and is pinned in tests.

Digest caveat (documented contract): columns are rendered to strings for
hashing; use it on string/integer/date columns. Floats format differently
across engines — cast or micro-round them first (the repo-wide fixed-point
convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Unit separator / null sentinel for the row digest — outside the data
#: alphabet of the driver tables.
_SEP = "\x1f"
_NULL = "\x01"


def row_digest(cols: list[str]) -> Column:
    """md5 over the null-sentinel-separated string rendering of ``cols``.
    DuckDB equivalent: ``md5(concat_ws(chr(31), COALESCE(CAST(c AS
    VARCHAR), chr(1)), ...))``."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots keyed by ``key_cols``:
    one row per non-identical key with ``change`` ∈ added | removed |
    changed. ``compare_cols`` defaults to all non-key columns shared by
    both sides (order-insensitively)."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = sorted(c for c in shared if c not in set(key_cols))
    o = old.select(*key_cols, row_digest(compare_cols).alias("_dig_old"))
    n = new.select(*key_cols, row_digest(compare_cols).alias("_dig_new"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_dig_old").isNull(), F.lit("added"))
        .when(F.col("_dig_new").isNull(), F.lit("removed"))
        .when(F.col("_dig_old") != F.col("_dig_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def apply_diff(
    old: DataFrame, diff: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Reconstruct the new snapshot: drop removed/changed keys from
    ``old``, take added/changed rows from ``new``. Column set = old's.
    The inverse of :func:`snapshot_diff` (round-trip pinned in tests)."""
    dropped = diff.filter(F.col("change").isin("removed", "changed")).select(*key_cols)
    taken = diff.filter(F.col("change").isin("added", "changed")).select(*key_cols)
    kept = old.join(dropped, key_cols, "left_anti")
    incoming = new.select(*old.columns).join(taken, key_cols, "left_semi")
    return kept.unionByName(incoming)
