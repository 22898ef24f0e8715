"""Count-Min sketch: bounded-memory frequency estimation over unbounded key
domains — the frequency-side companion to :mod:`.bloom`'s membership gate.

Where exact per-key counts need a shuffle keyed by every distinct key (fine
once, expensive to keep live), a CMS is a d×w grid of counters that answers
"how often did key x occur?" with one-sided error: ``est >= true`` always,
``est <= true + ε·N`` with probability 1-δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉ (Cormode
& Muthukrishnan 2005). Like the Bloom build, the grid aggregate is bounded
by GEOMETRY, not data: map-side combine caps the shuffle at d·w rows per
task and the driver holds d·w longs, so the sketch can track a firehose's
token frequencies forever (counters add ⇒ :func:`cms_merge` of per-batch
deltas IS a rebuild).

Hashing is the repo's portable polynomial fold (operators/text.char_fold_hash
— base 31 mod 1e9+7) through d pairwise-independent ``(a·h+b) mod P mod w``
rows, NOT xxhash64: the fold is replayable in DuckDB SQL, so a query built
on this sketch is value-hash ORACLE-CHECKABLE — the oracle rebuilds the
entire grid and its estimates in SQL (see plans/llm_ops4.sketch_heavy_hitters).

No reference analog (sea-streamer has no aggregation layer); part of the
beyond-reference LLM-pipeline block.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import MOD, char_fold_hash

#: (a, b) rows for the pairwise-independent family h_j = (a*h + b) % MOD % w
#: — same spread-constant recipe as the MinHash permutations (dedup.py):
#: large multiplicative constants, never small sequential ones.
CMS_DEPTH = 4
CMS_AB = [
    ((0x9E3779B1 * (2 * j + 3)) % MOD, (0x85EBCA77 * (j + 7) + 0x165667B1) % MOD)
    for j in range(CMS_DEPTH)
]


@dataclass(frozen=True)
class CmsModel:
    """d rows × w buckets of counters; ``grid[j][k]`` is row j, bucket k."""

    width: int
    grid: tuple[tuple[int, ...], ...]  # CMS_DEPTH rows of length width

    @property
    def total(self) -> int:
        """N — the stream length the error bound ε·N refers to."""
        return sum(self.grid[0])

    def estimate(self, key: str) -> int:
        h = 0
        for ch in key:
            h = (h * 31 + ord(ch)) % MOD
        return min(
            self.grid[j][((a * h + b) % MOD) % self.width]
            for j, (a, b) in enumerate(CMS_AB)
        )


def _bucket_cols(key: Column, width: int) -> list[Column]:
    h = char_fold_hash(key)
    return [
        ((F.lit(a) * h + F.lit(b)) % MOD % width).cast("long")
        for (a, b) in CMS_AB
    ]


def cms_build(
    df: DataFrame, key_col: str, width: int = 1024, weight_col: str | None = None
) -> CmsModel:
    """One pass → the counter grid. Each row contributes ``weight`` (default
    1) to d buckets; the (row, bucket)-keyed aggregate map-side-combines, so
    the shuffle and the driver collect are both ≤ d·w counters."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    buckets = _bucket_cols(F.col(key_col), width)
    rows = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), b.alias("k"), w.alias("n"))
                        for j, b in enumerate(buckets)
                    ]
                )
            ).alias("e")
        )
        .groupBy("e.j", "e.k")
        .agg(F.sum("e.n").alias("c"))
        .collect()
    )
    grid = [[0] * width for _ in range(CMS_DEPTH)]
    for r in rows:
        grid[int(r.j)][int(r.k)] = int(r.c)
    return CmsModel(width=width, grid=tuple(tuple(g) for g in grid))


def cms_estimate_expr(model: CmsModel, key: Column) -> Column:
    """Map-side JVM estimate: min over d packed-row literal lookups — the
    same zero-join probe shape as bloom_might_contain."""
    buckets = _bucket_cols(key, model.width)
    looks = [
        F.element_at(F.lit(list(model.grid[j])), (b + 1).cast("int"))
        for j, b in enumerate(buckets)
    ]
    return F.least(*looks).cast("long")


def cms_merge(a: CmsModel, b: CmsModel) -> CmsModel:
    """Counter-wise sum — merging per-batch deltas equals one big build,
    which is what makes the sketch a streaming accumulator (persist the
    grid like bloom.save_model and add each micro-batch's delta)."""
    if a.width != b.width:
        raise ValueError("sketch widths differ")
    return CmsModel(
        width=a.width,
        grid=tuple(
            tuple(x + y for x, y in zip(ra, rb)) for ra, rb in zip(a.grid, b.grid)
        ),
    )


def save_cms(model: CmsModel, path: str, applied: list[int] | None = None) -> None:
    """Atomic persistence (functions/statefile.py owns the tmp+rename
    contract) — the grid is d·w longs, a few tens of KB at the default
    geometry. ``applied`` optionally records the micro-batch ids already
    merged into the grid IN THE SAME atomic file: counter addition is not
    idempotent (unlike the Bloom's bit-OR), so a crash-replaying sink must
    check membership before re-merging a batch's delta — the applied set
    and the grid move together or not at all."""
    from ..functions.statefile import save_json

    obj = {"width": model.width, "grid": [list(g) for g in model.grid]}
    if applied is not None:
        obj["applied"] = sorted(set(applied))
    save_json(path, obj)


def load_cms(path: str) -> CmsModel | None:
    from ..functions.statefile import load_json

    d = load_json(path)
    if d is None:
        return None
    return CmsModel(width=d["width"], grid=tuple(tuple(g) for g in d["grid"]))


def load_cms_applied(path: str) -> set[int]:
    """The batch ids already merged into the persisted grid (empty when the
    file is absent or was saved without an applied set)."""
    from ..functions.statefile import load_json

    d = load_json(path)
    return set(d.get("applied", [])) if d else set()
