"""Pins for the snapshot canonicalizer's r11 additions (r10 VERDICT task
#7): AQE build-side coin flips and codegen-span jitter must not churn
snapshots of unchanged plans."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"),
)

from dump_plans import canonicalize_plan, normalize_build_sides  # noqa: E402

# Minimal synthetic pair reproducing the observed flip class (the r10
# e65b911 semantic-twin commit): same Inner join, AQE built LEFT in one
# run (wrapper + token on the left child) and RIGHT in the other.
_BUILT_RIGHT = """\
*(1) Project [a#1L]
+- *(1) BroadcastHashJoin [k#2L], [k#3L], Inner, BuildRight, false
   :- AQEShuffleRead local
   :  +- ShuffleQueryStage 1
   :     +- Exchange hashpartitioning(k#2L, 8), ENSURE_REQUIREMENTS, [plan_id=1]
   :        +- *(2) Scan A [k#2L, a#1L]
   +- BroadcastQueryStage 2
      +- BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint, true]),false), [plan_id=2]
         +- AQEShuffleRead local
            +- ShuffleQueryStage 3
               +- Exchange hashpartitioning(k#3L, 8), ENSURE_REQUIREMENTS, [plan_id=3]
                  +- *(3) Scan B [k#3L]"""

_BUILT_LEFT = """\
*(4) Project [a#7L]
+- *(4) BroadcastHashJoin [k#8L], [k#9L], Inner, BuildLeft, false
   :- BroadcastQueryStage 5
   :  +- BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint, true]),false), [plan_id=7]
   :     +- AQEShuffleRead local
   :        +- ShuffleQueryStage 6
   :           +- Exchange hashpartitioning(k#8L, 8), ENSURE_REQUIREMENTS, [plan_id=8]
   :              +- *(5) Scan A [k#8L, a#7L]
   +- AQEShuffleRead local
      +- ShuffleQueryStage 7
         +- Exchange hashpartitioning(k#9L, 8), ENSURE_REQUIREMENTS, [plan_id=9]
            +- *(6) Scan B [k#9L]"""


def _canon(plan: str) -> str:
    return canonicalize_plan(normalize_build_sides(plan))


def test_build_side_flip_serializes_identically():
    """The two run variants of the same plan — built left vs built
    right — must canonicalize to the SAME bytes (wrapper relocated to
    the right child, token rewritten, ids renumbered)."""
    assert _canon(_BUILT_RIGHT) == _canon(_BUILT_LEFT)
    assert "BuildLeft" not in _canon(_BUILT_LEFT)


def test_built_right_is_already_canonical():
    """A plan that already builds right is untouched by the relocation
    (only id renumbering applies)."""
    out = normalize_build_sides(_BUILT_RIGHT)
    assert out == _BUILT_RIGHT


def test_outer_join_build_side_is_left_alone():
    """Non-Inner joins pin their build side semantically — never
    rewritten."""
    plan = _BUILT_LEFT.replace("Inner, BuildLeft", "LeftOuter, BuildLeft")
    assert normalize_build_sides(plan) == plan


def test_codegen_span_ids_are_stripped():
    """Span membership jitters with AQE stage reuse, so *(N) ids are
    flattened to a bare * (the codegen marker survives)."""
    out = canonicalize_plan("*(7) HashAggregate\n+- *(9) Project [x#12L]")
    assert out == "* HashAggregate\n+- * Project [x#1L]"


def test_unsafe_shapes_are_skipped_not_guessed():
    """A BuildLeft whose left child is NOT the flippable
    BroadcastQueryStage/BroadcastExchange wrapper (e.g. a ReusedExchange
    leaf) must pass through untouched."""
    plan = """\
*(1) BroadcastHashJoin [k#1L], [k#2L], Inner, BuildLeft, false
:- BroadcastQueryStage 1
:  +- ReusedExchange [k#1L], BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint, true]),false), [plan_id=4]
+- *(2) Scan B [k#2L]"""
    assert normalize_build_sides(plan) == plan


def test_variant_roundtrip_matches_either_form():
    """r11 VERDICT task #3: a chronic AQE racer commits BOTH reproduced
    byte-forms, separated by VARIANT_SEP; read_variants recovers each
    exactly, so regen matches either form with zero churn."""
    import tempfile

    from dump_plans import VARIANT_SEP, read_variants

    v1 = "* HashAggregate\n+- * Project [x#1L]"
    v2 = "* HashAggregate\n+- ReusedExchange [x#1L]"
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write(v1 + VARIANT_SEP + v2 + "\n\nScan evidence:\n\n- Read...\n")
        path = fh.name
    assert read_variants(path) == [v1, v2]
    os.unlink(path)


def test_truncation_shift_normalizes_identically():
    """r11 VERDICT task #3, root cause: Spark truncates long plan fields
    at a fixed RAW width, volatile ids have variable widths, so an
    identical plan can ellipsis-cut one character earlier or later
    run-to-run (the embedding_anisotropy_audit racer: its two committed
    byte-forms differed ONLY at a DataFilters `...` tail). The r12
    truncation chop makes both cuts serialize identically — and is
    idempotent, so committed snapshots re-canonicalize to themselves."""
    a = "FileScan parquet [e#23] DataFilters: [(cast(x as double) *..., Format: Parquet"
    b = "FileScan parquet [e#23] DataFilters: [(cast(x as double) ..., Format: Parquet"
    ca, cb = canonicalize_plan(a), canonicalize_plan(b)
    assert ca == cb
    assert canonicalize_plan(ca) == ca


def test_committed_anisotropy_snapshot_is_canonical():
    """The chronic racer's committed snapshot must be a fixed point of
    the current canonicalization rules — i.e. regen cannot churn it for
    rule reasons — and stays under the CHRONIC_RACERS variant guard for
    any future race class."""
    from dump_plans import CHRONIC_RACERS, read_variants

    assert "embedding_anisotropy_audit" in CHRONIC_RACERS
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(
        repo, "plans_snapshot", "embedding_anisotropy_audit.txt"
    )
    variants = read_variants(path)
    assert len({canonicalize_plan(v).rstrip("\n") for v in variants}) == 1
