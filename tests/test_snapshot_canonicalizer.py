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
