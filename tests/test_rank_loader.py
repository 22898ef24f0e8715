"""Pins for the CORRECTNESS-union re-rank loader (round-9, VERDICT r8 #5).

Rounds 4-8 maintained the driver-sampling order as hand-kept
``_R0x_DRIVER_VERIFIED`` tuples; the arithmetic drifted twice (r6's "~34"
miscount, a stale r5 docstring count). Round 9 replaced the tuples with
``plans.queries._load_driver_evidence`` over the ``CORRECTNESS_r*.json``
artifacts. These tests pin (a) the loader's strict-green / latest-wins
semantics on synthetic artifacts, (b) that on the real repo it reproduces
the frozen r1-r7 hand ordering exactly (verified tuple-vs-loader equal at
the moment of replacement and hashed here), and (c) the live-registry
ordering invariants.
"""

from __future__ import annotations

import hashlib
import json

import pytest

from sea_streamer_spark.plans import queries as q

# sha256 of "|".join(r1-r7-evidenced queries in hand-tuple order), computed
# while the hand tuples still existed and the loader was proven
# element-for-element identical to them (round-9 session, 2026-08-15).
_R17_ORDER_SHA256 = (
    "4a85e977b91aad70cf92f406efce6d4c0e6f58e87590c40fd5f7120b629b7064"
)
_R17_COUNT = 243


def _write(path, payload):
    path.write_text(json.dumps(payload))


def test_latest_green_evidence_wins(tmp_path):
    green = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "spark_rows": 1,
        "oracle_rows": 1,
        "err": None,
    }
    _write(tmp_path / "CORRECTNESS_r01.json", {"a": green, "b": green})
    _write(tmp_path / "CORRECTNESS_r02.json", {"b": green, "c": green})
    ev = q._load_driver_evidence(tmp_path)
    assert ev == {"a": (1, 0), "b": (2, 0), "c": (2, 1)}


def test_red_and_err_rows_are_not_evidence(tmp_path):
    green = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
    }
    red = dict(green, hash_match=False)
    err = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "err": "no_oracle",
    }
    _write(tmp_path / "CORRECTNESS_r01.json", {"a": green, "b": green})
    _write(
        tmp_path / "CORRECTNESS_r02.json", {"a": red, "b": err, "c": red}
    )
    ev = q._load_driver_evidence(tmp_path)
    # a/b keep their r1 rank (re-sample before any r2-green row would);
    # c has no green evidence at all.
    assert ev == {"a": (1, 0), "b": (1, 1)}


def test_malformed_artifacts_are_skipped(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("not json")
    _write(tmp_path / "CORRECTNESS_r02.json", ["not", "a", "dict"])
    _write(tmp_path / "CORRECTNESS_rXX.json", {"a": {"err": None}})
    assert q._load_driver_evidence(tmp_path) == {}
    assert q._load_driver_evidence(tmp_path / "missing") == {}


def test_real_repo_reproduces_the_hand_tuple_ordering():
    """The frozen r1-r7 ordering (hand tuples, now deleted) is reproduced.

    Restricted to queries whose latest evidence is <= round 7, so the pin
    is stable under both future registrations (rank -1) and future driver
    rounds (which only move queries OUT of the <=7 set, never reorder
    within it — if this ever fires after a CORRECTNESS_r0x lands, the
    artifact re-verified a query out of the set and the expected count
    shrinks; recompute both constants then).
    """
    ev = {k: v for k, v in q._EVIDENCE.items() if v[0] <= 7}
    if len(ev) != _R17_COUNT:
        pytest.skip(
            "a later driver round re-verified r1-r7 rows; "
            "historical pin no longer applicable as-is"
        )
    names = sorted((n for n in q.QUERIES if n in ev), key=ev.__getitem__)
    digest = hashlib.sha256("|".join(names).encode()).hexdigest()
    assert digest == _R17_ORDER_SHA256


def test_registry_ordering_matches_evidence_rank():
    names = list(q.QUERIES)
    ranks = [q._EVIDENCE.get(n, (-1, 0)) for n in names]
    assert ranks == sorted(ranks), "QUERIES not sorted by evidence rank"
    # Never-sampled registrations all precede any evidenced query.
    first_evidenced = next(
        (i for i, r in enumerate(ranks) if r != (-1, 0)), len(names)
    )
    assert all(r == (-1, 0) for r in ranks[:first_evidenced])
    assert all(r != (-1, 0) for r in ranks[first_evidenced:])


def test_every_green_artifact_row_names_a_registered_query():
    """Artifact/registry drift guard: every strict-green row the driver
    ever recorded still corresponds to a registered query (renames or
    deletions would silently orphan evidence)."""
    missing = set(q._EVIDENCE) - set(q.QUERIES)
    assert not missing, f"evidence for unregistered queries: {missing}"
