"""Headroom lint (r10 VERDICT task #8): keep the BIGINT pre-multiply
class closed as waves accumulate.

The class: ``_idiv_col(F.lit(K) * col, denom)`` runs ``K * col`` in
BIGINT *before* ``_idiv_col`` casts to DECIMAL(38,0), so once
``col > 2^63 / K`` the product silently wraps on Spark while the DuckDB
oracle errors loudly — the engines diverge exactly on the extreme inputs
a diagnostic exists to flag (the r9 ADVICE class, caught live by the
arrival-uniformity KS wave at sf0.1). The fix is ``_idiv_col(col, denom,
scale=K)``, which multiplies INSIDE decimal space (llm_ops12._idiv_col).

This lint is a RATCHET, not a ban: the pre-r11 sites below were audited
in the r10 judge pass as value-bounded (milli/micro-scaled aggregates,
rank arithmetic, K-bounded budgets — products provably far under 2^63 at
any corpus size because the scaled operand is itself a bounded
fixed-point ratio or a small count), and rewriting them would churn ~25
frozen plan snapshots for zero semantic change. New code must use
``scale=``: any growth in these counts — and ANY occurrence in a module
not listed — fails here with the rewrite instruction.
"""

from __future__ import annotations

import re
from pathlib import Path

PLANS_DIR = Path(__file__).resolve().parents[1] / "sea_streamer_spark" / "plans"

#: the wrapped-product pattern: a lit (numeric or symbolic) multiplied
#: into _idiv_col's FIRST (numerator) argument in long space.
_PREMULT = re.compile(r"_idiv_col\(\s*F\.lit\([^)]*\)\s*\*", re.S)

#: frozen r10-audited baseline — per-module count of bounded legacy
#: sites. Do NOT bump these numbers for new code; pass scale= instead.
_AUDITED_BASELINE = {
    "llm_ops12.py": 12,
    "llm_ops13.py": 15,
    "llm_ops14.py": 2,
}


def test_no_new_bigint_premultiply_into_idiv():
    offenders = {}
    for p in sorted(PLANS_DIR.glob("*.py")):
        n = len(_PREMULT.findall(p.read_text()))
        allowed = _AUDITED_BASELINE.get(p.name, 0)
        if n > allowed:
            offenders[p.name] = (n, allowed)
    assert not offenders, (
        f"BIGINT pre-multiply feeding _idiv_col's numerator grew beyond "
        f"the audited r10 baseline: {offenders} (found > allowed). "
        f"F.lit(K) * col wraps silently in long space once col > 2^63/K; "
        f"use _idiv_col(col, denom, scale=K), which multiplies inside "
        f"DECIMAL(38,0)."
    )


def test_baseline_matches_reality():
    """If a legacy site is migrated to scale=, the baseline must be
    ratcheted DOWN in the same commit so it can never silently refill."""
    for name, allowed in _AUDITED_BASELINE.items():
        n = len(_PREMULT.findall((PLANS_DIR / name).read_text()))
        assert n == allowed, (
            f"{name}: found {n} pre-multiply sites but baseline says "
            f"{allowed} — ratchet _AUDITED_BASELINE down to {n}."
        )
