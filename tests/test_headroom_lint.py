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

#: the wrapped-product patterns (r11 ADVICE: cover BOTH operand orders
#: and the modulo sibling, not just the one spelling r10 froze):
#:  - lit * col feeding _idiv_col's FIRST (numerator) argument;
#:  - the commuted col * lit inside that same first argument;
#:  - lit * col whose product then feeds `%` (the Hamilton-remainder
#:    shape — same silent BIGINT wrap, fixed by _imod_col(..., scale=K)).
_PREMULT_PATTERNS = {
    "lit*col into _idiv_col": re.compile(
        r"_idiv_col\(\s*F\.lit\((?:[^()]|\([^()]*\))*\)\s*\*", re.S
    ),
    "col*lit into _idiv_col": re.compile(
        r"_idiv_col\([^,]*\*\s*F\.lit\(", re.S
    ),
    "lit*col into %": re.compile(
        r"F\.lit\((?:[^()]|\([^()]*\))*\)\s*\*[^\n%]*\)+\s*%\s*F\.", re.S
    ),
}

#: frozen audited baseline — per-module count of bounded legacy sites
#: per pattern. Do NOT bump these numbers for new code; pass scale= to
#: _idiv_col/_imod_col instead. r12 ratchet: llm_ops14 2 → 1 (the
#: Hamilton quota_floor migrated to scale=; only the decile-rank
#: `9*n+9` rank bound remains, n a per-source row count). The modulo
#: pattern starts — and must stay — at zero everywhere (both r11 sites
#: migrated to _imod_col).
_AUDITED_BASELINE = {
    "lit*col into _idiv_col": {
        "llm_ops12.py": 12,
        "llm_ops13.py": 15,
        "llm_ops14.py": 1,
    },
    "col*lit into _idiv_col": {},
    "lit*col into %": {},
}


def test_no_new_bigint_premultiply_into_idiv():
    offenders = {}
    for p in sorted(PLANS_DIR.glob("*.py")):
        text = p.read_text()
        for pat_name, pat in _PREMULT_PATTERNS.items():
            n = len(pat.findall(text))
            allowed = _AUDITED_BASELINE[pat_name].get(p.name, 0)
            if n > allowed:
                offenders[(p.name, pat_name)] = (n, allowed)
    assert not offenders, (
        f"BIGINT pre-multiply feeding an exact-integer division/remainder "
        f"grew beyond the audited baseline: {offenders} (found > allowed). "
        f"F.lit(K) * col wraps silently in long space once col > 2^63/K; "
        f"use _idiv_col(col, denom, scale=K) / _imod_col(col, denom, "
        f"scale=K), which multiply inside DECIMAL(38,0)."
    )


def test_baseline_matches_reality():
    """If a legacy site is migrated to scale=, the baseline must be
    ratcheted DOWN in the same commit so it can never silently refill."""
    for pat_name, per_module in _AUDITED_BASELINE.items():
        pat = _PREMULT_PATTERNS[pat_name]
        for name, allowed in per_module.items():
            n = len(pat.findall((PLANS_DIR / name).read_text()))
            assert n == allowed, (
                f"{name} [{pat_name}]: found {n} pre-multiply sites but "
                f"baseline says {allowed} — ratchet _AUDITED_BASELINE "
                f"down to {n}."
            )
