"""Large literal arrays built by ONE SQL parse instead of per-element
py4j calls.

``F.lit(python_list)`` marshals every element through a py4j round-trip
when building the Column tree: a 2^20-bit Bloom word table (16,384
longs) costs ~8 s of pure driver-side expression-BUILD time per query,
a 128×64 centroid table ~4.5 s (measured, r12). Both are pure plan-build
overhead — they recur on every bench run and every oracle check.

The builders here emit one ``F.expr`` string that Catalyst constant-folds
to the IDENTICAL ``Literal`` the old tree optimized to:

- longs: ``CAST(split('<csv>', ',') AS ARRAY<BIGINT>)`` — the split and
  cast of a literal string are foldable, so ConstantFolding evaluates
  them once at optimization time; string→long conversion is exact for
  every int64 (including −2^63, which a ``...L`` literal could not
  spell).
- doubles: ``CAST('<repr>' AS DOUBLE)`` per element — ``repr`` is the
  shortest round-trip form and string→double is ``Double.parseDouble``,
  so every component folds to the bit-identical IEEE double.

Values and optimized plans are byte-identical; only the driver-side
build time changes (measured 77× faster for the 128-cell quantizer).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_longs(values) -> Column:
    """array<bigint> literal via one SQL parse (see module docstring)."""
    vals = [int(v) for v in values]
    if not vals:
        return F.expr("CAST(array() AS ARRAY<BIGINT>)")
    s = ",".join(str(v) for v in vals)
    return F.expr(f"CAST(split('{s}', ',') AS ARRAY<BIGINT>)")


def lit_doubles(values) -> Column:
    """array<double> literal via one SQL parse, bit-exact per element."""
    ds = []
    for x in values:
        fx = float(x)
        if math.isnan(fx) or math.isinf(fx):
            raise ValueError("lit_doubles: non-finite component")
        ds.append(f"CAST('{fx!r}' AS DOUBLE)")
    if not ds:
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr("array(" + ", ".join(ds) + ")")


def lit_vecs(vecs) -> Column:
    """array<array<double>> literal via one SQL parse, bit-exact."""
    parts = []
    for vec in vecs:
        ds = []
        for x in vec:
            fx = float(x)
            if math.isnan(fx) or math.isinf(fx):
                raise ValueError("lit_vecs: non-finite component")
            ds.append(f"CAST('{fx!r}' AS DOUBLE)")
        parts.append("array(" + ", ".join(ds) + ")")
    return F.expr("array(" + ", ".join(parts) + ")")
