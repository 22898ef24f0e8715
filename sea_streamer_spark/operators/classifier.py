"""Distributed trained linear classifier (the fastText-style quality/topic
probe of an LLM data pipeline) — full-batch gradient descent where EVERY
quantity is a fixed-point integer, so the distributed trainer, the
pure-python reference trainer, and the SQL scoring oracle are bit-identical
by construction (no transcendentals, no float summation order, nothing).

Model: hard-sigmoid logistic probe.  With integer features ``x`` and
fixed-point integer weights ``w`` (denominator ``2^FP_BITS``):

    z_int = Σ w_j·x_j                     (exact BIGINT dot product)
    p     = clamp(0.5 + z/4, 0, 1)        (the hard-sigmoid link)
    r_int = clamp(2^(P_BITS-1) + z_int, 0, 2^P_BITS) - y·2^P_BITS
                                          (p - y, scaled by 2^P_BITS —
                                           still exact integers)
    grad_j = Σ_rows r_int·x_j             (order-independent BIGINT sum —
                                           THE one distributed reduction
                                           per iteration)
    w_j   -= grad_j // (n << (LR_SHIFT + P_BITS - FP_BITS))
                                          (lr = 2^-LR_SHIFT, driver-side)

Plan economics at scale: one aggregation pass over the feature relation per
iteration (map-side partial sums; the shuffle carries d longs per task),
a d-long collect, and a literal-weight update — the textbook
"broadcast weights, reduce gradients" data-parallel training loop that a
parameter-server system runs, expressed as Spark aggregations.  Scoring is
a pure projection with the trained weights baked into the expression tree.

Integer-width note (documented bound, ANSI-pinned like the repo's other
fixed-point ops): per-row |r·x| ≤ 2^P_BITS·max|x| ≈ 5.4e8, so a single
BIGINT gradient sum holds ~1.7e10 rows; beyond that, pre-aggregate per
partition before the final sum (same trick the moment-statistics op uses).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Marker-word count features (the corpus vocabulary is spark-ish; the
#: probe predicts "streaming-flavored" docs). Order is part of the model.
MARKERS: tuple[str, ...] = (
    "stream", "window", "merge", "batch",  # positive topic evidence
    "table", "scan", "row", "sort",        # negative topic evidence
)
#: Feature vector = [BIAS, count(m) for m in MARKERS...]. The bias feature
#: is 1 so its weight moves at the same per-unit rate as the count weights
#: (a large bias constant saturates the hard sigmoid before the marker
#: weights separate — measured: acc 0.55 with bias 64 vs 0.98 with 1).
BIAS = 1
N_FEATURES = 1 + len(MARKERS)

FP_BITS = 20   # weight fixed-point denominator
P_BITS = 22    # FP_BITS + 2: the hard-sigmoid slope 1/4 folded in
LR_SHIFT = 2   # initial learning rate 2^-2
DECAY_EVERY = 8  # halve the rate every 8 iterations (tames GD oscillation)
ITERS = 40

_POS = MARKERS[:4]
_NEG = MARKERS[4:]


# ---------------------------------------------------------------- features

def _toks(text_col: Column) -> Column:
    return F.filter(
        F.split(F.coalesce(text_col, F.lit("")), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def feature_cols(text_col: Column) -> list[Column]:
    """The integer feature vector as JVM expressions (zero Python)."""
    tk = _toks(text_col)
    out = [F.lit(BIAS).cast("long")]

    def eq(word):  # NOT a default-arg lambda: F.filter treats a 2-param
        return lambda t: t == F.lit(word)  # callable as (element, index)

    for m in MARKERS:
        out.append(F.size(F.filter(tk, eq(m))).cast("long"))
    return out


def label_col(text_col: Column) -> Column:
    """y = 1 iff positive marker hits strictly exceed negative hits."""
    tk = _toks(text_col)

    def hits(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(tk, lambda t: F.array_contains(arr, t)))

    return (hits(_POS) > hits(_NEG)).cast("long")


def py_features(text: str) -> list[int]:
    tk = [t for t in re.split(r"\s+", text or "") if t]
    xs = [BIAS]
    for m in MARKERS:
        xs.append(sum(1 for t in tk if t == m))
    return xs


def py_label(text: str) -> int:
    tk = [t for t in re.split(r"\s+", text or "") if t]
    pos = sum(1 for t in tk if t in _POS)
    neg = sum(1 for t in tk if t in _NEG)
    return 1 if pos > neg else 0


def duck_feature_sqls(tk_expr: str) -> list[str]:
    """The same features over a DuckDB token-list expression."""
    out = [f"CAST({BIAS} AS BIGINT)"]
    for m in MARKERS:
        out.append(
            f"CAST(len(list_filter({tk_expr}, t -> t = '{m}')) AS BIGINT)"
        )
    return out


def duck_label_sql(tk_expr: str) -> str:
    pos = " + ".join(
        f"len(list_filter({tk_expr}, t -> t = '{m}'))" for m in _POS
    )
    neg = " + ".join(
        f"len(list_filter({tk_expr}, t -> t = '{m}'))" for m in _NEG
    )
    return f"CAST(CASE WHEN ({pos}) > ({neg}) THEN 1 ELSE 0 END AS BIGINT)"


# ---------------------------------------------------------------- training

def _update(w: list[int], grads: list[int], n: int, it: int) -> list[int]:
    """The shared (python, driver-side) weight update — integer floor
    division with a stepped lr decay, identical in both trainers by being
    the same function."""
    shift = LR_SHIFT + (it // DECAY_EVERY)
    div = n << (shift + P_BITS - FP_BITS)
    return [wj - (gj // div) for wj, gj in zip(w, grads)]


def _r_int_py(z: int, y: int) -> int:
    half = 1 << (P_BITS - 1)
    full = 1 << P_BITS
    return min(max(half + z, 0), full) - y * full


def py_train(samples: list[tuple[list[int], int]], iters: int = ITERS) -> list[int]:
    """Pure-python reference trainer (the oracle replica)."""
    w = [0] * N_FEATURES
    n = len(samples)
    for it in range(iters):
        grads = [0] * N_FEATURES
        for xs, y in samples:
            z = sum(wj * xj for wj, xj in zip(w, xs))
            r = _r_int_py(z, y)
            for j, xj in enumerate(xs):
                grads[j] += r * xj
        w = _update(w, grads, n, it)
    return w


def spark_train(
    df: DataFrame, text_col: str = "text", iters: int = ITERS
) -> list[int]:
    """Distributed trainer: materialize the integer feature relation once
    (cached — the corpus is read a single time), then per iteration ONE
    aggregation computes all d gradient components as exact BIGINT sums
    (map-side partial aggregation ⇒ the shuffle carries d longs per task),
    and the driver applies the shared integer update."""
    cols = feature_cols(F.col(text_col))
    feats = df.select(
        *[c.alias(f"x{j}") for j, c in enumerate(cols)],
        label_col(F.col(text_col)).alias("y"),
    ).cache()
    n = feats.count()
    w = [0] * N_FEATURES
    half, full = 1 << (P_BITS - 1), 1 << P_BITS
    for it in range(iters):
        z = sum(
            (F.lit(w[j]) * F.col(f"x{j}") for j in range(N_FEATURES)),
            start=F.lit(0).cast("long"),
        )
        r = (
            F.least(F.greatest(F.lit(half) + z, F.lit(0)), F.lit(full))
            - F.col("y") * full
        )
        row = feats.select(
            *[
                F.sum(r * F.col(f"x{j}")).cast("long").alias(f"g{j}")
                for j in range(N_FEATURES)
            ]
        ).collect()[0]
        w = _update(w, [row[f"g{j}"] for j in range(N_FEATURES)], n, it)
    feats.unpersist()
    return w


def score_col(text_col: Column, w: list[int]) -> Column:
    """logit (the exact BIGINT dot product) with trained weights baked in
    as literals — a pure projection."""
    cols = feature_cols(text_col)
    z = F.lit(0).cast("long")
    for wj, c in zip(w, cols):
        z = z + F.lit(wj) * c
    return z
