"""Range (interval) join: pair each left row with every right row whose event
time falls in ``[left[on] - lower, left[on] + upper]``, optionally per key.

The reference engine correlates streams only by timestamp-ordered interleaving
(sea-streamer-fuse/src/lib.rs:9-151); a bounded-time correlation ("all clicks
within the hour before each purchase") is the set-oriented generalization, and
a staple of training-data pipelines (context windows around an anchor event).

Spark-first plan: a naive ``l.join(r, (r.ts >= l.ts - lo) & (r.ts <= l.ts +
up))`` has no equi-key, so Catalyst plans a BroadcastNestedLoopJoin —
O(|L|x|R|) and an OOM at scale. This operator restores an equi-key by time
**bucketing**:

1. pick bucket width ``w = lower + upper`` (the window span);
2. each right row lands in exactly one bucket ``floor(ts/w)``;
3. each left row's window covers at most 2 consecutive buckets — explode it
   to those bucket ids (a <=2x fan-out, no data-dependent blowup);
4. equi-join on (key, bucket) with the exact range predicate as a residual
   filter.

Catalyst then plans a shuffled hash / sort-merge join on the equi-key: both
sides shuffle once, matching is hash-based, and the residual filter runs
inside the join. Because every right row is in exactly one bucket, a (l, r)
pair can match in only one bucket — no post-join dedup. At 100 TB the only
risk is a hot (key, bucket); AQE skew-join splitting (on in the session
factory) handles it, and narrowing the window shrinks buckets linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"
_LUS = "__rj_l_us"
_RUS = "__rj_r_us"


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower_seconds: float,
    upper_seconds: float,
    by: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner range join: rows ``(l, r)`` with ``l[on] - lower <= r[on] <=
    l[on] + upper`` (and ``l[by] == r[by]`` when ``by`` is given).

    ``lower_seconds``/``upper_seconds`` bound the window relative to the left
    row's time (both >= 0; use 0 for a one-sided window). All right columns
    are emitted as ``<col><suffix>``. For left-enrichment with the single
    latest match, use :func:`~sea_streamer_spark.operators.asof.asof_join`.
    """
    if lower_seconds < 0 or upper_seconds < 0:
        raise ValueError("lower_seconds/upper_seconds must be >= 0")
    lo_us = int(round(lower_seconds * 1_000_000))
    hi_us = int(round(upper_seconds * 1_000_000))
    w = max(lo_us + hi_us, 1)

    r = right.select([F.col(c).alias(f"{c}{suffix}") for c in right.columns])
    # cast first: unix_micros rejects TIMESTAMP_NTZ, and the session pins UTC
    # so NTZ -> TZ is a pure reinterpretation (no wall-clock shift).
    l_us = F.unix_micros(F.col(on).cast("timestamp"))
    r_us = F.unix_micros(F.col(f"{on}{suffix}").cast("timestamp"))

    l = left.withColumn(_LUS, l_us).withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor((l_us - F.lit(lo_us)) / F.lit(w)),
                F.floor((l_us + F.lit(hi_us)) / F.lit(w)),
            )
        ),
    )
    r = r.withColumn(_RUS, r_us).withColumn(_BUCKET, F.floor(r_us / F.lit(w)))

    cond = l[_BUCKET] == r[_BUCKET]
    if by is not None:
        cond &= l[by] == r[f"{by}{suffix}"]
    cond &= (r[_RUS] >= l[_LUS] - F.lit(lo_us)) & (r[_RUS] <= l[_LUS] + F.lit(hi_us))
    return l.join(r, cond, "inner").drop(_BUCKET, _LUS, _RUS)
