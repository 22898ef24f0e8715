"""As-of (time-travel) join: for each left row, the latest right row whose
event time is at-or-before (or strictly before) the left row's, per key.

The reference engine has no relational join at all — this operator serves its
*replay/correlate* use cases (consumer.seek(ts) then "what was the state
then", types/src/consumer.rs:62-67) as a set-oriented operator, and is a
staple of training-data pipelines (attribute an outcome to the latest
preceding exposure).

Spark-first plan: no built-in as-of join exists, but the semantics decompose
into existing operators with exactly ONE shuffle:

1. tag both inputs and ``unionByName`` them (left rows carry null right
   payload and vice versa);
2. one window ``partitionBy(key).orderBy(time, side)`` computes
   ``last(right_col, ignorenulls=True)`` over the unbounded-preceding frame —
   a running carry-forward, O(1) state per row, no group buffering;
3. keep the left-tagged rows.

At 100 TB this shuffles each side once on the key (same cost as any keyed
join) and streams within partitions — no skew-prone build side, no UDF. A
pathologically hot key serializes within its partition; pre-bucketing by
(key, coarse time bucket) with per-bucket seeding is the documented fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_time"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
    tolerance_expr: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join per ``by`` key. ``direction`` picks the match among
    ``right`` rows (pandas ``merge_asof`` semantics):

    - ``"backward"`` (default): latest with ``right[on] <= left[on]``;
    - ``"forward"``: earliest with ``right[on] >= left[on]``;
    - ``"nearest"``: whichever of the two is closer in time (ties → backward).

    ``strict`` excludes exact-time matches (``<`` / ``>``). Unmatched left
    rows keep nulls.
    ``value_cols`` — right columns to carry (default: all but ``on``/``by``),
    emitted as ``<col><suffix>``; the matched right time is ``<on><suffix>``.
    ``tolerance_expr`` — SQL interval (e.g. ``"INTERVAL 1 HOUR"``): matches
    farther than that from ``left[on]`` are nulled out.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    carried = [f"{c}{suffix}" for c in value_cols] + [f"{on}{suffix}"]

    # Equal-time visibility is decided by the side tag's sort position: in the
    # backward window (side ASC) the right row at the exact left time is in
    # the preceding frame iff r_tag < l_tag; the forward window orders side
    # DESC, so the SAME tags make it visible looking forward too. Strict
    # flips the tags, hiding exact matches in both directions.
    l_tag, r_tag = (1, 0) if not strict else (0, 1)
    l = left.withColumn(_SIDE, F.lit(l_tag)).withColumn(_TIME, F.col(on))
    r = (
        right.select(
            F.col(by),
            F.col(on).alias(_TIME),
            F.lit(r_tag).alias(_SIDE),
            F.col(on).alias(f"{on}{suffix}"),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        )
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Carry the whole matched row as ONE struct (non-null for every right
    # row): a right value column that is legitimately NULL at the matched
    # time must surface as NULL, not fall back to an older non-null value —
    # independent per-column last(ignorenulls) would mix rows. One window
    # function instead of len(carried) is also the cheaper plan. Both windows
    # share the hash partitioning on `by`: ONE Exchange regardless of
    # direction (nearest adds a second in-partition sort, nothing more).
    payload = F.when(F.col(_SIDE) == r_tag, F.struct(*[F.col(c) for c in carried]))
    w_back = (
        Window.partitionBy(by)
        .orderBy(F.col(_TIME).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(by)
        .orderBy(F.col(_TIME).asc(), F.col(_SIDE).desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    back = F.last(payload, ignorenulls=True).over(w_back)
    fwd = F.first(payload, ignorenulls=True).over(w_fwd)
    if direction == "backward":
        match = back
    elif direction == "forward":
        match = fwd
    else:
        # cast first: unix_micros rejects TIMESTAMP_NTZ; UTC session makes the
        # NTZ -> TZ cast a pure reinterpretation.
        ts_m = lambda m: F.unix_micros(  # noqa: E731
            m.getField(f"{on}{suffix}").cast("timestamp")
        )
        ts_l = F.unix_micros(F.col(_TIME).cast("timestamp"))
        match = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(ts_l - ts_m(back) <= ts_m(fwd) - ts_l, back)
            .otherwise(fwd)
        )
    filled = unioned.withColumn("__asof_m", match)
    out = filled.filter(F.col(_SIDE) == l_tag).select(
        *left.columns, *[F.col("__asof_m").getField(c).alias(c) for c in carried]
    )
    if tolerance_expr is not None:
        tol = F.expr(tolerance_expr)
        in_tol = (F.col(f"{on}{suffix}") >= F.col(on) - tol) & (
            F.col(f"{on}{suffix}") <= F.col(on) + tol
        )
        out = out.select(
            *left.columns,
            *[F.when(in_tol, F.col(c)).otherwise(F.lit(None)).alias(c) for c in carried],
        )
    return out
