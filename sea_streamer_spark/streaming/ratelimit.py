"""Streaming per-key rate limiting — a token bucket in the checkpointed
state store (the streaming analog of the batch quota gate
``curation_source_cap``: that op caps a bounded corpus per source, this op
caps a FIREHOSE per key with bounded state).

State per key = (micro_tokens, last_event_us): two longs, never
stream-length. Refill is EVENT-TIME driven and integer-exact
(``micro_tokens += Δus · rate_per_hour · 10⁶ div 3.6e9``, capped at
``burst``), so replay of the same events yields the same admissions —
deterministic across restarts and engines, like every fixed-point operator
in this repo. Each admitted event spends one token (10⁶ micro).

Input contract (the funnel/anomaly convention): per-key event-time order
across micro-batches; within a batch the processor sorts. Late data must
be reordered upstream inside a watermark.

Emits EVERY event with an ``admitted`` flag (the rejected stream is the
interesting one for quota monitoring); filter ``admitted`` for the
pass-through. The processor is self-contained, so it pickles by value and
runs on a bare session without addPyFile.
"""

from __future__ import annotations

OUTPUT_SCHEMA = "key string, ts timestamp, admitted boolean, tokens_after long"
STATE_SCHEMA = "micro_tokens long, last_us long"

MICRO = 1_000_000
US_PER_HOUR = 3_600_000_000


def streaming_rate_limit(
    stream,
    key_col: str,
    ts_col: str = "ts",
    rate_per_hour: int = 60,
    burst: int = 10,
):
    """stream: streaming DataFrame with (key_col, ts_col). Admits at most
    ``burst`` immediately and ``rate_per_hour`` sustained per key."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    micro, us_hour = MICRO, US_PER_HOUR
    kcol, tcol = key_col, ts_col
    rate, cap = int(rate_per_hour), int(burst) * MICRO

    def fn(key, pdfs, state):
        (k,) = key
        if state.exists:
            toks, last_us = state.get
        else:
            toks, last_us = cap, -1  # a fresh key starts with a full bucket
        out = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values(tcol)
            for ts in batch[tcol]:
                us = int(pd.Timestamp(ts).value // 1000)
                if last_us >= 0 and us > last_us:
                    toks = min(cap, toks + (us - last_us) * rate * micro // us_hour)
                last_us = max(last_us, us)
                if toks >= micro:
                    toks -= micro
                    out.append((str(k), ts, True, toks))
                else:
                    out.append((str(k), ts, False, toks))
        state.update((toks, last_us))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "ts", "admitted", "tokens_after"]
            )

    return stream.groupBy(kcol).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rate_limit_py(
    events_us: list[int], rate_per_hour: int = 60, burst: int = 10
) -> list[bool]:
    """Pure-python reference (tests pin the streaming operator to this)."""
    toks, last_us = burst * MICRO, -1
    out = []
    for us in sorted(events_us):
        if last_us >= 0 and us > last_us:
            toks = min(
                burst * MICRO, toks + (us - last_us) * rate_per_hour * MICRO // US_PER_HOUR
            )
        last_us = max(last_us, us)
        if toks >= MICRO:
            toks -= MICRO
            out.append(True)
        else:
            out.append(False)
    return out
