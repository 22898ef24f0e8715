"""Streaming distinct-count tracking — the portable HLL sketch
(operators/sketch.py) as a stateful streaming operator.

State per key = the m=256 HLL registers (bounded by sketch geometry, never
by stream length — the same register-merge contract the batch sketch and
the incremental-ingest example rely on, here lifted into
``applyInPandasWithState`` so the registers live in Spark's checkpointed
state store instead of a side file). Every micro-batch folds its tokens
into the registers (max-merge: idempotent under replay) and emits the
exact-integer summary (denom_q32, zero_registers) plus a cumulative
update counter, so the LATEST row per key is the current sketch.

Parity contract (pinned in tests/test_streaming_distinct.py): the python
per-token fold below mirrors ``char_fold_hash(md5(key))`` /
``hll_rho`` EXACTLY — after any prefix of the stream, the emitted summary
equals the batch ``hll_summary(hll_registers(...))`` over the same rows,
including across a checkpoint stop/restart.

Throughput note: the per-token md5+fold here is row-at-a-time python —
fine for the state machinery this module is about; a hot path would hash
upstream with the JVM expressions (one extra column) and keep only the
register max-merge in the stateful processor.
"""

from __future__ import annotations

import hashlib

from ..operators.text import BASE, MOD
from ..operators.sketch import HLL_M, HLL_W

OUTPUT_SCHEMA = (
    "source string, denom_q32 long, zero_registers long, n_updates long"
)
STATE_SCHEMA = "regs array<long>, n_updates long"


def fold_md5_py(s: str) -> int:
    """Python mirror of ``char_fold_hash(F.md5(col))`` (lowercase hex)."""
    h = 0
    for c in hashlib.md5(s.encode("utf-8")).hexdigest():
        h = (h * BASE + ord(c)) % MOD
    return h


def rho_py(w: int) -> int:
    return HLL_W + 1 if w == 0 else HLL_W + 1 - w.bit_length()


def summary_py(regs: list[int]) -> tuple[int, int]:
    denom = sum((1 << 32) if r == 0 else (1 << (32 - r)) for r in regs)
    zeros = sum(1 for r in regs if r == 0)
    return denom, zeros


def streaming_hll_distinct(
    token_stream, key_col: str = "source", token_col: str = "token"
):
    """token_stream: streaming DataFrame with (key_col, token_col).
    Emits (source, denom_q32, zero_registers, n_updates) per key per
    batch; the row with the highest n_updates is the live sketch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    # captured as plain ints/locals so cloudpickle ships the processor BY
    # VALUE — a bare driver session without addPyFile can run it (the
    # decode_media convention; module-level helper references would pickle
    # by reference and require the package on executors)
    m, w_bits, base, mod, tcol = HLL_M, HLL_W, BASE, MOD, token_col

    def fn(key, pdfs, state):
        import hashlib as _hashlib

        def _fold(s: str) -> int:
            h = 0
            for c in _hashlib.md5(s.encode("utf-8")).hexdigest():
                h = (h * base + ord(c)) % mod
            return h

        (src,) = key
        if state.exists:
            regs_t, n_updates = state.get
            regs = list(regs_t)
        else:
            regs, n_updates = [0] * m, 0
        touched = False
        for pdf in pdfs:
            for tok in pdf[tcol]:
                h = _fold(str(tok))
                b = h % m
                w = h // m
                r = w_bits + 1 if w == 0 else w_bits + 1 - w.bit_length()
                if r > regs[b]:
                    regs[b] = r
                touched = True
        if not touched:
            state.update((regs, n_updates))
            return
        n_updates += 1
        state.update((regs, n_updates))
        denom = sum((1 << 32) if r == 0 else (1 << (32 - r)) for r in regs)
        zeros = sum(1 for r in regs if r == 0)
        yield pd.DataFrame(
            [(src, denom, zeros, n_updates)],
            columns=["source", "denom_q32", "zero_registers", "n_updates"],
        )

    return token_stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
