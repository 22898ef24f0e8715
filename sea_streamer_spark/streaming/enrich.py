"""Stream-static enrichment join — the firehose-side dimension lookup
(user profile, document source metadata, feature-store row) every streaming
pipeline needs.

Two mappings, chosen by how fresh the dimension must be:

1. **Plan-static** (Spark native): ``stream_df.join(static_df, key)`` —
   Catalyst plans the static side once; with a small dim it broadcasts and
   every micro-batch probes the same hash table. Cheapest, but the dim is
   frozen at query start (its file listing is resolved when the DataFrame
   is created), so dimension UPDATES during the query's lifetime are not
   observed. Use for genuinely static dims.

2. **Per-batch refresh** (:func:`enriching_foreach_batch`): the dim is
   re-read INSIDE ``foreachBatch`` — each micro-batch sees the dimension
   as of its own processing time (the slowly-changing-dimension contract
   streaming enrichment actually wants; the batch-side analog of the
   registry's ``join_point_in_time``). The re-read is a fresh parquet scan
   + broadcast per batch: at scale keep the dim compact (it is a dim) and
   amortize with ``maxFilesPerTrigger``-sized batches. The dim swap must
   be ATOMIC at the directory level (write new snapshot dir + repoint, the
   ``versioning``/``compaction`` convention) — overwriting files in place
   races the per-batch scan.

Executor economics are identical to any broadcast join: the stream side
never shuffles; the dim ships once per batch to each executor.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enriching_foreach_batch(
    dim_loader: Callable[..., DataFrame],
    key: str | list[str],
    write_fn: Callable[[DataFrame, int], None],
    how: str = "left",
    broadcast: bool = True,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that re-reads the dimension per
    micro-batch and writes the enriched batch.

    ``dim_loader`` receives the batch's SparkSession and returns the
    current dimension DataFrame (typically ``lambda s: s.read.parquet(p)``
    — resolved fresh each batch, which is the whole point)."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        dim = dim_loader(batch_df.sparkSession)
        if broadcast:
            dim = F.broadcast(dim)
        write_fn(batch_df.join(dim, key, how), batch_id)

    return fn
