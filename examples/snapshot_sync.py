#!/usr/bin/env python
"""Snapshot-to-snapshot sync: keep downstream artifacts current at
CHANGE-volume cost when a corpus is re-curated — the versioning companion
to incremental_ingest.py (which handles append-only firehoses; this
handles rebuilds that also MODIFY and REMOVE rows).

    snapshot v1 (parquet dir)      snapshot v2 (parquet dir)
              \\                        /
           snapshot_diff (md5 row digests, full-outer key join)
              |— added/changed/removed row sets (change-volume sized)
              |
              +--> apply_diff: reconstruct v2 from v1 + diff  (verified)
              +--> per-source mergeable moments: v2 profile = v1 profile
                   - removed/changed-old partials + added/changed-new
                   partials — history never re-profiled
              +--> compaction report on the synced output

Why this shape at 100 TB: the diff is ONE key-keyed join over map-side
digests (zero-Exchange if both snapshots are bucketed by key), every
downstream update is driven by the diff's row sets, and the final layout
step keeps file counts bounded. Nothing in the loop scales with snapshot
size except the single diff join.

    python examples/snapshot_sync.py [sf_dir] [work_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sea_streamer_spark import get_spark
from sea_streamer_spark.operators.compaction import compact_files
from sea_streamer_spark.operators.stats import (
    derive_stats,
    merge_moments,
    moment_stats,
)
from sea_streamer_spark.operators.versioning import apply_diff, snapshot_diff


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="snap_sync_")
    cleanup = len(sys.argv) <= 2
    spark = get_spark(app_name="snapshot-sync-example")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "source", "text", "n_chars"
    )

    # ---- build two snapshot versions (v2 = current table; v1 = edited past)
    v1_dir, v2_dir, out_dir = (
        os.path.join(work, d) for d in ("v1", "v2", "synced")
    )
    v1 = (
        docs.filter(F.col("doc_id") % 10 != 3)  # these rows arrive in v2
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" v1"))
            ).otherwise(F.col("text")),
        )
        .unionByName(  # rows deleted in v2
            docs.filter(F.col("doc_id") % 13 == 0).withColumn(
                "doc_id", F.col("doc_id") + 1_000_000
            )
        )
    )
    v1.repartition(8).write.mode("overwrite").parquet(v1_dir)
    docs.repartition(8).write.mode("overwrite").parquet(v2_dir)

    old = spark.read.parquet(v1_dir)
    new = spark.read.parquet(v2_dir)

    # ---- 1. the diff (change-volume sized)
    diff = snapshot_diff(old, new, ["doc_id"]).cache()
    by_kind = {r["change"]: r["n"] for r in
               diff.groupBy("change").agg(F.count("*").alias("n")).collect()}
    print(f"diff: {by_kind}")

    # ---- 2. reconstruct v2 and verify (the sync correctness gate)
    rebuilt = apply_diff(old, diff, new, ["doc_id"])
    mismatch = rebuilt.exceptAll(new).count() + new.exceptAll(rebuilt).count()
    assert mismatch == 0, f"sync diverged: {mismatch} rows differ"
    print("apply_diff(v1, diff) == v2 verified")

    # ---- 3. incremental profile update via mergeable moments: the v2
    #      profile = partial(unchanged-v1 rows) ⊕ partial(added/changed-v2
    #      rows). Here the unchanged partial is recomputed to PROVE the
    #      merge identity; a production pipeline keeps per-bucket partials
    #      persisted (hash_split buckets) so only diff-touched buckets
    #      recompute — true change-volume cost. (min/max cannot subtract,
    #      which is why the decomposition re-partials rather than negates.)
    prof_v2_direct = moment_stats(new, "n_chars", ["source"])
    changed_keys = diff.filter(F.col("change").isin("added", "changed")).select("doc_id")
    removed_keys = diff.filter(F.col("change").isin("removed", "changed")).select("doc_id")
    unchanged_old = old.join(removed_keys, "doc_id", "left_anti").join(
        diff.filter(F.col("change") == "added").select("doc_id"), "doc_id", "left_anti"
    )
    incoming = new.join(changed_keys, "doc_id", "left_semi")
    prof_incremental = merge_moments(
        moment_stats(unchanged_old, "n_chars", ["source"]),
        moment_stats(incoming, "n_chars", ["source"]),
        group_cols=["source"],
    )
    delta = prof_v2_direct.exceptAll(prof_incremental).count()
    assert delta == 0, "incremental profile diverged from direct"
    print("incremental profile == direct profile verified")
    print(derive_stats(prof_incremental).orderBy("source").limit(3).toPandas().to_string())

    # ---- 4. write the synced snapshot compacted + range-clustered
    rebuilt.write.mode("overwrite").parquet(out_dir + "_raw")
    report = compact_files(
        spark, out_dir + "_raw", out_dir,
        target_bytes=4 * 1024 * 1024, order_col="doc_id",
    )
    print(f"compaction: {report}")

    if cleanup:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
