"""Small-file compaction (operators/compaction.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from sea_streamer_spark.operators.compaction import compact_files, plan_compaction

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from sea_streamer_spark.session import get_spark

    return get_spark(app_name="test-compaction")


@pytest.fixture()
def fragmented(spark, tmp_path):
    """The events table shattered into 64 tiny files."""
    src = str(tmp_path / "frag")
    ev = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev.repartition(64).write.parquet(src)
    return src


def _pq_files(path):
    return sorted(
        f for f in glob.glob(os.path.join(path, "*.parquet")) if os.path.getsize(f) > 0
    )


class TestCompaction:
    def test_plan_reads_metadata(self, spark, fragmented):
        n_files, total, n_out = plan_compaction(spark, fragmented, target_bytes=1 << 40)
        assert n_files == len(_pq_files(fragmented)) == 64
        assert total == sum(os.path.getsize(f) for f in _pq_files(fragmented))
        assert n_out == 1

    def test_compact_reduces_file_count_preserves_rows(self, spark, fragmented, tmp_path):
        dst = str(tmp_path / "compacted")
        _, total, _ = plan_compaction(spark, fragmented, target_bytes=1 << 40)
        report = compact_files(
            spark, fragmented, dst, target_bytes=max(1, total // 4)
        )
        out_files = _pq_files(dst)
        assert 1 <= len(out_files) <= 8  # 64 -> a handful
        a = spark.read.parquet(fragmented).orderBy("doc_id").collect()
        b = spark.read.parquet(dst).orderBy("doc_id").collect()
        assert a == b
        assert report["input_files"] == 64

    def test_order_col_gives_disjoint_file_ranges(self, spark, fragmented, tmp_path):
        import pyarrow.parquet as pq

        dst = str(tmp_path / "ordered")
        _, total, _ = plan_compaction(spark, fragmented, target_bytes=1 << 40)
        compact_files(
            spark, fragmented, dst,
            target_bytes=max(1, total // 4), order_col="doc_id",
        )
        ranges = []
        for f in _pq_files(dst):
            md = pq.ParquetFile(f).metadata
            idx = [
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "doc_id"
            ][0]
            mn = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            mx = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            ranges.append((mn, mx))
        ranges.sort()
        assert len(ranges) >= 2
        for (_, amx), (bmn, _) in zip(ranges, ranges[1:]):
            assert amx <= bmn  # disjoint (boundary may touch), prunable
