"""Streaming HLL distinct (streaming/distinct.py): the emitted summary
must equal the batch sketch (hll_summary ∘ hll_registers) over the same
rows — including across a checkpointed stop/restart — because the python
per-token fold mirrors the JVM expressions exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.col("text"), r"\s+")).alias("token"),
    )


def _batch_summary(tok_df):
    from sea_streamer_spark.operators.sketch import hll_registers, hll_summary

    regs = hll_registers(tok_df, "token", group_cols=["source"])
    return {
        r["source"]: (r["denom_q32"], r["zero_registers"])
        for r in hll_summary(regs, group_cols=["source"]).collect()
    }


class TestStreamingHll:
    def test_python_fold_mirrors_jvm(self, spark):
        from sea_streamer_spark.operators.text import char_fold_hash
        from sea_streamer_spark.streaming.distinct import fold_md5_py

        toks = ["spark", "table", "row", "x", "1234", "merge batch"]
        df = spark.createDataFrame([(t,) for t in toks], ["t"])
        got = {
            r["t"]: r["h"]
            for r in df.select(
                "t", char_fold_hash(F.md5(F.col("t").cast("string"))).alias("h")
            ).collect()
        }
        for t in toks:
            assert got[t] == fold_md5_py(t), t

    def test_matches_batch_sketch_across_restart(self, spark, sf_dir, tmp_path):
        from sea_streamer_spark.streaming.distinct import streaming_hll_distinct

        tok = _tokens(spark, sf_dir).cache()
        phase1 = tok.filter(F.col("doc_id") % 2 == 0).select("source", "token")
        phase2 = tok.filter(F.col("doc_id") % 2 == 1).select("source", "token")

        in_dir, ckpt, out = (
            str(tmp_path / "in"),
            str(tmp_path / "ck"),
            str(tmp_path / "out"),
        )
        phase1.coalesce(1).write.parquet(in_dir)
        schema = phase1.schema

        def run():
            src = spark.readStream.schema(schema).parquet(in_dir)
            q = (
                streaming_hll_distinct(src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        run()
        # after phase 1: latest emission == batch sketch over phase-1 rows
        emitted = spark.read.parquet(out).collect()
        latest = {}
        for r in emitted:
            if r.source not in latest or r.n_updates > latest[r.source].n_updates:
                latest[r.source] = r
        want1 = _batch_summary(phase1)
        got1 = {s: (r.denom_q32, r.zero_registers) for s, r in latest.items()}
        assert got1 == want1

        # phase 2 appended, query restarted from the checkpoint: state must
        # carry over so the final sketch equals the batch over ALL rows
        phase2.coalesce(1).write.mode("append").parquet(in_dir)
        run()
        emitted = spark.read.parquet(out).collect()
        latest = {}
        for r in emitted:
            if r.source not in latest or r.n_updates > latest[r.source].n_updates:
                latest[r.source] = r
        want_all = _batch_summary(tok.select("source", "token"))
        got_all = {s: (r.denom_q32, r.zero_registers) for s, r in latest.items()}
        assert got_all == want_all

    def test_estimate_accuracy_from_stream(self, spark, sf_dir, tmp_path):
        from sea_streamer_spark.operators.sketch import hll_estimate
        from sea_streamer_spark.streaming.distinct import streaming_hll_distinct

        tok = _tokens(spark, sf_dir).select("source", "token")
        in_dir, ckpt, out = (
            str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out"),
        )
        tok.coalesce(1).write.parquet(in_dir)
        src = spark.readStream.schema(tok.schema).parquet(in_dir)
        q = (
            streaming_hll_distinct(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        truth = {
            r["source"]: r["n"]
            for r in tok.groupBy("source")
            .agg(F.countDistinct("token").alias("n"))
            .collect()
        }
        for r in spark.read.parquet(out).collect():
            est = hll_estimate(r.denom_q32, r.zero_registers)
            assert abs(est - truth[r.source]) <= 0.3 * truth[r.source], (
                r.source, est, truth[r.source]
            )
