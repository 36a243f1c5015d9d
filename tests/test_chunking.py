"""Token-window chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.chunking import chunk_documents


def _mk(spark, *texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


class TestChunking:
    def test_no_overlap_windows(self, spark):
        df = _mk(spark, "a b c d e f g")
        rows = sorted(
            chunk_documents(df, max_tokens=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk_text"] for r in rows] == ["a b c", "d e f", "g"]
        assert [r["n_tokens"] for r in rows] == [3, 3, 1]
        assert [r["chunk_id"] for r in rows] == [0, 1, 2]

    def test_overlap_windows(self, spark):
        # stride 2: starts at tokens 1,3,5 -> abc* windows of 4
        df = _mk(spark, "a b c d e f g")
        rows = sorted(
            chunk_documents(df, max_tokens=4, overlap=2).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk_text"] for r in rows] == [
            "a b c d", "c d e f", "e f g"
        ]

    def test_exact_fit_single_chunk(self, spark):
        df = _mk(spark, "a b c")
        rows = chunk_documents(df, max_tokens=3).collect()
        assert len(rows) == 1 and rows[0]["chunk_text"] == "a b c"

    def test_no_redundant_trailing_chunk(self, spark):
        # 10 tokens, max 8, overlap 4 (stride 4): chunks at 1 and 5 only —
        # a third chunk at 9 would be a subrange of chunk 1..10
        df = _mk(spark, " ".join("t%d" % i for i in range(10)))
        rows = chunk_documents(df, max_tokens=8, overlap=4).collect()
        assert len(rows) == 2
        assert sorted(r["n_tokens"] for r in rows) == [6, 8]

    def test_empty_and_null_docs_yield_no_rows(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "x y")], "doc_id long, text string"
        )
        rows = chunk_documents(df, max_tokens=10).collect()
        assert [r["doc_id"] for r in rows] == [3]

    def test_bad_overlap_rejected(self, spark):
        df = _mk(spark, "a")
        with pytest.raises(ValueError):
            chunk_documents(df, max_tokens=4, overlap=4)

    def test_lineage_rejoins_to_docs(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        ch = chunk_documents(docs, max_tokens=32, overlap=8)
        # every chunk joins back to its doc; token coverage >= doc tokens
        j = ch.groupBy("doc_id").agg(F.sum("n_tokens").alias("s"))
        from sparksearchengine_spark.functions.analyzers import analyzer_expr

        dl = docs.select(
            "doc_id", F.size(analyzer_expr(F.col("text"), "simple")).alias("L")
        )
        bad = j.join(dl, "doc_id").where(F.col("s") < F.col("L")).count()
        assert bad == 0

    def test_scan_stage_no_shuffle(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPackChunks:
    def test_offsets_and_pack_assignment(self, spark):
        from sparksearchengine_spark.operators.chunking import pack_chunks

        chunks = spark.createDataFrame(
            [(1, 0, 4), (1, 1, 4), (2, 0, 3), (3, 0, 5)],
            "doc_id long, chunk_id long, n_tokens long",
        )
        rows = {
            (r["doc_id"], r["chunk_id"]): r
            for r in pack_chunks(chunks, budget=8).collect()
        }
        # layout order (doc,chunk): offsets 0,4,8,11
        assert rows[(1, 0)]["offset"] == 0
        assert rows[(1, 1)]["offset"] == 4
        assert rows[(2, 0)]["offset"] == 8
        assert rows[(3, 0)]["offset"] == 11
        assert rows[(1, 1)]["pack_id"] == 0
        assert rows[(2, 0)]["pack_id"] == 1
        assert rows[(2, 0)]["pack_offset"] == 0
        assert rows[(3, 0)]["pack_id"] == 1
        assert rows[(3, 0)]["pack_offset"] == 3

    def test_global_packing_avoids_single_reducer(self, spark):
        """shard_col=None must compute the global running sum as the
        two-stage parallel prefix sum — the plan may not funnel the data
        through an Exchange SinglePartition (the r2-documented
        exploration-only global window)."""
        from sparksearchengine_spark.operators.chunking import pack_chunks

        chunks = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.lit(0).alias("chunk_id"),
            (F.col("id") % 7 + 1).alias("n_tokens"),
        )
        out = pack_chunks(chunks, budget=16)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the DATA may never funnel through a single partition; the one
        # allowed SinglePartition is distributed_prefix's offsets window
        # over the per-partition totals frame (<= |partitions| rows,
        # i.e. its child is the _dp_pid aggregate, not a data scan)
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            below = "\n".join(lines[i + 1 : i + 4])
            assert "_dp_pid" in below and "HashAggregate" in below, plan
        # and the offsets are still the exact global running sum
        rows = sorted(
            out.select("doc_id", "n_tokens", "offset").collect(),
            key=lambda r: r["doc_id"],
        )
        acc = 0
        for r in rows:
            assert r["offset"] == acc
            acc += r["n_tokens"]

    def test_sharded_packing_independent(self, spark):
        from sparksearchengine_spark.operators.chunking import pack_chunks

        chunks = spark.createDataFrame(
            [(1, 0, 4, 0), (2, 0, 4, 1), (3, 0, 4, 0), (4, 0, 4, 1)],
            "doc_id long, chunk_id long, n_tokens long, shard int",
        )
        rows = {
            r["doc_id"]: r
            for r in pack_chunks(chunks, budget=8, shard_col="shard").collect()
        }
        # each shard starts its own stream at offset 0
        assert rows[1]["offset"] == 0 and rows[2]["offset"] == 0
        assert rows[3]["offset"] == 4 and rows[4]["offset"] == 4

    def test_end_to_end_with_chunk_documents(self, spark):
        from sparksearchengine_spark.operators.chunking import (
            chunk_documents, pack_chunks,
        )
        from sparksearchengine_spark.operators.export import shard_assignments

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        ch = chunk_documents(docs, max_tokens=32)
        sh = shard_assignments(ch, num_shards=4)
        packed = pack_chunks(sh, budget=512, shard_col="shard")
        # total tokens per shard == max offset + last n_tokens
        agg = packed.groupBy("shard").agg(
            F.sum("n_tokens").alias("s"),
            F.max(F.col("offset") + F.col("n_tokens")).alias("m"),
        )
        assert all(r["s"] == r["m"] for r in agg.collect())


class TestSplitSentences:
    def test_basic_segmentation(self, spark):
        from sparksearchengine_spark.operators.chunking import (
            split_sentences,
        )

        df = spark.createDataFrame(
            [(1, "First one. Second two!  Third?No split here")],
            "doc_id long, text string",
        )
        out = split_sentences(df).orderBy("sent_idx").collect()
        # 'Third?No' has no whitespace after '?' -> stays one sentence
        assert [(r["sent_idx"], r["sentence"]) for r in out] == [
            (0, "First one."),
            (1, "Second two!"),
            (2, "Third?No split here"),
        ]

    def test_terminator_runs_and_trim(self, spark):
        from sparksearchengine_spark.operators.chunking import (
            split_sentences,
        )

        df = spark.createDataFrame(
            [(1, "Really?! Yes... done. ")], "doc_id long, text string"
        )
        out = [r["sentence"] for r in split_sentences(df).collect()]
        assert out == ["Really?!", "Yes...", "done."]

    def test_null_and_min_chars(self, spark):
        from sparksearchengine_spark.operators.chunking import (
            split_sentences,
        )

        df = spark.createDataFrame(
            [(1, None), (2, "Ok. a. Fine.")], "doc_id long, text string"
        )
        out = split_sentences(df, min_chars=3).collect()
        assert {r["doc_id"] for r in out} == {2}
        assert [r["sentence"] for r in out] == ["Ok.", "Fine."]
        import pytest

        with pytest.raises(ValueError):
            split_sentences(df, min_chars=0)

    def test_scan_stage_no_exchange(self, spark):
        from sparksearchengine_spark.operators.chunking import (
            split_sentences,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        plan = (
            split_sentences(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
