"""Retrieval-metrics operator: hand-computed nDCG/MRR/P/R cases.

The reference has no eval harness; these are the standard graded-metric
definitions computed by hand on 3 tiny queries.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.evaluate import (
    retrieval_metrics,
    retrieval_metrics_summary,
)


def _dcg(grades):
    return sum(
        round((2.0**g - 1.0) / math.log2(r + 1), 6)
        for r, g in enumerate(grades, start=1)
    )


@pytest.fixture(scope="module")
def eval_frames(spark):
    results = spark.createDataFrame(
        [
            (1, 10, 3.0),
            (1, 11, 2.0),
            (1, 12, 1.0),
            # query 3: perfect ranking of its two labeled docs
            (3, 30, 9.0),
            (3, 31, 8.0),
            # query 4 is retrieved but unlabeled -> excluded from output
            (4, 40, 1.0),
        ],
        "query_id long, doc_id long, score double",
    )
    labels = spark.createDataFrame(
        [
            (1, 10, 2.0),
            (1, 12, 1.0),
            (1, 99, 3.0),  # relevant but never retrieved
            (2, 20, 1.0),  # query 2 has labels but no results
            (3, 30, 2.0),
            (3, 31, 1.0),
        ],
        "query_id long, doc_id long, grade double",
    )
    return results, labels


class TestRetrievalMetrics:
    def test_hand_computed_query1(self, eval_frames):
        results, labels = eval_frames
        row = (
            retrieval_metrics(results, labels, k=3)
            .where(F.col("query_id") == 1)
            .collect()[0]
        )
        dcg = _dcg([2.0, 0.0, 1.0])  # ranks 1..3 gains
        idcg = _dcg([3.0, 2.0, 1.0])  # labels sorted by grade desc
        assert row.n_rel == 3 and row.hits == 2
        assert row.precision == round(2 / 3, 6)
        assert row.recall == round(2 / 3, 6)
        assert row.rr == 1.0
        assert row.ndcg == pytest.approx(round(dcg / idcg, 6), abs=1e-6)

    def test_unretrieved_labeled_query_scores_zero(self, eval_frames):
        results, labels = eval_frames
        row = (
            retrieval_metrics(results, labels, k=3)
            .where(F.col("query_id") == 2)
            .collect()[0]
        )
        assert (row.n_rel, row.hits) == (1, 0)
        assert row.precision == 0.0 and row.recall == 0.0
        assert row.rr == 0.0 and row.ndcg == 0.0

    def test_perfect_ranking_ndcg_one(self, eval_frames):
        results, labels = eval_frames
        row = (
            retrieval_metrics(results, labels, k=3)
            .where(F.col("query_id") == 3)
            .collect()[0]
        )
        assert row.ndcg == 1.0 and row.rr == 1.0 and row.recall == 1.0

    def test_unlabeled_query_excluded(self, eval_frames):
        results, labels = eval_frames
        out = retrieval_metrics(results, labels, k=3)
        assert sorted(r.query_id for r in out.collect()) == [1, 2, 3]

    def test_rank_col_passthrough_matches_recompute(self, eval_frames, spark):
        results, labels = eval_frames
        w_rank = results.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("score"), F.asc("doc_id")
                )
            ),
        )
        a = retrieval_metrics(results, labels, k=3).orderBy("query_id")
        b = retrieval_metrics(w_rank, labels, k=3, rank_col="rank").orderBy(
            "query_id"
        )
        assert a.collect() == b.collect()

    def test_duplicate_labels_take_max_grade(self, spark):
        results = spark.createDataFrame(
            [(1, 10, 1.0)], "query_id long, doc_id long, score double"
        )
        labels = spark.createDataFrame(
            [(1, 10, 0.0), (1, 10, 2.0)],
            "query_id long, doc_id long, grade double",
        )
        row = retrieval_metrics(results, labels, k=1).collect()[0]
        assert row.hits == 1 and row.ndcg == 1.0

    def test_partitioning_invariant(self, eval_frames):
        results, labels = eval_frames
        a = retrieval_metrics(results, labels, k=3).orderBy("query_id")
        b = retrieval_metrics(
            results.repartition(7), labels.repartition(5), k=3
        ).orderBy("query_id")
        assert a.collect() == b.collect()

    def test_salted_rank_path_exact(self, eval_frames):
        results, labels = eval_frames
        a = retrieval_metrics(results, labels, k=3).orderBy("query_id")
        b = retrieval_metrics(
            results, labels, k=3, salt_buckets=4
        ).orderBy("query_id")
        assert a.collect() == b.collect()

    def test_bad_k_raises(self, eval_frames):
        results, labels = eval_frames
        with pytest.raises(ValueError, match="k must be"):
            retrieval_metrics(results, labels, k=0)

    def test_duplicate_result_rows_count_once(self, spark):
        """A doc retrieved twice for the same query (trusted rank_col
        with repeats / fused result frames) contributes one hit at its
        best rank — not one per occurrence (ADVICE r5)."""
        dup = spark.createDataFrame(
            [(1, 10, 1, 2.0), (1, 10, 3, 1.0), (1, 20, 2, 1.5)],
            "query_id long, doc_id long, rank long, score double",
        )
        labels = spark.createDataFrame(
            [(1, 10, 1.0)], "query_id long, doc_id long, grade double"
        )
        row = retrieval_metrics(
            dup, labels, k=3, rank_col="rank"
        ).collect()[0]
        assert row.hits == 1
        assert row.recall == 1.0
        assert row.rr == 1.0  # best rank (1), not the repeat at 3
        # recomputed-rank path with a literally duplicated input row
        fused = spark.createDataFrame(
            [(1, 10, 2.0), (1, 10, 2.0), (1, 20, 1.5)],
            "query_id long, doc_id long, score double",
        )
        row2 = retrieval_metrics(fused, labels, k=3).collect()[0]
        assert row2.hits == 1 and row2.rr == 1.0

    def test_duplicates_do_not_consume_rank_slots(self, spark):
        """r6 review: with recomputed ranks, a duplicated result row
        must not occupy two of the k slots and push a distinct doc
        past the cutoff — duplicates collapse BEFORE the window."""
        fused = spark.createDataFrame(
            [(1, 10, 2.0), (1, 10, 2.0), (1, 20, 1.5)],
            "query_id long, doc_id long, score double",
        )
        labels = spark.createDataFrame(
            [(1, 10, 1.0), (1, 20, 1.0)],
            "query_id long, doc_id long, grade double",
        )
        row = retrieval_metrics(fused, labels, k=2).collect()[0]
        # doc 10 @ rank 1, doc 20 @ rank 2 — both inside k=2
        assert row.hits == 2
        assert row.recall == 1.0
        assert row.ndcg == 1.0


class TestRetrievalSummary:
    def test_macro_means(self, eval_frames):
        results, labels = eval_frames
        per_q = retrieval_metrics(results, labels, k=3)
        rows = {r.query_id: r for r in per_q.collect()}
        s = retrieval_metrics_summary(per_q).collect()[0]
        assert s.n_queries == 3
        assert s.mrr == pytest.approx(
            round(sum(r.rr for r in rows.values()) / 3, 6), abs=1e-6
        )
        assert s.mean_ndcg == pytest.approx(
            round(sum(r.ndcg for r in rows.values()) / 3, 6), abs=1e-6
        )
