"""classification_metrics vs a pure-Python reference (ties included).

ROC-AUC uses the Mann-Whitney midrank statistic; AP the distinct-
threshold step definition — both standard, both reproduced here in
plain Python and compared exactly.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.evaluate import classification_metrics


def _ref_auc(pairs):
    """Midrank Mann-Whitney AUC over (label, score) pairs."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = 0.0
    for p in pos:
        for q in neg:
            wins += 1.0 if p > q else (0.5 if p == q else 0.0)
    return wins / (len(pos) * len(neg))


def _ref_ap(pairs):
    """Average precision over distinct-score thresholds, descending."""
    P = sum(y for y, _ in pairs)
    if P == 0:
        return None
    by_score: dict = {}
    for y, s in pairs:
        n, p = by_score.get(s, (0, 0))
        by_score[s] = (n + 1, p + y)
    cn = cp = 0
    ap = 0.0
    for s in sorted(by_score, reverse=True):
        n, p = by_score[s]
        cn += n
        cp += p
        ap += (p / P) * (cp / cn)
    return ap


def _run(spark, pairs, threshold=0.5):
    df = spark.createDataFrame(pairs, "label int, score double")
    return classification_metrics(df, threshold=threshold).collect()[0]


class TestClassificationMetrics:
    def test_hand_computed_confusion(self, spark):
        pairs = [(1, 0.9), (1, 0.4), (0, 0.8), (0, 0.1), (1, 0.6), (0, 0.3)]
        r = _run(spark, pairs, threshold=0.5)
        assert (r.n, r.n_pos) == (6, 3)
        assert (r.tp, r.fp, r.fn, r.tn) == (2, 1, 1, 2)
        assert r.precision == pytest.approx(2 / 3, abs=1e-6)
        assert r.recall == pytest.approx(2 / 3, abs=1e-6)
        assert r.accuracy == pytest.approx(4 / 6, abs=1e-6)

    @pytest.mark.parametrize("seed", [11, 22, 33])
    def test_auc_and_ap_match_reference_with_ties(self, spark, seed):
        rng = random.Random(seed)
        # coarse score grid forces heavy ties
        pairs = [
            (rng.randint(0, 1), rng.choice([0.1, 0.3, 0.5, 0.7, 0.9]))
            for _ in range(300)
        ]
        r = _run(spark, pairs)
        assert r.roc_auc == pytest.approx(_ref_auc(pairs), abs=1e-6)
        assert r.pr_auc == pytest.approx(_ref_ap(pairs), abs=1e-6)

    def test_perfect_and_inverted(self, spark):
        perfect = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
        assert _run(spark, perfect).roc_auc == pytest.approx(1.0)
        inverted = [(y ^ 1, s) for y, s in perfect]
        assert _run(spark, inverted).roc_auc == pytest.approx(0.0)

    def test_degenerate_single_class(self, spark):
        r = _run(spark, [(1, 0.5), (1, 0.7)])
        assert r.roc_auc is None
        assert r.recall == 1.0 and r.tn == 0

    def test_bad_labels_raise(self, spark):
        df = spark.createDataFrame([(2, 0.5)], "label int, score double")
        with pytest.raises(Exception, match="0/1"):
            classification_metrics(df).collect()

    def test_pr_curve_matches_reference(self, spark):
        from sparksearchengine_spark.operators.evaluate import pr_curve

        rng = random.Random(5)
        pairs = [
            (rng.randint(0, 1), rng.choice([0.2, 0.4, 0.6, 0.8]))
            for _ in range(200)
        ]
        df = spark.createDataFrame(pairs, "label int, score double")
        got = {
            r.threshold: (r.n_kept, r.precision, r.recall)
            for r in pr_curve(df).collect()
        }
        P = sum(y for y, _ in pairs)
        for t in (0.2, 0.4, 0.6, 0.8):
            kept = [(y, s) for y, s in pairs if s >= t]
            tp = sum(y for y, _ in kept)
            assert got[t][0] == len(kept)
            assert got[t][1] == pytest.approx(tp / len(kept), abs=1e-6)
            assert got[t][2] == pytest.approx(tp / P, abs=1e-6)

    def test_pr_curve_holds_no_cache_of_its_own(self, spark):
        """pr_curve must not persist the grouped frame (r9 ADVICE): the
        only storage blocks after a full sweep are the single
        distributed_prefix pin (lazy localCheckpoint), never a second
        corpus-scan cache — repeated sweeps accumulate at most one
        GC-scoped pin each, not two."""
        from sparksearchengine_spark.operators.evaluate import pr_curve

        df = spark.createDataFrame(
            [(i % 2, (i % 7) / 7.0) for i in range(50)],
            "label int, score double",
        )
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        curve = pr_curve(df)
        assert curve.count() > 0
        # only the prefix pin (registered at plan build), never
        # pin + a second grouped cache
        assert jsc.getPersistentRDDs().size() <= before + 1

    def test_pr_curve_no_positives_null_not_zero(self, spark):
        """No positive labels: recall and f1 are NULL on every row —
        never a silent 0.0 (r9 review finding)."""
        from sparksearchengine_spark.operators.evaluate import pr_curve

        df = spark.createDataFrame(
            [(0, 0.3), (0, 0.7)], "label int, score double"
        )
        rows = pr_curve(df).collect()
        assert rows and all(
            r.recall is None and r.f1 is None for r in rows
        )

    def test_closes_the_classifier_loop(self, spark):
        """Integration: fit -> score -> evaluate on a separable corpus."""
        from sparksearchengine_spark.operators.classify import (
            classifier_fit,
            classifier_score,
        )

        rows = [(i, "good clean prose text", 1) for i in range(40)]
        rows += [(i + 100, "spam spam buy click", 0) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string, label int")
        w, bias, _hist = classifier_fit(df, label_col="label", dim=64, iters=8)
        scored = classifier_score(df, w, bias=bias).join(
            df.select(F.col("doc_id").alias("id"), "label"), "id"
        )
        r = classification_metrics(
            scored, label_col="label", score_col="score", threshold=0.0
        ).collect()[0]
        assert r.roc_auc == pytest.approx(1.0)
        assert r.f1 == pytest.approx(1.0)
