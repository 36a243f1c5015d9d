"""Curation pipeline composition (operators/pipeline.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.pipeline import (
    curate,
    curation_flags,
    curation_report,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),  # clean
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "tiny"),                                         # too short
        (4, "leaked eval passage word for word exactly"),    # contaminated
        (5, "another perfectly ordinary document here"),     # clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(
        [(90, "leaked eval passage word for word exactly")],
        "doc_id long, text string",
    )
    return docs, ev


class TestCurationFlags:
    def test_each_gate_fires(self, spark, corpus):
        docs, ev = corpus
        flags = {
            r["doc_id"]: r
            for r in curation_flags(
                docs, ev, min_tokens=2, ngram_n=3
            ).collect()
        }
        assert flags[1]["keep"] is True
        assert flags[2]["is_exact_dup"] is True and flags[2]["keep"] is False
        assert flags[2]["canon_id"] == 1
        assert flags[3]["quality_ok"] is False and flags[3]["keep"] is False
        assert flags[4]["contaminated"] is True and flags[4]["keep"] is False
        assert flags[5]["keep"] is True

    def test_no_eval_set_skips_decontam(self, spark, corpus):
        docs, _ = corpus
        flags = {
            r["doc_id"]: r
            for r in curation_flags(docs, None, min_tokens=2).collect()
        }
        assert flags[4]["contaminated"] is False and flags[4]["keep"] is True

    def test_curate_returns_original_schema(self, spark, corpus):
        docs, ev = corpus
        clean = curate(docs, ev, min_tokens=2, ngram_n=3)
        assert clean.columns == docs.columns
        assert {r["doc_id"] for r in clean.collect()} == {1, 5}

    def test_report_accounting(self, spark, corpus):
        docs, ev = corpus
        r = curation_report(docs, ev, min_tokens=2, ngram_n=3).collect()[0]
        assert r["n_docs"] == 5
        assert r["n_quality_fail"] == 1
        assert r["n_exact_dup"] == 1
        assert r["n_contaminated"] == 1
        assert r["n_kept"] == 2

    def test_single_composed_plan_one_text_scan_family(self, spark, corpus):
        # the composed plan must not materialize per stage: no
        # InMemoryTableScan / no more than the dedup+decontam exchanges
        docs, ev = corpus
        plan = curation_flags(docs, ev, ngram_n=3)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "InMemoryTableScan" not in plan


class TestNullTextAccounting:
    def test_null_text_doc_fails_quality_gate(self, spark):
        """r3 review: NULL text must FAIL the quality gate and be counted
        there — not vanish with a NULL keep from every report bucket."""
        from sparksearchengine_spark.operators.pipeline import (
            curation_flags, curation_report,
        )

        docs = spark.createDataFrame(
            [(1, "good doc text"), (2, None), (3, "another fine doc")],
            "doc_id long, text string",
        )
        flags = {r["doc_id"]: r for r in curation_flags(docs).collect()}
        assert flags[2]["quality_ok"] is False
        assert flags[2]["keep"] is False
        rep = curation_report(docs).collect()[0]
        assert rep["n_docs"] == 3
        assert rep["n_quality_fail"] == 1
        assert rep["n_kept"] == 2


class TestRuleSetGates:
    def test_gates_off_report_true(self, spark):
        from sparksearchengine_spark.operators.pipeline import curation_flags

        docs = spark.createDataFrame(
            [(1, "short doc")], "doc_id long, text string"
        )
        r = curation_flags(docs).collect()[0]
        assert r["gopher_ok"] is True and r["c4_ok"] is True

    def test_c4_gate_drops_punctuation_free_docs(self, spark):
        from sparksearchengine_spark.operators.pipeline import (
            curation_flags, curation_report,
        )

        five = ("One good sentence here. Two good sentences now. "
                "Three in a row! Four keeps going? Five closes it out.")
        docs = spark.createDataFrame(
            [(1, five), (2, "no punctuation no sentences just words")],
            "doc_id long, text string",
        )
        flags = {r["doc_id"]: r for r in curation_flags(docs, c4=True).collect()}
        assert flags[1]["c4_ok"] is True and flags[1]["keep"] is True
        assert flags[2]["c4_ok"] is False and flags[2]["keep"] is False
        rep = curation_report(docs, c4=True).collect()[0]
        assert rep["n_c4_fail"] == 1 and rep["n_kept"] == 1

    def test_gopher_gate_threshold_override(self, spark):
        from sparksearchengine_spark.operators.pipeline import curation_flags

        long_doc = " ".join(["steady data flows keep the engine busy"] * 8)
        docs = spark.createDataFrame(
            [(1, long_doc), (2, "way too short")],
            "doc_id long, text string",
        )
        flags = {
            r["doc_id"]: r
            for r in curation_flags(
                docs, gopher={"min_required_hits": 0}
            ).collect()
        }
        assert flags[1]["gopher_ok"] is True
        assert flags[2]["gopher_ok"] is False  # < 50 words

    def test_gates_add_no_exchanges(self, spark):
        # the rule gates are inlined scan-stage expressions: enabling
        # them must not add a single Exchange to the composed plan
        from sparksearchengine_spark.operators.pipeline import curation_flags

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        off = curation_flags(docs)._jdf.queryExecution().executedPlan().toString()
        on = curation_flags(
            docs, gopher=True, c4=True,
            classifier={"weights": [1, -1, 2, -2], "threshold": 0},
        )._jdf.queryExecution().executedPlan().toString()
        assert on.count("Exchange") == off.count("Exchange")

    def test_classifier_gate_drops_low_scores(self, spark):
        from sparksearchengine_spark.operators.classify import (
            hash_bucket_expr,  # noqa: F401 (documents the shared rule)
        )
        from sparksearchengine_spark.operators.pipeline import (
            curation_flags, curation_report,
        )

        import hashlib

        dim = 4

        def bucket(t):
            return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim

        # weights chosen so 'good' scores positive and 'bad' negative
        # (buckets 2 and 0 at dim=4 — distinct, no collision)
        weights = [0] * dim
        weights[bucket("good")] = 5
        weights[bucket("bad")] = -5
        docs = spark.createDataFrame(
            [(1, "good good"), (2, "bad bad bad")],
            "doc_id long, text string",
        )
        clf = {"weights": weights, "threshold": 1}
        flags = {
            r["doc_id"]: r
            for r in curation_flags(docs, classifier=clf).collect()
        }
        assert flags[1]["clf_ok"] is True
        assert flags[2]["clf_ok"] is False and flags[2]["keep"] is False
        rep = curation_report(docs, classifier=clf).collect()[0]
        assert rep["n_clf_fail"] == 1

    def test_trained_classifier_feeds_curation_gate(self, spark):
        """End-to-end fastText-style flow (VERDICT r5 #7): fit the
        hashed classifier on a labeled seed slice, feed the LEARNED
        weights into curation_flags' classifier gate, and the flags
        must agree with classifier_score at the same threshold."""
        from sparksearchengine_spark.operators.classify import (
            classifier_fit,
            classifier_score,
        )
        from sparksearchengine_spark.operators.pipeline import (
            curation_flags,
            curation_report,
        )

        rows = []
        for i in range(40):
            noise = f"the quick fox {i % 7}"
            if i % 2 == 0:
                rows.append((i, f"good great {noise}", 1))
            else:
                rows.append((i, f"bad awful {noise}", 0))
        labeled = spark.createDataFrame(
            rows, "doc_id long, text string, label int"
        ).coalesce(1)

        w, b, _ = classifier_fit(labeled, "label", dim=256, iters=15, lr=1.0)
        # score the (here: same) corpus through the pipeline gate with
        # the learned model, threshold at the decision boundary 0
        clf = {"weights": w, "bias": b, "threshold": 0}
        flags = {
            r["doc_id"]: r["clf_ok"]
            for r in curation_flags(
                labeled.select("doc_id", "text"), classifier=clf
            ).collect()
        }
        scored = {
            r["id"]: r["score"] > 0
            for r in classifier_score(labeled, w, bias=b).collect()
        }
        assert flags == scored
        # the trained gate separates the seed set: all positives kept
        labels = {i: lab for i, _, lab in rows}
        assert all(flags[i] == (labels[i] == 1) for i in flags)
        rep = curation_report(
            labeled.select("doc_id", "text"), classifier=clf
        ).collect()[0]
        assert rep["n_clf_fail"] == 20

    def test_empty_dict_enables_gate_with_defaults(self, spark):
        # gopher={} is 'enable with default thresholds', not 'off'
        from sparksearchengine_spark.operators.pipeline import curation_flags

        docs = spark.createDataFrame(
            [(1, "way too short")], "doc_id long, text string"
        )
        r = curation_flags(docs, gopher={}, c4={}).collect()[0]
        assert r["gopher_ok"] is False  # < 50 words fails the real gate
        assert r["c4_ok"] is False      # < 5 sentences

    def test_classifier_gate_off_reports_true(self, spark):
        from sparksearchengine_spark.operators.pipeline import (
            curation_flags, curation_report,
        )

        docs = spark.createDataFrame(
            [(1, "any text")], "doc_id long, text string"
        )
        assert curation_flags(docs).collect()[0]["clf_ok"] is True
        assert curation_report(docs).collect()[0]["n_clf_fail"] == 0


class TestReadabilityGate:
    def test_gate_matches_metrics_operator(self, spark, docs_df):
        from pyspark.sql import functions as F

        from sparksearchengine_spark.operators.pipeline import curation_flags
        from sparksearchengine_spark.operators.textstats import readability

        docs = docs_df.limit(100)
        flags = curation_flags(
            docs, readability={"min_flesch": 50.0}
        ).select("doc_id", "read_ok")
        want = readability(docs).select(
            "doc_id",
            (
                F.coalesce(F.col("flesch") >= 50.0, F.lit(False))
            ).alias("want_ok"),
        )
        j = flags.join(want, "doc_id").collect()
        assert len(j) == 100
        # rounding: readability() rounds flesch to 6dp, the gate uses the
        # unrounded value — equal verdicts except exactly-at-threshold
        # rows, which the synthetic corpus doesn't produce
        assert all(r.read_ok == r.want_ok for r in j)

    def test_disabled_gate_is_true_and_report_has_column(self, spark, docs_df):
        from sparksearchengine_spark.operators.pipeline import (
            curation_flags,
            curation_report,
        )

        docs = docs_df.limit(20)
        flags = curation_flags(docs)
        assert all(r.read_ok for r in flags.select("read_ok").collect())
        rep = curation_report(docs).collect()[0]
        assert rep["n_read_fail"] == 0

    def test_zero_word_docs_fail_enabled_gate(self, spark):
        from sparksearchengine_spark.operators.pipeline import curation_flags

        docs = spark.createDataFrame(
            [(1, ""), (2, None), (3, "a fine readable sentence.")],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r.read_ok
            for r in curation_flags(
                docs, readability={"min_flesch": 0.0}
            ).collect()
        }
        assert rows[1] is False and rows[2] is False and rows[3] is True
