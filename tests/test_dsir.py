"""DSIR importance resampling (operators/dsir.py): hashed n-gram
features, smoothed log-ratio table, per-doc weights, Gumbel-top-k
sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.dsir import (
    dsir_bucket_logratio,
    dsir_log_weights,
    dsir_sample,
    hashed_ngram_features,
)


@pytest.fixture(scope="module")
def raw_target(spark):
    raw = spark.createDataFrame(
        [
            (1, "apple banana apple banana"),
            (2, "zebra yak quagga wombat"),
            (3, "apple banana zebra"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(101, "apple banana"), (102, "banana apple apple")],
        "doc_id long, text string",
    )
    return raw, target


class TestFeatures:
    def test_unigrams_plus_bigrams_count(self, spark):
        df = spark.createDataFrame([("a b c",)], "text string")
        n = df.select(
            F.size(hashed_ngram_features(F.col("text"), dim=64)).alias("n")
        ).first()["n"]
        # 3 unigrams + 2 bigrams
        assert n == 5

    def test_single_token_no_bigram(self, spark):
        df = spark.createDataFrame([("hello",)], "text string")
        n = df.select(
            F.size(hashed_ngram_features(F.col("text"), dim=64)).alias("n")
        ).first()["n"]
        assert n == 1

    def test_empty_and_null_yield_empty(self, spark):
        df = spark.createDataFrame([("",), (None,)], "text string")
        ns = [
            r["n"]
            for r in df.select(
                F.size(hashed_ngram_features(F.col("text"), dim=64)).alias("n")
            ).collect()
        ]
        assert ns == [0, 0]

    def test_buckets_in_range(self, spark):
        df = spark.createDataFrame([("the quick brown fox",)], "text string")
        row = df.select(
            hashed_ngram_features(F.col("text"), dim=16).alias("f")
        ).first()["f"]
        assert all(0 <= b < 16 for b in row)


class TestLogWeights:
    def test_on_target_doc_outweighs_off_target(self, raw_target):
        raw, target = raw_target
        w = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_log_weights(raw, target, dim=256).collect()
        }
        # doc 1 is pure target vocabulary, doc 2 pure off-target,
        # doc 3 mixed
        assert w[1] > w[3] > w[2]

    def test_empty_docs_zero(self, raw_target):
        raw, target = raw_target
        rows = {
            r["doc_id"]: r
            for r in dsir_log_weights(raw, target, dim=256).collect()
        }
        for d in (4, 5):
            assert rows[d]["n_feats"] == 0
            assert rows[d]["log_weight"] == 0.0

    def test_reusable_logratio_table(self, raw_target):
        raw, target = raw_target
        table = dsir_bucket_logratio(raw, target, dim=256)
        a = dsir_log_weights(raw, target, dim=256, logratio_df=table)
        b = dsir_log_weights(raw, target, dim=256)
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_broadcast_join_in_plan(self, raw_target):
        raw, target = raw_target
        plan = (
            dsir_log_weights(raw, target, dim=256)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestGumbelSample:
    def test_deterministic_and_sized(self, raw_target):
        raw, target = raw_target
        w = dsir_log_weights(raw, target, dim=256)
        s1 = sorted(r["doc_id"] for r in dsir_sample(w, 3).collect())
        s2 = sorted(r["doc_id"] for r in dsir_sample(w, 3).collect())
        assert s1 == s2 and len(s1) == 3

    def test_low_temperature_recovers_argmax(self, raw_target):
        raw, target = raw_target
        w = dsir_log_weights(raw, target, dim=256)
        # temperature -> 0: weight dominates the Gumbel noise, so the
        # sample is exactly the top-n by weight
        top2 = {
            r["doc_id"]
            for r in w.orderBy(F.col("log_weight").desc()).limit(2).collect()
        }
        got = {
            r["doc_id"]
            for r in dsir_sample(w, 2, temperature=1e-9).collect()
        }
        assert got == top2

    def test_sample_key_column_added(self, raw_target):
        raw, target = raw_target
        w = dsir_log_weights(raw, target, dim=256)
        assert "sample_key" in dsir_sample(w, 2).columns


class TestUnseenBucketDefault:
    def test_novel_corpus_gets_smoothed_constant_not_zero(self, spark, raw_target):
        import math

        from sparksearchengine_spark.operators.dsir import (
            dsir_bucket_logratio,
            dsir_log_weights,
        )

        raw, target = raw_target
        dim = 256
        table = dsir_bucket_logratio(raw, target, dim=dim)
        # score a NEW corpus of entirely novel grams against the reused
        # table: every feature takes the unseen-bucket default...
        novel = spark.createDataFrame(
            [(900, "qqqxyzzy plugh")], "doc_id long, text string"
        )
        row = dsir_log_weights(
            novel, target, dim=dim, logratio_df=table
        ).first()
        # ...which is ln(a/denom_t) − ln(a/denom_r), NOT 0 (r3 review).
        # Here T_r > T_t so the constant is positive.
        sent = {
            r["bucket"]: r["log_ratio"] for r in table.collect()
        }
        default = sent[-1]
        assert default > 0
        # 3 features (2 unigrams + 1 bigram) x default — unless a novel
        # gram hash-collides into a seen bucket, which dim=256 makes
        # possible; assert the default is APPLIED (weight > 0), and
        # exactly when no collision occurred
        assert row["n_feats"] == 3
        assert row["log_weight"] > 0

    def test_sentinel_never_joins_as_a_bucket(self, raw_target):
        from sparksearchengine_spark.operators.dsir import (
            dsir_bucket_logratio,
            dsir_log_weights,
        )

        raw, target = raw_target
        table = dsir_bucket_logratio(raw, target, dim=256)
        with_table = dsir_log_weights(raw, target, dim=256, logratio_df=table)
        without = dsir_log_weights(raw, target, dim=256)
        assert sorted(map(tuple, with_table.collect())) == sorted(
            map(tuple, without.collect())
        )

    def test_temperature_guard(self, raw_target):
        import pytest as _pytest

        from sparksearchengine_spark.operators.dsir import (
            dsir_log_weights,
            dsir_sample,
        )

        raw, target = raw_target
        w = dsir_log_weights(raw, target, dim=64)
        with _pytest.raises(ValueError):
            dsir_sample(w, 2, temperature=0.0)
        with _pytest.raises(ValueError):
            dsir_sample(w, 2, temperature=-1.0)

    def test_repeated_fits_bound_feature_caches(self, raw_target):
        """A new fit auto-releases the previous fit's cache (stale caches
        are never reused) — repeated fits hold at most ONE cached
        exploded-feature frame (ADVICE r4)."""
        from sparksearchengine_spark.operators import dsir as dsir_mod
        from sparksearchengine_spark.operators.dsir import (
            dsir_log_weights,
            release_feature_caches,
        )

        raw, target = raw_target
        release_feature_caches()
        for _ in range(3):
            dsir_log_weights(raw, target, dim=64).collect()
        assert len(dsir_mod._feature_caches) == 1
        release_feature_caches()
        assert len(dsir_mod._feature_caches) == 0
