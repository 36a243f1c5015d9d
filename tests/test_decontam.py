"""Decontamination + vocab/unigram-LM operators (operators/decontam.py).

Hand-computed corpora; join-strategy paths (broadcast vs shuffle-hash)
asserted result-equal and plan-shape-checked like the search-side tests.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.decontam import (
    ngram_decontaminate,
    unigram_logprob,
    vocab_stats,
)


@pytest.fixture(scope="module")
def train_eval(spark):
    # eval doc 100 is "alpha beta gamma delta"; train doc 1 copies a
    # 3-gram of it verbatim, doc 2 shares nothing, doc 3 is a full copy.
    train = spark.createDataFrame(
        [
            (1, "x alpha beta gamma y"),
            (2, "totally unrelated words here"),
            (3, "alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    return train, ev


class TestDecontaminate:
    def test_hits_and_misses(self, spark, train_eval):
        train, ev = train_eval
        rows = {
            r["doc_id"]: r
            for r in ngram_decontaminate(train, ev, n=3).collect()
        }
        # doc 1 tokens: x alpha beta gamma y -> 3-grams:
        #   "x alpha beta", "alpha beta gamma", "beta gamma y"
        # eval 3-grams: "alpha beta gamma", "beta gamma delta"
        assert rows[1]["n_grams"] == 3
        assert rows[1]["n_hit_grams"] == 1
        assert rows[1]["contaminated"] is True
        assert rows[2]["n_hit_grams"] == 0
        assert rows[2]["contaminated"] is False
        assert rows[3]["n_hit_grams"] == 2
        assert rows[3]["contaminated"] is True

    def test_zero_hit_docs_survive_left_join(self, spark, train_eval):
        train, ev = train_eval
        out = ngram_decontaminate(train, ev, n=3)
        assert out.count() == train.count()

    def test_min_hit_threshold(self, spark, train_eval):
        train, ev = train_eval
        rows = {
            r["doc_id"]: r["contaminated"]
            for r in ngram_decontaminate(
                train, ev, n=3, min_hit_grams=2
            ).collect()
        }
        assert rows[1] is False  # one shared gram < threshold
        assert rows[3] is True

    def test_short_doc_whole_gram(self, spark):
        # < n tokens: whole doc is the single gram (dedup.token_ngrams
        # contract) so exact short-doc copies are still caught.
        train = spark.createDataFrame(
            [(1, "tiny doc")], "doc_id long, text string"
        )
        ev = spark.createDataFrame(
            [(9, "tiny doc")], "doc_id long, text string"
        )
        r = ngram_decontaminate(train, ev, n=8).collect()[0]
        assert r["n_grams"] == 1 and r["contaminated"] is True

    def test_shuffle_path_equals_broadcast_path(self, spark, train_eval):
        train, ev = train_eval
        a = sorted(
            map(tuple, ngram_decontaminate(
                train, ev, n=3, broadcast_eval=True
            ).collect())
        )
        b = sorted(
            map(tuple, ngram_decontaminate(
                train, ev, n=3, broadcast_eval=False
            ).collect())
        )
        assert a == b

    def test_broadcast_plan_shape(self, spark, train_eval):
        train, ev = train_eval
        plan = ngram_decontaminate(
            train, ev, n=3, broadcast_eval=True
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        noplan = ngram_decontaminate(
            train, ev, n=3, broadcast_eval=False
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in noplan


class TestVocabStats:
    def test_counts_ranks_coverage(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a"), (2, "a c")], "doc_id long, text string"
        )
        rows = {r["term"]: r for r in vocab_stats(df).collect()}
        # tf: a=3, b=1, c=1 (total 5); df: a=2, b=1, c=1
        assert rows["a"]["tf"] == 3 and rows["a"]["df_t"] == 2
        assert rows["a"]["rank"] == 1
        # tiebreak (tf desc, term asc): b before c
        assert rows["b"]["rank"] == 2 and rows["c"]["rank"] == 3
        assert rows["a"]["cum_frac"] == pytest.approx(3 / 5)
        assert rows["c"]["cum_frac"] == pytest.approx(1.0)

    def test_top_k_bounds_output_not_ranks(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a"), (2, "a c")], "doc_id long, text string"
        )
        out = vocab_stats(df, top_k=2).collect()
        assert {r["term"] for r in out} == {"a", "b"}
        # cum_frac still computed against the FULL token total
        assert max(r["cum_frac"] for r in out) < 1.0


class TestUnigramLogprob:
    def test_hand_computed_nll(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a"), (2, "a c")], "doc_id long, text string"
        )
        # p: a=3/5, b=1/5, c=1/5
        rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
        pa, pb, pc = 3 / 5, 1 / 5, 1 / 5
        want1 = -(math.log(pa) + math.log(pb) + math.log(pa)) / 3
        want2 = -(math.log(pa) + math.log(pc)) / 2
        assert rows[1]["n_tokens"] == 3
        assert rows[1]["avg_nll"] == pytest.approx(want1)
        assert rows[2]["avg_nll"] == pytest.approx(want2)

    def test_empty_doc_zero_not_null(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, "")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
        assert rows[2]["n_tokens"] == 0
        assert rows[2]["avg_nll"] == 0.0

    def test_foreign_freq_oov_floor(self, spark):
        df = spark.createDataFrame(
            [(1, "a zzz")], "doc_id long, text string"
        )
        freq = spark.createDataFrame([("a", 4)], "term string, tf long")
        r = unigram_logprob(df, freq_df=freq).collect()[0]
        # p(a)=4/4=1.0, p(zzz)=floor=1/5
        want = -(math.log(1.0) + math.log(1 / 5)) / 2
        assert r["avg_nll"] == pytest.approx(want)

    def test_row_count_preserved(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        assert unigram_logprob(docs).count() == docs.count()


class TestCollocations:
    def test_hand_computed_pmi(self, spark):
        from sparksearchengine_spark.operators.decontam import collocations

        # "new york" always adjacent; "the the" never occurs
        df = spark.createDataFrame(
            [
                (1, "new york new york city"),
                (2, "the big city the big apple"),
            ],
            "doc_id long, text string",
        )
        rows = {
            (r["term_a"], r["term_b"]): r
            for r in collocations(df, min_count=2).collect()
        }
        import math

        # tokens: doc1 = 5, doc2 = 6 -> N=11; bigrams M = 4 + 5 = 9
        # "new york": n_ab=2, n_new=2, n_york=2
        got = rows[("new", "york")]
        want = math.log((2 / 9) / ((2 / 11) * (2 / 11)))
        assert got["n_ab"] == 2
        assert abs(got["pmi"] - want) < 1e-12
        # min_count filters singletons
        assert ("york", "new") not in rows  # occurs once only
        assert ("the", "big") in rows       # occurs twice

    def test_single_token_docs_no_bigrams(self, spark):
        from sparksearchengine_spark.operators.decontam import collocations

        df = spark.createDataFrame(
            [(1, "solo"), (2, ""), (3, None)], "doc_id long, text string"
        )
        assert collocations(df, min_count=1).count() == 0

    def test_top_k_deterministic(self, spark):
        from sparksearchengine_spark.operators.decontam import collocations

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = [tuple(r) for r in collocations(docs, min_count=5, top_k=10).collect()]
        b = [tuple(r) for r in collocations(docs, min_count=5, top_k=10).collect()]
        assert a == b and len(a) == 10


class TestBigramLogprob:
    def test_hand_computed(self, spark):
        import math

        from sparksearchengine_spark.operators.decontam import (
            bigram_logprob,
        )

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "x"), (3, None), (4, "a a a a")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
            for r in bigram_logprob(df).collect()
        }
        # corpus: c(a,b)=2 c(b,a)=1 c(a,a)=3; c(a,*)=5 c(b,*)=1
        d1 = (-math.log(2 / 5) + -math.log(1 / 1) + -math.log(2 / 5)) / 3
        d4 = -math.log(3 / 5)
        import pytest as _pytest

        assert got[1] == (3, _pytest.approx(d1))
        assert got[2] == (0, 0.0)   # 1 token -> no bigrams
        assert got[3] == (0, 0.0)   # NULL text
        assert got[4] == (3, _pytest.approx(d4))

    def test_common_bigrams_score_lower_than_rare(self, spark):
        from sparksearchengine_spark.operators.decontam import (
            bigram_logprob,
        )

        # corpus: 'a b' dominates the a-conditional, 'a c' is the rare
        # continuation -> doc of common pairs scores below doc of rare
        rows = [(i, "a b") for i in range(1, 10)] + [(10, "a c")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["avg_nll"] for r in bigram_logprob(df).collect()}
        import math

        assert got[1] == __import__("pytest").approx(-math.log(9 / 10))
        assert got[10] == __import__("pytest").approx(-math.log(1 / 10))
        assert got[1] < got[10]


class TestEmbeddingDecontam:
    """Embedding-space decontamination (r4): cosine >= threshold vs any
    eval doc flags a train doc; the paraphrase-robust complement of the
    n-gram pass."""

    def _frames(self, spark):
        train = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),     # identical to eval 100 -> flagged
                (2, [0.0, 1.0]),     # orthogonal to both evals -> kept
                (3, [0.9, 0.1]),     # cos vs eval 100 ~= 0.9939 -> flagged
                (4, [0.0, 0.0]),     # zero norm -> NULL cosines, kept
                (5, None),           # NULL vector -> NULL cosines, kept
            ],
            "doc_id long, embedding array<double>",
        )
        ev = spark.createDataFrame(
            [(100, [1.0, 0.0]), (101, [-1.0, 0.0])],
            "eval_id long, embedding array<double>",
        )
        return train, ev

    def test_hand_computed_verdicts(self, spark):
        from sparksearchengine_spark.operators.decontam import (
            embedding_decontam,
        )

        train, ev = self._frames(spark)
        got = {
            r["id"]: (r["max_cos"], r["n_contaminated"], r["keep"])
            for r in embedding_decontam(train, ev, threshold=0.95).collect()
        }
        assert set(got) == {1, 2, 3, 4, 5}  # every train row survives
        assert got[1] == (1.0, 1, False)
        assert got[2] == (0.0, 0, True)
        mc, n, keep = got[3]
        assert mc == pytest.approx(0.993884, abs=1e-6)
        assert (n, keep) == (1, False)
        assert got[4] == (None, 0, True)
        assert got[5] == (None, 0, True)

    def test_empty_eval_keeps_everything(self, spark):
        from sparksearchengine_spark.operators.decontam import (
            embedding_decontam,
        )

        train, ev = self._frames(spark)
        got = embedding_decontam(
            train, ev.where(F.lit(False)), threshold=0.5
        ).collect()
        assert len(got) == 5
        assert all(r["keep"] and r["max_cos"] is None for r in got)

    def test_oversized_eval_raises(self, spark):
        from sparksearchengine_spark.operators.decontam import (
            embedding_decontam,
        )

        train, ev = self._frames(spark)
        with pytest.raises(ValueError, match="lsh_cosine_topk"):
            embedding_decontam(train, ev, max_eval_rows=1)

    def test_eval_side_is_broadcast(self, spark):
        """The corpus must stream: the only join is a broadcast
        nested-loop, no Exchange before the id-keyed aggregation."""
        from sparksearchengine_spark.operators.decontam import (
            embedding_decontam,
        )

        train, ev = self._frames(spark)
        plan = embedding_decontam(train, ev)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan


class TestBloomDecontam:
    """Bloom-filter decontamination (r5): the join-free scale path of
    ngram_decontaminate. The filter is one-sided — it can only ADD
    hits (false positives), never miss a true one — and at the default
    sizing (32 bits/gram, k=16, per-gram fpp ~3e-7) it agrees with the
    exact join bitwise on realistic corpora."""

    def test_never_misses_and_matches_exact_join(self, spark, train_eval):
        from sparksearchengine_spark.operators.decontam import (
            bloom_decontaminate,
            bloom_gram_filter,
            ngram_decontaminate,
        )

        train, ev = train_eval
        bloom = bloom_gram_filter(ev, n=3)
        got = {
            r["doc_id"]: (r["n_grams"], r["n_hit_grams"], r["contaminated"])
            for r in bloom_decontaminate(train, bloom).collect()
        }
        want = {
            r["doc_id"]: (r["n_grams"], r["n_hit_grams"], r["contaminated"])
            for r in ngram_decontaminate(train, ev, n=3).collect()
        }
        assert set(got) == set(want)
        # one-sided: never fewer hits than the exact join
        for k in want:
            assert got[k][1] >= want[k][1]
        # at this sizing on this corpus: exact agreement
        assert got == want

    def test_fpp_and_sizing(self, spark, train_eval):
        from sparksearchengine_spark.operators.decontam import (
            bloom_gram_filter,
        )

        _, ev = train_eval
        b = bloom_gram_filter(ev, n=3, bits_per_gram=32, k=16)
        assert b.n_bits % 64 == 0
        assert len(b.words) == b.n_bits // 64
        assert b.n_grams == 2  # "alpha beta gamma", "beta gamma delta"
        assert 0 < b.fpp() < 1e-5
        # every word fits signed 64-bit (Spark LongType)
        assert all(-(1 << 63) <= w < (1 << 63) for w in b.words)
        # build is deterministic
        assert b == bloom_gram_filter(ev, n=3, bits_per_gram=32, k=16)

    def test_empty_eval_set_flags_nothing(self, spark, train_eval):
        from sparksearchengine_spark.operators.decontam import (
            bloom_decontaminate,
            bloom_gram_filter,
        )

        train, ev = train_eval
        empty = ev.where("doc_id < 0")
        b = bloom_gram_filter(empty, n=3)
        assert b.n_grams == 0 and b.fpp() == 0.0
        res = bloom_decontaminate(train, b).collect()
        assert len(res) == 3
        assert all(not r["contaminated"] for r in res)
        assert all(r["n_hit_grams"] == 0 for r in res)

    def test_eval_cap_raises(self, spark, train_eval):
        from sparksearchengine_spark.operators.decontam import (
            bloom_gram_filter,
        )

        _, ev = train_eval
        with pytest.raises(ValueError, match="max_eval_grams"):
            bloom_gram_filter(ev, n=3, max_eval_grams=1)

    def test_executor_pack_bit_identical_to_driver_reference(
        self, spark, train_eval, monkeypatch
    ):
        """The distributed bitset pack (r6: above DRIVER_PACK_MAX_GRAMS
        grams hash + bit_or on the executors, only packed words reach
        the driver) must reproduce the driver-side Python loop bit for
        bit. Forced onto the executor path by zeroing the threshold."""
        import hashlib

        from sparksearchengine_spark.operators import decontam as dmod

        monkeypatch.setattr(dmod, "DRIVER_PACK_MAX_GRAMS", 0)

        from pyspark.sql import functions as F

        from sparksearchengine_spark.functions.analyzers import (
            analyzer_expr,
        )
        from sparksearchengine_spark.operators.dedup import token_ngrams
        from sparksearchengine_spark.operators.decontam import (
            bloom_gram_filter,
        )

        _, ev = train_eval
        b = bloom_gram_filter(ev, n=3, bits_per_gram=32, k=16)
        grams = [
            r["gram"]
            for r in ev.select(
                F.explode(
                    token_ngrams(analyzer_expr(F.col("text"), "simple"), 3)
                ).alias("gram")
            )
            .distinct()
            .collect()
        ]
        assert b.n_grams == len(grams) > 0
        m = b.n_bits
        words = [0] * (m // 64)
        for g in grams:
            hx = hashlib.md5(g.encode()).hexdigest()
            h1, h2 = int(hx[:8], 16) % m, (int(hx[8:16], 16) % m) | 1
            for i in range(16):
                h = (h1 + i * h2) % m
                words[h // 64] |= 1 << (h % 64)
        signed = tuple(
            w - (1 << 64) if w >= (1 << 63) else w for w in words
        )
        assert b.words == signed

    def test_min_hit_grams_threshold(self, spark, train_eval):
        from sparksearchengine_spark.operators.decontam import (
            bloom_decontaminate,
            bloom_gram_filter,
        )

        train, ev = train_eval
        b = bloom_gram_filter(ev, n=3)
        got = {
            r["doc_id"]: r["contaminated"]
            for r in bloom_decontaminate(
                train, b, min_hit_grams=2
            ).collect()
        }
        # doc 1 shares ONE 3-gram -> below threshold; doc 3 shares both
        assert got == {1: False, 2: False, 3: True}


class TestPerplexityBuckets:
    """CCNet head/middle/tail bucketing (decontam.py::perplexity_buckets)."""

    @pytest.fixture(scope="class")
    def scored(self, spark):
        # 24 docs, nll == doc_id, three groups incl. a NULL group of 6
        rows = [
            (i, float(i), "a" if i < 12 else ("b" if i < 18 else None))
            for i in range(24)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, nll double, lang string"
        )

    def test_exact_proportions_per_group(self, scored):
        from sparksearchengine_spark.operators.decontam import (
            perplexity_buckets,
        )

        out = perplexity_buckets(
            scored, ppl_col="nll", group_col="lang", exact=True
        )
        counts = {
            (r["lang"], r["bucket"]): r["count"]
            for r in out.groupBy("lang", "bucket").count().collect()
        }
        # 12/6/6 per group, thirds each — incl. the NULL group
        for g, n in ((None, 2), ("a", 4), ("b", 2)):
            for b in ("head", "middle", "tail"):
                assert counts[(g, b)] == n

    def test_head_is_lowest_perplexity(self, scored):
        from sparksearchengine_spark.operators.decontam import (
            perplexity_buckets,
        )

        out = perplexity_buckets(
            scored, ppl_col="nll", group_col="lang", exact=True
        ).collect()
        by_doc = {r["doc_id"]: r["bucket"] for r in out}
        # group a = docs 0..11 ascending nll: 0-3 head, 4-7 middle, 8-11 tail
        assert [by_doc[i] for i in (0, 4, 8)] == ["head", "middle", "tail"]

    def test_approx_matches_exact_on_distinct_values(self, scored):
        from sparksearchengine_spark.operators.decontam import (
            perplexity_buckets,
        )

        ex = {
            r["doc_id"]: r["bucket"]
            for r in perplexity_buckets(
                scored, ppl_col="nll", group_col="lang", exact=True
            ).collect()
        }
        ap = {
            r["doc_id"]: r["bucket"]
            for r in perplexity_buckets(
                scored, ppl_col="nll", group_col="lang"
            ).collect()
        }
        # all-distinct values, exact sketch at this size: identical
        assert ap == ex
        # and no rows were dropped (NULL group rides the null-safe join)
        assert len(ap) == 24

    def test_ungrouped_and_tie_sharing(self, spark):
        from sparksearchengine_spark.operators.decontam import (
            perplexity_buckets,
        )

        df = spark.createDataFrame(
            [(i, 1.0 if i < 6 else 9.0) for i in range(9)],
            "doc_id long, nll double",
        )
        out = perplexity_buckets(df, ppl_col="nll", exact=True).collect()
        buckets = {r["doc_id"]: r["bucket"] for r in out}
        # 6 tied lows share percent_rank 0 -> all head; 3 highs -> tail
        assert all(buckets[i] == "head" for i in range(6))
        assert all(buckets[i] == "tail" for i in range(6, 9))

    def test_null_score_raises(self, spark):
        from sparksearchengine_spark.operators.decontam import (
            perplexity_buckets,
        )

        df = spark.createDataFrame(
            [(1, None), (2, 2.0)], "doc_id long, nll double"
        )
        for exact in (False, True):
            with pytest.raises(Exception, match="NULL"):
                perplexity_buckets(
                    df, ppl_col="nll", exact=exact
                ).collect()

    def test_bad_cuts_raise(self, scored):
        from sparksearchengine_spark.operators.decontam import (
            perplexity_buckets,
        )

        for cuts in ((0.5, 0.4), (0.0, 0.5), (0.3, 1.0)):
            with pytest.raises(ValueError, match="cuts"):
                perplexity_buckets(scored, ppl_col="nll", cuts=cuts)

    def test_approx_plan_has_no_sort(self, scored):
        from sparksearchengine_spark.operators.decontam import (
            perplexity_buckets,
        )

        plan = perplexity_buckets(
            scored, ppl_col="nll", group_col="lang"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Sort" not in plan  # sketch agg + broadcast join, no sort
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


class TestBloomUnion:
    def test_union_equals_joint_build(self, spark):
        from sparksearchengine_spark.operators.decontam import (
            bloom_decontaminate,
            bloom_gram_filter,
        )

        a = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        b = spark.createDataFrame(
            [(2, "one two three four five six seven eight")],
            "doc_id long, text string",
        )
        both = a.unionByName(b)
        # shard filters must pin n_bits to the UNION's size — the
        # default sizes by the shard's own gram count
        f_joint = bloom_gram_filter(both, n=4)
        m = f_joint.n_bits
        f_union = bloom_gram_filter(a, n=4, n_bits=m).union(
            bloom_gram_filter(b, n=4, n_bits=m)
        )
        # identical params + same inserted grams -> identical bitset
        assert f_union.words == f_joint.words
        assert f_union.n_grams == f_joint.n_grams
        # and identical verdicts on a probe corpus
        train = spark.createDataFrame(
            [
                (10, "alpha beta gamma delta epsilon zeta eta theta x"),
                (11, "totally different words that never overlap here"),
                (12, "one two three four five six seven eight y"),
            ],
            "doc_id long, text string",
        )
        vu = {
            r["doc_id"]: r["contaminated"]
            for r in bloom_decontaminate(train, f_union).collect()
        }
        assert vu == {10: True, 11: False, 12: True}

    def test_union_rejects_mismatched_params(self, spark):
        from sparksearchengine_spark.operators.decontam import (
            bloom_gram_filter,
        )

        df = spark.createDataFrame(
            [(1, "a b c d e f g h")], "doc_id long, text string"
        )
        f1 = bloom_gram_filter(df, n=4)
        f2 = bloom_gram_filter(df, n=3)
        with pytest.raises(ValueError, match="parameter mismatch"):
            f1.union(f2)
