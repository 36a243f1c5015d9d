"""BM25/TF-IDF scoring vs hand-computed values on the tiny corpus.

Corpus stats: N=3, avgdl=3; doc1=[a,b,a] dl=3, doc2=[a,c] dl=2,
doc3=[b,b,c,c] dl=4; df(a)=df(b)=df(c)=2.
"""

from __future__ import annotations

import math

import pytest

from sparksearchengine_spark.plans.ast import Q

K1, B = 1.2, 0.75


def bm25(tf, dl, df, n=3, avgdl=3.0, k1=K1, b=B):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def scores(index, q):
    return {r["doc_id"]: r["score"] for r in index.compile(q).collect()}


def test_bm25_single_term(tiny_index):
    got = scores(tiny_index, Q.field("text").match_term("a"))
    assert got[1] == pytest.approx(bm25(tf=2, dl=3, df=2))
    assert got[2] == pytest.approx(bm25(tf=1, dl=2, df=2))


def test_bm25_multi_term_sums(tiny_index):
    got = scores(tiny_index, Q.field("text").match_any("b", "c"))
    assert got[3] == pytest.approx(
        bm25(tf=2, dl=4, df=2) + bm25(tf=2, dl=4, df=2)
    )
    assert got[1] == pytest.approx(bm25(tf=1, dl=3, df=2))
    assert got[2] == pytest.approx(bm25(tf=1, dl=2, df=2))


def test_index_fieldstats(tiny_index):
    fs = tiny_index.fieldstats["text"]
    assert fs.doc_count == 3
    assert fs.avgdl == pytest.approx(3.0)


def test_idf_formula_matches(tiny_index):
    import pyspark.sql.functions as F

    rows = tiny_index.term_idfs().where(F.col("term") == "a").collect()
    assert len(rows) == 1
    assert rows[0]["idf"] == pytest.approx(math.log(1.0 + 1.5 / 2.5))


def test_tfidf_scorer(tiny_corpus):
    from sparksearchengine_spark import Corpus, TextOptions
    from sparksearchengine_spark.functions.scoring import ScoringConfig

    idx = Corpus(
        tiny_corpus, id_col="doc_id", text_cols={"text": TextOptions()}
    ).build_index(scoring=ScoringConfig(similarity="tfidf"))
    got = scores(idx, Q.field("text").match_term("a"))
    idf = math.log(1.0 + 1.5 / 2.5)
    assert got[1] == pytest.approx(math.sqrt(2.0) * idf**2)
    assert got[2] == pytest.approx(math.sqrt(1.0) * idf**2)


def test_configurable_k1_b(tiny_corpus):
    from sparksearchengine_spark import Corpus, TextOptions
    from sparksearchengine_spark.functions.scoring import ScoringConfig

    idx = Corpus(
        tiny_corpus, id_col="doc_id", text_cols={"text": TextOptions()}
    ).build_index(scoring=ScoringConfig(k1=2.0, b=0.5))
    got = scores(idx, Q.field("text").match_term("a"))
    assert got[1] == pytest.approx(bm25(tf=2, dl=3, df=2, k1=2.0, b=0.5))


def test_custom_scorer_registry(tiny_corpus):
    from sparksearchengine_spark import Corpus, TextOptions
    from sparksearchengine_spark.functions.scoring import (
        ScoringConfig,
        register_scorer,
    )
    import pyspark.sql.functions as F

    register_scorer("const7", lambda tf, dl, df_t, n, avgdl: F.lit(7.0))
    idx = Corpus(
        tiny_corpus, id_col="doc_id", text_cols={"text": TextOptions()}
    ).build_index(scoring=ScoringConfig(similarity="const7"))
    got = scores(idx, Q.field("text").match_term("a"))
    assert got == {1: 7.0, 2: 7.0}


class TestExplainScore:
    def test_breakdown_sums_to_search_score(self, spark, tiny_index):
        from sparksearchengine_spark import Q
        from pyspark.sql import functions as F

        q = Q.field("text").match_any("a", "b")
        hits = {r["doc_id"]: r["score"]
                for r in tiny_index.search(q, k=10).collect()}
        for doc_id, score in hits.items():
            rows = tiny_index.explain_score(q, doc_id).collect()
            total = sum(r["boost"] * r["tscore"] for r in rows)
            assert abs(total - score) < 1e-12
            assert all(r["tf"] >= 1 and r["df_t"] >= 1 for r in rows)

    def test_boost_multiplies_contribution(self, spark, tiny_index):
        from sparksearchengine_spark import Q
        from sparksearchengine_spark.plans import ast

        base = Q.field("text").match_term("a")
        boosted = ast.Boost(base, 2.0)
        r1 = tiny_index.explain_score(base, 1).collect()[0]
        r2 = tiny_index.explain_score(boosted, 1).collect()[0]
        assert r2["boost"] == 2.0 and r1["boost"] == 1.0
        assert r1["tscore"] == r2["tscore"]

    def test_not_branch_contributes_nothing(self, spark, tiny_index):
        from sparksearchengine_spark import Q

        q = Q.field("text").match_term("a") & ~Q.field("text").match_term("b")
        rows = tiny_index.explain_score(q, 2).collect()
        assert {r["term"] for r in rows} == {"a"}

    def test_unmatched_doc_empty(self, spark, tiny_index):
        from sparksearchengine_spark import Q

        q = Q.field("text").match_term("a")
        # doc 3 = [b, b, c, c] has no 'a'
        assert tiny_index.explain_score(q, 3).count() == 0


class TestExplainSiblingDuplicates:
    def test_sum_matches_search_with_repeated_term_across_subtrees(
        self, tiny_index
    ):
        """r3 review: a term reached through two sibling subtrees scores
        twice in the compiler's union-sum; explain must keep both leaves
        so sum(boost*tscore) equals the search() score exactly."""
        from pyspark.sql import functions as F

        q = Q.field("text").match_term("a") | Q.field("text").match_any(
            "a", "b"
        )
        hits = {
            r["doc_id"]: r["score"]
            for r in tiny_index.compile(q).collect()
        }
        rows = tiny_index.explain_score(q, 1).collect()
        total = sum(r["boost"] * r["tscore"] for r in rows)
        assert total == pytest.approx(hits[1])
        # 'a' appears as TWO leaves (one per subtree), 'b' as one
        assert sorted(r["term"] for r in rows) == ["a", "a", "b"]


class TestDecayExpr:
    def _vals(self, spark, kind, **kw):
        from pyspark.sql import functions as F

        from sparksearchengine_spark.functions.scoring import decay_expr

        df = spark.createDataFrame(
            [(0.0,), (5.0,), (10.0,), (20.0,), (None,)], "age double"
        )
        return {
            r.age: r.m
            for r in df.select(
                "age", decay_expr(F.col("age"), 10.0, kind=kind, **kw).alias("m")
            ).collect()
        }

    def test_half_life_at_scale(self, spark):
        for kind in ("exp", "gauss", "linear"):
            vals = self._vals(spark, kind)
            assert vals[0.0] == pytest.approx(1.0)
            assert vals[10.0] == pytest.approx(0.5)  # age == scale -> decay
            assert vals[None] is None

    def test_shapes_differ_correctly(self, spark):
        e = self._vals(spark, "exp")
        g = self._vals(spark, "gauss")
        l = self._vals(spark, "linear")
        # gauss decays slower than exp before scale, faster after
        assert g[5.0] > e[5.0] and g[20.0] < e[20.0]
        # linear hits exactly zero at the far end
        assert l[20.0] == 0.0 and e[20.0] > 0.0

    def test_offset_grace_period(self, spark):
        vals = self._vals(spark, "exp", offset=5.0)
        assert vals[0.0] == 1.0 and vals[5.0] == 1.0
        assert vals[10.0] == pytest.approx(0.5 ** 0.5)

    def test_bad_args(self, spark):
        from pyspark.sql import functions as F

        from sparksearchengine_spark.functions.scoring import decay_expr

        with pytest.raises(ValueError, match="kind"):
            decay_expr(F.col("x"), 1.0, kind="step")
        with pytest.raises(ValueError, match="scale"):
            decay_expr(F.col("x"), 0.0)
        with pytest.raises(ValueError, match="decay"):
            decay_expr(F.col("x"), 1.0, decay=1.5)


class TestLMSimilarities:
    """LM-Dirichlet / LM-Jelinek-Mercer (Lucene LMDirichletSimilarity /
    LMJelinekMercerSimilarity; the reference can configure any Lucene
    Similarity — `LuceneConfig.scala:131-144`).

    Tiny-corpus collection stats: total tokens = 9,
    cf(a)=3, cf(b)=3, cf(c)=3; p(t|C) = (cf+1)/(9+1) = 0.4 for all.
    """

    @staticmethod
    def _lmd(tf, dl, cf, tot=9.0, mu=2000.0):
        p = (cf + 1.0) / (tot + 1.0)
        s = math.log(1.0 + tf / (mu * p)) + math.log(mu / (dl + mu))
        return max(s, 0.0)

    @staticmethod
    def _lmjm(tf, dl, cf, tot=9.0, lam=0.7):
        p = (cf + 1.0) / (tot + 1.0)
        return math.log(1.0 + ((1.0 - lam) * tf / dl) / (lam * p))

    def _index(self, tiny_corpus, **scoring_kw):
        from sparksearchengine_spark import Corpus, TextOptions
        from sparksearchengine_spark.functions.scoring import ScoringConfig

        return Corpus(
            tiny_corpus, id_col="doc_id", text_cols={"text": TextOptions()}
        ).build_index(scoring=ScoringConfig(**scoring_kw))

    def test_lmd_values(self, tiny_corpus):
        idx = self._index(tiny_corpus, similarity="lmd")
        got = scores(idx, Q.field("text").match_term("a"))
        assert got[1] == pytest.approx(self._lmd(tf=2, dl=3, cf=3), abs=1e-12)
        assert got[2] == pytest.approx(self._lmd(tf=1, dl=2, cf=3), abs=1e-12)
        idx.unpersist()

    def test_lmd_multi_term_sums(self, tiny_corpus):
        idx = self._index(tiny_corpus, similarity="lmd", mu=50.0)
        got = scores(idx, Q.field("text").match_any("b", "c"))
        assert got[3] == pytest.approx(
            self._lmd(2, 4, 3, mu=50.0) + self._lmd(2, 4, 3, mu=50.0),
            abs=1e-12,
        )
        idx.unpersist()

    def test_lmjm_values(self, tiny_corpus):
        idx = self._index(tiny_corpus, similarity="lmjm", lam=0.5)
        got = scores(idx, Q.field("text").match_any("a", "c"))
        assert got[2] == pytest.approx(
            self._lmjm(1, 2, 3, lam=0.5) + self._lmjm(1, 2, 3, lam=0.5),
            abs=1e-12,
        )
        idx.unpersist()

    def test_lmd_clamps_negative_to_zero(self, spark):
        # overwhelmingly common term + long doc: raw score is negative,
        # Lucene clamps at 0 — so do we
        from pyspark.sql import functions as F

        from sparksearchengine_spark.functions.scoring import lmd_term_score

        row = spark.range(1).select(
            lmd_term_score(
                F.lit(1.0), F.lit(100.0), F.lit(1e6), 1e6, mu=2000.0
            ).alias("s")
        ).collect()[0]
        assert row["s"] == 0.0

    def test_phrase_path_scores_with_lm(self, tiny_corpus):
        # phrases compile through plans/compiler._scored_postings — the
        # second cf_t join site
        idx = self._index(tiny_corpus, similarity="lmjm")
        got = scores(idx, Q.field("text").match_phrase("b a"))
        assert set(got) == {1}
        assert got[1] == pytest.approx(
            self._lmjm(2, 3, 3) + self._lmjm(1, 3, 3), abs=1e-12
        )
        idx.unpersist()

    def test_explain_matches_search_and_nulls_decomposition(
        self, tiny_corpus
    ):
        idx = self._index(tiny_corpus, similarity="lmd", mu=50.0)
        q = Q.field("text").match_any("a", "b")
        hits = {r["doc_id"]: r["score"]
                for r in idx.search(q, k=10).collect()}
        rows = idx.explain(q).collect()
        assert rows, "explain returned nothing"
        for r in rows:
            assert r["idf"] is None and r["tf_norm"] is None
            assert r["score"] == pytest.approx(hits[r["doc_id"]], abs=1e-12)
        idx.unpersist()

    def test_save_load_keeps_lm_config(self, tiny_corpus, tmp_path):
        from sparksearchengine_spark.operators.index import SearchIndex

        idx = self._index(tiny_corpus, similarity="lmd", mu=123.0)
        path = str(tmp_path / "lmidx")
        idx.save(path, stored_cols=["text"])
        loaded = SearchIndex.load(tiny_corpus.sparkSession, path)
        assert loaded.scoring == idx.scoring
        a = scores(idx, Q.field("text").match_term("a"))
        b = scores(loaded, Q.field("text").match_term("a"))
        assert a == b
        idx.unpersist()
        loaded.unpersist()

    def test_needs_cf_raises_without_cf(self):
        from pyspark.sql import functions as F

        from sparksearchengine_spark.functions.scoring import ScoringConfig

        cfg = ScoringConfig(similarity="lmd")
        with pytest.raises(ValueError, match="cf_t"):
            cfg.term_score(
                F.lit(1.0), F.lit(1.0), F.lit(1.0), 1.0, 1.0
            )
