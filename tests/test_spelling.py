"""Batch noisy-channel spelling correction (operators/spelling.py).

Hand-checkable corpus: bigram context must pick different corrections
for the same misspelled token ("ber" -> beer|bear) depending on the
following word.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

EDITP = math.log(0.05)


@pytest.fixture(scope="module")
def spell_index(spark):
    from sparksearchengine_spark import Corpus, TextOptions

    docs = spark.createDataFrame(
        [
            (1, "beer mug beer mug beer mug"),
            (2, "bear cub bear cub bear cub"),
            (3, "green tea is great green tea"),
            (4, "spark engine runs fast"),
            (5, "the grain harvest was poor"),
        ],
        "doc_id long, text string",
    )
    idx = Corpus(
        docs,
        id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="simple", positions=True)},
    ).build_index()
    yield idx
    idx.unpersist()


def _correct(idx, spark, pairs, **kw):
    from sparksearchengine_spark.operators.spelling import correct_queries

    qs = spark.createDataFrame(pairs, "query_id long, qtext string")
    out = correct_queries(idx, qs, **kw)
    rows = out.collect()
    return {(r["query_id"], r["rank"]): r for r in rows}


class TestCorrectQueries:
    def test_bigram_context_disambiguates(self, spark, spell_index):
        # same typo "ber", two different right answers by context
        got = _correct(
            spell_index,
            spark,
            [(1, "ber mug"), (2, "ber cub")],
            max_dist=1,
        )
        assert got[(1, 1)]["corrected"] == "beer mug"
        assert got[(2, 1)]["corrected"] == "bear cub"
        assert got[(1, 1)]["n_edits"] == 1 and got[(1, 1)]["changed"]

    def test_exact_query_unchanged(self, spark, spell_index):
        got = _correct(spell_index, spark, [(1, "green tea")])
        r = got[(1, 1)]
        assert r["corrected"] == "green tea"
        assert r["n_edits"] == 0 and not r["changed"]

    def test_single_token_query(self, spark, spell_index):
        got = _correct(spell_index, spark, [(1, "sparkk")])
        assert got[(1, 1)]["corrected"] == "spark"

    def test_oov_token_falls_back_to_itself(self, spark, spell_index):
        got = _correct(spell_index, spark, [(1, "zzzqqq tea")])
        r = got[(1, 1)]
        assert r["corrected"] == "zzzqqq tea"
        assert r["n_edits"] == 0 and not r["changed"]

    def test_variable_lengths_one_batch(self, spark, spell_index):
        got = _correct(
            spell_index,
            spark,
            [(1, "sparkk"), (2, "ber mug"), (3, "green tea is grean")],
        )
        assert got[(1, 1)]["corrected"] == "spark"
        assert got[(2, 1)]["corrected"] == "beer mug"
        # "grean" is 1 edit from BOTH "green" and "great"; the corpus
        # bigram (is, great) — doc 3 — decides it
        assert got[(3, 1)]["corrected"] == "green tea is great"

    def test_k_returns_ranked_alternatives(self, spark, spell_index):
        got = _correct(
            spell_index, spark, [(1, "ber")], k=3, max_candidates=8
        )
        ranks = sorted(r for (_q, r) in got)
        assert ranks == list(range(1, len(ranks) + 1))
        # both in-vocabulary dist-1 candidates surface
        suggested = {got[(1, r)]["corrected"] for r in ranks}
        assert {"beer", "bear"} <= suggested
        scores = [got[(1, r)]["score"] for r in ranks]
        assert scores == sorted(scores, reverse=True)

    def test_viterbi_score_matches_hand_formula(self, spark, spell_index):
        # "ber mug" -> beer mug: total tokens = 6+6+6+4+5 = 27,
        # cf(beer)=3, p_uni=3/27; bigram c(beer,mug)=3, c(beer,*)=3
        got = _correct(spell_index, spark, [(1, "ber mug")])
        total = 27.0
        expected = (
            (math.log(3.0 / total) + 1 * EDITP)  # beer, dist 1
            + math.log(3.0 / 3.0)  # p(mug|beer) = 1
            + 0 * EDITP
        )
        assert got[(1, 1)]["score"] == pytest.approx(
            round(expected, 6), abs=5e-7
        )

    def test_empty_and_zero_token_queries_drop(self, spark, spell_index):
        got = _correct(
            spell_index, spark, [(1, "...!!!"), (2, "green tea")]
        )
        assert set(q for (q, _r) in got) == {2}

    def test_deterministic_across_runs(self, spark, spell_index):
        a = _correct(spell_index, spark, [(1, "ber mug"), (2, "grean tea")])
        b = _correct(spell_index, spark, [(1, "ber mug"), (2, "grean tea")])
        assert {
            k: (v["corrected"], v["score"]) for k, v in a.items()
        } == {k: (v["corrected"], v["score"]) for k, v in b.items()}

    def test_validation_errors(self, spark, spell_index):
        from sparksearchengine_spark.operators.spelling import (
            MAX_SPELL_POSITIONS,
            correct_queries,
        )

        qs = spark.createDataFrame(
            [(1, "a b")], "query_id long, qtext string"
        )
        with pytest.raises(ValueError, match="max_dist"):
            correct_queries(spell_index, qs, max_dist=-1)
        with pytest.raises(ValueError, match="k cannot exceed"):
            correct_queries(spell_index, qs, k=9, max_candidates=8)
        with pytest.raises(ValueError, match="edit_logp"):
            correct_queries(spell_index, qs, edit_logp=0.5)
        with pytest.raises(ValueError, match="backoff"):
            correct_queries(spell_index, qs, backoff=1.5)
        with pytest.raises(ValueError, match="not a searchable"):
            correct_queries(spell_index, qs, field="nope")
        long_q = spark.createDataFrame(
            [(1, " ".join(["w"] * (MAX_SPELL_POSITIONS + 1)))],
            "query_id long, qtext string",
        )
        with pytest.raises(ValueError, match="MAX_SPELL_POSITIONS"):
            correct_queries(spell_index, long_q).collect()

    def test_empty_query_frame(self, spark, spell_index):
        from sparksearchengine_spark.operators.spelling import (
            correct_queries,
        )

        qs = spark.createDataFrame([], "query_id long, qtext string")
        out = correct_queries(spell_index, qs)
        assert out.count() == 0
        assert set(out.columns) == {
            "query_id", "rank", "corrected", "score", "n_edits", "changed",
        }

    def test_empty_frame_preserves_id_type(self, spark, spell_index):
        # string query ids: the zero-token early return must carry the
        # SAME schema as the non-empty path (unions/checks downstream)
        from sparksearchengine_spark.operators.spelling import (
            correct_queries,
        )

        empty = correct_queries(
            spell_index,
            spark.createDataFrame([], "query_id string, qtext string"),
        )
        full = correct_queries(
            spell_index,
            spark.createDataFrame(
                [("a", "ber mug")], "query_id string, qtext string"
            ),
        )
        assert [f.dataType for f in empty.schema.fields] == [
            f.dataType for f in full.schema.fields
        ]
        assert empty.columns == full.columns
        # and they union cleanly
        assert full.unionByName(empty).count() == 1

    def test_candidate_join_is_hash_not_nested_loop(self, spark, spell_index):
        # the vocabulary x query-token candidate join must be a length-
        # bucket equi-join (BroadcastHashJoin), never the non-equi
        # length-window BroadcastNestedLoopJoin: |vocab| x |tokens|
        # comparisons is the 100x-scale killer
        from sparksearchengine_spark.operators.spelling import (
            correct_queries,
        )

        qs = spark.createDataFrame(
            [(1, "ber mug")], "query_id long, qtext string"
        )
        out = correct_queries(spell_index, qs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan

    def test_caches_release_via_public_api(self, spark, spell_index):
        # correct_queries registers its persisted candidate/transition
        # frames through SearchIndex.register_cache; release_caches()
        # frees them without touching postings/termstats
        from sparksearchengine_spark.operators.spelling import (
            correct_queries,
        )

        before = len(spell_index._phrase_caches)
        qs = spark.createDataFrame(
            [(1, "ber mug")], "query_id long, qtext string"
        )
        correct_queries(spell_index, qs).collect()
        assert len(spell_index._phrase_caches) == before + 2
        registered = spell_index._phrase_caches[-2:]
        spell_index.release_caches()
        assert spell_index._phrase_caches == []
        for df in registered:
            assert df.storageLevel.useMemory is False
        # index's own frames stay persisted
        assert spell_index.postings.storageLevel.useMemory

    def test_long_query_checkpointed_viterbi(self, spark, spell_index):
        # >4 positions crosses the lineage-checkpoint boundary; results
        # must be identical in shape and exactness
        got = _correct(
            spell_index,
            spark,
            [(1, "the grain harvest was poor green tea is great")],
        )
        r = got[(1, 1)]
        assert r["corrected"] == "the grain harvest was poor green tea is great"
        assert r["n_edits"] == 0 and not r["changed"]


class TestBatchSearchCorrected:
    """Did-you-mean retry flow (batch_search_corrected): misspelled
    queries get the suggestion's results, healthy queries keep their
    original rows bit-identical, uncorrectable queries fall back."""

    def _run(self, spark, spell_index, pairs, **kw):
        from sparksearchengine_spark.operators.spelling import (
            batch_search_corrected,
        )

        qs = spark.createDataFrame(pairs, "query_id long, qtext string")
        rows = batch_search_corrected(spell_index, qs, **kw).collect()
        out: dict = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(r)
        return out

    def test_misspelled_query_retries_with_suggestion(
        self, spark, spell_index
    ):
        got = self._run(
            spark, spell_index, [(1, "sparkk"), (2, "beer")], k=3
        )
        # query 1 found nothing as-typed; the suggestion drives results
        assert got[1][0]["used_query"] == "spark"
        assert all(r["corrected"] for r in got[1])
        assert {r["doc_id"] for r in got[1]} == {4}
        # query 2 was healthy: original rows, corrected=False
        assert all(not r["corrected"] for r in got[2])
        assert got[2][0]["used_query"] == "beer"

    def test_healthy_rows_bit_identical_to_batch_search(
        self, spark, spell_index
    ):
        from sparksearchengine_spark.operators.search import batch_search

        got = self._run(spark, spell_index, [(1, "beer mug")], k=5)
        qs = spark.createDataFrame(
            [(1, "beer mug")], "query_id long, qtext string"
        )
        want = {
            (r["doc_id"], r["score"], r["rank"])
            for r in batch_search(
                spell_index, qs, k=5, field="text"
            ).collect()
        }
        assert {
            (r["doc_id"], r["score"], r["rank"]) for r in got[1]
        } == want

    def test_uncorrectable_query_keeps_partial_hits(
        self, spark, spell_index
    ):
        # "zzzqqq beer": one OOV token + one hot token -> SOME hits but
        # (with min_hits high) still "short"; no in-vocabulary
        # suggestion changes it, so the original partial hits survive
        got = self._run(
            spark,
            spell_index,
            [(1, "zzzqqq beer")],
            k=5,
            min_hits=4,
        )
        assert 1 in got
        assert all(not r["corrected"] for r in got[1])
        assert {r["doc_id"] for r in got[1]} == {1}

    def test_no_hits_either_way_contributes_no_rows(
        self, spark, spell_index
    ):
        got = self._run(spark, spell_index, [(1, "zzzqqq xxxyyy")], k=3)
        assert got == {}


class TestRetryWhiffKeepsOriginals:
    def test_zero_hit_retry_keeps_partial_hits(
        self, spark, spell_index, monkeypatch
    ):
        # a query with 1 real hit and min_hits=2 goes to the corrector;
        # force an accepted suggestion whose retry finds NOTHING — the
        # original partial hit must survive (the pre-fix left_anti on
        # retry_q erased it unconditionally)
        import sparksearchengine_spark.operators.spelling as sp

        def fake_correct(index, short, **kw):
            return short.select(
                "query_id",
                F.lit("zzzqq xxyyz").alias("corrected"),
                F.lit(0.0).alias("score"),
                F.lit(2).alias("n_edits"),
                F.lit(True).alias("changed"),
            )

        monkeypatch.setattr(sp, "correct_queries", fake_correct)
        qs = spark.createDataFrame(
            [(1, "beer zzzqqq")], "query_id long, qtext string"
        )
        rows = sp.batch_search_corrected(
            spell_index, qs, k=5, min_hits=50
        ).collect()
        assert rows, "partial hits were dropped on a zero-hit retry"
        assert all(not r["corrected"] for r in rows)
        assert all(r["used_query"] == "beer zzzqqq" for r in rows)
