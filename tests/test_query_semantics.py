"""Query compilation semantics on the hand-computable tiny corpus.

Tiny corpus tokenization (conftest):
  doc 1: [a, b, a]    doc 2: [a, c]    doc 3: [b, b, c, c]
"""

from __future__ import annotations

import pytest

from sparksearchengine_spark.plans.ast import F_, Q


def ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


class TestTermQueries:
    def test_match_term(self, tiny_index):
        assert ids(tiny_index.compile(Q.field("text").match_term("a"))) == [1, 2]
        assert ids(tiny_index.compile(Q.field("text").match_term("c"))) == [2, 3]
        assert ids(tiny_index.compile(Q.field("text").match_term("zz"))) == []

    def test_match_all(self, tiny_index):
        assert ids(tiny_index.compile(Q.field("text").match_all("a", "b"))) == [1]
        assert ids(tiny_index.compile(Q.field("text").match_all("b", "c"))) == [3]
        assert ids(tiny_index.compile(Q.field("text").match_all("a", "zz"))) == []

    def test_match_any(self, tiny_index):
        assert ids(tiny_index.compile(Q.field("text").match_any("a", "c"))) == [1, 2, 3]
        assert ids(tiny_index.compile(Q.field("text").match_any("zz", "c"))) == [2, 3]

    def test_match_min(self, tiny_index):
        q = Q.field("text").match_min(2, "a", "b", "c")
        assert ids(tiny_index.compile(q)) == [1, 2, 3]
        q3 = Q.field("text").match_min(3, "a", "b", "c")
        assert ids(tiny_index.compile(q3)) == []

    def test_match_text_analyzes(self, tiny_index):
        # "A, c!" tokenizes to [a, c] -> match_any
        assert ids(tiny_index.compile(Q.field("text").match_text("A, c!"))) == [1, 2, 3]
        assert ids(
            tiny_index.compile(Q.field("text").match_all_text("A, c!"))
        ) == [2]

    def test_duplicate_terms_deduped(self, tiny_index):
        q = Q.field("text").match_all("a", "a")
        assert ids(tiny_index.compile(q)) == [1, 2]

    def test_all_docs(self, tiny_index):
        rows = tiny_index.compile(Q.all()).collect()
        assert sorted(r["doc_id"] for r in rows) == [1, 2, 3]
        assert all(r["score"] == 1.0 for r in rows)

    def test_unknown_field_raises(self, tiny_index):
        with pytest.raises(ValueError, match="not a searchable"):
            tiny_index.compile(Q.field("nope").match_term("a")).collect()


class TestPhrase:
    def test_adjacent_bigram(self, tiny_index):
        # doc1 = [a, b, a]: "a b" adjacent; "b a" adjacent; "a a" not
        assert ids(tiny_index.compile(Q.field("text").match_phrase("a b"))) == [1]
        assert ids(tiny_index.compile(Q.field("text").match_phrase("b a"))) == [1]
        assert ids(tiny_index.compile(Q.field("text").match_phrase("a a"))) == []
        # doc3 = [b, b, c, c]
        assert ids(tiny_index.compile(Q.field("text").match_phrase("b c"))) == [3]
        assert ids(tiny_index.compile(Q.field("text").match_phrase("c c"))) == [3]

    def test_trigram(self, tiny_index):
        assert ids(tiny_index.compile(Q.field("text").match_phrase("a b a"))) == [1]
        assert ids(tiny_index.compile(Q.field("text").match_phrase("b c c"))) == [3]
        assert ids(tiny_index.compile(Q.field("text").match_phrase("a b c"))) == []

    def test_single_term_phrase(self, tiny_index):
        assert ids(tiny_index.compile(Q.field("text").match_phrase("c"))) == [2, 3]

    def test_slop_bridges_gaps_in_order(self, tiny_index):
        # doc1 = [a@0, b@1, a@2]: "a a" has a gap of 1 -> slop 1 matches
        f = Q.field("text")
        assert ids(tiny_index.compile(f.match_phrase("a a", slop=0))) == []
        assert ids(tiny_index.compile(f.match_phrase("a a", slop=1))) == [1]
        # slop larger than needed still matches (monotone in slop)
        assert ids(tiny_index.compile(f.match_phrase("a a", slop=3))) == [1]

    def test_slop_is_ordered(self, tiny_index):
        # doc3 = [b@0, b@1, c@2, c@3]: "c b" never occurs in order
        f = Q.field("text")
        assert ids(tiny_index.compile(f.match_phrase("c b", slop=0))) == []
        assert ids(tiny_index.compile(f.match_phrase("c b", slop=4))) == []
        # trigram out-of-order: doc1 has no a..a..b increasing chain
        assert ids(tiny_index.compile(f.match_phrase("a a b", slop=4))) == []

    def test_slop_trigram_chain(self, tiny_index):
        # doc3 = [b@0, b@1, c@2, c@3]: "b b c" exact; "b c c" exact;
        # "b b c" with the greedy chain b@0 -> b@1 -> c@2, span 2 = n-1
        f = Q.field("text")
        assert ids(tiny_index.compile(f.match_phrase("b b c", slop=0))) == [3]
        # "b c c" skipping b@1: chain b@0 -> c@2 -> c@3 needs slop 1;
        # but b@1 -> c@2 -> c@3 is exact, so slop 0 already matches
        assert ids(tiny_index.compile(f.match_phrase("b c c", slop=0))) == [3]

    def test_slop_parse_roundtrip(self, tiny_index):
        from sparksearchengine_spark.plans.ast import MatchPhrase

        q = Q.parse('"a a"~1', default_field="text")
        assert q == MatchPhrase("text", "a a", slop=1)
        assert ids(tiny_index.compile(q)) == [1]

    def test_phrase_without_positions_raises(self, tiny_corpus):
        from sparksearchengine_spark import Corpus, TextOptions

        idx = Corpus(
            tiny_corpus,
            id_col="doc_id",
            text_cols={"text": TextOptions(positions=False)},
        ).build_index()
        with pytest.raises(ValueError, match="positions"):
            idx.compile(Q.field("text").match_phrase("a b"))


class TestBooleanAlgebra:
    def test_and_intersects_scores_sum(self, tiny_index):
        a = Q.field("text").match_term("a")
        c = Q.field("text").match_term("c")
        both = tiny_index.compile(a & c)
        assert ids(both) == [2]
        sa = {r["doc_id"]: r["score"] for r in tiny_index.compile(a).collect()}
        sc = {r["doc_id"]: r["score"] for r in tiny_index.compile(c).collect()}
        got = both.collect()[0]["score"]
        assert got == pytest.approx(sa[2] + sc[2])

    def test_or_unions_scores_sum_on_overlap(self, tiny_index):
        a = Q.field("text").match_term("a")
        c = Q.field("text").match_term("c")
        u = tiny_index.compile(a | c)
        assert ids(u) == [1, 2, 3]
        sa = {r["doc_id"]: r["score"] for r in tiny_index.compile(a).collect()}
        sc = {r["doc_id"]: r["score"] for r in tiny_index.compile(c).collect()}
        su = {r["doc_id"]: r["score"] for r in u.collect()}
        assert su[2] == pytest.approx(sa[2] + sc[2])
        assert su[1] == pytest.approx(sa[1])

    def test_not_standalone(self, tiny_index):
        q = ~Q.field("text").match_term("a")
        assert ids(tiny_index.compile(q)) == [3]

    def test_and_not(self, tiny_index):
        b = Q.field("text").match_term("b")
        a = Q.field("text").match_term("a")
        assert ids(tiny_index.compile(b & ~a)) == [3]

    def test_double_negation_is_identity(self, tiny_index):
        a = Q.field("text").match_term("a")
        assert ids(tiny_index.compile(~~a)) == ids(tiny_index.compile(a))

    def test_subset_property(self, tiny_index):
        """matchAll ⊆ matchMin(2) ⊆ matchAny (SURVEY §5 property test)."""
        f = Q.field("text")
        terms = ("a", "b", "c")
        s_all = set(ids(tiny_index.compile(f.match_all(*terms))))
        s_min = set(ids(tiny_index.compile(f.match_min(2, *terms))))
        s_any = set(ids(tiny_index.compile(f.match_any(*terms))))
        assert s_all <= s_min <= s_any


class TestFilters:
    def test_compare_filters(self, tiny_index):
        assert ids(tiny_index.compile(F_.eq("views", 20))) == [2]
        assert ids(tiny_index.compile(F_.gt("views", 10))) == [2, 3]
        assert ids(tiny_index.compile(F_.ge("views", 20))) == [2, 3]
        assert ids(tiny_index.compile(F_.lt("views", 20))) == [1]
        assert ids(tiny_index.compile(F_.le("views", 20))) == [1, 2]

    def test_range_and_inset(self, tiny_index):
        assert ids(tiny_index.compile(F_.between("views", 15, 30))) == [2, 3]
        assert ids(tiny_index.compile(F_.isin("views", 10, 30))) == [1, 3]

    def test_exists_missing(self, tiny_index):
        assert ids(tiny_index.compile(F_.exists("tag"))) == [2, 3]
        assert ids(tiny_index.compile(F_.missing("tag"))) == [1]

    def test_filters_score_zero(self, tiny_index):
        rows = tiny_index.compile(F_.gt("views", 0)).collect()
        assert all(r["score"] == 0.0 for r in rows)

    def test_filter_does_not_add_score_in_and(self, tiny_index):
        a = Q.field("text").match_term("a")
        sa = {r["doc_id"]: r["score"] for r in tiny_index.compile(a).collect()}
        combo = tiny_index.compile(a & F_.gt("views", 15))
        rows = {r["doc_id"]: r["score"] for r in combo.collect()}
        assert set(rows) == {2}
        assert rows[2] == pytest.approx(sa[2])

    def test_parsed_query_end_to_end(self, tiny_index):
        q = Q.parse("a AND NOT c", default_field="text")
        assert ids(tiny_index.compile(q)) == [1]


class TestReviewRegressions:
    """r3 review: silent wrong-result bugs in the query path."""

    def test_wildcard_fuzzy_case_preserving_analyzer(self, spark):
        from sparksearchengine_spark import Corpus, Q, TextOptions

        df = spark.createDataFrame(
            [(1, "Foo Bar"), (2, "foo baz")], "doc_id long, text string"
        )
        idx = Corpus(
            df, id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="whitespace")},
        ).build_index()
        # pattern case must match INDEXED term case (no forced lowercase)
        w = {r["doc_id"] for r in idx.compile(Q.parse("text:Foo*")).collect()}
        assert w == {1}
        f = {r["doc_id"] for r in idx.compile(Q.parse("text:Foo~1")).collect()}
        assert 1 in f  # exact-case term matches at distance 0
        # lowercasing analyzers still fold the pattern
        idx2 = Corpus(
            df, id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="simple")},
        ).build_index()
        w2 = {r["doc_id"] for r in idx2.compile(Q.parse("text:Foo*")).collect()}
        assert w2 == {1, 2}

    def test_min_match_counts_duplicate_clauses(self, tiny_index):
        from sparksearchengine_spark.plans.ast import Q

        # doc 1 = [a,b,a], doc 2 = [a,c], doc 3 = [b,b,c,c]
        # clauses (a,a,b) with min 2: docs containing just 'a' qualify
        # (two 'a' clauses match), like Lucene's minimumShouldMatch
        got = {
            r["doc_id"]
            for r in tiny_index.compile(
                Q.field("text").match_min(2, "a", "a", "b")
            ).collect()
        }
        assert got == {1, 2}  # doc 2 has only 'a' yet satisfies 2 clauses

    def test_truncated_query_raises_value_error(self):
        from sparksearchengine_spark.plans.ast import Q

        with pytest.raises(ValueError):
            Q.parse("title:")
        with pytest.raises(ValueError):
            Q.parse("year:[2020 TO")


class TestMatchNear:
    @pytest.fixture(scope="class")
    def near_index(self, spark):
        from sparksearchengine_spark import Corpus, TextOptions

        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma"),          # alpha..gamma adjacent
                (2, "alpha x x x x x x gamma"),   # gamma 7 after alpha
                (3, "gamma x alpha"),             # reversed, within 2
                (4, "alpha only here"),
                (5, "gamma only here"),
            ],
            "doc_id long, text string",
        )
        return Corpus(
            df, id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="simple", positions=True)},
        ).build_index()

    def test_window_gates_membership(self, near_index):
        from sparksearchengine_spark import Q

        hits = {
            r["doc_id"]
            for r in near_index.compile(
                Q.field("text").match_near("alpha gamma", window=2)
            ).collect()
        }
        # doc 1 (distance 2), doc 3 (reversed distance 2 — unordered);
        # doc 2 is 7 apart; docs 4/5 lack a term
        assert hits == {1, 3}

    def test_wide_window_equals_match_all(self, near_index):
        from sparksearchengine_spark import Q

        near = {
            r["doc_id"]
            for r in near_index.compile(
                Q.field("text").match_near("alpha gamma", window=100)
            ).collect()
        }
        allm = {
            r["doc_id"]
            for r in near_index.compile(
                Q.field("text").match_all("alpha", "gamma")
            ).collect()
        }
        assert near == allm == {1, 2, 3}

    def test_score_is_matchall_score(self, near_index):
        from sparksearchengine_spark import Q

        near = {
            r["doc_id"]: r["score"]
            for r in near_index.compile(
                Q.field("text").match_near("alpha gamma", window=2)
            ).collect()
        }
        allm = {
            r["doc_id"]: r["score"]
            for r in near_index.compile(
                Q.field("text").match_all("alpha", "gamma")
            ).collect()
        }
        for d, s in near.items():
            assert abs(s - allm[d]) < 1e-12

    def test_single_term_degenerates(self, near_index):
        from sparksearchengine_spark import Q

        hits = {
            r["doc_id"]
            for r in near_index.compile(
                Q.field("text").match_near("alpha", window=1)
            ).collect()
        }
        assert hits == {1, 2, 3, 4}

    def test_bad_window(self, near_index):
        from sparksearchengine_spark import Q

        with pytest.raises(ValueError):
            near_index.compile(
                Q.field("text").match_near("a b", window=-1)
            )


class TestSynonymExpansion:
    """Query-time synonym expansion (plans/ast.py::expand_synonyms):
    pure AST rewrite, doc-set semantics pinned on the tiny corpus."""

    SYN = {"a": ["c"], "zz": ["b"]}

    def _docs(self, index, q):
        return {r["doc_id"] for r in index.compile(q).collect()}

    def test_term_gains_alternatives(self, tiny_index):
        from sparksearchengine_spark.plans.ast import Q, expand_synonyms

        # corpus: d1=[a,b,a] d2=[a,c] d3=[b,b,c,c]
        base = Q.field("text").match_term("a")
        exp = expand_synonyms(base, self.SYN)
        assert self._docs(tiny_index, base) == {1, 2}
        assert self._docs(tiny_index, exp) == {1, 2, 3}  # + c matches

    def test_match_all_per_group(self, tiny_index):
        from sparksearchengine_spark.plans.ast import Q, expand_synonyms

        # matchAll(a, zz): no doc has zz; with zz->b, docs need
        # (a or c) AND (zz or b) -> d1 (a,b), d2 (a? has a,c: needs b/zz
        # -> no), d3 (c + b) -> {1, 3}
        base = Q.field("text").match_all("a", "zz")
        exp = expand_synonyms(base, self.SYN)
        assert self._docs(tiny_index, base) == set()
        assert self._docs(tiny_index, exp) == {1, 3}

    def test_match_text_require_all(self, tiny_index):
        from sparksearchengine_spark.plans.ast import Q, expand_synonyms

        base = Q.field("text").match_all_text("a zz")
        exp = expand_synonyms(base, self.SYN)
        assert self._docs(tiny_index, exp) == {1, 3}

    def test_recursion_and_passthrough(self, tiny_index):
        from sparksearchengine_spark.plans.ast import (
            MatchPhrase,
            Q,
            expand_synonyms,
        )

        base = ~Q.field("text").match_term("a") & Q.field("text").match_term("b")
        exp = expand_synonyms(base, self.SYN)
        # not(a|c) & b -> only docs with b but neither a nor c -> none
        # (d1 has a, d3 has c) ... d3 has c -> excluded; d1 has a.
        assert self._docs(tiny_index, exp) == set()
        ph = MatchPhrase("text", "a b")
        assert expand_synonyms(ph, self.SYN) is ph  # unchanged

    def test_min_match_refused(self):
        from sparksearchengine_spark.plans.ast import Q, expand_synonyms

        import pytest as _pytest

        base = Q.field("text").match_min(2, "a", "b", "zz")
        with _pytest.raises(ValueError, match="matchMin"):
            expand_synonyms(base, self.SYN)

    def test_no_mapping_is_identity(self):
        from sparksearchengine_spark.plans.ast import Q, expand_synonyms

        q = Q.field("text").match_any("a", "b")
        assert expand_synonyms(q, {}) is not None
        assert expand_synonyms(q, {"other": ["x"]}) == q

    def test_multiword_value_rejected_in_term_paths(self):
        from sparksearchengine_spark.plans.ast import Q, expand_synonyms

        import pytest as _pytest

        mw = {"a": ["c d"]}
        with _pytest.raises(ValueError, match="multi-word"):
            expand_synonyms(Q.field("text").match_term("a"), mw)
        with _pytest.raises(ValueError, match="multi-word"):
            expand_synonyms(Q.field("text").match_any("a", "b"), mw)

    def test_multiword_key_rejected(self):
        from sparksearchengine_spark.plans.ast import Q, expand_synonyms

        import pytest as _pytest

        with _pytest.raises(ValueError, match="single tokens"):
            expand_synonyms(
                Q.field("text").match_term("a"), {"c d": ["a"]}
            )

    def test_multiword_value_becomes_phrase_in_text_path(self, tiny_index):
        from sparksearchengine_spark.plans.ast import (
            MatchPhrase,
            Or,
            Q,
            expand_synonyms,
        )

        # corpus: d1=[a,b,a] d2=[a,c] d3=[b,b,c,c]. zz -> "b c": only a
        # doc with CONSECUTIVE b c may match the alternative — d3 has
        # [b,b,c,c] with b immediately before c at positions 2,3.
        exp = expand_synonyms(
            Q.field("text").match_text("zz"), {"zz": ["b c"]}
        )
        def flat(q):
            if isinstance(q, Or):
                for o in q.operands:
                    yield from flat(o)
            else:
                yield q

        assert isinstance(exp, Or)
        assert any(isinstance(o, MatchPhrase) for o in flat(exp))
        assert self._docs(tiny_index, exp) == {3}
        # and NOT the or-over-words broadening: d1 has b without c
        assert 1 not in self._docs(tiny_index, exp)


class TestPhraseAggNoExpand:
    def test_phrase_verify_has_no_expand(self, tiny_index):
        # regression guard for the r8 fix: count_distinct(qpos) next to
        # collect_list forced an Expand that doubled the phrase
        # aggregation input; plain count(*) is provably identical
        # ((query_id, qpos) unique x (term, doc) unique postings)
        from sparksearchengine_spark.operators.search import (
            batch_search_dsl,
        )
        from sparksearchengine_spark.plans.ast import Q

        out = batch_search_dsl(
            tiny_index,
            [(1, Q.field("text").match_phrase("a b"))],
            k=5,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan, plan
