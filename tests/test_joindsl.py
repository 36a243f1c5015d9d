"""query_join_dsl (operators/joindsl.py) + plans/serde.py.

The fully general E7: per-row query ASTs as a serialized column, shape-
grouped EXECUTOR-side. Ground truth per row = the single-query
`search()` result for the same AST (scores must match exactly for data
tiers; at the engine's 6-dp contract for weighted Or folds).
"""

from __future__ import annotations

import pytest

from sparksearchengine_spark.plans.ast import F_, Q


def _ser(q) -> str:
    from sparksearchengine_spark.plans.serde import query_to_json

    return query_to_json(q)


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(
        [
            (1, "spark engine fast scan", 10, "en"),
            (2, "fast spark joins beat slow scans", 25, "en"),
            (3, "lucene index segment merge", 40, "it"),
            (4, "merge fast segment spark engine", 5, "it"),
            (5, "engine oil and fast cars", 60, "en"),
            (6, None, 70, "en"),
        ],
        "doc_id long, text string, views int, lang string",
    )


@pytest.fixture(scope="module")
def jidx(corpus_df):
    from sparksearchengine_spark import Corpus, TextOptions

    idx = Corpus(
        corpus_df,
        id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="simple", positions=True)},
    ).build_index()
    yield idx
    idx.unpersist()


def _run(jidx, spark, rows, **kw):
    """rows: list[(id, Query)] -> {id: [(doc, score, rank)...]}"""
    from sparksearchengine_spark.operators.joindsl import query_join_dsl

    df = spark.createDataFrame(
        [(i, _ser(q)) for i, q in rows], "rid long, qjson string"
    )
    out = query_join_dsl(
        jidx, df, "qjson", k=kw.pop("k", 10), other_id_col="rid", **kw
    )
    got: dict = {}
    for r in out.collect():
        got.setdefault(r["rid"], [])
        if r["match_doc_id"] is not None:
            got[r["rid"]].append(
                (r["match_doc_id"], round(r["score"], 6), r["rank"])
            )
    return {k_: sorted(v) for k_, v in got.items()}


def _single(jidx, q, k=10):
    from sparksearchengine_spark.operators.search import search

    return sorted(
        (r["doc_id"], round(r["score"], 6), r["rank"])
        for r in search(jidx, q, k=k).collect()
    )


class TestSerde:
    def test_roundtrip_every_node(self):
        import datetime as dt
        from decimal import Decimal

        from sparksearchengine_spark.plans.serde import (
            query_from_json,
            query_to_json,
        )

        qs = [
            Q.all(),
            Q.field("text").match_term("a"),
            Q.field("text").match_min(2, "a", "b", "c"),
            Q.field("text").match_text("x y"),
            Q.field("text").match_all_text("x y"),
            Q.field("text").match_phrase("a b", slop=2),
            Q.field("text").match_near("a b", window=3),
            Q.field("text").match_wildcard("te*t"),
            Q.field("text").match_regex("ab+"),
            Q.field("text").match_fuzzy("term", max_edits=1),
            (Q.field("text").match_term("a") & F_.ge("views", 10)),
            (Q.field("text").match_term("a") | Q.field("text").match_term("b")),
            Q.field("text").match_term("a").boost(2.5),
            ~Q.field("text").match_term("a"),
            F_.eq("lang", "en"),
            F_.between("views", 1, 5),
            F_.isin("views", 1, 2),
            F_.exists("lang"),
            F_.missing("lang"),
            F_.eq("day", dt.date(2024, 3, 1)),
            F_.eq("ts", dt.datetime(2024, 3, 1, 12, 30)),
            F_.eq("price", Decimal("1.25")),
        ]
        for q in qs:
            s = query_to_json(q)
            assert query_from_json(s) == q, q
            # canonical: re-serialization is byte-identical
            assert query_to_json(query_from_json(s)) == s

    def test_canonical_grouping_key(self):
        from sparksearchengine_spark.plans.serde import query_to_json

        a = Q.field("text").match_all("x", "y") & F_.ge("views", 3)
        b = Q.field("text").match_all("x", "y") & F_.ge("views", 3)
        assert query_to_json(a) == query_to_json(b)

    def test_malformed_raises(self):
        from sparksearchengine_spark.plans.serde import query_from_json

        with pytest.raises(ValueError, match="malformed"):
            query_from_json("{nope")
        with pytest.raises(ValueError, match="unknown query node"):
            query_from_json('{"t":"NoSuchNode"}')

    def test_structurally_broken_nodes_raise_valueerror(self):
        # well-formed JSON that is not a valid node encoding must raise
        # ValueError too (one exception contract for the executor UDF —
        # never a KeyError/TypeError task crash)
        from sparksearchengine_spark.plans.serde import query_from_json

        for bad in (
            '{"t":"MatchTerm","field":"text"}',  # missing term
            '{"t":"And","operands":null}',  # wrong child type
            '{"t":"Boost","operand":{"t":"AllDocs"}}',  # missing factor
            '{"t":"MatchTermSet","field":"f","terms":[],"min_match":1}',
        ):
            with pytest.raises(ValueError):
                query_from_json(bad)


class TestQueryJoinDsl:
    def test_structurally_mixed_rows_match_single_query(self, spark, jidx):
        rows = [
            (1, Q.field("text").match_term("spark")),
            (2, Q.field("text").match_phrase("fast spark")),
            (3, Q.field("text").match_text("engine fast") & F_.ge("views", 10)),
            (4, Q.field("text").match_wildcard("seg*")),
            (5, ~Q.field("text").match_term("spark")),
            (6, Q.field("text").match_phrase("spark engine", slop=2)),
            (7, Q.field("text").match_min(2, "fast", "engine", "oil")),
        ]
        got = _run(jidx, spark, rows)
        for rid, q in rows:
            assert got[rid] == _single(jidx, q), f"row {rid}: {q}"

    def test_same_tree_rows_compile_one_plan(self, spark, jidx, monkeypatch):
        # 5 rows carrying the SAME general-shape tree must compile once;
        # 2 distinct trees -> exactly 2 compile calls
        import sparksearchengine_spark.operators.index as index_mod

        calls: list = []
        orig = index_mod.SearchIndex.compile

        def spy(self, q):  # type: ignore[no-untyped-def]
            calls.append(q)
            return orig(self, q)

        monkeypatch.setattr(index_mod.SearchIndex, "compile", spy)
        qa = ~Q.field("text").match_term("spark")
        qb = ~Q.field("text").match_term("merge")
        rows = [(i, qa) for i in range(5)] + [(9, qb)]
        got = _run(jidx, spark, rows)
        assert len(calls) == 2
        single_a = _single(jidx, qa)
        for i in range(5):
            assert got[i] == single_a
        assert got[9] == _single(jidx, qb)

    def test_filter_values_are_data_one_signature(self, spark, jidx):
        # same signature (views >= num), different per-row values
        rows = [
            (1, Q.field("text").match_term("fast") & F_.ge("views", 10)),
            (2, Q.field("text").match_term("fast") & F_.ge("views", 30)),
            (3, Q.field("text").match_term("fast") & F_.ge("views", 1000)),
        ]
        got = _run(jidx, spark, rows)
        for rid, q in rows:
            assert got[rid] == _single(jidx, q), f"row {rid}"
        assert got[3] == []  # nothing that popular

    def test_string_and_range_and_exists_filters(self, spark, jidx):
        rows = [
            (1, Q.field("text").match_term("engine") & F_.eq("lang", "en")),
            (2, Q.field("text").match_term("engine") & F_.between("views", 1, 20)),
            (3, Q.field("text").match_term("engine") & F_.exists("lang")),
        ]
        got = _run(jidx, spark, rows)
        for rid, q in rows:
            assert got[rid] == _single(jidx, q), f"row {rid}"

    def test_null_and_empty_queries_keep_row(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        df = spark.createDataFrame(
            [
                (1, _ser(Q.field("text").match_term("spark"))),
                (2, None),
                (3, _ser(Q.field("text").match_text("zzz qqq"))),
            ],
            "rid long, qjson string",
        )
        out = query_join_dsl(jidx, df, "qjson", other_id_col="rid")
        rows = out.collect()
        by_rid: dict = {}
        for r in rows:
            by_rid.setdefault(r["rid"], []).append(r["match_doc_id"])
        assert by_rid[2] == [None]  # NULL query -> row kept, no match
        assert by_rid[3] == [None]  # analyzes to nothing in-vocab? no: OOV terms
        assert set(x for x in by_rid[1] if x) != set()

    def test_all_null_queries_no_branches(self, spark, jidx):
        # every row NULL: no execution tier exists — rows still come
        # back with type-correct NULL match columns
        from sparksearchengine_spark.operators.joindsl import (
            query_join_dsl,
        )

        df = spark.createDataFrame(
            [(1, None), (2, None)], "rid long, qjson string"
        )
        out = query_join_dsl(jidx, df, "qjson", other_id_col="rid")
        rows = sorted(out.collect(), key=lambda r: r["rid"])
        assert [r["rid"] for r in rows] == [1, 2]
        assert all(r["match_doc_id"] is None for r in rows)
        assert {"match_doc_id", "score", "rank"} <= set(out.columns)

    def test_invalid_rows_raise_driver_side(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        bad = spark.createDataFrame(
            [(1, "{not json")], "rid long, qjson string"
        )
        with pytest.raises(ValueError, match="malformed"):
            query_join_dsl(jidx, bad, "qjson", other_id_col="rid")
        unknown = spark.createDataFrame(
            [(1, _ser(Q.field("nope").match_term("x")))],
            "rid long, qjson string",
        )
        with pytest.raises(ValueError, match="not a searchable"):
            query_join_dsl(jidx, unknown, "qjson", other_id_col="rid")

    def test_max_plans_loud_error(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        rows = [
            (i, _ser(~Q.field("text").match_term(f"t{i}")))
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, "rid long, qjson string")
        with pytest.raises(ValueError, match="max_plans"):
            query_join_dsl(jidx, df, "qjson", other_id_col="rid", max_plans=3)

    def test_synthesized_id_and_k(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        df = spark.createDataFrame(
            [(_ser(Q.field("text").match_text("fast engine")),)],
            "qjson string",
        )
        out = query_join_dsl(jidx, df, "qjson", k=2)
        rows = out.collect()
        assert len(rows) == 2
        assert {r["rank"] for r in rows} == {1, 2}
        assert "_qid" not in out.columns

    def test_with_elements_payload(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        df = spark.createDataFrame(
            [(1, _ser(Q.field("text").match_term("merge")))],
            "rid long, qjson string",
        )
        out = query_join_dsl(
            jidx, df, "qjson", other_id_col="rid", with_elements=True
        )
        rows = out.collect()
        assert all(r["match_text"] is not None for r in rows)
        assert {"match_views", "match_lang"} <= set(out.columns)

    def test_plan_no_nested_loop_without_patterns(self, spark, jidx):
        # data tiers only (terms/phrase/filtered): the executed plan must
        # be hash/sort-merge joins — no BroadcastNestedLoopJoin, no
        # CartesianProduct. (The multi-term tier's vocabulary theta-join
        # is the documented Lucene term-dictionary exception.)
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        df = spark.createDataFrame(
            [
                (1, _ser(Q.field("text").match_term("spark"))),
                (2, _ser(Q.field("text").match_phrase("fast spark"))),
                (3, _ser(Q.field("text").match_term("fast") & F_.ge("views", 10))),
            ],
            "rid long, qjson string",
        )
        out = query_join_dsl(jidx, df, "qjson", other_id_col="rid")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        # per-query top-k prunes partition-locally BEFORE the exchange
        # (the same TakeOrdered-per-group contract as batch search)
        assert "WindowGroupLimit" in plan, plan

    def test_lucene_syntax_rows_match_parse(self, spark, jidx):
        # saved-search STRINGS as the column: each row parses through
        # the Q12 grammar on the executors and must equal the
        # driver-side Q.parse + search() result
        from sparksearchengine_spark.operators.joindsl import (
            query_join_dsl,
        )

        strings = [
            (1, "spark"),
            (2, '"fast spark"'),
            (3, "engine AND NOT spark"),
            (4, "fast^2 oil"),
            (5, "seg*"),
        ]
        df = spark.createDataFrame(strings, "rid long, qs string")
        out = query_join_dsl(
            jidx, df, "qs", other_id_col="rid", syntax="lucene"
        )
        got: dict = {}
        for r in out.collect():
            got.setdefault(r["rid"], [])
            if r["match_doc_id"] is not None:
                got[r["rid"]].append(
                    (r["match_doc_id"], round(r["score"], 6), r["rank"])
                )
        for rid, qs in strings:
            want = _single(jidx, Q.parse(qs))
            assert sorted(got[rid]) == want, f"row {rid}: {qs}"

    def test_lucene_syntax_parse_error_raises(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import (
            query_join_dsl,
        )

        df = spark.createDataFrame(
            [(1, 'text:[3 TO')], "rid long, qs string"
        )
        with pytest.raises(ValueError, match="query_join_dsl"):
            query_join_dsl(
                jidx, df, "qs", other_id_col="rid", syntax="lucene"
            )
        with pytest.raises(ValueError, match="syntax"):
            query_join_dsl(
                jidx, df, "qs", other_id_col="rid", syntax="sql"
            )

    def test_percolate_df_equals_driver_list(self, spark, jidx):
        # the table-registry percolator must produce EXACTLY the rows of
        # the driver-list percolator for the same standing queries —
        # every (query_id, doc_id, score) match, no top-k window
        from sparksearchengine_spark.operators.joindsl import (
            percolate_dsl_df,
        )
        from sparksearchengine_spark.operators.search import percolate_dsl

        queries = [
            (1, Q.field("text").match_term("spark")),
            (2, Q.field("text").match_phrase("fast spark")),
            (3, Q.field("text").match_term("engine") & F_.ge("views", 10)),
            (4, ~Q.field("text").match_term("spark")),
            (5, Q.field("text").match_wildcard("seg*")),
        ]
        want = sorted(
            (r["query_id"], r["doc_id"], round(r["score"], 6))
            for r in percolate_dsl(jidx, queries).collect()
        )
        qdf = spark.createDataFrame(
            [(i, _ser(q)) for i, q in queries], "qid long, qjson string"
        )
        got = sorted(
            (r["query_id"], r["doc_id"], round(r["score"], 6))
            for r in percolate_dsl_df(jidx, qdf, "qjson", "qid").collect()
        )
        assert got == want

    def test_percolate_df_error_names_itself(self, spark, jidx):
        # probe failures through the percolator must name the operator
        # the user called, not query_join_dsl
        from sparksearchengine_spark.operators.joindsl import (
            percolate_dsl_df,
        )

        bad = spark.createDataFrame(
            [(1, "{nope")], "qid long, qjson string"
        )
        with pytest.raises(ValueError, match="percolate_dsl_df"):
            percolate_dsl_df(jidx, bad, "qjson", "qid")

    def test_percolate_df_empty_registry(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import (
            percolate_dsl_df,
        )

        qdf = spark.createDataFrame([], "qid long, qjson string")
        out = percolate_dsl_df(jidx, qdf, "qjson", "qid")
        assert out.count() == 0
        assert out.columns == ["query_id", "doc_id", "score"]

    def test_fuzzy_and_regex_rows(self, spark, jidx):
        rows = [
            (1, Q.field("text").match_fuzzy("sprak", max_edits=2)),
            (2, Q.field("text").match_regex("s(can|cans)")),
        ]
        got = _run(jidx, spark, rows)
        for rid, q in rows:
            assert got[rid] == _single(jidx, q), f"row {rid}"

    def test_duplicate_or_boost_shapes_ride_terms_tier(self, spark, jidx):
        rows = [
            (1, Q.field("text").match_term("fast").boost(2.0)),
            (2, Q.field("text").match_term("fast") | Q.field("text").match_term("oil")),
        ]
        got = _run(jidx, spark, rows)
        for rid, q in rows:
            assert got[rid] == _single(jidx, q), f"row {rid}"


class TestShuffleHashPath:
    def test_no_broadcast_path_same_results(self, spark, jidx):
        # broadcast_queries=False forces the corpus-scale plan (shuffle
        # on the join keys instead of broadcasting the query side);
        # results must equal the broadcast plan's exactly
        from sparksearchengine_spark.operators.joindsl import (
            query_join_dsl,
        )

        rows = [
            (1, _ser(Q.field("text").match_term("spark"))),
            (2, _ser(Q.field("text").match_phrase("fast spark"))),
            (3, _ser(Q.field("text").match_term("fast") & F_.ge("views", 10))),
        ]
        df = spark.createDataFrame(rows, "rid long, qjson string")

        def canon(out):
            return sorted(
                (r["rid"], r["match_doc_id"], round(r["score"], 6), r["rank"])
                for r in out.collect()
                if r["match_doc_id"] is not None
            )

        bc = query_join_dsl(
            jidx, df, "qjson", other_id_col="rid", broadcast_queries=True
        )
        sh = query_join_dsl(
            jidx, df, "qjson", other_id_col="rid", broadcast_queries=False
        )
        plan = sh._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
        assert canon(bc) == canon(sh)


class TestDedupQueries:
    """dedup_queries=True: equal trees execute once (compile-spied for
    general shapes) and results equal the non-dedup path exactly."""

    def test_results_equal_and_one_execution(self, spark, jidx, monkeypatch):
        import sparksearchengine_spark.operators.index as index_mod
        from sparksearchengine_spark.operators.joindsl import (
            query_join_dsl,
        )

        qa = ~Q.field("text").match_term("spark")  # general shape
        qt = Q.field("text").match_text("fast engine")  # terms shape
        rows = (
            [(i, _ser(qa)) for i in range(6)]
            + [(10 + i, _ser(qt)) for i in range(4)]
        )
        df = spark.createDataFrame(rows, "rid long, qjson string")

        calls: list = []
        orig = index_mod.SearchIndex.compile

        def spy(self, q):  # type: ignore[no-untyped-def]
            calls.append(q)
            return orig(self, q)

        monkeypatch.setattr(index_mod.SearchIndex, "compile", spy)
        plain = query_join_dsl(jidx, df, "qjson", k=3, other_id_col="rid")
        deduped = query_join_dsl(
            jidx, df, "qjson", k=3, other_id_col="rid", dedup_queries=True
        )

        def canon(out):
            return sorted(
                (r["rid"], r["match_doc_id"], round(r["score"], 6), r["rank"])
                for r in out.collect()
                if r["match_doc_id"] is not None
            )

        assert canon(deduped) == canon(plain)
        # general shapes compile once per distinct tree on BOTH paths
        assert len(calls) == 2

    def test_percolate_dedup_equal(self, spark, jidx):
        """dedup_queries defaults ON for percolation since r12 (match
        volume dominates, the xkey is free, registries are
        duplicate-heavy); the default, the explicit-on, and the
        explicit-off paths must produce identical row sets."""
        from sparksearchengine_spark.operators.joindsl import (
            percolate_dsl_df,
        )

        q = Q.field("text").match_phrase("fast spark")
        df = spark.createDataFrame(
            [(i, _ser(q)) for i in range(5)], "qid long, qjson string"
        )

        def canon(**kw):
            return sorted(
                (r["query_id"], r["doc_id"], round(r["score"], 6))
                for r in percolate_dsl_df(
                    jidx, df, "qjson", "qid", **kw
                ).collect()
            )

        default = canon()
        off = canon(dedup_queries=False)
        on = canon(dedup_queries=True)
        assert default == off == on and len(default) > 0


class TestFieldPrunedUnions:
    """The bounded probe collects the distinct fields each tier's rows
    touch, and every scored-postings / positions union is built only
    over those fields: a one-field batch over a multi-field corpus must
    scan ONE field's cached postings, not all of them (the `field` join
    key is data — Catalyst cannot prune union branches; the probe can).
    """

    @pytest.fixture(scope="class")
    def two_field_idx(self, spark):
        from sparksearchengine_spark import Corpus, TextOptions

        df = spark.createDataFrame(
            [
                (1, "spark engine fast", "title alpha fast"),
                (2, "fast spark joins", "title beta spark"),
                (3, "lucene index merge", "title gamma merge"),
            ],
            "doc_id long, body string, title string",
        )
        idx = Corpus(
            df,
            id_col="doc_id",
            text_cols={
                "body": TextOptions(analyzer="simple", positions=True),
                "title": TextOptions(analyzer="simple", positions=True),
            },
        ).build_index()
        yield idx
        idx.unpersist()

    @staticmethod
    def _scored_scans(plan: str) -> int:
        # a scored-postings cache scan is the only InMemoryTableScan
        # whose projection carries a tscore column (column order in the
        # printed scan varies with pruning)
        import re

        return len(
            re.findall(r"InMemoryTableScan \[[^\]]*tscore#", plan)
        )

    def test_single_field_batch_one_scan(self, spark, two_field_idx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        df = spark.createDataFrame(
            [
                (1, _ser(Q.field("body").match_term("spark"))),
                (2, _ser(Q.field("body").match_text("fast engine"))),
            ],
            "rid long, qjson string",
        )
        out = query_join_dsl(two_field_idx, df, "qjson", other_id_col="rid")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert self._scored_scans(plan) == 1, plan

    def test_two_field_batch_two_scans_and_results(self, spark, two_field_idx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl
        from sparksearchengine_spark.operators.search import search

        df = spark.createDataFrame(
            [
                (1, _ser(Q.field("body").match_term("spark"))),
                (2, _ser(Q.field("title").match_term("merge"))),
            ],
            "rid long, qjson string",
        )
        out = query_join_dsl(two_field_idx, df, "qjson", other_id_col="rid")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert self._scored_scans(plan) == 2, plan
        got: dict = {}
        for r in out.collect():
            if r["match_doc_id"] is not None:
                got.setdefault(r["rid"], []).append(
                    (r["match_doc_id"], round(r["score"], 6), r["rank"])
                )
        for rid, q in [
            (1, Q.field("body").match_term("spark")),
            (2, Q.field("title").match_term("merge")),
        ]:
            want = sorted(
                (r["doc_id"], round(r["score"], 6), r["rank"])
                for r in search(two_field_idx, q, k=10).collect()
            )
            assert sorted(got[rid]) == want, rid

    def test_phrase_union_pruned_to_used_field(self, spark, two_field_idx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl
        from sparksearchengine_spark.operators.search import search

        df = spark.createDataFrame(
            [(1, _ser(Q.field("title").match_phrase("title beta")))],
            "rid long, qjson string",
        )
        out = query_join_dsl(two_field_idx, df, "qjson", other_id_col="rid")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly one positions-carrying postings branch: the plan reads
        # the postings cache once, for the one phrase field
        assert plan.count("positions#") > 0
        got = sorted(
            (r["match_doc_id"], round(r["score"], 6))
            for r in out.collect()
            if r["match_doc_id"] is not None
        )
        want = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in search(
                two_field_idx, Q.field("title").match_phrase("title beta")
            ).collect()
        )
        assert got == want

    def test_mt_vocab_scan_field_pushdown(self, spark, two_field_idx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl
        from sparksearchengine_spark.operators.search import search

        df = spark.createDataFrame(
            [(1, _ser(Q.field("body").match_wildcard("spar*")))],
            "rid long, qjson string",
        )
        out = query_join_dsl(two_field_idx, df, "qjson", other_id_col="rid")
        got = sorted(
            (r["match_doc_id"], round(r["score"], 6))
            for r in out.collect()
            if r["match_doc_id"] is not None
        )
        want = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in search(
                two_field_idx, Q.field("body").match_wildcard("spar*")
            ).collect()
        )
        assert got == want


class TestDedupPlanContract:
    def test_window_input_is_deduped_frame(self, spark, jidx, monkeypatch):
        # the rank window must run over the DEDUPED frame (one row set
        # per distinct tree, keyed by the sha256 execution key) — never
        # per original row; the fan-back join is k-bounded per key
        import sparksearchengine_spark.operators.joindsl as jd

        seen: list = []
        orig = jd.topk_per_group

        def spy(df, group_cols, order_cols, k, **kw):
            seen.append(df)
            return orig(df, group_cols, order_cols, k, **kw)

        monkeypatch.setattr(jd, "topk_per_group", spy)
        qa = Q.field("text").match_term("spark")
        qb = Q.field("text").match_text("fast engine")
        rows = [(i, _ser(qa)) for i in range(20)] + [
            (100 + i, _ser(qb)) for i in range(20)
        ]
        df = spark.createDataFrame(rows, "rid long, qjson string")
        out = jd.query_join_dsl(
            jidx, df, "qjson", k=2, other_id_col="rid", dedup_queries=True
        )
        collected = out.collect()
        assert len(seen) == 1
        keys = [
            r["query_id"]
            for r in seen[0].select("query_id").distinct().collect()
        ]
        # exactly the 2 distinct trees reach the window, as sha256 keys
        assert len(keys) == 2
        assert all(
            isinstance(x, str)
            and len(x) == 64
            and set(x) <= set("0123456789abcdef")
            for x in keys
        )
        # fan-back is k-bounded per original row
        per_rid: dict = {}
        for r in collected:
            if r["match_doc_id"] is not None:
                per_rid.setdefault(r["rid"], []).append(r)
        assert len(per_rid) == 40
        assert all(len(v) <= 2 for v in per_rid.values())


class TestHugeIntFilterRouting:
    def test_int_past_2_53_routes_to_compiled_tier(
        self, spark, jidx, monkeypatch
    ):
        # |v| > 2^53: the data path's double cast could compare
        # differently than the compiled plan's typed literal, so the
        # row must route to the compiled (general) tier — observed via
        # a compile() spy — and still return the single-query result
        import sparksearchengine_spark.operators.index as index_mod
        from sparksearchengine_spark.operators.joindsl import query_join_dsl
        from sparksearchengine_spark.operators.search import search

        big = 2**53 + 1
        q = Q.field("text").match_term("fast") & F_.le("views", big)
        df = spark.createDataFrame(
            [(1, _ser(q))], "rid long, qjson string"
        )
        calls: list = []
        orig = index_mod.SearchIndex.compile

        def spy(self, qq):  # type: ignore[no-untyped-def]
            calls.append(qq)
            return orig(self, qq)

        monkeypatch.setattr(index_mod.SearchIndex, "compile", spy)
        out = query_join_dsl(jidx, df, "qjson", other_id_col="rid")
        got = sorted(
            (r["match_doc_id"], round(r["score"], 6))
            for r in out.collect()
            if r["match_doc_id"] is not None
        )
        assert len(calls) == 1  # general tier compiled it
        want = sorted(
            (r["doc_id"], round(r["score"], 6))
            for r in search(jidx, q, k=10).collect()
        )
        assert got == want

    def test_exactly_2_53_routes_to_compiled_tier(
        self, spark, jidx, monkeypatch
    ):
        # STRICT bound (r8 advice): a literal of EXACTLY ±2^53 must ride
        # the compiled tier too — the neighboring long 2^53+1 casts to
        # the identical double, so the data tier would falsely match
        # =, <=, and range-hi compares against such attributes
        import sparksearchengine_spark.operators.index as index_mod
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        calls: list = []
        orig = index_mod.SearchIndex.compile

        def spy(self, qq):  # type: ignore[no-untyped-def]
            calls.append(qq)
            return orig(self, qq)

        monkeypatch.setattr(index_mod.SearchIndex, "compile", spy)
        for v in (2**53, -(2**53)):
            q = Q.field("text").match_term("fast") & F_.le("views", v)
            df = spark.createDataFrame(
                [(1, _ser(q))], "rid long, qjson string"
            )
            query_join_dsl(jidx, df, "qjson", other_id_col="rid").collect()
        assert len(calls) == 2  # both compiled, neither on the data tier

    def test_in_range_int_stays_on_data_path(self, spark, jidx, monkeypatch):
        import sparksearchengine_spark.operators.index as index_mod
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        q = Q.field("text").match_term("fast") & F_.le("views", 40)
        df = spark.createDataFrame(
            [(1, _ser(q))], "rid long, qjson string"
        )
        calls: list = []
        orig = index_mod.SearchIndex.compile

        def spy(self, qq):  # type: ignore[no-untyped-def]
            calls.append(qq)
            return orig(self, qq)

        monkeypatch.setattr(index_mod.SearchIndex, "compile", spy)
        out = query_join_dsl(jidx, df, "qjson", other_id_col="rid")
        out.collect()
        assert not calls  # terms tier with a signature slot, no compile


class TestSingleCanonJoinShape:
    """One distinct general canon: the per-branch literal would fold the
    equi-join into a BNLJ with the query-id side as build side
    (registry-scale at a million rows sharing one tree). The explicit
    path broadcasts the id frame only when probed small, else forces a
    shuffle-based CartesianProduct."""

    def _rows(self, spark, n):
        q = ~Q.field("text").match_term("spark")
        return spark.createDataFrame(
            [(i, _ser(q)) for i in range(n)], "rid long, qjson string"
        )

    def test_small_broadcasts_and_matches_search(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        df = self._rows(spark, 7)
        out = query_join_dsl(jidx, df, "qjson", other_id_col="rid")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
        got: dict = {}
        for r in out.collect():
            if r["match_doc_id"] is not None:
                got.setdefault(r["rid"], []).append(
                    (r["match_doc_id"], round(r["score"], 6), r["rank"])
                )
        want = _single(jidx, ~Q.field("text").match_term("spark"))
        assert len(got) == 7
        for rid in range(7):
            assert sorted(got[rid]) == want

    def test_probe_sizes_general_subset_not_full_batch(
        self, spark, jidx, monkeypatch
    ):
        # r8 advice: the broadcast decision must probe the general-shape
        # id subset actually cross-joined, not the full mixed batch — a
        # large batch with FEW general rows still broadcasts. Shrink the
        # budget so the 12-row batch fails the probe but the 2 general
        # rows pass; the plan must be a broadcast, not a CartesianProduct.
        import sparksearchengine_spark.operators.joindsl as jmod
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        monkeypatch.setattr(jmod, "BROADCAST_MAX_QUERY_ROWS", 5)
        gq = ~Q.field("text").match_term("spark")
        rows = [(i, _ser(Q.field("text").match_term("fast")))
                for i in range(10)]
        rows += [(100, _ser(gq)), (101, _ser(gq))]
        df = spark.createDataFrame(rows, "rid long, qjson string")
        out = query_join_dsl(jidx, df, "qjson", other_id_col="rid")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        got = {
            r["rid"]
            for r in out.collect()
            if r["match_doc_id"] is not None and r["rid"] >= 100
        }
        assert got == {100, 101}

    def test_forced_large_is_shuffle_cartesian(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        df = self._rows(spark, 7)
        out = query_join_dsl(
            jidx, df, "qjson", other_id_col="rid", broadcast_queries=False
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # forced non-broadcast: the id side must NOT be a nested-loop
        # build side — shuffle-replicated cartesian instead
        assert "CartesianProduct" in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        n = sum(
            1 for r in out.collect() if r["match_doc_id"] is not None
        )
        assert n == 7 * len(
            _single(jidx, ~Q.field("text").match_term("spark"))
        )


class TestSigSlotCountMismatch:
    """Signatures with DIFFERENT slot counts share the one terms-tier
    branch; the fused predicate indexes fvals with F.get (0-indexed,
    NULL out of bounds) because rows of a shorter signature would make
    element_at throw under Spark 4's default ANSI mode before the fsig
    AND-guard short-circuits (evaluation order is not guaranteed)."""

    def test_mixed_slot_counts_one_batch(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl
        from sparksearchengine_spark.plans.serde import query_from_json

        rows = [
            # 2 filter slots
            (1, _ser(
                Q.field("text").match_term("fast")
                & F_.ge("views", 10) & F_.le("views", 100)
            )),
            # 1 filter slot — its fvals array is SHORTER
            (2, _ser(Q.field("text").match_term("fast") & F_.ge("views", 10))),
            # 0 filter slots (plain) in the same branch
            (3, _ser(Q.field("text").match_term("fast"))),
        ]
        df = spark.createDataFrame(rows, "rid long, qjson string")
        out = query_join_dsl(jidx, df, "qjson", other_id_col="rid")
        got: dict = {}
        for r in out.collect():
            if r["match_doc_id"] is not None:
                got.setdefault(r["rid"], []).append(
                    (r["match_doc_id"], round(r["score"], 6), r["rank"])
                )
        for rid, qjson in rows:
            want = _single(jidx, query_from_json(qjson))
            assert sorted(got.get(rid, [])) == want, rid


class TestSigTierOneAgg:
    def test_mixed_plain_and_sigs_one_scored_scan(self, spark, jidx):
        # plain terms + two signatures in one batch: the terms tier must
        # evaluate its score aggregation ONCE (one scored-postings scan),
        # not once per union branch — signatures dispatch per row on
        # fsig inside a single branch
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        rows = [
            (1, _ser(Q.field("text").match_term("fast"))),
            (2, _ser(Q.field("text").match_term("fast") & F_.ge("views", 10))),
            (3, _ser(Q.field("text").match_term("fast") & F_.between("views", 5, 30))),
            (4, _ser(Q.field("text").match_term("spark") & F_.ge("views", 20))),
        ]
        df = spark.createDataFrame(rows, "rid long, qjson string")
        out = query_join_dsl(jidx, df, "qjson", other_id_col="rid")
        import re

        plan = out._jdf.queryExecution().executedPlan().toString()
        scans = len(
            re.findall(r"InMemoryTableScan \[[^\]]*tscore#", plan)
        )
        assert scans == 1, plan
        got: dict = {}
        for r in out.collect():
            if r["match_doc_id"] is not None:
                got.setdefault(r["rid"], []).append(
                    (r["match_doc_id"], round(r["score"], 6), r["rank"])
                )
        for rid, qjson in rows:
            from sparksearchengine_spark.plans.serde import query_from_json

            want = _single(jidx, query_from_json(qjson))
            assert sorted(got.get(rid, [])) == want, rid


class TestTermBucketPruningAsData:
    """r8 verdict #4: on a save(term_buckets=n) layout, the terms-as-
    data tiers must prune the postings scan too — the bucket key is
    computable FROM the data (crc32(term) % n on the query side,
    semi-joined against the _tbucket partition column), so Spark's
    dynamic partition pruning reads only the touched buckets instead
    of all n. Driver-literal queries already pruned (qc19/qc20); this
    closes the delta for query_join_dsl / percolate_dsl_df."""

    @pytest.fixture(scope="class")
    def bucketed(self, jidx, corpus_df, tmp_path_factory):
        from sparksearchengine_spark import SearchIndex

        path = str(tmp_path_factory.mktemp("tbp") / "bidx")
        jidx.save(path, term_buckets=8)
        return SearchIndex.load(corpus_df.sparkSession, path, corpus_df)

    def _regs(self, spark):
        rows = [
            (1, _ser(Q.field("text").match_any("fast", "spark"))),
            (2, _ser(Q.field("text").match_phrase("segment merge"))),
            (3, _ser(
                Q.field("text").match_term("engine") & F_.ge("views", 10)
            )),
        ]
        return spark.createDataFrame(rows, "rid long, qjson string")

    def test_dpp_partition_filters_in_plan(self, spark, bucketed):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        out = query_join_dsl(
            bucketed, self._regs(spark), "qjson", k=5, other_id_col="rid"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the bucketed postings scans carry a runtime partition filter
        # fed by the query side's derived bucket set
        assert "dynamicpruning" in plan, plan
        assert "_tbucket" in plan, plan
        # both data tiers (terms join + phrase positions join) prune
        assert plan.count("dynamicpruning#") >= 2, plan

    def test_results_match_unbucketed(self, spark, jidx, bucketed):
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        def rows(ix):
            return sorted(
                (r["rid"], r["match_doc_id"], round(r["score"], 6),
                 r["rank"])
                for r in query_join_dsl(
                    ix, self._regs(spark), "qjson", k=5, other_id_col="rid"
                ).collect()
                if r["match_doc_id"] is not None
            )

        got, want = rows(bucketed), rows(jidx)
        assert got == want and got

    def test_percolate_matches_too(self, spark, jidx, bucketed):
        from sparksearchengine_spark.operators.joindsl import (
            percolate_dsl_df,
        )

        def rows(ix):
            return sorted(
                (r["query_id"], r["doc_id"], round(r["score"], 6))
                for r in percolate_dsl_df(
                    ix, self._regs(spark), "qjson", "rid"
                ).collect()
            )

        got, want = rows(bucketed), rows(jidx)
        assert got == want and got

    def test_pattern_tier_prunes_via_matched_terms(self, spark, bucketed):
        # wildcard terms are matched against the vocabulary first; the
        # postings join then prunes buckets from the MATCHED terms
        from sparksearchengine_spark.operators.joindsl import query_join_dsl
        from sparksearchengine_spark.plans.parser import parse_query

        rows = [(1, _ser(parse_query("fas*", "text")))]
        qdf = spark.createDataFrame(rows, "rid long, qjson string")
        out = query_join_dsl(bucketed, qdf, "qjson", k=5, other_id_col="rid")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan, plan
        got = sorted(
            r["match_doc_id"]
            for r in out.collect()
            if r["match_doc_id"] is not None
        )
        assert got == [1, 2, 4, 5]

    def test_batch_and_join_surfaces_prune_and_match(
        self, spark, jidx, bucketed
    ):
        # every other postings consumer rides the same prune: batch
        # search (terms as data -> DPP), driver-literal DSL batch
        # (static isin), more_like_this (derived keywords -> DPP),
        # query_join (tokenized text -> DPP), PRF (driver literals)
        from sparksearchengine_spark.operators.search import (
            batch_search,
            batch_search_dsl,
            more_like_this,
            query_join,
        )

        qdf = spark.createDataFrame(
            [(1, "fast spark"), (2, "segment merge")],
            "query_id long, qtext string",
        )

        def canon(df, cols):
            return sorted(
                tuple(
                    round(r[c], 6) if isinstance(r[c], float) else r[c]
                    for c in cols
                )
                for r in df.collect()
            )

        for fn, cols in [
            (
                lambda ix: batch_search(ix, qdf, k=5, field="text"),
                ["query_id", "doc_id", "score", "rank"],
            ),
            (
                lambda ix: batch_search_dsl(
                    ix,
                    [(1, Q.field("text").match_any("fast", "spark"))],
                    k=5,
                ),
                ["query_id", "doc_id", "score", "rank"],
            ),
            (
                lambda ix: more_like_this(ix, [1, 3], "text", k=3,
                                          num_terms=2),
                ["src_id", "match_doc_id", "score", "rank"],
            ),
            (
                lambda ix: query_join(
                    ix,
                    spark.createDataFrame(
                        [(1, "fast spark engine")], "rid long, qt string"
                    ),
                    text_col="qt", field="text", k=5, other_id_col="rid",
                ),
                ["rid", "match_doc_id", "score", "rank"],
            ),
            (
                lambda ix: ix.prf_expand_search(
                    "fast spark", k=5, fb_docs=2, fb_terms=3
                ),
                ["doc_id", "score", "rank"],
            ),
        ]:
            got, want = fn(bucketed), fn(jidx)
            assert canon(got, cols) == canon(want, cols), cols
            plan = got._jdf.queryExecution().executedPlan().toString()
            assert (
                "dynamicpruning" in plan
                or "_tbucket#" in plan  # static isin partition filter
            ), (cols, plan[:2000])

    def test_explain_scores_bucketed(self, spark, jidx, bucketed):
        from sparksearchengine_spark.operators.search_ext import (
            explain_scores,
        )

        q = Q.field("text").match_any("fast", "spark")

        def canon(ix):
            return sorted(
                (r["doc_id"], r["term"], round(r["tscore"], 6))
                for r in explain_scores(ix, q).collect()
            )

        got, want = canon(bucketed), canon(jidx)
        assert got == want and got
        # static isin partition prune, and no bucket column leaks out
        out = explain_scores(bucketed, q)
        assert "_tbucket" not in out.columns


class TestPreparedRegistry:
    """prepare_dsl_queries: the standing registry is normalized ONCE
    (one pandas-UDF pass) and reused across percolations/micro-batches
    — results identical to the per-call path, and the per-call path's
    normalization plan is never rebuilt when `prepared=` is given."""

    def _regs(self, spark):
        rows = [
            (1, _ser(Q.field("text").match_any("fast", "spark"))),
            (2, _ser(Q.field("text").match_phrase("segment merge"))),
            (3, _ser(
                Q.field("text").match_term("engine") & F_.ge("views", 10)
            )),
            (4, _ser(~Q.field("text").match_term("spark"))),
        ]
        return spark.createDataFrame(rows, "rid long, qjson string")

    def test_prepared_matches_per_call(self, spark, jidx, monkeypatch):
        import sparksearchengine_spark.operators.joindsl as jmod
        from sparksearchengine_spark.operators.joindsl import (
            percolate_dsl_df,
            prepare_dsl_queries,
            query_join_dsl,
        )

        regs = self._regs(spark)
        want_p = sorted(
            (r["query_id"], r["doc_id"], round(r["score"], 6))
            for r in percolate_dsl_df(jidx, regs, "qjson", "rid").collect()
        )
        want_j = sorted(
            (r["rid"], r["match_doc_id"],
             round(r["score"], 6) if r["score"] is not None else None)
            for r in query_join_dsl(
                jidx, regs, "qjson", k=5, other_id_col="rid"
            ).collect()
        )

        prepared = prepare_dsl_queries(jidx, regs, "qjson", "rid")
        calls: list = []
        orig = jmod._normalized_frame

        def spy(*a, **kw):  # type: ignore[no-untyped-def]
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(jmod, "_normalized_frame", spy)
        got_p = sorted(
            (r["query_id"], r["doc_id"], round(r["score"], 6))
            for r in percolate_dsl_df(
                jidx, regs, "qjson", "rid", prepared=prepared
            ).collect()
        )
        got_j = sorted(
            (r["rid"], r["match_doc_id"],
             round(r["score"], 6) if r["score"] is not None else None)
            for r in query_join_dsl(
                jidx, regs, "qjson", k=5, other_id_col="rid",
                prepared=prepared,
            ).collect()
        )
        assert got_p == want_p and got_p
        assert got_j == want_j and got_j
        assert not calls  # normalization never rebuilt with prepared=
        prepared.unpersist()

    def test_prepared_probe_memoized(self, spark, jidx):
        # the bounded shape-probe collect must run ONCE per prepared
        # registry across repeated percolations (streaming: once per
        # stream, not once per micro-batch); cached ON the frame object
        # — exact, no plan-hash collisions, GC'd with the frame
        from sparksearchengine_spark.operators.joindsl import (
            percolate_dsl_df,
            prepare_dsl_queries,
        )

        regs = self._regs(spark)
        prepared = prepare_dsl_queries(jidx, regs, "qjson", "rid")
        assert not hasattr(prepared, "_ssq_probe_cache")
        n1 = percolate_dsl_df(
            jidx, regs, "qjson", "rid", prepared=prepared
        ).count()
        cached = prepared._ssq_probe_cache
        n2 = percolate_dsl_df(
            jidx, regs, "qjson", "rid", prepared=prepared
        ).count()
        assert n1 == n2 > 0
        assert prepared._ssq_probe_cache is cached  # reused, not rebuilt
        # a different max_plans re-probes (the cap bounds the collect)
        n3 = percolate_dsl_df(
            jidx, regs, "qjson", "rid", prepared=prepared, max_plans=32
        ).count()
        assert n3 == n1
        assert prepared._ssq_probe_cache[0] == 32
        prepared.unpersist()

    def test_prepared_with_dedup_queries(self, spark, jidx):
        # composition: prepared registry + execute-per-distinct-tree —
        # the dedup path re-keys on the prepared frame's xkey and fans
        # results back to every original row
        from sparksearchengine_spark.operators.joindsl import (
            percolate_dsl_df,
            prepare_dsl_queries,
        )

        q = Q.field("text").match_term("fast")
        rows = [(i, _ser(q)) for i in range(5)] + [
            (9, _ser(Q.field("text").match_term("merge")))
        ]
        regs = spark.createDataFrame(rows, "rid long, qjson string")
        prepared = prepare_dsl_queries(jidx, regs, "qjson", "rid")
        want = sorted(
            (r["query_id"], r["doc_id"], round(r["score"], 6))
            for r in percolate_dsl_df(jidx, regs, "qjson", "rid").collect()
        )
        got = sorted(
            (r["query_id"], r["doc_id"], round(r["score"], 6))
            for r in percolate_dsl_df(
                jidx, regs, "qjson", "rid",
                prepared=prepared, dedup_queries=True,
            ).collect()
        )
        assert got == want and got
        prepared.unpersist()

    def test_prepared_needs_explicit_id(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import (
            prepare_dsl_queries,
            query_join_dsl,
        )

        regs = self._regs(spark)
        prepared = prepare_dsl_queries(jidx, regs, "qjson", "rid")
        with pytest.raises(ValueError, match="other_id_col"):
            query_join_dsl(jidx, regs, "qjson", k=5, prepared=prepared)
        prepared.unpersist()

    def test_prepare_without_index_needs_schema(self, spark, jidx):
        from sparksearchengine_spark.operators.joindsl import (
            prepare_dsl_queries,
        )

        regs = self._regs(spark)
        with pytest.raises(ValueError, match="text_cols"):
            prepare_dsl_queries(None, regs, "qjson", "rid")
        # the streaming form: schema inputs instead of an index
        prepared = prepare_dsl_queries(
            None, regs, "qjson", "rid",
            text_cols=dict(jidx.corpus.text_cols),
            corpus_cols=list(jidx.corpus.df.columns),
        )
        assert "shape" in prepared.columns
        prepared.unpersist()


class TestRandomAstEquivalence:
    """Seeded random-AST fuzz of the tier dispatcher: EVERY generated
    tree must produce identical (doc, score, rank) results through
    query_join_dsl (shape-grouped executor tiers) and search() (the
    compiler) — one batch call, per-row comparison. Covers the routing
    seams the hand-written cases bracket: nested booleans around data-
    tier shapes, filters with every value class, boosts, slop phrases,
    patterns, OOV terms."""

    def _gen(self, rng, depth=0):
        from sparksearchengine_spark.plans.ast import F_, Q

        f = Q.field("text")
        vocab = ["spark", "engine", "fast", "scan", "merge", "segment",
                 "lucene", "oil", "cars", "zzz_oov"]
        t = lambda: rng.choice(vocab)
        leaf_makers = [
            lambda: f.match_term(t()),
            lambda: f.match_any(t(), t()),
            lambda: f.match_all(t(), t()),
            lambda: f.match_min(2, t(), t(), t()),
            lambda: f.match_text(f"{t()} {t()}"),
            lambda: f.match_phrase(f"{t()} {t()}", slop=rng.choice([0, 1, 2])),
            lambda: f.match_wildcard(rng.choice(["fa*", "s*k", "me?ge"])),
            lambda: f.match_fuzzy(rng.choice(["sparc", "engin"]), max_edits=1),
            lambda: F_.ge("views", rng.randint(0, 60)),
            lambda: F_.between("views", rng.randint(0, 20), rng.randint(30, 70)),
            lambda: F_.eq("lang", rng.choice(["en", "it", "xx"])),
            lambda: F_.isin("views", 10, 25, 40),
            lambda: F_.exists("lang"),
        ]
        if depth >= 2:
            return rng.choice(leaf_makers)()
        r = rng.random()
        if r < 0.45:
            return rng.choice(leaf_makers)()
        if r < 0.65:
            return self._gen(rng, depth + 1) & self._gen(rng, depth + 1)
        if r < 0.80:
            return self._gen(rng, depth + 1) | self._gen(rng, depth + 1)
        if r < 0.90:
            return ~self._gen(rng, depth + 1)
        return self._gen(rng, depth + 1).boost(rng.choice([0.5, 2.0]))

    def test_forty_random_trees_match_search(self, spark, jidx):
        import random

        from sparksearchengine_spark.operators.joindsl import query_join_dsl
        from sparksearchengine_spark.plans.serde import query_from_json

        rng = random.Random(20260815)
        rows = []
        while len(rows) < 40:
            q = self._gen(rng)
            try:
                rows.append((len(rows), _ser(q)))
            except ValueError:
                continue  # e.g. a filter-only tree the DSL rejects
        df = spark.createDataFrame(rows, "rid long, qjson string")
        out = query_join_dsl(jidx, df, "qjson", k=10, other_id_col="rid")
        got: dict = {}
        for r in out.collect():
            got.setdefault(r["rid"], [])
            if r["match_doc_id"] is not None:
                got[r["rid"]].append(
                    (r["match_doc_id"], round(r["score"], 6), r["rank"])
                )
        for rid, qjson in rows:
            want = _single(jidx, query_from_json(qjson))
            assert sorted(got[rid]) == want, (rid, qjson)


class TestBucketedMultiField:
    """Two searchable fields on a term-bucketed save: the per-field
    prune frames (`prune_terms.where(field == f)`) must route each
    field's buckets to ITS scan — results identical to in-memory."""

    def test_two_field_batch(self, spark, tmp_path):
        from sparksearchengine_spark import (
            Corpus,
            SearchIndex,
            TextOptions,
        )
        from sparksearchengine_spark.operators.joindsl import query_join_dsl

        df = spark.createDataFrame(
            [
                (1, "spark engine fast", "alpha beta"),
                (2, "fast merge scan", "beta gamma"),
                (3, "lucene segment merge", "alpha gamma delta"),
                (4, "engine oil fast spark", "delta beta"),
            ],
            "doc_id long, text string, title string",
        )
        tc = {
            "text": TextOptions(analyzer="simple", positions=True),
            "title": TextOptions(analyzer="simple", positions=True),
        }
        idx = Corpus(df, id_col="doc_id", text_cols=tc).build_index()
        path = str(tmp_path / "mf")
        idx.save(path, term_buckets=8)
        loaded = SearchIndex.load(spark, path, df)

        rows = [
            (1, _ser(Q.field("text").match_term("fast"))),
            (2, _ser(Q.field("title").match_term("beta"))),
            (3, _ser(
                Q.field("text").match_any("spark", "merge")
                & Q.field("title").match_term("gamma")
            )),
            (4, _ser(Q.field("title").match_phrase("alpha beta"))),
        ]
        qdf = spark.createDataFrame(rows, "rid long, qjson string")

        def canon(ix):
            return sorted(
                (r["rid"], r["match_doc_id"], round(r["score"], 6))
                for r in query_join_dsl(
                    ix, qdf, "qjson", k=5, other_id_col="rid"
                ).collect()
                if r["match_doc_id"] is not None
            )

        got, want = canon(loaded), canon(idx)
        assert got == want and got
        idx.unpersist()
        loaded.unpersist()

