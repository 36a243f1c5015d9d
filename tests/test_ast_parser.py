"""AST builder + query-string parser unit tests (reference DSL grammar
`dsl/package.scala:9-45`, parseQuery Q12 `DslQuery.scala:122-128`)."""

from __future__ import annotations

import pytest

from sparksearchengine_spark.plans import ast
from sparksearchengine_spark.plans.ast import F_, Q
from sparksearchengine_spark.plans.parser import parse_query


def test_builders_produce_expected_nodes():
    f = Q.field("text")
    assert f.match_term("x") == ast.MatchTerm("text", "x")
    assert f.match_all("a", "b") == ast.MatchTermSet("text", ("a", "b"), 2)
    assert f.match_any("a", "b") == ast.MatchTermSet("text", ("a", "b"), 1)
    assert f.match_min(2, "a", "b", "c") == ast.MatchTermSet(
        "text", ("a", "b", "c"), 2
    )
    assert f.match_text("a b") == ast.MatchText("text", "a b", False)
    assert f.match_all_text("a b") == ast.MatchText("text", "a b", True)
    assert f.match_phrase("a b") == ast.MatchPhrase("text", "a b")
    assert Q.all() == ast.AllDocs()


def test_boolean_operators_compose():
    a, b, c = (Q.field("t").match_term(x) for x in "abc")
    assert a & b == ast.And((a, b))
    assert a | b == ast.Or((a, b))
    assert ~a == ast.Not(a)
    assert (a & b) & c == ast.And((a, b, c))  # flattening via __and__
    assert (a | b) | c == ast.Or((a, b, c))


def test_term_set_validation():
    with pytest.raises(ValueError):
        ast.MatchTermSet("t", (), 1)
    with pytest.raises(ValueError):
        ast.MatchTermSet("t", ("a",), 2)
    with pytest.raises(ValueError):
        ast.MatchTermSet("t", ("a",), 0)


def test_filter_builders():
    assert F_.eq("v", 1) == ast.CompareFilter("v", "=", 1)
    assert F_.gt("v", 1).op == ">"
    assert F_.between("v", 1, 5) == ast.RangeFilter("v", 1, 5)
    assert F_.isin("v", 1, 2) == ast.InSetFilter("v", (1, 2))
    assert F_.exists("v") == ast.ExistsFilter("v")
    assert F_.missing("v") == ast.MissingFilter("v")
    with pytest.raises(ValueError):
        ast.RangeFilter("v", None, 5)
    with pytest.raises(ValueError):
        ast.CompareFilter("v", "!=", 1)


def test_parser_terms_and_boolean():
    q = parse_query("island AND sea", default_field="text")
    assert q == ast.And(
        (ast.MatchText("text", "island", False), ast.MatchText("text", "sea", False))
    )
    q = parse_query("a OR b")
    assert isinstance(q, ast.Or)
    q = parse_query("NOT a")
    assert q == ast.Not(ast.MatchText("text", "a", False))


def test_parser_bare_adjacency_is_or():
    q = parse_query("island sea")
    assert isinstance(q, ast.Or) and len(q.operands) == 2


def test_parser_field_prefix_and_phrase():
    q = parse_query('title:island AND "exact phrase"')
    assert q == ast.And(
        (
            ast.MatchText("title", "island", False),
            ast.MatchPhrase("text", "exact phrase"),
        )
    )
    q = parse_query('body:"a b"')
    assert q == ast.MatchPhrase("body", "a b")


def test_parser_parens_and_minus():
    q = parse_query("(a OR b) AND -c")
    assert isinstance(q, ast.And)
    assert isinstance(q.operands[0], ast.Or)
    assert q.operands[1] == ast.Not(ast.MatchText("text", "c", False))


def test_parser_plus_is_noop():
    assert parse_query("+a") == ast.MatchText("text", "a", False)


def test_parser_prohibited_in_bare_group_is_must_not():
    # Lucene semantics: 'a -b' = docs with a, EXCLUDING b — the Not is
    # hoisted out of the OR group, never unioned in.
    q = parse_query("a -b")
    assert q == ast.And(
        (
            ast.MatchText("text", "a", False),
            ast.Not(ast.MatchText("text", "b", False)),
        )
    )
    q = parse_query("a b -c")
    assert isinstance(q, ast.And)
    assert isinstance(q.operands[0], ast.Or)  # shoulds stay an OR
    assert q.operands[1] == ast.Not(ast.MatchText("text", "c", False))
    # pure-negative group: And of MUST_NOTs (compiler legalizes w/ AllDocs)
    q = parse_query("-a -b")
    assert isinstance(q, ast.And)
    assert all(isinstance(op, ast.Not) for op in q.operands)


def test_parser_prohibited_semantics_on_index(tiny_index):
    # doc1='A b a!', doc2='a C', doc3='b b; c c' — 'a -b' must hit only doc2
    res = tiny_index.compile(parse_query("a -b")).collect()
    assert [r["doc_id"] for r in res] == [2]


def test_parser_errors():
    with pytest.raises(ValueError):
        parse_query("(a OR b")
    with pytest.raises(ValueError):
        parse_query(")")


def test_parser_boost():
    q = parse_query("island^2")
    assert q == ast.Boost(ast.MatchText("text", "island", False), 2.0)
    q = parse_query('"exact phrase"^1.5')
    assert q == ast.Boost(ast.MatchPhrase("text", "exact phrase"), 1.5)
    q = parse_query("title:island^3 AND sea")
    assert q == ast.And(
        (
            ast.Boost(ast.MatchText("title", "island", False), 3.0),
            ast.MatchText("text", "sea", False),
        )
    )
    q = parse_query("(a OR b)^2")
    assert isinstance(q, ast.Boost) and isinstance(q.operand, ast.Or)


def test_parser_boost_scores_multiply(tiny_index):
    from sparksearchengine_spark.plans.parser import parse_query as pq

    plain = {
        r["doc_id"]: r["score"]
        for r in tiny_index.compile(pq("a")).collect()
    }
    boosted = {
        r["doc_id"]: r["score"]
        for r in tiny_index.compile(pq("a^2")).collect()
    }
    assert set(plain) == set(boosted)
    for d, s in plain.items():
        assert boosted[d] == pytest.approx(2.0 * s)


def test_parser_ranges():
    q = parse_query("views:[10 TO 20]")
    assert q == ast.RangeFilter("views", 10, 20)
    q = parse_query("views:[-1.5 TO 2]")
    assert q == ast.RangeFilter("views", -1.5, 2)
    q = parse_query("views:[10 TO *]")
    assert q == ast.CompareFilter("views", ">=", 10)
    q = parse_query("views:[* TO 20]")
    assert q == ast.CompareFilter("views", "<=", 20)
    q = parse_query('date:["2024-01-01" TO "2024-12-31"]')
    assert q == ast.RangeFilter("date", "2024-01-01", "2024-12-31")
    q = parse_query("a AND views:[1 TO 5]")
    assert isinstance(q, ast.And)


def test_parser_exclusive_ranges():
    """Full Lucene bracket syntax (reference `dsl/DslQuery.scala:122-128`):
    `{`/`}` exclude their bound, mixed brackets allowed."""
    q = parse_query("views:{1 TO 5}")
    assert q == ast.And(
        (
            ast.CompareFilter("views", ">", 1),
            ast.CompareFilter("views", "<", 5),
        )
    )
    q = parse_query("views:[1 TO 5}")
    assert q == ast.And(
        (
            ast.CompareFilter("views", ">=", 1),
            ast.CompareFilter("views", "<", 5),
        )
    )
    q = parse_query("views:{1 TO 5]")
    assert q == ast.And(
        (
            ast.CompareFilter("views", ">", 1),
            ast.CompareFilter("views", "<=", 5),
        )
    )
    # open bounds take the strictness of their closing bracket
    assert parse_query("views:{1 TO *}") == ast.CompareFilter(
        "views", ">", 1
    )
    assert parse_query("views:{* TO 5}") == ast.CompareFilter(
        "views", "<", 5
    )
    # both open -> exists, same as the inclusive form
    assert parse_query("views:{* TO *}") == ast.ExistsFilter("views")


def test_exclusive_range_semantics_on_index(tiny_index):
    # tiny corpus views: 10, 20, 30
    got = sorted(
        r["doc_id"]
        for r in tiny_index.compile(parse_query("views:{10 TO 30}")).collect()
    )
    assert got == [2]
    got = sorted(
        r["doc_id"]
        for r in tiny_index.compile(parse_query("views:[10 TO 30}")).collect()
    )
    assert got == [1, 2]


def test_parser_wildcard_and_fuzzy_nodes():
    assert parse_query("te*t") == ast.MatchWildcard("text", "te*t")
    assert parse_query("te?t") == ast.MatchWildcard("text", "te?t")
    assert parse_query("prefix*") == ast.MatchWildcard("text", "prefix*")
    assert parse_query("title:du*") == ast.MatchWildcard("title", "du*")
    assert parse_query("fuzzy~") == ast.MatchFuzzy("text", "fuzzy", 2)
    assert parse_query("fuzzy~1") == ast.MatchFuzzy("text", "fuzzy", 1)
    q = parse_query("du*^2")
    assert q == ast.Boost(ast.MatchWildcard("text", "du*"), 2.0)


def test_parser_unsupported_syntax_errors_not_misparses():
    with pytest.raises(ValueError):
        parse_query("a~b~c")  # unparseable fuzzy
    with pytest.raises(ValueError):
        parse_query("views:{1 TO 5")  # unbalanced range bracket


def test_wildcard_fuzzy_semantics_on_index(tiny_index):
    # tiny corpus terms: a, b, c. wildcard over a custom multi-char check
    # is exercised on docs_index below; here the fuzzy edit distance:
    # 'b~1' matches a, b, c (lev<=1 for single chars) -> all 3 docs
    res = tiny_index.compile(parse_query("b~1")).collect()
    assert sorted(r["doc_id"] for r in res) == [1, 2, 3]
    assert all(r["score"] == 1.0 for r in res)


def test_wildcard_matches_prefix_on_docs(docs_index):
    import pyspark.sql.functions as F

    got = docs_index.compile(parse_query("dup*"))
    # must be a superset of the exact 'dup' matches
    exact = docs_index.compile(parse_query("dup")).select("doc_id")
    missing = exact.join(got.select("doc_id"), "doc_id", "left_anti").count()
    assert missing == 0
    # and every matched doc really contains a token starting with 'dup'
    n = got.count()
    want = (
        docs_index.corpus.df.where(
            F.exists(
                F.split(F.lower("text"), r"[^a-z0-9]+"),
                lambda t: t.startswith("dup"),
            )
        ).count()
    )
    assert n == want


def test_raw_query_default_constructor():
    q = Q.raw("free text here", default_field="body")
    assert q == ast.MatchText("body", "free text here", False)


def test_query_constructor_pluggable():
    from sparksearchengine_spark.plans.ast import set_query_constructor

    try:
        set_query_constructor(lambda s, f: ast.MatchTerm(f, s))
        assert Q.raw("x", "t") == ast.MatchTerm("t", "x")
    finally:
        set_query_constructor(
            lambda s, f: ast.MatchText(f, s, require_all=False)
        )


# ----------------------------------------------------------------------
# escaping + regex terms (r5; reference accepts the full Lucene
# QueryParser syntax, `dsl/DslQuery.scala:122-128`)
# ----------------------------------------------------------------------


def test_escaped_specials_parse_as_literal_terms():
    assert parse_query(r"c\+\+") == ast.MatchText("text", "c++", False)
    assert parse_query(r"\-foo") == ast.MatchText("text", "-foo", False)
    assert parse_query(r"path\:x") == ast.MatchText("text", "path:x", False)
    assert parse_query(r"\[tag\]") == ast.MatchText("text", "[tag]", False)
    assert parse_query(r"\(x\)") == ast.MatchText("text", "(x)", False)
    assert parse_query(r"a\\b") == ast.MatchText("text", "a\\b", False)
    assert parse_query(r"up\^2") == ast.MatchText("text", "up^2", False)
    assert parse_query(r"q\"x") == ast.MatchText("text", 'q"x', False)


def test_escaped_wildcard_and_fuzzy_chars_are_literals():
    # \* and \? never trigger the wildcard form
    assert parse_query(r"te\*t") == ast.MatchText("text", "te*t", False)
    assert parse_query(r"te\?t") == ast.MatchText("text", "te?t", False)
    # \~ never triggers fuzzy
    assert parse_query(r"x\~1") == ast.MatchText("text", "x~1", False)
    # mixed: unescaped * still wins, escape pair preserved in pattern
    q = parse_query(r"a\*b*c")
    assert q == ast.MatchWildcard("text", r"a\*b*c")


def test_escapes_inside_field_scoped_and_boolean_context():
    q = parse_query(r"title:c\+\+ AND body:\-x")
    assert q == ast.And(
        (
            ast.MatchText("title", "c++", False),
            ast.MatchText("body", "-x", False),
        )
    )


def test_escaped_quote_inside_phrase():
    q = parse_query(r'"say \"hi\" now"')
    assert q == ast.MatchPhrase("text", 'say "hi" now', slop=0)


def test_regex_term_parses():
    assert parse_query("text:/du[pm]/") == ast.MatchRegex("text", "du[pm]")
    assert parse_query("/ab+c/") == ast.MatchRegex("text", "ab+c")
    # \/ is the only escape consumed by the regex token
    assert parse_query(r"text:/a\/b/") == ast.MatchRegex("text", "a/b")
    # other backslashes pass through to the regex dialect
    assert parse_query(r"text:/\d+/") == ast.MatchRegex("text", r"\d+")


def test_regex_composes_with_booleans_and_boost():
    # NOT operands in an OR group hoist to MUST_NOT (Lucene legalization)
    q = parse_query("NOT /du[pm]/ OR title:/x?y/^2")
    assert q == ast.And(
        (
            ast.Boost(ast.MatchRegex("title", "x?y"), 2.0),
            ast.Not(ast.MatchRegex("text", "du[pm]")),
        )
    )
    q2 = parse_query("/a+/ AND /b+/")
    assert q2 == ast.And(
        (ast.MatchRegex("text", "a+"), ast.MatchRegex("text", "b+"))
    )


def test_wildcard_constant_score_literal_star(tiny_index):
    # escaped-star pattern: no term contains a literal '*', so no hits
    from sparksearchengine_spark.plans.ast import MatchWildcard

    res = tiny_index.compile(
        ast.And((MatchWildcard("text", r"\*a*"),))
    ).collect()
    assert res == []


def test_regex_semantics_on_index(docs_index):
    import pyspark.sql.functions as F

    got = docs_index.compile(parse_query("text:/dup[a-z]*/"))
    n = got.count()
    want = (
        docs_index.corpus.df.where(
            F.exists(
                F.split(F.lower("text"), r"[^a-z0-9]+"),
                lambda t: t.rlike("^dup[a-z]*$"),
            )
        ).count()
    )
    assert n == want and n > 0
    res = got.collect()
    assert all(r["score"] == 1.0 for r in res)


class TestSlashHint:
    def test_unterminated_regex_error_hints_escape(self):
        from sparksearchengine_spark.plans.parser import parse_query

        with pytest.raises(ValueError, match=r"escape literal slashes"):
            parse_query("path:/usr")

    def test_escaped_slashes_parse_as_term(self):
        from sparksearchengine_spark.plans.parser import parse_query

        q = parse_query(r"path:\/usr\/bin")
        assert getattr(q, "text", None) == "/usr/bin"


class TestParserTotality:
    """parse_query over arbitrary input must either return a Query or
    raise ValueError — never any other exception (the user-facing
    contract for free-typed query strings)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def test_total_over_random_text(self, s):
        from sparksearchengine_spark.plans.ast import Query
        from sparksearchengine_spark.plans.parser import parse_query

        try:
            q = parse_query(s)
        except ValueError:
            return
        assert isinstance(q, Query)

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.sampled_from(
                ["field:", "a", "b*", "c~1", '"p q"', "(", ")", "AND",
                 "OR", "NOT", "+", "-", "[1 TO 2]", "{1 TO 2}", "/re/",
                 "\\+", "^2", " "]
            ),
            max_size=8,
        )
    )
    def test_total_over_token_soup(self, parts):
        from sparksearchengine_spark.plans.ast import Query
        from sparksearchengine_spark.plans.parser import parse_query

        try:
            q = parse_query("".join(parts))
        except ValueError:
            return
        assert isinstance(q, Query)
