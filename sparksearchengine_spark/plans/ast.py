"""Query AST: the Python analog of the reference's DSL.

Reference grammar (`dsl/package.scala:9-45`) builds a tree of
`DslQuery` / `Filter` case classes (`dsl/DslQuery.scala`,
`dsl/Filter.scala`) that compile to Lucene queries. Ours are frozen
dataclasses that `plans.compiler` turns into DataFrame plans.

Builder surface (reference: implicit ``String -> QueryBuilder``,
`dsl/package.scala:47-132`):

    Q.all()
    Q.field("text").match_term("island")           # Q5  matchTerm
    Q.field("text").match_all("a", "b")            # Q6  matchAll
    Q.field("text").match_any("a", "b")            # Q7  matchAny
    Q.field("text").match_min(2, "a", "b", "c")    # Q8  matchMin
    Q.field("text").match_text("free text")        # Q9  matchText
    Q.field("text").match_all_text("free text")    # Q10 matchAllText
    Q.field("text").match_phrase("exact phrase")   # Q11 matchPhrase
    Q.parse('text:(island OR sea) AND "fast scan"')# Q12 parseQuery
    q1 & q2, q1 | q2, ~q                           # Q2/Q3/Q4

Filters (non-scoring, reference `dsl/Filter.scala` — all wrap their Lucene
query in ``Occur.FILTER``, i.e. zero score contribution):

    F_.eq("views", 10); F_.gt(...); F_.ge(...); F_.lt(...); F_.le(...)
    F_.between("views", 1, 5); F_.isin("size", 1, 2)
    F_.exists("summary"); F_.missing("summary")
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence


class Query:
    """Base node. Composable with &, |, ~ (reference Q2/Q3/Q4)."""

    def __and__(self, other: "Query") -> "Query":
        return And((self, other))

    def __or__(self, other: "Query") -> "Query":
        return Or((self, other))

    def __invert__(self) -> "Query":
        return Not(self)

    def boost(self, factor: float) -> "Query":
        return Boost(self, float(factor))


# --- full-text queries (scored) -------------------------------------------


@dataclass(frozen=True)
class AllDocs(Query):
    """Q1 — every doc, constant score 1.0 (`DslQuery.scala:24-28`)."""


@dataclass(frozen=True)
class MatchTerm(Query):
    """Q5 — exact, un-analyzed single term (`DslQuery.scala:98-102`)."""

    field: str
    term: str


@dataclass(frozen=True)
class MatchTermSet(Query):
    """Q6/Q7/Q8 — matchAll / matchAny / matchMin n over a term set
    (`DslQuery.scala:63-96`). ``min_match`` semantics:
    len(terms) => matchAll; 1 => matchAny; n => matchMin."""

    field: str
    terms: tuple[str, ...]
    min_match: int

    def __post_init__(self) -> None:
        if not self.terms:
            raise ValueError("term set must be non-empty")
        if not (1 <= self.min_match <= len(self.terms)):
            raise ValueError(
                f"min_match {self.min_match} out of range for {len(self.terms)} terms"
            )


@dataclass(frozen=True)
class MatchText(Query):
    """Q9/Q10 — analyze text at query time; OR (require_all=False) or AND
    (require_all=True) of produced terms (`DslQuery.scala:104-114`)."""

    field: str
    text: str
    require_all: bool = False


@dataclass(frozen=True)
class MatchPhrase(Query):
    """Q11 — analyzed terms must appear consecutively; needs positions
    (`DslQuery.scala:116-120`).

    ``slop`` relaxes adjacency: terms must appear IN ORDER with at most
    ``slop`` total extra gap (span - (n-1) <= slop). This is the ordered
    subset of Lucene's sloppy PhraseQuery — Lucene additionally admits
    out-of-order arrangements at edit-cost >= 2; we document and keep the
    ordered semantics (deterministic, windowable at scale)."""

    field: str
    text: str
    slop: int = 0


@dataclass(frozen=True)
class MatchNear(Query):
    """Proximity match (unordered NEAR): every analyzed term occurs
    within ``window`` positions of some single occurrence of the FIRST
    term (the anchor), in any order — Lucene's unordered SpanNearQuery
    shape with the anchor-window simplification (deterministic, and the
    check is per-candidate-doc array work, not a positions cross-join).
    Needs positions. Scored like matchAllText (sum of the terms' BM25
    contributions — proximity gates membership, not the score)."""

    field: str
    text: str
    window: int = 5


@dataclass(frozen=True)
class MatchWildcard(Query):
    """Q12 wildcard (`te*t`, `te?t` — Lucene WildcardQuery via the
    QueryParser, `dsl/DslQuery.scala:122-128`). Pattern is matched against
    the indexed (analyzed, lowercased) terms; constant score 1.0 per doc —
    Lucene's own default rewrite for multi-term queries
    (CONSTANT_SCORE_BLENDED degenerates to constant here)."""

    field: str
    pattern: str

    def __post_init__(self) -> None:
        # only UNESCAPED * / ? count — \* is a literal asterisk
        i, found = 0, False
        while i < len(self.pattern):
            if self.pattern[i] == "\\":
                i += 2
                continue
            if self.pattern[i] in "*?":
                found = True
                break
            i += 1
        if not found:
            raise ValueError("wildcard pattern needs * or ?")


@dataclass(frozen=True)
class MatchRegex(Query):
    """Q12 regex term (`field:/re/` — Lucene RegexpQuery via the
    QueryParser, `dsl/DslQuery.scala:122-128`). The pattern must match a
    WHOLE indexed term (Lucene's implicit anchoring); evaluated against
    the vocabulary (termstats) and never per-posting, then expanded like
    any multi-term query — constant score 1.0 per doc. The dialect is
    the engine's regex (Java on the JVM); the Lucene-compatible common
    subset (literals, classes, alternation, quantifiers) behaves
    identically."""

    field: str
    pattern: str

    def __post_init__(self) -> None:
        if not self.pattern:
            raise ValueError("empty regex pattern")


@dataclass(frozen=True)
class MatchFuzzy(Query):
    """Q12 fuzzy (`term~`, `term~1` — Lucene FuzzyQuery). Matches indexed
    terms within ``max_edits`` Levenshtein distance; constant score 1.0
    per doc (documented simplification of Lucene's distance-decayed
    boost)."""

    field: str
    term: str
    max_edits: int = 2

    def __post_init__(self) -> None:
        if not (1 <= self.max_edits <= 2):
            raise ValueError("max_edits must be 1 or 2 (Lucene's bound)")


@dataclass(frozen=True)
class And(Query):
    """Q2 — all operands match; scores sum (`DslQuery.scala:30-37`)."""

    operands: tuple[Query, ...]

    def __and__(self, other: Query) -> Query:
        return And(self.operands + (other,))


@dataclass(frozen=True)
class Or(Query):
    """Q3 — any operand matches; matched scores sum (`DslQuery.scala:39-46`)."""

    operands: tuple[Query, ...]

    def __or__(self, other: Query) -> Query:
        return Or(self.operands + (other,))


@dataclass(frozen=True)
class Boost(Query):
    """Q12 boost (`term^2` in Lucene QueryParser syntax): the operand's
    scores are multiplied by ``factor``. Matching set is unchanged."""

    operand: Query
    factor: float

    def __post_init__(self) -> None:
        if self.factor < 0:
            raise ValueError("boost factor must be non-negative")


@dataclass(frozen=True)
class Not(Query):
    """Q4 — complement. Top-level ``not q`` is legalized to
    ``all & ~q`` exactly like the reference (`DslQuery.scala:54-60`);
    our compiler's anti-join does that rewrite implicitly."""

    operand: Query


# --- filters (non-scoring) ------------------------------------------------


class Filter(Query):
    """Marker base: matches contribute score 0.0 (Occur.FILTER analog)."""


@dataclass(frozen=True)
class CompareFilter(Filter):
    """F1-F5 — =, >, >=, <, <= (`dsl/Filter.scala:110-148`)."""

    field: str
    op: str  # one of = > >= < <=
    value: Any

    _OPS = ("=", ">", ">=", "<", "<=")

    def __post_init__(self) -> None:
        if self.op not in self._OPS:
            raise ValueError(f"bad op {self.op!r}")


@dataclass(frozen=True)
class RangeFilter(Filter):
    """F6 — closed interval (`dsl/Filter.scala:150-157`)."""

    field: str
    lo: Any
    hi: Any

    def __post_init__(self) -> None:
        if self.lo is None or self.hi is None:
            raise ValueError("range bounds must be non-null")


@dataclass(frozen=True)
class InSetFilter(Filter):
    """F7 — membership (`dsl/Filter.scala:159-165`)."""

    field: str
    values: tuple[Any, ...]


@dataclass(frozen=True)
class ExistsFilter(Filter):
    """F8 — field present (non-NULL). The reference's quirk — `exists` on
    numeric Point fields never matches (`Filter.scala:167-173`) — is fixed
    here: `IS NOT NULL` works on every type (SURVEY §4.4.3)."""

    field: str


@dataclass(frozen=True)
class MissingFilter(Filter):
    """F9 — field absent (NULL) (`dsl/Filter.scala:175-183`)."""

    field: str


# --- builders -------------------------------------------------------------


@dataclass(frozen=True)
class FieldRef:
    name: str

    def match_term(self, term: str) -> MatchTerm:
        return MatchTerm(self.name, term)

    def match_all(self, *terms: str) -> MatchTermSet:
        return MatchTermSet(self.name, tuple(terms), min_match=len(terms))

    def match_any(self, *terms: str) -> MatchTermSet:
        return MatchTermSet(self.name, tuple(terms), min_match=1)

    def match_min(self, n: int, *terms: str) -> MatchTermSet:
        return MatchTermSet(self.name, tuple(terms), min_match=n)

    def match_text(self, text: str) -> MatchText:
        return MatchText(self.name, text, require_all=False)

    def match_all_text(self, text: str) -> MatchText:
        return MatchText(self.name, text, require_all=True)

    def match_phrase(self, text: str, slop: int = 0) -> MatchPhrase:
        return MatchPhrase(self.name, text, slop=slop)

    def match_near(self, text: str, window: int = 5) -> MatchNear:
        return MatchNear(self.name, text, window=window)

    def match_regex(self, pattern: str) -> MatchRegex:
        return MatchRegex(self.name, pattern)

    def match_wildcard(self, pattern: str) -> MatchWildcard:
        return MatchWildcard(self.name, pattern)

    def match_fuzzy(self, term: str, max_edits: int = 2) -> MatchFuzzy:
        return MatchFuzzy(self.name, term, max_edits=max_edits)


class Q:
    """Query builder namespace."""

    @staticmethod
    def all() -> AllDocs:
        return AllDocs()

    @staticmethod
    def field(name: str) -> FieldRef:
        return FieldRef(name)

    @staticmethod
    def raw(query_string: str, default_field: str = "text") -> Query:
        """Q13 — RawQuery: impl-defined string query. Default constructor =
        analyzed boolean (OR) query over a default field
        (`DefaultQueryConstructor.scala:10-17`). Pluggable via
        `set_query_constructor`."""
        return _query_constructor(query_string, default_field)

    @staticmethod
    def parse(query_string: str, default_field: str = "text") -> Query:
        """Q12 — parse a Lucene-ish query syntax subset (terms, quoted
        phrases, AND/OR/NOT, field:term, field:(a b c), +term, -term,
        term^boost, field:[a TO b] / {a TO b} ranges, te*t wildcards,
        term~n fuzzy, field:/re/ regex terms, and backslash-escaped
        specials per Lucene QueryParser rules)."""
        from sparksearchengine_spark.plans.parser import parse_query

        return parse_query(query_string, default_field)


def _default_query_constructor(s: str, default_field: str) -> Query:
    return MatchText(default_field, s, require_all=False)


_query_constructor = _default_query_constructor


def set_query_constructor(fn) -> None:  # type: ignore[no-untyped-def]
    """Swap the RawQuery constructor (reference `QueryConstructor.scala:7-10`,
    configured `LuceneConfig.scala:125-129`)."""
    global _query_constructor
    _query_constructor = fn


class F_:
    """Filter builder namespace (underscore avoids clashing with
    pyspark.sql.functions' customary ``F`` alias)."""

    @staticmethod
    def eq(field: str, value: Any) -> CompareFilter:
        return CompareFilter(field, "=", value)

    @staticmethod
    def gt(field: str, value: Any) -> CompareFilter:
        return CompareFilter(field, ">", value)

    @staticmethod
    def ge(field: str, value: Any) -> CompareFilter:
        return CompareFilter(field, ">=", value)

    @staticmethod
    def lt(field: str, value: Any) -> CompareFilter:
        return CompareFilter(field, "<", value)

    @staticmethod
    def le(field: str, value: Any) -> CompareFilter:
        return CompareFilter(field, "<=", value)

    @staticmethod
    def between(field: str, lo: Any, hi: Any) -> RangeFilter:
        return RangeFilter(field, lo, hi)

    @staticmethod
    def isin(field: str, *values: Any) -> InSetFilter:
        return InSetFilter(field, tuple(values))

    @staticmethod
    def exists(field: str) -> ExistsFilter:
        return ExistsFilter(field)

    @staticmethod
    def missing(field: str) -> MissingFilter:
        return MissingFilter(field)


def expand_synonyms(query: Query, synonyms: dict[str, "list[str] | tuple[str, ...]"]) -> Query:
    """Query-time synonym expansion (Lucene SynonymGraphFilter / ES
    search-time synonyms) as a PURE AST rewrite — the index never
    changes, so synonym dictionaries can evolve without a re-index:

    * ``MatchTerm(t)``         -> OR over {t} ∪ synonyms[t]
    * ``MatchTermSet``         -> matchAny expands its term set in
      place (flat union); matchAll rewrites each term to a nested
      matchAny (term OR its synonyms) AND'd together; matchMin with
      1 < n < k is REFUSED (an exact n-of-k-groups count is not
      expressible without exponential blowup — restructure instead);
    * ``MatchText``            -> each whitespace token with a synonym
      group gains the alternatives (require_all preserved: every
      original token must still match via itself or a synonym);
    * boolean operators / boosts / filters recurse; phrase, near,
      wildcard, regex, fuzzy and filters pass through UNCHANGED
      (position and pattern semantics do not compose with word-level
      alternatives — Lucene's graph filter has the same carve-outs).

    Scoring note: an expanded term scores with ITS OWN statistics (a
    rare synonym scores higher than a common original) — the standard
    query-expansion behavior, same as Lucene's SynonymQuery-less
    rewrite. Deterministic: alternatives keep dictionary order after
    the original term.

    Multi-word entries: dictionary KEYS must be single tokens (lookup
    is per-token; a space-containing key could never fire and is
    rejected up front). A multi-word VALUE ("usa" -> "united states")
    is rejected in the MatchTerm/MatchTermSet paths — those operate on
    vocabulary tokens, where a space-containing term is a silent
    no-match — and rewritten to a ``MatchPhrase`` (consecutive words)
    in the MatchText path, the same contraction Lucene's
    SynonymGraphFilter models as a multi-token side path.
    """
    syn = {k: tuple(v) for k, v in synonyms.items()}
    for k in syn:
        if len(k.split()) != 1:
            raise ValueError(
                "expand_synonyms: synonym keys must be single tokens "
                f"(lookup is per-token); got key {k!r}"
            )

    def alts(term: str) -> tuple[str, ...]:
        extra = tuple(s for s in syn.get(term, ()) if s != term)
        return (term, *extra)

    def token_alts(term: str) -> tuple[str, ...]:
        """Alternatives for a TOKEN context (MatchTerm/MatchTermSet):
        multi-word values cannot match the tokenized vocabulary."""
        a = alts(term)
        bad = [s for s in a if len(s.split()) != 1]
        if bad:
            raise ValueError(
                "expand_synonyms: multi-word synonym value(s) "
                f"{bad!r} for term {term!r} cannot be applied to a "
                "term-level query (terms are single vocabulary "
                "tokens); use matchText, or expand to a phrase "
                "manually"
            )
        return a

    def rewrite(q: Query) -> Query:
        if isinstance(q, MatchTerm):
            a = token_alts(q.term)
            if len(a) == 1:
                return q
            return MatchTermSet(q.field, a, min_match=1)
        if isinstance(q, MatchTermSet):
            groups = [token_alts(t) for t in q.terms]
            if all(len(g) == 1 for g in groups):
                return q
            if q.min_match == 1:  # matchAny: flat union keeps semantics
                flat: list[str] = []
                for g in groups:
                    for t in g:
                        if t not in flat:
                            flat.append(t)
                return MatchTermSet(q.field, tuple(flat), min_match=1)
            # matchAll / matchMin n: each original term satisfied by any
            # of its alternatives; n-of-k semantics preserved via
            # per-term any-groups
            per_term = tuple(
                MatchTerm(q.field, g[0])
                if len(g) == 1
                else MatchTermSet(q.field, g, min_match=1)
                for g in groups
            )
            if q.min_match == len(q.terms):
                return And(per_term)
            # matchMin 1 < n < k with synonym groups would need an
            # n-of-k-GROUPS count the AST cannot express without an
            # exponential OR-of-combinations; refuse loudly rather
            # than silently change semantics
            raise ValueError(
                "expand_synonyms: matchMin with 1 < min_match < "
                "len(terms) cannot be synonym-expanded exactly; "
                "restructure as matchAny/matchAll or expand terms "
                "manually"
            )
        if isinstance(q, MatchText):
            toks = q.text.split()
            expanded = [alts(t) for t in toks]
            if all(len(g) == 1 for g in expanded):
                return q
            def text_alt(t: str) -> Query:
                # A multi-word alternative must match as consecutive
                # words (phrase), not as an OR over its words — else
                # "usa" -> "united states" would match docs containing
                # only "united".
                if len(t.split()) > 1:
                    return MatchPhrase(q.field, t)
                return MatchText(q.field, t, require_all=False)

            per_tok = tuple(
                MatchText(q.field, g[0], require_all=False)
                if len(g) == 1
                else Or(tuple(text_alt(t) for t in g))
                for g in expanded
            )
            if q.require_all:
                return And(per_tok)
            return Or(per_tok)
        if isinstance(q, And):
            return And(tuple(rewrite(o) for o in q.operands))
        if isinstance(q, Or):
            return Or(tuple(rewrite(o) for o in q.operands))
        if isinstance(q, Not):
            return Not(rewrite(q.operand))
        if isinstance(q, Boost):
            return Boost(rewrite(q.operand), q.factor)
        return q

    return rewrite(query)
