"""Mini query-string parser (reference Q12 `parseQuery`).

The reference delegates to Lucene's QueryParser at search time
(`dsl/DslQuery.scala:122-128`, noted expensive and non-thread-safe). We
parse a practical subset into the AST:

    term                      -> MatchText(default_field, term)
    "quoted phrase"           -> MatchPhrase
    field:term                -> MatchText(field, term)
    field:"quoted phrase"     -> MatchPhrase(field, ...)
    field:(a b c)             -> MatchAny over the terms
    a AND b, a OR b, NOT a    -> And / Or / Not (left-assoc, NOT > AND > OR)
    +term / -term             -> required / prohibited (inside one group)
    parentheses               -> grouping

Bare adjacency ("a b") means OR (SHOULD), matching Lucene's default
operator.
"""

from __future__ import annotations

import re

from sparksearchengine_spark.plans import ast

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<and>AND\b)
      | (?P<or>OR\b)
      | (?P<not>NOT\b)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<phrase>"[^"]*")
      | (?P<fieldterm>[A-Za-z_][\w.]*:)
      | (?P<term>[^\s()+\-"][^\s()"]*)
    )""",
    re.VERBOSE,
)


class _Tokens:
    def __init__(self, s: str) -> None:
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if not m or m.end() == pos:
                if s[pos:].strip():
                    raise ValueError(f"cannot tokenize query at: {s[pos:]!r}")
                break
            pos = m.end()
            for name, val in m.groupdict().items():
                if val is not None:
                    self.toks.append((name, val))
                    break
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t


def parse_query(s: str, default_field: str = "text") -> ast.Query:
    toks = _Tokens(s)
    q = _parse_or(toks, default_field)
    if toks.peek() is not None:
        raise ValueError(f"trailing tokens in query: {toks.toks[toks.i:]}")
    return q


def _parse_or(toks: _Tokens, field: str) -> ast.Query:
    operands = [_parse_and(toks, field)]
    while True:
        nxt = toks.peek()
        if nxt and nxt[0] == "or":
            toks.next()
            operands.append(_parse_and(toks, field))
        elif nxt and nxt[0] not in ("rparen",):
            # bare adjacency = OR (Lucene default operator)
            operands.append(_parse_and(toks, field))
        else:
            break
    if len(operands) == 1:
        return operands[0]
    # Lucene legalization: NOT/minus operands are MUST_NOT *within the
    # group*, not a union branch — 'a -b' means (a) AND NOT (b), never
    # OR(a, NOT b) (which would match nearly everything). Hoist them.
    shoulds = [op for op in operands if not isinstance(op, ast.Not)]
    nots = [op for op in operands if isinstance(op, ast.Not)]
    if not nots:
        return ast.Or(tuple(operands))
    if not shoulds:  # pure-negative group -> And of MUST_NOTs (compiler
        return ast.And(tuple(nots))  # legalizes with AllDocs)
    should_q = shoulds[0] if len(shoulds) == 1 else ast.Or(tuple(shoulds))
    return ast.And((should_q, *nots))


def _parse_and(toks: _Tokens, field: str) -> ast.Query:
    operands = [_parse_unary(toks, field)]
    while True:
        nxt = toks.peek()
        if nxt and nxt[0] == "and":
            toks.next()
            operands.append(_parse_unary(toks, field))
        else:
            break
    return operands[0] if len(operands) == 1 else ast.And(tuple(operands))


def _parse_unary(toks: _Tokens, field: str) -> ast.Query:
    nxt = toks.peek()
    if nxt is None:
        raise ValueError("unexpected end of query")
    kind, _ = nxt
    if kind in ("not", "minus"):
        toks.next()
        return ast.Not(_parse_unary(toks, field))
    if kind == "plus":  # '+' = required; a no-op outside boolean groups
        toks.next()
        return _parse_unary(toks, field)
    return _parse_primary(toks, field)


def _parse_primary(toks: _Tokens, field: str) -> ast.Query:
    kind, val = toks.next()
    if kind == "lparen":
        q = _parse_or(toks, field)
        closing = toks.peek()
        if not closing or closing[0] != "rparen":
            raise ValueError("unbalanced parenthesis in query")
        toks.next()
        return q
    if kind == "phrase":
        return ast.MatchPhrase(field, val.strip('"'))
    if kind == "fieldterm":
        new_field = val[:-1]
        return _parse_primary(toks, new_field)
    if kind == "term":
        return ast.MatchText(field, val, require_all=False)
    raise ValueError(f"unexpected token {kind} {val!r}")
