r"""Mini query-string parser (reference Q12 `parseQuery`).

The reference delegates to Lucene's QueryParser at search time
(`dsl/DslQuery.scala:122-128`, noted expensive and non-thread-safe). We
parse a practical subset into the AST:

    term                      -> MatchText(default_field, term)
    "quoted phrase"           -> MatchPhrase
    field:term                -> MatchText(field, term)
    field:"quoted phrase"     -> MatchPhrase(field, ...)
    field:(a b c)             -> MatchAny over the terms
    field:[a TO b]            -> RangeFilter (F6); * bound -> one-sided
    field:{a TO b} / [a TO b} -> exclusive bounds -> strict CompareFilters
    a AND b, a OR b, NOT a    -> And / Or / Not (left-assoc, NOT > AND > OR)
    +term / -term             -> required / prohibited (inside one group)
    term^2, "phrase"^1.5      -> Boost (score multiplier)
    te*t / te?t               -> MatchWildcard (constant-score)
    term~ / term~1            -> MatchFuzzy (Levenshtein <= n, default 2)
    "quoted phrase"~n         -> MatchPhrase(slop=n) (ordered sloppy)
    field:/regex/             -> MatchRegex (whole-term match)
    \x                        -> escaped special (literal x)
    parentheses               -> grouping

Bare adjacency ("a b") means OR (SHOULD), matching Lucene's default
operator; prohibited (-) operands in a group are hoisted to MUST_NOT.

Escaping follows Lucene QueryParser (`dsl/DslQuery.scala:122-128`
accepts the full syntax): a backslash makes the next character a
literal term character, so ``c\+\+``, ``\-foo``, ``path\:x``, ``\[a\]``,
``te\*t`` (literal asterisk, not a wildcard), ``\"quote\"`` and ``\\``
all parse as plain terms. Inside quoted phrases ``\"`` and ``\\`` are
unescaped; inside ``/regex/`` only ``\/`` is consumed (all other
backslashes belong to the regex dialect).
"""

from __future__ import annotations

import re

from sparksearchengine_spark.plans import ast

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<lbracket>\[)
      | (?P<rbracket>\])
      | (?P<lbrace>\{)
      | (?P<rbrace>\})
      | (?P<and>AND\b)
      | (?P<or>OR\b)
      | (?P<not>NOT\b)
      | (?P<to>TO\b)
      | (?P<plus>\+)
      | (?P<minus>-)
      | (?P<boost>\^\d+(?:\.\d+)?)
      | (?P<phrase>"(?:[^"\\]|\\.)*")
      | (?P<regex>/(?:[^/\\]|\\.)+/)
      | (?P<fieldterm>[A-Za-z_][\w.]*:)
      | (?P<term>(?:\\.|[^\s()+\-"\[\]{}^\\/])(?:\\.|[^\s()"\[\]{}^\\])*)
    )""",
    re.VERBOSE,
)


def _lex_chars(s: str) -> list[tuple[str, bool]]:
    """Decode backslash escapes: ``[(char, was_escaped), ...]``."""
    out: list[tuple[str, bool]] = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            out.append((s[i + 1], True))
            i += 2
        else:
            out.append((s[i], False))
            i += 1
    return out


def _unescape(s: str) -> str:
    return "".join(c for c, _ in _lex_chars(s))


class _Tokens:
    def __init__(self, s: str) -> None:
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if not m or m.end() == pos:
                if s[pos:].strip():
                    # Lucene semantics: '/' delimits a regex term, so a
                    # bare slash with no closing '/' is unparseable —
                    # point users at the escape instead of a mystery
                    hint = (
                        " ('/' starts a regex term /…/; escape literal "
                        "slashes as \\/)"
                        if s[pos:].lstrip().startswith("/")
                        else ""
                    )
                    raise ValueError(
                        f"cannot tokenize query at: {s[pos:]!r}{hint}"
                    )
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
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of query")
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
    q = _parse_primary_inner(toks, field)
    nxt = toks.peek()
    if nxt and nxt[0] == "boost":  # postfix ^n binds tighter than booleans
        toks.next()
        q = ast.Boost(q, float(nxt[1][1:]))
    return q


def _parse_primary_inner(toks: _Tokens, field: str) -> ast.Query:
    kind, val = toks.next()
    if kind == "lparen":
        q = _parse_or(toks, field)
        closing = toks.peek()
        if not closing or closing[0] != "rparen":
            raise ValueError("unbalanced parenthesis in query")
        toks.next()
        return q
    if kind == "lbracket":
        return _parse_range(toks, field, lo_incl=True)
    if kind == "lbrace":
        return _parse_range(toks, field, lo_incl=False)
    if kind == "phrase":
        slop = 0
        nxt = toks.peek()
        if nxt and nxt[0] == "term":  # postfix "..."~n (sloppy phrase)
            m = re.fullmatch(r"~(\d+)", nxt[1])
            if m:
                toks.next()
                slop = int(m.group(1))
        return ast.MatchPhrase(field, _unescape(val[1:-1]), slop=slop)
    if kind == "regex":
        # Lucene RegexpQuery form field:/re/ — only \/ is consumed here;
        # every other backslash belongs to the regex dialect
        return ast.MatchRegex(field, val[1:-1].replace("\\/", "/"))
    if kind == "fieldterm":
        new_field = val[:-1]
        return _parse_primary_inner(toks, new_field)
    if kind == "term":
        return _classify_term(field, val)
    raise ValueError(f"unexpected token {kind} {val!r}")


def _classify_term(field: str, val: str) -> ast.Query:
    """Plain term, wildcard (te*t), or fuzzy (term~ / term~1) — the Lucene
    QueryParser constructs the reference accepts
    (`dsl/DslQuery.scala:122-128`). Escape-aware: only UNESCAPED ~ * ?
    trigger the fuzzy/wildcard forms; ``te\\*t`` is a plain term with a
    literal asterisk."""
    chars = _lex_chars(val)
    for idx, (ch, esc) in enumerate(chars):
        if ch == "~" and not esc:
            tail = chars[idx + 1 :]
            base = chars[:idx]
            if (
                not base
                or len(tail) > 1
                or (tail and (tail[0][1] or not tail[0][0].isdigit()))
                or any(c in "*?" and not e for c, e in base)
            ):
                raise ValueError(f"cannot parse fuzzy term {val!r}")
            edits = tail[0][0] if tail else ""
            return ast.MatchFuzzy(
                field,
                "".join(c for c, _ in base),
                int(edits) if edits else 2,
            )
    if any(c in "*?" and not e for c, e in chars):
        # keep escape pairs: the compiler's LIKE translation treats \x
        # as a literal, so \* survives as a literal asterisk
        pattern = "".join(("\\" + c) if e else c for c, e in chars)
        return ast.MatchWildcard(field, pattern)
    return ast.MatchText(field, "".join(c for c, _ in chars), require_all=False)


def _parse_range(toks: _Tokens, field: str, lo_incl: bool) -> ast.Query:
    """Full Lucene range syntax (the reference's ``ParsedQuery`` accepts
    it verbatim, `dsl/DslQuery.scala:122-128`): ``[a TO b]`` closed ->
    RangeFilter (F6); ``{a TO b}`` / mixed ``[a TO b}`` exclusive bounds
    -> the matching strict CompareFilters (F2/F4); open bound ``*`` ->
    one-sided CompareFilter."""
    lo = _range_value(toks)
    kind, _ = toks.next()
    if kind != "to":
        raise ValueError("expected TO in range query")
    hi = _range_value(toks)
    closing = toks.next()
    if closing[0] not in ("rbracket", "rbrace"):
        raise ValueError("unbalanced bracket in range query")
    hi_incl = closing[0] == "rbracket"
    if lo is None and hi is None:
        return ast.ExistsFilter(field)
    lo_f = (
        None
        if lo is None
        else ast.CompareFilter(field, ">=" if lo_incl else ">", lo)
    )
    hi_f = (
        None
        if hi is None
        else ast.CompareFilter(field, "<=" if hi_incl else "<", hi)
    )
    if lo_f is None:
        return hi_f
    if hi_f is None:
        return lo_f
    if lo_incl and hi_incl:
        return ast.RangeFilter(field, lo, hi)
    return ast.And((lo_f, hi_f))


def _range_value(toks: _Tokens):  # type: ignore[no-untyped-def]
    kind, val = toks.next()
    neg = False
    if kind == "minus":
        neg = True
        kind, val = toks.next()
    if kind == "phrase":
        return _unescape(val[1:-1])
    if kind != "term":
        raise ValueError(f"bad range bound {val!r}")
    if val == "*" and not neg:
        return None  # open bound
    return _coerce(("-" if neg else "") + _unescape(val))


def _coerce(s: str):  # type: ignore[no-untyped-def]
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s
