"""Query-AST (de)serialization — the wire format that lets a query tree
ride a DataFrame COLUMN.

The reference's fully general ``queryGenerator: U => DslQuery``
(`SearchableRDD.scala:259-269`) runs arbitrary per-row code because its
rows live in the same JVM as the query objects. In Spark the per-row
query must be DATA, so `operators.joindsl.query_join_dsl` carries each
row's query as a canonical JSON string produced here.

Format: one tagged object per node — ``{"t": "<NodeName>", ...fields}``
— children recursively encoded, emitted with sorted keys and no
whitespace. The encoding is CANONICAL: two structurally equal queries
(`ast` nodes are frozen dataclasses with value equality) serialize to
byte-identical strings, so the string doubles as an exact executor-side
GROUPING KEY — N rows carrying the same tree share one compiled plan
without the driver ever seeing the rows.

Filter values keep their Python type through a JSON-native mapping plus
tagged escapes for date / datetime / Decimal (``{"$d": ...}`` /
``{"$ts": ...}`` / ``{"$dec": ...}``); round-trip is exact
(`query_from_json(query_to_json(q)) == q`).
"""

from __future__ import annotations

import datetime as _dt
import json
from decimal import Decimal
from typing import Any

from sparksearchengine_spark.plans import ast

__all__ = ["query_to_json", "query_from_json"]

_NODES = {
    cls.__name__: cls
    for cls in (
        ast.AllDocs,
        ast.MatchTerm,
        ast.MatchTermSet,
        ast.MatchText,
        ast.MatchPhrase,
        ast.MatchNear,
        ast.MatchWildcard,
        ast.MatchRegex,
        ast.MatchFuzzy,
        ast.And,
        ast.Or,
        ast.Boost,
        ast.Not,
        ast.CompareFilter,
        ast.RangeFilter,
        ast.InSetFilter,
        ast.ExistsFilter,
        ast.MissingFilter,
    )
}


def _enc_val(v: Any) -> Any:
    """Filter-value encoding: JSON natives pass through; date/datetime/
    Decimal get a one-key tag object (dicts are not legal filter values,
    so the tag cannot collide)."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, _dt.datetime):  # before date: datetime IS a date
        return {"$ts": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"$d": v.isoformat()}
    if isinstance(v, Decimal):
        return {"$dec": str(v)}
    raise TypeError(
        f"unsupported filter value type {type(v).__name__!r} "
        "(supported: None, bool, int, float, str, date, datetime, Decimal)"
    )


def _dec_val(v: Any) -> Any:
    if isinstance(v, dict):
        if "$ts" in v:
            return _dt.datetime.fromisoformat(v["$ts"])
        if "$d" in v:
            return _dt.date.fromisoformat(v["$d"])
        if "$dec" in v:
            return Decimal(v["$dec"])
        raise ValueError(f"unknown value tag {sorted(v)}")
    return v


def _enc(q: "ast.Query") -> dict:
    t = type(q).__name__
    if t not in _NODES:
        raise TypeError(f"not a serializable query node: {type(q)!r}")
    if isinstance(q, ast.AllDocs):
        return {"t": t}
    if isinstance(q, ast.MatchTerm):
        return {"t": t, "field": q.field, "term": q.term}
    if isinstance(q, ast.MatchTermSet):
        return {
            "t": t,
            "field": q.field,
            "terms": list(q.terms),
            "min_match": q.min_match,
        }
    if isinstance(q, ast.MatchText):
        return {
            "t": t,
            "field": q.field,
            "text": q.text,
            "require_all": q.require_all,
        }
    if isinstance(q, ast.MatchPhrase):
        return {"t": t, "field": q.field, "text": q.text, "slop": q.slop}
    if isinstance(q, ast.MatchNear):
        return {
            "t": t,
            "field": q.field,
            "text": q.text,
            "window": q.window,
        }
    if isinstance(q, (ast.MatchWildcard, ast.MatchRegex)):
        return {"t": t, "field": q.field, "pattern": q.pattern}
    if isinstance(q, ast.MatchFuzzy):
        return {
            "t": t,
            "field": q.field,
            "term": q.term,
            "max_edits": q.max_edits,
        }
    if isinstance(q, (ast.And, ast.Or)):
        return {"t": t, "operands": [_enc(o) for o in q.operands]}
    if isinstance(q, ast.Boost):
        return {"t": t, "operand": _enc(q.operand), "factor": q.factor}
    if isinstance(q, ast.Not):
        return {"t": t, "operand": _enc(q.operand)}
    if isinstance(q, ast.CompareFilter):
        return {
            "t": t,
            "field": q.field,
            "op": q.op,
            "value": _enc_val(q.value),
        }
    if isinstance(q, ast.RangeFilter):
        return {
            "t": t,
            "field": q.field,
            "lo": _enc_val(q.lo),
            "hi": _enc_val(q.hi),
        }
    if isinstance(q, ast.InSetFilter):
        return {
            "t": t,
            "field": q.field,
            "values": [_enc_val(v) for v in q.values],
        }
    # Exists / Missing
    return {"t": t, "field": q.field}  # type: ignore[union-attr]


def _dec(d: dict) -> "ast.Query":
    if not isinstance(d, dict) or "t" not in d:
        raise ValueError(f"not a query node object: {d!r}")
    t = d["t"]
    cls = _NODES.get(t)
    if cls is None:
        raise ValueError(f"unknown query node type {t!r}")
    if cls is ast.AllDocs:
        return ast.AllDocs()
    if cls is ast.MatchTerm:
        return ast.MatchTerm(d["field"], d["term"])
    if cls is ast.MatchTermSet:
        return ast.MatchTermSet(
            d["field"], tuple(d["terms"]), d["min_match"]
        )
    if cls is ast.MatchText:
        return ast.MatchText(d["field"], d["text"], d["require_all"])
    if cls is ast.MatchPhrase:
        return ast.MatchPhrase(d["field"], d["text"], d["slop"])
    if cls is ast.MatchNear:
        return ast.MatchNear(d["field"], d["text"], d["window"])
    if cls is ast.MatchWildcard:
        return ast.MatchWildcard(d["field"], d["pattern"])
    if cls is ast.MatchRegex:
        return ast.MatchRegex(d["field"], d["pattern"])
    if cls is ast.MatchFuzzy:
        return ast.MatchFuzzy(d["field"], d["term"], d["max_edits"])
    if cls in (ast.And, ast.Or):
        return cls(tuple(_dec(o) for o in d["operands"]))
    if cls is ast.Boost:
        return ast.Boost(_dec(d["operand"]), d["factor"])
    if cls is ast.Not:
        return ast.Not(_dec(d["operand"]))
    if cls is ast.CompareFilter:
        return ast.CompareFilter(d["field"], d["op"], _dec_val(d["value"]))
    if cls is ast.RangeFilter:
        return ast.RangeFilter(d["field"], _dec_val(d["lo"]), _dec_val(d["hi"]))
    if cls is ast.InSetFilter:
        return ast.InSetFilter(
            d["field"], tuple(_dec_val(v) for v in d["values"])
        )
    return cls(d["field"])  # Exists / Missing


def query_to_json(q: "ast.Query") -> str:
    """Canonical JSON for a query tree — sorted keys, no whitespace, so
    structurally equal trees serialize byte-identically (the grouping
    contract `query_join_dsl` relies on)."""
    return json.dumps(
        _enc(q), sort_keys=True, separators=(",", ":"), ensure_ascii=False
    )


def query_from_json(s: str) -> "ast.Query":
    """Inverse of :func:`query_to_json`; raises ``ValueError`` (naming
    the payload) on ANY malformed input — unparseable JSON, unknown
    node tags, and structurally broken nodes (missing fields, wrong
    child types, out-of-range dataclass values) alike, so callers and
    the `joindsl` executor UDF need exactly one exception contract."""
    try:
        d = json.loads(s)
    except (TypeError, json.JSONDecodeError) as e:
        raise ValueError(f"malformed query JSON {s!r}: {e}") from e
    try:
        return _dec(d)
    except ValueError:
        raise
    except (KeyError, TypeError) as e:
        # a well-formed JSON object that is not a valid node encoding
        # (e.g. {"t":"MatchTerm"} with no "term", operands: null)
        raise ValueError(
            f"invalid query node encoding {s!r}: {type(e).__name__}: {e}"
        ) from e
