"""Event-log helpers: semi-structured JSON props extraction + rollups.

Event tables ship their long-tail attributes as a JSON string column
(the `events.props` pattern). Extraction is scan-stage
(`get_json_object` — no UDF, no parse-to-struct materialization), so
typed projections and rollups ride the scan and Catalyst prunes the raw
JSON column away afterwards. Engine-portable: DuckDB's
`json_extract_string` + CAST reproduces the same values, malformed or
missing paths yield NULL in both.

The time-ordered companion operators live in `operators/asof.py`
(as-of enrichment) and `streaming/stream.py` (windows / sessions /
trending).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_field_expr(col: Column, path: str, cast: str | None = None) -> Column:
    """One JSON field as a column: ``get_json_object(col, '$.path')``
    with an optional cast. Missing path / malformed JSON -> NULL (both
    engines)."""
    c = F.get_json_object(col, f"$.{path}")
    return c.cast(cast) if cast else c


def parse_props(
    df: DataFrame,
    fields: dict[str, str],
    props_col: str = "props",
) -> DataFrame:
    """df + one typed column per requested JSON field
    (``{"k": "long", "tag": "string"}``). Scan-stage; the original
    ``props_col`` is kept (drop it downstream once extracted). All
    fields land in ONE projection (a withColumn-per-field loop stacks
    one analyzer pass per field — r3 review)."""
    return df.select(
        "*",
        *[
            json_field_expr(F.col(props_col), name, cast).alias(name)
            for name, cast in fields.items()
        ],
    )


def props_rollup(
    df: DataFrame,
    field: str,
    group_col: str = "event_type",
    props_col: str = "props",
    cast: str = "long",
) -> DataFrame:
    """Grouped numeric rollup of one JSON field:
    `(group, n_events, n_with_field, sum_field, min_field, max_field)`.
    One partial-agg'd groupBy; the JSON extraction stays in the scan
    stage. Integer casts keep the aggregates engine-exact."""
    v = json_field_expr(F.col(props_col), field, cast)
    return df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(v).alias("n_with_field"),
        F.sum(v).alias("sum_field"),
        F.min(v).alias("min_field"),
        F.max(v).alias("max_field"),
    )
