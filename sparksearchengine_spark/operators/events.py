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


def resample_gapfill(
    events: DataFrame,
    interval: int,
    ts_col: str = "ts",
    key_col: str | None = None,
    value_col: str | None = None,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Fixed-interval resampling WITH gap fill: bucket timestamps to
    ``floor(ts/interval)·interval``, aggregate, then emit a row for
    EVERY interval between each series' first and last bucket — empty
    intervals as explicit zeros. `(key?, bucket_ts, n_events[, sum_value])`.

    The metrics-pipeline primitive the windowed counts lack: downstream
    rate/alerting math needs "this hour had 0 events" to be a ROW, not
    an absence. ``ts``/``interval`` are integers (ns in this repo's
    event model) so bucketing is exact; ``sum_value`` goes through the
    repo's 6dp-decimal cast, so totals are engine- and order-exact.

    Plan: one grouped aggregate (buckets bound the shuffle), then a
    per-key min/max roll-up whose ``sequence(min, max, interval)``
    explodes into the dense grid — grid size is (span/interval) per
    key, guarded by ``max_buckets`` so a stray 1970 timestamp cannot
    detonate a billion-row sequence; the grid left-joins the sparse
    counts back. No driver-side time math.
    """
    if interval <= 0:
        raise ValueError("interval must be positive")
    key = [key_col] if key_col else []
    # pure LONG arithmetic: ts − pmod(ts, interval) ≡ floor(ts/interval)
    # ·interval (pmod is non-negative, so negatives floor correctly). A
    # double-division floor would silently lose precision above 2^53 —
    # nanosecond epochs are ~1.7e18
    b = (
        F.col(ts_col) - F.pmod(F.col(ts_col), F.lit(interval))
    ).cast("long")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value")
        )
    sparse = events.groupBy(*key, b.alias("bucket_ts")).agg(*aggs)
    span = sparse.groupBy(*key).agg(
        F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
    )
    n_buckets = (F.col("_hi") - F.col("_lo")) / F.lit(interval) + 1
    # over-budget series produce a NULL sequence -> explode_outer keeps
    # one NULL row -> assert_true fails the JOB loudly instead of
    # silently truncating or detonating a billion-row sequence
    guard_msg = (
        f"resample_gapfill: series exceeds max_buckets={max_buckets}; "
        f"raise max_buckets or widen the interval"
    )
    grid = span.select(
        *key,
        F.explode_outer(
            F.when(
                n_buckets <= max_buckets,
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(interval)),
            )
        ).alias("bucket_ts"),
    )
    chk = F.assert_true(F.col("bucket_ts").isNotNull(), F.lit(guard_msg))
    grid = grid.select(
        *key,
        F.when(chk.isNull(), F.col("bucket_ts")).alias("bucket_ts"),
    )
    out = grid.join(sparse, [*key, "bucket_ts"], "left").select(
        *key,
        "bucket_ts",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        *(
            [F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value")]
            if value_col is not None
            else []
        ),
    )
    return out
