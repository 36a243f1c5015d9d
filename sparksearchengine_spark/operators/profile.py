"""One-pass corpus/table profiling.

Before a 100 TB table enters a training pipeline you profile it: row
counts, null rates, exact distinct cardinalities, ranges, totals. Doing
that one column at a time is N full scans; `profile_columns` computes
every column's statistics in ONE aggregate pass and unpivots the single
result row into a (column, stats) table with a scan-stage explode —
no second job, no driver-side loop over data.

Engine-exact by construction: counts are longs, min/max of numerics stay
doubles (no string formatting, which differs across engines), and sums
run through an exact DECIMAL cast (order-independent — double summation
order would differ between partial-agg trees and engines) before casting
back. The driver's DuckDB oracle reproduces every expression verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_NUMERIC = (
    ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    sum_decimal: str = "decimal(28,6)",
) -> DataFrame:
    """Per-column statistics in one aggregate job:

    `(column, dtype, n_rows, n_null, n_distinct, min_num, max_num,
    sum_num, mean_num, min_str, max_str)`

    * numeric columns fill the ``*_num`` fields (min/max as double; sum
      through an exact ``sum_decimal`` cast so the total is independent
      of partial-aggregation order; mean = that sum / non-null count);
    * string columns fill ``min_str``/``max_str`` (binary collation);
    * date/timestamp columns report min/max formatted as ISO strings;
    * ``n_distinct`` is EXACT (count distinct — one expand, still a
      single job); swap for approx_count_distinct upstream if a profile
      of a 100 TB table may not afford the expand.

    The unpivot is an array-of-structs explode of the one aggregated
    row — scan-stage, no extra shuffle beyond the aggregation itself.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nl_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_mx_{c}"))
            aggs.append(
                F.sum(F.col(c).cast(sum_decimal)).cast("double").alias(f"_sm_{c}")
            )
        elif isinstance(dt, StringType):
            aggs.append(F.min(F.col(c)).alias(f"_mns_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"_mxs_{c}"))
        elif isinstance(dt, DateType):
            aggs.append(F.min(F.col(c)).cast("string").alias(f"_mns_{c}"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"_mxs_{c}"))
        elif isinstance(dt, (TimestampType, TimestampNTZType)):
            fmt = "yyyy-MM-dd HH:mm:ss"
            aggs.append(
                F.date_format(F.min(F.col(c)), fmt).alias(f"_mns_{c}")
            )
            aggs.append(
                F.date_format(F.max(F.col(c)), fmt).alias(f"_mxs_{c}")
            )
        # other types (arrays, structs, maps, binary): counts only
    row = df.agg(*aggs)

    def _entry(c: str):
        dt = df.schema[c].dataType
        is_num = isinstance(dt, _NUMERIC)
        has_str = not is_num and f"_mns_{c}" in row.columns
        n_ok = (F.col("_n") - F.col(f"_nl_{c}")).cast("double")
        return F.struct(
            F.lit(c).alias("column"),
            F.lit(dt.simpleString()).alias("dtype"),
            F.col(f"_nl_{c}").alias("n_null"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            (F.col(f"_mn_{c}") if is_num else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"_mx_{c}") if is_num else F.lit(None).cast("double")).alias(
                "max_num"
            ),
            (F.col(f"_sm_{c}") if is_num else F.lit(None).cast("double")).alias(
                "sum_num"
            ),
            (
                F.when(n_ok > 0, F.col(f"_sm_{c}") / n_ok)
                if is_num
                else F.lit(None).cast("double")
            ).alias("mean_num"),
            (F.col(f"_mns_{c}") if has_str else F.lit(None).cast("string")).alias(
                "min_str"
            ),
            (F.col(f"_mxs_{c}") if has_str else F.lit(None).cast("string")).alias(
                "max_str"
            ),
        )

    entries = F.array(*[_entry(c) for c in cols])
    return row.select(
        F.col("_n").alias("n_rows"), F.explode(entries).alias("e")
    ).select("e.column", "e.dtype", "n_rows", "e.n_null", "e.n_distinct",
             "e.min_num", "e.max_num", "e.sum_num", "e.mean_num",
             "e.min_str", "e.max_str")
