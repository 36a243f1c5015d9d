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
    group_by: list[str] | None = None,
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

    ``group_by``: profile per group instead of globally — one row per
    (group, column), the group columns leading. Still ONE aggregate job
    (grouped instead of global); the per-source / per-language quality
    dashboards a curation pipeline actually reads.

    The unpivot is an array-of-structs explode of the aggregated
    rows — scan-stage, no extra shuffle beyond the aggregation itself.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    group_by = list(group_by) if group_by else []
    cols = [c for c in cols if c not in group_by]
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
    row = df.groupBy(*group_by).agg(*aggs) if group_by else df.agg(*aggs)

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
        *group_by, F.col("_n").alias("n_rows"), F.explode(entries).alias("e")
    ).select(*group_by,
             "e.column", "e.dtype", "n_rows", "e.n_null", "e.n_distinct",
             "e.min_num", "e.max_num", "e.sum_num", "e.mean_num",
             "e.min_str", "e.max_str")


def approx_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    rsd: float = 0.05,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """The 100 TB profile: sketch-based statistics in one aggregate pass,
    `(column, dtype, n_rows, n_null, approx_distinct, q_lo, q_med, q_hi)`.

    `profile_columns` keeps EXACT distincts — at 100 TB that is an
    expand whose shuffle carries every distinct value of every column.
    This variant swaps in mergeable sketches whose aggregation state is
    KB-sized per column no matter the data volume:

    * ``approx_count_distinct`` — HyperLogLog++ at relative standard
      deviation ``rsd``. The estimate is deterministic for a given
      dataset (fixed hash; max-based merges are order-independent).
    * ``percentile_approx`` — rank-error ≤ 1/``accuracy`` quantile
      summaries for numeric columns (NULL for non-numerics).

    Use :func:`sketch_accuracy_check` to hold the sketches to their
    advertised error against the exact answers at test scale.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must be non-empty")
    if len(quantiles) != 3:
        raise ValueError("quantiles must be (lo, med, hi)")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nl_{c}"))
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd).alias(f"_ad_{c}")
        )
        if isinstance(dt, _NUMERIC):
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"), list(quantiles), accuracy
                ).alias(f"_q_{c}")
            )
    row = df.agg(*aggs)

    def _entry(c: str):
        dt = df.schema[c].dataType
        is_num = isinstance(dt, _NUMERIC)
        q = F.col(f"_q_{c}") if is_num else None
        nd = F.lit(None).cast("double")
        return F.struct(
            F.lit(c).alias("column"),
            F.lit(dt.simpleString()).alias("dtype"),
            F.col(f"_nl_{c}").alias("n_null"),
            F.col(f"_ad_{c}").alias("approx_distinct"),
            (q.getItem(0) if is_num else nd).alias("q_lo"),
            (q.getItem(1) if is_num else nd).alias("q_med"),
            (q.getItem(2) if is_num else nd).alias("q_hi"),
        )

    entries = F.array(*[_entry(c) for c in cols])
    return row.select(
        F.col("_n").alias("n_rows"), F.explode(entries).alias("e")
    ).select(
        "e.column", "e.dtype", "n_rows", "e.n_null", "e.approx_distinct",
        "e.q_lo", "e.q_med", "e.q_hi",
    )


def sketch_accuracy_check(
    df: DataFrame,
    cols: list[str] | None = None,
    rsd: float = 0.05,
    accuracy: int = 1_000,
    distinct_tol_rsds: float = 3.0,
    rank_tol: float = 0.05,
) -> DataFrame:
    """Harness holding the sketches of :func:`approx_profile` to their
    advertised error against exact answers (the recall-harness pattern —
    approximate operators become *checked* rows, not hopes):

    `(column, distinct_ok, median_rank_ok)` where

    * ``distinct_ok`` — |HLL estimate − exact distinct| ≤
      ``distinct_tol_rsds × rsd × exact`` (HLL++ error is ~Gaussian at
      scale rsd, so 3 rsd is a ≥99.7% bound);
    * ``median_rank_ok`` — the rank of the approximate median is within
      ``0.5 ± (1/accuracy + rank_tol)`` of the true median rank (the
      sketch's contract is rank error, not value error); NULL for
      non-numeric columns.

    Two jobs by construction: one combined exact+sketch aggregate, then
    one rank-validation aggregate over the medians found.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must be non-empty")
    num_cols = [c for c in cols if isinstance(df.schema[c].dataType, _NUMERIC)]
    aggs = []
    for c in cols:
        aggs.append(F.count_distinct(F.col(c)).alias(f"_ed_{c}"))
        aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"_ad_{c}"))
    for c in num_cols:
        aggs.append(
            F.percentile_approx(
                F.col(c).cast("double"), 0.5, accuracy
            ).alias(f"_m_{c}")
        )
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
    r1 = df.agg(*aggs).collect()[0]

    rank_aggs = []
    for c in num_cols:
        if r1[f"_m_{c}"] is None:
            continue
        m = F.lit(r1[f"_m_{c}"])
        # tie-aware rank interval [count(<m), count(<=m)]: a value with
        # heavy ties legitimately covers a wide rank range
        rank_aggs.append(
            F.sum((F.col(c) < m).cast("long")).alias(f"_rlo_{c}")
        )
        rank_aggs.append(
            F.sum((F.col(c) <= m).cast("long")).alias(f"_rhi_{c}")
        )
    r2 = df.agg(*rank_aggs).collect()[0] if rank_aggs else {}

    eps = 1.0 / accuracy + rank_tol
    out = []
    for c in cols:
        exact, apx = r1[f"_ed_{c}"], r1[f"_ad_{c}"]
        d_ok = (
            abs(apx - exact) <= distinct_tol_rsds * rsd * exact
            if exact > 0
            else apx == 0
        )
        m_ok = None
        if c in num_cols and r1[f"_m_{c}"] is not None and r1[f"_nn_{c}"] > 0:
            n = r1[f"_nn_{c}"]
            lo, hi = r2[f"_rlo_{c}"] / n, r2[f"_rhi_{c}"] / n
            # the estimate's rank interval must reach 0.5 within eps
            m_ok = (lo <= 0.5 + eps) and (hi >= 0.5 - eps)
        out.append((c, bool(d_ok), m_ok))
    return df.sparkSession.createDataFrame(
        out, "column string, distinct_ok boolean, median_rank_ok boolean"
    )


def histogram(
    df: DataFrame,
    col: str,
    width: float,
    min_count: int = 0,
) -> DataFrame:
    """Fixed-width numeric histogram (the range-facet / distribution-
    profile aggregation): ``(bin_start, n_rows)`` with
    ``bin_start = floor(x/width)·width``. One partial-agg'd groupBy —
    the shuffle carries ≤ |bins| rows per partition regardless of data
    volume, so it is safe on any column of a 100 TB table. NULLs are
    excluded (they are a null-rate statistic, not a bin). Empty bins
    don't appear (dense ranges belong to the presentation layer).

    ``min_count`` drops sparse bins (long-tail noise in UIs).
    """
    if width <= 0:
        raise ValueError("width must be positive")
    x = F.col(col).cast("double")
    bin_start = F.floor(x / F.lit(float(width))) * F.lit(float(width))
    out = (
        df.where(x.isNotNull())
        .groupBy(bin_start.alias("bin_start"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    if min_count > 0:
        out = out.where(F.col("n_rows") >= min_count)
    return out


def skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    k: int = 10,
) -> DataFrame:
    """Key-skew diagnosis for join/agg planning: the k hottest keys with
    their row counts and share of the table —
    ``(*key_cols, n_rows, share, rank)``, share rounded 6dp.

    The operator behind every "should I salt this join?" decision: a
    key with share ≫ 1/shuffle_partitions serializes one reducer at
    100 TB (this repo's salted ``topk_per_group`` and AQE skew-join are
    the mitigations — this tells you when to reach for them).

    One groupBy(key) count (partial-agg'd: the shuffle carries ≤ |keys|
    rows) + a broadcast 1-row total + TakeOrdered k. NULL keys count as
    a real key — a NULL-heavy foreign key is the classic skew culprit.
    """
    from sparksearchengine_spark.operators.search import ranked_topk

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys or k <= 0:
        raise ValueError("key_cols must be non-empty and k positive")
    counts = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = df.agg(F.count(F.lit(1)).cast("double").alias("_t"))
    scored = counts.crossJoin(F.broadcast(total)).select(
        *keys,
        "n_rows",
        F.round(F.col("n_rows") / F.col("_t"), 6).alias("share"),
    )
    order = [F.col("n_rows").desc()] + [F.asc_nulls_last(c) for c in keys]
    return ranked_topk(scored, order, k)


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    in_decimal: str = "decimal(18,6)",
) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE aggregate
    pass — `(col_a, col_b, n, corr)` for every a < b pair, corr rounded
    6dp.

    Unlike ``F.corr`` (a streaming co-moment whose float accumulation
    order varies with partitioning), every Σx, Σy, Σx², Σy², Σxy here is
    an EXACT decimal sum of ``in_decimal``-cast values (products of two
    18,6 decimals stay within decimal(38,12) exactly), and the closed
    form

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ₜ)(n·Σy² − Σy²ₜ))

    is evaluated once in doubles at the end — deterministic under any
    partitioning and bit-reproducible in any exact-decimal engine (the
    DuckDB oracle). Rows where ANY of ``cols`` is NULL are excluded
    (complete-case, so all pairs share one n and one scan).
    Zero-variance columns yield NULL corr. O(k²) sums but still one
    scan and one KB-sized aggregation state.
    """
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    cond = None
    for c in cols:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else (cond & nn)
    src = df.where(cond)
    dec = {c: F.col(c).cast(in_decimal) for c in cols}
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        aggs.append(F.sum(dec[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(dec[c] * dec[c]).alias(f"_ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.sum(dec[a] * dec[b]).alias(f"_sp_{a}_{b}"))
    row = src.agg(*aggs)

    def _pair(a: str, b: str):
        n = F.col("_n").cast("double")
        sa, sb = (
            F.col(f"_s_{a}").cast("double"),
            F.col(f"_s_{b}").cast("double"),
        )
        ssa, ssb = (
            F.col(f"_ss_{a}").cast("double"),
            F.col(f"_ss_{b}").cast("double"),
        )
        sp = F.col(f"_sp_{a}_{b}").cast("double")
        cov = n * sp - sa * sb
        va = n * ssa - sa * sa
        vb = n * ssb - sb * sb
        return F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.when(
                (va > 0) & (vb > 0),
                F.round(cov / F.sqrt(va * vb), 6),
            ).alias("corr"),
        )

    entries = F.array(
        *[_pair(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    )
    return row.select(
        F.col("_n").alias("n"), F.explode(entries).alias("e")
    ).select("e.col_a", "e.col_b", "n", "e.corr")
