"""Distributed prefix aggregation — the scalable form of the global
(or giant-group) ordered window.

``Window.partitionBy(g).orderBy(...)`` puts one GROUP in one task; with
no partition keys, the whole frame in one task. At 100 TB that is the
single serial stage in an otherwise parallel plan (a one-language
corpus slice is billions of rows). This module implements the classic
two-pass alternative once, for every operator that needs ordered
running totals or ranks:

1. range-partition the frame on the exact sort key (groups + order) —
   one shuffle, same cost as the window's own shuffle;
2. compute the running sum / rank WITHIN each partition (parallel);
3. add per-(partition, group) prefix offsets — a frame of at most
   ``partitions x groups`` rows, computed with windows over THAT tiny
   frame and broadcast back.

Exactness: the range partitioner sends equal keys to one partition, so
* with a TOTAL order (unique key per row in its group) the rows-frame
  running sums match the global window bit-for-bit for integer sums
  (longs are exact under any regrouping);
* ``rank()`` ties share a full sort key, hence a partition, hence a
  local rank — the offset shift preserves tie classes exactly.

Used by ``decontam.vocab_stats`` (Zipf cum-coverage),
``decontam.perplexity_buckets`` (exact percent_rank),
``sampling.select_top_by_budget`` (greedy token-budget prefix).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["distributed_prefix"]

_PID = "_dp_pid"
_CNT = "_dp_cnt"


def distributed_prefix(
    df: DataFrame,
    order: Sequence[Column],
    groups: Sequence[str] = (),
    sum_cols: Mapping[str, str] | None = None,
    rank_col: str | None = None,
    group_count_col: str | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Add ordered running totals / ranks without a serial window.

    ``order``: Column sort expressions (include direction). For
    ``sum_cols`` the order must be TOTAL within each group (a unique
    tiebreak column); for ``rank_col`` alone, ties are allowed and
    share a rank, exactly like ``F.rank()`` over the global window.
    ``sum_cols``: ``{source_col: output_col}`` — inclusive running sum
    of ``source_col`` cast to long (integer sums stay engine-exact).
    ``rank_col``: 1-based rank over (groups-partitioned) ``order``.
    ``group_count_col``: total row count of the row's group (the ``n``
    of percent_rank); with no groups, the frame's row count.

    The range-partitioned frame is pinned with a lazy ``localCheckpoint``
    — the offsets branch and the data branch MUST see the same partition
    assignment, and RangePartitioner samples its bounds, so two
    independent evaluations could split differently (same hazard and
    same fix as ``chunking.pack_chunks``). The checkpoint's storage
    blocks live until the returned DataFrame is garbage-collected.
    """
    sum_cols = dict(sum_cols or {})
    if not sum_cols and rank_col is None and group_count_col is None:
        raise ValueError("nothing requested: pass sum_cols and/or rank_col")
    # the whole _dp_ namespace is reserved (pid/cnt/offsets), and the
    # requested OUTPUT names must not overwrite existing input columns —
    # withColumn would silently replace them and the final drop would
    # delete user data (r9 review finding)
    clash = sorted(c for c in df.columns if c.startswith("_dp_"))
    if clash:
        raise ValueError(
            f"distributed_prefix reserves the '_dp_' column namespace; "
            f"rename {clash} in the input first"
        )
    outs = [c for c in (rank_col, group_count_col) if c is not None]
    outs += list(sum_cols.values())
    overwrite = sorted(set(outs) & set(df.columns))
    if overwrite:
        raise ValueError(
            f"output column(s) {overwrite} already exist in the input; "
            "pick different names (they would be silently overwritten)"
        )
    spark = df.sparkSession
    n_part = n_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    gcols = list(groups)
    part = (
        df.repartitionByRange(
            n_part, *[F.col(g).asc() for g in gcols], *order
        )
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )

    wloc = Window.partitionBy(_PID, *gcols).orderBy(*order)
    out = part
    for src, dst in sum_cols.items():
        out = out.withColumn(
            dst,
            F.sum(F.col(src).cast("long")).over(
                wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    if rank_col is not None:
        out = out.withColumn(rank_col, F.rank().over(wloc).cast("long"))

    # one row per (partition, group): bounded by partitions x groups,
    # independent of corpus size — the windows below run over THIS frame
    cnt = part.groupBy(_PID, *gcols).agg(
        F.count(F.lit(1)).alias(_CNT),
        *[
            F.sum(F.col(src).cast("long")).alias(f"_dp_s_{src}")
            for src in sum_cols
        ],
    )
    wgrp = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    prev = wgrp.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    full = wgrp.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.coalesce(F.sum(_CNT).over(prev), F.lit(0)).alias("_dp_off_cnt"),
        *[
            F.coalesce(F.sum(f"_dp_s_{src}").over(prev), F.lit(0)).alias(
                f"_dp_off_{src}"
            )
            for src in sum_cols
        ],
    ]
    if group_count_col is not None:
        off_cols.append(F.sum(_CNT).over(full).alias("_dp_gc"))
    offs = cnt.select(_PID, *gcols, *off_cols)

    cond = out[_PID] == offs[_PID]
    for g in gcols:
        # null-safe: a NULL group is a group of its own
        cond = cond & out[g].eqNullSafe(offs[g])
    joined = out.join(F.broadcast(offs), cond).drop(offs[_PID])
    for g in gcols:
        joined = joined.drop(offs[g])

    for src, dst in sum_cols.items():
        joined = joined.withColumn(
            dst, F.col(dst) + F.col(f"_dp_off_{src}")
        )
    if rank_col is not None:
        joined = joined.withColumn(
            rank_col, F.col(rank_col) + F.col("_dp_off_cnt")
        )
    if group_count_col is not None:
        joined = joined.withColumn(group_count_col, F.col("_dp_gc"))

    drop = [_PID, "_dp_off_cnt"] + [f"_dp_off_{src}" for src in sum_cols]
    if group_count_col is not None:
        drop.append("_dp_gc")
    return joined.drop(*drop)
