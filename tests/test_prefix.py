"""distributed_prefix == the serial global window, pinned directly.

The three operator call sites are oracle-checked; this pins the helper
itself against ``Window.partitionBy(group).orderBy(...)`` on frames
with rank ties, NULL groups, single-row groups, and values landing on
range-partition boundaries (more partitions than rows forces every
boundary case).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.prefix import distributed_prefix


def _frame(spark, seed, n=120, groups=("en", "de", None), max_v=8):
    rng = random.Random(seed)
    rows = [
        (i, rng.choice(groups), rng.randint(0, max_v), rng.randint(1, 9))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "id long, lang string, v long, tok long"
    )


class TestDistributedPrefix:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    @pytest.mark.parametrize("nparts", [1, 4, 64])
    def test_rank_and_count_match_global_window(self, spark, seed, nparts):
        df = _frame(spark, seed)
        got = {
            r.id: (r.rk, r.ng)
            for r in distributed_prefix(
                df,
                order=[F.col("v").asc()],
                groups=["lang"],
                rank_col="rk",
                group_count_col="ng",
                n_partitions=nparts,
            ).collect()
        }
        w = Window.partitionBy("lang").orderBy(F.col("v").asc())
        wg = Window.partitionBy("lang")
        want = {
            r.id: (r.rk, r.ng)
            for r in df.select(
                "id",
                F.rank().over(w).cast("long").alias("rk"),
                F.count(F.lit(1)).over(wg).alias("ng"),
            ).collect()
        }
        assert got == want

    @pytest.mark.parametrize("nparts", [1, 4, 64])
    def test_total_order_cumsum_matches_global_window(self, spark, nparts):
        df = _frame(spark, seed=7)
        got = {
            r.id: r.cum
            for r in distributed_prefix(
                df,
                order=[F.col("v").desc(), F.col("id").asc()],
                groups=["lang"],
                sum_cols={"tok": "cum"},
                n_partitions=nparts,
            ).collect()
        }
        w = (
            Window.partitionBy("lang")
            .orderBy(F.col("v").desc(), F.col("id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            r.id: r.cum
            for r in df.select("id", F.sum("tok").over(w).alias("cum")).collect()
        }
        assert got == want

    def test_no_groups_global(self, spark):
        df = _frame(spark, seed=9, n=40)
        out = distributed_prefix(
            df,
            order=[F.col("v").asc(), F.col("id").asc()],
            rank_col="rk",
            group_count_col="n",
            sum_cols={"tok": "cum"},
            n_partitions=16,
        )
        rows = sorted(out.collect(), key=lambda r: r.rk)
        assert [r.rk for r in rows] == list(range(1, 41))
        assert all(r.n == 40 for r in rows)
        run = 0
        for r in rows:
            run += r.tok
            assert r.cum == run

    def test_single_row_and_empty(self, spark):
        one = spark.createDataFrame([(1, "x", 5, 2)],
                                    "id long, lang string, v long, tok long")
        r = distributed_prefix(
            one, order=[F.col("v").asc()], groups=["lang"],
            rank_col="rk", group_count_col="ng",
        ).collect()[0]
        assert (r.rk, r.ng) == (1, 1)
        empty = one.limit(0)
        assert distributed_prefix(
            empty, order=[F.col("v").asc()], rank_col="rk"
        ).count() == 0

    def test_requires_something(self, spark):
        df = _frame(spark, seed=1, n=5)
        with pytest.raises(ValueError):
            distributed_prefix(df, order=[F.col("v").asc()])

    def test_reserved_namespace_and_overwrite_guards(self, spark):
        df = _frame(spark, seed=1, n=5)
        with pytest.raises(ValueError, match="_dp_"):
            distributed_prefix(
                df.withColumn("_dp_off_x", F.lit(1)),
                order=[F.col("v").asc()], rank_col="rk",
            )
        # an output name colliding with an input column must be loud,
        # not a silent overwrite+drop of user data
        with pytest.raises(ValueError, match="already exist"):
            distributed_prefix(
                df, order=[F.col("v").asc()], rank_col="tok",
            )
        with pytest.raises(ValueError, match="already exist"):
            distributed_prefix(
                df, order=[F.col("v").asc()], sum_cols={"tok": "id"},
            )
