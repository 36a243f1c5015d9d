"""operators/profile.py — one-pass multi-column profiling."""

from __future__ import annotations

import pytest


class TestProfileColumns:
    def test_hand_computed_stats(self, spark):
        from sparksearchengine_spark.operators.profile import profile_columns

        df = spark.createDataFrame(
            [(1, 10.0, "a"), (2, None, "b"), (3, 30.5, None), (3, 30.5, "b")],
            "k long, v double, s string",
        )
        got = {r["column"]: r.asDict() for r in profile_columns(df).collect()}
        assert got["k"]["n_rows"] == 4
        assert got["k"]["n_null"] == 0
        assert got["k"]["n_distinct"] == 3
        assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 3.0
        assert got["k"]["sum_num"] == 9.0
        assert got["k"]["mean_num"] == pytest.approx(9 / 4)
        assert got["v"]["n_null"] == 1
        assert got["v"]["sum_num"] == pytest.approx(71.0)
        assert got["v"]["mean_num"] == pytest.approx(71.0 / 3)  # non-null n
        assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
        assert got["s"]["min_num"] is None

    def test_all_null_numeric_column(self, spark):
        from sparksearchengine_spark.operators.profile import profile_columns

        df = spark.createDataFrame(
            [(None,), (None,)], "v double"
        )
        r = profile_columns(df).collect()[0]
        assert r["n_null"] == 2 and r["n_distinct"] == 0
        assert r["sum_num"] is None and r["mean_num"] is None

    def test_single_job_single_scan(self, spark):
        # the whole profile must be ONE aggregate over ONE scan —
        # per-column scans would be N passes over 100 TB
        from sparksearchengine_spark.operators.profile import profile_columns

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        plan = profile_columns(
            li, ["l_quantity", "l_returnflag"]
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan") == 1

    def test_empty_cols_raise(self, spark):
        from sparksearchengine_spark.operators.profile import profile_columns

        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="non-empty"):
            profile_columns(df, [])

    def test_decimal_column_profiles_as_numeric(self, spark):
        from decimal import Decimal

        from sparksearchengine_spark.operators.profile import profile_columns

        df = spark.createDataFrame(
            [(Decimal("1.50"),), (Decimal("2.25"),)], "v decimal(10,2)"
        )
        r = profile_columns(df).collect()[0]
        assert r["dtype"] == "decimal(10,2)"
        assert r["min_num"] == 1.5 and r["max_num"] == 2.25
        assert r["sum_num"] == 3.75 and r["mean_num"] == 1.875

    def test_unsupported_type_counts_only(self, spark):
        from sparksearchengine_spark.operators.profile import profile_columns

        df = spark.createDataFrame(
            [([1, 2],), (None,)], "v array<int>"
        )
        r = profile_columns(df).collect()[0]
        assert r["n_null"] == 1 and r["n_distinct"] == 1
        assert r["min_num"] is None and r["min_str"] is None

    def test_timestamp_iso_format(self, spark):
        from sparksearchengine_spark.operators.profile import profile_columns

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        r = profile_columns(li, ["l_shipdate"]).collect()[0]
        import re

        assert re.fullmatch(
            r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", r["min_str"]
        )
        assert r["min_str"] <= r["max_str"]


class TestApproxProfile:
    def test_one_pass_sketch_profile(self, spark):
        from sparksearchengine_spark.operators.profile import approx_profile

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        out = approx_profile(
            li, ["l_orderkey", "l_quantity", "l_returnflag"]
        ).collect()
        rows = {r["column"]: r for r in out}
        assert set(rows) == {"l_orderkey", "l_quantity", "l_returnflag"}
        # non-numeric columns carry no quantiles
        assert rows["l_returnflag"]["q_med"] is None
        assert rows["l_quantity"]["q_med"] is not None
        # HLL estimate lands in the right order of magnitude
        exact = li.select("l_orderkey").distinct().count()
        apx = rows["l_orderkey"]["approx_distinct"]
        assert abs(apx - exact) <= 0.2 * exact

    def test_single_aggregate_job(self, spark):
        from sparksearchengine_spark.operators.profile import approx_profile

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        plan = (
            approx_profile(li, ["l_quantity", "l_tax"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly one aggregation pair (partial+final), no expand: the
        # sketch profile reads the table once
        assert plan.count("HashAggregate") <= 2 and "Expand" not in plan

    def test_determinism(self, spark):
        from sparksearchengine_spark.operators.profile import approx_profile

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        a = approx_profile(li, ["l_orderkey"]).collect()
        b = approx_profile(li, ["l_orderkey"]).collect()
        assert a == b

    def test_empty_cols_raise(self, spark):
        import pytest

        from sparksearchengine_spark.operators.profile import approx_profile

        df = spark.createDataFrame([(1,)], "a long")
        with pytest.raises(ValueError):
            approx_profile(df, [])


class TestSketchAccuracy:
    def test_bounds_hold_on_lineitem(self, spark):
        from sparksearchengine_spark.operators.profile import (
            sketch_accuracy_check,
        )

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        rows = {
            r["column"]: r
            for r in sketch_accuracy_check(
                li, ["l_orderkey", "l_quantity", "l_returnflag"]
            ).collect()
        }
        assert all(r["distinct_ok"] for r in rows.values())
        assert rows["l_quantity"]["median_rank_ok"] is True
        assert rows["l_returnflag"]["median_rank_ok"] is None

    def test_tie_heavy_column_passes(self, spark):
        from sparksearchengine_spark.operators.profile import (
            sketch_accuracy_check,
        )

        # 90% of values are a single tie -> the median's rank interval is
        # wide; the tie-aware check must not flag it
        df = spark.createDataFrame(
            [(7,)] * 90 + [(i,) for i in range(10)], "v long"
        )
        row = sketch_accuracy_check(df, ["v"]).first()
        assert row["median_rank_ok"] is True


class TestHistogram:
    def test_hand_computed_bins(self, spark):
        from sparksearchengine_spark.operators.profile import histogram

        df = spark.createDataFrame(
            [(0.5,), (1.5,), (1.9,), (-0.1,), (None,)], "v double"
        )
        out = {
            r["bin_start"]: r["n_rows"]
            for r in histogram(df, "v", 1.0).collect()
        }
        # floor semantics: -0.1 falls in the [-1, 0) bin; NULL excluded
        assert out == {0.0: 1, 1.0: 2, -1.0: 1}

    def test_min_count_prunes(self, spark):
        from sparksearchengine_spark.operators.profile import histogram

        df = spark.createDataFrame(
            [(1.0,), (1.1,), (5.0,)], "v double"
        )
        out = histogram(df, "v", 1.0, min_count=2).collect()
        assert len(out) == 1 and out[0]["bin_start"] == 1.0

    def test_single_partial_agg_plan(self, spark):
        from sparksearchengine_spark.operators.profile import histogram

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        plan = (
            histogram(li, "l_extendedprice", 10000.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("HashAggregate") == 2  # partial + final

    def test_bad_width(self, spark):
        import pytest

        from sparksearchengine_spark.operators.profile import histogram

        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            histogram(df, "v", 0.0)


class TestSkewReport:
    def test_hot_keys_and_shares(self, spark):
        from sparksearchengine_spark.operators.profile import skew_report

        df = spark.createDataFrame(
            [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 1, "k string"
        )
        out = skew_report(df, "k", k=2).collect()
        assert [(r["k"], r["n_rows"], r["share"]) for r in out] == [
            ("a", 6, 0.6),
            ("b", 3, 0.3),
        ]
        assert [r["rank"] for r in out] == [1, 2]

    def test_null_key_is_a_real_key(self, spark):
        from sparksearchengine_spark.operators.profile import skew_report

        df = spark.createDataFrame(
            [(None,)] * 5 + [("x",)] * 2, "k string"
        )
        top = skew_report(df, "k", k=1).first()
        assert top["k"] is None and top["n_rows"] == 5

    def test_multi_key(self, spark):
        from sparksearchengine_spark.operators.profile import skew_report

        df = spark.createDataFrame(
            [("a", 1), ("a", 1), ("a", 2)], "k string, j long"
        )
        top = skew_report(df, ["k", "j"], k=1).first()
        assert (top["k"], top["j"], top["n_rows"]) == ("a", 1, 2)

    def test_bad_args(self, spark):
        import pytest

        from sparksearchengine_spark.operators.profile import skew_report

        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError):
            skew_report(df, [], k=1)
        with pytest.raises(ValueError):
            skew_report(df, "k", k=0)


class TestGroupedProfile:
    def test_per_group_stats(self, spark):
        from sparksearchengine_spark.operators.profile import (
            profile_columns,
        )

        df = spark.createDataFrame(
            [("en", 1.0), ("en", 3.0), ("fr", 10.0), ("fr", None)],
            "lang string, v double",
        )
        out = {
            (r["lang"], r["column"]): r
            for r in profile_columns(df, ["v"], group_by=["lang"]).collect()
        }
        assert out[("en", "v")]["n_rows"] == 2
        assert out[("en", "v")]["sum_num"] == 4.0
        assert out[("en", "v")]["mean_num"] == 2.0
        assert out[("fr", "v")]["n_null"] == 1
        assert out[("fr", "v")]["mean_num"] == 10.0

    def test_group_cols_excluded_from_profiled(self, spark):
        from sparksearchengine_spark.operators.profile import (
            profile_columns,
        )

        df = spark.createDataFrame([("en", 1.0)], "lang string, v double")
        cols = {
            r["column"]
            for r in profile_columns(df, group_by=["lang"]).collect()
        }
        assert cols == {"v"}

    def test_still_single_aggregate(self, spark):
        from sparksearchengine_spark.operators.profile import (
            profile_columns,
        )

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        plan = (
            profile_columns(
                li, ["l_quantity"], group_by=["l_returnflag"]
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # grouped: partial+final pair (count_distinct adds an Expand pair)
        assert plan.count("HashAggregate") <= 4


class TestCorrelationMatrix:
    def test_hand_computed(self, spark):
        from sparksearchengine_spark.operators.profile import (
            correlation_matrix,
        )

        # y = 2x exactly -> corr 1; z anti-correlates with x -> -1
        df = spark.createDataFrame(
            [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)],
            "x double, y double, z double",
        )
        out = {
            (r["col_a"], r["col_b"]): r["corr"]
            for r in correlation_matrix(df, ["x", "y", "z"]).collect()
        }
        assert out[("x", "y")] == 1.0
        assert out[("x", "z")] == -1.0
        assert out[("y", "z")] == -1.0

    def test_null_rows_complete_case(self, spark):
        from sparksearchengine_spark.operators.profile import (
            correlation_matrix,
        )

        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, 2.0), (None, 99.0), (3.0, 3.0)],
            "x double, y double",
        )
        row = correlation_matrix(df, ["x", "y"]).first()
        assert row["n"] == 3 and row["corr"] == 1.0

    def test_zero_variance_null(self, spark):
        from sparksearchengine_spark.operators.profile import (
            correlation_matrix,
        )

        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0)], "x double, c double"
        )
        assert correlation_matrix(df, ["x", "c"]).first()["corr"] is None

    def test_partitioning_invariant(self, spark):
        from sparksearchengine_spark.operators.profile import (
            correlation_matrix,
        )

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        cols = ["l_quantity", "l_extendedprice", "l_discount"]
        a = sorted(map(tuple, correlation_matrix(li, cols).collect()))
        b = sorted(
            map(
                tuple,
                correlation_matrix(li.repartition(13), cols).collect(),
            )
        )
        assert a == b  # exact decimal sums: byte-stable under any layout

    def test_single_scan_plan(self, spark):
        from sparksearchengine_spark.operators.profile import (
            correlation_matrix,
        )

        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        plan = (
            correlation_matrix(li, ["l_quantity", "l_tax"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Scan parquet") == 1
        assert plan.count("HashAggregate") == 2

    def test_bad_args(self, spark):
        import pytest

        from sparksearchengine_spark.operators.profile import (
            correlation_matrix,
        )

        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError):
            correlation_matrix(df, ["x"])
