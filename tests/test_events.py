"""operators/events.py — JSON props extraction + rollups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestParseProps:
    def test_typed_extraction_and_null_paths(self, spark):
        from sparksearchengine_spark.operators.events import parse_props

        df = spark.createDataFrame(
            [
                (1, '{"k": 5, "tag": "x"}'),
                (2, '{"k": "7"}'),          # string number casts
                (3, '{"other": 1}'),        # missing path -> NULL
                (4, "not json"),            # malformed -> NULL
                (5, None),
            ],
            "event_id long, props string",
        )
        got = {
            r["event_id"]: (r["k"], r["tag"])
            for r in parse_props(
                df, {"k": "long", "tag": "string"}
            ).collect()
        }
        assert got == {
            1: (5, "x"), 2: (7, None), 3: (None, None),
            4: (None, None), 5: (None, None),
        }

    def test_extraction_is_scan_stage(self, spark):
        from sparksearchengine_spark.operators.events import parse_props

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        plan = parse_props(
            ev, {"k": "long"}
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestPropsRollup:
    def test_rollup_hand_computed(self, spark):
        from sparksearchengine_spark.operators.events import props_rollup

        df = spark.createDataFrame(
            [
                (1, "a", '{"k": 1}'),
                (2, "a", '{"k": 3}'),
                (3, "a", "{}"),
                (4, "b", '{"k": 10}'),
            ],
            "event_id long, event_type string, props string",
        )
        got = {
            r["group"]: (
                r["n_events"], r["n_with_field"], r["sum_field"],
                r["min_field"], r["max_field"],
            )
            for r in props_rollup(df, "k").collect()
        }
        assert got == {"a": (3, 2, 4, 1, 3), "b": (1, 1, 10, 10, 10)}

    def test_rollup_on_testdata(self, spark):
        from sparksearchengine_spark.operators.events import props_rollup

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = props_rollup(ev, "k").collect()
        assert len(out) > 0
        total = sum(r["n_events"] for r in out)
        assert total == ev.count()


class TestResampleGapfill:
    def test_gaps_become_zero_rows(self, spark):
        from sparksearchengine_spark.operators.events import (
            resample_gapfill,
        )

        # buckets 0 and 30 occupied, 10 and 20 empty
        df = spark.createDataFrame(
            [(1, 5, 2.0), (2, 7, 3.0), (3, 35, 1.5)],
            "event_id long, ts long, value double",
        )
        out = {
            r["bucket_ts"]: (r["n_events"], r["sum_value"])
            for r in resample_gapfill(df, 10, value_col="value").collect()
        }
        assert out == {
            0: (2, 5.0),
            10: (0, 0.0),
            20: (0, 0.0),
            30: (1, 1.5),
        }

    def test_per_key_series_ranges_independent(self, spark):
        from sparksearchengine_spark.operators.events import (
            resample_gapfill,
        )

        df = spark.createDataFrame(
            [("a", 0), ("a", 25), ("b", 100)],
            "k string, ts long",
        )
        out = resample_gapfill(df, 10, key_col="k").collect()
        a = sorted(r["bucket_ts"] for r in out if r["k"] == "a")
        b = sorted(r["bucket_ts"] for r in out if r["k"] == "b")
        assert a == [0, 10, 20] and b == [100]

    def test_budget_guard_fails_loudly(self, spark):
        from py4j.protocol import Py4JJavaError

        from sparksearchengine_spark.operators.events import (
            resample_gapfill,
        )

        df = spark.createDataFrame(
            [(0,), (10_000_000,)], "ts long"
        )
        with pytest.raises(Exception) as ei:
            resample_gapfill(df, 1, max_buckets=100).collect()
        assert "max_buckets" in str(ei.value)

    def test_bad_interval(self, spark):
        from sparksearchengine_spark.operators.events import (
            resample_gapfill,
        )

        df = spark.createDataFrame([(0,)], "ts long")
        with pytest.raises(ValueError):
            resample_gapfill(df, 0)
