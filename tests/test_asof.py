"""As-of join (operators/asof.py): backward/forward, tolerance,
inclusive ties, left-outer semantics, row-atomic payload fill."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [(1, 10, "T1"), (1, 25, "T2"), (2, 5, "T3"), (3, 7, "T4")],
        "k long, ts long, tag string",
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 9, 3.0)],
        "k long, ts long, px double",
    )


def _rows(df):
    return {
        (r["k"], r["ts"]): (r["r_ts"], r["r_px"])
        for r in df.collect()
    }


class TestAsofJoin:
    def test_backward_inclusive(self, trades, quotes):
        from sparksearchengine_spark.operators.asof import asof_join

        m = _rows(asof_join(trades, quotes, on="k"))
        assert m[(1, 10)] == (10, 1.0)   # equal ts matches
        assert m[(1, 25)] == (20, 2.0)   # greatest earlier
        assert m[(2, 5)] == (None, None)  # right exists but is later
        assert m[(3, 7)] == (None, None)  # no right rows for key

    def test_forward(self, trades, quotes):
        from sparksearchengine_spark.operators.asof import asof_join

        m = _rows(asof_join(trades, quotes, on="k", direction="forward"))
        assert m[(1, 10)] == (10, 1.0)
        assert m[(1, 25)] == (None, None)
        assert m[(2, 5)] == (9, 3.0)

    def test_tolerance(self, trades, quotes):
        from sparksearchengine_spark.operators.asof import asof_join

        m = _rows(asof_join(trades, quotes, on="k", tolerance=4))
        assert m[(1, 10)] == (10, 1.0)    # gap 0
        assert m[(1, 25)] == (None, None)  # gap 5 > 4

    def test_payload_fill_is_row_atomic(self, spark):
        """A NULL inside the matched right row must be returned as NULL,
        not stitched from an older right row (struct fill, not
        per-column last_value)."""
        from sparksearchengine_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 30)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 10, 7.0), (1, 20, None)], "k long, ts long, px double"
        )
        (row,) = asof_join(left, right, on="k").collect()
        assert row["r_ts"] == 20 and row["r_px"] is None

    def test_multi_key(self, spark):
        from sparksearchengine_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, "a", 10), (1, "b", 10)], "k long, g string, ts long"
        )
        right = spark.createDataFrame(
            [(1, "a", 5, 1.0), (1, "b", 6, 2.0)],
            "k long, g string, ts long, px double",
        )
        m = {
            (r["k"], r["g"]): r["r_px"]
            for r in asof_join(left, right, on=["k", "g"]).collect()
        }
        assert m == {(1, "a"): 1.0, (1, "b"): 2.0}

    def test_bad_direction_raises(self, trades, quotes):
        from sparksearchengine_spark.operators.asof import asof_join

        with pytest.raises(ValueError, match="direction"):
            asof_join(trades, quotes, on="k", direction="nearest")

    def test_map_payload_column_supported(self, spark):
        # a map<..> payload column is unorderable — the duplicate-ts
        # payload tie-break must be skipped, not fail analysis
        from sparksearchengine_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, 10)], "k long, ts long"
        )
        right = spark.createDataFrame(
            [(1, 5, {"a": "x"})], "k long, ts long, attrs map<string,string>"
        )
        got = asof_join(left, right, on="k").collect()
        assert got[0]["r_attrs"] == {"a": "x"}


class TestPandasMergeAsofParity:
    """asof_join vs pandas.merge_asof on seeded random frames — an
    independent engine for the same public contract. Right timestamps
    are unique per key so tie semantics (which differ positionally in
    pandas) cannot muddy the comparison."""

    @staticmethod
    def _frames(seed, n_left=120, n_right=80):
        import random

        rng = random.Random(seed)
        keys = ["k1", "k2", "k3"]
        left = [
            (rng.choice(keys), rng.randint(0, 1000), i)
            for i in range(n_left)
        ]
        right_ts = {k: rng.sample(range(0, 1000), n_right // 2) for k in keys}
        right = [
            (k, t, f"{k}:{t}") for k in keys for t in right_ts[k]
        ]
        return left, right

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    @pytest.mark.parametrize("tolerance", [None, 50])
    def test_matches_pandas(self, spark, direction, tolerance):
        import pandas as pd

        from sparksearchengine_spark.operators.asof import asof_join

        left_rows, right_rows = self._frames(seed=13)
        left = spark.createDataFrame(left_rows, "k string, ts long, lid long")
        right = spark.createDataFrame(right_rows, "k string, ts long, val string")
        out = asof_join(
            left, right, on="k", direction=direction, tolerance=tolerance
        )
        got = {r.lid: r.r_val for r in out.collect()}

        lp = pd.DataFrame(left_rows, columns=["k", "ts", "lid"]).sort_values("ts")
        rp = pd.DataFrame(right_rows, columns=["k", "ts", "val"]).sort_values("ts")
        want_df = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            tolerance=tolerance,
        )
        want = {
            int(r.lid): (None if pd.isna(r.val) else r.val)
            for r in want_df.itertuples()
        }
        assert got == want
