"""Giant-bucket guard for banded-LSH candidate joins (r11 verdict #1).

The failure class: the candidate self-join on (band, band-hash) is
all-pairs WITHIN a bucket, so a near-duplicate mega-cluster of m docs
makes O(bands * m^2) candidate pairs. These tests build a synthetic
mega-bucket corpus (one identical-text cluster that lands in the same
bucket of EVERY band, plus pairwise-dissimilar filler) and prove:

* the candidate count is BOUNDED (star: m-1 edges, never m*(m-1)/2),
* the cap is LOUD (RuntimeWarning + stats_out counts, exact values),
* ``oversize="star"`` preserves connectivity for clustering
  (minhash_lsh_canon still collapses the mega-cluster to one canon),
* ``oversize="drop"`` removes the bucket entirely,
* capped == uncapped whenever no bucket exceeds the cap (the guard is
  a no-op on healthy data),
* the same guard holds on the cross-corpus prepared path, the SimHash
  block join, and the hyperplane-LSH embedding join.
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

MEGA_TEXT = (
    "the quick brown fox jumps over the lazy dog again and again today"
)


def _mega_corpus(spark, n_mega=60, n_unique=30):
    """n_mega docs with IDENTICAL text (=> identical MinHash signature
    => one bucket per band) + n_unique docs whose token n-grams are
    pairwise DISJOINT (stride-20 token ids => Jaccard 0 between any two
    filler docs, so nothing outside the cluster survives verification)."""
    rows = [(i, MEGA_TEXT) for i in range(n_mega)]
    for i in range(n_unique):
        toks = " ".join(f"u{(1000 + i) * 20 + j}" for j in range(10))
        rows.append((1000 + i, toks))
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestMinhashCap:
    def test_star_bounds_pairs_and_reports(self, spark):
        from sparksearchengine_spark.operators.dedup import minhash_lsh_dedup

        docs = _mega_corpus(spark)
        st: dict = {}
        with pytest.warns(RuntimeWarning, match="max_bucket_size"):
            pairs = minhash_lsh_dedup(
                docs, max_bucket_size=20, oversize="star", stats_out=st
            )
        got = pairs.collect()
        # the identical-text cluster lands in the same bucket of every
        # band: 16 oversized buckets of exactly 60 members each
        assert st["oversized_buckets"] == 16
        assert st["oversized_rows"] == 16 * 60
        assert st["largest_bucket"] == 60
        assert st["max_bucket_size"] == 20
        # star: exactly m-1 verified pairs, all through the min id —
        # never the m*(m-1)/2 = 1770 all-pairs blowup
        mega = [(r["id_a"], r["id_b"]) for r in got if r["id_b"] < 1000]
        assert len(mega) == 59
        assert {a for a, _ in mega} == {0}
        assert {b for _, b in mega} == set(range(1, 60))
        # disjoint filler docs contribute nothing
        assert all(r["id_b"] < 1000 or r["id_a"] >= 1000 for r in got)
        assert [r for r in got if r["id_a"] >= 1000] == []

    def test_drop_removes_bucket(self, spark):
        from sparksearchengine_spark.operators.dedup import minhash_lsh_dedup

        docs = _mega_corpus(spark)
        st: dict = {}
        with pytest.warns(RuntimeWarning):
            pairs = minhash_lsh_dedup(
                docs, max_bucket_size=20, oversize="drop", stats_out=st
            )
        assert pairs.count() == 0
        assert st["oversized_buckets"] == 16

    def test_generous_cap_is_noop(self, spark):
        from sparksearchengine_spark.operators.dedup import minhash_lsh_dedup

        docs = _mega_corpus(spark, n_mega=12, n_unique=8)
        st: dict = {}
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any warning -> failure
            capped = sorted(
                map(
                    tuple,
                    minhash_lsh_dedup(
                        docs, max_bucket_size=8192, stats_out=st
                    ).collect(),
                )
            )
        uncapped = sorted(
            map(
                tuple,
                minhash_lsh_dedup(docs, max_bucket_size=None).collect(),
            )
        )
        assert capped == uncapped
        assert st["oversized_buckets"] == 0
        assert st["oversized_rows"] == 0

    def test_star_canon_preserves_connectivity(self, spark):
        from sparksearchengine_spark.operators.dedup import minhash_lsh_canon

        docs = _mega_corpus(spark, n_mega=40, n_unique=10)
        with pytest.warns(RuntimeWarning):
            canon = minhash_lsh_canon(docs, max_bucket_size=10)
        got = {
            r["doc_id"]: (r["canon_id"], r["is_duplicate"])
            for r in canon.collect()
        }
        # the whole mega-cluster collapses to canon 0 despite only m-1
        # star edges being emitted
        for i in range(40):
            assert got[i] == (0, i != 0)
        for i in range(1000, 1010):
            assert got[i] == (i, False)

    def test_bad_mode_raises(self, spark):
        from sparksearchengine_spark.operators.dedup import minhash_lsh_dedup

        with pytest.raises(ValueError, match="oversize"):
            minhash_lsh_dedup(
                _mega_corpus(spark, 4, 2), max_bucket_size=10,
                oversize="sample",
            )


class TestPreparedCorpusCap:
    def test_star_matches_via_representative(self, spark):
        from sparksearchengine_spark.operators.dedup import minhash_lsh_join

        corpus = _mega_corpus(spark, n_mega=50, n_unique=10)
        fresh = spark.createDataFrame(
            [(7001, MEGA_TEXT), (7002, "zz1 zz2 zz3 zz4 zz5 zz6")],
            "doc_id long, text string",
        )
        st: dict = {}
        with pytest.warns(RuntimeWarning):
            out = minhash_lsh_join(
                fresh, corpus, max_bucket_size=10, oversize="star",
                stats_out=st,
            ).collect()
        assert st["oversized_buckets"] == 16
        assert st["largest_bucket"] == 50
        # the fresh near-dup matches exactly ONE representative (the
        # bucket's min id), not all 50 members
        assert [(r["id_l"], r["id_r"], r["jaccard"]) for r in out] == [
            (7001, 0, 1.0)
        ]

    def test_drop_suppresses_bucket(self, spark):
        from sparksearchengine_spark.operators.dedup import minhash_lsh_join

        corpus = _mega_corpus(spark, n_mega=50, n_unique=10)
        fresh = spark.createDataFrame(
            [(7001, MEGA_TEXT)], "doc_id long, text string"
        )
        with pytest.warns(RuntimeWarning):
            out = minhash_lsh_join(
                fresh, corpus, max_bucket_size=10, oversize="drop"
            )
        assert out.count() == 0

    def test_uncapped_prepare_matches_all_members(self, spark):
        from sparksearchengine_spark.operators.dedup import minhash_lsh_join

        corpus = _mega_corpus(spark, n_mega=12, n_unique=4)
        fresh = spark.createDataFrame(
            [(7001, MEGA_TEXT)], "doc_id long, text string"
        )
        out = minhash_lsh_join(fresh, corpus, max_bucket_size=None)
        assert out.count() == 12


class TestSimhashCap:
    def test_star_bounds_block_buckets(self, spark):
        from sparksearchengine_spark.operators.dedup import simhash_dedup

        docs = _mega_corpus(spark, n_mega=50, n_unique=10)
        st: dict = {}
        with pytest.warns(RuntimeWarning):
            pairs = simhash_dedup(
                docs, max_hamming=3, max_bucket_size=10, stats_out=st
            ).collect()
        # identical text => identical 4-block simhash => 4 oversized
        # (block, value) buckets of 50
        assert st["oversized_buckets"] == 4
        assert st["largest_bucket"] == 50
        mega = [(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] < 1000]
        assert len(mega) == 49
        assert {a for a, _ in mega} == {0}

    def test_capped_equals_uncapped_below_cap(self, docs_df):
        from sparksearchengine_spark.operators.dedup import simhash_dedup

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            capped = sorted(
                map(tuple, simhash_dedup(docs_df, max_hamming=3).collect())
            )
        uncapped = sorted(
            map(
                tuple,
                simhash_dedup(
                    docs_df, max_hamming=3, max_bucket_size=None
                ).collect(),
            )
        )
        assert capped == uncapped


class TestEmbeddingLshCap:
    def _emb(self, spark, n_mega=40, n_anti=10, dim=8):
        """n_mega identical vectors v (one signature bucket per band) +
        n_anti copies of -v (all sign bits flip => disjoint buckets)."""
        v = [1.0, 0.5, -0.25, 0.75, -0.5, 0.25, 1.0, -1.0][:dim]
        rows = [(i, v) for i in range(n_mega)]
        rows += [(1000 + i, [-x for x in v]) for i in range(n_anti)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_oversized_item_bucket_dropped_loudly(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            lsh_cosine_topk,
        )

        items = self._emb(spark)
        queries = spark.createDataFrame(
            [
                (1, [1.0, 0.5, -0.25, 0.75, -0.5, 0.25, 1.0, -1.0]),
                (2, [-1.0, -0.5, 0.25, -0.75, 0.5, -0.25, -1.0, 1.0]),
            ],
            "query_id long, embedding array<float>",
        )
        st: dict = {}
        with pytest.warns(RuntimeWarning, match="lsh_cosine_topk"):
            res = lsh_cosine_topk(
                items, queries, k=5, max_bucket_size=20, stats_out=st
            ).collect()
        assert st["oversized_buckets"] == 4  # all 4 bands of the v-cluster
        assert st["largest_bucket"] == 40
        # query 1's only buckets were oversized -> no rows (loudly
        # reported recall loss); query 2 still gets its anti-cluster
        assert [r for r in res if r["query_id"] == 1] == []
        q2 = [r for r in res if r["query_id"] == 2]
        assert len(q2) == 5 and all(r["vec_id"] >= 1000 for r in q2)

    def test_neardup_star_bounds_pairs(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            embedding_neardup,
        )

        items = self._emb(spark, n_mega=40, n_anti=5)
        st: dict = {}
        with pytest.warns(RuntimeWarning, match="embedding_neardup"):
            pairs = embedding_neardup(
                items, threshold=0.99, max_bucket_size=10, stats_out=st
            ).collect()
        assert st["oversized_buckets"] == 4
        assert st["largest_bucket"] == 40
        # star: m-1 verified pairs through min id 0, never 780 all-pairs
        mega = [(r["id_a"], r["id_b"]) for r in pairs if r["id_b"] < 1000]
        assert len(mega) == 39 and {a for a, _ in mega} == {0}
        # the anti-cluster (5 < cap) still pairs all-pairs: C(5,2)=10
        anti = [r for r in pairs if r["id_a"] >= 1000]
        assert len(anti) == 10

    def test_neardup_generous_cap_matches_uncapped(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            embedding_neardup,
        )

        items = self._emb(spark, n_mega=6, n_anti=4)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            capped = sorted(
                map(
                    tuple,
                    embedding_neardup(items, threshold=0.9).collect(),
                )
            )
        uncapped = sorted(
            map(
                tuple,
                embedding_neardup(
                    items, threshold=0.9, max_bucket_size=None
                ).collect(),
            )
        )
        assert capped == uncapped and len(capped) == 15 + 6

    def test_generous_cap_keeps_everything(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            lsh_cosine_topk,
        )

        items = self._emb(spark, n_mega=6, n_anti=4)
        queries = spark.createDataFrame(
            [(1, [1.0, 0.5, -0.25, 0.75, -0.5, 0.25, 1.0, -1.0])],
            "query_id long, embedding array<float>",
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            capped = sorted(
                map(tuple, lsh_cosine_topk(items, queries, k=3).collect())
            )
        uncapped = sorted(
            map(
                tuple,
                lsh_cosine_topk(
                    items, queries, k=3, max_bucket_size=None
                ).collect(),
            )
        )
        assert capped == uncapped


class TestWinnowStopFingerprintCap:
    """r12: a winnowing fingerprint posting is a candidate bucket like
    an LSH band bucket — the MOSS stop-fingerprint cap is now ON by
    default and loud."""

    def test_cap_is_loud_and_reported(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            winnow_overlap_pairs,
        )

        boiler = "this exact shared boilerplate sentence repeats across docs"
        df = spark.createDataFrame(
            [(i, f"{boiler} unique tail {i} content {i}") for i in range(6)],
            "doc_id long, text string",
        )
        st: dict = {}
        with pytest.warns(RuntimeWarning, match="winnow_overlap_pairs"):
            capped = winnow_overlap_pairs(
                df, min_overlap=0.3, max_hash_df=2, stats_out=st
            ).count()
        assert capped == 0
        assert st["oversized_buckets"] > 0
        assert st["largest_bucket"] == 6  # the corpus-wide fingerprints
        assert st["max_bucket_size"] == 2

    def test_default_cap_silent_on_healthy_corpus(self, docs_df):
        from sparksearchengine_spark.operators.dedup import (
            winnow_overlap_pairs,
        )

        with warnings.catch_warnings():
            warnings.simplefilter("error")
            with_default = sorted(
                map(
                    tuple,
                    winnow_overlap_pairs(docs_df, min_overlap=0.3).collect(),
                )
            )
        uncapped = sorted(
            map(
                tuple,
                winnow_overlap_pairs(
                    docs_df, min_overlap=0.3, max_hash_df=None
                ).collect(),
            )
        )
        assert with_default == uncapped
