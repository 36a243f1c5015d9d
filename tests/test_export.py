"""Deterministic shard export (operators/export.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.export import (
    export_shards,
    shard_assignments,
    shard_manifest,
)

SF_DIR = "/root/testdata/sf0.001"


class TestShardExport:
    def test_assignment_deterministic_and_partition_invariant(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        a = shard_assignments(docs, num_shards=8).select("doc_id", "shard")
        b = shard_assignments(
            docs.repartition(13), num_shards=8
        ).select("doc_id", "shard")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        shards = {r["shard"] for r in a.select("shard").distinct().collect()}
        assert shards <= set(range(8)) and len(shards) > 1

    def test_export_roundtrip(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = str(tmp_path / "shards")
        export_shards(docs, out, num_shards=8)
        back = spark.read.parquet(out)
        assert back.count() == docs.count()
        # membership matches the pure assignment function
        want = {
            (r["doc_id"], r["shard"])
            for r in shard_assignments(docs, num_shards=8)
            .select("doc_id", "shard").collect()
        }
        got = {
            (r["doc_id"], r["shard"])
            for r in back.select(
                "doc_id", F.col("shard").cast("long").alias("shard")
            ).collect()
        }
        assert got == want

    def test_one_file_per_shard_without_cap(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = str(tmp_path / "shards")
        export_shards(docs, out, num_shards=4)
        m = {r["shard"]: r for r in shard_manifest(spark, out).collect()}
        assert all(r["n_files"] == 1 for r in m.values())
        assert sum(r["n_rows"] for r in m.values()) == docs.count()

    def test_max_records_splits_files(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = str(tmp_path / "shards")
        export_shards(docs, out, num_shards=2, max_records_per_file=50)
        m = shard_manifest(spark, out).collect()
        # 500 rows / 2 shards ≈ 250/shard -> ≥ 5 files each at cap 50
        assert all(r["n_files"] >= 5 for r in m)

    def test_within_file_sorted_by_key(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = str(tmp_path / "shards")
        export_shards(docs, out, num_shards=4)
        one = spark.read.parquet(out).where(F.col("shard") == 0)
        ids = [r["doc_id"] for r in one.select("doc_id").collect()]
        assert ids == sorted(ids)


class TestEpochShuffle:
    def test_seeded_order_reproducible_and_seed_sensitive(
        self, spark, tmp_path
    ):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out1 = str(tmp_path / "e1")
        out1b = str(tmp_path / "e1b")
        out2 = str(tmp_path / "e2")
        for p, seed in ((out1, 1), (out1b, 1), (out2, 2)):
            export_shards(docs, p, num_shards=4, shuffle_seed=seed)

        def order(path):
            rows = spark.read.parquet(path).select("shard", "doc_id").collect()
            by_shard: dict = {}
            for r in rows:
                by_shard.setdefault(r.shard, []).append(r.doc_id)
            return [d for s in sorted(by_shard) for d in by_shard[s]]

        o1, o1b, o2 = order(out1), order(out1b), order(out2)
        assert o1 == o1b                      # same seed -> same permutation
        assert sorted(o1) == sorted(o2)       # same membership...
        assert o1 != o2                       # ...different order per seed
        assert o1 != sorted(o1)               # and it IS shuffled

    def test_md5_seed_hash_portable_contract(self, spark):
        """seed_hash='md5' (r9 verdict #1): membership is the md5-bucket
        idiom with the seed folded into the key string — pinned here
        against pure-Python hashlib, the same contract the DuckDB
        oracle replicates. Different seeds still shuffle."""
        import hashlib

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = {
            r.doc_id: r.shard
            for r in shard_assignments(
                docs, num_shards=8, shuffle_seed=7, seed_hash="md5"
            ).select("doc_id", "shard").collect()
        }

        def want(doc_id):
            h = hashlib.md5(f"7:{doc_id}".encode()).hexdigest()[:8]
            return int(h, 16) % 8

        assert got and all(s == want(d) for d, s in got.items())
        other = {
            r.doc_id: r.shard
            for r in shard_assignments(
                docs, num_shards=8, shuffle_seed=8, seed_hash="md5"
            ).select("doc_id", "shard").collect()
        }
        assert other != got and set(other) == set(got)

    def test_md5_seeded_export_order_follows_md5(self, spark, tmp_path):
        import hashlib

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = str(tmp_path / "md5shards")
        export_shards(
            docs, out, num_shards=4, shuffle_seed=3, seed_hash="md5"
        )
        one = spark.read.parquet(out).where(F.col("shard") == 0)
        ids = [r.doc_id for r in one.select("doc_id").collect()]
        key = lambda d: hashlib.md5(f"3:{d}".encode()).hexdigest()  # noqa: E731
        assert ids == sorted(ids, key=key) and ids != sorted(ids)

    def test_bad_seed_hash_raises(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        with pytest.raises(ValueError, match="seed_hash"):
            shard_assignments(
                docs, shuffle_seed=1, seed_hash="sha1"
            ).collect()

    def test_null_key_shard_contract(self, spark):
        """r10 ADVICE: a NULL key must NOT be silently bucketed by the
        portable paths. Unseeded md5 and seeded md5 both yield a NULL
        shard (md5(NULL) -> NULL; the seeded fold uses F.concat so NULL
        propagates — concat_ws would have collapsed it to the constant
        '{seed}' string). xxhash64 differs by Spark hash semantics
        (null args are SKIPPED): NULL keys land in ONE valid constant
        shard — pinned here so the divergence is documented behavior."""
        df = spark.createDataFrame(
            [("a",), ("b",), (None,), (None,)], "k string"
        )
        plain = shard_assignments(df, key_col="k", num_shards=8)
        md5 = shard_assignments(
            df, key_col="k", num_shards=8, shuffle_seed=7, seed_hash="md5"
        )
        for out in (plain, md5):
            rows = {r.k: r.shard for r in out.collect()}
            assert rows["a"] is not None and rows["b"] is not None
            null_shards = [
                r.shard for r in out.collect() if r.k is None
            ]
            assert null_shards == [None, None]
        xx = shard_assignments(
            df, key_col="k", num_shards=8, shuffle_seed=7,
            seed_hash="xxhash64",
        )
        null_xx = {r.shard for r in xx.collect() if r.k is None}
        assert len(null_xx) == 1 and None not in null_xx

    def test_seeded_membership_differs_from_unseeded(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plain = {
            (r.doc_id, r.shard)
            for r in shard_assignments(docs, num_shards=8)
            .select("doc_id", "shard").collect()
        }
        seeded = {
            (r.doc_id, r.shard)
            for r in shard_assignments(docs, num_shards=8, shuffle_seed=7)
            .select("doc_id", "shard").collect()
        }
        assert plain != seeded
        assert {d for d, _ in plain} == {d for d, _ in seeded}


class TestManifestFormat:
    def test_json_export_manifests(self, spark, tmp_path):
        """r3 review: the manifest read must use the export's format."""
        from sparksearchengine_spark.operators.export import (
            export_shards, shard_manifest,
        )

        df = spark.range(40).select(
            F.col("id").alias("doc_id"), F.lit("t").alias("text")
        )
        p = str(tmp_path / "jshards")
        export_shards(df, p, num_shards=4, file_format="json")
        man = shard_manifest(spark, p, file_format="json")
        assert man.agg(F.sum("n_rows")).first()[0] == 40
