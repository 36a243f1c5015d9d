"""Similarity search: brute-force cosine, LSH and IVF approximate variants
over the sf0.001 embeddings table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


class TestBruteForce:
    def test_self_is_top1(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import cosine_topk

        res = cosine_topk(emb, queries, k=3).collect()
        top1 = {r["query_id"]: r["vec_id"] for r in res if r["rank"] == 1}
        assert top1 == {0: 0, 1: 1, 2: 2}
        for r in res:
            if r["rank"] == 1:
                assert r["cos_sim"] == pytest.approx(1.0)

    def test_salted_equals_plain(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import cosine_topk

        plain = cosine_topk(emb, queries, k=5).collect()
        salted = cosine_topk(emb, queries, k=5, salt_buckets=4).collect()
        assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


class TestArrowBruteForce:
    def test_matches_expression_variant(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            cosine_topk,
            cosine_topk_arrow,
        )

        exact = cosine_topk(emb, queries, k=7).collect()
        arrow = cosine_topk_arrow(emb, queries, k=7).collect()
        key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
        exact_m = {key(r): r for r in exact}
        arrow_m = {key(r): r for r in arrow}
        assert exact_m.keys() == arrow_m.keys()
        for kk, r in exact_m.items():
            assert arrow_m[kk]["vec_id"] == r["vec_id"]
            assert arrow_m[kk]["cos_sim"] == pytest.approx(r["cos_sim"])

    def test_partial_topk_is_exact_across_batches(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            cosine_topk,
            cosine_topk_arrow,
        )

        # many tiny partitions => many per-batch partials to merge
        scattered = emb.repartition(16)
        exact = cosine_topk(emb, queries, k=5).collect()
        arrow = cosine_topk_arrow(scattered, queries, k=5).collect()
        assert sorted((r["query_id"], r["rank"], r["vec_id"]) for r in exact) == \
            sorted((r["query_id"], r["rank"], r["vec_id"]) for r in arrow)

    def test_oversized_query_side_raises(self, emb, monkeypatch):
        """The driver-collect is hard-capped: above COLLECT_MAX_QUERY_ROWS
        the op must refuse loudly and point at the distributed scale paths
        instead of OOM-ing the driver (VERDICT r3 'What's wrong' #3)."""
        from sparksearchengine_spark.operators import similarity

        big_queries = emb.select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        monkeypatch.setattr(similarity, "COLLECT_MAX_QUERY_ROWS", 5)
        with pytest.raises(ValueError, match="lsh_cosine_topk"):
            similarity.cosine_topk_arrow(emb, big_queries, k=3)


class TestIVF:
    def test_full_probe_equals_exact(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            cosine_topk,
            ivf_cosine_topk,
        )

        exact = cosine_topk(emb, queries, k=5).collect()
        full = ivf_cosine_topk(
            emb, queries, k=5, n_clusters=4, nprobe=4
        ).collect()
        assert sorted(map(tuple, exact)) == sorted(map(tuple, full))

    def test_partial_probe_finds_self(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import ivf_cosine_topk

        res = ivf_cosine_topk(
            emb, queries, k=3, n_clusters=8, nprobe=2
        ).collect()
        top1 = {r["query_id"]: r["vec_id"] for r in res if r["rank"] == 1}
        # a query identical to an item lands in that item's own cell
        assert top1 == {0: 0, 1: 1, 2: 2}

    def test_deterministic(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import ivf_cosine_topk

        a = ivf_cosine_topk(emb, queries, k=3, n_clusters=8, nprobe=2).collect()
        b = ivf_cosine_topk(emb, queries, k=3, n_clusters=8, nprobe=2).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestLSH:
    def test_results_subset_of_exact_scores(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            cosine_topk,
            lsh_cosine_topk,
        )

        exact = {
            (r["query_id"], r["vec_id"]): r["cos_sim"]
            for r in cosine_topk(emb, queries, k=1000).collect()
        }
        approx = lsh_cosine_topk(emb, queries, k=5).collect()
        for r in approx:  # every approx score must equal the exact score
            assert exact[(r["query_id"], r["vec_id"])] == pytest.approx(
                r["cos_sim"]
            )


class TestIVFPersisted:
    def test_build_search_roundtrip_and_pruning(self, spark, tmp_path, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            ivf_build,
            ivf_cosine_topk,
            ivf_search,
        )

        path = str(tmp_path / "ivf")
        ivf_build(emb, path, n_clusters=8)
        got = ivf_search(spark, path, queries, k=5, nprobe=3)
        plan = got._jdf.queryExecution().executedPlan().toString()
        # probed cells only: the item scan must carry a partition filter
        assert "PartitionFilters" in plan and "_cell" in plan, plan
        # same quantizer + same probes => same results as the in-session op
        want = ivf_cosine_topk(emb, queries, k=5, n_clusters=8, nprobe=3)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


class TestEmbeddingNearDup:
    def test_pairs_above_threshold(self, emb):
        from sparksearchengine_spark.operators.similarity import embedding_neardup

        pairs = embedding_neardup(emb.limit(200), threshold=0.99).collect()
        for r in pairs:
            assert r["id_a"] < r["id_b"]
            assert r["cos_sim"] >= 0.99

    def test_exact_matches_numpy(self, emb):
        import numpy as np

        from sparksearchengine_spark.operators.similarity import (
            embedding_neardup_exact,
        )

        rows = emb.limit(100).collect()
        vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
                for r in rows}
        ids = sorted(vecs)
        expected = set()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                va, vb = vecs[a], vecs[b]
                c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                if c >= 0.3:
                    expected.add((a, b))
        got = embedding_neardup_exact(emb.limit(100), threshold=0.3).collect()
        assert {(r["id_a"], r["id_b"]) for r in got} == expected
        for r in got:
            va, vb = vecs[r["id_a"]], vecs[r["id_b"]]
            c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            assert r["cos_sim"] == pytest.approx(c)

    def test_lsh_pairs_subset_of_exact(self, emb):
        from sparksearchengine_spark.operators.similarity import (
            embedding_neardup,
            embedding_neardup_exact,
        )

        exact = {
            (r["id_a"], r["id_b"])
            for r in embedding_neardup_exact(emb, threshold=0.35).collect()
        }
        approx = embedding_neardup(
            emb, threshold=0.35, num_planes=16, bands=8
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in approx} <= exact


class TestQuantizedEmbeddings:
    def test_quantize_dequantize_error_bound(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            dequantize_expr, quantize_embeddings,
        )

        df = spark.createDataFrame(
            [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        q = quantize_embeddings(df)
        back = q.select(
            "vec_id", "scale",
            dequantize_expr(F.col("qvec"), F.col("scale")).alias("d"),
        ).collect()
        rows = {r["vec_id"]: r for r in back}
        # error per component <= scale/2 = max_abs/254
        orig = {1: [0.5, -1.0, 0.25], 2: [0.0, 0.0, 0.0]}
        for vid, r in rows.items():
            for a, b in zip(orig[vid], r["d"]):
                assert abs(a - b) <= (r["scale"] or 0) / 2 + 1e-12
        assert rows[2]["scale"] == 0.0 and rows[2]["d"] == [0.0, 0.0, 0.0]

    def test_quantized_topk_recall(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            cosine_topk, cosine_topk_quantized, quantize_embeddings,
        )
        from sparksearchengine_spark.operators.recall import topk_recall

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = cosine_topk(emb, queries, k=10)
        quant = cosine_topk_quantized(
            quantize_embeddings(emb), queries, k=10
        )
        r = topk_recall(quant, exact).collect()[0]
        assert r["recall"] >= 0.9


class TestRandomProjection:
    def test_shape_and_determinism(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            random_projection,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = random_projection(emb, out_dim=16, in_dim=64)
        rows = out.collect()
        assert len(rows) == emb.count()
        assert all(len(r["rp"]) == 16 for r in rows)
        again = {r["id"]: r["rp"] for r in random_projection(
            emb, out_dim=16, in_dim=64).collect()}
        assert all(again[r["id"]] == r["rp"] for r in rows)

    def test_expr_arrow_bit_identical(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            random_projection,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = {r["id"]: r["rp"] for r in random_projection(
            emb, out_dim=8, in_dim=64, method="expr").collect()}
        b = {r["id"]: r["rp"] for r in random_projection(
            emb, out_dim=8, in_dim=64, method="arrow").collect()}
        assert a == b  # exact doubles: same fold order by construction

    def test_zero_vector_projects_to_zero(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            random_projection,
        )

        df = spark.createDataFrame(
            [(1, [0.0] * 8)], "vec_id long, embedding array<float>"
        )
        row = random_projection(df, out_dim=4, in_dim=8).first()
        assert row["rp"] == [0.0, 0.0, 0.0, 0.0]

    def test_norm_preservation_jl(self, spark):
        import math

        from sparksearchengine_spark.operators.similarity import (
            norm_expr,
            random_projection,
        )
        from pyspark.sql import functions as F

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        orig = {
            r["vec_id"]: r["n"]
            for r in emb.select(
                "vec_id", norm_expr(F.col("embedding")).alias("n")
            ).collect()
        }
        proj = {
            r["id"]: math.sqrt(sum(v * v for v in r["rp"]))
            for r in random_projection(emb, out_dim=32, in_dim=64).collect()
        }
        ratios = [proj[i] / orig[i] for i in orig if orig[i] > 0]
        mean = sum(ratios) / len(ratios)
        # E[||y||^2] = ||x||^2; at out_dim=32 the mean ratio concentrates
        assert 0.8 < mean < 1.2

    def test_expr_path_no_shuffle(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            random_projection,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        plan = (
            random_projection(emb, out_dim=4, in_dim=64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_bad_args_raise(self, spark):
        import pytest

        from sparksearchengine_spark.operators.similarity import (
            random_projection,
        )

        df = spark.createDataFrame(
            [(1, [0.0])], "vec_id long, embedding array<float>"
        )
        with pytest.raises(ValueError):
            random_projection(df, out_dim=0)
        with pytest.raises(ValueError):
            random_projection(df, out_dim=4, method="nope")


class TestMmrRerank:
    def _pool(self, spark):
        # q1: two near-duplicate high-rel docs (1,2) + a diverse doc 3
        rows = [
            (1, 1, 0.99, [1.0, 0.0, 0.0]),
            (1, 2, 0.98, [0.999, 0.01, 0.0]),
            (1, 3, 0.80, [0.0, 1.0, 0.0]),
            (2, 7, 0.5, [1.0, 1.0, 0.0]),
        ]
        return spark.createDataFrame(
            rows,
            "query_id long, vec_id long, cos_sim double, "
            "embedding array<double>",
        )

    def test_lambda_one_recovers_relevance_order(self, spark):
        from sparksearchengine_spark.operators.similarity import mmr_rerank

        out = (
            mmr_rerank(self._pool(spark), k=3, lam=1.0)
            .where("query_id = 1")
            .orderBy("mmr_rank")
            .collect()
        )
        assert [r["vec_id"] for r in out] == [1, 2, 3]

    def test_diversity_demotes_near_duplicate(self, spark):
        from sparksearchengine_spark.operators.similarity import mmr_rerank

        out = (
            mmr_rerank(self._pool(spark), k=3, lam=0.5)
            .where("query_id = 1")
            .orderBy("mmr_rank")
            .collect()
        )
        # doc 2 is a near-dup of the first pick: the diverse doc 3 must
        # outrank it at lam=0.5
        assert [r["vec_id"] for r in out] == [1, 3, 2]

    def test_first_pick_score_is_lam_rel(self, spark):
        from sparksearchengine_spark.operators.similarity import mmr_rerank

        row = (
            mmr_rerank(self._pool(spark), k=1, lam=0.5)
            .where("query_id = 1")
            .first()
        )
        assert row["mmr_score"] == round(0.5 * 0.99, 6)

    def test_k_exceeding_pool_and_groups_independent(self, spark):
        from sparksearchengine_spark.operators.similarity import mmr_rerank

        out = mmr_rerank(self._pool(spark), k=10, lam=0.5).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        assert len(by_q[1]) == 3 and len(by_q[2]) == 1

    def test_zero_norm_candidate_safe(self, spark):
        from sparksearchengine_spark.operators.similarity import mmr_rerank

        df = spark.createDataFrame(
            [
                (1, 1, 0.9, [1.0, 0.0]),
                (1, 2, 0.5, [0.0, 0.0]),
            ],
            "query_id long, vec_id long, cos_sim double, "
            "embedding array<double>",
        )
        out = mmr_rerank(df, k=2, lam=0.5).orderBy("mmr_rank").collect()
        assert [r["vec_id"] for r in out] == [1, 2]

    def test_bad_args_raise(self, spark):
        import pytest

        from sparksearchengine_spark.operators.similarity import mmr_rerank

        with pytest.raises(ValueError):
            mmr_rerank(self._pool(spark), k=0)
        with pytest.raises(ValueError):
            mmr_rerank(self._pool(spark), k=1, lam=1.5)


class TestRandomProjectionRagged:
    def test_mismatched_width_rows_null_in_both_methods(self, spark):
        from sparksearchengine_spark.operators.similarity import (
            random_projection,
        )

        df = spark.createDataFrame(
            [
                (1, [1.0, 2.0, 3.0, 4.0]),
                (2, [1.0, 2.0]),  # too short for in_dim=4
                (3, [1.0, 2.0, 3.0, 4.0, 5.0]),  # too long
            ],
            "vec_id long, embedding array<double>",
        )
        a = {
            r["id"]: r["rp"]
            for r in random_projection(
                df, out_dim=2, in_dim=4, method="expr"
            ).collect()
        }
        b = {
            r["id"]: r["rp"]
            for r in random_projection(
                df, out_dim=2, in_dim=4, method="arrow"
            ).collect()
        }
        assert a == b  # contract: bit-identical, incl. the NULL rows
        assert a[2] == [None, None] and a[3] == [None, None]
        assert all(v is not None for v in a[1])


class TestProductQuantization:
    """PQ/ADC (operators/similarity.py::pq_*): encode shape, ADC
    exactness when items sit ON codebook points, train determinism +
    quality, re-rank recall, precoded-path parity."""

    @staticmethod
    def _toy_codebooks():
        # m=2 subspaces over dim 4, ksub=3 centroids each
        return [
            [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
            [[2.0, 0.0], [0.0, 2.0], [-1.0, 0.5]],
        ]

    def test_encode_shape_and_range(self, spark):
        from sparksearchengine_spark.operators.similarity import pq_encode

        cbs = self._toy_codebooks()
        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0, 0.0, 2.0]),
                (2, [0.9, 0.9, -1.0, 0.5]),
                (3, None),
            ],
            "vec_id long, embedding array<double>",
        )
        rows = {r.vec_id: r.codes for r in pq_encode(df, cbs).collect()}
        assert rows[1] == [0, 1]  # exact centroid hits
        assert rows[2] == [2, 2]
        assert rows[3] is None
        for codes in (rows[1], rows[2]):
            assert all(0 <= c < 3 for c in codes)

    def test_adc_exact_on_codebook_points(self, spark):
        """Items that ARE centroid concatenations reconstruct exactly,
        so ADC == true inner product and the ranking matches a
        hand-computed one."""
        from sparksearchengine_spark.operators.similarity import pq_topk

        cbs = self._toy_codebooks()
        items = spark.createDataFrame(
            [
                (10, [1.0, 0.0, 2.0, 0.0]),   # codes (0,0)
                (11, [0.0, 1.0, 0.0, 2.0]),   # codes (1,1)
                (12, [1.0, 1.0, -1.0, 0.5]),  # codes (2,2)
            ],
            "vec_id long, embedding array<double>",
        )
        queries = spark.createDataFrame(
            [(0, [1.0, 0.0, 2.0, 0.0])],
            "query_id long, embedding array<double>",
        )
        got = pq_topk(items, queries, cbs, k=3).collect()
        # true IPs: item10 = 1+4=5, item11 = 0, item12 = 1-2=-1
        by_rank = {r["rank"]: (r.vec_id, r.score) for r in got}
        assert by_rank[1] == (10, 5.0)
        assert by_rank[2] == (11, 0.0)
        assert by_rank[3] == (12, -1.0)

    def test_precoded_equals_inline(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        cbs = pq_train(emb.where(F.col("vec_id") < 200), m=4, ksub=4, iters=2)
        inline = pq_topk(emb, queries, cbs, k=5).collect()
        coded = pq_encode(emb, cbs)
        pre = pq_topk(
            coded, queries.join(emb, queries.query_id == emb.vec_id)
            .select("query_id", queries.embedding),
            cbs, k=5, codes_col="codes",
        ).collect()
        assert sorted(map(tuple, inline)) == sorted(map(tuple, pre))

    def test_train_shape_and_determinism(self, emb):
        from sparksearchengine_spark.operators.similarity import pq_train

        a = pq_train(emb, m=4, ksub=4, iters=2)
        b = pq_train(emb, m=4, ksub=4, iters=2)
        assert len(a) == 4 and all(len(cb) == 4 for cb in a)
        assert all(len(c) == 16 for cb in a for c in cb)  # dim 64 / m 4
        assert a == b

    def test_rerank_recall_vs_exact(self, emb, queries):
        """Trained PQ + exact re-rank should recover most of the exact
        top-k on the synthetic embeddings."""
        from sparksearchengine_spark.operators.recall import topk_recall
        from sparksearchengine_spark.operators.similarity import (
            cosine_topk,
            pq_topk,
            pq_train,
        )

        cbs = pq_train(emb, m=8, ksub=8, iters=3)
        exact = cosine_topk(emb, queries, k=5)
        approx = pq_topk(emb, queries, cbs, k=5, rerank=8)
        rec = topk_recall(approx, exact)
        assert rec.collect()[0]["recall"] >= 0.8

    def test_bad_args(self, spark, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            pq_topk,
            pq_train,
        )

        with pytest.raises(ValueError, match="ragged"):
            pq_topk(emb, queries, [[[1.0], [1.0, 2.0]]], k=3)
        with pytest.raises(ValueError, match="not divisible"):
            pq_train(emb, m=7)
        with pytest.raises(ValueError, match="rerank"):
            pq_topk(emb, queries, self._toy_codebooks(), k=3, rerank=-1)


class TestIVFPQ:
    """Residual IVF-PQ durable layout (similarity.py::ivfpq_build/
    ivfpq_search): partition-pruned probes, code-only ADC scoring,
    exact re-rank recall, deterministic training."""

    def test_build_search_pruning_and_recall(self, spark, tmp_path, emb, queries):
        from sparksearchengine_spark.operators.recall import topk_recall
        from sparksearchengine_spark.operators.similarity import (
            cosine_topk,
            ivfpq_build,
            ivfpq_search,
        )

        path = str(tmp_path / "ivfpq")
        ivfpq_build(emb, path, n_clusters=8, m=8, ksub=8, iters=3)
        got = ivfpq_search(spark, path, queries, k=5, nprobe=4, rerank=8)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "_cell" in plan, plan
        exact = cosine_topk(emb, queries, k=5)
        rec = topk_recall(got, exact).collect()[0]["recall"]
        assert rec >= 0.8, rec

    def test_rerank_zero_returns_approx_dist(self, spark, tmp_path, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            ivfpq_build,
            ivfpq_search,
        )

        path = str(tmp_path / "ivfpq0")
        ivfpq_build(emb, path, n_clusters=4, m=4, ksub=4, iters=2)
        got = ivfpq_search(spark, path, queries, k=3, nprobe=2, rerank=0)
        assert got.columns == ["query_id", "vec_id", "approx_dist", "rank"]
        rows = got.collect()
        assert len(rows) > 0
        # ascending distance within each query
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append((r.rank, r.approx_dist))
        for pairs in by_q.values():
            pairs.sort()
            ds = [d for _, d in pairs]
            assert ds == sorted(ds)

    def test_build_deterministic(self, spark, tmp_path, emb):
        import json
        import os

        from sparksearchengine_spark.operators.similarity import ivfpq_build

        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        ivfpq_build(emb, p1, n_clusters=4, m=4, ksub=4, iters=2)
        ivfpq_build(emb, p2, n_clusters=4, m=4, ksub=4, iters=2)
        m1 = json.loads(
            spark.read.text(os.path.join(p1, "meta")).first()["value"]
        )
        m2 = json.loads(
            spark.read.text(os.path.join(p2, "meta")).first()["value"]
        )
        assert m1 == m2

    def test_bad_rerank_raises(self, spark, tmp_path, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            ivfpq_build,
            ivfpq_search,
        )

        path = str(tmp_path / "ivfpq_bad")
        ivfpq_build(emb, path, n_clusters=4, m=4, ksub=4, iters=1)
        with pytest.raises(ValueError, match="rerank"):
            ivfpq_search(spark, path, queries, k=3, rerank=-1)


class TestHardNegatives:
    def test_band_and_rank(self, spark):
        from sparksearchengine_spark.operators.similarity import hard_negatives

        # anchor along x; items at known cosines: 1.0 (self-dup, excluded
        # by hi), ~0.894, ~0.707, ~0.447, 0.0 (below lo)
        items = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),
                (2, [2.0, 1.0]),
                (3, [1.0, 1.0]),
                (4, [1.0, 2.0]),
                (5, [0.0, 1.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        anchors = spark.createDataFrame(
            [(100, [1.0, 0.0])], "anchor_id long, embedding array<double>"
        )
        got = hard_negatives(items, anchors, k=5, lo=0.4, hi=0.95).collect()
        assert [r.vec_id for r in sorted(got, key=lambda r: r.rank)] == [2, 3, 4]
        assert all(0.4 <= r.cos_sim < 0.95 for r in got)

    def test_candidates_path_equals_brute(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            cosine_topk,
            hard_negatives,
        )

        anchors = queries.select(
            F.col("query_id").alias("anchor_id"), "embedding"
        )
        brute = hard_negatives(emb, anchors, k=5, lo=0.1, hi=0.99)
        # candidate frame = exact top-100, then band+topk only
        cand = cosine_topk(emb, queries, k=100).select(
            F.col("query_id").alias("anchor_id"), "vec_id", "cos_sim"
        )
        via_cand = hard_negatives(
            emb, anchors, k=5, lo=0.1, hi=0.99, candidates=cand
        )
        assert sorted(map(tuple, brute.collect())) == sorted(
            map(tuple, via_cand.collect())
        )

    def test_bad_band_raises(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import hard_negatives

        anchors = queries.select(
            F.col("query_id").alias("anchor_id"), "embedding"
        )
        with pytest.raises(ValueError, match="lo < hi"):
            hard_negatives(emb, anchors, lo=0.9, hi=0.5)

    def test_oversized_anchors_raise(self, emb, queries, monkeypatch):
        """Corpus-scale anchors on the default broadcast path must fail
        loudly, pointing at the candidates= ANN route (VERDICT r5
        'What's wrong' #1) — not OOM the broadcast."""
        from sparksearchengine_spark.operators import similarity as s

        anchors = queries.select(
            F.col("query_id").alias("anchor_id"), "embedding"
        )
        monkeypatch.setattr(s, "COLLECT_MAX_QUERY_ROWS", 2)
        with pytest.raises(ValueError, match="candidates="):
            s.hard_negatives(emb, anchors, k=3)
        # candidates path is unaffected by the cap
        cand = anchors.limit(1).select(
            "anchor_id",
            F.lit(1).cast("long").alias("vec_id"),
            F.lit(0.7).alias("cos_sim"),
        )
        assert (
            s.hard_negatives(emb, anchors, k=3, candidates=cand).count() == 1
        )


class TestReviewFixesR5:
    """r5 review findings: precoded+rerank path, NULL-vec training."""

    def test_precoded_rerank_needs_rerank_items(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        cbs = pq_train(emb.where(F.col("vec_id") < 200), m=4, ksub=4, iters=1)
        coded = pq_encode(emb, cbs)
        with pytest.raises(ValueError, match="rerank_items"):
            pq_topk(coded, queries, cbs, k=3, codes_col="codes", rerank=2)
        got = pq_topk(
            coded,
            queries,
            cbs,
            k=3,
            codes_col="codes",
            rerank=2,
            rerank_items=emb,
        )
        inline = pq_topk(emb, queries, cbs, k=3, rerank=2)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, inline.collect())
        )

    def test_pq_train_ignores_null_vectors(self, spark):
        from sparksearchengine_spark.operators.similarity import pq_train

        rows = [(0, None)] + [
            (i, [float(i + d) for d in range(4)]) for i in range(1, 9)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        cbs = pq_train(df, m=2, ksub=3, iters=1)
        assert len(cbs) == 2 and all(len(cb) == 3 for cb in cbs)


class TestPlanShapeR5:
    """Physical-plan guards for the r5 vector operators."""

    def test_pq_adc_is_broadcast_nested_loop(self, emb, queries):
        from sparksearchengine_spark.operators.similarity import pq_topk

        cbs = [
            [[0.1 * (j + c + d) for d in range(16)] for c in range(4)]
            for j in range(4)
        ]
        plan = (
            pq_topk(emb, queries, cbs, k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # queries (with LUT) broadcast; items never shuffle before top-k
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_hard_negatives_band_below_window(self, emb, queries):
        """The cosine band must filter BEFORE the rank window, so the
        window only sorts in-band rows."""
        from sparksearchengine_spark.operators.similarity import (
            hard_negatives,
        )

        anchors = queries.select(
            F.col("query_id").alias("anchor_id"), "embedding"
        )
        df = hard_negatives(emb, anchors, k=3, lo=0.2, hi=0.9)
        plan = df._jdf.queryExecution().executedPlan().toString()
        w = plan.find("Window")
        f = plan.rfind("Filter")
        # plan prints root-first: the band Filter appears BELOW (after)
        # the Window operator in the tree dump
        assert w != -1 and f != -1 and f > w, plan


class TestPqPersistence:
    def test_save_load_roundtrip_and_rerank(self, spark, tmp_path, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            pq_load,
            pq_save,
            pq_topk,
            pq_train,
        )

        cbs = pq_train(emb.where(F.col("vec_id") < 200), m=4, ksub=4, iters=1)
        path = str(tmp_path / "pq")
        pq_save(emb, path, cbs, store_vectors=True)
        codes, loaded_cbs, vectors = pq_load(spark, path)
        assert loaded_cbs == cbs and vectors is not None
        got = pq_topk(
            codes, queries, loaded_cbs, k=5, codes_col="codes",
            rerank=2, rerank_items=vectors,
        ).collect()
        want = pq_topk(emb, queries, cbs, k=5, rerank=2).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_save_without_vectors(self, spark, tmp_path, emb, queries):
        from sparksearchengine_spark.operators.similarity import (
            pq_load,
            pq_save,
            pq_topk,
            pq_train,
        )

        cbs = pq_train(emb.where(F.col("vec_id") < 200), m=4, ksub=4, iters=1)
        path = str(tmp_path / "pq2")
        pq_save(emb, path, cbs)
        codes, loaded_cbs, vectors = pq_load(spark, path)
        assert vectors is None
        assert pq_topk(
            codes, queries, loaded_cbs, k=3, codes_col="codes"
        ).count() > 0
