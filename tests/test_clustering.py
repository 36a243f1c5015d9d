"""Clustering + SemDedup + linear-classifier inference.

Hand-computable fixtures for the assignment/fit/keep rules, plan-shape
assertions for the scale claims (assignment is scan-stage: no Exchange),
and a quality bar for the fitted variant (inertia monotone, agreement
with pyspark.ml KMeans on separable data).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.classify import (
    classifier_score,
    classifier_score_vocab,
    hash_bucket_expr,
)
from sparksearchengine_spark.operators.clustering import (
    cluster_summary,
    default_centroids,
    kmeans_assign,
    kmeans_fit,
    semdedup,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    # two tight groups around (0,0) and (10,10), plus one point nearer the
    # second group; ids fix the deterministic init (ids 1,2 -> the first
    # two vectors seed cells 0,1)
    rows = [
        (1, [0.0, 0.1]),
        (2, [10.0, 10.0]),
        (3, [0.1, 0.0]),
        (4, [9.9, 10.1]),
        (5, [6.0, 6.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestKmeansAssign:
    def test_nearest_centroid_hand_computed(self, vecs):
        cents = [[0.0, 0.0], [10.0, 10.0]]
        got = {
            r["id"]: r["cell"]
            for r in kmeans_assign(vecs, cents).collect()
        }
        assert got == {1: 0, 3: 0, 2: 1, 4: 1, 5: 1}

    def test_tie_breaks_to_lowest_cell(self, spark):
        df = spark.createDataFrame(
            [(1, [5.0, 5.0])], "vec_id long, embedding array<float>"
        )
        cents = [[0.0, 0.0], [10.0, 10.0]]  # equidistant
        assert kmeans_assign(df, cents).first()["cell"] == 0

    def test_assignment_is_scan_stage(self, vecs):
        # the whole E-step must ride the scan: no Exchange in the plan
        plan = kmeans_assign(
            vecs, [[0.0, 0.0], [10.0, 10.0]]
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_default_centroids_lowest_ids(self, vecs):
        c = default_centroids(vecs, 2)
        assert c[0] == pytest.approx([0.0, 0.1])
        assert c[1] == pytest.approx([10.0, 10.0])

    def test_default_centroids_too_few_raises(self, vecs):
        with pytest.raises(ValueError, match="need >= 9"):
            default_centroids(vecs, 9)

    def test_arrow_assignment_equals_expr(self, spark):
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cents = default_centroids(emb, 8)
        a = sorted(map(tuple, kmeans_assign(emb, cents).collect()))
        b = sorted(
            map(tuple, kmeans_assign(emb, cents, method="arrow").collect())
        )
        assert a == b

    def test_arrow_assignment_null_vec_and_ties(self, spark):
        df = spark.createDataFrame(
            [(1, [5.0, 5.0]), (2, None)],
            "vec_id long, embedding array<float>",
        )
        cents = [[0.0, 0.0], [10.0, 10.0]]  # 1 is equidistant
        got = {
            r["id"]: r["cell"]
            for r in kmeans_assign(df, cents, method="arrow").collect()
        }
        assert got == {1: 0, 2: None}

    def test_arrow_scales_to_large_k(self, spark):
        # k=128 would be a 128-distance-expr projection on the expr
        # path; the arrow path is one matmul. Smoke: cells cover the
        # range and every point maps to its true argmin on a sample.
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cents = default_centroids(emb, 128)
        got = kmeans_assign(emb, cents, method="arrow")
        cells = [r["cell"] for r in got.collect()]
        assert len(cells) == 500 and all(0 <= c < 128 for c in cells)
        # ids 0..127 seeded the centroids -> each sits in its own cell
        seeded = {
            r["id"]: r["cell"]
            for r in got.where("id < 128").collect()
        }
        assert all(seeded[i] == i for i in range(128))


class TestKmeansFit:
    def test_converges_on_separable_groups(self, vecs):
        cents, asg = kmeans_fit(vecs, 2, iters=4)
        got = {r["id"]: r["cell"] for r in asg.collect()}
        # the two tight groups separate; 5 joins the (10,10) group
        assert got[1] == got[3]
        assert got[2] == got[4] == got[5]
        assert got[1] != got[2]
        # converged centroids are the group means
        assert cents[got[1]] == pytest.approx([0.05, 0.05])
        assert cents[got[2]] == pytest.approx(
            [(10.0 + 9.9 + 6.0) / 3, (10.0 + 10.1 + 6.0) / 3]
        )

    def test_inertia_never_increases(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cents = default_centroids(emb, 8)
        inertias = []
        for it in range(3):
            cents, _ = kmeans_fit(emb, 8, iters=1, centroids=cents)
            total = (
                cluster_summary(emb, cents)
                .agg(F.sum("inertia"))
                .first()[0]
            )
            inertias.append(total)
        assert all(
            a >= b - 1e-9 for a, b in zip(inertias, inertias[1:])
        ), inertias

    def test_matches_mllib_assignment_quality(self, spark):
        """Same-k fit must reach an inertia within 10% of pyspark.ml
        KMeans (seeded) on the sf0.001 embeddings — pins 'this is real
        k-means', not a plausible-looking clustering."""
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cents, _ = kmeans_fit(emb, 8, iters=10)
        ours = cluster_summary(emb, cents).agg(F.sum("inertia")).first()[0]

        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        f = emb.withColumn(
            "_fv", array_to_vector(F.col("embedding").cast("array<double>"))
        )
        m = KMeans(k=8, seed=7, featuresCol="_fv").fit(f)
        theirs = m.summary.trainingCost
        assert ours <= theirs * 1.10, (ours, theirs)

    def test_arrow_fit_equals_expr_fit(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        ce, ae = kmeans_fit(emb, 8, iters=2)
        ca, aa = kmeans_fit(emb, 8, iters=2, method="arrow")
        # same assignments; centroids equal to float tolerance (the
        # partial sums run through the same codegen aggregate)
        assert sorted(map(tuple, ae.collect())) == sorted(
            map(tuple, aa.collect())
        )
        for a, b in zip(ce, ca):
            assert a == pytest.approx(b, abs=1e-9)

    def test_empty_cluster_keeps_centroid(self, spark):
        # centroid 1 sits far from every point -> its cell is empty; the
        # update must keep it instead of dropping to k-1 or crashing
        df = spark.createDataFrame(
            [(1, [0.0]), (2, [1.0])], "vec_id long, embedding array<float>"
        )
        cents, asg = kmeans_fit(
            df, 2, iters=2, centroids=[[0.5], [1000.0]]
        )
        assert cents[1] == [1000.0]
        assert sorted(r["cell"] for r in asg.collect()) == [0, 0]

    def test_wrong_centroid_count_raises(self, vecs):
        with pytest.raises(ValueError, match="2 centroids for k=3"):
            kmeans_fit(vecs, 3, centroids=[[0.0, 0.0], [1.0, 1.0]])

    def test_null_embedding_survives_fit_and_semdedup(self, spark):
        # NULL vectors: excluded from the centroid update (no crash),
        # assigned a NULL cell, kept by semdedup (near nothing)
        rows = [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, None)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents, asg = kmeans_fit(
            df, 2, iters=2, centroids=[[0.0, 0.0], [10.0, 10.0]]
        )
        got = {r["id"]: r["cell"] for r in asg.collect()}
        assert got[1] == 0 and got[2] == 1 and got[3] is None
        sd = {
            r["id"]: r["keep"]
            for r in semdedup(
                df, threshold=0.5, n_clusters=2,
                centroids=[[0.0, 0.0], [10.0, 10.0]],
            ).collect()
        }
        assert sd == {1: True, 2: True, 3: True}


class TestSemDedup:
    def test_drops_higher_id_within_cell(self, spark):
        rows = [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.001]),   # near-dup of 1, same cell
            (4, [0.001, 1.0]),   # near-dup of 2, same cell
            (5, [-1.0, 0.0]),    # unique
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["id"]: r["keep"]
            for r in semdedup(df, threshold=0.99, n_clusters=2).collect()
        }
        assert got == {1: True, 2: True, 3: False, 4: False, 5: True}

    def test_cross_cell_pair_missed_by_design(self, spark):
        # identical vectors forced into different cells via explicit
        # centroids would still co-assign; instead make the pair straddle
        # a cell boundary: near-dups with the boundary between them
        rows = [(1, [4.9, 0.0]), (2, [5.1, 0.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["id"]: r["keep"]
            for r in semdedup(
                df, threshold=0.99, n_clusters=2,
                centroids=[[0.0, 0.0], [10.0, 0.0]],
            ).collect()
        }
        # cos(v1,v2) = 1.0 but cells differ -> both kept (the recall
        # trade-off the docstring declares)
        assert got == {1: True, 2: True}

    def test_zero_norm_vector_never_matches(self, spark):
        rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["id"]: r["keep"]
            for r in semdedup(
                df, threshold=0.5, n_clusters=1, centroids=[[0.0, 0.0]]
            ).collect()
        }
        assert got == {1: True, 2: True, 3: True}

    def test_arrow_method_equals_expr_method(self, spark):
        """The per-cell numpy matmul path must produce the exact rows of
        the SQL pairwise path — including near-dup drops, zero-norm and
        NULL vectors, and the NULL cell."""
        rows = [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.001]),
            (4, [0.001, 1.0]),
            (5, [-1.0, 0.0]),
            (6, [0.0, 0.0]),
            (7, None),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        kw = dict(threshold=0.99, n_clusters=2)
        expr_rows = sorted(
            map(tuple, semdedup(df, method="expr", **kw).collect())
        )
        arrow_rows = sorted(
            map(tuple, semdedup(df, method="arrow", **kw).collect())
        )
        assert arrow_rows == expr_rows

    def test_arrow_method_equals_expr_on_testdata(self, spark):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        kw = dict(threshold=0.4, n_clusters=8)
        a = sorted(map(tuple, semdedup(emb, method="expr", **kw).collect()))
        b = sorted(
            map(tuple, semdedup(emb, method="arrow", **kw).collect())
        )
        assert a == b and any(not r[2] for r in a)

    def test_bad_method_raises(self, vecs):
        with pytest.raises(ValueError, match="expr|arrow"):
            semdedup(vecs, method="numpy")

    def test_soundness_vs_exact_on_testdata(self, spark):
        """In-cell near-dedup vs the O(N^2) exact pairs: the drop set must
        be a strict SUBSET (soundness — semdedup never invents a dup) and
        non-empty. No recall bar here: the synthetic embeddings are
        near-orthogonal, so threshold-0.4 'duplicate' pairs are weakly
        correlated points that mostly straddle cell boundaries (~30%
        in-cell recall measured) — real near-dups (cos ≈ 1) co-cluster,
        which `test_drops_higher_id_within_cell` pins."""
        from sparksearchengine_spark.operators.similarity import (
            embedding_neardup_exact,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        t = 0.4
        sd = semdedup(emb, threshold=t, n_clusters=8)
        dropped = {r["id"] for r in sd.where(~F.col("keep")).collect()}
        exact_dropped = {
            r["id_b"]
            for r in embedding_neardup_exact(emb, threshold=t).collect()
        }
        assert dropped
        assert dropped <= exact_dropped


class TestClassifierScore:
    def test_hand_computed_integer_scores(self, spark):
        df = spark.createDataFrame(
            [(1, "aa bb aa"), (2, ""), (3, None)],
            "doc_id long, text string",
        )
        dim, weights = 4, [1, 10, 100, 1000]
        # bucket of each token via the same md5 rule, computed driver-side
        import hashlib

        def bucket(t):
            return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim

        expected1 = 2 * weights[bucket("aa")] + weights[bucket("bb")] + 5
        got = {
            r["id"]: (r["n_tokens"], r["score"])
            for r in classifier_score(df, weights, bias=5).collect()
        }
        assert got[1] == (3, expected1)
        assert got[2] == (0, 5)
        assert got[3][1] == 5  # NULL text scores exactly the bias

    def test_integer_weights_give_long_schema(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        s = classifier_score(df, [1, 2], threshold=0)
        assert dict(s.dtypes)["score"] == "bigint"
        assert "keep" in s.columns

    def test_float_weights_give_double_schema(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        s = classifier_score(df, [0.5, 1.5])
        assert dict(s.dtypes)["score"] == "double"

    def test_empty_weights_raise(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="non-empty"):
            classifier_score(df, [])

    def test_scoring_is_scan_stage(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = classifier_score(
            docs, [1, -1, 2, -2]
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_bucket_matches_python_md5(self, spark):
        import hashlib

        df = spark.createDataFrame(
            [("hello",), ("x1",), ("",)], "t string"
        )
        got = df.select(
            "t", hash_bucket_expr(F.col("t"), 97).alias("b")
        ).collect()
        for r in got:
            exp = int(hashlib.md5(r["t"].encode()).hexdigest()[:8], 16) % 97
            assert r["b"] == exp


class TestHashEmbed:
    def test_counts_and_normalization_hand_computed(self, spark):
        import hashlib
        import math

        from sparksearchengine_spark.operators.classify import hash_embed

        dim = 8
        df = spark.createDataFrame(
            [(1, "aa bb aa"), (2, ""), (3, None)],
            "doc_id long, text string",
        )
        got = {r["id"]: r["embedding"] for r in hash_embed(df, dim=dim).collect()}

        def bucket(t):
            return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim

        want = [0.0] * dim
        want[bucket("aa")] += 2
        want[bucket("bb")] += 1
        n = math.sqrt(sum(x * x for x in want))
        want = [x / n for x in want]
        assert got[1] == pytest.approx(want)
        assert got[2] == [0.0] * dim  # zero vector, not NaN
        assert got[3] == [0.0] * dim

    def test_arrow_equals_expr_bitwise(self, spark):
        from sparksearchengine_spark.operators.classify import hash_embed

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        a = {r["id"]: r["embedding"] for r in hash_embed(docs, dim=16).collect()}
        b = {
            r["id"]: r["embedding"]
            for r in hash_embed(docs, dim=16, method="arrow").collect()
        }
        assert a == b  # exact equality, not approx — integer counts

    def test_feeds_the_embedding_operators(self, spark):
        # the whole point: raw text -> vector -> semdedup finds the
        # exact-duplicate texts
        from sparksearchengine_spark.operators.classify import hash_embed

        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
             (3, "totally different words here")],
            "doc_id long, text string",
        )
        emb = hash_embed(df, dim=32).withColumnRenamed("id", "vec_id")
        got = {
            r["id"]: r["keep"]
            for r in semdedup(
                emb, threshold=0.99, n_clusters=1,
                centroids=[[0.0] * 32],
            ).collect()
        }
        assert got == {1: True, 2: False, 3: True}

    def test_bad_args_raise(self, spark):
        from sparksearchengine_spark.operators.classify import hash_embed

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="dim"):
            hash_embed(df, dim=0)
        with pytest.raises(ValueError, match="expr|arrow"):
            hash_embed(df, method="pandas")


class TestHashEmbedEdges:
    def test_dim_one_and_unnormalized(self, spark):
        from sparksearchengine_spark.operators.classify import hash_embed

        df = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        r = hash_embed(df, dim=1, normalize=False).collect()[0]
        assert r["embedding"] == [3.0]  # all tokens hash into bucket 0

    def test_arrow_unnormalized_counts(self, spark):
        from sparksearchengine_spark.operators.classify import hash_embed

        df = spark.createDataFrame(
            [(1, "x x y"), (2, None)], "doc_id long, text string"
        )
        a = {
            r["id"]: r["embedding"]
            for r in hash_embed(df, dim=4, normalize=False).collect()
        }
        b = {
            r["id"]: r["embedding"]
            for r in hash_embed(
                df, dim=4, normalize=False, method="arrow"
            ).collect()
        }
        assert a == b
        assert sum(a[1]) == 3.0 and a[2] == [0.0] * 4


class TestClassifierVocab:
    def test_vocab_join_scores(self, spark):
        df = spark.createDataFrame(
            [(1, "spark fast spark"), (2, "slow"), (3, "")],
            "doc_id long, text string",
        )
        w = spark.createDataFrame(
            [("spark", 2.0), ("slow", -3.0)], "term string, weight double"
        )
        got = {
            r["id"]: (r["n_tokens"], r["score"])
            for r in classifier_score_vocab(df, w, bias=1.0).collect()
        }
        # OOV 'fast' contributes 0
        assert got[1] == (3, 5.0)
        assert got[2] == (1, -2.0)
        assert got[3] == (0, 1.0)  # empty doc -> bias, still present

    def test_vocab_side_is_broadcast(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        w = spark.createDataFrame(
            [("the", 1.0)], "term string, weight double"
        )
        plan = classifier_score_vocab(
            docs, w
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestTfidfHashEmbed:
    def test_rare_terms_outweigh_common(self, spark):
        from sparksearchengine_spark.operators.classify import (
            tfidf_hash_embed,
        )
        import math

        # 'common' in every doc (idf floor), 'rare' in one
        df = spark.createDataFrame(
            [(1, "common rare"), (2, "common"), (3, "common"), (4, "common")],
            "doc_id long, text string",
        )
        out = {
            r["id"]: r["embedding"]
            for r in tfidf_hash_embed(df, dim=32, normalize=False).collect()
        }
        # doc 1's vector mass concentrates on the rare bucket
        v = out[1]
        assert max(v) > 0
        # idf('common') with df=4/N=4: ln(1 + 0.5/4.5); idf('rare')
        # df=1: ln(1 + 3.5/1.5) — rare weight is larger
        common_w = round(math.log(1 + 0.5 / 4.5), 6)
        rare_w = round(math.log(1 + 3.5 / 1.5), 6)
        assert sorted([x for x in v if x > 0]) == sorted(
            [common_w, rare_w]
        ) or sum(x > 0 for x in v) == 1  # (bucket collision fallback)

    def test_empty_doc_zero_vector(self, spark):
        from sparksearchengine_spark.operators.classify import (
            tfidf_hash_embed,
        )

        df = spark.createDataFrame(
            [(1, "a b"), (2, ""), (3, None)], "doc_id long, text string"
        )
        out = {
            r["id"]: r["embedding"]
            for r in tfidf_hash_embed(df, dim=8).collect()
        }
        assert out[2] == [0.0] * 8 and out[3] == [0.0] * 8
        assert len(out) == 3  # every input doc gets a row

    def test_normalized_unit_length(self, spark):
        import math

        from sparksearchengine_spark.operators.classify import (
            tfidf_hash_embed,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        rows = tfidf_hash_embed(docs, dim=16).collect()
        for r in rows[:20]:
            n = math.sqrt(sum(x * x for x in r["embedding"]))
            assert n == 0.0 or abs(n - 1.0) < 1e-9

    def test_foreign_vocab_oov_ignored(self, spark):
        from sparksearchengine_spark.operators.classify import (
            tfidf_hash_embed,
        )

        df = spark.createDataFrame(
            [(1, "known unknown")], "doc_id long, text string"
        )
        vocab = spark.createDataFrame([("known", 1)], "term string, df_t long")
        v = tfidf_hash_embed(
            df, dim=8, normalize=False, df_table=vocab, n_docs=10
        ).first()["embedding"]
        # only 'known' contributes
        assert sum(x > 0 for x in v) == 1
        # a foreign vocabulary without its corpus size must refuse:
        # local N mixed with foreign df_t flips idf signs (ADVICE r3)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="n_docs"):
            tfidf_hash_embed(df, dim=8, df_table=vocab)

    def test_feeds_semdedup(self, spark):
        from sparksearchengine_spark.operators.classify import (
            tfidf_hash_embed,
        )
        from sparksearchengine_spark.operators.clustering import semdedup

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        emb = tfidf_hash_embed(docs, dim=16).select(
            F.col("id").alias("vec_id"), F.col("embedding")
        )
        out = semdedup(emb, threshold=0.9, n_clusters=4)
        assert out.count() == docs.count()


class TestClassifierFit:
    """classifier_fit (r5): batch logistic regression over hashed token
    counts — the fastText-style quality-filter training that feeds
    classifier_score. Quality-bar contract (the kmeans_fit precedent):
    exact cross-engine checks live on inference with pinned weights."""

    @pytest.fixture(scope="class")
    def labeled(self, spark):
        # 'good'/'bad' carry the signal; filler tokens are shared noise
        rows = []
        for i in range(40):
            noise = f"the quick fox {i % 7}"
            if i % 2 == 0:
                rows.append((i, f"good great {noise}", 1))
            else:
                rows.append((i, f"bad awful {noise}", 0))
        return spark.createDataFrame(
            rows, "doc_id long, text string, label int"
        ).coalesce(1)  # single partition -> deterministic FP fold order

    def test_loss_decreases_and_separates(self, labeled):
        from sparksearchengine_spark.operators.classify import (
            classifier_fit,
            classifier_score,
        )

        w, b, hist = classifier_fit(
            labeled, "label", dim=256, iters=15, lr=1.0
        )
        assert len(hist) == 15
        # monotone-ish: final loss way below the ln(2) start
        assert hist[0] == pytest.approx(math.log(2.0), abs=1e-6)
        assert hist[-1] < 0.25 * hist[0]
        # fitted model separates the training set perfectly
        scored = {
            r["id"]: r["score"]
            for r in classifier_score(labeled, w, bias=b).collect()
        }
        labels = {r["doc_id"]: r["label"] for r in labeled.collect()}
        assert all(
            (scored[i] > 0) == (labels[i] == 1) for i in scored
        )

    def test_deterministic_on_same_partitioning(self, labeled):
        from sparksearchengine_spark.operators.classify import (
            classifier_fit,
        )

        a = classifier_fit(labeled, "label", dim=64, iters=3, lr=0.5)
        c = classifier_fit(labeled, "label", dim=64, iters=3, lr=0.5)
        assert a == c

    def test_l2_shrinks_weights(self, labeled):
        from sparksearchengine_spark.operators.classify import (
            classifier_fit,
        )

        w0, _, _ = classifier_fit(labeled, "label", dim=64, iters=5, lr=1.0)
        w2, _, _ = classifier_fit(
            labeled, "label", dim=64, iters=5, lr=1.0, l2=0.5
        )
        assert sum(x * x for x in w2) < sum(x * x for x in w0)

    def test_empty_and_bad_args_raise(self, spark, labeled):
        from sparksearchengine_spark.operators.classify import (
            classifier_fit,
        )

        with pytest.raises(ValueError, match="empty"):
            classifier_fit(labeled.where("doc_id < 0"), "label", iters=1)
        with pytest.raises(ValueError):
            classifier_fit(labeled, "label", dim=0)

    def test_null_text_contributes_bias_only(self, spark):
        from sparksearchengine_spark.operators.classify import (
            classifier_fit,
        )

        df = spark.createDataFrame(
            [(0, None, 1), (1, "bad", 0), (2, "good", 1)],
            "doc_id long, text string, label int",
        ).coalesce(1)
        w, b, hist = classifier_fit(df, "label", dim=32, iters=3, lr=0.5)
        assert len(hist) == 3 and all(x == x for x in hist)  # no NaN
