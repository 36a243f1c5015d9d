"""Dedup operators: connected components, canonical assignment, recall
harness, and the textstats lang-id / winnowing oracles' Spark side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestConnectedComponents:
    def test_chain_and_islands(self, spark):
        from sparksearchengine_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, 8)] + [(20, 21)],
            "id_a long, id_b long",
        )
        comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
        assert comp == {**{i: 1 for i in range(1, 9)}, 20: 20, 21: 20}

    def test_converges_on_long_chain(self, spark):
        # 64-node path: naive propagation needs 63 rounds; pointer jumping
        # must converge within the max_iter bound
        from sparksearchengine_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], "id_a long, id_b long"
        )
        comp = connected_components(pairs, max_iter=10)
        assert comp.where(F.col("component") != 0).count() == 0 or (
            {r["component"] for r in comp.collect()} == {0}
        )

    def test_truncates_deep_cached_caller_lineage(self, spark):
        # r12 regression guard: connected_components PINS (checkpoints)
        # the pair table at loop entry, truncating the caller's lineage
        # before the iterative joins. Without the truncation, a caller
        # pipeline with NESTED persisted frames made AQE's per-update
        # explain strings grow multiplicatively (each cached frame
        # re-prints its full cached plan at every reference) — plan-
        # STRING generation alone OOM'd a 4g driver on
        # examples/pretraining_pipeline_example.py. This reconstructs
        # that shape small: two nested cache levels under a fan-out
        # pair build, run under a tight plan-string budget, asserting
        # both completion and correct components.
        from sparksearchengine_spark.operators.dedup import (
            connected_components,
        )

        old_cap = spark.conf.get("spark.sql.maxPlanStringLength")
        spark.conf.set("spark.sql.maxPlanStringLength", str(64 * 1024))
        l1 = l2 = None
        try:
            base = spark.range(0, 40).select(
                F.col("id"), (F.col("id") % 4).alias("grp")
            )
            l1 = base.select(
                "id", "grp", F.xxhash64("id").alias("h")
            ).persist()
            l1.count()
            l2 = (
                l1.join(l1.select(F.col("id").alias("id2"), "grp"), "grp")
                .where(F.col("id") < F.col("id2"))
                .persist()
            )
            l2.count()
            pairs = l2.select(
                F.col("id").alias("id_a"), F.col("id2").alias("id_b")
            )
            comp = {
                r["id"]: r["component"]
                for r in connected_components(pairs).collect()
            }
            # each grp is a clique; component = min id of the clique
            assert comp == {i: i % 4 for i in range(40)}
        finally:
            spark.conf.set("spark.sql.maxPlanStringLength", old_cap)
            for df in (l2, l1):
                if df is not None:
                    df.unpersist()

    def test_canonicalize_covers_all_rows(self, spark):
        from sparksearchengine_spark.operators.dedup import canonicalize_pairs

        docs = spark.createDataFrame(
            [(i,) for i in [1, 2, 3, 10, 11, 30]], "doc_id long"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        got = {
            r["doc_id"]: (r["canon_id"], r["is_duplicate"])
            for r in canonicalize_pairs(docs, pairs).collect()
        }
        assert got == {
            1: (1, False), 2: (1, True), 3: (1, True),
            10: (10, False), 11: (10, True), 30: (30, False),
        }

    def test_minhash_canon_matches_exact_pair_components(self, docs_df):
        # at sf0.001 the LSH pair set equals the exact pair set (recall 1),
        # so canon over minhash pairs == canon over exact jaccard pairs
        from sparksearchengine_spark.operators.dedup import (
            canonicalize_pairs,
            minhash_lsh_canon,
            ngram_jaccard_join,
        )

        got = minhash_lsh_canon(docs_df, threshold=0.8)
        want = canonicalize_pairs(
            docs_df, ngram_jaccard_join(docs_df, threshold=0.8)
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


class TestRecallHarness:
    def test_pair_recall_math(self, spark):
        from sparksearchengine_spark.operators.recall import pair_recall

        exact = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6), (7, 8)], "id_a long, id_b long"
        )
        approx = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6), (9, 10)], "id_a long, id_b long"
        )
        row = pair_recall(approx, exact).collect()[0]
        assert (row["n_exact"], row["n_found"], row["recall"]) == (4, 3, 0.75)

    def test_simhash_banding_has_full_recall(self, docs_df):
        # pigeonhole guarantee: hamming <= 3 over 4 blocks => >= 1 equal
        # block, so the banded join misses nothing vs brute force
        from sparksearchengine_spark.operators.dedup import (
            simhash_dedup,
            simhash_neardup_exact,
        )
        from sparksearchengine_spark.operators.recall import pair_recall

        row = pair_recall(
            simhash_dedup(docs_df, max_hamming=3),
            simhash_neardup_exact(docs_df, max_hamming=3),
        ).collect()[0]
        assert row["recall"] == 1.0

    def test_labeled_threshold(self, spark):
        from sparksearchengine_spark.operators.recall import (
            labeled_recall_ok,
            pair_recall,
        )

        exact = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
        approx = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        r = pair_recall(approx, exact)
        assert labeled_recall_ok("x", r, 0.4).collect()[0]["recall_ok"] is True
        assert labeled_recall_ok("x", r, 0.6).collect()[0]["recall_ok"] is False


class TestLangId:
    def test_stopword_argmax(self, spark):
        from sparksearchengine_spark.operators.textstats import lang_id

        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat and it was good"),
                (2, "el perro corre por la calle y se va del parque"),
                (3, "le chien est dans la rue et les gens du quartier"),
                (4, "zzz qqq xxx"),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
        assert got == {1: "en", 2: "es", 3: "fr", 4: "und"}

    def test_cjk_script_ratio_predicts_zh(self, spark):
        from sparksearchengine_spark.operators.textstats import lang_id

        docs = spark.createDataFrame(
            [
                (1, "这是一个中文句子没有空格"),
                (2, "mixed 中文 with the english the the and of to in"),
                (3, "the quick brown fox and the lazy dog"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in lang_id(docs).collect()}
        assert rows[1]["lang_pred"] == "zh"
        assert rows[1]["lang_hits"] == 12  # every char is an ideograph
        assert rows[3]["lang_pred"] == "en"
        # doc 2: 2 ideographs / ~40 non-space chars < 0.3 -> stopword path
        assert rows[2]["lang_pred"] == "en"


class TestWinnowing:
    def test_deterministic_and_discriminative(self, spark):
        from sparksearchengine_spark.operators.textstats import (
            rolling_hash_fingerprint,
        )

        docs = spark.createDataFrame(
            [
                (1, "a b c d e f g h i j"),
                (2, "a b c d e f g h i j"),
                (3, "totally different words here in this one doc now yes"),
            ],
            "doc_id long, text string",
        )
        fp = {r["doc_id"]: r["fp_winnow"] for r in rolling_hash_fingerprint(docs).collect()}
        assert fp[1] == fp[2]
        assert fp[1] != fp[3]


class TestDeterministicSampling:
    """operators/sampling.py — hash-derived membership, no RNG state."""

    def test_repartition_invariant(self, spark, docs_df):
        from sparksearchengine_spark.operators.sampling import (
            stratified_sample,
        )

        frac = {"en": 0.5, "es": 0.25}
        a = stratified_sample(docs_df, "lang", frac, key_col="doc_id")
        b = stratified_sample(
            docs_df.repartition(7), "lang", frac, key_col="doc_id"
        )
        ids = lambda d: sorted(r["doc_id"] for r in d.select("doc_id").collect())
        assert ids(a) == ids(b) and len(ids(a)) > 0

    def test_fraction_roughly_honored(self, spark, docs_df):
        from sparksearchengine_spark.operators.sampling import (
            train_test_split,
        )

        t = train_test_split(docs_df, "doc_id", test_fraction=0.2)
        n = docs_df.count()
        n_test = t.where("split = 'test'").count()
        assert 0.1 * n < n_test < 0.3 * n

    def test_split_stable_under_corpus_growth(self, spark, docs_df):
        from sparksearchengine_spark.operators.sampling import (
            train_test_split,
        )

        half = docs_df.where("doc_id % 2 = 0")
        full = train_test_split(docs_df, "doc_id", 0.2)
        part = train_test_split(half, "doc_id", 0.2)
        m_full = {r["doc_id"]: r["split"] for r in full.collect()}
        for r in part.collect():
            assert m_full[r["doc_id"]] == r["split"]

    def test_default_fraction_drops_unlisted_strata(self, spark, docs_df):
        from sparksearchengine_spark.operators.sampling import (
            stratified_sample,
        )

        s = stratified_sample(docs_df, "lang", {"en": 1.0}, key_col="doc_id")
        assert s.where("lang <> 'en'").count() == 0
        assert s.count() == docs_df.where("lang = 'en'").count()


class TestMixtureSample:
    """operators/sampling.py::mixture_rates/mixture_sample — token-budget
    mixture realization."""

    @pytest.fixture()
    def tok_df(self, spark):
        # per-group token totals: a=1000 (10x100), b=100 (10x10)
        rows = [(i, "a" if i < 10 else "b", 100 if i < 10 else 10)
                for i in range(20)]
        return spark.createDataFrame(rows, "doc_id long, g string, nt long")

    def test_rates_hand_computed(self, tok_df):
        from sparksearchengine_spark.operators.sampling import mixture_rates

        r = mixture_rates(
            tok_df, "g", {"a": 0.5, "b": 0.5}, budget_tokens=200,
            token_col="nt",
        )
        # a: 200*0.5/1000 = 0.1; b: 200*0.5/100 = 1.0 (capped)
        assert r == {"a": pytest.approx(0.1), "b": pytest.approx(1.0)}

    def test_unweighted_group_kept_out(self, tok_df):
        from sparksearchengine_spark.operators.sampling import mixture_sample

        s = mixture_sample(
            tok_df, "g", {"a": 1.0}, budget_tokens=10_000,
            key_col="doc_id", token_col="nt",
        )
        got = {r["doc_id"]: r["keep"] for r in s.collect()}
        assert all(got[i] for i in range(10))        # a: rate capped at 1
        assert not any(got[i] for i in range(10, 20))  # b unweighted

    def test_membership_partitioning_invariant(self, tok_df):
        from sparksearchengine_spark.operators.sampling import mixture_sample

        kw = dict(weights={"a": 0.7, "b": 0.3}, budget_tokens=300,
                  key_col="doc_id", token_col="nt")
        a = mixture_sample(tok_df, "g", **kw)
        b = mixture_sample(tok_df.repartition(7), "g", **kw)
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_budget_roughly_honored_on_testdata(self, spark, docs_df):
        from sparksearchengine_spark.operators.sampling import mixture_sample
        from sparksearchengine_spark.operators.textstats import (
            token_count_expr,
        )
        from pyspark.sql import functions as F

        d = docs_df.withColumn(
            "nt", token_count_expr(F.col("text")).cast("long")
        )
        total = d.agg(F.sum("nt")).first()[0]
        budget = int(total * 0.3)
        s = mixture_sample(
            d, "lang", {"en": 0.5, "es": 0.5}, budget,
            key_col="doc_id", token_col="nt",
        )
        kept = s.where("keep").agg(F.sum("nt")).first()[0] or 0
        # md5-bucket quantization: within 2x either way of the budget
        # actually realizable (each group caps at its availability)
        assert 0 < kept <= total
        assert kept <= budget * 2

    def test_zero_weight_sum_raises(self, tok_df):
        from sparksearchengine_spark.operators.sampling import mixture_rates

        with pytest.raises(ValueError, match="sum to > 0"):
            mixture_rates(tok_df, "g", {}, 100, token_col="nt")

    def test_repeats_up_sample_hand_computed(self, tok_df):
        from sparksearchengine_spark.operators.sampling import mixture_sample

        # b (100 tokens) gets weight 0.5 of a 500-token budget -> rate
        # 2.5: every b row repeats 2x, the hash-selected half 3x;
        # a (1000 tokens) -> rate 0.25: 0 or 1 copies
        s = mixture_sample(
            tok_df, "g", {"a": 0.5, "b": 0.5}, budget_tokens=500,
            key_col="doc_id", token_col="nt", allow_repeats=True,
        )
        got = {r["doc_id"]: r["n_copies"] for r in s.collect()}
        assert all(got[i] in (0, 1) for i in range(10))
        assert all(got[i] in (2, 3) for i in range(10, 20))
        # the fractional slice is non-trivial on both sides
        assert 0 < sum(got[i] == 3 for i in range(10, 20)) < 10

    def test_select_top_by_budget_hand_computed(self, spark):
        from sparksearchengine_spark.operators.sampling import (
            select_top_by_budget,
        )

        rows = [
            # g=a: scores 9,8,7 with 40+40+40 tokens, budget 100 ->
            # keep the two best, the third overflows
            (1, "a", 9, 40), (2, "a", 8, 40), (3, "a", 7, 40),
            # g=b: no budget entry -> nothing kept
            (4, "b", 99, 1),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, g string, score long, nt long"
        )
        got = {
            r["doc_id"]: r["keep"]
            for r in select_top_by_budget(
                df, "g", "score", "nt", {"a": 100}
            ).collect()
        }
        assert got == {1: True, 2: True, 3: False, 4: False}

    def test_select_top_greedy_prefix_not_knapsack(self, spark):
        from sparksearchengine_spark.operators.sampling import (
            select_top_by_budget,
        )

        # best row fills the budget; the tiny low-score row after the
        # overflowing middle row is NOT pulled forward
        rows = [(1, "a", 9, 90), (2, "a", 8, 20), (3, "a", 7, 5)]
        df = spark.createDataFrame(
            rows, "doc_id long, g string, score long, nt long"
        )
        got = {
            r["doc_id"]: r["keep"]
            for r in select_top_by_budget(
                df, "g", "score", "nt", {"a": 100}
            ).collect()
        }
        assert got == {1: True, 2: False, 3: False}

    def test_select_top_ties_break_on_key(self, spark):
        from sparksearchengine_spark.operators.sampling import (
            select_top_by_budget,
        )

        rows = [(2, "a", 5, 60), (1, "a", 5, 60)]
        df = spark.createDataFrame(
            rows, "doc_id long, g string, score long, nt long"
        )
        got = {
            r["doc_id"]: r["keep"]
            for r in select_top_by_budget(
                df, "g", "score", "nt", {"a": 100}
            ).collect()
        }
        assert got == {1: True, 2: False}  # lower key wins the tie

    def test_repeats_rate_below_one_matches_keep_path(self, tok_df):
        from sparksearchengine_spark.operators.sampling import mixture_sample

        kw = dict(weights={"a": 1.0}, budget_tokens=300,
                  key_col="doc_id", token_col="nt")
        keep = {
            r["doc_id"]: r["keep"]
            for r in mixture_sample(tok_df, "g", **kw).collect()
        }
        copies = {
            r["doc_id"]: r["n_copies"]
            for r in mixture_sample(
                tok_df, "g", allow_repeats=True, **kw
            ).collect()
        }
        for i in keep:
            assert copies[i] == int(keep[i])


class TestCrossCorpusJoin:
    """Cross-corpus (A vs B) near-dup joins: exact prefix-filtered and
    MinHash-LSH variants agree with the brute-force answer."""

    @staticmethod
    def _brute(spark, left_rows, right_rows, n, t):
        import itertools

        def grams(text):
            toks = [x for x in __import__("re").split(
                r"[^a-z0-9]+", text.lower()) if x]
            if len(toks) < n:
                return {" ".join(toks)}
            return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

        out = set()
        for (il, tl), (ir, tr) in itertools.product(left_rows, right_rows):
            gl, gr = grams(tl), grams(tr)
            j = len(gl & gr) / len(gl | gr)
            if j >= t:
                out.add((il, ir))
        return out

    @pytest.fixture(scope="class")
    def two_corpora(self, spark):
        left = [
            (1, "spark makes big data small again every day"),
            (2, "a totally unique left document about nothing"),
            (3, "the quick brown fox jumps over the lazy dog"),
        ]
        right = [
            (1, "spark makes big data small again every day"),  # = left 1
            (20, "the quick brown fox jumps over the lazy dog today"),
            (30, "completely different right side content here"),
        ]
        ldf = spark.createDataFrame(left, "doc_id long, text string")
        rdf = spark.createDataFrame(right, "doc_id long, text string")
        return left, right, ldf, rdf

    def test_exact_cross_matches_brute_force(self, spark, two_corpora):
        from sparksearchengine_spark.operators.dedup import (
            ngram_jaccard_join_cross,
        )

        left, right, ldf, rdf = two_corpora
        got = {
            (r["id_l"], r["id_r"])
            for r in ngram_jaccard_join_cross(
                ldf, rdf, n=3, threshold=0.6
            ).collect()
        }
        want = self._brute(spark, left, right, 3, 0.6)
        assert got == want and (1, 1) in got

    def test_lsh_cross_subset_of_exact_and_full_recall_here(
        self, spark, two_corpora
    ):
        from sparksearchengine_spark.operators.dedup import (
            minhash_lsh_join, ngram_jaccard_join_cross,
        )

        left, right, ldf, rdf = two_corpora
        exact = {
            (r["id_l"], r["id_r"], round(r["jaccard"], 9))
            for r in ngram_jaccard_join_cross(
                ldf, rdf, n=3, threshold=0.6
            ).collect()
        }
        lsh = {
            (r["id_l"], r["id_r"], round(r["jaccard"], 9))
            for r in minhash_lsh_join(
                ldf, rdf, n=3, threshold=0.6
            ).collect()
        }
        assert lsh <= exact
        assert lsh == exact  # identical copies: every band collides

    def test_no_id_order_constraint_across_namespaces(self, spark):
        # id_l > id_r must still match: ids are separate namespaces
        from sparksearchengine_spark.operators.dedup import (
            ngram_jaccard_join_cross,
        )

        ldf = spark.createDataFrame(
            [(99, "same exact text in both corpora")],
            "doc_id long, text string",
        )
        rdf = spark.createDataFrame(
            [(1, "same exact text in both corpora")],
            "doc_id long, text string",
        )
        got = ngram_jaccard_join_cross(ldf, rdf, n=3, threshold=0.9).collect()
        assert [(r["id_l"], r["id_r"]) for r in got] == [(99, 1)]


class TestSamplePerGroup:
    def test_caps_and_determinism(self, spark, docs_df):
        from sparksearchengine_spark.operators.sampling import sample_per_group

        s = sample_per_group(docs_df, "lang", n=5, key_col="doc_id")
        per = {r["lang"]: r["c"] for r in
               s.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
        full = {r["lang"]: r["c"] for r in
                docs_df.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
        for lang, c in per.items():
            assert c == min(5, full[lang])
        a = sorted(r["doc_id"] for r in s.collect())
        b = sorted(r["doc_id"] for r in sample_per_group(
            docs_df.repartition(7), "lang", n=5, key_col="doc_id").collect())
        assert a == b

    def test_stable_under_growth(self, spark, docs_df):
        from sparksearchengine_spark.operators.sampling import sample_per_group

        half = docs_df.where("doc_id % 2 = 0")
        s_half = {r["doc_id"] for r in
                  sample_per_group(half, "lang", 3, "doc_id").collect()}
        s_full = {r["doc_id"] for r in
                  sample_per_group(docs_df, "lang", 3, "doc_id").collect()}
        # growth can only displace members, never add back non-members:
        # full-corpus sample restricted to half's rows ⊆ half's sample
        assert (s_full & {r["doc_id"] for r in half.collect()}) <= s_half


class TestCleanText:
    def test_normalization_rules(self, spark):
        from sparksearchengine_spark.operators.textstats import clean_text

        df = spark.createDataFrame(
            [(1, "  a\tb\x00c  \n\n\n\nd  "), (2, None)],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r["text"] for r in clean_text(df).collect()}
        assert rows[1] == "a bc\n\nd"
        assert rows[2] is None


class TestBoilerplateLines:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_shared_lines_removed_unique_kept(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        df = self._df(spark, [
            (1, "alpha one\nshared footer\nbeta"),
            (2, "gamma two\nshared footer"),
            (3, "delta three"),
        ])
        got = {
            r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
            for r in remove_boilerplate_lines(df, min_docs=2).collect()
        }
        assert got == {
            1: ("alpha one\nbeta", 3, 1),
            2: ("gamma two", 2, 1),
            3: ("delta three", 1, 0),
        }

    def test_crlf_blank_lines_survive(self, spark):
        # CRLF blank separators must hash as '' (keep_blank exemption),
        # not '\r' (which would be cross-doc boilerplate and strip every
        # paragraph break); output is LF-normalized
        from sparksearchengine_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        body = "para one {i}\r\n\r\npara two {i}\r\nshared footer"
        df = self._df(spark, [
            (i, body.replace("{i}", str(i))) for i in range(1, 4)
        ])
        got = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in remove_boilerplate_lines(df, min_docs=2).collect()
        }
        for i in range(1, 4):
            assert got[i] == (f"para one {i}\n\npara two {i}", 1)

    def test_line_order_preserved(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        df = self._df(spark, [
            (1, "z last\ncommon\na first\ncommon\nm mid"),
            (2, "common"),
        ])
        row = {r["doc_id"]: r["text"]
               for r in remove_boilerplate_lines(df, min_docs=2).collect()}
        assert row[1] == "z last\na first\nm mid"
        assert row[2] == ""

    def test_blank_lines_exempt_by_default(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        df = self._df(spark, [
            (1, "para one\n\npara two"),
            (2, "other\n\nmore"),
        ])
        out = remove_boilerplate_lines(df, min_docs=2)
        got = {r["doc_id"]: (r["text"], r["n_removed"]) for r in out.collect()}
        assert got == {
            1: ("para one\n\npara two", 0),
            2: ("other\n\nmore", 0),
        }

    def test_blank_lines_removed_when_not_exempt(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        df = self._df(spark, [
            (1, "para one\n\npara two"),
            (2, "other\n\nmore"),
        ])
        out = remove_boilerplate_lines(df, min_docs=2, keep_blank=False)
        got = {r["doc_id"]: r["text"] for r in out.collect()}
        assert got == {1: "para one\npara two", 2: "other\nmore"}

    def test_null_text_passes_through(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        df = self._df(spark, [(1, None), (2, "a\nb"), (3, "a\nc")])
        got = {r["doc_id"]: (r["text"], r["n_removed"])
               for r in remove_boilerplate_lines(df, min_docs=2).collect()}
        assert got[1] == (None, 0) or got[1] == (None, 1)
        # doc 1's NULL counts one synthetic empty line; text stays NULL
        assert got[1][0] is None
        assert got[2] == ("b", 1)
        assert got[3] == ("c", 1)

    def test_extra_columns_preserved(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        df = spark.createDataFrame(
            [(1, "x\nshared", "en"), (2, "y\nshared", "es")],
            "doc_id long, text string, lang string",
        )
        out = remove_boilerplate_lines(df, min_docs=2)
        assert set(out.columns) == {
            "doc_id", "text", "lang", "n_lines", "n_removed"
        }
        got = {r["doc_id"]: (r["text"], r["lang"]) for r in out.collect()}
        assert got == {1: ("x", "en"), 2: ("y", "es")}

    def test_within_doc_repeat_not_boilerplate(self, spark):
        # a line repeated inside ONE doc is not cross-doc boilerplate
        from sparksearchengine_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        df = self._df(spark, [(1, "echo\necho"), (2, "solo")])
        got = {r["doc_id"]: r["text"]
               for r in remove_boilerplate_lines(df, min_docs=2).collect()}
        assert got == {1: "echo\necho", 2: "solo"}


class TestCrossDocNgramDup:
    def test_shared_passage_detected(self, spark):
        from sparksearchengine_spark.operators.dedup import cross_doc_ngram_dup

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "start pad quick brown fox jumps over end bit"),
                (3, "totally different words here now"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
            for r in cross_doc_ngram_dup(df, n=5, min_docs=2).collect()
        }
        # doc1: 5 windows of 5; shared run "quick brown fox jumps over"
        # is 1 window in each of doc1/doc2
        assert got[1] == (5, 1)
        assert got[2] == (5, 1)
        assert got[3] == (1, 0)  # 5 tokens -> exactly one 5-window

    def test_short_and_empty_docs(self, spark):
        from sparksearchengine_spark.operators.dedup import cross_doc_ngram_dup

        df = spark.createDataFrame(
            [(1, "tiny doc"), (2, "tiny doc"), (3, ""), (4, None)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac"])
            for r in cross_doc_ngram_dup(df, n=5, min_docs=2).collect()
        }
        # short docs compare via their whole-doc gram
        assert got[1] == (1, 1, 1.0)
        assert got[2] == (1, 1, 1.0)
        assert got[3] == (0, 0, 0.0)
        assert got[4] == (0, 0, 0.0)

    def test_multiplicity_counted(self, spark):
        from sparksearchengine_spark.operators.dedup import cross_doc_ngram_dup

        df = spark.createDataFrame(
            [(1, "a b a b a"), (2, "a b only")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
            for r in cross_doc_ngram_dup(df, n=2, min_docs=2).collect()
        }
        # doc1 windows: (a b)(b a)(a b)(b a); "a b" occurs in both docs ->
        # dup windows in doc1 = 2 (both "a b" occurrences)
        assert got[1] == (4, 2)
        assert got[2] == (2, 1)


class TestRemoveDuplicateSpans:
    def test_shared_span_removed_from_all_docs(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta shared run of tokens here"
                    " epsilon zeta"),
                (2, "other words shared run of tokens here and more tail"),
                (3, "totally unrelated content"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r.asDict()
            for r in remove_duplicate_spans(df, n=5, min_docs=2).collect()
        }
        assert got[1]["text"] == "alpha beta gamma delta epsilon zeta"
        assert got[1]["n_removed_tokens"] == 5
        assert got[2]["text"] == "other words and more tail"
        assert got[3]["text"] == "totally unrelated content"
        assert got[3]["n_removed_tokens"] == 0

    def test_overlapping_windows_union_coverage(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        # shared run of SIX tokens with n=5 -> two overlapping dup windows
        # covering tokens 0..5 in doc 1; union, not double count
        run = "one two three four five six"
        df = spark.createDataFrame(
            [(1, run + " private suffix"), (2, "prefix bit " + run)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r.asDict()
            for r in remove_duplicate_spans(df, n=5, min_docs=2).collect()
        }
        assert got[1]["text"] == "private suffix"
        assert got[1]["n_removed_tokens"] == 6
        assert got[2]["text"] == "prefix bit"
        assert got[2]["n_removed_tokens"] == 6

    def test_exact_dup_docs_fully_removed(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        df = spark.createDataFrame(
            [(1, "same short doc"), (2, "same short doc")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r.asDict()
            for r in remove_duplicate_spans(df, n=5, min_docs=2).collect()
        }
        # < n tokens -> whole-doc window; both copies empty out
        assert got[1]["text"] == "" and got[2]["text"] == ""
        assert got[1]["n_removed_tokens"] == 3

    def test_null_and_empty(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "real content stays")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r.asDict()
            for r in remove_duplicate_spans(df).collect()
        }
        assert got[1]["text"] is None and got[1]["n_tokens"] == 0
        assert got[2]["text"] == "" and got[2]["n_tokens"] == 0
        assert got[3]["text"] == "real content stays"


class TestWinnowOverlapPairs:
    def test_identical_docs_full_overlap(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            winnow_overlap_pairs,
        )

        text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = spark.createDataFrame(
            [(1, text), (2, text), (3, "totally different words " * 4)],
            "doc_id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"]): r["overlap"]
            for r in winnow_overlap_pairs(df, min_overlap=0.5).collect()
        }
        assert got == {(1, 2): 1.0}

    def test_partial_containment_scores_by_smaller_side(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            winnow_overlap_pairs,
        )

        core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = spark.createDataFrame(
            [
                (1, core),
                (2, core + " lambda mu nu xi omicron pi rho sigma tau"),
            ],
            "doc_id long, text string",
        )
        rows = winnow_overlap_pairs(df, min_overlap=0.3).collect()
        assert len(rows) == 1
        r = rows[0]
        # the shorter doc's fingerprints nearly all appear in the longer
        assert r["overlap"] >= 0.5

    def test_no_inferred_filter_below_the_widen_exchange(self, spark):
        """A plain explode makes Catalyst infer size(sel)>0 and push the
        whole interpreted winnowing chain below the exchange — onto the
        pre-shuffle side, which is ONE task for a single-split input
        (measured 28x at sf0.1). Pin the fixed plan shape: no
        HOF-bearing Filter below any Exchange."""
        from sparksearchengine_spark.operators.dedup import (
            winnow_overlap_pairs,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = winnow_overlap_pairs(
            docs, min_overlap=0.5
        )._jdf.queryExecution().executedPlan().toString()
        for seg in p.split("Exchange")[1:]:
            scan_side = seg.split("FileScan")[0]
            assert "Filter (size(array_sort" not in scan_side

    def test_empty_docs_never_pair(self, spark):
        # empty/NULL docs share the md5('') sentinel selection — they
        # must not surface as overlap-1.0 "plagiarism" pairs
        from sparksearchengine_spark.operators.dedup import (
            winnow_overlap_pairs,
        )

        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "   "), (4, "real content words here")],
            "doc_id long, text string",
        )
        assert winnow_overlap_pairs(df, min_overlap=0.1).count() == 0

    def test_cap_excluded_from_denominator_too(self, spark):
        # MOSS semantics: stop fingerprints leave BOTH sides — a doc
        # that is boilerplate + copied content still scores ~1.0
        from sparksearchengine_spark.operators.dedup import (
            winnow_overlap_pairs,
        )

        boiler = "this exact shared boilerplate sentence repeats across every doc in corpus"
        core = "unique copied passage alpha beta gamma delta epsilon zeta"
        df = spark.createDataFrame(
            [(i, f"{boiler} filler {i}") for i in range(1, 5)]
            + [(10, core), (11, f"{boiler} {core}")],
            "doc_id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"]): r["overlap"]
            for r in winnow_overlap_pairs(
                df, min_overlap=0.8, max_hash_df=3
            ).collect()
        }
        assert (10, 11) in got, got

    def test_stop_fingerprint_cap(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            winnow_overlap_pairs,
        )

        # one boilerplate sentence shared by all docs + unique tails:
        # capping hash df at 2 removes the corpus-wide fingerprints, so
        # no pair survives
        boiler = "this exact shared boilerplate sentence repeats across docs"
        df = spark.createDataFrame(
            [(i, f"{boiler} unique tail {i} content {i}") for i in range(6)],
            "doc_id long, text string",
        )
        uncapped = winnow_overlap_pairs(df, min_overlap=0.3).count()
        capped = winnow_overlap_pairs(
            df, min_overlap=0.3, max_hash_df=2
        ).count()
        assert uncapped > 0 and capped == 0


class TestPreferCanon:
    def test_prefer_keeps_best_not_min_id(self, spark):
        from pyspark.sql import functions as F

        from sparksearchengine_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [
                (1, "same text", 10.0),
                (2, "same text", 99.0),  # best quality -> canon
                (3, "same text", 50.0),
                (4, "other", 1.0),
            ],
            "doc_id long, text string, quality double",
        )
        got = {
            r.doc_id: (r.canon_id, r.is_duplicate)
            for r in exact_dedup(
                df, ["text"], prefer=[F.col("quality").desc()]
            ).collect()
        }
        assert got[1] == (2, True) and got[2] == (2, False)
        assert got[3] == (2, True) and got[4] == (4, False)

    def test_prefer_tie_breaks_on_id(self, spark):
        from pyspark.sql import functions as F

        from sparksearchengine_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(9, "x", 1.0), (3, "x", 1.0)],
            "doc_id long, text string, quality double",
        )
        got = {
            r.doc_id: r.canon_id
            for r in exact_dedup(
                df, ["text"], prefer=[F.col("quality").desc()]
            ).collect()
        }
        assert got == {3: 3, 9: 3}

    def test_default_unchanged_min_id(self, spark):
        from sparksearchengine_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(5, "x"), (2, "x")], "doc_id long, text string"
        )
        got = {
            r.doc_id: r.canon_id
            for r in exact_dedup(df, ["text"]).collect()
        }
        assert got == {2: 2, 5: 2}


class TestEditDistanceJoin:
    def test_exact_vs_brute_force(self, spark):
        """Prefix-filtered result must equal all-pairs levenshtein."""
        from pyspark.sql import functions as F

        from sparksearchengine_spark.operators.dedup import (
            edit_distance_join,
        )

        names = [
            (1, "smith"), (2, "smyth"), (3, "smithe"), (4, "jones"),
            (5, "jonas"), (6, "ab"), (7, "cd"), (8, "abc"),
            (9, None), (10, "smith"),
        ]
        df = spark.createDataFrame(names, "doc_id long, name string")
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_join(
                df, "name", threshold=2, id_col="doc_id"
            ).collect()
        }
        a = df.select(F.col("doc_id").alias("ia"), F.col("name").alias("na"))
        b = df.select(F.col("doc_id").alias("ib"), F.col("name").alias("nb"))
        want = {
            (r.ia, r.ib, r.d)
            for r in a.crossJoin(b)
            .where(F.col("ia") < F.col("ib"))
            .withColumn("d", F.levenshtein("na", "nb"))
            .where(F.col("d") <= 2)
            .collect()
        }
        assert got == want
        assert (6, 7, 2) in got  # zero-shared-gram short-string pair

    def test_two_table_join(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            edit_distance_join,
        )

        a = spark.createDataFrame(
            [(1, "hello"), (2, "world")], "doc_id long, s string"
        )
        b = spark.createDataFrame(
            [(10, "helo"), (11, "word"), (12, "zzz")],
            "doc_id long, s string",
        )
        got = {
            (r.id_a, r.id_b)
            for r in edit_distance_join(
                a, "s", threshold=1, other=b
            ).collect()
        }
        assert got == {(1, 10), (2, 11)}

    def test_threshold_zero_is_exact_match(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            edit_distance_join,
        )

        df = spark.createDataFrame(
            [(1, "x y"), (2, "x y"), (3, "xy")], "doc_id long, s string"
        )
        got = {
            (r.id_a, r.id_b)
            for r in edit_distance_join(df, "s", threshold=0).collect()
        }
        assert got == {(1, 2)}

    def test_bad_args(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            edit_distance_join,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, s string")
        with pytest.raises(ValueError, match="threshold"):
            edit_distance_join(df, "s", threshold=-1)
        with pytest.raises(ValueError, match="q must"):
            edit_distance_join(df, "s", q=0)

    def test_no_nested_loop_join_in_plan(self, spark):
        """The short-string branches must compile to hash equi-joins on
        length bands — never BroadcastNestedLoopJoin / CartesianProduct
        (ADVICE r5: a raw non-equi |len diff| predicate is a
        |short|x|corpus| nested loop)."""
        from sparksearchengine_spark.operators.dedup import (
            edit_distance_join,
        )

        df = spark.createDataFrame(
            [(1, "ab"), (2, "cd"), (3, "smith"), (4, "smyth")],
            "doc_id long, s string",
        )
        plan = edit_distance_join(
            df, "s", threshold=2
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_cache_release(self, spark):
        from sparksearchengine_spark.operators import dedup as d

        df = spark.createDataFrame(
            [(1, "ab"), (2, "ac")], "doc_id long, s string"
        )
        before = len(d._edit_join_caches)
        res = d.edit_distance_join(df, "s", threshold=1)
        assert len(d._edit_join_caches) == before + 1
        res.collect()
        assert d._edit_join_caches[-1].is_cached
        d.release_edit_join_caches()
        assert not d._edit_join_caches


class TestTemperatureWeights:
    def test_alpha_one_is_natural_half_flattens(self, spark):
        import math

        from sparksearchengine_spark.operators.sampling import (
            temperature_weights,
        )

        df = spark.createDataFrame(
            [(i, "big" if i < 90 else "small", 10) for i in range(100)],
            "doc_id long, lang string, n_tokens long",
        )
        w1 = temperature_weights(df, "lang", "n_tokens", alpha=1.0)
        assert w1["big"] == pytest.approx(0.9)
        w5 = temperature_weights(df, "lang", "n_tokens", alpha=0.5)
        want_big = math.sqrt(900) / (math.sqrt(900) + math.sqrt(100))
        assert w5["big"] == pytest.approx(want_big)
        # smoothing strictly lifts the small group
        assert w5["small"] > w1["small"]
        assert sum(w5.values()) == pytest.approx(1.0)

    def test_zero_and_null_groups_dropped(self, spark):
        from sparksearchengine_spark.operators.sampling import (
            temperature_weights,
        )

        df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 0), (3, None, 5)],
            "doc_id long, lang string, n_tokens long",
        )
        w = temperature_weights(df, "lang", "n_tokens")
        assert set(w) == {"a"}

    def test_sampler_delegates(self, spark):
        from sparksearchengine_spark.operators.sampling import (
            mixture_sample,
            temperature_mixture_sample,
            temperature_weights,
        )

        df = spark.createDataFrame(
            [
                (i, "x" if i % 3 else "y", 5 + (i % 7))
                for i in range(60)
            ],
            "doc_id long, lang string, n_tokens long",
        )
        got = temperature_mixture_sample(
            df, "lang", 100, key_col="doc_id", token_col="n_tokens"
        ).collect()
        w = temperature_weights(df, "lang", "n_tokens")
        want = mixture_sample(
            df, "lang", w, 100, key_col="doc_id", token_col="n_tokens"
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_alpha_validation(self, spark):
        import pytest as _pytest

        from sparksearchengine_spark.operators.sampling import (
            temperature_weights,
        )

        df = spark.createDataFrame(
            [(1, "a", 10)], "doc_id long, lang string, n_tokens long"
        )
        for bad in (0.0, -1.0, 1.5):
            with _pytest.raises(ValueError, match="alpha"):
                temperature_weights(df, "lang", "n_tokens", alpha=bad)


class TestDedupParagraphs:
    """Cross-document paragraph dedup (dedup_paragraphs) — Dolma's
    paragraph-level step: first (doc, pos) occurrence of each exact
    paragraph survives, whitespace-only paragraphs exempt by default,
    NULL text passes through."""

    def _run(self, spark, rows, **kw):
        from sparksearchengine_spark.operators.dedup import (
            dedup_paragraphs,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup_paragraphs(df, **kw)
        return {r["doc_id"]: r for r in out.collect()}

    def test_cross_doc_first_occurrence_wins(self, spark):
        got = self._run(
            spark,
            [
                (1, "alpha\n\nshared para\n\nbeta"),
                (2, "shared para\n\ngamma"),
            ],
        )
        assert got[1]["text"] == "alpha\n\nshared para\n\nbeta"
        assert got[1]["n_paragraphs"] == 3 and got[1]["n_removed"] == 0
        assert got[2]["text"] == "gamma"
        assert got[2]["n_paragraphs"] == 2 and got[2]["n_removed"] == 1

    def test_within_doc_dup_keeps_first(self, spark):
        got = self._run(spark, [(1, "p1\n\np2\n\np1")])
        assert got[1]["text"] == "p1\n\np2"
        assert got[1]["n_paragraphs"] == 3 and got[1]["n_removed"] == 1

    def test_keep_blank_default_exempts_whitespace(self, spark):
        got = self._run(
            spark,
            [(1, "a\n\n \n\nb"), (2, "c\n\n \n\nd")],
        )
        # the whitespace paragraph survives in BOTH docs
        assert got[1]["text"] == "a\n\n \n\nb"
        assert got[2]["text"] == "c\n\n \n\nd"
        assert got[1]["n_removed"] == 0 and got[2]["n_removed"] == 0

    def test_keep_blank_false_dedups_whitespace(self, spark):
        got = self._run(
            spark,
            [(1, "a\n\n \n\nb"), (2, "c\n\n \n\nd")],
            keep_blank=False,
        )
        # exactly one doc keeps the whitespace paragraph (the min
        # (doc, pos) winner — doc 1)
        assert got[1]["text"] == "a\n\n \n\nb"
        assert got[2]["text"] == "c\n\nd"
        assert got[2]["n_removed"] == 1

    def test_null_text_passes_through(self, spark):
        got = self._run(spark, [(1, None), (2, "x\n\ny")])
        assert got[1]["text"] is None
        assert got[2]["text"] == "x\n\ny"

    def test_all_paragraphs_removed_yields_empty(self, spark):
        got = self._run(
            spark,
            [(1, "only para"), (2, "only para")],
            keep_blank=False,
        )
        assert got[1]["text"] == "only para"
        assert got[2]["text"] == ""
        assert got[2]["n_removed"] == 1

    def test_crlf_normalized_and_order_preserved(self, spark):
        got = self._run(spark, [(1, "a\r\n\r\nb\r\n\r\nc")])
        assert got[1]["text"] == "a\n\nb\n\nc"
        assert got[1]["n_paragraphs"] == 3

    def test_plan_no_corpus_window_or_nested_loop(self, spark):
        from sparksearchengine_spark.operators.dedup import (
            dedup_paragraphs,
        )

        df = spark.createDataFrame(
            [(1, "a\n\nb"), (2, "b\n\nc")], "doc_id long, text string"
        )
        out = dedup_paragraphs(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # winner selection is a hash agg + hash join on the md5 — no
        # window over the corpus, no nested loop, no broadcast of the
        # (unbounded) duplicate set required for correctness
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Window" not in plan


class TestDurableLshCorpus:
    """save_lsh_corpus / load_lsh_corpus (r12): a prepared corpus
    round-trips through Parquet so restarts never re-pay the
    whole-corpus signature pass."""

    def test_roundtrip_equals_fresh_prepare(self, spark, docs_df, tmp_path):
        from sparksearchengine_spark.operators.dedup import (
            _gram_arrays,
            _widen,
            load_lsh_corpus,
            lsh_join_prepared,
            prepare_lsh_corpus,
            save_lsh_corpus,
        )

        corpus_side = docs_df.where("doc_id >= 30")
        fresh_side = docs_df.where("doc_id < 30")
        prepared = prepare_lsh_corpus(corpus_side)
        save_lsh_corpus(prepared, str(tmp_path / "lshc"))
        loaded = load_lsh_corpus(spark, str(tmp_path / "lshc"))
        assert (loaded.n, loaded.num_hashes, loaded.bands,
                loaded.analyzer) == (
            prepared.n, prepared.num_hashes, prepared.bands,
            prepared.analyzer,
        )
        gl = _gram_arrays(_widen(fresh_side), "doc_id", "text", 3, "simple")
        gl = gl.persist()
        gl.count()
        try:
            want = sorted(
                map(tuple, lsh_join_prepared(gl, prepared, 0.8).collect())
            )
            got = sorted(
                map(tuple, lsh_join_prepared(gl, loaded, 0.8).collect())
            )
        finally:
            gl.unpersist()
        assert got == want and len(got) > 0
        prepared.unpersist()
        loaded.unpersist()

    def test_capped_corpus_roundtrips_over_keys(self, spark, tmp_path):
        import pytest as _pytest

        from sparksearchengine_spark.operators.dedup import (
            load_lsh_corpus,
            minhash_lsh_join,
            prepare_lsh_corpus,
            save_lsh_corpus,
        )
        from tests.test_lsh_bucket_cap import MEGA_TEXT, _mega_corpus

        corpus = _mega_corpus(spark, n_mega=50, n_unique=10)
        with _pytest.warns(RuntimeWarning):
            prepared = prepare_lsh_corpus(corpus, max_bucket_size=10)
        save_lsh_corpus(prepared, str(tmp_path / "capped"))
        loaded = load_lsh_corpus(spark, str(tmp_path / "capped"))
        assert loaded.over_keys is not None
        assert loaded.oversize == "star"
        # the loaded corpus behaves exactly like the live one: a fresh
        # near-dup meets ONE star representative (min id 0)
        fresh = spark.createDataFrame(
            [(7001, MEGA_TEXT)], "doc_id long, text string"
        )
        from sparksearchengine_spark.operators.dedup import (
            _gram_arrays,
            _widen,
            lsh_join_prepared,
        )

        gl = _gram_arrays(_widen(fresh), "doc_id", "text", 3, "simple")
        out = lsh_join_prepared(gl, loaded, 0.8).collect()
        assert [(r["id_l"], r["id_r"], r["jaccard"]) for r in out] == [
            (7001, 0, 1.0)
        ]
        prepared.unpersist()
        loaded.unpersist()
