"""Analyzer unit tests: SQL-expression and Python tokenizers must agree
(index-time vs query-time analysis parity, reference keeps both sides
configurable — `LuceneConfig.scala:20-52`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearchengine_spark.functions.analyzers import (
    _porter_stem,
    analyzer_expr,
    get_analyzer,
    register_analyzer,
    tokenize_py,
)

CASES = [
    "Hello, World! 42 times",
    "  leading & trailing  ",
    "UPPER lower MiXeD",
    "",
    "no-split_chars 0a1b",
    "punct...only!!!",
    "unicode caffè naïve",
]


@pytest.mark.parametrize("text", CASES)
def test_simple_sql_py_parity(spark, text):
    py = tokenize_py(text, "simple")
    row = spark.range(1).select(
        analyzer_expr(F.lit(text), "simple").alias("t")
    ).first()
    assert row["t"] == py


def test_simple_tokenizer_semantics():
    assert tokenize_py("Hello, World!", "simple") == ["hello", "world"]
    assert tokenize_py("a1 B2-c3", "simple") == ["a1", "b2", "c3"]
    assert tokenize_py(None, "simple") == []
    assert tokenize_py("", "simple") == []


def test_whitespace_tokenizer():
    assert tokenize_py("Hello,  World! ", "whitespace") == ["Hello,", "World!"]


@pytest.mark.parametrize(
    "word,stem",
    [
        ("caresses", "caress"),
        ("ponies", "poni"),
        ("cats", "cat"),
        ("feed", "feed"),
        ("agreed", "agre"),
        ("plastered", "plaster"),
        ("motoring", "motor"),
        ("sing", "sing"),
        ("conflated", "conflat"),
        ("hopping", "hop"),
        ("happy", "happi"),
        ("relational", "relat"),
        ("conditional", "condit"),
        ("rational", "ration"),
        ("probate", "probat"),
        ("cease", "ceas"),
        ("controll", "control"),
    ],
)
def test_porter_stemmer(word, stem):
    assert _porter_stem(word) == stem


def test_english_analyzer_stops_and_stems():
    toks = tokenize_py("The cats are running in the gardens", "english")
    assert "the" not in toks and "in" not in toks and "are" not in toks
    assert "cat" in toks and "run" in toks


def test_english_udf_matches_py(spark):
    text = "The cats are running in the gardens"
    py = tokenize_py(text, "english")
    row = spark.range(1).select(
        analyzer_expr(F.lit(text), "english").alias("t")
    ).first()
    assert row["t"] == py


def test_register_custom_analyzer(spark):
    register_analyzer("upper2", lambda s: s.upper().split() if s else [])
    assert tokenize_py("a b", "upper2") == ["A", "B"]
    row = spark.range(1).select(
        analyzer_expr(F.lit("a b"), "upper2").alias("t")
    ).first()
    assert row["t"] == ["A", "B"]


def test_unknown_analyzer_raises():
    with pytest.raises(ValueError, match="unknown analyzer"):
        get_analyzer("nope")


def test_bpe_pretoken_count(spark):
    from sparksearchengine_spark.operators.textstats import bpe_token_count_expr

    df = spark.createDataFrame(
        [
            (0, "Hello, world's 3 dogs  ran"),
            (1, ""),
            (2, None),
            (3, "don't"),
        ],
        "id long, t string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", bpe_token_count_expr(F.col("t")).alias("n")).collect()
    }
    # "Hello" "," " world" "'s" " 3" " dogs" "  " "ran" -> 8
    assert got[0] == 8
    assert got[1] == 0
    assert got[2] == 0
    # "don" "'t" -> 2
    assert got[3] == 2


class TestRepetitionMetrics:
    """Gopher-style repetition signals (operators/textstats.py)."""

    def _run(self, spark, rows):
        from sparksearchengine_spark.operators.textstats import (
            repetition_metrics,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: r.asDict()
            for r in repetition_metrics(df).collect()
        }

    def test_top_ngram_char_frac(self, spark):
        m = self._run(spark, [(1, "spam spam spam spam"), (2, "a b c d e")])
        # bigrams of doc1: ['spam spam'] x3 -> 3 * 9 / 19
        assert m[1]["top_2gram_char_frac"] == round(27 / 19, 6)
        # doc2: every bigram unique -> cnt 1; tie -> lexicographically
        # smallest gram 'a b' (len 3): 3/9
        assert m[2]["top_2gram_char_frac"] == round(3 / 9, 6)

    def test_dup_5gram_char_frac(self, spark):
        # 'x y' x5: 5-grams = 6 total, sorted runs: 'x y x y x' x3,
        # 'y x y x y' x3 -> all duplicated -> 1.0
        m = self._run(spark, [(3, "x y x y x y x y x y"), (4, "a b c d e f")])
        assert m[3]["dup_5gram_char_frac"] == 1.0
        assert m[4]["dup_5gram_char_frac"] == 0.0

    def test_dup_lines(self, spark):
        m = self._run(spark, [(5, "line one\nline one\nline two"), (6, "x")])
        assert m[5]["n_lines"] == 3
        assert m[5]["frac_dup_lines"] == round(1 - 2 / 3, 6)
        assert m[6]["n_lines"] == 1 and m[6]["frac_dup_lines"] == 0.0

    def test_null_and_empty(self, spark):
        m = self._run(spark, [(7, None), (8, ""), (9, "one two")])
        for d in (7, 8):
            assert m[d]["top_2gram_char_frac"] == 0.0
            assert m[d]["dup_5gram_char_frac"] == 0.0
            assert m[d]["n_lines"] == 0
        # fewer tokens than n -> no grams -> 0, not NULL
        assert m[9]["top_3gram_char_frac"] == 0.0


class TestPiiScrub:
    def _scrub(self, spark, rows):
        from sparksearchengine_spark.operators.textstats import pii_scrub

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}

    def test_masks_and_counts(self, spark):
        m = self._scrub(spark, [
            (1, "mail jo.doe+x@example.co.uk or +1 (555) 123-4567"),
            (2, "server 10.0.0.1 ssn 123-45-6789"),
        ])
        assert m[1]["text_scrubbed"] == "mail <EMAIL> or <PHONE>"
        assert m[1]["n_email"] == 1 and m[1]["n_phone"] == 1
        assert m[2]["text_scrubbed"] == "server <IP> ssn <SSN>"
        assert m[2]["n_ip"] == 1 and m[2]["n_ssn"] == 1

    def test_bare_ten_digit_phones_masked(self, spark):
        """r3 review: the country code must be OPTIONAL — the common US
        shapes carry none and were silently leaking through."""
        m = self._scrub(spark, [
            (10, "call 555-123-4567 now"),
            (11, "or (555) 123-4567 works"),
            (12, "intl +44 555 123 4567"),
        ])
        for i in (10, 11, 12):
            assert m[i]["n_phone"] == 1, m[i]
            assert "<PHONE>" in m[i]["text_scrubbed"]
            assert "4567" not in m[i]["text_scrubbed"]

    def test_clean_text_untouched(self, spark):
        m = self._scrub(spark, [(3, "no pii here 123"), (4, None), (5, "")])
        assert m[3]["text_scrubbed"] == "no pii here 123"
        assert all(m[3][f"n_{c}"] == 0 for c in ("email", "ssn", "ip", "phone"))
        assert m[4]["text_scrubbed"] == "" and m[5]["text_scrubbed"] == ""

    def test_multiple_occurrences(self, spark):
        m = self._scrub(spark, [(6, "a@b.co c@d.org and 1.2.3.4 5.6.7.8")])
        assert m[6]["n_email"] == 2 and m[6]["n_ip"] == 2
        assert m[6]["text_scrubbed"] == "<EMAIL> <EMAIL> and <IP> <IP>"


class TestFoldingAnalyzer:
    def test_diacritics_folded_sql_path(self, spark):
        from sparksearchengine_spark.functions.analyzers import analyzer_expr

        df = spark.createDataFrame(
            [("Café crème, naïve piñata — ÀÉÎÕÜ!",)], "text string"
        )
        out = df.select(analyzer_expr(F.col("text"), "folding").alias("t"))
        assert out.collect()[0]["t"] == [
            "cafe", "creme", "naive", "pinata", "aeiou"
        ]

    def test_py_and_sql_paths_agree(self, spark):
        from sparksearchengine_spark.functions.analyzers import (
            analyzer_expr, tokenize_py,
        )

        samples = [
            "Señor Müller's Žižek œuvre ß",  # ß/œ unmapped -> separators
            "çirçé Ågård ťest",
            "plain ascii stays identical 123",
        ]
        df = spark.createDataFrame([(s,) for s in samples], "text string")
        got = [
            r["t"]
            for r in df.select(
                analyzer_expr(F.col("text"), "folding").alias("t")
            ).collect()
        ]
        want = [tokenize_py(s, "folding") for s in samples]
        assert got == want

    def test_ascii_equals_simple(self, spark):
        from sparksearchengine_spark.functions.analyzers import tokenize_py

        s = "The quick brown fox 42!"
        assert tokenize_py(s, "folding") == tokenize_py(s, "simple")

    def test_fold_map_lengths_match(self):
        from sparksearchengine_spark.functions.analyzers import (
            FOLD_FROM, FOLD_TO,
        )

        assert len(FOLD_FROM) == len(FOLD_TO)


class TestCjkBigramAnalyzer:
    def test_bigrams_over_cjk_runs(self):
        from sparksearchengine_spark.functions.analyzers import tokenize_py

        assert tokenize_py("中文搜索 engine", "cjk_bigram") == [
            "中文", "文搜", "搜索", "engine",
        ]
        # runs split at non-CJK boundaries; lone char stays a unigram
        assert tokenize_py("中, 文", "cjk_bigram") == ["中", "文"]
        assert tokenize_py("한국어 텍스트 123", "cjk_bigram") == [
            "한국", "국어", "텍스", "스트", "123",
        ]
        assert tokenize_py(None, "cjk_bigram") == []

    def test_latin_matches_simple(self):
        from sparksearchengine_spark.functions.analyzers import tokenize_py

        s = "The quick brown fox 42!"
        assert tokenize_py(s, "cjk_bigram") == tokenize_py(s, "simple")

    def test_py_and_udf_paths_agree(self, spark):
        from sparksearchengine_spark.functions.analyzers import (
            analyzer_expr, tokenize_py,
        )

        samples = ["中文搜索引擎", "日本語テキスト mixed 中 text", "ascii only"]
        df = spark.createDataFrame([(s,) for s in samples], "text string")
        got = [
            r["t"]
            for r in df.select(
                analyzer_expr(F.col("text"), "cjk_bigram").alias("t")
            ).collect()
        ]
        assert got == [tokenize_py(s, "cjk_bigram") for s in samples]

    def test_end_to_end_search_and_phrase(self, spark):
        """Index unspaced zh text and run term + phrase queries — the
        'simple' analyzer can't tokenize this corpus at all (no
        separators); bigram positions make phrase adjacency work."""
        from sparksearchengine_spark import Corpus, Q, TextOptions

        df = spark.createDataFrame(
            [
                (1, "中文搜索引擎测试"),
                (2, "搜索中文"),
                (3, "完全无关的内容"),
            ],
            "doc_id long, text string",
        )
        idx = Corpus(
            df, id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="cjk_bigram", positions=True)},
        ).build_index()
        hits = {r["doc_id"] for r in idx.search(Q.field("text").match_term("搜索"), k=10).collect()}
        assert hits == {1, 2}
        # phrase "中文搜索" = adjacent bigrams 中文,文搜,搜索 — doc 1 only
        # (doc 2 has 搜索 then 中文, reversed order)
        ph = {r["doc_id"] for r in idx.search(Q.field("text").match_phrase("中文搜索"), k=10).collect()}
        assert ph == {1}


class TestWhitespaceUnicodeParity:
    def test_nbsp_treated_identically_by_py_and_sql(self, spark):
        """Java regex \\s (what F.split compiles) is ASCII-only; the
        Python tokenizer must agree, or index-time and query-time tokens
        diverge on scraped-HTML whitespace (r3 review)."""
        from sparksearchengine_spark.functions.analyzers import (
            analyzer_expr, tokenize_py,
        )

        samples = ["foo bar", "a　b", "x \t y\nz", "thin space"]
        df = spark.createDataFrame([(s,) for s in samples], "text string")
        got = [
            r["t"]
            for r in df.select(
                analyzer_expr(F.col("text"), "whitespace").alias("t")
            ).collect()
        ]
        assert got == [tokenize_py(s, "whitespace") for s in samples]


class TestQueryTimeAnalyzer:
    """Independent index-time / query-time analyzers (the reference's
    LuceneConfig index/query analyzer pair, `impl/LuceneConfig.scala:
    110-123` consumed at `impl/LuceneIndex.scala:28-29,115-116`)."""

    @pytest.fixture(scope="class")
    def stem_corpus(self, spark):
        return spark.createDataFrame(
            [(1, "running shoes"), (2, "run fast"), (3, "walking stick")],
            "doc_id long, text string",
        )

    def test_asymmetric_changes_matches(self, stem_corpus):
        from sparksearchengine_spark import Corpus, Q, TextOptions

        # index-time english stems running->run / walking->walk;
        # query-time simple leaves the query's surface form intact
        asym = Corpus(
            stem_corpus, id_col="doc_id",
            text_cols={"text": TextOptions(
                analyzer="english", query_analyzer="simple",
            )},
        ).build_index()
        sym = Corpus(
            stem_corpus, id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="english")},
        ).build_index()

        q = Q.field("text").match_text("running")
        # symmetric: "running" stems to "run" -> matches docs 1 and 2
        assert {r["doc_id"] for r in sym.search(q, k=10).collect()} == {1, 2}
        # asymmetric: query keeps "running", which no postings token has
        assert asym.search(q, k=10).count() == 0
        # the stemmed surface form still matches both docs
        q2 = Q.field("text").match_text("run")
        assert {
            r["doc_id"] for r in asym.search(q2, k=10).collect()
        } == {1, 2}

    def test_default_is_symmetric(self):
        from sparksearchengine_spark import TextOptions

        assert TextOptions(analyzer="english").query_time_analyzer() == "english"
        assert TextOptions(
            analyzer="english", query_analyzer="simple"
        ).query_time_analyzer() == "simple"

    def test_survives_save_load(self, stem_corpus, tmp_path):
        from sparksearchengine_spark import Corpus, Q, TextOptions
        from sparksearchengine_spark.operators.index import SearchIndex

        idx = Corpus(
            stem_corpus, id_col="doc_id",
            text_cols={"text": TextOptions(
                analyzer="english", query_analyzer="simple",
            )},
        ).build_index()
        path = str(tmp_path / "qta_index")
        idx.save(path)
        loaded = SearchIndex.load(
            stem_corpus.sparkSession, path, corpus_df=stem_corpus
        )
        opts = loaded.corpus.text_cols["text"]
        assert opts.query_analyzer == "simple"
        assert loaded.search(
            Q.field("text").match_text("running"), k=10
        ).count() == 0


class TestAnalyzerTotality:
    """tokenize_py over arbitrary unicode must return a list of
    non-empty strings for every shipped analyzer — never raise."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=60))
    def test_total_over_unicode(self, s):
        from sparksearchengine_spark.functions.analyzers import tokenize_py

        for analyzer in ("simple", "whitespace", "english", "italian",
                         "folding", "cjk_bigram"):
            toks = tokenize_py(s, analyzer)
            assert isinstance(toks, list)
            assert all(isinstance(t, str) and t for t in toks)
