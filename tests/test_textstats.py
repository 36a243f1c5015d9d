

class TestStripHtml:
    def _one(self, spark, html):
        from sparksearchengine_spark.operators.textstats import strip_html

        df = spark.createDataFrame([(1, html)], "doc_id long, text string")
        return strip_html(df).collect()[0]["text"]

    def test_scripts_and_styles_removed_with_content(self, spark):
        got = self._one(
            spark,
            "<script>var hidden = 'secret';</script>before"
            "<style>.x{display:none}</style>after",
        )
        assert got == "before after"
        assert "secret" not in got

    def test_block_tags_preserve_paragraphs(self, spark):
        got = self._one(
            spark, "<p>first para</p><p>second para</p><br>third"
        )
        # adjacent close+open tags form a blank-line paragraph break
        assert got == "first para\n\nsecond para\n\nthird"

    def test_entities_decoded(self, spark):
        got = self._one(
            spark, "a&nbsp;b &amp; c &lt;d&gt; &quot;e&quot; f&#39;s"
        )
        assert got == 'a b & c <d> "e" f\'s'

    def test_comments_and_inline_tags_dropped(self, spark):
        got = self._one(
            spark,
            "keep <!-- multi\nline comment --><a href='x'>link</a> "
            "<em>emphasis</em> end",
        )
        assert got == "keep link emphasis end"

    def test_escaped_html_single_decodes(self, spark):
        # '&amp;lt;' is escaped markup shown as code — one decode step,
        # never two (&amp; decodes LAST)
        got = self._one(spark, "code: &amp;lt;script&amp;gt; end")
        assert got == "code: &lt;script&gt; end"

    def test_non_block_tags_do_not_break_paragraphs(self, spark):
        # <pre>/<link>/<path> share prefixes with block-tag names but
        # must become spaces, not newlines
        got = self._one(
            spark,
            'a <pre>x</pre> b <link rel="stylesheet"> c <path d="M0"/> d',
        )
        assert "\n" not in got
        assert got == "a x b c d"

    def test_null_and_plain_text_pass_through(self, spark):
        from sparksearchengine_spark.operators.textstats import strip_html

        df = spark.createDataFrame(
            [(1, None), (2, "no markup at all")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["text"] for r in strip_html(df).collect()}
        assert got == {1: None, 2: "no markup at all"}


class TestGopherRules:
    def test_signals_on_handmade_docs(self, spark):
        from sparksearchengine_spark.operators.textstats import gopher_rules

        df = spark.createDataFrame(
            [
                # 4 words, mean len (3+2+5+4)/4 = 3.5, has 'the'/'with'
                (1, "the be doggo with"),
                # bullet-heavy
                (2, "- one\n- two\nplain line"),
                # ellipsis + symbols
                (3, "trails off...\nnormal\nhash # tag #"),
                (4, None),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
        assert got[1]["n_words"] == 4
        assert got[1]["mean_word_len"] == 3.5
        assert got[1]["required_word_hits"] == 3  # the, be, with
        assert not got[1]["gopher_pass"]  # < 50 words
        assert got[2]["bullet_line_frac"] == round(2 / 3, 6)
        assert got[3]["ellipsis_line_frac"] == round(1 / 3, 6)
        # '...' counts once, '#' twice -> 3 symbols over 7 words
        assert got[3]["symbol_word_ratio"] == round(3 / 7, 6)
        assert got[4]["n_words"] == 0
        assert got[4]["mean_word_len"] == 0.0
        assert not got[4]["gopher_pass"]

    def test_pass_on_clean_prose(self, spark):
        from sparksearchengine_spark.operators.textstats import gopher_rules

        text = " ".join(
            ["the data moves fast and systems have to keep pace with load"]
            * 6
        )
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        row = gopher_rules(df).collect()[0]
        assert row["n_words"] == 72
        assert row["gopher_pass"]

    def test_alpha_word_fraction(self, spark):
        from sparksearchengine_spark.operators.textstats import gopher_rules

        df = spark.createDataFrame(
            [(1, "abc 123 456 789 x9")], "doc_id long, text string"
        )
        row = gopher_rules(df).collect()[0]
        assert row["alpha_word_frac"] == round(2 / 5, 6)

    def test_crlf_equals_lf(self, spark):
        # CRLF must not add '\r' filler lines that dilute the line
        # fractions — identical signals for both encodings
        from sparksearchengine_spark.operators.textstats import gopher_rules

        lf = "- one\n- two\nplain line\n\ntrails off..."
        df = spark.createDataFrame(
            [(1, lf), (2, lf.replace("\n", "\r\n"))],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
        a, b = rows[1], rows[2]
        for k in ("bullet_line_frac", "ellipsis_line_frac", "n_words"):
            assert a[k] == b[k], k


class TestC4Filters:
    def test_line_rules(self, spark):
        from sparksearchengine_spark.operators.textstats import c4_filters

        df = spark.createDataFrame(
            [
                (1, "This sentence survives the filter.\n"
                    "no terminal punctuation here\n"
                    "Too short.\n"
                    "Please enable JavaScript to proceed.\n"
                    'He said "stop right there."'),
            ],
            "doc_id long, text string",
        )
        row = c4_filters(df).collect()[0]
        assert row["text"] == (
            'This sentence survives the filter.\nHe said "stop right there."'
        )
        assert row["n_lines_kept"] == 2
        assert row["n_lines_dropped"] == 3

    def test_crlf_equals_lf(self, spark):
        # a CRLF doc's lines end in '\r' after an LF-only split, failing
        # the terminal-punct rule for every line — the \r?\n split must
        # make both encodings behave identically (modulo the rebuilt
        # text being LF-normalized)
        from sparksearchengine_spark.operators.textstats import c4_filters

        lf = ("This sentence survives the filter.\n"
              "no terminal punctuation here\n"
              'He said "stop right there."')
        df = spark.createDataFrame(
            [(1, lf), (2, lf.replace("\n", "\r\n"))],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r.asDict() for r in c4_filters(df).collect()}
        assert rows[2]["text"] == rows[1]["text"]
        assert rows[2]["n_lines_kept"] == rows[1]["n_lines_kept"] == 2

    def test_page_rules(self, spark):
        from sparksearchengine_spark.operators.textstats import c4_filters

        five = ("One good sentence here. Two good sentences now. "
                "Three in a row! Four keeps going? Five closes it out.")
        df = spark.createDataFrame(
            [
                (1, five),
                (2, five + "\nlorem ipsum dolor sit amet."),
                (3, five + "\nvar x = { a: 1 };"),
                (4, "Only one sentence lives here."),
                (5, None),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r.asDict() for r in c4_filters(df).collect()}
        assert got[1]["c4_keep"]
        assert got[1]["n_sentences"] == 5
        assert not got[2]["c4_keep"]  # lorem ipsum page flag
        assert not got[3]["c4_keep"]  # curly brace page flag
        assert not got[4]["c4_keep"]  # < 5 sentences
        assert got[4]["n_sentences"] == 1
        assert got[5]["text"] is None
        assert not got[5]["c4_keep"]
        assert got[5]["n_lines_kept"] == 0

    def test_extra_columns_pass_through(self, spark):
        from sparksearchengine_spark.operators.textstats import c4_filters

        df = spark.createDataFrame(
            [(1, "Keep this one sentence.", "en")],
            "doc_id long, text string, lang string",
        )
        row = c4_filters(df).collect()[0]
        assert row["lang"] == "en"
        assert row["text"] == "Keep this one sentence."


class TestScanStagePlans:
    """The scan-stage claims (zero shuffles) of the rule-set operators,
    asserted on the physical plan, not just believed."""

    def _plan(self, df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_gopher_rules_no_exchange(self, spark):
        from sparksearchengine_spark.operators.textstats import gopher_rules

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        assert "Exchange" not in self._plan(gopher_rules(docs))

    def test_c4_filters_no_exchange(self, spark):
        from sparksearchengine_spark.operators.textstats import c4_filters

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        assert "Exchange" not in self._plan(c4_filters(docs))

    def test_boilerplate_no_nested_loop(self, spark):
        # shuffles are inherent (df agg + reassembly) but there must be
        # no cartesian/broadcast-nested-loop anywhere in the plan
        from sparksearchengine_spark.operators.dedup import (
            remove_boilerplate_lines,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = self._plan(remove_boilerplate_lines(docs))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestReadability:
    def test_hand_computed(self, spark):
        from sparksearchengine_spark.operators.textstats import readability

        # "the cat sat. it ran!" -> 2 sentences, 5 words,
        # syllables: the=1, cat=1, sat=1, it=1, ran=1 -> 5
        df = spark.createDataFrame(
            [(1, "the cat sat. it ran!")], "doc_id long, text string"
        )
        r = readability(df).collect()[0]
        assert (r.n_sents, r.n_words, r.n_syllables) == (2, 5, 5)
        assert r.words_per_sent == 2.5
        assert r.syll_per_word == 1.0
        assert r.flesch == round(206.835 - 1.015 * 2.5 - 84.6 * 1.0, 6)
        assert r.fk_grade == round(0.39 * 2.5 + 11.8 * 1.0 - 15.59, 6)

    def test_vowel_groups_and_clamp(self, spark):
        from sparksearchengine_spark.operators.textstats import readability

        # "beautiful" -> eau+i+u = 3 groups; "rhythm" has y -> 1;
        # "xyz" -> y -> 1; "grr" -> 0 groups clamped to 1
        df = spark.createDataFrame(
            [(1, "beautiful rhythm xyz grr")], "doc_id long, text string"
        )
        r = readability(df).collect()[0]
        assert r.n_syllables == 3 + 1 + 1 + 1

    def test_empty_and_null_text(self, spark):
        from sparksearchengine_spark.operators.textstats import readability

        df = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in readability(df).collect()}
        for r in rows.values():
            assert r.n_words == 0 and r.n_sents == 1
            assert r.flesch is None and r.fk_grade is None

    def test_no_punctuation_is_one_sentence(self, spark):
        from sparksearchengine_spark.operators.textstats import readability

        df = spark.createDataFrame(
            [(1, "no terminal punctuation here")],
            "doc_id long, text string",
        )
        assert readability(df).collect()[0].n_sents == 1


class TestTokenEntropy:
    def test_hand_computed(self, spark):
        import math

        import pytest

        from sparksearchengine_spark.operators.textstats import (
            token_entropy,
        )

        df = spark.createDataFrame(
            [
                (1, "a a a a"),            # one type: entropy 0
                (2, "a b a b"),            # uniform 2 types: ln 2
                (3, "a a a b"),            # skewed: -(3/4)ln(3/4)-(1/4)ln(1/4)
                (4, ""),                   # empty: all zeros
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in token_entropy(df).collect()}
        assert rows[1]["entropy"] == pytest.approx(0.0)
        assert rows[1]["norm_entropy"] == 0.0
        assert rows[2]["entropy"] == pytest.approx(math.log(2))
        assert rows[2]["norm_entropy"] == pytest.approx(1.0)
        want3 = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        assert rows[3]["entropy"] == pytest.approx(want3)
        assert rows[3]["ttr"] == pytest.approx(0.5)
        assert rows[4]["n_tokens"] == 0
        assert rows[4]["entropy"] == 0.0
        assert rows[4]["ttr"] == 0.0

    def test_row_count_and_bounds(self, spark):
        import math

        from sparksearchengine_spark.operators.textstats import (
            token_entropy,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        out = token_entropy(docs).collect()
        assert len(out) == docs.count()
        for r in out:
            assert 0.0 <= r["norm_entropy"] <= 1.0 + 1e-12
            if r["n_types"] > 1:
                assert r["entropy"] <= math.log(r["n_types"]) + 1e-9


class TestDedupLines:
    def test_first_occurrence_kept_in_order(self, spark):
        from sparksearchengine_spark.operators.textstats import dedup_lines

        df = spark.createDataFrame(
            [
                (1, "b\na\nb\nc\na"),
                (2, "x\r\nx\r\ny"),   # CRLF split
                (3, None),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in dedup_lines(df).collect()}
        assert rows[1]["text"] == "b\na\nc"
        assert rows[1]["n_dup_lines"] == 2
        assert rows[2]["text"] == "x\ny"
        assert rows[2]["n_dup_lines"] == 1
        assert rows[3]["text"] is None
        assert rows[3]["n_dup_lines"] == 0
        assert rows[4]["text"] == ""
        assert rows[4]["n_dup_lines"] == 0

    def test_no_shuffle_plan(self, spark):
        from sparksearchengine_spark.operators.textstats import dedup_lines

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        plan = (
            dedup_lines(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestCompressionRatio:
    def test_orders_repetitive_below_prose_below_random(self, spark):
        from sparksearchengine_spark.operators.textstats import (
            compression_ratio,
        )

        import random

        rng = random.Random(7)
        rand = "".join(
            chr(rng.randrange(0x21, 0x7E)) for _ in range(2000)
        )
        df = spark.createDataFrame(
            [
                (1, "spam " * 400),
                (2, ("the quick brown fox jumps over the lazy dog and "
                     "keeps running through fields of data ") * 25),
                (3, rand),
                (4, None),
                (5, ""),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r for r in compression_ratio(df).collect()
        }
        assert rows[1]["compress_ratio"] < rows[2]["compress_ratio"]
        assert rows[2]["compress_ratio"] < rows[3]["compress_ratio"]
        assert rows[1]["compress_ratio"] < 0.05  # pure repetition
        assert rows[3]["compress_ratio"] > 0.7   # near-random
        assert rows[4]["compress_ratio"] is None
        assert rows[5]["compress_ratio"] == 1.0
        assert rows[2]["n_bytes"] == len(
            ("the quick brown fox jumps over the lazy dog and "
             "keeps running through fields of data ") * 25
        )

    def test_level_validation(self, spark):
        import pytest

        from sparksearchengine_spark.operators.textstats import (
            compression_ratio,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="zlib level"):
            compression_ratio(df, level=11)


class TestDictionaryTag:
    def test_tags_and_counts(self, spark):
        from sparksearchengine_spark.operators.textstats import (
            dictionary_tag,
        )

        df = spark.createDataFrame(
            [
                (1, "New York is big. I love new york!"),
                (2, "york alone, and newer yorkshire"),
                (3, "apple pie and apple"),
            ],
            "doc_id long, text string",
        )
        out = dictionary_tag(
            df, {"new york": "city", "apple": "fruit"}
        ).collect()
        got = {(r["doc_id"], r["tag"]): r["n_hits"] for r in out}
        # token-exact: 'yorkshire' and bare 'york' never fire 'new york'
        assert got == {(1, "city"): 2, (3, "fruit"): 2}
        phrases = {r["phrase"] for r in out}
        assert phrases == {"new york", "apple"}

    def test_overlapping_occurrences_count(self, spark):
        from sparksearchengine_spark.operators.textstats import (
            dictionary_tag,
        )

        df = spark.createDataFrame(
            [(1, "a a a")], "doc_id long, text string"
        )
        out = dictionary_tag(df, ["a a"]).collect()
        assert out[0]["n_hits"] == 2  # sliding windows overlap

    def test_validation(self, spark):
        import pytest

        from sparksearchengine_spark.operators.textstats import (
            dictionary_tag,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="empty"):
            dictionary_tag(df, [])
        with pytest.raises(ValueError, match="zero tokens"):
            dictionary_tag(df, ["!!!"])

    def test_short_docs_never_whole_doc_match(self, spark):
        from sparksearchengine_spark.operators.textstats import (
            dictionary_tag,
        )

        df = spark.createDataFrame(
            [(1, "new york")], "doc_id long, text string"
        )
        # a 3-token phrase cannot match a 2-token doc
        assert (
            dictionary_tag(df, ["new york city"]).count() == 0
        )
