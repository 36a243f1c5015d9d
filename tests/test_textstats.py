

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
