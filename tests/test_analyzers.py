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
