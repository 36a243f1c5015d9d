"""Shared fixtures: one local SparkSession per test session, tiny corpora.

The reference has no automated tests (SURVEY §5); our strategy is unit
tests on hand-computed corpora + integration tests against the driver's
read-only sf0.001 parquet tables.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # Bound the explain strings AQE regenerates on every plan
        # update: deeply-nested persisted lineage (each cached frame
        # re-prints its full cached plan at every reference) makes
        # plan-STRING generation multiplicative, and an uncapped string
        # can eat minutes of driver CPU — or the whole 4g heap — on a
        # long pipeline (observed r12: pretraining example OOM'd in
        # StringConcat.toString). 1 MB keeps real diagnostics intact.
        .config("spark.sql.maxPlanStringLength", str(1 << 20))
        .appName("sparksearchengine-tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """3-doc corpus with hand-computable statistics.

    tokenized (simple analyzer):
      doc 1: [a, b, a]        dl=3
      doc 2: [a, c]           dl=2
      doc 3: [b, b, c, c]     dl=4
    N=3, avgdl=3.0; df: a=2, b=2, c=2.
    """
    return spark.createDataFrame(
        [
            (1, "A b a!", 10, None),
            (2, "a C", 20, "x"),
            (3, "b b; c c", 30, "y"),
        ],
        "doc_id long, text string, views int, tag string",
    )


@pytest.fixture(scope="session")
def tiny_index(tiny_corpus):
    from sparksearchengine_spark import Corpus, TextOptions

    return Corpus(
        tiny_corpus,
        id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="simple", positions=True)},
    ).build_index()


@pytest.fixture(scope="session")
def docs_df(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def docs_index(docs_df):
    from sparksearchengine_spark import Corpus, TextOptions

    return Corpus(
        docs_df,
        id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="simple", positions=True)},
    ).build_index()
