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
        # 8g (was 4g): in local mode the ONE driver JVM also hosts
        # every cached/persisted/localCheckpoint block of the whole
        # 1000+-test session plus the status-store listener state, and
        # jstat on a full-suite run showed the heap pinned at the 4g
        # ceiling with old-gen at 86-100% from mid-suite on. Under that
        # pressure GC latency spikes made executor heartbeats fail 60
        # consecutive times (~10 min), the executor self-exited, the
        # context died, and the in-flight test failed with a
        # SparkPlan.session()==null INTERNAL_ERROR (getActiveSession
        # filters stopped sessions) — observed twice on r12's
        # re-verification epoch, always in the heaviest example test.
        # The 4g canary role (catching plan-string blowups) is now
        # covered explicitly by maxPlanStringLength below and the
        # capture_cc_plans plan-size tests.
        .config("spark.driver.memory", "8g")
        # Bound status-store accumulation across the ~15k stages a full
        # suite runs (the listener tracks them even with the UI off;
        # defaults retain 1000 jobs/stages + 100k tasks + 1000 SQL
        # executions with full plan graphs). Progress bars and
        # statusTracker only ever need the recent tail.
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "2000")
        .config("spark.sql.ui.retainedExecutions", "50")
        # Bound the explain strings AQE regenerates on every plan
        # update: deeply-nested persisted lineage (each cached frame
        # re-prints its full cached plan at every reference) makes
        # plan-STRING generation multiplicative, and an uncapped string
        # can eat minutes of driver CPU — or the whole 4g heap — on a
        # long pipeline (observed r12: pretraining example OOM'd in
        # StringConcat.toString). 1 MB keeps real diagnostics intact.
        .config("spark.sql.maxPlanStringLength", str(1 << 20))
        # Bound RPC endpoint lookups (default 120s). In local mode the
        # "CoarseGrainedScheduler" endpoint NEVER exists, yet a block-
        # removal failure makes BlockManagerMasterEndpoint try to look
        # it up (handleBlockRemovalFailure's executor-liveness check) —
        # each attempt holds a block-manager ask thread for the full
        # lookup timeout, and a removal-failure burst can starve the
        # pool long enough that executor heartbeats fail 60 times and
        # the executor self-exits, killing the context mid-suite
        # (observed r12: a 38-min full-suite run died exactly this way;
        # the lookup can never succeed locally, so failing fast loses
        # nothing). Test-session hardening only — not a perf knob.
        .config("spark.rpc.lookupTimeout", "10s")
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
