"""The 100-TB serving recipe: durable bucketed index + standing-query
registry percolated with a one-time-normalized registry.

Stage by stage, each choice the scale-shaped one:

1. build + save   — ``save(path, term_buckets=n, doc_buckets=m)``:
                    postings partitioned by ``crc32(term) % n`` (term
                    queries scan 1/n of the layout), corpus co-written
                    partitioned by doc bucket (point lookups prune).
2. load           — the serving session opens the layout; nothing is
                    re-tokenized.
3. prepare        — ``prepare_dsl_queries`` normalizes the standing
                    registry ONCE (one pandas-UDF pass) and persists it.
4. percolate      — each incoming document batch is matched against the
                    registry via ``percolate_dsl_df(..., prepared=...)``;
                    the normalization never re-runs, and on the bucketed
                    layout the terms/phrase tiers prune the postings scan
                    to the buckets the registry touches (dynamic
                    partition pruning — visible in the plan).
5. point lookups  — ``get_elements`` serves alert payloads from the
                    doc-bucketed corpus partitions.

Run: ``python examples/durable_registry_example.py [parquet] [outdir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sparksearchengine_spark import Corpus, Q, SearchIndex, TextOptions
from sparksearchengine_spark.plans.ast import F_
from sparksearchengine_spark.plans.serde import query_to_json


def main(
    path: str = "/root/testdata/sf0.001/documents.parquet",
    out: str | None = None,
) -> None:
    owns_session = SparkSession.getActiveSession() is None
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("durable registry example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = out or tempfile.mkdtemp()

    docs = spark.read.parquet(path)

    # 1. build once, save the durable double-bucketed layout
    idx = Corpus(
        docs,
        id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="simple", positions=True)},
    ).build_index()
    layout = os.path.join(out, "index")
    idx.save(layout, term_buckets=8, doc_buckets=8)
    idx.unpersist()

    # 2. the serving session loads the layout
    serving = SearchIndex.load(spark, layout)
    print(f"loaded: term_buckets={serving.term_buckets} "
          f"doc_buckets={serving.doc_buckets}")

    # 3. the standing registry, normalized ONCE
    from sparksearchengine_spark.operators.joindsl import (
        percolate_dsl_df,
        prepare_dsl_queries,
    )

    f = Q.field("text")
    registry = spark.createDataFrame(
        [
            (1, query_to_json(f.match_all("dup", "merge"))),
            (2, query_to_json(f.match_phrase("sort merge"))),
            (3, query_to_json(f.match_term("spark") & F_.ge("n_chars", 100))),
            (4, query_to_json(f.match_wildcard("sca*"))),
        ],
        "alert_id long, rule string",
    )
    prepared = prepare_dsl_queries(serving, registry, "rule", "alert_id")

    # 4. two incoming batches percolate against the SAME prepared frame
    for name, batch in (
        ("morning", docs.where(F.col("doc_id") % 7 == 0)),
        ("evening", docs.where(F.col("doc_id") % 7 == 3)),
    ):
        bidx = Corpus(
            batch,
            id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="simple",
                                           positions=True)},
        ).build_index()
        fired = percolate_dsl_df(
            bidx, registry, "rule", "alert_id", prepared=prepared
        )
        counts = {
            r["query_id"]: r["n"]
            for r in fired.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        print(f"{name} batch fired: "
              + ", ".join(f"alert {a}: {counts.get(a, 0)}"
                          for a in (1, 2, 3, 4)))
        bidx.unpersist()

    # the registry also percolates the DURABLE layout directly — the
    # bucketed scan prunes to the registry's term buckets (DPP)
    full = percolate_dsl_df(
        serving, registry, "rule", "alert_id", prepared=prepared
    )
    plan = full._jdf.queryExecution().executedPlan().toString()
    print(f"full-corpus matches: {full.count()} "
          f"(scan bucket-pruned: {'dynamicpruning' in plan})")

    # 5. alert payloads from the doc-bucketed corpus
    hit_ids = [r["doc_id"] for r in full.limit(3).collect()]
    payload = serving.get_elements(hit_ids).select("requested_id", "source")
    print(f"payload rows: {payload.count()}")

    prepared.unpersist()
    serving.unpersist()
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
