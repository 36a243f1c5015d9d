"""Saved searches / alerting over the full query DSL (r6 surface).

The reference's ``batchSearch(Iterable[(Long, DslQuery)])``
(`SearchableRDD.scala:194-197`) accepts an arbitrary query tree per id;
this example runs a heterogeneous saved-search registry — a term, a
matchAll set, an exact phrase, a sloppy phrase, and a boolean with an
attribute filter — through both execution modes:

* ``batch_search_dsl`` — top-k per query (the ranked "search inbox");
* ``percolate_dsl``    — ALL matches per query (the alerting verdict:
  which standing queries fire for which docs).

Term-class queries and phrases execute as DATA in shared plans; only
the boolean compiles its own plan. Run:
``python examples/saved_searches_example.py [parquet_path]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sparksearchengine_spark import Corpus, F_, Q, TextOptions


def main() -> None:
    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.001/documents.parquet"
    )
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(path)
    index = Corpus(
        docs,
        id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="simple", positions=True)},
    ).build_index()

    f = Q.field("text")
    saved = [
        (1, f.match_term("dup")),
        (2, f.match_all("dup", "spark")),
        (3, f.match_phrase("table hash")),
        (4, f.match_phrase("dup merge", slop=2)),
        (5, f.match_text("spark merge") & F_.gt("doc_id", 100)),
    ]

    from sparksearchengine_spark.operators.search import (
        batch_search_dsl,
        percolate_dsl,
    )

    ranked = batch_search_dsl(index, saved, k=3)
    print("Saved-search top-3 per query:")
    for r in ranked.orderBy("query_id", "rank").collect():
        print(
            f"  q{r.query_id} #{r.rank}: doc {r.doc_id}"
            f" (score {r.score:.3f})"
        )

    fired = percolate_dsl(index, saved)
    counts = (
        fired.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy("query_id")
        .collect()
    )
    print("Percolation (all matches per standing query):")
    for r in counts:
        print(f"  q{r.query_id}: {r.n_matches} matching docs")


if __name__ == "__main__":
    main()
