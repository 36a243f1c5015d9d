"""Spark-native re-expression of the reference's example programs.

Mirrors `examples/SearchableRDDExamples.scala` scenario-for-scenario —
count the corpus, build an index with English analyzers, run a DSL
query with `aggregating_search`, print index/term statistics, and
query-join the corpus against itself — so a reference user can diff
the two programs line by line. Input here is any parquet corpus with a
text column (`/root/testdata/sf0.001/documents.parquet` by default);
for a real Wikipedia dump swap the read for
`sources.read_wikipedia_dump`.

Run: ``python examples/searchable_examples.py [parquet_path]``
"""

from __future__ import annotations

import sys

import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sparksearchengine_spark import Corpus, Q, TextOptions


def main(path: str = "/root/testdata/sf0.001/documents.parquet") -> None:
    # under pytest the session is shared — only stop what we created
    owns_session = SparkSession.getActiveSession() is None
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("searchable example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(path).cache()
    # reference: wikipages.count()
    print(f"Number of docs: {docs.count()}")

    # reference: LuceneConfig(EnglishWikipediaAnalyzer x2, DefaultQueryConstructor)
    corpus = Corpus(
        docs,
        id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="english")},
    )
    index = corpus.build_index()

    # reference: "text" matchAll termSet("island"); aggregatingSearch(query, 10)
    query = Q.field("text").match_all("data")
    for row in index.aggregating_search(query, k=10):
        print(f"  score: {row[0]['score']:.3f} doc: {row[0]['doc_id']}")

    # reference: getIndicesInfo.prettyToString()
    print(index.indices_info())

    # reference: getTermCounts -> top 10 terms
    top = (
        index.term_counts()
        .orderBy(F.desc("total_tf"))
        .limit(10)
        .collect()
    )
    print("Top 10 terms:")
    for r in top:
        print(f"  term: {r['term']} count: {r['total_tf']}")

    # reference: queryJoin(self, title + text.take(200), 5)
    joined = index.query_join(
        docs.withColumn("qtext", F.substring("text", 1, 200)),
        text_col="qtext",
        field="text",
        k=5,
        other_id_col="doc_id",
    )
    print("Query join sample:")
    for r in joined.limit(10).collect():
        print(f"  src {r['doc_id']} -> {r['match_doc_id']} ({r['score']:.3f})")

    # reference: queryJoin with an arbitrary queryGenerator
    # (`SearchableRDD.scala:259-269`) — here each row CARRIES its own
    # query tree as data (plans/serde), structurally different per row
    from sparksearchengine_spark import F_, query_to_json

    per_row = spark.createDataFrame(
        [
            (1, query_to_json(Q.field("text").match_term("dup"))),
            (2, query_to_json(Q.field("text").match_phrase("table hash"))),
            (
                3,
                query_to_json(
                    Q.field("text").match_text("merge scan")
                    & F_.ge("n_chars", 150)
                ),
            ),
        ],
        "rid long, qjson string",
    )
    gen = index.query_join_dsl(per_row, "qjson", k=3, other_id_col="rid")
    print("Generalized (per-row DSL) query join sample:")
    for r in gen.orderBy("rid", "rank").collect():
        if r["match_doc_id"] is not None:
            print(f"  q{r['rid']} -> {r['match_doc_id']} ({r['score']:.3f})")

    docs.unpersist()
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
