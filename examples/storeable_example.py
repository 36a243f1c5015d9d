"""Spark-native re-expression of `examples/StoreableExample.scala`:
index FULL fields but persist only a reduced payload.

The reference's ``Storeable.getData`` stores just the title while both
title and text are indexed (`StoreableExample.scala:36-45`); the analog
is ``SearchIndex.save(path, stored_cols=[...])`` — queries on the
unstored column still answer from the postings, element payloads carry
only what results need.

Run: ``python examples/storeable_example.py [parquet_path] [out_path]``
"""

from __future__ import annotations

import sys
import tempfile

import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession

from sparksearchengine_spark import Corpus, Q, SearchIndex, TextOptions


def main(
    path: str = "/root/testdata/sf0.001/documents.parquet",
    out: str | None = None,
) -> None:
    # under pytest the session is shared — only stop what we created
    owns_session = SparkSession.getActiveSession() is None
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("storeable example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = out or tempfile.mkdtemp(prefix="storeable_ix_")

    docs = spark.read.parquet(path)
    # index text AND source; store only source (the reduced payload)
    index = Corpus(
        docs.select("doc_id", "text", "source"),
        id_col="doc_id",
        text_cols={
            "text": TextOptions(analyzer="simple"),
            "source": TextOptions(analyzer="whitespace"),
        },
    ).build_index()
    index.save(out, stored_cols=["source"])

    loaded = SearchIndex.load(spark, out)
    # query the UNSTORED text field: postings answer it
    hits = loaded.search(
        Q.field("text").match_any("data", "query"), k=5, with_elements=True
    )
    print(f"saved to {out}; results carry only the stored payload:")
    hits.show(truncate=50)
    # reference: getDataAndIndicesInfo
    print(loaded.indices_info())
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:3])
