"""Sources & sinks (SURVEY §2.2).

S1 Wikipedia XML dump  -> `wikipedia.read_wikipedia_dump` (Spark 4 native
                          XML data source; splittable at scale)
S2 object-file sink    -> parquet round-trip (`save_corpus`/`load_corpus`;
                          the reference's saveAsObjectFile/objectFile,
                          reference `WikipediaXmlDumpParser.scala:36`,
                          `examples/StoreableExample.scala:22-30`)
S3 WARC                -> out of scope (vendored & unused in the reference)
media blobs            -> `operators.multimodal.read_media_dir`
streams                -> `streaming.stream.read_document_stream`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparksearchengine_spark.sources.wikipedia import (
    read_wikipedia_dump,
    strip_wiki_markup,
)


def save_corpus(df: DataFrame, path: str) -> None:
    """S2 sink: columnar, compressed, predicate-pushdown-capable — strictly
    dominates the reference's Java-serialized object files."""
    df.write.mode("overwrite").parquet(path)


def load_corpus(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


__all__ = [
    "read_wikipedia_dump",
    "strip_wiki_markup",
    "save_corpus",
    "load_corpus",
]
