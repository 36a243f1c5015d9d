"""Sources & sinks (SURVEY §2.2).

S1 Wikipedia XML dump  -> `wikipedia.read_wikipedia_dump` (Spark 4 native
                          XML data source; splittable at scale)
S2 object-file sink    -> parquet round-trip (`save_corpus`/`load_corpus`;
                          the reference's saveAsObjectFile/objectFile,
                          reference `WikipediaXmlDumpParser.scala:36`,
                          `examples/StoreableExample.scala:22-30`)
S3 WARC / WET / WAT    -> `warc.read_warc` / `warc.read_wet_text` /
                          `warc.read_wat_metadata` (+ HTML response
                          split, outlink extraction from HTML or WAT
                          envelopes — the full CMU-Lemur reader
                          surface, Spark-first)
JSONL / CSV / raw text -> `read_jsonl_corpus` / `read_csv_corpus` /
                          `read_text_corpus` (LLM-corpus interchange
                          formats; corrupt-record capture, deterministic
                          id synthesis)
media blobs            -> `operators.multimodal.read_media_dir`
streams                -> `streaming.stream.read_document_stream`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparksearchengine_spark.sources.wikipedia import (
    read_wikipedia_dump,
    strip_wiki_markup,
)
from sparksearchengine_spark.sources.warc import (
    read_warc,
    read_wat_metadata,
    read_wet_text,
    warc_html_responses,
    warc_outlink_edges,
    warc_outlinks,
    wat_outlinks,
)


def save_corpus(df: DataFrame, path: str) -> None:
    """S2 sink: columnar, compressed, predicate-pushdown-capable — strictly
    dominates the reference's Java-serialized object files."""
    df.write.mode("overwrite").parquet(path)


def load_corpus(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    schema: str | None = None,
) -> DataFrame:
    """JSONL corpus source — the de-facto LLM-corpus interchange format
    (one JSON doc per line; .jsonl/.jsonl.gz/.jsonl.zst directories).

    Contract hardening over a bare ``spark.read.json``:

    * with ``schema`` given, malformed lines land in ``_corrupt_record``
      (PERMISSIVE) instead of failing the job or silently widening the
      schema — at crawl scale some lines are always broken. (Spark quirk:
      filtering a raw JSON scan by ``_corrupt_record`` ALONE raises
      QUERY_ONLY_CORRUPT_RECORD_COLUMN — ``cache()`` or reference another
      column in the same query);
    * without ``schema``, one inference pass runs (fine for exploration;
      pass a schema in production to skip it);
    * a missing ``id_col`` is synthesized from ``xxhash64(text)`` — the
      same content-keyed idiom as the media source, deterministic across
      reruns (unlike ``monotonically_increasing_id``), with the documented
      property that exact-duplicate texts collide (they are the same doc
      to every downstream dedup anyway);
    * ``text_col`` must exist — failing here beats a nonsense index later.
    """
    reader = spark.read
    if schema is not None:
        # PERMISSIVE only CAPTURES corrupt lines when the corrupt-record
        # column exists in the supplied schema — without it they would
        # become silent all-NULL rows (r3 review finding); append it so
        # the documented contract actually holds
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.types import _parse_datatype_string

        st = (
            _parse_datatype_string(schema)
            if isinstance(schema, str)
            else schema
        )
        corrupt_col = spark.conf.get(
            "spark.sql.columnNameOfCorruptRecord", "_corrupt_record"
        )
        if isinstance(st, StructType) and corrupt_col not in st.names:
            st = st.add(corrupt_col, StringType())
        reader = reader.schema(st).option("mode", "PERMISSIVE")
    df = reader.json(path)
    if text_col not in df.columns:
        raise ValueError(
            f"JSONL at {path!r} has no {text_col!r} column; "
            f"found {df.columns}"
        )
    if id_col not in df.columns:
        from pyspark.sql import functions as F

        df = df.withColumn(id_col, F.xxhash64(F.col(text_col)))
    return df


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    schema: str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV/TSV corpus source with the same contract hardening as
    :func:`read_jsonl_corpus`: with ``schema`` given, malformed rows are
    CAPTURED in ``_corrupt_record`` (PERMISSIVE + the column appended to
    the schema — without it Spark silently yields all-NULL rows);
    without one, an inference pass runs (exploration only — pass a
    schema in production). Extra reader options (``sep='\\t'``,
    ``multiLine='true'``, ``quote=...``) pass through. A missing
    ``id_col`` is synthesized as ``xxhash64(text)`` — deterministic
    across reruns; exact-duplicate texts collide by design (same doc to
    every downstream dedup)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.types import _parse_datatype_string

    reader = spark.read.option("header", str(bool(header)).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        st = (
            _parse_datatype_string(schema)
            if isinstance(schema, str)
            else schema
        )
        corrupt_col = spark.conf.get(
            "spark.sql.columnNameOfCorruptRecord", "_corrupt_record"
        )
        if isinstance(st, StructType) and corrupt_col not in st.names:
            st = st.add(corrupt_col, StringType())
        reader = reader.schema(st).option("mode", "PERMISSIVE")
    df = reader.csv(path)
    if text_col not in df.columns:
        raise ValueError(
            f"CSV at {path!r} has no {text_col!r} column; "
            f"found {df.columns}"
        )
    if id_col not in df.columns:
        df = df.withColumn(id_col, F.xxhash64(F.col(text_col)))
    return df


def read_text_corpus(
    spark: SparkSession,
    path: str,
    mode: str = "file",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Raw-text corpus source: ``(doc_id, text, path)``.

    ``mode="file"``: one document per FILE (``wholetext`` text scan —
    the one-doc-per-file crawl layout); ``doc_id = xxhash64(path)``,
    collision-free per distinct path, stable across reruns.
    CAUTION at scale: a whole-file row is unsplittable — fine for the
    many-small-files layout this mode exists for, wrong for one giant
    file (use ``mode="line"``).

    ``mode="line"``: one document per LINE (splittable scan);
    ``doc_id = xxhash64(path, text)`` — stable across reruns and
    partitionings, with the documented property that duplicate lines
    WITHIN one file collide (identical docs to every downstream dedup).
    """
    from pyspark.sql import functions as F

    if mode not in ("file", "line"):
        raise ValueError(f"mode must be file|line, got {mode!r}")
    # the kwarg, not .option("wholetext", ...): the .text() wrapper
    # passes its own wholetext parameter and overrides a preset option
    df = spark.read.text(path, wholetext=(mode == "file")).select(
        F.col("value").alias(text_col),
        F.col("_metadata.file_path").alias("path"),
    )
    if mode == "file":
        did = F.xxhash64(F.col("path"))
    else:
        did = F.xxhash64(F.col("path"), F.col(text_col))
    return df.select(did.alias(id_col), text_col, "path")


__all__ = [
    "read_wikipedia_dump",
    "strip_wiki_markup",
    "read_warc",
    "read_wat_metadata",
    "read_wet_text",
    "warc_html_responses",
    "warc_outlink_edges",
    "warc_outlinks",
    "wat_outlinks",
    "save_corpus",
    "load_corpus",
    "read_jsonl_corpus",
    "read_csv_corpus",
    "read_text_corpus",
]
