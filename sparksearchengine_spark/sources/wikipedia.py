"""Wikipedia XML dump source (SURVEY §2.2 S1).

The reference parses MediaWiki ``pages-articles`` dumps with a Hadoop
``XmlInputFormat`` that splits on ``<page>…</page>`` plus a hand-written
pull parser extracting ``(title, text)``
(reference `utils/WikipediaXmlDumpParser.scala:46-114`, schema
`utils/wikipage.scala:6-13`).

Spark-first replacement: Spark 4 ships a native XML data source
(`spark.read.format("xml").option("rowTag", "page")`) that does the split
*and* the parse inside the scan — splittable on uncompressed/bzip2 dumps,
so a 100 TB dump fans out across executors with no driver involvement.
A ``wholeTextFiles`` + regex fallback covers builds where the XML source
is unavailable (it is NOT the scale path and says so).

Output schema (the reference's ``wikipage``): ``title string, text string``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WIKIPAGE_SCHEMA = "title string, text string"

# wiki-markup strip, applied innermost-first; each is a pure JVM-side
# regexp_replace so markup removal rides the scan stage (no UDF).
_MARKUP_PATTERNS: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", " "),                      # comments
    (r"(?s)\{\{[^{}]*\}\}", " "),                  # {{templates}} (innermost)
    (r"(?s)\{\{[^{}]*\}\}", " "),                  # second pass for one nesting level
    (r"(?s)<ref[^>]*/>", " "),                     # self-closing refs
    (r"(?s)<ref[^>]*>.*?</ref>", " "),             # <ref>…</ref>
    (r"\[\[(?:[^\[\]|]*\|)?([^\[\]|]*)\]\]", "$1"),  # [[link|label]] -> label
    (r"\[https?://\S*\s?([^\]]*)\]", "$1"),        # [url label] -> label
    (r"'{2,}", ""),                                # ''italic'' / '''bold'''
    (r"(?m)^=+\s*(.*?)\s*=+\s*$", "$1"),           # == headings ==
    (r"<[^>]+>", " "),                             # residual tags
]


def strip_wiki_markup(col: F.Column) -> F.Column:
    """Markup-stripped plain text as a chained regexp_replace expression."""
    out = col
    for pat, rep in _MARKUP_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def read_wikipedia_dump(
    spark: SparkSession,
    path: str,
    strip_markup: bool = False,
    keep_redirects: bool = False,
) -> DataFrame:
    """Parse a MediaWiki XML dump into DataFrame(title, text).

    Mirrors the reference's extraction rules
    (`WikipediaXmlDumpParser.scala:60-105`): one row per ``<page>``, text =
    the page's latest ``<revision><text>`` payload, missing text -> ''.
    Redirect pages (``<redirect/>`` present) are dropped unless asked for,
    matching typical corpus-building usage.
    """
    try:
        raw = (
            spark.read.format("xml")
            .option("rowTag", "page")
            .load(path)
        )
        return _project_pages(raw, strip_markup, keep_redirects)
    except Exception as e:
        from pyspark.errors import AnalysisException

        if isinstance(e, AnalysisException) and "PATH_NOT_FOUND" in str(e):
            raise  # surface the real error, not a confusing binaryFile one
        # non-scale fallback: whole-file regex split (small dumps/tests
        # only); decompresses .bz2/.gz per file since binaryFile won't
        return _read_dump_fallback(spark, path, strip_markup, keep_redirects)


def _project_pages(
    raw: DataFrame, strip_markup: bool, keep_redirects: bool
) -> DataFrame:
    cols = dict.fromkeys(raw.columns)
    title = F.col("title").cast("string")
    # revision may parse as struct or array<struct>; text as string or
    # struct with _VALUE (it carries xml:space/bytes attributes)
    if "revision" in cols:
        from pyspark.sql.types import ArrayType, StructType

        rev_dt = raw.schema["revision"].dataType
        if isinstance(rev_dt, ArrayType):
            # multi-revision pages list revisions chronologically; the
            # contract is the LATEST revision's text, i.e. the last one
            rev = F.element_at(F.col("revision"), -1)
            rev_dt = rev_dt.elementType
        else:
            rev = F.col("revision")
        text = rev["text"]
        # check the TEXT field's own type, not the whole revision struct:
        # any sibling element with attributes also contributes a _VALUE
        text_dt = (
            rev_dt["text"].dataType
            if isinstance(rev_dt, StructType) and "text" in rev_dt.names
            else None
        )
        if isinstance(text_dt, StructType) and "_VALUE" in text_dt.names:
            text = text["_VALUE"]
        text = text.cast("string")
    else:
        text = F.lit(None).cast("string")
    out = raw.select(
        title.alias("title"),
        F.coalesce(text, F.lit("")).alias("text"),
        *(
            [F.col("redirect").isNotNull().alias("_is_redirect")]
            if "redirect" in cols
            else [F.lit(False).alias("_is_redirect")]
        ),
    )
    if not keep_redirects:
        out = out.where(~F.col("_is_redirect"))
    out = out.drop("_is_redirect")
    if strip_markup:
        out = out.withColumn("text", strip_wiki_markup(F.col("text")))
    return out


def _read_dump_fallback(
    spark: SparkSession, path: str, strip_markup: bool, keep_redirects: bool
) -> DataFrame:
    import re

    def parse_pages(iterator):
        import pandas as pd

        page_re = re.compile(r"(?s)<page>(.*?)</page>")
        title_re = re.compile(r"(?s)<title>(.*?)</title>")
        text_re = re.compile(r"(?s)<text[^>]*>(.*?)</text>")
        redirect_re = re.compile(r"<redirect[^>]*/?>")

        def unescape(s: str) -> str:
            return (
                s.replace("&lt;", "<").replace("&gt;", ">")
                .replace("&quot;", '"').replace("&amp;", "&")
            )

        def decode(blob: bytes, p: str) -> str:
            # binaryFile does NOT decompress; a .bz2/.gz dump read as raw
            # bytes would regex-match nothing and silently yield an empty
            # corpus — decompress per file here (r3 review finding)
            if p.endswith(".bz2"):
                import bz2

                blob = bz2.decompress(blob)
            elif p.endswith(".gz"):
                import gzip

                blob = gzip.decompress(blob)
            return blob.decode("utf-8", errors="replace")

        for pdf in iterator:
            rows = []
            for pth, blob in zip(pdf["path"], pdf["content"]):
                content = decode(bytes(blob or b""), str(pth))
                for m in page_re.finditer(content or ""):
                    body = m.group(1)
                    if not keep_redirects and redirect_re.search(body):
                        continue
                    t = title_re.search(body)
                    x = text_re.search(body)
                    rows.append(
                        (
                            unescape(t.group(1)) if t else "",
                            unescape(x.group(1)) if x else "",
                        )
                    )
            yield pd.DataFrame(rows, columns=["title", "text"])

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    out = files.mapInPandas(parse_pages, schema=WIKIPAGE_SCHEMA)
    if strip_markup:
        out = out.withColumn("text", strip_wiki_markup(F.col("text")))
    return out
