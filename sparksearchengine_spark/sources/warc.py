"""WARC / WET / WAT web-archive source (SURVEY §2.2 S3).

Reads ISO-28500 WARC files — the Common Crawl / ClueWeb interchange
format and the de-facto raw-input layout of every web-scale pretraining
pipeline — into a DataFrame of typed records, plus the two derived
views the reference's CMU-Lemur reader exposes: HTTP/HTML response
extraction and normalized outlink extraction.

Reference parity (semantics only; the implementation is Spark-first):

* record framing + header parse: ``WarcRecord.readNextWarcRecord``
  (``edu/cmu/lemurproject/WarcRecord.java:263``) — scan to a
  ``WARC/<version>`` magic line, ``Key: Value`` headers split on the
  FIRST colon, mandatory ``Content-Length``, payload bytes, resync on
  malformed framing by scanning to the next magic line. Both WARC/1.x
  (Common Crawl) and WARC/0.18 (ClueWeb, the reference's pin at
  ``WarcRecord.java:70``) parse.
* per-file gzip streaming: ``WarcFileRecordReader.java`` — one
  sequential pass per ``.warc(.gz)`` file; multi-member gzip (one
  member per record, the Common Crawl layout) reads transparently.
* HTML responses + outlinks: ``WarcHTMLResponseRecord.java:108``
  (``WARC-Target-URI``), ``:112`` (``WARC-TREC-ID``), ``:168``
  (``getURLOutlinks``: a/area href + frame/iframe src regexes over
  ``<...>`` tags, query-string strip, resolve against the target URI,
  keep http(s) only, drop self-links, set-dedup).

Scale design (100 TB = ~100k 1-GiB ``.warc.gz`` files):

* gzip is not splittable, so the correct parallelism unit is the FILE:
  one Spark task per file, streaming parse with one-record memory
  (``iter_warc_records`` is a generator; ``mapInPandas`` yields Arrow
  batches of ``batch_rows`` records — a task never holds a whole file).
* file listing is a driver-side metadata pass (exactly what every
  Spark file source does); ~100k paths is trivially driver-sized.
* ``record_types`` filtering happens INSIDE the parser, before Arrow
  serialization — a WET-only read of a response+request WARC ships
  only the conversion records out of Python.
* ``max_payload_bytes`` bounds row width against pathological records
  (truncation is flagged per-row, never silent).
* payload decode (HTTP split, charset) stays in the same Arrow batch
  pass — no second Python round-trip.
"""

from __future__ import annotations

import gzip
import io
import re
from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MAGIC = b"WARC/"

RECORD_SCHEMA = (
    "path string, offset long, record_id string, record_type string, "
    "target_uri string, date string, content_type string, "
    "content_length long, truncated boolean, "
    "headers map<string,string>, payload binary"
)

# read_warc(decode="utf8"): payload decoded to text INSIDE the parser
# pass, so the (100 TB) payload crosses Arrow exactly once — same
# economics as the fused warc_outlink_edges path (r11 verdict #2)
RECORD_TEXT_SCHEMA = RECORD_SCHEMA.replace(
    "payload binary", "payload_text string"
)

# WarcHTMLResponseRecord.java:54-58 — the four outlink patterns, applied
# per <...> tag; group(1) is the raw URL.
_TAG_RE = re.compile(r"<(.*?)>", re.S)
_LINK_RES = (
    re.compile(r"a.+?href=['\"](.+?)['\"]", re.I | re.S),
    re.compile(r"area.+?href=['\"](.*?)['\"]", re.I | re.S),
    re.compile(r"frame.+?src=['\"](.*?)['\"]", re.I | re.S),
    re.compile(r"iframe.+?src=['\"](.*?)['\"]", re.I | re.S),
)
_HTTP_RE = re.compile(r"^https?://", re.I)

# HTTP response split + decode (shared by warc_html_responses' Arrow UDF
# and the fused warc_outlink_edges pass — ONE implementation, so the
# fused path is parity-by-construction with the composed pipeline)
_STATUS_RE = re.compile(r"HTTP/\d(?:\.\d)?\s+(\d{3})")
_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)", re.I)
_CT_HTML_RE = re.compile(r"content-type:[^\n]*html")
_HTML_TAG_RE = re.compile(r"(?i)<html")


def _split_http(raw: bytes | None) -> tuple[int | None, str, bytes]:
    """(status, header_text, body_bytes) from a raw HTTP response
    payload. Header/body cut on the first blank line (CRLF or bare LF);
    no header block at all -> the whole payload is body. The status
    line's version may be dotless (HTTP/2, HTTP/3 status lines from
    modern crawlers — r9 review finding)."""
    raw = raw or b""
    cut = raw.find(b"\r\n\r\n")
    if cut < 0:
        cut = raw.find(b"\n\n")
        head, body = (raw[:cut], raw[cut + 2 :]) if cut >= 0 else (b"", raw)
    else:
        head, body = raw[:cut], raw[cut + 4 :]
    htext = head.decode("latin-1", errors="replace")
    m = _STATUS_RE.match(htext)
    return (int(m.group(1)) if m else None), htext, body


def _decode_http_body(body: bytes, htext: str) -> str:
    """Charset-aware total decode: the HTTP ``charset=`` header when
    present and known to Python, else UTF-8 if clean, else latin-1
    (total, byte-preserving) — always ``errors="replace"``, a crawl
    always has mojibake."""
    import codecs

    m = _CHARSET_RE.search(htext)
    if m:
        try:
            codecs.lookup(m.group(1))
            return body.decode(m.group(1), errors="replace")
        except LookupError:
            pass
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return body.decode("latin-1", errors="replace")


def _is_htmlish(htext: str, html: str) -> bool:
    """The ``html_only`` predicate, Python side — same two clauses as
    the composed pipeline's Spark filter (Content-Type mentions html,
    or the body carries an ``<html`` tag)."""
    return bool(
        _CT_HTML_RE.search(htext.lower()) or _HTML_TAG_RE.search(html)
    )


def _utf8_total(b: bytes | None) -> str:
    """Total binary→string decode (``errors="replace"`` — a crawl
    always has mojibake). THE decode rule, shared by the fused
    ``read_warc(decode="utf8")`` parser pass and the composed
    ``_utf8_udf`` Arrow UDF, so fused == composed holds by
    construction."""
    return (b or b"").decode("utf-8", errors="replace")


def _read_line(stream: io.BufferedIOBase) -> bytes:
    """One header line (file-object ``readline`` — unbounded only by
    header-line length, never by payload size)."""
    return stream.readline()


def iter_warc_records(
    stream: io.BufferedIOBase,
    record_types: frozenset[str] | None = None,
    max_payload_bytes: int | None = None,
) -> Iterator[dict[str, Any]]:
    """Streaming WARC record generator over one (decompressed) stream.

    Mirrors ``WarcRecord.readNextWarcRecord``: scan forward line-by-line
    until a ``WARC/`` magic line (leading junk and inter-record damage
    are skipped — the reference resyncs the same way), parse headers on
    the first ``:``, require ``Content-Length``, read exactly that many
    payload bytes. A record whose payload is cut off by EOF is dropped
    (never a partial row). Memory: one record at a time.
    """
    offset = 0
    while True:
        # --- scan to the next magic line -----------------------------
        rec_off = offset
        line = _read_line(stream)
        while line and not line.strip().startswith(_MAGIC):
            offset += len(line)
            rec_off = offset
            line = _read_line(stream)
        if not line:
            return
        offset += len(line)
        # --- header block: Key: Value lines to the first blank line --
        headers: dict[str, str] = {}
        bad = False
        while True:
            hline = _read_line(stream)
            offset += len(hline)
            if not hline:  # EOF mid-header: no complete record
                return
            s = hline.strip()
            if not s:
                break
            if s.startswith(_MAGIC):  # damaged block; resync here is
                bad = True            # imperfect but matches reference
                break
            k, sep, v = s.partition(b":")
            if not sep:
                # reference keeps the key with an empty value
                headers[k.decode("latin-1").strip()] = ""
            else:
                headers[k.decode("latin-1").strip()] = v.decode(
                    "latin-1"
                ).strip()
        if bad:
            continue
        lower = {k.lower(): v for k, v in headers.items()}
        try:
            clen = int(lower.get("content-length", ""))
        except ValueError:
            continue  # unframeable without a length; rescan
        if clen < 0:
            continue
        # --- payload --------------------------------------------------
        truncated = False
        if max_payload_bytes is not None and clen > max_payload_bytes:
            payload = stream.read(max_payload_bytes)
            rest = clen - len(payload)
            truncated = True
            # consume the remainder without buffering it
            while rest > 0 and (chunk := stream.read(min(rest, 1 << 20))):
                rest -= len(chunk)
            if rest > 0:
                return  # EOF inside the record
        else:
            payload = stream.read(clen)
            if len(payload) < clen:
                return  # EOF inside the record: drop the partial
        offset += clen
        rtype = lower.get("warc-type", "")
        if record_types is not None and rtype not in record_types:
            continue
        yield {
            "offset": rec_off,
            "record_id": lower.get("warc-record-id", ""),
            "record_type": rtype,
            "target_uri": lower.get("warc-target-uri", ""),
            "date": lower.get("warc-date", ""),
            "content_type": lower.get("content-type", ""),
            "content_length": clen,
            "truncated": truncated,
            "headers": headers,
            "payload": bytes(payload),
        }


def strip_file_scheme(path: str) -> str:
    """Anchored ``file:`` / ``file://`` scheme strip — THE rule the
    default opener applies to listed URIs. Custom openers should call
    this instead of hand-rolling it (an unanchored ``str.replace``
    corrupts paths that merely contain ``'file:'``)."""
    return re.sub(r"^file:(//)?", "", path)


def _default_opener(path: str) -> io.BufferedIOBase:
    """Open a listed path for sequential binary read. ``file:`` URIs and
    plain paths open directly; gzip by suffix (multi-member transparent
    — the Common Crawl record-per-member layout); bz2 by suffix; zstd
    (``.zst``, the newer Common Crawl layout) when the ``zstandard``
    package is installed — gated import, loud error otherwise. For
    object stores, pass an ``opener`` (e.g. ``fsspec.open(path,
    'rb').open``)."""
    local = strip_file_scheme(path)
    if local.endswith(".gz"):
        return gzip.open(local, "rb")  # type: ignore[return-value]
    if local.endswith(".bz2"):
        import bz2

        return bz2.open(local, "rb")  # type: ignore[return-value]
    if local.endswith(".zst"):
        try:
            import zstandard
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "reading .warc.zst needs the 'zstandard' package "
                "(pip install zstandard), or pass opener=..."
            ) from e
        fh = open(local, "rb")
        return io.BufferedReader(
            zstandard.ZstdDecompressor().stream_reader(fh)
        )
    return open(local, "rb")


def _paths_frame(spark: SparkSession, path: str) -> DataFrame | None:
    """One-row-per-file frame over a Hadoop-FS glob, one PARTITION per
    file, or ``None`` when the glob lists nothing.

    Driver-side listing via the binaryFile source (same glob semantics
    as every Spark path); selecting only ``path`` prunes the content
    column, so nothing is read here but metadata. Exactly one file per
    partition: parallelize with an explicit slice count is
    collision-free, unlike ``repartition(n, "path")`` whose hash
    assignment leaves ~1/e of the tasks empty and stacks multi-file
    stragglers on others (balls-in-bins; r9 review finding) — the one
    RDD seam in the package, and precisely what numSlices exists for."""
    listed = [
        r.path
        for r in spark.read.format("binaryFile").load(path).select("path").collect()
    ]
    if not listed:
        return None
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(p,) for p in sorted(listed)], numSlices=len(listed)
        ),
        "path string",
    )


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: Iterable[str] | None = None,
    max_payload_bytes: int | None = 64 << 20,
    batch_rows: int = 256,
    opener: Callable[[str], io.BufferedIOBase] | None = None,
    id_col: str = "doc_id",
    decode: str | None = None,
) -> DataFrame:
    """S3 source: WARC/WET/WAT files -> one row per record.

    Columns: ``doc_id`` (xxhash64(path, offset) — deterministic across
    reruns and partitionings, unique per record), ``path``, ``offset``
    (byte offset in the uncompressed stream), ``record_id``,
    ``record_type``, ``target_uri``, ``date``, ``content_type``,
    ``content_length``, ``truncated``, ``headers`` (full map),
    ``payload`` (binary).

    ``decode="utf8"`` (r11 verdict #2): the payload is decoded to text
    INSIDE the parser loop and emitted as ``payload_text`` (string)
    instead of ``payload`` — for WET/WAT, where the payload IS the
    product, this makes the text cross the Arrow boundary exactly once
    instead of binary-out + string-back through a second pandas UDF
    (at 100 TB the composed shape serializes the whole corpus twice).
    The decode is :func:`_utf8_total`, the same rule ``_utf8_udf``
    applies, so fused == composed by construction (pinned in
    ``tests/test_warc_source.py``).

    One task per file (gzip is unsplittable); the parse is a bounded-
    memory generator; ``record_types`` filters before Arrow transfer.
    """
    if decode not in (None, "utf8"):
        raise ValueError(
            f"decode={decode!r}: only 'utf8' (total, errors=replace) "
            "or None (raw binary payload) are supported"
        )
    want = frozenset(record_types) if record_types is not None else None
    open_fn = opener or _default_opener
    cap = max_payload_bytes
    schema = RECORD_TEXT_SCHEMA if decode else RECORD_SCHEMA

    paths = _paths_frame(spark, path)
    if paths is None:
        return spark.createDataFrame([], schema).withColumn(
            id_col, F.xxhash64("path", "offset")
        )
    batch_bytes = 64 << 20  # flush by bytes too — rows near the payload
    # cap must not stack batch_rows x cap in one Arrow batch

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                rows: list[dict[str, Any]] = []
                acc = 0
                with open_fn(p) as fh:
                    stream = (
                        fh
                        if isinstance(fh, io.BufferedIOBase)
                        else io.BufferedReader(fh)  # type: ignore[arg-type]
                    )
                    for rec in iter_warc_records(
                        stream, record_types=want, max_payload_bytes=cap
                    ):
                        rec["path"] = p
                        if decode:
                            rec["payload_text"] = _utf8_total(
                                rec.pop("payload")
                            )
                            acc += len(rec["payload_text"])
                        else:
                            acc += len(rec["payload"])
                        rows.append(rec)
                        if len(rows) >= batch_rows or acc >= batch_bytes:
                            yield pd.DataFrame(rows)
                            rows, acc = [], 0
                if rows:
                    yield pd.DataFrame(rows)

    out = paths.mapInPandas(parse, schema)
    return out.withColumn(id_col, F.xxhash64("path", "offset"))


def warc_html_responses(records: DataFrame, html_only: bool = True) -> DataFrame:
    """``WarcHTMLResponseRecord`` view: response records split into HTTP
    status/headers and an HTML body string.

    Columns: ``doc_id``, ``target_uri``, ``trec_id`` (ClueWeb
    ``WARC-TREC-ID``, reference ``WarcHTMLResponseRecord.java:112``),
    ``date``, ``http_status``, ``http_headers``, ``html``.

    The HTTP split + charset decode runs in ONE Arrow pass. Charset: the
    HTTP ``Content-Type: ...; charset=X`` header when present and known
    to Python, else UTF-8 if the body decodes cleanly, else latin-1
    (total, byte-preserving) — always ``errors="replace"``, a crawl
    always has mojibake. ``html_only`` keeps rows whose HTTP
    Content-Type mentions html (reference keeps every response; pass
    False for that).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("http_status int, http_headers string, html string")
    def _split(payload):  # type: ignore[no-untyped-def]
        import pandas as pd

        statuses, hdrs, bodies = [], [], []
        for raw in payload:
            status, htext, body = _split_http(raw)
            statuses.append(status)
            hdrs.append(htext)
            bodies.append(_decode_http_body(body, htext))
        return pd.DataFrame(
            {"http_status": statuses, "http_headers": hdrs, "html": bodies}
        )

    resp = records.filter(F.col("record_type") == "response")
    out = resp.select(
        "doc_id",
        "target_uri",
        F.col("headers").getItem("WARC-TREC-ID").alias("trec_id"),
        "date",
        _split(F.col("payload")).alias("_sp"),  # one UDF eval per row
    ).select("doc_id", "target_uri", "trec_id", "date", "_sp.*")
    if html_only:
        out = out.filter(
            F.lower(F.coalesce(F.col("http_headers"), F.lit(""))).rlike(
                r"content-type:[^\n]*html"
            )
            | F.col("html").rlike(r"(?i)<html")
        )
    return out


def extract_outlinks(html: str, base_uri: str) -> list[str]:
    """Pure-Python mirror of ``getURLOutlinks``
    (``WarcHTMLResponseRecord.java:168``): scan ``<...>`` tags, first
    matching pattern wins per tag, strip the query string, resolve
    against the base URI, keep absolute http(s) only, drop self-links,
    set-dedup (insertion-ordered — deterministic, unlike the
    reference's HashSet iteration). A falsy ``base_uri`` yields no
    outlinks, matching the reference (``getURLOutlinks`` builds every
    candidate through ``URL(new URL(uri), link)`` and a null/empty
    record URI fails that constructor for every tag)."""
    from urllib.parse import urljoin

    if not base_uri:
        return []
    seen: dict[str, None] = {}
    for tag in _TAG_RE.findall(html or ""):
        for pat in _LINK_RES:
            m = pat.search(tag)
            if not m or not m.group(1):
                continue
            url = m.group(1)
            q = url.find("?")
            if q > 0:
                url = url[:q]
            try:
                resolved = urljoin(base_uri or "", url)
            except ValueError:
                resolved = url
            if (
                _HTTP_RE.match(resolved)
                and resolved != base_uri
                and resolved not in seen
            ):
                seen[resolved] = None
                break  # reference's hasAdded: stop once a pattern ADDS;
            # otherwise fall through to the next pattern on this tag
            # (e.g. <frame href="bad" src="good"> — the a-href pattern
            # matches first on the 'a' in "frame" but yields nothing)
    return list(seen)


def warc_outlinks(
    responses: DataFrame,
    html_col: str = "html",
    uri_col: str = "target_uri",
) -> DataFrame:
    """Outlink edges ``(doc_id, target_uri, outlink)`` — one row per
    normalized outlink of each HTML response (the web-graph edge list;
    feeds URL-level dedup/quality via ``operators.weburl``)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _links(html, base):  # type: ignore[no-untyped-def]
        import pandas as pd

        return pd.Series(
            [extract_outlinks(h, b) for h, b in zip(html, base)]
        )

    return responses.select(
        "doc_id",
        F.col(uri_col).alias("target_uri"),
        F.explode(_links(F.col(html_col), F.col(uri_col))).alias("outlink"),
    )


def warc_outlink_edges(
    spark: SparkSession,
    path: str,
    html_only: bool = True,
    max_payload_bytes: int | None = 64 << 20,
    batch_rows: int = 4096,
    opener: Callable[[str], io.BufferedIOBase] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """FUSED crawl-graph entry point: ``read_warc`` ->
    ``warc_html_responses`` -> ``warc_outlinks`` collapsed into ONE
    ``mapInPandas`` pass — record framing, HTTP split, charset decode,
    ``html_only`` filter, and outlink extraction all run in the same
    Python worker loop, and only the tiny edge rows ``(doc_id,
    target_uri, outlink)`` ever cross Arrow.

    Why this exists (r10 verdict #1): the composed pipeline is three
    Python-worker stages, and the bulky ``html`` column crosses Arrow
    TWICE (emitted by the HTTP-split UDF, re-ingested by the outlink
    UDF) — at 100 TB that is 2x the whole crawl payload serialized for
    nothing. The fused path shares every helper with the composed one
    (``iter_warc_records``, ``_split_http``, ``_decode_http_body``,
    ``_is_htmlish``, ``extract_outlinks`` — the reference-parity mirror
    of ``WarcHTMLResponseRecord.java:168``), so the edge set is
    parity-by-construction; ``tests/test_warc_source.py`` pins
    fused == composed on multi-record fixtures. The composed operators
    stay as the general surface (when the html itself is the product —
    text extraction, boilerplate stripping — it must cross Arrow once
    anyway and the fused path buys nothing).

    Scale shape: identical to ``read_warc`` — one task per unsplittable
    ``.warc.gz``, bounded-memory streaming parse, ``response`` records
    only; the per-record html is DROPPED after extraction, so worker
    memory holds one payload at a time and the Arrow batches are
    small-string edges (``batch_rows`` bounds them by row count; no
    byte accounting needed — edges are ~100 B).

    ``doc_id`` is ``xxhash64(path, offset)``, the same key ``read_warc``
    assigns, so fused edges join back to any record-level frame.
    """
    open_fn = opener or _default_opener
    cap = max_payload_bytes
    edge_schema = (
        "path string, offset long, target_uri string, outlink string"
    )

    paths = _paths_frame(spark, path)
    if paths is None:
        return (
            spark.createDataFrame([], edge_schema)
            .withColumn(id_col, F.xxhash64("path", "offset"))
            .select(id_col, "target_uri", "outlink")
        )

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for p in pdf["path"]:
                rows: list[tuple[str, int, str, str]] = []
                with open_fn(p) as fh:
                    stream = (
                        fh
                        if isinstance(fh, io.BufferedIOBase)
                        else io.BufferedReader(fh)  # type: ignore[arg-type]
                    )
                    for rec in iter_warc_records(
                        stream,
                        record_types=frozenset({"response"}),
                        max_payload_bytes=cap,
                    ):
                        _status, htext, body = _split_http(rec["payload"])
                        html = _decode_http_body(body, htext)
                        if html_only and not _is_htmlish(htext, html):
                            continue
                        uri = rec["target_uri"]
                        off = rec["offset"]
                        for link in extract_outlinks(html, uri):
                            rows.append((p, off, uri, link))
                        if len(rows) >= batch_rows:
                            yield pd.DataFrame(
                                rows,
                                columns=[
                                    "path", "offset", "target_uri", "outlink"
                                ],
                            )
                            rows = []
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["path", "offset", "target_uri", "outlink"],
                    )

    out = paths.mapInPandas(parse, edge_schema)
    return out.withColumn(id_col, F.xxhash64("path", "offset")).select(
        id_col, "target_uri", "outlink"
    )


def _utf8_udf():  # type: ignore[no-untyped-def]
    """Total binary→string decode as an Arrow UDF (``F.decode`` would
    throw under Spark 4 ANSI). The composed counterpart of the fused
    ``read_warc(decode="utf8")`` path — both apply :func:`_utf8_total`,
    so they agree byte-for-byte."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _utf8(payload):  # type: ignore[no-untyped-def]
        import pandas as pd

        return pd.Series([_utf8_total(b) for b in payload])

    return _utf8


def _normalize_links_udf():  # type: ignore[no-untyped-def]
    """Arrow UDF applying the reference's outlink normalization (query
    strip, resolve against base, http(s)-only, self-drop, ordered
    dedup) to a pre-extracted URL array — shared contract with
    :func:`extract_outlinks`, minus the tag regexes."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _norm(urls, base):  # type: ignore[no-untyped-def]
        from urllib.parse import urljoin

        import pandas as pd

        out = []
        for us, b in zip(urls, base):
            seen: dict[str, None] = {}
            # falsy base -> no outlinks, same contract as
            # extract_outlinks (reference parity)
            for u in (us if us is not None and b else []):
                if not u:
                    continue
                q = u.find("?")
                if q > 0:
                    u = u[:q]
                try:
                    resolved = urljoin(b or "", u)
                except ValueError:
                    resolved = u
                if _HTTP_RE.match(resolved) and resolved != b:
                    seen.setdefault(resolved, None)
            out.append(list(seen))
        return pd.Series(out)

    return _norm


def wat_outlinks(
    wat: DataFrame,
    uri_col: str = "url",
    metadata_col: str = "metadata",
) -> DataFrame:
    """Outlink edges from WAT envelopes: ``(doc_id, target_uri,
    outlink)`` — the cheap path to the web graph (Common Crawl already
    extracted the links; no HTML parse). Input is
    :func:`read_wat_metadata` output; the ``Links`` array is shredded
    JVM-side from the VARIANT (``$.Envelope.Payload-Metadata.
    HTTP-Response-Metadata.HTML-Metadata.Links[*].url``), then
    normalized with the SAME rules as :func:`warc_outlinks` (query
    strip, resolve, http(s)-only, self-drop, ordered dedup) so the two
    edge sources are interchangeable inputs to
    ``operators.linkgraph``."""
    links_path = (
        "$.Envelope.Payload-Metadata.HTTP-Response-Metadata."
        "HTML-Metadata.Links"
    )
    raw = wat.select(
        "doc_id",
        F.col(uri_col).alias("target_uri"),
        F.transform(
            F.coalesce(
                F.try_variant_get(
                    F.col(metadata_col), links_path, "array<variant>"
                ),
                F.array().cast("array<variant>"),
            ),
            lambda l: F.try_variant_get(l, "$.url", "string"),
        ).alias("_urls"),
    )
    return raw.select(
        "doc_id",
        "target_uri",
        F.explode(
            _normalize_links_udf()(F.col("_urls"), F.col("target_uri"))
        ).alias("outlink"),
    )


def read_wet_text(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    **kwargs: Any,
) -> DataFrame:
    """WET entry point for pretraining pipelines: ``conversion``
    records (Common Crawl's extracted plain text) as
    ``(doc_id, text, url, date, path)`` — drop-in input for the
    textstats / dedup / sampling operators. Only conversion records
    cross the Arrow boundary. A custom ``id_col`` passed through
    ``kwargs`` names the output id column too (r9 review finding).

    FUSED (r11 verdict #2): rides ``read_warc(decode="utf8")``, so the
    text — which for WET IS the whole product — is decoded inside the
    parser pass and crosses Arrow exactly once; the old shape shipped
    the binary payload out and re-ingested it through a second pandas
    UDF, serializing the full corpus twice. Same decode rule
    (:func:`_utf8_total`), so output is byte-identical to the composed
    expression (pinned in ``tests/test_warc_source.py``)."""
    if "record_types" in kwargs or "decode" in kwargs:
        raise TypeError(
            "read_wet_text selects record_types='conversion' and "
            "decode='utf8' by definition — use read_warc for other "
            "record types or the raw binary payload"
        )
    id_col = kwargs.get("id_col", "doc_id")
    recs = read_warc(
        spark, path, record_types=["conversion"], decode="utf8", **kwargs
    )
    return recs.select(
        id_col,
        F.col("payload_text").alias(text_col),
        F.col("target_uri").alias("url"),
        "date",
        "path",
    )


def read_wat_metadata(
    spark: SparkSession,
    path: str,
    **kwargs: Any,
) -> DataFrame:
    """WAT entry point: ``metadata`` records (Common Crawl's per-page
    JSON envelopes — HTTP headers, detected links, title) as
    ``(doc_id, url, date, metadata, path)`` where ``metadata`` is a
    Spark 4 VARIANT (``try_parse_json`` — malformed envelopes become
    NULL, never a failed job). Shred fields with
    ``variant_get(metadata, '$.Envelope.WARC-Header-Metadata', ...)``;
    Catalyst prunes the shredding into the scan-side projection. A
    custom ``id_col`` in ``kwargs`` names the output id column too.

    FUSED (r11 verdict #2): the JSON envelope is decoded inside the
    parser pass (``read_warc(decode="utf8")``) and crosses Arrow once
    as a string; ``try_parse_json`` then runs JVM-side — the old shape
    round-tripped the payload through a second pandas UDF."""
    if "record_types" in kwargs or "decode" in kwargs:
        raise TypeError(
            "read_wat_metadata selects record_types='metadata' and "
            "decode='utf8' by definition — use read_warc for other "
            "record types or the raw binary payload"
        )
    id_col = kwargs.get("id_col", "doc_id")
    recs = read_warc(
        spark, path, record_types=["metadata"], decode="utf8", **kwargs
    )
    return recs.select(
        id_col,
        F.col("target_uri").alias("url"),
        "date",
        F.try_parse_json(F.col("payload_text")).alias("metadata"),
        "path",
    )


__all__ = [
    "RECORD_SCHEMA",
    "RECORD_TEXT_SCHEMA",
    "strip_file_scheme",
    "iter_warc_records",
    "read_warc",
    "warc_html_responses",
    "warc_outlinks",
    "warc_outlink_edges",
    "extract_outlinks",
    "read_wet_text",
    "read_wat_metadata",
    "wat_outlinks",
]
