"""S3 WARC/WET source tests (reference: edu/cmu/lemurproject/*.java).

Synthetic WARC fixtures are built byte-by-byte per ISO 28500 so the
framing math (Content-Length, CRLF separators, multi-member gzip) is
exercised for real, including the damage cases the reference's
resync-scan tolerates.
"""

from __future__ import annotations

import gzip
import io
import os

import pytest

from sparksearchengine_spark.sources.warc import (
    extract_outlinks,
    iter_warc_records,
    read_warc,
    read_wat_metadata,
    read_wet_text,
    warc_html_responses,
    warc_outlink_edges,
    warc_outlinks,
    wat_outlinks,
)

HTML = (
    b"<html><head><title>t</title></head><body>"
    b'<a href="/rel/page.html">rel</a> '
    b'<a href="http://other.example/x?track=1">q</a> '
    b'<A HREF="http://other.example/x">dup-after-strip</A> '
    b'<area shape="rect" href="https://maps.example/a">'
    b'<frame src="http://frames.example/f">'
    b'<iframe src="http://iframes.example/i"></iframe>'
    b'<a href="mailto:x@example.com">mail</a>'
    b'<a href="http://base.example/page">self</a>'
    b"</body></html>"
)


def _record(rtype: str, uri: str, payload: bytes, rid: str, version: str = "1.0",
            extra: dict[str, str] | None = None) -> bytes:
    hdr = [f"WARC/{version}".encode()]
    hdr.append(b"WARC-Type: " + rtype.encode())
    if uri:
        hdr.append(b"WARC-Target-URI: " + uri.encode())
    hdr.append(b"WARC-Date: 2026-08-16T00:00:00Z")
    hdr.append(b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">")
    for k, v in (extra or {}).items():
        hdr.append(f"{k}: {v}".encode())
    ct = b"application/http; msgtype=response" if rtype == "response" else b"text/plain"
    hdr.append(b"Content-Type: " + ct)
    hdr.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(hdr) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http_response(body: bytes, status: int = 200,
                   ctype: str = "text/html; charset=UTF-8") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


def _records() -> list[bytes]:
    return [
        _record("warcinfo", "", b"software: test\r\n", "info-1"),
        _record("response", "http://base.example/page",
                _http_response(HTML), "resp-1",
                extra={"WARC-TREC-ID": "clueweb09-en0000-00-00001"}),
        _record("request", "http://base.example/page",
                b"GET /page HTTP/1.1\r\nHost: base.example\r\n\r\n", "req-1"),
        _record("conversion", "http://base.example/page",
                "extracted plain text é中".encode("utf-8"), "conv-1"),
        # WAT-style JSON envelope (metadata record)
        _record("metadata", "http://base.example/page",
                b'{"Envelope":{"WARC-Header-Length":"210",'
                b'"Payload-Metadata":{"Trailing-Slop-Length":"4"}}}',
                "wat-1"),
        # ClueWeb pins WARC/0.18 (WarcRecord.java:70) — must still parse
        _record("metadata", "http://base.example/page",
                b"fetchTimeMs: 12\r\n", "meta-1", version="0.18"),
    ]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    recs = _records()
    (d / "a.warc").write_bytes(b"".join(recs))
    # Common Crawl layout: one gzip member per record
    with open(d / "b.warc.gz", "wb") as f:
        for r in recs:
            f.write(gzip.compress(r))
    return str(d)


# ---------------------------------------------------------------- parser


class TestIterWarcRecords:
    def test_all_records_parse(self):
        recs = list(iter_warc_records(io.BytesIO(b"".join(_records()))))
        assert [r["record_type"] for r in recs] == [
            "warcinfo", "response", "request", "conversion", "metadata",
            "metadata",
        ]
        resp = recs[1]
        assert resp["target_uri"] == "http://base.example/page"
        assert resp["headers"]["WARC-TREC-ID"] == "clueweb09-en0000-00-00001"
        assert resp["payload"] == _http_response(HTML)
        assert resp["content_length"] == len(_http_response(HTML))
        # offsets are record starts, strictly increasing
        offs = [r["offset"] for r in recs]
        assert offs == sorted(offs) and len(set(offs)) == 6
        assert not any(r["truncated"] for r in recs)

    def test_leading_junk_and_inter_record_damage_resync(self):
        recs = _records()
        blob = b"JUNK\r\nnot a record\r\n" + recs[0] + b"garbage bytes\r\n" + recs[1]
        out = list(iter_warc_records(io.BytesIO(blob)))
        assert [r["record_type"] for r in out] == ["warcinfo", "response"]

    def test_truncated_final_record_dropped(self):
        recs = _records()
        blob = recs[0] + recs[1][: len(recs[1]) // 2]
        out = list(iter_warc_records(io.BytesIO(blob)))
        assert [r["record_type"] for r in out] == ["warcinfo"]

    def test_missing_content_length_skipped(self):
        bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
        blob = bad + _records()[0]
        out = list(iter_warc_records(io.BytesIO(blob)))
        assert [r["record_type"] for r in out] == ["warcinfo"]

    def test_type_filter_and_payload_cap(self):
        blob = b"".join(_records())
        out = list(
            iter_warc_records(
                io.BytesIO(blob),
                record_types=frozenset({"response"}),
                max_payload_bytes=10,
            )
        )
        assert len(out) == 1 and out[0]["truncated"]
        assert out[0]["payload"] == _http_response(HTML)[:10]
        # records AFTER the capped one still frame correctly
        out2 = list(iter_warc_records(io.BytesIO(blob), max_payload_bytes=10))
        assert len(out2) == 6

    def test_multimember_gzip_stream(self):
        gz = b"".join(gzip.compress(r) for r in _records())
        out = list(iter_warc_records(gzip.GzipFile(fileobj=io.BytesIO(gz))))
        assert len(out) == 6


class TestWarcFramingLaws:
    """Hypothesis round-trip: serialize random records per ISO 28500,
    parse, compare. The adversarial part: payloads that CONTAIN the
    ``WARC/`` magic, bare CR/LF, or full fake record headers — framing
    is by Content-Length, so none of that may trigger a resync."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _payloads = st.binary(min_size=0, max_size=300)
    _adversarial = st.sampled_from([
        b"WARC/1.0\r\nWARC-Type: response\r\n",
        b"\r\n\r\nWARC/0.18\r\n",
        b"Content-Length: 999\r\n\r\n",
        b"\r\n" * 10,
        b"\x00\xff" * 50,
    ])
    _types = st.sampled_from(["response", "request", "conversion",
                              "metadata", "warcinfo"])

    @staticmethod
    def _serialize(recs):
        out = []
        for i, (rtype, payload) in enumerate(recs):
            out.append(
                f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
                f"WARC-Record-ID: <urn:uuid:{i}>\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n".encode()
                + payload + b"\r\n\r\n"
            )
        return b"".join(out)

    @given(recs=st.lists(
        st.tuples(_types, st.one_of(_payloads, _adversarial)),
        min_size=0, max_size=8,
    ))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, recs):
        parsed = list(iter_warc_records(io.BytesIO(self._serialize(recs))))
        assert [(r["record_type"], r["payload"]) for r in parsed] == recs
        offs = [r["offset"] for r in parsed]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)

    @given(
        recs=st.lists(st.tuples(_types, _payloads), min_size=1, max_size=4),
        cut=st.integers(min_value=1, max_value=10_000),
    )
    @settings(max_examples=200, deadline=None)
    def test_truncation_never_yields_partial_payload(self, recs, cut):
        blob = self._serialize(recs)
        parsed = list(iter_warc_records(io.BytesIO(blob[: max(0, len(blob) - cut)])))
        # every parsed record is a byte-exact prefix of the true sequence
        assert len(parsed) <= len(recs)
        for got, want in zip(parsed, recs):
            assert (got["record_type"], got["payload"]) == want


class TestWarcMutationFuzz:
    """r11 verdict #7: the framing laws above cover well-formed
    records; real crawl WARCs are dirty. These mutations (inter-record
    garbage, corrupted Content-Length, LF-only 0.18 framing,
    mid-header EOF) assert the parser RESYNCS OR SKIPS — terminating,
    never yielding a partial record, and never attributing one intact
    record's payload bytes to another intact record."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    # payload/garbage free of the resync magic: the parser's documented
    # (reference-parity) limitation is that a magic LINE inside damaged
    # regions is treated as a record start — these laws are about
    # recovery around damage, not about forging records inside it
    _clean = st.binary(min_size=0, max_size=200).filter(
        lambda b: b"WARC/" not in b
    )
    _garbage = st.binary(min_size=1, max_size=120).filter(
        lambda b: b"WARC/" not in b
    )

    @staticmethod
    def _serialize(payloads, eol=b"\r\n", version="1.0"):
        out = []
        for i, payload in enumerate(payloads):
            out.append(
                eol.join([
                    f"WARC/{version}".encode(),
                    b"WARC-Type: response",
                    b"WARC-Record-ID: <urn:uuid:" + str(i).encode() + b">",
                    b"Content-Length: " + str(len(payload)).encode(),
                    b"", b"",
                ])
                + payload + eol + eol
            )
        return out

    @staticmethod
    def _rid(rec):
        return int(rec["record_id"].strip("<>").rpartition(":")[2])

    @given(
        payloads=st.lists(_clean, min_size=1, max_size=5),
        garbage=st.lists(_garbage, min_size=1, max_size=5),
        data=st.data(),
    )
    @settings(max_examples=150, deadline=None)
    def test_line_bounded_garbage_between_records_skipped(
        self, payloads, garbage, data
    ):
        """Inter-record damage ending on a line boundary loses NO
        records: the scanner walks lines to the next magic."""
        recs = self._serialize(payloads)
        blob = b""
        for r in recs:
            for g in data.draw(
                self.st.lists(
                    self.st.sampled_from(garbage), min_size=0, max_size=2
                )
            ):
                blob += g + b"\r\n"
            blob += r
        parsed = list(iter_warc_records(io.BytesIO(blob)))
        assert [r["payload"] for r in parsed] == payloads

    @given(
        payloads=st.lists(_clean, min_size=2, max_size=5),
        data=st.data(),
    )
    @settings(max_examples=150, deadline=None)
    def test_corrupt_content_length_never_misattributes(
        self, payloads, data
    ):
        """One record's Content-Length is replaced by an arbitrary
        value (short, long, overshooting into later records, or
        non-numeric). The parser terminates; every OTHER surviving
        record is byte-exact; record order is preserved."""
        k = data.draw(
            self.st.integers(min_value=0, max_value=len(payloads) - 1)
        )
        recs = self._serialize(payloads)
        total = sum(len(r) for r in recs)
        bad_len = data.draw(
            self.st.one_of(
                self.st.integers(min_value=0, max_value=total),
                self.st.just("xyz"),
            )
        )
        good = b"Content-Length: " + str(len(payloads[k])).encode()
        recs[k] = recs[k].replace(
            good, b"Content-Length: " + str(bad_len).encode(), 1
        )
        parsed = list(iter_warc_records(io.BytesIO(b"".join(recs))))
        ids = [self._rid(r) for r in parsed]
        assert ids == sorted(set(ids)), "records out of order/duplicated"
        for rec, rid in zip(parsed, ids):
            if rid != k:
                assert rec["payload"] == payloads[rid], (
                    "intact record mis-attributed payload bytes"
                )

    @given(payloads=st.lists(_clean, min_size=1, max_size=5))
    @settings(max_examples=100, deadline=None)
    def test_lf_only_warc018_parses(self, payloads):
        """ClueWeb-era WARC/0.18 written with bare-LF line endings
        (no CR) must round-trip — header parse strips per line."""
        blob = b"".join(self._serialize(payloads, eol=b"\n", version="0.18"))
        parsed = list(iter_warc_records(io.BytesIO(blob)))
        assert [r["payload"] for r in parsed] == payloads

    @given(
        payloads=st.lists(_clean, min_size=2, max_size=5),
        cut_in_header=st.integers(min_value=1, max_value=60),
    )
    @settings(max_examples=100, deadline=None)
    def test_mid_header_eof_drops_only_final_record(
        self, payloads, cut_in_header
    ):
        """EOF inside the LAST record's header block: all prior
        records parse byte-exact, the cut one never appears."""
        recs = self._serialize(payloads)
        head_len = recs[-1].find(b"\r\n\r\n")
        cut = min(cut_in_header, head_len)
        blob = b"".join(recs[:-1]) + recs[-1][:cut]
        parsed = list(iter_warc_records(io.BytesIO(blob)))
        assert [r["payload"] for r in parsed] == payloads[:-1]


# ------------------------------------------------------------- outlinks


class TestExtractOutlinks:
    def test_reference_normalization(self):
        links = extract_outlinks(
            HTML.decode("latin-1"), "http://base.example/page"
        )
        # relative resolved; ?query stripped (dedups with the bare URL);
        # area/frame/iframe captured; mailto and self-link dropped
        assert links == [
            "http://base.example/rel/page.html",
            "http://other.example/x",
            "https://maps.example/a",
            "http://frames.example/f",
            "http://iframes.example/i",
        ]

    def test_empty_and_none_safe(self):
        assert extract_outlinks("", "http://b.example/") == []
        assert extract_outlinks("<a href=''>x</a>", "http://b.example/") == []

    def test_falsy_base_uri_yields_nothing(self):
        """Reference parity (r9 ADVICE): getURLOutlinks builds every
        candidate via URL(new URL(uri), link) — a null/empty record URI
        fails that constructor, so NO outlinks, not even absolute ones."""
        html = '<a href="http://abs.example/x">x</a>'
        assert extract_outlinks(html, "") == []
        assert extract_outlinks(html, None) == []

    def test_pattern_fallthrough_on_same_tag(self):
        """Reference hasAdded semantics (WarcHTMLResponseRecord.java:
        128-150): a pattern match that ADDS nothing (bad scheme, dup)
        falls through to the next pattern on the same tag."""
        html = '<frame href="javascript:void(0)" src="http://f.example/x">'
        assert extract_outlinks(html, "http://b.example/") == [
            "http://f.example/x"
        ]


# ----------------------------------------------------------- spark side


class TestReadWarc:
    def test_plain_and_gzip_agree(self, spark, warc_dir):
        df = read_warc(spark, warc_dir)
        rows = df.collect()
        assert len(rows) == 12  # 6 records × 2 files
        by_file: dict[str, list] = {}
        for r in rows:
            by_file.setdefault(os.path.basename(r.path).split(".")[0], []).append(r)
        a = sorted(by_file["a"], key=lambda r: r.offset)
        b = sorted(by_file["b"], key=lambda r: r.offset)
        for ra, rb in zip(a, b):
            assert (ra.record_type, ra.target_uri, ra.payload) == (
                rb.record_type, rb.target_uri, rb.payload,
            )
        # doc_id deterministic across reruns, unique per record
        again = {r.doc_id for r in read_warc(spark, warc_dir).collect()}
        assert again == {r.doc_id for r in rows} and len(again) == 12

    def test_type_filter_pre_arrow(self, spark, warc_dir):
        df = read_warc(spark, warc_dir, record_types=["conversion"])
        assert df.count() == 2
        assert set(df.select("record_type").distinct().toPandas()["record_type"]) == {
            "conversion"
        }

    def test_html_responses_and_outlinks(self, spark, warc_dir):
        resp = warc_html_responses(read_warc(spark, warc_dir))
        rows = resp.collect()
        assert len(rows) == 2
        assert all(r.http_status == 200 for r in rows)
        assert all(r.trec_id == "clueweb09-en0000-00-00001" for r in rows)
        assert all("<html>" in r.html and "rel</a>" in r.html for r in rows)
        edges = warc_outlinks(resp).collect()
        per_doc: dict = {}
        for e in edges:
            per_doc.setdefault(e.doc_id, []).append(e.outlink)
        assert len(per_doc) == 2
        for links in per_doc.values():
            assert links == [
                "http://base.example/rel/page.html",
                "http://other.example/x",
                "https://maps.example/a",
                "http://frames.example/f",
                "http://iframes.example/i",
            ]

    def test_bz2_opener(self, spark, tmp_path):
        import bz2 as _bz2

        (tmp_path / "c.warc.bz2").write_bytes(
            _bz2.compress(b"".join(_records()))
        )
        assert read_warc(spark, str(tmp_path)).count() == 6

    def test_zst_errors_loudly_without_lib(self, spark, tmp_path):
        (tmp_path / "d.warc.zst").write_bytes(b"\x28\xb5\x2f\xfd junk")
        try:
            import zstandard  # noqa: F401
        except ImportError:
            df = read_warc(spark, str(tmp_path))
            with pytest.raises(Exception, match="zstandard"):
                df.count()

    def test_wat_metadata_variant(self, spark, warc_dir):
        from pyspark.sql import functions as F

        wat = read_wat_metadata(spark, warc_dir)
        rows = wat.withColumn(
            "hlen",
            F.variant_get("metadata", "$.Envelope.WARC-Header-Length", "int"),
        ).collect()
        # 2 files × 2 metadata records; the JSON envelope shreds, the
        # non-JSON (warc-fields) one is NULL via try_parse_json
        assert len(rows) == 4
        hlens = sorted((r.hlen for r in rows), key=lambda x: (x is None, x))
        assert hlens == [210, 210, None, None]

    def test_charset_sniffing(self, spark, tmp_path):
        """Body decode honors the HTTP charset header; falls back to
        UTF-8 then latin-1, never throws."""
        cases = [
            # (uri, http content-type, body bytes, expected substring)
            ("http://e.x/sjis", "text/html; charset=shift_jis",
             "<html>日本語</html>".encode("shift_jis"), "日本語"),
            ("http://e.x/utf8", "text/html",
             "<html>héllo 中</html>".encode("utf-8"), "héllo 中"),
            ("http://e.x/l1", "text/html; charset=not-a-charset",
             b"<html>caf\xe9</html>", "caf\xe9"),  # invalid utf-8 -> latin-1
        ]
        recs = []
        for uri, ct, body, _ in cases:
            http = (f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n\r\n").encode() + body
            recs.append(_record("response", uri, http, uri))
        (tmp_path / "cs.warc").write_bytes(b"".join(recs))
        got = {
            r.target_uri: r.html
            for r in warc_html_responses(
                read_warc(spark, str(tmp_path))
            ).collect()
        }
        for uri, _, _, want in cases:
            assert want in got[uri], (uri, got[uri])

    def test_wat_outlinks_match_html_rules(self, spark, tmp_path):
        """WAT-envelope links normalize under the SAME rules as the
        HTML path: relative resolve, query strip, http-only, self-drop,
        dedup — the two edge sources must be interchangeable."""
        import json as _json

        env = {
            "Envelope": {
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": [
                                {"url": "/rel/page.html", "path": "A@/href"},
                                {"url": "http://other.example/x?track=1"},
                                {"url": "http://other.example/x"},
                                {"url": "mailto:x@example.com"},
                                {"url": "http://base.example/page"},
                                {"path": "no-url-key"},
                            ]
                        }
                    }
                }
            }
        }
        rec = _record(
            "metadata", "http://base.example/page",
            _json.dumps(env).encode(), "wat-links-1",
        )
        (tmp_path / "w.warc").write_bytes(rec)
        wat = read_wat_metadata(spark, str(tmp_path))
        edges = wat_outlinks(wat).collect()
        assert [e.outlink for e in edges] == [
            "http://base.example/rel/page.html",
            "http://other.example/x",
        ]
        # a WAT record with NO links yields zero edges, not a crash
        rec2 = _record("metadata", "http://e.x/none", b"{}", "wat-links-2")
        (tmp_path / "w2.warc").write_bytes(rec2)
        assert (
            wat_outlinks(read_wat_metadata(spark, str(tmp_path))).count() == 2
        )

    def test_wet_text(self, spark, warc_dir):
        wet = read_wet_text(spark, warc_dir)
        rows = wet.collect()
        assert len(rows) == 2
        assert all(r.text == "extracted plain text é中" for r in rows)
        assert all(r.url == "http://base.example/page" for r in rows)

    def test_wet_custom_id_col(self, spark, warc_dir):
        wet = read_wet_text(spark, warc_dir, id_col="rec_id")
        assert "rec_id" in wet.columns and wet.count() == 2

    def test_wet_wat_reject_record_types_kwarg(self, spark, warc_dir):
        """Both entry points hardcode their record type; forwarding a
        caller's record_types used to die as an opaque 'multiple values
        for argument' TypeError (r9 ADVICE) — now a clear message."""
        import pytest

        with pytest.raises(TypeError, match="read_wet_text selects"):
            read_wet_text(spark, warc_dir, record_types=["response"])
        with pytest.raises(TypeError, match="read_wat_metadata selects"):
            read_wat_metadata(spark, warc_dir, record_types=["response"])

    def test_http2_status_line(self, spark, tmp_path):
        body = b"HTTP/2 200\r\ncontent-type: text/html\r\n\r\n<html>x</html>"
        (tmp_path / "h2.warc").write_bytes(
            _record("response", "http://e.x/h2", body, "h2-1")
        )
        rows = warc_html_responses(read_warc(spark, str(tmp_path))).collect()
        assert len(rows) == 1 and rows[0].http_status == 200

    def test_feeds_downstream_pipeline(self, spark, warc_dir):
        """WET output is a drop-in documents frame: run a real textstats
        operator over it (the integration the source exists for)."""
        from sparksearchengine_spark.operators.textstats import token_stats

        wet = read_wet_text(spark, warc_dir)
        out = token_stats(wet, text_col="text").collect()
        assert len(out) == 2 and all(r.n_tokens >= 3 for r in out)


class TestFusedDecode:
    """r11 verdict #2: ``read_warc(decode="utf8")`` decodes inside the
    parser pass (payload crosses Arrow ONCE); must be byte-identical to
    the composed read_warc -> _utf8_udf round-trip, including mojibake."""

    @staticmethod
    def _composed(spark, path, rtypes):
        from pyspark.sql import functions as F

        from sparksearchengine_spark.sources.warc import _utf8_udf

        return (
            read_warc(spark, path, record_types=rtypes)
            .withColumn("payload_text", _utf8_udf()(F.col("payload")))
            .drop("payload")
        )

    def test_fused_equals_composed_all_types(self, spark, warc_dir):
        fused = read_warc(spark, warc_dir, decode="utf8")
        composed = self._composed(spark, warc_dir, None)
        assert sorted(fused.columns) == sorted(composed.columns)
        key = lambda d: (d["path"], d["offset"])  # noqa: E731
        frows = sorted((r.asDict() for r in fused.collect()), key=key)
        crows = sorted((r.asDict() for r in composed.collect()), key=key)
        assert frows == crows and len(frows) == 12
        assert "payload" not in fused.columns

    def test_mojibake_parity(self, spark, tmp_path):
        """Invalid UTF-8 must take the SAME replacement-char path fused
        and composed (the decode rule is one shared function)."""
        bad = b"caf\xe9 \xff\xfe latin"
        (tmp_path / "m.warc").write_bytes(
            _record("conversion", "http://e.x/m", bad, "moji-1")
        )
        fused = read_warc(spark, str(tmp_path), decode="utf8").collect()
        composed = self._composed(spark, str(tmp_path), None).collect()
        assert len(fused) == 1
        assert fused[0].payload_text == composed[0].payload_text
        assert "�" in fused[0].payload_text
        wet = read_wet_text(spark, str(tmp_path)).collect()
        assert wet[0].text == fused[0].payload_text

    def test_bad_decode_mode_raises(self, spark, warc_dir):
        import pytest

        with pytest.raises(ValueError, match="decode"):
            read_warc(spark, warc_dir, decode="latin1")

    def test_wet_wat_reject_decode_kwarg(self, spark, warc_dir):
        import pytest

        with pytest.raises(TypeError, match="read_wet_text selects"):
            read_wet_text(spark, warc_dir, decode=None)
        with pytest.raises(TypeError, match="read_wat_metadata selects"):
            read_wat_metadata(spark, warc_dir, decode=None)

    def test_single_python_eval_in_plan(self, spark, warc_dir):
        """The fused WET plan must contain exactly ONE Python-worker
        stage (the parser) — no second pandas-UDF eval re-ingesting the
        payload (the double-crossing this path exists to remove)."""
        plan = read_wet_text(spark, warc_dir)._jdf.queryExecution().executedPlan().toString()
        evals = plan.count("MapInPandas") + plan.count("ArrowEvalPython")
        assert evals == 1, plan


# ------------------------------------------------------- scale contracts


class TestFusedOutlinkEdges:
    """r10 verdict #1: the fused single-Arrow-pass crawl-graph path
    must produce EXACTLY the composed read_warc -> warc_html_responses
    -> warc_outlinks edge set (parity-by-construction via the shared
    helpers, pinned here on real fixtures)."""

    @staticmethod
    def _edge_set(df):
        return {
            (r.doc_id, r.target_uri, r.outlink)
            for r in df.select("doc_id", "target_uri", "outlink").collect()
        }

    def test_fused_equals_composed(self, spark, warc_dir):
        composed = warc_outlinks(
            warc_html_responses(read_warc(spark, warc_dir))
        )
        fused = warc_outlink_edges(spark, warc_dir)
        assert self._edge_set(fused) == self._edge_set(composed)
        assert len(self._edge_set(fused)) == 10  # 2 docs x 5 outlinks

    def test_fused_equals_composed_mixed_corpus(self, spark, tmp_path):
        """Mixed fixture: html with charset, NON-html response (json),
        headerless-body html, empty-body response — parity on both
        html_only settings, including the content-type-vs-<html filter
        clauses."""
        recs = [
            _record(
                "response", "http://a.example/1",
                _http_response(
                    '<html><a href="/x">é</a></html>'.encode("iso-8859-1"),
                    ctype="text/html; charset=ISO-8859-1",
                ),
                "r-1",
            ),
            _record(
                "response", "http://a.example/2",
                _http_response(b'{"a": 1}', ctype="application/json"),
                "r-2",
            ),
            # no HTTP header block at all: whole payload is body, kept
            # by the <html clause only
            _record(
                "response", "http://a.example/3",
                b'<HTML><a href="http://b.example/y">y</a></HTML>',
                "r-3",
            ),
            _record(
                "response", "http://a.example/4",
                _http_response(b"", ctype="text/plain"),
                "r-4",
            ),
            # json body that still LOOKS like html (regex clause fires)
            _record(
                "response", "http://a.example/5",
                _http_response(
                    b'x <html> <a href="http://c.example/z?q=1#f">z</a>',
                    ctype="application/octet-stream",
                ),
                "r-5",
            ),
        ]
        with open(tmp_path / "m.warc.gz", "wb") as f:
            for r in recs:
                f.write(gzip.compress(r))
        for html_only in (True, False):
            composed = warc_outlinks(
                warc_html_responses(
                    read_warc(spark, str(tmp_path)), html_only=html_only
                )
            )
            fused = warc_outlink_edges(
                spark, str(tmp_path), html_only=html_only
            )
            assert self._edge_set(fused) == self._edge_set(composed), (
                f"html_only={html_only}"
            )
        # the html_only=True set is the 3 htmlish docs' edges
        uris = {u for _, u, _ in self._edge_set(
            warc_outlink_edges(spark, str(tmp_path))
        )}
        assert uris == {
            "http://a.example/1", "http://a.example/3", "http://a.example/5"
        }

    def test_fused_doc_ids_join_back_to_records(self, spark, warc_dir):
        """doc_id is xxhash64(path, offset) in BOTH paths — fused edges
        must join back onto the read_warc record frame losslessly."""
        recs = read_warc(spark, warc_dir).select("doc_id", "record_type")
        fused = warc_outlink_edges(spark, warc_dir)
        joined = fused.join(recs, "doc_id", "inner")
        assert joined.count() == fused.count()
        assert {
            r.record_type for r in joined.select("record_type").distinct().collect()
        } == {"response"}

    def test_empty_glob(self, spark, tmp_path):
        (tmp_path / "empty").mkdir()
        out = warc_outlink_edges(spark, str(tmp_path / "empty"))
        assert out.columns == ["doc_id", "target_uri", "outlink"]
        assert out.count() == 0

    def test_counting_opener_one_open_per_file(self, spark, tmp_path):
        """The opener= seam (object-store injection point, r10 verdict
        #6): a counting opener sees EXACTLY one open per listed file —
        the fused path adds no extra passes over the bytes. The counter
        is file-system-based because the opener runs in Python worker
        PROCESSES, not the driver."""
        d = tmp_path / "w"
        d.mkdir()
        for i in range(3):
            (d / f"f{i}.warc.gz").write_bytes(
                gzip.compress(
                    _record(
                        "response", f"http://e.x/{i}",
                        _http_response(HTML), f"r-{i}",
                    )
                )
            )
        marks = tmp_path / "opened"
        marks.mkdir()

        def counting_opener(path):
            import os as _os
            import uuid as _uuid

            from sparksearchengine_spark.sources.warc import (
                strip_file_scheme,
            )

            base = os.path.basename(path)
            # collision-proof marker (pid + uuid): two concurrent opens
            # of the SAME file must leave two markers, not overwrite one
            (marks / f"{base}.{_os.getpid()}.{_uuid.uuid4().hex}").touch()
            return gzip.open(strip_file_scheme(path), "rb")

        edges = warc_outlink_edges(spark, str(d), opener=counting_opener)
        # 6 per doc: the fixture's base.example "self" link is not a
        # self-link under these target URIs
        assert edges.count() == 3 * 6
        opens_per_file = {
            f"f{i}.warc.gz": len(list(marks.glob(f"f{i}.warc.gz.*")))
            for i in range(3)
        }
        assert opens_per_file == {
            "f0.warc.gz": 1, "f1.warc.gz": 1, "f2.warc.gz": 1
        }


class TestWarcScale:
    """r9 verdict #5: the one-file-per-task contract and the payload
    byte bound, exercised at a realistic fan-out instead of 2 fixtures."""

    def test_one_task_per_file_at_200_files(self, spark, tmp_path):
        """parallelize(numSlices=len(paths)) must give EXACTLY one task
        per .warc.gz (the Common Crawl layout: gzip is unsplittable, so
        a task IS a file) — no empty tasks, no multi-file stragglers."""
        from pyspark.sql import functions as F

        d = tmp_path / "many"
        d.mkdir()
        n = 200
        for i in range(n):
            (d / f"f{i:03d}.warc.gz").write_bytes(
                gzip.compress(
                    _record(
                        "conversion", f"http://e.x/{i}", b"tiny", f"c-{i}"
                    )
                )
            )
        df = read_warc(spark, str(d))
        rows = df.select(
            F.spark_partition_id().alias("pid"), "path"
        ).collect()
        assert len(rows) == n
        by_pid: dict[int, set[str]] = {}
        for r in rows:
            by_pid.setdefault(r.pid, set()).add(r.path)
        # task count == file count, and each task read exactly one file
        assert len(by_pid) == n
        assert all(len(paths) == 1 for paths in by_pid.values())

    def test_fused_path_keeps_one_task_per_file(self, spark, tmp_path):
        """warc_outlink_edges inherits read_warc's parallelism contract
        (shared _paths_frame): at 60 files, every file's edges come
        from its own task — no empty tasks, no multi-file stragglers."""
        from pyspark.sql import functions as F

        d = tmp_path / "fused_many"
        d.mkdir()
        n = 60
        for i in range(n):
            (d / f"f{i:03d}.warc.gz").write_bytes(
                gzip.compress(
                    _record(
                        "response", f"http://h{i}.x/p",
                        _http_response(
                            f'<html><a href="http://t{i}.x/q">l</a>'
                            f"</html>".encode()
                        ),
                        f"r-{i}",
                    )
                )
            )
        edges = warc_outlink_edges(spark, str(d))
        rows = edges.select(
            F.spark_partition_id().alias("pid"), "target_uri"
        ).collect()
        assert len(rows) == n  # one outlink per file
        by_pid: dict[int, set[str]] = {}
        for r in rows:
            by_pid.setdefault(r.pid, set()).add(r.target_uri)
        assert len(by_pid) == n
        assert all(len(uris) == 1 for uris in by_pid.values())

    def test_oversized_record_truncated_not_inflated(self, spark, tmp_path):
        """A record past max_payload_bytes crosses the Arrow boundary
        CAPPED (truncated=true, payload == exactly the cap, original
        content_length preserved) — it must not inflate a batch — and
        the parser resyncs so the NEXT record still parses."""
        big = b"x" * (1 << 20)
        blob = _record("conversion", "http://e.x/big", big, "big-1")
        blob += _record("conversion", "http://e.x/after", b"small", "s-1")
        (tmp_path / "big.warc").write_bytes(blob)
        df = read_warc(spark, str(tmp_path), max_payload_bytes=1024)
        rows = {r.target_uri: r for r in df.collect()}
        assert set(rows) == {"http://e.x/big", "http://e.x/after"}
        b = rows["http://e.x/big"]
        assert b.truncated is True
        assert len(b.payload) == 1024
        assert b.content_length == len(big)
        a = rows["http://e.x/after"]
        assert a.truncated is False and bytes(a.payload) == b"small"
