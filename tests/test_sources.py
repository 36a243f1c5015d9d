"""Sources: Wikipedia XML dump parsing (S1) + corpus parquet round-trip (S2)."""

from __future__ import annotations

import textwrap

import pytest


DUMP = textwrap.dedent(
    """\
    <mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
      <siteinfo><sitename>Wikipedia</sitename></siteinfo>
      <page>
        <title>Island</title>
        <ns>0</ns>
        <id>1</id>
        <revision>
          <id>100</id>
          <text xml:space="preserve">An '''island''' is land surrounded by [[water|the sea]]. {{cite book}}</text>
        </revision>
      </page>
      <page>
        <title>Isle</title>
        <ns>0</ns>
        <id>2</id>
        <redirect title="Island" />
        <revision>
          <id>101</id>
          <text xml:space="preserve">#REDIRECT [[Island]]</text>
        </revision>
      </page>
      <page>
        <title>Sea</title>
        <ns>0</ns>
        <id>3</id>
        <revision>
          <id>102</id>
          <text xml:space="preserve">The &lt;b&gt;sea&lt;/b&gt; connects here.
    == Oceans ==
    More text.</text>
        </revision>
      </page>
    </mediawiki>
    """
)


def _write_dump(tmp_path) -> str:
    p = tmp_path / "dump.xml"
    p.write_text(DUMP)
    return str(p)


class TestWikipediaSource:
    def test_pages_extracted_redirects_dropped(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_wikipedia_dump

        df = read_wikipedia_dump(spark, _write_dump(tmp_path))
        rows = {r["title"]: r["text"] for r in df.collect()}
        assert set(rows) == {"Island", "Sea"}  # redirect "Isle" dropped
        assert "island" in rows["Island"].lower()

    def test_keep_redirects(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_wikipedia_dump

        df = read_wikipedia_dump(spark, _write_dump(tmp_path), keep_redirects=True)
        assert df.count() == 3

    def test_markup_stripped(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_wikipedia_dump

        df = read_wikipedia_dump(spark, _write_dump(tmp_path), strip_markup=True)
        rows = {r["title"]: r["text"] for r in df.collect()}
        island = rows["Island"]
        assert "'''" not in island and "[[" not in island and "{{" not in island
        assert "the sea" in island  # link label kept
        sea = rows["Sea"]
        assert "<b>" not in sea and "==" not in sea

    def test_indexable_end_to_end(self, spark, tmp_path):
        """Reference example flow: parse dump -> index -> term query."""
        from pyspark.sql import functions as F

        from sparksearchengine_spark import Corpus, Q, TextOptions
        from sparksearchengine_spark.sources import read_wikipedia_dump

        df = read_wikipedia_dump(spark, _write_dump(tmp_path), strip_markup=True)
        df = df.withColumn("doc_id", F.xxhash64("title"))
        idx = Corpus(
            df, id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="simple")},
        ).build_index()
        hits = idx.search(Q.field("text").match_term("island"), k=5,
                          with_elements=True)
        assert {r["title"] for r in hits.collect()} == {"Island"}

    def test_fallback_parser_agrees(self, spark, tmp_path):
        from sparksearchengine_spark.sources.wikipedia import (
            _read_dump_fallback,
            read_wikipedia_dump,
        )

        path = _write_dump(tmp_path)
        native = {
            (r["title"], r["text"])
            for r in read_wikipedia_dump(spark, path).collect()
        }
        fallback = {
            (r["title"], r["text"])
            for r in _read_dump_fallback(
                spark, path, strip_markup=False, keep_redirects=False
            ).collect()
        }
        assert native == fallback


class TestCorpusRoundTrip:
    def test_save_load(self, spark, tmp_path, tiny_corpus):
        from sparksearchengine_spark.sources import load_corpus, save_corpus

        path = str(tmp_path / "corpus")
        save_corpus(tiny_corpus, path)
        back = load_corpus(spark, path)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, tiny_corpus.collect())
        )


class TestJsonlCorpus:
    def _write(self, tmp_path, lines, name="corpus.jsonl"):
        p = tmp_path / name
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_roundtrip_with_ids(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_jsonl_corpus

        path = self._write(tmp_path, [
            '{"doc_id": 1, "text": "hello world"}',
            '{"doc_id": 2, "text": "second doc"}',
        ])
        df = read_jsonl_corpus(spark, path)
        rows = {r["doc_id"]: r["text"] for r in df.collect()}
        assert rows == {1: "hello world", 2: "second doc"}

    def test_missing_id_synthesized_deterministically(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_jsonl_corpus

        path = self._write(tmp_path, [
            '{"text": "alpha"}', '{"text": "beta"}',
        ])
        a = {r["text"]: r["doc_id"] for r in read_jsonl_corpus(spark, path).collect()}
        b = {r["text"]: r["doc_id"] for r in read_jsonl_corpus(spark, path).collect()}
        assert a == b and len(set(a.values())) == 2

    def test_schema_mode_catches_corrupt_lines(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_jsonl_corpus
        from pyspark.sql import functions as F

        path = self._write(tmp_path, [
            '{"doc_id": 1, "text": "good"}',
            'this is not json',
        ])
        df = read_jsonl_corpus(
            spark, path,
            schema="doc_id long, text string, _corrupt_record string",
        )
        # Spark disallows filtering a raw JSON scan by _corrupt_record
        # alone (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize first,
        # as the docstring instructs
        rows = df.collect()
        bad = [r for r in rows if r["_corrupt_record"] is not None]
        good = [r for r in rows if r["_corrupt_record"] is None]
        assert len(good) == 1 and len(bad) == 1
        assert good[0]["text"] == "good"

    def test_missing_text_col_raises(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_jsonl_corpus

        path = self._write(tmp_path, ['{"doc_id": 1, "body": "x"}'])
        with pytest.raises(ValueError, match="no 'text' column"):
            read_jsonl_corpus(spark, path)

    def test_indexable_end_to_end(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_jsonl_corpus
        from sparksearchengine_spark import Corpus, Q, TextOptions

        path = self._write(tmp_path, [
            '{"text": "spark is fast"}',
            '{"text": "duck is a bird"}',
        ])
        df = read_jsonl_corpus(spark, path)
        idx = Corpus(df, id_col="doc_id",
                     text_cols={"text": TextOptions()}).build_index()
        hits = idx.search(Q.field("text").match_term("spark"), k=5).collect()
        assert len(hits) == 1


class TestJsonlCorruptCapture:
    def test_malformed_lines_captured_without_explicit_corrupt_col(
        self, spark, tmp_path
    ):
        """r3 review: PERMISSIVE only captures corrupt lines when the
        corrupt-record column is IN the schema; the reader must append it
        so broken lines don't become silent all-NULL rows."""
        from sparksearchengine_spark.sources import read_jsonl_corpus

        p = str(tmp_path / "docs.jsonl")
        with open(p, "w") as fh:
            fh.write('{"doc_id": 1, "text": "good"}\n')
            fh.write("{broken json!!\n")
        from pyspark.sql import functions as F

        df = read_jsonl_corpus(
            spark, p, schema="doc_id long, text string"
        ).cache()
        assert "_corrupt_record" in df.columns
        bad = df.where(F.col("_corrupt_record").isNotNull()).collect()
        assert len(bad) == 1 and "broken" in bad[0]["_corrupt_record"]
        good = df.where(F.col("_corrupt_record").isNull()).collect()
        assert len(good) == 1 and good[0]["text"] == "good"


class TestWikipediaCompressedFallback:
    def test_bz2_dump_fallback_decompresses(self, spark, tmp_path):
        """The regex fallback must decompress .bz2 dumps (binaryFile
        reads raw bytes; before the r3 fix a compressed dump silently
        yielded an empty corpus)."""
        import bz2

        from sparksearchengine_spark.sources.wikipedia import (
            _read_dump_fallback,
        )

        xml = (
            "<mediawiki><page><title>T1</title>"
            "<revision><text>hello world</text></revision></page>"
            "</mediawiki>"
        )
        p = str(tmp_path / "dump.xml.bz2")
        with open(p, "wb") as fh:
            fh.write(bz2.compress(xml.encode()))
        rows = _read_dump_fallback(
            spark, p, strip_markup=False, keep_redirects=True
        ).collect()
        assert len(rows) == 1
        assert rows[0]["title"] == "T1" and rows[0]["text"] == "hello world"


class TestCsvCorpus:
    def test_roundtrip_with_header(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_csv_corpus

        p = tmp_path / "c.csv"
        p.write_text("doc_id,text\n1,alpha beta\n2,gamma\n")
        df = read_csv_corpus(
            spark, str(p), schema="doc_id long, text string"
        )
        rows = {r.doc_id: r.text for r in df.collect()}
        assert rows == {1: "alpha beta", 2: "gamma"}

    def test_corrupt_rows_captured(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_csv_corpus
        from pyspark.sql import functions as F

        p = tmp_path / "bad.csv"
        # row 2 has a non-numeric id -> corrupt under the schema
        p.write_text("doc_id,text\n1,ok\nnot_a_number,broken\n")
        df = read_csv_corpus(
            spark, str(p), schema="doc_id long, text string"
        ).cache()
        bad = df.where(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1
        assert df.where(F.col("doc_id") == 1).count() == 1
        df.unpersist()

    def test_tsv_option_passthrough_and_id_synthesis(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_csv_corpus

        p = tmp_path / "t.tsv"
        p.write_text("text\thits\nalpha\t3\nbeta\t4\n")
        df = read_csv_corpus(spark, str(p), sep="\t")
        assert "doc_id" in df.columns
        a = {r.text: r.doc_id for r in df.collect()}
        b = {
            r.text: r.doc_id
            for r in read_csv_corpus(spark, str(p), sep="\t").collect()
        }
        assert a == b  # deterministic across reruns

    def test_missing_text_col_raises(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_csv_corpus

        p = tmp_path / "n.csv"
        p.write_text("a,b\n1,2\n")
        with pytest.raises(ValueError, match="no 'text'"):
            read_csv_corpus(spark, str(p))


class TestTextCorpus:
    def test_file_mode_one_doc_per_file(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_text_corpus

        d = tmp_path / "docs"
        d.mkdir()
        (d / "a.txt").write_text("line one\nline two\n")
        (d / "b.txt").write_text("solo\n")
        df = read_text_corpus(spark, str(d), mode="file")
        rows = df.collect()
        assert len(rows) == 2
        texts = sorted(r.text for r in rows)
        # file contents verbatim, incl. trailing newline — the source
        # never mutates bytes; analyzers drop whitespace downstream
        assert texts == ["line one\nline two\n", "solo\n"]
        assert len({r.doc_id for r in rows}) == 2

    def test_line_mode_splittable_ids_stable(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_text_corpus

        d = tmp_path / "lines"
        d.mkdir()
        (d / "a.txt").write_text("one\ntwo\nthree\n")
        a = read_text_corpus(spark, str(d), mode="line")
        assert a.count() == 3
        ids1 = sorted(r.doc_id for r in a.collect())
        ids2 = sorted(
            r.doc_id
            for r in read_text_corpus(spark, str(d), mode="line")
            .repartition(3)
            .collect()
        )
        assert ids1 == ids2

    def test_indexable_end_to_end(self, spark, tmp_path):
        from sparksearchengine_spark import Corpus, Q, TextOptions
        from sparksearchengine_spark.sources import read_text_corpus

        d = tmp_path / "ix"
        d.mkdir()
        (d / "a.txt").write_text("spark engine fast\n")
        (d / "b.txt").write_text("slow snail\n")
        corp = read_text_corpus(spark, str(d), mode="file")
        idx = Corpus(
            corp,
            id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="simple")},
        ).build_index(persist=False)
        hits = idx.search(Q.field("text").match_term("spark"), k=5)
        assert hits.count() == 1

    def test_bad_mode_raises(self, spark, tmp_path):
        from sparksearchengine_spark.sources import read_text_corpus

        with pytest.raises(ValueError, match="file\\|line"):
            read_text_corpus(spark, str(tmp_path), mode="word")
