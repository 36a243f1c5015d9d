"""The examples/ scripts must run end-to-end on the sf0.001 tables —
they are the reference-parity artifacts a switching user runs first
(mirroring SearchableRDDExamples.scala / StoreableExample.scala)."""

from __future__ import annotations

import runpy
import sys
from pathlib import Path

_EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _run(path, argv):
    old = sys.argv
    sys.argv = [path, *argv]
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = old


class TestExamples:
    def test_searchable_examples(self, spark, capsys):
        _run(str(_EXAMPLES / "searchable_examples.py"), [])
        out = capsys.readouterr().out
        assert "Number of docs: 500" in out
        assert "Top 10 terms:" in out
        assert "Query join sample:" in out

    def test_saved_searches_example(self, spark, capsys):
        _run(str(_EXAMPLES / "saved_searches_example.py"), [])
        out = capsys.readouterr().out
        assert "Saved-search top-3 per query:" in out
        assert "Percolation (all matches per standing query):" in out
        assert "q1:" in out

    def test_storeable_example(self, spark, tmp_path, capsys):
        _run(
            str(_EXAMPLES / "storeable_example.py"),
            ["/root/testdata/sf0.001/documents.parquet", str(tmp_path / "ix")],
        )
        out = capsys.readouterr().out
        assert "stored payload" in out
        assert "num_postings" in out

    def test_pretraining_pipeline_example(self, spark, tmp_path, capsys):
        _run(
            str(_EXAMPLES / "pretraining_pipeline_example.py"),
            ["/root/testdata/sf0.001/documents.parquet", str(tmp_path)],
        )
        out = capsys.readouterr().out
        assert "[0] corpus: 500 docs" in out
        assert "[3] perplexity head+middle kept" in out
        assert "[5] decontamination kept" in out
        assert "pipeline complete" in out

    def test_durable_registry_example(self, spark, tmp_path, capsys):
        _run(
            str(_EXAMPLES / "durable_registry_example.py"),
            ["/root/testdata/sf0.001/documents.parquet", str(tmp_path)],
        )
        out = capsys.readouterr().out
        assert "term_buckets=8 doc_buckets=8" in out
        assert "morning batch fired:" in out
        assert "scan bucket-pruned: True" in out
        assert "payload rows: 3" in out

    def test_crawl_curation_example(self, spark, tmp_path, capsys):
        _run(str(_EXAMPLES / "crawl_curation_example.py"), [str(tmp_path)])
        out = capsys.readouterr().out
        assert "[1] warc records: 24" in out
        # the never-linked spam domain sits at the damped floor...
        assert "spam.example: 0.05" in out
        # ...and is dropped by the prior cut; quality pages survive
        assert "hub.example: 4" in out
        assert "news.example: 4" in out
        assert "kept 8 of 12 docs" in out
        assert "[5] delivered shards (epoch seed 1):" in out
