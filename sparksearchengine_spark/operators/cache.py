"""Cache materialization helper — the stage-race guard (r10).

A persisted-but-not-yet-materialized DataFrame that is read by two or
more INDEPENDENT stages of one job is a race: the scheduler launches
ready stages concurrently, each stage finds cold cache partitions, and
each computes them from scratch — so the upstream pipeline runs once
PER BRANCH instead of once. Measured in r10 on the crawl path: a WARC
parse feeding ``domain_pagerank`` re-ran 1-3x per invocation depending
on stage timing (the 16 vs 48 s bench multiples), and the same class
was then found in the dedup gram tables, the phrase compiler's scored
postings, the spelling lattice, and the percolator registry.

:func:`materialize` is persist + ONE deterministic pass, so every later
read — same job or later — is a cache hit. Use it when the persisted
frame's FIRST consumer fans out into multiple plan branches; skip it
when the first consumer is a single-chain action (that action
materializes the cache for free — e.g. ``classification_metrics``'
totals collect, ``classifier_fit``'s n-count, ``dsir``'s sum collects).

The count costs one extra job over data the caller is about to read
anyway, and the cache boundary already blocks filter pushdown below it,
so nothing is lost that ``persist()`` had not already given up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["materialize"]


def materialize(df: DataFrame) -> DataFrame:
    """persist + one deterministic materialization pass (see module
    docstring for when this is required instead of bare persist)."""
    df = df.persist()
    df.count()
    return df
