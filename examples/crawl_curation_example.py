"""The crawl-to-corpus recipe end to end: WARC in, curated text out.

This is the front half of a pretraining data pipeline — the part that
runs BEFORE `pretraining_pipeline_example.py`'s dedup/decontam stages —
demonstrated on a synthetic Common-Crawl-style snapshot built in a temp
dir (WARC is the raw input format; there is no parquet yet at this
stage):

1. ingest      — ``read_warc``: one task per ``.warc.gz`` file (gzip is
                 the parallelism unit), streaming bounded-memory parse.
2. link graph  — ``warc_outlink_edges`` → ``domain_pagerank``: the
                 FUSED graph path (HTTP split + outlink extraction in
                 one Arrow pass; the html payload never crosses Arrow —
                 use the composed ``warc_html_responses`` →
                 ``warc_outlinks`` instead when the html itself is the
                 product), then the registered-domain PageRank quality
                 prior (exact dangling redistribution, one shuffle per
                 iteration).
3. text        — ``read_wet_text``: conversion records as a documents
                 frame (only they cross the Arrow boundary).
4. curate      — per-doc quality signals (``token_stats``, Gopher
                 rules) joined with the per-domain prior; the prior is
                 domain-count-sized, i.e. broadcast-sized by
                 construction.
5. deliver     — ``export_shards(shuffle_seed=...)``: deterministic
                 shards in epoch-shuffled training order (a seeded
                 pseudo-random permutation, no global sort).

Run: ``python examples/crawl_curation_example.py [outdir]``
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _record(rtype: str, uri: str, payload: bytes) -> bytes:
    hdr = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rtype}-{uri}>\r\n"
        f"Content-Type: application/http\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _page(uri: str, links: list[str], text: str) -> list[bytes]:
    anchors = "".join(f'<a href="{u}">x</a>' for u in links)
    body = f"<html><body>{anchors}<p>{text}</p></body></html>".encode()
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    return [
        _record("response", uri, http),
        _record("conversion", uri, text.encode()),
    ]


GOOD = (
    "The archive keeps a full copy of every page it fetches, and the "
    "extraction step records where each paragraph came from so that "
    "later stages can trace a training document back to its source."
)
SPAM = "click here buy now 100% #1 !!!"


def main(out: str | None = None) -> None:
    owns_session = SparkSession.getActiveSession() is None
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("crawl curation example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = out or tempfile.mkdtemp()

    # --- 0. synthesize the snapshot: 3 domains; hub.example is linked
    # by everyone, spam.example by no one -------------------------------
    crawl = os.path.join(out, "crawl")
    os.makedirs(crawl, exist_ok=True)
    pages = []
    for i in range(4):
        pages += _page(
            f"http://hub.example/p{i}",
            [f"http://news.example/a{i}"],
            f"{GOOD} Page {i} of the hub.",
        )
        pages += _page(
            f"http://news.example/a{i}",
            ["http://hub.example/p0", f"http://hub.example/p{i}"],
            f"{GOOD} Article {i} from the newsroom.",
        )
        pages += _page(
            f"http://spam.example/s{i}",
            ["http://hub.example/p0"],
            f"{SPAM} {i}",
        )
    with open(os.path.join(crawl, "part-0.warc.gz"), "wb") as f:
        for r in pages:
            f.write(gzip.compress(r))

    from sparksearchengine_spark.operators.linkgraph import domain_pagerank
    from sparksearchengine_spark.operators.textstats import (
        gopher_signal_exprs,
        token_stats,
    )
    from sparksearchengine_spark.operators.weburl import (
        registered_domain,
        url_host,
    )
    from sparksearchengine_spark.sources import (
        read_warc,
        read_wet_text,
        warc_outlink_edges,
    )

    # --- 1. ingest ------------------------------------------------------
    # The ``opener=`` seam is the object-store injection point: every
    # worker-side byte read goes through it, so pointing the pipeline at
    # s3://... is ONE argument, no code change — e.g. with fsspec:
    #
    #     import fsspec
    #     def s3_opener(path):
    #         return fsspec.open(path, "rb", anon=False).open()
    #     records = read_warc(spark, "s3://bucket/crawl/*.warc.gz",
    #                         opener=s3_opener)
    #
    # Demonstrated here with a local stand-in of the same shape (any
    # callable path -> binary stream works; the default opener handles
    # local .gz/.bz2/.zst). The listing yields file: URIs — strip the
    # scheme with the package's own rule, never a hand-rolled replace:
    from sparksearchengine_spark.sources.warc import strip_file_scheme

    def local_opener(path):
        return gzip.open(strip_file_scheme(path), "rb")

    records = read_warc(spark, crawl, opener=local_opener)
    print(f"[1] warc records: {records.count()}")

    # --- 2. link-graph prior (fused: html never re-crosses Arrow) -------
    # CLUSTER NOTE: on a real (dynamic-allocation) cluster, call
    #   ensure_checkpoint_dir(spark, "hdfs://.../ckpt")
    # (package-root export) BEFORE the graph operators — their lineage
    # pins otherwise ride localCheckpoint, whose blocks die with a
    # decommissioned executor. Single-process demo: fallback is fine
    # (the engine warns once).
    links = warc_outlink_edges(spark, crawl, opener=local_opener)
    prior = domain_pagerank(links, iterations=20)
    print("[2] domain prior (rank desc):")
    for r in prior.orderBy(F.desc("rank")).collect():
        print(f"    {r.domain}: {r.rank:.4f}")

    # --- 3. text ----------------------------------------------------------
    wet = read_wet_text(spark, crawl)

    # --- 4. curate: per-doc quality x per-domain prior -------------------
    sig = gopher_signal_exprs(F.col("text"))
    docs = (
        wet.withColumn("domain", registered_domain(url_host(F.col("url"))))
        .withColumn("alpha_frac", sig["alpha_word_frac"])
        .join(token_stats(wet, text_col="text"), "doc_id")
    )
    # rank_pages transfers the domain prior onto every page through the
    # probed broadcast ladder (never an unbounded hand-rolled broadcast)
    from sparksearchengine_spark.operators.linkgraph import rank_pages

    curated = (
        rank_pages(docs, prior, url_col="url", out_col="rank")
        .where((F.col("n_tokens") >= 12) & (F.col("alpha_frac") >= 0.8))
        # drop never-linked domains: their rank stays at the damped
        # floor (1-d)/N plus the dangling share — 2x the floor is the
        # usual cheap cut (unranked domains have NULL rank and drop too)
        .where(F.col("rank") >= 0.1)
    )
    kept = curated.select("domain").groupBy("domain").count().collect()
    print("[4] curated docs per domain:")
    for r in sorted(kept, key=lambda r: r["domain"]):
        print(f"    {r.domain}: {r['count']}")
    total = sum(r["count"] for r in kept)
    print(f"crawl curation complete: kept {total} of {wet.count()} docs")

    # --- 5. deliver: epoch-shuffled shards ------------------------------
    from sparksearchengine_spark.operators.export import (
        export_shards,
        shard_manifest,
    )

    shards = os.path.join(out, "shards")
    export_shards(
        curated.select("doc_id", "text", "domain"),
        shards,
        num_shards=4,
        shuffle_seed=1,
    )
    man = shard_manifest(spark, shards).orderBy("shard").collect()
    print("[5] delivered shards (epoch seed 1):")
    for r in man:
        print(f"    shard {r.shard}: {r.n_rows} rows")

    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or [None]))
