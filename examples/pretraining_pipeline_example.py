"""End-to-end pretraining-data curation pipeline on the sf0.001 corpus.

The full 100 TB recipe, stage by stage, each op the scale-shaped one
(scan-stage signals, hash-keyed shuffles, broadcast-bounded joins):

1. normalize    — clean_text + within-doc duplicate-line removal
2. quality      — Gopher rules + token entropy + zlib compression ratio
3. perplexity   — unigram-LM NLL -> CCNet head/middle/tail per lang
                  (drop the tail bucket)
4. dedup        — paragraph (Dolma), exact (hash groupBy), MinHash-LSH canon
5. decontam     — Bloom-filter n-gram overlap vs a held-out eval slice
6. mixture      — temperature-smoothed (alpha=0.5) token-budget sample
7. pack         — token-window chunks packed to a fixed budget
8. export       — deterministic md5-bucket shards + manifest

Run: ``python examples/pretraining_pipeline_example.py [parquet] [outdir]``
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/testdata/sf0.001/documents.parquet"
    )
    outdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sparksearchengine_spark.operators.chunking import (
        chunk_documents,
        pack_chunks,
    )
    from sparksearchengine_spark.operators.decontam import (
        bloom_decontaminate,
        bloom_gram_filter,
        perplexity_buckets,
        unigram_logprob,
    )
    from sparksearchengine_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_canon,
    )
    from sparksearchengine_spark.operators.export import export_shards
    from sparksearchengine_spark.operators.sampling import (
        temperature_mixture_sample,
    )
    from sparksearchengine_spark.operators.textstats import (
        clean_text,
        compression_ratio,
        dedup_lines,
        gopher_rules,
        token_entropy,
    )

    docs = spark.read.parquet(path)
    n0 = docs.count()
    print(f"[0] corpus: {n0} docs")

    # 1. normalize: unicode/whitespace cleanup, then drop repeated lines
    docs = dedup_lines(clean_text(docs))
    print(f"[1] normalized; dup lines removed: "
          f"{docs.agg(F.sum('n_dup_lines')).collect()[0][0]}")

    # 2. quality gates: Gopher verdict AND entropy/redundancy tails.
    # Tiny docs trip Gopher's 50-word floor — sf0.001 demo keeps the
    # signal columns and gates only on the degenerate tails.
    g = gopher_rules(docs).select("doc_id", "gopher_pass")
    ent = token_entropy(docs).select("doc_id", "norm_entropy")
    zr = compression_ratio(docs).select("doc_id", "compress_ratio")
    docs = (
        docs.join(g, "doc_id").join(ent, "doc_id").join(zr, "doc_id")
    )
    docs = docs.where(
        (F.col("norm_entropy") > 0.2) & (F.col("compress_ratio") > 0.2)
    )
    n2 = docs.count()
    print(f"[2] quality gates kept {n2}/{n0}")

    # 3. CCNet perplexity bucketing per lang; drop the worst third
    nll = unigram_logprob(docs).select(
        "doc_id", F.round("avg_nll", 6).alias("avg_nll")
    )
    scored = nll.join(docs.select("doc_id", "lang"), "doc_id")
    buckets = perplexity_buckets(scored, ppl_col="avg_nll",
                                 group_col="lang")
    docs = docs.join(
        buckets.where(F.col("bucket") != "tail").select("doc_id"),
        "doc_id",
    )
    n3 = docs.count()
    print(f"[3] perplexity head+middle kept {n3}/{n2}")

    # 4. dedup: paragraph-level first (Dolma-style — rewrites text, so
    # it runs BEFORE whole-doc hashing), then exact, then MinHash-LSH
    from sparksearchengine_spark.operators.dedup import dedup_paragraphs

    docs = dedup_paragraphs(docs).drop("n_paragraphs", "n_removed")
    ex = exact_dedup(docs, ["text"])
    docs = docs.join(
        ex.where(~F.col("is_duplicate")).select("doc_id"), "doc_id"
    )
    # stats_out surfaces the giant-bucket guard's counters: on a real
    # crawl, oversized LSH buckets (near-dup mega-clusters the exact
    # pass can't collapse) are star-capped — report them with the run
    lsh_stats: dict = {}
    near = minhash_lsh_canon(docs, threshold=0.8, stats_out=lsh_stats)
    docs = docs.join(
        near.where(~F.col("is_duplicate")).select("doc_id"), "doc_id"
    )
    n4 = docs.count()
    print(
        f"[4] dedup kept {n4}/{n3} "
        f"(oversized LSH buckets: {lsh_stats.get('oversized_buckets', 0)})"
    )

    # 5. decontamination vs a held-out "benchmark" slice (first 20 ids)
    eval_df = spark.read.parquet(path).where(F.col("doc_id") < 20)
    bloom = bloom_gram_filter(eval_df, n=8)
    flags = bloom_decontaminate(docs, bloom)
    docs = docs.join(
        flags.where(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    n5 = docs.count()
    print(f"[5] decontamination kept {n5}/{n4}")

    # 6. temperature-smoothed mixture to a token budget
    docs = docs.withColumn(
        "n_tokens",
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+")),
    )
    sampled = temperature_mixture_sample(
        docs, "lang", budget_tokens=20_000,
        key_col="doc_id", token_col="n_tokens", alpha=0.5,
    )
    docs = sampled.where(F.col("keep")).drop("keep")
    tok = docs.agg(F.sum("n_tokens")).collect()[0][0]
    print(f"[6] mixture sample: {docs.count()} docs, ~{tok} tokens")

    # 7. chunk + pack to a fixed sequence budget
    chunks = chunk_documents(docs, max_tokens=128)
    packed = pack_chunks(chunks, budget=512)
    n_packs = packed.agg(F.countDistinct("pack_id")).collect()[0][0]
    print(f"[7] packed {packed.count()} chunks into {n_packs} packs")

    # 8. deterministic shard export
    out = os.path.join(outdir, "shards")
    export_shards(
        packed.join(docs.select("doc_id", "lang"), "doc_id"),
        out, key_col="doc_id", num_shards=4,
    )
    n_out = spark.read.parquet(out).count()
    print(f"[8] exported {n_out} rows to {out}")
    print("pipeline complete")


if __name__ == "__main__":
    main()
