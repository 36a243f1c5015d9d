"""Capture the connected_components loop-join plan BEFORE/AFTER the r12
lineage-pin fix (OPTIMIZATION_r12.md change #6).

``connected_components``'s intermediate frames (``edges``, the per-
iteration ``nbr_min`` join) are internal, so this script reconstructs the
operator's own first lines both ways — ``half = materialize(...)`` (the
pre-fix shape: full caller lineage retained) vs ``half = _pin(...)`` (the
r12 shape: lineage truncated to a LogicalRDD) — on an example-shaped
caller pipeline (parquet read → LM-probe join with a persisted exploded
frame → minhash_lsh_dedup pairs), and writes the first-iteration join
plan for each to plans/r12/minhash_canon_cc_{before,after}.txt.

Run: PYTHONPATH=. python tools/capture_cc_plans.py
"""
from __future__ import annotations

import io
import os
import sys

from pyspark.sql import SparkSession, functions as F

OUT = os.path.join(os.path.dirname(__file__), "..", "plans", "r12")


def _explain_str(df) -> str:
    buf, old = io.StringIO(), sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = old
    return buf.getvalue()


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # bound the capture itself: the point of the BEFORE file is that
        # the un-pinned plan is enormous (it OOM'd an uncapped 4g
        # driver); 1 MB is plenty to show the nested lineage
        .config("spark.sql.maxPlanStringLength", str(1 << 20))
        .appName("capture-cc-plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sparksearchengine_spark.operators.cache import make_pin, materialize
    from sparksearchengine_spark.operators.decontam import unigram_logprob
    from sparksearchengine_spark.operators.dedup import minhash_lsh_dedup

    # example-shaped caller lineage: read -> LM perplexity probe (which
    # persists its exploded token frame, r12 change #4) -> filter join
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    nll = unigram_logprob(docs).select("doc_id", "avg_nll")
    docs = docs.join(nll.where(F.col("avg_nll") < 1e9).select("doc_id"),
                     "doc_id")
    pairs = minhash_lsh_dedup(docs, threshold=0.8)

    _pin = make_pin(spark)

    def first_iter_join(half):
        edges = half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("label"))
        )
        return (
            edges.join(
                labels.select(F.col("id").alias("dst"),
                              F.col("label").alias("_dl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_dl").alias("_nbr_min"))
        )

    sel = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )

    # BEFORE: bare persist (materialize) — full caller lineage retained
    half_before = materialize(sel)
    plan_before = _explain_str(first_iter_join(half_before))
    # AFTER: pinned — lineage truncated to a LogicalRDD scan
    half_after = _pin(sel)
    plan_after = _explain_str(first_iter_join(half_after))

    os.makedirs(OUT, exist_ok=True)
    for name, plan in (("minhash_canon_cc_before.txt", plan_before),
                       ("minhash_canon_cc_after.txt", plan_after)):
        path = os.path.join(OUT, name)
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
