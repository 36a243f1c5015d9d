"""Recall measurement for the approximate operators.

Every approximate op in this engine (MinHash/SimHash/embedding LSH,
IVF/LSH ANN) has an exact counterpart (ngram_jaccard_join,
embedding_neardup_exact, cosine_topk). These helpers measure the
approximate op's recall against its exact baseline AS A DATAFRAME, so the
check runs distributed and lands in the correctness gate:

* pair_recall  — |approx ∩ exact| / |exact| over (id_a, id_b) pair sets
* topk_recall  — |approx ∩ exact| / |exact| over (query_id, vec_id) hits

Both return one row (n_exact, n_found, recall) — tiny results, heavy
inputs; all set-ops are keyed joins (semi-join + count), no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _set_recall(approx: DataFrame, exact: DataFrame, keys: list[str]) -> DataFrame:
    """1-row (n_exact, n_found, recall) for two keyed row sets.

    ONE pass over the exact side: a left join against the (distinct)
    approx keys with a hit marker, counted in a single aggregate — the
    earlier semi-join + separate total ran the expensive exact-baseline
    plan twice (r3 review). The approx side is key-distinct, so the left
    join cannot multiply exact rows.
    """
    e = exact.select(*keys).distinct()
    a = approx.select(*keys).distinct().withColumn("_hit", F.lit(1))
    return (
        e.join(a, keys, "left")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("_hit").alias("n_found"),
        )
        .select(
            "n_exact",
            "n_found",
            (
                F.col("n_found").cast("double")
                / F.greatest(F.col("n_exact"), F.lit(1)).cast("double")
            ).alias("recall"),
        )
    )


def pair_recall(
    approx_pairs: DataFrame,
    exact_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Recall of an approximate near-dup pair set vs the exact pair set."""
    return _set_recall(approx_pairs, exact_pairs, [id_a, id_b])


def topk_recall(
    approx_topk: DataFrame,
    exact_topk: DataFrame,
    query_id: str = "query_id",
    item_id: str = "vec_id",
) -> DataFrame:
    """Recall@k of an ANN result vs the exact top-k (per-query hits pooled;
    both inputs are (query_id, item_id[, ...]) with ≤ k rows per query)."""
    return _set_recall(approx_topk, exact_topk, [query_id, item_id])


def labeled_recall_ok(
    op: str, recall_df: DataFrame, threshold: float
) -> DataFrame:
    """(op, recall_ok) — thresholded so the correctness oracle is stable
    under benign nondeterminism (e.g. KMeans init partition order)."""
    return recall_df.select(
        F.lit(op).alias("op"),
        (F.col("recall") >= float(threshold)).alias("recall_ok"),
    )
