"""Retrieval-quality evaluation: nDCG@k, MRR, precision/recall@k.

The reference ships no evaluation harness — quality in its examples is
checked by eyeballing printed hits (`examples/SearchableRDDExamples.scala`).
For an engine curating training corpora at 100 TB, retrieval eval is a
first-class operator: every re-rank / re-chunk / re-analyze decision is
measured as a metric delta on a labeled query set before the new index
ships.

Scale design:

* ranks come from :func:`~sparksearchengine_spark.operators.search.
  topk_per_group` — the same skew-safe two-stage rank window every other
  per-group top-k in the repo uses, so a hot query with millions of
  candidate rows never serializes one reducer;
* gains join on ``(query, doc)`` — a plain equi-join that co-partitions
  with the rank shuffle, and the joined frame is already k-bounded per
  query (≤ k·|queries| rows total) before any aggregation;
* the DCG / IDCG sums run through the DECIMAL(28,6) order-invariant
  recipe (round each addend to 6 dp → decimal sum → double), so metric
  values are bit-identical across partitionings, retries, and cluster
  sizes — the reproducibility contract the repo's scoring operators
  already guarantee (see `operators/profile.py`, `operators/search.py`
  BM25F weighting).

Formulas (standard graded definitions):

* ``DCG@k  = Σ_{r=1..k} (2^grade_r − 1) / log2(r + 1)`` over retrieved
  ranks, unjudged docs gain 0;
* ``IDCG@k`` = the same sum over the query's labels sorted by grade
  descending (doc id ascending tie-break) — so ``nDCG = DCG / IDCG``;
* ``RR`` = 1 / rank of the first retrieved doc with
  ``grade ≥ rel_threshold`` (0 if none in the top k);
* ``precision@k = hits / k``; ``recall@k = hits / n_relevant``.

Queries are evaluated over the *labeled* set: a query with labels but no
retrieved rows scores 0 everywhere (the regression you want to see); a
retrieved query with no labels is excluded (nothing to measure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.search import topk_per_group

_DEC_ADD = "decimal(28,6)"
_DEC_SUM = "decimal(38,6)"


def _dcg_term(gain, rank):
    """One DCG addend, rounded to 6 dp and cast for order-invariant
    summing: (2^gain − 1) / log2(rank + 1)."""
    term = (F.pow(F.lit(2.0), gain) - F.lit(1.0)) / F.log2(rank + F.lit(1))
    return F.round(term, 6).cast(_DEC_ADD)


def _dec_sum(col):
    return F.sum(col).cast(_DEC_SUM).cast("double")


def retrieval_metrics(
    results: DataFrame,
    labels: DataFrame,
    k: int = 10,
    *,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    grade_col: str = "grade",
    rank_col: str | None = None,
    rel_threshold: float = 1.0,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Per-query retrieval metrics at cutoff ``k``.

    Parameters
    ----------
    results : ranked retrieval output — ``(query_col, doc_col,
        score_col)`` rows, e.g. from ``SearchIndex.batch_search``. If
        ``rank_col`` is given it is trusted (rows with rank > k are
        dropped); otherwise ranks are recomputed by score descending,
        doc id ascending — the repo-wide deterministic tie-break.
        Duplicate ``(query, doc)`` rows collapse to their best rank
        before judging, so a doc can contribute at most once per query.
    labels : relevance judgments — ``(query_col, doc_col, grade_col)``.
        Duplicate judgments collapse to their max grade. Grades are
        graded-relevance reals; ``grade ≥ rel_threshold`` counts as
        relevant for precision / recall / RR, and any ``grade > 0``
        contributes gain to DCG.
    salt_buckets : forwarded to the rank window when ranks are
        recomputed (two-stage skew-safe top-k); irrelevant when
        ``rank_col`` is supplied.

    Returns one row per *labeled* query:
    ``(query_col, n_rel, hits, precision, recall, rr, ndcg)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, d = query_col, doc_col

    gains = (
        labels.select(q, d, F.col(grade_col).cast("double").alias("_g"))
        .groupBy(q, d)
        .agg(F.max("_g").alias("_g"))
    )

    # a doc retrieved twice for the same query (trusted rank_col with
    # repeats, or a fused/unioned result frame) must count ONCE, and
    # must not consume two of the k rank slots (ADVICE r5; r6 review):
    # with recomputed ranks, duplicates collapse to their best score
    # BEFORE the rank window, so distinct docs are never pushed past
    # the cutoff and ranks stay gap-free; with a TRUSTED rank_col the
    # caller's ranking is kept as-is and repeats collapse to their best
    # (minimum) rank.
    if rank_col is not None:
        ranked = (
            results.select(
                q, d, F.col(rank_col).cast("bigint").alias("rank")
            )
            .where(F.col("rank") <= k)
            .groupBy(q, d)
            .agg(F.min("rank").alias("rank"))
        )
    else:
        ranked = topk_per_group(
            results.select(q, d, score_col)
            .groupBy(q, d)
            .agg(F.max(score_col).alias(score_col)),
            [q],
            [F.desc(score_col), F.asc(d)],
            k,
            salt_buckets=salt_buckets,
            salt_col=d,
        ).select(q, d, "rank")

    hit = (F.col("_gain") >= F.lit(float(rel_threshold))).cast("int")
    per_q = (
        ranked.join(gains, on=[q, d], how="left")
        .withColumn("_gain", F.coalesce(F.col("_g"), F.lit(0.0)))
        .groupBy(q)
        .agg(
            _dec_sum(_dcg_term(F.col("_gain"), F.col("rank"))).alias("_dcg"),
            F.sum(hit).alias("_hits"),
            F.min(F.when(hit == 1, F.col("rank"))).alias("_first_rel"),
        )
    )

    ideal = (
        topk_per_group(
            gains.where(F.col("_g") > 0),
            [q],
            [F.desc("_g"), F.asc(d)],
            k,
            salt_buckets=None,
            salt_col=d,
        )
        .groupBy(q)
        .agg(_dec_sum(_dcg_term(F.col("_g"), F.col("rank"))).alias("_idcg"))
    )

    base = gains.groupBy(q).agg(
        F.sum(
            (F.col("_g") >= F.lit(float(rel_threshold))).cast("bigint")
        ).alias("n_rel")
    )

    return (
        base.join(per_q, on=q, how="left")
        .join(ideal, on=q, how="left")
        .select(
            q,
            "n_rel",
            F.coalesce(F.col("_hits"), F.lit(0)).cast("bigint").alias("hits"),
            F.round(
                F.coalesce(F.col("_hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision"),
            F.round(
                F.when(
                    F.col("n_rel") > 0,
                    F.coalesce(F.col("_hits"), F.lit(0))
                    / F.col("n_rel").cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("recall"),
            F.round(
                F.when(
                    F.col("_first_rel").isNotNull(),
                    F.lit(1.0) / F.col("_first_rel").cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("rr"),
            F.round(
                F.when(
                    F.coalesce(F.col("_idcg"), F.lit(0.0)) > 0,
                    F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.col("_idcg"),
                ).otherwise(0.0),
                6,
            ).alias("ndcg"),
        )
    )


def retrieval_metrics_summary(metrics: DataFrame) -> DataFrame:
    """Macro-averaged single-row summary of :func:`retrieval_metrics`.

    Means run through the same order-invariant decimal recipe (the
    per-query values are already 6 dp), so the summary is bit-stable
    across partitionings: ``(n_queries, mean_precision, mean_recall,
    mrr, mean_ndcg)``. MRR is, by definition, the macro mean of RR.
    """
    n = F.count(F.lit(1))

    def _mean(c):
        return F.round(
            _dec_sum(F.col(c).cast(_DEC_ADD)) / n.cast("double"), 6
        )

    return metrics.agg(
        n.cast("bigint").alias("n_queries"),
        _mean("precision").alias("mean_precision"),
        _mean("recall").alias("mean_recall"),
        _mean("rr").alias("mrr"),
        _mean("ndcg").alias("mean_ndcg"),
    )


def classification_metrics(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    threshold: float = 0.5,
) -> DataFrame:
    """Binary-classifier evaluation for the quality-filter training loop
    (the companion to ``classify.classifier_fit`` / ``classifier_score``
    — fastText-style curation classifiers are judged on exactly these):
    one-row frame with confusion counts at ``threshold`` plus
    threshold-free ROC-AUC and average precision.

    Everything is DISTRIBUTED and tie-exact:

    * confusion/accuracy/precision/recall/F1: one scalar aggregation.
    * ``roc_auc``: the Mann-Whitney rank statistic with midrank tie
      correction — scores are grouped by DISTINCT value (one shuffle;
      the grouped frame is |distinct scores| rows, never corpus rows),
      cumulative counts come from :func:`prefix.distributed_prefix`
      (no serial window), and
      ``AUC = (Σ pos_g · midrank_g − P(P+1)/2) / (P·N)``.
    * ``pr_auc``: average precision over distinct-score thresholds
      (descending), the step-function definition
      ``Σ_g (pos_g / P) · (cumpos≥g / cumn≥g)`` — computed from the
      SAME grouped cumulative frame.

    Labels must be 0/1 (anything else raises in the aggregate via an
    ANSI cast guard); NULL labels or scores are rejected loudly.
    Degenerate sets (no positives or no negatives) yield NULL AUCs and
    NULL recall/precision where the denominator is empty — never a
    silent 0.0 that reads as "bad classifier".
    """
    from sparksearchengine_spark.operators.prefix import distributed_prefix

    y = F.col(label_col)
    s = F.col(score_col)
    bad = (
        y.isNull() | s.isNull() | ((y != 0) & (y != 1))
    )
    guard = F.when(
        bad,
        F.raise_error(
            F.lit(
                "classification_metrics: labels must be 0/1 and "
                "scores non-NULL — filter or impute first"
            )
        ).cast("long"),
    ).otherwise(y.cast("long"))

    base = df.select(guard.alias("_y"), s.cast("double").alias("_s"))

    # grouped by distinct score: |groups| << |rows| for real
    # classifiers. Persisted: EVERYTHING below (totals, AUC/AP, the
    # threshold confusion) derives from this one frame, so the corpus
    # is scanned exactly once.
    grouped = base.groupBy("_s").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_y").alias("_p"),
    ).persist()
    cum = distributed_prefix(
        grouped,
        order=[F.col("_s").asc()],
        sum_cols={"_n": "_cn", "_p": "_cp"},
    )
    # midrank of a tie group = ranks (cn - n + 1) .. cn averaged
    midrank = F.col("_cn") - (F.col("_n") - F.lit(1)) / F.lit(2.0)
    # AP's precision-at-threshold needs the TOTALS inside the row-wise
    # expression; two passes over the tiny grouped frame (a 1-row
    # totals collect, then one aggregate) — both driver-bounded
    tot = grouped.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum("_n").alias("T"),
        F.sum("_p").alias("P"),
    ).collect()[0]
    T, P = int(tot["T"] or 0), int(tot["P"] or 0)
    N = T - P
    # order-invariant sums (module reproducibility contract): each
    # double addend casts to a fixed-scale decimal (deterministic
    # per-value truncation at 1e-18 — far below the 6 dp the result
    # rounds to), and decimal addition is exact, so partial-aggregate
    # combine order cannot flip a rounded digit across partitionings or
    # retries. _rp rides a WIDER integer part: this lifts the OVERFLOW
    # bound — Σ _p·midrank ≈ P·T exceeded decimal(38,18)'s 20 integer
    # digits already at ~1e10 rows; at scale 6 the sum stays
    # representable up to ~1e16 rows per class (sum ≈ P·T < 1e32; r9
    # ADVICE). Addend exactness (.5 granularity: p integer x midrank
    # half-integer) additionally holds while p·midrank < 2^52 (doubles
    # have unit spacing from 2^52, so x.5 rounds there) — beyond that
    # the DOUBLE product rounds BEFORE the cast; both engines compute
    # the identical double, so determinism and oracle parity survive,
    # and the ~1e-16 relative error is invisible at the 6dp the result
    # rounds to.
    _dec18 = "decimal(38,18)"
    _dec6 = "decimal(38,6)"
    ap_terms = cum.select(
        (
            F.col("_p").cast("double")
            * (
                (F.lit(P) - (F.col("_cp") - F.col("_p"))).cast("double")
                / (F.lit(T) - (F.col("_cn") - F.col("_n"))).cast("double")
            )
        ).cast(_dec18).alias("_apt"),
        (F.col("_p") * midrank).cast(_dec6).alias("_rp"),
    ).agg(
        F.sum("_apt").cast("double").alias("_ap_num"),
        F.sum("_rp").cast("double").alias("_rank_pos"),
    )
    row = ap_terms.collect()[0]
    if P > 0 and N > 0:
        roc_auc = (float(row["_rank_pos"]) - P * (P + 1) / 2.0) / (P * N)
    else:
        roc_auc = None
    pr_auc = (float(row["_ap_num"]) / P) if P > 0 else None

    # confusion at the threshold — from the SAME grouped frame (a
    # predicted-positive is a whole tie group with _s >= threshold)
    kept = F.col("_s") >= F.lit(float(threshold))
    conf = grouped.agg(
        F.sum(F.when(kept, F.col("_p")).otherwise(F.lit(0))).alias("tp"),
        F.sum(
            F.when(kept, F.col("_n") - F.col("_p")).otherwise(F.lit(0))
        ).alias("fp"),
    ).collect()[0]
    grouped.unpersist()
    n = T
    tp, fp = int(conf["tp"] or 0), int(conf["fp"] or 0)
    fn, tn = P - tp, N - fp
    prec = tp / (tp + fp) if (tp + fp) else None
    rec = tp / (tp + fn) if (tp + fn) else None
    f1 = (
        2 * prec * rec / (prec + rec)
        if prec is not None and rec is not None and (prec + rec)
        else None
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(
            n, P, tp, fp, fn, tn,
            round((tp + tn) / n, 6) if n else None,
            round(prec, 6) if prec is not None else None,
            round(rec, 6) if rec is not None else None,
            round(f1, 6) if f1 is not None else None,
            round(roc_auc, 6) if roc_auc is not None else None,
            round(pr_auc, 6) if pr_auc is not None else None,
        )],
        "n long, n_pos long, tp long, fp long, fn long, tn long, "
        "accuracy double, precision double, recall double, f1 double, "
        "roc_auc double, pr_auc double",
    )


def pr_curve(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Threshold sweep for picking a quality-filter cutoff:
    ``(threshold, n_kept, precision, recall, f1)`` — one row per
    DISTINCT score, where ``threshold`` means "keep score >= this".

    Built from the same grouped-cumulative shape as
    :func:`classification_metrics` (one shuffle to group by score,
    ``distributed_prefix`` for the cumulative counts — the curve frame
    is |distinct scores| rows, never corpus rows), so sweeping a
    100-TB scored corpus costs one aggregation pass. Rows are exact:
    at threshold t, kept = all rows with score >= t.

    Holds NO cache of its own (r9 ADVICE): total positives are read off
    the cumulative frame itself (``max(_tp)`` — the lowest-score row's
    descending cumsum), so both branches ride the single pinned scan
    ``distributed_prefix`` already maintains. The only storage blocks
    are that pin's, with its documented lifecycle (freed when the
    returned frame is garbage-collected); repeated sweeps in a
    long-lived session accumulate nothing else.
    """
    from sparksearchengine_spark.operators.prefix import distributed_prefix

    y = F.col(label_col)
    s = F.col(score_col)
    guard = F.when(
        y.isNull() | s.isNull() | ((y != 0) & (y != 1)),
        F.raise_error(
            F.lit("pr_curve: labels must be 0/1 and scores non-NULL")
        ).cast("long"),
    ).otherwise(y.cast("long"))
    # NOT persisted: distributed_prefix pins its range-partitioned form
    # with a lazy localCheckpoint, and every consumer below reads THAT —
    # a second cache here would only duplicate it (r9 ADVICE)
    grouped = (
        df.select(guard.alias("_y"), s.cast("double").alias("_s"))
        .groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_p"))
    )
    # DESCENDING cumulative = "kept at threshold >= this score"
    cum = distributed_prefix(
        grouped,
        order=[F.col("_s").desc()],
        sum_cols={"_n": "_kept", "_p": "_tp"},
    )
    # total positives = the final (lowest-score) row's cumulative _tp:
    # a 1-row aggregate over the pinned cum frame, cross-joined
    # broadcast — the same idiom as perplexity_buckets' quantile frame,
    # and no second scan of the corpus
    totals = cum.agg(F.max("_tp").alias("_tot_pos"))
    out = cum.crossJoin(F.broadcast(totals))
    prec = F.col("_tp").cast("double") / F.col("_kept").cast("double")
    rec = F.when(
        F.col("_tot_pos") > 0,
        F.col("_tp").cast("double") / F.col("_tot_pos"),
    )
    # NULL recall (no positives anywhere) must yield NULL f1, never a
    # silent 0.0 that reads as "bad classifier" — same contract as
    # classification_metrics' degenerate path
    f1 = (
        F.when(rec.isNull(), F.lit(None).cast("double"))
        .when((prec + rec) > 0, 2 * prec * rec / (prec + rec))
        .otherwise(F.lit(0.0))
    )
    return out.select(
        F.col("_s").alias("threshold"),
        F.col("_kept").alias("n_kept"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
