"""Curation pipeline composition: flags → filter → report.

The end-to-end shape a corpus actually goes through before training:
quality gate → exact dedup → benchmark decontamination → split. Rather
than running each stage as its own filter pass (N scans, N intermediate
writes), ``curation_flags`` LEFT-JOINS every stage's verdict onto the
corpus as boolean columns in ONE composed plan; downstream you either
``where(keep)`` (the clean corpus, with lineage for free) or aggregate
the flags (the report). Catalyst sees the whole thing and shares the
scan; nothing is materialized per stage.

Flag semantics:
* ``quality_ok``     — token count within [min_tokens, max_tokens]
* ``is_exact_dup``   — identical-content row whose id ≠ the group min
                       (the canonical representative stays)
* ``contaminated``   — shares ≥ min_hit_grams token n-grams with the
                       eval/benchmark corpus (skipped if eval_df is None)
* ``keep``           — quality_ok ∧ ¬is_exact_dup ∧ ¬contaminated

At 100 TB: the dedup verdict is one hash-window shuffle, decontam is one
gram join against a broadcast eval set, the quality gate is scan-stage —
the composed plan has no stage-multiplied scans of the raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.decontam import ngram_decontaminate
from sparksearchengine_spark.operators.dedup import exact_dedup
from sparksearchengine_spark.operators.textstats import token_count_expr


def curation_flags(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
    max_tokens: int = 1_000_000,
    ngram_n: int = 8,
    min_hit_grams: int = 1,
    analyzer: str = "simple",
    gopher: bool | dict = False,
    c4: bool | dict = False,
    classifier: dict | None = None,
    readability: dict | None = None,
) -> DataFrame:
    """docs + (n_tokens, quality_ok, canon_id, is_exact_dup,
    contaminated, gopher_ok, c4_ok, clf_ok, read_ok, keep).

    ``gopher``/``c4`` switch on the Gopher rule set / C4 page verdict as
    extra gates (pass a dict to override their thresholds);
    ``classifier`` enables the hashed linear quality model
    (`operators/classify.py`) — pass ``{"weights": [...], "bias": ...,
    "threshold": ...}``; ``readability`` enables the Flesch/FK gate
    (`textstats.readability_ok_expr`) — pass ``{"min_flesch": ...}``
    and/or ``{"max_fk_grade": ...}``. All four are INLINED scan-stage
    expressions — enabling them adds zero joins and zero shuffles to
    the composed plan. Disabled gates report ``True`` so the flag
    schema is stable either way.
    """
    from sparksearchengine_spark.operators.textstats import (
        c4_signal_exprs,
        gopher_signal_exprs,
    )
    out = docs.withColumn(
        "n_tokens", token_count_expr(F.col(text_col), analyzer).cast("long")
    ).withColumn(
        # NULL text -> NULL n_tokens; coalesce so the doc FAILS the gate
        # and is counted in n_quality_fail instead of vanishing from
        # every report bucket with a NULL keep (r3 review)
        "quality_ok",
        F.coalesce(
            F.col("n_tokens").between(min_tokens, max_tokens), F.lit(False)
        ),
    )
    # LEFT joins with coalesced defaults, per the module contract: a doc
    # missing from a verdict frame surfaces with default flags instead of
    # being silently deleted by an inner equi-join
    dd = exact_dedup(docs, [text_col], id_col=id_col)
    out = out.join(
        dd.select(id_col, "canon_id", F.col("is_duplicate").alias("is_exact_dup")),
        id_col,
        "left",
    ).withColumn("is_exact_dup", F.coalesce(F.col("is_exact_dup"), F.lit(False)))
    if eval_df is not None:
        dc = ngram_decontaminate(
            docs, eval_df, n=ngram_n, text_col=text_col, id_col=id_col,
            analyzer=analyzer, min_hit_grams=min_hit_grams,
        )
        out = out.join(dc.select(id_col, "contaminated"), id_col, "left")
        out = out.withColumn(
            "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
        )
    else:
        out = out.withColumn("contaminated", F.lit(False))
    # `is not False` so gopher={} ('enable with defaults') works (r3 review)
    if gopher is not False and gopher is not None:
        g_kwargs = gopher if isinstance(gopher, dict) else {}
        out = out.withColumn(
            "gopher_ok",
            gopher_signal_exprs(F.col(text_col), **g_kwargs)["gopher_pass"],
        )
    else:
        out = out.withColumn("gopher_ok", F.lit(True))
    if c4 is not False and c4 is not None:
        c_kwargs = c4 if isinstance(c4, dict) else {}
        out = out.withColumn(
            "c4_ok", c4_signal_exprs(F.col(text_col), **c_kwargs)["c4_keep"]
        )
    else:
        out = out.withColumn("c4_ok", F.lit(True))
    if classifier is not None:
        from sparksearchengine_spark.operators.classify import (
            hashed_score_expr,
        )

        kw = dict(classifier)
        thr = kw.pop("threshold", 0)
        out = out.withColumn(
            "clf_ok",
            hashed_score_expr(F.col(text_col), analyzer=analyzer, **kw)
            >= F.lit(thr),
        )
    else:
        out = out.withColumn("clf_ok", F.lit(True))
    if readability is not None:
        from sparksearchengine_spark.operators.textstats import (
            readability_ok_expr,
        )

        out = out.withColumn(
            "read_ok",
            readability_ok_expr(
                F.col(text_col), analyzer=analyzer, **readability
            ),
        )
    else:
        out = out.withColumn("read_ok", F.lit(True))
    return out.withColumn(
        "keep",
        F.col("quality_ok")
        & ~F.col("is_exact_dup")
        & ~F.col("contaminated")
        & F.col("gopher_ok")
        & F.col("c4_ok")
        & F.col("clf_ok")
        & F.col("read_ok"),
    )


def curate(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """The clean corpus: original columns of rows passing every gate."""
    flags = curation_flags(docs, eval_df, **kwargs)
    return flags.where(F.col("keep")).select(*docs.columns)


def curation_report(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """One-row accounting over the flags: how many docs each gate cut and
    what survived. Gates overlap (a doc can fail several), so the fail
    counts need not sum to n_docs - n_kept."""
    flags = curation_flags(docs, eval_df, **kwargs)
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((~F.col("quality_ok")).cast("long")).alias("n_quality_fail"),
        F.sum(F.col("is_exact_dup").cast("long")).alias("n_exact_dup"),
        F.sum(F.col("contaminated").cast("long")).alias("n_contaminated"),
        F.sum((~F.col("gopher_ok")).cast("long")).alias("n_gopher_fail"),
        F.sum((~F.col("c4_ok")).cast("long")).alias("n_c4_fail"),
        F.sum((~F.col("clf_ok")).cast("long")).alias("n_clf_fail"),
        F.sum((~F.col("read_ok")).cast("long")).alias("n_read_fail"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )
