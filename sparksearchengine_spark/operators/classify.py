"""Linear quality-classifier inference over token streams.

The standard web-scale curation stack (CCNet, fastText quality filters a
la GPT-3 / LLaMA data prep) scores each document with a LINEAR
bag-of-tokens
model — inference is the 100 TB-scale job (training is offline and
small). Two shapes:

* **hashing trick** (`classifier_score`, weights as a dense vector
  indexed by `md5(token) % dim` — fastText's `-hash` buckets): the whole
  model folds into ONE scan-stage projection (array-literal lookup +
  sequential fold), zero joins, zero shuffles. This is the shape to run
  against the full corpus.
* **explicit vocabulary** (`classifier_score_vocab`, weights as a
  `(term, weight)` DataFrame): explode + broadcast join + re-aggregate.
  One shuffle on the doc id; use when the model ships as a word table.

Both are engine-portable: md5 bucketing and sequential-fold sums are
replicated verbatim by the driver's DuckDB oracle. With integer weights
the score is exact (BIGINT); float weights follow the same fold order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearchengine_spark.functions.analyzers import analyzer_expr


def hash_bucket_expr(token: Column, dim: int) -> Column:
    """`md5(token)` first 8 hex chars as an integer, mod dim — the same
    engine-portable bucket `operators.sampling.hash_bucket` uses
    (DuckDB: CAST('0x' || substr(md5(t),1,8) AS BIGINT) % dim)."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long") % dim


def hashed_score_expr(
    text: Column,
    weights: list[float] | list[int],
    bias: float | int = 0,
    analyzer: str = "simple",
    tokens: Column | None = None,
) -> Column:
    """The hashed-linear score as a bare Column expression — composable
    into other scan-stage plans (the curation pipeline inlines it as a
    gate). NULL text scores exactly ``bias``. Integer weights + integer
    bias => BIGINT; otherwise DOUBLE (token-order sequential fold).

    Pass ``tokens`` (an array<string> Column) to score an
    already-analyzed stream — callers that need the token array anyway
    (classifier_score reports n_tokens) would otherwise tokenize twice,
    which doubles the dominant cost when the analyzer is a pandas UDF
    (r3 review)."""
    dim = len(weights)
    if dim == 0:
        raise ValueError("weights must be non-empty")
    int_model = all(isinstance(w, int) for w in weights) and isinstance(bias, int)
    warr = F.array(*[F.lit(w) for w in weights])
    toks = (
        tokens
        if tokens is not None
        else F.coalesce(
            analyzer_expr(text, analyzer), F.array().cast("array<string>")
        )
    )
    contrib = F.transform(
        toks, lambda t: F.element_at(warr, (hash_bucket_expr(t, dim) + 1).cast("int"))
    )
    zero = F.lit(0).cast("bigint") if int_model else F.lit(0.0)
    return F.aggregate(contrib, zero, lambda acc, x: acc + x) + F.lit(bias)


def classifier_score(
    df: DataFrame,
    weights: list[float] | list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "simple",
    bias: float | int = 0,
    threshold: float | int | None = None,
) -> DataFrame:
    """Hashed linear model: `score = bias + sum_t weights[md5(t) % dim]`
    over the analyzed token stream; `(id, n_tokens, score[, keep])`.

    The weight vector becomes an array literal resolved per token with
    `element_at` inside a sequential fold — the entire model evaluates
    inside the corpus scan's WholeStageCodegen, so scoring 100 TB costs
    exactly one pass and no shuffle. ``dim`` (= len(weights)) up to a few
    thousand keeps the literal driver-trivial; fastText's default 2M
    buckets would instead ship as a table — use
    :func:`classifier_score_vocab` for that regime.

    Integer weights + integer bias => BIGINT score, bit-exact across
    engines; float weights sum in token order (deterministic fold).
    """
    # NULL text scores exactly the bias (0 tokens), not NULL — a missing
    # document is an empty document to a bag-of-tokens model
    toks = F.coalesce(
        analyzer_expr(F.col(text_col), analyzer),
        F.array().cast("array<string>"),
    )
    # score from the SAME token expression (one tokenization per row)
    score = hashed_score_expr(
        F.col(text_col), weights, bias, analyzer, tokens=toks
    )
    out = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        score.alias("score"),
    )
    if threshold is not None:
        out = out.withColumn("keep", F.col("score") >= F.lit(threshold))
    return out


def hash_embed(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "simple",
    normalize: bool = True,
    method: str = "expr",
) -> DataFrame:
    """Feature-hashing text embedding (HashingTF shape): bucket counts of
    the analyzed token stream as a dense `array<double>[dim]`, optionally
    L2-normalized — turns raw text into a vector column every embedding
    operator here (cosine top-k, LSH/IVF ANN, SemDedup, k-means) can
    consume without an external model. `(id, embedding)`.

    Both methods are zero-shuffle and engine-portable (the bucket is the
    shared md5 rule, counts are integers, and the normalization is one
    sqrt + one division per slot — bit-identical across engines):

    * ``"expr"`` — one `aggregate` fold per row. O(dl x dim)
      INTERPRETED ops (nested HOFs are CodegenFallback): the oracle
      form, fine for small dim.
    * ``"arrow"`` — tokens come out of the scan, the bucket/bincount
      runs in numpy per Arrow batch. The 100 TB form.

    A doc with no tokens embeds as the zero vector (cosine guards treat
    it as direction-less downstream).
    """
    if dim <= 0:
        raise ValueError("dim must be positive")
    if method not in ("expr", "arrow"):
        raise ValueError(f"method must be expr|arrow, got {method!r}")
    toks = F.coalesce(
        analyzer_expr(F.col(text_col), analyzer),
        F.array().cast("array<string>"),
    )
    if method == "arrow":
        sel = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        return _hash_embed_arrow(sel, dim, normalize)
    zero = F.array_repeat(F.lit(0.0), dim)
    counts = F.aggregate(
        toks,
        zero,
        lambda acc, t: F.transform(
            acc,
            lambda v, i: F.when(
                hash_bucket_expr(t, dim).cast("int") == i, v + F.lit(1.0)
            ).otherwise(v),
        ),
    )
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                counts, F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        vec = F.when(nrm > 0, F.transform(counts, lambda x: x / nrm)).otherwise(
            counts
        )
    else:
        vec = counts
    return df.select(F.col(id_col).alias("id"), vec.alias("embedding"))


def _hash_embed_arrow(sel: DataFrame, dim: int, normalize: bool) -> DataFrame:
    """numpy bincount per Arrow batch over pre-analyzed token arrays.
    hashlib.md5 reproduces hash_bucket_expr exactly; float64 counts,
    same one-sqrt-one-division normalization as the expr path."""
    import hashlib

    import numpy as np

    def _batches(it):
        import pandas as pd

        for pdf in it:
            out = []
            for toks in pdf["_toks"]:
                v = np.zeros(dim, dtype=np.float64)
                if toks is not None and len(toks):
                    idx = [
                        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
                        for t in toks
                    ]
                    np.add.at(v, idx, 1.0)
                    if normalize:
                        n = np.sqrt((v * v).sum())
                        if n > 0:
                            v = v / n
                out.append(v.tolist())
            yield pd.DataFrame({"id": pdf["id"], "embedding": out})

    return sel.mapInPandas(_batches, schema="id long, embedding array<double>")


def classifier_score_vocab(
    df: DataFrame,
    weights_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "simple",
    bias: float = 0.0,
    term_col: str = "term",
    weight_col: str = "weight",
) -> DataFrame:
    """Vocabulary linear model: explode tokens, join the `(term,
    weight)` table (vocab << corpus by construction — a fastText vocab
    is millions of rows, the corpus is billions), sum per doc. The
    weights table is USER-SUPPLIED with no driver-known bound, so the
    join strategy is probed: broadcast only when provably ≤ the vocab
    budget, else shuffle_hash with the weights as build side.

    OOV tokens contribute 0 (left join + coalesce). One shuffle (the
    per-doc re-aggregation, partial-agg'd map-side). Returns
    `(id, n_tokens, score)`; rows with no tokens score exactly ``bias``.
    """
    from sparksearchengine_spark.operators.index import (
        VOCAB_BROADCAST_MAX_ROWS,
    )
    from sparksearchengine_spark.operators.search import _hint_data_side

    toks = analyzer_expr(F.col(text_col), analyzer)
    base = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    exploded = base.select(
        "id", F.explode_outer(F.col("_toks")).alias("_t")
    )
    w = _hint_data_side(
        weights_df.select(
            F.col(term_col).alias("_t"), F.col(weight_col).alias("_w")
        ),
        max_rows=VOCAB_BROADCAST_MAX_ROWS,
    )
    scored = (
        exploded.join(w, "_t", "left")
        .groupBy("id")
        .agg(
            F.count(F.col("_t")).alias("n_tokens"),
            (F.coalesce(F.sum("_w"), F.lit(0.0)) + F.lit(float(bias))).alias(
                "score"
            ),
        )
    )
    return scored


def tfidf_hash_embed(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "simple",
    normalize: bool = True,
    df_table: DataFrame | None = None,
    n_docs: float | None = None,
) -> DataFrame:
    """Idf-WEIGHTED feature-hashing embedding: per md5 bucket the sum of
    the BM25-idf of each token occurrence (rare terms dominate the
    vector instead of stopwords), L2-normalized — the tf-idf upgrade of
    :func:`hash_embed` for SemDedup/k-means/ANN without an external
    model. `(id, embedding array<double>)`.

    ``df_table``: a precomputed ``(term, df_t)`` vocabulary (e.g.
    ``SearchIndex.termstats`` or a foreign reference corpus); fitted
    from ``df`` itself when omitted. With a foreign ``df_table`` you
    MUST pass ``n_docs`` — the doc count of the corpus the vocabulary
    was fitted on: mixing a foreign ``df_t`` with the local corpus's N
    yields negative idf whenever ``df_t > N`` (rare terms would be
    penalized), and counting locally would also defeat the supplied
    vocabulary's purpose of avoiding extra passes (ADVICE r3).

    Engine-exactness: idf values are rounded 6dp and summed as DECIMAL
    per bucket (order-independent); the normalization is the shared
    one-sqrt-one-fold shape. Plan: one explode, one PROBED vocab join
    (the vocabulary — fitted from the corpus or user-supplied — is
    unbounded at 100 TB by Heaps' law, so it broadcasts only when
    provably small, else shuffle_hash with the vocab as build side),
    two id-keyed partial-agg'd shuffles (bucket sums, then the map
    assembly) — unlike the count-based ``hash_embed`` this cannot be
    zero-shuffle because the weight needs the corpus-global df.
    """
    if dim <= 0:
        raise ValueError("dim must be positive")
    from sparksearchengine_spark.functions.scoring import idf_expr
    from sparksearchengine_spark.operators.index import (
        VOCAB_BROADCAST_MAX_ROWS as _VMAX,
    )
    from sparksearchengine_spark.operators.search import (
        _hint_data_side as _hds,
    )

    toks = F.coalesce(
        analyzer_expr(F.col(text_col), analyzer),
        F.array().cast("array<string>"),
    )
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode_outer(toks).alias("term")
    )
    if df_table is None:
        df_table = (
            exploded.where(F.col("term").isNotNull())
            .select("id", "term")
            .distinct()
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("df_t"))
        )
        if n_docs is None:
            n_docs = float(df.count())
    else:
        df_table = df_table.select("term", "df_t")
        if n_docs is None:
            raise ValueError(
                "tfidf_hash_embed(df_table=...) needs n_docs: the doc "
                "count of the corpus the vocabulary was fitted on. The "
                "local corpus's count would make idf negative for any "
                "term with df_t > local N (foreign vocabularies are "
                "usually from a larger corpus)."
            )
    n_docs = float(n_docs)
    idf = F.round(
        idf_expr(F.col("df_t").cast("double"), F.lit(n_docs)), 6
    ).cast("decimal(28,6)")
    weighted = (
        exploded.join(_hds(df_table, max_rows=_VMAX), "term", "left")
        .select(
            "id",
            # pad rows (NULL term) would hash to a NULL bucket, and a
            # NULL map key is illegal: park them on -1, never looked up
            F.coalesce(
                hash_bucket_expr(F.col("term"), dim).cast("int"),
                F.lit(-1),
            ).alias("_b"),
            # explode_outer pad rows and OOV terms (foreign df_table)
            # contribute nothing
            F.when(
                F.col("term").isNull() | F.col("df_t").isNull(),
                F.lit(0.0).cast("decimal(28,6)"),
            )
            .otherwise(idf)
            .alias("_w"),
        )
    )
    sums = weighted.groupBy("id", "_b").agg(
        F.sum("_w").cast("decimal(38,6)").cast("double").alias("_v")
    )
    assembled = sums.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_v")))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(F.col("_m")[j.cast("int")], F.lit(0.0)),
    )
    staged = assembled.select("id", vec.alias("_raw"))
    if normalize:
        nrm = F.sqrt(
            F.aggregate(
                F.col("_raw"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        staged = staged.select(
            "id",
            nrm.alias("_n"),
            F.col("_raw"),
        ).select(
            "id",
            F.when(
                F.col("_n") > 0,
                F.transform(F.col("_raw"), lambda x: x / F.col("_n")),
            )
            .otherwise(F.col("_raw"))
            .alias("embedding"),
        )
    else:
        staged = staged.select("id", F.col("_raw").alias("embedding"))
    return staged


# --------------------------------------------------------------------------
# classifier TRAINING: batch logistic regression over hashed features
# --------------------------------------------------------------------------


def classifier_fit(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    dim: int = 4096,
    iters: int = 10,
    lr: float = 0.5,
    l2: float = 0.0,
    analyzer: str = "simple",
    persist: bool = True,
) -> tuple[list[float], float, list[float]]:
    """Fit the hashed linear quality classifier that
    :func:`classifier_score` serves: batch-gradient logistic regression
    over md5-bucket token counts. Returns ``(weights, bias,
    loss_history)`` — ``weights``/``bias`` plug straight into
    :func:`classifier_score` / :func:`hashed_score_expr` (training and
    inference share the same feature map BY CONSTRUCTION: a token
    occurrence contributes its bucket weight once in both).

    This is the fastText-style quality-filter fit (CCNet / RefinedWeb /
    DCLM train one against a small labeled seed set, then score the
    whole corpus): training data is SMALL relative to the corpus, but
    still big enough to want the cluster — so each iteration is plain
    DataFrame work, the :func:`~sparksearchengine_spark.operators.
    clustering.kmeans_fit` shape:

    * tokens are analyzed ONCE into a persisted ``(label, tokens)``
      frame (the analyzer — possibly a pandas UDF — never re-runs);
    * margins fold the current weight literal inside the scan
      (``hashed_score_expr``, WholeStageCodegen, no join);
    * the gradient is one explode + one partial-aggregated
      ``groupBy(bucket)`` whose shuffle carries ≤ dim rows per map
      partition; the dim-bounded result (and the scalar loss row) are
      the only driver-side state.

    Loss is the margin-form log-loss ``softplus(z) - y*z`` (overflow-
    safe: ``max(z,0) + log1p(exp(-|z|))``). Determinism matches
    ``kmeans_fit``'s contract: FP partial-agg order — run-to-run stable
    on the same partitioning; the exact cross-engine contract lives on
    INFERENCE with pinned weights (that is what the driver oracle
    checks; the fit is held to quality bars in tests).
    """
    if dim <= 0 or iters < 0:
        raise ValueError("dim must be > 0 and iters >= 0")
    toks = F.coalesce(
        analyzer_expr(F.col(text_col), analyzer),
        F.array().cast("array<string>"),
    )
    base = df.select(
        F.col(label_col).cast("double").alias("_y"), toks.alias("_toks")
    )
    if persist:
        base = base.persist()
    n = base.count()
    if n == 0:
        raise ValueError("classifier_fit got an empty DataFrame")
    w = [0.0] * dim
    b = 0.0
    history: list[float] = []
    try:
        for _ in range(iters):
            z = hashed_score_expr(
                F.lit(None).cast("string"),
                w,
                b,
                analyzer,
                tokens=F.col("_toks"),
            )
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            r = (p - F.col("_y")).alias("_r")
            logloss = (
                F.greatest(z, F.lit(0.0))
                + F.log1p(F.exp(-F.abs(z)))
                - F.col("_y") * z
            )
            head = base.agg(
                F.sum(logloss).alias("_loss"), F.sum(p - F.col("_y")).alias("_rb")
            ).collect()[0]
            history.append(float(head["_loss"]) / n)
            grad_rows = (
                base.select(r, F.explode("_toks").alias("_t"))
                .select(
                    hash_bucket_expr(F.col("_t"), dim).alias("_b"), "_r"
                )
                .groupBy("_b")
                .agg(F.sum("_r").alias("_g"))
                .collect()  # <= dim rows
            )
            for row in grad_rows:
                bkt = int(row["_b"])
                w[bkt] -= lr * (float(row["_g"]) / n + l2 * w[bkt])
            b -= lr * float(head["_rb"]) / n
    finally:
        if persist:
            try:
                base.unpersist()
            except Exception:
                pass
    return w, b, history
