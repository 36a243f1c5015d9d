"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over hashed n-gram features.

The standard recipe for "make my 100 TB raw crawl look like my curated
target corpus": estimate two bag-of-hashed-ngram distributions (raw and
target), weight every raw document by how much more likely its features
are under the target, then sample proportionally to those importance
weights. Everything here is the published construction re-expressed as
DataFrame ops:

* **Features** — unigrams + adjacent bigrams of the analyzed token
  stream, each hashed into ``dim`` buckets with the repo-wide md5 bucket
  rule (``operators/sampling.py::hash_bucket`` idiom), so features are
  engine-portable and the DuckDB oracle replicates them exactly.
* **Distributions** — one groupBy(bucket) count per corpus. ``dim`` is
  small (paper uses 10k), so partial aggregation collapses the explode
  map-side and the shuffle carries ≤ ``dim`` rows per partition.
* **Log-ratio table** — ``ln p_target(b) − ln p_raw(b)`` with add-alpha
  smoothing, materialized once as a ≤ ``dim``-row table and broadcast;
  ratios are rounded to 6dp and carried as DECIMAL so per-doc sums are
  bit-exact across engines and summation orders (the repo's stable-sum
  idiom).
* **Per-doc weight** — explode features, one broadcast join, one
  groupBy(id) decimal sum: a single doc-keyed shuffle with map-side
  partial aggregation. No collect of anything document-sized.
* **Resampling** — deterministic Gumbel-top-k (Vieira 2014; Kool et al.
  2019): ``key = log_weight/temperature + Gumbel(md5(id))`` and take the
  global top n — equivalent in distribution to sampling n docs without
  replacement ∝ softmax(weights/temperature), but RNG-free, so reruns
  and engines agree row-for-row. The top-n is one TakeOrdered job.

At 100 TB: ONE hashed-gram generation pass over the raw corpus — the
exploded ``(id, bucket)`` features are persisted once and re-read by both
the bucket-count aggregation and the scoring join — plus one pass over
the (much smaller) target; all joins against the bucket table are
broadcast; the only wide shuffle keys on doc id. The feature cache is
(8+8) bytes per gram occurrence (≈16 B x token count, disk-backed via
MEMORY_AND_DISK), far cheaper than re-running the analyzer + md5 over
the raw text; callers at the extreme end can pass
``cache_features=False`` to trade the disk for a second compute pass,
and ``release_feature_caches()`` frees the blocks when done.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearchengine_spark.functions.analyzers import analyzer_expr
from sparksearchengine_spark.operators.sampling import hash_bucket

# buckets above this stop being "a small dim table" — fall back to a
# shuffle join rather than broadcasting gigabytes
BROADCAST_MAX_BUCKETS = 1_000_000

# persisted exploded-feature frames live here until released, mirroring
# SearchIndex._phrase_caches (operators/index.py:301) — no silent leaked
# cached blocks (ADVICE r3)
_feature_caches: list[DataFrame] = []


def release_feature_caches() -> None:
    """Unpersist every exploded-feature cache created by
    :func:`dsir_log_weights` fits in this session."""
    for df in _feature_caches:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _feature_caches.clear()


def hashed_ngram_features(
    text: Column, analyzer: str = "simple", dim: int = 10_000
) -> Column:
    """Array of hashed feature ids for ``text``: md5-bucket of every
    unigram and every adjacent bigram (space-joined) of the analyzed
    token stream. One scan-stage expression, no shuffle. Empty/NULL text
    yields an empty array."""
    toks = F.coalesce(
        analyzer_expr(text, analyzer), F.array().cast("array<string>")
    )
    bigrams = F.zip_with(
        toks,
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # zip_with pads the shorter side with NULL -> concat_ws drops the
    # NULL, leaving the bare last token; cut it off explicitly
    bigrams = F.slice(bigrams, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    grams = F.concat(toks, bigrams)
    return F.transform(grams, lambda g: hash_bucket(g, dim))


def _bucket_counts(
    df: DataFrame, text_col: str, analyzer: str, dim: int, out: str
) -> DataFrame:
    feats = hashed_ngram_features(F.col(text_col), analyzer, dim)
    return (
        df.select(F.explode(feats).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias(out))
    )


def dsir_bucket_logratio(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    analyzer: str = "simple",
    dim: int = 10_000,
    alpha: float = 1.0,
    raw_exploded: DataFrame | None = None,
) -> DataFrame:
    """The ≤ ``dim``-row importance table: ``(bucket, log_ratio)`` where
    ``log_ratio = round(ln p_t(b) − ln p_r(b), 6)`` under add-``alpha``
    smoothing (``p(b) = (c_b + alpha) / (total + alpha·dim)``).

    Buckets unseen in BOTH corpora are omitted from the keyed rows —
    their ratio is the constant ``ln(alpha/(T_t+alpha·dim)) −
    ln(alpha/(T_r+alpha·dim))``, carried on a ``bucket = -1`` SENTINEL
    row (md5 buckets are always ≥ 0) that :func:`dsir_log_weights`
    applies as the unseen-bucket default — a novel-gram-heavy NEW corpus
    scored against a reused table gets the correct constant, not 0
    (r3 review). Rounding to 6dp here makes every downstream sum
    decimal-exact across engines.

    ``raw_exploded`` — a persisted ``(…, bucket)`` frame from an earlier
    explode of the raw side (``explode_outer`` pad rows carry a NULL
    bucket and are excluded) — lets :func:`dsir_log_weights` share ONE
    hashed-gram generation pass between this count and its scoring join.
    """
    if raw_exploded is not None:
        rc = (
            raw_exploded.where(F.col("bucket").isNotNull())
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("c_raw"))
        )
    else:
        rc = _bucket_counts(raw_df, text_col, analyzer, dim, "c_raw")
    tc = _bucket_counts(target_df, text_col, analyzer, dim, "c_tgt")
    if dim <= BROADCAST_MAX_BUCKETS:
        # materialize the dim-bounded counts driver-side: ONE gram pass
        # per corpus total. Leaving them lazy re-runs the full hashed-
        # gram generation for every consumer (the totals, the join, the
        # scoring join) — measured 5 corpus passes instead of 2 before
        # this (r3 bench finding). dim rows collect in MBs at most.
        spark = raw_df.sparkSession
        merged: dict[int, list[int]] = {}
        for r in rc.collect():
            merged.setdefault(r["bucket"], [0, 0])[0] = r["c_raw"]
        for r in tc.collect():
            merged.setdefault(r["bucket"], [0, 0])[1] = r["c_tgt"]
        t_raw = sum(v[0] for v in merged.values())
        t_tgt = sum(v[1] for v in merged.values())
        denom_r = float(t_raw) + alpha * dim
        denom_t = float(t_tgt) + alpha * dim
        default = round(
            math.log(alpha / denom_t) - math.log(alpha / denom_r), 6
        )
        rows = [
            (
                b,
                round(
                    math.log((ct + alpha) / denom_t)
                    - math.log((cr + alpha) / denom_r),
                    6,
                ),
            )
            for b, (cr, ct) in merged.items()
        ] + [(-1, default)]  # unseen-bucket sentinel
        return F.broadcast(
            spark.createDataFrame(rows, "bucket long, log_ratio double")
        )
    # huge-dim path: keep distributed; persist the counts only until the
    # joined ratio table is materialized, then release them (no leaked
    # cached blocks — r3 review)
    rc, tc = rc.persist(), tc.persist()
    t_raw = rc.agg(F.sum("c_raw")).collect()[0][0] or 0
    t_tgt = tc.agg(F.sum("c_tgt")).collect()[0][0] or 0
    denom_r = float(t_raw) + alpha * dim
    denom_t = float(t_tgt) + alpha * dim
    joined = rc.join(tc, "bucket", "full_outer").select(
        "bucket",
        F.coalesce(F.col("c_raw"), F.lit(0)).alias("c_raw"),
        F.coalesce(F.col("c_tgt"), F.lit(0)).alias("c_tgt"),
    )
    ratio = F.round(
        F.log((F.col("c_tgt") + F.lit(alpha)) / F.lit(denom_t))
        - F.log((F.col("c_raw") + F.lit(alpha)) / F.lit(denom_r)),
        6,
    )
    default = round(
        math.log(alpha / denom_t) - math.log(alpha / denom_r), 6
    )
    sentinel = raw_df.sparkSession.createDataFrame(
        [(-1, default)], "bucket long, log_ratio double"
    )
    out = (
        joined.select("bucket", ratio.alias("log_ratio"))
        .unionByName(sentinel)
        .persist()
    )
    out.count()  # materialize, then the upstream caches can go
    rc.unpersist()
    tc.unpersist()
    return out


def dsir_log_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "simple",
    dim: int = 10_000,
    alpha: float = 1.0,
    logratio_df: DataFrame | None = None,
    cache_features: bool = True,
) -> DataFrame:
    """Per-raw-doc DSIR importance weight: ``(id, n_feats, log_weight)``
    with ``log_weight = Σ_occurrences log_ratio(bucket)`` (feature
    multiplicity counts, per the paper's product over the doc's hashed
    n-grams). Docs with no features get weight 0.

    Pass a precomputed ``logratio_df`` to score several corpora against
    one fitted table (the fit is the expensive half). The sum is decimal
    (each addend already rounded to 6dp by the table), so the result is
    identical under any aggregation order — the property the DuckDB
    oracle checks bitwise.

    When fitting here (``logratio_df is None``) the exploded raw-side
    features are persisted and shared between the bucket-count pass and
    the scoring join, so the raw corpus is analyzed + hashed exactly once
    (r3 bench finding: the duplicated gram generation was the dominant
    cost). The cache is registered in ``_feature_caches`` — call
    :func:`release_feature_caches` to free it; a NEW fit auto-releases
    the previous fit's cache first (stale caches are never reused, so
    repeated fits stay bounded at one cached frame);
    ``cache_features=False`` skips it (two compute passes, zero
    storage)."""
    feats = hashed_ngram_features(F.col(text_col), analyzer, dim)
    exploded = raw_df.select(
        F.col(id_col), F.explode_outer(feats).alias("bucket")
    )
    if logratio_df is None:
        if cache_features:
            # a stale fit's cache is never reused by a new fit (the
            # exploded frame is per-call): auto-release the previous one
            # so repeated fits can't accumulate corpus-token-scale blocks
            # for the life of the session (ADVICE r4)
            release_feature_caches()
            exploded = exploded.persist()
            _feature_caches.append(exploded)
        logratio_df = dsir_bucket_logratio(
            raw_df, target_df, text_col, analyzer, dim, alpha,
            raw_exploded=exploded,
        )
    # the unseen-bucket default rides the table's bucket=-1 sentinel row
    # (one tiny job on a ≤dim-row table); 0.0 if a caller passes a
    # hand-built table without one
    sent = logratio_df.where(F.col("bucket") == -1).collect()
    default = sent[0]["log_ratio"] if sent else 0.0
    scored = exploded.join(
        logratio_df.where(F.col("bucket") >= 0), "bucket", "left"
    ).select(
        id_col,
        F.when(F.col("bucket").isNull(), None)  # explode_outer pad row
        .otherwise(
            F.coalesce(F.col("log_ratio"), F.lit(float(default))).cast(
                "decimal(28,6)"
            )
        )
        .alias("_lr"),
    )
    return scored.groupBy(id_col).agg(
        F.count("_lr").cast("long").alias("n_feats"),
        F.coalesce(F.sum("_lr"), F.lit(0))
        .cast("decimal(38,6)")
        .cast("double")
        .alias("log_weight"),
    )


def gumbel_key(col: Column, weight: Column, temperature: float = 1.0) -> Column:
    """Deterministic Gumbel perturbation: ``weight/temperature + g`` with
    ``g = −ln(−ln(u))`` and ``u = (md5bucket(col) + 0.5) / 2^20`` — an
    RNG-free uniform that any md5-capable engine reproduces. Rounded to
    6dp so cross-engine ulp noise in ln cannot flip an ordering."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    u = (hash_bucket(col, 1 << 20) + F.lit(0.5)) / F.lit(float(1 << 20))
    return F.round(weight / F.lit(float(temperature)) - F.log(-F.log(u)), 6)


def dsir_sample(
    weights_df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k resampling over ``dsir_log_weights`` output: the n
    rows with the largest perturbed keys — distributionally, n draws
    without replacement ∝ exp(weight/temperature), deterministically.
    One global TakeOrdered (n ≪ corpus; no full sort materializes).
    Adds ``sample_key`` for auditability."""
    key = gumbel_key(F.col(id_col), F.col(weight_col), temperature)
    return (
        weights_df.withColumn("sample_key", key)
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(n)
    )
