"""Deterministic sampling / split operators for training-data pipelines.

A 100 TB curation pipeline cannot use RNG-state sampling (`df.sample`,
`sampleBy`): results change across retries, partitionings, and engine
versions, which breaks resumable runs and train/test hygiene. Everything
here derives membership from a *content hash of a stable key*, so:

  * re-running any subset of partitions reproduces the same sample;
  * the sample is identical on any engine that can compute md5 (the
    DuckDB oracles mirror the expressions exactly);
  * upstream filters/joins don't perturb membership (no row ordering or
    partition-index dependence, unlike rand(seed) / monotonically_id).

All expressions are scan-stage column ops — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 10_000 buckets -> fractions are honored to 1e-4 resolution
DEFAULT_BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from the md5 of the key's string
    form. First 8 hex chars -> 32-bit int (portable: DuckDB spells it
    CAST('0x' || substr(md5(k), 1, 8) AS BIGINT))."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return h.cast("long") % buckets


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < fraction(stratum) * buckets —
    the deterministic analog of ``DataFrame.sampleBy`` used for domain
    mixing (e.g. up-/down-weighting sources or languages to target
    proportions). Strata absent from ``fractions`` fall back to
    ``default_fraction``."""
    pairs: list[Column] = []
    for k, v in sorted(fractions.items()):
        pairs += [F.lit(k), F.lit(float(v))]
    frac = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)], F.lit(float(default_fraction))
    )
    keep = hash_bucket(F.col(key_col), buckets) < (frac * buckets)
    return df.where(keep)


def sample_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str,
) -> DataFrame:
    """Deterministic "take n rows per group" (per-domain caps, per-source
    quotas — the bounded analog of reservoir sampling).

    Membership = the n smallest (hash_bucket-with-full-range, key) rows
    of each group, so it is reproducible across runs/engines/partitions
    and STABLE UNDER GROWTH in the same sense as ``train_test_split``:
    a row's hash never changes, so adding new rows can only displace the
    largest-hash members, never reshuffle the whole sample.

    One rank window per group — at scale the window partitions by
    ``group_col``, so skewed giant groups are the hotspot; the md5 sort
    key spreads ties uniformly, and n ≪ group size means
    WindowGroupLimit prunes partition-locally before any exchange.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def mixture_rates(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    token_col: str,
    cap_at_one: bool = True,
    totals: "dict | None" = None,
) -> dict[str, float]:
    """Per-group keep fractions that realize a target token MIXTURE under
    a total token budget: rate(g) = min(1, budget * w_g / tokens_g) with
    weights normalized to sum 1 (the Pile / LLaMA "data mixing" recipe:
    each group contributes ~budget * w_g tokens, capped by availability —
    a group too small to fill its share keeps everything; re-allocating
    the surplus is the caller's policy decision, not silently done).

    One tiny aggregation job (|groups| rows — domains/langs, driver-small
    by construction); groups not in ``weights`` get rate 0.0, as do
    groups whose total is 0 (keeping token-less rows spends no budget but
    realizes no mixture either).

    ``cap_at_one=False`` leaves rates uncapped (rate 2.6 = "this group
    should contribute 2.6x its corpus"), for the data-constrained
    up-sampling regime (Muennighoff et al. 2023: small high-quality
    domains repeat for multiple epochs) — pair with
    ``mixture_sample(allow_repeats=True)``.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    sw = float(sum(weights.values()))
    if sw <= 0:
        raise ValueError("weights must sum to > 0")
    if totals is None:
        totals = group_token_totals(df, group_col, token_col)
    rates: dict[str, float] = {}
    for g, t in totals.items():
        w = weights.get(g)
        if g is None or w is None or not t:
            continue  # unweighted / empty groups keep nothing
        # scale precomputed driver-side; the single / is the only
        # data-dependent float op, so any engine computing
        # scale / total gets the bit-identical rate (oracle parity)
        scale = budget_tokens * (float(w) / sw)
        rates[g] = (scale / t) if not cap_at_one else min(1.0, scale / t)
    return rates


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    key_col: str,
    token_col: str,
    buckets: int = DEFAULT_BUCKETS,
    keep_col: str = "keep",
    allow_repeats: bool = False,
) -> DataFrame:
    """Deterministic down-sampling to a token budget with a target group
    mixture: df + a boolean ``keep`` column, true iff
    hash_bucket(key) < rate(group) * buckets (rates from
    :func:`mixture_rates`).

    ``allow_repeats=True`` switches to the data-constrained up-sampling
    regime: instead of ``keep``, an integer ``n_copies`` column — every
    row repeats floor(rate) times and the hash-selected fractional-part
    slice one extra (so a rate-2.6 group contributes ~2.6 epochs; a
    rate-0.3 group behaves exactly like the capped path). Materialize
    the repeats downstream with
    ``explode(sequence(1, n_copies))`` when the trainer wants physical
    rows; keeping the count symbolic is free until then.

    Same scale shape as :func:`stratified_sample` — one tiny totals
    aggregation, then the membership test is a scan-stage expression
    (rates inline as literals; no join against a rates table). The hash
    membership means the sample is stable under re-runs, repartitioning,
    and corpus growth within each group.
    """
    rates = mixture_rates(
        df, group_col, weights, budget_tokens, token_col,
        cap_at_one=not allow_repeats,
    )
    pairs: list[Column] = []
    for g, r in sorted(rates.items()):
        pairs += [F.lit(g), F.lit(r)]
    rate = (
        F.coalesce(F.create_map(*pairs)[F.col(group_col)], F.lit(0.0))
        if pairs
        else F.lit(0.0)
    )
    h = hash_bucket(F.col(key_col), buckets)
    if not allow_repeats:
        return df.withColumn(keep_col, h < rate * buckets)
    whole = F.floor(rate).cast("long")
    frac = rate - F.floor(rate)
    return df.withColumn(
        "n_copies", whole + (h < frac * buckets).cast("long")
    )


def select_top_by_budget(
    df: DataFrame,
    group_col: str,
    score_col: str,
    token_col: str,
    budgets: dict[str, int],
    key_col: str = "doc_id",
    keep_col: str = "keep",
) -> DataFrame:
    """Quality-aware budget selection: per group, keep the BEST-scoring
    rows whose cumulative token count fits the group's budget — the
    post-classifier companion to :func:`mixture_sample`'s hash-random
    choice (rank by a quality score instead of sampling uniformly).

    Rule: rows ranked by (score desc, key asc — deterministic ties);
    a row is kept iff the cumulative tokens *through it* stay within
    budget. Greedy-prefix (not knapsack): the first row that overflows
    is cut, later smaller rows are NOT pulled forward — this keeps the
    answer a pure window expression and the quality ordering strict.
    Groups absent from ``budgets`` keep nothing.

    Scale: DISTRIBUTED cumsum (r9, ``distributed_prefix``) — the old
    per-group window put a giant group's entire sort in ONE task; now
    it is one range shuffle + parallel per-partition sums + broadcast
    prefix offsets. (score desc, key asc) is a total order, and the
    token cumsum is a long sum — engine-exact under the regrouping.
    Budgets are driver literals.
    """
    from sparksearchengine_spark.operators.prefix import distributed_prefix

    pairs: list[Column] = []
    for g, b in sorted(budgets.items()):
        pairs += [F.lit(g), F.lit(int(b)).cast("long")]
    budget = F.create_map(*pairs)[F.col(group_col)] if pairs else F.lit(None)
    cum_col = "_sb_cum"
    out = distributed_prefix(
        df,
        order=[F.col(score_col).desc(), F.col(key_col).asc()],
        groups=[group_col],
        sum_cols={token_col: cum_col},
    )
    return out.withColumn(
        keep_col, F.coalesce(F.col(cum_col) <= budget, F.lit(False))
    ).drop(cum_col)


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    buckets: int = DEFAULT_BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic split column ('train' / 'test') from the key hash.
    The same key always lands in the same split — across runs, engines,
    and data additions — which is the property that prevents train/test
    leakage when the corpus is rebuilt or extended.

    For *near*-duplicate leakage (two different keys, same content) run a
    canonicalized dedup first (operators/dedup.py) and split on the
    canon_id, so every member of a duplicate cluster lands in one side.
    """
    is_test = hash_bucket(F.col(key_col), buckets) < F.lit(
        float(test_fraction)
    ) * buckets
    return df.withColumn(
        split_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def group_token_totals(
    df: DataFrame, group_col: str, token_col: str
) -> dict:
    """{group: total tokens} — the one tiny aggregation the mixture
    family shares; compute once and pass via ``totals=`` when composing
    :func:`temperature_weights` with :func:`mixture_rates` (saves
    repeated scans of the token counts)."""
    return {
        r["g"]: r["t"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.sum(F.col(token_col)).alias("t"))
        .collect()
    }


def temperature_weights(
    df: DataFrame,
    group_col: str,
    token_col: str,
    alpha: float = 0.5,
    totals: "dict | None" = None,
) -> dict[str, float]:
    """Data-derived mixture weights with temperature smoothing:
    ``w_g ∝ tokens_g ** alpha``, normalized to sum 1 — the multilingual
    sampling standard (XLM-R / mBERT exponential smoothing): ``alpha=1``
    reproduces the natural distribution, ``alpha→0`` flattens toward
    uniform, the usual 0.3–0.7 band up-weights low-resource groups
    without drowning the head.

    One tiny totals aggregation (|groups| rows, driver-small); feed the
    result straight into :func:`mixture_rates` / :func:`mixture_sample`.
    Groups with zero/NULL totals (or a NULL group key) are dropped —
    they have nothing to contribute. ``alpha == 0.5`` uses ``sqrt``
    (IEEE-correctly-rounded, hence engine-portable); other alphas use
    ``pow``. Accumulation runs in sorted group order so the
    normalization is deterministic.
    """
    import math

    if not (0.0 < float(alpha) <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if totals is None:
        totals = group_token_totals(df, group_col, token_col)
    pw = {}
    for g in sorted(k for k in totals if k is not None):
        t = totals[g]
        if not t:
            continue
        pw[g] = (
            math.sqrt(float(t))
            if float(alpha) == 0.5
            else float(t) ** float(alpha)
        )
    s = 0.0
    for g in pw:  # insertion order == sorted order
        s += pw[g]
    if s <= 0:
        raise ValueError("no group has a positive token total")
    return {g: p / s for g, p in pw.items()}


def temperature_mixture_sample(
    df: DataFrame,
    group_col: str,
    budget_tokens: int,
    key_col: str,
    token_col: str,
    alpha: float = 0.5,
    **kw,
) -> DataFrame:
    """:func:`mixture_sample` with :func:`temperature_weights`-derived
    weights — 'sample to this token budget, smoothing the group
    distribution with temperature alpha' in one call."""
    w = temperature_weights(df, group_col, token_col, alpha=alpha)
    return mixture_sample(
        df, group_col, w, budget_tokens,
        key_col=key_col, token_col=token_col, **kw,
    )
