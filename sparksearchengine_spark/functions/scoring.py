"""Relevance scoring as plain Spark column expressions.

The reference scores with Lucene similarities (BM25 default, k1=1.2 b=0.75,
`impl/LuceneConfig.scala:182,210`; configurable
`ConfigurableBM25Similarity.scala:7-30`; global-IDF variants
`BM25WithGlobalIDFSimilarity.scala:14-76`, `TFIDFWithGlobalIDFSimilarity
.scala:14-76`; IDF formula `utils/IDFUtils.scala:28`). Per-index (local)
statistics make cross-partition scores incomparable — a compromise the
reference documents (`SearchableRDD.scala:22-27`) and works around with its
"global IDF" mode.

Here statistics are corpus-global *by construction* (one termstats
DataFrame per corpus), so every score is globally comparable and there is
nothing to broadcast by hand. Scores are pure column expressions over
``tf``, ``dl`` (doc length) and ``df_t`` (document frequency) plus two
scalars (``doc_count``, ``avgdl``) — no UDF, fully inside whole-stage
codegen, and reproducible in any SQL engine (the DuckDB oracle runs the
same formula).

Divergence from the reference, recorded in SURVEY §4.4: the reference feeds
``totalTermFreq`` where BM25 expects ``docFreq`` (`LuceneIndex.scala:173`).
We use true docFreq.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def _as_col(x) -> Column:  # type: ignore[no-untyped-def]
    """Accept either a scalar (resolved at compile time) or a Column (e.g.
    batch search across fields with differing stats)."""
    return x if isinstance(x, Column) else F.lit(float(x))


def idf_expr(df_t: Column, doc_count) -> Column:  # type: ignore[no-untyped-def]
    """idf = ln(1 + (N - df + 0.5) / (df + 0.5))  (Lucene BM25 idf)."""
    n = _as_col(doc_count)
    return F.log(1.0 + (n - df_t + F.lit(0.5)) / (df_t + F.lit(0.5)))


def bm25_term_score(
    tf: Column,
    dl: Column,
    df_t: Column,
    doc_count,
    avgdl,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> Column:
    """Per-(term, doc) BM25 contribution.

    score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    """
    idf = idf_expr(df_t, doc_count)
    denom = tf + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * dl / _as_col(avgdl)
    )
    return idf * (tf * F.lit(float(k1) + 1.0)) / denom


def tfidf_term_score(
    tf: Column,
    dl: Column,
    df_t: Column,
    doc_count,
    avgdl,  # unused; uniform signature
) -> Column:
    """Classic TF-IDF (Lucene ClassicSimilarity shape): sqrt(tf) * idf^2.

    Reference analog: `TFIDFWithGlobalIDFSimilarity.scala:14-76` (classic
    similarity with the global idf override; we keep the idf^2 weighting of
    ClassicSimilarity's tf*idf^2 product, dropping index-time norms).
    """
    return F.sqrt(tf) * F.pow(idf_expr(df_t, doc_count), F.lit(2.0))


LMD_MU = 2000.0
LMJM_LAMBDA = 0.7

# Similarities that need collection term frequency (cf_t = total
# occurrences of the term in the field, not docFreq). The reference can
# configure any Lucene Similarity (`LuceneConfig.scala:131-144`);
# LMDirichlet / LMJelinekMercer are the standard language-model family.
COLLECTION_SIMILARITIES = ("lmd", "lmjm")


def lmd_term_score(
    tf: Column,
    dl: Column,
    cf_t: Column,
    total_tokens,  # scalar or Column
    mu: float = LMD_MU,
) -> Column:
    """LM with Dirichlet smoothing (Lucene ``LMDirichletSimilarity``):

        p(t|C) = (cf_t + 1) / (total_tokens + 1)
        score  = max(0, ln(1 + tf / (mu * p)) + ln(mu / (dl + mu)))

    The +1 smoothing and the clamp-at-zero mirror Lucene's ``LMStats
    .collectionProbability`` and ``LMDirichletSimilarity.score``. Pure
    codegen column expression, reproducible in any SQL engine.
    """
    p = (cf_t + F.lit(1.0)) / (_as_col(total_tokens) + F.lit(1.0))
    s = F.log(F.lit(1.0) + tf / (F.lit(float(mu)) * p)) + F.log(
        F.lit(float(mu)) / (dl + F.lit(float(mu)))
    )
    return F.greatest(s, F.lit(0.0))


def lmjm_term_score(
    tf: Column,
    dl: Column,
    cf_t: Column,
    total_tokens,  # scalar or Column
    lam: float = LMJM_LAMBDA,
) -> Column:
    """LM with Jelinek-Mercer smoothing (Lucene
    ``LMJelinekMercerSimilarity``):

        p(t|C) = (cf_t + 1) / (total_tokens + 1)
        score  = ln(1 + ((1 - lambda) * tf / dl) / (lambda * p))

    Always positive (the log argument is > 1 whenever tf > 0), so no
    clamp is needed.
    """
    p = (cf_t + F.lit(1.0)) / (_as_col(total_tokens) + F.lit(1.0))
    return F.log(
        F.lit(1.0)
        + (F.lit(1.0 - float(lam)) * tf / dl) / (F.lit(float(lam)) * p)
    )


# scorer signature: (tf, dl, df_t, doc_count, avgdl) -> Column
Scorer = Callable[[Column, Column, Column, float, float], Column]

_SCORERS: dict[str, Scorer] = {}


def register_scorer(name: str, fn: Scorer) -> None:
    """Pluggable similarity (reference: any Lucene Similarity via config,
    `LuceneConfig.scala:131-144`)."""
    _SCORERS[name] = fn


register_scorer("bm25", bm25_term_score)
register_scorer("tfidf", tfidf_term_score)


def get_scorer(name: str) -> Scorer:
    try:
        return _SCORERS[name]
    except KeyError:
        raise ValueError(
            f"unknown scorer {name!r}; registered: {sorted(_SCORERS)}"
        ) from None


@dataclass(frozen=True)
class ScoringConfig:
    """Engine-level scoring configuration (reference: `LuceneConfig`).

    ``mu`` / ``lam`` only apply to the language-model similarities
    (``lmd`` / ``lmjm``); those also need the collection term frequency,
    which call sites provide via ``cf_t`` (see :attr:`needs_cf`).
    """

    similarity: str = "bm25"
    k1: float = BM25_K1
    b: float = BM25_B
    mu: float = LMD_MU
    lam: float = LMJM_LAMBDA

    @property
    def needs_cf(self) -> bool:
        """True when :meth:`term_score` requires the ``cf_t`` column
        (collection term frequency) — the LM similarity family."""
        return self.similarity in COLLECTION_SIMILARITIES

    def term_score(
        self,
        tf: Column,
        dl: Column,
        df_t: Column,
        doc_count: float,
        avgdl: float,
        cf_t: Column | None = None,
    ) -> Column:
        if self.similarity == "bm25":
            return bm25_term_score(
                tf, dl, df_t, doc_count, avgdl, k1=self.k1, b=self.b
            )
        if self.similarity in COLLECTION_SIMILARITIES:
            if cf_t is None:
                raise ValueError(
                    f"similarity {self.similarity!r} needs the collection "
                    "term frequency; pass cf_t= (SearchIndex call sites "
                    "join index.collection_stats(field) automatically)"
                )
            # total field tokens from the two stats every call site has:
            # doc_count * avgdl == sum(dl) exactly (avgdl is sum/count in
            # double in BOTH engines, so the product round-trips)
            if isinstance(doc_count, Column) or isinstance(avgdl, Column):
                tot = _as_col(doc_count) * _as_col(avgdl)
            else:
                tot = float(doc_count) * float(avgdl)
            if self.similarity == "lmd":
                return lmd_term_score(tf, dl, cf_t, tot, mu=self.mu)
            return lmjm_term_score(tf, dl, cf_t, tot, lam=self.lam)
        return get_scorer(self.similarity)(tf, dl, df_t, doc_count, avgdl)


def decay_expr(
    age: Column,
    scale: float,
    kind: str = "exp",
    offset: float = 0.0,
    decay: float = 0.5,
) -> Column:
    """Recency/distance decay multiplier in (0, 1] — the
    function_score-style decay every search engine ships (Elasticsearch
    exp/gauss/linear): a document at ``age == offset + scale`` scores
    ``decay``; closer scores more, farther less.

    ``age`` is any non-negative numeric distance column (seconds since
    publish, meters, …). Ages within ``offset`` decay nothing. All three
    kinds are pure codegen column expressions:

    With ``d = max(0, age - offset) / scale`` (the clamp applies to ALL
    three kinds — in-grace ages always score exactly 1):

    * ``exp``:    ``decay ** d``
    * ``gauss``:  ``decay ** (d ** 2)``
    * ``linear``: ``max(0, 1 - (1 - decay) * d)``
      (reaches exactly 0 at the far end, unlike exp/gauss)

    Compose multiplicatively with any relevance score:
    ``results.withColumn("score", F.col("score") * decay_expr(...))``
    then re-rank — the idiom `operators/search.py` result transformers
    expect. NULL age -> NULL multiplier (carry or coalesce per use).
    """
    if kind not in ("exp", "gauss", "linear"):
        raise ValueError(f"kind must be exp|gauss|linear, got {kind!r}")
    if scale <= 0:
        raise ValueError(f"scale must be > 0, got {scale}")
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    # greatest() SKIPS NULLs in Spark (greatest(0.0, NULL) = 0.0), so
    # the NULL-age -> NULL contract needs an explicit guard
    d = F.greatest(F.lit(0.0), age.cast("double") - F.lit(float(offset)))
    n = d / F.lit(float(scale))
    if kind == "exp":
        out = F.pow(F.lit(float(decay)), n)
    elif kind == "gauss":
        out = F.pow(F.lit(float(decay)), n * n)
    else:
        out = F.greatest(
            F.lit(0.0), F.lit(1.0) - F.lit(1.0 - float(decay)) * n
        )
    return F.when(age.isNotNull(), out)
