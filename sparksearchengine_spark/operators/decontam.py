"""Benchmark decontamination + corpus language-model statistics.

Training-data-pipeline operators beyond the reference's search surface
(BASELINE.json north star): before a corpus feeds a training run you need
to (a) strip documents that overlap the eval benchmarks (n-gram
decontamination, the GPT-3/PaLM appendix-C procedure), (b) know the
corpus vocabulary / Zipf profile (tokenizer training, coverage budgets),
and (c) score documents by a cheap unigram LM (perplexity-proxy quality
filter, the CCNet/RefinedWeb shape with the KenLM swapped for the
corpus's own unigram model so the operator is closed over its inputs).

Scale shapes (the part that must survive 100 TB):

* ``ngram_decontaminate`` — the eval side is a benchmark (thousands of
  docs), the train side is the corpus. Eval grams are DISTINCT'd and
  broadcast when small (probed, same policy as
  ``operators/search.py::_hint_query_side``); the corpus side is one
  explode + one left-semi-shaped aggregation keyed on the gram — never a
  cross product, and the corpus is never shuffled by raw text (only the
  matched grams ride the join).
* ``vocab_stats`` — one explode + one groupBy(term). The rank/cumulative
  window runs over the VOCAB (|V| ≪ corpus, millions not billions) and
  is bounded by ``top_k`` before any global sort.
* ``unigram_logprob`` — two passes: the vocab aggregate above, then an
  explode + join(term) + per-doc aggregate. The vocab side is broadcast
  when small; OOV terms (scoring against a foreign ``freq_df``) take an
  add-one floor so the score is total, never null.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksearchengine_spark.functions.analyzers import analyzer_expr
from sparksearchengine_spark.operators.dedup import token_ngrams, _widen

# same policy as the search-side joins: plan-stats fast path, memoized
# exact probe for the ambiguous middle (see search.py::decide_broadcast —
# parquet sizeInBytes is compressed, so a bare byte bound under-estimates).
BROADCAST_MAX_EVAL_ROWS = 1_000_000

# r12: unigram/bigram_logprob persist their exploded token/pair frame so
# the corpus is tokenized ONCE per call instead of once per consumer
# (the self-LM count pass(es) + the scoring join probe each re-ran the
# analyzer — 3 full corpus scans; the same duplicated-gram-generation
# class the r3 bench found dominant in dsir). Same lifecycle rule as
# dsir's _feature_caches: a new call auto-releases the previous call's
# cache (bounded at one frame per process), and release_lm_caches()
# frees the blocks when done.
_lm_caches: list[DataFrame] = []


def release_lm_caches() -> None:
    """Unpersist the exploded-token caches of the last
    ``unigram_logprob``/``bigram_logprob`` call (see ``_lm_caches``)."""
    for df in _lm_caches:
        try:
            df.unpersist()
        except Exception:  # pragma: no cover - session already gone
            pass
    _lm_caches.clear()


def _maybe_broadcast(
    side: DataFrame, force: bool | None, max_rows: int
) -> DataFrame:
    if force is None:
        from sparksearchengine_spark.operators.search import decide_broadcast

        # every side this module sizes is a DERIVED frame — exploded
        # gram tables (size stats don't model the fan-out: they look
        # tiny) or distinct-vocab aggregates (stats stay corpus-sized:
        # they look huge) — so the byte shortcuts are wrong in BOTH
        # directions; go straight to the memoized exact probe.
        force = decide_broadcast(side, max_rows, trust_bytes=False)
    return F.broadcast(side) if force else side.hint("shuffle_hash")


def ngram_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    min_hit_grams: int = 1,
    broadcast_eval: bool | None = None,
) -> DataFrame:
    """Flag training docs sharing ≥ ``min_hit_grams`` token ``n``-grams
    with any eval/benchmark document.

    Returns one row per ``train_df`` row:
    ``(id_col, n_grams, n_hit_grams, contaminated)`` — zero-hit docs
    included (left join), so the caller filters ``~contaminated`` to get
    the clean corpus without a second pass.

    Grams are the analyzer's token n-grams, DISTINCT per doc (hit counts
    are set-intersection sizes, not positional counts — a doc repeating
    one leaked gram 50× is one hit). Short docs (< n tokens) contribute
    their whole-token-sequence gram, matching ``dedup.token_ngrams``.
    """
    # token_ngrams already array_distincts its output
    toks = token_ngrams(analyzer_expr(F.col(text_col), analyzer), n)
    eval_grams = _maybe_broadcast(
        _widen(eval_df)
        .select(F.explode(toks).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1)),
        broadcast_eval,
        BROADCAST_MAX_EVAL_ROWS,
    )
    # materialize the gram array as a column first: size() and explode()
    # then reference ONE evaluation of the tokenize+gram expression
    # instead of recomputing it per consumer (the a8963e3 lesson)
    train_grams = (
        _widen(train_df)
        .select(F.col(id_col), toks.alias("_grams"))
        .select(
            id_col,
            F.size("_grams").alias("n_grams"),
            F.explode("_grams").alias("gram"),
        )
    )
    hits = (
        train_grams.join(eval_grams, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.count("_hit").alias("n_hit_grams"),
        )
    )
    return hits.select(
        id_col,
        "n_grams",
        "n_hit_grams",
        (F.col("n_hit_grams") >= F.lit(min_hit_grams)).alias("contaminated"),
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary: ``(term, tf, df_t, rank, cum_frac)``.

    ``tf`` = total occurrences, ``df_t`` = docs containing, ``rank`` =
    1-based by (tf desc, term asc) — deterministic tiebreak — and
    ``cum_frac`` = the Zipf coverage curve: fraction of all corpus tokens
    covered by terms of rank ≤ this one (the "top-k terms cover x% of
    text" number a tokenizer budget is sized from).

    ``top_k`` bounds the output AFTER ranking (ranks/cum_frac are still
    computed against the full vocabulary).

    The ranking is DISTRIBUTED (r9): a web-scale vocabulary is 10^8-10^9
    terms (typos/URLs/numbers), too big for the single-partition global
    window this used to be. ``distributed_prefix`` (two-pass prefix
    sums) replaces it: (tf desc, term asc) is a total order (terms are
    unique post-groupBy), so rank and the long-summed cumulative tf are
    bit-identical to the global window's."""
    from sparksearchengine_spark.operators.prefix import distributed_prefix

    toks = analyzer_expr(F.col(text_col), analyzer)
    exploded = _widen(df).select(
        F.col(id_col), F.explode(toks).alias("term")
    )
    vocab = exploded.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.count_distinct(id_col).cast("long").alias("df_t"),
    )
    total = vocab.agg(F.sum("tf")).collect()[0][0] or 1
    ranked = distributed_prefix(
        vocab,
        order=[F.col("tf").desc(), F.col("term").asc()],
        sum_cols={"tf": "_cum_tf"},
        rank_col="rank",
    ).select(
        "term",
        "tf",
        "df_t",
        "rank",
        (F.col("_cum_tf") / F.lit(float(total))).alias("cum_frac"),
    )
    if top_k is not None:
        ranked = ranked.where(F.col("rank") <= top_k)
    return ranked


def collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    min_count: int = 5,
    top_k: int | None = None,
) -> DataFrame:
    """Adjacent-bigram collocations ranked by PMI:
    ``(term_a, term_b, n_ab, pmi)``.

    PMI = ln( p(ab) / (p(a)·p(b)) ) with p(ab) over the corpus's adjacent
    bigram count M and p(·) over the token count N. ``min_count`` cuts
    the noise floor (PMI is unstable for rare pairs); ``top_k`` bounds
    output after a (pmi desc, pair asc) rank over the SURVIVING bigrams —
    a vocab-sized window, not a corpus-sized one.

    Shape: one explode to bigrams + one groupBy, one explode to tokens +
    one groupBy, two broadcast-able joins of bigrams→unigram freqs. The
    corpus text never shuffles; only (pair, count) rows do.
    """
    toks = analyzer_expr(F.col(text_col), analyzer)
    base = _widen(df).select(F.col(id_col), toks.alias("_toks"))

    # guard size >= 2 BEFORE sequence(): sequence(1, 0) is a DESCENDING
    # [1, 0] in Spark (implicit step -1), which would index out of bounds
    # on 1-token docs under ANSI mode
    bigrams = (
        base.where(F.size("_toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1), "
                    "i -> struct(_toks[i-1] as a, _toks[i] as b))"
                )
            ).alias("bg")
        )
        .select(F.col("bg.a").alias("term_a"), F.col("bg.b").alias("term_b"))
    )
    bg_counts = bigrams.groupBy("term_a", "term_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_ab")
    )

    uni = base.select(F.explode("_toks").alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    uni = uni.persist()
    n_tokens, n_vocab = (
        uni.agg(F.sum("n_t"), F.count(F.lit(1))).collect()[0] or (1, 0)
    )
    n_tokens = n_tokens or 1
    m_bigrams = bg_counts.agg(F.sum("n_ab")).collect()[0][0] or 1

    # vocab is usually tiny next to the bigram table but unbounded in
    # principle — same size-guarded broadcast policy as the eval-gram
    # join (the stats collect above already knows the row count for free)
    small = n_vocab <= BROADCAST_MAX_EVAL_ROWS
    ua = uni.select(F.col("term").alias("term_a"), F.col("n_t").alias("n_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("n_t").alias("n_b"))
    ua = F.broadcast(ua) if small else ua.hint("shuffle_hash")
    ub = F.broadcast(ub) if small else ub.hint("shuffle_hash")
    scored = (
        bg_counts.where(F.col("n_ab") >= min_count)
        .join(ua, "term_a")
        .join(ub, "term_b")
        .select(
            "term_a", "term_b", "n_ab",
            F.log(
                (F.col("n_ab") / F.lit(float(m_bigrams)))
                / (
                    (F.col("n_a") / F.lit(float(n_tokens)))
                    * (F.col("n_b") / F.lit(float(n_tokens)))
                )
            ).alias("pmi"),
        )
    )
    if top_k is not None:
        # orderBy+limit = TakeOrderedAndProject (distributed per-
        # partition top-k), NOT a single-partition row_number window
        # over every surviving bigram — at web scale the bigram table
        # is billions of rows and the global window was the one
        # serial task in the plan. The (pmi, pair) order is total
        # (pairs are unique), so this is rank-for-rank identical.
        scored = scored.orderBy(
            F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc()
        ).limit(top_k)
    return scored


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    freq_df: DataFrame | None = None,
    broadcast_vocab: bool | None = None,
) -> DataFrame:
    """Per-doc unigram-LM negative log-likelihood (perplexity-proxy
    quality signal): ``(id_col, n_tokens, avg_nll)``.

    ``avg_nll`` = mean over the doc's tokens of ``-ln p(term)``, with
    ``p`` the corpus unigram distribution (or a foreign ``freq_df`` of
    ``(term, tf)`` — a reference-corpus LM, the CCNet arrangement).
    Unusually-high ``avg_nll`` ⇒ rare-token soup (boilerplate, lists,
    noise); unusually-low ⇒ degenerate repetition. Both tails get cut in
    a quality filter, which is why the raw number is returned instead of
    a verdict.

    OOV terms (possible only with a foreign ``freq_df``) take the
    add-one floor ``p = 1/(total+1)``. Empty docs return ``avg_nll = 0``
    (no evidence, not infinite surprise)."""
    toks = analyzer_expr(F.col(text_col), analyzer)
    exploded = _widen(df).select(
        F.col(id_col), F.explode_outer(toks).alias("term")
    )
    if freq_df is None:
        # persist so the corpus tokenizes once, not once per consumer
        # (the total collect below, the vocab build, the scoring probe);
        # the total collect is the first action and single-chain, so it
        # materializes the cache before anything fans out. Lifecycle:
        # _lm_caches (previous call auto-released, release_lm_caches()
        # frees). With a FOREIGN freq_df the self-LM count pass doesn't
        # exist and the probe is the only consumer — nothing to cache.
        release_lm_caches()
        exploded = exploded.persist()
        _lm_caches.append(exploded)
        freq_df = exploded.where(F.col("term").isNotNull()).groupBy(
            "term"
        ).agg(F.count(F.lit(1)).cast("long").alias("tf"))
    total = freq_df.agg(F.sum("tf")).collect()[0][0] or 1
    vocab = _maybe_broadcast(
        freq_df.select(
            "term",
            (F.col("tf") / F.lit(float(total))).alias("_p"),
        ),
        broadcast_vocab,
        BROADCAST_MAX_EVAL_ROWS,
    )
    floor = 1.0 / (float(total) + 1.0)
    scored = exploded.join(vocab, "term", "left").select(
        id_col,
        F.when(F.col("term").isNull(), None)  # explode_outer pad row
        .otherwise(-F.log(F.coalesce(F.col("_p"), F.lit(floor))))
        .alias("_nll"),
    )
    return scored.groupBy(id_col).agg(
        F.count("_nll").cast("long").alias("n_tokens"),
        F.coalesce(F.avg("_nll"), F.lit(0.0)).alias("avg_nll"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    broadcast_vocab: bool | None = None,
) -> DataFrame:
    """Per-doc bigram-LM negative log-likelihood
    ``(id_col, n_bigrams, avg_nll)`` — the next-order perplexity proxy
    above :func:`unigram_logprob`: ``avg_nll`` = mean over the doc's
    adjacent token pairs of ``-ln p(w2|w1)``, with
    ``p(w2|w1) = c(w1,w2) / c(w1,*)`` the corpus MLE conditional.
    Degenerate repetition scores near 0 (each bigram predicts its
    successor perfectly); rare-pair soup scores high — the classic
    both-tails quality cut, one order sharper than unigram.

    Self-corpus LM only (every doc bigram is in the counts — no OOV
    floor needed). Docs with < 2 tokens return ``(0, 0.0)``. Shape: one
    per-row pair construction (scan-stage, guarded so 0/1-token docs
    yield an empty array, never a descending `sequence`), one count
    aggregation per arity, a (size-guarded broadcast) join back, one
    per-doc re-aggregation.
    """
    toks = analyzer_expr(F.col(text_col), analyzer)
    base = _widen(df).select(F.col(id_col), toks.alias("_t"))
    pairs = F.when(
        F.size(F.col("_t")) >= 2,
        F.expr(
            "transform(sequence(1, size(_t) - 1), "
            "i -> struct(element_at(_t, i) AS w1, "
            "element_at(_t, i + 1) AS w2))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
    e = base.select(
        id_col, F.explode_outer(pairs).alias("_p")
    ).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )
    # materialized (persist + count), not bare-persisted: the corpus
    # tokenized+paired ONCE instead of once per consumer (c12 and c1
    # are two INDEPENDENT branches of the vocab-broadcast build job —
    # the stage-race shape — and the scoring probe is a third read).
    # Lifecycle: _lm_caches (previous call auto-released,
    # release_lm_caches() frees).
    release_lm_caches()
    e = e.persist()
    e.count()
    _lm_caches.append(e)
    c12 = e.where(F.col("w1").isNotNull()).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("_c12")
    )
    c1 = e.where(F.col("w1").isNotNull()).groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("_c1")
    )
    vocab = _maybe_broadcast(
        c12.join(c1, "w1").select(
            "w1", "w2",
            (F.col("_c12").cast("double") / F.col("_c1").cast("double")).alias(
                "_p"
            ),
        ),
        broadcast_vocab,
        BROADCAST_MAX_EVAL_ROWS,
    )
    scored = e.join(vocab, ["w1", "w2"], "left").select(
        id_col,
        F.when(F.col("w1").isNull(), None)
        .otherwise(-F.log(F.col("_p")))
        .alias("_nll"),
    )
    return scored.groupBy(id_col).agg(
        F.count("_nll").cast("long").alias("n_bigrams"),
        F.coalesce(F.avg("_nll"), F.lit(0.0)).alias("avg_nll"),
    )


# the eval side of embedding decontamination broadcasts to every task;
# benchmarks are thousands of rows — above this, the exact pass is the
# wrong tool (see embedding_decontam's docstring for the scale path)
MAX_EVAL_EMBED_ROWS = 100_000


def embedding_decontam(
    train_df: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.95,
    train_id: str = "doc_id",
    train_vec: str = "embedding",
    eval_id: str = "eval_id",
    eval_vec: str = "embedding",
    max_eval_rows: int = MAX_EVAL_EMBED_ROWS,
) -> DataFrame:
    """Embedding-space decontamination: flag train docs semantically
    close to ANY eval-benchmark doc — the paraphrase-robust complement
    of :func:`ngram_decontaminate` (verbatim-overlap misses reworded
    eval questions; embedding cosine catches them).

    Returns every train row as ``(id, max_cos, n_contaminated, keep)``:
    ``max_cos`` = the largest eval cosine (NULL if the train vector has
    zero norm or the eval set is empty), ``n_contaminated`` = how many
    eval docs sit at ``cos >= threshold``, ``keep = n_contaminated ==
    0``. Cosines are rounded to 6dp BEFORE the max/count (the repo's
    engine-exact recipe), so the threshold compare is bitwise
    reproducible in the DuckDB oracle.

    Plan shape: the eval side (a benchmark — thousands of rows) is
    broadcast; the train corpus streams through one scan-stage
    nested-loop with the cosine fused in, then one partial-aggregated
    groupBy(id). At 100 TB the corpus is never shuffled; the work is
    |train| x |eval| fused dot products, which is exactly what the
    procedure specifies (every pair must be examined for an EXACT
    verdict). For eval sets beyond ``max_eval_rows`` this raises — at
    that size pre-bucket with :func:`~sparksearchengine_spark.operators.
    similarity.lsh_cosine_topk` / ``ivf_search`` and verify only the
    candidate pairs.
    """
    from sparksearchengine_spark.operators.similarity import (
        dot_expr,
        norm_expr,
    )

    ev = eval_df.select(
        F.col(eval_id).alias("_eid"),
        F.col(eval_vec).alias("_ev"),
        norm_expr(F.col(eval_vec)).alias("_en"),
    )
    # limit(cap+1).count() bounds the guard's work even on a huge frame
    if ev.limit(max_eval_rows + 1).count() > max_eval_rows:
        raise ValueError(
            f"embedding_decontam broadcasts the eval side and got more "
            f"than max_eval_rows={max_eval_rows} rows. Pre-bucket with "
            "lsh_cosine_topk or ivf_search and verify candidates instead."
        )
    tr = train_df.select(
        F.col(train_id).alias("id"),
        F.col(train_vec).alias("_tv"),
        norm_expr(F.col(train_vec)).alias("_tn"),
    )
    cos = F.round(
        F.when(
            (F.col("_tn") > 0) & (F.col("_en") > 0),
            dot_expr(F.col("_tv"), F.col("_ev"))
            / (F.col("_tn") * F.col("_en")),
        ),
        6,
    )
    # left join on TRUE, not crossJoin: an empty eval set must keep
    # every train row (max_cos NULL), not drop the corpus
    pairs = tr.join(F.broadcast(ev), F.lit(True), "left").select(
        "id", cos.alias("_c")
    )
    return (
        pairs.groupBy("id")
        .agg(
            F.max("_c").alias("max_cos"),
            F.sum(F.when(F.col("_c") >= threshold, 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .withColumn("keep", F.col("n_contaminated") == 0)
    )


# --------------------------------------------------------------------------
# Bloom-filter decontamination: the no-join scale path
# --------------------------------------------------------------------------

MAX_BLOOM_EVAL_GRAMS = 5_000_000
# below this many distinct grams the bitset packs driver-side (one
# bounded collect of <= ~10 MB of strings beats two extra Spark jobs);
# above it, the pack runs on the executors and only packed 64-bit words
# reach the driver
DRIVER_PACK_MAX_GRAMS = 100_000


@dataclass(frozen=True)
class BloomGramFilter:
    """A driver-built Bloom filter over an eval set's token n-grams.

    ``words`` is the bitset packed into signed 64-bit words (Spark
    LongType), bit ``i`` of the set = bit ``i % 64`` of
    ``words[i // 64]``. Member hashes are Kirsch–Mitzenmacher double
    hashing: ONE hash per gram yields ``h1`` and ``h2`` (md5 hex chars
    1-8 / 9-16 by default), both reduced mod ``n_bits`` with ``h2``
    forced ODD (an even-modulus zero step would collapse all k indexes
    onto one bit), and the k indexes are ``(h1 + i*h2) % n_bits`` — so
    k can be large (low fpp) at the cost of one hash plus k
    codegen-cheap adds, and the recipe is byte-identical in Python
    (build), Spark SQL (probe), and DuckDB (oracle): contamination
    verdicts, INCLUDING the filter's false positives, are deterministic
    and engine-exact.
    """

    words: tuple[int, ...]
    n_bits: int
    k: int
    n: int
    analyzer: str
    n_grams: int

    def fpp(self) -> float:
        """Expected false-positive probability for the inserted count."""
        if self.n_grams == 0:
            return 0.0
        return (
            1.0 - math.exp(-self.k * self.n_grams / float(self.n_bits))
        ) ** self.k

    def union(self, other: "BloomGramFilter") -> "BloomGramFilter":
        """Merge two filters built with IDENTICAL parameters (same
        n_bits/k/n/analyzer) into one whose member set is the union —
        a bitwise OR of the word arrays.

        This is how eval sets too large for one driver-side build
        shard: build a filter per benchmark slice (each under
        ``max_eval_grams``), union the filters, decontaminate once.
        ``n_grams`` adds (an upper bound on distinct insertions, so
        :meth:`fpp` stays conservative). Raises on any parameter
        mismatch — ORing incompatible bitsets would silently corrupt
        membership.
        """
        same = (
            self.n_bits == other.n_bits
            and self.k == other.k
            and self.n == other.n
            and self.analyzer == other.analyzer
        )
        if not same:
            raise ValueError(
                "BloomGramFilter.union: parameter mismatch "
                f"(n_bits {self.n_bits}/{other.n_bits}, k {self.k}/"
                f"{other.k}, n {self.n}/{other.n}, analyzer "
                f"{self.analyzer!r}/{other.analyzer!r})"
            )
        return BloomGramFilter(
            words=tuple(a | b for a, b in zip(self.words, other.words)),
            n_bits=self.n_bits,
            k=self.k,
            n=self.n,
            analyzer=self.analyzer,
            n_grams=self.n_grams + other.n_grams,
        )


def bloom_gram_filter(
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    analyzer: str = "simple",
    bits_per_gram: int = 32,
    k: int = 16,
    max_eval_grams: int = MAX_BLOOM_EVAL_GRAMS,
    n_bits: int | None = None,
) -> BloomGramFilter:
    """Build a :class:`BloomGramFilter` from an eval/benchmark corpus.

    ``n_bits`` pins the bitset size explicitly (normally sized as
    ``bits_per_gram * n_grams``) — REQUIRED when building shard filters
    meant for :meth:`BloomGramFilter.union`, which only accepts
    identically-parameterized filters: size for the UNION's total gram
    count, not the shard's.

    The eval side is small by contract (a benchmark: thousands of docs);
    its DISTINCT grams are collected driver-side under a hard cap with a
    loud error — the same policy as :func:`embedding_decontam`. At
    ``bits_per_gram=32, k=16`` the filter costs 4 bytes per eval gram
    and false-positives per GRAM at ~3e-7 — sized so that a doc with
    thousands of grams still has a sub-1e-3 chance of a spurious flag
    (the per-doc rate is what matters at ``min_hit_grams=1``; false
    positives drop a clean doc, never leak a contaminated one).

    Why md5 and not the engine's xxhash64: measured on the 16-term
    probe predicate, the md5 shape is ~2x FASTER — both h1 and h2
    derive from ONE ``md5(gram)`` subexpression that codegen evaluates
    once, while two ``xxhash64`` calls get re-evaluated across the k
    bit tests after projection collapse. md5 is also the repo's
    portable recipe, so the DuckDB oracle replicates verdicts
    bit-for-bit.
    """
    grams_df = (
        _widen(eval_df)
        .select(
            F.explode(
                token_ngrams(analyzer_expr(F.col(text_col), analyzer), n)
            ).alias("gram")
        )
        .distinct()
    )
    persisted = False
    try:
        # one bounded probe serves BOTH the small-set pack and the size
        # check: <= ~10 MB of strings at the driver-pack threshold. On
        # this (common) path the frame is consumed exactly once, so it
        # is NOT persisted; only the large path, which reads it twice
        # (count + executor pack), caches it.
        small_cap = min(max_eval_grams, DRIVER_PACK_MAX_GRAMS)
        probe = grams_df.limit(small_cap + 1).collect()
        if len(probe) <= small_cap:
            n_grams = len(probe)
        else:
            probe = None  # too many for the driver path: exact count
            grams_df = grams_df.persist()
            persisted = True
            n_grams = grams_df.count()
            if n_grams > max_eval_grams:
                raise ValueError(
                    f"bloom_gram_filter got more than "
                    f"max_eval_grams={max_eval_grams} distinct eval "
                    f"grams (the packed bitset broadcast would exceed "
                    f"{4 * max_eval_grams >> 20} MB). Shard the eval "
                    "set into several filters, or raise the cap "
                    "explicitly memory permitting."
                )
        if n_bits is not None:
            if n_bits < 64 or n_bits % 64:
                raise ValueError(
                    f"n_bits must be a positive multiple of 64, got {n_bits}"
                )
            m = int(n_bits)
        else:
            m = _bloom_bits(bits_per_gram, n_grams)
        words = [0] * (m // 64)
        if n_grams and probe is not None:
            # small eval sets (the common case: a benchmark) pack
            # driver-side — the one bounded collect above, no extra
            # Spark jobs. h2 forced ODD: an even m with h2 % m == 0
            # would collapse all k indexes onto one bit (that gram's
            # fpp -> the whole filter's fill ratio, ~0.5); an odd step
            # always walks k distinct bits.
            import hashlib

            for r in probe:
                hx = hashlib.md5(r["gram"].encode()).hexdigest()
                h1 = int(hx[:8], 16) % m
                h2 = (int(hx[8:16], 16) % m) | 1
                for i in range(k):
                    h = (h1 + i * h2) % m
                    words[h // 64] |= 1 << (h % 64)
            words = [
                w - (1 << 64) if w >= (1 << 63) else w for w in words
            ]
        elif n_grams:
            # large eval sets (probe is None) PACK ON THE EXECUTORS
            # (r6; VERDICT r5 #6): grams hash with the probe-side md5,
            # explode to their k bit positions, and a bit_or
            # aggregation packs 64-bit words — only the
            # ~4-bytes-per-gram word rows reach the driver, never the
            # gram strings (a parity test pins both paths
            # bit-identical).
            h1, h2 = _km_hash_cols(F.col("gram"), m)
            packed = (
                grams_df.select(h1.alias("_h1"), h2.alias("_h2"))
                .select(
                    "_h1",
                    "_h2",
                    F.explode(
                        F.sequence(F.lit(0), F.lit(k - 1))
                    ).alias("_i"),
                )
                .select(
                    (
                        (F.col("_h1") + F.col("_i") * F.col("_h2")) % m
                    ).alias("_h")
                )
                .select(
                    F.shiftright("_h", 6).alias("_w"),
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT), "
                        "CAST(_h % 64 AS INT))"
                    ).alias("_b"),
                )
                .groupBy("_w")
                .agg(F.bit_or("_b").alias("_word"))
                .collect()
            )
            for r in packed:
                words[r["_w"]] = r["_word"]
    finally:
        if persisted:
            grams_df.unpersist()
    return BloomGramFilter(
        words=tuple(words),
        n_bits=m,
        k=k,
        n=n,
        analyzer=analyzer,
        n_grams=n_grams,
    )


def _bloom_bits(bits_per_gram: int, n_grams: int) -> int:
    m = max(64, bits_per_gram * max(1, n_grams))
    return ((m + 63) // 64) * 64  # whole 64-bit words


def _km_hash_cols(gram: "Column", m: int) -> "tuple[Column, Column]":
    """The ONE Kirsch–Mitzenmacher hash recipe (h1, h2) as Columns —
    shared by the executor-side pack and the probe so the two Spark
    paths cannot drift (the filter's whole value is bit-exact
    build/probe/oracle parity; r6 review). md5 hex chars 1-8 / 9-16,
    both pre-reduced mod ``m`` (keeps ``h1 + (k-1)*h2`` far from long
    overflow under ANSI mode), ``h2`` forced ODD (an even-modulus zero
    step would collapse all k indexes onto one bit). Inputs are
    non-negative 32-bit values, so ``pmod`` == ``%`` here; pmod keeps
    the intent explicit."""
    md5c = F.md5(gram)
    h1 = F.pmod(
        F.conv(F.substring(md5c, 1, 8), 16, 10).cast("long"), F.lit(m)
    )
    h2 = F.pmod(
        F.conv(F.substring(md5c, 9, 8), 16, 10).cast("long"), F.lit(m)
    ).bitwiseOR(F.lit(1))
    return h1, h2


def bloom_decontaminate(
    train_df: DataFrame,
    bloom: BloomGramFilter,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_hit_grams: int = 1,
) -> DataFrame:
    """Flag training docs whose token n-grams PROBABLY overlap the eval
    set captured in ``bloom`` — the join-free scale path of
    :func:`ngram_decontaminate`.

    Same output contract: one row per exploded-gram doc,
    ``(id_col, n_grams, n_hit_grams, contaminated)``. Unlike the exact
    join, hits include the filter's false positives (rate
    ``bloom.fpp()``, conservative direction) — run the exact join on the
    flagged survivors when the drop budget is tight.

    Plan shape — the part the exact join can't match at 100 TB: the
    bitset rides ONE broadcast row (2 bytes/eval-gram vs the full gram
    strings), and the probe is k codegen'd md5+shift scalars fused into
    the corpus scan. No join build side, no gram strings in flight, and
    the only shuffle is the per-doc partial-aggregated groupBy — the
    corpus is never shuffled by content. (Spark's own
    ``bloom_filter_agg`` is not in the public function registry, and a
    driver-built filter is what makes the verdict engine-exact and
    oracle-checkable anyway.)
    """
    spark = train_df.sparkSession
    bf_df = spark.createDataFrame(
        [(list(bloom.words),)], "_bf array<long>"
    )
    toks = token_ngrams(
        analyzer_expr(F.col(text_col), bloom.analyzer), bloom.n
    )
    train_grams = (
        _widen(train_df)
        .select(F.col(id_col), toks.alias("_grams"))
        .select(
            id_col,
            F.size("_grams").alias("n_grams"),
            F.explode("_grams").alias("gram"),
        )
        .join(F.broadcast(bf_df), F.lit(True), "left")
    )
    # Kirsch-Mitzenmacher probe: one hash per gram, k derived indexes —
    # the (h1, h2) recipe is the SAME _km_hash_cols the executor-side
    # pack uses, so build and probe cannot drift
    m = bloom.n_bits
    h1c, h2c = _km_hash_cols(F.col("gram"), m)
    train_grams = train_grams.withColumn("_h1", h1c).withColumn(
        "_h2", h2c
    )
    hit_sql = " AND ".join(
        f"((element_at(_bf, CAST(((_h1 + {i} * _h2) % {m}) DIV 64 AS INT)"
        f" + 1) >> CAST((_h1 + {i} * _h2) % {m} % 64 AS INT)) & 1) = 1"
        for i in range(bloom.k)
    )
    probed = train_grams.select(
        id_col,
        "n_grams",
        F.expr(hit_sql).cast("int").alias("_hit"),
    )
    hits = probed.groupBy(id_col).agg(
        F.first("n_grams").alias("n_grams"),
        F.sum("_hit").cast("long").alias("n_hit_grams"),
    )
    return hits.select(
        id_col,
        "n_grams",
        "n_hit_grams",
        (F.col("n_hit_grams") >= F.lit(min_hit_grams)).alias("contaminated"),
    )


def perplexity_buckets(
    scores: DataFrame,
    ppl_col: str = "avg_nll",
    group_col: str | None = None,
    cuts: "tuple[float, float]" = (1.0 / 3.0, 2.0 / 3.0),
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style head/middle/tail bucketing over a perplexity column:
    the input frame plus a ``bucket`` string column, per-``group_col``
    (per-language in CCNet) so a doc competes only against its own
    group's distribution.

    ``head`` = the lowest-perplexity ``cuts[0]`` fraction (closest to
    the LM, kept whole in CCNet), ``middle`` = up to ``cuts[1]``,
    ``tail`` = the rest (dropped or down-sampled). Feed it the output of
    :func:`unigram_logprob` / :func:`bigram_logprob` (or any per-doc
    score — KenLM perplexities imported as a column work the same).

    Two physical paths:

    * default (``exact=False``) — the 100 TB shape: ONE
      ``percentile_approx`` aggregation per group (partial-aggregated
      sketch, no sort), cutoff VALUES broadcast back (two doubles per
      group), bucket assigned in the scan stage. Docs exactly on a
      cutoff value land in the lower bucket (``<=``).
    * ``exact=True`` — the pinned/oracle-parity path: exact
      ``percent_rank`` per group, computed DISTRIBUTED (r9): range-
      partition on (group, score), rank within each partition, add
      per-(partition, group) prefix offsets (a broadcast-sized frame —
      at most partitions x groups rows). Identical values share a full
      sort key, so the range partitioner co-locates every tie class and
      the two-pass rank equals the global one exactly; equal scores
      always share a bucket. No single-task sort anywhere — a 100-TB
      single-language group used to be ONE window task.

    NULL scores are rejected loudly — a NULL would silently sort into
    ``head`` under Spark's nulls-first default while DuckDB/most SQL
    engines put it in ``tail`` (nulls-last); the caller decides, not the
    engine. The guard is a ``raise_error`` branch fused into the bucket
    expression (no extra validation pass over the data).
    """
    lo, hi = float(cuts[0]), float(cuts[1])
    if not (0.0 < lo < hi < 1.0):
        raise ValueError(
            f"cuts must satisfy 0 < lo < hi < 1, got {cuts!r}"
        )
    null_guard = F.raise_error(
        F.lit(
            f"perplexity_buckets: NULL in {ppl_col!r} — filter or impute"
            " first (NULL has no place in a rank ordering)"
        )
    ).cast("string")
    if exact:
        from sparksearchengine_spark.operators.prefix import (
            distributed_prefix,
        )

        gcols = [group_col] if group_col else []
        ranked = distributed_prefix(
            scores,
            order=[F.col(ppl_col).asc()],
            groups=gcols,
            rank_col="_pb_rank",
            group_count_col="_pb_ng",
        )
        # percent_rank == (rank - 1) / (n - 1), 0.0 for the n == 1 group
        pr = F.when(
            F.col("_pb_ng") > 1,
            (F.col("_pb_rank") - 1) / (F.col("_pb_ng") - 1),
        ).otherwise(F.lit(0.0))
        bucket = (
            F.when(F.col(ppl_col).isNull(), null_guard)
            .when(pr < F.lit(lo), F.lit("head"))
            .when(pr < F.lit(hi), F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
        return ranked.withColumn("bucket", bucket).drop(
            "_pb_rank", "_pb_ng"
        )
    gcols = [group_col] if group_col else []
    q = (
        scores.groupBy(*gcols)
        .agg(
            F.percentile_approx(
                ppl_col, F.array(F.lit(lo), F.lit(hi)), F.lit(accuracy)
            ).alias("_q")
        )
        .select(
            *gcols,
            F.element_at("_q", 1).alias("_q1"),
            F.element_at("_q", 2).alias("_q2"),
        )
    )
    if gcols:
        # null-safe equality: a NULL group is a group of its own (a bare
        # equi-join would silently DROP null-group rows)
        qa = q.withColumnRenamed(group_col, "_g")
        joined = scores.join(
            F.broadcast(qa), F.col(group_col).eqNullSafe(F.col("_g"))
        ).drop("_g")
    else:
        joined = scores.crossJoin(F.broadcast(q))
    bucket = (
        F.when(F.col(ppl_col).isNull(), null_guard)
        .when(F.col(ppl_col) <= F.col("_q1"), F.lit("head"))
        .when(F.col(ppl_col) <= F.col("_q2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.withColumn("bucket", bucket).drop("_q1", "_q2")
