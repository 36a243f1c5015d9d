"""Search EXTENSION operators — the families layered on the core E1–E12
surface (`operators/search.py`): highlighting, facets (counts / metrics /
cube), grouped search, BM25F, pseudo-relevance feedback, reciprocal-rank
fusion, passage→doc (maxP), result collapsing, text more-like-this,
score explanation, rescoring, and multi-field match.

Split out of `search.py` (round 7, mechanical move — zero behavior
change) so the core reference-parity surface stays reviewable; every
public name re-exports through `operators.search`, so existing imports
are stable. Reference citations live in each docstring.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.search import (
    DOC_ID,
    SCORE,
    ranked_topk,
    search,
    topk_per_group,
    weighted_terms,
)

if TYPE_CHECKING:
    from sparksearchengine_spark.operators.index import SearchIndex
    from sparksearchengine_spark.plans.ast import Query


def highlight_snippets(
    df: DataFrame,
    terms: Iterable[str],
    text_col: str = "text",
    before: int = 30,
    after: int = 30,
) -> DataFrame:
    """Lucene-highlighter analog: for each row, the earliest
    case-insensitive occurrence of any query term and a +/- window of
    context around it — df + ``(match_term, match_pos, snippet)``.

    Deterministic: the match is the minimum (position, term) pair
    (earliest hit wins; lexicographic term on an exact tie). Positions
    index the ORIGINAL text: each candidate position is the length of
    the prefix before the first ``(?i)`` regex match, so length-changing
    lowercase mappings (Turkish dotted I etc.) cannot desynchronize
    match_pos/snippet from the displayed string (a locate-over-lower
    draft had exactly that defect — r3 review). The DuckDB oracle
    reproduces the identical regex-prefix arithmetic. Rows matching no
    term get NULLs (left-outer semantics for the UI).

    Scan-stage: the candidate positions fold into one array expression
    per row — no explode, no shuffle, no UDF; at 100 TB snippet
    extraction rides whatever scan produces the hits (typically the <=k
    rows of a search, where cost is irrelevant — but a full-corpus
    "show every match in context" pass is one scan too).
    """
    import re as _re

    terms = [str(t).lower() for t in terms]
    if not terms:
        raise ValueError("terms must be non-empty")
    text = F.col(text_col)
    structs = []
    for t in sorted(terms):
        pat = "(?is)" + _re.escape(t)
        # prefix length before the first match, on the original string;
        # the (?s).*$ tail consumes the remainder so exactly one
        # replacement happens
        pos = F.length(F.regexp_replace(text, pat + ".*$", "")) + 1
        structs.append(
            F.struct(
                F.when(text.rlike(pat), pos).alias("pos"),
                F.lit(t).alias("term"),
            )
        )
    cands = F.array(*structs)
    hit = F.array_min(F.filter(cands, lambda c: c["pos"].isNotNull()))
    start = F.greatest(F.lit(1), hit["pos"] - before)
    length = (hit["pos"] - start) + F.length(hit["term"]) + after
    return df.select(
        "*",
        hit["term"].alias("match_term"),
        hit["pos"].alias("match_pos"),
        F.when(
            hit.isNotNull(),
            F.substring(F.col(text_col), start.cast("int"), length.cast("int")),
        ).alias("snippet"),
    )


def _match_set_join(
    index: "SearchIndex", query: "Query", cols: list[str],
    with_score: bool = True,
) -> DataFrame:
    """Compiled match set joined to a corpus projection — the shared
    scaffold of the facet family: ``(doc_id[, score], *cols)``. One
    compiled doc-set join; the match set, not the corpus, bounds every
    downstream shuffle."""
    matched = index.compile(query).select(
        DOC_ID, *( [SCORE] if with_score else [] )
    )
    return matched.join(
        index.corpus.df.select(
            F.col(index.corpus.id_col).cast("long").alias(DOC_ID), *cols
        ),
        DOC_ID,
    )


def facet_counts(
    index: "SearchIndex",
    query: "Query",
    facet_cols: Iterable[str],
    include_score_stats: bool = False,
) -> DataFrame:
    """Faceted navigation over a query's FULL match set (not just top-k):
    per facet column, the matching-document count per value —
    `(facet, value, n_docs[, sum_score, max_score])`.

    One compiled doc-set join to the corpus, then ONE grouping pass per
    facet column unioned (each is a partial-agg'd groupBy over the
    matched ids — at 100 TB the match set, not the corpus, bounds the
    shuffle; Catalyst shares the compiled sub-plan across branches).
    Facet values render as strings (NULL stays NULL — reported as its
    own bucket, the way a UI shows "(missing)").
    """
    facet_cols = list(facet_cols)
    if not facet_cols:
        raise ValueError("facet_cols must be non-empty")
    joined = _match_set_join(index, query, facet_cols)
    parts = []
    for c in facet_cols:
        aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
        if include_score_stats:
            aggs += [
                F.round(F.sum(SCORE), 6).alias("sum_score"),
                F.round(F.max(SCORE), 6).alias("max_score"),
            ]
        parts.append(
            joined.groupBy(F.col(c).cast("string").alias("value"))
            .agg(*aggs)
            .select(F.lit(c).alias("facet"), "value", *[a for a in
                    ("n_docs", "sum_score", "max_score")
                    if include_score_stats or a == "n_docs"])
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def facet_metrics(
    index: "SearchIndex",
    query: "Query",
    facet_col: str,
    value_col: str,
    metrics: "Iterable[str]" = ("count", "sum", "avg", "min", "max"),
    percentiles: "Iterable[float] | None" = None,
) -> DataFrame:
    """Metric aggregations scoped to a query's match set (the ES
    ``aggs`` shape: terms bucket + metric sub-aggregations): per
    ``facet_col`` value, numeric statistics of ``value_col`` over the
    MATCHING documents — ``(value, n_docs, sum_<col>, avg_<col>, ...)``.

    ``metrics`` ⊆ {count, sum, avg, min, max, distinct} (``distinct`` =
    exact count-distinct of ``value_col``, the ES cardinality agg — use
    sketch profiling for the approximate form); ``percentiles`` adds
    ``p<q>_<col>`` columns via ``percentile_approx`` (one-pass sketch —
    approximate by design, like ES's t-digest percentiles).

    Plan: compiled doc-set join to the corpus projection, ONE partial-
    aggregated groupBy — the match set, not the corpus, bounds the
    shuffle (the :func:`facet_counts` shape with metric payloads).
    NULL ``value_col`` rows count toward ``n_docs`` but are ignored by
    the numeric aggregates (SQL semantics); NULL facet values bucket
    as their own "(missing)" row like `facet_counts`.
    """
    allowed = {"count", "sum", "avg", "min", "max", "distinct"}
    metrics = list(metrics)
    bad = [m for m in metrics if m not in allowed]
    if bad:
        raise ValueError(f"unknown metrics {bad}; allowed: {sorted(allowed)}")
    if not metrics and not percentiles:
        raise ValueError("need at least one metric or percentile")
    joined = _match_set_join(
        index, query, [facet_col, value_col], with_score=False
    )
    v = F.col(value_col).cast("double")
    aggs = []
    for m in metrics:
        if m == "count":
            aggs.append(F.count(F.lit(1)).cast("long").alias("n_docs"))
        elif m == "sum":
            aggs.append(F.sum(v).alias(f"sum_{value_col}"))
        elif m == "avg":
            aggs.append(F.avg(v).alias(f"avg_{value_col}"))
        elif m == "min":
            aggs.append(F.min(v).alias(f"min_{value_col}"))
        elif m == "max":
            aggs.append(F.max(v).alias(f"max_{value_col}"))
        elif m == "distinct":
            aggs.append(
                F.countDistinct(F.col(value_col))
                .cast("long")
                .alias(f"distinct_{value_col}")
            )
    for q in percentiles or ():
        qf = float(q)
        if not (0.0 <= qf <= 1.0):
            raise ValueError(f"percentile {q} outside [0, 1]")
        # ES-style percent tag: 0.5 -> p50, 0.999 -> p99_9, 1.0 -> p100
        # (fixed-point, never '.'/'-'/sci-notation in a column name)
        tag = f"{qf * 100:.6f}".rstrip("0").rstrip(".").replace(
            ".", "_"
        ) or "0"
        aggs.append(
            F.percentile_approx(v, F.lit(qf), F.lit(10_000)).alias(
                f"p{tag}_{value_col}"
            )
        )
    return joined.groupBy(
        F.col(facet_col).cast("string").alias("value")
    ).agg(*aggs)


def grouped_search(
    index: "SearchIndex",
    query: "Query",
    group_col: str,
    k: int = 10,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Diversified top-k: the best k matches PER GROUP (per language, per
    source/domain...) — `(group, doc_id, score, rank)`; a single global
    top-k would let one dominant group fill every slot.

    Compiled doc-set join to the corpus's group column, then the same
    salted two-stage rank window every per-group top-k here uses
    (`topk_per_group`): WindowGroupLimit prunes partition-locally before
    the exchange, and ``salt_buckets`` keeps one giant group from
    serializing a reducer. Ties break on doc_id ascending.
    """
    matched = index.compile(query).select(DOC_ID, SCORE)
    joined = matched.join(
        index.corpus.df.select(
            F.col(index.corpus.id_col).cast("long").alias(DOC_ID),
            F.col(group_col).alias("group"),
        ),
        DOC_ID,
    )
    return topk_per_group(
        joined,
        ["group"],
        [F.col(SCORE).desc(), F.col(DOC_ID).asc()],
        k=k,
        salt_buckets=salt_buckets,
    ).select("group", DOC_ID, F.round(SCORE, 6).alias(SCORE), "rank")


def facet_cube(
    index: "SearchIndex",
    query: "Query",
    dims: Iterable[str],
    mode: str = "cube",
) -> DataFrame:
    """Multi-dimensional facet drilldown over a query's full match set in
    ONE aggregation: every combination of ``dims`` (``mode='cube'``) or
    every prefix (``'rollup'``) gets its matching-doc count —
    ``(*dims, n_docs, grouping_id)``.

    Where :func:`facet_counts` unions one grouping pass per facet,
    this compiles to a single Expand + HashAggregate (plan-asserted):
    the match set is scanned once and fanned to the grouping sets
    map-side, so at 100 TB the cost is one shuffle of (match set ×
    |grouping sets|) pre-aggregated partials, not |dims| jobs.

    ``grouping_id`` disambiguates a genuine NULL dim value from the
    "all values" rollup row (bit = 1 ⇒ the dim is aggregated away in
    that row — same bit convention in Spark and DuckDB/ANSI GROUPING).
    Dims render as strings, as in :func:`facet_counts`.
    """
    dims = list(dims)
    if not dims:
        raise ValueError("dims must be non-empty")
    if mode not in ("cube", "rollup"):
        raise ValueError(f"mode must be cube|rollup, got {mode!r}")
    matched = index.compile(query).select(DOC_ID)
    joined = matched.join(
        index.corpus.df.select(
            F.col(index.corpus.id_col).cast("long").alias(DOC_ID),
            *[F.col(d).cast("string").alias(d) for d in dims],
        ),
        DOC_ID,
    )
    grouped = joined.cube(*dims) if mode == "cube" else joined.rollup(*dims)
    return grouped.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.grouping_id().cast("long").alias("grouping_id"),
    )


def bm25f_search(
    index: "SearchIndex",
    text: str,
    field_weights: dict[str, float],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    analyzer: str | None = None,
) -> DataFrame:
    """BM25F ranked search across multiple weighted fields (Robertson,
    Zaragoza & Taylor, CIKM 2004): per (term, doc) the field tfs are
    length-normalized, field-weighted and SUMMED BEFORE saturation —

        wtf(t,d) = Σ_f  w_f · tf_f / ((1−b) + b·dl_f/avgdl_f)
        score(t,d) = idf(t) · wtf / (k1 + wtf)

    — which is not expressible as a boolean combination of per-field
    BM25 queries (those saturate per field first; the reference's only
    multi-field device is query-level boosts, SURVEY §2.3 Q12).
    ``idf`` uses the union docFreq: docs where t occurs in ANY scored
    field. Returns ``(doc_id, score, rank)``, score rounded 6dp, ties
    by doc_id.

    Plan shape: the query's terms are driver-side literals, so each
    per-field postings scan carries an ``isin`` pushdown (field +
    term pruning at the scan); the union is one groupBy(term, doc_id)
    partial-agg'd shuffle; the ≤|terms|-row docFreq table broadcasts;
    the final doc rollup reuses the same doc_id keying. With two
    fields the per-(term,doc) sum has ≤2 addends (IEEE-commutative,
    engine-exact); at ≥3 fields cross-engine ulp drift is absorbed by
    the 6dp rounding.

    ``analyzer``: query-time tokenizer; defaults to the first scored
    field's analyzer (BM25F assumes one token space across fields).
    """
    if not field_weights:
        raise ValueError("field_weights must be non-empty")
    for f in field_weights:
        if f not in index.fieldstats:
            raise ValueError(f"field {f!r} is not indexed")
    first = next(iter(field_weights))
    analyzer = analyzer or index.corpus.text_cols[first].query_time_analyzer()
    from sparksearchengine_spark.functions.analyzers import tokenize_py

    terms = sorted(set(tokenize_py(text, analyzer)))
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double, rank int")

    parts = []
    for f, w in field_weights.items():
        fs = index.fieldstats[f]
        avgdl = fs.avgdl if fs.avgdl else 1.0
        bf = F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl").cast(
            "double"
        ) / F.lit(float(avgdl))
        parts.append(
            index.postings.where(
                (F.col("field") == f) & F.col("term").isin(terms)
            ).select(
                "term",
                F.col(DOC_ID),
                (F.lit(float(w)) * F.col("tf").cast("double") / bf).alias(
                    "wtf"
                ),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    tfsum = allp.groupBy("term", DOC_ID).agg(F.sum("wtf").alias("wtf"))
    dfc = tfsum.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    # N = the largest scored field's doc count — independent of the
    # field_weights dict order (r3 review: taking the FIRST field's count
    # made scores depend on insertion order). Union docFreq can still
    # exceed N when fields cover disjoint doc sets; the idf is floored at
    # 0 so such super-common terms contribute nothing rather than a
    # negative penalty (Lucene's per-field formula never goes negative
    # because df ≤ N there; the floor restores that invariant).
    n_docs = float(
        max(index.fieldstats[f].doc_count or 0 for f in field_weights) or 1
    )
    from sparksearchengine_spark.functions.scoring import idf_expr

    scored = tfsum.join(F.broadcast(dfc), "term").select(
        DOC_ID,
        (
            F.greatest(F.lit(0.0), idf_expr(F.col("_df"), n_docs))
            * F.col("wtf")
            / (F.lit(float(k1)) + F.col("wtf"))
        ).alias("_s"),
    )
    total = scored.groupBy(DOC_ID).agg(
        F.round(F.sum("_s"), 6).alias(SCORE)
    )
    return ranked_topk(
        total, [F.col(SCORE).desc(), F.col(DOC_ID).asc()], k
    )


def prf_expand_search(
    index: "SearchIndex",
    text: str,
    field: str = "text",
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 10,
    lam: float = 0.5,
) -> DataFrame:
    """Pseudo-relevance-feedback expansion search (RM3 shape — Lavrenko
    & Croft 2001 relevance models; Abdul-Jaleel et al. 2004 for the
    λ-interpolation): run the BM25 query, estimate a feedback term
    distribution from the top ``fb_docs`` hits, interpolate it with the
    original query, re-score — `(doc_id, score, rank)`.

        w_fb(t)    ∝ Σ_{d∈FB} (tf(t,d)/dl(d)) · s₁(d)
        w_final(t) = λ·(1/|Q|)·[t∈Q] + (1−λ)·w_fb(t)/Σw_fb
        s₂(d)      = Σ_t w_final(t) · bm25(t,d)

    One composed lazy plan, no collect: the first-pass top-fb_docs is a
    TakeOrdered (≤ fb_docs rows, broadcast into the postings join that
    mines feedback terms), the feedback vocabulary reduces to
    ``fb_terms`` rows (TakeOrdered again), and the second pass is one
    broadcast join of that ≤ (fb_terms+|Q|)-row weight table against the
    cached scored postings — the same physical shape as ``batch_search``
    with exactly one query. At 100 TB the only corpus-wide work is the
    two scored-postings passes.

    Determinism contract for the DuckDB oracle: per-(term,doc) feedback
    contributions are rounded 6dp and summed as DECIMAL (order-exact),
    the fb_terms cut orders by that exact decimal (term-asc ties), and
    the final score rounds 6dp with doc_id ties.
    """
    from sparksearchengine_spark.functions.analyzers import tokenize_py
    from sparksearchengine_spark.plans.ast import Q as _Q

    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    analyzer = index.corpus.text_cols[field].query_time_analyzer()
    qterms = sorted(set(tokenize_py(text, analyzer)))
    spark = index.postings.sparkSession
    if not qterms:
        return spark.createDataFrame([], "doc_id long, score double, rank int")

    fb = search(index, _Q.field(field).match_any(*qterms), k=fb_docs).select(
        DOC_ID, F.col(SCORE).alias("_s1")
    )
    posts = index.postings.where(F.col("field") == field).select(
        "term",
        DOC_ID,
        (F.col("tf").cast("double") / F.col("dl").cast("double")).alias("_tl"),
    )
    contrib = posts.join(F.broadcast(fb), DOC_ID).select(
        "term",
        F.round(F.col("_tl") * F.col("_s1"), 6)
        .cast("decimal(28,6)")
        .alias("_c"),
    )
    # The kept feedback vocabulary is ≤ fb_terms rows BY CONTRACT — the
    # one place a driver collect is the right plan: leaving it lazy made
    # Catalyst evaluate the whole feedback subtree (a corpus-postings
    # pass) TWICE (once for the normalizer, once for the weights) plus a
    # sort-merge full-outer against the query terms (r3 plan review).
    # Exact DECIMAL weights survive the round-trip; float() is the same
    # nearest-double conversion as the oracle's CAST(… AS DOUBLE).
    wfb_rows = (
        contrib.groupBy("term")
        .agg(F.sum("_c").cast("decimal(38,6)").alias("_w"))
        .orderBy(F.col("_w").desc(), F.col("term").asc())
        .limit(fb_terms)
        .collect()
    )
    from decimal import Decimal

    tot = sum((r["_w"] for r in wfb_rows), Decimal(0))
    wmap = (
        {r["term"]: float(r["_w"]) / float(tot) for r in wfb_rows}
        if tot > 0
        else {}
    )
    # standard RM3: renormalize after the fb_terms truncation, then
    # λ-interpolate with the uniform original-query distribution
    porig = 1.0 / len(qterms)
    qset = set(qterms)
    weights = spark.createDataFrame(
        [
            (
                t,
                float(lam) * (porig if t in qset else 0.0)
                + (1.0 - float(lam)) * wmap.get(t, 0.0),
            )
            for t in sorted(qset | set(wmap))
        ],
        "term string, _wt double",
    )
    # expanded terms are driver literals: static bucket prune on a
    # term-bucketed saved layout, like the compiler's single-query path
    scored = index.scored_postings(
        field,
        prune_terms=(
            sorted(qset | set(wmap)) if index.term_buckets else None
        ),
    ).join(F.broadcast(weights), "term")
    # per-(term,doc) products rounded then summed as DECIMAL: the
    # per-doc total is independent of aggregation order across engines
    total = scored.groupBy(DOC_ID).agg(
        F.sum(
            F.round(F.col("_wt") * F.col("tscore"), 6).cast("decimal(28,6)")
        )
        .cast("decimal(38,6)")
        .cast("double")
        .alias(SCORE)
    )
    return ranked_topk(
        total, [F.col(SCORE).desc(), F.col(DOC_ID).asc()], k
    )


def rrf_fuse(
    results: list[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    id_col: str = DOC_ID,
    rank_col: str = "rank",
    group_cols: list[str] | None = None,
    weights: list[float] | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked result sets — the standard
    hybrid-search combiner (lexical BM25 + vector ANN, or any mix;
    Cormack et al. 2009, the same formula Elasticsearch ships as RRF):

    ``rrf_score(d) = Σ_i  w_i / (k_rrf + rank_i(d))``

    over the lists where ``d`` appears. Rank-based, so the inputs'
    score scales never need calibrating against each other — the whole
    point of RRF. Returns ``(group_cols..., id_col, rrf_score, rank)``
    top-k by fused score (ties: lower id).

    ``group_cols`` fuses per query group (pass ``["query_id"]`` for
    batch-search shaped inputs); each input must then carry those
    columns. ``weights`` (default all 1.0) biases sources.

    Scale: each input is already k-bounded per group (a top-k result),
    so the union + one groupBy aggregation moves N·k rows per group —
    eval-set-sized, never corpus-sized. The 1/(k+r) terms are exact
    1-ulp doubles summed through the DECIMAL(28,6) order-invariant
    recipe, so fused scores are bit-stable across partitionings and
    engines.
    """
    if not results:
        raise ValueError("need at least one result set")
    if weights is None:
        weights = [1.0] * len(results)
    if len(weights) != len(results):
        raise ValueError(
            f"{len(weights)} weights for {len(results)} result sets"
        )
    gcols = list(group_cols or [])
    parts = []
    for df, w in zip(results, weights):
        parts.append(
            df.select(
                *gcols,
                F.col(id_col),
                F.round(
                    F.lit(float(w))
                    / (F.lit(int(k_rrf)) + F.col(rank_col).cast("double")),
                    6,
                )
                .cast("decimal(28,6)")
                .alias("_c"),
            )
        )
    allparts = parts[0]
    for p in parts[1:]:
        allparts = allparts.unionByName(p)
    fused = allparts.groupBy(*gcols, id_col).agg(
        F.sum("_c").cast("decimal(38,6)").cast("double").alias("rrf_score")
    )
    if gcols:
        return topk_per_group(
            fused,
            gcols,
            [F.col("rrf_score").desc(), F.col(id_col).asc()],
            k=k,
        ).select(*gcols, id_col, "rrf_score", "rank")
    return ranked_topk(
        fused, [F.col("rrf_score").desc(), F.col(id_col).asc()], k
    ).select(id_col, "rrf_score", "rank")


def passage_to_doc(
    results: DataFrame,
    k: int = 10,
    doc_col: str = "doc_id",
    score_col: str = "score",
    group_cols: list[str] | None = None,
    agg: str = "max",
    top_p: int = 3,
) -> DataFrame:
    """Aggregate passage/chunk-level retrieval scores to document level —
    the maxP/sumP pattern for long-document retrieval over a chunked
    index (`chunking.chunk_documents` carries the parent ``doc_id``
    lineage this consumes): score each doc by its best passage (``agg="max"``,
    the BERT-maxP convention) or by the decimal-exact sum of its top
    ``top_p`` passages (``agg="sum_top"``, rewarding multi-passage
    support). Returns ``(group_cols..., doc_col, doc_score, rank)``
    top-k docs.

    Scale: input is passage-level hits (already k-bounded per query for
    batch shapes); one groupBy on (group, doc) + the shared skew-safe
    top-k. The sum_top path pre-prunes to each doc's top_p passages
    with the same rank window before summing.
    """
    if agg not in ("max", "sum_top"):
        raise ValueError(f"agg must be max|sum_top, got {agg!r}")
    gcols = list(group_cols or [])
    if agg == "max":
        fused = results.groupBy(*gcols, doc_col).agg(
            F.max(score_col).alias("doc_score")
        )
    else:
        pruned = topk_per_group(
            results.select(*gcols, doc_col, score_col),
            [*gcols, doc_col],
            [F.desc(score_col)],
            k=top_p,
        )
        fused = pruned.groupBy(*gcols, doc_col).agg(
            F.sum(
                F.round(F.col(score_col), 6).cast("decimal(28,6)")
            )
            .cast("decimal(38,6)")
            .cast("double")
            .alias("doc_score")
        )
    if gcols:
        return topk_per_group(
            fused,
            gcols,
            [F.col("doc_score").desc(), F.col(doc_col).asc()],
            k=k,
        ).select(*gcols, doc_col, "doc_score", "rank")
    return ranked_topk(
        fused, [F.col("doc_score").desc(), F.col(doc_col).asc()], k
    ).select(doc_col, "doc_score", "rank")


def collapse_results(
    results: DataFrame,
    collapse_col: str,
    k: int = 10,
    id_col: str = DOC_ID,
    score_col: str = SCORE,
    group_cols: list[str] | None = None,
    per_group: int = 1,
) -> DataFrame:
    """Field collapsing (Elasticsearch ``collapse`` / Lucene grouping):
    keep the best ``per_group`` hits per ``collapse_col`` value (one
    result per domain / source / author — SERP diversity), then the
    global top-k of the survivors, re-ranked. Returns the input columns
    plus a fresh ``rank``.

    ``group_cols`` scopes the collapse per query for batch-shaped
    inputs. NULL collapse keys form their own single group (matching
    Elasticsearch). Two skew-safe rank windows over already-k-bounded
    hit lists — eval-sized work, corpus never touched.
    """
    gcols = list(group_cols or [])
    order = [F.col(score_col).desc(), F.col(id_col).asc()]
    best = topk_per_group(
        results.drop("rank"),
        [*gcols, collapse_col],
        order,
        k=per_group,
    ).drop("rank")
    if gcols:
        return topk_per_group(best, gcols, order, k=k)
    return ranked_topk(best, order, k)


def more_like_this_text(
    index: "SearchIndex",
    text: str,
    field: str,
    k: int = 10,
    num_terms: int = 5,
) -> DataFrame:
    """Lucene MoreLikeThis over FREE TEXT (``like_text`` — no source doc
    needed): analyze the text with the field's query-time analyzer,
    pick its ``num_terms`` highest tf·idf terms against the CORPUS
    statistics (idf from the index, 6dp-rounded with a term-asc
    tie-break so selection is engine-reproducible), then run the
    standard ``match_any`` BM25 search over them. Returns
    ``(doc_id, score, rank)``.

    Driver cost: one tokenize of the literal text + one idf lookup
    bounded by its distinct terms — everything else is the ordinary
    search plan.
    """
    from collections import Counter

    from sparksearchengine_spark.functions.analyzers import tokenize_py
    from sparksearchengine_spark.operators.stats import term_idfs
    from sparksearchengine_spark.plans.ast import Q

    if num_terms < 1:
        raise ValueError(f"num_terms must be >= 1, got {num_terms}")
    opts = index.corpus.text_cols.get(field)
    if opts is None:
        raise ValueError(
            f"field {field!r} is not indexed ({list(index.corpus.text_cols)})"
        )
    analyzer = opts.query_time_analyzer()
    tf = Counter(tokenize_py(text, analyzer))
    if not tf:
        raise ValueError("like-text analyzed to zero terms")
    idf_rows = (
        term_idfs(index)
        .where((F.col("field") == field) & F.col("term").isin(*tf))
        .select("term", "idf")
        .collect()
    )
    scored = sorted(
        (
            (-round(tf[r["term"]] * r["idf"], 6), r["term"])
            for r in idf_rows
        ),
    )[:num_terms]
    if not scored:
        raise ValueError(
            "no like-text term occurs in the index; nothing to match"
        )
    terms = [t for _, t in scored]
    return search(index, Q.field(field).match_any(*terms), k=k)


def explain_scores(
    index: "SearchIndex",
    query,
    doc_ids: "Iterable[int] | None" = None,
) -> DataFrame:
    """Lucene ``IndexSearcher.explain`` analog: the per-(doc, term) score
    breakdown behind :func:`search`'s totals, as a DataFrame.

    One row per matched posting:
    ``(doc_id, field, term, weight, tf, dl, df_t, idf, tf_norm, tscore,
    n_matched, score)`` where ``idf`` is the similarity's idf factor
    (BM25: the Lucene idf; classic tfidf: idf² — so ``tf_norm`` comes
    out as ``sqrt(tf)``; custom registered scorers: NULL, no known
    decomposition), ``tf_norm = tscore_unweighted / idf`` (for BM25
    exactly Lucene's tfNorm ``tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``),
    ``tscore = weight · idf · tf_norm`` is the row's contribution,
    ``n_matched`` counts the doc's matched query terms, and ``score``
    is the per-doc total — identical to what :func:`search` reports for
    the same doc (docs failing the query's min_match are excluded,
    mirroring it).

    Supports every query that normalizes to a weighted term set
    (:func:`weighted_terms`: term / term-set / analyzed text, ``Boost``
    and min_match-1 ``Or`` compositions — fields may differ per row);
    other shapes (phrases, filters, ``Not``) raise — their match logic
    has no per-term additive decomposition to explain. For a SINGLE
    doc under an arbitrary AST (phrases and boost trees included, but
    without the idf/tfNorm component labels) use the complementary
    :func:`~sparksearchengine_spark.operators.stats.explain_score`.

    Plan shape: the query terms + per-field corpus scalars ride ONE
    broadcast literal frame; df_t attaches by scanning termstats against
    that broadcast (output ≤ |query terms| rows) and the result
    broadcast-joins the postings scan, so the corpus side never
    shuffles. ``doc_ids`` (bounded id list) prunes the postings scan
    up front — the classic "why did doc X rank there?" call is a few
    partition-pruned lookups, not a corpus pass.
    """
    spark = index.postings.sparkSession
    norm = weighted_terms(index, query)
    if norm is None:
        raise ValueError(
            "explain_scores supports queries that normalize to a weighted"
            " term set (match_term / match_any / match_min / match_text,"
            " Boost / Or compositions); phrases, filters and Not have no"
            f" per-term additive breakdown — got {type(query).__name__}"
        )
    rows, min_match = norm
    fs = index.fieldstats
    lit_rows = [
        (
            f,
            t,
            float(w),
            float(fs[f].doc_count) if fs[f].doc_count else 1.0,
            float(fs[f].avgdl) if fs[f].avgdl else 1.0,
        )
        for f, t, w in rows
    ]
    qdf = spark.createDataFrame(
        lit_rows,
        "field string, term string, weight double, _n double, _avgdl double",
    )
    # df_t rides the broadcast: termstats scanned once against the tiny
    # query frame, never materialized corpus-wide
    qts = index.termstats.select("field", "term", "df_t").join(
        F.broadcast(qdf), ["field", "term"]
    )
    if index.scoring.needs_cf:
        # LM similarities: collection term frequency for the query terms
        # only — one agg over the broadcast-pruned postings rows
        cfs = (
            index.postings.join(
                F.broadcast(qdf.select("field", "term")), ["field", "term"]
            )
            .groupBy("field", "term")
            .agg(F.sum("tf").cast("double").alias("cf_t"))
        )
        qts = qts.join(F.broadcast(cfs), ["field", "term"])
    # driver-literal query terms: static bucket prune on a term-bucketed
    # saved layout (and drops the partition column either way)
    p = index.prune_term_buckets(
        index.postings, [t for _, t, *_ in lit_rows]
    )
    if doc_ids is not None:
        ids = [int(i) for i in doc_ids]
        p = p.where(F.col(DOC_ID).isin(ids))
    j = p.join(F.broadcast(qts), ["field", "term"])
    from sparksearchengine_spark.functions.scoring import idf_expr

    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    dfd = F.col("df_t").cast("double")
    tsc_unweighted = index.scoring.term_score(
        tfd,
        dld,
        dfd,
        F.col("_n"),
        F.col("_avgdl"),
        cf_t=(F.col("cf_t") if index.scoring.needs_cf else None),
    )
    # idf factor per similarity: bm25 contributes idf once, classic
    # tfidf squares it (score = sqrt(tf)·idf², so tf_norm = sqrt(tf)).
    # Custom registered scorers and the LM family have no idf-style
    # decomposition — idf and tf_norm are NULL there; tscore/score exact.
    base_idf = idf_expr(dfd, F.col("_n"))
    sim = index.scoring.similarity
    if sim == "bm25":
        idf = base_idf
    elif sim == "tfidf":
        idf = base_idf * base_idf
    else:
        idf = F.lit(None).cast("double")
    out = j.select(
        F.col(DOC_ID),
        "field",
        "term",
        "weight",
        F.col("tf").cast("long").alias("tf"),
        F.col("dl").cast("long").alias("dl"),
        F.col("df_t").cast("long").alias("df_t"),
        idf.alias("idf"),
        (tsc_unweighted / idf).alias("tf_norm"),
        (F.col("weight") * tsc_unweighted).alias("tscore"),
    )
    w = Window.partitionBy(DOC_ID)
    out = (
        out.withColumn(
            "n_matched", F.count(F.lit(1)).over(w).cast("long")
        )
        .withColumn("score", F.sum("tscore").over(w))
        .where(F.col("n_matched") >= F.lit(int(min_match)))
    )
    return out


# rescore windows are collected to the driver (one bounded row list, the
# get_elements/_lookup_frame pattern); this cap keeps "window=" honest
RESCORE_MAX_WINDOW = 100_000


def rescore_search(
    index: "SearchIndex",
    query,
    rescore_query,
    k: int = 10,
    window: int = 100,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    score_mode: str = "total",
) -> DataFrame:
    """Two-pass rescoring (Lucene ``QueryRescorer`` / Elasticsearch
    ``rescore``): run the cheap ``query`` for the top ``window`` docs,
    re-score ONLY those with the expensive ``rescore_query`` (typically
    a phrase/proximity query), then re-rank and return the top ``k`` as
    ``(doc_id, score, rank)``.

    ``score = query_weight·q ∘ rescore_weight·r`` for docs the rescore
    query matches (``score_mode``: total | multiply | avg | max | min —
    the ES modes), and ``query_weight·q`` alone for window docs it does
    not match. Docs outside the window never move — the ES contract.

    Scale shape: the window ids are ONE bounded driver collect (≤
    ``window`` rows, capped loudly at ``RESCORE_MAX_WINDOW``); the
    rescore query compiles against a postings view left-semi-filtered
    by the broadcast window ids, so its n-way phrase join and the
    interpreted positions HOF run on at most ``window`` docs' postings
    — never the corpus. This is exactly why rescore exists: the
    expensive query's cost is bounded by the window, not the match set.
    """
    if k < 1 or window < k:
        raise ValueError(
            f"need 1 <= k <= window, got k={k} window={window}"
        )
    if window > RESCORE_MAX_WINDOW:
        raise ValueError(
            f"window={window} exceeds RESCORE_MAX_WINDOW="
            f"{RESCORE_MAX_WINDOW}; deep rescoring belongs in the base"
            " ranking (or raise the cap knowingly)"
        )
    modes = {"total", "multiply", "avg", "max", "min"}
    if score_mode not in modes:
        raise ValueError(
            f"score_mode must be one of {sorted(modes)}, got {score_mode!r}"
        )
    spark = index.postings.sparkSession
    base_rows = (
        search(index, query, k=window)
        .select(DOC_ID, F.col(SCORE).alias("_qs"))
        .collect()
    )
    base = spark.createDataFrame(
        [(int(r[DOC_ID]), float(r["_qs"])) for r in base_rows],
        f"{DOC_ID} long, _qs double",
    )
    # restricted postings view: the rescore plan sees only window docs
    import copy

    from sparksearchengine_spark.plans.compiler import compile_query

    sub = copy.copy(index)
    sub.postings = index.postings.join(
        F.broadcast(base.select(DOC_ID)), DOC_ID, "left_semi"
    )
    sub._scored_cache = {}
    # shared list: phrase persists registered by the sub-compile are
    # released by the ORIGINAL index's unpersist()
    sub._phrase_caches = index._phrase_caches
    resc = compile_query(rescore_query, sub).select(
        DOC_ID, F.col(SCORE).alias("_rs")
    )
    # non-phrase rescore queries persist scored postings into the
    # throwaway sub-index's cache — hand those frames to the ORIGINAL
    # index's release list too, or idx.unpersist() would leak them
    index._phrase_caches.extend(sub._scored_cache.values())
    q = F.lit(float(query_weight)) * F.col("_qs")
    r = F.lit(float(rescore_weight)) * F.col("_rs")
    combined = {
        "total": q + r,
        "multiply": q * r,
        "avg": (q + r) / F.lit(2.0),
        "max": F.greatest(q, r),
        "min": F.least(q, r),
    }[score_mode]
    fused = (
        base.join(resc, DOC_ID, "left")
        .select(
            DOC_ID,
            F.when(F.col("_rs").isNull(), q)
            .otherwise(combined)
            .alias(SCORE),
        )
    )
    w = Window.orderBy(F.col(SCORE).desc(), F.col(DOC_ID).asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def multi_match_search(
    index: "SearchIndex",
    text: str,
    fields: "Iterable[str] | dict[str, float]",
    k: int = 10,
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
) -> DataFrame:
    """Elasticsearch ``multi_match`` (best_fields / most_fields): one
    query string against several indexed text fields, each analyzed and
    BM25-scored with ITS OWN field statistics, then combined per doc —
    ``(doc_id, score, rank)``.

    * ``best_fields`` (default, ES dis_max): ``score = best +
      tie_breaker · (sum − best)`` — the winning field dominates,
      other matching fields contribute ``tie_breaker`` ∈ [0, 1] each.
    * ``most_fields``: plain sum across fields.

    ``fields`` may be a dict ``{field: boost}`` (the ES ``"title^2"``
    form; the boost scales that field's score before combining).

    :func:`bm25f_search` is the principled cross-field alternative
    (blends tf BEFORE saturation, union docFreq); multi_match is the
    per-field-score composition every ES user reaches for first.

    Plan: one compiled match_text sub-plan per field (each the standard
    qc10 postings join), a union + ONE groupBy(doc_id) partial agg, one
    TakeOrdered — shuffle keyed on doc_id, bounded by the per-field
    match sets.
    """
    from sparksearchengine_spark.plans.ast import Q

    if match_type not in ("best_fields", "most_fields"):
        raise ValueError(
            "match_type must be best_fields or most_fields, got"
            f" {match_type!r}"
        )
    if not (0.0 <= float(tie_breaker) <= 1.0):
        raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
    boosts = (
        dict(fields)
        if isinstance(fields, dict)
        else {f: 1.0 for f in fields}
    )
    if not boosts:
        raise ValueError("fields must be non-empty")
    parts = []
    for f, w in boosts.items():
        c = index.compile(Q.field(f).match_text(text)).select(
            DOC_ID, (F.col(SCORE) * F.lit(float(w))).alias("_s")
        )
        parts.append(c)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy(DOC_ID).agg(
        F.max("_s").alias("_mx"), F.sum("_s").alias("_sm")
    )
    if match_type == "most_fields":
        score = F.col("_sm")
    else:
        score = F.col("_mx") + F.lit(float(tie_breaker)) * (
            F.col("_sm") - F.col("_mx")
        )
    return ranked_topk(
        agg.select(DOC_ID, score.alias(SCORE)),
        [F.col(SCORE).desc(), F.col(DOC_ID).asc()],
        k,
    )
