"""Search execution operators: top-k, batch search, query join, lookups.

Reference execution surface (SURVEY §2.5): `aggregatingSearch` (E1),
`search` (E2), `light*` (E3), `*WithResultsTransformer` (E4),
`batchSearch` (E5/E6), `queryJoin` (E7-E10), `getElement(s)` (E11/E12).
The reference hand-rolls per-partition top-k + tree merges
(`utils/package.scala:16-101`) and runs query joins as
``cartesian(queryBatches × indexes)``
(`PartitionsIndexLuceneRDD.scala:273`) — O(P²) tasks.

Here every one of those collapses into Catalyst constructs:

* global top-k        -> orderBy+limit => TakeOrderedAndProject (per-
                         partition top-k + tree merge, exactly E1's kernel)
* light / transformer -> column pruning (free)
* batch search        -> query-terms table JOIN postings (broadcast when
                         small) + groupBy partial agg + per-query rank
                         window — no cartesian anywhere
* per-query top-k     -> two-stage rank (salted pre-top-k then final) so a
                         single hot query never serializes one reducer at
                         100 TB (`topk_per_group(salt_buckets=...)`)
* lookups             -> (broadcastable) join on doc_id
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparksearchengine_spark.functions.analyzers import analyzer_expr

if TYPE_CHECKING:
    from sparksearchengine_spark.operators.index import SearchIndex
    from sparksearchengine_spark.plans.ast import Query

DOC_ID = "doc_id"
SCORE = "score"

# Above this many query rows the tokenized query-terms side is no longer
# safely broadcastable (rows fan out ~10-50 terms each); fall back to a
# shuffle-hash join on term so the big self-join case (reference
# `examples/SearchableRDDExamples.scala:68-82`, corpus joined to itself)
# cannot OOM the driver.
BROADCAST_MAX_QUERY_ROWS = 100_000
# Certainly-small / certainly-large byte bounds for plans carrying no row
# count. CAUTION: for file scans sizeInBytes is the COMPRESSED on-disk
# size; text columns dictionary-compress 5-10x, so the "small" bound must
# assume that expansion (1 MB compressed ~ up to 100k short rows) and the
# ambiguous middle is resolved by a memoized exact probe instead.
BROADCAST_TINY_QUERY_BYTES = 1 << 20
BROADCAST_HUGE_QUERY_BYTES = 1 << 30

# (analyzed-plan semanticHash, max_rows) -> decision. Bounds the probe to
# once per distinct query-side plan per session; repeated calls (the
# build-once / query-many economics every operator here assumes) hit the
# cache driver-side with no job.
_PROBE_CACHE: dict[tuple[int, int], bool] = {}


def _plan_stats(df: DataFrame) -> tuple[int | None, int]:
    """(row_count or None, size_in_bytes) from Catalyst's optimized-plan
    statistics — a pure driver-side estimate; launches NO Spark job."""
    st = df._jdf.queryExecution().optimizedPlan().stats()
    rc = st.rowCount()
    # py4j converts scala BigInt to int; str() round-trip guards either way
    rows = int(str(rc.get())) if rc.isDefined() else None
    return rows, int(str(st.sizeInBytes()))


def decide_broadcast(
    df: DataFrame, max_rows: int, trust_bytes: bool = True
) -> bool:
    """Should a join side derived from ``df`` (bounded by its row count)
    be broadcast?

    Decision ladder, cheapest first:

    1. optimized-plan ``rowCount`` when Catalyst carries one (local
       relations, limits) — exact, no job;
    2. with ``trust_bytes``, ``sizeInBytes`` outside the ambiguous band —
       certainly-small / certainly-large calls need no job either. The
       small bound assumes worst-case parquet compression (sizeInBytes
       is the COMPRESSED scan size, it UNDER-estimates in-memory rows —
       the r3 review caught a 32 MB bound here that could broadcast
       millions of rows). Pass ``trust_bytes=False`` when ``df`` is a
       derived frame whose size stats don't model its cardinality at
       all — Spark's size-only estimator passes Generate (explode)
       through un-multiplied and leaves Aggregate output at input scale,
       so an exploded gram table looks tiny and a distinct-vocab
       aggregate looks corpus-sized;
    3. otherwise ONE exact early-exit probe (limit(n+1).count()),
       memoized per (analyzed-plan semanticHash, max_rows) so the
       build-once / query-many pattern pays it once per session, not per
       call (the r2 verdict's objection to the always-probe design).

    The memo is keyed on the PLAN, not the data: if the files under an
    ambiguous-band path are rewritten mid-session at a different scale,
    pass an explicit broadcast flag at the call site (every operator
    exposes one) — the cache has no TTL by design.
    """
    rows, size = _plan_stats(df)
    if rows is not None:
        return rows <= max_rows
    if trust_bytes:
        # The tiny-bytes bound is calibrated for the DEFAULT row budget
        # (1 MB compressed ~ up to 100k short rows). A caller with a
        # tighter budget (more_like_this keyword sides budget a few
        # thousand rows) must not inherit it: 1 MB of delta/RLE-packed
        # ids can hold millions of rows, far past such a budget — scale
        # the bound down proportionally (r3 review).
        tiny = BROADCAST_TINY_QUERY_BYTES * min(
            1.0, max_rows / BROADCAST_MAX_QUERY_ROWS
        )
        if size <= tiny:
            return True
        if size >= BROADCAST_HUGE_QUERY_BYTES:
            return False
    key = (
        int(str(df._jdf.queryExecution().analyzed().semanticHash())),
        max_rows,
    )
    if key not in _PROBE_CACHE:
        if len(_PROBE_CACHE) >= 1024:  # decisions are 1 bool/plan; bound anyway
            _PROBE_CACHE.clear()
        _PROBE_CACHE[key] = df.limit(max_rows + 1).count() <= max_rows
    return _PROBE_CACHE[key]


def _hint_query_side(
    qterms: DataFrame,
    queries_df: DataFrame,
    broadcast_queries: bool | None,
    max_rows: int = BROADCAST_MAX_QUERY_ROWS,
) -> DataFrame:
    """Pick the join strategy for the query-terms side of a postings join.

    ``broadcast_queries``: True forces broadcast, False forces the
    shuffle-hash path, None (default) applies :func:`decide_broadcast` to
    ``queries_df``. Shuffle-hash is the safe fallback direction: the
    postings side is still never the build side, and AQE's skew-join
    splitting applies on hot terms.
    """
    if broadcast_queries is None:
        broadcast_queries = decide_broadcast(queries_df, max_rows)
    return F.broadcast(qterms) if broadcast_queries else qterms.hint("shuffle_hash")


def _hint_data_side(
    df: DataFrame, max_rows: int = BROADCAST_MAX_QUERY_ROWS
) -> DataFrame:
    """Join hint for a DERIVED data-dependent side whose cardinality is
    unknowable driver-side (e.g. the vocabulary terms matching a batch
    of wildcard patterns: 'a*' on a 100-TB corpus vocabulary can match
    1e8 terms). Broadcast only when the probe proves it small
    (``trust_bytes=False`` — a join+filter's Catalyst size stats don't
    model its output), else shuffle_hash with THIS side as build side.
    The probe is one bounded early-exit job, memoized per plan per
    session (the register-once / percolate-many economics)."""
    if decide_broadcast(df, max_rows, trust_bytes=False):
        return F.broadcast(df)
    return df.hint("shuffle_hash")


def ranked_topk(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Global top-k with a 1-based ``rank`` column: orderBy+limit (=
    TakeOrderedAndProject, never a full sort) then row_number over the
    same ordering on the ≤k survivors. The one place the ordering
    expression lives for every single-query ranked operator (suggest /
    significant-terms / BM25F / PRF) — change a tie-break here, every
    ranking moves together (r3 review: this block existed 5×)."""
    w = Window.orderBy(*order_cols)
    return (
        df.orderBy(*order_cols)
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    salt_buckets: int | None = None,
    salt_col: str = DOC_ID,
) -> DataFrame:
    """rank-window top-k per group, optionally two-stage.

    With ``salt_buckets=s``, a first window over (group, hash(salt_col)%s)
    keeps s*k candidates per group (partial top-k, fully parallel), and only
    those reach the final per-group window — the standard skew-safe top-k at
    scale (SURVEY §7.3.3). Exact for any s because every true top-k row
    survives its own bucket's top-k.
    """
    if salt_buckets and salt_buckets > 1:
        pre = Window.partitionBy(
            *[F.col(c) for c in group_cols],
            (F.crc32(F.col(salt_col).cast("string")) % salt_buckets),
        ).orderBy(*order_cols)
        df = (
            df.withColumn("_prerank", F.row_number().over(pre))
            .where(F.col("_prerank") <= k)
            .drop("_prerank")
        )
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# -- E1/E2/E3/E4 -----------------------------------------------------------


def search(
    index: "SearchIndex",
    query: "Query",
    k: int = 10,
    with_elements: bool = False,
    select_cols: list[str] | None = None,
    offset: int = 0,
    search_after: "tuple[float, int] | None" = None,
) -> DataFrame:
    """Lazy top-k: DataFrame(doc_id, score, rank [, element columns]).

    orderBy+limit compiles to TakeOrderedAndProject — per-partition top-k
    then a tree merge, the exact physical shape the reference hand-rolls
    (E1/E2; `utils/package.scala:16-40`) but without its double-job
    sortBy+zipWithIndex (`SearchableRDD.scala:344-349`).

    Ties break on doc_id ascending (deterministic). ``offset`` paginates
    (Lucene searchAfter shape): ranks (offset, offset+k] — executed as
    one TakeOrdered of offset+k rows then a rank filter, so page N costs
    one job and the deep-paging cost grows with offset exactly as it
    must (cap offsets in serving layers).

    ``search_after=(score, doc_id)`` is the cursor form (Lucene/ES
    ``searchAfter``): pass the LAST hit of the previous page and get the
    next k rows strictly after it in (score desc, doc_id asc) order.
    Unlike ``offset``, page N costs the same as page 1 — the cursor
    predicate drops prior rows BEFORE the TakeOrdered heap, so the heap
    holds k rows no matter how deep the page. This is the only
    deep-paging shape that survives scale; ``rank`` restarts at 1 per
    page (page-local).

    Boundary matching compares 6dp-ROUNDED scores on both sides (the
    engine's score-equality contract everywhere else): the equality arm
    compares the collected cursor against a RE-EXECUTED aggregated
    score, and multi-partition float sums are not bit-deterministic
    across jobs — a ≥3-term query whose cursor doc's partial sums merge
    in a different order can drift 1 ulp, and EXACT equality would then
    misclassify the boundary tie (skip or repeat that one doc). The
    rounding absorbs the drift; distinct scores within 5e-7 of the
    cursor are treated as boundary ties and disambiguated by doc_id —
    and the SORT implements the same contract: pages rank by
    ``(round(score, 6) DESC, doc_id ASC)``, so the cursor predicate and
    the page order agree on which docs are "after" the cursor (ranking
    by full precision while comparing rounded would deterministically
    skip or repeat sub-6dp-distinct docs straddling a page boundary).
    ``score`` in the output stays full precision.
    """
    if offset < 0:
        raise ValueError("offset must be >= 0")
    if search_after is not None and offset:
        raise ValueError("pass either offset or search_after, not both")
    hits = index.compile(query)
    if search_after is not None:
        # boundary matching on 6dp-ROUNDED scores (the engine's score-
        # equality contract): a recomputed float sum can drift an ulp
        # between the page-1 and page-2 runs, and exact equality would
        # then skip or repeat the boundary doc
        s, d = search_after
        # the cursor literal rounds through Spark's own HALF_UP round
        # (constant-folded), not Python's banker's rounding
        rs, ra = F.round(F.col(SCORE), 6), F.round(F.lit(float(s)), 6)
        hits = hits.where(
            (rs < ra) | ((rs == ra) & (F.col(DOC_ID) > F.lit(int(d))))
        )
    # rank by the SAME rounded score the cursor predicate compares —
    # sub-6dp-distinct docs are ties everywhere, never page stragglers
    hits = hits.orderBy(
        F.round(F.col(SCORE), 6).desc(), F.col(DOC_ID).asc()
    ).limit(k + offset)
    w = Window.orderBy(F.round(F.col(SCORE), 6).desc(), F.col(DOC_ID).asc())
    hits = hits.withColumn("rank", F.row_number().over(w))  # ≤ k+offset rows
    if offset:
        hits = hits.where(F.col("rank") > offset)
    return _join_elements(index, hits, with_elements, select_cols)


def _join_elements(
    index: "SearchIndex",
    hits: DataFrame,
    with_elements: bool,
    select_cols: "list[str] | None",
) -> DataFrame:
    """E4/E6 element join shared by `search` and `batch_search_dsl`:
    corpus payload joined onto the k-bounded hits. hits is the small
    side — broadcast IT, never the corpus, so the join stays a
    map-side lookup at any corpus size. Corpus columns that collide
    with the result columns (score/rank/query_id) raise loudly instead
    of silently producing ambiguous duplicates (r6 review); project or
    alias them via ``select_cols``."""
    if not (with_elements or select_cols):
        return hits
    c = index.corpus
    elems = c.df.withColumn(DOC_ID, F.col(c.id_col).cast("long"))
    if select_cols:  # E4 resultsTransformer = projection pushdown
        elems = elems.select(DOC_ID, *select_cols)
    clash = (set(elems.columns) - {DOC_ID}) & set(hits.columns)
    if clash:
        raise ValueError(
            f"element column(s) {sorted(clash)} collide with result "
            "columns; rename them in the corpus or project/alias via "
            "select_cols"
        )
    return F.broadcast(hits).join(elems, DOC_ID)


def aggregating_search(
    index: "SearchIndex", query: "Query", k: int = 10
) -> list[tuple]:
    """E1 — driver-side list[(Row, score)], score-desc."""
    rows = search(index, query, k, with_elements=True).orderBy("rank").collect()
    return [(r, r[SCORE]) for r in rows]


def light_search(index: "SearchIndex", query: "Query", k: int = 10) -> DataFrame:
    """E3 — ids+scores only (identical plan minus the element join)."""
    return search(index, query, k, with_elements=False)


# -- E5/E6: batch search ---------------------------------------------------


def batch_search(
    index: "SearchIndex",
    queries_df: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    field_col: str | None = None,
    text_col: str = "qtext",
    field: str | None = None,
    k_col: str | None = None,
    salt_buckets: int | None = None,
    broadcast_queries: bool | None = None,
    after_score_col: str | None = None,
    after_doc_col: str | None = None,
) -> DataFrame:
    """E5 — many queries in one pass. queries_df: (query_id, qtext[, field, k]).

    Plan: tokenize queries -> explode to (query_id, field, term) -> join
    postings on (field, term) [query side broadcast when small, else
    shuffle-hash on the key — see ``_hint_query_side``] ->
    groupBy(query_id, doc_id) partial+final score agg -> per-query top-k
    rank window. Returns (query_id, doc_id, score, rank).

    When ``k_col`` is given it takes precedence over ``k``: the rank
    window is cut at max(k_col) and each query filtered to its own _k, so
    per-query ks larger than ``k`` are honored, not truncated.

    The reference executes this as a per-index loop over queries
    (`LuceneIndex.scala:54-60`) + aggregateByKey merge; a join *is* that
    loop, minus the cartesian and with map-side combine.

    ``after_score_col`` + ``after_doc_col`` page the whole batch by
    CURSOR (the per-query `search_after` analog, as data): each query
    row carries the full-precision (score, doc_id) of ITS previous
    page's last hit, and gets the next k rows strictly after it in
    (score desc, doc_id asc) order. NULL cursors mean page 1. The
    predicate drops prior rows BEFORE the rank window, so page N costs
    page 1 — per query, in one batch job. Ranks restart at 1 per page
    (page-local), same as the single-query cursor. Boundary matching
    compares 6dp-ROUNDED scores on both sides, so an ulp of float-
    reaggregation drift between page runs cannot skip or repeat the
    boundary doc (same contract as the single-query `search_after`).
    """
    if field is None and field_col is None:
        raise ValueError("pass field= or field_col=")
    if (after_score_col is None) != (after_doc_col is None):
        raise ValueError(
            "pass BOTH after_score_col and after_doc_col (or neither)"
        )
    fexpr = F.col(field_col) if field_col else F.lit(field)

    fields = (
        [r[0] for r in queries_df.select(fexpr).distinct().collect()]
        if field_col
        else [field]
    )
    analyzers = {
        f: index.corpus.text_cols[f].query_time_analyzer() for f in fields
    }

    window_k = k
    if k_col:  # window cutoff must cover the LARGEST per-query k
        max_k = queries_df.agg(F.max(F.col(k_col))).first()[0]
        window_k = int(max_k) if max_k is not None else k

    kexpr = F.col(k_col) if k_col else F.lit(k)

    # mixed-analyzer fields: one analysis branch per distinct analyzer
    # (the reference's per-index loop trivially serves these —
    # `LuceneIndex.scala:54-60`); each branch filters to its fields,
    # analyzes with ITS analyzer, and the exploded term frames union
    # into the one shared join/agg/top-k plan.
    by_analyzer: dict[str, list[str]] = {}
    for f in fields:
        by_analyzer.setdefault(analyzers[f], []).append(f)

    qterms = None
    for an, fs in by_analyzer.items():
        sub = (
            queries_df.where(fexpr.isin(fs))
            if len(by_analyzer) > 1
            else queries_df
        )
        branch = sub.select(
            F.col(query_id_col).alias("query_id"),
            fexpr.alias("field"),
            kexpr.alias("_k"),
            (
                F.col(after_score_col).cast("double")
                if after_score_col
                else F.lit(None).cast("double")
            ).alias("_as"),
            (
                F.col(after_doc_col).cast("long")
                if after_doc_col
                else F.lit(None).cast("long")
            ).alias("_ad"),
            F.explode(
                F.array_distinct(analyzer_expr(F.col(text_col), an))
            ).alias("term"),
        )
        qterms = branch if qterms is None else qterms.unionByName(branch)

    # per-posting scores are precomputed once per field and cached
    # (SearchIndex.scored_postings); stats differences between fields are
    # baked into the cached floats, so no per-row map lookup is needed
    sp = None
    for f in fields:
        # bucketed saved layout: prune each field's postings scan to the
        # buckets this batch's terms touch (DPP — terms are data here)
        one = index.scored_postings(
            f,
            prune_terms=(
                qterms.where(F.col("field") == f).select("term")
                if index.term_buckets
                else None
            ),
        ).withColumn("field", F.lit(f))
        sp = one if sp is None else sp.unionByName(one)

    qside = _hint_query_side(qterms, queries_df, broadcast_queries)
    scored = sp.join(qside, ["field", "term"]).select(
        "query_id", "_k", "_as", "_ad", F.col(DOC_ID), "tscore"
    )
    agg = scored.groupBy("query_id", DOC_ID).agg(
        F.sum("tscore").alias(SCORE),
        F.first("_k").alias("_k"),
        F.first("_as").alias("_as"),
        F.first("_ad").alias("_ad"),
    )
    if after_score_col:
        # cursor as data: strictly after (score desc, doc_id asc) —
        # applied BEFORE the window so the rank heap never holds prior
        # pages' rows (NULL cursor = page 1, no filter for that query).
        # The boundary compares 6dp-ROUNDED scores on both sides (the
        # engine's score-equality contract everywhere else): a
        # re-aggregated float sum can drift an ulp between the page-1
        # run and the page-2 run with different partition order, and
        # exact equality would then skip or repeat the boundary doc.
        # Scores within 5e-7 of each other are treated as tied and
        # disambiguated by doc_id, matching how the 6dp contract orders
        # them for oracle comparison.
        rs, ra = F.round(F.col(SCORE), 6), F.round(F.col("_as"), 6)
        agg = agg.where(
            F.col("_as").isNull()
            | (rs < ra)
            | ((rs == ra) & (F.col(DOC_ID) > F.col("_ad")))
        )
    # rank by the SAME rounded score the cursor predicate compares (the
    # 6dp contract): ranking full-precision while the boundary compares
    # rounded would skip/repeat sub-6dp-distinct docs across pages
    ranked = topk_per_group(
        agg,
        ["query_id"],
        [F.round(F.col(SCORE), 6).desc(), F.col(DOC_ID).asc()],
        k=window_k,
        salt_buckets=salt_buckets,
    )
    if k_col:
        ranked = ranked.where(F.col("rank") <= F.col("_k"))
    return ranked.select("query_id", DOC_ID, SCORE, "rank")


# comparison ops shared by the DSL batch's data-driven filter slots —
# the same operator set as plans.compiler._filter_pred
_DSL_FILTER_OPS = {
    "=": lambda a, b: a == b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def batch_search_dsl(
    index: "SearchIndex",
    queries: "Iterable[tuple[int, Query]]",
    k: int = 10,
    salt_buckets: int | None = None,
    max_plans: int = 64,
    with_elements: bool = False,
    select_cols: "list[str] | None" = None,
    k_by_query: "dict[int, int] | None" = None,
) -> DataFrame:
    """E5 generalized — many ARBITRARY DSL query trees in one pass.

    The reference's ``batchSearch(Iterable[(Long, DslQuery)])`` accepts
    any query per id — phrases, booleans, filters included
    (`SearchableRDD.scala:194-197`; executed as a per-index loop,
    `impl/LuceneIndex.scala:54-60`). This is that API with the loop
    replaced by shape-grouped plans:

    * **term-class queries** (matchTerm / matchAll / matchAny /
      matchMin / matchText) become DATA — one shared plan: literal
      ``(query_id, field, term, min_match)`` rows joined to the cached
      scored postings, ``groupBy(query_id, doc_id)`` partial agg, a
      matched-clause count filter, one per-query rank window. A
      thousand term-class queries cost ONE join, exactly like
      :func:`batch_search`.
    * **phrases — exact AND sloppy — are ALSO data** — one shared plan
      for any number of distinct phrases: literal ``(query_id, qpos,
      term)`` rows (with the per-query span bound ``slop + n - 1`` as
      a column) join the positions-carrying scored postings, docs
      matching every phrase position survive a count filter, and one
      ordered greedy position-chain HOF verifies per (query, doc) —
      exactly the single-query plan's shape, with the offsets and span
      bound as data instead of literals. The HOF runs on survivors
      only (docs containing ALL the phrase's terms), never the corpus.
      Phrases do NOT count toward ``max_plans``.
    * **And(term-class, simple filters) is ALSO data** — filters
      group by STRUCTURAL SIGNATURE (field / op / value type, value
      abstracted): the term rows join the one shared plan and each
      signature group applies its per-query comparison VALUES via one
      doc-attribute join + one broadcast values join — a registry of
      thousands of per-user "match X where attr op value" standing
      queries costs one plan per distinct signature, not per query.
      Signatures count toward ``max_plans``; filters with None/mixed-
      type values, unknown fields, or negative operands fall back to
      the compiled path.
    * **multi-term queries (wildcard / regex / fuzzy) are ALSO data** —
      the patterns broadcast into ONE vocabulary scan (the Lucene
      term-dictionary intersection, batched: LIKE / anchored-rlike /
      levenshtein evaluate on termstats rows, never postings), the
      matched (query_id, term) pairs hash-join the shared scored
      postings, and docs dedupe to the single-query path's constant
      score 1.0. A registry of 100 saved wildcard alerts costs one
      dictionary pass, not 100. They do NOT count toward
      ``max_plans``.
    * **every other shape** (near, other booleans, raw) compiles
      through the
      standard single-query compiler ONCE PER DISTINCT AST — duplicate
      queries share a plan via a broadcast id-attach join — and the
      k-bounded results union into the same final top-k window. Plan
      count is bounded by ``max_plans`` distinct non-term shapes (loud
      error beyond: split the batch, or precompile saved searches with
      the percolator for corpus-scale standing-query sets).

    Scores are bit-identical to per-query ``search()`` for plain term
    classes and phrases — term-class batching reuses the same cached
    per-posting floats and the same distinct-term sum + min_match
    threshold as the compiler's ``_term_set``, phrase scores left-fold
    in qpos order like the compiler's chain. ``Boost`` over a term
    class and ``Or`` trees whose operands all normalize with
    min_match == 1 ALSO run as data (per-term weights, accumulated
    across Or operands — the parsed ``foo bar^2 baz`` shape costs no
    compiled plan); their scores equal ``search()`` at the engine's
    6-dp results contract (``sum(ts)·w`` vs ``sum(ts·w)`` differ only
    in the last ulp). Term sets carrying DUPLICATE clauses (min_match
    weighting differs) route to the compiler path for exactness.

    Returns ``(query_id, doc_id, score, rank)``; queries with no hits
    contribute no rows (same contract as `batch_search`).
    ``with_elements`` / ``select_cols`` join the corpus payload back
    onto the k-bounded hits (the E6 raw/transformer variants): the
    hits side is broadcast — bounded by |queries|·k — so the join is a
    map-side lookup at any corpus size, same as `search()`.

    ``k_by_query`` gives individual queries their own k (ids absent
    from the map use ``k``) — the `batch_search` ``k_col`` analog for
    the DSL surface. One rank window runs at ``max(k, k_by_query
    values)``; per-query limits apply as a broadcast map join on the
    already-k-bounded rows, so heterogeneous depths cost nothing extra.
    """
    spark = index.postings.sparkSession
    qlist = list(queries)
    if k_by_query:
        bad = {q: v for q, v in k_by_query.items() if int(v) < 1}
        if bad:
            raise ValueError(f"k_by_query values must be >= 1: {bad}")
        unknown = set(k_by_query) - {qid for qid, _ in qlist}
        if unknown:
            raise ValueError(
                f"k_by_query ids not in the batch: {sorted(unknown)}"
            )
    kmax = max([k, *map(int, (k_by_query or {}).values())])
    unioned = _dsl_scored_union(index, qlist, max_plans)
    if unioned is None:
        ranked = spark.createDataFrame(
            [], f"query_id long, {DOC_ID} long, {SCORE} double, rank int"
        )
    else:
        ranked = topk_per_group(
            unioned,
            ["query_id"],
            [F.col(SCORE).desc(), F.col(DOC_ID).asc()],
            k=kmax,
            salt_buckets=salt_buckets,
        ).select("query_id", DOC_ID, SCORE, "rank")
        if k_by_query:
            kdf = spark.createDataFrame(
                [(int(q), int(v)) for q, v in k_by_query.items()],
                "query_id long, _k int",
            )
            ranked = (
                ranked.join(F.broadcast(kdf), "query_id", "left")
                .where(F.col("rank") <= F.coalesce(F.col("_k"), F.lit(k)))
                .drop("_k")
            )
    return _join_elements(index, ranked, with_elements, select_cols)


def batch_search_parsed(
    index: "SearchIndex",
    queries: "Iterable[tuple[int, str]]",
    k: int = 10,
    default_field: str = "text",
    **kw,
) -> DataFrame:
    """`batch_search_dsl` over SAVED QUERY STRINGS — each ``(id,
    "lucene-ish string")`` parses through `plans.parser.parse_query`
    (terms, phrases incl. slop, booleans, field:, boosts, ranges,
    wildcards, fuzzy, regex) and the resulting ASTs batch through the
    shape-grouped executor. The saved-search registry a reference user
    keeps as RawQuery strings (`QueryConstructor.scala`) runs in one
    call; parse errors raise up front naming the offending id."""
    from sparksearchengine_spark.plans.parser import parse_query

    parsed = []
    for qid, s in queries:
        try:
            parsed.append((qid, parse_query(s, default_field)))
        except ValueError as e:
            raise ValueError(f"query id {qid}: {e}") from e
    return batch_search_dsl(index, parsed, k=k, **kw)


def percolate_dsl(
    index: "SearchIndex",
    queries: "Iterable[tuple[int, Query]]",
    max_plans: int = 64,
) -> DataFrame:
    """Percolation over the FULL query DSL: every ``(query_id, doc_id,
    score)`` match of every registered query — no top-k window, because
    percolation asks "which standing queries fire for these docs", not
    "which docs rank best" (the Elasticsearch percolator contract,
    arbitrary query DSL included).

    Same shape-grouped execution as :func:`batch_search_dsl` — term
    classes and exact phrases run as data in shared plans, other shapes
    once per distinct AST — so a registry of thousands of saved
    searches (alerting, routing-by-topic) matches a document batch in a
    bounded number of joins. Run it over a micro-batch index inside
    ``foreachBatch`` for streams (`streaming.percolate_stream_dsl`),
    or over any corpus slice for backfills.
    """
    spark = index.postings.sparkSession
    unioned = _dsl_scored_union(index, list(queries), max_plans)
    if unioned is None:
        return spark.createDataFrame(
            [], f"query_id long, {DOC_ID} long, {SCORE} double"
        )
    return unioned


def weighted_terms(
    index: "SearchIndex", q
) -> "tuple[list[tuple[str, str, float]], int] | None":
    """(rows [(field, term, weight)], min_match) when ``q`` normalizes
    to a weighted-term plan, else None.

    Beyond bare term classes this folds (r6):
    * ``Boost(term-class)`` — the factor scales every term weight
      (score = factor · sum, so per-term scaling is exact);
    * ``Or`` whose operands ALL normalize with min_match == 1 —
      the compiled Or is union + groupBy sum, which equals one
      weighted matchAny with per-term weights ACCUMULATED across
      operands (a term contributed by two operands scores twice);
      operands may span different fields (field rides per row).
    The classic parsed saved-search shape ``foo bar^2 baz`` thus
    joins the one data-driven plan instead of compiling its own.
    Shared by the DSL batch executor and :func:`explain_scores`.
    """
    return weighted_terms_cfg(index.corpus.text_cols, q)


def weighted_terms_cfg(
    text_cols: dict, q
) -> "tuple[list[tuple[str, str, float]], int] | None":
    """:func:`weighted_terms` against a bare ``{field: TextOptions}``
    config instead of a live index — the part of the normalization that
    needs no Spark state, so `joindsl.query_join_dsl`'s executor-side
    Arrow UDF can run the SAME logic per row (single source of truth
    for what counts as a weighted-term plan)."""
    from sparksearchengine_spark.functions.analyzers import tokenize_py
    from sparksearchengine_spark.plans import ast

    if isinstance(
        q, (ast.MatchTerm, ast.MatchTermSet, ast.MatchText)
    ) and q.field not in text_cols:
        raise ValueError(
            f"field {q.field!r} is not a searchable text column "
            f"(declared: {sorted(text_cols)})"
        )
    if isinstance(q, ast.MatchTerm):
        return [(q.field, q.term, 1.0)], 1
    if isinstance(q, ast.MatchTermSet):
        if len(set(q.terms)) != len(q.terms):
            return None  # duplicate clauses: weighted threshold
        return [
            (q.field, t, 1.0) for t in sorted(q.terms)
        ], q.min_match
    if isinstance(q, ast.MatchText):
        analyzer = text_cols[q.field].query_time_analyzer()
        terms = tuple(sorted(set(tokenize_py(q.text, analyzer))))
        return [(q.field, t, 1.0) for t in terms], (
            len(terms) if q.require_all and terms else 1
        )
    if isinstance(q, ast.Boost):
        inner = weighted_terms_cfg(text_cols, q.operand)
        if inner is None:
            return None
        rows, mm = inner
        fac = float(q.factor)
        return [(f, t, w * fac) for f, t, w in rows], mm
    if isinstance(q, ast.Or):
        parts = [weighted_terms_cfg(text_cols, o) for o in q.operands]
        if any(p is None or p[1] != 1 for p in parts):
            return None
        merged: dict[tuple[str, str], float] = {}
        for rows, _ in parts:
            for f, t, w in rows:
                merged[(f, t)] = merged.get((f, t), 0.0) + w
        return [
            (f, t, w) for (f, t), w in sorted(merged.items())
        ], 1
    return None


def _phrase_verify_branch(joined: DataFrame) -> DataFrame:
    """Phrase verification with per-query offsets and span bound as DATA
    — shared by `_dsl_scored_union` (driver-listed phrases) and
    `joindsl.query_join_dsl` (phrases extracted from a query COLUMN).

    ``joined`` carries (query_id, doc_id, qpos, positions, tscore, _n,
    _maxspan) — one row per (query phrase position × matching posting).
    Survivors of the every-position-matched count filter run an ordered
    greedy position chain: exists p0 in positions(qpos=0) such that
    folding over the remaining qpos picks the smallest position >
    previous and chain_end - p0 <= max_span (= slop + n - 1). Greedy
    minimizes the chain end, so one pass per start is exact (the
    compiler's sloppy-phrase argument); at slop=0 the strictly-
    increasing chain hitting span n-1 forces exact adjacency, so ONE
    predicate serves exact and sloppy phrases alike. A broken chain
    folds to NULL -> the comparison is NULL -> no match. Interpreted
    HOF, but only on count-filter survivors. Score: left fold of
    tscore in qpos order — bit-identical to the compiler's
    reduce(add) chain."""
    cand = (
        joined.groupBy("query_id", DOC_ID)
        .agg(
            # plain count, NOT count_distinct: per (query_id, doc_id)
            # each qpos joins at most ONE posting row ((query_id, qpos)
            # is unique on the query side, (field, term, doc_id) on the
            # postings side), so row count == matched-qpos count — and
            # a distinct aggregate alongside collect_list would force an
            # Expand that doubles the aggregation input volume
            F.count(F.lit(1)).alias("_nm"),
            F.first("_n").alias("_n"),
            F.first("_maxspan").alias("_maxspan"),
            F.array_sort(
                F.collect_list(
                    F.struct("qpos", "positions", "tscore")
                )
            ).alias("_pairs"),
        )
        # survivors: every phrase position matched in this doc
        .where(F.col("_nm") == F.col("_n"))
    )

    def _chain_end(p0):  # type: ignore[no-untyped-def]
        return F.aggregate(
            F.slice(
                F.col("_pairs"), F.lit(2), F.size("_pairs") - 1
            ),
            p0,
            lambda acc, pr: F.array_min(
                F.filter(pr["positions"], _after(acc))
            ),
        )

    def _after(prev):  # type: ignore[no-untyped-def]
        # single-arg lambda: a 2-arg lambda would be interpreted
        # by F.filter as (element, index) (compiler._phrase note)
        return lambda x: x > prev

    # exact phrases (maxspan == n-1: the greedy chain forces strict
    # adjacency) take a far cheaper EXACT path: fold the first term's
    # positions through array_intersect(positions+1, next positions) —
    # one builtin array op per phrase term instead of an interpreted
    # exists x aggregate x filter loop PER START POSITION. At 10k hot-
    # term phrase queries this is the difference between the HOF
    # dominating the whole percolation and a scan-cost branch (the
    # bench's percolate row was 6x slower without it). Sloppy phrases
    # (maxspan > n-1) keep the greedy chain.
    exact_ok = (
        F.size(
            F.aggregate(
                F.slice(F.col("_pairs"), F.lit(2), F.size("_pairs") - 1),
                F.element_at("_pairs", 1)["positions"],
                lambda acc, pr: F.array_intersect(
                    F.transform(acc, lambda p: p + 1), pr["positions"]
                ),
            )
        )
        > 0
    )
    greedy_ok = F.exists(
        F.element_at("_pairs", 1)["positions"],
        lambda p0: (_chain_end(p0) - p0) <= F.col("_maxspan"),
    )
    ok = F.when(
        F.col("_maxspan") == F.col("_n") - 1, exact_ok
    ).otherwise(greedy_ok)
    score_fold = F.aggregate(
        "_pairs",
        F.lit(0.0),
        lambda acc, pr: acc + pr["tscore"],
    )
    return cand.where(ok).select(
        "query_id", DOC_ID, score_fold.alias(SCORE)
    )


def _dsl_scored_union(
    index: "SearchIndex",
    qlist: "list[tuple[int, Query]]",
    max_plans: int,
) -> DataFrame | None:
    """(query_id, doc_id, score) matches for a list of (id, AST) pairs,
    shape-grouped (see `batch_search_dsl`); None for an empty list.
    Validates id uniqueness — the one contract both DSL surfaces
    (`batch_search_dsl`, `percolate_dsl`) share."""
    from sparksearchengine_spark.functions.analyzers import tokenize_py
    from sparksearchengine_spark.plans import ast

    ids = [qid for qid, _ in qlist]
    if len(set(ids)) != len(ids):
        raise ValueError("duplicate query ids in batch")
    spark = index.postings.sparkSession
    if not qlist:
        return None

    def _as_weighted(q):  # type: ignore[no-untyped-def]
        return weighted_terms(index, q)

    def _slot_sig(f) -> "tuple | None":
        """Structural signature of one filter — field, op, and VALUE
        TYPE with the value itself abstracted — or None when the
        filter cannot ride the data path (unknown corpus field,
        None/mixed-type values)."""
        fields = index.corpus.df.columns
        if isinstance(f, ast.CompareFilter):
            if f.field not in fields or f.value is None:
                return None
            return ("cmp", f.field, f.op, type(f.value).__name__)
        if isinstance(f, ast.RangeFilter):
            if f.field not in fields or f.lo is None or f.hi is None:
                return None
            return (
                "range",
                f.field,
                type(f.lo).__name__,
                type(f.hi).__name__,
            )
        if isinstance(f, ast.InSetFilter):
            tns = {type(v).__name__ for v in f.values}
            if f.field not in fields or len(tns) != 1 or None in f.values:
                return None
            return ("in", f.field, next(iter(tns)))
        if isinstance(f, ast.ExistsFilter):
            return ("exists", f.field) if f.field in fields else None
        if isinstance(f, ast.MissingFilter):
            return ("missing", f.field) if f.field in fields else None
        return None

    # (query_id, field, term, weight, min_match)
    term_rows: list[tuple[int, str, str, float, int]] = []
    # filter-signature -> [(query_id, filters sorted by slot sig)];
    # queries here ALSO contribute term_rows — their candidates come
    # from the one shared term plan, then the group's filters apply
    filtered_groups: "dict[tuple, list[tuple[int, list]]]" = {}
    filtered_ids: set = set()
    # (query_id, field, n_positions, max_span, qpos, term) — phrases
    # (exact AND sloppy: slop rides as the per-query span bound) as data
    phrase_rows: list[tuple[int, str, int, int, int, str]] = []
    # (query_id, field, kind, pattern, edits) — multi-term queries
    # (wildcard/regex/fuzzy) as data: ONE vocabulary scan expands every
    # pattern (Lucene's term-dictionary intersection, batched)
    mt_rows: list[tuple[int, str, str, str, int]] = []
    general: dict = {}  # ast -> [query_ids] (frozen dataclasses hash)
    for qid, q in qlist:
        if isinstance(q, ast.MatchPhrase):
            opts = index.corpus.text_cols.get(q.field)
            if opts is None:
                raise ValueError(
                    f"field {q.field!r} is not a searchable text column "
                    f"(declared: {sorted(index.corpus.text_cols)})"
                )
            terms = tokenize_py(q.text, opts.query_time_analyzer())
            if not terms:
                continue  # analyzes to nothing: no hits
            if len(terms) == 1:
                term_rows.append((qid, q.field, terms[0], 1.0, 1))
                continue
            if not opts.positions:
                raise ValueError(
                    f"phrase query on field {q.field!r} requires "
                    "positions=True (column was indexed with "
                    "TextOptions(positions=False))"
                )
            max_span = q.slop + len(terms) - 1
            for i, t in enumerate(terms):
                phrase_rows.append(
                    (qid, q.field, len(terms), max_span, i, t)
                )
            continue
        if isinstance(
            q, (ast.MatchWildcard, ast.MatchRegex, ast.MatchFuzzy)
        ):
            if q.field not in index.corpus.text_cols:
                raise ValueError(
                    f"field {q.field!r} is not a searchable text column"
                    f" (declared: {sorted(index.corpus.text_cols)})"
                )
            from sparksearchengine_spark.plans.compiler import (
                _folds_case,
                _wildcard_to_like,
            )

            analyzer = index.corpus.text_cols[
                q.field
            ].query_time_analyzer()
            folds = _folds_case(analyzer)
            if isinstance(q, ast.MatchWildcard):
                pat = q.pattern.lower() if folds else q.pattern
                mt_rows.append(
                    (qid, q.field, "like", _wildcard_to_like(pat), 0)
                )
            elif isinstance(q, ast.MatchRegex):
                # NOT case-folded — regex metachars flip meaning under
                # lower(); same contract as the single-query compiler
                mt_rows.append(
                    (qid, q.field, "re", f"^(?:{q.pattern})$", 0)
                )
            else:
                t = q.term.lower() if folds else q.term
                mt_rows.append((qid, q.field, "fz", t, q.max_edits))
            continue
        if isinstance(q, ast.And):
            # And(ONE term-class positive, simple filters) runs as
            # data too (r6): the term rows join the one shared plan,
            # the filters group by STRUCTURAL SIGNATURE (field/op/value
            # type, value abstracted) — a registry of thousands of
            # per-user "match X where attr op value" standing queries
            # costs one plan per distinct signature, not per query.
            from sparksearchengine_spark.plans.compiler import _flatten

            ops = _flatten(ast.And, q.operands)
            filts = [o for o in ops if isinstance(o, ast.Filter)]
            poss = [
                o
                for o in ops
                if not isinstance(o, (ast.Filter, ast.Not))
            ]
            negs = [o for o in ops if isinstance(o, ast.Not)]
            if len(poss) == 1 and filts and not negs:
                tw = _as_weighted(poss[0])
                sigs = [_slot_sig(fl) for fl in filts]
                if tw is not None and tw[0] and None not in sigs:
                    rows, min_match = tw
                    for field, t, w in rows:
                        term_rows.append((qid, field, t, w, min_match))
                    ordered = sorted(
                        zip(sigs, filts), key=lambda p: p[0]
                    )
                    sig = tuple(s for s, _ in ordered)
                    filtered_groups.setdefault(sig, []).append(
                        (qid, [fl for _, fl in ordered])
                    )
                    filtered_ids.add(qid)
                    continue
        ts = _as_weighted(q)
        if ts is not None:
            rows, min_match = ts
            for field, t, w in rows:
                term_rows.append((qid, field, t, w, min_match))
        else:
            general.setdefault(q, []).append(qid)

    if len(general) + len(filtered_groups) > max_plans:
        raise ValueError(
            f"batch has {len(general)} distinct non-term-class query "
            f"shapes + {len(filtered_groups)} filter signatures "
            f"(> max_plans={max_plans}); each costs a plan branch. "
            "Split the batch, raise max_plans, or move standing "
            "query sets to streaming.prepare_percolator."
        )

    branches: list[DataFrame] = []
    if term_rows:
        qterms = spark.createDataFrame(
            term_rows,
            "query_id long, field string, term string, _w double,"
            " _minm int",
        )
        fields = sorted({r[1] for r in term_rows})
        sp = None
        for f in fields:
            # driver-literal terms: static bucket isin, pruned at plan
            # time exactly like the compiler's single-query path
            one = index.scored_postings(
                f,
                prune_terms=(
                    {r[2] for r in term_rows if r[1] == f}
                    if index.term_buckets
                    else None
                ),
            ).withColumn("field", F.lit(f))
            sp = one if sp is None else sp.unionByName(one)
        # the query side is a driver-built literal bounded by the
        # caller's Iterable — always broadcast, postings never shuffle
        scored = sp.join(F.broadcast(qterms), ["field", "term"])
        agg = scored.groupBy("query_id", DOC_ID).agg(
            F.sum(F.col("tscore") * F.col("_w")).alias(SCORE),
            F.count(F.lit(1)).alias("_nm"),  # distinct terms per query
            F.first("_minm").alias("_minm"),
        )
        tmatch = agg.where(F.col("_nm") >= F.col("_minm")).select(
            "query_id", DOC_ID, SCORE
        )
        if filtered_ids:
            # the plain branch + every signature branch read tmatch,
            # and Catalyst does not reliably reuse the exchange across
            # union arms — without this persist the corpus-wide
            # score aggregation (the hottest join in the engine) would
            # re-run once per signature (≤ max_plans times). Registered
            # on the index so release_caches() frees it. (The column
            # path avoids the fan-out structurally — one fsig-dispatched
            # branch — but here slot values keep their NATIVE types
            # per signature (date/Decimal/in-set), which a single
            # shared frame cannot carry.)
            tmatch = tmatch.persist()
            tmatch.count()  # materialize BEFORE the per-signature
            # branches fan out: they read this from independent stages
            # of one job, and a cold cache re-runs the corpus-wide
            # score aggregation once per signature — exactly what this
            # persist exists to avoid (stage-race guard, r10)
            index.register_cache(tmatch)
            branches.append(
                tmatch.where(
                    ~F.col("query_id").isin(sorted(filtered_ids))
                )
            )
            c = index.corpus
            for sig, members in filtered_groups.items():
                gids = sorted(m[0] for m in members)
                fields = sorted({s[1] for s in sig})
                attrs = c.df.select(
                    F.col(c.id_col).cast("long").alias(DOC_ID),
                    *[F.col(f).alias(f"_a_{f}") for f in fields],
                )
                # per-query comparison values, one frame per
                # signature: slot i's columns are typed by the
                # signature (same value types across members by
                # construction)
                names: list[str] = ["query_id"]
                for i, s in enumerate(sig):
                    if s[0] == "cmp":
                        names.append(f"_s{i}_v")
                    elif s[0] == "range":
                        names += [f"_s{i}_lo", f"_s{i}_hi"]
                    elif s[0] == "in":
                        names.append(f"_s{i}_set")
                vrows = []
                for qid, filts in members:
                    row: list = [qid]
                    for fl in filts:
                        if isinstance(fl, ast.CompareFilter):
                            row.append(fl.value)
                        elif isinstance(fl, ast.RangeFilter):
                            row += [fl.lo, fl.hi]
                        elif isinstance(fl, ast.InSetFilter):
                            row.append(list(fl.values))
                    vrows.append(tuple(row))
                vals = spark.createDataFrame(vrows, names)
                sub = (
                    tmatch.where(F.col("query_id").isin(gids))
                    .join(attrs, DOC_ID)
                    .join(F.broadcast(vals), "query_id")
                )
                for i, s in enumerate(sig):
                    att = F.col(f"_a_{s[1]}")
                    if s[0] == "cmp":
                        sub = sub.where(
                            _DSL_FILTER_OPS[s[2]](
                                att, F.col(f"_s{i}_v")
                            )
                        )
                    elif s[0] == "range":
                        sub = sub.where(
                            att.between(
                                F.col(f"_s{i}_lo"), F.col(f"_s{i}_hi")
                            )
                        )
                    elif s[0] == "in":
                        sub = sub.where(
                            F.array_contains(F.col(f"_s{i}_set"), att)
                        )
                    elif s[0] == "exists":
                        sub = sub.where(att.isNotNull())
                    else:  # missing
                        sub = sub.where(att.isNull())
                branches.append(sub.select("query_id", DOC_ID, SCORE))
        else:
            branches.append(tmatch)
    if phrase_rows:
        from sparksearchengine_spark.plans.compiler import (
            _scored_postings,
        )

        pq = spark.createDataFrame(
            phrase_rows,
            "query_id long, field string, _n int, _maxspan int,"
            " qpos int, term string",
        )
        # one positions-carrying scan per field, restricted to the
        # union of that field's phrase terms (driver-known literals —
        # the same bucket-pruned scan the single-query plan uses)
        by_field: dict[str, set] = {}
        for _, f, _, _, _, t in phrase_rows:
            by_field.setdefault(f, set()).add(t)
        pp = None
        for f, ts in by_field.items():
            one = _scored_postings(index, f, sorted(ts)).withColumn(
                "field", F.lit(f)
            )
            pp = one if pp is None else pp.unionByName(one)
        joined = pp.join(F.broadcast(pq), ["field", "term"])
        branches.append(_phrase_verify_branch(joined))
    if mt_rows:
        # multi-term queries as data: ONE vocabulary scan serves every
        # wildcard/regex/fuzzy pattern in the batch. The pattern frame
        # broadcasts into a hash join on `field` against TERMSTATS with
        # the generic like/rlike/levenshtein OR-condition as the ONE
        # post-join filter (plan-asserted in TestPlanShapeRound2 —
        # dictionary-sized, the Lucene MultiTermQuery contract: the
        # postings side never evaluates a LIKE/regex/levenshtein), then
        # the matched (query_id, term) pairs hash-join the shared
        # scored-postings scan; docs dedupe to constant score 1.0,
        # exactly the single-query `_multi_term_docs` semantics.
        mtq = spark.createDataFrame(
            mt_rows,
            "query_id long, field string, kind string, pat string,"
            " edits int",
        )
        mt_fields = sorted({r[1] for r in mt_rows})
        vocab = index.termstats.where(
            F.col("field").isin(mt_fields)
        ).select("field", "term")
        hit = (
            (F.col("kind") == "like") & F.expr("term like pat")
        ) | (
            (F.col("kind") == "re") & F.expr("term rlike pat")
        ) | (
            (F.col("kind") == "fz")
            & F.length("term").between(
                F.length("pat") - F.col("edits"),
                F.length("pat") + F.col("edits"),
            )
            & (F.levenshtein(F.col("term"), F.col("pat")) <= F.col("edits"))
        )
        matched = vocab.join(
            F.broadcast(mtq), ["field"]
        ).where(hit).select("query_id", "field", "term")
        msp = None
        for f in mt_fields:
            # matched terms are data (patterns x vocabulary): DPP prune
            one = index.scored_postings(
                f,
                prune_terms=(
                    matched.where(F.col("field") == f).select("term")
                    if index.term_buckets
                    else None
                ),
            ).withColumn("field", F.lit(f))
            msp = one if msp is None else msp.unionByName(one)
        # matched cardinality is data-dependent (patterns x vocabulary):
        # probed broadcast, shuffle_hash fallback — never assume a
        # pattern's expansion fits on the executors
        branches.append(
            msp.join(_hint_data_side(matched), ["field", "term"])
            .select("query_id", DOC_ID)
            .distinct()
            .select("query_id", DOC_ID, F.lit(1.0).alias(SCORE))
        )
    for q, qids in general.items():
        compiled = index.compile(q)
        id_frame = spark.createDataFrame(
            [(int(i),) for i in qids], "query_id long"
        )
        branches.append(
            compiled.crossJoin(F.broadcast(id_frame)).select(
                "query_id", DOC_ID, SCORE
            )
        )

    if not branches:
        # every query analyzed to nothing
        return spark.createDataFrame(
            [], f"query_id long, {DOC_ID} long, {SCORE} double"
        )
    unioned = branches[0]
    for b in branches[1:]:
        unioned = unioned.unionByName(b)
    return unioned


# -- E7-E10: query join ----------------------------------------------------


def more_like_this(
    index: "SearchIndex",
    source_ids: "list | DataFrame",
    field: str,
    k: int = 10,
    num_terms: int = 5,
    salt_buckets: int | None = None,
    broadcast_keywords: bool | None = None,
) -> DataFrame:
    """Lucene-MoreLikeThis analog: for each source doc, find the top-``k``
    most similar OTHER docs by querying the index with the source's
    ``num_terms`` highest-tf·idf terms.

    Returns (src_id, match_doc_id, score, rank); score is the same
    per-posting BM25 sum a ``match_any`` over those terms produces (the
    precomputed ``scored_postings`` cache — no per-row score re-eval).

    Batch-shaped like ``batch_search``: source keywords are a tiny side
    (``num_terms`` rows per source doc) joined to the postings once —
    per-source jobs never happen, so "find neighbors of these 10k docs"
    is one plan. The keyword extraction windows over ONLY the source
    docs' postings (filter before the rank window, not after).
    """
    from sparksearchengine_spark.operators.stats import term_idfs

    p = index.postings.where(F.col("field") == field)
    # Two differently-sized sides share the policy flag when the caller
    # sets it; when deciding ourselves, size each side by ITS bound:
    # the src semi-join carries one row per source (full row budget), the
    # keyword side fans out num_terms rows per source (scaled budget).
    # Both decisions come from the SOURCE plan/list — far tighter than
    # the stats of the derived window-over-postings keyword plan.
    bc_src = bc_kws = broadcast_keywords
    if broadcast_keywords is None:
        kw_budget = max(1, BROADCAST_MAX_QUERY_ROWS // max(num_terms, 1))
        if isinstance(source_ids, DataFrame):
            bc_src = decide_broadcast(source_ids, BROADCAST_MAX_QUERY_ROWS)
            bc_kws = decide_broadcast(source_ids, kw_budget)
        else:
            bc_src = len(source_ids) <= BROADCAST_MAX_QUERY_ROWS
            bc_kws = len(source_ids) <= kw_budget
    if isinstance(source_ids, DataFrame):
        src = source_ids.select(F.col(source_ids.columns[0]).alias(DOC_ID))
        p_src = p.join(
            _hint_query_side(src, src, bc_src), DOC_ID, "left_semi"
        )
    else:
        p_src = p.where(F.col(DOC_ID).isin(*source_ids))
    idfs = term_idfs(index).where(F.col("field") == field).select(
        "term", "idf"
    )
    # the idf side is the FULL field vocabulary — unbounded at corpus
    # scale — so it takes the same probed ladder as scored_postings:
    # broadcast only when provably small, else shuffle_hash build side
    scored_kw = p_src.join(index.hint_vocab_side(idfs), "term").select(
        F.col(DOC_ID).alias("src_id"),
        "term",
        (F.col("tf").cast("double") * F.col("idf")).alias("tfidf"),
    )
    kws = topk_per_group(
        scored_kw, ["src_id"],
        [F.col("tfidf").desc(), F.col("term").asc()],
        k=num_terms, salt_col="src_id",
    ).select("src_id", "term")

    # same size-aware policy as batch_search/query_join: broadcast the
    # keyword side only when the source set is actually small — "neighbors
    # of EVERY doc" makes kws corpus-sized and must take the shuffle-hash
    # path (AQE skew-splits hot keyword terms there)
    kws = _hint_query_side(kws, kws, bc_kws)
    matches = (
        index.scored_postings(
            field,
            prune_terms=(
                kws.select("term") if index.term_buckets else None
            ),
        )
        .join(kws, "term")
        .where(F.col(DOC_ID) != F.col("src_id"))
        .groupBy("src_id", DOC_ID)
        .agg(F.sum("tscore").alias(SCORE))
    )
    return topk_per_group(
        matches, ["src_id"],
        [F.col(SCORE).desc(), F.col(DOC_ID).asc()],
        k=k, salt_buckets=salt_buckets, salt_col="src_id",
    ).select(
        "src_id", F.col(DOC_ID).alias("match_doc_id"), SCORE, "rank"
    )


def query_join(
    index: "SearchIndex",
    other: DataFrame,
    text_col: str,
    field: str,
    k: int = 10,
    other_id_col: str | None = None,
    require_all: bool = False,
    min_should_match: int = 1,
    with_elements: bool = False,
    salt_buckets: int | None = None,
    broadcast_queries: bool | None = None,
    dedup_queries: bool = False,
    row_filters: "list[tuple[str, str, str]] | None" = None,
) -> DataFrame:
    """E7 — the flagship similarity join: for each row of ``other``, run the
    query generated from its ``text_col`` against the index, keep top-k.

    ``row_filters`` widens the generated query toward the reference's
    fully general ``queryGenerator: U => DslQuery``
    (`SearchableRDD.scala:259-269`): each ``(doc_field, op, other_col)``
    triple ANDs the per-row filter ``F_.op(doc_field, row[other_col])``
    into that row's query — e.g. ``[("views", ">=", "min_views"),
    ("lang", "=", "qlang")]`` keeps only matches whose corpus
    attributes satisfy the QUERY ROW's values. Filters follow the DSL's
    Occur.FILTER contract: they restrict the candidate set BEFORE the
    top-k window and contribute zero score. Ops: = != > >= < <=.
    Executed as data — one doc-attribute join plus one query-values
    join on the candidate aggregate, never a per-row plan. (Per-row
    queries with differing STRUCTURE have no data-driven plan; map rows
    to ASTs driver-side and use `batch_search_dsl` for bounded sets.)

    Returns other.* + (match_doc_id, score, rank) flat rows (the
    reference's RDD[(U, Array[(T,score)])] re-expressed relationally; use
    ``collect_matches`` below for the nested shape).

    No cartesian: where the reference ships every index partition to every
    query batch (O(P²) tasks, `PartitionsIndexLuceneRDD.scala:273`), this
    is a single (field, term)-key join. The query-terms side is broadcast
    only when ``other`` is small (≤ ``BROADCAST_MAX_QUERY_ROWS``, probed);
    the corpus-scale self-join case (reference
    `examples/SearchableRDDExamples.scala:68-82`) takes a shuffle-hash
    join on ``term`` instead — AQE splits skewed (hot-term) partitions,
    and ``salt_buckets`` two-stages the rank window. Per-posting scores
    come precomputed from the index cache.

    ``dedup_queries`` (default OFF): rows of ``other`` whose analyzed
    DISTINCT term sets are identical execute as ONE query — the score
    depends only on that set, so keying on an md5 of the sorted token
    array is exact, and a zipfian query log stops re-scoring the same hot
    posting lists once per duplicate. The hash is a deterministic
    join-back key, so this path needs no synthesized row id and no
    checkpoint barrier. It is opt-in because on all-distinct inputs (the
    reference's flagship corpus self-join) the extra sort_array+md5 per
    row, the dropDuplicates shuffle, and the hash-keyed fan-back join buy
    nothing and cost ~2.4x wall clock (measured at sf0.1); turn it on for
    duplicate-heavy query logs, where it wins by the duplication factor.

    ``min_should_match``/``require_all`` mirror matchAny/matchMin/matchAll
    query generation.
    """
    _FILTER_OPS = {
        "=": lambda a, b: a == b,
        "!=": lambda a, b: a != b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
    }
    row_filters = list(row_filters or [])
    for fld, op, col in row_filters:
        if op not in _FILTER_OPS:
            raise ValueError(
                f"row_filters op {op!r} not in {sorted(_FILTER_OPS)}"
            )
        if col not in other.columns:
            raise ValueError(
                f"row_filters column {col!r} not in other ({other.columns})"
            )
        if fld not in index.corpus.df.columns:
            raise ValueError(
                f"row_filters doc field {fld!r} not in the corpus "
                f"({index.corpus.df.columns})"
            )

    # query-time analysis of the `other` side (query_analyzer override
    # applies; index-time analysis already happened at build)
    analyzer = index.corpus.text_cols[field].query_time_analyzer()
    qtoks = F.array_distinct(analyzer_expr(F.col(text_col), analyzer))

    # size the join policy off the frame as the CALLER passed it: after a
    # localCheckpoint (the synthesized-id branch below) the plan is a
    # LogicalRDD whose stats degrade to the defaultSizeInBytes sentinel,
    # which would veto broadcasting even a 10-row frame.
    size_src = other

    if dedup_queries:
        clash = {"_qkey", "_qh"} & set(other.columns)
        if clash:
            raise ValueError(
                f"query_join(dedup_queries=True) reserves internal columns "
                f"{sorted(clash)}; rename them in `other` first"
            )
        # One execution per distinct (sorted) term set. Execution is
        # keyed on a compact md5 of the sorted tokens — NOT the array
        # itself: the group key rides every row of the postings-join
        # fan-out, so an array key would shuffle each query's whole
        # token list millions of times. The hash input is the JSON
        # encoding of the array, which is collision-proof for ANY token
        # content (a custom analyzer may emit tokens containing any
        # separator byte; a bare concat_ws join would be ambiguous).
        # Because the key is a pure function of the tokens, it is
        # deterministic across plan branches — no synthesized id, no
        # checkpoint barrier, and the join-back is a plain equi-join on
        # the hash. NULL/empty text hashes but explodes to no terms ->
        # no ranked rows -> left join yields null match columns, same as
        # the id path.
        # with row_filters the execution key must ALSO distinguish rows
        # by their filter values: same term set + different thresholds
        # are different queries
        hash_src = (
            F.struct(
                F.col("_qkey"),
                *[F.col(c) for _, _, c in row_filters],
            )
            if row_filters
            else F.col("_qkey")
        )
        other = other.withColumn("_qkey", F.sort_array(qtoks)).withColumn(
            "_qh", F.md5(F.to_json(hash_src))
        )
        qterms = (
            other.select(
                F.col("_qh").alias("query_id"),
                F.size("_qkey").alias("_nq"),
                F.explode("_qkey").alias("term"),
            )
            .dropDuplicates(["query_id", "term"])
        )
    else:
        if other_id_col is None:
            # monotonically_increasing_id is nondeterministic across plan
            # re-evaluation; the id-stamped frame is referenced by TWO
            # plan branches (qterms and the final join-back), so pin it
            # with a lazy localCheckpoint — ids are materialized once.
            other = other.withColumn(
                "_qid", F.monotonically_increasing_id()
            ).localCheckpoint(eager=False)
            other_id_col = "_qid"
        qterms = other.select(
            F.col(other_id_col).alias("query_id"),
            F.size(qtoks).alias("_nq"),
            F.explode(qtoks).alias("term"),
        )
    key = "query_id"

    # size the caller's frame, not the distinct/checkpointed one: its
    # stats upper-bound the dedup'd side and carry the source's
    # (accurate) scan estimate.
    qside = _hint_query_side(qterms, size_src, broadcast_queries)
    scored = (
        index.scored_postings(
            field,
            prune_terms=(
                qterms.select("term") if index.term_buckets else None
            ),
        )
        .join(qside, "term")
        .select(key, "_nq", F.col(DOC_ID), "tscore")
    )
    agg = scored.groupBy(key, DOC_ID).agg(
        F.sum("tscore").alias(SCORE),
        F.count(F.lit(1)).alias("_nmatched"),
        F.first("_nq").alias("_nq"),
    )
    if require_all:
        agg = agg.where(F.col("_nmatched") == F.col("_nq"))
    elif min_should_match > 1:
        agg = agg.where(F.col("_nmatched") >= min_should_match)
    if row_filters:
        # Occur.FILTER semantics: restrict candidates BEFORE the rank
        # window, zero score contribution. Doc attributes come from one
        # corpus join on doc_id; the query row's comparison values from
        # one join on the query key (broadcast under the same policy as
        # the term side).
        c = index.corpus
        attrs = c.df.select(
            F.col(c.id_col).cast("long").alias(DOC_ID),
            *[
                F.col(fld).alias(f"_doc_{i}")
                for i, (fld, _, _) in enumerate(row_filters)
            ],
        )
        qv_key = "_qh" if dedup_queries else other_id_col
        qvals = other.select(
            F.col(qv_key).alias(key),
            *[
                F.col(col).alias(f"_qv_{i}")
                for i, (_, _, col) in enumerate(row_filters)
            ],
        ).dropDuplicates([key])
        agg = agg.join(attrs, DOC_ID).join(
            _hint_query_side(qvals, size_src, broadcast_queries), key
        )
        for i, (fld, op, col) in enumerate(row_filters):
            agg = agg.where(
                _FILTER_OPS[op](F.col(f"_doc_{i}"), F.col(f"_qv_{i}"))
            )
        agg = agg.drop(
            *[f"_doc_{i}" for i in range(len(row_filters))],
            *[f"_qv_{i}" for i in range(len(row_filters))],
        )
    ranked = topk_per_group(
        agg,
        [key],
        [F.col(SCORE).desc(), F.col(DOC_ID).asc()],
        k=k,
        salt_buckets=salt_buckets,
    ).select(key, F.col(DOC_ID).alias("match_doc_id"), SCORE, "rank")

    if dedup_queries:
        # fan results back out to every `other` row sharing the term
        # set: plain left equi-join on the deterministic hash.
        out = (
            other.join(
                ranked, other["_qh"] == ranked["query_id"], "left"
            )
            .drop("query_id", "_qkey", "_qh")
        )
    else:
        out = other.join(
            ranked, other[other_id_col] == ranked["query_id"], "left"
        ).drop("query_id")
        if other_id_col == "_qid":
            out = out.drop("_qid")
    if with_elements:
        c = index.corpus
        elems = c.df.select(
            F.col(c.id_col).cast("long").alias("match_doc_id"),
            *[
                F.col(x).alias(f"match_{x}")
                for x in c.df.columns
                if x != c.id_col
            ],
        )
        out = out.join(elems, "match_doc_id", "left")
    return out


def collect_matches(joined: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold flat query-join output back into the reference's nested
    ``(U, Array[(doc_id, score)])`` shape."""
    return joined.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(F.struct("rank", "match_doc_id", SCORE))
        ).alias("matches")
    )


# -- E11/E12: lookups ------------------------------------------------------


def _lookup_frame(index: "SearchIndex", ids: list[int]) -> DataFrame:
    """The corpus frame a point lookup should scan: on an index loaded
    from a doc-bucketed save, prune to the requested ids' buckets at the
    SCAN (the filter on the _dbucket partition column becomes a
    PartitionFilter — ≤ |buckets|/n of the corpus files are read); else
    the full corpus frame."""
    from sparksearchengine_spark.operators.index import DOC_BUCKET, doc_bucket

    store = index.corpus_store
    if store is None or not index.doc_buckets:
        return index.corpus.df
    bks = sorted({doc_bucket(i, index.doc_buckets) for i in ids})
    return store.where(F.col(DOC_BUCKET).isin(bks)).drop(DOC_BUCKET)


def get_element(index: "SearchIndex", doc_id: int):
    """E11 — point lookup. On a doc-bucketed saved corpus this prunes to
    one partition directory (the reference routes to
    ``id % numPartitions``, `PartitionsIndexLuceneRDD.scala:403-424`);
    unsaved corpora fall back to a full-corpus filter."""
    c = index.corpus
    rows = (
        _lookup_frame(index, [int(doc_id)])
        .where(F.col(c.id_col) == doc_id)
        .take(1)
    )
    return rows[0] if rows else None


def get_elements(index: "SearchIndex", ids: Iterable[int]) -> DataFrame:
    """E12 — bulk lookup; missing ids yield NULL element columns (the
    reference's ``None``), keyed by requested_id. Scans only the
    requested ids' bucket partitions on a doc-bucketed saved corpus."""
    c = index.corpus
    spark = c.df.sparkSession
    id_list = [int(i) for i in ids]
    # inline the ids as a JVM-side literal array instead of a Python-local
    # createDataFrame: an RDD-backed relation's broadcast spins up Python
    # workers (~seconds cold) for what is a handful of literals. Bound
    # the literal tree, though — a 500k-id bulk lookup as half a million
    # expression nodes chokes analysis/codegen (r3 review), and at that
    # size the createDataFrame overhead is amortized anyway.
    if len(id_list) <= 10_000:
        id_arr = (
            F.array(*[F.lit(i).cast("long") for i in id_list])
            if id_list
            else F.array().cast("array<long>")
        )
        ids_df = spark.range(1).select(F.explode(id_arr).alias("requested_id"))
    else:
        ids_df = spark.createDataFrame(
            [(i,) for i in id_list], "requested_id long"
        )
    elems = _lookup_frame(index, id_list).withColumn(
        "_did", F.col(c.id_col).cast("long")
    )
    return (
        F.broadcast(ids_df)
        .join(elems, ids_df["requested_id"] == elems["_did"], "left")
        .drop("_did")
    )



# -- extension families (round-7 split): LAZY re-export (PEP 562) ----------
# `search_ext` imports core helpers from THIS module at ITS import time,
# so an eager end-of-module import here would deadlock the cycle when
# search_ext is the first module touched (search.py would re-enter the
# partially initialized search_ext). Module __getattr__ resolves the
# names on first access instead — `from operators.search import
# rescore_search` keeps working from either import order.
_EXT_NAMES = frozenset({
    "_match_set_join",
    "bm25f_search",
    "collapse_results",
    "explain_scores",
    "facet_counts",
    "facet_cube",
    "facet_metrics",
    "grouped_search",
    "highlight_snippets",
    "more_like_this_text",
    "multi_match_search",
    "passage_to_doc",
    "prf_expand_search",
    "rescore_search",
    "rrf_fuse",
})


def __getattr__(name: str):  # noqa: N807 — PEP 562 module hook
    if name in _EXT_NAMES:
        from sparksearchengine_spark.operators import search_ext

        return getattr(search_ext, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )
