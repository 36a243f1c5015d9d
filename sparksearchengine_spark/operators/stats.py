"""Statistics / metadata operators (reference SURVEY §2.8, M1-M6).

The reference computes these by mapping over per-partition Lucene readers
and tree-merging driver-side hash maps (`SearchableRDD.scala:306-330,
379-408`, `LuceneIndex.scala:129-196`). Ours are one-line aggregates over
the postings table — partial aggregation replaces the hand-rolled merges.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparksearchengine_spark.functions.scoring import idf_expr

if TYPE_CHECKING:
    from sparksearchengine_spark.operators.index import SearchIndex


def doc_counts(index: "SearchIndex") -> DataFrame:
    """M1 — per field: number of docs containing it
    (reference `LuceneIndex.scala:129-140`)."""
    return (
        index.postings.groupBy("field")
        .agg(F.count_distinct(F.col("doc_id")).alias("doc_count"))
    )


def term_counts(index: "SearchIndex") -> DataFrame:
    """M2 — (field, term) -> total term frequency. The reference returns
    totalTermFreq (`LuceneIndex.scala:173`); we expose both it and docFreq."""
    return (
        index.postings.groupBy("field", "term")
        .agg(
            F.sum("tf").alias("total_tf"),
            F.count(F.lit(1)).alias("df_t"),
        )
    )


def term_idfs(index: "SearchIndex") -> DataFrame:
    """M3 — per-term IDF with the BM25 idf formula (`IDFUtils.scala:28`),
    fed true docFreq (not the reference's totalTermFreq quirk — SURVEY
    §4.4.2)."""
    # N comes from index.fieldstats — already a driver scalar with the
    # same docs-with->=1-token definition — instead of re-aggregating a
    # corpus-sized count_distinct over postings per call (r3 review);
    # the formula is the shared idf_expr so it cannot drift from the idf
    # scored_postings actually uses. The scalars inline as a CASE
    # expression rather than a broadcast-joined createDataFrame: a
    # Python-local frame is an RDD-backed relation whose broadcast spins
    # up Python workers (~4 s cold, measured at sf0.1 — the whole r4
    # "stats" bench regression), while CASE stays in codegen.
    n_expr = F.lit(None).cast("double")
    for fname, st in index.fieldstats.items():
        n_expr = F.when(
            F.col("field") == fname, F.lit(float(st.doc_count))
        ).otherwise(n_expr)
    return index.termstats.select(
        "field",
        "term",
        "df_t",
        idf_expr(F.col("df_t").cast("double"), n_expr).alias("idf"),
    )


def doc_keywords(
    index: "SearchIndex",
    field: str,
    k: int = 5,
) -> DataFrame:
    """Per-document keyword extraction: top-``k`` terms by tf·idf,
    ``(doc_id, term, tfidf, rank)`` — the classic document-profile /
    tag-suggestion op, and the bridge between the search index and the
    curation pipeline (keywords come straight off the postings table, no
    re-tokenization).

    Shape: postings ⋈ idf (probed broadcast ladder — the idf side is the
    FULL field vocabulary, O(10^8-10^9) rows at 100 TB by Heaps' law, so
    it rides ``index.hint_vocab_side``: broadcast only when provably
    small, else shuffle_hash with the vocab as build side) then a rank
    window PARTITIONED BY doc_id — postings are already doc_id-partitioned
    out of the build, so Spark plans a WindowGroupLimit with no extra
    exchange. Ties broken by term asc for determinism.
    """
    idfs = term_idfs(index).where(F.col("field") == field).select(
        "term", "idf"
    )
    from sparksearchengine_spark.operators.search import topk_per_group

    scored = (
        index.postings.where(F.col("field") == field)
        .join(index.hint_vocab_side(idfs), "term")
        .select(
            "doc_id", "term",
            (F.col("tf").cast("double") * F.col("idf")).alias("tfidf"),
        )
    )
    return topk_per_group(
        scored, ["doc_id"],
        [F.col("tfidf").desc(), F.col("term").asc()],
        k=k,
    ).select("doc_id", "term", "tfidf", "rank")


def explain_score(
    index: "SearchIndex",
    query,
    doc_id,
) -> DataFrame:
    """Lucene ``Explanation`` analog: per-term score breakdown of ONE
    doc under a query — ``(field, term, boost, tf, df_t, idf, tscore)``
    where ``sum(boost * tscore)`` over the rows is exactly the doc's
    score in ``search()`` (same precomputed ``scored_postings`` floats,
    not a re-derivation that could drift).

    Walks the AST collecting positively-scored (field, term, boost)
    leaves (MatchTerm/MatchTermSet/MatchText/phrase/Boost subtrees);
    Not-subtrees contribute nothing, mirroring the compiler where
    anti-joined branches never add score. Terms absent from the doc
    yield no row — an empty result means "matched by filters only or
    not at all".

    For the WHOLE match set with Lucene component labels (idf, tfNorm,
    n_matched, per-doc totals == search()) over weighted-term-set
    queries, use the complementary
    :func:`~sparksearchengine_spark.operators.search.explain_scores`.
    """
    from sparksearchengine_spark.functions.analyzers import tokenize_py
    from sparksearchengine_spark.plans import ast

    leaves: list[tuple[str, str, float]] = []

    def walk(q, boost: float) -> None:
        if isinstance(q, ast.Boost):
            walk(q.operand, boost * q.factor)
        elif isinstance(q, ast.MatchTerm):
            leaves.append((q.field, q.term, boost))
        elif isinstance(q, ast.MatchTermSet):
            # distinct WITHIN the node: the compiler scores a set's terms
            # once each (_term_set dedups), but duplicates ACROSS sibling
            # subtrees must stay — each subtree contributes its own score
            leaves.extend(
                (q.field, t, boost) for t in dict.fromkeys(q.terms)
            )
        elif isinstance(q, (ast.MatchText, ast.MatchPhrase)):
            analyzer = index.corpus.text_cols[
                q.field
            ].query_time_analyzer()
            leaves.extend(
                (q.field, t, boost)
                for t in dict.fromkeys(tokenize_py(q.text, analyzer))
            )
        elif isinstance(q, (ast.And, ast.Or)):
            for op in q.operands:
                walk(op, boost)
        elif isinstance(q, ast.Not):
            pass  # anti-joined branch: contributes no score
        # filters / AllDocs / wildcard+fuzzy expansions score via their
        # own compilation; wildcard term sets aren't statically known
        # here, so they are out of explain's term-leaf scope

    walk(query, 1.0)
    spark = index.postings.sparkSession
    if not leaves:
        return spark.createDataFrame(
            [], "field string, term string, boost double, tf bigint, "
                "df_t bigint, idf double, tscore double"
        )
    # keep the leaf MULTISET: a term reached through two sibling
    # subtrees scores twice in the compiler's union-sum, so it must
    # appear twice here for sum(boost*tscore) to equal search()'s score
    q_df = spark.createDataFrame(
        sorted(leaves), "field string, term string, boost double"
    )
    rows = None
    for field in {f for f, _, _ in leaves}:
        sp = index.scored_postings(field).where(F.col("doc_id") == doc_id)
        part = (
            q_df.where(F.col("field") == field)
            .join(sp, "term")
            .join(
                index.postings.where(
                    (F.col("field") == field) & (F.col("doc_id") == doc_id)
                ).select("term", "tf"),
                "term",
            )
            .join(
                term_idfs(index).where(F.col("field") == field).select(
                    "term", "df_t", "idf"
                ),
                "term",
            )
            .select("field", "term", "boost", "tf", "df_t", "idf",
                    F.col("tscore"))
        )
        rows = part if rows is None else rows.unionByName(part)
    return rows


# plan-stat sizes at/above this are Catalyst's "unknown" sentinel
# (defaultSizeInBytes = Long.MaxValue) or a product of unknowns — not a
# real measurement
_SIZE_UNKNOWN = 1 << 60


def _measured_size_bytes(df: DataFrame) -> int:
    """Scan-measured byte estimate: per-row JSON octet length + row
    overhead, summed. One pass over the frame — only used when the
    planner has no estimate (RDD-backed frames, e.g. test corpora built
    with createDataFrame); parquet-backed production frames never hit
    this path."""
    row = F.octet_length(F.to_json(F.struct(*df.columns))) + F.lit(16)
    n = df.agg(F.sum(row)).collect()[0][0]
    return int(n or 0)


def _plan_size_bytes(df: DataFrame, measure: bool = False) -> int:
    """Catalyst's size estimate for a DataFrame — the optimized plan's
    ``stats.sizeInBytes``. For a parquet-backed frame (a saved index)
    this is the actual file bytes; for an in-memory build it is the
    optimizer's row-width x cardinality estimate. Either way it is the
    number the engine itself plans with (broadcast decisions etc.), the
    Spark analog of Lucene's on-disk segment bytes.

    When the planner reports its unknown sentinel (RDD/createDataFrame-
    backed frames): returns -1 unless ``measure=True``, which opts into
    the one-scan measured estimate — a METADATA call must never cost
    O(data) silently."""
    try:
        size = int(
            str(
                df._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
        )
    except Exception:
        return -1  # connect-mode / API drift: size unavailable
    if size >= _SIZE_UNKNOWN:
        return _measured_size_bytes(df) if measure else -1
    return size


def indices_info(
    index: "SearchIndex",
    per_partition: bool = False,
    measure_sizes: bool = False,
) -> dict:
    """M4/M5 — index shape metadata (reference `IndicesInfo.scala:6-34`,
    per-partition breakdown `PartitionsIndexLuceneRDD.scala:547-566`).

    ``size_bytes`` mirrors the reference's ``sizeBytes`` (Lucene segment
    bytes there): postings + termstats + corpus plan-stat sizes — parquet
    bytes for a saved/loaded index, Catalyst estimates for an in-session
    build (documented difference; both are the planner's own numbers).
    When Catalyst reports its unknown-size sentinel (RDD-backed frames)
    the byte fields are -1 unless ``measure_sizes=True`` opts into a
    one-scan measured estimate — a metadata call never costs O(data)
    silently.

    ``per_partition=True`` adds a ``partitions`` list of
    ``{partition, n_postings, bytes}`` rows (M5's per-partition
    ``getDataAndIndicesInfo`` shape): one ``spark_partition_id()``
    aggregation over the postings — an explicit scan, which is why it is
    opt-in. ``bytes`` uses the row-measured estimator so the rows sum
    exactly to a whole-frame measured total."""
    n_postings = index.postings.count()
    n_terms = index.termstats.count()
    postings_bytes = _plan_size_bytes(index.postings, measure_sizes)
    termstats_bytes = _plan_size_bytes(index.termstats, measure_sizes)
    corpus_bytes = _plan_size_bytes(index.corpus.df, measure_sizes)
    out = {
        "num_partitions": index.postings.rdd.getNumPartitions(),
        "num_postings": n_postings,
        "num_terms": n_terms,
        # all corpus docs, incl. ones with NULL text (fieldstats
        # doc_count excludes those); parquet count-star is metadata-only
        "num_documents": index.corpus.df.count(),
        "postings_size_bytes": postings_bytes,
        "termstats_size_bytes": termstats_bytes,
        "corpus_size_bytes": corpus_bytes,
        "size_bytes": (
            -1
            if -1 in (postings_bytes, termstats_bytes, corpus_bytes)
            else postings_bytes + termstats_bytes + corpus_bytes
        ),
        "fields": {
            f: {"doc_count": s.doc_count, "avgdl": s.avgdl}
            for f, s in index.fieldstats.items()
        },
    }
    if per_partition:
        p = index.postings
        row_bytes = (
            F.octet_length(F.to_json(F.struct(*p.columns))) + F.lit(16)
        )
        rows = (
            p.groupBy(F.spark_partition_id().alias("partition"))
            .agg(
                F.count(F.lit(1)).alias("n_postings"),
                F.sum(row_bytes).cast("long").alias("bytes"),
            )
            .orderBy("partition")
            .collect()  # bounded: one row per partition
        )
        out["partitions"] = [
            {
                "partition": int(r["partition"]),
                "n_postings": int(r["n_postings"]),
                "bytes": int(r["bytes"]),
            }
            for r in rows
        ]
    return out


def config_info(index: "SearchIndex") -> dict:
    """M6 — engine config rendering (reference `LuceneConfig.scala:165-167`)."""
    return {
        "scoring": index.scoring,
        "text_cols": index.corpus.text_cols,
        "id_col": index.corpus.id_col,
    }


def suggest_terms(
    index: "SearchIndex",
    term: str,
    field: str | None = None,
    max_dist: int = 2,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Did-you-mean spelling suggestions: vocabulary terms within
    ``max_dist`` Levenshtein edits of ``term``, ranked by (distance asc,
    docFreq desc, term asc) — `(term, df_t, dist, rank)`.

    Plan shape: one pass over ``termstats`` (the vocabulary — ≤ |V|
    rows, orders of magnitude smaller than postings) with a codegen'd
    ``levenshtein`` scalar; a cheap length pre-filter (|len(t) −
    len(term)| ≤ max_dist, a lower bound on edit distance) prunes most
    of the vocab before the O(len²) distance runs; then one TakeOrdered
    for the top-k. No shuffle beyond the final ≤k-row reduction.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    ts = index.termstats
    if field is not None:
        ts = ts.where(F.col("field") == field)
    else:
        # same term in several fields: strongest df wins
        ts = ts.groupBy("term").agg(F.max("df_t").alias("df_t"))
    q = F.lit(term)
    cand = ts.where(
        F.abs(F.length(F.col("term")) - F.length(q)) <= max_dist
    ).withColumn("dist", F.levenshtein(F.col("term"), q))
    cand = cand.where(
        (F.col("dist") <= max_dist) & (F.col("df_t") >= min_df)
    )
    from sparksearchengine_spark.operators.search import ranked_topk

    return ranked_topk(
        cand,
        [F.col("dist").asc(), F.col("df_t").desc(), F.col("term").asc()],
        k,
    ).select("term", "df_t", "dist", "rank")


def significant_terms(
    index: "SearchIndex",
    query,  # type: ignore[no-untyped-def]
    field: str = "text",
    k: int = 10,
    min_doc_count: int = 2,
) -> DataFrame:
    """Significant-terms aggregation over a query's match set (the
    Elasticsearch aggregation of the same name): terms OVERREPRESENTED
    in the matching docs relative to the whole corpus, scored with the
    JLH heuristic —

        score(t) = (fg − bg) · (fg / bg)

    with ``fg = df_match(t)/|matches|`` and ``bg = df(t)/N`` — the
    absolute lift times the relative lift, so both common-and-lifted and
    rare-but-exclusive terms surface. Returns
    ``(term, fg_count, bg_count, score, rank)``, score rounded 6dp,
    term-asc ties.

    Plan shape: compile the query once, semi-join its doc set into the
    field's postings (the match set bounds the shuffle, not the corpus),
    one groupBy(term) count, broadcast-join the ≤|V|-row termstats for
    the background rates, TakeOrdered k. The match-set size rides along
    as a broadcast 1-row aggregate — no driver collect."""
    if k <= 0:
        raise ValueError("k must be positive")
    matched = index.compile(query).select("doc_id")
    fg = (
        index.postings.where(F.col("field") == field)
        .join(matched, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("fg_count"))
        .where(F.col("fg_count") >= min_doc_count)
    )
    msize = matched.agg(F.count(F.lit(1)).cast("double").alias("_m"))
    ts = index.termstats.where(F.col("field") == field).select(
        "term", F.col("df_t").cast("long").alias("bg_count")
    )
    fs = index.fieldstats[field]
    n_docs = float(fs.doc_count or 1)
    scored = (
        fg.join(index.hint_vocab_side(ts), "term")
        .crossJoin(F.broadcast(msize))
        .select(
            "term",
            "fg_count",
            "bg_count",
            F.round(
                (
                    F.col("fg_count").cast("double") / F.col("_m")
                    - F.col("bg_count").cast("double") / F.lit(n_docs)
                )
                * (
                    (F.col("fg_count").cast("double") / F.col("_m"))
                    / (F.col("bg_count").cast("double") / F.lit(n_docs))
                ),
                6,
            ).alias("score"),
        )
    )
    from sparksearchengine_spark.operators.search import ranked_topk

    return ranked_topk(
        scored, [F.col("score").desc(), F.col("term").asc()], k
    )


def complete_prefix(
    index: "SearchIndex",
    prefix: str,
    field: str | None = None,
    k: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Prefix autocomplete from the vocabulary: terms starting with
    ``prefix`` ranked by docFreq — `(term, df_t, rank)` (the search-box
    suggest; pairs with :func:`suggest_terms` for the typo path).

    One termstats pass: ``startswith`` compiles to a ``StartsWith``
    scan predicate (pushes into a term-bucketed saved index's parquet
    scan as a range filter), then a TakeOrdered k. Empty prefix is
    rejected — that is "the whole vocabulary by df", ``vocab_stats``'
    job."""
    if not prefix:
        raise ValueError("prefix must be non-empty")
    # prefix is stable under the cross-field max-df aggregation, so it
    # filters BEFORE the groupBy — this is what lets it reach the scan
    # as a StartsWith predicate on the default field=None path too
    # (ADVICE r3), and shrinks the aggregation input to the prefix's
    # terms
    ts = index.termstats.where(F.col("term").startswith(prefix))
    if field is not None:
        ts = ts.where(F.col("field") == field)
    else:
        ts = ts.groupBy("term").agg(F.max("df_t").alias("df_t"))
    cand = ts.where(F.col("df_t") >= min_df)
    from sparksearchengine_spark.operators.search import ranked_topk

    return ranked_topk(
        cand, [F.col("df_t").desc(), F.col("term").asc()], k
    ).select("term", "df_t", "rank")


def term_vector(
    index: "SearchIndex", doc_id: int, field: str | None = None
) -> DataFrame:
    """One document's term vector: ``(field, term, tf, dl, positions)``
    — Lucene's ``IndexReader.getTermVector`` (the reference exposes it
    through each partition's reader; here it is a plain postings filter
    — the persisted/loaded postings answer it without any text
    re-analysis; note a term-bucketed save partitions postings by TERM,
    which a doc_id predicate cannot prune, so on durable layouts this
    is a postings scan, not a point lookup). ``field=None`` returns
    every indexed field."""
    p = index.postings.where(F.col("doc_id") == int(doc_id))
    if field is not None:
        p = p.where(F.col("field") == field)
    return p.select("field", "term", "tf", "dl", "positions").orderBy(
        "field", "term"
    )


def validate_index(index: "SearchIndex") -> DataFrame:
    """Index integrity audit — run it after ``load`` / ``merge_indexes``
    / ``upsert_index`` (or any hand-surgery on saved postings) to prove
    the DERIVED statistics still agree with the postings they were
    derived from. One row per invariant:
    ``(check, field, expected, actual, ok)``.

    Checks:

    * ``postings_unique`` — no duplicate (field, term, doc) posting (a
      broken shard merge shows up here first);
    * ``termstats_df`` — every stored ``df_t`` equals the docFreq
      recomputed from postings (actual = number of disagreeing terms,
      full-outer so missing/extra termstats rows count too);
    * ``doc_count[field]`` / ``avgdl[field]`` — fieldstats scalars vs a
      recount (avgdl compared at 6dp, the results contract);
    * ``dl_consistent`` — every (field, doc) carries ONE dl across its
      postings (the denormalization invariant scoring relies on).

    Driver cost: a handful of aggregation jobs over postings — this is
    an AUDIT tool, not a query-path op; at 100 TB run it on the saved
    index's parquet after maintenance, not per query.
    """
    from sparksearchengine_spark.operators.index import DOC_ID as _DID

    p = index.postings
    rows: list[tuple] = []
    total = p.count()
    distinct = (
        p.select("field", "term", _DID).distinct().count()
    )
    rows.append(
        ("postings_unique", "", float(total), float(distinct),
         total == distinct)
    )
    rec = p.groupBy("field", "term").agg(
        F.count_distinct(_DID).alias("_df")
    )
    bad_df = (
        rec.join(
            index.termstats.select("field", "term", "df_t"),
            ["field", "term"],
            "full",
        )
        .where(~F.col("_df").eqNullSafe(F.col("df_t")))
        .count()
    )
    rows.append(("termstats_df", "", 0.0, float(bad_df), bad_df == 0))
    bad_dl = (
        p.groupBy("field", _DID)
        .agg(F.count_distinct("dl").alias("_ndl"))
        .where(F.col("_ndl") > 1)
        .count()
    )
    rows.append(("dl_consistent", "", 0.0, float(bad_dl), bad_dl == 0))
    for f in sorted(index.fieldstats):
        fs = index.fieldstats[f]
        agg = (
            p.where(F.col("field") == f)
            .select(_DID, "dl")
            .dropDuplicates([_DID])
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.avg("dl").alias("a"),
            )
            .collect()[0]
        )
        n, a = int(agg["n"] or 0), float(agg["a"] or 0.0)
        rows.append(
            (f"doc_count[{f}]", f, float(fs.doc_count), float(n),
             fs.doc_count == n)
        )
        rows.append(
            (f"avgdl[{f}]", f, round(float(fs.avgdl), 6), round(a, 6),
             round(float(fs.avgdl), 6) == round(a, 6))
        )
    return index.postings.sparkSession.createDataFrame(
        rows, "check string, field string, expected double,"
              " actual double, ok boolean"
    )
