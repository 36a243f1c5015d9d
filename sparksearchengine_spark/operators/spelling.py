"""Batch query spelling correction — the Elasticsearch *phrase
suggester* / Lucene ``DirectSpellChecker`` + word-LM analog, Spark-shaped.

Single-term did-you-mean already exists (`operators/stats.py::
suggest_terms`); this module corrects WHOLE queries in batch with the
classic noisy-channel model (Kernighan/Church/Gale 1990; Brants et al.
2007 "stupid backoff" for the LM):

    best c_1..c_n = argmax  Σ_i [ ln P_lm(c_i | c_{i-1}) + dist_i · β ]

where the channel model is a per-edit log-penalty ``β = edit_logp`` and
the language model is the corpus bigram MLE with stupid backoff to the
unigram distribution. The argmax runs as a distributed Viterbi: per
query and position the state set is the ≤ ``max_candidates`` candidate
terms, so each step is a tiny join — never a path enumeration.

Scale shape (the part that must survive 100 TB):

* Candidate generation is ONE vocabulary scan: each distinct query
  token explodes to its ``2*max_dist+1`` admissible candidate lengths
  and broadcast-HASH-joins the vocabulary on ``length(term)`` before
  the O(len²) ``levenshtein`` — the same length-bucket equi-join as
  ``dedup.py::edit_similarity_join`` (a non-equi length window would
  plan a BroadcastNestedLoopJoin: |vocab| × |tokens| comparisons). The
  corpus/postings never participate.
* The bigram transition table is built from ONE corpus scan and
  immediately semi-joined down to candidate terms on both sides —
  ≤ (|queries|·L·c)² keys in the worst case, tiny in practice — and
  persisted; the Viterbi loop iterates against THAT, not the corpus.
* Each Viterbi step joins the ≤ |queries|·c state frame with the
  position's candidates and the pruned transition table: max-plus
  recursion, ``row_number`` argmax, no cross product, no driver state
  beyond two scalar probes (max query length, distinct-token cap).

Reference parity: the reference engine itself ships no spell
correction; this extends the suggest/complete family the same way the
reference's Lucene backend would via ``DirectSpellChecker``
(`LuceneConfig.scala:131-144` exposes arbitrary Lucene components).
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from sparksearchengine_spark.operators.index import SearchIndex

# candidate generation broadcasts the distinct query tokens against the
# vocabulary scan — above this, a query LOG should be pre-aggregated
# (distinct queries) before correction
MAX_SPELL_DISTINCT_TOKENS = 50_000
# Viterbi steps = query length; search strings beyond this are not
# queries being typo-corrected, they're documents
MAX_SPELL_POSITIONS = 16

DEFAULT_EDIT_LOGP = math.log(0.05)
DEFAULT_BACKOFF = 0.4


def correct_queries(
    index: "SearchIndex",
    queries_df: DataFrame,
    query_id_col: str = "query_id",
    text_col: str = "qtext",
    field: str = "text",
    max_dist: int = 1,
    max_candidates: int = 8,
    k: int = 1,
    edit_logp: float = DEFAULT_EDIT_LOGP,
    backoff: float = DEFAULT_BACKOFF,
) -> DataFrame:
    """Noisy-channel spelling correction for a batch of query strings.

    Returns ``(query_id, rank, corrected, score, n_edits, changed)`` —
    up to ``k`` suggestions per query, best first. ``score`` is the
    Viterbi log-probability (rounded 6dp), ``n_edits`` the total edit
    distance along the chosen path, ``changed`` whether the suggestion
    differs from the analyzed input. Queries that analyze to zero
    tokens produce no row (nothing to correct).

    Candidates per position are the vocabulary terms within
    ``max_dist`` Levenshtein edits of the token, the ``max_candidates``
    best by (collection frequency desc, term asc); a position with NO
    in-vocabulary candidate keeps its original token with the add-one
    unigram floor, so one out-of-vocabulary word never kills the rest
    of the query's correction.

    ``k > 1`` returns the k best FINAL states (per-end-term best paths
    ranked by score — the standard Viterbi beam read-out, exact for
    ``k=1``).
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if max_candidates <= 0 or k <= 0:
        raise ValueError("max_candidates and k must be positive")
    if k > max_candidates:
        raise ValueError("k cannot exceed max_candidates")
    if not 0.0 < backoff < 1.0:
        raise ValueError(f"backoff must be in (0, 1), got {backoff}")
    if edit_logp >= 0.0:
        raise ValueError(
            f"edit_logp must be negative (a log-penalty), got {edit_logp}"
        )
    opts = index.corpus.text_cols.get(field)
    if opts is None:
        raise ValueError(
            f"field {field!r} is not a searchable text column "
            f"(declared: {sorted(index.corpus.text_cols)})"
        )
    from sparksearchengine_spark.functions.analyzers import analyzer_expr

    fs = index.fieldstats[field]
    total = float(fs.doc_count or 0) * float(fs.avgdl or 0.0)
    if total <= 0:
        raise ValueError(f"field {field!r} has an empty index")
    floor = 1.0 / (total + 1.0)

    qana = opts.query_time_analyzer()
    toks = (
        queries_df.select(
            F.col(query_id_col).alias("_qid"),
            F.posexplode(
                analyzer_expr(F.col(text_col), qana)
            ).alias("_pos", "_tok"),
        )
    )
    qlen = toks.groupBy("_qid").agg((F.max("_pos") + 1).alias("_n"))

    # -- probes: position bound + distinct-token cap (two tiny scalars) --
    maxpos_row = qlen.agg(F.max("_n").alias("m")).collect()
    maxpos = int(maxpos_row[0]["m"]) if maxpos_row and maxpos_row[0]["m"] is not None else 0
    if maxpos == 0:
        # empty frame with the CALLER's query-id type (string ids must
        # round-trip the same schema as the non-empty path)
        return (
            queries_df.select(F.col(query_id_col))
            .limit(0)
            .select(
                query_id_col,
                F.lit(None).cast("long").alias("rank"),
                F.lit(None).cast("string").alias("corrected"),
                F.lit(None).cast("double").alias("score"),
                F.lit(None).cast("long").alias("n_edits"),
                F.lit(None).cast("boolean").alias("changed"),
            )
        )
    if maxpos > MAX_SPELL_POSITIONS:
        raise ValueError(
            f"a query analyzed to {maxpos} tokens — above "
            f"MAX_SPELL_POSITIONS={MAX_SPELL_POSITIONS}. Spell correction "
            "is for search strings; split or truncate longer inputs."
        )
    dtoks = toks.select(F.col("_tok")).distinct()
    if dtoks.limit(MAX_SPELL_DISTINCT_TOKENS + 1).count() > MAX_SPELL_DISTINCT_TOKENS:
        raise ValueError(
            "more than MAX_SPELL_DISTINCT_TOKENS="
            f"{MAX_SPELL_DISTINCT_TOKENS} distinct query tokens — "
            "aggregate the query log to distinct queries first."
        )

    # -- candidate generation: ONE vocabulary scan ------------------------
    # cf_t doubles as the unigram numerator and the candidate ranking key.
    # Equi-join on a LENGTH key, not a |len(term)-len(tok)|<=d window:
    # each distinct token explodes into its 2*max_dist+1 admissible
    # candidate lengths, so Spark plans a broadcast HASH join against the
    # vocabulary (a non-equi length window would execute as
    # BroadcastNestedLoopJoin — |vocab| x |tokens| comparisons; at a
    # 100 TB corpus vocabulary that's the whole job). Same result set:
    # levenshtein(a,b) <= d implies |len(a)-len(b)| <= d.
    vocab = index.collection_stats(field)
    tok_lens = F.broadcast(
        dtoks.select(
            "_tok",
            F.explode(
                F.sequence(
                    F.greatest(
                        F.length("_tok") - max_dist, F.lit(1)
                    ),
                    F.length("_tok") + max_dist,
                )
            ).alias("_tlen"),
        )
    )
    cand0 = (
        vocab.join(tok_lens, F.length(F.col("term")) == F.col("_tlen"))
        .withColumn("_dist", F.levenshtein(F.col("term"), F.col("_tok")))
        .where(F.col("_dist") <= max_dist)
        .select("_tok", "term", "_dist", "cf_t")
    )
    w_cand = Window.partitionBy("_qid", "_pos").orderBy(
        F.col("_dist").asc(), F.col("cf_t").desc(), F.col("term").asc()
    )
    cand = (
        toks.join(cand0, "_tok")
        .withColumn("_cr", F.row_number().over(w_cand))
        .where(F.col("_cr") <= max_candidates)
        .drop("_cr")
    )
    # positions with zero in-vocabulary candidates keep the original
    # token (dist 0 — the best explanation of an OOV token is itself)
    missing = toks.join(
        cand.select("_qid", "_pos").distinct(), ["_qid", "_pos"], "left_anti"
    ).select(
        "_qid",
        "_pos",
        "_tok",
        F.col("_tok").alias("term"),
        F.lit(0).alias("_dist"),
        F.lit(None).cast("long").alias("cf_t"),
    )
    cands = (
        cand.select("_qid", "_pos", "_tok", "term", "_dist", "cf_t")
        .unionByName(missing)
        .withColumn(
            "_p_uni",
            F.coalesce(
                F.col("cf_t").cast("double") / F.lit(total), F.lit(floor)
            ),
        )
        .join(qlen, "_qid")
        .persist()
    )
    cands.count()  # materialize: the broadcast candidate-term set, the
    # transition builds, and the per-position Viterbi joins read this
    # from independent stages (stage-race guard, r10)
    # register so index.unpersist()/release_caches() frees the block —
    # no leaked cached frames in a long-lived session
    index.register_cache(cands)

    # -- bigram transitions, pruned to candidate terms --------------------
    # one corpus scan; c1 (the conditional's denominator) is counted over
    # the FULL corpus before pruning, so p(w2|w1) stays the true MLE
    cdf = index.corpus.df
    ctoks = analyzer_expr(F.col(field), opts.analyzer)
    pairs_arr = F.when(
        F.size(F.col("_ctoks")) >= 2,
        F.expr(
            "transform(sequence(1, size(_ctoks) - 1), "
            "i -> struct(element_at(_ctoks, i) AS w1, "
            "element_at(_ctoks, i + 1) AS w2))"
        ),
    ).otherwise(
        F.expr("array()").cast("array<struct<w1:string,w2:string>>")
    )
    e = (
        cdf.select(ctoks.alias("_ctoks"))
        .select(F.explode(pairs_arr).alias("_pr"))
        .select(F.col("_pr.w1").alias("w1"), F.col("_pr.w2").alias("w2"))
    )
    terms_set = cands.select(F.col("term")).distinct()
    c12 = (
        e.join(F.broadcast(terms_set.withColumnRenamed("term", "w1")), "w1", "left_semi")
        .join(F.broadcast(terms_set.withColumnRenamed("term", "w2")), "w2", "left_semi")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("_c12"))
    )
    c1 = (
        e.join(F.broadcast(terms_set.withColumnRenamed("term", "w1")), "w1", "left_semi")
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("double").alias("_c1"))
    )
    trans = (
        c12.join(c1, "w1")
        .select("w1", "w2", F.log(F.col("_c12") / F.col("_c1")).alias("_lp_big"))
        .persist()
    )
    trans.count()  # materialize: every Viterbi position joins this —
    # a cold cache would re-run the corpus bigram scan once per
    # position in the first job (stage-race guard, r10)
    index.register_cache(trans)

    # -- distributed Viterbi ----------------------------------------------
    state = cands.where(F.col("_pos") == 0).select(
        "_qid",
        "_n",
        F.col("term").alias("_cur"),
        (
            F.log(F.col("_p_uni"))
            + F.col("_dist").cast("double") * F.lit(float(edit_logp))
        ).alias("_score"),
        F.col("term").alias("_path"),
        F.col("_dist").cast("long").alias("_edits"),
    )
    finals: list[DataFrame] = []
    w_v = Window.partitionBy("_qid", "_nxt").orderBy(
        F.col("_cum").desc(), F.col("_path").asc()
    )
    for i in range(1, maxpos):
        finals.append(state.where(F.col("_n") == i))
        live = state.where(F.col("_n") > i)
        nxt = cands.where(F.col("_pos") == i).select(
            "_qid",
            F.col("term").alias("_nxt"),
            F.col("_dist").alias("_ndist"),
            F.col("_p_uni").alias("_np"),
        )
        stepped = (
            live.join(nxt, "_qid")
            .join(
                trans,
                (F.col("_cur") == F.col("w1")) & (F.col("_nxt") == F.col("w2")),
                "left",
            )
            .withColumn(
                "_cum",
                F.col("_score")
                + F.coalesce(
                    F.col("_lp_big"),
                    F.log(F.lit(float(backoff)) * F.col("_np")),
                )
                + F.col("_ndist").cast("double") * F.lit(float(edit_logp)),
            )
        )
        state = (
            stepped.withColumn("_vr", F.row_number().over(w_v))
            .where(F.col("_vr") == 1)
            .select(
                "_qid",
                "_n",
                F.col("_nxt").alias("_cur"),
                F.col("_cum").alias("_score"),
                F.concat_ws(" ", F.col("_path"), F.col("_nxt")).alias("_path"),
                (F.col("_edits") + F.col("_ndist").cast("long")).alias("_edits"),
            )
        )
        # cut the lineage every few steps: at maxpos=16 the chained
        # join+window tree otherwise deepens past what the optimizer
        # re-plans cheaply (state is tiny — <= |queries| * candidates
        # rows — so materializing it is the cheap side of the trade).
        # Shared pin rule (operators/cache.py::make_pin, r12): the
        # returned suggestions read the LAST pin, so it must survive
        # executor loss when the session has a checkpoint dir.
        if i % 4 == 0 and i < maxpos - 1:
            from sparksearchengine_spark.operators.cache import make_pin

            state = make_pin(state.sparkSession)(state)
    finals.append(state)
    allf = finals[0]
    for f_ in finals[1:]:
        allf = allf.unionByName(f_)

    # original analyzed text, to flag unchanged suggestions
    orig = toks.groupBy("_qid").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                lambda s: s["_tok"],
            ),
        ).alias("_orig")
    )
    w_out = Window.partitionBy("_qid").orderBy(
        F.col("_score").desc(), F.col("_path").asc()
    )
    return (
        allf.withColumn("rank", F.row_number().over(w_out))
        .where(F.col("rank") <= k)
        .join(orig, "_qid")
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("rank").cast("long").alias("rank"),
            F.col("_path").alias("corrected"),
            F.round("_score", 6).alias("score"),
            F.col("_edits").alias("n_edits"),
            (F.col("_path") != F.col("_orig")).alias("changed"),
        )
    )


def batch_search_corrected(
    index: "SearchIndex",
    queries_df: DataFrame,
    query_id_col: str = "query_id",
    text_col: str = "qtext",
    field: str = "text",
    k: int = 10,
    min_hits: int = 1,
    max_dist: int = 1,
    max_candidates: int = 8,
    **spell_kw,
) -> DataFrame:
    """Did-you-mean retry for a query-log batch — the Elasticsearch
    `suggest` + client-retry flow as ONE operator: run the batch, find
    the queries with fewer than ``min_hits`` results, correct ONLY
    those through :func:`correct_queries` (best suggestion, and only
    when it actually ``changed``), re-run the corrected subset, and
    union. Queries whose original text already satisfies ``min_hits``
    — and short queries with NO accepted suggestion — keep their
    original results untouched (bit-identical — the same rows, not
    re-scored).

    Returns ``(query_id, doc_id, score, rank, used_query, corrected)``
    — ``used_query`` is the text that produced the row (original or
    suggestion), ``corrected`` whether the retry path produced it.
    Queries with no hits under either text contribute no rows (the
    `batch_search` contract).

    Scale shape: one batch pass + one bounded correction (the
    under-``min_hits`` id set rides a join, never the driver) + one
    batch pass over ONLY the corrected queries. No per-query jobs; the
    only driver action is Spark's own on the final collect.
    """
    from sparksearchengine_spark.operators.search import batch_search

    qsel = queries_df.select(
        F.col(query_id_col).alias("query_id"),
        F.col(text_col).alias("qtext"),
    )
    first = batch_search(index, qsel, k=k, field=field)
    hit_counts = first.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("_nhits")
    )
    # queries under the hit floor: zero-hit ids (anti join) + ids whose
    # count is below min_hits
    short = (
        qsel.join(hit_counts, "query_id", "left")
        .where(F.coalesce(F.col("_nhits"), F.lit(0)) < min_hits)
        .select("query_id", "qtext")
    )
    sugg = correct_queries(
        index,
        short,
        query_id_col="query_id",
        text_col="qtext",
        field=field,
        max_dist=max_dist,
        max_candidates=max_candidates,
        k=1,
        **spell_kw,
    ).where(F.col("changed"))
    retry_q = sugg.select(
        "query_id", F.col("corrected").alias("qtext")
    )
    second = batch_search(index, retry_q, k=k, field=field)
    # originals stay for (a) queries at/over the hit floor, (b) short
    # queries with NO accepted suggestion, and (c) retried queries whose
    # corrected text STILL returned zero rows — a partial result beats
    # losing it (dropping originals keyed on retry_q would erase a
    # 1-hit query's real hit whenever min_hits>1 and the retry whiffed)
    replaced = second.select("query_id").distinct()
    kept = (
        first.join(replaced, "query_id", "left_anti")
        .join(qsel, "query_id")
        .select(
            "query_id",
            "doc_id",
            "score",
            "rank",
            F.col("qtext").alias("used_query"),
            F.lit(False).alias("corrected"),
        )
    )
    retried = second.join(retry_q, "query_id").select(
        "query_id",
        "doc_id",
        "score",
        "rank",
        F.col("qtext").alias("used_query"),
        F.lit(True).alias("corrected"),
    )
    return kept.unionByName(retried)


