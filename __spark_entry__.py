"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine: `sparksearchengine_spark` (see SURVEY.md §2 for the operator
inventory each query exercises). Text queries run over the `documents`
corpus (the testdata has no comment columns on orders/part, so the
declared QC06-QC14 semantics from FIXTURES.md §3 are bound to
`documents.text`). Tokenizer: FIXTURES.md §0 "simple" analyzer, identical
in Spark and DuckDB. BM25 (k1=1.2, b=0.75, corpus-global stats) is written
with the same expression shape in both engines so doubles match bitwise;
every computed double in an output is rounded to 6 decimals and aliased
identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from sparksearchengine_spark import Corpus, F_, Q, TextOptions
from sparksearchengine_spark.functions.scoring import bm25_term_score, idf_expr
from sparksearchengine_spark.operators.textstats import LANG_STOPWORDS

# --------------------------------------------------------------------------
# fixed query constants (the "test manifest"): chosen once against sf0.01
# --------------------------------------------------------------------------
QC01_QTY = 25.0
QC02_T = 150000.0
QC03_D1, QC03_D2 = "1995-01-01 00:00:00", "1996-12-31 23:59:59"
QC04_SIZES = (5, 15, 25)
QC06_TERM = "dup"
QC07_TERMS = ("spark", "hash", "merge")
QC08_T1, QC08_T2 = "spark", "dup"
QC09_W1, QC09_W2 = "table", "hash"
QC10_TERMS = ("dup", "spark")
QC10_K = 10
QC11_NQ, QC11_K = 20, 5
QC13_IDS = (3, 7, 11, 999999, 888888)
QC14_TERM = "dup"
QC14_IDS = (8, 26, 45)
QC15_LO, QC15_HI, QC15_K = 100, 120, 5
QC28_LO, QC28_HI = 132, 246  # both values occur in documents.n_chars
EMB_NQ, EMB_K = 5, 10
DECON_EMB_NQ = 10  # eval-benchmark rows for embedding decontamination
EMB_DUP_T = 0.4  # synthetic embeddings are near-orthogonal; max pair ~0.51
NGRAM_N, NGRAM_T = 3, 0.8
KMEANS_K = 8  # clustering cells; init = the KMEANS_K lowest vec_ids
# hashed linear quality model: integer weights (BIGINT-exact scores in
# both engines), deterministic saw-tooth pattern over the bucket index
CLF_DIM = 64
CLF_WEIGHTS = [((i * 7) % 13) - 6 for i in range(CLF_DIM)]
CLF_VOCAB = [  # integer-valued doubles: order-independent exact sums
    ("the", 2.0), ("and", 1.0), ("data", 5.0), ("spark", 7.0),
    ("dup", -4.0), ("table", 3.0), ("hash", -1.0),
]
# token-budget mixture: 'zh' deliberately unweighted (rate 0) to pin the
# unknown-group path; budget sized so 'en' down-samples (rate < 1)
MIX_WEIGHTS = {"en": 0.5, "de": 0.2, "es": 0.2, "fr": 0.1}
MIX_BUDGET = 5_000
# repeats variant: de overweighted so its uncapped rate exceeds 1
# (multi-epoch up-sampling) while en stays fractional
MIXR_WEIGHTS = {"en": 0.2, "de": 0.8}
MIXR_BUDGET = 20_000
# quality-aware selection: en cuts mid-group, de keeps ~all, others none
SEL_BUDGETS = {"en": 3_000, "de": 1_000}

_INDEX_CACHE: dict = {}


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Downstream event queries all compute on ts as NANOS-since-epoch long.
    # The driver's events.ts has shipped as both parquet TIMESTAMP(NANOS)
    # (Spark 4 reads it as long only under the legacy conf) and
    # TIMESTAMP(MICROS, isAdjustedToUTC=0) (Spark reads TIMESTAMP_NTZ);
    # normalize either to the long-nanos shape the queries (and their
    # DuckDB epoch_ns oracles, which treat naive wall time as UTC) expect.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if not isinstance(ev.schema["ts"].dataType, LongType):
        # NTZ->instant cast uses the session tz: pin UTC so wall time maps
        # to epoch exactly as DuckDB's epoch_ns does on naive timestamps.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ev = ev.withColumn(
            "ts",
            (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)).cast(
                "long"
            ),
        )
    return ev


def _docs_index(spark: SparkSession, sf_dir: str):
    key = (id(spark.sparkContext), sf_dir)
    if key not in _INDEX_CACHE:
        docs = _read(spark, sf_dir, "documents")
        corpus = Corpus(
            docs, id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="simple", positions=True)},
        )
        _INDEX_CACHE[key] = corpus.build_index()
    return _INDEX_CACHE[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 match-any top-10 over documents.text with elements."""
    idx = _docs_index(spark, "/root/testdata/sf0.001")
    q = Q.field("text").match_any(*QC10_TERMS)
    return idx.search(q, k=10, with_elements=True, select_cols=["text", "source"])


# --------------------------------------------------------------------------
# shared DuckDB oracle CTE: the postings/doclen/stats tables in SQL,
# FIXTURES.md §0 tokenizer. Mirrors operators/index.py exactly.
# --------------------------------------------------------------------------
_CTE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS toks
  FROM documents
),
exploded AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks
),
postings AS (
  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
  FROM exploded GROUP BY doc_id, term
),
fieldstats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl
  FROM (SELECT DISTINCT doc_id, dl FROM postings)
),
termstats AS (SELECT term, count(*) AS df FROM postings GROUP BY term)
"""


def _sql_list(words) -> str:
    """Python string tuple -> DuckDB list literal ['a','b',...]."""
    return "[" + ",".join(f"'{w}'" for w in words) + "]"


def _bm25_sql(tf: str, dl: str, df: str, n: str = "f.n", avgdl: str = "f.avgdl") -> str:
    """DuckDB BM25 with the exact expression shape of functions/scoring.py
    (same literals, same associativity => bitwise-equal doubles)."""
    return (
        f"ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"
        f" * ({tf} * (1.2 + 1.0))"
        f" / ({tf} + 1.2 * ((1.0 - 0.75) + 0.75 * {dl} / {avgdl}))"
    )


# --------------------------------------------------------------------------
# queries (Spark) — one per operator; names match oracle_sql()
# --------------------------------------------------------------------------


def _qc01(spark, sf):
    li = _read(spark, sf, "lineitem")
    return li.where(F.col("l_quantity") == QC01_QTY).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _qc02(spark, sf):
    o = _read(spark, sf, "orders")
    t = F.lit(QC02_T)
    p = F.col("o_totalprice")
    return o.agg(
        F.sum(F.when(p > t, 1).otherwise(0)).cast("long").alias("cnt_gt"),
        F.sum(F.when(p >= t, 1).otherwise(0)).cast("long").alias("cnt_ge"),
        F.sum(F.when(p < t, 1).otherwise(0)).cast("long").alias("cnt_lt"),
        F.sum(F.when(p <= t, 1).otherwise(0)).cast("long").alias("cnt_le"),
    )


def _qc03(spark, sf):
    li = _read(spark, sf, "lineitem")
    ship = F.col("l_shipdate")
    dt = li.schema["l_shipdate"].dataType
    cond = ship.between(F.lit(QC03_D1).cast(dt), F.lit(QC03_D2).cast(dt))
    return li.where(cond).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_extprice"),
    )


def _qc04(spark, sf):
    p = _read(spark, sf, "part")
    return p.where(F.col("p_size").isin(*QC04_SIZES)).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _qc05(spark, sf):
    ev = _read_events(spark, sf)
    nullable = F.nullif(F.col("event_type"), F.lit("click"))
    return ev.agg(
        F.sum(F.when(nullable.isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        F.sum(F.when(nullable.isNotNull(), 1).otherwise(0)).cast("long").alias("n_not_null"),
    )


def _qc06(spark, sf):
    idx = _docs_index(spark, sf)
    hits = idx.compile(Q.field("text").match_term(QC06_TERM))
    return hits.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


def _qc07(spark, sf):
    idx = _docs_index(spark, sf)
    f = Q.field("text")
    n_all = idx.compile(f.match_all(*QC07_TERMS)).agg(
        F.count(F.lit(1)).alias("n_all")
    )
    n_any = idx.compile(f.match_any(*QC07_TERMS)).agg(
        F.count(F.lit(1)).alias("n_any")
    )
    n_min2 = idx.compile(f.match_min(2, *QC07_TERMS)).agg(
        F.count(F.lit(1)).alias("n_min2")
    )
    return n_all.crossJoin(n_any).crossJoin(n_min2)


def _qc08(spark, sf):
    idx = _docs_index(spark, sf)
    t1 = Q.field("text").match_term(QC08_T1)
    t2 = Q.field("text").match_term(QC08_T2)
    n_and = idx.compile(t1 & t2).agg(F.count(F.lit(1)).alias("n_and"))
    n_or = idx.compile(t1 | t2).agg(F.count(F.lit(1)).alias("n_or"))
    n_and_not = idx.compile(t1 & ~t2).agg(F.count(F.lit(1)).alias("n_and_not"))
    return n_and.crossJoin(n_or).crossJoin(n_and_not)


def _qc09(spark, sf):
    idx = _docs_index(spark, sf)
    phrase = Q.field("text").match_phrase(f"{QC09_W1} {QC09_W2}")
    return idx.compile(phrase).agg(F.count(F.lit(1)).alias("cnt"))


def _qc10(spark, sf):
    idx = _docs_index(spark, sf)
    res = idx.search(Q.field("text").match_any(*QC10_TERMS), k=QC10_K)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def _qc11(spark, sf):
    idx = _docs_index(spark, sf)
    docs = _read(spark, sf, "documents")
    from sparksearchengine_spark.functions.analyzers import analyzer_expr

    toks = analyzer_expr(F.col("text"), "simple")
    qdf = docs.where(F.col("doc_id") < QC11_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("qtext"),
    )
    res = idx.batch_search(qdf, k=QC11_K, field="text")
    return res.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def _qc12(spark, sf):
    idx = _docs_index(spark, sf)
    idfs = idx.term_idfs().where(F.col("field") == "text")
    postings = idx.postings.where(F.col("field") == "text")
    stats = postings.agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count_distinct("term").alias("n_terms"),
        F.sum("tf").cast("long").alias("sum_tf"),
    )
    idfsum = idfs.agg(F.round(F.sum("idf"), 4).alias("sum_idf"))
    return stats.crossJoin(idfsum)


def _qc13(spark, sf):
    idx = _docs_index(spark, sf)
    res = idx.get_elements(QC13_IDS)
    return res.select("requested_id", "text", "n_chars").orderBy("requested_id")


def _qc14(spark, sf):
    idx = _docs_index(spark, sf)
    fs = idx.fieldstats["text"]
    p = idx.postings.where(
        (F.col("field") == "text")
        & (F.col("term") == QC14_TERM)
        & F.col("doc_id").isin(*QC14_IDS)
    )
    ts = idx.termstats.where(
        (F.col("field") == "text") & (F.col("term") == QC14_TERM)
    ).select("term", "df_t")
    j = p.join(F.broadcast(ts), "term")
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    dft = F.col("df_t").cast("double")
    return j.select(
        "doc_id",
        F.col("tf").cast("long").alias("tf"),
        F.col("dl").cast("long").alias("dl"),
        F.round(F.lit(fs.avgdl), 6).alias("avgdl"),
        F.col("df_t").cast("long").alias("df"),
        F.round(idf_expr(dft, float(fs.doc_count)), 6).alias("idf"),
        F.round(
            bm25_term_score(tf, dl, dft, float(fs.doc_count), fs.avgdl), 6
        ).alias("score"),
    ).orderBy("doc_id")


def _qc15(spark, sf):
    """E7 query join: each row of a 20-doc slice queries the full index
    with its own text (matchAny over its distinct terms), top-5."""
    from sparksearchengine_spark.operators.search import query_join

    idx = _docs_index(spark, sf)
    docs = _read(spark, sf, "documents")
    other = docs.where(
        (F.col("doc_id") >= QC15_LO) & (F.col("doc_id") < QC15_HI)
    ).select("doc_id", "text")
    res = query_join(
        idx, other, text_col="text", field="text", k=QC15_K,
        other_id_col="doc_id", dedup_queries=True,
    )
    return res.select(
        F.col("doc_id").alias("query_id"),
        "match_doc_id",
        F.round("score", 6).alias("score"),
        "rank",
    )


def _qc16(spark, sf):
    """Q12 parser end-to-end: a parsed boost query ('dup^2 spark') ranks
    with the boosted BM25 sum. Two distinct terms -> FP addition is
    order-insensitive, so 6dp rounding matches DuckDB bitwise."""
    idx = _docs_index(spark, sf)
    q = Q.parse("dup^2 spark", default_field="text")
    res = idx.search(q, k=QC10_K)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def _qc17(spark, sf):
    """Q12 wildcard + fuzzy end-to-end: constant-score multi-term queries
    expanded against the term dictionary (LIKE / levenshtein on termstats,
    broadcast into a postings hash-join)."""
    idx = _docs_index(spark, sf)
    wc = idx.compile(Q.parse("dup*")).agg(
        F.count(F.lit(1)).alias("n_wildcard"),
        F.sum("doc_id").cast("long").alias("sum_wc"),
    )
    fz = idx.compile(Q.parse("dup~1")).agg(
        F.count(F.lit(1)).alias("n_fuzzy"),
        F.sum("doc_id").cast("long").alias("sum_fz"),
    )
    return wc.crossJoin(fz)


def _qc18(spark, sf):
    """E6 per-query k (k_col): ks straddle the function-level default to
    pin the max(k_col) window-cutoff behavior."""
    idx = _docs_index(spark, sf)
    docs = _read(spark, sf, "documents")
    from sparksearchengine_spark.functions.analyzers import analyzer_expr

    toks = analyzer_expr(F.col("text"), "simple")
    qdf = docs.where(F.col("doc_id") < QC11_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("qtext"),
        # per-query k in 1..8, deterministic, several above the default k=3
        (F.col("doc_id") % 8 + 1).cast("int").alias("k"),
    )
    res = idx.batch_search(qdf, k=3, field="text", k_col="k")
    return res.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def _qc19(spark, sf):
    """I2 decoupled k-index: the same term query through a term-bucketed
    (bucket_by_term) session layout must match the base index (qc06)."""
    idx = _docs_index(spark, sf).bucket_by_term(8)
    hits = idx.compile(Q.field("text").match_term(QC06_TERM))
    return hits.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


def _qc20(spark, sf):
    """I6/I8 durable layout: save(term_buckets=4) -> load -> BM25 top-k
    must match the in-session index (qc10's oracle verbatim)."""
    import tempfile

    from sparksearchengine_spark.operators.index import SearchIndex

    idx = _docs_index(spark, sf)
    path = tempfile.mkdtemp(prefix="ssidx_qc20_") + "/idx"
    idx.save(path, term_buckets=4)
    loaded = SearchIndex.load(spark, path, _read(spark, sf, "documents"))
    res = loaded.search(Q.field("text").match_any(*QC10_TERMS), k=QC10_K)
    return res.select("doc_id", F.round("score", 6).alias("score"), "rank")


def _qc21(spark, sf):
    """E2/E4 search with elements + resultsTransformer projection: the
    broadcast-the-hits join-back (never the corpus) carries doc columns."""
    idx = _docs_index(spark, sf)
    res = idx.search(
        Q.field("text").match_any(*QC10_TERMS),
        k=QC10_K,
        with_elements=True,
        select_cols=["source", "n_chars"],
    )
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank",
        "source", "n_chars",
    )


def _qc22(spark, sf):
    """Q10 matchAllText: query-time analysis ('Dup, SPARK!' -> dup, spark)
    then conjunctive match."""
    idx = _docs_index(spark, sf)
    q = Q.field("text").match_all_text("Dup, SPARK!")
    return idx.compile(q).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


def _qc23(spark, sf):
    """E7 query join, explicit-id path (dedup_queries=False): must agree
    with qc15's oracle row-for-row."""
    from sparksearchengine_spark.operators.search import query_join

    idx = _docs_index(spark, sf)
    docs = _read(spark, sf, "documents")
    other = docs.where(
        (F.col("doc_id") >= QC15_LO) & (F.col("doc_id") < QC15_HI)
    ).select("doc_id", "text")
    res = query_join(
        idx, other, text_col="text", field="text", k=QC15_K,
        other_id_col="doc_id", dedup_queries=False,
    )
    return res.select(
        F.col("doc_id").alias("query_id"),
        "match_doc_id",
        F.round("score", 6).alias("score"),
        "rank",
    )


def _qc24(spark, sf):
    """E5/I3 batch search on the shuffle-hash fallback path
    (broadcast_queries=False) — the 100 TB-scale join strategy must
    produce the same rows as the broadcast default (qc11's oracle)."""
    idx = _docs_index(spark, sf)
    docs = _read(spark, sf, "documents")
    from sparksearchengine_spark.functions.analyzers import analyzer_expr

    toks = analyzer_expr(F.col("text"), "simple")
    qdf = docs.where(F.col("doc_id") < QC11_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("qtext"),
    )
    res = idx.batch_search(qdf, k=QC11_K, field="text", broadcast_queries=False)
    return res.select(
        "query_id", "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def _qc25(spark, sf):
    """Q13 RawQuery + pluggable constructor: swap the default analyzed-OR
    constructor for the Lucene-syntax parser, so Q.raw('dup AND spark')
    compiles conjunctively (same doc set as qc22), then restore."""
    from sparksearchengine_spark.plans.ast import set_query_constructor

    set_query_constructor(lambda s, f: Q.parse(s, default_field=f))
    try:
        q = Q.raw("dup AND spark", default_field="text")
    finally:
        from sparksearchengine_spark.plans.ast import _default_query_constructor

        set_query_constructor(_default_query_constructor)
    idx = _docs_index(spark, sf)
    return idx.compile(q).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
    )


def _text_repetition(spark, sf):
    """Gopher-style repetition quality signals over documents — per-row
    scan-stage expressions (run-length over sorted gram arrays)."""
    from sparksearchengine_spark.operators.textstats import repetition_metrics

    docs = _read(spark, sf, "documents")
    return repetition_metrics(docs).orderBy("doc_id")


def _pii_scrub(spark, sf):
    """PII masking pass over documents. The synthetic corpus is PII-free
    (r2's row only pinned the identity path), so every 7th doc gets a
    deterministic PII payload injected IN BOTH ENGINES — email, IP, SSN,
    and a country-coded phone — making the oracle pin the actual masking
    and per-category counts, not just pass-through."""
    from sparksearchengine_spark.operators.textstats import pii_scrub

    docs = _read(spark, sf, "documents")
    dirty = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(" reach user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com at 10.0.0.1 ssn 123-45-6789 tel 1-555-123-4567"),
            ),
        ).otherwise(F.col("text")),
    )
    return pii_scrub(dirty).orderBy("doc_id")


def _sample_stratified(spark, sf):
    """Deterministic domain-mixing sample: md5-bucket membership per
    (lang) stratum — reproducible across engines and partitionings."""
    from sparksearchengine_spark.operators.sampling import stratified_sample

    docs = _read(spark, sf, "documents")
    s = stratified_sample(
        docs, "lang", {"en": 0.5, "es": 0.25, "zh": 0.1},
        key_col="doc_id",
    )
    return s.select("doc_id", "lang").orderBy("doc_id")


def _train_test_split(spark, sf):
    """Deterministic leak-proof split column from the doc_id hash."""
    from sparksearchengine_spark.operators.sampling import train_test_split

    docs = _read(spark, sf, "documents")
    return train_test_split(docs, "doc_id", test_fraction=0.2).select(
        "doc_id", "split"
    ).orderBy("doc_id")


DECONTAM_N, DECONTAM_EVAL_LO = 5, 450
VOCAB_TOP_K = 100


def _decontam_ngram(spark, sf):
    """Benchmark decontamination: docs >= DECONTAM_EVAL_LO play the eval
    set; every training doc reports its 5-gram overlap with it. Exact
    duplicates in the synthetic corpus make this a live signal."""
    from sparksearchengine_spark.operators.decontam import ngram_decontaminate

    docs = _read(spark, sf, "documents")
    train = docs.where(F.col("doc_id") < DECONTAM_EVAL_LO)
    ev = docs.where(F.col("doc_id") >= DECONTAM_EVAL_LO)
    out = ngram_decontaminate(train, ev, n=DECONTAM_N)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hit_grams").cast("long").alias("n_hit_grams"),
        "contaminated",
    ).orderBy("doc_id")


BLOOM_MOD, BLOOM_N = 37, 8


def _decontam_bloom(spark, sf):
    """Bloom-filter decontamination (operators/decontam.py::
    bloom_decontaminate, r5): the join-free scale path — eval grams
    packed into a driver-built bitset (Kirsch-Mitzenmacher double
    hashing off ONE md5), probed with codegen shift/mask scalars fused
    into the corpus scan. The oracle REBUILDS the identical bitset in
    SQL (same md5 recipe, same m sizing, same signed-64 packing), so
    the compare is exact INCLUDING any false positives the filter
    would emit."""
    from sparksearchengine_spark.operators.decontam import (
        bloom_decontaminate,
        bloom_gram_filter,
    )

    docs = _read(spark, sf, "documents")
    ev = docs.where(F.col("doc_id") % BLOOM_MOD == 0).select(
        "doc_id", "text"
    )
    bloom = bloom_gram_filter(ev, n=BLOOM_N)
    out = bloom_decontaminate(docs, bloom)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hit_grams").cast("long").alias("n_hit_grams"),
        "contaminated",
    ).orderBy("doc_id")


def _decontam_embedding(spark, sf):
    """Embedding-space decontamination (operators/decontam.py::
    embedding_decontam, r4): the first DECON_EMB_NQ vectors play the
    eval benchmark; every embedding row reports its max eval cosine
    (6dp-rounded before the max — engine-exact) and a keep verdict at
    the EMB_DUP_T threshold. Self-pairs make the flag a live signal."""
    from sparksearchengine_spark.operators.decontam import (
        embedding_decontam,
    )

    emb = _read(spark, sf, "embeddings")
    ev = emb.where(F.col("vec_id") < DECON_EMB_NQ).select(
        F.col("vec_id").alias("eval_id"), "embedding"
    )
    return embedding_decontam(
        emb, ev, threshold=EMB_DUP_T, train_id="vec_id"
    ).orderBy("id")


def _vocab_top(spark, sf):
    """Corpus vocabulary / Zipf coverage: top-100 terms with total tf,
    doc frequency, rank, and cumulative token coverage."""
    from sparksearchengine_spark.operators.decontam import vocab_stats

    docs = _read(spark, sf, "documents")
    v = vocab_stats(docs, top_k=VOCAB_TOP_K)
    return v.select(
        "term", "tf", "df_t", "rank",
        F.round("cum_frac", 6).alias("cum_frac"),
    ).orderBy("rank")


def _unigram_quality(spark, sf):
    """Perplexity-proxy quality: per-doc mean -ln p(token) under the
    corpus's own unigram LM (CCNet-style filter signal)."""
    from sparksearchengine_spark.operators.decontam import unigram_logprob

    docs = _read(spark, sf, "documents")
    out = unigram_logprob(docs)
    return out.select(
        "doc_id", "n_tokens", F.round("avg_nll", 6).alias("avg_nll")
    ).orderBy("doc_id")


EXPORT_SHARDS = 64
DEDUP_CROSS_SPLIT = 250
CHUNK_MAX, CHUNK_OVERLAP = 32, 8
CURATE_MIN_T, CURATE_MAX_T = 20, 70
COLL_MIN, COLL_K = 5, 50
KEYWORDS_K = 5
MLT_NSRC, MLT_K, MLT_TERMS = 10, 5, 3
PACK_SHARDS, PACK_BUDGET = 8, 256


def _pack_chunks(spark, sf):
    """Chunk → shard → pack: the full training-layout pipeline; offsets
    and pack ids are deterministic (md5 shards, (doc,chunk) layout
    order), so the whole physical layout is engine-reproducible."""
    from sparksearchengine_spark.operators.chunking import (
        chunk_documents,
        pack_chunks,
    )
    from sparksearchengine_spark.operators.export import shard_assignments

    docs = _read(spark, sf, "documents")
    ch = chunk_documents(docs, max_tokens=CHUNK_MAX, overlap=CHUNK_OVERLAP)
    sh = shard_assignments(ch, num_shards=PACK_SHARDS)
    out = pack_chunks(sh, budget=PACK_BUDGET, shard_col="shard")
    return out.select(
        "doc_id", "chunk_id", F.col("shard").cast("long").alias("shard"),
        "offset", "pack_id", "pack_offset",
    ).orderBy("doc_id", "chunk_id")


def _more_like_this(spark, sf):
    """Lucene-MoreLikeThis analog: neighbors of the first 10 docs via
    their top-3 tf-idf keywords, scored with the shared BM25 cache."""
    idx = _docs_index(spark, sf)
    res = idx.more_like_this(
        list(range(MLT_NSRC)), "text", k=MLT_K, num_terms=MLT_TERMS
    )
    return res.select(
        "src_id", "match_doc_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("src_id", "rank")


def _collocations(spark, sf):
    """Adjacent-bigram collocations by PMI over the corpus (tokenizer
    vocabulary curation / phrase-mining signal)."""
    from sparksearchengine_spark.operators.decontam import collocations

    docs = _read(spark, sf, "documents")
    c = collocations(docs, min_count=COLL_MIN, top_k=COLL_K)
    return c.select(
        "term_a", "term_b", "n_ab", F.round("pmi", 6).alias("pmi")
    ).orderBy("term_a", "term_b")


def _doc_keywords(spark, sf):
    """Per-doc top-k keywords by tf-idf straight off the postings table
    (WindowGroupLimit, no re-tokenization)."""
    from sparksearchengine_spark.operators.stats import doc_keywords

    idx = _docs_index(spark, sf)
    res = doc_keywords(idx, "text", k=KEYWORDS_K)
    return res.select(
        "doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rank"
    ).orderBy("doc_id", "rank")


def _curation_report(spark, sf):
    """End-to-end curation accounting: quality gate + exact dedup +
    benchmark decontamination + the Gopher rule gate composed in ONE plan
    (operators/pipeline.py), aggregated to a one-row report. The Gopher
    gate runs with min_required_hits=0 (the synthetic vocabulary has no
    English function words, so the required-stopword rule would zero the
    report); the C4 gate stays off (n_c4_fail pins the stable-schema
    contract at 0)."""
    from sparksearchengine_spark.operators.pipeline import curation_report

    docs = _read(spark, sf, "documents")
    return curation_report(
        docs.where(F.col("doc_id") < DECONTAM_EVAL_LO),
        docs.where(F.col("doc_id") >= DECONTAM_EVAL_LO),
        min_tokens=CURATE_MIN_T, max_tokens=CURATE_MAX_T,
        ngram_n=DECONTAM_N,
        gopher={"min_required_hits": 0},
        classifier={"weights": CLF_WEIGHTS, "threshold": 0},
    )


def _chunk_docs(spark, sf):
    """Token-window passage splitting with overlap: scan-stage generate,
    full (doc_id, chunk_id) lineage."""
    from sparksearchengine_spark.operators.chunking import chunk_documents

    docs = _read(spark, sf, "documents")
    return chunk_documents(
        docs, max_tokens=CHUNK_MAX, overlap=CHUNK_OVERLAP
    ).orderBy("doc_id", "chunk_id")


def _dedup_cross_ngram(spark, sf):
    """Cross-corpus EXACT near-dup join (new-crawl vs existing-corpus):
    docs below the split play the crawl, docs above the corpus."""
    from sparksearchengine_spark.operators.dedup import ngram_jaccard_join_cross

    docs = _read(spark, sf, "documents")
    out = ngram_jaccard_join_cross(
        docs.where(F.col("doc_id") < DEDUP_CROSS_SPLIT),
        docs.where(F.col("doc_id") >= DEDUP_CROSS_SPLIT),
        n=NGRAM_N, threshold=NGRAM_T,
    )
    return out.select(
        "id_l", "id_r", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_l", "id_r")


def _export_shard_assign(spark, sf):
    """Deterministic training-shard assignment (pure half of the shard
    exporter; the write itself is unit-tested in tests/test_export.py)."""
    from sparksearchengine_spark.operators.export import shard_assignments

    docs = _read(spark, sf, "documents")
    return shard_assignments(docs, num_shards=EXPORT_SHARDS).select(
        "doc_id", "shard"
    ).orderBy("doc_id")


def _emb_quantize(spark, sf):
    """Symmetric per-vector int8 quantization of the embedding table —
    the 4x-smaller at-rest ANN format; explicit half-up rounding so the
    int codes are engine-exact."""
    from sparksearchengine_spark.operators.similarity import quantize_embeddings

    emb = _read(spark, sf, "embeddings")
    q = quantize_embeddings(emb)
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.aggregate("qvec", F.lit(0).cast("long"),
                    lambda acc, x: acc + F.abs(x)).alias("qabs_sum"),
        F.element_at("qvec", 1).cast("long").alias("q_first"),
    ).orderBy("vec_id")


def _sample_per_group(spark, sf):
    """Deterministic per-group cap (5 docs per lang): hash-ordered rank,
    reproducible across engines and partitionings."""
    from sparksearchengine_spark.operators.sampling import sample_per_group

    docs = _read(spark, sf, "documents")
    return sample_per_group(docs, "lang", n=5, key_col="doc_id").select(
        "doc_id", "lang"
    ).orderBy("doc_id")


def _clean_text(spark, sf):
    """Scan-stage text normalization (control chars, whitespace runs,
    newline spam). The synthetic corpus is already clean (r2's row only
    pinned the identity path), so every 5th doc gets control chars, tab
    runs, space-hugged newlines, and blank-line spam injected IN BOTH
    ENGINES — each cleaning rule must actually fire to hash-match."""
    from sparksearchengine_spark.operators.textstats import clean_text

    docs = _read(spark, sf, "documents")
    dirty = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("\x07junk\t\t mid  "),
                F.coalesce(F.col("text"), F.lit("")),
                F.lit("  tail \n \n\n\n\nend  "),
            ),
        ).otherwise(F.col("text")),
    )
    return clean_text(dirty).select("doc_id", "text").orderBy("doc_id")


PROFILE_COLS = (
    "l_quantity", "l_extendedprice", "l_discount",
    "l_returnflag", "l_linestatus", "l_shipdate",
)


def _search_highlight(spark, sf):
    """Top-k search + snippet highlighting (operators/search.py::
    highlight_snippets): earliest query-term occurrence with +/-20 chars
    of context, deterministic (pos, term) argmin — the Lucene
    highlighter surface, pure scan-stage arithmetic replicated by the
    DuckDB oracle."""
    from sparksearchengine_spark.operators.search import highlight_snippets

    idx = _docs_index(spark, sf)
    docs = _read(spark, sf, "documents")
    hits = idx.search(Q.field("text").match_any(*QC10_TERMS), k=QC10_K)
    joined = hits.join(docs.select("doc_id", "text"), "doc_id")
    return (
        highlight_snippets(joined, QC10_TERMS, before=20, after=20)
        .select(
            "doc_id", F.round("score", 6).alias("score"), "rank",
            "match_term", "match_pos", "snippet",
        )
        .orderBy("rank")
    )


def _search_facets(spark, sf):
    """Faceted counts over the FULL match set of a query (not top-k) —
    per (lang, source) value, how many matching docs. One doc-set join +
    one grouping pass per facet, unioned."""
    idx = _docs_index(spark, sf)
    return idx.facet_counts(
        Q.field("text").match_any(*QC10_TERMS), ["lang", "source"]
    ).orderBy("facet", F.asc_nulls_last("value"))


def _dedup_winnow_pairs(spark, sf):
    """MOSS-style plagiarism candidates (operators/dedup.py::
    winnow_overlap_pairs): pairs sharing winnowing fingerprints,
    containment overlap >= 0.5. Engine-portable by the same md5/window
    machinery doc_winnow pins."""
    from sparksearchengine_spark.operators.dedup import winnow_overlap_pairs

    docs = _read(spark, sf, "documents")
    return winnow_overlap_pairs(docs, min_overlap=0.5).orderBy(
        "id_a", "id_b"
    )


def _bigram_quality(spark, sf):
    """Bigram-LM perplexity proxy (operators/decontam.py::
    bigram_logprob): per-doc mean -ln p(w2|w1) under the corpus MLE
    conditional — one order sharper than the unigram signal."""
    from sparksearchengine_spark.operators.decontam import bigram_logprob

    docs = _read(spark, sf, "documents")
    out = bigram_logprob(docs)
    return out.select(
        "doc_id", "n_bigrams", F.round("avg_nll", 6).alias("avg_nll")
    ).orderBy("doc_id")


def _search_paged(spark, sf):
    """Pagination (Lucene searchAfter shape): page 2 of the flagship
    query — ranks 6..10, one TakeOrdered of offset+k rows then a rank
    filter."""
    idx = _docs_index(spark, sf)
    res = idx.search(
        Q.field("text").match_any(*QC10_TERMS), k=5, offset=5
    )
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("rank")


def _search_after_page(spark, sf):
    """Cursor pagination (operators/search.py::search search_after=):
    page 2 of the flagship query via the (score, doc_id) cursor of page
    1's last hit — the deep-paging shape whose cost does NOT grow with
    depth (the cursor predicate drops prior rows before the TakeOrdered
    heap). Cursor carries the engine's full-precision double; ranks are
    page-local (restart at 1), so the oracle re-ranks its rank>5 slice."""
    idx = _docs_index(spark, sf)
    q = Q.field("text").match_any(*QC10_TERMS)
    page1 = idx.search(q, k=5).orderBy("rank").collect()
    cursor = (page1[-1]["score"], page1[-1]["doc_id"])
    res = idx.search(q, k=5, search_after=cursor)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("rank")


def _text_ppl_buckets(spark, sf):
    """CCNet head/middle/tail bucketing (operators/decontam.py::
    perplexity_buckets): per-LANG percent_rank over the 6dp-rounded
    unigram avg_nll; head = lowest-perplexity third of its language.
    exact=True is the pinned oracle-parity path (percent_rank window);
    the production default is the one-pass percentile_approx sketch +
    broadcast-cutoff join (no sort anywhere — plan-asserted in
    TestPerplexityBuckets::test_approx_plan_has_no_sort)."""
    from sparksearchengine_spark.operators.decontam import (
        perplexity_buckets,
        unigram_logprob,
    )

    docs = _read(spark, sf, "documents")
    nll = unigram_logprob(docs).select(
        "doc_id", F.round("avg_nll", 6).alias("avg_nll")
    )
    scored = nll.join(docs.select("doc_id", "lang"), "doc_id")
    out = perplexity_buckets(
        scored, ppl_col="avg_nll", group_col="lang", exact=True
    )
    return out.select("doc_id", "lang", "avg_nll", "bucket").orderBy(
        "doc_id"
    )


def _text_dict_tag(spark, sf):
    """Gazetteer tagging (operators/textstats.py::dictionary_tag, the
    FlashText job Spark-shaped): a 3-entry dictionary (two unigrams +
    the qc09 bigram) matched token-exactly over every doc in ONE scan —
    per-length n-grams flatten into one explode, the dictionary
    broadcasts, occurrences count per (doc, phrase)."""
    from sparksearchengine_spark.operators.textstats import dictionary_tag

    docs = _read(spark, sf, "documents")
    out = dictionary_tag(
        docs,
        {
            QC06_TERM: "topic_a",
            f"{QC09_W1} {QC09_W2}": "bigram",
            "spark": "topic_b",
        },
    )
    return out.select("doc_id", "tag", "phrase", "n_hits").orderBy(
        "doc_id", "tag", "phrase"
    )


def _batch_dsl_multiterm(spark, sf):
    """Multi-term queries as DATA in the DSL batch (operators/search.py
    ::batch_search_dsl, late r6): a wildcard, a regex, and a fuzzy
    query share ONE vocabulary scan (broadcast pattern frame joined to
    termstats — the batched Lucene term-dictionary intersection), then
    one postings hash-join; constant score 1.0, single-query parity
    pytest-pinned (TestDslBatchMultiTerm)."""
    idx = _docs_index(spark, sf)
    f = Q.field("text")
    queries = [
        (1, f.match_wildcard("du*")),
        (2, f.match_regex("sp[a-z]rk")),
        (3, f.match_fuzzy("sparc", max_edits=1)),
    ]
    res = idx.batch_search_dsl(queries, k=MT_K)
    return res.select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
        "rank",
    ).orderBy("query_id", "rank")


def _mixture_temperature(spark, sf):
    """Temperature-smoothed mixture weights (operators/sampling.py::
    temperature_weights, the XLM-R exponential-smoothing recipe at
    alpha=0.5) + the resulting keep rates: one row per lang with its
    token total, normalized sqrt weight, and min(1, budget*w/sw/t)
    rate. sqrt is IEEE-correctly-rounded (engine-portable); both
    normalization sums run in lang-sorted order; 6dp rounds applied
    Spark-side (F.round, matching DuckDB round at these magnitudes)."""
    from sparksearchengine_spark.operators.sampling import (
        group_token_totals,
        mixture_rates,
        temperature_weights,
    )
    from sparksearchengine_spark.operators.textstats import token_count_expr

    docs = _read(spark, sf, "documents")
    d = docs.select(
        "lang",
        F.coalesce(
            token_count_expr(F.col("text"), "simple").cast("long"), F.lit(0)
        ).alias("n_tokens"),
    )
    totals = group_token_totals(d, "lang", "n_tokens")
    w = temperature_weights(d, "lang", "n_tokens", alpha=0.5, totals=totals)
    rates = mixture_rates(
        d, "lang", w, MIX_BUDGET, "n_tokens", totals=totals
    )
    rows = [
        (g, int(totals[g]), float(w[g]), float(rates.get(g, 0.0)))
        for g in sorted(w)
    ]
    out = spark.createDataFrame(
        rows, "lang string, total_tokens long, weight double, rate double"
    )
    return out.select(
        "lang",
        "total_tokens",
        F.round("weight", 6).alias("weight"),
        F.round("rate", 6).alias("rate"),
    ).orderBy("lang")


def _search_multi_match(spark, sf):
    """ES multi_match best_fields (operators/search.py::
    multi_match_search): 'dup spark src3' against text AND source,
    each field BM25-scored with ITS OWN stats, combined as
    best + 0.3*(sum - best). Source is a 1-token field (tf=dl=avgdl=1)
    so its per-term score reduces to idf — the oracle keeps the full
    expression shape anyway for bit parity."""
    from sparksearchengine_spark import Corpus, TextOptions
    from sparksearchengine_spark.operators.search import multi_match_search

    docs = _read(spark, sf, "documents")
    idx = Corpus(
        docs,
        id_col="doc_id",
        text_cols={
            "text": TextOptions(analyzer="simple", positions=False),
            "source": TextOptions(analyzer="simple", positions=False),
        },
    ).build_index()
    out = multi_match_search(
        idx, "dup spark src3", ["text", "source"], k=10, tie_breaker=0.3
    )
    return out.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("rank")


def _text_compress_ratio(spark, sf):
    """zlib compression-ratio redundancy signal (operators/textstats.py
    ::compression_ratio): Arrow-batched pandas UDF, scan-stage. No
    DuckDB zlib — rows-only driver check; the value thresholds are
    pytest-pinned (TestCompressionRatio)."""
    from sparksearchengine_spark.operators.textstats import (
        compression_ratio,
    )

    docs = _read(spark, sf, "documents")
    out = compression_ratio(docs)
    return out.select(
        "doc_id",
        "n_bytes",
        F.round("compress_ratio", 6).alias("compress_ratio"),
    ).orderBy("doc_id")


def _text_dedup_lines(spark, sf):
    """Within-doc duplicate-line removal (operators/textstats.py::
    dedup_lines, the CCNet/C4 repeated-line page step): first occurrence
    of each exact line kept in order, scan-stage array_distinct. Oracle
    keeps list elements whose first list_position equals their index —
    the same first-occurrence contract."""
    from sparksearchengine_spark.operators.textstats import dedup_lines

    docs = _read(spark, sf, "documents")
    out = dedup_lines(docs.select("doc_id", "text"))
    return out.select("doc_id", "text", "n_dup_lines").orderBy("doc_id")


def _text_entropy(spark, sf):
    """Token-distribution quality signals (operators/textstats.py::
    token_entropy): Shannon entropy in the shuffle-friendly
    ln(n) - sum(tf*ln tf)/n form, type-token ratio, normalized
    entropy — the skewed-unigram-mass complement to the Gopher n-gram
    repetition signals. norm_entropy divides the UNROUNDED entropy."""
    from sparksearchengine_spark.operators.textstats import token_entropy

    docs = _read(spark, sf, "documents")
    out = token_entropy(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round("ttr", 6).alias("ttr"),
        F.round("entropy", 6).alias("entropy"),
        F.round("norm_entropy", 6).alias("norm_entropy"),
    ).orderBy("doc_id")


def _search_facet_metrics(spark, sf):
    """Query-scoped metric aggregations (operators/search.py::
    facet_metrics, the ES terms-bucket + metric-sub-agg shape):
    n_chars statistics per lang over the flagship query's FULL match
    set. Ints sum exactly as doubles (< 2^53) so only avg needs the
    6dp round."""
    from sparksearchengine_spark.operators.search import facet_metrics

    idx = _docs_index(spark, sf)
    q = Q.field("text").match_any(*QC10_TERMS)
    out = facet_metrics(
        idx, q, "lang", "n_chars",
        metrics=("count", "sum", "avg", "min", "max", "distinct"),
    )
    return out.select(
        "value",
        "n_docs",
        "sum_n_chars",
        F.round("avg_n_chars", 6).alias("avg_n_chars"),
        "min_n_chars",
        "max_n_chars",
        "distinct_n_chars",
    ).orderBy("value")


def _search_rescore(spark, sf):
    """Two-pass rescoring (operators/search.py::rescore_search): the
    flagship match_any top-30 window re-scored with the qc09 phrase at
    2x weight (ES rescore, score_mode=total), top-10 re-ranked. The
    phrase's n-way join runs on a postings view left-semi-filtered by
    the broadcast window ids (plan-asserted in TestRescoreSearch)."""
    idx = _docs_index(spark, sf)
    base_q = Q.field("text").match_any(*QC10_TERMS)
    ph = Q.field("text").match_phrase(f"{QC09_W1} {QC09_W2}")
    res = idx.rescore_search(
        base_q, ph, k=10, window=30, rescore_weight=2.0
    )
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    ).orderBy("rank")


def _search_explain(spark, sf):
    """Lucene-explain analog (operators/search.py::explain_scores): the
    full per-(doc, term) BM25 breakdown behind the flagship query —
    idf, tfNorm, per-term contribution, per-doc total. tf_norm rides as
    tscore/idf in BOTH engines (same expression shape => same doubles);
    the 2-term per-doc sum is IEEE-commutative-safe unrounded."""
    idx = _docs_index(spark, sf)
    q = Q.field("text").match_any(*QC10_TERMS)
    ex = idx.explain(q)
    return ex.select(
        "doc_id",
        "term",
        "weight",
        "tf",
        "dl",
        "df_t",
        F.round("idf", 6).alias("idf"),
        F.round("tf_norm", 6).alias("tf_norm"),
        F.round("tscore", 6).alias("tscore"),
        "n_matched",
        F.round("score", 6).alias("score"),
    ).orderBy("doc_id", "term")


def _search_grouped(spark, sf):
    """Diversified per-group top-k (operators/search.py::grouped_search):
    the best 3 matches per lang over the FULL match set — a global top-k
    would let one dominant group fill every slot."""
    idx = _docs_index(spark, sf)
    return idx.grouped_search(
        Q.field("text").match_any(*QC10_TERMS), "lang", k=3
    ).orderBy("group", "rank")


def _events_props(spark, sf):
    """Semi-structured JSON props rollup (operators/events.py): per
    event_type count/sum/min/max of the JSON-extracted integer field —
    extraction is scan-stage get_json_object, no UDF; DuckDB replicates
    with json_extract_string + CAST."""
    from sparksearchengine_spark.operators.events import props_rollup

    ev = _read_events(spark, sf)
    return props_rollup(ev, "k").orderBy("group")


def _table_profile(spark, sf):
    """One-pass column profiling (operators/profile.py): every column's
    nulls/distincts/ranges/totals in a single aggregate job, unpivoted
    scan-stage. Sums go through the exact-decimal cast so totals are
    independent of partial-agg order (engine-exact)."""
    from sparksearchengine_spark.operators.profile import profile_columns

    li = _read(spark, sf, "lineitem")
    return profile_columns(li, list(PROFILE_COLS)).orderBy("column")


def _strip_html(spark, sf):
    """Crawled-page text extraction (operators/textstats.py::strip_html).
    The corpus has no markup, so every 4th doc is wrapped in a full HTML
    scaffold IN BOTH ENGINES — script/style content removal, block-tag
    newlines, tag drop, and entity decode must all fire to hash-match."""
    from sparksearchengine_spark.operators.textstats import strip_html

    docs = _read(spark, sf, "documents")
    dirty = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(
                    "<html><head><style>p {color: red}</style>"
                    '<script type="text/javascript">var x = 1 < 2;</script>'
                    "</head><body><!-- a\ncomment --><h1>Title&nbsp;One"
                    "</h1><p>"
                ),
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(
                    "</p><br><div>Footer &amp; more &lt;tag&gt; "
                    "&quot;q&quot; it&#39;s</div></body></html>"
                ),
            ),
        ).otherwise(F.col("text")),
    )
    return strip_html(dirty).select("doc_id", "text").orderBy("doc_id")


def _events_asof(spark, sf):
    """As-of join: each click event picks up the user's most recent prior
    purchase (one key shuffle + running window — no range cross-join).
    Oracle = DuckDB's native ASOF LEFT JOIN."""
    from sparksearchengine_spark.operators.asof import asof_join

    ev = _read_events(spark, sf)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = asof_join(clicks, purchases, on="user_id", right_prefix="p_")
    # report in microseconds: Spark reads the parquet nanos, DuckDB's
    # TIMESTAMP is micros — the join itself runs at full nanos precision
    return j.select(
        "event_id", "user_id",
        F.expr("ts div 1000").alias("ts_us"),  # exact long division:
        F.expr("p_ts div 1000").alias("p_ts_us"),  # ns/1000 > 2^53 so
        # float division would round the low microsecond digit
        F.round("p_value", 6).alias("p_value"),
    ).orderBy("event_id")


def _qc26(spark, sf):
    """Q11/Q12 sloppy phrase: '"fast scan"~3' (ordered, gap <= slop)
    through the parser, pinned against the exact phrase in one row."""
    idx = _docs_index(spark, sf)
    exact = idx.compile(Q.field("text").match_phrase("fast scan")).agg(
        F.count(F.lit(1)).alias("cnt_exact"),
        F.sum("doc_id").cast("long").alias("sum_exact"),
    )
    sloppy = idx.compile(Q.parse('"fast scan"~3', default_field="text")).agg(
        F.count(F.lit(1)).alias("cnt_slop"),
        F.sum("doc_id").cast("long").alias("sum_slop"),
    )
    return exact.crossJoin(sloppy)


def _qc27(spark, sf):
    """E11/E12 durable point-lookup layout: save(doc_buckets=8) -> load
    (corpus comes from the save itself) -> get_elements prunes to the
    requested ids' bucket partitions; rows must equal qc13's oracle."""
    import tempfile

    from sparksearchengine_spark.operators.index import SearchIndex

    idx = _docs_index(spark, sf)
    path = tempfile.mkdtemp(prefix="ssidx_qc27_") + "/idx"
    idx.save(path, doc_buckets=8)
    loaded = SearchIndex.load(spark, path)
    res = loaded.get_elements(QC13_IDS)
    return res.select("requested_id", "text", "n_chars").orderBy("requested_id")


def _qc28(spark, sf):
    """Q12 full Lucene range brackets (r4): `{a TO b}` / mixed `[a TO b}`
    compile to strict CompareFilters (reference `dsl/DslQuery.scala:
    122-128` accepts the full syntax). Bounds 132/246 both occur in the
    data, so each bracket combination yields a distinct count."""
    idx = _docs_index(spark, sf)
    lo, hi = QC28_LO, QC28_HI

    def cnt(qs, name):
        return idx.compile(Q.parse(qs, default_field="text")).agg(
            F.count(F.lit(1)).alias(f"n_{name}"),
            F.sum("doc_id").cast("long").alias(f"sum_{name}"),
        )

    exc = cnt(f"n_chars:{{{lo} TO {hi}}}", "exc")
    mixed = cnt(f"n_chars:[{lo} TO {hi}}}", "mixed")
    inc = cnt(f"n_chars:[{lo} TO {hi}]", "inc")
    return exc.crossJoin(mixed).crossJoin(inc)


def _qc29(spark, sf):
    r"""Q12 backslash escaping (r5; reference `dsl/DslQuery.scala:122-128`
    accepts full Lucene QueryParser syntax incl. `\`-escaped specials).
    Every 7th doc gets ` c++ -x [tag]` appended IN BOTH ENGINES; a
    case-preserving whitespace analyzer keeps the specials as term
    characters, so `c\+\+`, `\-x` and `\[tag\]` must parse as literal
    terms and match exactly those docs — a mis-tokenized `-x` would
    instead negate, and an unescaped `[` would mis-parse as a range."""
    from sparksearchengine_spark import Corpus, TextOptions

    docs = _read(spark, sf, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" c++ -x [tag]")),
        ).otherwise(F.col("text")),
    )
    idx = Corpus(
        docs, id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="whitespace")},
    ).build_index()

    def cnt(qs, name):
        return idx.compile(Q.parse(qs, default_field="text")).agg(
            F.count(F.lit(1)).alias(f"n_{name}"),
            F.sum("doc_id").cast("long").alias(f"sum_{name}"),
        )

    cpp = cnt(r"text:c\+\+", "cpp")
    neg = cnt(r"\-x", "neg")
    tag = cnt(r"\[tag\]", "tag")
    return cpp.crossJoin(neg).crossJoin(tag)


def _qc30(spark, sf):
    """Q12 regex term (r5): `text:/dup[a-z]*/` — whole-term anchored
    match against the vocabulary (plans/compiler.py::_compile_regex),
    expanded broadcast like any multi-term query, constant score 1.0
    (Lucene RegexpQuery via the QueryParser, `dsl/DslQuery.scala:
    122-128`)."""
    idx = _docs_index(spark, sf)
    res = idx.compile(Q.parse("text:/dup[a-z]*/", default_field="text"))
    return res.select("doc_id", "score").orderBy("doc_id")


def _events_trending(spark, sf):
    """Trending rollup: top-3 event types per hour (rank over the
    windowed-counts rollup, not the raw events)."""
    from sparksearchengine_spark.streaming import trending_keys

    ev = _read_events(spark, sf).select(
        F.timestamp_micros(F.expr("ts DIV 1000")).alias("ts"), "event_type"
    )
    t = trending_keys(ev, window="1 hour", k=3)
    return t.select(
        F.unix_micros("window_start").alias("window_start_us"),
        F.unix_micros("window_end").alias("window_end_us"),
        "event_type", "cnt", "rank",
    )


def _events_hourly_windowed(spark, sf):
    """Streaming operator in batch mode: windowed_event_counts (the same
    plan Structured Streaming runs incrementally) over the events table."""
    from sparksearchengine_spark.streaming import windowed_event_counts

    ev = _read_events(spark, sf).select(
        F.timestamp_micros(F.expr("ts DIV 1000")).alias("ts"), "event_type"
    )
    w = windowed_event_counts(ev, ts_col="ts", key_col="event_type",
                              window="1 hour")
    return w.select(
        F.unix_micros("window_start").alias("window_start_us"),
        F.unix_micros("window_end").alias("window_end_us"),
        "event_type",
        "cnt",
    )


# ---- training-data pipeline operators ------------------------------------


def _dedup_exact(spark, sf):
    from sparksearchengine_spark.operators.dedup import exact_dedup

    docs = _read(spark, sf, "documents")
    return exact_dedup(docs, ["text"], id_col="doc_id").select(
        "doc_id", "canon_id"
    )


def _dedup_ngram_jaccard(spark, sf):
    from sparksearchengine_spark.operators.dedup import ngram_jaccard_join

    docs = _read(spark, sf, "documents")
    pairs = ngram_jaccard_join(
        docs, id_col="doc_id", text_col="text", n=NGRAM_N, threshold=NGRAM_T
    )
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _dedup_minhash_lsh(spark, sf):
    """MinHash+LSH near-dup (xxhash64-based => no SQL oracle; rows-only)."""
    from sparksearchengine_spark.operators.dedup import minhash_lsh_dedup

    docs = _read(spark, sf, "documents")
    pairs = minhash_lsh_dedup(
        docs, id_col="doc_id", text_col="text",
        n=NGRAM_N, num_hashes=64, bands=16, threshold=NGRAM_T,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _dedup_minhash_canon(spark, sf):
    """End-to-end near-dup dedup: MinHash+LSH pairs -> connected
    components -> (doc_id, canon_id, is_duplicate). Oracle: DuckDB
    recursive-CTE components over the EXACT n-gram-Jaccard pairs — valid
    because the LSH+verify pair set equals the exact pair set at this
    threshold (pair-recall 1.0, checked by dedup_recall)."""
    from sparksearchengine_spark.operators.dedup import minhash_lsh_canon

    docs = _read(spark, sf, "documents")
    return minhash_lsh_canon(
        docs, id_col="doc_id", text_col="text",
        n=NGRAM_N, num_hashes=64, bands=16, threshold=NGRAM_T,
    )


def _dedup_bucket_cap(spark, sf):
    """Giant-bucket guard metrics on a synthetic mega-bucket corpus
    (r11 verdict #1 + #4's 'driver oracle for the capped candidate
    count'). Corpus derived from the documents table: rows with
    doc_id % 7 == 0 among doc_id < 260 get IDENTICAL text (one
    near-dup mega-cluster whose identical MinHash signature lands in
    the same bucket of EVERY band — bands oversized buckets of exactly
    m members), the rest get pairwise token-disjoint synthetic text
    (u-prefixed ids, Jaccard 0 between any two, so nothing else
    survives verification). With max_bucket_size=20 < m the guard must
    report exactly (bands, bands*m, m) and the star emission must
    yield exactly m-1 verified pairs, all through min id 0 — and
    minhash_lsh_canon must still collapse the whole cluster to canon 0
    (connectivity through O(m) star edges). Every output is an
    analytic function of m = COUNT(doc_id<260 AND doc_id%7=0), which
    DuckDB computes exactly from the same parquet."""
    from sparksearchengine_spark.operators.dedup import (
        canonicalize_pairs,
        minhash_lsh_dedup,
    )

    docs = _read(spark, sf, "documents").where(F.col("doc_id") < 260)
    mega_text = (
        "the quick brown fox jumps over the lazy dog again and again"
    )
    corpus = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(mega_text))
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit("u"), (F.col("doc_id") * 10 + j))
                    for j in range(10)
                ],
            )
        )
        .alias("text"),
    )
    st: dict = {}
    pairs = minhash_lsh_dedup(
        corpus, id_col="doc_id", text_col="text", n=NGRAM_N,
        num_hashes=64, bands=16, threshold=NGRAM_T,
        max_bucket_size=20, oversize="star", stats_out=st,
    ).persist()
    star = pairs.agg(
        F.count(F.lit(1)).alias("np"),
        F.coalesce(F.sum(F.when(F.col("id_a") == 0, 1).otherwise(0)),
                   F.lit(0)).alias("via0"),
    ).first()
    # canonicalize over the SAME verified pairs (what minhash_lsh_canon
    # composes) instead of re-running the whole signature pipeline —
    # the connectivity-through-star-edges property is what's under test
    canon_dups = (
        canonicalize_pairs(corpus, pairs, id_col="doc_id")
        .where(F.col("is_duplicate") & (F.col("canon_id") == 0))
        .count()
    )
    pairs.unpersist()
    row = (
        st["oversized_buckets"], st["oversized_rows"],
        st["largest_bucket"], int(star["np"]), int(star["via0"]),
        int(canon_dups),
    )
    return spark.createDataFrame(
        [row],
        "oversized_buckets long, oversized_rows long, "
        "largest_bucket long, capped_pairs long, pairs_via_min_id long, "
        "canon_dups long",
    )


def _dedup_recall(spark, sf):
    """Pair-recall of each approximate near-dup op vs its exact baseline,
    thresholded (op, recall_ok). minhash/emb_lsh measured 1.0 at sf0.01;
    simhash banding is pigeonhole-exact (recall 1.0 by construction)."""
    from sparksearchengine_spark.operators.dedup import (
        minhash_lsh_dedup,
        ngram_jaccard_join,
        simhash_dedup,
        simhash_neardup_exact,
    )
    from sparksearchengine_spark.operators.recall import (
        labeled_recall_ok,
        pair_recall,
    )
    from sparksearchengine_spark.operators.similarity import (
        embedding_neardup,
        embedding_neardup_exact,
    )

    docs = _read(spark, sf, "documents")
    emb = _read(spark, sf, "embeddings")
    r_mh = pair_recall(
        minhash_lsh_dedup(docs, threshold=NGRAM_T, n=NGRAM_N),
        ngram_jaccard_join(docs, threshold=NGRAM_T, n=NGRAM_N),
    )
    r_sh = pair_recall(
        simhash_dedup(docs, max_hamming=3),
        simhash_neardup_exact(docs, max_hamming=3),
    )
    r_el = pair_recall(
        embedding_neardup(emb, threshold=EMB_DUP_T, num_planes=16, bands=8),
        embedding_neardup_exact(emb, threshold=EMB_DUP_T),
    )
    from sparksearchengine_spark.operators.dedup import (
        minhash_lsh_join,
        ngram_jaccard_join_cross,
    )

    lft = docs.where(F.col("doc_id") < DEDUP_CROSS_SPLIT)
    rgt = docs.where(F.col("doc_id") >= DEDUP_CROSS_SPLIT)
    r_x = pair_recall(
        minhash_lsh_join(lft, rgt, threshold=NGRAM_T, n=NGRAM_N).select(
            F.col("id_l").alias("id_a"), F.col("id_r").alias("id_b")
        ),
        ngram_jaccard_join_cross(
            lft, rgt, threshold=NGRAM_T, n=NGRAM_N
        ).select(F.col("id_l").alias("id_a"), F.col("id_r").alias("id_b")),
    )
    return (
        labeled_recall_ok("minhash_lsh", r_mh, 0.9)
        .unionByName(labeled_recall_ok("simhash", r_sh, 0.999))
        .unionByName(labeled_recall_ok("emb_lsh", r_el, 0.9))
        .unionByName(labeled_recall_ok("minhash_cross", r_x, 0.9))
    )


def _ann_recall(spark, sf):
    """Recall@k of the ANN paths vs exact cosine top-k, thresholded
    (op, recall_ok). Params picked for ≥0.9 on the near-orthogonal
    synthetic embeddings (measured: lsh 0.98, ivf 0.96 at sf0.01);
    thresholds are booleans so benign KMeans-init variance can't flip
    the oracle."""
    from sparksearchengine_spark.operators.recall import (
        labeled_recall_ok,
        topk_recall,
    )
    from sparksearchengine_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        lsh_cosine_topk,
    )

    emb = _read(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < EMB_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=EMB_K).persist()
    r_lsh = topk_recall(
        lsh_cosine_topk(emb, queries, k=EMB_K, num_planes=16, bands=8), exact
    )
    r_ivf = topk_recall(
        ivf_cosine_topk(emb, queries, k=EMB_K, n_clusters=16, nprobe=12), exact
    )
    return labeled_recall_ok("lsh_topk", r_lsh, 0.9).unionByName(
        labeled_recall_ok("ivf_topk", r_ivf, 0.9)
    )


def _dedup_simhash(spark, sf):
    """SimHash Hamming<=3 near-dup (xxhash64-based; rows-only check)."""
    from sparksearchengine_spark.operators.dedup import simhash_dedup

    docs = _read(spark, sf, "documents")
    return simhash_dedup(docs, id_col="doc_id", text_col="text", max_hamming=3)


def _emb_cosine_topk(spark, sf):
    from sparksearchengine_spark.operators.similarity import cosine_topk

    emb = _read(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < EMB_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = cosine_topk(emb, queries, k=EMB_K)
    return res.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


def _emb_cosine_topk_arrow(spark, sf):
    """Arrow/numpy matmul brute-force (same semantics as emb_cosine_topk;
    the BLAS sum-order delta vs the sequential SQL fold is ~1e-15 and
    vanishes under the 6dp rounding, so it shares that oracle)."""
    from sparksearchengine_spark.operators.similarity import cosine_topk_arrow

    emb = _read(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < EMB_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = cosine_topk_arrow(emb, queries, k=EMB_K)
    return res.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


def _emb_lsh_topk(spark, sf):
    """LSH-bucketed ANN (approximate by design; rows-only check)."""
    from sparksearchengine_spark.operators.similarity import lsh_cosine_topk

    emb = _read(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < EMB_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = lsh_cosine_topk(emb, queries, k=EMB_K)
    return res.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


def _emb_ivf_topk(spark, sf):
    """IVF (KMeans coarse-quantized) ANN (approximate; rows-only check)."""
    from sparksearchengine_spark.operators.similarity import ivf_cosine_topk

    emb = _read(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < EMB_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = ivf_cosine_topk(emb, queries, k=EMB_K, n_clusters=16, nprobe=4)
    return res.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


def _dedup_emb_exact(spark, sf):
    from sparksearchengine_spark.operators.similarity import (
        embedding_neardup_exact,
    )

    emb = _read(spark, sf, "embeddings")
    pairs = embedding_neardup_exact(emb, threshold=EMB_DUP_T)
    return pairs.select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    )


def _dedup_emb_lsh(spark, sf):
    """LSH-blocked embedding near-dup (approximate; rows-only check)."""
    from sparksearchengine_spark.operators.similarity import embedding_neardup

    emb = _read(spark, sf, "embeddings")
    pairs = embedding_neardup(
        emb, threshold=EMB_DUP_T, num_planes=16, bands=8
    )
    return pairs.select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    )


def _text_quality(spark, sf):
    from sparksearchengine_spark.operators.textstats import quality_metrics

    docs = _read(spark, sf, "documents")
    m = quality_metrics(docs, text_col="text", id_col="doc_id")
    return m.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
        F.round("quality_score", 2).alias("quality_score"),
    )


def _doc_fingerprint(spark, sf):
    from sparksearchengine_spark.operators.textstats import content_fingerprint

    docs = _read(spark, sf, "documents")
    return content_fingerprint(docs, text_col="text", id_col="doc_id").select(
        "doc_id", "fp_md5"
    )


def _lang_id(spark, sf):
    """Stopword-argmax + CJK-script-ratio language heuristic."""
    from sparksearchengine_spark.operators.textstats import lang_id

    docs = _read(spark, sf, "documents")
    return lang_id(docs, text_col="text", id_col="doc_id")


def _token_stats(spark, sf):
    from sparksearchengine_spark.operators.textstats import token_stats

    docs = _read(spark, sf, "documents")
    return token_stats(docs, text_col="text", id_col="doc_id").select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "n_bpe_tokens",
        F.round("avg_token_len", 6).alias("avg_token_len"),
    )


def _doc_winnow(spark, sf):
    """Winnowing fingerprint (md5 gram hashes, lexicographic window-min —
    engine-portable, so the DuckDB oracle replicates it exactly)."""
    from sparksearchengine_spark.operators.textstats import rolling_hash_fingerprint

    docs = _read(spark, sf, "documents")
    return rolling_hash_fingerprint(docs, text_col="text", id_col="doc_id")


def _mm_image_features(spark, sf):
    """Multimodal plumbing: binary column -> mapInPandas fake-codec decode.

    The fake codec expands sha256 hex-digest chains, so the exact pixel
    bytes are computable in DuckDB (recursive sha256(VARCHAR) chain) —
    the check is integer-exact: each pixel is byte/256.0 (float32-exact),
    so round(px*256) recovers the byte and the per-doc byte sum carries
    no float noise at all. Pins content encoding, the sha chain, and the
    Arrow mapInPandas decode plumbing end to end."""
    from sparksearchengine_spark.operators.multimodal import decode_images

    docs = _read(spark, sf, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("content"))
    px = decode_images(media, codec="fake")
    return px.select(
        "doc_id",
        "width",
        "height",
        "n_channels",
        F.aggregate(
            "pixels",
            F.lit(0).cast("long"),
            lambda a, x: a + F.round(x.cast("double") * 256).cast("long"),
        ).alias("px_byte_sum"),
    )


def _events_sessionize(spark, sf):
    from sparksearchengine_spark.streaming import sessionize

    ev = _read_events(spark, sf)
    # ts arrives as nanos-since-epoch long; truncate to micros = DuckDB's
    # TIMESTAMP precision so both engines sessionize identical instants
    ev = ev.withColumn("ts_t", F.timestamp_micros(F.expr("ts DIV 1000")))
    s = sessionize(ev, ts_col="ts_t", key_col="user_id", gap="30 minutes")
    return s.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


def _events_hourly(spark, sf):
    ev = _read_events(spark, sf)
    hour = F.expr("ts DIV 3600000000000").alias("hour_bucket")
    return (
        ev.groupBy(hour, "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .orderBy("hour_bucket", "event_type")
    )


def _dedup_boilerplate(spark, sf):
    """Cross-document line-level boilerplate removal (CCNet-style). The
    synthetic corpus is single-line (no newlines), so deterministic
    boilerplate footers are injected IN BOTH ENGINES: every even doc gets
    a newsletter line and every doc_id % 3 == 0 doc a copyright line —
    both cross the min_docs=2 document-frequency threshold and must be
    stripped — while a per-doc unique footer must survive. Whole-doc
    exact duplicates in the corpus also collapse (their single original
    line crosses the threshold), pinning that semantic too."""
    from sparksearchengine_spark.operators.dedup import remove_boilerplate_lines

    docs = _read(spark, sf, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit("\nsubscribe to our newsletter today"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("\nall rights reserved 2024")
            ).otherwise(F.lit("")),
            F.lit("\nunique footer "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return (
        remove_boilerplate_lines(dirty, min_docs=2)
        .select("doc_id", "text", "n_lines", "n_removed")
        .orderBy("doc_id")
    )


def _dedup_spans(spark, sf):
    """Cross-document duplicated-span removal (Lee et al. 2021): token
    positions covered by a 3-gram window shared with another doc are
    dropped; the corpus' repeated vocabulary provides natural shared
    spans. Output text is analyzer-normalized (tokens re-joined with
    spaces) per the operator contract."""
    from sparksearchengine_spark.operators.dedup import remove_duplicate_spans

    docs = _read(spark, sf, "documents")
    return remove_duplicate_spans(docs, n=3, min_docs=2).orderBy("doc_id")


def _text_gopher(spark, sf):
    """Gopher quality-rule signals (Rae et al. 2021 §A1.1). The
    bullet/ellipsis/symbol rules can't fire on the single-line synthetic
    corpus, so deterministic bullet lines, an ellipsis line, and '#'
    symbols are injected IN BOTH ENGINES on modular doc_id classes; the
    word-count / mean-word-length / required-stopword rules run on the
    natural text."""
    from sparksearchengine_spark.operators.textstats import gopher_rules

    docs = _read(spark, sf, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit("\n- bullet item alpha\n- bullet item beta"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit("\nthis trails off...")
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" ## ## #")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return gopher_rules(dirty).orderBy("doc_id")


def _text_c4(spark, sf):
    """C4 cleaning rules (Raffel et al. 2020 §2.2). The synthetic corpus
    has no sentence punctuation, so sentence-shaped lines are injected IN
    BOTH ENGINES on modular doc_id classes such that every rule fires:
    a unique kept sentence per doc, a 5-sentence block (evens), a
    too-short line (%3), a javascript line (%5), a lorem-ipsum page flag
    (%7), and a curly-brace page flag (%11)."""
    from sparksearchengine_spark.operators.textstats import c4_filters

    docs = _read(spark, sf, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\nfirst generated sentence for doc "),
            F.col("doc_id").cast("string"),
            F.lit(" ends here."),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit(
                    "\nsecond sentence is also kept here. third one makes"
                    " the page long enough! is this a question? yes it is."
                    " final sentence closes it."
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit("\ntoo short.")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit("\nplease enable javascript to continue reading."),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("\nlorem ipsum dolor sit amet."),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit("\ncurly { brace } line.")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return c4_filters(dirty).orderBy("doc_id")


def _dedup_crossgram(spark, sf):
    """Cross-document duplicated n-gram fraction (Lee et al. 2021 /
    RefinedWeb duplicated-text family). The corpus' shared vocabulary
    yields natural cross-doc 3-gram repeats (~40% of gram types at
    sf0.01), so the signal is exercised without injection."""
    from sparksearchengine_spark.operators.dedup import cross_doc_ngram_dup

    docs = _read(spark, sf, "documents")
    return cross_doc_ngram_dup(docs, n=3, min_docs=2).orderBy("doc_id")


def _emb_kmeans_assign(spark, sf):
    """Scan-stage nearest-centroid assignment (k-means E-step) with the
    deterministic lowest-id init — the clustering primitive under
    SemDedup and corpus cartography (`operators/clustering.py`)."""
    from sparksearchengine_spark.operators.clustering import (
        default_centroids,
        kmeans_assign,
    )

    emb = _read(spark, sf, "embeddings")
    cents = default_centroids(emb, KMEANS_K)
    return kmeans_assign(emb, cents).orderBy("id")


def _emb_semdedup(spark, sf):
    """SemDedup (Abbas et al. 2023): k-means cells bound the pairwise
    cosine near-dedup; drop = lower-id in-cell neighbor >= threshold.
    Assignment margins (min best-vs-2nd 8e-4) and threshold margins
    (min |cos-t| 1e-4) are orders above cross-engine float noise, so the
    integer/boolean output is engine-exact."""
    from sparksearchengine_spark.operators.clustering import semdedup

    emb = _read(spark, sf, "embeddings")
    return semdedup(
        emb, threshold=EMB_DUP_T, n_clusters=KMEANS_K, method="expr"
    ).orderBy("id")


def _emb_semdedup_arrow(spark, sf):
    """The Arrow/numpy per-cell matmul execution of emb_semdedup — same
    answer, BLAS instead of interpreted SQL folds (the scale path)."""
    from sparksearchengine_spark.operators.clustering import semdedup

    emb = _read(spark, sf, "embeddings")
    return semdedup(
        emb, threshold=EMB_DUP_T, n_clusters=KMEANS_K, method="arrow"
    ).orderBy("id")


def _classifier_score(spark, sf):
    """Hashed linear quality-classifier inference (fastText bucket
    shape): integer weights -> BIGINT-exact scores, md5 buckets shared
    with the DuckDB oracle; the whole model is one scan-stage fold."""
    from sparksearchengine_spark.operators.classify import classifier_score

    docs = _read(spark, sf, "documents")
    return classifier_score(
        docs, CLF_WEIGHTS, bias=0, threshold=0
    ).orderBy("id")


def _classifier_vocab(spark, sf):
    """Vocabulary linear model: explode + broadcast(term,weight) join +
    per-doc re-aggregation. Integer-valued double weights keep the sums
    order-independent-exact."""
    from sparksearchengine_spark.operators.classify import (
        classifier_score_vocab,
    )

    docs = _read(spark, sf, "documents")
    w = spark.createDataFrame(CLF_VOCAB, "term string, weight double")
    return classifier_score_vocab(docs, w, bias=1.0).orderBy("id")


def _mixture_sample(spark, sf):
    """Token-budget mixture sampling (operators/sampling.py::
    mixture_sample): per-group keep rates realize target mixture weights
    under a total token budget; membership is the engine-portable
    md5-bucket rule, so the keep column is bit-stable across engines
    (the single data-dependent float op, scale/total, is one IEEE
    division in both)."""
    from sparksearchengine_spark.operators.sampling import mixture_sample
    from sparksearchengine_spark.operators.textstats import token_count_expr

    docs = _read(spark, sf, "documents")
    d = docs.withColumn(
        "n_tokens",
        F.coalesce(
            token_count_expr(F.col("text"), "simple").cast("long"), F.lit(0)
        ),
    )
    return (
        mixture_sample(
            d, "lang", MIX_WEIGHTS, MIX_BUDGET,
            key_col="doc_id", token_col="n_tokens",
        )
        .select("doc_id", "lang", "n_tokens", "keep")
        .orderBy("doc_id")
    )


def _mixture_repeats(spark, sf):
    """Up-sampling mixture (allow_repeats): uncapped rates become an
    integer n_copies column — floor(rate) full epochs plus the
    hash-selected fractional slice. Pins the data-constrained regime
    (rate > 1) and the unweighted-group zero path."""
    from sparksearchengine_spark.operators.sampling import mixture_sample
    from sparksearchengine_spark.operators.textstats import token_count_expr

    docs = _read(spark, sf, "documents")
    d = docs.withColumn(
        "n_tokens",
        F.coalesce(
            token_count_expr(F.col("text"), "simple").cast("long"), F.lit(0)
        ),
    )
    return (
        mixture_sample(
            d, "lang", MIXR_WEIGHTS, MIXR_BUDGET,
            key_col="doc_id", token_col="n_tokens", allow_repeats=True,
        )
        .select("doc_id", "lang", "n_tokens", "n_copies")
        .orderBy("doc_id")
    )


HASH_EMBED_DIM = 16


def _text_hash_embed(spark, sf):
    """Feature-hashing text embedding (operators/classify.py::
    hash_embed): md5-bucket counts L2-normalized — integer counts and a
    single sqrt/division per slot make even the doubles engine-exact."""
    from sparksearchengine_spark.operators.classify import hash_embed

    docs = _read(spark, sf, "documents")
    emb = hash_embed(docs, dim=HASH_EMBED_DIM)
    # posexplode: the driver's pandas canon cannot hash array cells
    return emb.select(
        "id", F.posexplode("embedding").alias("pos", "value")
    ).orderBy("id", "pos")


def _text_hash_embed_arrow(spark, sf):
    """The numpy bincount execution of text_hash_embed — same answer
    (shares its oracle), vectorized instead of O(dl x dim) interpreted
    folds."""
    from sparksearchengine_spark.operators.classify import hash_embed

    docs = _read(spark, sf, "documents")
    emb = hash_embed(docs, dim=HASH_EMBED_DIM, method="arrow")
    return emb.select(
        "id", F.posexplode("embedding").alias("pos", "value")
    ).orderBy("id", "pos")


def _select_budget(spark, sf):
    """Quality-aware budget selection (operators/sampling.py::
    select_top_by_budget): rank per lang by the hashed classifier score,
    keep the greedy prefix that fits the token budget. Integer scores
    and cumsums — engine-exact ordering and cut points."""
    from sparksearchengine_spark.operators.classify import hashed_score_expr
    from sparksearchengine_spark.operators.sampling import (
        select_top_by_budget,
    )
    from sparksearchengine_spark.operators.textstats import token_count_expr

    docs = _read(spark, sf, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        F.coalesce(
            token_count_expr(F.col("text"), "simple").cast("long"), F.lit(0)
        ).alias("n_tokens"),
        hashed_score_expr(F.col("text"), CLF_WEIGHTS).alias("score"),
    )
    return select_top_by_budget(
        d, "lang", "score", "n_tokens", SEL_BUDGETS
    ).orderBy("doc_id")


def _messy_url_expr() -> "F.Column":
    """Deterministic messy-URL construction over `documents` — both
    engines build the identical string from (doc_id, source), so every
    normalizer rule (case, userinfo, non-default port, www., duplicate/
    trailing slashes, tracking params, param order, fragment) fires on
    real rows. The ccTLD branch (doc_id%2==0) also exercises the
    registered-domain 3-label heuristic."""
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 5 == 0, F.lit("HTTP://")).otherwise(
            F.lit("HTTPS://User:Pw@")
        ),
        F.lit("WWW."),
        F.upper(F.col("source")),
        F.when(d % 2 == 0, F.lit(".Example.CO.UK:8443")).otherwise(
            F.lit(".Example.COM")
        ),
        F.lit("/Docs//"),
        d.cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("?utm_source=x&fbclid=Z"))
        .when(d % 4 == 1, F.lit(""))
        .when(d % 4 == 2, F.lit("?b=2&utm_campaign=c&a=1"))
        .otherwise(F.lit("?a=1&b=2")),
        F.when(d % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


def _url_normalize(spark, sf):
    """URL canonicalization + domain keys (operators/weburl.py::
    with_url_keys): scan-stage regex/array exprs only — the DuckDB
    oracle replicates each rule verbatim (shared RE2/Java regex
    subset), so canonical keys are bit-identical across engines."""
    from sparksearchengine_spark.operators.weburl import with_url_keys

    docs = _read(spark, sf, "documents")
    urls = docs.select("doc_id", _messy_url_expr().alias("url"))
    return with_url_keys(urls, "url").select(
        "doc_id", "url_norm", "url_host", "url_domain"
    ).orderBy("doc_id")


def _url_domain_block(spark, sf):
    """Domain blocklist filter + per-host rollup (operators/weburl.py::
    filter_domains): the literal blocklist compiles to a scan predicate
    (no join, no shuffle before the rollup agg)."""
    from sparksearchengine_spark.operators.weburl import (
        filter_domains,
        with_url_keys,
    )

    docs = _read(spark, sf, "documents")
    urls = docs.select("doc_id", _messy_url_expr().alias("url"))
    keyed = with_url_keys(urls, "url")
    kept = filter_domains(keyed, "url_domain", ["example.co.uk"])
    return (
        kept.groupBy("url_host")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("url_host")
    )


def _url_latest(spark, sf):
    """Latest-capture compaction (operators/weburl.py::latest_per_key):
    newest event per (user_id, event_type), event_id tiebreak — the
    WindowGroupLimit top-1 shape re-crawl dedup runs at 100 TB."""
    from sparksearchengine_spark.operators.weburl import latest_per_key

    ev = _read_events(spark, sf)
    return latest_per_key(
        ev.select("event_id", "user_id", "event_type", "ts", "value"),
        ["user_id", "event_type"],
        "ts",
        tiebreak_col="event_id",
    ).select("user_id", "event_type", "ts", "value", "event_id").orderBy(
        "user_id", "event_type"
    )


DSIR_DIM = 1024


def _dsir_target(spark, sf):
    docs = _read(spark, sf, "documents")
    return docs, docs.where(F.col("lang") == "en")


def _dsir_weights(spark, sf):
    """DSIR importance weights (operators/dsir.py::dsir_log_weights,
    Xie et al. 2023): hashed unigram+bigram buckets, add-one-smoothed
    target/raw log-ratio table (broadcast), per-doc decimal-exact sum.
    Target domain = the English slice of the corpus."""
    from sparksearchengine_spark.operators.dsir import dsir_log_weights

    docs, target = _dsir_target(spark, sf)
    return dsir_log_weights(docs, target, dim=DSIR_DIM).orderBy("doc_id")


def _dsir_sample(spark, sf):
    """Deterministic Gumbel-top-k resampling over the DSIR weights
    (operators/dsir.py::dsir_sample): n draws without replacement
    ∝ exp(weight), RNG-free via the md5-uniform, one TakeOrdered job."""
    from sparksearchengine_spark.operators.dsir import (
        dsir_log_weights,
        dsir_sample,
    )

    docs, target = _dsir_target(spark, sf)
    w = dsir_log_weights(docs, target, dim=DSIR_DIM)
    return dsir_sample(w, 50).orderBy("doc_id")


RP_OUT_DIM = 8


def _emb_random_proj(spark, sf):
    """Johnson-Lindenstrauss random projection (operators/similarity.py::
    random_projection): deterministic md5-parity Rademacher matrix, one
    sequential fold per output dim — zero shuffle, and the arrow method
    is bit-identical (pinned in tests). Components rounded 6dp for the
    cross-engine compare."""
    from sparksearchengine_spark.operators.similarity import (
        random_projection,
    )

    emb = _read(spark, sf, "embeddings")
    out = random_projection(emb, out_dim=RP_OUT_DIM, in_dim=64)
    # posexplode: the driver's pandas canon cannot hash array cells
    return out.select(
        "id",
        F.posexplode(
            F.transform(F.col("rp"), lambda v: F.round(v, 6))
        ).alias("pos", "value"),
    ).orderBy("id", "pos")


def _sketch_profile(spark, sf):
    """Sketch-accuracy harness (operators/profile.py::
    sketch_accuracy_check — the recall-harness pattern for sketches):
    HLL++ distinct estimates held to 3 rsd of exact, approx medians held
    to their rank-error contract, tie-aware. The oracle pins the
    expected verdicts; the measurement itself is Spark-side exact-vs-
    sketch. approx_profile is the one-pass 100 TB profile these
    sketches come from (plan-asserted single aggregate, no Expand)."""
    from sparksearchengine_spark.operators.profile import (
        sketch_accuracy_check,
    )

    li = _read(spark, sf, "lineitem")
    res = sketch_accuracy_check(
        li, ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"]
    )
    # median_rank_ok is NULL for non-numeric columns: a nullable boolean
    # canonicalizes as None (Spark) vs NaN (DuckDB .df()) in pandas, so
    # carry it as a string with an explicit sentinel.
    return res.select(
        "column",
        "distinct_ok",
        F.coalesce(
            F.col("median_rank_ok").cast("string"), F.lit("n/a")
        ).alias("median_rank_ok"),
    ).orderBy("column")


def _search_mmr(spark, sf):
    """MMR diversified re-ranking (operators/similarity.py::mmr_rerank,
    Carbonell & Goldstein 1998): top-20 cosine pool per query, then the
    greedy lam·rel − (1−lam)·max-sim pick, k=3 at lam=0.5 —
    applyInPandas per query group, scores rounded 6dp before every
    argmax with id-asc ties so the DuckDB unrolled-greedy oracle picks
    identically."""
    from sparksearchengine_spark.operators.similarity import (
        cosine_topk,
        mmr_rerank,
    )

    emb = _read(spark, sf, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pool = cosine_topk(emb, queries_df, k=20).join(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    return mmr_rerank(pool, k=3, lam=0.5).orderBy("query_id", "mmr_rank")


def _search_facet_cube(spark, sf):
    """Multi-dim facet drilldown in ONE aggregation (operators/search.py::
    facet_cube): CUBE(lang, source) over the full match set, with
    grouping_id disambiguating genuine NULL dim values from rollup rows
    — a single Expand+HashAggregate where facet_counts unions one pass
    per facet (plan-asserted in tests)."""
    idx = _docs_index(spark, sf)
    return idx.facet_cube(
        Q.field("text").match_any(*QC10_TERMS), ["lang", "source"]
    ).orderBy(
        "grouping_id",
        F.asc_nulls_last("lang"),
        F.asc_nulls_last("source"),
    )


def _search_bm25f(spark, sf):
    """BM25F multi-field ranking (operators/search.py::bm25f_search,
    Robertson/Zaragoza/Taylor 2004): field tfs length-normalized and
    weight-blended BEFORE saturation, union docFreq idf. Two fields
    (text w=1, source w=2), so the per-(term,doc) blend is
    IEEE-commutative-exact; per-doc totals rounded 6dp."""
    from sparksearchengine_spark import Corpus, TextOptions

    docs = _read(spark, sf, "documents")
    idx = Corpus(
        docs,
        id_col="doc_id",
        text_cols={
            "text": TextOptions(analyzer="simple", positions=False),
            "source": TextOptions(analyzer="simple", positions=False),
        },
    ).build_index()
    return idx.bm25f_search(
        "dup spark src3", {"text": 1.0, "source": 2.0}, k=10
    )


def _search_suggest(spark, sf):
    """Did-you-mean suggestions (operators/stats.py::suggest_terms):
    Levenshtein ≤ 2 candidates from the vocabulary, length-prefiltered,
    ranked (dist, df desc, term) — one vocab pass + TakeOrdered."""
    idx = _docs_index(spark, sf)
    return idx.suggest_terms("sparkk", max_dist=2, k=5)


def _search_prf(spark, sf):
    """RM3 pseudo-relevance-feedback expansion (operators/search.py::
    prf_expand_search, Lavrenko & Croft 2001): top-5 feedback docs →
    decimal-exact feedback term distribution (top 8) → λ=0.5
    interpolation with the original query → one broadcast re-score
    against the scored-postings cache."""
    idx = _docs_index(spark, sf)
    return idx.prf_expand_search(
        "dup spark", k=10, fb_docs=5, fb_terms=8, lam=0.5
    )


def _search_sigterms(spark, sf):
    """Significant-terms aggregation (operators/stats.py::
    significant_terms): JLH-scored overrepresentation of match-set
    terms vs the corpus background — semi-join bounded by the match
    set, broadcast termstats, TakeOrdered k."""
    idx = _docs_index(spark, sf)
    return idx.significant_terms(
        Q.field("text").match_any(*QC10_TERMS), k=10, min_doc_count=2
    )


def _table_histogram(spark, sf):
    """Fixed-width numeric histogram (operators/profile.py::histogram):
    floor-bin range facets over o_totalprice — one partial-agg'd
    groupBy, bins bound the shuffle."""
    from sparksearchengine_spark.operators.profile import histogram

    orders = _read(spark, sf, "orders")
    return histogram(orders, "o_totalprice", 50_000.0).orderBy("bin_start")


def _table_skew(spark, sf):
    """Key-skew diagnosis (operators/profile.py::skew_report): hottest
    suppliers in lineitem with row share — the should-I-salt-this-join
    report; one partial-agg'd groupBy + broadcast total + TakeOrdered."""
    from sparksearchengine_spark.operators.profile import skew_report

    li = _read(spark, sf, "lineitem")
    return skew_report(li, "l_suppkey", k=10)


def _chunk_sentences(spark, sf):
    """Sentence segmentation (operators/chunking.py::split_sentences):
    RE2/Java-portable boundary marking, scan-stage posexplode."""
    from sparksearchengine_spark.operators.chunking import split_sentences

    docs = _read(spark, sf, "documents")
    return split_sentences(docs).orderBy("doc_id", "sent_idx")


PERC_QUERIES = ((1, "dup spark"), (2, "zzz_nowhere"), (3, "the data"))


def _percolate_match(spark, sf):
    """Standing-query percolation verdicts (streaming/stream.py::
    percolate_stream): the exact per-batch plan foreachBatch runs —
    analyzed doc terms ⋈ broadcast standing-term table → per-(query,
    doc) match counts. The incremental execution is pinned equal to
    this batch form by TestPercolateStream."""
    from sparksearchengine_spark.streaming.stream import (
        prepare_percolator,
    )
    from sparksearchengine_spark.functions.analyzers import analyzer_expr

    docs = _read(spark, sf, "documents")
    qdf = spark.createDataFrame(
        list(PERC_QUERIES), "query_id long, query_text string"
    )
    qterms = prepare_percolator(qdf)
    dt = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(analyzer_expr(F.col("text"), "simple"))
        ).alias("term"),
    )
    return (
        dt.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
        .orderBy("query_id", "doc_id")
    )


def _table_profile_grouped(spark, sf):
    """Per-group profiling (operators/profile.py::profile_columns with
    group_by): one GROUPED aggregate job, a (group, column) stats row
    each — the per-source quality dashboard shape."""
    from sparksearchengine_spark.operators.profile import profile_columns

    li = _read(spark, sf, "lineitem")
    return profile_columns(
        li, ["l_quantity", "l_extendedprice"], group_by=["l_returnflag"]
    ).orderBy("l_returnflag", "column")


def _text_tfidf_embed(spark, sf):
    """Idf-weighted feature-hashing embedding (operators/classify.py::
    tfidf_hash_embed): per-bucket decimal-exact idf sums, shared md5
    bucket rule, one-sqrt-one-fold L2 normalization."""
    from sparksearchengine_spark.operators.classify import tfidf_hash_embed

    docs = _read(spark, sf, "documents")
    emb = tfidf_hash_embed(docs, dim=HASH_EMBED_DIM)
    # posexplode the array column: the driver's pandas canon cannot sort
    # or hash list-typed cells, so the comparison runs over scalar
    # (id, pos, value) rows instead (VERDICT r4 #1).
    return emb.select(
        "id", F.posexplode("embedding").alias("pos", "value")
    ).orderBy("id", "pos")


def _search_complete(spark, sf):
    """Prefix autocomplete (operators/stats.py::complete_prefix): vocab
    StartsWith predicate + TakeOrdered by (df desc, term)."""
    idx = _docs_index(spark, sf)
    return idx.complete_prefix("th", k=10)


def _search_merged_index(spark, sf):
    """Shard-combine (operators/index.py::merge_indexes): two half-corpus
    indexes merged with stats RECOMPUTED from the union — the flagship
    query must hash-match the whole-corpus oracle (qc10's SQL verbatim),
    proving merged BM25 is exact, not shard-stitched."""
    from sparksearchengine_spark import Corpus, TextOptions
    from sparksearchengine_spark.operators.index import merge_indexes

    docs = _read(spark, sf, "documents")
    opts = {"text": TextOptions(analyzer="simple", positions=True)}
    lo = Corpus(
        docs.where(F.col("doc_id") % 2 == 0), id_col="doc_id",
        text_cols=opts,
    ).build_index()
    hi = Corpus(
        docs.where(F.col("doc_id") % 2 == 1), id_col="doc_id",
        text_cols=opts,
    ).build_index()
    merged = merge_indexes(lo, hi)
    res = merged.search(Q.field("text").match_any(*QC10_TERMS), k=QC10_K)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )


HOUR_NS = 3_600_000_000_000


def _events_resample(spark, sf):
    """Fixed-interval resampling with gap fill (operators/events.py::
    resample_gapfill): hourly per-event_type series with explicit zero
    rows; long-exact bucketing, decimal-exact value sums."""
    from sparksearchengine_spark.operators.events import resample_gapfill

    ev = _read_events(spark, sf)
    return resample_gapfill(
        ev, HOUR_NS, key_col="event_type", value_col="value"
    ).orderBy("event_type", "bucket_ts")


def _table_corr(spark, sf):
    """One-pass exact correlation matrix (operators/profile.py::
    correlation_matrix): decimal sums make every Pearson r independent
    of partitioning and bit-equal across engines."""
    from sparksearchengine_spark.operators.profile import (
        correlation_matrix,
    )

    li = _read(spark, sf, "lineitem")
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).orderBy("col_a", "col_b")


def _search_near(spark, sf):
    """Unordered proximity query (plans/ast.py::MatchNear): every term
    within ±5 positions of an anchor occurrence of the first, any
    order; scored as matchAll (proximity gates membership)."""
    idx = _docs_index(spark, sf)
    res = idx.compile(Q.field("text").match_near("dup spark", window=5))
    return res.select(
        "doc_id", F.round("score", 6).alias("score")
    ).orderBy("doc_id")


SEVAL_NL = 8  # synthetic judgments per query


def _seval_frames(spark, sf):
    """Shared by search_eval / search_eval_summary: the qc11 batch-search
    run as the system under test, judged against a deterministic label
    set with two components (both exactly reproducible in SQL):

    * odd-rank hits from the run itself get grade 1 + rank % 3 — this
      guarantees real retrieved-and-judged rows at known ranks, so the
      DCG / MRR arithmetic is a live signal, not an all-zero row;
    * synthetic pairs (q, (q*97 + j*13) % n_docs) with grade
      1 + (q+j) % 3 for j in 1..SEVAL_NL — mostly unretrieved, so
      recall denominators and ideal-DCG extend beyond the hit set.
    """
    from sparksearchengine_spark.functions.analyzers import analyzer_expr

    idx = _docs_index(spark, sf)
    docs = _read(spark, sf, "documents")
    toks = analyzer_expr(F.col("text"), "simple")
    qdf = docs.where(F.col("doc_id") < QC11_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(toks, 1, 2)).alias("qtext"),
    )
    res = idx.batch_search(qdf, k=QC11_K, field="text")
    n_docs = docs.count()
    rank_labels = res.where(F.col("rank") % 2 == 1).select(
        "query_id",
        "doc_id",
        (F.lit(1.0) + (F.col("rank") % 3).cast("double")).alias("grade"),
    )
    synth_labels = (
        spark.range(QC11_NQ)
        .select(F.col("id").alias("query_id"))
        .select(
            "query_id",
            F.explode(
                F.sequence(F.lit(1), F.lit(SEVAL_NL))
            ).alias("j"),
        )
        .select(
            "query_id",
            (
                (F.col("query_id") * 97 + F.col("j") * 13) % n_docs
            ).alias("doc_id"),
            (
                F.lit(1.0)
                + ((F.col("query_id") + F.col("j")) % 3).cast("double")
            ).alias("grade"),
        )
    )
    return res, rank_labels.unionByName(synth_labels)


def _search_eval(spark, sf):
    """Retrieval-quality metrics (operators/evaluate.py::
    retrieval_metrics, r5): per-query nDCG@k / MRR / precision / recall
    at k=QC11_K over the qc11 batch-search run. Ranks are trusted from
    batch_search (rank_col); the DCG/IDCG sums run through the
    DECIMAL(28,6) order-invariant recipe, so every metric is bit-stable
    across partitionings and matches DuckDB exactly. The reference has
    no eval harness at all (SURVEY §5) — this is the measurement loop a
    curation pipeline needs before shipping a re-ranked index."""
    from sparksearchengine_spark.operators.evaluate import retrieval_metrics

    res, labels = _seval_frames(spark, sf)
    return retrieval_metrics(
        res, labels, k=QC11_K, rank_col="rank"
    ).orderBy("query_id")


def _search_eval_summary(spark, sf):
    """Macro-averaged roll-up of search_eval (operators/evaluate.py::
    retrieval_metrics_summary): one row of mean P/R, MRR, mean nDCG —
    the number a nightly curation job alerts on."""
    from sparksearchengine_spark.operators.evaluate import (
        retrieval_metrics,
        retrieval_metrics_summary,
    )

    res, labels = _seval_frames(spark, sf)
    return retrieval_metrics_summary(
        retrieval_metrics(res, labels, k=QC11_K, rank_col="rank")
    )


# PQ/ADC (operators/similarity.py::pq_*): the exact cross-engine check
# runs with PINNED deterministic codebooks (the kmeans_fit-shaped
# contract classifier_fit and kmeans use — training quality is a pytest
# bar, inference arithmetic is the oracle). Formula-generated literals,
# embedded identically in the Spark wrapper and the DuckDB SQL.
PQ_M, PQ_KSUB, PQ_DSUB = 4, 8, 16  # dim 64 = 4 x 16
PQ_NQ, PQ_K = 5, 10
_PQ_CB = [
    [
        [
            ((j * 131 + c * 31 + d * 17) % 23 - 11) / 10.0
            for d in range(PQ_DSUB)
        ]
        for c in range(PQ_KSUB)
    ]
    for j in range(PQ_M)
]


def _emb_pq_topk(spark, sf):
    """Product-quantization ADC top-k (operators/similarity.py::pq_topk,
    r5): vectors encoded to PQ_M nearest-subcentroid codes, pairs scored
    by m lookup-table reads — the 100 TB ANN format (m bytes/vector at
    rest, no float vectors in flight). Pinned codebooks make the whole
    pipeline (argmin encode, sub-inner-product LUT, ADC sum) exact
    deterministic arithmetic; the oracle re-derives every code and
    lookup in SQL and must hash-match."""
    from sparksearchengine_spark.operators.similarity import pq_topk

    emb = _read(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < PQ_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = pq_topk(emb, queries, _PQ_CB, k=PQ_K)
    return res.select(
        "query_id",
        "vec_id",
        F.round(F.col("score") + F.lit(0.0), 6).alias("score"),
        "rank",
    )


def _pq_recall(spark, sf):
    """Recall@k of trained PQ + exact re-rank vs exact cosine top-k,
    thresholded like ann_recall (booleans so benign centroid-init
    variance can't flip the oracle). Measured ~0.9+ at sf0.01 with
    m=8, ksub=8, rerank=8."""
    from sparksearchengine_spark.operators.recall import (
        labeled_recall_ok,
        topk_recall,
    )
    from sparksearchengine_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
        pq_train,
    )

    emb = _read(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < EMB_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=EMB_K)
    cbs = pq_train(emb, m=8, ksub=8, iters=3)
    approx = pq_topk(emb, queries, cbs, k=EMB_K, rerank=8)
    rec = topk_recall(approx, exact)
    return labeled_recall_ok("pq_topk", rec, 0.8)


def _text_readability(spark, sf):
    """Readability scores (operators/textstats.py::readability, r5):
    Flesch / Flesch-Kincaid over the FIXTURES §0 tokenizer with the
    vowel-group syllable heuristic — one scan-stage projection, exact
    ratio arithmetic mirrored in SQL."""
    from sparksearchengine_spark.operators.textstats import readability

    docs = _read(spark, sf, "documents")
    return readability(docs).orderBy("doc_id")


def _dedup_exact_prefer(spark, sf):
    """Quality-preferring exact dedup (operators/dedup.py::exact_dedup
    prefer=..., r5): the canonical row per duplicate group is the
    LONGEST capture (n_chars desc, id tie-break) — the RefinedWeb
    keep-the-best convention — instead of the min id. Same single
    hash-window shuffle."""
    from sparksearchengine_spark.operators.dedup import exact_dedup

    docs = _read(spark, sf, "documents")
    return exact_dedup(
        docs, ["text"], prefer=[F.col("n_chars").desc()]
    ).orderBy("doc_id")


def _dedup_edit_join(spark, sf):
    """Exact edit-distance similarity join (operators/dedup.py::
    edit_distance_join, r5): q-gram prefix filtering + short-string
    path + levenshtein verify over the distinct source tags (id = min
    doc_id per tag). The oracle is the brute-force all-pairs
    levenshtein — a hash match proves the filter lost no pair."""
    from sparksearchengine_spark.operators.dedup import (
        edit_distance_join,
        release_edit_join_caches,
    )

    docs = _read(spark, sf, "documents")
    vals = docs.groupBy("source").agg(F.min("doc_id").alias("doc_id"))
    res = edit_distance_join(vals, "source", threshold=1)
    # materialize the (small: pairs among distinct source tags) result,
    # then release the operator's prep cache — this wrapper runs in one
    # session with 140+ other registry queries and must not leak
    # cached blocks (r6 review)
    rows = res.select(
        "id_a", "id_b", F.col("dist").cast("long").alias("dist")
    ).orderBy("id_a", "id_b").collect()
    release_edit_join_caches()
    return spark.createDataFrame(rows, "id_a long, id_b long, dist long")


BDSL_K = 5
MT_K = 10  # batch_dsl_multiterm per-query depth


def _query_join_filters(spark, sf):
    """queryGenerator-style per-row filters in the query join
    (operators/search.py::query_join row_filters, r6; reference
    `SearchableRDD.scala:259-269` generates an arbitrary DslQuery per
    row): each query row of the qc15 slice additionally requires its
    matches to satisfy n_chars <= ITS OWN n_chars — the filter is a
    data join on the candidate aggregate, zero score contribution,
    applied before the rank window."""
    from sparksearchengine_spark.operators.search import query_join

    idx = _docs_index(spark, sf)
    docs = _read(spark, sf, "documents")
    other = docs.where(
        (F.col("doc_id") >= QC15_LO) & (F.col("doc_id") < QC15_HI)
    ).select("doc_id", "text", "n_chars")
    res = query_join(
        idx,
        other,
        text_col="text",
        field="text",
        k=QC15_K,
        other_id_col="doc_id",
        row_filters=[("n_chars", "<=", "n_chars")],
    )
    return res.select(
        F.col("doc_id").alias("query_id"),
        "match_doc_id",
        F.round("score", 6).alias("score"),
        "rank",
    )


QJD_LO2, QJD_HI2 = 100, 200


def _query_join_dsl(spark, sf):
    """Fully general E7 (operators/joindsl.py::query_join_dsl, r7;
    reference `SearchableRDD.scala:259-269` queryGenerator: U =>
    DslQuery): each row of `other` carries its OWN serialized query
    tree (plans/serde.py), shape-grouped EXECUTOR-side — six rows with
    structurally different queries (term, phrase, filtered matchAll,
    boolean-with-negation, same-filter-signature-different-values, and
    a wildcard) run in one call. The oracle recomputes each row's
    query independently in SQL and applies the same per-row rank
    window."""
    from sparksearchengine_spark.plans.serde import query_to_json

    idx = _docs_index(spark, sf)
    f = Q.field("text")
    queries = [
        (1, f.match_term(QC06_TERM)),
        (2, f.match_phrase(f"{QC09_W1} {QC09_W2}")),
        (
            3,
            f.match_all(*QC10_TERMS)
            & F_.ge("n_chars", QC28_LO)
            & F_.lt("n_chars", QC28_HI),
        ),
        (4, f.match_term(QC08_T1) & ~f.match_term(QC08_T2)),
        (
            5,
            f.match_term(QC06_TERM)
            & F_.ge("n_chars", QJD_LO2)
            & F_.lt("n_chars", QJD_HI2),
        ),
        (6, f.match_wildcard("du*")),
    ]
    qdf = spark.createDataFrame(
        [(i, query_to_json(q)) for i, q in queries],
        "query_id long, qjson string",
    )
    res = idx.query_join_dsl(
        qdf, "qjson", k=BDSL_K, other_id_col="query_id"
    )
    return (
        res.where(F.col("match_doc_id").isNotNull())
        .select(
            "query_id",
            F.col("match_doc_id").alias("doc_id"),
            F.round("score", 6).alias("score"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def _query_join_lucene(spark, sf):
    """The Lucene-syntax COLUMN path of the fully general E7
    (operators/joindsl.py::query_join_dsl syntax="lucene": per-row
    saved-search STRINGS parsed through the Q12 grammar ON THE
    EXECUTORS — reference `dsl/DslQuery.scala:122-128` QueryParser
    semantics, applied per data row instead of per driver call). Same
    six structurally different queries as `query_join_dsl`, expressed
    as query strings (bare term, quoted phrase, AND + mixed-bracket
    range, NOT, shared-signature range, wildcard), so the two entries
    share one oracle — pinning that executor-side parsing (escapes,
    default-field routing, bracket semantics on data) changes nothing
    about the results."""
    idx = _docs_index(spark, sf)
    strings = [
        (1, QC06_TERM),
        (2, f'"{QC09_W1} {QC09_W2}"'),
        (
            3,
            " AND ".join(QC10_TERMS)
            + f" AND n_chars:[{QC28_LO} TO {QC28_HI}}}",
        ),
        (4, f"{QC08_T1} AND NOT {QC08_T2}"),
        (5, f"{QC06_TERM} AND n_chars:[{QJD_LO2} TO {QJD_HI2}}}"),
        (6, "du*"),
    ]
    qdf = spark.createDataFrame(strings, "query_id long, qstr string")
    res = idx.query_join_dsl(
        qdf,
        "qstr",
        k=BDSL_K,
        other_id_col="query_id",
        syntax="lucene",
        default_field="text",
    )
    return (
        res.where(F.col("match_doc_id").isNotNull())
        .select(
            "query_id",
            F.col("match_doc_id").alias("doc_id"),
            F.round("score", 6).alias("score"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def _dedup_paragraphs(spark, sf):
    """Dolma-style cross-document paragraph dedup (operators/dedup.py::
    dedup_paragraphs, r6): first occurrence (min (doc, pos)) of each
    paragraph survives, whitespace-only paragraphs exempt, NULL text
    passes through. The documents table is single-paragraph, so the
    entry synthesizes a deterministic 3-paragraph layout per doc — a
    text prefix, a bucket-shared middle paragraph ('shared <id%7>',
    blank every 11th doc, the whole text NULL every 97th), and the
    SAME prefix again (within-doc dup). The oracle replays winner
    selection (min bid*2^32+pos per md5) and the ordered rebuild."""
    from sparksearchengine_spark.operators.dedup import dedup_paragraphs

    docs = _read(spark, sf, "documents")
    sep = "\n\n"
    p1 = F.substring("text", 1, 40)
    p2 = F.when(F.col("doc_id") % 11 == 0, F.lit(" ")).otherwise(
        F.concat(F.lit("shared "), (F.col("doc_id") % 7).cast("string"))
    )
    src = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 97 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat_ws(sep, p1, p2, p1))
        .alias("text"),
    )
    out = dedup_paragraphs(src, id_col="doc_id", text_col="text")
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        "n_paragraphs",
        "n_removed",
    ).orderBy("doc_id")


def _percolate_dsl(spark, sf):
    """Full-DSL percolation (operators/search.py::percolate_dsl, r6):
    which standing queries fire for which docs — ALL (query_id,
    doc_id, score) matches, no top-k window. The registry mixes a
    term, a phrase, and a filtered boolean; the oracle recomputes each
    query's complete match set in SQL and unions."""
    from sparksearchengine_spark.operators.search import percolate_dsl

    idx = _docs_index(spark, sf)
    f = Q.field("text")
    queries = [
        (1, f.match_term(QC06_TERM)),
        (2, f.match_phrase(f"{QC09_W1} {QC09_W2}")),
        (3, f.match_all(*QC10_TERMS) & F_.gt("doc_id", 100)),
    ]
    res = percolate_dsl(idx, queries)
    return res.select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
    ).orderBy("query_id", "doc_id")


def _batch_mixed_analyzer(spark, sf):
    """Mixed-analyzer batch search (operators/search.py::batch_search,
    r6; VERDICT r5 'What's missing' #2): one batch spans a
    simple-analyzed field (text) and a whitespace-analyzed field
    (source — case and punctuation preserved), one analysis branch per
    analyzer unioned into the shared plan. Query 3's 'SRC3' proves the
    case-preserving side: it matches nothing, while 'src19' does. The
    oracle rebuilds BOTH field pipelines (each with its own tokenizer
    and field stats) and the same per-query rank window."""
    docs = _read(spark, sf, "documents")
    idx = Corpus(
        docs,
        id_col="doc_id",
        text_cols={
            "text": TextOptions(analyzer="simple"),
            "source": TextOptions(analyzer="whitespace"),
        },
    ).build_index()
    qdf = spark.createDataFrame(
        [
            (1, " ".join(QC10_TERMS), "text"),
            (2, "src3 src7", "source"),
            (3, "SRC3 src19", "source"),
        ],
        "query_id long, qtext string, f string",
    )
    res = idx.batch_search(qdf, k=QC10_K, field_col="f")
    return res.select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
        "rank",
    ).orderBy("query_id", "rank")


def _batch_dsl_mixed(spark, sf):
    """Heterogeneous per-query DSL batch (operators/search.py::
    batch_search_dsl, r6) — the reference's batchSearch accepts ANY
    DslQuery per id (`SearchableRDD.scala:194-197`): here a term, a
    matchAll set, a phrase, and a boolean-with-negation run in ONE
    batch. Term-class queries collapse into a single data-driven
    postings join; the phrase and the boolean compile once each and
    union into the shared per-query rank window. The oracle recomputes
    each query independently in SQL and applies the same window."""
    idx = _docs_index(spark, sf)
    res = idx.batch_search_dsl(_bdsl_queries(), k=BDSL_K)
    return res.select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
        "rank",
    ).orderBy("query_id", "rank")


def _bdsl_queries():
    """The 5-shape heterogeneous batch shared by the batch_dsl_mixed and
    batch_dsl_per_k entries: term, matchAll, phrase, boolean-with-
    negation, range-filtered term."""
    f = Q.field("text")
    return [
        (1, f.match_term(QC06_TERM)),
        (2, f.match_all(*QC10_TERMS)),
        (3, f.match_phrase(f"{QC09_W1} {QC09_W2}")),
        (4, f.match_term(QC08_T1) & ~f.match_term(QC08_T2)),
        (
            5,
            f.match_term(QC06_TERM)
            & F_.ge("n_chars", QC28_LO)
            & F_.lt("n_chars", QC28_HI),
        ),
    ]


# per-query result depths for the batch_dsl_per_k entry (ids absent
# from the map ride the global k=BDSL_K)
BDSL_PER_K = {1: 3, 3: 1, 5: 8}


def _batch_dsl_per_k(spark, sf):
    """Per-query k in the DSL batch (operators/search.py::
    batch_search_dsl k_by_query=, the batch_search k_col analog for
    arbitrary ASTs): the same 5-shape batch as batch_dsl_mixed with
    three queries at their own depths. One rank window runs at the max
    depth; per-query limits apply as a broadcast map join on the
    k-bounded rows. Oracle = batch_dsl_mixed's SQL with the rank limit
    swapped for the matching CASE."""
    idx = _docs_index(spark, sf)
    res = idx.batch_search_dsl(
        _bdsl_queries(), k=BDSL_K, k_by_query=BDSL_PER_K
    )
    return res.select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
        "rank",
    ).orderBy("query_id", "rank")


def _search_synonyms(spark, sf):
    """Query-time synonym expansion (plans/ast.py::expand_synonyms,
    r5): matchTerm('dup') under the mapping dup->spark rewrites to
    exactly qc10's matchAny(dup, spark), so the oracle IS qc10's SQL —
    a hash match proves the rewrite is execution-equivalent to the
    hand-written query, scores included."""
    from sparksearchengine_spark.plans.ast import expand_synonyms

    idx = _docs_index(spark, sf)
    q = expand_synonyms(
        Q.field("text").match_term(QC10_TERMS[0]),
        {QC10_TERMS[0]: [QC10_TERMS[1]]},
    )
    res = idx.search(q, k=QC10_K)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )


TV_DOC = 7
MLT_TEXT = "dup dup spark merge filter"
MLT_NT = 3


def _term_vector(spark, sf):
    """Per-doc term vector (operators/stats.py::term_vector, r5) —
    Lucene getTermVector: one postings filter, no text re-analysis.
    Positions excluded from the driver row (array column; the canon
    rejects them) — exercised in pytest instead."""
    from sparksearchengine_spark.operators.stats import term_vector

    idx = _docs_index(spark, sf)
    return term_vector(idx, TV_DOC, field="text").select(
        "field", "term", "tf", "dl"
    )


def _search_mlt_text(spark, sf):
    """MoreLikeThis over free text (operators/search.py::
    more_like_this_text, r5): analyze the like-text, keep its MLT_NT
    top tf-idf terms against corpus stats (6dp-rounded, term-asc
    tie-break — reproducible cross-engine), match_any BM25 top-10. The
    oracle recomputes the keyword selection AND the search in SQL."""
    from sparksearchengine_spark.operators.search import more_like_this_text

    idx = _docs_index(spark, sf)
    res = more_like_this_text(
        idx, MLT_TEXT, "text", k=QC10_K, num_terms=MLT_NT
    )
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )


COLLAPSE_K = 5


def _search_collapse(spark, sf):
    """Field collapsing (operators/search.py::collapse_results, r5):
    Elasticsearch-collapse semantics — best hit per source over the
    qc10 BM25 pool (LIMIT 50), then global top-COLLAPSE_K re-ranked.
    Rounded scores order both sides."""
    from sparksearchengine_spark.operators.search import collapse_results

    idx = _docs_index(spark, sf)
    res = idx.search(
        Q.field("text").match_any(*QC10_TERMS),
        k=50,
        with_elements=True,
        select_cols=["source"],
    )
    hits = res.select(
        "doc_id", "source", F.round("score", 6).alias("score")
    )
    return collapse_results(hits, "source", k=COLLAPSE_K)


MAXP_POOL = 50


def _search_maxp(spark, sf):
    """maxP long-document retrieval (operators/search.py::
    passage_to_doc, r5): documents chunked (`chunk_documents`, the
    driver-green chunking), a fresh BM25 index built over the CHUNKS
    (composite id doc*1000+chunk), top-MAXP_POOL passages retrieved,
    then each parent doc scored by its best passage — the BERT-maxP
    convention. The oracle rebuilds the whole chunk index in SQL."""
    from sparksearchengine_spark.operators.chunking import chunk_documents
    from sparksearchengine_spark.operators.search import passage_to_doc

    docs = _read(spark, sf, "documents")
    ch = chunk_documents(
        docs, max_tokens=CHUNK_MAX, overlap=CHUNK_OVERLAP
    )
    # composite id: runtime guard against >=1000 chunks/doc, where
    # d*1000+1000 would collide with doc d+1's chunk 0 (r5 review) —
    # impossible at our doc lengths, loud if the data ever changes
    chunks = ch.select(
        F.when(
            F.col("chunk_id") < 1000,
            F.col("doc_id") * 1000 + F.col("chunk_id"),
        )
        .otherwise(
            F.raise_error(
                F.lit("search_maxp: >=1000 chunks in one doc; widen the "
                      "composite-id multiplier")
            ).cast("long")
        )
        .alias("cid"),
        "chunk_text",
    )
    idx = Corpus(
        chunks,
        id_col="cid",
        text_cols={"chunk_text": TextOptions(analyzer="simple")},
    ).build_index(persist=False)
    res = idx.search(
        Q.field("chunk_text").match_any(*QC10_TERMS), k=MAXP_POOL
    )
    hits = res.select(
        F.col("doc_id").alias("cid"),  # index id col = the composite cid
        F.round("score", 6).alias("score"),
    ).withColumn("doc_id", F.floor(F.col("cid") / 1000).cast("long"))
    return passage_to_doc(hits, k=QC10_K)


DECAY_SCALE = 30.0


def _search_decay(spark, sf):
    """Recency-decay re-ranking (functions/scoring.py::decay_expr, r5):
    the function_score-style exp decay every search engine ships —
    BM25 top-k multiplied by decay**(age/scale) and re-ranked. Age is
    the deterministic doc_id % 100 (documents carry no timestamp);
    products computed from the 6dp-rounded score on both sides so the
    pow() arithmetic is bit-comparable."""
    from sparksearchengine_spark.functions.scoring import decay_expr

    idx = _docs_index(spark, sf)
    res = idx.search(Q.field("text").match_any(*QC10_TERMS), k=QC10_K)
    aged = res.select(
        "doc_id",
        F.round("score", 6).alias("score"),
        (F.col("doc_id") % 100).cast("double").alias("_age"),
    )
    d = F.round(
        F.col("score") * decay_expr(F.col("_age"), DECAY_SCALE), 6
    )
    w = Window.orderBy(F.desc("dscore"), F.asc("doc_id"))
    return (
        aged.withColumn("dscore", d)
        .withColumn("rank", F.row_number().over(w))
        .select("doc_id", "score", "dscore", "rank")
    )


def _corpus_diff(spark, sf):
    """Snapshot diff (operators/weburl.py::corpus_diff, r5): old = the
    upsert entry's base corpus, new = its post-CDC corpus — the diff
    must report exactly the delta that was applied (removed 5/10,
    changed >= UPSERT_LO, added to UPSERT_HI). Hash-compare only; raw
    text never joins."""
    from sparksearchengine_spark.operators.weburl import corpus_diff

    docs = _read(spark, sf, "documents")
    old = docs.where(F.col("doc_id") < 400)
    new = (
        docs.where(F.col("doc_id") < UPSERT_HI)
        .where(~F.col("doc_id").isin(*UPSERT_DELS))
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") >= UPSERT_LO,
                F.concat(F.col("text"), F.lit(" upserted extra")),
            ).otherwise(F.col("text")),
        )
    )
    return corpus_diff(old, new, compare_cols=["text"]).orderBy("doc_id")


HY_TERMS = ("merge", "filter")


def _search_hybrid_rrf(spark, sf):
    """Reciprocal-rank fusion (operators/search.py::rrf_fuse, r5): the
    standard hybrid-search combiner — two ranked lists (BM25 top-10 for
    two different term sets here; lexical+vector in production) fused by
    sum of w/(k_rrf + rank), which needs no score calibration between
    sources. Decimal-summed, so the fused scores are bit-stable and the
    oracle reproduces them exactly."""
    from sparksearchengine_spark.operators.search import rrf_fuse

    idx = _docs_index(spark, sf)
    r1 = idx.search(Q.field("text").match_any(*QC10_TERMS), k=QC10_K)
    r2 = idx.search(Q.field("text").match_any(*HY_TERMS), k=QC10_K)
    return rrf_fuse([r1, r2], k=QC10_K, k_rrf=60).select(
        "doc_id", "rrf_score", "rank"
    )


HN_LO, HN_HI, HN_K = 0.1, 0.99, 5


def _emb_hard_negatives(spark, sf):
    """Hard-negative mining (similarity.py::hard_negatives, r5): per
    anchor the top-k items with cosine in [HN_LO, HN_HI) — informative
    negatives for contrastive training, near-dup band (and self at
    cos 1) excluded. Brute-force path here (exact oracle); the scale
    path plugs an ANN candidate frame."""
    from sparksearchengine_spark.operators.similarity import hard_negatives

    emb = _read(spark, sf, "embeddings")
    anchors = emb.where(F.col("vec_id") < EMB_NQ).select(
        F.col("vec_id").alias("anchor_id"), "embedding"
    )
    res = hard_negatives(emb, anchors, k=HN_K, lo=HN_LO, hi=HN_HI)
    return res.select(
        "anchor_id",
        "vec_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        "rank",
    )


def _ivfpq_recall(spark, sf):
    """Recall@k of the durable residual IVF-PQ layout (similarity.py::
    ivfpq_build/ivfpq_search, r5) vs exact cosine top-k — the composed
    FAISS-IndexIVFPQ design: partition-pruned coarse probes + m-byte
    residual codes + exact re-rank of the ADC survivors. Thresholded
    boolean like ann_recall/pq_recall (training is deterministic but
    recall depends on data geometry; the bar is the contract)."""
    import tempfile

    from sparksearchengine_spark.operators.recall import (
        labeled_recall_ok,
        topk_recall,
    )
    from sparksearchengine_spark.operators.similarity import (
        cosine_topk,
        ivfpq_build,
        ivfpq_search,
    )

    emb = _read(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < EMB_NQ).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=EMB_K)
    # small training budget on purpose (driver-slot wall-clock): the
    # exact re-rank of 8*k ADC survivors carries the recall bar, so
    # coarse codebooks are fine here; the pytest case runs the m=8 size
    path = tempfile.mkdtemp(prefix="ivfpq_qc_")
    ivfpq_build(emb, path, n_clusters=8, m=4, ksub=8, iters=2)
    approx = ivfpq_search(
        spark, path, queries, k=EMB_K, nprobe=4, rerank=8
    )
    rec = topk_recall(approx, exact)
    return labeled_recall_ok("ivfpq_topk", rec, 0.8)


UPSERT_LO, UPSERT_HI = 350, 450
UPSERT_DELS = (5, 10)


def _index_upsert(spark, sf):
    """Incremental index maintenance (operators/index.py::upsert_index,
    r5): fold a CDC delta — 100 replaced/new docs with edited text plus
    2 deletes — into a base index WITHOUT re-tokenizing the base corpus
    (the reference's Lucene shards are rebuild-only,
    `PartitionsIndexLuceneRDD.scala:588-593`). Global stats (df, dl,
    avgdl) are recomputed from the merged postings, so the qc10-style
    BM25 top-10 run here must hash-match DuckDB scoring the post-CDC
    corpus built from scratch — the exactness claim, checked end-to-end."""
    from sparksearchengine_spark.operators.index import upsert_index

    docs = _read(spark, sf, "documents")
    base = Corpus(
        docs.where(F.col("doc_id") < 400),
        id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="simple", positions=True)},
    ).build_index(persist=False)
    changes = docs.where(
        (F.col("doc_id") >= UPSERT_LO) & (F.col("doc_id") < UPSERT_HI)
    ).withColumn("text", F.concat(F.col("text"), F.lit(" upserted extra")))
    up = upsert_index(
        base, changes, deletes=list(UPSERT_DELS), persist=False
    )
    res = up.search(Q.field("text").match_any(*QC10_TERMS), k=QC10_K)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def _lm_index(spark, sf, similarity: str):
    """LM-similarity index over documents.text (not the shared BM25
    cache — the scoring config differs)."""
    from sparksearchengine_spark.functions.scoring import ScoringConfig

    docs = _read(spark, sf, "documents")
    return Corpus(
        docs, id_col="doc_id",
        text_cols={"text": TextOptions(analyzer="simple", positions=True)},
    ).build_index(scoring=ScoringConfig(similarity=similarity))


def _search_lmd(spark, sf):
    """LM-Dirichlet top-k (functions/scoring.py::lmd_term_score, Lucene
    LMDirichletSimilarity semantics: +1-smoothed collection probability,
    clamp-at-zero). Exercises the lazily-built collection_stats (cf_t)
    join in SearchIndex.scored_postings. Reference analog: any Lucene
    Similarity is configurable (`LuceneConfig.scala:131-144`)."""
    idx = _lm_index(spark, sf, "lmd")
    res = idx.search(Q.field("text").match_any(*QC10_TERMS), k=QC10_K)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )


def _search_lmjm(spark, sf):
    """LM Jelinek-Mercer top-k (functions/scoring.py::lmjm_term_score,
    Lucene LMJelinekMercerSimilarity, lambda=0.7)."""
    idx = _lm_index(spark, sf, "lmjm")
    res = idx.search(Q.field("text").match_any(*QC10_TERMS), k=QC10_K)
    return res.select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )


SPELL_NQ = 25  # queries = docs 0..24 with >= 3 tokens
SPELL_C = 5    # candidates per position
import math as _math

SPELL_EDITP = _math.log(0.05)


def _spell_correct(spark, sf):
    """Batch noisy-channel spelling correction (operators/spelling.py::
    correct_queries — ES phrase-suggester / Lucene DirectSpellChecker
    analog as a distributed Viterbi). Queries: the first 3 tokens of
    each document (doc_id < SPELL_NQ, >= 3 tokens) with the middle
    token mangled by an appended 'x' (one deterministic edit); the
    corrector must undo it from vocabulary + bigram context."""
    idx = _docs_index(spark, sf)
    from sparksearchengine_spark.functions.analyzers import analyzer_expr
    from sparksearchengine_spark.operators.spelling import correct_queries

    docs = _read(spark, sf, "documents")
    toks = analyzer_expr(F.col("text"), "simple")
    qdf = (
        docs.where(F.col("doc_id") < SPELL_NQ)
        .select(F.col("doc_id").alias("query_id"), toks.alias("_t"))
        .where(F.size("_t") >= 3)
        .select(
            "query_id",
            F.concat_ws(
                " ",
                F.element_at("_t", 1),
                F.concat(F.element_at("_t", 2), F.lit("x")),
                F.element_at("_t", 3),
            ).alias("qtext"),
        )
    )
    out = correct_queries(
        idx, qdf, max_dist=1, max_candidates=SPELL_C, k=1
    )
    return out.select(
        "query_id", "corrected", "score", "n_edits", "changed"
    )


# --------------------------------------------------------------------------
# r10 driver oracles for the r9-new operator families (VERDICT r9 #1 —
# the registry freeze is verdict-lifted for exactly these entries)
# --------------------------------------------------------------------------

# events-derived modular link graph: 40 nodes, ~1.5k distinct edges at
# sf0.01 — small enough that double sums stay ~1e-14 of each other
# across engines (safe at the 6dp rounding), large enough to exercise
# dangling mass and every join in the iteration. The WCC variant keeps
# only equal-residue-mod-4 edges, guaranteeing >= 4 components.
LG_N = 40
LG_ITER = 5
LG_DAMP = 0.85
# synthetic deterministic classifier columns over documents: label from
# doc_id parity, score = ((n_chars % 50) + 25*label) / 100 — overlapping
# classes, ~74 distinct scores (plenty of ties for the midrank path)
CLS_THRESH = 0.5
EXPORT_SEED = 7  # epoch-shuffle seed for the portable md5 shard oracle


def _lg_edges_df(spark, sf, wcc: bool = False):
    ev = _read_events(spark, sf)
    e = ev.select(
        (F.col("user_id") % LG_N).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % LG_N).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    if wcc:
        e = e.where((F.col("src") % 4) == (F.col("dst") % 4))
    return e.distinct()


def _pagerank(spark, sf):
    """PageRank (operators/linkgraph.py::pagerank, r9) at a FIXED
    iteration count with tol=None so the oracle (an unrolled 5-step
    power iteration in DuckDB) computes the identical damped/dangling
    recursion; ranks rounded to 6dp on both sides."""
    from sparksearchengine_spark.operators.linkgraph import pagerank

    e = _lg_edges_df(spark, sf)
    r = pagerank(
        e, damping=LG_DAMP, iterations=LG_ITER, tol=None, dedup_edges=False
    )
    return r.select("node", F.round("rank", 6).alias("rank")).orderBy("node")


def _hits(spark, sf):
    """HITS hubs/authorities (operators/linkgraph.py::hits, r9), fixed
    5 iterations with per-step L2 normalization — oracle unrolls the
    same recursion (sqrt/sum/coalesce in the same expression shapes)."""
    from sparksearchengine_spark.operators.linkgraph import hits

    e = _lg_edges_df(spark, sf)
    h = hits(e, iterations=LG_ITER, tol=None, dedup_edges=False)
    return h.select(
        "node",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    ).orderBy("node")


def _weak_components(spark, sf):
    """Weakly connected components (operators/linkgraph.py::
    weakly_connected_components, r9 — pointer-jumping min-label CC over
    xxhash64 ids). The component label is an ARBITRARY member node
    (min-hash order is engine-specific), so the wrapper canonicalizes
    to min(node) per component — the same labeling the DuckDB
    recursive-CTE reachability oracle produces directly."""
    from sparksearchengine_spark.operators.linkgraph import (
        weakly_connected_components,
    )

    e = _lg_edges_df(spark, sf, wcc=True)
    comp = weakly_connected_components(e, "src", "dst")
    canon = comp.groupBy("component").agg(F.min("node").alias("_lbl"))
    return (
        comp.join(canon, "component")
        .select("node", F.col("_lbl").alias("component"))
        .orderBy("node")
    )


def _domain_pagerank(spark, sf):
    """Domain-collapsed PageRank (operators/linkgraph.py::
    domain_pagerank, r10; first driver oracle r11): page-level outlink
    URLs built deterministically from events (several pages per
    domain, so the registered-domain collapse + domain-pair dedup do
    real work: ~10k URL edges -> <=1.5k domain edges over 40 domains),
    then the same fixed-iteration recursion as the `pagerank` entry —
    the oracle reconstructs the domain directly from the same integer
    arithmetic and reuses the unrolled power-iteration SQL with
    string-domain nodes."""
    from sparksearchengine_spark.operators.linkgraph import domain_pagerank

    ev = _read_events(spark, sf)
    d = F.col("user_id") % LG_N
    o = (F.col("user_id") * 7 + F.col("event_id")) % LG_N
    links = ev.select(
        F.concat(
            F.lit("http://d"), d.cast("string"), F.lit(".example/p"),
            (F.col("event_id") % 5).cast("string"),
        ).alias("target_uri"),
        F.concat(
            F.lit("http://d"), o.cast("string"), F.lit(".example/q"),
            (F.col("event_id") % 3).cast("string"),
        ).alias("outlink"),
    )
    r = domain_pagerank(links, damping=LG_DAMP, iterations=LG_ITER, tol=None)
    return r.select(
        "domain", F.round("rank", 6).alias("rank")
    ).orderBy("domain")


def _rank_pages(spark, sf):
    """Page-level rank transfer (operators/linkgraph.py::rank_pages,
    r10; first driver oracle r11): messy page URLs (upper scheme, www.,
    default port — the url_host strip rules all fire) collapse to
    's<doc_id%7>.example', left-joined against a 5-domain rank table on
    the probed broadcast ladder; unranked domains take default_rank.
    The oracle reconstructs the registered domain from the same doc_id
    arithmetic and joins a VALUES table (ranks are exact binary
    fractions, so the doubles are bit-identical across engines)."""
    from sparksearchengine_spark.operators.linkgraph import rank_pages

    docs = _read(spark, sf, "documents")
    corpus = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.h"), (F.col("doc_id") % 25).cast("string"),
            F.lit(".s"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".Example:80/p"), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    ranks = spark.createDataFrame(
        [(f"s{i}.example", (i + 1) / 8.0) for i in range(5)],
        "domain string, rank double",
    )
    out = rank_pages(corpus, ranks, url_col="url", default_rank=0.0)
    return out.select("doc_id", "domain_rank").orderBy("doc_id")


def _cls_frame(spark, sf):
    docs = _read(spark, sf, "documents")
    return docs.select(
        (F.col("doc_id") % 2).cast("int").alias("label"),
        (
            ((F.col("n_chars") % 50) + F.lit(25) * (F.col("doc_id") % 2))
            .cast("double") / F.lit(100.0)
        ).alias("score"),
    )


def _classification_metrics(spark, sf):
    """Binary-classifier eval (operators/evaluate.py::
    classification_metrics, r9): confusion at 0.5 plus tie-exact
    midrank ROC-AUC and step-function average precision, all from one
    distinct-score grouped pass — the oracle replicates the grouped
    cumulative shape with window SQL and the same decimal-summed
    accumulators."""
    from sparksearchengine_spark.operators.evaluate import (
        classification_metrics,
    )

    return classification_metrics(_cls_frame(spark, sf), threshold=CLS_THRESH)


def _pr_curve(spark, sf):
    """Threshold sweep (operators/evaluate.py::pr_curve, r9): one row
    per distinct score with kept/precision/recall/f1 — the descending
    cumulative mirror of classification_metrics' grouped frame."""
    from sparksearchengine_spark.operators.evaluate import pr_curve

    return pr_curve(_cls_frame(spark, sf)).orderBy("threshold")


def _export_shard_shuffle(spark, sf):
    """Epoch-shuffled shard assignment (operators/export.py::
    shard_assignments(shuffle_seed=, seed_hash='md5'), r9/r10): the
    portable md5-bucket idiom with the seed folded into the key string
    — byte-reproducible in DuckDB (xxhash64 mode has no DuckDB twin and
    stays covered by the determinism pytest)."""
    from sparksearchengine_spark.operators.export import shard_assignments

    docs = _read(spark, sf, "documents")
    return (
        shard_assignments(
            docs,
            num_shards=EXPORT_SHARDS,
            shuffle_seed=EXPORT_SEED,
            seed_hash="md5",
        )
        .select("doc_id", "shard")
        .orderBy("doc_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract: the driver emits CORRECTNESS rows for the FIRST 50
    # keys only.  Slots 1-30 are pinned to the SURVEY §2.10 qc suite;
    # slots 31-50 rotate each round.  r11 rotation (VERDICT r10 "Next
    # round" #3 — the freeze is verdict-lifted for EXACTLY the two
    # named r10-new operators, zero other new entries): slots 31-32 are
    # rank_pages / domain_pagerank, giving the last two linkgraph
    # operators their first driver rows (registered-domain VALUES-join
    # oracle; string-domain unrolled power-iteration oracle).  Slots
    # 33-50 re-verify what r11 code touched plus the standing
    # heavy-machinery riders: pagerank / hits /
    # weakly_connected_components (linkgraph.py rank_pages-materialize
    # change), export_shard_shuffle / export_shard_assign (export.py
    # NULL-key seeded-hash fix), dedup_edit_join (dedup.py import
    # regroup), then classification_metrics / pr_curve / query_join_dsl
    # / percolate_dsl / percolate_match / doc_keywords / more_like_this
    # / search_eval / search_eval_summary / select_budget / pack_chunks
    # / vocab_top (distributed_prefix + probed-broadcast riders, per
    # the standing rotation-hygiene discipline).  The displaced r10
    # rotation rows (text_ppl_buckets, collocations_pmi — both green in
    # CORRECTNESS_r10) move past the cutoff.  The only registry keys
    # without an all-time hash row are the 6 that cannot have one by
    # design (text_compress_ratio — no DuckDB zlib — and the 5
    # probabilistic LSH/ANN entries whose correctness story is the
    # driver-green recall gates).  text_compress_ratio stays parked
    # PERMANENTLY at the very end (VERDICT r7 #3): it can never
    # hash-match — rows-only by design, thresholds pytest-pinned.
    return {
        "qc01_filter_eq": _qc01,
        "qc02_filter_cmp": _qc02,
        "qc03_filter_range_date": _qc03,
        "qc04_filter_inset": _qc04,
        "qc05_filter_null": _qc05,
        "qc06_match_term": _qc06,
        "qc07_match_termset": _qc07,
        "qc08_bool_algebra": _qc08,
        "qc09_match_phrase": _qc09,
        "qc10_bm25_topk": _qc10,
        "qc11_batch_search": _qc11,
        "qc12_index_stats": _qc12,
        "qc13_doc_lookup": _qc13,
        "qc14_bm25_components": _qc14,
        "qc15_query_join": _qc15,
        "qc16_parsed_boost": _qc16,
        "qc17_wildcard_fuzzy": _qc17,
        "qc18_batch_k_col": _qc18,
        "qc19_bucketed_term": _qc19,
        "qc20_saved_index": _qc20,
        "qc21_search_elements": _qc21,
        "qc22_match_alltext": _qc22,
        "qc23_query_join_idpath": _qc23,
        "qc24_batch_shuffle_hash": _qc24,
        "qc25_raw_query": _qc25,
        "qc26_phrase_slop": _qc26,
        "qc27_doc_bucket_lookup": _qc27,
        "qc28_exclusive_range": _qc28,
        "qc29_escaped_term": _qc29,
        "qc30_regex_term": _qc30,
        # ---- slot 31: NEW r12 entry (freeze lifted, VERDICT r11 #4 —
        # the capped-candidate-count oracle on a synthetic mega-bucket
        # corpus; closed-form DuckDB expectation from the cluster size)
        "dedup_bucket_cap": _dedup_bucket_cap,
        # ---- slots 32-50: re-verification rotation — r12 touched the
        # LSH candidate builders (bucket cap: minhash/simhash/cross-
        # corpus/emb paths) and linkgraph's pin machinery (_make_pin
        # warning + rank_pages pin memo), so the dedup oracle family
        # and the full linkgraph family re-verify, plus the standing
        # heavy riders (query_join_dsl, percolator, index_upsert).
        # Probabilistic dedup rows (dedup_minhash_lsh, dedup_simhash,
        # emb LSH) stay gated by the dedup_recall/ann_recall rows here.
        "dedup_exact": _dedup_exact,
        "dedup_ngram_jaccard": _dedup_ngram_jaccard,
        "dedup_minhash_canon": _dedup_minhash_canon,
        "dedup_recall": _dedup_recall,
        "ann_recall": _ann_recall,
        "dedup_crossgram": _dedup_crossgram,
        "dedup_cross_ngram": _dedup_cross_ngram,
        "dedup_paragraphs": _dedup_paragraphs,
        "dedup_edit_join": _dedup_edit_join,
        "dedup_exact_prefer": _dedup_exact_prefer,
        "rank_pages": _rank_pages,
        "domain_pagerank": _domain_pagerank,
        "pagerank": _pagerank,
        "hits": _hits,
        "weakly_connected_components": _weak_components,
        "query_join_dsl": _query_join_dsl,
        "percolate_dsl": _percolate_dsl,
        "percolate_match": _percolate_match,
        "index_upsert": _index_upsert,
        # ---- past the driver cutoff (all driver-green in r8-r11;
        # the r11 rotation rows displaced by r12's queue sit first)
        "export_shard_shuffle": _export_shard_shuffle,
        "export_shard_assign": _export_shard_assign,
        "classification_metrics": _classification_metrics,
        "pr_curve": _pr_curve,
        "doc_keywords": _doc_keywords,
        "more_like_this": _more_like_this,
        "search_eval": _search_eval,
        "search_eval_summary": _search_eval_summary,
        "select_budget": _select_budget,
        "pack_chunks": _pack_chunks,
        "vocab_top": _vocab_top,
        "text_ppl_buckets": _text_ppl_buckets,
        "collocations_pmi": _collocations,
        "text_hash_embed_arrow": _text_hash_embed_arrow,
        "strip_html": _strip_html,
        "search_highlight": _search_highlight,
        "search_facets": _search_facets,
        "search_paged": _search_paged,
        "search_grouped": _search_grouped,
        "bigram_quality": _bigram_quality,
        "url_domain_block": _url_domain_block,
        "search_after_page": _search_after_page,
        "batch_mixed_analyzer": _batch_mixed_analyzer,
        "classifier_score": _classifier_score,
        "classifier_vocab": _classifier_vocab,
        "text_hash_embed": _text_hash_embed,
        "text_tfidf_embed": _text_tfidf_embed,
        "batch_dsl_mixed": _batch_dsl_mixed,
        "query_join_lucene": _query_join_lucene,
        "search_lmd": _search_lmd,
        "search_lmjm": _search_lmjm,
        "curation_report": _curation_report,
        "sample_per_group": _sample_per_group,
        "clean_text": _clean_text,
        "emb_quantize": _emb_quantize,
        "events_hourly_windowed": _events_hourly_windowed,
        "events_trending": _events_trending,
        "emb_semdedup": _emb_semdedup,
        "mixture_repeats": _mixture_repeats,
        "doc_winnow": _doc_winnow,
        "lang_id": _lang_id,
        "mm_image_features": _mm_image_features,
        "search_explain": _search_explain,
        "search_rescore": _search_rescore,
        "batch_dsl_per_k": _batch_dsl_per_k,
        "search_facet_metrics": _search_facet_metrics,
        "text_entropy": _text_entropy,
        "text_dedup_lines": _text_dedup_lines,
        "search_multi_match": _search_multi_match,
        "mixture_temperature": _mixture_temperature,
        "batch_dsl_multiterm": _batch_dsl_multiterm,
        "text_dict_tag": _text_dict_tag,
        "spell_correct": _spell_correct,
        "emb_pq_topk": _emb_pq_topk,
        "pq_recall": _pq_recall,
        "ivfpq_recall": _ivfpq_recall,
        "emb_hard_negatives": _emb_hard_negatives,
        "text_readability": _text_readability,
        "search_hybrid_rrf": _search_hybrid_rrf,
        "corpus_diff": _corpus_diff,
        "search_decay": _search_decay,
        "search_maxp": _search_maxp,
        "search_collapse": _search_collapse,
        "term_vector": _term_vector,
        "search_mlt_text": _search_mlt_text,
        "search_synonyms": _search_synonyms,
        "query_join_filters": _query_join_filters,
        "table_profile": _table_profile,
        "table_profile_grouped": _table_profile_grouped,
        "events_props": _events_props,
        "decontam_embedding": _decontam_embedding,
        "dedup_boilerplate": _dedup_boilerplate,
        "dedup_spans": _dedup_spans,
        "dedup_winnow_pairs": _dedup_winnow_pairs,
        "emb_kmeans_assign": _emb_kmeans_assign,
        "emb_semdedup_arrow": _emb_semdedup_arrow,
        "mixture_sample": _mixture_sample,
        "emb_random_proj": _emb_random_proj,
        "sketch_profile": _sketch_profile,
        "events_sessionize": _events_sessionize,
        "url_latest": _url_latest,
        "dsir_sample": _dsir_sample,
        "text_gopher": _text_gopher,
        "text_c4": _text_c4,
        "decontam_bloom": _decontam_bloom,
        "search_prf": _search_prf,
        "search_sigterms": _search_sigterms,
        "table_histogram": _table_histogram,
        "table_skew": _table_skew,
        "chunk_sentences": _chunk_sentences,
        "search_bm25f": _search_bm25f,
        "search_facet_cube": _search_facet_cube,
        "search_mmr": _search_mmr,
        "search_near": _search_near,
        "search_merged_index": _search_merged_index,
        "search_suggest": _search_suggest,
        "search_complete": _search_complete,
        "table_corr": _table_corr,
        "events_asof": _events_asof,
        "events_resample": _events_resample,
        "url_normalize": _url_normalize,
        "dsir_weights": _dsir_weights,
        "dedup_minhash_lsh": _dedup_minhash_lsh,
        "dedup_simhash": _dedup_simhash,
        "dedup_emb_exact": _dedup_emb_exact,
        "dedup_emb_lsh": _dedup_emb_lsh,
        "emb_cosine_topk": _emb_cosine_topk,
        "emb_cosine_topk_arrow": _emb_cosine_topk_arrow,
        "emb_lsh_topk": _emb_lsh_topk,
        "emb_ivf_topk": _emb_ivf_topk,
        "text_quality": _text_quality,
        "text_repetition": _text_repetition,
        "pii_scrub": _pii_scrub,
        "sample_stratified": _sample_stratified,
        "train_test_split": _train_test_split,
        "decontam_ngram": _decontam_ngram,
        "unigram_quality": _unigram_quality,
        "chunk_docs": _chunk_docs,
        "doc_fingerprint": _doc_fingerprint,
        "events_hourly": _events_hourly,
        "token_stats": _token_stats,
        "text_compress_ratio": _text_compress_ratio,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB) — same semantics, same expression shapes
# --------------------------------------------------------------------------


def _profile_oracle_sql() -> str:
    """DuckDB replication of `operators/profile.py::profile_columns` over
    PROFILE_COLS — same single aggregate, same exact-decimal sums, same
    ISO timestamp formatting; one UNION ALL branch per column."""
    num = {"l_quantity", "l_extendedprice", "l_discount"}
    ts = {"l_shipdate"}
    aggs = ["count(*) AS n"]
    for c in PROFILE_COLS:
        # CAST: bare sum() is HUGEINT in DuckDB -> float64 through the
        # driver's pandas canon, while Spark's bigint stays int64.
        aggs.append(
            f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS nl_{c}"
        )
        aggs.append(f"count(DISTINCT {c}) AS nd_{c}")
        if c in num:
            aggs.append(f"CAST(min({c}) AS DOUBLE) AS mn_{c}")
            aggs.append(f"CAST(max({c}) AS DOUBLE) AS mx_{c}")
            aggs.append(
                f"CAST(sum(CAST({c} AS DECIMAL(28,6))) AS DOUBLE) AS sm_{c}"
            )
        elif c in ts:
            aggs.append(
                f"strftime(min({c}), '%Y-%m-%d %H:%M:%S') AS mns_{c}"
            )
            aggs.append(
                f"strftime(max({c}), '%Y-%m-%d %H:%M:%S') AS mxs_{c}"
            )
        else:
            aggs.append(f"min({c}) AS mns_{c}")
            aggs.append(f"max({c}) AS mxs_{c}")
    branches = []
    for c in PROFILE_COLS:
        if c in num:
            dtype, mn, mx, sm = "double", f"mn_{c}", f"mx_{c}", f"sm_{c}"
            mean = (
                f"CASE WHEN n - nl_{c} > 0 "
                f"THEN sm_{c} / CAST(n - nl_{c} AS DOUBLE) END"
            )
            mns = mxs = "CAST(NULL AS VARCHAR)"
        else:
            dtype = "timestamp_ntz" if c in ts else "string"
            mn = mx = sm = mean = "CAST(NULL AS DOUBLE)"
            mns, mxs = f"mns_{c}", f"mxs_{c}"
        branches.append(
            f"SELECT '{c}' AS \"column\", '{dtype}' AS dtype, n AS n_rows,"
            f" nl_{c} AS n_null, nd_{c} AS n_distinct, {mn} AS min_num,"
            f" {mx} AS max_num, {sm} AS sum_num, {mean} AS mean_num,"
            f" {mns} AS min_str, {mxs} AS max_str FROM a"
        )
    return (
        "WITH a AS (SELECT " + ", ".join(aggs) + " FROM lineitem) "
        + " UNION ALL ".join(branches)
        + ' ORDER BY "column"'
    )


# shared edge derivations for the link-graph oracles — identical
# modular arithmetic on both engines (int64 %, sign of dividend; all
# values non-negative here)
_LG_EDGE_SQL = (
    f"SELECT DISTINCT user_id % {LG_N} AS src, "
    f"(user_id * 7 + event_id) % {LG_N} AS dst FROM events "
    f"WHERE user_id % {LG_N} != (user_id * 7 + event_id) % {LG_N}"
)
_LG_WCC_EDGE_SQL = (
    _LG_EDGE_SQL
    + f" AND (user_id % {LG_N}) % 4 = ((user_id * 7 + event_id) % {LG_N}) % 4"
)
# domain_pagerank entry (r11): the registered-domain collapse of the
# deterministic page URLs `_domain_pagerank` builds — reconstructed
# from the SAME integer arithmetic, so the oracle never parses a URL
_DPR_EDGE_SQL = (
    f"SELECT DISTINCT 'd' || CAST(user_id % {LG_N} AS VARCHAR) "
    f"|| '.example' AS src, "
    f"'d' || CAST((user_id * 7 + event_id) % {LG_N} AS VARCHAR) "
    f"|| '.example' AS dst FROM events "
    f"WHERE user_id % {LG_N} != (user_id * 7 + event_id) % {LG_N}"
)


def _pagerank_oracle_sql(
    edge_sql: str = None, out_col: str = "node"
) -> str:
    """Unrolled LG_ITER-step damped power iteration, expression-shape
    parity with operators/linkgraph.py::pagerank: contributions
    rank/deg summed per dst, flowed mass via one aggregate, dangling =
    1 - flowed redistributed along the uniform teleport 1/n, new rank =
    ((1-d) + d*dangling)*(1/n) + d*coalesce(in, 0). Literals are
    written as (1.0 - d) / d so both engines derive the same doubles.
    Parameterized over the edge CTE and the output node-column name so
    the domain_pagerank entry (string-domain nodes) reuses the same
    recursion (r11)."""
    d = LG_DAMP
    parts = [
        f"WITH e AS MATERIALIZED ({edge_sql or _LG_EDGE_SQL}),",
        "deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src),",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),",
        "r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),",
    ]
    for k in range(1, LG_ITER + 1):
        p, c, r = f"r{k - 1}", f"c{k}", f"r{k}"
        parts.append(
            f"{c} AS MATERIALIZED (SELECT e.dst AS node, sum(r.rank / deg.deg) AS cin "
            f"FROM e JOIN {p} r ON r.node = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst),"
        )
        parts.append(
            f"{r} AS MATERIALIZED (SELECT nodes.node, "
            f"((1.0 - {d}) + {d} * (1.0 - "
            f"(SELECT coalesce(sum(cin), 0.0) FROM {c}))) "
            f"* (1.0 / (SELECT n FROM nn)) "
            f"+ {d} * coalesce({c}.cin, 0.0) AS rank "
            f"FROM nodes LEFT JOIN {c} ON {c}.node = nodes.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node AS {out_col}, round(rank, 6) AS rank "
        f"FROM r{LG_ITER} ORDER BY {out_col}"
    )
    return "\n".join(parts)


def _hits_oracle_sql() -> str:
    """Unrolled LG_ITER-step HITS with per-step L2 normalization,
    expression-shape parity with operators/linkgraph.py::hits
    (authority from in-neighbor hubs then hub from out-neighbor
    authorities, sqrt-sum-of-squares norms with the 0 -> 1 guard,
    coalesce(·, 0) for nodes missing from the raw aggregate).
    Every CTE is AS MATERIALIZED (DuckDB planner hint): the unrolled
    recursion references each step from several places, and inlining
    re-evaluates the whole prefix per reference — exponential in the
    iteration count (the un-hinted form timed out at 570s; hinted runs
    in ~0.4s)."""
    parts = [
        f"WITH e AS MATERIALIZED ({_LG_EDGE_SQL}),",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),",
        "h0 AS MATERIALIZED (SELECT node, 1.0 / sqrt((SELECT n FROM nn)) AS hub "
        "FROM nodes),",
    ]

    def norm_cte(name: str, raw: str) -> str:
        return (
            f"{name} AS MATERIALIZED (SELECT CASE WHEN coalesce(sqrt(sum(v * v)), 0.0) "
            f"= 0.0 THEN 1.0 ELSE sqrt(sum(v * v)) END AS nrm FROM {raw}),"
        )

    for k in range(1, LG_ITER + 1):
        hp = f"h{k - 1}"
        parts.append(
            f"a{k}raw AS MATERIALIZED (SELECT e.dst AS node, sum(h.hub) AS v "
            f"FROM e JOIN {hp} h ON h.node = e.src GROUP BY e.dst),"
        )
        parts.append(norm_cte(f"a{k}n", f"a{k}raw"))
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT nodes.node, coalesce(a{k}raw.v, 0.0) / "
            f"(SELECT nrm FROM a{k}n) AS authority "
            f"FROM nodes LEFT JOIN a{k}raw ON a{k}raw.node = nodes.node),"
        )
        parts.append(
            f"h{k}raw AS MATERIALIZED (SELECT e.src AS node, sum(a.authority) AS v "
            f"FROM e JOIN a{k} a ON a.node = e.dst GROUP BY e.src),"
        )
        parts.append(norm_cte(f"h{k}n", f"h{k}raw"))
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT nodes.node, coalesce(h{k}raw.v, 0.0) / "
            f"(SELECT nrm FROM h{k}n) AS hub "
            f"FROM nodes LEFT JOIN h{k}raw ON h{k}raw.node = nodes.node),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT h.node, round(h.hub, 6) AS hub, "
        f"round(a.authority, 6) AS authority "
        f"FROM h{LG_ITER} h JOIN a{LG_ITER} a ON a.node = h.node "
        f"ORDER BY h.node"
    )
    return "\n".join(parts)


# synthetic classifier frame shared by the classification oracles —
# must mirror _cls_frame exactly (integer expression, ONE double
# division at the end)
_CLS_BASE_SQL = (
    "SELECT CAST(doc_id % 2 AS INT) AS y, "
    "CAST((n_chars % 50) + 25 * (doc_id % 2) AS DOUBLE) / 100.0 AS s "
    "FROM documents"
)


def _classification_metrics_oracle_sql() -> str:
    """operators/evaluate.py::classification_metrics in window SQL:
    distinct-score grouped frame, ascending cumulative counts, midrank
    AUC with the decimal(38,6) rank-sum and decimal(38,18) AP-term
    accumulators (same per-addend double expressions, same casts), and
    the >= threshold confusion from the same grouped frame."""
    t = CLS_THRESH
    return f"""
        WITH b AS ({_CLS_BASE_SQL}),
        g AS (SELECT s, count(*) AS n, sum(y) AS p FROM b GROUP BY s),
        c AS (SELECT s, n, p,
                     sum(n) OVER (ORDER BY s) AS cn,
                     sum(p) OVER (ORDER BY s) AS cp FROM g),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS T,
                       CAST(sum(p) AS BIGINT) AS P FROM g),
        agg AS (SELECT
            sum(CAST(p * (cn - (n - 1) / 2.0) AS DECIMAL(38,6)))
                AS rank_pos,
            sum(CAST(CAST(p AS DOUBLE) *
                (CAST((SELECT P FROM tot) - (cp - p) AS DOUBLE)
                 / CAST((SELECT T FROM tot) - (cn - n) AS DOUBLE))
                AS DECIMAL(38,18))) AS ap_num
          FROM c),
        conf AS (SELECT
            CAST(sum(CASE WHEN s >= {t} THEN p ELSE 0 END) AS BIGINT)
                AS tp,
            CAST(sum(CASE WHEN s >= {t} THEN n - p ELSE 0 END) AS BIGINT)
                AS fp
          FROM g),
        m AS (SELECT T, P, tp, fp, P - tp AS fn, (T - P) - fp AS tn,
                     CAST(tp AS DOUBLE) / (tp + fp) AS prec,
                     CAST(tp AS DOUBLE) / (tp + (P - tp)) AS rec,
                     CAST(rank_pos AS DOUBLE) AS rank_pos,
                     CAST(ap_num AS DOUBLE) AS ap_num
              FROM tot, conf, agg)
        SELECT T AS n, P AS n_pos, tp, fp, fn, tn,
               round(CAST(tp + tn AS DOUBLE) / T, 6) AS accuracy,
               round(prec, 6) AS precision,
               round(rec, 6) AS recall,
               round(2 * prec * rec / (prec + rec), 6) AS f1,
               round((rank_pos - P * (P + 1) / 2.0) / (P * (T - P)), 6)
                   AS roc_auc,
               round(ap_num / P, 6) AS pr_auc
        FROM m"""


def _pr_curve_oracle_sql() -> str:
    """operators/evaluate.py::pr_curve in window SQL: descending
    cumulative kept/tp per distinct score, total positives = the
    deepest cumulative, f1 from the UNROUNDED precision/recall with
    the NULL-recall guard."""
    return f"""
        WITH b AS ({_CLS_BASE_SQL}),
        g AS (SELECT s, count(*) AS n, sum(y) AS p FROM b GROUP BY s),
        c AS (SELECT s,
                     sum(n) OVER (ORDER BY s DESC) AS kept,
                     sum(p) OVER (ORDER BY s DESC) AS tp FROM g),
        tot AS (SELECT max(tp) AS tot_pos FROM c),
        m AS (SELECT s, kept, tp,
                     CAST(tp AS DOUBLE) / CAST(kept AS DOUBLE) AS prec,
                     CASE WHEN (SELECT tot_pos FROM tot) > 0
                          THEN CAST(tp AS DOUBLE)
                               / (SELECT tot_pos FROM tot) END AS rec
              FROM c)
        SELECT s AS threshold, CAST(kept AS BIGINT) AS n_kept,
               round(prec, 6) AS precision,
               round(rec, 6) AS recall,
               round(CASE WHEN rec IS NULL THEN NULL
                          WHEN (prec + rec) > 0
                          THEN 2 * prec * rec / (prec + rec)
                          ELSE 0.0 END, 6) AS f1
        FROM m ORDER BY threshold"""


def _wcc_oracle_sql() -> str:
    """Undirected reachability via a recursive CTE: every node's label
    is the MIN node reachable through undirected edges — exactly the
    canonical labeling the Spark wrapper derives from
    weakly_connected_components' arbitrary member labels."""
    return f"""
        WITH RECURSIVE e AS ({_LG_WCC_EDGE_SQL}),
        ue AS (SELECT src AS a, dst AS b FROM e
               UNION SELECT dst, src FROM e),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        reach AS (
            SELECT node, node AS lbl FROM nodes
            UNION
            SELECT ue.b AS node, reach.lbl
            FROM reach JOIN ue ON ue.a = reach.node
        )
        SELECT node, CAST(min(lbl) AS BIGINT) AS component
        FROM reach GROUP BY node ORDER BY node"""


def oracle_sql() -> dict[str, str]:
    score = _bm25_sql("p.tf", "p.dl", "t.df")
    sizes_in = ", ".join(str(s) for s in QC04_SIZES)
    qc13_vals = ", ".join(f"({i})" for i in QC13_IDS)
    qc14_ids = ", ".join(str(i) for i in QC14_IDS)
    out = {
        "qc01_filter_eq": (
            f"SELECT count(*) AS cnt FROM lineitem WHERE l_quantity = {QC01_QTY}"
        ),
        "qc02_filter_cmp": f"""
            SELECT
              CAST(count(*) FILTER (o_totalprice >  {QC02_T}) AS BIGINT) AS cnt_gt,
              CAST(count(*) FILTER (o_totalprice >= {QC02_T}) AS BIGINT) AS cnt_ge,
              CAST(count(*) FILTER (o_totalprice <  {QC02_T}) AS BIGINT) AS cnt_lt,
              CAST(count(*) FILTER (o_totalprice <= {QC02_T}) AS BIGINT) AS cnt_le
            FROM orders""",
        "qc03_filter_range_date": f"""
            SELECT count(*) AS cnt,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
                     AS sum_extprice
            FROM lineitem
            WHERE l_shipdate BETWEEN TIMESTAMP '{QC03_D1}' AND TIMESTAMP '{QC03_D2}'""",
        "qc04_filter_inset": (
            f"SELECT count(*) AS cnt FROM part WHERE p_size IN ({sizes_in})"
        ),
        "qc05_filter_null": """
            SELECT
              CAST(count(*) FILTER (nullif(event_type, 'click') IS NULL) AS BIGINT) AS n_null,
              CAST(count(*) FILTER (nullif(event_type, 'click') IS NOT NULL) AS BIGINT) AS n_not_null
            FROM events""",
        "qc06_match_term": _CTE + f"""
            SELECT count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
            FROM postings WHERE term = '{QC06_TERM}'""",
        "qc07_match_termset": _CTE + f"""
            , m AS (
              SELECT doc_id, count(*) AS nm FROM postings
              WHERE term IN ('{QC07_TERMS[0]}','{QC07_TERMS[1]}','{QC07_TERMS[2]}')
              GROUP BY doc_id
            )
            SELECT
              (SELECT count(*) FROM m WHERE nm = 3)  AS n_all,
              (SELECT count(*) FROM m)               AS n_any,
              (SELECT count(*) FROM m WHERE nm >= 2) AS n_min2""",
        "qc08_bool_algebra": _CTE + f"""
            , d1 AS (SELECT DISTINCT doc_id FROM postings WHERE term = '{QC08_T1}'),
            d2 AS (SELECT DISTINCT doc_id FROM postings WHERE term = '{QC08_T2}')
            SELECT
              (SELECT count(*) FROM d1 WHERE doc_id IN (SELECT doc_id FROM d2)) AS n_and,
              (SELECT count(*) FROM (SELECT doc_id FROM d1 UNION SELECT doc_id FROM d2)) AS n_or,
              (SELECT count(*) FROM d1 WHERE doc_id NOT IN (SELECT doc_id FROM d2)) AS n_and_not""",
        "qc09_match_phrase": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 t -> t <> '') AS toks
              FROM documents
            )
            SELECT count(*) AS cnt FROM t
            WHERE list_contains(
              list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]),
              '{QC09_W1} {QC09_W2}')""",
        "qc10_bm25_topk": _CTE + f"""
            , scored AS (
              SELECT p.doc_id, sum({score}) AS s
              FROM postings p JOIN termstats t USING (term) CROSS JOIN fieldstats f
              WHERE p.term IN ('{QC10_TERMS[0]}','{QC10_TERMS[1]}')
              GROUP BY p.doc_id
            )
            SELECT doc_id, round(s, 6) AS score,
                   CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
            FROM scored ORDER BY s DESC, doc_id LIMIT {QC10_K}""",
        "qc11_batch_search": _CTE + f"""
            , q AS (
              SELECT doc_id AS query_id, list_distinct(toks[1:2]) AS qt
              FROM toks WHERE doc_id < {QC11_NQ}
            ),
            qterms AS (SELECT query_id, unnest(qt) AS term FROM q),
            scored AS (
              SELECT qt.query_id, p.doc_id, sum({score}) AS s
              FROM qterms qt
              JOIN postings p USING (term)
              JOIN termstats t USING (term)
              CROSS JOIN fieldstats f
              GROUP BY qt.query_id, p.doc_id
            ),
            ranked AS (
              SELECT query_id, doc_id, round(s, 6) AS score,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY s DESC, doc_id) AS BIGINT) AS rank
              FROM scored
            )
            SELECT * FROM ranked WHERE rank <= {QC11_K}""",
        "qc12_index_stats": _CTE + """
            SELECT
              (SELECT count(DISTINCT doc_id) FROM postings) AS n_docs,
              (SELECT count(DISTINCT term) FROM postings)   AS n_terms,
              (SELECT CAST(sum(tf) AS BIGINT) FROM postings) AS sum_tf,
              (SELECT round(sum(ln(1.0 + (f.n - t.df + 0.5) / (t.df + 0.5))), 4)
                 FROM termstats t CROSS JOIN fieldstats f) AS sum_idf""",
        "qc13_doc_lookup": f"""
            WITH ids(requested_id) AS (VALUES {qc13_vals})
            SELECT CAST(i.requested_id AS BIGINT) AS requested_id,
                   d.text, d.n_chars
            FROM ids i LEFT JOIN documents d ON d.doc_id = i.requested_id
            ORDER BY i.requested_id""",
        "qc14_bm25_components": _CTE + f"""
            SELECT p.doc_id,
                   p.tf AS tf, p.dl AS dl,
                   round(f.avgdl, 6) AS avgdl,
                   t.df AS df,
                   round(ln(1.0 + (f.n - t.df + 0.5) / (t.df + 0.5)), 6) AS idf,
                   round({score}, 6) AS score
            FROM postings p JOIN termstats t USING (term) CROSS JOIN fieldstats f
            WHERE p.term = '{QC14_TERM}' AND p.doc_id IN ({qc14_ids})
            ORDER BY p.doc_id""",
        "qc15_query_join": _CTE + f"""
            , q AS (
              SELECT doc_id AS query_id, list_distinct(toks) AS qt
              FROM toks
              WHERE doc_id >= {QC15_LO} AND doc_id < {QC15_HI}
            ),
            qterms AS (SELECT query_id, unnest(qt) AS term FROM q),
            scored AS (
              SELECT qt.query_id, p.doc_id, sum({score}) AS s
              FROM qterms qt
              JOIN postings p USING (term)
              JOIN termstats t USING (term)
              CROSS JOIN fieldstats f
              GROUP BY qt.query_id, p.doc_id
            ),
            ranked AS (
              SELECT query_id, doc_id AS match_doc_id, round(s, 6) AS score,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY s DESC, doc_id) AS BIGINT) AS rank
              FROM scored
            )
            SELECT * FROM ranked WHERE rank <= {QC15_K}""",
        "qc16_parsed_boost": _CTE + f"""
            , scored AS (
              SELECT p.doc_id,
                     sum(CASE WHEN p.term = 'dup'
                              THEN ({score}) * 2.0
                              ELSE ({score}) END) AS s
              FROM postings p JOIN termstats t USING (term) CROSS JOIN fieldstats f
              WHERE p.term IN ('dup', 'spark')
              GROUP BY p.doc_id
            )
            SELECT doc_id, round(s, 6) AS score,
                   CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
            FROM scored ORDER BY s DESC, doc_id LIMIT {QC10_K}""",
        "qc18_batch_k_col": _CTE + f"""
            , q AS (
              SELECT doc_id AS query_id, list_distinct(toks[1:2]) AS qt,
                     CAST(doc_id % 8 + 1 AS INTEGER) AS k
              FROM toks WHERE doc_id < {QC11_NQ}
            ),
            qterms AS (SELECT query_id, k, unnest(qt) AS term FROM q),
            scored AS (
              SELECT qt.query_id, any_value(qt.k) AS k, p.doc_id,
                     sum({score}) AS s
              FROM qterms qt
              JOIN postings p USING (term)
              JOIN termstats t USING (term)
              CROSS JOIN fieldstats f
              GROUP BY qt.query_id, p.doc_id
            ),
            ranked AS (
              SELECT query_id, k, doc_id, round(s, 6) AS score,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY s DESC, doc_id) AS BIGINT) AS rank
              FROM scored
            )
            SELECT query_id, doc_id, score, rank
            FROM ranked WHERE rank <= k""",
        "events_trending": """
            WITH c AS (
              SELECT
                CAST((epoch_ns(ts) // 3600000000000) * 3600000000 AS BIGINT)
                  AS window_start_us,
                CAST((epoch_ns(ts) // 3600000000000 + 1) * 3600000000
                     AS BIGINT) AS window_end_us,
                event_type,
                count(*) AS cnt
              FROM events GROUP BY 1, 2, 3
            ),
            r AS (
              SELECT *, CAST(row_number() OVER
                             (PARTITION BY window_start_us
                              ORDER BY cnt DESC, event_type) AS BIGINT)
                          AS rank
              FROM c
            )
            SELECT window_start_us, window_end_us, event_type, cnt, rank
            FROM r WHERE rank <= 3""",
        "events_hourly_windowed": """
            SELECT
              CAST((epoch_ns(ts) // 3600000000000) * 3600000000 AS BIGINT)
                AS window_start_us,
              CAST((epoch_ns(ts) // 3600000000000 + 1) * 3600000000 AS BIGINT)
                AS window_end_us,
              event_type,
              count(*) AS cnt
            FROM events
            GROUP BY 1, 2, 3""",
        "qc17_wildcard_fuzzy": _CTE + """
            , wc AS (SELECT DISTINCT doc_id FROM postings WHERE term LIKE 'dup%'),
            fzt AS (SELECT term FROM termstats WHERE levenshtein(term, 'dup') <= 1),
            fz AS (SELECT DISTINCT doc_id FROM postings
                   WHERE term IN (SELECT term FROM fzt))
            SELECT
              (SELECT count(*) FROM wc) AS n_wildcard,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM wc) AS sum_wc,
              (SELECT count(*) FROM fz) AS n_fuzzy,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM fz) AS sum_fz""",
        "qc28_exclusive_range": f"""
            WITH exc AS (SELECT doc_id FROM documents
                         WHERE n_chars > {QC28_LO} AND n_chars < {QC28_HI}),
            mixed AS (SELECT doc_id FROM documents
                      WHERE n_chars >= {QC28_LO} AND n_chars < {QC28_HI}),
            inc AS (SELECT doc_id FROM documents
                    WHERE n_chars >= {QC28_LO} AND n_chars <= {QC28_HI})
            SELECT
              (SELECT count(*) FROM exc) AS n_exc,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM exc) AS sum_exc,
              (SELECT count(*) FROM mixed) AS n_mixed,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM mixed) AS sum_mixed,
              (SELECT count(*) FROM inc) AS n_inc,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM inc) AS sum_inc""",
        "qc29_escaped_term": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                       CASE WHEN doc_id % 7 = 0
                            THEN text || ' c++ -x [tag]' ELSE text END,
                       '\s+'), x -> x <> '') AS toks
              FROM documents
            ),
            cpp AS (SELECT doc_id FROM t WHERE list_contains(toks, 'c++')),
            neg AS (SELECT doc_id FROM t WHERE list_contains(toks, '-x')),
            tag AS (SELECT doc_id FROM t WHERE list_contains(toks, '[tag]'))
            SELECT
              (SELECT count(*) FROM cpp) AS n_cpp,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM cpp) AS sum_cpp,
              (SELECT count(*) FROM neg) AS n_neg,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM neg) AS sum_neg,
              (SELECT count(*) FROM tag) AS n_tag,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM tag) AS sum_tag""",
        "qc30_regex_term": _CTE + """
            , m AS (SELECT DISTINCT doc_id FROM postings
                    WHERE regexp_full_match(term, 'dup[a-z]*'))
            SELECT doc_id, CAST(1.0 AS DOUBLE) AS score
            FROM m ORDER BY doc_id""",
        "dedup_exact": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS canon_id
            FROM documents""",
        "dedup_ngram_jaccard": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - {NGRAM_N - 1}, 1) + 1),
                       i -> array_to_string(toks[i:i+{NGRAM_N - 1}], ' '))) AS grams
              FROM t
            ),
            e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   round(CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE), 6)
                     AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= {NGRAM_T}""",
        "dedup_minhash_canon": f"""
            WITH RECURSIVE t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - {NGRAM_N - 1}, 1) + 1),
                       i -> array_to_string(toks[i:i+{NGRAM_N - 1}], ' '))) AS grams
              FROM t
            ),
            e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            ),
            pairs AS (
              SELECT id_a, id_b FROM inter
              JOIN sz sa ON sa.doc_id = id_a
              JOIN sz sb ON sb.doc_id = id_b
              WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE)
                    >= {NGRAM_T}
            ),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ),
            reach AS (
              SELECT src AS id, dst AS r FROM edges
              UNION
              SELECT e2.src, rr.r FROM edges e2 JOIN reach rr ON rr.id = e2.dst
            ),
            canon AS (
              SELECT id, least(id, min(r)) AS canon_id FROM reach GROUP BY id
            )
            SELECT d.doc_id,
                   coalesce(c.canon_id, d.doc_id) AS canon_id,
                   coalesce(c.canon_id, d.doc_id) <> d.doc_id AS is_duplicate
            FROM documents d LEFT JOIN canon c ON c.id = d.doc_id""",
        "dedup_recall": """
            SELECT * FROM (VALUES
              ('minhash_lsh', true), ('simhash', true), ('emb_lsh', true),
              ('minhash_cross', true)
            ) AS t(op, recall_ok)""",
        "ann_recall": """
            SELECT * FROM (VALUES
              ('lsh_topk', true), ('ivf_topk', true)
            ) AS t(op, recall_ok)""",
        "dedup_emb_exact": f"""
            WITH d AS (
              SELECT vec_id AS id, embedding AS v,
                     sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                       i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
                       AS nrm
              FROM embeddings
            ),
            p AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     list_sum(list_transform(range(1, len(a.v) + 1),
                       i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
                     / (a.nrm * b.nrm) AS c
              FROM d a JOIN d b ON a.id < b.id
            )
            SELECT id_a, id_b, round(c, 6) AS cos_sim
            FROM p WHERE c >= {EMB_DUP_T}""",
        # same SQL for the expression-fold and Arrow-matmul variants: the
        # BLAS sum-order delta (~1e-15) vanishes under the 6dp rounding
        # (verified equal on sf0.01)
        "emb_cosine_topk_arrow": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < {EMB_NQ}),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_sum(list_transform(range(1, len(e.embedding) + 1),
                       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                        * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
                     AS c
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT query_id, vec_id, round(c, 6) AS cos_sim,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY c DESC, vec_id) AS BIGINT) AS rank
              FROM scored
            )
            SELECT * FROM ranked WHERE rank <= {EMB_K}""",
        "emb_cosine_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < {EMB_NQ}),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_sum(list_transform(range(1, len(e.embedding) + 1),
                       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                     / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                          i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                        * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                          i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
                     AS c
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT query_id, vec_id, round(c, 6) AS cos_sim,
                     CAST(row_number() OVER (PARTITION BY query_id
                                             ORDER BY c DESC, vec_id) AS BIGINT) AS rank
              FROM scored
            )
            SELECT * FROM ranked WHERE rank <= {EMB_K}""",
        "decontam_embedding": f"""
            WITH ev AS (SELECT vec_id AS eid, embedding AS ev
                        FROM embeddings WHERE vec_id < {DECON_EMB_NQ}),
            p AS (
              SELECT e.vec_id AS id,
                     round(CASE WHEN
                         sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) > 0
                         AND
                         sqrt(list_sum(list_transform(range(1, len(ev.ev) + 1),
                           i -> CAST(ev.ev[i] AS DOUBLE) * CAST(ev.ev[i] AS DOUBLE)))) > 0
                       THEN
                         list_sum(list_transform(range(1, len(e.embedding) + 1),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(ev.ev[i] AS DOUBLE)))
                         / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                            * sqrt(list_sum(list_transform(range(1, len(ev.ev) + 1),
                              i -> CAST(ev.ev[i] AS DOUBLE) * CAST(ev.ev[i] AS DOUBLE)))))
                       END, 6) AS c
              FROM embeddings e LEFT JOIN ev ON TRUE
            )
            SELECT id, max(c) AS max_cos,
                   coalesce(CAST(sum(CASE WHEN c >= {EMB_DUP_T} THEN 1 ELSE 0 END) AS BIGINT), 0)
                     AS n_contaminated,
                   coalesce(CAST(sum(CASE WHEN c >= {EMB_DUP_T} THEN 1 ELSE 0 END) AS BIGINT), 0) = 0
                     AS keep
            FROM p GROUP BY id ORDER BY id""",
        "text_quality": f"""
            WITH base AS (
              SELECT doc_id,
                     coalesce(text, '') AS text,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                 '[^a-z0-9]+'), t -> t <> '') AS toks
              FROM documents
            ),
            m AS (
              SELECT doc_id,
                     len(toks) AS n_tokens,
                     length(text) AS n_chars,
                     length(text) - length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                       AS n_punct,
                     len(list_filter(toks, t -> list_contains(
                       {_sql_list(LANG_STOPWORDS["en"])}, t)))
                       AS n_stop,
                     len(list_distinct(toks)) AS n_distinct
              FROM base
            )
            SELECT doc_id,
                   CAST(n_tokens AS INTEGER) AS n_tokens,
                   CAST(n_chars AS INTEGER) AS n_chars,
                   round(CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE), 6)
                     AS punct_ratio,
                   round(CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE), 6)
                     AS stopword_ratio,
                   round(CAST(n_distinct AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE), 6)
                     AS distinct_ratio,
                   round(
                     (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
                     + (CASE WHEN CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) < 0.5
                             THEN 0.3 ELSE 0.0 END)
                     + (CASE WHEN CAST(n_distinct AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) > 0.1
                             THEN 0.3 ELSE 0.0 END), 2) AS quality_score
            FROM m""",
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(array_to_string(
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                 '[^a-z0-9]+'), t -> t <> ''), ' ')) AS fp_md5
            FROM documents""",
        "token_stats": """
            WITH t AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
                   CAST(len(regexp_extract_all(coalesce(text, ''),
                     '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
                     AS INTEGER) AS n_bpe_tokens,
                   round(
                     list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE)))
                     / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS avg_token_len
            FROM t""",
        "lang_id": f"""
            WITH t AS (
              SELECT doc_id, coalesce(text, '') AS text,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                 '[^a-z0-9]+'), x -> x <> '') AS toks
              FROM documents
            ),
            h AS (
              SELECT doc_id, 'de' AS lang, len(list_filter(toks,
                x -> list_contains({_sql_list(LANG_STOPWORDS["de"])}, x))) AS hits FROM t
              UNION ALL
              SELECT doc_id, 'en', len(list_filter(toks,
                x -> list_contains({_sql_list(LANG_STOPWORDS["en"])}, x))) FROM t
              UNION ALL
              SELECT doc_id, 'es', len(list_filter(toks,
                x -> list_contains({_sql_list(LANG_STOPWORDS["es"])}, x))) FROM t
              UNION ALL
              SELECT doc_id, 'fr', len(list_filter(toks,
                x -> list_contains({_sql_list(LANG_STOPWORDS["fr"])}, x))) FROM t
              UNION ALL
              SELECT doc_id, 'it', len(list_filter(toks,
                x -> list_contains({_sql_list(LANG_STOPWORDS["it"])}, x))) FROM t
            ),
            best AS (
              SELECT doc_id, lang, hits,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY hits DESC, lang) AS rn
              FROM h
            ),
            cjk AS (
              SELECT doc_id,
                     length(text)
                       - length(regexp_replace(text, '[一-鿿㐀-䶿]', '', 'g'))
                       AS n_cjk,
                     length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
              FROM t
            )
            SELECT t.doc_id,
                   CASE WHEN CAST(c.n_cjk AS DOUBLE)
                             / CAST(greatest(c.n_nonspace, 1) AS DOUBLE) >= 0.3
                        THEN 'zh'
                        WHEN b.hits > 0 THEN b.lang
                        ELSE 'und' END AS lang_pred,
                   CAST(CASE WHEN CAST(c.n_cjk AS DOUBLE)
                             / CAST(greatest(c.n_nonspace, 1) AS DOUBLE) >= 0.3
                        THEN c.n_cjk ELSE b.hits END AS INTEGER) AS lang_hits
            FROM t
            JOIN best b ON b.doc_id = t.doc_id AND b.rn = 1
            JOIN cjk c ON c.doc_id = t.doc_id""",
        "doc_winnow": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                 '[^a-z0-9]+'), x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_transform(
                       range(1, greatest(len(toks) - 4, 1) + 1),
                       i -> array_to_string(toks[i:i+4], ' ')) AS grams
              FROM t
            ),
            hh AS (
              SELECT doc_id, list_transform(grams, x -> md5(x)) AS hs FROM g
            ),
            w AS (
              SELECT doc_id,
                     list_transform(
                       range(1, greatest(len(hs) - 3, 1) + 1),
                       i -> list_aggregate(hs[i:i+3], 'min')) AS wm
              FROM hh
            ),
            s AS (
              SELECT doc_id, list_sort(list_distinct(wm)) AS sel FROM w
            )
            SELECT doc_id,
                   md5(array_to_string(sel, ',')) AS fp_winnow,
                   CAST(len(sel) AS INTEGER) AS n_selected
            FROM s""",
        "events_sessionize": """
            WITH lagged AS (
              SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
              FROM events
            ),
            marked AS (
              SELECT user_id, ts,
                     CASE WHEN prev_ts IS NULL
                               OR ts - prev_ts >= INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM lagged
            ),
            grouped AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            )
            SELECT user_id,
                   CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
                   CAST(epoch_us(max(ts) + INTERVAL 30 MINUTE) AS BIGINT)
                     AS session_end_us,
                   count(*) AS n_events
            FROM grouped GROUP BY user_id, sid""",
        "events_hourly": """
            SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
                   event_type,
                   count(*) AS cnt,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value
            FROM events
            GROUP BY 1, 2 ORDER BY 1, 2""",
        # dedup_minhash_lsh, dedup_simhash, emb_lsh_topk, emb_ivf_topk:
        # intentionally omitted -> driver's weaker rows-only check
        # (xxhash64 / LSH bucketing has no DuckDB equivalent). Their
        # CORRECTNESS story is the dedup_recall / ann_recall entries,
        # which hold each approximate op to a recall threshold against
        # its exact, oracle-checked baseline.
        # mm_image_features: the fake codec is a sha256 HEX-digest chain
        # (multimodal._fake_decode), replicated below as a recursive CTE;
        # 8x8x3 = 192 px = exactly 6 sha blocks x 32 bytes, each px is
        # byte/256.0 so the byte sum is integer-exact on both engines.
        "mm_image_features": """
            WITH RECURSIVE chain(doc_id, i, h) AS (
              SELECT doc_id, 0, sha256(text) FROM documents
              UNION ALL
              SELECT doc_id, i + 1, sha256(h) FROM chain WHERE i < 6
            )
            SELECT c.doc_id,
                   8 AS width, 8 AS height, 3 AS n_channels,
                   CAST(sum(CAST(('0x' || substr(c.h, CAST(2 * t.p + 1 AS INT), 2)) AS INT)) AS BIGINT) AS px_byte_sum
            FROM chain c, unnest(range(32)) AS t(p)
            WHERE c.i >= 1
            GROUP BY c.doc_id
            ORDER BY c.doc_id""",
        "qc21_search_elements": _CTE + f"""
            , scored AS (
              SELECT p.doc_id, sum({score}) AS s
              FROM postings p JOIN termstats t USING (term) CROSS JOIN fieldstats f
              WHERE p.term IN ('{QC10_TERMS[0]}','{QC10_TERMS[1]}')
              GROUP BY p.doc_id
            ),
            topk AS (
              SELECT doc_id, round(s, 6) AS score,
                     CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
              FROM scored ORDER BY s DESC, doc_id LIMIT {QC10_K}
            )
            SELECT k.doc_id, k.score, k.rank, d.source, d.n_chars
            FROM topk k JOIN documents d USING (doc_id)""",
        "qc22_match_alltext": _CTE + """
            , m AS (
              SELECT doc_id FROM postings
              WHERE term IN ('dup', 'spark')
              GROUP BY doc_id HAVING count(DISTINCT term) = 2
            )
            SELECT count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
            FROM m""",
        # as-of join vs DuckDB's native ASOF LEFT JOIN
        "events_asof": """
            SELECT l.event_id, l.user_id,
                   CAST(epoch_us(l.ts) AS BIGINT) AS ts_us,
                   CAST(epoch_us(r.ts) AS BIGINT) AS p_ts_us,
                   round(r.value, 6) AS p_value
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY l.event_id""",
        # PII scrub: same regexes, RE2/Java-portable subset
        "pii_scrub": r"""
            WITH documents_dirty AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN coalesce(text, '') || ' reach user' ||
                               CAST(doc_id AS VARCHAR) ||
                               '@example.com at 10.0.0.1 ssn 123-45-6789 tel 1-555-123-4567'
                          ELSE text END AS text
              FROM documents)
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                coalesce(text, ''),
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                '(?:\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b', '<PHONE>', 'g')
                AS text_scrubbed,
              CAST(len(regexp_extract_all(coalesce(text, ''),
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
              CAST(len(regexp_extract_all(coalesce(text, ''),
                '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
              CAST(len(regexp_extract_all(coalesce(text, ''),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
              CAST(len(regexp_extract_all(coalesce(text, ''),
                '(?:\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b')) AS BIGINT) AS n_phone
            FROM documents_dirty ORDER BY doc_id""",
        # deterministic md5-bucket sampling (operators/sampling.py)
        "sample_stratified": """
            SELECT doc_id, lang FROM documents
            WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 10000
                  < CASE lang WHEN 'en' THEN 0.5 * 10000
                              WHEN 'es' THEN 0.25 * 10000
                              WHEN 'zh' THEN 0.1 * 10000
                              ELSE 0.0 END
            ORDER BY doc_id""",
        "emb_quantize": """
            WITH q AS (
              SELECT vec_id,
                     list_max(list_transform(embedding, x -> abs(x))) / 127.0
                       AS scale,
                     embedding
              FROM embeddings
            ),
            qq AS (
              SELECT vec_id, scale,
                     CASE WHEN scale = 0 THEN
                       list_transform(embedding, x -> 0)
                     ELSE
                       list_transform(embedding,
                                      x -> CAST(floor(x / scale + 0.5)
                                                AS INTEGER))
                     END AS qvec
              FROM q
            )
            SELECT vec_id, round(CAST(scale AS DOUBLE), 6) AS scale,
                   CAST(list_sum(list_transform(qvec, x -> abs(x)))
                        AS BIGINT) AS qabs_sum,
                   CAST(qvec[1] AS BIGINT) AS q_first
            FROM qq ORDER BY vec_id""",
        "sample_per_group": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                    1, 8) AS BIGINT),
                                doc_id) AS rn
              FROM documents) WHERE rn <= 5 ORDER BY doc_id""",
        "clean_text": r"""
            WITH documents_dirty AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0
                          THEN chr(7) || 'junk' || chr(9) || chr(9) ||
                               ' mid  ' || coalesce(text, '') ||
                               '  tail ' || chr(10) || ' ' || chr(10) ||
                               chr(10) || chr(10) || chr(10) || 'end  '
                          ELSE text END AS text
              FROM documents)
            SELECT doc_id,
                   trim(regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text,
                           '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
                         '[ \t]+', ' ', 'g'),
                       ' ?\n ?', chr(10), 'g'),
                     '\n{3,}', chr(10) || chr(10), 'g'),
                   ' ') AS text
            FROM documents_dirty ORDER BY doc_id""",
        "train_test_split": """
            SELECT doc_id,
                   CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                 1, 8) AS BIGINT) % 10000
                             < 0.2 * 10000
                        THEN 'test' ELSE 'train' END AS split
            FROM documents ORDER BY doc_id""",
        # per-doc tf-idf keywords off the postings table (operators/stats.py)
        "doc_keywords": _CTE + f"""
            , idf AS (
              SELECT term,
                     ln(1.0 + (CAST((SELECT n FROM fieldstats) AS DOUBLE)
                               - df + 0.5) / (df + 0.5)) AS idf
              FROM termstats
            ),
            scored AS (
              SELECT p.doc_id, p.term,
                     CAST(p.tf AS DOUBLE) * i.idf AS tfidf
              FROM postings p JOIN idf i USING (term)
            ),
            ranked AS (
              SELECT doc_id, term, tfidf,
                     CAST(row_number() OVER (PARTITION BY doc_id
                                             ORDER BY tfidf DESC, term)
                          AS BIGINT) AS rank
              FROM scored
            )
            SELECT doc_id, term, round(tfidf, 6) AS tfidf, rank
            FROM ranked WHERE rank <= {KEYWORDS_K}
            ORDER BY doc_id, rank""",
        # chunk -> shard -> pack training layout (operators/chunking.py,
        # operators/export.py)
        "pack_chunks": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            nz AS (SELECT * FROM t WHERE len(toks) > 0),
            c AS (
              SELECT doc_id, toks,
                     unnest(range(0,
                       1 + CAST(ceil(greatest(len(toks) - {CHUNK_MAX}, 0)
                                     / {CHUNK_MAX - CHUNK_OVERLAP}.0)
                                AS INT))) AS chunk_id
              FROM nz
            ),
            ch AS (
              SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                     CAST(len(toks[chunk_id*{CHUNK_MAX - CHUNK_OVERLAP}+1 :
                               chunk_id*{CHUNK_MAX - CHUNK_OVERLAP}+{CHUNK_MAX}])
                          AS BIGINT) AS n_tokens,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % {PACK_SHARDS} AS shard
              FROM c
            ),
            packed AS (
              SELECT doc_id, chunk_id, shard,
                     CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT)
                       AS "offset"
              FROM ch
              WINDOW w AS (PARTITION BY shard ORDER BY doc_id, chunk_id
                           ROWS UNBOUNDED PRECEDING)
            )
            SELECT doc_id, chunk_id, shard, "offset",
                   CAST("offset" // {PACK_BUDGET} AS BIGINT) AS pack_id,
                   CAST("offset" % {PACK_BUDGET} AS BIGINT) AS pack_offset
            FROM packed ORDER BY doc_id, chunk_id""",
        # more-like-this: keyword expansion + BM25 (operators/search.py)
        "more_like_this": _CTE + f"""
            , idf AS (
              SELECT term,
                     ln(1.0 + (CAST((SELECT n FROM fieldstats) AS DOUBLE)
                               - df + 0.5) / (df + 0.5)) AS idf
              FROM termstats
            ),
            kwsc AS (
              SELECT p.doc_id AS src_id, p.term,
                     CAST(p.tf AS DOUBLE) * i.idf AS tfidf
              FROM postings p JOIN idf i USING (term)
              WHERE p.doc_id < {MLT_NSRC}
            ),
            kw AS (
              SELECT src_id, term FROM (
                SELECT *, row_number() OVER (PARTITION BY src_id
                                             ORDER BY tfidf DESC, term) AS r
                FROM kwsc) WHERE r <= {MLT_TERMS}
            ),
            sc AS (
              SELECT k.src_id, p.doc_id, sum({score}) AS s
              FROM kw k
              JOIN postings p USING (term)
              JOIN termstats t USING (term)
              CROSS JOIN fieldstats f
              WHERE p.doc_id <> k.src_id
              GROUP BY k.src_id, p.doc_id
            ),
            ranked AS (
              SELECT src_id, doc_id AS match_doc_id, round(s, 6) AS score,
                     CAST(row_number() OVER (PARTITION BY src_id
                                             ORDER BY s DESC, doc_id)
                          AS BIGINT) AS rank
              FROM sc
            )
            SELECT src_id, match_doc_id, score, rank
            FROM ranked WHERE rank <= {MLT_K}
            ORDER BY src_id, rank""",
        # adjacent-bigram PMI collocations (operators/decontam.py)
        "collocations_pmi": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            bgp AS (
              SELECT unnest(list_transform(
                       range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i+1])) AS pair
              FROM t
            ),
            bg AS (
              SELECT split_part(pair, ' ', 1) AS term_a,
                     split_part(pair, ' ', 2) AS term_b,
                     CAST(count(*) AS BIGINT) AS n_ab
              FROM bgp GROUP BY 1, 2
            ),
            u AS (
              SELECT term, count(*) AS n_t
              FROM (SELECT unnest(toks) AS term FROM t) GROUP BY term
            ),
            nn AS (SELECT CAST(sum(n_t) AS DOUBLE) AS n FROM u),
            mm AS (SELECT CAST(sum(n_ab) AS DOUBLE) AS m FROM bg),
            scored AS (
              SELECT b.term_a, b.term_b, b.n_ab,
                     ln((b.n_ab / (SELECT m FROM mm))
                        / ((ua.n_t / (SELECT n FROM nn))
                           * (ub.n_t / (SELECT n FROM nn)))) AS pmi
              FROM bg b
              JOIN u ua ON ua.term = b.term_a
              JOIN u ub ON ub.term = b.term_b
              WHERE b.n_ab >= {COLL_MIN}
            ),
            ranked AS (
              SELECT *, row_number() OVER
                        (ORDER BY pmi DESC, term_a, term_b) AS r
              FROM scored
            )
            SELECT term_a, term_b, n_ab, round(pmi, 6) AS pmi
            FROM ranked WHERE r <= {COLL_K}
            ORDER BY term_a, term_b""",
        # composed curation pipeline report (operators/pipeline.py);
        # train = docs < split, eval = docs >= split, gates mirror
        # curation_flags exactly
        "curation_report": f"""
            WITH d AS (SELECT * FROM documents
                       WHERE doc_id < {DECONTAM_EVAL_LO}),
            t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM d
            ),
            q AS (SELECT doc_id,
                         len(toks) BETWEEN {CURATE_MIN_T} AND {CURATE_MAX_T}
                           AS quality_ok
                  FROM t),
            c AS (SELECT doc_id,
                         doc_id <> min(doc_id) OVER (PARTITION BY md5(text))
                           AS is_dup
                  FROM d),
            ta AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - {DECONTAM_N - 1}, 1) + 1),
                       i -> array_to_string(toks[i:i+{DECONTAM_N - 1}], ' ')))
                       AS grams
              FROM ta
            ),
            ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g
                   WHERE doc_id >= {DECONTAM_EVAL_LO}),
            tr AS (SELECT doc_id, unnest(grams) AS gram FROM g
                   WHERE doc_id < {DECONTAM_EVAL_LO}),
            hit AS (SELECT DISTINCT tr.doc_id FROM tr
                    JOIN ev USING (gram)),
            gsig AS (
              SELECT doc_id,
                     list_filter(string_split_regex(coalesce(text, ''),
                                 '\\s+'), w -> w <> '') AS words,
                     list_filter(list_transform(
                       string_split_regex(coalesce(text, ''), '\\r?\\n'),
                       l -> trim(l)), l -> l <> '') AS lines,
                     len(regexp_extract_all(coalesce(text, ''),
                         '#|\\.\\.\\.|…')) AS n_sym
              FROM d),
            gp AS (
              SELECT doc_id,
                     (len(words) >= 50 AND len(words) <= 100000
                      AND round(coalesce(list_sum(list_transform(words,
                            w -> CAST(length(w) AS DOUBLE))), 0.0)
                          / CAST(greatest(len(words), 1) AS DOUBLE), 6)
                          BETWEEN 3.0 AND 10.0
                      AND round(CAST(len(list_filter(lines,
                            l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE)
                          / CAST(greatest(len(lines), 1) AS DOUBLE), 6)
                          <= 0.9
                      AND round(CAST(len(list_filter(lines,
                            l -> regexp_matches(l, '(\\.\\.\\.|…)$')))
                          AS DOUBLE)
                          / CAST(greatest(len(lines), 1) AS DOUBLE), 6)
                          <= 0.3
                      AND round(CAST(n_sym AS DOUBLE)
                          / CAST(greatest(len(words), 1) AS DOUBLE), 6)
                          <= 0.1
                      AND round(CAST(len(list_filter(words,
                            w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                          / CAST(greatest(len(words), 1) AS DOUBLE), 6)
                          >= 0.8) AS gopher_ok
              FROM gsig),
            cf AS (
              SELECT doc_id,
                     CAST(coalesce(list_sum(list_transform(toks,
                       tk -> ({CLF_WEIGHTS})[
                         CAST(CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT)
                              % {CLF_DIM} AS INTEGER) + 1])), 0)
                       AS BIGINT) >= 0 AS clf_ok
              FROM t),
            f AS (
              SELECT q.doc_id, q.quality_ok, c.is_dup,
                     hit.doc_id IS NOT NULL AS contam, gp.gopher_ok,
                     cf.clf_ok
              FROM q JOIN c USING (doc_id)
              JOIN gp USING (doc_id)
              JOIN cf USING (doc_id)
              LEFT JOIN hit USING (doc_id)
            )
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN NOT quality_ok THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_quality_fail,
                   CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_exact_dup,
                   CAST(sum(CASE WHEN contam THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_contaminated,
                   CAST(sum(CASE WHEN NOT gopher_ok THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_gopher_fail,
                   CAST(0 AS BIGINT) AS n_c4_fail,
                   CAST(sum(CASE WHEN NOT clf_ok THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_clf_fail,
                   -- readability gate disabled in this entry -> constant
                   -- True flag, zero fails (r5 schema addition)
                   CAST(0 AS BIGINT) AS n_read_fail,
                   CAST(sum(CASE WHEN quality_ok AND NOT is_dup
                                      AND NOT contam AND gopher_ok
                                      AND clf_ok
                                 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept
            FROM f""",
        # token-window chunking (operators/chunking.py); DuckDB slices are
        # end-inclusive, Spark's are length-based — ranges below align
        "chunk_docs": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            nz AS (SELECT * FROM t WHERE len(toks) > 0),
            c AS (
              SELECT doc_id, toks,
                     unnest(range(0,
                       1 + CAST(ceil(greatest(len(toks) - {CHUNK_MAX}, 0)
                                     / {CHUNK_MAX - CHUNK_OVERLAP}.0)
                                AS INT))) AS chunk_id
              FROM nz
            )
            SELECT doc_id,
                   CAST(chunk_id AS BIGINT) AS chunk_id,
                   CAST(len(toks[chunk_id*{CHUNK_MAX - CHUNK_OVERLAP}+1 :
                              chunk_id*{CHUNK_MAX - CHUNK_OVERLAP}+{CHUNK_MAX}])
                        AS BIGINT) AS n_tokens,
                   array_to_string(
                     toks[chunk_id*{CHUNK_MAX - CHUNK_OVERLAP}+1 :
                          chunk_id*{CHUNK_MAX - CHUNK_OVERLAP}+{CHUNK_MAX}],
                     ' ') AS chunk_text
            FROM c ORDER BY doc_id, chunk_id""",
        # giant-bucket guard metrics (operators/dedup.py, r11 verdict
        # #1): every output is an analytic function of the mega-cluster
        # size m — DuckDB counts m exactly from the same parquet; the
        # guard's contract (bands oversized buckets of m members, m-1
        # star pairs through min id 0, full canon collapse) supplies
        # the closed forms. Below the cap (small sf) the join is
        # uncapped all-pairs: m*(m-1)/2 identical-text pairs.
        "dedup_bucket_cap": """
            WITH m AS (
              SELECT CAST(count(*) AS BIGINT) AS mm
              FROM documents WHERE doc_id < 260 AND doc_id % 7 = 0
            )
            SELECT
              CAST(CASE WHEN mm > 20 THEN 16 ELSE 0 END AS BIGINT)
                AS oversized_buckets,
              CAST(CASE WHEN mm > 20 THEN 16 * mm ELSE 0 END AS BIGINT)
                AS oversized_rows,
              CAST(CASE WHEN mm > 20 THEN mm ELSE 0 END AS BIGINT)
                AS largest_bucket,
              CAST(CASE WHEN mm > 20 THEN mm - 1
                        ELSE mm * (mm - 1) / 2 END AS BIGINT)
                AS capped_pairs,
              CAST(GREATEST(mm - 1, 0) AS BIGINT) AS pairs_via_min_id,
              CAST(GREATEST(mm - 1, 0) AS BIGINT) AS canon_dups
            FROM m""",
        # cross-corpus exact near-dup join (operators/dedup.py)
        "dedup_cross_ngram": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - {NGRAM_N - 1}, 1) + 1),
                       i -> array_to_string(toks[i:i+{NGRAM_N - 1}], ' ')))
                       AS grams
              FROM t
            ),
            e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_l, b.doc_id AS id_r, count(*) AS i
              FROM e a JOIN e b ON a.gram = b.gram
              WHERE a.doc_id < {DEDUP_CROSS_SPLIT}
                AND b.doc_id >= {DEDUP_CROSS_SPLIT}
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_l, id_r,
                   round(CAST(i AS DOUBLE)
                         / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = id_l
            JOIN sz sb ON sb.doc_id = id_r
            WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE)
                  >= {NGRAM_T}
            ORDER BY id_l, id_r""",
        # deterministic shard export (operators/export.py)
        "export_shard_assign": f"""
            SELECT doc_id,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % {EXPORT_SHARDS} AS shard
            FROM documents ORDER BY doc_id""",
        # epoch-shuffled shard assignment, portable md5 mode (r10):
        # seed folded into the md5 key string
        "export_shard_shuffle": f"""
            SELECT doc_id,
                   CAST('0x' || substr(md5('{EXPORT_SEED}:' ||
                        CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % {EXPORT_SHARDS} AS shard
            FROM documents ORDER BY doc_id""",
        # link-graph toolkit (operators/linkgraph.py, r10 oracles;
        # domain_pagerank/rank_pages r11)
        "pagerank": _pagerank_oracle_sql(),
        "hits": _hits_oracle_sql(),
        "weakly_connected_components": _wcc_oracle_sql(),
        "domain_pagerank": _pagerank_oracle_sql(
            edge_sql=_DPR_EDGE_SQL, out_col="domain"
        ),
        "rank_pages": f"""
            SELECT d.doc_id, coalesce(r.rank, 0.0) AS domain_rank
            FROM documents d
            LEFT JOIN (VALUES
                ('s0.example', 0.125), ('s1.example', 0.25),
                ('s2.example', 0.375), ('s3.example', 0.5),
                ('s4.example', 0.625)
            ) AS r(domain, rank)
              ON r.domain = 's' || CAST(d.doc_id % 7 AS VARCHAR)
                 || '.example'
            ORDER BY d.doc_id""",
        # classifier evaluation (operators/evaluate.py, r10 oracles)
        "classification_metrics": _classification_metrics_oracle_sql(),
        "pr_curve": _pr_curve_oracle_sql(),
        # benchmark decontamination / vocab / unigram LM
        # (operators/decontam.py)
        "decontam_ngram": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - {DECONTAM_N - 1}, 1) + 1),
                       i -> array_to_string(toks[i:i+{DECONTAM_N - 1}], ' ')))
                       AS grams
              FROM t
            ),
            ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g
                   WHERE doc_id >= {DECONTAM_EVAL_LO}),
            tr AS (SELECT doc_id, len(grams) AS n_grams,
                          unnest(grams) AS gram
                   FROM g WHERE doc_id < {DECONTAM_EVAL_LO}),
            hits AS (
              SELECT tr.doc_id,
                     CAST(any_value(tr.n_grams) AS BIGINT) AS n_grams,
                     CAST(count(ev.gram) AS BIGINT) AS n_hit_grams
              FROM tr LEFT JOIN ev USING (gram)
              GROUP BY tr.doc_id
            )
            SELECT doc_id, n_grams, n_hit_grams,
                   n_hit_grams >= 1 AS contaminated
            FROM hits ORDER BY doc_id""",
        # Bloom decontamination: the oracle REBUILDS the bitset in SQL —
        # same md5 h1/h2, same (h1 + i*h2) % m indexes, same m sizing,
        # same signed-64 word packing (bit 63 via the MIN_BIGINT literal
        # because DuckDB errors on 1<<63) — then probes with the same
        # shift/mask arithmetic. Exact match INCLUDING false positives.
        "decontam_bloom": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - {BLOOM_N - 1}, 1) + 1),
                       i -> array_to_string(toks[i:i+{BLOOM_N - 1}], ' ')))
                       AS grams
              FROM t
            ),
            eg AS (SELECT DISTINCT unnest(grams) AS gram FROM g
                   WHERE doc_id % {BLOOM_MOD} = 0),
            mv AS (
              SELECT ((greatest(64, 32 * greatest(count(*), 1)) + 63)
                      // 64) * 64 AS m
              FROM eg
            ),
            eidx AS (
              -- h1/h2 reduced mod m, h2 forced odd (KM degenerate-step
              -- guard) — identical to the Python build
              SELECT DISTINCT
                     ((CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
                       % (SELECT m FROM mv))
                      + i * ((CAST('0x' || substr(md5(gram), 9, 8)
                                  AS BIGINT) % (SELECT m FROM mv)) | 1))
                     % (SELECT m FROM mv) AS h
              FROM eg, range(0, 16) r(i)
            ),
            wset AS (
              SELECT h // 64 AS w,
                     bit_or(CASE WHEN h % 64 = 63
                                 THEN (-9223372036854775807 - 1)::BIGINT
                                 ELSE 1::BIGINT << CAST(h % 64 AS INT)
                            END) AS word
              FROM eidx GROUP BY h // 64
            ),
            warr AS (
              SELECT (SELECT map_from_entries(list({{'k': w, 'v': word}}))
                      FROM wset) AS mm,
                     (SELECT m FROM mv) AS m
            ),
            tg AS (
              SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
                     unnest(grams) AS gram
              FROM g
            ),
            th AS (
              SELECT doc_id, n_grams,
                     CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
                       % m AS h1,
                     (CAST('0x' || substr(md5(gram), 9, 8) AS BIGINT)
                       % m) | 1 AS h2,
                     mm, m
              FROM tg CROSS JOIN warr
            ),
            probe AS (
              SELECT doc_id, n_grams,
                     CASE WHEN len(list_filter(range(0, 16), i ->
                       ((coalesce(mm[((h1 + i*h2) % m) // 64][1], 0)
                         >> CAST(((h1 + i*h2) % m) % 64 AS INT)) & 1) = 1
                     )) = 16 THEN 1 ELSE 0 END AS hit
              FROM th
            )
            SELECT doc_id, any_value(n_grams) AS n_grams,
                   CAST(sum(hit) AS BIGINT) AS n_hit_grams,
                   sum(hit) >= 1 AS contaminated
            FROM probe GROUP BY doc_id ORDER BY doc_id""",
        "vocab_top": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            e AS (SELECT doc_id, unnest(toks) AS term FROM t),
            v AS (
              SELECT term, CAST(count(*) AS BIGINT) AS tf,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS df_t
              FROM e GROUP BY term
            ),
            tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS tot FROM v),
            r AS (
              SELECT term, tf, df_t,
                     CAST(row_number() OVER
                          (ORDER BY tf DESC, term ASC) AS BIGINT) AS rank,
                     CAST(sum(tf) OVER (ORDER BY tf DESC, term ASC) AS DOUBLE)
                       / (SELECT tot FROM tot) AS cum_frac
              FROM v
            )
            SELECT term, tf, df_t, rank, round(cum_frac, 6) AS cum_frac
            FROM r WHERE rank <= {VOCAB_TOP_K} ORDER BY rank""",
        "unigram_quality": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            e AS (SELECT doc_id, unnest(toks) AS term FROM t),
            v AS (SELECT term, count(*) AS tf FROM e GROUP BY term),
            tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS tot FROM v),
            s AS (
              SELECT e.doc_id,
                     -ln(CAST(v.tf AS DOUBLE) / (SELECT tot FROM tot)) AS nll
              FROM e JOIN v USING (term)
            ),
            agg AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                     avg(nll) AS avg_nll
              FROM s GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(a.n_tokens, 0) AS n_tokens,
                   round(coalesce(a.avg_nll, 0.0), 6) AS avg_nll
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY d.doc_id""",
        # Gopher repetition signals; definitions pinned in
        # operators/textstats.py::repetition_metrics docstring
        "text_repetition": """
            WITH base AS (
              SELECT doc_id,
                     greatest(length(coalesce(text, '')), 1) AS n_chars,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                                    '[^a-z0-9]+'),
                                 t -> t <> '') AS toks,
                     list_filter(list_transform(
                         string_split_regex(coalesce(text, ''), '\r?\n'),
                         x -> trim(x)), x -> x <> '') AS ls
              FROM documents
            ),
            g AS (
              SELECT doc_id, n, gram, count(*) AS cnt
              FROM (
                SELECT b.doc_id, n.n,
                       unnest(list_transform(
                         range(1, len(b.toks) - n.n + 2),
                         i -> array_to_string(b.toks[i:i+n.n-1], ' '))) AS gram
                FROM base b CROSS JOIN (VALUES (2), (3), (5)) n(n)
              ) GROUP BY doc_id, n, gram
            ),
            top AS (
              SELECT doc_id, n, cnt, gram FROM (
                SELECT doc_id, n, gram, cnt,
                       row_number() OVER (PARTITION BY doc_id, n
                                          ORDER BY cnt DESC, gram ASC) AS rn
                FROM g) WHERE rn = 1
            ),
            d5 AS (
              SELECT doc_id,
                     sum(CASE WHEN cnt > 1 THEN cnt * length(gram) END) AS dup,
                     sum(cnt * length(gram)) AS tot
              FROM g WHERE n = 5 GROUP BY doc_id
            )
            SELECT b.doc_id,
                   round(coalesce(t2.cnt * length(t2.gram), 0) * 1.0
                         / b.n_chars, 6) AS top_2gram_char_frac,
                   round(coalesce(t3.cnt * length(t3.gram), 0) * 1.0
                         / b.n_chars, 6) AS top_3gram_char_frac,
                   round(CASE WHEN coalesce(d5.tot, 0) > 0
                              THEN coalesce(d5.dup, 0) * 1.0 / d5.tot
                              ELSE 0.0 END, 6) AS dup_5gram_char_frac,
                   CAST(len(b.ls) AS BIGINT) AS n_lines,
                   round(CASE WHEN len(b.ls) > 0
                              THEN 1.0 - len(list_distinct(b.ls)) * 1.0
                                   / len(b.ls)
                              ELSE 0.0 END, 6) AS frac_dup_lines
            FROM base b
            LEFT JOIN top t2 ON t2.doc_id = b.doc_id AND t2.n = 2
            LEFT JOIN top t3 ON t3.doc_id = b.doc_id AND t3.n = 3
            LEFT JOIN d5 ON d5.doc_id = b.doc_id
            ORDER BY b.doc_id""",
        # ordered sloppy phrase: exists i<j with w1@i, w2@j, j-i-1 <= slop
        "qc26_phrase_slop": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 t -> t <> '') AS toks
              FROM documents
            ),
            hit AS (
              SELECT doc_id,
                len(list_filter(range(1, len(toks)+1),
                    i -> toks[i] = 'fast'
                         AND len(list_filter(range(i+1, i+2),
                             j -> j <= len(toks) AND toks[j] = 'scan')) > 0)) > 0
                  AS m_exact,
                len(list_filter(range(1, len(toks)+1),
                    i -> toks[i] = 'fast'
                         AND len(list_filter(range(i+1, i+5),
                             j -> j <= len(toks) AND toks[j] = 'scan')) > 0)) > 0
                  AS m_slop
              FROM toks
            )
            SELECT
              (SELECT count(*) FROM hit WHERE m_exact) AS cnt_exact,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM hit WHERE m_exact) AS sum_exact,
              (SELECT count(*) FROM hit WHERE m_slop) AS cnt_slop,
              (SELECT CAST(sum(doc_id) AS BIGINT) FROM hit WHERE m_slop) AS sum_slop""",
        # cross-doc line-level boilerplate removal (operators/dedup.py::
        # remove_boilerplate_lines); freq join is on the raw line here vs
        # md5(line) in Spark — equal lines <=> equal hashes, same result
        "dedup_boilerplate": """
            WITH dirty AS (
              SELECT doc_id,
                     coalesce(text, '')
                     || CASE WHEN doc_id % 2 = 0
                             THEN chr(10) || 'subscribe to our newsletter today'
                             ELSE '' END
                     || CASE WHEN doc_id % 3 = 0
                             THEN chr(10) || 'all rights reserved 2024'
                             ELSE '' END
                     || chr(10) || 'unique footer ' || CAST(doc_id AS VARCHAR)
                       AS text
              FROM documents),
            lines AS (
              SELECT doc_id, unnest(ls) AS line,
                     generate_subscripts(ls, 1) AS pos
              FROM (SELECT doc_id, string_split_regex(text, '\\r?\\n') AS ls
                    FROM dirty)),
            freq AS (
              SELECT line, count(DISTINCT doc_id) AS df
              FROM lines GROUP BY line),
            kept AS (
              SELECT l.doc_id, l.line, l.pos
              FROM lines l JOIN freq f ON l.line = f.line
              WHERE f.df < 2 OR trim(l.line) = ''),
            rebuilt AS (
              SELECT doc_id,
                     string_agg(line, chr(10) ORDER BY pos) AS new_text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(r.new_text, '') AS text,
                   CAST(len(string_split_regex(d.text, '\\r?\\n')) AS INTEGER)
                     AS n_lines,
                   CAST(len(string_split_regex(d.text, '\\r?\\n'))
                        - coalesce(r.n_kept, 0) AS INTEGER) AS n_removed
            FROM dirty d LEFT JOIN rebuilt r USING (doc_id)
            ORDER BY d.doc_id""",
        # cross-doc duplicated n-gram fraction (operators/dedup.py::
        # cross_doc_ngram_dup), n=3, min_docs=2
        "dedup_crossgram": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                 '[^a-z0-9]+'), x -> x <> '') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                          ELSE list_transform(
                                 range(1, greatest(len(toks) - 2, 1) + 1),
                                 i -> array_to_string(toks[i:i+2], ' ')) END
                       AS grams
              FROM t),
            e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            freq AS (
              SELECT gram, count(DISTINCT doc_id) AS df
              FROM e GROUP BY gram),
            roll AS (
              SELECT e.doc_id,
                     count(*) AS n_grams,
                     sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS n_dup
              FROM e JOIN freq f USING (gram)
              GROUP BY e.doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(r.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(r.n_dup, 0) AS BIGINT) AS n_dup_grams,
                   round(CAST(coalesce(r.n_dup, 0) AS DOUBLE)
                         / CAST(greatest(coalesce(r.n_grams, 0), 1) AS DOUBLE),
                         6) AS dup_frac
            FROM documents d LEFT JOIN roll r USING (doc_id)
            ORDER BY d.doc_id""",
        # Gopher rule set (operators/textstats.py::gopher_rules) with the
        # same modular-class injection as the Spark side
        "text_gopher": """
            WITH dirty AS (
              SELECT doc_id,
                     coalesce(text, '')
                     || CASE WHEN doc_id % 5 = 0
                             THEN chr(10) || '- bullet item alpha'
                                  || chr(10) || '- bullet item beta'
                             ELSE '' END
                     || CASE WHEN doc_id % 7 = 0
                             THEN chr(10) || 'this trails off...'
                             ELSE '' END
                     || CASE WHEN doc_id % 11 = 0 THEN ' ## ## #'
                             ELSE '' END AS text
              FROM documents),
            sig AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'),
                                 w -> w <> '') AS words,
                     list_filter(list_transform(string_split_regex(text, '\\r?\\n'),
                                                l -> trim(l)),
                                 l -> l <> '') AS lines,
                     len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS n_sym
              FROM dirty),
            m AS (
              SELECT doc_id,
                     CAST(len(words) AS INTEGER) AS n_words,
                     round(coalesce(list_sum(list_transform(words,
                             w -> CAST(length(w) AS DOUBLE))), 0.0)
                           / CAST(greatest(len(words), 1) AS DOUBLE), 6)
                       AS mean_word_len,
                     round(CAST(len(list_filter(lines,
                             l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE)
                           / CAST(greatest(len(lines), 1) AS DOUBLE), 6)
                       AS bullet_line_frac,
                     round(CAST(len(list_filter(lines,
                             l -> regexp_matches(l, '(\\.\\.\\.|…)$')))
                           AS DOUBLE)
                           / CAST(greatest(len(lines), 1) AS DOUBLE), 6)
                       AS ellipsis_line_frac,
                     round(CAST(n_sym AS DOUBLE)
                           / CAST(greatest(len(words), 1) AS DOUBLE), 6)
                       AS symbol_word_ratio,
                     round(CAST(len(list_filter(words,
                             w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
                           / CAST(greatest(len(words), 1) AS DOUBLE), 6)
                       AS alpha_word_frac,
                     CAST(len(list_filter(
                             ['the','be','to','of','and','that','have','with'],
                             r -> list_contains(list_transform(words,
                                    w -> lower(w)), r))) AS INTEGER)
                       AS required_word_hits
              FROM sig)
            SELECT doc_id, n_words, mean_word_len, bullet_line_frac,
                   ellipsis_line_frac, symbol_word_ratio, alpha_word_frac,
                   required_word_hits,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND bullet_line_frac <= 0.9
                    AND ellipsis_line_frac <= 0.3
                    AND symbol_word_ratio <= 0.1
                    AND alpha_word_frac >= 0.8
                    AND required_word_hits >= 2) AS gopher_pass
            FROM m ORDER BY doc_id""",
        # C4 cleaning rules (operators/textstats.py::c4_filters) with the
        # same modular-class injection as the Spark side
        "text_c4": """
            WITH dirty AS (
              SELECT doc_id,
                     coalesce(text, '')
                     || chr(10) || 'first generated sentence for doc '
                     || CAST(doc_id AS VARCHAR) || ' ends here.'
                     || CASE WHEN doc_id % 2 = 0
                             THEN chr(10)
                               || 'second sentence is also kept here. '
                               || 'third one makes the page long enough! '
                               || 'is this a question? yes it is. '
                               || 'final sentence closes it.'
                             ELSE '' END
                     || CASE WHEN doc_id % 3 = 0
                             THEN chr(10) || 'too short.' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                             THEN chr(10) || 'please enable javascript'
                               || ' to continue reading.'
                             ELSE '' END
                     || CASE WHEN doc_id % 7 = 0
                             THEN chr(10) || 'lorem ipsum dolor sit amet.'
                             ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                             THEN chr(10) || 'curly { brace } line.'
                             ELSE '' END AS text
              FROM documents),
            t AS (
              SELECT doc_id, text,
                     list_filter(
                       list_transform(string_split_regex(text, '\\r?\\n'),
                                      l -> trim(l)),
                       l -> regexp_matches(l, '[.!?"]$')
                            AND len(list_filter(
                                  string_split_regex(l, '\\s+'),
                                  w -> w <> '')) >= 3
                            AND NOT regexp_matches(lower(l), 'javascript'))
                       AS kept,
                     len(string_split_regex(text, '\\r?\\n')) AS n_lines
              FROM dirty),
            s AS (
              SELECT doc_id, text,
                     array_to_string(kept, chr(10)) AS new_text,
                     CAST(len(kept) AS INTEGER) AS n_lines_kept,
                     CAST(n_lines - len(kept) AS INTEGER) AS n_lines_dropped
              FROM t)
            SELECT doc_id, new_text AS text, n_lines_kept, n_lines_dropped,
                   CAST(len(regexp_extract_all(new_text,
                     '[.!?]("|\\s|$)')) AS INTEGER) AS n_sentences,
                   (len(regexp_extract_all(new_text, '[.!?]("|\\s|$)')) >= 5
                    AND NOT contains(lower(text), 'lorem ipsum')
                    AND NOT contains(text, '{')) AS c4_keep
            FROM s ORDER BY doc_id""",
        # cross-doc duplicated-span removal (operators/dedup.py::
        # remove_duplicate_spans), n=3, min_docs=2; Spark positions are
        # 0-based, generate_subscripts is 1-based -> the pos - 1 shift
        "dedup_spans": """
            WITH t AS (
              SELECT doc_id, text IS NULL AS tnull,
                     list_filter(string_split_regex(lower(coalesce(text, '')),
                                 '[^a-z0-9]+'), x -> x <> '') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                          ELSE list_transform(
                                 range(1, greatest(len(toks) - 2, 1) + 1),
                                 i -> array_to_string(toks[i:i+2], ' ')) END
                       AS grams
              FROM t),
            e AS (
              SELECT doc_id, unnest(grams) AS gram,
                     generate_subscripts(grams, 1) AS pos
              FROM g),
            freq AS (
              SELECT gram, count(DISTINCT doc_id) AS df
              FROM e GROUP BY gram),
            ds AS (
              SELECT e.doc_id, list_sort(list(e.pos - 1)) AS starts
              FROM e JOIN freq USING (gram)
              WHERE freq.df >= 2 GROUP BY e.doc_id),
            j AS (
              SELECT t.doc_id, t.tnull, t.toks,
                     coalesce(ds.starts, CAST([] AS INTEGER[])) AS starts
              FROM t LEFT JOIN ds USING (doc_id)),
            k AS (
              SELECT doc_id, tnull, toks,
                     list_filter(range(1, len(toks) + 1),
                       i -> len(list_filter(starts,
                              s -> (i - 1) >= s
                                   AND (i - 1) <= s + least(3, len(toks)) - 1
                            )) = 0) AS keep_idx
              FROM j)
            SELECT doc_id,
                   CASE WHEN tnull THEN NULL
                        ELSE coalesce(array_to_string(
                               list_transform(keep_idx, i -> toks[i]), ' '),
                               '')
                   END AS text,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(toks) - len(keep_idx) AS BIGINT)
                     AS n_removed_tokens
            FROM k ORDER BY doc_id""",
        # k-means E-step (operators/clustering.py::kmeans_assign):
        # centroids = the KMEANS_K lowest vec_ids' vectors; argmin of the
        # squared L2 distance, ties to the lowest cell. Margins (min
        # best-vs-2nd 8e-4 at sf0.01) dwarf cross-engine float noise.
        "emb_kmeans_assign": f"""
            WITH cent AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                     CAST(embedding AS DOUBLE[]) AS cvec
              FROM (SELECT * FROM embeddings ORDER BY vec_id
                    LIMIT {KMEANS_K})
            ),
            d AS (
              SELECT e.vec_id AS id, c.cell,
                     list_sum(list_transform(
                       list_zip(CAST(e.embedding AS DOUBLE[]), c.cvec),
                       x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist
              FROM embeddings e CROSS JOIN cent c
            ),
            r AS (
              SELECT id, cell, row_number()
                       OVER (PARTITION BY id ORDER BY dist, cell) AS rn
              FROM d
            )
            SELECT id, CAST(cell AS INT) AS cell FROM r WHERE rn = 1
            ORDER BY id""",
        # SemDedup (operators/clustering.py::semdedup): same assignment,
        # then drop rows with a lower-id in-cell neighbor of cosine >=
        # threshold (min |cos - t| 1e-4 >> float noise)
        "emb_semdedup": f"""
            WITH cent AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                     CAST(embedding AS DOUBLE[]) AS cvec
              FROM (SELECT * FROM embeddings ORDER BY vec_id
                    LIMIT {KMEANS_K})
            ),
            dd AS (
              SELECT e.vec_id AS id, c.cell,
                     list_sum(list_transform(
                       list_zip(CAST(e.embedding AS DOUBLE[]), c.cvec),
                       x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist
              FROM embeddings e CROSS JOIN cent c
            ),
            asg AS (
              SELECT id, CAST(cell AS INT) AS cell FROM (
                SELECT id, cell, row_number()
                         OVER (PARTITION BY id ORDER BY dist, cell) AS rn
                FROM dd) WHERE rn = 1
            ),
            v AS (
              SELECT vec_id AS id, embedding AS v,
                     sqrt(list_sum(list_transform(
                       range(1, len(embedding) + 1),
                       i -> CAST(embedding[i] AS DOUBLE)
                            * CAST(embedding[i] AS DOUBLE)))) AS nrm
              FROM embeddings
            ),
            dropped AS (
              SELECT DISTINCT y.id
              FROM asg x JOIN asg y
                ON x.cell = y.cell AND x.id < y.id
              JOIN v a ON a.id = x.id
              JOIN v b ON b.id = y.id
              WHERE CASE WHEN a.nrm > 0 AND b.nrm > 0 THEN
                      list_sum(list_transform(range(1, len(a.v) + 1),
                        i -> CAST(a.v[i] AS DOUBLE)
                             * CAST(b.v[i] AS DOUBLE)))
                      / (a.nrm * b.nrm)
                    END >= {EMB_DUP_T}
            )
            SELECT asg.id, asg.cell, dropped.id IS NULL AS keep
            FROM asg LEFT JOIN dropped ON asg.id = dropped.id
            ORDER BY asg.id""",
        # hashed linear classifier (operators/classify.py::
        # classifier_score): md5-bucket weight lookup + integer fold —
        # BIGINT-exact in both engines
        "classifier_score": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                       lower(coalesce(text, '')), '[^a-z0-9]+'),
                       x -> x <> '') AS toks
              FROM documents
            )
            SELECT doc_id AS id,
                   CAST(len(toks) AS INTEGER) AS n_tokens,
                   CAST(coalesce(list_sum(list_transform(toks,
                     t -> ({CLF_WEIGHTS})[
                       CAST(CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)
                            % {CLF_DIM} AS INTEGER) + 1])), 0)
                     AS BIGINT) AS score,
                   CAST(coalesce(list_sum(list_transform(toks,
                     t -> ({CLF_WEIGHTS})[
                       CAST(CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)
                            % {CLF_DIM} AS INTEGER) + 1])), 0)
                     AS BIGINT) >= 0 AS keep
            FROM t ORDER BY id""",
        # vocabulary linear classifier (classifier_score_vocab): explode
        # + weight-table left join + per-doc sum; integer-valued double
        # weights keep the sums order-independent-exact
        "classifier_vocab": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                       lower(coalesce(text, '')), '[^a-z0-9]+'),
                       x -> x <> '') AS toks
              FROM documents
            ),
            w AS (
              SELECT * FROM (VALUES {
                  ", ".join(f"('{t}', CAST({v} AS DOUBLE))"
                            for t, v in CLF_VOCAB)
              }) AS w(term, weight)
            ),
            e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
            s AS (
              SELECT e.doc_id,
                     count(*) AS n_tokens,
                     coalesce(sum(w.weight), 0.0) + 1.0 AS score
              FROM e LEFT JOIN w ON e.tok = w.term
              GROUP BY e.doc_id
            )
            SELECT t.doc_id AS id,
                   CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
                   coalesce(s.score, 1.0) AS score
            FROM t LEFT JOIN s ON t.doc_id = s.doc_id
            ORDER BY id""",
        # token-budget mixture sampling (operators/sampling.py::
        # mixture_sample): scale_g = budget * normalized-weight is a
        # driver-side literal in BOTH engines; the one data-dependent
        # float op (scale / group-total) is a single IEEE division, so
        # the keep booleans are bit-identical
        "mixture_sample": f"""
            WITH tok AS (
              SELECT doc_id, lang,
                     CAST(len(list_filter(string_split_regex(
                       lower(coalesce(text, '')), '[^a-z0-9]+'),
                       x -> x <> '')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            tot AS (SELECT lang, sum(n_tokens) AS t FROM tok
                    GROUP BY lang),
            r AS (
              SELECT lang,
                     CASE WHEN t = 0 THEN 0.0
                          ELSE least(1.0,
                            CASE lang {
                                " ".join(
                                    f"WHEN '{g}' THEN "
                                    f"{MIX_BUDGET * (w / sum(MIX_WEIGHTS.values()))!r}"
                                    for g, w in sorted(MIX_WEIGHTS.items())
                                )
                            } ELSE 0.0 END / CAST(t AS DOUBLE))
                     END AS rate
              FROM tot)
            SELECT tok.doc_id, tok.lang, tok.n_tokens,
                   CAST('0x' || substr(md5(CAST(tok.doc_id AS VARCHAR)),
                        1, 8) AS BIGINT) % 10000 < rate * 10000 AS keep
            FROM tok JOIN r USING (lang)
            ORDER BY doc_id""",
        # up-sampling mixture (allow_repeats): uncapped rate; n_copies =
        # floor(rate) + hash-selected fractional slice. floor/subtract
        # are single IEEE ops on the bit-identical rate, so the integer
        # output is engine-exact.
        "mixture_repeats": f"""
            WITH tok AS (
              SELECT doc_id, lang,
                     CAST(len(list_filter(string_split_regex(
                       lower(coalesce(text, '')), '[^a-z0-9]+'),
                       x -> x <> '')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            tot AS (SELECT lang, sum(n_tokens) AS t FROM tok
                    GROUP BY lang),
            r AS (
              SELECT lang,
                     CASE WHEN t = 0 THEN 0.0
                          ELSE CASE lang {
                                " ".join(
                                    f"WHEN '{g}' THEN "
                                    f"{MIXR_BUDGET * (w / sum(MIXR_WEIGHTS.values()))!r}"
                                    for g, w in sorted(MIXR_WEIGHTS.items())
                                )
                            } ELSE 0.0 END / CAST(t AS DOUBLE)
                     END AS rate
              FROM tot)
            SELECT tok.doc_id, tok.lang, tok.n_tokens,
                   CAST(floor(rate) AS BIGINT)
                   + CASE WHEN CAST('0x' || substr(md5(
                       CAST(tok.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                       % 10000 < (rate - floor(rate)) * 10000
                     THEN 1 ELSE 0 END AS n_copies
            FROM tok JOIN r USING (lang)
            ORDER BY doc_id""",
        # quality-aware budget selection (operators/sampling.py::
        # select_top_by_budget): greedy prefix of (score desc, id asc)
        # under per-group integer token budgets
        "select_budget": f"""
            WITH t AS (
              SELECT doc_id, lang,
                     list_filter(string_split_regex(
                       lower(coalesce(text, '')), '[^a-z0-9]+'),
                       x -> x <> '') AS toks
              FROM documents
            ),
            s AS (
              SELECT doc_id, lang,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     CAST(coalesce(list_sum(list_transform(toks,
                       tk -> ({CLF_WEIGHTS})[
                         CAST(CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT)
                              % {CLF_DIM} AS INTEGER) + 1])), 0)
                       AS BIGINT) AS score
              FROM t
            ),
            c AS (
              SELECT *,
                     sum(n_tokens) OVER (PARTITION BY lang
                       ORDER BY score DESC, doc_id ASC
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM s
            )
            SELECT doc_id, lang, n_tokens, score,
                   coalesce(cum <= CASE lang {
                       " ".join(
                           f"WHEN '{g}' THEN {b}"
                           for g, b in sorted(SEL_BUDGETS.items())
                       )
                   } END, FALSE) AS keep
            FROM c ORDER BY doc_id""",
        # feature-hashing embedding (operators/classify.py::hash_embed):
        # per-slot token counts via the shared md5 bucket, L2-normalized.
        # Counts are integers and the normalization is one sqrt + one
        # division per slot — bit-identical doubles in both engines.
        "text_hash_embed": f"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(
                       lower(coalesce(text, '')), '[^a-z0-9]+'),
                       x -> x <> '') AS toks
              FROM documents
            ),
            c AS (
              SELECT doc_id,
                     list_transform(range(0, {HASH_EMBED_DIM}),
                       i -> CAST(len(list_filter(toks,
                         tk -> CAST(CAST('0x' || substr(md5(tk), 1, 8)
                                    AS BIGINT) % {HASH_EMBED_DIM}
                                    AS BIGINT) = i)) AS DOUBLE)) AS v
              FROM t
            ),
            n AS (
              SELECT doc_id, v,
                     sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
              FROM c
            ),
            fin AS (
              SELECT doc_id,
                     CASE WHEN nrm > 0
                          THEN list_transform(v, x -> x / nrm)
                          ELSE v END AS emb
              FROM n
            )
            -- scalar (id, pos, value) rows: the driver's pandas canon
            -- cannot hash list cells (VERDICT r4 #1)
            SELECT doc_id AS id, CAST(j AS INT) AS pos,
                   emb[CAST(j + 1 AS INT)] AS value
            FROM fin, range(0, {HASH_EMBED_DIM}) t(j)
            ORDER BY id, pos""",
        # HTML strip (operators/textstats.py::strip_html): the same
        # RE2-portable regex chain + entity replaces + clean_text finish,
        # over the same injected scaffold
        "strip_html": r"""
            WITH dirty AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 4 = 0
                          THEN '<html><head><style>p {color: red}</style>'
                               || '<script type="text/javascript">'
                               || 'var x = 1 < 2;</script>'
                               || '</head><body><!-- a' || chr(10)
                               || 'comment --><h1>Title&nbsp;One</h1><p>'
                               || coalesce(text, '')
                               || '</p><br><div>Footer &amp; more '
                               || '&lt;tag&gt; &quot;q&quot; '
                               || 'it&#39;s</div></body></html>'
                          ELSE text END AS text
              FROM documents),
            stripped AS (
              SELECT doc_id,
                     replace(replace(replace(replace(replace(replace(
                       replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(
                               regexp_replace(
                                 regexp_replace(text,
                                   '(?is)<script[^>]*>.*?</script>', ' ',
                                   'g'),
                                 '(?is)<style[^>]*>.*?</style>', ' ',
                                 'g'),
                               '(?is)<!--.*?-->', ' ', 'g'),
                             '(?i)</?(p|div|li|ul|ol|h[1-6]|tr|table|blockquote|br)(>|[\s/][^>]*>)',
                             chr(10), 'g'),
                           '<[^>]+>', ' ', 'g'),
                       '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                       '&quot;', '"'), '&#39;', ''''), '&apos;', ''''),
                       '&amp;', '&') AS text
              FROM dirty)
            SELECT doc_id,
                   regexp_replace(
                     trim(regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(text,
                             '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
                           '[ \t]+', ' ', 'g'),
                         ' ?\n ?', chr(10), 'g'),
                       '\n{3,}', chr(10) || chr(10), 'g'),
                     ' '),
                   '^\n+|\n+$', '', 'g') AS text
            FROM stripped ORDER BY doc_id""",
    }
    return _derived_oracles(out)


def _derived_oracles(o: dict[str, str]) -> dict[str, str]:
    """Entries that are alternate execution paths of an already-oracled
    operator share its SQL verbatim — same semantics, different plan."""
    o["qc19_bucketed_term"] = o["qc06_match_term"]
    o["qc20_saved_index"] = o["qc10_bm25_topk"]
    o["qc23_query_join_idpath"] = o["qc15_query_join"]
    o["qc24_batch_shuffle_hash"] = o["qc11_batch_search"]
    o["qc25_raw_query"] = o["qc22_match_alltext"]
    o["qc27_doc_bucket_lookup"] = o["qc13_doc_lookup"]
    o["emb_semdedup_arrow"] = o["emb_semdedup"]
    o["text_hash_embed_arrow"] = o["text_hash_embed"]
    o["table_profile"] = _profile_oracle_sql()
    o["events_props"] = """
        SELECT event_type AS "group",
               count(*) AS n_events,
               count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS n_with_field,
               CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS BIGINT) AS sum_field,
               min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS min_field,
               max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                 AS max_field
        FROM events GROUP BY event_type ORDER BY "group\""""
    # top-k search + snippets: qc10's hits as a CTE, then the identical
    # strpos/substr arithmetic (terms sorted; earliest pos wins, ties to
    # the lexicographically smaller term)
    t1, t2 = sorted(QC10_TERMS)
    o["search_highlight"] = (
        "WITH hits AS (" + o["qc10_bm25_topk"] + f"""
        ),
        j AS (
          SELECT h.doc_id, h.score, h.rank, d.text,
                 CASE WHEN regexp_matches(d.text, '(?is){t1}')
                      THEN length(regexp_replace(d.text,
                             '(?is){t1}.*$', '')) + 1 END AS p1,
                 CASE WHEN regexp_matches(d.text, '(?is){t2}')
                      THEN length(regexp_replace(d.text,
                             '(?is){t2}.*$', '')) + 1 END AS p2
          FROM hits h JOIN documents d USING (doc_id)
        ),
        m AS (
          SELECT doc_id, score, rank, text,
                 CASE WHEN p1 IS NOT NULL AND (p2 IS NULL OR p1 <= p2)
                        THEN '{t1}'
                      WHEN p2 IS NOT NULL THEN '{t2}' END AS match_term,
                 CASE WHEN p1 IS NOT NULL AND (p2 IS NULL OR p1 <= p2)
                        THEN p1
                      WHEN p2 IS NOT NULL THEN p2 END AS match_pos
          FROM j
        )
        SELECT doc_id, score, rank, match_term,
               CAST(match_pos AS INTEGER) AS match_pos,
               CASE WHEN match_pos IS NOT NULL THEN
                 substr(text, CAST(greatest(1, match_pos - 20) AS INTEGER),
                        CAST((match_pos - greatest(1, match_pos - 20))
                             + length(match_term) + 20 AS INTEGER))
               END AS snippet
        FROM m ORDER BY rank"""
    )
    o["search_facets"] = _CTE + f"""
        , matched AS (
          SELECT DISTINCT p.doc_id FROM postings p
          WHERE p.term IN ('{QC10_TERMS[0]}','{QC10_TERMS[1]}')
        )
        SELECT 'lang' AS facet, CAST(d.lang AS VARCHAR) AS value,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM matched m JOIN documents d USING (doc_id) GROUP BY d.lang
        UNION ALL
        SELECT 'source', CAST(d.source AS VARCHAR),
               CAST(count(*) AS BIGINT)
        FROM matched m JOIN documents d USING (doc_id) GROUP BY d.source
        ORDER BY facet, value NULLS LAST"""
    # pagination: page 2 = ranks 6..10 of the flagship top-10
    o["search_paged"] = (
        "WITH h AS (" + o["qc10_bm25_topk"] + ") "
        "SELECT doc_id, score, rank FROM h WHERE rank > 5 ORDER BY rank"
    )
    # cursor pagination: same rank>5 slice, but ranks are page-local
    # (search_after restarts row_number per page)
    o["search_after_page"] = (
        "WITH h AS (" + o["qc10_bm25_topk"] + ") "
        "SELECT doc_id, score, "
        "CAST(row_number() OVER (ORDER BY rank) AS BIGINT) AS rank "
        "FROM h WHERE rank > 5 ORDER BY rank"
    )
    # CCNet bucketing: percent_rank per lang over the rounded unigram
    # avg_nll (the unigram_quality oracle nested whole, memory-pattern
    # "oracle composition"); cut literals 1.0/3.0 and 2.0/3.0 are the
    # same IEEE doubles Spark's F.lit(1/3) produces
    o["text_ppl_buckets"] = (
        "WITH u AS (" + o["unigram_quality"] + "), "
        "nll AS (SELECT u.doc_id, d.lang, u.avg_nll "
        "        FROM u JOIN documents d USING (doc_id)), "
        "pr AS (SELECT doc_id, lang, avg_nll, "
        "         percent_rank() OVER (PARTITION BY lang "
        "                              ORDER BY avg_nll) AS p "
        "       FROM nll) "
        "SELECT doc_id, lang, avg_nll, "
        "  CASE WHEN p < 1.0/3.0 THEN 'head' "
        "       WHEN p < 2.0/3.0 THEN 'middle' "
        "       ELSE 'tail' END AS bucket "
        "FROM pr ORDER BY doc_id"
    )
    # gazetteer tagging: all-occurrence unigrams + qc09-shape bigrams in
    # one union, VALUES dictionary join, per-(doc, phrase) counts
    o["text_dict_tag"] = f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                                                '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        g1 AS (SELECT doc_id, unnest(toks) AS gram FROM t),
        g2 AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS gram
          FROM t WHERE len(toks) >= 2
        ),
        g AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2),
        dict(gram, tag, phrase) AS (VALUES
          ('{QC06_TERM}', 'topic_a', '{QC06_TERM}'),
          ('{QC09_W1} {QC09_W2}', 'bigram', '{QC09_W1} {QC09_W2}'),
          ('spark', 'topic_b', 'spark'))
        SELECT g.doc_id, d.tag, d.phrase,
               CAST(count(*) AS BIGINT) AS n_hits
        FROM g JOIN dict d USING (gram)
        GROUP BY g.doc_id, d.tag, d.phrase
        ORDER BY doc_id, tag, phrase"""
    # multi-term DSL batch: the pattern table expands against the _CTE
    # vocabulary (LIKE / anchored regexp / levenshtein — same unit-cost
    # edit distance as Spark), matched terms join postings, constant
    # score 1.0, rank by doc_id (score ties)
    o["batch_dsl_multiterm"] = _CTE + f"""
        , pats AS (
          SELECT * FROM (VALUES
            (1, 'like', 'du%', 0),
            (2, 're', '^(?:sp[a-z]rk)$', 0),
            (3, 'fz', 'sparc', 1)
          ) AS t(query_id, kind, pat, edits)
        ),
        m AS (
          SELECT p.query_id, ts.term
          FROM termstats ts CROSS JOIN pats p
          WHERE (p.kind = 'like' AND ts.term LIKE p.pat)
             OR (p.kind = 're' AND regexp_matches(ts.term, p.pat))
             OR (p.kind = 'fz'
                 AND abs(length(ts.term) - length(p.pat)) <= p.edits
                 AND levenshtein(ts.term, p.pat) <= p.edits)
        ),
        d AS (
          SELECT DISTINCT m.query_id, p.doc_id
          FROM m JOIN postings p USING (term)
        ),
        r AS (
          SELECT query_id, doc_id, 1.0 AS score,
                 CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY doc_id) AS BIGINT) AS rank
          FROM d
        )
        SELECT * FROM r WHERE rank <= {MT_K}
        ORDER BY query_id, rank"""
    # temperature mixture: sqrt weights normalized with lang-ORDERED
    # sums (mirrors the Python sorted-accumulation), one division per
    # stage, same min-cap; rounds only at output
    o["mixture_temperature"] = f"""
        WITH tok AS (
          SELECT lang,
                 CAST(len(list_filter(string_split_regex(
                   lower(coalesce(text, '')), '[^a-z0-9]+'),
                   x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ),
        tot AS (SELECT lang, sum(n_tokens) AS t FROM tok GROUP BY lang),
        p AS (
          SELECT lang, CAST(t AS BIGINT) AS t,
                 sqrt(CAST(t AS DOUBLE)) AS pw
          FROM tot WHERE lang IS NOT NULL AND t > 0
        ),
        s AS (SELECT sum(pw ORDER BY lang) AS sp FROM p),
        w AS (SELECT lang, t, pw / (SELECT sp FROM s) AS w FROM p),
        sw AS (SELECT sum(w ORDER BY lang) AS sw FROM w)
        SELECT lang, t AS total_tokens, round(w, 6) AS weight,
               round(least(1.0,
                 ({MIX_BUDGET} * (w / (SELECT sw FROM sw)))
                   / CAST(t AS DOUBLE)), 6) AS rate
        FROM w ORDER BY lang"""
    # ES multi_match best_fields: per-field BM25 with per-field stats
    # (text = the _CTE family; source = 1-token field), combined
    # best + 0.3*(sum - best)
    _mm_terms = "'dup','spark','src3'"
    o["search_multi_match"] = _CTE + f"""
        , s_text AS (
          SELECT p.doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ({_mm_terms}) GROUP BY p.doc_id
        ),
        sp AS (SELECT doc_id, lower(source) AS term FROM documents),
        sdf AS (SELECT term, count(*) AS df FROM sp GROUP BY term),
        sfs AS (SELECT count(*) AS n, 1.0 AS avgdl FROM sp),
        s_src AS (
          SELECT p.doc_id,
                 sum({_bm25_sql("1", "1", "d.df", "f2.n", "f2.avgdl")}) AS s
          FROM sp p JOIN sdf d USING (term) CROSS JOIN sfs f2
          WHERE p.term IN ({_mm_terms}) GROUP BY p.doc_id
        ),
        u AS (
          SELECT doc_id, s FROM s_text
          UNION ALL SELECT doc_id, s FROM s_src
        ),
        agg AS (
          SELECT doc_id, max(s) AS mx, sum(s) AS sm
          FROM u GROUP BY doc_id
        )
        SELECT doc_id, round(mx + 0.3 * (sm - mx), 6) AS score,
               CAST(row_number() OVER (
                 ORDER BY (mx + 0.3 * (sm - mx)) DESC, doc_id)
                 AS BIGINT) AS rank
        FROM agg ORDER BY 3 LIMIT 10"""
    # within-doc line dedup: first-occurrence filter via (x, i) lambda;
    # Spark's array_join on NULL text is guarded to NULL in both
    o["text_dedup_lines"] = r"""
        WITH l AS (
          SELECT doc_id, text,
                 string_split_regex(coalesce(text, ''), '\r?\n') AS ls
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN text IS NULL THEN NULL
                    ELSE array_to_string(
                      list_filter(ls, (x, i) -> list_position(ls, x) = i),
                      chr(10)) END AS text,
               CAST(len(ls) - len(list_filter(ls,
                      (x, i) -> list_position(ls, x) = i)) AS BIGINT)
                 AS n_dup_lines
        FROM l ORDER BY doc_id"""
    # token entropy: same ln(n) - sum(tf ln tf)/n shape as the Spark op;
    # norm_entropy divides the UNROUNDED entropy, rounding only at output
    o["text_entropy"] = """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                                                '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        e AS (SELECT doc_id, unnest(toks) AS term FROM t),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM e GROUP BY doc_id, term),
        agg AS (
          SELECT doc_id,
                 CAST(sum(tf) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_types,
                 ln(CAST(sum(tf) AS DOUBLE))
                   - sum(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE)))
                     / CAST(sum(tf) AS DOUBLE) AS entropy
          FROM tf GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_tokens, 0) AS n_tokens,
               coalesce(a.n_types, 0) AS n_types,
               round(CASE WHEN coalesce(a.n_tokens, 0) > 0
                          THEN CAST(a.n_types AS DOUBLE)
                               / CAST(a.n_tokens AS DOUBLE)
                          ELSE 0.0 END, 6) AS ttr,
               round(coalesce(a.entropy, 0.0), 6) AS entropy,
               round(CASE WHEN coalesce(a.n_types, 0) > 1
                          THEN a.entropy
                               / ln(CAST(a.n_types AS DOUBLE))
                          ELSE 0.0 END, 6) AS norm_entropy
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id"""
    # query-scoped metric aggs: n_chars stats per lang over the qc10
    # match set (any-of-terms distinct docs)
    o["search_facet_metrics"] = _CTE + f"""
        , m AS (
          SELECT DISTINCT doc_id FROM postings
          WHERE term IN ('{QC10_TERMS[0]}','{QC10_TERMS[1]}')
        ),
        j AS (
          SELECT d.lang, CAST(d.n_chars AS DOUBLE) AS v
          FROM m JOIN documents d USING (doc_id)
        )
        SELECT CAST(lang AS VARCHAR) AS value,
               CAST(count(*) AS BIGINT) AS n_docs,
               sum(v) AS sum_n_chars,
               round(avg(v), 6) AS avg_n_chars,
               min(v) AS min_n_chars,
               max(v) AS max_n_chars,
               CAST(count(DISTINCT v) AS BIGINT) AS distinct_n_chars
        FROM j GROUP BY lang ORDER BY value"""
    # ES-style rescore: qc10's top-30 window, qc09's phrase at 2x, re-rank.
    # Phrase score = sum of the 2 phrase terms' BM25 (IEEE-commutative-
    # safe pair); fused = 1.0*s + 2.0*ps mirrors the Spark shape.
    o["search_rescore"] = _CTE + f"""
        , scored AS (
          SELECT p.doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ('{QC10_TERMS[0]}','{QC10_TERMS[1]}')
          GROUP BY p.doc_id
        ),
        win AS (SELECT doc_id, s FROM scored ORDER BY s DESC, doc_id
                LIMIT 30),
        phdocs AS (
          SELECT doc_id FROM toks
          WHERE list_contains(
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1]),
            '{QC09_W1} {QC09_W2}')
        ),
        ph AS (
          SELECT p.doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS ps
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ('{QC09_W1}','{QC09_W2}')
            AND p.doc_id IN (SELECT doc_id FROM phdocs)
          GROUP BY p.doc_id
        ),
        fused AS (
          SELECT w.doc_id,
                 CASE WHEN ph.doc_id IS NULL THEN 1.0 * w.s
                      ELSE 1.0 * w.s + 2.0 * ph.ps END AS fs
          FROM win w LEFT JOIN ph USING (doc_id)
        )
        SELECT doc_id, round(fs, 6) AS score,
               CAST(row_number() OVER (ORDER BY fs DESC, doc_id)
                    AS BIGINT) AS rank
        FROM fused ORDER BY fs DESC, doc_id LIMIT 10"""
    # Lucene-explain breakdown: the qc10 CTE's postings scored per term,
    # tf_norm = tsc/idf in the same shape Spark divides (bit-equal)
    o["search_explain"] = _CTE + f"""
        , m AS (
          SELECT p.doc_id, p.term, p.tf, p.dl, t.df,
                 ln(1.0 + (f.n - t.df + 0.5) / (t.df + 0.5)) AS idf,
                 {_bm25_sql("p.tf", "p.dl", "t.df")} AS tsc
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ('{QC10_TERMS[0]}','{QC10_TERMS[1]}')
        )
        SELECT doc_id, term, 1.0 AS weight,
               CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl,
               CAST(df AS BIGINT) AS df_t,
               round(idf, 6) AS idf,
               round(tsc / idf, 6) AS tf_norm,
               round(tsc, 6) AS tscore,
               CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT)
                 AS n_matched,
               round(sum(tsc) OVER (PARTITION BY doc_id), 6) AS score
        FROM m ORDER BY doc_id, term"""
    o["search_grouped"] = _CTE + f"""
        , scored AS (
          SELECT p.doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ('{QC10_TERMS[0]}','{QC10_TERMS[1]}')
          GROUP BY p.doc_id
        ),
        g AS (
          SELECT d.lang AS "group", s.doc_id, s.s,
                 CAST(row_number() OVER (PARTITION BY d.lang
                        ORDER BY s.s DESC, s.doc_id) AS BIGINT) AS rank
          FROM scored s JOIN documents d USING (doc_id)
        )
        SELECT "group", doc_id, round(s, 6) AS score, rank
        FROM g WHERE rank <= 3 ORDER BY "group", rank"""
    # bigram-LM quality (decontam.py::bigram_logprob): MLE conditional
    # p(w2|w1) over adjacent pairs; round(,6) absorbs sum-order noise
    # exactly like the unigram oracle
    o["bigram_quality"] = """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                                                '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        e AS (
          SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
          FROM t, unnest(range(1, greatest(len(toks), 1))) AS r(i)
        ),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM e GROUP BY w1, w2),
        c1 AS (SELECT w1, count(*) AS c1 FROM e GROUP BY w1),
        s AS (
          SELECT e.doc_id,
                 -ln(CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
                   AS nll
          FROM e JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        ),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 avg(nll) AS avg_nll
          FROM s GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_bigrams, 0) AS n_bigrams,
               round(coalesce(a.avg_nll, 0.0), 6) AS avg_nll
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id"""
    # winnowing overlap pairs (dedup.py::winnow_overlap_pairs): the
    # doc_winnow selection chain, exploded and pair-joined on the hash;
    # containment overlap = shared / min(|sel|)
    o["dedup_winnow_pairs"] = """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                             '[^a-z0-9]+'), x -> x <> '') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id,
                 list_transform(
                   range(1, greatest(len(toks) - 4, 1) + 1),
                   i -> array_to_string(toks[i:i+4], ' ')) AS grams
          FROM t
        ),
        hh AS (
          SELECT doc_id, list_transform(grams, x -> md5(x)) AS hs FROM g
        ),
        w AS (
          SELECT doc_id,
                 list_transform(
                   range(1, greatest(len(hs) - 3, 1) + 1),
                   i -> list_aggregate(hs[i:i+3], 'min')) AS wm
          FROM hh
        ),
        s AS (SELECT doc_id, list_sort(list_distinct(wm)) AS sel FROM w),
        e AS (SELECT doc_id, h FROM (
                SELECT doc_id, unnest(sel) AS h FROM s)
              WHERE h <> md5('')),
        p AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(count(*) AS BIGINT) AS n_shared
          FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ),
        sz AS (SELECT doc_id, count(*) AS ns FROM e GROUP BY doc_id)
        SELECT p.id_a, p.id_b, p.n_shared,
               round(CAST(p.n_shared AS DOUBLE)
                     / CAST(least(na.ns, nb.ns) AS DOUBLE), 6) AS overlap
        FROM p JOIN sz na ON na.doc_id = p.id_a
        JOIN sz nb ON nb.doc_id = p.id_b
        WHERE round(CAST(p.n_shared AS DOUBLE)
                    / CAST(least(na.ns, nb.ns) AS DOUBLE), 6) >= 0.5
        ORDER BY p.id_a, p.id_b"""

    # weburl family (operators/weburl.py): the messy-URL construction and
    # every normalization rule are replicated verbatim; note DuckDB's
    # regexp_replace needs the explicit 'g' flag where Spark replaces
    # globally by default.
    _URL_CTE = """
        WITH u AS (
          SELECT doc_id,
                 (CASE WHEN doc_id % 5 = 0 THEN 'HTTP://'
                       ELSE 'HTTPS://User:Pw@' END)
                 || 'WWW.' || upper(source)
                 || (CASE WHEN doc_id % 2 = 0 THEN '.Example.CO.UK:8443'
                          ELSE '.Example.COM' END)
                 || '/Docs//' || doc_id::VARCHAR
                 || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
                 || (CASE doc_id % 4
                       WHEN 0 THEN '?utm_source=x&fbclid=Z'
                       WHEN 1 THEN ''
                       WHEN 2 THEN '?b=2&utm_campaign=c&a=1'
                       ELSE '?a=1&b=2' END)
                 || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END)
                   AS url
          FROM documents
        ),
        parts AS (
          SELECT doc_id,
                 lower(regexp_extract(url,
                   '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                 regexp_replace(regexp_replace(regexp_replace(
                   lower(regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                   '^[^@]*@', ''), ':[0-9]*$', ''), '^www\\.', '') AS host,
                 regexp_extract(
                   regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                   ':([0-9]+)$', 1) AS port,
                 regexp_replace(regexp_replace(
                   regexp_extract(url,
                     '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                   '//+', '/', 'g'), '/+$', '') AS path,
                 -- DuckDB array_to_string([]) is NULL; Spark array_join
                 -- of an empty array is '' — coalesce to match. Fragment
                 -- removed BEFORE the '?' search (RFC 3986).
                 coalesce(array_to_string(list_sort(list_filter(
                   string_split(regexp_extract(
                     regexp_replace(url, '#.*', ''), '\\?(.*)$', 1), '&'),
                   x -> x <> '' AND NOT regexp_matches(x,
                     '^(utm_[a-z0-9]+|fbclid|gclid|dclid|msclkid|mc_eid'
                     || '|mc_cid|igshid|yclid|ref|ref_src|spm|_ga)(=.*)?$')
                 )), '&'), '') AS q
          FROM u
        ),
        keyed AS (
          SELECT doc_id,
                 scheme || '://' || host
                 || (CASE WHEN port = ''
                            OR (scheme = 'http' AND port = '80')
                            OR (scheme = 'https' AND port = '443')
                          THEN '' ELSE ':' || port END)
                 || path
                 || (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS url_norm,
                 host AS url_host,
                 CASE WHEN regexp_matches(host,
                        '\\.(ac|co|com|edu|go|gov|mil|net|or|org)\\.[a-z]{2}$')
                      THEN regexp_extract(host,
                        '([^.]+\\.[^.]+\\.[^.]+)$', 1)
                      ELSE CASE WHEN regexp_extract(host,
                             '([^.]+\\.[^.]+)$', 1) = '' THEN host
                           ELSE regexp_extract(host,
                             '([^.]+\\.[^.]+)$', 1) END
                 END AS url_domain
          FROM parts
        )
    """
    o["url_normalize"] = (
        _URL_CTE
        + "SELECT doc_id, url_norm, url_host, url_domain FROM keyed "
        + "ORDER BY doc_id"
    )
    o["url_domain_block"] = (
        _URL_CTE
        + """
        SELECT url_host, count(*) AS n_docs FROM keyed
        WHERE url_domain <> 'example.co.uk'
        GROUP BY url_host ORDER BY url_host"""
    )
    o["url_latest"] = """
        WITH ranked AS (
          SELECT user_id, event_type,
                 CAST(epoch_ns(ts) AS BIGINT) AS ts, value, event_id,
                 row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        )
        SELECT user_id, event_type, ts, value, event_id
        FROM ranked WHERE rn = 1 ORDER BY user_id, event_type"""

    # DSIR (operators/dsir.py, Xie et al. 2023): hashed unigram+bigram
    # features, add-one-smoothed log-ratio, decimal-exact per-doc sums.
    # Raw corpus = all documents, so every scored bucket exists in the
    # ratio table (the unseen-bucket default never fires here).
    _DSIR_AGG = f"""
        WITH t AS (
          SELECT doc_id, lang,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                             '[^a-z0-9]+'), x -> x <> '') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, lang,
                 toks || list_transform(
                   range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> toks[i] || ' ' || toks[i + 1]) AS grams
          FROM t
        ),
        f AS (
          SELECT doc_id, lang,
                 CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT)
                   % {DSIR_DIM} AS bucket
          FROM (SELECT doc_id, lang, unnest(grams) AS gram FROM g)
        ),
        rc AS (SELECT bucket, count(*) AS c_raw FROM f GROUP BY bucket),
        tc AS (SELECT bucket, count(*) AS c_tgt FROM f
               WHERE lang = 'en' GROUP BY bucket),
        lr AS (
          SELECT rc.bucket,
                 round(
                   ln((coalesce(tc.c_tgt, 0) + 1.0)
                      / ((SELECT count(*) FROM f WHERE lang = 'en')
                         + 1.0 * {DSIR_DIM}))
                 - ln((rc.c_raw + 1.0)
                      / ((SELECT count(*) FROM f) + 1.0 * {DSIR_DIM})),
                 6) AS log_ratio
          FROM rc LEFT JOIN tc ON rc.bucket = tc.bucket
        ),
        s AS (
          SELECT f.doc_id,
                 CAST(coalesce(lr.log_ratio, 0.0) AS DECIMAL(28,6)) AS lrv
          FROM f LEFT JOIN lr ON f.bucket = lr.bucket
        ),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                 CAST(CAST(sum(lrv) AS DECIMAL(38,6)) AS DOUBLE)
                   AS log_weight
          FROM s GROUP BY doc_id
        ),
        w AS (
          SELECT d.doc_id,
                 coalesce(a.n_feats, 0) AS n_feats,
                 coalesce(a.log_weight, 0.0) AS log_weight
          FROM documents d LEFT JOIN agg a USING (doc_id)
        )
    """
    o["dsir_weights"] = (
        _DSIR_AGG + "SELECT * FROM w ORDER BY doc_id"
    )
    o["dsir_sample"] = (
        _DSIR_AGG
        + f"""
        SELECT * FROM (
          SELECT doc_id, n_feats, log_weight,
                 round(log_weight - ln(-ln(
                   (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         AS BIGINT) % 1048576 + 0.5) / 1048576.0)),
                 6) AS sample_key
          FROM w
          ORDER BY sample_key DESC, doc_id ASC LIMIT 50
        ) ORDER BY doc_id"""
    )

    # JL random projection (operators/similarity.py::random_projection):
    # md5-parity ±1 matrix, list_sum matches the Spark fold order, and
    # * (1.0/sqrt(d)) is spelled as multiplication in both engines (a
    # division would differ in the last ulp).
    # scalar (id, pos, value) rows — the driver's pandas canon cannot
    # hash list cells (VERDICT r4 #1)
    o["emb_random_proj"] = f"""
        SELECT vec_id AS id, CAST(j AS INT) AS pos,
               round(list_sum(list_transform(
                 range(1, len(embedding) + 1),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * (CASE WHEN CAST('0x' ||
                             substr(md5('rp:' || j || ':' || (i - 1)),
                                    1, 8) AS BIGINT) % 2 = 0
                         THEN 1.0 ELSE -1.0 END)))
                 * (1.0 / sqrt({RP_OUT_DIM}.0)), 6) AS value
        FROM embeddings, range(0, {RP_OUT_DIM}) t(j)
        ORDER BY id, pos"""

    # sketch-accuracy harness: the oracle pins the expected verdicts
    # (the measurement — HLL estimate vs exact distinct, approx-median
    # rank interval — is computed Spark-side; DuckDB cannot rebuild
    # Spark's HLL state, so this is the recall-harness pattern)
    o["sketch_profile"] = """
        SELECT 'l_extendedprice' AS "column", true AS distinct_ok,
               'true' AS median_rank_ok
        UNION ALL SELECT 'l_orderkey', true, 'true'
        UNION ALL SELECT 'l_quantity', true, 'true'
        UNION ALL SELECT 'l_returnflag', true, 'n/a'
        ORDER BY "column" """

    # MMR (operators/similarity.py::mmr_rerank): the k=3 greedy unrolled
    # as three argmax CTE stages. Scores are rounded 6dp before each
    # argmax with vec_id-asc ties in BOTH engines, so numpy-vs-list_sum
    # ulp noise cannot flip a pick. lam = 0.5 so 1−lam is double-exact.
    o["search_mmr"] = """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 5),
        scored AS (
          SELECT q.query_id, e.vec_id, e.embedding AS v,
                 list_sum(list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                      i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
                 AS c
          FROM embeddings e CROSS JOIN q
        ),
        p AS (
          SELECT query_id, vec_id, v, c FROM scored
          QUALIFY row_number() OVER (PARTITION BY query_id
                                     ORDER BY c DESC, vec_id) <= 20
        ),
        pn AS (
          SELECT query_id, vec_id, c,
                 list_transform(v, x -> CAST(x AS DOUBLE)
                   / sqrt(list_sum(list_transform(v,
                       y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nv
          FROM p
        ),
        s1 AS (
          SELECT query_id, vec_id, nv, round(0.5 * c, 6) AS sc FROM pn
          QUALIFY row_number() OVER (PARTITION BY query_id
            ORDER BY round(0.5 * c, 6) DESC, vec_id) = 1
        ),
        m1 AS (
          SELECT pn.query_id, pn.vec_id, pn.c, pn.nv,
                 list_sum(list_transform(range(1, len(pn.nv) + 1),
                   i -> pn.nv[i] * s1.nv[i])) AS ms
          FROM pn JOIN s1 ON pn.query_id = s1.query_id
          WHERE pn.vec_id <> s1.vec_id
        ),
        s2 AS (
          SELECT query_id, vec_id, nv,
                 round(0.5 * c - (1.0 - 0.5) * ms, 6) AS sc
          FROM m1
          QUALIFY row_number() OVER (PARTITION BY query_id
            ORDER BY round(0.5 * c - (1.0 - 0.5) * ms, 6) DESC, vec_id) = 1
        ),
        m2 AS (
          SELECT m1.query_id, m1.vec_id, m1.c,
                 greatest(m1.ms,
                   list_sum(list_transform(range(1, len(m1.nv) + 1),
                     i -> m1.nv[i] * s2.nv[i]))) AS ms
          FROM m1 JOIN s2 ON m1.query_id = s2.query_id
          WHERE m1.vec_id <> s2.vec_id
        ),
        s3 AS (
          SELECT query_id, vec_id,
                 round(0.5 * c - (1.0 - 0.5) * ms, 6) AS sc
          FROM m2
          QUALIFY row_number() OVER (PARTITION BY query_id
            ORDER BY round(0.5 * c - (1.0 - 0.5) * ms, 6) DESC, vec_id) = 1
        )
        SELECT query_id, vec_id, 1 AS mmr_rank, sc + 0.0 AS mmr_score
        FROM s1
        UNION ALL SELECT query_id, vec_id, 2, sc + 0.0 FROM s2
        UNION ALL SELECT query_id, vec_id, 3, sc + 0.0 FROM s3
        ORDER BY query_id, mmr_rank"""

    # facet_cube: GROUPING() carries the same ANSI bit convention as
    # Spark's grouping_id (first dim = most significant bit)
    o["search_facet_cube"] = _CTE + f"""
        , matched AS (
          SELECT DISTINCT p.doc_id FROM postings p
          WHERE p.term IN {tuple(QC10_TERMS)!r}
        )
        SELECT CAST(d.lang AS VARCHAR) AS lang,
               CAST(d.source AS VARCHAR) AS source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(GROUPING(d.lang, d.source) AS BIGINT) AS grouping_id
        FROM matched m JOIN documents d USING (doc_id)
        GROUP BY CUBE (d.lang, d.source)
        ORDER BY grouping_id, lang NULLS LAST, source NULLS LAST"""

    # BM25F (operators/search.py::bm25f_search): per-field normalized tf
    # blended before saturation; union docFreq. Two fields -> the blend
    # sum is commutative-exact; expression shapes mirror the Spark code
    # associativity exactly (w*tf)/B, (b*dl)/avgdl.
    o["search_bm25f"] = """
        WITH tx AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ),
        e AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM tx),
        tp AS (SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
               FROM e GROUP BY doc_id, term),
        ts AS (SELECT count(*) AS n, avg(dl) AS avgdl
               FROM (SELECT DISTINCT doc_id, dl FROM tp)),
        sp AS (SELECT doc_id, lower(source) AS term, 1 AS tf, 1 AS dl
               FROM documents),
        sps AS (SELECT avg(dl) AS avgdl FROM sp),
        u AS (
          SELECT term, doc_id,
                 (1.0 * tf) / ((1.0 - 0.75)
                   + (0.75 * dl) / (SELECT avgdl FROM ts)) AS wtf
          FROM tp WHERE term IN ('dup', 'spark', 'src3')
          UNION ALL
          SELECT term, doc_id,
                 (2.0 * tf) / ((1.0 - 0.75)
                   + (0.75 * dl) / (SELECT avgdl FROM sps))
          FROM sp WHERE term IN ('dup', 'spark', 'src3')
        ),
        tsum AS (SELECT term, doc_id, sum(wtf) AS wtf
                 FROM u GROUP BY term, doc_id),
        dfc AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfv
                FROM tsum GROUP BY term),
        sc AS (
          -- N = max over the scored fields' doc counts (source covers
          -- every row, text counts docs with >=1 token); idf floored at
          -- 0 — both mirroring the Spark code exactly
          SELECT t.doc_id,
                 greatest(0.0,
                   ln(1.0 + (CAST(greatest((SELECT n FROM ts),
                                           (SELECT count(*) FROM sp))
                                  AS DOUBLE) - d.dfv + 0.5)
                            / (d.dfv + 0.5)))
                   * t.wtf / (1.2 + t.wtf) AS s
          FROM tsum t JOIN dfc d USING (term)
        ),
        tot AS (SELECT doc_id, round(sum(s), 6) AS score
                FROM sc GROUP BY doc_id)
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
                 AS rank
        FROM tot ORDER BY score DESC, doc_id LIMIT 10"""

    # did-you-mean: DuckDB's levenshtein is the same unit-cost edit
    # distance as Spark's
    o["search_suggest"] = _CTE + """
        , cand AS (
          SELECT term, CAST(df AS BIGINT) AS df_t,
                 CAST(levenshtein(term, 'sparkk') AS INT) AS dist
          FROM termstats
          WHERE abs(length(term) - length('sparkk')) <= 2
        )
        SELECT term, df_t, dist,
               CAST(row_number() OVER (
                 ORDER BY dist, df_t DESC, term) AS INT) AS rank
        FROM cand WHERE dist <= 2
        ORDER BY dist, df_t DESC, term LIMIT 5"""

    # prefix autocomplete
    o["search_complete"] = _CTE + """
        , cand AS (
          SELECT term, CAST(df AS BIGINT) AS df_t FROM termstats
          WHERE term LIKE 'th%'
        )
        SELECT term, df_t,
               CAST(row_number() OVER (
                 ORDER BY df_t DESC, term) AS INT) AS rank
        FROM cand ORDER BY df_t DESC, term LIMIT 10"""

    # merged-index flagship query: the whole-corpus top-k verbatim —
    # merge_indexes recomputes global stats, so the answer is the same
    o["search_merged_index"] = o["qc10_bm25_topk"]

    # unordered proximity: anchor-window membership over 0-based token
    # positions, scored as matchAll (the same bm25 sum)
    o["search_near"] = _CTE + f"""
        , ex2 AS (
          SELECT doc_id, unnest(toks) AS term,
                 generate_subscripts(toks, 1) - 1 AS pos
          FROM toks
        ),
        p1 AS (SELECT doc_id, list(pos) AS ps FROM ex2
               WHERE term = 'dup' GROUP BY doc_id),
        p2 AS (SELECT doc_id, list(pos) AS ps FROM ex2
               WHERE term = 'spark' GROUP BY doc_id),
        hits AS (
          SELECT p1.doc_id FROM p1 JOIN p2 USING (doc_id)
          WHERE len(list_filter(p1.ps,
                  x -> len(list_filter(p2.ps,
                         y -> abs(y - x) <= 5)) > 0)) > 0
        )
        SELECT p.doc_id,
               round(sum({_bm25_sql("p.tf", "p.dl", "t.df")}), 6) AS score
        FROM postings p JOIN termstats t USING (term)
        CROSS JOIN fieldstats f
        WHERE p.term IN ('dup', 'spark')
          AND p.doc_id IN (SELECT doc_id FROM hits)
        GROUP BY p.doc_id ORDER BY p.doc_id"""

    # resampling with gap fill: long-exact bucketing (ts − ts % step),
    # dense per-key grid via range(), decimal-exact value sums
    o["events_resample"] = f"""
        WITH e AS (
          SELECT event_type, CAST(epoch_ns(ts) AS BIGINT) AS tsn, value
          FROM events
        ),
        s AS (
          SELECT event_type,
                 tsn - (tsn % {HOUR_NS}) AS bucket_ts,
                 CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   AS sum_value
          FROM e GROUP BY 1, 2
        ),
        sp AS (SELECT event_type, min(bucket_ts) AS lo,
                      max(bucket_ts) AS hi
               FROM s GROUP BY event_type),
        g AS (
          SELECT event_type, CAST(b AS BIGINT) AS bucket_ts
          FROM sp, unnest(range(lo, hi + 1, {HOUR_NS})) AS t(b)
        )
        SELECT g.event_type, g.bucket_ts,
               coalesce(s.n_events, 0) AS n_events,
               coalesce(s.sum_value, 0.0) AS sum_value
        FROM g LEFT JOIN s USING (event_type, bucket_ts)
        ORDER BY event_type, bucket_ts"""

    # correlation matrix: exact decimal sums, closed-form Pearson in
    # doubles at the end — same expression shapes as the Spark code
    corr_cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    # DuckDB evaluates DECIMAL(18,6) products in int64 and overflows;
    # (28,6) forces int128 — still exact, so the values equal Spark's
    # exact (18,6) products
    cd = {c: f"CAST({c} AS DECIMAL(28,6))" for c in corr_cols}
    corr_aggs = ["CAST(count(*) AS BIGINT) AS n"]
    for c in corr_cols:
        corr_aggs.append(f"sum({cd[c]}) AS s_{c}")
        corr_aggs.append(f"sum({cd[c]} * {cd[c]}) AS ss_{c}")
    pairs = [
        (a, b)
        for i, a in enumerate(corr_cols)
        for b in corr_cols[i + 1 :]
    ]
    for a, b in pairs:
        corr_aggs.append(f"sum({cd[a]} * {cd[b]}) AS sp_{a}_{b}")
    corr_branches = []
    for a, b in pairs:
        cov = (
            f"(CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        )
        va = (
            f"(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
            f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        )
        vb = (
            f"(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
            f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        )
        corr_branches.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, n,"
            f" CASE WHEN {va} > 0 AND {vb} > 0"
            f" THEN round({cov} / sqrt({va} * {vb}), 6) END AS corr"
            f" FROM a"
        )
    where = " AND ".join(f"{c} IS NOT NULL" for c in corr_cols)
    o["table_corr"] = (
        "WITH a AS (SELECT "
        + ", ".join(corr_aggs)
        + f" FROM lineitem WHERE {where}) "
        + " UNION ALL ".join(corr_branches)
        + " ORDER BY col_a, col_b"
    )

    # RM3 PRF (operators/search.py::prf_expand_search): feedback
    # contributions and final per-doc sums run through rounded DECIMALs
    # (order-exact); the fb/term cuts order by those exact decimals.
    o["search_prf"] = _CTE + f"""
        , s1 AS (
          SELECT p.doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ('dup', 'spark')
          GROUP BY p.doc_id
        ),
        fb AS (SELECT doc_id, s FROM s1 ORDER BY s DESC, doc_id LIMIT 5),
        contrib AS (
          SELECT p.term,
                 CAST(round((CAST(p.tf AS DOUBLE) / CAST(p.dl AS DOUBLE))
                            * fb.s, 6) AS DECIMAL(28,6)) AS c
          FROM postings p JOIN fb USING (doc_id)
        ),
        wfb0 AS (
          SELECT term, CAST(sum(c) AS DECIMAL(38,6)) AS w
          FROM contrib GROUP BY term
          ORDER BY w DESC, term LIMIT 8
        ),
        wfb AS (
          SELECT term, CAST(w AS DOUBLE)
                       / (SELECT CAST(sum(w) AS DOUBLE) FROM wfb0) AS wv
          FROM wfb0
        ),
        orig AS (SELECT unnest(['dup', 'spark']) AS term, 0.5 AS porig),
        wts AS (
          SELECT coalesce(wfb.term, orig.term) AS term,
                 0.5 * coalesce(orig.porig, 0.0)
                 + 0.5 * coalesce(wfb.wv, 0.0) AS wt
          FROM wfb FULL OUTER JOIN orig ON wfb.term = orig.term
        ),
        sc AS (
          SELECT p.doc_id,
                 CAST(round(w.wt * ({_bm25_sql("p.tf", "p.dl", "t.df")}), 6)
                      AS DECIMAL(28,6)) AS cs
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          JOIN wts w ON w.term = p.term
        ),
        tot2 AS (
          SELECT doc_id,
                 CAST(CAST(sum(cs) AS DECIMAL(38,6)) AS DOUBLE) AS score
          FROM sc GROUP BY doc_id
        )
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
                 AS rank
        FROM tot2 ORDER BY score DESC, doc_id LIMIT 10"""

    # significant terms (JLH): all rates are exact-integer ratios cast
    # to double in the same expression shapes as the Spark code
    o["search_sigterms"] = _CTE + """
        , matched AS (
          SELECT DISTINCT doc_id FROM postings
          WHERE term IN ('dup', 'spark')
        ),
        m AS (SELECT CAST(count(*) AS DOUBLE) AS msz FROM matched),
        fg AS (
          SELECT term, CAST(count(*) AS BIGINT) AS fg_count
          FROM postings JOIN matched USING (doc_id)
          GROUP BY term HAVING count(*) >= 2
        ),
        sc AS (
          SELECT fg.term, fg.fg_count, CAST(t.df AS BIGINT) AS bg_count,
                 round(
                   (CAST(fg.fg_count AS DOUBLE) / (SELECT msz FROM m)
                    - CAST(t.df AS DOUBLE)
                      / CAST((SELECT n FROM fieldstats) AS DOUBLE))
                   * ((CAST(fg.fg_count AS DOUBLE) / (SELECT msz FROM m))
                      / (CAST(t.df AS DOUBLE)
                         / CAST((SELECT n FROM fieldstats) AS DOUBLE))),
                 6) AS score
          FROM fg JOIN termstats t USING (term)
        )
        SELECT term, fg_count, bg_count, score,
               CAST(row_number() OVER (ORDER BY score DESC, term) AS INT)
                 AS rank
        FROM sc ORDER BY score DESC, term LIMIT 10"""

    # fixed-width histogram: floor(x/w)*w — Spark floor yields BIGINT
    # then *w promotes to DOUBLE; DuckDB floor is DOUBLE throughout;
    # the products are integral doubles either way
    o["table_histogram"] = """
        SELECT floor(CAST(o_totalprice AS DOUBLE) / 50000.0) * 50000.0
                 AS bin_start,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM orders WHERE o_totalprice IS NOT NULL
        GROUP BY 1 ORDER BY bin_start"""

    # skew report: exact counts, share = n/total rounded 6dp, ties by
    # key asc (nulls last)
    o["table_skew"] = """
        WITH c AS (
          SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows
          FROM lineitem GROUP BY l_suppkey
        ),
        t AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM lineitem)
        SELECT l_suppkey, n_rows,
               round(n_rows / (SELECT tot FROM t), 6) AS share,
               CAST(row_number() OVER (
                 ORDER BY n_rows DESC, l_suppkey NULLS LAST) AS INT)
                 AS rank
        FROM c ORDER BY n_rows DESC, l_suppkey NULLS LAST LIMIT 10"""

    # sentence segmentation: boundary marked with chr(30) via a
    # capture-group rewrite (RE2 has no lookbehind), then split/trim/
    # filter — identical to the Spark expression chain
    o["chunk_sentences"] = """
        WITH p AS (
          SELECT doc_id,
                 list_filter(list_transform(
                   string_split(regexp_replace(text, '([.!?]+)\\s+',
                                               '\\1' || chr(30), 'g'),
                                chr(30)),
                   x -> trim(x)),
                   x -> length(x) >= 1) AS parts
          FROM documents WHERE text IS NOT NULL
        )
        SELECT doc_id, CAST(i - 1 AS INT) AS sent_idx,
               parts[i] AS sentence
        FROM p, unnest(range(1, len(parts) + 1)) AS t(i)
        ORDER BY doc_id, sent_idx"""

    # percolation verdicts (batch form of the foreachBatch plan)
    perc_vals = ", ".join(
        f"({qid}, '{qtext}')" for qid, qtext in PERC_QUERIES
    )
    o["percolate_match"] = f"""
        WITH q(query_id, query_text) AS (VALUES {perc_vals}),
        qt AS (
          SELECT query_id, unnest(list_distinct(list_filter(
            string_split_regex(lower(coalesce(query_text, '')),
                               '[^a-z0-9]+'), x -> x <> ''))) AS term
          FROM q
        ),
        dt AS (
          SELECT doc_id, unnest(list_distinct(list_filter(
            string_split_regex(lower(coalesce(text, '')),
                               '[^a-z0-9]+'), x -> x <> ''))) AS term
          FROM documents
        )
        SELECT qt.query_id, dt.doc_id,
               CAST(count(*) AS BIGINT) AS n_matched
        FROM dt JOIN qt USING (term)
        GROUP BY qt.query_id, dt.doc_id
        ORDER BY query_id, doc_id"""

    # grouped profile: same expression shapes as table_profile, grouped
    gp_branches = []
    for c in ("l_quantity", "l_extendedprice"):
        gp_branches.append(f"""
          SELECT l_returnflag, '{c}' AS "column", 'double' AS dtype,
                 n AS n_rows, nl_{c} AS n_null, nd_{c} AS n_distinct,
                 mn_{c} AS min_num, mx_{c} AS max_num, sm_{c} AS sum_num,
                 CASE WHEN n - nl_{c} > 0
                      THEN sm_{c} / CAST(n - nl_{c} AS DOUBLE) END
                   AS mean_num,
                 CAST(NULL AS VARCHAR) AS min_str,
                 CAST(NULL AS VARCHAR) AS max_str
          FROM a""")
    o["table_profile_grouped"] = (
        """
        WITH a AS (
          SELECT l_returnflag, count(*) AS n,
        """
        + ", ".join(
            f"""CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS nl_{c},
                count(DISTINCT {c}) AS nd_{c},
                CAST(min({c}) AS DOUBLE) AS mn_{c},
                CAST(max({c}) AS DOUBLE) AS mx_{c},
                CAST(sum(CAST({c} AS DECIMAL(28,6))) AS DOUBLE) AS sm_{c}"""
            for c in ("l_quantity", "l_extendedprice")
        )
        + """
          FROM lineitem GROUP BY l_returnflag
        )
        """
        + " UNION ALL ".join(gp_branches)
        + ' ORDER BY l_returnflag, "column"'
    )

    # idf-weighted hash embedding: decimal-exact per-bucket idf sums,
    # map assembly, shared fold-shape normalization
    o["text_tfidf_embed"] = f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                             '[^a-z0-9]+'), x -> x <> '') AS toks
          FROM documents
        ),
        e AS (SELECT doc_id, unnest(toks) AS term FROM t),
        v AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS dfv
              FROM e GROUP BY term),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        w AS (
          SELECT e.doc_id,
                 CAST('0x' || substr(md5(e.term), 1, 8) AS BIGINT)
                   % {HASH_EMBED_DIM} AS b,
                 CAST(round(ln(1.0 + ((SELECT n FROM nn) - v.dfv + 0.5)
                                     / (v.dfv + 0.5)), 6)
                      AS DECIMAL(28,6)) AS wv
          FROM e JOIN v USING (term)
        ),
        s AS (
          SELECT doc_id, b,
                 CAST(CAST(sum(wv) AS DECIMAL(38,6)) AS DOUBLE) AS val
          FROM w GROUP BY doc_id, b
        ),
        m AS (
          SELECT doc_id,
                 map_from_entries(list({{'k': b, 'v': val}})) AS mm
          FROM s GROUP BY doc_id
        ),
        arr AS (
          -- LEFT JOIN: a NULL map extracts NULL per slot -> coalesce 0,
          -- so token-less docs get the zero vector with no correlated
          -- subquery
          SELECT d.doc_id,
                 list_transform(range(0, {HASH_EMBED_DIM}),
                                j -> coalesce(mm[j][1], 0.0)) AS raw
          FROM documents d LEFT JOIN m USING (doc_id)
        ),
        nrm AS (
          SELECT doc_id, raw,
                 sqrt(list_sum(list_transform(raw, x -> x * x))) AS nv
          FROM arr
        ),
        fin AS (
          SELECT doc_id,
                 CASE WHEN nv > 0
                      THEN list_transform(raw, x -> x / nv)
                      ELSE raw END AS emb
          FROM nrm
        )
        -- scalar (id, pos, value) rows: the driver's pandas canon cannot
        -- hash list cells (VERDICT r4 #1)
        SELECT doc_id AS id, CAST(j AS INT) AS pos,
               emb[CAST(j + 1 AS INT)] AS value
        FROM fin, range(0, {HASH_EMBED_DIM}) t(j)
        ORDER BY id, pos"""
    # retrieval eval: qc11's ranked hits as the system under test, the
    # deterministic synthetic label set rebuilt in SQL, and the exact
    # graded-metric arithmetic (DECIMAL(28,6) DCG sums mirror the
    # engine's order-invariant recipe; see operators/evaluate.py).
    _seval_metrics = (
        "WITH res AS (" + o["qc11_batch_search"] + f"""
        ),
        nd AS (SELECT count(*) AS n FROM documents),
        labs AS (
          SELECT query_id, doc_id,
                 CAST(1.0 + (rank % 3) AS DOUBLE) AS grade
          FROM res WHERE rank % 2 = 1
          UNION ALL
          SELECT t.q AS query_id,
                 CAST((t.q * 97 + s.j * 13) % nd.n AS BIGINT) AS doc_id,
                 CAST(1.0 + ((t.q + s.j) % 3) AS DOUBLE) AS grade
          FROM range(0, {QC11_NQ}) t(q), range(1, {SEVAL_NL + 1}) s(j), nd
        ),
        gains AS (
          SELECT query_id, doc_id, max(grade) AS g
          FROM labs GROUP BY query_id, doc_id
        ),
        joined AS (
          SELECT r.query_id, r.rank, coalesce(g.g, 0.0) AS gain
          FROM res r LEFT JOIN gains g
            ON g.query_id = r.query_id AND g.doc_id = r.doc_id
        ),
        perq AS (
          SELECT query_id,
                 CAST(sum(CAST(round((pow(2.0, gain) - 1.0)
                                     / log2(rank + 1), 6)
                               AS DECIMAL(28,6))) AS DOUBLE) AS dcg,
                 CAST(sum(CASE WHEN gain >= 1.0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS hits,
                 min(CASE WHEN gain >= 1.0 THEN rank END) AS first_rel
          FROM joined GROUP BY query_id
        ),
        ideal AS (
          SELECT query_id,
                 CAST(sum(CAST(round((pow(2.0, g) - 1.0)
                                     / log2(r + 1), 6)
                               AS DECIMAL(28,6))) AS DOUBLE) AS idcg
          FROM (
            SELECT query_id, g,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY g DESC, doc_id) AS r
            FROM gains WHERE g > 0
          ) WHERE r <= {QC11_K} GROUP BY query_id
        ),
        base AS (
          SELECT query_id,
                 CAST(sum(CASE WHEN g >= 1.0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_rel
          FROM gains GROUP BY query_id
        )
        SELECT b.query_id, b.n_rel,
               CAST(coalesce(p.hits, 0) AS BIGINT) AS hits,
               round(coalesce(p.hits, 0) / {float(QC11_K)}, 6)
                 AS "precision",
               round(CASE WHEN b.n_rel > 0
                          THEN coalesce(p.hits, 0)
                               / CAST(b.n_rel AS DOUBLE)
                          ELSE 0.0 END, 6) AS recall,
               round(CASE WHEN p.first_rel IS NOT NULL
                          THEN 1.0 / p.first_rel
                          ELSE 0.0 END, 6) AS rr,
               round(CASE WHEN coalesce(i.idcg, 0.0) > 0
                          THEN coalesce(p.dcg, 0.0) / i.idcg
                          ELSE 0.0 END, 6) AS ndcg
        FROM base b
        LEFT JOIN perq p USING (query_id)
        LEFT JOIN ideal i USING (query_id)"""
    )
    o["search_eval"] = _seval_metrics + " ORDER BY b.query_id"
    o["search_eval_summary"] = (
        "WITH m AS ("
        + _seval_metrics
        + """
        )
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               round(CAST(sum(CAST("precision" AS DECIMAL(28,6)))
                          AS DOUBLE) / count(*), 6) AS mean_precision,
               round(CAST(sum(CAST(recall AS DECIMAL(28,6)))
                          AS DOUBLE) / count(*), 6) AS mean_recall,
               round(CAST(sum(CAST(rr AS DECIMAL(28,6)))
                          AS DOUBLE) / count(*), 6) AS mrr,
               round(CAST(sum(CAST(ndcg AS DECIMAL(28,6)))
                          AS DOUBLE) / count(*), 6) AS mean_ndcg
        FROM m"""
    )
    # incremental index upsert: the oracle scores the POST-CDC corpus
    # rebuilt from scratch (newdocs = base minus deletes, texts >=
    # UPSERT_LO edited, inserts to UPSERT_HI), so a hash match proves
    # upsert_index's recomputed global stats are exact, not stitched.
    # Replace toks' source FIRST (the newdocs body itself reads
    # documents), then splice the CTE in.
    _upsert_nd = f"""newdocs AS (
      SELECT doc_id,
             CASE WHEN doc_id >= {UPSERT_LO}
                  THEN text || ' upserted extra' ELSE text END AS text
      FROM documents
      WHERE doc_id < {UPSERT_HI} AND doc_id NOT IN {UPSERT_DELS}
    ),
    toks AS ("""
    o["index_upsert"] = o["qc10_bm25_topk"].replace(
        "FROM documents", "FROM newdocs", 1
    ).replace("WITH toks AS (", "WITH " + _upsert_nd, 1)
    # PQ/ADC: re-derive every code (per-subspace argmin, same
    # first-min tie-break as clustering.assign_cell_expr:
    # list_indexof(d, list_min(d))), every LUT sub-inner-product, and
    # the m-lookup ADC sum — pure deterministic arithmetic over the
    # pinned codebooks, written once per big expression via nested
    # SELECTs so the generated SQL stays readable.
    def _pq_sq(j: int, c: int) -> str:
        # sequential left-assoc sum of (x-w)^2 terms = the engine's
        # F.aggregate fold order (0.0 + t0 == t0 bitwise)
        return " + ".join(
            f"(CAST(embedding[{j * PQ_DSUB + d + 1}] AS DOUBLE) - ({w}))"
            f" * (CAST(embedding[{j * PQ_DSUB + d + 1}] AS DOUBLE) - ({w}))"
            for d, w in enumerate(_PQ_CB[j][c])
        )

    def _pq_ip(j: int, c: int) -> str:
        return " + ".join(
            f"CAST(qv[{j * PQ_DSUB + d + 1}] AS DOUBLE) * ({w})"
            for d, w in enumerate(_PQ_CB[j][c])
        )

    _pq_dls = ", ".join(
        "["
        + ", ".join(_pq_sq(j, c) for c in range(PQ_KSUB))
        + f"] AS dl{j}"
        for j in range(PQ_M)
    )
    _pq_luts = ", ".join(
        "["
        + ", ".join(_pq_ip(j, c) for c in range(PQ_KSUB))
        + f"] AS lut{j}"
        for j in range(PQ_M)
    )
    _pq_codes = ", ".join(
        f"list_indexof(dl{j}, list_min(dl{j})) - 1 AS c{j}"
        for j in range(PQ_M)
    )
    _pq_score = " + ".join(
        f"q.lut{j}[c.c{j} + 1]" for j in range(PQ_M)
    )
    o["emb_pq_topk"] = f"""
        WITH coded AS (
          SELECT vec_id, {_pq_codes}
          FROM (SELECT vec_id, {_pq_dls} FROM embeddings)
        ),
        q AS (
          SELECT query_id, {_pq_luts}
          FROM (SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id < {PQ_NQ})
        ),
        scored AS (
          SELECT q.query_id, c.vec_id, {_pq_score} + 0.0 AS s
          FROM coded c CROSS JOIN q
        ),
        ranked AS (
          SELECT query_id, vec_id, round(s, 6) AS score,
                 CAST(row_number() OVER (PARTITION BY query_id
                                         ORDER BY s DESC, vec_id) AS BIGINT)
                   AS rank
          FROM scored
        )
        SELECT * FROM ranked WHERE rank <= {PQ_K}"""
    o["pq_recall"] = "SELECT 'pq_topk' AS op, true AS recall_ok"
    o["ivfpq_recall"] = "SELECT 'ivfpq_topk' AS op, true AS recall_ok"
    # hard negatives: the emb_cosine_topk scoring CTE with the band
    # filter applied BEFORE the rank window (unrounded cosine both
    # sides; identical IEEE doubles make the band edges exact)
    o["emb_hard_negatives"] = f"""
        WITH q AS (SELECT vec_id AS anchor_id, embedding AS qv
                   FROM embeddings WHERE vec_id < {EMB_NQ}),
        scored AS (
          SELECT q.anchor_id, e.vec_id,
                 list_sum(list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                      i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))
                 AS c
          FROM embeddings e CROSS JOIN q
        ),
        banded AS (
          SELECT * FROM scored WHERE c >= {HN_LO} AND c < {HN_HI}
        ),
        ranked AS (
          SELECT anchor_id, vec_id, round(c, 6) AS cos_sim,
                 CAST(row_number() OVER (PARTITION BY anchor_id
                                         ORDER BY c DESC, vec_id) AS BIGINT)
                   AS rank
          FROM banded
        )
        SELECT * FROM ranked WHERE rank <= {HN_K}"""
    # edit-distance join: brute-force all-pairs levenshtein IS the
    # oracle — proving the engine's prefix filter is lossless
    o["dedup_edit_join"] = """
        WITH v AS (
          SELECT source, min(doc_id) AS did FROM documents GROUP BY source
        )
        SELECT a.did AS id_a, b.did AS id_b,
               CAST(levenshtein(a.source, b.source) AS BIGINT) AS dist
        FROM v a JOIN v b ON a.did < b.did
        WHERE levenshtein(a.source, b.source) <= 1
        ORDER BY id_a, id_b"""
    # synonym expansion rewrites matchTerm(dup) into exactly qc10's
    # matchAny(dup, spark): the oracle is qc10's SQL verbatim
    o["search_synonyms"] = o["qc10_bm25_topk"]
    # heterogeneous DSL batch: each query recomputed independently in
    # SQL (term / matchAll-with-count / bigram-phrase / and-not), then
    # the same per-query rank window. Every per-doc score is a sum of
    # <= 2 BM25 addends — IEEE-commutative-safe without the decimal
    # recipe.
    _bdsl_bm = _bm25_sql("p.tf", "p.dl", "t.df")
    _q10_in = ",".join(f"'{t}'" for t in QC10_TERMS)
    # full-DSL percolation: the batch_dsl CTE shapes WITHOUT the rank
    # window — complete match sets per standing query
    o["percolate_dsl"] = _CTE + f"""
        , p1 AS (
          SELECT doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term = '{QC06_TERM}' GROUP BY doc_id
        ),
        pph AS (
          SELECT doc_id FROM toks
          WHERE list_contains(
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1]),
            '{QC09_W1} {QC09_W2}')
        ),
        p2 AS (
          SELECT p.doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          JOIN pph ON pph.doc_id = p.doc_id
          WHERE p.term IN ('{QC09_W1}','{QC09_W2}') GROUP BY p.doc_id
        ),
        p3 AS (
          SELECT doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ({_q10_in}) AND doc_id > 100
          GROUP BY doc_id HAVING count(*) >= {len(QC10_TERMS)}
        ),
        pu AS (
          SELECT CAST(1 AS BIGINT) AS query_id, doc_id, s FROM p1
          UNION ALL SELECT 2, doc_id, s FROM p2
          UNION ALL SELECT 3, doc_id, s FROM p3
        )
        SELECT query_id, doc_id, round(s, 6) AS score FROM pu
        ORDER BY query_id, doc_id"""
    # mixed-analyzer batch: the text field reuses the _CTE pipeline
    # (simple tokenizer); the source field gets its OWN pipeline with
    # the whitespace tokenizer (case/punctuation preserved) and its own
    # field stats; per-query scoring joins its field's postings and the
    # union takes one shared rank window
    o["batch_mixed_analyzer"] = _CTE + f"""
        , stoks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(source,
                             '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '') AS toks
          FROM documents
        ),
        sexp AS (
          SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM stoks
        ),
        spost AS (
          SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
          FROM sexp GROUP BY doc_id, term
        ),
        sfs AS (
          SELECT count(*) AS n, avg(dl) AS avgdl
          FROM (SELECT DISTINCT doc_id, dl FROM spost)
        ),
        sts AS (SELECT term, count(*) AS df FROM spost GROUP BY term),
        r1 AS (
          SELECT doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ({_q10_in}) GROUP BY doc_id
        ),
        r2 AS (
          SELECT doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM spost p JOIN sts t USING (term) CROSS JOIN sfs f
          WHERE p.term IN ('src3','src7') GROUP BY doc_id
        ),
        r3 AS (
          SELECT doc_id, sum({_bm25_sql("p.tf", "p.dl", "t.df")}) AS s
          FROM spost p JOIN sts t USING (term) CROSS JOIN sfs f
          WHERE p.term IN ('SRC3','src19') GROUP BY doc_id
        ),
        uma AS (
          SELECT CAST(1 AS BIGINT) AS query_id, doc_id, s FROM r1
          UNION ALL SELECT 2, doc_id, s FROM r2
          UNION ALL SELECT 3, doc_id, s FROM r3
        ),
        rma AS (
          SELECT query_id, doc_id, round(s, 6) AS score,
                 CAST(row_number() OVER
                      (PARTITION BY query_id
                       ORDER BY s DESC, doc_id) AS BIGINT) AS rank
          FROM uma
        )
        SELECT * FROM rma WHERE rank <= {QC10_K}
        ORDER BY query_id, rank"""
    # query join with a per-row attribute filter: qc15's join, candidates
    # additionally restricted to d.n_chars <= the QUERY row's n_chars
    # before the rank window (zero score contribution)
    o["query_join_filters"] = _CTE + f"""
        , q AS (
          SELECT t.doc_id AS query_id, list_distinct(t.toks) AS qt,
                 d.n_chars AS qnc
          FROM toks t JOIN documents d USING (doc_id)
          WHERE t.doc_id >= {QC15_LO} AND t.doc_id < {QC15_HI}
        ),
        qterms AS (SELECT query_id, unnest(qt) AS term FROM q),
        scored AS (
          SELECT qt.query_id, p.doc_id, sum({_bdsl_bm}) AS s
          FROM qterms qt
          JOIN postings p USING (term)
          JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          GROUP BY qt.query_id, p.doc_id
        ),
        filt AS (
          SELECT s.query_id, s.doc_id, s.s
          FROM scored s
          JOIN documents d ON d.doc_id = s.doc_id
          JOIN q ON q.query_id = s.query_id
          WHERE d.n_chars <= q.qnc
        ),
        ranked AS (
          SELECT query_id, doc_id AS match_doc_id, round(s, 6) AS score,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY s DESC, doc_id) AS BIGINT) AS rank
          FROM filt
        )
        SELECT * FROM ranked WHERE rank <= {QC15_K}"""
    o["batch_dsl_mixed"] = _CTE + f"""
        , s1 AS (
          SELECT doc_id, sum({_bdsl_bm}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term = '{QC06_TERM}' GROUP BY doc_id
        ),
        s2 AS (
          SELECT doc_id, sum({_bdsl_bm}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ({_q10_in}) GROUP BY doc_id
          HAVING count(*) >= {len(QC10_TERMS)}
        ),
        ph AS (
          SELECT doc_id FROM toks
          WHERE list_contains(
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1]),
            '{QC09_W1} {QC09_W2}')
        ),
        s3 AS (
          SELECT p.doc_id, sum({_bdsl_bm}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          JOIN ph ON ph.doc_id = p.doc_id
          WHERE p.term IN ('{QC09_W1}','{QC09_W2}') GROUP BY p.doc_id
        ),
        s4 AS (
          SELECT doc_id, sum({_bdsl_bm}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term = '{QC08_T1}'
            AND doc_id NOT IN
                (SELECT doc_id FROM postings WHERE term = '{QC08_T2}')
          GROUP BY doc_id
        ),
        s5 AS (
          SELECT s1.doc_id, s1.s
          FROM s1 JOIN documents d USING (doc_id)
          WHERE d.n_chars >= {QC28_LO} AND d.n_chars < {QC28_HI}
        ),
        u AS (
          SELECT CAST(1 AS BIGINT) AS query_id, doc_id, s FROM s1
          UNION ALL SELECT 2, doc_id, s FROM s2
          UNION ALL SELECT 3, doc_id, s FROM s3
          UNION ALL SELECT 4, doc_id, s FROM s4
          UNION ALL SELECT 5, doc_id, s FROM s5
        ),
        r AS (
          SELECT query_id, doc_id, round(s, 6) AS score,
                 CAST(row_number() OVER
                      (PARTITION BY query_id
                       ORDER BY s DESC, doc_id) AS BIGINT) AS rank
          FROM u
        )
        SELECT * FROM r WHERE rank <= {BDSL_K}
        ORDER BY query_id, rank"""
    # per-query k: batch_dsl_mixed's SQL with the final rank limit
    # swapped for the BDSL_PER_K CASE (ids absent keep the global k)
    _case = " ".join(
        f"WHEN {q} THEN {v}" for q, v in sorted(BDSL_PER_K.items())
    )
    o["batch_dsl_per_k"] = o["batch_dsl_mixed"].replace(
        f"WHERE rank <= {BDSL_K}",
        f"WHERE rank <= CASE query_id {_case} ELSE {BDSL_K} END",
        1,
    )
    # query_join_dsl: six structurally different per-row queries — each
    # recomputed independently (same CTE scaffolding as batch_dsl_mixed;
    # rows 3 and 5 share a filter signature with different values, row 6
    # is the constant-score wildcard expansion)
    o["query_join_dsl"] = _CTE + f"""
        , j1 AS (
          SELECT doc_id, sum({_bdsl_bm}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term = '{QC06_TERM}' GROUP BY doc_id
        ),
        jph AS (
          SELECT doc_id FROM toks
          WHERE list_contains(
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1]),
            '{QC09_W1} {QC09_W2}')
        ),
        j2 AS (
          SELECT p.doc_id, sum({_bdsl_bm}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          JOIN jph ON jph.doc_id = p.doc_id
          WHERE p.term IN ('{QC09_W1}','{QC09_W2}') GROUP BY p.doc_id
        ),
        j3a AS (
          SELECT doc_id, sum({_bdsl_bm}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ({_q10_in}) GROUP BY doc_id
          HAVING count(*) >= {len(QC10_TERMS)}
        ),
        j3 AS (
          SELECT j3a.doc_id, j3a.s
          FROM j3a JOIN documents d USING (doc_id)
          WHERE d.n_chars >= {QC28_LO} AND d.n_chars < {QC28_HI}
        ),
        j4 AS (
          SELECT doc_id, sum({_bdsl_bm}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term = '{QC08_T1}'
            AND doc_id NOT IN
                (SELECT doc_id FROM postings WHERE term = '{QC08_T2}')
          GROUP BY doc_id
        ),
        j5 AS (
          SELECT j1.doc_id, j1.s
          FROM j1 JOIN documents d USING (doc_id)
          WHERE d.n_chars >= {QJD_LO2} AND d.n_chars < {QJD_HI2}
        ),
        j6 AS (
          SELECT DISTINCT doc_id, 1.0 AS s
          FROM postings WHERE term LIKE 'du%'
        ),
        ju AS (
          SELECT CAST(1 AS BIGINT) AS query_id, doc_id, s FROM j1
          UNION ALL SELECT 2, doc_id, s FROM j2
          UNION ALL SELECT 3, doc_id, s FROM j3
          UNION ALL SELECT 4, doc_id, s FROM j4
          UNION ALL SELECT 5, doc_id, s FROM j5
          UNION ALL SELECT 6, doc_id, s FROM j6
        ),
        jr AS (
          SELECT query_id, doc_id, round(s, 6) AS score,
                 CAST(row_number() OVER
                      (PARTITION BY query_id
                       ORDER BY s DESC, doc_id) AS BIGINT) AS rank
          FROM ju
        )
        SELECT * FROM jr WHERE rank <= {BDSL_K}
        ORDER BY query_id, rank"""
    # query_join_lucene: the SAME six queries arrive as Lucene-syntax
    # strings parsed per row on the executors — results must be
    # identical, so the oracle is shared verbatim
    o["query_join_lucene"] = o["query_join_dsl"]
    # dedup_paragraphs: replay the synthetic 3-paragraph layout, the
    # min(bid, pos) winner per paragraph md5 (keyed bid*2^32+pos — pos
    # is bounded far below 2^32), the whitespace exemption, and the
    # ordered rebuild; NULL text passes through (md5(NULL) IS NULL on
    # both engines)
    o["dedup_paragraphs"] = """
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 97 = 0 THEN NULL
                      ELSE substr(text, 1, 40)
                           || chr(10) || chr(10)
                           || CASE WHEN doc_id % 11 = 0 THEN ' '
                                   ELSE 'shared ' || CAST(doc_id % 7 AS VARCHAR)
                              END
                           || chr(10) || chr(10)
                           || substr(text, 1, 40)
                 END AS text
          FROM documents
        ),
        lists AS (
          SELECT doc_id,
                 string_split_regex(
                   regexp_replace(coalesce(text, ''),
                                  chr(13) || chr(10), chr(10), 'g'),
                   chr(10) || '{2,}') AS ps
          FROM src
        ),
        paras AS (
          SELECT doc_id AS _bid, i - 1 AS _pos, ps[i] AS _para,
                 md5(ps[i]) AS _ph
          FROM lists, LATERAL unnest(range(1, len(ps) + 1)) AS r(i)
        ),
        winners AS (
          SELECT _ph, min(_bid * 4294967296 + _pos) AS wk
          FROM paras GROUP BY _ph
        ),
        kept AS (
          SELECT p._bid, p._pos, p._para
          FROM paras p JOIN winners w ON p._ph = w._ph
          WHERE p._bid * 4294967296 + p._pos = w.wk
             OR trim(p._para) = ''
        ),
        rebuilt AS (
          SELECT _bid,
                 string_agg(_para, chr(10) || chr(10) ORDER BY _pos) AS nt,
                 count(*) AS nk
          FROM kept GROUP BY _bid
        )
        SELECT s.doc_id,
               md5(CASE WHEN s.text IS NULL THEN NULL
                        ELSE coalesce(r.nt, '') END) AS text_md5,
               CAST(len(l.ps) AS INT) AS n_paragraphs,
               CAST(len(l.ps) - coalesce(r.nk, 0) AS INT) AS n_removed
        FROM src s
        JOIN lists l USING (doc_id)
        LEFT JOIN rebuilt r ON r._bid = s.doc_id
        ORDER BY s.doc_id"""
    # term vector: the _CTE postings filtered to one doc
    o["term_vector"] = _CTE + f"""
        SELECT 'text' AS field, term, CAST(tf AS BIGINT) AS tf,
               CAST(dl AS BIGINT) AS dl
        FROM postings WHERE doc_id = {TV_DOC}
        ORDER BY field, term"""
    # MLT over free text: tokenize the LITERAL like-text, rank its
    # terms by tf * idf against corpus stats (6dp round, term-asc
    # tie-break — mirrors the engine's driver-side selection), then the
    # qc10-class BM25 scored join against the selected terms
    _mlt_score = _bm25_sql("p.tf", "p.dl", "t.df")
    o["search_mlt_text"] = _CTE + f"""
        , qt AS (
          SELECT t AS term, count(*) AS qtf
          FROM unnest(list_filter(
                 string_split_regex(lower('{MLT_TEXT}'), '[^a-z0-9]+'),
                 x -> x <> '')) AS u(t)
          GROUP BY t
        ),
        cand AS (
          SELECT q.term,
                 round(q.qtf * ln(1.0 + (f.n - t.df + 0.5)
                                        / (t.df + 0.5)), 6) AS tfidf
          FROM qt q JOIN termstats t USING (term) CROSS JOIN fieldstats f
        ),
        top AS (
          SELECT term FROM cand ORDER BY tfidf DESC, term LIMIT {MLT_NT}
        ),
        scored AS (
          SELECT p.doc_id, sum({_mlt_score}) AS s
          FROM postings p
          JOIN top USING (term)
          JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          GROUP BY p.doc_id
        )
        SELECT doc_id, round(s, 6) AS score,
               CAST(row_number() OVER (ORDER BY s DESC, doc_id)
                    AS BIGINT) AS rank
        FROM scored ORDER BY s DESC, doc_id LIMIT {QC10_K}"""
    # field collapsing: qc10 pool widened to 50, best-per-source via a
    # partitioned row_number, global re-rank of the survivors
    o["search_collapse"] = (
        "WITH hits AS ("
        + o["qc10_bm25_topk"].replace(f"LIMIT {QC10_K}", "LIMIT 50", 1)
        + f"""),
        j AS (
          SELECT h.doc_id, d.source, h.score
          FROM hits h JOIN documents d USING (doc_id)
        ),
        b AS (
          SELECT doc_id, source, score,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY score DESC, doc_id) AS pr
          FROM j
        ),
        ranked AS (
          SELECT doc_id, source, score,
                 CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                      AS BIGINT) AS rank
          FROM b WHERE pr = 1
        )
        SELECT * FROM ranked WHERE rank <= {COLLAPSE_K}"""
    )
    # maxP: the chunk_docs slicing CTE extended into a full chunk-level
    # BM25 index (postings/stats over composite cid), top-pool
    # passages, then max-rounded-score per parent doc
    _stride = CHUNK_MAX - CHUNK_OVERLAP
    _mx_score = _bm25_sql("p.tf", "p.dl", "t.df")
    o["search_maxp"] = f"""
        WITH t0 AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                                                '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        nz AS (SELECT * FROM t0 WHERE len(toks) > 0),
        c AS (
          SELECT doc_id, toks,
                 unnest(range(0,
                   1 + CAST(ceil(greatest(len(toks) - {CHUNK_MAX}, 0)
                                 / {_stride}.0) AS INT))) AS chunk_id
          FROM nz
        ),
        ch AS (
          SELECT doc_id, chunk_id,
                 toks[chunk_id*{_stride}+1 :
                      chunk_id*{_stride}+{CHUNK_MAX}] AS ctoks
          FROM c
        ),
        ex AS (
          SELECT doc_id * 1000 + chunk_id AS cid, doc_id,
                 len(ctoks) AS dl, unnest(ctoks) AS term
          FROM ch
        ),
        postings AS (
          SELECT cid, any_value(doc_id) AS doc_id, term,
                 count(*) AS tf, any_value(dl) AS dl
          FROM ex GROUP BY cid, term
        ),
        fieldstats AS (
          SELECT count(*) AS n, avg(dl) AS avgdl
          FROM (SELECT cid, any_value(dl) AS dl FROM postings GROUP BY cid)
        ),
        termstats AS (
          SELECT term, count(*) AS df FROM postings GROUP BY term
        ),
        scored AS (
          SELECT p.doc_id, p.cid, sum({_mx_score}) AS s
          FROM postings p JOIN termstats t USING (term)
          CROSS JOIN fieldstats f
          WHERE p.term IN ('{QC10_TERMS[0]}','{QC10_TERMS[1]}')
          GROUP BY p.doc_id, p.cid
        ),
        pool AS (
          SELECT doc_id, round(s, 6) AS score,
                 row_number() OVER (ORDER BY s DESC, cid) AS r
          FROM scored
        ),
        mp AS (
          SELECT doc_id, max(score) AS doc_score
          FROM pool WHERE r <= {MAXP_POOL} GROUP BY doc_id
        ),
        ranked AS (
          SELECT doc_id, doc_score,
                 CAST(row_number() OVER (ORDER BY doc_score DESC, doc_id)
                      AS BIGINT) AS rank
          FROM mp
        )
        SELECT * FROM ranked WHERE rank <= {QC10_K}"""
    # recency decay over the qc10 hits: product of the ROUNDED score
    # and pow(decay, age/scale), re-rounded and re-ranked — pow()
    # parity holds at 6dp like ln (FIXTURES §0 note)
    _dk = (
        f"round(score * pow(0.5, (doc_id % 100) / {DECAY_SCALE}), 6)"
    )
    o["search_decay"] = (
        "WITH hits AS ("
        + o["qc10_bm25_topk"]
        + f""")
        SELECT doc_id, score, {_dk} AS dscore,
               CAST(row_number() OVER (ORDER BY {_dk} DESC, doc_id)
                    AS BIGINT) AS rank
        FROM hits"""
    )
    # snapshot diff: FULL OUTER over (id, content) with IS DISTINCT
    # FROM mirroring the engine's NULL-safe hash compare
    o["corpus_diff"] = f"""
        WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
        n AS (
          SELECT doc_id,
                 CASE WHEN doc_id >= {UPSERT_LO}
                      THEN text || ' upserted extra' ELSE text END AS text
          FROM documents
          WHERE doc_id < {UPSERT_HI} AND doc_id NOT IN {UPSERT_DELS}
        ),
        j AS (
          SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                 o.doc_id AS oid, n.doc_id AS nid,
                 o.text AS ot, n.text AS nt
          FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        )
        SELECT doc_id,
               CASE WHEN oid IS NULL THEN 'added'
                    WHEN nid IS NULL THEN 'removed'
                    WHEN ot IS DISTINCT FROM nt THEN 'changed'
                    ELSE 'unchanged' END AS change
        FROM j
        WHERE NOT (oid IS NOT NULL AND nid IS NOT NULL
                   AND ot IS NOT DISTINCT FROM nt)
        ORDER BY doc_id"""
    # quality-preferring dedup canon: first row in (n_chars DESC, id)
    # partition order — first_value's default frame starts at UNBOUNDED
    # PRECEDING in both engines
    o["dedup_exact_prefer"] = """
        SELECT doc_id,
               first_value(doc_id) OVER (
                 PARTITION BY md5(text)
                 ORDER BY n_chars DESC, doc_id) AS canon_id,
               doc_id <> first_value(doc_id) OVER (
                 PARTITION BY md5(text)
                 ORDER BY n_chars DESC, doc_id) AS is_duplicate
        FROM documents ORDER BY doc_id"""
    # hybrid RRF: two full qc10-class BM25 pipelines as CTEs (the second
    # derived by swapping the IN-list terms), fused by the decimal-
    # summed 1/(60+rank) formula. Nested WITHs inside parenthesized
    # subqueries are valid DuckDB.
    _r2 = o["qc10_bm25_topk"].replace(
        f"'{QC10_TERMS[0]}','{QC10_TERMS[1]}'",
        f"'{HY_TERMS[0]}','{HY_TERMS[1]}'",
        1,
    )
    o["search_hybrid_rrf"] = (
        "WITH r1 AS ("
        + o["qc10_bm25_topk"]
        + "), r2 AS ("
        + _r2
        + f"""),
        u AS (
          SELECT doc_id,
                 CAST(round(1.0 / (60 + rank), 6) AS DECIMAL(28,6)) AS c
          FROM r1
          UNION ALL
          SELECT doc_id,
                 CAST(round(1.0 / (60 + rank), 6) AS DECIMAL(28,6)) AS c
          FROM r2
        ),
        f AS (
          SELECT doc_id,
                 CAST(CAST(sum(c) AS DECIMAL(38,6)) AS DOUBLE)
                   AS rrf_score
          FROM u GROUP BY doc_id
        ),
        ranked AS (
          SELECT doc_id, rrf_score,
                 CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
                      AS BIGINT) AS rank
          FROM f
        )
        SELECT * FROM ranked WHERE rank <= {QC10_K}"""
    )
    # readability: same tokenizer as _CTE, vowel-group syllables with
    # the >= 1 clamp, [.!?]+ sentence runs clamped >= 1; ratio and
    # score arithmetic is single-division / literal-product doubles —
    # bit-identical across engines at 6dp rounding
    o["text_readability"] = """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(coalesce(text, '')),
                                                '[^a-z0-9]+'),
                             x -> x <> '') AS toks,
                 greatest(1, len(regexp_extract_all(coalesce(text, ''),
                                                    '[.!?]+'))) AS n_sents
          FROM documents
        ),
        s AS (
          SELECT doc_id,
                 CAST(n_sents AS BIGINT) AS n_sents,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 CAST(coalesce(list_sum(list_transform(toks,
                        w -> greatest(1, len(regexp_extract_all(w,
                               '[aeiouy]+'))))), 0) AS BIGINT)
                   AS n_syllables
          FROM t
        )
        SELECT doc_id, n_sents, n_words, n_syllables,
               round(CASE WHEN n_words > 0 THEN
                 CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE)
               END, 6) AS words_per_sent,
               round(CASE WHEN n_words > 0 THEN
                 CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
               END, 6) AS syll_per_word,
               round(CASE WHEN n_words > 0 THEN
                 206.835
                 - 1.015 * (CAST(n_words AS DOUBLE)
                            / CAST(n_sents AS DOUBLE))
                 - 84.6 * (CAST(n_syllables AS DOUBLE)
                           / CAST(n_words AS DOUBLE))
               END, 6) AS flesch,
               round(CASE WHEN n_words > 0 THEN
                 0.39 * (CAST(n_words AS DOUBLE)
                         / CAST(n_sents AS DOUBLE))
                 + 11.8 * (CAST(n_syllables AS DOUBLE)
                           / CAST(n_words AS DOUBLE))
                 - 15.59
               END, 6) AS fk_grade
        FROM s ORDER BY doc_id"""

    # LM similarities: collection term frequency (cf) and total field
    # tokens (n * avgdl — the same two stats scoring.py derives them
    # from, so the double product round-trips bit-exactly). Expression
    # shapes mirror functions/scoring.py::lmd_term_score/lmjm_term_score
    # literal-for-literal; the per-term clamp (lmd) applies INSIDE the
    # sum, exactly like the Spark column expression.
    _lm_terms = f"('{QC10_TERMS[0]}','{QC10_TERMS[1]}')"
    o["search_lmd"] = _CTE + f"""
        , collstats AS (SELECT term, sum(tf) AS cf FROM postings GROUP BY term)
        , scored AS (
          SELECT p.doc_id,
                 sum(greatest(
                   ln(1.0 + p.tf / (2000.0 *
                        ((c.cf + 1.0) / (f.n * f.avgdl + 1.0))))
                   + ln(2000.0 / (p.dl + 2000.0)),
                   0.0)) AS s
          FROM postings p JOIN collstats c USING (term) CROSS JOIN fieldstats f
          WHERE p.term IN {_lm_terms}
          GROUP BY p.doc_id
        )
        SELECT doc_id, round(s, 6) AS score,
               CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
        FROM scored ORDER BY s DESC, doc_id LIMIT {QC10_K}"""
    o["search_lmjm"] = _CTE + f"""
        , collstats AS (SELECT term, sum(tf) AS cf FROM postings GROUP BY term)
        , scored AS (
          SELECT p.doc_id,
                 sum(ln(1.0 + ((1.0 - 0.7) * p.tf / p.dl)
                        / (0.7 * ((c.cf + 1.0) / (f.n * f.avgdl + 1.0))))) AS s
          FROM postings p JOIN collstats c USING (term) CROSS JOIN fieldstats f
          WHERE p.term IN {_lm_terms}
          GROUP BY p.doc_id
        )
        SELECT doc_id, round(s, 6) AS score,
               CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank
        FROM scored ORDER BY s DESC, doc_id LIMIT {QC10_K}"""

    # spell correction: full noisy-channel enumeration over the 3-token
    # queries (Viterbi == global argmax for additive scores, so the SQL
    # path product reproduces the Spark recursion exactly). Every
    # expression shape mirrors operators/spelling.py literal-for-literal;
    # score addition order is the Viterbi's left-to-right fold.
    o["spell_correct"] = _CTE + f"""
        , collstats AS (SELECT term, sum(tf) AS cf FROM postings GROUP BY term),
        q AS (
          SELECT doc_id AS query_id,
                 toks[1] AS t0, toks[2] || 'x' AS t1, toks[3] AS t2
          FROM toks WHERE doc_id < {SPELL_NQ} AND len(toks) >= 3
        ),
        qt AS (
          SELECT query_id, 0 AS pos, t0 AS tok FROM q
          UNION ALL SELECT query_id, 1, t1 FROM q
          UNION ALL SELECT query_id, 2, t2 FROM q
        ),
        cand0 AS (
          SELECT qt.query_id, qt.pos, qt.tok, c.term,
                 levenshtein(c.term, qt.tok) AS dist, c.cf
          FROM qt JOIN collstats c
            ON abs(length(c.term) - length(qt.tok)) <= 1
           AND levenshtein(c.term, qt.tok) <= 1
        ),
        cand AS (
          SELECT query_id, pos, term, dist, cf FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id, pos
                      ORDER BY dist ASC, cf DESC, term ASC) AS cr
            FROM cand0) WHERE cr <= {SPELL_C}
        ),
        missing AS (
          SELECT qt.query_id, qt.pos, qt.tok AS term, 0 AS dist,
                 CAST(NULL AS BIGINT) AS cf
          FROM qt
          WHERE NOT EXISTS (SELECT 1 FROM cand c
                            WHERE c.query_id = qt.query_id
                              AND c.pos = qt.pos)
        ),
        cands AS (
          SELECT query_id, pos, term, dist,
                 coalesce(cf / (f.n * f.avgdl),
                          1.0 / (f.n * f.avgdl + 1.0)) AS p_uni
          FROM (SELECT query_id, pos, term, dist, cf FROM cand
                UNION ALL SELECT * FROM missing)
          CROSS JOIN fieldstats f
        ),
        bi0 AS (
          SELECT unnest(list_transform(range(1, len(toks)),
                 i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS pr
          FROM toks WHERE len(toks) >= 2
        ),
        bi AS (SELECT pr.w1 AS w1, pr.w2 AS w2 FROM bi0),
        c12 AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12
                FROM bi GROUP BY w1, w2),
        c1 AS (SELECT w1, CAST(count(*) AS DOUBLE) AS c1
               FROM bi GROUP BY w1),
        trans AS (SELECT c12.w1, c12.w2, ln(c12.c12 / c1.c1) AS lp
                  FROM c12 JOIN c1 USING (w1)),
        paths AS (
          SELECT a.query_id,
                 a.term || ' ' || b.term || ' ' || c.term AS path,
                 ln(a.p_uni) + a.dist * ({SPELL_EDITP!r})
                 + coalesce(tab.lp, ln(0.4 * b.p_uni))
                 + b.dist * ({SPELL_EDITP!r})
                 + coalesce(tbc.lp, ln(0.4 * c.p_uni))
                 + c.dist * ({SPELL_EDITP!r}) AS s,
                 a.dist + b.dist + c.dist AS n_edits
          FROM cands a
          JOIN cands b ON b.query_id = a.query_id AND b.pos = 1
          JOIN cands c ON c.query_id = a.query_id AND c.pos = 2
          LEFT JOIN trans tab ON tab.w1 = a.term AND tab.w2 = b.term
          LEFT JOIN trans tbc ON tbc.w1 = b.term AND tbc.w2 = c.term
          WHERE a.pos = 0
        ),
        best AS (
          SELECT query_id, path, round(s, 6) AS score, n_edits,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY s DESC, path ASC) AS rn
          FROM paths
        )
        SELECT b.query_id, b.path AS corrected, b.score,
               CAST(b.n_edits AS BIGINT) AS n_edits,
               (b.path <> (q.t0 || ' ' || q.t1 || ' ' || q.t2)) AS changed
        FROM best b JOIN q USING (query_id) WHERE rn = 1"""
    return o
