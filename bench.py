"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Workload classes per BASELINE.md (index build, single top-k, filter scan,
batch search, self query-join, stats) plus the pipeline operators
(minhash dedup, embedding top-k). Each timed section runs against a fully
materialized (persisted) index, mirroring the reference's build-once /
query-many economics.
"""

from __future__ import annotations

import json
import os
import re
import time


def _cpu_probe() -> float:
    """Fixed single-thread CPU workload, ~0.25 s on an idle core.

    Machine-state bracket (r11 verdict #6): the suite runs this probe
    before Spark starts and again after the last row, and emits both
    times plus 1-min load averages in the JSON. BASELINE.md's
    interpretation rules (noise band, fastest-of-N) depend on knowing
    whether a drifted row ran on a contended host — the bracket settles
    that without a manual re-run: probe times well above the idle
    anchor, or load far above the core count, mean the row values carry
    contention noise and only isolated re-runs adjudicate.
    """
    t0 = time.perf_counter()
    x = 0
    for i in range(4_000_000):
        x += i * i
    assert x  # keep the loop un-optimizable
    return round(time.perf_counter() - t0, 3)


def _machine_bracket(
    probe_start: float,
    load_start: float,
    steal_start: int | None,
    wall_start: float,
    loads: list[float],
) -> dict:
    """The contention-evidence block for the one-line JSON (r11 verdict
    #6). How to read it (BASELINE.md r12 section is the reference):

    * ``probe_*_sec`` — fixed single-thread workload; idle anchor
      ~0.25 s on this host. Probes well above it = contended endpoints.
    * ``load_start`` — 1-min load BEFORE Spark starts: >~4 means the
      suite began on a busy machine. ``load_max`` (sampled after every
      row) includes Spark's own local[32] work, so mid-suite values up
      to ~cpus are normal; it pins WHICH phase was hot, not whether
      contention existed.
    * ``steal_pct`` — host-steal CPU share over the whole run, from
      /proc/stat: the direct "another tenant took our cores" measure
      that load cannot give. >~5% = row values carry contention noise
      and only isolated re-runs adjudicate drift.
    """
    steal_end = _steal_jiffies()
    wall = max(time.time() - wall_start, 1e-9)
    steal_pct = None
    if steal_start is not None and steal_end is not None:
        # jiffies are USER_HZ=100; normalize by wall x cores
        steal_sec = (steal_end - steal_start) / 100.0
        steal_pct = round(
            100.0 * steal_sec / (wall * (os.cpu_count() or 1)), 2
        )
    return {
        "probe_start_sec": probe_start,
        "probe_end_sec": _cpu_probe(),
        "load_start": load_start,
        "load_end": round(os.getloadavg()[0], 2),
        "load_max": round(max(loads), 2) if loads else None,
        "steal_pct": steal_pct,
        "cpus": os.cpu_count(),
        # the CONFIGURED Spark core count (master local[N]) — distinct
        # from the host's os.cpu_count() above, so a low-core replicate
        # (SPARK_GRAFT_CPUS=8) carries its core-count provenance in the
        # data instead of the filename (r12 ADVICE)
        "spark_cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }


def _steal_jiffies() -> int | None:
    """Cumulative host-steal jiffies (column 8 of /proc/stat's cpu
    line) — the DIRECT signal for "another tenant took our cores".
    Load average can't distinguish Spark's own local[32] work from
    host contention; steal can. None where the file/column is absent
    (non-Linux)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])
    except (OSError, IndexError, ValueError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # --only row [row ...]: isolation mode (r8 verdict #5). Runs ONLY
    # the named rows (comma- or space-separated), building just their
    # dependencies (the shared index, token lists, side indexes)
    # OUTSIDE the timers, and prints the same one-line JSON restricted
    # to those rows. This is the adjudication tool BASELINE.md's
    # interpretation rule refers to: a driver-suite value that looks
    # like a regression is re-run `python3 bench.py --only <row>` on an
    # otherwise idle machine; the isolated value governs. Also honors
    # env SPARK_GRAFT_ONLY (same syntax) for harnesses that can't pass
    # argv.
    import sys

    argv = sys.argv[1:]
    if "--list" in argv:
        # row names, in suite order, without starting Spark
        rows = re.findall(r'with timed\("([^"]+)"\)', open(__file__).read())
        print("\n".join(dict.fromkeys(rows)))
        return
    only: set[str] = set()
    if "--only" in argv:
        only = {
            r
            for a in argv[argv.index("--only") + 1:]
            for r in a.split(",")
            if r
        }
    elif os.environ.get("SPARK_GRAFT_ONLY"):
        only = {
            r for r in re.split(r"[,\s]+", os.environ["SPARK_GRAFT_ONLY"]) if r
        }

    def want(name: str) -> bool:
        return not only or name in only

    probe_start = _cpu_probe()
    load_start = round(os.getloadavg()[0], 2)
    steal_start = _steal_jiffies()
    wall_start = time.time()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sparksearchengine_spark import Corpus, Q, TextOptions
    from sparksearchengine_spark.functions.analyzers import analyzer_expr

    timings: dict[str, float] = {}
    loads: list[float] = []

    def timed(name: str):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t0, 3)
                # per-row load sample: the start/end probes can miss a
                # mid-suite host contention phase entirely (r12 found a
                # 7.7x single-row outlier bracketed by idle probes);
                # load_max in the JSON pins whether ANY row ran hot
                loads.append(os.getloadavg()[0])

        return _T()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. index build (postings + termstats + fieldstats), fully
    # materialized. In --only mode the build still runs (untimed) when
    # any selected row queries the shared index — "pre-built index"
    # isolation semantics.
    _idx_rows = {
        "index_build", "topk_query", "batch_search", "query_join",
        "query_join_skew", "stats", "more_like_this", "search_prf",
        "search_sigterms", "facet_cube", "retrieval_eval",
        "index_upsert", "batch_dsl", "rescore", "query_join_dsl",
    }
    idx = None
    if not only or (only & _idx_rows):
        with timed("index_build"):
            corpus = Corpus(
                docs, id_col="doc_id",
                text_cols={"text": TextOptions(analyzer="simple", positions=True)},
            )
            idx = corpus.build_index()
            idx.postings.count()
            idx.termstats.count()

    # 2. single top-k BM25 query (QC10 class), collect
    if want("topk_query"):
        with timed("topk_query"):
            idx.search(Q.field("text").match_any("dup", "spark"), k=10).collect()

    # 3. filter scan suite (QC01-QC04 class)
    if want("filter_scan"):
        with timed("filter_scan"):
            lineitem.where(F.col("l_quantity") == 25.0).count()
            orders.where(F.col("o_totalprice") > 150000.0).count()
            dt = lineitem.schema["l_shipdate"].dataType
            lineitem.where(
                F.col("l_shipdate").between(
                    F.lit("1995-01-01 00:00:00").cast(dt),
                    F.lit("1996-12-31 23:59:59").cast(dt),
                )
            ).agg(F.count(F.lit(1)), F.sum("l_extendedprice")).collect()
            part.where(F.col("p_size").isin(5, 15, 25)).count()

    # 4. batch search: 20 queries x top-10 (QC11 class)
    if want("batch_search"):
        with timed("batch_search"):
            toks = analyzer_expr(F.col("text"), "simple")
            qdf = docs.where(F.col("doc_id") < 20).select(
                F.col("doc_id").alias("query_id"),
                F.concat_ws(" ", F.slice(toks, 1, 2)).alias("qtext"),
            )
            idx.batch_search(qdf, k=10, field="text").collect()

    # 5. self query-join: 1k docs vs the index, top-5 (E7 class)
    if want("query_join"):
        with timed("query_join"):
            sample = docs.where(F.col("doc_id") < 1000)
            idx.query_join(
                sample, text_col="text", field="text", k=5, other_id_col="doc_id"
            ).count()

    # 5b. skewed self query-join: zipfian queries — 5% of the 1k queries
    # are the corpus' hottest terms, so those query groups match nearly
    # every doc; the salted two-stage rank window must keep this within
    # ~2x of the uniform query_join instead of serializing one reducer
    # setup (hottest-terms lookup) outside the timed block: it's a stats
    # scan, not the operator under test — "stats" times that class
    if want("query_join_skew"):
        hot = " ".join(
            r["term"]
            for r in idx.term_counts()
            .orderBy(F.col("df_t").desc())
            .limit(3)
            .collect()
        )
    if want("query_join_skew"):
        with timed("query_join_skew"):
            skewed = docs.where(F.col("doc_id") < 1000).select(
                "doc_id",
                F.when(F.col("doc_id") % 20 == 0, F.lit(hot))
                .otherwise(F.col("text"))
                .alias("text"),
            )
            idx.query_join(
                skewed, text_col="text", field="text", k=5,
                other_id_col="doc_id", salt_buckets=8,
            ).count()

    # 6. stats: term counts + IDF table (QC12 class)
    if want("stats"):
        with timed("stats"):
            idx.term_counts().count()
            idx.term_idfs().agg(F.sum("idf")).collect()

    # 7. pipeline ops: minhash near-dup + embedding top-k
    if want("minhash_dedup"):
        with timed("minhash_dedup"):
            from sparksearchengine_spark.operators.dedup import minhash_lsh_dedup

            minhash_lsh_dedup(
                docs, id_col="doc_id", text_col="text", n=3,
                num_hashes=64, bands=16, threshold=0.8,
            ).count()

    if want("emb_topk"):
        with timed("emb_topk"):
            from sparksearchengine_spark.operators.similarity import cosine_topk

            queries = emb.where(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            cosine_topk(emb, queries, k=10).count()

    # 8. newer operator families (first benched in round 3 — these rows'
    # first values define their baseline)
    if want("asof_join"):
        with timed("asof_join"):
            from sparksearchengine_spark.operators.asof import asof_join

            # events.ts has shipped as both TIMESTAMP(NANOS) (readable only
            # under the legacy conf, as a long) and TIMESTAMP(MICROS)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            ev = spark.read.parquet(f"{sf_dir}/events.parquet")
            if dict(ev.dtypes)["ts"] != "bigint":
                ev = ev.withColumn(
                    "ts", F.unix_micros(F.col("ts").cast("timestamp"))
                )
            left = ev.where(F.col("event_type") == "click").select(
                "event_id", "user_id", "ts"
            )
            right = ev.where(F.col("event_type") == "purchase").select(
                "user_id", "ts", "value"
            )
            asof_join(left, right, on="user_id").count()

    if want("chunk_pack"):
        with timed("chunk_pack"):
            from sparksearchengine_spark.operators.chunking import (
                chunk_documents,
                pack_chunks,
            )

            ch = chunk_documents(docs, max_tokens=128, overlap=16).withColumn(
                "shard", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(16))
            )
            pack_chunks(ch, budget=2048, shard_col="shard").count()

    if want("more_like_this"):
        with timed("more_like_this"):
            idx.more_like_this(
                docs.where(F.col("doc_id") < 100).select("doc_id"),
                field="text", k=5, num_terms=5,
            ).count()

    # 9. curation rule sets (first benched in round 4 — these rows'
    # first values define their baseline): the full scan-stage filter
    # battery in ONE pass over the corpus, then the shuffling
    # boilerplate-line pass
    if want("text_rules"):
        with timed("text_rules"):
            from sparksearchengine_spark.operators.textstats import (
                c4_filters,
                gopher_rules,
            )

            gopher_rules(docs).agg(
                F.sum(F.col("gopher_pass").cast("int"))
            ).collect()
            c4_filters(docs).agg(F.sum(F.col("c4_keep").cast("int"))).collect()

    # 10. clustering + classifier families (first benched in round 3 —
    # first values define their baseline)
    # renamed r5 (VERDICT r4 #7): semdedup -> semdedup_expr_ref. The
    # expr path is the oracle-parity REFERENCE row, not the production
    # default (arrow, below) — the suffix keeps cross-round comparisons
    # from mistaking it for the production cost. Baseline continuity:
    # semdedup_expr_ref inherits the old "semdedup" history.
    if want("semdedup_expr_ref"):
        with timed("semdedup_expr_ref"):
            from sparksearchengine_spark.operators.clustering import semdedup

            semdedup(
                emb, threshold=0.4, n_clusters=16, method="expr"
            ).where("NOT keep").count()

    # the production default (method="arrow" since r4)
    if want("semdedup_arrow"):
        with timed("semdedup_arrow"):
            # local import again: under --only semdedup_arrow the
            # expr_ref block above never ran (r9 review finding)
            from sparksearchengine_spark.operators.clustering import semdedup

            semdedup(
                emb, threshold=0.4, n_clusters=16, method="arrow"
            ).where("NOT keep").count()

    if want("classifier"):
        with timed("classifier"):
            from sparksearchengine_spark.operators.classify import (
                classifier_score,
            )

            w = [((i * 7) % 13) - 6 for i in range(256)]
            classifier_score(docs, w, threshold=0).where("keep").count()

    if want("hash_embed"):
        with timed("hash_embed"):
            from sparksearchengine_spark.operators.classify import hash_embed

            hash_embed(docs, dim=64, method="arrow").agg(
                F.count(F.lit(1))
            ).collect()

    if want("winnow_pairs"):
        with timed("winnow_pairs"):
            from sparksearchengine_spark.operators.dedup import (
                winnow_overlap_pairs,
            )

            winnow_overlap_pairs(docs, min_overlap=0.5).count()

    if want("bigram_lm"):
        with timed("bigram_lm"):
            from sparksearchengine_spark.operators.decontam import bigram_logprob

            bigram_logprob(docs).agg(F.sum("n_bigrams")).collect()

    # r5: Bloom-filter decontamination (join-free scale path) — first
    # value defines its baseline. Same eval split as the driver row.
    if want("decontam_bloom"):
        with timed("decontam_bloom"):
            from sparksearchengine_spark.operators.decontam import (
                bloom_decontaminate,
                bloom_gram_filter,
            )

            ev = docs.where(F.col("doc_id") % 37 == 0).select("doc_id", "text")
            bl = bloom_gram_filter(ev, n=8)
            bloom_decontaminate(docs, bl).agg(
                F.sum(F.col("contaminated").cast("int"))
            ).collect()

    if want("boilerplate"):
        with timed("boilerplate"):
            from sparksearchengine_spark.operators.dedup import (
                remove_boilerplate_lines,
            )

            remove_boilerplate_lines(docs).agg(F.sum("n_removed")).collect()

    # 11. round-3 families (first values define their baseline): DSIR
    # importance weighting (two hashed-ngram corpus passes + broadcast
    # ratio join) and URL canonicalization (pure scan-stage regex/array).
    # sf0.1 documents is ONE parquet file = one task under the default
    # 128 MB split; 8 MB splits emulate the multi-file layout a 100 TB
    # corpus actually has, scoped to these rows so the established
    # baselines above keep their input shape.
    if want("dsir") or want("url_keys"):
        spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
        docs_split = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if want("dsir"):
        with timed("dsir"):
            from sparksearchengine_spark.operators.dsir import (
                dsir_log_weights,
                release_feature_caches,
            )

            target = docs_split.where(F.col("lang") == "en")
            dsir_log_weights(docs_split, target, dim=10_000).agg(
                F.sum("log_weight")
            ).collect()
    if want("dsir"):
        # free the exploded-feature cache so later sections don't
        # compete with its blocks for executor memory
        release_feature_caches()

    if want("url_keys"):
        with timed("url_keys"):
            from sparksearchengine_spark.operators.weburl import with_url_keys

            urls = docs_split.select(
                "doc_id",
                F.concat(
                    F.lit("HTTPS://User:Pw@WWW."),
                    F.upper(F.col("source")),
                    F.lit(".Example.COM:8443/Docs//"),
                    F.col("doc_id").cast("string"),
                    F.lit("?b=2&utm_source=x&a=1#frag"),
                ).alias("url"),
            )
            with_url_keys(urls, "url").groupBy("url_domain").count().collect()

    # 12. round-3 search extensions (first values define their baseline).
    # bm25f gets its own two-field index; the build is untimed (the
    # index_build row already prices builds), queries are the operator.
    if want("dsir") or want("url_keys"):
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    if want("search_prf"):
        with timed("search_prf"):
            idx.prf_expand_search(
                "dup spark", k=10, fb_docs=5, fb_terms=8
            ).collect()

    if want("search_sigterms"):
        with timed("search_sigterms"):
            idx.significant_terms(
                Q.field("text").match_any("dup", "spark"), k=10, min_doc_count=2
            ).collect()

    if want("search_bm25f"):
        from sparksearchengine_spark import Corpus as _C

        idx2 = _C(
            docs,
            id_col="doc_id",
            text_cols={
                "text": TextOptions(analyzer="simple", positions=False),
                "source": TextOptions(analyzer="simple", positions=False),
            },
        ).build_index()
        idx2.postings.count()  # materialize outside the timed block
    if want("search_bm25f"):
        with timed("search_bm25f"):
            idx2.bm25f_search(
                "dup spark src3", {"text": 1.0, "source": 2.0}, k=10
            ).collect()

    # 13. late round-3 families (first values define their baseline)
    if want("facet_cube"):
        with timed("facet_cube"):
            idx.facet_cube(
                Q.field("text").match_any("dup", "spark"), ["lang", "source"]
            ).collect()

    if want("events_resample"):
        with timed("events_resample"):
            from sparksearchengine_spark.operators.events import (
                resample_gapfill,
            )

            # fresh read: section 8 may have rebound `ev` at MICROS
            # resolution; normalize to long NANOS to match the hour interval
            ev2 = spark.read.parquet(f"{sf_dir}/events.parquet")
            if dict(ev2.dtypes)["ts"] != "bigint":
                ev2 = ev2.withColumn(
                    "ts",
                    (
                        F.unix_micros(F.col("ts").cast("timestamp"))
                        * F.lit(1000)
                    ).cast("long"),
                )
            resample_gapfill(
                ev2, 3_600_000_000_000, key_col="event_type", value_col="value"
            ).count()

    if want("table_corr"):
        with timed("table_corr"):
            from sparksearchengine_spark.operators.profile import (
                correlation_matrix,
            )

            correlation_matrix(
                lineitem,
                ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            ).collect()

    # 14. r5: retrieval-quality eval — batch search 200 queries, judge
    # against a synthetic label set, macro-roll-up (first value =
    # baseline)
    if want("retrieval_eval"):
        with timed("retrieval_eval"):
            from sparksearchengine_spark.operators.evaluate import (
                retrieval_metrics,
                retrieval_metrics_summary,
            )

            toks14 = analyzer_expr(F.col("text"), "simple")
            qdf14 = docs.where(F.col("doc_id") < 200).select(
                F.col("doc_id").alias("query_id"),
                F.concat_ws(" ", F.slice(toks14, 1, 2)).alias("qtext"),
            )
            res14 = idx.batch_search(qdf14, k=10, field="text")
            labels14 = (
                spark.range(200)
                .select(F.col("id").alias("query_id"))
                .select(
                    "query_id",
                    F.explode(F.sequence(F.lit(1), F.lit(8))).alias("j"),
                )
                .select(
                    "query_id",
                    (
                        (F.col("query_id") * 97 + F.col("j") * 13) % 50_000
                    ).alias("doc_id"),
                    (
                        F.lit(1.0)
                        + ((F.col("query_id") + F.col("j")) % 3).cast(
                            "double"
                        )
                    ).alias("grade"),
                )
            )
            retrieval_metrics_summary(
                retrieval_metrics(res14, labels14, k=10, rank_col="rank")
            ).collect()

    # 15b. r5: PQ/ADC — encode the full embeddings table to 4-byte
    # codes and answer 100 queries by lookup-table scoring (first
    # value = baseline). Compare against emb_topk's float brute force.
    if want("pq_adc"):
        with timed("pq_adc"):
            from sparksearchengine_spark.operators.similarity import (
                pq_encode,
                pq_topk,
            )

            cbs = [
                [
                    [
                        ((j * 131 + c * 31 + d * 17) % 23 - 11) / 10.0
                        for d in range(16)
                    ]
                    for c in range(8)
                ]
                for j in range(4)
            ]
            coded = pq_encode(emb, cbs).persist()
            coded.count()
            q15 = emb.where(F.col("vec_id") < 100).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            pq_topk(coded, q15, cbs, k=10, codes_col="codes").count()
            coded.unpersist()

    # 15. r5: incremental index upsert — fold a 2% CDC delta into the
    # main index without re-tokenizing the base corpus; compare against
    # index_build (the full-rebuild alternative). First value = baseline.
    if want("index_upsert"):
        with timed("index_upsert"):
            from sparksearchengine_spark.operators.index import upsert_index

            changes15 = docs.where(F.col("doc_id") % 50 == 0).withColumn(
                "text", F.concat(F.col("text"), F.lit(" upserted"))
            )
            up15 = upsert_index(
                idx, changes15, deletes=[1, 3, 7], persist=False
            )
            up15.postings.count()

    # 16. r6: heterogeneous DSL batch — 60 term-class + 8 exact phrases
    # + 4 boolean/filtered shapes in ONE call; term classes and phrases
    # run as data (two shared plans), the booleans compile once each.
    # First value = baseline.
    from sparksearchengine_spark import F_

    f16 = Q.field("text")
    # query prep (corpus token frequencies) is not the measured operator
    if (
        want("batch_dsl")
        or want("query_join_dsl")
        or want("percolate_registry")
    ):
        toks16 = [
            r[0]
            for r in docs.select(
                F.explode(analyzer_expr(F.col("text"), "simple"))
            )
            .groupBy("col")
            .count()
            .orderBy(F.desc("count"))
            .limit(24)
            .collect()
        ]
    if want("batch_dsl"):
        with timed("batch_dsl"):
            qs16 = []
            for i in range(60):  # term class: matchAny pairs
                qs16.append(
                    (i, f16.match_any(toks16[i % 24], toks16[(i + 7) % 24]))
                )
            for i in range(8):  # exact phrases over frequent bigrams
                qs16.append(
                    (
                        100 + i,
                        f16.match_phrase(
                            f"{toks16[i % 24]} {toks16[(i + 1) % 24]}"
                        ),
                    )
                )
            qs16 += [
                (200, f16.match_term(toks16[0]) & ~f16.match_term(toks16[1])),
                (201, f16.match_text(" ".join(toks16[:3])) & F_.gt("n_chars", 200)),
                (202, f16.match_all(toks16[2], toks16[3]) | f16.match_term(toks16[4])),
                (203, ~f16.match_term(toks16[5])),
            ]
            idx.batch_search_dsl(qs16, k=10).count()

    # 17. two-pass rescoring (first benched in round 6): cheap matchAny
    # window of 200, phrase rescore compiled against the semi-filtered
    # postings view, re-rank top-10. The expensive pass's cost must be
    # window-bounded, not match-set-bounded.
    if want("rescore"):
        with timed("rescore"):
            from sparksearchengine_spark.operators.search import rescore_search

            rescore_search(
                idx,
                Q.field("text").match_any("dup", "spark"),
                Q.field("text").match_phrase("table hash"),
                k=10,
                window=200,
                rescore_weight=2.0,
            ).count()

    # 18. fully general query join (first benched in round 7): 150 rows
    # each carrying their OWN serialized query tree — data-tier shapes
    # (terms / phrases / filtered) plus four repeated general shapes
    # sharing compiled plans. Executor-side shape grouping: the driver
    # sees only distinct signatures/canons. Sizing note: the synthetic
    # corpus has a 31-term vocabulary, so EVERY query term is hot and
    # each query's candidate set is ~half the corpus — cost is
    # match-volume-bound (|queries| x |matching docs| agg rows, linear
    # in the row count; measured 0.06-0.08 s/query at sf0.1, the same
    # per-query class as batch_dsl). 150 rows keeps the row about the
    # executor, not corpus degeneracy.
    if want("query_join_dsl"):
        with timed("query_join_dsl"):
            from sparksearchengine_spark.operators.joindsl import query_join_dsl
            from sparksearchengine_spark.plans.ast import F_ as _F
            from sparksearchengine_spark.plans.serde import query_to_json

            f18 = Q.field("text")
            shapes = []
            for i in range(150):
                t1, t2 = toks16[i % 24], toks16[(i + 5) % 24]
                m = i % 5
                if m == 0:
                    q = f18.match_term(t1)
                elif m == 1:
                    q = f18.match_any(t1, t2)
                elif m == 2:
                    q = f18.match_phrase(f"{t1} {t2}")
                elif m == 3:
                    q = f18.match_term(t1) & _F.ge("n_chars", 100 + (i % 7) * 50)
                else:
                    # general tier: 4 DISTINCT canons across the 30
                    # general rows — the realistic registry shape (many
                    # rows, few plans); a canon-per-row stress test
                    # belongs in pytest, not the headline suite
                    ga, gb = toks16[i % 4], toks16[(i % 4) + 6]
                    q = f18.match_term(ga) & ~f18.match_term(gb)
                shapes.append((i, query_to_json(q)))
            qdf18 = spark.createDataFrame(shapes, "rid long, qjson string")
            query_join_dsl(idx, qdf18, "qjson", k=5, other_id_col="rid").count()

    # 19. cross-doc paragraph dedup (first benched in round 7): the
    # Dolma paragraph step over synthesized 3-paragraph docs — one
    # hash agg + one hash join on the md5, no corpus window.
    if want("dedup_paragraphs"):
        with timed("dedup_paragraphs"):
            from sparksearchengine_spark.operators.dedup import dedup_paragraphs

            p1 = F.substring("text", 1, 60)
            p2 = F.concat(F.lit("shared "), (F.col("doc_id") % 50).cast("string"))
            src19 = docs.select(
                "doc_id", F.concat_ws("\n\n", p1, p2, p1).alias("text")
            )
            dedup_paragraphs(src19).count()

    # 20. table-registry percolation (first benched in round 8): 10,000
    # standing queries live as a serialized COLUMN (the "a million
    # standing queries never visit the driver" claim, benched) and
    # percolate against an INCOMING DOCUMENT BATCH (docs sampled 1-in-10
    # and indexed outside the timer) — the real percolation shape: the
    # registry is large, the batch is small, matches = which alerts
    # fire. Mixed shapes: 50% 3-term conjunctions, 25% terms + range
    # guard (one shared filter signature, values as data), 15% exact
    # phrases, 10% general trees sharing 4 compiled canons. Registry
    # construction (query prep) is not the measured operator. NOT run
    # against the full corpus on purpose: the synthetic 31-term
    # vocabulary makes every standing query match ~half the corpus, so
    # a full-corpus row measures degenerate match volume (26M+ rows),
    # not the operator.
    if want("percolate_registry"):
        from sparksearchengine_spark.operators.joindsl import (
            percolate_dsl_df,
        )
        from sparksearchengine_spark.plans.ast import F_ as _F
        from sparksearchengine_spark.plans.serde import (
            query_to_json as _ser20,
        )

        batch20 = docs.where(F.col("doc_id") % 10 == 0)
        bidx20 = Corpus(
            batch20,
            id_col="doc_id",
            text_cols={"text": TextOptions(analyzer="simple", positions=True)},
        ).build_index()
        bidx20.postings.count()
        bidx20.scored_postings("text").count()
        f20 = Q.field("text")
        regs20 = []
        for i in range(10_000):
            t1, t2, t3 = (
                toks16[i % 24], toks16[(i + 7) % 24], toks16[(i + 13) % 24]
            )
            m = i % 20
            if m < 10:
                q = f20.match_all(t1, t2, t3)
            elif m < 15:
                lo = 60 + (i % 430)
                q = f20.match_all(t1, t2) & _F.between("n_chars", lo, lo + 25)
            elif m < 18:
                q = f20.match_phrase(f"{t1} {t2}")
            else:
                q = f20.match_term("dup") & ~f20.match_term(toks16[i % 4])
            regs20.append((i, _ser20(q)))
        qdf20 = spark.createDataFrame(regs20, "qid long, qjson string")
        # min-of-3 by construction (r10 verdict #4): this row's cost is
        # dominated by Python-worker + registry-prep startup that swings
        # with VM load; BASELINE.md's fastest-of-N adjudication rule is
        # baked into the reported value.
        runs20 = []
        for _ in range(3):
            with timed("percolate_registry"):
                percolate_dsl_df(bidx20, qdf20, "qjson", "qid").count()
            runs20.append(timings["percolate_registry"])
        timings["percolate_registry"] = min(runs20)
        bidx20.unpersist()

    # 38. PageRank over a synthetic ~1M-edge graph (r9 verdict #2):
    # 100k nodes x 10 out-edges via multiplicative hashing, generated
    # DISTRIBUTED (spark.range — no driver-side edge list) and
    # materialized outside the timer per the --only dependency
    # convention. Fixed 5 iterations, tol=None: the timed work is
    # exactly 5 join+agg rounds plus the degree build.
    if want("pagerank"):
        from sparksearchengine_spark.operators.linkgraph import pagerank

        pr_nodes, pr_deg = 100_000, 10
        pr_edges = (
            spark.range(pr_nodes * pr_deg)
            .select(
                (F.col("id") % pr_nodes).alias("src"),
                ((F.col("id") * 2654435761) % pr_nodes).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .persist()
        )
        pr_edges.count()
        with timed("pagerank"):
            pagerank(pr_edges, iterations=5, tol=None).count()
        pr_edges.unpersist()

    # 39. end-to-end crawl ingest (r9 verdict #2): generated
    # multi-record .warc.gz fixtures (32 files x 64 HTML responses x 8
    # outlinks over 200 domains, one gzip member per record — the
    # Common Crawl layout) -> warc_outlink_edges (the r11 FUSED path:
    # parse + HTTP split + outlink extraction in ONE Arrow pass; the
    # html payload never crosses Arrow) -> domain_pagerank. Fixture
    # WRITE is untimed (it is the dependency) but INSIDE the try so an
    # exception cannot leak the temp dir (r10 ADVICE). The row is
    # min-of-3 BY CONSTRUCTION (r10 verdict #4): its wall clock swings
    # ~3x with Python-worker spawn jitter on a loaded VM, and
    # BASELINE.md's standing adjudication rule for it is fastest-of-N —
    # now baked into the reported value.
    if want("crawl_ingest"):
        import gzip as _gzip
        import shutil as _shutil
        import tempfile as _tempfile

        from sparksearchengine_spark.operators.linkgraph import (
            domain_pagerank,
        )
        from sparksearchengine_spark.sources.warc import warc_outlink_edges

        wdir = _tempfile.mkdtemp(prefix="bench_crawl_")
        try:
            n_files, per_file, n_dom = 32, 64, 200
            for fi in range(n_files):
                with open(f"{wdir}/f{fi:02d}.warc.gz", "wb") as fh:
                    for pi in range(per_file):
                        g = fi * per_file + pi
                        dom = g % n_dom
                        links = "".join(
                            f'<a href="http://d{(dom * 7 + j * 13 + g) % n_dom}'
                            f'.example/p{j}">x</a>'
                            for j in range(8)
                        )
                        html = f"<html><body>{links}</body></html>".encode()
                        body = (
                            b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html\r\n\r\n" + html
                        )
                        hdr = (
                            "WARC/1.0\r\nWARC-Type: response\r\n"
                            f"WARC-Target-URI: http://d{dom}.example/page{g}\r\n"
                            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
                            f"WARC-Record-ID: <urn:uuid:{g}>\r\n"
                            "Content-Type: application/http; msgtype=response\r\n"
                            f"Content-Length: {len(body)}\r\n\r\n"
                        ).encode()
                        fh.write(_gzip.compress(hdr + body + b"\r\n\r\n"))
            runs = []
            for _ in range(3):
                with timed("crawl_ingest"):
                    links_df = warc_outlink_edges(spark, wdir)
                    domain_pagerank(links_df, iterations=5, tol=None).count()
                runs.append(timings["crawl_ingest"])
            timings["crawl_ingest"] = min(runs)
        finally:
            _shutil.rmtree(wdir, ignore_errors=True)

    # 40. WET text ingest (r11 verdict #2): 32 generated .warc.gz x 16
    # conversion records x ~220 KB plain text (~113 MB — big records,
    # the payload-dominated 100 TB shape) -> read_wet_text (the FUSED
    # decode path: text decoded inside the parser pass, crossing Arrow
    # once) -> full-corpus length sum (forces every byte across).
    # Fixture write untimed, inside the try (temp dir never leaks).
    # Min-of-3 by construction — same Python-worker spawn jitter class
    # as crawl_ingest (BASELINE.md adjudication rule).
    if want("wet_ingest"):
        import gzip as _gzip
        import shutil as _shutil
        import tempfile as _tempfile

        from sparksearchengine_spark.sources.warc import read_wet_text

        wdir = _tempfile.mkdtemp(prefix="bench_wet_")
        try:
            n_files, per_file = 32, 16
            filler = (
                "lorem ipsum dolor sit amet consectetur adipiscing elit "
                * 4000
            )
            for fi in range(n_files):
                with open(f"{wdir}/f{fi:02d}.warc.gz", "wb") as fh:
                    for pi in range(per_file):
                        g = fi * per_file + pi
                        body = (f"doc {g} " + filler).encode()
                        hdr = (
                            "WARC/1.0\r\nWARC-Type: conversion\r\n"
                            f"WARC-Target-URI: http://d{g % 200}.example/p{g}\r\n"
                            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
                            f"WARC-Record-ID: <urn:uuid:{g}>\r\n"
                            "Content-Type: text/plain\r\n"
                            f"Content-Length: {len(body)}\r\n\r\n"
                        ).encode()
                        fh.write(_gzip.compress(hdr + body + b"\r\n\r\n"))
            runs = []
            for _ in range(3):
                with timed("wet_ingest"):
                    read_wet_text(spark, wdir).select(
                        F.sum(F.length("text"))
                    ).collect()
                runs.append(timings["wet_ingest"])
            timings["wet_ingest"] = min(runs)
        finally:
            _shutil.rmtree(wdir, ignore_errors=True)

    if only:
        # isolation mode: report ONLY the requested rows (the shared
        # index build may have run as a dependency — it is not part of
        # the requested measurement)
        timings = {k: v for k, v in timings.items() if k in only}
    total = round(sum(timings.values()), 3)
    # "value" sums the REPORTED row values; for the min-of-3 rows
    # (crawl_ingest, percolate_registry, wet_ingest) that is the
    # fastest repetition, not the wall clock spent — so since r11 the
    # headline total is a sum-of-reported-rows metric, comparable
    # r11-to-r12+ but NOT to r10-and-earlier single-shot totals
    # (BASELINE.md r12 section documents this).
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # machine-state bracket (r11 verdict #6): fixed CPU
                # probe + 1-min load, before Spark start / after the
                # last row — see BASELINE.md for how to read it
                "machine": _machine_bracket(
                    probe_start, load_start, steal_start, wall_start,
                    loads,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
