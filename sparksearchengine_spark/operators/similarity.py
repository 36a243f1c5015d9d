"""Similarity search over embedding columns (array<float>).

North-star operators (BASELINE.json): brute-force cosine top-k as the
exact baseline, and an LSH-bucketed approximate variant as the scale path.

Design for 100 TB:
* queries are broadcast (they are the small side by construction);
* the dot product is a pure SQL higher-order-function expression
  (zip_with + aggregate) — JVM-side, no Python in the hot loop;
* norms are precomputed once per side (never per pair);
* top-k per query goes through the two-stage salted rank window
  (operators.search.topk_per_group) so one hot query can't serialize a
  single reducer;
* the LSH variant buckets by random-hyperplane signature so each probe
  touches |bucket| << N candidates.

The fold order of `aggregate` is the array order, deterministic — required
for the DuckDB value-parity oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.search import topk_per_group

# cosine_topk_arrow collects its query side to the driver (each row is an
# id + a dim-length float vector); this cap keeps that collect at MBs, not
# GBs, mirroring search.py's BROADCAST_MAX_QUERY_ROWS broadcast guard.
COLLECT_MAX_QUERY_ROWS = 100_000


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<float/double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    # NULL (not NaN) on zero-norm vectors: 0/0 is NaN, and Spark sorts
    # NaN GREATER than every double — an all-zero embedding would rank 1
    # for every query (r3 review finding). NULL sorts last under desc.
    d = norm_expr(a) * norm_expr(b)
    return F.when(d > 0, dot_expr(a, b) / d)


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, vec_id, cos_sim, rank).

    Plan: broadcast-nested-loop of items × (tiny) queries with the scoring
    expression fused into the scan — at 1000 executors this is
    embarrassingly parallel, one pass over the items, zero shuffle until
    the (salted) top-k reduction.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qvec"),
        norm_expr(F.col(query_vec)).alias("_qnorm"),
    )
    it = items.select(
        F.col(item_id).alias("vec_id"),
        F.col(item_vec).alias("_ivec"),
        norm_expr(F.col(item_vec)).alias("_inorm"),
    )
    scored = it.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.when(
            (F.col("_inorm") > 0) & (F.col("_qnorm") > 0),
            dot_expr(F.col("_ivec"), F.col("_qvec"))
            / (F.col("_inorm") * F.col("_qnorm")),
        ).alias("cos_sim"),  # NULL on zero norms -> sorts last, never rank 1
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("vec_id").asc()],
        k=k,
        salt_buckets=salt_buckets,
        salt_col="vec_id",
    ).select("query_id", "vec_id", "cos_sim", "rank")


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``(id, scale, qvec)`` with
    ``qvec[i] = floor(v[i]/scale + 0.5)`` (explicit half-up — identical
    in every engine, unlike round()'s mode-dependent ties), ``scale =
    max|v|/127``. Cuts embedding memory/shuffle bytes 4× — the at-rest
    format for a 100 TB ANN corpus; candidate scoring dequantizes
    (``qvec[i]*scale``), exact re-rank reads the fp vector only for
    finalists.

    All-zero vectors get scale 0 and qvec of zeros (dequantizes to the
    zero vector, never divides by zero).
    """
    # two-phase on purpose: the lambda must reference the PRECOMPUTED
    # scale column, not the array_max expression — higher-order functions
    # are interpreted with no CSE, so an inlined scale would re-scan the
    # whole vector per element, O(d^2) per row (r3 review finding; same
    # pitfall textstats documents for its n-gram stats). CollapseProject
    # keeps the split because the lambda references scale twice.
    v = F.col(vec_col)
    scale = (
        F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    )
    staged = df.select(F.col(id_col), v.alias("_v"), scale.alias("scale"))
    sc = F.col("scale")
    return staged.select(
        F.col(id_col),
        "scale",
        F.when(F.col("_v").isNull(), None)
        .otherwise(
            F.transform(
                F.col("_v"),
                lambda x: F.when(sc == F.lit(0.0), F.lit(0)).otherwise(
                    F.floor(x / sc + F.lit(0.5))
                ).cast("int"),
            )
        )
        .alias("qvec"),
    )


def dequantize_expr(qvec: Column, scale: Column) -> Column:
    """array<float-ish doubles> back from (qvec, scale)."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def cosine_topk_quantized(
    items_q: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k over a QUANTIZED item table (the output
    of ``quantize_embeddings``): same plan as ``cosine_topk`` with the
    item vector dequantized in the scan. Approximation error is the int8
    rounding only (recall measured against the fp path in the tests).
    """
    it = items_q.select(
        F.col(item_id).alias("vec_id"),
        dequantize_expr(F.col("qvec"), F.col("scale")).alias("_ivec"),
    ).select(
        "vec_id", "_ivec", norm_expr(F.col("_ivec")).alias("_inorm")
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qvec"),
        norm_expr(F.col(query_vec)).alias("_qnorm"),
    )
    scored = it.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.when(
            (F.col("_inorm") > 0) & (F.col("_qnorm") > 0),
            dot_expr(F.col("_ivec"), F.col("_qvec"))
            / (F.col("_inorm") * F.col("_qnorm")),
        ).alias("cos_sim"),  # NULL on zero norms -> sorts last, never rank 1
    )
    from sparksearchengine_spark.operators.search import topk_per_group

    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("vec_id").asc()],
        k=k,
        salt_buckets=salt_buckets,
        salt_col="vec_id",
    ).select("query_id", "vec_id", "cos_sim", "rank")


def cosine_topk_arrow(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k via Arrow-batched numpy matmul.

    Same semantics as :func:`cosine_topk`; different physical plan for the
    dim x N hot loop: queries are collected (they are the small side by
    construction) and broadcast as a normalized matrix; each Arrow batch of
    items is one BLAS ``V @ Q.T``, and only the per-batch top-k per query
    leaves Python — the global exact top-k then reduces |batches| * k
    partials per query. The expression-based variant evaluates the
    ``aggregate(zip_with(...))`` fold interpreted per pair; this one is
    vectorized, so it wins as N * dim grows.

    Ties at the per-batch k boundary are broken by vec_id asc, matching the
    global ordering, so partial top-k is exact.

    The query side is collected to the driver, so it is hard-capped at
    ``COLLECT_MAX_QUERY_ROWS`` rows (the ``limit(cap+1)`` probe bounds the
    driver fetch even when the input is huge). Above the cap this raises
    rather than OOM-ing the driver — use :func:`lsh_cosine_topk` or
    :func:`ivf_search` for corpus-scale query sides.
    """
    import numpy as np
    import pandas as pd

    probe = queries.select(query_id, query_vec).limit(
        COLLECT_MAX_QUERY_ROWS + 1
    )
    qrows = probe.collect()
    if len(qrows) > COLLECT_MAX_QUERY_ROWS:
        raise ValueError(
            "cosine_topk_arrow collects the query side to the driver and "
            f"got more than COLLECT_MAX_QUERY_ROWS={COLLECT_MAX_QUERY_ROWS} "
            "query rows. For large query sides use the distributed scale "
            "paths: lsh_cosine_topk (banded hyperplane LSH) or ivf_search "
            "(cell-partitioned IVF), or cosine_topk (no driver collect)."
        )
    spark = items.sparkSession
    if not qrows:  # empty query set -> empty result, same as the SQL path
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cos_sim double, rank int"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = np.nan  # zero-norm query -> NaN sims, masked below
    qmat = qmat / qn
    bq = spark.sparkContext.broadcast((qids, qmat))

    def score(batches):
        nqids, nq = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            v = np.array([list(x) for x in pdf["_vec"]], dtype=np.float64)
            inorm = np.linalg.norm(v, axis=1)
            keep = inorm > 0  # zero-norm items have no direction (SQL
            if not keep.any():  # path yields NULL cos_sim; here: drop)
                continue
            ids, v = ids[keep], v[keep]
            v = v / inorm[keep, None]
            sims = v @ nq.T  # (batch, n_queries)
            kk = min(k, sims.shape[0])
            # top-kk rows per query; ties by vec_id asc via lexsort
            order = np.lexsort((ids[:, None].repeat(len(nqids), 1), -sims), axis=0)
            sel = order[:kk]  # (kk, n_queries)
            out_q = np.repeat(nqids[None, :], kk, axis=0).ravel()
            out_i = ids[sel].ravel()
            out_s = np.take_along_axis(sims, sel, axis=0).ravel()
            ok = ~np.isnan(out_s)  # zero-norm queries: no defined sims
            yield pd.DataFrame(
                {"query_id": out_q[ok], "vec_id": out_i[ok], "cos_sim": out_s[ok]}
            )

    partials = items.select(
        F.col(item_id).cast("long").alias("_id"), F.col(item_vec).alias("_vec")
    ).mapInPandas(score, schema="query_id long, vec_id long, cos_sim double")
    return topk_per_group(
        partials,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("vec_id").asc()],
        k=k,
    ).select("query_id", "vec_id", "cos_sim", "rank")


def _hyperplanes(num_planes: int, dim: int, seed: int = 20240) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (fixed LCG -> no
    runtime RNG, reproducible across sessions)."""
    planes = []
    state = seed
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature string (one char per plane) — pure SQL."""
    bits = [
        F.when(
            dot_expr(vec, F.array(*[F.lit(v) for v in p])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    num_planes: int = 16,
    bands: int = 4,
    dim: int | None = None,
    max_bucket_size: int | None = 8192,
    stats_out: dict | None = None,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH bucketing.

    Signature = sign bits against `num_planes` fixed hyperplanes, split
    into `bands` blocks; items sharing ≥1 block with the query are
    candidates, re-ranked exactly. Recall < 1 by design (the scale path:
    each query touches only its buckets, not all N items).

    ``max_bucket_size`` (r11 verdict #1): an item bucket with more
    members pairs with EVERY query in that bucket — a degenerate
    signature region (near-constant embeddings, zero-ish vectors) makes
    the candidate join quadratic. Oversized item buckets are DROPPED
    (star-sampling makes no sense for top-k retrieval), eagerly
    counted, warned about, and reported via ``stats_out`` — affected
    queries lose recall only for that bucket's items and still re-rank
    their other buckets exactly. ``None`` restores the uncapped join.
    """
    if dim is None:
        sample = items.select(F.size(F.col(item_vec))).first()
        dim = int(sample[0])
    planes = _hyperplanes(num_planes, dim)
    if num_planes % bands:
        raise ValueError(
            f"bands={bands} must divide num_planes={num_planes} "
            "(trailing planes would be silently ignored)"
        )
    r = num_planes // bands

    def banded(df: DataFrame, idc: str, vecc: str, out_id: str) -> DataFrame:
        sig = lsh_signature_expr(F.col(vecc), planes)
        d = df.select(
            F.col(idc).alias(out_id), F.col(vecc).alias(f"_{out_id}_vec"),
            sig.alias("_sig"),
        )
        bandarr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.substring(F.col("_sig"), i * r + 1, r).alias("bh"),
                )
                for i in range(bands)
            ]
        )
        return d.select(
            out_id, f"_{out_id}_vec", F.explode(bandarr).alias("bd")
        ).select(
            out_id,
            f"_{out_id}_vec",
            F.col("bd.band").alias("band"),
            F.col("bd.bh").alias("bh"),
        )

    bi = banded(items, item_id, item_vec, "vec_id")
    if max_bucket_size is not None:
        from sparksearchengine_spark.operators.dedup import (
            _oversized_buckets,
        )

        # the size pass reads only (band, bh) — Catalyst prunes the
        # vector column, so this is a scan + partial agg, not a second
        # full-width pass; the tiny oversized-key frame is persisted by
        # the helper and anti-joined here
        over = _oversized_buckets(
            bi.select("vec_id", "band", "bh"),
            ["band", "bh"],
            max_bucket_size,
            stats_out,
            "lsh_cosine_topk",
            id_col="vec_id",
        )
        bi = bi.join(over.select("band", "bh"), ["band", "bh"], "left_anti")
    bq = banded(queries, query_id, query_vec, "query_id")
    cand = (
        bi.join(F.broadcast(bq), ["band", "bh"])
        .select("query_id", "vec_id", "_vec_id_vec", "_query_id_vec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("_vec_id_vec"), F.col("_query_id_vec")).alias("cos_sim"),
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("vec_id").asc()],
        k=k,
    ).select("query_id", "vec_id", "cos_sim", "rank")


def ivf_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) coarse quantization.

    Train a KMeans coarse quantizer (pyspark.ml, fixed seed), partition
    items by nearest centroid, probe only the ``nprobe`` closest cells per
    query, re-rank candidates exactly. The standard ANN scale path when
    buckets are persisted partitioned-by-cell: each query reads
    nprobe/n_clusters of the corpus instead of all of it.

    Recall < 1 by design (misses items whose cell isn't probed); nprobe =
    n_clusters degrades gracefully to exact brute force.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    items_f = items.withColumn(
        "_fvec", array_to_vector(F.col(item_vec).cast("array<double>"))
    )
    km = KMeans(
        k=n_clusters, seed=seed, featuresCol="_fvec", predictionCol="_cell"
    )
    model = km.fit(items_f)
    assigned = model.transform(items_f).select(
        F.col(item_id).alias("vec_id"),
        F.col(item_vec).alias("_ivec"),
        F.col("_cell"),
    )

    centers = [list(map(float, c)) for c in model.clusterCenters()]
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                F.array(*[F.lit(v) for v in c]).alias("cvec"),
            )
            for i, c in enumerate(centers)
        ]
    )
    # nprobe nearest cells per query (queries are the small side; the
    # query x centroid expansion is |queries| * n_clusters rows)
    qcells = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(query_vec).alias("_qvec"),
            F.explode(cent_arr).alias("c"),
        )
        .select(
            "query_id",
            "_qvec",
            F.col("c.cell").alias("_cell"),
            cosine_expr(F.col("_qvec"), F.col("c.cvec")).alias("_csim"),
        )
    )
    qprobe = topk_per_group(
        qcells, ["query_id"], [F.col("_csim").desc(), F.col("_cell").asc()],
        k=nprobe,
    ).select("query_id", "_qvec", "_cell")

    cand = assigned.join(F.broadcast(qprobe), "_cell")
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("_ivec"), F.col("_qvec")).alias("cos_sim"),
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("vec_id").asc()],
        k=k,
    ).select("query_id", "vec_id", "cos_sim", "rank")


def _write_meta(df_session_src: DataFrame, path: str, meta: dict) -> None:
    """Persist driver-small JSON metadata through the Spark filesystem
    (works on s3://, hdfs://, file:// alike — a local open() would not;
    r3 review). Shared by every durable layout in this module."""
    import json
    import os

    df_session_src.sparkSession.createDataFrame(
        [(json.dumps(meta),)], "value string"
    ).coalesce(1).write.mode("overwrite").text(os.path.join(path, "meta"))


def _read_meta(spark, path: str, legacy_file: str | None = None) -> dict:
    """Read `_write_meta` output; ``legacy_file`` names a pre-directory
    single-file layout to fall back to (ivf_build wrote meta.json before
    the Spark-FS meta/ directory existed)."""
    import json
    import os

    try:
        return json.loads(
            spark.read.text(os.path.join(path, "meta")).first()["value"]
        )
    except Exception:
        if legacy_file is None:
            raise
        return json.loads(
            spark.read.text(os.path.join(path, legacy_file)).first()["value"]
        )


def ivf_build(
    items: DataFrame,
    path: str,
    n_clusters: int = 16,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    seed: int = 42,
) -> None:
    """Train the IVF coarse quantizer and persist the items PARTITIONED BY
    CELL — the durable layout behind :func:`ivf_cosine_topk`'s scale
    claim: a later query session reads only its probed cells' directories
    (partition pruning), ~nprobe/n_clusters of the corpus, instead of
    re-clustering or scanning everything.

    Layout: ``path/items/_cell=K/*.parquet`` + ``path/meta.json`` holding
    the centroids (n_clusters × dim floats — driver-small by construction).
    """
    import json
    import os

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    items_f = items.withColumn(
        "_fvec", array_to_vector(F.col(item_vec).cast("array<double>"))
    )
    km = KMeans(
        k=n_clusters, seed=seed, featuresCol="_fvec", predictionCol="_cell"
    )
    model = km.fit(items_f)
    assigned = model.transform(items_f).select(
        F.col(item_id).alias("vec_id"),
        F.col(item_vec).alias("embedding"),
        F.col("_cell"),
    )
    assigned.repartition(n_clusters, "_cell").write.mode(
        "overwrite"
    ).partitionBy("_cell").parquet(os.path.join(path, "items"))
    meta = {
        "n_clusters": n_clusters,
        "centers": [list(map(float, c)) for c in model.clusterCenters()],
    }
    _write_meta(items, path, meta)


def ivf_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """ANN top-k against an :func:`ivf_build` layout. Probe-cell selection
    runs on the (small) query side; the item scan is restricted to the
    union of probed cells — a partition-column predicate, so unprobed cell
    directories are never read (visible as PartitionFilters in the plan)."""
    import json
    import os

    # meta.json fallback: layouts written before the Spark-FS meta/
    # directory stored a single file — keep them searchable (r3 review)
    meta = _read_meta(spark, path, legacy_file="meta.json")
    centers = meta["centers"]
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                F.array(*[F.lit(v) for v in c]).alias("cvec"),
            )
            for i, c in enumerate(centers)
        ]
    )
    qcells = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qvec"),
        F.explode(cent_arr).alias("c"),
    ).select(
        "query_id",
        "_qvec",
        F.col("c.cell").alias("_cell"),
        cosine_expr(F.col("_qvec"), F.col("c.cvec")).alias("_csim"),
    )
    qprobe = topk_per_group(
        qcells, ["query_id"], [F.col("_csim").desc(), F.col("_cell").asc()],
        k=nprobe,
    ).select("query_id", "_qvec", "_cell")
    # union of probed cells: ≤ n_clusters ints — a tiny driver action that
    # buys directory-level pruning on the big side
    cells = sorted(
        r["_cell"] for r in qprobe.select("_cell").distinct().collect()
    )
    items = spark.read.parquet(os.path.join(path, "items")).where(
        F.col("_cell").isin(cells)
    )
    cand = items.join(F.broadcast(qprobe), "_cell")
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("embedding"), F.col("_qvec")).alias("cos_sim"),
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("vec_id").asc()],
        k=k,
    ).select("query_id", "vec_id", "cos_sim", "rank")


def embedding_neardup_exact(
    items: DataFrame,
    threshold: float = 0.95,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
) -> DataFrame:
    """Exact embedding near-duplicate pairs (cosine >= threshold):
    (id_a < id_b, cos_sim).

    O(N^2) pairwise baseline — norms precomputed per side so each pair
    costs one fused dot product; the self-join is a single shuffle-free
    broadcast-nested-loop when one side fits in memory, else a cross
    partition sweep. At 100 TB use :func:`embedding_neardup` (LSH-blocked)
    instead; this is the recall-1 oracle the approximate path is judged
    against on samples.
    """
    d = items.select(
        F.col(item_id).cast("long").alias("id"),
        F.col(item_vec).alias("vec"),
        norm_expr(F.col(item_vec)).alias("nrm"),
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                dot_expr(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= float(threshold))
    )


def embedding_neardup(
    items: DataFrame,
    threshold: float = 0.95,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    num_planes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = 8192,
    oversize: str = "star",
    stats_out: dict | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ threshold) via LSH
    self-join + exact verification: (id_a < id_b, cos_sim).

    ``max_bucket_size`` (r11 verdict #1, same guard as the MinHash /
    SimHash paths): a (band, bh) bucket is all-pairs within itself —
    a cluster of m near-identical embeddings (a repeated stock image,
    a boilerplate page embedded millions of times) makes O(bands*m^2)
    candidates. Oversized buckets pair as a min-id star (``"star"`` —
    O(m) verified edges, connectivity preserved for dedup-clustering
    consumers) or are dropped (``"drop"``); counts are eager, warned,
    and written to ``stats_out``. ``None`` restores the uncapped join.
    """
    sample = items.select(F.size(F.col(item_vec))).first()
    planes = _hyperplanes(num_planes, int(sample[0]))
    if num_planes % bands:
        raise ValueError(
            f"bands={bands} must divide num_planes={num_planes} "
            "(trailing planes would be silently ignored)"
        )
    r = num_planes // bands
    sig = lsh_signature_expr(F.col(item_vec), planes)
    d = items.select(
        F.col(item_id).cast("long").alias("id"),
        F.col(item_vec).alias("vec"),
        sig.alias("_sig"),
    )
    bandarr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.substring(F.col("_sig"), i * r + 1, r).alias("bh"),
            )
            for i in range(bands)
        ]
    )
    if max_bucket_size is not None:
        from sparksearchengine_spark.operators.cache import materialize
        from sparksearchengine_spark.operators.dedup import (
            _capped_self_pairs,
        )

        # materialized: the bucket-size pass, both self-join arms, and
        # the two vector join-backs all read d in one job (stage-race
        # guard, r10) — and the uncapped plan recomputed the signature
        # projection per branch anyway
        d = materialize(d)
        banded = d.select("id", F.explode(bandarr).alias("bd")).select(
            "id",
            F.col("bd.band").alias("band"),
            F.col("bd.bh").alias("bh"),
        )
        pairs = _capped_self_pairs(
            banded, ["band", "bh"], max_bucket_size, oversize, stats_out,
            "embedding_neardup",
        )
        cand = pairs.join(
            d.select(F.col("id").alias("id_a"), F.col("vec").alias("va")),
            "id_a",
        ).join(
            d.select(F.col("id").alias("id_b"), F.col("vec").alias("vb")),
            "id_b",
        )
    else:
        banded = d.select("id", "vec", F.explode(bandarr).alias("bd")).select(
            "id", "vec",
            F.col("bd.band").alias("band"), F.col("bd.bh").alias("bh"),
        )
        a = banded.alias("a")
        b = banded.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.vec").alias("va"),
                F.col("b.vec").alias("vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        cand.withColumn("cos_sim", cosine_expr(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= float(threshold))
        .select("id_a", "id_b", "cos_sim")
    )


# --------------------------------------------------------------------------
# random projection (Johnson-Lindenstrauss dimensionality reduction)
# --------------------------------------------------------------------------


def _rp_sign(j: int, i: int) -> float:
    """±1 Rademacher weight for output dim j / input dim i, from the
    repo-wide md5 rule (parity of the first 8 hex chars of
    ``md5("rp:j:i")``) — any md5-capable engine rebuilds the same
    matrix, so projections are engine-portable without shipping one."""
    import hashlib

    h = int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[:8], 16)
    return 1.0 if h % 2 == 0 else -1.0


def random_projection(
    df: DataFrame,
    out_dim: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    in_dim: int | None = None,
    out_col: str = "rp",
    method: str = "expr",
) -> DataFrame:
    """Johnson-Lindenstrauss reduction of ``emb_col`` to ``out_dim``
    dims with a deterministic ±1/√out_dim Rademacher matrix (Achlioptas
    2003): ``(id, out_col array<double>)``. Cuts every downstream
    embedding operator's cost — ANN probes, SemDedup cells, k-means —
    by in_dim/out_dim while preserving pairwise distances within the JL
    bound.

    Scale shape: the sign matrix is (out_dim × in_dim) literals baked
    into the plan (no broadcast variable, no join); both methods are
    per-row map work with ZERO shuffle.

    * ``"expr"`` — one sequential ``aggregate`` fold per output dim:
      interpreted HOFs, the engine-portable oracle form.
    * ``"arrow"`` — numpy accumulation per Arrow batch, looped over
      input dims IN INDEX ORDER so the float sum order matches the
      expr fold exactly — the two methods are bit-identical, and the
      100 TB path is plan-checkable against the oracle form.

    ``in_dim``: width of the input vectors; probed from one row when
    omitted (a 1-row job — pass it explicitly in pipelines).
    """
    if method not in ("expr", "arrow"):
        raise ValueError(f"method must be expr|arrow, got {method!r}")
    if out_dim <= 0:
        raise ValueError("out_dim must be positive")
    if in_dim is None:
        probe = df.select(F.size(emb_col)).limit(1).collect()
        if not probe:
            in_dim = 0
        else:
            in_dim = probe[0][0]
    signs = [
        [_rp_sign(j, i) for i in range(in_dim)] for j in range(out_dim)
    ]
    inv_scale = 1.0 / math.sqrt(float(out_dim))

    if method == "expr":
        comps = []
        for j in range(out_dim):
            srow = F.array(*[F.lit(s) for s in signs[j]])
            comps.append(
                F.aggregate(
                    F.zip_with(
                        F.col(emb_col),
                        srow,
                        lambda x, s: x.cast("double") * s,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                * F.lit(inv_scale)
            )
        return df.select(
            F.col(id_col).alias("id"), F.array(*comps).alias(out_col)
        )

    import numpy as np
    import pandas as pd

    smat = np.array(signs, dtype=np.float64)  # (out_dim, in_dim)

    def project(batches):
        null_row = [None] * out_dim
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = [list(x) for x in pdf["_vec"]]
            # rows whose width differs from in_dim mirror the expr path
            # EXACTLY: zip_with pads the short side with NULL there, so
            # every component folds to NULL — emit all-NULL components
            # instead of silently truncating (r3 review: the two methods
            # are contract-bound bit-identical, and ragged batches must
            # not crash np.array)
            ok = np.array([len(v) == in_dim for v in vecs])
            out_rows = [null_row] * len(vecs)
            if ok.any():
                v = np.array(
                    [v for v, k in zip(vecs, ok) if k], dtype=np.float64
                )
                acc = np.zeros((v.shape[0], out_dim), dtype=np.float64)
                # accumulate input dims in index order: same left-to-
                # right float addition order as the expr fold
                for i in range(in_dim):
                    acc += v[:, i : i + 1] * smat[None, :, i]
                acc *= inv_scale
                it = iter(acc)
                out_rows = [
                    list(next(it)) if k else null_row for k in ok
                ]
            yield pd.DataFrame(
                {"id": pdf["_id"].to_numpy(), "rp_": out_rows}
            )

    out = df.select(
        F.col(id_col).alias("_id"), F.col(emb_col).alias("_vec")
    ).mapInPandas(project, schema="id long, rp_ array<double>")
    return out.select("id", F.col("rp_").alias(out_col))


# --------------------------------------------------------------------------
# MMR diversified re-ranking
# --------------------------------------------------------------------------


def mmr_rerank(
    pool: DataFrame,
    k: int,
    lam: float = 0.5,
    group_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "cos_sim",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    of a per-query candidate pool: greedily pick the candidate maximizing
    ``lam·rel − (1−lam)·max_cos_sim_to_already_picked`` (the first pick's
    diversity term is 0), k times. Returns
    ``(group_col, id_col, mmr_rank, mmr_score)``.

    Scale shape: MMR is inherently sequential *within* a query but the
    pool is the top-N of a prior retrieval (N ≈ 10²) — so the operator
    is ``applyInPandas`` over ``group_col``: one Arrow batch per query,
    O(k·N) numpy inside, thousands of queries re-ranked in parallel.
    Never collects; never materializes an N×N matrix bigger than the
    one pool.

    Determinism contract (what the DuckDB oracle unrolls): scores are
    rounded to 6dp BEFORE each argmax and ties break by ``id_col`` asc,
    so float-summation ulp noise cannot flip a pick across engines.
    Zero-norm vectors contribute similarity 0 (direction-less).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    import numpy as np
    import pandas as pd

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {group_col: [], id_col: [], "mmr_rank": [], "mmr_score": []}
            )
        ids = pdf[id_col].to_numpy()
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        v = np.array([list(x) for x in pdf[vec_col]], dtype=np.float64)
        norms = np.linalg.norm(v, axis=1)
        safe = np.where(norms > 0, norms, 1.0)
        vn = v / safe[:, None]
        vn[norms == 0] = 0.0  # zero-norm: sim 0 to everything
        max_sim = np.zeros(n, dtype=np.float64)
        picked = np.zeros(n, dtype=bool)
        out_ids, out_scores = [], []
        for _ in range(min(k, n)):
            score = np.round(lam * rel - (1.0 - lam) * max_sim, 6)
            score[picked] = -np.inf
            # argmax with id-asc tiebreak: order by (-score, id)
            order = np.lexsort((ids, -score))
            best = order[0]
            picked[best] = True
            out_ids.append(ids[best])
            # + 0.0 canonicalizes IEEE −0.0 to +0.0 (cross-engine parity)
            out_scores.append(float(score[best]) + 0.0)
            max_sim = np.maximum(max_sim, vn @ vn[best])
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[0],
                id_col: out_ids,
                "mmr_rank": np.arange(1, len(out_ids) + 1),
                "mmr_score": out_scores,
            }
        )

    gtype = dict(pool.dtypes)[group_col]
    itype = dict(pool.dtypes)[id_col]
    return pool.groupBy(group_col).applyInPandas(
        rerank,
        schema=(
            f"{group_col} {gtype}, {id_col} {itype}, "
            "mmr_rank int, mmr_score double"
        ),
    )


# -- product quantization (PQ / ADC) ---------------------------------------
#
# The 100 TB ANN memory story beyond int8: split the d-dim embedding into
# m subspaces, vector-quantize each against its own ksub-entry codebook,
# and store only the m code ids (m bytes at ksub<=256) — a d*4/m-fold
# compression of the candidate set. Query scoring is ADC (asymmetric
# distance computation): ONE m*ksub lookup table of exact sub-inner-
# products per query, then every candidate costs m array lookups — no
# float vector is ever read for non-finalists; an exact re-rank touches
# raw vectors only for the rerank*k survivors. The reference has no
# vector surface at all; design follows Jegou et al., "Product
# Quantization for Nearest Neighbor Search" (TPAMI 2011).


def _pq_check(codebooks: list[list[list[float]]]) -> tuple[int, int, int]:
    """(m, ksub, dsub) with shape validation."""
    m = len(codebooks)
    if m == 0:
        raise ValueError("codebooks must have >= 1 subspace")
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    for j, cb in enumerate(codebooks):
        if len(cb) != ksub or any(len(c) != dsub for c in cb):
            raise ValueError(
                f"codebook {j} is ragged: expected {ksub}x{dsub}"
            )
    return m, ksub, dsub


def pq_train(
    items: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iters: int = 5,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    method: str = "expr",
) -> list[list[list[float]]]:
    """Train PQ codebooks: one k-means (``ksub`` centroids) per
    subspace over the vector slices. Returns ``m x ksub x dsub`` floats
    — driver-small by construction (the whole model is m*ksub*dsub
    numbers).

    Deterministic (no RNG): each subspace k-means seeds from the
    lowest-id slice vectors (`clustering.default_centroids`). Training
    cost is m sequential `kmeans_fit` runs — standard practice is to
    train on a bounded SAMPLE (``items.limit(100_000)`` or
    ``.where(id % s == 0)``); encode/search below are the full-corpus
    scale paths, training never needs to be.
    """
    from sparksearchengine_spark.operators.clustering import kmeans_fit

    dim_row = items.select(
        F.size(F.col(item_vec)).alias("d")
    ).where(F.col("d").isNotNull()).first()
    if dim_row is None:
        raise ValueError("no non-NULL vectors to train on")
    dim = int(dim_row["d"])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # NULL vectors carry no training signal and would crash centroid
    # seeding if one held a lowest id (default_centroids collects the
    # k lowest-id rows verbatim)
    nn = items.where(F.col(item_vec).isNotNull())
    codebooks = []
    for j in range(m):
        sliced = nn.select(
            F.col(item_id).alias("vec_id"),
            F.slice(
                F.col(item_vec).cast("array<double>"), j * dsub + 1, dsub
            ).alias("embedding"),
        )
        cents, _ = kmeans_fit(sliced, ksub, iters=iters, method=method)
        codebooks.append([[float(x) for x in c] for c in cents])
    return codebooks


def pq_encode_expr(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """``array<int>`` of m nearest-centroid code ids for one vector —
    a bare Column (scan-stage, zero shuffle), composable like
    `clustering.assign_cell_expr` (same argmin, same first-min
    tie-break, so the DuckDB oracle mirrors it with
    ``list_indexof(d, list_min(d))``). NULL vector -> NULL codes."""
    from sparksearchengine_spark.operators.clustering import assign_cell_expr

    m, _, dsub = _pq_check(codebooks)
    v = vec.cast("array<double>")
    return F.when(
        vec.isNotNull(),
        F.array(
            *[
                assign_cell_expr(F.slice(v, j * dsub + 1, dsub), codebooks[j])
                for j in range(m)
            ]
        ),
    )


def pq_encode(
    items: DataFrame,
    codebooks: list[list[list[float]]],
    item_id: str = "vec_id",
    item_vec: str = "embedding",
) -> DataFrame:
    """``(vec_id, codes)`` for the whole corpus — the at-rest ANN format
    (persist THIS, m small ints per row, instead of the float vectors;
    keep the raw vectors only where the exact re-rank reads them)."""
    return items.select(
        F.col(item_id).alias("vec_id"),
        pq_encode_expr(F.col(item_vec), codebooks).alias("codes"),
    )


def pq_lut_expr(
    qvec: Column,
    codebooks: list[list[list[float]]],
    metric: str = "ip",
) -> Column:
    """Flat ``array<double>`` of m*ksub per-query ADC lookup entries,
    laid out ``j*ksub + c`` so the pair score is m element_at lookups.

    ``metric="ip"``: sub-inner-products ``<q_slice_j, codebook[j][c]>``
    (maximize). ``metric="l2"``: sub squared distances
    ``||q_slice_j - codebook[j][c]||²`` (minimize) — the residual
    IVF-PQ form."""
    if metric not in ("ip", "l2"):
        raise ValueError(f"metric must be ip|l2, got {metric!r}")
    m, ksub, dsub = _pq_check(codebooks)
    v = qvec.cast("array<double>")
    entries = []
    for j in range(m):
        sl = F.slice(v, j * dsub + 1, dsub)
        for c in codebooks[j]:
            lit = F.array(*[F.lit(float(x)) for x in c])
            if metric == "ip":
                zipped = F.zip_with(sl, lit, lambda x, w: x * w)
            else:
                zipped = F.zip_with(sl, lit, lambda x, w: (x - w) * (x - w))
            entries.append(
                F.aggregate(zipped, F.lit(0.0), lambda acc, x: acc + x)
            )
    return F.array(*entries)


def pq_topk(
    items: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
    codes_col: str | None = None,
    rerank: int = 0,
    rerank_items: DataFrame | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """ADC top-k: ``(query_id, vec_id, score, rank)``.

    ``score`` approximates the inner product (pre-normalize vectors for
    cosine semantics). With ``codes_col`` the items side is a precoded
    ``(id, codes)`` frame (the scale path — per pair the score is m
    array lookups fused into the scan; no HOF, no float vectors in
    flight). Without it, codes are computed inline from ``item_vec``
    (convenient, but pays the encode per call — persist `pq_encode`
    output instead for repeated querying).

    ``rerank=R`` keeps R*k ADC candidates per query, joins back to the
    raw vectors, and exact-cosine re-scores ONLY those — `score` is then
    the exact cosine. The vectors come from ``rerank_items`` (an
    ``(item_id, item_vec)`` frame) when given, else from ``items`` —
    required with a precoded ``codes_col`` frame, which carries no
    vectors. Queries are broadcast (ADC is a scan over items); the
    same small-query contract as :func:`cosine_topk`.
    """
    m, ksub, _ = _pq_check(codebooks)
    if rerank < 0:
        raise ValueError(f"rerank must be >= 0, got {rerank}")
    vec_src = rerank_items if rerank_items is not None else items
    if rerank > 0 and item_vec not in vec_src.columns:
        raise ValueError(
            f"rerank={rerank} needs raw vectors, but {item_vec!r} is not "
            f"in {'rerank_items' if rerank_items is not None else 'items'} "
            f"({vec_src.columns}); pass rerank_items=<(id, vec) frame> "
            f"when scoring a precoded codes_col frame"
        )
    # pure-ADC (rerank=0) only ever reads the LUT — keep the raw float
    # query vectors out of the broadcast frame entirely in that path
    # (ADVICE r5); the rerank path needs them for exact re-scoring.
    q_cols = [
        F.col(query_id).alias("query_id"),
        pq_lut_expr(F.col(query_vec), codebooks).alias("_lut"),
    ]
    if rerank > 0:
        q_cols.insert(1, F.col(query_vec).alias("_qvec"))
    q = queries.select(*q_cols)
    if codes_col is not None:
        it = items.select(
            F.col(item_id).alias("vec_id"), F.col(codes_col).alias("_codes")
        )
    else:
        it = items.select(
            F.col(item_id).alias("vec_id"),
            pq_encode_expr(F.col(item_vec), codebooks).alias("_codes"),
        )
    score = None
    for j in range(m):
        term = F.element_at(
            F.col("_lut"),
            (F.lit(j * ksub) + F.element_at(F.col("_codes"), j + 1) + 1).cast(
                "int"
            ),
        )
        score = term if score is None else score + term
    scored = it.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.when(F.col("_codes").isNotNull(), score).alias("score"),
    )
    if rerank == 0:
        return topk_per_group(
            scored,
            ["query_id"],
            [F.col("score").desc(), F.col("vec_id").asc()],
            k=k,
            salt_buckets=salt_buckets,
            salt_col="vec_id",
        ).select("query_id", "vec_id", "score", "rank")
    cand = topk_per_group(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("vec_id").asc()],
        k=rerank * k,
        salt_buckets=salt_buckets,
        salt_col="vec_id",
    ).select("query_id", "vec_id")
    raw = vec_src.select(
        F.col(item_id).alias("vec_id"), F.col(item_vec).alias("_ivec")
    )
    qv = q.select("query_id", "_qvec")
    exact = (
        cand.join(raw, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_expr(F.col("_ivec"), F.col("_qvec")).alias("score"),
        )
    )
    return topk_per_group(
        exact,
        ["query_id"],
        [F.col("score").desc(), F.col("vec_id").asc()],
        k=k,
    ).select("query_id", "vec_id", "score", "rank")


def _centers_lit(centers: list[list[float]]) -> Column:
    return F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centers]
    )


def ivfpq_build(
    items: DataFrame,
    path: str,
    n_clusters: int = 8,
    m: int = 4,
    ksub: int = 16,
    iters: int = 5,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    train: DataFrame | None = None,
) -> None:
    """Train and persist a residual IVF-PQ layout — the full FAISS
    ``IndexIVFPQ`` design (Jegou et al. 2011) in DataFrame ops:

    1. coarse quantizer: RNG-free `clustering.kmeans_fit` over the
       vectors (deterministic — same data, same layout, every run);
    2. residuals ``r = x − center[cell]`` computed inline (zip_with
       against the cell's centroid, picked by ``element_at`` on the
       literal center matrix — scan-stage, no join);
    3. PQ codebooks trained ON THE RESIDUALS (``train`` bounds the
       training frame — pass a sample at scale; encode always runs on
       everything);
    4. items written ``path/items/_cell=K/`` partitioned by coarse cell
       carrying ``(vec_id, embedding, codes)`` — a search probes
       nprobe/n_clusters of the directories (PartitionFilters) and
       scores CODES; the raw vector column is read only by the exact
       re-rank projection (Parquet column pruning does the rest).

    ``path/meta/`` holds centers + codebooks (driver-small), written
    through the Spark filesystem like `ivf_build` (works on s3/hdfs).
    """
    import json
    import os

    from sparksearchengine_spark.operators.clustering import (
        assign_cell_expr,
        kmeans_fit,
    )

    centers, _ = kmeans_fit(
        items, n_clusters, iters=iters, item_id=item_id, item_vec=item_vec
    )
    vec_d = F.col(item_vec).cast("array<double>")
    staged = items.select(
        F.col(item_id).alias("vec_id"),
        F.col(item_vec).alias("embedding"),
        assign_cell_expr(F.col(item_vec), centers).alias("_cell"),
    ).withColumn(
        "_rvec",
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.element_at(_centers_lit(centers), F.col("_cell") + 1),
            lambda x, c: x - c,
        ),
    )
    if train is not None:
        tr = train.select(
            F.col(item_id).alias("vec_id"),
            F.col(item_vec).alias("embedding"),
            assign_cell_expr(F.col(item_vec), centers).alias("_cell"),
        ).withColumn(
            "_rvec",
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.element_at(_centers_lit(centers), F.col("_cell") + 1),
                lambda x, c: x - c,
            ),
        )
    else:
        tr = staged
    # persist: without it every k-means pass of every subspace (m*iters
    # of them) plus the final write would re-evaluate the coarse argmin
    # (n_clusters interpreted HOF distances per row) and the residual
    # zip_with over the full corpus (r5 review finding)
    staged = staged.persist()
    if train is None:
        tr = staged
    codebooks = pq_train(
        tr.where(F.col("_rvec").isNotNull()),
        m=m,
        ksub=ksub,
        iters=iters,
        item_id="vec_id",
        item_vec="_rvec",
    )
    out = staged.select(
        "vec_id",
        "embedding",
        pq_encode_expr(F.col("_rvec"), codebooks).alias("codes"),
        "_cell",
    )
    out.repartition(n_clusters, "_cell").write.mode("overwrite").partitionBy(
        "_cell"
    ).parquet(os.path.join(path, "items"))
    staged.unpersist()
    meta = {
        "n_clusters": n_clusters,
        "m": m,
        "ksub": ksub,
        "centers": [[float(v) for v in c] for c in centers],
        "codebooks": codebooks,
    }
    _write_meta(items, path, meta)


def ivfpq_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 4,
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """ANN top-k against an :func:`ivfpq_build` layout:
    ``(query_id, vec_id, cos_sim, rank)`` (or ``approx_dist`` ranked
    ascending when ``rerank=0``).

    Probe-cell selection and the per-(query, cell) RESIDUAL lookup
    table both live on the tiny query side (nprobe rows per query, each
    carrying its m*ksub L2 table for ``q − center[cell]``); the item
    side reads ONLY the probed cell directories (PartitionFilters) and
    ONLY the code column (column pruning) — every candidate costs m
    array lookups. ``rerank=R`` exact-cosine re-scores the R·k ADC
    survivors from the stored vectors; at 100 TB that is the only point
    where float vectors leave disk.
    """
    import json
    import os

    if rerank < 0:
        raise ValueError(f"rerank must be >= 0, got {rerank}")
    meta = _read_meta(spark, path)
    centers, codebooks = meta["centers"], meta["codebooks"]
    m, ksub = meta["m"], meta["ksub"]
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("cell"),
                F.array(*[F.lit(v) for v in c]).alias("cvec"),
            )
            for i, c in enumerate(centers)
        ]
    )
    qcells = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_qvec"),
        F.explode(cent_arr).alias("c"),
    ).select(
        "query_id",
        "_qvec",
        F.col("c.cell").alias("_cell"),
        cosine_expr(F.col("_qvec"), F.col("c.cvec")).alias("_csim"),
    )
    qprobe = (
        topk_per_group(
            qcells,
            ["query_id"],
            [F.col("_csim").desc(), F.col("_cell").asc()],
            k=nprobe,
        )
        .select("query_id", "_qvec", "_cell")
        .withColumn(
            "_rq",
            F.zip_with(
                F.col("_qvec").cast("array<double>"),
                F.element_at(_centers_lit(centers), F.col("_cell") + 1),
                lambda x, c: x - c,
            ),
        )
        .withColumn("_lut", pq_lut_expr(F.col("_rq"), codebooks, metric="l2"))
    )
    cells = sorted(
        r["_cell"] for r in qprobe.select("_cell").distinct().collect()
    )
    items = spark.read.parquet(os.path.join(path, "items")).where(
        F.col("_cell").isin(cells)
    )
    dist = None
    for j in range(m):
        term = F.element_at(
            F.col("_lut"),
            (
                F.lit(j * ksub) + F.element_at(F.col("codes"), j + 1) + 1
            ).cast("int"),
        )
        dist = term if dist is None else dist + term
    scored = (
        items.select("vec_id", "codes", "_cell")
        .join(F.broadcast(qprobe.select("query_id", "_cell", "_lut")), "_cell")
        .select(
            "query_id",
            "vec_id",
            F.when(F.col("codes").isNotNull(), dist).alias("approx_dist"),
        )
    )
    if rerank == 0:
        return topk_per_group(
            scored,
            ["query_id"],
            [F.col("approx_dist").asc_nulls_last(), F.col("vec_id").asc()],
            k=k,
        ).select("query_id", "vec_id", "approx_dist", "rank")
    cand = topk_per_group(
        scored,
        ["query_id"],
        [F.col("approx_dist").asc_nulls_last(), F.col("vec_id").asc()],
        k=rerank * k,
    ).select("query_id", "vec_id")
    raw = spark.read.parquet(os.path.join(path, "items")).where(
        F.col("_cell").isin(cells)
    ).select("vec_id", "embedding")
    qv = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("_qvec")
    )
    exact = (
        cand.join(raw, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            cosine_expr(F.col("embedding"), F.col("_qvec")).alias("cos_sim"),
        )
    )
    return topk_per_group(
        exact,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("vec_id").asc()],
        k=k,
    ).select("query_id", "vec_id", "cos_sim", "rank")


def hard_negatives(
    items: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    lo: float = 0.5,
    hi: float = 0.95,
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    anchor_id: str = "anchor_id",
    anchor_vec: str = "embedding",
    candidates: DataFrame | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive embedding training:
    per anchor, the top-k items whose cosine lands in ``[lo, hi)`` —
    similar enough to be informative negatives, below the near-duplicate
    band (``hi`` also drops the anchor itself at cos 1). Returns
    ``(anchor_id, vec_id, cos_sim, rank)``.

    The band filter runs BEFORE the top-k reduction, so the window only
    ranks in-band rows. Default scoring is the brute-force broadcast
    scan (exact, one pass over items — `cosine_topk`'s plan), so the
    anchors frame is hard-capped at ``COLLECT_MAX_QUERY_ROWS`` rows —
    a corpus-scale anchors frame raises loudly instead of OOM-ing the
    broadcast (the ``limit(cap+1)`` probe bounds the check itself). At
    corpus scale pass ``candidates`` = a pre-scored ``(anchor_id,
    vec_id, cos_sim)`` frame from any ANN path (`lsh_cosine_topk` /
    `ivf_search` / `ivfpq_search` with a large k) and only the band +
    top-k logic runs here, fully distributed.
    """
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if candidates is not None:
        scored = candidates.select(
            F.col(anchor_id).alias("anchor_id"), "vec_id", "cos_sim"
        )
    else:
        n_probe = (
            anchors.select(anchor_id)
            .limit(COLLECT_MAX_QUERY_ROWS + 1)
            .count()
        )
        if n_probe > COLLECT_MAX_QUERY_ROWS:
            raise ValueError(
                "hard_negatives' default path broadcasts the anchors "
                "frame and got more than "
                f"COLLECT_MAX_QUERY_ROWS={COLLECT_MAX_QUERY_ROWS} anchor "
                "rows. For corpus-scale anchors pre-score with an ANN "
                "path (lsh_cosine_topk / ivf_search / ivfpq_search with "
                "a large k) and pass it as candidates=."
            )
        a = anchors.select(
            F.col(anchor_id).alias("anchor_id"),
            F.col(anchor_vec).alias("_qvec"),
            norm_expr(F.col(anchor_vec)).alias("_qnorm"),
        )
        it = items.select(
            F.col(item_id).alias("vec_id"),
            F.col(item_vec).alias("_ivec"),
            norm_expr(F.col(item_vec)).alias("_inorm"),
        )
        scored = it.crossJoin(F.broadcast(a)).select(
            "anchor_id",
            "vec_id",
            F.when(
                (F.col("_inorm") > 0) & (F.col("_qnorm") > 0),
                dot_expr(F.col("_ivec"), F.col("_qvec"))
                / (F.col("_inorm") * F.col("_qnorm")),
            ).alias("cos_sim"),
        )
    banded = scored.where(
        (F.col("cos_sim") >= F.lit(float(lo)))
        & (F.col("cos_sim") < F.lit(float(hi)))
    )
    return topk_per_group(
        banded,
        ["anchor_id"],
        [F.col("cos_sim").desc(), F.col("vec_id").asc()],
        k=k,
        salt_buckets=salt_buckets,
        salt_col="vec_id",
    ).select("anchor_id", "vec_id", "cos_sim", "rank")


def pq_save(
    items: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    item_id: str = "vec_id",
    item_vec: str = "embedding",
    store_vectors: bool = False,
) -> None:
    """Persist the PQ at-rest layout: ``path/codes/`` (the m-small-int
    codes parquet — 29× smaller than the float vectors, measured) +
    ``path/meta/`` (the codebooks, driver-small, written through the
    Spark filesystem like `ivf_build` so s3/hdfs paths work).
    ``store_vectors=True`` co-writes ``path/vectors/`` for the exact
    re-rank path; leave it off when the raw vectors already live
    elsewhere (pass that table as ``rerank_items``)."""
    import json
    import os

    _pq_check(codebooks)
    pq_encode(items, codebooks, item_id, item_vec).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "codes"))
    if store_vectors:
        items.select(
            F.col(item_id).alias("vec_id"), F.col(item_vec).alias("embedding")
        ).write.mode("overwrite").parquet(os.path.join(path, "vectors"))
    meta = {"codebooks": codebooks, "has_vectors": bool(store_vectors)}
    _write_meta(items, path, meta)


def pq_load(
    spark, path: str
) -> tuple[DataFrame, list[list[list[float]]], DataFrame | None]:
    """``(codes_df, codebooks, vectors_df_or_None)`` from a `pq_save`
    layout — feed straight into ``pq_topk(codes_df, queries, codebooks,
    codes_col="codes", rerank_items=vectors_df)``."""
    import json
    import os

    meta = _read_meta(spark, path)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    vectors = (
        spark.read.parquet(os.path.join(path, "vectors"))
        if meta.get("has_vectors")
        else None
    )
    return codes, meta["codebooks"], vectors
