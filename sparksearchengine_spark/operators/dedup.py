"""Deduplication operators for large-scale corpus curation.

Beyond the reference's surface (per BASELINE.json's north star): exact
dedup, exact n-gram-Jaccard similarity join (prefix filtering), MinHash+LSH
near-dup, and SimHash near-dup. All operate on the same Corpus abstraction
(a DataFrame + id + text column) and are designed shuffle-minimal:

* exact dedup           — one groupBy on a 128-bit content hash
* ngram_jaccard_join    — EXACT similarity self-join via prefix filtering
                          (sort n-grams by global rarity; two docs with
                          Jaccard ≥ t must share one of the first
                          |set| - ceil(t*|set|) + 1 rarest n-grams), so the
                          candidate join touches a tiny fraction of the
                          cross product; candidates then verified with the
                          true Jaccard. Standard AllPairs/PPJoin shape.
* minhash_lsh_dedup     — approximate scale path: k min-hashes over n-gram
                          hashes, banded; candidate pairs verified exactly.
* simhash_dedup         — 64-bit SimHash + block-partitioned Hamming join.

Hash family: h_i(x) = (a_i * x + b_i) mod p over base = xxhash64(ngram)
mod p, p = 2^31 - 1 (Mersenne prime). Operands stay < 2^62, so the
arithmetic is exact under Spark ANSI mode (no silent overflow).
"""

from __future__ import annotations

import math
import warnings
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparksearchengine_spark.functions.analyzers import analyzer_expr
from sparksearchengine_spark.operators.cache import materialize

_P = 2_147_483_647  # 2^31 - 1


def _hash_family(num_hashes: int, seed: int = 421) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs from a fixed LCG (no runtime RNG)."""
    coeffs = []
    state = seed
    for _ in range(num_hashes):
        state = (1103515245 * state + 12345) % (1 << 31)
        a = state % (_P - 1) + 1
        state = (1103515245 * state + 12345) % (1 << 31)
        b = state % _P
        coeffs.append((a, b))
    return coeffs


def _widen(df: DataFrame) -> DataFrame:
    """Repartition narrow inputs up to defaultParallelism before per-row
    heavy compute (tokenize / gram / hash expressions).

    A small local file reads as ONE split, which would serialize the whole
    map stage on a single core; at cluster scale the input already has
    more splits than cores and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def token_ngrams(tokens: Column, n: int) -> Column:
    """Distinct space-joined token n-grams of an array<string> column.

    For size < n docs the result is the whole-doc gram (so short docs still
    compare). Pure SQL (transform + slice), ANSI-safe.
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return F.array_distinct(grams)


def _self_delimited(cols: list[str]):  # type: ignore[no-untyped-def]
    """Injection-proof multi-column content encoding: each value is
    netstring-style length-prefixed, so a separator byte INSIDE a value
    cannot shift column boundaries (('x\\x1fy','z') vs ('x','y\\x1fz')
    collided under a bare concat_ws — r3 review finding). NULL encodes as
    length -1, distinct from the empty string."""
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.concat(
                F.coalesce(F.length(s), F.lit(-1)).cast("string"),
                F.lit(":"),
                F.coalesce(s, F.lit("")),
            )
        )
    return F.concat_ws("|", *parts)


def exact_dedup(
    df: DataFrame,
    cols: list[str],
    id_col: str = "doc_id",
    prefer: list | None = None,
) -> DataFrame:
    """Exact duplicate grouping: (id, canon_id, is_duplicate).

    Default canon_id = min id among rows with identical content hash.
    ``prefer=[ordering Columns]`` picks the canonical row by quality
    instead — best first, id ascending as the final tie-break (e.g.
    ``prefer=[F.col("n_chars").desc()]`` keeps the longest capture, the
    RefinedWeb convention; ``[F.col("quality").desc()]`` keeps the
    best-scored). Referenced columns must exist in ``df``.

    One shuffle either way (window over the hash); at 100 TB hash
    first, never shuffle raw text — with ``prefer`` the ordering
    columns ride along (scalars, not text).
    """
    h = F.md5(_self_delimited(cols))
    staged = df.withColumn("_h", h)
    if prefer:
        w = Window.partitionBy("_h").orderBy(
            *prefer, F.col(id_col).asc()
        )
        canon = F.first(id_col).over(w)
    else:
        staged = staged.select(F.col(id_col), "_h")
        canon = F.min(id_col).over(Window.partitionBy("_h"))
    return (
        staged.withColumn("canon_id", canon)
        .withColumn("is_duplicate", F.col(id_col) != F.col("canon_id"))
        .select(id_col, "canon_id", "is_duplicate")
    )


def ngram_jaccard_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    analyzer: str = "simple",
) -> DataFrame:
    """EXACT n-gram-Jaccard similarity self-join: pairs (id_a < id_b,
    jaccard) with jaccard ≥ threshold.

    Prefix filtering: sort each doc's grams by global rarity; a pair with
    J ≥ t must share a gram within each side's first
    |set| - ceil(t*|set|) + 1 grams. Candidates come from joining only
    those prefixes; each candidate is then verified with the true Jaccard,
    so the result is exact (no LSH false negatives).
    """
    # materialized, not just persisted: grams/sizes/verify read this
    # from independent stages of one job (stage-race guard, r10)
    ga = materialize(_gram_arrays(
        _widen(df), id_col, text_col, n, analyzer
    ))
    grams = ga.select("id", F.explode("gs").alias("gram"))
    sizes = ga.select("id", F.size("gs").alias("sz"))

    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("freq"))
    ranked = (
        grams.join(freq, "gram")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("id").orderBy("freq", "gram")
            ),
        )
        .join(sizes, "id")
        .withColumn(
            "prefix_len",
            F.col("sz")
            - F.ceil(F.lit(float(threshold)) * F.col("sz")).cast("int")
            + F.lit(1),
        )
        .where(F.col("r") <= F.col("prefix_len"))
        .select("id", "gram")
    )

    a = ranked.alias("a")
    b = ranked.alias("b")
    cand = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(cand, ga, threshold)


def _gram_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int, analyzer: str
) -> DataFrame:
    """(id, gs array<string>) — each doc's distinct n-gram set as ONE row,
    computed per-row from the token array (no explode, no shuffle)."""
    toks = analyzer_expr(F.col(text_col), analyzer)
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        token_ngrams(toks, n).alias("gs"),
    ).where(F.col("gs").isNotNull())


def _verify_jaccard(
    cand: DataFrame, gram_arrays: DataFrame, threshold: float,
    gram_arrays_b: DataFrame | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs.

    Each doc's grams are ONE array row, so intersections are per-row
    ``array_intersect`` after two keyed joins — candidates never explode
    back to per-gram rows (the naive verify joins |cand| x |grams/doc|
    rows; this joins |cand| rows, ~grams/doc cheaper at any scale).

    ``gram_arrays_b``: for cross-corpus joins, the id_b side's gram table
    (defaults to the self-join case where both sides share one table).
    """
    a = gram_arrays.select(
        F.col("id").alias("id_a"), F.col("gs").alias("gs_a")
    )
    b = (gram_arrays_b if gram_arrays_b is not None else gram_arrays).select(
        F.col("id").alias("id_b"), F.col("gs").alias("gs_b")
    )
    inter = F.size(F.array_intersect("gs_a", "gs_b"))
    union = F.size("gs_a") + F.size("gs_b") - inter
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard", inter.cast("double") / union.cast("double")
        )
        .where(F.col("jaccard") >= float(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_join_cross(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    analyzer: str = "simple",
) -> DataFrame:
    """EXACT cross-corpus n-gram-Jaccard join: pairs (id_l, id_r, jaccard
    ≥ threshold), one row per (left doc, right doc) match — the
    incremental-ingestion dedup: is anything in the new crawl (``left``)
    a near-copy of the existing corpus (``right``)?

    Same prefix-filter shape as the self-join, with one extra care: the
    rarity order the prefixes are cut from must be ONE total order both
    sides agree on, so gram frequencies are counted over the UNION of the
    two corpora (a gram rare on one side but common on the other is
    common, full stop). Ids live in separate namespaces — no ``id_a <
    id_b`` constraint, and a doc appearing in both corpora matches
    itself, which is exactly the answer the ingestion question wants.
    """
    # materialized: freq/prefixes/verify fan out over both gram
    # tables in one job (stage-race guard, r10)
    gl = materialize(_gram_arrays(_widen(left), id_col, text_col, n, analyzer))
    gr = materialize(_gram_arrays(_widen(right), id_col, text_col, n, analyzer))
    grams_l = gl.select("id", F.explode("gs").alias("gram"))
    grams_r = gr.select("id", F.explode("gs").alias("gram"))

    freq = (
        grams_l.union(grams_r)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )

    def _prefixes(grams: DataFrame, ga: DataFrame) -> DataFrame:
        sizes = ga.select("id", F.size("gs").alias("sz"))
        return (
            grams.join(freq, "gram")
            .withColumn(
                "r",
                F.row_number().over(
                    Window.partitionBy("id").orderBy("freq", "gram")
                ),
            )
            .join(sizes, "id")
            .withColumn(
                "prefix_len",
                F.col("sz")
                - F.ceil(F.lit(float(threshold)) * F.col("sz")).cast("int")
                + F.lit(1),
            )
            .where(F.col("r") <= F.col("prefix_len"))
            .select("id", "gram")
        )

    a = _prefixes(grams_l, gl).alias("a")
    b = _prefixes(grams_r, gr).alias("b")
    cand = (
        a.join(b, F.col("a.gram") == F.col("b.gram"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    out = _verify_jaccard(cand, gl, threshold, gram_arrays_b=gr)
    return out.select(
        F.col("id_a").alias("id_l"), F.col("id_b").alias("id_r"), "jaccard"
    )


def minhash_lsh_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    analyzer: str = "simple",
    max_bucket_size: int | None = 8192,
    oversize: str = "star",
    stats_out: dict | None = None,
) -> DataFrame:
    """Approximate cross-corpus near-dup join — the 100 TB scale path for
    ``ngram_jaccard_join_cross``: MinHash signatures on both sides (SAME
    deterministic hash family, so signatures are comparable), banded LSH
    across corpora, candidates verified with the true Jaccard. Output
    (id_l, id_r, jaccard), exact above threshold among LSH candidates
    (false negatives only from banding recall, measured by the recall
    harness). Oversized right-corpus buckets are capped at prepare time
    (``max_bucket_size``/``oversize``/``stats_out`` — see
    :func:`prepare_lsh_corpus`)."""
    # validate BEFORE the persists: raising after them would leak two
    # cached frames for the session (r3 review)
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(trailing hashes would be silently ignored)"
        )
    if max_bucket_size is not None:
        _check_oversize_mode(oversize)
    # materialized: band table + Jaccard verify read gl from two
    # branches of one job (stage-race guard, r10)
    gl = materialize(_gram_arrays(_widen(left), id_col, text_col, n, analyzer))
    corp = prepare_lsh_corpus(
        right, id_col=id_col, text_col=text_col, n=n,
        num_hashes=num_hashes, bands=bands, analyzer=analyzer,
        max_bucket_size=max_bucket_size, oversize=oversize,
        stats_out=stats_out,
    )
    return lsh_join_prepared(gl, corp, threshold)


def _band_table_from_sigs(
    sigs: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, bh) banded LSH keys from an (id, sig) signature table."""
    r = num_hashes // bands
    band_cols = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.concat_ws(
                        ",",
                        *[
                            F.col("sig")[i * r + j].cast("string")
                            for j in range(r)
                        ],
                    ).alias("bh"),
                )
                for i in range(bands)
            ]
        )
    ).alias("bd")
    return sigs.select("id", band_cols).select(
        "id", F.col("bd.band").alias("band"), F.col("bd.bh").alias("bh")
    )


def _band_table(ga: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bh) banded LSH keys from an (id, gs) gram table."""
    return _band_table_from_sigs(
        _signatures_from_grams(ga, num_hashes), num_hashes, bands
    )


def _check_oversize_mode(oversize: str) -> None:
    if oversize not in ("star", "drop"):
        raise ValueError(
            f"oversize={oversize!r} must be 'star' (emit min-id star "
            "edges for oversized buckets) or 'drop' (skip them)"
        )


def _oversized_buckets(
    banded: DataFrame,
    keys: list[str],
    max_bucket_size: int,
    stats_out: dict | None,
    label: str,
    id_col: str = "id",
) -> DataFrame:
    """Materialized ``(keys..., _bsz, _mid)`` table of LSH buckets with
    more than ``max_bucket_size`` members — the giant-bucket guard's
    shared core (r11 verdict #1).

    Why this must exist: a banded-LSH candidate join is all-pairs
    WITHIN a bucket, so a near-duplicate mega-cluster of m docs (SEO
    boilerplate, templated pages — ubiquitous at crawl scale, and NOT
    removed by exact-dedup-first since the members differ by a few
    tokens) yields O(bands*m^2) candidate pairs; at m=10^6 that is
    ~10^13 rows before verification. AQE skew splitting redistributes
    the shuffle but cannot reduce the pair count — only a bucket-size
    cap can. The cap is a CODE guard precisely because no fixed-SF
    bench can see it: the blowup is data-dependent.

    Never silent (the no-silent-caps rule): the oversized-bucket count
    is computed EAGERLY here; when non-zero a ``RuntimeWarning`` names
    the operator, the counts, and the largest bucket, and the numbers
    are written into the caller-supplied ``stats_out`` dict
    (``oversized_buckets`` / ``oversized_rows`` / ``largest_bucket`` /
    ``max_bucket_size``). The frame is tiny (one row per oversized
    bucket — at most |banded|/max_bucket_size rows) and stays persisted
    for the candidate joins that consume it.
    """
    over = (
        banded.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_bsz"),
            F.min(id_col).alias("_mid"),
        )
        .where(F.col("_bsz") > int(max_bucket_size))
        .persist()
    )
    n_over = over.count()
    rows_over = largest = 0
    if n_over:
        agg = over.agg(
            F.sum("_bsz").alias("rows"), F.max("_bsz").alias("mx")
        ).first()
        rows_over, largest = int(agg["rows"]), int(agg["mx"])
        warnings.warn(
            f"{label}: {n_over} candidate bucket(s) exceed the bucket "
            f"cap max_bucket_size={max_bucket_size} ({rows_over} member "
            f"rows, largest {largest}); oversized buckets are capped "
            "(star/drop), so some candidate pairs are not enumerated — "
            "raise the cap (max_bucket_size / winnow's max_hash_df) "
            "only if the all-pairs cost is acceptable",
            RuntimeWarning,
            stacklevel=3,
        )
    if stats_out is not None:
        stats_out.update(
            oversized_buckets=n_over,
            oversized_rows=rows_over,
            largest_bucket=largest,
            max_bucket_size=int(max_bucket_size),
        )
    return over


def _capped_self_pairs(
    banded: DataFrame,
    keys: list[str],
    max_bucket_size: int | None,
    oversize: str,
    stats_out: dict | None,
    label: str,
) -> DataFrame:
    """Distinct ``(id_a, id_b)`` self-join candidate pairs (``id_a <
    id_b``) from a banded key table, with the giant-bucket guard.

    Buckets at or under ``max_bucket_size`` pair all-pairs (the exact
    LSH contract). Oversized buckets are handled per ``oversize``:

    * ``"star"`` — emit only ``(min_id, member)`` edges: O(m) rows per
      bucket instead of O(m^2), and exactly what connected-component
      clustering needs (a verified star through the min id connects
      the cluster; ``minhash_lsh_canon`` loses nothing when the bucket
      really is one near-dup cluster). Pair-level consumers see reduced
      recall INSIDE oversized buckets only — loudly reported.
    * ``"drop"`` — skip the bucket entirely (no pairs).
    """
    if max_bucket_size is None:
        a, b = banded.alias("a"), banded.alias("b")
        cond = (F.col("a.id") < F.col("b.id"))
        for k in keys:
            cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
        return (
            a.join(b, cond)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    _check_oversize_mode(oversize)
    over = _oversized_buckets(banded, keys, max_bucket_size, stats_out, label)
    small = banded.join(over.select(*keys), keys, "left_anti")
    a, b = small.alias("a"), small.alias("b")
    cond = (F.col("a.id") < F.col("b.id"))
    for k in keys:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    pairs = a.join(b, cond).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
    )
    if oversize == "star":
        star = (
            banded.join(over.select(*keys, "_mid"), keys)
            .where(F.col("id") != F.col("_mid"))
            .select(F.col("_mid").alias("id_a"), F.col("id").alias("id_b"))
        )
        pairs = pairs.unionByName(star)
    return pairs.distinct()


@dataclass(frozen=True)
class LshCorpus:
    """A reference corpus prepared ONCE for repeated LSH joins: the gram
    arrays and the banded signature table, both persisted. Built by
    :func:`prepare_lsh_corpus`; consumed by :func:`lsh_join_prepared`
    (and the streaming ingest filter, which would otherwise recompute
    the whole corpus' signatures every micro-batch and leak a pair of
    cached frames per batch — r3 review). ``unpersist()`` releases it.

    ``over_keys``: the giant-bucket guard's oversized corpus buckets
    ``(band, bh, _bsz, _mid)``, computed at prepare time (``None`` when
    prepared uncapped); ``bands_df`` then holds ONLY the small-bucket
    rows, so every join against the corpus is bounded per bucket.
    """

    grams: DataFrame
    bands_df: DataFrame
    n: int
    num_hashes: int
    bands: int
    analyzer: str
    over_keys: DataFrame | None = None
    oversize: str = "star"

    def unpersist(self) -> None:
        self.grams.unpersist()
        self.bands_df.unpersist()
        if self.over_keys is not None:
            self.over_keys.unpersist()


def prepare_lsh_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    analyzer: str = "simple",
    max_bucket_size: int | None = 8192,
    oversize: str = "star",
    stats_out: dict | None = None,
) -> LshCorpus:
    """Prepare a reference corpus for repeated LSH joins.

    ``max_bucket_size`` (r11 verdict #1): corpus band buckets larger
    than this are split out into ``over_keys`` at prepare time —
    eagerly counted, warned about, and reported via ``stats_out``. A
    fresh-side row landing in such a bucket joins ONE representative
    (the bucket's min id, ``oversize="star"``) instead of every member,
    or nothing (``"drop"``); either way a mega-bucket can no longer
    make a per-batch join quadratic. ``None`` prepares uncapped.
    """
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(trailing hashes would be silently ignored)"
        )
    # both cached: a percolating/joining consumer reads the band table
    # AND the gram table in one job (stage-race guard, r10). The gram
    # cache is NOT separately counted (r13, the minhash/simhash/winnow
    # trim): the band table derives from it in ONE chain, so the first
    # eager pass below — the guard's oversized-bucket count on the
    # capped path, the band-table materialize on the uncapped path —
    # runs the gram pipeline exactly once and fills BOTH caches before
    # any consumer fans out.
    gr = _gram_arrays(_widen(df), id_col, text_col, n, analyzer).persist()
    if max_bucket_size is None:
        return LshCorpus(
            grams=gr,
            bands_df=materialize(_band_table(gr, num_hashes, bands)),
            n=n, num_hashes=num_hashes, bands=bands, analyzer=analyzer,
        )
    _check_oversize_mode(oversize)
    # full band table cached only for THIS prepare pass (the oversize
    # scan + the small-bucket anti-join both read it), then released —
    # everything derived from it is itself materialized, so nothing
    # lazy references it afterwards. Not separately counted either:
    # the guard's eager count is its single-chain first consumer.
    full = _band_table(gr, num_hashes, bands).persist()
    over = _oversized_buckets(
        full, ["band", "bh"], max_bucket_size, stats_out,
        "prepare_lsh_corpus",
    )
    small = materialize(
        full.join(over.select("band", "bh"), ["band", "bh"], "left_anti")
    )
    full.unpersist()
    return LshCorpus(
        grams=gr, bands_df=small, n=n, num_hashes=num_hashes,
        bands=bands, analyzer=analyzer, over_keys=over, oversize=oversize,
    )


def save_lsh_corpus(corpus: LshCorpus, path: str) -> None:
    """Persist a prepared LSH corpus as Parquet — the durable version
    of :func:`prepare_lsh_corpus`. A prepared corpus dies with the
    session, so every restart of the streaming near-dup filter (and
    every batch job joining fresh data against a reference crawl
    snapshot) otherwise recomputes the full corpus' gram sets and
    MinHash signatures — at 100 TB that is a whole-corpus pass paid
    per restart for a result that never changed. Layout:
    ``path/grams`` + ``path/bands`` (+ ``path/over`` when prepared
    with a bucket cap) + ``path/meta`` (Spark-FS JSON via the shared
    ``_write_meta`` rule, so s3://, hdfs:// and file:// all work).
    Reload with :func:`load_lsh_corpus`."""
    import os

    from sparksearchengine_spark.operators.similarity import _write_meta

    corpus.grams.write.mode("overwrite").parquet(
        os.path.join(path, "grams")
    )
    corpus.bands_df.write.mode("overwrite").parquet(
        os.path.join(path, "bands")
    )
    if corpus.over_keys is not None:
        corpus.over_keys.write.mode("overwrite").parquet(
            os.path.join(path, "over")
        )
    _write_meta(
        corpus.grams, path,
        {
            "n": corpus.n,
            "num_hashes": corpus.num_hashes,
            "bands": corpus.bands,
            "analyzer": corpus.analyzer,
            "oversize": corpus.oversize,
            "capped": corpus.over_keys is not None,
        },
    )


def load_lsh_corpus(spark, path: str) -> LshCorpus:
    """Load a :func:`save_lsh_corpus` layout back into a prepared
    (materialized) :class:`LshCorpus` — signatures and band keys come
    off Parquet; no text is re-tokenized and no hashes recomputed.
    ``unpersist()`` releases the loaded caches as usual."""
    import os

    from sparksearchengine_spark.operators.similarity import _read_meta

    meta = _read_meta(spark, path)
    gr = materialize(spark.read.parquet(os.path.join(path, "grams")))
    bands_df = materialize(
        spark.read.parquet(os.path.join(path, "bands"))
    )
    over = (
        materialize(spark.read.parquet(os.path.join(path, "over")))
        if meta.get("capped")
        else None
    )
    return LshCorpus(
        grams=gr, bands_df=bands_df, n=int(meta["n"]),
        num_hashes=int(meta["num_hashes"]), bands=int(meta["bands"]),
        analyzer=meta["analyzer"], over_keys=over,
        oversize=meta.get("oversize", "star"),
    )


def lsh_join_prepared(
    gl: DataFrame, corpus: LshCorpus, threshold: float = 0.8
) -> DataFrame:
    """LSH join of a fresh (id, gs) gram table against a prepared
    corpus: banded candidates + exact-Jaccard verification,
    (id_l, id_r, jaccard).

    When the corpus was prepared with a bucket cap, fresh rows hitting
    an oversized corpus bucket pair with the bucket's min-id
    representative only (star) or not at all (drop) — the verify step
    still applies, so star matches are exact-Jaccard-true matches
    against that representative."""
    a = _band_table(gl, corpus.num_hashes, corpus.bands).alias("a")
    b = corpus.bands_df.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    if corpus.over_keys is not None and corpus.oversize == "star":
        star = a.join(
            corpus.over_keys.alias("o"),
            (F.col("a.band") == F.col("o.band"))
            & (F.col("a.bh") == F.col("o.bh")),
        ).select(F.col("a.id").alias("id_a"), F.col("o._mid").alias("id_b"))
        cand = cand.unionByName(star)
    cand = cand.distinct()
    out = _verify_jaccard(cand, gl, threshold, gram_arrays_b=corpus.grams)
    return out.select(
        F.col("id_a").alias("id_l"), F.col("id_b").alias("id_r"), "jaccard"
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    analyzer: str = "simple",
) -> DataFrame:
    """(id, sig array<long>[num_hashes]) MinHash signatures over n-grams.

    Shape: explode distinct grams to (id, base-hash) longs, then ONE
    hash-aggregate computing all ``num_hashes`` mins — every permutation
    min is a codegen'd expression inside a partial (map-side) aggregate,
    so the only shuffle is the (id)-keyed exchange of 64-column partials.

    Deliberately NOT a per-row higher-order-function expression: nested
    ``transform`` HOFs are CodegenFallback (interpreted eval) and re-evaluate
    the inner base array once per hash function — measured ~100x slower
    than this plan at sf0.1 despite being shuffle-free.

    Narrow inputs are widened to ``defaultParallelism`` first: a small
    local file reads as one split and would serialize the whole
    hash-compute on one core; at cluster scale the input already has
    more splits than cores and this is a no-op.
    """
    return _signatures_from_grams(
        _gram_arrays(_widen(df), id_col, text_col, n, analyzer), num_hashes
    )


def _signatures_from_grams(
    gram_arrays: DataFrame, num_hashes: int
) -> DataFrame:
    """Signatures from an (id, gs array<string>) gram table — explode to
    (id, base-hash) longs, then one codegen'd hash-aggregate of all mins."""
    bases = gram_arrays.select(
        "id", F.explode("gs").alias("gram")
    ).select("id", F.pmod(F.xxhash64("gram"), F.lit(_P)).alias("base"))
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("base") + F.lit(b), F.lit(_P))).alias(f"h{i}")
        for i, (a, b) in enumerate(_hash_family(num_hashes))
    ]
    sigs = bases.groupBy("id").agg(*aggs)
    return sigs.select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = 8192,
    oversize: str = "star",
    stats_out: dict | None = None,
) -> DataFrame:
    """Banded LSH: pairs sharing ≥1 band. rows_per_band = num_hashes/bands;
    P(candidate) = 1-(1-J^r)^b — with 64/16 the curve crosses ~0.5 at
    J≈0.55. Band hash is a single string concat; the join is keyed on
    (band_idx, band_hash), so co-candidates co-locate in one shuffle.

    ``max_bucket_size`` (r11 verdict #1): buckets with more members
    pair as a min-id STAR (``oversize="star"``, O(m) edges — the
    connectivity-preserving default for dedup clustering) or are
    dropped (``oversize="drop"``); ``None`` restores the uncapped
    all-pairs join. Oversized buckets are counted eagerly, warned
    about, and reported via ``stats_out`` — never silent. With the cap
    active ``sigs`` is persisted here (the bucket-size pass + both
    join sides read it; without the cache each would recompute the
    full signature aggregate — and the old uncapped plan already paid
    that recompute twice, so the cap path is NOT slower). It is NOT
    separately counted (r13, the r12 change-#5 class): the guard's
    eager oversized-bucket count is the first action and is a
    single-consumer chain through the banded explode over ``sigs`` —
    that one job materializes the cache with no fan-out race, and a
    dedicated count would add a driver-gated job plus one full
    signature-aggregate pass per call.
    """
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(trailing hashes would be silently ignored)"
        )
    if max_bucket_size is not None:
        sigs = sigs.persist()
    banded = _band_table_from_sigs(sigs, num_hashes, bands)
    return _capped_self_pairs(
        banded,
        ["band", "bh"],
        max_bucket_size,
        oversize,
        stats_out,
        "minhash_lsh_candidates",
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    analyzer: str = "simple",
    max_bucket_size: int | None = 8192,
    oversize: str = "star",
    stats_out: dict | None = None,
) -> DataFrame:
    """Approximate near-dup pairs: LSH candidates verified with exact
    Jaccard ≥ threshold. The scale path for 100 TB (signatures are
    num_hashes longs per doc; raw grams never pair-joined beyond
    candidates). Oversized band buckets are star-capped by default
    (``max_bucket_size``/``oversize``/``stats_out`` — see
    :func:`minhash_lsh_candidates`); run :func:`exact_dedup` (or
    ``dedup_paragraphs``) FIRST, as ``examples/pretraining_pipeline_example.py``
    does, so byte-identical mass never reaches the LSH stage — the cap
    then only fires on true near-dup mega-clusters."""
    # the candidate build and the Jaccard verify read ga from
    # independent stages of one job (stage-race guard, r10) — but on the
    # default capped path, minhash_lsh_candidates materializes the
    # SIGNATURE frame (single-consumer chain over ga) before anything
    # fans out, and that pass populates ga's cache too, so ga's own
    # count job is redundant there (r12: one job fewer per call).
    # Uncapped, sigs are not materialized and ga must be.
    ga = _gram_arrays(_widen(df), id_col, text_col, n, analyzer)
    ga = ga.persist() if max_bucket_size is not None else materialize(ga)
    sigs = _signatures_from_grams(ga, num_hashes)
    cand = minhash_lsh_candidates(
        sigs, num_hashes, bands,
        max_bucket_size=max_bucket_size, oversize=oversize,
        stats_out=stats_out,
    )
    return _verify_jaccard(cand, ga, threshold)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; component =
    min id reachable through the pair graph.

    Iterative min-label propagation with pointer-jumping path compression:
    each round every node takes the min of its own label, its neighbors'
    labels, and its label's label, so chains collapse in O(log diameter)
    rounds (near-dup clusters are almost always cliques or short chains —
    2-3 rounds in practice). Everything is keyed joins + aggregates: no
    driver-side graph, no cartesian. Lineage is truncated per round with
    the shared pin rule (mandatory for iterative plans — otherwise the
    plan doubles each round): reliable checkpoint when the session has
    a checkpoint dir (the returned labels read the LAST round's pin, so
    on a dynamic-allocation cluster the blocks must survive executor
    loss — ``operators/cache.py::make_pin``, r11 verdict #5), else
    ContextCleaner-freed localCheckpoint. Convergence is detected by
    counting changed labels.
    """
    from sparksearchengine_spark.operators.cache import make_pin

    _pin = make_pin(pairs.sparkSession)
    # the un-flipped half is PINNED (not just materialized) FIRST: it
    # both guards the stage race (the undirected union reads it from
    # two branches — an un-cached caller pipeline would be recomputed
    # per branch, r10) and TRUNCATES the caller's lineage before the
    # loop. The truncation is load-bearing (r12): a caller like
    # minhash_lsh_canon hands pairs whose plan nests the whole
    # gram/signature/candidate pipeline — and every nested persisted
    # frame re-prints its full cached plan at each reference in the
    # explain strings AQE generates per plan update, so with edges
    # referencing that lineage twice (union of two branches) and the
    # loop re-printing it every iteration, plan-STRING generation grows
    # multiplicatively and can OOM the driver on a deep caller pipeline
    # (observed: 4g heap, examples/pretraining_pipeline_example.py).
    # Pinning collapses everything downstream to a LogicalRDD scan.
    # No unpersist: the pinned blocks ARE the data (ContextCleaner
    # frees them when the result frames drop).
    half = _pin(pairs.select(
        F.col(id_a).cast("long").alias("src"),
        F.col(id_b).cast("long").alias("dst"),
    ))
    edges = materialize(
        half.unionByName(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    labels = _pin(
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("label").alias("_dl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_dl").alias("_nbr_min"))
            .select(F.col("src").alias("id"), "_nbr_min")
        )
        new = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(
                F.col("label"), F.coalesce("_nbr_min", F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: label <- label(label)
        new = _pin(
            new.join(
                new.select(
                    F.col("id").alias("label"), F.col("label").alias("_ll")
                ),
                "label",
                "left",
            )
            .select("id", F.coalesce("_ll", F.col("label")).alias("label"))
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("id", F.col("label").alias("component"))


def canonicalize_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Turn near-dup PAIRS into the same (id, canon_id, is_duplicate)
    assignment :func:`exact_dedup` produces: canon_id = min id in the
    pair-graph connected component, self for undupped rows.

    This is the piece that lets a pipeline actually DROP duplicates
    (``where(~is_duplicate)``) instead of holding a pair list.
    """
    comp = connected_components(pairs)
    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .join(
            comp.select(
                F.col("id").alias(id_col), F.col("component").alias("canon_id")
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce("canon_id", F.col(id_col)).alias("canon_id"),
        )
        .withColumn("is_duplicate", F.col(id_col) != F.col("canon_id"))
    )


def minhash_lsh_canon(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    analyzer: str = "simple",
    max_bucket_size: int | None = 8192,
    oversize: str = "star",
    stats_out: dict | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup -> canonical assignment for EVERY row of
    ``df``: (id, canon_id, is_duplicate). The end-to-end 100 TB dedup:
    signatures -> banded candidates -> exact-Jaccard verify -> connected
    components -> min-id canon.

    The default ``oversize="star"`` giant-bucket cap is LOSSLESS here
    when an oversized bucket is one true near-dup cluster: the verified
    star through the bucket's min id connects every member, which is
    all connected components needs (O(m) edges, not O(m^2) — r11
    verdict #1). Run exact dedup first (the documented pipeline order)
    so identical-text mass never inflates LSH buckets."""
    pairs = minhash_lsh_dedup(
        df, id_col=id_col, text_col=text_col, n=n,
        num_hashes=num_hashes, bands=bands, threshold=threshold,
        analyzer=analyzer, max_bucket_size=max_bucket_size,
        oversize=oversize, stats_out=stats_out,
    )
    return canonicalize_pairs(df, pairs, id_col=id_col)


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    analyzer: str = "simple",
) -> DataFrame:
    """(id, simhash array<int>[bits/16] of 16-bit blocks).

    Per doc: sum ±tf over each bit of xxhash64(term); sign -> bit. Blocks
    (not one long) so downstream Hamming joins can band on block equality
    without bit twiddling, and to stay ANSI-overflow-safe.
    """
    df = _widen(df)
    toks = analyzer_expr(F.col(text_col), analyzer)
    terms = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(toks).alias("term"),
    ).groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    h = F.xxhash64("term")
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    sums = terms.groupBy("id").agg(*bit_aggs)
    n_blocks = bits // 16
    blocks = [
        sum(
            (F.when(F.col(f"b{blk * 16 + j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)))
            for j in range(16)
        ).alias(f"blk{blk}")
        for blk in range(n_blocks)
    ]
    return sums.select("id", *blocks).select(
        "id", F.array(*[f"blk{i}" for i in range(n_blocks)]).alias("simhash")
    )


def simhash_neardup_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    analyzer: str = "simple",
) -> DataFrame:
    """O(N²) brute-force Hamming pairs over SimHashes — the recall-1
    baseline :func:`simhash_dedup`'s pigeonhole banding is measured
    against (they must be EQUAL for max_hamming ≤ 3; the banding is a
    candidate filter with zero false negatives, verified in the recall
    harness). Never run this at scale — it exists to check the fast path.
    """
    sh = simhash(df, id_col, text_col, 64, analyzer)
    a = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    ham = sum(
        F.bit_count(F.col("sh_a")[i].bitwiseXOR(F.col("sh_b")[i]))
        for i in range(4)
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    analyzer: str = "simple",
    max_bucket_size: int | None = 8192,
    oversize: str = "star",
    stats_out: dict | None = None,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Pigeonhole banding over the 4 16-bit blocks: distance ≤ 3 => at
    least one block identical, so candidates come from keyed equality
    joins on (block index, block value), then exact Hamming
    verification. No cross product.

    ``max_bucket_size`` (r11 verdict #1): a (block, value) bucket is
    still all-pairs within itself — a mega-cluster of m near-identical
    docs shares blocks and makes O(m^2) candidates. Oversized buckets
    pair as a min-id star (``"star"`` — connectivity preserved for
    clustering consumers; below the cap the pigeonhole recall-1
    guarantee vs :func:`simhash_neardup_exact` is untouched) or are
    skipped (``"drop"``); counts are eager, warned, and written to
    ``stats_out``. ``None`` restores the uncapped join.
    """
    if max_hamming > 3:
        raise ValueError("block scheme supports max_hamming <= 3 (4 blocks)")
    # cached: the bucket-size pass, both self-join arms, and the
    # Hamming verify read sh in one job (stage-race guard, r10). On the
    # default capped path the cache is NOT separately counted (r13,
    # same as minhash_lsh_candidates): the giant-bucket guard's eager
    # oversized-bucket count is the first action and a single-consumer
    # chain through the banded posexplode over sh — that job
    # materializes the cache before anything fans out. Uncapped there
    # is no guard count, so the dedicated materialize pass stays.
    sh = simhash(df, id_col, text_col, 64, analyzer)
    sh = sh.persist() if max_bucket_size is not None else materialize(sh)
    banded = sh.select(
        "id", F.posexplode("simhash").alias("blk", "bv")
    )
    pairs = _capped_self_pairs(
        banded, ["blk", "bv"], max_bucket_size, oversize, stats_out,
        "simhash_dedup",
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    ham = sum(
        # Hamming weight of a 16-bit block via bit_count (Spark 3.3+)
        F.bit_count(F.col("sh_a")[i].bitwiseXOR(F.col("sh_b")[i]))
        for i in range(4)
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    keep_blank: bool = True,
) -> DataFrame:
    """Cross-document line-level boilerplate removal (CCNet-style).

    A line appearing verbatim in >= min_docs DISTINCT documents is
    boilerplate (nav bars, cookie banners, license footers) and is dropped
    from every document; line order is otherwise preserved. Blank lines are
    exempt by default (they carry paragraph structure, and would trivially
    hit the threshold).

    Returns the input columns with ``text_col`` rewritten, plus
    ``n_lines`` (original) and ``n_removed``. NULL text passes through.

    Scale shape: lines are md5-hashed before any shuffle (raw line text
    never shuffles for the frequency count); one aggregation keyed on the
    line hash to compute document frequency, one join of the exploded
    lines against the flagged-hash set (no broadcast assumption — the
    boilerplate set is unbounded), one groupBy on the doc id to
    reassemble. No cross product, no driver-side state.
    """
    spark_cols = [c for c in df.columns]
    lines = (
        _widen(df)
        .select(
            F.col(id_col).alias("_bid"),
            # \r?\n so a CRLF doc's blank separators hash as '' (exempt
            # under keep_blank) instead of '\r' (cross-doc boilerplate
            # that would strip every paragraph break — r3 review). The
            # rebuild joins with '\n': CRLF docs come back LF-normalized.
            F.posexplode_outer(
                F.split(F.coalesce(F.col(text_col), F.lit("")), r"\r?\n")
            ).alias("_pos", "_line"),
        )
        .withColumn("_lh", F.md5(F.col("_line")))
    )
    linefreq = (
        lines.select("_bid", "_lh")
        .groupBy("_lh")
        .agg(F.count_distinct("_bid").alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("_lh", F.lit(True).alias("_boiler"))
    )
    kept = lines.join(linefreq, "_lh", "left").where(
        F.col("_boiler").isNull()
        | (F.lit(keep_blank) & (F.trim(F.col("_line")) == ""))
    )
    rebuilt = (
        kept.groupBy("_bid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("_new_text"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    n_lines = F.size(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\r?\n")
    )
    out = (
        df.withColumn("_n_lines", n_lines)
        .join(rebuilt, F.col(id_col) == F.col("_bid"), "left")
        .withColumn(
            text_col,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(
                F.coalesce(F.col("_new_text"), F.lit(""))
            ),
        )
        .withColumn(
            "n_removed",
            (F.col("_n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))).cast("int"),
        )
        .withColumn("n_lines", F.col("_n_lines").cast("int"))
        .select(*spark_cols, "n_lines", "n_removed")
    )
    return out


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_blank: bool = True,
) -> DataFrame:
    """Cross-document paragraph dedup, FIRST occurrence kept (the
    Dolma / RefinedWeb paragraph-dedup step — the complement of
    :func:`remove_boilerplate_lines`, which drops an over-threshold
    line from EVERY document; here each duplicate paragraph survives in
    exactly one place).

    Paragraphs are blank-line-separated spans (``\\n{2,}``, CRLF
    normalized). "First" is the smallest ``(id_col, position)`` — a
    deterministic total order, so reruns keep the same copy. A
    paragraph repeated WITHIN one document also keeps only its first
    occurrence. Whitespace-only paragraphs are exempt by default
    (``keep_blank``) — they carry layout, not content.

    Returns the input columns with ``text_col`` rewritten (survivors
    re-joined with ``\\n\\n``), plus ``n_paragraphs`` (original) and
    ``n_removed``. NULL text passes through.

    Scale shape: paragraphs are md5-hashed at the scan (raw paragraph
    text shuffles only once, partitioned by doc for the rebuild); the
    keep-first decision is ONE aggregation keyed on the 16-byte hash
    computing ``min(struct(id, pos))`` plus one join back on the hash —
    no window over the corpus, no broadcast assumption (the duplicate
    set is unbounded), no driver state.
    """
    spark_cols = [c for c in df.columns]
    paras = (
        _widen(df)
        .select(
            F.col(id_col).alias("_bid"),
            F.posexplode_outer(
                F.split(
                    F.regexp_replace(
                        F.coalesce(F.col(text_col), F.lit("")),
                        r"\r\n",
                        "\n",
                    ),
                    r"\n{2,}",
                )
            ).alias("_pos", "_para"),
        )
        .withColumn("_ph", F.md5(F.col("_para")))
    )
    winners = paras.groupBy("_ph").agg(
        F.min(F.struct("_bid", "_pos")).alias("_w")
    )
    kept = (
        paras.join(winners, "_ph")
        .where(
            ((F.col("_w._bid") == F.col("_bid"))
             & (F.col("_w._pos") == F.col("_pos")))
            | (F.lit(keep_blank) & (F.trim(F.col("_para")) == ""))
        )
        .select("_bid", "_pos", "_para")
    )
    rebuilt = kept.groupBy("_bid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                lambda s: s["_para"],
            ),
            "\n\n",
        ).alias("_new_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_paras = F.size(
        F.split(
            F.regexp_replace(
                F.coalesce(F.col(text_col), F.lit("")), r"\r\n", "\n"
            ),
            r"\n{2,}",
        )
    )
    return (
        df.withColumn("_n_paras", n_paras)
        .join(rebuilt, F.col(id_col) == F.col("_bid"), "left")
        .withColumn(
            text_col,
            F.when(
                F.col(text_col).isNull(), F.lit(None).cast("string")
            ).otherwise(F.coalesce(F.col("_new_text"), F.lit(""))),
        )
        .withColumn(
            "n_removed",
            (F.col("_n_paras") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("int"),
        )
        .withColumn("n_paragraphs", F.col("_n_paras").cast("int"))
        .select(*spark_cols, "n_paragraphs", "n_removed")
    )


def token_ngram_windows(tokens: Column, n: int) -> Column:
    """ALL space-joined n-gram windows (with multiplicity, unlike
    ``token_ngrams``); docs shorter than n tokens yield their single
    whole-doc gram so short docs still participate."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )


def cross_doc_ngram_dup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
    analyzer: str = "simple",
) -> DataFrame:
    """Per-document cross-corpus duplicated-text signal: the fraction of a
    doc's token n-gram windows that also occur in at least ``min_docs``
    distinct documents (the doc itself included), per Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better") /
    RefinedWeb's duplicated-fraction family. Doc-level near-dup catches
    whole-document copies; THIS catches shared passages (quotes,
    templates, syndicated paragraphs) inside otherwise-distinct docs.

    Returns (id_col, n_grams, n_dup_grams, dup_frac). Empty/NULL text
    rows return 0 grams and dup_frac 0.0.

    Scale shape: grams are md5-hashed at the scan (raw gram text never
    shuffles); one distinct + aggregation keyed on the gram hash for
    document frequency; one join back on the hash; one groupBy(id) rollup.
    """
    toks = analyzer_expr(F.col(text_col), analyzer)
    grams = (
        _widen(df)
        .select(
            F.col(id_col).alias("_gid"),
            F.explode_outer(
                F.when(F.size(toks) > 0, token_ngram_windows(toks, n))
            ).alias("_gram"),
        )
        .withColumn("_gh", F.md5(F.col("_gram")))
        .select("_gid", "_gh")
    )
    dupset = (
        grams.dropDuplicates(["_gid", "_gh"])
        .groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("_gh", F.lit(1).alias("_dup"))
    )
    rolled = (
        grams.join(dupset, "_gh", "left")
        .groupBy("_gid")
        .agg(
            F.count("_gh").alias("n_grams"),
            F.coalesce(F.sum("_dup"), F.lit(0)).alias("n_dup_grams"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(rolled, F.col(id_col) == F.col("_gid"), "left")
        .select(
            id_col,
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_dup_grams"), F.lit(0))
            .cast("bigint")
            .alias("n_dup_grams"),
            F.round(
                F.coalesce(F.col("n_dup_grams"), F.lit(0))
                / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    min_docs: int = 2,
    analyzer: str = "simple",
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL (Lee et al. 2021: drop the
    repeated substring, keep the rest of the document). A token position
    is removed when it is covered by any n-gram window occurring in >=
    ``min_docs`` distinct documents; surviving tokens re-join with single
    spaces.

    The output text is therefore analyzer-normalized (tokens joined by
    ' '), NOT the original byte string — the byte-exact variant needs the
    raw offsets the tokenizer discards, and every downstream trainer
    retokenizes anyway. Returns (id_col, text, n_tokens, n_removed_tokens).

    Scale shape: same as ``cross_doc_ngram_dup`` — gram md5s only in the
    shuffle, one document-frequency aggregation, one join back, then one
    per-doc rollup collecting the (bounded-by-doc-length) duplicated
    start positions; the coverage test is a per-row expression.
    """
    toks = analyzer_expr(F.col(text_col), analyzer)
    base = _widen(df).select(
        F.col(id_col).alias("_gid"),
        F.col(text_col).isNull().alias("_tnull"),
        F.coalesce(toks, F.array().cast("array<string>")).alias("_toks"),
    )
    grams = (
        base.select(
            "_gid",
            F.posexplode_outer(
                F.when(
                    F.size(F.col("_toks")) > 0,
                    token_ngram_windows(F.col("_toks"), n),
                )
            ).alias("_pos", "_gram"),
        )
        .withColumn("_gh", F.md5(F.col("_gram")))
        .select("_gid", "_pos", "_gh")
    )
    dupset = (
        grams.dropDuplicates(["_gid", "_gh"])
        .groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("_gh")
    )
    dup_starts = (
        grams.join(dupset, "_gh")
        .groupBy("_gid")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_starts"))
    )
    joined = base.join(dup_starts, "_gid", "left").withColumn(
        "_starts", F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
    )
    # a window of width n starting at 0-based _pos covers token indexes
    # [_pos, _pos + n - 1]; short docs (< n tokens) emit one whole-doc
    # window, so their covered span is the whole doc either way
    span = F.least(F.lit(n), F.size(F.col("_toks")))
    indexed = F.when(
        F.size(F.col("_toks")) > 0,
        F.transform(
            F.col("_toks"),
            lambda t, i: F.struct(i.alias("i"), t.alias("t")),
        ),
    ).otherwise(
        F.array().cast("array<struct<i:int,t:string>>")
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("_starts"),
            lambda st: (s["i"] >= st) & (s["i"] <= st + span - 1),
        ),
    )
    return joined.select(
        F.col("_gid").alias(id_col),
        F.when(F.col("_tnull"), F.lit(None).cast("string"))
        .otherwise(F.array_join(F.transform(kept, lambda s: s["t"]), " "))
        .alias(text_col),
        F.size(F.col("_toks")).cast("bigint").alias("n_tokens"),
        (F.size(F.col("_toks")) - F.size(kept))
        .cast("bigint")
        .alias("n_removed_tokens"),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_overlap: float = 0.2,
    window: int = 4,
    n: int = 5,
    max_hash_df: int | None = 8192,
    analyzer: str = "simple",
    stats_out: dict | None = None,
) -> DataFrame:
    """MOSS-style plagiarism candidates: pairs sharing winnowing
    fingerprints — `(id_a < id_b, n_shared, overlap)` with
    ``overlap = shared / min(|sel_a|, |sel_b|)`` (containment-style, so
    a short doc lifted into a long one still scores high).

    Shape: the winnowing selection (`textstats.winnow_selected`) explodes
    to (id, hash) — ~|tokens|/window rows per doc, the whole point of
    winnowing — and the pair join keys on the hash, so only docs
    actually sharing a fingerprint ever meet. ``max_hash_df`` drops
    fingerprints present in more than that many docs before the join
    (corpus-wide boilerplate phrases otherwise fan out quadratically —
    the same stop-fingerprint cap MOSS applies). It is ON by default
    (r12: a fingerprint posting is a candidate bucket like an LSH band
    bucket, and the same mega-bucket blowup applies) and LOUD: dropped
    fingerprints are counted eagerly, warned about, and reported via
    ``stats_out`` (``_oversized_buckets`` keys); MOSS semantics are
    preserved — sizes count only surviving fingerprints on BOTH sides.
    ``None`` disables the cap. At 100 TB this is one explode + one
    hash-keyed join + one pair aggregation; raw text never shuffles.
    """
    from sparksearchengine_spark.operators.textstats import winnow_selected

    sel = winnow_selected(
        _widen(df), text_col=text_col, id_col=id_col,
        window=window, n=n, analyzer=analyzer,
    ).select(F.col(id_col).cast("long").alias("id"), "sel")
    # explode_OUTER deliberately: a plain explode makes Catalyst infer a
    # `size(sel) > 0` filter (InferFiltersFromGenerate) and push it BELOW
    # the widen exchange — the entire interpreted winnowing chain then
    # re-evaluates on the pre-shuffle side, which is ONE task for a
    # single-split input (measured 180s vs 3s at sf0.1). The outer
    # variant infers nothing; its NULL row dies in the sentinel filter.
    e = sel.select("id", F.explode_outer("sel").alias("h")).where(
        # an empty/whitespace doc's selection is [md5('')] — a sentinel,
        # not content: without this filter every empty doc pairs with
        # every other at overlap 1.0 (r3 review), and quadratically so
        F.col("h") != F.md5(F.lit(""))
    )
    # persisted (stage-race guard, r10): the fingerprint table feeds
    # several plan branches of one job (df cap, both join sides, sizes);
    # (id, hash) rows only — raw text never cached. Session-lived,
    # matching ngram_jaccard_join's cache. On the default capped path
    # the cache is NOT separately counted (r13, same as
    # minhash_lsh_candidates/simhash_dedup): the stop-fingerprint
    # guard's eager oversized-bucket count is the first action and a
    # single-consumer chain through e — that one job evaluates the
    # interpreted winnowing chain exactly once and fills the cache
    # before the join arms / sizes fan out. With the cap disabled there
    # is no guard count, so the dedicated materialize pass stays.
    e = e.persist() if max_hash_df is not None else materialize(e)
    if max_hash_df is not None:
        over = _oversized_buckets(
            e, ["h"], max_hash_df, stats_out, "winnow_overlap_pairs"
        )
        e = e.join(over.select("h"), "h", "left_anti")
    # selection sizes AFTER the sentinel/stop-fingerprint drops: MOSS
    # excludes stop fingerprints from BOTH sides — counting them in the
    # denominator only would underestimate boilerplate-heavy docs'
    # overlap and miss real pairs (r3 review)
    sizes = e.groupBy("id").agg(F.count(F.lit(1)).alias("ns"))
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(
            b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id"))
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("ns").alias("_na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("ns").alias("_nb"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a", "id_b", "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / F.least(F.col("_na"), F.col("_nb")).cast("double"),
                6,
            ).alias("overlap"),
        )
        .where(F.col("overlap") >= float(min_overlap))
    )


# prepared frames persisted by edit_distance_join live here until the
# caller releases them — the result DataFrame is lazy, so the operator
# cannot know when its cache stops being useful (same pattern as
# dsir._feature_caches and SearchIndex._phrase_caches)
_edit_join_caches: list[DataFrame] = []


def release_edit_join_caches() -> None:
    """Unpersist every prepared frame cached by
    :func:`edit_distance_join` in this session; call after the joined
    result has been materialized (written / collected)."""
    for frame in _edit_join_caches:
        try:
            frame.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _edit_join_caches.clear()


def edit_distance_join(
    df: DataFrame,
    col: str,
    threshold: int = 1,
    id_col: str = "doc_id",
    q: int = 2,
    other: DataFrame | None = None,
) -> DataFrame:
    """EXACT edit-distance similarity self-join (or join against
    ``other``): pairs ``(id_a, id_b, dist)`` with
    ``levenshtein(s_a, s_b) <= threshold`` — entity resolution over
    short strings (titles, names, source tags), the ED-join of the
    string-similarity literature (prefix filtering over rarity-sorted
    character q-grams; ICDE'22-class designs refine the same bound).

    Exactness argument: one edit destroys at most ``q`` q-grams, so two
    strings within distance t share all but ``q*t`` grams — any pair
    must share at least one of each side's ``q*t + 1`` RAREST grams
    (the prefix). Candidates come from joining only those prefixes;
    every candidate is verified with the true ``levenshtein``. Strings
    carrying ≤ ``q*t`` grams (shorter than ~``q*(t+1)`` chars) can
    dodge the bound entirely, so they take a separate short-string path
    joined against everything within the length window — both sides of
    that join are bounded-length strings, and the length filter
    ``|len_a − len_b| <= t`` prunes first.

    At 100 TB: grams/hashes in the shuffle, never the long tail of
    pairs — candidate count is bounded by prefix-gram collisions (the
    rarity sort minimizes them), not |corpus|². NULL strings never
    match. Self-join emits each unordered pair once (``id_a < id_b``);
    with ``other`` the pair is (left id, right id).

    Caching: the prepared left frame is persisted (it feeds gram
    frequencies, prefixes, the short-string branches AND the final
    verify join) and stays cached until the caller runs
    :func:`release_edit_join_caches` — unpersisting before the result
    materializes would recompute the prep four times (ADVICE r5).
    """
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0, got {threshold}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    pref = q * threshold + 1

    def prep(frame: DataFrame, tag: str) -> DataFrame:
        s = F.col(col)
        # strings shorter than q carry their whole self as the one gram
        grams = F.when(F.length(s) < q, F.array(s)).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(s) - (q - 1)),
                lambda i: s.substr(i, F.lit(q)),
            )
        )
        return frame.where(s.isNotNull()).select(
            F.col(id_col).alias(f"id_{tag}"),
            s.alias(f"s_{tag}"),
            F.length(s).alias(f"len_{tag}"),
            F.array_distinct(grams).alias(f"g_{tag}"),
        )

    # materialized: freq/prefix/verify read the prepared side from
    # independent stages of one job (stage-race guard, r10)
    a = materialize(prep(df, "a"))
    b = prep(other, "b") if other is not None else (
        a.select(
            F.col("id_a").alias("id_b"),
            F.col("s_a").alias("s_b"),
            F.col("len_a").alias("len_b"),
            F.col("g_a").alias("g_b"),
        )
    )

    # global gram rarity over BOTH sides -> rarity-sorted prefixes
    ga = a.select(F.explode("g_a").alias("gram"))
    gb = b.select(F.explode("g_b").alias("gram"))
    freq = (
        ga.unionByName(gb)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
    )

    def prefixes(side: DataFrame, tag: str) -> DataFrame:
        ex = side.select(f"id_{tag}", F.explode(f"g_{tag}").alias("gram"))
        ranked = ex.join(freq, "gram").withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy(f"id_{tag}").orderBy("freq", "gram")
            ),
        )
        return ranked.where(F.col("_r") <= pref).select(f"id_{tag}", "gram")

    pa, pb = prefixes(a, "a"), prefixes(b, "b")
    cand = pa.join(pb, "gram").select("id_a", "id_b").distinct()

    # short strings (<= q*t DISTINCT grams — includes long repetitive
    # strings like "aaaa…", so no length bound holds on this set) can
    # share zero grams with a true match: pair them against everything
    # in the |len_a - len_b| <= t window instead. The window is joined
    # as an EQUI join on length bands of width t+1 — the short side
    # explodes into the (<= 3) bands overlapping [len-t, len+t], the
    # full side keeps its single band — a hash join, not the
    # broadcast-nested-loop a raw non-equi |len diff| predicate
    # compiles to (ADVICE r5). Both union branches are EMPTY frames
    # when no short strings exist — the plan prunes them.
    bw = threshold + 1

    def _bands(length: Column) -> Column:
        return F.explode(
            F.array_distinct(
                F.sequence(
                    F.floor((length - threshold) / bw).cast("long"),
                    F.floor((length + threshold) / bw).cast("long"),
                )
            )
        )

    def _band(length: Column) -> Column:
        return F.floor(length / bw).cast("long")

    short_a = (
        a.where(F.size("g_a") <= q * threshold)
        .select("id_a", "len_a")
        .withColumn("_band", _bands(F.col("len_a")))
    )
    short_b = (
        b.where(F.size("g_b") <= q * threshold)
        .select("id_b", "len_b")
        .withColumn("_band", _bands(F.col("len_b")))
    )
    extra_a = (
        short_a.join(
            b.select("id_b", F.col("len_b"), _band(F.col("len_b")).alias("_band")),
            "_band",
        )
        .where(F.abs(F.col("len_a") - F.col("len_b")) <= threshold)
        .select("id_a", "id_b")
    )
    extra_b = (
        a.select("id_a", F.col("len_a"), _band(F.col("len_a")).alias("_band"))
        .join(short_b, "_band")
        .where(F.abs(F.col("len_a") - F.col("len_b")) <= threshold)
        .select("id_a", "id_b")
    )
    cand = cand.unionByName(extra_a).unionByName(extra_b).distinct()

    verified = (
        cand.join(a.select("id_a", "s_a", "len_a"), "id_a")
        .join(b.select("id_b", "s_b", "len_b"), "id_b")
        .where(F.abs(F.col("len_a") - F.col("len_b")) <= threshold)
        .where(
            F.levenshtein(F.col("s_a"), F.col("s_b")) <= threshold
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("s_a"), F.col("s_b")).alias("dist"),
        )
    )
    if other is None:
        verified = verified.where(F.col("id_a") < F.col("id_b"))
    # keep `a` cached — it is re-read when the RETURNED frame finally
    # materializes (the verify join); eager unpersist here would undo
    # every reuse. Caller releases via release_edit_join_caches().
    _edit_join_caches.append(a)
    return verified
