"""Web-crawl curation operators: URL canonicalization, domain rollups,
latest-version compaction.

Large-scale text corpora are crawl-derived (CommonCrawl / RefinedWeb /
C4 lineage): the unit of provenance is a URL, and the first curation
stages are URL-keyed — canonicalize so the same page crawled twice keys
identically, group by registered domain for per-site quotas/blocklists,
and keep only the newest capture of each page (crawls re-fetch pages;
training wants one version). The reference engine has no web layer (its
corpus sources are Wikipedia XML and object files, SURVEY §2.2) — this
module is part of the training-data-pipeline extension surface.

Scale notes:

* ``normalize_url`` / ``registered_domain`` are pure scan-stage column
  expressions (regex + array ops, no UDF, no shuffle): at 100 TB they
  ride the first pass over the corpus for free and stay inside
  whole-stage codegen.
* ``latest_per_key`` is one rank window partitioned by the key — the
  same WindowGroupLimit shape as ``sample_per_group``: per-key top-1
  prunes partition-locally before the exchange, so the shuffle carries
  ~1 row per key, not every capture.
* ``filter_domains`` keeps the blocklist driver-side when it is a
  literal list (an ``isin`` compiles to a scan predicate and can push
  down); a DataFrame blocklist becomes a broadcast anti/semi join.

Everything is engine-portable (shared RE2/Java regex subset, md-free):
the DuckDB oracles in ``__spark_entry__.py`` replicate the expressions
verbatim, so canonicalization is bit-identical across engines — the
property that makes URL-keyed dedup reproducible when the corpus is
re-processed elsewhere.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Query parameters that vary per click, not per page: advertising/session
# trackers. Dropping them is standard crawl canonicalization (they never
# change page content). Matched against the full "k=v" pair.
TRACKING_PARAM_RE = (
    "^(utm_[a-z0-9]+|fbclid|gclid|dclid|msclkid|mc_eid|mc_cid|igshid"
    "|yclid|ref|ref_src|spm|_ga)(=.*)?$"
)

# Country-code second-level domains where the registrable name is three
# labels (example.co.uk), not two. A deliberately small, documented
# heuristic — the full public-suffix list is a data file, not logic; at
# 100 TB you would broadcast-join the PSL instead (same plan shape as
# filter_domains with a DataFrame blocklist).
_SECOND_LEVEL_RE = r"\.(ac|co|com|edu|go|gov|mil|net|or|org)\.[a-z]{2}$"


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme of ``url`` ('' when absent)."""
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def url_host(url: Column) -> Column:
    """Lower-cased host of ``url`` (port and userinfo stripped, leading
    ``www.`` removed — the standard crawl canonicalization). The port is
    stripped here because this is the DOMAIN key; :func:`normalize_url`
    separately retains non-default ports in the canonical URL (distinct
    origins must not collapse — r3 review)."""
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    host = F.lower(F.regexp_replace(hostport, r"^[^@]*@", ""))
    host = F.regexp_replace(host, r":[0-9]*$", "")
    return F.regexp_replace(host, r"^www\.", "")


def url_port_canonical(url: Column) -> Column:
    """':port' suffix for the canonical URL: '' when absent or when it
    is the scheme's default (http:80, https:443) — a non-default port is
    a different origin and must stay in the key."""
    hostport = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    scheme = url_scheme(url)
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    return F.when(
        (port == "") | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))


def url_path(url: Column) -> Column:
    """Path of ``url``, canonicalized: duplicate slashes collapsed,
    trailing slash stripped, '' for the root."""
    p = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    p = F.regexp_replace(p, r"//+", "/")
    return F.regexp_replace(p, r"/+$", "")


def url_query_canonical(url: Column) -> Column:
    """Query string of ``url`` with tracking parameters dropped and the
    survivors sorted ('' when nothing survives). Sorting makes
    ``?b=2&a=1`` and ``?a=1&b=2`` key identically. The fragment is
    removed BEFORE the '?' search — RFC 3986 allows '?' inside a
    fragment, and matching one would leak fragment content into the
    canonical key (r3 review)."""
    q = F.regexp_extract(
        F.regexp_replace(url, r"#.*", ""), r"\?(.*)$", 1
    )
    parts = F.filter(
        F.split(q, "&"),
        lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.sort_array(parts), "&")


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url``: lower scheme+host, userinfo/port/www./
    fragment stripped, path de-slashed, tracking params dropped, residual
    params sorted. NULL in -> NULL out; a string with no ``scheme://``
    yields '' host and survives as a degenerate-but-stable key.

    Non-default ports are RETAINED (``:8080`` is a different origin);
    only scheme-default ports (http:80, https:443) are dropped.

    Pure scan-stage expression — composes with any corpus read at zero
    plan cost (no UDF, no shuffle, stays in codegen)."""
    scheme, host, path = url_scheme(url), url_host(url), url_path(url)
    q = url_query_canonical(url)
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            url_port_canonical(url),
            path,
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain of a (normalized) host: last two labels, or
    last three when the second level is a known ccTLD second-level
    (example.co.uk). Hosts without a dot pass through unchanged."""
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(host.rlike(_SECOND_LEVEL_RE), three).otherwise(
        F.when(two == "", host).otherwise(two)
    )


def with_url_keys(
    df: DataFrame, url_col: str, prefix: str = "url_"
) -> DataFrame:
    """df + ``{prefix}norm`` (canonical URL), ``{prefix}host``,
    ``{prefix}domain`` — the three keys crawl curation groups and joins
    on. One scan-stage projection."""
    u = F.col(url_col)
    host = url_host(u)
    return df.withColumns(
        {
            f"{prefix}norm": normalize_url(u),
            f"{prefix}host": host,
            f"{prefix}domain": registered_domain(host),
        }
    )


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep the newest row per key (re-crawl compaction / CDC
    latest-wins): one rank window over ``key_cols`` ordered by ``ts_col``
    DESC. Ties broken by ``tiebreak_col`` DESC when given (make it a
    unique id for full determinism; without it equal-timestamp ties are
    declared-ambiguous and any one row is kept).

    WindowGroupLimit shape: rank ≤ 1 prunes partition-locally, so the
    key shuffle moves ~1 row per key even when pages were captured
    hundreds of times."""
    order = [F.col(ts_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def filter_domains(
    df: DataFrame,
    domain_col: str,
    blocklist: Iterable[str] | DataFrame,
    mode: str = "block",
) -> DataFrame:
    """Drop (``mode='block'``) or keep (``'allow'``) rows whose
    ``domain_col`` appears in the list. A literal list compiles to an
    ``isin`` scan predicate (pushes down, no shuffle); a one-column
    DataFrame becomes an anti/semi join whose strategy is PROBED (the
    100 TB path): real blocklists run to millions of domains and a
    user-supplied frame has no driver-known bound, so it broadcasts
    only when provably ≤ the vocab budget, else shuffle_hash with the
    blocklist as build side (the corpus is never the build side)."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be block|allow, got {mode!r}")
    if isinstance(blocklist, DataFrame):
        from sparksearchengine_spark.operators.index import (
            VOCAB_BROADCAST_MAX_ROWS,
        )
        from sparksearchengine_spark.operators.search import _hint_data_side

        bcol = blocklist.columns[0]
        side = _hint_data_side(
            blocklist.select(F.col(bcol).alias(domain_col)),
            max_rows=VOCAB_BROADCAST_MAX_ROWS,
        )
        how = "left_anti" if mode == "block" else "left_semi"
        return df.join(side, on=domain_col, how=how)
    # NULL domains must behave like the join path (anti keeps them,
    # semi drops them): a bare ~isin yields NULL for NULL keys, which
    # where() would drop on BOTH paths (r3 review)
    pred = F.coalesce(
        F.col(domain_col).isin(list(blocklist)), F.lit(False)
    )
    return df.where(~pred if mode == "block" else pred)


def merge_latest(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """CDC merge-upsert, latest-wins: rows in ``updates`` replace same-key
    rows in ``base`` when newer, new keys insert, absent keys survive —
    ``unionByName`` + :func:`latest_per_key`, so the whole merge is ONE
    key shuffle with WindowGroupLimit pruning (no MERGE INTO engine
    dependency, no per-key lookups). Ties at equal ``ts_col`` prefer the
    row with the greater ``tiebreak_col``; pass a batch/sequence id there
    so re-applying the same update batch is idempotent."""
    return latest_per_key(
        base.unionByName(updates), key_cols, ts_col, tiebreak_col
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Snapshot diff between two corpus versions: ``(id, change)`` with
    ``change ∈ {'added','removed','changed'[, 'unchanged']}`` — the op
    that turns two crawls into the CDC delta `index.upsert_index`
    consumes (changes = ``new`` rows whose id is added/changed, deletes
    = removed ids) and the first number a pipeline report wants after a
    re-crawl.

    ``compare_cols`` defaults to every shared non-id column. Content
    equality is hash-based (md5 over the delimited columns), so the
    full-outer join moves ``(id, 16-byte hash)`` rows only — at 100 TB
    the raw text never shuffles, same contract as `dedup.exact_dedup`.
    NULL-vs-NULL compares equal (the hash delimiter encodes NULL
    explicitly). Unchanged rows are dropped by default — at crawl scale
    they are the overwhelming majority and downstream only wants the
    delta.
    """
    from sparksearchengine_spark.operators.dedup import _self_delimited

    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c != id_col and c in new.columns
        ]
        if not compare_cols:
            raise ValueError("no shared columns to compare")
    missing = [
        c
        for c in compare_cols
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"compare_cols not in both frames: {missing}")
    cols = list(compare_cols)
    # ids pass through UNCAST: corpus keys may be strings (URLs) — a
    # long cast would NULL them and misreport every row as
    # added+removed (r5 review finding)
    o = old.select(
        F.col(id_col).alias("_id"),
        F.md5(_self_delimited(cols)).alias("_ho"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.md5(_self_delimited(cols)).alias("_hn"),
    )
    j = o.join(n, "_id", "full_outer")
    change = (
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col("_id").alias(id_col), change.alias("change"))
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out
