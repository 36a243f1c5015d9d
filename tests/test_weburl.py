"""Web-curation operators: URL canonicalization, domain keys, latest-wins
compaction, blocklist filtering (operators/weburl.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksearchengine_spark.operators.weburl import (
    filter_domains,
    latest_per_key,
    normalize_url,
    registered_domain,
    url_host,
    with_url_keys,
)


def _norm_one(spark, url: str | None) -> str | None:
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(normalize_url(F.col("u")).alias("n")).first()["n"]


class TestNormalizeUrl:
    def test_lowercases_scheme_and_host_only(self, spark):
        assert (
            _norm_one(spark, "HTTPS://EXAMPLE.Com/Path/File")
            == "https://example.com/Path/File"
        )

    def test_strips_www_userinfo_fragment_keeps_nondefault_port(self, spark):
        # :8443 is not https' default -> a distinct origin, kept
        assert (
            _norm_one(spark, "https://user:pw@www.example.com:8443/a#frag")
            == "https://example.com:8443/a"
        )

    def test_default_ports_stripped_nondefault_kept(self, spark):
        assert _norm_one(spark, "http://e.com:80/a") == "http://e.com/a"
        assert _norm_one(spark, "https://e.com:443/a") == "https://e.com/a"
        assert _norm_one(spark, "http://e.com:443/a") == "http://e.com:443/a"
        assert (
            _norm_one(spark, "http://e.com:8080/a") == "http://e.com:8080/a"
        )

    def test_question_mark_inside_fragment_is_not_a_query(self, spark):
        # RFC 3986: '?' may appear in a fragment; it must not leak into
        # the canonical key
        assert _norm_one(spark, "https://e.com/a#sec?b=2") == "https://e.com/a"
        assert (
            _norm_one(spark, "https://e.com/a#sec?b=2")
            == _norm_one(spark, "https://e.com/a#other")
        )

    def test_path_slash_canonicalization(self, spark):
        assert _norm_one(spark, "http://e.com//a///b/") == "http://e.com/a/b"
        # root collapses to the bare authority
        assert _norm_one(spark, "http://e.com/") == "http://e.com"

    def test_tracking_params_dropped_rest_sorted(self, spark):
        assert (
            _norm_one(
                spark,
                "http://e.com/p?b=2&utm_source=tw&a=1&fbclid=XYZ&gclid=1",
            )
            == "http://e.com/p?a=1&b=2"
        )

    def test_all_params_tracking_drops_question_mark(self, spark):
        assert _norm_one(spark, "http://e.com/p?utm_medium=m") == "http://e.com/p"

    def test_param_order_invariance(self, spark):
        a = _norm_one(spark, "http://e.com/p?x=1&y=2")
        b = _norm_one(spark, "http://e.com/p?y=2&x=1")
        assert a == b == "http://e.com/p?x=1&y=2"

    def test_null_and_schemeless(self, spark):
        assert _norm_one(spark, None) is None
        # no scheme -> degenerate-but-stable key, never a crash
        assert _norm_one(spark, "not a url") == "://"


class TestRegisteredDomain:
    @pytest.mark.parametrize(
        "host,want",
        [
            ("news.bbc.co.uk", "bbc.co.uk"),
            ("a.b.example.com", "example.com"),
            ("example.com", "example.com"),
            ("localhost", "localhost"),
            ("sub.example.ac.jp", "example.ac.jp"),
        ],
    )
    def test_heuristic(self, spark, host, want):
        df = spark.createDataFrame([(host,)], "h string")
        got = df.select(registered_domain(F.col("h")).alias("d")).first()["d"]
        assert got == want

    def test_www_strip_does_not_change_domain(self, spark):
        df = spark.createDataFrame(
            [("https://www.example.com/x",), ("https://example.com/y",)],
            "u string",
        )
        doms = {
            r["d"]
            for r in df.select(
                registered_domain(url_host(F.col("u"))).alias("d")
            ).collect()
        }
        assert doms == {"example.com"}


class TestWithUrlKeys:
    def test_adds_three_keys_scan_stage(self, spark):
        df = spark.createDataFrame(
            [(1, "HTTP://www.Example.co.uk:80/a/?utm_source=x&k=v")],
            "id long, url string",
        )
        row = with_url_keys(df, "url").first()
        assert row["url_norm"] == "http://example.co.uk/a?k=v"
        assert row["url_host"] == "example.co.uk"
        assert row["url_domain"] == "example.co.uk"
        # pure projection: no exchange in the plan
        plan = with_url_keys(df, "url")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestLatestPerKey:
    def test_keeps_newest_with_tiebreak(self, spark):
        df = spark.createDataFrame(
            [
                ("u1", 10, 1, "old"),
                ("u1", 20, 2, "new"),
                ("u2", 5, 3, "only"),
                ("u3", 7, 4, "tie-lo"),
                ("u3", 7, 5, "tie-hi"),
            ],
            "url string, ts long, cap_id long, body string",
        )
        out = {
            r["url"]: r["body"]
            for r in latest_per_key(
                df, ["url"], "ts", tiebreak_col="cap_id"
            ).collect()
        }
        assert out == {"u1": "new", "u2": "only", "u3": "tie-hi"}

    def test_multi_key(self, spark):
        df = spark.createDataFrame(
            [("a", "x", 1, 1), ("a", "x", 2, 2), ("a", "y", 1, 3)],
            "k1 string, k2 string, ts long, id long",
        )
        assert latest_per_key(df, ["k1", "k2"], "ts", "id").count() == 2

    def test_window_group_limit_in_plan(self, spark):
        df = spark.createDataFrame(
            [("u", i, i) for i in range(10)], "url string, ts long, id long"
        )
        plan = (
            latest_per_key(df, ["url"], "ts", "id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # rank<=1 must prune partition-locally before the key exchange
        assert "WindowGroupLimit" in plan


class TestFilterDomains:
    def test_literal_blocklist_is_scan_predicate(self, spark):
        df = spark.createDataFrame(
            [("example.com",), ("spam.biz",), ("ok.org",)], "domain string"
        )
        kept = {
            r["domain"]
            for r in filter_domains(df, "domain", ["spam.biz"]).collect()
        }
        assert kept == {"example.com", "ok.org"}
        plan = (
            filter_domains(df, "domain", ["spam.biz"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "Join" not in plan

    def test_allowlist_mode(self, spark):
        df = spark.createDataFrame(
            [("a.com",), ("b.com",)], "domain string"
        )
        kept = {
            r["domain"]
            for r in filter_domains(df, "domain", ["a.com"], mode="allow").collect()
        }
        assert kept == {"a.com"}

    def test_dataframe_blocklist_broadcast_anti_join(self, spark):
        df = spark.createDataFrame(
            [("a.com", 1), ("b.com", 2)], "domain string, id long"
        )
        bl = spark.createDataFrame([("b.com",)], "bad string")
        out = filter_domains(df, "domain", bl)
        assert {r["domain"] for r in out.collect()} == {"a.com"}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    def test_bad_mode_raises(self, spark):
        df = spark.createDataFrame([("a.com",)], "domain string")
        with pytest.raises(ValueError):
            filter_domains(df, "domain", ["x"], mode="nope")

    def test_null_domain_consistent_across_paths(self, spark):
        # literal-list and DataFrame paths must agree on NULL keys:
        # block keeps them, allow drops them
        df = spark.createDataFrame(
            [("a.com",), (None,), ("b.com",)], "domain string"
        )
        bl_df = spark.createDataFrame([("b.com",)], "bad string")
        lit_block = {
            r["domain"] for r in filter_domains(df, "domain", ["b.com"]).collect()
        }
        df_block = {
            r["domain"] for r in filter_domains(df, "domain", bl_df).collect()
        }
        assert lit_block == df_block == {"a.com", None}
        lit_allow = filter_domains(
            df, "domain", ["b.com"], mode="allow"
        ).count()
        df_allow = filter_domains(df, "domain", bl_df, mode="allow").count()
        assert lit_allow == df_allow == 1


class TestMergeLatest:
    def test_upsert_semantics(self, spark):
        from sparksearchengine_spark.operators.weburl import merge_latest

        base = spark.createDataFrame(
            [("u1", 10, 1, "old"), ("u2", 10, 2, "keep")],
            "url string, ts long, seq long, body string",
        )
        updates = spark.createDataFrame(
            [("u1", 20, 3, "new"), ("u3", 5, 4, "insert")],
            "url string, ts long, seq long, body string",
        )
        out = {
            r["url"]: r["body"]
            for r in merge_latest(base, updates, ["url"], "ts", "seq").collect()
        }
        assert out == {"u1": "new", "u2": "keep", "u3": "insert"}

    def test_stale_update_ignored_and_idempotent(self, spark):
        from sparksearchengine_spark.operators.weburl import merge_latest

        base = spark.createDataFrame(
            [("u1", 20, 5, "current")],
            "url string, ts long, seq long, body string",
        )
        stale = spark.createDataFrame(
            [("u1", 10, 6, "stale")],
            "url string, ts long, seq long, body string",
        )
        once = merge_latest(base, stale, ["url"], "ts", "seq")
        twice = merge_latest(once, stale, ["url"], "ts", "seq")
        assert [tuple(r) for r in once.collect()] == [
            tuple(r) for r in twice.collect()
        ]
        assert once.first()["body"] == "current"


class TestCorpusDiff:
    def test_added_removed_changed(self, spark):
        from sparksearchengine_spark.operators.weburl import corpus_diff

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "C!"), (4, "d")], "doc_id long, text string"
        )
        got = {r.doc_id: r.change for r in corpus_diff(old, new).collect()}
        assert got == {1: "removed", 3: "changed", 4: "added"}

    def test_include_unchanged_and_null_equal(self, spark):
        from sparksearchengine_spark.operators.weburl import corpus_diff

        old = spark.createDataFrame(
            [(1, None), (2, "x")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(1, None), (2, None)], "doc_id long, text string"
        )
        got = {
            r.doc_id: r.change
            for r in corpus_diff(old, new, include_unchanged=True).collect()
        }
        assert got == {1: "unchanged", 2: "changed"}

    def test_feeds_upsert_roundtrip(self, spark, docs_df):
        """diff(old, new) -> CDC delta -> upsert_index(old index) must
        search identically to an index built over new directly."""
        from sparksearchengine_spark import Corpus, Q, TextOptions
        from sparksearchengine_spark.operators.index import upsert_index
        from sparksearchengine_spark.operators.weburl import corpus_diff

        old = docs_df.where(F.col("doc_id") < 120)
        new = (
            docs_df.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 140))
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") < 40,
                    F.concat(F.col("text"), F.lit(" edited")),
                ).otherwise(F.col("text")),
            )
        )
        d = corpus_diff(old, new, compare_cols=["text"])
        touched = [
            r.doc_id
            for r in d.where(F.col("change").isin("added", "changed")).collect()
        ]
        removed = [
            r.doc_id for r in d.where(F.col("change") == "removed").collect()
        ]
        opts = {"text": TextOptions(analyzer="simple")}
        base = Corpus(old, id_col="doc_id", text_cols=opts).build_index(
            persist=False
        )
        up = upsert_index(
            base,
            new.where(F.col("doc_id").isin(touched)),
            deletes=removed,
            persist=False,
        )
        fresh = Corpus(new, id_col="doc_id", text_cols=opts).build_index(
            persist=False
        )
        q = Q.field("text").match_any("dup", "spark")
        assert [tuple(r) for r in up.search(q, k=10).collect()] == [
            tuple(r) for r in fresh.search(q, k=10).collect()
        ]

    def test_no_shared_cols_raises(self, spark):
        from sparksearchengine_spark.operators.weburl import corpus_diff

        a = spark.createDataFrame([(1, "x")], "doc_id long, a string")
        b = spark.createDataFrame([(1, "x")], "doc_id long, b string")
        with pytest.raises(ValueError, match="no shared columns"):
            corpus_diff(a, b)


class TestCorpusDiffStringIds:
    def test_url_keys_survive(self, spark):
        """r5 review: string ids must not be cast to long (which NULLs
        them and misreports everything as added+removed)."""
        from sparksearchengine_spark.operators.weburl import corpus_diff

        old = spark.createDataFrame(
            [("http://a", "x"), ("http://b", "y")], "url string, text string"
        )
        new = spark.createDataFrame(
            [("http://a", "x"), ("http://b", "Y"), ("http://c", "z")],
            "url string, text string",
        )
        got = {
            r.url: r.change
            for r in corpus_diff(old, new, id_col="url").collect()
        }
        assert got == {"http://b": "changed", "http://c": "added"}


class TestUrllibParity:
    """weburl's scan-stage URL pieces vs Python's urllib on 300 seeded
    generated URLs (userinfo, ports, empty paths, duplicate slashes,
    tracking params, fragments with '?', mixed case). The regex
    extractors are intentionally canonicalizing, so each piece is
    compared against urllib PLUS the documented canonicalization."""

    @staticmethod
    def _gen_urls(seed, n=300):
        import random

        rng = random.Random(seed)
        schemes = ["http", "HTTPS", "ftp", "Http"]
        hosts = ["Example.COM", "www.Sub.example.org", "a.b.co.uk",
                 "localhost", "xn--bcher-kva.example"]
        users = ["", "user@", "u:p@"]
        ports = ["", ":80", ":443", ":8080", ":1"]
        paths = ["", "/", "/a/b", "//dup//slash/", "/trail/", "/%7Euser"]
        queries = ["", "?b=2&a=1", "?utm_source=x&a=1", "?ref=z",
                   "?a=1&fbclid=Y&c=3", "?lone"]
        frags = ["", "#f", "#frag?not=query"]
        out = []
        for _ in range(n):
            out.append(
                rng.choice(schemes) + "://" + rng.choice(users)
                + rng.choice(hosts) + rng.choice(ports)
                + rng.choice(paths) + rng.choice(queries)
                + rng.choice(frags)
            )
        return out

    def test_pieces_match_urllib(self, spark):
        import re
        from urllib.parse import urlsplit

        from pyspark.sql import functions as F

        from sparksearchengine_spark.operators.weburl import (
            TRACKING_PARAM_RE,
            url_host,
            url_path,
            url_port_canonical,
            url_query_canonical,
            url_scheme,
        )

        urls = self._gen_urls(seed=42)
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {
            r.url: (r.s, r.h, r.p, r.pt, r.q)
            for r in df.select(
                "url",
                url_scheme(F.col("url")).alias("s"),
                url_host(F.col("url")).alias("h"),
                url_path(F.col("url")).alias("p"),
                url_port_canonical(F.col("url")).alias("pt"),
                url_query_canonical(F.col("url")).alias("q"),
            ).collect()
        }
        track = re.compile(TRACKING_PARAM_RE)
        for u in urls:
            sp = urlsplit(u)
            want_scheme = sp.scheme.lower()
            want_host = re.sub(r"^www\.", "", (sp.hostname or ""))
            want_path = re.sub(r"/+$", "", re.sub(r"//+", "/", sp.path))
            port = sp.port
            if port is None or (want_scheme, port) in (
                ("http", 80), ("https", 443)
            ):
                want_port = ""
            else:
                want_port = f":{port}"
            want_q = "&".join(
                sorted(
                    kv for kv in sp.query.split("&")
                    if kv and not track.match(kv)
                )
            )
            s, h, p, pt, q = got[u]
            assert s == want_scheme, (u, s, want_scheme)
            assert h == want_host, (u, h, want_host)
            assert p == want_path, (u, p, want_path)
            assert pt == want_port, (u, pt, want_port)
            assert q == want_q, (u, q, want_q)
