"""PageRank / link-graph prior tests.

The Spark iteration is pinned against a pure-Python textbook power
iteration (damped Google matrix with uniform dangling redistribution)
on hand-built graphs — exact semantics, not just sum-to-one.
"""

from __future__ import annotations

import pytest

from sparksearchengine_spark.operators.linkgraph import (
    degree_stats,
    domain_pagerank,
    pagerank,
)


def _reference_pagerank(edges, damping=0.85, iterations=20, seeds=None):
    """Textbook (personalized) power iteration on an adjacency dict."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {}
    for s, d in set(edges):
        out.setdefault(s, set()).add(d)
    n = len(nodes)
    if seeds is None:
        p = {v: 1.0 / n for v in nodes}
    else:
        sset = set(seeds) & set(nodes)
        p = {v: (1.0 / len(sset) if v in sset else 0.0) for v in nodes}
    rank = dict(p)
    for _ in range(iterations):
        new = {v: 0.0 for v in nodes}
        dangling = sum(rank[v] for v in nodes if v not in out)
        for s, ds in out.items():
            share = rank[s] / len(ds)
            for d in ds:
                new[d] += share
        rank = {
            v: (1 - damping) * p[v]
            + damping * (new[v] + dangling * p[v])
            for v in nodes
        }
    return rank


EDGES_DIAMOND = [  # a->{b,c}, b->d, c->d, d->a  (strongly connected)
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"),
]
EDGES_DANGLING = [  # c is a pure sink (most of a crawl frontier)
    ("a", "b"), ("b", "a"), ("a", "c"), ("b", "c"),
]
EDGES_STAR = [("hub", f"leaf{i}") for i in range(5)] + [
    (f"leaf{i}", "hub") for i in range(5)
]


class TestPagerank:
    @pytest.mark.parametrize(
        "edges", [EDGES_DIAMOND, EDGES_DANGLING, EDGES_STAR],
        ids=["diamond", "dangling-sink", "star"],
    )
    def test_matches_reference_power_iteration(self, spark, edges):
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.node: r.rank
            for r in pagerank(df, iterations=15, tol=None).collect()
        }
        want = _reference_pagerank(edges, iterations=15)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9), v
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_early_stop_tolerance(self, spark):
        df = spark.createDataFrame(EDGES_DIAMOND, "src string, dst string")
        loose = pagerank(df, iterations=50, tol=1e-3).collect()
        tight = {
            r.node: r.rank
            for r in pagerank(df, iterations=50, tol=1e-12).collect()
        }
        # both converge to the same fixed point within the loose tol
        for r in loose:
            assert r.rank == pytest.approx(tight[r.node], abs=1e-2)
        assert sum(tight.values()) == pytest.approx(1.0, abs=1e-9)

    def test_parallel_edges_deduped_nulls_dropped(self, spark):
        df = spark.createDataFrame(
            EDGES_DIAMOND + [("a", "b"), ("a", None), (None, "b")],
            "src string, dst string",
        )
        got = {
            r.node: r.rank
            for r in pagerank(df, iterations=15, tol=None).collect()
        }
        want = _reference_pagerank(EDGES_DIAMOND, iterations=15)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)

    def test_empty_graph(self, spark):
        df = spark.createDataFrame([], "src string, dst string")
        assert pagerank(df, iterations=2).count() == 0

    def test_skewed_hub_no_window_and_correct(self, spark):
        """r9 verdict advisory #1: a domain-graph mega-hub (one source
        with ~1e5 out-edges) must not funnel through a single-partition
        window. The out-degree now comes from a partial-agg groupBy
        joined back (AQE-skew-splittable); ranks stay pinned to the
        pure-Python reference at 1e-9."""
        from pyspark.sql import functions as F

        from sparksearchengine_spark.operators.linkgraph import (
            _project_edges,
            _with_out_degree,
        )

        hub_edges = [("hub", f"n{i}") for i in range(100_000)]
        ring = [(f"n{i}", f"n{i+1}") for i in range(20)] + [("n20", "hub")]
        df = spark.createDataFrame(
            hub_edges + ring, "src string, dst string"
        )

        # plan shape: the degree build contains NO Window operator over
        # the edge frame (the skew ceiling the advisory flagged)
        e = _project_edges(df, "src", "dst", dedup_edges=True)
        plan = (
            _with_out_degree(e)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        # the hub's degree is right on every edge row
        deg = (
            _with_out_degree(e)
            .where(F.col("_s") == "hub")
            .select("_deg")
            .distinct()
            .collect()
        )
        assert [r._deg for r in deg] == [100_000]

        got = {
            r.node: r.rank
            for r in pagerank(df, iterations=5, tol=None).collect()
        }
        want = _reference_pagerank(hub_edges + ring, iterations=5)
        assert set(got) == set(want)
        for v in ("hub", "n0", "n10", "n20", "n50000"):
            assert got[v] == pytest.approx(want[v], abs=1e-9), v
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)

    @pytest.mark.parametrize("as_frame", [False, True])
    def test_trustrank_personalization(self, spark, as_frame):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(EDGES_DANGLING, "src string, dst string")
        seeds = (
            spark.createDataFrame([("a",)], "node string") if as_frame
            else ["a", "not-in-graph"]
        )
        got = {
            r.node: r.rank
            for r in pagerank(
                df, iterations=15, tol=None, seeds=seeds
            ).collect()
        }
        want = _reference_pagerank(
            EDGES_DANGLING, iterations=15, seeds={"a"}
        )
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9), v
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        # trust flows FROM the seed: the seed outranks the sink it and
        # its neighbor both feed
        assert got["a"] > got["c"]

    def test_seeds_equal_all_nodes_is_classic(self, spark):
        df = spark.createDataFrame(EDGES_DIAMOND, "src string, dst string")
        classic = {
            r.node: r.rank
            for r in pagerank(df, iterations=12, tol=None).collect()
        }
        seeded = {
            r.node: r.rank
            for r in pagerank(
                df, iterations=12, tol=None, seeds=["a", "b", "c", "d"]
            ).collect()
        }
        for v in classic:
            assert seeded[v] == pytest.approx(classic[v], abs=1e-12)

    def test_no_seed_in_graph_raises(self, spark):
        df = spark.createDataFrame(EDGES_DIAMOND, "src string, dst string")
        with pytest.raises(ValueError, match="seed"):
            pagerank(df, seeds=["zzz"])
        # empty graph + seeds is the same misconfiguration, not an
        # empty result (r9 review finding)
        empty = spark.createDataFrame([], "src string, dst string")
        with pytest.raises(ValueError, match="seed"):
            pagerank(empty, seeds=["zzz"])

    def test_validation(self, spark):
        df = spark.createDataFrame(EDGES_DIAMOND, "src string, dst string")
        with pytest.raises(ValueError):
            pagerank(df, damping=1.5)
        with pytest.raises(ValueError):
            pagerank(df, iterations=0)


class TestDomainPagerank:
    def test_collapses_to_registered_domains(self, spark):
        rows = [
            ("http://www.a.example.com/p1", "http://b.example.org/x"),
            ("http://a.example.com/p2", "http://b.example.org/y"),
            ("http://b.example.org/x", "http://a.example.com/"),
            # intra-domain self-loop must be dropped
            ("http://a.example.com/p1", "http://sub.a.example.com/p9"),
        ]
        df = spark.createDataFrame(rows, "target_uri string, outlink string")
        got = {r.domain: r.rank for r in domain_pagerank(df, iterations=15).collect()}
        want = _reference_pagerank(
            [("example.com", "example.org"), ("example.org", "example.com")],
            iterations=15,
        )
        assert set(got) == set(want)
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=1e-9)


class TestRankPages:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "http://www.a.example.com/p1"),
                (2, "http://a.example.com/p2?q=1"),
                (3, "http://b.example.org/x"),
                (4, "http://never-linked.example.net/y"),
                (5, "not a url"),
            ],
            "doc_id long, url string",
        )

    def _ranks(self, spark):
        return spark.createDataFrame(
            [("example.com", 0.6), ("example.org", 0.4)],
            "domain string, rank double",
        )

    def test_transfers_domain_rank_to_pages(self, spark):
        from sparksearchengine_spark.operators.linkgraph import rank_pages

        out = rank_pages(self._corpus(spark), self._ranks(spark))
        got = {r.doc_id: r.domain_rank for r in out.collect()}
        assert got[1] == pytest.approx(0.6)  # www. stripped
        assert got[2] == pytest.approx(0.6)
        assert got[3] == pytest.approx(0.4)
        assert got[4] is None  # unranked -> NULL, not silent 0
        assert got[5] is None  # unparseable URL
        assert set(out.columns) == {"doc_id", "url", "domain_rank"}

    def test_default_rank_and_explicit_broadcast(self, spark):
        from sparksearchengine_spark.operators.linkgraph import rank_pages

        out = rank_pages(
            self._corpus(spark), self._ranks(spark),
            default_rank=0.0, broadcast=True,
        )
        got = {r.doc_id: r.domain_rank for r in out.collect()}
        assert got[4] == 0.0 and got[5] == 0.0 and got[1] == pytest.approx(0.6)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_shuffle_hash_fallback_builds_rank_side(self, spark):
        """broadcast=False: the rank side is the shuffle-hash BUILD side
        — the corpus relation never builds a hash table."""
        from sparksearchengine_spark.operators.linkgraph import rank_pages

        out = rank_pages(
            self._corpus(spark), self._ranks(spark), broadcast=False
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "ShuffledHashJoin" in plan
        got = {r.doc_id: r.domain_rank for r in out.collect()}
        assert got[1] == pytest.approx(0.6) and got[4] is None

    def test_validation(self, spark):
        from sparksearchengine_spark.operators.linkgraph import rank_pages

        with pytest.raises(ValueError, match="domain_ranks"):
            rank_pages(
                self._corpus(spark),
                spark.createDataFrame([("x",)], "domain string"),
            )
        with pytest.raises(ValueError, match="already exists"):
            rank_pages(
                self._corpus(spark).withColumn("domain_rank", F_lit0()),
                self._ranks(spark),
            )
        # reserved join key: silently replacing + dropping a user's
        # _lg_domain column would be data loss (r10 review)
        with pytest.raises(ValueError, match="_lg_domain"):
            rank_pages(
                self._corpus(spark).withColumn("_lg_domain", F_lit0()),
                self._ranks(spark),
            )


def F_lit0():
    from pyspark.sql import functions as F

    return F.lit(0.0)


def _reference_hits(edges, iterations=20):
    """Textbook HITS with per-step L2 normalization."""
    import math

    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    eset = set(edges)
    n = len(nodes)
    h = {v: 1.0 / math.sqrt(n) for v in nodes}
    a = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        a = {v: sum(h[s] for s, d in eset if d == v) for v in nodes}
        na = math.sqrt(sum(x * x for x in a.values())) or 1.0
        a = {v: x / na for v, x in a.items()}
        h = {v: sum(a[d] for s, d in eset if s == v) for v in nodes}
        nh = math.sqrt(sum(x * x for x in h.values())) or 1.0
        h = {v: x / nh for v, x in h.items()}
    return h, a


class TestHits:
    @pytest.mark.parametrize(
        "edges", [EDGES_DIAMOND, EDGES_DANGLING, EDGES_STAR],
        ids=["diamond", "dangling-sink", "star"],
    )
    def test_matches_reference(self, spark, edges):
        from sparksearchengine_spark.operators.linkgraph import hits

        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.node: (r.hub, r.authority)
            for r in hits(df, iterations=12, tol=None).collect()
        }
        h, a = _reference_hits(edges, iterations=12)
        assert set(got) == set(h)
        for v in h:
            assert got[v][0] == pytest.approx(h[v], abs=1e-9), ("hub", v)
            assert got[v][1] == pytest.approx(a[v], abs=1e-9), ("auth", v)

    def test_pure_hub_and_authority(self, spark):
        from sparksearchengine_spark.operators.linkgraph import hits

        # hub -> {a1, a2, a3}: hub has max hub score, authorities split
        df = spark.createDataFrame(
            [("hub", f"a{i}") for i in range(3)], "src string, dst string"
        )
        got = {r.node: (r.hub, r.authority) for r in hits(df).collect()}
        assert got["hub"][0] == pytest.approx(1.0, abs=1e-9)
        assert got["hub"][1] == pytest.approx(0.0, abs=1e-9)
        for i in range(3):
            assert got[f"a{i}"][1] == pytest.approx(
                1.0 / 3 ** 0.5, abs=1e-9
            )


class TestWeakComponents:
    def test_two_clusters_string_nodes(self, spark):
        from sparksearchengine_spark.operators.linkgraph import (
            weakly_connected_components,
        )

        edges = [
            ("a.com", "b.com"), ("b.com", "c.com"),   # cluster 1 (chain)
            ("x.org", "y.org"), ("y.org", "x.org"),   # cluster 2 (cycle)
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.node: r.component
            for r in weakly_connected_components(df).collect()
        }
        assert len(got) == 5
        c1 = {got["a.com"], got["b.com"], got["c.com"]}
        c2 = {got["x.org"], got["y.org"]}
        assert len(c1) == 1 and len(c2) == 1 and c1 != c2
        # the label is a real member node
        assert c1.pop() in {"a.com", "b.com", "c.com"}
        assert c2.pop() in {"x.org", "y.org"}

    def test_direction_ignored_and_self_loop(self, spark):
        from sparksearchengine_spark.operators.linkgraph import (
            weakly_connected_components,
        )

        df = spark.createDataFrame(
            [("p", "q"), ("r", "q"), ("s", "s")], "src string, dst string"
        )
        got = {
            r.node: r.component
            for r in weakly_connected_components(df).collect()
        }
        assert got["p"] == got["q"] == got["r"]
        assert got["s"] == "s"  # self-loop: own component


class TestDegreeStats:
    def test_degrees(self, spark):
        df = spark.createDataFrame(EDGES_DANGLING, "src string, dst string")
        got = {r.node: (r.out_degree, r.in_degree) for r in degree_stats(df).collect()}
        assert got == {"a": (2, 1), "b": (2, 1), "c": (0, 2)}


# -------------------------------------------- randomized-graph fuzz


def _reference_wcc_min_labels(edges):
    """Union-find with union-by-min: label = min node per component —
    the same canonical labeling the driver oracle uses."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        ra, rb = find(s), find(d)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {v: find(v) for v in parent}


class TestRandomGraphProperties:
    """r10 verdict #5: hypothesis fuzz on random digraphs (<= 30
    nodes, self-loops and parallel edges included) vs the pure-Python
    references above — the same discipline the phrase verifier has.
    Hand-built graphs pin known shapes; these pin the shapes nobody
    thought to build."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _EDGES = st.lists(
        st.tuples(st.integers(0, 29), st.integers(0, 29)),
        min_size=1,
        max_size=60,
    )
    _FUZZ = dict(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )

    @given(edges=_EDGES)
    @settings(**_FUZZ)
    def test_pagerank_matches_reference_and_sums_to_one(self, spark, edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.rank
            for r in pagerank(df, iterations=4, tol=None).collect()
        }
        want = _reference_pagerank(edges, iterations=4)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9), v
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    @given(edges=_EDGES)
    @settings(**_FUZZ)
    def test_hits_matches_reference(self, spark, edges):
        from sparksearchengine_spark.operators.linkgraph import hits

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: (r.hub, r.authority)
            for r in hits(df, iterations=3, tol=None).collect()
        }
        h, a = _reference_hits(edges, iterations=3)
        assert set(got) == set(h)
        for v in h:
            assert got[v][0] == pytest.approx(h[v], abs=1e-9), ("hub", v)
            assert got[v][1] == pytest.approx(a[v], abs=1e-9), ("auth", v)

    @given(edges=_EDGES)
    @settings(**_FUZZ)
    def test_wcc_labels_are_min_node_per_component(self, spark, edges):
        from pyspark.sql import functions as F
        from sparksearchengine_spark.operators.linkgraph import (
            weakly_connected_components,
        )

        df = spark.createDataFrame(edges, "src long, dst long")
        comp = weakly_connected_components(df)
        canon = comp.groupBy("component").agg(F.min("node").alias("_lbl"))
        got = {
            r.node: r._lbl
            for r in comp.join(canon, "component").collect()
        }
        assert got == _reference_wcc_min_labels(edges)

    @pytest.mark.parametrize("n", [2, 7, 30])
    def test_regular_graphs_rank_uniform(self, spark, n):
        """Closed-form invariant: on an out-regular, in-regular graph
        (directed cycle; complete digraph) the stationary vector is
        exactly uniform at EVERY iteration, so ranks = 1/n regardless
        of damping or iteration count."""
        cycle = [(i, (i + 1) % n) for i in range(n)]
        complete = [(i, j) for i in range(n) for j in range(n) if i != j]
        for edges in (cycle, complete):
            df = spark.createDataFrame(edges, "src long, dst long")
            got = pagerank(df, iterations=3, tol=None).collect()
            assert len(got) == n
            for r in got:
                assert r.rank == pytest.approx(1.0 / n, abs=1e-12)

    def test_all_dangling_mass_redistributes_uniformly(self, spark):
        """Sink-heavy invariant: in a perfect matching i -> n+i every
        target is dangling; sources and sinks each form a symmetry
        class, ranks sum to 1, and every sink outranks every source
        (it gets teleport + inflow + its dangling share)."""
        n = 6
        edges = [(i, n + i) for i in range(n)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.rank
            for r in pagerank(df, iterations=5, tol=None).collect()
        }
        want = _reference_pagerank(edges, iterations=5)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)
        src_ranks = {got[i] for i in range(n)}
        dst_ranks = {got[n + i] for i in range(n)}
        assert len(src_ranks) == 1 and len(dst_ranks) == 1
        assert dst_ranks.pop() > src_ranks.pop()
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


class TestCheckpointSurface:
    """r11 verdict #5: ensure_checkpoint_dir + loud localCheckpoint
    fallback + memoized rank_pages pin (r11 ADVICE)."""

    def test_warns_once_without_dir(self, spark, monkeypatch):
        import warnings

        from sparksearchengine_spark.operators import cache
        from sparksearchengine_spark.operators import linkgraph as lg

        if spark.sparkContext.getCheckpointDir() is not None:
            pytest.skip("session already has a checkpoint dir")
        monkeypatch.setattr(cache, "_warned_no_ckpt_dir", False)
        with pytest.warns(RuntimeWarning, match="ensure_checkpoint_dir"):
            lg._make_pin(spark)
        # once per process: the second call must be silent
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            lg._make_pin(spark)

    def test_reliable_checkpoint_when_dir_set(self, spark, tmp_path,
                                              monkeypatch):
        import os
        import warnings

        from sparksearchengine_spark.operators import linkgraph as lg
        from sparksearchengine_spark.operators.cache import (
            ensure_checkpoint_dir,
        )

        sc = spark.sparkContext
        if sc.getCheckpointDir() is not None:
            pytest.skip("session already has a checkpoint dir")
        ckpt = str(tmp_path / "ckpt")
        try:
            got = ensure_checkpoint_dir(spark, ckpt)
            # Spark normalizes to a URI and appends a per-app UUID dir
            assert "/ckpt/" in got + "/"
            # an existing dir is never overridden
            again = ensure_checkpoint_dir(spark, str(tmp_path / "other"))
            assert again == got
            # with the dir set, _make_pin is silent and writes RELIABLE
            # checkpoint files under the dir
            from sparksearchengine_spark.operators import cache

            monkeypatch.setattr(cache, "_warned_no_ckpt_dir", False)
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                pin = lg._make_pin(spark)
            df = spark.range(10).toDF("v")
            out = pin(df)
            assert out.count() == 10
            files = [
                os.path.join(r, f)
                for r, _, fs in os.walk(ckpt)
                for f in fs
            ]
            assert files, "no reliable checkpoint files written"
        finally:
            # scala-side reset: keep the session-scoped fixture's
            # behavior unchanged for tests running after this one
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(
                sc._jvm.scala.Option.apply(None)
            )
            assert sc.getCheckpointDir() is None

    def test_rank_pages_pin_memoized(self, spark):
        from pyspark.sql import functions as F

        from sparksearchengine_spark.operators import linkgraph as lg

        corpus = spark.createDataFrame(
            [(i, f"http://d{i % 3}.example/p{i}") for i in range(30)],
            "doc_id long, url string",
        )
        # a derived (grouped) rank table: no exact Catalyst rowCount,
        # so rank_pages takes the pin-then-probe path
        ranks = (
            spark.createDataFrame(
                [(f"d{i % 3}.example", float(i)) for i in range(9)],
                "domain string, rank double",
            )
            .groupBy("domain")
            .agg(F.avg("rank").alias("rank"))
        )
        lg._PIN_MEMO.clear()
        out1 = lg.rank_pages(corpus, ranks, out_col="dr").collect()
        assert len(lg._PIN_MEMO) == 1
        pinned_first = next(iter(lg._PIN_MEMO.values()))
        out2 = lg.rank_pages(corpus, ranks, out_col="dr").collect()
        # memo hit: same entry, same pinned frame object, same result
        assert len(lg._PIN_MEMO) == 1
        assert next(iter(lg._PIN_MEMO.values())) is pinned_first
        key = lambda r: r["doc_id"]  # noqa: E731
        assert sorted(out1, key=key) == sorted(out2, key=key)
        lg._PIN_MEMO.clear()
