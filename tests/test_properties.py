"""Property-based tests (SURVEY §5.3): algebraic laws of the query DSL
checked on hypothesis-generated corpora via a pure-Python oracle.

Laws:
  (a) matchAll(ts) ⊆ matchMin(n, ts) ⊆ matchAny(ts)
  (b) not(not q) ≡ q on doc-sets
  (c) top-k of (A ∪ B) == merge of top-k(A), top-k(B) truncated to k
  (d) compiled doc-sets equal a naive Python evaluation on random corpora
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparksearchengine_spark.functions.analyzers import tokenize_py
from sparksearchengine_spark.plans.ast import Q

# small vocabulary => collisions and empty results both happen
_VOCAB = ["a", "b", "c", "dd", "ee"]
_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8)
_corpus = st.lists(_doc, min_size=1, max_size=12)
_terms = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=3, unique=True)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _index_of(spark, corpus: list[list[str]]):
    from sparksearchengine_spark import Corpus, TextOptions

    df = spark.createDataFrame(
        [(i, " ".join(doc)) for i, doc in enumerate(corpus)],
        "doc_id long, text string",
    )
    return Corpus(
        df, id_col="doc_id", text_cols={"text": TextOptions()}
    ).build_index()


def _docs(index, query) -> set[int]:
    return {r["doc_id"] for r in index.compile(query).collect()}


class TestContainmentLaws:
    @settings(**_SETTINGS)
    @given(corpus=_corpus, terms=_terms)
    def test_all_subset_min_subset_any(self, spark, corpus, terms):
        idx = _index_of(spark, corpus)
        f = Q.field("text")
        n_min = max(1, len(terms) - 1)
        s_all = _docs(idx, f.match_all(*terms))
        s_min = _docs(idx, f.match_min(n_min, *terms))
        s_any = _docs(idx, f.match_any(*terms))
        assert s_all <= s_min <= s_any
        # oracle: naive Python evaluation of matchAny / matchAll
        toksets = {i: set(doc) for i, doc in enumerate(corpus)}
        assert s_any == {i for i, ts in toksets.items() if ts & set(terms)}
        assert s_all == {i for i, ts in toksets.items() if set(terms) <= ts}

    @settings(**_SETTINGS)
    @given(corpus=_corpus, terms=_terms)
    def test_double_negation(self, spark, corpus, terms):
        idx = _index_of(spark, corpus)
        q = Q.field("text").match_any(*terms)
        # ~~q ≡ q on doc-sets (scores differ by design: ~ kills scores)
        assert _docs(idx, ~~q) == _docs(idx, q)

    @settings(**_SETTINGS)
    @given(corpus=_corpus, terms=_terms)
    def test_demorgan_on_docsets(self, spark, corpus, terms):
        idx = _index_of(spark, corpus)
        t1 = Q.field("text").match_term(terms[0])
        t2 = Q.field("text").match_term(terms[-1])
        lhs = _docs(idx, ~(t1 | t2))
        rhs = _docs(idx, ~t1 & ~t2)
        assert lhs == rhs


class TestTopKMerge:
    @settings(**_SETTINGS)
    @given(corpus=_corpus)
    def test_topk_of_union_is_merge_of_topks(self, spark, corpus):
        """(c): global top-k over A∪B == top-k of (top-k(A) ++ top-k(B))."""
        idx = _index_of(spark, corpus)
        qa = Q.field("text").match_term("a")
        qb = Q.field("text").match_term("b")
        k = 3

        def key(r):
            return (-r["score"], r["doc_id"])

        union = idx.search(qa | qb, k=k).collect()
        ra = idx.compile(qa).collect()
        rb = idx.compile(qb).collect()
        merged: dict[int, float] = {}
        for r in ra + rb:
            merged[r["doc_id"]] = merged.get(r["doc_id"], 0.0) + r["score"]
        expect = sorted(
            ({"doc_id": d, "score": s} for d, s in merged.items()),
            key=lambda r: (-r["score"], r["doc_id"]),
        )[:k]
        got = sorted(union, key=key)
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in expect]
        for g, e in zip(got, expect):
            assert g["score"] == pytest.approx(e["score"])


class TestAnalyzerProperties:
    @given(st.text(max_size=60))
    @settings(max_examples=50, deadline=None)
    def test_simple_tokens_are_normalized(self, text):
        toks = tokenize_py(text, "simple")
        import re

        for t in toks:
            # the simple analyzer emits exactly ASCII [a-z0-9]+ tokens
            assert re.fullmatch(r"[a-z0-9]+", t), t

    @given(st.text(max_size=60))
    @settings(max_examples=50, deadline=None)
    def test_idempotent_on_own_output(self, text):
        toks = tokenize_py(text, "simple")
        again = tokenize_py(" ".join(toks), "simple")
        assert again == toks


class TestChunkPackProperties:
    """Invariants of chunk_documents/pack_chunks on random corpora."""

    @given(_corpus, st.integers(2, 6), st.integers(0, 1))
    @settings(**_SETTINGS)
    def test_chunk_coverage_and_shape(self, spark, corpus, max_t, ov):
        from sparksearchengine_spark.operators.chunking import chunk_documents

        df = spark.createDataFrame(
            [(i, " ".join(doc)) for i, doc in enumerate(corpus)],
            "doc_id long, text string",
        )
        rows = chunk_documents(
            df, max_tokens=max_t, overlap=ov
        ).collect()
        stride = max_t - ov
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, doc in enumerate(corpus):
            L = len(doc)
            if L == 0:
                assert i not in by_doc
                continue
            rs = sorted(by_doc[i], key=lambda r: r["chunk_id"])
            # closed-form count; ids contiguous from 0
            import math

            want_n = 1 + math.ceil(max(L - max_t, 0) / stride)
            assert [r["chunk_id"] for r in rs] == list(range(want_n))
            # chunk c covers tokens [c*stride, c*stride + n_tokens)
            covered = set()
            for r in rs:
                start = r["chunk_id"] * stride
                assert r["n_tokens"] >= 1
                assert r["chunk_text"] == " ".join(
                    doc[start:start + r["n_tokens"]]
                )
                covered.update(range(start, start + r["n_tokens"]))
            assert covered == set(range(L))
            # only the LAST chunk may be short
            assert all(r["n_tokens"] == max_t for r in rs[:-1])

    @given(_corpus, st.integers(2, 6), st.integers(4, 9))
    @settings(**_SETTINGS)
    def test_pack_offsets_contiguous(self, spark, corpus, max_t, budget):
        from sparksearchengine_spark.operators.chunking import (
            chunk_documents, pack_chunks,
        )

        df = spark.createDataFrame(
            [(i, " ".join(doc)) for i, doc in enumerate(corpus)],
            "doc_id long, text string",
        )
        ch = chunk_documents(df, max_tokens=max_t)
        rows = sorted(
            pack_chunks(ch, budget=budget).collect(),
            key=lambda r: (r["doc_id"], r["chunk_id"]),
        )
        cum = 0
        for r in rows:
            assert r["offset"] == cum
            assert r["pack_id"] == r["offset"] // budget
            assert r["pack_offset"] == r["offset"] % budget
            cum += r["n_tokens"]


class TestQueryJoinDedupLaw:
    """dedup_queries=True is a pure optimization: for ANY query frame
    (duplicates, empty texts, token-order permutations) its rows equal
    the id path's rows exactly."""

    @given(corpus=_corpus, queries=st.lists(_doc, min_size=1, max_size=8))
    @settings(**_SETTINGS)
    def test_dedup_path_equals_id_path(self, spark, corpus, queries):
        idx = _index_of(spark, corpus)
        qdf = spark.createDataFrame(
            [(i, " ".join(q)) for i, q in enumerate(queries)],
            "qid long, qtext string",
        )
        cols = ["qid", "match_doc_id", "score", "rank"]
        kw = dict(text_col="qtext", field="text", k=3, other_id_col="qid")
        on = idx.query_join(qdf, dedup_queries=True, **kw).select(*cols)
        off = idx.query_join(qdf, dedup_queries=False, **kw).select(*cols)
        assert sorted(map(tuple, on.collect())) == sorted(
            map(tuple, off.collect())
        )


_vec = st.lists(
    st.floats(-1.0, 1.0, allow_nan=False, width=32), min_size=2, max_size=2
)


class TestClusteringLaws:
    """k-means invariants on random vector sets: every point lands in
    the cell whose centroid is truly nearest (python oracle), and one
    Lloyd step never increases the total inertia."""

    @given(vecs=st.lists(_vec, min_size=2, max_size=10))
    @settings(**_SETTINGS)
    def test_assignment_matches_python_argmin(self, spark, vecs):
        from sparksearchengine_spark.operators.clustering import (
            kmeans_assign,
        )

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        cents = [[0.0, 0.0], [1.0, 1.0]]
        got = {r["id"]: r["cell"] for r in kmeans_assign(df, cents).collect()}
        for i, v in enumerate(vecs):
            # replicate the float32 storage the Spark path reads
            import struct

            v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v]
            d = [sum((x - c) ** 2 for x, c in zip(v32, cc)) for cc in cents]
            want = d.index(min(d))
            assert got[i] == want, (i, v, d)

    @given(vecs=st.lists(_vec, min_size=2, max_size=10, unique_by=tuple))
    @settings(**_SETTINGS)
    def test_one_lloyd_step_never_increases_inertia(self, spark, vecs):
        from pyspark.sql import functions as F

        from sparksearchengine_spark.operators.clustering import (
            cluster_summary,
            default_centroids,
            kmeans_fit,
        )

        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        c0 = default_centroids(df, 2)
        i0 = cluster_summary(df, c0).agg(F.sum("inertia")).first()[0]
        c1, _ = kmeans_fit(df, 2, iters=1, centroids=c0)
        i1 = cluster_summary(df, c1).agg(F.sum("inertia")).first()[0]
        assert i1 <= i0 + 1e-9


class TestClassifierLaws:
    """The hashed linear model is additive over token multisets: the
    score of a doc equals bias + the sum of its tokens' single-token
    scores (with bias 0)."""

    @given(doc=_doc)
    @settings(**_SETTINGS)
    def test_score_is_sum_of_token_scores(self, spark, doc):
        from sparksearchengine_spark.operators.classify import (
            classifier_score,
        )

        w = [((i * 5) % 11) - 5 for i in range(16)]
        rows = [(0, " ".join(doc))] + [
            (i + 1, t) for i, t in enumerate(doc)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["id"]: r["score"]
            for r in classifier_score(df, w, bias=0).collect()
        }
        assert got[0] == sum(got[i + 1] for i in range(len(doc)))


class TestParserEscapeRoundTrip:
    """Escaping any string per Lucene QueryParser rules must parse back
    to a plain MatchText of the original string — the user-facing
    contract of r5's escape support (reference `dsl/DslQuery.scala:
    122-128` accepts the full syntax)."""

    @given(
        s=st.text(
            alphabet=st.sampled_from(
                list("abz09") + list('+-:"[]{}()^~*?\\/')
            ),
            min_size=1,
            max_size=12,
        )
    )
    @settings(**_SETTINGS)
    def test_escape_roundtrip(self, s):
        from sparksearchengine_spark.plans import ast
        from sparksearchengine_spark.plans.parser import parse_query

        specials = set('+-:"[]{}()^~*?\\/')
        escaped = "".join(("\\" + c) if c in specials else c for c in s)
        q = parse_query(escaped)
        assert q == ast.MatchText("text", s, require_all=False)


class TestRetrievalMetricLaws:
    """retrieval_metrics invariants + a pure-Python count oracle on
    hypothesis-generated result/label sets."""

    @settings(**_SETTINGS)
    @given(
        data=st.lists(  # (query, doc, score-rank seed, graded?)
            st.tuples(
                st.integers(0, 2),
                st.integers(0, 9),
                st.integers(0, 100),
                st.integers(0, 3),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_bounds_and_count_oracle(self, spark, data):
        from sparksearchengine_spark.operators.evaluate import (
            retrieval_metrics,
        )

        k = 3
        res_rows = {}
        lab_rows = {}
        for q, d, s, g in data:
            res_rows[(q, d)] = float(s)
            if g > 0:
                lab_rows[(q, d)] = float(g)
        if not lab_rows:
            lab_rows[(0, 0)] = 1.0
        res = spark.createDataFrame(
            [(q, d, s) for (q, d), s in res_rows.items()],
            "query_id long, doc_id long, score double",
        )
        labs = spark.createDataFrame(
            [(q, d, g) for (q, d), g in lab_rows.items()],
            "query_id long, doc_id long, grade double",
        )
        out = {r.query_id: r for r in retrieval_metrics(res, labs, k=k).collect()}
        # output covers exactly the labeled queries
        assert set(out) == {q for q, _ in lab_rows}
        for q, r in out.items():
            assert 0.0 <= r.ndcg <= 1.0
            assert 0.0 <= r.precision <= 1.0
            assert 0.0 <= r.recall <= 1.0
            assert 0.0 <= r.rr <= 1.0
            assert r.hits <= min(k, r.n_rel)
            # pure-Python oracle for the counting metrics
            ranked = sorted(
                ((s, d) for (qq, d), s in res_rows.items() if qq == q),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            topk = [d for _, d in ranked]
            rel = {d for (qq, d) in lab_rows if qq == q}
            hits = sum(1 for d in topk if d in rel)
            assert r.n_rel == len(rel)
            assert r.hits == hits
            first = next(
                (i + 1 for i, d in enumerate(topk) if d in rel), None
            )
            want_rr = round(1.0 / first, 6) if first else 0.0
            assert r.rr == pytest.approx(want_rr, abs=1e-9)


class TestPqLaws:
    """PQ encode/ADC vs a pure-Python oracle on random vectors."""

    @settings(**_SETTINGS)
    @given(
        vec=st.lists(
            st.floats(-2, 2, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        qv=st.lists(
            st.floats(-2, 2, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
    )
    def test_codes_and_adc_match_python(self, spark, vec, qv):
        from sparksearchengine_spark.operators.similarity import pq_topk

        cbs = [
            [[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]],
            [[2.0, 0.5], [0.0, -2.0], [0.5, 0.5]],
        ]
        items = spark.createDataFrame(
            [(1, [float(x) for x in vec])],
            "vec_id long, embedding array<double>",
        )
        queries = spark.createDataFrame(
            [(0, [float(x) for x in qv])],
            "query_id long, embedding array<double>",
        )
        got = pq_topk(items, queries, cbs, k=1).collect()[0]

        def sq(a, b):
            acc = 0.0
            for x, w in zip(a, b):
                acc += (x - w) * (x - w)
            return acc

        codes = []
        for j in range(2):
            sl = [float(x) for x in vec][j * 2 : j * 2 + 2]
            ds = [sq(sl, c) for c in cbs[j]]
            codes.append(ds.index(min(ds)))
        score = 0.0
        for j in range(2):
            qsl = [float(x) for x in qv][j * 2 : j * 2 + 2]
            c = cbs[j][codes[j]]
            acc = 0.0
            for x, w in zip(qsl, c):
                acc += x * w
            score += acc
        assert got.score == pytest.approx(score, abs=1e-9)


# --------------------------------------------------------------------------
# (e) r6: heterogeneous DSL batch == per-query search, on RANDOM query
# trees — the strongest net over batch_search_dsl's three execution
# classes (term-data / phrase-data / per-AST compile): whatever shape
# hypothesis builds, the batched rows must equal the single-query path
# bit-for-bit (6dp) including ranks.
# --------------------------------------------------------------------------

_leaf = st.one_of(
    _terms.map(lambda ts: Q.field("text").match_any(*ts)),
    _terms.map(lambda ts: Q.field("text").match_all(*ts)),
    st.sampled_from(_VOCAB).map(lambda t: Q.field("text").match_term(t)),
    st.tuples(
        st.lists(st.sampled_from(_VOCAB), min_size=2, max_size=3),
        st.integers(0, 2),
    ).map(lambda p: Q.field("text").match_phrase(" ".join(p[0]), slop=p[1])),
    st.integers(0, 12).map(
        lambda n: Q.field("text").match_term("a") & _F_gt_doc_id(n)
    ),
    # multi-term leaves (late r6: batched as data at top level,
    # compiled inside booleans — both must equal single-query search)
    st.sampled_from(_VOCAB).map(
        lambda t: Q.field("text").match_wildcard(t[0] + "*")
    ),
    st.sampled_from(_VOCAB).map(
        lambda t: Q.field("text").match_fuzzy(t, max_edits=1)
    ),
    st.sampled_from(_VOCAB).map(
        lambda t: Q.field("text").match_regex(t[0] + "[a-z0-9]*")
    ),
)


def _F_gt_doc_id(n):
    from sparksearchengine_spark.plans.ast import F_

    return F_.gt("doc_id", n)


_query = st.recursive(
    _leaf,
    lambda inner: st.one_of(
        st.tuples(inner, inner).map(lambda p: p[0] & p[1]),
        st.tuples(inner, inner).map(lambda p: p[0] | p[1]),
        st.tuples(inner, inner).map(lambda p: p[0] & ~p[1]),
    ),
    max_leaves=3,
)


class TestBatchDslEqualsSearch:
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(corpus=_corpus,
           queries=st.lists(_query, min_size=1, max_size=4))
    def test_batch_matches_per_query(self, spark, corpus, queries):
        index = _index_of(spark, corpus)
        batch = [(i, q) for i, q in enumerate(queries)]
        got: dict = {}
        for r in index.batch_search_dsl(batch, k=4).collect():
            got.setdefault(r["query_id"], set()).add(
                (r["doc_id"], round(r["score"], 6), r["rank"])
            )
        for qid, q in batch:
            want = {
                (r["doc_id"], round(r["score"], 6), r["rank"])
                for r in index.search(q, k=4).collect()
            }
            assert got.get(qid, set()) == want, f"query {qid}: {q}"


# --------------------------------------------------------------------------
# (f) r7: serde round-trip + generalized query join == per-query search,
# on RANDOM query trees — the same net as (e) stretched over the
# serialized-column path: whatever tree hypothesis builds must survive
# JSON round-trip EXACTLY (node equality) and, carried as a column
# through query_join_dsl's executor-side shape grouping, must match the
# single-query path bit-for-bit (6dp) including ranks.
# --------------------------------------------------------------------------


class TestSerdeRoundTrip:
    @settings(max_examples=50, deadline=None)
    @given(q=_query)
    def test_roundtrip_exact_and_canonical(self, q):
        from sparksearchengine_spark.plans.serde import (
            query_from_json,
            query_to_json,
        )

        s = query_to_json(q)
        back = query_from_json(s)
        assert back == q
        # canonical: serializing the round-tripped tree is byte-stable
        assert query_to_json(back) == s


class TestQueryJoinDslEqualsSearch:
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(corpus=_corpus,
           queries=st.lists(_query, min_size=1, max_size=3))
    def test_column_queries_match_per_query(self, spark, corpus, queries):
        from sparksearchengine_spark.operators.joindsl import (
            query_join_dsl,
        )
        from sparksearchengine_spark.plans.serde import query_to_json

        index = _index_of(spark, corpus)
        qdf = spark.createDataFrame(
            [(i, query_to_json(q)) for i, q in enumerate(queries)],
            "rid long, qjson string",
        )
        out = query_join_dsl(index, qdf, "qjson", k=4, other_id_col="rid")
        got: dict = {}
        for r in out.collect():
            if r["match_doc_id"] is not None:
                got.setdefault(r["rid"], set()).add(
                    (r["match_doc_id"], round(r["score"], 6), r["rank"])
                )
        for qid, q in enumerate(queries):
            want = {
                (r["doc_id"], round(r["score"], 6), r["rank"])
                for r in index.search(q, k=4).collect()
            }
            assert got.get(qid, set()) == want, f"row {qid}: {q}"


class TestDedupQueriesLaw:
    """dedup_queries=True is a pure execution-strategy switch: on any
    random tree multiset (duplicates injected by construction), results
    equal the non-dedup path bit-for-bit including ranks."""

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(corpus=_corpus,
           queries=st.lists(_query, min_size=1, max_size=2))
    def test_dedup_path_equals_plain(self, spark, corpus, queries):
        from sparksearchengine_spark.operators.joindsl import (
            query_join_dsl,
        )
        from sparksearchengine_spark.plans.serde import query_to_json

        index = _index_of(spark, corpus)
        # duplicate every tree 3x under distinct row ids
        rows = [
            (i * 10 + rep, query_to_json(q))
            for i, q in enumerate(queries)
            for rep in range(3)
        ]
        qdf = spark.createDataFrame(rows, "rid long, qjson string")

        def canon(out):
            return sorted(
                (r["rid"], r["match_doc_id"], round(r["score"], 6), r["rank"])
                for r in out.collect()
                if r["match_doc_id"] is not None
            )

        plain = query_join_dsl(index, qdf, "qjson", k=4, other_id_col="rid")
        dedup = query_join_dsl(
            index, qdf, "qjson", k=4, other_id_col="rid", dedup_queries=True
        )
        assert canon(dedup) == canon(plain)


class TestPhraseFoldLaws:
    """r8 rewrote exact-phrase verification as an array_intersect fold
    (`operators/search.py::_phrase_verify_branch`); these laws pin its
    equivalence the way the serde/dedup laws are pinned:

      (e) exact fold == greedy chain at maxspan = n-1 == brute force
      (f) greedy chain == brute-force sloppy match at any maxspan

    The mirrors below are line-for-line translations of the Column
    expressions; `test_verify_branch_matches_python` then pins the real
    Spark function against the same brute force on a seeded batch, so
    the pure-Python laws transfer to the SQL expressions."""

    # positions arrays as the index produces them: non-empty, sorted,
    # distinct (one row per (term, doc) with its position list)
    _poslist = st.lists(
        st.integers(0, 24), min_size=1, max_size=5, unique=True
    ).map(sorted)
    _poslists = st.lists(_poslist, min_size=1, max_size=4)

    @staticmethod
    def _brute(poslists, maxspan):
        # exists a strictly increasing chain p0 < p1 < ... with
        # p_i in poslists[i] and chain_end - p0 <= maxspan
        def rec(i, prev, p0):
            if i == len(poslists):
                return prev - p0 <= maxspan
            return any(
                rec(i + 1, x, p0) for x in poslists[i] if x > prev
            )

        return any(rec(1, p0, p0) for p0 in poslists[0])

    @staticmethod
    def _fold_exact(poslists):
        # array_intersect(transform(acc, p -> p+1), positions) fold
        acc = list(poslists[0])
        for nxt in poslists[1:]:
            s = set(nxt)
            acc = [p + 1 for p in acc if p + 1 in s]
        return len(acc) > 0

    @staticmethod
    def _greedy(poslists, maxspan):
        # exists p0: fold picking min(position > prev) each step, and
        # chain_end - p0 <= maxspan (a broken chain folds to None)
        for p0 in poslists[0]:
            prev = p0
            for nxt in poslists[1:]:
                cands = [x for x in nxt if x > prev]
                if not cands:
                    prev = None
                    break
                prev = min(cands)
            if prev is not None and prev - p0 <= maxspan:
                return True
        return False

    @given(poslists=_poslists)
    @settings(max_examples=300, deadline=None)
    def test_exact_fold_equals_greedy_equals_brute(self, poslists):
        n = len(poslists)
        want = self._brute(poslists, n - 1)
        assert self._fold_exact(poslists) == want
        assert self._greedy(poslists, n - 1) == want

    @given(poslists=_poslists, extra=st.integers(0, 8))
    @settings(max_examples=300, deadline=None)
    def test_greedy_equals_brute_sloppy(self, poslists, extra):
        maxspan = len(poslists) - 1 + extra
        assert self._greedy(poslists, maxspan) == self._brute(
            poslists, maxspan
        )

    def test_verify_branch_matches_python(self, spark):
        # the REAL Column expressions on a seeded batch: one joined
        # frame, one pass through _phrase_verify_branch, verdicts and
        # scores compared against the brute-force mirror per case
        import random

        from pyspark.sql import functions as F

        from sparksearchengine_spark.operators.search import (
            _phrase_verify_branch,
        )

        rng = random.Random(20250815)
        cases = []
        for qid in range(80):
            n = rng.randint(1, 4)
            poslists = [
                sorted(
                    rng.sample(range(0, 25), rng.randint(1, 5))
                )
                for _ in range(n)
            ]
            extra = rng.choice([0, 0, 0, 1, 2, 5])  # mostly exact
            cases.append((qid, poslists, n - 1 + extra))
        rows = []
        for qid, poslists, maxspan in cases:
            for qpos, positions in enumerate(poslists):
                rows.append(
                    (qid, 1, qpos, positions, 0.5 + qpos, len(poslists),
                     maxspan)
                )
        joined = spark.createDataFrame(
            rows,
            "query_id long, doc_id long, qpos int, "
            "positions array<int>, tscore double, _n int, _maxspan int",
        )
        got = {
            r["query_id"]: r["score"]
            for r in _phrase_verify_branch(joined).collect()
        }
        for qid, poslists, maxspan in cases:
            want = self._brute(poslists, maxspan)
            assert (qid in got) == want, (qid, poslists, maxspan)
            if want:  # score = fold of tscores in qpos order
                n = len(poslists)
                assert got[qid] == pytest.approx(
                    sum(0.5 + i for i in range(n))
                )


class TestCursorPaginationLaw:
    """Pagination completeness over the 6dp contract (r9 cursor-sort
    fix, generalized): for ANY score frame — including scores whose
    full-precision values are distinct but 6dp-equal — walking
    search()'s cursor pages must enumerate exactly the global result
    set, each doc once, in (round(score,6) desc, doc_id asc) order."""

    _frame = st.lists(
        st.tuples(
            st.integers(1, 40),  # doc_id (dedup below)
            st.floats(
                min_value=0.0, max_value=4.0,
                allow_nan=False, allow_infinity=False,
            ),
            # sub-6dp jitter so rounded ties with distinct full values
            # are COMMON, not lucky
            st.integers(0, 9),
        ),
        min_size=1, max_size=12,
    )

    @given(frame=_frame, k=st.integers(1, 4))
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_pages_enumerate_exactly_once_in_order(self, spark, frame, k):
        from types import SimpleNamespace

        from sparksearchengine_spark.operators.search import search

        rows = {}
        for d, s, j in frame:
            rows[d] = round(s, 5) + j * 1e-8
        data = sorted(rows.items())
        hits = spark.createDataFrame(data, "doc_id long, score double")
        idx = SimpleNamespace(compile=lambda q: hits)
        got, cursor = [], None
        for _ in range(len(data) + 2):
            page = [
                (r["doc_id"], r["score"])
                for r in search(idx, None, k=k, search_after=cursor)
                .orderBy("rank")
                .collect()
            ]
            if not page:
                break
            got.extend(page)
            cursor = (page[-1][1], page[-1][0])
        want = sorted(data, key=lambda t: (-round(t[1], 6), t[0]))
        assert got == want
