"""Engine vs pure-Python oracle: BM25 scores and top-k ranking."""

from __future__ import annotations

import pytest

from lighthouse_spark.functions.analysis import tokenize_text
from lighthouse_spark.operators import search
from tests.oracle import PyIndex, topk

QUERIES = [
    "interesting and amazing facts",
    "sparklight",
    "the return license",            # stopword-heavy / skewed terms
    "getUserName parseHttpRequest",  # code identifiers
    "block max wand pruning",
    "nonexistenttermxyz",
]


@pytest.fixture(scope="module")
def pyidx(docs_pd):
    return PyIndex(docs_pd, "doc_id", {"content": "content", "path": "path"}, "code")


@pytest.mark.parametrize("q", QUERIES)
def test_match_scores_equal_oracle(index, pyidx, q):
    terms = tokenize_text(q, "code")
    got = {
        r["doc_id"]: r["score"]
        for r in search.match_terms(index, "content", terms).collect()
    }
    want = pyidx.bm25("content", terms)
    if q != "nonexistenttermxyz":
        assert want, f"vacuous oracle for {q!r} — corpus must contain these terms"
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9), d


@pytest.mark.parametrize("q", QUERIES[:4])
def test_topk_rank_identical(index, docs, pyidx, q):
    terms = tokenize_text(q, "code")
    scored = search.match_terms(index, "content", terms)
    res = search.top_k(scored, docs, "doc_id", k=10, columns=["doc_id"]).collect()
    got = [(r["doc_id"], r["score"]) for r in res]
    want = topk(pyidx.bm25("content", terms), 10)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], rel=1e-9)


def test_boost_scales_linearly(index):
    terms = ["sparklight"]
    base = {r["doc_id"]: r["score"] for r in search.match_terms(index, "content", terms).collect()}
    boosted = {
        r["doc_id"]: r["score"]
        for r in search.match_terms(index, "content", terms, boost=10.0).collect()
    }
    assert set(base) == set(boosted)
    for d in base:
        assert boosted[d] == pytest.approx(10 * base[d], rel=1e-12)


def test_multifield_bool_should_sum(index, pyidx):
    terms = tokenize_text("engine scan", "code")
    c1 = search.match_terms(index, "content", terms)
    c2 = search.match_terms(index, "path", terms, boost=4.0)
    both = search.bool_should([c1, c2])
    got = {r["doc_id"]: r["score"] for r in both.collect()}
    w1 = pyidx.bm25("content", terms)
    w2 = {d: 4.0 * s for d, s in pyidx.bm25("path", terms).items()}
    want = {d: w1.get(d, 0) + w2.get(d, 0) for d in set(w1) | set(w2)}
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)
