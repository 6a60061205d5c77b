"""Phrase matching vs oracle: exact adjacency, scores, slop sanity."""

from __future__ import annotations

import pytest

from lighthouse_spark.operators import search
from tests.oracle import PyIndex

PHRASES = [
    ["interesting", "and", "amazing", "facts"],
    ["block", "max", "wand", "pruning"],
    ["license", "return"],
    ["interesting", "facts"],  # non-adjacent in the planted phrase → fewer/no hits
]


@pytest.fixture(scope="module")
def pyidx(docs_pd):
    return PyIndex(docs_pd, "doc_id", {"content": "content"}, "code")


@pytest.mark.parametrize("terms", PHRASES)
def test_phrase_equals_oracle(index, pyidx, terms):
    got = {r["doc_id"]: r["score"] for r in search.phrase(index, "content", terms).collect()}
    want = pyidx.phrase_scores("content", terms)
    if terms[0] in ("interesting", "block") and len(terms) == 4:
        assert want, f"vacuous phrase oracle for {terms}"
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9)


def test_phrase_missing_term_is_empty(index):
    assert search.phrase(index, "content", ["interesting", "zzzmissing"]).count() == 0


def test_slop_supersets_exact(index):
    exact = {r["doc_id"] for r in search.phrase(index, "content", ["interesting", "and"]).collect()}
    sloppy = {
        r["doc_id"]
        for r in search.phrase(index, "content", ["interesting", "and"], slop=3).collect()
    }
    assert exact <= sloppy


def test_phrase_requires_positions(index):
    with pytest.raises(ValueError):
        search.phrase(index, "repo", ["org0"])
