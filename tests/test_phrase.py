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


def test_adjacency_intersect_chain_exhaustive(spark):
    """r7 kernel swap (filter+array_contains -> hash array_intersect
    chain): exhaustive randomized equivalence against a brute-force
    Python adjacency counter, including repeated phrase terms, empty
    arrays, and a missing-term case (both old and new forms yield
    freq <= 0 there — only the >0 gate is contractual downstream)."""
    import random

    from pyspark.sql import functions as F

    from lighthouse_spark.operators.fused import _phrase_freq

    rng = random.Random(42)
    vocab = ["a", "b", "c", "d"]
    rows = []
    for i in range(300):
        posmap = {
            t: sorted(rng.sample(range(0, 25), rng.randint(0, 8)))
            for t in vocab
        }
        rows.append((i, posmap))
    df = spark.createDataFrame(rows, "id long, posmap map<string, array<int>>")

    def brute(posmap, terms):
        return sum(
            1
            for x in posmap.get(terms[0], [])
            if all((x + k) in posmap.get(t, []) for k, t in enumerate(terms))
        )

    cases = [
        ("a", "b"),
        ("a", "b", "c"),
        ("d", "d"),            # repeated term
        ("b", "a", "b"),       # repeat with gap
        ("a", "b", "c", "d"),
    ]
    for terms in cases:
        got = {
            r["id"]: r["f"]
            for r in df.select("id", _phrase_freq(terms).alias("f")).collect()
        }
        for i, posmap in rows:
            assert got[i] == brute(posmap, terms), (terms, i, posmap)

    # missing term: freq must not pass the >0 gate
    df2 = spark.createDataFrame(
        [(0, {"a": [1, 2]})], "id long, posmap map<string, array<int>>"
    )
    val = df2.select(_phrase_freq(("a", "zz")).alias("f")).collect()[0]["f"]
    assert val is None or val <= 0


def test_adjacency_chain_order_invariant(spark):
    """r8: the intersect chain starts from the rarest term (ascending
    df) — order-free under the shift convention, so every df_map
    permutation must yield identical freqs (VERDICT r7 next #3)."""
    import random

    from lighthouse_spark.operators.fused import _phrase_freq

    rng = random.Random(7)
    vocab = ["a", "b", "c"]
    rows = []
    for i in range(200):
        posmap = {
            t: sorted(rng.sample(range(0, 20), rng.randint(0, 7))) for t in vocab
        }
        rows.append((i, posmap))
    df = spark.createDataFrame(rows, "id long, posmap map<string, array<int>>")
    terms = ("a", "b", "c")
    df_maps = [
        None,
        {"a": 1, "b": 2, "c": 3},
        {"a": 3, "b": 2, "c": 1},
        {"a": 2, "b": 1, "c": 3},
        {"a": 5, "b": 5, "c": 5},  # ties -> slot-index tiebreak
    ]
    base = None
    for dm in df_maps:
        got = {
            r["id"]: r["f"]
            for r in df.select("id", _phrase_freq(terms, None, dm).alias("f")).collect()
        }
        if base is None:
            base = got
        else:
            assert got == base, dm
