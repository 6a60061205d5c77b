"""Sloppy-phrase parity (VERDICT r2 missing #2 / next-round #6).

Pins three things:
1. the pure-Python Lucene reference against hand-computed cases from
   the published SloppyPhraseScorer semantics;
2. the Spark phrase(slop>0) path — Arrow UDF over position arrays —
   against that reference, doc for doc, on randomized corpora;
3. the DOCUMENTED divergence of the greedy ordered-window count (the
   fused autocomplete plan's expression): order-sensitivity and
   integer (not slop-weighted) counting, with a concrete witness.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from lighthouse_spark.operators import search
from lighthouse_spark.operators.sloppy import (
    greedy_window_freq,
    lucene_sloppy_freq,
    lucene_sloppy_freq_rpt,
)
from lighthouse_spark.plans.indexer import FieldSpec, build_index


def _positions(tokens: list[str], term: str) -> np.ndarray:
    return np.array([i for i, t in enumerate(tokens) if t == term], dtype=np.int64)


# ---- 1. hand-computed Lucene semantics -------------------------------------

def test_exact_adjacency_scores_full_weight():
    # "a b" in "a b": matchLength 0 → freq 1/(1+0) = 1
    assert lucene_sloppy_freq([np.array([0]), np.array([1])], slop=2) == 1.0


def test_transposed_pair_scores_one_third():
    # doc "b a", query "a b": adjusted a=1, b=-1 → matchLength 2 → 1/3
    f = lucene_sloppy_freq([np.array([1]), np.array([0])], slop=2)
    assert f == pytest.approx(1.0 / 3.0)
    # and it is a MISS when slop < 2 (order tolerance costs 2 edits)
    assert lucene_sloppy_freq([np.array([1]), np.array([0])], slop=1) == 0.0


def test_gap_costs_distance():
    # doc "a x b": b at 2, adjusted 1 → matchLength 1 → 1/2
    f = lucene_sloppy_freq([np.array([0]), np.array([2])], slop=5)
    assert f == pytest.approx(0.5)


def test_multiple_windows_accumulate():
    # doc "a b a b": two exact windows → 2.0
    f = lucene_sloppy_freq([np.array([0, 2]), np.array([1, 3])], slop=0)
    assert f == pytest.approx(2.0)


def test_greedy_window_diverges_on_order():
    """The documented autocomplete simplification: order-sensitive and
    integer-valued. 'b a' matches Lucene at slop 2 (weight 1/3) but the
    ordered window scores 0 — the pinned divergence witness."""
    pos = [np.array([1]), np.array([0])]
    assert lucene_sloppy_freq(pos, 2) > 0
    assert greedy_window_freq(pos, 2) == 0
    # and where order matches, the greedy count equals the number of
    # windows while Lucene weights them by tightness
    pos2 = [np.array([0]), np.array([2])]
    assert greedy_window_freq(pos2, 5) == 1
    assert lucene_sloppy_freq(pos2, 5) == pytest.approx(0.5)


# ---- 2. Spark phrase(slop) == reference on random corpora ------------------

@pytest.fixture(scope="module")
def slop_corpus(spark):
    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "x2", "x3"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 30))))
        for i in range(250)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    idx = build_index(
        docs, "doc_id", {"content": FieldSpec("content", positions=True)}, mode="simple"
    ).cache()
    return rows, idx


@pytest.mark.parametrize("slop", [1, 3, 5])
@pytest.mark.parametrize("terms", [["alpha", "beta"], ["alpha", "beta", "gamma"]])
def test_spark_sloppy_phrase_matches_lucene_reference(slop_corpus, slop, terms):
    rows, idx = slop_corpus
    got = {
        r["doc_id"]: r["score"]
        for r in search.phrase(idx, "content", terms, slop=slop).collect()
    }
    # independent reference: tokenize each doc, run the pure-Python
    # Lucene algorithm, then the same BM25 shape the operator applies
    n, avgdl = idx.corpus_stats()["content"]
    dfm = {}
    toks_by_doc = {}
    for i, text in rows:
        toks = text.split()
        toks_by_doc[i] = toks
        for t in set(toks):
            dfm[t] = dfm.get(t, 0) + 1
    idf_sum = sum(math.log(1 + (n - dfm[t] + 0.5) / (dfm[t] + 0.5)) for t in terms)
    want = {}
    for i, toks in toks_by_doc.items():
        freq = lucene_sloppy_freq([_positions(toks, t) for t in terms], slop)
        if freq > 0:
            dl = len(toks)
            tfn = freq * 2.2 / (freq + 1.2 * (0.25 + 0.75 * dl / avgdl))
            want[i] = idf_sum * tfn
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)
    assert want, f"vacuous slop test for {terms} slop={slop}"


def test_repeated_term_disambiguation_hand_cases():
    """The repeat-group pass (lucene_sloppy_freq_rpt), pinned against
    hand-traced cases of the published semantics: slots of the same
    term must bind DISTINCT document positions."""
    a = lucene_sloppy_freq_rpt
    # doc "a b", query "a a": only ONE 'a' occurrence → no match at
    # any slop (the naive simple algorithm would bind both slots to
    # the same position and report a spurious match)
    p_single = [np.array([0]), np.array([0])]
    assert a(p_single, 5, ["a", "a"]) == 0.0
    # doc "a a", query "a a": slot1 starts on the 2nd occurrence,
    # matchLength 0 → full weight 1
    p_pair = [np.array([0, 1]), np.array([0, 1])]
    assert a(p_pair, 0, ["a", "a"]) == pytest.approx(1.0)
    # doc "a x a", query "a a": distinct bindings (0, 2) → adjusted
    # span 1 → 1/2 at slop >= 1, miss at slop 0
    p_gap = [np.array([0, 2]), np.array([0, 2])]
    assert a(p_gap, 1, ["a", "a"]) == pytest.approx(0.5)
    assert a(p_gap, 0, ["a", "a"]) == 0.0
    # doc "new york new york", query "new york new york": one exact
    # match consuming all four slots → 1.0
    n_pos = np.array([0, 2])
    y_pos = np.array([1, 3])
    p4 = [n_pos, y_pos, n_pos, y_pos]
    assert a(p4, 0, ["new", "york", "new", "york"]) == pytest.approx(1.0)
    # repeats-present but term absent entirely → 0, no crash
    assert a([np.array([0]), np.array([], dtype=np.int64)], 3, ["a", "b"]) == 0.0


def test_rpt_reduces_to_simple_when_distinct():
    """With no repeated group the rpt variant must equal the simple
    algorithm exactly (same heap walk)."""
    rng = random.Random(7)
    for _ in range(200):
        k = rng.randint(2, 4)
        pls = [
            np.array(sorted(rng.sample(range(20), rng.randint(1, 6))), dtype=np.int64)
            for _ in range(k)
        ]
        slop = rng.randint(0, 6)
        assert lucene_sloppy_freq_rpt(pls, slop, list(range(k))) == pytest.approx(
            lucene_sloppy_freq(pls, slop)
        )


def test_rpt_monotone_in_slop():
    rng = random.Random(11)
    for _ in range(100):
        p = np.array(sorted(rng.sample(range(15), rng.randint(2, 5))), dtype=np.int64)
        q = np.array(sorted(rng.sample(range(15), rng.randint(2, 5))), dtype=np.int64)
        pls = [p, q, p]
        prev = 0.0
        for slop in range(0, 8):
            cur = lucene_sloppy_freq_rpt(pls, slop, ["a", "b", "a"])
            assert cur >= prev - 1e-12
            prev = cur


def test_spark_repeated_term_phrase_matches_rpt_reference(slop_corpus):
    """search.phrase with a repeated-term phrase now runs the
    repeat-group disambiguation (VERDICT r3 next #3) — doc-for-doc
    against the pure-Python reference."""
    rows, idx = slop_corpus
    got = {
        r["doc_id"]: r["score"]
        for r in search.phrase(idx, "content", ["alpha", "alpha"], slop=2).collect()
    }
    n, avgdl = idx.corpus_stats()["content"]
    dfm_alpha = sum(1 for _, text in rows if "alpha" in text.split())
    idf_sum = 2 * math.log(1 + (n - dfm_alpha + 0.5) / (dfm_alpha + 0.5))
    want = {}
    for i, text in rows:
        toks = text.split()
        p = _positions(toks, "alpha")
        freq = lucene_sloppy_freq_rpt([p, p], 2, ["alpha", "alpha"])
        if freq > 0:
            dl = len(toks)
            tfn = freq * 2.2 / (freq + 1.2 * (0.25 + 0.75 * dl / avgdl))
            want[i] = idf_sum * tfn
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)
    assert want, "vacuous repeated-term slop test"
    # the disambiguation is visible: docs with a single 'alpha' are out
    single = {i for i, text in rows if text.split().count("alpha") == 1}
    assert single and not (single & set(got))


# ---- 3. property-based: prefix classes are sound for ALL words -------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


@settings(max_examples=200, deadline=None)
@given(
    term=st.text(alphabet=_ALPHA, min_size=3, max_size=5),
    word=st.text(alphabet=_ALPHA, min_size=1, max_size=8),
)
def test_prefix_classes_sound_property(term, word):
    """For ANY d=1 term and ANY word: lev(word, term) <= 1 and
    len(word) >= 2 implies the word starts with one of the classes
    (the prune may only remove true negatives)."""
    from lighthouse_spark.operators.expand import lev_prefix_classes

    classes = lev_prefix_classes(term, 1)
    assert classes is not None
    if _lev(word, term) <= 1 and len(word) >= 2:
        assert any(word.startswith(c) for c in classes), (term, word)


@settings(max_examples=150, deadline=None)
@given(
    pos_a=st.lists(st.integers(0, 30), min_size=1, max_size=8, unique=True),
    pos_b=st.lists(st.integers(0, 30), min_size=1, max_size=8, unique=True),
    slop=st.integers(0, 6),
)
def test_sloppy_freq_invariants_property(pos_a, pos_b, slop):
    """Lucene sloppy freq structural invariants for a 2-term phrase:
    non-negative; zero iff no adjusted positions come within slop; each
    scored window weighs at most 1, and one window is scored per
    advance-run, so freq is bounded by the TOTAL position count — NOT
    the smaller list: a position can participate in several scored
    windows (hypothesis' witness: a=[0], b=[0,1,2] scores 1.0 + 0.5 at
    slop 1 — the exact window plus a gap window reusing the same a),
    exactly as the Lucene advance loop behaves."""
    import numpy as np

    a = np.array(sorted(pos_a))
    b = np.array(sorted(pos_b))
    f = lucene_sloppy_freq([a, b], slop)
    assert f >= 0.0
    adj_a, adj_b = a, b - 1
    min_dist = min(abs(int(x) - int(y)) for x in adj_a for y in adj_b)
    if min_dist > slop:
        assert f == 0.0
    else:
        assert f > 0.0
    assert f <= a.size + b.size + 1e-9
