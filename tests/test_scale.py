"""Scale-stress tier (VERDICT r3 next #4): the sf0.01 value oracle
cannot see DRIVER-SIDE size regressions (a collect that grows with the
vocabulary instead of the query). This suite runs the paths whose
failure mode is driver-side — autocomplete expansion, fuzzy expansion,
the composite engine — over a 100k-doc corpus whose NAME vocabulary is
~100k unique terms (each doc contributes a unique `u…` token), and
asserts the plan-level bounds hold where the data is big.

Marked ``scale``: deselect with ``-m 'not scale'`` when iterating.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lighthouse_spark.api.autocomplete import autocomplete
from lighthouse_spark.api.engine import SearchEngine
from lighthouse_spark.api.request import AutoCompleteRequest, SearchRequest
from lighthouse_spark.operators import expand
from lighthouse_spark.plans.indexer import FieldSpec, build_index
from lighthouse_spark.sources.claims import synthetic_claims

NOW = 1767225600.0
N_DOCS = 100_000

pytestmark = pytest.mark.scale


@pytest.fixture(scope="module")
def big(spark):
    # each doc appends a unique token u<id36> to its name → the name
    # dictionary holds ~100k terms and the 1-char prefix "u" covers
    # nearly all of them: the exact shape that melted the r3
    # driver-side expansion collect
    claims = synthetic_claims(spark, N_DOCS).withColumn(
        "name", F.concat("name", F.lit(" u"), F.conv(F.abs(F.col("doc_id")) % 10**12, 10, 36))
    ).cache()
    idx = build_index(
        claims,
        "doc_id",
        {
            "name": FieldSpec("name", positions=True),
            "title": FieldSpec("title", positions=True),
            "description": FieldSpec("description", positions=True),
            "channel": FieldSpec("channel", positions=True),
        },
        mode="simple",
    ).cache()
    idx.term_stats.count()  # materialize once for the module
    return claims, idx


def test_vocab_is_actually_large(big):
    _, idx = big
    nv = idx.term_stats.filter(F.col("field") == "name").count()
    assert nv > 90_000, nv


def test_first_keystroke_expansion_bounded(big):
    """1-char prefix over the ~100k-term dictionary: the multi-field
    expansion plan must move <= fields*(limit+heads) rows, never the
    prefix range (~100k rows here)."""
    _, idx = big
    fields = ["name", "title", "description", "channel"]
    plan = expand.prefix_expansion_plan(idx, fields, "u", [], limit=50)
    assert plan.count() <= len(fields) * 50
    out = expand.expand_prefix_with_df_fields(idx, fields, "u", [], limit=50)
    assert len(out["name"][0]) == 50  # capped, term-dict order
    assert out["name"][0] == sorted(out["name"][0])


def test_autocomplete_first_keystroke_end_to_end(big):
    _, idx = big
    res = autocomplete(idx, AutoCompleteRequest(s="u", size=10)).collect()
    assert 0 < len(res) <= 10


def test_fuzzy_expansion_capped_on_big_vocab(big):
    """AUTO d=2 expansion over the 100k-term dictionary: every
    expansion list obeys max_expansions and the per-field df map stays
    query-sized (exact terms + neighborhood), not vocabulary-sized."""
    _, idx = big
    dfm, fz = expand.fuzzy_and_df(idx, ["name"], ["u0000000x", "crypto"])
    for t, exps in fz["name"].items():
        assert len(exps) <= expand.MAX_EXPANSIONS, t
    # df map holds the query terms and the (levenshtein<=d) hits only
    assert len(dfm["name"]) <= 2 * (expand.MAX_EXPANSIONS + 1) + 2


def test_composite_search_scale_smoke(big):
    claims, idx = big
    eng = SearchEngine(idx, now_seconds=NOW)
    rows = eng.search(SearchRequest(s="interesting and amazing facts", size=25)).collect()
    assert len(rows) == 25
    rows2 = eng.search(SearchRequest(s="crypto news", size=10, nsfw=False)).collect()
    assert 0 < len(rows2) <= 10


@pytest.fixture(scope="module")
def dense(spark):
    """A dense short-identifier vocabulary: 1296 length-7 terms
    ("dup" + 2 base-36 chars + "00") that are ALL within d=2 of the
    query "dupaa00" — the code-corpus shape where the raw edit-distance
    neighborhood is ~26x the max_expansions cap."""
    import itertools

    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    toks = ["dup" + a + b + "00" for a, b in itertools.product(alpha, alpha)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], ["doc_id", "name"]
    )
    idx = build_index(df, "doc_id", {"name": FieldSpec("name")}, mode="simple").cache()
    idx.term_stats.count()
    return idx


def test_fuzzy_neighborhood_capped_in_plan(dense):
    """VERDICT r4 wrong #1: the ≤50-per-(field, term) cap must live in
    the PLAN — the driver never receives the raw neighborhood. Here
    the d=2 neighborhood of "dupaa00" is the full 1296-term
    vocabulary; the capped plan moves exactly 50 rows."""
    plan = expand.fuzzy_match_plan(dense, ["name"], ["dupaa00"], {"dupaa00": 2})
    assert plan.count() == expand.MAX_EXPANSIONS
    # and the result of the public entry points honors the same bound
    fz = expand.expand_fuzzy_fields(dense, ["name"], ["dupaa00"])
    exps = fz["name"]["dupaa00"]
    assert len(exps) == expand.MAX_EXPANSIONS
    # (ed asc, term asc): ed=0 self first, then ed=1 neighbors in order
    assert exps[0] == "dupaa00"
    assert exps[1:] == sorted(exps[1:])
    dfm, fz2 = expand.fuzzy_and_df(dense, ["name"], ["dupaa00"])
    assert fz2["name"]["dupaa00"] == exps
    assert len(dfm["name"]) <= expand.MAX_EXPANSIONS + 1


def test_fuzzy_cap_is_two_phase_window(dense):
    """Plan-shape pin: the cap is topk_per_key's skew-resilient
    two-phase row_number (a per-input-partition pre-rank then the
    k-bounded global rank), not a driver-side slice."""
    plan = expand.fuzzy_match_plan(dense, ["name"], ["dupaa00"], {"dupaa00": 2})
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert phys.count("row_number") >= 2, phys


def test_suggest_collects_one_row_per_term(dense):
    """suggest_terms moves at most one row per query term to the
    driver, and picks the highest-df in-dictionary neighbor."""
    one = expand.fuzzy_match_plan(
        dense, ["name"], ["dupaa01"], {"dupaa01": 2}, limit=1, order="suggest"
    )
    rows = one.collect()
    assert len(rows) == 1
    got = expand.suggest_terms(dense, "name", ["dupaa00", "dupaa0"])
    assert got["dupaa00"] == "dupaa00"  # exact hit suggests itself
    # absent term with a live neighborhood suggests a dictionary term
    assert got["dupaa0"] != "dupaa0"
    assert got["dupaa0"].startswith("dup")


def test_trigram_substring_at_scale(big):
    """Substring search over 100k docs through the trigram index: the
    only driver-side transfer is the query's own gram dfs (bounded by
    needle length), and the rarest-k intersection scans a small slice
    of the postings, never the corpus text."""
    from lighthouse_spark.operators import trigram

    claims, _ = big
    tri = trigram.build_trigram_index(claims, "doc_id", "title")
    tri = (tri[0].cache(), tri[1].cache())
    # a needle sliced from a real title: guaranteed hits
    body = claims.orderBy("doc_id").limit(1).collect()[0]["title"].lower()
    needle = body[: max(6, len(body) // 2)].strip()
    got = trigram.substring_search(claims, "doc_id", "title", needle, tri)
    want = claims.filter(F.lower(F.col("title")).contains(needle))
    assert got.count() == want.count() > 0
    # absent needle short-circuits to provably-empty without a job
    assert (
        trigram.substring_candidates(tri[0], tri[1], "doc_id", "zqxjkwvzzz")
        is None
    )
