"""Composite /search engine vs independent Python oracle (golden set).

The golden query set covers the reference API surface (SURVEY.md §5):
single term, multi-term OR (the reference smoke query), quoted exact
phrase, @-prefixed channel intent, multi-word compressed name,
filtered variants. Ranking must be identical: (doc_id order AND
scores to 1e-9) — the "rank-identical" bar of the north_rule against
our pinned spec.
"""

from __future__ import annotations

import pytest

from lighthouse_spark.api.engine import SearchEngine
from lighthouse_spark.api.request import SearchRequest, ValidationError
from lighthouse_spark.plans.indexer import FieldSpec, build_index
from lighthouse_spark.sources.claims import synthetic_claims
from tests.oracle_composite import composite_search

NOW = 1767225600.0
N = 250


@pytest.fixture(scope="module")
def claims(spark):
    return synthetic_claims(spark, N).cache()


@pytest.fixture(scope="module")
def claims_pd(claims):
    return claims.toPandas()


@pytest.fixture(scope="module")
def engine(claims):
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
    return SearchEngine(idx, now_seconds=NOW)


GOLDEN = [
    dict(s="interesting and amazing facts"),             # reference smoke query
    dict(s="crypto"),                                     # single term
    dict(s="science tutorial"),                           # multi-term OR
    dict(s="@scishow"),                                   # @-channel intent
    dict(s="crypto news", nsfw=False, free_only=True),    # filtered
    dict(s="music daily", claim_type="file"),             # claim-type filter
    dict(s="space history", nsfw=True),                   # nsfw-only
]


def _run_engine(engine, k=25, **kw):
    req = SearchRequest(size=k, **kw)
    rows = engine.search(req).select("doc_id", "score").collect()
    return [(r["doc_id"], r["score"]) for r in rows]


@pytest.mark.parametrize("kw", GOLDEN, ids=[g["s"] for g in GOLDEN])
def test_search_rank_identical_to_oracle(engine, claims_pd, kw):
    got = _run_engine(engine, k=25, **kw)
    want = composite_search(claims_pd, now_seconds=NOW, **kw)[:25]
    assert [g[0] for g in got] == [w[0] for w in want], "rank mismatch"
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], rel=1e-9)
    assert got, f"vacuous golden query {kw}"


def test_pagination_consistent(engine):
    full = _run_engine(engine, k=20, s="crypto news")
    p1 = _run_engine(engine, k=10, s="crypto news")
    req = SearchRequest(s="crypto news", size=10, from_=10)
    p2 = [
        (r["doc_id"], r["score"])
        for r in engine.search(req).select("doc_id", "score").collect()
    ]
    assert full == p1 + p2


def test_sort_by_field(engine):
    # search.go:115: ascending=strings.Contains(sortBy, "^") — bare
    # field sorts DESC, ^field sorts ASC.
    inc = ["effective_amount"]
    req = SearchRequest(s="crypto", size=10, sort_by="effective_amount", include=inc)
    rows = engine.search(req).select("effective_amount").collect()
    vals = [r["effective_amount"] for r in rows]
    assert vals == sorted(vals, reverse=True)

    req = SearchRequest(s="crypto", size=10, sort_by="^effective_amount", include=inc)
    rows = engine.search(req).select("effective_amount").collect()
    vals = [r["effective_amount"] for r in rows]
    assert vals == sorted(vals)

    # sorting works even when the field is NOT in the projection
    req = SearchRequest(s="crypto", size=10, sort_by="^effective_amount")
    rows = engine.search(req).collect()
    assert rows and "effective_amount" not in rows[0].asDict()


def test_default_projection_is_name_claimid(engine):
    """search.go:79: the base response carries name+claimId only;
    resolve appends the fixed column set (search.go:88-90)."""
    rows = engine.search(SearchRequest(s="crypto", size=3)).collect()
    assert rows
    got = set(rows[0].asDict().keys())
    assert {"name", "claim_id", "score"} <= got
    assert "description" not in got

    rows = engine.search(SearchRequest(s="crypto", size=3, resolve=True)).collect()
    got = set(rows[0].asDict().keys())
    assert {"channel", "channel_claim_id", "title", "thumbnail_url",
            "release_time", "fee", "nsfw"} <= got

    rows = engine.search(SearchRequest(s="crypto", size=3, source=True)).collect()
    assert "description" in rows[0].asDict()


def test_quoted_phrase_is_filter(engine, claims_pd):
    # results must contain the exact phrase in >=1 searchable field
    req = SearchRequest(s='interesting "amazing facts"', size=25, source=True)
    rows = engine.search(req).collect()
    assert rows, "quoted-phrase query returned nothing"
    for r in rows:
        joined = " ".join(
            str(r[f] or "") for f in ("channel", "name", "title", "description")
        ).lower()
        assert "amazing facts" in joined


def test_validation_errors(engine):
    with pytest.raises(ValidationError):
        engine.search(SearchRequest(s="ab"))  # too short
    with pytest.raises(ValidationError):
        engine.search(SearchRequest(s="abc", size=20000))
    with pytest.raises(ValidationError):
        engine.search(SearchRequest(s="abc", from_=10000))


def test_special_rewrite_map():
    """special.go:5-41 shipped verbatim, including the upstream quirk
    that mixed-case keys never match (lookup lowercases the query but
    not the keys)."""
    from lighthouse_spark.api import special

    assert special.rewrite("Silvano Trotta") == "@SilvanoTrotta"
    assert special.rewrite("TIM POOL") == "timcast"
    assert special.rewrite("planètes 360") == "planetes360"
    # dead entries (uppercase keys) are unreachable — as in the reference
    assert special.rewrite("Alex Jones") == "Alex Jones"
    assert special.rewrite("PostMillennial") == "PostMillennial"
    assert special.rewrite("anything else") == "anything else"


def test_media_type_filter(engine):
    req = SearchRequest(s="crypto news", size=25, media_type="video",
                        include=["content_type"])
    rows = engine.search(req).select("content_type").collect()
    assert rows and all(r["content_type"].startswith("video/") for r in rows)
    # invalid media type -> match none (query.go:279-281)
    req2 = SearchRequest(s="crypto news", size=25, media_type="bogus")
    assert engine.search(req2).count() == 0


def test_related_to_branch(engine, claims_pd):
    some = claims_pd[claims_pd.claim_type == "stream"].iloc[0]
    req = SearchRequest(s="xxx", size=10, related_to=some["claim_id"],
                        include=["claim_type"])
    rows = engine.search(req).collect()
    # only streams, never the trivial empty
    assert all(r["claim_type"] == "stream" for r in rows)


def test_gate_join_never_broadcasts_docs(engine):
    """VERDICT r2 wrong #1: the structural claim_type gate must never
    carry a broadcast hint on the corpus-size docs side (at 10^12 docs
    that hint is an OOM). Every broadcast hint in the composite plan
    must wrap a driver-local relation (the clause spec rows), and the
    gate must apply as a LEFT-SEMI join with the clause frame free to
    be the build side."""
    df = engine.clause_scores(SearchRequest(s="crypto news"))
    analyzed = df._jdf.queryExecution().analyzed().toString()
    lines = analyzed.splitlines()
    saw_hint = False
    for i, ln in enumerate(lines):
        if "strategy=broadcast" in ln:
            saw_hint = True
            nxt = lines[i + 1] if i + 1 < len(lines) else ""
            assert "LocalRelation" in nxt or "LogicalRDD" in nxt, (
                f"broadcast hint over a non-local relation:\n{ln}\n{nxt}"
            )
    assert saw_hint, "expected the clause-spec broadcast to remain"
    assert "LeftSemi" in df._jdf.queryExecution().optimizedPlan().toString()


def test_quoted_phrase_filter_single_positional_scan(engine):
    """VERDICT r2 wrong #5 (minor): all (phrase × field) combinations
    of the quoted-phrase filter must share ONE positional postings
    aggregation — one shuffle on (field, doc_id) — not one subplan per
    combination (4 fields × phrases)."""
    ids = engine._exact_phrase_filter_ids('"crypto news" today')
    assert ids is not None
    import re

    # the optimized logical plan must contain exactly ONE positional
    # aggregation grouped on (field, doc_id) — r7 shape: pivoted
    # any_value(CASE WHEN term=...) columns instead of a posmap map
    # (the InMemoryRelation's embedded build plan prints its own
    # aggregate nodes, so match the (field, doc_id) grouping signature)
    opt = ids._jdf.queryExecution().optimizedPlan().toString()
    n_aggs = len(re.findall(r"Aggregate \[field#\d+, doc_id#\d+", opt))
    assert n_aggs == 1, f"expected one fused positional aggregation, saw {n_aggs}"
    # Catalyst rewrites any_value -> first in the optimized plan
    assert re.search(r"(any_value|first)\(CASE WHEN", opt)


def test_contains_clauses_opt_in(engine, claims_pd):
    """Q6 wildcard-contains: the reference ships nameContains/
    titleContains/descriptionContains commented out (query.go:40-42);
    enable_contains=True activates them with constant-score substring
    semantics — rank-identical to the extended pure-Python oracle.
    Default engines never emit contains clauses."""
    from dataclasses import replace

    eng2 = replace(engine, enable_contains=True)
    got = [
        (r["doc_id"], r["score"])
        for r in eng2.search(SearchRequest(s="crypto", size=25))
        .select("doc_id", "score").collect()
    ]
    want = composite_search(claims_pd, s="crypto", now_seconds=NOW,
                            enable_contains=True)[:25]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], rel=1e-9)
    # the clause frame carries the contains clauses only when enabled
    clauses = {r["clause"] for r in eng2.clause_scores(SearchRequest(s="crypto")).select("clause").distinct().collect()}
    assert "name-contains" in clauses or "title-contains" in clauses
    base = {r["clause"] for r in engine.clause_scores(SearchRequest(s="crypto")).select("clause").distinct().collect()}
    assert not any(c.endswith("-contains") for c in base)


def test_search_over_store_rank_identical(spark, claims, engine, tmp_path_factory):
    """search_over_store runs the UNCHANGED engine over the persisted
    compressed store (query-term block decode via flat_view_terms) —
    ranking and scores must be identical to the flat-index engine for
    the whole golden set, including the phrase / fuzzy / @-channel /
    filter paths whose terms the universe assembly must cover."""
    from lighthouse_spark.api.engine import search_over_store
    from lighthouse_spark.sources.store import build_and_save

    d = str(tmp_path_factory.mktemp("engine_store"))
    ci = build_and_save(
        claims,
        "doc_id",
        {
            f: FieldSpec(f, positions=True)
            for f in ("name", "title", "description", "channel")
        },
        d,
        mode="simple",
        n_shards=4,
    )
    for kw in GOLDEN:
        req = SearchRequest(size=25, **kw)
        got = [
            (r["doc_id"], r["score"])
            for r in search_over_store(ci, req, now_seconds=NOW)
            .select("doc_id", "score")
            .collect()
        ]
        want = _run_engine(engine, k=25, **kw)
        assert [g[0] for g in got] == [w[0] for w in want], kw
        for g, w in zip(got, want):
            assert g[1] == pytest.approx(w[1], rel=1e-9)
        assert got, kw


def test_collapsed_path_equals_clause_path(engine):
    """fused.execute_collapsed (the r7 /search hot path: one doc-level
    aggregation, gates as conditional sums, literal weight map) must
    produce the SAME per-doc query scores as the clause-shaped
    execute() pipeline for the golden requests — including docs whose
    only contributions are gated clauses (min-should-match exactness)."""
    from pyspark.sql import functions as F

    from lighthouse_spark.api import special
    from lighthouse_spark.api.request import truncate_query
    from lighthouse_spark.operators import fused

    for q in (
        "interesting and amazing facts",
        "@somechannel",
        "crypto news",
        "one",
    ):
        req = SearchRequest(s=q, size=200)
        s = special.rewrite(truncate_query(req.s))
        terms = engine._terms(s)
        engine._prefetch(s, terms)
        ms, ps = engine._clause_specs(req, s, terms)
        dfmaps = engine._df_for_specs(ms, ps)

        # clause-shaped path (execute + gate semi-join + doc agg)
        gate_df = None
        if engine._has("claim_type") and any(x.gate for x in ms + ps):
            gate_df = engine.docs.select(
                F.col(engine._id), engine._col("claim_type").alias("claim_type")
            )
        long = fused.execute(engine.index, ms, ps, dfmaps, gate_df)
        want = {
            r["doc_id"]: r["score"]
            for r in long.groupBy("doc_id").agg(F.sum("score").alias("score")).collect()
        }

        # collapsed path, gates resolved against the docs projection
        wide, gate_vals = fused.execute_collapsed(engine.index, ms, ps, dfmaps)
        ct = {
            r["doc_id"]: r["ct"]
            for r in engine.docs.select(
                F.col(engine._id).alias("doc_id"),
                engine._col("claim_type").alias("ct"),
            ).collect()
        }
        got = {}
        for r in wide.collect():
            total, candidate = 0.0, False
            if r["s_null"] is not None:
                total += r["s_null"]
                candidate = True
            for i, v in enumerate(gate_vals):
                g = r[f"s_g{i}"]
                if g is not None and ct.get(r["doc_id"]) == v:
                    total += g
                    candidate = True
            if candidate:
                got[r["doc_id"]] = total
        assert set(got) == set(want), q
        for d, sc in want.items():
            assert got[d] == pytest.approx(sc, rel=1e-9), (q, d)
