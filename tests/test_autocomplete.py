"""Autocomplete path: prefix expansion, branches, dedup, filters."""

from __future__ import annotations

import pytest

from lighthouse_spark.api.autocomplete import autocomplete, phrase_prefix
from lighthouse_spark.api.request import AutoCompleteRequest, ValidationError
from lighthouse_spark.operators import expand
from lighthouse_spark.plans.indexer import FieldSpec, build_index
from lighthouse_spark.sources.claims import synthetic_claims


@pytest.fixture(scope="module")
def claims(spark):
    return synthetic_claims(spark, 250).cache()


@pytest.fixture(scope="module")
def cindex(claims):
    return build_index(
        claims,
        "doc_id",
        {
            "name": FieldSpec("name", positions=True),
            "title": FieldSpec("title", positions=True),
            "description": FieldSpec("description", positions=True),
        },
        mode="simple",
    ).cache()


def test_expand_prefix_alphabetical_capped(cindex):
    terms = expand.expand_prefix(cindex, "name", "c", limit=3)
    assert terms == sorted(terms)
    assert len(terms) <= 3
    assert all(t.startswith("c") for t in terms)


def test_expand_prefix_empty(cindex):
    assert expand.expand_prefix(cindex, "name", "zzzz") == []
    assert expand.expand_prefix(cindex, "name", "") == []


def test_fuzzy_expansion_bounds(cindex):
    # AUTO: len<3 -> exact only
    assert expand.expand_fuzzy(cindex, "name", "of") == ["of"]
    exps = expand.expand_fuzzy(cindex, "name", "musik")  # ed<=1 of "music"
    assert "music" in exps


def test_autocomplete_prefix_matches(cindex, claims):
    res = autocomplete(cindex, AutoCompleteRequest(s="inter", size=10)).collect()
    assert res, "no suggestions for 'inter'"
    names = [r["name"] for r in res]
    assert len(names) == len(set(names)), "names not deduped"
    # every suggestion has a searchable field starting with the prefix token
    pdf = claims.toPandas().set_index("doc_id")
    for r in res:
        row = pdf.loc[r["doc_id"]]
        blob = " ".join(str(v or "") for v in (row["name"], row["title"], row["description"])).lower()
        assert "inter" in blob


def test_autocomplete_channel_branch(cindex, claims):
    res = autocomplete(cindex, AutoCompleteRequest(s="@crypto", size=10)).collect()
    pdf = claims.toPandas().set_index("doc_id")
    for r in res:
        assert pdf.loc[r["doc_id"]]["claim_type"] == "channel"


def test_autocomplete_nsfw_filter(cindex, claims):
    res = autocomplete(cindex, AutoCompleteRequest(s="cr", size=25, nsfw=False)).collect()
    pdf = claims.toPandas().set_index("doc_id")
    assert res
    for r in res:
        assert not pdf.loc[r["doc_id"]]["nsfw"]


def test_autocomplete_validation():
    with pytest.raises(ValidationError):
        AutoCompleteRequest(s="").validate()


def test_phrase_prefix_max_over_expansions(cindex):
    f = phrase_prefix(cindex, "name", ["c"], boost=1.0)
    assert f is not None
    rows = f.collect()
    assert rows
    # max-combined: single score column, one row per doc
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))


def _naive_phrase_prefix(index, field, terms, boost=1.0, slop=5, limit=50):
    """Pre-fusion reference plan: one scored subplan per expansion,
    union + per-doc max — the semantics the fused plan must preserve."""
    from pyspark.sql import functions as F

    from lighthouse_spark.operators import search

    *head, last = terms
    exps = expand.expand_prefix(index, field, last, limit)
    if not exps:
        return None
    frames = []
    for e in exps:
        if head:
            if index.fields[field].positions:
                frames.append(
                    # window mode: the fused plan's documented slop
                    # semantics (Lucene-exact lives in slop_mode="lucene",
                    # pinned separately by tests/test_sloppy.py)
                    search.phrase(
                        index, field, head + [e], boost, slop=slop, slop_mode="window"
                    )
                )
            else:
                frames.append(search.match_terms(index, field, head + [e], boost))
        else:
            frames.append(search.match_terms(index, field, [e], boost))
    u = frames[0]
    for f in frames[1:]:
        u = u.unionByName(f)
    return u.groupBy("doc_id").agg(F.max("score").alias("score"))


@pytest.mark.parametrize("query", [["c"], ["crypto", "ne"], ["interesting", "a"]])
def test_fused_phrase_prefix_equals_naive(cindex, query):
    fused = phrase_prefix(cindex, "name", query, boost=4.0)
    naive = _naive_phrase_prefix(cindex, "name", query, boost=4.0)
    assert (fused is None) == (naive is None)
    if fused is None:
        return
    a = {r["doc_id"]: round(r["score"], 9) for r in fused.collect()}
    b = {r["doc_id"]: round(r["score"], 9) for r in naive.collect()}
    assert a == b


def test_autocomplete_author_field(spark, claims):
    """author^3 nested clause (auto_complete.go:65-67): a doc whose
    ONLY match is its author value must surface."""
    from pyspark.sql import functions as F

    docs = claims.withColumn(
        "author",
        F.when(F.col("doc_id") % 7 == 0, F.lit("zebrowski films")).otherwise(F.lit("")),
    ).cache()
    idx = build_index(
        docs,
        "doc_id",
        {
            "name": FieldSpec("name", positions=True),
            "title": FieldSpec("title", positions=True),
            "author": FieldSpec("author", positions=True),
            "description": FieldSpec("description", positions=True),
        },
        mode="simple",
    ).cache()
    res = autocomplete(idx, AutoCompleteRequest(s="zebrow", size=10)).collect()
    assert res, "author-only match did not surface"
    pdf = docs.toPandas().set_index("doc_id")
    assert all(pdf.loc[r["doc_id"]]["author"] == "zebrowski films" for r in res)


def test_suggest_terms_frequency_semantics(spark):
    """"Did you mean": present term -> itself (even when a higher-df
    neighbor exists); absent term -> highest-df candidate within AUTO
    distance, ties lexicographic; out-of-range term unchanged."""
    from lighthouse_spark.operators.expand import suggest_terms
    from lighthouse_spark.plans.indexer import FieldSpec, build_index

    rows = []
    did = 0
    def add(term, n_docs):
        nonlocal did
        for _ in range(n_docs):
            rows.append((did, term)); did += 1
    add("merge", 30); add("marge", 5); add("serge", 30)  # serge ties merge on df
    add("window", 2); add("windows", 40)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(df, "doc_id", {"text": FieldSpec("text")}, mode="simple")

    got = suggest_terms(idx, "text", ["mergge", "window", "zzqqzz", "marge"])
    # absent 'mergge' (d=2): merge(30) and serge(30) tie -> lexicographic
    assert got["mergge"] == "merge"
    # present low-df 'window' keeps itself despite windows(40) at d=1
    assert got["window"] == "window"
    # present 'marge' -> itself
    assert got["marge"] == "marge"
    # nothing within distance -> unchanged
    assert got["zzqqzz"] == "zzqqzz"


def test_autocomplete_over_store_parity(spark, claims, cindex, tmp_path_factory):
    """autocomplete_over_store (bounded prefix-expansion universe ->
    flat_view_terms decode -> unchanged autocomplete) must return
    identical suggestions to the flat-index path, both branches."""
    from lighthouse_spark.api.autocomplete import autocomplete_over_store
    from lighthouse_spark.sources.store import build_and_save

    d = str(tmp_path_factory.mktemp("ac_store"))
    ci = build_and_save(
        claims,
        "doc_id",
        {
            "name": FieldSpec("name", positions=True),
            "title": FieldSpec("title", positions=True),
            "description": FieldSpec("description", positions=True),
        },
        d,
        mode="simple",
        n_shards=4,
    )
    for s in ("cr", "interesting am", "@scishow", "amazing facts ab"):
        req = AutoCompleteRequest(s=s, size=10)
        got = [
            (r["name"], r["doc_id"], round(r["score"], 9))
            for r in autocomplete_over_store(ci, req).collect()
        ]
        want = [
            (r["name"], r["doc_id"], round(r["score"], 9))
            for r in autocomplete(cindex, req).collect()
        ]
        assert got == want, s
