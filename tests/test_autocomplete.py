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
