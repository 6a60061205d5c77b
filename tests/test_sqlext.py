"""MATCH() SQL surface (api/sqlext.py): rewriter grammar + scoring
parity with the DataFrame path."""

from __future__ import annotations

from pyspark.sql import functions as F

from lighthouse_spark.api.sqlext import _MATCH_RE, MatchSQL
from lighthouse_spark.functions.analysis import tokenize_text
from lighthouse_spark.operators import search
from lighthouse_spark.plans.indexer import FieldSpec, build_index
from lighthouse_spark.sources.corpus import synthetic_corpus


def test_match_regex_grammar():
    m = _MATCH_RE.search("SELECT * FROM MATCH('spark merge', 5) x")
    assert m and m.group(1) == "spark merge" and m.group(2) == "5"
    m = _MATCH_RE.search("from match('a ''quoted'' word') t")  # lowercase + escape
    assert m and m.group(1) == "a ''quoted'' word" and m.group(2) is None
    assert _MATCH_RE.search("SELECT REMATCH('x')") is None  # word boundary


def test_sql_match_parity_and_shared_view(spark):
    docs = synthetic_corpus(spark, 300).cache()
    idx = build_index(
        docs, "doc_id", {"content": FieldSpec("content")}, mode="code"
    ).cache()
    idx.postings.count()
    ms = MatchSQL(idx, "content", k_default=7)

    # parity with the DataFrame path (same scorer, same tie-break)
    terms = tokenize_text("return license", "code")
    want = [
        (r["doc_id"], round(r["score"], 6))
        for r in search.match_terms(idx, "content", terms)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(7)
        .collect()
    ]
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in ms.sql(
            spark,
            "SELECT doc_id, score FROM MATCH('return license') "
            "ORDER BY score DESC, doc_id ASC",
        ).collect()
    ]
    assert got == want and len(got) == 7

    # a repeated MATCH with the same (query, k) shares ONE view; the
    # self-join then returns k exact matches
    out = ms.sql(
        spark,
        "SELECT a.doc_id FROM MATCH('return license', 5) a "
        "JOIN MATCH('return license', 5) b ON a.doc_id = b.doc_id",
    ).collect()
    assert len(out) == 5

    # unknown term -> empty relation, statement still executes
    assert ms.sql(spark, "SELECT * FROM MATCH('zzqqxnotaterm', 3)").count() == 0


def test_match_inside_string_literal_untouched(spark):
    """MATCH(...) appearing inside an OUTER string literal is data,
    not a table factor — the rewriter must leave it verbatim."""
    from lighthouse_spark.api.sqlext import MatchSQL
    from lighthouse_spark.plans.indexer import FieldSpec, build_index
    from lighthouse_spark.sources.corpus import synthetic_corpus

    docs = synthetic_corpus(spark, 50).cache()
    idx = build_index(docs, "doc_id", {"content": FieldSpec("content")}, mode="code")
    ms = MatchSQL(idx, "content")
    row = ms.sql(
        spark,
        "SELECT 'use MATCH(''return'', 3) like this' AS hint, a.doc_id "
        "FROM MATCH('return', 3) a LIMIT 1",
    ).collect()[0]
    assert row["hint"] == "use MATCH('return', 3) like this"


def test_match_after_apostrophed_comment_rewritten(spark):
    """ADVICE r7: quote parity counted an apostrophe inside a -- / /* */
    comment, leaving a later real MATCH unrewritten. The span scanner
    must ignore comments (and \\' escapes) when classifying."""
    from lighthouse_spark.api.sqlext import MatchSQL
    from lighthouse_spark.plans.indexer import FieldSpec, build_index
    from lighthouse_spark.sources.corpus import synthetic_corpus

    docs = synthetic_corpus(spark, 50).cache()
    idx = build_index(docs, "doc_id", {"content": FieldSpec("content")}, mode="code")
    ms = MatchSQL(idx, "content")
    out = ms.sql(
        spark,
        "-- don't trip the rewriter\n"
        "SELECT a.doc_id /* it's fine */ FROM MATCH('return', 3) a",
    ).collect()
    assert len(out) == 3
    # and the temp views are dropped after the statement resolves
    assert not [t.name for t in spark.catalog.listTables() if t.name.startswith("_lh_match_")]
