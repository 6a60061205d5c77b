"""Corpus-curation operators: decontamination semantics, deterministic
sampling invariance, exact stratified quotas, PII scrubbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lighthouse_spark.pipeline import curate


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight", "en", "a"),
        (2, "pack my box with five dozen liquor jugs right now", "en", "a"),
        (3, "the quick brown fox jumps over something else entirely here", "en", "b"),
        (4, "wholly unrelated text about spark shuffles and joins", "en", "b"),
        (5, "un texto distinto en otra lengua sin solapamiento aqui", "es", "a"),
    ] + [(100 + i, f"filler doc number {i} with unique words w{i} x{i} y{i} z{i}", "en", "b") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string").cache()


def test_decontaminate_removes_exact_overlaps(spark, corpus):
    ref = spark.createDataFrame(
        [(0, "benchmark answer: the quick brown fox jumps over")],
        "rid long, text string",
    )
    bad = curate.contamination(corpus, "doc_id", "text", ref, "text", n=5)
    bad_ids = {r["id"] for r in bad.collect()}
    assert bad_ids == {1, 3}  # both share the 5-gram "the quick brown fox jumps"
    clean = curate.decontaminate(corpus, "doc_id", "text", ref, "text", n=5)
    kept = {r["doc_id"] for r in clean.collect()}
    assert kept == {r["doc_id"] for r in corpus.collect()} - {1, 3}


def test_hash_sample_invariant_under_partitioning(corpus):
    a = {r["doc_id"] for r in curate.hash_sample(corpus.repartition(1), "doc_id", 0.4).collect()}
    b = {r["doc_id"] for r in curate.hash_sample(corpus.repartition(13), "doc_id", 0.4).collect()}
    assert a == b and 0 < len(a) < corpus.count()
    # salt decorrelates
    c = {r["doc_id"] for r in curate.hash_sample(corpus, "doc_id", 0.4, salt="s2").collect()}
    assert c != a


def test_stratified_sample_exact_quota(corpus):
    out = curate.stratified_sample_exact(corpus, "doc_id", ["lang", "source"], 2)
    counts = {
        (r["lang"], r["source"]): r["n"]
        for r in out.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        (r["lang"], r["source"]): r["n"]
        for r in corpus.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    for k, n in counts.items():
        assert n == min(2, sizes[k])
    # deterministic: same rows each run
    again = curate.stratified_sample_exact(corpus, "doc_id", ["lang", "source"], 2)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_pii_scrub_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.co.uk ip 192.168.0.255 call +1 415-555-0199 ssn 987-65-4321 keep the rest")],
        "id long, text string",
    )
    out = curate.pii_scrub(df, "text").collect()[0]["text"]
    assert "<EMAIL>" in out and "<IP>" in out and "<PHONE>" in out and "<SSN>" in out
    assert "a.b+c@" not in out and "192.168" not in out
    assert "415-555" not in out and "987-65-4321" not in out
    assert "keep the rest" in out
    # the '+' of an international prefix must be consumed too
    assert "+<PHONE>" not in out and "+1" not in out


def test_pii_scrub_phone_forms(spark):
    rows = [
        (1, "bare 415 555 0199 end"),
        (2, "dashed 415-555-0199 end"),
        (3, "paren (415) 555-0199 end"),
        (4, "intl +1 415 555 0199 end"),
        (5, "e164 +14155550199 end"),
        (6, "not a phone: 12345678901 end"),  # 11-digit run, no boundary fit
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["text"] for r in curate.pii_scrub(df, "text").collect()}
    for i in (1, 2, 3, 4, 5):
        assert "<PHONE>" in got[i], got[i]
        assert "555" not in got[i] and "+" not in got[i], got[i]
    assert "12345678901" in got[6]  # untouched — not a phone shape


def test_pii_scrub_bare_country_code(spark):
    """'1-415-555-0199' (country code without '+') must scrub fully —
    no '1-' residue (post-review regression guard)."""
    df = spark.createDataFrame(
        [(1, "call 1-415-555-0199 now"), (2, "or 1 415 555 0199 ok"),
         (3, "date 2024-01-15 is not a phone")],
        "id long, text string",
    )
    got = {r["id"]: r["text"] for r in curate.pii_scrub(df, "text").collect()}
    assert got[1] == "call <PHONE> now"
    assert got[2] == "or <PHONE> ok"
    assert "2024-01-15" in got[3]


def test_topk_per_key_two_phase_equals_single_window(spark):
    """The skew-resilient two-phase top-k must equal the plain window
    for any partitioning of the input (incl. a mega-key)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lighthouse_spark.operators.search import topk_per_key

    rows = [(i, "hot" if i < 5000 else f"k{i % 7}", float(i % 997)) for i in range(6000)]
    df = spark.createDataFrame(rows, "id long, key string, v double").repartition(16)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        (r["key"], r["rank"]): r["id"]
        for r in topk_per_key(df, ["key"], order, 4).collect()
    }
    w = Window.partitionBy("key").orderBy(*order)
    want = {
        (r["key"], r["rank"]): r["id"]
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 4)
        .collect()
    }
    assert got == want and len(got) == 8 * 4  # 'hot' + k0..k6
