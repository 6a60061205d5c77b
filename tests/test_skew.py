"""Term-frequency-skew handling (north_rule): a stopword present in
EVERY document must not create an unbounded posting group anywhere in
the build or break query exactness.

The global posting list of such a term is split along two axes:
doc-shards (the salt: bucket = xxhash(doc_id) % n_shards bounds any
term's in-shard postings by shard size) and 128-doc blocks inside a
shard (the sub-posting unit WAND skips over).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lighthouse_spark.functions import codec
from lighthouse_spark.operators import wand
from lighthouse_spark.sources.store import build_and_save


@pytest.fixture(scope="module")
def skewed(spark, tmp_path_factory):
    # 2000 docs; 'omnipresent' in every doc several times, plus a tail
    rows = [
        (i, f"omnipresent omnipresent tail{i % 50} omnipresent word{i} filler")
        for i in range(2000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    d = str(tmp_path_factory.mktemp("skew"))
    return docs, build_and_save(docs, "doc_id", {"content": "content"}, d, n_shards=8)


def test_hot_term_is_salted_across_shards(skewed):
    _, ci = skewed
    per_shard = (
        ci.postings.filter(F.col("term") == "omnipresent")
        .groupBy("shard")
        .agg(F.sum("n_docs").alias("n"))
        .collect()
    )
    counts = {r["shard"]: r["n"] for r in per_shard}
    assert len(counts) == 8, "hot term must spread over every shard"
    assert sum(counts.values()) == 2000
    # no shard holds a disproportionate share (hash salt balance)
    assert max(counts.values()) < 2 * (2000 / 8)


def test_hot_term_splits_into_blocks(skewed):
    _, ci = skewed
    blocks = ci.postings.filter(F.col("term") == "omnipresent").collect()
    # every block bounded by BLOCK_SIZE, ids strictly increasing
    for b in blocks:
        assert b["n_docs"] <= codec.BLOCK_SIZE
    n_blocks = len(blocks)
    assert n_blocks >= 2000 // codec.BLOCK_SIZE  # genuinely split


def test_query_on_hot_term_exact(skewed):
    docs, ci = skewed
    got = wand.wand_topk(ci, "content", ["omnipresent", "tail7"], k=10).collect()
    assert len(got) == 10
    # docs containing tail7 must outrank pure-stopword docs
    top_ids = [r["doc_id"] for r in got]
    tail7 = {r["doc_id"] for r in docs.filter(F.col("content").contains("tail7")).collect()}
    assert set(top_ids) <= tail7
