"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-10 over the sf0.001 `documents`
table. ``queries()`` — one entry per implemented operator (SURVEY.md
§2), each verified against ``oracle_sql()`` by DuckDB at sf0.01.

The fulltext queries run the real engine (tokenize → inverted index →
BM25 / phrase scoring → top-k) in `simple` analyzer mode, whose
behavior is exactly `regexp_split_to_array(lower(s), '[^a-z0-9]+')` —
the contract the DuckDB oracles rely on (pinned by
tests/test_tokenizer.py::test_simple_mode_matches_sql_contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lighthouse_spark.functions.analysis import tokenize_text
from lighthouse_spark.operators import scoring, search
from lighthouse_spark.plans.indexer import FieldSpec, build_index

SF_DEFAULT = "/root/testdata/sf0.001"

# Query terms drawn from the synthetic documents vocabulary.
FLAGSHIP_Q = "spark merge window"
PHRASE_Q = ["big", "data"]
ROUND = 4


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _doc_index(spark: SparkSession, sf_dir: str, positions: bool = False):
    docs = _t(spark, sf_dir, "documents")
    idx = build_index(
        docs, "doc_id", {"text": FieldSpec("text", positions=positions)}, mode="simple"
    )
    return docs, idx


# --------------------------------------------------------------------------
# fulltext engine queries (SURVEY.md §2.3 / §2.4)
# --------------------------------------------------------------------------

def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+T1: match (OR-terms BM25) top-10, deterministic tie-break."""
    docs, idx = _doc_index(spark, sf_dir)
    terms = tokenize_text(FLAGSHIP_Q, "simple")
    scored = search.match_terms(idx, "text", terms)
    return search.top_k(scored, docs, "doc_id", k=10, columns=["doc_id"], round_score=ROUND)


def q_sql_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4.3 MATCH() SQL surface (VERDICT r6 next #8): the engine from
    plain spark.sql — the MATCH('q', k) pseudo-table rewrites to a
    lazy BM25 top-k view (api/sqlext.py), everything else is stock
    SQL. Same scoring path as bm25_topk; the oracle re-derives it."""
    from lighthouse_spark.api.sqlext import MatchSQL

    docs, idx = _doc_index(spark, sf_dir)
    docs.createOrReplaceTempView("_lh_documents_v")
    ms = MatchSQL(idx, "text")
    return ms.sql(
        spark,
        f"""
        SELECT d.doc_id AS doc_id, d.lang AS lang,
               round(m.score, {ROUND}) AS score
        FROM MATCH('{FLAGSHIP_Q}', 10) m
        JOIN _lh_documents_v d ON d.doc_id = m.doc_id
        ORDER BY score DESC, doc_id ASC
        """,
    )


def q_bm25_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+P2: BM25 with an equality filter in *filter context* — the
    filter restricts results but does NOT change corpus statistics
    (ES filter-clause semantics, query.go:256-307)."""
    docs, idx = _doc_index(spark, sf_dir)
    terms = tokenize_text(FLAGSHIP_Q, "simple")
    scored = search.match_terms(idx, "text", terms)
    filtered = docs.filter(F.col("lang") == "en")
    return search.top_k(
        scored, filtered, "doc_id", k=10, columns=["doc_id", "lang"], round_score=ROUND
    )


def q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: match_phrase — positional adjacency, Lucene phrase scoring."""
    docs, idx = _doc_index(spark, sf_dir, positions=True)
    scored = search.phrase(idx, "text", PHRASE_Q)
    return search.top_k(scored, docs, "doc_id", k=10, columns=["doc_id"], round_score=ROUND)


_BATCH_QUERIES = {
    "q1": "spark merge window",
    "q2": "the fast big",
    "q3": "hash join stream",
}


def q_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval: top-5 BM25 for MANY queries in ONE postings
    scan (query-log scoring / RAG-set building) — broadcast
    (query_id, term, idf-weight) spec, per-(query, doc) sum, row_number
    ≤ k per query."""
    docs, idx = _doc_index(spark, sf_dir)
    qs = {k: tokenize_text(v, "simple") for k, v in _BATCH_QUERIES.items()}
    out = search.batch_match_topk(idx, "text", qs, k=5)
    return out.select(
        "query_id", "doc_id", F.round("score", ROUND).alias("score"), "rank"
    ).orderBy("query_id", "rank")


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: corpus statistics (df per term) — the BM25 inputs, exposed."""
    _, idx = _doc_index(spark, sf_dir)
    return (
        idx.term_stats.select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("term"))
        .limit(20)
    )


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: per-document field length + corpus doc count join."""
    _, idx = _doc_index(spark, sf_dir)
    return idx.doc_stats.select("doc_id", F.col("dl").cast("long").alias("dl")).orderBy(
        "doc_id"
    )


# --------------------------------------------------------------------------
# relational legs (SURVEY.md §2.1/§2.2/§2.4/§2.5 on the TPC-H-ish tables)
# --------------------------------------------------------------------------

def q_ingest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S4: LEFT join + COALESCE defaults (chainquery.go:64,41-48).

    Customer ⋈ nation is the claim ⋈ publisher analogue; nation is
    small → broadcast (the plan the reference's LEFT self-join wants
    at scale)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"], "left")
        .select(
            "c_custkey",
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
            F.coalesce("c_acctbal", F.lit(1.0)).alias("acctbal"),
        )
        .orderBy("c_custkey")
    )


def q_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/A1: GROUP_CONCAT analogue (chainquery.go:63-69) — tags per
    claim becomes return-flags per order, deterministic sorted concat."""
    li = _t(spark, sf_dir, "lineitem")
    # r8 (guide §2.4): ONE range exchange instead of hash-agg exchange
    # + range exchange — RangePartitioning(l_orderkey) satisfies both
    # the aggregation's clustering and the final sort's ordering, so
    # the agg and the orderBy reuse the same shuffle (A/B'd 25% faster
    # at sf0.1, rows byte-identical).
    return (
        li.select("l_orderkey", "l_returnflag")
        .repartitionByRange(F.col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias("flags"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )


def q_topk_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2+T3: explicit sort + from/size pagination (search.go:96-116).

    offset(5).limit(10) plans as one TakeOrderedAndProject(15, offset=5)
    — per-partition top-15 heaps + driver merge; never a global
    single-partition window (from <= 9,999 bounds the heap)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(5)
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


def q_dedup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: rank-preserving dedup (auto_complete.go:126-129) — keep the
    best row per key."""
    part = _t(spark, sf_dir, "part")
    from pyspark.sql import Window

    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("p_retailprice"))
        .orderBy("p_brand")
    )


def q_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-Q11: function_score sum — log1p field_value_factor (factor
    19, func_score.go:24-42) + constant-score boost (+300
    Controlling-analogue, func_score.go:11-16)."""
    orders = _t(spark, sf_dir, "orders")
    score = (
        scoring.log1p_factor(F.col("o_totalprice"), factor=19)
        + scoring.controlling_boost(F.col("o_orderstatus"), weight=300.0, value="O")
    )
    return (
        orders.select("o_orderkey", F.round(score, ROUND).alias("score"))
        .orderBy(F.col("score").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q_gauss_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: Gaussian time-decay boost (func_score.go:44-88) with
    explicit `now` for determinism (SURVEY.md §7.4.6)."""
    ev = _t(spark, sf_dir, "events")
    now_s = 1767225600.0  # 2026-01-01T00:00:00Z
    # cast timestamp -> double keeps the microsecond fraction, matching
    # DuckDB's epoch() in the oracle.
    # (TIMESTAMP_NTZ needs an intermediate cast; session tz is UTC.)
    ts = F.col("ts").cast("timestamp").cast("double")
    score = scoring.release_time_decay(ts, now_s)
    return (
        ev.select("event_id", F.round(score, ROUND).alias("decay"))
        .orderBy(F.col("decay").desc(), F.col("event_id"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# compressed-store WAND path (M3/M4) — same oracle as bm25_topk
# --------------------------------------------------------------------------

def q_bm25_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+T1 over the REAL index format: delta+varint posting blocks →
    block-max WAND top-10. Shares bm25_topk's oracle — the compressed
    path must be value-identical to the SQL definition."""
    import tempfile

    from lighthouse_spark.operators import wand
    from lighthouse_spark.sources.store import build_and_save

    docs = _t(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="entry_wand_")
    ci = build_and_save(docs, "doc_id", {"text": FieldSpec("text")}, d + "/idx",
                        mode="simple", n_shards=8)
    terms = tokenize_text(FLAGSHIP_Q, "simple")
    out = wand.wand_topk(ci, "text", terms, k=10)
    return out.select("doc_id", F.round("score", ROUND).alias("score"))


def q_phrase_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 over the REAL index format: the query terms' compressed
    posting blocks decode (mapInPandas + codec) into the flat
    positional shape via CompressedIndex.flat_view, and search.phrase
    runs UNCHANGED against the persisted store — no flat rebuild.
    Shares phrase_topk's oracle: the decoded path must be
    value-identical to the SQL definition."""
    import tempfile

    from lighthouse_spark.sources.store import build_and_save

    docs = _t(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="entry_pstore_")
    ci = build_and_save(
        docs, "doc_id", {"text": FieldSpec("text", positions=True)},
        d + "/idx", mode="simple", n_shards=8,
    )
    view = ci.flat_view("text", PHRASE_Q)
    scored = search.phrase(view, "text", PHRASE_Q)
    return search.top_k(scored, docs, "doc_id", k=10, columns=["doc_id"], round_score=ROUND)


# --------------------------------------------------------------------------
# expansions (Q3/Q4/Q5 term-dictionary paths)
# --------------------------------------------------------------------------

def q_prefix_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: prefix expansion against the term dictionary (autocomplete's
    candidate scan), capped at 50 in term order."""
    _, idx = _doc_index(spark, sf_dir)
    return (
        idx.term_stats.filter(F.col("term").startswith("s"))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy("term")
        .limit(50)
    )


def q_fuzzy_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: fuzzy AUTO expansion — terms within levenshtein 1 of
    'spark' in the dictionary (the match-clause expansion set)."""
    _, idx = _doc_index(spark, sf_dir)
    return (
        idx.term_stats.filter(F.levenshtein(F.col("term"), F.lit("spark")) <= 1)
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy("term")
    )


_MLT_LIKE_TEXT = (
    "the the spark spark merge merge window join join join table scan https https"
)


def q_fuzzy_expand_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 at the AUTO d=2 tier, through the REAL expansion operator
    (length band; partition-pruned dictionary leg when an index ships
    one — see store.save_term_dict): closest <=50 dictionary terms
    within edit distance 2 of 'sart', ordered (ed, term)."""
    from lighthouse_spark.operators import expand

    _, idx = _doc_index(spark, sf_dir)
    exps = expand.expand_fuzzy_all(idx, "text", ["sart"], max_edits=2)["sart"]
    # the operator's Lucene-style absent-term fallback returns the
    # query term itself even when out-of-dictionary; the oracle ranks
    # dictionary terms only, so mirror that here
    dfm = idx.term_stats.filter(
        (F.col("field") == "text") & F.col("term").isin(exps)
    ).select("term").collect()
    present = {r["term"] for r in dfm}
    ranked = [t for t in exps if t in present]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(ranked)] or [], "rank int, term string"
    )


def q_fuzzy_expand_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 fuzzy AUTO at BOTH tiers in one checked frame: tier d1 =
    dictionary terms within edit 1 of 'spark' (v = df); tier d2 = the
    plan-capped ≤50 closest terms within edit 2 of 'sart' through the
    real expansion operator (v = rank). Consolidated in r6 for the
    50-row CORRECTNESS budget."""
    d1 = q_fuzzy_expand(spark, sf_dir).select(
        F.lit("d1").alias("tier"), "term", F.col("df").cast("long").alias("v"))
    d2 = q_fuzzy_expand_d2(spark, sf_dir).select(
        F.lit("d2").alias("tier"), "term", F.col("rank").cast("long").alias("v"))
    return d1.unionByName(d2).orderBy("tier", "term")


def q_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6's scale path: substring search through the character-trigram
    index (operators/trigram.py; Cox 2012 / Zoekt design) — the
    reference ships its wildcard contains clauses disabled because ES
    serves them with a full stored-field scan (query.go:39-41). The
    needle spans a word boundary, which no term index can serve; the
    rarest-k gram intersection prunes candidates, contains() verifies
    exactly."""
    from lighthouse_spark.operators import trigram

    docs = _t(spark, sf_dir, "documents")
    tri = trigram.build_trigram_index(docs, "doc_id", "text")
    return (
        trigram.substring_search(docs, "doc_id", "text", "fast merge", tri)
        .select("doc_id")
        .orderBy("doc_id")
    )


def q_regex_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex search over the trigram index: required literal runs are
    extracted from the pattern (conservative sre walk), their rarest
    grams prune candidates, rlike() verifies exactly — Google Code
    Search's plan, Spark-first."""
    from lighthouse_spark.operators import trigram

    docs = _t(spark, sf_dir, "documents")
    tri = trigram.build_trigram_index(docs, "doc_id", "text")
    return (
        trigram.regex_search(docs, "doc_id", "text", "customer [a-z]+ query", tri)
        .select("doc_id")
        .orderBy("doc_id")
    )


def q_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Did you mean": ES term-suggester / Lucene DirectSpellChecker
    frequency semantics — present terms suggest themselves, absent
    terms the highest-df dictionary term within AUTO edit distance
    (ties lexicographic), out-of-range terms pass through."""
    from lighthouse_spark.operators import expand

    _, idx = _doc_index(spark, sf_dir)
    qterms = ["mergge", "sparkk", "window", "zzqqzz"]
    got = expand.suggest_terms(idx, "text", qterms)
    return spark.createDataFrame(
        sorted(got.items()), "qterm string, suggestion string"
    )


def q_mlt_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: more-like-this term selection — top tf·idf like-terms under
    ES's default min_term_freq=2 / min_doc_freq=5 gates (query.go:106-121
    inherits both defaults by not overriding them)."""
    _, idx = _doc_index(spark, sf_dir)
    like = tokenize_text(_MLT_LIKE_TEXT, "simple")
    from lighthouse_spark.operators import expand

    sel = expand.mlt_terms(idx, "text", like, max_terms=5)
    return spark.createDataFrame([(t,) for t in sel], "term string")


# --------------------------------------------------------------------------
# pipeline operators (dedup / ANN / text analysis)
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lighthouse_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", "text").orderBy("doc_id")


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lighthouse_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.2).orderBy(
        "id_a", "id_b"
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH candidates, exact-verified. Oracle = the exact
    Jaccard pair set (dedup_jaccard's SQL with the same parameters):
    every emitted pair is sound by construction (exact verify), and
    oracle equality additionally asserts FULL RECALL of the 16x4
    banding on this corpus — strictly stronger than the r1 rows-only
    check."""
    from lighthouse_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return dedup.minhash_lsh_pairs(docs, "doc_id", "text", n=5, threshold=0.2).orderBy(
        "id_a", "id_b"
    )


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS via star edges + min-label propagation
    (the mega-dup-group path: O(corpus) rows where the pair list is
    O(m²)). Oracle = connected components of the exact-Jaccard pair
    graph (recursive CTE). Star-edge components are in general a
    REFINEMENT of pair-graph components (a bucket rep can miss the
    threshold a member pair clears — see lsh_dedup_groups docstring);
    this check pins that on THIS corpus the two coincide, i.e. its
    duplicate groups are near-cliques where the relaxation is exact —
    a data property the fixed driver fixture makes a stable gate."""
    from lighthouse_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return dedup.lsh_dedup_groups(docs, "doc_id", "text", n=5, threshold=0.2).orderBy("id")


_SIMHASH_BITS = 60       # 15 sha256 hex chars — identical in Spark and DuckDB
_SIMHASH_MAX_H = 6       # banding uses max_hamming+1 chunks (pigeonhole-complete)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with radius-complete banding
    (max_hamming+1 chunks) over a sha2-based 60-bit fingerprint, which
    DuckDB recomputes bit-for-bit — a full rows+schema+hash oracle
    instead of the r1 rows-only check (r1 also declared max_hamming=16
    over 4-chunk banding, whose candidates are only complete to 3)."""
    from lighthouse_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return (
        dedup.simhash_pairs(
            docs,
            "doc_id",
            "text",
            max_hamming=_SIMHASH_MAX_H,
            bits=_SIMHASH_BITS,
            token_hash=dedup.sha2_token_hash,
        )
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("id_a", "id_b")
    )


_ANN_QUERY = [((i * 2654435761) % 1000) / 1000.0 - 0.5 for i in range(64)]


def _det_mat(rows: int, dim: int, shift: int) -> list[list[float]]:
    """Deterministic pseudo-random matrix in [-0.5, 0.5) — shared
    verbatim by the Spark entries and their SQL oracles."""
    return [
        [((((r * 73 + i * 149 + shift) * 2654435761) % 1000) / 1000.0 - 0.5)
         for i in range(dim)]
        for r in range(rows)
    ]


_LSH_PLANES = _det_mat(8, 64, shift=7)
_IVF_CENTROIDS = _det_mat(16, 64, shift=101)


# --------------------------------------------------------------------------
# corpus curation: decontamination / deterministic sampling / PII scrub
# --------------------------------------------------------------------------

def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination audit: corpus docs (doc_id >= 15)
    sharing >=1 word 5-gram with the 'test set' (doc_id < 15), with
    shared-shingle counts. The cleaned-corpus variant is an anti-join
    on these ids (curate.decontaminate)."""
    from lighthouse_spark.pipeline import curate

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") >= 15)
    ref = docs.filter(F.col("doc_id") < 15)
    return (
        curate.contamination(corpus, "doc_id", "text", ref, "text", n=5)
        .select(F.col("id").alias("doc_id"), "shared_ngrams")
        .orderBy("doc_id")
    )


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sample (sha256 unit hash < 0.2): the
    same rows survive at any parallelism / engine — unlike
    df.sample(), which is seed+partitioning dependent."""
    from lighthouse_spark.pipeline import curate

    docs = _t(spark, sf_dir, "documents")
    return curate.hash_sample(docs, "doc_id", 0.2).select("doc_id").orderBy("doc_id")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 docs per (lang, source) stratum by deterministic hash
    order — the reproducible data-mixing primitive."""
    from lighthouse_spark.pipeline import curate

    docs = _t(spark, sf_dir, "documents")
    return (
        curate.stratified_sample_exact(docs, "doc_id", ["lang", "source"], 3)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: emails/IPv4/phones/SSNs replaced with typed
    placeholders; PII is synthesized into each doc so the operator has
    something to scrub, and the value check compares sha256 of the
    scrubbed text (patterns restricted to the Java∩RE2 regex dialect
    so both engines rewrite byte-identically)."""
    from lighthouse_spark.pipeline import curate

    docs = _t(spark, sf_dir, "documents")
    dirty = docs.withColumn("text", F.concat(F.col("text"), _pii_suffix_spark()))
    return (
        curate.pii_scrub(dirty, "text")
        .select("doc_id", F.sha2(F.col("text"), 256).alias("scrub_sha"))
        .orderBy("doc_id")
    )


def _pii_suffix_spark():
    d = F.col("doc_id")
    return F.concat(
        F.lit(" reach me: user"), d.cast("string"),
        F.lit("@mail.example.com or 10.42."), (d % 200).cast("string"),
        F.lit(".7 call +1 415 555 0111 ssn 123-45-6789"),
    )


def q_curation_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four curation primitives in ONE value-checked frame
    (decontaminate / hash_sample / stratified_sample / pii_scrub,
    op-tagged) — consolidated in r6 so the driver's 50-row
    CORRECTNESS budget covers every operator (r5 exposed 54 entries
    and the artifact truncated at 50, dropping exactly these four)."""
    dec = q_decontaminate(spark, sf_dir).select(
        F.lit("decontaminate").alias("op"), "doc_id",
        F.col("shared_ngrams").cast("string").alias("v"))
    hs = q_hash_sample(spark, sf_dir).select(
        F.lit("hash_sample").alias("op"), "doc_id", F.lit("").alias("v"))
    st = q_stratified_sample(spark, sf_dir).select(
        F.lit("stratified_sample").alias("op"), "doc_id",
        F.concat_ws("/", "lang", "source").alias("v"))
    pi = q_pii_scrub(spark, sf_dir).select(
        F.lit("pii_scrub").alias("op"), "doc_id", F.col("scrub_sha").alias("v"))
    return (
        dec.unionByName(hs).unionByName(st).unionByName(pi)
        .orderBy("op", "doc_id")
    )


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lighthouse_spark.pipeline import ann

    emb = _t(spark, sf_dir, "embeddings")
    return ann.brute_force_topk(emb, "vec_id", "embedding", _ANN_QUERY, k=10)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH buckets + multi-probe
    (1-bit flips), exact cosine inside probed buckets. The oracle
    recomputes the identical bucketing in SQL (plane matrix embedded
    as literals), so the check is exact-within-probed-buckets — the
    right oracle for near-random test embeddings where absolute-recall
    assertions are meaningless."""
    import numpy as np

    from lighthouse_spark.pipeline import ann

    emb = _t(spark, sf_dir, "embeddings")
    mat = np.array(_LSH_PLANES)
    bucketed, _ = ann.lsh_bucketize(emb, "vec_id", "embedding", planes_mat=mat)
    return ann.lsh_topk(
        bucketed, mat, "vec_id", "embedding", _ANN_QUERY, k=10, nprobe_bits=1
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: IVF — coarse-quantize to nearest centroid, scan
    only the nprobe closest lists (partition-prunable when persisted
    partitioned by list_id). Deterministic centroid matrix so the SQL
    oracle recomputes the same assignment; the fitted-KMeans quantizer
    (ivf_build) is pytest-covered."""
    import numpy as np

    from lighthouse_spark.pipeline import ann

    emb = _t(spark, sf_dir, "embeddings")
    cents = np.array(_IVF_CENTROIDS)
    indexed = ann.ivf_assign(emb, "vec_id", "embedding", cents)
    return ann.ivf_topk(
        indexed, cents, "vec_id", "embedding", _ANN_QUERY, k=10, nprobe=3
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lighthouse_spark.pipeline import dedup

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return dedup.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.2, brute_force=True
    ).orderBy("id_a", "id_b")


_EMB_LSH_PLANES = [_det_mat(8, 64, shift=211), _det_mat(8, 64, shift=307)]


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BUCKETED scale path of embedding near-dup (hyperplane sign
    buckets, 2 probes, exact cosine verify inside buckets) with pinned
    plane matrices — the SQL oracle recomputes the identical bucketing,
    fully checking the emitted pair set (r1 left this path pytest-only)."""
    import numpy as np

    from lighthouse_spark.pipeline import dedup

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return dedup.embedding_near_dup_pairs(
        emb,
        "vec_id",
        "embedding",
        threshold=0.2,
        planes_mats=[np.array(m) for m in _EMB_LSH_PLANES],
    ).orderBy("id_a", "id_b")


def q_embedding_neardup_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup BOTH paths in one checked frame: brute-force
    all-pairs cosine and the LSH sign-bucket scale path (variant-
    tagged). Consolidated in r6 for the 50-row CORRECTNESS budget."""
    br = q_embedding_neardup(spark, sf_dir).select(
        F.lit("brute").alias("variant"), "id_a", "id_b", "cosine")
    ls = q_embedding_neardup_lsh(spark, sf_dir).select(
        F.lit("lsh").alias("variant"), "id_a", "id_b", "cosine")
    return br.unionByName(ls).orderBy("variant", "id_a", "id_b")


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lighthouse_spark.pipeline import text as T

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.lang_id("text").alias("lang_guess"),
        T.whitespace_token_count("text").alias("ws_tokens"),
        T.bpe_ish_token_count("text").alias("bpe_tokens"),
        T.quality_score("text").alias("quality"),
        T.fingerprint_sha("text").alias("fingerprint"),
    ).orderBy("doc_id")


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup accounting (Lee et al. 2021): per doc, the
    count of token-8-gram windows shared with >=2 documents and the
    overlap-exact fraction of token positions those spans cover — the
    quantity a span-removal pass would delete."""
    from lighthouse_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents")
    return dedup.duplicated_span_coverage(
        docs, "doc_id", "text", k=8, min_docs=2
    ).orderBy("doc_id")


def q_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-removal pass (Lee et al. 2021, second half): global
    keep-first over every cross-doc duplicated 8-gram, token positions
    of all other occurrences dropped, text rebuilt from the survivors.
    Compared by sha256 of the cleaned text."""
    from lighthouse_spark.pipeline import dedup

    docs = _t(spark, sf_dir, "documents")
    out = dedup.strip_duplicated_spans(docs, "doc_id", "text", k=8, min_docs=2)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.sha2(F.col("clean_text"), 256).alias("clean_sha"),
    ).orderBy("doc_id")


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filter (Rae et al. 2021 §A1.1): duplicate
    line/paragraph fractions (pure column math, no shuffle), top-{2,3,4}
    / dup-{5,6,7} n-gram character fractions (ONE explode + ONE
    grouped count for all n), and the published keep verdict."""
    from lighthouse_spark.pipeline import text as T

    docs = _t(spark, sf_dir, "documents")
    return T.gopher_repetition_filter(docs, "doc_id", "text").orderBy("doc_id")


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-curation flow a training-data pipeline runs
    end-to-end: PII scrub -> Gopher repetition gate -> exact dedup on
    the scrubbed text (min-id winner) -> per-language survivor summary.
    One entry proving the pipeline operators COMPOSE under a single
    oracle, not just pass in isolation."""
    from lighthouse_spark.pipeline import curate, dedup
    from lighthouse_spark.pipeline import text as T

    docs = _t(spark, sf_dir, "documents")
    scrub = curate.pii_scrub(docs, "text")
    kept_ids = (
        T.gopher_repetition_filter(scrub, "doc_id", "text")
        .filter(F.col("keep"))
        .select("doc_id")
    )
    kept = scrub.join(kept_ids, on="doc_id", how="left_semi")
    final = dedup.exact_dedup_keep(kept, "doc_id", "text")
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(T.tokens_simple("text"))).cast("long").alias("n_tokens"),
        )
        .orderBy("lang")
    )


def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lighthouse_spark.pipeline import text as T

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.size(T.winnowing_fingerprints("text", 5, 4)).alias("n_fp"),
        F.element_at(T.winnowing_fingerprints("text", 5, 4), 1).alias("first_fp"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# relational / streaming-analogue legs
# --------------------------------------------------------------------------

def q_bool_should(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8+Q9: bool SHOULD score_mode=sum — match(text) + 2x phrase
    boost summed per doc (the composite scoring shape, query.go:22-71)."""
    docs, idx = _doc_index(spark, sf_dir, positions=True)
    terms = tokenize_text(FLAGSHIP_Q, "simple")
    c1 = search.match_terms(idx, "text", terms)
    c2 = search.phrase(idx, "text", PHRASE_Q, boost=2.0)
    both = search.bool_should([c1, c2])
    return search.top_k(both, docs, "doc_id", k=15, columns=["doc_id"], round_score=ROUND)


def q_autocomplete_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 scoring path: single-token prefix 'sp' expanded against the
    term dictionary (<=50, alphabetical), per-doc score = MAX over
    expansions' BM25 (auto_complete.go:58-70 semantics), top 10."""
    from lighthouse_spark.api.autocomplete import phrase_prefix

    docs, idx = _doc_index(spark, sf_dir)
    scored = phrase_prefix(idx, "text", ["sp"], boost=1.0)
    if scored is None:
        return spark.createDataFrame([], "doc_id long, score double")
    return search.top_k(scored, docs, "doc_id", k=10, columns=["doc_id"], round_score=ROUND)


def q_autocomplete_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 over the REAL index format: the same 'sp' prefix expansion,
    but the postings come from the persisted compressed store via the
    bounded flat_view_terms decode (api.autocomplete's
    autocomplete_over_store universe assembly). Shares
    autocomplete_prefix's oracle."""
    import tempfile

    from lighthouse_spark.api.autocomplete import phrase_prefix
    from lighthouse_spark.operators.expand import expand_prefix_with_df_fields
    from lighthouse_spark.sources.store import build_and_save

    docs = _t(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="entry_acstore_")
    ci = build_and_save(
        docs, "doc_id", {"text": FieldSpec("text", positions=True)},
        d + "/idx", mode="simple", n_shards=8,
    )
    exps, _ = expand_prefix_with_df_fields(ci, ["text"], "sp", [])["text"]
    view = ci.flat_view("text", exps)
    scored = phrase_prefix(view, "text", ["sp"], boost=1.0)
    if scored is None:
        return spark.createDataFrame([], "doc_id long, score double")
    return search.top_k(scored, docs, "doc_id", k=10, columns=["doc_id"], round_score=ROUND)


# --------------------------------------------------------------------------
# composite /search E2E (Q1+Q2+Q8-Q14 in one tree; VERDICT r2 missing #1)
# --------------------------------------------------------------------------

_COMPOSITE_NOW = 1767225600.0  # 2026-01-01T00:00:00Z
_COMPOSITE_Q = "order value"        # phrase-active (a real name bigram)
# MIME spread for the derived claims' content_type (index = doc_id % 7);
# families cover P4's prefixes plus both CAD special types (P4 cad leg)
_CLAIMS_MIMES = [
    "video/mp4", "audio/mpeg", "text/plain", "application/json",
    "image/png", "SKP", "simplify3d_stl",
]
_COMPOSITE_MLT_Q = "spark data spark"  # repeated term → MLT-active
# derived claims columns: deterministic pure functions of (doc_id,
# text, source) that BOTH engines compute bit-identically
_CLAIMS_SLICES = {  # 1-based inclusive token ranges of the text
    "name": (1, 5),
    "title": (4, 12),
    "description": (10, 30),
}


def _claims_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A claims-shaped table derived deterministically from `documents`
    — name/title/description are token slices of the text, channel is
    the source, and every boost/filter attribute is integer arithmetic
    on doc_id (reproduced verbatim in the DuckDB oracle)."""
    from lighthouse_spark.functions.analysis import tokens_col

    docs = _t(spark, sf_dir, "documents")
    t = tokens_col("text", "simple")
    d = F.col("doc_id")
    return docs.select(
        d.alias("doc_id"),
        *[
            F.array_join(F.slice(t, lo, hi - lo + 1), " ").alias(f)
            for f, (lo, hi) in _CLAIMS_SLICES.items()
        ],
        F.concat(F.lit("@"), F.col("source")).alias("channel"),
        F.when(d % 5 == 0, "channel").otherwise("stream").alias("claim_type"),
        F.when(d % 7 == 0, "Controlling")
        .when(d % 7 == 1, "Expired")
        .otherwise("Accepted")
        .alias("bid_state"),
        (d % 1000).cast("double").alias("effective_amount"),
        (d % 500).cast("double").alias("certificate_amount"),
        F.when(d % 3 == 0, "").otherwise("http://thumb").alias("thumbnail_url"),
        (d * 13 % 10000).cast("double").alias("view_cnt"),
        (d * 7 % 3000).cast("double").alias("sub_cnt"),
        (d % 40).alias("claim_cnt"),
        (F.lit(1735689600.0) + (d * 97 % 34560000)).alias("release_time"),
        F.when(d % 4 == 0, 0.0).otherwise(1.5).alias("fee"),
        (d % 11 == 0).alias("nsfw"),
        # filter-matrix attributes (P3-P6/P8/P9): a deterministic MIME
        # spread covering every media family incl. the cad specials,
        # tag arrays that can flag a doc nsfw independently of the
        # boolean, and channel/claim ids — all doc_id arithmetic,
        # mirrored verbatim in the DuckDB oracle
        F.element_at(
            F.array(*[F.lit(m) for m in _CLAIMS_MIMES]), (d % 7 + 1).cast("int")
        ).alias("content_type"),
        F.when(d % 13 == 0, F.array(F.lit("porn"), F.lit("music")))
        .otherwise(F.array(F.lit("music")))
        .alias("tags"),
        F.concat(F.lit("ch"), (d % 5).cast("string")).alias("channel_claim_id"),
        F.concat(F.lit("cl"), d.cast("string")).alias("claim_id"),
    )


def _composite(
    spark: SparkSession, sf_dir: str, s: str, req_kwargs: dict | None = None
) -> DataFrame:
    """Run the REAL engine.search() — the full 11-clause function_score
    tree (query.go:21-71) — over the derived claims table.
    ``req_kwargs`` forwards filter params (nsfw/media_type/free_only/
    claim_type/channel_id/content_type/...) into the SearchRequest."""
    from lighthouse_spark.api.engine import SearchEngine
    from lighthouse_spark.api.request import SearchRequest

    claims = _claims_from_documents(spark, sf_dir)
    idx = build_index(
        claims,
        "doc_id",
        {
            f: FieldSpec(f, positions=True)
            for f in ("name", "title", "description", "channel")
        },
        mode="simple",
    )
    eng = SearchEngine(idx, now_seconds=_COMPOSITE_NOW)
    out = eng.search(
        SearchRequest(s=s, size=25, **(req_kwargs or {})), round_score=ROUND
    )
    return out.select("doc_id", "score")


def q_composite_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship user path E2E: MLT + match/phrase/fuzzy clauses +
    claim_type gates + bool-sum + bid_state filter + the 7 boosts +
    4 gauss decays + top-k (query.go:21-71, func_score.go)."""
    return _composite(spark, sf_dir, _COMPOSITE_Q)


def q_composite_search_mlt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same tree with a repeated query term, so the more_like_this leg
    (min_term_freq=2) actively selects terms (query.go:106-121)."""
    return _composite(spark, sf_dir, _COMPOSITE_MLT_Q)


# filter-matrix configs (VERDICT r4 next #4): the P3-P6/P9 families
# swept THROUGH SearchEngine.search against the full-scoring oracle.
_FILTER_MEDIA = dict(nsfw=False, media_type="video,cad", free_only=True)
_FILTER_TYPED = dict(
    nsfw=True,
    claim_type="file",
    channel_id="ch2",
    content_type="text/plain,application/json",
)


def q_composite_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship composite tree served DIRECTLY from the persisted
    compressed store (api.engine.search_over_store: request term
    universe -> query-term block decode -> unchanged engine). Shares
    composite_search's full-scoring oracle — the store-served path
    must be value-identical to the flat-index path and the SQL
    definition."""
    import tempfile

    from lighthouse_spark.api.engine import search_over_store
    from lighthouse_spark.api.request import SearchRequest
    from lighthouse_spark.sources.store import build_and_save

    claims = _claims_from_documents(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="entry_cstore_")
    ci = build_and_save(
        claims,
        "doc_id",
        {
            f: FieldSpec(f, positions=True)
            for f in ("name", "title", "description", "channel")
        },
        d + "/idx",
        mode="simple",
        n_shards=8,
    )
    out = search_over_store(
        ci,
        SearchRequest(s=_COMPOSITE_Q, size=25),
        now_seconds=_COMPOSITE_NOW,
        round_score=ROUND,
    )
    return out.select("doc_id", "score")


def q_composite_filtered_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5+P6 through the real engine: media_type family prefixes
    with the cad special-case (query.go:326-331), NSFW-exclude as the
    tag-array ∪ boolean-flag union (query.go:366-376), and the
    free-content fee gate (query.go:378-384) — all under the full
    function_score tree."""
    return _composite(spark, sf_dir, _COMPOSITE_Q, _FILTER_MEDIA)


def q_composite_filtered_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+P5(keep-side)+P8+P9 through the real engine: content_type
    exact IN-list, NSFW-only (nsfw=True keeps flagged docs), the
    claim_type param map file->stream (query.go:336-345), and the
    channel-claim-id equality filter."""
    return _composite(spark, sf_dir, _COMPOSITE_Q, _FILTER_TYPED)


def q_windowed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup via F.window — the batch twin of the
    watermarked streaming aggregation (streaming/windowed.py; the same
    function runs on the stream with a 2-day watermark)."""
    from lighthouse_spark.streaming.windowed import windowed_event_rollup

    ev = _t(spark, sf_dir, "events")
    return windowed_event_rollup(ev, window="6 hours").orderBy(
        "window_start", "event_type"
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup over the events table (the batch analogue
    of a windowed streaming agg — the reference is poll-based batch,
    SURVEY.md §2.8)."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    return (
        ev.groupBy(day.alias("day"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("users"),
        )
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "event_type", "n", "sum_value", "users")
        .orderBy("day", "event_type")
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per event_type (the per-channel trending
    shape): rank window partitioned by the group key — each partition
    is one group's rows, never the corpus."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", F.round("value", ROUND).alias("value"))
        .orderBy("event_type", "rank")
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram of events (10 bins over [0, 100)):
    pure integer bucketing + groupBy — the map-side-combining
    aggregation shape monitoring dashboards need at any scale."""
    ev = _t(spark, sf_dir, "events")
    bin_ = F.least(F.greatest(F.floor(F.col("value") / 10), F.lit(0)), F.lit(9))
    return (
        ev.groupBy(bin_.cast("int").alias("bin"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), ROUND).alias("sum_value"))
        .orderBy("bin")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 blocked-list shape: anti-join — customers with no
    high-value open orders (predicate keeps the result non-vacuous)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000)
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over sf0.001 documents."""
    return q_bm25_topk(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # fulltext core
        "bm25_topk": q_bm25_topk,
        "bm25_wand": q_bm25_wand,
        "bm25_filtered": q_bm25_filtered,
        "sql_match": q_sql_match,
        "bm25_batch": q_bm25_batch,
        "phrase_topk": q_phrase_topk,
        "phrase_store": q_phrase_store,
        "term_stats_top": q_term_stats,
        "doc_stats": q_doc_stats,
        "prefix_expand": q_prefix_expand,
        "fuzzy_expand": q_fuzzy_expand_all,
        "substring_search": q_substring_search,
        "regex_search": q_regex_search,
        "gopher_repetition": q_gopher_repetition,
        "span_dedup": q_span_dedup,
        "span_strip": q_span_strip,
        "curation_pipeline": q_curation_pipeline,
        "spell_suggest": q_spell_suggest,
        "mlt_terms": q_mlt_terms,
        "bool_should": q_bool_should,
        "autocomplete_prefix": q_autocomplete_prefix,
        "autocomplete_store": q_autocomplete_store,
        "composite_search": q_composite_search,
        "composite_search_mlt": q_composite_search_mlt,
        "composite_store": q_composite_store,
        "composite_filtered_media": q_composite_filtered_media,
        "composite_filtered_typed": q_composite_filtered_typed,
        # scoring / boosts
        "function_score": q_function_score,
        "gauss_decay": q_gauss_decay,
        # relational legs
        "ingest_join": q_ingest_join,
        "group_concat": q_group_concat,
        "topk_page": q_topk_page,
        "dedup_rank": q_dedup_rank,
        "events_rollup": q_events_rollup,
        "topk_per_group": q_topk_per_group,
        "value_histogram": q_value_histogram,
        "windowed_rollup": q_windowed_rollup,
        "anti_join": q_anti_join,
        # training-data pipeline
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_groups": q_dedup_groups,
        "dedup_simhash": q_dedup_simhash,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "embedding_neardup": q_embedding_neardup_all,
        "text_analysis": q_text_analysis,
        "winnowing": q_winnowing,
        # corpus curation (all four primitives, op-tagged — see
        # q_curation_ops: the driver checks at most 50 entries)
        "curation_ops": q_curation_ops,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_TOK = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

_BM25_CTES = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
c AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
q(term) AS (SELECT unnest(['spark', 'merge', 'window'])),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (c.n - dft.df + 0.5) / (dft.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / c.avgdl))) AS score
  FROM tf JOIN q USING (term) JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN c
  GROUP BY tf.doc_id
)
"""

# Positional phrase-frequency: count anchor positions i where every
# subsequent phrase term sits at i+offset (same semantics as the
# engine's higher-order-function adjacency check).
_PHRASE_COND = " AND ".join(
    f"t[i + {k}] = '{t}'" for k, t in enumerate(PHRASE_Q)
)

_PHRASE_SQL = f"""
WITH norm AS (
  SELECT doc_id, {_TOK} AS t FROM documents
),
dlc AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM norm WHERE len(t) > 0),
c AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dlc),
tok AS (SELECT doc_id, unnest(t) AS term FROM norm),
dft AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
  WHERE term IN ({", ".join(repr(t) for t in sorted(set(PHRASE_Q)))}) GROUP BY 1
),
idf AS (
  SELECT sum(cnt * ln(1 + (c.n - dft.df + 0.5) / (dft.df + 0.5))) AS idf_sum
  FROM (SELECT term, count(*)::DOUBLE AS cnt
        FROM (SELECT unnest({list(PHRASE_Q)!r}) AS term) GROUP BY 1) qt
  JOIN dft USING (term) CROSS JOIN c
),
freqs AS (
  SELECT norm.doc_id, dlc.dl,
         len(list_filter(generate_series(1, len(t) - {len(PHRASE_Q) - 1}),
                         i -> {_PHRASE_COND}))::DOUBLE AS freq
  FROM norm JOIN dlc USING (doc_id)
),
scored AS (
  SELECT f.doc_id,
         idf.idf_sum * f.freq * 2.2 / (f.freq + 1.2 * (1 - 0.75 + 0.75 * f.dl / c.avgdl)) AS score
  FROM freqs f CROSS JOIN c CROSS JOIN idf
  WHERE f.freq > 0
)
SELECT doc_id, round(score, {ROUND}) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""


_TOKS_LIST = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"

_SHINGLE5 = (
    "list_distinct(list_transform(generate_series(0, greatest(len(t) - 5, 0)),"
    " i -> array_to_string(list_slice(t, i + 1, i + 5), ' ')))"
)

_LANG_MARKERS_SQL = {
    "en": "['the','and','of','to','in']",
    "es": "['el','la','de','que','los']",
    "fr": "['le','la','et','les','des']",
    "de": "['der','die','und','das','ist']",
    "zh": "['de','shi','le','zai','he']",
}

_LANG_STRUCTS = ", ".join(
    f"{{'neg': -len(list_intersect(list_distinct(t), {arr}::VARCHAR[])), 'lang': '{lang}'}}"
    for lang, arr in sorted(_LANG_MARKERS_SQL.items())
)

_ANN_QUERY_SQL = None  # filled below


_JACCARD_SQL = f"""
    WITH norm AS (SELECT doc_id, {_TOKS_LIST} AS t FROM documents WHERE doc_id < 300),
    sh AS (SELECT doc_id, {_SHINGLE5} AS sh FROM norm),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(i / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i / (sa.n + sb.n - i) >= 0.2
    ORDER BY id_a, id_b"""

_GROUPS_SQL = f"""
    WITH RECURSIVE
    norm AS (SELECT doc_id, {_TOKS_LIST} AS t FROM documents WHERE doc_id < 300),
    sh AS (SELECT doc_id, {_SHINGLE5} AS sh FROM norm),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sh),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE i / (sa.n + sb.n - i) >= 0.2),
    und AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, g) AS (
      SELECT doc_id, doc_id FROM norm
      UNION
      SELECT u.a, r.g FROM und u JOIN reach r ON r.id = u.b)
    SELECT id, min(g) AS group_id FROM reach GROUP BY id ORDER BY id"""



_SHA_UNIT = "('0x' || substr(sha256(doc_id::VARCHAR), 1, 15))::BIGINT / 1152921504606846976.0"


def _batch_query_values() -> str:
    from collections import Counter

    vals = []
    for qid, q in sorted(_BATCH_QUERIES.items()):
        for t, c in sorted(Counter(tokenize_text(q, "simple")).items()):
            vals.append(f"({qid!r}, {t!r}, {float(c)})")
    return ", ".join(vals)


def _gopher_sql(src: str) -> str:
    """The Gopher-repetition oracle over any (doc_id, text) source
    CTE/table — shared by the standalone entry and the composed
    curation pipeline."""
    return f"""
            WITH tok AS (
              SELECT doc_id, length(text)::DOUBLE AS nchars, {_TOK} AS toks, text
              FROM {src}),
            base AS (
              SELECT doc_id, nchars,
                list_filter(list_transform(string_split(text, chr(10)||chr(10)), p -> trim(p)), p -> p <> '') AS paras,
                list_filter(list_transform(string_split(text, chr(10)), p -> trim(p)), p -> p <> '') AS lines
              FROM tok),
            lp AS (
              SELECT doc_id,
                round((len(paras) - len(list_distinct(paras)))::DOUBLE / greatest(len(paras),1), 6) AS dup_para_frac,
                round((coalesce(list_sum(list_transform(paras, p -> length(p))),0)
                     - coalesce(list_sum(list_transform(list_distinct(paras), p -> length(p))),0))::DOUBLE
                     / greatest(coalesce(list_sum(list_transform(paras, p -> length(p))),0),1), 6) AS dup_para_char_frac,
                round((len(lines) - len(list_distinct(lines)))::DOUBLE / greatest(len(lines),1), 6) AS dup_line_frac,
                round((coalesce(list_sum(list_transform(lines, p -> length(p))),0)
                     - coalesce(list_sum(list_transform(list_distinct(lines), p -> length(p))),0))::DOUBLE
                     / greatest(coalesce(list_sum(list_transform(lines, p -> length(p))),0),1), 6) AS dup_line_char_frac
              FROM base),
            grams AS (
              SELECT doc_id, nchars, n, array_to_string(toks[i:i+n-1], ' ') AS gram
              FROM (
                SELECT t.doc_id, t.nchars, t.toks, n.n AS n,
                       unnest(range(1, len(t.toks) - n.n + 2)) AS i
                FROM tok t CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7)) n(n)
                WHERE len(t.toks) >= n.n)),
            cnts AS (
              SELECT doc_id, nchars, n, gram, count(*)::BIGINT AS cnt
              FROM grams GROUP BY ALL),
            aggs AS (
              SELECT doc_id,
                round(least(1.0, coalesce(max(CASE WHEN n=2 THEN cnt*length(gram) END),0)/nchars),6) AS top_2gram_char_frac,
                round(least(1.0, coalesce(max(CASE WHEN n=3 THEN cnt*length(gram) END),0)/nchars),6) AS top_3gram_char_frac,
                round(least(1.0, coalesce(max(CASE WHEN n=4 THEN cnt*length(gram) END),0)/nchars),6) AS top_4gram_char_frac,
                round(least(1.0, coalesce(sum(CASE WHEN n=5 AND cnt>1 THEN cnt*length(gram) END),0)/nchars),6) AS dup_5gram_char_frac,
                round(least(1.0, coalesce(sum(CASE WHEN n=6 AND cnt>1 THEN cnt*length(gram) END),0)/nchars),6) AS dup_6gram_char_frac,
                round(least(1.0, coalesce(sum(CASE WHEN n=7 AND cnt>1 THEN cnt*length(gram) END),0)/nchars),6) AS dup_7gram_char_frac
              FROM cnts GROUP BY doc_id, nchars)
            SELECT l.doc_id,
              l.dup_para_frac, l.dup_para_char_frac, l.dup_line_frac, l.dup_line_char_frac,
              coalesce(a.top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
              coalesce(a.top_3gram_char_frac, 0.0) AS top_3gram_char_frac,
              coalesce(a.top_4gram_char_frac, 0.0) AS top_4gram_char_frac,
              coalesce(a.dup_5gram_char_frac, 0.0) AS dup_5gram_char_frac,
              coalesce(a.dup_6gram_char_frac, 0.0) AS dup_6gram_char_frac,
              coalesce(a.dup_7gram_char_frac, 0.0) AS dup_7gram_char_frac,
              (l.dup_line_frac <= 0.30 AND l.dup_para_frac <= 0.30
               AND l.dup_line_char_frac <= 0.20 AND l.dup_para_char_frac <= 0.20
               AND coalesce(a.top_2gram_char_frac,0.0) <= 0.20
               AND coalesce(a.top_3gram_char_frac,0.0) <= 0.18
               AND coalesce(a.top_4gram_char_frac,0.0) <= 0.16
               AND coalesce(a.dup_5gram_char_frac,0.0) <= 0.15
               AND coalesce(a.dup_6gram_char_frac,0.0) <= 0.14
               AND coalesce(a.dup_7gram_char_frac,0.0) <= 0.13) AS keep
            FROM lp l LEFT JOIN aggs a USING (doc_id)
            ORDER BY l.doc_id"""


def _scrub_sql(expr: str) -> str:
    """Wrap a SQL text expression in the PII_PATTERNS regexp_replace
    chain (DuckDB RE2 'g' flag) — same order as curate.pii_scrub_col."""
    from lighthouse_spark.pipeline.curate import PII_PATTERNS

    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat.replace(chr(39), chr(39) * 2)}', '{repl}', 'g')"
    return expr


def _pii_oracle_sql() -> str:
    """Apply the same PII patterns with DuckDB's RE2 ('g' flag); the
    synthesized dirty text matches _pii_suffix_spark char-for-char."""
    expr = _scrub_sql(
        "text || ' reach me: user' || doc_id || '@mail.example.com or 10.42.'"
        " || (doc_id % 200) || '.7 call +1 415 555 0111 ssn 123-45-6789'"
    )
    return (
        f"SELECT doc_id, sha256({expr}) AS scrub_sha FROM documents ORDER BY doc_id"
    )


def _composite_oracle_sql(s: str, k: int = 25, extra_where: str = "") -> str:
    """DuckDB program reproducing engine.search() end-to-end for query
    ``s`` on the derived claims table: per-field BM25 stats, fuzzy-AUTO
    expansion (levenshtein ≤ d, (ed, term)-ranked, ≤50/term), MLT
    selection (min_term_freq=2/min_doc_freq=5, tf·idf top-25), match +
    positional phrase clauses with claim_type gates, bool-sum, the
    bid_state filter, all 7 boosts and the 4 gauss decays."""
    import math
    from collections import Counter

    terms = tokenize_text(s, "simple")
    comp_terms = tokenize_text(s.replace(" ", ""), "simple")
    mult = 10.0 if s.startswith("@") else 1.0

    def auto_d(t: str) -> int:
        return 0 if len(t) < 3 else (1 if len(t) <= 5 else 2)

    def vals_of(ts: list[str]) -> str:
        c = Counter(ts)
        return ", ".join(f"({t!r}, {float(n)})" for t, n in sorted(c.items()))

    def fuzzy_vals(ts: list[str]) -> str:
        c = Counter(ts)
        return ", ".join(
            f"({t!r}, {float(n)}, {auto_d(t)})" for t, n in sorted(c.items())
        )

    def match_src(f: str, ts: list[str], fuzzy: bool) -> str:
        if not fuzzy:
            return f"(SELECT * FROM (VALUES {vals_of(ts)}) AS v(term, qtf))"
        return f"""(
          SELECT term, sum(qtf) AS qtf FROM (
            SELECT d.term, q.qtf,
                   row_number() OVER (PARTITION BY q.qt
                                      ORDER BY levenshtein(d.term, q.qt), d.term) AS rk
            FROM (VALUES {fuzzy_vals(ts)}) AS q(qt, qtf, ed)
            JOIN df_{f} d ON levenshtein(d.term, q.qt) <= q.ed)
          WHERE rk <= 50 GROUP BY term)"""

    def mlt_src(f: str, ts: list[str]) -> str:
        return f"""(
          SELECT term, 1.0 AS qtf FROM (
            SELECT d.term
            FROM (VALUES {vals_of(ts)}) AS q(qt, qtf)
            JOIN df_{f} d ON d.term = q.qt
            CROSS JOIN c_{f} c
            WHERE q.qtf >= 2 AND d.df >= 5 AND q.qt <> 'https'
            ORDER BY q.qtf * ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5)) DESC, d.term
            LIMIT 25))"""

    def match_clause(f: str, src: str, w: float, gate: str | None = None) -> str:
        gj = (
            f"\n    JOIN cl ON cl.doc_id = tf.doc_id AND cl.claim_type = '{gate}'"
            if gate
            else ""
        )
        return f"""
    SELECT tf.doc_id, {w} * sum(q.qtf
        * ln(1 + (c.n - df.df + 0.5) / (df.df + 0.5))
        * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl))) AS score
    FROM tf_{f} tf
    JOIN {src} q ON q.term = tf.term
    JOIN df_{f} df ON df.term = tf.term
    JOIN dl_{f} dl ON dl.doc_id = tf.doc_id
    CROSS JOIN c_{f} c{gj}
    GROUP BY tf.doc_id"""

    def phrase_clause(f: str, ts: list[str], w: float, gate: str | None = None) -> str:
        m = len(ts)
        conds = " AND ".join(f"t[i + {j}] = {t!r}" for j, t in enumerate(ts))
        gj = (
            f"\n    JOIN cl g ON g.doc_id = p.doc_id AND g.claim_type = '{gate}'"
            if gate
            else ""
        )
        return f"""
    SELECT p.doc_id, {w} * isum.v
        * p.freq * 2.2 / (p.freq + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl)) AS score
    FROM (
      SELECT doc_id,
             len(list_filter(generate_series(1, len(t) - {m - 1}),
                             i -> {conds}))::DOUBLE AS freq
      FROM (SELECT doc_id, tk_{f} AS t FROM cl)) p
    JOIN dl_{f} dl ON dl.doc_id = p.doc_id
    CROSS JOIN c_{f} c
    CROSS JOIN (
      SELECT sum(q.qtf * ln(1 + (c2.n - d.df + 0.5) / (d.df + 0.5))) AS v
      FROM (VALUES {vals_of(ts)}) AS q(term, qtf) JOIN df_{f} d ON d.term = q.term
      CROSS JOIN c_{f} c2) isum{gj}
    WHERE p.freq > 0"""

    tk_cols = ",\n    ".join(
        f"list_slice(_t, {lo}, {hi}) AS tk_{f}"
        for f, (lo, hi) in _CLAIMS_SLICES.items()
    )
    stats = "\n".join(
        f"""tok_{f} AS (SELECT doc_id, unnest(tk_{f}) AS term FROM cl),
tf_{f} AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok_{f} GROUP BY 1, 2),
dl_{f} AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok_{f} GROUP BY 1),
c_{f} AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl_{f}),
df_{f} AS (SELECT term, count(*)::DOUBLE AS df FROM tf_{f} GROUP BY 1),"""
        for f in ("name", "title", "description", "channel")
    )

    clauses = [
        match_clause(f, mlt_src(f, terms), 1.0)
        for f in ("name", "title", "channel")
    ]
    clauses += [
        phrase_clause("name", terms, 2.0 * mult),
        match_clause("name", match_src("name", terms, True), 1.0 * mult),
        phrase_clause("name", terms, 10.0, gate="channel"),
        match_clause("title", match_src("title", terms, True), 1.0),
        phrase_clause("title", terms, 10.0),
        match_clause("description", match_src("description", terms, False), 1.0),
        phrase_clause("description", terms, 2.0),
        match_clause("name", match_src("name", comp_terms, True), 10.0, gate="channel"),
        match_clause("channel", match_src("channel", terms, False), 5.0, gate="stream"),
        phrase_clause("channel", comp_terms, 5.0, gate="stream"),
    ]

    gauss = []
    for off, scale, decay, w in (
        (7 * 86400.0, 7 * 86400.0, 0.5, 0.11),
        (30 * 86400.0, 30 * 86400.0, 0.5, 0.12),
        (90 * 86400.0, 90 * 86400.0, 0.5, 0.13),
        (365 * 86400.0, 1825 * 86400.0, 0.9, 1.0),
    ):
        sigma2 = -(scale**2) / (2.0 * math.log(decay))
        gauss.append(
            f"{w!r} * exp(-pow(greatest(0.0, abs({_COMPOSITE_NOW!r} - cl.release_time)"
            f" - {off!r}), 2) / {2.0 * sigma2!r})"
        )

    return f"""
WITH base AS (SELECT doc_id, {_TOK} AS _t, source FROM documents),
cl AS (
  SELECT doc_id, {tk_cols},
    [source] AS tk_channel,
    CASE WHEN doc_id % 5 = 0 THEN 'channel' ELSE 'stream' END AS claim_type,
    CASE WHEN doc_id % 7 = 0 THEN 'Controlling'
         WHEN doc_id % 7 = 1 THEN 'Expired' ELSE 'Accepted' END AS bid_state,
    (doc_id % 1000)::DOUBLE AS effective_amount,
    (doc_id % 500)::DOUBLE AS certificate_amount,
    CASE WHEN doc_id % 3 = 0 THEN '' ELSE 'http://thumb' END AS thumbnail_url,
    (doc_id * 13 % 10000)::DOUBLE AS view_cnt,
    (doc_id * 7 % 3000)::DOUBLE AS sub_cnt,
    (doc_id % 40) AS claim_cnt,
    (1735689600.0 + (doc_id * 97 % 34560000)) AS release_time,
    CASE WHEN doc_id % 4 = 0 THEN 0.0 ELSE 1.5 END AS fee,
    (doc_id % 11 = 0) AS nsfw,
    list_extract({_CLAIMS_MIMES!r}, (doc_id % 7 + 1)::INT) AS content_type,
    CASE WHEN doc_id % 13 = 0 THEN ['porn', 'music']
         ELSE ['music'] END AS tags,
    'ch' || (doc_id % 5)::VARCHAR AS channel_claim_id
  FROM base),
{stats}
u AS ({" UNION ALL ".join(clauses)}),
qsum AS (SELECT doc_id, sum(score) AS qs FROM u GROUP BY 1)
SELECT qsum.doc_id AS doc_id,
       round(qs
         + ln(1 + cl.effective_amount * 19)
         + ln(1 + cl.certificate_amount * 19)
         + (CASE WHEN cl.bid_state = 'Controlling' THEN 300.0 ELSE 0.0 END)
         + (CASE WHEN cl.thumbnail_url <> '' THEN 50.0 ELSE 0.0 END)
         + ln(1 + cl.view_cnt)
         + ln(1 + cl.sub_cnt)
         + (CASE WHEN cl.claim_type = 'channel' AND cl.claim_cnt > 10
                 THEN 2.0 ELSE 0.0 END)
         + {" + ".join(gauss)}, {ROUND}) AS score
FROM qsum JOIN cl ON cl.doc_id = qsum.doc_id
WHERE cl.bid_state <> 'Expired'{extra_where}
ORDER BY score DESC, doc_id ASC LIMIT {k}"""


_NSFW_TAGS_SQL = "['nsfw', 'porn', 'mature', 'xxx']"
_FILTER_MEDIA_WHERE = (
    "\n  AND NOT (cl.nsfw OR list_has_any(cl.tags, " + _NSFW_TAGS_SQL + "))"
    "\n  AND (cl.content_type LIKE 'video/%'"
    " OR cl.content_type IN ('SKP', 'simplify3d_stl'))"
    "\n  AND cl.fee = 0.0"
)
_FILTER_TYPED_WHERE = (
    "\n  AND (cl.nsfw OR list_has_any(cl.tags, " + _NSFW_TAGS_SQL + "))"
    "\n  AND cl.content_type IN ('text/plain', 'application/json')"
    "\n  AND cl.claim_type = 'stream'"
    "\n  AND cl.channel_claim_id = 'ch2'"
)


def _simhash_oracle_sql(bits: int, max_h: int, id_filter: str) -> str:
    """DuckDB recomputation of the sha2-based simhash: identical token
    hash (first 15 sha256 hex chars), identical per-bit majority vote,
    exact hamming pairs — no banding needed oracle-side (the Spark
    side's pigeonhole banding is complete for the radius)."""
    hh = "(('0x' || substr(sha256(t), 1, 15))::BIGINT)"
    sim_expr = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b in range(bits)
    )
    return f"""
        WITH tok AS (SELECT doc_id, unnest({_TOK}) AS t FROM documents WHERE {id_filter}),
        th AS (SELECT doc_id, {hh} AS h FROM tok),
        sim AS (SELECT doc_id, ({sim_expr}) AS sim FROM th GROUP BY doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.sim, b.sim))::INT AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= {max_h}
        ORDER BY id_a, id_b"""


def _ivf_probes(nprobe: int = 3) -> list[int]:
    """nprobe closest centroid lists for the fixed query — same logic
    as ann.ivf_probe_lists, dependency-free for the oracle."""
    d = [
        (sum((c - q) ** 2 for c, q in zip(cent, _ANN_QUERY)), j)
        for j, cent in enumerate(_IVF_CENTROIDS)
    ]
    return sorted(j for _, j in sorted(d)[:nprobe])


def _bucket_sql(planes: list[list[float]]) -> str:
    """DuckDB expression for the hyperplane sign-bucket of `embedding`."""
    return " + ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"[{', '.join(repr(float(x)) for x in plane)}]::DOUBLE[]) > 0 "
        f"THEN (1::BIGINT << {p}) ELSE 0::BIGINT END)"
        for p, plane in enumerate(planes)
    )


def _lsh_probes() -> list[int]:
    """Query bucket + 1-bit flips — same logic as ann.lsh_topk."""
    qbits = 0
    for p, plane in enumerate(_LSH_PLANES):
        if sum(a * b for a, b in zip(plane, _ANN_QUERY)) > 0:
            qbits |= 1 << p
    probes = {qbits} | {qbits ^ (1 << p) for p in range(len(_LSH_PLANES))}
    return sorted(probes)


def oracle_sql() -> dict[str, str]:
    ann_q = "[" + ", ".join(f"{x!r}" for x in _ANN_QUERY) + "]::DOUBLE[]"
    from collections import Counter

    mlt_like = tokenize_text(_MLT_LIKE_TEXT, "simple")
    mlt_tfq = Counter(mlt_like)
    mlt_cand = sorted(set(mlt_like) - {"https"})
    mlt_vals = ", ".join(f"({t!r}, {float(mlt_tfq[t])})" for t in mlt_cand)
    return {
        "bm25_topk": _BM25_CTES
        + f"SELECT doc_id, round(score, {ROUND}) AS score FROM scored "
        "ORDER BY score DESC, doc_id ASC LIMIT 10",
        "bm25_wand": _BM25_CTES
        + f"SELECT doc_id, round(score, {ROUND}) AS score FROM scored "
        "ORDER BY score DESC, doc_id ASC LIMIT 10",
        "sql_match": _BM25_CTES
        + f""", topk AS (
          SELECT doc_id, score FROM scored
          ORDER BY score DESC, doc_id ASC LIMIT 10
        )
        SELECT d.doc_id AS doc_id, d.lang AS lang,
               round(t.score, {ROUND}) AS score
        FROM topk t JOIN documents d ON d.doc_id = t.doc_id
        ORDER BY score DESC, doc_id ASC""",
        "bm25_batch": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
            c AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            q(query_id, term, qtf) AS (VALUES {_batch_query_values()}),
            scored AS (
              SELECT q.query_id, tf.doc_id,
                     sum(q.qtf * ln(1 + (c.n - dft.df + 0.5) / (dft.df + 0.5))
                         * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl))) AS score
              FROM tf JOIN q USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN c
              GROUP BY 1, 2),
            r AS (SELECT query_id, doc_id, score,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY score DESC, doc_id ASC) AS rk
                  FROM scored)
            SELECT query_id, doc_id, round(score, {ROUND}) AS score, rk::INT AS rank
            FROM r WHERE rk <= 5 ORDER BY query_id, rank""",
        "prefix_expand": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
            WHERE term LIKE 's%' GROUP BY term ORDER BY term LIMIT 50""",
        "fuzzy_expand": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            d1 AS (
              SELECT 'd1' AS tier, term, count(DISTINCT doc_id)::BIGINT AS v
              FROM tok WHERE levenshtein(term, 'spark') <= 1 GROUP BY term),
            dict AS (SELECT DISTINCT term FROM tok),
            m AS (SELECT term, levenshtein(term, 'sart') AS ed FROM dict
                  WHERE levenshtein(term, 'sart') <= 2),
            d2 AS (
              SELECT 'd2' AS tier, term,
                     (row_number() OVER (ORDER BY ed, term) - 1)::BIGINT AS v
              FROM m ORDER BY v LIMIT 50)
            SELECT tier, term, v FROM d1
            UNION ALL SELECT tier, term, v FROM d2
            ORDER BY tier, term""",
        "substring_search": """
            SELECT doc_id FROM documents
            WHERE contains(lower(text), 'fast merge') ORDER BY doc_id""",
        "regex_search": """
            SELECT doc_id FROM documents
            WHERE regexp_matches(lower(text), 'customer [a-z]+ query')
            ORDER BY doc_id""",
        "mlt_terms": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            dl AS (SELECT doc_id FROM tok GROUP BY 1),
            c AS (SELECT count(*)::DOUBLE AS n FROM dl),
            likes(term, tfq) AS (VALUES {mlt_vals}),
            dft AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
                    WHERE term IN ({", ".join(repr(t) for t in mlt_cand)}) GROUP BY 1)
            SELECT l.term AS term FROM likes l JOIN dft USING (term) CROSS JOIN c
            WHERE l.tfq >= 2 AND dft.df >= 5
            ORDER BY l.tfq * ln(1 + (c.n - dft.df + 0.5) / (dft.df + 0.5)) DESC, l.term
            LIMIT 5""",
        "bool_should": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
            c AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            q(term) AS (SELECT unnest(['spark', 'merge', 'window'])),
            m AS (
              SELECT tf.doc_id,
                     sum(ln(1 + (c.n - dft.df + 0.5) / (dft.df + 0.5))
                         * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl))) AS score
              FROM tf JOIN q USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN c
              GROUP BY tf.doc_id),
            norm AS (SELECT doc_id, {_TOKS_LIST} AS t FROM documents),
            pidf AS (
              SELECT sum(ln(1 + (c.n - dft.df + 0.5) / (dft.df + 0.5))) AS idf_sum
              FROM dft CROSS JOIN c WHERE term IN ('big', 'data')),
            freqs AS (
              SELECT doc_id,
                     len(list_filter(generate_series(1, len(t) - 1),
                                     i -> t[i] = 'big' AND t[i + 1] = 'data'))::DOUBLE AS freq
              FROM norm),
            p AS (
              SELECT f.doc_id,
                     2.0 * pidf.idf_sum * f.freq * 2.2
                       / (f.freq + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl)) AS score
              FROM freqs f JOIN dl USING (doc_id) CROSS JOIN c CROSS JOIN pidf
              WHERE f.freq > 0),
            u AS (SELECT * FROM m UNION ALL SELECT * FROM p),
            s AS (SELECT doc_id, sum(score) AS score FROM u GROUP BY 1)
            SELECT doc_id, round(score, {ROUND}) AS score FROM s
            ORDER BY score DESC, doc_id ASC LIMIT 15""",
        "autocomplete_prefix": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
            c AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            exp AS (SELECT term FROM dft WHERE term LIKE 'sp%' ORDER BY term LIMIT 50),
            per AS (
              SELECT tf.doc_id,
                     max(ln(1 + (c.n - dft.df + 0.5) / (dft.df + 0.5))
                         * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl))) AS score
              FROM tf JOIN exp USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN c
              GROUP BY tf.doc_id)
            SELECT doc_id, round(score, {ROUND}) AS score FROM per
            ORDER BY score DESC, doc_id ASC LIMIT 10""",
        "autocomplete_store": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY 1),
            c AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
            exp AS (SELECT term FROM dft WHERE term LIKE 'sp%' ORDER BY term LIMIT 50),
            per AS (
              SELECT tf.doc_id,
                     max(ln(1 + (c.n - dft.df + 0.5) / (dft.df + 0.5))
                         * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl))) AS score
              FROM tf JOIN exp USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN c
              GROUP BY tf.doc_id)
            SELECT doc_id, round(score, {ROUND}) AS score FROM per
            ORDER BY score DESC, doc_id ASC LIMIT 10""",
        "composite_search": _composite_oracle_sql(_COMPOSITE_Q),
        "composite_search_mlt": _composite_oracle_sql(_COMPOSITE_MLT_Q),
        "composite_store": _composite_oracle_sql(_COMPOSITE_Q),
        "composite_filtered_media": _composite_oracle_sql(
            _COMPOSITE_Q, extra_where=_FILTER_MEDIA_WHERE
        ),
        "composite_filtered_typed": _composite_oracle_sql(
            _COMPOSITE_Q, extra_where=_FILTER_TYPED_WHERE
        ),
        "curation_ops": f"""
            WITH norm AS (SELECT doc_id, {_TOKS_LIST} AS t FROM documents),
            csh AS (SELECT doc_id, {_SHINGLE5} AS sh FROM norm WHERE doc_id >= 15),
            cx AS (SELECT doc_id, unnest(sh) AS s FROM csh),
            rsh AS (SELECT {_SHINGLE5} AS sh FROM norm WHERE doc_id < 15),
            refs AS (SELECT DISTINCT unnest(sh) AS s FROM rsh),
            dec AS (
              SELECT 'decontaminate' AS op, doc_id,
                     (count(*)::BIGINT)::VARCHAR AS v
              FROM cx JOIN refs USING (s) GROUP BY doc_id),
            hs AS (
              SELECT 'hash_sample' AS op, doc_id, '' AS v FROM documents
              WHERE {_SHA_UNIT} < 0.2),
            strata AS (
              SELECT doc_id, lang, source,
                     row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY {_SHA_UNIT} ASC, doc_id ASC) AS rk
              FROM documents),
            ss AS (
              SELECT 'stratified_sample' AS op, doc_id,
                     lang || '/' || source AS v
              FROM strata WHERE rk <= 3),
            pii AS (
              SELECT 'pii_scrub' AS op, doc_id, scrub_sha AS v
              FROM ({_pii_oracle_sql()}))
            SELECT op, doc_id, v FROM dec
            UNION ALL SELECT op, doc_id, v FROM hs
            UNION ALL SELECT op, doc_id, v FROM ss
            UNION ALL SELECT op, doc_id, v FROM pii
            ORDER BY op, doc_id""",
        "dedup_exact": """
            SELECT sha256(text) AS content_sha256, min(doc_id) AS doc_id,
                   count(*) AS dup_count
            FROM documents GROUP BY 1 ORDER BY doc_id""",
        "dedup_jaccard": _JACCARD_SQL,
        # same oracle on purpose: LSH candidates are exact-verified, so
        # equality with the full exact-Jaccard pair set asserts both
        # soundness AND complete recall of the banding on this corpus
        "dedup_minhash": _JACCARD_SQL,
        "dedup_groups": _GROUPS_SQL,
        "ann_bruteforce": f"""
            WITH s AS (
              SELECT vec_id,
                     round(list_cosine_similarity(embedding::DOUBLE[], {ann_q}), 6) AS cosine
              FROM embeddings)
            SELECT vec_id, cosine FROM s ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
        "ann_lsh": f"""
            WITH b AS (
              SELECT vec_id, embedding,
                     ({" + ".join(
                         f"(CASE WHEN list_dot_product(embedding::DOUBLE[], "
                         f"[{', '.join(repr(float(x)) for x in plane)}]::DOUBLE[]) > 0 "
                         f"THEN (1::BIGINT << {p}) ELSE 0::BIGINT END)"
                         for p, plane in enumerate(_LSH_PLANES)
                     )}) AS bucket
              FROM embeddings)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], {ann_q}), 6) AS cosine
            FROM b WHERE bucket IN ({", ".join(str(x) for x in _lsh_probes())})
            ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
        "ann_ivf": f"""
            WITH ds AS (
              SELECT vec_id, embedding,
                     [{", ".join(
                         f"list_distance(embedding::DOUBLE[], "
                         f"[{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
                         for c in _IVF_CENTROIDS
                     )}] AS d
              FROM embeddings),
            a AS (SELECT vec_id, embedding,
                         list_position(d, list_min(d)) - 1 AS list_id FROM ds)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], {ann_q}), 6) AS cosine
            FROM a WHERE list_id IN ({", ".join(str(x) for x in _ivf_probes())})
            ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
        "dedup_simhash": _simhash_oracle_sql(_SIMHASH_BITS, _SIMHASH_MAX_H, "doc_id < 300"),
        "embedding_neardup": f"""
            WITH p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS c
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE a.vec_id < 200 AND b.vec_id < 200),
            brute AS (
              SELECT 'brute' AS variant, id_a, id_b, round(c, 6) AS cosine FROM p
              WHERE c >= 0.2),
            b AS (
              SELECT vec_id, 0 AS probe, ({_bucket_sql(_EMB_LSH_PLANES[0])}) AS bucket
              FROM embeddings WHERE vec_id < 200
              UNION ALL
              SELECT vec_id, 1 AS probe, ({_bucket_sql(_EMB_LSH_PLANES[1])}) AS bucket
              FROM embeddings WHERE vec_id < 200),
            cand AS (
              SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
              FROM b x JOIN b y
                ON x.probe = y.probe AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
            scored AS (
              SELECT id_a, id_b,
                     list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS c
              FROM cand
              JOIN embeddings ea ON ea.vec_id = id_a
              JOIN embeddings eb ON eb.vec_id = id_b),
            lsh AS (
              SELECT 'lsh' AS variant, id_a, id_b, round(c, 6) AS cosine
              FROM scored WHERE c >= 0.2)
            SELECT variant, id_a, id_b, cosine FROM brute
            UNION ALL SELECT variant, id_a, id_b, cosine FROM lsh
            ORDER BY variant, id_a, id_b""",
        "spell_suggest": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
            dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                     FROM tok GROUP BY 1),
            q(qterm, d) AS (
              SELECT * FROM (VALUES ('mergge',2),('sparkk',2),
                                    ('window',2),('zzqqzz',2)) v(qterm, d)),
            cand AS (
              SELECT q.qterm, d.term, d.df
              FROM q JOIN dict d ON levenshtein(q.qterm, d.term) <= q.d),
            best AS (
              SELECT qterm, term,
                     row_number() OVER (PARTITION BY qterm
                       ORDER BY (term = qterm) DESC, df DESC, term) AS rn
              FROM cand)
            SELECT q.qterm, coalesce(b.term, q.qterm) AS suggestion
            FROM q LEFT JOIN best b ON b.qterm = q.qterm AND b.rn = 1
            ORDER BY q.qterm""",
        "curation_pipeline": f"""
            WITH scrub AS (
              SELECT doc_id, lang, {_scrub_sql("text")} AS text FROM documents),
            gr AS ({_gopher_sql("scrub")}),
            kept AS (
              SELECT s.doc_id, s.lang, s.text
              FROM scrub s JOIN gr USING (doc_id) WHERE gr.keep),
            winners AS (
              SELECT min(doc_id) AS doc_id FROM kept GROUP BY sha256(text)),
            final AS (
              SELECT k.* FROM kept k
              WHERE k.doc_id IN (SELECT doc_id FROM winners))
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum(len({_TOK}))::BIGINT AS n_tokens
            FROM final GROUP BY lang ORDER BY lang""",
        "span_strip": f"""
            WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            wins AS (
              SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS gram
              FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 8 + 2)) AS i
                    FROM tok WHERE len(toks) >= 8)),
            stats AS (
              SELECT gram FROM wins GROUP BY gram
              HAVING count(DISTINCT doc_id) >= 2),
            dup AS (SELECT * FROM wins WHERE gram IN (SELECT gram FROM stats)),
            ranked AS (
              SELECT doc_id, pos,
                     row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
              FROM dup),
            removedpos AS (
              SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS tpos
              FROM ranked WHERE rn > 1),
            toklist AS (
              SELECT doc_id, unnest(toks) AS tok,
                     unnest(range(0, len(toks))) AS tpos
              FROM tok),
            kept AS (
              SELECT t.doc_id, t.tok, t.tpos FROM toklist t
              ANTI JOIN removedpos r
                ON t.doc_id = r.doc_id AND t.tpos = r.tpos),
            rebuilt AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
                     count(*)::BIGINT AS kept_n
              FROM kept GROUP BY doc_id),
            base AS (SELECT doc_id, len(toks) AS n_tokens FROM tok)
            SELECT b.doc_id, b.n_tokens,
                   (b.n_tokens - coalesce(r.kept_n, 0))::BIGINT AS n_removed,
                   sha256(coalesce(r.clean_text, '')) AS clean_sha
            FROM base b LEFT JOIN rebuilt r USING (doc_id)
            ORDER BY b.doc_id""",
        "span_dedup": f"""
            WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            wins AS (
              SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i+7], ' ') AS gram
              FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 8 + 2)) AS i
                    FROM tok WHERE len(toks) >= 8)),
            stats AS (
              SELECT gram FROM wins GROUP BY gram
              HAVING count(DISTINCT doc_id) >= 2),
            dup AS (SELECT * FROM wins WHERE gram IN (SELECT gram FROM stats)),
            perdoc AS (
              SELECT doc_id, count(*)::BIGINT AS n_dup_windows
              FROM dup GROUP BY doc_id),
            cov AS (
              SELECT doc_id, count(*)::BIGINT AS covered FROM (
                SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS t FROM dup)
              GROUP BY doc_id),
            base AS (SELECT doc_id, len(toks) AS n_tokens FROM tok)
            SELECT b.doc_id, b.n_tokens,
                   coalesce(p.n_dup_windows, 0) AS n_dup_windows,
                   round(coalesce(c.covered, 0)::DOUBLE
                         / greatest(b.n_tokens, 1), 6) AS covered_frac
            FROM base b
            LEFT JOIN perdoc p USING (doc_id)
            LEFT JOIN cov c USING (doc_id)
            ORDER BY b.doc_id""",
        "gopher_repetition": _gopher_sql("documents"),
        "text_analysis": f"""
            WITH norm AS (SELECT doc_id, text, {_TOKS_LIST} AS t FROM documents),
            scored AS (
              SELECT doc_id, text, t,
                     list_sort([{_LANG_STRUCTS}])[1] AS best,
                     len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ws_tokens,
                     len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens,
                     length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                       / greatest(length(text), 1) AS alpha_ratio,
                     len(list_intersect(list_distinct(t), ['the','and','of','to','in']::VARCHAR[])) AS stop_hits,
                     list_sum(list_transform(t, x -> length(x))) / greatest(len(t), 1) AS mean_wlen,
                     len(t) AS n_tok
              FROM norm)
            SELECT doc_id,
                   CASE WHEN best.neg < 0 THEN best.lang ELSE 'und' END AS lang_guess,
                   ws_tokens, bpe_tokens,
                   round((
                     (CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END)
                   + (CASE WHEN alpha_ratio >= 0.6 THEN 1.0 ELSE alpha_ratio / 0.6 END)
                   + (CASE WHEN stop_hits >= 2 THEN 1.0 ELSE stop_hits / 2.0 END)
                   + (CASE WHEN mean_wlen >= 2.0 AND mean_wlen <= 12.0 THEN 1.0 ELSE 0.0 END)
                   ) / 4.0, 6) AS quality,
                   sha256(array_to_string(t, ' ')) AS fingerprint
            FROM scored ORDER BY doc_id""",
        "winnowing": f"""
            WITH norm AS (SELECT doc_id, {_TOKS_LIST} AS t FROM documents WHERE doc_id < 100),
            grams AS (
              SELECT doc_id,
                     list_transform(generate_series(0, greatest(len(t) - 5, 0)),
                                    i -> sha256(array_to_string(list_slice(t, i + 1, i + 5), ' '))) AS g
              FROM norm),
            wins AS (
              SELECT doc_id,
                     list_sort(list_distinct(
                       list_transform(generate_series(0, greatest(len(g) - 4, 0)),
                                      i -> list_min(list_slice(g, i + 1, i + 4))))) AS fp
              FROM grams)
            SELECT doc_id, len(fp) AS n_fp, fp[1] AS first_fp FROM wins ORDER BY doc_id""",
        "events_rollup": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
                   count(*) AS n, round(sum(value), 4) AS sum_value,
                   count(DISTINCT user_id) AS users
            FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
        "windowed_rollup": """
            SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start, event_type,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
        "topk_per_group": f"""
            WITH r AS (
              SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id ASC) AS rank
              FROM events)
            SELECT event_type, rank::INT AS rank, event_id,
                   round(value, {ROUND}) AS value
            FROM r WHERE rank <= 3 ORDER BY event_type, rank""",
        "value_histogram": f"""
            SELECT least(greatest(floor(value / 10), 0), 9)::INT AS bin,
                   count(*) AS n, round(sum(value), {ROUND}) AS sum_value
            FROM events GROUP BY 1 ORDER BY bin""",
        "anti_join": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'O' AND o.o_totalprice > 100000)
            ORDER BY c_custkey""",
        "bm25_filtered": _BM25_CTES
        + f"""SELECT d.doc_id, d.lang, round(s.score, {ROUND}) AS score
            FROM scored s JOIN documents d USING (doc_id)
            WHERE d.lang = 'en'
            ORDER BY s.score DESC, d.doc_id ASC LIMIT 10""",
        "phrase_topk": _PHRASE_SQL,
        "phrase_store": _PHRASE_SQL,
        "term_stats_top": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM tok GROUP BY term ORDER BY df DESC, term LIMIT 20""",
        "doc_stats": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
            SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY doc_id
            ORDER BY doc_id""",
        "ingest_join": """
            SELECT c_custkey,
                   coalesce(n_name, 'UNKNOWN') AS nation_name,
                   coalesce(c_acctbal, 1.0) AS acctbal
            FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
            ORDER BY c_custkey""",
        "group_concat": """
            SELECT l_orderkey,
                   array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags,
                   count(*) AS n_lines
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
        "topk_page": """
            WITH ranked AS (
              SELECT o_orderkey, o_totalprice,
                     row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders)
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM ranked WHERE rn > 5 AND rn <= 15""",
        "dedup_rank": """
            WITH ranked AS (
              SELECT p_brand, p_partkey, p_retailprice,
                     row_number() OVER (PARTITION BY p_brand
                                        ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
              FROM part)
            SELECT p_brand, p_partkey, round(p_retailprice, 2) AS p_retailprice
            FROM ranked WHERE rn = 1 ORDER BY p_brand""",
        "function_score": f"""
            SELECT o_orderkey,
                   round(ln(1 + o_totalprice * 19)
                         + CASE WHEN o_orderstatus = 'O' THEN 300.0 ELSE 0.0 END,
                         {ROUND}) AS score
            FROM orders ORDER BY score DESC, o_orderkey LIMIT 20""",
        "gauss_decay": f"""
            WITH p AS (
              SELECT event_id,
                     abs(1767225600.0 - epoch(ts)) AS dist
              FROM events),
            g AS (
              SELECT event_id,
                0.11 * exp(-pow(greatest(0, dist - 604800.0), 2)
                           / (2 * (-pow(604800.0, 2) / (2 * ln(0.5)))))
              + 0.12 * exp(-pow(greatest(0, dist - 2592000.0), 2)
                           / (2 * (-pow(2592000.0, 2) / (2 * ln(0.5)))))
              + 0.13 * exp(-pow(greatest(0, dist - 7776000.0), 2)
                           / (2 * (-pow(7776000.0, 2) / (2 * ln(0.5)))))
              + 1.0 * exp(-pow(greatest(0, dist - 31536000.0), 2)
                          / (2 * (-pow(157680000.0, 2) / (2 * ln(0.9))))) AS decay
              FROM p)
            SELECT event_id, round(decay, {ROUND}) AS decay
            FROM g ORDER BY decay DESC, event_id LIMIT 50""",
    }
