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
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias("flags"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )


def q_topk_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2+T3: explicit sort + from/size pagination (search.go:96-116)."""
    orders = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 5) & (F.col("rn") <= 15))
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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over sf0.001 documents."""
    return q_bm25_topk(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "bm25_filtered": q_bm25_filtered,
        "phrase_topk": q_phrase_topk,
        "term_stats_top": q_term_stats,
        "doc_stats": q_doc_stats,
        "ingest_join": q_ingest_join,
        "group_concat": q_group_concat,
        "topk_page": q_topk_page,
        "dedup_rank": q_dedup_rank,
        "function_score": q_function_score,
        "gauss_decay": q_gauss_decay,
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


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": _BM25_CTES
        + f"SELECT doc_id, round(score, {ROUND}) AS score FROM scored "
        "ORDER BY score DESC, doc_id ASC LIMIT 10",
        "bm25_filtered": _BM25_CTES
        + f"""SELECT d.doc_id, d.lang, round(s.score, {ROUND}) AS score
            FROM scored s JOIN documents d USING (doc_id)
            WHERE d.lang = 'en'
            ORDER BY s.score DESC, d.doc_id ASC LIMIT 10""",
        "phrase_topk": _PHRASE_SQL,
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
