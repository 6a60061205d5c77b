"""Ranked-retrieval operators (SURVEY.md §2.3 Q1-Q14).

Each clause produces a scored candidate frame ``(doc_id, score)``;
the bool combinator unions clause frames and sum-aggregates — the
Spark-native expression of ES's bool/should with score_mode=sum
(ref: /root/reference/app/actions/search/query.go:22-71).

Scale notes:
- Query terms are pushed as an IN-list filter on the postings scan
  (parquet row-group pruning + dictionary filters apply); the df side
  table is filtered to the same terms and BROADCAST — no large shuffle
  in the scoring path. dl is already denormalized into postings.
- The per-clause frames for one query are small (candidate docs only);
  the union + groupBy-sum aggregates partially map-side.
- Top-k is `orderBy(score desc, doc_id asc).limit(k)` — Spark plans
  TakeOrderedAndProject (per-partition heap + driver merge), the same
  shape as ES's per-shard top-k + coordinator merge.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lighthouse_spark.functions import memo
from lighthouse_spark.operators import scoring
from lighthouse_spark.plans.indexer import InvertedIndex

MAX_EXPANSIONS = 50  # ref: auto_complete.go:59-64


def _field_postings(index: InvertedIndex, field: str, terms: list[str]) -> DataFrame:
    return index.postings.filter(
        (F.col("field") == field) & F.col("term").isin(list(set(terms)))
    )


def _qterms_df(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """Query terms with query-side term frequency (Lucene scores a
    duplicated query term once per occurrence — equivalent to a qtf
    multiplier under score-sum)."""
    counts = Counter(terms)
    return index.spark.createDataFrame(
        [(t, float(c)) for t, c in sorted(counts.items())], "term string, qtf double"
    )


def match_terms(
    index: InvertedIndex, field: str, terms: list[str], boost: float = 1.0
) -> DataFrame:
    """`match` clause: OR-of-terms BM25 (Q1; query.go:171-180 etc.).

    Returns (doc_id, score). Empty terms -> empty frame.
    """
    n, avgdl = index.corpus_stats().get(field, (0, 1.0))
    if not terms or n == 0:
        return _empty_scored(index)
    p = _field_postings(index, field, terms)
    ts = index.term_stats.filter(
        (F.col("field") == field) & F.col("term").isin(list(set(terms)))
    ).select("term", "df")
    q = _qterms_df(index, terms)
    per_term = (
        p.join(F.broadcast(ts), "term")
        .join(F.broadcast(q), "term")
        .select(
            "doc_id",
            (
                scoring.bm25_col(F.col("tf"), F.col("dl"), F.col("df"), n, avgdl)
                * F.col("qtf")
                * F.lit(float(boost))
            ).alias("score"),
        )
    )
    return per_term.groupBy("doc_id").agg(F.sum("score").alias("score"))


def topk_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list, k: int
) -> DataFrame:
    """row_number() <= k per key, SKEW-RESILIENT: rank first within
    (key, input-partition) — the hot key's rows split across however
    many partitions carry them, each contributing at most k — then the
    global per-key window ranks <= k x n_partitions rows per key
    instead of the key's entire candidate set. Two shuffles, but the
    first has no hot-key funnel and the second is k-bounded. Output is
    identical to the single-window plan (any global top-k row is in its
    own partition's top-k under the same ordering); adds a `rank`
    column. The ordering must be total (include a tiebreaker)."""
    from pyspark.sql import Window

    pre = df.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy(*key_cols, "_pid").orderBy(*order_cols)
    pruned = (
        pre.withColumn("_prk", F.row_number().over(w1))
        .filter(F.col("_prk") <= k)
        .drop("_pid", "_prk")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return pruned.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)


def batch_match_topk(
    index: InvertedIndex,
    field: str,
    queries: dict[str, list[str]],
    k: int = 10,
) -> DataFrame:
    """Top-k BM25 for MANY queries in ONE postings scan — the batch
    retrieval shape (scoring a day's query log, building a RAG training
    set): the per-request serving path pays one scan per query, which
    at 10k queries is 10k scans of the same index.

    Plan: postings filtered to the UNION of all query terms, joined to
    a broadcast (query_id, term, qtf, df) spec (df prefetched in one
    dictionary lookup, idf computed driver-side into the spec), summed
    per (query_id, doc_id), then skew-resilient top-k per query
    (topk_per_key: a stopword query whose candidate set approaches the
    corpus pre-ranks per input partition, so no single window task
    carries the whole candidate list).

    Returns (query_id, doc_id, score, rank). Queries whose terms are
    all absent return no rows (same as the per-query path)."""
    n, avgdl = index.corpus_stats().get(field, (0, 1.0))
    all_terms = sorted({t for ts in queries.values() for t in ts})
    if not all_terms or n == 0:
        return index.spark.createDataFrame(
            [], "query_id string, doc_id long, score double, rank int"
        )
    dfm = prefetch_df(index, [field], all_terms)[field]
    rows = []
    for qid, ts in sorted(queries.items()):
        for t, c in sorted(Counter(ts).items()):
            if dfm.get(t):
                rows.append((qid, t, float(c) * scoring.idf_py(dfm[t], n)))
    if not rows:
        return index.spark.createDataFrame(
            [], "query_id string, doc_id long, score double, rank int"
        )
    spec = index.spark.createDataFrame(rows, "query_id string, term string, w double")
    live = sorted({t for _, t, _ in rows})
    p = _field_postings(index, field, live)
    scored = (
        p.join(F.broadcast(spec), "term")
        .select(
            "query_id",
            "doc_id",
            (F.col("w") * scoring.tf_norm_col(F.col("tf"), F.col("dl"), avgdl)).alias(
                "score"
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score").alias("score"))
    )
    return topk_per_key(
        scored, ["query_id"], [F.col("score").desc(), F.col("doc_id").asc()], k
    ).select("query_id", "doc_id", "score", "rank")


def prefetch_df(
    index: InvertedIndex, fields: list[str], terms: list[str]
) -> dict[str, dict[str, int]]:
    """One dictionary lookup for a whole query: {field: {term: df}}.

    A composite query has ~10 clauses over 4 fields; collecting df per
    clause would pay ~10 driver round trips — this is the single
    broadcast-sized stats fetch they all share."""
    uniq = sorted(set(terms))
    if not uniq or not fields:
        return {f: {} for f in fields}

    def build():
        out: dict[str, dict[str, int]] = {f: {} for f in fields}
        rows = (
            index.term_stats.filter(
                F.col("field").isin(list(fields)) & F.col("term").isin(uniq)
            )
            .select("field", "term", "df")
            .collect()
        )
        for r in rows:
            out[r["field"]][r["term"]] = int(r["df"])
        return out

    # memoized per index epoch (functions/memo) — warm identical
    # lookups skip the driver round trip; callers may mutate, so copy
    key = ("prefetch_df", memo.epoch_of(index), tuple(fields), tuple(uniq))
    return memo.copy2(memo.cache_of(index).get_or_build(key, build))


def _shift_by(i: int):
    # factory closure: HOF lambdas must stay UNARY (a second,
    # even defaulted, param binds the (element, index) form)
    return lambda y: y - i


def _adjacency_anchors(
    anchor, rest: list[str], lookup=None, df_map=None, anchor_term: str | None = None
):
    """Anchor positions x (of the phrase's first term) such that every
    later term t_i sits at x+i — computed as a chain of hash-based
    array_intersects over the per-term position arrays. ``lookup``
    maps a term to its positions Column (default: a `posmap` map
    column in scope). Positions are distinct within a doc, so set
    semantics are exact.

    The chain is order-free under the shift convention (anchors =
    ∩_i (positions(t_i) − i), slot 0 being the anchor), so when
    ``df_map`` and ``anchor_term`` are given the intersect starts from
    the RAREST term's shifted array and every later intersect shrinks
    from the smallest set (VERDICT r7 next #3: the old chain always
    started from terms[0] — the LARGEST array for stopword-anchored
    phrases like "the license"). Result is identical in any order
    (set intersection is commutative); order-invariance is pinned by
    tests/test_phrase."""
    if lookup is None:
        lookup = lambda t: F.element_at("posmap", t)  # noqa: E731

    def arr_of(i):
        if i == 0:
            return anchor
        return F.transform(lookup(rest[i - 1]), _shift_by(i))

    n_slots = 1 + len(rest)
    order = list(range(n_slots))
    if df_map is not None and anchor_term is not None and n_slots > 1:
        slot_terms = [anchor_term] + list(rest)
        order.sort(key=lambda i: (df_map.get(slot_terms[i], 1 << 62), i))
    acc = None
    for i in order:
        a = arr_of(i)
        acc = a if acc is None else F.array_intersect(acc, a)
    return acc


def _pivot_positions(p: DataFrame, uniq: list[str], group_cols: list[str]):
    """Per-doc positions via PIVOTED any_value(when(term==t)) columns —
    measured ~20% cheaper than map_from_entries(collect_list(struct))
    (no per-row struct/map building, no collect_list buffers; r7
    same-session A/B 0.492 → 0.391 s on the 100k dense pair). Returns
    (per_doc frame with _p{i} columns + dl, lookup term->Column)."""
    aggs = [
        F.any_value(F.when(F.col("term") == t, F.col("positions")), True).alias(
            f"_p{i}"
        )
        for i, t in enumerate(uniq)
    ] + [F.first("dl").alias("dl")]
    per = p.groupBy(*group_cols).agg(*aggs)
    lookup = {t: F.col(f"_p{i}") for i, t in enumerate(uniq)}
    return per, (lambda t: lookup[t])


def phrase(
    index: InvertedIndex,
    field: str,
    terms: list[str],
    boost: float = 1.0,
    slop: int = 0,
    df_map: dict[str, int] | None = None,
    slop_mode: str = "lucene",
) -> DataFrame:
    """`match_phrase` clause (Q2; query.go:136-169).

    Lucene phrase scoring: idf = sum of constituent-term idfs; tf =
    number of phrase occurrences in the doc. Adjacency is checked with
    built-in higher-order array functions over the per-term position
    arrays — no Python, no self-join explosion: the per-doc state is a
    term->positions map built from the (few) posting rows of the
    query's own terms.

    ``slop`` > 0 computes LUCENE-EXACT sloppy freq (operators/sloppy
    .py — offset-adjusted min-heap, fractional 1/(1+matchLength) slop
    weights, order-tolerant) via an Arrow-batched UDF over the
    candidate docs' position arrays — candidates only, never the
    corpus. Phrases with REPEATED terms route through the repeat-group
    disambiguation variant (slots of the same term bind distinct
    document positions — sloppy.lucene_sloppy_freq_rpt). The fused
    autocomplete plan (slop 5; auto_complete.go:63) keeps the greedy
    ordered-window expression for its single-scan 50-expansion plan
    shape — divergence pinned by tests/test_sloppy.py.
    """
    n, avgdl = index.corpus_stats().get(field, (0, 1.0))
    if not terms or n == 0:
        return _empty_scored(index)
    spec = index.fields[field]
    if not spec.positions:
        raise ValueError(f"field {field!r} was indexed without positions")

    uniq = sorted(set(terms))
    # df per query term (tiny driver-side lookup unless prefetched;
    # also lets us bail out early when any phrase term is absent).
    if df_map is None:
        # memoized per epoch (functions/memo) + the whole lazy plan
        # cached: a warm identical phrase query costs ZERO driver
        # round trips and no re-analysis — re-collect re-executes.
        key = ("phrase_plan", memo.epoch_of(index), field, tuple(terms),
               boost, slop, slop_mode)
        return memo.cache_of(index).get_or_build(
            key,
            lambda: phrase(
                index, field, terms, boost, slop,
                prefetch_df(index, [field], uniq)[field], slop_mode,
            ),
        )
    # absent terms may be recorded as df=0 (prefetch) or missing —
    # either way the phrase cannot match anywhere
    if any(not df_map.get(t) for t in terms):
        return _empty_scored(index)
    # Lucene PhraseQuery idf: sum over term *occurrences* in the phrase.
    idf_sum = sum(scoring.idf_py(df_map[t], n) for t in terms)

    p = _field_postings(index, field, terms)
    per_doc, look = _pivot_positions(p, uniq, ["doc_id"])
    conj = F.lit(True)
    for i in range(len(uniq)):
        conj = conj & F.col(f"_p{i}").isNotNull()
    per_doc = per_doc.filter(conj)

    # Phrase occurrences anchored at each position of terms[0] — all
    # built-in higher-order functions, evaluated JVM-side per row.
    anchor = look(terms[0])
    rest = terms[1:]
    if not rest:
        freq = F.size(anchor).cast("double")
    elif slop == 0:
        # Hash-based intersect chain (r7): anchors surviving term i are
        # intersect(acc, positions(term_i) - i). array_intersect builds
        # a hash set per row — O(|A|+|B|) per term vs the old
        # filter+array_contains O(|A|*|B|); equivalence pinned by the
        # phrase tests (positions are distinct within a doc, so the
        # set-intersect count equals the anchor-scan count). r8: the
        # chain intersects in ASCENDING-df order (df_map is in scope),
        # so dense-term phrases start from the rarest array.
        freq = F.size(
            _adjacency_anchors(anchor, rest, look, df_map, terms[0])
        ).cast("double")
    elif slop_mode == "lucene":
        # Lucene-exact sloppy freq (fractional) over the per-term
        # position arrays — Arrow-batched, candidate docs only.
        # Repeated phrase terms route through the repeat-group
        # disambiguation variant (distinct-position binding).
        from lighthouse_spark.operators.sloppy import (
            lucene_sloppy_freq,
            lucene_sloppy_freq_rpt,
        )

        _slop = int(slop)
        if len(set(terms)) == len(terms):

            @F.pandas_udf("double")
            def _sloppy(pls: pd.Series) -> pd.Series:
                return pls.map(lambda ls: lucene_sloppy_freq(list(ls), _slop))

        else:
            _groups = tuple(terms)

            @F.pandas_udf("double")
            def _sloppy(pls: pd.Series) -> pd.Series:
                return pls.map(
                    lambda ls: lucene_sloppy_freq_rpt(list(ls), _slop, _groups)
                )

        freq = _sloppy(F.array(*[look(t) for t in terms]))
    else:
        # slop_mode="window": greedy ordered-window count (the fused
        # autocomplete plan's expression; order-sensitive, integer)
        def chain(i, prev):
            if i == len(terms):
                return F.lit(True)
            arr = look(terms[i])
            return F.exists(
                arr, lambda xi: (xi > prev) & (xi <= prev + slop + 1) & chain(i + 1, xi)
            )

        freq = F.size(F.filter(anchor, lambda x0: chain(1, x0))).cast("double")

    scored = per_doc.withColumn("freq", freq).filter(F.col("freq") > 0)
    return scored.select(
        "doc_id",
        (
            F.lit(idf_sum)
            * scoring.tf_norm_col(F.col("freq").cast("double"), F.col("dl"), avgdl)
            * F.lit(float(boost))
        ).alias("score"),
    )


def _empty_scored(index: InvertedIndex) -> DataFrame:
    return index.spark.createDataFrame([], "doc_id long, score double")


def bool_should(frames: list[DataFrame], minimum_should_match: int = 1) -> DataFrame:
    """SHOULD combinator, score_mode=sum (Q8; query.go:22-71, 373).

    Union the per-clause scored frames and sum; `minimum_should_match`
    = HAVING count(matched clauses) >= m.
    """
    frames = [f for f in frames if f is not None]
    if not frames:
        raise ValueError("bool_should needs at least one clause")
    u = frames[0]
    for f in frames[1:]:
        u = u.unionByName(f)
    agg = u.groupBy("doc_id").agg(
        F.sum("score").alias("score"), F.count("*").alias("matched_clauses")
    )
    if minimum_should_match > 1:
        agg = agg.filter(F.col("matched_clauses") >= minimum_should_match)
    return agg.select("doc_id", "score")


def top_k(
    scored: DataFrame,
    docs: DataFrame,
    doc_id_col: str,
    k: int = 10,
    offset: int = 0,
    columns: list[str] | None = None,
    sort_by: str | None = None,
    round_score: int | None = None,
) -> DataFrame:
    """Join stored fields and take the page (T1-T3; search.go:92-116).

    Default order: score DESC, doc_id ASC (deterministic tie-break —
    SURVEY.md §7.4.2). `sort_by='field'` DESC / `'^field'` ASC mirrors
    the reference's sortBy convention (search.go:113-116: olivere
    Sort(field, ascending) with ascending=strings.Contains(sortBy,"^")).
    """
    # Alias both sides: `scored` usually derives from `docs` (self-join
    # lineage); qualified names keep the analyzer unambiguous.
    s, d = scored.alias("_s"), docs.alias("_d")
    out = s.join(d, F.col("_s.doc_id") == F.col(f"_d.{doc_id_col}"), "inner")
    score_col = (
        F.round("_s.score", round_score).alias("score")
        if round_score is not None
        else F.col("_s.score").alias("score")
    )
    wanted = columns or docs.columns
    sel = [F.col(f"_d.{c}").alias(c) for c in wanted] + [score_col]
    if doc_id_col not in wanted and "doc_id" not in wanted:
        sel.insert(0, F.col(f"_s.doc_id").alias("doc_id"))
    out = out.select(*sel)
    tie = "doc_id" if "doc_id" in out.columns else doc_id_col
    if sort_by:
        asc = sort_by.startswith("^")
        fld = sort_by.lstrip("^")
        order = [F.col(fld).asc() if asc else F.col(fld).desc(), F.col(tie).asc()]
    else:
        order = [F.col("score").desc(), F.col(tie).asc()]
    out = out.orderBy(*order)
    if offset:
        # Pagination beyond head (T3): offset+limit plans as ONE
        # TakeOrderedAndProject(limit=offset+k, offset=offset) —
        # per-partition top-(offset+k) heaps + driver merge, never a
        # global single-partition window. from<=9,999 (search.go:96)
        # bounds the heap at 10,009 rows regardless of corpus size.
        return out.offset(offset).limit(k)
    return out.limit(k)
