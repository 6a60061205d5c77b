"""/autocomplete — prefix suggestion path.

Mirrors /root/reference/app/actions/auto_complete.go:35-138:

- ``@``-prefixed input → match(name) restricted to channels
  (auto_complete.go:51-56).
- otherwise multi_match phrase_prefix (slop 5, max 50 expansions) on
  name^4 SHOULD-combined with the nested metadata fields title^5 /
  author^3 / description^2 (auto_complete.go:58-70) — we flatten the
  nested `value` fields to top-level title/description columns.
- optional nsfw MUST filter (auto_complete.go:73-75).
- project (name, claimId), page, then dedupe names preserving rank
  (auto_complete.go:111-131 dedupes within the returned page).

PINNED SEMANTICS: prefix expansion is alphabetical capped at 50
(Lucene term-dict order); each expansion scores as a (sloppy) phrase /
term match with its own statistics; a doc's clause score is the MAX
over expansions (Lucene MultiPhrase behaves similarly though not
identically); the two SHOULD clauses sum (ES bool).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lighthouse_spark.api.engine import ClaimsFieldMap
from lighthouse_spark.api.request import AutoCompleteRequest
from lighthouse_spark.functions.analysis import tokenize_text
from lighthouse_spark.operators import expand, search
from lighthouse_spark.plans.indexer import InvertedIndex

SLOP = 5            # auto_complete.go:63
MAX_EXPANSIONS = 50  # auto_complete.go:64


def phrase_prefix(
    index: InvertedIndex,
    field: str,
    terms: list[str],
    boost: float = 1.0,
    slop: int = SLOP,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame | None:
    """match_phrase_prefix: last term prefix-expanded against the term
    dictionary; per-doc score = max over expansions (Q3)."""
    if not terms:
        return None
    *head, last = terms
    exps = expand.expand_prefix(index, field, last, max_expansions)
    if not exps:
        return None
    frames = []
    for e in exps:
        if head:
            if index.fields[field].positions:
                frames.append(search.phrase(index, field, head + [e], boost, slop=slop))
            else:
                frames.append(search.match_terms(index, field, head + [e], boost))
        else:
            frames.append(search.match_terms(index, field, [e], boost))
    u = frames[0]
    for f in frames[1:]:
        u = u.unionByName(f)
    return u.groupBy("doc_id").agg(F.max("score").alias("score"))


def autocomplete(
    index: InvertedIndex,
    req: AutoCompleteRequest,
    fields: ClaimsFieldMap | None = None,
    round_score: int | None = None,
) -> DataFrame:
    """Returns (name, claim_id?, doc_id, score) suggestions."""
    fields = fields or ClaimsFieldMap()
    req.validate()
    docs = index.docs
    id_col = index.doc_id_col
    terms = tokenize_text(req.s, index.mode)

    def has(logical: str) -> bool:
        col = getattr(fields, logical)
        return col is not None and col in docs.columns

    frames: list[DataFrame] = []
    if req.s.startswith("@"):
        # channel-name branch (auto_complete.go:51-56)
        m = search.match_terms(index, fields.name, terms) if terms else None
        if m is not None and has("claim_type"):
            ids = docs.filter(F.col(fields.claim_type) == "channel").select(
                F.col(id_col).alias("doc_id")
            )
            m = m.join(ids, "doc_id", "left_semi")
        if m is not None:
            frames.append(m)
    else:
        f_name = phrase_prefix(index, fields.name, terms, boost=4.0) if has("name") else None
        if f_name is not None:
            frames.append(f_name)
        # nested value fields flattened: title^5, description^2
        nested = []
        for logical, b in (("title", 5.0), ("description", 2.0)):
            if has(logical) and getattr(fields, logical) in index.fields:
                f = phrase_prefix(index, getattr(fields, logical), terms, boost=b)
                if f is not None:
                    nested.append(f)
        if nested:
            u = nested[0]
            for f in nested[1:]:
                u = u.unionByName(f)
            # multi_match best_fields: max across fields
            frames.append(u.groupBy("doc_id").agg(F.max("score").alias("score")))

    if not frames:
        scored = search._empty_scored(index)
    else:
        scored = search.bool_should(frames)

    if req.nsfw is not None and has("nsfw"):
        ids = docs.filter(F.col(fields.nsfw) == bool(req.nsfw)).select(
            F.col(id_col).alias("doc_id")
        )
        scored = scored.join(ids, "doc_id", "left_semi")

    cols = [c for c in (fields.name, fields.claim_id) if c and c in docs.columns]
    page = search.top_k(
        scored, docs, id_col, k=req.size, offset=req.from_, columns=cols,
        round_score=round_score,
    )
    # dedupe names preserving rank order (auto_complete.go:126-129)
    from pyspark.sql import Window

    w = Window.partitionBy(fields.name).orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        page.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
    )
