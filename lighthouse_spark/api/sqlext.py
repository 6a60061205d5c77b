"""MATCH() — fulltext search from plain ``spark.sql`` (SURVEY §4.3's
deferred sugar; VERDICT r6 next #8).

Spark exposes no hook for a Python-planned *relation* inside SQL text
(scalar UDFs run per-row on executors and cannot consult the inverted
index; Python UDTFs likewise cannot submit jobs), so the honest thin
wrapper is a REWRITER over a documented pseudo-table:

    MATCH('<query text>'[, k])

appearing as a table factor is replaced with a temp view holding the
engine's BM25 top-k rows ``(doc_id, score)`` for that query — the
view is a registered DataFrame (lazy; it executes with the enclosing
statement), and every other part of the statement is stock Spark SQL:

    eng = MatchSQL(index, "text")
    eng.sql(spark, '''
        SELECT d.doc_id, d.lang, round(m.score, 4) AS score
        FROM MATCH('spark merge window', 10) m
        JOIN documents d ON d.doc_id = m.doc_id
        ORDER BY score DESC, doc_id
    ''')

Reference parity: the reference exposes search only over HTTP
(app/actions/search/search.go:92-101); this surface is the Spark-SQL
analogue of that entry point over the same scoring path
(operators/search.match_terms — exact BM25, k1=1.2, b=0.75).

Grammar notes: the query literal is single-quoted with '' as the
escape for an embedded quote; k defaults to ``k_default``. The match
is case-insensitive on the MATCH keyword. Ties at the k boundary
break by doc_id ascending (the engine's convention everywhere).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lighthouse_spark.functions.analysis import tokenize_text
from lighthouse_spark.operators import search
from lighthouse_spark.plans.indexer import InvertedIndex

_MATCH_RE = re.compile(r"\bMATCH\s*\(\s*'((?:[^']|'')*)'\s*(?:,\s*(\d+))?\s*\)", re.I)


@dataclass
class MatchSQL:
    """Binds one indexed field to the MATCH() pseudo-table."""

    index: InvertedIndex
    field: str
    k_default: int = 10

    def match_df(self, query: str, k: int | None = None) -> DataFrame:
        """The relation MATCH() expands to: BM25 top-k (doc_id, score)
        for ``query`` — usable directly from the DataFrame API too."""
        k = self.k_default if k is None else k
        terms = tokenize_text(query, self.index.mode)
        scored = search.match_terms(self.index, self.field, terms)
        return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)

    def sql(self, spark: SparkSession, statement: str) -> DataFrame:
        """Execute ``statement`` with every MATCH('q'[, k]) table factor
        rewritten to a temp view of :meth:`match_df`. View names are
        deterministic per (query, k) within this object, so a repeated
        MATCH in one statement shares one view (and Spark's plan cache
        reuses the underlying plan across statements)."""
        views: dict[tuple[str, int], str] = {}
        in_string = _string_spans(statement)

        def repl(m: re.Match) -> str:
            # a MATCH(...) that sits INSIDE an outer string literal is
            # data, not a table factor — leave it alone. The span scan
            # handles '' and \' escapes and ignores quotes inside
            # -- / /* */ comments (ADVICE r7: bare quote parity
            # miscounted an apostrophe'd comment before a real MATCH).
            if in_string(m.start()):
                return m.group(0)
            q = m.group(1).replace("''", "'")
            k = int(m.group(2)) if m.group(2) else self.k_default
            key = (q, k)
            if key not in views:
                name = f"_lh_match_{len(views)}_{abs(hash(key)) % 10**8:08d}"
                self.match_df(q, k).createOrReplaceTempView(name)
                views[key] = name
            return views[key]

        out = spark.sql(_MATCH_RE.sub(repl, statement))
        # spark.sql analyzes eagerly, so the views are resolved into
        # the returned plan — drop them to keep a long-lived session's
        # catalog clean (ADVICE r7: names accumulated per statement)
        for name in views.values():
            spark.catalog.dropTempView(name)
        return out


def _string_spans(statement: str):
    """Linear scan classifying each offset of a Spark SQL statement:
    returns ``in_string(pos) -> bool``. Tracks single-quoted string
    literals with both '' and \\' escapes, and skips ``--`` line and
    ``/* */`` block comments entirely (quotes inside comments are
    inert). Double-quoted literals are tracked the same way."""
    spans: list[tuple[int, int]] = []
    i, n = 0, len(statement)
    while i < n:
        c = statement[i]
        if c == "-" and statement.startswith("--", i):
            j = statement.find("\n", i)
            i = n if j < 0 else j + 1
        elif c == "/" and statement.startswith("/*", i):
            j = statement.find("*/", i + 2)
            i = n if j < 0 else j + 2
        elif c in ("'", '"'):
            quote, start = c, i
            i += 1
            while i < n:
                if statement[i] == "\\":
                    i += 2
                    continue
                if statement[i] == quote:
                    if i + 1 < n and statement[i + 1] == quote:  # '' escape
                        i += 2
                        continue
                    break
                i += 1
            spans.append((start, min(i, n - 1)))
            i += 1
        else:
            i += 1

    def in_string(pos: int) -> bool:
        return any(a < pos <= b for a, b in spans)

    return in_string
