"""Pure-Python ranked-retrieval oracle.

Independent single-threaded implementation of tokenize → stats → BM25
→ phrase-freq used to verify the Spark engine (SURVEY.md §5). Shares
ONLY the scoring formula constants and the tokenizer (whose behavior is
pinned separately by golden tests in test_tokenizer.py).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lighthouse_spark.functions.analysis import tokenize_text

K1 = 1.2
B = 0.75


class PyIndex:
    def __init__(self, docs: pd.DataFrame, id_col: str, fields: dict[str, str], mode: str):
        self.mode = mode
        self.fields = fields
        self.tokens: dict[str, dict[int, list[str]]] = {}
        for fname, col in fields.items():
            per_doc = {}
            for _, row in docs.iterrows():
                toks = tokenize_text(row[col], mode)
                if toks:
                    per_doc[row[id_col]] = toks
            self.tokens[fname] = per_doc

    def stats(self, field: str):
        per_doc = self.tokens[field]
        n = len(per_doc)
        avgdl = sum(len(t) for t in per_doc.values()) / n if n else 1.0
        df: Counter = Counter()
        for toks in per_doc.values():
            df.update(set(toks))
        return n, avgdl, df

    def bm25(self, field: str, qterms: list[str]) -> dict[int, float]:
        n, avgdl, df = self.stats(field)
        qtf = Counter(qterms)
        scores: dict[int, float] = {}
        for doc_id, toks in self.tokens[field].items():
            tf = Counter(toks)
            s = 0.0
            for t, qc in qtf.items():
                if tf[t] == 0 or df[t] == 0:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                tfn = tf[t] * (K1 + 1) / (tf[t] + K1 * (1 - B + B * len(toks) / avgdl))
                s += idf * tfn * qc
            if s > 0:
                scores[doc_id] = s
        return scores

    def phrase_freq(self, field: str, doc_id: int, terms: list[str]) -> int:
        toks = self.tokens[field].get(doc_id, [])
        m = len(terms)
        return sum(
            1 for i in range(len(toks) - m + 1) if toks[i : i + m] == terms
        )

    def phrase_scores(self, field: str, terms: list[str]) -> dict[int, float]:
        n, avgdl, df = self.stats(field)
        if any(df[t] == 0 for t in terms):
            return {}
        idf_sum = sum(math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms)
        out = {}
        for doc_id, toks in self.tokens[field].items():
            f = self.phrase_freq(field, doc_id, terms)
            if f > 0:
                tfn = f * (K1 + 1) / (f + K1 * (1 - B + B * len(toks) / avgdl))
                out[doc_id] = idf_sum * tfn
        return out


def topk(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
