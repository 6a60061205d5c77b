"""Independent pure-Python oracle for the composite /search semantics.

Re-implements the pinned scoring spec (lighthouse_spark/api/engine.py
docstring) from scratch over pandas rows — shares no Spark code with
the engine (only the tokenizer, which has its own golden tests).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from lighthouse_spark.functions.analysis import tokenize_text

K1, B = 1.2, 0.75
NSFW_TAGS = {"nsfw", "porn", "mature", "xxx"}
GAUSS = [  # (offset_s, scale_s, decay, weight)
    (7 * 86400.0, 7 * 86400.0, 0.5, 0.11),
    (30 * 86400.0, 30 * 86400.0, 0.5, 0.12),
    (90 * 86400.0, 90 * 86400.0, 0.5, 0.13),
    (365 * 86400.0, 1825 * 86400.0, 0.9, 1.0),
]


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


class FieldIdx:
    def __init__(self, docs: pd.DataFrame, col: str):
        self.tokens: dict[int, list[str]] = {}
        for _, row in docs.iterrows():
            v = row[col]
            toks = tokenize_text(v if isinstance(v, str) else "", "simple")
            if toks:
                self.tokens[row["doc_id"]] = toks
        self.n = len(self.tokens)
        self.avgdl = (
            sum(len(t) for t in self.tokens.values()) / self.n if self.n else 1.0
        )
        self.df: Counter = Counter()
        for toks in self.tokens.values():
            self.df.update(set(toks))

    def idf(self, t: str) -> float:
        return math.log(1.0 + (self.n - self.df[t] + 0.5) / (self.df[t] + 0.5))

    def match(self, qterms: list[str]) -> dict[int, float]:
        out: dict[int, float] = {}
        qtf = Counter(qterms)
        for d, toks in self.tokens.items():
            tf = Counter(toks)
            s = 0.0
            for t, qc in qtf.items():
                if tf[t] and self.df[t]:
                    tfn = tf[t] * (K1 + 1) / (tf[t] + K1 * (1 - B + B * len(toks) / self.avgdl))
                    s += self.idf(t) * tfn * qc
            if s > 0:
                out[d] = s
        return out

    def phrase(self, terms: list[str]) -> dict[int, float]:
        if not terms or any(self.df[t] == 0 for t in terms):
            return {}
        idf_sum = sum(self.idf(t) for t in terms)
        out = {}
        m = len(terms)
        for d, toks in self.tokens.items():
            f = sum(1 for i in range(len(toks) - m + 1) if toks[i : i + m] == terms)
            if f:
                tfn = f * (K1 + 1) / (f + K1 * (1 - B + B * len(toks) / self.avgdl))
                out[d] = idf_sum * tfn
        return out

    def fuzzy_expand(self, term: str, limit: int = 50) -> list[str]:
        n = len(term)
        d = 0 if n < 3 else (1 if n <= 5 else 2)
        if d == 0:
            return [term]
        cands = []
        for t in self.df:
            if abs(len(t) - n) <= d:
                ed = _lev(t, term)
                if ed <= d:
                    cands.append((ed, t))
        cands.sort()
        return [t for _, t in cands[:limit]]

    def mlt_select(
        self,
        like: list[str],
        max_terms: int = 25,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
    ) -> list[str]:
        # ES more_like_this defaults min_term_freq=2 / min_doc_freq=5
        # (inherited by query.go:106-121 — not overridden there).
        tfq = Counter(like)
        scored = [
            (tfq[t] * self.idf(t), t)
            for t in sorted(set(like))
            if t != "https"
            and tfq[t] >= min_term_freq
            and self.df[t] >= max(min_doc_freq, 1)
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        return [t for _, t in scored[:max_terms]]


def _add(total: dict[int, float], part: dict[int, float], gate=None):
    for d, s in part.items():
        if gate is None or gate(d):
            total[d] = total.get(d, 0.0) + s


def composite_search(
    docs: pd.DataFrame,
    s: str,
    now_seconds: float,
    nsfw: bool | None = None,
    free_only: bool = False,
    claim_type: str | None = None,
    enable_fuzzy: bool = True,
    enable_mlt: bool = True,
    enable_contains: bool = False,
) -> list[tuple[int, float]]:
    """Returns [(doc_id, total_score)] sorted (score desc, doc_id asc)."""
    idx = {f: FieldIdx(docs, f) for f in ("name", "title", "description", "channel")}
    terms = tokenize_text(s, "simple")
    at = s.startswith("@")
    compressed = s.replace(" ", "")
    comp_terms = tokenize_text(compressed, "simple")
    rows = {r["doc_id"]: r for _, r in docs.iterrows()}
    is_channel = lambda d: rows[d]["claim_type"] == "channel"  # noqa: E731
    is_stream = lambda d: rows[d]["claim_type"] == "stream"  # noqa: E731

    def fuzzy_terms(fi: FieldIdx, ts: list[str]) -> list[str]:
        if not enable_fuzzy:
            return ts
        out = []
        for t in ts:
            out.extend(fi.fuzzy_expand(t))
        return out

    q: dict[int, float] = {}
    # mlt over name/title/channel
    if enable_mlt:
        mlt_total: dict[int, float] = {}
        for f in ("name", "title", "channel"):
            sel = idx[f].mlt_select(terms)
            if sel:
                _add(mlt_total, idx[f].match(sel))
        _add(q, mlt_total)
    # matchPhraseName boost 2 (*10 @)
    _add(q, {d: v * 2 * (10 if at else 1) for d, v in idx["name"].phrase(terms).items()})
    # matchName fuzzy boost 1 (*10 @)
    _add(q, {d: v * (10 if at else 1)
             for d, v in idx["name"].match(fuzzy_terms(idx["name"], terms)).items()})
    # matchChannelName: phrase(name) & channel, boost 10
    _add(q, {d: v * 10 for d, v in idx["name"].phrase(terms).items()}, gate=is_channel)
    # matchTitle fuzzy 1
    _add(q, idx["title"].match(fuzzy_terms(idx["title"], terms)))
    # matchPhraseTitle 10
    _add(q, {d: v * 10 for d, v in idx["title"].phrase(terms).items()})
    # matchDescription 1 (no fuzz)
    _add(q, idx["description"].match(terms))
    # matchPhraseDescription 2
    _add(q, {d: v * 2 for d, v in idx["description"].phrase(terms).items()})
    # matchCompressedName fuzzy 10 & channel — unconditional (query.go:191-200)
    _add(
        q,
        {d: v * 10
         for d, v in idx["name"].match(fuzzy_terms(idx["name"], comp_terms)).items()},
        gate=is_channel,
    )
    # matchChannel 5 & stream
    _add(q, {d: v * 5 for d, v in idx["channel"].match(terms).items()}, gate=is_stream)
    # matchCompressedChannel phrase 5 & stream — unconditional (query.go:211-219)
    _add(q, {d: v * 5 for d, v in idx["channel"].phrase(comp_terms).items()},
         gate=is_stream)
    # opt-in contains clauses (query.go:40-42 ship these disabled):
    # constant-score substring, name ^1 / title ^2 / description ^1
    if enable_contains:
        sl = s.lower()
        for fld, boost in (("name", 1.0), ("title", 2.0), ("description", 1.0)):
            _add(q, {
                d: boost
                for d, r in rows.items()
                if isinstance(r[fld], str) and sl in r[fld].lower()
            })

    out = []
    for d, qs in q.items():
        r = rows[d]
        # filters
        if r["bid_state"] == "Expired":
            continue
        tags = set(list(r["tags"])) if r["tags"] is not None else set()
        flagged = bool(r["nsfw"]) or bool(NSFW_TAGS & tags)
        if nsfw is not None and (flagged if not nsfw else not flagged):
            continue
        if free_only and r["fee"] != 0.0:
            continue
        if claim_type:
            mapped = {"channel": "channel", "file": "stream"}.get(claim_type)
            if mapped and r["claim_type"] != mapped:
                continue
        # boosts (Missing(1) semantics; pandas nullable ints surface as NaN)
        def val(v, default=1.0):
            return default if v is None or (isinstance(v, float) and math.isnan(v)) else float(v)

        b = 0.0
        b += math.log1p(val(r["effective_amount"]) * 19)
        b += math.log1p(val(r["certificate_amount"]) * 19)
        b += 300.0 if r["bid_state"] == "Controlling" else 0.0
        b += 50.0 if (r["thumbnail_url"] or "") != "" else 0.0
        b += math.log1p(val(r["view_cnt"]))
        b += math.log1p(val(r["sub_cnt"]))
        if r["claim_type"] == "channel" and r["claim_cnt"] > 10:
            b += 2.0
        # gauss decay
        dist = abs(now_seconds - float(r["release_time"]))
        for off, scale, decay, w in GAUSS:
            sigma2 = -(scale**2) / (2.0 * math.log(decay))
            x = max(0.0, dist - off)
            b += w * math.exp(-(x**2) / (2 * sigma2))
        out.append((d, qs + b))
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out
