"""Scoring math: BM25 + the reference's function-score boosts.

All pinned in one module with unit tests per clause (SURVEY.md §7.4
risk 1). Everything is built-in column arithmetic — whole-stage
codegen, no Python in the hot path.

BM25 is the ES 6.x default similarity (k1=1.2, b=0.75), which is what
every match-family clause in the reference scores with (the reference
configures no custom similarity; docker-compose.yml pins ES 6.6.2):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d) = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score    = sum over query terms of idf * tfn * boost

Function-score boosts mirror /root/reference/app/actions/search/
func_score.go: field_value_factor log1p (factor 19, Missing(1)),
constant-score boosts (+300 Controlling, +50 thumbnail), a range-gated
channel boost, and four Gaussian release-time decays; final score is
query_score + sum(function scores) (score_mode=sum + boost_mode=sum
analogue, query.go:56-70).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import functions as F
from pyspark.sql.column import Column

K1 = 1.2
B = 0.75


def idf_col(df_col: Column, n_docs: float) -> Column:
    """Lucene BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return F.log(1.0 + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def tf_norm_col(tf_col: Column, dl_col: Column, avgdl: float, k1: float = K1, b: float = B) -> Column:
    """BM25 tf normalization given document field length."""
    return (tf_col * (k1 + 1.0)) / (
        tf_col + k1 * (1.0 - b + b * dl_col / F.lit(float(avgdl)))
    )


def bm25_col(
    tf_col: Column,
    dl_col: Column,
    df_col: Column,
    n_docs: float,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> Column:
    """Per-(term, doc) BM25 contribution."""
    return idf_col(df_col, n_docs) * tf_norm_col(tf_col, dl_col, avgdl, k1, b)


def idf_py(df: float, n_docs: float) -> float:
    """Pure-Python idf — formula twin of idf_col."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_py(tf: float, dl: float, df: float, n_docs: float, avgdl: float,
            k1: float = K1, b: float = B) -> float:
    """Pure-Python twin of bm25_col — used by the test oracle and the
    WAND kernel's block-max bound. Must stay formula-identical."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    return idf * tfn


def max_tf_norm(tf: float, dl: float, avgdl: float, k1: float = K1, b: float = B) -> float:
    """tfn upper bound for a (tf, dl) pair; used for block-max metadata."""
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


# --- function-score boosts (func_score.go) --------------------------------

FVF_FACTOR = 19  # func_score.go:9 (effectiveFactor)


def log1p_factor(col: Column, factor: float = 1.0, missing: float = 1.0) -> Column:
    """field_value_factor modifier=log1p with Missing() default.

    Ref: func_score.go:24-42 (effective_amount/certificate_amount,
    factor 19) and :90-107 (view_cnt/sub_cnt, factor 1).
    """
    return F.log1p(F.coalesce(col, F.lit(missing)) * F.lit(float(factor)))


def controlling_boost(
    bid_state: Column, weight: float = 300.0, value: str = "Controlling"
) -> Column:
    """+300 constant score if bid_state == Controlling (func_score.go:11-16)."""
    return F.when(bid_state == value, F.lit(weight)).otherwise(F.lit(0.0))


def nonempty_boost(col: Column, weight: float = 50.0) -> Column:
    """+50 if a thumbnail-like field is present/nonempty (func_score.go:18-22)."""
    return F.when(col.isNotNull() & (col != ""), F.lit(weight)).otherwise(F.lit(0.0))


def claim_count_boost(claim_type: Column, claim_cnt: Column, weight: float = 2.0) -> Column:
    """Channels with >10 claims get +2 (func_score.go:97-100)."""
    return F.when((claim_type == "channel") & (claim_cnt > 10), F.lit(weight)).otherwise(
        F.lit(0.0)
    )


@dataclass(frozen=True)
class GaussDecay:
    """One ES gauss decay function on a timestamp field.

    score = weight * exp(-max(0, |now - t| - offset)^2 / (2 sigma^2))
    with sigma^2 = -scale^2 / (2 ln(decay)) — the ES decay-function
    formula (public ES 6.x docs), parameterized per func_score.go:44-88.
    `now` is an explicit parameter for determinism (SURVEY.md §7.4.6).
    Times in seconds.
    """

    offset_s: float
    scale_s: float
    decay: float
    weight: float

    def col(self, ts_seconds: Column, now_seconds: float) -> Column:
        sigma2 = -(self.scale_s**2) / (2.0 * math.log(self.decay))
        dist = F.greatest(
            F.lit(0.0), F.abs(F.lit(float(now_seconds)) - ts_seconds) - F.lit(self.offset_s)
        )
        return F.lit(self.weight) * F.exp(-(dist**2) / F.lit(2.0 * sigma2))


_D = 86400.0
# func_score.go:44-88 — (offset, scale, decay, weight)
RELEASE_TIME_DECAYS = (
    GaussDecay(7 * _D, 7 * _D, 0.5, 0.11),
    GaussDecay(30 * _D, 30 * _D, 0.5, 0.12),
    GaussDecay(90 * _D, 90 * _D, 0.5, 0.13),
    GaussDecay(365 * _D, 1825 * _D, 0.9, 1.0),
)


def release_time_decay(ts_seconds: Column, now_seconds: float) -> Column:
    """Sum of the four reference gauss decays (func_score.go:44-88)."""
    total = F.lit(0.0)
    for d in RELEASE_TIME_DECAYS:
        total = total + d.col(ts_seconds, now_seconds)
    return total
